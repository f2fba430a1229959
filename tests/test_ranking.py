"""Per-group top-N selection (functions/ranking.py): kernel vs brute
force, Dataset path with int and string keys, tie determinism, and the
partial-stage volume bound."""

import numpy as np
import pyarrow as pa
import pytest

from h3ray.functions import ranking


def _brute_topn(key, val, rid, n):
    out = set()
    for k in set(key.tolist()):
        rows = [i for i in range(len(key)) if key[i] == k]
        rows.sort(key=lambda i: (-val[i], rid[i]))
        for rank, i in enumerate(rows[:n], 1):
            out.add((key[i], rid[i], val[i], rank))
    return out


def test_topn_kernel_brute_force():
    rng = np.random.default_rng(5)
    for _ in range(25):
        m = int(rng.integers(1, 300))
        key = rng.integers(0, 8, m).astype(np.int64)
        val = rng.integers(-50, 50, m).astype(np.int64)  # many ties
        rid = rng.permutation(m).astype(np.int64)
        n = int(rng.integers(1, 6))
        idx, rank = ranking.topn_kernel(key, val, rid, n)
        got = {(key[i], rid[i], val[i], r) for i, r in zip(idx, rank)}
        assert got == _brute_topn(key, val, rid, n)


def test_descending_key_int64_extremes():
    v = np.array([np.iinfo(np.int64).min, -1, 0, np.iinfo(np.int64).max])
    d = ranking._descending_key(v)
    assert list(np.argsort(d, kind="stable")) == [3, 2, 1, 0]


@pytest.mark.parametrize("num_buckets", [1, 7, 64])
def test_top_n_per_group_dataset_int_keys(ray_session, num_buckets):
    import ray

    rng = np.random.default_rng(9)
    m = 2000
    key = rng.integers(0, 13, m).astype(np.int64)
    val = rng.integers(0, 40, m).astype(np.int64)
    rid = rng.permutation(m).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": key, "v": val, "i": rid})
    ).repartition(8)
    out = ranking.top_n_per_group(
        ds, key_col="k", val_col="v", id_col="i", n=4, num_buckets=num_buckets
    ).take_all()
    got = {(r["k"], r["i"], r["v"], r["rank"]) for r in out}
    assert len(got) == len(out)
    assert got == _brute_topn(key, val, rid, 4)


def test_top_n_per_group_string_keys(ray_session):
    import ray

    rng = np.random.default_rng(17)
    m = 600
    names = np.array(["alpha", "beta", "gamma", "delta"])
    key = names[rng.integers(0, 4, m)]
    val = rng.integers(0, 25, m).astype(np.int64)
    rid = rng.permutation(m).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(key.tolist()), "v": val, "i": rid})
    ).repartition(5)
    out = ranking.top_n_per_group(
        ds, key_col="k", val_col="v", id_col="i", n=3, num_buckets=16
    ).take_all()
    got = {(r["k"], r["i"], r["v"], r["rank"]) for r in out}
    assert got == _brute_topn(key, val, rid, 3)


def test_partial_stage_volume_bound():
    # a 10k-row single-key block must emit exactly n rows from stage 1
    key = np.zeros(10_000, dtype=np.int64)
    val = np.arange(10_000, dtype=np.int64)
    rid = np.arange(10_000, dtype=np.int64)
    idx, rank = ranking.topn_kernel(key, val, rid, 5)
    assert len(idx) == 5
    assert sorted(val[idx].tolist()) == [9995, 9996, 9997, 9998, 9999]


def test_top_n_validation():
    with pytest.raises(ValueError, match="positive"):
        ranking.top_n_per_group(
            None, key_col="k", val_col="v", id_col="i", n=0
        )
    with pytest.raises(ValueError, match="distinct"):
        ranking.top_n_per_group(
            None, key_col="k", val_col="k", id_col="i", n=1
        )


def _brute_mode(key, val):
    out = {}
    for k in set(key.tolist()):
        vs = val[key == k]
        u, c = np.unique(vs, return_counts=True)
        best = np.lexsort((u, -c))[0]
        out[int(k)] = (int(u[best]), int(c[best]))
    return out


def test_mode_kernel_brute_force():
    rng = np.random.default_rng(31)
    for _ in range(20):
        m = int(rng.integers(1, 300))
        key = rng.integers(0, 7, m).astype(np.int64)
        val = rng.integers(0, 6, m).astype(np.int64)  # heavy ties
        # simulate two blocks' partials
        halves = []
        for sl in (slice(None, m // 2), slice(m // 2, None)):
            k, v = key[sl], val[sl]
            if len(k) == 0:
                continue
            o = np.lexsort((v, k))
            k, v = k[o], v[o]
            f = np.concatenate([[True], (k[1:] != k[:-1]) | (v[1:] != v[:-1])])
            g = np.cumsum(f) - 1
            c = np.zeros(g[-1] + 1, np.int64)
            np.add.at(c, g, 1)
            halves.append((k[f], v[f], c))
        kk = np.concatenate([h[0] for h in halves])
        vv = np.concatenate([h[1] for h in halves])
        cc = np.concatenate([h[2] for h in halves])
        gk, gv, gc = ranking.mode_kernel(kk, vv, cc)
        got = {int(a): (int(b), int(c_)) for a, b, c_ in zip(gk, gv, gc)}
        assert got == _brute_mode(key, val)


def test_mode_per_group_dataset(ray_session):
    import ray

    rng = np.random.default_rng(37)
    m = 4000
    key = rng.integers(0, 11, m).astype(np.int64)
    val = rng.integers(0, 5, m).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": key, "v": val})).repartition(6)
    out = ranking.mode_per_group(
        ds, key_col="k", val_col="v", num_buckets=4
    ).take_all()
    got = {r["k"]: (r["mode_val"], r["mode_count"]) for r in out}
    assert len(got) == len(out) == 11
    assert got == _brute_mode(key, val)
