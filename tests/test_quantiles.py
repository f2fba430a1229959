"""Distributed quantiles (functions/quantiles.py): kernel vs DuckDB's
quantile_disc rule, Dataset path, histogram sketch rank-error bound."""

import numpy as np
import pyarrow as pa
import pytest

from h3ray.functions import quantiles


def _disc(vals, q):
    s = np.sort(vals)
    return s[max(1, int(np.ceil(q * len(s)))) - 1]


def test_disc_rank_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(3)
    for n in (1, 2, 4, 5, 17, 100):
        vals = rng.integers(-50, 50, n).astype(np.int64)
        for q in (0.0, 0.25, 0.5, 0.75, 0.875, 1.0):
            want = duckdb.sql(
                f"SELECT quantile_disc(x, {q}) FROM (SELECT unnest($v) AS x)",
                params={"v": vals.tolist()},
            ).fetchone()[0]
            assert _disc(vals, q) == want, (n, q)


def test_group_quantile_kernel_brute_force():
    rng = np.random.default_rng(5)
    qs = (0.25, 0.5, 0.875)
    for _ in range(20):
        m = int(rng.integers(1, 400))
        key = rng.integers(0, 6, m).astype(np.int64)
        val = rng.integers(0, 30, m).astype(np.int64)
        # pre-count duplicates per (key, val) in two arbitrary halves to
        # simulate partials from different blocks
        rows = []
        for half in (slice(None, m // 2), slice(m // 2, None)):
            k, v = key[half], val[half]
            if len(k) == 0:
                continue
            o = np.lexsort((v, k))
            k, v = k[o], v[o]
            f = np.concatenate([[True], (k[1:] != k[:-1]) | (v[1:] != v[:-1])])
            g = np.cumsum(f) - 1
            c = np.zeros(g[-1] + 1, np.int64)
            np.add.at(c, g, 1)
            rows.append((k[f], v[f], c))
        kk = np.concatenate([r[0] for r in rows])
        vv = np.concatenate([r[1] for r in rows])
        cc = np.concatenate([r[2] for r in rows])
        gk, gq, gv = quantiles.group_quantile_kernel(kk, vv, cc, qs)
        got = {(int(a), int(b)): int(c) for a, b, c in zip(gk, gq, gv)}
        for k in set(key.tolist()):
            for q in qs:
                assert got[(k, int(q * 1000))] == _disc(val[key == k], q)


def test_exact_group_quantiles_dataset(ray_session):
    import ray

    rng = np.random.default_rng(11)
    m = 5000
    key = rng.integers(0, 9, m).astype(np.int64)
    val = rng.integers(0, 1000, m).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": key, "v": val})).repartition(7)
    out = quantiles.exact_group_quantiles(
        ds, key_col="k", val_col="v", qs=(0.5, 0.875), num_buckets=5
    ).take_all()
    got = {(r["k"], r["qmil"]): r["q_val"] for r in out}
    assert len(got) == len(out) == 9 * 2
    for k in range(9):
        assert got[(k, 500)] == _disc(val[key == k], 0.5)
        assert got[(k, 875)] == _disc(val[key == k], 0.875)


def test_histogram_sketch_rank_bound(ray_session):
    import ray

    rng = np.random.default_rng(17)
    vals = rng.normal(500, 200, 20000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(6)
    counts = quantiles.quantile_sketch(ds, "v", lo=0, hi=1000, nbins=256)
    assert int(counts.sum()) == len(vals)
    for q in (0.25, 0.5, 0.875):
        est, err = quantiles.sketch_quantile(counts, 0, 1000, q)
        rank = int((vals <= est).sum())
        target = int(quantiles.disc_rank(q, len(vals)))
        assert abs(rank - target) <= err
        # 256 bins over a smooth distribution: the bound itself is small
        assert err < len(vals) / 16


def test_histogram_under_overflow():
    t = pa.table({"v": pa.array([-5, 0, 9, 10, 99], pa.int64())})
    p = quantiles.histogram_partial(t, "v", lo=0, hi=10, nbins=5)
    c = p.column("hist")[0].as_py()
    assert c[0] == 1 and c[-1] == 2 and sum(c) == 5
    est, err = quantiles.sketch_quantile(np.array(c), 0, 10, 1.0)
    assert est == 10.0


def test_sketch_quantile_empty_raises():
    with pytest.raises(ValueError, match="empty"):
        quantiles.sketch_quantile(np.zeros(10, np.int64), 0, 8, 0.5)


def test_sketch_entry_point_validation(ray_session):
    """hi <= lo and nbins <= 0 fail at the driver-side entry points with a
    clear error, not a ZeroDivisionError inside a Ray task."""
    import ray

    from h3ray.functions import quantiles

    ds = ray.data.from_items([{"v": 1.0}])
    with pytest.raises(ValueError, match="hi > lo"):
        quantiles.quantile_sketch(ds, "v", lo=5, hi=5)
    with pytest.raises(ValueError, match="nbins"):
        quantiles.quantile_sketch(ds, "v", lo=0, hi=10, nbins=0)
    with pytest.raises(ValueError, match="hi > lo"):
        quantiles.sketch_quantile(np.array([0, 1, 0]), lo=3, hi=3, q=0.5)
