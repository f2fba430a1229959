"""Bloom membership + bloom-pruned exact semi/anti joins
(functions/membership.py)."""

import numpy as np
import pyarrow as pa
import pytest

from h3ray.functions import membership


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(7)
    present = rng.integers(0, 2**62, 5000).astype(np.int64)
    absent = rng.integers(0, 2**62, 5000).astype(np.int64)
    absent = np.setdiff1d(absent, present)
    t = pa.table({"k": pa.array(present)})
    p = membership.bloom_partial(t, "k", nbits=1 << 20, nhash=4)
    words = membership._or_merge(p)
    assert membership.bloom_contains(words, present).all()  # no false negatives
    fp = membership.bloom_contains(words, absent).mean()
    assert fp < 0.01  # 5k keys in 1Mi bits, k=4 -> ~1e-8 expected


def test_bloom_partial_merge_is_or():
    a = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"k": pa.array([100, 200], pa.int64())})
    pa_, pb = (membership.bloom_partial(x, "k", 1 << 12, 3) for x in (a, b))
    merged = membership._or_merge(pa.concat_tables([pa_, pb]))
    both = membership.bloom_partial(
        pa.table({"k": pa.array([1, 2, 3, 100, 200], pa.int64())}), "k", 1 << 12, 3
    )
    assert (merged == membership._or_merge(both)).all()


def test_bloom_empty_and_validation():
    assert membership.bloom_contains(np.zeros(16, np.uint64), np.zeros(0, np.int64)).shape == (0,)
    with pytest.raises(ValueError, match="multiple of 64"):
        membership.bloom_from_dataset(None, "k", nbits=100)


@pytest.mark.parametrize("anti", [False, True])
def test_bloom_semijoin_exact(ray_session, anti):
    import ray

    rng = np.random.default_rng(13)
    nprobe, nbuild = 3000, 80
    pkey = rng.integers(0, 400, nprobe).astype(np.int64)
    pid = np.arange(nprobe, dtype=np.int64)
    bkey = rng.integers(0, 400, nbuild).astype(np.int64)  # dup keys on purpose
    probe = ray.data.from_arrow(
        pa.table({"pid": pid, "key": pkey})
    ).repartition(6)
    build = ray.data.from_arrow(pa.table({"bk": pa.array(bkey)})).repartition(3)
    out = membership.bloom_semijoin(
        probe, build, probe_key_col="key", key_col="bk",
        carry_cols=("pid", "key"), anti=anti,
        nbits=1 << 14, num_buckets=8,
    ).take_all()
    got = {(r["pid"], r["key"]) for r in out}
    assert len(got) == len(out)  # no duplicated probe rows
    bset = set(bkey.tolist())
    want = {
        (int(i), int(k))
        for i, k in zip(pid, pkey)
        if ((k not in bset) if anti else (k in bset))
    }
    assert got == want


def test_bloom_semijoin_empty_build(ray_session):
    import ray

    probe = ray.data.from_arrow(
        pa.table({"pid": pa.array([1, 2], pa.int64()),
                  "key": pa.array([5, 6], pa.int64())})
    )
    build = ray.data.from_arrow(pa.table({"bk": pa.array([], pa.int64())}))
    semi = membership.bloom_semijoin(
        probe, build, probe_key_col="key", key_col="bk",
        carry_cols=("pid",), nbits=1 << 10,
    ).take_all()
    assert semi == []
    anti = membership.bloom_semijoin(
        probe, build, probe_key_col="key", key_col="bk",
        carry_cols=("pid",), anti=True, nbits=1 << 10,
    ).take_all()
    assert {r["pid"] for r in anti} == {1, 2}


@pytest.mark.parametrize("anti", [False, True])
def test_broadcast_semijoin_matches_cogroup(ray_session, anti):
    import ray

    rng = np.random.default_rng(43)
    pkey = rng.integers(0, 300, 2000).astype(np.int64)
    pid = np.arange(2000, dtype=np.int64)
    bkey = rng.integers(0, 300, 60).astype(np.int64)
    probe = ray.data.from_arrow(pa.table({"pid": pid, "key": pkey})).repartition(5)
    build = ray.data.from_arrow(pa.table({"bk": pa.array(bkey)})).repartition(2)
    got = membership.broadcast_semijoin(
        probe, build, probe_key_col="key", key_col="bk",
        carry_cols=("pid",), anti=anti,
    ).take_all()
    bset = set(bkey.tolist())
    want = {int(i) for i, k in zip(pid, pkey)
            if ((k not in bset) if anti else (k in bset))}
    assert {r["pid"] for r in got} == want


def test_distinct_keys_broadcast_cap(ray_session):
    import ray

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(1000, dtype=np.int64))})
    )
    with pytest.raises(Exception, match="max_keys"):
        membership.distinct_keys_broadcast(ds, "k", max_keys=10)
    keys = membership.distinct_keys_broadcast(ds, "k", max_keys=2000)
    assert len(keys) == 1000 and keys[0] == 0 and keys[-1] == 999


def test_bloom_semijoin_reserved_carry_col(ray_session):
    """carry_cols colliding with the exchange's internal column names fail
    loudly at the entry point."""
    import ray

    from h3ray.functions import membership

    probe = ray.data.from_items([{"k": 1, "bucket": 9}])
    keys = ray.data.from_items([{"k": 1}])
    with pytest.raises(ValueError, match="internal exchange columns"):
        membership.bloom_semijoin(probe, keys, probe_key_col="k",
                                  key_col="k", carry_cols=("k", "bucket"))
