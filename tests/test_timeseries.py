"""Sliding-window aggregate and as-of join (functions/timeseries.py).

Kernel tests compare against O(n^2) brute force with no Ray; Dataset
tests run the full bucketed shuffle path and additionally assert that
``num_buckets`` never changes results.
"""

import numpy as np
import pyarrow as pa
import pytest

from h3ray.functions import timeseries


def _brute_window(key, ts, val, w):
    cnt = np.empty(len(key), np.int64)
    tot = np.empty(len(key), np.int64)
    for i in range(len(key)):
        m = (key == key[i]) & (ts >= ts[i] - w) & (ts <= ts[i])
        cnt[i] = m.sum()
        tot[i] = val[m].sum()
    return cnt, tot


def _brute_asof(lk, lt, rk, rt, rid):
    out = {}
    for i in range(len(lk)):
        m = (rk == lk[i]) & (rt <= lt[i])
        if m.any():
            cand = np.nonzero(m)[0]
            best_ts = rt[cand].max()
            cand = cand[rt[cand] == best_ts]
            out[i] = int(rid[cand[np.argmax(rid[cand])]])
    return out


def test_window_kernel_brute_force_with_halo():
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(1, 300))
        key = rng.integers(0, 5, n).astype(np.int64)
        ts = rng.integers(0, 1000, n).astype(np.int64)
        val = rng.integers(-5, 50, n).astype(np.int64)
        w = int(rng.integers(1, 200))
        c = w * int(rng.integers(1, 4))
        chunk = ts // c
        halo = ts >= (chunk + 1) * c - w
        k2 = np.concatenate([key, key[halo]])
        c2 = np.concatenate([chunk, chunk[halo] + 1])
        t2 = np.concatenate([ts, ts[halo]])
        v2 = np.concatenate([val, val[halo]])
        owned = np.concatenate([np.ones(n, bool), np.zeros(int(halo.sum()), bool)])
        src = np.concatenate([np.arange(n), np.nonzero(halo)[0]])
        # split over 3 arbitrary buckets to prove per-bucket independence
        bmask = (k2 * 7 + c2 * 13) % 3
        cnt = np.empty(n, np.int64)
        tot = np.empty(n, np.int64)
        mn = np.empty(n, np.int64)
        mx = np.empty(n, np.int64)
        for b in range(3):
            sel = bmask == b
            c_, t_, mn_, mx_ = timeseries.window_kernel(
                k2[sel], c2[sel], t2[sel], v2[sel], owned[sel], w, c + w + 1,
                extremes=True,
            )
            rows = src[sel][owned[sel]]
            cnt[rows] = c_
            tot[rows] = t_
            mn[rows] = mn_
            mx[rows] = mx_
        bc, bt = _brute_window(key, ts, val, w)
        assert np.array_equal(cnt, bc)
        assert np.array_equal(tot, bt)
        # brute extremes over the same frames
        for i in range(n):
            fr = val[(key == key[i]) & (ts >= ts[i] - w) & (ts <= ts[i])]
            assert mn[i] == fr.min() and mx[i] == fr.max()


def test_window_kernel_ties_and_exact_bounds():
    # peers at the same ts all count each other; ts - window is inclusive
    key = np.zeros(4, np.int64)
    ts = np.array([0, 10, 10, 20], np.int64)
    val = np.array([1, 2, 4, 8], np.int64)
    chunk = np.zeros(4, np.int64)
    owned = np.ones(4, bool)
    cnt, tot = timeseries.window_kernel(key, chunk, ts, val, owned, 10, 100)
    assert cnt.tolist() == [1, 3, 3, 3]  # [0,10] window of the 20-row hits 10,10,20
    assert tot.tolist() == [1, 7, 7, 14]


def test_asof_kernel_brute_force():
    rng = np.random.default_rng(11)
    for _ in range(20):
        nl, nr = int(rng.integers(1, 200)), int(rng.integers(1, 200))
        lk = rng.integers(0, 6, nl).astype(np.int64) * 999_983  # raw sparse keys
        rk = rng.integers(0, 6, nr).astype(np.int64) * 999_983
        lt = rng.integers(0, 80, nl).astype(np.int64)
        rt = rng.integers(0, 80, nr).astype(np.int64)
        rid = rng.permutation(nr).astype(np.int64)
        li, ri = timeseries.asof_kernel(lk, lt, rk, rt, rid)
        got = dict(zip(li.tolist(), rid[ri].tolist()))
        assert got == _brute_asof(lk, lt, rk, rt, rid)


def _events_table(n=500, users=7, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "rid": pa.array(np.arange(n, dtype=np.int64)),
            "uid": pa.array(rng.integers(0, users, n).astype(np.int64)),
            "t": pa.array(rng.integers(0, 5_000, n).astype(np.int64)),
            "v": pa.array(rng.integers(0, 100, n).astype(np.int64)),
        }
    )


@pytest.mark.parametrize("num_buckets", [1, 16])
def test_sliding_window_agg_dataset(ray_session, num_buckets):
    import ray

    t = _events_table()
    ds = ray.data.from_arrow(t).repartition(5)
    out = timeseries.sliding_window_agg(
        ds,
        key_col="uid",
        ts_col="t",
        val_col="v",
        id_col="rid",
        window_us=300,
        chunk_us=400,  # several chunk crossings over the 5000-tick span
        num_buckets=num_buckets,
    ).to_pandas()
    assert len(out) == t.num_rows
    out = out.sort_values("rid").reset_index(drop=True)
    key = t.column("uid").to_numpy()
    ts = t.column("t").to_numpy()
    val = t.column("v").to_numpy()
    bc, bt = _brute_window(key, ts, val, 300)
    assert np.array_equal(out["w_count"].to_numpy(), bc)
    assert np.array_equal(out["w_sum"].to_numpy(), bt)


def test_window_kernel_moments_brute_force():
    # sumsq is the third mergeable moment: brute-force parity, and the
    # derived variance matches numpy's population var on every frame
    rng = np.random.default_rng(17)
    key = rng.integers(0, 4, 200).astype(np.int64)
    ts = rng.integers(0, 600, 200).astype(np.int64)
    val = rng.integers(-9, 60, 200).astype(np.int64)
    chunk = np.zeros(200, np.int64)
    owned = np.ones(200, bool)
    cnt, tot, ssq, mn, mx = timeseries.window_kernel(
        key, chunk, ts, val, owned, 80, 1000, extremes=True, moments=True
    )
    for i in range(200):
        fr = val[(key == key[i]) & (ts >= ts[i] - 80) & (ts <= ts[i])]
        assert ssq[i] == (fr.astype(np.int64) ** 2).sum()
        var = ssq[i] / cnt[i] - (tot[i] / cnt[i]) ** 2
        assert var == pytest.approx(np.var(fr), abs=1e-9)
        assert mn[i] == fr.min() and mx[i] == fr.max()


def test_sliding_window_agg_moments_dataset(ray_session):
    import ray

    t = _events_table(n=400, users=5, seed=21)
    ds = ray.data.from_arrow(t).repartition(4)
    out = (
        timeseries.sliding_window_agg(
            ds,
            key_col="uid",
            ts_col="t",
            val_col="v",
            id_col="rid",
            window_us=300,
            chunk_us=500,
            num_buckets=8,
            moments=True,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    key = t.column("uid").to_numpy()
    ts = t.column("t").to_numpy()
    val = t.column("v").to_numpy()
    ssq = np.empty(len(key), np.int64)
    for i in range(len(key)):
        fr = val[(key == key[i]) & (ts >= ts[i] - 300) & (ts <= ts[i])]
        ssq[i] = (fr.astype(np.int64) ** 2).sum()
    assert np.array_equal(out["w_sumsq"].to_numpy(), ssq)


def test_sliding_window_rejects_small_chunk():
    with pytest.raises(ValueError, match="chunk_us"):
        timeseries.sliding_window_agg(
            None, key_col="k", ts_col="t", val_col="v", id_col="i",
            window_us=100, chunk_us=50,
        )


@pytest.mark.parametrize("num_buckets", [1, 16])
def test_asof_join_dataset(ray_session, num_buckets):
    import ray

    t = _events_table(n=600, users=9, seed=8)
    # odd rows are the left side, even rows the right side
    rid = t.column("rid").to_numpy()
    left = t.filter(pa.array(rid % 2 == 1))
    right = t.filter(pa.array(rid % 2 == 0))
    out = timeseries.asof_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        key_col="uid",
        ts_col="t",
        left_id_col="rid",
        right_id_col="rid",
        out_right_col="match_rid",
        num_buckets=num_buckets,
    ).to_pandas()
    want = _brute_asof(
        left.column("uid").to_numpy(),
        left.column("t").to_numpy(),
        right.column("uid").to_numpy(),
        right.column("t").to_numpy(),
        right.column("rid").to_numpy(),
    )
    got = dict(zip(out["rid"].tolist(), out["match_rid"].tolist()))
    # map brute's positional keys to left ids
    lrid = left.column("rid").to_numpy()
    want_by_id = {int(lrid[i]): v for i, v in want.items()}
    assert got == want_by_id


@pytest.mark.parametrize("chunk_us,num_buckets", [(300, 1), (300, 16), (50_000, 8)])
def test_asof_join_chunked_dataset(ray_session, chunk_us, num_buckets):
    """Chunked variant must be row-identical to the whole-key contract,
    including snapshots reaching across many empty chunks (chunk_us=300
    over a 5000-tick span) and the degenerate all-in-one-chunk case."""
    import ray

    t = _events_table(n=700, users=6, seed=21)
    rid = t.column("rid").to_numpy()
    left = t.filter(pa.array(rid % 3 != 0))
    right = t.filter(pa.array(rid % 3 == 0))
    out = timeseries.asof_join_chunked(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        key_col="uid",
        ts_col="t",
        left_id_col="rid",
        right_id_col="rid",
        chunk_us=chunk_us,
        out_right_col="match_rid",
        num_buckets=num_buckets,
    ).to_pandas()
    want = _brute_asof(
        left.column("uid").to_numpy(),
        left.column("t").to_numpy(),
        right.column("uid").to_numpy(),
        right.column("t").to_numpy(),
        right.column("rid").to_numpy(),
    )
    lrid = left.column("rid").to_numpy()
    want_by_id = {int(lrid[i]): v for i, v in want.items()}
    got = dict(zip(out["rid"].tolist(), out["match_rid"].tolist()))
    assert got == want_by_id


def test_asof_chunked_no_right_rows(ray_session):
    import ray

    t = _events_table(n=50, users=3, seed=2)
    left = ray.data.from_arrow(t)
    right = ray.data.from_arrow(t.slice(0, 0))
    out = timeseries.asof_join_chunked(
        left, right, key_col="uid", ts_col="t", left_id_col="rid",
        right_id_col="rid", chunk_us=100, out_right_col="match_rid",
    ).to_pandas()
    assert len(out) == 0


def test_asof_out_col_collision_raises():
    """left_id_col == defaulted out_right column would silently drop the
    left ids in the output dict — both variants must refuse it."""
    with pytest.raises(ValueError, match="collides"):
        timeseries.asof_join(
            None, None, key_col="uid", ts_col="t",
            left_id_col="event_id", right_id_col="event_id",
        )
    with pytest.raises(ValueError, match="collides"):
        timeseries.asof_join_chunked(
            None, None, key_col="uid", ts_col="t",
            left_id_col="event_id", right_id_col="event_id", chunk_us=100,
        )


def test_latest_per_key_chunk_empty():
    z = np.zeros(0, dtype=np.int64)
    k, c, t, r = timeseries._latest_per_key_chunk(z, z, z, z)
    assert len(k) == len(c) == len(t) == len(r) == 0


# ---------------------------------------------------------------------------
# interval join
# ---------------------------------------------------------------------------


def _brute_interval(pk, pts, ik, ist, ien, keyed):
    pairs = set()
    for i in range(len(pk)):
        for j in range(len(ik)):
            if keyed and pk[i] != ik[j]:
                continue
            if ist[j] <= pts[i] <= ien[j]:
                pairs.add((i, j))
    return pairs


@pytest.mark.parametrize("keyed", [False, True])
def test_interval_kernel_matches_brute_force(keyed):
    rng = np.random.default_rng(11)
    for _ in range(15):
        npts = int(rng.integers(1, 200))
        nint = int(rng.integers(1, 60))
        chunk = int(rng.integers(7, 97))
        pkey = rng.integers(0, 4, npts).astype(np.int64) if keyed else np.zeros(npts, np.int64)
        ikey = rng.integers(0, 4, nint).astype(np.int64) if keyed else np.zeros(nint, np.int64)
        pts = rng.integers(-300, 300, npts).astype(np.int64)
        ist = rng.integers(-300, 300, nint).astype(np.int64)
        ien = ist + rng.integers(0, 250, nint).astype(np.int64)
        want = _brute_interval(pkey, pts, ikey, ist, ien, keyed)
        # replicate intervals across overlapped chunks like interval_rows
        c0 = ist // chunk
        fan = (ien // chunk - c0 + 1).astype(np.int64)
        ridx = np.repeat(np.arange(nint), fan)
        off = np.arange(len(ridx)) - np.repeat(np.cumsum(fan) - fan, fan)
        ich = c0[ridx] + off
        rel_i = np.maximum(ist[ridx] - ich * chunk, 0)
        pch = pts // chunk
        # shared dense segment ids over both sides
        allk = np.concatenate([pkey, ikey[ridx]])
        allc = np.concatenate([pch, ich])
        kd = np.unique(allk, return_inverse=True)[1].astype(np.int64)
        cd = np.unique(allc, return_inverse=True)[1].astype(np.int64)
        seg = kd * (cd.max() + 1) + cd
        got_p, got_i = timeseries.interval_kernel(
            seg[:npts], pts - pch * chunk, pts, np.arange(npts, dtype=np.int64),
            seg[npts:], rel_i, ien[ridx], ridx,
            span=chunk, block_elems=int(rng.integers(1, 50)),
        )
        got = set(zip(got_p.tolist(), got_i.tolist()))
        assert got == want


@pytest.mark.parametrize("num_buckets", [1, 3, 64])
def test_interval_join_dataset(ray_session, num_buckets):
    import ray

    rng = np.random.default_rng(23)
    npts, nint = 500, 40
    pkey = rng.integers(0, 6, npts).astype(np.int64)
    pts = rng.integers(0, 5000, npts).astype(np.int64)
    ikey = rng.integers(0, 6, nint).astype(np.int64)
    ist = rng.integers(-100, 5000, nint).astype(np.int64)
    ien = ist + rng.integers(0, 900, nint).astype(np.int64)
    points = ray.data.from_arrow(
        pa.table({"pid": np.arange(npts, dtype=np.int64), "ts": pts, "k": pkey})
    )
    ivals = ray.data.from_arrow(
        pa.table({"iid": np.arange(nint, dtype=np.int64), "istart": ist,
                  "iend": ien, "k": ikey})
    )
    out = timeseries.interval_join(
        points, ivals, ts_col="ts", point_id_col="pid",
        interval_id_col="iid", key_col="k", chunk_us=128,
        num_buckets=num_buckets,
    ).take_all()
    got = {(r["pid"], r["iid"]) for r in out}
    assert len(out) == len(got)  # exactly-once pair emission
    want = _brute_interval(pkey, pts, ikey, ist, ien, True)
    assert got == want


def test_interval_join_unkeyed_and_empty_interval(ray_session):
    import ray

    points = ray.data.from_arrow(
        pa.table({"pid": pa.array([0, 1, 2], pa.int64()),
                  "ts": pa.array([5, 50, 500], pa.int64())})
    )
    # second interval is empty (start > end): matches nothing
    ivals = ray.data.from_arrow(
        pa.table({"iid": pa.array([7, 8], pa.int64()),
                  "istart": pa.array([0, 100], pa.int64()),
                  "iend": pa.array([60, 40], pa.int64())})
    )
    out = timeseries.interval_join(
        points, ivals, ts_col="ts", point_id_col="pid",
        interval_id_col="iid", chunk_us=16,
    ).take_all()
    assert {(r["pid"], r["iid"]) for r in out} == {(0, 7), (1, 7)}


def test_interval_join_fanout_cap():
    import ray

    points = ray.data.from_arrow(
        pa.table({"pid": pa.array([0], pa.int64()), "ts": pa.array([1], pa.int64())})
    )
    ivals = ray.data.from_arrow(
        pa.table({"iid": pa.array([1], pa.int64()),
                  "istart": pa.array([0], pa.int64()),
                  "iend": pa.array([10_000_000], pa.int64())})
    )
    # the ValueError surfaces wrapped in Ray's task-error envelope
    with pytest.raises(Exception, match="max_fanout"):
        timeseries.interval_join(
            points, ivals, ts_col="ts", point_id_col="pid",
            interval_id_col="iid", chunk_us=10, max_fanout=100,
        ).take_all()
