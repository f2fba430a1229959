"""Time-series operators Ray Data lacks natively: sliding-window
aggregates and as-of joins.

Both are expressed as the repo's standard bucketed co-group: key rows by
``hash(partition key…) % num_buckets`` in a map stage, one
``groupby("bucket").map_groups`` exchange, and ONE fully vectorized
kernel (lexsort + searchsorted + cumsum) per bucket — never a Python
loop over rows or per-key groups.  ``num_buckets`` scales the per-task
group size at 100 TB without changing results.

Partitioning assumptions (documented per the custom-operator contract):

* ``sliding_window_agg`` co-locates ``(key, time-chunk)`` slices, with a
  window-deep halo replicated from the previous chunk, so a single key's
  history never has to fit in one task — only one key-chunk (plus halo)
  does.  Choose ``chunk_us`` (>= ``window_us``) to bound that.
* ``asof_join`` co-locates whole keys (every left/right row of a key in
  one bucket): per-key history must fit a task.  That is the classic
  as-of contract (markets: one instrument's quotes); keys are hashed
  over ``num_buckets`` so only per-KEY volume matters, not total volume.

Timestamps are caller-provided int64 (e.g. microseconds); the operators
never parse datetimes.  SQL parity: the window frame is
``RANGE BETWEEN window_us PRECEDING AND CURRENT ROW`` (inclusive both
ends, peers included); the as-of match is the greatest right ts <= left
ts (ties on ts broken toward the largest right id, and right ids are
required unique per (key, ts) for determinism).

No counterpart exists in the reference (h3ronpy has no temporal ops);
these serve the training-data-pipeline tier (sessionization, rate
features, latest-snapshot attachment).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._util import bucket_pair as _bucket_of


# ---------------------------------------------------------------------------
# sliding-window aggregate
# ---------------------------------------------------------------------------


def window_kernel(
    key: np.ndarray,
    chunk: np.ndarray,
    ts: np.ndarray,
    val: np.ndarray,
    owned: np.ndarray,
    window_us: int,
    span_us: int,
    extremes: bool = False,
    moments: bool = False,
):
    """Vectorized sliding-window count+sum (and optionally sum-of-squares
    and/or min+max) for the OWNED rows of one bucket.

    Rows belong to (key, chunk) segments; halo rows (``owned == False``)
    are last-window_us replicas from the previous chunk carrying the NEXT
    chunk's label, so every owned row's [ts - window_us, ts] range lies
    entirely inside its own segment.  One lexsort orders segments into
    disjoint composite-integer blocks (rel-ts packed per segment, span
    bounded by ``span_us``), then two searchsorted calls + one cumsum
    answer every row's frame.  With ``extremes=True`` a sparse-table RMQ
    (O(n log n) build of per-level pairwise min/max, two gathers per
    query grouped by level) additionally answers each frame's min and
    max.  With ``moments=True`` a second cumsum over ``val**2`` answers
    each frame's sum of squares — count+sum+sumsq are the mergeable
    moments from which mean, variance and stddev derive exactly
    (``var = sumsq/count - (sum/count)**2``).  Returns
    (count, sum[, sumsq][, min, max]) aligned to the owned rows in
    input order.
    """
    if len(key) == 0:
        z = np.zeros(0, dtype=np.int64)
        n = 2 + (1 if moments else 0) + (2 if extremes else 0)
        return (z,) * n
    # dense (key, chunk) segment ids without np.unique(axis=0)'s
    # void-dtype sort: densify each part, pack, densify the pack
    kd = np.unique(key, return_inverse=True)[1].astype(np.int64)
    cd = np.unique(chunk, return_inverse=True)[1].astype(np.int64)
    seg = np.unique(kd * (cd.max() + 1) + cd, return_inverse=True)[1].astype(np.int64)
    # rel ts within the segment's chunk: owned rows in [0, chunk_us),
    # halo rows (previous chunk) in [-window_us, 0)
    rel = ts - chunk * np.int64(span_us - window_us - 1)
    # packing must keep each segment's values in a disjoint block; use
    # the actual rel range instead of trusting the caller's chunk math
    rel = rel - rel.min()
    span = np.int64(max(int(rel.max()) + window_us + 2, span_us))
    comp = seg * span + rel
    order = np.argsort(comp, kind="stable")
    cs = comp[order]
    vs = val[order]
    cum = np.concatenate([[0], np.cumsum(vs)])
    q = comp[owned]
    lo = np.searchsorted(cs, q - np.int64(window_us), "left")
    hi = np.searchsorted(cs, q, "right")
    cnt = (hi - lo).astype(np.int64)
    tot = cum[hi] - cum[lo]
    out = [cnt, tot]
    if moments:
        # int64 squares overflow-check-free only because callers scale
        # to bounded integers (cents); float vals square losslessly to
        # float64 within 2^26 magnitude
        cums = np.concatenate([[0], np.cumsum(vs * vs)])
        out.append(cums[hi] - cums[lo])
    if not extremes:
        return tuple(out)
    # sparse tables: level j covers [i, i + 2^j); every frame [lo, hi)
    # is the union of two (overlapping) level-floor(log2(len)) blocks
    mins = [vs]
    maxs = [vs]
    while (1 << len(mins)) <= len(vs):
        half = 1 << (len(mins) - 1)
        mins.append(np.minimum(mins[-1][:-half], mins[-1][half:]))
        maxs.append(np.maximum(maxs[-1][:-half], maxs[-1][half:]))
    lev = np.frexp(cnt.astype(np.float64))[1] - 1  # floor(log2), cnt >= 1
    mn = np.empty(len(cnt), dtype=vs.dtype)
    mx = np.empty(len(cnt), dtype=vs.dtype)
    for j in np.unique(lev):
        m = lev == j
        l_ = lo[m]
        r_ = hi[m] - (1 << int(j))
        mn[m] = np.minimum(mins[j][l_], mins[j][r_])
        mx[m] = np.maximum(maxs[j][l_], maxs[j][r_])
    return tuple(out) + (mn, mx)


def sliding_window_agg(
    ds,
    *,
    key_col: str,
    ts_col: str,
    val_col: str,
    id_col: str,
    window_us: int,
    chunk_us: int | None = None,
    num_buckets: int = 256,
    extremes: bool = False,
    moments: bool = False,
):
    """For every row, count and sum of ``val_col`` over rows with the
    same ``key_col`` and ts in ``[ts - window_us, ts]`` (SQL
    ``RANGE BETWEEN window_us PRECEDING AND CURRENT ROW``, peers
    included).  ``extremes=True`` adds the frame's min and max
    (sparse-table RMQ inside the same bucket kernel — no extra
    exchange); ``moments=True`` adds the frame's sum of squares
    (``w_sumsq``), from which mean / variance / stddev derive exactly
    without a second pass (``mean = w_sum / w_count``,
    ``var = w_sumsq / w_count - mean**2``).

    ``ds`` columns: ``id_col`` (int64, carried through), ``key_col``
    (int64), ``ts_col`` (int64 units of your choice), ``val_col``
    (numeric; use scaled integers when exact SQL parity matters).
    Returns a Dataset with (id_col, ``w_count``, ``w_sum``[, ``w_sumsq``]
    [, ``w_min``, ``w_max``]), one row per input row.

    Scale: rows shuffle ONCE by hash(key, ts // chunk_us); rows in the
    trailing ``window_us`` of each chunk are additionally replicated as
    a halo to the next chunk (halo fraction = window_us / chunk_us).
    Per-task memory is bounded by the densest (key, chunk) slice, not by
    per-key history.
    """
    if chunk_us is None:
        chunk_us = 4 * window_us
    if chunk_us < window_us:
        raise ValueError(
            f"chunk_us ({chunk_us}) must be >= window_us ({window_us}): "
            "a window may look back at most one chunk boundary"
        )
    span_us = int(chunk_us) + int(window_us) + 1

    def keyed_rows(batch: pa.Table) -> pa.Table:
        rid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column(val_col).to_numpy(zero_copy_only=False)
        chunk = ts // np.int64(chunk_us)
        halo = ts >= (chunk + 1) * np.int64(chunk_us) - np.int64(window_us)
        okey = np.concatenate([key, key[halo]])
        ochunk = np.concatenate([chunk, chunk[halo] + 1])
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(okey, ochunk, num_buckets)),
                "key": pa.array(okey),
                "chunk": pa.array(ochunk),
                "ts": pa.array(np.concatenate([ts, ts[halo]])),
                "val": pa.array(np.concatenate([val, val[halo]])),
                "rid": pa.array(np.concatenate([rid, rid[halo]])),
                "owned": pa.array(
                    np.concatenate(
                        [np.ones(len(rid), dtype=bool), np.zeros(int(halo.sum()), dtype=bool)]
                    )
                ),
            }
        )

    def group(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        chunk = batch.column("chunk").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        val = batch.column("val").to_numpy(zero_copy_only=False)
        owned = batch.column("owned").to_numpy(zero_copy_only=False)
        rid = batch.column("rid").to_numpy(zero_copy_only=False)
        out = window_kernel(
            key, chunk, ts, val, owned, window_us, span_us,
            extremes=extremes, moments=moments,
        )
        cols = {id_col: pa.array(rid[owned]), "w_count": pa.array(out[0]), "w_sum": pa.array(out[1])}
        i = 2
        if moments:
            cols["w_sumsq"] = pa.array(out[i])
            i += 1
        if extremes:
            cols["w_min"] = pa.array(out[i])
            cols["w_max"] = pa.array(out[i + 1])
        return pa.table(cols)

    keyed = ds.map_batches(keyed_rows, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby("bucket").map_groups(group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def asof_kernel(
    lkey: np.ndarray,
    lts: np.ndarray,
    rkey: np.ndarray,
    rts: np.ndarray,
    rid: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized as-of match inside one bucket: for each left row, the
    index of the right row with the same key and the greatest rts <= lts
    (ties on rts broken toward the largest rid).  Returns
    (left_row_indexes_with_match, matched_right_row_indexes).
    """
    if len(lkey) == 0 or len(rkey) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    # dense key ids + dense ts ranks make (key, ts) packable into one
    # int64 composite regardless of the raw key / ts magnitudes
    all_key = np.concatenate([lkey, rkey])
    kd = np.unique(all_key, return_inverse=True)[1].astype(np.int64)
    lkd, rkd = kd[: len(lkey)], kd[len(lkey):]
    all_ts = np.concatenate([lts, rts])
    ranks = np.unique(all_ts, return_inverse=True)[1].astype(np.int64)
    lrank, rrank = ranks[: len(lts)], ranks[len(lts):]
    m = np.int64(len(all_ts) + 1)
    # tie-break: order right rows by (key, rank, rid) so 'right' search
    # lands after the largest rid among equal (key, ts)
    rorder = np.lexsort((rid, rrank, rkd))
    rcomp = rkd[rorder] * m + rrank[rorder]
    pos = np.searchsorted(rcomp, lkd * m + lrank, "right") - 1
    ok = pos >= 0
    ok[ok] &= rkd[rorder[pos[ok]]] == lkd[ok]
    lidx = np.nonzero(ok)[0].astype(np.int64)
    return lidx, rorder[pos[lidx]]


def asof_join(
    left_ds,
    right_ds,
    *,
    key_col: str,
    ts_col: str,
    left_id_col: str,
    right_id_col: str,
    out_right_col: str | None = None,
    num_buckets: int = 256,
):
    """Inner as-of join: each left row matches the right row with the
    same ``key_col`` and the greatest right ts <= left ts (SQL
    ``ASOF JOIN … ON l.key = r.key AND l.ts >= r.ts``); left rows with
    no qualifying right row are dropped.

    Both datasets need (``key_col`` int64, ``ts_col`` int64) plus their
    id column.  Returns a Dataset with (left_id_col, out_right_col
    [default ``right_id_col``]).  Right ids must be unique per
    (key, ts); ts ties resolve to the largest right id.

    Scale: one union + one hash(key) exchange; per-bucket work is one
    lexsort + one searchsorted over that bucket's rows.  Whole keys
    co-locate (see module docstring for the partitioning contract).
    """
    out_right = _out_right_name(left_id_col, right_id_col, out_right_col)

    def side_rows(side_val: int, id_col: str):
        def k(batch: pa.Table) -> pa.Table:
            key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            ts = batch.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
            rid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "bucket": pa.array(_bucket_of(key, np.zeros_like(key), num_buckets)),
                    "key": pa.array(key),
                    "ts": pa.array(ts),
                    "rid": pa.array(rid),
                    "side": pa.array(np.full(len(key), side_val, dtype=np.int8)),
                }
            )

        return k

    def group(batch: pa.Table) -> pa.Table:
        side = batch.column("side").to_numpy(zero_copy_only=False)
        key = batch.column("key").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        rid = batch.column("rid").to_numpy(zero_copy_only=False)
        lm, rm = side == 0, side == 1
        lidx, ridx = asof_kernel(key[lm], ts[lm], key[rm], ts[rm], rid[rm])
        return pa.table(
            {
                left_id_col: pa.array(rid[lm][lidx]),
                out_right: pa.array(rid[rm][ridx]),
            }
        )

    lk = left_ds.map_batches(
        side_rows(0, left_id_col), batch_format="pyarrow", zero_copy_batch=True
    )
    rk = right_ds.map_batches(
        side_rows(1, right_id_col), batch_format="pyarrow", zero_copy_batch=True
    )
    return lk.union(rk).groupby("bucket").map_groups(group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# interval (temporal range) join
# ---------------------------------------------------------------------------


def interval_kernel(
    seg_p: np.ndarray,
    rel_p: np.ndarray,
    ts_p: np.ndarray,
    pid: np.ndarray,
    seg_i: np.ndarray,
    rel_i: np.ndarray,
    end_i: np.ndarray,
    iid: np.ndarray,
    span: int,
    block_elems: int = 4_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized interval-stab inside one bucket: every (point, interval)
    pair of the same segment with ``rel_start <= rel_ts`` and
    ``ts <= end``.  ``rel_i`` is the interval start clipped into the
    segment's chunk, so ``rel_i <= rel_p`` alone proves ``start <= ts``
    (an interval starting before the chunk clips to 0).  Candidates come
    from two searchsorted calls on the composite ``seg * span + rel``
    axis; the pair expansion and the end-filter evaluate in
    ``block_elems``-bounded point slices — the same bounded-temporary
    scheme as join.pip_join_shuffle's join_group.
    """
    empty = (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    if len(seg_p) == 0 or len(seg_i) == 0:
        return empty
    span = np.int64(span)
    comp_i = seg_i * span + rel_i
    order = np.argsort(comp_i, kind="stable")
    ci = comp_i[order]
    comp_p = seg_p * span + rel_p
    lo = np.searchsorted(ci, seg_p * span, "left")
    hi = np.searchsorted(ci, comp_p, "right")
    cnt = hi - lo
    total = int(cnt.sum())
    if total == 0:
        return empty
    cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(cnt)])
    out_p, out_i = [], []
    step = max(1, block_elems)
    i0 = 0
    while i0 < len(comp_p):
        i1 = int(np.searchsorted(cum, cum[i0] + step, "left"))
        i1 = min(max(i1, i0 + 1), len(comp_p))
        c = cnt[i0:i1]
        t = int(cum[i1] - cum[i0])
        if t == 0:
            i0 = i1
            continue
        pr = np.repeat(np.arange(i0, i1, dtype=np.int64), c)
        ir = order[
            np.repeat(lo[i0:i1], c)
            + (np.arange(t, dtype=np.int64) - np.repeat(np.cumsum(c) - c, c))
        ]
        hit = ts_p[pr] <= end_i[ir]
        out_p.append(pid[pr[hit]])
        out_i.append(iid[ir[hit]])
        i0 = i1
    return np.concatenate(out_p), np.concatenate(out_i)


def interval_join(
    points_ds,
    intervals_ds,
    *,
    ts_col: str,
    point_id_col: str,
    interval_id_col: str,
    start_col: str = "istart",
    end_col: str = "iend",
    key_col: str | None = None,
    chunk_us: int,
    num_buckets: int = 256,
    block_elems: int = 4_000_000,
    max_fanout: int | None = 4096,
):
    """Inner temporal range join: every (point, interval) pair with
    ``start <= ts <= end`` (SQL ``JOIN ... ON ts BETWEEN istart AND
    iend``), optionally also equi-matched on ``key_col`` (present on
    BOTH sides under the same name).  The 1-D temporal analogue of the
    PIP join: intervals play the polygons, timestamps play the points.

    Both sides stream.  Points land in exactly one ``(key, ts //
    chunk_us)`` slot; each interval is replicated to every chunk it
    overlaps (fanout = ceil(length / chunk_us) + 1), so pick ``chunk_us``
    on the order of the TYPICAL interval length — the partitioning
    assumption this operator relies on.  A single interval spanning more
    than ``max_fanout`` chunks raises (an open-ended interval would
    otherwise silently explode the exchange); raise the cap or pre-split
    pathological intervals if that is intended.  One union + one
    hash(key, chunk) exchange; per-bucket work is one sort + two
    searchsorted calls + a ``block_elems``-bounded pair expansion.
    Every pair is emitted exactly once (a point lives in one chunk).

    ``points_ds``: (point_id_col int64, ts_col int64[, key_col int64]).
    ``intervals_ds``: (interval_id_col int64, start_col, end_col
    int64[, key_col]).  Returns (point_id_col, interval_id_col).
    """
    if point_id_col == interval_id_col:
        raise ValueError(
            "point_id_col and interval_id_col collide — rename one side"
        )
    chunk = np.int64(chunk_us)
    if chunk <= 0:
        raise ValueError(f"chunk_us must be positive, got {chunk_us}")

    def _key(batch: pa.Table, n: int) -> np.ndarray:
        if key_col is None:
            return np.zeros(n, dtype=np.int64)
        return batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)

    def point_rows(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pid = batch.column(point_id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        key = _key(batch, len(ts))
        ch = ts // chunk
        n = len(ts)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(key, ch, num_buckets)),
                "key": pa.array(key),
                "chunk": pa.array(ch),
                "ts": pa.array(ts),
                "rid": pa.array(pid),
                "iend": pa.array(np.zeros(n, dtype=np.int64)),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def interval_rows(batch: pa.Table) -> pa.Table:
        st = batch.column(start_col).to_numpy(zero_copy_only=False).astype(np.int64)
        en = batch.column(end_col).to_numpy(zero_copy_only=False).astype(np.int64)
        iid = batch.column(interval_id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        key = _key(batch, len(st))
        keep = st <= en  # empty intervals match nothing
        st, en, iid, key = st[keep], en[keep], iid[keep], key[keep]
        c0 = st // chunk
        fan = (en // chunk - c0 + 1).astype(np.int64)
        if max_fanout is not None and len(fan) and int(fan.max()) > max_fanout:
            w = int(np.argmax(fan))
            raise ValueError(
                f"interval {iid[w]} spans {int(fan[w])} chunks of {chunk_us} "
                f"(> max_fanout={max_fanout}); raise max_fanout, enlarge "
                "chunk_us, or pre-split pathological intervals"
            )
        idx = np.repeat(np.arange(len(st), dtype=np.int64), fan)
        off = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.cumsum(fan) - fan, fan
        )
        ch = c0[idx] + off
        rkey = key[idx]
        # start clipped into each replica's chunk: <= rel_ts proves start <= ts
        rel_start = np.maximum(st[idx] - ch * chunk, 0)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(rkey, ch, num_buckets)),
                "key": pa.array(rkey),
                "chunk": pa.array(ch),
                "ts": pa.array(rel_start),  # rel start travels in 'ts'
                "rid": pa.array(iid[idx]),
                "iend": pa.array(en[idx]),
                "side": pa.array(np.zeros(len(idx), dtype=np.int8)),
            }
        )

    def group(batch: pa.Table) -> pa.Table:
        side = batch.column("side").to_numpy(zero_copy_only=False)
        key = batch.column("key").to_numpy(zero_copy_only=False)
        ch = batch.column("chunk").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        rid = batch.column("rid").to_numpy(zero_copy_only=False)
        iend = batch.column("iend").to_numpy(zero_copy_only=False)
        pm, im = side == 1, side == 0
        # dense (key, chunk) segment ids shared across both sides
        kd = np.unique(key, return_inverse=True)[1].astype(np.int64)
        cd = np.unique(ch, return_inverse=True)[1].astype(np.int64)
        seg = kd * (np.int64(cd.max()) + 1 if len(cd) else np.int64(1)) + cd
        rel_p = ts[pm] - ch[pm] * chunk  # in [0, chunk)
        pp, ii = interval_kernel(
            seg[pm], rel_p, ts[pm], rid[pm],
            seg[im], ts[im], iend[im], rid[im],
            span=int(chunk), block_elems=block_elems,
        )
        return pa.table({point_id_col: pa.array(pp), interval_id_col: pa.array(ii)})

    pk = points_ds.map_batches(point_rows, batch_format="pyarrow", zero_copy_batch=True)
    ik = intervals_ds.map_batches(
        interval_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return pk.union(ik).groupby("bucket").map_groups(group, batch_format="pyarrow")


def _out_right_name(
    left_id_col: str, right_id_col: str, out_right_col: str | None
) -> str:
    """Resolve the output column for the matched right id, refusing a
    collision with the left id column (a duplicate name would silently
    drop the left ids in the pa.table dict)."""
    out_right = out_right_col or right_id_col
    if out_right == left_id_col:
        raise ValueError(
            f"output right-id column {out_right!r} collides with "
            f"left_id_col — pass out_right_col to disambiguate "
            "(e.g. both sides share an id column name)"
        )
    return out_right


def _latest_per_key_chunk(
    key: np.ndarray, chunk: np.ndarray, ts: np.ndarray, rid: np.ndarray
):
    """Reduce rows to one winner per (key, chunk): the max (ts, rid).
    Vectorized: lexsort + take-last-per-group."""
    if len(key) == 0:
        return key, chunk, ts, rid
    order = np.lexsort((rid, ts, chunk, key))
    k, c = key[order], chunk[order]
    last = np.nonzero(
        np.concatenate([(k[1:] != k[:-1]) | (c[1:] != c[:-1]), [True]])
    )[0]
    sel = order[last]
    return key[sel], chunk[sel], ts[sel], rid[sel]


def asof_join_chunked(
    left_ds,
    right_ds,
    *,
    key_col: str,
    ts_col: str,
    left_id_col: str,
    right_id_col: str,
    chunk_us: int,
    out_right_col: str | None = None,
    num_buckets: int = 256,
):
    """As-of join with BOUNDED per-task memory: identical semantics to
    ``asof_join`` (greatest right ts <= left ts per key, max-rid
    tie-break, inner), but co-locating only ``(key, time-chunk)`` slices
    instead of whole keys.

    A right row is visible to left rows of LATER chunks only through a
    per-(key, left-chunk) *boundary snapshot* — the latest right row
    strictly before that chunk's start.  Snapshots are computed from
    per-batch partials (one candidate row per (key, chunk) per batch, so
    their volume scales with batch count x active keys, not event
    volume) in one small key-bucketed exchange, then replicated as halo
    rows into exactly the left chunks that exist.  The main exchange
    then co-groups per (key, chunk): in-chunk right rows + one snapshot
    row answer every left row.  Three exchanges total, two of them over
    reduced partials.

    Use this over ``asof_join`` when a single key's right-side history
    can outgrow one task (e.g. one hot instrument's full quote stream).
    """
    out_right = _out_right_name(left_id_col, right_id_col, out_right_col)

    def chunk_side_rows(side_val: int, id_col: str):
        def k(batch: pa.Table) -> pa.Table:
            key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            ts = batch.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
            rid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            chunk = ts // np.int64(chunk_us)
            return pa.table(
                {
                    "bucket": pa.array(_bucket_of(key, chunk, num_buckets)),
                    "key": pa.array(key),
                    "chunk": pa.array(chunk),
                    "ts": pa.array(ts),
                    "rid": pa.array(rid),
                    "side": pa.array(np.full(len(key), side_val, dtype=np.int8)),
                }
            )

        return k

    # --- small-partial plane: left chunk presence + right per-chunk latest
    def left_presence(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = ts // np.int64(chunk_us)
        if len(key) == 0:
            k, c = key, chunk
        else:
            order = np.lexsort((chunk, key))
            k, c = key[order], chunk[order]
            keep = np.concatenate([[True], (k[1:] != k[:-1]) | (c[1:] != c[:-1])])
            k, c = k[keep], c[keep]
        return pa.table(
            {
                "kb": pa.array(_bucket_of(k, np.zeros_like(k), num_buckets)),
                "key": pa.array(k),
                "chunk": pa.array(c),
                "ts": pa.array(np.zeros(len(k), dtype=np.int64)),
                "rid": pa.array(np.zeros(len(k), dtype=np.int64)),
                "pside": pa.array(np.zeros(len(k), dtype=np.int8)),
            }
        )

    def right_latest(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rid = batch.column(right_id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = ts // np.int64(chunk_us)
        k, c, t, r = _latest_per_key_chunk(key, chunk, ts, rid)
        return pa.table(
            {
                "kb": pa.array(_bucket_of(k, np.zeros_like(k), num_buckets)),
                "key": pa.array(k),
                "chunk": pa.array(c),
                "ts": pa.array(t),
                "rid": pa.array(r),
                "pside": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    def make_halos(batch: pa.Table) -> pa.Table:
        pside = batch.column("pside").to_numpy(zero_copy_only=False)
        key = batch.column("key").to_numpy(zero_copy_only=False)
        chunk = batch.column("chunk").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        rid = batch.column("rid").to_numpy(zero_copy_only=False)
        pm, rm = pside == 0, pside == 1
        empty = pa.table(
            {
                "bucket": pa.array([], type=pa.int64()),
                "key": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()),
                "rid": pa.array([], type=pa.int64()),
                "side": pa.array([], type=pa.int8()),
            }
        )
        if not pm.any() or not rm.any():
            return empty
        # global per-(key, chunk) right winners inside this key-bucket
        rk, rc, rt, rr = _latest_per_key_chunk(key[rm], chunk[rm], ts[rm], rid[rm])
        # presence pairs may repeat across batches: dedup
        order = np.lexsort((chunk[pm], key[pm]))
        pk, pc = key[pm][order], chunk[pm][order]
        keep = np.concatenate([[True], (pk[1:] != pk[:-1]) | (pc[1:] != pc[:-1])])
        pk, pc = pk[keep], pc[keep]
        # snapshot for left chunk c = latest right row in chunks < c:
        # an as-of match on the chunk axis (rc <= pc - 1), tie-broken by
        # (ts, rid) via the pre-reduced winners' natural chunk order
        lidx, ridx = asof_kernel(pk, pc - 1, rk, rc, np.arange(len(rk), dtype=np.int64))
        if len(lidx) == 0:
            return empty
        hk, hc = pk[lidx], pc[lidx]
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(hk, hc, num_buckets)),
                "key": pa.array(hk),
                "chunk": pa.array(hc),
                "ts": pa.array(rt[ridx]),
                "rid": pa.array(rr[ridx]),
                "side": pa.array(np.ones(len(hk), dtype=np.int8)),
            }
        )

    def group(batch: pa.Table) -> pa.Table:
        side = batch.column("side").to_numpy(zero_copy_only=False)
        key = batch.column("key").to_numpy(zero_copy_only=False)
        chunk = batch.column("chunk").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        rid = batch.column("rid").to_numpy(zero_copy_only=False)
        lm, rm = side == 0, side == 1
        # the kernel keys must separate (key, chunk) slices: two rows of
        # the same key in different chunks must not see each other (the
        # snapshot row already carries the older chunks' history)
        kd = np.unique(key, return_inverse=True)[1].astype(np.int64)
        cd = np.unique(chunk, return_inverse=True)[1].astype(np.int64)
        seg = kd * (cd.max() + np.int64(1)) + cd
        lidx, ridx = asof_kernel(seg[lm], ts[lm], seg[rm], ts[rm], rid[rm])
        return pa.table(
            {
                left_id_col: pa.array(rid[lm][lidx]),
                out_right: pa.array(rid[rm][ridx]),
            }
        )

    lk = left_ds.map_batches(
        chunk_side_rows(0, left_id_col), batch_format="pyarrow", zero_copy_batch=True
    )
    rk = right_ds.map_batches(
        chunk_side_rows(1, right_id_col), batch_format="pyarrow", zero_copy_batch=True
    )
    lp = left_ds.map_batches(left_presence, batch_format="pyarrow", zero_copy_batch=True)
    rl = right_ds.map_batches(right_latest, batch_format="pyarrow", zero_copy_batch=True)
    halos = (
        lp.union(rl)
        .groupby("kb")
        .map_groups(make_halos, batch_format="pyarrow")
    )
    return (
        lk.union(rk)
        .union(halos)
        .groupby("bucket")
        .map_groups(group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------


def sessionize_kernel(
    key: np.ndarray, ts: np.ndarray, eid: np.ndarray, gap_us: int
):
    """Vectorized sessionization of one bucket: events ordered by
    (key, ts, id); a new session starts at each key's first event and
    whenever the gap to the SAME key's previous event exceeds
    ``gap_us``.  Returns (order, session_seq aligned to the input order)
    where session_seq is 1-based per key."""
    order = np.lexsort((eid, ts, key))
    k, t = key[order], ts[order]
    n = len(k)
    new_key = np.ones(n, dtype=bool)
    brk = np.ones(n, dtype=bool)
    if n > 1:
        new_key[1:] = k[1:] != k[:-1]
        brk[1:] = new_key[1:] | ((t[1:] - t[:-1]) > gap_us)
    sid = np.cumsum(brk)  # global (bucket-local) session counter
    key_starts = np.nonzero(new_key)[0]
    key_lens = np.diff(np.concatenate([key_starts, [n]]))
    base = np.repeat(sid[key_starts], key_lens)
    seq_sorted = sid - base + 1
    seq = np.empty(n, dtype=np.int64)
    seq[order] = seq_sorted
    return order, seq


def sessionize(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_us: int,
    num_buckets: int = 256,
    emit: str = "events",
):
    """Split each key's event stream into sessions separated by
    inactivity gaps > ``gap_us`` (the classic web-log / user-activity
    segmentation; SQL twin: ``sum(gap_break) OVER (PARTITION BY key
    ORDER BY ts, id)``).

    ``emit="events"`` returns one row per event: (id_col, key_col,
    session_seq int64, 1-based per key).  ``emit="sessions"`` returns one
    row per session: (key_col, session_seq, n_events, duration_us,
    start_us).  Ordering ties on equal ts break by ascending id, so the
    result is deterministic for any input layout.

    Scale: whole-key buckets (the as-of contract — one key's events fit
    a task; keys hash over ``num_buckets`` so only per-KEY volume
    matters), one exchange, one lexsort+cumsum kernel per bucket.
    """
    if emit not in ("events", "sessions"):
        raise ValueError(f"emit must be 'events' or 'sessions', got {emit!r}")

    def keyed(batch: pa.Table) -> pa.Table:
        key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        eid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    _bucket_of(key, np.zeros_like(key), num_buckets)
                ),
                "key": pa.array(key),
                "ts": pa.array(ts),
                "eid": pa.array(eid),
            }
        )

    def group(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        eid = batch.column("eid").to_numpy(zero_copy_only=False)
        order, seq = sessionize_kernel(key, ts, eid, gap_us)
        if emit == "events":
            return pa.table(
                {
                    id_col: pa.array(eid),
                    key_col: pa.array(key),
                    "session_seq": pa.array(seq),
                }
            )
        # session rows: contiguous runs of the sorted view
        k, t = key[order], ts[order]
        seq_sorted = seq[order]
        n = len(k)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (k[1:] != k[:-1]) | (seq_sorted[1:] != seq_sorted[:-1])
        starts = np.nonzero(brk)[0]
        lens = np.diff(np.concatenate([starts, [n]]))
        ends = starts + lens - 1
        return pa.table(
            {
                key_col: pa.array(k[starts]),
                "session_seq": pa.array(seq_sorted[starts]),
                "n_events": pa.array(lens.astype(np.int64)),
                "duration_us": pa.array((t[ends] - t[starts]).astype(np.int64)),
                "start_us": pa.array(t[starts].astype(np.int64)),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    return keyed_ds.groupby("bucket").map_groups(group, batch_format="pyarrow")
