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

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _bucket_of(a: np.ndarray, b: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of two int64 key parts (same mix family as
    join.pip_join_shuffle)."""
    with np.errstate(over="ignore"):
        h = (
            a.astype(np.uint64) + _MIX1 * (b.astype(np.uint64) + np.uint64(1))
        ) * _MIX2
    return ((h >> np.uint64(29)) % np.uint64(num_buckets)).astype(np.int64)


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
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized sliding-window count+sum for the OWNED rows of one
    bucket.

    Rows belong to (key, chunk) segments; halo rows (``owned == False``)
    are last-window_us replicas from the previous chunk carrying the NEXT
    chunk's label, so every owned row's [ts - window_us, ts] range lies
    entirely inside its own segment.  One lexsort orders segments into
    disjoint composite-integer blocks (rel-ts packed per segment, span
    bounded by ``span_us``), then two searchsorted calls + one cumsum
    answer every row's frame.  Returns (count, sum) aligned to the owned
    rows in input order.
    """
    if len(key) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
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
    cnt = hi - lo
    tot = cum[hi] - cum[lo]
    return cnt.astype(np.int64), tot


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
):
    """For every row, count and sum of ``val_col`` over rows with the
    same ``key_col`` and ts in ``[ts - window_us, ts]`` (SQL
    ``RANGE BETWEEN window_us PRECEDING AND CURRENT ROW``, peers
    included).

    ``ds`` columns: ``id_col`` (int64, carried through), ``key_col``
    (int64), ``ts_col`` (int64 units of your choice), ``val_col``
    (numeric; use scaled integers when exact SQL parity matters).
    Returns a Dataset with (id_col, ``w_count``, ``w_sum``), one row per
    input row.

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
        cnt, tot = window_kernel(key, chunk, ts, val, owned, window_us, span_us)
        return pa.table(
            {id_col: pa.array(rid[owned]), "w_count": pa.array(cnt), "w_sum": pa.array(tot)}
        )

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
    out_right = out_right_col or right_id_col

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
