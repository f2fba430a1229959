"""Distributed per-group top-N selection.

``top_n_per_group`` is SQL's ``row_number() OVER (PARTITION BY key
ORDER BY val DESC, id ASC) <= n`` as a two-stage Ray Data plan:

  stage 1 (map, no exchange): every block reduces to AT MOST n rows per
  key present in the block — the per-block partial top-n.  A block with
  K distinct keys emits <= K*n rows no matter how many rows it held, so
  the exchange volume scales with (keys x n), not input volume.

  stage 2 (one hash(key) exchange): buckets co-group whole keys;
  one vectorized kernel (lexsort + group-boundary rank) finalizes each
  key's top-n and emits its 1-based rank.

Correctness of the partial: any row outside a block's per-key top-n is
dominated by n better rows of the same key in that block alone, so it
can never enter the global top-n — discarding it early is lossless
(the classic combiner argument, same shape as pre-aggregation before a
groupby).

Determinism: the total order is (val DESC, id ASC); ids must be unique
per key for a stable result.  Integer values order via bitwise NOT
(``~x = -x-1``, an order-reversing bijection with NO overflow at
int64 min, unlike negation); floats via negation.  Keys may be any
dtype: integers bucket by splitmix hash; strings/binaries by FNV-1a
over their UTF-8 bytes (both vectorized); the rank kernel only needs
group IDENTITY, so string keys densify through Arrow dictionary
encoding — never a Python compare.

No counterpart in the reference (h3ronpy has no ranking ops); serves
the training-data tier (best-k documents per source/domain, top scoring
near-duplicates per cluster, hardest examples per shard).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._util import bucket_single


def _descending_key(val: np.ndarray) -> np.ndarray:
    """An ascending-sortable proxy whose order is val DESC."""
    if np.issubdtype(val.dtype, np.integer):
        return ~val
    return -val


def _group_ids_and_buckets(col, num_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(dense within-batch group id, cross-batch deterministic bucket)
    for a key column of any hot dtype.  Group ids are only identity —
    their numeric order is meaningless — so string keys can use
    dictionary indices (vectorized) instead of a value sort."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(
        t
    ) or pa.types.is_large_binary(t):
        from ._strkern import fnv1a_segments, utf8_view

        data, off = utf8_view(col)
        h = fnv1a_segments(data, off).astype(np.int64)
        enc = col.dictionary_encode()
        gid = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return gid, bucket_single(h, num_buckets)
    key = col.to_numpy(zero_copy_only=False).astype(np.int64)
    return key, bucket_single(key, num_buckets)


def topn_kernel(
    gid: np.ndarray, val: np.ndarray, rid: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Indexes of each group's top-``n`` rows by (val DESC, id ASC), plus
    their 1-based ranks.  One lexsort + one boundary subtraction."""
    if len(gid) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    order = np.lexsort((rid, _descending_key(val), gid))
    ks = gid[order]
    starts = np.concatenate([[True], ks[1:] != ks[:-1]])
    # rank within the group = position - position of the group's start
    pos = np.arange(len(ks), dtype=np.int64)
    rank = pos - np.maximum.accumulate(np.where(starts, pos, 0)) + 1
    keep = rank <= n
    return order[keep], rank[keep]


def top_n_per_group(
    ds,
    *,
    key_col: str,
    val_col: str,
    id_col: str,
    n: int,
    rank_col: str = "rank",
    num_buckets: int = 256,
):
    """Per ``key_col``, the ``n`` rows with the largest ``val_col``
    (ties toward the smallest ``id_col``), with a 1-based ``rank_col``.

    Returns a Dataset with (key_col, id_col, val_col, rank_col).
    Exchange volume is bounded by (distinct keys x n), independent of
    input rows (see module docstring).  Whole keys co-locate in stage 2;
    with <= n rows surviving per key per upstream block that is at most
    n x num_upstream_blocks rows per key — bounded, but pick
    ``num_buckets`` so a bucket's share of hot keys fits a task.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if len({key_col, val_col, id_col, rank_col}) < 4:
        raise ValueError("key/val/id/rank column names must be distinct")

    def partial(batch: pa.Table) -> pa.Table:
        gid, bucket = _group_ids_and_buckets(batch.column(key_col), num_buckets)
        val = batch.column(val_col).to_numpy(zero_copy_only=False)
        rid = batch.column(id_col).to_numpy(zero_copy_only=False)
        idx, _ = topn_kernel(gid, val, rid, n)
        kept = batch.select([key_col, val_col, id_col]).take(
            pa.array(idx, type=pa.int64())
        )
        return kept.append_column("bucket", pa.array(bucket[idx]))

    def final(batch: pa.Table) -> pa.Table:
        gid, _ = _group_ids_and_buckets(batch.column(key_col), num_buckets)
        val = batch.column(val_col).to_numpy(zero_copy_only=False)
        rid = batch.column(id_col).to_numpy(zero_copy_only=False)
        idx, rank = topn_kernel(gid, val, rid, n)
        out = batch.select([key_col, id_col, val_col]).take(
            pa.array(idx, type=pa.int64())
        )
        return out.append_column(rank_col, pa.array(rank))

    kept = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return kept.groupby("bucket").map_groups(final, batch_format="pyarrow")


# --- per-group mode -----------------------------------------------------------


def mode_kernel(
    key: np.ndarray, val: np.ndarray, cnt: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(key, mode value, mode count) per key from (key, value, count)
    rows (values may repeat across upstream blocks; counts sum first).
    Tie-break: highest count, then SMALLEST value — deterministic and
    SQL-expressible (ORDER BY count DESC, value ASC)."""
    if len(key) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    order = np.lexsort((val, key))
    k, v, c = key[order], val[order], cnt[order]
    first = np.concatenate([[True], (k[1:] != k[:-1]) | (v[1:] != v[:-1])])
    gid = np.cumsum(first) - 1
    cm = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
    np.add.at(cm, gid, c)
    k, v, c = k[first], v[first], cm
    # winner per key: sort by (key, count DESC, value ASC), take firsts
    order2 = np.lexsort((v, ~c, k))
    ks = k[order2]
    head = np.concatenate([[True], ks[1:] != ks[:-1]])
    sel = order2[head]
    return k[sel], v[sel], c[sel]


def mode_per_group(
    ds,
    *,
    key_col: str,
    val_col: str,
    num_buckets: int = 64,
    count_col: str = "mode_count",
    out_col: str = "mode_val",
):
    """Most frequent ``val_col`` per ``key_col`` (int64 both), count-desc
    then smallest-value tie-break.  Same two-stage shape as
    quantiles.exact_group_quantiles: per-block (key, value) count
    combiner (exchange scales with per-block distincts, not rows), one
    hash(key) exchange, vectorized winner kernel.  Returns (key_col,
    ``out_col``, ``count_col``)."""
    from .quantiles import value_count_partial

    def partial(batch: pa.Table) -> pa.Table:
        return value_count_partial(batch, key_col, val_col, num_buckets)

    def final(batch: pa.Table) -> pa.Table:
        k, v, c = mode_kernel(
            batch.column("key").to_numpy(zero_copy_only=False),
            batch.column("val").to_numpy(zero_copy_only=False),
            batch.column("cnt").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {key_col: pa.array(k), out_col: pa.array(v), count_col: pa.array(c)}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("bucket").map_groups(final, batch_format="pyarrow")
