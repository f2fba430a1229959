"""Distributed quantiles: exact per-group discrete quantiles via
value-count reduction, and a mergeable histogram sketch for unbounded
value domains.

``exact_group_quantiles`` computes SQL's ``quantile_disc(v, q) GROUP BY
key`` exactly, with NO driver materialization:

  stage 1 (map, combiner): every block reduces to its distinct
  ``(key, value) -> count`` pairs, so exchange volume scales with
  per-block distincts, not rows.

  stage 2 (one hash(key) exchange): buckets co-group whole keys; one
  vectorized kernel (lexsort + segment cumsum + searchsorted) finalizes
  every key's quantiles at once.

The rank rule matches DuckDB's ``quantile_disc``: the value whose
1-based rank is ``max(1, ceil(q * n))`` in ascending order.  Quantile
fractions should be exact binary fractions (0.25, 0.5, 0.875, ...) so
``ceil(q * n)`` is reproducible across engines; the qmil int encoding
(q * 1000) keeps oracle outputs integer-only.

Partitioning contract: one key's DISTINCT values must fit a task (the
value-count combiner means raw row count is irrelevant).  For keys with
unbounded distinct values use ``quantile_sketch``: a fixed-size
histogram partial per block (merge = elementwise sum, associative and
commutative), tree-reduced in Ray like the count-min sketch; the
returned estimate is the smallest bin upper edge whose cumulative count
reaches the target rank, so the TRUE quantile lies in that bin — the
rank error is bounded by that bin's own count (reported alongside).

No counterpart in the reference; training-data tier: length/quality
score distributions per source, token-count percentiles for packing
budgets, outlier thresholds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._util import bucket_single as _bucket_of


def value_count_partial(
    batch: pa.Table, key_col: str, val_col: str, num_buckets: int
) -> pa.Table:
    """Per-block (key, value) -> count combiner rows with their key
    bucket: the shared stage-1 of exact_group_quantiles and
    ranking.mode_per_group.  Output volume = the block's distinct
    (key, value) pairs, not its row count."""
    key = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    val = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((val, key))
    k, v = key[order], val[order]
    first = np.concatenate([[True], (k[1:] != k[:-1]) | (v[1:] != v[:-1])])
    gid = np.cumsum(first) - 1
    cnt = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, dtype=np.int64)
    np.add.at(cnt, gid, 1)
    k, v = k[first], v[first]
    return pa.table(
        {
            "bucket": pa.array(_bucket_of(k, num_buckets)),
            "key": pa.array(k),
            "val": pa.array(v),
            "cnt": pa.array(cnt),
        }
    )


def disc_rank(q: float, n: np.ndarray | int) -> np.ndarray | int:
    """DuckDB quantile_disc's 1-based target rank: max(1, ceil(q*n))."""
    return np.maximum(1, np.ceil(q * np.asarray(n, dtype=np.float64))).astype(
        np.int64
    )


def group_quantile_kernel(
    key: np.ndarray, val: np.ndarray, cnt: np.ndarray, qs: tuple[float, ...]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(key, qmil, value) triples for every key in the bucket, from
    (key, value, count) rows (values may repeat across upstream blocks;
    counts sum first).  One lexsort + cumsum + one searchsorted per q."""
    if len(key) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=val.dtype if len(val) else np.int64)
    order = np.lexsort((val, key))
    k, v, c = key[order], val[order], cnt[order]
    # merge duplicate (key, value) rows from different upstream blocks
    first = np.concatenate([[True], (k[1:] != k[:-1]) | (v[1:] != v[:-1])])
    gid = np.cumsum(first) - 1
    cm = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
    np.add.at(cm, gid, c)
    k, v, c = k[first], v[first], cm
    cum = np.cumsum(c)
    starts = np.concatenate([[True], k[1:] != k[:-1]])
    seg_start = np.nonzero(starts)[0]
    seg_end = np.concatenate([seg_start[1:], [len(k)]])
    base = np.where(seg_start > 0, cum[seg_start - 1], 0)
    n_per_key = cum[seg_end - 1] - base
    out_k, out_q, out_v = [], [], []
    for q in qs:
        target = base + disc_rank(q, n_per_key)
        # cum is strictly increasing (counts > 0): the first index where
        # cum >= target is the quantile value's row, always inside the
        # key's own segment because target <= cum[seg_end - 1]
        idx = np.searchsorted(cum, target, "left")
        out_k.append(k[seg_start])
        out_q.append(np.full(len(seg_start), int(round(q * 1000)), dtype=np.int64))
        out_v.append(v[idx])
    return np.concatenate(out_k), np.concatenate(out_q), np.concatenate(out_v)


def exact_group_quantiles(
    ds,
    *,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    num_buckets: int = 64,
):
    """Exact discrete quantiles of ``val_col`` per ``key_col`` (int64
    keys and values).  Returns a Dataset with (key_col, ``qmil``
    = q * 1000 as int64, ``q_val``), |keys| * |qs| rows.  See module
    docstring for the two-stage plan and the distinct-values contract.
    """

    def partial(batch: pa.Table) -> pa.Table:
        return value_count_partial(batch, key_col, val_col, num_buckets)

    def final(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        val = batch.column("val").to_numpy(zero_copy_only=False)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        k, qmil, v = group_quantile_kernel(key, val, cnt, qs)
        return pa.table(
            {key_col: pa.array(k), "qmil": pa.array(qmil), "q_val": pa.array(v)}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("bucket").map_groups(final, batch_format="pyarrow")


# --- histogram quantile sketch ------------------------------------------------


def histogram_partial(
    batch: pa.Table, col: str, lo: int, hi: int, nbins: int
) -> pa.Table:
    """Per-batch histogram partial over [lo, hi): ``nbins`` equal-width
    bins plus underflow/overflow slots, ONE fixed-size row (the
    mergeable unit; merge = elementwise sum)."""
    v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
    width = (hi - lo) / nbins
    idx = np.clip(np.floor((v - lo) / width).astype(np.int64), -1, nbins) + 1
    counts = np.zeros(nbins + 2, dtype=np.int64)
    np.add.at(counts, idx, 1)
    return pa.table(
        {"hist": pa.FixedSizeListArray.from_arrays(pa.array(counts), nbins + 2)}
    )


def _hist_merge(partials: pa.Table) -> np.ndarray:
    flat = partials.column("hist").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    n = partials.column("hist").type.list_size
    return flat.reshape(-1, n).sum(axis=0)


def quantile_sketch(ds, col: str, lo: int, hi: int, nbins: int = 4096,
                    fanin: int = 16) -> np.ndarray:
    """Global histogram over a Dataset column, tree-reduced in Ray (the
    cms_from_dataset scheme: the driver pulls ``fanin`` fixed-size
    partials regardless of block count).  Returns the (nbins + 2) count
    vector: [underflow, bins..., overflow]."""
    if nbins <= 0:
        raise ValueError(f"nbins must be positive, got {nbins}")
    if not hi > lo:
        # a zero/negative width would be a ZeroDivisionError (or silent
        # nonsense bins) deep inside a Ray task — fail at the entry point
        raise ValueError(
            f"quantile_sketch requires hi > lo, got lo={lo!r} hi={hi!r}"
        )
    parts = ds.map_batches(
        lambda b: histogram_partial(b, col, lo, hi, nbins),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def merge_rows(batch: pa.Table) -> pa.Table:
        m = _hist_merge(batch)
        return pa.table(
            {"hist": pa.FixedSizeListArray.from_arrays(pa.array(m), len(m))}
        )

    level1 = parts.repartition(fanin).map_batches(
        merge_rows, batch_format="pyarrow", batch_size=None
    )
    import ray

    tables = [t for t in ray.get(level1.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.zeros(nbins + 2, dtype=np.int64)
    return _hist_merge(pa.concat_tables(tables))


def sketch_quantile(
    counts: np.ndarray, lo: int, hi: int, q: float
) -> tuple[float, int]:
    """(estimate, rank_error_bound) from a quantile_sketch vector.

    The estimate is the upper edge of the first bin whose cumulative
    count reaches rank ``max(1, ceil(q*n))``; the true q-quantile lies
    inside that bin, so the estimate's own rank differs from the target
    by at most the bin's count (the returned bound).  Underflow resolves
    to ``lo``, overflow to ``hi`` (with the slot count as the bound).
    """
    n = int(counts.sum())
    if n == 0:
        raise ValueError("empty sketch")
    if not hi > lo:
        raise ValueError(
            f"sketch_quantile requires hi > lo, got lo={lo!r} hi={hi!r}"
        )
    nbins = len(counts) - 2
    width = (hi - lo) / nbins
    target = int(disc_rank(q, n))
    cum = np.cumsum(counts)
    slot = int(np.searchsorted(cum, target, "left"))
    err = int(counts[slot])
    if slot == 0:
        return float(lo), err
    if slot == nbins + 1:
        return float(hi), err
    return float(lo + slot * width), err
