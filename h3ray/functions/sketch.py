"""Count-min sketch: mergeable approximate frequency counts.

The frequency-domain sibling of the HLL cardinality sketch in
sampling.py (same partial/merge architecture): each batch folds its keys
into a fixed d x w counter matrix (one row per independent hash), the
matrices merge by elementwise SUM (associative + commutative — any
tree/stream merge order is exact), and a point query returns
min over d of row_i[h_i(key)], which is always >= the true count and
within eps*N with probability 1 - delta for w = e/eps, d = ln(1/delta).

Scale contract: the whole-dataset frequency table NEVER materializes —
a 100 TB stream reduces to one 4 x 16384 int64 matrix (512 KiB) per
block, tree-merged; point queries then run anywhere the small sketch is
broadcast.  No counterpart in the reference (h3ronpy has no sketches);
training-data tier: heavy-hitter domains, hot-cell detection, skew
pre-detection before choosing join salts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CMS_D = 4
CMS_W = 16384  # eps ~= e/w ~= 1.7e-4 of total mass per row

# distinct odd multipliers per row (splitmix-style finalizer seeds)
_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0xD6E8FEB86659FD93],
    dtype=np.uint64,
)


def _cms_hash(keys: np.ndarray, row: int) -> np.ndarray:
    """Row-specific mix of uint64 keys -> column indexes in [0, CMS_W)."""
    with np.errstate(over="ignore"):
        h = (keys ^ _SEEDS[row]) * _SEEDS[(row + 1) % CMS_D]
        h ^= h >> np.uint64(31)
        h *= _SEEDS[(row + 2) % CMS_D]
        h ^= h >> np.uint64(29)
    return (h & np.uint64(CMS_W - 1)).astype(np.int64)


def cms_partial(batch: pa.Table, col: str = "cell") -> pa.Table:
    """Per-batch count-min partial: ONE row holding the d*w counter
    matrix as a fixed-size list (the mergeable unit)."""
    keys = batch.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
    mat = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for r in range(CMS_D):
        np.add.at(mat[r], _cms_hash(keys, r), 1)
    return pa.table(
        {
            "cms": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), CMS_D * CMS_W
            ),
            "n": pa.array([np.int64(len(keys))]),
        }
    )


def cms_merge(partials: pa.Table) -> tuple[np.ndarray, int]:
    """Merge partial rows by sum -> ((d, w) matrix, total key count)."""
    if partials.num_rows == 0:
        return np.zeros((CMS_D, CMS_W), dtype=np.int64), 0
    flat = partials.column("cms").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    mat = flat.reshape(-1, CMS_D, CMS_W).sum(axis=0)
    n = int(partials.column("n").to_numpy(zero_copy_only=False).sum())
    return mat, n


def cms_query(mat: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Estimated count per key: min over the d rows (>= true count)."""
    keys = np.asarray(keys, dtype=np.uint64)
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CMS_D):
        est = np.minimum(est, mat[r, _cms_hash(keys, r)])
    return est


def heavy_keys(ds, col: str = "cell", threshold: int = 10_000,
               fanin: int = 16) -> np.ndarray:
    """Enumerate keys whose frequency is (approximately) >= threshold:
    pass 1 builds the global sketch, pass 2 re-scans and keeps each
    batch's distinct keys whose estimate clears the threshold.  The
    one-sided bound guarantees NO false negatives (a true-heavy key
    always estimates >= its count); rare false positives (collision
    lift) only cost a little extra salting downstream.  The result is
    small by construction (<= total/threshold true keys + collisions),
    so the driver-side unique is bounded.  Two streaming passes, no
    key shuffle — this is the skew pre-detector the salted joins use."""
    import ray

    mat, _ = cms_from_dataset(ds, col, fanin)
    mat_ref = ray.put(mat)

    def probe(batch: pa.Table) -> pa.Table:
        m = mat_ref
        if isinstance(m, ray.ObjectRef):
            m = ray.get(m)
        keys = np.unique(
            batch.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        hot = keys[cms_query(m, keys) >= threshold]
        return pa.table({col: pa.array(hot.astype(np.int64))})

    out = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    tables = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        pa.concat_tables(tables).column(col).to_numpy(zero_copy_only=False)
    ).astype(np.uint64)


def _merge_batch(batch: pa.Table) -> pa.Table:
    """Fold many partial rows into one (runs inside Ray workers)."""
    mat, n = cms_merge(batch)
    return pa.table(
        {
            "cms": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), CMS_D * CMS_W
            ),
            "n": pa.array([np.int64(n)]),
        }
    )


def cms_from_dataset(ds, col: str = "cell", fanin: int = 16) -> tuple[np.ndarray, int]:
    """Build the global sketch over a Dataset column: per-block partials
    (fixed 512 KiB each regardless of block size) tree-reduced INSIDE
    Ray — one merge level collapses the partial stream to ``fanin``
    rows, so the driver pulls fanin * 512 KiB no matter how many blocks
    the input has (pulling every block's partial would be blocks x
    512 KiB — hundreds of GiB at 100 TB scale)."""
    parts = ds.map_batches(
        lambda b: cms_partial(b, col), batch_format="pyarrow", zero_copy_batch=True
    )
    level1 = parts.repartition(fanin).map_batches(
        _merge_batch, batch_format="pyarrow", batch_size=None
    )
    import ray

    tables = [t for t in ray.get(level1.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.zeros((CMS_D, CMS_W), dtype=np.int64), 0
    return cms_merge(pa.concat_tables(tables))
