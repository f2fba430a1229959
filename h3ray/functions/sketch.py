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


def cms_from_dataset(ds, col: str = "cell") -> tuple[np.ndarray, int]:
    """Build the global sketch over a Dataset column: per-block partials
    (fixed 512 KiB each regardless of block size) reduced on the driver —
    the stream itself never materializes."""
    parts = ds.map_batches(
        lambda b: cms_partial(b, col), batch_format="pyarrow", zero_copy_batch=True
    )
    import ray

    tables = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.zeros((CMS_D, CMS_W), dtype=np.int64), 0
    return cms_merge(pa.concat_tables(tables))
