"""Approximate nearest-neighbor search over an embedding column.

Two paths:
  * brute-force cosine top-k — the exactness baseline: the query matrix is
    broadcast once (ray.put); every batch computes a matmul against it and
    emits per-query partial top-k; partials merge in one bounded reduce.
  * IVF — the scale path: deterministic k-means coarse centroids; vectors
    are bucketed by nearest centroid (a partitioning key reusable across
    queries); a query probes only the ``n_probe`` nearest centroid buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    embs = batch.column(emb_col).combine_chunks()
    flat = embs.flatten().to_numpy(zero_copy_only=False)
    n = len(batch)
    dim = len(flat) // max(1, n)
    return flat.reshape(n, dim).astype(np.float64)


def _normalize(x: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(norm == 0, 1.0, norm)


def make_bruteforce_topk_kernel(queries_ref, k: int = 10,
                                emb_col: str = "embedding",
                                id_col: str = "vec_id"):
    """queries_ref: ray.ObjectRef of (query_ids, normalized query matrix)
    or of (query_ids, qmat, centroids, probe_mask) — the 4-tuple form is
    the per-query IVF probe restriction: each batch row's bucket is
    re-derived (same argmax as the build assignment) and similarities
    are masked to -inf for (query, bucket) pairs outside the query's
    probe set, so a batched multi-query search returns exactly what each
    query's own probed buckets contain (reading the UNION of buckets
    must not leak unprobed buckets into a query's result — that would
    silently overstate IVF recall).  Emits per-batch partial top-k rows
    (query_id, vec_id, cosine)."""
    import ray

    def kernel(batch: pa.Table) -> pa.Table:
        q = queries_ref
        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
        centroids = probe_mask = None
        if len(q) == 4:
            qids, qmat, centroids, probe_mask = q
        else:
            qids, qmat = q
        x = _normalize(_to_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sim = qmat @ x.T  # (Q, B)
        if probe_mask is not None:
            bucket = np.argmax(x @ centroids.T, axis=1)
            sim = np.where(probe_mask[:, bucket], sim, -np.inf)
        Q, B = sim.shape
        kk = min(k, B)
        # block-local EXACT top-k under the same total order the global
        # merge uses — (cosine DESC, vec_id ASC) — so boundary ties
        # (bit-equal cosines, e.g. exact-duplicate vectors) keep the
        # deterministic lower-vec_id winner, output stays bounded at Q*kk
        # even for degenerate all-equal blocks, and NaN similarities sort
        # last (never displacing real candidates)
        order = np.lexsort(
            (np.tile(ids, Q), -sim.ravel(), np.repeat(np.arange(Q), B))
        ).reshape(Q, B)[:, :kk]
        bi = (order % B).reshape(-1)
        qi = np.repeat(np.arange(Q), kk)
        cos = sim[qi, bi]
        if probe_mask is not None:
            # masked (unprobed-bucket) pairs must not surface as
            # candidates even when a query's probed rows run short
            keep = ~np.isneginf(cos)
            qi, bi, cos = qi[keep], bi[keep], cos[keep]
        return pa.table(
            {
                "query_id": pa.array(np.asarray(qids, dtype=np.int64)[qi]),
                "vec_id": pa.array(ids[bi]),
                "cosine": pa.array(cos),
            }
        )

    return kernel


def merge_topk(partials: pa.Table, k: int = 10) -> pa.Table:
    """Final bounded reduce: keep the k best rows per query (deterministic
    tie-break by vec_id)."""
    q = partials.column("query_id").to_numpy(zero_copy_only=False)
    v = partials.column("vec_id").to_numpy(zero_copy_only=False)
    s = partials.column("cosine").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, -s, q))
    q, v, s = q[order], v[order], s[order]
    # rank within query
    starts = np.r_[0, np.nonzero(np.diff(q))[0] + 1]
    rank = np.arange(len(q)) - np.repeat(starts, np.diff(np.r_[starts, len(q)]))
    keep = rank < k
    return pa.table(
        {
            "query_id": pa.array(q[keep]),
            "vec_id": pa.array(v[keep]),
            "cosine": pa.array(s[keep]),
            "rank": pa.array(rank[keep].astype(np.int64)),
        }
    )


def _reduce_topk(partials_ds, k: int, fanin: int = 8) -> pa.Table:
    """Two-level tree reduce inside Ray: per-partition prune to Q*k rows,
    then one final single-partition merge.  merge_topk is associative and
    monotone, so any partitioning of the partial rows yields the same
    result; the driver only ever pulls the final Q*k-row table."""
    import ray

    level1 = partials_ds.repartition(fanin).map_batches(
        lambda b: merge_topk(b, k), batch_format="pyarrow", batch_size=None
    )
    final = level1.repartition(1).map_batches(
        lambda b: merge_topk(b, k), batch_format="pyarrow", batch_size=None
    )
    tables = [t for t in ray.get(final.to_arrow_refs()) if t.num_rows]
    if not tables:
        return merge_topk(
            pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            ),
            k,
        )
    return pa.concat_tables(tables)


def bruteforce_topk(ds, query_ids, query_matrix, k: int = 10,
                    emb_col: str = "embedding", id_col: str = "vec_id"):
    """Dataset-level brute-force ANN: broadcast queries, partial top-k per
    batch, tree-reduced merge (no full-partial-set driver concat)."""
    import ray

    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat))
    kernel = make_bruteforce_topk_kernel(qref, k, emb_col, id_col)
    partials = ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)
    return _reduce_topk(partials, k)


# --- IVF --------------------------------------------------------------------


def train_centroids(sample: np.ndarray, n_centroids: int = 16, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd iterations from evenly-strided seeds."""
    x = _normalize(np.asarray(sample, dtype=np.float64))
    idx = np.linspace(0, len(x) - 1, n_centroids).astype(np.int64)
    c = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    c[j] = v / n
    return c


def make_ivf_assign_kernel(centroids_ref, emb_col: str = "embedding"):
    import ray

    def kernel(batch: pa.Table) -> pa.Table:
        c = centroids_ref
        if isinstance(c, ray.ObjectRef):
            c = ray.get(c)
        x = _normalize(_to_matrix(batch, emb_col))
        assign = np.argmax(x @ c.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_bucket", pa.array(assign))

    return kernel


def ivf_topk(ds, query_ids, query_matrix, centroids: np.ndarray, k: int = 10,
             n_probe: int = 4, emb_col: str = "embedding",
             id_col: str = "vec_id", index_dir: str | None = None):
    """One-shot IVF search: builds a *transient* bucket-partitioned index
    (``ivf_build``) and searches it through the persisted path, so probe
    pruning prunes I/O exactly like the durable index.  For repeated query
    sets, call ``ivf_build`` once and ``ivf_topk_partitioned`` per query set
    — this convenience re-pays the build on every call, but its *plan* is
    the scale plan (the old implementation re-scanned and re-assigned the
    full dataset per query set, which was an attractive-nuisance API).

    ``index_dir`` must be visible to BOTH the write workers and the driver:
    the default local tempdir is correct only single-node (on a multi-node
    cluster, workers would write to their own node's /tmp and the driver's
    bucket-dir probe would silently see a subset) — pass a shared
    filesystem / object-store path there, exactly as you would for
    ``ivf_build``."""
    import shutil
    import tempfile

    import os

    from ._util import require_fresh_dir

    transient = index_dir is None
    if transient:
        index_dir = tempfile.mkdtemp(prefix="h3ray_ivf_tmp_")
    else:
        # a reused dir would accumulate stale bucket files beside the new
        # build and the glob would read every vector twice (or vectors
        # from a prior dataset) — refuse rather than silently corrupt
        require_fresh_dir(
            index_dir,
            "ivf_topk builds a fresh transient index; use ivf_build + "
            "ivf_topk_partitioned to persist and reuse an index",
        )
    try:
        ivf_build(ds, np.asarray(centroids, dtype=np.float64), index_dir, emb_col)
        top, _ = ivf_topk_partitioned(
            index_dir, query_ids, query_matrix, centroids, k, n_probe,
            emb_col, id_col,
        )
    finally:
        if transient:
            shutil.rmtree(index_dir, ignore_errors=True)
    return top


# --- partitioned IVF index (the persisted scale path) ------------------------


def ivf_build(ds, centroids: np.ndarray, index_dir: str,
              emb_col: str = "embedding"):
    """One-time partitioned index build: assign every vector to its nearest
    centroid and write parquet partitioned by ``ivf_bucket`` (one directory
    per bucket).  Queries then read ONLY their probed bucket directories —
    probe pruning prunes I/O, not just compute."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))
    assigned = ds.map_batches(
        make_ivf_assign_kernel(cref, emb_col), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    assigned.write_parquet(index_dir, partition_cols=["ivf_bucket"])
    return index_dir


def recall_at_k(approx: pa.Table, exact: pa.Table) -> pa.Table:
    """Per-query recall of an approximate top-k result against exact
    ground truth: hits = |approx ∩ exact| per query_id (both tables are
    (query_id, vec_id, ...) as returned by the top-k searches; they are
    small — Q*k rows — so this is a driver-side metric, not a stage).
    Returns (query_id, hits, truth_k) sorted by query_id; recall@k =
    hits / truth_k.  Vectorized: one composite-key isin + bincount."""
    aq = approx.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
    av = approx.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    eq = exact.column("query_id").to_numpy(zero_copy_only=False).astype(np.int64)
    ev = exact.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    qs = np.unique(np.concatenate([aq, eq]))
    # densify vec ids before packing: raw 64-bit ids (hashes, snowflakes)
    # would overflow qidx * (max_id + 1) and collide silently; the dense
    # domain is bounded by the Q*k result rows themselves
    vs = np.unique(np.concatenate([av, ev]))
    m = np.int64(len(vs))
    qidx_a = np.searchsorted(qs, aq)
    qidx_e = np.searchsorted(qs, eq)
    hit = np.isin(
        qidx_a * m + np.searchsorted(vs, av),
        qidx_e * m + np.searchsorted(vs, ev),
    )
    return pa.table(
        {
            "query_id": pa.array(qs),
            "hits": pa.array(np.bincount(qidx_a[hit], minlength=len(qs)).astype(np.int64)),
            "truth_k": pa.array(np.bincount(qidx_e, minlength=len(qs)).astype(np.int64)),
        }
    )


def ivf_topk_partitioned(index_dir: str, query_ids, query_matrix,
                         centroids: np.ndarray, k: int = 10, n_probe: int = 4,
                         emb_col: str = "embedding", id_col: str = "vec_id"):
    """Search a persisted IVF index: only the probed bucket partitions are
    read from storage.  Returns (topk_table, n_buckets_read)."""
    import os

    import ray

    qmat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    cent = np.asarray(centroids, dtype=np.float64)
    probes = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    wanted = sorted(int(b) for b in np.unique(probes))
    import glob as _glob

    dirs = [
        os.path.join(index_dir, f"ivf_bucket={b}")
        for b in wanted
        if os.path.isdir(os.path.join(index_dir, f"ivf_bucket={b}"))
    ]
    paths = [f for d in dirs for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    if not paths:
        # no probed bucket has any vectors (empty dataset, or centroids
        # that attracted none): an empty top-k, not a read_parquet error
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
        return merge_topk(empty, k), 0
    ds = ray.data.read_parquet(paths, columns=[id_col, emb_col])
    # per-query probe restriction: batched queries read the UNION of
    # probed buckets, but each query only scores rows of its OWN probes
    mask = np.zeros((len(qmat), len(cent)), dtype=bool)
    np.put_along_axis(mask, probes, True, axis=1)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat, cent, mask))
    kernel = make_bruteforce_topk_kernel(qref, k, emb_col, id_col)
    partials = ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)
    return _reduce_topk(partials, k), len(dirs)


# --- int8 scalar quantization --------------------------------------------


def quantize_matrix(x: np.ndarray) -> np.ndarray:
    """Symmetric per-vector int8 quantization of row vectors: normalize
    (cosine is per-vector scale-invariant, so the norm needs no side
    channel) then round each component to [-127, 127].  floor(x + 0.5)
    keeps the house rounding rule (half away from zero for positives,
    deterministic everywhere)."""
    q = np.floor(_normalize(x) * 127.0 + 0.5)
    return np.clip(q, -127, 127).astype(np.int8)


def make_quantize_kernel(emb_col: str = "embedding", id_col: str = "vec_id",
                         out_col: str = "q_emb"):
    """map_batches kernel: (id, int8-quantized embedding) — 4x smaller
    than float32 on the wire and in the store, the storage/shuffle lever
    for embedding tables at 100 TB."""

    def kernel(batch: pa.Table) -> pa.Table:
        x = quantize_matrix(_to_matrix(batch, emb_col))
        return pa.table(
            {
                id_col: batch.column(id_col),
                out_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(x.reshape(-1)), x.shape[1]
                ),
            }
        )

    return kernel


def quantize_embeddings(ds, emb_col: str = "embedding",
                        id_col: str = "vec_id", out_col: str = "q_emb"):
    """Dataset of (id_col, ``out_col`` int8 fixed-size list)."""
    return ds.map_batches(
        make_quantize_kernel(emb_col, id_col, out_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def make_quantized_topk_kernel(queries_ref, k: int = 10,
                               emb_col: str = "embedding",
                               id_col: str = "vec_id"):
    """Partial top-k by int8-quantized dot product.  queries_ref holds
    (query_ids, int8 query matrix).  Scores are integer dots carried as
    float64 ("cosine" column, so merge_topk / _reduce_topk apply
    unchanged): |dot| <= dim * 127^2, exactly representable in float64
    for any realistic dim, so ranking and ties are integer-exact.  The
    matmul runs through float64 BLAS — far faster than numpy's non-BLAS
    integer path, with no rounding at these magnitudes."""
    import ray

    def kernel(batch: pa.Table) -> pa.Table:
        q = queries_ref
        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
        qids, qmat = q
        x = quantize_matrix(_to_matrix(batch, emb_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sim = qmat.astype(np.float64) @ x.T.astype(np.float64)  # (Q, B) int-valued
        Q, B = sim.shape
        kk = min(k, B)
        order = np.lexsort(
            (np.tile(ids, Q), -sim.ravel(), np.repeat(np.arange(Q), B))
        ).reshape(Q, B)[:, :kk]
        bi = (order % B).reshape(-1)
        qi = np.repeat(np.arange(Q), kk)
        return pa.table(
            {
                "query_id": pa.array(np.asarray(qids, dtype=np.int64)[qi]),
                "vec_id": pa.array(ids[bi]),
                "cosine": pa.array(sim[qi, bi]),
            }
        )

    return kernel


def quantized_topk(ds, query_ids, query_matrix, k: int = 10,
                   emb_col: str = "embedding", id_col: str = "vec_id",
                   fanin: int = 8) -> pa.Table:
    """Brute-force top-k under int8 quantization: queries quantize once
    on the driver (broadcast via ray.put), every batch quantizes its
    rows on the fly and scores integer dots; the same bounded tree
    reduce as bruteforce_topk returns Q*k rows.  The "cosine" column
    holds the integer dot (max 127^2 * dim); rank/tie semantics match
    bruteforce_topk (score DESC, vec_id ASC)."""
    import ray

    qmat = quantize_matrix(np.asarray(query_matrix, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat))
    partials = ds.map_batches(
        make_quantized_topk_kernel(ref, k, emb_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _reduce_topk(partials, k, fanin)
