"""Deduplication operators for web-scale corpora.

Five families, each expressed Ray-Data-first:

  * exact: hash keys per batch -> groupby(key) -> keep min(doc_id)
    (one all-to-all on the hash key; the canonical exact-dedup shuffle).
  * MinHash + LSH: shingle -> k minhashes -> b bands -> groupby(band, hash)
    emits candidate pairs; pairs verified by exact Jaccard.
  * SimHash: 64-bit signature, 4-band blocking for hamming distance <= ~3.
  * n-gram Jaccard: direct verification kernel (used on LSH candidates).
  * embedding cosine: random-hyperplane LSH buckets then exact cosine.

All signatures are deterministic (seeded) so two runs at different cluster
sizes shard identically — required for resumable dedup at 10^12 docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._strkern import utf8_view

_FNV = np.uint64(0x100000001B3)
_SEED = np.uint64(0x9E3779B97F4A7C15)

# universal-hash permutation params, derived once at import (seed pinned so
# signatures are bit-identical across runs / cluster sizes); per-k cache
_MINHASH_PARAMS: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _minhash_params(k: int) -> tuple[np.ndarray, np.ndarray]:
    if k not in _MINHASH_PARAMS:
        rng = np.random.default_rng(42)
        a = rng.integers(1, 2**63, size=k, dtype=np.uint64) | np.uint64(1)
        bvec = rng.integers(0, 2**63, size=k, dtype=np.uint64)
        _MINHASH_PARAMS[k] = (a, bvec)
    return _MINHASH_PARAMS[k]


def _hash_shingles(text: str, n: int = 5) -> np.ndarray:
    """Character n-gram shingle hashes of one string (u64, vectorized
    rolling).  Used by the per-pair ``jaccard`` verify stage; batch paths
    use ``_shingles_flat``."""
    b = np.frombuffer((text or "").encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < n:
        b = np.pad(b, (0, n - len(b)), constant_values=0)
    m = len(b) - n + 1
    out = np.zeros(m, dtype=np.uint64)
    bu = b.astype(np.uint64)
    for k in range(n):
        out = (out * _FNV) ^ bu[k : k + m]
    return np.unique(out)


def _shingles_flat(col, n: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """All documents' n-gram shingle hashes in one flat array + per-doc
    offsets: `n` multiply-xor passes over the batch's flat UTF-8 buffer,
    window validity by boundary scatter (no per-row Python).  Documents
    shorter than n bytes hash their zero-padded bytes — same semantics as
    the scalar `_hash_shingles` (one shingle each)."""
    from ._strkern import window_valid

    data, off = utf8_view(col)
    ndoc = len(off) - 1
    lens = np.diff(off)
    short = lens < n
    with np.errstate(over="ignore"):
        valid, wcounts, m = window_valid(off, n, short)
        H = np.zeros(m, dtype=np.uint64)
        if m:
            bu = data.astype(np.uint64)
            for k in range(n):
                H *= _FNV
                H ^= bu[k : k + m]
        flat = H[valid]
        # short docs: zero-padded single shingle, computed on a (ns, n) pad
        # matrix in one vectorized pass
        if short.any():
            sidx = np.nonzero(short)[0]
            s_lens = lens[sidx]
            padded = np.zeros((len(sidx), n), dtype=np.uint64)
            rows = np.repeat(np.arange(len(sidx)), s_lens)
            cols = np.arange(int(s_lens.sum())) - np.repeat(
                np.cumsum(s_lens) - s_lens, s_lens
            )
            pos = np.repeat(off[:-1][sidx], s_lens) + cols
            padded[rows, cols] = data[pos]
            hshort = np.zeros(len(sidx), dtype=np.uint64)
            for k in range(n):
                hshort = (hshort * _FNV) ^ padded[:, k]
            # splice short-doc shingles into flat order (docs are in order,
            # shorts each contribute exactly one shingle)
            counts = wcounts.copy()
            counts[sidx] = 1
            out_off = np.zeros(ndoc + 1, dtype=np.int64)
            np.cumsum(counts, out=out_off[1:])
            out = np.empty(int(out_off[-1]), dtype=np.uint64)
            long_pos = np.repeat(out_off[:-1], wcounts) + (
                np.arange(len(flat))
                - np.repeat(np.cumsum(wcounts) - wcounts, wcounts)
            )
            out[long_pos] = flat
            out[out_off[:-1][sidx]] = hshort
            return out, out_off
    out_off = np.zeros(ndoc + 1, dtype=np.int64)
    np.cumsum(wcounts, out=out_off[1:])
    return flat, out_off


def _minhash(shingles: np.ndarray, k: int = 64) -> np.ndarray:
    """k min-hashes via k universal-hash permutations h_i(x) = a_i*x + b_i."""
    a, bvec = _minhash_params(k)
    if len(shingles) == 0:
        return np.full(k, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = shingles[None, :] * a[:, None] + bvec[:, None]
        return vals.min(axis=1)


def minhash_signatures(batch: pa.Table, text_col: str = "text", k: int = 64,
                       shingle: int = 5) -> pa.Table:
    """k×doc minhash signature matrix: flat shingles for the whole batch,
    then one multiply-add + segmented-min pass per hash function (u64 wrap;
    `np.minimum.reduceat` is the fast primitive on this box).  Bit-identical
    to the scalar reference (duplicate shingles cannot change a min)."""
    flat, off = _shingles_flat(batch.column(text_col), shingle)
    n = len(batch)
    if n == 0:
        return batch.append_column(
            "minhash",
            pa.FixedSizeListArray.from_arrays(pa.array([], type=pa.uint64()), k),
        )
    a, bvec = _minhash_params(k)
    sigs = np.empty((n, k), dtype=np.uint64)
    starts = off[:-1]
    nonempty = np.diff(off) > 0  # never false in practice (pad semantics)
    tmp = np.empty(len(flat), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            np.multiply(flat, a[i], out=tmp)
            tmp += bvec[i]
            if nonempty.all():
                sigs[:, i] = np.minimum.reduceat(tmp, starts)
            else:
                col = np.full(n, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
                col[nonempty] = np.minimum.reduceat(tmp, starts[nonempty])
                sigs[:, i] = col
    return batch.append_column(
        "minhash",
        pa.FixedSizeListArray.from_arrays(pa.array(sigs.reshape(-1)), k),
    )


def minhash_bands(batch: pa.Table, bands: int = 16, doc_col: str = "doc_id",
                  extra_cols: tuple = ()) -> pa.Table:
    """Explode signatures into (band, band_hash, doc_id) bucket rows — the
    LSH shuffle key.  ``extra_cols`` are carried through (repeated per
    band), e.g. a text hash for the exact-verify stage."""
    sigs = batch.column("minhash").combine_chunks()
    flat = sigs.flatten().to_numpy(zero_copy_only=False)
    n = len(batch)
    k = len(flat) // max(1, n)
    sig2 = flat.reshape(n, k)
    r = k // bands
    band_hash = np.zeros((n, bands), dtype=np.uint64)
    for b in range(bands):
        h = np.full(n, _SEED, dtype=np.uint64)
        for c in range(b * r, (b + 1) * r):
            h = (h * _FNV) ^ sig2[:, c]
        band_hash[:, b] = h
    doc = batch.column(doc_col).to_numpy(zero_copy_only=False)
    out = {
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array(band_hash.reshape(-1)),
        doc_col: pa.array(np.repeat(doc, bands)),
    }
    for c in extra_cols:
        v = batch.column(c).to_numpy(zero_copy_only=False)
        out[c] = pa.array(np.repeat(v, bands))
    return pa.table(out)


def bucket_pairs(batch: pa.Table, doc_col: str = "doc_id") -> pa.Table:
    """Within one (band, band_hash) group: emit candidate pairs (a < b)."""
    docs = np.sort(batch.column(doc_col).to_numpy(zero_copy_only=False))
    if len(docs) < 2:
        return pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    # pair every doc with the group minimum (union-find-lite; transitive
    # closure resolved by the caller if needed)
    a = np.full(len(docs) - 1, docs[0], dtype=np.int64)
    b = docs[1:].astype(np.int64)
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


# --- bucketed LSH candidate machinery ----------------------------------------
#
# The per-(band, band_hash) `map_groups` path above invokes one Python
# kernel per LSH bucket — at corpus scale that is billions of tiny groups
# through Ray's per-group combine (the repo's own corner-keyed measurement,
# BASELINE §7: 48 s vs 9.6 s at 4.5M keys, quantifies the pattern at ~5x).
# The functions below shuffle on `hash(band, band_hash) % num_buckets`
# instead and run ONE vectorized lexsort/run pass over ALL the LSH groups
# that land in a hash bucket, so per-task group count is bounded by
# `num_buckets` regardless of key cardinality.  Outputs are byte-identical
# to the per-group path (pytest parity on planted dups).


def _multi_key_runs(key_cols: list[np.ndarray], tiebreak: np.ndarray):
    """Sort rows by (key_cols..., tiebreak) and mark composite-key runs.

    Returns (order, first_idx, rank): `order` is the sort permutation,
    `first_idx[i]` the sorted index of row i's run start, `rank[i]` its
    offset within the run.  Run boundaries compare the ACTUAL key columns
    (no hashed composite — hash collisions can never merge two runs)."""
    n = len(tiebreak)
    order = np.lexsort((tiebreak, *reversed(key_cols)))
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return order, z, z
    diff = np.zeros(n, dtype=bool)
    for c in key_cols:
        cs = c[order]
        diff[1:] |= cs[1:] != cs[:-1]
    diff[0] = True
    first_idx = np.maximum.accumulate(np.where(diff, np.arange(n), 0))
    rank = np.arange(n) - first_idx
    return order, first_idx, rank


def with_band_bucket(batch: pa.Table, num_buckets: int = 64) -> pa.Table:
    """Append `bucket = hash(band, band_hash) % num_buckets` — the shuffle
    key of the bucketed LSH candidate stage."""
    from ._util import bucket_pair

    band = batch.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
    bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
    return batch.append_column(
        "bucket", pa.array(bucket_pair(band, bh.view(np.int64), num_buckets))
    )


_EMPTY_PAIRS = pa.table({"a": pa.array([], type=pa.int64()),
                         "b": pa.array([], type=pa.int64())})


def exact_pairs_bucketed(batch: pa.Table, doc_col: str = "doc_id",
                         key_cols: tuple = ("band", "band_hash", "text_hash")
                         ) -> pa.Table:
    """Within one HASH BUCKET of band rows: emit every doc pair whose full
    composite key (LSH group + verify key) is equal — all the bucket's LSH
    groups in one lexsort/run pass.  Equals mapping `exact_pairs_in_group`
    over each (band, band_hash) group separately."""
    docs = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(docs) < 2:
        return _EMPTY_PAIRS
    keys = [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
    order, first_idx, rank = _multi_key_runs(keys, docs)
    total = int(rank.sum())
    if total == 0:
        return _EMPTY_PAIRS
    d = docs[order]
    b = np.repeat(d, rank)
    within = np.arange(total) - np.repeat(np.cumsum(rank) - rank, rank)
    a = d[np.repeat(first_idx, rank) + within]
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


def exact_mates_bucketed(batch: pa.Table, doc_col: str = "doc_id",
                         key_cols: tuple = ("band", "band_hash", "text_hash")
                         ) -> pa.Table:
    """Within one hash bucket: per (band-)row, the count of OTHER rows
    sharing its full composite key — the bucketed twin of
    `exact_mates_in_group`."""
    docs = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(docs) == 0:
        return pa.table({doc_col: pa.array([], type=pa.int64()),
                         "n_mates": pa.array([], type=pa.int64())})
    keys = [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
    order, first_idx, rank = _multi_key_runs(keys, docs)
    d = docs[order]
    gsize = np.bincount(first_idx, minlength=len(d))[first_idx]
    return pa.table(
        {doc_col: pa.array(d), "n_mates": pa.array((gsize - 1).astype(np.int64))}
    )


def star_pairs_bucketed(batch: pa.Table, doc_col: str = "doc_id",
                        key_cols: tuple = ("band", "band_hash")) -> pa.Table:
    """Within one hash bucket: pair every doc with its LSH group's minimum
    doc id (union-find-lite star edges) — the bucketed twin of
    `bucket_pairs`, all the bucket's groups in one pass."""
    docs = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(docs) < 2:
        return _EMPTY_PAIRS
    keys = [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
    order, first_idx, rank = _multi_key_runs(keys, docs)
    d = docs[order]
    sel = rank > 0
    if not sel.any():
        return _EMPTY_PAIRS
    return pa.table({"a": pa.array(d[first_idx[sel]]), "b": pa.array(d[sel])})


def distinct_pairs_ds(pairs_ds, num_buckets: int = 64):
    """Globally distinct (a, b) pairs via a bucketed exchange: shuffle on
    `hash(a, b) % num_buckets`, ONE vectorized lexsort-unique per bucket —
    replaces `groupby(["a", "b"]).count()`, which re-shuffles every
    candidate pair as a distinct group key (per-pair combine at scale)."""

    def key(batch: pa.Table) -> pa.Table:
        from ._util import bucket_pair

        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(bucket_pair(a, b, num_buckets)),
             "a": pa.array(a), "b": pa.array(b)}
        )

    def uniq(batch: pa.Table) -> pa.Table:
        from ._util import distinct_pairs

        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        au, bu = distinct_pairs(a, b)
        return pa.table({"a": pa.array(au), "b": pa.array(bu)})

    return (
        pairs_ds.map_batches(key, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


def jaccard(text_a: str, text_b: str, shingle: int = 5) -> float:
    sa = _hash_shingles(text_a, shingle)
    sb = _hash_shingles(text_b, shingle)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def _unique_per_segment(flat: np.ndarray, off: np.ndarray):
    """Sorted-unique values per contiguous segment: returns (values,
    row_ids, per-segment unique counts).  One lexsort + one adjacency
    mask — no per-segment Python."""
    ndoc = len(off) - 1
    rows = np.repeat(np.arange(ndoc, dtype=np.int64), np.diff(off))
    order = np.lexsort((flat, rows))
    f = flat[order]
    r = rows[order]
    keep = np.ones(len(f), dtype=bool)
    if len(f) > 1:
        keep[1:] = (f[1:] != f[:-1]) | (r[1:] != r[:-1])
    f = f[keep]
    r = r[keep]
    return f, r, np.bincount(r, minlength=ndoc)


def jaccard_pairs(batch: pa.Table, a_col: str = "text_a",
                  b_col: str = "text_b", shingle: int = 5) -> pa.Table:
    """EXACT character-n-gram Jaccard for a batch of text pairs — the
    verification kernel applied to LSH/SimHash candidate pairs (MinHash
    only *estimates* Jaccard; candidates above threshold are confirmed
    here before anything is dropped).

    Fully vectorized: both columns shingle through the flat-buffer kernel,
    per-row shingle SETS come from one lexsort+adjacency pass each, and
    the per-row intersection is counted by sorting the two sides together
    and counting cross-side adjacent equal (row, hash) runs.  Appends
    int64 ``inter`` / ``union_size`` and float64 ``jaccard`` (== scalar
    ``jaccard()`` per row; ints are the oracle-stable columns)."""
    n = len(batch)
    if n == 0:
        out = batch.append_column("inter", pa.array([], type=pa.int64()))
        out = out.append_column("union_size", pa.array([], type=pa.int64()))
        return out.append_column("jaccard", pa.array([], type=pa.float64()))
    fa, offa = _shingles_flat(batch.column(a_col), shingle)
    fb, offb = _shingles_flat(batch.column(b_col), shingle)
    ua, ra, na = _unique_per_segment(fa, offa)
    ub, rb, nb = _unique_per_segment(fb, offb)
    allf = np.concatenate([ua, ub])
    allr = np.concatenate([ra, rb])
    tag = np.concatenate(
        [np.zeros(len(ua), dtype=np.int8), np.ones(len(ub), dtype=np.int8)]
    )
    order = np.lexsort((tag, allf, allr))
    F = allf[order]
    R = allr[order]
    T = tag[order]
    # each side is unique per row, so a shared hash appears as exactly one
    # adjacent cross-tag pair within the row
    dup = (F[1:] == F[:-1]) & (R[1:] == R[:-1]) & (T[1:] != T[:-1])
    inter = np.bincount(R[1:][dup], minlength=n)
    union = na + nb - inter
    jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    out = batch.append_column("inter", pa.array(inter.astype(np.int64)))
    out = out.append_column("union_size", pa.array(union.astype(np.int64)))
    return out.append_column("jaccard", pa.array(jac))


def verify_pairs(pairs_ds, docs_ds, text_col: str = "text",
                 doc_col: str = "doc_id", a_col: str = "a", b_col: str = "b",
                 threshold: float = 0.0, shingle: int = 5,
                 num_buckets: int = 64):
    """Distributed exact-Jaccard verification of candidate pairs — the
    stage the LSH pipelines hand their (a, b) candidates to.

    Text attach is TWO bucketed hash-join scatters (pairs ∪ docs keyed by
    ``hash(a) % num_buckets``, then by ``b``'s bucket), not a Dataset
    join: the groupby exchange moves the same bytes without the join
    aggregator's spin-up cost.  Crucially the group key is the BUCKET, not
    the doc id — grouping per doc id would invoke the group kernel once
    per document (per-group Python dominates: measured 19 s vs 4 s at a
    5k-doc corpus), while ``num_buckets`` groups each run ONE vectorized
    sort + searchsorted join over all their pairs and docs.  Pairs
    referencing a missing doc id are dropped.  Then one vectorized
    ``jaccard_pairs`` pass filters to ``jaccard >= threshold``.

    ``num_buckets`` bounds per-task group size: at 100 TB raise it so one
    bucket's docs+pairs fit a worker (it only changes partitioning, never
    results).  Both scatters shuffle |pairs| + |docs| rows, no all-pairs
    blowup and nothing on the driver.  Returns
    (a, b, inter, union_size, jaccard)."""

    def bucket_of(k: np.ndarray) -> np.ndarray:
        from ._util import bucket_single

        return bucket_single(k, num_buckets)

    def pair_rows(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket_of(a)),
                "key": pa.array(a),
                "other": pa.array(b),
                "payload": pa.nulls(len(a), type=pa.large_string()),
                "is_doc": pa.array(np.zeros(len(a), dtype=np.bool_)),
                "carry": pa.nulls(len(a), type=pa.large_string()),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        d = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket_of(d)),
                "key": pa.array(d),
                "other": pa.array(np.zeros(len(d), dtype=np.int64)),
                "payload": batch.column(text_col).cast(pa.large_string()),
                "is_doc": pa.array(np.ones(len(d), dtype=np.bool_)),
                "carry": pa.nulls(len(d), type=pa.large_string()),
            }
        )

    def attach(out_names):
        key_out, other_out, text_out, carry = out_names

        def k(batch: pa.Table) -> pa.Table:
            is_doc = batch.column("is_doc").to_numpy(zero_copy_only=False)
            docs = batch.filter(pa.array(is_doc))
            pairs = batch.filter(pa.array(~is_doc))
            empty = pa.table(
                {key_out: pa.array([], type=pa.int64()),
                 other_out: pa.array([], type=pa.int64()),
                 text_out: pa.array([], type=pa.large_string()),
                 **({carry: pa.array([], type=pa.large_string())}
                    if carry else {})}
            )
            if docs.num_rows == 0 or pairs.num_rows == 0:
                return empty
            # vectorized hash join within the bucket: sort doc keys once,
            # searchsorted every pair key, gather matched texts
            dk = docs.column("key").to_numpy(zero_copy_only=False)
            order = np.argsort(dk, kind="stable")
            dks = dk[order]
            pk = pairs.column("key").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(dks, pk)
            pos = np.clip(pos, 0, len(dks) - 1)
            hit = dks[pos] == pk
            if not hit.any():
                return empty
            sel = pa.array(np.nonzero(hit)[0])
            texts = docs.column("payload").take(pa.array(order[pos[hit]]))
            cols = {
                key_out: pairs.column("key").take(sel),
                other_out: pairs.column("other").take(sel),
                text_out: texts,
            }
            if carry:
                cols[carry] = pairs.column("carry").take(sel)
            return pa.table(cols)

        return k

    docs_keyed = docs_ds.map_batches(doc_rows, batch_format="pyarrow")
    stage1 = (
        pairs_ds.map_batches(pair_rows, batch_format="pyarrow")
        .union(docs_keyed)
        .groupby("bucket")
        .map_groups(attach(("a_id", "b_id", "text_a", None)),
                    batch_format="pyarrow")
    )

    # re-key by b's bucket, carrying text_a through the second scatter
    def rekey(batch: pa.Table) -> pa.Table:
        b = batch.column("b_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(bucket_of(b)),
                "key": batch.column("b_id"),
                "other": batch.column("a_id"),
                "payload": pa.nulls(batch.num_rows, type=pa.large_string()),
                "is_doc": pa.array(
                    np.zeros(batch.num_rows, dtype=np.bool_)),
                "carry": batch.column("text_a"),
            }
        )

    stage2 = (
        stage1.map_batches(rekey, batch_format="pyarrow")
        .union(docs_keyed)
        .groupby("bucket")
        .map_groups(attach(("b", "a", "text_b", "text_a")),
                    batch_format="pyarrow")
    )

    def score(batch: pa.Table) -> pa.Table:
        t = jaccard_pairs(batch, "text_a", "text_b", shingle)
        jac = t.column("jaccard").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(jac >= threshold))
        return t.select(["a", "b", "inter", "union_size", "jaccard"])

    return stage2.map_batches(score, batch_format="pyarrow")


def minhash_dedup_pipeline(ds, text_col="text", doc_col="doc_id", bands=16,
                           k=64, shingle=5, num_buckets=64):
    """Candidate tier of the near-dup pipeline: signatures -> band rows ->
    ONE bucketed exchange (`hash(band, band_hash) % num_buckets`) -> star
    candidate pairs, one vectorized run-pass per hash bucket (per-task
    group count bounded by ``num_buckets``, not LSH-key cardinality).
    Returns a Dataset of (a, b) pairs; exact Jaccard verification (with
    its own threshold) happens in ``verify_pairs`` — use
    ``minhash_dedup_verified`` for the composed pipeline.  ``shingle`` is
    the n-gram size used for the signatures."""
    sigs = ds.map_batches(
        lambda b: minhash_signatures(b, text_col, k, shingle),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    buckets = sigs.map_batches(
        lambda b: with_band_bucket(minhash_bands(b, bands, doc_col),
                                   num_buckets),
        batch_format="pyarrow",
    )
    pairs = buckets.groupby("bucket").map_groups(
        lambda b: star_pairs_bucketed(b, doc_col), batch_format="pyarrow"
    )
    return pairs


def minhash_dedup_verified(ds, text_col="text", doc_col="doc_id", bands=16,
                           k=64, threshold=0.7, shingle=5, num_buckets=64):
    """End-to-end near-dup pipeline: MinHash-LSH candidates -> distinct ->
    EXACT n-gram Jaccard verification >= threshold.

    The candidate tier (``minhash_dedup_pipeline``) has recall < 1 for
    borderline pairs but near-1 precision after this verify tier: a pair
    survives only if its true shingle-set Jaccard clears ``threshold``.
    The distinct step is a bucketed lexsort-unique (``distinct_pairs_ds``)
    — a pair found in several band buckets must verify (and ship its
    texts) once, not once per bucket.  ``ds`` is consumed twice
    (signatures + text attach); pass a checkpointed/parquet-backed dataset
    when upstream is expensive.  Returns (a, b, inter, union_size,
    jaccard)."""
    cand = minhash_dedup_pipeline(ds, text_col, doc_col, bands, k, shingle,
                                  num_buckets)
    distinct = distinct_pairs_ds(cand, num_buckets)
    return verify_pairs(distinct, ds, text_col=text_col, doc_col=doc_col,
                        threshold=threshold, shingle=shingle)


def simhash_signatures(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over token hashes (bit-vote), fully vectorized:
    Arrow lower+split for tokens, jagged FNV-1a over the flat token buffer,
    per-bit segmented vote counts -> packbits.  Values are bit-identical to
    the scalar per-token reference kernel for ASCII text (utf8_lower's ICU
    special cases, e.g. 'İ', are the one documented divergence)."""
    import pyarrow.compute as pc

    from ._strkern import fnv1a_segments, list_offsets, split_tokens

    n = len(batch)
    toks = split_tokens(pc.utf8_lower(batch.column(text_col)))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    tdata, toff = utf8_view(flat)
    tlens = np.diff(toff)
    hs = fnv1a_segments(tdata, toff)
    # drop the single '' token an empty/whitespace-only doc produces (the
    # scalar kernel has no tokens there -> sig 0)
    keep = tlens > 0
    doc_off = list_offsets(toks)
    tok_counts = np.diff(doc_off)
    if not keep.all():
        drop_doc = np.repeat(np.arange(n), tok_counts)[~keep]
        tok_counts = tok_counts - np.bincount(drop_doc, minlength=n)
        hs = hs[keep]
    doc_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tok_counts, out=doc_off[1:])
    # per-bit segmented ones-count: two in-place passes + one 1-D reduceat
    # per bit (2-D reduceat / a (ntok, 64) bit matrix are pathologically
    # slow on this box — measured 50x worse)
    nonempty = tok_counts > 0
    starts_ne = doc_off[:-1][nonempty]
    ones = np.zeros((n, 64), dtype=np.int64)
    if len(hs) and nonempty.any():
        tmp = np.empty(len(hs), dtype=np.uint64)
        for j in range(64):
            np.right_shift(hs, np.uint64(j), out=tmp)
            np.bitwise_and(tmp, np.uint64(1), out=tmp)
            ones[nonempty, j] = np.add.reduceat(tmp, starts_ne).astype(np.int64)
    votes = 2 * ones - tok_counts[:, None]
    sig_bits = (votes > 0) & nonempty[:, None]
    out = np.packbits(sig_bits, axis=1, bitorder="little").view(np.uint64).reshape(n)
    return batch.append_column("simhash", pa.array(out))


def simhash_bands(batch: pa.Table, doc_col: str = "doc_id",
                  extra_cols: tuple = ()) -> pa.Table:
    """4 x 16-bit blocking: docs within hamming distance 3 share at least
    one exact band.  ``extra_cols`` are carried through (tiled per band)."""
    sig = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    doc = batch.column(doc_col).to_numpy(zero_copy_only=False)
    bandvals = [
        ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        for b in range(4)
    ]
    out = {
        "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), len(sig))),
        "band_hash": pa.array(np.concatenate(bandvals)),
        doc_col: pa.array(np.tile(doc, 4)),
    }
    for c in extra_cols:
        v = batch.column(c).to_numpy(zero_copy_only=False)
        out[c] = pa.array(np.tile(v, 4))
    return pa.table(out)


def _group_runs(docs: np.ndarray, keys: np.ndarray):
    """Sort (key, doc) and return (docs_sorted, run_start_index, rank) —
    the shared run machinery for within-bucket exact verification."""
    order = np.lexsort((docs, keys))
    d, k = docs[order], keys[order]
    first = np.concatenate([[True], k[1:] != k[:-1]]) if len(k) else np.zeros(0, bool)
    first_idx = np.maximum.accumulate(np.where(first, np.arange(len(d)), 0))
    rank = np.arange(len(d)) - first_idx
    return d, first_idx, rank


def exact_pairs_in_group(batch: pa.Table, doc_col: str = "doc_id",
                         key_col: str = "text_hash") -> pa.Table:
    """Within one LSH bucket: emit every pair (a < b) of docs whose
    ``key_col`` (e.g. full-text hash) is equal — the exact-verify stage of
    the LSH pipeline, vectorized (no per-run Python): each sorted element
    of rank r contributes r pairs against its run's earlier elements."""
    docs = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64())})
    if len(docs) < 2:
        return empty
    d, first_idx, rank = _group_runs(docs, keys)
    total = int(rank.sum())
    if total == 0:
        return empty
    b = np.repeat(d, rank)
    within = np.arange(total) - np.repeat(np.cumsum(rank) - rank, rank)
    a = d[np.repeat(first_idx, rank) + within]
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


def exact_mates_in_group(batch: pa.Table, doc_col: str = "doc_id",
                         key_col: str = "text_hash") -> pa.Table:
    """Within one LSH bucket: per doc, the count of OTHER docs with an
    equal ``key_col`` (exact-text bucket mates)."""
    docs = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    if len(docs) == 0:
        return pa.table({doc_col: pa.array([], type=pa.int64()),
                         "n_mates": pa.array([], type=pa.int64())})
    d, first_idx, rank = _group_runs(docs, keys)
    gsize = np.bincount(first_idx, minlength=len(d))[first_idx]
    return pa.table(
        {doc_col: pa.array(d), "n_mates": pa.array((gsize - 1).astype(np.int64))}
    )


def hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def embedding_lsh_buckets(batch: pa.Table, emb_col: str = "embedding",
                          doc_col: str = "vec_id", planes: int = 16) -> pa.Table:
    """Random-hyperplane signature -> one bucket per vector."""
    embs = batch.column(emb_col).combine_chunks()
    flat = embs.flatten().to_numpy(zero_copy_only=False)
    n = len(batch)
    dim = len(flat) // max(1, n)
    x = flat.reshape(n, dim).astype(np.float64)
    norm = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norm == 0, 1.0, norm)
    rng = np.random.default_rng(123)
    h = rng.standard_normal((dim, planes))
    bits_sign = (x @ h) > 0
    sig = np.zeros(n, dtype=np.int64)
    for p in range(planes):
        sig |= bits_sign[:, p].astype(np.int64) << p
    return pa.table(
        {
            "bucket": pa.array(sig),
            doc_col: batch.column(doc_col),
            emb_col: batch.column(emb_col),
        }
    )


def embedding_dedup_pipeline(ds, emb_col: str = "embedding",
                             doc_col: str = "vec_id", planes: int = 16,
                             threshold: float = 0.95, hot_threshold: int = 2048,
                             hot_parts: int = 4, checkpoint_dir: str | None = None):
    """Embedding near-dup pairs: hyperplane-LSH buckets -> exact cosine
    verify per bucket, with *triangle salting* for hot buckets.

    With ``planes=0`` every vector lands in one bucket, which turns the
    pipeline into an EXACT all-pairs cosine join — the triangle salting
    below is then a distributed block matmul over hot_parts*(hot_parts+1)/2
    tasks (each unordered pair computed exactly once).

    A bucket larger than ``hot_threshold`` would be one straggler group, so
    its rows are hash-assigned to ``hot_parts`` parts and every row is
    replicated to the task of each part pair (p, q) with p <= min/max
    ordering; task (p, q) verifies only cross-(p, q) (or within-p when
    p == q) pairs, so every unordered pair is computed exactly once and the
    all-pairs work spreads over hot_parts*(hot_parts+1)/2 tasks.  The hot
    set is found by a tiny count aggregate and broadcast via ray.put.

    The bucketized rows are consumed twice (count aggregate + expand
    stage).  With ``checkpoint_dir`` set they are checkpointed to parquet
    once and both consumers read the checkpoint — the 100 TB path (caller
    owns cleanup).  Without it, the ENTIRE upstream lineage of ``ds``
    (source scan + any prior transforms, not just the LSH assign) executes
    twice; that avoids pinning the full bucketized dataset in the object
    store the way a ``materialize()`` would, but callers whose upstream is
    expensive should pass ``checkpoint_dir``."""
    import ray

    def bucketize(batch: pa.Table) -> pa.Table:
        return embedding_lsh_buckets(batch, emb_col, doc_col, planes)

    buckets = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    if checkpoint_dir is not None:
        from ._util import require_fresh_dir

        require_fresh_dir(
            checkpoint_dir,
            "stale checkpoints would silently merge into the bucket join",
        )
        buckets.write_parquet(checkpoint_dir)
        buckets = ray.data.read_parquet(checkpoint_dir)
    counts = buckets.groupby("bucket").count().take_all()  # <= 2^planes rows
    hot = {
        int(r["bucket"]) for r in counts if r["count()"] > hot_threshold
    }
    hot_ref = ray.put(hot)
    g = hot_parts

    def expand(batch: pa.Table) -> pa.Table:
        hotset = ray.get(hot_ref) if isinstance(hot_ref, ray.ObjectRef) else hot_ref
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        ids = batch.column(doc_col).to_numpy(zero_copy_only=False)
        is_hot = np.isin(b, np.array(sorted(hotset), dtype=b.dtype)) if hotset else np.zeros(len(b), bool)
        part = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(60)).astype(np.int64) % g
        out_idx = []
        out_tp = []
        out_part = []
        cold = np.nonzero(~is_hot)[0]
        out_idx.append(cold)
        out_tp.append(np.full(len(cold), -1, dtype=np.int64))
        out_part.append(np.zeros(len(cold), dtype=np.int64))
        hot_rows = np.nonzero(is_hot)[0]
        for q in range(g):  # each hot row joins tasks (min(p,q), max(p,q))
            p = part[hot_rows]
            tp = np.minimum(p, q) * g + np.maximum(p, q)
            out_idx.append(hot_rows)
            out_tp.append(tp)
            out_part.append(p.copy())
        idx = np.concatenate(out_idx)
        t = batch.take(pa.array(idx))
        t = t.append_column("tp", pa.array(np.concatenate(out_tp)))
        return t.append_column("part", pa.array(np.concatenate(out_part)))

    def verify(batch: pa.Table) -> pa.Table:
        tp = int(batch.column("tp")[0].as_py())
        n = len(batch)
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if n < 2:
            return empty
        flat = batch.column(emb_col).combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        dim = len(flat) // n
        x = flat.reshape(n, dim).astype(np.float64)
        norm = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(norm == 0, 1.0, norm)
        ids = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if tp < 0:  # cold bucket: plain upper-triangle all-pairs
            sim = x @ x.T
            iu, ju = np.triu_indices(n, k=1)
            sims = sim[iu, ju]
        else:
            p, q = divmod(tp, g)
            prt = batch.column("part").to_numpy(zero_copy_only=False)
            if p == q:  # within-part pairs (rows appear once here)
                sim = x @ x.T
                iu, ju = np.triu_indices(n, k=1)
                sims = sim[iu, ju]
            else:  # cross-part pairs only — each unordered pair exactly once
                m1 = np.nonzero(prt == p)[0]
                m2 = np.nonzero(prt == q)[0]
                if len(m1) == 0 or len(m2) == 0:
                    return empty
                sim = x[m1] @ x[m2].T
                gi, gj = np.meshgrid(
                    np.arange(len(m1)), np.arange(len(m2)), indexing="ij"
                )
                iu, ju = m1[gi.ravel()], m2[gj.ravel()]
                sims = sim.ravel()
        hit = sims >= threshold
        a = np.minimum(ids[iu[hit]], ids[ju[hit]])
        b = np.maximum(ids[iu[hit]], ids[ju[hit]])
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "cosine": pa.array(sims[hit])})

    expanded = buckets.map_batches(expand, batch_format="pyarrow")
    return expanded.groupby(["bucket", "tp"]).map_groups(
        verify, batch_format="pyarrow"
    )


def cosine_pairs_in_bucket(batch: pa.Table, emb_col: str = "embedding",
                           doc_col: str = "vec_id", threshold: float = 0.95) -> pa.Table:
    """Exact cosine verification within one LSH bucket."""
    n = len(batch)
    if n < 2:
        return pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
                         "cosine": pa.array([], type=pa.float64())})
    flat = batch.column(emb_col).combine_chunks().flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // n
    x = flat.reshape(n, dim).astype(np.float64)
    norm = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norm == 0, 1.0, norm)
    sim = x @ x.T
    ids = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
    iu, ju = np.triu_indices(n, k=1)
    hit = sim[iu, ju] >= threshold
    a = np.minimum(ids[iu[hit]], ids[ju[hit]])
    b = np.maximum(ids[iu[hit]], ids[ju[hit]])
    return pa.table({"a": pa.array(a), "b": pa.array(b), "cosine": pa.array(sim[iu, ju][hit])})


def _segment_min_broadcast(key_cols: list[np.ndarray],
                           labels: np.ndarray) -> np.ndarray:
    """Per composite-key segment minimum of ``labels``, broadcast back to
    every row (original order): one lexsort + `np.minimum.reduceat` — the
    vectorized kernel of a bucketed min-scatter."""
    n = len(labels)
    if n == 0:
        return labels
    order = np.lexsort(tuple(reversed(key_cols)))
    diff = np.zeros(n, dtype=bool)
    for c in key_cols:
        cs = c[order]
        diff[1:] |= cs[1:] != cs[:-1]
    diff[0] = True
    starts = np.nonzero(diff)[0]
    mins = np.minimum.reduceat(labels[order], starts)
    run_id = np.cumsum(diff) - 1
    out = np.empty_like(labels)
    out[order] = mins[run_id]
    return out


def connected_components(pairs_ds, nodes_ds=None, a_col: str = "a",
                         b_col: str = "b", node_col: str = "node",
                         max_iters: int = 16,
                         checkpoint_dir: str | None = None,
                         num_buckets: int = 64):
    """Distributed connected components over a duplicate-pair graph — the
    clustering step after LSH pair generation in a production dedup
    pipeline (pick one survivor per component, drop the rest).

    Join-free "hash-to-min" iteration: state rows (ea, eb, node, label)
    carry every edge endpoint's current label; each round is two BUCKETED
    scatters — per-NODE min (labels meet across a node's edges) then
    per-EDGE min (labels flow across each edge) — so the component minimum
    propagates at least one hop per round and the loop ends in at most
    graph-diameter rounds (LSH dedup graphs are near-cliques/stars:
    2-3 rounds).  Each scatter shuffles on ``hash(key) % num_buckets``
    and runs ONE vectorized lexsort + `np.minimum.reduceat` segment-min
    per bucket — per-task group count is bounded by ``num_buckets``, not
    by node/edge cardinality (the per-key `map_groups` it replaces invokes
    a Python kernel per node and per edge, 2x per round).  Labels only
    ever decrease, so the label sum is strictly monotone and equal sums
    mean convergence — one cheap aggregate per round, no Dataset.join
    (whose aggregator spin-up dominates at small scale).  ``nodes_ds``
    (one ``node_col`` column) adds isolated nodes as self-edges so they
    emerge as singleton clusters.

    Without ``checkpoint_dir`` each round materializes the bounded state
    (2|E| + |V| rows) in the object store.  With ``checkpoint_dir`` set —
    the 100 TB path — each round is written to
    ``checkpoint_dir/round-NNN`` parquet and the next round streams from
    disk, so no round's state is ever pinned in object-store memory; the
    previous round's directory is deleted once the new one is durable
    (disk use is bounded at ~2 rounds of state).  A KILLED RUN RESUMES:
    calling again with the same dir picks up from the latest surviving
    ``round-NNN`` checkpoint (the state rows fully describe progress, so
    the seed datasets are not re-read) and runs up to ``max_iters`` more
    rounds.  A non-empty dir with anything other than round checkpoints
    raises.  The RETURNED Dataset lazily reads the final round's
    checkpoint, so the caller must consume it before removing
    ``checkpoint_dir`` (caller owns cleanup).

    Raises RuntimeError if the label-sum fixpoint is not OBSERVED within
    ``max_iters`` rounds (observation needs one quiet round, so a graph of
    diameter exactly ``max_iters`` also raises — conservative: wrong
    clusters are never returned silently).

    Returns a Dataset of (node, cluster) where cluster is the smallest
    node id in the component.
    """
    import ray

    def seed_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ea": pa.array(np.repeat(a, 2)),
                "eb": pa.array(np.repeat(b, 2)),
                "node": pa.array(np.stack([a, b], axis=1).reshape(-1)),
                "label": pa.array(np.stack([a, b], axis=1).reshape(-1)),
            }
        )

    def seed_nodes(batch: pa.Table) -> pa.Table:
        n = batch.column(node_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"ea": pa.array(n), "eb": pa.array(n), "node": pa.array(n),
             "label": pa.array(n)}
        )

    state = pairs_ds.map_batches(seed_pairs, batch_format="pyarrow")
    if nodes_ds is not None:
        state = state.union(
            nodes_ds.map_batches(seed_nodes, batch_format="pyarrow")
        )

    from ._util import bucket_pair, bucket_single

    def key_node(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(bucket_single(node, num_buckets))
        )

    def key_edge(batch: pa.Table) -> pa.Table:
        ea = batch.column("ea").to_numpy(zero_copy_only=False)
        eb = batch.column("eb").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(bucket_pair(ea, eb, num_buckets))
        )

    def min_within(key_names):
        def k(batch: pa.Table) -> pa.Table:
            lab = batch.column("label").to_numpy(zero_copy_only=False)
            keys = [batch.column(c).to_numpy(zero_copy_only=False)
                    for c in key_names]
            lab2 = _segment_min_broadcast(keys, lab)
            out = batch.set_column(
                batch.schema.get_field_index("label"), "label", pa.array(lab2)
            )
            return out.drop_columns(["bucket"])

        return k

    scatter_node = min_within(["node"])
    scatter_edge = min_within(["ea", "eb"])

    start_round = 0
    prev_round_dir = None
    if checkpoint_dir is not None:
        import os
        import shutil

        entries = sorted(os.listdir(checkpoint_dir)) \
            if os.path.isdir(checkpoint_dir) else []
        if entries:
            rounds = [e for e in entries if e.startswith("round-")]
            if rounds != entries:
                raise ValueError(
                    f"checkpoint_dir {checkpoint_dir!r} contains non-round "
                    "entries; pass a fresh directory or one left by a "
                    "killed connected_components run"
                )
            # resume: the latest round's state fully describes progress
            prev_round_dir = os.path.join(checkpoint_dir, rounds[-1])
            state = ray.data.read_parquet(prev_round_dir)
            start_round = int(rounds[-1].split("-")[1]) + 1
            for stale in rounds[:-1]:
                shutil.rmtree(os.path.join(checkpoint_dir, stale),
                              ignore_errors=True)

    prev_sum = None
    converged = False
    for it in range(start_round, start_round + max_iters):
        state = (
            state.map_batches(key_node, batch_format="pyarrow")
            .groupby("bucket").map_groups(scatter_node, batch_format="pyarrow")
            .map_batches(key_edge, batch_format="pyarrow")
            .groupby("bucket").map_groups(scatter_edge, batch_format="pyarrow")
        )
        if checkpoint_dir is None:
            state = state.materialize()
        else:
            round_dir = os.path.join(checkpoint_dir, f"round-{it:03d}")
            state.write_parquet(round_dir)
            state = ray.data.read_parquet(round_dir)
            if prev_round_dir is not None:
                shutil.rmtree(prev_round_dir, ignore_errors=True)
            prev_round_dir = round_dir
        s = state.sum("label")
        if s == prev_sum:  # labels only decrease: equal sum == fixpoint
            converged = True
            break
        prev_sum = s
    if not converged:
        # never return silently-fractured components: a chain of diameter
        # > max_iters would leave non-minimal labels with no indication
        raise RuntimeError(
            f"connected_components did not converge within max_iters="
            f"{max_iters} rounds (graph diameter exceeds it); raise max_iters"
        )
    out = state.groupby("node").min("label")
    return out.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "cluster": b.column("min(label)")}
        ),
        batch_format="pyarrow",
    )
