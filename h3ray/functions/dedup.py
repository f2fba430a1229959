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

_FNV = np.uint64(0x100000001B3)
_SEED = np.uint64(0x9E3779B97F4A7C15)


def _hash_shingles(text: str, n: int = 5) -> np.ndarray:
    """Character n-gram shingle hashes (u64, vectorized rolling)."""
    b = np.frombuffer((text or "").encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < n:
        b = np.pad(b, (0, n - len(b)), constant_values=0)
    m = len(b) - n + 1
    out = np.zeros(m, dtype=np.uint64)
    bu = b.astype(np.uint64)
    for k in range(n):
        out = (out * _FNV) ^ bu[k : k + m]
    return np.unique(out)


def _minhash(shingles: np.ndarray, k: int = 64) -> np.ndarray:
    """k min-hashes via k universal-hash permutations h_i(x) = a_i*x + b_i."""
    rng = np.random.default_rng(42)
    a = rng.integers(1, 2**63, size=k, dtype=np.uint64) | np.uint64(1)
    bvec = rng.integers(0, 2**63, size=k, dtype=np.uint64)
    if len(shingles) == 0:
        return np.full(k, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    vals = shingles[None, :] * a[:, None] + bvec[:, None]
    return vals.min(axis=1)


def minhash_signatures(batch: pa.Table, text_col: str = "text", k: int = 64,
                       shingle: int = 5) -> pa.Table:
    texts = batch.column(text_col).combine_chunks().to_pylist()
    sigs = np.stack([_minhash(_hash_shingles(t, shingle), k) for t in texts])
    return batch.append_column(
        "minhash", pa.array(list(sigs), type=pa.list_(pa.uint64(), k))
    )


def minhash_bands(batch: pa.Table, bands: int = 16, doc_col: str = "doc_id") -> pa.Table:
    """Explode signatures into (band, band_hash, doc_id) bucket rows — the
    LSH shuffle key."""
    sigs = batch.column("minhash").combine_chunks()
    flat = sigs.flatten().to_numpy(zero_copy_only=False)
    n = len(batch)
    k = len(flat) // max(1, n)
    rows_per = bands
    sig2 = flat.reshape(n, k)
    r = k // bands
    band_hash = np.zeros((n, bands), dtype=np.uint64)
    for b in range(bands):
        h = np.full(n, _SEED, dtype=np.uint64)
        for c in range(b * r, (b + 1) * r):
            h = (h * _FNV) ^ sig2[:, c]
        band_hash[:, b] = h
    doc = batch.column(doc_col).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(band_hash.reshape(-1)),
            doc_col: pa.array(np.repeat(doc, bands)),
        }
    )


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


def jaccard(text_a: str, text_b: str, shingle: int = 5) -> float:
    sa = _hash_shingles(text_a, shingle)
    sb = _hash_shingles(text_b, shingle)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def minhash_dedup_pipeline(ds, text_col="text", doc_col="doc_id", bands=16,
                           k=64, threshold=0.7):
    """Full near-dup pipeline: signatures -> band buckets -> groupby ->
    candidate pairs (distinct).  Returns a Dataset of (a, b) pairs; exact
    Jaccard verification happens in ``verify_pairs`` (needs a text lookup
    side)."""
    sigs = ds.map_batches(
        lambda b: minhash_signatures(b, text_col, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    buckets = sigs.map_batches(
        lambda b: minhash_bands(b, bands, doc_col),
        batch_format="pyarrow",
    )
    pairs = buckets.groupby(["band", "band_hash"]).map_groups(
        lambda b: bucket_pairs(b, doc_col), batch_format="pyarrow"
    )
    return pairs


def simhash_signatures(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over token hashes (bit-vote)."""
    texts = batch.column(text_col).combine_chunks().to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        tokens = (t or "").lower().split()
        if not tokens:
            continue
        hs = np.zeros(len(tokens), dtype=np.uint64)
        for j, tok in enumerate(tokens):
            h = np.uint64(0xCBF29CE484222325)
            for byte in tok.encode("utf-8", "ignore"):
                h = np.uint64((int(h) ^ byte) * 0x100000001B3 % (1 << 64))
            hs[j] = h
        bits_mat = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        votes = (2 * bits_mat.astype(np.int64) - 1).sum(axis=0)
        sig = np.uint64(0)
        for bit in range(64):
            if votes[bit] > 0:
                sig |= np.uint64(1) << np.uint64(bit)
        out[i] = sig
    return batch.append_column("simhash", pa.array(out))


def simhash_bands(batch: pa.Table, doc_col: str = "doc_id") -> pa.Table:
    """4 x 16-bit blocking: docs within hamming distance 3 share at least
    one exact band."""
    sig = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
    doc = batch.column(doc_col).to_numpy(zero_copy_only=False)
    bandvals = [
        ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        for b in range(4)
    ]
    return pa.table(
        {
            "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), len(sig))),
            "band_hash": pa.array(np.concatenate(bandvals)),
            doc_col: pa.array(np.tile(doc, 4)),
        }
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
