"""Benchmark decontamination: flag training documents that share any
word n-gram with a (small) benchmark/eval set.

The standard pre-training hygiene step (eval-set leakage makes benchmark
numbers meaningless): build the set of distinct word ``n``-gram hashes
over the benchmark docs, broadcast it once, and score every training doc
by how many of its n-gram instances hit the set.

Distributed plan: the benchmark side streams through the same n-gram
kernel and tree-reduces its DISTINCT gram hashes to one sorted array
(bounded by the benchmark's size — eval sets are tiny next to the
corpus; ``max_grams`` guards the broadcast like
membership.distinct_keys_broadcast).  The probe side is one map stage —
searchsorted membership per batch, no exchange at all.  Gram identity is
hash-based (FNV-1a over the three token hashes), the package-wide
trade: a collision could flag one extra doc at 2^-64 per pair.

No counterpart in the reference (h3ronpy has no text ops); serves the
training-data-pipeline tier next to functions/dedup.py / linedup.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ._strkern import fnv1a_segments, list_offsets, split_tokens, utf8_view


def doc_ngram_hashes(
    batch: pa.Table, text_col: str, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """(gram_hashes uint64, doc_of_gram int64) for the word ``n``-grams
    of each doc: tokens FNV-hashed from the flat buffer, gram hash =
    FNV-1a over the n consecutive token hashes (one vectorized pass —
    grams never materialize as strings)."""
    toks = split_tokens(batch.column(text_col))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    off = list_offsets(toks)
    data, toff = utf8_view(toks.values)
    th = fnv1a_segments(data, toff)
    # split_tokens yields one '' token for fully-empty rows: drop
    # zero-length tokens and recompute per-doc counts over the kept set
    tlens = np.diff(toff)
    keep = tlens > 0
    ntok_raw = np.diff(off)
    doc_of_tok = np.repeat(np.arange(len(ntok_raw), dtype=np.int64), ntok_raw)
    th = th[keep]
    ntok = np.bincount(doc_of_tok[keep], minlength=len(ntok_raw))
    koff = np.zeros(len(ntok) + 1, dtype=np.int64)
    np.cumsum(ntok, out=koff[1:])
    ngrams = np.maximum(ntok - (n - 1), 0)
    total = int(ngrams.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    doc_of_gram = np.repeat(np.arange(len(ngrams), dtype=np.int64), ngrams)
    gram_start = (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(ngrams) - ngrams, ngrams)
        + np.repeat(koff[:-1], ngrams)
    )
    # stack the n consecutive token hashes and FNV the 8n-byte rows
    cols = np.stack([th[gram_start + j] for j in range(n)], axis=1)
    flat = np.ascontiguousarray(cols).astype("<u8").view(np.uint8).reshape(-1)
    goff = np.arange(total + 1, dtype=np.int64) * (8 * n)
    return fnv1a_segments(flat, goff), doc_of_gram


def benchmark_gram_set(
    bench_ds, text_col: str = "text", n: int = 3, max_grams: int = 8_000_000,
    fanin: int = 16
) -> np.ndarray:
    """Sorted distinct ``n``-gram hashes over the benchmark docs,
    tree-reduced: per-block unique partials merge through a ``fanin``-way
    repartition+unique level before the driver concat, so the driver pull
    volume is bounded by ``fanin`` already-deduplicated tables (not one
    partial per input block); ``max_grams`` bounds the broadcast array."""

    def partial(batch: pa.Table) -> pa.Table:
        gh, _ = doc_ngram_hashes(batch, text_col, n)
        return pa.table({"g": pa.array(np.unique(gh), type=pa.uint64())})

    def merge_unique(batch: pa.Table) -> pa.Table:
        g = batch.column("g").to_numpy(zero_copy_only=False)
        return pa.table({"g": pa.array(np.unique(g), type=pa.uint64())})

    parts = (
        bench_ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        .repartition(fanin)
        .map_batches(merge_unique, batch_format="pyarrow", batch_size=None)
    )
    tables = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.zeros(0, dtype=np.uint64)
    grams = np.unique(
        np.concatenate(
            [t.column("g").to_numpy(zero_copy_only=False) for t in tables]
        )
    )
    if len(grams) > max_grams:
        raise ValueError(
            f"benchmark has {len(grams)} distinct {n}-grams > max_grams="
            f"{max_grams}; the broadcast set must stay node-resident "
            "(shard the benchmark or raise the guard)"
        )
    return grams


def flag_contaminated(
    ds,
    bench_ds,
    *,
    text_col: str = "text",
    n: int = 3,
    max_grams: int = 8_000_000,
):
    """Annotate every doc of ``ds`` with ``n_hits`` (count of its word
    ``n``-gram instances that appear anywhere in ``bench_ds``) and
    ``contaminated`` (n_hits > 0).  One benchmark reduce + one broadcast
    probe map — the corpus side never shuffles."""
    grams_ref = ray.put(benchmark_gram_set(bench_ds, text_col, n, max_grams))

    def probe(batch: pa.Table) -> pa.Table:
        gset = ray.get(grams_ref)
        gh, doc_of_gram = doc_ngram_hashes(batch, text_col, n)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if len(gset) and len(gh):
            pos = np.searchsorted(gset, gh)
            hit = (pos < len(gset)) & (
                gset[np.minimum(pos, len(gset) - 1)] == gh
            )
            np.add.at(hits, doc_of_gram[hit], 1)
        out = batch.append_column("n_hits", pa.array(hits))
        return out.append_column("contaminated", pa.array(hits > 0))

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
