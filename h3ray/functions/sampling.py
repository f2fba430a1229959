"""Deterministic sampling + document chunking for training-data pipelines.

Both operators are pure per-row functions of key columns, so they shard
identically at any cluster size / block layout (the resumability contract),
and both are intentionally SQL-expressible so the driver can value-oracle
them end to end:

  * ``hash_sample``: multiplicative (Knuth) hashing — keep rows where
    ``(key * 2654435761) mod 2^32 < rate * 2^32``.  Optional per-stratum
    rates (data-mixing weights) via a small broadcast dict.
  * ``chunk_documents``: fixed-size overlapping character windows (the
    standard LLM pre-tokenization chunking), vectorized over the batch's
    flat UTF-8 buffer with a codepoint->byte map, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._strkern import utf8_from_segments, utf8_view

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1) << np.uint64(32)


def hash_sample(batch: pa.Table, rate, key_col: str = "doc_id",
                stratum_col: str | None = None,
                default_rate: float = 0.0) -> pa.Table:
    """Deterministic hash sampling: row kept iff
    ``(key * 2654435761) % 2^32 < floor(rate * 2^32)``.

    ``rate`` is a float, or a dict {stratum value -> rate} applied through
    ``stratum_col`` (strata absent from the dict use ``default_rate``) —
    the per-source mixing-weight pattern; ship the dict via the map_batches
    closure (it is tiny and broadcast once per worker with the function).

    Key domain: keys must be NON-NEGATIVE integers.  The kernel works in
    uint64 with wraparound multiplication, while the SQL oracle twin does
    int64 arithmetic (DuckDB errors on overflow instead of wrapping) — the
    two agree for keys in [0, 2^63/2654435761 ≈ 3.47e9] and we reject
    negatives outright so engine and oracle can never silently diverge.
    """
    keys_signed = batch.column(key_col).to_numpy(zero_copy_only=False)
    if np.issubdtype(keys_signed.dtype, np.floating) and keys_signed.size:
        # an int column with nulls arrives as float64 + NaN; NaN->uint64 is
        # platform-undefined, so sampling would be silently nondeterministic
        if np.isnan(keys_signed).any():
            raise ValueError(
                f"hash_sample key column {key_col!r} contains nulls/NaN; "
                "keys must be non-null integers"
            )
    if keys_signed.size and not np.issubdtype(keys_signed.dtype,
                                              np.unsignedinteger) \
            and keys_signed.min() < 0:
        raise ValueError(
            f"hash_sample key column {key_col!r} contains negative values; "
            "keys must be non-negative (uint64 wraparound would diverge "
            "from the int64 SQL-oracle semantics)"
        )
    keys = keys_signed.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (keys * _KNUTH) % _MOD32
    if isinstance(rate, dict):
        if stratum_col is None:
            raise ValueError("dict rate requires stratum_col")
        strata = batch.column(stratum_col).to_numpy(zero_copy_only=False)
        thresh = np.full(len(batch), np.uint64(int(default_rate * (1 << 32))),
                         dtype=np.uint64)
        for val, r in rate.items():
            thresh[strata == val] = np.uint64(int(r * (1 << 32)))
    else:
        thresh = np.uint64(int(float(rate) * (1 << 32)))
    return batch.filter(pa.array(h < thresh))


def chunk_documents(batch: pa.Table, size: int = 200, overlap: int = 20,
                    text_col: str = "text", doc_col: str = "doc_id") -> pa.Table:
    """Explode documents into fixed-size overlapping character chunks:
    chunk i covers characters [i*stride, i*stride + size) with
    stride = size - overlap; every document yields at least one chunk
    (n = 1 for len <= size, else 1 + ceil((len - size) / stride)).

    Vectorized: chunk counts and char spans computed batch-wide, the
    char->byte map is the non-continuation-byte position trick (one pass
    over the flat UTF-8 buffer), and all chunk texts are gathered with one
    jagged segment copy — no per-row Python.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    text = batch.column(text_col)
    data, off = utf8_view(text)
    charlens = pc.utf8_length(pc.fill_null(text, "")).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    n = len(batch)
    n_chunks = np.where(
        charlens <= size, 1, 1 + (charlens - size + stride - 1) // stride
    ).astype(np.int64)
    total = int(n_chunks.sum())
    doc_of = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    chunk_id = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(n_chunks) - n_chunks, n_chunks
    )
    c0 = chunk_id * stride
    c1 = np.minimum(c0 + size, charlens[doc_of])
    # char -> byte positions (identity for pure-ASCII batches)
    bytelens = np.diff(off)
    if (bytelens == charlens).all():
        b0 = off[:-1][doc_of] + c0
        b1 = off[:-1][doc_of] + c1
    else:
        P = np.flatnonzero((data & 0xC0) != 0x80)
        char_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(charlens, out=char_off[1:])
        g0 = char_off[:-1][doc_of] + c0
        g1 = char_off[:-1][doc_of] + c1
        b0 = np.where(g0 < len(P), P[np.minimum(g0, max(len(P) - 1, 0))], off[-1])
        b1 = np.where(g1 < len(P), P[np.minimum(g1, max(len(P) - 1, 0))], off[1:][doc_of])
        b1 = np.where(c1 >= charlens[doc_of], off[1:][doc_of], b1)
    chunks = utf8_from_segments(data, b0, b1)
    return pa.table(
        {
            doc_col: batch.column(doc_col).take(pa.array(doc_of)),
            "chunk_id": pa.array(chunk_id),
            "chunk_text": chunks,
        }
    )


def pack_sequence_spans(ds, seq_len: int = 512, doc_col: str = "doc_id",
                        text_col: str = "text", bucket_size: int = 4096):
    """Sequence packing (concat-and-cut): documents are laid out in
    ``doc_col`` order into one virtual character stream (one separator
    char between docs) that is cut into fixed ``seq_len`` training
    windows; each document's span of windows is returned as
    (doc_id, start_seq, end_seq, n_seqs).

    The global document offset is a DISTRIBUTED PREFIX SUM (scan):
      pass 1 — per-block partial sums keyed by ``doc_id // bucket_size``
      -> tiny groupby -> driver computes the exclusive per-bucket base
      offsets (one row per bucket: choose bucket_size so bucket count
      stays driver-small, e.g. <= 1e6 rows even at 10^12 docs) and
      broadcasts them via ray.put;
      pass 2 — docs shuffle by bucket; each bucket group sorts by doc_id
      and adds its local exclusive cumsum to the broadcast base.
    Both passes stream; nothing large ever sits on the driver.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.utf8_length(
            pc.fill_null(batch.column(text_col), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64) + 1  # + separator
        b = ids // bucket_size
        u, inv = np.unique(b, return_inverse=True)
        s = np.bincount(inv, weights=lens.astype(np.float64)).astype(np.int64)
        return pa.table({"bucket": pa.array(u), "s": pa.array(s)})

    sums = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").sum("s").take_all()
    )
    sums.sort(key=lambda r: r["bucket"])
    base = {}
    acc = 0
    for r in sums:
        base[int(r["bucket"])] = acc
        acc += int(r["sum(s)"])
    base_ref = ray.put(base)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.utf8_length(
            pc.fill_null(batch.column(text_col), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(ids // bucket_size),
                doc_col: pa.array(ids),
                "len": pa.array(lens),
            }
        )

    def spans(batch: pa.Table) -> pa.Table:
        b = ray.get(base_ref) if isinstance(base_ref, ray.ObjectRef) else base_ref
        bucket = int(batch.column("bucket")[0].as_py())
        ids = batch.column(doc_col).to_numpy(zero_copy_only=False)
        lens = batch.column("len").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, lens = ids[order], lens[order]
        sep = lens + 1
        off = b[bucket] + np.cumsum(sep) - sep
        start = off // seq_len
        end = (off + np.maximum(lens, 1) - 1) // seq_len
        return pa.table(
            {
                doc_col: pa.array(ids),
                "start_seq": pa.array(start),
                "end_seq": pa.array(end),
                "n_seqs": pa.array(end - start + 1),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(spans, batch_format="pyarrow")
    )


# --- HyperLogLog cardinality sketch ------------------------------------------

_HLL_P = 12  # 4096 registers, ~1.6% standard error
_HLL_M = 1 << _HLL_P


def hll_partial(batch: pa.Table, col: str = "cell") -> pa.Table:
    """Per-batch HyperLogLog registers over a uint64 key column: one row of
    4096 uint8 registers (a fixed-size sketch — the mergeable partial for
    streaming COUNT DISTINCT at any scale).  Hash is a splitmix-style
    multiplicative mix (deterministic across runs/cluster sizes)."""
    keys = batch.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = keys * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(32)
    reg_idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = h << np.uint64(_HLL_P)
    # rank = leading zeros of the remaining 64-p bits + 1 (capped)
    nz = rest != 0
    lz = np.full(len(h), 64 - _HLL_P, dtype=np.int64)
    if nz.any():
        # exact bit_length: 64-bit values round in float64 (a value just
        # under 2^j can round UP and shift the exponent), so compute it on
        # the 32-bit halves, which float64 represents exactly
        r = rest[nz]
        hi = (r >> np.uint64(32)).astype(np.float64)
        lo = (r & np.uint64(0xFFFFFFFF)).astype(np.float64)
        bl_hi = np.frexp(hi)[1]
        bl_lo = np.frexp(lo)[1]
        bits_len = np.where(hi > 0, 32 + bl_hi, bl_lo)
        lz[nz] = 64 - bits_len
    rank = np.minimum(lz + 1, 64 - _HLL_P + 1).astype(np.uint8)
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    np.maximum.at(regs, reg_idx, rank)
    return pa.table(
        {"regs": pa.FixedSizeListArray.from_arrays(pa.array(regs), _HLL_M)}
    )


def hll_merge_estimate(partials: pa.Table) -> float:
    """Merge partial register rows (elementwise max — associative and
    commutative, so any tree/stream merge order is exact) and return the
    HLL cardinality estimate with the standard linear-counting
    small-range correction."""
    if partials.num_rows == 0:
        return 0.0
    flat = partials.column("regs").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    regs = flat.reshape(-1, _HLL_M).max(axis=0)
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def hll_count_distinct(ds, col: str = "cell") -> float:
    """Streaming distinct-count over a Dataset column: fixed-size partial
    sketches per block, one bounded merge — no shuffle of the keys at all
    (the groupby-based exact count moves every distinct key; this moves
    4 KiB per block)."""
    import ray

    parts = ds.map_batches(
        lambda b: hll_partial(b, col), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = parts.repartition(1).map_batches(
        lambda b: pa.table({"est": pa.array([hll_merge_estimate(b)])}),
        batch_format="pyarrow", batch_size=None,
    ).take(1)
    if not merged:  # empty dataset -> zero distinct values
        return 0.0
    return float(merged[0]["est"])


def exact_group_distinct(ds, key_col: str, val_col: str,
                         num_buckets: int = 64):
    """Exact per-group distinct count — SQL's ``count(DISTINCT val)
    GROUP BY key`` (per-source unique users, per-cell unique documents);
    the grouped exact twin of :func:`hll_count_distinct`.

    Plan: (1) per-block dedupe of (key, val) pairs, bucketed by a PAIR
    hash so every copy of one pair lands in one task; (2) per-bucket
    global dedupe + partial per-key counts (np.unique kernels — the
    high-cardinality groupby rule); (3) per-key sum of the partials,
    bucketed by KEY hash.  Both exchanges ship pre-deduplicated /
    pre-aggregated rows: stage-2 volume is bounded by the distinct-pair
    count, stage-3 by (distinct keys x num_buckets).  Returns
    (key_col, n_distinct int64).
    """
    import ray  # noqa: F401  (Dataset ops only; no driver collection)

    from ._util import bucket_pair, distinct_pairs

    def pair_partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ks, vs = distinct_pairs(k, v)
        return pa.table(
            {
                "k": pa.array(ks),
                "v": pa.array(vs),
                "bucket": pa.array(bucket_pair(ks, vs, num_buckets)),
            }
        )

    def bucket_count(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        ks, _ = distinct_pairs(k, v)
        uk, cnt = np.unique(ks, return_counts=True)
        return pa.table(
            {
                "k": pa.array(uk),
                "n": pa.array(cnt.astype(np.int64)),
                "kbucket": pa.array(
                    bucket_pair(uk, np.zeros_like(uk), num_buckets)
                ),
            }
        )

    def key_sum(group: pa.Table) -> pa.Table:
        k = group.column("k").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, n)
        return pa.table({key_col: pa.array(uk), "n_distinct": pa.array(sums)})

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    partials = pairs.groupby("bucket").map_groups(
        bucket_count, batch_format="pyarrow"
    )
    return partials.groupby("kbucket").map_groups(
        key_sum, batch_format="pyarrow"
    )
