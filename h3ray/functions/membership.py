"""Bloom-filter membership: distributed build + bloom-pruned exact
semi/anti joins.

The membership sibling of the HLL (sampling.py) and count-min
(sketch.py) sketches, same partial/merge architecture: each block folds
its keys into a fixed bit array, partials merge by elementwise OR
(associative + commutative — any tree/stream order is exact), and the
merged filter answers "possibly present" with NO false negatives and a
false-positive rate of ~(1 - e^(-kn/m))^k.

``bloom_semijoin`` keeps the EXACT semantics of SQL ``IN`` / ``NOT
IN (SELECT key ...)`` — the bloom only routes rows:

  * a bloom-NEGATIVE probe row is definitively absent (no false
    negatives): semi mode drops it before the exchange; anti mode emits
    it directly, bypassing the exchange entirely.
  * a bloom-POSITIVE row (true positives + the small FP fraction) goes
    through one hash(key) co-group against the per-block-deduped build
    keys for the exact verdict.

So the shuffle carries only ``|true matches| + fp_rate * |probe|`` rows
instead of the whole probe side — the classic bloom-pruned join. In
anti mode the probe is mapped twice (negative bypass + positive
verify), both passes streaming; 2x probe read I/O buys an exchange that
shrinks from |probe| to the positive fraction — the right trade
whenever the build keys are rare in the probe (the common "remove
previously-seen documents" shape).

Keys are int64/uint64 (hash strings first — e.g. text.fingerprints).
No counterpart in the reference; training-data tier: decontamination
against a benchmark-id set, removing previously-crawled doc ids,
holdout-split enforcement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._util import bucket_single as _bucket_of

_B_SEED1 = np.uint64(0x9E3779B97F4A7C15)
_B_SEED2 = np.uint64(0xBF58476D1CE4E5B9)


def _bloom_two_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit mixes; positions derive by double hashing
    (h1 + i*h2), the standard k-from-2 construction."""
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = k * _B_SEED1
        h1 ^= h1 >> np.uint64(32)
        h1 *= _B_SEED2
        h1 ^= h1 >> np.uint64(29)
        h2 = (k ^ _B_SEED2) * _B_SEED1
        h2 ^= h2 >> np.uint64(31)
        h2 = h2 | np.uint64(1)  # odd stride: cycles the whole bit space
    return h1, h2


def _bloom_positions(keys: np.ndarray, nbits: int, nhash: int) -> np.ndarray:
    """(len(keys), nhash) int64 bit positions."""
    h1, h2 = _bloom_two_hashes(keys)
    i = np.arange(nhash, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = h1[:, None] + i[None, :] * h2[:, None]
    return (pos % np.uint64(nbits)).astype(np.int64)


def bloom_partial(batch: pa.Table, col: str, nbits: int, nhash: int) -> pa.Table:
    """Per-batch bloom partial: ONE row holding the bit array as
    nbits/64 int64 words (the mergeable unit)."""
    keys = batch.column(col).to_numpy(zero_copy_only=False)
    words = np.zeros(nbits // 64, dtype=np.uint64)
    if len(keys):
        pos = _bloom_positions(keys, nbits, nhash).reshape(-1)
        np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
    return pa.table(
        {
            "bloom": pa.FixedSizeListArray.from_arrays(
                pa.array(words.view(np.int64)), nbits // 64
            )
        }
    )


def _or_merge(partials: pa.Table) -> np.ndarray:
    flat = partials.column("bloom").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    nwords = partials.column("bloom").type.list_size
    return np.bitwise_or.reduce(
        flat.view(np.uint64).reshape(-1, nwords), axis=0
    )


def bloom_from_dataset(ds, col: str, nbits: int = 1 << 23, nhash: int = 4,
                       fanin: int = 16) -> np.ndarray:
    """Global bloom filter over a Dataset column: per-block fixed-size
    partials (nbits/8 bytes each regardless of block size), OR-merged in
    one in-Ray tree level so the driver pulls ``fanin`` partials no
    matter how many blocks the input has (the cms_from_dataset scheme).
    Returns the uint64 word array; ``ray.put`` it once for probe tasks.
    """
    if nbits % 64 or nbits <= 0:
        raise ValueError(f"nbits must be a positive multiple of 64, got {nbits}")
    parts = ds.map_batches(
        lambda b: bloom_partial(b, col, nbits, nhash),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def merge_rows(batch: pa.Table) -> pa.Table:
        words = _or_merge(batch)
        return pa.table(
            {
                "bloom": pa.FixedSizeListArray.from_arrays(
                    pa.array(words.view(np.int64)), nbits // 64
                )
            }
        )

    level1 = parts.repartition(fanin).map_batches(
        merge_rows, batch_format="pyarrow", batch_size=None
    )
    import ray

    tables = [t for t in ray.get(level1.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.zeros(nbits // 64, dtype=np.uint64)
    return _or_merge(pa.concat_tables(tables))


def bloom_contains(words: np.ndarray, keys: np.ndarray, nhash: int = 4) -> np.ndarray:
    """Vectorized membership test: True = possibly present (FP rate per
    the build parameters), False = DEFINITELY absent."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    nbits = len(words) * 64
    pos = _bloom_positions(keys, nbits, nhash)
    bits = (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def bloom_semijoin(
    probe_ds,
    keys_ds,
    *,
    probe_key_col: str,
    key_col: str,
    carry_cols: tuple[str, ...],
    anti: bool = False,
    nbits: int = 1 << 23,
    nhash: int = 4,
    num_buckets: int = 64,
):
    """Exact semi (``anti=False``) or anti (``anti=True``) join of probe
    rows against the distinct key set of ``keys_ds[key_col]``, with a
    bloom filter routing rows so the exchange carries only the
    bloom-positive fraction (see module docstring).

    Returns a Dataset of the probe's ``carry_cols``.  ``probe_key_col``
    must be one of ``carry_cols`` if you want it in the output.  Build
    keys dedupe per block before the exchange, so build-side key
    multiplicity never inflates it.
    """
    import ray

    if not carry_cols:
        raise ValueError("carry_cols must name at least one probe column")
    reserved = {"__key", "bucket", "__side"} & set(carry_cols)
    if reserved:
        # the exchange appends these internal columns to the carry rows;
        # a collision would fail (or silently mis-group) inside a Ray task
        raise ValueError(
            f"carry_cols {sorted(reserved)} collide with bloom_semijoin's "
            "internal exchange columns ('__key', 'bucket', '__side'); "
            "rename them on the probe side first"
        )
    words_ref = ray.put(bloom_from_dataset(keys_ds, key_col, nbits, nhash))

    def _words():
        w = words_ref
        return ray.get(w) if isinstance(w, ray.ObjectRef) else w

    def probe_positive(batch: pa.Table) -> pa.Table:
        keys = batch.column(probe_key_col).to_numpy(zero_copy_only=False)
        m = bloom_contains(_words(), keys, nhash)
        kept = batch.select(list(carry_cols)).filter(pa.array(m))
        kk = keys[m].astype(np.int64)
        kept = kept.append_column("__key", pa.array(kk))
        kept = kept.append_column("bucket", pa.array(_bucket_of(kk, num_buckets)))
        return kept.append_column(
            "__side", pa.array(np.ones(len(kk), dtype=np.int8))
        )

    def probe_negative(batch: pa.Table) -> pa.Table:
        keys = batch.column(probe_key_col).to_numpy(zero_copy_only=False)
        m = bloom_contains(_words(), keys, nhash)
        return batch.select(list(carry_cols)).filter(pa.array(~m))

    def build_rows(batch: pa.Table) -> pa.Table:
        keys = np.unique(
            batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        t = pa.table(
            {
                c: pa.nulls(len(keys), probe_schema.field(c).type)
                for c in carry_cols
            }
        )
        t = t.append_column("__key", pa.array(keys))
        t = t.append_column("bucket", pa.array(_bucket_of(keys, num_buckets)))
        return t.append_column(
            "__side", pa.array(np.zeros(len(keys), dtype=np.int8))
        )

    probe_schema = probe_ds.schema().base_schema

    def verify(batch: pa.Table) -> pa.Table:
        side = batch.column("__side").to_numpy(zero_copy_only=False)
        key = batch.column("__key").to_numpy(zero_copy_only=False)
        pm = side == 1
        bkeys = np.unique(key[~pm])
        pkeys = key[pm]
        if len(bkeys):
            idx = np.minimum(np.searchsorted(bkeys, pkeys), len(bkeys) - 1)
            present = bkeys[idx] == pkeys
        else:
            present = np.zeros(len(pkeys), dtype=bool)
        keep = ~present if anti else present
        rows = batch.filter(pa.array(pm))
        return rows.select(list(carry_cols)).filter(pa.array(keep))

    pos = probe_ds.map_batches(
        probe_positive, batch_format="pyarrow", zero_copy_batch=True
    )
    build = keys_ds.map_batches(
        build_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    verified = (
        pos.union(build).groupby("bucket").map_groups(verify, batch_format="pyarrow")
    )
    if not anti:
        return verified
    neg = probe_ds.map_batches(
        probe_negative, batch_format="pyarrow", zero_copy_batch=True
    )
    return verified.union(neg)


def distinct_keys_broadcast(ds, col: str, max_keys: int = 4_000_000,
                            fanin: int = 16) -> np.ndarray:
    """Collect the DISTINCT int64 keys of a column for broadcasting:
    per-block unique partials, one in-Ray tree-unique level (the
    cms_from_dataset scheme), then a final driver unique over the
    ``fanin`` merged partials.  Raises if the result exceeds
    ``max_keys`` — the guard that keeps this a SMALL-side tool (a
    4M-key int64 array is 32 MB broadcast; beyond that use the
    co-group path of bloom_semijoin)."""

    def part(batch: pa.Table) -> pa.Table:
        k = np.unique(
            batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"k": pa.array(k)})

    def merge(batch: pa.Table) -> pa.Table:
        k = np.unique(batch.column("k").to_numpy(zero_copy_only=False))
        if len(k) > max_keys:
            raise ValueError(
                f"distinct key count exceeds max_keys={max_keys} in a merge "
                "partial; use the co-group path (bloom_semijoin without "
                "broadcast) for large build sides"
            )
        return pa.table({"k": pa.array(k)})

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    level1 = parts.repartition(fanin).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )
    import ray

    tables = [t for t in ray.get(level1.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.zeros(0, dtype=np.int64)
    keys = np.unique(
        pa.concat_tables(tables).column("k").to_numpy(zero_copy_only=False)
    )
    if len(keys) > max_keys:
        raise ValueError(
            f"distinct key count {len(keys)} exceeds max_keys={max_keys}; "
            "use the co-group path (bloom_semijoin without broadcast)"
        )
    return keys


def broadcast_semijoin(
    probe_ds,
    keys_ds,
    *,
    probe_key_col: str,
    key_col: str,
    carry_cols: tuple[str, ...],
    anti: bool = False,
    max_keys: int = 4_000_000,
):
    """Exact semi/anti join with a BROADCAST build side: the distinct
    build keys collect through an in-Ray tree-unique (guarded by
    ``max_keys``), ship once via ray.put, and every probe batch answers
    membership with one sorted searchsorted — NO exchange, ONE probe
    pass, exact IN / NOT IN semantics.  The small-build sibling of
    ``bloom_semijoin`` (which streams arbitrarily large build sides
    through a co-group); pick by build-side cardinality."""
    import ray

    if not carry_cols:
        raise ValueError("carry_cols must name at least one probe column")
    keys_ref = ray.put(distinct_keys_broadcast(keys_ds, key_col, max_keys))

    def kernel(batch: pa.Table) -> pa.Table:
        ks = keys_ref
        if isinstance(ks, ray.ObjectRef):
            ks = ray.get(ks)
        pk = batch.column(probe_key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(ks):
            idx = np.minimum(np.searchsorted(ks, pk), len(ks) - 1)
            present = ks[idx] == pk
        else:
            present = np.zeros(len(pk), dtype=bool)
        keep = ~present if anti else present
        return batch.select(list(carry_cols)).filter(pa.array(keep))

    return probe_ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)
