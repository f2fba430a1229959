"""Cross-document repeated-segment removal (CCNet / RefinedWeb-style
line dedup).

A *segment* is a delimiter-separated span of a document (lines for
``delim="\\n"``, tokens for ``delim=" "``).  The operator counts, for
every distinct segment content, the number of DISTINCT documents that
contain it, then rewrites each document with all segments that occur in
``>= min_docs`` documents removed (boilerplate headers, navigation
chrome, licence blurbs at line granularity; stop-token pruning at token
granularity).  This is the classic pre-training corpus cleanup step that
is neither a whole-document dedup (dedup.py) nor a near-dup pass — it
edits *inside* documents.

Distributed plan (no driver-side text, no all-pairs):

1. ``map_batches``: jagged-split each doc on the delimiter byte in the
   flat UTF-8 buffer (vectorized boundary scatters, no per-row Python),
   FNV-hash every segment, pre-aggregate ``(segment_hash, partial
   doc-count)`` per batch — each doc lives in exactly one row/batch, so
   batch-local doc counts sum to the global distinct-doc count.
2. One bucketed exchange: ``groupby(bucket_single(hash))`` +
   ``np.unique``-sum per bucket (the repo's high-cardinality groupby
   rule — never millions of distinct keys into Ray's per-group combine).
3. The surviving dup-hash set (bounded by the duplicated fraction, NOT
   corpus size) tree-reduces to one sorted array, ships once via
   ``ray.put`` (``max_dup_segments`` guard mirrors
   membership.distinct_keys_broadcast), and a second doc pass drops
   matching segments with a searchsorted membership test and regathers
   the kept text zero-copy from the original buffer.

Rewrite trick: in the source buffer every non-first segment is preceded
by exactly one delimiter, so joining the kept segments is a single
jagged gather over ranges extended one delimiter to the left for every
kept segment that is not the first kept of its doc — no per-doc string
building.

Identity is hash-based (64-bit FNV-1a, the package-wide content hash);
a collision could drop an extra segment — at 2^-64 per pair this is the
standard trade for never shuffling segment text.  Empty segments
(consecutive delimiters) are never counted and never removed.

No counterpart in the reference (h3ronpy has no text ops); this serves
the training-data-pipeline tier next to functions/dedup.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ._strkern import fnv1a_segments, utf8_view
from ._util import bucket_single, distinct_pairs


def split_segments(
    data: np.ndarray, off: np.ndarray, delim: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split each doc ``data[off[i]:off[i+1]]`` on the single-byte
    ``delim``: returns (seg_starts, seg_stops, doc_of_seg), flat and in
    document order.  Pure boundary scatters — O(total_bytes) vectorized.
    """
    if len(delim) != 1:
        raise ValueError("delim must be a single byte")
    if delim[0] >= 0x80:
        raise ValueError(
            "delim must be an ASCII byte (< 0x80): bytes >= 0x80 are UTF-8 "
            "continuation bytes, so splitting on one would cut inside a "
            "codepoint and emit invalid UTF-8 in the rewritten text"
        )
    n = len(off) - 1
    dpos = np.nonzero(data[: int(off[-1])] == delim[0])[0]
    doc_of_d = np.searchsorted(off, dpos, side="right") - 1
    segs_per_doc = np.bincount(doc_of_d, minlength=n) + 1
    seg_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(segs_per_doc, out=seg_off[1:])
    total = int(seg_off[-1])
    starts = np.empty(total, dtype=np.int64)
    stops = np.empty(total, dtype=np.int64)
    # delimiter m (global order) ends segment (doc_of_d + m) and starts
    # segment (doc_of_d + m + 1): within doc i the k-th delimiter sits at
    # flat index seg_off[i] + k = i + (#delims before doc i) + k, and the
    # global index m already equals (#delims before doc i) + k.
    m = np.arange(len(dpos), dtype=np.int64)
    starts[seg_off[:-1]] = off[:-1]
    stops[seg_off[1:] - 1] = off[1:]
    starts[doc_of_d + m + 1] = dpos + 1
    stops[doc_of_d + m] = dpos
    doc_of_seg = np.repeat(np.arange(n, dtype=np.int64), segs_per_doc)
    return starts, stops, doc_of_seg


def _doc_distinct_seg_hashes(
    batch: pa.Table, text_col: str, delim: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(seg_hashes, doc_of_seg, starts, stops) for the non-empty segments
    of a batch of docs."""
    data, off = utf8_view(batch.column(text_col))
    starts, stops, doc_of_seg = split_segments(data, off, delim)
    keep = stops > starts  # empty segments never count
    starts, stops, doc_of_seg = starts[keep], stops[keep], doc_of_seg[keep]
    h = _hash_ranges(data, starts, stops)
    return h, doc_of_seg, starts, stops


def _hash_ranges(
    data: np.ndarray, starts: np.ndarray, stops: np.ndarray
) -> np.ndarray:
    """FNV-1a of each byte range [starts[i], stops[i]).  fnv1a_segments
    needs contiguous (data, offsets), and the ranges here are separated
    by delimiter bytes, so gather first — one memcpy of the text minus
    delimiters, still O(total_bytes)."""
    from ._strkern import gather_segments

    gdata, goff = gather_segments(data, starts, stops)
    return fnv1a_segments(gdata, goff)


def segment_doc_counts(
    ds, text_col: str = "text", delim: bytes = b"\n", num_buckets: int = 64
):
    """Dataset of ``(segment_hash uint64, df int64)`` — for every distinct
    non-empty segment, the number of distinct documents containing it."""

    def partial(batch: pa.Table) -> pa.Table:
        h, doc_of_seg, _, _ = _doc_distinct_seg_hashes(batch, text_col, delim)
        # distinct (doc, hash): a doc appears in exactly one batch, so
        # summing these batch partials yields global distinct-doc counts
        _, hs = distinct_pairs(doc_of_seg, h)
        uh, cnt = np.unique(hs, return_counts=True)
        return pa.table(
            {
                "segment_hash": pa.array(uh, type=pa.uint64()),
                "df": pa.array(cnt.astype(np.int64)),
                "bucket": pa.array(
                    bucket_single(uh.view(np.int64), num_buckets)
                ),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        h = group.column("segment_hash").to_numpy(zero_copy_only=False)
        c = group.column("df").to_numpy(zero_copy_only=False)
        uh, inv = np.unique(h, return_inverse=True)
        sums = np.zeros(len(uh), dtype=np.int64)
        np.add.at(sums, inv, c)
        return pa.table(
            {
                "segment_hash": pa.array(uh, type=pa.uint64()),
                "df": pa.array(sums),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("bucket").map_groups(merge, batch_format="pyarrow")


def _collect_dup_hashes(counts_ds, min_docs: int, max_dup_segments: int):
    """Tree-reduce the >= min_docs hash set to one sorted uint64 array."""

    def threshold(batch: pa.Table) -> pa.Table:
        df = batch.column("df").to_numpy(zero_copy_only=False)
        h = batch.column("segment_hash").to_numpy(zero_copy_only=False)
        return pa.table(
            {"segment_hash": pa.array(np.unique(h[df >= min_docs]), type=pa.uint64())}
        )

    level1 = counts_ds.map_batches(
        threshold, batch_format="pyarrow", zero_copy_batch=True
    )
    tables = [t for t in ray.get(level1.to_arrow_refs()) if t.num_rows]
    if not tables:
        return np.zeros(0, dtype=np.uint64)
    allh = np.concatenate(
        [t.column("segment_hash").to_numpy(zero_copy_only=False) for t in tables]
    )
    dup = np.unique(allh)
    if len(dup) > max_dup_segments:
        raise ValueError(
            f"{len(dup)} duplicated segments exceed max_dup_segments="
            f"{max_dup_segments}; raise the guard or lower min_docs — the "
            "broadcast set must stay node-resident (a bloom-routed co-group "
            "variant is the unbounded-build-side alternative, cf. "
            "membership.bloom_semijoin)"
        )
    return dup


def remove_duplicated_segments(
    ds,
    text_col: str = "text",
    delim: bytes = b"\n",
    min_docs: int = 2,
    num_buckets: int = 64,
    max_dup_segments: int = 4_000_000,
):
    """Rewrite every document with segments occurring in >= ``min_docs``
    distinct documents removed.  Adds ``kept_text`` (the rewritten doc,
    kept segments joined by the delimiter in original order), ``n_kept``
    and ``n_dropped`` (non-empty segment counts) next to the input
    columns.  See the module docstring for the plan and hash caveat."""
    dup = _collect_dup_hashes(
        segment_doc_counts(ds, text_col, delim, num_buckets),
        min_docs,
        max_dup_segments,
    )
    dup_ref = ray.put(dup)

    def rewrite(batch: pa.Table) -> pa.Table:
        dset = ray.get(dup_ref)
        data, off = utf8_view(batch.column(text_col))
        n = batch.num_rows
        starts, stops, doc_of_seg = split_segments(data, off, delim)
        nonempty = stops > starts
        h = np.zeros(len(starts), dtype=np.uint64)
        if nonempty.any():
            h[nonempty] = _hash_ranges(data, starts[nonempty], stops[nonempty])
        is_dup = np.zeros(len(starts), dtype=bool)
        if len(dset) and nonempty.any():
            pos = np.searchsorted(dset, h[nonempty])
            pos[pos == len(dset)] = 0
            is_dup[nonempty] = dset[np.minimum(pos, len(dset) - 1)] == h[nonempty]
        keep = ~is_dup
        # drop empty segments from the rewrite too: consecutive delimiters
        # collapse, matching the SQL oracle's tok <> '' filter
        keep &= nonempty
        kstarts, kstops, kdoc = starts[keep], stops[keep], doc_of_seg[keep]
        # extend every kept segment that is not the first kept of its doc
        # one delimiter left: the byte before any non-first segment is
        # always the delimiter, so the gather emits the joined text
        first_of_doc = np.ones(len(kdoc), dtype=bool)
        first_of_doc[1:] = kdoc[1:] != kdoc[:-1]
        kstarts = kstarts - (~first_of_doc).astype(np.int64)
        from ._strkern import gather_segments

        gdata, goff = gather_segments(data, kstarts, kstops)
        # per-doc byte lengths of the joined text
        seg_lens = goff[1:] - goff[:-1]
        doc_bytes = np.zeros(n, dtype=np.int64)
        np.add.at(doc_bytes, kdoc, seg_lens)
        doc_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(doc_bytes, out=doc_off[1:])
        kept_text = pa.Array.from_buffers(
            pa.large_utf8(),
            n,
            [None, pa.py_buffer(doc_off.tobytes()), pa.py_buffer(gdata.tobytes())],
        ).cast(pa.utf8())
        n_kept = np.bincount(kdoc, minlength=n).astype(np.int64)
        n_total = np.zeros(n, dtype=np.int64)
        np.add.at(n_total, doc_of_seg[nonempty], 1)
        out = batch.append_column("kept_text", kept_text)
        out = out.append_column("n_kept", pa.array(n_kept))
        out = out.append_column("n_dropped", pa.array(n_total - n_kept))
        return out

    return ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)
