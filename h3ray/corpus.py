"""Deterministic interleaved-document corpus (the BASELINE input shape).

Builds the ``input_hint`` table — ``(doc_id: string, spans:
list<struct<kind: string, text: string, media_ref: string, offset: int32>>)``
— as a *streaming batch transform* over the driver's ``documents`` parquet
table.  Every span sequence is a pure function of ``doc_id`` and the source
row, so the corpus is bit-identical across runs and cluster sizes; at 10^12
documents the same kernel runs unchanged as a ``map_batches`` stage over the
Lance/parquet scan.

Span layout per document (the per-row span-sequence invariant the engine
must preserve through every pipeline):
  - text spans: slices of the source document text,
  - media spans: ``media_ref = media://{source}/{doc_id}/{i}`` with empty
    text (binary payloads are opaque references at this layer),
  - geo spans: ``text = "{lng},{lat},{res}"`` — the reference's
    ``cells_parse`` coordinate format (h3ronpy tests/arrow/test_utf8.py:11),
    carrying the geometry payload of the document.

The synthesized latitudes/longitudes are integer-arithmetic functions of
``doc_id`` so a DuckDB oracle can reproduce them exactly in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

# SQL-mirrorable coordinate synthesis (documents carry one geo span each)
#   lat = ((doc_id * 37) % 16000) / 100.0 - 80.0      in [-80, 80)
#   lng = ((doc_id * 73) % 36000) / 100.0 - 180.0     in [-180, 180)
#   res = 5 + doc_id % 4                              in [5, 8]


def doc_lat(doc_id: np.ndarray) -> np.ndarray:
    return ((doc_id * 37) % 16000) / 100.0 - 80.0


def doc_lng(doc_id: np.ndarray) -> np.ndarray:
    return ((doc_id * 73) % 36000) / 100.0 - 180.0


def doc_res(doc_id: np.ndarray) -> np.ndarray:
    return (5 + doc_id % 4).astype(np.uint8)


def interleave_documents(batch: pa.Table) -> pa.Table:
    """documents(doc_id,text,lang,source,n_chars) -> interleaved span docs."""
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    text = batch.column("text").to_pylist()
    source = batch.column("source").to_pylist()
    lat = doc_lat(doc_id)
    lng = doc_lng(doc_id)
    res = doc_res(doc_id)

    kinds, texts, refs, offsets, lengths = [], [], [], [], []
    for i, did in enumerate(doc_id):
        t = text[i] or ""
        half = max(1, len(t) // 2)
        spans = [
            ("text", t[:half], "", 0),
            ("image", "", f"media://{source[i]}/{did}/0", half),
            ("geo", f"{lng[i]:.2f},{lat[i]:.2f},{res[i]}", "", half),
            ("text", t[half:], "", half),
        ]
        # longer documents interleave a second media span
        if len(t) > 200:
            spans.append(("audio", "", f"media://{source[i]}/{did}/1", len(t)))
        lengths.append(len(spans))
        for k, tx, rf, off in spans:
            kinds.append(k)
            texts.append(tx)
            refs.append(rf)
            offsets.append(off)

    flat = pa.StructArray.from_arrays(
        [
            pa.array(kinds, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(refs, type=pa.string()),
            pa.array(offsets, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    off = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=off[1:])
    spans = pa.ListArray.from_arrays(pa.array(off), flat)
    return pa.table(
        {
            "doc_id": pa.array([str(d) for d in doc_id], type=pa.string()),
            "spans": spans,
        }
    )


def extract_geo_spans(batch: pa.Table) -> pa.Table:
    """Explode geo spans to (doc_id, geo_text) rows while leaving the span
    sequence untouched on the original rows (span-sequence invariant)."""
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    kinds = flat.field("kind").to_numpy(zero_copy_only=False)
    offsets = spans.offsets.to_numpy(zero_copy_only=False)
    row_of = np.repeat(
        np.arange(len(batch), dtype=np.int64), np.diff(offsets.astype(np.int64))
    )
    geo = kinds == "geo"
    rows = row_of[geo]
    texts = flat.field("text").take(pa.array(np.nonzero(geo)[0]))
    out = batch.select(["doc_id"]).take(pa.array(rows))
    return out.append_column("geo_text", texts)


def spans_fingerprint(batch: pa.Table) -> pa.Table:
    """Order-sensitive fingerprint of each row's span sequence — the
    invariant check column (kind, text, media_ref, order)."""
    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()
    kinds = flat.field("kind").to_pylist()
    texts = flat.field("text").to_pylist()
    refs = flat.field("media_ref").to_pylist()
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    import zlib

    fps = []
    for i in range(len(batch)):
        parts = []
        for j in range(offsets[i], offsets[i + 1]):
            parts.append(f"{kinds[j]}\x01{texts[j]}\x01{refs[j]}")
        fps.append(zlib.crc32("\x02".join(parts).encode()))
    return batch.append_column("span_fp", pa.array(np.array(fps, dtype=np.uint32)))
