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


def _fmt_cents(cents: np.ndarray):
    """Integer cents -> '%.2f'-equivalent string Array (the floats are
    exact 2-decimal values, so integer formatting is bit-identical).
    Pure Arrow kernels — no np.char Python-level string loops."""
    import pyarrow.compute as pc

    a = np.abs(cents)
    sign = pc.if_else(
        pa.array(cents < 0), pa.scalar("-", pa.string()), pa.scalar("", pa.string())
    )
    ip = pc.cast(pa.array(a // 100), pa.string())
    fr = pc.utf8_lpad(pc.cast(pa.array(a % 100), pa.string()), 2, "0")
    return pc.binary_join_element_wise(
        pc.binary_join_element_wise(sign, ip, ""), fr, "."
    )


def interleave_documents(batch: pa.Table) -> pa.Table:
    """documents(doc_id,text,lang,source,n_chars) -> interleaved span docs.

    Vectorized: per-slot columns built batch-wide (halves via UTF-8 byte
    slicing, geo text via integer cent formatting, media refs via Arrow
    join), then interleaved doc-major with one lexsort permutation — no
    per-document Python."""
    import pyarrow.compute as pc

    from .functions._strkern import utf8_from_segments, utf8_view

    n = len(batch)
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    text_col = batch.column("text")
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    source = batch.column("source")
    data, off = utf8_view(text_col)
    charlens = pc.utf8_length(pc.fill_null(text_col, "")).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    half = np.maximum(1, charlens // 2)
    half_eff = np.minimum(half, charlens)
    bytelens = np.diff(off)
    if (bytelens == charlens).all():  # pure-ASCII batch: chars == bytes
        bhalf = off[:-1] + half_eff
    else:
        # char -> byte map: positions of non-continuation bytes
        P = np.flatnonzero((data & 0xC0) != 0x80)
        char_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(charlens, out=char_off[1:])
        idx = char_off[:-1] + half_eff
        bhalf = np.where(half_eff < charlens, P[np.minimum(idx, len(P) - 1)], off[1:])
    first = utf8_from_segments(data, off[:-1], bhalf)
    second = utf8_from_segments(data, bhalf, off[1:])

    lat_c = (doc_id * 37) % 16000 - 8000
    lng_c = (doc_id * 73) % 36000 - 18000
    res = doc_res(doc_id)
    geo_text = pc.binary_join_element_wise(
        _fmt_cents(lng_c), _fmt_cents(lat_c),
        pc.cast(pa.array(res.astype(np.int64)), pa.string()), ","
    )
    if isinstance(geo_text, pa.ChunkedArray):
        geo_text = geo_text.combine_chunks()
    did_str = pc.cast(batch.column("doc_id"), pa.string())
    if isinstance(did_str, pa.ChunkedArray):
        did_str = did_str.combine_chunks()
    ref0 = pc.binary_join_element_wise("media:/", source, did_str, "0", "/")
    ref1 = pc.binary_join_element_wise("media:/", source, did_str, "1", "/")
    if isinstance(ref0, pa.ChunkedArray):
        ref0, ref1 = ref0.combine_chunks(), ref1.combine_chunks()
    empty = pa.array([""] * n, type=pa.string())
    zero = pa.array(np.zeros(n, dtype=np.int32))
    half32 = pa.array(half.astype(np.int32))

    long = charlens > 200
    nlong = int(long.sum())
    lidx = np.nonzero(long)[0]
    const = lambda s, m: pa.array([s] * m, type=pa.string())  # noqa: E731
    slot_kind = [const("text", n), const("image", n), const("geo", n),
                 const("text", n), const("audio", nlong)]
    slot_text = [first, empty, geo_text, second, const("", nlong)]
    slot_ref = [empty, ref0, empty, empty, ref1.take(pa.array(lidx))]
    slot_off = [zero, half32, half32, half32,
                pa.array(charlens[lidx].astype(np.int32))]
    doc_rep = np.concatenate([np.arange(n)] * 4 + [lidx])
    slot_rep = np.repeat(np.arange(5), [n, n, n, n, nlong])
    order = pa.array(np.lexsort((slot_rep, doc_rep)))
    flat = pa.StructArray.from_arrays(
        [
            pa.concat_arrays(slot_kind).take(order),
            pa.concat_arrays(slot_text).take(order),
            pa.concat_arrays(slot_ref).take(order),
            pa.concat_arrays(slot_off).take(order),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    lengths = np.full(n, 4, dtype=np.int32)
    lengths[long] += 1
    loff = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lengths, out=loff[1:])
    spans = pa.ListArray.from_arrays(pa.array(loff), flat)
    return pa.table({"doc_id": did_str, "spans": spans})


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
    invariant check column (kind, text, media_ref, order).

    Span serialization is pure Arrow (element-wise + per-row joins); the
    crc32 itself is one C call per row over a zero-copy buffer slice."""
    import zlib

    import pyarrow.compute as pc

    from .functions._strkern import utf8_view

    spans = batch.column("spans").combine_chunks()
    flat = spans.flatten()
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if offsets[0] != 0:
        offsets = offsets - offsets[0]
    per_span = pc.binary_join_element_wise(
        flat.field("kind"), flat.field("text"), flat.field("media_ref"), "\x01"
    )
    rows = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32)), per_span),
        "\x02",
    )
    data, roff = utf8_view(rows)
    mv = memoryview(data.tobytes())
    crc = zlib.crc32
    fps = np.fromiter(
        (crc(mv[roff[i] : roff[i + 1]]) for i in range(len(batch))),
        dtype=np.uint32,
        count=len(batch),
    )
    return batch.append_column("span_fp", pa.array(fps))
