"""Multimodal column handling: opaque binary media + typed metadata.

Image/audio/video payloads are ``binary`` columns with metadata struct
columns; decode / feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages (a callable class: model/codec setup once per actor
in ``__init__``, per-batch work in ``__call__``).

The decode itself is STUBBED: the real codec libraries (PIL/ffmpeg/...)
are not installed in this environment.  ``DecodeMode.FAKE`` produces a
deterministic payload-derived pseudo-decode so the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and tested;
``DecodeMode.STRICT`` raises NotImplementedError exactly where a codec
would plug in.
"""

from __future__ import annotations

import enum

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


class DecodeMode(enum.Enum):
    FAKE = "fake"
    STRICT = "strict"


def synthesize_media(batch: pa.Table, ref_col: str = "media_ref") -> pa.Table:
    """Deterministic fake payloads for media refs (corpus side): payload
    bytes are a seeded counter-hash of the ref string — fully vectorized
    (jagged FNV for the seed, one mixing pass for all payload bytes)."""
    import pyarrow.compute as pc

    from ._strkern import utf8_view
    from .text import hash_u64_batch

    refs = batch.column(ref_col)
    n_rows = len(batch)
    seeds = (hash_u64_batch(refs) % np.uint64(2**32)).astype(np.uint64)
    lens = (256 + (seeds % np.uint64(512)).astype(np.int64))
    off = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    total = int(off[-1])
    seed_rep = np.repeat(seeds, lens)
    t = np.arange(total, dtype=np.uint64) - np.repeat(off[:-1], lens).astype(np.uint64)
    with np.errstate(over="ignore"):
        v = seed_rep * np.uint64(0x9E3779B97F4A7C15) + t * np.uint64(0xBF58476D1CE4E5B9)
        v ^= v >> np.uint64(29)
    data = (v & np.uint64(0xFF)).astype(np.uint8)
    payload = pa.Array.from_buffers(
        pa.large_binary(), n_rows,
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(data.tobytes())],
    )
    kind = pc.if_else(
        pc.ends_with(pc.fill_null(refs, ""), pattern="/1"),
        pa.scalar("audio", pa.string()),
        pa.scalar("image", pa.string()),
    )
    if isinstance(kind, pa.ChunkedArray):
        kind = kind.combine_chunks()
    batch = batch.append_column("kind", kind)
    return batch.append_column("payload", payload)


def hash_ref(r: str) -> int:
    h = 0xCBF29CE484222325
    for b in (r or "").encode():
        h = ((h ^ b) * 0x100000001B3) % (1 << 64)
    return h


class MediaDecoder:
    """Actor-pool stage: decode + feature-extract media payloads.

    Use as ``ds.map_batches(MediaDecoder, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B)`` — the (stub) codec state is built once
    per actor, per-batch work is vectorized."""

    def __init__(self, mode: DecodeMode | str = DecodeMode.FAKE, target_size: int = 32):
        self.mode = DecodeMode(mode) if not isinstance(mode, DecodeMode) else mode
        self.target_size = target_size
        # real codecs would be loaded HERE, once per actor:
        #   self.codec = PIL/ffmpeg/torchvision handle ...
        self.codec = None

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self.mode is DecodeMode.STRICT:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "plug a decoder in MediaDecoder._decode"
            )
        # deterministic pseudo-decode: payload bytes folded into a fixed
        # (target_size x target_size) float image / 1D waveform
        b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        n = self.target_size * self.target_size
        reps = int(np.ceil(n / max(1, len(b))))
        arr = np.tile(b, reps)[:n] / 255.0
        return arr.reshape(self.target_size, self.target_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized feature fold over the whole batch: the fake decode
        tiles each payload to exactly n = target_size^2 values, so its
        mean/std are closed forms of integer byte sums — q full copies plus
        an r-byte prefix, q = n // len, r = n mod len — computed with two
        cumsum passes over the batch's flat payload buffer (zero-copy view
        via ``_strkern.utf8_view``).  Stats are exact float64 over the tiled
        semantics; no per-payload Python in the batch path."""
        if self.mode is DecodeMode.STRICT:
            # fail exactly where a codec would plug in, first batch
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "plug a decoder in MediaDecoder._decode"
            )
        from ._strkern import utf8_view

        data, off = utf8_view(batch.column("payload"))
        lens = np.diff(off)
        nrow = len(batch)
        n = self.target_size * self.target_size
        q = np.where(lens > 0, n // np.maximum(lens, 1), 0).astype(np.int64)
        # prefix bytes of the partial copy (= n when len > n; 0 for empties)
        r = np.where(lens > 0, n - q * lens, 0)
        d64 = data.astype(np.int64)
        cs1 = np.zeros(len(data) + 1, dtype=np.int64)
        np.cumsum(d64, out=cs1[1:])
        cs2 = np.zeros(len(data) + 1, dtype=np.int64)
        np.cumsum(d64 * d64, out=cs2[1:])
        starts = off[:-1]
        pref_end = np.minimum(starts + r, off[1:])
        s1 = (cs1[off[1:]] - cs1[starts]) * q + (cs1[pref_end] - cs1[starts])
        s2 = (cs2[off[1:]] - cs2[starts]) * q + (cs2[pref_end] - cs2[starts])
        mean = s1 / (255.0 * n)
        var = s2 / (n * 255.0 * 255.0) - mean * mean
        std = np.sqrt(np.maximum(var, 0.0))
        batch = batch.append_column("feat_mean", pa.array(mean))
        batch = batch.append_column("feat_std", pa.array(std))
        return batch.append_column(
            "decoded_size",
            pa.array(np.full(nrow, self.target_size, dtype=np.int32)),
        )


class FrameSampler:
    """Actor-pool stage: uniform frame sampling from (fake-encoded) video
    payloads — the frame-sample step of a video ingestion pipeline.

    Layout contract: a payload of ``n_frames`` frames stores frame j in
    the byte window [j*L // n, (j+1)*L // n) of its L-byte payload (equal
    slices, floor boundaries — what a fixed-rate raw stream looks like; a
    real container's codec seek index would be loaded once per actor HERE
    in ``__init__``).  Uniformly samples ``m`` frames: indices
    (k * n) // s for k < s, s = min(m, n) — every frame when n <= m.

    Emits one row per sampled frame: (ref_col, frame_idx, n_frames,
    frame_len, frame_payload).  Fully vectorized: explode via
    repeat/arange segments and ONE fancy-index gather over the batch's
    flat payload buffer; zero-length frames (L < n_frames) are fine."""

    def __init__(self, m: int = 4, payload_col: str = "payload",
                 nframes_col: str = "n_frames", ref_col: str = "media_ref"):
        if m < 1:
            raise ValueError("m must be >= 1")
        self.m = m
        self.payload_col = payload_col
        self.nframes_col = nframes_col
        self.ref_col = ref_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ._strkern import utf8_view

        data, off = utf8_view(batch.column(self.payload_col))
        n = batch.column(self.nframes_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        L = np.diff(off)
        s = np.minimum(self.m, np.maximum(n, 0))  # rows with n <= 0: no frames
        rows = np.repeat(np.arange(len(batch), dtype=np.int64), s)
        total = int(s.sum())
        k = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(s) - s, s)
        nn = n[rows]
        ss = s[rows]
        idx = (k * nn) // np.maximum(ss, 1)
        Lr = L[rows]
        fs = off[:-1][rows] + (idx * Lr) // np.maximum(nn, 1)
        fe = off[:-1][rows] + ((idx + 1) * Lr) // np.maximum(nn, 1)
        flen = fe - fs
        out_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(flen, out=out_off[1:])
        gather = np.repeat(fs, flen) + (
            np.arange(int(out_off[-1]), dtype=np.int64)
            - np.repeat(out_off[:-1], flen)
        )
        payload = pa.Array.from_buffers(
            pa.large_binary(), total,
            [None, pa.py_buffer(out_off.tobytes()),
             pa.py_buffer(data[gather].tobytes())],
        )
        return pa.table(
            {
                self.ref_col: batch.column(self.ref_col).take(pa.array(rows)),
                "frame_idx": pa.array(idx),
                "n_frames": pa.array(nn),
                "frame_len": pa.array(flen),
                "frame_payload": payload,
            }
        )


def frame_sample_pipeline(ds, m: int = 4, concurrency: int = 4,
                          batch_size: int = 64):
    """videos -> sampled frame rows (actor pool; small batches — payloads
    are large and explode by up to m per row)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"m": m},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


def media_pipeline(ds, mode: str = "fake", concurrency: int = 4, batch_size: int = 64):
    """documents-with-media-refs -> decoded feature rows (actor pool).

    Small batch_size is deliberate: media payloads are large, so batch x
    concurrency must fit each worker's heap."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"mode": mode},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )


class ImageResizer:
    """Actor-pool stage: decode + block-mean resize to (out_size x
    out_size), emitting REAL pixel buffers (float32 bytes) with typed
    size metadata — the plumbing a production resize stage needs
    (schema, batch sizing, actor state, output layout), with the codec
    behind the same FAKE/STRICT gate as :class:`MediaDecoder`.

    Decode follows MediaDecoder's deterministic fake codec (payload
    bytes tiled to decode_size^2, /255); resize is one vectorized
    block-mean over the whole batch: the (nrow, n) pixel matrix is a
    single fancy-gather ``flat[start_i + (arange(n) % len_i)]``, then
    ``reshape(nrow, out, f, out, f).mean((2, 4))`` with
    f = decode_size // out_size.  No per-row Python.

    ``decode_size`` must be a multiple of ``out_size`` (exact block
    partition; real resizers interpolate, the fake one averages)."""

    def __init__(self, mode: DecodeMode | str = DecodeMode.FAKE,
                 decode_size: int = 32, out_size: int = 8):
        self.mode = DecodeMode(mode) if not isinstance(mode, DecodeMode) else mode
        if decode_size % out_size:
            raise ValueError(
                f"decode_size {decode_size} must be a multiple of "
                f"out_size {out_size}"
            )
        self.decode_size = decode_size
        self.out_size = out_size
        self.codec = None  # real resize backend would load here, once

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode is DecodeMode.STRICT:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "plug a decoder in ImageResizer.__call__"
            )
        from ._strkern import utf8_view

        data, off = utf8_view(batch.column("payload"))
        lens = np.diff(off)
        nrow = len(batch)
        S, O = self.decode_size, self.out_size
        n = S * S
        # (nrow, n) gather of the tiled fake decode; empty payloads -> 0
        # (their gather start is pinned to 0 — an empty row's offset can sit
        # AT the end of the flat buffer and would index out of bounds)
        if len(data) == 0:
            px = np.zeros((nrow, n), dtype=np.float32)
        else:
            safe_lens = np.maximum(lens, 1)
            starts = np.where(lens > 0, off[:-1], 0)
            idx = starts[:, None] + (np.arange(n, dtype=np.int64)[None, :]
                                     % safe_lens[:, None])
            px = data[idx].astype(np.float32) / 255.0
            px[lens == 0] = 0.0
        f = S // O
        small = px.reshape(nrow, O, f, O, f).mean(axis=(2, 4))
        buf = small.astype(np.float32).tobytes()
        row_nbytes = O * O * 4
        offsets = pa.array(
            np.arange(nrow + 1, dtype=np.int64) * row_nbytes
        )
        pixels = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), nrow,
            [None, offsets.buffers()[1], pa.py_buffer(buf)],
        )
        batch = batch.append_column("pixels", pixels)
        batch = batch.append_column(
            "width", pa.array(np.full(nrow, O, dtype=np.int32))
        )
        return batch.append_column(
            "height", pa.array(np.full(nrow, O, dtype=np.int32))
        )


def resize_pipeline(ds, decode_size: int = 32, out_size: int = 8,
                    concurrency: int = 4, batch_size: int = 64):
    """media payloads -> resized pixel buffers (actor pool; small batches
    — a batch holds batch_size x decode_size^2 float32s mid-kernel)."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"decode_size": decode_size,
                               "out_size": out_size},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
