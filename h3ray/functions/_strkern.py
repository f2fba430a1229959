"""Jagged string kernels: flat-UTF8-buffer + offsets processing for Arrow
string columns.

Every text/dedup operator in this package works on the zero-copy
(data_bytes, offsets) view of a string column and loops over *byte
positions* (bounded by the longest string), never over rows — each
iteration is a vector op across all still-active rows, so total work is
O(total_bytes) with no per-row Python in the hot path.  This is the
vectorization contract CLAUDE.md requires for 100 TB-scale text stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)

# numpy unsigned arithmetic wraps mod 2^64 silently, which is exactly the
# FNV-1a semantics; keep errstate quiet for the few platforms that warn.
_WRAP = np.errstate(over="ignore")


def utf8_view(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data: u8[total_bytes], offsets: i64[n+1]) view of a
    string / large_string / binary column.  Nulls become empty strings."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, b"" if pa.types.is_binary(col.type) else "")
    arr = col.cast(pa.large_binary())
    bufs = arr.buffers()
    off = np.frombuffer(
        bufs[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8
    )
    if bufs[2] is None:
        return np.zeros(0, dtype=np.uint8), np.zeros(len(arr) + 1, dtype=np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(off[-1]))
    if off[0] != 0:  # sliced array: renormalize offsets to the view
        data = data[int(off[0]) :]
        off = off - off[0]
    return data, off


FNV_BLOCK_CAP = 1 << 16  # 64 KiB: outlier segments switch to the blocked scheme


def fnv1a_segments(
    data: np.ndarray, offsets: np.ndarray, cap: int = FNV_BLOCK_CAP
) -> np.ndarray:
    """FNV-1a 64-bit hash of each segment ``data[offsets[i]:offsets[i+1]]``.

    Byte-position loop, vectorized across segments: rows are processed
    longest-first so each iteration touches a shrinking *prefix* (no
    boolean-mask overhead on skewed lengths).

    Skew cap: the byte loop runs at most ``cap`` iterations regardless of
    the longest segment.  A segment longer than ``cap`` bytes would
    otherwise serialize the kernel (one 100 MB outlier document = 10^8
    near-scalar iterations), so outliers hash through a deterministic
    blocked scheme instead: the segment is split into ``cap``-byte lanes,
    each lane FNV-1a-hashed vectorized (all lanes in parallel), and the
    lane hashes plus the true byte length are FNV-1a-combined.  The result
    is content-sensitive to every byte and stable across runs/cluster
    sizes; it differs from plain FNV-1a only for > ``cap`` segments
    (documented divergence — dedup/grouping semantics are unaffected)."""
    starts = offsets[:-1].astype(np.int64)
    lens = np.diff(offsets).astype(np.int64)
    n = len(lens)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    if n == 0 or lens.max(initial=0) == 0:
        return h
    big = lens > cap
    if big.any():
        bidx = np.nonzero(big)[0]
        blens = lens[bidx]
        nb = -(-blens // cap)  # lanes per outlier
        lane_of_seg = np.repeat(np.arange(len(bidx)), nb)
        lane_seq = np.arange(len(lane_of_seg)) - np.repeat(
            np.cumsum(nb) - nb, nb
        )
        lane_start = starts[bidx][lane_of_seg] + lane_seq * cap
        lane_stop = np.minimum(lane_start + cap, starts[bidx][lane_of_seg] + blens[lane_of_seg])
        lane_data, lane_off = gather_segments(data, lane_start, lane_stop)
        lane_h = fnv1a_segments(lane_data, lane_off, cap)
        # combine: per outlier, FNV-1a over (lane hashes || length) as bytes
        comb = np.empty(len(lane_h) + len(bidx), dtype=np.uint64)
        comb_off = np.zeros(len(bidx) + 1, dtype=np.int64)
        np.cumsum(nb + 1, out=comb_off[1:])
        pos = np.arange(len(lane_h)) + lane_of_seg  # shift for the length slot
        comb[pos] = lane_h
        comb[comb_off[1:] - 1] = blens.astype(np.uint64)
        cbytes = comb.astype("<u8").view(np.uint8)
        h[bidx] = fnv1a_segments(cbytes, comb_off * 8, cap)
        if big.all():
            return h
        # hash the normal segments below with the outliers masked out
        starts = starts[~big]
        lens = lens[~big]
        small_idx = np.nonzero(~big)[0]
    else:
        small_idx = None
    m = len(lens)
    order = np.argsort(-lens, kind="stable")
    s_s, l_s = starts[order], lens[order]
    hs = np.full(m, FNV_OFFSET, dtype=np.uint64)
    maxlen = int(l_s[0]) if m else 0
    with _WRAP:
        for j in range(maxlen):
            na = int(np.searchsorted(-l_s, -(j + 1), side="right"))
            if na == 0:
                break
            hs[:na] = (hs[:na] ^ data[s_s[:na] + j]) * FNV_PRIME
    out_small = np.empty(m, dtype=np.uint64)
    out_small[order] = hs
    if small_idx is None:
        return out_small
    h[small_idx] = out_small
    return h


def window_valid(off: np.ndarray, window: int, short: np.ndarray):
    """Validity of the ``total-window+1`` flat sliding windows over jagged
    segments: a window is valid iff it lies fully inside one segment and
    its segment is not in ``short``.  Invalid windows are marked by
    boundary scatters (window-1 small scatters — no O(total) gather).
    Returns (valid mask over flat windows, per-segment valid counts, m)."""
    off = np.asarray(off, dtype=np.int64)
    lens = np.diff(off)
    total = int(off[-1])
    m = max(total - window + 1, 0)
    valid = np.ones(m, dtype=bool)
    for k in range(1, window):
        edge = off[1:] - k
        edge = edge[(edge >= 0) & (edge < m)]
        valid[edge] = False
    if short.any():
        sidx = np.nonzero(short)[0]
        s_lens = lens[sidx]
        spos = np.repeat(off[:-1][sidx], s_lens) + (
            np.arange(int(s_lens.sum()))
            - np.repeat(np.cumsum(s_lens) - s_lens, s_lens)
        )
        spos = spos[spos < m]
        valid[spos] = False
    wcounts = np.maximum(lens - (window - 1), 0)
    wcounts[short] = 0
    return valid, wcounts, m


def gather_segments(
    data: np.ndarray, starts: np.ndarray, stops: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather jagged byte ranges [starts[i], stops[i]) of ``data`` into one
    contiguous buffer; returns (new_data, new_offsets i64[n+1])."""
    lens = (stops - starts).astype(np.int64)
    out_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    if total == 0:
        return np.zeros(0, dtype=np.uint8), out_off
    pos = (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_off[:-1], lens)
        + np.repeat(starts.astype(np.int64), lens)
    )
    return data[pos], out_off


def utf8_from_segments(
    data: np.ndarray, starts: np.ndarray, stops: np.ndarray
) -> pa.Array:
    """Build a string Array whose i-th value is data[starts[i]:stops[i)]."""
    new_data, off = gather_segments(data, starts, stops)
    arr = pa.Array.from_buffers(
        pa.large_utf8(),
        len(starts),
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(new_data.tobytes())],
    )
    return arr.cast(pa.utf8())


def segment_sums(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum of ``values`` within each segment (empty segments -> 0).
    values may be 1-D or 2-D (rows summed); prefix-sum based so it is one
    cumsum pass regardless of segment count."""
    acc_dtype = np.int64 if values.dtype.kind in "bui" else np.float64
    cs = np.concatenate(
        [np.zeros((1,) + values.shape[1:], dtype=acc_dtype),
         np.cumsum(values, axis=0, dtype=acc_dtype)]
    )
    return cs[offsets[1:]] - cs[offsets[:-1]]


def segment_min_u64(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment min of u64 values; empty segments -> u64 max."""
    starts = offsets[:-1]
    lens = np.diff(offsets)
    out = np.full(len(lens), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = lens > 0
    if nonempty.any():
        mins = np.minimum.reduceat(values, starts[nonempty])
        out[nonempty] = mins
    return out


def split_tokens(text):
    """Whitespace tokens per row as a list<string> array, matching Python's
    str.split(): trim first (Arrow keeps leading/trailing empties), then
    split; fully-empty rows yield one '' token the callers mask out."""
    return pc.utf8_split_whitespace(
        pc.utf8_trim_whitespace(pc.fill_null(text, ""))
    )


def list_offsets(arr) -> np.ndarray:
    """int64 offsets of a (large_)list array (chunk-combined, slice-safe)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return off - off[0] if off[0] != 0 else off


# --- exact Python character classes, vectorized ------------------------------

_ASCII = np.arange(128)
_ASCII_ALPHA = np.array([chr(c).isalpha() for c in _ASCII])
_ASCII_SPACE = np.array([chr(c).isspace() for c in _ASCII])
_ASCII_ALNUM = np.array([chr(c).isalnum() for c in _ASCII])


def char_classes(u32: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(isalpha, isspace, isalnum) per codepoint, exactly matching Python's
    str methods.  ASCII via a 128-entry table; rare non-ASCII codepoints are
    classified once per *unique* codepoint (bounded loop), then scattered."""
    alpha = np.zeros(len(u32), dtype=bool)
    space = np.zeros(len(u32), dtype=bool)
    alnum = np.zeros(len(u32), dtype=bool)
    asc = u32 < 128
    av = u32[asc]
    alpha[asc] = _ASCII_ALPHA[av]
    space[asc] = _ASCII_SPACE[av]
    alnum[asc] = _ASCII_ALNUM[av]
    rest = ~asc
    if rest.any():
        uniq = np.unique(u32[rest])
        ua = np.array([chr(int(c)).isalpha() for c in uniq])
        us = np.array([chr(int(c)).isspace() for c in uniq])
        un = np.array([chr(int(c)).isalnum() for c in uniq])
        idx = np.searchsorted(uniq, u32[rest])
        alpha[rest] = ua[idx]
        space[rest] = us[idx]
        alnum[rest] = un[idx]
    return alpha, space, alnum


def codepoints(col) -> tuple[np.ndarray, np.ndarray]:
    """(codepoints u32[total_chars], char_offsets i64[n+1]) of a string
    column: one UTF-8 decode + one UTF-32 encode over the whole batch."""
    data, off = utf8_view(col)
    s = data.tobytes().decode("utf-8")
    u32 = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    charlens = pc.utf8_length(pc.fill_null(col, "")).to_numpy(zero_copy_only=False)
    char_off = np.zeros(len(charlens) + 1, dtype=np.int64)
    np.cumsum(charlens, out=char_off[1:])
    return u32, char_off
