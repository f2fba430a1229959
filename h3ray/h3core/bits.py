"""Vectorized H3 index bit manipulation over uint64 NumPy arrays.

Index layout (public H3 spec): bit 63 reserved(0); bits 59-62 mode
(1=cell, 2=directed edge, 4=vertex); bits 56-58 mode-dependent (edge
direction / vertex number); bits 52-55 resolution; bits 45-51 base cell;
bits 0-44 fifteen 3-bit digits, digit for resolution r at bit offset
(15-r)*3, unused digits set to 7.

Mirrors the semantics of the reference's index accessors and validity
checks (h3ronpy/src/op/valid.rs:13-49, crates/h3arrow/src/array/cell.rs)
without any per-row Python.
"""

from __future__ import annotations

import numpy as np

from .constants import BASE_CELL_IS_PENTAGON, MAX_H3_RES, NUM_BASE_CELLS
from .ijk import INVALID_DIGIT, K_AXES_DIGIT, ROTATE60_CCW_DIGIT, ROTATE60_CW_DIGIT

H3_NULL = np.uint64(0)
MODE_CELL = 1
MODE_DIRECTEDEDGE = 2
MODE_VERTEX = 4

_U = np.uint64


def _u64(arr) -> np.ndarray:
    return np.asarray(arr, dtype=np.uint64)


def get_mode(h: np.ndarray) -> np.ndarray:
    return (_u64(h) >> _U(59)) & _U(0xF)


def get_high_bit(h: np.ndarray) -> np.ndarray:
    return _u64(h) >> _U(63)


def get_reserved(h: np.ndarray) -> np.ndarray:
    """Mode-dependent bits 56-58 (0 for cells; direction/vertex otherwise)."""
    return (_u64(h) >> _U(56)) & _U(0x7)


def get_resolution(h: np.ndarray) -> np.ndarray:
    return ((_u64(h) >> _U(52)) & _U(0xF)).astype(np.uint8)


def get_base_cell(h: np.ndarray) -> np.ndarray:
    return ((_u64(h) >> _U(45)) & _U(0x7F)).astype(np.int64)


def set_resolution(h: np.ndarray, res) -> np.ndarray:
    h = _u64(h)
    res = _u64(np.asarray(res, dtype=np.uint64))
    return (h & ~(_U(0xF) << _U(52))) | (res << _U(52))


def set_base_cell(h: np.ndarray, bc) -> np.ndarray:
    h = _u64(h)
    bc = _u64(np.asarray(bc, dtype=np.uint64))
    return (h & ~(_U(0x7F) << _U(45))) | (bc << _U(45))


def get_index_digit(h: np.ndarray, r) -> np.ndarray:
    """Digit for resolution r (1-based); r may be scalar or per-row array."""
    off = (_U(MAX_H3_RES) - _u64(np.asarray(r, dtype=np.uint64))) * _U(3)
    return ((_u64(h) >> off) & _U(0x7)).astype(np.uint8)


def set_index_digit(h: np.ndarray, r, digit) -> np.ndarray:
    off = (_U(MAX_H3_RES) - _u64(np.asarray(r, dtype=np.uint64))) * _U(3)
    d = _u64(np.asarray(digit, dtype=np.uint64))
    return (_u64(h) & ~(_U(0x7) << off)) | (d << off)


def init_cell(res: int, n: int) -> np.ndarray:
    """H3_INIT-equivalent: mode=cell, given res, all digits 7."""
    base = (_U(MODE_CELL) << _U(59)) | _U(0x1FFFFFFFFFFFF & ((1 << 45) - 1))
    h = np.full(n, base, dtype=np.uint64)
    return set_resolution(h, np.full(n, res, dtype=np.uint64))


def leading_nonzero_digit(h: np.ndarray) -> np.ndarray:
    """First nonzero digit (1..res); 0 if all digits are zero (CENTER)."""
    h = _u64(h)
    res = get_resolution(h).astype(np.int64)
    out = np.zeros(h.shape, dtype=np.uint8)
    found = np.zeros(h.shape, dtype=bool)
    for r in range(1, MAX_H3_RES + 1):
        active = (~found) & (r <= res)
        if not active.any():
            continue
        d = get_index_digit(h, r)
        hit = active & (d != 0)
        out[hit] = d[hit]
        found |= hit
    return out


def _rotate_digits(h: np.ndarray, table: np.ndarray, mask: np.ndarray | None = None) -> np.ndarray:
    """Apply a digit-mapping table to digits 1..res of each index."""
    h = _u64(h).copy()
    res = get_resolution(h).astype(np.int64)
    for r in range(1, MAX_H3_RES + 1):
        active = r <= res
        if mask is not None:
            active &= mask
        if not active.any():
            continue
        d = get_index_digit(h, r)
        nh = set_index_digit(h, r, table[d])
        h = np.where(active, nh, h)
    return h


# composed digit tables: applying n ccw rotations in one pass
_ROT_CCW_POW = [np.arange(8, dtype=np.uint64)]
for _ in range(5):
    _ROT_CCW_POW.append(ROTATE60_CCW_DIGIT[_ROT_CCW_POW[-1]])


def rotate60_ccw(h: np.ndarray) -> np.ndarray:
    return _rotate_digits(h, ROTATE60_CCW_DIGIT)


def rotate60_ccw_n(h: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Apply per-row multiples of the ccw rotation in one digit pass per
    distinct count (non-pentagon indexes only)."""
    h = _u64(h).copy()
    counts = np.asarray(counts) % 6
    for n in np.unique(counts):
        if n == 0:
            continue
        rows = np.nonzero(counts == n)[0]
        h[rows] = _rotate_digits(h[rows], _ROT_CCW_POW[int(n)])
    return h


def rotate60_cw(h: np.ndarray) -> np.ndarray:
    return _rotate_digits(h, ROTATE60_CW_DIGIT)


def rotate_pent60_ccw(h: np.ndarray) -> np.ndarray:
    """Pentagonal ccw rotation: rotate digits, skipping the deleted K axis.

    Port of the published algorithm: digits are rotated in order; when the
    first nonzero digit lands on K, the whole index is rotated a further
    60 degrees ccw.
    """
    h = _u64(h).copy()
    res = get_resolution(h).astype(np.int64)
    found = np.zeros(h.shape, dtype=bool)
    for r in range(1, MAX_H3_RES + 1):
        active = r <= res
        if not active.any():
            continue
        d = get_index_digit(h, r)
        h = np.where(active, set_index_digit(h, r, ROTATE60_CCW_DIGIT[d]), h)
        d2 = get_index_digit(h, r)
        first = active & (~found) & (d2 != 0)
        if first.any():
            found |= first
            fix = first & (d2 == K_AXES_DIGIT)
            if fix.any():
                h = np.where(fix, _rotate_digits(h, ROTATE60_CCW_DIGIT, fix), h)
    return h


def is_pentagon(h: np.ndarray) -> np.ndarray:
    h = _u64(h)
    bc = get_base_cell(h)
    ok = bc < NUM_BASE_CELLS
    pent = np.zeros(h.shape, dtype=bool)
    pent[ok] = BASE_CELL_IS_PENTAGON[bc[ok]]
    return pent & (leading_nonzero_digit(h) == 0)


def is_valid_cell(h: np.ndarray) -> np.ndarray:
    """Full validity check for cell indexes (mode, base cell, digits)."""
    h = _u64(h)
    res = get_resolution(h).astype(np.int64)
    bc = get_base_cell(h)
    valid = (
        (get_high_bit(h) == 0)
        & (get_mode(h) == MODE_CELL)
        & (get_reserved(h) == 0)
        & (bc < NUM_BASE_CELLS)
    )
    # digits 1..res must be < 7; digits res+1..15 must be == 7
    first_k = np.zeros(h.shape, dtype=np.uint8)  # leading nonzero digit
    for r in range(1, MAX_H3_RES + 1):
        d = get_index_digit(h, r)
        in_range = r <= res
        valid &= np.where(in_range, d != INVALID_DIGIT, d == INVALID_DIGIT)
        upd = in_range & (first_k == 0) & (d != 0)
        first_k = np.where(upd, d, first_k)
    # pentagon base cells may not contain a leading K digit
    bc_safe = np.clip(bc, 0, NUM_BASE_CELLS - 1)
    pent_base = BASE_CELL_IS_PENTAGON[bc_safe] & (bc < NUM_BASE_CELLS)
    valid &= ~(pent_base & (first_k == K_AXES_DIGIT))
    return valid


def is_valid_directededge(h: np.ndarray) -> np.ndarray:
    h = _u64(h)
    direction = get_reserved(h)
    cell = (h & ~(_U(0xF) << _U(59)) & ~(_U(0x7) << _U(56))) | (_U(MODE_CELL) << _U(59))
    ok = (
        (get_high_bit(h) == 0)
        & (get_mode(h) == MODE_DIRECTEDEDGE)
        & (direction >= 1)
        & (direction <= 6)
        & is_valid_cell(cell)
    )
    # pentagons have no edge in the deleted K direction
    ok &= ~(is_pentagon(cell) & (direction == K_AXES_DIGIT))
    return ok


def is_valid_vertex(h: np.ndarray) -> np.ndarray:
    h = _u64(h)
    vertex_num = get_reserved(h)
    cell = (h & ~(_U(0xF) << _U(59)) & ~(_U(0x7) << _U(56))) | (_U(MODE_CELL) << _U(59))
    ok = (
        (get_high_bit(h) == 0)
        & (get_mode(h) == MODE_VERTEX)
        & (vertex_num <= 5)
        & is_valid_cell(cell)
    )
    ok &= ~(is_pentagon(cell) & (vertex_num == 5))
    return ok


# --- hierarchy bit ops ------------------------------------------------------


def cell_to_parent(h: np.ndarray, parent_res) -> np.ndarray:
    """Parent (ancestor) at coarser resolution; caller checks res ordering."""
    h = _u64(h)
    pr = np.asarray(parent_res, dtype=np.uint64)
    pr_b = np.broadcast_to(pr, h.shape).astype(np.uint64)
    out = set_resolution(h, pr_b)
    # set digits below parent_res to 7
    n_unused = (_U(MAX_H3_RES) - pr_b) * _U(3)
    fill = (_U(1) << n_unused) - _U(1)
    return out | fill


def cell_to_center_child(h: np.ndarray, child_res) -> np.ndarray:
    h = _u64(h)
    res = get_resolution(h).astype(np.uint64)
    cr = np.broadcast_to(np.asarray(child_res, dtype=np.uint64), h.shape).astype(np.uint64)
    out = set_resolution(h, cr)
    # zero digits res+1..child_res
    hi = (_U(MAX_H3_RES) - res) * _U(3)
    lo = (_U(MAX_H3_RES) - cr) * _U(3)
    clear = ((_U(1) << hi) - _U(1)) ^ ((_U(1) << lo) - _U(1))
    return out & ~clear


def children_count(h: np.ndarray, child_res) -> np.ndarray:
    """Number of children at child_res (pentagon-adjusted)."""
    h = _u64(h)
    res = get_resolution(h).astype(np.int64)
    cr = np.broadcast_to(np.asarray(child_res, dtype=np.int64), h.shape)
    n = (cr - res).astype(np.int64)
    hexcount = 7 ** np.maximum(n, 0)
    pent = is_pentagon(h)
    # pentagon: 1 + 5 * (7^n - 1) / 6
    pentcount = 1 + 5 * (hexcount - 1) // 6
    return np.where(pent, pentcount, hexcount)


_POW7 = 7 ** np.arange(MAX_H3_RES + 1, dtype=np.int64)
_PENT7 = 1 + 5 * (_POW7 - 1) // 6  # pentagon-rooted subtree sizes


def cell_to_child_pos(h: np.ndarray, parent_res) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized H3 v4 ``cellToChildPos``: the rank of the cell among
    ALL descendants at its own resolution of its ancestor at
    ``parent_res``, in ``cellToChildren`` order (ascending digit,
    pentagon subtrees skip the deleted K digit).

    Published recurrence (h3lib/lib/h3Index.c, H3 v4 — reimplemented,
    not transcribed): walking levels parent_res+1..res with m levels
    remaining below each, a hexagon ancestor contributes digit * 7^m and
    a pentagon ancestor contributes 0 for digit 0 or
    pent(m) + (digit - 2) * 7^m for digits 2..6, where
    pent(m) = 1 + 5*(7^m - 1)/6 is the pentagon-rooted subtree size.

    Returns ``(pos int64, ok bool)``; ok is False where res < parent_res
    or the digit path is invalid (digit 7 in range, or a K digit under a
    pentagon ancestor).
    """
    h = _u64(h)
    res = get_resolution(h).astype(np.int64)
    pr = np.broadcast_to(np.asarray(parent_res, dtype=np.int64), h.shape)
    ok = (res >= pr) & (pr >= 0)
    anc = cell_to_parent(h, np.where(ok, pr, res).astype(np.int64))
    pent = is_pentagon(anc) & ok
    pos = np.zeros(h.shape, dtype=np.int64)
    for r in range(1, MAX_H3_RES + 1):
        active = ok & (pr < r) & (res >= r)
        if not active.any():
            continue
        d = get_index_digit(h, r).astype(np.int64)
        m = np.clip(res - r, 0, MAX_H3_RES)
        hexm = _POW7[m]
        bad = active & ((d > 6) | (pent & (d == K_AXES_DIGIT)))
        ok = ok & ~bad
        act = active & ~bad
        on_pent = act & pent
        desc = on_pent & (d >= 2)
        pos = np.where(desc, pos + _PENT7[m] + (d - 2) * hexm, pos)
        pos = np.where(act & ~pent, pos + d * hexm, pos)
        pent = pent & ~desc  # digit 0 stays on the pentagon path
    return np.where(ok, pos, 0), ok


def child_pos_to_cell(
    parent: np.ndarray, pos: np.ndarray, child_res
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized H3 v4 ``childPosToCell``: inverse of
    :func:`cell_to_child_pos` — the ``pos``-th descendant of ``parent``
    at ``child_res`` in ``cellToChildren`` order.  Returns
    ``(cell, ok)``; ok is False where child_res < parent res or pos is
    outside [0, children_count).
    """
    parent = _u64(parent)
    pos = np.asarray(pos, dtype=np.int64)
    pres = get_resolution(parent).astype(np.int64)
    cr = int(child_res)
    if not 0 <= cr <= MAX_H3_RES:
        # C childPosToCell: E_RES_DOMAIN — never ok=True garbage cells
        return parent.copy(), np.zeros(parent.shape, dtype=bool)
    ok = (pres <= cr) & (pos >= 0) & (pos < children_count(parent, cr))
    h = cell_to_center_child(parent, np.where(ok, cr, pres).astype(np.int64))
    rem = np.where(ok, pos, 0)
    pent = is_pentagon(parent) & ok
    for r in range(1, cr + 1):
        active = ok & (pres < r)
        if not active.any():
            continue
        m = cr - r
        hexm = int(_POW7[m])
        pentm = int(_PENT7[m])
        on_pent = active & pent
        desc = on_pent & (rem >= pentm)
        d = np.zeros(parent.shape, dtype=np.int64)
        d = np.where(desc, 2 + (rem - pentm) // hexm, d)
        rem = np.where(desc, (rem - pentm) % hexm, rem)
        plain = active & ~pent
        d = np.where(plain, rem // hexm, d)
        rem = np.where(plain, rem % hexm, rem)
        pent = pent & ~desc
        h = np.where(active, set_index_digit(h, r, d.astype(np.uint64)), h)
    return h, ok


# --- string conversion ------------------------------------------------------

_HEX_DIGITS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def to_hex_strings(h: np.ndarray) -> np.ndarray:
    """uint64 -> lowercase hex strings without leading zeros (H3 format).

    Valid indexes always have their top nibble zero (bit 63 clear, modes
    1/2/4 in bits 59-62), so the fast path emits fixed 15-char strings in
    one vectorized pass; other values fall back to per-row formatting."""
    h = _u64(h)
    n = h.shape[0]
    # every valid index (any mode) has its mode bits >= bit 59 set, so
    # h >> 56 != 0 guarantees 15 or 16 hex digits: cells (mode 1) have a
    # zero top nibble -> 15 digits, vertexes/edges (modes 4/2) -> 16.
    # Emit 16 fixed digits vectorized, strip the leading zero where needed.
    if n and (h >> _U(56) != 0).all():
        chars = np.empty((n, 16), dtype=np.uint8)
        for k in range(16):
            chars[:, k] = _HEX_DIGITS[
                ((h >> _U(4 * (15 - k))) & _U(0xF)).astype(np.uint8)
            ]
        lead0 = (h >> _U(60)) == 0
        flat = chars.tobytes().decode("ascii")
        return np.array(
            [
                flat[i * 16 + (1 if lead0[i] else 0) : (i + 1) * 16]
                for i in range(n)
            ],
            dtype=object,
        )
    return np.array([format(int(x), "x") for x in h], dtype=object)


_HEX_LUT = np.full(256, 255, dtype=np.uint8)
for _c in b"0123456789":
    _HEX_LUT[_c] = _c - ord("0")
for _c in b"abcdef":
    _HEX_LUT[_c] = _c - ord("a") + 10
for _c in b"ABCDEF":
    _HEX_LUT[_c] = _c - ord("A") + 10


def parse_hex_u64(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Jagged hex parse: segment i is the byte range data[offsets[i]:offsets[i+1]].
    Returns (values u64, ok mask).  ok requires 1..16 hex digits (callers
    left-strip zeros / route odd forms to the scalar fallback).  Vectorized
    position loop over the longest segment (<=16 iterations)."""
    starts = offsets[:-1].astype(np.int64)
    lens = np.diff(offsets).astype(np.int64)
    n = len(lens)
    vals = np.zeros(n, dtype=np.uint64)
    ok = (lens >= 1) & (lens <= 16)
    if not ok.any():
        return vals, ok
    digits_ok = np.ones(n, dtype=bool)
    with np.errstate(over="ignore"):
        maxlen = int(lens[ok].max())
        for j in range(maxlen):
            act = ok & (lens > j)
            d = _HEX_LUT[data[starts[act] + j]]
            bad = d == 255
            if bad.any():
                ai = np.nonzero(act)[0]
                digits_ok[ai[bad]] = False
            vals[act] = vals[act] * np.uint64(16) + d.astype(np.uint64)
    ok &= digits_ok
    vals[~ok] = 0
    return vals, ok


def parse_hex_strings(strings) -> tuple[np.ndarray, np.ndarray]:
    """Hex (or decimal) strings -> uint64; returns (values, ok_mask)."""
    out = np.zeros(len(strings), dtype=np.uint64)
    ok = np.zeros(len(strings), dtype=bool)
    for idx, s in enumerate(strings):
        if s is None:
            continue
        s = s.strip()
        try:
            out[idx] = np.uint64(int(s, 16))
            ok[idx] = True
            continue
        except (ValueError, OverflowError):
            pass
        try:
            out[idx] = np.uint64(int(s, 10))
            ok[idx] = True
        except (ValueError, OverflowError):
            pass
    return out, ok
