"""Local IJ coordinates relative to an anchor cell (vectorized).

Port of the published cellToLocalIj / localIjToCell pair for same-base-cell
and hexagon-neighbor-base-cell anchors.  Moves that involve pentagon
distortion (origin or index on a pentagon base cell while crossing base
cells) are *masked as failing* rather than resolved — the reference exposes
the same escape hatch via ``set_failing_to_invalid``
(h3ronpy/python/h3ronpy/__init__.py:243-283); our coverage is the hexagon
fast path plus same-base-cell pentagons.

Output schema mirrors the reference: {i: int32, j: int32, anchor: uint64}
(h3ronpy/src/op/localij.rs:36-40).
"""

from __future__ import annotations

import numpy as np

from . import bits, ijk
from .constants import BASE_CELL_IS_PENTAGON, MAX_H3_RES
from .faceijk import is_class_iii
from .traversal import BASE_CELL_NEIGHBOR_ROTS, BASE_CELL_NEIGHBORS, INVALID_BASE_CELL


def _base_cell_direction(from_bc: np.ndarray, to_bc: np.ndarray) -> np.ndarray:
    """Direction digit from one base cell to a neighboring one (7 if not
    adjacent)."""
    out = np.full(len(from_bc), 7, dtype=np.int64)
    for d in range(7):
        hit = (BASE_CELL_NEIGHBORS[from_bc, d] == to_bc) & (out == 7)
        out[hit] = d
    return out


def _digits_to_base_ijk(h: np.ndarray) -> np.ndarray:
    """Apply a cell's digits starting from coord (0,0,0): coordinates in the
    base cell's own IJK space (the _h3ToFaceIjkWithInitializedFijk loop)."""
    h = np.asarray(h, dtype=np.uint64)
    res = bits.get_resolution(h).astype(np.int64)
    coord = np.zeros((len(h), 3), dtype=np.int64)
    for r in range(1, MAX_H3_RES + 1):
        active = r <= res
        if not active.any():
            break
        stepped = ijk.down_ap7(coord) if is_class_iii(r) else ijk.down_ap7r(coord)
        d = bits.get_index_digit(h, r).astype(np.int64)
        d = np.where(active, d, 0)
        stepped = ijk.neighbor(stepped, d)
        coord = np.where(active[:, None], stepped, coord)
    return coord


def _scaled_offset(direction: np.ndarray, res: int) -> np.ndarray:
    """unit(direction) scaled down to ``res`` (the offset of a neighboring
    base cell's origin in local ijk space)."""
    off = ijk.UNIT_VECS[direction].copy()
    for r in range(res - 1, -1, -1):
        off = ijk.down_ap7(off) if is_class_iii(r + 1) else ijk.down_ap7r(off)
    return off


def cells_to_localij(cells: np.ndarray, anchors: np.ndarray):
    """Per-row local (i, j) of ``cells`` relative to ``anchors``.

    Returns (i, j, ok_mask); failing rows (res mismatch, non-adjacent base
    cells, pentagon-crossing distortion) have ok=False.
    """
    cells = np.asarray(cells, dtype=np.uint64)
    anchors = np.broadcast_to(np.asarray(anchors, dtype=np.uint64), cells.shape).copy()
    n = len(cells)
    ok = np.ones(n, dtype=bool)
    res_a = bits.get_resolution(anchors).astype(np.int64)
    res_c = bits.get_resolution(cells).astype(np.int64)
    ok &= res_a == res_c
    bc_a = bits.get_base_cell(anchors)
    bc_c = bits.get_base_cell(cells)
    same = bc_a == bc_c
    pent_a = BASE_CELL_IS_PENTAGON[bc_a.clip(0, 121)]
    pent_c = BASE_CELL_IS_PENTAGON[bc_c.clip(0, 121)]
    # pentagon distortion across base cells is out of scope -> fail
    ok &= same | (~pent_a & ~pent_c)

    h = cells.copy()
    coord = np.zeros((n, 3), dtype=np.int64)
    out_i = np.zeros(n, dtype=np.int64)
    out_j = np.zeros(n, dtype=np.int64)

    crossing = ok & ~same
    if crossing.any():
        direction = _base_cell_direction(bc_a, bc_c)
        ok &= same | (direction != 7)
        crossing = ok & ~same
        rot = BASE_CELL_NEIGHBOR_ROTS[bc_a, direction.clip(0, 6)]
        hh = h.copy()
        for k in range(1, 6):
            m = crossing & (rot >= k)
            if m.any():
                hh = np.where(m, bits.rotate60_ccw(hh), hh)
        h = np.where(crossing, hh, h)

    # group by resolution to keep the digit loop uniform
    for r in np.unique(res_c):
        m = res_c == r
        coord[m] = _digits_to_base_ijk(h[m])
        cm = m & ok & ~same
        if cm.any():
            for d in range(1, 7):
                dm = cm & (_base_cell_direction(bc_a, bc_c) == d)
                if dm.any():
                    off = _scaled_offset(np.array([d]), int(r))[0]
                    coord[dm] = ijk.normalize(coord[dm] + off)

    out_i = coord[:, 0] - coord[:, 2]
    out_j = coord[:, 1] - coord[:, 2]
    return out_i.astype(np.int32), out_j.astype(np.int32), ok


def localij_to_cells(anchors: np.ndarray, i: np.ndarray, j: np.ndarray):
    """Inverse: local (i, j) relative to anchors -> cells.

    Returns (cells, ok_mask)."""
    anchors = np.asarray(anchors, dtype=np.uint64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = len(anchors)
    res_arr = bits.get_resolution(anchors).astype(np.int64)
    ok = np.ones(n, dtype=bool)
    out = np.zeros(n, dtype=np.uint64)
    bc_a = bits.get_base_cell(anchors)
    pent_a = BASE_CELL_IS_PENTAGON[bc_a.clip(0, 121)]

    coord = np.stack([i, j, np.zeros_like(i)], axis=1)
    coord = ijk.normalize(coord)

    for r in np.unique(res_arr):
        m = res_arr == r
        res = int(r)
        c = coord[m].copy()
        nm = int(m.sum())
        h = bits.init_cell(res, nm)
        # digit aggregation exactly as faceijk_to_cell
        for rr in range(res - 1, -1, -1):
            last = c
            if is_class_iii(rr + 1):
                c = ijk.up_ap7(c)
                center = ijk.down_ap7(c)
            else:
                c = ijk.up_ap7r(c)
                center = ijk.down_ap7r(c)
            diff = ijk.normalize(last - center)
            h = bits.set_index_digit(h, rr + 1, ijk.unit_ijk_to_digit(diff))
        # c is now the base-cell-level coordinate
        is_center = (c == 0).all(axis=1)
        digit = ijk.unit_ijk_to_digit(c)
        okm = is_center | (digit != ijk.INVALID_DIGIT)
        bca = bc_a[m]
        penta = pent_a[m]
        okm &= is_center | ~penta  # pentagon-crossing out of scope
        nb = np.where(
            is_center, bca, BASE_CELL_NEIGHBORS[bca, digit.clip(0, 6).astype(np.int64)]
        )
        okm &= nb != INVALID_BASE_CELL
        nb_pent = BASE_CELL_IS_PENTAGON[nb.clip(0, 121)]
        okm &= is_center | ~nb_pent
        rot = np.where(
            is_center, 0, BASE_CELL_NEIGHBOR_ROTS[bca, digit.clip(0, 6).astype(np.int64)]
        )
        for k in range(1, 6):
            rm = (rot >= k) & okm
            if rm.any():
                h = np.where(rm, bits.rotate60_cw(h), h)
        h = bits.set_base_cell(h, nb.clip(0, 121).astype(np.uint64))
        rows = np.nonzero(m)[0]
        out[rows] = h
        ok[rows] &= okm
    ok &= bits.is_valid_cell(out)
    return out, ok
