"""Local IJ coordinates relative to an anchor cell (vectorized).

Implements the cellToLocalIj / localIjToCell pair including pentagon
base-cell handling (the reference reaches the same operator through h3o:
crates/h3arrow/src/algorithm/localij.rs:94-144; pinned there by
h3ronpy/tests/arrow/test_localij.py roundtrips).

Structure mirrors the published H3 algorithm: hexagon crossings unfold a
neighbor base cell via the neighbor-rotation table; pentagon crossings need
per-(sector, direction) corrections for the deleted K wedge.  Those
corrections — `_PENT_A_U` / `_PENT_A_T` (origin on a pentagon: orientation
and offset-position rotation per (polar-class, origin leading digit, dir))
and `_PENT_C_W` (same-pentagon sector-to-sector rotation) — are derived in
tools/derive_localij_tables.py from an isometry requirement: the unfolded
coordinates must reproduce exact BFS grid distances for every seam-local
cell pair, which pins each rigid motion uniquely.  Entries -1 mark folds
with no consistent unfolding (the ambiguous wedge side); those rows fail,
mirroring the reference's FAILED_DIRECTIONS escape hatch.  The
index-on-pentagon case needs no separate table: it is the exact rigid
inverse of the origin-on-pentagon unfold (reciprocity), so both directions
stay mutually consistent by construction.

The inverse direction resolves pentagon-involved anchors by candidate
enumeration + forward verification: a cell is returned only if the forward
map sends it back to the queried (i, j), making roundtrips exact by
construction.

Output schema mirrors the reference: {i: int32, j: int32, anchor: uint64}
(h3ronpy/src/op/localij.rs:36-40).
"""

from __future__ import annotations

import numpy as np

from . import bits, ijk
from .constants import BASE_CELL_IS_PENTAGON, MAX_H3_RES, NUM_BASE_CELLS
from .faceijk import is_class_iii
from .traversal import BASE_CELL_NEIGHBOR_ROTS, BASE_CELL_NEIGHBORS, INVALID_BASE_CELL

# polar pentagons have a different neighbor orientation pattern
BASE_CELL_IS_POLAR_PENT = np.zeros(NUM_BASE_CELLS + 1, dtype=bool)
BASE_CELL_IS_POLAR_PENT[[4, 117]] = True

# a base cell that is a pentagon or touches one needs the slow inverse path
_PENT_ADJACENT = BASE_CELL_IS_PENTAGON.copy()
for _d in range(1, 7):
    _nb = BASE_CELL_NEIGHBORS[:, _d]
    _ok = (_nb >= 0) & (_nb < NUM_BASE_CELLS)
    _PENT_ADJACENT[_ok] |= BASE_CELL_IS_PENTAGON[_nb[_ok]]

# --- pentagon unfold tables (derived; see tools/derive_localij_tables.py) ---
# index [polar][leading_digit][dir]; -1 = no consistent unfold (fail row)
_PENT_A_U = np.array([
    [  # non-polar
        [-1, -1, 0, 0, 2, 1, 0],
        [-1, -1, -1, -1, -1, -1, -1],
        [-1, -1, 0, 0, -1, 1, 0],
        [-1, -1, 0, 0, 1, 1, -1],
        [-1, -1, 0, -1, 2, 2, 0],
        [-1, -1, -1, 1, 2, 2, 0],
        [-1, -1, 0, 0, 2, -1, 0],
    ],
    [  # polar
        [-1, -1, 4, 0, 0, 3, 2],
        [-1, -1, -1, -1, -1, -1, -1],
        [-1, -1, 4, 0, -1, 3, 2],
        [-1, -1, 4, 0, 5, 3, -1],
        [-1, -1, 4, -1, 0, 4, 2],
        [-1, -1, -1, 1, 0, 4, 2],
        [-1, -1, 4, 0, 0, -1, 2],
    ],
], dtype=np.int8)
_PENT_A_T = np.array([
    [  # non-polar
        [-1, -1, 0, 0, 0, 5, 0],
        [-1, -1, -1, -1, -1, -1, -1],
        [-1, -1, 0, 0, -1, 5, 0],
        [-1, -1, 0, 0, 5, 5, -1],
        [-1, -1, 0, -1, 0, 0, 0],
        [-1, -1, -1, 1, 0, 0, 0],
        [-1, -1, 0, 0, 0, -1, 0],
    ],
    [  # polar
        [-1, -1, 0, 0, 0, 5, 0],
        [-1, -1, -1, -1, -1, -1, -1],
        [-1, -1, 0, 0, -1, 5, 0],
        [-1, -1, 0, 0, 5, 5, -1],
        [-1, -1, 0, -1, 0, 0, 0],
        [-1, -1, -1, 1, 0, 0, 0],
        [-1, -1, 0, 0, 0, -1, 0],
    ],
], dtype=np.int8)
# same-pentagon sector-to-sector rotation [origin_leading][index_leading]
_PENT_C_W = np.array([
    [0, 0, 0, 0, 0, 0, 0],
    [0, -1, -1, -1, -1, -1, -1],
    [0, -1, 0, 0, 0, 5, 0],
    [0, -1, 0, 0, 5, 5, 0],
    [0, -1, 0, 1, 0, 0, 0],
    [0, -1, 1, 1, 0, 0, 0],
    [0, -1, 0, 0, 0, 0, 0],
], dtype=np.int8)


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


def _ijk_to_digits(coord: np.ndarray, res: int):
    """Aggregate res-level ijk coords to base level: returns (h with digits
    set, base-level coord).  The faceijk_to_cell digit loop, shared by the
    inverse paths."""
    c = coord.copy()
    h = bits.init_cell(res, len(c))
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
    return h, c


def _rot_coord(coord: np.ndarray, n) -> np.ndarray:
    """Rotate rows ccw by n*60deg (n scalar or per-row, negatives ok)."""
    n = np.asarray(n, dtype=np.int64) % 6
    if n.ndim == 0:
        n = np.full(len(coord), int(n), dtype=np.int64)
    return ijk.rotate60_ccw_n(coord, n)


def cells_to_localij(cells: np.ndarray, anchors: np.ndarray):
    """Per-row local (i, j) of ``cells`` relative to ``anchors``.

    Returns (i, j, ok_mask); failing rows (res mismatch, non-adjacent base
    cells, ambiguous pentagon folds) have ok=False."""
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

    direction = _base_cell_direction(bc_a, bc_c)
    ok &= same | (direction != 7)

    coord = np.zeros((n, 3), dtype=np.int64)

    # --- same base cell -----------------------------------------------------
    m_same = ok & same
    if m_same.any():
        for r in np.unique(res_c[m_same]):
            m = m_same & (res_c == r)
            coord[m] = _digits_to_base_ijk(cells[m])
        # pentagon sector-to-sector correction (case C)
        mp = m_same & pent_a
        if mp.any():
            Lo = bits.leading_nonzero_digit(anchors[mp]).astype(np.int64)
            Li = bits.leading_nonzero_digit(cells[mp]).astype(np.int64)
            w = _PENT_C_W[Lo, Li].astype(np.int64)
            bad = w < 0
            coord[mp] = _rot_coord(coord[mp], np.where(bad, 0, w))
            if bad.any():
                idx = np.nonzero(mp)[0]
                ok[idx[bad]] = False

    # --- hexagon-to-hexagon crossing (fast path, unchanged semantics) ------
    m_hex = ok & ~same & ~pent_a & ~pent_c
    if m_hex.any():
        rot = BASE_CELL_NEIGHBOR_ROTS[bc_a, direction.clip(0, 6)]
        hh = cells.copy()
        for k in range(1, 6):
            m = m_hex & (rot >= k)
            if m.any():
                hh = np.where(m, bits.rotate60_ccw(hh), hh)
        for r in np.unique(res_c[m_hex]):
            m = m_hex & (res_c == r)
            if not m.any():
                continue
            base = _digits_to_base_ijk(hh[m])
            for d in range(1, 7):
                dm = direction[m] == d
                if dm.any():
                    off = _scaled_offset(np.array([d]), int(r))[0]
                    base[dm] = ijk.normalize(base[dm] + off)
            coord[m] = base

    # --- origin on a pentagon (case A) --------------------------------------
    m_pa = ok & ~same & pent_a
    if m_pa.any():
        polar = BASE_CELL_IS_POLAR_PENT[bc_a.clip(0, NUM_BASE_CELLS)].astype(np.int64)
        L = bits.leading_nonzero_digit(anchors).astype(np.int64)
        u = _PENT_A_U[polar, L, direction.clip(0, 6)].astype(np.int64)
        t = _PENT_A_T[polar, L, direction.clip(0, 6)].astype(np.int64)
        bad = m_pa & (u < 0)
        ok &= ~bad
        m_pa = ok & ~same & pent_a
        if m_pa.any():
            rot = BASE_CELL_NEIGHBOR_ROTS[bc_a, direction.clip(0, 6)]
            hh = cells.copy()
            for k in range(1, 6):
                m = m_pa & (rot >= k)
                if m.any():
                    hh = np.where(m, bits.rotate60_ccw(hh), hh)
            for r in np.unique(res_c[m_pa]):
                m = m_pa & (res_c == r)
                if not m.any():
                    continue
                base = _rot_coord(_digits_to_base_ijk(hh[m]), u[m])
                for d in range(1, 7):
                    dm = direction[m] == d
                    if dm.any():
                        off = _scaled_offset(np.array([d]), int(r))[None, 0]
                        offr = _rot_coord(np.repeat(off, int(dm.sum()), axis=0), t[m][dm])
                        base[dm] = ijk.normalize(base[dm] + offr)
                coord[m] = base

    # --- index on a pentagon (case B: rigid inverse of case A) --------------
    m_pb = ok & ~same & pent_c & ~pent_a
    if m_pb.any():
        revd = _base_cell_direction(bc_c, bc_a)
        polar = BASE_CELL_IS_POLAR_PENT[bc_c.clip(0, NUM_BASE_CELLS)].astype(np.int64)
        Lx = bits.leading_nonzero_digit(cells).astype(np.int64)
        u = _PENT_A_U[polar, Lx, revd.clip(0, 6)].astype(np.int64)
        t = _PENT_A_T[polar, Lx, revd.clip(0, 6)].astype(np.int64)
        rots = BASE_CELL_NEIGHBOR_ROTS[bc_c.clip(0, 121), revd.clip(0, 6)].astype(np.int64)
        bad = m_pb & ((u < 0) | (revd == 7))
        ok &= ~bad
        m_pb = ok & ~same & pent_c & ~pent_a
        for r in np.unique(res_c[m_pb]):
            m = m_pb & (res_c == r)
            if not m.any():
                continue
            cx = _digits_to_base_ijk(cells[m])
            for d in range(1, 7):
                dm = revd[m] == d
                if dm.any():
                    off = _scaled_offset(np.array([d]), int(r))[None, 0]
                    offr = _rot_coord(np.repeat(off, int(dm.sum()), axis=0), t[m][dm])
                    cx[dm] = ijk.normalize(cx[dm] - offr)
            coord[m] = _rot_coord(cx, -(u[m] + rots[m]))

    out_i = coord[:, 0] - coord[:, 2]
    out_j = coord[:, 1] - coord[:, 2]
    return out_i.astype(np.int32), out_j.astype(np.int32), ok


def _hex_inverse(anchors, coord, res_arr, ok):
    """Original hexagon-anchor inverse (digit aggregation + neighbor fix-up).
    Used for anchors with no pentagon involvement."""
    n = len(anchors)
    out = np.zeros(n, dtype=np.uint64)
    bc_a = bits.get_base_cell(anchors)
    for r in np.unique(res_arr):
        m = res_arr == r
        res = int(r)
        h, c = _ijk_to_digits(coord[m], res)
        is_center = (c == 0).all(axis=1)
        digit = ijk.unit_ijk_to_digit(c)
        okm = is_center | (digit != ijk.INVALID_DIGIT)
        bca = bc_a[m]
        nb = np.where(
            is_center, bca, BASE_CELL_NEIGHBORS[bca, digit.clip(0, 6).astype(np.int64)]
        )
        okm &= nb != INVALID_BASE_CELL
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
    return out, ok


def _pent_inverse(anchors, coord, res_arr):
    """Inverse for pentagon-involved anchors: enumerate the bounded
    candidate set (same-bc sector rotations, hexagon neighbors, pentagon
    neighbors via the reciprocity algebra), then keep only candidates the
    FORWARD map verifies — roundtrip-exact by construction."""
    n = len(anchors)
    out = np.zeros(n, dtype=np.uint64)
    found = np.zeros(n, dtype=bool)
    bc_a = bits.get_base_cell(anchors)
    pent_a = BASE_CELL_IS_PENTAGON[bc_a.clip(0, 121)]
    qi = coord[:, 0] - coord[:, 2]
    qj = coord[:, 1] - coord[:, 2]

    def try_candidates(cand):
        nonlocal out, found
        pending = ~found & bits.is_valid_cell(cand)
        if not pending.any():
            return
        idx = np.nonzero(pending)[0]
        ci, cj, cok = cells_to_localij(cand[idx], anchors[idx])
        hit = cok & (ci == qi[idx]) & (cj == qj[idx])
        rows = idx[hit]
        out[rows] = cand[idx][hit]
        found[rows] = True

    for r in np.unique(res_arr):
        m = res_arr == r
        res = int(r)
        rows = np.nonzero(m)[0]
        nm = len(rows)
        crd = coord[m]
        bca = bc_a[m]
        polar_a = BASE_CELL_IS_POLAR_PENT[bca.clip(0, NUM_BASE_CELLS)].astype(np.int64)
        La = bits.leading_nonzero_digit(anchors[m]).astype(np.int64)

        def submit(h_part, local_ok):
            cand = np.zeros(n, dtype=np.uint64)
            cand[rows[local_ok]] = h_part[local_ok]
            try_candidates(cand)

        # 1. same base cell (pentagon sector rotations; hex: w == 0)
        for Li in (0, 2, 3, 4, 5, 6):
            w = np.where(pent_a[m], _PENT_C_W[La.clip(0, 6), Li], 0).astype(np.int64)
            lok = w >= 0
            h, c = _ijk_to_digits(_rot_coord(crd, -w), res)
            lok &= (c == 0).all(axis=1)
            h = bits.set_base_cell(h, bca.clip(0, 121).astype(np.uint64))
            submit(h, lok)
            if not pent_a[m].any():
                break  # hex anchors: all Li identical
        # 2. neighbor base cells
        for d in range(1, 7):
            nb = BASE_CELL_NEIGHBORS[bca, d]
            valid_nb = nb != INVALID_BASE_CELL
            if not valid_nb.any():
                continue
            nb_pent = BASE_CELL_IS_PENTAGON[nb.clip(0, 121)]
            off = _scaled_offset(np.array([d]), res)[0]
            # 2a. anchor hex (or pent), neighbor hex
            hexnb = valid_nb & ~nb_pent
            if hexnb.any():
                u = np.where(pent_a[m], _PENT_A_U[polar_a, La, d], 0).astype(np.int64)
                t = np.where(pent_a[m], _PENT_A_T[polar_a, La, d], 0).astype(np.int64)
                lok = hexnb & (u >= 0)
                # undo orientation: forward was coord = R^u(C) + R^t(off)
                offr = _rot_coord(np.repeat(off[None, :], nm, axis=0), t)
                cbase = _rot_coord(crd - offr, -u)
                h, c = _ijk_to_digits(cbase, res)
                lok &= (c == 0).all(axis=1)
                rot = BASE_CELL_NEIGHBOR_ROTS[bca, d].astype(np.int64)
                for k in range(1, 6):
                    rm = lok & (rot >= k)
                    if rm.any():
                        h = np.where(rm, bits.rotate60_cw(h), h)
                h = bits.set_base_cell(h, nb.clip(0, 121).astype(np.uint64))
                submit(h, lok)
            # 2b. neighbor pentagon (anchor is hex; two pentagons never touch)
            pnb = valid_nb & nb_pent & ~pent_a[m]
            if pnb.any():
                revd = _base_cell_direction(nb.clip(0, 121), bca)
                polar_n = BASE_CELL_IS_POLAR_PENT[
                    nb.clip(0, NUM_BASE_CELLS)
                ].astype(np.int64)
                rots = BASE_CELL_NEIGHBOR_ROTS[
                    nb.clip(0, 121), revd.clip(0, 6)
                ].astype(np.int64)
                offv = np.zeros((nm, 3), dtype=np.int64)
                for dr in range(1, 7):
                    dm = pnb & (revd == dr)
                    if dm.any():
                        offv[dm] = _scaled_offset(np.array([dr]), res)[0]
                for Lx in (0, 2, 3, 4, 5, 6):
                    u = _PENT_A_U[polar_n, Lx, revd.clip(0, 6)].astype(np.int64)
                    t = _PENT_A_T[polar_n, Lx, revd.clip(0, 6)].astype(np.int64)
                    lok = pnb & (u >= 0) & (revd != 7)
                    if not lok.any():
                        continue
                    offr = _rot_coord(offv, t)
                    cx = ijk.normalize(_rot_coord(crd, u + rots) + offr)
                    h, c = _ijk_to_digits(cx, res)
                    lok &= (c == 0).all(axis=1)
                    h = bits.set_base_cell(h, nb.clip(0, 121).astype(np.uint64))
                    lok &= bits.leading_nonzero_digit(h).astype(np.int64) == Lx
                    submit(h, lok)
    return out, found


def _unfold_frames(a: np.ndarray, b: np.ndarray):
    """Local-IJ frames of (a, b) in a's system plus the hex norm of the
    unfold — the ONE place that computes both, shared by grid_distance's
    fast path and grid_path_cells' lerp so the gate and the certification
    can never desynchronize.  Returns (norm, ok, ia, ja, ib, jb)."""
    ia, ja, oka = cells_to_localij(a, a)
    ib, jb, okb = cells_to_localij(b, a)
    di = ib.astype(np.int64) - ia.astype(np.int64)
    dj = jb.astype(np.int64) - ja.astype(np.int64)
    coord = ijk.normalize(np.stack([di, dj, np.zeros_like(di)], axis=1))
    return np.abs(coord).max(axis=1), oka & okb, ia, ja, ib, jb


def _unfold_distance(a: np.ndarray, b: np.ndarray):
    """Hex norm of b unfolded into a's local IJ frame (the raw H3
    gridDistance construction).  Exact for same-base pairs; across base
    seams the icosahedron bends the lattice, so the norm can over- OR
    under-state the true distance (measured up to +-7 at k=6 even on
    pentagon-free seams) — callers must certify cross-base results."""
    un, ok, *_ = _unfold_frames(a, b)
    return un, ok


def _lookup_in_disks(origins: np.ndarray, targets: np.ndarray, k: int):
    """For each (origin, target) pair: BFS ring distance if target lies in
    origin's k-disk, else -1.  Vectorized: one grid_disk_distances call
    over the unique origins + compact-id key join."""
    from . import traversal

    n = len(origins)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return out
    ua, inv = np.unique(origins, return_inverse=True)
    rows, disk, dist = traversal.grid_disk_distances(ua, k)
    # compact ids so (origin row, cell) packs into one sortable int64 key
    all_cells = np.unique(np.concatenate([disk, targets]))
    m = len(all_cells)
    key = rows.astype(np.int64) * m + np.searchsorted(all_cells, disk)
    order = np.argsort(key)
    key_s, dist_s = key[order], dist[order]
    q = inv * m + np.searchsorted(all_cells, targets)
    pos = np.searchsorted(key_s, q)
    pos = np.clip(pos, 0, len(key_s) - 1)
    hit = key_s[pos] == q
    out[hit] = dist_s[pos[hit]].astype(np.int64)
    return out


def grid_distance(a: np.ndarray, b: np.ndarray, max_k: int = 8,
                  _unfold=None):
    """Exact-or-flagged grid distance between cell pairs.

    Same-HEXAGON-base pairs go through the local-IJ unfold (a true
    isometry within one hexagon base cell — verified exhaustively for all
    res-2 pairs of every base and all res-3 pairs of pentagon-adjacent
    bases up to distance 22, tests/test_localij_pentagon.py).  Everything
    else — cross-base pairs AND same-PENTAGON-base pairs — is answered by
    BFS disk lookup (grid_disk_distances) up to ``max_k`` rings: the
    unfolded frame bends across base seams (planar hex norm measured
    wrong for up to 8% of k=6 pairs, including direct neighbors on
    pentagon-adjacent seams), and within a pentagon base the missing 60
    degree wedge shortcuts long arcs around the apex (first divergence at
    res-3 distance 6).  Pairs beyond ``max_k`` on the BFS path return
    ok=False — the H3-style refusal (h3 gridDistance likewise fails
    rather than guess once local IJ leaves its validity region).
    Returns (dist, ok)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    same = bits.get_base_cell(a) == bits.get_base_cell(b)
    same &= bits.get_resolution(a) == bits.get_resolution(b)
    same &= ~BASE_CELL_IS_PENTAGON[bits.get_base_cell(a).astype(np.int64)]
    d = np.zeros(len(a), dtype=np.int64)
    ok = np.zeros(len(a), dtype=bool)
    if same.any():
        if _unfold is not None:  # caller-precomputed full-input unfold
            du, oku = _unfold[0][same], _unfold[1][same]
        else:
            du, oku = _unfold_distance(a[same], b[same])
        d[same] = du
        ok[same] = oku
    cross = ~same & (bits.get_resolution(a) == bits.get_resolution(b))
    if cross.any():
        dc = _lookup_in_disks(a[cross], b[cross], max_k)
        d[cross] = np.maximum(dc, 0)
        ok[cross] = dc >= 0
    return d, ok


def grid_path_cells(a: np.ndarray, b: np.ndarray, max_k: int = 8):
    """Minimal cell path between pairs (H3 gridPathCells construction:
    cube-lerp in a's local IJ frame, rounded per step, decoded back).
    Returns (row_idx, path_cells, ok_mask); path rows include both
    endpoints in order, row_idx maps each path cell to its input pair.

    Exact-or-flagged: the lerp frame is only trusted where its hex norm
    equals the certified grid_distance (always true same-base; across base
    seams the BFS-certified distance gates it), and every emitted path is
    verified step-by-step — consecutive cells must be true grid neighbors
    (the unfolded frame can distort mid-path across a seam even when the
    endpoint distance agrees).  Pairs failing any check return ok=False
    with no partial list."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    n = len(a)
    # ONE pair of localij unfolds serves the whole function: the lerp
    # frame, its hex norm (the gate), and grid_distance's same-base fast
    # path (passed through _unfold) all come from these shared frames
    un, oku, ia, ja, ib, jb = _unfold_frames(a, b)
    dist, ok = grid_distance(a, b, max_k, _unfold=(un, oku))
    ok = ok & oku & (un == dist)
    steps = np.where(ok, dist, 0).astype(np.int64)
    counts = steps + 1
    total = int(counts.sum())
    row = np.repeat(np.arange(n), counts)
    t_idx = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    frac = t_idx / np.maximum(steps[row], 1)
    # axial (i, j) -> cube (X, Y, Z) = (i, j-i, -j): the hex metric
    # max(|di|, |dj|, |di-dj|) equals cube (|X|+|Y|+|Z|)/2
    def cube(iv, jv):
        iv = iv.astype(np.float64)
        jv = jv.astype(np.float64)
        return iv, jv - iv, -jv

    X0, Y0, Z0 = cube(ia[row], ja[row])
    X1, Y1, Z1 = cube(ib[row], jb[row])
    X = X0 + (X1 - X0) * frac
    Y = Y0 + (Y1 - Y0) * frac
    Z = Z0 + (Z1 - Z0) * frac
    rX, rY, rZ = np.round(X), np.round(Y), np.round(Z)
    dX, dY, dZ = np.abs(rX - X), np.abs(rY - Y), np.abs(rZ - Z)
    # largest-residual correction so the rounded triple stays on the plane
    fixX = (dX >= dY) & (dX >= dZ)
    fixY = ~fixX & (dY >= dZ)
    fixZ = ~fixX & ~fixY
    rX = np.where(fixX, -rY - rZ, rX)
    rY = np.where(fixY, -rX - rZ, rY)
    rZ = np.where(fixZ, -rX - rY, rZ)
    pi = rX.astype(np.int64)
    pj = (rX + rY).astype(np.int64)
    cells, cok = localij_to_cells(a[row], pi, pj)
    keep = ok[row] & cok
    # a pair whose path lost ANY step (e.g. an intermediate cell on an
    # ambiguous pentagon fold) fails wholesale: emit no partial lists
    ok_final = ok & (np.bincount(row[keep], minlength=n) == counts)
    keep &= ok_final[row]
    row_k, cells_k = row[keep], cells[keep]
    # step-adjacency verification: consecutive path cells of one pair must
    # be true grid neighbors (BFS k=1 membership)
    if len(cells_k) > 1:
        same_pair = row_k[1:] == row_k[:-1]
        if same_pair.any():
            step_d = _lookup_in_disks(
                cells_k[:-1][same_pair], cells_k[1:][same_pair], 1
            )
            bad_step = step_d != 1
            if bad_step.any():
                bad_pairs = np.unique(row_k[:-1][same_pair][bad_step])
                ok_final = ok_final.copy()
                ok_final[bad_pairs] = False
                keep2 = ok_final[row_k]
                row_k, cells_k = row_k[keep2], cells_k[keep2]
    return row_k, cells_k, ok_final


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
    involved = _PENT_ADJACENT[bc_a.clip(0, 121)]

    coord = np.stack([i, j, np.zeros_like(i)], axis=1)
    coord = ijk.normalize(coord)

    plain = ~involved
    if plain.any():
        rows = np.nonzero(plain)[0]
        sub_out, sub_ok = _hex_inverse(
            anchors[plain], coord[plain], res_arr[plain], ok[plain].copy()
        )
        out[rows] = sub_out
        ok[rows] = sub_ok
    if involved.any():
        rows = np.nonzero(involved)[0]
        sub_out, sub_found = _pent_inverse(
            anchors[involved], coord[involved], res_arr[involved]
        )
        out[rows] = sub_out
        ok[rows] = sub_found
    ok &= bits.is_valid_cell(out)
    return out, ok
