"""Grid traversal: neighbor steps, grid_disk / grid_ring neighborhoods.

Implements the published H3 neighbor algorithm (h3NeighborRotations) over
uint64 arrays.  The two aperture-7 carry tables (new digit + carry direction
when stepping out of a subdivision) are derived exactly from IJK arithmetic
at import time; the base-cell neighbor table is derived from the geometric
tables in ``faceijk``.  Pentagon special cases follow the published
algorithm.

Reference parity targets: grid_disk / grid_disk_distances / grid_ring
(h3ronpy/src/op/neighbor.rs:19-152, crates/h3arrow/src/algorithm/grid.rs).
"""

from __future__ import annotations

import numpy as np

from . import bits, ijk
from .constants import (
    BASE_CELL_CW_OFFSET,
    BASE_CELL_HOME_FACE,
    BASE_CELL_HOME_IJK,
    BASE_CELL_IS_PENTAGON,
    NUM_BASE_CELLS,
    POLAR_PENTAGONS,
)
from .faceijk import (
    FACE_IJK_BASE_CELL_CCWROT,
    FACE_IJK_BASE_CELLS,
    adjust_overage_class_ii,
    is_class_iii,
)

from . import tablecache

_CACHE = tablecache.load() or {}
_TRAV_KEYS = ("nd3", "na3", "nd2", "na2", "bcn", "bcr")
_HAVE_CACHED = all(k in _CACHE for k in _TRAV_KEYS)

INVALID_BASE_CELL = 127

# --- derived aperture-7 carry tables ---------------------------------------


def _derive_carry_tables():
    """For a child at digit ``d`` stepping in direction ``dir``: the new digit
    and the carry direction into the parent, for both aperture orientations.

    Solved exactly: child center = down_ap7[r](0) + unit(d); after the step,
    match against down_ap7[r](unit(a)) + unit(d') over all (a, d')."""
    tables = {}
    for name, down in (("ciii", ijk.down_ap7), ("cii", ijk.down_ap7r)):
        new_digit = np.zeros((7, 7), dtype=np.int64)
        adjustment = np.zeros((7, 7), dtype=np.int64)
        base = down(ijk.UNIT_VECS.copy())  # (7,3): down-projected carry vectors
        for d in range(7):
            child = ijk.normalize(base[0] + ijk.UNIT_VECS[d])
            for direc in range(1, 7):
                moved = ijk.normalize(child + ijk.UNIT_VECS[direc])
                found = None
                for a in range(7):
                    cand = moved - base[a]
                    cand = cand - cand.min()
                    dd = np.nonzero((ijk.UNIT_VECS == cand).all(axis=1))[0]
                    if len(dd):
                        found = (a, int(dd[0]))
                        break
                assert found is not None, (name, d, direc)
                adjustment[d, direc], new_digit[d, direc] = found
            new_digit[d, 0] = d
            adjustment[d, 0] = 0
        tables[name] = (new_digit, adjustment)
    return tables


if _HAVE_CACHED:
    NEW_DIGIT_CIII, NEW_ADJUSTMENT_CIII = _CACHE["nd3"], _CACHE["na3"]
    NEW_DIGIT_CII, NEW_ADJUSTMENT_CII = _CACHE["nd2"], _CACHE["na2"]
else:
    _ct = _derive_carry_tables()
    NEW_DIGIT_CIII, NEW_ADJUSTMENT_CIII = _ct["ciii"]  # when res r+1 is Class III
    NEW_DIGIT_CII, NEW_ADJUSTMENT_CII = _ct["cii"]


# --- derived base-cell neighbor table ---------------------------------------


def _derive_base_cell_neighbors():
    nbr = np.full((NUM_BASE_CELLS, 7), INVALID_BASE_CELL, dtype=np.int64)
    rots = np.zeros((NUM_BASE_CELLS, 7), dtype=np.int64)
    for b in range(NUM_BASE_CELLS):
        nbr[b, 0] = b
        home_face = int(BASE_CELL_HOME_FACE[b])
        home = BASE_CELL_HOME_IJK[b]
        pent = bool(BASE_CELL_IS_PENTAGON[b])
        for d in range(1, 7):
            if pent and d == ijk.K_AXES_DIGIT:
                continue  # deleted subsequence
            from .faceijk import FACE_NEIGHBOR_CCWROT, FACE_NEIGHBOR_FACE

            c = ijk.normalize(home[None, :] + ijk.UNIT_VECS[d][None, :])
            f = np.array([home_face])
            hop_rot = 0
            guard = 0
            while c.sum() > 2:
                f_prev = int(f[0])
                f, c, _ = adjust_overage_class_ii(
                    f, c, np.array([0]), np.zeros(1, dtype=bool), substrate=False
                )
                q = np.nonzero(FACE_NEIGHBOR_FACE[f_prev] == int(f[0]))[0]
                assert len(q) == 1, (b, d, f_prev, int(f[0]))
                hop_rot += int(FACE_NEIGHBOR_CCWROT[f_prev, q[0]])
                guard += 1
                assert guard <= 4, (b, d)
            i, j, k = int(c[0, 0]), int(c[0, 1]), int(c[0, 2])
            nb = int(FACE_IJK_BASE_CELLS[f[0], i, j, k])
            nbr[b, d] = nb
            # rotation between b's home frame and nb's home frame: the
            # face-crossing rotations accumulated during overage hops plus
            # the face-frame -> home-frame rotation at the final position
            rots[b, d] = (int(FACE_IJK_BASE_CELL_CCWROT[f[0], i, j, k]) + hop_rot) % 6
    return nbr, rots


if _HAVE_CACHED:
    BASE_CELL_NEIGHBORS, BASE_CELL_NEIGHBOR_ROTS = _CACHE["bcn"], _CACHE["bcr"]
else:
    BASE_CELL_NEIGHBORS, BASE_CELL_NEIGHBOR_ROTS = _derive_base_cell_neighbors()


def _fix_pentagon_neighbor_cells():
    """Coordinate arithmetic across the deleted wedge misassigns the I / IK /
    IJ neighbors of pentagon base cells.  Re-derive them geometrically: the
    pentagon's five adjacent res-0 cells, ordered ccw around its center and
    anchored at the trusted JK entry (which needs no face hop), take the
    direction sequence JK -> IK -> I -> IJ -> J (K is deleted)."""
    from .faceijk import cell_to_latlng, geo_azimuth

    res0 = bits.set_base_cell(
        bits.init_cell(0, NUM_BASE_CELLS),
        np.arange(NUM_BASE_CELLS, dtype=np.uint64),
    )
    lat, lng = cell_to_latlng(res0)
    la, lo = np.radians(lat), np.radians(lng)
    v = np.stack([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)], axis=1)
    for b in np.nonzero(BASE_CELL_IS_PENTAGON)[0]:
        d = v @ v[b]
        order = np.argsort(-d)
        nbrs = order[1:6]  # the 5 adjacent base cells
        az = geo_azimuth(la[b], lo[b], la[nbrs], lo[nbrs])
        jk = BASE_CELL_NEIGHBORS[b, ijk.JK_AXES_DIGIT]
        j_ = BASE_CELL_NEIGHBORS[b, ijk.J_AXES_DIGIT]
        assert jk in nbrs and j_ in nbrs, (b, jk, j_, nbrs)
        # find the rotational direction that steps from J to JK next
        idx_sorted = nbrs[np.argsort(az)]
        ring = list(idx_sorted)
        pj = ring.index(j_)
        if ring[(pj + 1) % 5] == jk:
            step = 1
        else:
            assert ring[(pj - 1) % 5] == jk, (b, ring, j_, jk)
            step = -1
        pjk = ring.index(jk)
        seq = [ijk.IK_AXES_DIGIT, ijk.I_AXES_DIGIT, ijk.IJ_AXES_DIGIT, ijk.J_AXES_DIGIT]
        for off, direction in enumerate(seq, start=1):
            BASE_CELL_NEIGHBORS[b, direction] = ring[(pjk + step * off) % 5]


if not _HAVE_CACHED:
    _fix_pentagon_neighbor_cells()


def _calibrate_pentagon_neighbor_rots():
    """The fold geometry around pentagons breaks the additive-rotation
    derivation for pentagon source base cells; calibrate those rows so that
    every res-2 neighbor step out of a pentagon base cell lands on a cell
    whose center distance is a plausible grid pitch (wrong rotations land
    whole subtrees away).  Runs once at import; validated further by the
    traversal test suite."""
    from . import hierarchy
    from .faceijk import cell_to_latlng
    from .boundary import great_circle_distance_rads

    res = 2

    def final_carry_dir(cells, direction):
        """Replicate the digit-carry loop to find which base-cell table entry
        a move exercises: returns (reaches_base_transition, final_dir)."""
        n = len(cells)
        cur_dir = np.full(n, direction, dtype=np.int64)
        active = np.ones(n, dtype=bool)
        for r in range(res - 1, -1, -1):
            old_digit = bits.get_index_digit(cells, r + 1).astype(np.int64)
            if is_class_iii(r + 1):
                next_dir = NEW_ADJUSTMENT_CIII[old_digit, cur_dir]
            else:
                next_dir = NEW_ADJUSTMENT_CII[old_digit, cur_dir]
            more = active & (next_dir != 0)
            cur_dir = np.where(more, next_dir, cur_dir)
            active = more
        return active, cur_dir

    for b in PENTAGON_BASE_CELLS_LIST:
        base = np.array([b << 45 | (1 << 59) | ((1 << 45) - 1)], dtype=np.uint64)
        base = bits.set_resolution(base, np.array([0], dtype=np.uint64))
        cells, _ = hierarchy.cell_to_children(base, res)
        lat0, lng0 = cell_to_latlng(cells)
        la0, lo0 = np.radians(lat0), np.radians(lng0)
        # bucket every (cell, step-direction) move by the table entry it uses
        moves = {}  # final_dir -> (cells, la0, lo0)
        internal = []  # moves that never touch the base-cell table
        for d in range(2, 7):
            reach, fd = final_carry_dir(cells, d)
            for entry in range(2, 7):
                m = reach & (fd == entry)
                if m.any():
                    prev = moves.setdefault(entry, [])
                    prev.append((cells[m], np.full(m.sum(), d), la0[m], lo0[m]))
            mi = ~reach
            if mi.any():
                internal.append((cells[mi], np.full(mi.sum(), d), la0[mi], lo0[mi]))
        # local pitch reference from internal moves (independent of the table)
        ic = np.concatenate([x[0] for x in internal])
        idd = np.concatenate([x[1] for x in internal])
        ila = np.concatenate([x[2] for x in internal])
        ilo = np.concatenate([x[3] for x in internal])
        inbr, _, ierr = neighbor_rotations(ic, idd)
        iok = ierr == 0
        ilat1, ilng1 = cell_to_latlng(inbr[iok])
        local_ref = great_circle_distance_rads(
            ila[iok], ilo[iok], np.radians(ilat1), np.radians(ilng1)
        ).max()
        for entry in range(2, 7):
            if entry not in moves:
                continue
            mc = np.concatenate([x[0] for x in moves[entry]])
            md = np.concatenate([x[1] for x in moves[entry]])
            mla = np.concatenate([x[2] for x in moves[entry]])
            mlo = np.concatenate([x[3] for x in moves[entry]])
            passing = []
            for trial in range(6):
                BASE_CELL_NEIGHBOR_ROTS[b, entry] = trial
                nbr, _, err = neighbor_rotations(mc, md)
                ok = err == 0
                lat1, lng1 = cell_to_latlng(nbr[ok])
                dist = great_circle_distance_rads(
                    mla[ok], mlo[ok], np.radians(lat1), np.radians(lng1)
                )
                # wrong rotations jump whole subtrees away; correct steps stay
                # within ~1.5x the local internal pitch
                if len(dist) and dist.max() < 1.5 * local_ref:
                    passing.append(trial)
            assert len(passing) == 1, (b, entry, passing)
            BASE_CELL_NEIGHBOR_ROTS[b, entry] = passing[0]


PENTAGON_BASE_CELLS_LIST = [int(x) for x in np.nonzero(BASE_CELL_IS_PENTAGON)[0]]


# --- neighbor step ----------------------------------------------------------

E_OK = 0
E_CELL_INVALID = 5  # matches C H3's E_CELL_INVALID
E_PENTAGON = 9


def neighbor_rotations(origin: np.ndarray, direction, rotations=None):
    """Vectorized h3NeighborRotations.

    ``direction`` may be scalar or per-row; all origins must share one
    resolution.  Returns (neighbor, rotations_out, error) where error is
    E_PENTAGON for moves into a deleted pentagon subsequence (those rows'
    neighbor values are undefined and must be discarded).
    """
    h = np.asarray(origin, dtype=np.uint64).copy()
    n = h.shape[0]
    if n == 0:
        return h, np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int8)
    res = int(bits.get_resolution(h[:1])[0])
    direction = np.broadcast_to(np.asarray(direction, dtype=np.int64), (n,)).copy()
    if rotations is None:
        rotations = np.zeros(n, dtype=np.int64)
    else:
        rotations = np.asarray(rotations, dtype=np.int64).copy()
    err = np.zeros(n, dtype=np.int8)

    # incoming rotations rotate the step direction but stay in the count
    rot_left = rotations % 6
    for _ in range(6):
        m = rot_left > 0
        if not m.any():
            break
        direction[m] = ijk.ROTATE60_CCW_DIGIT[direction[m]].astype(np.int64)
        rot_left[m] -= 1
    new_rotations = np.zeros(n, dtype=np.int64)

    old_bc = bits.get_base_cell(h)
    old_lead = bits.leading_nonzero_digit(h).astype(np.int64)

    cur_dir = direction
    active = np.ones(n, dtype=bool)
    for r in range(res - 1, -2, -1):
        if not active.any():
            break
        if r == -1:
            sel = active
            ob = old_bc[sel]
            d = cur_dir[sel]
            nb = BASE_CELL_NEIGHBORS[ob, d]
            nr = BASE_CELL_NEIGHBOR_ROTS[ob, d]
            invalid = nb == INVALID_BASE_CELL
            if invalid.any():
                # K direction from a pentagon: substitute IK and rotate ccw
                ik = np.full(invalid.sum(), ijk.IK_AXES_DIGIT, dtype=np.int64)
                obi = ob[invalid]
                nb[invalid] = BASE_CELL_NEIGHBORS[obi, ik]
                nr[invalid] = BASE_CELL_NEIGHBOR_ROTS[obi, ik]
                inv_rows = np.nonzero(sel)[0][invalid]
                h[inv_rows] = bits.rotate60_ccw(h[inv_rows])
                rotations[inv_rows] += 1
            rows = np.nonzero(sel)[0]
            h[rows] = bits.set_base_cell(h[rows], nb.astype(np.uint64))
            new_rotations[rows] = nr
            active = np.zeros(n, dtype=bool)
        else:
            old_digit = bits.get_index_digit(h, r + 1).astype(np.int64)
            # a corrupt index carrying INVALID_DIGIT (7) inside its res
            # range must fail per-row (C h3NeighborRotations returns
            # E_CELL_INVALID), not IndexError the whole batch
            bad = active & (old_digit > 6)
            if bad.any():
                err[bad] = E_CELL_INVALID
                active = active & ~bad
                old_digit = np.minimum(old_digit, 6)  # safe table indexing
            if is_class_iii(r + 1):
                nd = NEW_DIGIT_CIII[old_digit, cur_dir]
                next_dir = NEW_ADJUSTMENT_CIII[old_digit, cur_dir]
            else:
                nd = NEW_DIGIT_CII[old_digit, cur_dir]
                next_dir = NEW_ADJUSTMENT_CII[old_digit, cur_dir]
            upd = active
            h = np.where(upd, bits.set_index_digit(h, r + 1, nd.astype(np.uint64)), h)
            more = upd & (next_dir != 0)
            done = upd & (next_dir == 0)
            cur_dir = np.where(more, next_dir, cur_dir)
            active = more
            # rows in `done` stop carrying

    new_bc = bits.get_base_cell(h)
    pent = BASE_CELL_IS_PENTAGON[new_bc.clip(0, NUM_BASE_CELLS - 1)]
    if pent.any():
        lead = bits.leading_nonzero_digit(h).astype(np.int64)
        in_k = pent & (lead == ijk.K_AXES_DIGIT)
        already_adjusted = np.zeros(n, dtype=bool)
        if in_k.any():
            crossed = in_k & (old_bc != new_bc)
            if crossed.any():
                # traversed into the deleted k subsequence of a pentagon
                cw = crossed & BASE_CELL_CW_OFFSET[
                    new_bc.clip(0, NUM_BASE_CELLS - 1), BASE_CELL_HOME_FACE[old_bc]
                ]
                ccw = crossed & ~cw
                if cw.any():
                    h = np.where(cw, bits.rotate60_cw(h), h)
                if ccw.any():
                    h = np.where(ccw, bits.rotate60_ccw(h), h)
                already_adjusted |= crossed
            same = in_k & (old_bc == new_bc)
            if same.any():
                from_center = same & (old_lead == 0)
                err[from_center] = E_PENTAGON
                jk = same & (old_lead == ijk.JK_AXES_DIGIT)
                if jk.any():
                    h = np.where(jk, bits.rotate60_ccw(h), h)
                    rotations[jk] += 1
                ikm = same & (old_lead == ijk.IK_AXES_DIGIT)
                if ikm.any():
                    h = np.where(ikm, bits.rotate60_cw(h), h)
                    rotations[ikm] += 5
                other = same & ~from_center & ~jk & ~ikm
                err[other] = E_PENTAGON
        for nr_i in range(1, 6):
            m = pent & (new_rotations >= nr_i)
            if not m.any():
                break
            h = np.where(m, bits.rotate_pent60_ccw(h), h)
        moved = pent & (old_bc != new_bc)
        if moved.any():
            polar = np.isin(new_bc, POLAR_PENTAGONS)
            lead2 = bits.leading_nonzero_digit(h).astype(np.int64)
            add1 = (
                moved
                & polar
                & (old_bc != 118)
                & (old_bc != 8)
                & (lead2 != ijk.JK_AXES_DIGIT)
            )
            add2 = moved & ~polar & (lead2 == ijk.IK_AXES_DIGIT) & ~already_adjusted
            rotations[add1 | add2] += 1
    nonpent = ~pent
    for nr_i in range(1, 6):
        m = nonpent & (new_rotations >= nr_i)
        if not m.any():
            break
        h = np.where(m, bits.rotate60_ccw(h), h)
    rotations = (rotations + new_rotations) % 6
    return h, rotations, err


DIRECTIONS = np.array(
    [
        ijk.J_AXES_DIGIT,
        ijk.JK_AXES_DIGIT,
        ijk.K_AXES_DIGIT,
        ijk.IK_AXES_DIGIT,
        ijk.I_AXES_DIGIT,
        ijk.IJ_AXES_DIGIT,
    ],
    dtype=np.int64,
)


def _split_by_resolution(origins: np.ndarray, k: int, fn):
    """Mixed-resolution dispatch shared by the disk traversals: apply
    ``fn`` (which requires uniform-res input, as neighbor_rotations does)
    per resolution group, remap rows to global positions, and stably
    re-interleave to row-major order preserving each row's internal
    order.  Returns None when the input is already uniform."""
    res = bits.get_resolution(origins).astype(np.int64)
    uniq = np.unique(res)
    if len(uniq) <= 1:
        return None
    rows_all, cells_all, dist_all = [], [], []
    for r in uniq:
        m = res == r
        rr, cc, dd = fn(origins[m], k)
        rows_all.append(np.nonzero(m)[0][rr])
        cells_all.append(cc)
        dist_all.append(dd)
    rows = np.concatenate(rows_all)
    cells = np.concatenate(cells_all)
    dist = np.concatenate(dist_all)
    order = np.argsort(rows, kind="stable")
    return rows[order], cells[order], dist[order]


def grid_disk_distances(origins: np.ndarray, k: int):
    """All cells within grid distance k of each origin.

    Returns (origin_row, cell, dist) flat arrays (unordered within an
    origin); callers regroup into lists/offsets as needed.  BFS formulation
    of the published safe algorithm: each frontier cell expands in all six
    directions; moves into a deleted pentagon subsequence are skipped and
    reached via other paths instead.
    """
    origins = np.asarray(origins, dtype=np.uint64)
    n = len(origins)
    if n == 0 or k < 0:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.uint64), e
    mixed = _split_by_resolution(origins, k, grid_disk_distances)
    if mixed is not None:
        return mixed

    # chunk origins so (row, cell) packs losslessly into one uint64:
    # at uniform resolution the mode/reserved/res bits are constant, so a
    # cell's identity is its low 52 bits (base cell + digits); 12 bits
    # remain for the origin row within a chunk.
    CHUNK = 4096
    if n > CHUNK:
        rows_all, cells_all, dist_all = [], [], []
        for s in range(0, n, CHUNK):
            rr, cc, dd = grid_disk_distances(origins[s : s + CHUNK], k)
            rows_all.append(rr + s)
            cells_all.append(cc)
            dist_all.append(dd)
        return (
            np.concatenate(rows_all),
            np.concatenate(cells_all),
            np.concatenate(dist_all),
        )

    low_mask = np.uint64((1 << 52) - 1)

    def pack(rows, cells):
        return (rows.astype(np.uint64) << np.uint64(52)) | (cells & low_mask)

    seen_row = np.arange(n, dtype=np.int64)
    seen_cell = origins.copy()
    seen_dist = np.zeros(n, dtype=np.int64)
    seen_keys = np.sort(pack(seen_row, seen_cell))
    frontier_row = seen_row
    frontier_cell = seen_cell
    for step in range(1, k + 1):
        if len(frontier_cell) == 0:
            break
        nf = len(frontier_cell)
        rows = np.repeat(frontier_row, 6)
        cells = np.repeat(frontier_cell, 6)
        dirs = np.tile(DIRECTIONS, nf)
        nbr, _, err = neighbor_rotations(cells, dirs)
        ok = err == 0
        rows, nbr = rows[ok], nbr[ok]
        if len(nbr) == 0:
            # every expansion errored (e.g. all frontier cells invalid)
            break
        keys = pack(rows, nbr)
        order = np.argsort(keys)
        keys = keys[order]
        rows = rows[order]
        nbr = nbr[order]
        first = np.r_[True, keys[1:] != keys[:-1]]
        keys, rows, nbr = keys[first], rows[first], nbr[first]
        # drop already-seen keys (both arrays sorted)
        pos = np.searchsorted(seen_keys, keys)
        pos_c = np.clip(pos, 0, len(seen_keys) - 1)
        new = seen_keys[pos_c] != keys
        new_rows, new_cells, new_keys = rows[new], nbr[new], keys[new]
        seen_row = np.concatenate([seen_row, new_rows])
        seen_cell = np.concatenate([seen_cell, new_cells])
        seen_dist = np.concatenate(
            [seen_dist, np.full(len(new_rows), step, dtype=np.int64)]
        )
        seen_keys = np.sort(np.concatenate([seen_keys, new_keys]))
        frontier_row = new_rows
        frontier_cell = new_cells
    order = np.argsort(seen_row, kind="stable")
    return seen_row[order], seen_cell[order], seen_dist[order]


def grid_disk(origins: np.ndarray, k: int):
    """(origin_row, cell) pairs within distance k."""
    rows, cells, _ = grid_disk_distances(origins, k)
    return rows, cells


def grid_ring_distances(origins: np.ndarray, k_min: int, k_max: int):
    rows, cells, dist = grid_disk_distances(origins, k_max)
    m = dist >= k_min
    return rows[m], cells[m], dist[m]


NEXT_RING_DIRECTION = ijk.I_AXES_DIGIT  # h3lib/lib/algos.c ring step-out axis


def grid_disk_walk(origins: np.ndarray, k: int):
    """(origin_row, cell, dist) with each origin's cells in the C
    library's ring-walk order (gridDiskDistancesUnsafe,
    h3lib/lib/algos.c): origin first, then each ring 1..k traversed as
    one un-emitted step out along ``NEXT_RING_DIRECTION`` followed by six
    ring-length sides in ``DIRECTIONS`` order, emitting every step's
    destination — so a ring's step-out cell is emitted LAST, where the
    walk closes.

    Exactly as in C, the walk aborts for an origin when any visited cell
    is a pentagon or a step crosses a deleted pentagon subsequence; those
    origins fall back to BFS discovery order re-sorted ring-contiguous
    (set-identical, order not walk-defined — C falls back to its safe
    algorithm there too).  The construction and constants are the
    published ones; h3o bit-identical ordering is unverifiable here (no
    H3 binding), so tests enforce the ordering invariants instead:
    ring-contiguous, closed neighbor-adjacent perimeter, step-out last.
    """
    origins = np.asarray(origins, dtype=np.uint64)
    n = len(origins)
    if n == 0 or k < 0:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.uint64), e
    mixed = _split_by_resolution(origins, k, grid_disk_walk)
    if mixed is not None:
        return mixed

    cur = origins.copy()
    rot = np.zeros(n, dtype=np.int64)
    alive = ~bits.is_pentagon(origins)
    steps = 3 * k * (k + 1)  # sum of 6*ring emissions
    emit_cells = np.empty((steps, n), dtype=np.uint64)
    emit_dist = np.empty(steps, dtype=np.int64)

    def advance(direction) -> None:
        nonlocal cur, rot, alive
        nxt, rot, err = neighbor_rotations(cur, direction, rot)
        dead = alive & ((err != 0) | bits.is_pentagon(nxt))
        alive = alive & ~dead
        # park dead rows on their origin so later steps stay valid cells
        cur = np.where(alive, nxt, origins)

    s = 0
    for ring in range(1, k + 1):
        advance(NEXT_RING_DIRECTION)  # step out: not emitted
        for d in DIRECTIONS:
            for _ in range(ring):
                advance(int(d))
                emit_cells[s] = cur
                emit_dist[s] = ring
                s += 1

    per_row = steps + 1
    rows_out, cells_out, dist_out = [], [], []
    a_idx = np.nonzero(alive)[0]
    if len(a_idx):
        cells_a = np.concatenate(
            [origins[a_idx][:, None], emit_cells[:, a_idx].T], axis=1
        ).ravel()
        rows_out.append(np.repeat(a_idx, per_row))
        cells_out.append(cells_a)
        dist_out.append(
            np.tile(np.concatenate([[0], emit_dist]), len(a_idx))
        )
    d_idx = np.nonzero(~alive)[0]
    if len(d_idx):
        rr, cc, dd = grid_disk_distances(origins[d_idx], k)
        order = np.lexsort((dd, rr))
        rows_out.append(d_idx[rr[order]])
        cells_out.append(cc[order])
        dist_out.append(dd[order])
    rows = np.concatenate(rows_out)
    cells = np.concatenate(cells_out)
    dist = np.concatenate(dist_out)
    order = np.argsort(rows, kind="stable")
    return rows[order], cells[order], dist[order]

def are_neighbor_cells(origin: np.ndarray, dest: np.ndarray):
    """Vectorized H3 areNeighborCells: True where ``dest`` is one of
    ``origin``'s six (five for pentagons) immediate neighbors.

    Follows the C API's error contract (h3lib areNeighborCells): a cell
    equal to itself is NOT a neighbor but not an error; differing
    resolutions are error 2 (E_RES_MISMATCH analog); invalid cells are
    error 1 (E_CELL_INVALID analog).  Returns (neighbor: bool,
    error: int8) aligned to input rows; neighbor is False wherever
    error != 0.

    Implementation is membership in the origin's direction-1..6
    neighbor set via ``neighbor_rotations`` (the same primitive the C
    gridDisk membership fallback uses), dispatched per resolution
    group; E_PENTAGON rows from deleted-subsequence moves are simply
    non-matches, exactly as gridDisk skips them.
    """
    o = np.asarray(origin, dtype=np.uint64)
    d = np.asarray(dest, dtype=np.uint64)
    if o.shape != d.shape:
        raise ValueError("origin and dest must be the same length")
    n = len(o)
    out = np.zeros(n, dtype=bool)
    err = np.zeros(n, dtype=np.int8)
    valid = bits.is_valid_cell(o) & bits.is_valid_cell(d)
    err[~valid] = 1
    res_o = bits.get_resolution(o).astype(np.int64)
    res_d = bits.get_resolution(d).astype(np.int64)
    mismatch = valid & (res_o != res_d)
    err[mismatch] = 2
    live = valid & ~mismatch & (o != d)
    for r in np.unique(res_o[live]):
        sel = live & (res_o == r)
        osel, dsel = o[sel], d[sel]
        hit = np.zeros(len(osel), dtype=bool)
        for direction in range(1, 7):
            nb, _, perr = neighbor_rotations(osel, direction)
            hit |= (perr == 0) & (nb == dsel)
        out[sel] = hit
    return out, err


if not _HAVE_CACHED:
    _calibrate_pentagon_neighbor_rots()
    tablecache.save(
        {
            **(tablecache.load() or {}),
            "nd3": NEW_DIGIT_CIII,
            "na3": NEW_ADJUSTMENT_CIII,
            "nd2": NEW_DIGIT_CII,
            "na2": NEW_ADJUSTMENT_CII,
            "bcn": BASE_CELL_NEIGHBORS,
            "bcr": BASE_CELL_NEIGHBOR_ROTS,
        }
    )
