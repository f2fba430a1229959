"""Icosahedron face lattice: geo <-> FaceIJK projections and cell codec.

Vectorized NumPy implementation of the public H3 projection pipeline:
gnomonic projection onto the nearest icosahedron face, hex-plane rounding to
IJK, aperture-7 digit aggregation into a 64-bit index, and the inverse with
face-overage adjustment.

The face->base-cell lookup table (``FACE_IJK_BASE_CELLS``) and its rotation
companion are *derived at import time* from the base-cell geometry in
``constants.py`` instead of transcribed: each candidate res-0 lattice position
on each face is projected to a sphere point and matched against the 122 base
cell centers; the coordinate-frame rotation between a face and a base cell's
home face is recovered from the angle of a mapped lattice direction.  The
whole derivation is validated by exhaustive res-1/res-2 decode->encode
roundtrips in tests/test_h3core.py.

Functional parity targets in the reference: coordinates_to_cells /
cells_to_coordinates (h3ronpy/src/vector.rs:148-241) which delegate to h3o.
"""

from __future__ import annotations

import numpy as np

from . import bits, ijk
from .constants import (
    IJ,
    JK,
    KI,
    BASE_CELL_CW_OFFSET,
    BASE_CELL_HOME_FACE,
    BASE_CELL_HOME_IJK,
    BASE_CELL_IS_PENTAGON,
    EPSILON,
    FACE_AXES_AZ_RADS_CII_0,
    FACE_CENTER_GEO,
    FACE_CENTER_POINT,
    FACE_NEIGHBOR_CCWROT,
    FACE_NEIGHBOR_FACE,
    FACE_NEIGHBOR_TRANSLATE,
    M_AP7_ROT_RADS,
    M_SQRT7,
    MAX_H3_RES,
    NUM_BASE_CELLS,
    POW7,
    RES0_U_GNOMONIC,
)

from . import tablecache

_CACHE = tablecache.load() or {}
_FACEIJK_KEYS = ("fn_face", "fn_trans", "fn_rot", "fijk_cells", "fijk_rots")
_HAVE_CACHED = all(k in _CACHE for k in _FACEIJK_KEYS)

INVALID_BASE_CELL = 127

NO_OVERAGE = 0
FACE_EDGE = 1
NEW_FACE = 2

_TWO_PI = 2.0 * np.pi


def is_class_iii(res) -> np.ndarray:
    return (np.asarray(res) % 2) == 1


def pos_angle(a: np.ndarray) -> np.ndarray:
    out = np.mod(a, _TWO_PI)
    return np.where(out < 0, out + _TWO_PI, out)


def geo_azimuth(lat1, lng1, lat2, lng2) -> np.ndarray:
    """Azimuth (initial bearing) from point 1 to point 2, radians."""
    return np.arctan2(
        np.cos(lat2) * np.sin(lng2 - lng1),
        np.cos(lat1) * np.sin(lat2)
        - np.sin(lat1) * np.cos(lat2) * np.cos(lng2 - lng1),
    )


def az_distance_point(lat1, lng1, az, dist):
    """Destination point along an azimuth at a spherical distance."""
    sin_lat2 = np.sin(lat1) * np.cos(dist) + np.cos(lat1) * np.sin(dist) * np.cos(az)
    sin_lat2 = np.clip(sin_lat2, -1.0, 1.0)
    lat2 = np.arcsin(sin_lat2)
    y = np.sin(az) * np.sin(dist) * np.cos(lat1)
    x = np.cos(dist) - np.sin(lat1) * sin_lat2
    lng2 = lng1 + np.arctan2(y, x)
    # constrain to (-pi, pi]
    lng2 = np.mod(lng2 + np.pi, _TWO_PI) - np.pi
    at_pole = np.abs(np.abs(lat2) - np.pi / 2.0) < EPSILON
    lng2 = np.where(at_pole, 0.0, lng2)
    return lat2, lng2


# --- geo -> hex2d on a face -------------------------------------------------


_FACE_CENTER_POINT_F32 = FACE_CENTER_POINT.astype(np.float32)


def nearest_face(lat: np.ndarray, lng: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Face whose center is closest; returns (face, cos angular distance).

    The argmax runs in float32 (a face flip near the exact midline yields
    the same cell — the lattice agrees across faces in the overlap region);
    the angular distance is then recomputed in float64 for the chosen face.
    """
    cl = np.cos(lat)
    x = cl * np.cos(lng)
    y = cl * np.sin(lng)
    z = np.sin(lat)
    v32 = np.empty((len(lat), 3), dtype=np.float32)
    v32[:, 0] = x
    v32[:, 1] = y
    v32[:, 2] = z
    face = np.argmax(v32 @ _FACE_CENTER_POINT_F32.T, axis=1)
    c = FACE_CENTER_POINT[face]
    cosdist = x * c[:, 0] + y * c[:, 1] + z * c[:, 2]
    return face, np.clip(cosdist, -1.0, 1.0)


def geo_to_hex2d_on_face(lat, lng, face, res, cosdist=None):
    """Project points onto given faces' hex2d frames at a resolution scale."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    face = np.asarray(face, dtype=np.int64)
    if cosdist is None:
        v = np.stack(
            [np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)],
            axis=1,
        )
        cosdist = np.clip(np.einsum("nk,nk->n", v, FACE_CENTER_POINT[face]), -1.0, 1.0)
    r = np.arccos(cosdist)
    fc_lat = FACE_CENTER_GEO[face, 0]
    fc_lng = FACE_CENTER_GEO[face, 1]
    az = geo_azimuth(fc_lat, fc_lng, lat, lng)
    theta = pos_angle(FACE_AXES_AZ_RADS_CII_0[face] - pos_angle(az))
    res = np.broadcast_to(np.asarray(res, dtype=np.int64), lat.shape)
    theta = np.where(is_class_iii(res), pos_angle(theta - M_AP7_ROT_RADS), theta)
    scale = np.power(M_SQRT7, res.astype(np.float64))
    rr = np.tan(r) / RES0_U_GNOMONIC * scale
    small = r < EPSILON
    rr = np.where(small, 0.0, rr)
    return rr * np.cos(theta), rr * np.sin(theta)


def hex2d_to_geo(x, y, face, res, substrate: bool):
    """Inverse gnomonic: hex2d coords on faces -> (lat, lng) radians."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    face = np.asarray(face, dtype=np.int64)
    res = np.broadcast_to(np.asarray(res, dtype=np.int64), x.shape)
    r = np.hypot(x, y)
    theta = np.arctan2(y, x)
    r = r / np.power(M_SQRT7, res.astype(np.float64))
    ciii = is_class_iii(res)
    if substrate:
        r = r / 3.0
        r = np.where(ciii, r / M_SQRT7, r)
    r = np.arctan(r * RES0_U_GNOMONIC)
    if not substrate:
        theta = np.where(ciii, pos_angle(theta + M_AP7_ROT_RADS), theta)
    theta = pos_angle(FACE_AXES_AZ_RADS_CII_0[face] - pos_angle(theta))
    fc_lat = FACE_CENTER_GEO[face, 0]
    fc_lng = FACE_CENTER_GEO[face, 1]
    small = r < EPSILON
    lat, lng = az_distance_point(fc_lat, fc_lng, theta, r)
    lat = np.where(small, fc_lat, lat)
    lng = np.where(small, fc_lng, lng)
    return lat, lng


def faceijk_to_geo(face, coord, res, substrate: bool = False):
    x, y = ijk.ijk_to_hex2d(coord)
    return hex2d_to_geo(x, y, face, res, substrate)


# --- face overage adjustment ------------------------------------------------


def adjust_overage_class_ii(face, coord, res, pent_leading4, substrate: bool):
    """One overage-adjustment step (vectorized port of the published
    _adjustOverageClassII): coordinates past a face's boundary are re-expressed
    on the neighboring face.  ``res`` must be a Class II resolution per row.

    Returns (face, coord, overage_code).
    """
    face = np.asarray(face, dtype=np.int64).copy()
    coord = np.asarray(coord, dtype=np.int64).copy()
    res = np.broadcast_to(np.asarray(res, dtype=np.int64), face.shape)
    overage = np.zeros(face.shape, dtype=np.int8)

    max_dim = 2 * POW7[res // 2]
    if substrate:
        max_dim = max_dim * 3
    s = coord.sum(axis=-1)

    if substrate:
        overage[s == max_dim] = FACE_EDGE
    moved = s > max_dim
    if moved.any():
        overage[moved] = NEW_FACE
        i = coord[:, 0]
        j = coord[:, 1]
        k = coord[:, 2]
        quad = np.where(
            k > 0,
            np.where(j > 0, 3, 2),  # JK vs KI
            1,  # IJ
        )
        # pentagon leading-4 special case in the KI quadrant: rotate about the
        # offset origin before changing faces
        pl4 = np.asarray(pent_leading4, dtype=bool) & moved & (quad == 2)
        if pl4.any():
            origin = np.zeros_like(coord[pl4])
            origin[:, 0] = max_dim[pl4]
            tmp = coord[pl4] - origin
            tmp = tmp @ np.array([[1, 0, 1], [1, 1, 0], [0, 1, 1]], dtype=np.int64)
            coord[pl4] = tmp + origin
            # note: no normalize here (C rotates in place, normalize happens below)
        sel = moved
        f = face[sel]
        q = quad[sel]
        new_face = FACE_NEIGHBOR_FACE[f, q]
        rot = FACE_NEIGHBOR_CCWROT[f, q]
        trans = FACE_NEIGHBOR_TRANSLATE[f, q].copy()
        unit_scale = POW7[res[sel] // 2]
        if substrate:
            unit_scale = unit_scale * 3
        c = coord[sel]
        c = ijk.rotate60_ccw_n(c, rot)
        c = c + trans * unit_scale[:, None]
        c = ijk.normalize(c)
        coord[sel] = c
        face[sel] = new_face
        if substrate:
            on_edge = sel.copy()
            on_edge[sel] = coord[sel].sum(axis=-1) == max_dim[sel]
            overage[on_edge] = FACE_EDGE
    return face, coord, overage


# --- derived face neighbor orientation table --------------------------------


def _derive_face_neighbors():
    """Derive faceNeighbors (neighbor face, ijk translate, ccw rotations) for
    the IJ/KI/JK overage quadrants of every face, by projecting exterior
    lattice points through geo space onto the neighboring face and solving
    for the unique (rotation, translation) that reproduces them."""
    res = 2  # a Class II res: maxDim=14, unitScale=7
    scale = 7
    candidates_t = np.array([[2, 0, 2], [2, 2, 0], [0, 2, 2]], dtype=np.int64)
    samples = {
        IJ: np.array([[8, 8, 0], [10, 6, 0], [6, 10, 0]], dtype=np.int64),
        KI: np.array([[8, 0, 8], [10, 0, 6], [6, 0, 10]], dtype=np.int64),
        JK: np.array([[0, 8, 8], [0, 10, 6], [0, 6, 10]], dtype=np.int64),
    }
    face_t = np.zeros((20, 4), dtype=np.int64)
    trans_t = np.zeros((20, 4, 3), dtype=np.int64)
    rot_t = np.zeros((20, 4), dtype=np.int64)
    for f in range(20):
        face_t[f, 0] = f
        for quad, pts in samples.items():
            faces = np.full(len(pts), f, dtype=np.int64)
            lat, lng = faceijk_to_geo(faces, pts, np.full(len(pts), res))
            nf_arr, _ = nearest_face(lat, lng)
            nf = int(nf_arr[0])
            assert (nf_arr == nf).all(), (f, quad, nf_arr)
            hx, hy = geo_to_hex2d_on_face(
                lat, lng, np.full(len(pts), nf), np.full(len(pts), res)
            )
            target = ijk.hex2d_to_ijk(hx, hy)
            found = None
            for r in range(6):
                q = ijk.rotate60_ccw_n(pts, np.full(len(pts), r))
                for t in candidates_t:
                    got = ijk.normalize(q + t * scale)
                    if (got == target).all():
                        found = (r, t)
                        break
                if found:
                    break
            assert found is not None, (f, quad)
            face_t[f, quad] = nf
            rot_t[f, quad] = found[0]
            trans_t[f, quad] = found[1]
    return face_t, trans_t, rot_t


if _HAVE_CACHED:
    FACE_NEIGHBOR_FACE = _CACHE["fn_face"]
    FACE_NEIGHBOR_TRANSLATE = _CACHE["fn_trans"]
    FACE_NEIGHBOR_CCWROT = _CACHE["fn_rot"]
else:
    # overwrite the memorized table in constants with the derived one
    FACE_NEIGHBOR_FACE, FACE_NEIGHBOR_TRANSLATE, FACE_NEIGHBOR_CCWROT = (
        _derive_face_neighbors()
    )


# --- derived face -> base cell tables --------------------------------------


def _derive_face_ijk_base_cells():
    """Derive (baseCell, ccwRot60) for every res-0 lattice position of every
    face by matching sphere points against the 122 base-cell centers."""
    # base cell centers as 3d points
    bc_lat, bc_lng = faceijk_to_geo(
        BASE_CELL_HOME_FACE, BASE_CELL_HOME_IJK, np.zeros(NUM_BASE_CELLS, dtype=np.int64)
    )
    bc_pts = np.stack(
        [np.cos(bc_lat) * np.cos(bc_lng), np.cos(bc_lat) * np.sin(bc_lng), np.sin(bc_lat)],
        axis=1,
    )

    cells = np.full((20, 3, 3, 3), INVALID_BASE_CELL, dtype=np.int64)
    rots = np.zeros((20, 3, 3, 3), dtype=np.int64)

    combos = [
        (i, j, k)
        for i in range(3)
        for j in range(3)
        for k in range(3)
        if min(i, j, k) == 0
    ]
    n = len(combos)
    for f in range(20):
        coords = np.array(combos, dtype=np.int64)
        faces = np.full(n, f, dtype=np.int64)
        lat, lng = faceijk_to_geo(faces, coords, np.zeros(n, dtype=np.int64))
        pts = np.stack(
            [np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)], axis=1
        )
        dots = pts @ bc_pts.T
        best = np.argmax(dots, axis=1)
        for idx, (i, j, k) in enumerate(combos):
            b = int(best[idx])
            cells[f, i, j, k] = b
            hf = int(BASE_CELL_HOME_FACE[b])
            if hf == f and (BASE_CELL_HOME_IJK[b] == (i, j, k)).all():
                rots[f, i, j, k] = 0
                continue
            # recover the frame rotation: map a small lattice step along +x of
            # face f through geo space into the home face's frame and measure
            # the direction of the mapped step there.  (Beyond a face edge the
            # unfolded lattice point is displaced from the true cell center by
            # the icosahedron fold, so only the *direction* difference of two
            # nearby mapped points is meaningful.)
            delta = 1e-6
            x0, y0 = ijk.ijk_to_hex2d(coords[idx][None, :])
            p_lat, p_lng = hex2d_to_geo(
                np.array([x0[0], x0[0] + delta]),
                np.array([y0[0], y0[0]]),
                np.array([f, f]),
                np.array([0, 0]),
                False,
            )
            hx, hy = geo_to_hex2d_on_face(
                p_lat, p_lng, np.array([hf, hf]), np.array([0, 0])
            )
            ang = np.arctan2(hy[1] - hy[0], hx[1] - hx[0])
            nrot = int(np.round(ang / (np.pi / 3.0))) % 6
            rots[f, i, j, k] = nrot
    # fill non-normalized combos from their normalized equivalents
    for i in range(3):
        for j in range(3):
            for k in range(3):
                m = min(i, j, k)
                if m > 0:
                    cells[:, i, j, k] = cells[:, i - m, j - m, k - m]
                    rots[:, i, j, k] = rots[:, i - m, j - m, k - m]
    return cells, rots


if _HAVE_CACHED:
    FACE_IJK_BASE_CELLS = _CACHE["fijk_cells"]
    FACE_IJK_BASE_CELL_CCWROT = _CACHE["fijk_rots"]
else:
    FACE_IJK_BASE_CELLS, FACE_IJK_BASE_CELL_CCWROT = _derive_face_ijk_base_cells()


def _calibrate_pentagon_rotations():
    """Pentagon coordinate frames rotate in 72-degree (pentagonal) steps, so
    the azimuth-based 60-degree rounding above is wrong for them.  Calibrate
    each pentagon table entry against the decode path (which only uses
    base-cell home data, never this table): pick the rotation count that makes
    encode(decode(cell)) the identity for the pentagon's res-2 descendants."""
    from .constants import PENTAGON_BASE_CELLS

    res = 2
    for b in PENTAGON_BASE_CELLS:
        # all valid res-2 descendants of b (leading K digit excluded)
        cells = []
        for d1 in range(7):
            if d1 == ijk.K_AXES_DIGIT:
                continue
            for d2 in range(7):
                if d1 == 0 and d2 == ijk.K_AXES_DIGIT:
                    continue
                cells.append((d1, d2))
        n = len(cells)
        h = bits.set_base_cell(bits.init_cell(res, n), np.full(n, b, dtype=np.uint64))
        h = bits.set_index_digit(h, 1, np.array([c[0] for c in cells], dtype=np.uint64))
        h = bits.set_index_digit(h, 2, np.array([c[1] for c in cells], dtype=np.uint64))
        f_dec, c_dec, _ = cell_to_faceijk(h)
        lat, lng = faceijk_to_geo(f_dec, c_dec, np.full(n, res))
        f_enc, c_enc = geo_to_faceijk(lat, lng, res)
        # up-aggregate to find each sample's res-0 coord on its encode face
        c0 = c_enc.copy()
        for r in range(res - 1, -1, -1):
            c0 = ijk.up_ap7(c0) if is_class_iii(r + 1) else ijk.up_ap7r(c0)
        for f in range(20):
            if int(BASE_CELL_HOME_FACE[b]) == f:
                continue
            hv = BASE_CELL_HOME_IJK[b]
            for i in range(3):
                for j in range(3):
                    for k in range(3):
                        if FACE_IJK_BASE_CELLS[f, i, j, k] != b:
                            continue
                        sel = (
                            (f_enc == f)
                            & (c0[:, 0] == i)
                            & (c0[:, 1] == j)
                            & (c0[:, 2] == k)
                        )
                        if not sel.any():
                            continue
                        want = h[sel]
                        good = None
                        for trial in range(6):
                            FACE_IJK_BASE_CELL_CCWROT[f, i, j, k] = trial
                            got = faceijk_to_cell(f_enc[sel], c_enc[sel], res)
                            if (got == want).all():
                                good = trial
                                break
                        assert good is not None, (b, f, (i, j, k))
                        FACE_IJK_BASE_CELL_CCWROT[f, i, j, k] = good


# --- encode: geo -> cell ----------------------------------------------------


def geo_to_faceijk(lat, lng, res):
    """Project points to (face, ijk) at a resolution."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    face, cosdist = nearest_face(lat, lng)
    x, y = geo_to_hex2d_on_face(lat, lng, face, res, cosdist=cosdist)
    coord = ijk.hex2d_to_ijk(x, y)
    return face, coord


def faceijk_to_cell(face, coord, res: int) -> np.ndarray:
    """FaceIJK at ``res`` -> H3 cell index (vectorized _faceIjkToH3)."""
    face = np.asarray(face, dtype=np.int64)
    coord = np.asarray(coord, dtype=np.int64)
    n = face.shape[0]
    h = bits.init_cell(res, n)

    if res == 0:
        out_of_range = (coord > 2).any(axis=-1)
        bc = FACE_IJK_BASE_CELLS[face, coord[:, 0].clip(0, 2), coord[:, 1].clip(0, 2), coord[:, 2].clip(0, 2)]
        h = bits.set_base_cell(h, bc.astype(np.uint64))
        h = np.where(out_of_range | (bc == INVALID_BASE_CELL), bits.H3_NULL, h)
        return h

    # build digits from finest to coarsest.  The down-projection and the
    # difference need no intermediate normalization: unit_ijk_to_digit
    # canonicalizes, and equivalence classes are preserved by the linear maps
    # (saves two full-array passes per level).
    c = coord.copy()
    for r in range(res - 1, -1, -1):
        last = c
        if is_class_iii(r + 1):
            c = ijk.up_ap7(c)
            center = c @ ijk._M_DOWN_AP7
        else:
            c = ijk.up_ap7r(c)
            center = c @ ijk._M_DOWN_AP7R
        digit = ijk.unit_ijk_to_digit(last - center)
        h = bits.set_index_digit(h, r + 1, digit)

    out_of_range = (c > 2).any(axis=-1) | (c < 0).any(axis=-1)
    ci = c.clip(0, 2)
    bc = FACE_IJK_BASE_CELLS[face, ci[:, 0], ci[:, 1], ci[:, 2]]
    num_rots = FACE_IJK_BASE_CELL_CCWROT[face, ci[:, 0], ci[:, 1], ci[:, 2]]
    h = bits.set_base_cell(h, np.where(bc == INVALID_BASE_CELL, 0, bc).astype(np.uint64))

    pent = BASE_CELL_IS_PENTAGON[bc.clip(0, NUM_BASE_CELLS - 1)] & (bc != INVALID_BASE_CELL)
    if pent.any():
        sel = np.nonzero(pent)[0]
        hp = h[sel]
        lead = bits.leading_nonzero_digit(hp)
        fix = lead == ijk.K_AXES_DIGIT
        if fix.any():
            cw = fix & BASE_CELL_CW_OFFSET[bc[sel].clip(0, NUM_BASE_CELLS - 1), face[sel]]
            ccw = fix & ~cw
            if cw.any():
                hp[cw] = bits.rotate60_cw(hp[cw])
            if ccw.any():
                hp[ccw] = bits.rotate60_ccw(hp[ccw])
        nr_p = num_rots[sel]
        for nr in range(1, 6):
            m = nr_p >= nr
            if not m.any():
                continue
            hp[m] = bits.rotate_pent60_ccw(hp[m])
        h[sel] = hp
    nonpent = ~pent
    if nonpent.any():
        rows = np.nonzero(nonpent & (num_rots > 0))[0]
        if len(rows):
            h[rows] = bits.rotate60_ccw_n(h[rows], num_rots[rows])

    h = np.where(out_of_range | (bc == INVALID_BASE_CELL), bits.H3_NULL, h)
    return h


def latlng_to_cell(lat, lng, res) -> np.ndarray:
    """Degrees in, cells out; res may be scalar or per-row array."""
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lng = np.radians(np.asarray(lng, dtype=np.float64))
    res_arr = np.asarray(res)
    if res_arr.ndim == 0:
        face, coord = geo_to_faceijk(lat, lng, int(res_arr))
        return faceijk_to_cell(face, coord, int(res_arr))
    # per-row resolutions: group by res value
    out = np.zeros(lat.shape, dtype=np.uint64)
    for r in np.unique(res_arr):
        m = res_arr == r
        face, coord = geo_to_faceijk(lat[m], lng[m], int(r))
        out[m] = faceijk_to_cell(face, coord, int(r))
    return out


# --- decode: cell -> faceijk / geo -----------------------------------------


def cell_to_faceijk(h: np.ndarray):
    """Vectorized port of _h3ToFaceIjk; returns (face, coord, res_used).

    ``res_used`` is the cell's resolution (coords are at cell-res scale even
    when an intermediate substrate step was used for Class III).
    """
    h = np.asarray(h, dtype=np.uint64).copy()
    n = h.shape[0]
    res = bits.get_resolution(h).astype(np.int64)
    bc = bits.get_base_cell(h)
    pent_base = BASE_CELL_IS_PENTAGON[bc.clip(0, NUM_BASE_CELLS - 1)]
    lead = bits.leading_nonzero_digit(h)
    rot_fix = pent_base & (lead == ijk.IK_AXES_DIGIT)
    if rot_fix.any():
        rows = np.nonzero(rot_fix)[0]
        h[rows] = bits.rotate60_cw(h[rows])

    face = BASE_CELL_HOME_FACE[bc].copy()
    coord = BASE_CELL_HOME_IJK[bc].copy()

    # possible overage flag (per _h3ToFaceIjkWithInitializedFijk)
    possible = ~(
        (~pent_base)
        & ((res == 0) | ((coord == 0).all(axis=-1)))
    )

    for r in range(1, MAX_H3_RES + 1):
        active = r <= res
        if not active.any():
            break
        if is_class_iii(r):
            stepped = ijk.down_ap7(coord)
        else:
            stepped = ijk.down_ap7r(coord)
        d = bits.get_index_digit(h, r).astype(np.int64)
        d = np.where(active, d, 0)  # digits past res are 7 (unused)
        stepped = ijk.neighbor(stepped, d)
        coord = np.where(active[:, None], stepped, coord)

    orig = coord.copy()
    adj_res = res.copy()
    ciii = is_class_iii(res)
    sub = ciii & possible
    if sub.any():
        down = ijk.down_ap7r(coord)
        coord = np.where(sub[:, None], down, coord)
        adj_res = np.where(sub, res + 1, adj_res)

    pent_lead4 = pent_base & (bits.leading_nonzero_digit(h) == ijk.I_AXES_DIGIT)

    if possible.any():
        f2, c2, ov = adjust_overage_class_ii(
            face, coord, adj_res, pent_lead4, substrate=False
        )
        # only rows with possible overage take the adjustment
        moved_first = possible & (ov == NEW_FACE)
        face = np.where(possible, f2, face)
        coord = np.where(possible[:, None], c2, coord)
        # pentagon secondary overages
        loop_mask = moved_first & pent_base
        while loop_mask.any():
            f3, c3, ov3 = adjust_overage_class_ii(
                face, coord, adj_res, np.zeros(n, dtype=bool), substrate=False
            )
            face = np.where(loop_mask, f3, face)
            coord = np.where(loop_mask[:, None], c3, coord)
            loop_mask = loop_mask & (ov3 == NEW_FACE)
        # convert back from substrate where overage occurred at Class III
        back = moved_first & (adj_res != res)
        if back.any():
            up = ijk.up_ap7r(coord)
            coord = np.where(back[:, None], up, coord)
        # no overage: restore pre-substrate coords
        restore = possible & ~moved_first & (adj_res != res)
        coord = np.where(restore[:, None], orig, coord)
    return face, coord, res


def cell_to_latlng(h: np.ndarray):
    """Cells -> centroid (lat, lng) in degrees."""
    face, coord, res = cell_to_faceijk(h)
    lat, lng = faceijk_to_geo(face, coord, res)
    return np.degrees(lat), np.degrees(lng)


# calibration must run after the encode/decode functions are defined
if not _HAVE_CACHED:
    _calibrate_pentagon_rotations()
    tablecache.save(
        {
            **_CACHE,
            "fn_face": FACE_NEIGHBOR_FACE,
            "fn_trans": FACE_NEIGHBOR_TRANSLATE,
            "fn_rot": FACE_NEIGHBOR_CCWROT,
            "fijk_cells": FACE_IJK_BASE_CELLS,
            "fijk_rots": FACE_IJK_BASE_CELL_CCWROT,
        }
    )
