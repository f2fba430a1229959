"""Cell boundary vertices, spherical areas and lengths (vectorized).

Port of the published H3 boundary algorithm: cell centers are lifted onto an
aperture 3-3r (Class II) or 3-3r-7r (Class III) substrate grid where the six
(five for pentagons) vertices are fixed lattice offsets; each vertex is
overage-adjusted onto its true face, and for Class III resolutions an extra
vertex is inserted wherever a cell edge crosses an icosahedron edge.

Output is a flat (lat, lng) vertex buffer plus per-cell offsets — the natural
Arrow ``list<struct>`` layout for ``map_batches`` kernels.

Reference parity targets: cells_to_wkb_polygons / cells_bounds_arrays /
cells_area_* (h3ronpy/src/vector.rs:101-146,243-284, src/op/measure.rs:7-26).
"""

from __future__ import annotations

import numpy as np

from . import bits, ijk
from .constants import EARTH_RADIUS_KM, M_SIN60, POW7
from .faceijk import (
    FACE_EDGE,
    FACE_NEIGHBOR_FACE,
    NEW_FACE,
    adjust_overage_class_ii,
    cell_to_faceijk,
    hex2d_to_geo,
    is_class_iii,
)

# substrate vertex offsets (ccw) for origin-centered cells
_VERTS_CII = np.array(
    [[2, 1, 0], [1, 2, 0], [0, 2, 1], [0, 1, 2], [1, 0, 2], [2, 0, 1]], dtype=np.int64
)
_VERTS_CIII = np.array(
    [[5, 4, 0], [1, 5, 0], [0, 5, 4], [0, 1, 5], [4, 0, 5], [5, 0, 1]], dtype=np.int64
)

# adjacentFaceDir[a][b] = overage quadrant (1=IJ, 2=KI, 3=JK) from face a to b
ADJACENT_FACE_DIR = np.full((20, 20), -1, dtype=np.int64)
for _f in range(20):
    ADJACENT_FACE_DIR[_f, _f] = 0
    for _q in (1, 2, 3):
        ADJACENT_FACE_DIR[_f, FACE_NEIGHBOR_FACE[_f, _q]] = _q


def _substrate_center(face, coord, res):
    """Lift cell centers onto the boundary substrate grid; returns
    (face, coord, adj_res) with adj_res = res (+1 if Class III)."""
    c = ijk.down_ap3(coord)
    c = ijk.down_ap3r(c)
    adj_res = np.asarray(res, dtype=np.int64).copy()
    ciii = is_class_iii(adj_res)
    if ciii.any():
        down = ijk.down_ap7r(c)
        c = np.where(ciii[:, None], down, c)
        adj_res = np.where(ciii, adj_res + 1, adj_res)
    return face, c, adj_res


def _icosa_edge_for_quadrant(quad, max_dim):
    """Endpoints of the face-triangle edge crossed in an overage quadrant,
    in substrate hex2d coordinates."""
    md = max_dim.astype(np.float64)
    v0 = np.stack([3.0 * md, np.zeros_like(md)], axis=-1)
    v1 = np.stack([-1.5 * md, 3.0 * M_SIN60 * md], axis=-1)
    v2 = np.stack([-1.5 * md, -3.0 * M_SIN60 * md], axis=-1)
    edge0 = np.where((quad == 1)[:, None], v0, np.where((quad == 3)[:, None], v1, v2))
    edge1 = np.where((quad == 1)[:, None], v1, np.where((quad == 3)[:, None], v2, v0))
    return edge0, edge1


def _v2d_intersect(p0x, p0y, p1x, p1y, e0, e1):
    """2d line intersection of segment p0->p1 with line e0->e1."""
    s1x = p1x - p0x
    s1y = p1y - p0y
    s2x = e1[:, 0] - e0[:, 0]
    s2y = e1[:, 1] - e0[:, 1]
    denom = -s2x * s1y + s1x * s2y
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (s2x * (p0y - e0[:, 1]) - s2y * (p0x - e0[:, 0])) / denom
    t = np.where(np.isfinite(t), t, 0.0)
    return p0x + t * s1x, p0y + t * s1y


def _true_vertices_internal(h: np.ndarray):
    """Shared first stage of boundary construction: the 6 (5 for
    pentagons) TRUE topological corner vertices of each cell in radians,
    plus the substrate intermediates the distortion pass needs.  Returns
    (vlat, vlng [n,6] radians, nv, face_c, adj_res, pent, ciii, verts,
    vert_face, vert_coord, vert_overage)."""
    res = bits.get_resolution(h).astype(np.int64)
    pent = bits.is_pentagon(h)
    face_c, coord_c, _ = cell_to_faceijk(h)
    face_c, coord_s, adj_res = _substrate_center(face_c, coord_c, res)
    n = h.shape[0]

    nv = np.where(pent, 5, 6)
    # vertex coords on the substrate, shape (n, 6, 3); pentagon slot 5 unused
    ciii = is_class_iii(res)
    verts_tbl = np.where(ciii[:, None, None], _VERTS_CIII[None], _VERTS_CII[None])
    verts = coord_s[:, None, :] + verts_tbl  # (n,6,3)
    verts = verts - verts.min(axis=-1, keepdims=True)

    # flatten and overage-adjust each vertex (substrate grid)
    flat_coord = verts.reshape(-1, 3)
    flat_face = np.repeat(face_c, 6)
    flat_res = np.repeat(adj_res, 6)
    flat_pent = np.repeat(pent, 6)
    no_pl4 = np.zeros(n * 6, dtype=bool)
    f2, c2, ov = adjust_overage_class_ii(flat_face, flat_coord, flat_res, no_pl4, substrate=True)
    # pentagons: keep adjusting while new faces appear
    loop = flat_pent & (ov == NEW_FACE)
    while loop.any():
        f3, c3, ov3 = adjust_overage_class_ii(f2, c2, flat_res, no_pl4, substrate=True)
        f2 = np.where(loop, f3, f2)
        c2 = np.where(loop[:, None], c3, c2)
        newov = np.where(loop, ov3, ov)
        loop = loop & (ov3 == NEW_FACE)
        ov = newov
    vert_face = f2.reshape(n, 6)
    vert_coord = c2.reshape(n, 6, 3)
    vert_overage = ov.reshape(n, 6)

    # geo coords of the 6 (5) true vertices
    vx, vy = ijk.ijk_to_hex2d(vert_coord.reshape(-1, 3))
    vlat, vlng = hex2d_to_geo(vx, vy, vert_face.reshape(-1), np.repeat(adj_res, 6), True)
    vlat = vlat.reshape(n, 6)
    vlng = vlng.reshape(n, 6)
    return (
        vlat, vlng, nv, face_c, adj_res, pent, ciii, verts,
        vert_face, vert_coord, vert_overage,
    )


def cell_true_vertices(h: np.ndarray):
    """The topological corner vertices of each cell (the H3 vertex-mode
    corners, NOT the distortion-inserted boundary ring): (lats_deg,
    lngs_deg) of shape (n, 6) in ccw boundary order — pentagon rows use
    slots 0..4 — plus nv (5 or 6 per row)."""
    h = np.asarray(h, dtype=np.uint64)
    if h.shape[0] == 0:
        return np.empty((0, 6)), np.empty((0, 6)), np.zeros(0, dtype=np.int64)
    vlat, vlng, nv = _true_vertices_internal(h)[:3]
    return np.degrees(vlat), np.degrees(vlng), nv.astype(np.int64)


def get_icosahedron_faces(h: np.ndarray):
    """Icosahedron faces (0-19) each cell's area intersects (H3 v4
    getIcosahedronFaces; not exposed by the reference).  A cell touches
    the face its center decodes to plus every face any of its boundary
    corner vertices lands on after overage adjustment — exactly the face
    set the C implementation collects from its substrate boundary walk.
    Returns (rows, faces): jagged, sorted by (row, face), deduped."""
    h = np.asarray(h, dtype=np.uint64)
    n = h.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    (vlat, vlng, nv, face_c, _, pent, _, _, vert_face, _, _) = (
        _true_vertices_internal(h)
    )
    used = np.arange(6)[None, :] < nv[:, None]
    rows = np.concatenate([np.arange(n), np.repeat(np.arange(n), 6)[used.ravel()]])
    faces = np.concatenate([face_c, vert_face[used]]).astype(np.int64)
    if pent.any():
        # pentagon corners sit ON the icosahedron spoke edges (the cell
        # is centered on an icosa vertex), so overage assigns each
        # corner to ONE of its two adjacent faces and can miss some of
        # the 5 faces meeting there.  The 5 boundary-edge midpoints lie
        # strictly inside one face each: nearest-face-center over the
        # spherical midpoints recovers the full 5-face set.
        pi = np.nonzero(pent)[0]
        cl = np.cos(vlat[pi])
        P = np.stack(
            [cl * np.cos(vlng[pi]), cl * np.sin(vlng[pi]), np.sin(vlat[pi])],
            axis=-1,
        )  # (p, 6, 3) corner unit vectors (slots 0..4 used)
        nxt = (np.arange(6)[None, :] + 1) % nv[pi][:, None]
        M = P + np.take_along_axis(P, nxt[:, :, None], axis=1)
        from .constants import FACE_CENTER_POINT

        mid_face = np.argmax(np.einsum("ped,fd->pef", M, FACE_CENTER_POINT), axis=2)
        pused = np.arange(6)[None, :] < nv[pi][:, None]
        rows = np.concatenate([rows, np.repeat(pi, 6)[pused.ravel()]])
        faces = np.concatenate([faces, mid_face[pused].astype(np.int64)])
    comp = rows * np.int64(20) + faces
    uniq = np.unique(comp)
    return (uniq // 20).astype(np.int64), (uniq % 20).astype(np.int64)


def cell_boundary(h: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Boundary vertices of each cell.

    Returns (lats_deg, lngs_deg, offsets) where offsets has len(h)+1 entries
    and cell i's ccw vertex ring is ``lats[offsets[i]:offsets[i+1]]``.
    """
    h = np.asarray(h, dtype=np.uint64)
    n = h.shape[0]
    if n == 0:
        return np.empty(0), np.empty(0), np.zeros(1, dtype=np.int64)
    (
        vlat, vlng, nv, face_c, adj_res, pent, ciii, verts,
        vert_face, vert_coord, vert_overage,
    ) = _true_vertices_internal(h)

    # --- Class III / pentagon edge-crossing distortion vertices -------------
    # transition t (1..6) goes from vertex (t-1)%nv to vertex t%nv and may
    # insert an intersection point before the target vertex.
    inter_flag = np.zeros((n, 6), dtype=bool)
    inter_lat = np.zeros((n, 6))
    inter_lng = np.zeros((n, 6))

    max_dim = 2 * POW7[adj_res // 2]

    hexm = ~pent & ciii
    if hexm.any():
        for t in range(1, 7):
            cur = t % 6
            last = (t - 1) % 6
            prev_face = vert_face[:, last]
            prev_ov = vert_overage[:, last]
            cand = hexm & (vert_face[:, cur] != prev_face) & (prev_ov != FACE_EDGE)
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            # original (pre-overage) substrate coords on the center face
            o0 = verts[idx, last]
            o1 = verts[idx, cur]
            p0x, p0y = ijk.ijk_to_hex2d(o0)
            p1x, p1y = ijk.ijk_to_hex2d(o1)
            # the crossed icosa edge is the one between the center face and
            # whichever endpoint face is not the center face
            quad_cur = ADJACENT_FACE_DIR[face_c[idx], vert_face[idx, cur]]
            quad_last = ADJACENT_FACE_DIR[face_c[idx], vert_face[idx, last]]
            quad = np.where(quad_cur > 0, quad_cur, quad_last)
            quad = np.where(quad > 0, quad, 2)
            e0, e1 = _icosa_edge_for_quadrant(quad, max_dim[idx])
            ix, iy = _v2d_intersect(p0x, p0y, p1x, p1y, e0, e1)
            tol = 1e-10 * (3.0 * max_dim[idx].astype(np.float64))
            at_vertex = (
                (np.abs(ix - p0x) < tol) & (np.abs(iy - p0y) < tol)
            ) | ((np.abs(ix - p1x) < tol) & (np.abs(iy - p1y) < tol))
            use = ~at_vertex
            ilat, ilng = hex2d_to_geo(ix, iy, face_c[idx], adj_res[idx], True)
            sel = idx[use]
            inter_flag[sel, t - 1] = True
            inter_lat[sel, t - 1] = ilat[use]
            inter_lng[sel, t - 1] = ilng[use]

    pentm = pent & ciii
    if pentm.any():
        for t in range(1, 5):
            cur = t % 5
            last = t - 1
            cand = pentm & (vert_face[:, cur] != vert_face[:, last])
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            cur_face = vert_face[idx, cur]
            last_face = vert_face[idx, last]
            # re-express the current vertex on the last face's substrate grid
            d = ADJACENT_FACE_DIR[cur_face, last_face]
            okd = d > 0
            nf = FACE_NEIGHBOR_FACE[cur_face, d.clip(0)]
            rot = _FN_CCWROT[cur_face, d.clip(0)]
            trans = _FN_TRANS[cur_face, d.clip(0)]
            tmp = ijk.rotate60_ccw_n(vert_coord[idx, cur], rot)
            unit = POW7[adj_res[idx] // 2] * 3
            tmp = ijk.normalize(tmp + trans * unit[:, None])
            p0x, p0y = ijk.ijk_to_hex2d(vert_coord[idx, last])
            p1x, p1y = ijk.ijk_to_hex2d(tmp)
            quad = ADJACENT_FACE_DIR[nf, cur_face]
            quad = np.where(quad > 0, quad, 2)
            e0, e1 = _icosa_edge_for_quadrant(quad, max_dim[idx])
            ix, iy = _v2d_intersect(p0x, p0y, p1x, p1y, e0, e1)
            ilat, ilng = hex2d_to_geo(ix, iy, nf, adj_res[idx], True)
            sel = idx[okd & (nf == last_face)]
            use = okd & (nf == last_face)
            inter_flag[sel, t - 1] = True
            inter_lat[sel, t - 1] = ilat[use]
            inter_lng[sel, t - 1] = ilng[use]
        # closing edge v4 -> v0
        cand = pentm & (vert_face[:, 0] != vert_face[:, 4])
        if cand.any():
            idx = np.nonzero(cand)[0]
            cur_face = vert_face[idx, 0]
            last_face = vert_face[idx, 4]
            d = ADJACENT_FACE_DIR[cur_face, last_face]
            okd = d > 0
            nf = FACE_NEIGHBOR_FACE[cur_face, d.clip(0)]
            rot = _FN_CCWROT[cur_face, d.clip(0)]
            trans = _FN_TRANS[cur_face, d.clip(0)]
            tmp = ijk.rotate60_ccw_n(vert_coord[idx, 0], rot)
            unit = POW7[adj_res[idx] // 2] * 3
            tmp = ijk.normalize(tmp + trans * unit[:, None])
            p0x, p0y = ijk.ijk_to_hex2d(vert_coord[idx, 4])
            p1x, p1y = ijk.ijk_to_hex2d(tmp)
            quad = ADJACENT_FACE_DIR[nf, cur_face]
            quad = np.where(quad > 0, quad, 2)
            e0, e1 = _icosa_edge_for_quadrant(quad, max_dim[idx])
            ix, iy = _v2d_intersect(p0x, p0y, p1x, p1y, e0, e1)
            ilat, ilng = hex2d_to_geo(ix, iy, nf, adj_res[idx], True)
            use = okd & (nf == last_face)
            sel = idx[use]
            inter_flag[sel, 5] = True
            inter_lat[sel, 5] = ilat[use]
            inter_lng[sel, 5] = ilng[use]

    # --- assemble: v0, i01, v1, i12, ..., v5, i50 ---------------------------
    # slot layout per cell: 12 slots [v0, i1, v1, i2, v2, i3, v3, i4, v4, i5, v5, i6]
    slot_lat = np.zeros((n, 12))
    slot_lng = np.zeros((n, 12))
    slot_used = np.zeros((n, 12), dtype=bool)
    vi = np.arange(6)
    slot_lat[:, vi * 2] = vlat
    slot_lng[:, vi * 2] = vlng
    slot_used[:, vi * 2] = vi < nv[:, None]
    slot_lat[:, vi * 2 + 1] = inter_lat
    slot_lng[:, vi * 2 + 1] = inter_lng
    slot_used[:, vi * 2 + 1] = inter_flag

    counts = slot_used.sum(axis=1)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = slot_used.reshape(-1)
    lats = np.degrees(slot_lat.reshape(-1)[flat])
    lngs = np.degrees(slot_lng.reshape(-1)[flat])
    return lats, lngs, offsets


# face-neighbor tables needed above (import late to keep namespace tidy)
from .faceijk import FACE_NEIGHBOR_CCWROT as _FN_CCWROT  # noqa: E402
from .faceijk import FACE_NEIGHBOR_TRANSLATE as _FN_TRANS  # noqa: E402


# --- measures ---------------------------------------------------------------


def great_circle_distance_rads(lat1, lng1, lat2, lng2):
    """Haversine great-circle distance in radians."""
    sin_lat = np.sin((lat2 - lat1) * 0.5)
    sin_lng = np.sin((lng2 - lng1) * 0.5)
    a = sin_lat * sin_lat + np.cos(lat1) * np.cos(lat2) * sin_lng * sin_lng
    return 2.0 * np.arctan2(np.sqrt(a), np.sqrt(np.clip(1.0 - a, 0.0, 1.0)))


def _triangle_area_rads2(a, b, c):
    """Spherical triangle area from edge lengths (l'Huilier)."""
    s = 0.5 * (a + b + c)
    t = (
        np.tan(0.5 * s)
        * np.tan(0.5 * (s - a))
        * np.tan(0.5 * (s - b))
        * np.tan(0.5 * (s - c))
    )
    return 4.0 * np.arctan(np.sqrt(np.clip(t, 0.0, None)))


def cells_area_rads2(h: np.ndarray) -> np.ndarray:
    """Exact spherical area of each cell (triangulated about the center)."""
    h = np.asarray(h, dtype=np.uint64)
    lats, lngs, offsets = cell_boundary(h)
    lats = np.radians(lats)
    lngs = np.radians(lngs)
    from .faceijk import cell_to_latlng

    clat, clng = cell_to_latlng(h)
    clat = np.radians(clat)
    clng = np.radians(clng)
    n = len(h)
    counts = np.diff(offsets)
    cell_idx = np.repeat(np.arange(n), counts)
    # next vertex within each ring
    nxt = np.arange(len(lats)) + 1
    ring_end = offsets[1:][cell_idx] - 1
    at_end = np.arange(len(lats)) == ring_end
    nxt = np.where(at_end, offsets[:-1][cell_idx], nxt)
    a = great_circle_distance_rads(lats, lngs, lats[nxt], lngs[nxt])
    b = great_circle_distance_rads(lats[nxt], lngs[nxt], clat[cell_idx], clng[cell_idx])
    c = great_circle_distance_rads(clat[cell_idx], clng[cell_idx], lats, lngs)
    tri = _triangle_area_rads2(a, b, c)
    out = np.zeros(n)
    np.add.at(out, cell_idx, tri)
    return out


def cells_area_km2(h: np.ndarray) -> np.ndarray:
    return cells_area_rads2(h) * (EARTH_RADIUS_KM**2)


def cells_area_m2(h: np.ndarray) -> np.ndarray:
    return cells_area_rads2(h) * (EARTH_RADIUS_KM**2) * 1.0e6


def cells_bounds_arrays(h: np.ndarray, split_antimeridian: bool = False):
    """Per-cell bounding box (minx, miny, maxx, maxy) in degrees over the
    boundary vertices.  Default semantics match the reference's
    bounding_rect EXACTLY (crates/h3arrow/src/algorithm/bounding_rect.rs
    via geo: plain min/max, NO antimeridian handling — a transmeridian
    cell yields a near-global lng range, like the reference).  Pass
    ``split_antimeridian=True`` for the wraparound-aware variant that
    returns a crossing representation (minx > maxx) for transmeridian
    cells — a convenience the reference does not offer."""
    h = np.asarray(h, dtype=np.uint64)
    lats, lngs, offsets = cell_boundary(h)
    n = len(h)
    counts = np.diff(offsets)
    cell_idx = np.repeat(np.arange(n), counts)
    minx = np.full(n, np.inf)
    maxx = np.full(n, -np.inf)
    miny = np.full(n, np.inf)
    maxy = np.full(n, -np.inf)
    np.minimum.at(minx, cell_idx, lngs)
    np.maximum.at(maxx, cell_idx, lngs)
    np.minimum.at(miny, cell_idx, lats)
    np.maximum.at(maxy, cell_idx, lats)
    if split_antimeridian:
        # antimeridian-crossing cells: recompute lngs shifted into [0, 360)
        wide = (maxx - minx) > 180.0
        if wide.any():
            wsel = wide[cell_idx]
            widx = cell_idx[wsel]
            wl = np.mod(lngs[wsel], 360.0)
            minx[wide] = np.inf
            maxx[wide] = -np.inf
            np.minimum.at(minx, widx, wl)
            np.maximum.at(maxx, widx, wl)
            fix = wide & (minx > 180.0)
            minx[fix] -= 360.0
            fix2 = wide & (maxx > 180.0)
            maxx[fix2] -= 360.0
    return minx, miny, maxx, maxy
