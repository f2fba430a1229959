"""Polygon / line / point -> cells (the reference's flagship wkb_to_cells).

Per-geometry pipeline (mirror of crates/h3arrow/src/array/from_geo.rs:306-386
re-expressed with vectorized candidate generation):

  1. candidates: every cell at the target resolution whose center could be
     relevant — the geometry bbox buffered by the cell circumradius, sampled
     at sub-inradius spacing (guaranteed superset of every containment mode).
  2. vectorized predicates over the candidates:
       - centroid-in-polygon (ray casting over all rings; holes via even-odd),
       - boundary-vertex-in-polygon and cell-edge x ring-edge intersection
         for the ContainsBoundary / IntersectsBoundary / Covers modes.
  3. sort + dedup per geometry, optional per-geometry compact.

Containment modes follow h3ronpy/src/vector.rs:31-61 exactly:
  containscentroid | containsboundary | intersectsboundary | covers
"""

from __future__ import annotations

import numpy as np

from . import bits, hierarchy
from .boundary import cell_boundary
from .faceijk import cell_to_latlng, latlng_to_cell

MODES = ("containscentroid", "containsboundary", "intersectsboundary", "covers")


from enum import Enum


class ContainmentMode(Enum):
    """Mirror of the reference's enum (h3ronpy/src/vector.rs:62-69);
    every mode-taking function accepts the enum or its string form."""

    ContainsCentroid = "containscentroid"
    ContainsBoundary = "containsboundary"
    IntersectsBoundary = "intersectsboundary"
    Covers = "covers"


def normalize_mode(containment_mode) -> str:
    mode = getattr(containment_mode, "value", containment_mode)
    mode = str(mode).lower().replace("_", "")
    if mode not in MODES:
        raise ValueError(f"unknown containment mode {containment_mode}")
    return mode

# conservative per-resolution cell metrics in degrees (global worst cases)
_MIN_INRADIUS_DEG = {
    0: 4.0, 1: 1.5, 2: 0.55, 3: 0.2, 4: 0.075, 5: 0.028,
    6: 0.0105, 7: 0.004, 8: 0.0015, 9: 0.00055, 10: 0.00021,
    11: 0.00008, 12: 0.00003, 13: 0.0000115, 14: 0.0000043, 15: 0.0000016,
}
_MAX_CIRCUMRADIUS_DEG = {
    0: 12.0, 1: 4.5, 2: 1.7, 3: 0.65, 4: 0.25, 5: 0.095,
    6: 0.036, 7: 0.0137, 8: 0.0052, 9: 0.002, 10: 0.00075,
    11: 0.00029, 12: 0.00011, 13: 0.000042, 14: 0.000016, 15: 0.0000061,
}


def _rings_of(geom: dict) -> list[np.ndarray]:
    if geom["type"] == "Polygon":
        return list(geom["rings"])
    if geom["type"] == "MultiPolygon":
        out = []
        for p in geom["parts"]:
            out.extend(p["rings"])
        return out
    raise ValueError(geom["type"])


def points_in_rings(lng: np.ndarray, lat: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd ray casting over all rings (holes handled naturally)."""
    inside = np.zeros(len(lng), dtype=bool)
    for ring in rings:
        x = ring[:, 0]
        y = ring[:, 1]
        x0, y0 = x[:-1], y[:-1]
        x1, y1 = x[1:], y[1:]
        # chunk candidates to bound memory: (M, E) broadcasting
        M = len(lng)
        step = max(1, 4_000_000 // max(1, len(x0)))
        for s in range(0, M, step):
            e = min(M, s + step)
            py = lat[s:e, None]
            px = lng[s:e, None]
            cond = (y0[None, :] > py) != (y1[None, :] > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xin = x0[None, :] + (py - y0[None, :]) / (y1[None, :] - y0[None, :]) * (
                    x1[None, :] - x0[None, :]
                )
            crossed = cond & (px < xin)
            inside[s:e] ^= (crossed.sum(axis=1) % 2).astype(bool)
    return inside


def _segments_intersect(p0, p1, q0, q1) -> np.ndarray:
    """Proper + improper segment intersection, vectorized over pairs."""

    def orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    d1 = orient(q0[:, 0], q0[:, 1], q1[:, 0], q1[:, 1], p0[:, 0], p0[:, 1])
    d2 = orient(q0[:, 0], q0[:, 1], q1[:, 0], q1[:, 1], p1[:, 0], p1[:, 1])
    d3 = orient(p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1], q0[:, 0], q0[:, 1])
    d4 = orient(p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1], q1[:, 0], q1[:, 1])
    return ((d1 * d2) <= 0) & ((d3 * d4) <= 0)


def _bbox_cover_cells(minx, miny, maxx, maxy, res: int) -> np.ndarray:
    """Superset of cells whose center lies within the buffered bbox."""
    buf = _MAX_CIRCUMRADIUS_DEG[res] * 1.05
    step = _MIN_INRADIUS_DEG[res] * 0.9
    la0 = max(-89.999, miny - buf)
    la1 = min(89.999, maxy + buf)
    # the longitude buffer must widen by 1/cos at the HIGHEST latitude the
    # bbox reaches — also when it spans the equator (taking 0 there would
    # under-buffer the high-latitude edge and break the superset guarantee)
    lat_extreme = max(abs(la0), abs(la1))
    coslat = max(0.05, np.cos(np.radians(lat_extreme)))
    lo0 = minx - buf / coslat
    lo1 = maxx + buf / coslat
    lats = np.arange(la0, la1 + step, step)
    lngs = np.arange(lo0, lo1 + step / coslat, step / coslat)
    if len(lats) * len(lngs) == 0:
        return np.empty(0, dtype=np.uint64)
    glat = np.repeat(lats, len(lngs))
    glng = np.tile(lngs, len(lats))
    return np.unique(latlng_to_cell(glat, glng, res))


def _shifted_rings_bbox(geom: dict):
    """Shared ring/shift/bbox derivation of polygon_to_cells and
    polygon_split_windows — ONE copy so a split window computed by one is
    always in the frame the other tests against."""
    rings = [np.asarray(r, dtype=np.float64) for r in _rings_of(geom)]
    rings = [r for r in rings if len(r) >= 4]
    if not rings:
        return rings, False, 0.0, 0.0, 0.0, 0.0
    allpts = np.vstack(rings)
    minx, miny = allpts.min(axis=0)
    maxx, maxy = allpts.max(axis=0)
    # antimeridian-crossing polygons (reference fixed transmeridian handling
    # in 0.20.1, h3ronpy/CHANGES.rst): work in a shifted frame where
    # negative longitudes map to lng+360, so the ring is contiguous
    shifted = (maxx - minx) > 180.0
    if shifted:
        rings = [
            np.stack([np.where(r[:, 0] < 0, r[:, 0] + 360.0, r[:, 0]), r[:, 1]], axis=1)
            for r in rings
        ]
        allpts = np.vstack(rings)
        minx, miny = allpts.min(axis=0)
        maxx, maxy = allpts.max(axis=0)
    return rings, shifted, float(minx), float(miny), float(maxx), float(maxy)


def polygon_split_windows(geom: dict, grid: int) -> list:
    """Split a polygon's candidate-cell extent into ``grid x grid``
    half-open windows (in the polygon's antimeridian-shifted frame) that
    PARTITION the buffered bbox by cell-center ownership (the layout
    depends only on the ring bbox, not on the target resolution): running
    ``polygon_to_cells(geom, res, mode, clip_window=w)`` over every window
    and concatenating yields EXACTLY the unsplit result, with no cell
    found twice (each center belongs to one half-open window).  The
    scale-out device for continent-sized polygons: each window is an
    independent task whose cost is proportional to its candidate count.
    Outer windows extend to +-inf so the buffer zone is always owned."""
    rings, _, minx, miny, maxx, maxy = _shifted_rings_bbox(geom)
    if not rings:
        return []
    xs = np.linspace(minx, maxx, grid + 1)
    ys = np.linspace(miny, maxy, grid + 1)
    xs[0], xs[-1] = -np.inf, np.inf
    ys[0], ys[-1] = -np.inf, np.inf
    return [
        (float(xs[i]), float(ys[j]), float(xs[i + 1]), float(ys[j + 1]))
        for i in range(grid)
        for j in range(grid)
    ]


def polygon_to_cells(
    geom: dict, res: int, containment_mode="containscentroid",
    clip_window=None,
) -> np.ndarray:
    """Polygon -> cells in one of 4 containment modes.  With
    ``clip_window`` (an (x0, y0, x1, y1) half-open window from
    :func:`polygon_split_windows`, in the shifted frame) only candidate
    cells whose CENTER lies in the window are tested — the per-task unit
    of a split heavy-polygon polyfill; results over a window partition
    concatenate to the exact unsplit result."""
    mode = normalize_mode(containment_mode)
    rings, shifted, minx, miny, maxx, maxy = _shifted_rings_bbox(geom)
    if not rings:
        return np.empty(0, dtype=np.uint64)
    allpts = np.vstack(rings)
    if clip_window is not None:
        wx0, wy0, wx1, wy1 = clip_window
        # shrink the LATTICE extent to the window (plus nothing: the
        # lattice's own buffer re-expands it), keep ownership half-open
        minx, miny = max(minx, wx0), max(miny, wy0)
        maxx, maxy = min(maxx, wx1), min(maxy, wy1)
        if minx > maxx or miny > maxy:
            return np.empty(0, dtype=np.uint64)
        minx = max(minx, -360.0); maxx = min(maxx, 540.0)
        miny = max(miny, -90.0); maxy = min(maxy, 90.0)
    cand = _bbox_cover_cells(minx, miny, maxx, maxy, res)
    if len(cand) == 0:
        return cand
    clat, clng = cell_to_latlng(cand)
    if shifted:
        clng = np.where(clng < 0, clng + 360.0, clng)
    if clip_window is not None:
        own = (clng >= wx0) & (clng < wx1) & (clat >= wy0) & (clat < wy1)
        cand, clat, clng = cand[own], clat[own], clng[own]
        if len(cand) == 0:
            return cand
    centroid_in = points_in_rings(clng, clat, rings)

    if mode == "containscentroid":
        return np.sort(cand[centroid_in])

    # boundary-aware modes need the cell boundary vertices
    blat, blng, off = cell_boundary(cand)
    if shifted:
        blng = np.where(blng < 0, blng + 360.0, blng)
    counts = np.diff(off)
    cell_idx = np.repeat(np.arange(len(cand)), counts)
    vert_in = points_in_rings(blng, blat, rings)
    n_in = np.zeros(len(cand), dtype=np.int64)
    np.add.at(n_in, cell_idx, vert_in.astype(np.int64))
    all_verts_in = n_in == counts
    any_vert_in = n_in > 0

    # cell edges x ring edges intersection.  This runs for EVERY candidate
    # cell: a ring can cut a notch through a cell whose vertices (and
    # centroid) all remain inside the polygon, so no vertex-based prefilter
    # is sound — the crossing test itself is the arbiter.
    # build cell edge segments
    nxt = np.arange(len(blat)) + 1
    ring_end = off[1:][cell_idx] - 1
    at_end = np.arange(len(blat)) == ring_end
    nxt = np.where(at_end, off[:-1][cell_idx], nxt)
    p0 = np.stack([blng, blat], axis=1)
    p1 = np.stack([blng[nxt], blat[nxt]], axis=1)
    edge_cell = cell_idx
    crosses = np.zeros(len(cand), dtype=bool)
    for ring in rings:
        q0r = ring[:-1]
        q1r = ring[1:]
        E = len(q0r)
        step = max(1, 2_000_000 // max(1, E))
        for s in range(0, len(p0), step):
            e = min(len(p0), s + step)
            pp0 = np.repeat(p0[s:e], E, axis=0)
            pp1 = np.repeat(p1[s:e], E, axis=0)
            qq0 = np.tile(q0r, (e - s, 1))
            qq1 = np.tile(q1r, (e - s, 1))
            hit = _segments_intersect(pp0, pp1, qq0, qq1)
            hit = hit.reshape(e - s, E).any(axis=1)
            crosses_idx = edge_cell[s:e][hit]
            crosses[crosses_idx] = True

    if mode == "containsboundary":
        # "every cell whose boundaries are entirely within the polygon"
        # (reference h3ronpy/src/vector.rs:44): all boundary vertices in,
        # no ring crossing.  No centroid condition — a hole smaller than
        # the cell sitting on the centroid must NOT exclude the cell.
        return np.sort(cand[all_verts_in & ~crosses])
    # intersectsboundary: the cell BOUNDARY touches the polygon — a vertex
    # inside it or an edge crossing a ring (reference vector.rs:53-57).  A
    # cell merely covering a tiny interior polygon has no boundary contact
    # and is excluded here; that case belongs to covers (vector.rs:58-60).
    intersects = any_vert_in | crosses
    if mode == "covers":
        # ... plus coverage without boundary contact: the polygon sits
        # inside one cell — detected via the cell centroid being inside
        # the polygon or a polygon vertex encoding into the cell
        vcells = latlng_to_cell(allpts[:, 1], allpts[:, 0], res)
        cover_hits = np.isin(cand, vcells)
        intersects |= centroid_in | cover_hits
    return np.sort(cand[intersects])


def line_to_cells(geom: dict, res: int) -> np.ndarray:
    """Trace a linestring: sample each segment at sub-inradius spacing and
    encode (matches the reference's plotter semantics of covering every cell
    the line passes through at centroid granularity)."""
    coords = np.asarray(geom["coords"], dtype=np.float64)
    if len(coords) < 2:
        return np.empty(0, dtype=np.uint64)
    step = _MIN_INRADIUS_DEG[res] * 0.45
    p0 = coords[:-1]
    p1 = coords[1:]
    seg = p1 - p0
    length = np.hypot(seg[:, 0], seg[:, 1])
    nsteps = np.maximum(1, np.ceil(length / step).astype(np.int64))
    # jagged-vectorized sampling: every segment's fractional positions in
    # one flat array (no per-segment Python loop)
    counts = nsteps + 1
    total = int(counts.sum())
    seg_of = np.repeat(np.arange(len(p0)), counts)
    t_idx = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    frac = t_idx / nsteps[seg_of]
    allp = p0[seg_of] + frac[:, None] * seg[seg_of]
    cells = latlng_to_cell(allp[:, 1], allp[:, 0], res)
    # keep cells whose boundary the line actually crosses: sampled densely
    # enough that consecutive samples are in the same or adjacent cells
    return np.unique(cells)


def geometry_to_cells(
    geom: dict, res: int, containment_mode: str = "containscentroid",
    compact: bool = False,
) -> np.ndarray:
    t = geom["type"]
    if t == "Point":
        out = latlng_to_cell(geom["coords"][:, 1], geom["coords"][:, 0], res)
    elif t == "MultiPoint":
        pts = np.vstack([p["coords"] for p in geom["parts"]])
        out = np.unique(latlng_to_cell(pts[:, 1], pts[:, 0], res))
    elif t == "LineString":
        out = line_to_cells(geom, res)
    elif t == "MultiLineString":
        out = np.unique(
            np.concatenate([line_to_cells(p, res) for p in geom["parts"]])
            if geom["parts"]
            else np.empty(0, dtype=np.uint64)
        )
    elif t in ("Polygon", "MultiPolygon"):
        out = polygon_to_cells(geom, res, containment_mode)
    elif t == "GeometryCollection":
        parts = [
            geometry_to_cells(p, res, containment_mode) for p in geom["parts"]
        ]
        out = np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
    else:
        raise ValueError(t)
    out = np.unique(out)
    if compact and len(out):
        out = hierarchy.compact(out)
    return out
