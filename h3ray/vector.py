"""Vector operator surface: geometry <-> cells (reference-parity API).

Array-level functions mirroring ``h3ronpy.vector`` and the cell/edge/vertex
array ops (h3ronpy/python/h3ronpy/vector.py, src/vector.rs, src/array.rs),
plus the pa.Table batch kernels used from ``Dataset.map_batches``.

Everything operates on NumPy arrays / Arrow tables; geometry interchange is
WKB (large_binary), written and parsed by our own codec.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .h3core import bits, boundary, faceijk, polyfill, wkb
from .h3core.traversal import neighbor_rotations

# --- coordinates ------------------------------------------------------------


def coordinates_to_cells(lat, lng, res, radians: bool = False) -> np.ndarray:
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    if radians:
        lat = np.degrees(lat)
        lng = np.degrees(lng)
    return faceijk.latlng_to_cell(lat, lng, res)


def cells_to_coordinates(cells, radians: bool = False):
    lat, lng = faceijk.cell_to_latlng(np.asarray(cells, dtype=np.uint64))
    if radians:
        return np.radians(lat), np.radians(lng)
    return lat, lng


def cells_bounds(cells):
    """Global bbox tuple (minx, miny, maxx, maxy) of the whole array
    (reference: h3ronpy/src/vector.rs:88-99)."""
    cells = np.asarray(cells, dtype=np.uint64)
    if len(cells) == 0:
        return None
    minx, miny, maxx, maxy = boundary.cells_bounds_arrays(cells)
    return float(minx.min()), float(miny.min()), float(maxx.max()), float(maxy.max())


def cells_bounds_arrays(cells) -> pa.Table:
    minx, miny, maxx, maxy = boundary.cells_bounds_arrays(
        np.asarray(cells, dtype=np.uint64)
    )
    return pa.table({"minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy})


# --- cells -> WKB geometry --------------------------------------------------


def cells_to_wkb_polygons(cells, radians: bool = False, link_cells: bool = False):
    """Boundary polygon per cell as WKB (large_binary).  link_cells=True
    dissolves adjacent cells into merged multipolygons (order not preserved,
    like the reference, h3ronpy/python/h3ronpy/vector.py:59-66)."""
    cells = np.asarray(cells, dtype=np.uint64)
    lat, lng, off = boundary.cell_boundary(cells)
    if radians:
        lat = np.radians(lat)
        lng = np.radians(lng)
    if not link_cells:
        return wkb.dumps_ring_polygons_batch(lng, lat, off)
    # dissolve: drop shared edges, stitch remaining segments into rings
    return _dissolve_to_wkb(cells, lat, lng, off)


def _dissolve_to_wkb(cells, lat, lng, off):
    """Merge adjacent cells: shared edges (present twice, opposite direction)
    cancel; remaining directed edges are stitched into rings."""
    segs = {}
    n = len(cells)
    key = lambda la, lo: (round(la * 1e7), round(lo * 1e7))
    for i in range(n):
        ring_lat = lat[off[i]:off[i + 1]]
        ring_lng = lng[off[i]:off[i + 1]]
        m = len(ring_lat)
        for v in range(m):
            a = key(ring_lat[v], ring_lng[v])
            b = key(ring_lat[(v + 1) % m], ring_lng[(v + 1) % m])
            if (b, a) in segs:
                del segs[(b, a)]
            else:
                segs[(a, b)] = True
    nxt = {a: b for (a, b) in segs}
    rings = []
    while nxt:
        start, cur = next(iter(nxt.items()))
        ring = [start]
        del nxt[start]
        while cur != start and cur in nxt:
            ring.append(cur)
            nxt_cur = nxt.pop(cur)
            cur = nxt_cur
        ring.append(start)
        rings.append(
            np.array([[p[1] / 1e7, p[0] / 1e7] for p in ring], dtype=np.float64)
        )
    # classify rings: ccw shells, cw holes nested in their containing shell
    out = wkb.dumps_multipolygon(group_rings(rings))
    return pa.array([out], type=pa.large_binary())


def cells_to_wkb_points(cells, radians: bool = False):
    lat, lng = cells_to_coordinates(cells, radians=radians)
    return wkb.dumps_points_batch(np.asarray(lng), np.asarray(lat))


def vertexes_to_wkb_points(vertexes, radians: bool = False):
    """Vertex indexes -> point WKB: a vertex's position is the owner
    cell's TRUE corner of that number (h3lib vertexToLatLng semantics —
    vertex numbers index topological corners, never the Class III
    distortion points the assembled boundary ring interleaves)."""
    vx = np.asarray(vertexes, dtype=np.uint64)
    owner = vertex_owner(vx)
    vert_num = bits.get_reserved(vx).astype(np.int64)
    vlat, vlng, nv = boundary.cell_true_vertices(owner)
    rows = np.arange(len(vx))
    v = np.minimum(vert_num, nv - 1)
    lat, lng = vlat[rows, v], vlng[rows, v]
    if radians:
        lat, lng = np.radians(lat), np.radians(lng)
    return wkb.dumps_points_batch(lng, lat)


def directededges_to_wkb_linestrings(edges, radians: bool = False):
    """Edge -> shared-boundary linestring WKB (origin/destination shared
    vertices, including any distortion vertex).  Vectorized: one union
    lexsort finds per-edge shared vertices; a jagged batch writer emits the
    linestrings."""
    edges = np.asarray(edges, dtype=np.uint64)
    n = len(edges)
    if n == 0:
        return wkb.dumps_linestrings_jagged(
            np.empty(0), np.empty(0), np.zeros(1, dtype=np.int64)
        )
    o = directededge_origin(edges)
    d = directededge_destination(edges)
    lat_o, lng_o, off_o = boundary.cell_boundary(o)
    lat_d, lng_d, off_d = boundary.cell_boundary(d)
    ko = _pack_endpoints(lat_o, lng_o)
    kd = _pack_endpoints(lat_d, lng_d)
    eo = np.repeat(np.arange(n), np.diff(off_o))
    ed = np.repeat(np.arange(n), np.diff(off_d))
    edge_all = np.concatenate([eo, ed])
    key_all = np.concatenate([ko, kd])
    side_all = np.concatenate(
        [np.zeros(len(ko), np.int8), np.ones(len(kd), np.int8)]
    )
    pos_all = np.concatenate([np.arange(len(ko)), np.full(len(kd), -1)])
    order = np.lexsort((side_all, key_all, edge_all))
    e_s, k_s, s_s, p_s = (
        edge_all[order], key_all[order], side_all[order], pos_all[order]
    )
    same_next = np.zeros(len(e_s), dtype=bool)
    same_next[:-1] = (e_s[1:] == e_s[:-1]) & (k_s[1:] == k_s[:-1])
    # an origin vertex is shared iff a dest row with the same (edge, key)
    # sits adjacent after the sort (side breaks ties: origin first)
    shared_origin = (s_s == 0) & same_next
    opos = np.sort(p_s[shared_origin])  # back to ring order per edge
    se = eo[opos]
    counts = np.bincount(se, minlength=n)
    # fallback edges with no shared vertex: centroid segment
    fb = counts == 0
    if fb.any():
        la, lo = cells_to_coordinates(np.concatenate([o[fb], d[fb]]))
        nf = int(fb.sum())
        fb_lng = np.stack([lo[:nf], lo[nf:]], axis=1)
        fb_lat = np.stack([la[:nf], la[nf:]], axis=1)
        out_counts = np.where(fb, 2, counts)
        total = int(out_counts.sum())
        out_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(out_counts, out=out_off[1:])
        L = np.empty(total)
        A = np.empty(total)
        # scatter shared vertices
        scum = np.cumsum(counts) - counts
        wpos = np.arange(len(opos)) - scum[se]
        L[out_off[:-1][se] + wpos] = lng_o[opos]
        A[out_off[:-1][se] + wpos] = lat_o[opos]
        fidx = np.nonzero(fb)[0]
        L[out_off[:-1][fidx]] = fb_lng[:, 0]
        L[out_off[:-1][fidx] + 1] = fb_lng[:, 1]
        A[out_off[:-1][fidx]] = fb_lat[:, 0]
        A[out_off[:-1][fidx] + 1] = fb_lat[:, 1]
        return wkb.dumps_linestrings_jagged(L, A, out_off)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_off[1:])
    return wkb.dumps_linestrings_jagged(lng_o[opos], lat_o[opos], out_off)


def _shared_boundary(o, d) -> np.ndarray:
    lat_o, lng_o, off_o = boundary.cell_boundary(o)
    lat_d, lng_d, off_d = boundary.cell_boundary(d)
    ko = np.round(np.stack([lat_o, lng_o], axis=1) * 1e7).astype(np.int64)
    kd = np.round(np.stack([lat_d, lng_d], axis=1) * 1e7).astype(np.int64)
    kd_set = {tuple(x) for x in kd}
    shared = [i for i, x in enumerate(ko) if tuple(x) in kd_set]
    if not shared:
        # fallback: centroid segment
        la, lo = cells_to_coordinates(np.concatenate([o, d]))
        return np.stack([lo, la], axis=1)
    # keep ring order (shared vertices are consecutive on the ring)
    coords = np.stack([lng_o[shared], lat_o[shared]], axis=1)
    return coords


# --- directed edges / vertexes ----------------------------------------------

_U = np.uint64


def cells_to_directededges(cells) -> tuple[np.ndarray, np.ndarray]:
    """All directed edges originating at each cell; returns
    (origin_row_idx, edges)."""
    cells = np.asarray(cells, dtype=np.uint64)
    pent = bits.is_pentagon(cells)
    rows = []
    out = []
    for d in range(1, 7):
        keep = ~(pent & (d == 1))
        e = (cells & ~(_U(0xF) << _U(59)) & ~(_U(0x7) << _U(56))) | (
            _U(bits.MODE_DIRECTEDEDGE) << _U(59)
        ) | (_U(d) << _U(56))
        rows.append(np.nonzero(keep)[0])
        out.append(e[keep])
    rows = np.concatenate(rows)
    out = np.concatenate(out)
    order = np.argsort(rows, kind="stable")
    return rows[order], out[order]


def cells_to_directededge(origin, dest):
    """Directed edge FROM each origin TO its neighboring dest (H3 v4
    cellsToDirectedEdge; the reference exposes only parse/validate/
    origin-destination extraction).  Returns (edges, error): error
    follows areNeighborCells' contract (1 invalid, 2 res mismatch) plus
    3 for valid same-res pairs that are not neighbors; edges are 0
    wherever error != 0."""
    o = np.asarray(origin, dtype=np.uint64)
    d = np.asarray(dest, dtype=np.uint64)
    if o.shape != d.shape:
        raise ValueError("origin and dest must be the same length")
    n = len(o)
    out = np.zeros(n, dtype=np.uint64)
    err = np.zeros(n, dtype=np.int8)
    valid = bits.is_valid_cell(o) & bits.is_valid_cell(d)
    err[~valid] = 1
    res_o = bits.get_resolution(o).astype(np.int64)
    mismatch = valid & (res_o != bits.get_resolution(d).astype(np.int64))
    err[mismatch] = 2
    live = valid & ~mismatch & (o != d)
    direction = np.zeros(n, dtype=np.int64)
    pent = bits.is_pentagon(o)
    for r in np.unique(res_o[live]):
        sel = live & (res_o == r)
        osel, dsel = o[sel], d[sel]
        dir_sel = np.zeros(len(osel), dtype=np.int64)
        for k in range(1, 7):
            nb, _, perr = neighbor_rotations(osel, k)
            # K from a pentagon origin is the deleted subsequence (the
            # primitive substitutes IK there instead of erroring)
            ok = (perr == 0) & (nb == dsel) & ~(pent[sel] & (k == 1))
            dir_sel[ok & (dir_sel == 0)] = k
        direction[sel] = dir_sel
    hit = direction > 0
    err[valid & ~mismatch & ~hit] = np.int8(3)
    out[hit] = (
        (o[hit] & ~(_U(0xF) << _U(59)) & ~(_U(0x7) << _U(56)))
        | (_U(bits.MODE_DIRECTEDEDGE) << _U(59))
        | (direction[hit].astype(np.uint64) << _U(56))
    )
    return out, err


def get_res0_cells() -> np.ndarray:
    """All 122 resolution-0 cells (H3 v4 getRes0Cells), base-cell order."""
    res0 = bits.init_cell(0, bits.NUM_BASE_CELLS)
    return bits.set_base_cell(
        res0, np.arange(bits.NUM_BASE_CELLS, dtype=np.uint64)
    )


def get_pentagons(res: int) -> np.ndarray:
    """The 12 pentagon cells of a resolution (H3 v4 getPentagons): the
    all-center-children descendants of the 12 pentagon base cells."""
    if not 0 <= res <= 15:
        raise ValueError("res must be within 0..15")
    p0 = get_res0_cells()
    p0 = p0[bits.is_pentagon(p0)]
    cells = bits.set_resolution(p0, np.full(len(p0), res, dtype=np.uint64))
    for r in range(1, res + 1):
        cells = bits.set_index_digit(
            cells, r, np.zeros(len(cells), dtype=np.uint64)
        )
    return cells


def directededge_origin(edges) -> np.ndarray:
    edges = np.asarray(edges, dtype=np.uint64)
    return (edges & ~(_U(0xF) << _U(59)) & ~(_U(0x7) << _U(56))) | (
        _U(bits.MODE_CELL) << _U(59)
    )


def directededge_destination(edges) -> np.ndarray:
    edges = np.asarray(edges, dtype=np.uint64)
    o = directededge_origin(edges)
    direction = bits.get_reserved(edges).astype(np.int64)
    res = bits.get_resolution(o)
    out = np.zeros(len(edges), dtype=np.uint64)
    for r in np.unique(res):
        m = res == r
        nbr, _, err = neighbor_rotations(o[m], direction[m])
        out[m] = np.where(err == 0, nbr, np.uint64(0))
    return out


def directededges_length(edges, unit: str = "km") -> np.ndarray:
    edges = np.asarray(edges, dtype=np.uint64)
    o = directededge_origin(edges)
    d = directededge_destination(edges)
    out = np.zeros(len(edges))
    for i in range(len(edges)):
        coords = _shared_boundary(o[i : i + 1], d[i : i + 1])
        if len(coords) < 2:
            continue
        la = np.radians(coords[:, 1])
        lo = np.radians(coords[:, 0])
        seg = boundary.great_circle_distance_rads(la[:-1], lo[:-1], la[1:], lo[1:])
        out[i] = seg.sum()
    if unit == "rads":
        return out
    if unit == "km":
        return out * boundary.EARTH_RADIUS_KM
    if unit == "m":
        return out * boundary.EARTH_RADIUS_KM * 1000.0
    raise ValueError(unit)


def vertex_owner(vertexes) -> np.ndarray:
    vx = np.asarray(vertexes, dtype=np.uint64)
    return (vx & ~(_U(0xF) << _U(59)) & ~(_U(0x7) << _U(56))) | (
        _U(bits.MODE_CELL) << _U(59)
    )


def cells_to_vertexes(cells):
    """Canonical vertex indexes of each cell: (rows, vertexes) jagged
    pair, ccw corner order (H3 v4 cellToVertexes; see h3core/vertex.py
    for the canonical-owner construction)."""
    from .h3core import vertex as vertex_mod

    return vertex_mod.cells_to_vertexes(np.asarray(cells, dtype=np.uint64))


def cell_to_vertex(cells, vertex_num: int) -> np.ndarray:
    """Canonical vertex ``vertex_num`` of each cell (0 when out of
    range, e.g. 5 on a pentagon)."""
    from .h3core import vertex as vertex_mod

    return vertex_mod.cell_to_vertex(np.asarray(cells, dtype=np.uint64), vertex_num)


# --- WKB -> cells (polyfill) ------------------------------------------------


def wkb_to_cells(
    wkb_array,
    resolution: int,
    containment_mode: str = "containscentroid",
    compact: bool = False,
    flatten: bool = False,
):
    """WKB geometries -> cells; returns (geometry_row_idx, cells) pairs
    (the flattened form; list assembly is the caller's choice).

    Mirror of h3ronpy.vector.wkb_to_cells (vector.py:105-133)."""
    rows = []
    cells = []
    for i, item in enumerate(wkb_array):
        if item is None:
            continue
        data = item.as_py() if hasattr(item, "as_py") else item
        if data is None:
            continue
        geom = wkb.loads(data)
        out = polyfill.geometry_to_cells(
            geom, resolution, containment_mode, compact=compact
        )
        rows.append(np.full(len(out), i, dtype=np.int64))
        cells.append(out)
    if not rows:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    return np.concatenate(rows), np.concatenate(cells)


def geometry_to_cells(
    geom, resolution: int, containment_mode: str = "containscentroid",
    compact: bool = False,
) -> np.ndarray:
    """Single __geo_interface__ object or internal dict -> cells."""
    if not isinstance(geom, dict) or "type" not in geom:
        geom = wkb.geo_interface_to_geom(geom)
    elif "coordinates" in geom or "geometries" in geom:
        geom = wkb.geo_interface_to_geom(geom)
    return polyfill.geometry_to_cells(geom, resolution, containment_mode, compact)


# --- batch kernels ----------------------------------------------------------


def wkb_to_cells_kernel(
    batch: pa.Table,
    geometry_col: str = "geometry",
    resolution: int = 9,
    containment_mode: str = "containscentroid",
    compact: bool = False,
    cell_col: str = "cell",
) -> pa.Table:
    """Explode kernel: every non-geometry column repeated per produced cell
    (mirror of geodataframe_to_cells, pandas/vector.py:74-135)."""
    rows, cells = wkb_to_cells(
        batch.column(geometry_col).combine_chunks(),
        resolution,
        containment_mode,
        compact,
    )
    out = batch.drop_columns([geometry_col]).take(pa.array(rows))
    return out.append_column(cell_col, pa.array(cells))


# --- string ops for all index kinds (cells handled in kernels.py) ----------


def vertexes_to_string(vertexes) -> np.ndarray:
    return bits.to_hex_strings(np.asarray(vertexes, dtype=np.uint64))


def directededges_to_string(edges) -> np.ndarray:
    return bits.to_hex_strings(np.asarray(edges, dtype=np.uint64))


def _parse_indexes(strings, checker, what: str, set_failing_to_invalid: bool):
    """Shared hex/decimal index parse with reference null semantics: a
    None row is null output, never a failure; only a real parse/validity
    failure on a NON-NULL row raises (crates/h3arrow string.rs:171,182)."""
    lst = list(strings)
    vals, ok = bits.parse_hex_strings(lst)
    ok &= checker(vals)
    nulls = np.array([s is None for s in lst], dtype=bool)
    if not set_failing_to_invalid and (~ok & ~nulls).any():
        raise ValueError(f"non-parsable {what}")
    return vals, ok


def vertexes_parse(strings, set_failing_to_invalid: bool = False):
    return _parse_indexes(
        strings, bits.is_valid_vertex, "VertexIndex", set_failing_to_invalid
    )


def directededges_parse(strings, set_failing_to_invalid: bool = False):
    return _parse_indexes(
        strings, bits.is_valid_directededge, "DirectedEdgeIndex",
        set_failing_to_invalid,
    )


def polyfill_weight_kernel(
    batch: pa.Table, geometry_col: str = "geometry", resolution: int = 9,
    weight_col: str = "pf_weight",
) -> pa.Table:
    """Append an estimated polyfill output size per geometry: bbox area
    over the mean cell area at ``resolution`` (cells-at-res count from the
    spec formula 2 + 120*7^res), floored at 1; null geometries weigh 0.
    A cheap O(vertices) WKB scan — the complexity probe behind
    :func:`polyfill_skew_routed` (SURVEY §4 skew row)."""
    import math

    n_cells = 2 + 120 * 7 ** resolution
    mean_cell_km2 = 4.0 * math.pi * 6371.0072 ** 2 / n_cells
    col = batch.column(geometry_col)
    out = np.zeros(len(batch), dtype=np.int64)
    for i in range(len(batch)):
        item = col[i].as_py()
        if item is None:
            continue
        g = wkb.loads(item)
        lo_x = lo_y = np.inf
        hi_x = hi_y = -np.inf
        stack = [g]
        while stack:
            q = stack.pop()
            if "parts" in q:  # Multi*/GeometryCollection, possibly nested
                stack.extend(q["parts"])
                continue
            for ring in q.get("rings") or (
                [q["coords"]] if "coords" in q else []
            ):
                r = np.asarray(ring, dtype=np.float64)
                lo_x = min(lo_x, r[:, 0].min()); hi_x = max(hi_x, r[:, 0].max())
                lo_y = min(lo_y, r[:, 1].min()); hi_y = max(hi_y, r[:, 1].max())
        if not np.isfinite(lo_x):
            out[i] = 1
            continue
        midlat = math.radians((lo_y + hi_y) / 2.0)
        km2 = ((hi_y - lo_y) * 111.2) * ((hi_x - lo_x) * 111.2 * max(
            0.05, math.cos(midlat)))
        out[i] = max(1, int(km2 / mean_cell_km2))
    return batch.append_column(weight_col, pa.array(out))


def polyfill_skew_routed(
    ds,
    resolution: int = 9,
    containment_mode: str = "containscentroid",
    compact: bool = False,
    geometry_col: str = "geometry",
    cell_col: str = "cell",
    tiers: tuple = ((4_096, 256), (65_536, 8), (None, 1)),
    concurrency=(1, 8),
    split_cells: int | None = None,
    split_grid: int = 4,
):
    """Skew-aware distributed polyfill (SURVEY §4 skew row): a cheap bbox
    probe (:func:`polyfill_weight_kernel`) estimates each geometry's
    output cell count, and geometries route into complexity TIERS — each
    tier a `map_batches(PolyfillActor)` stage whose ``batch_size`` shrinks
    with estimated weight (default: <=4k cells -> 256/batch, <=64k -> 8,
    bigger -> 1 per task).  A continent-sized polygon therefore stalls
    exactly ONE task instead of a 256-geometry batch; per-task work is
    roughly equalized, which is what bounds stragglers.  The floor is the
    single heaviest geometry — irreducible without geometry splitting,
    which the reference also lacks (one rayon task per geometry,
    crates/h3arrow/src/algorithm/from_geo.rs:123-151).

    With ``split_cells`` set, geometries estimated above it are SPLIT:
    their candidate extent partitions into ``split_grid**2`` half-open
    cell-center-ownership windows (`polyfill.polygon_split_windows`) and
    each window polyfills as an independent task — so ONE continent-sized
    polygon fans out across the cluster instead of being one task's
    irreducible floor.  The window partition is exact (every result cell
    owned by exactly one window; pytest parity over all 4 containment
    modes).  Splitting requires ``compact=False`` (compaction needs the
    whole per-geometry cell set) and applies to (Multi)Polygons; other
    geometry types fall back to one unsplit task.

    ``ds`` is consumed once per tier (the routing is a filter, not an
    exchange) — pass a parquet-backed/checkpointed dataset when upstream
    is expensive.  Returns the exploded cells Dataset (non-geometry
    columns carried through, like ``wkb_to_cells_kernel``)."""
    if split_cells is not None and compact:
        raise ValueError(
            "split_cells requires compact=False: compaction needs every "
            "geometry's full cell set in one place"
        )
    last_hi = tiers[-1][0]
    if last_hi is not None and (split_cells is None or split_cells > last_hi):
        # every tier filter requires w < hi, so weights above the last
        # finite bound (and below split_cells) would match NO path and
        # silently vanish from the output
        raise ValueError(
            f"tiers must end with (None, batch_size), or split_cells "
            f"(={split_cells}) must be <= the last tier bound ({last_hi}); "
            "otherwise geometries above the bound are silently dropped"
        )
    est = ds.map_batches(
        lambda b: polyfill_weight_kernel(b, geometry_col, resolution),
        batch_format="pyarrow",
    )

    def tier_filter(lo, hi):
        def k(batch: pa.Table) -> pa.Table:
            w = batch.column("pf_weight").to_numpy(zero_copy_only=False)
            m = w >= lo if hi is None else (w >= lo) & (w < hi)
            if split_cells is not None:
                m &= w < split_cells
            return batch.filter(pa.array(m)).drop_columns(["pf_weight"])

        return k

    outs = []
    lo = 0
    for hi, bs in tiers:
        part = est.map_batches(tier_filter(lo, hi), batch_format="pyarrow")
        kwargs = dict(
            fn_constructor_kwargs={
                "resolution": resolution,
                "containment_mode": containment_mode,
                "compact": compact,
                "geometry_col": geometry_col,
                "cell_col": cell_col,
            },
            batch_format="pyarrow",
            batch_size=bs,
            concurrency=concurrency,
        )
        outs.append(part.map_batches(PolyfillActor, **kwargs))
        if hi is None:
            break
        lo = hi
        if split_cells is not None and lo >= split_cells:
            break

    if split_cells is not None:
        def split_rows(batch: pa.Table) -> pa.Table:
            w = batch.column("pf_weight").to_numpy(zero_copy_only=False)
            heavy = batch.filter(pa.array(w >= split_cells)).drop_columns(
                ["pf_weight"]
            )
            idx, wx0, wy0, wx1, wy1 = [], [], [], [], []
            col = heavy.column(geometry_col)
            for i in range(heavy.num_rows):
                item = col[i].as_py()
                g = wkb.loads(item) if item is not None else None
                wins = (
                    polyfill.polygon_split_windows(g, split_grid)
                    if g is not None and g.get("type") in (
                        "Polygon", "MultiPolygon")
                    else []
                ) or [(None, None, None, None)]  # unsplittable: 1 full task
                for wn in wins:
                    idx.append(i)
                    wx0.append(wn[0]); wy0.append(wn[1])
                    wx1.append(wn[2]); wy1.append(wn[3])
            out = heavy.take(pa.array(np.asarray(idx, dtype=np.int64)))
            for name, vals in (("__wx0", wx0), ("__wy0", wy0),
                               ("__wx1", wx1), ("__wy1", wy1)):
                out = out.append_column(
                    name, pa.array(vals, type=pa.float64())
                )
            return out

        def window_polyfill(batch: pa.Table) -> pa.Table:
            col = batch.column(geometry_col)
            rows, cells = [], []
            for i in range(batch.num_rows):
                item = col[i].as_py()
                if item is None:
                    continue
                g = wkb.loads(item)
                x0 = batch.column("__wx0")[i].as_py()
                if x0 is None:
                    out = polyfill.geometry_to_cells(
                        g, resolution, containment_mode, compact=False
                    )
                else:
                    win = (x0, batch.column("__wy0")[i].as_py(),
                           batch.column("__wx1")[i].as_py(),
                           batch.column("__wy1")[i].as_py())
                    out = polyfill.polygon_to_cells(
                        g, resolution, containment_mode, clip_window=win
                    )
                rows.append(np.full(len(out), i, dtype=np.int64))
                cells.append(out)
            if rows:
                ridx = np.concatenate(rows)
                cvals = np.concatenate(cells)
            else:
                ridx = np.empty(0, dtype=np.int64)
                cvals = np.empty(0, dtype=np.uint64)
            out = batch.drop_columns(
                [geometry_col, "__wx0", "__wy0", "__wx1", "__wy1"]
            ).take(pa.array(ridx))
            return out.append_column(cell_col, pa.array(cvals))

        # window_polyfill is a plain function: tasks, no pool needed;
        # an int cap is honored, an autoscaling tuple is actor-only
        heavy_kwargs = dict(batch_format="pyarrow", batch_size=1)
        if isinstance(concurrency, int):
            heavy_kwargs["concurrency"] = concurrency
        outs.append(
            est.map_batches(split_rows, batch_format="pyarrow")
            .map_batches(window_polyfill, **heavy_kwargs)
        )

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


class PolyfillActor:
    """Actor-pool polyfill stage for skewed geometry workloads:

        ds.map_batches(PolyfillActor,
                       fn_constructor_kwargs={"resolution": 9},
                       concurrency=N, batch_size=64)

    Per-geometry cost varies by orders of magnitude (a continent vs a
    parcel), so small batches + an actor pool keep stragglers bounded; any
    per-worker setup (mode tables, scratch buffers) happens once here."""

    def __init__(self, resolution: int = 9, containment_mode: str = "containscentroid",
                 compact: bool = False, geometry_col: str = "geometry",
                 cell_col: str = "cell"):
        self.resolution = resolution
        self.containment_mode = containment_mode
        self.compact = compact
        self.geometry_col = geometry_col
        self.cell_col = cell_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return wkb_to_cells_kernel(
            batch,
            geometry_col=self.geometry_col,
            resolution=self.resolution,
            containment_mode=self.containment_mode,
            compact=self.compact,
            cell_col=self.cell_col,
        )


# --- distributed dissolve ----------------------------------------------------


def _pack_endpoints(lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    """Quantize (lat, lng) degrees to 1e-7 and pack into one uint64."""
    la = np.round(lat * 1e7).astype(np.int64) + (1 << 31)
    lo = np.round(lng * 1e7).astype(np.int64) + (1 << 31)
    return (la.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)


def _unpack_endpoint(p: int) -> tuple[int, int]:
    return (int(p >> 32) - (1 << 31), int(p & 0xFFFFFFFF) - (1 << 31))


def _cancel_packed(a: np.ndarray, b: np.ndarray):
    """Drop directed segments whose reverse is also present (vectorized:
    shared edges appear exactly twice with opposite direction, so the
    undirected key occurs twice; boundary segments occur once)."""
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    order = np.lexsort((hi, lo))
    lo_s, hi_s = lo[order], hi[order]
    same_prev = np.r_[False, (lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1])]
    same_next = np.r_[same_prev[1:], False]
    keep_sorted = ~(same_prev | same_next)
    keep = np.zeros(len(a), dtype=bool)
    keep[order] = keep_sorted
    return a[keep], b[keep]


def _boundary_segments(cells: np.ndarray):
    """Directed boundary segments of a cell set with shared (opposite
    direction) segments cancelled; returns packed (a, b) uint64 arrays."""
    lat, lng, off = boundary.cell_boundary(cells)
    pts = _pack_endpoints(lat, lng)
    counts = np.diff(off)
    nxt = np.arange(len(pts)) + 1
    cell_idx = np.repeat(np.arange(len(cells)), counts)
    ring_end = off[1:][cell_idx] - 1
    at_end = np.arange(len(pts)) == ring_end
    nxt = np.where(at_end, off[:-1][cell_idx], nxt)
    return _cancel_packed(pts, pts[nxt])


def _dedup_tagged_cells(tags: np.ndarray, cells: np.ndarray):
    """Distinct (tag, cell) rows sorted by tag — the shared preamble of
    every `_boundary_segments_tagged` caller (duplicate cells within a
    tag would break pairwise edge cancellation)."""
    order = np.lexsort((cells, tags))
    t, c = tags[order], cells[order]
    keep = np.ones(len(t), dtype=bool)
    keep[1:] = (t[1:] != t[:-1]) | (c[1:] != c[:-1])
    return t[keep], c[keep]


def _boundary_segments_tagged(cells: np.ndarray, tags: np.ndarray):
    """Directed boundary segments of MANY disjoint cell sets in ONE
    vectorized pass: ``cells[i]`` belongs to the set labelled ``tags[i]``;
    shared-segment cancellation happens WITHIN each tag only (callers
    dedupe (tag, cell) rows first via `_dedup_tagged_cells`).  Returns
    (a, b, seg_tags) — per-tag results equal `_boundary_segments` run on
    each tag's cells separately.  This is the segmented kernel behind the
    bucketed dissolve (all parents of a hash bucket in one task, no
    per-parent Python group)."""
    lat, lng, off = boundary.cell_boundary(cells)
    pts = _pack_endpoints(lat, lng)
    counts = np.diff(off)
    nxt = np.arange(len(pts)) + 1
    cell_idx = np.repeat(np.arange(len(cells)), counts)
    ring_end = off[1:][cell_idx] - 1
    at_end = np.arange(len(pts)) == ring_end
    nxt = np.where(at_end, off[:-1][cell_idx], nxt)
    a, b = pts, pts[nxt]
    seg_tag = tags[cell_idx]
    # within-tag cancellation: undirected key occurs twice inside one tag
    # for shared edges, once for boundary edges
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    order = np.lexsort((hi, lo, seg_tag))
    t_s, lo_s, hi_s = seg_tag[order], lo[order], hi[order]
    same_prev = np.r_[
        False,
        (t_s[1:] == t_s[:-1]) & (lo_s[1:] == lo_s[:-1]) & (hi_s[1:] == hi_s[:-1]),
    ]
    same_next = np.r_[same_prev[1:], False]
    keep_sorted = ~(same_prev | same_next)
    keep = np.zeros(len(a), dtype=bool)
    keep[order] = keep_sorted
    return a[keep], b[keep], seg_tag[keep]


def _ring_signed_area(r: np.ndarray) -> float:
    """Planar shoelace area of a closed (first==last) lng/lat ring: positive
    for ccw (H3 boundary winding = outer shells), negative for holes."""
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _point_in_ring(pt, ring: np.ndarray) -> bool:
    """Ray-casting point-in-ring (planar lng/lat)."""
    x, y = float(pt[0]), float(pt[1])
    xs, ys = ring[:-1, 0], ring[:-1, 1]
    xe, ye = ring[1:, 0], ring[1:, 1]
    cond = (ys > y) != (ye > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = xs + (y - ys) * (xe - xs) / (ye - ys)
    return int((cond & (x < xint)).sum()) % 2 == 1


def group_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Classify stitched rings into polygons with holes: ccw rings are
    shells, cw rings are holes assigned to the smallest containing shell
    (matching h3o dissolve semantics, crates/h3arrow/src/array/to_geo.rs:
    218-229).  Planar classification — valid away from the antimeridian,
    like the rest of the planar dissolve."""
    shells = []
    holes = []
    for r in rings:
        (shells if _ring_signed_area(r) > 0 else holes).append(r)
    polys = [[s] for s in shells]
    for h in holes:
        pt = h[0]
        best, best_area = None, None
        for idx, s in enumerate(shells):
            if _point_in_ring(pt, s):
                ar = abs(_ring_signed_area(s))
                if best is None or ar < best_area:
                    best, best_area = idx, ar
        if best is not None:
            polys[best].append(h)
        else:  # orphan (shouldn't happen for valid cancellations)
            polys.append([h[::-1].copy()])
    return polys


def _stitch_rings(segs) -> list[np.ndarray]:
    nxt = {a: b for (a, b) in segs}
    rings = []
    while nxt:
        start, cur = next(iter(nxt.items()))
        ring = [start]
        del nxt[start]
        while cur != start and cur in nxt:
            ring.append(cur)
            cur = nxt.pop(cur)
        ring.append(start)
        pts = [_unpack_endpoint(p) for p in ring]
        rings.append(
            np.array([[p[1] / 1e7, p[0] / 1e7] for p in pts], dtype=np.float64)
        )
    return rings


def dissolve_cells_dataset(ds, parent_res: int = 3, cell_col: str = "cell"):
    """Distributed link_cells dissolve: cells key by their res-``parent_res``
    ancestor and shuffle on ``hash(parent) % 64`` — each hash bucket cancels
    ALL its parents' interior shared edges in one vectorized pass
    (`_boundary_segments_tagged`; one Ray group per bucket, not per parent);
    the surviving directed segments (including parent-border seams, which
    appear once per side in opposite directions) cancel again in a final
    bounded pass and stitch into merged rings.

    Segment cancellation is associative, so the result equals a
    single-process dissolve exactly.  Returns the merged MultiPolygon WKB.
    """
    from .h3core import bits as bits_mod

    from .functions._util import bucket_single

    def keyed(batch: pa.Table) -> pa.Table:
        cells = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        cells = np.unique(cells)
        res = bits_mod.get_resolution(cells).astype(np.int64)
        pr = np.minimum(res, parent_res).astype(np.uint64)
        parent = bits_mod.cell_to_parent(cells, pr)
        return pa.table(
            {
                "bucket": pa.array(bucket_single(parent.view(np.int64), 64)),
                "parent": pa.array(parent),
                cell_col: pa.array(cells),
            }
        )

    def group_segments(batch: pa.Table) -> pa.Table:
        # ALL parents of the hash bucket in one vectorized pass: boundary
        # segments with per-parent cancellation (one Ray group per BUCKET,
        # not per parent — parent cardinality grows with the cell set)
        parents = batch.column("parent").to_numpy(zero_copy_only=False)
        cells = batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        p, c = _dedup_tagged_cells(parents, cells)
        a, b, _ = _boundary_segments_tagged(c, p.astype(np.int64))
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    def final_stitch(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        a, b = _cancel_packed(a, b)
        rings = _stitch_rings(list(zip(a.tolist(), b.tolist())))
        out = wkb.dumps_multipolygon(group_rings(rings))
        return pa.table({"wkb": pa.array([out], type=pa.large_binary())})

    # the surviving-segment set is perimeter-bounded, so the final cancel +
    # stitch runs as ONE Ray task over the repartitioned stream — no
    # driver-side to_arrow_refs materialization
    seg_ds = (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(group_segments, batch_format="pyarrow")
    )
    rows = seg_ds.repartition(1).map_batches(
        final_stitch, batch_format="pyarrow", batch_size=None
    ).take(1)
    if not rows:
        return wkb.dumps_multipolygon([])
    return rows[0]["wkb"]


# --- centroid / convex hull / concave hull (reference Rust-only algorithms,
# crates/h3arrow/src/algorithm/centroid.rs:6-43, convex_hull.rs:9-31,
# concave_hull.rs:9-31; exposed here as first-class operators) -----------------


def cells_centroid(cells: np.ndarray):
    """Centroid of the cell set as the unweighted mean of cell centers —
    the reference's MultiPoint centroid semantics (centroid.rs:13-23:
    CellIndexArray::centroid = MultiPoint(to_points).centroid()).
    Returns (lat, lng) or None for an empty set."""
    cells = np.asarray(cells, dtype=np.uint64)
    cells = cells[bits.is_valid_cell(cells)]
    if len(cells) == 0:
        return None
    lat, lng = faceijk.cell_to_latlng(cells)
    return float(lat.mean()), float(lng.mean())


def _convex_hull_points(pts: np.ndarray) -> np.ndarray:
    """Planar convex hull (Andrew monotone chain) of (x, y) points with a
    vectorized Akl-Toussaint prune: points strictly inside the quadrilateral
    of the four axis-extreme points cannot be on the hull and are dropped
    before the O(h) chain loop, so the Python loop runs over survivors
    only.  Returns hull vertices in counter-clockwise order (geo's
    convex_hull orientation), closed (first == last)."""
    pts = np.unique(pts, axis=0)  # row-sorts lexicographically AND dedups
    if len(pts) <= 2:
        return np.vstack([pts, pts[:1]])
    # Akl-Toussaint: drop points strictly inside the extreme quadrilateral
    corners = np.array(
        [
            pts[np.argmin(pts[:, 0])], pts[np.argmin(pts[:, 1])],
            pts[np.argmax(pts[:, 0])], pts[np.argmax(pts[:, 1])],
        ]
    )
    inside = np.ones(len(pts), dtype=bool)
    for i in range(4):
        a, b = corners[i], corners[(i + 1) % 4]
        cross = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (
            pts[:, 0] - a[0]
        )
        inside &= cross > 1e-30
    pts = pts[~inside]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(tuple(p))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = lower[:-1] + upper[:-1]
    ring.append(ring[0])
    return np.array(ring, dtype=np.float64)


def _cells_hull_points(cells: np.ndarray) -> np.ndarray:
    """Validity-filtered convex hull vertices (open ring, ccw) of a cell
    set's boundary points — the single point pipeline shared by the local
    AND distributed hull operators, so the invalid-id policy and the hull
    construction can never diverge between them."""
    cells = np.asarray(cells, dtype=np.uint64)
    cells = cells[bits.is_valid_cell(cells)]
    if len(cells) == 0:
        return np.zeros((0, 2), dtype=np.float64)
    lat, lng, _ = boundary.cell_boundary(cells)
    return _convex_hull_points(np.stack([lng, lat], axis=1))[:-1]


def cells_convex_hull(cells: np.ndarray) -> bytes:
    """Convex hull polygon (WKB) of the cell set's boundary vertices — the
    reference's multipolygon convex hull (convex_hull.rs:9-16).  Planar
    lng/lat, like the rest of the planar geometry family.  Invalid cell
    ids are dropped (consistent with cells_centroid) — one sentinel id
    must not poison the hull with garbage vertices.  Empty input yields an
    empty MultiPolygon."""
    hull = _cells_hull_points(cells)
    if len(hull) == 0:
        return wkb.dumps_multipolygon([])
    return wkb.dumps_multipolygon([[np.vstack([hull, hull[:1]])]])


def cells_concave_hull(cells: np.ndarray, concavity: float = 2.0) -> bytes:
    """Concave hull polygon (WKB) of the cell set's boundary vertices:
    starts from the convex hull and recursively splits any edge longer
    than ``concavity`` x the local point spacing toward the nearest
    interior point (the classic edge-refinement construction; same
    operator family as the reference's geo::ConcaveHull
    (concave_hull.rs:9-16), not vertex-identical to the geo crate's
    algorithm — the reference never exposes it to Python, so there is no
    binding-level contract to match).  The point spacing is the median
    CELL boundary edge length, so smaller ``concavity`` digs deeper
    (splits more edges) and a large one degenerates to the convex hull.
    Invalid cell ids are dropped (consistent with cells_centroid)."""
    cells = np.asarray(cells, dtype=np.uint64)
    cells = cells[bits.is_valid_cell(cells)]
    lat, lng, off = boundary.cell_boundary(cells)
    pts = np.unique(np.stack([lng, lat], axis=1), axis=0)
    hull = _convex_hull_points(pts)[:-1]
    if len(hull) < 3 or len(pts) <= len(hull):
        return wkb.dumps_multipolygon([[np.vstack([hull, hull[:1]])]])
    # local point spacing = median cell boundary edge length (consecutive
    # boundary vertices within each cell ring)
    ring_id = np.repeat(np.arange(len(cells)), np.diff(off))
    nxt = np.arange(len(lat)) + 1
    at_end = nxt >= off[1:][ring_id]
    nxt = np.where(at_end, off[:-1][ring_id], nxt)
    seg = np.stack([lng[nxt] - lng, lat[nxt] - lat], axis=1)
    spacing = float(np.median(np.linalg.norm(seg, axis=1)))
    ring = [tuple(p) for p in hull]
    for _ in range(8):  # bounded refinement passes
        changed = False
        out = []
        n = len(ring)
        used = {tuple(p) for p in ring}
        for i in range(n):
            a = np.array(ring[i])
            b = np.array(ring[(i + 1) % n])
            out.append(tuple(a))
            seg = b - a
            ln = float(np.linalg.norm(seg))
            if ln <= concavity * spacing:
                continue
            mid = (a + b) / 2.0
            d2 = ((pts - mid) ** 2).sum(axis=1)
            order = np.argsort(d2)
            for j in order[: min(8, len(order))]:
                c = tuple(pts[j])
                if c in used:
                    continue
                # candidate must shorten the boundary locally (dig inward)
                if (
                    np.linalg.norm(pts[j] - a) < ln
                    and np.linalg.norm(pts[j] - b) < ln
                ):
                    out.append(c)
                    used.add(c)
                    changed = True
                    break
        ring = out
        if not changed:
            break
    return wkb.dumps_multipolygon([[np.array(ring + [ring[0]], dtype=np.float64)]])


def convex_hull_dataset(ds, cell_col: str = "cell") -> bytes:
    """Distributed convex hull: per-block hulls (each block reduces its
    boundary points to its own hull — hull-of-hulls is exact because the
    hull operator is associative), then one bounded final hull over the
    concatenated block hulls inside Ray.  Returns the merged polygon WKB."""
    import ray

    def block_hull(batch: pa.Table) -> pa.Table:
        cells = np.unique(
            batch.column(cell_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        hull = _cells_hull_points(cells)  # shared pipeline with the local op
        return pa.table({"x": pa.array(hull[:, 0]), "y": pa.array(hull[:, 1])})

    def final(batch: pa.Table) -> pa.Table:
        pts = np.stack(
            [
                batch.column("x").to_numpy(zero_copy_only=False),
                batch.column("y").to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        if len(pts) == 0:
            out = wkb.dumps_multipolygon([])
        else:
            out = wkb.dumps_multipolygon([[_convex_hull_points(pts)]])
        return pa.table({"wkb": pa.array([out], type=pa.large_binary())})

    rows = (
        ds.map_batches(block_hull, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
        .take(1)
    )
    if not rows:  # empty dataset (no blocks at all)
        return wkb.dumps_multipolygon([])
    return rows[0]["wkb"]
