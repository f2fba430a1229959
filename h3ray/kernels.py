"""Arrow batch kernels: pa.Table -> pa.Table wrappers over the h3core math.

These are the functions handed to ``Dataset.map_batches(fn,
batch_format="pyarrow", zero_copy_batch=True)``.  Each kernel pulls the
needed columns out of the batch as NumPy (zero-copy for fixed-width types),
runs the vectorized h3core math, and appends/replaces columns.  No Python
per-row loops.

The operator surface mirrors h3ronpy's module-level functions
(h3ronpy/python/h3ronpy/__init__.py, vector.py); the reference wraps each
op per-array, we wrap each op per-batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .h3core import bits, boundary, faceijk, hierarchy, traversal

DEFAULT_CELL_COLUMN_NAME = "cell"


def _col(batch: pa.Table, name: str) -> np.ndarray:
    """Column -> numpy (zero-copy for non-null fixed width)."""
    return batch.column(name).combine_chunks().to_numpy(zero_copy_only=False)


def _u64(batch: pa.Table, name: str) -> np.ndarray:
    return _col(batch, name).astype(np.uint64, copy=False)


def _append(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    return batch.append_column(name, arr)


# --- coordinates <-> cells --------------------------------------------------


def coordinates_to_cells(
    batch: pa.Table,
    lat_col: str = "lat",
    lng_col: str = "lng",
    res: int = 9,
    cell_col: str = DEFAULT_CELL_COLUMN_NAME,
) -> pa.Table:
    """Mirror of h3ronpy.vector.coordinates_to_cells (vector.py:18-37)."""
    lat = _col(batch, lat_col)
    lng = _col(batch, lng_col)
    cells = faceijk.latlng_to_cell(lat, lng, res)
    return _append(batch, cell_col, cells)


def cells_to_coordinates(
    batch: pa.Table, cell_col: str = DEFAULT_CELL_COLUMN_NAME
) -> pa.Table:
    """Mirror of h3ronpy.vector.cells_to_coordinates (vector.py:11-15)."""
    cells = _u64(batch, cell_col)
    lat, lng = faceijk.cell_to_latlng(cells)
    batch = _append(batch, "lat", lat)
    return _append(batch, "lng", lng)


# --- scalar cell ops --------------------------------------------------------


def cells_resolution(batch: pa.Table, cell_col: str = DEFAULT_CELL_COLUMN_NAME) -> pa.Table:
    res = bits.get_resolution(_u64(batch, cell_col))
    return _append(batch, "resolution", res)


def cells_parent(
    batch: pa.Table, parent_res: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME,
    out_col: str = "parent",
) -> pa.Table:
    cells = _u64(batch, cell_col)
    return _append(batch, out_col, bits.cell_to_parent(cells, np.uint64(parent_res)))


def cells_valid(
    batch: pa.Table, cell_col: str = DEFAULT_CELL_COLUMN_NAME, booleanarray: bool = True
) -> pa.Table:
    cells = _u64(batch, cell_col)
    ok = bits.is_valid_cell(cells)
    if booleanarray:
        return _append(batch, "valid", ok)
    out = pa.array(cells, mask=~ok)
    if "cell_validated" in batch.column_names:
        batch = batch.drop_columns(["cell_validated"])
    return batch.append_column("cell_validated", out)


def cells_to_string(batch: pa.Table, cell_col: str = DEFAULT_CELL_COLUMN_NAME) -> pa.Table:
    cells = _u64(batch, cell_col)
    s = bits.to_hex_strings(cells)
    return _append(batch, "cell_str", pa.array(s.tolist(), type=pa.large_string()))


# number forms the vectorized coordinate path handles via Arrow cast; other
# Python-float()-parsable spellings ("inf", "1_0", ...) go to the scalar
# fallback so semantics match float()/int() exactly
_FLOAT_RE = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"
_INT_RE = r"^[+-]?[0-9]+$"


def cells_parse(
    batch: pa.Table, str_col: str, set_failing_to_invalid: bool = False,
    cell_col: str = DEFAULT_CELL_COLUMN_NAME,
) -> pa.Table:
    """Parse hex / decimal / "lng,lat,res" strings (reference:
    crates/h3arrow/src/algorithm/string.rs:136-194).

    Fully vectorized: jagged hex digits via bits.parse_hex_u64, the
    coordinate form via Arrow split + cast; only rows using exotic Python
    number spellings fall back to the scalar parser."""
    col = batch.column(str_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
    filled = pc.fill_null(col, "")
    trimmed = pc.utf8_trim_whitespace(filled)
    vals = np.zeros(n, dtype=np.uint64)
    ok = np.zeros(n, dtype=bool)

    hexish = pc.match_substring_regex(
        trimmed, r"^[0-9a-fA-F]+$"
    ).to_numpy(zero_copy_only=False) & ~nulls
    if hexish.any():
        from .functions._strkern import utf8_view

        stripped = pc.utf8_ltrim(trimmed, "0")
        data, off = utf8_view(stripped)
        hvals, hok = bits.parse_hex_u64(data, off)
        allzero = np.diff(off) == 0  # "000" -> value 0, valid parse
        vals[hexish] = hvals[hexish]
        ok[hexish] = (hok | allzero)[hexish]
    # decimal form: pure-digit strings that overflowed the 16-hex-digit
    # parse (reference accepts u64 decimal cell ids); <=19 digits always
    # fit u64 -> vectorized cast, 20 digits may overflow -> scalar
    dec = ~ok & ~nulls & pc.match_substring_regex(
        trimmed, r"^[0-9]+$"
    ).to_numpy(zero_copy_only=False)
    if dec.any():
        stripped0 = pc.utf8_ltrim(trimmed, "0")
        slen = pc.binary_length(stripped0).to_numpy(zero_copy_only=False)
        easy = dec & (slen >= 17) & (slen <= 19)
        if easy.any():
            eidx = np.nonzero(easy)[0]
            vals[eidx] = (
                stripped0.take(pa.array(eidx))
                .cast(pa.uint64())
                .to_numpy(zero_copy_only=False)
            )
            ok[eidx] = True
        hard = dec & (slen == 20)
        for i in np.nonzero(hard)[0].tolist():
            try:
                vals[i] = np.uint64(int(trimmed[int(i)].as_py(), 10))
                ok[i] = True
            except (ValueError, OverflowError):
                pass
    # exotic int() spellings (signs, 0x prefix, unicode digits): scalar
    # parser on just those rows for exact parity
    raw_len = pc.binary_length(filled).to_numpy(zero_copy_only=False)
    exotic = ~ok & ~nulls & (raw_len > 0)
    exotic &= (
        pc.match_substring_regex(trimmed, r"^([+-]|0[xX])").to_numpy(zero_copy_only=False)
        | pc.match_substring(trimmed, "_").to_numpy(zero_copy_only=False)
        | (
            pc.utf8_length(filled).to_numpy(zero_copy_only=False) != raw_len
        )
    )
    if exotic.any():
        eidx = np.nonzero(exotic)[0]
        evals, eok = bits.parse_hex_strings(
            [filled[int(i)].as_py() for i in eidx]
        )
        vals[eidx] = evals
        ok[eidx] = eok
    # validate parsed integers as cells
    ok &= bits.is_valid_cell(vals)

    # coordinate form: "x,y,res" or "x;y;res" (x=lng, y=lat)
    todo = ~ok & ~nulls & (raw_len > 0)
    if todo.any():
        parts = pc.split_pattern(pc.replace_substring(filled, ";", ","), ",")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        plen = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        cand = todo & (plen == 3)
        if cand.any():
            poff = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            flat = parts.values
            cidx = np.nonzero(cand)[0]
            base = poff[cidx]
            p = [
                pc.utf8_trim_whitespace(flat.take(pa.array(base + j)))
                for j in range(3)
            ]
            good = (
                pc.match_substring_regex(p[0], _FLOAT_RE).to_numpy(zero_copy_only=False)
                & pc.match_substring_regex(p[1], _FLOAT_RE).to_numpy(zero_copy_only=False)
                & pc.match_substring_regex(p[2], _INT_RE).to_numpy(zero_copy_only=False)
            )
            if good.any():
                g = pa.array(np.nonzero(good)[0])
                lng_v = p[0].take(g).cast(pa.float64()).to_numpy(zero_copy_only=False)
                lat_v = p[1].take(g).cast(pa.float64()).to_numpy(zero_copy_only=False)
                res_v = p[2].take(g).cast(pa.int64()).to_numpy(zero_copy_only=False)
                in_range = (res_v >= 0) & (res_v <= 15)
                rows = cidx[good][in_range]
                if len(rows):
                    vals[rows] = faceijk.latlng_to_cell(
                        lat_v[in_range], lng_v[in_range], res_v[in_range]
                    )
                    ok[rows] = True
            # exotic spellings ("inf", "1_0", hex floats...): exact scalar
            # semantics on the (rare) remaining candidates
            rest = cidx[~good]
            if len(rest):
                lats, lngs, ress, rrows = [], [], [], []
                for i in rest.tolist():
                    ps = [x.strip() for x in filled[i].as_py().replace(";", ",").split(",")]
                    try:
                        lng_s, lat_s, res_s = float(ps[0]), float(ps[1]), int(ps[2])
                    except ValueError:
                        continue
                    if 0 <= res_s <= 15:
                        lngs.append(lng_s)
                        lats.append(lat_s)
                        ress.append(res_s)
                        rrows.append(i)
                if rrows:
                    vals[rrows] = faceijk.latlng_to_cell(
                        np.array(lats), np.array(lngs), np.array(ress)
                    )
                    ok[rrows] = True
    # null inputs stay null without raising (reference null semantics)
    if not set_failing_to_invalid and not (ok | nulls).all():
        bad_idx = np.nonzero(~ok & ~nulls)[0][:3]
        bad = [filled[int(i)].as_py() for i in bad_idx]
        raise ValueError(f"non-parsable CellIndex: {bad}")
    out = pa.array(vals, mask=~ok)
    if cell_col in batch.column_names:
        batch = batch.drop_columns([cell_col])
    return batch.append_column(cell_col, out)


def cells_area(
    batch: pa.Table, unit: str = "km2", cell_col: str = DEFAULT_CELL_COLUMN_NAME
) -> pa.Table:
    cells = _u64(batch, cell_col)
    if unit == "km2":
        a = boundary.cells_area_km2(cells)
    elif unit == "m2":
        a = boundary.cells_area_m2(cells)
    else:
        a = boundary.cells_area_rads2(cells)
    return _append(batch, f"area_{unit}", a)


def cells_bounds_arrays(batch: pa.Table, cell_col: str = DEFAULT_CELL_COLUMN_NAME) -> pa.Table:
    cells = _u64(batch, cell_col)
    minx, miny, maxx, maxy = boundary.cells_bounds_arrays(cells)
    for n, v in (("minx", minx), ("miny", miny), ("maxx", maxx), ("maxy", maxy)):
        batch = _append(batch, n, v)
    return batch


# --- hierarchy --------------------------------------------------------------


def change_resolution(
    batch: pa.Table, out_res: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME
) -> pa.Table:
    """Row-count-changing kernel: sibling columns are exploded via take
    (mirror of the reference's explode, pandas/vector.py:113-135)."""
    cells = _u64(batch, cell_col)
    res = bits.get_resolution(cells).astype(np.int64)
    up_mask = res >= out_res
    out_cells = []
    take_idx = []
    if up_mask.any():
        out_cells.append(bits.cell_to_parent(cells[up_mask], np.uint64(out_res)))
        take_idx.append(np.nonzero(up_mask)[0])
    if (~up_mask).any():
        rows = np.nonzero(~up_mask)[0]
        ch, parent_idx = hierarchy.cell_to_children(cells[~up_mask], out_res)
        out_cells.append(ch)
        take_idx.append(rows[parent_idx])
    new_cells = np.concatenate(out_cells) if out_cells else cells[:0]
    idx = np.concatenate(take_idx) if take_idx else np.empty(0, dtype=np.int64)
    rest = batch.drop_columns([cell_col])
    if rest.num_columns == 0:
        return pa.table({cell_col: pa.array(new_cells)})
    out = rest.take(pa.array(idx))
    return out.append_column(cell_col, pa.array(new_cells))


def grid_disk(
    batch: pa.Table, k: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME,
    flatten: bool = True,
) -> pa.Table:
    """Disk membership rows: each input row repeated per disk member with
    ``disk_cell`` (+``k`` distance) columns (flattened form of
    h3ronpy grid_disk_distances, src/op/neighbor.rs:37-51)."""
    cells = _u64(batch, cell_col)
    rows, disk, dist = traversal.grid_disk_distances(cells, k)
    out = batch.take(pa.array(rows))
    out = out.append_column("disk_cell", pa.array(disk))
    return out.append_column("k", pa.array(dist.astype(np.uint32)))


def grid_ring(
    batch: pa.Table, k_min: int, k_max: int,
    cell_col: str = DEFAULT_CELL_COLUMN_NAME,
) -> pa.Table:
    """Ring membership rows, k_min <= k <= k_max: each input row repeated
    per ring member with ``ring_cell`` (+``k``) columns (flattened form of
    h3ronpy grid_ring_distances, src/op/neighbor.rs:110-120)."""
    cells = _u64(batch, cell_col)
    rows, ring, dist = traversal.grid_ring_distances(cells, k_min, k_max)
    out = batch.take(pa.array(rows))
    out = out.append_column("ring_cell", pa.array(ring))
    return out.append_column("k", pa.array(dist.astype(np.uint32)))


def compact_kernel(batch: pa.Table, cell_col: str = DEFAULT_CELL_COLUMN_NAME,
                   mixed_resolutions: bool = True) -> pa.Table:
    """Batch-local compact over the cell column only (other columns dropped;
    compact is a set operation).  Used per-group in the distributed
    compact."""
    cells = np.unique(_u64(batch, cell_col))
    out = hierarchy.compact(cells, mixed_resolutions=mixed_resolutions)
    return pa.table({cell_col: pa.array(out)})


def uncompact_kernel(batch: pa.Table, res: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME) -> pa.Table:
    cells = _u64(batch, cell_col)
    keep = bits.get_resolution(cells).astype(np.int64) <= res
    rows = np.nonzero(keep)[0]
    ch, parent_idx = hierarchy.cell_to_children(cells[keep], res)
    rest = batch.drop_columns([cell_col])
    if rest.num_columns == 0:
        return pa.table({cell_col: pa.array(ch)})
    out = rest.take(pa.array(rows[parent_idx]))
    return out.append_column(cell_col, pa.array(ch))


def cell_to_child_pos(
    batch: pa.Table, parent_res: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME,
    out_col: str = "child_pos",
) -> pa.Table:
    """H3 v4 cellToChildPos (beyond the reference surface — h3ronpy
    exposes no childPos ops): rank of each cell among all descendants of
    its parent_res ancestor, in cellToChildren order.  The stable child
    ordering makes (ancestor, child_pos) a natural shard key.  Appends
    {out_col: int64, out_col+'_ok': bool} (ok False: res < parent_res or
    invalid digit path)."""
    cells = _u64(batch, cell_col)
    pos, ok = bits.cell_to_child_pos(cells, parent_res)
    batch = _append(batch, out_col, pa.array(pos))
    return _append(batch, out_col + "_ok", pa.array(ok))


def child_pos_to_cell(
    batch: pa.Table, child_res: int, parent_col: str = DEFAULT_CELL_COLUMN_NAME,
    pos_col: str = "child_pos", out_col: str = "child",
) -> pa.Table:
    """H3 v4 childPosToCell: the pos-th descendant at child_res of each
    parent, inverse of :func:`cell_to_child_pos`.  Appends
    {out_col: uint64, out_col+'_ok': bool} (ok False: child_res < parent
    res or pos outside [0, children_count))."""
    parents = _u64(batch, parent_col)
    pos = _col(batch, pos_col).astype(np.int64)
    cell, ok = bits.child_pos_to_cell(parents, pos, child_res)
    batch = _append(batch, out_col, pa.array(cell))
    return _append(batch, out_col + "_ok", pa.array(ok))


def grid_disk_aggregate_k_partial(
    batch: pa.Table, k: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME
) -> pa.Table:
    """Partial stage of grid_disk_aggregate_k (reference:
    h3ronpy/src/op/neighbor.rs:123-152): emit per-batch (cell, k) minima;
    finalize with groupby('cell').min('k') / .max('k')."""
    cells = _u64(batch, cell_col)
    rows, disk, dist = traversal.grid_disk_distances(cells, k)
    # per-batch partial: min/max distance per reached cell
    order = np.lexsort((dist, disk))
    d_sorted = disk[order]
    k_sorted = dist[order]
    first = np.r_[True, d_sorted[1:] != d_sorted[:-1]]
    idx = np.nonzero(first)[0]
    kmin = np.minimum.reduceat(k_sorted, idx)
    kmax = np.maximum.reduceat(k_sorted, idx)
    return pa.table(
        {
            "cell": pa.array(d_sorted[first]),
            "k_min": pa.array(kmin.astype(np.uint32)),
            "k_max": pa.array(kmax.astype(np.uint32)),
        }
    )


def change_resolution_list(
    batch: pa.Table, out_res: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME,
    out_col: str = "cells",
) -> pa.Table:
    """1:1 positional list<u64> output variant (reference:
    change_resolution.rs:71-100); nulls preserved as empty lists."""
    cells = _u64(batch, cell_col)
    n = len(cells)
    res = bits.get_resolution(cells).astype(np.int64)
    up = res >= out_res
    parents = bits.cell_to_parent(cells, np.uint64(out_res))
    counts = np.ones(n, dtype=np.int64)
    down_idx = np.nonzero(~up)[0]
    if len(down_idx):
        ch, rows = hierarchy.cell_to_children(cells[down_idx], out_res)
        order = np.argsort(rows, kind="stable")
        ch, rows = ch[order], rows[order]
        counts[down_idx] = np.bincount(rows, minlength=len(down_idx))
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    values = np.empty(int(offsets[-1]), dtype=np.uint64)
    values[offsets[:-1][up]] = parents[up]
    if len(down_idx):
        # scatter each down-row's children to its output slot, in order
        within = np.arange(len(ch)) - np.repeat(
            np.cumsum(counts[down_idx]) - counts[down_idx], counts[down_idx]
        )
        values[np.repeat(offsets[:-1][down_idx], counts[down_idx]) + within] = ch
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(values))
    return batch.append_column(out_col, lists)


# published per-resolution stats (reference: ResolutionArray methods,
# crates/h3arrow/src/array/resolution.rs:46-87)
AVG_HEX_EDGE_KM = np.array(
    [
        1107.712591, 418.6760055, 158.2446558, 59.81085794, 22.6063794,
        8.544408276, 3.229482772, 1.220629759, 0.461354684, 0.174375668,
        0.065907807, 0.024910561, 0.009415526, 0.003559893, 0.001348575,
        0.000509713,
    ]
)
AVG_HEX_AREA_KM2 = np.array(
    [
        4357449.416078381, 609788.441794133, 86801.780398997, 12393.434655088,
        1770.347654491, 252.903858182, 36.129062164, 5.161293360, 0.737327598,
        0.105332513, 0.015047502, 0.002149643, 0.000307092, 0.000043870,
        0.000006267, 0.000000895,
    ]
)


def resolution_stats(batch: pa.Table, res_col: str = "resolution") -> pa.Table:
    """Per-resolution lookup columns: avg area, avg edge length, cell count."""
    res = _col(batch, res_col).astype(np.int64)
    if (res < 0).any() or (res > 15).any():
        raise ValueError("resolutions must be within 0..15")
    # 2 + 120*7^15 = 5.7e14 — fits int64 exactly for the whole 0..15 domain
    n_cells = 2 + 120 * np.power(7, res, dtype=np.int64)
    batch = batch.append_column("area_avg_km2", pa.array(AVG_HEX_AREA_KM2[res]))
    batch = batch.append_column("edge_len_avg_km", pa.array(AVG_HEX_EDGE_KM[res]))
    return batch.append_column("cell_count", pa.array(n_cells, type=pa.int64()))


def grid_disk_list(
    batch: pa.Table, k: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME,
    out_col: str = "disk",
) -> pa.Table:
    """Non-flattened grid_disk: one large_list<u64> per input row, positions
    preserved (reference flatten=False form, h3ronpy/src/op/neighbor.rs:19-35)."""
    cells = _u64(batch, cell_col)
    rows, disk, dist = traversal.grid_disk_distances(cells, k)
    order = np.argsort(rows, kind="stable")
    rows_s = rows[order]
    disk_s = disk[order]
    counts = np.bincount(rows_s, minlength=len(cells))
    offsets = np.zeros(len(cells) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(disk_s))
    return _append(batch, out_col, lists)


def grid_disk_distances_list(
    batch: pa.Table, k: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME,
    out_col: str | None = None, ring_order: bool = False,
) -> pa.Table:
    """Non-flattened grid_disk_distances: {disk: large_list<u64>,
    k: large_list<u32>} per row (reference h3ronpy/src/op/neighbor.rs:73-107
    names the list column 'cell'; ``out_col=None`` picks 'cell' whenever
    that would not clobber an input column, else 'disk' — pass an explicit
    name to override).

    ``ring_order=True`` lays every row's list out ring-by-ring in the C
    library's ring-walk order (``traversal.grid_disk_walk``: step out,
    six sides per ring, step-out cell emitted last; origins whose disk
    touches a pentagon fall back to BFS order within rings, as C falls
    back to its safe algorithm).  Ring MEMBER SETS per k match the
    reference exactly; the walk construction is the published one but is
    not certified h3o-bit-identical (no binding available to compare).
    Default False keeps plain BFS order (cheaper: no per-step walk)."""
    if out_col is None:
        out_col = "cell" if "cell" not in batch.column_names else "disk"
    cells = _u64(batch, cell_col)
    if ring_order:
        # grid_disk_walk output is already row-major walk-ordered
        rows, disk, dist = traversal.grid_disk_walk(cells, k)
    else:
        rows, disk, dist = traversal.grid_disk_distances(cells, k)
        order = np.argsort(rows, kind="stable")
        rows, disk, dist = rows[order], disk[order], dist[order]
    counts = np.bincount(rows, minlength=len(cells))
    offsets = np.zeros(len(cells) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    batch = _append(
        batch,
        out_col,
        pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(disk)),
    )
    return _append(
        batch,
        "k",
        pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(dist.astype(np.uint32))
        ),
    )





def grid_distance(
    batch: pa.Table, a_col: str = "cell", b_col: str = "other",
    out_col: str = "distance",
) -> pa.Table:
    """Pairwise grid distance via the local-IJ unfold (the H3 gridDistance
    construction; exact within a base cell and across seams, with the same
    far-corner distortion caveat as the C library).  Appends
    {out_col: int64, out_col+'_ok': bool}."""
    from .h3core import localij

    a = _u64(batch, a_col)
    b = _u64(batch, b_col)
    d, ok = localij.grid_distance(a, b)
    batch = _append(batch, out_col, pa.array(d.astype(np.int64)))
    return _append(batch, out_col + "_ok", pa.array(ok))


def get_icosahedron_faces(
    batch: pa.Table, cell_col: str = DEFAULT_CELL_COLUMN_NAME,
    out_col: str = "faces",
) -> pa.Table:
    """Icosahedron faces each cell's area intersects, as a sorted
    large_list<int64> per row (H3 v4 getIcosahedronFaces; beyond the
    reference surface)."""
    from .h3core import boundary

    cells = _u64(batch, cell_col)
    rows, faces = boundary.get_icosahedron_faces(cells)
    counts = np.bincount(rows, minlength=len(cells))
    offsets = np.zeros(len(cells) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(faces))
    return _append(batch, out_col, lists)


def cells_to_vertexes(
    batch: pa.Table, cell_col: str = DEFAULT_CELL_COLUMN_NAME,
    out_col: str = "vertexes", flatten: bool = False,
) -> pa.Table:
    """Canonical vertex indexes per cell (H3 v4 cellToVertexes; beyond
    the reference surface — h3ronpy only parses/validates/owns vertexes,
    h3ronpy/python/h3ronpy/__init__.py:132).  Cells sharing a corner get
    the IDENTICAL uint64 (min-sharing-cell owner rule), making the
    output a corner join key.  flatten=False: large_list<u64> per row in
    ccw corner order (6, or 5 for pentagons); flatten=True: exploded
    (row-repeated) rows with an int64 ``out_col`` column."""
    from .h3core import vertex as vertex_mod

    cells = _u64(batch, cell_col)
    rows, vx = vertex_mod.cells_to_vertexes(cells)
    if flatten:
        return pa.table(
            {
                **{n: batch.column(n).take(pa.array(rows)) for n in batch.column_names},
                out_col: pa.array(vx.astype(np.int64)),
            }
        )
    counts = np.bincount(rows, minlength=len(cells))
    offsets = np.zeros(len(cells) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(vx.astype(np.int64)))
    return _append(batch, out_col, lists)


def are_neighbor_cells(
    batch: pa.Table, a_col: str = "cell", b_col: str = "other",
    out_col: str = "neighbor",
) -> pa.Table:
    """Pairwise H3 areNeighborCells (C API parity: self is not a
    neighbor, res mismatch / invalid cells flag per-row errors).
    Appends {out_col: bool, out_col+'_err': int8 (0 ok, 1 invalid,
    2 res mismatch)}."""
    from .h3core import traversal

    a = _u64(batch, a_col)
    b = _u64(batch, b_col)
    nb, err = traversal.are_neighbor_cells(a, b)
    batch = _append(batch, out_col, pa.array(nb))
    return _append(batch, out_col + "_err", pa.array(err))


def grid_path_cells(
    batch: pa.Table, a_col: str = "cell", b_col: str = "other",
    out_col: str = "path",
) -> pa.Table:
    """Minimal cell path per pair as large_list<u64> (H3 gridPathCells
    construction: cube-lerp in local IJ, candidate-verified decode).
    Failing pairs get empty lists with ok=False."""
    from .h3core import localij

    a = _u64(batch, a_col)
    b = _u64(batch, b_col)
    rows, cells, ok = localij.grid_path_cells(a, b)
    counts = np.bincount(rows, minlength=len(a))
    offsets = np.zeros(len(a) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    lists = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(cells))
    batch = _append(batch, out_col, lists)
    return _append(batch, out_col + "_ok", pa.array(ok))
