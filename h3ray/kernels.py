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
    return batch.append_column(name, pa.array(arr))


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


def cells_parse(
    batch: pa.Table, str_col: str, set_failing_to_invalid: bool = False,
    cell_col: str = DEFAULT_CELL_COLUMN_NAME,
) -> pa.Table:
    """Parse hex / decimal / "lng,lat,res" strings (reference:
    crates/h3arrow/src/algorithm/string.rs:136-194)."""
    strings = batch.column(str_col).combine_chunks().to_pylist()
    vals, ok = bits.parse_hex_strings(strings)
    # validate parsed integers as cells
    ok &= bits.is_valid_cell(vals)
    # coordinate form: "x,y,res" or "x;y;res" (x=lng, y=lat)
    todo = [i for i, o in enumerate(ok) if not o and strings[i]]
    if todo:
        lats, lngs, ress, rows = [], [], [], []
        for i in todo:
            s = strings[i].replace(";", ",")
            parts = [p.strip() for p in s.split(",")]
            if len(parts) == 3:
                try:
                    lng_v, lat_v, res_v = float(parts[0]), float(parts[1]), int(parts[2])
                    if 0 <= res_v <= 15:
                        lats.append(lat_v)
                        lngs.append(lng_v)
                        ress.append(res_v)
                        rows.append(i)
                except ValueError:
                    pass
        if rows:
            cells = faceijk.latlng_to_cell(
                np.array(lats), np.array(lngs), np.array(ress)
            )
            vals[rows] = cells
            ok[rows] = True
    if not set_failing_to_invalid and not ok.all():
        bad = [s for s, o in zip(strings, ok) if not o][:3]
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
