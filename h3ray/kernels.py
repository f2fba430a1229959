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
    # null inputs stay null without raising (reference null semantics)
    nulls = np.array([s is None for s in strings], dtype=bool)
    if not set_failing_to_invalid and not (ok | nulls).all():
        bad = [s for s, o in zip(strings, ok) if not o and s is not None][:3]
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
    res = bits.get_resolution(cells).astype(np.int64)
    lists = []
    up = res >= out_res
    parents = bits.cell_to_parent(cells, np.uint64(out_res))
    for i in range(len(cells)):
        if up[i]:
            lists.append([int(parents[i])])
        else:
            ch, _ = hierarchy.cell_to_children(cells[i : i + 1], out_res)
            lists.append([int(x) for x in ch])
    return batch.append_column(out_col, pa.array(lists, type=pa.large_list(pa.uint64())))


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
    n_cells = 2 + 120 * (7 ** res.astype(np.object_))
    batch = batch.append_column("area_avg_km2", pa.array(AVG_HEX_AREA_KM2[res]))
    batch = batch.append_column("edge_len_avg_km", pa.array(AVG_HEX_EDGE_KM[res]))
    return batch.append_column(
        "cell_count", pa.array([int(x) for x in n_cells], type=pa.int64())
    )


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
    return _append_array(batch, out_col, lists)


def grid_disk_distances_list(
    batch: pa.Table, k: int, cell_col: str = DEFAULT_CELL_COLUMN_NAME
) -> pa.Table:
    """Non-flattened grid_disk_distances: {cell: large_list<u64>,
    k: large_list<u32>} per row (reference neighbor.rs:73-107)."""
    cells = _u64(batch, cell_col)
    rows, disk, dist = traversal.grid_disk_distances(cells, k)
    order = np.argsort(rows, kind="stable")
    rows_s = rows[order]
    counts = np.bincount(rows_s, minlength=len(cells))
    offsets = np.zeros(len(cells) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    batch = _append_array(
        batch,
        "disk",
        pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(disk[order])),
    )
    return _append_array(
        batch,
        "k",
        pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(dist[order].astype(np.uint32))
        ),
    )


def _append_array(batch: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    return batch.append_column(name, arr)
