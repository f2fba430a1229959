"""Reference-parity top-level array API.

Array-in / array-out wrappers over the vectorized ``h3core`` kernels,
mirroring the reference's module-level surface
(h3ronpy/python/h3ronpy/__init__.py:66-290) name-for-name so code written
against ``from h3ronpy import cells_resolution, compact, ...`` ports to
``from h3ray import ...`` unchanged.  These are the single-process
convenience forms; the distributed path is ``kernels.*`` /
``H3Dataset`` over Ray Data batches.

Inputs accept pyarrow ``Array``/``ChunkedArray``, numpy arrays,
pandas/polars ``Series`` (anything with ``to_arrow``/``to_numpy``), or
plain Python sequences.  Outputs are pyarrow (``Array`` for 1:1/flat ops,
``Table`` where the reference returns a RecordBatch), with the
reference's exact column names: ``cell``/``k`` for the disk family
(h3ronpy/src/op/neighbor.rs:100-102), ``cell_before``/``cell_after`` for
the paired resolution change (src/op/resolution.rs:63-74) and
``i``/``j``/``anchor`` for local-IJ (src/op/localij.rs:36-39).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import kernels
from .h3core import bits, boundary, hierarchy, localij as _localij, traversal

DEFAULT_CELL_COLUMN_NAME = kernels.DEFAULT_CELL_COLUMN_NAME
H3_CRS = "EPSG:4326"
__version__ = "0.5.0"


def version() -> str:
    """Engine version string (the reference exports ``version`` from its
    native module; __init__.py:24)."""
    return __version__


def _to_arrow(arr, dtype: pa.DataType | None = None) -> pa.Array:
    """Best-effort conversion to a single-chunk pyarrow Array (the
    reference's _to_arrow_array, minus the arro3 dependency)."""
    if isinstance(arr, pa.ChunkedArray):
        out = arr.combine_chunks()
    elif isinstance(arr, pa.Array):
        out = arr
    elif hasattr(arr, "to_arrow"):  # polars Series
        out = arr.to_arrow()
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
    elif hasattr(arr, "__arrow_array__"):  # pandas ArrowExtensionArray etc.
        out = arr.__arrow_array__()
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
    else:  # numpy / pandas Series / sequence
        try:
            out = pa.array(arr, type=dtype)
        except pa.ArrowNotImplementedError:
            # e.g. numpy unicode arrays can't build large_string directly
            out = pa.array(arr)
    if dtype is not None and out.type != dtype:
        out = out.cast(dtype)
    return out


def _to_u64(arr) -> tuple[np.ndarray, np.ndarray]:
    """-> (uint64 values with nulls as 0, null mask)."""
    a = _to_arrow(arr, pa.uint64())
    nulls = pc.is_null(a).to_numpy(zero_copy_only=False)
    vals = pc.fill_null(a, 0).to_numpy(zero_copy_only=False).astype(np.uint64)
    return vals, nulls


def _masked_array(vals: np.ndarray, nulls: np.ndarray | None = None) -> pa.Array:
    if nulls is not None and nulls.any():
        return pa.array(vals, mask=nulls)
    return pa.array(vals)


def _require_valid(vals, nulls, checker, what: str) -> None:
    """Reference failure parity: the reference validates every NON-NULL
    u64 when building its typed index arrays and raises on garbage
    (crates/h3arrow/src/array/mod.rs:193-210); nulls pass through."""
    bad = ~nulls & ~checker(vals)
    if bad.any():
        examples = vals[bad][:3].tolist()
        raise ValueError(f"invalid {what} index values: {examples}")


def _valid_u64(arr, checker=None, what: str = "cell"):
    vals, nulls = _to_u64(arr)
    _require_valid(vals, nulls, checker or bits.is_valid_cell, what)
    return vals, nulls


def change_resolution(arr, resolution: int) -> pa.Array:
    """All cells -> ``resolution``; finer targets explode to children so
    the output may be longer than the input.  Invalid/null values are
    omitted (reference __init__.py:66-75)."""
    vals, nulls = _to_u64(arr)
    keep = ~nulls & bits.is_valid_cell(vals)
    return pa.array(hierarchy.change_resolution(vals[keep], resolution))


def change_resolution_list(arr, resolution: int) -> pa.Array:
    """Positional ``large_list<u64>`` variant: output row i holds row i's
    changed cells; null/invalid inputs stay null (reference
    __init__.py:78-86)."""
    vals, nulls = _to_u64(arr)
    good = ~nulls & bits.is_valid_cell(vals)
    t = kernels.change_resolution_list(
        pa.table({DEFAULT_CELL_COLUMN_NAME: pa.array(vals[good])}),
        resolution,
    )
    out = t.column("cells")
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    if good.all():
        return out
    # scatter valid rows back to their positions; bad rows become null
    idx = np.full(len(vals), -1, dtype=np.int64)
    idx[good] = np.arange(int(good.sum()))
    return out.take(pa.array(idx, mask=~good))


def change_resolution_paired(arr, resolution: int) -> pa.Table:
    """(cell_before, cell_after) rows for cross-resolution joins
    (reference src/op/resolution.rs:48-81)."""
    vals, nulls = _valid_u64(arr)
    before, after = hierarchy.change_resolution_paired(vals[~nulls], resolution)
    return pa.table(
        {
            f"{DEFAULT_CELL_COLUMN_NAME}_before": pa.array(before),
            f"{DEFAULT_CELL_COLUMN_NAME}_after": pa.array(after),
        }
    )


def cells_resolution(arr) -> pa.Array:
    """Resolution of each cell (uint8, nulls preserved; invalid non-null
    values raise, per the reference's typed-array validation)."""
    vals, nulls = _valid_u64(arr)
    return _masked_array(bits.get_resolution(vals).astype(np.uint8), nulls)


def _parse_via_kernel(arr, set_failing_to_invalid: bool) -> pa.Array:
    t = kernels.cells_parse(
        pa.table({"s": _to_arrow(arr, pa.large_string())}),
        "s",
        set_failing_to_invalid=set_failing_to_invalid,
    )
    out = t.column(DEFAULT_CELL_COLUMN_NAME)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def cells_parse(arr, set_failing_to_invalid: bool = False) -> pa.Array:
    """Parse hex / decimal-integer / "lng,lat,res" (``,`` or ``;``)
    strings into cells; failing rows raise, or become null when
    ``set_failing_to_invalid`` (reference __init__.py:112-130)."""
    return _parse_via_kernel(arr, set_failing_to_invalid)


def _parse_index(arr, checker, what: str, set_failing_to_invalid: bool) -> pa.Array:
    """Hex / decimal-int string parse for vertex and edge indexes:
    vectorized jagged hex parse (bits.parse_hex_u64 over a zero-copy
    utf8 view), scalar fallback only for the rare non-hex spellings.
    Null inputs stay null without raising (reference null semantics,
    crates/h3arrow/src/algorithm/string.rs:39-63)."""
    col = _to_arrow(arr, pa.large_string())
    nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
    filled = pc.utf8_trim_whitespace(pc.fill_null(col, ""))
    from .functions._strkern import utf8_view

    stripped = pc.utf8_ltrim(filled, "0")
    data, off = utf8_view(stripped)
    vals, ok = bits.parse_hex_u64(data, off)
    ok |= np.diff(off) == 0  # "000" parses to 0 (fails the validity check)
    rest = ~ok & ~nulls
    if rest.any():  # decimal overflow / exotic int() spellings
        ridx = np.nonzero(rest)[0]
        rvals, rok = bits.parse_hex_strings(
            [filled[int(r)].as_py() for r in ridx]
        )
        vals[ridx], ok[ridx] = rvals, rok
    ok &= checker(vals)
    failing = ~ok & ~nulls
    if not set_failing_to_invalid and failing.any():
        bad = [filled[int(r)].as_py() for r in np.nonzero(failing)[0][:3]]
        raise ValueError(f"non-parsable {what}: {bad}")
    return pa.array(vals, mask=~ok | nulls)


def vertexes_parse(arr, set_failing_to_invalid: bool = False) -> pa.Array:
    return _parse_index(
        arr, bits.is_valid_vertex, "VertexIndex", set_failing_to_invalid
    )


def directededges_parse(arr, set_failing_to_invalid: bool = False) -> pa.Array:
    return _parse_index(
        arr, bits.is_valid_directededge, "DirectedEdgeIndex",
        set_failing_to_invalid,
    )


def compact(arr, mixed_resolutions: bool = False) -> pa.Array:
    """Compact same-resolution cells (raises on heterogeneous input unless
    ``mixed_resolutions``; reference __init__.py:159-167)."""
    vals, nulls = _valid_u64(arr)
    return pa.array(
        hierarchy.compact(vals[~nulls], mixed_resolutions=mixed_resolutions)
    )


def uncompact(arr, target_resolution: int) -> pa.Array:
    """Expand to ``target_resolution``; finer inputs are omitted
    (reference __init__.py:170-177)."""
    vals, nulls = _valid_u64(arr)
    return pa.array(hierarchy.uncompact(vals[~nulls], target_resolution))


def _make_h3index_valid_wrapper(fn, h3index_name, wrapper_name):
    def valid_wrapper(arr, booleanarray: bool = False) -> pa.Array:
        vals, nulls = _to_u64(arr)
        ok = fn(vals) & ~nulls
        if booleanarray:
            return pa.array(ok)
        return pa.array(vals, mask=~ok)

    valid_wrapper.__doc__ = f"""
    Check which u64s are well-formed {h3index_name} indexes: the default
    output is the input with failing positions nulled out; pass
    ``booleanarray=True`` for a plain bool mask instead (semantics per
    reference __init__.py:181-195).
    """
    valid_wrapper.__name__ = wrapper_name
    return valid_wrapper


cells_valid = _make_h3index_valid_wrapper(
    bits.is_valid_cell, "cell", "cells_valid"
)
vertexes_valid = _make_h3index_valid_wrapper(
    bits.is_valid_vertex, "vertex", "vertexes_valid"
)
directededges_valid = _make_h3index_valid_wrapper(
    bits.is_valid_directededge, "directed edge", "directededges_valid"
)


def _disk_lists(rows, values, n, value_type=None):
    order = np.argsort(rows, kind="stable")
    counts = np.bincount(rows, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    vals = values[order]
    if value_type is not None:
        vals = vals.astype(value_type)
    return pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(vals))


def grid_disk(cellarray, k: int, flatten: bool = False) -> pa.Array:
    """k-disk members per cell: ``large_list<u64>`` positionally matched
    to the input, or one flat u64 array when ``flatten``."""
    vals, nulls = _valid_u64(cellarray)
    rows, disk, _ = traversal.grid_disk_distances(vals[~nulls], k)
    if flatten:
        return pa.array(disk)
    n_valid = int((~nulls).sum())
    lists = _disk_lists(rows, disk, n_valid)
    if nulls.any():
        idx = np.full(len(vals), -1, dtype=np.int64)
        idx[~nulls] = np.arange(n_valid)
        lists = lists.take(pa.array(idx, mask=nulls))
    return lists


def _disk_batch(vals, nulls, rows, disk, dist, flatten: bool) -> pa.Table:
    if flatten:
        return pa.table(
            {
                DEFAULT_CELL_COLUMN_NAME: pa.array(disk),
                "k": pa.array(dist.astype(np.uint32)),
            }
        )
    n_valid = int((~nulls).sum())
    cells_l = _disk_lists(rows, disk, n_valid)
    k_l = _disk_lists(rows, dist, n_valid, np.uint32)
    if nulls.any():
        idx = np.full(len(vals), -1, dtype=np.int64)
        idx[~nulls] = np.arange(n_valid)
        take = pa.array(idx, mask=nulls)
        cells_l, k_l = cells_l.take(take), k_l.take(take)
    return pa.table({DEFAULT_CELL_COLUMN_NAME: cells_l, "k": k_l})


def grid_disk_distances(cellarray, k: int, flatten: bool = False) -> pa.Table:
    """(cell, k) columns — list-typed per input row, or flat rows when
    ``flatten`` (reference src/op/neighbor.rs:54-107)."""
    vals, nulls = _valid_u64(cellarray)
    rows, disk, dist = traversal.grid_disk_distances(vals[~nulls], k)
    return _disk_batch(vals, nulls, rows, disk, dist, flatten)


def grid_ring_distances(
    cellarray, k_min: int, k_max: int, flatten: bool = False
) -> pa.Table:
    """(cell, k) for disk members with k_min <= k <= k_max."""
    vals, nulls = _valid_u64(cellarray)
    rows, disk, dist = traversal.grid_ring_distances(vals[~nulls], k_min, k_max)
    return _disk_batch(vals, nulls, rows, disk, dist, flatten)


def grid_disk_aggregate_k(cellarray, k: int, aggregation_method: str) -> pa.Table:
    """Disk-reachable cells with their min/max distance over all origins:
    (cell, k) rows.  Valid ``aggregation_method``: "min" / "max"
    (reference src/op/neighbor.rs:123-152)."""
    if aggregation_method not in ("min", "max"):
        raise ValueError("unknown way to aggregate k")
    vals, nulls = _valid_u64(cellarray)
    rows, disk, dist = traversal.grid_disk_distances(vals[~nulls], k)
    order = np.lexsort((dist, disk))
    d_sorted, k_sorted = disk[order], dist[order]
    first = np.r_[True, d_sorted[1:] != d_sorted[:-1]] if len(d_sorted) else (
        np.zeros(0, dtype=bool)
    )
    idx = np.nonzero(first)[0]
    agg = (np.minimum if aggregation_method == "min" else np.maximum).reduceat(
        k_sorted, idx
    ) if len(idx) else k_sorted[:0]
    return pa.table(
        {
            DEFAULT_CELL_COLUMN_NAME: pa.array(d_sorted[first]),
            "k": pa.array(agg.astype(np.uint32)),
        }
    )


def cells_area_m2(cellarray) -> pa.Array:
    vals, nulls = _valid_u64(cellarray)
    return _masked_array(boundary.cells_area_m2(vals), nulls)


def cells_area_km2(cellarray) -> pa.Array:
    vals, nulls = _valid_u64(cellarray)
    return _masked_array(boundary.cells_area_km2(vals), nulls)


def cells_area_rads2(cellarray) -> pa.Array:
    vals, nulls = _valid_u64(cellarray)
    return _masked_array(boundary.cells_area_rads2(vals), nulls)


def _to_string(arr, checker, what) -> pa.Array:
    vals, nulls = _valid_u64(arr, checker, what)
    # reference emits large_utf8 (src/op/string.rs:91-95).  Convert only
    # the non-null values: a 0 from a null slot would knock the whole
    # batch off to_hex_strings' vectorized fast path
    if nulls.any():
        strs = np.empty(len(vals), dtype=object)
        strs[~nulls] = bits.to_hex_strings(vals[~nulls])
        return pa.array(strs, type=pa.large_string())
    return pa.array(bits.to_hex_strings(vals), type=pa.large_string())


def cells_to_string(cellarray) -> pa.Array:
    return _to_string(cellarray, bits.is_valid_cell, "cell")


def vertexes_to_string(vertexesarray) -> pa.Array:
    return _to_string(vertexesarray, bits.is_valid_vertex, "vertex")


def directededges_to_string(directededgearray) -> pa.Array:
    return _to_string(
        directededgearray, bits.is_valid_directededge, "directed edge"
    )


def cells_to_localij(
    cellarray, anchor, set_failing_to_invalid: bool = False
) -> pa.Table:
    """Local (i, j, anchor) coordinates of cells relative to ``anchor``
    (single cell or per-row array).  Failing rows raise unless
    ``set_failing_to_invalid`` (then they are null); reference
    src/op/localij.rs:17-45."""
    vals, nulls = _to_u64(cellarray)
    if isinstance(anchor, (int, np.integer)):
        anchors = np.full(len(vals), np.uint64(anchor), dtype=np.uint64)
        a_nulls = np.zeros(len(vals), dtype=bool)
    else:
        anchors, a_nulls = _to_u64(anchor)
        if len(anchors) != len(vals):
            raise ValueError(
                "anchor array length must match the cell array length"
            )
    any_null = nulls | a_nulls
    _require_valid(vals, nulls, bits.is_valid_cell, "cell")
    _require_valid(anchors, a_nulls, bits.is_valid_cell, "anchor cell")
    i, j, ok = _localij.cells_to_localij(vals, anchors)
    ok = ok & ~any_null
    # reference parity: nulls pass through as null rows; only a REAL
    # transform failure on a non-null pair raises (localij.rs:115-135)
    if not set_failing_to_invalid and (~ok & ~any_null).any():
        raise ValueError("local-IJ transformation failed for some cells")
    bad = ~ok
    return pa.table(
        {
            "i": pa.array(i.astype(np.int32), mask=bad),
            "j": pa.array(j.astype(np.int32), mask=bad),
            "anchor": pa.array(anchors, mask=bad),
        }
    )


def localij_to_cells(
    anchor, i, j, set_failing_to_invalid: bool = False
) -> pa.Array:
    """Cells from local (i, j) + anchor (single cell or per-row array);
    reference src/op/localij.rs:48-77."""
    i_a = _to_arrow(i, pa.int32())
    j_a = _to_arrow(j, pa.int32())
    i_nulls = pc.is_null(i_a).to_numpy(zero_copy_only=False)
    j_nulls = pc.is_null(j_a).to_numpy(zero_copy_only=False)
    i_np = pc.fill_null(i_a, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    j_np = pc.fill_null(j_a, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    if isinstance(anchor, (int, np.integer)):
        anchors = np.full(len(i_np), np.uint64(anchor), dtype=np.uint64)
        a_nulls = np.zeros(len(i_np), dtype=bool)
    else:
        anchors, a_nulls = _to_u64(anchor)
        if len(anchors) != len(i_np):
            raise ValueError("anchor array length must match i/j length")
    _require_valid(anchors, a_nulls, bits.is_valid_cell, "anchor cell")
    any_null = i_nulls | j_nulls | a_nulls
    cells, ok = _localij.localij_to_cells(anchors, i_np, j_np)
    ok = ok & ~any_null
    if not set_failing_to_invalid and (~ok & ~any_null).any():
        raise ValueError("local-IJ inverse failed for some coordinates")
    return pa.array(cells, mask=~ok)


__all__ = [
    "H3_CRS",
    "DEFAULT_CELL_COLUMN_NAME",
    "version",
    "change_resolution",
    "change_resolution_list",
    "change_resolution_paired",
    "cells_resolution",
    "cells_parse",
    "vertexes_parse",
    "directededges_parse",
    "compact",
    "uncompact",
    "cells_valid",
    "vertexes_valid",
    "directededges_valid",
    "grid_disk",
    "grid_disk_distances",
    "grid_ring_distances",
    "grid_disk_aggregate_k",
    "cells_area_m2",
    "cells_area_km2",
    "cells_area_rads2",
    "cells_to_string",
    "vertexes_to_string",
    "directededges_to_string",
    "cells_to_localij",
    "localij_to_cells",
]
