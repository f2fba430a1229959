"""Polars namespace sugar: drop-in mirror of ``h3ronpy.polars``
(reference: h3ronpy/python/h3ronpy/polars.py:39-228 — an ``h3``
namespace registered on both ``pl.Expr`` and ``pl.Series`` whose
methods mirror the array-level module functions).

This is the single-process convenience surface; the distributed path is
``H3Dataset`` / ``kernels.*`` over Ray Data.  Import is gated: the
module is importable only where polars is installed (it is baked into
this environment; the gate keeps the core library polars-free).

Method names, aliases and dtypes follow the reference exactly
(e.g. ``cells_resolution`` aliases its output column to "resolution",
parse methods alias to "cell"/"vertex"/"directededge"), so
``import h3ray.polars`` + ``df.select(pl.col("cell").h3.cells_valid())``
behaves like the reference's ``import h3ronpy.polars``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:
    import polars as pl
except ImportError as _e:  # pragma: no cover - polars is baked in here
    raise ImportError(
        "h3ray.polars requires the optional 'polars' dependency"
    ) from _e

from . import kernels, vector
from .h3core import bits, boundary, hierarchy, traversal


def _u64(s: "pl.Series") -> np.ndarray:
    return s.to_numpy().astype(np.uint64)


def _change_resolution_array(cells: np.ndarray, res: int) -> np.ndarray:
    """Row-order-preserving array form of change_resolution: coarser
    targets map each cell to its parent, finer targets explode to
    children in place (reference __init__.py:66-77 flatten semantics)."""
    cells = np.asarray(cells, dtype=np.uint64)
    r = bits.get_resolution(cells).astype(np.int64)
    up = r >= res
    if up.all():
        return bits.cell_to_parent(cells, np.uint64(res))
    rows, vals = [], []
    if up.any():
        rows.append(np.nonzero(up)[0])
        vals.append(bits.cell_to_parent(cells[up], np.uint64(res)))
    ch, pidx = hierarchy.cell_to_children(cells[~up], res)
    rows.append(np.nonzero(~up)[0][pidx])
    vals.append(ch)
    allrows = np.concatenate(rows)
    order = np.argsort(allrows, kind="stable")
    return np.concatenate(vals)[order]


def _change_resolution_offsets(cells: np.ndarray, res: int):
    """(flat_changed, offsets) for the list form.  Counts come from the
    actual expansion rows (np.bincount over parent indexes), not from
    7**depth — pentagon subtrees have fewer children."""
    cells = np.asarray(cells, dtype=np.uint64)
    r = bits.get_resolution(cells).astype(np.int64)
    up = r >= res
    counts = np.ones(len(cells), dtype=np.int64)
    if (~up).any():
        _, pidx = hierarchy.cell_to_children(cells[~up], res)
        counts[~up] = np.bincount(pidx, minlength=int((~up).sum()))
    flat = _change_resolution_array(cells, res)
    offsets = np.zeros(len(cells) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return flat, offsets


def _parse_cells(s: "pl.Series", set_failing_to_invalid: bool) -> "pl.Series":
    t = pa.table({"s": pa.array(s.to_list(), type=pa.large_string())})
    out = kernels.cells_parse(
        t, "s", set_failing_to_invalid=set_failing_to_invalid
    )
    # keep nulls (set_failing_to_invalid=True writes them) — go through
    # arrow, not numpy, so they survive as polars nulls
    col = out.column("cell")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pl.Series(arr.cast(pa.uint64()))


def _parse_indexes(parse_fn, s: "pl.Series", set_failing_to_invalid: bool) -> "pl.Series":
    """vertexes_parse / directededges_parse return (values, ok): surface
    values, nulling the failed rows when set_failing_to_invalid=True
    (otherwise the parse fn already raised)."""
    vals, ok = parse_fn(s.to_list(), set_failing_to_invalid=set_failing_to_invalid)
    mask = ~ok if not ok.all() else None
    return pl.Series(pa.array(vals, type=pa.uint64(), mask=mask))


@pl.api.register_expr_namespace("h3")
class H3Expr:
    """H3 methods on polars expressions (reference polars.py:40-131)."""

    def __init__(self, expr: "pl.Expr"):
        self._expr = expr

    def _map(self, func, return_dtype=None) -> "pl.Expr":
        return self._expr.map_batches(func, return_dtype=return_dtype)

    def cells_resolution(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(bits.get_resolution(_u64(s))), pl.UInt8
        ).alias("resolution")

    def change_resolution(self, resolution: int) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(_change_resolution_array(_u64(s), resolution)),
            pl.UInt64,
        )

    def change_resolution_list(self, resolution: int) -> "pl.Expr":
        def f(s):
            flat, off = _change_resolution_offsets(_u64(s), resolution)
            return pl.Series(
                pa.LargeListArray.from_arrays(pa.array(off), pa.array(flat))
            )

        return self._map(f, pl.List(pl.UInt64))

    def cells_parse(self, set_failing_to_invalid: bool = False) -> "pl.Expr":
        return self._map(
            lambda s: _parse_cells(s, set_failing_to_invalid),
            pl.UInt64,
        ).alias("cell")

    def vertexes_parse(self, set_failing_to_invalid: bool = False) -> "pl.Expr":
        return self._map(
            lambda s: _parse_indexes(
                vector.vertexes_parse, s, set_failing_to_invalid
            ),
            pl.UInt64,
        ).alias("vertex")

    def directededges_parse(self, set_failing_to_invalid: bool = False) -> "pl.Expr":
        return self._map(
            lambda s: _parse_indexes(
                vector.directededges_parse, s, set_failing_to_invalid
            ),
            pl.UInt64,
        ).alias("directededge")

    def grid_disk(self, k: int, flatten: bool = False) -> "pl.Expr":
        def f(s):
            cells = _u64(s)
            rows, disk, _ = traversal.grid_disk_distances(cells, k)
            if flatten:
                return pl.Series(disk)
            counts = np.bincount(rows, minlength=len(cells))
            off = np.zeros(len(cells) + 1, dtype=np.int64)
            np.cumsum(counts, out=off[1:])
            return pl.Series(
                pa.LargeListArray.from_arrays(pa.array(off), pa.array(disk))
            )

        return self._map(f, pl.UInt64 if flatten else pl.List(pl.UInt64))

    def compact(self, mixed_resolutions: bool = False) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(
                hierarchy.compact(_u64(s), mixed_resolutions=mixed_resolutions)
            ),
            pl.UInt64,
        )

    def uncompact(self, target_resolution: int) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(hierarchy.uncompact(_u64(s), target_resolution)),
            pl.UInt64,
        )

    def cells_area_m2(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(boundary.cells_area_m2(_u64(s))), pl.Float64
        ).alias("area_m2")

    def cells_area_km2(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(boundary.cells_area_km2(_u64(s))), pl.Float64
        ).alias("area_km2")

    def cells_area_rads2(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(boundary.cells_area_rads2(_u64(s))), pl.Float64
        ).alias("area_rads2")

    def cells_valid(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(bits.is_valid_cell(_u64(s))), pl.Boolean
        ).alias("cells_valid")

    def vertexes_valid(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(bits.is_valid_vertex(_u64(s))), pl.Boolean
        ).alias("vertexes_valid")

    def directededges_valid(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(bits.is_valid_directededge(_u64(s))), pl.Boolean
        ).alias("directededges_valid")

    def cells_to_string(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(bits.to_hex_strings(_u64(s))), pl.String
        )

    def vertexes_to_string(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(vector.vertexes_to_string(_u64(s))), pl.String
        )

    def directededges_to_string(self) -> "pl.Expr":
        return self._map(
            lambda s: pl.Series(vector.directededges_to_string(_u64(s))), pl.String
        )


@pl.api.register_series_namespace("h3")
class H3SeriesShortcuts:
    """H3 methods on polars Series (reference polars.py:133-228): each
    shortcut evaluates the matching H3Expr method eagerly."""

    def __init__(self, s: "pl.Series"):
        self._s = s

    def _eval(self, make_expr) -> "pl.Series":
        name = self._s.name or "s"
        return (
            self._s.rename(name)
            .to_frame()
            .select(make_expr(pl.col(name)))
            .to_series()
        )

    def cells_resolution(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.cells_resolution())

    def change_resolution(self, resolution: int) -> "pl.Series":
        return self._eval(lambda c: c.h3.change_resolution(resolution))

    def change_resolution_list(self, resolution: int) -> "pl.Series":
        return self._eval(lambda c: c.h3.change_resolution_list(resolution))

    def cells_parse(self, set_failing_to_invalid: bool = False) -> "pl.Series":
        return self._eval(lambda c: c.h3.cells_parse(set_failing_to_invalid))

    def vertexes_parse(self, set_failing_to_invalid: bool = False) -> "pl.Series":
        return self._eval(lambda c: c.h3.vertexes_parse(set_failing_to_invalid))

    def directededges_parse(self, set_failing_to_invalid: bool = False) -> "pl.Series":
        return self._eval(lambda c: c.h3.directededges_parse(set_failing_to_invalid))

    def grid_disk(self, k: int, flatten: bool = False) -> "pl.Series":
        return self._eval(lambda c: c.h3.grid_disk(k, flatten=flatten))

    def compact(self, mixed_resolutions: bool = False) -> "pl.Series":
        return self._eval(lambda c: c.h3.compact(mixed_resolutions=mixed_resolutions))

    def uncompact(self, target_resolution: int) -> "pl.Series":
        return self._eval(lambda c: c.h3.uncompact(target_resolution))

    def cells_area_m2(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.cells_area_m2())

    def cells_area_km2(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.cells_area_km2())

    def cells_area_rads2(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.cells_area_rads2())

    def cells_valid(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.cells_valid())

    def vertexes_valid(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.vertexes_valid())

    def directededges_valid(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.directededges_valid())

    def cells_to_string(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.cells_to_string())

    def vertexes_to_string(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.vertexes_to_string())

    def directededges_to_string(self) -> "pl.Series":
        return self._eval(lambda c: c.h3.directededges_to_string())
