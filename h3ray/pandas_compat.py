"""Pandas convenience wrappers (parity with h3ronpy.pandas.vector/raster).

geopandas/shapely are unavailable in this environment, so geometry columns
are WKB ``bytes`` (readable by geopandas.GeoSeries.from_wkb downstream);
semantics otherwise mirror the reference wrappers
(h3ronpy/python/h3ronpy/pandas/vector.py:51-135, pandas/raster.py:16-65).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import vector
from .h3core import polyfill, wkb


def dataframe_to_cells(
    df: pd.DataFrame,
    geometry_column: str = "geometry",
    resolution: int = 9,
    containment_mode: str = "containscentroid",
    compact: bool = False,
    cell_column_name: str = "cell",
) -> pd.DataFrame:
    """WKB-geometry dataframe -> one row per produced cell, all other
    columns repeated (the reference's geodataframe_to_cells explode).
    Null geometries survive as one row with a null cell — the reference's
    _explode_table_include_null semantics (pandas/vector.py:113-136: a
    null cell list becomes [None]; an EMPTY cell list still drops the
    row)."""
    geoms = list(df[geometry_column])
    nonnull_pos = [i for i, g in enumerate(geoms) if g is not None]
    rows, cells = vector.wkb_to_cells(
        [geoms[i] for i in nonnull_pos], resolution, containment_mode, compact
    )
    orig = np.asarray(nonnull_pos, dtype=np.int64)[rows]
    null_pos = np.array(
        [i for i, g in enumerate(geoms) if g is None], dtype=np.int64
    )
    all_rows = np.concatenate([orig, null_pos])
    all_cells = pd.array(
        list(cells.astype(object)) + [None] * len(null_pos), dtype="UInt64"
    )
    order = np.argsort(all_rows, kind="stable")
    out = df.drop(columns=[geometry_column]).iloc[all_rows[order]].reset_index(
        drop=True
    )
    out[cell_column_name] = all_cells[order]
    return out


def series_to_cells(
    s: pd.Series, resolution: int = 9, containment_mode: str = "containscentroid",
    compact: bool = False,
) -> pd.Series:
    """WKB series -> series of cell-list arrays (geoseries_to_cells)."""
    out = []
    for item in s:
        if item is None:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        geom = wkb.loads(item)
        out.append(polyfill.geometry_to_cells(geom, resolution, containment_mode, compact))
    return pd.Series(out, index=s.index)


def cells_dataframe_to_wkb(
    df: pd.DataFrame, cell_column_name: str = "cell",
    geometry_column: str = "geometry",
) -> pd.DataFrame:
    """Attach a WKB polygon column for the cell column
    (cells_dataframe_to_geodataframe without the geopandas dependency)."""
    cells = df[cell_column_name].to_numpy().astype(np.uint64)
    polys = vector.cells_to_wkb_polygons(cells)
    out = df.copy()
    out[geometry_column] = [p.as_py() for p in polys]
    return out


# Reference-name wrappers so h3ronpy.pandas.vector call sites port with
# the reference's POSITIONAL order intact
# (h3ronpy/python/h3ronpy/pandas/vector.py:52-110).  geopandas is absent
# here, so the "geodataframe"/"geoseries" forms take/return plain pandas
# objects with WKB-bytes geometry columns; the reference reads geometry
# from the gdf's active geometry column — here it is named by
# ``geometry_column`` (default "geometry").


def geodataframe_to_cells(
    df: pd.DataFrame,
    resolution: int,
    containment_mode: str = "containscentroid",
    compact: bool = False,
    cell_column_name: str = "cell",
    geometry_column: str = "geometry",
) -> pd.DataFrame:
    """Reference-signature explode (pandas/vector.py:74-110): the second
    POSITIONAL argument is the H3 resolution, like the reference —
    ``geodataframe_to_cells(gdf, 8)`` ports unchanged."""
    return dataframe_to_cells(
        df,
        geometry_column=geometry_column,
        resolution=resolution,
        containment_mode=containment_mode,
        compact=compact,
        cell_column_name=cell_column_name,
    )


# geoseries_to_cells(series, resolution, ...) and
# cells_dataframe_to_geodataframe(df, cell_column_name) already share the
# reference's positional order with their local names — plain aliases
geoseries_to_cells = series_to_cells
cells_dataframe_to_geodataframe = cells_dataframe_to_wkb


def raster_to_dataframe(
    in_raster: np.ndarray,
    transform,
    h3_resolution: int,
    nodata_value=None,
    axis_order: str = "yx",
    compact: bool = True,
    geo: bool = False,
) -> pd.DataFrame:
    """2D array -> DataFrame {value, cell}; geo=True adds WKB polygons
    (reference pandas/raster.py:16-65, same argument order and
    compact=True default).

    NOTE (round 5): the signature was rebased onto the reference's —
    ``axis_order`` now sits between ``nodata_value`` and ``compact`` and
    the ``compact`` default flipped False -> True; pass both by keyword
    if you relied on the earlier local order."""
    from . import raster as raster_mod

    t = raster_mod.raster_to_table(
        in_raster, transform, h3_resolution, nodata_value,
        axis_order=axis_order, compact=compact,
    )
    df = t.to_pandas()
    if geo:
        df = cells_dataframe_to_wkb(df)
    return df


def raster_to_geodataframe(*a, **kw) -> pd.DataFrame:
    """Reference pandas/raster.py:58-65: raster_to_dataframe(geo=True)
    (WKB geometry column here — geopandas is absent)."""
    kw["geo"] = True
    return raster_to_dataframe(*a, **kw)
