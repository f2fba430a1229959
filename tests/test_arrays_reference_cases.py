"""The reference's OWN arrow test cases, run against h3ray's top-level API.

Direct ports of h3ronpy/tests/arrow/{test_utf8,test_neighbor,test_localij,
test_resolution,test_compact,test_measure}.py — the `h3.api.numpy_int`
binding calls are replaced by h3ray's own encoder (goldens in
tests/test_h3core.py anchor that equivalence), arro3 types by pyarrow.
Same inputs, same asserted values.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

import h3ray as h
from h3ray.h3core import bits, faceijk


def _cell(lat: float, lng: float, res: int) -> int:
    return int(faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res)[0])


# --- test_utf8.py ------------------------------------------------------------


def test_cells_parse_ref():
    golden = _cell(45.5, 10.2, 5)
    strings = np.array([f"{golden:x}", "10.2, 45.5, 5"])
    cells = h.cells_parse(strings)
    assert len(cells) == 2
    assert cells[0] == cells[1]


def test_cells_parse_largeutf8_ref():
    cells = h.cells_parse(pa.array(["801ffffffffffff"], type=pa.large_utf8()))
    assert len(cells) == 1


def test_parse_cell_fail_ref():
    with pytest.raises(ValueError, match="non-parsable CellIndex"):
        h.cells_parse(np.array(["invalid"]))


def test_parse_cell_set_invalid_ref():
    cells = h.cells_parse(np.array(["invalid"]), set_failing_to_invalid=True)
    assert len(cells) == 1
    assert not cells[0].is_valid


def test_cells_valid_ref():
    arr = np.array([45, _cell(45.5, 10.2, 5)], dtype=np.uint64)
    cells = h.cells_valid(arr, booleanarray=False)
    assert len(cells) == 2
    assert cells.type == pa.uint64()
    assert not cells[0].is_valid and cells[1].is_valid
    bools = h.cells_valid(arr, booleanarray=True)
    assert bools.type == pa.bool_()
    assert bools.to_pylist() == [False, True]
    assert pa.array(cells).is_valid().to_pylist() == bools.to_pylist()


def test_cells_to_string_ref():
    strings = h.cells_to_string(
        np.array([_cell(45.5, 10.2, 5)], dtype=np.uint64)
    )
    assert strings.type == pa.large_utf8()
    assert strings[0].as_py() == "851f9923fffffff"


# --- test_neighbor.py --------------------------------------------------------

_NEIGH_CELLS = np.array(
    [_cell(10.3, 45.1, 8), _cell(5.3, -5.1, 8)], dtype=np.uint64
)


def test_grid_disk_ref():
    disks = h.grid_disk(_NEIGH_CELLS, 2)
    assert len(disks) == 2
    assert disks.type == pa.large_list(pa.uint64())
    disks_flat = h.grid_disk(_NEIGH_CELLS, 2, flatten=True)
    assert len(disks_flat) > 20
    assert disks_flat.type == pa.uint64()


def test_grid_disk_distances_ref():
    disks = h.grid_disk_distances(_NEIGH_CELLS, 2)
    assert disks.num_rows == len(_NEIGH_CELLS)
    assert disks.column("cell").type == pa.large_list(pa.uint64())
    assert disks.column("k").type == pa.large_list(pa.uint32())
    flat = h.grid_disk_distances(_NEIGH_CELLS, 2, flatten=True)
    centers_k = [
        k for c, k in zip(flat.column("cell").to_pylist(),
                          flat.column("k").to_pylist())
        if c in set(_NEIGH_CELLS.tolist())
    ]
    assert centers_k == [0, 0]


def test_grid_ring_distances_ref():
    disks = h.grid_ring_distances(_NEIGH_CELLS, 1, 2)
    assert disks.num_rows == len(_NEIGH_CELLS)
    assert disks.column("cell").type == pa.large_list(pa.uint64())
    assert disks.column("k").type == pa.large_list(pa.uint32())
    flat = h.grid_ring_distances(_NEIGH_CELLS, 1, 2, flatten=True)
    assert not set(_NEIGH_CELLS.tolist()) & set(
        flat.column("cell").to_pylist()
    )


def test_grid_disk_aggregate_k_ref():
    disks = h.grid_disk_aggregate_k(_NEIGH_CELLS, 2, "max")
    assert disks.column("cell").type == pa.uint64()
    assert disks.column("k").type == pa.uint32()


# --- test_localij.py (golden anchor/cell from the reference file) -------------

_ANCHORS = h.cells_parse(["85283473fffffff"])
_LIJ_CELLS = h.cells_parse(["8528342bfffffff"])


def test_cells_to_localij_array_ref():
    df = h.cells_to_localij(_LIJ_CELLS, _ANCHORS)
    assert df.num_rows == 1
    assert df.column("anchor").to_pylist() == _ANCHORS.to_pylist()
    assert df.column("i")[0].as_py() == 25
    assert df.column("j")[0].as_py() == 13


def test_cells_to_localij_single_anchor_ref():
    df = h.cells_to_localij(_LIJ_CELLS, _ANCHORS[0].as_py())
    assert df.num_rows == 1
    assert df.column("anchor").to_pylist() == _ANCHORS.to_pylist()
    assert (df.column("i")[0].as_py(), df.column("j")[0].as_py()) == (25, 13)


def test_localij_to_cells_ref():
    cells2 = h.localij_to_cells(
        _ANCHORS,
        pa.array([25], type=pa.int32()),
        pa.array([13], type=pa.int32()),
    )
    assert cells2.to_pylist() == _LIJ_CELLS.to_pylist()


# --- test_resolution.py --------------------------------------------------------


def test_change_resolution_up_ref():
    arr = np.array([_cell(10.2, 45.5, 5), _cell(10.3, 45.1, 8)],
                   dtype=np.uint64)
    changed = h.change_resolution(arr, 9)
    assert len(changed) == int(math.pow(7, 4)) + 7
    res = bits.get_resolution(
        np.array(changed.to_pylist(), dtype=np.uint64)
    )
    assert (res == 9).all()


def test_change_resolution_paired_up_ref():
    changed = h.change_resolution_paired(
        np.array([_cell(10.3, 45.1, 8)], dtype=np.uint64), 9
    )
    assert changed.num_rows == 7
    before = np.array(changed.column("cell_before").to_pylist(), np.uint64)
    after = np.array(changed.column("cell_after").to_pylist(), np.uint64)
    assert (bits.get_resolution(before) == 8).all()
    assert (bits.get_resolution(after) == 9).all()


def test_change_resolution_down_ref():
    arr = np.array([_cell(10.2, 45.5, 5), _cell(10.3, 45.1, 8)],
                   dtype=np.uint64)
    changed = h.change_resolution(arr, 4)
    assert len(changed) == 2
    assert (bits.get_resolution(
        np.array(changed.to_pylist(), np.uint64)
    ) == 4).all()


def test_cells_resolution_ref():
    res = h.cells_resolution(
        np.array([_cell(10.2, 45.5, 5), _cell(10.3, 45.1, 8)], np.uint64)
    )
    assert res.to_pylist() == [5, 8]


# --- test_compact.py ----------------------------------------------------------


def test_compact_ref():
    cell = _cell(10.3, 45.1, 8)
    children = h.change_resolution(np.array([cell], np.uint64), 10)
    compacted = h.compact(children)
    assert compacted.to_pylist() == [cell]


def test_compact_mixed_fail_ref():
    cell = _cell(10.3, 45.1, 8)
    parent = int(bits.cell_to_parent(np.array([cell], np.uint64), 4)[0])
    with pytest.raises(ValueError, match="heterogen"):
        h.compact([cell, parent])


def test_compact_mixed_ref():
    cell = _cell(10.3, 45.1, 8)
    finer = _cell(10.3, 45.1, 9)
    compacted = h.compact([cell, finer], mixed_resolutions=True)
    assert compacted.to_pylist() == [cell]


def test_uncompact_ref():
    assert len(h.uncompact([_cell(10.3, 45.1, 8)], 9)) == 7


# --- test_measure.py (exact integer-truncation goldens) -----------------------


def test_cells_area_km2_ref():
    cells = np.array(
        [_cell(10.3, 45.1, 8), _cell(10.3, 45.1, 5), _cell(10.3, 45.1, 3)],
        dtype=np.uint64,
    )
    areas = h.cells_area_km2(cells)
    assert len(areas) == 3
    assert int(areas[0].as_py() * 100) == 62
    assert int(areas[1].as_py()) == 213
    assert int(areas[2].as_py()) == 10456


# --- test_vector.py ------------------------------------------------------------


class _GeoShim:
    """Minimal __geo_interface__ carrier (shapely is absent here)."""

    def __init__(self, gi):
        self.__geo_interface__ = gi


def test_geometry_to_cells_ref():
    from h3ray import vector

    geom = _GeoShim({
        "type": "Polygon",
        "coordinates": [
            [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)]
        ],
    })
    cells = vector.geometry_to_cells(
        geom, 5, containment_mode=h.ContainmentMode.IntersectsBoundary
    )
    assert cells.dtype == np.uint64
    assert len(cells) > 10


def test_geometry_to_cells_central_park_ref():
    from h3ray import vector

    point = _GeoShim({"type": "Point", "coordinates": (-73.9575, 40.7938)})
    arr = vector.geometry_to_cells(point, 8)
    assert len(arr) == 1
    assert arr[0] == _cell(40.7938, -73.9575, 8)


def test_coordinate_values_are_not_equal_issue_58_ref():
    from h3ray import vector
    from h3ray.h3core import wkb

    lat, lon = 37.7749, -122.4194
    point = _GeoShim({"type": "Point", "coordinates": (lon, lat)})
    cells = vector.geometry_to_cells(point, 9)
    wkb_points = vector.cells_to_wkb_points(cells)
    assert len(wkb_points) == 1
    g = wkb.loads(wkb_points[0].as_py())
    assert g["type"] == "Point"
    x, y = g["coords"][0]
    assert int(lat) == int(y) and int(lon) == int(x)


# --- test_transform.py ----------------------------------------------------------


def test_transform_cmp_ref():
    from h3ray.raster import Transform

    assert Transform(1, 1, 0, 1, 0, 1) == Transform(1, 1, 0, 1, 0, 1)
    assert Transform(1, 1, 0, 0, 0, 1) != Transform(1, 1, 0, 1, 0, 1)


# --- pandas/test_vector.py -------------------------------------------------------


def test_cells_dataframe_to_geodataframe_ref():
    import pandas as pd

    from h3ray.pandas_compat import cells_dataframe_to_geodataframe
    from h3ray.h3core import wkb

    df = pd.DataFrame({"cell": [0x8009FFFFFFFFFFF], "id": [5]})
    gdf = cells_dataframe_to_geodataframe(df)
    assert len(gdf) == len(df)
    assert (gdf["cell"] == df["cell"]).all()
    assert (gdf["id"] == df["id"]).all()
    assert wkb.loads(gdf["geometry"][0])["type"] in ("Polygon", "MultiPolygon")


def test_cells_dataframe_to_geodataframe_empty_ref():
    # https://github.com/nmandery/h3ron/issues/17 — must not raise
    import pandas as pd

    from h3ray.pandas_compat import cells_dataframe_to_geodataframe

    gdf = cells_dataframe_to_geodataframe(pd.DataFrame({"cell": []}))
    assert gdf.empty


def test_geometry_results_in_no_cells_ref():
    """A polygon smaller than any res-4 cell with centroid containment
    yields zero cells without raising."""
    from h3ray import vector

    tiny = _GeoShim({
        "type": "Polygon",
        "coordinates": [[
            (1.100000, 4.50000), (1.100001, 4.50000), (1.100001, 4.50001),
            (1.100000, 4.50001), (1.100000, 4.50000),
        ]],
    })
    assert len(vector.geometry_to_cells(tiny, 4)) == 0


# --- polars/test_expr.py + test_series.py ---------------------------------------


def _some_cell_series():
    import polars as pl

    return pl.Series(
        np.array([_cell(10.3, 45.1, 8)], dtype=np.uint64)
    )


def test_series_cells_resolution_ref():
    import h3ray.polars as _  # noqa: F401 — registers the namespaces
    import polars as pl

    resolution = _some_cell_series().h3.cells_resolution()
    assert resolution.dtype == pl.UInt8
    assert resolution[0] == 8


def test_expr_cells_resolution_ref():
    import h3ray.polars as _  # noqa: F401
    import polars as pl

    df = (
        pl.DataFrame({"cells": _some_cell_series()})
        .lazy()
        .with_columns(
            [pl.col("cells").h3.cells_resolution().alias("resolution")]
        )
        .collect()
    )
    assert df["resolution"].dtype == pl.UInt8
    assert df["resolution"][0] == 8


def test_expr_grid_disk_ref():
    import h3ray.polars as _  # noqa: F401
    import polars as pl

    df = (
        pl.DataFrame({"cells": _some_cell_series()})
        .lazy()
        .with_columns([pl.col("cells").h3.grid_disk(1).alias("disk")])
        .collect()
    )
    assert df["disk"].dtype == pl.List
    assert df["disk"].dtype.inner == pl.UInt64
    assert len(df["disk"][0]) == 7


def test_series_change_resolution_golden_ref():
    """The reference's own u64 golden: the res-5 ancestor of the cell at
    (10.3, 45.1, res 8) is exactly 600436446234411007
    (h3ronpy/tests/polars/test_expr.py:60-65 — binding-independent
    constant, pins h3ray's encoder + parent walk bit-exactly)."""
    import h3ray.polars as _  # noqa: F401

    s = _some_cell_series()
    assert s.h3.cells_resolution()[0] == 8
    assert s.h3.change_resolution(5)[0] == 600436446234411007
