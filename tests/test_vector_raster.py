"""Vector (WKB/polyfill/edges) and raster tests mirroring the reference's
test_vector.py / test_raster.py strategies with synthetic geometries."""

import numpy as np
import pyarrow as pa
import pytest

from h3ray import raster, vector
from h3ray.h3core import bits, boundary, faceijk, hierarchy, polyfill, wkb

RECT = {
    "type": "Polygon",
    "rings": [
        np.array(
            [[13.0, 52.3], [13.8, 52.3], [13.8, 52.7], [13.0, 52.7], [13.0, 52.3]]
        )
    ],
}


class TestPolyfill:
    def test_mode_nesting(self):
        cc = polyfill.polygon_to_cells(RECT, 7, "containscentroid")
        cb = polyfill.polygon_to_cells(RECT, 7, "containsboundary")
        ib = polyfill.polygon_to_cells(RECT, 7, "intersectsboundary")
        cv = polyfill.polygon_to_cells(RECT, 7, "covers")
        assert len(cb) < len(cc) < len(ib) <= len(cv)
        assert np.isin(cb, cc).all()
        assert np.isin(cc, ib).all()
        assert np.isin(ib, cv).all()

    def test_centroid_area_agreement(self):
        import math

        cc = polyfill.polygon_to_cells(RECT, 7, "containscentroid")
        rect_km2 = 0.8 * 0.4 * (111.32**2) * math.cos(math.radians(52.5))
        cells_km2 = boundary.cells_area_km2(cc).sum()
        assert abs(cells_km2 - rect_km2) / rect_km2 < 0.02

    def test_self_polygon(self):
        cell = faceijk.latlng_to_cell(np.array([52.5]), np.array([13.4]), 6)
        la, lo, off = boundary.cell_boundary(cell)
        ring = np.stack([lo, la], axis=1)
        ring = np.vstack([ring, ring[:1]])
        got = polyfill.polygon_to_cells({"type": "Polygon", "rings": [ring]}, 6)
        assert len(got) == 1 and got[0] == cell[0]

    def test_hole(self):
        hole = np.array(
            [[13.3, 52.45], [13.5, 52.45], [13.5, 52.55], [13.3, 52.55], [13.3, 52.45]]
        )[::-1]
        withhole = {"type": "Polygon", "rings": [RECT["rings"][0], hole]}
        cc = polyfill.polygon_to_cells(RECT, 7)
        ch = polyfill.polygon_to_cells(withhole, 7)
        assert len(ch) < len(cc)

    def test_covering_cell_mode_split(self):
        """A tiny polygon strictly inside one cell with no boundary contact:
        excluded from intersectsboundary (no boundary is touched), returned
        by covers — the exact distinction the reference draws
        (h3ronpy/src/vector.rs:53-60)."""
        cell = faceijk.latlng_to_cell(np.array([52.5]), np.array([13.4]), 5)
        clat, clng = faceijk.cell_to_latlng(cell)
        d = 0.0005  # ~50 m box centered on the cell centroid
        tiny = {
            "type": "Polygon",
            "rings": [np.array(
                [[clng[0] - d, clat[0] - d], [clng[0] + d, clat[0] - d],
                 [clng[0] + d, clat[0] + d], [clng[0] - d, clat[0] + d],
                 [clng[0] - d, clat[0] - d]]
            )],
        }
        ib = polyfill.polygon_to_cells(tiny, 5, "intersectsboundary")
        cv = polyfill.polygon_to_cells(tiny, 5, "covers")
        assert len(ib) == 0
        assert list(cv) == [cell[0]]

    def test_containsboundary_hole_on_centroid(self):
        """A hole smaller than the cell sitting exactly on its centroid must
        NOT exclude the cell from containsboundary — the contract is about
        the cell BOUNDARY being inside the polygon (vector.rs:44), not the
        centroid."""
        cell = faceijk.latlng_to_cell(np.array([52.5]), np.array([13.4]), 5)
        clat, clng = faceijk.cell_to_latlng(cell)
        d = 0.0005
        hole = np.array(
            [[clng[0] - d, clat[0] - d], [clng[0] + d, clat[0] - d],
             [clng[0] + d, clat[0] + d], [clng[0] - d, clat[0] + d],
             [clng[0] - d, clat[0] - d]]
        )[::-1]
        big = {"type": "Polygon", "rings": [RECT["rings"][0], hole]}
        cb = polyfill.polygon_to_cells(big, 5, "containsboundary")
        assert cell[0] in cb

    def test_invalid_digit_neighbor_flagged_not_crash(self):
        """A cell carrying INVALID_DIGIT (7) inside its res range fails
        per-row with E_CELL_INVALID (C parity), not IndexError for the
        whole batch."""
        from h3ray.h3core import bits, traversal

        good = faceijk.latlng_to_cell(np.array([52.5]), np.array([13.4]), 3)
        # corrupt the FINEST digit (visited first by the neighbor walk; a
        # coarser unvisited digit passes through like in the C algorithm)
        bad = bits.set_index_digit(good.copy(), 3, np.uint64(7))
        both = np.concatenate([good, bad])
        nbr, _, err = traversal.neighbor_rotations(both, 2)
        assert err[0] == 0 and err[1] == traversal.E_CELL_INVALID
        assert bits.is_valid_cell(nbr[:1]).all()

    def test_degenerate(self):
        # reference: tests/pandas/test_vector.py:78-97
        deg = {
            "type": "Polygon",
            "rings": [np.array([[10.0, 50.0]] * 4)],
        }
        assert len(polyfill.polygon_to_cells(deg, 7)) == 0

    def test_compact_polyfill(self):
        out = polyfill.geometry_to_cells(RECT, 7, compact=True)
        full = polyfill.geometry_to_cells(RECT, 7)
        assert len(out) < len(full)
        back = hierarchy.uncompact(out, 7)
        assert np.array_equal(np.sort(back), np.sort(full))

    def test_point_and_line(self):
        pt = {"type": "Point", "coords": np.array([[13.4, 52.5]])}
        assert len(polyfill.geometry_to_cells(pt, 9)) == 1
        line = {
            "type": "LineString",
            "coords": np.array([[13.0, 52.0], [13.5, 52.5]]),
        }
        cells = polyfill.geometry_to_cells(line, 7)
        assert len(cells) > 10
        assert bits.is_valid_cell(cells).all()


class TestWkb:
    def test_roundtrip(self):
        ring = RECT["rings"][0]
        g = wkb.loads(wkb.dumps_polygon([ring]))
        assert g["type"] == "Polygon"
        assert np.allclose(g["rings"][0], ring)
        g = wkb.loads(wkb.dumps_point(1.5, -2.5))
        assert g["coords"][0][0] == 1.5
        g = wkb.loads(wkb.dumps_linestring(ring))
        assert np.allclose(g["coords"], ring)

    def test_errors(self):
        with pytest.raises(wkb.WKBError):
            wkb.loads(b"\x01\x03")
        with pytest.raises(wkb.WKBError):
            wkb.loads(b"")

    def test_geo_interface(self):
        obj = {"type": "Polygon", "coordinates": [RECT["rings"][0].tolist()]}
        g = wkb.geo_interface_to_geom(obj)
        cells = polyfill.geometry_to_cells(g, 6)
        assert len(cells) > 0


class TestVectorOps:
    def test_kernel_explode(self):
        t = pa.table(
            {
                "id": pa.array([1, 2]),
                "geometry": pa.array(
                    [
                        wkb.dumps_polygon([RECT["rings"][0]]),
                        wkb.dumps_point(13.4, 52.5),
                    ],
                    type=pa.large_binary(),
                ),
            }
        )
        out = vector.wkb_to_cells_kernel(t, resolution=7)
        ids = out.column("id").to_numpy(zero_copy_only=False)
        assert (ids == 2).sum() == 1
        assert (ids == 1).sum() > 100

    def test_edges(self):
        cells = faceijk.latlng_to_cell(np.array([52.5]), np.array([13.4]), 7)
        rows, edges = vector.cells_to_directededges(cells)
        assert len(edges) == 6
        assert bits.is_valid_directededge(edges).all()
        assert (vector.directededge_origin(edges) == cells[rows]).all()
        lens = vector.directededges_length(edges, "km")
        assert ((lens > 1.0) & (lens < 2.0)).all()  # res-7 edges ~1.2-1.4 km

    def test_dissolve(self):
        from h3ray.h3core import traversal

        c = faceijk.latlng_to_cell(np.array([52.5]), np.array([13.4]), 6)
        _, disk, _ = traversal.grid_disk_distances(c, 1)
        merged = vector.cells_to_wkb_polygons(disk, link_cells=True)
        g = wkb.loads(merged[0].as_py())
        assert g["type"] == "MultiPolygon"
        assert len(g["parts"]) == 1  # one connected component
        assert len(g["parts"][0]["rings"][0]) == 19  # 18 verts + closure

    def test_dissolve_annulus_has_hole(self):
        """A polyfilled annulus dissolves to ONE polygon with ONE hole
        (h3o dissolve hole semantics, crates/h3arrow/src/array/to_geo.rs:
        218-229): the inner ring is wound opposite and nested, not emitted
        as a second shell."""
        from h3ray.h3core import traversal

        c = faceijk.latlng_to_cell(np.array([20.0]), np.array([30.0]), 5)
        _, disk, dist = traversal.grid_disk_distances(c, 4)
        ann = disk[dist > 1]
        merged = vector.cells_to_wkb_polygons(ann, link_cells=True)
        g = wkb.loads(merged[0].as_py())
        assert len(g["parts"]) == 1
        rings = g["parts"][0]["rings"]
        assert len(rings) == 2  # shell + hole
        areas = [vector._ring_signed_area(np.asarray(r)) for r in rings]
        assert areas[0] > 0 and areas[1] < 0  # shell ccw, hole cw
        # the hole's vertices are inside the shell
        assert vector._point_in_ring(np.asarray(rings[1])[0], np.asarray(rings[0]))

    def test_localij_golden(self):
        from h3ray.h3core import localij

        anchor = np.array([0x85283473FFFFFFF], dtype=np.uint64)
        cell = np.array([0x8528342BFFFFFFF], dtype=np.uint64)
        i, j, ok = localij.cells_to_localij(cell, anchor)
        assert ok[0] and i[0] == 25 and j[0] == 13
        back, ok2 = localij.localij_to_cells(anchor, i, j)
        assert ok2[0] and back[0] == cell[0]


class TestRaster:
    def setup_method(self):
        self.t = raster.Transform(0.01, 0, 13.0, 0, -0.01, 53.0)
        self.arr = np.zeros((100, 100), dtype=np.int32)
        self.arr[:50, :50] = 1
        self.arr[:50, 50:] = 2
        self.arr[50:, :50] = 3
        self.arr[50:, 50:] = 4

    def test_nearest_resolution(self):
        assert raster.nearest_h3_resolution(self.arr.shape, self.t) == 8
        assert raster.nearest_h3_resolution(
            self.arr.shape, self.t, search_mode="smaller_than_pixel"
        ) >= 8

    def test_raster_to_cells(self):
        v, c = raster.raster_to_cells(self.arr, self.t, 8)
        assert bits.is_valid_cell(c).all()
        assert set(np.unique(v)) == {1, 2, 3, 4}
        v0, c0 = raster.raster_to_cells(self.arr, self.t, 8, nodata_value=1)
        assert 1 not in v0 and len(c0) < len(c)

    def test_compact(self):
        v, c = raster.raster_to_cells(self.arr, self.t, 8, compact=True)
        assert len(np.unique(bits.get_resolution(c))) > 1
        # uncompacting per value reproduces the uncompacted set
        vf, cf = raster.raster_to_cells(self.arr, self.t, 8)
        for val in (1, 2, 3, 4):
            back = hierarchy.uncompact(c[v == val], 8)
            assert np.array_equal(np.sort(back), np.sort(cf[vf == val]))

    def test_tile_pipeline_equals_whole(self, ray_session):
        import ray

        v, c = raster.raster_to_cells(self.arr, self.t, 8)
        ds = raster.tile_dataset(self.arr, self.t, tile_size=40)
        out = ds.map_batches(
            raster.make_tile_kernel(8), batch_format="pyarrow"
        ).take_all()
        tiled = np.sort(np.array([r["cell"] for r in out], dtype=np.uint64))
        assert np.array_equal(tiled, np.sort(c))

    def test_tile_pipeline_file_backed(self, ray_session, tmp_path):
        """File-backed tiles: rows carry only (path, window, transform) —
        no pixel payload ever sits in a dataset row or on the driver —
        and the result matches the whole-raster conversion exactly.
        A mixed union with in-memory payload tiles also works (mosaic
        of small + large rasters through one kernel)."""
        import ray

        p = str(tmp_path / "raster.npy")
        np.save(p, self.arr)
        ds = raster.tile_dataset_from_file(p, self.t, tile_size=40)
        assert "payload" not in ds.schema().names  # specs only
        out = ds.map_batches(
            raster.make_tile_kernel(8), batch_format="pyarrow"
        ).take_all()
        tiled = np.sort(np.array([r["cell"] for r in out], dtype=np.uint64))
        v, c = raster.raster_to_cells(self.arr, self.t, 8)
        assert np.array_equal(tiled, np.sort(c))

    def test_rasterize_roundtrip(self):
        v, c = raster.raster_to_cells(self.arr, self.t, 8)
        img, t2 = raster.rasterize_cells(c, v, (100, 100))
        assert img.shape == (100, 100)
        # strong agreement away from boundaries
        assert (img != 0).mean() > 0.9

    def test_wgs84_guard(self):
        with pytest.raises(ValueError, match="WGS84"):
            raster.raster_to_cells(
                np.zeros((10, 10)), raster.Transform(1e5, 0, 0, 0, -1e5, 0), 5
            )


def test_antimeridian_polyfill():
    ring = np.array(
        [[170.0, -10.0], [-170.0, -10.0], [-170.0, 10.0], [170.0, 10.0], [170.0, -10.0]]
    )
    whole = polyfill.polygon_to_cells({"type": "Polygon", "rings": [ring]}, 4)
    east = polyfill.polygon_to_cells(
        {"type": "Polygon", "rings": [np.array(
            [[170.0, -10], [180.0, -10], [180.0, 10], [170.0, 10], [170.0, -10]])]}, 4
    )
    west = polyfill.polygon_to_cells(
        {"type": "Polygon", "rings": [np.array(
            [[-180.0, -10], [-170.0, -10], [-170.0, 10], [-180.0, 10], [-180.0, -10]])]}, 4
    )
    assert np.array_equal(whole, np.union1d(east, west))


def test_polyfill_actor(ray_session):
    import ray

    t = pa.table(
        {
            "id": pa.array([1]),
            "geometry": pa.array(
                [wkb.dumps_polygon([RECT["rings"][0]])], type=pa.large_binary()
            ),
        }
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(
            vector.PolyfillActor,
            fn_constructor_kwargs={"resolution": 7},
            concurrency=1,
            batch_size=16,
            batch_format="pyarrow",
        )
        .take_all()
    )
    assert len(out) == len(polyfill.polygon_to_cells(RECT, 7))


def test_cells_parse_kernel():
    # reference: test_utf8.py:9-41 — hex, coordinate form "lng,lat,res",
    # nulls preserved, garbage raises unless set_failing_to_invalid
    from h3ray import kernels

    t = pa.table({"s": pa.array(["851f9923fffffff", None, "10.2, 45.5, 5"])})
    out = kernels.cells_parse(t, "s")
    assert out.column("cell").null_count == 1
    assert out.column("cell")[0].as_py() == out.column("cell")[2].as_py()
    with pytest.raises(ValueError, match="non-parsable"):
        kernels.cells_parse(pa.table({"s": pa.array(["nope"])}), "s")
    masked = kernels.cells_parse(
        pa.table({"s": pa.array(["nope"])}), "s", set_failing_to_invalid=True
    )
    assert masked.column("cell").null_count == 1


def test_transform_cmp():
    # reference: tests/test_transform.py
    assert raster.Transform(1, 1, 0, 1, 0, 1) == raster.Transform(1, 1, 0, 1, 0, 1)
    assert raster.Transform(1, 1, 0, 0, 0, 1) != raster.Transform(1, 1, 0, 1, 0, 1)
    # GDAL ordering (c, a, b, f, d, e) and rasterio (a, b, c, d, e, f)
    t = raster.Transform(0.1, 0.0, -10.0, 0.0, -0.1, 50.0)
    assert raster.Transform.from_gdal((-10.0, 0.1, 0.0, 50.0, 0.0, -0.1)) == t
    assert raster.Transform.from_rasterio((0.1, 0.0, -10.0, 0.0, -0.1, 50.0)) == t


def test_raster_axis_order_and_mode_enum():
    """axis_order='xy' transposes to the same cells as the 'yx' default;
    ContainmentMode enum values are accepted wherever mode strings are."""
    import h3ray
    from h3ray import raster
    from h3ray.h3core import polyfill

    t = raster.Transform(0.01, 0, 10.0, 0, -0.01, 50.0)
    arr = (np.arange(30 * 20).reshape(30, 20) % 5).astype(np.int32)
    v1, c1 = raster.raster_to_cells(arr, t, 8, nodata_value=0)
    v2, c2 = raster.raster_to_cells(arr.T, t, 8, nodata_value=0, axis_order="xy")
    assert np.array_equal(v1, v2) and np.array_equal(c1, c2)
    assert raster.nearest_h3_resolution(arr.shape, t) == raster.nearest_h3_resolution(
        arr.T.shape, t, axis_order="xy"
    )
    ring = np.array([[10.0, 49.9], [10.15, 49.9], [10.15, 50.0], [10.0, 50.0], [10.0, 49.9]])
    geom = {"type": "Polygon", "rings": [ring]}
    a = polyfill.polygon_to_cells(geom, 6, "contains_centroid")
    b = polyfill.polygon_to_cells(geom, 6, h3ray.ContainmentMode.ContainsCentroid)
    assert np.array_equal(a, b)
    import pytest

    with pytest.raises(ValueError, match="axis_order"):
        raster.raster_to_cells(arr, t, 8, axis_order="zz")


def test_polyfill_window_split_parity():
    """polygon_split_windows + clip_window concatenates to EXACTLY the
    unsplit polygon_to_cells result — all 4 containment modes, polygon
    with a hole and a multipolygon, no cell found twice."""
    import numpy as np

    from h3ray.h3core import polyfill

    outer = [[8.0, 47.0], [9.4, 47.0], [9.4, 48.2], [8.0, 48.2], [8.0, 47.0]]
    hole = [[8.5, 47.4], [9.0, 47.4], [9.0, 47.8], [8.5, 47.8], [8.5, 47.4]]
    poly = {"type": "Polygon", "rings": [np.array(outer), np.array(hole)]}
    mp = {
        "type": "MultiPolygon",
        "parts": [
            {"type": "Polygon", "rings": [np.array(outer), np.array(hole)]},
            {"type": "Polygon", "rings": [np.array(
                [[11.0, 46.0], [11.6, 46.0], [11.6, 46.5], [11.0, 46.5],
                 [11.0, 46.0]])]},
        ],
    }
    for geom in (poly, mp):
        for mode in ("containscentroid", "containsboundary",
                     "intersectsboundary", "covers"):
            full = polyfill.polygon_to_cells(geom, 7, mode)
            parts = []
            for win in polyfill.polygon_split_windows(geom, 3):
                parts.append(
                    polyfill.polygon_to_cells(geom, 7, mode, clip_window=win)
                )
            got = np.concatenate(parts) if parts else np.empty(0, np.uint64)
            assert len(got) == len(np.unique(got))  # ownership: no dup
            assert set(got.tolist()) == set(full.tolist()), (
                geom["type"], mode, len(got), len(full))


def test_polyfill_skew_routed_split(ray_session):
    """polyfill_skew_routed with split_cells: a big polygon fans out over
    split_grid^2 window tasks and the exploded output equals the plain
    kernel's output; compact=True with splitting is rejected."""
    import numpy as np
    import pyarrow as pa
    import ray

    from h3ray import vector
    from h3ray.h3core import wkb

    big = np.array(
        [[6.0, 44.0], [10.0, 44.0], [10.0, 47.5], [6.0, 47.5], [6.0, 44.0]]
    )
    small = np.array(
        [[12.0, 45.0], [12.1, 45.0], [12.1, 45.1], [12.0, 45.1], [12.0, 45.0]]
    )
    tbl = pa.table(
        {
            "gid": pa.array([0, 1], type=pa.int64()),
            "geometry": pa.array(
                [wkb.dumps_polygon([big]), wkb.dumps_polygon([small])],
                type=pa.large_binary(),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = vector.polyfill_skew_routed(
        ds, resolution=6, split_cells=1000, split_grid=3
    ).to_pandas()
    ref = vector.wkb_to_cells_kernel(tbl, resolution=6).to_pandas()
    for gid in (0, 1):
        got = set(out[out["gid"] == gid]["cell"])
        want = set(ref[ref["gid"] == gid]["cell"])
        assert got == want and len(got) > 0
    assert len(out) == len(ref)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="compact"):
        vector.polyfill_skew_routed(ds, resolution=6, compact=True,
                                    split_cells=1000)


def test_geodataframe_to_cells_reference_positional_order():
    """The reference's second positional argument is the RESOLUTION
    (h3ronpy pandas/vector.py:74-110); the ported name must accept
    `geodataframe_to_cells(df, 8)` unchanged."""
    import numpy as np
    import pandas as pd

    from h3ray import pandas_compat, vector
    from h3ray.h3core import faceijk

    cells = faceijk.latlng_to_cell(np.array([47.0]), np.array([8.0]), 4)
    poly = vector.cells_to_wkb_polygons(cells)[0].as_py()
    df = pd.DataFrame({"geometry": [poly], "tag": [7]})
    out = pandas_compat.geodataframe_to_cells(df, 6)  # positional res
    assert len(out) > 0 and (out["tag"] == 7).all()
    assert "cell" in out.columns


def test_polyfill_skew_routed_rejects_uncovered_tail(ray_session):
    """Caller-supplied tiers that leave a weight range unroutable (no
    (None, bs) terminator and split_cells not covering the remainder)
    fail loudly instead of silently dropping geometries."""
    import pytest as _pytest
    import ray

    from h3ray import vector

    ds = ray.data.from_items([{"geometry": None}])
    with _pytest.raises(ValueError, match="silently dropped"):
        vector.polyfill_skew_routed(ds, tiers=((4_096, 256), (65_536, 8)))
    with _pytest.raises(ValueError, match="silently dropped"):
        vector.polyfill_skew_routed(
            ds, tiers=((4_096, 256), (65_536, 8)), split_cells=100_000
        )


def test_raster_to_dataframe_reference_names():
    """Reference-name twins: raster.raster_to_dataframe (arrow Table,
    h3ronpy raster.py:77-84 argument order, compact=True default),
    pandas_compat.raster_to_dataframe / raster_to_geodataframe
    (pandas/raster.py:16-65)."""
    from h3ray import pandas_compat, raster

    t = raster.Transform(a=0.01, b=0, c=10.0, d=0, e=-0.01, f=46.0)
    arr = np.arange(100, dtype=np.int32).reshape(10, 10)
    tab = raster.raster_to_dataframe(arr, t, 7, nodata_value=0,
                                     compact=False)
    assert tab.column_names == ["value", "cell"] and tab.num_rows > 0
    # axis_order parity: the transposed array in "xy" yields the same cells
    tab_xy = raster.raster_to_dataframe(arr.T, t, 7, nodata_value=0,
                                        axis_order="xy", compact=False)
    assert sorted(tab_xy.column("cell").to_pylist()) == sorted(
        tab.column("cell").to_pylist()
    )
    df = pandas_compat.raster_to_dataframe(arr, t, 7, nodata_value=0,
                                           compact=False)
    assert list(df.columns) == ["value", "cell"] and len(df) == tab.num_rows
    gdf = pandas_compat.raster_to_geodataframe(arr, t, 7, nodata_value=0,
                                               compact=False)
    assert "geometry" in gdf.columns and len(gdf) == tab.num_rows
