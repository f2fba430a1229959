"""Run the operator surface over the FIXTURES.md tables (F1-F7 + F8
goldens)."""

import numpy as np
import pyarrow as pa

from h3ray import fixtures, kernels, raster, vector
from h3ray.h3core import bits, faceijk, wkb


def test_f1_cells_validity():
    t = fixtures.cells_table()
    out = kernels.cells_valid(t.drop_null(), booleanarray=True)
    valid = np.array(out.column("valid").to_pylist())
    res = np.array(out.column("res").to_pylist())
    assert (valid == (res != 255)).all()


def test_f2_points_encode():
    t = fixtures.points_table()
    lat = t.column("lat").to_numpy()
    lng = t.column("lng").to_numpy()
    res = t.column("res").to_numpy()
    cells = faceijk.latlng_to_cell(lat, lng, res)
    assert bits.is_valid_cell(cells).all()
    # pentagon centers encode to the pentagons themselves at res 0
    assert bits.is_pentagon(faceijk.latlng_to_cell(lat[:12], lng[:12], 0)).all()


def test_f3_parse():
    t = fixtures.cell_strings_table()
    out = kernels.cells_parse(t, "s", set_failing_to_invalid=True)
    got_ok = np.array(
        [v is not None for v in out.column("cell").to_pylist()]
    )
    assert (got_ok == np.array(t.column("expect_ok").to_pylist())).all()


def test_f4_polygons_explode():
    t = fixtures.polygons_table()
    out = vector.wkb_to_cells_kernel(t, resolution=5)
    names = set(out.column("name").to_pylist())
    assert "degenerate" not in names  # zero cells
    assert "antimeridian" in names
    assert "multi" in names
    assert bits.is_valid_cell(
        out.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
    ).all()


def test_f5_skewed_corpus():
    from h3ray import corpus

    t = fixtures.skewed_documents_table(1000)
    geo = corpus.extract_geo_spans(t)
    parsed = kernels.cells_parse(geo, "geo_text")
    cells = parsed.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
    parents = bits.cell_to_parent(cells, np.uint64(2))
    _, counts = np.unique(parents, return_counts=True)
    # hot boxes dominate: the 3 hottest res-2 cells hold most geo spans
    top3 = np.sort(counts)[-3:].sum()
    assert top3 > 0.5 * len(cells)


def test_f6_raster_tiles():
    t = fixtures.raster_tiles_table()
    k = raster.make_tile_kernel(6, nodata_value=0)
    out = k(t)
    assert out.num_rows > 0
    assert bits.is_valid_cell(
        out.column("cell").to_numpy(zero_copy_only=False).astype(np.uint64)
    ).all()
    assert 0 not in set(np.asarray(out.column("value").to_pylist(), dtype=float))


def test_f7_rasterize():
    t = fixtures.cell_values_table(2000)
    cells = t.column("h3index").to_numpy(zero_copy_only=False).astype(np.uint64)
    vals = t.column("pop_general").to_numpy()
    img, transform = raster.rasterize_cells(cells, vals, (120, 120), nodata_value=-1.0)
    assert img.shape == (120, 120)
    assert (img != -1.0).sum() > 100


def test_f8_goldens_extra():
    # change_resolution(latlng(10.3,45.1,8) -> 5) == 600436446234411007
    c = faceijk.latlng_to_cell(np.array([10.3]), np.array([45.1]), 8)
    p = bits.cell_to_parent(c, np.uint64(5))
    assert int(p[0]) == 600436446234411007
    # decimal-int parse accepted (F3 example)
    v, ok = bits.parse_hex_strings(["600436454824345599"])
    assert ok[0] and bits.is_valid_cell(v)[0]
    # NYC point -> cell -> point roundtrip, integer degrees preserved
    cell = faceijk.latlng_to_cell(np.array([40.7938]), np.array([-73.9575]), 8)
    la, lo = faceijk.cell_to_latlng(cell)
    assert int(la[0]) == 40 and int(lo[0]) == -73
