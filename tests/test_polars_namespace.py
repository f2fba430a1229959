"""h3ray.polars — the h3ronpy.polars drop-in namespace (reference:
h3ronpy/python/h3ronpy/polars.py:39-228).  No Ray involved; pure
Series/Expr sugar over the array kernels."""

import numpy as np
import pytest

pl = pytest.importorskip("polars")

import h3ray.polars  # noqa: E402,F401  (registers the namespaces)
from h3ray.h3core import bits, faceijk  # noqa: E402


@pytest.fixture()
def cells_series():
    cells = faceijk.latlng_to_cell(
        np.array([45.5, 37.77, -33.9]), np.array([10.2, -122.42, 151.2]), 5
    )
    return pl.Series("cell", cells.astype(np.uint64))


def test_expr_namespace_core(cells_series):
    df = pl.DataFrame({"cell": cells_series})
    res = df.select(pl.col("cell").h3.cells_resolution())
    assert res.columns == ["resolution"]  # reference alias contract
    assert res["resolution"].to_list() == [5, 5, 5]
    assert df.select(pl.col("cell").h3.cells_valid())["cells_valid"].all()
    hexes = df.select(pl.col("cell").h3.cells_to_string()).to_series()
    assert hexes[0] == "851f9923fffffff"
    back = (
        hexes.to_frame().select(pl.col(hexes.name).h3.cells_parse()).to_series()
    )
    assert back.to_list() == cells_series.cast(pl.UInt64).to_list()


def test_parse_failure_semantics():
    s = pl.Series("s", ["851f9923fffffff", "nonsense"])
    with pytest.raises(Exception, match="non-parsable"):
        s.h3.cells_parse()
    out = s.h3.cells_parse(set_failing_to_invalid=True)
    assert out[0] is not None and out[1] is None


def test_series_shortcuts_traversal_hierarchy(cells_series):
    s = cells_series
    disk = s.h3.grid_disk(1)
    assert disk.dtype == pl.List(pl.UInt64)
    assert all(len(x) == 7 for x in disk.to_list())
    assert len(s.h3.grid_disk(1, flatten=True)) == 21
    up = s.h3.change_resolution(2)
    assert (up.h3.cells_resolution() == 2).all()
    down = s.h3.change_resolution(6)
    assert len(down) == 21 and (down.h3.cells_resolution() == 6).all()
    lst = s.h3.change_resolution_list(6)
    assert all(len(x) == 7 for x in lst.to_list())
    kids = s[:1].h3.change_resolution(6)
    assert kids.h3.compact().to_list() == s[:1].cast(pl.UInt64).to_list()
    assert sorted(s[:1].h3.change_resolution(6).to_list()) == sorted(
        s[:1].h3.compact().h3.uncompact(6).to_list()
    )


def test_series_shortcuts_measures_and_strings(cells_series):
    s = cells_series
    km2 = s.h3.cells_area_km2()
    assert km2.dtype == pl.Float64 and (km2 > 200).all()
    assert (s.h3.cells_area_m2().to_numpy() / km2.to_numpy() > 1e5).all()
    assert (s.h3.cells_area_rads2() > 0).all()
    # vertex / edge strings roundtrip through their parsers
    from h3ray.h3core import vertex as vertex_mod
    from h3ray.vector import cells_to_directededges

    _, vx = vertex_mod.cells_to_vertexes(s.to_numpy().astype(np.uint64))
    vs = pl.Series("v", vx[:4])
    assert vs.h3.vertexes_valid().all()
    assert (
        vs.h3.vertexes_to_string().h3.vertexes_parse().to_list() == vs.to_list()
    )
    _, ed = cells_to_directededges(s.to_numpy().astype(np.uint64))
    es = pl.Series("e", ed[:4])
    assert es.h3.directededges_valid().all()
    assert (
        es.h3.directededges_to_string().h3.directededges_parse().to_list()
        == es.to_list()
    )


def test_change_resolution_list_pentagon():
    # pentagon subtrees have 1+5(7^m-1)/6-shaped counts, not 7**depth:
    # offsets must come from the actual expansion (41 at depth 2)
    p = bits.set_base_cell(bits.init_cell(0, 1), np.array([4], dtype=np.uint64))
    hexc = bits.set_base_cell(bits.init_cell(0, 1), np.array([10], dtype=np.uint64))
    s = pl.Series("c", np.concatenate([p, hexc]).astype(np.uint64))
    lst = s.h3.change_resolution_list(2)
    assert [len(x) for x in lst.to_list()] == [41, 49]
    assert len(s.h3.change_resolution(2)) == 90
