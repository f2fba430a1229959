"""Reference-parity top-level array API (h3ray.arrays / h3ray.*).

Mirrors the surface of h3ronpy/python/h3ronpy/__init__.py:66-290: same
names, same signatures, same null/failure semantics, same output column
names.  Pure NumPy/Arrow — no Ray session needed.
"""

import numpy as np
import pyarrow as pa
import pytest

import h3ray as h
from h3ray.h3core import bits, traversal

GOLDEN = 0x851F9923FFFFFFF  # latlng(45.5, 10.2, res 5)


def test_top_level_names_match_reference():
    # the reference's COMPLETE __all__, all 28 entries
    # (h3ronpy/python/h3ronpy/__init__.py:289-318)
    ref_all = [
        "H3_CRS", "DEFAULT_CELL_COLUMN_NAME", "ContainmentMode", "version",
        "change_resolution", "change_resolution_list",
        "change_resolution_paired", "cells_resolution", "cells_parse",
        "vertexes_parse", "directededges_parse", "compact", "uncompact",
        "cells_valid", "vertexes_valid", "directededges_valid",
        "grid_disk", "grid_disk_distances", "grid_ring_distances",
        "grid_disk_aggregate_k", "cells_area_m2", "cells_area_km2",
        "cells_area_rads2", "cells_to_string", "vertexes_to_string",
        "directededges_to_string", "cells_to_localij", "localij_to_cells",
    ]
    assert len(ref_all) == 28
    missing = [n for n in ref_all if not hasattr(h, n)]
    assert not missing, missing
    assert h.H3_CRS == "EPSG:4326"
    assert h.DEFAULT_CELL_COLUMN_NAME == "cell"
    assert isinstance(h.version(), str) and h.version() == h.__version__


def test_cells_parse_three_forms_and_failure_modes():
    out = h.cells_parse(
        ["851f9923fffffff", str(GOLDEN), "10.2,45.5,5", "10.2;45.5;5"]
    )
    assert out.to_pylist() == [GOLDEN] * 4
    with pytest.raises(ValueError):
        h.cells_parse(["not-a-cell"])
    soft = h.cells_parse(["not-a-cell", "851f9923fffffff"],
                         set_failing_to_invalid=True)
    assert soft.to_pylist() == [None, GOLDEN]


def test_resolution_string_area_null_propagation():
    arr = pa.array([GOLDEN, None], type=pa.uint64())
    assert h.cells_resolution(arr).to_pylist() == [5, None]
    assert h.cells_to_string(arr).to_pylist() == ["851f9923fffffff", None]
    km2 = h.cells_area_km2(arr).to_pylist()
    assert km2[1] is None and 100 < km2[0] < 500
    assert h.cells_area_m2(arr)[0].as_py() == pytest.approx(
        km2[0] * 1e6, rel=1e-9
    )
    assert h.cells_area_rads2(arr)[1].as_py() is None


def test_valid_wrappers_both_forms():
    arr = pa.array([GOLDEN, 12345], type=pa.uint64())
    assert h.cells_valid(arr, booleanarray=True).to_pylist() == [True, False]
    assert h.cells_valid(arr).to_pylist() == [GOLDEN, None]
    # a cell is not a vertex / directed edge (mode bits differ)
    assert h.vertexes_valid(arr, booleanarray=True).to_pylist() == [
        False, False
    ]
    assert h.directededges_valid(arr, booleanarray=True).to_pylist() == [
        False, False
    ]


def test_change_resolution_family():
    one = pa.array([GOLDEN], type=pa.uint64())
    up = h.change_resolution(one, 4)
    assert len(up) == 1 and h.cells_resolution(up).to_pylist() == [4]
    down = h.change_resolution(one, 6)
    assert len(down) == 7  # hexagon -> 7 children
    # nulls and invalids omitted entirely
    assert len(h.change_resolution(
        pa.array([GOLDEN, None, 7], type=pa.uint64()), 5
    )) == 1
    # list form: positions preserved, null stays null
    lst = h.change_resolution_list(
        pa.array([GOLDEN, None], type=pa.uint64()), 6
    )
    py = lst.to_pylist()
    assert len(py[0]) == 7 and py[1] is None
    paired = h.change_resolution_paired(one, 6)
    assert paired.column_names == ["cell_before", "cell_after"]
    assert paired.column("cell_before").to_pylist() == [GOLDEN] * 7
    assert sorted(paired.column("cell_after").to_pylist()) == sorted(
        x for x in down.to_pylist()
    )


def test_compact_uncompact_roundtrip_and_heterogen():
    one = pa.array([GOLDEN], type=pa.uint64())
    u = h.uncompact(one, 7)
    assert len(u) == 49
    assert h.compact(u).to_pylist() == [GOLDEN]
    parent = bits.cell_to_parent(np.array([GOLDEN], dtype=np.uint64), 4)
    mixed = pa.array([GOLDEN, int(parent[0])], type=pa.uint64())
    with pytest.raises(ValueError, match="heterogen"):
        h.compact(mixed)
    # GOLDEN is covered by its own res-4 parent -> only the parent survives
    # (h3o compact_mixed containment pruning)
    assert h.compact(mixed, mixed_resolutions=True).to_pylist() == [
        int(parent[0])
    ]


def test_grid_disk_family_shapes_and_names():
    arr = pa.array([GOLDEN, None], type=pa.uint64())
    lists = h.grid_disk(arr, 1)
    py = lists.to_pylist()
    assert len(py[0]) == 7 and py[1] is None
    flat = h.grid_disk(pa.array([GOLDEN], type=pa.uint64()), 1, flatten=True)
    assert sorted(flat.to_pylist()) == sorted(py[0])

    gdd = h.grid_disk_distances(arr, 1)
    assert gdd.column_names == ["cell", "k"]
    assert gdd.num_rows == 2 and gdd.column("cell").to_pylist()[1] is None
    assert sorted(gdd.column("k").to_pylist()[0]) == [0] + [1] * 6

    gddf = h.grid_disk_distances(
        pa.array([GOLDEN], type=pa.uint64()), 1, flatten=True
    )
    assert gddf.num_rows == 7 and set(gddf.column("k").to_pylist()) == {0, 1}

    ring = h.grid_ring_distances(
        pa.array([GOLDEN], type=pa.uint64()), 1, 1, flatten=True
    )
    assert set(ring.column("k").to_pylist()) == {1} and ring.num_rows == 6


def test_grid_disk_aggregate_k_min_max():
    origins = h.grid_disk(pa.array([GOLDEN], type=pa.uint64()), 1,
                          flatten=True)
    mn = h.grid_disk_aggregate_k(origins, 1, "min")
    assert mn.column_names == ["cell", "k"]
    # every origin is in its own disk at k=0
    as_map = dict(zip(mn.column("cell").to_pylist(),
                      mn.column("k").to_pylist()))
    for o in origins.to_pylist():
        assert as_map[o] == 0
    mx = h.grid_disk_aggregate_k(origins, 1, "max")
    assert max(mx.column("k").to_pylist()) == 1
    with pytest.raises(ValueError):
        h.grid_disk_aggregate_k(origins, 1, "sum")


def test_localij_roundtrip_and_failure_mode():
    neigh = h.grid_disk(pa.array([GOLDEN], type=pa.uint64()), 2,
                        flatten=True)
    ij = h.cells_to_localij(neigh, GOLDEN)
    assert ij.column_names == ["i", "j", "anchor"]
    assert ij.column("i").type == pa.int32()
    back = h.localij_to_cells(GOLDEN, ij.column("i"), ij.column("j"))
    assert sorted(back.to_pylist()) == sorted(neigh.to_pylist())
    # per-row anchor array form
    anchors = pa.array([GOLDEN] * len(neigh), type=pa.uint64())
    ij2 = h.cells_to_localij(neigh, anchors)
    assert ij2.column("i").to_pylist() == ij.column("i").to_pylist()
    # resolution mismatch fails loudly, or nullifies with the flag
    coarse = pa.array(
        [int(bits.cell_to_parent(np.array([GOLDEN], np.uint64), 4)[0])],
        type=pa.uint64(),
    )
    with pytest.raises(ValueError):
        h.cells_to_localij(coarse, GOLDEN)
    soft = h.cells_to_localij(coarse, GOLDEN, set_failing_to_invalid=True)
    assert soft.column("i").to_pylist() == [None]


def test_parse_string_roundtrips_vertex_edge():
    cells = np.array([GOLDEN], dtype=np.uint64)
    from h3ray import vector
    vx = np.unique(vector.cells_to_vertexes(cells)[1]) if isinstance(
        vector.cells_to_vertexes(cells), tuple
    ) else np.unique(vector.cells_to_vertexes(cells))
    vs = h.vertexes_to_string(pa.array(vx, type=pa.uint64()))
    assert h.vertexes_parse(vs).to_pylist() == vx.tolist()
    with pytest.raises(ValueError):
        h.vertexes_parse(["zzz"])
    _, edges = vector.cells_to_directededges(cells)
    es = h.directededges_to_string(pa.array(edges, type=pa.uint64()))
    assert h.directededges_parse(es).to_pylist() == edges.tolist()
    assert h.directededges_parse(
        ["zzz"], set_failing_to_invalid=True
    ).to_pylist() == [None]


def test_input_coercion_numpy_polars_list():
    res = h.cells_resolution(np.array([GOLDEN], dtype=np.uint64))
    assert res.to_pylist() == [5]
    assert h.cells_resolution([GOLDEN]).to_pylist() == [5]
    pl = pytest.importorskip("polars")
    s = pl.Series("c", [GOLDEN], dtype=pl.UInt64)
    assert h.cells_resolution(s).to_pylist() == [5]
    assert len(h.grid_disk(s, 1)[0]) == 7


def test_invalid_nonnull_cells_raise_like_reference():
    """The reference validates every non-null u64 on typed-array
    construction (crates/h3arrow/src/array/mod.rs:193-210) — garbage
    raises instead of propagating fabricated results."""
    bad = pa.array([GOLDEN, 12345], type=pa.uint64())
    for fn in (
        lambda a: h.grid_disk(a, 1),
        lambda a: h.grid_disk_distances(a, 1),
        lambda a: h.grid_ring_distances(a, 1, 1),
        lambda a: h.grid_disk_aggregate_k(a, 1, "min"),
        h.cells_resolution,
        h.cells_area_km2,
        h.cells_to_string,
        lambda a: h.uncompact(a, 7),
        lambda a: h.change_resolution_paired(a, 6),
        lambda a: h.compact(a, mixed_resolutions=True),
    ):
        with pytest.raises(ValueError, match="invalid"):
            fn(bad)
    # change_resolution / change_resolution_list stay permissive by the
    # reference's own documented semantics (omitted resp. nulled)
    assert len(h.change_resolution(bad, 5)) == 1
    assert h.change_resolution_list(bad, 5).to_pylist()[1] is None
    # nulls are never an error
    assert h.cells_resolution(
        pa.array([GOLDEN, None], type=pa.uint64())
    ).to_pylist() == [5, None]


def test_localij_and_parse_null_passthrough():
    """Nulls flow through as null rows without raising (reference
    localij.rs:115-135 / string.rs null semantics); only real failures
    on non-null rows raise."""
    cells = pa.array([GOLDEN, None], type=pa.uint64())
    ij = h.cells_to_localij(cells, GOLDEN)  # must NOT raise
    assert ij.column("i").to_pylist()[1] is None
    assert ij.column("i").to_pylist()[0] is not None

    own = h.cells_to_localij(pa.array([GOLDEN], type=pa.uint64()), GOLDEN)
    i0, j0 = own.column("i")[0].as_py(), own.column("j")[0].as_py()
    back = h.localij_to_cells(
        GOLDEN,
        pa.array([i0, None], type=pa.int32()),
        pa.array([j0, j0], type=pa.int32()),
    )  # must NOT raise
    assert back.to_pylist()[1] is None and back.to_pylist()[0] == GOLDEN

    from h3ray import vector

    real_vx = int(
        vector.cell_to_vertex(np.array([GOLDEN], dtype=np.uint64), 0)[0]
    )
    vx = h.vertexes_parse(pa.array([f"{real_vx:x}", None]))
    assert vx.to_pylist() == [real_vx, None] and vx.null_count == 1
    de = h.directededges_parse(pa.array([None], type=pa.string()))
    assert de.to_pylist() == [None]
