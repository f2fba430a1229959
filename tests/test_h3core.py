"""Core H3 codec tests: goldens from the reference's public test suite plus
exhaustive structural roundtrips.

Golden values mirror the reference's expectations
(h3ronpy/tests/arrow/test_utf8.py:73, test_coordinates.py:25-42,
test_resolution.py, test_compact.py) which were produced with Uber's h3
library; here they are hard-coded since h3 is not installed.
"""

import numpy as np
import pytest

from h3ray.h3core import bits, faceijk

GOLDEN_CELL_45_10_RES5 = np.uint64(0x851F9923FFFFFFF)
GOLDEN_CELL_SF_RES9 = np.uint64(0x8928308280FFFFF)


def all_cells_at_res(res: int) -> np.ndarray:
    cur = bits.set_base_cell(bits.init_cell(0, 122), np.arange(122, dtype=np.uint64))
    for r in range(1, res + 1):
        out = []
        pent = bits.is_pentagon(cur)
        for d in range(7):
            ch = bits.set_resolution(cur, np.full(len(cur), r, dtype=np.uint64))
            ch = bits.set_index_digit(ch, r, np.full(len(cur), d, dtype=np.uint64))
            out.append(ch[~(pent & (d == 1))])
        cur = np.concatenate(out)
    return cur


def test_latlng_to_cell_goldens():
    cells = faceijk.latlng_to_cell(
        np.array([45.5, 37.7752702151959]),
        np.array([10.2, -122.418307270836]),
        np.array([5, 9]),
    )
    assert cells[0] == GOLDEN_CELL_45_10_RES5
    assert cells[1] == GOLDEN_CELL_SF_RES9


def test_cell_to_latlng_within_cell():
    # reference: test_coordinates.py:12-22 (lat/lng in expected 1-degree box)
    cells = faceijk.latlng_to_cell(np.array([10.3]), np.array([45.1]), 8)
    lat, lng = faceijk.cell_to_latlng(cells)
    assert 10.0 < lat[0] < 11.0
    assert 45.0 < lng[0] < 46.0


@pytest.mark.parametrize("res", [0, 1, 2, 3])
def test_exhaustive_roundtrip(res):
    cells = all_cells_at_res(res)
    expected = {0: 122, 1: 842, 2: 5882, 3: 41162}[res]
    assert len(cells) == expected
    assert bits.is_valid_cell(cells).all()
    lat, lng = faceijk.cell_to_latlng(cells)
    back = faceijk.latlng_to_cell(lat, lng, res)
    assert (back == cells).all()


def test_random_roundtrip_deep():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.9, 89.9, 5000)
    lng = rng.uniform(-180.0, 180.0, 5000)
    for res in (5, 9, 12, 15):
        c = faceijk.latlng_to_cell(lat, lng, res)
        assert bits.is_valid_cell(c).all()
        la, lo = faceijk.cell_to_latlng(c)
        c2 = faceijk.latlng_to_cell(la, lo, res)
        assert (c2 == c).all()


def test_parent_child_bits():
    c = faceijk.latlng_to_cell(np.array([10.3]), np.array([45.1]), 8)
    p = bits.cell_to_parent(c, 5)
    assert bits.get_resolution(p)[0] == 5
    assert bits.is_valid_cell(p).all()
    cc = bits.cell_to_center_child(p, 8)
    assert bits.get_resolution(cc)[0] == 8
    # parent of center child is the original parent
    assert (bits.cell_to_parent(cc, 5) == p).all()


def test_validity():
    vals = np.array([45, GOLDEN_CELL_45_10_RES5, 0], dtype=np.uint64)
    assert list(bits.is_valid_cell(vals)) == [False, True, False]


def test_hex_strings():
    s = bits.to_hex_strings(np.array([GOLDEN_CELL_45_10_RES5], dtype=np.uint64))
    assert s[0] == "851f9923fffffff"
    vals, ok = bits.parse_hex_strings(["851f9923fffffff", "nope"])
    assert ok[0] and not ok[1]
    assert vals[0] == GOLDEN_CELL_45_10_RES5


def test_pentagon_count():
    for res in (0, 1, 2):
        cells = all_cells_at_res(res)
        assert bits.is_pentagon(cells).sum() == 12


class TestBoundary:
    def test_area_goldens(self):
        # reference: tests/arrow/test_measure.py:8-21
        from h3ray.h3core import boundary

        cells = faceijk.latlng_to_cell(
            np.array([10.3] * 3), np.array([45.1] * 3), np.array([8, 5, 3])
        )
        areas = boundary.cells_area_km2(cells)
        assert int(areas[0] * 100) == 62
        assert int(areas[1]) == 213
        assert int(areas[2]) == 10456

    def test_pentagon_published_areas(self):
        from h3ray.h3core import boundary

        res0 = bits.set_base_cell(bits.init_cell(0, 122), np.arange(122, dtype=np.uint64))
        pents = res0[bits.is_pentagon(res0)]
        a0 = boundary.cells_area_km2(pents)
        assert np.allclose(a0, 2562182.16295, atol=1e-3)
        p1 = bits.set_index_digit(
            bits.set_resolution(pents, np.full(12, 1, dtype=np.uint64)),
            1,
            np.zeros(12, dtype=np.uint64),
        )
        assert np.allclose(boundary.cells_area_km2(p1), 328434.5853, atol=1e-2)

    def test_sphere_partition(self):
        import math

        from h3ray.h3core import boundary

        sphere = 4 * math.pi * 6371.007180918475**2
        for res in (1, 2):
            tot = boundary.cells_area_km2(all_cells_at_res(res)).sum()
            assert abs(tot - sphere) < 1e-3

    def test_bounds_contain_centroid(self):
        # reference: tests/arrow/test_coordinates.py:45-75
        from h3ray.h3core import boundary

        cells = faceijk.latlng_to_cell(
            np.array([10.3, 10.3]), np.array([45.1, 45.1]), np.array([8, 5])
        )
        minx, miny, maxx, maxy = boundary.cells_bounds_arrays(cells)
        assert (minx < 45.1).all() and (maxx > 45.1).all()
        assert (miny < 10.3).all() and (maxy > 10.3).all()

    def test_vertex_counts(self):
        from h3ray.h3core import boundary

        res0 = bits.set_base_cell(bits.init_cell(0, 122), np.arange(122, dtype=np.uint64))
        pents = res0[bits.is_pentagon(res0)]
        _, _, off = boundary.cell_boundary(pents)
        assert (np.diff(off) == 5).all()  # class II pentagon
        p1 = bits.set_index_digit(
            bits.set_resolution(pents, np.full(12, 1, dtype=np.uint64)),
            1,
            np.zeros(12, dtype=np.uint64),
        )
        _, _, off1 = boundary.cell_boundary(p1)
        assert (np.diff(off1) == 10).all()  # class III pentagon distortion


def test_derived_table_cache_not_stale(tmp_path):
    """Regenerate all derived tables from scratch in a subprocess and compare
    against the cached module tables."""
    import os
    import subprocess
    import sys

    out = tmp_path / "fresh.npz"
    code = (
        "import numpy as np; import h3ray.h3core.faceijk as f; "
        "import h3ray.h3core.traversal as t; "
        f"np.savez(r'{out}', fc=f.FACE_IJK_BASE_CELLS, fr=f.FACE_IJK_BASE_CELL_CCWROT, "
        "ff=f.FACE_NEIGHBOR_FACE, bn=t.BASE_CELL_NEIGHBORS, br=t.BASE_CELL_NEIGHBOR_ROTS)"
    )
    env = dict(os.environ)
    env["H3RAY_DISABLE_TABLE_CACHE"] = "1"
    subprocess.run([sys.executable, "-c", code], env=env, check=True, cwd="/root/repo")
    from h3ray.h3core import faceijk as f
    from h3ray.h3core import traversal as t

    with np.load(out) as z:
        assert (z["fc"] == f.FACE_IJK_BASE_CELLS).all()
        assert (z["fr"] == f.FACE_IJK_BASE_CELL_CCWROT).all()
        assert (z["ff"] == f.FACE_NEIGHBOR_FACE).all()
        assert (z["bn"] == t.BASE_CELL_NEIGHBORS).all()
        assert (z["br"] == t.BASE_CELL_NEIGHBOR_ROTS).all()
