"""Property-based tests (hypothesis) over the core codec."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from h3ray.h3core import bits, boundary, faceijk, hierarchy


coords = st.tuples(
    st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
    st.floats(min_value=-179.99, max_value=179.99, allow_nan=False),
    st.integers(min_value=0, max_value=15),
)


@settings(max_examples=200, deadline=None)
@given(coords)
def test_encode_decode_roundtrip(c):
    lat, lng, res = c
    cell = faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    assert bits.is_valid_cell(cell).all()
    la, lo = faceijk.cell_to_latlng(cell)
    again = faceijk.latlng_to_cell(la, lo, res)
    assert again[0] == cell[0]
    # the input point is within the cell circumradius of the centroid
    d = boundary.great_circle_distance_rads(
        np.radians([lat]), np.radians([lng]), np.radians(la), np.radians(lo)
    )[0]
    # res-0 circumradius is < 0.21 rad; each res shrinks by sqrt(7)
    assert d < 0.22 / (7 ** (res / 2)) * 2.66


@settings(max_examples=100, deadline=None)
@given(coords)
def test_parent_contains_direct_child_center(c):
    # only DIRECT children: deeper descendants' centers can legitimately
    # fall outside an ancestor's hexagon (aperture-7 fractal overhang)
    lat, lng, res = c
    if res == 0:
        return
    cell = faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    parent = bits.cell_to_parent(cell, np.uint64(res - 1))
    direct = faceijk.latlng_to_cell(*faceijk.cell_to_latlng(cell), res - 1)
    assert parent[0] == direct[0]


@settings(max_examples=50, deadline=None)
@given(coords)
def test_compact_uncompact_roundtrip(c):
    lat, lng, res = c
    res = max(1, min(res, 9))
    cell = faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res - 1)
    ch = hierarchy.uncompact(cell, res)
    out = hierarchy.compact(ch)
    assert len(out) == 1 and out[0] == cell[0]


@settings(max_examples=100, deadline=None)
@given(coords)
def test_string_roundtrip(c):
    lat, lng, res = c
    cell = faceijk.latlng_to_cell(np.array([lat]), np.array([lng]), res)
    s = bits.to_hex_strings(cell)
    back, ok = bits.parse_hex_strings(list(s))
    assert ok.all() and back[0] == cell[0]
