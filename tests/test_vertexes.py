"""Canonical vertex enumeration (h3core/vertex.py): cellToVertexes /
cellToVertex with the min-sharing-cell owner rule.

The Euler test is the canonicality proof: over EVERY cell of a whole
resolution (including all 12 pentagons and every icosahedron seam), the
distinct canonical vertexes must count exactly V = 2F - 4 (3-regular
corner graph: 6(F-12) + 5*12 = 3V) and every vertex must be emitted by
exactly 3 cells.  Any owner disagreement between two sharers would
inflate the distinct count and break the degree-3 invariant.
"""

import numpy as np
import pytest

from h3ray.h3core import bits, boundary, faceijk, traversal, vertex


@pytest.mark.parametrize("res", [0, 1, 2])
def test_euler_canonical_vertex_count(res):
    from .test_h3core import all_cells_at_res

    cells = all_cells_at_res(res)
    rows, vx = vertex.cells_to_vertexes(cells)
    pent = bits.is_pentagon(cells)
    counts = np.bincount(rows, minlength=len(cells))
    assert (counts[~pent] == 6).all() and (counts[pent] == 5).all()
    assert bits.is_valid_vertex(vx).all()
    uniq, inv = np.unique(vx, return_inverse=True)
    assert len(uniq) == 2 * len(cells) - 4
    assert (np.bincount(inv) == 3).all()


@pytest.mark.parametrize("res", [5, 15])
def test_neighbors_share_two_vertices(res):
    rng = np.random.default_rng(3)
    cells = faceijk.latlng_to_cell(
        rng.uniform(-85, 85, 60), rng.uniform(-180, 180, 60), res
    )
    rows, disk, dist = traversal.grid_disk_distances(cells, 1)
    m = dist == 1
    ra, va = vertex.cells_to_vertexes(cells[rows[m]])
    rb, vb = vertex.cells_to_vertexes(disk[m])
    offa = np.r_[0, np.cumsum(np.bincount(ra))]
    offb = np.r_[0, np.cumsum(np.bincount(rb))]
    for i in range(len(offa) - 1):
        shared = set(va[offa[i]:offa[i + 1]]) & set(vb[offb[i]:offb[i + 1]])
        assert len(shared) == 2  # an edge has exactly two endpoints


def test_vertex_positions_match_owner_corners():
    # the emitting cell's corner and the owner's corner are the same
    # point (bit-identical through independent faceijk paths)
    rng = np.random.default_rng(11)
    cells = faceijk.latlng_to_cell(
        rng.uniform(-85, 85, 100), rng.uniform(-180, 180, 100), 9
    )
    rows, vx = vertex.cells_to_vertexes(cells)
    from h3ray.vector import vertex_owner

    own = vertex_owner(vx)
    onum = bits.get_reserved(vx).astype(np.int64)
    vlat, vlng, _ = boundary.cell_true_vertices(cells)
    olat, olng, _ = boundary.cell_true_vertices(own)
    k = np.concatenate([np.arange(c) for c in np.bincount(rows)])
    r = np.arange(len(own))
    assert np.allclose(vlat[rows, k], olat[r, onum], atol=1e-12)
    assert np.allclose(vlng[rows, k], olng[r, onum], atol=1e-12)


def test_cell_to_vertex_and_mixed_res():
    cells9 = faceijk.latlng_to_cell(np.array([48.8]), np.array([2.35]), 9)
    cells5 = faceijk.latlng_to_cell(np.array([48.8]), np.array([2.35]), 5)
    mixed = np.concatenate([cells9, cells5])
    rows, vx = vertex.cells_to_vertexes(mixed)
    assert np.array_equal(np.bincount(rows), [6, 6])
    for v in range(6):
        got = vertex.cell_to_vertex(mixed, v)
        assert got[0] == vx[rows == 0][v] and got[1] == vx[rows == 1][v]
    # out-of-range vertex number -> 0
    assert (vertex.cell_to_vertex(mixed, 6) == 0).all()
    # pentagon: vertex 5 does not exist
    p = bits.set_base_cell(bits.init_cell(1, 1), np.array([38], dtype=np.uint64))
    p = bits.set_index_digit(p, 1, np.array([0], dtype=np.uint64))
    assert vertex.cell_to_vertex(p, 4)[0] != 0
    assert vertex.cell_to_vertex(p, 5)[0] == 0


def test_vertexes_kernel_and_wkb_roundtrip():
    import pyarrow as pa

    import struct

    from h3ray import kernels
    from h3ray.vector import vertexes_to_wkb_points

    cells = faceijk.latlng_to_cell(
        np.array([37.77, -33.9]), np.array([-122.4, 151.2]), 8
    )
    t = pa.table({"cell": pa.array(cells.astype(np.int64))})
    out = kernels.cells_to_vertexes(t)
    lists = out.column("vertexes")
    assert lists.type == pa.large_list(pa.int64())
    flat = kernels.cells_to_vertexes(t, flatten=True)
    assert len(flat) == 12
    vx = flat.column("vertexes").to_numpy(zero_copy_only=False).astype(np.uint64)
    # WKB points decode to the true corner coordinates of the cells
    pts = vertexes_to_wkb_points(vx)
    vlat, vlng, _ = boundary.cell_true_vertices(cells)
    for i in range(len(pts)):
        p = pts[i].as_py()
        x, y = struct.unpack_from("<dd", p, 5)  # 1B order + 4B type
        assert abs(x - vlng[i // 6, i % 6]) < 1e-12
        assert abs(y - vlat[i // 6, i % 6]) < 1e-12


@pytest.mark.parametrize("res", [0, 1, 2])
def test_icosahedron_faces_contract(res):
    """H3 maxFaceCount contract: hexagons intersect 1-2 faces, pentagons
    exactly 5 (they are centered on icosa vertices where 5 faces meet);
    the center face is always in the set; all 20 faces are covered."""
    from .test_h3core import all_cells_at_res

    cells = all_cells_at_res(res)
    rows, fcs = boundary.get_icosahedron_faces(cells)
    counts = np.bincount(rows, minlength=len(cells))
    pent = bits.is_pentagon(cells)
    assert (counts[pent] == 5).all()
    assert ((counts[~pent] >= 1) & (counts[~pent] <= 2)).all()
    assert np.array_equal(np.unique(fcs), np.arange(20))
    face_c, _, _ = faceijk.cell_to_faceijk(cells)
    pairs = set(zip(rows.tolist(), fcs.tolist()))
    assert all((i, int(face_c[i])) in pairs for i in range(len(cells)))
    assert ((fcs >= 0) & (fcs <= 19)).all()


def test_icosahedron_faces_kernel():
    import pyarrow as pa

    from h3ray import kernels

    cells = faceijk.latlng_to_cell(np.array([45.5]), np.array([10.2]), 5)
    t = pa.table({"cell": pa.array(cells.astype(np.int64))})
    out = kernels.get_icosahedron_faces(t)
    faces = out.column("faces").to_pylist()[0]
    assert 1 <= len(faces) <= 2 and faces == sorted(faces)
    # empty input
    rows, fcs = boundary.get_icosahedron_faces(np.array([], dtype=np.uint64))
    assert len(rows) == 0 and len(fcs) == 0


def test_cells_to_directededge_and_enumerations():
    """cellsToDirectedEdge roundtrip + error contract; getRes0Cells /
    getPentagons enumerations (H3 v4 API, beyond the reference)."""
    from h3ray import vector

    r0 = vector.get_res0_cells()
    assert len(r0) == 122 and bits.is_valid_cell(r0).all()
    assert bits.is_pentagon(r0).sum() == 12
    for res in (0, 7, 15):
        p = vector.get_pentagons(res)
        assert len(p) == 12 and bits.is_pentagon(p).all()
        assert (bits.get_resolution(p) == res).all()
    with pytest.raises(ValueError):
        vector.get_pentagons(16)

    cells = faceijk.latlng_to_cell(np.array([48.8, -33.9]), np.array([2.35, 151.2]), 7)
    rows, disk, dist = traversal.grid_disk_distances(cells, 2)
    m1 = dist == 1
    e, err = vector.cells_to_directededge(cells[rows[m1]], disk[m1])
    assert (err == 0).all() and bits.is_valid_directededge(e).all()
    assert np.array_equal(vector.directededge_origin(e), cells[rows[m1]])
    assert np.array_equal(vector.directededge_destination(e), disk[m1])
    # ring-2 / self -> err 3, res mismatch -> 2, invalid -> 1
    e2, err2 = vector.cells_to_directededge(cells[rows[dist == 2]], disk[dist == 2])
    assert (err2 == 3).all() and (e2 == 0).all()
    assert (vector.cells_to_directededge(cells, cells)[1] == 3).all()
    assert (
        vector.cells_to_directededge(cells, bits.cell_to_parent(cells, 6))[1] == 2
    ).all()
    assert (
        vector.cells_to_directededge(cells, np.zeros(2, dtype=np.uint64))[1] == 1
    ).all()
    # pentagon origin: exactly 5 constructible edges, destinations exact
    p = vector.get_pentagons(3)[:1]
    prows, pdisk, pdist = traversal.grid_disk_distances(p, 1)
    nb = pdisk[pdist == 1]
    ep, errp = vector.cells_to_directededge(np.repeat(p, len(nb)), nb)
    assert (errp == 0).all() and len(ep) == 5
    assert np.array_equal(vector.directededge_destination(ep), nb)
