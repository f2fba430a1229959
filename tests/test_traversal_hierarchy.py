"""Traversal + hierarchy kernels: reference-suite counterparts of
tests/arrow/test_neighbor.py, test_resolution.py, test_compact.py."""

import numpy as np

from h3ray.h3core import bits, boundary, faceijk, hierarchy, traversal
from .test_h3core import all_cells_at_res


def test_disk_sizes():
    origins = faceijk.latlng_to_cell(np.array([45.5, 10.3]), np.array([10.2, 45.1]), 8)
    for k in (1, 2, 3):
        rows, disk, dist = traversal.grid_disk_distances(origins, k)
        assert (np.bincount(rows) == 3 * k * k + 3 * k + 1).all()
        assert dist.max() == k
        # origin included at distance 0
        assert ((dist == 0).sum()) == 2


def test_disk_pentagon():
    p = bits.set_base_cell(bits.init_cell(2, 1), np.array([4], dtype=np.uint64))
    p = bits.set_index_digit(p, 1, np.array([0], dtype=np.uint64))
    p = bits.set_index_digit(p, 2, np.array([0], dtype=np.uint64))
    rows, disk, dist = traversal.grid_disk_distances(p, 2)
    assert len(disk) == 16  # 1 + 5 + 10


def test_all_neighbors_symmetric_res2():
    cells = all_cells_at_res(2)
    rows, disk, dist = traversal.grid_disk_distances(cells, 1)
    sizes = np.bincount(rows, minlength=len(cells))
    pent = bits.is_pentagon(cells)
    assert (sizes[~pent] == 7).all()
    assert (sizes[pent] == 6).all()
    nb = dist == 1
    pairs = set(zip(cells[rows[nb]].tolist(), disk[nb].tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    # geometric adjacency: no neighbor further than ~1.1x the local maximum
    lat0, lng0 = faceijk.cell_to_latlng(cells)
    lat1, lng1 = faceijk.cell_to_latlng(disk)
    d = boundary.great_circle_distance_rads(
        np.radians(lat0[rows[nb]]),
        np.radians(lng0[rows[nb]]),
        np.radians(lat1[nb]),
        np.radians(lng1[nb]),
    )
    assert d.max() / np.median(d) < 1.2


def test_ring_excludes_center():
    origins = faceijk.latlng_to_cell(np.array([45.5]), np.array([10.2]), 7)
    rows, cells, dist = traversal.grid_ring_distances(origins, 1, 2)
    assert (dist >= 1).all()
    assert len(cells) == 6 + 12


def test_change_resolution_counts():
    # reference: test_resolution.py:8-16 (7^4 + 7)
    cells = faceijk.latlng_to_cell(
        np.array([10.2, 10.3]), np.array([45.5, 45.1]), np.array([5, 8])
    )
    out = hierarchy.change_resolution(cells, 9)
    assert len(out) == 7**4 + 7
    assert (bits.get_resolution(out) == 9).all()
    down = hierarchy.change_resolution(cells, 4)
    assert len(down) == 2
    assert (bits.get_resolution(down) == 4).all()


def test_compact_roundtrip():
    # reference: test_compact.py:13-44
    cell = faceijk.latlng_to_cell(np.array([10.3]), np.array([45.1]), 8)
    ch = hierarchy.change_resolution(cell, 10)
    comp = hierarchy.compact(ch)
    assert len(comp) == 1 and comp[0] == cell[0]
    assert len(hierarchy.uncompact(cell, 9)) == 7

    import pytest

    with pytest.raises(ValueError, match="heterogen"):
        hierarchy.compact(
            np.concatenate([cell, bits.cell_to_parent(cell, np.uint64(4))])
        )
    # mixed-resolution mode: the res-9 cell lies INSIDE the res-8 cell, so
    # h3o's compact_mixed drops it as covered (reference
    # tests/arrow/test_compact.py::test_compact_mixed expects exactly [cell])
    mixed = np.concatenate([cell, faceijk.latlng_to_cell(np.array([10.3]), np.array([45.1]), 9)])
    out = hierarchy.compact(mixed, mixed_resolutions=True)
    assert out.tolist() == cell.tolist()
    # a finer cell NOT covered by anything coarser in the set survives
    elsewhere9 = faceijk.latlng_to_cell(np.array([-33.0]), np.array([151.0]), 9)
    out2 = hierarchy.compact(
        np.concatenate([cell, elsewhere9]), mixed_resolutions=True
    )
    assert sorted(out2.tolist()) == sorted(
        np.concatenate([cell, elsewhere9]).tolist()
    )


def test_compact_pentagon():
    # pentagon parents complete with 6 children
    p = bits.set_base_cell(bits.init_cell(0, 1), np.array([4], dtype=np.uint64))
    ch = hierarchy.uncompact(p, 2)
    comp = hierarchy.compact(ch)
    assert len(comp) == 1 and comp[0] == p[0]


def test_change_resolution_paired():
    cell = faceijk.latlng_to_cell(np.array([10.3]), np.array([45.1]), 8)
    b, a = hierarchy.change_resolution_paired(cell, 9)
    assert len(b) == 7
    assert (bits.get_resolution(b) == 8).all()
    assert (bits.get_resolution(a) == 9).all()
    assert (bits.cell_to_parent(a, np.uint64(8)) == b).all()


def test_compact_rejects_duplicates():
    """Reference parity: compact raises on duplicated input
    (h3ronpy/tests/arrow/test_compact.py error-path behavior)."""
    import pytest

    from h3ray.h3core import faceijk, hierarchy

    c = faceijk.latlng_to_cell(np.array([10.0, 10.0]), np.array([20.0, 20.0]), 5)
    with pytest.raises(ValueError, match="duplicate"):
        hierarchy.compact(c)
    # ... but the mixed-resolutions path dedups silently (h3o
    # compact_mixed_resolutions goes through CellSet::dedup, no error)
    out = hierarchy.compact(c, mixed_resolutions=True)
    assert (out == c[:1]).all()


def test_grid_disk_list_matches_flat():
    """grid_disk_list / grid_disk_distances_list agree with the flat
    traversal output per origin (set parity; offsets consistent; empty
    batch safe)."""
    import pyarrow as pa

    from h3ray import kernels
    from h3ray.h3core import faceijk, traversal

    cells = faceijk.latlng_to_cell(
        np.array([10.0, 52.5, -33.0]), np.array([20.0, 13.4, 151.0]), 6
    )
    t = pa.table({"cell": pa.array(cells)})
    rows, disk, dist = traversal.grid_disk_distances(cells, 2)
    lists = kernels.grid_disk_list(t, 2).column("disk")
    both = kernels.grid_disk_distances_list(t, 2)
    for r in range(len(cells)):
        flat_set = set(disk[rows == r].tolist())
        assert set(lists[r].as_py()) == flat_set
        assert set(both.column("disk")[r].as_py()) == flat_set
        # per-element distances agree with the flat (cell -> k) mapping
        dmap = {int(c): int(k) for c, k in zip(disk[rows == r], dist[rows == r])}
        got = dict(zip(both.column("disk")[r].as_py(), both.column("k")[r].as_py()))
        assert got == dmap
    # drop-in reference naming: out_col='cell' replaces the input column
    ref_named = kernels.grid_disk_distances_list(t, 2, out_col="cell")
    assert ref_named.column("cell").type == pa.large_list(pa.uint64())
    assert set(ref_named.column("cell")[0].as_py()) == set(disk[rows == 0].tolist())
    empty = pa.table({"cell": pa.array([], type=pa.uint64())})
    assert kernels.grid_disk_list(empty, 2).num_rows == 0
    assert kernels.grid_disk_distances_list(empty, 2).num_rows == 0
    # out_col=None picks the reference name 'cell' when it would not
    # clobber an input column (neighbor.rs:100-103 list column contract)
    renamed = t.rename_columns(["origin"])
    auto = kernels.grid_disk_distances_list(renamed, 2, cell_col="origin")
    assert "cell" in auto.column_names and "disk" not in auto.column_names


def test_resolution_stats_int64_exact():
    """cell_count is exact int64 across the whole 0..15 domain (no object
    dtype / Python loop): 2 + 120*7^res, res 15 = 569_707_381_193_162."""
    import pyarrow as pa

    from h3ray import kernels

    t = pa.table({"resolution": pa.array([0, 9, 15], type=pa.int64())})
    out = kernels.resolution_stats(t)
    assert out.column("cell_count").type == pa.int64()
    assert out.column("cell_count").to_pylist() == [
        122, 2 + 120 * 7 ** 9, 569_707_381_193_162]


def test_grid_disk_distances_list_ring_order():
    """ring_order=True lays each origin's list out ring-by-ring: distances
    are non-decreasing within a row, and the members of contiguous
    segment j equal grid_ring_distances(origin, j, j) exactly (the
    reference's per-k member sets, neighbor.rs:73-107).  Pentagon-adjacent
    origin included so truncated rings are covered."""
    import pyarrow as pa

    from h3ray import kernels
    from h3ray.h3core import faceijk, traversal

    cells = faceijk.latlng_to_cell(
        np.array([10.0, 52.5, 58.1]), np.array([20.0, 13.4, 10.5]), 3
    )
    t = pa.table({"cell": pa.array(cells)})
    K = 3
    out = kernels.grid_disk_distances_list(t, K, ring_order=True)
    col = "cell" if "cell" in out.column_names and out.column(
        "cell").type != pa.uint64() else "disk"
    for r in range(len(cells)):
        members = np.asarray(out.column(col)[r].as_py(), dtype=np.uint64)
        dists = np.asarray(out.column("k")[r].as_py())
        assert (np.diff(dists) >= 0).all(), "rings must be contiguous"
        assert dists[0] == 0 and members[0] == cells[r]
        for j in range(K + 1):
            seg = set(members[dists == j].tolist())
            rr, ring, rd = traversal.grid_ring_distances(cells[r:r + 1], j, j)
            assert seg == set(ring.tolist())


def test_grid_disk_walk_invariants():
    """grid_disk_walk follows the C gridDiskDistancesUnsafe construction:
    per origin, ring j is one contiguous 6j-cell segment forming a CLOSED
    neighbor-adjacent perimeter walk (each emitted cell is a grid
    neighbor of the previous; the segment's last cell neighbors its
    first), and member sets equal BFS rings exactly.  Pentagon origins /
    pentagon-touching disks fall back to BFS order but keep identical
    ring sets."""
    from h3ray.h3core import faceijk, traversal

    def neighbors_of(cell):
        _, nbr = traversal.grid_disk(np.array([cell], dtype=np.uint64), 1)
        return set(int(x) for x in nbr) - {int(cell)}

    # hexagon origins (no pentagon within k) + a pentagon origin
    hexes = faceijk.latlng_to_cell(
        np.array([10.0, 52.5, -33.9]), np.array([20.0, 13.4, 151.2]), 2
    )
    pent = bits.set_base_cell(bits.init_cell(2, 1), np.array([4], dtype=np.uint64))
    pent = bits.set_index_digit(pent, 1, np.array([0], dtype=np.uint64))
    pent = bits.set_index_digit(pent, 2, np.array([0], dtype=np.uint64))
    origins = np.concatenate([hexes, pent])
    K = 3
    rows, cells, dist = traversal.grid_disk_walk(origins, K)
    for r in range(len(origins)):
        m = rows == r
        mc, md = cells[m], dist[m]
        assert md[0] == 0 and mc[0] == origins[r]
        assert (np.diff(md) >= 0).all()
        for j in range(K + 1):
            seg = mc[md == j]
            _, ring, _ = traversal.grid_ring_distances(origins[r:r + 1], j, j)
            assert set(seg.tolist()) == set(ring.tolist())
            assert len(seg) == len(set(seg.tolist()))
        if not bits.is_pentagon(origins[r : r + 1])[0]:
            # full rings: 6j cells each, closed adjacent walk
            for j in range(1, K + 1):
                seg = mc[md == j]
                assert len(seg) == 6 * j
                loop = np.concatenate([seg, seg[:1]])
                for a, b in zip(loop[:-1], loop[1:]):
                    assert int(b) in neighbors_of(a)


def test_grid_disk_walk_multi_res_and_empty():
    from h3ray.h3core import faceijk, traversal

    r1 = faceijk.latlng_to_cell(np.array([10.0]), np.array([20.0]), 1)
    r3 = faceijk.latlng_to_cell(np.array([52.5]), np.array([13.4]), 3)
    both = np.concatenate([r3, r1])  # mixed res, out of res order
    rows, cells, dist = traversal.grid_disk_walk(both, 2)
    assert set(rows.tolist()) == {0, 1}
    for r in range(2):
        mc = cells[rows == r]
        assert mc[0] == both[r] and len(mc) == 19
    e_rows, e_cells, e_dist = traversal.grid_disk_walk(
        np.empty(0, dtype=np.uint64), 2
    )
    assert len(e_rows) == 0 and len(e_cells) == 0 and len(e_dist) == 0


def test_child_pos_exhaustive_res2():
    """cellToChildPos == rank in numerically sorted children (DFS digit
    order), and childPosToCell inverts it — over ALL 122 base cells
    (pentagons included) and every res-2 descendant."""
    parents = bits.set_base_cell(
        bits.init_cell(0, 122), np.arange(122, dtype=np.uint64)
    )
    for b in range(122):
        p = parents[b : b + 1]
        kids = []
        for d1 in range(7):
            for d2 in range(7):
                h = bits.set_resolution(p, np.array([2], np.uint64))
                h = bits.set_index_digit(h, 1, np.array([d1], np.uint64))
                h = bits.set_index_digit(h, 2, np.array([d2], np.uint64))
                if bits.is_valid_cell(h)[0]:
                    kids.append(int(h[0]))
        kids = np.array(sorted(kids), dtype=np.uint64)
        assert len(kids) == int(bits.children_count(p, 2)[0])
        pos, ok = bits.cell_to_child_pos(kids, 0)
        assert ok.all() and (pos == np.arange(len(kids))).all()
        back, ok2 = bits.child_pos_to_cell(
            np.repeat(p, len(kids)), np.arange(len(kids)), 2
        )
        assert ok2.all() and (back == kids).all()


def test_child_pos_error_flags():
    p = bits.set_base_cell(bits.init_cell(0, 1), np.array([7], dtype=np.uint64))
    c = bits.set_resolution(p, np.array([2], np.uint64))
    c = bits.set_index_digit(c, 1, np.array([3], np.uint64))
    c = bits.set_index_digit(c, 2, np.array([5], np.uint64))
    _, ok = bits.cell_to_child_pos(c, 5)  # parent_res below cell res
    assert not ok.any()
    _, ok = bits.child_pos_to_cell(p, np.array([49]), 2)  # pos == count
    assert not ok.any()
    _, ok = bits.child_pos_to_cell(p, np.array([-1]), 2)
    assert not ok.any()
    # K digit under a pentagon ancestor is an invalid path
    pent = bits.set_base_cell(bits.init_cell(0, 1), np.array([4], dtype=np.uint64))
    kcell = bits.set_resolution(pent, np.array([1], np.uint64))
    kcell = bits.set_index_digit(kcell, 1, np.array([1], np.uint64))
    _, ok = bits.cell_to_child_pos(kcell, 0)
    assert not ok.any()


def test_child_pos_res_domain():
    """child_res outside 0..15 must flag ok=False (C E_RES_DOMAIN), not
    return garbage cells marked ok."""
    p = bits.set_base_cell(bits.init_cell(0, 1), np.array([7], dtype=np.uint64))
    c, ok = bits.child_pos_to_cell(p, np.array([0]), 16)
    assert not ok.any() and (c == p).all()
    c, ok = bits.child_pos_to_cell(p, np.array([0]), -1)
    assert not ok.any()


def test_are_neighbor_cells_exhaustive_res2():
    # membership parity with grid_disk k=1 over every (cell, candidate)
    # pair drawn from ring-1 and ring-2 of every res-2 cell (incl. all
    # 12 pentagons), plus self-pairs
    cells = all_cells_at_res(2)
    rows, disk, dist = traversal.grid_disk_distances(cells, 2)
    origin = cells[rows]
    nb, err = traversal.are_neighbor_cells(origin, disk)
    assert (err == 0).all()
    assert np.array_equal(nb, dist == 1)
    # symmetry on the true pairs
    m = dist == 1
    back, berr = traversal.are_neighbor_cells(disk[m], origin[m])
    assert (berr == 0).all() and back.all()


def test_are_neighbor_cells_errors_and_mixed_res():
    a = faceijk.latlng_to_cell(np.array([40.0, 40.0]), np.array([-70.0, -70.0]), 7)
    parent = bits.cell_to_parent(a, 6)
    # res mismatch -> err 2; invalid -> err 1; self -> ok but False
    nb, err = traversal.are_neighbor_cells(
        np.array([a[0], a[0], a[0]], dtype=np.uint64),
        np.array([parent[0], np.uint64(0), a[0]], dtype=np.uint64),
    )
    assert err.tolist() == [2, 1, 0]
    assert nb.tolist() == [False, False, False]
    # mixed-resolution batch dispatches per res group correctly
    rows7, disk7, dist7 = traversal.grid_disk_distances(a, 1)
    rows6, disk6, dist6 = traversal.grid_disk_distances(parent, 1)
    og = np.concatenate([a[rows7], parent[rows6]])
    cand = np.concatenate([disk7, disk6])
    expect = np.concatenate([dist7 == 1, dist6 == 1])
    nb, err = traversal.are_neighbor_cells(og, cand)
    assert (err == 0).all()
    assert np.array_equal(nb, expect)
