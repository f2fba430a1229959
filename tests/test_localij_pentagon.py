"""Pentagon local-IJ coverage: forward success, exact roundtrips, and the
within-pentagon isometry the tables were derived from.

Reference behavior pinned by h3ronpy/tests/arrow/test_localij.py roundtrips
(the reference reaches the operator through h3o's cell_to_local_ij)."""

import numpy as np
import pytest

from h3ray.h3core import bits, hierarchy, localij, traversal
from h3ray.h3core.constants import BASE_CELL_IS_PENTAGON

PENTS = np.nonzero(BASE_CELL_IS_PENTAGON)[0]


def cells_of_bc(bc, res):
    h0 = bits.init_cell(0, 1)
    h0 = bits.set_base_cell(h0, np.array([bc], dtype=np.uint64))
    ch, _ = hierarchy.cell_to_children(h0, res)
    return ch


@pytest.mark.parametrize("p", [4, 14, 117])  # both polar pentagons + one non-polar
@pytest.mark.parametrize("res", [1, 2])
def test_pentagon_origin_roundtrip(p, res):
    anchors = cells_of_bc(int(p), res)
    rows, disk, dist = traversal.grid_disk_distances(anchors, 3)
    o, c = anchors[rows], disk
    i, j, ok = localij.cells_to_localij(c, o)
    # most pairs succeed (only the ambiguous wedge buckets fail)
    assert ok.mean() > 0.85
    # crossing pairs actually exercised
    crossing = bits.get_base_cell(c) != p
    assert (ok & crossing).any()
    inv, iok = localij.localij_to_cells(o[ok], i[ok], j[ok])
    assert iok.all()
    assert (inv == c[ok]).all()


@pytest.mark.parametrize("p", [4, 38])
def test_pentagon_index_roundtrip(p):
    """Hexagon anchors near a pentagon; indexes on the pentagon (case B)."""
    res = 2
    pcells = cells_of_bc(int(p), res)
    rows, disk, _ = traversal.grid_disk_distances(pcells[::5], 2)
    hex_anchors = np.unique(
        disk[~BASE_CELL_IS_PENTAGON[bits.get_base_cell(disk).clip(0, 121)]]
    )[:25]
    rows, disk, _ = traversal.grid_disk_distances(hex_anchors, 3)
    o, c = hex_anchors[rows], disk
    keep = BASE_CELL_IS_PENTAGON[bits.get_base_cell(c).clip(0, 121)]
    o, c = o[keep], c[keep]
    assert len(o) > 0
    i, j, ok = localij.cells_to_localij(c, o)
    assert ok.mean() > 0.85
    inv, iok = localij.localij_to_cells(o[ok], i[ok], j[ok])
    assert iok.all()
    assert (inv == c[ok]).all()


def test_within_pentagon_distance_exact():
    """The same-base-cell sector map is an exact isometry: ij distance ==
    BFS grid distance for every within-pentagon pair (the property that
    derived _PENT_C_W)."""
    from h3ray.h3core import ijk as ijk_mod

    for p in (14, 117):
        anchors = cells_of_bc(int(p), 2)
        rows, disk, dist = traversal.grid_disk_distances(anchors, 4)
        same = bits.get_base_cell(disk) == p
        o, c, d = anchors[rows][same], disk[same], dist[same]
        i, j, ok = localij.cells_to_localij(c, o)
        i0, j0, ok0 = localij.cells_to_localij(o, o)
        assert ok.all() and ok0.all()
        di = (i.astype(np.int64) - i0.astype(np.int64))
        dj = (j.astype(np.int64) - j0.astype(np.int64))
        coord = ijk_mod.normalize(
            np.stack([di, dj, np.zeros_like(di)], axis=1)
        )
        hexdist = np.abs(coord).max(axis=1)
        assert (hexdist == d).all()


def test_constructed_cells_never_pentagon_adjacent():
    """Locks the localij_offsets value oracle: every one of the 70 distinct
    constructed event cells has a pure-hexagon ring-1 disk."""
    from h3ray.pipelines.queries import _construct_cells

    eid = np.arange(0, 70 * 12, dtype=np.int64)  # covers all residues
    cells = np.unique(_construct_cells(eid))
    assert len(cells) <= 70
    rows, disk, _ = traversal.grid_disk_distances(cells, 1)
    assert not BASE_CELL_IS_PENTAGON[bits.get_base_cell(disk).clip(0, 121)].any()


def test_ring1_offsets_constant_set():
    from h3ray.pipelines.queries import _construct_cells

    eid = np.arange(20, dtype=np.int64)
    cells = _construct_cells(eid)
    i0, j0, _ = localij.cells_to_localij(cells, cells)
    rows, disk, _ = traversal.grid_disk_distances(cells, 1)
    i, j, ok = localij.cells_to_localij(disk, cells[rows])
    assert ok.all()
    expected = {(0, 0), (-1, -1), (0, 1), (-1, 0), (1, 0), (0, -1), (1, 1)}
    for r in range(len(cells)):
        m = rows == r
        got = set(
            zip(
                (i[m].astype(int) - int(i0[r])).tolist(),
                (j[m].astype(int) - int(j0[r])).tolist(),
            )
        )
        assert got == expected


def test_grid_distance_matches_bfs():
    """Exact-or-flagged contract: grid_distance must reproduce BFS ring
    distances on EVERY ok pair (hexagon same-base via the verified unfold;
    cross-base and pentagon-base via the certified BFS path).  Exhaustive
    at res 1 (all cells x k=6 disks, includes every base seam and every
    pentagon), sampled at res 2."""
    from h3ray.h3core import bits, hierarchy

    base = bits.init_cell(0, 122)
    base = bits.set_base_cell(base, np.arange(122, dtype=np.uint64))
    cells, _ = hierarchy._expand_children(base, 1)
    rows, disk, dist = traversal.grid_disk_distances(cells, 6)
    d, ok = localij.grid_distance(cells[rows], disk)
    assert ok.all()
    assert (d == dist).all()
    cells2, _ = hierarchy._expand_children(base, 2)
    cells2 = cells2[::5]
    rows, disk, dist = traversal.grid_disk_distances(cells2, 6)
    d, ok = localij.grid_distance(cells2[rows], disk)
    assert ok.all()
    assert (d == dist).all()
    # within-pentagon wedge shortcut: the unfold says 7, the true grid
    # distance around the apex is 6 — the BFS path must win
    a = np.array([0x830988FFFFFFFFF], dtype=np.uint64)
    b = np.array([0x83082AFFFFFFFFF], dtype=np.uint64)
    du, _ = localij._unfold_distance(a, b)
    d, ok = localij.grid_distance(a, b)
    assert int(du[0]) == 7 and ok[0] and int(d[0]) == 6
    # beyond the BFS cap across a seam: flagged, never guessed
    d, ok = localij.grid_distance(a, b, max_k=3)
    assert not ok[0]


def test_grid_path_cells_minimal_paths():
    """Paths start/end at the pair, step adjacently, and have dist+1 cells."""
    from h3ray.h3core import faceijk

    rng = np.random.default_rng(12)
    cells = faceijk.latlng_to_cell(
        rng.uniform(-60, 60, 20), rng.uniform(-170, 170, 20), 5
    )
    rows, disk, dist = traversal.grid_disk_distances(cells, 3)
    a, b = cells[rows], disk
    prow, pcells, pok = localij.grid_path_cells(a, b)
    assert pok.all()
    for r in range(0, len(a), 7):
        seg = pcells[prow == r]
        assert len(seg) == dist[r] + 1
        assert seg[0] == a[r] and seg[-1] == b[r]
        dd, oo = localij.grid_distance(seg[:-1], seg[1:])
        assert oo.all() and (dd == 1).all()
