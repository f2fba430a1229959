"""Canonical vertex enumeration: cellToVertex / cellToVertexes.

H3 v4's vertex mode (reference exposes only parsing/validation/owner
extraction — h3ronpy/python/h3ronpy/__init__.py:132, crates/h3arrow/src/
array/vertex.rs:4 — not construction; this extends the surface with the
H3 C-API construction semantics).  A topological corner of the grid is
shared by exactly three cells (the grid is 3-regular at corners); the
CANONICAL vertex index for that corner is owned by the numerically
smallest of the three sharing cells (the public H3 owner rule,
h3lib vertex.c), with the owner's own boundary corner number in the
reserved bits.  Canonical ownership is what makes a vertex a usable
JOIN KEY: every cell that touches a corner derives the identical
uint64 for it, so corner-keyed dedup/aggregation is one hash shuffle.

Construction here is purely topological + robust geometry, not a port:

1. each cell's six (five for pentagons) TRUE corners come from the
   boundary substrate (boundary.cell_true_vertices);
2. each boundary edge is matched to the neighbor cell across it by
   nearest-centroid-to-edge-midpoint on the unit sphere (separations
   are ~one cell diameter — orders of magnitude above float error, and
   the exhaustive Euler test V = 2F - 4 over every cell of a whole
   resolution would catch any misassignment);
3. corner v is adjacent to edges (v-1, v); its three sharers are the
   cell and those two edge neighbors; the owner is their minimum;
4. a non-self owner's corner number is recovered by matching the
   unordered sharer pair against the owner's own edge-neighbor pairs.
"""

from __future__ import annotations

import numpy as np

from . import bits, boundary, faceijk, traversal

_U = np.uint64


def _unit_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray) -> np.ndarray:
    """(..., ) degree arrays -> (..., 3) unit vectors."""
    lat = np.radians(lat_deg)
    lng = np.radians(lng_deg)
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=-1)


def _edge_neighbors(cells: np.ndarray):
    """Uniform-res cells -> (edge_nbr (n,6) uint64, nv (n,)):
    edge_nbr[i, e] is the cell across boundary edge e (corner e ->
    corner (e+1) % nv) of cells[i]; pentagon rows use slots 0..4.
    """
    n = len(cells)
    vlat, vlng, nv = boundary.cell_true_vertices(cells)
    V = _unit_xyz(vlat, vlng)  # (n, 6, 3)

    # neighbors per direction 1..6 (K direction from a pentagon is the
    # deleted subsequence -> E_PENTAGON, masked out)
    nbrs = np.zeros((n, 6), dtype=np.uint64)
    ok = np.zeros((n, 6), dtype=bool)
    for d in range(1, 7):
        nb, _, err = traversal.neighbor_rotations(cells, d)
        nbrs[:, d - 1] = nb
        ok[:, d - 1] = err == 0
    # the K direction from a pentagon ORIGIN is the deleted subsequence:
    # neighbor_rotations substitutes IK at base-cell level (duplicating
    # the IK neighbor) rather than erroring, so mask it explicitly —
    # a pentagon has exactly 5 edges and 5 distinct neighbors
    ok[:, 0] &= ~bits.is_pentagon(cells)
    clat, clng = faceijk.cell_to_latlng(nbrs.reshape(-1))
    C = _unit_xyz(clat, clng).reshape(n, 6, 3)

    # edge midpoints on the sphere; edge e: corner e -> corner (e+1)%nv
    idx6 = np.arange(6)
    nxt = (idx6[None, :] + 1) % nv[:, None]
    M = V + np.take_along_axis(V, nxt[:, :, None], axis=1)
    M /= np.maximum(np.linalg.norm(M, axis=-1, keepdims=True), 1e-300)

    # score[i, e, d] = closeness of neighbor d's centroid to edge e's
    # midpoint; the neighbor ACROSS an edge maximizes it by ~a cell
    # diameter over every other candidate
    score = np.einsum("ned,nkd->nek", M, C)
    score = np.where(ok[:, None, :], score, -np.inf)
    edge_used = idx6[None, :] < nv[:, None]
    assign = np.argmax(score, axis=2)  # (n, 6) direction slot per edge
    # bijection sanity: every valid direction claimed by exactly one edge
    hit = np.zeros((n, 6), dtype=np.int64)
    np.add.at(hit, (np.repeat(np.arange(n), 6)[edge_used.ravel()],
                    assign[edge_used]), 1)
    if not np.array_equal(hit, ok.astype(np.int64)):
        bad = np.nonzero((hit != ok).any(axis=1))[0][:5]
        raise AssertionError(
            f"edge->neighbor matching not a bijection for cells {cells[bad]}"
        )
    edge_nbr = np.take_along_axis(nbrs, assign, axis=1)
    edge_nbr[~edge_used] = 0
    return edge_nbr, nv


def _vertex_bits(owner: np.ndarray, vert_num: np.ndarray) -> np.ndarray:
    """Owner cells + corner numbers -> vertex-mode indexes."""
    return (
        (owner & ~(_U(0xF) << _U(59)) & ~(_U(0x7) << _U(56)))
        | (_U(bits.MODE_VERTEX) << _U(59))
        | (vert_num.astype(np.uint64) << _U(56))
    )


def _cells_to_vertexes_uniform(cells: np.ndarray):
    """Uniform-res kernel: (rows, vertexes) — rows[i] indexes the input
    cell each emitted canonical vertex belongs to, nv per cell (5/6),
    in corner order."""
    n = len(cells)
    edge_nbr, nv = _edge_neighbors(cells)

    # corner v of cell i: sharers = {cell, edge_nbr[v-1], edge_nbr[v]}
    idx6 = np.arange(6)
    prev = (idx6[None, :] - 1) % nv[:, None]
    x = np.take_along_axis(edge_nbr, prev, axis=1)  # (n,6) prev-edge nbr
    y = edge_nbr  # this-edge nbr
    used = idx6[None, :] < nv[:, None]

    c_rep = np.repeat(cells, 6).reshape(n, 6)
    owner = np.minimum(np.minimum(c_rep, x), y)

    # self-owned corners keep their own number
    vert_num = np.broadcast_to(idx6, (n, 6)).copy()

    # foreign-owned corners: match the unordered sharer pair among the
    # owner's own corner-adjacent neighbor pairs
    foreign = used & (owner != c_rep)
    if foreign.any():
        f_owner = owner[foreign]
        uniq, inv = np.unique(f_owner, return_inverse=True)
        # most foreign owners of a contiguous batch are THEMSELVES input
        # cells whose edge tables are already computed — reuse them and
        # run the (expensive) edge matching only for true out-of-batch
        # owners (the patch boundary)
        cs, first = np.unique(cells, return_index=True)
        pos = np.searchsorted(cs, uniq)
        pos_c = np.minimum(pos, len(cs) - 1)
        in_batch = cs[pos_c] == uniq
        o_edge_nbr = np.zeros((len(uniq), 6), dtype=np.uint64)
        o_nv = np.zeros(len(uniq), dtype=np.int64)
        if in_batch.any():
            src = first[pos_c[in_batch]]
            o_edge_nbr[in_batch] = edge_nbr[src]
            o_nv[in_batch] = nv[src]
        if (~in_batch).any():
            e2, n2 = _edge_neighbors(uniq[~in_batch])
            o_edge_nbr[~in_batch] = e2
            o_nv[~in_batch] = n2
        o_prev_nbr = np.take_along_axis(
            o_edge_nbr, (idx6[None, :] - 1) % o_nv[:, None], axis=1
        )
        # the two sharers other than the owner
        others = np.stack([c_rep[foreign], x[foreign], y[foreign]], axis=1)
        others = np.sort(others, axis=1)  # owner is the min -> slots 1,2
        a, b = others[:, 1], others[:, 2]
        p1 = o_prev_nbr[inv]  # (m, 6)
        p2 = o_edge_nbr[inv]
        match = ((p1 == a[:, None]) & (p2 == b[:, None])) | (
            (p1 == b[:, None]) & (p2 == a[:, None])
        )
        match &= idx6[None, :] < o_nv[inv][:, None]
        if not (match.sum(axis=1) == 1).all():
            raise AssertionError("canonical corner not unique in owner")
        vert_num[foreign] = np.argmax(match, axis=1)

    vx = _vertex_bits(owner, vert_num)
    rows = np.repeat(np.arange(n, dtype=np.int64), 6).reshape(n, 6)
    return rows[used], vx[used]


def cells_to_vertexes(cells: np.ndarray):
    """Canonical vertex indexes of every cell: (rows, vertexes) where
    rows maps each emitted vertex back to its input row; each cell
    emits its 6 corners (5 for pentagons) in ccw boundary order.
    Cells sharing a corner emit the IDENTICAL uint64 for it.  Mixed
    resolutions dispatch per res group (row order preserved)."""
    cells = np.asarray(cells, dtype=np.uint64)
    if len(cells) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.uint64)
    res = bits.get_resolution(cells).astype(np.int64)
    uniq = np.unique(res)
    if len(uniq) == 1:
        return _cells_to_vertexes_uniform(cells)
    rows_all, vx_all = [], []
    for r in uniq:
        m = res == r
        rr, vv = _cells_to_vertexes_uniform(cells[m])
        rows_all.append(np.nonzero(m)[0][rr])
        vx_all.append(vv)
    rows = np.concatenate(rows_all)
    vx = np.concatenate(vx_all)
    order = np.argsort(rows, kind="stable")
    return rows[order], vx[order]


def cell_to_vertex(cells: np.ndarray, vertex_num: int) -> np.ndarray:
    """Canonical vertex ``vertex_num`` of each cell (H3 cellToVertex).
    Returns 0 for out-of-range numbers (5 on a pentagon, >5 anywhere)."""
    cells = np.asarray(cells, dtype=np.uint64)
    out = np.zeros(len(cells), dtype=np.uint64)
    if not 0 <= vertex_num <= 5 or len(cells) == 0:
        return out
    rows, vx = cells_to_vertexes(cells)
    # each row emits its corners in order: corner k of row i is the k-th
    # emitted vertex of that row
    first = np.r_[0, 1 + np.nonzero(np.diff(rows))[0]]
    counts = np.diff(np.r_[first, len(rows)])
    has = vertex_num < counts
    out[rows[first[has]]] = vx[first[has] + vertex_num]
    return out
