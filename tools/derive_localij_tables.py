"""Derive the pentagon local-IJ rotation/failure tables empirically.

The H3 local-IJ algorithm (public Uber H3 `localij.c`; the reference reaches
it through h3o — crates/h3arrow/src/algorithm/localij.rs:94-144) needs three
pentagon conventions:

  * case A — origin on a pentagon base cell, index crossing to a hexagon
    neighbor: rotation t(L, dir) applied to (coord + offset), where L is the
    origin's leading nonzero digit and dir the base-cell direction;
  * case B — index on a pentagon base cell: rotation p(L', revDir) applied
    to the index coordinate only (L' = leading digit after the base-cell
    orientation rotations, revDir = direction pentagon->origin base cell);
  * case C — both in the same pentagon base cell: rotation w(Lo, Li).

Instead of transcribing the C tables from memory, this tool derives each
entry from ground truth: the unfolded coordinates must reproduce the grid
distance of every cell pair whose shortest path stays inside the base cells
being unfolded (restricted BFS) — an isometry requirement that pins the
rotation uniquely wherever the unfold is well-defined.  Buckets with no
consistent rotation get the angular wedge-crossing rule (+-60 deg when the
short angular path from sector L to dir crosses the deleted K axis), and
are FAILED when exactly opposite (180 deg — ambiguous fold).

Run:  PYTHONPATH=. python tools/derive_localij_tables.py
Prints the tables to paste into h3ray/h3core/localij.py (they are universal
constants, equal for every pentagon of a polar/non-polar class and every
resolution — the script asserts that).
"""

from __future__ import annotations

import sys
from collections import defaultdict

import numpy as np

from h3ray.h3core import bits, hierarchy, ijk, traversal
from h3ray.h3core.constants import BASE_CELL_IS_PENTAGON
from h3ray.h3core.localij import (
    _base_cell_direction,
    _digits_to_base_ijk,
    _scaled_offset,
)
from h3ray.h3core.traversal import BASE_CELL_NEIGHBOR_ROTS, BASE_CELL_NEIGHBORS

PENTS = np.nonzero(BASE_CELL_IS_PENTAGON)[0]
POLAR_PENTS = {4, 117}

# angular position of each direction digit (ccw digit cycle K->IK->I->IJ->J->JK)
ANG = {1: 0, 5: 60, 4: 120, 6: 180, 2: 240, 3: 300}


def ijk_dist(a, b):
    d = ijk.normalize(np.atleast_2d(a) - np.atleast_2d(b))
    return np.abs(d).max(axis=-1)


def cells_of_bc(bc: int, res: int) -> np.ndarray:
    h0 = bits.init_cell(0, 1)
    h0 = bits.set_base_cell(h0, np.array([bc], dtype=np.uint64))
    ch, _ = hierarchy.cell_to_children(h0, res)
    return ch


def restricted_distances(region: np.ndarray, sources: np.ndarray) -> np.ndarray:
    """BFS distances from each source to every region cell, with paths
    restricted to `region`.  Returns (len(sources), len(region)) int array,
    -1 where unreachable (or reachable only by leaving the region)."""
    idx = {int(c): i for i, c in enumerate(region)}
    nbr_rows, nbr_disk, nbr_dist = traversal.grid_disk_distances(region, 1)
    adj = defaultdict(list)
    for r, c, d in zip(nbr_rows, nbr_disk, nbr_dist):
        if d == 1 and int(c) in idx:
            adj[int(r)].append(idx[int(c)])
    out = np.full((len(sources), len(region)), -1, dtype=np.int64)
    for si, s in enumerate(sources):
        dist = out[si]
        start = idx[int(s)]
        dist[start] = 0
        frontier = [start]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if dist[v] < 0:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
    return out


def angular_rule(L: int, d: int):
    """(t, failed) from the wedge-crossing rule."""
    if L == 0:
        return 0, False
    diff = (ANG[d] - ANG[L]) % 360
    if diff == 180:
        return 0, True
    if diff < 180:  # ccw short path: crosses K iff it passes angle 0
        crosses = ANG[L] + diff >= 360
        return (1 if crosses else 0), False
    # cw short path
    back = 360 - diff
    crosses = ANG[L] - back < 0
    return (5 if crosses else 0), False


def true_distances(region: np.ndarray, sources: np.ndarray, k: int = 14) -> np.ndarray:
    """Exact unrestricted grid distances sources x region (-1 beyond k)."""
    idx = {int(c): i for i, c in enumerate(region)}
    out = np.full((len(sources), len(region)), -1, dtype=np.int64)
    rows, disk, dist = traversal.grid_disk_distances(sources, k)
    for r, c, d in zip(rows, disk, dist):
        j = idx.get(int(c))
        if j is not None:
            cur = out[r, j]
            if cur < 0 or d < cur:
                out[r, j] = d
    return out


def sample(arr: np.ndarray, m: int, seed: int) -> np.ndarray:
    if len(arr) <= m:
        return np.arange(len(arr))
    rng = np.random.default_rng(seed)
    return np.sort(rng.choice(len(arr), m, replace=False))


def main():
    res_list = (2, 3)
    exact: dict = defaultdict(lambda: defaultdict(set))  # case -> key -> set(t)
    seen: dict = defaultdict(set)

    for p in PENTS:
        polar = int(p) in POLAR_PENTS
        for res in res_list:
            own = cells_of_bc(int(p), res)
            own_coord = _digits_to_base_ijk(own)
            own_L = bits.leading_nonzero_digit(own).astype(np.int64)
            for d in (2, 3, 4, 5, 6):
                nb = int(BASE_CELL_NEIGHBORS[p, d])
                if nb < 0 or nb > 121:
                    continue
                other = cells_of_bc(nb, res)
                region = np.concatenate([own, other])
                src_idx = sample(own, 200, seed=int(p) * 100 + d)
                rd = restricted_distances(region, own[src_idx])
                td = true_distances(region, own[src_idx])
                rd[rd != td] = -1  # keep only pairs whose shortest path stays in-union
                rd[rd > 4] = -1  # seam-local constraints only: the unfold must be
                # exact near the crossing; far-field distortion is accepted (as in
                # the reference's C algorithm)
                # rotate index cells into the pentagon's orientation (case A)
                rot = int(BASE_CELL_NEIGHBOR_ROTS[p, d])
                hh = other.copy()
                for _ in range(rot):
                    hh = bits.rotate60_ccw(hh)
                other_coord = _digits_to_base_ijk(hh)
                off = _scaled_offset(np.array([d]), res)[0]
                n_own, n_other = len(own), len(other)
                # case A: origin in sector L of pentagon, index in neighbor bc
                dmat = rd[:, n_own:]
                own_coord_s = own_coord[src_idx]
                own_L_s = own_L[src_idx]
                for u in range(6):
                    rot_coord = ijk.rotate60_ccw_n(other_coord, np.full(n_other, u))
                    for t in range(6):
                        cand = rot_coord + ijk.rotate60_ccw_n(off[None, :], np.array([t]))[0]
                        dd = ijk_dist(
                            np.repeat(own_coord_s, n_other, axis=0),
                            np.tile(cand, (len(src_idx), 1)),
                        ).reshape(len(src_idx), n_other)
                        okm = dmat >= 0
                        match = (dd == dmat) | ~okm
                        for Lv in np.unique(own_L_s):
                            rows = own_L_s == Lv
                            key = (polar, int(Lv), d)
                            seen[("A", key)].add((int(p), res))
                            if match[rows].all() and okm[rows].any():
                                exact["A"][key].add((u, t))
                # case B: origin in neighbor bc, index in pentagon
                revd = int(_base_cell_direction(
                    np.array([nb]), np.array([int(p)])
                )[0])  # hex -> pentagon direction (C's `dir` for case B)
                rot_b = int(BASE_CELL_NEIGHBOR_ROTS[nb, revd])
                hh_b = own.copy()
                for _ in range(rot_b):
                    hh_b = bits.rotate60_ccw(hh_b)
                pent_coord_rot = _digits_to_base_ijk(hh_b)
                L_after = bits.leading_nonzero_digit(hh_b).astype(np.int64)
                off_b = _scaled_offset(np.array([revd]), res)[0]
                origin_coord_b = _digits_to_base_ijk(other)
                src_b = sample(other, 200, seed=int(p) * 100 + d + 7)
                rd_b = restricted_distances(region, other[src_b])
                td_b = true_distances(region, other[src_b])
                rd_b[rd_b != td_b] = -1
                rd_b[rd_b > 4] = -1
                dmat_b = rd_b[:, :n_own]  # distances from hex cells to pent cells
                for u in range(6):
                    rot_pent = ijk.rotate60_ccw_n(pent_coord_rot, np.full(n_own, u))
                    for t in range(6):
                        cand = rot_pent + ijk.rotate60_ccw_n(off_b[None, :], np.array([t]))[0]
                        dd = ijk_dist(
                            np.repeat(origin_coord_b[src_b], n_own, axis=0),
                            np.tile(cand, (len(src_b), 1)),
                        ).reshape(len(src_b), n_own)
                        okm = dmat_b >= 0
                        match = (dd == dmat_b) | ~okm
                        for Lv in np.unique(L_after):
                            cols = L_after == Lv
                            key = (polar, int(Lv), d)  # C keys case B by pent->origin dir
                            seen[("B", key)].add((int(p), res))
                            if match[:, cols].all() and okm[:, cols].any():
                                exact["B"][key].add((u, t))
            # case C: within one pentagon base cell
            rd_c = restricted_distances(own, own)
            for t in range(6):
                cand = ijk.rotate60_ccw_n(own_coord, np.full(len(own), t))
                dd = ijk_dist(
                    np.repeat(own_coord, len(own), axis=0),
                    np.tile(cand, (len(own), 1)),
                ).reshape(len(own), len(own))
                okm = rd_c >= 0
                match = (dd == rd_c) | ~okm
                for Lo in np.unique(own_L):
                    for Li in np.unique(own_L):
                        rows = own_L == Lo
                        cols = own_L == Li
                        key = (polar, int(Lo), int(Li))
                        seen[("C", key)].add((int(p), res))
                        if match[np.ix_(rows, cols)].all():
                            exact["C"][key].add(t)

    for case in ("A", "B", "C"):
        print(f"=== case {case} ===")
        for key in sorted(exact[case]):
            print(key, sorted(exact[case][key]))
        observed = sorted(k for c, k in seen if c == case)
        missing = [k for k in observed if k not in exact[case]]
        print("observed-but-no-exact-t:", missing)


if __name__ == "__main__":
    sys.exit(main())
