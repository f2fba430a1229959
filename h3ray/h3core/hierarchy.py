"""Hierarchy operations: parents, children, compact/uncompact (batch-local).

Vectorized equivalents of the reference's change_resolution / compact /
uncompact (h3ronpy/src/op/resolution.rs:16-81, src/op/compact.rs:9-41,
crates/h3arrow/src/algorithm/{change_resolution,compact}.rs).

All functions here are *batch-local* kernels; the distributed compact
(partition by res-0 base cell, compact per group) lives in the Ray layer.
"""

from __future__ import annotations

import numpy as np

from . import bits
from .ijk import K_AXES_DIGIT


def change_resolution(cells: np.ndarray, out_res: int) -> np.ndarray:
    """Cells at mixed resolutions -> out_res (parents or exploded children).

    Output length differs from input (1->7^d expansion going finer); nulls
    must be removed by the caller beforehand (reference omits them,
    h3ronpy/python/h3ronpy/__init__.py:66-75).
    """
    cells = np.asarray(cells, dtype=np.uint64)
    res = bits.get_resolution(cells).astype(np.int64)
    coarser = cells[res >= out_res]
    out1 = bits.cell_to_parent(coarser, np.uint64(out_res)) if len(coarser) else coarser
    finer = cells[res < out_res]
    out2 = uncompact(finer, out_res) if len(finer) else finer
    if len(out2) == 0:
        return out1
    if len(out1) == 0:
        return out2
    return np.concatenate([out1, out2])


def change_resolution_paired(cells: np.ndarray, out_res: int):
    """(cell_before, cell_after) rows for joining frames at different
    resolutions (reference: h3ronpy/src/op/resolution.rs:48-81)."""
    cells = np.asarray(cells, dtype=np.uint64)
    res = bits.get_resolution(cells).astype(np.int64)
    before = []
    after = []
    coarser = cells[res >= out_res]
    if len(coarser):
        before.append(coarser)
        after.append(bits.cell_to_parent(coarser, np.uint64(out_res)))
    finer = cells[res < out_res]
    if len(finer):
        ch, parent_idx = _expand_children(finer, out_res)
        before.append(finer[parent_idx])
        after.append(ch)
    if not before:
        e = np.empty(0, dtype=np.uint64)
        return e, e
    return np.concatenate(before), np.concatenate(after)


def _expand_children(cells: np.ndarray, child_res: int):
    """Expand each cell to all children at child_res.

    Returns (children, parent_row_index) so callers can explode sibling
    columns (the Arrow take-based explode in the Ray kernels).
    """
    cells = np.asarray(cells, dtype=np.uint64)
    cur = cells
    idx = np.arange(len(cells))
    res = bits.get_resolution(cells).astype(np.int64)
    if not len(cells):
        return cells, idx
    max_res = int(res.max()) if len(res) else 0
    for r in range(int(res.min()) + 1, child_res + 1):
        need = bits.get_resolution(cur).astype(np.int64) < r
        stay = cur[~need]
        stay_idx = idx[~need]
        exp = cur[need]
        exp_idx = idx[need]
        if len(exp):
            pent = bits.is_pentagon(exp)
            outs = []
            outidx = []
            for d in range(7):
                ch = bits.set_resolution(exp, np.full(len(exp), r, dtype=np.uint64))
                ch = bits.set_index_digit(ch, r, np.full(len(exp), d, dtype=np.uint64))
                keep = ~(pent & (d == K_AXES_DIGIT))
                outs.append(ch[keep])
                outidx.append(exp_idx[keep])
            cur = np.concatenate([stay] + outs)
            idx = np.concatenate([stay_idx] + outidx)
        else:
            cur = stay
            idx = stay_idx
    return cur, idx


def cell_to_children(cells: np.ndarray, child_res: int):
    """Children of each cell; returns (children, parent_row_index)."""
    return _expand_children(cells, child_res)


def uncompact(cells: np.ndarray, res: int) -> np.ndarray:
    """Expand every cell to ``res``; finer cells are dropped (reference
    semantics, crates/h3arrow/src/algorithm/compact.rs:33-35)."""
    cells = np.asarray(cells, dtype=np.uint64)
    keep = bits.get_resolution(cells).astype(np.int64) <= res
    ch, _ = _expand_children(cells[keep], res)
    return ch


def compact(cells: np.ndarray, mixed_resolutions: bool = False) -> np.ndarray:
    """Replace complete sets of 7 (6 for pentagons) children by their parent,
    recursively.  Input must be duplicate-free; with
    ``mixed_resolutions=False`` a heterogeneous input raises (reference error
    contains "heterogen", h3ronpy/src/op/compact.rs:9-28).
    """
    cells = np.asarray(cells, dtype=np.uint64)
    if len(cells) == 0:
        return cells
    res = bits.get_resolution(cells).astype(np.int64)
    if not mixed_resolutions and len(np.unique(res)) > 1:
        raise ValueError("input of compact has heterogen resolutions")
    if mixed_resolutions:
        # reference parity: compact_mixed_resolutions dedups silently
        # (h3o CellIndex::compact via CellSet::dedup); only the same-res
        # path refuses duplicates
        cells = np.unique(cells)
        res = bits.get_resolution(cells).astype(np.int64)
        # h3o also drops any cell COVERED by a coarser cell in the set —
        # [res8, res9-inside-it] compacts to [res8]
        # (h3ronpy/tests/arrow/test_compact.py::test_compact_mixed)
        keep = np.ones(len(cells), dtype=bool)
        for rc in np.unique(res)[:-1]:
            coarser = cells[(res == rc) & keep]
            finer = res > rc
            if len(coarser) and finer.any():
                anc = bits.cell_to_parent(cells[finer], np.uint64(rc))
                covered = np.isin(anc, coarser)
                keep[np.nonzero(finer)[0][covered]] = False
        cells = cells[keep]
        res = res[keep]
    elif len(np.unique(cells)) != len(cells):
        # reference parity: compact refuses duplicated input
        # (crates/h3arrow/src/algorithm/compact.rs:19-31)
        raise ValueError("input of compact contains duplicate cells")
    out_parts = []
    cur = cells
    for r in range(int(res.max()), 0, -1):
        cur_res = bits.get_resolution(cur).astype(np.int64)
        at_r = cur[cur_res == r]
        rest = cur[cur_res != r]
        if len(at_r) == 0:
            cur = rest
            continue
        parents = bits.cell_to_parent(at_r, np.uint64(r - 1))
        order = np.argsort(parents, kind="stable")
        p_sorted = parents[order]
        c_sorted = at_r[order]
        uniq, start, counts = np.unique(p_sorted, return_index=True, return_counts=True)
        need = np.where(bits.is_pentagon(uniq), 6, 7)
        complete = counts == need
        # children of complete parents are replaced by the parent
        complete_mask = np.repeat(complete, counts)
        out_parts.append(c_sorted[~complete_mask])
        promoted = uniq[complete]
        cur = np.concatenate([rest, promoted]) if len(promoted) else rest
    out_parts.append(cur)  # whatever remains (res 0 survivors)
    return np.concatenate(out_parts) if out_parts else cells
