"""Small shared helpers for the functions package."""

from __future__ import annotations

import os

import numpy as np

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def bucket_pair(a: np.ndarray, b: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of two int64 key parts (splitmix-style mix,
    top-bits shift 29).  THE shuffle-partitioning hash for two-part keys
    — join.pip_join_shuffle and the timeseries operators share it; a
    bias/overflow tweak here reaches every bucketed exchange at once."""
    with np.errstate(over="ignore"):
        h = (a.astype(np.uint64) + _MIX1 * (b.astype(np.uint64) + np.uint64(1))) * _MIX2
    return ((h >> np.uint64(29)) % np.uint64(num_buckets)).astype(np.int64)


def bucket_single(k: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket of one int64 key (single multiply, top-bits
    shift 33) — the single-key sibling of :func:`bucket_pair`."""
    with np.errstate(over="ignore"):
        h = k.astype(np.uint64) * _MIX1
    return ((h >> np.uint64(33)) % np.uint64(num_buckets)).astype(np.int64)


def require_fresh_dir(path: str, why: str) -> None:
    """Raise if ``path`` is an existing non-empty directory.

    Checkpoint/index writers call this before their first write: silently
    merging stale parquet from a prior run into a new one corrupts the
    result, so a reused directory must fail loudly."""
    if os.path.isdir(path) and os.listdir(path):
        raise ValueError(
            f"directory {path!r} exists and is non-empty; pass a fresh "
            f"directory ({why})"
        )


def distinct_pairs(a: np.ndarray, b: np.ndarray):
    """One representative of every distinct (a[i], b[i]) pair, returned
    as (a_unique_pairs, b_unique_pairs) sorted by (a, b) — lexsort +
    adjacent-compare (np.unique(axis=0) would void-view sort, ~10x
    slower on wide integer pairs)."""
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    first = np.ones(len(a_s), dtype=bool)
    first[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    return a_s[first], b_s[first]
