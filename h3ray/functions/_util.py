"""Small shared helpers for the functions package."""

from __future__ import annotations

import os


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
