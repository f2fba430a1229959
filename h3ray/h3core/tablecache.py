"""Disk cache for import-time derived H3 tables.

The geometric derivations + calibrations in faceijk.py / traversal.py cost
~1 s; on a Ray cluster every worker process pays that on first import.  The
derived tables are tiny and deterministic, so they are cached to an .npz
next to this file (committed to the repo).  ``tests/test_h3core.py``
regenerates them from scratch and asserts equality, guarding staleness.
"""

from __future__ import annotations

import os

import numpy as np

VERSION = 1
_PATH = os.path.join(os.path.dirname(__file__), "_derived_tables.npz")


def load() -> dict | None:
    if os.environ.get("H3RAY_DISABLE_TABLE_CACHE"):
        return None
    try:
        with np.load(_PATH) as z:
            if int(z["version"][0]) != VERSION:
                return None
            return {k: z[k] for k in z.files if k != "version"}
    except (OSError, KeyError, ValueError):
        return None


def save(tables: dict) -> None:
    try:
        np.savez(_PATH, version=np.array([VERSION]), **tables)
    except OSError:
        pass  # read-only install: derive on every import instead
