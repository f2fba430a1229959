"""Vectorized IJK hexagon-grid coordinate arithmetic.

Implements the public H3 IJK coordinate system (three non-negative axes at
120 degrees) over ``(N, 3)`` int64 NumPy arrays.  These are the primitives
the rest of the engine builds on: aperture-7 and aperture-3 up/down scaling,
60-degree rotations, digit conversion and the hex-plane rounding used by
``latlng_to_cell``.

The reference engine delegates all of this to h3o; our kernels are written
so a whole Arrow batch of coordinates is transformed with a handful of NumPy
ops (no per-row Python), which is the shape ``Dataset.map_batches`` wants.
"""

from __future__ import annotations

import numpy as np

from .constants import M_SIN60

# H3 digits (direction within an aperture-7 subdivision)
CENTER_DIGIT = 0
K_AXES_DIGIT = 1
J_AXES_DIGIT = 2
JK_AXES_DIGIT = 3
I_AXES_DIGIT = 4
IK_AXES_DIGIT = 5
IJ_AXES_DIGIT = 6
INVALID_DIGIT = 7

# unit ijk vector per digit 0..6
UNIT_VECS = np.array(
    [
        [0, 0, 0],  # center
        [0, 0, 1],  # k
        [0, 1, 0],  # j
        [0, 1, 1],  # jk
        [1, 0, 0],  # i
        [1, 0, 1],  # ik
        [1, 1, 0],  # ij
    ],
    dtype=np.int64,
)

# 60-degree ccw rotation of a digit: K->IK->I->IJ->J->JK->K (7 fixed)
ROTATE60_CCW_DIGIT = np.array([0, 5, 3, 1, 6, 4, 2, 7], dtype=np.uint64)
ROTATE60_CW_DIGIT = np.array([0, 3, 6, 2, 5, 1, 4, 7], dtype=np.uint64)

# linear maps (row-vector convention: out = ijk @ M) ------------------------

# rotate a vector 60deg ccw: i->i+j, j->j+k, k->i+k  (columns are images)
_M_ROT60_CCW = np.array([[1, 1, 0], [0, 1, 1], [1, 0, 1]], dtype=np.int64)
_M_ROT60_CW = np.array([[1, 0, 1], [1, 1, 0], [0, 1, 1]], dtype=np.int64)
# aperture-7 down (res -> finer), counter-clockwise orientation
_M_DOWN_AP7 = np.array([[3, 0, 1], [1, 3, 0], [0, 1, 3]], dtype=np.int64)
# aperture-7 down, clockwise orientation
_M_DOWN_AP7R = np.array([[3, 1, 0], [0, 3, 1], [1, 0, 3]], dtype=np.int64)
# aperture-3 down
_M_DOWN_AP3 = np.array([[2, 0, 1], [1, 2, 0], [0, 1, 2]], dtype=np.int64)
_M_DOWN_AP3R = np.array([[2, 1, 0], [0, 2, 1], [1, 0, 2]], dtype=np.int64)

# precomputed ccw-rotation matrix powers R^0..R^5 for per-element rotations
ROT_CCW_POWERS = np.empty((6, 3, 3), dtype=np.int64)
_m = np.eye(3, dtype=np.int64)
for _k in range(6):
    ROT_CCW_POWERS[_k] = _m
    _m = _m @ _M_ROT60_CCW


def normalize(ijk: np.ndarray) -> np.ndarray:
    """Normalize so min(i,j,k) == 0 (translation along (1,1,1) is identity)."""
    if ijk.ndim == 2:
        m = np.minimum(np.minimum(ijk[:, 0], ijk[:, 1]), ijk[:, 2])
        return ijk - m[:, None]
    return ijk - ijk.min(axis=-1, keepdims=True)


def ijk_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def rotate60_ccw(ijk: np.ndarray) -> np.ndarray:
    return normalize(ijk @ _M_ROT60_CCW)


def rotate60_cw(ijk: np.ndarray) -> np.ndarray:
    return normalize(ijk @ _M_ROT60_CW)


def rotate60_ccw_n(ijk: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Rotate each row ccw by per-row multiples of 60 degrees (n in 0..5)."""
    mats = ROT_CCW_POWERS[np.asarray(n) % 6]  # (N,3,3)
    out = np.einsum("ni,nij->nj", ijk, mats)
    return normalize(out)


def down_ap7(ijk: np.ndarray) -> np.ndarray:
    return normalize(ijk @ _M_DOWN_AP7)


def down_ap7r(ijk: np.ndarray) -> np.ndarray:
    return normalize(ijk @ _M_DOWN_AP7R)


def down_ap3(ijk: np.ndarray) -> np.ndarray:
    return normalize(ijk @ _M_DOWN_AP3)


def down_ap3r(ijk: np.ndarray) -> np.ndarray:
    return normalize(ijk @ _M_DOWN_AP3R)


def _round_div7(a: np.ndarray) -> np.ndarray:
    """round(a/7) with round-half-away semantics; a/7 is never exactly x.5."""
    return np.floor_divide(2 * a + 7, 14)


def up_ap7(ijk: np.ndarray) -> np.ndarray:
    """Aperture-7 up-scaling (finer res -> coarser), ccw orientation."""
    i = ijk[..., 0] - ijk[..., 2]
    j = ijk[..., 1] - ijk[..., 2]
    out = np.zeros_like(ijk)
    out[..., 0] = _round_div7(3 * i - j)
    out[..., 1] = _round_div7(i + 2 * j)
    return normalize(out)


def up_ap7r(ijk: np.ndarray) -> np.ndarray:
    """Aperture-7 up-scaling, cw orientation."""
    i = ijk[..., 0] - ijk[..., 2]
    j = ijk[..., 1] - ijk[..., 2]
    out = np.zeros_like(ijk)
    out[..., 0] = _round_div7(2 * i + j)
    out[..., 1] = _round_div7(3 * j - i)
    return normalize(out)


def neighbor(ijk: np.ndarray, digit: np.ndarray) -> np.ndarray:
    """Move to the neighboring coordinate in the given digit direction."""
    return normalize(ijk + UNIT_VECS[np.asarray(digit, dtype=np.int64)])


def unit_ijk_to_digit(ijk: np.ndarray) -> np.ndarray:
    """Map normalized unit ijk vectors to digits 0..6 (7 = invalid).

    For components in {0, 1} the digit is exactly (i<<2)|(j<<1)|k; anything
    larger is not a unit vector."""
    n = normalize(ijk)
    digit = (n[..., 0] * 4 + n[..., 1] * 2 + n[..., 2]).astype(np.uint64)
    bad = n.max(axis=-1) > 1
    if bad.any():
        digit[bad] = INVALID_DIGIT
    return digit


def ijk_to_hex2d(ijk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """IJK -> 2d cartesian hex-plane coordinates."""
    i = (ijk[..., 0] - ijk[..., 2]).astype(np.float64)
    j = (ijk[..., 1] - ijk[..., 2]).astype(np.float64)
    x = i - 0.5 * j
    y = j * M_SIN60
    return x, y


def hex2d_to_ijk(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """2d cartesian hex-plane coordinates -> nearest IJK (hexagon rounding).

    Vectorized port of the public H3 hex-rounding algorithm (the branchy
    fractional-part case analysis becomes boolean-mask selects).
    """
    a1 = np.abs(x)
    a2 = np.abs(y)
    x2 = a2 / M_SIN60
    x1 = a1 + x2 / 2.0
    m1 = np.floor(x1).astype(np.int64)
    m2 = np.floor(x2).astype(np.int64)
    r1 = x1 - m1
    r2 = x2 - m2

    i = np.empty_like(m1)
    j = np.empty_like(m2)

    # case analysis on r1 thirds/halves
    c_lo = r1 < 0.5
    c_lo1 = r1 < 1.0 / 3.0

    # r1 < 1/3
    j_a = np.where(r2 < (1.0 + r1) / 2.0, m2, m2 + 1)
    i_a = m1
    # 1/3 <= r1 < 1/2
    j_b = np.where(r2 < (1.0 - r1), m2, m2 + 1)
    i_b = np.where(((1.0 - r1) <= r2) & (r2 < 2.0 * r1), m1 + 1, m1)
    # 1/2 <= r1 < 2/3
    c_hi1 = r1 < 2.0 / 3.0
    j_c = np.where(r2 < (1.0 - r1), m2, m2 + 1)
    i_c = np.where((2.0 * r1 - 1.0 < r2) & (r2 < 1.0 - r1), m1, m1 + 1)
    # r1 >= 2/3
    j_d = np.where(r2 < r1 / 2.0, m2, m2 + 1)
    i_d = m1 + 1

    i = np.where(c_lo, np.where(c_lo1, i_a, i_b), np.where(c_hi1, i_c, i_d))
    j = np.where(c_lo, np.where(c_lo1, j_a, j_b), np.where(c_hi1, j_c, j_d))

    # fold across the axes for negative x/y
    neg_x = x < 0.0
    j_even = (j % 2) == 0
    axis_i = np.where(j_even, j // 2, (j + 1) // 2)
    diff = i - axis_i
    i = np.where(neg_x, np.where(j_even, i - 2 * diff, i - (2 * diff + 1)), i)

    neg_y = y < 0.0
    i = np.where(neg_y, i - (2 * j + 1) // 2, i)
    j = np.where(neg_y, -j, j)

    out = np.stack([i, j, np.zeros_like(i)], axis=-1)
    return normalize(out)
