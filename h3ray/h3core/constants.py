"""Geometric constants of the H3 discrete global grid system.

These are the published constants of the public H3 grid specification
(https://h3geo.org/docs/core-library/overview, Apache-2.0): the icosahedron
face centers, the Class II i-axis azimuth per face, the 122 res-0 base cells
(home face + IJK coordinate + pentagon flag), and the aperture-7 scaling
constants.  Everything else (face→base-cell lookup, base-cell neighbor
tables, aperture carry tables) is *derived* from these at import time in
``faceijk.py`` / ``traversal.py`` rather than transcribed, so the derived
tables are self-consistent with the geometry by construction.

The reference engine (h3ronpy) gets all of this from the ``h3o`` Rust crate;
see /root/reference/crates/h3arrow/src/array/mod.rs:73-133 for how it wraps
the resulting uint64 indexes.
"""

from __future__ import annotations

import numpy as np

# --- scalar constants -------------------------------------------------------

M_SQRT7 = 2.6457513110645905905016157536392604257102
M_RSQRT7 = 1.0 / M_SQRT7
M_SIN60 = np.sqrt(3.0) / 2.0
# rotation angle between Class II and Class III resolutions, asin(sqrt(3/28))
M_AP7_ROT_RADS = np.arcsin(np.sqrt(3.0 / 28.0))
# scaling factor from hex2d resolution-0 unit length to gnomonic unit length
RES0_U_GNOMONIC = 0.38196601125010500003
EPSILON = 1.0e-16

MAX_H3_RES = 15
NUM_BASE_CELLS = 122
NUM_ICOSA_FACES = 20
EARTH_RADIUS_KM = 6371.007180918475  # authalic earth radius used by H3

# --- icosahedron face centers (lat, lng in radians), 20 faces --------------

FACE_CENTER_GEO = np.array(
    [
        [0.803582649718989942, 1.248397419617396099],
        [1.307747883455638156, 2.536945009877921159],
        [1.054751253523952054, -1.347517358900396623],
        [0.600191595538186799, -0.450603909469755746],
        [0.491715428198773866, 0.401988202911306943],
        [0.172745327415618701, 1.678146885280433686],
        [0.605929321571350690, 2.953923329812411617],
        [0.427370518328979641, -1.888876200336285401],
        [-0.079066118549212831, -0.733429513380867741],
        [-0.230961644455383637, 0.506495587332349035],
        [0.079066118549212831, 2.408163140208925497],
        [0.230961644455383637, -2.635097066257444203],
        [-0.172745327415618701, -1.463445768309359553],
        [-0.605929321571350690, -0.187669323777381622],
        [-0.427370518328979641, 1.252716453253507838],
        [-0.600191595538186799, 2.690988744120037492],
        [-0.491715428198773866, -2.739604450678486295],
        [-0.803582649718989942, -1.893195233972397139],
        [-1.307747883455638156, -0.604647643711872080],
        [-1.054751253523952054, 1.794075294689396615],
    ],
    dtype=np.float64,
)

# unit 3d vector of each face center (derived)
FACE_CENTER_POINT = np.stack(
    [
        np.cos(FACE_CENTER_GEO[:, 0]) * np.cos(FACE_CENTER_GEO[:, 1]),
        np.cos(FACE_CENTER_GEO[:, 0]) * np.sin(FACE_CENTER_GEO[:, 1]),
        np.sin(FACE_CENTER_GEO[:, 0]),
    ],
    axis=1,
)

# azimuth (radians) from each face center to the Class II i-axis vertex 0
FACE_AXES_AZ_RADS_CII_0 = np.array(
    [
        5.619958268523939882,
        5.760339081714187279,
        0.780213654393430055,
        0.430469363979999913,
        6.130269123335111400,
        2.692877706530642877,
        2.982963003477243874,
        3.532912002790141181,
        3.494305004259568154,
        3.003214169499538391,
        5.930472956509811562,
        0.138378484090254847,
        0.448714947059150361,
        0.158629650112549365,
        5.891865957979238535,
        2.711123289609793325,
        3.294508837434268316,
        3.804819692245439833,
        3.664438879055192436,
        2.361378999196363184,
    ],
    dtype=np.float64,
)

# --- res-0 base cells -------------------------------------------------------
# (home_face, i, j, k, is_pentagon) for base cells 0..121.

_BASE_CELL_DATA = [
    # fmt: off
    (1, 1, 0, 0, 0), (2, 1, 1, 0, 0), (1, 0, 0, 0, 0), (2, 1, 0, 0, 0),
    (0, 2, 0, 0, 1), (1, 1, 1, 0, 0), (1, 0, 0, 1, 0), (2, 0, 0, 0, 0),
    (0, 1, 0, 0, 0), (2, 0, 1, 0, 0), (1, 0, 1, 0, 0), (1, 0, 1, 1, 0),
    (3, 1, 0, 0, 0), (3, 1, 1, 0, 0), (11, 2, 0, 0, 1), (4, 1, 0, 0, 0),
    (0, 0, 0, 0, 0), (6, 0, 1, 0, 0), (0, 0, 0, 1, 0), (2, 0, 1, 1, 0),
    (7, 0, 0, 1, 0), (2, 0, 0, 1, 0), (0, 1, 1, 0, 0), (6, 0, 0, 1, 0),
    (10, 2, 0, 0, 1), (6, 0, 0, 0, 0), (3, 0, 0, 0, 0), (11, 1, 0, 0, 0),
    (4, 1, 1, 0, 0), (3, 0, 1, 0, 0), (0, 0, 1, 1, 0), (4, 0, 0, 0, 0),
    (5, 0, 1, 0, 0), (0, 0, 1, 0, 0), (7, 0, 1, 0, 0), (11, 1, 1, 0, 0),
    (7, 0, 0, 0, 0), (10, 1, 0, 0, 0), (12, 2, 0, 0, 1), (6, 1, 0, 1, 0),
    (7, 1, 0, 1, 0), (4, 0, 0, 1, 0), (3, 0, 0, 1, 0), (3, 0, 1, 1, 0),
    (4, 0, 1, 0, 0), (6, 1, 0, 0, 0), (11, 0, 0, 0, 0), (8, 0, 0, 1, 0),
    (5, 0, 0, 1, 0), (14, 2, 0, 0, 1), (5, 0, 0, 0, 0), (12, 1, 0, 0, 0),
    (10, 1, 1, 0, 0), (4, 0, 1, 1, 0), (12, 1, 1, 0, 0), (7, 1, 0, 0, 0),
    (11, 0, 1, 0, 0), (10, 0, 0, 0, 0), (13, 2, 0, 0, 1), (10, 0, 0, 1, 0),
    (11, 0, 0, 1, 0), (9, 0, 1, 0, 0), (8, 0, 1, 0, 0), (6, 2, 0, 0, 1),
    (8, 0, 0, 0, 0), (9, 0, 0, 1, 0), (14, 1, 0, 0, 0), (5, 1, 0, 1, 0),
    (16, 0, 1, 1, 0), (8, 1, 0, 1, 0), (5, 1, 0, 0, 0), (12, 0, 0, 0, 0),
    (7, 2, 0, 0, 1), (12, 0, 1, 0, 0), (10, 0, 1, 0, 0), (9, 0, 0, 0, 0),
    (13, 1, 0, 0, 0), (16, 0, 0, 1, 0), (15, 0, 1, 1, 0), (15, 0, 1, 0, 0),
    (16, 0, 1, 0, 0), (14, 1, 1, 0, 0), (13, 1, 1, 0, 0), (5, 2, 0, 0, 1),
    (8, 1, 0, 0, 0), (14, 0, 0, 0, 0), (9, 1, 0, 1, 0), (14, 0, 0, 1, 0),
    (17, 0, 0, 1, 0), (12, 0, 0, 1, 0), (16, 0, 0, 0, 0), (17, 0, 1, 1, 0),
    (15, 0, 0, 1, 0), (16, 1, 0, 1, 0), (9, 1, 0, 0, 0), (15, 0, 0, 0, 0),
    (13, 0, 0, 0, 0), (8, 2, 0, 0, 1), (13, 0, 1, 0, 0), (17, 1, 0, 1, 0),
    (19, 0, 1, 0, 0), (14, 0, 1, 0, 0), (19, 0, 1, 1, 0), (17, 0, 1, 0, 0),
    (13, 0, 0, 1, 0), (17, 0, 0, 0, 0), (16, 1, 0, 0, 0), (9, 2, 0, 0, 1),
    (15, 1, 0, 1, 0), (15, 1, 0, 0, 0), (18, 0, 1, 1, 0), (18, 0, 0, 1, 0),
    (19, 0, 0, 1, 0), (17, 1, 0, 0, 0), (19, 0, 0, 0, 0), (18, 0, 1, 0, 0),
    (18, 1, 0, 1, 0), (19, 2, 0, 0, 1), (19, 1, 0, 0, 0), (18, 0, 0, 0, 0),
    (19, 1, 0, 1, 0), (18, 1, 0, 0, 0),
    # fmt: on
]

_bcd = np.array(_BASE_CELL_DATA, dtype=np.int64)
BASE_CELL_HOME_FACE = _bcd[:, 0].copy()
BASE_CELL_HOME_IJK = _bcd[:, 1:4].copy()
BASE_CELL_IS_PENTAGON = _bcd[:, 4].astype(bool)
PENTAGON_BASE_CELLS = np.nonzero(BASE_CELL_IS_PENTAGON)[0]

# faces on which each pentagon base cell's coordinate system is clockwise
# offset (used during encode when the leading digit is K); polar pentagons
# (base cells 4 and 117) have none.
PENT_CW_OFFSET_FACES = {
    14: (2, 6),
    24: (1, 5),
    38: (3, 7),
    49: (0, 9),
    58: (4, 8),
    63: (11, 15),
    72: (12, 16),
    83: (10, 19),
    97: (13, 17),
    107: (14, 18),
}

# boolean [122][20]: is face f a cw-offset face of pentagon base cell b
BASE_CELL_CW_OFFSET = np.zeros((NUM_BASE_CELLS, NUM_ICOSA_FACES), dtype=bool)
for _b, _faces in PENT_CW_OFFSET_FACES.items():
    for _f in _faces:
        BASE_CELL_CW_OFFSET[_b, _f] = True

POLAR_PENTAGONS = (4, 117)

# --- icosahedron face neighbors --------------------------------------------
# faceNeighbors[face][quadrant] -> (neighbor_face, translate_ijk, ccw_rot60)
# quadrants: 0 = central (identity), 1 = IJ, 2 = KI, 3 = JK.
# The table follows the icosahedron's 4-fold structure: 5 top-cap faces
# (0-4), 5 upward mid faces (5-9), 5 downward mid faces (10-14), 5
# bottom-cap faces (15-19).

IJ = 1
KI = 2
JK = 3


def _build_face_neighbors():
    face = np.zeros((20, 4), dtype=np.int64)
    translate = np.zeros((20, 4, 3), dtype=np.int64)
    ccw_rot = np.zeros((20, 4), dtype=np.int64)
    for f in range(20):
        face[f, 0] = f  # central
        if f < 5:  # top cap
            face[f, IJ] = (f + 4) % 5
            face[f, KI] = (f + 1) % 5
            face[f, JK] = f + 5
            translate[f, IJ] = (2, 0, 2)
            translate[f, KI] = (2, 2, 0)
            translate[f, JK] = (0, 2, 2)
            ccw_rot[f, IJ] = 1
            ccw_rot[f, KI] = 5
            ccw_rot[f, JK] = 3
        elif f < 10:  # upward mid
            face[f, IJ] = f + 5
            face[f, KI] = 10 + (f + 4) % 5
            face[f, JK] = f - 5
            translate[f, IJ] = (2, 2, 0)
            translate[f, KI] = (2, 0, 2)
            translate[f, JK] = (0, 2, 2)
            ccw_rot[f, IJ] = 3
            ccw_rot[f, KI] = 3
            ccw_rot[f, JK] = 3
        elif f < 15:  # downward mid
            face[f, IJ] = f - 5
            face[f, KI] = 5 + (f + 1) % 5
            face[f, JK] = f + 5
            translate[f, IJ] = (2, 2, 0)
            translate[f, KI] = (2, 0, 2)
            translate[f, JK] = (0, 2, 2)
            ccw_rot[f, IJ] = 3
            ccw_rot[f, KI] = 3
            ccw_rot[f, JK] = 3
        else:  # bottom cap
            face[f, IJ] = 15 + (f + 1) % 5
            face[f, KI] = 15 + (f + 4) % 5
            face[f, JK] = f - 5
            translate[f, IJ] = (2, 0, 2)
            translate[f, KI] = (2, 2, 0)
            translate[f, JK] = (0, 2, 2)
            ccw_rot[f, IJ] = 1
            ccw_rot[f, KI] = 5
            ccw_rot[f, JK] = 3
    return face, translate, ccw_rot


FACE_NEIGHBOR_FACE, FACE_NEIGHBOR_TRANSLATE, FACE_NEIGHBOR_CCWROT = _build_face_neighbors()

# powers of 7 (fits in int64 up to 7^22)
POW7 = 7 ** np.arange(0, 17, dtype=np.int64)
