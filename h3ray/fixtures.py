"""Deterministic synthetic fixtures (FIXTURES.md F1-F7), seed=42,
NumPy+PyArrow only.

These are the library-free stand-ins for the reference's test corpus
(naturalearth .fgb, r.tiff, population parquet — unreadable here without
geopandas/rasterio).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .h3core import bits, faceijk, wkb

SEED = 42


def cells_table(n: int = 5000) -> pa.Table:
    """F1: valid cells at mixed res, ~1% nulls, ~1% invalid u64s."""
    rng = np.random.default_rng(SEED)
    lat = rng.uniform(-85, 85, n)
    lng = rng.uniform(-180, 180, n)
    res = rng.integers(0, 16, n).astype(np.uint8)
    cells = faceijk.latlng_to_cell(lat, lng, res)
    invalid = rng.random(n) < 0.01
    cells = np.where(invalid, rng.integers(1, 2**52, n, dtype=np.uint64), cells)
    res = np.where(invalid, 255, res).astype(np.uint8)
    nulls = rng.random(n) < 0.01
    return pa.table(
        {
            "cell": pa.array(cells, mask=nulls),
            "res": pa.array(res, mask=nulls),
        }
    )


def points_table(n: int = 10000) -> pa.Table:
    """F2: encode inputs incl. poles, zeros and pentagon centers."""
    rng = np.random.default_rng(SEED)
    lat = rng.uniform(-85, 85, n)
    lng = rng.uniform(-180, 180, n)
    res = rng.integers(0, 16, n).astype(np.uint8)
    # edge cases up front
    res0 = bits.set_base_cell(bits.init_cell(0, 122), np.arange(122, dtype=np.uint64))
    pents = res0[bits.is_pentagon(res0)]
    plat, plng = faceijk.cell_to_latlng(pents)
    lat[:12], lng[:12] = plat, plng
    lat[12:16] = [90.0, -90.0, 0.0, 0.0]
    lng[12:16] = [0.0, 0.0, 180.0, -180.0]
    return pa.table({"lat": pa.array(lat), "lng": pa.array(lng), "res": pa.array(res)})


def cell_strings_table() -> pa.Table:
    """F3: hex / decimal / coordinate forms + unparsables."""
    rng = np.random.default_rng(SEED)
    lat = rng.uniform(-60, 60, 50)
    lng = rng.uniform(-170, 170, 50)
    cells = faceijk.latlng_to_cell(lat, lng, 7)
    hexes = bits.to_hex_strings(cells).tolist()
    decs = [str(int(c)) for c in cells[:10]]
    coords = [f"{lo:.4f}, {la:.4f}, 7" for la, lo in zip(lat[:10], lng[:10])]
    semis = [f"{lo:.4f}; {la:.4f}; 7" for la, lo in zip(lat[:5], lng[:5])]
    bad = ["invalid", "", "1,2", "999,999,99"]
    s = hexes + decs + coords + semis + bad
    ok = [True] * (len(s) - len(bad)) + [False] * len(bad)
    return pa.table(
        {"s": pa.array(s, type=pa.large_string()), "expect_ok": pa.array(ok)}
    )


def polygons_table() -> pa.Table:
    """F4: regular n-gons, a hole, a degenerate, antimeridian, multipolygon."""
    rng = np.random.default_rng(SEED)
    geoms = []
    names = []
    pid = []
    i = 0
    for nv in range(3, 13):
        clat = rng.uniform(-55, 55)
        clng = rng.uniform(-150, 150)
        r = rng.uniform(0.01, 10.0)
        ang = np.linspace(0, 2 * np.pi, nv + 1)
        ring = np.stack(
            [clng + r * np.cos(ang), clat + r * 0.7 * np.sin(ang)], axis=1
        )
        geoms.append(wkb.dumps_polygon([ring]))
        names.append(f"ngon{nv}")
        pid.append(i)
        i += 1
    # with hole
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=np.float64)
    hole = np.array([[1, 1], [1, 3], [3, 3], [3, 1], [1, 1]], dtype=np.float64)
    geoms.append(wkb.dumps_polygon([outer, hole]))
    names.append("hole")
    pid.append(i)
    i += 1
    # degenerate micro-polygon
    geoms.append(wkb.dumps_polygon([np.array([[10.0, 50.0]] * 4)]))
    names.append("degenerate")
    pid.append(i)
    i += 1
    # antimeridian
    am = np.array(
        [[178.0, -5.0], [-178.0, -5.0], [-178.0, 5.0], [178.0, 5.0], [178.0, -5.0]]
    )
    geoms.append(wkb.dumps_polygon([am]))
    names.append("antimeridian")
    pid.append(i)
    i += 1
    # multipolygon
    a = np.array([[20, 20], [21, 20], [21, 21], [20, 21], [20, 20]], dtype=np.float64)
    b = np.array([[25, 25], [26, 25], [26, 26], [25, 26], [25, 25]], dtype=np.float64)
    geoms.append(wkb.dumps_multipolygon([[a], [b]]))
    names.append("multi")
    pid.append(i)
    return pa.table(
        {
            "poly_id": pa.array(pid, type=pa.int64()),
            "geometry": pa.array(geoms, type=pa.large_binary()),
            "name": pa.array(names),
        }
    )


# three "urban" hot boxes for the skewed geo corpus (F5)
HOT_BOXES = [
    (-74.1, 40.6, -73.8, 40.9),  # NYC-ish
    (139.5, 35.5, 139.9, 35.8),  # Tokyo-ish
    (13.2, 52.4, 13.6, 52.6),  # Berlin-ish
]


def skewed_documents_table(n: int = 2000, hot_fraction: float = 0.8) -> pa.Table:
    """F5: interleaved span docs whose geo spans are 80% drawn from three
    hot boxes — the hot-cell salting exercise."""
    rng = np.random.default_rng(SEED)
    hot = rng.random(n) < hot_fraction
    box = rng.integers(0, len(HOT_BOXES), n)
    lng = rng.uniform(-179, 179, n)
    lat = rng.uniform(-80, 80, n)
    for i, (x0, y0, x1, y1) in enumerate(HOT_BOXES):
        m = hot & (box == i)
        lng[m] = rng.uniform(x0, x1, int(m.sum()))
        lat[m] = rng.uniform(y0, y1, int(m.sum()))
    kinds, texts, refs, offsets, lengths = [], [], [], [], []
    for i in range(n):
        spans = [
            ("text", f"synthetic doc {i}", "", 0),
            ("media", "", f"media://fixture/{i}/0", 10),
            ("geo", f"{lng[i]:.5f},{lat[i]:.5f},8", "", 10),
        ]
        lengths.append(len(spans))
        for k, tx, rf, off in spans:
            kinds.append(k)
            texts.append(tx)
            refs.append(rf)
            offsets.append(off)
    flat = pa.StructArray.from_arrays(
        [
            pa.array(kinds),
            pa.array(texts),
            pa.array(refs),
            pa.array(offsets, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=off[1:])
    spans = pa.LargeListArray.from_arrays(pa.array(off), flat)
    return pa.table(
        {"doc_id": pa.array([str(i) for i in range(n)]), "spans": spans}
    )


def raster_tiles_table(tile: int = 64, grid: int = 3) -> pa.Table:
    """F6: tile rows over a smooth field with nodata blobs, all ten dtypes."""
    rng = np.random.default_rng(SEED)
    dtypes = ["u1", "i1", "u2", "i2", "u4", "i4", "u8", "i8", "f4", "f8"]
    rows = []
    t0 = (0.05, 0.0, -10.0, 0.0, -0.05, 10.0)
    idx = 0
    for ty in range(grid):
        for tx in range(grid):
            dt = np.dtype(dtypes[idx % len(dtypes)])
            idx += 1
            yy, xx = np.mgrid[0:tile, 0:tile]
            field = (np.sin(xx / 9.0) + np.cos(yy / 7.0) + 2.0) * 20.0
            blob = (xx - tile / 2) ** 2 + (yy - tile / 2) ** 2 < (tile / 6) ** 2
            field[blob] = 0.0
            vals = field.astype(dt)
            rows.append(
                {
                    "tile_y": ty,
                    "tile_x": tx,
                    "height": tile,
                    "width": tile,
                    "transform": [
                        t0[0], t0[1], t0[2] + tx * tile * t0[0],
                        t0[3], t0[4], t0[5] + ty * tile * t0[4],
                    ],
                    "values": vals.tobytes(),
                    "dtype": dt.str.lstrip("<>|="),
                    "nodata": 0.0,
                }
            )
    return pa.Table.from_pylist(rows)


def cell_values_table(n: int = 11742) -> pa.Table:
    """F7: single-res regional coverage + population column (mirrors the
    population-841fa8bffffffff fixture's shape)."""
    rng = np.random.default_rng(SEED)
    lat = rng.uniform(47.0, 49.0, n * 2)
    lng = rng.uniform(7.0, 10.0, n * 2)
    cells = np.unique(faceijk.latlng_to_cell(lat, lng, 8))[:n]
    pop = rng.gamma(2.0, 150.0, len(cells))
    return pa.table(
        {"h3index": pa.array(cells), "pop_general": pa.array(pop)}
    )
