"""Minimal WKB geometry codec (shapely is unavailable in this environment).

Supports 2D Point / LineString / Polygon / MultiPoint / MultiLineString /
MultiPolygon / GeometryCollection in both byte orders, tolerating the EWKB
SRID flag.  Geometries are represented as plain dicts:

  {"type": "Polygon", "rings": [ndarray (N,2) lng/lat, ...]}
  {"type": "LineString", "coords": ndarray (N,2)}
  {"type": "Point", "coords": ndarray (1,2)}
  multi types: {"type": "Multi...", "parts": [geom, ...]}

This is the geometry interchange layer of the engine, mirroring the
reference's WKBArray boundary (h3ronpy/src/vector.rs:364-380).
"""

from __future__ import annotations

import struct

import numpy as np

_POINT = 1
_LINESTRING = 2
_POLYGON = 3
_MULTIPOINT = 4
_MULTILINESTRING = 5
_MULTIPOLYGON = 6
_COLLECTION = 7

_EWKB_SRID = 0x20000000
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000


class WKBError(ValueError):
    pass


def _read_geom(buf: memoryview, off: int):
    if off + 5 > len(buf):
        raise WKBError("truncated WKB header")
    little = buf[off] == 1
    bo = "<" if little else ">"
    (type_raw,) = struct.unpack_from(bo + "I", buf, off + 1)
    off += 5
    if type_raw & (_EWKB_Z | _EWKB_M):
        raise WKBError("Z/M coordinates are not supported")
    has_srid = bool(type_raw & _EWKB_SRID)
    gtype = type_raw & 0xFF
    # ISO WKB encodes dimensions as type + 1000/2000/3000
    if gtype != type_raw & 0xFFFF:
        pass
    iso_dim = (type_raw & 0xFFFF) // 1000
    if iso_dim not in (0,):
        raise WKBError("only 2D geometries are supported")
    if has_srid:
        off += 4

    def read_coords(n):
        nonlocal off
        arr = np.frombuffer(buf, dtype=(bo + "f8"), count=2 * n, offset=off).reshape(
            n, 2
        )
        off2 = off + 16 * n
        return arr.copy(), off2

    if gtype == _POINT:
        coords, off = read_coords(1)
        return {"type": "Point", "coords": coords}, off
    if gtype == _LINESTRING:
        (n,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        coords, off = read_coords(n)
        return {"type": "LineString", "coords": coords}, off
    if gtype == _POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            off += 4
            ring, off = read_coords(n)
            rings.append(ring)
        return {"type": "Polygon", "rings": rings}, off
    if gtype in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
        (nparts,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            g, off = _read_geom(buf, off)
            parts.append(g)
        name = {
            _MULTIPOINT: "MultiPoint",
            _MULTILINESTRING: "MultiLineString",
            _MULTIPOLYGON: "MultiPolygon",
            _COLLECTION: "GeometryCollection",
        }[gtype]
        return {"type": name, "parts": parts}, off
    raise WKBError(f"unsupported WKB geometry type {gtype}")


def loads(data: bytes) -> dict:
    g, _ = _read_geom(memoryview(data), 0)
    return g


# --- writers ----------------------------------------------------------------


def dumps_point(lng: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, _POINT, lng, lat)


def dumps_linestring(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    return struct.pack("<BII", 1, _LINESTRING, len(coords)) + coords.tobytes()


def dumps_polygon(rings: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, _POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.tobytes())
    return b"".join(out)


def dumps_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BII", 1, _MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(dumps_polygon(rings))
    return b"".join(out)


# --- vectorized batch writers (no per-geometry Python) ----------------------


def _u32_scatter(out: np.ndarray, pos: np.ndarray, vals) -> None:
    """Write little-endian u32 ``vals`` at byte positions ``pos`` (may be
    unaligned) — four vectorized byte scatters."""
    v = np.asarray(vals, dtype=np.uint32)
    for b in range(4):
        out[pos + b] = ((v >> np.uint32(8 * b)) & np.uint32(0xFF)).astype(np.uint8)


def _f64_pairs_bytes(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleaved (x, y) doubles as a flat little-endian byte array."""
    pairs = np.empty((len(x), 2), dtype="<f8")
    pairs[:, 0] = x
    pairs[:, 1] = y
    return pairs.reshape(-1).view(np.uint8)


def _binary_array(data: np.ndarray, offsets: np.ndarray) -> "pa.Array":
    import pyarrow as pa

    return pa.Array.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int64).tobytes()),
         pa.py_buffer(data.tobytes())],
    )


def dumps_points_batch(lng: np.ndarray, lat: np.ndarray):
    """One WKB point per row as a large_binary Array (21-byte records built
    by columnar byte scatters)."""
    n = len(lng)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", _POINT), dtype=np.uint8)
    buf[:, 5:13] = np.asarray(lng, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(lat, dtype="<f8").view(np.uint8).reshape(n, 8)
    offsets = np.arange(n + 1, dtype=np.int64) * 21
    return _binary_array(buf.reshape(-1), offsets)


def dumps_linestrings_batch(lng0, lat0, lng1, lat1):
    """One 2-point WKB linestring per row (45-byte fixed records)."""
    n = len(lng0)
    buf = np.empty((n, 45), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.frombuffer(struct.pack("<I", _LINESTRING), dtype=np.uint8)
    buf[:, 5:9] = np.frombuffer(struct.pack("<I", 2), dtype=np.uint8)
    buf[:, 9:17] = np.asarray(lng0, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 17:25] = np.asarray(lat0, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 25:33] = np.asarray(lng1, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 33:41] = np.asarray(lat1, dtype="<f8").view(np.uint8).reshape(n, 8)
    offsets = np.arange(n + 1, dtype=np.int64) * 45
    return _binary_array(buf.reshape(-1), offsets)


def dumps_linestrings_jagged(lng: np.ndarray, lat: np.ndarray, off: np.ndarray):
    """One WKB linestring per jagged segment of (lng, lat) — vectorized."""
    off = np.asarray(off, dtype=np.int64)
    n = len(off) - 1
    m = np.diff(off)
    sizes = 9 + m * 16
    rec_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=rec_off[1:])
    out = np.empty(int(rec_off[-1]), dtype=np.uint8)
    starts = rec_off[:-1]
    out[starts] = 1
    _u32_scatter(out, starts + 1, np.full(n, _LINESTRING, dtype=np.uint32))
    _u32_scatter(out, starts + 5, m.astype(np.uint32))
    coord_bytes = _f64_pairs_bytes(
        np.asarray(lng, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    )
    bytecounts = m * 16
    bcum = np.cumsum(bytecounts) - bytecounts
    dst = (
        np.repeat(starts + 9, bytecounts)
        + np.arange(int(bytecounts.sum()), dtype=np.int64)
        - np.repeat(bcum, bytecounts)
    )
    out[dst] = coord_bytes
    return _binary_array(out, rec_off)


def dumps_ring_polygons_batch(lng: np.ndarray, lat: np.ndarray, off: np.ndarray):
    """One single-ring WKB polygon per jagged segment of (lng, lat), with
    ring closure appended — fully vectorized (byte scatters + one gather)."""
    off = np.asarray(off, dtype=np.int64)
    n = len(off) - 1
    m = np.diff(off)
    nvert = m + 1  # closure
    sizes = 13 + nvert * 16
    rec_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=rec_off[1:])
    out = np.empty(int(rec_off[-1]), dtype=np.uint8)
    starts = rec_off[:-1]
    out[starts] = 1
    _u32_scatter(out, starts + 1, np.full(n, _POLYGON, dtype=np.uint32))
    _u32_scatter(out, starts + 5, np.ones(n, dtype=np.uint32))
    _u32_scatter(out, starts + 9, nvert.astype(np.uint32))
    # vertex sources: each cell's boundary verts then its first vert again
    T = int(nvert.sum())
    cum = np.cumsum(nvert) - nvert
    cell_of = np.repeat(np.arange(n), nvert)
    w = np.arange(T, dtype=np.int64) - cum[cell_of]
    src = off[:-1][cell_of] + np.where(w < m[cell_of], w, 0)
    coord_bytes = _f64_pairs_bytes(
        np.asarray(lng, dtype=np.float64)[src], np.asarray(lat, dtype=np.float64)[src]
    )
    bytecounts = nvert * 16
    bcum = np.cumsum(bytecounts) - bytecounts
    dst = (
        np.repeat(starts + 13, bytecounts)
        + np.arange(int(bytecounts.sum()), dtype=np.int64)
        - np.repeat(bcum, bytecounts)
    )
    out[dst] = coord_bytes
    return _binary_array(out, rec_off)


def geo_interface_to_geom(obj) -> dict:
    """__geo_interface__ mapping -> internal dict (mirror of the reference's
    geometry_to_cells input path, h3ronpy/src/vector.rs:406-425)."""
    if hasattr(obj, "__geo_interface__"):
        obj = obj.__geo_interface__
    t = obj["type"]
    if t == "Point":
        return {"type": t, "coords": np.asarray([obj["coordinates"]], dtype=np.float64)}
    if t == "LineString":
        return {"type": t, "coords": np.asarray(obj["coordinates"], dtype=np.float64)}
    if t == "Polygon":
        return {
            "type": t,
            "rings": [np.asarray(r, dtype=np.float64) for r in obj["coordinates"]],
        }
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        sub = {"MultiPoint": "Point", "MultiLineString": "LineString", "MultiPolygon": "Polygon"}[t]
        parts = []
        for c in obj["coordinates"]:
            parts.append(
                geo_interface_to_geom({"type": sub, "coordinates": c})
            )
        return {"type": t, "parts": parts}
    if t == "GeometryCollection":
        return {
            "type": t,
            "parts": [geo_interface_to_geom(g) for g in obj["geometries"]],
        }
    raise WKBError(f"unsupported __geo_interface__ type {t}")
