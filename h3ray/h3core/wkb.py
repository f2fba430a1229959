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
