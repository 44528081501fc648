"""Minimal WKB codec (pure numpy/struct) for the engine's geometry columns.

Geometry is stored in DataFrames as WKB `binary` columns (SURVEY.md §1.2,
replacing geopandas GeoDataFrames). Supported types cover everything the
reference produces: Point, LineString, Polygon, MultiPoint,
MultiLineString, MultiPolygon (coastlines/vector.py:1450-1456 contours,
:1471 points, :353-419 masks). Little-endian, 2-D, no SRID (CRS is a
per-run constant, coastlines/continental.py:184).
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 1, 2, 3, 4, 5, 6
_NAMES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
          5: "MultiLineString", 6: "MultiPolygon"}


def point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, x, y)


def linestring(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, "<f8").reshape(-1, 2)
    return struct.pack("<BII", 1, LINESTRING, len(coords)) + coords.tobytes()


def polygon(shell: np.ndarray, holes: list[np.ndarray] | None = None) -> bytes:
    rings = [np.asarray(shell, "<f8").reshape(-1, 2)]
    rings += [np.asarray(h, "<f8").reshape(-1, 2) for h in (holes or [])]
    out = [struct.pack("<BII", 1, POLYGON, len(rings))]
    for r in rings:
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(r)) + r.astype("<f8").tobytes())
    return b"".join(out)


def multilinestring(parts: list[np.ndarray]) -> bytes:
    out = [struct.pack("<BII", 1, MULTILINESTRING, len(parts))]
    for p in parts:
        out.append(linestring(p))
    return b"".join(out)


def multipoint(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, "<f8").reshape(-1, 2)
    out = [struct.pack("<BII", 1, MULTIPOINT, len(coords))]
    for x, y in coords:
        out.append(point(x, y))
    return b"".join(out)


def multipolygon(polys: list[bytes]) -> bytes:
    return struct.pack("<BII", 1, MULTIPOLYGON, len(polys)) + b"".join(polys)


def geom_type(buf: bytes) -> int:
    byte_order = buf[0]
    (t,) = struct.unpack_from("<I" if byte_order == 1 else ">I", buf, 1)
    return t & 0xFF


def geom_type_name(buf: bytes) -> str:
    return _NAMES[geom_type(buf)]


def _parse(buf: bytes, pos: int = 0):
    """Parse one geometry starting at pos; returns (type, payload, newpos).

    payload: Point -> (2,) array; LineString -> (n,2); Polygon -> [rings];
    Multi* -> list of child payloads.
    """
    bo = buf[pos]
    fmt = "<" if bo == 1 else ">"
    (t,) = struct.unpack_from(fmt + "I", buf, pos + 1)
    t &= 0xFF
    pos += 5
    if t == POINT:
        xy = np.frombuffer(buf, dtype=fmt + "f8", count=2, offset=pos)
        return t, xy.copy(), pos + 16
    if t == LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        coords = np.frombuffer(buf, dtype=fmt + "f8", count=2 * n, offset=pos).reshape(n, 2)
        return t, coords.copy(), pos + 16 * n
    if t == POLYGON:
        (nr,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(fmt + "I", buf, pos)
            pos += 4
            rings.append(
                np.frombuffer(buf, dtype=fmt + "f8", count=2 * n, offset=pos).reshape(n, 2).copy()
            )
            pos += 16 * n
        return t, rings, pos
    if t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        (ng,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        kids = []
        for _ in range(ng):
            _, payload, pos = _parse(buf, pos)
            kids.append(payload)
        return t, kids, pos
    raise ValueError(f"unsupported WKB type {t}")


def parse(buf: bytes):
    """Parse a WKB buffer -> (type_id, payload)."""
    t, payload, _ = _parse(bytes(buf), 0)
    return t, payload


def coords_of(buf: bytes) -> np.ndarray:
    """All vertex coordinates of any geometry as an (n, 2) array."""
    t, payload = parse(buf)
    if t == POINT:
        return payload.reshape(1, 2)
    if t == LINESTRING:
        return payload
    if t == POLYGON:
        return np.vstack(payload)
    if t == MULTIPOINT:
        return np.vstack([p.reshape(1, 2) for p in payload])
    if t == MULTILINESTRING:
        return np.vstack(payload) if payload else np.zeros((0, 2))
    if t == MULTIPOLYGON:
        return np.vstack([np.vstack(rings) for rings in payload])
    raise ValueError(f"unsupported type {t}")


def polygon_rings(buf: bytes) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """WKB Polygon/MultiPolygon -> [(shell, holes), ...] — the shape
    point-in-polygon consumers need (coords_of flattens rings, which is
    wrong for PIP: phantom edges between shell and holes)."""
    t, payload = parse(buf)
    if t == POLYGON:
        return [(payload[0], list(payload[1:]))]
    if t == MULTIPOLYGON:
        return [(p[0], list(p[1:])) for p in payload]
    raise ValueError(f"expected (Multi)Polygon, got type {t}")


def map_coords(buf: bytes, fn) -> bytes:
    """Rebuild a geometry with fn((n,2) ndarray) -> (n,2) applied to all
    vertices (the gpd `to_crs`-style coordinate rewrite primitive)."""
    t, payload = parse(buf)
    if t == POINT:
        out = fn(payload.reshape(1, 2))[0]
        return point(float(out[0]), float(out[1]))
    if t == LINESTRING:
        return linestring(fn(payload))
    if t == POLYGON:
        rings = [fn(r) for r in payload]
        return polygon(rings[0], rings[1:])
    if t == MULTIPOINT:
        return multipoint(fn(np.vstack([p.reshape(1, 2) for p in payload])))
    if t == MULTILINESTRING:
        return multilinestring([fn(p) for p in payload])
    if t == MULTIPOLYGON:
        polys = []
        for rings in payload:
            rr = [fn(r) for r in rings]
            polys.append(polygon(rr[0], rr[1:]))
        return multipolygon(polys)
    raise ValueError(f"unsupported type {t}")


def bbox(buf: bytes) -> tuple[float, float, float, float]:
    c = coords_of(buf)
    return float(c[:, 0].min()), float(c[:, 1].min()), float(c[:, 0].max()), float(c[:, 1].max())


def to_geojson_dict(buf: bytes) -> dict:
    """WKB -> GeoJSON geometry dict (export/parity sink, the engine's
    analog of the reference's gdf.to_file GeoJSON sinks,
    coastlines/vector.py:1613-1626)."""
    t, payload = parse(buf)
    if t == POINT:
        return {"type": "Point", "coordinates": [float(payload[0]), float(payload[1])]}
    if t == LINESTRING:
        return {"type": "LineString", "coordinates": payload.tolist()}
    if t == POLYGON:
        return {"type": "Polygon", "coordinates": [r.tolist() for r in payload]}
    if t == MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": [p.tolist() for p in payload]}
    if t == MULTILINESTRING:
        return {"type": "MultiLineString", "coordinates": [p.tolist() for p in payload]}
    if t == MULTIPOLYGON:
        return {
            "type": "MultiPolygon",
            "coordinates": [[r.tolist() for r in rings] for rings in payload],
        }
    raise ValueError(f"unsupported type {t}")
