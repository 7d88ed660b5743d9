"""MySQL GEOMETRY column decode/encode (beyond-reference).

The reference hands GEOMETRY columns to the user as the raw binary blob
(`src/events/row_events/row_parser.rs:174-175`, same branch as JSON).
MySQL's internal format (public knowledge — documented in the MySQL
manual "Internal Geometry Storage Format" and implemented by every GIS
client) is::

    value := srid:u32-LE  wkb

    wkb   := byte_order:u8 (0=big-endian, 1=little-endian)
             wkb_type:u32
             payload

    type 1 Point              x:f64 y:f64
    type 2 LineString         n:u32 point-coords*
    type 3 Polygon            n:u32 linear-ring* (ring = n:u32 coords*)
    type 4 MultiPoint         n:u32 wkb-point*        (nested full WKB)
    type 5 MultiLineString    n:u32 wkb-linestring*
    type 6 MultiPolygon       n:u32 wkb-polygon*
    type 7 GeometryCollection n:u32 wkb*

This module decodes the blob into WKT text (what ``ST_AsText`` returns),
prefixed ``SRID=<n>;`` (EWKT) when the SRID is non-zero, so a TableSpec
can declare column kind ``"geometry"`` and receive a readable, hashable
string column instead of opaque bytes. The encoder produces the
canonical little-endian bytes for fixtures and round-trip tests.

Coordinate text formatting follows ST_AsText: shortest round-trip float
repr, integral values printed without a trailing ``.0`` (``POINT(1 2)``,
not ``POINT(1.0 2.0)``).
"""

from __future__ import annotations

import struct


class GeometryError(ValueError):
    pass


_POINT, _LINESTRING, _POLYGON = 1, 2, 3
_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION = 4, 5, 6, 7

_NAMES = {
    _POINT: "POINT",
    _LINESTRING: "LINESTRING",
    _POLYGON: "POLYGON",
    _MULTIPOINT: "MULTIPOINT",
    _MULTILINESTRING: "MULTILINESTRING",
    _MULTIPOLYGON: "MULTIPOLYGON",
    _COLLECTION: "GEOMETRYCOLLECTION",
}


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _coords(data: bytes, pos: int, n: int, fmt_f64: str) -> tuple[list, int]:
    vals = struct.unpack_from(f"{fmt_f64[0]}{2 * n}d", data, pos)
    return [(vals[2 * i], vals[2 * i + 1]) for i in range(n)], pos + 16 * n


def _decode_wkb(data: bytes, pos: int) -> tuple[int, object, int]:
    """One WKB value at ``pos`` → (wkb_type, structure, next_pos)."""
    if pos >= len(data):
        raise GeometryError("geometry: truncated WKB header")
    order = data[pos]
    if order not in (0, 1):
        raise GeometryError(f"geometry: bad byte-order flag {order}")
    e = "<" if order == 1 else ">"
    (wtype,) = struct.unpack_from(f"{e}I", data, pos + 1)
    pos += 5
    if wtype == _POINT:
        pts, pos = _coords(data, pos, 1, f"{e}d")
        return wtype, pts[0], pos
    if wtype in (_LINESTRING,):
        (n,) = struct.unpack_from(f"{e}I", data, pos)
        pts, pos = _coords(data, pos + 4, n, f"{e}d")
        return wtype, pts, pos
    if wtype == _POLYGON:
        (nrings,) = struct.unpack_from(f"{e}I", data, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(f"{e}I", data, pos)
            pts, pos = _coords(data, pos + 4, n, f"{e}d")
            rings.append(pts)
        return wtype, rings, pos
    if wtype in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
        (n,) = struct.unpack_from(f"{e}I", data, pos)
        pos += 4
        parts = []
        for _ in range(n):
            t, s, pos = _decode_wkb(data, pos)
            parts.append((t, s))
        return wtype, parts, pos
    raise GeometryError(f"geometry: unsupported WKB type {wtype}")


def _wkt_body(wtype: int, s) -> str:
    if wtype == _POINT:
        return f"({_fmt(s[0])} {_fmt(s[1])})"
    if wtype == _LINESTRING:
        return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in s) + ")"
    if wtype == _POLYGON:
        return (
            "("
            + ", ".join(
                "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring) + ")"
                for ring in s
            )
            + ")"
        )
    if wtype in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON):
        return "(" + ", ".join(_wkt_body(t, sub) for t, sub in s) + ")"
    if wtype == _COLLECTION:
        return "(" + ", ".join(f"{_NAMES[t]}{_wkt_body(t, sub)}" for t, sub in s) + ")"
    raise GeometryError(f"geometry: unsupported WKB type {wtype}")


def geometry_to_wkt(blob: bytes):
    """MySQL geometry column blob (SRID + WKB) → WKT text; non-zero SRID
    renders as an EWKT ``SRID=<n>;`` prefix. None/empty → None (SQL NULL,
    same convention as jsonb)."""
    if blob is None or len(blob) == 0:
        return None
    if len(blob) < 4:
        raise GeometryError("geometry: blob shorter than SRID header")
    blob = bytes(blob)
    (srid,) = struct.unpack_from("<I", blob, 0)
    wtype, s, end = _decode_wkb(blob, 4)
    if end != len(blob):
        raise GeometryError("geometry: trailing bytes after WKB value")
    wkt = f"{_NAMES[wtype]}{_wkt_body(wtype, s)}"
    return f"SRID={srid};{wkt}" if srid else wkt


# --------------------------------------------------------------- encode
#
# Structured input: ("point", (x, y)) | ("linestring", [(x,y)...])
# | ("polygon", [ring, ...]) | ("multipoint"|..., [inner-structure...])
# — enough to build fixtures; canonical little-endian output.

_TYPE_BY_NAME = {
    "point": _POINT,
    "linestring": _LINESTRING,
    "polygon": _POLYGON,
    "multipoint": _MULTIPOINT,
    "multilinestring": _MULTILINESTRING,
    "multipolygon": _MULTIPOLYGON,
    "geometrycollection": _COLLECTION,
}

_INNER = {
    _MULTIPOINT: "point",
    _MULTILINESTRING: "linestring",
    _MULTIPOLYGON: "polygon",
}


def _encode_wkb(value) -> bytes:
    name, payload = value
    wtype = _TYPE_BY_NAME[name.lower()]
    out = bytearray(struct.pack("<BI", 1, wtype))
    if wtype == _POINT:
        out += struct.pack("<2d", *payload)
    elif wtype == _LINESTRING:
        out += struct.pack("<I", len(payload))
        for x, y in payload:
            out += struct.pack("<2d", x, y)
    elif wtype == _POLYGON:
        out += struct.pack("<I", len(payload))
        for ring in payload:
            out += struct.pack("<I", len(ring))
            for x, y in ring:
                out += struct.pack("<2d", x, y)
    elif wtype in _INNER:
        out += struct.pack("<I", len(payload))
        for sub in payload:
            out += _encode_wkb((_INNER[wtype], sub))
    elif wtype == _COLLECTION:
        out += struct.pack("<I", len(payload))
        for sub in payload:
            out += _encode_wkb(sub)
    else:  # pragma: no cover
        raise GeometryError(f"geometry: cannot encode {name!r}")
    return bytes(out)


def encode_geometry(value, srid: int = 0) -> bytes:
    """Structured geometry → MySQL column blob (SRID + canonical LE WKB)."""
    return struct.pack("<I", srid) + _encode_wkb(value)
