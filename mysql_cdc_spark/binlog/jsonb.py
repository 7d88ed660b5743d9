"""MySQL JSON binary ("jsonb") decode/encode.

The reference hands JSON columns to the user as the raw binary blob
(`src/events/row_events/row_parser.rs:174-175` — "JSON is stored in
binary format", returned as `MySqlValue::Blob`). That is faithful but
useless downstream: every real CDC consumer (Debezium, Maxwell,
python-mysql-replication) decodes the blob into JSON text. This module
is that beyond-reference step, so a TableSpec can declare a column kind
``"json"`` and receive a JSON string column instead of opaque bytes.

Format (public knowledge — the layout is documented in the header
comment of MySQL's ``sql/json_binary.h`` and reimplemented by every
open-source binlog client):

    value      := type-byte payload
    type       := 0x00 small-object | 0x01 large-object
                | 0x02 small-array  | 0x03 large-array
                | 0x04 literal (0x00 null / 0x01 true / 0x02 false)
                | 0x05 int16  | 0x06 uint16 | 0x07 int32 | 0x08 uint32
                | 0x09 int64  | 0x0a uint64 | 0x0b double
                | 0x0c utf8 string (varlen length + bytes)
                | 0x0f opaque (1-byte field type + varlen length + data)

    object     := element-count size key-entry* value-entry* key* value*
    array      := element-count size value-entry* value*

Small containers use 2-byte counts/sizes/offsets, large use 4-byte
(key *lengths* are always 2 bytes). Offsets are relative to the start
of the container payload (the element-count field). Value entries are
(type-byte, offset) — except that "inlinable" scalars store their value
directly in the offset field: literals, int16, uint16 in both formats,
plus int32/uint32 in the large format. A container is written large
when any size/offset exceeds 0xFFFF (or it has >0xFFFF elements).

``varlen`` is the little-endian base-128 length used for string/opaque
data: 7 payload bits per byte, high bit = continuation.

Object keys are stored sorted by (length, bytes) — MySQL's canonical
key order — and duplicate keys keep the first occurrence, matching
server semantics ("first duplicate wins" since 8.0.3 the *last* wins at
INSERT time, but the stored binary never contains duplicates, so the
decoder just trusts the stored order).

Opaque values: NEWDECIMAL (field type 246) carries (precision byte,
scale byte, packed decimal) and decodes through the same
`kernels.parse_decimal` used for row images; temporal opaques
(DATE=10, TIME=11, DATETIME=12, TIMESTAMP=7) carry the 8-byte LE
"packed" longlong of my_time.h and decode to ISO strings. Other opaque
field types raise — mirroring the honest-error policy used elsewhere
(e.g. negative TIME) rather than inventing a representation.

Decoded Python values: dict / list / str / bool / None / int / float /
decimal.Decimal / datetime strings. ``to_text`` renders canonical JSON
text deterministically (decimals unquoted, stored key order preserved).
"""

from __future__ import annotations

import struct
from decimal import Decimal

from . import kernels as K

SMALL_OBJECT = 0x00
LARGE_OBJECT = 0x01
SMALL_ARRAY = 0x02
LARGE_ARRAY = 0x03
LITERAL = 0x04
INT16 = 0x05
UINT16 = 0x06
INT32 = 0x07
UINT32 = 0x08
INT64 = 0x09
UINT64 = 0x0A
DOUBLE = 0x0B
STRING = 0x0C
OPAQUE = 0x0F

LITERAL_NULL = 0x00
LITERAL_TRUE = 0x01
LITERAL_FALSE = 0x02

# opaque field types we decode (MySQL column type codes)
_FT_DECIMAL = 246
_FT_DATE = 10
_FT_TIME = 11
_FT_DATETIME = 12
_FT_TIMESTAMP = 7


class JsonbError(ValueError):
    pass


# ---------------------------------------------------------------- decode


def _read_varlen(data: bytes, pos: int) -> tuple[int, int]:
    """Little-endian base-128 length; returns (length, next_pos)."""
    length = 0
    for i in range(5):
        if pos >= len(data):
            raise JsonbError("jsonb: truncated varlen length")
        b = data[pos]
        pos += 1
        length |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return length, pos
    raise JsonbError("jsonb: varlen length longer than 5 bytes")


def _decode_opaque(data: bytes, pos: int):
    field_type = data[pos]
    length, dpos = _read_varlen(data, pos + 1)
    payload = data[dpos : dpos + length]
    if len(payload) != length:
        raise JsonbError("jsonb: truncated opaque payload")
    if field_type == _FT_DECIMAL:
        if length < 2:
            raise JsonbError("jsonb: opaque decimal shorter than header")
        precision, scale = payload[0], payload[1]
        text, _ = K.parse_decimal(payload, 2, precision | (scale << 8))
        return Decimal(text)
    if field_type in (_FT_DATETIME, _FT_TIMESTAMP, _FT_DATE):
        packed = struct.unpack("<q", payload[:8])[0]
        return _unpack_datetime(packed, date_only=field_type == _FT_DATE)
    if field_type == _FT_TIME:
        packed = struct.unpack("<q", payload[:8])[0]
        return _unpack_time(packed)
    raise JsonbError(f"jsonb: unsupported opaque field type {field_type}")


def _unpack_datetime(packed: int, date_only: bool = False) -> str:
    """my_time.h packed datetime: ((ymd << 17 | hms) << 24) + usec,
    ymd = (year*13 + month) << 5 | day, hms = h<<12 | m<<6 | s."""
    neg = packed < 0
    if neg:
        packed = -packed
    usec = packed % (1 << 24)
    ymdhms = packed >> 24
    ymd = ymdhms >> 17
    hms = ymdhms & ((1 << 17) - 1)
    day = ymd & 31
    ym = ymd >> 5
    year, month = divmod(ym, 13)
    second = hms & 63
    minute = (hms >> 6) & 63
    hour = hms >> 12
    sign = "-" if neg else ""
    if date_only:
        return f"{sign}{year:04d}-{month:02d}-{day:02d}"
    out = f"{sign}{year:04d}-{month:02d}-{day:02d} {hour:02d}:{minute:02d}:{second:02d}"
    if usec:
        out += f".{usec:06d}"
    return out


def _unpack_time(packed: int) -> str:
    """my_time.h packed TIME: (hms << 24) + usec where hms is the same
    bitfield layout as datetime — h<<12 | m<<6 | s — NOT total seconds."""
    neg = packed < 0
    if neg:
        packed = -packed
    usec = packed % (1 << 24)
    hms = packed >> 24
    h = hms >> 12
    m = (hms >> 6) & 63
    s = hms & 63
    out = f"{'-' if neg else ''}{h:02d}:{m:02d}:{s:02d}"
    if usec:
        out += f".{usec:06d}"
    return out


def _decode_scalar(type_byte: int, data: bytes, pos: int):
    """Decode a non-container scalar whose payload starts at ``pos``."""
    if type_byte == LITERAL:
        lit = data[pos]
        if lit == LITERAL_NULL:
            return None
        if lit == LITERAL_TRUE:
            return True
        if lit == LITERAL_FALSE:
            return False
        raise JsonbError(f"jsonb: bad literal byte {lit}")
    if type_byte == INT16:
        return struct.unpack_from("<h", data, pos)[0]
    if type_byte == UINT16:
        return struct.unpack_from("<H", data, pos)[0]
    if type_byte == INT32:
        return struct.unpack_from("<i", data, pos)[0]
    if type_byte == UINT32:
        return struct.unpack_from("<I", data, pos)[0]
    if type_byte == INT64:
        return struct.unpack_from("<q", data, pos)[0]
    if type_byte == UINT64:
        return struct.unpack_from("<Q", data, pos)[0]
    if type_byte == DOUBLE:
        return struct.unpack_from("<d", data, pos)[0]
    if type_byte == STRING:
        length, spos = _read_varlen(data, pos)
        raw = data[spos : spos + length]
        if len(raw) != length:
            raise JsonbError("jsonb: truncated string payload")
        return raw.decode("utf-8")
    if type_byte == OPAQUE:
        return _decode_opaque(data, pos)
    raise JsonbError(f"jsonb: unknown type byte 0x{type_byte:02x}")


def _decode_value(type_byte: int, data: bytes, pos: int):
    if type_byte in (SMALL_OBJECT, LARGE_OBJECT, SMALL_ARRAY, LARGE_ARRAY):
        return _decode_container(type_byte, data, pos)
    return _decode_scalar(type_byte, data, pos)


def _decode_container(type_byte: int, data: bytes, base: int):
    large = type_byte in (LARGE_OBJECT, LARGE_ARRAY)
    is_object = type_byte in (SMALL_OBJECT, LARGE_OBJECT)
    w = 4 if large else 2
    fmt = "<I" if large else "<H"

    def word(off: int) -> int:
        return struct.unpack_from(fmt, data, off)[0]

    count = word(base)
    size = word(base + w)
    if base + size > len(data):
        raise JsonbError("jsonb: container size exceeds payload")
    pos = base + 2 * w

    keys: list[str] = []
    if is_object:
        for i in range(count):
            koff = word(pos + i * (w + 2))
            klen = struct.unpack_from("<H", data, pos + i * (w + 2) + w)[0]
            raw = data[base + koff : base + koff + klen]
            if len(raw) != klen:
                raise JsonbError("jsonb: truncated object key")
            keys.append(raw.decode("utf-8"))
        pos += count * (w + 2)

    values = []
    inlinable = (LITERAL, INT16, UINT16) + ((INT32, UINT32) if large else ())
    for i in range(count):
        epos = pos + i * (1 + w)
        etype = data[epos]
        if etype in inlinable:
            # value lives directly in the offset field
            values.append(_decode_scalar(etype, data, epos + 1))
        else:
            voff = word(epos + 1)
            values.append(_decode_value(etype, data, base + voff))

    if is_object:
        return dict(zip(keys, values))
    return values


def decode_jsonb(blob: bytes):
    """Full jsonb column value (type byte + payload) → Python value.

    An empty blob is how the server stores SQL ``NULL`` vs JSON ``null``
    (literal): mirror that as Python ``None``.
    """
    if blob is None or len(blob) == 0:
        return None
    return _decode_value(blob[0], bytes(blob), 1)


# ------------------------------------------------------------- to text


def _escape(s: str) -> str:
    out = []
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def _render(v, out: list) -> None:
    if v is None:
        out.append("null")
    elif v is True:
        out.append("true")
    elif v is False:
        out.append("false")
    elif isinstance(v, str):
        out.append(f'"{_escape(v)}"')
    elif isinstance(v, Decimal):
        out.append(str(v))  # unquoted exact decimal, like JSON_EXTRACT
    elif isinstance(v, int):
        out.append(str(v))
    elif isinstance(v, float):
        # repr() is the shortest round-trip form, same as json.dumps
        out.append(repr(v))
    elif isinstance(v, dict):
        out.append("{")
        first = True
        for k, item in v.items():
            if not first:
                out.append(", ")
            first = False
            out.append(f'"{_escape(k)}": ')
            _render(item, out)
        out.append("}")
    elif isinstance(v, (list, tuple)):
        out.append("[")
        for i, item in enumerate(v):
            if i:
                out.append(", ")
            _render(item, out)
        out.append("]")
    else:
        raise JsonbError(f"jsonb: cannot render {type(v).__name__}")


def to_text(value) -> str:
    """Deterministic JSON text (MySQL's spacing: ', ' / ': ')."""
    out: list = []
    _render(value, out)
    return "".join(out)


def jsonb_to_text(blob: bytes):
    """Blob → JSON text, or None for the SQL-NULL empty blob."""
    v = decode_jsonb(blob)
    return None if blob is None or len(blob) == 0 else to_text(v)


# --------------------------------------------------------------- encode


def _write_varlen(length: int) -> bytes:
    out = bytearray()
    while True:
        b = length & 0x7F
        length >>= 7
        if length:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_scalar(v) -> tuple[int, bytes]:
    """Python scalar → (type_byte, payload)."""
    if v is None:
        return LITERAL, bytes([LITERAL_NULL])
    if v is True:
        return LITERAL, bytes([LITERAL_TRUE])
    if v is False:
        return LITERAL, bytes([LITERAL_FALSE])
    if isinstance(v, Decimal):
        sign, digits, exp = v.as_tuple()
        scale = max(0, -exp)
        text = format(v, "f")
        precision = len(text.replace("-", "").replace(".", "")) or 1
        payload = bytes([precision, scale]) + K.encode_decimal(text, precision, scale)
        return OPAQUE, bytes([_FT_DECIMAL]) + _write_varlen(len(payload)) + payload
    if isinstance(v, int):
        if -(1 << 15) <= v < (1 << 15):
            return INT16, struct.pack("<h", v)
        if -(1 << 31) <= v < (1 << 31):
            return INT32, struct.pack("<i", v)
        if -(1 << 63) <= v < (1 << 63):
            return INT64, struct.pack("<q", v)
        if (1 << 63) <= v < (1 << 64):
            return UINT64, struct.pack("<Q", v)
        raise JsonbError("jsonb: integer out of 64-bit range")
    if isinstance(v, float):
        return DOUBLE, struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return STRING, _write_varlen(len(raw)) + raw
    raise JsonbError(f"jsonb: cannot encode {type(v).__name__}")


def _mysql_key_order(keys: list[str]) -> list[int]:
    """MySQL stores object keys sorted by (byte length, bytes)."""
    enc = [k.encode("utf-8") for k in keys]
    return sorted(range(len(keys)), key=lambda i: (len(enc[i]), enc[i]))


def _encode_container(v, large: bool) -> tuple[int, bytes]:
    is_object = isinstance(v, dict)
    w = 4 if large else 2
    fmt = "<I" if large else "<H"
    inlinable = (LITERAL, INT16, UINT16) + ((INT32, UINT32) if large else ())

    if is_object:
        order = _mysql_key_order(list(v.keys()))
        keys = [list(v.keys())[i] for i in order]
        items = [list(v.values())[i] for i in order]
    else:
        keys = []
        items = list(v)

    count = len(items)
    encoded: list[tuple[int, bytes]] = [_encode_value_parts(it, large) for it in items]
    key_bytes = [k.encode("utf-8") for k in keys]

    header = 2 * w
    key_entries = count * (w + 2) if is_object else 0
    value_entries = count * (1 + w)
    pos = header + key_entries + value_entries

    key_offsets = []
    for kb in key_bytes:
        key_offsets.append(pos)
        pos += len(kb)

    value_offsets: list[int | None] = []
    for t, payload in encoded:
        if t in inlinable:
            value_offsets.append(None)
        else:
            value_offsets.append(pos)
            pos += len(payload)
    size = pos
    if not large and (size > 0xFFFF or count > 0xFFFF):
        return _encode_container(v, large=True)

    out = bytearray()
    out += struct.pack(fmt, count)
    out += struct.pack(fmt, size)
    for kb, koff in zip(key_bytes, key_offsets):
        out += struct.pack(fmt, koff)
        out += struct.pack("<H", len(kb))
    for (t, payload), voff in zip(encoded, value_offsets):
        out.append(t)
        if voff is None:
            out += payload.ljust(w, b"\x00")  # inlined value in offset field
        else:
            out += struct.pack(fmt, voff)
    for kb in key_bytes:
        out += kb
    for (t, payload), voff in zip(encoded, value_offsets):
        if voff is not None:
            out += payload
    tb = (
        (LARGE_OBJECT if large else SMALL_OBJECT)
        if is_object
        else (LARGE_ARRAY if large else SMALL_ARRAY)
    )
    return tb, bytes(out)


def _encode_value_parts(v, parent_large: bool) -> tuple[int, bytes]:
    if isinstance(v, (dict, list, tuple)):
        return _encode_container(v, large=False)
    return _encode_scalar(v)


def encode_jsonb(v) -> bytes:
    """Python value → full jsonb column blob (type byte + payload)."""
    t, payload = _encode_value_parts(v, parent_large=False)
    return bytes([t]) + payload
