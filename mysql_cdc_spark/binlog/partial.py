"""MySQL 8 partial JSON row images (``binlog_row_value_options=PARTIAL_JSON``).

Beyond-reference capability: with ``binlog_row_value_options=PARTIAL_JSON``
a MySQL 8.0 server logs UPDATEs that modify JSON columns via
``JSON_SET``/``JSON_REPLACE``/``JSON_REMOVE`` as PARTIAL_UPDATE_ROWS_EVENT
(type 39) frames whose after-images carry *JSON diff vectors* instead of
full documents — often orders of magnitude smaller for large documents.
The reference library has no type-39 support at all (its enum stops at
the 17 classic kinds; src/events/event_type.rs), so such streams are
unreadable by it.

Formats re-implemented here from the published sources only:

- WL#2955 ("Binlog: option to log partial JSON updates") — row layout:
  each after-image begins with ``value_options`` (len-enc int); when its
  PARTIAL_JSON_UPDATES bit (1) is set, a ``partial_bits`` bitmap follows
  with one bit per JSON column *of the table* (present-in-image or not),
  then the usual null bitmap and cell values.
- ``sql/json_diff.cc`` (``Json_diff_vector::read_binary``/``write_binary``)
  — a partial JSON cell is a 4-byte LE total length followed by a
  sequence of diffs: operation byte (0=REPLACE, 1=INSERT, 2=REMOVE),
  len-enc path length + path text, and for non-REMOVE a len-enc value
  length + value in standard JSONB format (type byte + payload).
- ``sql/rpl_record.cc`` (``unpack_row``) — field order within the image.

Strategy (same shape as binlog/compressed.py): rewrite each type-39 frame
into its plain MYSQL_UPDATE_ROWS_V2 twin by applying the diff vector to
the before-image document and re-encoding the full JSONB value, so every
existing decode path — scalar and vectorized — runs unchanged on the
rewritten bytes. This requires the preceding TABLE_MAP (column types and
blob length sizes), which the segment walk tracks with the same
payload-memoized parse the readers use.

Row-image requirement: the expansion applies diffs against the
*before-image* value, which carries the full document under
``binlog_row_image=FULL`` (the server default). Under MINIMAL the before
image may omit the JSON column — the server applies diffs against the
target table row instead, which a decode-time pass cannot see — so that
combination raises :class:`PartialJsonError` loudly rather than guessing.

Applied values are canonicalized through the engine's own jsonb codec
(binlog/jsonb.py), so opaque temporal scalars inside diffs re-encode as
their text forms; the rendered JSON text — the engine's change-row
representation and the replay invariant — is identical either way.

Scale note: only type-39 frames pay the Python rewrite (zero frames in
the common case costs one numpy type-byte scan, the same gate the
compressed lane uses); a partial frame's cost is dominated by one
jsonb decode + encode per updated JSON cell, which replaces the decode
the plain-twin path would have done anyway.
"""

from __future__ import annotations

import struct

from . import kernels as K
from .constants import ColumnType, EventType
from .jsonb import decode_jsonb, encode_jsonb

# value_options bit (WL#2955; the only defined bit)
PARTIAL_JSON_UPDATES = 1

# enum_json_diff_operation, sql/json_diff.h
DIFF_REPLACE = 0
DIFF_INSERT = 1
DIFF_REMOVE = 2


class PartialJsonError(ValueError):
    """Malformed or inapplicable partial-JSON row image."""


# --------------------------------------------------------------- JSON path


def parse_json_path(path: str) -> list[tuple[str, object]]:
    """MySQL JSON path → legs ``[('member', name) | ('element', index)]``.

    Server-generated diff paths contain only concrete member/element legs
    (``$.a."b c"[3]``); wildcards, ranges and ``last`` never appear in a
    Json_diff_vector and are rejected.
    """
    if not path or path[0] != "$":
        raise PartialJsonError(f"JSON path must start with '$': {path!r}")
    legs: list[tuple[str, object]] = []
    i, n = 1, len(path)
    while i < n:
        c = path[i]
        if c == ".":
            i += 1
            if i < n and path[i] == '"':
                i += 1
                out = []
                while i < n and path[i] != '"':
                    ch = path[i]
                    if ch == "\\":
                        if i + 1 >= n:
                            raise PartialJsonError(f"bad escape in path {path!r}")
                        nxt = path[i + 1]
                        out.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                        i += 2
                    else:
                        out.append(ch)
                        i += 1
                if i >= n:
                    raise PartialJsonError(f"unterminated quoted member in {path!r}")
                i += 1  # closing quote
                legs.append(("member", "".join(out)))
            else:
                start = i
                while i < n and (path[i].isalnum() or path[i] in "_$"):
                    i += 1
                if i == start:
                    raise PartialJsonError(f"empty member name in path {path!r}")
                legs.append(("member", path[start:i]))
        elif c == "[":
            j = path.find("]", i)
            if j < 0:
                raise PartialJsonError(f"unterminated [index] in path {path!r}")
            tok = path[i + 1 : j].strip()
            if not tok.isdigit():
                raise PartialJsonError(
                    f"only concrete array indexes appear in diff paths: {path!r}"
                )
            legs.append(("element", int(tok)))
            i = j + 1
        else:
            raise PartialJsonError(f"unexpected {c!r} at offset {i} in path {path!r}")
    return legs


def _navigate(doc, legs: list, path: str):
    """Walk ``legs`` from ``doc``; raises when a leg doesn't exist."""
    cur = doc
    for kind, key in legs:
        if kind == "member":
            if not isinstance(cur, dict) or key not in cur:
                raise PartialJsonError(f"path {path!r} does not exist in document")
            cur = cur[key]
        else:
            if not isinstance(cur, list) or not 0 <= key < len(cur):
                raise PartialJsonError(f"path {path!r} does not exist in document")
            cur = cur[key]
    return cur


def apply_json_diffs(doc, diffs: list[tuple[int, str, object]]):
    """Apply a decoded diff vector to a Python JSON value; returns the new
    document. Semantics follow ``sql/json_diff.cc apply_json_diff``:
    REPLACE requires the path to exist; INSERT adds a new object member
    (must not exist) or inserts an array element (index past the end
    appends, as JSON_ARRAY_INSERT does); REMOVE deletes an existing leg.
    """
    for op, path, value in diffs:
        legs = parse_json_path(path)
        if not legs:
            if op != DIFF_REPLACE:
                raise PartialJsonError(f"op {op} on root path is not applicable")
            doc = value
            continue
        parent = _navigate(doc, legs[:-1], path)
        kind, key = legs[-1]
        if op == DIFF_REPLACE:
            if kind == "member":
                if not isinstance(parent, dict) or key not in parent:
                    raise PartialJsonError(f"REPLACE path {path!r} does not exist")
                parent[key] = value
            else:
                if not isinstance(parent, list) or not 0 <= key < len(parent):
                    raise PartialJsonError(f"REPLACE path {path!r} does not exist")
                parent[key] = value
        elif op == DIFF_INSERT:
            if kind == "member":
                if not isinstance(parent, dict):
                    raise PartialJsonError(f"INSERT parent of {path!r} is not an object")
                if key in parent:
                    raise PartialJsonError(f"INSERT path {path!r} already exists")
                parent[key] = value
            else:
                if not isinstance(parent, list):
                    raise PartialJsonError(f"INSERT parent of {path!r} is not an array")
                parent.insert(key, value)  # index >= len appends
        elif op == DIFF_REMOVE:
            if kind == "member":
                if not isinstance(parent, dict) or key not in parent:
                    raise PartialJsonError(f"REMOVE path {path!r} does not exist")
                del parent[key]
            else:
                if not isinstance(parent, list) or not 0 <= key < len(parent):
                    raise PartialJsonError(f"REMOVE path {path!r} does not exist")
                parent.pop(key)
        else:
            raise PartialJsonError(f"unknown json diff operation {op}")
    return doc


# ------------------------------------------------------------- wire format


def read_diff_vector(buf: bytes, off: int, end: int) -> list[tuple[int, str, object]]:
    """Diff sequence bytes ``buf[off:end]`` → ``[(op, path, value)]`` with
    values decoded from JSONB (``None`` for REMOVE). Layout per
    ``Json_diff_vector::read_binary`` (the 4-byte total length has already
    been consumed by the caller)."""
    if end > len(buf):
        raise PartialJsonError("diff vector overruns the row image")
    diffs: list[tuple[int, str, object]] = []
    p = off
    while p < end:
        op = buf[p]
        p += 1
        if op > DIFF_REMOVE:
            raise PartialJsonError(f"unknown json diff operation byte {op}")
        plen, p = K.read_len_enc_num(buf, p)
        if p + plen > end:
            raise PartialJsonError("diff path overruns the diff vector")
        path = bytes(buf[p : p + plen]).decode("utf-8")
        p += plen
        if op == DIFF_REMOVE:
            diffs.append((op, path, None))
            continue
        vlen, p = K.read_len_enc_num(buf, p)
        if p + vlen > end:
            raise PartialJsonError("diff value overruns the diff vector")
        diffs.append((op, path, decode_jsonb(buf[p : p + vlen])))
        p += vlen
    if p != end:
        raise PartialJsonError("diff vector has trailing garbage")
    return diffs


def write_diff_vector(diffs: list[tuple[int, str, object]]) -> bytes:
    """Fixture-side inverse of :func:`read_diff_vector`, *including* the
    4-byte LE total length prefix (``Json_diff_vector::write_binary``)."""
    body = bytearray()
    for op, path, value in diffs:
        if op > DIFF_REMOVE:
            raise PartialJsonError(f"unknown json diff operation {op}")
        body.append(op)
        p = path.encode("utf-8")
        body += K.write_len_enc_num(len(p)) + p
        if op != DIFF_REMOVE:
            blob = encode_jsonb(value)
            body += K.write_len_enc_num(len(blob)) + blob
    return struct.pack("<I", len(body)) + bytes(body)


class PartialJson:
    """Encoder marker: an after-image JSON cell written in diff format.

    ``diffs`` is ``[(op, path, value)]`` with Python values (REMOVE takes
    ``None``). Pass as the cell value to
    ``BinlogWriter.write_partial_update_rows``.
    """

    __slots__ = ("diffs",)

    def __init__(self, diffs: list[tuple[int, str, object]]):
        self.diffs = diffs


# ----------------------------------------------------------- frame rewrite


def json_ordinals(column_types: list[int]) -> dict[int, int]:
    """column index → ordinal among the table's JSON columns (the
    ``partial_bits`` bit index; WL#2955 counts every JSON column of the
    table, in-image or not)."""
    out: dict[int, int] = {}
    for i, ct in enumerate(column_types):
        if ct == ColumnType.JSON:
            out[i] = len(out)
    return out


def expand_partial_body(payload: bytes, table_map: dict[int, dict]) -> bytes:
    """One PARTIAL_UPDATE_ROWS body (header/checksum already stripped) →
    the equivalent plain MYSQL_UPDATE_ROWS_V2 body with every partial JSON
    cell replaced by the full post-image document."""
    from .reader import TABLE_MAP_NOT_FOUND, parse_cell

    table_id = int.from_bytes(payload[0:6], "little")
    off = 8  # table_id(6) + flags(2)
    extra = struct.unpack_from("<H", payload, off)[0]
    off += extra  # extra length includes its own two bytes
    ncols, off = K.read_len_enc_num(payload, off)
    before_present, off = K.read_bitmap_little_endian(payload, off, ncols)
    after_present, off = K.read_bitmap_little_endian(payload, off, ncols)
    table = table_map.get(table_id)
    if table is None:
        raise ValueError(TABLE_MAP_NOT_FOUND)
    column_types = table["column_types"]
    column_metadata = table["column_metadata"]
    jord = json_ordinals(column_types)
    pb_len = (len(jord) + 7) // 8
    cells_before = int(sum(before_present))
    cells_after = int(sum(after_present))

    out = bytearray(payload[: off])  # head + presence bitmaps are identical
    n = len(payload)
    while off < n:
        # ---- before image: copied verbatim; capture JSON blobs for diffs
        b_start = off
        null_bitmap, off = K.read_bitmap_little_endian(payload, off, cells_before)
        before_json: dict[int, bytes] = {}
        skipped = 0
        for i in range(len(column_types)):
            if not before_present[i]:
                skipped += 1
                continue
            if null_bitmap[i - skipped]:
                continue
            ct, md = column_types[i], column_metadata[i]
            if ct == ColumnType.STRING:
                ct, md = K.get_actual_string_type(ct, md)
            value, off = parse_cell(payload, off, ct, md)
            if i in jord:
                before_json[i] = value  # parse_blob returned the raw jsonb
        out += payload[b_start:off]

        # ---- after image: value_options [+ partial_bits] are dropped,
        # partial cells are expanded, everything else copies verbatim
        value_options, off = K.read_len_enc_num(payload, off)
        partial_bits = b"\x00" * pb_len
        if value_options & PARTIAL_JSON_UPDATES:
            partial_bits = payload[off : off + pb_len]
            off += pb_len
        null_bitmap, off = K.read_bitmap_little_endian(payload, off, cells_after)
        out += payload[off - ((cells_after + 7) // 8) : off]  # null bitmap
        skipped = 0
        for i in range(len(column_types)):
            if not after_present[i]:
                skipped += 1
                continue
            if null_bitmap[i - skipped]:
                continue
            ct, md = column_types[i], column_metadata[i]
            if ct == ColumnType.STRING:
                ct, md = K.get_actual_string_type(ct, md)
            ordv = jord.get(i)
            if ordv is not None and partial_bits[ordv >> 3] >> (ordv & 7) & 1:
                total = struct.unpack_from("<I", payload, off)[0]
                off += 4
                diffs = read_diff_vector(payload, off, off + total)
                off += total
                blob = before_json.get(i)
                if blob is None:
                    raise PartialJsonError(
                        "partial JSON cell without a full before-image value "
                        "(binlog_row_image=FULL is required for decode-time "
                        "expansion; see module doc)"
                    )
                doc = apply_json_diffs(decode_jsonb(blob), diffs)
                new_blob = encode_jsonb(doc)
                out += len(new_blob).to_bytes(md, "little") + new_blob
            else:
                c_start = off
                _, off = parse_cell(payload, off, ct, md)
                out += payload[c_start:off]
    return bytes(out)
