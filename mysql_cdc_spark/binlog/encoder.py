"""Binlog fixture *encoder* — writes byte-exact binlog-format files.

The reference is decode-only; this encoder exists so our decode path can be
tested round-trip (FIXTURES.md §5: "our fixture encoder writes binlog-format
byte frames ... our decoder must reproduce the source rows exactly") and so
benchmarks replay realistic binary input instead of pre-decoded tables.

Layouts mirror the parse functions they feed:
- header: event_header.rs:32-42 (19 bytes, all little-endian)
- FDE: format_description_event.rs:28-76
- TABLE_MAP: table_map_event.rs:37-123 (+ optional TableMetadata TLV,
  table_metadata.rs:55-130)
- rows v1/v2: row_parser.rs:79-128, write/update/delete_rows_event.rs
- GTID/XID/QUERY/ROTATE: respective parse fns
- CRC32 checksum trailer: event_parser.rs:47-50
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import kernels as K
from .constants import (
    EVENT_HEADER_SIZE,
    MAGIC_NUMBER,
    ChecksumType,
    ColumnType,
    EventType,
    MetadataType,
)

SERVER_VERSION = "8.0.36-mysql-cdc-spark-fixture"
FDE_POST_HEADER_ENTRIES = 39


def encode_cell(value, column_type: int, metadata: int) -> bytes:
    """Inverse of reader.parse_cell for the types the engine round-trips."""
    C = ColumnType
    if column_type == C.TINY:
        return struct.pack("<B", value & 0xFF)
    if column_type == C.SHORT:
        return struct.pack("<H", value & 0xFFFF)
    if column_type == C.INT24:
        return (value & 0xFFFFFF).to_bytes(3, "little")
    if column_type == C.LONG:
        return struct.pack("<I", value & 0xFFFFFFFF)
    if column_type == C.LONGLONG:
        return struct.pack("<Q", value & 0xFFFFFFFFFFFFFFFF)
    if column_type == C.FLOAT:
        return struct.pack("<f", value)
    if column_type == C.DOUBLE:
        return struct.pack("<d", value)
    if column_type == C.NEWDECIMAL:
        precision = metadata & 0xFF
        scale = (metadata >> 8) & 0xFF
        return K.encode_decimal(value, precision, scale)
    if column_type in (C.STRING, C.VARCHAR, C.VAR_STRING):
        if column_type == C.STRING:
            # CHAR metadata is the packed (type, length) pair — resolve it
            # like the decoder does (actual_string_type.rs:6-26) so the
            # length-prefix width matches
            column_type, metadata = K.get_actual_string_type(column_type, metadata)
        # bytes pass through verbatim (fixtures encode non-utf8 charsets
        # by pre-encoding in the column's charset, like a real server)
        raw = value if isinstance(value, bytes) else value.encode("utf-8")
        if metadata < 256:
            if len(raw) > 255:
                raise ValueError("string too long for 1-byte length prefix")
            return bytes([len(raw)]) + raw
        return struct.pack("<H", len(raw)) + raw
    if column_type in (
        C.TINY_BLOB, C.MEDIUM_BLOB, C.LONG_BLOB, C.BLOB, C.GEOMETRY, C.JSON,
        C.VECTOR,
    ):
        return len(value).to_bytes(metadata, "little") + bytes(value)
    if column_type == C.YEAR:
        return bytes([value - 1900])
    if column_type == C.DATE:
        year, month, day = value
        packed = (year << 9) | (month << 5) | day
        return packed.to_bytes(3, "little")
    if column_type == C.DATETIME:
        year, month, day, hour, minute, second, _millis = value
        packed = ((((year * 100 + month) * 100 + day) * 100 + hour) * 100 + minute) * 100 + second
        return struct.pack("<Q", packed)
    if column_type == C.DATETIME2:
        year, month, day, hour, minute, second, millis = value
        packed = (
            (1 << 39)  # sign bit, always set (col_parser.rs:128)
            | ((year * 13 + month) << 22)
            | (day << 17)
            | (hour << 12)
            | (minute << 6)
            | second
        )
        return packed.to_bytes(5, "big") + _encode_fractional(millis * 1000, metadata)
    if column_type == C.TIMESTAMP2:
        epoch_millis = value
        seconds, millis = divmod(epoch_millis, 1000)
        return struct.pack(">I", seconds) + _encode_fractional(millis * 1000, metadata)
    if column_type == C.TIME:
        hour, minute, second, _millis = value
        packed = hour * 10000 + minute * 100 + second
        return packed.to_bytes(3, "little")
    if column_type == C.TIME2:
        hour, minute, second, millis = value
        packed = (1 << 23) | (hour << 12) | (minute << 6) | second
        return packed.to_bytes(3, "big") + _encode_fractional(millis * 1000, metadata)
    if column_type == C.ENUM or column_type == C.SET:
        return int(value).to_bytes(metadata, "little")
    raise ValueError(f"encode_cell: unsupported column type {column_type}")


def _encode_fractional(micros: int, fsp: int) -> bytes:
    """Inverse of parse_fractional_part (col_parser.rs:160-168)."""
    length = (fsp + 1) // 2
    if length == 0:
        return b""
    fraction = micros // (100 ** (3 - length))
    return fraction.to_bytes(length, "big")


class BinlogWriter:
    """Accumulates framed events for a single binlog file."""

    def __init__(self, filename: str, checksum: int = ChecksumType.CRC32, server_id: int = 1):
        self.filename = filename
        self.checksum = checksum
        self.server_id = server_id
        self.chunks: list[bytes] = [MAGIC_NUMBER]
        self.pos = len(MAGIC_NUMBER)
        self._write_format_description()

    # -- framing ----------------------------------------------------------

    def _append_event(
        self, event_type: int, payload: bytes, timestamp: int = 0, server_id: int | None = None
    ) -> None:
        checksummed = self.checksum == ChecksumType.CRC32
        event_length = EVENT_HEADER_SIZE + len(payload) + (4 if checksummed else 0)
        next_pos = self.pos + event_length
        header = struct.pack(
            "<IBIIIH",
            timestamp,
            event_type,
            server_id if server_id is not None else self.server_id,
            event_length,
            next_pos,
            0,
        )
        frame = header + payload
        if checksummed:
            frame += struct.pack("<I", zlib.crc32(frame))
        self.chunks.append(frame)
        self.pos = next_pos

    def _write_format_description(self) -> None:
        n = FDE_POST_HEADER_ENTRIES
        post_header = bytearray(n)
        post_header[EventType.FORMAT_DESCRIPTION - 1] = 57 + n  # self-length marker
        payload = (
            struct.pack("<H", 4)
            + SERVER_VERSION.encode("utf-8").ljust(50, b"\x00")
            + struct.pack("<I", 0)  # created timestamp (redundant)
            + bytes([EVENT_HEADER_SIZE])
            + bytes(post_header)
        )
        if self.checksum == ChecksumType.CRC32:
            payload += bytes([ChecksumType.CRC32])
        self._append_event(EventType.FORMAT_DESCRIPTION, payload)

    # -- events -----------------------------------------------------------

    def write_prev_gtids(self, gtid_set) -> None:
        """prev_gtids_event.rs:17-39 layout (interval end stored exclusive)."""
        out = struct.pack("<Q", len(gtid_set.uuid_sets))
        for uuid in sorted(gtid_set.uuid_sets):
            us = gtid_set.uuid_sets[uuid]
            if getattr(us, "tag", ""):
                raise ValueError(
                    "PREVIOUS_GTIDS binary form is untagged-only; MySQL 8.4 "
                    "tagged sets use a format this fixture writer does not "
                    "emit"
                )
            out += us.source_id.data
            out += struct.pack("<Q", len(us.intervals))
            for iv in us.intervals:
                out += struct.pack("<QQ", iv.start, iv.end + 1)
        self._append_event(EventType.MYSQL_PREVIOUS_GTIDS, out)

    def write_mysql_gtid(self, source_uuid: str, txid: int, timestamp: int = 0) -> None:
        from ..gtid import Uuid

        payload = bytes([1]) + Uuid.parse(source_uuid).data + struct.pack("<Q", txid)
        self._append_event(EventType.MYSQL_GTID, payload, timestamp=timestamp)

    def write_mariadb_gtid(self, domain_id: int, sequence: int, timestamp: int = 0) -> None:
        payload = struct.pack("<QIB", sequence, domain_id, 0)
        self._append_event(EventType.MARIADB_GTID, payload, timestamp=timestamp)

    def write_query(self, sql: str, database: str = "", timestamp: int = 0) -> None:
        db = database.encode("utf-8")
        payload = (
            struct.pack("<II", 1, 0)
            + bytes([len(db)])
            + struct.pack("<HH", 0, 0)
            + db
            + b"\x00"
            + sql.encode("utf-8")
        )
        self._append_event(EventType.QUERY, payload, timestamp=timestamp)

    def write_table_map(
        self,
        table_id: int,
        database: str,
        table: str,
        column_types: list[int],
        column_metadata: list[int],
        nullability: list[bool],
        column_names: list[str] | None = None,
        simple_primary_keys: list[int] | None = None,
        signedness: list[bool] | None = None,
        enum_string_values: list[list[str]] | None = None,
        set_string_values: list[list[str]] | None = None,
        extra_metadata: list[tuple[int, bytes]] | None = None,
        default_charset: int | tuple[int, dict[int, int]] | None = None,
        column_charsets: list[int] | None = None,
        timestamp: int = 0,
    ) -> None:
        db = database.encode("utf-8")
        tbl = table.encode("utf-8")
        out = table_id.to_bytes(6, "little") + b"\x01\x00"  # 2 reserved/flags bytes
        out += bytes([len(db)]) + db + b"\x00"
        out += bytes([len(tbl)]) + tbl + b"\x00"
        out += K.write_len_enc_num(len(column_types))
        out += bytes(column_types)

        meta = bytearray()
        for ct, md in zip(column_types, column_metadata):
            if ct in (
                ColumnType.GEOMETRY,
                ColumnType.JSON,
                ColumnType.VECTOR,
                ColumnType.TINY_BLOB,
                ColumnType.MEDIUM_BLOB,
                ColumnType.LONG_BLOB,
                ColumnType.BLOB,
                ColumnType.FLOAT,
                ColumnType.DOUBLE,
                ColumnType.TIMESTAMP2,
                ColumnType.DATETIME2,
                ColumnType.TIME2,
            ):
                meta.append(md)
            elif ct in (
                ColumnType.BIT,
                ColumnType.VARCHAR,
                ColumnType.VAR_STRING,
                ColumnType.NEWDECIMAL,
            ):
                meta += struct.pack("<H", md)
            elif ct in (ColumnType.ENUM, ColumnType.SET, ColumnType.STRING):
                meta += struct.pack(">H", md)
        out += K.write_len_enc_num(len(meta)) + bytes(meta)
        out += K.pack_bitmap_little_endian(nullability)

        # optional TableMetadata TLV sections (column names drive schema
        # evolution; table_metadata.rs:23, SURVEY.md §4 item 3)
        if signedness is not None:
            # one bit per numeric column, bit set = UNSIGNED, stored as the
            # 'reverted' big-endian bitmap (table_metadata.rs:137-141)
            section = K.pack_bitmap_big_endian(signedness)
            out += (
                bytes([MetadataType.SIGNEDNESS])
                + K.write_len_enc_num(len(section))
                + section
            )
        if column_names is not None:
            section = b"".join(
                K.write_len_enc_num(len(n.encode())) + n.encode() for n in column_names
            )
            out += bytes([MetadataType.COLUMN_NAME]) + K.write_len_enc_num(len(section)) + section
        def type_values_section(tag: int, per_column: list[list[str]]) -> bytes:
            # table_metadata.rs parse_type_values inverse: per ENUM/SET
            # column a lenc count + that many lenc strings
            body = b""
            for values in per_column:
                body += K.write_len_enc_num(len(values))
                for v in values:
                    raw = v.encode("utf-8")
                    body += K.write_len_enc_num(len(raw)) + raw
            return bytes([tag]) + K.write_len_enc_num(len(body)) + body

        if set_string_values is not None:
            out += type_values_section(MetadataType.SET_STR_VALUE, set_string_values)
        if enum_string_values is not None:
            out += type_values_section(MetadataType.ENUM_STR_VALUE, enum_string_values)
        if simple_primary_keys is not None:
            section = b"".join(K.write_len_enc_num(i) for i in simple_primary_keys)
            out += (
                bytes([MetadataType.SIMPLE_PRIMARY_KEY])
                + K.write_len_enc_num(len(section))
                + section
            )
        if default_charset is not None:
            # DEFAULT_CHARSET TLV: lenc default collation + (character-
            # column ordinal, collation) override pairs (WL#4618;
            # table_metadata.rs parse_default_charser inverse)
            if isinstance(default_charset, tuple):
                dc, overrides = default_charset
            else:
                dc, overrides = default_charset, {}
            section = K.write_len_enc_num(dc)
            for k in sorted(overrides):
                section += K.write_len_enc_num(k) + K.write_len_enc_num(
                    overrides[k]
                )
            out += (
                bytes([MetadataType.DEFAULT_CHARSET])
                + K.write_len_enc_num(len(section))
                + section
            )
        if column_charsets is not None:
            # COLUMN_CHARSET TLV: one lenc collation per character column
            section = b"".join(K.write_len_enc_num(c) for c in column_charsets)
            out += (
                bytes([MetadataType.COLUMN_CHARSET])
                + K.write_len_enc_num(len(section))
                + section
            )
        if extra_metadata:
            for tag, section in extra_metadata:
                out += bytes([tag]) + K.write_len_enc_num(len(section)) + section
        self._append_event(EventType.TABLE_MAP, out, timestamp=timestamp)

    def _encode_rows(self, rows, column_types, column_metadata, present) -> bytes:
        out = bytearray()
        present_idx = [i for i, p in enumerate(present) if p]
        for row in rows:
            null_bits = [row[i] is None for i in present_idx]
            out += K.pack_bitmap_little_endian(null_bits)
            for i in present_idx:
                if row[i] is None:
                    continue
                out += encode_cell(row[i], column_types[i], column_metadata[i])
        return bytes(out)

    def write_rows(
        self,
        table_id: int,
        column_types: list[int],
        column_metadata: list[int],
        rows: list[list],
        event_type: int = EventType.MYSQL_WRITE_ROWS_V2,
        columns_present: list[bool] | None = None,
        timestamp: int = 0,
        partition_id: int | None = None,
    ) -> None:
        """WRITE_ROWS / DELETE_ROWS (same layout, different type code).
        ``partition_id`` emits the WL#12168 PART extra-row-info TLV the
        server writes for partitioned tables (MySQL 8.0.16+)."""
        n = len(column_types)
        present = columns_present or [True] * n
        out = table_id.to_bytes(6, "little") + struct.pack("<H", 0)
        if event_type in (EventType.MYSQL_WRITE_ROWS_V2, EventType.MYSQL_DELETE_ROWS_V2):
            extra = b""
            if partition_id is not None:
                extra = bytes([1]) + struct.pack("<H", partition_id)  # PART TLV
            out += struct.pack("<H", 2 + len(extra)) + extra
        out += K.write_len_enc_num(n)
        out += K.pack_bitmap_little_endian(present)
        out += self._encode_rows(rows, column_types, column_metadata, present)
        self._append_event(event_type, out, timestamp=timestamp)

    def write_update_rows(
        self,
        table_id: int,
        column_types: list[int],
        column_metadata: list[int],
        row_pairs: list[tuple[list, list]],
        before_present: list[bool] | None = None,
        after_present: list[bool] | None = None,
        timestamp: int = 0,
        partition_id: int | None = None,
        source_partition_id: int | None = None,
    ) -> None:
        """UPDATE_ROWS with independent before/after presence bitmaps —
        full images by default; pass partial bitmaps for the
        binlog_row_image=MINIMAL shape (before: PK cols, after: PK +
        changed cols; row_parser.rs:108-111). ``partition_id`` /
        ``source_partition_id`` emit the WL#12168 PART extra-row-info TLV
        (a row migrating between partitions of a partitioned table)."""
        n = len(column_types)
        bp = before_present or [True] * n
        ap = after_present or [True] * n
        out = table_id.to_bytes(6, "little") + struct.pack("<H", 0)
        extra = b""
        if partition_id is not None:
            # PART TLV on UPDATE carries (partition_id, source_partition_id)
            extra = bytes([1]) + struct.pack(
                "<HH", partition_id,
                partition_id if source_partition_id is None else source_partition_id,
            )
        out += struct.pack("<H", 2 + len(extra)) + extra
        out += K.write_len_enc_num(n)
        out += K.pack_bitmap_little_endian(bp)  # before image
        out += K.pack_bitmap_little_endian(ap)  # after image
        for before, after in row_pairs:
            out += self._encode_rows([before], column_types, column_metadata, bp)
            out += self._encode_rows([after], column_types, column_metadata, ap)
        self._append_event(EventType.MYSQL_UPDATE_ROWS_V2, out, timestamp=timestamp)

    def write_partial_update_rows(
        self,
        table_id: int,
        column_types: list[int],
        column_metadata: list[int],
        row_pairs: list[tuple[list, list]],
        before_present: list[bool] | None = None,
        after_present: list[bool] | None = None,
        timestamp: int = 0,
    ) -> None:
        """PARTIAL_UPDATE_ROWS (type 39; binlog_row_value_options=
        PARTIAL_JSON). After-image JSON cells passed as
        ``partial.PartialJson`` markers are written as diff vectors;
        everything else is written full. Rows with no marker get
        ``value_options=0`` (no partial_bits), exercising both row shapes.
        Layout per WL#2955 / sql/json_diff.cc — binlog/partial.py."""
        from .partial import (
            PARTIAL_JSON_UPDATES,
            PartialJson,
            json_ordinals,
            write_diff_vector,
        )

        n = len(column_types)
        bp = before_present or [True] * n
        ap = after_present or [True] * n
        jord = json_ordinals(column_types)
        pb_len = (len(jord) + 7) // 8
        out = table_id.to_bytes(6, "little") + struct.pack("<H", 0)
        out += struct.pack("<H", 2)
        out += K.write_len_enc_num(n)
        out += K.pack_bitmap_little_endian(bp)
        out += K.pack_bitmap_little_endian(ap)
        ap_idx = [i for i, p in enumerate(ap) if p]
        for before, after in row_pairs:
            out += self._encode_rows([before], column_types, column_metadata, bp)
            partial_cols = [i for i in ap_idx if isinstance(after[i], PartialJson)]
            out += K.write_len_enc_num(PARTIAL_JSON_UPDATES if partial_cols else 0)
            if partial_cols:
                bits = bytearray(pb_len)
                for i in partial_cols:
                    o = jord[i]  # KeyError = marker on a non-JSON column
                    bits[o >> 3] |= 1 << (o & 7)
                out += bytes(bits)
            out += K.pack_bitmap_little_endian([after[i] is None for i in ap_idx])
            for i in ap_idx:
                v = after[i]
                if v is None:
                    continue
                if isinstance(v, PartialJson):
                    out += write_diff_vector(v.diffs)
                else:
                    out += encode_cell(v, column_types[i], column_metadata[i])
        self._append_event(
            EventType.MYSQL_PARTIAL_UPDATE_ROWS, out, timestamp=timestamp
        )

    def write_intvar(self, intvar_type: int, value: int, timestamp: int = 0) -> None:
        """intvar_event.rs layout: type u8 + value u64 LE."""
        self._append_event(
            EventType.INTVAR, struct.pack("<BQ", intvar_type, value), timestamp=timestamp
        )

    def write_mariadb_gtid_list(self, gtids, timestamp: int = 0) -> None:
        """gtid_list_event.rs layout: u32 count + (domain, server, seq)
        triples; ``gtids`` is an iterable of MariaGtid or (d, s, seq)."""
        out = struct.pack("<I", len(gtids))
        for g in gtids:
            d, s, q = (
                (g.domain_id, g.server_id, g.sequence)
                if hasattr(g, "domain_id")
                else g
            )
            out += struct.pack("<IIQ", d, s, q)
        self._append_event(EventType.MARIADB_GTID_LIST, out, timestamp=timestamp)

    def write_xid(self, xid: int, timestamp: int = 0) -> None:
        self._append_event(EventType.XID, struct.pack("<Q", xid), timestamp=timestamp)

    def write_xa_prepare(
        self,
        gtrid: bytes,
        bqual: bytes = b"",
        format_id: int = 1,
        one_phase: bool = False,
        timestamp: int = 0,
    ) -> None:
        """XA_PREPARE_LOG_EVENT (type 38): one_phase u8, formatID i32,
        gtrid_length u32, bqual_length u32, gtrid+bqual (binlog/xa.py)."""
        body = (
            struct.pack("<BiII", int(one_phase), format_id, len(gtrid), len(bqual))
            + gtrid
            + bqual
        )
        self._append_event(EventType.MYSQL_XA_PREPARE, body, timestamp=timestamp)

    def write_rows_query(self, sql: str, timestamp: int = 0) -> None:
        """ROWS_QUERY_EVENT (type 29, binlog_rows_query_log_events=ON):
        1-byte length prefix (capped at 255 like the server's) + query
        text to event end — readers skip the byte and read to the end
        (rows_query_event.rs / binlog/reader.py)."""
        q = sql.encode("utf-8")
        self._append_event(
            EventType.MYSQL_ROWS_QUERY,
            bytes([min(len(q), 255)]) + q,
            timestamp=timestamp,
        )

    def write_annotate_rows(self, sql: str, timestamp: int = 0) -> None:
        """MariaDB ANNOTATE_ROWS_EVENT (type 160, binlog_annotate_row_events
        =ON): the payload is the bare statement text."""
        self._append_event(
            EventType.MARIADB_ANNOTATE_ROWS, sql.encode("utf-8"),
            timestamp=timestamp,
        )

    def write_start_encryption(
        self, key_version: int = 1, nonce: bytes = b"\x00" * 12,
        timestamp: int = 0,
    ) -> None:
        """MariaDB START_ENCRYPTION (type 164, encrypt_binlog=ON): u8
        crypto scheme (1 = AES_CBC), u32 LE key version, 12-byte nonce.
        Events written AFTER this marker would be ciphertext on a real
        server — the fixture writer emits them in plaintext purely so
        tests can pin that decode refuses at the marker itself."""
        self._append_event(
            EventType.MARIADB_START_ENCRYPTION,
            struct.pack("<BI", 1, key_version) + nonce[:12].ljust(12, b"\x00"),
            timestamp=timestamp,
        )

    def write_incident(
        self, incident_number: int = 1, message: str = "", timestamp: int = 0
    ) -> None:
        """INCIDENT_EVENT (type 26) — libbinlogevents Incident_event: u16 LE
        incident number (1 = LOST_EVENTS) + 1-byte message length + message
        (binlog/reader.py parse_incident)."""
        msg = message.encode("utf-8")
        if len(msg) > 255:
            raise ValueError("incident message exceeds 255 bytes")
        body = struct.pack("<HB", incident_number, len(msg)) + msg
        self._append_event(EventType.INCIDENT, body, timestamp=timestamp)

    def write_rotate(self, next_filename: str, position: int = 4) -> None:
        payload = struct.pack("<Q", position) + next_filename.encode("utf-8")
        self._append_event(EventType.ROTATE, payload)

    def getvalue(self) -> bytes:
        return b"".join(self.chunks)

    @staticmethod
    def make_fde_frame(checksum: int = ChecksumType.CRC32) -> bytes:
        """Standalone FORMAT_DESCRIPTION frame declaring ``checksum`` —
        prepended by the event-frame source when a relay stream group
        carries no FDE of its own (binlog/frames.py)."""
        w = BinlogWriter("synthetic", checksum=checksum)
        return w.getvalue()[len(MAGIC_NUMBER):]

    def save(self, path: str) -> str:
        data = self.getvalue()
        with open(path, "wb") as f:
            f.write(data)
        return path
