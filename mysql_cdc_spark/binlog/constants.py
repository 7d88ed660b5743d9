"""Binlog wire-format constants.

Mirrors the reference's enums:
- event type codes: /root/reference/src/events/event_type.rs
- column type codes: /root/reference/src/constants/column_type.rs:7-100
- checksum types: /root/reference/src/constants/checksum_type.rs:4-11
- sizes/magic: /root/reference/src/constants/mod.rs:16-18,
  /root/reference/src/binlog_reader.rs:10
"""

MAGIC_NUMBER = bytes([0xFE, 0x62, 0x69, 0x6E])
EVENT_HEADER_SIZE = 19
FIRST_EVENT_POSITION = 4


class EventType:
    UNKNOWN = 0
    QUERY = 2
    STOP = 3
    ROTATE = 4
    INTVAR = 5
    RAND = 13
    USER_VAR = 14
    FORMAT_DESCRIPTION = 15
    XID = 16
    TABLE_MAP = 19
    WRITE_ROWS_V1 = 23
    UPDATE_ROWS_V1 = 24
    DELETE_ROWS_V1 = 25
    # Server-side "an incident occurred that may have corrupted or lost
    # events" marker — LOST_EVENTS (beyond-reference: the reference's
    # event_type.rs skips code 26 entirely, silently dropping the signal).
    # A replica stops with ER_REPLICA_INCIDENT here; we raise the same way
    # (libbinlogevents Incident_event, public format docs).
    INCIDENT = 26
    HEARTBEAT = 27
    MYSQL_ROWS_QUERY = 29
    MYSQL_WRITE_ROWS_V2 = 30
    MYSQL_UPDATE_ROWS_V2 = 31
    MYSQL_DELETE_ROWS_V2 = 32
    MYSQL_GTID = 33
    # MySQL 5.6+ "skip me if you don't understand me" marker (beyond-
    # reference: event_type.rs skips code 34) — carries no body a replica
    # must act on; surfaced typed so pipelines can count/observe them
    IGNORABLE = 34
    MYSQL_PREVIOUS_GTIDS = 35
    # Group Replication control events (beyond-reference: absent from
    # event_type.rs). They appear in the binlog of a GR member; a CDC
    # tail must recognize and pass over them — neither carries row data.
    # Body layouts (certification info / write sets) are GR-internal, so
    # they dispatch typed with the raw payload attached, not parsed.
    MYSQL_TRANSACTION_CONTEXT = 36
    MYSQL_VIEW_CHANGE = 37
    MYSQL_XA_PREPARE = 38
    # MySQL 8.0 binlog_row_value_options=PARTIAL_JSON update frames
    # (beyond-reference): after-images carry JSON diff vectors instead of
    # full documents — WL#2955, sql/json_diff.cc (binlog/partial.py)
    MYSQL_PARTIAL_UPDATE_ROWS = 39
    # MySQL 8.0.20+ binlog_transaction_compression=ON wrapper (beyond-
    # reference): one frame carrying a whole transaction's events as a
    # zstd (or uncompressed) payload — libbinlogevents
    # Transaction_payload_event, TLV on-the-wire fields
    MYSQL_TRANSACTION_PAYLOAD = 40
    MYSQL_HEARTBEAT_V2 = 41
    MARIADB_ANNOTATE_ROWS = 160
    MARIADB_BINLOG_CHECKPOINT = 161
    MARIADB_GTID = 162
    MARIADB_GTID_LIST = 163
    MARIADB_START_ENCRYPTION = 164
    # MariaDB log_bin_compress=ON event kinds (zlib body; beyond-reference —
    # the reference has no compressed-event support). V1 are what MariaDB
    # servers emit; the plain (V2-shaped) codes exist in the enum for
    # completeness.
    MARIADB_QUERY_COMPRESSED = 165
    MARIADB_WRITE_ROWS_COMPRESSED_V1 = 166
    MARIADB_UPDATE_ROWS_COMPRESSED_V1 = 167
    MARIADB_DELETE_ROWS_COMPRESSED_V1 = 168
    MARIADB_WRITE_ROWS_COMPRESSED = 169
    MARIADB_UPDATE_ROWS_COMPRESSED = 170
    MARIADB_DELETE_ROWS_COMPRESSED = 171


# compressed event code → the uncompressed event code its inflated body
# parses as (MariaDB log_event.cc query_event_uncompress /
# row_log_event_uncompress rewrite the type byte exactly this way)
COMPRESSED_TO_PLAIN = {
    EventType.MARIADB_QUERY_COMPRESSED: EventType.QUERY,
    EventType.MARIADB_WRITE_ROWS_COMPRESSED_V1: EventType.WRITE_ROWS_V1,
    EventType.MARIADB_UPDATE_ROWS_COMPRESSED_V1: EventType.UPDATE_ROWS_V1,
    EventType.MARIADB_DELETE_ROWS_COMPRESSED_V1: EventType.DELETE_ROWS_V1,
    EventType.MARIADB_WRITE_ROWS_COMPRESSED: EventType.MYSQL_WRITE_ROWS_V2,
    EventType.MARIADB_UPDATE_ROWS_COMPRESSED: EventType.MYSQL_UPDATE_ROWS_V2,
    EventType.MARIADB_DELETE_ROWS_COMPRESSED: EventType.MYSQL_DELETE_ROWS_V2,
}


ROW_EVENTS_V1 = {
    EventType.WRITE_ROWS_V1,
    EventType.UPDATE_ROWS_V1,
    EventType.DELETE_ROWS_V1,
}
ROW_EVENTS_V2 = {
    EventType.MYSQL_WRITE_ROWS_V2,
    EventType.MYSQL_UPDATE_ROWS_V2,
    EventType.MYSQL_DELETE_ROWS_V2,
}
WRITE_EVENTS = {EventType.WRITE_ROWS_V1, EventType.MYSQL_WRITE_ROWS_V2}
UPDATE_EVENTS = {EventType.UPDATE_ROWS_V1, EventType.MYSQL_UPDATE_ROWS_V2}
DELETE_EVENTS = {EventType.DELETE_ROWS_V1, EventType.MYSQL_DELETE_ROWS_V2}


class ColumnType:
    DECIMAL = 0
    TINY = 1
    SHORT = 2
    LONG = 3
    FLOAT = 4
    DOUBLE = 5
    NULL = 6
    TIMESTAMP = 7
    LONGLONG = 8
    INT24 = 9
    DATE = 10
    TIME = 11
    DATETIME = 12
    YEAR = 13
    NEWDATE = 14
    VARCHAR = 15
    BIT = 16
    TIMESTAMP2 = 17
    DATETIME2 = 18
    TIME2 = 19
    # MySQL 9.0 VECTOR(n) column (WL#16081): stored like a blob whose
    # payload is a packed little-endian float32 array; absent from the
    # reference enum (event_type.rs predates MySQL 9)
    VECTOR = 242
    JSON = 245
    NEWDECIMAL = 246
    ENUM = 247
    SET = 248
    TINY_BLOB = 249
    MEDIUM_BLOB = 250
    LONG_BLOB = 251
    BLOB = 252
    VAR_STRING = 253
    STRING = 254
    GEOMETRY = 255


class ChecksumType:
    NONE = 0
    CRC32 = 1


class MetadataType:
    """TableMetadata TLV section tags; /root/reference/src/metadata/metadata_type.rs:3-16."""

    SIGNEDNESS = 1
    DEFAULT_CHARSET = 2
    COLUMN_CHARSET = 3
    COLUMN_NAME = 4
    SET_STR_VALUE = 5
    ENUM_STR_VALUE = 6
    GEOMETRY_TYPE = 7
    SIMPLE_PRIMARY_KEY = 8
    PRIMARY_KEY_WITH_PREFIX = 9
    ENUM_AND_SET_DEFAULT_CHARSET = 10
    ENUM_AND_SET_COLUMN_CHARSET = 11
    VISIBILITY = 12
