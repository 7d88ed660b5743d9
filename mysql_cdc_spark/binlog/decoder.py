"""Distributed binlog decode (S1/S2/S4 in SURVEY.md §2.1).

Spark-first layout:

- **Across files** — parallel: ``spark.read.format("binaryFile")`` lists the
  binlog directory; each file (a rotation segment) becomes one input row and
  is decoded independently. At 100 TB the unit of parallelism is the
  rotation segment (segments are bounded, typically ≤1 GiB), so a
  1000-executor cluster decodes thousands of segments concurrently.
- **Within a file** — sequential by construction: headers chain via
  ``next_event_position`` (event_header.rs:24) and row events depend on the
  latest preceding TABLE_MAP (row_parser.rs:18-20,33-36) and GTID group
  (binlog_client.rs:74-96). The per-file scan runs inside ``mapInPandas``;
  output leaves the Python worker as Arrow batches, never per-row Python at
  the DataFrame level.
- **Transaction gating** (ST2, binlog_client.rs:69-99): row events buffer
  until their XID commit arrives; events of transactions whose commit is not
  in the file are emitted with ``xid = NULL`` so the exactly-once ledger can
  exclude them.

The decoder is schema-driven: a ``TableSpec`` declares the canonical target
columns; TABLE_MAP ``column_names`` metadata (table_metadata.rs:23) maps
in-band schemas — including additive evolution (new ``tool`` column) — onto
the canonical superset.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import ChecksumType, ColumnType, EventType
from .geometry import geometry_to_wkt as _geometry_to_wkt
from .jsonb import jsonb_to_text as _jsonb_to_text
from .xa import parse_xa_statement
from .reader import (
    BinlogFileReader,
    parse_event_header,
    parse_format_description,
    parse_rotate,
    parse_table_map,
)
from ..binlog.constants import EVENT_HEADER_SIZE, FIRST_EVENT_POSITION, MAGIC_NUMBER


@dataclass(frozen=True)
class TableSpec:
    """Canonical target table: (name, spark type, kind) per column.

    ``kind`` selects the value converter from binlog decode output —
    the full set of MySqlValue variants the reference decodes
    (mysql_value.rs:28-47) maps onto:

    - ``'str'``        VARCHAR/CHAR → StringType
    - ``'int'``        TINY/SHORT/INT24/LONG/LONGLONG → integral types
    - ``'double'``     FLOAT/DOUBLE → DoubleType
    - ``'decimal'``    NEWDECIMAL (exact digit string) → DecimalType(p,s)
    - ``'date'``       DATE (y,m,d) → DateType
    - ``'binary'``     BLOB family / GEOMETRY / JSON raw → BinaryType
    - ``'ts_millis'``  TIMESTAMP/TIMESTAMP2 epoch millis → TimestampType
    - ``'json'``       JSON jsonb blob → decoded JSON text (StringType);
                       beyond-reference (the reference returns the raw
                       blob, row_parser.rs:174-175) — see binlog/jsonb.py
    - ``'geometry'``   GEOMETRY blob (SRID+WKB) → WKT text (StringType);
                       beyond-reference (same raw-blob branch) — see
                       binlog/geometry.py
    - ``'datetime'``   DATETIME/DATETIME2 wall time → TimestampNTZType
    - ``'time'``       TIME/TIME2 → StringType
    - ``'vector'``     MySQL 9 VECTOR(n) blob (packed little-endian
                       float32) → ArrayType(FloatType); beyond-reference
                       (the reference enum predates MySQL 9) — the CDC
                       path for embedding columns feeding the ANN ops in
                       analytics/embeddings.py
    """

    database: str
    table: str
    columns: tuple[tuple[str, str, str], ...]  # (name, spark_type_ddl, kind)
    primary_key: tuple[str, ...]
    # non-NULL column DEFAULTs as SQL literal text, (name, literal) pairs —
    # MySQL's instant ADD COLUMN backfills existing rows with the DEFAULT,
    # so events logged while the column did not yet exist must read it as
    # the default, not NULL; populated by the DDL registry (binlog/ddl.py)
    # and applied at the replay tier (Replayer.run_batch)
    defaults: tuple[tuple[str, str], ...] = ()

    def __post_init__(self):
        # the canonical presence masks (before_present / after_present /
        # carried_mask) are int64 bitmasks over spec columns — 1 << 63
        # would overflow LongType, so fail construction loudly instead of
        # failing Arrow conversion later. (The *source table* in the
        # binlog may be arbitrarily wide; only the canonical projection
        # is capped.)
        if len(self.columns) > 63:
            raise ValueError(
                f"TableSpec {self.database}.{self.table} has "
                f"{len(self.columns)} columns; canonical specs are capped "
                "at 63 (int64 presence bitmask). Project the source table "
                "onto the needed columns."
            )


TRANSCRIPTS = TableSpec(
    database="chat",
    table="transcripts",
    columns=(
        ("conv_id", "string", "str"),
        ("turn_idx", "int", "int"),
        ("role", "string", "str"),
        ("text", "string", "str"),
        ("tool", "string", "str"),
        ("ts", "timestamp", "ts_millis"),
    ),
    primary_key=("conv_id", "turn_idx"),
)


def change_event_schema(
    spec: TableSpec = TRANSCRIPTS, attach_origin_query: bool = False,
    attach_partition_id: bool = False,
) -> T.StructType:
    fields = [
        T.StructField("src_file", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("next_pos", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("server_id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("gtid_source", T.StringType()),
        T.StructField("gtid_seq", T.LongType()),
        T.StructField("xid", T.LongType()),
        T.StructField("table_id", T.LongType()),
        T.StructField("db", T.StringType()),
        T.StructField("tbl", T.StringType()),
        T.StructField("row_in_event", T.IntegerType()),
    ]
    # per-image column-presence bitmasks over canonical columns (P1:
    # binlog_row_image != full leaves columns absent — row_parser.rs:108-111;
    # bit i set ⇔ canonical column i was present in the image). Consumers
    # needing per-column merge-apply (MINIMAL images) read these; FULL
    # streams carry all-ones.
    fields.append(T.StructField("before_present", T.LongType()))
    fields.append(T.StructField("after_present", T.LongType()))
    for prefix in ("before_", "after_"):
        for name, ddl, _kind in spec.columns:
            fields.append(
                T.StructField(prefix + name, _ddl_to_type(ddl), nullable=True)
            )
    if attach_origin_query:
        # the originating SQL statement from ROWS_QUERY / ANNOTATE_ROWS
        # (binlog_rows_query_log_events=ON); NULL when the statement's
        # transaction carried none
        fields.append(T.StructField("origin_query", T.StringType()))
    if attach_partition_id:
        # WL#12168 PART extra-row-info provenance (MySQL 8.0.16+,
        # partitioned source tables); source_partition_id is set only on
        # updates that migrated a row between partitions
        fields.append(T.StructField("partition_id", T.LongType()))
        fields.append(T.StructField("source_partition_id", T.LongType()))
    return T.StructType(fields)


def _ddl_to_type(ddl: str) -> T.DataType:
    import re

    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", ddl)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    return {
        "string": T.StringType(),
        "int": T.IntegerType(),
        "bigint": T.LongType(),
        "double": T.DoubleType(),
        "date": T.DateType(),
        "binary": T.BinaryType(),
        "boolean": T.BooleanType(),  # derived specs (scd2 history flags)
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(),
        "array<float>": T.ArrayType(T.FloatType()),  # kind "vector"
    }[ddl]


def _to_date(v):
    from datetime import date

    # parse_date yields (year, month, day); MySQL zero-dates → NULL
    return date(*v) if v != (0, 0, 0) else None


def _to_decimal(v):
    from decimal import Decimal

    return Decimal(v)


def _to_datetime(v):
    from datetime import datetime

    # parse_date_time/parse_date_time2 yield (y, mo, d, h, mi, s, millis);
    # MySQL zero-dates → NULL
    y, mo, d, h, mi, s, ms = v
    if y == 0 and mo == 0 and d == 0:
        return None
    return datetime(y, mo, d, h, mi, s, ms * 1000)


def _vector_to_floats(v):
    # MySQL 9 VECTOR payload: packed little-endian float32 (WL#16081,
    # Field_vector rides the blob wire form). Python floats from <f4 are
    # exact widenings, so the Arrow cast back to float32 round-trips
    # bit-exact. A length not divisible by 4 is corrupt — frombuffer
    # raises, matching the server's own rejection of odd-sized vectors.
    import numpy as np

    return np.frombuffer(bytes(v), dtype="<f4").tolist()


def _to_time(v):
    # parse_time/parse_time2 yield (h, m, s, millis); MySQL TIME spans up
    # to 838:59:59 so the canonical form is a string, not a time-of-day
    # (negative TIME raises at decode, like the reference —
    # col_parser.rs:52-55,75-84)
    h, m, s, ms = v
    return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"


# canonical-kind converters from raw binlog decode output
# (mysql_value.rs:28-47 variants → Spark column values)
_CONVERT = {
    "int": int,
    "double": float,
    "decimal": _to_decimal,
    # JSON/GEOMETRY columns arrive as the raw blob (like the reference,
    # row_parser.rs:174-175); kinds "json"/"geometry" decode them to text.
    "json": _jsonb_to_text,
    "geometry": _geometry_to_wkt,
    "vector": _vector_to_floats,
    "date": _to_date,
    "binary": bytes,
    "datetime": _to_datetime,
    "time": _to_time,
}


class _FileDecoder:
    """Sequential per-file decode with transaction buffering.

    Columnar accumulation: rows are buffered as compact tuples until their
    transaction commits, then appended straight into per-column lists —
    no per-row dicts, no per-row pandas objects. Timestamp columns are kept
    as epoch ints and converted once per Arrow batch (vectorized
    ``pd.to_datetime``)."""

    _META_COLS = (
        "src_file", "pos", "next_pos", "ts", "server_id", "op",
        "gtid_source", "gtid_seq", "xid", "table_id", "db", "tbl",
        "row_in_event",
    )

    def __init__(
        self,
        spec: TableSpec,
        xa_outcomes: Optional[dict] = None,
        attach_origin_query: bool = False,
        attach_partition_id: bool = False,
        on_error: str = "fail",
        quarantine_dir: Optional[str] = None,
    ):
        self.spec = spec
        # dead-letter policy (Debezium event.processing.failure.handling.
        # mode analog): 'quarantine' skips undecodable ROW events, records
        # them (src_file/pos/gtid/error) and keeps decoding at the next
        # length-prefixed frame; 'fail' raises like the reference.
        self.on_error = on_error
        self.quarantine_dir = quarantine_dir
        self.quarantine: list[dict] = []
        # batch-wide XA verdict map {xid_key: bool} — resolves two-phase
        # prepares whose XA COMMIT/ROLLBACK lives in another file
        self.xa_outcomes = xa_outcomes
        # attach the originating SQL from ROWS_QUERY/ANNOTATE_ROWS events
        # per statement (Debezium's `query` field analog). Row tuples
        # always carry the value in their last slot; the column is only
        # exposed when opted in.
        self.attach_origin_query = attach_origin_query
        self.attach_partition_id = attach_partition_id
        self.canonical = [c[0] for c in spec.columns]
        self.kinds = {c[0]: c[2] for c in spec.columns}
        # canonical column index maps, memoized per table-map identity
        self._colmap_memo: dict[int, list] = {}
        # canonical presence masks, memoized per (table, presence) combo
        self._mask_memo: dict[tuple, int] = {}
        # output columns: _META_COLS, presence masks, before_*/after_*
        self.columns = (
            list(self._META_COLS)
            + ["before_present", "after_present"]
            + [p + n for p in ("before_", "after_") for n in self.canonical]
            + (["origin_query"] if attach_origin_query else [])
            + (
                ["partition_id", "source_partition_id"]
                if attach_partition_id
                else []
            )
        )
        # flat row tuples (everything except src_file/xid) + per-row xid;
        # one C-level zip(*) transpose per Arrow batch beats 25 list
        # appends per row by ~4×. Tuples always carry every slot (origin,
        # partition ids) — _slot() maps exposed column → tuple position,
        # so opting into a later slot without an earlier one stays sound.
        self._tuple_slots = (
            ["pos", "next_pos", "ts", "server_id", "op", "gtid_source",
             "gtid_seq", "table_id", "db", "tbl", "row_in_event",
             "before_present", "after_present"]
            + ["before_" + n for n in self.canonical]
            + ["after_" + n for n in self.canonical]
            + ["origin_query", "partition_id", "source_partition_id"]
        )
        self._slot = {n: i for i, n in enumerate(self._tuple_slots)}
        self._rows: list[tuple] = []
        self._xids: list = []
        self.src_file = ""

    @property
    def n_rows(self) -> int:
        return len(self._rows)

    def _flush_frame(self) -> pd.DataFrame:
        millis_cols = {
            p + n for p in ("before_", "after_")
            for n, k in self.kinds.items() if k == "ts_millis"
        }
        cols = list(zip(*self._rows)) if self._rows else [
            () for _ in range(len(self._tuple_slots))
        ]
        data = {}
        for c in self.columns:
            if c == "src_file":
                data[c] = self.src_file
                continue
            if c == "xid":
                data[c] = self._xids
                continue
            values = list(cols[self._slot[c]])
            if c == "ts":
                data[c] = pd.to_datetime(values, unit="s").values
            elif c in millis_cols:
                data[c] = pd.to_datetime(values, unit="ms").values
            else:
                data[c] = values
        df = pd.DataFrame(data, columns=self.columns)
        self._rows = []
        self._xids = []
        return df

    def _colmap(self, table: dict) -> list:
        """For a table map: [(canonical_idx, image_idx | None, kind,
        codec), ...] — ``codec`` is the column's charset codec (TABLE_MAP
        charset metadata via binlog/charset.py), consumed by kind "str"
        columns riding the blob wire form (TEXT)."""
        key = id(table)
        cm = self._colmap_memo.get(key)
        if cm is None:
            from .charset import table_codecs

            col_names = table.get("column_names") or self.canonical[
                : len(table["column_types"])
            ]
            index = {n: i for i, n in enumerate(col_names)}
            codecs = table_codecs(table)
            cm = [
                (
                    ci,
                    index.get(name),
                    self.kinds[name],
                    codecs[index[name]]
                    if name in index and index[name] < len(codecs)
                    else None,
                )
                for ci, name in enumerate(self.canonical)
            ]
            self._colmap_memo[key] = cm
        return cm

    def _canon_mask(self, table: dict, present: list) -> int:
        """Canonical-column presence bitmask for one image: bit ci set iff
        the canonical column maps into this table AND its table column is
        in the image's columns_present (row_parser.rs:108-111)."""
        key = (id(table), tuple(present))
        m = self._mask_memo.get(key)
        if m is None:
            m = 0
            n = len(present)
            for ci, mi, _kind, _codec in self._colmap(table):
                if mi is not None and mi < n and present[mi]:
                    m |= 1 << ci
            self._mask_memo[key] = m
        return m

    def decode_file(
        self, path: str, content: bytes, batch_rows: int = 65536
    ) -> Iterator[pd.DataFrame]:
        src_file = os.path.basename(path)
        self.src_file = src_file
        reader = BinlogFileReader(content, src_file, on_error=self.on_error)
        spec = self.spec
        n_canon = len(self.canonical)
        nulls = (None,) * n_canon

        # XA verdicts: segment-local scan (commit/rollback later in this
        # file) merged under any batch-wide map the Replayer collected —
        # resolved at the *prepare* position so output stays in positional
        # order, matching the vectorized path exactly (binlog/xa.py)
        from .xa import scan_xa

        local_xa = scan_xa(content, src_file)
        xa_verdicts = dict(self.xa_outcomes or {})
        if local_xa:
            xa_verdicts.update(local_xa["verdicts"])

        # transaction state (ST2): gtid seen at group start, rows buffered
        # until xid; binlog_client.rs:69-99. Buffered rows are the final
        # flat tuples (minus src_file/xid, filled at flush/commit).
        cur_gtid_source: Optional[str] = None
        cur_gtid_seq: Optional[int] = None
        # originating SQL from the statement's ROWS_QUERY/ANNOTATE_ROWS
        # event (overwritten per statement, cleared at txn boundaries)
        cur_origin: Optional[str] = None
        txn_buffer: list[tuple] = []

        def map_image(image, colmap):
            if image is None:
                return nulls
            out = []
            n = len(image)
            for _ci, mi, kind, codec in colmap:
                v = image[mi] if mi is not None and mi < n else None
                if v is not None and kind != "str" and kind != "ts_millis":
                    v = _CONVERT[kind](v)
                elif type(v) is bytes and kind == "str":
                    # TEXT column (blob wire form): decode in the column's
                    # charset; binary-collation blobs declared "str" and
                    # metadata-less logs default to utf-8
                    v = v.decode(codec or "utf-8")
                out.append(v)
            return tuple(out)

        def emit_txn(xid):
            # _rows/_xids are rebound by _flush_frame — resolve at call time
            self._rows.extend(txn_buffer)
            self._xids.extend([xid] * len(txn_buffer))

        # TRANSACTION_PAYLOAD splices report every embedded event at the
        # wrapper's on-disk pos; row_in_event continues across row events
        # sharing one pos so (gtid_seq, pos, row_in_event) stays a total
        # order within the transaction (pipeline/order.py ORDER_COLS).
        # Plain frames never share a pos, so base stays 0 for them.
        last_row_pos = None
        row_base = 0

        def _base(p, n):
            nonlocal last_row_pos, row_base
            b = row_base if p == last_row_pos else 0
            last_row_pos = p
            row_base = b + n
            return b

        for header, pos, kind, event in reader:
            if kind == "mysql_gtid":
                cur_gtid_source = event["source_uuid"]
                cur_gtid_seq = event["transaction_id"]
                cur_origin = None
                txn_buffer = []
            elif kind == "mariadb_gtid":
                cur_gtid_source = f"{event['domain_id']}-{event['server_id']}"
                cur_gtid_seq = event["sequence"]
                cur_origin = None
                txn_buffer = []
            elif kind in ("write_rows", "delete_rows"):
                table = reader.table_map[event["table_id"]]
                if table["database_name"] != spec.database or table["table_name"] != spec.table:
                    continue
                op = "insert" if kind == "write_rows" else "delete"
                colmap = self._colmap(table)
                img_mask = self._canon_mask(table, event["columns_present"])
                ts = header[0] or None
                tid = event["table_id"]
                db, tbl = table["database_name"], table["table_name"]
                meta = (pos, header[4], ts, header[2], op, cur_gtid_source,
                        cur_gtid_seq, tid, db, tbl)
                base = _base(pos, len(event["rows"]))
                org = (cur_origin,)
                tail = org + (event.get("partition_id"), None)
                if op == "insert":
                    masks = (0, img_mask)
                    for i, row in enumerate(event["rows"]):
                        txn_buffer.append(
                            meta + (base + i,) + masks + nulls
                            + map_image(row, colmap) + tail
                        )
                else:
                    masks = (img_mask, 0)
                    for i, row in enumerate(event["rows"]):
                        txn_buffer.append(
                            meta + (base + i,) + masks
                            + map_image(row, colmap) + nulls + tail
                        )
            elif kind == "update_rows":
                table = reader.table_map[event["table_id"]]
                if table["database_name"] != spec.database or table["table_name"] != spec.table:
                    continue
                colmap = self._colmap(table)
                masks = (
                    self._canon_mask(table, event["before_present"]),
                    self._canon_mask(table, event["after_present"]),
                )
                ts = header[0] or None
                tid = event["table_id"]
                db, tbl = table["database_name"], table["table_name"]
                meta = (pos, header[4], ts, header[2], "update", cur_gtid_source,
                        cur_gtid_seq, tid, db, tbl)
                base = _base(pos, len(event["rows"]))
                org = (cur_origin,)
                tail = org + (
                    event.get("partition_id"),
                    event.get("source_partition_id"),
                )
                for i, (before, after) in enumerate(event["rows"]):
                    txn_buffer.append(
                        meta + (base + i,) + masks
                        + map_image(before, colmap) + map_image(after, colmap)
                        + tail
                    )
            elif kind == "xid":
                emit_txn(event["xid"])
                txn_buffer = []
                cur_gtid_source = None
                cur_gtid_seq = None
                cur_origin = None
                if self.n_rows >= batch_rows:
                    yield self._flush_frame()
            elif kind == "xa_prepare":
                # two-phase prepare closes the row-carrying group; the
                # verdict (XA COMMIT/ROLLBACK, own GTID, possibly another
                # file) decides the rows' fate (binlog/xa.py module doc)
                if event["one_phase"]:
                    emit_txn(-1)
                else:
                    verdict = xa_verdicts.get(event["xid_key"])
                    if verdict is True:
                        emit_txn(-1)
                    elif verdict is None:
                        emit_txn(None)  # pending — committed-only gate drops
                txn_buffer = []
                cur_gtid_source = None
                cur_gtid_seq = None
                cur_origin = None
                if self.n_rows >= batch_rows:
                    yield self._flush_frame()
            elif kind == "query":
                # transaction-boundary predicate over sql_statement
                # (binlog_client.rs:88-95): BEGIN opens, COMMIT closes,
                # ROLLBACK discards, anything else is autocommit DDL which
                # also closes the group.
                sql = event["sql_statement"].strip()
                xa_stmt = (
                    parse_xa_statement(sql)
                    if len(sql) > 2 and sql[:2].upper() == "XA"
                    else None
                )
                if xa_stmt is not None:
                    verb, key, one_phase = xa_stmt
                    if verb in ("start", "end"):
                        pass  # group stays open, like BEGIN
                    elif verb == "commit" and one_phase:
                        emit_txn(-1)  # inline commit, like COMMIT
                        txn_buffer = []
                        cur_gtid_source = None
                        cur_gtid_seq = None
                        cur_origin = None
                        if self.n_rows >= batch_rows:
                            yield self._flush_frame()
                    elif verb == "prepare" and key is not None:
                        # statement-form prepare: same policy as the event
                        verdict = xa_verdicts.get(key)
                        if verdict is True:
                            emit_txn(-1)
                        elif verdict is None:
                            emit_txn(None)
                        txn_buffer = []
                        cur_gtid_source = None
                        cur_gtid_seq = None
                        cur_origin = None
                    else:
                        # commit/rollback verdict groups carry no rows —
                        # the prepare position already resolved them
                        txn_buffer = []
                        cur_gtid_source = None
                        cur_gtid_seq = None
                        cur_origin = None
                elif sql == "BEGIN":
                    pass
                elif sql == "COMMIT":
                    emit_txn(-1)  # committed without XID event
                    txn_buffer = []
                    cur_gtid_source = None
                    cur_gtid_seq = None
                    cur_origin = None
                    if self.n_rows >= batch_rows:
                        yield self._flush_frame()
                elif sql.startswith("ROLLBACK"):
                    txn_buffer = []
                    cur_gtid_source = None
                    cur_gtid_seq = None
                    cur_origin = None
                else:  # autocommit DDL
                    txn_buffer = []
                    cur_gtid_source = None
                    cur_gtid_seq = None
                    cur_origin = None
            elif kind == "quarantine":
                # dead-letter record: event-scoped loss — the rest of the
                # enclosing transaction still applies (the frame chain is
                # intact; only this event's rows are unrecoverable). The
                # record carries everything a re-drive needs: exact
                # (file, pos) plus the enclosing GTID for first-delivery
                # bookkeeping after an upstream fix re-emits the txn.
                self.quarantine.append(
                    {
                        "src_file": src_file,
                        "pos": int(pos),
                        "event_type": int(event["event_type"]),
                        "payload_len": int(event["payload_len"]),
                        "gtid_source": cur_gtid_source,
                        "gtid_seq": cur_gtid_seq,
                        "error": event["error"],
                    }
                )
            elif kind == "rows_query":
                cur_origin = event["query"]
            elif kind == "incident":
                # LOST_EVENTS marker — refuse to decode past it, exactly
                # like a replica's SQL thread (ER_REPLICA_INCIDENT); the
                # error carries (file, pos) so an operator can re-snapshot
                # or deliberately restart past the position
                if event["incident_number"] != 0:
                    from .reader import BinlogIncidentError

                    raise BinlogIncidentError(
                        src_file, pos, event["incident_number"], event["message"]
                    )
            # rotate / heartbeat / format_description / prev_gtids / unknown:
            # no row output

        # un-committed tail (transaction cut by file end / crash): emit with
        # xid NULL so the transaction-complete gate can drop it
        emit_txn(None)
        if self.quarantine_dir is not None:
            self._write_quarantine(src_file)
        if self.n_rows:
            yield self._flush_frame()

    def _write_quarantine(self, src_file: str) -> None:
        """Persist this segment's dead-letter records as one parquet file
        named after the segment — executor-side, deterministic, so a task
        retry (or a resume re-decoding the same segment) overwrites rather
        than duplicates, and a clean re-decode after an upstream fix
        removes the stale record. Tiny by construction (corruption is the
        exception), so one file per poisoned segment is the right grain."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyarrow import fs as pafs

        path = f"{self.quarantine_dir.rstrip('/')}/{src_file}.parquet"
        if "://" in path:
            filesystem, p = pafs.FileSystem.from_uri(path)
        else:
            filesystem, p = pafs.LocalFileSystem(), path
        mine = [r for r in self.quarantine if r["src_file"] == src_file]
        if not mine:
            try:
                filesystem.delete_file(p)
            except (FileNotFoundError, OSError):
                pass
            return
        filesystem.create_dir(os.path.dirname(p), recursive=True)
        table = pa.table(
            {
                "src_file": pa.array([r["src_file"] for r in mine], pa.string()),
                "pos": pa.array([r["pos"] for r in mine], pa.int64()),
                "event_type": pa.array([r["event_type"] for r in mine], pa.int32()),
                "payload_len": pa.array([r["payload_len"] for r in mine], pa.int32()),
                "gtid_source": pa.array([r["gtid_source"] for r in mine], pa.string()),
                "gtid_seq": pa.array([r["gtid_seq"] for r in mine], pa.int64()),
                "error": pa.array([r["error"] for r in mine], pa.string()),
            }
        )
        pq.write_table(table, p, filesystem=filesystem)


def decode_binlog_dir(
    spark: SparkSession,
    binlog_dir: str,
    spec: TableSpec = TRANSCRIPTS,
    path_filter: Optional[str] = None,
    vectorized: Optional[bool] = None,
    before_values: str = "full",
    xa_outcomes: Optional[dict] = None,
    attach_origin_query: bool = False,
    attach_partition_id: bool = False,
    on_error: str = "fail",
    quarantine_dir: Optional[str] = None,
) -> DataFrame:
    """binlog directory → change-event DataFrame (distributed decode).

    ``binaryFile`` gives (path, content) rows; decode runs in mapInPandas —
    one Arrow batch stream per file, parallel across files. Filter pushdown:
    pass ``path_filter`` (glob) to prune segments at the listing, e.g. for
    resume-from-file checkpoints.

    ``before_values="keys"`` (vectorized path) skips materializing
    non-key before-image values — column-pruning pushed into the byte
    decoder for consumers that only read keys + after images (the merge
    pipeline). The scalar fallback always decodes full values (rare, and
    correctness-identical for such consumers).
    """
    # One file = one sequential decode unit, so decode parallelism must be
    # one task per segment. ``binaryFile`` packs small segments into shared
    # tasks (maxSplitBytes formula), so instead the *path list* (driver-side
    # metadata, bytes-free) is distributed — repartition(n_files) shuffles
    # only strings; each task then opens its own segment executor-side
    # (local fs here; pyarrow.fs handles hdfs://, s3:// identically). Raw
    # segment bytes never cross the network as shuffle data.
    paths = _list_segments(binlog_dir, path_filter)
    if not paths:
        return spark.createDataFrame(
            [], change_event_schema(spec, attach_origin_query, attach_partition_id)
        )
    # parallelize with numSlices=len(paths): exactly one path per partition,
    # deterministic, zero shuffle (round-robin repartition leaves collision
    # gaps; hash repartition is worse)
    pdf_paths = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in paths], len(paths)),
        "path string",
    )

    schema = change_event_schema(spec, attach_origin_query, attach_partition_id)
    if vectorized is None:
        vectorized = os.environ.get("SPARK_CDC_SCALAR_DECODE", "") != "1"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                content = _read_bytes(path)
                name = os.path.basename(path)
                frames = None
                if vectorized:
                    from .vector import decode_segment_fast

                    try:
                        frames = decode_segment_fast(
                            content, name, spec, before_values=before_values,
                            xa_outcomes=xa_outcomes,
                            attach_origin_query=attach_origin_query,
                            attach_partition_id=attach_partition_id,
                        )
                    except Exception:
                        # under the dead-letter policy a poisoned segment
                        # re-decodes on the scalar path, which quarantines
                        # at event grain; without it the error propagates
                        if on_error != "quarantine":
                            raise
                        frames = None
                if frames is not None:
                    yield from frames
                    if quarantine_dir is not None:
                        # fast path decoded the segment clean — drop any
                        # stale dead-letter record a prior run left behind
                        _FileDecoder(
                            spec, on_error=on_error,
                            quarantine_dir=quarantine_dir,
                        )._write_quarantine(name)
                else:
                    # scalar fallback: constructs the fast path can't
                    # express (rare types, partial images, wide tables)
                    decoder = _FileDecoder(
                        spec, xa_outcomes=xa_outcomes,
                        attach_origin_query=attach_origin_query,
                        attach_partition_id=attach_partition_id,
                        on_error=on_error,
                        quarantine_dir=quarantine_dir,
                    )
                    yield from decoder.decode_file(path, content)

    return pdf_paths.mapInPandas(decode, schema=schema)


def _segment_sort_key(name: str) -> tuple[str, int]:
    """Decode/replay order of rotation segments: (prefix, numeric suffix).
    MySQL numbers segments with a growing decimal extension, so plain
    lexicographic ordering breaks at a digit rollover
    (mysql-bin.999999 → mysql-bin.1000000); compare the suffix as an int.
    Suffix-less names rank by whole name with suffix -1."""
    import re

    m = re.match(r"^(.*)\.(\d+)$", name)
    return (m.group(1), int(m.group(2))) if m else (name, -1)


def list_dir_entries(binlog_dir: str) -> list[str]:
    """File names (no directories) under a binlog dir — local path or any
    pyarrow.fs URI (s3://, hdfs://, file://), mirroring ``_read_bytes`` so a
    cluster deployment pointing at object storage lists the same way it
    reads."""
    if "://" not in binlog_dir:
        return [
            n for n in os.listdir(binlog_dir)
            if os.path.isfile(os.path.join(binlog_dir, n))
        ]
    from pyarrow import fs as pafs

    filesystem, p = pafs.FileSystem.from_uri(binlog_dir)
    infos = filesystem.get_file_info(pafs.FileSelector(p, recursive=False))
    return [
        info.base_name for info in infos if info.type == pafs.FileType.File
    ]


def _join_dir(binlog_dir: str, name: str) -> str:
    if "://" not in binlog_dir:
        return os.path.join(binlog_dir, name)
    return binlog_dir.rstrip("/") + "/" + name


def _list_segments(binlog_dir: str, path_filter: Optional[str] = None) -> list[str]:
    """Driver-side segment listing (cheap metadata op — the same listing
    the resume planner already does), in numeric-suffix segment order.
    Glob filter mirrors binaryFile's pathGlobFilter. Works against local
    dirs and pyarrow.fs URIs (s3://, hdfs://)."""
    import fnmatch

    names = sorted(list_dir_entries(binlog_dir), key=_segment_sort_key)
    if path_filter:
        # brace-glob {a,b} support like Hadoop's GlobFilter
        if path_filter.startswith("{") and path_filter.endswith("}"):
            allowed = set(path_filter[1:-1].split(","))
            names = [n for n in names if n in allowed]
        else:
            names = [n for n in names if fnmatch.fnmatch(n, path_filter)]
    return [_join_dir(binlog_dir, n) for n in names]


def _read_bytes(path: str) -> bytes:
    """Executor-side segment read; local path or any pyarrow.fs URI."""
    if "://" not in path:
        with open(path, "rb") as f:
            return f.read()
    from pyarrow import fs as pafs

    filesystem, p = pafs.FileSystem.from_uri(path)
    with filesystem.open_input_stream(p) as f:
        return f.read()


def scan_table_maps(content: bytes) -> list[dict]:
    """Metadata-only scan: TABLE_MAP + FDE + ROTATE, skipping row payload
    decode entirely. Used by the cheap schema-discovery pass (SURVEY.md §4
    item 3) — at 100 TB this pass reads every frame header but decodes no
    row cells, so it is I/O-bound and ~free relative to full decode."""
    if content[:FIRST_EVENT_POSITION] != MAGIC_NUMBER:
        raise ValueError("Invalid binary log file header")
    out = []
    checksum = ChecksumType.NONE
    n = len(content)
    pos = FIRST_EVENT_POSITION
    while pos + EVENT_HEADER_SIZE <= n:
        header = parse_event_header(content, pos)
        (_ts, etype, _server_id, event_length, _next_pos, _flags) = header
        end = pos + event_length
        if end > n:
            break
        if etype == EventType.FORMAT_DESCRIPTION:
            payload = content[pos + EVENT_HEADER_SIZE : end]
            _, _, checksum = parse_format_description(payload, event_length)
        elif etype == EventType.TABLE_MAP:
            payload = content[pos + EVENT_HEADER_SIZE : end]
            if checksum == ChecksumType.CRC32:
                payload = payload[:-4]
            tm = parse_table_map(payload)
            tm["pos"] = pos
            out.append(tm)
        pos = end
    return out


def discover_columns(spark: SparkSession, binlog_dir: str, spec: TableSpec) -> list[str]:
    """Two-pass schema discovery: union of TABLE_MAP column_names for the
    target table across all segments (additive evolution)."""
    paths = _list_segments(binlog_dir)
    files = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(1, len(paths))
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names: list[str] = []
            for path in pdf["path"]:
                for tm in scan_table_maps(_read_bytes(path)):
                    if (
                        tm["database_name"] == spec.database
                        and tm["table_name"] == spec.table
                        and tm["column_names"]
                    ):
                        for c in tm["column_names"]:
                            names.append(c)
            yield pd.DataFrame({"column_name": sorted(set(names))})

    found = (
        files.mapInPandas(scan, schema="column_name string")
        .distinct()
        .toPandas()["column_name"]
        .tolist()
    )
    # preserve canonical order, drop unknowns
    ordered = [c[0] for c in spec.columns if c[0] in found]
    return ordered
