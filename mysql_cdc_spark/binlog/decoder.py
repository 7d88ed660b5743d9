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

    ``kind`` selects the value converter from binlog decode output:
    'str' | 'int' | 'ts_millis' (epoch millis → timestamp).
    """

    database: str
    table: str
    columns: tuple[tuple[str, str, str], ...]  # (name, spark_type_ddl, kind)
    primary_key: tuple[str, ...]


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


def change_event_schema(spec: TableSpec = TRANSCRIPTS) -> T.StructType:
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
    for prefix in ("before_", "after_"):
        for name, ddl, _kind in spec.columns:
            fields.append(
                T.StructField(prefix + name, _ddl_to_type(ddl), nullable=True)
            )
    return T.StructType(fields)


def _ddl_to_type(ddl: str) -> T.DataType:
    return {
        "string": T.StringType(),
        "int": T.IntegerType(),
        "bigint": T.LongType(),
        "double": T.DoubleType(),
        "timestamp": T.TimestampType(),
    }[ddl]


def _convert(value, kind: str):
    if value is None:
        return None
    if kind == "ts_millis":
        return pd.Timestamp(value, unit="ms")
    if kind == "int":
        return int(value)
    return value


class _FileDecoder:
    """Sequential per-file decode with transaction buffering."""

    def __init__(self, spec: TableSpec):
        self.spec = spec
        self.canonical = [c[0] for c in spec.columns]
        self.kinds = {c[0]: c[2] for c in spec.columns}
        self.out: dict[str, list] = {}
        self._reset_columns()

    def _reset_columns(self):
        cols = [
            "src_file", "pos", "next_pos", "ts", "server_id", "op",
            "gtid_source", "gtid_seq", "xid", "table_id", "db", "tbl",
            "row_in_event",
        ]
        for prefix in ("before_", "after_"):
            for name in self.canonical:
                cols.append(prefix + name)
        self.out = {c: [] for c in cols}
        self.n_rows = 0

    def _flush_frame(self) -> pd.DataFrame:
        df = pd.DataFrame(self.out)
        self._reset_columns()
        return df

    def decode_file(
        self, path: str, content: bytes, batch_rows: int = 65536
    ) -> Iterator[pd.DataFrame]:
        src_file = os.path.basename(path)
        reader = BinlogFileReader(content, src_file)
        spec = self.spec

        # transaction state (ST2): gtid seen at group start, rows buffered
        # until xid; binlog_client.rs:69-99
        cur_gtid_source: Optional[str] = None
        cur_gtid_seq: Optional[int] = None
        txn_buffer: list[dict] = []

        def row_record(pos, header, op, table, table_id, before, after, row_idx):
            col_names = table.get("column_names") or self.canonical[: len(table["column_types"])]
            rec = {
                "src_file": src_file,
                "pos": pos,
                "next_pos": header[4],
                "ts": pd.Timestamp(header[0], unit="s") if header[0] else pd.NaT,
                "server_id": header[2],
                "op": op,
                "gtid_source": cur_gtid_source,
                "gtid_seq": cur_gtid_seq,
                "xid": None,
                "table_id": table_id,
                "db": table["database_name"],
                "tbl": table["table_name"],
                "row_in_event": row_idx,
            }
            for prefix, image in (("before_", before), ("after_", after)):
                for name in self.canonical:
                    rec[prefix + name] = None
                if image is not None:
                    for cname, value in zip(col_names, image):
                        if cname in self.kinds:
                            rec[prefix + cname] = _convert(value, self.kinds[cname])
            return rec

        def emit(rec):
            for k, v in rec.items():
                self.out[k].append(v)
            self.n_rows += 1

        for header, pos, kind, event in reader:
            if kind == "mysql_gtid":
                cur_gtid_source = event["source_uuid"]
                cur_gtid_seq = event["transaction_id"]
                txn_buffer = []
            elif kind == "mariadb_gtid":
                cur_gtid_source = f"{event['domain_id']}-{event['server_id']}"
                cur_gtid_seq = event["sequence"]
                txn_buffer = []
            elif kind in ("write_rows", "delete_rows"):
                table = reader.table_map[event["table_id"]]
                if table["database_name"] != spec.database or table["table_name"] != spec.table:
                    continue
                op = "insert" if kind == "write_rows" else "delete"
                for i, row in enumerate(event["rows"]):
                    before = row if op == "delete" else None
                    after = row if op == "insert" else None
                    txn_buffer.append(
                        row_record(pos, header, op, table, event["table_id"], before, after, i)
                    )
            elif kind == "update_rows":
                table = reader.table_map[event["table_id"]]
                if table["database_name"] != spec.database or table["table_name"] != spec.table:
                    continue
                for i, (before, after) in enumerate(event["rows"]):
                    txn_buffer.append(
                        row_record(pos, header, "update", table, event["table_id"], before, after, i)
                    )
            elif kind == "xid":
                for rec in txn_buffer:
                    rec["xid"] = event["xid"]
                    emit(rec)
                txn_buffer = []
                cur_gtid_source = None
                cur_gtid_seq = None
                if self.n_rows >= batch_rows:
                    yield self._flush_frame()
            elif kind == "query":
                # transaction-boundary predicate over sql_statement
                # (binlog_client.rs:88-95): BEGIN opens, COMMIT closes,
                # ROLLBACK discards, anything else is autocommit DDL which
                # also closes the group.
                sql = event["sql_statement"].strip()
                if sql == "BEGIN":
                    pass
                elif sql == "COMMIT":
                    for rec in txn_buffer:
                        rec["xid"] = -1  # committed without XID event
                        emit(rec)
                    txn_buffer = []
                    cur_gtid_source = None
                    cur_gtid_seq = None
                    if self.n_rows >= batch_rows:
                        yield self._flush_frame()
                elif sql.startswith("ROLLBACK"):
                    txn_buffer = []
                    cur_gtid_source = None
                    cur_gtid_seq = None
                else:  # autocommit DDL
                    txn_buffer = []
                    cur_gtid_source = None
                    cur_gtid_seq = None
            # rotate / heartbeat / format_description / prev_gtids / unknown:
            # no row output

        # un-committed tail (transaction cut by file end / crash): emit with
        # xid NULL so the transaction-complete gate can drop it
        for rec in txn_buffer:
            emit(rec)
        if self.n_rows:
            yield self._flush_frame()


def decode_binlog_dir(
    spark: SparkSession,
    binlog_dir: str,
    spec: TableSpec = TRANSCRIPTS,
    path_filter: Optional[str] = None,
) -> DataFrame:
    """binlog directory → change-event DataFrame (distributed decode).

    ``binaryFile`` gives (path, content) rows; decode runs in mapInPandas —
    one Arrow batch stream per file, parallel across files. Filter pushdown:
    pass ``path_filter`` (glob) to prune segments at the listing, e.g. for
    resume-from-file checkpoints.
    """
    reader = spark.read.format("binaryFile")
    if path_filter:
        reader = reader.option("pathGlobFilter", path_filter)
    files = reader.load(binlog_dir).select("path", "content")
    # One file = one sequential decode unit. Spark's file packing controls
    # how segments spread over tasks: set spark.sql.files.openCostInBytes
    # high enough (session.py does) that small segments don't all pack into
    # one partition. No repartition here — shuffling raw segment bytes
    # would move the entire input over the network at cluster scale.

    schema = change_event_schema(spec)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                decoder = _FileDecoder(spec)
                yield from decoder.decode_file(path, bytes(content))

    return files.mapInPandas(decode, schema=schema)


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
    files = spark.read.format("binaryFile").load(binlog_dir).select("path", "content")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names: list[str] = []
            for content in pdf["content"]:
                for tm in scan_table_maps(bytes(content)):
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
