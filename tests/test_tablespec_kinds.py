"""Generic TableSpec value kinds (mysql_value.rs:28-47 coverage): a target
table using every canonical kind — str, int, double, decimal(p,s), date,
binary, ts_millis — must replay end-to-end and match a sequential oracle.
The reference decodes every MySqlValue variant; round 1 only wired
str/int/ts_millis through the canonical-column converter."""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

import pandas as pd
import pytest

from mysql_cdc_spark.binlog.constants import ColumnType, EventType
from mysql_cdc_spark.binlog.decoder import TableSpec
from mysql_cdc_spark.binlog.encoder import BinlogWriter
from mysql_cdc_spark.pipeline.replay import Replayer

METRICS = TableSpec(
    database="metrics",
    table="samples",
    columns=(
        ("sample_id", "string", "str"),
        ("k", "int", "int"),
        ("value", "double", "double"),
        ("amount", "decimal(12,4)", "decimal"),
        ("day", "date", "date"),
        ("payload", "binary", "binary"),
        ("created", "timestamp_ntz", "datetime"),
        ("ts", "timestamp", "ts_millis"),
    ),
    primary_key=("sample_id", "k"),
)

CTYPES = [
    ColumnType.VARCHAR, ColumnType.LONG, ColumnType.DOUBLE,
    ColumnType.NEWDECIMAL, ColumnType.DATE, ColumnType.BLOB,
    ColumnType.DATETIME2, ColumnType.TIMESTAMP2,
]
CMETA = [64, 0, 8, 12 | (4 << 8), 0, 2, 3, 3]
COLS = [c[0] for c in METRICS.columns]
UUID = "24bc7850-2c16-11e6-a073-0242ac110001"


def _write_stream(outdir: str):
    """Three-file stream of inserts/updates/deletes over all kinds.
    Returns the expected final state keyed by (sample_id, k)."""
    import os

    os.makedirs(outdir, exist_ok=True)
    state: dict = {}
    seq = 0

    def encode_row(row):
        # binlog wire form per kind: decimal → digit string, date → tuple
        sid, k, val, amt, d, blob, created, ts = row
        return [
            sid, k, val, str(amt), (d.year, d.month, d.day), blob,
            (created.year, created.month, created.day, created.hour,
             created.minute, created.second, created.microsecond // 1000),
            ts,
        ]

    def txn(writer, ops):
        nonlocal seq
        seq += 1
        writer.write_mysql_gtid(UUID, seq)
        writer.write_query("BEGIN", database="metrics")
        writer.write_table_map(
            200, "metrics", "samples", CTYPES, CMETA,
            nullability=[False, False, True, True, True, True, True, False],
            column_names=COLS, simple_primary_keys=[0, 1],
        )
        for kind, before, after in ops:
            if kind == "insert":
                writer.write_rows(200, CTYPES, CMETA, [encode_row(after)])
                state[(after[0], after[1])] = after
            elif kind == "update":
                writer.write_update_rows(
                    200, CTYPES, CMETA, [(encode_row(before), encode_row(after))]
                )
                state[(after[0], after[1])] = after
            else:
                writer.write_rows(
                    200, CTYPES, CMETA, [encode_row(before)],
                    event_type=EventType.MYSQL_DELETE_ROWS_V2,
                )
                state.pop((before[0], before[1]), None)
        writer.write_xid(seq)

    def row(i, k, rev=0):
        return [
            f"s-{i:03d}", k,
            i * 1.5 + rev + 0.125,
            Decimal(f"{'-' if i % 3 == 0 else ''}{i * 7}.{(i * 37) % 10000:04d}"),
            date(2024, 1 + (i % 12), 1 + (i % 27)),
            bytes([i % 256, k % 256, rev % 256]) * (1 + i % 4),
            datetime(2023, 1 + (i % 12), 1 + (i % 27), i % 24, i % 60, (i * 7) % 60,
                     ((i * 131) % 1000) * 1000),
            1700000000000 + i * 1000 + rev,
        ]

    files = []
    for fidx in range(3):
        name = f"metrics.{fidx + 1:06d}"
        w = BinlogWriter(name)
        for j in range(6):
            i = fidx * 6 + j
            txn(w, [("insert", None, row(i, 0)), ("insert", None, row(i, 1))])
        if fidx > 0:
            # update + delete against earlier rows
            i = (fidx - 1) * 6
            old = state[(f"s-{i:03d}", 0)]
            txn(w, [("update", old, row(i, 0, rev=fidx))])
            gone = state.get((f"s-{i:03d}", 1))
            if gone is not None:
                txn(w, [("delete", gone, None)])
        path = os.path.join(outdir, name)
        w.save(path)
        files.append(path)
    return state


def test_all_kinds_replay_matches_oracle(spark, tmp_path):
    outdir = str(tmp_path / "binlog")
    expected = _write_stream(outdir)
    rep = Replayer(spark, outdir, str(tmp_path / "store"), spec=METRICS)
    res = rep.replay(files_per_batch=1)
    assert res.events > 0
    got = (
        rep.read_state()
        .orderBy("sample_id", "k")
        .toPandas()
        .reset_index(drop=True)
    )
    want = sorted(expected.values(), key=lambda r: (r[0], r[1]))
    assert len(got) == len(want)
    for i, w_row in enumerate(want):
        g = got.iloc[i]
        assert g["sample_id"] == w_row[0]
        assert int(g["k"]) == w_row[1]
        assert float(g["value"]) == w_row[2]
        assert Decimal(str(g["amount"])) == w_row[3]
        assert pd.Timestamp(g["day"]).date() == w_row[4]
        assert bytes(g["payload"]) == w_row[5]
        assert pd.Timestamp(g["created"]) == pd.Timestamp(w_row[6])
        assert g["ts"] == pd.Timestamp(w_row[7], unit="ms")


def test_kinds_schema_types(spark, tmp_path):
    from pyspark.sql import types as T

    outdir = str(tmp_path / "binlog")
    _write_stream(outdir)
    rep = Replayer(spark, outdir, str(tmp_path / "store"), spec=METRICS)
    rep.replay()
    schema = {f.name: f.dataType for f in rep.read_state().schema.fields}
    assert schema["amount"] == T.DecimalType(12, 4)
    assert schema["day"] == T.DateType()
    assert schema["payload"] == T.BinaryType()
    assert schema["value"] == T.DoubleType()
    assert schema["created"] == T.TimestampNTZType()
