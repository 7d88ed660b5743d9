"""Multi-writer ordering knob (Replayer(order_cols=...)).

``gtid_seq`` values from different ``gtid_source`` uuids are not
mutually ordered (order.py module doc), so when two sources write the
SAME key the default order resolves by whichever source happens to
carry the larger sequence — replication reality, but wrong for a
multi-writer deployment that has an application timestamp. These tests
pin both behaviors: the documented hazard under the default order, and
the timestamp-led override picking the newest write.
"""

from __future__ import annotations

import os

import pytest

from mysql_cdc_spark.binlog.constants import ColumnType
from mysql_cdc_spark.binlog.encoder import BinlogWriter
from mysql_cdc_spark.fixtures import transcripts_pre_spec
from mysql_cdc_spark.pipeline.replay import Replayer

T5 = [ColumnType.VARCHAR, ColumnType.LONG, ColumnType.VARCHAR,
      ColumnType.VARCHAR, ColumnType.TIMESTAMP2]
T5M = [64, 0, 16, 2048, 3]
COLS = ["conv_id", "turn_idx", "role", "text", "ts"]
SRC_A = "aaaaaaaa-2c16-11e6-a073-0242ac110001"
SRC_B = "bbbbbbbb-2c16-11e6-a073-0242ac110002"

TS_OLD = 1_700_000_000_000
TS_NEW = 1_700_000_001_000


def _write_two_writer_stream(outdir: str) -> None:
    """Source A commits with a HIGH gtid_seq but an OLDER app timestamp;
    source B with a LOW gtid_seq but the NEWER timestamp — the adversarial
    multi-writer interleaving."""
    w = BinlogWriter("multi.000001")
    xid = 0

    def txn(uuid, seq, rows):
        nonlocal xid
        xid += 1
        w.write_mysql_gtid(uuid, seq)
        w.write_query("BEGIN", database="chat")
        w.write_table_map(
            100, "chat", "transcripts", T5, T5M, [False] * 5,
            column_names=COLS,
        )
        w.write_rows(100, T5, T5M, rows)
        w.write_xid(xid)

    txn(SRC_A, 50, [["c-1", 0, "user", "old-write", TS_OLD]])
    txn(SRC_B, 1, [["c-1", 0, "user", "new-write", TS_NEW]])
    os.makedirs(outdir)
    w.save(os.path.join(outdir, "multi.000001"))


def _final_text(spark, tmp_path, **replayer_kwargs) -> str:
    outdir = str(tmp_path / "binlog")
    _write_two_writer_stream(outdir)
    rep = Replayer(
        spark, outdir, str(tmp_path / "store"),
        spec=transcripts_pre_spec(), **replayer_kwargs,
    )
    rep.replay()
    rows = rep.read_state().collect()
    assert len(rows) == 1
    return rows[0]["text"]


def test_default_order_resolves_by_gtid_seq_only(spark, tmp_path):
    # documents the cross-source hazard: seq 50 outranks seq 1 even
    # though its write is older
    assert _final_text(spark, tmp_path) == "old-write"


def test_timestamp_led_order_picks_newest_write(spark, tmp_path):
    assert (
        _final_text(
            spark, tmp_path,
            order_cols=["after_ts", "gtid_seq", "pos", "row_in_event"],
        )
        == "new-write"
    )


def test_minimal_row_image_honors_order_override(spark, tmp_path):
    """The per-column LWW path threads the same override."""
    assert (
        _final_text(
            spark, tmp_path,
            row_image="minimal",
            order_cols=["after_ts", "gtid_seq", "pos", "row_in_event"],
        )
        == "new-write"
    )


def test_history_with_minimal_row_image_rejected(spark, tmp_path):
    from mysql_cdc_spark.pipeline.scd2 import Scd2HistoryStore

    outdir = str(tmp_path / "binlog")
    _write_two_writer_stream(outdir)
    store = Scd2HistoryStore(
        str(tmp_path / "hist"), transcripts_pre_spec(), buckets=2
    )
    with pytest.raises(ValueError, match="row_image"):
        Replayer(
            spark, outdir, str(tmp_path / "store"),
            spec=transcripts_pre_spec(), row_image="minimal", history=store,
        )
