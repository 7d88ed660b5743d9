"""Event-frame source (Kafka-style rows → change events): reassembling a
segment from shuffled per-event frames must decode byte-identically to
the file path, and multiple streams decode independently."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from mysql_cdc_spark.binlog.decoder import decode_binlog_dir
from mysql_cdc_spark.binlog.frames import decode_event_frames, split_segment_frames
from mysql_cdc_spark.fixtures import generate_changelog, write_binlog_files


@pytest.fixture(scope="module")
def stream_fixture(tmp_path_factory):
    txns = generate_changelog(
        n_conversations=12, max_turns=4, n_extra_ops=30, seed=8,
        duplicate_txns=2, evolve_after_frac=0.5,
    )
    outdir = str(tmp_path_factory.mktemp("binlog"))
    paths = write_binlog_files(txns, outdir, txns_per_file=25)
    return outdir, paths


def _frames_df(spark, paths, shuffle_seed=5):
    rows = []
    for p in paths:
        import os

        name = os.path.basename(p)
        with open(p, "rb") as f:
            for pos, frame in split_segment_frames(f.read()):
                rows.append((name, pos, bytearray(frame)))
    random.Random(shuffle_seed).shuffle(rows)  # arrival order ≠ offset order
    return spark.createDataFrame(rows, "stream string, offset long, frame binary")


def test_frames_decode_equals_file_decode(spark, stream_fixture):
    outdir, paths = stream_fixture
    via_files = decode_binlog_dir(spark, outdir).orderBy("src_file", "pos", "row_in_event")
    via_frames = decode_event_frames(_frames_df(spark, paths)).orderBy(
        "src_file", "pos", "row_in_event"
    )
    a = via_files.toPandas().reset_index(drop=True)
    b = via_frames.toPandas().reset_index(drop=True)
    assert len(a) == len(b) > 0
    for col in a.columns:
        av, bv = a[col], b[col]
        if str(av.dtype).startswith("datetime"):
            assert pd.to_datetime(av).tolist() == pd.to_datetime(bv).tolist(), col
        else:
            assert [None if pd.isna(v) else v for v in av.tolist()] == \
                [None if pd.isna(v) else v for v in bv.tolist()], col


def test_frames_scalar_mode_matches(spark, stream_fixture, monkeypatch):
    _, paths = stream_fixture
    fast = decode_event_frames(_frames_df(spark, paths)).count()
    scalar = decode_event_frames(_frames_df(spark, paths), vectorized=False).count()
    assert fast == scalar > 0


_VALUE_COLS = [
    "op", "gtid_source", "gtid_seq", "xid", "db", "tbl", "row_in_event",
    "after_conv_id", "after_turn_idx", "after_role", "after_text",
]


def _value_pdf(df):
    pdf = (
        df.orderBy("src_file", "gtid_seq", "pos", "row_in_event")
        .select(*_VALUE_COLS)
        .toPandas()
        .reset_index(drop=True)
    )
    return {
        c: [None if pd.isna(v) else v for v in pdf[c].tolist()]
        for c in _VALUE_COLS
    }


@pytest.mark.parametrize("vectorized", [True, False])
def test_frames_fde_not_first(spark, stream_fixture, vectorized):
    """A CRC32 relay group whose FORMAT_DESCRIPTION frame arrives mid-
    stream must still decode with checksum trim (the FDE is hoisted to the
    head of the reassembly) — previously the 4 CRC bytes stayed inside
    every payload and row decode mis-parsed."""
    outdir, paths = stream_fixture
    baseline = _value_pdf(decode_event_frames(_frames_df(spark, paths)))

    rows = []
    for p in paths:
        import os

        name = os.path.basename(p)
        with open(p, "rb") as f:
            frames = split_segment_frames(f.read())
        mid = frames[len(frames) // 2][0]  # push the FDE to a mid offset
        for pos, frame in frames:
            offset = mid + 1 if pos == 4 else (pos if pos < mid else pos + 2)
            rows.append((name, offset, bytearray(frame)))
    shuffled = spark.createDataFrame(rows, "stream string, offset long, frame binary")
    got = _value_pdf(decode_event_frames(shuffled, vectorized=vectorized))
    assert len(got["op"]) == len(baseline["op"]) > 0
    for col in _VALUE_COLS:
        assert got[col] == baseline[col], col


@pytest.mark.parametrize("vectorized", [True, False])
def test_frames_no_fde_explicit_checksum(spark, stream_fixture, vectorized):
    """A CRC32 relay group with NO FDE decodes when the caller supplies
    checksum_type (a synthetic FDE is prepended)."""
    from mysql_cdc_spark.binlog.constants import ChecksumType

    outdir, paths = stream_fixture
    baseline = _value_pdf(decode_event_frames(_frames_df(spark, paths)))

    rows = []
    for p in paths:
        import os

        name = os.path.basename(p)
        with open(p, "rb") as f:
            for pos, frame in split_segment_frames(f.read()):
                if pos == 4:  # drop the FDE
                    continue
                rows.append((name, pos, bytearray(frame)))
    no_fde = spark.createDataFrame(rows, "stream string, offset long, frame binary")
    got = _value_pdf(
        decode_event_frames(
            no_fde, vectorized=vectorized, checksum_type=ChecksumType.CRC32
        )
    )
    assert len(got["op"]) == len(baseline["op"]) > 0
    for col in _VALUE_COLS:
        assert got[col] == baseline[col], col


def test_stream_apply_frames_out_of_order_triggers(spark, stream_fixture, tmp_path):
    """Streaming over the frame source: the NEWER half of the stream's
    frames arrives in trigger 1, the OLDER half in trigger 2 — the
    order-aware merge must still converge to the sequential oracle."""
    import os

    from mysql_cdc_spark.binlog.reader import BinlogFileReader
    from mysql_cdc_spark.fixtures import apply_changelog_oracle
    from mysql_cdc_spark.streaming.stream import read_stream_state, stream_apply_frames

    outdir, paths = stream_fixture
    txns = generate_changelog(
        n_conversations=12, max_turns=4, n_extra_ops=30, seed=8,
        duplicate_txns=2, evolve_after_frac=0.5,
    )
    half_seq = max(t.seq for t in txns) // 2

    # split frames at transaction granularity by gtid_seq
    older, newer = [], []
    for p in paths:
        name = os.path.basename(p)
        with open(p, "rb") as f:
            content = f.read()
        cur = None
        bucket = older
        for (header, pos, kind, event), (fpos, frame) in zip(
            BinlogFileReader(content, name), split_segment_frames(content)
        ):
            if kind == "format_description":
                older.append((name, fpos, bytearray(frame)))
                newer.append((name, fpos, bytearray(frame)))
                continue
            if kind == "mysql_gtid":
                cur = event["transaction_id"]
                bucket = newer if cur > half_seq else older
            bucket.append((name, fpos, bytearray(frame)))

    frames_dir = str(tmp_path / "frames")
    schema = "stream string, offset long, frame binary"
    # trigger file 1 = newer txns; trigger file 2 = older txns (late)
    spark.createDataFrame(newer, schema).coalesce(1).write.mode("append").parquet(frames_dir)
    spark.createDataFrame(older, schema).coalesce(1).write.mode("append").parquet(frames_dir)

    store = str(tmp_path / "store")
    q = stream_apply_frames(
        spark, frames_dir, store, available_now=True, max_files_per_trigger=1
    )
    q.awaitTermination(180)

    got = (
        read_stream_state(spark, store)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    want = apply_changelog_oracle(txns)
    assert got["text"].tolist() == want["text"].tolist()
