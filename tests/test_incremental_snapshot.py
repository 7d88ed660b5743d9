"""Incremental (chunked, concurrent) snapshot — Replayer.snapshot_chunk,
the DBLog / Debezium incremental-snapshot algorithm: backfill a table's
pre-existing rows in chunks WITHOUT pausing the change stream.

Equality bar: a store started mid-stream (FromPosition, missing all
phase-1 history) + chunked backfill interleaved with live replay must
land on the exact final state of a full from-scratch replay — including
when phase-2 deletes race the chunk reads (the resurrection guard).
"""

from __future__ import annotations

import zlib

import pandas as pd
import pytest

from mysql_cdc_spark.fixtures import (
    Op,
    Txn,
    _row,
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.replay import Replayer
from mysql_cdc_spark.pipeline.start import FromPosition

TXNS_PER_FILE = 15
N_CHUNKS = 3


def _chunk_of(conv_id: str) -> int:
    return zlib.crc32(conv_id.encode()) % N_CHUNKS


def _chunk_pd(txns, upto_txn: int, chunk_id: int) -> pd.DataFrame:
    """Simulated live chunk read: the source table's state after
    ``upto_txn`` transactions, restricted to one key-hash chunk."""
    src = apply_changelog_oracle(txns[:upto_txn])
    return src[src["conv_id"].map(_chunk_of) == chunk_id].reset_index(drop=True)


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    # duplicate_txns: redelivered old transactions at later positions —
    # they must neither corrupt the backfill nor void it incorrectly
    txns = generate_changelog(
        n_conversations=20, max_turns=5, n_extra_ops=90, seed=47,
        duplicate_txns=4, evolve_after_frac=0.4, delete_ratio=0.2,
    )
    outdir = str(tmp_path_factory.mktemp("binlog"))
    write_binlog_files(txns, outdir, txns_per_file=TXNS_PER_FILE)
    return txns, outdir


@pytest.fixture(scope="module")
def full_state(spark, stream, tmp_path_factory):
    _, outdir = stream
    rep = Replayer(spark, outdir, str(tmp_path_factory.mktemp("full")))
    rep.replay(files_per_batch=1)
    return rep.read_state().orderBy("conv_id", "turn_idx").toPandas()


@pytest.fixture(scope="module")
def split(spark, stream, tmp_path_factory):
    """Phase-1 position (end of the first half of segments): the
    mid-stream start every backfill store uses."""
    _, outdir = stream
    rep = Replayer(spark, outdir, str(tmp_path_factory.mktemp("scratch")))
    files = rep.pending_files()
    k = max(1, len(files) // 2)
    assert k + N_CHUNKS <= len(files), "need phase-2 segments per chunk"
    rep.run_batch(files[:k])
    return files, k, rep.ledger.last()


def _state(rep):
    return rep.read_state().orderBy("conv_id", "turn_idx").toPandas()


def _drive_backfill(spark, txns, outdir, files, k, entry, store,
                    skip_done=False):
    """The documented protocol: per chunk, record the low watermark, read
    the chunk from the (advancing) source, consume the stream past the
    read point, then apply the chunk."""
    rep = Replayer(
        spark, outdir, store, start=FromPosition(entry.max_file, entry.max_pos)
    )
    phase2 = files[k:]
    plan = [
        phase2[(i * len(phase2)) // N_CHUNKS:((i + 1) * len(phase2)) // N_CHUNKS]
        for i in range(N_CHUNKS)
    ]
    for i, grp in enumerate(plan):
        if skip_done and i in rep.completed_chunks():
            continue
        low = rep.backfill_watermark()
        consumed_files = k + sum(len(g) for g in plan[: i + 1])
        # source has advanced at least to the end of this group's files
        chunk = _chunk_pd(txns, consumed_files * TXNS_PER_FILE, i)
        if grp:
            rep.run_batch(grp)
        rep.snapshot_chunk(spark.createDataFrame(chunk), low, chunk_id=i)
    rep.replay()  # drain any remainder
    return rep


def test_backfill_converges_to_full_replay(
    spark, stream, split, full_state, tmp_path
):
    txns, outdir = stream
    files, k, entry = split
    rep = _drive_backfill(
        spark, txns, outdir, files, k, entry, str(tmp_path / "s")
    )
    got = _state(rep)
    assert got.reset_index(drop=True).equals(full_state.reset_index(drop=True))
    # non-vacuous: the backfill actually inserted phase-1-only rows
    backfilled = sum(
        e.metrics.get("backfill_rows", 0) for e in rep.ledger.entries()
        if e.metrics and "backfill_chunk" in e.metrics
    )
    assert backfilled > 0


def test_backfill_resume_skips_completed_chunks(
    spark, stream, split, full_state, tmp_path
):
    """Crash after chunk 0: a fresh Replayer on the same store reports the
    committed chunk and the remaining chunks converge identically."""
    txns, outdir = stream
    files, k, entry = split
    store = str(tmp_path / "s")
    rep = Replayer(
        spark, outdir, store, start=FromPosition(entry.max_file, entry.max_pos)
    )
    phase2 = files[k:]
    grp0 = phase2[: len(phase2) // N_CHUNKS]
    low = rep.backfill_watermark()
    chunk0 = _chunk_pd(txns, (k + len(grp0)) * TXNS_PER_FILE, 0)
    rep.run_batch(grp0)
    rep.snapshot_chunk(spark.createDataFrame(chunk0), low, chunk_id=0)
    del rep  # "crash"

    rep2 = Replayer(spark, outdir, store)
    assert rep2.completed_chunks() == {0}
    # finish: chunks 1..n over the remaining files
    consumed = k + len(grp0)
    rest = phase2[len(grp0):]
    for i in range(1, N_CHUNKS):
        grp = rest[((i - 1) * len(rest)) // (N_CHUNKS - 1):(i * len(rest)) // (N_CHUNKS - 1)]
        low = rep2.backfill_watermark()
        consumed += len(grp)
        chunk = _chunk_pd(txns, consumed * TXNS_PER_FILE, i)
        if grp:
            rep2.run_batch(grp)
        rep2.snapshot_chunk(spark.createDataFrame(chunk), low, chunk_id=i)
    rep2.replay()
    got = _state(rep2)
    assert got.reset_index(drop=True).equals(full_state.reset_index(drop=True))


def test_backfill_does_not_resurrect_deleted_rows(spark, tmp_path):
    """The DBLog dedup window, surgically: key K exists in phase 1, the
    chunk is read while K is still live, then a phase-2 DELETE applies
    inside the (low, high] window. The store never held K, so the delete
    leaves no state trace — only the event-window scan can void K's
    chunk row. Without it, K would be resurrected."""
    t = 1_700_000_000_000
    txns = [
        Txn(seq=1, ops=[Op("insert", None,
            _row("keep", 0, "user", "stays", t, None, True))],
            evolved=True, timestamp=t // 1000),
        Txn(seq=2, ops=[Op("insert", None,
            _row("gone", 0, "user", "doomed", t + 1, None, True))],
            evolved=True, timestamp=t // 1000),
        # ---- phase 2 (after the mid-stream start) ----
        Txn(seq=3, ops=[Op("delete",
            _row("gone", 0, "user", "doomed", t + 1, None, True), None)],
            evolved=True, timestamp=t // 1000 + 10),
        Txn(seq=4, ops=[Op("insert", None,
            _row("new", 0, "user", "live row", t + 2, None, True))],
            evolved=True, timestamp=t // 1000 + 11),
    ]
    outdir = str(tmp_path / "binlog")
    write_binlog_files(txns, outdir, txns_per_file=2)  # file1=p1, file2=p2

    # phase-1 position from a scratch replay of file 1
    scratch = Replayer(spark, outdir, str(tmp_path / "scratch"))
    files = scratch.pending_files()
    scratch.run_batch(files[:1])
    entry = scratch.ledger.last()

    rep = Replayer(spark, outdir, str(tmp_path / "s"),
                   start=FromPosition(entry.max_file, entry.max_pos))
    low = rep.backfill_watermark()
    # chunk read BEFORE the delete reached the source: contains 'gone'
    chunk = apply_changelog_oracle(txns[:2])
    assert set(chunk["conv_id"]) == {"keep", "gone"}
    rep.run_batch(files[1:])  # the delete applies inside the window
    rep.snapshot_chunk(spark.createDataFrame(chunk), low, chunk_id=0)

    got = _state(rep)
    assert set(got["conv_id"]) == {"keep", "new"}  # no resurrection
    assert got[got["conv_id"] == "keep"]["text"].iloc[0] == "stays"


def test_backfill_chunk_is_idempotent(spark, stream, split, tmp_path):
    """Re-running a committed chunk (crash between merge and the caller's
    own bookkeeping) inserts nothing new."""
    txns, outdir = stream
    files, k, entry = split
    rep = Replayer(
        spark, outdir, str(tmp_path / "s"),
        start=FromPosition(entry.max_file, entry.max_pos),
    )
    low = rep.backfill_watermark()
    chunk = _chunk_pd(txns, k * TXNS_PER_FILE, 1)
    rep.snapshot_chunk(spark.createDataFrame(chunk), low, chunk_id=1)
    before = _state(rep)
    rep.snapshot_chunk(spark.createDataFrame(chunk), low, chunk_id=1)
    assert _state(rep).equals(before)
    last = rep.ledger.last()
    assert last.metrics["backfill_rows"] == 0


def test_backfill_watermark_requires_live_store(spark, stream, tmp_path):
    _, outdir = stream
    rep = Replayer(spark, outdir, str(tmp_path / "s"))
    with pytest.raises(ValueError, match="bootstrap"):
        rep.backfill_watermark()
