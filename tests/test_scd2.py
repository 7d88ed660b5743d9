"""SCD Type-2 history materialization (pipeline/order.py:scd2_history):
the audit-table sink mode over decoded binlog change rows. Bar: the
is_current slice must equal the last-writer-wins final state (deleted
keys absent), versions are contiguous, and a redelivered transaction
mints no duplicate version."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS, decode_binlog_dir
from mysql_cdc_spark.fixtures import (
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.order import (
    gate_complete_transactions,
    scd2_history,
    with_change_key,
)

KEYS = ["conv_id", "turn_idx"]
DEDUP = [*KEYS, "gtid_seq", "row_in_event"]


@pytest.fixture(scope="module")
def history(spark, tmp_path_factory):
    txns = generate_changelog(
        n_conversations=15, max_turns=4, n_extra_ops=50, seed=43,
        duplicate_txns=3,
    )
    outdir = str(tmp_path_factory.mktemp("binlog"))
    write_binlog_files(txns, outdir, txns_per_file=100)
    changes = gate_complete_transactions(
        decode_binlog_dir(spark, outdir, TRANSCRIPTS)
    )
    changes = with_change_key(changes, KEYS)
    hist = scd2_history(changes, KEYS, dedup_cols=DEDUP).cache()
    return txns, changes, hist


def test_current_slice_equals_lww_state(history):
    txns, _, hist = history
    cur = (
        hist.filter("is_current")
        .orderBy(*KEYS)
        .select(*KEYS, "text")
        .toPandas()
    )
    oracle = apply_changelog_oracle(txns)
    assert cur["text"].tolist() == oracle["text"].tolist()
    assert list(map(tuple, cur[KEYS].values)) == list(
        map(tuple, oracle[KEYS].values)
    )


def test_versions_contiguous_and_single_current(history):
    _, _, hist = history
    bad = (
        hist.groupBy(*KEYS)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("version").alias("vmax"),
            F.min("version").alias("vmin"),
            F.sum(F.col("is_current").cast("int")).alias("n_cur"),
        )
        .filter(
            (F.col("vmin") != 1)
            | (F.col("vmax") != F.col("n"))
            | (F.col("n_cur") > 1)
        )
    )
    assert bad.count() == 0


def test_deleted_key_closed_by_delete(history):
    txns, changes, hist = history
    # keys whose final change is a delete: no current version, and their
    # last version is flagged closed_by_delete
    from mysql_cdc_spark.pipeline.order import last_writer_wins

    final = last_writer_wins(
        changes.dropDuplicates(DEDUP), key_cols=KEYS, payload_cols=["op"]
    )
    deleted = final.filter("op = 'delete'")
    n_deleted = deleted.count()
    assert n_deleted > 0, "fixture must delete at least one key"
    joined = hist.join(deleted.select(*KEYS), on=KEYS, how="inner")
    assert joined.filter("is_current").count() == 0
    last_ver = joined.groupBy(*KEYS).agg(
        F.max_by("closed_by_delete", "version").alias("closed")
    )
    assert last_ver.filter(~F.col("closed")).count() == 0


def test_redelivery_mints_no_duplicate_version(history):
    _, changes, hist = history
    # the fixture redelivers 3 transactions: same gtid_seq, later pos.
    # version count per key must equal DISTINCT transaction-row identities,
    # not raw event count
    expected = (
        changes.filter("op != 'delete'")
        .dropDuplicates(DEDUP)
        .groupBy(*KEYS)
        .count()
    )
    got = hist.groupBy(*KEYS).count()
    diff = expected.join(got, on=KEYS).filter(
        expected["count"] != got["count"]
    )
    assert diff.count() == 0


VALUE_COLS = [n for n, _, _ in TRANSCRIPTS.columns if n not in KEYS]


def _sorted_hist(pdf):
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values([*KEYS, "version"])
        .reset_index(drop=True)
    )


def test_incremental_history_equals_oneshot(spark, tmp_path):
    """The incremental SCD2 sink (scd2.Scd2HistoryStore wired through
    Replayer(history=...)) applied over MULTIPLE batches must produce the
    exact table the one-shot scd2_history builds over the whole stream —
    closing previous current rows across batch boundaries and continuing
    version numbers."""
    from mysql_cdc_spark.pipeline.replay import Replayer
    from mysql_cdc_spark.pipeline.scd2 import Scd2HistoryStore

    txns = generate_changelog(
        n_conversations=12, max_turns=4, n_extra_ops=40, seed=77,
        duplicate_txns=2,
    )
    outdir = str(tmp_path / "binlog")
    write_binlog_files(txns, outdir, txns_per_file=15)
    store = Scd2HistoryStore(
        str(tmp_path / "hist"), TRANSCRIPTS, buckets=8,
        value_cols=VALUE_COLS, dedup_cols=DEDUP,
    )
    rep = Replayer(spark, outdir, str(tmp_path / "store"), history=store)
    pend = rep.pending_files()
    assert len(pend) >= 3, "need multiple batches to exercise the merge"
    rep.replay(files_per_batch=max(1, len(pend) // 3))

    inc = _sorted_hist(store.read_history(spark).toPandas())

    changes = with_change_key(
        gate_complete_transactions(decode_binlog_dir(spark, outdir, TRANSCRIPTS)),
        KEYS,
    )
    oneshot = _sorted_hist(
        scd2_history(
            changes, KEYS, value_cols=VALUE_COLS, dedup_cols=DEDUP
        ).toPandas()
    )
    import pandas as pd

    assert list(inc.columns) == list(oneshot.columns)
    assert len(inc) == len(oneshot)
    pd.testing.assert_frame_equal(inc, oneshot, check_dtype=False)


def test_incremental_history_batch_replay_is_noop(spark, tmp_path):
    """Crash between the history commit and the ledger append replays the
    batch: apply_batch must be idempotent (outrank guard + valid_from
    anti-join), not double-close or re-mint versions."""
    from mysql_cdc_spark.pipeline.scd2 import Scd2HistoryStore

    txns = generate_changelog(
        n_conversations=6, max_turns=3, n_extra_ops=15, seed=5,
    )
    outdir = str(tmp_path / "binlog")
    write_binlog_files(txns, outdir, txns_per_file=100)
    changes = with_change_key(
        gate_complete_transactions(decode_binlog_dir(spark, outdir, TRANSCRIPTS)),
        KEYS,
    )
    store = Scd2HistoryStore(
        str(tmp_path / "hist"), TRANSCRIPTS, buckets=4,
        value_cols=VALUE_COLS, dedup_cols=DEDUP,
    )
    v1 = store.apply_batch(spark, changes, 0)
    first = _sorted_hist(store.read(spark, v1).toPandas())
    v2 = store.apply_batch(spark, changes, v1)  # the replayed batch
    second = _sorted_hist(store.read(spark, v2).toPandas())
    import pandas as pd

    assert len(first) == len(second)
    pd.testing.assert_frame_equal(first, second, check_dtype=False)


def test_validity_chain(history):
    """valid_to of version v equals valid_from of version v+1 when the
    next change opened a version, or the closing delete's order."""
    _, _, hist = history
    from pyspark.sql.window import Window

    w = Window.partitionBy(*KEYS).orderBy("version")
    nxt = hist.withColumn("next_from", F.lead("valid_from_gtid_seq").over(w))
    # a closed-not-by-delete version's valid_to must be the next version's
    # valid_from
    broken = nxt.filter(
        (~F.col("is_current"))
        & (~F.col("closed_by_delete"))
        & (F.col("valid_to_gtid_seq") != F.col("next_from"))
    )
    assert broken.count() == 0
