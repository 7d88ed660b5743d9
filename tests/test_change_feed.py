"""Change-data-feed reads (``target.snapshot_diff`` / ``read_changes``).

The read-side twin of MERGE: consumers pull the net row-level changes
between two committed batches instead of rescanning state. Pinned here:

- algebra: state(b1) ⊕ read_changes(b1, b2) == state(b2) for every
  consecutive committed batch pair (⊕ = delete-then-upsert apply);
- the full-history feed from the empty table is exactly the final state
  as inserts;
- the bucketed target's manifest-pruned feed equals the plain target's
  full-diff feed, and actually prunes (scans fewer buckets than exist).
"""

from __future__ import annotations

import pandas as pd
import pytest

from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS
from mysql_cdc_spark.fixtures import generate_changelog, write_binlog_files
from mysql_cdc_spark.pipeline.replay import Replayer
from mysql_cdc_spark.pipeline.target import BucketedParquetMergeTarget

KEY = list(TRANSCRIPTS.primary_key)


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    txns = generate_changelog(
        n_conversations=30,
        max_turns=6,
        n_extra_ops=120,
        seed=11,
        duplicate_txns=3,
    )
    outdir = str(tmp_path_factory.mktemp("binlog_cdf"))
    write_binlog_files(txns, outdir, txns_per_file=30)
    return outdir


@pytest.fixture(scope="module")
def replayed(spark, changelog, tmp_path_factory):
    rep = Replayer(spark, changelog, str(tmp_path_factory.mktemp("store_cdf")))
    result = rep.replay(files_per_batch=1)
    batch_ids = [b.batch_id for b in result.batches if b.events > 0]
    assert len(batch_ids) >= 3, "fixture must commit multiple batches"
    return rep, batch_ids


def _pdf(df) -> pd.DataFrame:
    return (
        df.toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )


def _apply(state_pdf: pd.DataFrame, changes_pdf: pd.DataFrame) -> pd.DataFrame:
    """Delete-then-upsert apply of a change feed onto a state snapshot."""
    touched = changes_pdf[KEY]
    merged = state_pdf.merge(touched, on=KEY, how="left", indicator=True)
    survivors = state_pdf[merged["_merge"] == "left_only"]
    upserts = changes_pdf[changes_pdf["change_type"] != "delete"].drop(
        columns=["change_type"]
    )
    return (
        pd.concat([survivors, upserts], ignore_index=True)
        .sort_values(KEY)
        .reset_index(drop=True)
    )


def test_full_history_feed_is_state_as_inserts(spark, replayed):
    rep, _ = replayed
    feed = _pdf(rep.read_changes())
    assert set(feed["change_type"]) == {"insert"}
    state = _pdf(rep.read_state())
    pd.testing.assert_frame_equal(
        feed.drop(columns=["change_type"]), state, check_dtype=False
    )


def test_consecutive_batch_feeds_compose_to_next_state(spark, replayed):
    rep, batch_ids = replayed
    for b_from, b_to in zip(batch_ids, batch_ids[1:]):
        changes = _pdf(rep.read_changes(b_from, b_to))
        assert len(changes) > 0
        before = _pdf(rep.state_at_batch(b_from))
        after = _pdf(rep.state_at_batch(b_to))
        applied = _apply(before, changes)
        pd.testing.assert_frame_equal(
            applied[after.columns], after, check_dtype=False
        )


def test_feed_classifies_updates_not_just_inserts(spark, replayed):
    rep, batch_ids = replayed
    kinds = set()
    for b_from, b_to in zip(batch_ids, batch_ids[1:]):
        kinds |= set(
            r["change_type"]
            for r in rep.read_changes(b_from, b_to)
            .select("change_type")
            .distinct()
            .collect()
        )
    # the fixture's extra ops include updates and deletes of earlier rows
    assert "update" in kinds
    assert "insert" in kinds


def test_bucketed_feed_matches_plain_and_prunes(spark, tmp_path):
    # small final batch (10 txns/file) against 64 buckets so the manifest
    # diff is a strict subset — that's the property being pinned
    txns = generate_changelog(
        n_conversations=30, max_turns=6, n_extra_ops=120, seed=11,
        duplicate_txns=3,
    )
    changelog = str(tmp_path / "binlog_b")
    write_binlog_files(txns, changelog, txns_per_file=10)
    rep = Replayer(
        spark,
        changelog,
        str(tmp_path / "store_b"),
        target=BucketedParquetMergeTarget(
            str(tmp_path / "store_b"), buckets=64
        ),
    )
    result = rep.replay(files_per_batch=1)
    batch_ids = [b.batch_id for b in result.batches if b.events > 0]
    b_from, b_to = batch_ids[-2], batch_ids[-1]

    v_from = next(
        e.snapshot_version for e in rep.ledger.entries() if e.batch_id == b_from
    )
    v_to = next(
        e.snapshot_version for e in rep.ledger.entries() if e.batch_id == b_to
    )
    m_old = rep.target._load_manifest(v_from)
    m_new = rep.target._load_manifest(v_to)
    changed = {b for b in set(m_old) | set(m_new) if m_old.get(b) != m_new.get(b)}
    # pruning is real: the final single-file batch touches a strict subset
    assert 0 < len(changed) < len(m_new)

    pruned = _pdf(rep.read_changes(b_from, b_to))
    # ground truth: unpruned diff of the same two versions
    from mysql_cdc_spark.pipeline.target import snapshot_diff

    full = _pdf(
        snapshot_diff(
            rep.target.read(spark, v_from),
            rep.target.read(spark, v_to),
            TRANSCRIPTS,
        )
    )
    pd.testing.assert_frame_equal(pruned, full, check_dtype=False)
