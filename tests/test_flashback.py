"""Replayer.flashback: point-in-time rewind of the live table to any
committed batch's state, as a NEW commit (Iceberg RESTORE semantics; the
snapshot-store analog of MariaDB ``mysqlbinlog --flashback`` event
inversion — computed here from versioned snapshots via a reversed
``snapshot_diff`` instead of per-event byte inversion).

Invariants pinned:
- the restored state is exactly the target batch's state (oracle: the
  sequential pandas replay of the prefix of transactions that batch
  covered);
- the rewind is a change-feed commit — ``read_changes`` across it yields
  the inverse rows, and the diff against the restored snapshot is empty;
- the ledger's read position is untouched: nothing becomes pending, so a
  resume never re-applies the rewound history;
- flashing back to the current commit is a no-op (no new version, no
  ledger entry);
- Ordered* streaming sinks refuse (their outrank guard would reject the
  deliberately-stale images).
"""

import pytest

from mysql_cdc_spark.fixtures import (
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.replay import Replayer


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    txns = generate_changelog(
        n_conversations=20, max_turns=6, n_extra_ops=80, seed=33,
        duplicate_txns=3, evolve_after_frac=0.6,
    )
    outdir = str(tmp_path_factory.mktemp("binlog"))
    write_binlog_files(txns, outdir, txns_per_file=20)
    return txns, outdir


def _replayed(spark, corpus, tmp_path, **kw):
    txns, outdir = corpus
    rep = Replayer(spark, outdir, str(tmp_path / "store"), **kw)
    rep.replay(files_per_batch=1)
    return rep


def test_flashback_restores_batch_state(spark, corpus, tmp_path):
    txns, _ = corpus
    rep = _replayed(spark, corpus, tmp_path)
    entries = [e for e in rep.ledger.entries()]
    assert len(entries) >= 3, "corpus should replay in several batches"
    target = entries[1]  # second batch: non-trivial prefix
    new_version = rep.flashback(target.batch_id)
    assert new_version > entries[-1].snapshot_version

    got = rep.read_state().orderBy("conv_id", "turn_idx").toPandas()
    # oracle: sequential replay of exactly the transactions the first two
    # files delivered (files chunk txns in delivery order, 20 per file)
    oracle = apply_changelog_oracle(txns[: 2 * 20])
    assert got["conv_id"].tolist() == oracle["conv_id"].tolist()
    assert got["turn_idx"].tolist() == oracle["turn_idx"].tolist()
    assert got["text"].tolist() == oracle["text"].tolist()
    assert got["role"].tolist() == oracle["role"].tolist()

    # byte-identical to the retained snapshot, via the diff itself
    assert (
        rep.read_changes(from_batch=target.batch_id, to_batch=None).count()
        == 0
    )

    # the rewind is itself a ledger commit with lineage metadata
    last = rep.ledger.last()
    assert last.metrics.get("maintenance") == "flashback"
    assert last.metrics.get("to_batch") == target.batch_id

    # stream position untouched: a resumed Replayer on the same store
    # re-applies nothing (flashback rewinds the table, not the stream)
    txns_, outdir = corpus
    rep2 = Replayer(spark, outdir, str(tmp_path / "store"))
    rep2.replay()
    after = rep2.read_state().orderBy("conv_id", "turn_idx").toPandas()
    assert after["text"].tolist() == oracle["text"].tolist()


def test_flashback_is_visible_in_change_feed(spark, corpus, tmp_path):
    rep = _replayed(spark, corpus, tmp_path)
    entries = [e for e in rep.ledger.entries()]
    first, last_replay = entries[0], entries[-1]
    rep.flashback(first.batch_id)
    # downstream consumer that had seen everything up to last_replay now
    # pulls the inverse rows as ordinary changes
    feed = rep.read_changes(from_batch=last_replay.batch_id).toPandas()
    assert len(feed) > 0
    assert set(feed["change_type"]).issubset({"insert", "update", "delete"})
    # and folding them lands exactly on the restored state
    assert (
        rep.read_changes(from_batch=first.batch_id, to_batch=None).count()
        == 0
    )


def test_flashback_delta_folds_into_ivm_views(spark, corpus, tmp_path):
    """A registered MaterializedAggView stays equal to a full GROUP BY
    recompute across a flashback — the rewind's inverse rows delta-fold
    like any batch's change feed."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mysql_cdc_spark.pipeline.ivm import MaterializedAggView

    txns, outdir = corpus
    view = MaterializedAggView(
        str(tmp_path / "view"), ["role"], {"total_chars": "length(text)"}
    )
    rep = Replayer(spark, outdir, str(tmp_path / "store"), views=[view])
    rep.replay(files_per_batch=2)
    first = next(iter(rep.ledger.entries())).batch_id
    rep.flashback(first)

    got = view.read(spark).toPandas().sort_values("role").reset_index(drop=True)
    want = (
        rep.read_state()
        .groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr("length(text)")).alias("total_chars"),
        )
        .toPandas()
        .sort_values("role")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["role", "n_rows", "total_chars"]].astype(
            {"n_rows": "int64", "total_chars": "int64"}
        ),
        want.astype({"n_rows": "int64", "total_chars": "int64"}),
    )


def test_flashback_past_gc_horizon_fails_loudly(spark, corpus, tmp_path):
    """gc_keep bounds how far back a flashback reaches: the target
    snapshot's manifest is gone, so the rewind refuses instead of
    restoring a partial state."""
    txns, outdir = corpus
    rep = Replayer(spark, outdir, str(tmp_path / "store"), gc_keep=2)
    rep.replay(files_per_batch=1)
    first = next(iter(rep.ledger.entries())).batch_id
    with pytest.raises(Exception):
        rep.flashback(first)
    # the failed attempt committed nothing
    assert not (rep.ledger.last().metrics or {}).get("maintenance")


def test_flashback_to_current_is_noop(spark, corpus, tmp_path):
    rep = _replayed(spark, corpus, tmp_path)
    entries = [e for e in rep.ledger.entries()]
    n_before = len(entries)
    v = rep.flashback(entries[-1].batch_id)
    assert v == entries[-1].snapshot_version
    assert len([e for e in rep.ledger.entries()]) == n_before


def test_flashback_unknown_batch_raises(spark, corpus, tmp_path):
    rep = _replayed(spark, corpus, tmp_path)
    with pytest.raises(KeyError, match="no ledger entry"):
        rep.flashback(10_000)


def test_multi_table_flashback_is_position_consistent(spark, tmp_path):
    """MultiReplayer.flashback(file, pos): every table rewinds to the
    same source position — each final state equals its own oracle over
    exactly the transactions delivered up to that position."""
    from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS
    from mysql_cdc_spark.fixtures import apply_sidecar_oracle, tool_calls_spec
    from mysql_cdc_spark.pipeline.multi import MultiReplayer

    txns = generate_changelog(
        n_conversations=12, max_turns=5, n_extra_ops=40, seed=44,
        duplicate_txns=2, evolve_after_frac=None,
    )
    outdir = str(tmp_path / "binlog")
    write_binlog_files(txns, outdir, txns_per_file=20, sidecar=True)
    mr = MultiReplayer(
        spark, outdir, str(tmp_path / "multi"),
        specs=[TRANSCRIPTS, tool_calls_spec()],
    )
    mr.replay(files_per_batch=1)

    # transaction-boundary cut after both tables' second batch (per-table
    # positions are last-APPLIED-event coordinates, so inside a
    # multi-table transaction they differ — position_after_batch takes
    # the group max, which is past every table's share of the final
    # transaction)
    entries = [e for e in mr["transcripts"].ledger.entries()]
    assert len(entries) >= 3
    cut_file, cut_pos = mr.position_after_batch(2)
    versions = mr.flashback(cut_file, cut_pos)
    assert set(versions) == {"chat.transcripts", "chat.tool_calls"}

    t_got = (
        mr.read_state("transcripts").orderBy("conv_id", "turn_idx").toPandas()
    )
    t_want = apply_changelog_oracle(txns[: 2 * 20])
    assert t_got["text"].tolist() == t_want["text"].tolist()

    c_got = (
        mr.read_state("tool_calls")
        .orderBy("conv_id", "turn_idx", "call_ord")
        .toPandas()
    )
    c_want = apply_sidecar_oracle(txns[: 2 * 20])
    assert c_got["tool_name"].tolist() == c_want["tool_name"].tolist()
    assert c_got["duration_ms"].tolist() == c_want["duration_ms"].tolist()

    # a position before any commit refuses without touching any table
    with pytest.raises(KeyError, match="no commit at or before"):
        mr.flashback(entries[0].max_file, 0)


def test_flashback_refuses_ordered_target(spark, corpus, tmp_path):
    from mysql_cdc_spark.pipeline.target import OrderedBucketedMergeTarget

    txns, outdir = corpus
    store = str(tmp_path / "ostore")
    rep = Replayer(
        spark, outdir, store,
        target=OrderedBucketedMergeTarget(store, buckets=16),
    )
    rep.replay(files_per_batch=2)
    first = [e for e in rep.ledger.entries()][0]
    with pytest.raises(TypeError, match="outrank"):
        rep.flashback(first.batch_id)
