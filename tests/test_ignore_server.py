"""Circular-replication guard (Replayer ignore_server_ids): foreign-origin
transactions are skipped while positions and GTID coverage advance."""

import pytest

from mysql_cdc_spark.fixtures import (
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.replay import Replayer

FOREIGN_ID = 77


def _corpus(tmp_path):
    txns = generate_changelog(
        n_conversations=10, n_extra_ops=25, seed=31, duplicate_txns=2
    )
    foreign = {t.seq for t in txns if t.seq % 5 == 0}
    write_binlog_files(
        txns,
        str(tmp_path / "binlog"),
        txns_per_file=15,
        server_id_by_seq={s: FOREIGN_ID for s in foreign},
    )
    return txns, foreign


def _texts(rep):
    return (
        rep.read_state()
        .orderBy("conv_id", "turn_idx")
        .toPandas()["text"]
        .tolist()
    )


def test_foreign_origin_txns_are_skipped(spark, tmp_path):
    txns, foreign = _corpus(tmp_path)
    rep = Replayer(
        spark, str(tmp_path / "binlog"), str(tmp_path / "store"),
        ignore_server_ids=(FOREIGN_ID,),
    )
    res = rep.replay()
    kept = [t for t in txns if t.seq not in foreign]
    oracle = apply_changelog_oracle(kept)
    assert _texts(rep) == oracle["text"].tolist()
    assert res.events > 0

    # skip-and-advance: coverage includes the skipped txns' GTIDs, so a
    # fresh consumer on the same store never re-applies them
    covered = rep.ledger.covered_gtid_set()
    max_covered = max(
        iv.end for us in covered.uuid_sets.values() for iv in us.intervals
    )
    assert max_covered >= max(t.seq for t in txns if t.seq in foreign)
    rep2 = Replayer(
        spark, str(tmp_path / "binlog"), str(tmp_path / "store"),
        ignore_server_ids=(FOREIGN_ID,),
    )
    rep2.replay()
    assert _texts(rep2) == oracle["text"].tolist()


def test_same_corpus_without_ignore_applies_everything(spark, tmp_path):
    txns, _ = _corpus(tmp_path)
    rep = Replayer(spark, str(tmp_path / "binlog"), str(tmp_path / "store"))
    rep.replay()
    oracle = apply_changelog_oracle(txns)
    assert _texts(rep) == oracle["text"].tolist()
