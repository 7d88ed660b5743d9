"""Source-failover replay (fixtures ``failover=`` + ts-led order_cols).

Mid-stream the primary is replaced by a new server: a fresh GTID
source_id whose sequence restarts at 1, so the takeover's newer writes
carry SMALLER sequence numbers than the old primary's. Cross-source
sequences are not mutually ordered (pipeline/order.py module doc) —
these tests pin that (a) the default gtid_seq-led order really does
resolve contended keys wrongly on such a stream (the documented hazard),
(b) the timestamp-led ``order_cols`` override reproduces the sequential
oracle exactly, and (c) the ledger keeps exactly-once per source_id
across batches and resume.
"""

from __future__ import annotations

import pandas as pd
import pytest

from mysql_cdc_spark.fixtures import (
    SOURCE_UUID,
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.replay import Replayer

FAILOVER_AT = 12
NEW_UUID = "bbbbbbbb-2c16-11e6-a073-0242ac110002"
TS_ORDER = ["after_ts", "gtid_seq", "pos", "row_in_event"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    # upsert-only: ts-led ordering is defined for streams whose every
    # event carries an app timestamp in its after image; hot-share 1.0
    # maximizes cross-source same-key contention
    txns = generate_changelog(
        n_conversations=8, max_turns=4, n_extra_ops=20, seed=23,
        delete_ratio=0.0, hot_conversations=2, hot_share=1.0,
        duplicate_txns=2,
    )
    d = tmp_path_factory.mktemp("failover") / "binlog"
    write_binlog_files(
        txns, str(d), txns_per_file=8, failover=(FAILOVER_AT, NEW_UUID)
    )
    return txns, str(d)


def _state(spark, tmp_path, binlog_dir, **kw) -> pd.DataFrame:
    rep = Replayer(spark, binlog_dir, str(tmp_path / "store"), **kw)
    rep.replay(files_per_batch=2)
    return (
        rep.read_state()
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )


def test_ts_led_order_matches_sequential_oracle(spark, tmp_path, corpus):
    txns, binlog_dir = corpus
    got = _state(spark, tmp_path, binlog_dir, order_cols=TS_ORDER)
    want = apply_changelog_oracle(txns)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
    assert got["text"].tolist() == want["text"].tolist()


def test_default_order_is_wrong_on_failover_stream(spark, tmp_path, corpus):
    """The hazard is real: gtid_seq-led order resolves at least one
    contended key to the old primary's stale write (if this ever starts
    passing with equal states, the corpus stopped discriminating —
    regenerate with more post-failover contention)."""
    txns, binlog_dir = corpus
    got = _state(spark, tmp_path, binlog_dir)  # default order_cols
    want = apply_changelog_oracle(txns)
    assert got["text"].tolist() != want["text"].tolist()


def test_ledger_records_both_sources(spark, tmp_path, corpus):
    txns, binlog_dir = corpus
    rep = Replayer(
        spark, binlog_dir, str(tmp_path / "store"), order_cols=TS_ORDER
    )
    rep.replay(files_per_batch=2)
    covered = rep.ledger.covered_gtid_set()
    text = str(covered)
    assert SOURCE_UUID in text
    assert NEW_UUID in text
    # rebased takeover sequences restart at 1 under the new source_id
    max_seq = max(t.seq for t in txns)
    assert f"{NEW_UUID}:1-{max_seq - FAILOVER_AT}" in text


def test_resume_after_failover_is_exact(spark, tmp_path, corpus):
    """Kill/resume across the takeover boundary: replay one file, then a
    fresh Replayer on the same store finishes the stream — final state
    still equals the oracle (per-source covered-set anti-join)."""
    txns, binlog_dir = corpus
    store = str(tmp_path / "store")
    first = Replayer(spark, binlog_dir, store, order_cols=TS_ORDER)
    pend = first.pending_files()
    first.run_batch(pend[:1])
    resumed = Replayer(spark, binlog_dir, store, order_cols=TS_ORDER)
    resumed.replay()
    got = (
        resumed.read_state().orderBy("conv_id", "turn_idx").toPandas()
    )
    want = apply_changelog_oracle(txns)
    assert got["text"].tolist() == want["text"].tolist()
