"""Persisted target-family stamping (``target_family.json``).

A store must be REOPENED with the target family that wrote it; sniffing
manifest value shapes / parquet schemas cannot distinguish every case
(the canonical hole: a truncated merge-on-read store's empty ``{}``
manifest looks exactly like copy-on-write). Each family stamps the store
at commit time (last committing family wins — adoption re-stamps) and ``Replayer._detect_target`` /
``read_stream_state`` dispatch on the stamp, falling back to the legacy
sniff only for pre-stamp stores.
"""

import json
import os
from datetime import datetime

from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS
from mysql_cdc_spark.pipeline.mor import (
    MergeOnReadBucketedTarget,
    OrderedMergeOnReadTarget,
)
from mysql_cdc_spark.pipeline.replay import Replayer
from mysql_cdc_spark.pipeline.target import (
    BucketedParquetMergeTarget,
    OrderedBucketedMergeTarget,
    load_target_family,
    target_class_for_family,
)

TS = datetime(2024, 1, 1)

NET_SCHEMA = (
    "conv_id string, turn_idx int, op string, after_role string, "
    "after_text string, after_tool string, after_ts timestamp, "
    "gtid_seq long, pos long, row_in_event int"
)


def _net(spark, rows):
    return spark.createDataFrame(rows, NET_SCHEMA)


def _row(text="t", seq=1):
    return ("c", 0, "insert", "user", text, None, TS, seq, seq * 10, 0)


def test_first_commit_stamps_family(spark, tmp_path):
    for cls, family in [
        (BucketedParquetMergeTarget, "bucketed_cow"),
        (OrderedBucketedMergeTarget, "ordered_bucketed_cow"),
        (MergeOnReadBucketedTarget, "mor"),
        (OrderedMergeOnReadTarget, "ordered_mor"),
    ]:
        store = str(tmp_path / family)
        tgt = cls(store, TRANSCRIPTS, buckets=4)
        tgt.merge(spark, _net(spark, [_row()]), 0)
        assert load_target_family(store) == family
        assert target_class_for_family(family) is cls


def test_stamp_is_stable_for_same_family(spark, tmp_path):
    store = str(tmp_path / "st")
    tgt = MergeOnReadBucketedTarget(store, TRANSCRIPTS, buckets=4)
    v = tgt.merge(spark, _net(spark, [_row()]), 0)
    tgt.merge(spark, _net(spark, [_row("u", 2)]), v)
    assert load_target_family(store) == "mor"


def test_adoption_restamps_to_the_committing_family(spark, tmp_path):
    """A CoW-started store ADOPTED by a merge-on-read target (the
    documented str-entry manifest conversion) must re-stamp on the MoR
    commit — last committing family owns the store — so a later resume
    without explicit target= reopens it through the MoR loader (a stale
    CoW stamp would read the dict-valued manifest as paths)."""
    store = str(tmp_path / "st")
    cow = BucketedParquetMergeTarget(store, TRANSCRIPTS, buckets=4)
    v = cow.merge(spark, _net(spark, [_row("base", 1)]), 0)
    assert load_target_family(store) == "bucketed_cow"
    mor = MergeOnReadBucketedTarget(store, TRANSCRIPTS, buckets=4)
    v2 = mor.merge(spark, _net(spark, [_row("delta", 2)]), v)
    assert load_target_family(store) == "mor"
    picked = Replayer._detect_target(store, TRANSCRIPTS, spark)
    assert type(picked) is MergeOnReadBucketedTarget
    assert picked.read(spark, v2).toPandas()["text"].tolist() == ["delta"]


def test_truncated_mor_store_resumes_as_mor(spark, tmp_path):
    """The sniffing hole the stamp closes: an empty {} MoR manifest is
    indistinguishable from CoW by shape, so a truncated MoR store resumed
    without explicit target= used to continue as copy-on-write, breaking
    time travel over the earlier dict-manifest snapshots."""
    store = str(tmp_path / "st")
    tgt = MergeOnReadBucketedTarget(store, TRANSCRIPTS, buckets=4)
    v = tgt.merge(spark, _net(spark, [_row()]), 0)
    # metadata-only truncate: a fresh empty manifest commit
    tgt._write_meta(v + 1, {})
    with open(tgt._manifest_path(v + 1)) as f:
        assert json.load(f) == {}
    picked = Replayer._detect_target(store, TRANSCRIPTS, spark)
    assert type(picked) is MergeOnReadBucketedTarget
    # and the pre-truncate snapshot stays time-travel-readable
    assert picked.read(spark, v).count() == 1


def test_detect_prefers_stamp_over_sniff(spark, tmp_path):
    store = str(tmp_path / "st")
    tgt = OrderedMergeOnReadTarget(store, TRANSCRIPTS, buckets=4)
    tgt.merge(spark, _net(spark, [_row()]), 0)
    picked = Replayer._detect_target(store, TRANSCRIPTS, spark)
    assert type(picked) is OrderedMergeOnReadTarget


def test_legacy_store_without_stamp_still_sniffs(spark, tmp_path):
    """Stores written before stamping existed carry no marker — the
    layout sniff must still resolve them."""
    store = str(tmp_path / "st")
    tgt = MergeOnReadBucketedTarget(store, TRANSCRIPTS, buckets=4)
    tgt.merge(spark, _net(spark, [_row()]), 0)
    os.remove(os.path.join(store, "target_family.json"))
    picked = Replayer._detect_target(store, TRANSCRIPTS, spark)
    assert type(picked) is MergeOnReadBucketedTarget


def test_read_stream_state_dispatches_on_stamp(spark, tmp_path):
    from mysql_cdc_spark.streaming.stream import read_stream_state

    store = str(tmp_path / "st")
    tgt = OrderedMergeOnReadTarget(store, TRANSCRIPTS, buckets=4)
    v = tgt.merge(spark, _net(spark, [_row("hello", 5)]), 0)
    # mirror the stream layout: snapshots under <store>/snapshots/vNNNNNNNN
    got = read_stream_state(spark, store)
    assert got.count() == 1
    assert got.toPandas()["text"].tolist() == ["hello"]
    # truncate to an empty manifest: stamp keeps the MoR loader
    tgt._write_meta(v + 1, {})
    assert read_stream_state(spark, store).count() == 0
