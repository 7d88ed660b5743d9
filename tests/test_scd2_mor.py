"""Scd2HistoryMorStore: SCD2 history on the merge-on-read layout.

Pins (a) history equality with the copy-on-write Scd2HistoryStore
across a full multi-batch replay with redelivered duplicates and
mid-stream schema evolution, (b) the append property — apply_batch
writes ONLY delta files, never rewriting stored history, (c) compaction
preserves history and clears chains (run through Replayer.compact so
both the state and history stores fold on one maintenance call), (d)
idempotent batch replay on the delta layout, and (e) the purge path
erases a key's history rows and files.
"""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS
from mysql_cdc_spark.fixtures import (
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.mor import MergeOnReadBucketedTarget
from mysql_cdc_spark.pipeline.replay import Replayer
from mysql_cdc_spark.pipeline.scd2 import Scd2HistoryMorStore, Scd2HistoryStore

SORT = ["conv_id", "turn_idx", "version"]


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    txns = generate_changelog(
        n_conversations=25,
        max_turns=6,
        n_extra_ops=100,
        seed=19,
        evolve_after_frac=0.5,
        duplicate_txns=4,
        delete_ratio=0.1,
    )
    outdir = str(tmp_path_factory.mktemp("binlog_scd2mor"))
    write_binlog_files(txns, outdir, txns_per_file=30)
    return txns, outdir


def _hist_pdf(store, spark) -> pd.DataFrame:
    return (
        store.read_history(spark)
        .toPandas()
        .sort_values(SORT)
        .reset_index(drop=True)
    )


class TestEquality:
    def test_history_matches_cow_store(self, spark, changelog, tmp_path):
        _, outdir = changelog
        cow_h = Scd2HistoryStore(str(tmp_path / "cow_h"), TRANSCRIPTS, buckets=8)
        cow = Replayer(spark, outdir, str(tmp_path / "cow"), history=cow_h)
        cow.replay(files_per_batch=1)
        mor_h = Scd2HistoryMorStore(str(tmp_path / "mor_h"), TRANSCRIPTS, buckets=8)
        mor = Replayer(spark, outdir, str(tmp_path / "mor"), history=mor_h)
        mor.replay(files_per_batch=1)
        a, b = _hist_pdf(cow_h, spark), _hist_pdf(mor_h, spark)
        pd.testing.assert_frame_equal(a, b)
        assert len(b) > 0
        assert (~b["is_current"]).any()  # real closes happened

    def test_batch_replay_idempotent(self, spark, changelog, tmp_path):
        _, outdir = changelog
        h = Scd2HistoryMorStore(str(tmp_path / "h"), TRANSCRIPTS, buckets=8)
        rep = Replayer(spark, outdir, str(tmp_path / "s"), history=h)
        files = rep.pending_files()
        rep.run_batch(files[:1])
        before = _hist_pdf(h, spark)
        # crash-window replay: the same decoded batch applied again
        from mysql_cdc_spark.binlog.decoder import decode_binlog_dir
        from mysql_cdc_spark.pipeline.order import (
            gate_complete_transactions,
            with_change_key,
        )

        changes = with_change_key(
            gate_complete_transactions(
                decode_binlog_dir(
                    spark, outdir, TRANSCRIPTS, path_filter=files[0]
                )
            ),
            list(TRANSCRIPTS.primary_key),
        )
        h.apply_batch(spark, changes, h.current_version())
        after = _hist_pdf(h, spark)
        pd.testing.assert_frame_equal(before, after)


class TestAppendProperty:
    def test_apply_writes_only_deltas(self, spark, changelog, tmp_path):
        _, outdir = changelog
        h = Scd2HistoryMorStore(str(tmp_path / "h"), TRANSCRIPTS, buckets=8)
        rep = Replayer(spark, outdir, str(tmp_path / "s"), history=h)
        rep.replay(files_per_batch=1)
        snaps_root = os.path.join(str(tmp_path / "h"), "snapshots")
        for name in sorted(os.listdir(snaps_root)):
            assert not os.path.exists(os.path.join(snaps_root, name, "data")), (
                f"history {name} rewrote base data — not append-shaped"
            )
        assert sum(h.delta_stats(h.current_version()).values()) > 0


class TestMaintenance:
    def test_replayer_compact_folds_both_stores(self, spark, changelog, tmp_path):
        _, outdir = changelog
        store = str(tmp_path / "s")
        h = Scd2HistoryMorStore(str(tmp_path / "h"), TRANSCRIPTS, buckets=8)
        rep = Replayer(
            spark, outdir, store, history=h,
            target=MergeOnReadBucketedTarget(store, buckets=8),
        )
        rep.replay(files_per_batch=1)
        before = _hist_pdf(h, spark)
        assert sum(h.delta_stats(h.current_version()).values()) > 0
        rep.compact(min_deltas=1)
        assert all(n == 0 for n in h.delta_stats(h.current_version()).values())
        after = _hist_pdf(h, spark)
        pd.testing.assert_frame_equal(before, after)

    def test_purge_erases_history_rows_and_files(self, spark, changelog, tmp_path):
        _, outdir = changelog
        hdir = str(tmp_path / "h")
        h = Scd2HistoryMorStore(hdir, TRANSCRIPTS, buckets=8)
        rep = Replayer(spark, outdir, str(tmp_path / "s"), history=h)
        rep.replay(files_per_batch=2)
        pre = _hist_pdf(h, spark)
        victim = pre["conv_id"].iloc[0]
        rep.purge_keys(f"conv_id = '{victim}'")
        post = _hist_pdf(h, spark)
        assert victim not in set(post["conv_id"])
        assert set(post["conv_id"]) == set(pre["conv_id"]) - {victim}
        retained = set()
        for path in glob.glob(os.path.join(hdir, "**", "*.parquet"), recursive=True):
            t = pq.read_table(path)
            if "conv_id" in t.column_names:
                retained.update(t.column("conv_id").to_pylist())
        assert victim not in retained
