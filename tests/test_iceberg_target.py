"""IcebergMergeTarget SQL generation (S7 + schema evolution DDL).

The sandbox has no Iceberg runtime jar, so the real MERGE path can't
execute here; these tests pin the exact SQL the sink would issue — the
part that is ours (the MERGE itself is Iceberg's, SURVEY.md §4) — via a
capture double standing in for the SparkSession."""

from __future__ import annotations

from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS
from mysql_cdc_spark.pipeline.target import IcebergMergeTarget


class _CaptureSpark:
    def __init__(self, existing_columns=("conv_id", "turn_idx")):
        self.sqls: list[str] = []
        self._existing = existing_columns

    def sql(self, text: str):
        self.sqls.append(" ".join(text.split()))

    def table(self, _identifier):
        import types

        fields = [types.SimpleNamespace(name=n) for n in self._existing]
        return types.SimpleNamespace(schema=types.SimpleNamespace(fields=fields))


class _FakeNet:
    def createOrReplaceTempView(self, name):
        self.view = name


def test_create_table_ddl():
    spark = _CaptureSpark()
    tgt = IcebergMergeTarget("cdc.chat.transcripts", TRANSCRIPTS)
    tgt.ensure_table(spark)
    [ddl] = spark.sqls
    assert "CREATE TABLE IF NOT EXISTS cdc.chat.transcripts" in ddl
    assert "conv_id string" in ddl and "tool string" in ddl
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (bucket(64, conv_id))" in ddl


def test_additive_evolution_ddl_only_for_new_columns():
    spark = _CaptureSpark(existing_columns=("conv_id", "turn_idx", "role", "text", "ts"))
    tgt = IcebergMergeTarget("cdc.chat.transcripts", TRANSCRIPTS)
    # TABLE_MAP announced the evolved 6-column shape → only `tool` is added
    tgt.ensure_columns(spark, ["conv_id", "turn_idx", "role", "text", "ts", "tool"])
    assert spark.sqls == [
        "ALTER TABLE cdc.chat.transcripts ADD COLUMN tool string"
    ]


def test_merge_statement_shape():
    spark = _CaptureSpark()
    tgt = IcebergMergeTarget("cdc.chat.transcripts", TRANSCRIPTS)
    tgt.merge(spark, _FakeNet(), current_version=3)
    [merge] = spark.sqls
    assert "MERGE INTO cdc.chat.transcripts t USING _cdc_net s" in merge
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in merge
    assert "WHEN MATCHED AND s.op = 'delete' THEN DELETE" in merge
    assert "t.text = s.after_text" in merge
    assert "WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT" in merge
    # key columns insert from the coalesced key, payload from after-image
    assert "VALUES (conv_id, turn_idx, after_role, after_text, after_tool, after_ts)" in merge


def test_merge_partial_statement_shape():
    """MINIMAL-image MERGE: per-column carried_mask CASE in each SET
    clause (the SQL form of the parquet target's per-column apply)."""
    spark = _CaptureSpark()
    tgt = IcebergMergeTarget("cdc.chat.transcripts", TRANSCRIPTS)
    tgt.merge_partial(spark, _FakeNet(), current_version=3)
    [merge] = spark.sqls
    assert "MERGE INTO cdc.chat.transcripts t USING _cdc_net s" in merge
    assert "WHEN MATCHED AND s.op = 'delete' THEN DELETE" in merge
    # text is canonical column index 3 → bit 3 guards its SET clause
    assert (
        "t.text = CASE WHEN (s.carried_mask >> 3) & 1 = 1 "
        "THEN s.after_text ELSE t.text END" in merge
    )
    assert "WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT" in merge


def test_internal_commit_target_merge_deferred_until_stats(tmp_path, spark):
    """A target without a rollback handle (no snapshot_path — the Iceberg
    shape) must not have merge() invoked for an empty batch: the replay
    driver defers its merge until the stats pass confirms events. A
    snapshot target would instead overlap and roll back."""
    from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS
    from mysql_cdc_spark.fixtures import generate_changelog, write_binlog_files
    from mysql_cdc_spark.pipeline.replay import Replayer
    from mysql_cdc_spark.pipeline.target import ParquetMergeTarget

    class InternalCommitTarget:
        """Delegates to a parquet target but hides snapshot_path, like a
        sink whose MERGE commits inside the engine."""

        def __init__(self, store_dir):
            self._inner = ParquetMergeTarget(store_dir, TRANSCRIPTS, buckets=2)
            self.merge_calls = 0

        def merge(self, spark, net, current_version):
            self.merge_calls += 1
            return self._inner.merge(spark, net, current_version)

        def read(self, spark, version):
            return self._inner.read(spark, version)

    txns = generate_changelog(n_conversations=6, max_turns=3, n_extra_ops=10, seed=41)
    outdir = str(tmp_path / "binlog")
    write_binlog_files(txns, outdir, txns_per_file=len(txns))

    tgt = InternalCommitTarget(str(tmp_path / "store"))
    rep = Replayer(spark, outdir, str(tmp_path / "store"), target=tgt)
    rep.replay()
    assert tgt.merge_calls == 1

    # fully replayed: the second pass sees an empty batch — merge() must
    # not run at all (no Iceberg commit to roll back)
    rep2 = Replayer(spark, outdir, str(tmp_path / "store"), target=tgt)
    rep2.replay()
    assert tgt.merge_calls == 1
