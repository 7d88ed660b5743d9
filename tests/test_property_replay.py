"""Property-based replay correctness: for ANY generated changelog shape,
distributed replay must equal the sequential oracle (the reference's
consume-loop semantics). One shared Spark session; hypothesis drives the
generator knobs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_cdc_spark.fixtures import (
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.replay import Replayer


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_conversations=st.integers(min_value=1, max_value=25),
    n_extra_ops=st.integers(min_value=0, max_value=60),
    update_ratio=st.floats(min_value=0.0, max_value=0.8),
    delete_ratio=st.floats(min_value=0.0, max_value=0.2),
    duplicate_txns=st.integers(min_value=0, max_value=5),
    txns_per_file=st.integers(min_value=5, max_value=60),
    evolve=st.sampled_from([None, 0.0, 0.5, 1.0]),
    provider=st.sampled_from(["mysql", "mariadb"]),
    row_image=st.sampled_from(["full", "minimal"]),
)
def test_replay_equals_oracle(
    spark, tmp_path_factory, seed, n_conversations, n_extra_ops,
    update_ratio, delete_ratio, duplicate_txns, txns_per_file, evolve,
    provider, row_image,
):
    txns = generate_changelog(
        n_conversations=n_conversations,
        max_turns=5,
        n_extra_ops=n_extra_ops,
        seed=seed,
        update_ratio=update_ratio,
        delete_ratio=delete_ratio,
        duplicate_txns=duplicate_txns,
        evolve_after_frac=evolve,
    )
    work = tmp_path_factory.mktemp("prop")
    write_binlog_files(
        txns, str(work / "binlog"), txns_per_file=txns_per_file,
        provider=provider, row_image=row_image,
    )
    rep = Replayer(
        spark, str(work / "binlog"), str(work / "store"),
        row_image=row_image,
    )
    rep.replay(files_per_batch=2)
    got = (
        rep.read_state().orderBy("conv_id", "turn_idx").toPandas()
    )
    want = apply_changelog_oracle(txns)
    assert got["text"].tolist() == want["text"].tolist()
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()


class TestEdgeCases:
    def test_empty_binlog_dir(self, spark, tmp_path):
        import os

        binlog = tmp_path / "empty"
        os.makedirs(binlog)
        rep = Replayer(spark, str(binlog), str(tmp_path / "store"))
        res = rep.replay()
        assert res.events == 0
        assert rep.read_state().count() == 0

    def test_multi_source_union(self, spark, tmp_path):
        """Two GTID sources (separate replication origins shipping into one
        directory, disjoint key spaces): ledger must track both uuids;
        final state is the union of both oracles."""
        a = generate_changelog(n_conversations=8, n_extra_ops=15, seed=1)
        b = generate_changelog(n_conversations=8, n_extra_ops=15, seed=2)
        # source B's conversations renamed into a disjoint key space
        for t in b:
            for op in t.ops:
                for img in (op.before, op.after):
                    if img is not None:
                        img[0] = "src2-" + img[0]
        binlog = str(tmp_path / "binlog")
        write_binlog_files(a, binlog, txns_per_file=30, file_prefix="a-binlog")
        write_binlog_files(
            b, binlog, txns_per_file=30, file_prefix="b-binlog",
            source_uuid="ffffffff-2c16-11e6-a073-0242ac110002", server_id=2,
        )
        rep = Replayer(spark, binlog, str(tmp_path / "store"))
        res = rep.replay()
        assert res.events > 0
        got = rep.read_state().orderBy("conv_id", "turn_idx").toPandas()
        import pandas as pd

        oa, ob = apply_changelog_oracle(a), apply_changelog_oracle(b)
        ob["conv_id"] = "src2-" + ob["conv_id"]
        want = (
            pd.concat([oa, ob])
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert got["text"].tolist() == want["text"].tolist()
        # ledger carries both source uuids
        covered = rep.ledger.covered_gtid_set()
        assert len(covered.uuid_sets) == 2
