"""Corpus-curation operators: repetition quality, decontamination,
near-dup connected components — plan shape + semantics + DuckDB parity."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from mysql_cdc_spark.analytics import corpus

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestPlans:
    def test_repetition_is_pure_two_level_aggregate(self, spark):
        plan = _plan(corpus.text_repetition(spark, SF))
        assert "Join" not in plan and "Window" not in plan
        # map-side combine on the per-gram count before its exchange
        assert "partial_count" in plan

    def test_contamination_broadcasts_the_eval_set(self, spark):
        plan = _plan(corpus.contamination_check(spark, SF))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # only the text column feeds the shingle pipeline
        assert "ReadSchema" in plan and "source" not in plan


class TestMixtureAndPacking:
    def test_mixture_is_zero_exchange_scan(self, spark):
        plan = _plan(corpus.doc_mixture_sample(spark, SF))
        assert "Exchange" not in plan

    def test_mixture_rates_approximate_targets(self, spark):
        out = corpus.doc_mixture_sample(spark, SF).toPandas()
        docs = pd.read_parquet(f"{SF}/documents.parquet")
        kept = out.groupby("lang").size()
        total = docs.groupby("lang").size()
        en_rate = kept.get("en", 0) / total["en"]
        assert 0.75 <= en_rate <= 1.0  # target 0.9, small-sample slack
        # weight is exactly 1/rate for every kept row
        assert set(out[out.lang == "en"]["weight"]) == {round(1 / 0.9, 4)}

    def test_packing_bins_are_sequential_and_bounded(self, spark):
        out = corpus.doc_pack_sequences(spark, SF).toPandas()
        assert (out["bin_tokens"] > 0).all()
        # per (lang, shard): bin ids start at 0 with no gaps
        for (_, _), g in out.groupby(["lang", "shard"]):
            ids = sorted(g["bin_id"])
            assert ids == list(range(len(ids)))


class TestConnectedComponents:
    def test_path_graph_converges_past_one_hop(self, spark):
        # diameter-4 path: one propagation round is NOT enough, so this
        # pins the fixpoint loop, plus a disjoint pair for isolation
        pairs = spark.createDataFrame(
            [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11)], ["doc_a", "doc_b"]
        )
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in corpus.connected_components(pairs).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}

    def test_cluster_id_is_component_min(self, spark):
        out = corpus.dedup_clusters(spark, SF).toPandas()
        if out.empty:
            pytest.skip("no near-dup pairs at this SF")
        per = out.groupby("cluster_id")
        assert (per["doc_id"].min() == per["cluster_id"].first()).all()
        assert (per["doc_id"].size() == per["cluster_size"].first()).all()


class TestOracleParity:
    @pytest.mark.parametrize(
        "name",
        [
            "text_repetition",
            "contamination_check",
            "dedup_clusters",
            "doc_mixture_sample",
            "doc_pack_sequences",
        ],
    )
    def test_matches_duckdb(self, spark, name):
        got = _norm(corpus.QUERIES[name](spark, SF).toPandas())
        want = _norm(_oracle(corpus.ORACLES[name]))
        assert len(got) > 0, "vacuous oracle: query returned no rows"
        pd.testing.assert_frame_equal(got, want)
