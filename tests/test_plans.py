"""Physical-plan regression tests: the scale-critical plan properties
documented in docs/PLANS.md must survive refactors — pushdown reaching
the scan, broadcasts staying broadcast, combine-enabled aggregates, and
the persisted IVF codebook being *read*, not retrained in-plan."""

from __future__ import annotations

import pytest

from mysql_cdc_spark.analytics import cdc_ops, embeddings, text

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_p3_filter_and_projection_pushed(spark):
    plan = _plan(cdc_ops.p3_event_filter(spark, SF))
    assert "PushedFilters" in plan
    assert "In(event_type" in plan
    assert "GreaterThan(value,5.0)" in plan
    # projection pruned: props (the widest column) never read
    assert "props" not in plan


def test_j1_dims_broadcast(spark):
    plan = _plan(cdc_ops.j1_dim_lookup_join(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_w1_lww_is_combine_enabled_aggregate(spark):
    plan = _plan(cdc_ops.w1_lww_last_event(spark, SF))
    assert "partial_max_by" in plan  # map-side combine before the shuffle
    assert "Window" not in plan  # the window formulation would sort all events


def test_knn_ivf_reads_persisted_codebook(spark):
    embeddings.build_codebook(spark, SF)
    plan = _plan(embeddings.knn_ivf(spark, SF))
    # the probe plan scans the codebook artifact and broadcasts it —
    # no centroid training (avg/posexplode over the corpus) subtree
    assert "ivf_codebook_" in plan
    assert "BroadcastExchange" in plan


def test_ivf_persisted_cache_is_bounded(spark):
    """Repeated IVF queries in one session must reuse ONE memoized
    persisted assignment per corpus, not stack persists that nothing
    unpersists (the leak would accumulate executor memory per query)."""
    def run_all():
        embeddings.knn_ivf(spark, SF).count()
        embeddings.knn_ivf_probe2(spark, SF).count()
        embeddings.embedding_neardup_ivf(spark, SF).count()

    run_all()
    n0 = spark.sparkContext._jsc.getPersistentRDDs().size()
    run_all()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == n0


def test_redact_is_zero_exchange_scan(spark):
    plan = _plan(text.text_redact_pii(spark, SF))
    assert "Exchange" not in plan
    assert "codegen id" in plan  # whole-stage codegen spans the project


def test_j3_asof_join_is_union_window_not_nested_loop(spark):
    plan = _plan(cdc_ops.j3_asof_join(spark, SF))
    # the composition keeps the as-of an exchange+sort, never a loop join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert plan.count("Exchange") <= 2  # one per union branch pre-AQE merge


def test_j4_range_join_is_bucketed_equijoin(spark):
    plan = _plan(cdc_ops.j4_range_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # equi-join on (user_id, bucket) with the range predicate post-filtered
    assert "bucket" in plan


def test_token_histogram_topk_without_global_sort(spark):
    plan = _plan(text.token_histogram(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "GlobalLimit" not in plan or "Sort " not in plan


def test_w5_scd2_single_sort_single_exchange(spark):
    plan = _plan(cdc_ops.w5_scd2_history(spark, SF))
    # row_number + both leads share one window spec: one Window over one
    # Sort over one Exchange; filter pushed to the scan
    assert plan.count("+- Exchange") == 1
    assert plan.count("+- Sort") == 1
    assert plan.count("+- Window") == 1
    assert "EqualTo(event_type,purchase)" in plan
