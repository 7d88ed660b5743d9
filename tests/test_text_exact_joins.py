"""Losslessness of the exact similarity joins' candidate pruning.

``ngram_jaccard`` (prefix-filtered inverted index) and
``embedding_neardup`` (pivot-cell triangle-inequality pruning) claim to
be EXACT: the pruning may only drop pairs that cannot pass the
threshold. These tests pin that claim by comparing each against its
quadratic reference formulation on the sf0.001 corpus — any candidate
the filter wrongly discards shows up as a missing row.
"""

from __future__ import annotations

from mysql_cdc_spark.analytics import embeddings, text

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ngram_jaccard_prefix_filter_is_lossless(spark):
    fast = _rows(text.ngram_jaccard(spark, SF))
    ref = _rows(text._ngram_jaccard_blocked(spark, SF))
    assert fast == ref
    assert ref  # non-vacuous: the corpus must actually contain pairs


def test_embedding_neardup_cell_pruning_is_lossless(spark):
    fast = _rows(embeddings.embedding_neardup(spark, SF))
    ref = _rows(embeddings._embedding_neardup_blocked(spark, SF))
    assert fast == ref
    assert ref


def test_exact_joins_have_no_cartesian_product(spark):
    def plan(df):
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    p_ngram = plan(text.ngram_jaccard(spark, SF))
    p_emb = plan(embeddings.embedding_neardup(spark, SF))
    # no unbounded pair space: every join is keyed (the only nested-loop
    # join allowed is the embedding side's broadcast centroid-argmax —
    # corpus × tiny codebook, the same shape knn_ivf probes with)
    assert "CartesianProduct" not in p_ngram
    assert "BroadcastNestedLoopJoin" not in p_ngram
    assert "CartesianProduct" not in p_emb
    tree_lines = [
        ln for ln in p_emb.splitlines() if "BroadcastNestedLoopJoin Cross" in ln
    ]
    assert tree_lines  # the centroid argmax is present...
    for ln in tree_lines:
        assert "BuildRight" in ln  # ...and always a broadcast build side
