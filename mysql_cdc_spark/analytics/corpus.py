"""Corpus-curation operators over the ``documents`` table.

The three ops a pretraining-data pipeline runs after the per-doc scoring
passes in :mod:`.text`:

- text_repetition      Gopher-style repetition quality: top-bigram and
                       duplicated-bigram fractions per document
- contamination_check  eval-set decontamination: which corpus docs share
                       word-3-gram shingles with a held-out benchmark set
- dedup_clusters       connected components over the verified MinHash+LSH
                       near-duplicate pairs — the cluster assignment a
                       "keep one per cluster" dedup policy consumes

Each has a semantically identical DuckDB oracle (the recursive-CTE twin
for the clustering). Shingle/hash helpers are shared with :mod:`.text`
so the pair graph here is byte-identical to ``minhash_lsh_neardup``'s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load
from .text import (
    MINHASH_SQL,
    WORDS,
    WORDS_DUCK,
    _h14,
    _h14_duck,
    _shingles,
    minhash_lsh_neardup,
)

# ---------------------------------------------------------------------------
# repetition quality (Gopher-style duplicated-n-gram filters)
# ---------------------------------------------------------------------------


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram repetition: the fraction of bigram occurrences
    taken by the single most frequent bigram (``top_bigram_frac``) and the
    fraction belonging to any bigram that occurs more than once
    (``dup_bigram_frac``) — the standard cheap repetition filters
    (Gopher §A.1.1-style) a corpus pipeline applies before training.

    Plan: explode bigrams → partial-combined count per (doc, gram) →
    per-doc aggregate. Two key-local exchanges, both on (doc_id[, gram]);
    no joins, no windows — at 100 TB this is a linear two-level
    aggregation with map-side combine on both levels.
    """
    docs = load(spark, sf_dir, "documents")
    bigrams = (
        f"CASE WHEN size({WORDS}) >= 2 THEN "
        f"transform(sequence(1, size({WORDS}) - 1), "
        f"i -> array_join(slice({WORDS}, i, 2), ' ')) "
        f"ELSE array() END"
    )
    per_gram = (
        docs.selectExpr("doc_id", f"explode({bigrams}) as g")
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac"),
            F.round(
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
                / F.sum("c"),
                4,
            ).alias("dup_bigram_frac"),
        )
        .select("doc_id", "n_bigrams", "top_bigram_frac", "dup_bigram_frac")
    )


REPETITION_SQL = f"""
WITH grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len({WORDS_DUCK})),
         i -> array_to_string({WORDS_DUCK}[i:i+1], ' '))) AS g
  FROM documents
), cnt AS (
  SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
)
SELECT doc_id,
       sum(c)::BIGINT AS n_bigrams,
       round(max(c) / sum(c), 4) AS top_bigram_frac,
       round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / sum(c), 4)
         AS dup_bigram_frac
FROM cnt GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a held-out eval set)
# ---------------------------------------------------------------------------

# deterministic synthetic "benchmark" subset: every 53rd document plays
# the role of an eval task's prompts
_EVAL_MOD = 53


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: for every corpus document, how many of
    its distinct word-3-gram shingles also appear in the held-out
    benchmark subset (docs with ``doc_id % 53 == 0``), as a count and a
    fraction of the doc's shingles. Docs with zero overlap are dropped
    (the interesting output is the contaminated set you quarantine).

    Scale shape: benchmarks are tiny next to the corpus, so the eval
    shingle set is DISTINCT'd and **broadcast** — the corpus side streams
    through a broadcast-hash semi-join keyed on 56-bit shingle hashes
    (8 bytes each, never shingle text), then aggregates per doc. One
    corpus-side exchange (doc_id), no shuffle of the corpus text.
    """
    docs = load(spark, sf_dir, "documents")
    sh = _shingles(WORDS, "spark")
    tri = docs.selectExpr("doc_id", f"{sh} as tris").selectExpr(
        "doc_id", "size(tris) as n_trigrams", f"explode(transform(tris, s -> {_h14('s')})) as g"
    )
    evalg = (
        tri.filter(F.col("doc_id") % _EVAL_MOD == 0).select("g").distinct()
    )
    return (
        tri.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .join(F.broadcast(evalg), "g")
        .groupBy("doc_id")
        .agg(
            F.max("n_trigrams").alias("n_trigrams"),
            F.count("*").alias("contam_ngrams"),
            F.round(F.count("*") / F.max("n_trigrams"), 4).alias("contam_frac"),
        )
        .select("doc_id", "n_trigrams", "contam_ngrams", "contam_frac")
    )


def _contamination_sql() -> str:
    sh = _shingles(WORDS_DUCK, "duck")
    return f"""
WITH tri AS (
  SELECT doc_id, len(tris) AS n_trigrams,
         unnest(list_transform(tris, s -> {_h14_duck('s')})) AS g
  FROM (SELECT doc_id, {sh} AS tris FROM documents)
), evalg AS (
  SELECT DISTINCT g FROM tri WHERE doc_id % {_EVAL_MOD} = 0
)
SELECT t.doc_id,
       max(t.n_trigrams)::BIGINT AS n_trigrams,
       count(*)::BIGINT AS contam_ngrams,
       round(count(*) / max(t.n_trigrams), 4) AS contam_frac
FROM tri t JOIN evalg e USING (g)
WHERE t.doc_id % {_EVAL_MOD} <> 0
GROUP BY t.doc_id
"""


CONTAMINATION_SQL = _contamination_sql()


# ---------------------------------------------------------------------------
# near-duplicate connected components (cluster assignment for dedup)
# ---------------------------------------------------------------------------


def connected_components(pairs: DataFrame) -> DataFrame:
    """HashMin label propagation over an undirected pair list
    (``doc_a``, ``doc_b``) to fixpoint: returns (``doc_id``,
    ``cluster_id`` = min id reachable). Per round, every vertex takes
    min(own label, neighbours' labels); converged when no label changes.
    Rounds = graph diameter. Each round is one shuffle join + key-local
    aggregate; labels are ``localCheckpoint``'d so lineage stays O(1)
    across rounds (the iterative-algorithm must at cluster scale). For
    adversarially deep graphs the large-star/small-star variant bounds
    rounds at O(log n) with the same per-round plan; diameter-bounded
    propagation is the right default for dedup graphs, whose components
    are shallow (pairs share ≥1 LSH band with a common doc: 2-3 rounds).
    """
    edges = (
        pairs.selectExpr("doc_a as s", "doc_b as d")
        .union(pairs.selectExpr("doc_b as s", "doc_a as d"))
        .persist()
    )
    labels = (
        edges.select(F.col("s").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    while True:
        nbr = (
            edges.join(labels, edges["s"] == labels["doc_id"])
            .groupBy("d")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels["doc_id"] == nbr["d"], "left")
            .select(
                F.col("doc_id"),
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the verified MinHash+LSH near-dup pairs:
    every document in at least one pair gets ``cluster_id`` = the minimum
    doc_id reachable through near-dup edges, plus the component size —
    the table a "keep the lowest doc_id per cluster" dedup policy reads.

    The pair graph is exactly ``minhash_lsh_neardup``'s output (Jaccard
    ≥ 0.5 verified), so the oracle reuses the same SQL as a subquery and
    closes it with a recursive CTE. See :func:`connected_components` for
    the propagation algorithm and its scale analysis.
    """
    pairs = minhash_lsh_neardup(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


def _dedup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE vpairs AS (
  SELECT doc_a, doc_b FROM ({MINHASH_SQL.strip()}) mp
), edges AS (
  SELECT doc_a AS s, doc_b AS d FROM vpairs
  UNION ALL
  SELECT doc_b, doc_a FROM vpairs
), reach(doc_id, r) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.doc_id
), labels AS (
  SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
)
SELECT l.doc_id, l.cluster_id, c.n AS cluster_size
FROM labels l
JOIN (SELECT cluster_id, count(*) AS n FROM labels GROUP BY cluster_id) c
  USING (cluster_id)
"""


DEDUP_CLUSTERS_SQL = _dedup_clusters_sql()


QUERIES = {
    "text_repetition": text_repetition,
    "contamination_check": contamination_check,
    "dedup_clusters": dedup_clusters,
}

ORACLES = {
    "text_repetition": REPETITION_SQL,
    "contamination_check": CONTAMINATION_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
}
