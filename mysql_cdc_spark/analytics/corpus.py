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
    _h,
    _h14,
    _h14_duck,
    _h_duck,
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


# ---------------------------------------------------------------------------
# deterministic mixture sampling (data-mixing rates per language)
# ---------------------------------------------------------------------------

# per-language keep rates — the "data mixture" a pretraining run assigns
_MIX_RATES = {"en": 0.9, "de": 0.5}
_MIX_DEFAULT = 0.25
_H60_MAX = (1 << 60) - 1
# integer thresholds precomputed once so both engines compare the same
# bigint literal — no float-boundary drift at the keep/drop edge
_MIX_THRESHOLDS = {k: int(v * _H60_MAX) for k, v in _MIX_RATES.items()}
_MIX_DEFAULT_T = int(_MIX_DEFAULT * _H60_MAX)


def _mix_threshold_case() -> str:
    arms = " ".join(
        f"WHEN '{k}' THEN {t}" for k, t in sorted(_MIX_THRESHOLDS.items())
    )
    return f"CASE lang {arms} ELSE {_MIX_DEFAULT_T} END"


def _mix_weight_case() -> str:
    # weight = 1/rate as a fixed 4-decimal literal, identical in both
    # dialects — computed here, not via in-engine division, so the
    # keep/drop hash threshold AND the weight are bit-identical
    arms = " ".join(
        f"WHEN '{k}' THEN {round(1.0 / v, 4)}"
        for k, v in sorted(_MIX_RATES.items())
    )
    return f"CASE lang {arms} ELSE {round(1.0 / _MIX_DEFAULT, 4)} END"


def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: keep each doc iff a 60-bit salted
    hash of its id falls under the language's rate threshold — the
    data-mixing stage that reweights languages/sources before training.
    Reproducible (pure function of doc_id), exactly restartable, and a
    zero-shuffle codegen scan at any corpus size; the kept doc carries
    ``weight`` = 1/rate for loss reweighting downstream.
    """
    docs = load(spark, sf_dir, "documents")
    h = _h("concat('mix1:', cast(doc_id as string))")
    return (
        docs.selectExpr(
            "doc_id",
            "lang",
            f"{h} as sample_key",
            f"{_mix_threshold_case()} as threshold",
        )
        .filter(F.col("sample_key") < F.col("threshold"))
        .selectExpr(
            "doc_id",
            "lang",
            f"cast({_mix_weight_case()} as double) as weight",
        )
    )


MIXTURE_SQL = f"""
SELECT doc_id, lang,
       ({_mix_weight_case()})::DOUBLE AS weight
FROM documents
WHERE {_h_duck("'mix1:' || doc_id::VARCHAR")}
      < ({_mix_threshold_case()})
"""


# ---------------------------------------------------------------------------
# sequence packing (greedy cumulative bin assignment per shard)
# ---------------------------------------------------------------------------

_PACK_TOKENS = 512  # context-window budget per packed sequence
_PACK_SHARDS = 16


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assign documents to ~512-token training
    sequences ("bins") by running token count, reporting per-bin doc
    count, token total, and fill ratio. A doc belongs to the bin its
    cumulative range STARTS in, so bins can overflow by at most one
    doc — the standard streaming-packing trade.

    Global greedy packing is inherently sequential, so the scale shape
    shards the corpus first: packing runs independently per
    (lang, shard=H(doc_id)%{_PACK_SHARDS}) — {_PACK_SHARDS}× the
    parallelism of a per-lang window and bounded waste (≤1 underfull
    bin per shard). One exchange on the composite key, one sort, one
    aggregate; at 100 TB raise the shard count, nothing else changes.
    """
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    shard_h = _h("concat('shard:', cast(doc_id as string))")
    t = docs.selectExpr(
        "doc_id",
        "lang",
        f"{shard_h} % {_PACK_SHARDS} as shard",
        f"size({WORDS}) as n_tokens",
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = t.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(_PACK_TOKENS)),
    )
    return (
        binned.groupBy("lang", "shard", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.round(F.sum("n_tokens") / F.lit(_PACK_TOKENS), 4).alias(
                "fill_ratio"
            ),
        )
        .select("lang", "shard", "bin_id", "n_docs", "bin_tokens", "fill_ratio")
    )


PACKING_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         {_h_duck("'shard:' || doc_id::VARCHAR")} % {_PACK_SHARDS} AS shard,
         len({WORDS_DUCK}) AS n_tokens
  FROM documents
), c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY lang, shard
                                ORDER BY doc_id) AS cum
  FROM t
)
SELECT lang, shard,
       ((cum - n_tokens) // {_PACK_TOKENS})::BIGINT AS bin_id,
       count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS bin_tokens,
       round(sum(n_tokens) / {_PACK_TOKENS}, 4) AS fill_ratio
FROM c GROUP BY lang, shard, bin_id
"""


QUERIES = {
    "text_repetition": text_repetition,
    "contamination_check": contamination_check,
    "dedup_clusters": dedup_clusters,
    "doc_mixture_sample": doc_mixture_sample,
    "doc_pack_sequences": doc_pack_sequences,
}

ORACLES = {
    "text_repetition": REPETITION_SQL,
    "contamination_check": CONTAMINATION_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "doc_mixture_sample": MIXTURE_SQL,
    "doc_pack_sequences": PACKING_SQL,
}
