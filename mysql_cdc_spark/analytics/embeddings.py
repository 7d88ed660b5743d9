"""Similarity search over the ``embeddings`` table (vec_id, embedding:
array<float>[64], label).

Training-pipeline vector ops, all JVM-side (``zip_with``/``aggregate`` dot
products in whole-stage codegen — no Python in the hot path):

- knn_bruteforce   exact cosine top-k for a query subset (the baseline)
- label_centroids  distributed element-wise mean vector per label
- knn_ivf / knn_ivf_probe2  IVF-style ANN against a PERSISTED coarse
                   codebook (build_codebook trains once per corpus;
                   every probe broadcasts the artifact)
- embedding_neardup       EXACT cosine near-dup pairs via pivot-cell
                          bound pruning (lossless triangle-inequality
                          candidate cut — no quadratic label block)
- embedding_neardup_ivf   approximate near-dup via IVF cell candidates
- embedding_quantize_int8 symmetric per-vector int8 quantization with
                          exact scale/checksum/RMS-error oracle

Float parity with the DuckDB oracle: embeddings are float32 in parquet;
both engines cast to double before any arithmetic, and cosine values are
rounded to 4 decimals.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load

# Spark expressions over double arrays
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({a}, 0D, (acc, v) -> acc + v * v))"


def _cos_spark(a: str, b: str) -> str:
    return (
        f"round({_DOT.format(a=a, b=b)} / "
        f"({_NORM.format(a=a)} * {_NORM.format(a=b)}), 4)"
    )


def _cos_duck(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 4)"
    )


_DOUBLE_VEC = "transform(embedding, x -> cast(x as double))"
_DOUBLE_VEC_DUCK = "embedding::DOUBLE[]"

N_QUERIES = 8  # query subset for the top-k demos
TOP_K = 5


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: queries (vec_id < N) × corpus, ranked per query.

    The query side is broadcast (tiny); the corpus scans once with the dot
    product fused into codegen. Top-k per query via max_by over collected
    candidates would shuffle all scores; instead groupBy(query) with a
    window-free ``slice(array_sort(collect_list(...)))`` keeps the shuffle
    at one row per (query, corpus-partition) after partial aggregation.
    """
    emb = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_DOUBLE_VEC} as v"
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).selectExpr("vec_id as q_id", "v as qv")
    scored = q.hint("broadcast").crossJoin(emb).filter("vec_id != q_id").selectExpr(
        "q_id", "vec_id", f"{_cos_spark('qv', 'v')} as cos_sim"
    )
    # top-k per query: sort by struct(-cos, vec_id) ascending — a
    # deterministic total order (ties broken by id)
    topk = (
        scored.selectExpr("q_id", "vec_id", "cos_sim", "struct(-cos_sim as nc, vec_id as tie) as ord")
        .groupBy("q_id")
        .agg(F.slice(F.array_sort(F.collect_list(F.struct("ord", "vec_id", "cos_sim"))), 1, TOP_K).alias("top"))
        .selectExpr("q_id", "posexplode(top) as (rank0, t)")
        .selectExpr("q_id", "rank0 + 1 as rank", "t.vec_id as neighbor_id", "t.cos_sim as cos_sim")
    )
    return topk


KNN_SQL = f"""
WITH emb AS (
  SELECT vec_id, {_DOUBLE_VEC_DUCK} AS v FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, e.vec_id, {_cos_duck('qv', 'e.v')} AS cos_sim
  FROM q CROSS JOIN emb e WHERE e.vec_id != q.q_id
), ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)
           AS rank
  FROM scored
)
SELECT q_id, rank, vec_id AS neighbor_id, cos_sim
FROM ranked WHERE rank <= {TOP_K}
"""


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean vector per label — posexplode → groupBy(label, dim)
    → avg. The explode multiplies rows ×64 but each is 20 bytes; partial
    aggregation collapses them before the shuffle, so the exchange carries
    (labels × dims × tasks) rows regardless of corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.selectExpr("label", f"posexplode({_DOUBLE_VEC}) as (dim, x)")
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 4).alias("centroid_val"), F.count(F.lit(1)).alias("n_vectors"))
    )


CENTROIDS_SQL = f"""
WITH emb AS (SELECT label, {_DOUBLE_VEC_DUCK} AS v FROM embeddings)
SELECT label, t.i - 1 AS dim, round(avg(emb.v[t.i]), 4) AS centroid_val,
       count(*) AS n_vectors
FROM emb, unnest(generate_series(1, len(emb.v))) AS t(i)
GROUP BY label, t.i - 1
"""


def _train_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook training pass: cell centroids over the raw corpus (label
    means stand in for a k-means codebook). Runs once per corpus via
    ``build_codebook`` — never in-plan per query."""
    emb = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label", f"{_DOUBLE_VEC} as v"
    )
    return (
        emb.selectExpr("label", "posexplode(v) as (dim, x)")
        .groupBy("label", "dim")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.expr("transform(array_sort(collect_list(struct(dim, cx))), s -> s.cx)").alias("cv"))
        .selectExpr("label as c_label", "cv")
    )


def codebook_path(sf_dir: str) -> str:
    """Deterministic per-corpus codebook location, keyed by corpus path +
    file identity (mtime/size) so a regenerated corpus retrains."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        ident = f"{sf_dir}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        ident = sf_dir
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    base = os.environ.get("SPARK_CDC_CODEBOOK_DIR") or tempfile.gettempdir()
    return os.path.join(base, f"ivf_codebook_{key}.parquet")


def build_codebook(spark: SparkSession, sf_dir: str, force: bool = False) -> str:
    """Train the IVF coarse codebook ONCE per corpus and persist it to the
    store; every IVF consumer (``knn_ivf``, ``knn_ivf_probe2``,
    ``embedding_neardup_ivf``) broadcasts the persisted table instead of
    re-deriving centroids in-plan per query. At deploy scale this is the
    offline codebook-training job (train on a sample, broadcast to every
    probe); here the training pass is one small Spark aggregation and the
    artifact is a single parquet file (atomic rename)."""
    path = codebook_path(sf_dir)
    if force or not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = _train_cells(spark, sf_dir).toPandas()
        pdf["cv"] = pdf["cv"].map(list)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(pdf), tmp)
        os.replace(tmp, path)
    return path


def _codebook_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(build_codebook(spark, sf_dir))


# Per-corpus memo of persisted intermediate DataFrames: three IVF
# queries in one session must share ONE cached assignment, not stack
# three persisted copies that nothing ever unpersists. Keyed by
# (SparkContext id, role, sf_dir); the stored codebook path carries the
# corpus identity (path + mtime/size), so a regenerated corpus evicts
# and unpersists the stale entry instead of leaking it.
_PERSIST_MEMO: dict = {}


def _memo_persist(spark: SparkSession, role: str, sf_dir: str, build) -> DataFrame:
    key = (id(spark.sparkContext), role, sf_dir)
    ident = codebook_path(sf_dir)
    hit = _PERSIST_MEMO.get(key)
    if hit is not None:
        if hit[0] == ident:
            return hit[1]
        hit[1].unpersist()  # corpus regenerated — release the stale cache
    df = build().persist()
    _PERSIST_MEMO[key] = (ident, df)
    return df


def _ivf_assign(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """Nearest-centroid assignment of ``emb`` (default: the raw corpus)
    against the persisted codebook — a broadcast argmax. Returns
    (vec_id, cell, v), persisted via the per-corpus memo — every IVF
    consumer (and every repeated call in a session) probes ONE cached
    assignment from both sides of its join."""

    def build(emb=emb):
        if emb is None:
            emb = load(spark, sf_dir, "embeddings").selectExpr(
                "vec_id", f"{_DOUBLE_VEC} as v"
            )
        cents = _codebook_df(spark, sf_dir)
        return (
            emb.select("vec_id", "v")
            .crossJoin(F.broadcast(cents))
            .selectExpr("vec_id", "v", "c_label", f"{_cos_spark('v', 'cv')} as c_sim")
            .groupBy("vec_id")
            .agg(
                F.max_by(F.struct(F.col("c_label"), F.col("v")), F.struct(F.col("c_sim"), (-F.col("c_label")).alias("t"))).alias("w")
            )
            .selectExpr("vec_id", "w.c_label as cell", "w.v as v")
        )

    role = "assign" if emb is None else "assign_neardup"
    return _memo_persist(spark, role, sf_dir, build)


def _per_query_topk(scored: DataFrame) -> DataFrame:
    """(q_id, vec_id, cos_sim) → ranked top-k per query, without a global
    sort: per-partition partial aggregation collects candidate lists and
    the final slice keeps k (shuffle bounded by queries × tasks)."""
    return (
        scored.selectExpr("q_id", "vec_id", "cos_sim")
        .groupBy("q_id")
        .agg(F.slice(F.array_sort(F.collect_list(F.struct(F.expr("struct(-cos_sim as nc, vec_id as tie)").alias("ord"), F.col("vec_id"), F.col("cos_sim")))), 1, TOP_K).alias("top"))
        .selectExpr("q_id", "posexplode(top) as (rank0, t)")
        .selectExpr("q_id", "rank0 + 1 as rank", "t.vec_id as neighbor_id", "t.cos_sim as cos_sim")
    )


# shared SQL CTE prefix: emb → centroids → nearest-centroid assignment
_IVF_ASSIGN_SQL = f"""
WITH emb AS (
  SELECT vec_id, label, {_DOUBLE_VEC_DUCK} AS v FROM embeddings
), cents AS (
  SELECT label AS c_label, list(x ORDER BY dim) AS cv FROM (
    SELECT label, t.i - 1 AS dim, avg(emb.v[t.i]) AS x
    FROM emb, unnest(generate_series(1, len(emb.v))) AS t(i)
    GROUP BY label, t.i - 1
  ) GROUP BY label
), assigned AS (
  SELECT vec_id, cell, v FROM (
    SELECT e.vec_id, c.c_label AS cell, e.v,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_duck('e.v', 'c.cv')} DESC,
                                       c.c_label) AS rn
    FROM emb e CROSS JOIN cents c
  ) WHERE rn = 1
)"""


def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse cells = label centroids (computed in-plan);
    each corpus vector is assigned to its nearest centroid; each query
    probes only its own cell. Cuts the candidate set by ~n_cells× vs brute
    force at the cost of recall on cell boundaries — the standard IVF
    trade. Output schema matches knn_bruteforce for recall comparison.

    Centroid build + assignment are both broadcast joins; the per-cell
    search is the same fused dot product as brute force.
    """
    assigned = _ivf_assign(spark, sf_dir)
    q = assigned.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id as q_id", "cell as q_cell", "v as qv"
    )
    scored = (
        q.hint("broadcast")
        .join(assigned, (F.col("cell") == F.col("q_cell")) & (F.col("vec_id") != F.col("q_id")))
        .selectExpr("q_id", "vec_id", f"{_cos_spark('qv', 'v')} as cos_sim")
    )
    return _per_query_topk(scored)


def knn_ivf_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 — the standard recall knob: each query probes its
    two nearest cells instead of one, recovering neighbors that sit just
    across a cell boundary at ~2× the per-query candidate cost. The
    per-vector top-2 cells come from a combinable collect+slice aggregate
    (bounded by n_cells per vector, no window over the corpus)."""
    emb = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_DOUBLE_VEC} as v"
    )
    cents = _codebook_df(spark, sf_dir)
    cell_rank = _memo_persist(
        spark, "cell_rank2", sf_dir,
        lambda: (
            emb.crossJoin(F.broadcast(cents))
            .selectExpr("vec_id", "c_label", f"{_cos_spark('v', 'cv')} as c_sim")
            .groupBy("vec_id")
            .agg(F.slice(F.array_sort(F.collect_list(F.struct(F.struct((-F.col("c_sim")).alias("nc"), F.col("c_label").alias("t")).alias("ord"), F.col("c_label")))), 1, 2).alias("top"))
            .selectExpr("vec_id", "posexplode(top) as (i, s)")
            .selectExpr("vec_id", "s.c_label as cell", "i as cell_rank")
        ),
    )
    vecs = emb.select("vec_id", "v")
    corpus = (
        cell_rank.filter(F.col("cell_rank") == 0)
        .join(vecs, "vec_id")
        .select("vec_id", "cell", "v")
    )
    q = (
        cell_rank.filter(F.col("vec_id") < N_QUERIES)
        .join(vecs, "vec_id")
        .selectExpr("vec_id as q_id", "cell as q_cell", "v as qv")
    )
    scored = (
        q.hint("broadcast")
        .join(corpus, (F.col("cell") == F.col("q_cell")) & (F.col("vec_id") != F.col("q_id")))
        .selectExpr("q_id", "vec_id", f"{_cos_spark('qv', 'v')} as cos_sim")
    )
    return _per_query_topk(scored)


KNN_IVF_SQL = f"""{_IVF_ASSIGN_SQL}, q AS (
  SELECT vec_id AS q_id, cell AS q_cell, v AS qv FROM assigned
  WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, a.vec_id, {_cos_duck('qv', 'a.v')} AS cos_sim
  FROM q JOIN assigned a ON a.cell = q.q_cell AND a.vec_id != q.q_id
), ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)
           AS rank
  FROM scored
)
SELECT q_id, rank, vec_id AS neighbor_id, cos_sim
FROM ranked WHERE rank <= {TOP_K}
"""


KNN_IVF_PROBE2_SQL = f"""
WITH emb AS (
  SELECT vec_id, label, {_DOUBLE_VEC_DUCK} AS v FROM embeddings
), cents AS (
  SELECT label AS c_label, list(x ORDER BY dim) AS cv FROM (
    SELECT label, t.i - 1 AS dim, avg(emb.v[t.i]) AS x
    FROM emb, unnest(generate_series(1, len(emb.v))) AS t(i)
    GROUP BY label, t.i - 1
  ) GROUP BY label
), ranked_cells AS (
  SELECT e.vec_id, c.c_label AS cell, e.v,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_cos_duck('e.v', 'c.cv')} DESC,
                                     c.c_label) AS rn
  FROM emb e CROSS JOIN cents c
), corpus AS (
  SELECT vec_id, cell, v FROM ranked_cells WHERE rn = 1
), q AS (
  SELECT vec_id AS q_id, cell AS q_cell, v AS qv FROM ranked_cells
  WHERE rn <= 2 AND vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, a.vec_id, {_cos_duck('qv', 'a.v')} AS cos_sim
  FROM q JOIN corpus a ON a.cell = q.q_cell AND a.vec_id != q.q_id
), ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)
           AS rank
  FROM scored
)
SELECT q_id, rank, vec_id AS neighbor_id, cos_sim
FROM ranked WHERE rank <= {TOP_K}
"""


def _neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw corpus ∪ a deterministic re-ingest slice (every 127th vector
    under a shifted id) — the duplicate shape a double-embedded shard
    produces. Keeps the near-dup oracles discriminating: the synthetic
    testdata alone has no pairs above the 0.95 threshold, so a bug that
    finds nothing would otherwise still read green."""
    emb = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", "label", f"{_DOUBLE_VEC} as v"
    )
    reingest = emb.filter(F.col("vec_id") % 127 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000_000)
    )
    return emb.unionByName(reingest)


_NEARDUP_CORPUS_SQL = f"""
  SELECT vec_id, label, {_DOUBLE_VEC_DUCK} AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000, label, {_DOUBLE_VEC_DUCK} AS v FROM embeddings
  WHERE vec_id % 127 = 0"""


def _embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic within-label reference formulation — kept only as the
    obviously-correct twin the cell-pruned form is parity-tested against
    (tests/test_text_exact_joins.py)."""
    corpus = _neardup_corpus(spark, sf_dir)
    a = corpus.selectExpr("vec_id as id_a", "label as l_a", "v as va")
    b = corpus.selectExpr("vec_id as id_b", "label as l_b", "v as vb")
    return (
        a.join(b, (F.col("l_a") == F.col("l_b")) & (F.col("id_a") < F.col("id_b")))
        .selectExpr("id_a", "id_b", f"{_cos_spark('va', 'vb')} as cos_sim")
        .filter(F.col("cos_sim") >= 0.95)
    )


# round(cos, 4) >= 0.95 admits true cosine down to this boundary; the
# pruning bound below must use it, not 0.95 itself.
_NEARDUP_T = 0.94995


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (round(cos, 4) ≥ 0.95)
    within the same label cell, via pivot-cell bound pruning instead of
    the quadratic within-label cross join:

    - on unit vectors, cos(a, b) = 1 − ‖â−b̂‖²/2, so the threshold is a
      Euclidean ε-join on the sphere with ε = √(2·(1−t));
    - every vector is assigned to its nearest coarse cell (the SAME
      persisted-codebook assignment the IVF twin probes); per (label,
      cell) we compute the normalized-space centroid and member radius;
    - a (cell_i, cell_j) pair can contain a qualifying pair only if
      ‖c_i−c_j‖ − r_i − r_j ≤ ε (triangle inequality), so only surviving
      cell pairs are joined, then the exact cosine verify runs on the
      original vectors (same formula as before).

    Lossless — the pruning bound is a strict lower bound on any member
    distance, and the oracle stays the quadratic DuckDB SQL — but pair
    space is Σ surviving-cell-pair |i|·|j|, not Σ label². Cell count is
    the knob (more centroids → smaller cells → fewer survivors); a truly
    near-duplicate-dense region keeps its cell pairs, which is the
    output's own size — unavoidable for any exact pair listing. Zero-norm
    vectors are excluded from candidates: their cosine is NULL in both
    engines and can never pass the threshold."""
    corpus = _neardup_corpus(spark, sf_dir)
    assigned = _ivf_assign(spark, sf_dir, emb=corpus)
    eps = (2.0 * (1.0 - _NEARDUP_T)) ** 0.5 + 1e-9
    nrm = _NORM.format(a="v")
    members = _memo_persist(
        spark, "neardup_exact_members", sf_dir,
        lambda: (
            assigned.join(corpus.select("vec_id", "label"), "vec_id")
            .selectExpr("vec_id", "label", "cell", "v", f"{nrm} as nrm")
            .filter("nrm > 0")
            .selectExpr("vec_id", "label", "cell", "v", "transform(v, x -> x / nrm) as u")
        ),
    )
    dist = "sqrt(aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0D, (acc, e) -> acc + e))"
    cent = (
        members.selectExpr("label", "cell", "posexplode(u) as (dim, x)")
        .groupBy("label", "cell", "dim")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label", "cell")
        .agg(F.expr("transform(array_sort(collect_list(struct(dim, cx))), s -> s.cx)").alias("cu"))
    )
    cells = (
        members.join(F.broadcast(cent), ["label", "cell"])
        .selectExpr("label", "cell", "cu", dist.format(a="u", b="cu") + " as dc")
        .groupBy("label", "cell")
        .agg(F.max("dc").alias("radius"), F.first("cu").alias("cu"))
    )
    ca = cells.selectExpr("label", "cell as cell_a", "cu as cu_a", "radius as r_a")
    cb = cells.selectExpr("label", "cell as cell_b", "cu as cu_b", "radius as r_b")
    cell_pairs = (
        ca.join(cb, "label")  # all ordered pairs incl. (i, i): members are
        # in exactly one cell, so id_a < id_b below emits each pair once
        .selectExpr("label", "cell_a", "cell_b", "r_a", "r_b", dist.format(a="cu_a", b="cu_b") + " as dcc")
        .filter(F.col("dcc") - F.col("r_a") - F.col("r_b") <= eps)
        .select("label", "cell_a", "cell_b")
    )
    ma = members.selectExpr("label", "cell as cell_a", "vec_id as id_a", "v as va")
    mb = members.selectExpr("label", "cell as cell_b", "vec_id as id_b", "v as vb")
    return (
        ma.join(F.broadcast(cell_pairs), ["label", "cell_a"])
        .join(mb, ["label", "cell_b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr("id_a", "id_b", f"{_cos_spark('va', 'vb')} as cos_sim")
        .filter(F.col("cos_sim") >= 0.95)
    )


NEARDUP_SQL = f"""
WITH emb AS ({_NEARDUP_CORPUS_SQL}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos_duck('a.v', 'b.v')} AS cos_sim
FROM emb a JOIN emb b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cos_duck('a.v', 'b.v')} >= 0.95
"""


def embedding_neardup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate embedding near-dup: candidates from IVF cells instead
    of the label column, through the same coarse-quantized cells
    ``knn_ivf`` probes: pair space is Σ cell², cells are data-derived (no
    label needed), and the cell count is a knob — more centroids →
    smaller cells → fewer candidate pairs, at the standard recall cost on
    cell boundaries. ``embedding_neardup`` is the exact twin (same cells,
    lossless triangle-inequality pruning instead of same-cell-only
    candidates). Probes the persisted codebook (trained on the raw
    corpus) over the augmented re-ingest corpus."""
    assigned = _ivf_assign(spark, sf_dir, emb=_neardup_corpus(spark, sf_dir))
    a = assigned.selectExpr("vec_id as id_a", "cell", "v as va")
    b = assigned.selectExpr("vec_id as id_b", "cell", "v as vb")
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .selectExpr("id_a", "id_b", "cell", f"{_cos_spark('va', 'vb')} as cos_sim")
        .filter(F.col("cos_sim") >= 0.95)
    )


NEARDUP_IVF_SQL = f"""
WITH emb AS (
  SELECT vec_id, label, {_DOUBLE_VEC_DUCK} AS v FROM embeddings
), cents AS (
  SELECT label AS c_label, list(x ORDER BY dim) AS cv FROM (
    SELECT label, t.i - 1 AS dim, avg(emb.v[t.i]) AS x
    FROM emb, unnest(generate_series(1, len(emb.v))) AS t(i)
    GROUP BY label, t.i - 1
  ) GROUP BY label
), corpus AS ({_NEARDUP_CORPUS_SQL}
), assigned AS (
  SELECT vec_id, cell, v FROM (
    SELECT e.vec_id, c.c_label AS cell, e.v,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_duck('e.v', 'c.cv')} DESC,
                                       c.c_label) AS rn
    FROM corpus e CROSS JOIN cents c
  ) WHERE rn = 1
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell,
       {_cos_duck('a.v', 'b.v')} AS cos_sim
FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE {_cos_duck('a.v', 'b.v')} >= 0.95
"""


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector (the storage form ANN
    serving uses at corpus scale: 4× smaller than float32, one scale per
    vector): scale = max|v| / 127, q_i = round_half_up(v_i / scale).
    Emits the per-vector scale, the quantized-code checksum, and the RMS
    reconstruction error — all zip_with/aggregate HOFs, zero shuffle,
    oracle-checked exactly. Rounding is floor(x + 0.5) in BOTH dialects
    (the engines' round() builtins disagree on half-way ties)."""
    emb = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_DOUBLE_VEC} as v"
    )
    scale = "aggregate(v, 0D, (m, x) -> greatest(m, abs(x))) / 127.0D"
    q = "transform(v, x -> cast(floor(x / sc + 0.5D) as bigint))"
    return (
        emb.selectExpr("vec_id", "v", f"{scale} as sc")
        .filter(F.col("sc") > 0)
        .selectExpr("vec_id", "v", "sc", f"{q} as q")
        .selectExpr(
            "vec_id",
            "round(sc, 6) as scale6",
            "aggregate(q, 0L, (acc, x) -> acc + x) as q_sum",
            "round(sqrt(aggregate(zip_with(v, q, (x, qq) -> pow(x - qq * sc, 2)), "
            "0D, (acc, e) -> acc + e) / size(v)), 6) as rms_err",
        )
    )


QUANTIZE_SQL = f"""
WITH emb AS (
  SELECT vec_id, {_DOUBLE_VEC_DUCK} AS v FROM embeddings
), scaled AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
  FROM emb
), quant AS (
  SELECT vec_id, v, sc,
         list_transform(v, x -> floor(x / sc + 0.5)::BIGINT) AS q
  FROM scaled WHERE sc > 0
)
SELECT vec_id, round(sc, 6) AS scale6,
       list_sum(q)::BIGINT AS q_sum,
       round(sqrt(list_sum(list_transform(range(1, len(v) + 1),
             i -> pow(v[i] - q[i] * sc, 2))) / len(v)), 6) AS rms_err
FROM quant
"""


def _vector_cdc_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-ingest the embeddings corpus through a real binlog replay:
    every row arrives as a WRITE_ROWS insert with a MySQL 9 VECTOR
    column (kind "vector", F21), then deterministic UPDATE_ROWS negate
    every ``vec_id % 5 == 0`` vector (float32 sign flips are exact) and
    DELETE_ROWS remove ``vec_id % 97 == 3`` — so last-writer-wins
    ordering, delete suppression, and the float32 round-trip all gate
    the final state. Binlog generation is cached per corpus; the replay
    itself runs fresh each call (it IS the thing under test)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..binlog.constants import ColumnType
    from ..binlog.decoder import TableSpec
    from ..binlog.encoder import BinlogWriter
    from ..pipeline.replay import Replayer

    spec = TableSpec(
        database="ml", table="emb",
        columns=(("vec_id", "bigint", "int"),
                 ("embedding", "array<float>", "vector")),
        primary_key=("vec_id",),
    )
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    vecs = tbl.column("embedding").to_pylist()
    cache = os.path.join(
        tempfile.gettempdir(), f"cdc_vec_knn_{len(ids)}"
    )
    marker = cache + ".complete"
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        ctypes = [ColumnType.LONGLONG, ColumnType.VECTOR]
        cmeta = [0, 4]
        uuid = "24bc7850-2c16-11e6-a073-0242ac110013"
        w = BinlogWriter("vec.000001")
        seq = 0

        def txn(write_body):
            nonlocal seq
            seq += 1
            w.write_mysql_gtid(uuid, seq)
            w.write_query("BEGIN", database="ml")
            w.write_table_map(71, "ml", "emb", ctypes, cmeta, [False, True])
            write_body()
            w.write_xid(seq)

        packed = [np.asarray(v, dtype="<f4").tobytes() for v in vecs]
        for lo in range(0, len(ids), 500):
            rows = [
                [int(i), p]
                for i, p in zip(ids[lo : lo + 500], packed[lo : lo + 500])
            ]
            txn(lambda: w.write_rows(71, ctypes, cmeta, rows))
        upd = [
            ([int(i), p], [int(i), np.frombuffer(p, "<f4").__neg__().tobytes()])
            for i, p in zip(ids, packed) if i % 5 == 0
        ]
        for lo in range(0, len(upd), 500):
            pairs = upd[lo : lo + 500]
            txn(lambda: w.write_update_rows(71, ctypes, cmeta, pairs))
        dels = [
            [int(i), p] for i, p in zip(ids, packed) if i % 97 == 3
        ]
        if dels:
            from ..binlog.constants import EventType

            txn(lambda: w.write_rows(
                71, ctypes, cmeta, dels,
                event_type=EventType.MYSQL_DELETE_ROWS_V2,
            ))
        w.save(os.path.join(cache, "vec.000001"))
        with open(marker, "w") as f:
            f.write("ok")
    store = tempfile.mkdtemp(prefix="cdc_vec_knn_store_")
    rep = Replayer(spark, cache, store, spec=spec)
    rep.replay()
    return rep.read_state()


def vector_knn_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC → lake → ANN, end-to-end: exact cosine top-k over the state a
    VECTOR-column binlog replay produced (``_vector_cdc_state``) — the
    full story F21 enables: embedding tables stream in as change events
    and are immediately searchable. Same plan shape as knn_bruteforce
    (broadcast query side, codegen'd dot products, one partial-agg
    top-k shuffle); the oracle replays the same deterministic changes
    in SQL, so a wrong LWW order, a lost delete, or a float32 decode
    defect shifts neighbors or scores."""
    emb = _vector_cdc_state(spark, sf_dir).selectExpr(
        "vec_id", f"{_DOUBLE_VEC} as v"
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id as q_id", "v as qv"
    )
    scored = q.hint("broadcast").crossJoin(emb).filter(
        "vec_id != q_id"
    ).selectExpr("q_id", "vec_id", f"{_cos_spark('qv', 'v')} as cos_sim")
    return (
        scored.selectExpr(
            "q_id", "vec_id", "cos_sim",
            "struct(-cos_sim as nc, vec_id as tie) as ord",
        )
        .groupBy("q_id")
        .agg(F.slice(
            F.array_sort(F.collect_list(F.struct("ord", "vec_id", "cos_sim"))),
            1, TOP_K,
        ).alias("top"))
        .selectExpr("q_id", "posexplode(top) as (rank0, t)")
        .selectExpr(
            "q_id", "rank0 + 1 as rank",
            "t.vec_id as neighbor_id", "t.cos_sim as cos_sim",
        )
    )


VECTOR_KNN_CDC_SQL = f"""
WITH state AS (
  SELECT vec_id,
         CASE WHEN vec_id % 5 = 0
              THEN list_transform(embedding, x -> CAST(-x AS FLOAT))
              ELSE embedding END AS embedding
  FROM embeddings WHERE vec_id % 97 != 3
), emb AS (
  SELECT vec_id, {_DOUBLE_VEC_DUCK} AS v FROM state
), q AS (
  SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q_id, e.vec_id, {_cos_duck('qv', 'e.v')} AS cos_sim
  FROM q CROSS JOIN emb e WHERE e.vec_id != q.q_id
), ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id)
           AS rank
  FROM scored
)
SELECT q_id, rank, vec_id AS neighbor_id, cos_sim
FROM ranked WHERE rank <= {TOP_K}
"""


QUERIES = {
    "knn_bruteforce": knn_bruteforce,
    "label_centroids": label_centroids,
    "knn_ivf": knn_ivf,
    "knn_ivf_probe2": knn_ivf_probe2,
    "embedding_neardup": embedding_neardup,
    "embedding_neardup_ivf": embedding_neardup_ivf,
    "embedding_quantize_int8": embedding_quantize_int8,
    "vector_knn_cdc": vector_knn_cdc,
}

ORACLES = {
    "knn_bruteforce": KNN_SQL,
    "label_centroids": CENTROIDS_SQL,
    "knn_ivf": KNN_IVF_SQL,
    "knn_ivf_probe2": KNN_IVF_PROBE2_SQL,
    "embedding_neardup": NEARDUP_SQL,
    "embedding_neardup_ivf": NEARDUP_IVF_SQL,
    "embedding_quantize_int8": QUANTIZE_SQL,
    "vector_knn_cdc": VECTOR_KNN_CDC_SQL,
}
