"""Transcript-native analytics over the CDC-maintained conversation table.

The engine's payload is multi-turn conversation / agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json input_hint;
the same table every ``cdc_replay_*_e2e`` entry reconstructs). This
module is the consumption tier: the queries a training-data pipeline
runs *on top of* the replayed state — conversation reassembly under the
stable turn ordering the north rule's per-turn invariant names,
per-conversation statistics, tool-usage rollups, SFT prompt/response
pair mining, role-sequence fingerprints, and turn-latency profiles.

Input: the final transcript state produced by a real end-to-end binlog
replay (``pipeline.replay.Replayer`` over the deterministic fixture
corpus — the same seeded knobs as ``cdc_replay_e2e``), materialized
once per process to a parquet cache. The DuckDB oracles replay the
dual-written *logical* changelog sequentially in SQL (first-delivery
idempotence + last-writer-wins, mirroring ``order.last_writer_wins``)
and apply the equivalent analytics SQL on top, so every entry checks
the full path: binlog bytes -> decode -> LWW merge -> analytics.

Scale notes (the 100 TB question): every op here is one or two
key-local exchanges on ``conv_id`` with map-side combine, zero Python
UDFs, zero joins. ``collect_list`` groups are bounded by conversation
length (turns per conversation, not corpus size), so reassembly and
fingerprints never build unbounded state — the canonical "group is
human-bounded" case where collect_list is safe at any corpus size.
Windows partition by ``conv_id`` (millions of small partitions, no
skew beyond the hot-conversation salting the merge tier already
handles upstream).

Reference scope: the reference (rusuly/mysql_cdc) stops at decoded
events (src/events/*.rs); this consumption tier is beyond-reference,
SURVEY.md §2.11.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Deterministic fixture knobs — MUST stay in sync with
# ``__spark_entry__._E2E_KNOBS`` so the binlog corpus cache
# (``cdc_e2e_binlog_mysql_full_full``) is shared with the e2e entries
# and generated at most once per round.
_KNOBS = dict(n_conversations=20, n_extra_ops=60, seed=7, duplicate_txns=3)
_TXNS_PER_FILE = 40

_TMP = tempfile.gettempdir()
_CHANGELOG_PARQUET = os.path.join(_TMP, "transcript_analytics_changelog.parquet")
_STATE_DIR = os.path.join(_TMP, "transcript_analytics_state")
_BINLOG_DIR = os.path.join(_TMP, "cdc_e2e_binlog_mysql_full_full")


def ensure_oracle_inputs() -> str:
    """Dual-write the logical changelog so DuckDB can replay it in SQL.

    Idempotent and cheap (seeded generator, one small parquet); called
    from ``__spark_entry__.oracle_sql()`` because the driver may run
    oracles before (or without) the Spark-side queries.
    """
    from mysql_cdc_spark.fixtures import generate_changelog, write_changelog_parquet

    txns = generate_changelog(**_KNOBS)
    return write_changelog_parquet(txns, _CHANGELOG_PARQUET)


def _ensure_binlog() -> str:
    """Deterministic binlog corpus, shared byte-for-byte with the
    ``cdc_replay_e2e`` cache (same knobs, same writer parameters)."""
    done = _BINLOG_DIR + ".complete"
    if not os.path.exists(done):
        import shutil

        from mysql_cdc_spark.fixtures import generate_changelog, write_binlog_files

        shutil.rmtree(_BINLOG_DIR, ignore_errors=True)
        txns = generate_changelog(**_KNOBS)
        write_binlog_files(txns, _BINLOG_DIR, txns_per_file=_TXNS_PER_FILE)
        with open(done, "w") as f:
            f.write("ok")
    return _BINLOG_DIR


def _state(spark: SparkSession) -> DataFrame:
    """Final transcript state from a real end-to-end replay, cached as
    parquet per process tempdir. Columns: conv_id, turn_idx, role,
    text, tool (coalesced to ''), ts_ms."""
    done = _STATE_DIR + ".complete"
    if not os.path.exists(done):
        from mysql_cdc_spark.pipeline.replay import Replayer

        binlog_dir = _ensure_binlog()
        store = tempfile.mkdtemp(prefix="transcript_analytics_store_")
        rep = Replayer(spark, binlog_dir, store, salt_buckets=4)
        rep.replay()
        (
            rep.read_state()
            .select(
                "conv_id",
                "turn_idx",
                "role",
                "text",
                F.coalesce(F.col("tool"), F.lit("")).alias("tool"),
                F.unix_millis(F.col("ts")).alias("ts_ms"),
            )
            .write.mode("overwrite")
            .parquet(_STATE_DIR)
        )
        with open(done, "w") as f:
            f.write("ok")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(_STATE_DIR)


# ---------------------------------------------------------------------------
# the operators (each takes the state DataFrame; thin (spark, sf_dir)
# wrappers at the bottom feed the driver harness)
# ---------------------------------------------------------------------------


def reassemble(state: DataFrame, sep: str = "\n") -> DataFrame:
    """Rebuild each conversation as one ordered document.

    The north rule's correctness invariant — per-turn text equality
    under *stable turn ordering* — expressed as a query: sort the
    surviving turns of each conversation by ``turn_idx`` and join
    ``role: text`` lines. This is the exact form a pretraining tokenizer
    consumes.

    Plan: one hash-aggregate exchange on ``conv_id``;
    ``array_sort(collect_list(struct(turn_idx, ...)))`` orders within
    the bounded group without a global sort, then a codegen
    ``transform``/``array_join`` builds the document JVM-side.
    """
    turns = F.array_sort(
        F.collect_list(F.struct("turn_idx", "role", "text"))
    ).alias("turns")
    return (
        state.groupBy("conv_id")
        .agg(turns)
        .select(
            "conv_id",
            F.size("turns").cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    "turns", lambda s: F.concat_ws(": ", s.role, s.text)
                ),
                sep,
            ).alias("dialogue"),
        )
    )


def conversation_stats(state: DataFrame) -> DataFrame:
    """Per-conversation profile: turn counts by role, tool-call count,
    character volume, distinct tools, and wall-clock span — the
    filter/stratification columns a corpus-mixing policy keys on.

    Plan: a single combinable aggregation (every measure has a partial
    form, including the count-distinct which Spark runs as a two-level
    partial_count_distinct) — one exchange on ``conv_id``.
    """
    one_if = lambda cond: F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
    return (
        state.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            one_if(F.col("role") == "user").alias("n_user"),
            one_if(F.col("role") == "assistant").alias("n_assistant"),
            one_if(F.col("tool") != "").alias("n_tool_calls"),
            F.sum(F.length("text")).alias("n_chars"),
            F.count_distinct(
                F.when(F.col("tool") != "", F.col("tool"))
            ).alias("n_distinct_tools"),
            F.min("ts_ms").alias("first_ts_ms"),
            F.max("ts_ms").alias("last_ts_ms"),
            (F.max("ts_ms") - F.min("ts_ms")).alias("span_ms"),
        )
    )


def tool_usage(state: DataFrame) -> DataFrame:
    """Corpus-wide tool rollup: how often each tool is invoked, in how
    many conversations, and the mean size of the turns that carry it.

    Plan: filter pushes to the scan (``tool <> ''``), then one
    combinable aggregation on ``tool`` — low-cardinality keys, so the
    exchange is a few rows per partition after map-side combine.
    """
    return (
        state.where(F.col("tool") != "")
        .groupBy("tool")
        .agg(
            F.count("*").alias("n_calls"),
            F.count_distinct("conv_id").alias("n_conversations"),
            F.round(F.avg(F.length("text")), 4).alias("avg_text_chars"),
        )
    )


def sft_pairs(state: DataFrame) -> DataFrame:
    """Mine (user -> assistant) adjacent-turn training pairs.

    Adjacency is over the *surviving* turn order (deletes collapse the
    sequence, exactly as a pair-mining job over the live table would
    see it): a pair is a user turn whose next surviving turn in the
    same conversation is an assistant turn.

    Plan: one window exchange on ``conv_id`` (``lead`` over turn_idx),
    then a codegen filter — no join, no second shuffle.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        state.select(
            "conv_id",
            F.col("turn_idx").alias("prompt_turn_idx"),
            F.col("role"),
            F.col("text").alias("prompt"),
            F.lead("role").over(w).alias("next_role"),
            F.lead("turn_idx").over(w).alias("response_turn_idx"),
            F.lead("text").over(w).alias("response"),
        )
        .where((F.col("role") == "user") & (F.col("next_role") == "assistant"))
        .select(
            "conv_id", "prompt_turn_idx", "prompt",
            "response_turn_idx", "response",
        )
    )


def role_patterns(state: DataFrame) -> DataFrame:
    """Group conversations by their role-sequence fingerprint (ordered
    first letters, e.g. ``uasa``) — the cheap structural clustering a
    curation pass uses to stratify dialogue shapes.

    Plan: two key-local aggregations (conv_id, then pattern), both
    combinable; the second keys on short strings with heavy duplication
    so the final exchange is tiny.
    """
    pattern = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("turn_idx", F.substring("role", 1, 1).alias("r"))
                )
            ),
            lambda s: s.r,
        ),
        "",
    ).alias("role_pattern")
    per_conv = state.groupBy("conv_id").agg(pattern)
    return per_conv.groupBy("role_pattern").agg(
        F.count("*").alias("n_conversations"),
        F.min("conv_id").alias("example_conv"),
    )


def turn_latency(state: DataFrame) -> DataFrame:
    """Per-conversation timing profile: gaps between consecutive
    surviving turns (lag over turn order). Negative gaps are real data
    — a later UPDATE rewrites an earlier turn's timestamp — and are
    reported, not masked.

    Plan: one window exchange on ``conv_id`` + one combinable
    aggregation on the same key; AQE coalesces the post-window
    partitions.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = state.select(
        "conv_id",
        (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap_ms"),
    ).where(F.col("gap_ms").isNotNull())
    return gaps.groupBy("conv_id").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap_ms"), 4).alias("avg_gap_ms"),
        F.max("gap_ms").alias("max_gap_ms"),
        F.min("gap_ms").alias("min_gap_ms"),
    )


def conversation_neardup(state: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Conversation-level near-duplicate detection: reassemble each
    conversation into its ordered dialogue document, then mine
    near-identical pairs with the corpus tier's MinHash+LSH pair miner
    (``text.minhash_lsh_pairs`` — word-3-gram shingles → k=8 affine
    minhashes → 4-band bucket join → exact-Jaccard verify ≥ threshold).

    This is the dedup pass a dialogue-SFT pipeline runs over a live,
    CDC-maintained transcript table: regenerated or branched
    conversations (same history, one rewritten turn) are near-identical
    documents that exact dedup misses — LSH surfaces them without ever
    comparing conversations pairwise.

    Plan: reassembly is one exchange on ``conv_id``; the LSH stages add
    one exchange on (band, key) carrying 4×40 B per conversation and a
    candidates-only verify join — no stage touches dialogue text after
    shingling, so the op scales with conversations, not corpus bytes.
    """
    from .text import minhash_lsh_pairs

    docs = reassemble(state).select("conv_id", "dialogue")
    return minhash_lsh_pairs(
        docs, "conv_id", "dialogue", threshold=threshold, out_prefix="conv"
    )


# deterministic fork construct for the harness: conversations whose id
# ends in 0-4 get a regenerated branch — same history, turn 0 rewritten —
# the exact shape near-dup must surface (and the others must NOT pair)
_FORK_PRED = "right(conv_id, 1) IN ('0','1','2','3','4')"
_FORK_SUFFIX = "~fork"
_FORK_TEXT = "CASE WHEN turn_idx = 0 THEN text || ' regenerated variant' ELSE text END"


def transcript_conversation_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = _state(spark)
    forked = state.where(_FORK_PRED).selectExpr(
        f"conv_id || '{_FORK_SUFFIX}' AS conv_id",
        "turn_idx",
        "role",
        f"{_FORK_TEXT} AS text",
        "tool",
        "ts_ms",
    )
    return conversation_neardup(state.unionByName(forked))


# ---------------------------------------------------------------------------
# driver harness wrappers + DuckDB oracles
# ---------------------------------------------------------------------------


def transcript_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return reassemble(_state(spark))


def transcript_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return conversation_stats(_state(spark))


def transcript_tool_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tool_usage(_state(spark))


def transcript_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sft_pairs(_state(spark))


def transcript_role_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return role_patterns(_state(spark))


def transcript_turn_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return turn_latency(_state(spark))


_CONTEXT_TOKENS = 64   # training context budget (small to be non-vacuous
                       # at fixture scale; the op is budget-parametric)


def context_fit(state: DataFrame, budget: int = _CONTEXT_TOKENS) -> DataFrame:
    """Context-window fit analysis: how much of each conversation fits a
    ``budget``-token training context when turns stream in order — the
    decision input for truncate-vs-split policies in a dialogue-SFT
    pipeline. Tokens = whitespace words (the same cheap estimator the
    corpus ops use).

    Plan: one window exchange on ``conv_id`` (running token sum over
    turn order) + one combinable aggregation on the same key.
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = state.select(
        "conv_id",
        F.expr(r"size(split(trim(text), '\\s+'))").alias("n_tokens"),
        F.sum(F.expr(r"size(split(trim(text), '\\s+'))")).over(w).alias("cum"),
    )
    return toks.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.when(F.col("cum") <= budget, 1).otherwise(0)).alias(
            "turns_in_budget"
        ),
        (F.max("cum") <= budget).cast("int").alias("fits_budget"),
    )


def transcript_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return context_fit(_state(spark))


_PACK_BUDGET = 256  # tokens per packed training sequence
_PACK_SHARDS = 4    # greedy packing parallelism (raise at scale)


def pack_conversations(
    state: DataFrame, budget: int = _PACK_BUDGET, shards: int = _PACK_SHARDS
) -> DataFrame:
    """Pack whole conversations into fixed-token training sequences —
    the dialogue-SFT twin of ``corpus.doc_pack_sequences``. The packing
    unit is the conversation (a dialogue is never split mid-history),
    sized by its total whitespace-token count; a conversation belongs to
    the bin its cumulative range STARTS in, so a bin overflows by at
    most one conversation — the standard streaming-packing trade.

    Greedy packing is sequential, so the corpus shards first on
    ``H(conv_id) % shards`` and packs independently per shard: waste is
    bounded (≤1 underfull bin per shard) and parallelism is the shard
    count. Plan: one exchange on ``conv_id`` (token rollup), one on
    ``shard`` (running-sum window), one combinable aggregate — at 100 TB
    raise ``shards``; nothing else changes.
    """
    from pyspark.sql import Window

    shard_h = (
        "cast(conv(substring(md5(concat('pack:', conv_id)), 1, 15), 16, 10)"
        " as bigint)"
    )
    per_conv = state.groupBy("conv_id").agg(
        F.sum(F.expr(r"size(split(trim(text), '\\s+'))")).alias("n_tokens")
    ).selectExpr("conv_id", f"{shard_h} % {shards} as shard", "n_tokens")
    w = (
        Window.partitionBy("shard")
        .orderBy("conv_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = per_conv.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id", F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(budget))
    )
    return (
        binned.groupBy("shard", "bin_id")
        .agg(
            F.count("*").alias("n_conversations"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.round(F.sum("n_tokens") / F.lit(budget), 4).alias("fill_ratio"),
        )
        .select("shard", "bin_id", "n_conversations", "bin_tokens", "fill_ratio")
    )


def transcript_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_conversations(_state(spark))


_CHECKSUM_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"]
_CHECKSUM_CHUNKS = 16


_REPAIR_STATE_DIR = os.path.join(_TMP, "transcript_repair_state")

# portable drift predicate: convs whose id ends in 0-4 get corrected
_DRIFT_PRED = "right(conv_id, 1) IN ('0','1','2','3','4')"


def transcript_repair_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full consistency protocol, end-to-end, against a live store:
    replay the binlog corpus into a FRESH store, drift the source of
    truth deterministically (corrected turn-0 texts + retracted system
    turns + appended audit rows, for half the conversations), localize
    the drift with ``Replayer.checksum``/``diff_chunks`` (asserting the
    undrifted chunks digest clean), ``repair`` only the drifted chunks,
    and return the final state. The oracle applies the same mutation in
    SQL over its own sequential replay — so a pass proves the repair
    merge produced exactly the corrected table, byte-for-byte, while
    leaving untouched chunks alone.
    """
    done = _REPAIR_STATE_DIR + ".complete"
    if not os.path.exists(done):
        from mysql_cdc_spark.pipeline.integrity import (
            chunked_checksum,
            diff_chunks,
        )
        from mysql_cdc_spark.pipeline.replay import Replayer

        binlog_dir = _ensure_binlog()
        store = tempfile.mkdtemp(prefix="transcript_repair_store_")
        rep = Replayer(spark, binlog_dir, store, salt_buckets=4)
        rep.replay()
        spec_cols = [c for c, _, _ in rep.target.spec.columns]
        state = rep.read_state().select(*spec_cols)
        truth = state.selectExpr(
            "conv_id", "turn_idx", "role",
            f"CASE WHEN {_DRIFT_PRED} AND turn_idx = 0 "
            "THEN 'corrected: ' || conv_id ELSE text END AS text",
            "ts", "tool",
        ).where(f"NOT ({_DRIFT_PRED} AND role = 'system')").unionByName(
            state.where(_DRIFT_PRED)
            .select("conv_id")
            .distinct()
            .selectExpr(
                "conv_id", "CAST(10000 AS INT) AS turn_idx",
                "'audit' AS role", "'audit row ' || conv_id AS text",
                "timestamp_millis(0) AS ts", "'' AS tool",
            )
        ).select(*spec_cols)
        n_chunks = _CHECKSUM_CHUNKS
        bad = diff_chunks(
            rep.checksum(n_chunks=n_chunks),
            chunked_checksum(truth, "conv_id", spec_cols, n_chunks),
        )
        bad_ids = [r["chunk_id"] for r in bad.collect()]
        rep.repair(truth, chunk_ids=bad_ids, n_chunks=n_chunks)
        (
            rep.read_state()
            .select(
                "conv_id", "turn_idx", "role", "text",
                F.coalesce(F.col("tool"), F.lit("")).alias("tool"),
                F.unix_millis(F.col("ts")).alias("ts_ms"),
            )
            .write.mode("overwrite")
            .parquet(_REPAIR_STATE_DIR)
        )
        with open(done, "w") as f:
            f.write("ok")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(_REPAIR_STATE_DIR)


def transcript_state_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica-consistency digest of the replayed state
    (pipeline/integrity.py, the pt-table-checksum analog): per-chunk
    row counts + order-insensitive 128-bit-summed row hashes. The
    oracle computes the identical digest over its own sequential SQL
    replay — so a pass means the two engines' *full table contents*
    agree, not just the digest plumbing.
    """
    from mysql_cdc_spark.pipeline.integrity import chunked_checksum

    return chunked_checksum(
        _state(spark), "conv_id", _CHECKSUM_COLS, _CHECKSUM_CHUNKS
    )


# Sequential SQL replay of the dual-written logical changelog (identical
# rules to __spark_entry__.E2E_REPLAY_SQL_TEMPLATE: at-most-once per
# transaction seq, last-writer over (seq, op_ord), deletes remove).
_STATE_SQL = f"""
WITH ops AS (
  SELECT * FROM read_parquet('{_CHANGELOG_PARQUET}')
), first_occ AS (
  SELECT seq, min(txn_ord) AS txn_ord FROM ops GROUP BY seq
), applied AS (
  SELECT o.* FROM ops o JOIN first_occ f USING (seq, txn_ord)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY seq DESC, op_ord DESC) AS rn
  FROM applied
), state AS (
  SELECT conv_id, turn_idx, role, text, coalesce(tool, '') AS tool, ts_ms
  FROM ranked WHERE rn = 1 AND kind <> 'delete'
)
"""

QUERIES = {
    "transcript_reassembly": transcript_reassembly,
    "transcript_stats": transcript_stats,
    "transcript_tool_usage": transcript_tool_usage,
    "transcript_sft_pairs": transcript_sft_pairs,
    "transcript_role_patterns": transcript_role_patterns,
    "transcript_turn_latency": transcript_turn_latency,
    "transcript_state_checksum": transcript_state_checksum,
    "transcript_repair_roundtrip": transcript_repair_roundtrip,
    "transcript_context_fit": transcript_context_fit,
    "transcript_conversation_neardup": transcript_conversation_neardup,
    "transcript_pack": transcript_pack,
}

ORACLES = {
    "transcript_reassembly": _STATE_SQL + """
SELECT conv_id, count(*)::BIGINT AS n_turns,
       string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
         AS dialogue
FROM state GROUP BY conv_id
""",
    "transcript_stats": _STATE_SQL + """
SELECT conv_id,
       count(*)::BIGINT AS n_turns,
       count(*) FILTER (WHERE role = 'user')::BIGINT AS n_user,
       count(*) FILTER (WHERE role = 'assistant')::BIGINT AS n_assistant,
       count(*) FILTER (WHERE tool <> '')::BIGINT AS n_tool_calls,
       sum(length(text))::BIGINT AS n_chars,
       count(DISTINCT CASE WHEN tool <> '' THEN tool END)::BIGINT
         AS n_distinct_tools,
       min(ts_ms) AS first_ts_ms,
       max(ts_ms) AS last_ts_ms,
       (max(ts_ms) - min(ts_ms))::BIGINT AS span_ms
FROM state GROUP BY conv_id
""",
    "transcript_tool_usage": _STATE_SQL + """
SELECT tool,
       count(*)::BIGINT AS n_calls,
       count(DISTINCT conv_id)::BIGINT AS n_conversations,
       round(avg(length(text)), 4) AS avg_text_chars
FROM state WHERE tool <> '' GROUP BY tool
""",
    "transcript_sft_pairs": _STATE_SQL + """
, seq_turns AS (
  SELECT conv_id, turn_idx, role, text,
         lead(role) OVER w AS next_role,
         lead(turn_idx) OVER w AS response_turn_idx,
         lead(text) OVER w AS response
  FROM state
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx AS prompt_turn_idx, text AS prompt,
       response_turn_idx, response
FROM seq_turns WHERE role = 'user' AND next_role = 'assistant'
""",
    "transcript_role_patterns": _STATE_SQL + """
, per_conv AS (
  SELECT conv_id,
         string_agg(substr(role, 1, 1), '' ORDER BY turn_idx)
           AS role_pattern
  FROM state GROUP BY conv_id
)
SELECT role_pattern, count(*)::BIGINT AS n_conversations,
       min(conv_id) AS example_conv
FROM per_conv GROUP BY role_pattern
""",
    "transcript_turn_latency": _STATE_SQL + """
, gaps AS (
  SELECT conv_id,
         ts_ms - lag(ts_ms) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS gap_ms
  FROM state
)
SELECT conv_id, count(*)::BIGINT AS n_gaps,
       round(avg(gap_ms), 4) AS avg_gap_ms,
       max(gap_ms) AS max_gap_ms,
       min(gap_ms) AS min_gap_ms
FROM gaps WHERE gap_ms IS NOT NULL GROUP BY conv_id
""",
}


def _checksum_oracle() -> str:
    from mysql_cdc_spark.pipeline.integrity import checksum_sql_duck

    return _STATE_SQL + checksum_sql_duck(
        "state", "conv_id", _CHECKSUM_COLS, _CHECKSUM_CHUNKS
    )


ORACLES["transcript_state_checksum"] = _checksum_oracle()

ORACLES["transcript_context_fit"] = _STATE_SQL + f"""
, toks AS (
  SELECT conv_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         sum(len(regexp_split_to_array(trim(text), '\\s+')))
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS cum
  FROM state
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       sum(n_tokens)::BIGINT AS total_tokens,
       sum(CASE WHEN cum <= {_CONTEXT_TOKENS} THEN 1 ELSE 0 END)::BIGINT
         AS turns_in_budget,
       (max(cum) <= {_CONTEXT_TOKENS})::INT AS fits_budget
FROM toks GROUP BY conv_id
"""

ORACLES["transcript_pack"] = _STATE_SQL + f"""
, per_conv AS (
  SELECT conv_id,
         (('0x' || substr(md5('pack:' || conv_id), 1, 15))::BIGINT)
           % {_PACK_SHARDS} AS shard,
         sum(len(regexp_split_to_array(trim(text), '\\s+')))::BIGINT
           AS n_tokens
  FROM state GROUP BY conv_id
), c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY conv_id) AS cum
  FROM per_conv
)
SELECT shard, ((cum - n_tokens) // {_PACK_BUDGET})::BIGINT AS bin_id,
       count(*)::BIGINT AS n_conversations,
       sum(n_tokens)::BIGINT AS bin_tokens,
       round(sum(n_tokens) / {_PACK_BUDGET}, 4) AS fill_ratio
FROM c GROUP BY shard, bin_id
"""


def _neardup_oracle() -> str:
    from .text import minhash_pairs_sql

    return _STATE_SQL + f"""
, nd_src AS (
  SELECT conv_id, turn_idx, role, text FROM state
  UNION ALL
  SELECT conv_id || '{_FORK_SUFFIX}' AS conv_id, turn_idx, role,
         {_FORK_TEXT} AS text
  FROM state WHERE {_FORK_PRED}
), nd_docs AS (
  SELECT conv_id,
         string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
           AS dialogue
  FROM nd_src GROUP BY conv_id
), """ + minhash_pairs_sql(
        "nd_docs", "conv_id", "dialogue", threshold=0.5, out_prefix="conv"
    )


ORACLES["transcript_conversation_neardup"] = _neardup_oracle()

# the corrected table the repair must converge the store to, computed
# directly over the oracle's own sequential replay
ORACLES["transcript_repair_roundtrip"] = _STATE_SQL + f"""
, truth AS (
  SELECT conv_id, turn_idx, role,
         CASE WHEN {_DRIFT_PRED} AND turn_idx = 0
              THEN 'corrected: ' || conv_id ELSE text END AS text,
         tool, ts_ms
  FROM state
  WHERE NOT ({_DRIFT_PRED} AND role = 'system')
  UNION ALL
  SELECT DISTINCT conv_id, CAST(10000 AS INTEGER) AS turn_idx,
         'audit' AS role, 'audit row ' || conv_id AS text,
         '' AS tool, CAST(0 AS BIGINT) AS ts_ms
  FROM state WHERE {_DRIFT_PRED}
)
SELECT conv_id, turn_idx, role, text, tool, ts_ms FROM truth
"""
