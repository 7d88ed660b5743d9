"""Transcript-native analytics (analytics/transcripts.py): hand-computed
expectations over a small in-memory state, plan-shape pins, and a DuckDB
oracle parity pass over the same rows.

The state schema mirrors what the replay tier materializes:
(conv_id, turn_idx, role, text, tool, ts_ms).
"""

import duckdb
import pandas as pd
import pytest

from mysql_cdc_spark.analytics import transcripts as T

ROWS = [
    # conv a: user/assistant/user/assistant with a tool call, one turn
    # deleted upstream (turn 2 absent -> adjacency must bridge the gap)
    ("a", 0, "user", "hi", "", 1_000),
    ("a", 1, "assistant", "hello there", "search", 2_000),
    ("a", 3, "user", "thanks", "", 3_000),
    ("a", 4, "assistant", "bye", "", 4_500),
    # conv b: system-led, no user->assistant adjacency
    ("b", 0, "system", "rules", "", 10_000),
    ("b", 1, "assistant", "ack", "calc", 9_000),  # negative gap (update)
    # conv c: lone user turn
    ("c", 0, "user", "ping", "", 5_000),
]
COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"]


@pytest.fixture(scope="module")
def state(spark):
    return spark.createDataFrame(pd.DataFrame(ROWS, columns=COLS))


def _by(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


def test_reassemble_orders_and_joins(state):
    out = _by(T.reassemble(state), "conv_id")
    assert out["a"]["n_turns"] == 4
    assert out["a"]["dialogue"] == (
        "user: hi\nassistant: hello there\nuser: thanks\nassistant: bye"
    )
    assert out["c"]["dialogue"] == "user: ping"


def test_reassemble_orders_regardless_of_input_order(state):
    # state arrives in arbitrary partition order at scale; the op must
    # not depend on insertion order
    shuffled = state.orderBy("ts_ms", ascending=False)
    out = _by(T.reassemble(shuffled), "conv_id")
    assert out["a"]["dialogue"].startswith("user: hi\nassistant:")


def test_conversation_stats(state):
    out = _by(T.conversation_stats(state), "conv_id")
    a = out["a"]
    assert (a["n_turns"], a["n_user"], a["n_assistant"]) == (4, 2, 2)
    assert a["n_tool_calls"] == 1 and a["n_distinct_tools"] == 1
    assert a["n_chars"] == len("hi") + len("hello there") + len("thanks") + len("bye")
    assert (a["first_ts_ms"], a["last_ts_ms"], a["span_ms"]) == (1_000, 4_500, 3_500)
    assert out["c"]["span_ms"] == 0 and out["c"]["n_distinct_tools"] == 0


def test_tool_usage(state):
    out = _by(T.tool_usage(state), "tool")
    assert set(out) == {"search", "calc"}
    assert out["search"]["n_calls"] == 1
    assert out["search"]["n_conversations"] == 1
    assert out["search"]["avg_text_chars"] == float(len("hello there"))


def test_sft_pairs_survivor_adjacency(state):
    rows = T.sft_pairs(state).collect()
    got = {(r.conv_id, r.prompt_turn_idx): r for r in rows}
    # turn 3 -> 4 is a pair; turn 0 -> 1 is a pair; the deleted turn 2
    # does not block 3->4 adjacency; conv b/c contribute nothing
    assert set(got) == {("a", 0), ("a", 3)}
    assert got[("a", 3)].response == "bye"
    assert got[("a", 3)].response_turn_idx == 4


def test_role_patterns(state):
    out = _by(T.role_patterns(state), "role_pattern")
    assert out["uaua"]["n_conversations"] == 1
    assert out["sa"]["example_conv"] == "b"
    assert out["u"]["n_conversations"] == 1


def test_turn_latency_reports_negative_gaps(state):
    out = _by(T.turn_latency(state), "conv_id")
    assert "c" not in out  # single turn -> no gaps
    assert out["a"]["n_gaps"] == 3 and out["a"]["max_gap_ms"] == 1_500
    assert out["b"]["min_gap_ms"] == -1_000  # update-rewritten ts surfaces


def test_duckdb_oracle_parity_on_shared_rows(spark, state, tmp_path):
    """The module ORACLES run against the replayed fixture corpus; this
    pins the analytics SQL itself against the DataFrame ops on rows with
    known edge cases (deleted turn, negative gap, empty tool)."""
    con = duckdb.connect()
    con.register("state_v", pd.DataFrame(ROWS, columns=COLS))
    analytic_sql = {
        name: "WITH state AS (SELECT * FROM state_v)" + sql[len(T._STATE_SQL):]
        for name, sql in T.ORACLES.items()
    }
    for name, fn in {
        "transcript_reassembly": T.reassemble,
        "transcript_stats": T.conversation_stats,
        "transcript_tool_usage": T.tool_usage,
        "transcript_sft_pairs": T.sft_pairs,
        "transcript_role_patterns": T.role_patterns,
        "transcript_turn_latency": T.turn_latency,
    }.items():
        sdf = fn(state).toPandas()
        odf = con.execute(analytic_sql[name]).df()
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        for c in odf.columns:
            if pd.api.types.is_integer_dtype(odf[c]):
                odf[c] = odf[c].astype("int64")
            if pd.api.types.is_integer_dtype(sdf[c]):
                sdf[c] = sdf[c].astype("int64")
        key = list(sdf.columns)
        sdf = sdf.sort_values(key).reset_index(drop=True)
        odf = odf.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(sdf, odf, check_dtype=False), name


def test_plan_shapes(state):
    """Scale pins: single-exchange aggregates, no joins anywhere, no
    Python UDFs (BatchEvalPython) in any transcript plan."""
    for fn in (T.reassemble, T.conversation_stats, T.tool_usage,
               T.sft_pairs, T.role_patterns, T.turn_latency):
        plan = fn(state)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, fn.__name__
        assert "BatchEvalPython" not in plan, fn.__name__
    # one shuffle for the single-agg ops; the count-distinct in
    # conversation_stats legitimately adds the distinct-expand exchange
    # (still keyed on conv_id — key-local at scale)
    # (tool_usage's count-distinct-conv_id likewise expands)
    for fn, max_exchanges in ((T.reassemble, 1), (T.tool_usage, 2),
                              (T.conversation_stats, 2)):
        plan = fn(state)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= max_exchanges, fn.__name__


def test_context_fit_budget_math(state):
    out = _by(T.context_fit(state, budget=3), "conv_id")
    # conv a tokens per turn: hi=1, "hello there"=2, thanks=1, bye=1
    # cums: 1,3,4,5 -> turns_in_budget=2, total=5, doesn't fit
    a = out["a"]
    assert (a["n_turns"], a["total_tokens"]) == (4, 5)
    assert a["turns_in_budget"] == 2 and a["fits_budget"] == 0
    # conv c: single 1-token turn fits
    assert out["c"]["fits_budget"] == 1 and out["c"]["turns_in_budget"] == 1


def test_pack_conversations_budget_math(state):
    # one shard so the greedy order is deterministic: a(5), b(2), c(1)
    # cums 5,7,8 with budget=4 -> a starts in bin 0 (overflows by 1),
    # b and c both start in bin 1
    out = {(r["shard"], r["bin_id"]): r.asDict()
           for r in T.pack_conversations(state, budget=4, shards=1).collect()}
    assert out[(0, 0)]["n_conversations"] == 1
    assert out[(0, 0)]["bin_tokens"] == 5
    assert out[(0, 1)]["n_conversations"] == 2
    assert out[(0, 1)]["bin_tokens"] == 3
    assert out[(0, 1)]["fill_ratio"] == 0.75


def test_pack_conversations_whole_and_planar(state):
    # every conversation lands in exactly one bin (never split), and the
    # plan stays join-free / UDF-free
    df = T.pack_conversations(state, budget=4, shards=2)
    total = sum(r["n_conversations"] for r in df.collect())
    assert total == state.select("conv_id").distinct().count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "BatchEvalPython" not in plan


_LONG = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions under a pale winter moon"
)

NEARDUP_ROWS = [
    # x and y: identical 3-turn history except y's last turn is a
    # regenerated variant -> near-dup pair (jaccard well above 0.5)
    ("x", 0, "user", _LONG, "", 1_000),
    ("x", 1, "assistant", _LONG + " indeed truly", "", 2_000),
    ("x", 2, "user", _LONG, "", 3_000),
    ("y", 0, "user", _LONG, "", 1_000),
    ("y", 1, "assistant", _LONG + " indeed truly", "", 2_000),
    ("y", 2, "user", _LONG + " but rewritten slightly", "", 3_000),
    # z: disjoint vocabulary -> must pair with nothing
    ("z", 0, "user", "completely unrelated words about spark plans "
                     "and shuffle exchanges at petabyte corpus scale", "", 1_000),
]


def test_conversation_neardup_finds_fork_and_discriminates(spark):
    st = spark.createDataFrame(pd.DataFrame(NEARDUP_ROWS, columns=COLS))
    rows = T.conversation_neardup(st).collect()
    pairs = {(r["conv_a"], r["conv_b"]) for r in rows}
    assert pairs == {("x", "y")}
    (j,) = [r["jaccard"] for r in rows]
    assert 0.5 <= j < 1.0


def test_conversation_neardup_threshold_is_exact_jaccard(spark):
    st = spark.createDataFrame(pd.DataFrame(NEARDUP_ROWS, columns=COLS))
    # raising the threshold above the pair's verified jaccard drops it:
    # the LSH candidates are identical, so this pins the exact-verify gate
    (j,) = [r["jaccard"] for r in T.conversation_neardup(st).collect()]
    assert T.conversation_neardup(st, threshold=j + 0.01).count() == 0
    assert T.conversation_neardup(st, threshold=j).count() == 1


def test_conversation_neardup_no_python_udf(spark):
    st = spark.createDataFrame(pd.DataFrame(NEARDUP_ROWS, columns=COLS))
    plan = T.conversation_neardup(st)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
