"""Replica-consistency checksums (pipeline/integrity.py): cross-engine
digest equality, drift detection, and plan pins."""

import duckdb
import pandas as pd
import pytest

from mysql_cdc_spark.pipeline.integrity import (
    checksum_sql_duck,
    chunked_checksum,
    diff_chunks,
)

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"]


def _rows(n=200):
    rows = []
    for i in range(n):
        rows.append(
            (
                f"conv-{i % 37}",
                i,
                ["user", "assistant", "system"][i % 3],
                f"text {i} with | pipe and unicode é{i}",
                None if i % 5 else f"tool_{i % 4}",
                1_000_000 + 17 * i,
            )
        )
    return pd.DataFrame(rows, columns=COLS)


@pytest.fixture(scope="module")
def pdf():
    return _rows()


@pytest.fixture(scope="module")
def state(spark, pdf):
    return spark.createDataFrame(pdf)


def _duck_digest(pdf, n_chunks=8):
    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(
        checksum_sql_duck("t", "conv_id", COLS, n_chunks)
    ).df()


def test_digest_matches_duckdb(state, pdf):
    sdf = (
        chunked_checksum(state, "conv_id", COLS, 8)
        .toPandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    odf = _duck_digest(pdf).sort_values("chunk_id").reset_index(drop=True)
    for c in ("chunk_id", "n_rows", "chunk_sum"):
        odf[c] = odf[c].astype("int64")
        sdf[c] = sdf[c].astype("int64")
    pd.testing.assert_frame_equal(sdf, odf)


def test_digest_is_order_insensitive(state):
    a = chunked_checksum(state, "conv_id", COLS, 8).toPandas()
    b = chunked_checksum(
        state.orderBy("ts_ms", ascending=False).repartition(7), "conv_id", COLS, 8
    ).toPandas()
    a = a.sort_values("chunk_id").reset_index(drop=True)
    b = b.sort_values("chunk_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_null_vs_empty_string_differ(spark):
    base = pd.DataFrame(
        [("c", 0, "user", "x", None, 1)], columns=COLS
    )
    empt = pd.DataFrame(
        [("c", 0, "user", "x", "", 1)], columns=COLS
    )
    da = chunked_checksum(spark.createDataFrame(base), "conv_id", COLS, 4).collect()
    db = chunked_checksum(spark.createDataFrame(empt), "conv_id", COLS, 4).collect()
    assert da[0]["chunk_sum"] != db[0]["chunk_sum"]


def test_diff_chunks_flags_drift(spark, state, pdf):
    # content drift: one text mutated
    drifted = pdf.copy()
    drifted.loc[3, "text"] = "tampered"
    d_content = diff_chunks(
        chunked_checksum(state, "conv_id", COLS, 8),
        chunked_checksum(spark.createDataFrame(drifted), "conv_id", COLS, 8),
    ).collect()
    assert len(d_content) == 1  # only the chunk holding conv-3's key drifts

    # row-count drift: one row missing
    short = pdf.iloc[1:]
    d_missing = diff_chunks(
        chunked_checksum(state, "conv_id", COLS, 8),
        chunked_checksum(spark.createDataFrame(short), "conv_id", COLS, 8),
    ).collect()
    assert len(d_missing) == 1
    (row,) = d_missing
    assert row["a_rows"] == row["b_rows"] + 1

    # identical replicas: no diff
    assert (
        diff_chunks(
            chunked_checksum(state, "conv_id", COLS, 8),
            chunked_checksum(state, "conv_id", COLS, 8),
        ).count()
        == 0
    )


def test_plan_shape(state):
    """One exchange, no UDF, no join — O(n_chunks) output."""
    plan = (
        chunked_checksum(state, "conv_id", COLS, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "Join" not in plan
