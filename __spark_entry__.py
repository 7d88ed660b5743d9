"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (CDC last-writer-wins state
  reconstruction + dim enrichment) over /root/testdata/sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 that is
  expressible over the driver testdata tables, plus the training-data
  pipeline ops (dedup / similarity / text / multimodal) and the
  end-to-end binlog replay.
- ``oracle_sql()``: DuckDB-equivalent SQL for each (31 oracle-checked as
  of round 2 — including multimodal_features via exact-integer features;
  omitted only for the binlog replay, whose input is generated binlog
  bytes, not the parquet views).

The binlog-native pipeline (decode kernels, GTID algebra, exactly-once
ledger, MERGE targets) is additionally pinned by the pytest golden
fixtures ported from the reference (tests/).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql_cdc_spark.analytics import cdc_ops, embeddings, multimodal, relational, text


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC-style state reconstruction over the events stream.

    Last-writer-wins final state per user (W1, aggregate form with
    map-side combine) enriched by a broadcast dimension join (J1) —
    the two operators the 10^10-event merge-apply pipeline lives on.
    """
    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    state = cdc_ops.w1_lww_last_event(spark, sf_dir)
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
    )
    return state.join(
        F.broadcast(cust), state.user_id == cust.c_custkey, "left"
    ).select(
        "user_id", "last_event_id", "last_event_type", "last_value",
        "n_events", "c_mktsegment",
    )


def cdc_replay_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binlog replay: deterministic transcript changelog →
    binlog-format bytes → distributed decode (mapInPandas) → transaction
    gate → LWW → MERGE → final transcript state. Input is generated
    binlog bytes (seeded, independent of sf_dir) — rows-only check here;
    full state equality vs the sequential oracle is pinned in
    tests/test_replay_e2e.py."""
    from mysql_cdc_spark.fixtures import generate_changelog, write_binlog_files
    from mysql_cdc_spark.pipeline.replay import Replayer

    tmp = tempfile.mkdtemp(prefix="cdc_entry_")
    txns = generate_changelog(
        n_conversations=20, n_extra_ops=60, seed=7, duplicate_txns=3
    )
    write_binlog_files(txns, os.path.join(tmp, "binlog"), txns_per_file=40)
    rep = Replayer(
        spark, os.path.join(tmp, "binlog"), os.path.join(tmp, "store"),
        salt_buckets=4,
    )
    rep.replay(files_per_batch=1)
    return rep.read_state().orderBy("conv_id", "turn_idx")


_MODULES = (cdc_ops, relational, text, embeddings, multimodal)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    out["cdc_replay_e2e"] = cdc_replay_e2e
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
