"""Relational benchmark queries over the TPC-H-ish testdata.

The reference library has no SQL engine — these queries demonstrate that the
engine's host (plain Spark SQL + Catalyst) covers the relational algebra the
reference lacks (SURVEY.md §2.3/2.4/2.6 "not implemented" rows) and serve as
the bench headliners whose plans we tune (`.explain("formatted")`):

- q1_pricing_summary: full-scan aggregate; partial aggregation + vectorized
  parquet read; only shuffle is the tiny post-combine exchange.
- q3_shipping_priority: selective join; filters push to all three scans,
  AQE picks broadcast for the pruned customer side at small SF and
  sort-merge at scale; top-k via orderBy+limit (TakeOrderedAndProject —
  no global sort materialization).
- star_broadcast_rollup: two-level dim broadcast join, zero fact shuffles
  before the final rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one pass, map-side combine, 4-column ReadSchema."""
    li = load(spark, sf_dir, "lineitem")
    # money sums go through decimal: double addition is non-associative, so
    # a distributed sum of 10^5+ doubles can differ from the oracle's
    # sequential sum by more than the rounding quantum; per-row quantization
    # to decimal(27,6) is identical in both engines and decimal addition is
    # exact, so the aggregate is bit-stable at any partitioning
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("cast(round(sum(cast(l_quantity as decimal(27,6))), 2) as double)").alias("sum_qty"),
            F.expr("cast(round(sum(cast(l_extendedprice as decimal(27,6))), 2) as double)").alias("sum_base_price"),
            F.expr(
                "cast(round(sum(cast(l_extendedprice * (1 - l_discount) as decimal(27,6))), 2) as double)"
            ).alias("sum_disc_price"),
            F.expr(
                "round(cast(sum(cast(l_quantity as decimal(27,6))) as double) / count(1), 4)"
            ).alias("avg_qty"),
            F.expr(
                "round(cast(sum(cast(l_discount as decimal(27,6))) as double) / count(1), 4)"
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum((l_quantity)::DECIMAL(27,6)), 2)::DOUBLE AS sum_qty,
       round(sum((l_extendedprice)::DECIMAL(27,6)), 2)::DOUBLE AS sum_base_price,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(27,6)), 2)::DOUBLE AS sum_disc_price,
       round(sum((l_quantity)::DECIMAL(27,6))::DOUBLE / count(*), 4) AS avg_qty,
       round(sum((l_discount)::DECIMAL(27,6))::DOUBLE / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join → agg → top-10.

    orderBy+limit compiles to TakeOrderedAndProject (per-partition heap +
    driver merge of 10 rows) — no global sort at any scale.
    """
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            # decimal sum: also makes the top-10 boundary deterministic
            F.expr(
                "cast(round(sum(cast(l_extendedprice * (1 - l_discount) as decimal(27,6))), 2) as double)"
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate_us"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(27,6)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def star_broadcast_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema rollup with explicit broadcast of the dim chain
    (region→nation→supplier): the lineitem fact never shuffles until the
    final (tiny) aggregate exchange."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dim = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("r_name", "n_name")
        .agg(
            # decimal sum: partition-order-independent (see q1 comment)
            F.expr(
                "cast(round(sum(cast(l_extendedprice * (1 - l_discount) as decimal(27,6))), 2) as double)"
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


STAR_SQL = """
SELECT r_name, n_name,
       round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(27,6)), 2)::DOUBLE AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "star_broadcast_rollup": star_broadcast_rollup,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "star_broadcast_rollup": STAR_SQL,
}
