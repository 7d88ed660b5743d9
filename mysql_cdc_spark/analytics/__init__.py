"""Analytics surface over the driver testdata tables.

Each module exports ``QUERIES: dict[name -> fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name -> ANSI SQL]`` (DuckDB-runnable on the same parquet
views). Names map 1:1 to SURVEY.md §2 operators (prefixed with the operator
id) or to the training-data pipeline ops (dedup/similarity/text/multimodal).
"""

from __future__ import annotations


def load(spark, sf_dir: str, table: str):
    # epoch-micro outputs (a3, st5, q3) assume UTC wall-clock interpretation
    # of the parquet timestamps — pin it so results don't depend on the
    # host session's zone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
