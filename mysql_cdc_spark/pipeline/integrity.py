"""Replica-consistency checksums over the CDC-maintained table.

The operational question every CDC deployment eventually asks: *does the
lake-side table still equal the source?* The standard MySQL answer is
pt-table-checksum — chunk the table by key, aggregate an order-insensitive
digest per chunk on both sides, ship only the digests, and re-sync just
the chunks that differ. This module is that tool, Spark-first, over the
replayed state.

Design (the 100 TB shape):
- Chunking is a *portable* hash of the partition key (md5-derived, so the
  source side — MySQL, DuckDB, anything with md5 — computes the identical
  chunk ids; Spark's ``hash()`` is engine-private and deliberately not
  used).
- The per-chunk digest is the SUM of a 60-bit per-row md5 over a
  canonical row serialization, accumulated in 128-bit (decimal(38,0) on
  Spark, HUGEINT on DuckDB — int64 would overflow *differently* per
  engine at billions of rows per chunk) and reduced mod 2^61-1. SUM is
  commutative/associative → one combinable aggregation, map-side
  combined, no sort, no window; the output is ``n_chunks`` rows
  regardless of table size, so two 100 TB replicas compare by
  exchanging kilobytes.
- ``diff_chunks`` joins two digest sets and returns the chunk ids that
  need re-sync — the re-read is then bucket-pruned on the CoW layout
  (chunk id = the layout's bucket expression family).

Reference scope: beyond-reference operational tier (the reference stops
at decoded events); semantics follow pt-table-checksum's chunked
BIT_XOR/CRC pattern as publicly documented, re-expressed as portable
md5 + SUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# canonical NULL marker: distinct from any real value and identical on
# both sides (DuckDB coalesce / Spark coalesce)
_NULL = "\x00"

# digest modulus: 2^61-1 (Mersenne prime) — the 128-bit running sum
# reduces into int64 range identically on every engine
_MOD = 2305843009213693951


def _canon_expr(cols: list[str]) -> str:
    """Canonical row serialization: '|'-joined, NULL-marked columns,
    everything CAST to string first (LONG/INT render identically in
    Spark and DuckDB/MySQL)."""
    parts = ", ".join(f"coalesce(cast({c} as string), '{_NULL}')" for c in cols)
    return f"concat_ws('|', {parts})"


def _canon_expr_duck(cols: list[str]) -> str:
    parts = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0))" for c in cols
    )
    return f"concat_ws('|', {parts})"


def chunk_expr(key_col: str, n_chunks: int) -> str:
    """Portable chunk id: first 4 md5 hex digits of the key, mod n.
    Uniform over keys, computable by any md5-capable engine."""
    return (
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 4), 16, 10)"
        f" as int) % {n_chunks}"
    )


def chunk_expr_duck(key_col: str, n_chunks: int) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 4))::INT"
        f" % {n_chunks})"
    )


def chunked_checksum(
    state: DataFrame,
    key_col: str,
    cols: list[str],
    n_chunks: int = 64,
) -> DataFrame:
    """Per-chunk (chunk_id, n_rows, chunk_sum) digest of ``cols``.

    chunk_sum is the 128-bit SUM of 60-bit row hashes mod 2^61-1 —
    order-insensitive, so replicas with different physical layouts
    agree. One combinable aggregation; output size is O(n_chunks).
    """
    canon = _canon_expr(cols)
    row_h = (
        f"cast(cast(conv(substring(md5({canon}), 1, 15), 16, 10) as bigint)"
        f" as decimal(38,0))"
    )
    return (
        state.selectExpr(
            f"{chunk_expr(key_col, n_chunks)} as chunk_id",
            f"{row_h} as row_h",
        )
        .groupBy("chunk_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr(f"cast(sum(row_h) % {_MOD} as bigint)").alias("chunk_sum"),
        )
    )


def checksum_sql_duck(
    relation: str, key_col: str, cols: list[str], n_chunks: int = 64
) -> str:
    """The identical digest in DuckDB SQL — the 'other side' of the
    comparison (stands in for the mysql-side SELECT in a deployment)."""
    canon = _canon_expr_duck(cols)
    row_h = f"(('0x' || substr(md5({canon}), 1, 15))::BIGINT)"
    return f"""
SELECT {chunk_expr_duck(key_col, n_chunks)} AS chunk_id,
       count(*)::BIGINT AS n_rows,
       (sum({row_h}) % {_MOD})::BIGINT AS chunk_sum
FROM {relation} GROUP BY 1
"""


def diff_chunks(a: DataFrame, b: DataFrame) -> DataFrame:
    """Chunks whose digests disagree between two replicas (either side
    missing, row-count drift, or content drift). Full-outer join on
    O(n_chunks) rows — trivially broadcastable."""
    aa = a.select(
        "chunk_id",
        F.col("n_rows").alias("a_rows"),
        F.col("chunk_sum").alias("a_sum"),
    )
    bb = b.select(
        "chunk_id",
        F.col("n_rows").alias("b_rows"),
        F.col("chunk_sum").alias("b_sum"),
    )
    joined = aa.join(bb, "chunk_id", "full_outer")
    return joined.where(
        ~(
            F.col("a_rows").eqNullSafe(F.col("b_rows"))
            & F.col("a_sum").eqNullSafe(F.col("b_sum"))
        )
    )
