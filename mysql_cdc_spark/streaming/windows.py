"""Event-time windowed aggregations over the decoded change stream —
watermarks + windowed/session aggs (the lag/late-data half of ST4).

The replay tier is rank-ordered (no watermark needed: a late event is
handled by (gtid_seq, pos, row_in_event) outranking, never by time
eviction). *Metrics* over the stream are the opposite: they aggregate by
event time, state grows with open windows, and the watermark is what
bounds it — a 10^10-event tail job cannot keep every per-minute window
open forever. These helpers are that metrics tier:

- ``windowed_change_counts``: tumbling event-time windows per (db, tbl,
  op) — change-rate dashboards, lag alerting.
- ``session_change_windows``: native ``session_window`` per conversation
  — the streaming twin of analytics/cdc_ops.w4_sessionize's batch
  gaps-and-islands.

Both run in ``append`` output mode: a window row is emitted exactly once,
when the watermark passes its end (finalized), so the parquet sink gets
immutable rows. Events later than the watermark allowance are DROPPED by
design — that is the state bound; choose the allowance from the source's
real reordering window (binlog relays: seconds-to-minutes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..binlog.decoder import TRANSCRIPTS, TableSpec, change_event_schema


def windowed_change_counts(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling event-time change counts per (db, tbl, op)."""
    return (
        stream.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "db", "tbl", "op")
        .agg(F.count(F.lit(1)).alias("n_changes"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "db", "tbl", "op", "n_changes",
        )
    )


def session_change_windows(
    stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-conversation session windows (gap-closed), the streaming form
    of the batch sessionize operator: Spark's native ``session_window``
    keeps one open window per active key in the state store and the
    watermark closes + evicts it."""
    return (
        stream.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("w"),
            F.col("after_conv_id").alias("conv_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_changes"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "conv_id", "n_changes",
        )
    )


def stream_change_metrics(
    spark: SparkSession,
    changelog_dir: str,
    out_dir: str,
    spec: TableSpec = TRANSCRIPTS,
    mode: str = "windowed",
    window: str = "1 minute",
    gap: str = "5 minutes",
    watermark: str = "2 minutes",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Run the metrics tier over a decoded-changelog file stream into an
    append-only parquet window log; returns the StreamingQuery."""
    reader = spark.readStream.schema(change_event_schema(spec))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(changelog_dir)
    agg = (
        windowed_change_counts(stream, window, watermark)
        if mode == "windowed"
        else session_change_windows(stream, gap, watermark)
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{out_dir}/_stream_checkpoint",
        )
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
