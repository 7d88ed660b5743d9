"""Structured Streaming apply path (S2/ST1/ST5 as a streaming job).

Deployment shape: a decode tier turns binlog segments into a decoded
change-event table (append-only parquet, partitioned by arrival); an apply
tier is a Structured Streaming job over it:

    readStream (file source, maxFilesPerTrigger)        S2
      → intra-batch LWW dedup                           W1/ST5
      → foreachBatch: order-aware MERGE into the target S7
      → Spark streaming checkpoint (offsets/commits)    S6/ST1

Exactly-once: Spark's checkpoint gives at-least-once foreachBatch
delivery; the MERGE is *order-aware* — snapshots persist each key's
winning (gtid_seq, pos, row_in_event) tuple and an incoming row only
replaces the stored row when it outranks it — so replays of an
uncommitted trigger AND changelog files arriving out of commit order
across triggers both converge to the same state (same total order as the
batch ledger path, with Spark's WAL playing the ledger's role). No
watermark is needed: late data is handled by rank, not by time eviction.

``Trigger.AvailableNow`` gives the bounded catch-up run (ST6 non-blocking
dump); omit it for continuous tailing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..binlog.decoder import TRANSCRIPTS, TableSpec, change_event_schema
from ..pipeline.order import ORDER_COLS, last_writer_wins, with_change_key
from ..pipeline.target import (
    OrderedBucketedMergeTarget,
    OrderedParquetMergeTarget,
)


def write_changelog(changes: DataFrame, path: str, mode: str = "append") -> None:
    """Decode-tier sink: append decoded change events as the streamable
    changelog table (partition-friendly: one file set per decode run)."""
    changes.write.mode(mode).parquet(path)


def stream_apply(
    spark: SparkSession,
    changelog_dir: str,
    store_dir: str,
    spec: TableSpec = TRANSCRIPTS,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    target: object | None = None,
    ignore_server_ids: tuple[int, ...] = (),
    column_transforms: dict[str, str] | None = None,
    audit: object | None = None,
    auto_compact: int | None = None,
):
    """Run the apply tier as a Structured Streaming query; returns the
    StreamingQuery (caller awaits termination). Applies FULL row images
    (whole-row LWW); for binlog_row_image=MINIMAL use the batch path's
    ``Replayer(row_image="minimal")`` per-column merge.

    ``ignore_server_ids`` / ``column_transforms``: the streaming twins of
    the batch ``Replayer`` knobs (circular-replication guard; ingest-time
    masking) — same semantics, applied per micro-batch before dedup so
    skipped/unmasked values never reach the store. Spark's streaming
    checkpoint still advances over skipped rows (the file offset is the
    position, not the row), mirroring the batch path's skip-and-advance.

    ``audit``: the streaming twin of ``Replayer(audit=...)`` (write-
    audit-publish, pipeline/audit.py). A rejection unlinks the trigger's
    snapshot and FAILS the query — Spark never checkpoints the trigger,
    so a restart after the upstream fix replays it cleanly (the outrank
    guard makes the re-merge idempotent). One honesty note vs the batch
    tier: this store has no ledger, so the snapshot directory itself is
    the publish — a concurrent reader can glimpse the unaudited version
    for the audit's duration; the batch ``Replayer`` audits inside a
    true ledger gap with no such window.

    Default sink: ``OrderedBucketedMergeTarget`` — the outrank guard and
    tombstones on the bucket-pruned CoW layout, so a steady-state trigger
    touching K conversations rewrites K buckets, not the table. Pass
    ``target=OrderedParquetMergeTarget(...)`` for the plain full-rewrite
    form, or ``target=OrderedMergeOnReadTarget(...)`` for the
    delta-append form (measured ~4× cheaper per trigger,
    tools/bench_ordered_mor.py). For MoR targets ``auto_compact``
    DEFAULTS to ``mor.DEFAULT_AUTO_COMPACT``: any bucket whose delta
    chain reaches the threshold folds back into base right after the
    trigger (read fold cost grows with chain length —
    tools/bench_mor_chain.py); pass ``auto_compact=0`` to opt out or
    another N to tune it. No ledger here: the compacted version simply
    becomes the store's latest, which the next trigger's
    ``_current_version`` picks up; a crash between merge and compact
    just leaves the chain one trigger longer."""
    keys = list(spec.primary_key)
    if column_transforms:
        key_hits = set(column_transforms) & set(keys)
        if key_hits:
            raise ValueError(
                f"column_transforms must not rewrite primary-key columns "
                f"{sorted(key_hits)}"
            )
        unknown = set(column_transforms) - {c for c, _, _ in spec.columns}
        if unknown:
            raise ValueError(
                f"column_transforms for unknown columns: {sorted(unknown)}"
            )
    target = target or OrderedBucketedMergeTarget(
        store_dir, spec, order_cols=tuple(ORDER_COLS)
    )
    if audit is not None and not hasattr(target, "snapshot_path"):
        raise TypeError(
            "audit requires a snapshot target: an internally-committing "
            "sink has no staged version to audit or roll back"
        )
    # MoR targets default to the bounded-chain policy (see mor.py
    # DEFAULT_AUTO_COMPACT); auto_compact=0 opts out
    if auto_compact is None and hasattr(target, "delta_stats"):
        from ..pipeline.mor import DEFAULT_AUTO_COMPACT

        auto_compact = DEFAULT_AUTO_COMPACT
    if auto_compact == 0:
        auto_compact = None
    if auto_compact is not None:
        if not hasattr(target, "compact"):
            raise TypeError(
                "auto_compact needs a merge-on-read target "
                "(OrderedMergeOnReadTarget)"
            )
        if auto_compact < 1:
            raise ValueError("auto_compact must be >= 1")
    payload_cols = list(
        dict.fromkeys(
            ["op"]
            + [f"after_{n}" for n, _, _ in spec.columns]
            + ORDER_COLS
            + ["src_file", "pos", "gtid_source", "gtid_seq", "xid"]
        )
    )

    reader = spark.readStream.schema(change_event_schema(spec))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(changelog_dir)

    # transaction gate + key derivation, same operators as the batch path
    stream = stream.filter(F.col("xid").isNotNull())
    if ignore_server_ids:
        stream = stream.filter(
            ~F.col("server_id").isin([int(s) for s in ignore_server_ids])
        )
    stream = with_change_key(stream, keys)
    if column_transforms:
        temps = [c for c, _, _ in spec.columns if c not in keys]
        for c in temps:
            stream = stream.withColumn(c, F.col(f"after_{c}"))
        for col, expr in column_transforms.items():
            stream = stream.withColumn(f"after_{col}", F.expr(expr))
        stream = stream.drop(*temps)
    # instant-ADD-COLUMN DEFAULTs (TableSpec.defaults), same fill as the
    # batch path — the streaming tier applies FULL images only
    from ..pipeline.order import apply_column_defaults

    stream = apply_column_defaults(stream, spec, "full")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        net = last_writer_wins(
            batch_df, key_cols=keys, order_cols=ORDER_COLS,
            payload_cols=payload_cols,
        )
        # versions advance per trigger; a replayed trigger re-merges the
        # same net-change idempotently (equal rank → incoming wins → same
        # row), and an out-of-order older file cannot outrank stored state
        current = _current_version(store_dir)
        new_version = target.merge(batch_df.sparkSession, net, current)
        if audit is not None:
            from ..pipeline.audit import AuditContext

            ctx = AuditContext(
                spark=batch_df.sparkSession,
                batch_id=batch_id,
                staged=target.read(batch_df.sparkSession, new_version),
                previous=target.read(batch_df.sparkSession, current),
                changes=batch_df,
                primary_key=tuple(spec.primary_key),
            )
            try:
                audit(ctx)
            except BaseException:
                import shutil

                shutil.rmtree(
                    target.snapshot_path(new_version), ignore_errors=True
                )
                raise  # fail the query: the trigger is never checkpointed
        if auto_compact is not None:
            stats = target.delta_stats(new_version)
            if any(n >= auto_compact for n in stats.values()):
                target.compact(
                    batch_df.sparkSession, new_version,
                    min_deltas=auto_compact,
                )

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{store_dir}/_stream_checkpoint",
        )
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_apply_frames(
    spark: SparkSession,
    frames_dir: str,
    store_dir: str,
    spec: TableSpec = TRANSCRIPTS,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    target: object | None = None,
):
    """End-to-end streaming over the event-frame source: raw binlog
    frames land as (stream, offset, frame) rows (the message-bus relay
    shape, binlog/frames.py); each trigger decodes the new frames and
    merges order-aware. Because decode happens inside the trigger, a
    frame file arriving out of order is just an out-of-order *event*
    batch — the tombstoned, rank-checked merge absorbs it, so no
    cross-trigger coordination with the decode tier is needed.

    Contracts (both mirror the file path's per-segment independence):
    - a frames file must carry whole transactions per stream (MySQL
      itself never rotates mid-transaction; a relay that commits at XID
      boundaries gives this for free) — a split transaction's tail would
      gate as uncommitted and drop;
    - cross-trigger ordering rides on gtid_seq (``pos`` restarts per
      reassembled chunk and only breaks ties within a transaction), so
      this path requires GTID-enabled streams."""
    from ..binlog.frames import decode_event_frames

    target = target or OrderedBucketedMergeTarget(
        store_dir, spec, order_cols=tuple(ORDER_COLS)
    )
    keys = list(spec.primary_key)
    payload_cols = list(
        dict.fromkeys(
            ["op"]
            + [f"after_{n}" for n, _, _ in spec.columns]
            + ORDER_COLS
            + ["src_file", "pos", "gtid_source", "gtid_seq", "xid"]
        )
    )
    reader = spark.readStream.schema("stream string, offset long, frame binary")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(frames_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        changes = decode_event_frames(batch_df, spec)
        changes = changes.filter(F.col("xid").isNotNull())
        changes = with_change_key(changes, keys)
        net = last_writer_wins(
            changes, key_cols=keys, order_cols=ORDER_COLS,
            payload_cols=payload_cols,
        )
        target.merge(batch_df.sparkSession, net, _current_version(store_dir))

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{store_dir}/_frames_checkpoint",
        )
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _current_version(store_dir: str) -> int:
    import os
    import re

    snapdir = os.path.join(store_dir, "snapshots")
    if not os.path.isdir(snapdir):
        return 0
    versions = [
        int(m.group(1))
        for n in os.listdir(snapdir)
        if (m := re.match(r"v(\d+)$", n))
    ]
    return max(versions, default=0)


def read_stream_state(spark: SparkSession, store_dir: str, spec: TableSpec = TRANSCRIPTS) -> DataFrame:
    """Current streamed state. The store's target family is read from the
    ``target_family.json`` stamp its first commit wrote; stores from
    before family stamping fall back to layout sniffing (a bucketed
    store's snapshots carry a manifest.json — dict-valued entries mean
    the merge-on-read layout — a plain ordered store's are bare parquet
    directories)."""
    import json
    import os

    from ..pipeline.target import load_target_family, target_class_for_family

    version = _current_version(store_dir)
    family = load_target_family(store_dir)
    if family is not None:
        return target_class_for_family(family)(store_dir, spec).read(
            spark, version
        )
    manifest = os.path.join(
        store_dir, "snapshots", f"v{version:08d}", "manifest.json"
    )
    if os.path.exists(manifest):
        with open(manifest) as f:
            entries = json.load(f)
        if any(isinstance(v, dict) for v in entries.values()):
            # merge-on-read layout; ordered vs plain (_seq) resolution is
            # a property of the FILES — sniff one referenced parquet's
            # schema for the _ord_* columns the ordered sink writes
            import glob as _glob

            import pyarrow.parquet as _pq

            ordered = True
            for e in entries.values():
                rels = (
                    ([e["base"]] if isinstance(e, dict) and e.get("base") else [])
                    + (e.get("deltas", []) if isinstance(e, dict) else [])
                )
                files = [
                    f
                    for rel in rels
                    for f in _glob.glob(
                        os.path.join(store_dir, rel, "*.parquet")
                    )
                ]
                if files:
                    names = _pq.read_schema(files[0]).names
                    ordered = any(n.startswith("_ord_") for n in names)
                    break
            if ordered:
                from ..pipeline.mor import OrderedMergeOnReadTarget

                cls = OrderedMergeOnReadTarget
            else:
                from ..pipeline.mor import MergeOnReadBucketedTarget

                cls = MergeOnReadBucketedTarget
        else:
            cls = OrderedBucketedMergeTarget
    else:
        cls = OrderedParquetMergeTarget
    return cls(store_dir, spec).read(spark, version)
