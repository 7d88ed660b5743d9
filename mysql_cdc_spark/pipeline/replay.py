"""Micro-batch replay driver (E3 lifecycle in SURVEY.md §3) — exactly-once,
resumable, metered.

One micro-batch::

    list segment files (bounded by ledger position)          ST3
      → decode_binlog_dir (mapInPandas, parallel per file)   E1 semantics
      → gate complete transactions (xid NOT NULL)            ST2
      → anti-join ledger GtidSet intervals                   ST5 idempotence
      → net change per key: salted last-writer-wins          W1 + skew
      → target MERGE (Iceberg or parquet snapshot)           S7
      → ledger append (gtid set ∪, offsets, lineage, rates)  S6/ST1

The ledger append is the atomicity point: crash anywhere before it and the
batch replays with identical results (deterministic total order ⇒ idempotent
MERGE). ``resume_from_checkpoint`` is therefore just "construct Replayer on
the same store_dir".
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..binlog.decoder import TRANSCRIPTS, TableSpec, decode_binlog_dir, discover_columns
from ..gtid import GtidSet, Gtid, Uuid
from .ledger import Ledger, LedgerEntry
from .order import (
    ORDER_COLS,
    filter_covered_gtids,
    gate_complete_transactions,
    last_writer_wins,
    with_change_key,
)
from .target import ParquetMergeTarget


@dataclass
class BatchMetrics:
    batch_id: int
    files: list[str]
    events: int
    net_rows: int
    seconds: float
    events_per_sec: float
    gtid_set_text: str
    lineage: list = field(default_factory=list)


@dataclass
class ReplayResult:
    batches: list[BatchMetrics] = field(default_factory=list)

    @property
    def events(self) -> int:
        return sum(b.events for b in self.batches)

    @property
    def seconds(self) -> float:
        return sum(b.seconds for b in self.batches)

    @property
    def events_per_sec(self) -> float:
        return self.events / self.seconds if self.seconds else 0.0


class Replayer:
    def __init__(
        self,
        spark: SparkSession,
        binlog_dir: str,
        store_dir: str,
        spec: TableSpec = TRANSCRIPTS,
        salt_buckets: int = 0,
        target: object | None = None,
        start: object | None = None,
    ):
        """``start``: optional start strategy (pipeline.start: FromStart /
        FromEnd / FromPosition / FromGtid — ST3, binlog_options.rs:33-85);
        seeds the ledger on first construction, ignored when the store
        already has checkpoints (reconnect keeps state,
        binlog_client.rs:40-43).

        ``salt_buckets=0`` (default): plain ``max_by`` aggregation — its
        map-side partial combine already collapses a hot key to one row per
        task before the shuffle, which measured ~2× faster than the salted
        two-phase reduce on the skewed bench corpus (BENCH.md). Set
        ``salt_buckets>1`` for aggregations without combine support or for
        pathological single-key streams; the MERGE join side is covered by
        AQE skew-join splitting (session.py)."""
        self.spark = spark
        self.binlog_dir = binlog_dir
        self.store_dir = store_dir
        self.spec = spec
        self.salt_buckets = salt_buckets
        self.ledger = Ledger(store_dir)
        # snapshot bucket count tracks cluster parallelism: the output
        # committer's driver-side file moves are a serial cost per bucket,
        # so a 2-core session shouldn't pay for 32 output files
        self.target = target or ParquetMergeTarget(
            store_dir, spec,
            buckets=max(8, spark.sparkContext.defaultParallelism),
        )
        if start is not None:
            from .start import seed_ledger

            seed_ledger(start, binlog_dir, store_dir)

    # -- planning ----------------------------------------------------------

    def pending_files(self) -> list[str]:
        """Coarse file-level resume prune (fine-grained dedup is the GTID
        anti-join). A file is pending unless a ledger entry already covers a
        strictly later file."""
        max_file, _ = self.ledger.max_position()
        names = sorted(
            n for n in os.listdir(self.binlog_dir)
            if os.path.isfile(os.path.join(self.binlog_dir, n))
        )
        return [n for n in names if n >= max_file] if max_file else names

    # -- one micro-batch ----------------------------------------------------

    def run_batch(self, files: list[str]) -> BatchMetrics:
        spark = self.spark
        spec = self.spec
        t0 = time.time()
        batch_id = self.ledger.next_batch_id()

        glob = "{" + ",".join(files) + "}" if len(files) > 1 else files[0]
        changes = decode_binlog_dir(spark, self.binlog_dir, spec, path_filter=glob)
        changes = gate_complete_transactions(changes)

        covered = self.ledger.covered_gtid_set()
        if covered.uuid_sets:
            intervals = spark.createDataFrame(
                covered.to_intervals(), "uuid string, start long, end long"
            )
            changes = filter_covered_gtids(changes, intervals)
        else:
            # GTID-less start (FromPosition seed): position predicate is the
            # resume filter. Safe because transactions don't interleave in a
            # binlog — anything at or before the checkpointed offset is
            # either committed (covered) or a re-read of TABLE_MAP control
            # rows, which produce no change events.
            max_file, max_pos = self.ledger.max_position()
            if max_file:
                changes = changes.filter(
                    (F.col("src_file") > max_file)
                    | ((F.col("src_file") == max_file) & (F.col("pos") > max_pos))
                )

        keys = list(spec.primary_key)
        changes = with_change_key(changes, keys)
        # before-images exist only to key deletes (row_data.rs:18-24); after
        # with_change_key they are dead weight — drop them before persist so
        # the cache and every downstream shuffle carry half the text volume
        changes = changes.select(
            *keys,
            "src_file", "pos", "next_pos", "ts", "server_id", "op",
            "gtid_source", "gtid_seq", "xid", "table_id", "db", "tbl",
            "row_in_event",
            *[f"after_{n}" for n, _, _ in spec.columns],
        ).persist()

        phase_t = {}
        t_phase = time.time()

        # -- stats in one distributed pass: per-file lineage + gtid ranges
        stats = (
            changes.groupBy("src_file", "gtid_source")
            .agg(
                F.count(F.lit(1)).alias("events"),
                F.min("pos").alias("min_pos"),
                F.max("pos").alias("max_pos"),
                F.min("gtid_seq").alias("min_seq"),
                F.max("gtid_seq").alias("max_seq"),
            )
            .collect()
        )
        phase_t["decode_stats_s"] = round(time.time() - t_phase, 2)
        t_phase = time.time()
        n_events = sum(r["events"] for r in stats)
        if n_events == 0:
            changes.unpersist()
            return BatchMetrics(
                batch_id, files, 0, 0, time.time() - t0, 0.0,
                str(covered), [],
            )

        # -- net change per key (salted two-phase LWW)
        payload_cols = list(
            dict.fromkeys(
                ["op"]
                + [f"after_{n}" for n, _, _ in spec.columns]
                + ORDER_COLS
                + ["src_file", "pos", "gtid_source", "gtid_seq", "xid"]
            )
        )
        net = last_writer_wins(
            changes,
            key_cols=keys,
            order_cols=ORDER_COLS,
            payload_cols=payload_cols,
            salt_buckets=self.salt_buckets,
        )

        current_version = self.ledger.current_snapshot_version()
        new_version = self.target.merge(spark, net, current_version)
        net_rows = -1  # avoid a second action; lineage covers observability
        phase_t["lww_merge_s"] = round(time.time() - t_phase, 2)
        t_phase = time.time()

        # -- ledger gtid-set update
        batch_set = self._batch_gtid_set(changes)
        merged_set = covered.union(batch_set)
        phase_t["ledger_s"] = round(time.time() - t_phase, 2)
        max_file = max(r["src_file"] for r in stats)
        max_pos = max(r["max_pos"] for r in stats if r["src_file"] == max_file)
        changes.unpersist()

        seconds = time.time() - t0
        lineage = [
            {
                "src_file": r["src_file"],
                "events": r["events"],
                "min_pos": r["min_pos"],
                "max_pos": r["max_pos"],
            }
            for r in stats
        ]
        metrics = {
            "events": n_events,
            "seconds": round(seconds, 3),
            "events_per_sec": round(n_events / seconds, 1) if seconds else 0.0,
            **phase_t,
        }
        self.ledger.append(
            LedgerEntry(
                batch_id=batch_id,
                gtid_set_text=str(merged_set),
                max_file=max_file,
                max_pos=int(max_pos),
                snapshot_version=new_version,
                committed_at=Ledger.now(),
                partition_lineage=lineage,
                metrics=metrics,
            )
        )
        return BatchMetrics(
            batch_id, files, n_events, net_rows, seconds,
            metrics["events_per_sec"], str(merged_set), lineage,
        )

    def _batch_gtid_set(self, changes) -> GtidSet:
        """Batch GtidSet computed distributedly: distinct (source, seq) →
        gaps-and-islands collapse (seq − row_number is constant within a
        contiguous run — the same interval algebra as GtidSet.add_gtid,
        uuid_set.rs:29-98, as one window + one groupBy over skinny rows).
        The driver receives only the collapsed intervals (≈ tens of rows),
        never per-transaction data."""
        from pyspark.sql.window import Window

        from ..gtid import UuidSet, _splice_interval

        seqs = changes.select("gtid_source", "gtid_seq").distinct()
        w = Window.partitionBy("gtid_source").orderBy("gtid_seq")
        intervals = (
            seqs.withColumn("grp", F.col("gtid_seq") - F.row_number().over(w))
            .groupBy("gtid_source", "grp")
            .agg(F.min("gtid_seq").alias("start"), F.max("gtid_seq").alias("end"))
            .collect()
        )
        gset = GtidSet()
        for r in intervals:
            source = r["gtid_source"]
            us = gset.uuid_sets.get(source)
            if us is None:
                us = UuidSet(Uuid.parse(source), [])
                gset.uuid_sets[source] = us
            _splice_interval(us, int(r["start"]), int(r["end"]))
        return gset

    # -- full replay ---------------------------------------------------------

    def replay(self, files_per_batch: int | None = None) -> ReplayResult:
        files = self.pending_files()
        files_per_batch = files_per_batch or max(1, len(files))
        result = ReplayResult()
        for i in range(0, len(files), files_per_batch):
            batch_files = files[i : i + files_per_batch]
            result.batches.append(self.run_batch(batch_files))
        return result

    def read_state(self) -> DataFrame:
        version = self.ledger.current_snapshot_version()
        return self.target.read(self.spark, version)
