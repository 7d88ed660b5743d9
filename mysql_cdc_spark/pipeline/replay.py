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
        salt_buckets: int = 8,
        target: object | None = None,
    ):
        self.spark = spark
        self.binlog_dir = binlog_dir
        self.store_dir = store_dir
        self.spec = spec
        self.salt_buckets = salt_buckets
        self.ledger = Ledger(store_dir)
        self.target = target or ParquetMergeTarget(store_dir, spec)

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

        keys = list(spec.primary_key)
        changes = with_change_key(changes, keys).persist()

        # -- stats in one distributed pass: per-file lineage + gtid ranges
        stats = (
            changes.groupBy("src_file", "gtid_source")
            .agg(
                F.count(F.lit(1)).alias("events"),
                F.min("pos").alias("min_pos"),
                F.max("pos").alias("max_pos"),
                F.min("gtid_seq").alias("min_seq"),
                F.max("gtid_seq").alias("max_seq"),
                F.countDistinct("gtid_seq").alias("n_seq"),
            )
            .collect()
        )
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

        # -- ledger gtid-set update
        batch_set = self._gtid_set_from_stats(spark, changes, stats)
        merged_set = covered.union(batch_set)
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

    def _gtid_set_from_stats(self, spark, changes, stats) -> GtidSet:
        """Batch GtidSet from per-(file, source) min/max/count aggregates.

        Fast path: when the distinct-seq count matches the span, the range is
        contiguous → one interval. Gap fallback (rare: filtered tables or
        interleaved sources) collects the distinct seqs for just the
        non-contiguous (file, source) groups.
        """
        gset = GtidSet()
        need_exact: list[tuple[str, str]] = []
        per_source: dict[str, list[tuple[int, int, int]]] = {}
        for r in stats:
            per_source.setdefault(r["gtid_source"], []).append(
                (r["min_seq"], r["max_seq"], r["n_seq"])
            )
            if r["n_seq"] != r["max_seq"] - r["min_seq"] + 1:
                need_exact.append((r["src_file"], r["gtid_source"]))

        exact: dict[tuple[str, str], list[int]] = {}
        if need_exact:
            cond = F.lit(False)
            for f, s in need_exact:
                cond = cond | ((F.col("src_file") == f) & (F.col("gtid_source") == s))
            rows = (
                changes.filter(cond)
                .select("src_file", "gtid_source", "gtid_seq")
                .distinct()
                .collect()
            )
            for r in rows:
                exact.setdefault((r["src_file"], r["gtid_source"]), []).append(r["gtid_seq"])

        for r in stats:
            source = r["gtid_source"]
            uuid = Uuid.parse(source)
            key = (r["src_file"], source)
            if key in exact:
                for seq in exact[key]:
                    gset.add_gtid(Gtid(uuid, seq))
            else:
                us = gset.uuid_sets.get(source)
                from ..gtid import UuidSet, Interval, _splice_interval

                if us is None:
                    us = UuidSet(uuid, [])
                    gset.uuid_sets[source] = us
                _splice_interval(us, int(r["min_seq"]), int(r["max_seq"]))
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
