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


def _after_position_predicate(max_file: str, max_pos: int):
    """Spark predicate for (src_file, pos) strictly after the checkpoint,
    ordering files by (prefix, numeric suffix) like ``_segment_sort_key``
    so digit growth (mysql-bin.999999 → mysql-bin.1000000) compares
    correctly. Suffix-less names fall back to whole-name comparison with
    suffix rank -1 (same total order as the driver-side sort key)."""
    from ..binlog.decoder import _segment_sort_key

    max_prefix, max_num = _segment_sort_key(max_file)
    sfx = F.regexp_extract(F.col("src_file"), r"^(.*)\.(\d+)$", 2)
    has_sfx = sfx != F.lit("")
    prefix = F.when(
        has_sfx, F.regexp_extract(F.col("src_file"), r"^(.*)\.(\d+)$", 1)
    ).otherwise(F.col("src_file"))
    num = F.when(has_sfx, sfx.cast("long")).otherwise(F.lit(-1))
    return (
        (prefix > F.lit(max_prefix))
        | (
            (prefix == F.lit(max_prefix))
            & (
                (num > F.lit(max_num))
                | ((num == F.lit(max_num)) & (F.col("pos") > F.lit(max_pos)))
            )
        )
    )


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
        anti-join + the position predicate). A file is pending unless a
        ledger entry already covers a strictly later file. Ordering and
        comparison use the numeric segment suffix — lexicographic breaks
        when binlog numbering grows a digit (mysql-bin.999999 →
        mysql-bin.1000000)."""
        from ..binlog.decoder import _segment_sort_key, list_dir_entries

        max_file, _ = self.ledger.max_position()
        names = sorted(list_dir_entries(self.binlog_dir), key=_segment_sort_key)
        if not max_file:
            return names
        max_key = _segment_sort_key(max_file)
        return [n for n in names if _segment_sort_key(n) >= max_key]

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
        # Position predicate, applied UNCONDITIONALLY in addition to the
        # GTID anti-join. It is monotone and always safe: anything at or
        # before the checkpointed (file, pos) is either committed (and the
        # anti-join would drop it too) or predates a FromPosition/FromEnd
        # seed whose transactions carry GTIDs the ledger never covered —
        # without this predicate a re-read of the seed segment would replay
        # those pre-seed transactions and regress merged state (the
        # GTID-only filter cannot see them). Redelivered duplicates at
        # *later* positions are still caught by the anti-join.
        max_file, max_pos = self.ledger.max_position()
        if max_file:
            changes = changes.filter(
                _after_position_predicate(max_file, max_pos)
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

        # -- stats + GTID intervals in ONE zero-shuffle pass: the decode
        # output is one partition per rotation segment, so per-file lineage
        # AND the per-file seq islands are per-partition computations —
        # mapInPandas over the cached skinny projection, ~1 output row per
        # (file, source), no exchange, tiny collect
        stats = self._partition_stats(changes)
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

        # -- ledger gtid-set update (driver-side splice of the per-file
        # islands already collected with the stats — no extra job)
        batch_set = self._gtid_set_from_islands(stats)
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

    @staticmethod
    def _partition_stats(changes) -> list[dict]:
        """Per-(file, source) lineage stats + collapsed GTID seq islands,
        computed per partition (decode output = one partition per rotation
        segment, a narrow dependency) — no shuffle, the collect is one row
        per (file, source). Islands via numpy unique+diff: the distributed
        formulation of GtidSet.add_gtid's collapse (uuid_set.rs:29-98)."""
        import numpy as np
        import pandas as pd

        def stats_fn(batches):
            acc: dict = {}
            for pdf in batches:
                for (f, s), g in pdf.groupby(
                    ["src_file", "gtid_source"], dropna=False, sort=False
                ):
                    key = (f, None if pd.isna(s) else s)
                    a = acc.setdefault(
                        key,
                        {"events": 0, "min_pos": None, "max_pos": None, "seqs": []},
                    )
                    a["events"] += len(g)
                    pmin, pmax = int(g["pos"].min()), int(g["pos"].max())
                    a["min_pos"] = pmin if a["min_pos"] is None else min(a["min_pos"], pmin)
                    a["max_pos"] = pmax if a["max_pos"] is None else max(a["max_pos"], pmax)
                    if key[1] is not None:
                        a["seqs"].append(g["gtid_seq"].to_numpy(dtype="int64"))
            if not acc:
                return  # empty partition: yield nothing (a 0-row frame
                # defaults list columns to float64, which Arrow can't cast)
            out = {
                "src_file": [], "gtid_source": [], "events": [],
                "min_pos": [], "max_pos": [], "starts": [], "ends": [],
            }
            for (f, s), a in acc.items():
                if a["seqs"]:
                    seqs = np.unique(np.concatenate(a["seqs"]))
                    breaks = np.nonzero(np.diff(seqs) > 1)[0]
                    starts = seqs[np.concatenate(([0], breaks + 1))]
                    ends = seqs[np.concatenate((breaks, [len(seqs) - 1]))]
                else:
                    starts = ends = np.array([], dtype="int64")
                out["src_file"].append(f)
                out["gtid_source"].append(s)
                out["events"].append(a["events"])
                out["min_pos"].append(a["min_pos"])
                out["max_pos"].append(a["max_pos"])
                out["starts"].append(starts.tolist())
                out["ends"].append(ends.tolist())
            frame = pd.DataFrame(out)
            frame["starts"] = frame["starts"].astype(object)
            frame["ends"] = frame["ends"].astype(object)
            yield frame

        rows = (
            changes.select("src_file", "gtid_source", "gtid_seq", "pos")
            .mapInPandas(
                stats_fn,
                schema=(
                    "src_file string, gtid_source string, events long, "
                    "min_pos long, max_pos long, "
                    "starts array<long>, ends array<long>"
                ),
            )
            .collect()
        )
        # decode partitions hold whole files, so rows are normally unique
        # per (file, source); if an upstream repartition ever splits a file,
        # consumers still aggregate correctly (events sums, pos maxes,
        # islands splice) — just with more rows
        return [r.asDict() for r in rows]

    @staticmethod
    def _gtid_set_from_islands(stats: list[dict]) -> GtidSet:
        from ..gtid import UuidSet, _splice_interval

        gset = GtidSet()
        for r in stats:
            source = r["gtid_source"]
            if source is None:
                continue
            us = gset.uuid_sets.get(source)
            if us is None:
                us = UuidSet(Uuid.parse_lenient(source), [])
                gset.uuid_sets[source] = us
            for a, b in zip(r["starts"], r["ends"]):
                _splice_interval(us, int(a), int(b))
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
