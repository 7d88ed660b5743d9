"""Multi-table replay: one binlog stream, many target tables.

The reference's consumer loop sees EVERY table's row events in one
stream (`src/binlog_reader.rs` yields whatever the log contains); this
engine routes each table to its own MERGE target + ledger:

- Each table runs its own :class:`~..pipeline.replay.Replayer` over the
  SAME segment files with its own store — per-table exactly-once, so one
  table's merge failure replays only that table, and tables can be
  added/backfilled independently (start strategies are per table).
- The byte scan repeats per table, but value decode is gated per
  TABLE_MAP (rows of other tables cost only the header/presence walk and
  are dropped before any value gather — ``vector.py``'s ``keep_target``
  mask on the fast path, ``continue`` on the scalar path), so the
  repeated part is the cheap part. At deploy scale this is exactly the
  standard fan-out: one shared segment store, N independent apply jobs —
  adding a table never touches another table's pipeline.
- Tables replay concurrently (one driver thread each; the session's FAIR
  scheduler pools interleave their jobs like the stats/merge pair).
- Transactions touching several tracked tables (one GTID, multiple
  TABLE_MAP+rows pairs — how a server logs a multi-table transaction;
  ``fixtures.write_binlog_files(sidecar=True)`` generates the shape)
  split cleanly: each table's replay applies its own rows and advances
  its own GTID ledger; there is no cross-table atomicity to lose because
  the sink is one table per store and a reader of table A never
  observes table B's progress.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

from ..binlog.decoder import TableSpec
from .replay import BatchMetrics, Replayer, ReplayResult


class MultiReplayer:
    """Replay one binlog stream into one merge target per tracked table.

    ``specs``: the tables to track (each a ``TableSpec``); each gets its
    own store under ``<store_root>/<database>.<table>``.
    ``replayer_kwargs`` are forwarded to every per-table ``Replayer``
    (``target`` cannot be forwarded — it is store-specific; construct
    per-table Replayers directly for custom targets).
    """

    def __init__(
        self,
        spark: SparkSession,
        binlog_dir: str,
        store_root: str,
        specs: list[TableSpec],
        **replayer_kwargs,
    ):
        if not specs:
            raise ValueError("specs must name at least one table")
        if "target" in replayer_kwargs:
            raise ValueError(
                "target is per-table state and cannot be shared; construct "
                "per-table Replayers directly for custom targets"
            )
        names = [f"{s.database}.{s.table}" for s in specs]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate table specs: {names}")
        self.replayers: dict[str, Replayer] = {
            name: Replayer(
                spark,
                binlog_dir,
                os.path.join(store_root, name),
                spec=spec,
                **replayer_kwargs,
            )
            for name, spec in zip(names, specs)
        }

    def __getitem__(self, table: str) -> Replayer:
        """Per-table Replayer, by ``db.table`` or unambiguous bare name."""
        if table in self.replayers:
            return self.replayers[table]
        matches = [n for n in self.replayers if n.split(".", 1)[1] == table]
        if len(matches) == 1:
            return self.replayers[matches[0]]
        raise KeyError(
            f"{table!r} not tracked (or ambiguous): {sorted(self.replayers)}"
        )

    def replay(
        self, files_per_batch: int | None = None, parallel: bool = True
    ) -> dict[str, ReplayResult]:
        """Replay every table; returns {db.table: ReplayResult}. A
        failure in one table never blocks the others — they finish their
        own replays and stay committed; the first error is re-raised
        with its table named, and a later ``replay()`` resumes the
        failed table from its own ledger."""
        results: dict[str, ReplayResult] = {}
        errors: dict[str, BaseException] = {}

        def _run(name: str, rep: Replayer) -> None:
            try:
                results[name] = rep.replay(files_per_batch=files_per_batch)
            except BaseException as e:  # surfaced below
                errors[name] = e

        if parallel:
            threads = [
                threading.Thread(target=_run, args=(n, r), daemon=True)
                for n, r in self.replayers.items()
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        else:
            for n, r in self.replayers.items():
                _run(n, r)
        if errors:
            name, err = next(iter(errors.items()))
            raise RuntimeError(f"replay failed for {name}") from err
        return results

    def run_batch(self, files: list[str]) -> dict[str, BatchMetrics]:
        """One explicit batch over the same files for every table."""
        return {
            name: rep.run_batch(files) for name, rep in self.replayers.items()
        }

    def bootstrap(
        self, base_dfs: dict[str, DataFrame], at: object
    ) -> dict[str, int]:
        """Snapshot-then-stream per table: seed each named table's store
        from its consistent snapshot, all taken at the SAME source
        position ``at`` (one transactionally-consistent dump covers every
        table, the standard multi-table snapshot contract). Tables absent
        from ``base_dfs`` are untouched — they replay from their own start
        strategy. Returns {db.table: snapshot_version}."""
        out: dict[str, int] = {}
        for name, df in base_dfs.items():
            if name not in self.replayers:
                raise KeyError(
                    f"unknown table {name!r}; known: {sorted(self.replayers)}"
                )
            out[name] = self.replayers[name].bootstrap(df, at)
        return out

    def read_state(self, table: str, version: int | None = None) -> DataFrame:
        return self[table].read_state(version=version)

    def states(self) -> dict[str, DataFrame]:
        return {n: r.read_state() for n, r in self.replayers.items()}

    def lag(self) -> dict[str, float | None]:
        """Per-table replication lag from each ledger's last metrics."""
        out: dict[str, float | None] = {}
        for name, rep in self.replayers.items():
            last = rep.ledger.last()
            out[name] = (last.metrics or {}).get("lag_s") if last else None
        return out
