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
  are dropped before any value gather), so the repeated part is the
  cheap part. At deploy scale this is exactly the standard fan-out: one
  shared segment store, N independent apply jobs — adding a table never
  touches another table's pipeline.
- Tables replay concurrently (one driver thread each; the session's FAIR
  scheduler pools interleave their jobs like the stats/merge pair).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession

from ..binlog.decoder import TableSpec
from .replay import Replayer, ReplayResult


class MultiReplayer:
    def __init__(
        self,
        spark: SparkSession,
        binlog_dir: str,
        store_root: str,
        specs: list[TableSpec],
        **replayer_kwargs,
    ):
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

    def replay(
        self, files_per_batch: int | None = None, parallel: bool = True
    ) -> dict[str, ReplayResult]:
        """Replay every table; returns {db.table: ReplayResult}."""
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

    def read_state(self, name: str) -> DataFrame:
        return self.replayers[name].read_state()

    def states(self) -> dict[str, DataFrame]:
        return {n: r.read_state() for n, r in self.replayers.items()}
