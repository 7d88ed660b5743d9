"""Continuous binlog tail (ST6 — blocking vs catch-up dump modes).

The reference's live mode is a blocking socket iterator: the server pushes
events and a heartbeat keeps the connection alive (binlog_events.rs:38-59,
configure.rs:37-46). With file-shipped binlogs the equivalent is a poll
loop over the rotation directory: each wakeup replays whatever new
segments/events the ledger does not yet cover — the exactly-once resume
filter makes redundant wakeups free (covered GTIDs anti-join to nothing).

``blocking=False`` mirrors server_id=0 non-blocking dump: one catch-up
pass, then EOF. ``blocking=True`` keeps polling until ``max_idle_polls``
consecutive empty polls (the sandbox stand-in for "until cancelled").
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from ..pipeline.replay import BatchMetrics, Replayer


@dataclass
class TailResult:
    batches: list[BatchMetrics] = field(default_factory=list)
    polls: int = 0
    idle_polls: int = 0

    @property
    def events(self) -> int:
        return sum(b.events for b in self.batches)


def tail(
    replayer: Replayer,
    blocking: bool = True,
    poll_interval_s: float = 1.0,
    max_idle_polls: int = 3,
    files_per_batch: int | None = None,
    heartbeat=None,
) -> TailResult:
    """Tail the replayer's binlog directory until caught up (non-blocking)
    or until ``max_idle_polls`` consecutive polls find nothing (blocking).

    ``heartbeat``: optional callable invoked once per poll with
    ``(poll_idx, TailResult)`` — the lag/liveness hook (ST4's
    master_heartbeat_period analog; wire it to a metrics sink).
    """
    result = TailResult()
    idle = 0
    while True:
        result.polls += 1
        res = replayer.replay(files_per_batch=files_per_batch)
        fresh = [b for b in res.batches if b.events > 0]
        result.batches.extend(fresh)
        if heartbeat is not None:
            heartbeat(result.polls, result)
        if not blocking:
            return result
        if fresh:
            idle = 0
        else:
            idle += 1
            result.idle_polls += 1
            if idle >= max_idle_polls:
                return result
        time.sleep(poll_interval_s)
