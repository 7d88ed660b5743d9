"""Streaming layer (SURVEY.md §2.9 ST1-ST6).

Two complementary paths:

- ``tail`` — the binlog-native continuous loop: poll the binlog directory
  for new rotation segments and replay them through the exactly-once
  micro-batch pipeline (the reference's blocking vs non-blocking dump
  modes, replica_options.rs:31-33 / binlog_client.rs:49-53).
- ``stream`` — Structured Streaming over a decoded-changelog table:
  ``readStream`` file source → intra-batch dedup → ``foreachBatch``
  order-aware MERGE with Spark's own checkpoint, for deployments where
  decode and apply are separate jobs.
- ``stateful`` — the ``applyInPandasWithState`` formulation: per-key
  winning order tuple in the streaming state store, emitting an
  append-only transition log.
- ``windows`` — watermarked event-time metrics (tumbling change rates,
  native ``session_window`` per conversation).
"""

from .tail import TailResult, tail
from .stream import stream_apply
from .stateful import read_transitions_state, stream_apply_stateful
from .windows import stream_change_metrics

__all__ = [
    "tail", "TailResult", "stream_apply",
    "stream_apply_stateful", "read_transitions_state",
    "stream_change_metrics",
]
