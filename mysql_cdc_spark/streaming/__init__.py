"""Streaming layer (SURVEY.md §2.9 ST1-ST6).

Two complementary paths:

- ``tail`` — the binlog-native continuous loop: poll the binlog directory
  for new rotation segments and replay them through the exactly-once
  micro-batch pipeline (the reference's blocking vs non-blocking dump
  modes, replica_options.rs:31-33 / binlog_client.rs:49-53).
- ``stream`` — Structured Streaming over a decoded-changelog table:
  ``readStream`` file source → watermarked intra-batch dedup →
  ``foreachBatch`` MERGE with Spark's own checkpoint, for deployments
  where decode and apply are separate jobs.
"""

from .tail import TailResult, tail
from .stream import stream_apply

__all__ = ["tail", "TailResult", "stream_apply"]
