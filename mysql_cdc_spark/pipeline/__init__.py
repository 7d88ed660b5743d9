"""Merge-apply pipeline: ordering, dedup, target MERGE, ledger, replay."""
