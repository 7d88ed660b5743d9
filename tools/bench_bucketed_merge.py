"""Micro-bench: full-rewrite vs bucket-pruned MERGE in steady state.

The scale question the bucketed target answers: once the table is large,
what does ONE incremental batch cost? The full-rewrite ParquetMergeTarget
pays O(table) per batch regardless of batch size; the bucketed target pays
O(touched buckets). This bench builds a base table of BASE_ROWS keys, then
applies ROUNDS small net batches (BATCH_KEYS updates each, deterministic
pseudo-random key pick) through both targets and reports per-batch wall
seconds. Both targets replay byte-identical nets and are asserted to hold
the same row/edit counts at the end.

Run: python tools/bench_bucketed_merge.py [BASE_ROWS] [BATCH_KEYS] [ROUNDS]
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS
from mysql_cdc_spark.pipeline.target import (
    BucketedParquetMergeTarget,
    ParquetMergeTarget,
)
from mysql_cdc_spark.session import get_spark


def rows_for_ids(ids_df, text_prefix=""):
    """Deterministic transcript row per id (same formula for base and nets,
    so an update's after-image is reproducible without a join)."""
    return ids_df.select(
        F.concat(F.lit("conv-"), (F.col("id") / 16).cast("long").cast("string")).alias("conv_id"),
        (F.col("id") % 16).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(
            F.lit(text_prefix), F.lit("text-"), F.col("id").cast("string"),
            F.lit(" "), F.repeat(F.lit("x"), 180),
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )


def as_net(df, op):
    return df.select(
        "conv_id", "turn_idx", F.lit(op).alias("op"),
        *[F.col(c).alias(f"after_{c}") for c, _, _ in TRANSCRIPTS.columns],
    )


def batch_ids(spark, n_rows, batch_keys, rnd):
    """Clustered key pick: each batch edits a contiguous window of ids —
    the realistic CDC shape (a batch touches a bounded set of active
    conversations), and the shape bucket pruning is designed for."""
    start = (rnd * 7919 * batch_keys) % n_rows
    return spark.range(batch_keys).select(
        ((F.col("id") + start) % n_rows).alias("id")
    )


def run(target, spark, n_rows, rounds, nets):
    v = target.merge(spark, as_net(rows_for_ids(spark.range(n_rows)), "insert"), 0)
    walls = []
    for rnd in range(rounds):
        t0 = time.time()
        v = target.merge(spark, nets[rnd], v)
        walls.append(time.time() - t0)
    return v, walls


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    batch_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("bench-bucketed-merge", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)
    work = tempfile.mkdtemp(prefix="bkt_bench_")
    # materialize identical nets once so both targets replay the same work
    nets = []
    for rnd in range(rounds):
        p = os.path.join(work, f"net_{rnd}")
        as_net(rows_for_ids(batch_ids(spark, n_rows, batch_keys, rnd),
                            text_prefix=f"edit-{rnd}-"), "update").write.parquet(p)
        nets.append(spark.read.parquet(p))

    buckets = 256
    out = {"base_rows": n_rows, "batch_keys": batch_keys, "rounds": rounds,
           "buckets": buckets, "bucket_cols": ["conv_id"], "cpus": int(cpus)}
    counts = {}
    for name, tgt in [
        ("full_rewrite", ParquetMergeTarget(os.path.join(work, "full"), TRANSCRIPTS, buckets=buckets)),
        ("bucketed", BucketedParquetMergeTarget(os.path.join(work, "bkt"), TRANSCRIPTS,
                                                buckets=buckets, bucket_cols=("conv_id",))),
    ]:
        v, walls = run(tgt, spark, n_rows, rounds, nets)
        final = tgt.read(spark, v)
        rows = final.count()
        assert rows == n_rows, (name, rows)
        counts[name] = final.filter(F.col("text").startswith("edit-")).count()
        out[name] = {"per_batch_s": [round(w, 2) for w in walls],
                     "mean_batch_s": round(sum(walls) / len(walls), 2),
                     "edited_rows": counts[name]}
    assert counts["full_rewrite"] == counts["bucketed"], counts
    a, b = out["full_rewrite"]["mean_batch_s"], out["bucketed"]["mean_batch_s"]
    out["speedup"] = round(a / b, 2) if b else None
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
