"""North-rule scaling evidence: the same CDC replay job at N and 4N cores.

The sandbox has no multi-node cluster, so per BASELINE.md the two-cluster-
size criterion is evidenced by running the identical job on the identical
input at ``local[8]`` and ``local[32]`` (this host has 32 physical cores)
and reporting throughput at both plus scaling efficiency
``eps(4N) / (4 × eps(N))``.

Corpus: deterministic changelog (seed 99), ~5M change events over 64
rotation segments — sized so per-run fixed costs (session spin-up, plan,
snapshot commit) are small relative to real work. Generated once, cached.

Usage:
  python tools/bench_scaling.py            # orchestrate both runs → BENCH.md data
  python tools/bench_scaling.py --one 8    # single measured run (subprocess)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_CONV = 300_000
N_EXTRA = 1_200_000
N_FILES = 64
SEED = 99
CORPUS = f"/tmp/cdc_scaling_corpus_v1_{SEED}"


def ensure_corpus() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    meta = os.path.join(CORPUS, "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return json.load(f)["events"]
    import shutil

    from mysql_cdc_spark.fixtures import (
        count_change_events,
        generate_changelog,
        write_binlog_files,
    )

    shutil.rmtree(CORPUS, ignore_errors=True)
    os.makedirs(CORPUS, exist_ok=True)
    t0 = time.time()
    txns = generate_changelog(
        n_conversations=N_CONV,
        max_turns=8,
        n_extra_ops=N_EXTRA,
        seed=SEED,
        hot_conversations=10,
        hot_share=0.3,
        duplicate_txns=5000,
        evolve_after_frac=0.5,
    )
    n_events = count_change_events(txns)
    write_binlog_files(
        txns,
        os.path.join(CORPUS, "binlog"),
        txns_per_file=(len(txns) + N_FILES - 1) // N_FILES,
        workers=min(32, os.cpu_count() or 8),
    )
    with open(meta, "w") as f:
        json.dump({"events": n_events, "gen_s": round(time.time() - t0, 1)}, f)
    print(f"corpus: {n_events} events in {time.time() - t0:.0f}s", file=sys.stderr)
    return n_events


def run_one(cpus: int) -> None:
    """Measured run: full replay (single micro-batch over all 64 segments)
    at local[cpus]. Warmup decodes one segment first so Python-worker
    spin-up isn't billed to the measured throughput (steady-state metric —
    a production job runs for hours; spin-up is once)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import tempfile

    from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS, decode_binlog_dir
    from mysql_cdc_spark.pipeline.replay import Replayer
    from mysql_cdc_spark.session import get_spark

    binlog_dir = os.path.join(CORPUS, "binlog")
    spark = get_spark(
        app_name=f"cdc_scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    # warmup: one segment decode (spins up workers, JIT, codegen)
    decode_binlog_dir(
        spark, binlog_dir, TRANSCRIPTS, path_filter="binlog.000001"
    ).count()

    store = tempfile.mkdtemp(prefix=f"cdc_scaling_store_{cpus}_")
    rep = Replayer(spark, binlog_dir, store, salt_buckets=max(8, cpus))
    t0 = time.time()
    result = rep.replay(files_per_batch=N_FILES)
    seconds = time.time() - t0
    events = result.events
    print(
        json.dumps(
            {
                "cpus": cpus,
                "events": events,
                "seconds": round(seconds, 2),
                "events_per_sec": round(events / seconds, 1),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]))
        return
    ensure_corpus()
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(cpus)],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)
    eff = results[32]["events_per_sec"] / (4 * results[8]["events_per_sec"])
    summary = {
        "N_cores": 8,
        "4N_cores": 32,
        "eps_N": results[8]["events_per_sec"],
        "eps_4N": results[32]["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "events": results[8]["events"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
