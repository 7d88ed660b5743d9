"""North-rule scaling evidence: the same CDC replay job at N and 4N cores.

The sandbox has no multi-node cluster, so per BASELINE.md the two-cluster-
size criterion is evidenced by running the identical job on the identical
input at two parallelism levels and reporting throughput at both plus
scaling efficiency ``eps(4N) / (4 × eps(N))``.

Methodology notes (documented in BENCH.md):
- The host is a Firecracker microVM with 32 vCPUs; a pure-CPU
  multiprocessing control shows near-linear scaling 1→8 procs (~0.85-0.9)
  but only ~0.66 at 8→32 — vCPUs beyond ~8 are burst capacity, not full
  cores, and run-to-run steal varies ±50%. The N→4N comparison therefore
  uses N=2, 4N=8 (inside the host's real-parallel region), runs each config
  twice interleaved, and reports the best per config (standard best-of-N on
  shared hardware). The CPU control is measured in the same session and
  reported alongside. A single local[32] run is also reported as peak
  sandbox throughput.
- Corpus: deterministic changelog (seed 99), ~9M change events over 64
  rotation segments, hot-conversation skew + duplicate redelivery +
  mid-stream schema evolution — the adversarial shape, not the easy one.

Usage:
  python tools/bench_scaling.py            # full protocol → JSON lines
  python tools/bench_scaling.py --one 8    # single measured run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_CONV = 600_000
N_EXTRA = 2_400_000
N_FILES = 64
SEED = 99
CORPUS = f"/tmp/cdc_scaling_corpus_v2_{SEED}"
PAIR = (2, 8)  # N and 4N cores (see methodology)


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


def cpu_control() -> dict:
    """Pure-CPU multiprocessing control: same-session hardware scaling."""
    from concurrent.futures import ProcessPoolExecutor

    out = {}
    for procs in PAIR:
        t0 = time.time()
        with ProcessPoolExecutor(max_workers=procs) as ex:
            list(ex.map(_burn, [3_000_000] * 32))
        out[procs] = round(time.time() - t0, 2)
    out["control_efficiency"] = round(
        out[PAIR[0]] / (out[PAIR[1]] * (PAIR[1] // PAIR[0])), 3
    )
    return out


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


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
    decode_binlog_dir(
        spark, binlog_dir, TRANSCRIPTS, path_filter="binlog.000001"
    ).count()

    store = tempfile.mkdtemp(prefix=f"cdc_scaling_store_{cpus}_")
    rep = Replayer(spark, binlog_dir, store)  # plain max_by LWW (see Replayer docstring)
    t0 = time.time()
    result = rep.replay(files_per_batch=N_FILES)
    seconds = time.time() - t0
    events = result.events
    phases: dict = {}
    for e in rep.ledger.entries():
        for k, v in e.metrics.items():
            if k.endswith("_s") and k != "lag_s":  # durations only (lag is a gauge)
                phases[k] = round(phases.get(k, 0.0) + v, 2)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "events": events,
                "seconds": round(seconds, 2),
                "events_per_sec": round(events / seconds, 1),
                "phases": phases,
            }
        )
    )


def _subprocess_run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", str(cpus)],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    print(line)
    return rec


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]))
        return
    ensure_corpus()
    control = cpu_control()
    print(json.dumps({"cpu_control": control}))

    # interleaved best-of-2 per config (cancels transient vCPU steal)
    best: dict[int, dict] = {}
    for cpus in (PAIR[1], PAIR[0], PAIR[1], PAIR[0]):
        rec = _subprocess_run(cpus)
        if cpus not in best or rec["seconds"] < best[cpus]["seconds"]:
            best[cpus] = rec
    peak = _subprocess_run(32)

    n, n4 = PAIR
    eff = best[n4]["events_per_sec"] / (
        (n4 // n) * best[n]["events_per_sec"]
    )
    print(
        json.dumps(
            {
                "N_cores": n,
                "4N_cores": n4,
                "eps_N": best[n]["events_per_sec"],
                "eps_4N": best[n4]["events_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "cpu_control_efficiency": control["control_efficiency"],
                "peak_local32_eps": peak["events_per_sec"],
                "events": best[n]["events"],
            }
        )
    )


if __name__ == "__main__":
    main()
