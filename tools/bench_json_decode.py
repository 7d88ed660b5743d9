"""Per-core decode throughput for a JSON-heavy table spec.

Builds one in-memory binlog segment whose rows carry a jsonb column in
three payload shapes — flat scalars (numbers/flags, the vectorized batch
kernel's fast path), small flat objects, and nested documents (both on
the recursive per-value fallback) — and times `decode_segment_fast`
single-threaded. Reported per round in BENCH.md (VERDICT r3 item 5).

Run: python tools/bench_json_decode.py [rows_per_shape]
"""

from __future__ import annotations

import sys
import time

from mysql_cdc_spark.binlog.constants import ColumnType
from mysql_cdc_spark.binlog.decoder import TableSpec
from mysql_cdc_spark.binlog.encoder import BinlogWriter
from mysql_cdc_spark.binlog.jsonb import encode_jsonb
from mysql_cdc_spark.binlog.vector import decode_segment_fast

SPEC = TableSpec(
    database="app",
    table="docs",
    columns=(
        ("doc_id", "string", "str"),
        ("body", "string", "json"),
    ),
    primary_key=("doc_id",),
)
CTYPES = [ColumnType.VARCHAR, ColumnType.JSON]
CMETA = [64, 4]
UUID = "24bc7850-2c16-11e6-a073-0242ac110042"


def build_segment(n: int, payload) -> bytes:
    w = BinlogWriter("json.000001")
    rows_per_txn = 500
    seq = 0
    i = 0
    while i < n:
        seq += 1
        w.write_mysql_gtid(UUID, seq)
        w.write_query("BEGIN", database="app")
        w.write_table_map(
            300, "app", "docs", CTYPES, CMETA, [False, True],
            column_names=["doc_id", "body"],
        )
        batch = []
        for k in range(i, min(n, i + rows_per_txn)):
            batch.append([f"d-{k:08d}", encode_jsonb(payload(k))])
        w.write_rows(300, CTYPES, CMETA, batch)
        w.write_xid(seq)
        i += rows_per_txn
    return w.getvalue()


SHAPES = {
    "flat_scalar": lambda k: (k * 37) % 100000 if k % 3 else k * 0.125,
    "flat_string": lambda k: f"session-{k % 997} turn text without escapes {k}",
    "flat_object": lambda k: {"score": k * 0.5, "n": k, "ok": bool(k % 2)},
    "nested": lambda k: {
        "meta": {"k": k, "tags": ["a", "b", str(k % 7)]},
        "vals": [k, k + 1, {"deep": k * 1.5}],
    },
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    for name, payload in SHAPES.items():
        blob = build_segment(n, payload)
        best = None
        for _ in range(3):
            t0 = time.time()
            frames = list(decode_segment_fast(blob, "json.000001", SPEC))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows = sum(len(f) for f in frames)
        assert rows == n, (rows, n)
        print(
            f"{name:12s} {rows} rows  best {best:.3f}s  "
            f"{rows / best / 1000:.0f}k rows/s/core"
        )


if __name__ == "__main__":
    main()
