"""Decode cost/benefit of MySQL 8 PARTIAL_JSON row images.

Builds one deterministic stream of UPDATEs over a JSON-document table in
two wire forms — plain UPDATE_ROWS_V2 frames carrying the full post-image
document, and PARTIAL_UPDATE_ROWS_EVENT (type 39) frames carrying diff
vectors that touch 3 of ~40 fields — and times ``decode_segment_fast``
single-threaded on both. The question the figure answers: what does
decode-time diff application cost on the vectorized path, and what does
PARTIAL_JSON buy in bytes shipped/scanned? Reported per round in BENCH.md.

Run: python tools/bench_partial_decode.py [n_updates]
"""

from __future__ import annotations

import sys
import time

from mysql_cdc_spark.binlog.constants import ColumnType
from mysql_cdc_spark.binlog.decoder import TableSpec
from mysql_cdc_spark.binlog.encoder import BinlogWriter
from mysql_cdc_spark.binlog.jsonb import encode_jsonb
from mysql_cdc_spark.binlog.partial import (
    DIFF_INSERT,
    DIFF_REPLACE,
    PartialJson,
    apply_json_diffs,
)
from mysql_cdc_spark.binlog.vector import decode_segment_fast

DOCS = TableSpec(
    database="app",
    table="docs",
    columns=(
        ("id", "bigint", "int"),
        ("meta", "string", "json"),
    ),
    primary_key=("id",),
)
CTYPES = [ColumnType.LONGLONG, ColumnType.JSON]
CMETA = [0, 4]
UUID = "24bc7850-2c16-11e6-a073-0242ac110077"
ROWS_PER_EVENT = 50


def _doc(i: int) -> dict:
    # ~40 scalar fields + a tag array: a realistic "document row" whose
    # updates touch a handful of fields
    d = {f"field_{k:02d}": (i * 31 + k) % 100000 for k in range(36)}
    d["title"] = f"document {i} " + "lorem ipsum dolor sit amet " * 4
    d["tags"] = [f"tag-{(i + k) % 50}" for k in range(6)]
    d["rev"] = i % 97
    d["state"] = "active" if i % 3 else "archived"
    return d


def _diffs(i: int) -> list:
    return [
        (DIFF_REPLACE, "$.rev", i % 97 + 1),
        (DIFF_REPLACE, f"$.field_{i % 36:02d}", (i * 7) % 100000),
        (DIFF_INSERT, "$.tags[99]", f"tag-new-{i % 50}"),
    ]


def _stream(n_updates: int, partial: bool) -> bytes:
    w = BinlogWriter("binlog.000001")
    seq = 0
    for base in range(0, n_updates, ROWS_PER_EVENT):
        seq += 1
        w.write_mysql_gtid(UUID, seq, timestamp=100 + seq)
        w.write_query("BEGIN", database="app", timestamp=100 + seq)
        w.write_table_map(31, "app", "docs", CTYPES, CMETA, [False, True])
        pairs = []
        for i in range(base, min(base + ROWS_PER_EVENT, n_updates)):
            before = [i, encode_jsonb(_doc(i))]
            if partial:
                after = [i, PartialJson(_diffs(i))]
            else:
                after = [i, encode_jsonb(apply_json_diffs(_doc(i), _diffs(i)))]
            pairs.append((before, after))
        if partial:
            w.write_partial_update_rows(31, CTYPES, CMETA, pairs)
        else:
            w.write_update_rows(31, CTYPES, CMETA, pairs)
        w.write_xid(seq, timestamp=100 + seq)
    return w.getvalue()


def main() -> None:
    n_updates = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    variants = {
        "plain_full_doc": _stream(n_updates, partial=False),
        "partial_json": _stream(n_updates, partial=True),
    }
    for data in variants.values():  # warm numpy/pyarrow first-call costs
        decode_segment_fast(data, "binlog.000001", DOCS)

    results = {}
    for name, data in variants.items():
        best, rows = None, 0
        for _ in range(3):
            t0 = time.perf_counter()
            frames = decode_segment_fast(data, "binlog.000001", DOCS)
            dt = time.perf_counter() - t0
            rows = sum(len(f) for f in frames)
            best = dt if best is None else min(best, dt)
        results[name] = (rows, best, len(data))

    plain_rows, plain_dt, plain_bytes = results["plain_full_doc"]
    for name, (rows, dt, nbytes) in results.items():
        print(
            f"{name:>16}: {rows} change rows in {dt:.3f}s "
            f"({rows / dt:,.0f} rows/s/core), {nbytes / 1e6:.2f} MB on disk "
            f"({nbytes / plain_bytes:.2%} of plain)"
        )
    _, part_dt, part_bytes = results["partial_json"]
    print(
        f"summary: partial stream is {plain_bytes / part_bytes:.1f}x smaller, "
        f"decode {part_dt / plain_dt:.2f}x the plain-twin time "
        f"(diff application replaces the full-document decode)"
    )


if __name__ == "__main__":
    main()
