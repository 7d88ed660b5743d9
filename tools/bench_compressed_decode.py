"""Per-core decode throughput for compressed wire forms.

Builds one deterministic transcript binlog segment, rewrites it as
(a) a MariaDB ``log_bin_compress=ON`` stream (zlib event tails) and
(b) a MySQL ``binlog_transaction_compression=ON`` stream (zstd
TRANSACTION_PAYLOAD wrappers), and times ``decode_segment_fast``
single-threaded on all three byte forms. Reported per round in
BENCH.md — the question the figure answers: what does transparent
decompression cost on the vectorized path, and what does it buy in
bytes scanned?

Run: python tools/bench_compressed_decode.py [n_conversations]
"""

from __future__ import annotations

import sys
import time

from mysql_cdc_spark.binlog.compressed import (
    compress_segment,
    wrap_transaction_payload_segment,
)
from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS
from mysql_cdc_spark.binlog.vector import decode_segment_fast
from mysql_cdc_spark.fixtures import generate_changelog, write_binlog_files


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bench_compressed_")
    txns = generate_changelog(
        n_conversations=n_conv, max_turns=8, n_extra_ops=n_conv * 3, seed=99
    )
    paths = write_binlog_files(txns, tmp, txns_per_file=10**9)
    with open(paths[0], "rb") as f:
        plain = f.read()
    variants = {
        "plain": plain,
        "mariadb_zlib": compress_segment(plain, min_len=0),
        "mysql_zstd_payload": wrap_transaction_payload_segment(plain, "zstd"),
    }

    # warm (numpy/pyarrow first-call costs, zstd context)
    for data in variants.values():
        decode_segment_fast(data, "binlog.000001", TRANSCRIPTS)

    results = {}
    for name, data in variants.items():
        best = None
        rows = 0
        for _ in range(3):
            t0 = time.perf_counter()
            frames = decode_segment_fast(data, "binlog.000001", TRANSCRIPTS)
            dt = time.perf_counter() - t0
            rows = sum(len(f) for f in frames)
            best = dt if best is None else min(best, dt)
        results[name] = (rows, best, len(data))

    base_rows, base_s, base_bytes = results["plain"]
    print(f"rows per variant: {base_rows}  (small txns, ~3 events each)")
    for name, (rows, s, nbytes) in results.items():
        assert rows == base_rows, f"{name} decoded {rows} rows != {base_rows}"
        print(
            f"{name:>20}: {rows/s:>10.0f} rows/s/core  "
            f"{s:6.3f}s  {nbytes/1e6:7.2f} MB on disk "
            f"({nbytes/base_bytes:.2f}x plain)"
        )

    # bulk shape: per-wrapper decompress overhead amortizes over rows —
    # the shape a bulk load / large-transaction OLTP stream actually has
    bulk = _bulk_segment(n_txns=60, rows_per_event=400)
    bulk_variants = {
        "plain": bulk,
        "mariadb_zlib": compress_segment(bulk, min_len=0),
        "mysql_zstd_payload": wrap_transaction_payload_segment(bulk, "zstd"),
    }
    for data in bulk_variants.values():
        decode_segment_fast(data, "binlog.000001", TRANSCRIPTS)
    print("\nbulk shape: 60 txns x 400-row write events")
    base_bytes = len(bulk)
    for name, data in bulk_variants.items():
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            frames = decode_segment_fast(data, "binlog.000001", TRANSCRIPTS)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows = sum(len(f) for f in frames)
        print(
            f"{name:>20}: {rows/best:>10.0f} rows/s/core  "
            f"{best:6.3f}s  {len(data)/1e6:7.2f} MB on disk "
            f"({len(data)/base_bytes:.2f}x plain)"
        )


def _bulk_segment(n_txns: int, rows_per_event: int) -> bytes:
    from mysql_cdc_spark.binlog.constants import ColumnType
    from mysql_cdc_spark.binlog.encoder import BinlogWriter

    spec = TRANSCRIPTS
    ctypes = [ColumnType.VARCHAR, ColumnType.LONG, ColumnType.VARCHAR,
              ColumnType.VARCHAR, ColumnType.VARCHAR, ColumnType.TIMESTAMP2]
    cmeta = [160, 0, 64, 2048, 64, 3]
    names = [c[0] for c in spec.columns]
    w = BinlogWriter("binlog.000001")
    uuid = "24bc7850-2c16-11e6-a073-0242ac110042"
    k = 0
    for t in range(n_txns):
        w.write_mysql_gtid(uuid, t + 1, timestamp=1000 + t)
        w.write_query("BEGIN", database=spec.database, timestamp=1000 + t)
        w.write_table_map(
            11, spec.database, spec.table, ctypes, cmeta,
            [False] * 6, column_names=names,
        )
        rows = []
        for _ in range(rows_per_event):
            k += 1
            rows.append(
                [f"conv-{k % 997:05d}", k, "assistant",
                 f"turn text {k} " * 6, None, 1_700_000_000_000 + k]
            )
        w.write_rows(11, ctypes, cmeta, rows, timestamp=1000 + t)
        w.write_xid(t + 1, timestamp=1000 + t)
    return w.getvalue()


if __name__ == "__main__":
    main()
