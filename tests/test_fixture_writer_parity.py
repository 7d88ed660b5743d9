"""Parallel fixture writer parity: ``write_binlog_files(workers=N)``
(the bench corpus path) must produce byte-identical segments to the
sequential path for every parameter that threads through the per-file
job tuple — a missing tuple slot silently mis-parameterizes EVERY
parallel write (caught live: widen_after_seq was absent from the
parallel job, crashing any cold-cache bench run)."""

import glob
import hashlib
import os

from mysql_cdc_spark.fixtures import generate_changelog, write_binlog_files


def _hashes(d):
    return {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(d, "*"))
    }


def test_parallel_writer_byte_parity(tmp_path):
    txns = generate_changelog(
        n_conversations=10, max_turns=5, n_extra_ops=40, seed=9,
        evolve_after_frac=0.5, duplicate_txns=2,
    )
    widen_at = max(t.seq for t in txns) * 2 // 3
    for kwargs in (
        {},
        {"provider": "mariadb"},
        {"row_image": "minimal"},
        {"row_metadata": "minimal", "widen_after_seq": widen_at},
        {"rows_query": True},
    ):
        seq_dir = tmp_path / ("seq_" + "_".join(kwargs) or "base")
        par_dir = tmp_path / ("par_" + "_".join(kwargs) or "base")
        write_binlog_files(
            txns, str(seq_dir), txns_per_file=10, workers=0, **kwargs
        )
        write_binlog_files(
            txns, str(par_dir), txns_per_file=10, workers=8, **kwargs
        )
        hs, hp = _hashes(str(seq_dir)), _hashes(str(par_dir))
        assert hs and hs == hp, f"parallel writer diverged for {kwargs}"
