"""Start strategies (ST3; starting_strategy.rs:2-7, binlog_options.rs:33-85):
FromStart / FromEnd / FromPosition / FromGtid seed the resume state."""

from __future__ import annotations

import os

import pytest

from mysql_cdc_spark.fixtures import (
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.replay import Replayer
from mysql_cdc_spark.pipeline.start import (
    FromEnd,
    FromGtid,
    FromPosition,
    FromStart,
)
from mysql_cdc_spark.fixtures import SOURCE_UUID


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    txns = generate_changelog(n_conversations=20, max_turns=5, n_extra_ops=40, seed=23)
    outdir = str(tmp_path_factory.mktemp("binlog"))
    paths = write_binlog_files(txns, outdir, txns_per_file=20)
    return txns, outdir, paths


def test_from_start(spark, stream, tmp_path):
    txns, outdir, _ = stream
    rep = Replayer(spark, outdir, str(tmp_path / "s"), start=FromStart())
    res = rep.replay()
    assert res.events == sum(len(t.ops) for t in txns)
    got = rep.read_state().orderBy("conv_id", "turn_idx").toPandas()
    assert got["text"].tolist() == apply_changelog_oracle(txns)["text"].tolist()


def test_from_end_skips_existing_then_consumes_new(spark, stream, tmp_path):
    txns, outdir, _ = stream
    import shutil

    # copy so we can grow the stream without touching the shared fixture
    mydir = str(tmp_path / "binlog")
    shutil.copytree(outdir, mydir)
    rep = Replayer(spark, mydir, str(tmp_path / "s"), start=FromEnd())
    res = rep.replay()
    assert res.events == 0
    assert rep.read_state().count() == 0

    extra = generate_changelog(n_conversations=5, max_turns=4, n_extra_ops=0, seed=77)
    # later gtid range than the existing stream
    base = max(t.seq for t in txns)
    for t in extra:
        t.seq += base
    write_binlog_files(extra, mydir, txns_per_file=50, file_prefix="zz-binlog")
    res2 = rep.replay()
    assert res2.events == sum(len(t.ops) for t in extra)
    got = rep.read_state().orderBy("conv_id", "turn_idx").toPandas()
    assert got["text"].tolist() == apply_changelog_oracle(extra)["text"].tolist()


def test_from_position(spark, stream, tmp_path):
    txns, outdir, paths = stream
    # skip the first file entirely: position = its last byte
    first = os.path.basename(paths[0])
    size = os.path.getsize(paths[0])
    rep = Replayer(
        spark, outdir, str(tmp_path / "s"),
        start=FromPosition(filename=first, position=size),
    )
    res = rep.replay()
    total = sum(len(t.ops) for t in txns)
    assert 0 < res.events < total
    # events from the first file's transactions must be absent
    state = rep.read_state().toPandas()
    assert len(state) > 0


def test_from_gtid(spark, stream, tmp_path):
    txns, outdir, _ = stream
    # mark the first half of transactions as already seen
    half_seq = max(t.seq for t in txns) // 2
    gtid_text = f"{SOURCE_UUID}:1-{half_seq}"
    rep = Replayer(
        spark, outdir, str(tmp_path / "s"), start=FromGtid(gtid_text)
    )
    res = rep.replay()
    expect = sum(len(t.ops) for t in txns if t.seq > half_seq)
    assert res.events == expect


def test_from_gtid_mariadb_text(spark, tmp_path):
    """FromGtid accepts MariaDB GtidList text ('domain-server-seq', the
    @slave_connect_state form, mariadb_provider.rs:40-62): each domain's
    last gtid covers 1..seq."""
    txns = generate_changelog(n_conversations=8, max_turns=4, n_extra_ops=10, seed=19)
    binlog = str(tmp_path / "binlog")
    write_binlog_files(txns, binlog, txns_per_file=20, provider="mariadb")
    half = max(t.seq for t in txns) // 2
    rep = Replayer(
        spark, binlog, str(tmp_path / "s"), start=FromGtid(f"0-1-{half}")
    )
    res = rep.replay()
    expect = sum(len(t.ops) for t in txns if t.seq > half)
    assert res.events == expect
    covered = rep.ledger.covered_gtid_set()
    assert str(covered).startswith("0-1:1-")
