"""Multi-table replay: one binlog stream carrying TWO tables (including a
mixed segment with both tables' transactions interleaved) routes each
table to its own target/ledger, each matching its oracle — and each
table's decode skips the other table's rows (tm_is_target gating)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from mysql_cdc_spark.binlog.constants import ColumnType, EventType
from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS, TableSpec, decode_binlog_dir
from mysql_cdc_spark.binlog.encoder import BinlogWriter
from mysql_cdc_spark.fixtures import (
    COLUMN_TYPES,
    PRE_COLUMNS,
    TABLE_ID_PRE,
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.multi import MultiReplayer

METRICS = TableSpec(
    database="metrics",
    table="samples",
    columns=(
        ("sample_id", "string", "str"),
        ("k", "int", "int"),
        ("value", "double", "double"),
    ),
    primary_key=("sample_id", "k"),
)
M_TYPES = [ColumnType.VARCHAR, ColumnType.LONG, ColumnType.DOUBLE]
M_META = [64, 0, 8]
M_COLS = ["sample_id", "k", "value"]
M_TABLE_ID = 500
UUID = "24bc7850-2c16-11e6-a073-0242ac110001"


def _write_mixed_segment(outdir: str, start_seq: int) -> tuple[list, dict]:
    """One segment interleaving metrics txns with a transcripts txn.
    Returns (extra transcript rows, expected metrics final state)."""
    w = BinlogWriter("zmix.000001")
    seq = start_seq

    def m_txn(ops):
        nonlocal seq
        seq += 1
        w.write_mysql_gtid(UUID, seq)
        w.write_query("BEGIN", database="metrics")
        w.write_table_map(
            M_TABLE_ID, "metrics", "samples", M_TYPES, M_META,
            [False, False, True], column_names=M_COLS,
            simple_primary_keys=[0, 1],
        )
        for kind, rows in ops:
            et = (
                EventType.MYSQL_WRITE_ROWS_V2
                if kind == "insert"
                else EventType.MYSQL_DELETE_ROWS_V2
            )
            if kind == "update":
                w.write_update_rows(M_TABLE_ID, M_TYPES, M_META, rows)
            else:
                w.write_rows(M_TABLE_ID, M_TYPES, M_META, rows, event_type=et)
        w.write_xid(seq)

    m_txn([("insert", [["s1", 0, 1.5], ["s1", 1, 2.5], ["s2", 0, 10.0]])])

    # a transcripts txn INSIDE the same segment, between metrics txns
    seq += 1
    t_types = [COLUMN_TYPES[c][0] for c in PRE_COLUMNS]
    t_meta = [COLUMN_TYPES[c][1] for c in PRE_COLUMNS]
    t_row = ["zzz-mixed", 0, "user", "row from the mixed segment", 1700000000000]
    w.write_mysql_gtid(UUID, seq)
    w.write_query("BEGIN", database="chat")
    w.write_table_map(
        TABLE_ID_PRE, "chat", "transcripts", t_types, t_meta,
        [False] * 5, column_names=PRE_COLUMNS, simple_primary_keys=[0, 1],
    )
    w.write_rows(TABLE_ID_PRE, t_types, t_meta, [t_row])
    w.write_xid(seq)

    m_txn([("update", [(["s1", 0, 1.5], ["s1", 0, 3.25])])])
    m_txn([("delete", [["s2", 0, 10.0]])])

    w.save(os.path.join(outdir, "zmix.000001"))
    expected_metrics = {("s1", 0): 3.25, ("s1", 1): 2.5}
    return [t_row], expected_metrics


@pytest.mark.parametrize("files_per_batch", [None, 1])
def test_multi_table_replay_matches_both_oracles(spark, tmp_path, files_per_batch):
    txns = generate_changelog(
        n_conversations=10, max_turns=4, n_extra_ops=20, seed=23,
        duplicate_txns=2,
    )
    outdir = str(tmp_path / "binlog")
    write_binlog_files(txns, outdir, txns_per_file=20)
    max_seq = max(t.seq for t in txns)
    extra_rows, expected_metrics = _write_mixed_segment(outdir, max_seq + 1000)

    multi = MultiReplayer(
        spark, outdir, str(tmp_path / "stores"), [TRANSCRIPTS, METRICS]
    )
    results = multi.replay(files_per_batch=files_per_batch)
    assert results["chat.transcripts"].events > 0
    assert results["metrics.samples"].events == 5  # 3 ins + 1 upd + 1 del

    # transcripts: fixture oracle + the mixed-segment row
    got_t = (
        multi.read_state("chat.transcripts")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want_t = apply_changelog_oracle(txns)
    assert len(got_t) == len(want_t) + 1
    assert got_t[got_t["conv_id"] == "zzz-mixed"]["text"].tolist() == [
        "row from the mixed segment"
    ]
    non_mixed = got_t[got_t["conv_id"] != "zzz-mixed"].reset_index(drop=True)
    assert non_mixed["text"].tolist() == want_t["text"].tolist()

    # metrics: the hand-computed final state; the transcripts rows in the
    # mixed segment never leak into it
    got_m = multi.read_state("metrics.samples").toPandas()
    got = {
        (r.sample_id, r.k): r.value for r in got_m.itertuples(index=False)
    }
    assert got == expected_metrics


def test_other_tables_rows_are_skipped_cheaply(spark, tmp_path):
    """A decode pass for one spec drops the other table's row events
    (TABLE_MAP targeting) — both directions."""
    outdir = str(tmp_path / "binlog")
    os.makedirs(outdir, exist_ok=True)
    _write_mixed_segment(outdir, 1)

    t = decode_binlog_dir(spark, outdir, TRANSCRIPTS).toPandas()
    m = decode_binlog_dir(spark, outdir, METRICS).toPandas()
    assert set(t["tbl"]) == {"transcripts"} and len(t) == 1
    assert set(m["tbl"]) == {"samples"} and len(m) == 5
    assert sorted(m["op"]) == ["delete", "insert", "insert", "insert", "update"]


def test_duplicate_specs_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="duplicate"):
        MultiReplayer(
            spark, str(tmp_path), str(tmp_path / "s"), [METRICS, METRICS]
        )


def test_multi_table_bootstrap(spark, tmp_path):
    """Per-table snapshot-then-stream: seed both tables from snapshots at
    one shared position, catch up, land on the full-replay states."""
    from mysql_cdc_spark.pipeline.start import FromPosition

    txns = generate_changelog(
        n_conversations=10, max_turns=4, n_extra_ops=20, seed=29,
        duplicate_txns=2,
    )
    outdir = str(tmp_path / "binlog")
    write_binlog_files(txns, outdir, txns_per_file=10)
    max_seq = max(t.seq for t in txns)
    _write_mixed_segment(outdir, max_seq + 1000)
    specs = [TRANSCRIPTS, METRICS]

    full = MultiReplayer(spark, outdir, str(tmp_path / "full"), specs)
    full.replay()

    half = MultiReplayer(spark, outdir, str(tmp_path / "half"), specs)
    for rep in half.replayers.values():
        files = rep.pending_files()
        rep.run_batch(files[: max(1, len(files) // 2)])
    entry = half.replayers["chat.transcripts"].ledger.last()

    boot = MultiReplayer(spark, outdir, str(tmp_path / "boot"), specs)
    versions = boot.bootstrap(
        {n: r.read_state() for n, r in half.replayers.items()},
        at=FromPosition(entry.max_file, entry.max_pos),
    )
    assert versions == {"chat.transcripts": 1, "metrics.samples": 1}
    boot.replay()

    for name in boot.replayers:
        cols = full.read_state(name).columns
        want = full.read_state(name).toPandas().sort_values(cols).reset_index(drop=True)
        got = boot.read_state(name).toPandas().sort_values(cols).reset_index(drop=True)
        assert got.equals(want), name

    with pytest.raises(KeyError, match="unknown table"):
        boot2 = MultiReplayer(spark, outdir, str(tmp_path / "b2"), specs)
        boot2.bootstrap({"nope.table": full.read_state("chat.transcripts")},
                        at=FromPosition(entry.max_file, entry.max_pos))


# ---------------------------------------------------------------------------
# sidecar fixture: a second table (chat.tool_calls) committed INSIDE the
# same transactions — one GTID, two TABLE_MAP+rows pairs (the real
# multi-table transaction shape; write_binlog_files(sidecar=True))
# ---------------------------------------------------------------------------

import glob
import shutil

from mysql_cdc_spark.fixtures import apply_sidecar_oracle, tool_calls_spec
from mysql_cdc_spark.pipeline.replay import Replayer


@pytest.fixture(scope="module")
def sidecar_changelog(tmp_path_factory):
    txns = generate_changelog(
        n_conversations=20, max_turns=6, n_extra_ops=80,
        seed=5, duplicate_txns=3, evolve_after_frac=0.5,
    )
    outdir = str(tmp_path_factory.mktemp("binlog_sidecar"))
    write_binlog_files(txns, outdir, txns_per_file=30, sidecar=True)
    return txns, outdir


def _transcripts_pdf(rep) -> pd.DataFrame:
    return (
        rep.read_state()
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )


class TestSingleSpecSkipsMultiTableTxns:
    """Transactions that ALSO touch another table decode identically to
    ones that don't — on both decode paths."""

    def test_vector_path_ignores_sidecar_events(
        self, spark, sidecar_changelog, tmp_path
    ):
        txns, outdir = sidecar_changelog
        rep = Replayer(spark, outdir, str(tmp_path / "store"))
        rep.replay()
        got = _transcripts_pdf(rep)
        oracle = apply_changelog_oracle(txns)
        assert got["text"].tolist() == oracle["text"].tolist()

    def test_scalar_path_ignores_sidecar_events(
        self, spark, sidecar_changelog, tmp_path, monkeypatch
    ):
        txns, outdir = sidecar_changelog
        monkeypatch.setenv("SPARK_CDC_SCALAR_DECODE", "1")
        rep = Replayer(spark, outdir, str(tmp_path / "store_s"))
        rep.replay()
        got = _transcripts_pdf(rep)
        oracle = apply_changelog_oracle(txns)
        assert got["text"].tolist() == oracle["text"].tolist()


class TestMultiReplayerSidecar:
    def test_both_tables_match_their_oracles(
        self, spark, sidecar_changelog, tmp_path
    ):
        txns, outdir = sidecar_changelog
        mr = MultiReplayer(
            spark, outdir, str(tmp_path / "multi"),
            specs=[TRANSCRIPTS, tool_calls_spec()],
        )
        results = mr.replay()
        assert set(results) == {"chat.transcripts", "chat.tool_calls"}
        assert all(r.events > 0 for r in results.values())

        t_oracle = apply_changelog_oracle(txns)
        t_got = (
            mr.read_state("transcripts")  # bare-name lookup
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        assert t_got["text"].tolist() == t_oracle["text"].tolist()

        c_oracle = apply_sidecar_oracle(txns)
        c_got = (
            mr.read_state("tool_calls")
            .orderBy("conv_id", "turn_idx", "call_ord")
            .toPandas()
        )
        assert c_got["tool_name"].tolist() == c_oracle["tool_name"].tolist()
        assert (
            c_got["duration_ms"].tolist() == c_oracle["duration_ms"].tolist()
        )
        # lag metric is per table
        assert set(mr.lag()) == {"chat.transcripts", "chat.tool_calls"}

    def test_resume_per_table(self, spark, sidecar_changelog, tmp_path):
        """Kill-and-resume: a fresh MultiReplayer on the same stores picks
        every table up from its own ledger; final states unchanged."""
        txns, outdir = sidecar_changelog
        files = sorted(glob.glob(os.path.join(outdir, "*")))
        half = str(tmp_path / "half")
        os.makedirs(half)
        for f in files[: len(files) // 2]:
            shutil.copy(f, half)
        store = str(tmp_path / "multi_r")
        specs = [TRANSCRIPTS, tool_calls_spec()]
        MultiReplayer(spark, half, store, specs=specs).replay()
        for f in files[len(files) // 2:]:
            shutil.copy(f, half)
        mr2 = MultiReplayer(spark, half, store, specs=specs)
        mr2.replay()
        t_oracle = apply_changelog_oracle(txns)
        t_got = (
            mr2.read_state("transcripts").orderBy("conv_id", "turn_idx").toPandas()
        )
        assert t_got["text"].tolist() == t_oracle["text"].tolist()
        c_oracle = apply_sidecar_oracle(txns)
        c_got = (
            mr2.read_state("tool_calls")
            .orderBy("conv_id", "turn_idx", "call_ord")
            .toPandas()
        )
        assert c_got["tool_name"].tolist() == c_oracle["tool_name"].tolist()
        # nothing left to replay
        assert all(r.events == 0 for r in mr2.replay().values())

    def test_validation(self, spark, tmp_path):
        with pytest.raises(ValueError, match="at least one"):
            MultiReplayer(spark, str(tmp_path), str(tmp_path / "s"), specs=[])
        with pytest.raises(ValueError, match="per-table"):
            MultiReplayer(
                spark, str(tmp_path), str(tmp_path / "s"),
                specs=[TRANSCRIPTS], target=object(),
            )
        mr = MultiReplayer(
            spark, str(tmp_path), str(tmp_path / "s2"), specs=[TRANSCRIPTS]
        )
        with pytest.raises(KeyError):
            mr["nope"]


class TestSidecarFixtureGuards:
    def test_incompatible_modes_raise(self, tmp_path):
        txns = generate_changelog(n_conversations=2, n_extra_ops=4, seed=1)
        with pytest.raises(ValueError, match="full row image"):
            write_binlog_files(
                txns, str(tmp_path / "a"), sidecar=True, row_image="minimal"
            )
        with pytest.raises(ValueError, match="mysql provider"):
            write_binlog_files(
                txns, str(tmp_path / "b"), sidecar=True, provider="mariadb"
            )
        with pytest.raises(ValueError, match="not composable"):
            write_binlog_files(
                txns, str(tmp_path / "c"), sidecar=True, partitions=4
            )
