"""DDL-driven schema evolution (binlog/ddl.py).

The server default ``binlog_row_metadata=MINIMAL`` omits column names
from TABLE_MAP, so the only in-stream record of an added column's name
is the ALTER TABLE QUERY event — the reference surfaces these as
QueryEvent (query_event.rs) and leaves schema tracking to user code.
These tests pin the parser, the segment DDL scan, and the end-to-end
replay of a MINIMAL-metadata stream whose evolution is discovered from
DDL alone (final state equals the sequential oracle).
"""

import pandas as pd
import pytest

from mysql_cdc_spark.binlog.ddl import (
    AlterTable,
    UnsupportedDdl,
    discover_spec,
    evolve_spec,
    map_mysql_type,
    parse_alter,
    scan_ddl,
    spec_from_create_table,
)
from mysql_cdc_spark.binlog.decoder import TRANSCRIPTS
from mysql_cdc_spark.fixtures import (
    EVOLUTION_DDL,
    apply_changelog_oracle,
    generate_changelog,
    transcripts_pre_spec,
    write_binlog_files,
)
from mysql_cdc_spark.pipeline.replay import Replayer


# ------------------------------------------------------------- parser

def test_parse_simple_add():
    a = parse_alter("ALTER TABLE chat.transcripts ADD COLUMN tool VARCHAR(64) NULL")
    assert a.database == "chat" and a.table == "transcripts"
    assert [(c.name, c.spark_ddl, c.kind) for c in a.adds] == [
        ("tool", "string", "str")
    ]
    assert a.unsupported == ()


def test_parse_backquoted_with_attrs():
    a = parse_alter(
        "ALTER TABLE `chat`.`transcripts` ADD `tool` varchar(64) "
        "DEFAULT NULL COMMENT 'added' AFTER `text`;"
    )
    assert a.adds[0].name == "tool"
    assert a.adds[0].kind == "str"


def test_parse_multiple_adds_and_if_not_exists():
    a = parse_alter(
        "alter table transcripts add column if not exists tool TEXT, "
        "add column score DOUBLE NOT NULL DEFAULT 0.5"
    )
    assert [(c.name, c.kind) for c in a.adds] == [("tool", "str"), ("score", "double")]


def test_parse_grouped_form():
    a = parse_alter("ALTER TABLE t ADD COLUMN (a INT, b DECIMAL(12,4), c JSON)")
    assert [(c.name, c.spark_ddl, c.kind) for c in a.adds] == [
        ("a", "bigint", "int"),
        ("b", "decimal(12,4)", "decimal"),
        ("c", "string", "json"),
    ]


def test_parse_neutral_clauses_skipped():
    a = parse_alter(
        "ALTER TABLE t ADD INDEX idx_x (conv_id), ADD COLUMN d DATETIME(6), "
        "ENGINE=InnoDB, ADD CONSTRAINT fk FOREIGN KEY (x) REFERENCES o(y)"
    )
    assert [(c.name, c.kind) for c in a.adds] == [("d", "datetime")]
    assert a.unsupported == ()


def test_parse_records_unsupported():
    a = parse_alter("ALTER TABLE t DROP COLUMN role, ADD COLUMN x INT")
    assert a.unsupported == ("DROP",)
    assert [c.name for c in a.adds] == ["x"]


def test_parse_non_alter_returns_none():
    for sql in ["BEGIN", "CREATE TABLE t (x INT)", "INSERT INTO t VALUES (1)"]:
        assert parse_alter(sql) is None


@pytest.mark.parametrize(
    "type_text,expected",
    [
        ("INT", ("bigint", "int")),
        ("bigint unsigned", ("bigint", "int")),
        ("VARCHAR(255)", ("string", "str")),
        ("LONGTEXT", ("string", "str")),
        ("JSON", ("string", "json")),
        ("DECIMAL(18,6)", ("decimal(18,6)", "decimal")),
        ("NUMERIC(9)", ("decimal(9,0)", "decimal")),
        ("DOUBLE", ("double", "double")),
        ("FLOAT(10,2)", ("double", "double")),
        ("DATETIME(6)", ("timestamp_ntz", "datetime")),
        ("TIMESTAMP", ("timestamp", "ts_millis")),
        ("DATE", ("date", "date")),
        ("TIME(3)", ("string", "time")),
        ("MEDIUMBLOB", ("binary", "binary")),
        ("VARBINARY(128)", ("binary", "binary")),
    ],
)
def test_type_map(type_text, expected):
    assert map_mysql_type(type_text) == expected


def test_type_map_enum_raises():
    with pytest.raises(UnsupportedDdl):
        map_mysql_type("ENUM('a','b')")


# --------------------------------------------------------- evolve_spec

def test_evolve_appends_in_statement_order():
    pre = transcripts_pre_spec()
    ev = evolve_spec(pre, [parse_alter(EVOLUTION_DDL)])
    assert [c[0] for c in ev.columns] == [
        "conv_id", "turn_idx", "role", "text", "ts", "tool",
    ]
    assert ev.primary_key == pre.primary_key


def test_evolve_idempotent_and_ignores_other_tables():
    pre = transcripts_pre_spec()
    ev = evolve_spec(pre, [parse_alter(EVOLUTION_DDL), parse_alter(EVOLUTION_DDL)])
    assert len(ev.columns) == 6  # redelivered DDL adds once
    same = evolve_spec(pre, [parse_alter("ALTER TABLE other ADD COLUMN x INT")])
    assert same is pre
    # existing column on the canonical spec: no-op, not a duplicate
    assert evolve_spec(TRANSCRIPTS, [parse_alter(EVOLUTION_DDL)]) is TRANSCRIPTS


def test_evolve_raises_on_non_additive_for_tracked_table():
    pre = transcripts_pre_spec()
    with pytest.raises(UnsupportedDdl, match="non-additive"):
        evolve_spec(pre, [parse_alter("ALTER TABLE transcripts DROP COLUMN role")])
    # same clause on another table is ignored
    assert (
        evolve_spec(pre, [parse_alter("ALTER TABLE other DROP COLUMN role")]) is pre
    )


def test_evolve_wrong_database_ignored():
    pre = transcripts_pre_spec()
    a = parse_alter("ALTER TABLE otherdb.transcripts ADD COLUMN x INT")
    assert evolve_spec(pre, [a]) is pre


def test_parse_extracts_placement():
    a = parse_alter("ALTER TABLE transcripts ADD COLUMN x INT FIRST")
    assert a.adds[0].first and a.adds[0].after is None
    a2 = parse_alter(
        "ALTER TABLE t ADD `x` INT DEFAULT 0 AFTER `text`"
    )
    assert a2.adds[0].after == "text" and not a2.adds[0].first


def test_evolve_raises_on_mid_table_placement():
    """FIRST/AFTER inserts mid-table; positional (MINIMAL) decode maps
    nameless TABLE_MAPs as a canonical-order prefix, so a mid-table
    insertion would silently mis-decode pre-ALTER rows — must refuse."""
    pre = transcripts_pre_spec()
    with pytest.raises(UnsupportedDdl, match="FIRST/AFTER"):
        evolve_spec(
            pre,
            [parse_alter("ALTER TABLE chat.transcripts ADD COLUMN x INT FIRST")],
        )
    with pytest.raises(UnsupportedDdl, match="FIRST/AFTER"):
        evolve_spec(
            pre,
            [parse_alter(
                "ALTER TABLE chat.transcripts ADD COLUMN x INT AFTER role"
            )],
        )


def test_evolve_after_last_column_is_append():
    pre = transcripts_pre_spec()
    ev = evolve_spec(
        pre,
        [parse_alter(
            "ALTER TABLE chat.transcripts ADD COLUMN tool VARCHAR(64) AFTER ts"
        )],
    )
    assert [c[0] for c in ev.columns] == [
        "conv_id", "turn_idx", "role", "text", "ts", "tool",
    ]


def test_evolve_nonexistent_after_column_raises():
    pre = transcripts_pre_spec()
    with pytest.raises(UnsupportedDdl, match="no such column"):
        evolve_spec(
            pre,
            [parse_alter(
                "ALTER TABLE chat.transcripts ADD COLUMN x INT AFTER ghost"
            )],
        )


# ------------------------------------------------ widening MODIFY/CHANGE

def _dec_spec():
    from mysql_cdc_spark.binlog.decoder import TableSpec

    return TableSpec(
        database="chat", table="transcripts",
        columns=(
            ("conv_id", "string", "str"),
            ("turn_idx", "int", "int"),
            ("amount", "decimal(10,2)", "decimal"),
        ),
        primary_key=("conv_id", "turn_idx"),
    )


def test_parse_modify_and_change_same_name():
    a = parse_alter(
        "ALTER TABLE transcripts MODIFY COLUMN turn_idx BIGINT NOT NULL, "
        "CHANGE COLUMN text text LONGTEXT"
    )
    assert not a.unsupported and not a.adds
    assert [(m.name, m.spark_ddl) for m in a.modifies] == [
        ("turn_idx", "bigint"), ("text", "string"),
    ]


def test_parse_change_rename_stays_unsupported():
    a = parse_alter("ALTER TABLE transcripts CHANGE COLUMN text body LONGTEXT")
    assert a.unsupported == ("CHANGE",) and not a.modifies


def test_evolve_widening_int_family():
    pre = transcripts_pre_spec()  # turn_idx is spec dtype 'int'
    ev = evolve_spec(
        pre, [parse_alter("ALTER TABLE chat.transcripts MODIFY turn_idx BIGINT")]
    )
    assert dict((c[0], c[1]) for c in ev.columns)["turn_idx"] == "bigint"
    assert [c[0] for c in ev.columns] == [c[0] for c in pre.columns]  # no move


def test_evolve_widening_string_and_decimal():
    pre = transcripts_pre_spec()  # text is already 'string'
    same = evolve_spec(
        pre,
        [parse_alter("ALTER TABLE chat.transcripts MODIFY text LONGTEXT")],
    )
    assert same is pre  # string-family growth is a dtype no-op
    ev = evolve_spec(
        _dec_spec(),
        [parse_alter("ALTER TABLE chat.transcripts MODIFY amount DECIMAL(14,2)")],
    )
    assert dict((c[0], c[1]) for c in ev.columns)["amount"] == "decimal(14,2)"


@pytest.mark.parametrize(
    "ddl",
    [
        "ALTER TABLE chat.transcripts MODIFY conv_id INT",         # kind change
        "ALTER TABLE chat.transcripts MODIFY amount DECIMAL(8,2)",  # narrowing
        "ALTER TABLE chat.transcripts MODIFY amount DECIMAL(14,4)", # scale change
    ],
)
def test_evolve_non_widening_modify_raises(ddl):
    with pytest.raises(UnsupportedDdl, match="not a widening"):
        evolve_spec(_dec_spec(), [parse_alter(ddl)])


def test_evolve_modify_placement_and_missing_column_raise():
    pre = transcripts_pre_spec()
    with pytest.raises(UnsupportedDdl, match="FIRST/AFTER"):
        evolve_spec(
            pre,
            [parse_alter(
                "ALTER TABLE chat.transcripts MODIFY turn_idx BIGINT AFTER text"
            )],
        )
    with pytest.raises(UnsupportedDdl, match="no such column"):
        evolve_spec(
            pre, [parse_alter("ALTER TABLE chat.transcripts MODIFY ghost BIGINT")]
        )


def test_evolve_modify_on_other_table_ignored():
    pre = transcripts_pre_spec()
    assert (
        evolve_spec(pre, [parse_alter("ALTER TABLE other MODIFY text INT")])
        is pre
    )


def test_unmappable_type_on_other_table_ignored():
    """An ALTER on an untracked table with a type the decode tier can't
    map must not crash discovery — errors are recorded, not raised."""
    pre = transcripts_pre_spec()
    a = parse_alter("ALTER TABLE other_table ADD COLUMN e ENUM('a','b')")
    assert a.errors and not a.adds
    assert evolve_spec(pre, [a]) is pre


def test_unmappable_type_on_tracked_table_raises():
    pre = transcripts_pre_spec()
    a = parse_alter("ALTER TABLE chat.transcripts ADD COLUMN e ENUM('a','b')")
    with pytest.raises(UnsupportedDdl, match="unmappable"):
        evolve_spec(pre, [a])


def test_evolve_warns_on_unqualified_statement_without_session_db():
    """database=None with a database-qualified spec is a name-only match:
    apply (MySQL DDL in a binlog nearly always concerns the tracked
    stream) but warn loudly instead of silently wildcarding."""
    pre = transcripts_pre_spec()
    with pytest.warns(UserWarning, match="no database qualifier"):
        ev = evolve_spec(
            pre,
            [parse_alter("ALTER TABLE transcripts ADD COLUMN tool VARCHAR(64)")],
        )
    assert [c[0] for c in ev.columns][-1] == "tool"


# ------------------------------------------------- spec_from_create_table

TRANSCRIPTS_CREATE = """
CREATE TABLE `chat`.`transcripts` (
  `conv_id` varchar(64) NOT NULL,
  `turn_idx` bigint NOT NULL,
  `role` varchar(16) NOT NULL,
  `text` varchar(2048) NOT NULL,
  `ts` timestamp(3) NOT NULL DEFAULT CURRENT_TIMESTAMP(3),
  PRIMARY KEY (`conv_id`, `turn_idx`),
  KEY `idx_ts` (`ts`)
) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4
"""


def test_spec_from_create_table():
    spec = spec_from_create_table(TRANSCRIPTS_CREATE)
    pre = transcripts_pre_spec()
    assert spec.database == "chat" and spec.table == "transcripts"
    assert spec.primary_key == ("conv_id", "turn_idx")
    assert [c[0] for c in spec.columns] == [c[0] for c in pre.columns]
    assert [c[2] for c in spec.columns] == [c[2] for c in pre.columns]


def test_spec_from_create_then_alter_matches_discovered():
    spec = spec_from_create_table(TRANSCRIPTS_CREATE)
    ev = evolve_spec(spec, [parse_alter(EVOLUTION_DDL)])
    assert [c[0] for c in ev.columns] == [
        "conv_id", "turn_idx", "role", "text", "ts", "tool",
    ]


def test_spec_from_create_inline_pk_and_default_db():
    spec = spec_from_create_table(
        "CREATE TABLE t (id BIGINT PRIMARY KEY, v JSON, d DECIMAL(20,4))",
        database="appdb",
    )
    assert spec.database == "appdb"
    assert spec.primary_key == ("id",)
    assert [c[2] for c in spec.columns] == ["int", "json", "decimal"]
    assert spec.columns[2][1] == "decimal(20,4)"


def test_spec_from_create_errors():
    with pytest.raises(UnsupportedDdl, match="PRIMARY KEY"):
        spec_from_create_table("CREATE TABLE a.t (x INT)")
    with pytest.raises(UnsupportedDdl, match="default database"):
        spec_from_create_table("CREATE TABLE t (x INT PRIMARY KEY)")
    with pytest.raises(UnsupportedDdl, match="not a CREATE TABLE"):
        spec_from_create_table("DROP TABLE t")


# ------------------------------------------------------------ scan_ddl

@pytest.fixture(scope="module")
def minimal_stream(tmp_path_factory):
    txns = generate_changelog(
        n_conversations=40,
        max_turns=8,
        n_extra_ops=150,
        seed=7,
        hot_conversations=3,
        hot_share=0.5,
        evolve_after_frac=0.5,
        duplicate_txns=6,
    )
    outdir = str(tmp_path_factory.mktemp("binlog_min"))
    paths = write_binlog_files(
        txns, outdir, txns_per_file=40, row_metadata="minimal"
    )
    oracle = apply_changelog_oracle(txns)
    return txns, outdir, paths, oracle


def test_scan_ddl_finds_the_alter_once(minimal_stream):
    import os

    _, outdir, paths, _ = minimal_stream
    found = []
    for p in paths:
        with open(os.path.join(outdir, os.path.basename(p)), "rb") as f:
            found.extend(scan_ddl(f.read()))
    assert len(found) == 1
    assert found[0]["sql"] == EVOLUTION_DDL
    assert found[0]["database"] == "chat"


def test_minimal_metadata_table_maps_carry_no_names(minimal_stream):
    import os

    from mysql_cdc_spark.binlog.decoder import scan_table_maps

    _, outdir, paths, _ = minimal_stream
    with open(os.path.join(outdir, os.path.basename(paths[0])), "rb") as f:
        tms = scan_table_maps(f.read())
    assert tms and all(not tm["column_names"] for tm in tms)


def test_discover_spec_from_ddl(spark, minimal_stream):
    _, outdir, _, _ = minimal_stream
    spec = discover_spec(spark, outdir, transcripts_pre_spec())
    assert [c[0] for c in spec.columns] == [
        "conv_id", "turn_idx", "role", "text", "ts", "tool",
    ]


# ----------------------------------------------------------------- e2e

def test_minimal_metadata_replay_equals_oracle(spark, minimal_stream, tmp_path):
    """Full replay of a binlog_row_metadata=MINIMAL stream: no TABLE_MAP
    names anywhere; schema evolution discovered purely from the ALTER
    TABLE QUERY event; positional column mapping against the physical-
    order spec on both decode paths. Final state must equal the
    sequential oracle per-turn."""
    _, outdir, _, oracle = minimal_stream
    rep = Replayer(
        spark, outdir, str(tmp_path / "store"),
        spec=transcripts_pre_spec(), discover_ddl=True,
    )
    res = rep.replay(files_per_batch=3)
    assert res.events > 0
    state = (
        rep.read_state()
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(state) == len(oracle)
    for col in ["conv_id", "turn_idx", "role", "text", "tool"]:
        assert state[col].tolist() == oracle[col].tolist(), f"column {col}"
    assert (
        pd.to_datetime(state["ts"]).tolist() == pd.to_datetime(oracle["ts"]).tolist()
    )


def test_minimal_metadata_widening_replay(spark, tmp_path):
    """A mid-stream widening MODIFY (INT -> BIGINT on the key column):
    the server rewrites the table, so TABLE_MAPs after the ALTER carry
    LONGLONG while earlier ones carry LONG — the decode must follow each
    event's own metadata, the registry must fold the retype into the
    spec (turn_idx -> bigint), and the final state must still equal the
    sequential oracle per-turn under the widened schema."""
    txns = generate_changelog(
        n_conversations=16, max_turns=5, n_extra_ops=60, seed=23,
        evolve_after_frac=0.4, duplicate_txns=3,
    )
    widen_at = max(t.seq for t in txns) * 2 // 3
    outdir = str(tmp_path / "binlog")
    write_binlog_files(
        txns, outdir, txns_per_file=25, row_metadata="minimal",
        widen_after_seq=widen_at,
    )
    rep = Replayer(
        spark, outdir, str(tmp_path / "store"),
        spec=transcripts_pre_spec(), discover_ddl=True,
    )
    assert dict((c[0], c[1]) for c in rep.spec.columns)["turn_idx"] == "bigint"
    rep.replay(files_per_batch=2)
    state = (
        rep.read_state().orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )
    oracle = apply_changelog_oracle(txns)
    assert len(state) == len(oracle) > 0
    for col in ["conv_id", "turn_idx", "role", "text", "tool"]:
        assert state[col].tolist() == oracle[col].tolist(), f"column {col}"
    import pyspark.sql.types as T

    assert isinstance(
        rep.read_state().schema["turn_idx"].dataType, T.LongType
    )


def test_multi_table_ddl_isolation(spark, tmp_path):
    """One MINIMAL-metadata stream carrying TWO tables, each evolved by
    its own ALTER: per-table DDL discovery must apply each statement to
    its own spec only (chat.transcripts gains ``tool``, metrics.samples
    gains ``note`` — and neither leaks into the other)."""
    import os

    from mysql_cdc_spark.binlog.constants import ColumnType, EventType
    from mysql_cdc_spark.binlog.decoder import TableSpec
    from mysql_cdc_spark.binlog.encoder import BinlogWriter
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
    uuid = "24bc7850-2c16-11e6-a073-0242ac110033"
    w = BinlogWriter("mix.000001")
    seq = 0

    def txn(db, table_id, table, ctypes, cmeta, nullab, rows):
        nonlocal seq
        seq += 1
        w.write_mysql_gtid(uuid, seq)
        w.write_query("BEGIN", database=db)
        w.write_table_map(
            table_id, db, table, ctypes, cmeta, nullab, column_names=None
        )
        w.write_rows(table_id, ctypes, cmeta, rows)
        w.write_xid(seq)

    T5 = [ColumnType.VARCHAR, ColumnType.LONG, ColumnType.VARCHAR,
          ColumnType.VARCHAR, ColumnType.TIMESTAMP2]
    T5M = [64, 0, 16, 2048, 3]
    M3 = [ColumnType.VARCHAR, ColumnType.LONG, ColumnType.DOUBLE]
    M3M = [64, 0, 8]

    txn("chat", 100, "transcripts", T5, T5M, [False] * 5,
        [["c-1", 0, "user", "hello", 1700000000000]])
    txn("metrics", 500, "samples", M3, M3M, [False, False, True],
        [["s-1", 0, 1.5]])
    w.write_query(EVOLUTION_DDL, database="chat")  # adds tool to transcripts
    txn("chat", 101, "transcripts", T5 + [ColumnType.VARCHAR], T5M + [64],
        [False] * 5 + [True],
        [["c-1", 1, "assistant", "hi", 1700000001000, "search"]])
    w.write_query(
        "ALTER TABLE metrics.samples ADD COLUMN note VARCHAR(32) NULL"
    )
    txn("metrics", 501, "samples", M3 + [ColumnType.VARCHAR], M3M + [32],
        [False, False, True, True],
        [["s-1", 1, 2.5, "calibrated"]])
    outdir = str(tmp_path / "binlog")
    os.makedirs(outdir)
    w.save(os.path.join(outdir, "mix.000001"))

    multi = MultiReplayer(
        spark, outdir, str(tmp_path / "stores"),
        specs=[transcripts_pre_spec(), METRICS], discover_ddl=True,
    )
    multi.replay()
    t_spec = multi.replayers["chat.transcripts"].spec
    m_spec = multi.replayers["metrics.samples"].spec
    assert [c[0] for c in t_spec.columns] == [
        "conv_id", "turn_idx", "role", "text", "ts", "tool",
    ]
    assert [c[0] for c in m_spec.columns] == ["sample_id", "k", "value", "note"]

    t_state = {
        (r["conv_id"], r["turn_idx"]): r["tool"]
        for r in multi.read_state("chat.transcripts").collect()
    }
    assert t_state == {("c-1", 0): None, ("c-1", 1): "search"}
    m_state = {
        (r["sample_id"], r["k"]): (r["value"], r["note"])
        for r in multi.read_state("metrics.samples").collect()
    }
    assert m_state == {("s-1", 0): (1.5, None), ("s-1", 1): (2.5, "calibrated")}


def test_minimal_metadata_resume(spark, minimal_stream, tmp_path):
    """Kill/resume on the MINIMAL stream: first batch with one Replayer,
    fresh Replayer (re-discovering the spec from DDL) finishes; same
    final state."""
    _, outdir, _, oracle = minimal_stream
    store = str(tmp_path / "store")
    first = Replayer(
        spark, outdir, store, spec=transcripts_pre_spec(), discover_ddl=True
    )
    pend = first.pending_files()
    first.run_batch(pend[:2])
    second = Replayer(
        spark, outdir, store, spec=transcripts_pre_spec(), discover_ddl=True
    )
    second.replay(files_per_batch=4)
    state = (
        second.read_state()
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    assert state["text"].tolist() == oracle["text"].tolist()
    assert state["tool"].tolist() == oracle["tool"].tolist()


class TestColumnDefaults:
    """ADD COLUMN ... DEFAULT: instant-ADD-COLUMN backfill semantics —
    pre-ALTER events decode the added column as the literal default."""

    def test_parse_literal_defaults(self):
        a = parse_alter(
            "ALTER TABLE chat.transcripts ADD COLUMN tool VARCHAR(64) "
            "NULL DEFAULT 'none'"
        )
        assert a.adds[0].default == "'none'"
        assert not a.adds[0].default_is_expr
        b = parse_alter(
            "ALTER TABLE chat.transcripts ADD COLUMN score INT DEFAULT -3"
        )
        assert b.adds[0].default == "-3"
        c = parse_alter(
            "ALTER TABLE chat.transcripts ADD COLUMN note TEXT DEFAULT NULL"
        )
        assert c.adds[0].default is None

    def test_expression_default_unsupported_on_tracked_table(self):
        from mysql_cdc_spark.binlog.ddl import UnsupportedDdl, evolve_spec

        a = parse_alter(
            "ALTER TABLE chat.transcripts ADD COLUMN created TIMESTAMP "
            "DEFAULT CURRENT_TIMESTAMP"
        )
        assert a.adds[0].default_is_expr
        with pytest.raises(UnsupportedDdl, match="expression defaults"):
            evolve_spec(transcripts_pre_spec(), [a])
        # same statement on an untracked table is ignored
        b = parse_alter(
            "ALTER TABLE other.t ADD COLUMN created TIMESTAMP "
            "DEFAULT CURRENT_TIMESTAMP"
        )
        spec = evolve_spec(transcripts_pre_spec(), [b])
        assert spec == transcripts_pre_spec()

    def test_evolve_spec_threads_defaults(self):
        from mysql_cdc_spark.binlog.ddl import evolve_spec

        a = parse_alter(
            "ALTER TABLE chat.transcripts ADD COLUMN tool VARCHAR(64) "
            "DEFAULT 'none'"
        )
        spec = evolve_spec(transcripts_pre_spec(), [a])
        assert spec.defaults == (("tool", "'none'"),)

    def test_replay_applies_default_to_pre_alter_rows(self, spark, tmp_path):
        """Full MINIMAL-metadata replay with a DEFAULT on the evolution
        column: keys whose winning write predates the ALTER read 'none';
        post-ALTER writes keep their values including explicit NULLs."""
        txns = generate_changelog(
            n_conversations=12, max_turns=4, n_extra_ops=40, seed=29,
            evolve_after_frac=0.5, duplicate_txns=2,
        )
        outdir = str(tmp_path / "binlog")
        write_binlog_files(
            txns, outdir, txns_per_file=20, row_metadata="minimal",
            evolution_ddl=(
                "ALTER TABLE `chat`.`transcripts` ADD COLUMN `tool` "
                "VARCHAR(64) NULL DEFAULT 'none'"
            ),
        )
        rep = Replayer(
            spark, outdir, str(tmp_path / "store"),
            spec=transcripts_pre_spec(), discover_ddl=True,
        )
        rep.replay(files_per_batch=2)
        state = (
            rep.read_state()
            .orderBy("conv_id", "turn_idx")
            .toPandas()
            .reset_index(drop=True)
        )
        # expected: the sequential oracle with the default applied to
        # winning pre-evolution rows (dual-written evolved flag)
        from mysql_cdc_spark.fixtures import changelog_to_pandas

        ops = changelog_to_pandas(txns)
        first = ops.groupby("seq")["txn_ord"].min().rename("first_ord")
        ops = ops.join(first, on="seq")
        ops = ops[ops["txn_ord"] == ops["first_ord"]]
        ops = ops.sort_values(["seq", "op_ord"])
        final = {}
        for _, r in ops.iterrows():
            k = (r["conv_id"], r["turn_idx"])
            if r["kind"] == "delete":
                final.pop(k, None)
            else:
                tool = r["tool"]
                if not r["evolved"] and tool is None:
                    tool = "none"
                final[k] = tool
        got = {
            (r["conv_id"], r["turn_idx"]): r["tool"]
            for _, r in state.iterrows()
        }
        want = {k: v for k, v in final.items()}
        assert got == want
        assert sum(1 for v in got.values() if v == "none") > 0

    def test_invisible_column_attribute_accepted(self):
        """MySQL 8.0.23 invisible columns ARE in row images — the
        attribute must parse through, not fail the clause."""
        a = parse_alter(
            "ALTER TABLE chat.transcripts ADD COLUMN tag VARCHAR(32) "
            "INVISIBLE DEFAULT 'x'"
        )
        assert a.adds[0].name == "tag"
        assert a.adds[0].default == "'x'"
        assert not a.errors and not a.unsupported

    def test_default_applies_under_minimal_row_image(self, spark, tmp_path):
        """MINIMAL row images + MINIMAL metadata + DEFAULT: pre-ALTER
        inserts take the default (and its carried bit), so the per-column
        LWW falls back to the defaulted insert for updates that don't
        touch the column."""
        txns = generate_changelog(
            n_conversations=10, max_turns=4, n_extra_ops=30, seed=31,
            evolve_after_frac=0.5,
        )
        outdir = str(tmp_path / "binlog")
        write_binlog_files(
            txns, outdir, txns_per_file=20, row_metadata="minimal",
            row_image="minimal",
            evolution_ddl=(
                "ALTER TABLE `chat`.`transcripts` ADD COLUMN `tool` "
                "VARCHAR(64) NULL DEFAULT 'none'"
            ),
        )
        rep = Replayer(
            spark, outdir, str(tmp_path / "store"),
            spec=transcripts_pre_spec(), discover_ddl=True,
            row_image="minimal",
        )
        rep.replay(files_per_batch=2)
        state = rep.read_state().toPandas()
        from mysql_cdc_spark.fixtures import changelog_to_pandas

        ops = changelog_to_pandas(txns)
        ops = ops.sort_values(["seq", "op_ord"])
        final = {}
        for _, r in ops.iterrows():
            k = (r["conv_id"], r["turn_idx"])
            if r["kind"] == "delete":
                final.pop(k, None)
            else:
                tool = r["tool"]
                if not r["evolved"] and tool is None:
                    tool = "none"
                final[k] = tool
        got = {
            (r["conv_id"], r["turn_idx"]): r["tool"]
            for _, r in state.iterrows()
        }
        assert got == final
        assert "none" in got.values()


# --------------------------------------- round-5 attribute hardening

def test_parse_parenthesized_expression_default():
    """MySQL 8 DEFAULT (expr): must be recognized as an expression
    default (not silently dropped), and trailing placement attrs after
    it must survive — a dropped AFTER would bypass the mid-table guard
    and silently mis-position positional MINIMAL-metadata decode."""
    a = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN x varchar(10) "
        "DEFAULT (uuid()) AFTER role"
    )
    (add,) = a.adds
    assert add.default_is_expr and add.default == "(uuid())"
    assert add.after == "role"
    with pytest.raises(UnsupportedDdl, match="expression defaults"):
        evolve_spec(TRANSCRIPTS, [a])


def test_parse_nested_parenthesized_default():
    a = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN y varchar(20) "
        "DEFAULT (concat('a', 'b')) NULL"
    )
    (add,) = a.adds
    assert add.default_is_expr and add.default == "(concat('a', 'b'))"


def test_unrecognized_attribute_is_loud_not_silent():
    """An attribute _ATTR can't consume must be recorded as an error —
    breaking out silently would drop everything after it (incl. a
    trailing FIRST/AFTER). Generated columns are the real-world case:
    their value is computed server-side, so evolution cannot apply
    them; they must refuse, not silently append a NULL column."""
    a = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN y INT "
        "GENERATED ALWAYS AS (turn_idx + 1) STORED AFTER role"
    )
    assert a.adds == ()
    assert any("GENERATED" in e for e in a.errors)
    with pytest.raises(UnsupportedDdl):
        evolve_spec(TRANSCRIPTS, [a])


def test_not_null_without_default_threads_implicit_default():
    """MySQL backfills NOT-NULL-without-DEFAULT adds with the type's
    implicit default ('' / 0) — pre-ALTER events must decode that, not
    NULL."""
    a = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN score INT NOT NULL"
    )
    assert a.adds[0].not_null and a.adds[0].default is None
    s = evolve_spec(TRANSCRIPTS, [a])
    assert ("score", "0") in s.defaults
    b = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN tag VARCHAR(8) NOT NULL"
    )
    s2 = evolve_spec(TRANSCRIPTS, [b])
    assert ("tag", "''") in s2.defaults


def test_not_null_explicit_default_wins_over_implicit():
    a = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN n INT NOT NULL DEFAULT 7"
    )
    s = evolve_spec(TRANSCRIPTS, [a])
    assert ("n", "7") in s.defaults


def test_not_null_temporal_without_default_refused():
    """Temporal kinds have no lake-representable implicit default
    (zero-date) — refuse loudly instead of silently diverging."""
    a = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN seen DATETIME NOT NULL"
    )
    with pytest.raises(UnsupportedDdl, match="implicit default"):
        evolve_spec(TRANSCRIPTS, [a])


# ----------------------------------------- grouped-statement policy

def test_grouped_alter_neutral_clauses_apply_adds():
    """ADD COLUMN mixed with schema-neutral clauses (indexes) applies:
    an index never changes row decode."""
    a = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN a INT, ADD INDEX idx(b)"
    )
    assert [c.name for c in a.adds] == ["a"] and a.unsupported == ()
    s = evolve_spec(TRANSCRIPTS, [a])
    assert s.columns[-1][0] == "a"


def test_grouped_alter_non_additive_rejects_atomically():
    """ADD COLUMN mixed with a non-additive clause rejects the WHOLE
    statement — MySQL runs the ALTER atomically, so applying half of it
    would track a schema the server never had."""
    a = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN a INT, DROP COLUMN role"
    )
    assert [c.name for c in a.adds] == ["a"]
    assert "DROP" in a.unsupported
    before = TRANSCRIPTS
    with pytest.raises(UnsupportedDdl, match="non-additive"):
        evolve_spec(before, [a])
    # and nothing was applied (frozen spec unchanged by the failed call)
    assert [c[0] for c in before.columns] == [
        c[0] for c in TRANSCRIPTS.columns
    ]


def test_decode_neutral_attributes_consumed():
    """SRID / COLUMN_FORMAT / STORAGE / CHECK are legal MySQL column
    attributes that never change row decode — they must be consumed
    (not refused), and trailing placement after them must survive."""
    a = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN n INT COLUMN_FORMAT DYNAMIC "
        "STORAGE DISK CHECK (n > 0) NOT ENFORCED AFTER role"
    )
    (add,) = a.adds
    assert add.name == "n" and add.after == "role" and not a.errors
    b = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN g GEOMETRY SRID 4326 NOT NULL"
    )
    (gadd,) = b.adds
    assert gadd.name == "g" and gadd.not_null and not b.errors
    c = parse_alter(
        "ALTER TABLE chat.transcripts ADD COLUMN m INT "
        "CONSTRAINT chk_m CHECK (m IN (1, 2) AND m <> (3)) DEFAULT 1"
    )
    (cadd,) = c.adds
    assert cadd.default == "1" and not c.errors
