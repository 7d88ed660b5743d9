"""Deterministic transcript-changelog fixtures (SURVEY.md §7 step 1).

Generates, from a seed and scale knobs, a synthetic multi-turn conversation
transcript changelog with the reference's transaction grammar
(``/root/reference/README.md:69-75``)::

    GTID → QUERY(BEGIN) → TABLE_MAP → (WRITE|UPDATE|DELETE)_ROWS → XID

and encodes it into **real binlog-format byte files** (via binlog/encoder.py)
so the engine's input is the same wire format the reference decodes.

Knobs: conversation/turn counts, update/delete ratios, hot-key skew share
(a few conversations carry a disproportionate share of events — the
north_rule's skew case), duplicate-transaction injection (dedup tests),
mid-stream ``tool`` column addition (additive schema evolution via
TABLE_MAP column_names, table_metadata.rs:23), and events-per-file
(file rotation → decode parallelism).

Also provides the single-threaded pandas oracle ``apply_changelog_oracle``
that applies the same ops sequentially — exactly like the reference's
consume loop — to produce the expected final table state.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timezone

import pandas as pd

from .binlog.constants import ColumnType, EventType
from .binlog.encoder import BinlogWriter

SOURCE_UUID = "24bc7850-2c16-11e6-a073-0242ac110001"
BASE_TS = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp())

# transcript schema pre/post evolution (BASELINE.json input_hint)
PRE_COLUMNS = ["conv_id", "turn_idx", "role", "text", "ts"]
POST_COLUMNS = ["conv_id", "turn_idx", "role", "text", "ts", "tool"]
COLUMN_TYPES = {
    "conv_id": (ColumnType.VARCHAR, 64),
    "turn_idx": (ColumnType.LONG, 0),
    "role": (ColumnType.VARCHAR, 16),
    "text": (ColumnType.VARCHAR, 2048),  # metadata ≥ 256 → 2-byte length prefix
    "ts": (ColumnType.TIMESTAMP2, 3),  # fsp=3 → millisecond precision
    "tool": (ColumnType.VARCHAR, 64),
}
ROLES = ["user", "assistant", "system", "tool"]

def transcripts_pre_spec():
    """Physical-order base TableSpec for the PRE-evolution transcript
    table: column order matches the binlog's TABLE_MAP order (ts 5th),
    which is what positional mapping needs when TABLE_MAP carries no
    column names (binlog_row_metadata=MINIMAL). Evolution then appends
    ``tool`` at the end, exactly as MySQL does physically — contrast
    with the canonical TRANSCRIPTS spec, whose name-keyed order has
    ``tool`` before ``ts`` and therefore requires named metadata."""
    from .binlog.decoder import TableSpec

    return TableSpec(
        database="chat",
        table="transcripts",
        columns=(
            ("conv_id", "string", "str"),
            ("turn_idx", "int", "int"),
            ("role", "string", "str"),
            ("text", "string", "str"),
            ("ts", "timestamp", "ts_millis"),
        ),
        primary_key=("conv_id", "turn_idx"),
    )


# the DDL statement a server writes for the fixture's evolution step
# (row_metadata="minimal" streams carry no TABLE_MAP names, so this
# QUERY event is the only in-stream record of the new column's name)
EVOLUTION_DDL = "ALTER TABLE `chat`.`transcripts` ADD COLUMN `tool` VARCHAR(64) NULL"
# widening retype (INT -> BIGINT): the server rewrites the table at ALTER
# time, so TABLE_MAPs logged after it carry LONGLONG for the column
WIDEN_DDL = "ALTER TABLE `chat`.`transcripts` MODIFY COLUMN `turn_idx` BIGINT NOT NULL"


TOOLS = [None, "search", "python", "browser", "calculator"]

TABLE_ID_PRE = 100
TABLE_ID_POST = 101  # ALTER TABLE assigns a fresh table id
TABLE_ID_SIDECAR = 102  # second tracked table (chat.tool_calls)

# -- sidecar table: a second table committed inside the SAME transactions
# (one GTID, multiple TABLE_MAP+rows pairs — how a real server logs a
# multi-table transaction). Used to pin (a) that a single-spec decode
# skips foreign tables' events and (b) multi-table replay (MultiReplayer).
SIDECAR_COLUMNS = ["conv_id", "turn_idx", "call_ord", "tool_name", "duration_ms"]
_SIDECAR_CTYPES = [
    ColumnType.VARCHAR, ColumnType.LONG, ColumnType.LONG,
    ColumnType.VARCHAR, ColumnType.LONG,
]
_SIDECAR_CMETA = [64 * 4, 0, 0, 64 * 4, 0]


def tool_calls_spec():
    """TableSpec for the sidecar ``chat.tool_calls`` table: one row per
    tool invocation an assistant turn made, PK (conv_id, turn_idx,
    call_ord)."""
    from .binlog.decoder import TableSpec

    return TableSpec(
        database="chat",
        table="tool_calls",
        columns=(
            ("conv_id", "string", "str"),
            ("turn_idx", "int", "int"),
            ("call_ord", "int", "int"),
            ("tool_name", "string", "str"),
            ("duration_ms", "int", "int"),
        ),
        primary_key=("conv_id", "turn_idx", "call_ord"),
    )


def _sidecar_tool(turn: int, seq: int) -> str:
    return TOOLS[1 + (turn * 7 + seq) % (len(TOOLS) - 1)]


def _sidecar_dur(seq: int, turn: int) -> int:
    return (seq * 131 + turn * 17) % 5000


def sidecar_ops(txn: Txn) -> list[Op]:
    """Deterministic derivation of the sidecar table's ops from a
    transcript transaction — shared by the binlog encoder and the
    oracles, so wire bytes and logical changelog agree by construction.
    Every assistant-turn insert/update/delete in the transaction carries
    a matching tool_calls op (full row images; before-image VALUES for
    update/delete are placeholders — replay consumes only the after
    image and the delete key, like any rows event)."""
    ops: list[Op] = []
    for op in txn.ops:
        if op.kind == "truncate":
            # TRUNCATE TABLE transcripts fences only the transcripts
            # table — the sidecar table is untouched by it
            continue
        img = op.after if op.kind != "delete" else op.before
        if img[2] != "assistant":
            continue
        conv, turn = img[0], img[1]
        row = [conv, turn, 0, _sidecar_tool(turn, txn.seq),
               _sidecar_dur(txn.seq, turn)]
        if op.kind == "insert":
            ops.append(Op("insert", None, row))
        elif op.kind == "update":
            ops.append(Op("update", [conv, turn, 0, row[3], 0], row))
        else:
            ops.append(Op("delete", [conv, turn, 0, row[3], 0], None))
    return ops


def apply_sidecar_oracle(txns: list[Txn]) -> pd.DataFrame:
    """Sequential apply of the sidecar changelog (same at-most-once per
    GTID rule as apply_changelog_oracle)."""
    state: dict[tuple, list] = {}
    applied: set[int] = set()
    for txn in txns:
        if txn.seq in applied:
            continue
        applied.add(txn.seq)
        for op in sidecar_ops(txn):
            if op.kind in ("insert", "update"):
                state[tuple(op.after[:3])] = op.after
            else:
                state.pop(tuple(op.before[:3]), None)
    records = [
        {
            "conv_id": k[0], "turn_idx": k[1], "call_ord": k[2],
            "tool_name": row[3], "duration_ms": row[4],
        }
        for k, row in sorted(state.items())
    ]
    return pd.DataFrame(
        records, columns=SIDECAR_COLUMNS
    )


def sidecar_changelog_to_pandas(txns: list[Txn]) -> pd.DataFrame:
    """Logical sidecar change rows (the tool_calls dual-write, same
    replay-order tuple semantics as changelog_to_pandas)."""
    rows = []
    for txn_ord, txn in enumerate(txns):
        for op_ord, op in enumerate(sidecar_ops(txn)):
            src = op.after if op.kind != "delete" else op.before
            is_del = op.kind == "delete"
            rows.append(
                {
                    "txn_ord": txn_ord,
                    "seq": txn.seq,
                    "op_ord": op_ord,
                    "kind": op.kind,
                    "conv_id": src[0],
                    "turn_idx": src[1],
                    "call_ord": src[2],
                    "tool_name": None if is_del else src[3],
                    "duration_ms": None if is_del else src[4],
                }
            )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "txn_ord", "seq", "op_ord", "kind",
            "conv_id", "turn_idx", "call_ord", "tool_name", "duration_ms",
        ],
    )
    pdf["duration_ms"] = pdf["duration_ms"].astype("Int64")
    return pdf


def write_sidecar_changelog_parquet(txns: list[Txn], path: str) -> str:
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(sidecar_changelog_to_pandas(txns)), tmp)
    os.replace(tmp, path)
    return path


@dataclass
class Op:
    kind: str  # 'insert' | 'update' | 'delete'
    before: list | None
    after: list | None


@dataclass
class Txn:
    seq: int
    ops: list[Op] = field(default_factory=list)
    evolved: bool = False  # rows carry the post-evolution 6-column shape
    timestamp: int = 0


def _ts_millis(i: int) -> int:
    return (BASE_TS + i) * 1000 + (i * 7) % 1000


def _row(conv: str, turn: int, role: str, text: str, ts_millis: int, tool=None, evolved=False):
    row = [conv, turn, role, text, ts_millis]
    if evolved:
        row.append(tool)
    return row


def generate_changelog(
    n_conversations: int = 50,
    max_turns: int = 12,
    n_extra_ops: int = 200,
    seed: int = 42,
    update_ratio: float = 0.55,
    delete_ratio: float = 0.12,
    hot_conversations: int = 3,
    hot_share: float = 0.5,
    evolve_after_frac: float | None = 0.6,
    duplicate_txns: int = 0,
    truncate_at_frac: float | None = None,
) -> list[Txn]:
    """Build the transaction list (driver-side spec, not yet encoded).

    Hot-key skew: ``hot_share`` of all update/delete ops target the first
    ``hot_conversations`` conversations.

    ``truncate_at_frac``: inject one ``TRUNCATE TABLE`` transaction at
    that fraction of the extra-ops phase (a retention job's clear). The
    generator's own state resets with it — like a real server, every op
    after the truncate can only touch rows re-inserted after it.
    Duplicate injection never redelivers the truncate (a server delivers
    each implicit-commit statement once; engine-side redelivery
    idempotence for fences is pinned separately in tests).
    """
    rng = random.Random(seed)
    hot_conversations = min(hot_conversations, n_conversations)
    txns: list[Txn] = []
    state: dict[tuple[str, int], list] = {}
    # per-conversation live turn list, maintained incrementally (appends at
    # the end, deletes pop the end → stays sorted); avoids an O(total-keys)
    # scan per transaction so generation stays linear in ops
    turns_by_conv: dict[str, list[int]] = {}
    seq = 0
    tick = 0

    convs = [f"conv-{i:05d}" for i in range(n_conversations)]

    # Phase 1: insert initial turns, one transaction per conversation
    for conv in convs:
        seq += 1
        txn = Txn(seq=seq, timestamp=BASE_TS + tick)
        n_turns = rng.randint(2, max_turns)
        for turn in range(n_turns):
            tick += 1
            role = ROLES[turn % 2] if turn < 2 else rng.choice(ROLES)
            text = f"{conv} turn {turn} {role}: " + " ".join(
                rng.choice(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
                for _ in range(rng.randint(3, 20))
            )
            row = _row(conv, turn, role, text, _ts_millis(tick))
            txn.ops.append(Op("insert", None, list(row)))
            state[(conv, turn)] = row
        turns_by_conv[conv] = list(range(n_turns))
        txns.append(txn)

    # Phase 2: skewed updates/deletes/appends
    evolve_at = int(n_extra_ops * evolve_after_frac) if evolve_after_frac is not None else None
    truncate_at = (
        int(n_extra_ops * truncate_at_frac) if truncate_at_frac is not None else None
    )
    evolved = False
    for i in range(n_extra_ops):
        if evolve_at is not None and i == evolve_at:
            evolved = True
        if truncate_at is not None and i == truncate_at:
            seq += 1
            tick += 1
            txns.append(
                Txn(
                    seq=seq,
                    ops=[Op("truncate", None, None)],
                    evolved=evolved,
                    timestamp=BASE_TS + tick,
                )
            )
            state.clear()
            turns_by_conv.clear()
        seq += 1
        tick += 1
        txn = Txn(seq=seq, evolved=evolved, timestamp=BASE_TS + tick)
        if rng.random() < hot_share:
            conv = convs[rng.randrange(hot_conversations)]
        else:
            conv = convs[rng.randrange(n_conversations)]
        live_turns = turns_by_conv.setdefault(conv, [])
        r = rng.random()
        n_ops = rng.randint(1, 4)
        for _ in range(n_ops):
            tick += 1
            if live_turns and r < update_ratio:
                turn = rng.choice(live_turns)
                before = state[(conv, turn)]
                text = before[3] + f" [edit@{seq}]"
                tool = rng.choice(TOOLS) if evolved else None
                after = _row(conv, turn, before[2], text, _ts_millis(tick), tool, evolved)
                bef = list(before)
                if evolved and len(bef) == 5:
                    bef = bef + [None]  # before-image under the evolved map
                elif not evolved and len(bef) == 6:
                    bef = bef[:5]
                txn.ops.append(Op("update", bef, after))
                state[(conv, turn)] = after
            elif live_turns and r < update_ratio + delete_ratio:
                turn = live_turns.pop()
                before = state.pop((conv, turn))
                bef = list(before)
                if evolved and len(bef) == 5:
                    bef = bef + [None]
                elif not evolved and len(bef) == 6:
                    bef = bef[:5]
                txn.ops.append(Op("delete", bef, None))
            else:
                turn = (live_turns[-1] + 1) if live_turns else 0
                live_turns.append(turn)
                role = rng.choice(ROLES)
                text = f"{conv} turn {turn} {role}: appended at seq {seq}"
                tool = rng.choice(TOOLS) if evolved else None
                row = _row(conv, turn, role, text, _ts_millis(tick), tool, evolved)
                txn.ops.append(Op("insert", None, row))
                state[(conv, turn)] = row
        txns.append(txn)

    # Duplicate-transaction injection: re-deliver some already-committed
    # transactions verbatim (same GTID) — idempotence test (ST5,
    # uuid_set.rs:46-48). LWW dedup + gtid ledger must absorb them.
    if duplicate_txns:
        dup_candidates = [
            t for t in txns if t.ops and t.ops[0].kind != "truncate"
        ]
        for i in range(duplicate_txns):
            src = dup_candidates[rng.randrange(len(dup_candidates))]
            txns.append(Txn(seq=src.seq, ops=src.ops, evolved=src.evolved, timestamp=src.timestamp))

    return txns


def apply_changelog_oracle(txns: list[Txn]) -> pd.DataFrame:
    """Sequential single-threaded apply — the reference-equivalent oracle.

    Mirrors how a consumer of the reference library would maintain the table
    (process events in file order, one at a time; README.md:56-64), with
    at-most-once per GTID (duplicate redeliveries of an already-applied
    transaction are skipped — uuid_set.rs:46-48 idempotence).
    """
    state: dict[tuple[str, int], list] = {}
    applied: set[int] = set()
    for txn in txns:
        if txn.seq in applied:
            continue
        applied.add(txn.seq)
        for op in txn.ops:
            if op.kind == "truncate":
                state.clear()
            elif op.kind == "insert" or op.kind == "update":
                row = op.after
                key = (row[0], row[1])
                state[key] = row
            elif op.kind == "delete":
                key = (op.before[0], op.before[1])
                state.pop(key, None)
    records = []
    for (conv, turn), row in sorted(state.items()):
        tool = row[5] if len(row) > 5 else None
        records.append(
            {
                "conv_id": conv,
                "turn_idx": turn,
                "role": row[2],
                "text": row[3],
                "tool": tool,
                "ts": pd.Timestamp(row[4], unit="ms"),
            }
        )
    return pd.DataFrame(
        records, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def plan_xa_modes(txns: list[Txn], txns_per_file: int) -> dict:
    """Deterministic, *server-legal* XA mode per transaction for
    :func:`write_binlog_files` ``xa_plan``: a rotating slice of the
    changelog is logged two-phase — some committing in the NEXT file
    (cross-batch floor resolution), some rolled back there, some one-phase
    inline. Duplicated seqs stay plain BEGIN..XID groups so redelivery
    semantics are tested orthogonally.

    Legality: on a real server ``XA PREPARE`` holds the transaction's row
    locks until its verdict, so no later transaction can write the same
    rows before the ``XA COMMIT`` lands — a binlog where one does cannot
    exist. Deferred commits therefore only go to transactions whose keys
    no later transaction in the same file touches (the verdict is emitted
    at the head of the next file, before that file's transactions, so
    cross-file writers always serialize after it). Rollback needs no such
    guard: its rows are dropped in every ordering, and later full row
    images are identical with or without them.
    """
    from collections import Counter

    counts = Counter(t.seq for t in txns)

    def keys(t: Txn) -> set:
        return {
            ((op.after or op.before)[0], (op.after or op.before)[1])
            for op in t.ops
        }

    plan: dict[int, str] = {}
    for i, t in enumerate(txns):
        if counts[t.seq] != 1:
            continue
        if i % 10 == 6:
            plan[t.seq] = "rollback"
        elif i % 5 == 1:
            chunk_end = (i // txns_per_file + 1) * txns_per_file
            tk = keys(t)
            if any(tk & keys(u) for u in txns[i + 1 : chunk_end]):
                plan[t.seq] = "one_phase"  # locked keys rewritten in-file
            else:
                plan[t.seq] = "next_file"
        elif i % 5 == 3:
            plan[t.seq] = "one_phase"
    return plan


def _partition_of(text: str, parts: int) -> int:
    """Deterministic partition function for ``write_binlog_files(
    partitions=N)`` — models ``PARTITION BY KEY`` over the text column.
    Must stay SQL-expressible so the DuckDB oracle can recompute it:
    ``(length(text) + ascii(text)) % N``."""
    return (len(text) + (ord(text[0]) if text else 0)) % parts


def write_binlog_files(
    txns: list[Txn],
    outdir: str,
    txns_per_file: int = 200,
    file_prefix: str = "binlog",
    source_uuid: str = SOURCE_UUID,
    server_id: int = 1,
    write_begin_query: bool = True,
    workers: int = 0,
    provider: str = "mysql",
    row_image: str = "full",
    row_metadata: str = "full",
    xa_plan: dict | None = None,
    rows_query: bool = False,
    partitions: int | None = None,
    failover: tuple[int, str] | None = None,
    sidecar: bool = False,
    text_wire: str = "varchar",
    server_id_by_seq: dict[int, int] | None = None,
    widen_after_seq: int | None = None,
    evolution_ddl: str = EVOLUTION_DDL,
) -> list[str]:
    """Encode transactions into rotating binlog files.

    ``xa_plan``: optional {txn.seq: mode} logging selected transactions as
    XA (two-phase) transactions instead of BEGIN..XID groups — GTID →
    ``XA START`` → TABLE_MAP/rows → ``XA END`` → prepare, with the
    verdict query under its own GTID (seq + 1_000_000). The prepare
    takes each server's real shape: MySQL 5.7+ logs the
    XA_PREPARE_LOG_EVENT (type 38), MariaDB 10.5+ logs an
    ``XA PREPARE <xid>`` QUERY event (MDEV-742 — MariaDB never adopted
    MySQL's event type). Modes: ``"next_file"`` / ``"rollback"`` put
    ``XA COMMIT`` / ``XA ROLLBACK`` at the START of the following file
    (cross-segment resolution — last file's land at its own end),
    ``"one_phase"`` logs ``XA COMMIT ... ONE PHASE`` inline
    (binlog/xa.py).

    Each file re-emits the TABLE_MAP before its first row event (required:
    per-file decode state resets, mirroring the reference's atomicity rule
    that TableMap does not advance the commit position so it is always
    replayed with its row events — binlog_client.rs:107-110).

    ``workers > 1`` encodes files in parallel processes (files are
    independent given their transaction slice) — fixture-generation speed
    only, identical bytes.

    ``row_metadata`` mirrors the server's ``binlog_row_metadata`` setting:
    ``"full"`` puts column names + simple-PK sections in every TABLE_MAP
    (table_metadata.rs:23); ``"minimal"`` (the server DEFAULT) omits both,
    and the evolution step is instead recorded the way a real server
    records it — an autocommit ``ALTER TABLE`` QUERY event written once,
    immediately before the first post-evolution transaction
    (``EVOLUTION_DDL``; consumed by binlog/ddl.py schema discovery).

    ``rows_query=True`` mirrors ``binlog_rows_query_log_events=ON``: a
    ROWS_QUERY event with a deterministic statement text
    (``/* seq=<seq> run=<run_ord> */ <KIND> chat.transcripts``) precedes
    each rows event, so origin attribution is reconstructible from the
    logical changelog (run_ord = ordinal of the consecutive-same-kind op
    run within the transaction).

    ``partitions=N`` mirrors a partitioned source table (WL#12168,
    MySQL 8.0.16+): statement runs split into one rows event per
    consecutive same-partition group — exactly how the server batches
    partitioned writes — and every event carries the PART extra-row-info
    TLV: ``_partition_of(text)`` of the after-image for insert/update,
    of the before-image for deletes, plus the source partition on
    updates (row migration when an edit changes the text's partition).

    ``failover=(after_seq, new_uuid)`` models a source failover mid-
    stream: transactions with ``seq > after_seq`` are committed by a NEW
    server — a fresh ``source_id`` whose GTID sequence restarts at 1 —
    so the takeover's newer writes carry *smaller* sequence numbers than
    the old primary's. Cross-source GTID sequences are not mutually
    ordered (pipeline/order.py module doc); replaying such a stream
    correctly requires the timestamp-led ``order_cols`` override. The
    logical changelog keeps the original global ``seq`` (the rebasing is
    a wire-form property), so sequential-replay oracles are unchanged.
    MySQL provider only; not composable with ``xa_plan``.
    """
    if failover is not None:
        if provider != "mysql":
            raise ValueError("failover fixture supports the mysql provider only")
        if xa_plan:
            raise ValueError("failover fixture is not composable with xa_plan")
    if sidecar:
        # ``sidecar=True`` interleaves the derived chat.tool_calls ops
        # (sidecar_ops) inside each transaction — GTID → BEGIN →
        # TABLE_MAP(transcripts)+rows → TABLE_MAP(tool_calls)+rows → XID,
        # exactly how a server logs a transaction touching two tables.
        # The sidecar always carries FULL images + FULL metadata; the
        # row_image/row_metadata knobs shape the transcripts side only.
        if provider != "mysql" or row_image != "full":
            raise ValueError(
                "sidecar fixture supports mysql provider + full row image"
            )
        if xa_plan or partitions:
            raise ValueError(
                "sidecar fixture is not composable with xa_plan/partitions"
            )
    if text_wire not in ("varchar", "text"):
        # "text": log the transcript body as LONGTEXT-style TEXT — the
        # BLOB wire form (2-byte packlength) + utf8mb4 charset TLV — the
        # realistic shape for a production transcript table (VARCHAR caps
        # at 64 KiB rows; real `text` columns are TEXT). The logical
        # stream is identical, so every oracle carries over unchanged.
        raise ValueError("text_wire must be 'varchar' or 'text'")
    import os

    os.makedirs(outdir, exist_ok=True)
    alter_before_seq = None
    if row_metadata == "minimal":
        alter_before_seq = next((t.seq for t in txns if t.evolved), None)
    n_files = max(1, (len(txns) + txns_per_file - 1) // txns_per_file)
    # XA verdict placement is static (chunking is deterministic), so the
    # per-file jobs stay independent and parallel-safe
    head_verdicts: list[list] = [[] for _ in range(n_files)]
    tail_verdicts: list[list] = [[] for _ in range(n_files)]
    if xa_plan:
        for fidx in range(n_files):
            for txn in txns[fidx * txns_per_file : (fidx + 1) * txns_per_file]:
                mode = xa_plan.get(txn.seq)
                if mode in ("next_file", "rollback"):
                    v = (txn.seq + 1_000_000, f"e2e-{txn.seq}".encode(),
                         mode != "rollback")
                    if fidx + 1 < n_files:
                        head_verdicts[fidx + 1].append(v)
                    else:
                        tail_verdicts[fidx].append(v)
    if workers and workers > 1 and n_files > 1:
        from concurrent.futures import ProcessPoolExecutor

        jobs = [
            (
                txns[fidx * txns_per_file : (fidx + 1) * txns_per_file],
                outdir, fidx, n_files, txns_per_file, file_prefix,
                source_uuid, server_id, write_begin_query, provider, row_image,
                row_metadata, alter_before_seq, widen_after_seq, rows_query,
                partitions, failover, sidecar, text_wire, server_id_by_seq,
                evolution_ddl,
                xa_plan, head_verdicts[fidx], tail_verdicts[fidx],
            )
            for fidx in range(n_files)
        ]
        with ProcessPoolExecutor(max_workers=workers) as ex:
            return list(ex.map(_write_one_file, jobs, chunksize=1))

    paths: list[str] = []
    for fidx in range(n_files):
        chunk = txns[fidx * txns_per_file : (fidx + 1) * txns_per_file]
        paths.append(
            _write_one_file(
                (chunk, outdir, fidx, n_files, txns_per_file, file_prefix,
                 source_uuid, server_id, write_begin_query, provider, row_image,
                 row_metadata, alter_before_seq, widen_after_seq, rows_query,
                 partitions, failover, sidecar, text_wire, server_id_by_seq,
                 evolution_ddl,
                 xa_plan, head_verdicts[fidx], tail_verdicts[fidx])
            )
        )
    return paths


def _write_one_file(job) -> str:
    (chunk, outdir, fidx, n_files, txns_per_file, file_prefix,
     source_uuid, server_id, write_begin_query, provider, row_image,
     row_metadata, alter_before_seq, widen_after_seq, rows_query,
     partitions, failover, sidecar, text_wire, server_id_by_seq,
     evolution_ddl,
     *xa_extra) = job
    xa_plan, head_verdicts, tail_verdicts = (
        xa_extra if xa_extra else (None, [], [])
    )
    minimal_meta = row_metadata == "minimal"
    import os

    fname = f"{file_prefix}.{fidx + 1:06d}"
    writer = BinlogWriter(fname, server_id=server_id)

    def _emit_verdicts(verdicts):
        for vseq, gtrid, commit in verdicts:
            if provider == "mariadb":
                writer.write_mariadb_gtid(0, vseq)
            else:
                writer.write_mysql_gtid(source_uuid, vseq)
            verb = "COMMIT" if commit else "ROLLBACK"
            writer.write_query(
                f"XA {verb} X'{gtrid.hex()}'", database="chat"
            )

    _emit_verdicts(head_verdicts)
    for txn in chunk:
        # circular-replication corpus: a txn that ORIGINATED on another
        # server carries that server's id in every event header (how a
        # relay in a multi-primary ring logs foreign writes)
        writer.server_id = (server_id_by_seq or {}).get(txn.seq, server_id)
        cols = POST_COLUMNS if txn.evolved else PRE_COLUMNS
        table_id = TABLE_ID_POST if txn.evolved else TABLE_ID_PRE
        ctypes = [COLUMN_TYPES[c][0] for c in cols]
        cmeta = [COLUMN_TYPES[c][1] for c in cols]
        if text_wire == "text":
            ti = cols.index("text")
            ctypes[ti] = ColumnType.BLOB
            cmeta[ti] = 2  # TEXT: 2-byte packlength (col_parser.rs:23-28)

        def _wire_row(row):
            # TEXT rides the blob wire form: the cell is raw charset
            # bytes, so pre-encode the logical str (encode_cell blobs
            # take bytes verbatim). Logical images stay str everywhere
            # else (oracles, partition hashing).
            if row is None or text_wire != "text":
                return row
            r = list(row)
            if r[3] is not None:
                r[3] = r[3].encode("utf-8")
            return r
        if alter_before_seq is not None and txn.seq == alter_before_seq:
            # autocommit DDL, written once stream-wide (this txn is the
            # global first evolved one and lives in exactly one chunk)
            writer.write_query(evolution_ddl, database="chat",
                               timestamp=txn.timestamp)
        if widen_after_seq is not None and txn.seq == widen_after_seq:
            # widening retype: the MODIFY is logged once; every TABLE_MAP
            # from this txn on carries LONGLONG for turn_idx (the server
            # rewrote the table)
            writer.write_query(WIDEN_DDL, database="chat",
                               timestamp=txn.timestamp)
        if widen_after_seq is not None and txn.seq >= widen_after_seq:
            ctypes[cols.index("turn_idx")] = ColumnType.LONGLONG
        if txn.ops and txn.ops[0].kind == "truncate":
            # TRUNCATE TABLE is an implicit-commit statement: the server
            # logs its own GTID + one QUERY event — no BEGIN, no
            # TABLE_MAP/rows, no XID (and never inside an XA or
            # TRANSACTION_PAYLOAD wrapper: DDL transactions are excluded
            # from binlog_transaction_compression, WL#3549)
            if xa_plan and xa_plan.get(txn.seq):
                raise ValueError("a TRUNCATE txn cannot carry an xa_plan mode")
            if provider == "mariadb":
                writer.write_mariadb_gtid(0, txn.seq, timestamp=txn.timestamp)
            else:
                writer.write_mysql_gtid(
                    source_uuid, txn.seq, timestamp=txn.timestamp
                )
            writer.write_query(
                "TRUNCATE TABLE transcripts", database="chat",
                timestamp=txn.timestamp,
            )
            continue
        xa_mode = xa_plan.get(txn.seq) if xa_plan else None
        xa_xid_sql = f"X'{f'e2e-{txn.seq}'.encode().hex()}'" if xa_mode else None
        if provider == "mariadb":
            writer.write_mariadb_gtid(0, txn.seq, timestamp=txn.timestamp)
        else:
            g_uuid, g_seq = source_uuid, txn.seq
            if failover is not None and txn.seq > failover[0]:
                # post-takeover commit: new source_id, sequence rebased
                # to restart at 1 (a fresh server's gtid_next counter)
                g_uuid, g_seq = failover[1], txn.seq - failover[0]
            writer.write_mysql_gtid(g_uuid, g_seq, timestamp=txn.timestamp)
        if xa_mode:
            writer.write_query(
                f"XA START {xa_xid_sql}", database="chat", timestamp=txn.timestamp
            )
        elif write_begin_query:
            writer.write_query("BEGIN", database="chat", timestamp=txn.timestamp)
        writer.write_table_map(
            table_id,
            "chat",
            "transcripts",
            ctypes,
            cmeta,
            nullability=[False, False, False, False, False]
            + ([True] if txn.evolved else []),
            # FULL row metadata carries names + simple PK; MINIMAL (the
            # server default) omits both — schema comes from DDL instead
            column_names=None if minimal_meta else cols,
            simple_primary_keys=None if minimal_meta else [0, 1],
            # explicit SIGNEDNESS (all numeric columns signed): without the
            # section the decoder keeps raw unsigned like the reference
            signedness=[False for c in cols if c == "turn_idx"],
            # a real server always writes the charset TLV for character
            # columns (WL#4618), incl. under MINIMAL metadata — utf8mb4
            **({"default_charset": 255} if text_wire == "text" else {}),
            timestamp=txn.timestamp,
        )
        # statement order is semantic (delete-then-reinsert of a key);
        # group only *consecutive* same-kind ops into one rows event,
        # exactly like a server batching rows of one statement
        run_kind = None
        run: list = []
        run_ord = 0

        minimal = row_image == "minimal"
        pk_idx = (0, 1)  # (conv_id, turn_idx)

        def flush_run(kind, ops):
            nonlocal run_ord
            if not ops:
                return
            if rows_query:
                # binlog_rows_query_log_events=ON: the statement's SQL is
                # logged ahead of its rows event; text is deterministic so
                # the DuckDB oracle can rebuild it from the changelog
                writer.write_rows_query(
                    f"/* seq={txn.seq} run={run_ord} */ "
                    f"{kind.upper()} chat.transcripts",
                    timestamp=txn.timestamp,
                )
            run_ord += 1
            # WL#12168: the server writes one rows event per partition
            # within a statement (a new event starts when the row's
            # partition differs from the current event's), each carrying
            # the PART extra-row-info TLV — so split the run into
            # consecutive same-partition groups and emit one event per
            # group. Without ``partitions`` the run stays one event.
            groups: list[tuple[dict, list]] = []
            if partitions:
                for op in ops:
                    img = op.after if kind != "delete" else op.before
                    kw = {"partition_id": _partition_of(img[3], partitions)}
                    if kind == "update":
                        kw["source_partition_id"] = _partition_of(
                            op.before[3], partitions
                        )
                    if groups and groups[-1][0] == kw:
                        groups[-1][1].append(op)
                    else:
                        groups.append((kw, [op]))
            else:
                groups = [({}, ops)]
            for part_kw, ops in groups:
                _emit_rows_event(kind, ops, part_kw)

        def _emit_rows_event(kind, ops, part_kw):
            n = len(cols)
            if kind == "insert":
                # inserts always carry full images, even under MINIMAL
                writer.write_rows(
                    table_id, ctypes, cmeta, [_wire_row(op.after) for op in ops],
                    event_type=EventType.MYSQL_WRITE_ROWS_V2, timestamp=txn.timestamp,
                    **part_kw,
                )
            elif kind == "update":
                bp = ap = None
                if minimal:
                    # before: PK only; after: PK ∪ changed columns of the run
                    changed = set(pk_idx)
                    for op in ops:
                        for i in range(n):
                            if (op.before[i] if i < len(op.before) else None) != (
                                op.after[i] if i < len(op.after) else None
                            ):
                                changed.add(i)
                    bp = [i in pk_idx for i in range(n)]
                    ap = [i in changed for i in range(n)]
                writer.write_update_rows(
                    table_id, ctypes, cmeta,
                    [(_wire_row(op.before), _wire_row(op.after)) for op in ops],
                    before_present=bp, after_present=ap, timestamp=txn.timestamp,
                    **part_kw,
                )
            else:
                writer.write_rows(
                    table_id, ctypes, cmeta, [_wire_row(op.before) for op in ops],
                    event_type=EventType.MYSQL_DELETE_ROWS_V2,
                    columns_present=(
                        [i in pk_idx for i in range(n)] if minimal else None
                    ),
                    timestamp=txn.timestamp,
                    **part_kw,
                )

        for op in txn.ops:
            if op.kind != run_kind and run:
                flush_run(run_kind, run)
                run = []
            run_kind = op.kind
            run.append(op)
        flush_run(run_kind, run)
        if sidecar:
            sc_ops = sidecar_ops(txn)
            if sc_ops:
                writer.write_table_map(
                    TABLE_ID_SIDECAR, "chat", "tool_calls",
                    _SIDECAR_CTYPES, _SIDECAR_CMETA,
                    nullability=[False] * 5,
                    column_names=SIDECAR_COLUMNS,
                    simple_primary_keys=[0, 1, 2],
                    signedness=[False, False, False],
                    timestamp=txn.timestamp,
                )

                def _flush_sc(kind, ops):
                    if kind == "insert":
                        writer.write_rows(
                            TABLE_ID_SIDECAR, _SIDECAR_CTYPES, _SIDECAR_CMETA,
                            [o.after for o in ops],
                            event_type=EventType.MYSQL_WRITE_ROWS_V2,
                            timestamp=txn.timestamp,
                        )
                    elif kind == "update":
                        writer.write_update_rows(
                            TABLE_ID_SIDECAR, _SIDECAR_CTYPES, _SIDECAR_CMETA,
                            [(o.before, o.after) for o in ops],
                            timestamp=txn.timestamp,
                        )
                    else:
                        writer.write_rows(
                            TABLE_ID_SIDECAR, _SIDECAR_CTYPES, _SIDECAR_CMETA,
                            [o.before for o in ops],
                            event_type=EventType.MYSQL_DELETE_ROWS_V2,
                            timestamp=txn.timestamp,
                        )

                sc_kind, sc_run = None, []
                for o in sc_ops:
                    if o.kind != sc_kind and sc_run:
                        _flush_sc(sc_kind, sc_run)
                        sc_run = []
                    sc_kind = o.kind
                    sc_run.append(o)
                _flush_sc(sc_kind, sc_run)
        if xa_mode:
            writer.write_query(
                f"XA END {xa_xid_sql}", database="chat", timestamp=txn.timestamp
            )
            if xa_mode == "one_phase":
                writer.write_query(
                    f"XA COMMIT {xa_xid_sql} ONE PHASE",
                    database="chat", timestamp=txn.timestamp,
                )
            elif provider == "mariadb":
                # MariaDB 10.5+ (MDEV-742) logs XA PREPARE as a QUERY
                # event; it never adopted MySQL's type-38 event
                writer.write_query(
                    f"XA PREPARE {xa_xid_sql}",
                    database="chat", timestamp=txn.timestamp,
                )
            else:
                writer.write_xa_prepare(
                    f"e2e-{txn.seq}".encode(), timestamp=txn.timestamp
                )
        else:
            writer.write_xid(txn.seq, timestamp=txn.timestamp)
    # control events at file end (verdicts, rotate) are the relay's own
    writer.server_id = server_id
    _emit_verdicts(tail_verdicts)
    if fidx + 1 < n_files:
        writer.write_rotate(f"{file_prefix}.{fidx + 2:06d}")
    path = os.path.join(outdir, fname)
    writer.save(path)
    return path


def count_change_events(txns: list[Txn]) -> int:
    """Row-level change count (for events/sec metrics)."""
    return sum(len(t.ops) for t in txns)


def changelog_to_pandas(txns: list[Txn]) -> pd.DataFrame:
    """Logical change rows — the dual-write of the binlog bytes, so an
    external SQL engine (the DuckDB correctness oracle) can replay the
    identical stream without a binlog parser.

    One row per op with its replay-order tuple: ``txn_ord`` is delivery
    order (redelivered duplicates keep their original ``seq`` but get a
    later ``txn_ord``), ``op_ord`` the within-transaction statement order —
    the SQL twin of the engine's (gtid_seq, pos, row_in_event) total order.
    Deletes carry the key from the before-image and NULL values, exactly
    the information a DELETE_ROWS event contributes to final state.
    ``before_text`` dual-writes the before-image text for update/delete
    ops (NULL for inserts) — the update's source-partition provenance
    (WL#12168) is a function of the before image, which final-state
    replay alone doesn't expose."""
    rows = []
    for txn_ord, txn in enumerate(txns):
        for op_ord, op in enumerate(txn.ops):
            if op.kind == "truncate":
                # sentinel values only — a replaying SQL oracle keys on
                # kind='truncate' (max applied txn_ord = the fence) and
                # never surfaces this row's columns
                rows.append(
                    {
                        "txn_ord": txn_ord,
                        "seq": txn.seq,
                        "op_ord": op_ord,
                        "kind": "truncate",
                        "conv_id": None,
                        "turn_idx": -1,
                        "role": None,
                        "text": None,
                        "tool": None,
                        "ts_ms": 0,
                        "before_text": None,
                        "evolved": False,
                    }
                )
                continue
            src = op.after if op.kind != "delete" else op.before
            is_del = op.kind == "delete"
            rows.append(
                {
                    "txn_ord": txn_ord,
                    "seq": txn.seq,
                    "op_ord": op_ord,
                    "kind": op.kind,
                    "conv_id": src[0],
                    "turn_idx": src[1],
                    "role": None if is_del else src[2],
                    "text": None if is_del else src[3],
                    "tool": None if is_del else (src[5] if len(src) > 5 else None),
                    "ts_ms": None if is_del else src[4],
                    "before_text": op.before[3] if op.kind != "insert" else None,
                    "evolved": len(src) > 5,
                }
            )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "txn_ord", "seq", "op_ord", "kind", "conv_id", "turn_idx",
            "role", "text", "tool", "ts_ms", "before_text", "evolved",
        ],
    )
    pdf["ts_ms"] = pdf["ts_ms"].astype("Int64")
    return pdf


def write_changelog_parquet(txns: list[Txn], path: str) -> str:
    """Write the logical change rows next to the binlog bytes (atomic
    rename so a concurrent reader never sees a torn file)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(changelog_to_pandas(txns)), tmp)
    os.replace(tmp, path)
    return path
