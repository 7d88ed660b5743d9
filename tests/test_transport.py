"""Live TCP transport (binlog/transport.py) against a real loopback
socket served by the in-process fake server (fake_mysql_server.py): the
same wire bytes a real server sends — handshake, native-password auth
(direct and via plugin switch), negotiation result sets, and a
COM_BINLOG_DUMP stream whose mirrored segments are byte-identical to
the source files and replay to the sequential oracle."""

from __future__ import annotations

import os

import pytest

from mysql_cdc_spark.binlog.connect import ReplicaOptions
from mysql_cdc_spark.binlog.transport import (
    BinlogSocketClient,
    TransportError,
    mirror_stream,
)
from mysql_cdc_spark.fixtures import (
    apply_changelog_oracle,
    generate_changelog,
    write_binlog_files,
)

from fake_mysql_server import FakeMySqlServer


@pytest.fixture(scope="module")
def source_binlog(tmp_path_factory):
    txns = generate_changelog(
        n_conversations=20, max_turns=5, n_extra_ops=60, seed=31,
        duplicate_txns=3,
    )
    outdir = str(tmp_path_factory.mktemp("src_binlog"))
    paths = write_binlog_files(txns, outdir, txns_per_file=30)
    return txns, outdir, [os.path.basename(p) for p in paths]


def _client(server, **opt_kwargs) -> BinlogSocketClient:
    opts = ReplicaOptions(
        username="repl", password="secret", blocking=False, **opt_kwargs
    )
    return BinlogSocketClient("127.0.0.1", server.port, opts)


def test_connect_negotiate_and_master_status(source_binlog):
    _, outdir, names = source_binlog
    with FakeMySqlServer(outdir) as srv:
        client = _client(srv)
        hs = client.connect()
        assert hs["auth_plugin_name"] == "mysql_native_password"
        assert len(hs["scramble"]) == 20
        assert client.negotiate() == "CRC32"
        assert client.master_status() == (names[0], 4)
        client.close()


def test_auth_plugin_switch_path(source_binlog):
    _, outdir, names = source_binlog
    with FakeMySqlServer(outdir, use_auth_switch=True) as srv:
        client = _client(srv)
        client.connect()
        assert client.master_status() == (names[0], 4)
        client.close()


def test_wrong_password_raises(source_binlog):
    _, outdir, _ = source_binlog
    with FakeMySqlServer(outdir) as srv:
        opts = ReplicaOptions(username="repl", password="WRONG", blocking=False)
        client = BinlogSocketClient("127.0.0.1", srv.port, opts)
        with pytest.raises(TransportError, match="Access denied"):
            client.connect()
        client.close()


def test_mirrored_segments_are_byte_identical(source_binlog, tmp_path):
    """The dump stream landed by mirror_stream must reproduce the source
    segment files byte-for-byte: same names (from the ROTATE events),
    same content (MAGIC + FDE + events, checksums included)."""
    _, outdir, names = source_binlog
    with FakeMySqlServer(outdir) as srv:
        client = _client(srv)
        client.connect()
        assert client.negotiate() == "CRC32"
        fname, pos = client.master_status()
        frames = client.dump(fname, pos)
        landed = mirror_stream(frames, str(tmp_path / "landing"))
        client.close()
    assert [os.path.basename(p) for p in landed] == names
    for path in landed:
        with open(os.path.join(outdir, os.path.basename(path)), "rb") as f:
            want = f.read()
        with open(path, "rb") as f:
            got = f.read()
        assert got == want, os.path.basename(path)


def test_dump_from_mid_stream_file(source_binlog, tmp_path):
    _, outdir, names = source_binlog
    assert len(names) >= 2
    with FakeMySqlServer(outdir) as srv:
        client = _client(srv)
        client.connect()
        landed = mirror_stream(
            client.dump(names[1], 4), str(tmp_path / "landing")
        )
        client.close()
    assert [os.path.basename(p) for p in landed] == names[1:]


def test_socket_tail_to_replayer_equals_oracle(spark, source_binlog, tmp_path):
    """The full live path: TCP dump → mirrored rotation segments →
    distributed Replayer → final state equals the sequential oracle.
    One tailing connection lands bytes; Spark owns everything after."""
    from mysql_cdc_spark.pipeline.replay import Replayer

    txns, outdir, _ = source_binlog
    landing = str(tmp_path / "landing")
    with FakeMySqlServer(outdir) as srv:
        client = _client(srv)
        client.connect()
        assert client.negotiate() == "CRC32"
        fname, pos = client.master_status()
        mirror_stream(client.dump(fname, pos), landing)
        client.close()

    rep = Replayer(spark, landing, str(tmp_path / "store"))
    rep.replay(files_per_batch=2)
    state = (
        rep.read_state().orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )
    oracle = apply_changelog_oracle(txns)
    assert state["text"].tolist() == oracle["text"].tolist()
    assert state["tool"].tolist() == oracle["tool"].tolist()


def test_mariadb_provider_command_sequence(source_binlog, tmp_path):
    """MariaDB dispatch sends the capability statement (plus the
    registration quartet under GTID) before the dump — the fake server
    acks each; the stream itself is provider-independent here."""
    _, outdir, names = source_binlog
    with FakeMySqlServer(outdir) as srv:
        opts = ReplicaOptions(username="repl", password="secret", blocking=False)
        client = BinlogSocketClient(
            "127.0.0.1", srv.port, opts, provider="mariadb"
        )
        client.connect()
        landed = mirror_stream(
            client.dump(names[0], 4, gtid_list_text="0-1-5"),
            str(tmp_path / "landing"),
        )
        client.close()
    assert [os.path.basename(p) for p in landed] == names


def _bytes_equal_to_source(landed, outdir, names):
    assert [os.path.basename(p) for p in landed] == names
    for path in landed:
        with open(os.path.join(outdir, os.path.basename(path)), "rb") as f:
            want = f.read()
        with open(path, "rb") as f:
            got = f.read()
        assert got == want, os.path.basename(path)


def test_tail_mirror_survives_connection_drops(source_binlog, tmp_path):
    """Connection loss mid-stream (the real-world failure mode): the
    resumable tail reconnects, re-dumps from the last landed (file,
    position), skips the re-sent rotate/FDE preamble, and the final
    mirrored segments are STILL byte-identical to the source files —
    no event lost, none duplicated, across drops early in a file,
    mid-file, and deep into later files."""
    from mysql_cdc_spark.binlog.transport import tail_mirror

    _, outdir, names = source_binlog
    with FakeMySqlServer(outdir, fail_after_frames=[7, 5, 60, 11]) as srv:
        def connect():
            c = _client(srv)
            c.connect()
            assert c.negotiate() == "CRC32"
            return c

        landed = tail_mirror(
            connect, str(tmp_path / "landing"),
            start_file=names[0], start_pos=4,
            sleep=lambda s: None,
        )
    _bytes_equal_to_source(landed, outdir, names)


def test_tail_mirror_many_separated_drops_outlast_retry_budget(
    source_binlog, tmp_path
):
    """The retry budget refreshes on progress: eight separated drops
    with max_retries=2 still complete, because every connection lands
    at least one frame before dying."""
    from mysql_cdc_spark.binlog.transport import tail_mirror

    _, outdir, names = source_binlog
    with FakeMySqlServer(
        outdir, fail_after_frames=[3, 3, 3, 3, 3, 3, 3, 3]
    ) as srv:
        def connect():
            c = _client(srv)
            c.connect()
            c.negotiate()
            return c

        landed = tail_mirror(
            connect, str(tmp_path / "landing"),
            start_file=names[0], start_pos=4,
            max_retries=2, sleep=lambda s: None,
        )
    _bytes_equal_to_source(landed, outdir, names)


def test_tail_mirror_gives_up_on_hard_down_server(source_binlog, tmp_path):
    from mysql_cdc_spark.binlog.transport import tail_mirror

    _, outdir, names = source_binlog
    srv = FakeMySqlServer(outdir)
    srv.start()
    srv.stop()  # port allocated, then closed: every connect refused

    def connect():
        c = BinlogSocketClient(
            "127.0.0.1", srv.port,
            ReplicaOptions(username="repl", password="secret", blocking=False),
            connect_timeout_s=0.5,
        )
        c.connect()
        return c

    with pytest.raises(TransportError, match="gave up"):
        tail_mirror(
            connect, str(tmp_path / "landing"),
            start_file=names[0], start_pos=4,
            max_retries=2, sleep=lambda s: None,
        )


def test_tail_mirror_to_replayer_equals_oracle(spark, source_binlog, tmp_path):
    """Drop-riddled live tail → mirrored segments → distributed Replayer:
    final table state equals the sequential oracle, pinning that the
    reconnect path preserves exactly-once all the way to the sink."""
    from mysql_cdc_spark.binlog.transport import tail_mirror
    from mysql_cdc_spark.pipeline.replay import Replayer

    txns, outdir, names = source_binlog
    landing = str(tmp_path / "landing")
    with FakeMySqlServer(outdir, fail_after_frames=[13, 40]) as srv:
        def connect():
            c = _client(srv)
            c.connect()
            c.negotiate()
            return c

        tail_mirror(
            connect, landing, start_file=names[0], start_pos=4,
            sleep=lambda s: None,
        )

    rep = Replayer(spark, landing, str(tmp_path / "store"))
    rep.replay(files_per_batch=2)
    state = (
        rep.read_state().orderBy("conv_id", "turn_idx").toPandas()
        .reset_index(drop=True)
    )
    oracle = apply_changelog_oracle(txns)
    assert state["text"].tolist() == oracle["text"].tolist()
    assert state["tool"].tolist() == oracle["tool"].tolist()


def test_mirror_skips_heartbeat_frames(source_binlog, tmp_path):
    """Blocking dumps interleave HEARTBEAT (27) / HEARTBEAT_V2 (41)
    keepalives with real events; the server never writes them to the
    binlog, so the mirror must drop them — otherwise segments stop being
    byte-identical and the offset==position resume invariant breaks."""
    import struct

    from mysql_cdc_spark.binlog.frames import split_segment_frames

    _, outdir, names = source_binlog

    def _hb(etype):
        body = names[0].encode()
        header = struct.pack(
            "<IBIIIH", 0, etype, 1, 19 + len(body) + 4, 0, 0
        )
        return header + body + b"\x00" * 4

    frames = []
    for name in names:
        with open(os.path.join(outdir, name), "rb") as f:
            content = f.read()
        # a rotate naming the file, then its frames with keepalives mixed in
        from fake_mysql_server import rotate_frame

        frames.append(rotate_frame(name))
        for i, (_pos, fr) in enumerate(split_segment_frames(content)):
            if i % 3 == 0:
                frames.append(_hb(27))
            frames.append(fr)
            if i % 4 == 0:
                frames.append(_hb(41))
    mirrored = mirror_stream(iter(frames), str(tmp_path / "hb_landing"))
    assert [os.path.basename(p) for p in mirrored] == names
    for p in mirrored:
        with open(os.path.join(outdir, os.path.basename(p)), "rb") as fh:
            src = fh.read()
        with open(p, "rb") as fh:
            assert fh.read() == src


def test_mirror_rejects_corrupt_frame(source_binlog, tmp_path):
    """Replica-side CRC verification (slave_sql_verify_checksum): a
    frame corrupted in flight stops the mirror with a positioned error
    instead of landing poisoned bytes."""
    from mysql_cdc_spark.binlog.frames import split_segment_frames

    from fake_mysql_server import rotate_frame

    _, outdir, names = source_binlog
    with open(os.path.join(outdir, names[0]), "rb") as f:
        frames = [fr for _p, fr in split_segment_frames(f.read())]
    bad = bytearray(frames[2])
    bad[len(bad) // 2] ^= 0xFF
    stream = [rotate_frame(names[0]), frames[0], frames[1], bytes(bad)]
    with pytest.raises(TransportError, match="CRC32 mismatch"):
        mirror_stream(iter(stream), str(tmp_path / "crc_landing"))
