"""Wire-protocol scalar functions (F9/F10): password scramble + server
response parsers, against synthetic packets built to the documented
layouts (no socket in scope — these are pure byte functions)."""

from __future__ import annotations

import hashlib
import struct

import pytest

from mysql_cdc_spark.binlog.wire import (
    CACHING_SHA2_PASSWORD,
    MYSQL_NATIVE_PASSWORD,
    PLUGIN_AUTH,
    SECURE_CONNECTION,
    check_error_packet,
    encrypt_password,
    parse_auth_switch_packet,
    parse_end_of_file_packet,
    parse_error_packet,
    parse_handshake_packet,
    parse_result_set_row,
)


class TestScramble:
    def test_native_password_formula(self):
        """sha1(pw) XOR sha1(scramble ∥ sha1(sha1(pw))) — computed here
        independently with hashlib primitives (extensions.rs:13-17)."""
        pw, scr = "secret_pw", "12345678901234567890"
        h1 = hashlib.sha1(pw.encode()).digest()
        want = bytes(
            a ^ b
            for a, b in zip(
                h1, hashlib.sha1(scr.encode() + hashlib.sha1(h1).digest()).digest()
            )
        )
        assert encrypt_password(pw, scr, MYSQL_NATIVE_PASSWORD) == want
        assert len(want) == 20

    def test_caching_sha2_formula(self):
        pw, scr = "pw", "abcdefghijabcdefghij"
        h1 = hashlib.sha256(pw.encode()).digest()
        want = bytes(
            a ^ b
            for a, b in zip(
                h1, hashlib.sha256(scr.encode() + hashlib.sha256(h1).digest()).digest()
            )
        )
        assert encrypt_password(pw, scr, CACHING_SHA2_PASSWORD) == want
        assert len(want) == 32

    def test_unknown_plugin_raises(self):
        with pytest.raises(ValueError):
            encrypt_password("x", "y", "sha256_password")


class TestResponses:
    def test_error_packet_with_sqlstate(self):
        body = struct.pack("<H", 1236) + b"#HY000Could not find first log file"
        got = parse_error_packet(body)
        assert got == {
            "error_code": 1236,
            "sql_state": "HY000",
            "error_message": "Could not find first log file",
        }

    def test_error_packet_without_sqlstate(self):
        got = parse_error_packet(struct.pack("<H", 1045) + b"Access denied")
        assert got["sql_state"] is None and got["error_message"] == "Access denied"

    def test_check_error_packet(self):
        ok = b"\x00rest"
        check_error_packet(ok)  # no raise
        err = b"\xff" + struct.pack("<H", 1236) + b"#HY000boom"
        with pytest.raises(ValueError, match="1236"):
            check_error_packet(err, "replication failed:")

    def test_eof_packet(self):
        assert parse_end_of_file_packet(struct.pack("<HH", 2, 0x0022)) == {
            "warning_count": 2,
            "server_status": 0x0022,
        }

    def test_auth_switch(self):
        pkt = b"caching_sha2_password\x00scramble-data-here\x00"
        assert parse_auth_switch_packet(pkt) == {
            "auth_plugin_name": "caching_sha2_password",
            "auth_plugin_data": "scramble-data-here",
        }

    def test_result_set_row(self):
        # 'show master status'-shaped row: file, position, ...
        def lenc(s: bytes) -> bytes:
            return bytes([len(s)]) + s

        pkt = lenc(b"mysql-bin.000042") + lenc(b"154") + lenc(b"") + lenc(b"")
        assert parse_result_set_row(pkt) == ["mysql-bin.000042", "154", "", ""]

    def test_handshake_roundtrip(self):
        caps = SECURE_CONNECTION | PLUGIN_AUTH | 0x0000F7FF
        cap_bytes = caps.to_bytes(8, "little")
        scr1, scr2 = b"12345678", b"901234567890"
        pkt = (
            bytes([10])
            + b"8.0.36\x00"
            + struct.pack("<I", 777)
            + scr1 + b"\x00"
            + cap_bytes[0:2]
            + bytes([45])
            + struct.pack("<H", 2)
            + cap_bytes[2:4]
            + bytes([21])
            + b"\x00" * 6
            + cap_bytes[4:8]
            + scr2 + b"\x00"
            + b"mysql_native_password\x00"
        )
        got = parse_handshake_packet(pkt)
        assert got["protocol_version"] == 10
        assert got["server_version"] == "8.0.36"
        assert got["connection_id"] == 777
        assert got["scramble"] == (scr1 + scr2).decode()  # SECURE_CONNECTION tail
        assert got["server_capabilities"] == caps
        assert got["server_collation"] == 45
        assert got["status_flags"] == 2
        assert got["auth_plugin_name"] == "mysql_native_password"
