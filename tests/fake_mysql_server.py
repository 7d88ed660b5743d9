"""In-process MySQL replication fake server for transport tests.

Speaks the real wire protocol over a real loopback TCP socket —
handshake, mysql_native_password AND caching_sha2_password auth
(fast-auth, plus full authentication via clear-password-over-TLS or the
RSA public-key exchange), the SSLRequest/TLS upgrade, optional
auth-plugin switch, text-protocol result sets, and COM_BINLOG_DUMP
streaming of an actual binlog segment directory (synthetic ROTATE
between files, OK-wrapped event frames, EOF at end — the non-blocking
dump shape). The engine's client (binlog/transport.py) is exercised
against these exact bytes; only the credential store and the SQL
surface are fake.
"""

from __future__ import annotations

import os
import socket
import struct
import threading

from mysql_cdc_spark.binlog.constants import ChecksumType
from mysql_cdc_spark.binlog.decoder import _segment_sort_key
from mysql_cdc_spark.binlog.encoder import BinlogWriter
from mysql_cdc_spark.binlog.frames import split_segment_frames
from mysql_cdc_spark.binlog.wire import (
    CACHING_SHA2_PASSWORD,
    MYSQL_CLEAR_PASSWORD,
    SHA256_PASSWORD,
    SHA256_REQUEST_PUBLIC_KEY,
    COM_BINLOG_DUMP,
    COM_BINLOG_DUMP_GTID,
    COM_QUERY,
    COM_REGISTER_SLAVE,
    LONG_FLAG,
    MYSQL_NATIVE_PASSWORD,
    PLUGIN_AUTH,
    PROTOCOL_41,
    RESPONSE_AUTH_MORE_DATA,
    SECURE_CONNECTION,
    SHA2_FAST_AUTH_SUCCESS,
    SHA2_FULL_AUTH_REQUEST,
    SHA2_REQUEST_PUBLIC_KEY,
    SSL as SSL_CAPABILITY,
    _xor,
    clear_password_payload,
    encrypt_password,
    write_packets,
)

OK_PAYLOAD = b"\x00\x00\x00\x02\x00\x00\x00"
EOF_PAYLOAD = b"\xfe\x00\x00\x02\x00"


def _err_payload(code: int, message: str) -> bytes:
    return b"\xff" + struct.pack("<H", code) + f"#28000{message}".encode()


def _read_packet(conn: socket.socket) -> tuple[bytes, int]:
    header = _read_exact(conn, 4)
    size = int.from_bytes(header[:3], "little")
    return _read_exact(conn, size), header[3]


def _read_exact(conn: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return bytes(buf)


def rotate_frame(next_name: str, checksum: int = ChecksumType.CRC32) -> bytes:
    w = BinlogWriter("synthetic", checksum=checksum)
    w.write_rotate(next_name)
    return split_segment_frames(w.getvalue())[-1][1]


def make_ssl_material(tmp_dir: str, hostname: str = "127.0.0.1"):
    """Self-signed server certificate + key for the fake server's TLS
    side. Returns (server_ssl_context, ca_pem_path) — the cert is its
    own CA, so clients verify against the same PEM; SAN carries the
    loopback IP for ssl_mode=require_verify_full."""
    import datetime
    import ipaddress
    import ssl

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "fake-mysql")]
    )
    now = datetime.datetime(2024, 1, 1)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=36500))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(ipaddress.ip_address(hostname))]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_path = os.path.join(tmp_dir, "server-cert.pem")
    key_path = os.path.join(tmp_dir, "server-key.pem")
    with open(cert_path, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_path, "wb") as f:
        f.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_path, key_path)
    return ctx, cert_path


class FakeMySqlServer:
    def __init__(
        self,
        binlog_dir: str,
        user: str = "repl",
        password: str = "secret",
        use_auth_switch: bool = False,
        checksum_text: str = "CRC32",
        server_version: str = "8.0.99-fake",
        fail_after_frames: list[int] | None = None,
        auth_plugin: str = MYSQL_NATIVE_PASSWORD,
        sha2_cached: bool = False,
        ssl_context=None,
    ):
        self.binlog_dir = binlog_dir
        self.user = user
        self.password = password
        self.use_auth_switch = use_auth_switch
        self.checksum_text = checksum_text
        self.server_version = server_version
        # each dump connection pops the next entry and hard-closes the
        # socket after sending that many event frames (connection-loss
        # injection for the resumable tail); exhausted → stream fully
        self.fail_after_frames = list(fail_after_frames or [])
        self._fail_lock = threading.Lock()
        self.scramble = "abcdefghij0123456789"  # 20 chars, ASCII
        self.switch_scramble = "zyxwvutsrq9876543210"
        # caching_sha2: sha2_cached=True drives the fast path (0x03 +
        # OK); False drives full authentication (0x04 → clear password
        # over TLS, or the RSA public-key exchange over plaintext)
        self.auth_plugin = auth_plugin
        self.sha2_cached = sha2_cached
        self.ssl_context = ssl_context  # server context; also gates the
        # SSL capability bit in the handshake
        self._rsa_key = None
        if auth_plugin == SHA256_PASSWORD or (
            auth_plugin == CACHING_SHA2_PASSWORD and not sha2_cached
        ):
            from cryptography.hazmat.primitives.asymmetric import rsa

            self._rsa_key = rsa.generate_private_key(
                public_exponent=65537, key_size=2048
            )
        self._srv: socket.socket | None = None
        self._thread: threading.Thread | None = None
        self.port = 0

    # -- lifecycle ----------------------------------------------------------

    def __enter__(self) -> "FakeMySqlServer":
        self.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def start(self) -> None:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(4)
        self._srv = srv
        self.port = srv.getsockname()[1]
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        srv = self._srv
        if srv is None:
            return
        self._srv = None
        # the accept() blocked in _accept_loop holds a kernel reference to
        # the listening socket, so close() alone leaves the port accepting;
        # poke one connection through to let the loop observe _srv is None
        try:
            with socket.create_connection(("127.0.0.1", self.port), timeout=1):
                pass
        except OSError:
            pass
        try:
            srv.close()
        except OSError:
            pass
        if self._thread is not None:
            self._thread.join(timeout=2)
            self._thread = None

    def _accept_loop(self) -> None:
        while self._srv is not None:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve, args=(conn,), daemon=True
            ).start()

    # -- protocol -----------------------------------------------------------

    def _handshake_payload(self) -> bytes:
        caps = LONG_FLAG | PROTOCOL_41 | SECURE_CONNECTION | PLUGIN_AUTH
        if self.ssl_context is not None:
            caps |= SSL_CAPABILITY
        cb = caps.to_bytes(8, "little")
        out = bytearray([10])
        out += self.server_version.encode() + b"\x00"
        out += struct.pack("<I", 99)  # connection id
        out += self.scramble[:8].encode() + b"\x00"
        out += cb[0:2]  # capability word 1
        out.append(33)  # server collation
        out += struct.pack("<H", 2)  # status flags
        out += cb[2:4]  # capability word 2
        out.append(21)  # auth plugin data length
        out += b"\x00" * 6  # filler
        out += cb[4:8]  # capability word 3
        out += self.scramble[8:].encode() + b"\x00"  # SECURE_CONNECTION tail
        out += self.auth_plugin.encode() + b"\x00"  # PLUGIN_AUTH name
        return bytes(out)

    @staticmethod
    def _parse_auth_response(payload: bytes) -> tuple[str, bytes]:
        off = 4 + 4 + 1 + 23  # caps, max packet, collation, reserved
        end = payload.index(0, off)
        username = payload[off:end].decode()
        off = end + 1
        token_len = payload[off]
        off += 1
        return username, payload[off : off + token_len]

    def _send(self, conn: socket.socket, payload: bytes, seq: int) -> int:
        conn.sendall(write_packets(payload, seq))
        return seq + 1

    def _serve(self, conn: socket.socket) -> None:
        try:
            self._send(conn, self._handshake_payload(), 0)
            payload, seq_in = _read_packet(conn)
            # SSLRequest preamble: same head as the handshake response but
            # only 32 bytes (caps + max-packet + collation + reserved, no
            # credentials) — upgrade to TLS, then read the real response
            if self.ssl_context is not None and len(payload) == 32:
                conn = self.ssl_context.wrap_socket(conn, server_side=True)
                payload, seq_in = _read_packet(conn)
            username, token = self._parse_auth_response(payload)
            scramble = self.scramble
            plugin = self.auth_plugin
            if self.use_auth_switch:
                self._send(
                    conn,
                    b"\xfe" + plugin.encode() + b"\x00"
                    + self.switch_scramble.encode() + b"\x00",
                    seq_in + 1,
                )
                token, seq_in = _read_packet(conn)
                scramble = self.switch_scramble
            if username != self.user:
                self._send(
                    conn,
                    _err_payload(1045, f"Access denied for user '{username}'"),
                    seq_in + 1,
                )
                return
            if plugin == CACHING_SHA2_PASSWORD:
                if not self._sha2_auth(conn, token, seq_in, scramble):
                    return
            elif plugin == SHA256_PASSWORD:
                if not self._sha256_auth(conn, token, seq_in, scramble):
                    return
            elif plugin == MYSQL_CLEAR_PASSWORD:
                if token != clear_password_payload(self.password):
                    self._send(
                        conn, _err_payload(1045, "Access denied"), seq_in + 1
                    )
                    return
                self._send(conn, OK_PAYLOAD, seq_in + 1)
            else:
                expected = encrypt_password(self.password, scramble, plugin)
                if token != expected:
                    self._send(
                        conn,
                        _err_payload(
                            1045, f"Access denied for user '{username}'"
                        ),
                        seq_in + 1,
                    )
                    return
                self._send(conn, OK_PAYLOAD, seq_in + 1)
            self._command_loop(conn)
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _sha2_auth(
        self, conn: socket.socket, token: bytes, seq_in: int, scramble: str
    ) -> bool:
        """caching_sha2_password server side: cached entry → verify the
        scramble response, fast-auth success marker, OK. Cache miss →
        request full authentication and verify the clear password (TLS
        channel) or the RSA-decrypted XOR-obfuscated password
        (plaintext channel)."""
        import ssl as _ssl

        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding as _pad

        if self.sha2_cached:
            expected = encrypt_password(
                self.password, scramble, CACHING_SHA2_PASSWORD
            )
            if token != expected:
                self._send(conn, _err_payload(1045, "Access denied"), seq_in + 1)
                return False
            seq = self._send(
                conn,
                bytes([RESPONSE_AUTH_MORE_DATA, SHA2_FAST_AUTH_SUCCESS]),
                seq_in + 1,
            )
            self._send(conn, OK_PAYLOAD, seq)
            return True
        # cache miss → full authentication round
        self._send(
            conn,
            bytes([RESPONSE_AUTH_MORE_DATA, SHA2_FULL_AUTH_REQUEST]),
            seq_in + 1,
        )
        payload, pseq = _read_packet(conn)
        expected = clear_password_payload(self.password)
        if isinstance(conn, _ssl.SSLSocket):
            # encrypted channel: the client sends the password in clear
            if payload != expected:
                self._send(conn, _err_payload(1045, "Access denied"), pseq + 1)
                return False
            self._send(conn, OK_PAYLOAD, pseq + 1)
            return True
        if payload != SHA2_REQUEST_PUBLIC_KEY:
            self._send(
                conn, _err_payload(1047, "expected public key request"),
                pseq + 1,
            )
            return False
        pem = self._rsa_key.public_key().public_bytes(
            serialization.Encoding.PEM,
            serialization.PublicFormat.SubjectPublicKeyInfo,
        )
        self._send(
            conn, bytes([RESPONSE_AUTH_MORE_DATA]) + pem, pseq + 1
        )
        blob, bseq = _read_packet(conn)
        try:
            plain = self._rsa_key.decrypt(
                blob,
                _pad.OAEP(
                    mgf=_pad.MGF1(algorithm=hashes.SHA1()),
                    algorithm=hashes.SHA1(),
                    label=None,
                ),
            )
        except Exception:
            self._send(conn, _err_payload(1045, "RSA decrypt failed"), bseq + 1)
            return False
        if _xor(plain, scramble.encode()) != expected:
            self._send(conn, _err_payload(1045, "Access denied"), bseq + 1)
            return False
        self._send(conn, OK_PAYLOAD, bseq + 1)
        return True

    def _sha256_auth(
        self, conn: socket.socket, token: bytes, seq_in: int, scramble: str
    ) -> bool:
        """sha256_password server side: over TLS the auth response IS the
        clear password; over plaintext it is the 1-byte public-key
        request — answer AuthMoreData + PEM, then verify the
        RSA-decrypted XOR-obfuscated password."""
        import ssl as _ssl

        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding as _pad

        expected = clear_password_payload(self.password)
        if isinstance(conn, _ssl.SSLSocket):
            if token != expected:
                self._send(conn, _err_payload(1045, "Access denied"), seq_in + 1)
                return False
            self._send(conn, OK_PAYLOAD, seq_in + 1)
            return True
        if token != SHA256_REQUEST_PUBLIC_KEY:
            self._send(
                conn, _err_payload(1047, "expected public key request"),
                seq_in + 1,
            )
            return False
        pem = self._rsa_key.public_key().public_bytes(
            serialization.Encoding.PEM,
            serialization.PublicFormat.SubjectPublicKeyInfo,
        )
        self._send(conn, bytes([RESPONSE_AUTH_MORE_DATA]) + pem, seq_in + 1)
        blob, bseq = _read_packet(conn)
        try:
            plain = self._rsa_key.decrypt(
                blob,
                _pad.OAEP(
                    mgf=_pad.MGF1(algorithm=hashes.SHA1()),
                    algorithm=hashes.SHA1(),
                    label=None,
                ),
            )
        except Exception:
            self._send(conn, _err_payload(1045, "RSA decrypt failed"), bseq + 1)
            return False
        if _xor(plain, scramble.encode()) != expected:
            self._send(conn, _err_payload(1045, "Access denied"), bseq + 1)
            return False
        self._send(conn, OK_PAYLOAD, bseq + 1)
        return True

    def _command_loop(self, conn: socket.socket) -> None:
        while True:
            payload, _ = _read_packet(conn)
            if not payload:
                continue
            cmd = payload[0]
            if cmd == COM_QUERY:
                self._handle_query(conn, payload[1:].decode())
            elif cmd == COM_REGISTER_SLAVE:
                self._send(conn, OK_PAYLOAD, 1)
            elif cmd in (COM_BINLOG_DUMP, COM_BINLOG_DUMP_GTID):
                self._handle_dump(conn, payload)
                return  # a real dump holds the connection; fake EOFs + closes
            else:
                self._send(conn, _err_payload(1047, "unknown command"), 1)

    def _result_set(self, conn: socket.socket, rows: list[list[str]]) -> None:
        ncols = len(rows[0]) if rows else 1
        seq = self._send(conn, bytes([ncols]), 1)
        for _ in range(ncols):
            seq = self._send(conn, b"\x03def", seq)  # metadata, skipped
        seq = self._send(conn, EOF_PAYLOAD, seq)
        for row in rows:
            body = b"".join(
                bytes([len(c.encode())]) + c.encode() for c in row
            )
            seq = self._send(conn, body, seq)
        self._send(conn, EOF_PAYLOAD, seq)

    def _segments(self) -> list[str]:
        return sorted(os.listdir(self.binlog_dir), key=_segment_sort_key)

    def _handle_query(self, conn: socket.socket, sql: str) -> None:
        low = sql.strip().lower()
        if low.startswith("select @master_binlog_checksum"):
            self._result_set(conn, [[self.checksum_text]])
        elif low == "show master status":
            self._result_set(conn, [[self._segments()[0], "4"]])
        else:  # SET statements and friends
            self._send(conn, OK_PAYLOAD, 1)

    def _handle_dump(self, conn: socket.socket, payload: bytes) -> None:
        if payload[0] == COM_BINLOG_DUMP:
            pos = struct.unpack_from("<I", payload, 1)[0]
            filename = payload[11:].decode() or self._segments()[0]
        else:  # GTID dump carries the name length-prefixed after flags+sid
            name_len = struct.unpack_from("<I", payload, 7)[0]
            filename = payload[11 : 11 + name_len].decode() or self._segments()[0]
            pos = struct.unpack_from("<Q", payload, 11 + name_len)[0]
        names = [
            n for n in self._segments()
            if _segment_sort_key(n) >= _segment_sort_key(filename)
        ]
        checksum = (
            ChecksumType.CRC32
            if self.checksum_text == "CRC32"
            else ChecksumType.NONE
        )
        with self._fail_lock:
            fail_after = (
                self.fail_after_frames.pop(0)
                if self.fail_after_frames
                else None
            )
        # real server shape: ONE fake rotate naming the start file, then
        # each file's frames verbatim — the files' own trailing ROTATE
        # events chain to the next segment. A dump from pos > 4 re-sends
        # the start file's FORMAT_DESCRIPTION first, then seeks to pos
        # (what mysqld's binlog sender does for a mid-file start).
        seq = 1
        sent = 0
        if names:
            seq = self._send(
                conn, b"\x00" + rotate_frame(names[0], checksum), seq
            )
        for i, name in enumerate(names):
            with open(os.path.join(self.binlog_dir, name), "rb") as f:
                content = f.read()
            frames = split_segment_frames(content)
            if i == 0 and pos > 4 and frames:
                fde_pos, fde = frames[0]
                if fde_pos + len(fde) <= pos:
                    seq = self._send(conn, b"\x00" + fde, seq)
                frames = [(p, fr) for p, fr in frames if p >= pos]
            for _pos, frame in frames:
                if fail_after is not None and sent >= fail_after:
                    conn.close()  # injected mid-stream connection loss
                    return
                seq = self._send(conn, b"\x00" + frame, seq)
                sent += 1
        self._send(conn, EOF_PAYLOAD, seq)
