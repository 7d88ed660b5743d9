"""Connection negotiation (configure.rs / providers/*_provider.rs) as
pure functions: the exact command sequences a live replication session
writes, and the result-set stream reader — composable with any transport
(``wire.write_packets`` frames them; tests feed byte streams directly).
No socket is opened in this engine; these complete the protocol logic so
a deployment only supplies the channel.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .wire import (
    RESPONSE_END_OF_FILE,
    check_error_packet,
    encode_dump_binlog_command,
    encode_dump_binlog_gtid_command,
    encode_query_command,
    encode_register_slave_command,
    parse_result_set_row,
)


@dataclass
class ReplicaOptions:
    """Mirror of replica_options.rs (the fields the negotiation uses).
    ``server_id=0`` requests a non-blocking dump that EOFs at the end of
    the stream (ST6; replica_options.rs:31-33)."""

    username: str = ""
    password: str = ""
    database: Optional[str] = None
    server_id: int = 65535
    heartbeat_interval_s: float = 30.0
    blocking: bool = True

    def effective_server_id(self) -> int:
        return self.server_id if self.blocking else 0


def heartbeat_command(interval_s: float) -> bytes:
    """``set @master_heartbeat_period=<ns>`` — configure.rs:37-44
    (interval milliseconds × 10^6 → nanoseconds)."""
    nanoseconds = int(interval_s * 1000) * 1000 * 1000
    return encode_query_command(f"set @master_heartbeat_period={nanoseconds}")


def checksum_negotiation_commands() -> list[bytes]:
    """The two statements that negotiate CRC32 before the fake
    RotateEvent arrives — configure.rs:48-65."""
    return [
        encode_query_command(
            "SET @master_binlog_checksum= @@global.binlog_checksum"
        ),
        encode_query_command("SELECT @master_binlog_checksum"),
    ]


def master_status_command() -> bytes:
    """``show master status`` — FromEnd position resolution
    (configure.rs:22-34)."""
    return encode_query_command("show master status")


def resolve_master_status(rows: list[list[str]]) -> tuple[str, int]:
    """First result row → (filename, position); configure.rs:26-34."""
    if len(rows) != 1:
        raise ValueError("Could not read master binlog position.")
    return rows[0][0], int(rows[0][1])


def mysql_dump_commands(
    options: ReplicaOptions,
    filename: str,
    position: int,
    gtid_set=None,
) -> list[bytes]:
    """MySQL provider dispatch (mysql_provider.rs:8-33): FromGtid sends
    COM_BINLOG_DUMP_GTID with the GtidSet payload, everything else a
    plain COM_BINLOG_DUMP."""
    sid = options.effective_server_id()
    if gtid_set is not None:
        return [
            encode_dump_binlog_gtid_command(sid, filename, position, gtid_set)
        ]
    return [encode_dump_binlog_command(sid, filename, position)]


def mariadb_dump_commands(
    options: ReplicaOptions,
    filename: str,
    position: int,
    gtid_list_text: Optional[str] = None,
) -> list[bytes]:
    """MariaDB provider dispatch (mariadb_provider.rs:10-62): capability
    statement, then for FromGtid the @slave_connect_state registration
    quartet, then the plain dump command."""
    out = [encode_query_command("SET @mariadb_slave_capability=4")]
    if gtid_list_text is not None:
        out += [
            encode_query_command(
                f"SET @slave_connect_state='{gtid_list_text}'"
            ),
            encode_query_command("SET @slave_gtid_strict_mode=0"),
            encode_query_command("SET @slave_gtid_ignore_duplicates=0"),
            encode_register_slave_command(options.server_id),
        ]
    out.append(
        encode_dump_binlog_command(
            options.effective_server_id(), filename, position
        )
    )
    return out


def read_result_set(payloads) -> list[list[str]]:
    """Text-protocol result set from a sequence of packet payloads (the
    output of ``wire.split_packets``): column-count packet, metadata
    packets until EOF, then rows until EOF — configure.rs:68-93."""
    it = iter(payloads)
    first = next(it, None)
    if first is None:
        raise ValueError("Reading result set error: empty packet stream")
    check_error_packet(first, "Reading result set error.")
    for pkt in it:  # skip column metadata
        if pkt and pkt[0] == RESPONSE_END_OF_FILE:
            break
    rows: list[list[str]] = []
    for pkt in it:
        check_error_packet(pkt, "Query result set error.")
        if pkt and pkt[0] == RESPONSE_END_OF_FILE:
            break
        rows.append(parse_result_set_row(pkt))
    return rows
