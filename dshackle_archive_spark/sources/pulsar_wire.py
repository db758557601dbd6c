"""Pulsar binary-protocol producer — stdlib only (S16: the reference's own
notification sink, ``notify/pulsar.rs:30-68``, at the protocol level).

The reference produces each notification JSON to a Pulsar topic through the
Pulsar client library. No such library ships in this container, but the
protocol is public (the Pulsar binary protocol spec + ``PulsarApi.proto``),
and the engine already carries a stdlib protobuf wire codec
(``dshackle.py``), so the producer half is implemented directly:

- framing: ``[totalSize u32][commandSize u32][BaseCommand]`` for simple
  commands; SEND adds ``[0x0e01][CRC32C][metadataSize u32][MessageMetadata]
  [payload]`` where the Castagnoli checksum covers metadataSize through
  payload (verified by the test broker exactly as a real broker would);
- handshake: CONNECT → CONNECTED, PRODUCER → PRODUCER_SUCCESS (broker may
  assign the producer name), SEND → SEND_RECEIPT, PING answered with PONG;
- field numbers follow ``PulsarApi.proto`` (BaseCommand.type enum values
  double as its field numbers for the command payloads used here).

Scope: the producer path only (what the reference uses), acks per message,
one producer per Spark partition — see
``notify.send_notifications(fmt="pulsar-wire")``.
"""

from __future__ import annotations

import socket
import struct
import time

from .dshackle import _field_bytes, _field_varint, pb_decode

# BaseCommand.Type values (= BaseCommand field numbers for these commands)
CONNECT, CONNECTED = 2, 3
PRODUCER, SEND, SEND_RECEIPT, SEND_ERROR = 5, 6, 7, 8
SUCCESS, ERROR, CLOSE_PRODUCER = 13, 14, 15
PRODUCER_SUCCESS, PING, PONG = 17, 18, 19

MAGIC_CRC32C = b"\x0e\x01"
PROTOCOL_VERSION = 15


class PulsarWireError(RuntimeError):
    pass


# -- CRC32C (Castagnoli, reflected 0x1EDC6F41) -------------------------------

def _crc32c_table() -> list[int]:
    poly = 0x82F63B78
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# -- command encoding --------------------------------------------------------

def _base_command(cmd_type: int, payload_field: int | None = None,
                  payload: bytes = b"") -> bytes:
    body = _field_varint(1, cmd_type)
    if payload_field is not None:
        body += _field_bytes(payload_field, payload)
    return body


def encode_connect(client_version: str = "dshackle-archive-spark") -> bytes:
    c = _field_bytes(1, client_version.encode()) + _field_varint(4, PROTOCOL_VERSION)
    return _base_command(CONNECT, CONNECT, c)


def encode_connected(server_version: str = "stub") -> bytes:
    c = _field_bytes(1, server_version.encode()) + _field_varint(2, PROTOCOL_VERSION)
    return _base_command(CONNECTED, CONNECTED, c)


def encode_producer(topic: str, producer_id: int, request_id: int) -> bytes:
    c = (
        _field_bytes(1, topic.encode())
        + _field_varint(2, producer_id)
        + _field_varint(3, request_id)
    )
    return _base_command(PRODUCER, PRODUCER, c)


def encode_producer_success(request_id: int, producer_name: str) -> bytes:
    c = _field_varint(1, request_id) + _field_bytes(2, producer_name.encode())
    return _base_command(PRODUCER_SUCCESS, PRODUCER_SUCCESS, c)


def encode_send(producer_id: int, sequence_id: int) -> bytes:
    c = _field_varint(1, producer_id) + _field_varint(2, sequence_id)
    return _base_command(SEND, SEND, c)


def encode_send_receipt(producer_id: int, sequence_id: int,
                        ledger_id: int, entry_id: int) -> bytes:
    mid = _field_varint(1, ledger_id) + _field_varint(2, entry_id)
    c = (
        _field_varint(1, producer_id)
        + _field_varint(2, sequence_id)
        + _field_bytes(3, mid)
    )
    return _base_command(SEND_RECEIPT, SEND_RECEIPT, c)


def encode_metadata(producer_name: str, sequence_id: int,
                    publish_time_ms: int) -> bytes:
    return (
        _field_bytes(1, producer_name.encode())
        + _field_varint(2, sequence_id)
        + _field_varint(3, publish_time_ms)
    )


def encode_ping() -> bytes:
    return _base_command(PING, PING, b"")


def encode_pong() -> bytes:
    return _base_command(PONG, PONG, b"")


# -- framing -----------------------------------------------------------------

def write_command(f, command: bytes) -> None:
    f.write(struct.pack(">II", 4 + len(command), len(command)) + command)
    f.flush()


def write_message(f, command: bytes, metadata: bytes, payload: bytes) -> None:
    """SEND frame: command + magic + CRC32C(metadataSize..payload) + body."""
    body = struct.pack(">I", len(metadata)) + metadata + payload
    checksummed = MAGIC_CRC32C + struct.pack(">I", crc32c(body)) + body
    total = 4 + len(command) + len(checksummed)
    f.write(struct.pack(">II", total, len(command)) + command + checksummed)
    f.flush()


def read_command(f) -> tuple[int, dict, bytes] | None:
    """One frame → (command_type, decoded BaseCommand fields, message_tail)
    where message_tail is the raw bytes after the command (SEND frames);
    None on EOF. The tail's checksum is verified when present."""
    hdr = f.read(8)
    if len(hdr) < 8:
        return None
    total, cmd_size = struct.unpack(">II", hdr)
    rest = f.read(total - 4)
    if len(rest) < total - 4:
        return None
    cmd = pb_decode(rest[:cmd_size])
    cmd_type = (cmd.get(1) or [0])[0]
    tail = rest[cmd_size:]
    if tail:
        if tail[:2] != MAGIC_CRC32C:
            raise PulsarWireError("missing CRC32C magic in message frame")
        want = struct.unpack(">I", tail[2:6])[0]
        if crc32c(tail[6:]) != want:
            raise PulsarWireError("CRC32C mismatch")
        tail = tail[6:]
    return cmd_type, cmd, tail


def split_message_tail(tail: bytes) -> tuple[dict, bytes]:
    """checksummed body → (decoded MessageMetadata fields, payload)."""
    md_size = struct.unpack(">I", tail[:4])[0]
    return pb_decode(tail[4 : 4 + md_size]), tail[4 + md_size :]


class PulsarWireProducer:
    """CONNECT → PRODUCER → SEND/RECEIPT producer on one connection.

    Picklable into Spark tasks (socket shed; handshake redone lazily);
    intended topology is one producer per partition, like the reference's
    single producer per process (``pulsar.rs:30-45``)."""

    def __init__(self, service_url: str, topic: str,
                 producer_id: int = 1, timeout_s: float = 10.0):
        target = service_url
        for prefix in ("pulsar://", "pulsar+ssl://"):
            if target.startswith(prefix):
                target = target[len(prefix):]
        host, _, port = target.partition(":")
        self.host, self.port = host, int(port or 6650)
        self.topic = topic
        self.producer_id = producer_id
        self.timeout_s = timeout_s
        self.producer_name: str | None = None
        self._seq = 0
        self._request = 0
        self._sock = None
        self._file = None

    def __getstate__(self):
        st = self.__dict__.copy()
        st["_sock"] = st["_file"] = None
        st["producer_name"] = None
        return st

    def _await(self, *types: int):
        """Read until one of ``types`` arrives; PINGs answered inline."""
        while True:
            fr = read_command(self._file)
            if fr is None:
                raise PulsarWireError("connection closed")
            cmd_type, cmd, _ = fr
            if cmd_type == PING:
                write_command(self._file, encode_pong())
                continue
            if cmd_type == ERROR:
                err = pb_decode((cmd.get(ERROR) or [b""])[0])
                msg = bytes((err.get(3) or [b""])[0]).decode()
                raise PulsarWireError(f"broker error: {msg}")
            if cmd_type in types:
                return cmd_type, cmd

    def _connect(self):
        if self._sock is None:
            self._sock = socket.create_connection(
                (self.host, self.port), timeout=self.timeout_s
            )
            self._file = self._sock.makefile("rwb")
            write_command(self._file, encode_connect())
            self._await(CONNECTED)
            self._request += 1
            write_command(
                self._file,
                encode_producer(self.topic, self.producer_id, self._request),
            )
            _, cmd = self._await(PRODUCER_SUCCESS)
            ps = pb_decode((cmd.get(PRODUCER_SUCCESS) or [b""])[0])
            self.producer_name = bytes((ps.get(2) or [b""])[0]).decode() or (
                f"producer-{self.producer_id}"
            )
        return self._file

    def close(self):
        if self._sock is not None:
            try:
                self._file.close()
                self._sock.close()
            except OSError:
                pass
            self._sock = self._file = None

    def send(self, payload: bytes) -> tuple[int, int]:
        """Produce one message; returns the receipt's (ledger_id, entry_id)."""
        f = self._connect()
        seq = self._seq
        self._seq += 1
        md = encode_metadata(self.producer_name, seq, int(time.time() * 1000))
        write_message(f, encode_send(self.producer_id, seq), md, payload)
        _, cmd = self._await(SEND_RECEIPT)
        rc = pb_decode((cmd.get(SEND_RECEIPT) or [b""])[0])
        got_seq = (rc.get(2) or [0])[0]
        if got_seq != seq:
            raise PulsarWireError(f"receipt for wrong sequence {got_seq} != {seq}")
        mid = pb_decode((rc.get(3) or [b""])[0])
        return (mid.get(1) or [0])[0], (mid.get(2) or [0])[0]
