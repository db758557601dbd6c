"""Kafka wire-protocol producer — stdlib only (S16 hardening).

``notify.py`` shapes notification payloads for the Kafka/Pulsar connector
jars, but no connector ships in this container, so rounds ≤4 proved the
round-trip over a JSONL socket broker instead. This module closes the
protocol gap with a real Kafka producer speaking the public binary protocol
(the Apache Kafka protocol guide; the legacy v0 ProduceRequest, which every
broker still accepts):

- request framing: INT32 size + header (api_key INT16, api_version INT16,
  correlation_id INT32, client_id NULLABLE_STRING);
- MessageSet v0: [offset INT64, size INT32, message] where message =
  CRC32 (zlib polynomial, over magic..value) + magic=0 + attributes=0 +
  key BYTES + value BYTES — the CRC makes corruption detectable and is
  verified by the test broker exactly as a real broker would;
- ProduceResponse v0: per-partition error_code + base_offset.

One producer connection per Spark partition (the same produce topology as
the connector jars — see ``notify.send_notifications(fmt="kafka-wire")``).

Modern protocol (round 6): the producer now opens with ApiVersions
negotiation (api_key 18) and, when the broker advertises Produce >= v3,
sends RecordBatch v2 — magic 2, CRC32C (Castagnoli, computed here
table-driven — stdlib zlib only has the IEEE polynomial) over
attributes..records, zigzag-varint record encoding, producerId -1
(non-transactional, non-idempotent) — inside ProduceRequest v3. Brokers
capped below v3 fall back to the self-contained MessageSet v0 path above.
Reference parity: the Pulsar producer loop in ``notify/pulsar.rs:30-68``.
"""

from __future__ import annotations

import socket
import struct
import zlib

# RecordBatch v2 checksums with CRC-32C (Castagnoli) — zlib.crc32 is the
# IEEE polynomial; the Pulsar wire module already carries the table.
from .pulsar_wire import crc32c


class KafkaWireError(RuntimeError):
    pass


# -- primitive encoders ------------------------------------------------------

def _string(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


# -- zigzag varints (RecordBatch v2 record fields) ----------------------------

def encode_varint(value: int) -> bytes:
    z = (value << 1) ^ (value >> 63)  # zigzag, 64-bit
    out = bytearray()
    while z >= 0x80:
        out.append((z & 0x7F) | 0x80)
        z >>= 7
    out.append(z)
    return bytes(out)


def decode_varint(buf: bytes, i: int) -> tuple[int, int]:
    z = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        z |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            break
    return (z >> 1) ^ -(z & 1), i


def encode_message(value: bytes, key: bytes | None = None) -> bytes:
    """One MessageSet-v0 message: CRC32(magic..value) + magic + attrs + k/v."""
    body = struct.pack(">bb", 0, 0) + _bytes(key) + _bytes(value)
    return struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body


def encode_message_set(values: list[bytes]) -> bytes:
    out = bytearray()
    for v in values:
        msg = encode_message(v)
        out += struct.pack(">qi", 0, len(msg)) + msg  # producer offset = 0
    return bytes(out)


def decode_message_set(buf: bytes) -> list[tuple[int, bytes | None, bytes]]:
    """→ [(offset, key, value)]; raises on CRC mismatch (broker behavior)."""
    out = []
    i = 0
    while i + 12 <= len(buf):
        offset, size = struct.unpack(">qi", buf[i : i + 12])
        i += 12
        msg = buf[i : i + size]
        i += size
        crc = struct.unpack(">I", msg[:4])[0]
        if zlib.crc32(msg[4:]) & 0xFFFFFFFF != crc:
            raise KafkaWireError(f"message CRC mismatch at offset {offset}")
        j = 6  # skip magic, attributes
        klen = struct.unpack(">i", msg[j : j + 4])[0]
        j += 4
        key = None if klen == -1 else msg[j : j + klen]
        j += max(klen, 0)
        vlen = struct.unpack(">i", msg[j : j + 4])[0]
        j += 4
        value = msg[j : j + vlen]
        out.append((offset, key, value))
    return out


# -- RecordBatch v2 (magic 2) -------------------------------------------------

def encode_record(offset_delta: int, value: bytes, key: bytes | None = None,
                  timestamp_delta: int = 0) -> bytes:
    key_part = (
        encode_varint(-1) if key is None else encode_varint(len(key)) + key
    )
    body = (
        b"\x00"  # record attributes (unused)
        + encode_varint(timestamp_delta)
        + encode_varint(offset_delta)
        + key_part
        + encode_varint(len(value)) + value
        + encode_varint(0)  # headers count
    )
    return encode_varint(len(body)) + body


def encode_record_batch(values: list[bytes], base_timestamp: int = 0) -> bytes:
    """One RecordBatch v2: CRC32C over attributes..records, producerId -1
    (plain, non-idempotent), offsets/timestamps as deltas from base 0."""
    records = b"".join(
        encode_record(i, v, timestamp_delta=0) for i, v in enumerate(values)
    )
    after_crc = (
        struct.pack(">h", 0)                    # attributes: no compression
        + struct.pack(">i", len(values) - 1)    # lastOffsetDelta
        + struct.pack(">q", base_timestamp)     # baseTimestamp
        + struct.pack(">q", base_timestamp)     # maxTimestamp
        + struct.pack(">q", -1)                 # producerId
        + struct.pack(">h", -1)                 # producerEpoch
        + struct.pack(">i", -1)                 # baseSequence
        + struct.pack(">i", len(values))
        + records
    )
    batch_tail = (
        struct.pack(">i", 0)                    # partitionLeaderEpoch
        + struct.pack(">b", 2)                  # magic
        + struct.pack(">I", crc32c(after_crc))
        + after_crc
    )
    return struct.pack(">q", 0) + struct.pack(">i", len(batch_tail)) + batch_tail


def decode_record_batch(buf: bytes) -> list[tuple[int, bytes | None, bytes]]:
    """→ [(offset, key, value)]; validates magic=2 and the CRC32C exactly
    as a broker would before accepting the batch."""
    base_offset, batch_len = struct.unpack(">qi", buf[:12])
    body = buf[12 : 12 + batch_len]
    magic = struct.unpack(">b", body[4:5])[0]
    if magic != 2:
        raise KafkaWireError(f"not a v2 record batch (magic={magic})")
    crc = struct.unpack(">I", body[5:9])[0]
    if crc32c(body[9:]) != crc:
        raise KafkaWireError("record batch CRC32C mismatch")
    # after the crc: attributes(2) lastOffsetDelta(4) baseTs(8) maxTs(8)
    # producerId(8) producerEpoch(2) baseSequence(4) = 36 bytes, then count
    n_records = struct.unpack(">i", body[9 + 36 : 9 + 40])[0]
    records = body[9 + 40 :]
    out = []
    i = 0
    for _ in range(n_records):
        rec_len, i = decode_varint(records, i)
        end = i + rec_len
        j = i + 1  # skip record attributes
        _ts_delta, j = decode_varint(records, j)
        off_delta, j = decode_varint(records, j)
        klen, j = decode_varint(records, j)
        key = None if klen < 0 else records[j : j + klen]
        j += max(klen, 0)
        vlen, j = decode_varint(records, j)
        value = records[j : j + vlen]
        out.append((base_offset + off_delta, key, value))
        i = end
    return out


# -- ApiVersions (api_key 18) --------------------------------------------------

API_PRODUCE, API_VERSIONS = 0, 18


def encode_api_versions_request(correlation_id: int, client_id: str) -> bytes:
    payload = struct.pack(">hhi", API_VERSIONS, 0, correlation_id) + _string(client_id)
    return struct.pack(">i", len(payload)) + payload


def encode_api_versions_response(
    correlation_id: int, versions: dict[int, tuple[int, int]]
) -> bytes:
    payload = struct.pack(">ih", correlation_id, 0) + struct.pack(">i", len(versions))
    for key, (lo, hi) in sorted(versions.items()):
        payload += struct.pack(">hhh", key, lo, hi)
    return struct.pack(">i", len(payload)) + payload


def decode_api_versions_response(payload: bytes) -> tuple[int, dict[int, tuple[int, int]]]:
    correlation_id, error_code = struct.unpack(">ih", payload[:6])
    if error_code != 0:
        raise KafkaWireError(f"ApiVersions error_code={error_code}")
    n = struct.unpack(">i", payload[6:10])[0]
    versions = {}
    i = 10
    for _ in range(n):
        key, lo, hi = struct.unpack(">hhh", payload[i : i + 6])
        versions[key] = (lo, hi)
        i += 6
    return correlation_id, versions


def encode_produce_request(
    correlation_id: int,
    client_id: str,
    topic: str,
    partition: int,
    values: list[bytes],
    acks: int = 1,
    timeout_ms: int = 10_000,
) -> bytes:
    header = struct.pack(">hhi", 0, 0, correlation_id) + _string(client_id)
    msg_set = encode_message_set(values)
    body = (
        struct.pack(">hi", acks, timeout_ms)
        + struct.pack(">i", 1)  # one topic
        + _string(topic)
        + struct.pack(">i", 1)  # one partition
        + struct.pack(">i", partition)
        + _bytes(msg_set)
    )
    payload = header + body
    return struct.pack(">i", len(payload)) + payload


def encode_produce_request_v3(
    correlation_id: int,
    client_id: str,
    topic: str,
    partition: int,
    values: list[bytes],
    acks: int = 1,
    timeout_ms: int = 10_000,
) -> bytes:
    """ProduceRequest v3 (first version carrying RecordBatch v2):
    transactional_id (null — plain producer), then acks/timeout/topics."""
    header = struct.pack(">hhi", API_PRODUCE, 3, correlation_id) + _string(client_id)
    batch = encode_record_batch(values)
    body = (
        _string(None)  # transactional_id
        + struct.pack(">hi", acks, timeout_ms)
        + struct.pack(">i", 1)
        + _string(topic)
        + struct.pack(">i", 1)
        + struct.pack(">i", partition)
        + _bytes(batch)
    )
    payload = header + body
    return struct.pack(">i", len(payload)) + payload


def decode_produce_request(payload: bytes):
    """→ (correlation_id, client_id, topic, partition, record_bytes,
    api_version) — the broker side of the wire format (used by the test
    broker). v0 record_bytes is a MessageSet; v3 is a RecordBatch v2
    (v3 additionally carries a transactional_id before acks)."""
    api_key, api_version, correlation_id = struct.unpack(">hhi", payload[:8])
    if api_key != API_PRODUCE:
        raise KafkaWireError(f"not a ProduceRequest (api_key={api_key})")
    if api_version not in (0, 3):
        raise KafkaWireError(f"unsupported ProduceRequest v{api_version}")
    i = 8
    cl_len = struct.unpack(">h", payload[i : i + 2])[0]
    i += 2
    client_id = payload[i : i + cl_len].decode() if cl_len >= 0 else None
    i += max(cl_len, 0)
    if api_version >= 3:  # transactional_id
        tx_len = struct.unpack(">h", payload[i : i + 2])[0]
        i += 2 + max(tx_len, 0)
    _acks, _timeout = struct.unpack(">hi", payload[i : i + 6])
    i += 6
    n_topics = struct.unpack(">i", payload[i : i + 4])[0]
    i += 4
    if n_topics != 1:
        raise KafkaWireError("stub expects exactly one topic per request")
    t_len = struct.unpack(">h", payload[i : i + 2])[0]
    i += 2
    topic = payload[i : i + t_len].decode()
    i += t_len
    _n_parts = struct.unpack(">i", payload[i : i + 4])[0]
    i += 4
    partition = struct.unpack(">i", payload[i : i + 4])[0]
    i += 4
    ms_len = struct.unpack(">i", payload[i : i + 4])[0]
    i += 4
    msg_set = payload[i : i + ms_len]
    return correlation_id, client_id, topic, partition, msg_set, api_version


def encode_produce_response(
    correlation_id: int, topic: str, partition: int, error_code: int, base_offset: int
) -> bytes:
    payload = (
        struct.pack(">i", correlation_id)
        + struct.pack(">i", 1)
        + _string(topic)
        + struct.pack(">i", 1)
        + struct.pack(">ihq", partition, error_code, base_offset)
    )
    return struct.pack(">i", len(payload)) + payload


def decode_produce_response(payload: bytes) -> tuple[int, str, int, int, int]:
    correlation_id = struct.unpack(">i", payload[:4])[0]
    i = 8  # + one-topic array count
    t_len = struct.unpack(">h", payload[i : i + 2])[0]
    i += 2
    topic = payload[i : i + t_len].decode()
    i += t_len + 4  # + one-partition array count
    partition, error_code, base_offset = struct.unpack(">ihq", payload[i : i + 14])
    return correlation_id, topic, partition, error_code, base_offset


def encode_produce_response_v3(
    correlation_id: int, topic: str, partition: int, error_code: int, base_offset: int
) -> bytes:
    """v3 adds per-partition log_append_time and a trailing throttle_time."""
    payload = (
        struct.pack(">i", correlation_id)
        + struct.pack(">i", 1)
        + _string(topic)
        + struct.pack(">i", 1)
        + struct.pack(">ihqq", partition, error_code, base_offset, -1)
        + struct.pack(">i", 0)  # throttle_time_ms
    )
    return struct.pack(">i", len(payload)) + payload


def decode_produce_response_v3(payload: bytes) -> tuple[int, str, int, int, int]:
    correlation_id = struct.unpack(">i", payload[:4])[0]
    i = 8
    t_len = struct.unpack(">h", payload[i : i + 2])[0]
    i += 2
    topic = payload[i : i + t_len].decode()
    i += t_len + 4
    partition, error_code, base_offset, _log_ts = struct.unpack(
        ">ihqq", payload[i : i + 22]
    )
    return correlation_id, topic, partition, error_code, base_offset


def _read_exact(f, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = f.read(n - len(buf))
        if not chunk:
            raise KafkaWireError("connection closed mid-frame")
        buf += chunk
    return buf


def read_framed(f) -> bytes | None:
    hdr = f.read(4)
    if len(hdr) < 4:
        return None
    return _read_exact(f, struct.unpack(">i", hdr)[0])


class KafkaWireProducer:
    """Minimal acks=1 producer: one connection, sequential correlation ids.

    Picklable into Spark tasks (socket shed on pickle, reopened lazily) —
    but the intended topology is one producer PER PARTITION inside
    ``foreachPartition``, mirroring the connector jars."""

    def __init__(self, bootstrap: str, topic: str, partition: int = 0,
                 client_id: str = "dshackle-archive", timeout_s: float = 10.0):
        host, _, port = bootstrap.partition(":")
        self.host, self.port = host, int(port or 9092)
        self.topic, self.partition = topic, partition
        self.client_id, self.timeout_s = client_id, timeout_s
        self._corr = 0
        self._sock = None
        self._file = None
        self._produce_version: int | None = None

    def __getstate__(self):
        st = self.__dict__.copy()
        st["_sock"] = st["_file"] = None
        st["_produce_version"] = None  # renegotiate per connection
        return st

    def _connect(self):
        if self._sock is None:
            self._sock = socket.create_connection(
                (self.host, self.port), timeout=self.timeout_s
            )
            self._file = self._sock.makefile("rwb")
            self._negotiate()
        return self._file

    def _negotiate(self) -> None:
        """ApiVersions handshake: pick ProduceRequest v3 (RecordBatch v2)
        when the broker supports it, else the legacy v0 MessageSet. A
        broker so old it drops the ApiVersions request entirely (pre-0.10)
        closes the connection — treated as v0, matching real clients."""
        self._corr += 1
        f = self._file
        f.write(encode_api_versions_request(self._corr, self.client_id))
        f.flush()
        try:
            resp = read_framed(f)
        except KafkaWireError:
            resp = None
        if resp is None:
            # reconnect: the peer hung up on the unknown request
            self._sock = socket.create_connection(
                (self.host, self.port), timeout=self.timeout_s
            )
            self._file = self._sock.makefile("rwb")
            self._produce_version = 0
            return
        corr, versions = decode_api_versions_response(resp)
        if corr != self._corr:
            raise KafkaWireError(f"correlation mismatch {corr} != {self._corr}")
        lo, hi = versions.get(API_PRODUCE, (0, 0))
        self._produce_version = 3 if hi >= 3 and lo <= 3 else 0

    def close(self):
        if self._sock is not None:
            try:
                self._file.close()
                self._sock.close()
            except OSError:
                pass
            self._sock = self._file = None

    def produce(self, values: list[bytes]) -> int:
        """Send one batch; returns the broker-assigned base offset."""
        if not values:
            return -1
        f = self._connect()
        self._corr += 1
        if self._produce_version == 3:
            req = encode_produce_request_v3(
                self._corr, self.client_id, self.topic, self.partition, values
            )
        else:
            req = encode_produce_request(
                self._corr, self.client_id, self.topic, self.partition, values
            )
        f.write(req)
        f.flush()
        resp = read_framed(f)
        if resp is None:
            raise KafkaWireError("broker closed connection")
        dec = (
            decode_produce_response_v3
            if self._produce_version == 3
            else decode_produce_response
        )
        corr, topic, _part, error_code, base_offset = dec(resp)
        if corr != self._corr:
            raise KafkaWireError(f"correlation mismatch {corr} != {self._corr}")
        if error_code != 0:
            raise KafkaWireError(f"produce failed: error_code={error_code}")
        return base_offset
