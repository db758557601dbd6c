"""S16: notification payloads through a real broker socket — archive →
produce → consume, batch and streaming, matching the reference's
Notification JSON (notify/mod.rs:12-56) field order and maturity values."""

import json
import time

from pyspark.sql import functions as F

from dshackle_archive_spark.core import DataKind, Range
from dshackle_archive_spark.plans.archive_plan import archive, archive_single_blocks
from dshackle_archive_spark.sources.fetcher import FetchPolicy
from dshackle_archive_spark.sources.mock_chain import MockChain
from dshackle_archive_spark.sources.notify import (
    notification_json_df,
    send_notifications,
    stream_notifications,
)

from stub_broker import start_broker

BT = (DataKind.BLOCKS, DataKind.TRANSACTIONS)
POLICY = FetchPolicy(parallel=4)
CHAIN = MockChain(head_height=10_000)

REF_FIELDS = ["version", "ts", "blockchain", "type", "run",
              "heightStart", "heightEnd", "location", "maturity"]


def _wr(res):
    return res.notifications.withColumn("skipped", F.lit(False)).withColumn(
        "n_rows", F.lit(0)
    )


def test_batch_produce_consume_roundtrip(spark, tmp_path):
    """archive → socket producer (per-partition, executor-side) → broker →
    consumed messages are exactly the write-result payloads."""
    host, port, srv = start_broker()
    try:
        res = archive(spark, CHAIN, str(tmp_path), Range(100, 299), tables=BT,
                      chunk=100, policy=POLICY, run="archive")
        wr = _wr(res)
        expected = sorted(r["value"] for r in notification_json_df(wr).collect())
        send_notifications(wr, "socket", host=host, port=port)
        deadline = time.time() + 10
        while time.time() < deadline and len(srv.messages) < len(expected):
            time.sleep(0.05)
        assert sorted(srv.messages) == expected  # byte-equal payloads
        docs = [json.loads(m) for m in srv.messages]
        assert all(list(d) == REF_FIELDS for d in docs)  # serde field order
        assert {(d["heightStart"], d["heightEnd"]) for d in docs} == {
            (100, 199), (200, 299)
        }
    finally:
        srv.shutdown()


def test_streaming_produce_consume_roundtrip(spark, tmp_path):
    """archive → JSONL notification dir → file-stream source → socket sink →
    broker: the full streaming delivery cycle with checkpointing."""
    from dshackle_archive_spark.sources import ref_layout

    host, port, srv = start_broker()
    try:
        res = archive(spark, CHAIN, str(tmp_path), Range(100, 299), tables=BT,
                      chunk=100, policy=POLICY, run="archive")
        wr = _wr(res)
        out_dir = ref_layout.write_notifications(wr, str(tmp_path), "run1")
        expected = sorted(r["value"] for r in notification_json_df(wr).collect())

        stream = spark.readStream.schema(
            ref_layout.notifications_df(wr).schema
        ).json(out_dir)
        q = stream_notifications(stream, "socket", str(tmp_path / "_bckpt"),
                                 host=host, port=port)
        try:
            deadline = time.time() + 30
            while time.time() < deadline and len(srv.messages) < len(expected):
                time.sleep(0.2)
        finally:
            q.stop()
        got = [json.loads(m) for m in sorted(srv.messages)]
        want = [json.loads(v) for v in expected]
        # the JSONL hop truncates ts to millis (Spark json writer default);
        # everything else must match exactly
        for d in got + want:
            d["ts"] = d["ts"][:23]
        assert sorted(got, key=str) == sorted(want, key=str)
        assert all(list(d) == REF_FIELDS for d in got)
    finally:
        srv.shutdown()


def test_stream_mode_maturity_reaches_consumer(spark, tmp_path):
    """Stream-archived files carry maturity (head/finalized) through to the
    consumed message (notify/mod.rs maturity values)."""
    host, port, srv = start_broker()
    try:
        res = archive_single_blocks(spark, CHAIN, str(tmp_path), Range(500, 502),
                                    tables=(DataKind.BLOCKS,), policy=POLICY,
                                    run="stream", maturity="finalized")
        send_notifications(_wr(res), "socket", host=host, port=port)
        deadline = time.time() + 10
        while time.time() < deadline and len(srv.messages) < 3:
            time.sleep(0.05)
        docs = [json.loads(m) for m in srv.messages]
        assert len(docs) == 3
        assert all(d["maturity"] == "finalized" and d["run"] == "stream"
                   for d in docs)
        assert all(list(d) == REF_FIELDS for d in docs)
    finally:
        srv.shutdown()


def test_kafka_wire_codec_roundtrips():
    """Produce v0 codec: request/response and the CRC-checked MessageSet."""
    from dshackle_archive_spark.sources import kafka_wire as K

    vals = [b'{"a":1}', b'{"b":2}', b"x" * 1000]
    ms = K.encode_message_set(vals)
    decoded = K.decode_message_set(ms)
    assert [v for _o, _k, v in decoded] == vals

    req = K.encode_produce_request(7, "cid", "notif", 3, vals)
    corr, cid, topic, part, ms2, ver = K.decode_produce_request(req[4:])
    assert (corr, cid, topic, part, ver) == (7, "cid", "notif", 3, 0)
    assert [v for _o, _k, v in K.decode_message_set(ms2)] == vals

    resp = K.encode_produce_response(7, "notif", 3, 0, 41)
    assert K.decode_produce_response(resp[4:]) == (7, "notif", 3, 0, 41)

    # corruption is detected by the checksum, like a real broker
    corrupted = bytearray(ms)
    corrupted[-1] ^= 0xFF
    import pytest as _pytest

    with _pytest.raises(K.KafkaWireError, match="CRC"):
        K.decode_message_set(bytes(corrupted))


def test_kafka_record_batch_v2_byte_exact():
    """RecordBatch v2 structure pinned field-by-field: magic 2, CRC32C over
    attributes..records, zigzag varint record fields — then the codec
    round-trip and broker-style corruption detection."""
    import struct

    from dshackle_archive_spark.sources import kafka_wire as K

    # zigzag varints (protobuf/Kafka shared encoding)
    for n, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                 (150, b"\xac\x02")]:
        assert K.encode_varint(n) == b
        assert K.decode_varint(b, 0) == (n, len(b))

    vals = [b'{"a":1}', b'{"b":2}']
    batch = K.encode_record_batch(vals)
    base_offset, batch_len = struct.unpack(">qi", batch[:12])
    assert base_offset == 0 and batch_len == len(batch) - 12
    body = batch[12:]
    assert struct.unpack(">i", body[:4])[0] == 0          # partitionLeaderEpoch
    assert body[4] == 2                                   # magic
    crc = struct.unpack(">I", body[5:9])[0]
    assert K.crc32c(body[9:]) == crc                      # CRC32C coverage
    attrs, last_delta = struct.unpack(">hi", body[9:15])
    assert attrs == 0 and last_delta == len(vals) - 1
    pid, pepoch, bseq, nrec = struct.unpack(">qhii", body[31:49])
    assert (pid, pepoch, bseq) == (-1, -1, -1)            # non-transactional
    assert nrec == len(vals)

    assert [(o, v) for o, _k, v in K.decode_record_batch(batch)] == [
        (0, vals[0]), (1, vals[1])
    ]
    import pytest

    corrupted = bytearray(batch)
    corrupted[-1] ^= 0xFF
    with pytest.raises(K.KafkaWireError, match="CRC32C"):
        K.decode_record_batch(bytes(corrupted))

    # ProduceRequest v3 carries the batch intact (transactional_id null)
    req = K.encode_produce_request_v3(9, "cid", "notif", 1, vals)
    corr, cid, topic, part, records, ver = K.decode_produce_request(req[4:])
    assert (corr, cid, topic, part, ver) == (9, "cid", "notif", 1, 3)
    assert records == batch


def test_kafka_v2_codec_property_roundtrip():
    """Hypothesis: any payload batch survives RecordBatch v2 encode→decode
    with dense offsets, and any 64-bit int survives the zigzag varint."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dshackle_archive_spark.sources import kafka_wire as K

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.binary(max_size=300), min_size=1, max_size=20))
    def batch_roundtrip(values):
        got = K.decode_record_batch(K.encode_record_batch(values))
        assert [(o, v) for o, _k, v in got] == list(enumerate(values))

    @settings(max_examples=300, deadline=None)
    @given(st.integers(-(2**62), 2**62))
    def varint_roundtrip(n):
        data = K.encode_varint(n)
        got, used = K.decode_varint(data, 0)
        assert got == n and used == len(data)

    batch_roundtrip()
    varint_roundtrip()


def test_kafka_api_versions_negotiation():
    """Modern broker → ApiVersions handshake picks Produce v3 and the stub
    verifies a v2 batch byte-exactly; legacy broker (max v0) → the same
    producer falls back to MessageSet v0. Offsets stay dense either way."""
    from dshackle_archive_spark.sources.kafka_wire import KafkaWireProducer
    from stub_kafka import start_kafka_stub

    bootstrap, srv = start_kafka_stub()
    try:
        p = KafkaWireProducer(bootstrap, "t")
        assert p.produce([b"m1", b"m2"]) == 0
        assert p._produce_version == 3
        assert p.produce([b"m3"]) == 2
        p.close()
        assert srv.batches == 2  # both sends went through RecordBatch v2
        assert [v for _o, v in srv.log[("t", 0)]] == [b"m1", b"m2", b"m3"]
    finally:
        srv.shutdown()

    bootstrap, srv = start_kafka_stub(legacy_only=True)
    try:
        p = KafkaWireProducer(bootstrap, "t")
        assert p.produce([b"m1"]) == 0
        assert p._produce_version == 0
        p.close()
        assert srv.batches == 0  # legacy path: MessageSet v0
        assert [v for _o, v in srv.log[("t", 0)]] == [b"m1"]
    finally:
        srv.shutdown()


def test_kafka_wire_produce_roundtrip(spark, tmp_path):
    """archive → Kafka binary-protocol producer (per-partition) → stub
    broker (CRC-verifying) → offsets assigned, payloads byte-equal."""
    from stub_kafka import start_kafka_stub

    bootstrap, srv = start_kafka_stub()
    try:
        res = archive(spark, CHAIN, str(tmp_path), Range(100, 299), tables=BT,
                      chunk=100, policy=POLICY, run="archive")
        wr = _wr(res)
        expected = sorted(r["value"] for r in notification_json_df(wr).collect())
        send_notifications(wr, "kafka-wire", bootstrap=bootstrap, topic="notif")
        got = sorted(
            v.decode()
            for (topic, _p), entries in srv.log.items()
            for (_off, v) in entries
            if topic == "notif"
        )
        assert got == expected  # byte-equal payloads through the wire
        # offsets are broker-assigned and dense per partition
        for (_t, _p), entries in srv.log.items():
            assert [o for o, _v in entries] == list(range(len(entries)))
    finally:
        srv.shutdown()


def test_kafka_wire_producer_api(tmp_path):
    """Direct producer surface: sequential correlation ids, base offsets
    advance across batches, picklable into tasks."""
    import pickle

    from dshackle_archive_spark.sources.kafka_wire import KafkaWireProducer
    from stub_kafka import start_kafka_stub

    bootstrap, srv = start_kafka_stub()
    try:
        p = KafkaWireProducer(bootstrap, "t")
        assert p.produce([b"m1", b"m2"]) == 0
        assert p.produce([b"m3"]) == 2
        p2 = pickle.loads(pickle.dumps(p))
        assert p2.produce([b"m4"]) == 3
        p.close(); p2.close()
        assert [v for _o, v in srv.log[("t", 0)]] == [b"m1", b"m2", b"m3", b"m4"]
    finally:
        srv.shutdown()


def test_pulsar_wire_crc32c_and_codec():
    """CRC32C check vector + command/message codec roundtrips."""
    from dshackle_archive_spark.sources import pulsar_wire as P

    # the Castagnoli check value (RFC 3720 appendix): crc32c("123456789")
    assert P.crc32c(b"123456789") == 0xE3069283

    import io

    class F(io.BytesIO):
        def flush(self):
            pass

    f = F()
    P.write_command(f, P.encode_connect())
    f.seek(0)
    t, cmd, tail = P.read_command(f)
    assert t == P.CONNECT and tail == b""

    f = F()
    md = P.encode_metadata("p1", 7, 123456)
    P.write_message(f, P.encode_send(1, 7), md, b'{"x":1}')
    f.seek(0)
    t, cmd, tail = P.read_command(f)  # verifies the checksum internally
    assert t == P.SEND
    md2, payload = P.split_message_tail(tail)
    assert payload == b'{"x":1}'

    # corrupting one payload byte must fail the CRC like a real broker
    raw = bytearray(f.getvalue())
    raw[-1] ^= 0xFF
    g = F(bytes(raw))
    import pytest as _pytest

    with _pytest.raises(P.PulsarWireError, match="CRC32C"):
        P.read_command(g)


def test_pulsar_wire_produce_roundtrip(spark, tmp_path):
    """archive → Pulsar binary-protocol producer (CONNECT/PRODUCER/SEND
    with per-send receipts) → CRC32C-verifying stub broker."""
    from stub_pulsar import start_pulsar_stub

    service_url, srv = start_pulsar_stub()
    try:
        res = archive(spark, CHAIN, str(tmp_path), Range(100, 299), tables=BT,
                      chunk=100, policy=POLICY, run="archive")
        wr = _wr(res)
        expected = sorted(r["value"] for r in notification_json_df(wr).collect())
        send_notifications(wr, "pulsar-wire", service_url=service_url, topic="notif")
        got = sorted(p.decode() for _e, p in srv.topics.get("notif", []))
        assert got == expected  # byte-equal payloads through the wire
        # entry ids are broker-assigned and dense
        assert [e for e, _p in srv.topics["notif"]] == list(range(len(expected)))
    finally:
        srv.shutdown()


def test_pulsar_wire_producer_api():
    """Direct producer surface: broker-assigned name, receipts advance,
    picklable, PING answered mid-stream."""
    import pickle

    from dshackle_archive_spark.sources.pulsar_wire import PulsarWireProducer
    from stub_pulsar import start_pulsar_stub

    service_url, srv = start_pulsar_stub()
    try:
        p = PulsarWireProducer(service_url, "t")
        assert p.send(b"m1") == (1, 0)
        assert p.send(b"m2") == (1, 1)
        assert p.producer_name == "stub-producer-1"
        p2 = pickle.loads(pickle.dumps(p))
        assert p2.send(b"m3")[1] == 2
        p.close(); p2.close()
        assert [v for _e, v in srv.topics[("t")]] == [b"m1", b"m2", b"m3"]
    finally:
        srv.shutdown()


def test_streaming_kafka_wire_roundtrip(spark, tmp_path):
    """Checkpointed streaming delivery to the Kafka wire-protocol broker:
    micro-batch payloads land byte-equal with dense offsets."""
    import time as _time

    from dshackle_archive_spark.sources import ref_layout
    from dshackle_archive_spark.sources.notify import stream_notifications
    from stub_kafka import start_kafka_stub

    bootstrap, srv = start_kafka_stub()
    try:
        res = archive(spark, CHAIN, str(tmp_path), Range(100, 199), tables=BT,
                      chunk=100, policy=POLICY, run="archive")
        wr = _wr(res)
        expected = sorted(r["value"] for r in notification_json_df(wr).collect())
        wr.write.parquet(str(tmp_path / "wr"))

        src = (
            spark.readStream.schema(ref_layout.WRITE_RESULT_SCHEMA)
            .parquet(str(tmp_path / "wr"))
        )
        q = stream_notifications(
            src, "kafka-wire", str(tmp_path / "_ckpt_kw"),
            bootstrap=bootstrap, topic="stream-notif",
        )
        try:
            deadline = _time.time() + 30
            while _time.time() < deadline:
                got = sorted(
                    v.decode()
                    for (t, _p), entries in srv.log.items()
                    for (_o, v) in entries
                    if t == "stream-notif"
                )
                if len(got) >= len(expected):
                    break
                _time.sleep(0.3)
        finally:
            q.stop()
        assert got == expected
    finally:
        srv.shutdown()
