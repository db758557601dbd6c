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
