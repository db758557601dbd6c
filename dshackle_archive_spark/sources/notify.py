"""Notification sinks (S15/S16 in SURVEY §2.1).

The reference emits one JSON message per archived file — to a directory
(``notify/fs.rs``) or a Pulsar topic (``notify/pulsar.rs:30-68``), where each
message is the ``Notification`` struct serialized as a JSON string
(``notify/mod.rs:12-35``). Here the notification stream is a DataFrame of
single ``value`` strings — the exact wire payload — which is the universal
shape every Spark message sink takes (Kafka's and StreamNative's Pulsar
connector both consume a ``value`` column), so the broker is a format string
+ options, not engine code:

    send_notifications(wr, "pulsar",
                       **{"service.url": "pulsar://...", "topic": "t"})
    send_notifications(wr, "kafka",
                       **{"kafka.bootstrap.servers": "...", "topic": "t"})
    send_notifications(wr, "json", path="/archive/notifications/run1")

``fmt="socket"`` is a broker transport built into the engine: each
partition opens one TCP connection and produces newline-delimited JSON —
the minimal message-broker wire shape (same produce-per-partition topology
as the Kafka/Pulsar connectors; one producer per executor task). Tests run
an in-process broker and consume the round-trip, so the payload genuinely
transits a socket, not just a local file.
"""

from __future__ import annotations

import socket

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_notifications_dir(write_results: DataFrame, notify_dir: str) -> str:
    """``--notify.dir`` sink (``notify/fs.rs:18-46``): the run's
    notifications as one ``dshackle-archive-<UTC ts>.jsonl`` file, one JSON
    object per line — the reference's exact file naming and framing.

    Driver-side single-file write on purpose: the payload is one small JSON
    line per archived *file* (metadata scale), and the reference contract is
    a single append-ordered file per run, which a distributed write can't
    produce."""
    import os
    from datetime import datetime, timezone

    os.makedirs(notify_dir, exist_ok=True)
    name = "dshackle-archive-{}.jsonl".format(
        datetime.now(timezone.utc).strftime("%Y%m%d%H%M%S")
    )
    path = os.path.join(notify_dir, name)
    values = [r["value"] for r in notification_json_df(write_results).collect()]
    with open(path, "w") as f:
        for v in values:
            f.write(v + "\n")
    return path


def _produce_partition(host: str, port: int, rows) -> None:
    """One producer connection per partition (executor-side)."""
    batch = [r["value"].encode() + b"\n" for r in rows]
    if not batch:
        return  # don't open connections for empty partitions
    with socket.create_connection((host, port), timeout=10) as s:
        f = s.makefile("wb")
        for line in batch:
            f.write(line)
        f.flush()

# reference field order (notify/mod.rs:12-35); key order in the JSON matches
_FIELDS = (
    "version",
    "ts",
    "blockchain",
    "type",
    "run",
    "heightStart",
    "heightEnd",
    "location",
    "maturity",
)


def notification_json_df(write_results: DataFrame) -> DataFrame:
    """Write-result rows → one ``value`` JSON string per archived file.

    Matches the reference's serde output: RFC3339 UTC ``ts``, camelCase
    height keys, explicit ``"maturity": null`` (serde serializes the Option;
    ``to_json`` must keep null fields)."""
    src = write_results
    if "skipped" in src.columns:
        src = src.filter(~F.col("skipped")).drop("skipped", "n_rows")
    payload = F.struct(
        F.col("version"),
        F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("ts"),
        F.col("blockchain"),
        F.col("type"),
        F.col("run"),
        F.col("heightStart"),
        F.col("heightEnd"),
        F.col("location"),
        F.col("maturity"),
    )
    return src.select(
        F.to_json(payload, {"ignoreNullFields": "false"}).alias("value")
    )


def _produce_partition_kafka(bootstrap: str, topic: str, partition: int, rows) -> None:
    """One Kafka wire-protocol producer per partition (executor-side)."""
    from .kafka_wire import KafkaWireProducer

    batch = [r["value"].encode() for r in rows]
    if not batch:
        return
    p = KafkaWireProducer(bootstrap, topic, partition)
    try:
        p.produce(batch)
    finally:
        p.close()


def _produce_partition_pulsar(service_url: str, topic: str, partition: int, rows) -> None:
    """One Pulsar binary-protocol producer per partition (executor-side) —
    the reference's producer loop (``pulsar.rs:30-68``) at protocol level."""
    from .pulsar_wire import PulsarWireProducer

    batch = [r["value"].encode() for r in rows]
    if not batch:
        return
    # unlike a Kafka topic partition, a Pulsar producer_id is a CLIENT-chosen
    # identifier scoped to this connection (each task opens its own), so the
    # task index is a valid, collision-free choice against any real broker
    p = PulsarWireProducer(service_url, topic, producer_id=partition + 1)
    try:
        for payload in batch:
            p.send(payload)
    finally:
        p.close()


def send_notifications(
    write_results: DataFrame, fmt: str, path: str | None = None, **options
) -> None:
    """Batch notification send through any Spark sink format.

    ``fmt="pulsar"``/``"kafka"`` need the respective connector jar on the
    classpath (none ships in this container); ``fmt="kafka-wire"`` /
    ``"pulsar-wire"`` speak the broker's binary protocol directly
    (``kafka_wire.py``: checksummed MessageSet v0, acks=1;
    ``pulsar_wire.py``: CONNECT/PRODUCER/SEND with CRC32C frames, per-send
    receipts) — one producer per Spark partition, no connector jar;
    ``fmt="socket"`` produces JSONL to a broker at ``host``/``port`` (one
    connection per partition, executor-side); ``fmt="json"`` is the S15
    directory sink shape."""
    vdf = notification_json_df(write_results)
    if fmt == "socket":
        host, port = options["host"], int(options["port"])
        vdf.foreachPartition(lambda rows: _produce_partition(host, port, rows))
        return
    if fmt == "kafka-wire":
        bootstrap, topic = options["bootstrap"], options["topic"]
        # Map Spark partitions onto the TOPIC's partition count, not the
        # DataFrame's: a topic typically has far fewer partitions than a
        # 1000-executor job has tasks, and producing to partition 713 of a
        # 12-partition topic is an unknown-partition error on any real
        # broker. Default 1 matches the reference's single-partition
        # notifications topic (pulsar.rs / kafka config).
        n_parts = int(options.get("topic_partitions", 1))
        vdf.rdd.mapPartitionsWithIndex(
            lambda idx, rows: (
                _produce_partition_kafka(bootstrap, topic, idx % n_parts, rows)
                or iter(())
            )
        ).count()
        return
    if fmt == "pulsar-wire":
        service_url, topic = options["service_url"], options["topic"]
        vdf.rdd.mapPartitionsWithIndex(
            lambda idx, rows: (
                _produce_partition_pulsar(service_url, topic, idx, rows) or iter(())
            )
        ).count()
        return
    writer = vdf.write.format(fmt).options(**options).mode("append")
    if path is not None:
        writer.save(path)
    else:
        writer.save()


def stream_notifications(
    notifications: DataFrame,
    fmt: str,
    checkpoint_dir: str,
    query_name: str = "notifications",
    **options,
):
    """Streaming variant: attach the notification payload stream to a message
    sink with checkpointed delivery (the reference's channel→producer loop,
    ``pulsar.rs:31-68``, as a Structured Streaming sink). Returns the started
    StreamingQuery. ``fmt="socket"`` produces each micro-batch to the broker
    through ``foreachBatch`` — per-partition producer connections with the
    stream's checkpointed exactly-once batch tracking."""
    vdf = notification_json_df(notifications)
    if fmt == "socket":
        host, port = options["host"], int(options["port"])
        return (
            vdf.writeStream.foreachBatch(
                lambda df, _bid: df.foreachPartition(
                    lambda rows: _produce_partition(host, port, rows)
                )
            )
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )
    if fmt == "kafka-wire":
        bootstrap, topic = options["bootstrap"], options["topic"]
        # same topic-partition mapping as the batch path: Spark task count
        # routinely exceeds the topic's partition count on a real broker
        n_parts = int(options.get("topic_partitions", 1))
        return (
            vdf.writeStream.foreachBatch(
                lambda df, _bid: df.rdd.mapPartitionsWithIndex(
                    lambda idx, rows: (
                        _produce_partition_kafka(
                            bootstrap, topic, idx % n_parts, rows
                        )
                        or iter(())
                    )
                ).count()
                and None
            )
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )
    if fmt == "pulsar-wire":
        service_url, topic = options["service_url"], options["topic"]
        return (
            vdf.writeStream.foreachBatch(
                lambda df, _bid: df.rdd.mapPartitionsWithIndex(
                    lambda idx, rows: (
                        _produce_partition_pulsar(service_url, topic, idx, rows)
                        or iter(())
                    )
                ).count()
                and None
            )
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )
    return (
        vdf.writeStream.format(fmt)
        .options(**options)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
