"""In-memory Kafka broker stub speaking the real binary protocol:

- ApiVersions v0 (api_key 18): advertises Produce 0..3 by default; a
  ``legacy_only`` broker advertises 0..0 (forces the MessageSet path);
- ProduceRequest v0 (MessageSet, CRC32/IEEE verified) and v3
  (RecordBatch v2, magic/CRC32C verified) — exactly the checks a real
  broker applies before appending;
- assigns offsets per (topic, partition), answers the version-matched
  ProduceResponse; corrupt payloads get error_code 2 (CORRUPT_MESSAGE).
"""

from __future__ import annotations

import socketserver
import struct
import threading

from dshackle_archive_spark.sources.kafka_wire import (
    API_PRODUCE,
    API_VERSIONS,
    KafkaWireError,
    decode_message_set,
    decode_produce_request,
    decode_record_batch,
    encode_api_versions_response,
    encode_produce_response,
    encode_produce_response_v3,
    read_framed,
)


def start_kafka_stub(
    legacy_only: bool = False,
) -> tuple[str, socketserver.ThreadingTCPServer]:
    """Returns ('host:port', server). ``server.log`` holds
    {(topic, partition): [(offset, value_bytes), ...]}; ``server.batches``
    counts accepted v2 record batches (proves the modern path ran)."""

    log: dict[tuple[str, int], list[tuple[int, bytes]]] = {}
    lock = threading.Lock()
    max_produce = 0 if legacy_only else 3

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            while True:
                try:
                    frame = read_framed(self.rfile)
                except KafkaWireError:
                    return
                if frame is None:
                    return
                api_key = struct.unpack(">h", frame[:2])[0]
                if api_key == API_VERSIONS:
                    corr = struct.unpack(">i", frame[4:8])[0]
                    self.wfile.write(
                        encode_api_versions_response(
                            corr, {API_PRODUCE: (0, max_produce),
                                   API_VERSIONS: (0, 0)}
                        )
                    )
                    self.wfile.flush()
                    continue
                try:
                    corr, _cid, topic, part, records, ver = (
                        decode_produce_request(frame)
                    )
                except KafkaWireError:
                    return
                resp_enc = (
                    encode_produce_response_v3 if ver == 3
                    else encode_produce_response
                )
                try:
                    if ver == 3:
                        msgs = decode_record_batch(records)  # CRC32C check
                        with lock:
                            srv.batches += 1
                    else:
                        msgs = decode_message_set(records)  # CRC32 check
                    with lock:
                        plog = log.setdefault((topic, part), [])
                        base = len(plog)
                        for i, (_off, _key, value) in enumerate(msgs):
                            plog.append((base + i, value))
                    resp = resp_enc(corr, topic, part, 0, base)
                except KafkaWireError:
                    resp = resp_enc(corr, topic, part, 2, -1)
                self.wfile.write(resp)
                self.wfile.flush()

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Handler)
    srv.log = log
    srv.batches = 0
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"127.0.0.1:{srv.server_address[1]}", srv
