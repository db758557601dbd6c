"""In-memory Kafka broker stub: accepts framed ProduceRequest v0, VERIFIES
message CRCs exactly as a real broker would, assigns offsets per
(topic, partition), and answers ProduceResponse v0. Strict: a malformed or
corrupted request gets error_code 2 (CORRUPT_MESSAGE), like the real thing.
"""

from __future__ import annotations

import socketserver
import threading

from dshackle_archive_spark.sources.kafka_wire import (
    KafkaWireError,
    decode_message_set,
    decode_produce_request,
    encode_produce_response,
    read_framed,
)


def start_kafka_stub() -> tuple[str, socketserver.ThreadingTCPServer]:
    """Returns ('host:port', server). ``server.log`` holds
    {(topic, partition): [(offset, value_bytes), ...]}."""

    log: dict[tuple[str, int], list[tuple[int, bytes]]] = {}
    lock = threading.Lock()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            while True:
                try:
                    frame = read_framed(self.rfile)
                except KafkaWireError:
                    return
                if frame is None:
                    return
                try:
                    corr, _cid, topic, part, msg_set = decode_produce_request(frame)
                except KafkaWireError:
                    return
                try:
                    msgs = decode_message_set(msg_set)  # raises on CRC mismatch
                    with lock:
                        plog = log.setdefault((topic, part), [])
                        base = len(plog)
                        for i, (_off, _key, value) in enumerate(msgs):
                            plog.append((base + i, value))
                    resp = encode_produce_response(corr, topic, part, 0, base)
                except KafkaWireError:
                    resp = encode_produce_response(corr, topic, part, 2, -1)
                self.wfile.write(resp)
                self.wfile.flush()

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Handler)
    srv.log = log
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"127.0.0.1:{srv.server_address[1]}", srv
