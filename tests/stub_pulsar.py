"""In-memory Pulsar broker stub: speaks the binary protocol's producer half
(CONNECT/CONNECTED, PRODUCER/PRODUCER_SUCCESS with broker-assigned producer
names, SEND/SEND_RECEIPT with ledger/entry ids) and VERIFIES each message's
CRC32C checksum exactly as a real broker would (``read_command`` raises on
mismatch). Messages land in ``server.topics[(topic)] = [(entry, payload)]``.
"""

from __future__ import annotations

import socketserver
import threading

from dshackle_archive_spark.sources.dshackle import pb_decode
from dshackle_archive_spark.sources import pulsar_wire as P


def start_pulsar_stub() -> tuple[str, socketserver.ThreadingTCPServer]:
    topics: dict[str, list[tuple[int, bytes]]] = {}
    lock = threading.Lock()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            producers: dict[int, str] = {}  # producer_id -> topic
            while True:
                try:
                    fr = P.read_command(self.rfile)
                except P.PulsarWireError:
                    return  # checksum/protocol violation drops the connection
                if fr is None:
                    return
                cmd_type, cmd, tail = fr
                if cmd_type == P.CONNECT:
                    P.write_command(self.wfile, P.encode_connected())
                elif cmd_type == P.PRODUCER:
                    pc = pb_decode((cmd.get(P.PRODUCER) or [b""])[0])
                    topic = bytes((pc.get(1) or [b""])[0]).decode()
                    producer_id = (pc.get(2) or [0])[0]
                    request_id = (pc.get(3) or [0])[0]
                    producers[producer_id] = topic
                    P.write_command(
                        self.wfile,
                        P.encode_producer_success(
                            request_id, f"stub-producer-{producer_id}"
                        ),
                    )
                elif cmd_type == P.SEND:
                    sc = pb_decode((cmd.get(P.SEND) or [b""])[0])
                    producer_id = (sc.get(1) or [0])[0]
                    seq = (sc.get(2) or [0])[0]
                    topic = producers.get(producer_id, "?")
                    _md, payload = P.split_message_tail(tail)
                    with lock:
                        log = topics.setdefault(topic, [])
                        entry = len(log)
                        log.append((entry, payload))
                    P.write_command(
                        self.wfile,
                        P.encode_send_receipt(producer_id, seq, 1, entry),
                    )
                elif cmd_type == P.PONG:
                    continue
                else:
                    return

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Handler)
    srv.topics = topics
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"pulsar://127.0.0.1:{srv.server_address[1]}", srv
