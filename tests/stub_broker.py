"""In-process JSONL message broker for notification round-trip tests.

A minimal topic: producers connect and write newline-delimited JSON;
the broker appends each line to a thread-safe list that consumers read.
The reference's Pulsar tests do the same with testcontainers
(``notify/pulsar.rs:70-132``) — this is the no-container equivalent that
still forces the payload through a real socket.
"""

from __future__ import annotations

import socketserver
import threading


def start_broker() -> tuple[str, int, socketserver.ThreadingTCPServer]:
    """Returns (host, port, server); ``server.messages`` is the topic."""

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                line = line.strip()
                if line:
                    with srv.lock:
                        srv.messages.append(line.decode())

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Handler)
    srv.messages = []
    srv.lock = threading.Lock()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return "127.0.0.1", srv.server_address[1], srv
