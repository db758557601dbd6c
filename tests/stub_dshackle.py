"""Local dshackle-shaped gRPC stub (NativeCall + SubscribeHead framing).

Speaks the same framed protocol as ``sources.dshackle`` — protobuf wire
messages inside gRPC length-prefixed frames over TCP — backed by the
deterministic chain models from ``stub_rpc``, so archive→verify runs
end-to-end over the reference's primary transport shape without a real
dshackle in the container.
"""

from __future__ import annotations

import json
import socketserver
import threading
import time

from dshackle_archive_spark.sources.dshackle import (
    FLAG_GZIP,
    FLAG_TRAILER,
    PATH_NATIVE_CALL,
    PATH_SUBSCRIBE_HEAD,
    decode_chain,
    decode_native_call_request,
    encode_chain_head,
    encode_reply_item,
    read_frame,
    write_frame,
)


def start_dshackle_stub(
    model,
    pretty: bool = False,
    drop_subscription_after: int | None = None,
) -> tuple[str, socketserver.ThreadingTCPServer]:
    """Serve NativeCall/SubscribeHead on an ephemeral port; returns
    (dshackle://host:port, server). ``server.accepts`` counts TCP
    connections; ``server.calls`` counts NativeCall items served.
    ``drop_subscription_after`` kills the head stream after N messages
    (reconnect tests). ``pretty`` emits indented result payloads
    (byte-fidelity tests)."""

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            srv.accepts += 1
            # sequential streams over one connection — the TCP analog of
            # gRPC multiplexing many streams on one HTTP/2 channel
            while not srv.stopping:
                try:
                    line = self.rfile.readline().decode().strip()
                except OSError:
                    return
                if not line.startswith("PATH "):
                    return  # client closed (empty line) or spoke garbage
                path = line[5:]
                frame = read_frame(self.rfile)
                if frame is None:
                    return
                flag, body = frame
                compress = bool(flag & FLAG_GZIP)
                if path == PATH_NATIVE_CALL:
                    self._native_call(body, compress)
                elif path == PATH_SUBSCRIBE_HEAD:
                    self._subscribe_head(body, compress)
                    return  # subscription occupies the stream to its end
                else:
                    write_frame(
                        self.wfile, b"grpc-status: 12\r\ngrpc-message: unimplemented",
                        flag=FLAG_TRAILER,
                    )

        def _native_call(self, body: bytes, compress: bool):
            _chain, items = decode_native_call_request(body)
            for item_id, method, payload in items:
                srv.calls += 1
                try:
                    params = json.loads(payload) if payload else []
                    result = model.handle(method, params)
                    out = json.dumps(result, indent=2 if pretty else None).encode()
                    reply = encode_reply_item(item_id, True, out)
                except Exception as e:  # application error rides in the item
                    reply = encode_reply_item(item_id, False, b"", str(e))
                write_frame(self.wfile, reply, compress=compress)
            write_frame(self.wfile, b"grpc-status: 0", flag=FLAG_TRAILER)

        def _subscribe_head(self, body: bytes, compress: bool):
            decode_chain(body)  # chain select (single-chain stub)
            sent = 0
            last = None
            while not srv.stopping:
                head = model.head
                if last is None or head > last:
                    lo = head if last is None else last + 1
                    for h in range(lo, head + 1):
                        write_frame(
                            self.wfile,
                            encode_chain_head(1, h, model.block_hash(h)),
                            compress=compress,
                        )
                        sent += 1
                        if (
                            drop_subscription_after is not None
                            and sent >= drop_subscription_after
                        ):
                            return  # drop the connection mid-stream
                    last = head
                time.sleep(0.01)

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Handler)
    srv.accepts = 0
    srv.calls = 0
    srv.stopping = False
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    orig_shutdown = srv.shutdown

    def shutdown():
        srv.stopping = True
        orig_shutdown()

    srv.shutdown = shutdown
    return f"dshackle://127.0.0.1:{srv.server_address[1]}", srv
