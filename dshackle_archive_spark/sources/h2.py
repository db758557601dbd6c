"""Minimal HTTP/2 (RFC 7540) + HPACK (RFC 7541) layer — stdlib only.

The dshackle transport's gRPC shape (``sources/dshackle.py``: protobuf wire
messages inside gRPC length-prefixed frames, gzip, trailers) was previously
carried over a bare TCP preamble because no gRPC/HTTP-2 package ships in the
container. A real dshackle server (reference
``src/blockchain/connection.rs:53-111``) speaks gRPC over HTTP/2, so this
module supplies the missing carrier from the public RFCs:

- frame layer: 9-byte header (24-bit length / type / flags / 31-bit stream
  id); DATA, HEADERS (PADDED/PRIORITY stripped, CONTINUATION reassembled),
  SETTINGS (+ack), PING (+ack), WINDOW_UPDATE, RST_STREAM, GOAWAY;
- HPACK: N-bit prefix integers, the full 61-entry static table, a size-
  bounded dynamic table on both directions, indexed / incremental /
  without-indexing / never-indexed literals, table-size updates. Huffman
  coding is not emitted and rejected on decode (legal per RFC 7541 —
  encoders choose; the peer here is this module's own server);
- connection layer: client preface + SETTINGS exchange, odd stream ids,
  WINDOW_UPDATE replenishment as DATA is consumed, synchronous per-stream
  event iteration (one in-flight stream per connection — the dshackle
  client's semaphore serializes calls anyway, and head subscriptions take a
  dedicated connection, so stream-level multiplexing is unexercised bulk).

gRPC rides on top unchanged: request HEADERS carry ``:method POST``,
``:path /emerald.Blockchain/<Method>``, ``content-type application/grpc``,
``te trailers``; messages travel as gRPC length-prefixed frames inside DATA;
the response trailer is a trailing HEADERS frame with ``grpc-status``.
"""

from __future__ import annotations

import struct
import threading

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

# frame types
DATA, HEADERS, PRIORITY, RST_STREAM, SETTINGS = 0x0, 0x1, 0x2, 0x3, 0x4
PUSH_PROMISE, PING, GOAWAY, WINDOW_UPDATE, CONTINUATION = 0x5, 0x6, 0x7, 0x8, 0x9
# flags
F_END_STREAM, F_ACK, F_END_HEADERS, F_PADDED, F_PRIORITY = 0x1, 0x1, 0x4, 0x8, 0x20

DEFAULT_WINDOW = 65_535
WINDOW_TOPUP = 1 << 20  # replenish receive windows in 1 MiB strides


class H2Error(RuntimeError):
    pass


# --------------------------------------------------------------------------
# HPACK (RFC 7541)
# --------------------------------------------------------------------------

STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""), (":method", "GET"), (":method", "POST"), (":path", "/"),
    (":path", "/index.html"), (":scheme", "http"), (":scheme", "https"),
    (":status", "200"), (":status", "204"), (":status", "206"), (":status", "304"),
    (":status", "400"), (":status", "404"), (":status", "500"),
    ("accept-charset", ""), ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""), ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""), ("content-disposition", ""),
    ("content-encoding", ""), ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""), ("content-type", ""),
    ("cookie", ""), ("date", ""), ("etag", ""), ("expect", ""), ("expires", ""),
    ("from", ""), ("host", ""), ("if-match", ""), ("if-modified-since", ""),
    ("if-none-match", ""), ("if-range", ""), ("if-unmodified-since", ""),
    ("last-modified", ""), ("link", ""), ("location", ""), ("max-forwards", ""),
    ("proxy-authenticate", ""), ("proxy-authorization", ""), ("range", ""),
    ("referer", ""), ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""), ("via", ""),
    ("www-authenticate", ""),
]
_STATIC_BY_PAIR = {p: i + 1 for i, p in enumerate(STATIC_TABLE)}
_STATIC_BY_NAME: dict[str, int] = {}
for _i, (_n, _v) in enumerate(STATIC_TABLE):
    _STATIC_BY_NAME.setdefault(_n, _i + 1)


def encode_int(value: int, prefix_bits: int, prefix_flags: int = 0) -> bytes:
    """HPACK integer: ``prefix_bits``-bit prefix, continuation septets."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([prefix_flags | value])
    out = bytearray([prefix_flags | limit])
    value -= limit
    while value >= 128:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def decode_int(buf: bytes, i: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    value = buf[i] & limit
    i += 1
    if value < limit:
        return value, i
    shift = 0
    while True:
        b = buf[i]
        i += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return value, i


def _encode_str(s: str) -> bytes:
    b = s.encode()
    return encode_int(len(b), 7) + b  # H bit clear: no Huffman


def _decode_str(buf: bytes, i: int) -> tuple[str, int]:
    if buf[i] & 0x80:
        raise H2Error("Huffman-coded HPACK string (not emitted by this peer)")
    ln, i = decode_int(buf, i, 7)
    return buf[i : i + ln].decode(), i + ln


class HpackCodec:
    """One direction of an HPACK context (encoder and decoder keep separate
    dynamic tables per RFC 7541 §2.2 — use two instances per connection)."""

    def __init__(self, max_size: int = 4096):
        self.max_size = max_size
        self.dyn: list[tuple[str, str]] = []  # newest first
        self.size = 0

    def _entry_size(self, n: str, v: str) -> int:
        return len(n.encode()) + len(v.encode()) + 32

    def _add(self, n: str, v: str) -> None:
        self.dyn.insert(0, (n, v))
        self.size += self._entry_size(n, v)
        while self.size > self.max_size and self.dyn:
            en, ev = self.dyn.pop()
            self.size -= self._entry_size(en, ev)

    def _lookup(self, idx: int) -> tuple[str, str]:
        if idx <= 0:
            raise H2Error("HPACK index 0")
        if idx <= len(STATIC_TABLE):
            return STATIC_TABLE[idx - 1]
        d = idx - len(STATIC_TABLE) - 1
        if d >= len(self.dyn):
            raise H2Error(f"HPACK index {idx} beyond table")
        return self.dyn[d]

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for n, v in headers:
            full = _STATIC_BY_PAIR.get((n, v))
            if full is None:
                for di, (dn, dv) in enumerate(self.dyn):
                    if dn == n and dv == v:
                        full = len(STATIC_TABLE) + 1 + di
                        break
            if full is not None:
                out += encode_int(full, 7, 0x80)  # indexed field
                continue
            name_idx = _STATIC_BY_NAME.get(n)
            if name_idx is None:
                for di, (dn, _dv) in enumerate(self.dyn):
                    if dn == n:
                        name_idx = len(STATIC_TABLE) + 1 + di
                        break
            # literal with incremental indexing (01 prefix)
            if name_idx is not None:
                out += encode_int(name_idx, 6, 0x40)
            else:
                out += encode_int(0, 6, 0x40) + _encode_str(n)
            out += _encode_str(v)
            self._add(n, v)
        return bytes(out)

    def decode(self, buf: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        i = 0
        while i < len(buf):
            b = buf[i]
            if b & 0x80:  # indexed
                idx, i = decode_int(buf, i, 7)
                out.append(self._lookup(idx))
            elif b & 0x40:  # literal, incremental indexing
                idx, i = decode_int(buf, i, 6)
                n = self._lookup(idx)[0] if idx else None
                if n is None:
                    n, i = _decode_str(buf, i)
                v, i = _decode_str(buf, i)
                self._add(n, v)
                out.append((n, v))
            elif b & 0x20:  # dynamic table size update
                self.max_size, i = decode_int(buf, i, 5)
                while self.size > self.max_size and self.dyn:
                    en, ev = self.dyn.pop()
                    self.size -= self._entry_size(en, ev)
            else:  # literal without indexing (0000) / never indexed (0001)
                idx, i = decode_int(buf, i, 4)
                n = self._lookup(idx)[0] if idx else None
                if n is None:
                    n, i = _decode_str(buf, i)
                v, i = _decode_str(buf, i)
                out.append((n, v))
        return out


# --------------------------------------------------------------------------
# frame layer
# --------------------------------------------------------------------------

def write_frame(f, ftype: int, flags: int, stream_id: int, payload: bytes = b"") -> None:
    ln = len(payload)
    f.write(struct.pack(">BH", ln >> 16, ln & 0xFFFF))
    f.write(struct.pack(">BBI", ftype, flags, stream_id & 0x7FFFFFFF))
    f.write(payload)
    f.flush()


def read_frame(f) -> tuple[int, int, int, bytes] | None:
    hdr = f.read(9)
    if len(hdr) < 9:
        return None
    ln = (hdr[0] << 16) | (hdr[1] << 8) | hdr[2]
    ftype, flags = hdr[3], hdr[4]
    stream_id = struct.unpack(">I", hdr[5:9])[0] & 0x7FFFFFFF
    payload = f.read(ln) if ln else b""
    if len(payload) < ln:
        return None
    return ftype, flags, stream_id, payload


def _strip_padding_priority(flags: int, payload: bytes) -> bytes:
    i, end = 0, len(payload)
    if flags & F_PADDED:
        end -= payload[0]
        i += 1
    if flags & F_PRIORITY:
        i += 5
    return payload[i:end]


class _ConnBase:
    """Shared machinery: HPACK contexts, control-frame replies, one-stream
    synchronous event reading."""

    def __init__(self, f):
        self.f = f
        self.enc = HpackCodec()
        self.dec = HpackCodec()
        self.recv_conn_window = DEFAULT_WINDOW
        self.lock = threading.Lock()

    def _send_settings(self, ack: bool = False) -> None:
        write_frame(self.f, SETTINGS, F_ACK if ack else 0, 0)

    def _replenish(self, stream_id: int, consumed: int) -> None:
        """Top up receive windows so the peer never stalls on flow control."""
        self.recv_conn_window -= consumed
        if self.recv_conn_window < DEFAULT_WINDOW // 2:
            inc = WINDOW_TOPUP
            write_frame(self.f, WINDOW_UPDATE, 0, 0, struct.pack(">I", inc))
            write_frame(self.f, WINDOW_UPDATE, 0, stream_id, struct.pack(">I", inc))
            self.recv_conn_window += inc

    def _read_headers_block(self, flags: int, stream_id: int, payload: bytes) -> bytes:
        block = _strip_padding_priority(flags, payload)
        while not flags & F_END_HEADERS:
            nxt = read_frame(self.f)
            if nxt is None:
                raise H2Error("EOF inside header block")
            ftype, flags, sid, payload = nxt
            if ftype != CONTINUATION or sid != stream_id:
                raise H2Error("expected CONTINUATION")
            block += payload
        return block

    def events(self, stream_id: int):
        """Yield ``('headers'|'trailers', list)'' / ``('data', bytes)`` /
        ``('rst', code)`` for ``stream_id`` until END_STREAM; control frames
        are answered inline; ``('closed', None)`` on EOF/GOAWAY."""
        saw_headers = False
        while True:
            fr = read_frame(self.f)
            if fr is None:
                yield ("closed", None)
                return
            ftype, flags, sid, payload = fr
            if ftype == SETTINGS:
                if not flags & F_ACK:
                    self._send_settings(ack=True)
                continue
            if ftype == PING:
                if not flags & F_ACK:
                    write_frame(self.f, PING, F_ACK, 0, payload)
                continue
            if ftype == GOAWAY:
                yield ("closed", None)
                return
            if ftype in (WINDOW_UPDATE, PRIORITY):
                continue
            if sid != stream_id:
                continue  # single in-flight stream; stale frames skipped
            if ftype == RST_STREAM:
                yield ("rst", struct.unpack(">I", payload[:4])[0])
                return
            if ftype == HEADERS:
                block = self._read_headers_block(flags, sid, payload)
                hdrs = self.dec.decode(block)
                yield ("trailers" if saw_headers else "headers", hdrs)
                saw_headers = True
                if flags & F_END_STREAM:
                    return
            elif ftype == DATA:
                body = _strip_padding_priority(flags, payload)
                if body:
                    self._replenish(sid, len(body))
                    yield ("data", body)
                if flags & F_END_STREAM:
                    return

    def send_headers(self, stream_id: int, headers: list[tuple[str, str]],
                     end_stream: bool = False) -> None:
        block = self.enc.encode(headers)
        flags = F_END_HEADERS | (F_END_STREAM if end_stream else 0)
        write_frame(self.f, HEADERS, flags, stream_id, block)

    def send_data(self, stream_id: int, data: bytes, end_stream: bool = False) -> None:
        write_frame(self.f, DATA, F_END_STREAM if end_stream else 0, stream_id, data)


class H2ClientConnection(_ConnBase):
    """Client half: preface + SETTINGS, odd stream ids, request helper."""

    def __init__(self, f):
        super().__init__(f)
        self.next_stream = 1
        self.f.write(PREFACE)
        self._send_settings()
        # pre-grow the connection receive window once
        write_frame(self.f, WINDOW_UPDATE, 0, 0, struct.pack(">I", WINDOW_TOPUP))

    def request(self, path: str, authority: str,
                extra: list[tuple[str, str]] | None = None) -> int:
        sid = self.next_stream
        self.next_stream += 2
        headers = [
            (":method", "POST"),
            (":scheme", "http"),
            (":path", path),
            (":authority", authority),
            ("content-type", "application/grpc"),
            ("te", "trailers"),
        ] + (extra or [])
        self.send_headers(sid, headers)
        return sid


class H2ServerConnection(_ConnBase):
    """Server half: validate preface, SETTINGS exchange, sequential-stream
    request acceptance (one live stream at a time — see module docstring)."""

    def __init__(self, f):
        super().__init__(f)
        got = f.read(len(PREFACE))
        if got != PREFACE:
            raise H2Error(f"bad client preface: {got[:24]!r}")
        self._send_settings()

    def accept_request(self):
        """Block until a request HEADERS arrives → ``(stream_id, headers,
        body_bytes)`` with the DATA body read through END_STREAM; returns
        None when the client goes away."""
        stream_id = None
        headers: list[tuple[str, str]] = []
        body = bytearray()
        while True:
            fr = read_frame(self.f)
            if fr is None:
                return None
            ftype, flags, sid, payload = fr
            if ftype == SETTINGS:
                if not flags & F_ACK:
                    self._send_settings(ack=True)
                continue
            if ftype == PING:
                if not flags & F_ACK:
                    write_frame(self.f, PING, F_ACK, 0, payload)
                continue
            if ftype == GOAWAY:
                return None
            if ftype in (WINDOW_UPDATE, PRIORITY):
                continue
            if ftype == HEADERS:
                stream_id = sid
                block = self._read_headers_block(flags, sid, payload)
                headers = self.dec.decode(block)
                if flags & F_END_STREAM:
                    return sid, headers, bytes(body)
            elif ftype == DATA and sid == stream_id:
                chunk = _strip_padding_priority(flags, payload)
                if chunk:
                    self._replenish(sid, len(chunk))
                    body += chunk
                if flags & F_END_STREAM:
                    return sid, headers, bytes(body)
            elif ftype == RST_STREAM and sid == stream_id:
                stream_id, headers = None, []
                body.clear()

    def send_response_headers(self, stream_id: int,
                              extra: list[tuple[str, str]] | None = None) -> None:
        self.send_headers(
            stream_id,
            [(":status", "200"), ("content-type", "application/grpc")] + (extra or []),
        )

    def send_trailers(self, stream_id: int, status: int, message: str = "") -> None:
        trailers = [("grpc-status", str(status))]
        if message:
            trailers.append(("grpc-message", message))
        self.send_headers(stream_id, trailers, end_stream=True)
