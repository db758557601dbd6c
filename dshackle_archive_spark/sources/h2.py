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
  without-indexing / never-indexed literals, table-size updates; full
  Appendix-B Huffman coding on decode (real gRPC servers routinely
  Huffman-encode response headers) and opt-in on encode
  (``HpackCodec(huffman=True)`` — emitted only when it shrinks the
  literal, the RFC's intended policy);
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


# RFC 7541 Appendix B: the static Huffman code, (code, bit-length) indexed
# by symbol 0..255; EOS is (0x3fffffff, 30). The code is canonical and
# prefix-free, so decode can probe lengths ascending. The RFC's own worked
# examples (C.4/C.6: "www.example.com", "no-cache", "302", the GMT date)
# pin this table byte-for-byte in tests/test_h2.py.
_HUFFMAN: list[tuple[int, int]] = [
    (0x1FF8, 13), (0x7FFFD8, 23), (0xFFFFFE2, 28), (0xFFFFFE3, 28),
    (0xFFFFFE4, 28), (0xFFFFFE5, 28), (0xFFFFFE6, 28), (0xFFFFFE7, 28),
    (0xFFFFFE8, 28), (0xFFFFEA, 24), (0x3FFFFFFC, 30), (0xFFFFFE9, 28),
    (0xFFFFFEA, 28), (0x3FFFFFFD, 30), (0xFFFFFEB, 28), (0xFFFFFEC, 28),
    (0xFFFFFED, 28), (0xFFFFFEE, 28), (0xFFFFFEF, 28), (0xFFFFFF0, 28),
    (0xFFFFFF1, 28), (0xFFFFFF2, 28), (0x3FFFFFFE, 30), (0xFFFFFF3, 28),
    (0xFFFFFF4, 28), (0xFFFFFF5, 28), (0xFFFFFF6, 28), (0xFFFFFF7, 28),
    (0xFFFFFF8, 28), (0xFFFFFF9, 28), (0xFFFFFFA, 28), (0xFFFFFFB, 28),
    (0x14, 6), (0x3F8, 10), (0x3F9, 10), (0xFFA, 12),
    (0x1FF9, 13), (0x15, 6), (0xF8, 8), (0x7FA, 11),
    (0x3FA, 10), (0x3FB, 10), (0xF9, 8), (0x7FB, 11),
    (0xFA, 8), (0x16, 6), (0x17, 6), (0x18, 6),
    (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6),
    (0x1A, 6), (0x1B, 6), (0x1C, 6), (0x1D, 6),
    (0x1E, 6), (0x1F, 6), (0x5C, 7), (0xFB, 8),
    (0x7FFC, 15), (0x20, 6), (0xFFB, 12), (0x3FC, 10),
    (0x1FFA, 13), (0x21, 6), (0x5D, 7), (0x5E, 7),
    (0x5F, 7), (0x60, 7), (0x61, 7), (0x62, 7),
    (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7),
    (0x67, 7), (0x68, 7), (0x69, 7), (0x6A, 7),
    (0x6B, 7), (0x6C, 7), (0x6D, 7), (0x6E, 7),
    (0x6F, 7), (0x70, 7), (0x71, 7), (0x72, 7),
    (0xFC, 8), (0x73, 7), (0xFD, 8), (0x1FFB, 13),
    (0x7FFF0, 19), (0x1FFC, 13), (0x3FFC, 14), (0x22, 6),
    (0x7FFD, 15), (0x3, 5), (0x23, 6), (0x4, 5),
    (0x24, 6), (0x5, 5), (0x25, 6), (0x26, 6),
    (0x27, 6), (0x6, 5), (0x74, 7), (0x75, 7),
    (0x28, 6), (0x29, 6), (0x2A, 6), (0x7, 5),
    (0x2B, 6), (0x76, 7), (0x2C, 6), (0x8, 5),
    (0x9, 5), (0x2D, 6), (0x77, 7), (0x78, 7),
    (0x79, 7), (0x7A, 7), (0x7B, 7), (0x7FFE, 15),
    (0x7FC, 11), (0x3FFD, 14), (0x1FFD, 13), (0xFFFFFFC, 28),
    (0xFFFE6, 20), (0x3FFFD2, 22), (0xFFFE7, 20), (0xFFFE8, 20),
    (0x3FFFD3, 22), (0x3FFFD4, 22), (0x3FFFD5, 22), (0x7FFFD9, 23),
    (0x3FFFD6, 22), (0x7FFFDA, 23), (0x7FFFDB, 23), (0x7FFFDC, 23),
    (0x7FFFDD, 23), (0x7FFFDE, 23), (0xFFFFEB, 24), (0x7FFFDF, 23),
    (0xFFFFEC, 24), (0xFFFFED, 24), (0x3FFFD7, 22), (0x7FFFE0, 23),
    (0xFFFFEE, 24), (0x7FFFE1, 23), (0x7FFFE2, 23), (0x7FFFE3, 23),
    (0x7FFFE4, 23), (0x1FFFDC, 21), (0x3FFFD8, 22), (0x7FFFE5, 23),
    (0x3FFFD9, 22), (0x7FFFE6, 23), (0x7FFFE7, 23), (0xFFFFEF, 24),
    (0x3FFFDA, 22), (0x1FFFDD, 21), (0xFFFE9, 20), (0x3FFFDB, 22),
    (0x3FFFDC, 22), (0x7FFFE8, 23), (0x7FFFE9, 23), (0x1FFFDE, 21),
    (0x7FFFEA, 23), (0x3FFFDD, 22), (0x3FFFDE, 22), (0xFFFFF0, 24),
    (0x1FFFDF, 21), (0x3FFFDF, 22), (0x7FFFEB, 23), (0x7FFFEC, 23),
    (0x1FFFE0, 21), (0x1FFFE1, 21), (0x3FFFE0, 22), (0x1FFFE2, 21),
    (0x7FFFED, 23), (0x3FFFE1, 22), (0x7FFFEE, 23), (0x7FFFEF, 23),
    (0xFFFEA, 20), (0x3FFFE2, 22), (0x3FFFE3, 22), (0x3FFFE4, 22),
    (0x7FFFF0, 23), (0x3FFFE5, 22), (0x3FFFE6, 22), (0x7FFFF1, 23),
    (0x3FFFFE0, 26), (0x3FFFFE1, 26), (0xFFFEB, 20), (0x7FFF1, 19),
    (0x3FFFE7, 22), (0x7FFFF2, 23), (0x3FFFE8, 22), (0x1FFFFEC, 25),
    (0x3FFFFE2, 26), (0x3FFFFE3, 26), (0x3FFFFE4, 26), (0x7FFFFDE, 27),
    (0x7FFFFDF, 27), (0x3FFFFE5, 26), (0xFFFFF1, 24), (0x1FFFFED, 25),
    (0x7FFF2, 19), (0x1FFFE3, 21), (0x3FFFFE6, 26), (0x7FFFFE0, 27),
    (0x7FFFFE1, 27), (0x3FFFFE7, 26), (0x7FFFFE2, 27), (0xFFFFF2, 24),
    (0x1FFFE4, 21), (0x1FFFE5, 21), (0x3FFFFE8, 26), (0x3FFFFE9, 26),
    (0xFFFFFFD, 28), (0x7FFFFE3, 27), (0x7FFFFE4, 27), (0x7FFFFE5, 27),
    (0xFFFEC, 20), (0xFFFFF3, 24), (0xFFFED, 20), (0x1FFFE6, 21),
    (0x3FFFE9, 22), (0x1FFFE7, 21), (0x1FFFE8, 21), (0x7FFFF3, 23),
    (0x3FFFEA, 22), (0x3FFFEB, 22), (0x1FFFFEE, 25), (0x1FFFFEF, 25),
    (0xFFFFF4, 24), (0xFFFFF5, 24), (0x3FFFFEA, 26), (0x7FFFF4, 23),
    (0x3FFFFEB, 26), (0x7FFFFE6, 27), (0x3FFFFEC, 26), (0x3FFFFED, 26),
    (0x7FFFFE7, 27), (0x7FFFFE8, 27), (0x7FFFFE9, 27), (0x7FFFFEA, 27),
    (0x7FFFFEB, 27), (0xFFFFFFE, 28), (0x7FFFFEC, 27), (0x7FFFFED, 27),
    (0x7FFFFEE, 27), (0x7FFFFEF, 27), (0x7FFFFF0, 27), (0x3FFFFEE, 26),
]
_HUFF_DECODE = {cn: sym for sym, cn in enumerate(_HUFFMAN)}
_HUFF_MIN_BITS = min(n for _, n in _HUFFMAN)  # 5
_HUFF_MAX_BITS = max(n for _, n in _HUFFMAN)  # 28 (EOS would be 30)


def huffman_encode(data: bytes) -> bytes:
    """RFC 7541 §5.2 string coding: MSB-first bit packing, the final
    partial octet padded with the EOS prefix (all 1s)."""
    acc = 0
    nbits = 0
    out = bytearray()
    for b in data:
        code, ln = _HUFFMAN[b]
        acc = (acc << ln) | code
        nbits += ln
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        pad = 8 - nbits
        out.append(((acc << pad) | ((1 << pad) - 1)) & 0xFF)
    return bytes(out)


def huffman_decode(data: bytes) -> bytes:
    """Prefix-free scan: probe code lengths ascending (5..28 bits) against
    the accumulated bit window. Trailing padding must be a strict EOS
    prefix shorter than 8 bits (RFC 7541 §5.2 MUSTs)."""
    out = bytearray()
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= _HUFF_MIN_BITS:
            for ln in range(_HUFF_MIN_BITS, min(nbits, _HUFF_MAX_BITS) + 1):
                sym = _HUFF_DECODE.get((acc >> (nbits - ln), ln))
                if sym is not None:
                    out.append(sym)
                    nbits -= ln
                    acc &= (1 << nbits) - 1
                    break
            else:
                break  # need more bits (or trailing padding)
    if nbits >= 8:
        raise H2Error("HPACK Huffman: padding longer than 7 bits")
    if acc != (1 << nbits) - 1:
        raise H2Error("HPACK Huffman: padding is not an EOS prefix")
    return bytes(out)


def _encode_str(s: str, huffman: bool = False) -> bytes:
    b = s.encode()
    if huffman:
        h = huffman_encode(b)
        if len(h) < len(b):  # RFC choice: only when it actually shrinks
            return encode_int(len(h), 7, 0x80) + h
    return encode_int(len(b), 7) + b  # H bit clear


def _decode_str(buf: bytes, i: int) -> tuple[str, int]:
    huff = bool(buf[i] & 0x80)
    ln, i = decode_int(buf, i, 7)
    raw = buf[i : i + ln]
    if huff:
        raw = huffman_decode(raw)
    return raw.decode(), i + ln


class HpackCodec:
    """One direction of an HPACK context (encoder and decoder keep separate
    dynamic tables per RFC 7541 §2.2 — use two instances per connection)."""

    def __init__(self, max_size: int = 4096, huffman: bool = False):
        self.max_size = max_size
        self.huffman = huffman  # emit Huffman-coded literals when shorter
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
                out += encode_int(0, 6, 0x40) + _encode_str(n, self.huffman)
            out += _encode_str(v, self.huffman)
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

    def __init__(self, f, huffman: bool = False):
        self.f = f
        self.enc = HpackCodec(huffman=huffman)
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

    def __init__(self, f, huffman: bool = True):
        # huffman defaults ON for the client: every HTTP/2 peer MUST decode
        # (RFC 7541 §5.2), and real gRPC clients Huffman-code literals
        super().__init__(f, huffman=huffman)
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

    def __init__(self, f, huffman: bool = False):
        super().__init__(f, huffman=huffman)
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
