"""Unit tests for the stdlib HTTP/2 + HPACK layer (RFC 7540 / 7541).

The interop tests live in test_dshackle.py (client ↔ stub over real h2
frames); these pin the codec layer itself, including RFC worked examples.
"""

import io
import struct

import pytest

from dshackle_archive_spark.sources import h2 as H


def test_hpack_integer_rfc7541_examples():
    # C.1.1: 10 in a 5-bit prefix -> 0x0a
    assert H.encode_int(10, 5) == b"\x0a"
    assert H.decode_int(b"\x0a", 0, 5) == (10, 1)
    # C.1.2: 1337 in a 5-bit prefix -> 1f 9a 0a
    assert H.encode_int(1337, 5) == b"\x1f\x9a\x0a"
    assert H.decode_int(b"\x1f\x9a\x0a", 0, 5) == (1337, 3)
    # C.1.3: 42 in an 8-bit prefix -> 2a
    assert H.encode_int(42, 8) == b"\x2a"
    assert H.decode_int(b"\x2a", 0, 8) == (42, 1)


def test_hpack_static_table_indexed_fields():
    enc, dec = H.HpackCodec(), H.HpackCodec()
    hdrs = [(":method", "POST"), (":scheme", "http"), (":status", "200")]
    block = enc.encode(hdrs)
    # all three are exact static-table hits -> single indexed bytes each
    assert block == bytes([0x80 | 3, 0x80 | 6, 0x80 | 8])
    assert dec.decode(block) == hdrs


def test_hpack_dynamic_table_reuse_across_blocks():
    enc, dec = H.HpackCodec(), H.HpackCodec()
    hdrs = [(":path", "/emerald.Blockchain/NativeCall"), ("te", "trailers")]
    b1 = enc.encode(hdrs)
    b2 = enc.encode(hdrs)
    assert dec.decode(b1) == hdrs
    assert dec.decode(b2) == hdrs
    # second block refers to the dynamic table: strictly smaller
    assert len(b2) < len(b1)
    assert len(b2) == 2  # two indexed fields


def test_hpack_eviction_respects_max_size():
    enc = H.HpackCodec(max_size=64)  # fits one small entry only
    enc.encode([("a", "1"), ("b", "2"), ("c", "3")])
    assert enc.size <= 64 and len(enc.dyn) == 1 and enc.dyn[0] == ("c", "3")


# RFC 7541 Appendix C worked examples: plaintext -> exact Huffman bytes.
RFC_HUFFMAN_EXAMPLES = {
    b"www.example.com": "f1e3c2e5f23a6ba0ab90f4ff",        # C.4.1
    b"no-cache": "a8eb10649cbf",                            # C.4.2
    b"custom-key": "25a849e95ba97d7f",                      # C.4.3
    b"custom-value": "25a849e95bb8e8b4bf",                  # C.4.3
    b"302": "6402",                                         # C.6.1
    b"private": "aec3771a4b",                               # C.6.1
    b"Mon, 21 Oct 2013 20:13:21 GMT":
        "d07abe941054d444a8200595040b8166e082a62d1bff",     # C.6.1
    b"https://www.example.com": "9d29ad171863c78f0b97c8e9ae82ae43d3",
    b"307": "640eff",                                       # C.6.2
    b"gzip": "9bd9ab",                                      # C.6.3
    b"foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1":
        "94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab270fb5291f9587"
        "316065c003ed4ee5b1063d5007",                       # C.6.3
}


def test_huffman_rfc7541_worked_examples_byte_exact():
    for plain, hexs in RFC_HUFFMAN_EXAMPLES.items():
        assert H.huffman_encode(plain).hex() == hexs, plain
        assert H.huffman_decode(bytes.fromhex(hexs)) == plain


def test_huffman_bad_padding_rejected():
    # "0" is code 00000 (5 bits); padding the final octet with 0s instead of
    # the all-ones EOS prefix violates RFC 7541 §5.2
    with pytest.raises(H.H2Error, match="EOS prefix"):
        H.huffman_decode(bytes([0b00000_000]))
    # a whole octet of padding (0xFF after a complete symbol octet) is
    # "padding longer than 7 bits"
    ok = H.huffman_encode(b"www.example.com")
    with pytest.raises(H.H2Error, match="padding longer"):
        H.huffman_decode(ok + b"\xff")


def test_hpack_decodes_huffman_literals():
    enc = H.HpackCodec(huffman=True)
    dec = H.HpackCodec()
    headers = [("grpc-status", "0"), ("grpc-message", ""),
               ("content-type", "application/grpc"),
               ("date", "Mon, 21 Oct 2013 20:13:21 GMT")]
    block = enc.encode(headers)
    # the date literal must actually be Huffman-coded (shorter than raw)
    assert bytes.fromhex(
        RFC_HUFFMAN_EXAMPLES[b"Mon, 21 Oct 2013 20:13:21 GMT"]
    ) in block
    assert dec.decode(block) == headers


def test_hpack_huffman_emitted_only_when_shorter():
    # "302" huffman-codes to 2 bytes < 3 raw; a string of rare symbols
    # (28-bit codes) would inflate, so it must go out literal
    assert H._encode_str("302", huffman=True)[0] & 0x80
    rare = "\x02\x03\x04"
    out = H._encode_str(rare, huffman=True)
    assert not out[0] & 0x80 and out[1:] == rare.encode()


def test_hpack_property_roundtrip_huffman():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    header = st.tuples(
        st.text(min_size=1, max_size=30), st.text(max_size=60)
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.lists(header, max_size=8), max_size=4))
    def check(blocks):
        enc, dec = H.HpackCodec(huffman=True), H.HpackCodec()
        for hdrs in blocks:
            assert dec.decode(enc.encode(hdrs)) == hdrs

    check()


def test_huffman_property_roundtrip_bytes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def check(data):
        assert H.huffman_decode(H.huffman_encode(data)) == data

    check()


def test_frame_roundtrip_and_padding():
    buf = io.BytesIO()
    H.write_frame(buf, H.DATA, H.F_END_STREAM, 7, b"payload")
    buf.seek(0)
    assert H.read_frame(buf) == (H.DATA, H.F_END_STREAM, 7, b"payload")
    # PADDED flag: 3 pad bytes stripped
    padded = bytes([3]) + b"body" + b"\x00\x00\x00"
    assert H._strip_padding_priority(H.F_PADDED, padded) == b"body"
    # PRIORITY on HEADERS: 5-byte dep+weight stripped
    prio = b"\x00\x00\x00\x00\x10headers"
    assert H._strip_padding_priority(H.F_PRIORITY, prio) == b"headers"


def _pipe_pair():
    """Two file-like endpoints over an in-memory socketpair."""
    import socket

    a, b = socket.socketpair()
    return a, b, a.makefile("rwb"), b.makefile("rwb")


def test_connection_handshake_and_roundtrip():
    import threading

    sa, sb, fa, fb = _pipe_pair()
    got = {}

    def server():
        conn = H.H2ServerConnection(fb)
        sid, headers, body = conn.accept_request()
        got["headers"] = dict(headers)
        got["body"] = body
        conn.send_response_headers(sid)
        conn.send_data(sid, b"\x01\x02\x03")
        conn.send_trailers(sid, 0)

    t = threading.Thread(target=server, daemon=True)
    t.start()
    client = H.H2ClientConnection(fa)
    sid = client.request("/svc/Method", "example:1", extra=[("x-k", "v")])
    client.send_data(sid, b"reqbytes", end_stream=True)
    events = list(client.events(sid))
    t.join(timeout=5)

    assert got["headers"][":method"] == "POST"
    assert got["headers"][":path"] == "/svc/Method"
    assert got["headers"]["x-k"] == "v"
    assert got["body"] == b"reqbytes"
    kinds = [k for k, _ in events]
    assert kinds == ["headers", "data", "trailers"]
    assert events[1][1] == b"\x01\x02\x03"
    assert dict(events[0][1])[":status"] == "200"
    assert dict(events[2][1])["grpc-status"] == "0"
    for h in (fa, fb, sa, sb):
        h.close()


def test_continuation_frames_reassembled():
    import socket
    import threading

    sa, sb = socket.socketpair()
    fa, fb = sa.makefile("rwb"), sb.makefile("rwb")

    def server():
        conn = H.H2ServerConnection(fb)
        sid, headers, _ = conn.accept_request()
        # response header block split across HEADERS + CONTINUATION
        block = conn.enc.encode([(":status", "200"), ("x-long", "y" * 40)])
        H.write_frame(conn.f, H.HEADERS, 0, sid, block[:10])
        H.write_frame(conn.f, H.CONTINUATION, H.F_END_HEADERS, sid, block[10:])
        conn.send_trailers(sid, 0)

    t = threading.Thread(target=server, daemon=True)
    t.start()
    client = H.H2ClientConnection(fa)
    sid = client.request("/x", "a")
    client.send_data(sid, b"", end_stream=True)
    events = list(client.events(sid))
    t.join(timeout=5)
    assert dict(events[0][1])["x-long"] == "y" * 40
    for h in (fa, fb, sa, sb):
        h.close()


def test_ping_answered_with_ack():
    import socket
    import threading

    sa, sb = socket.socketpair()
    fa, fb = sa.makefile("rwb"), sb.makefile("rwb")
    acked = {}

    def server():
        conn = H.H2ServerConnection(fb)
        sid, _, _ = conn.accept_request()
        conn.send_response_headers(sid)
        H.write_frame(conn.f, H.PING, 0, 0, b"12345678")
        # client must answer PING ack before it sees the trailer
        while True:
            fr = H.read_frame(conn.f)
            if fr and fr[0] == H.PING and fr[1] & H.F_ACK:
                acked["payload"] = fr[3]
                break
        conn.send_trailers(sid, 0)

    t = threading.Thread(target=server, daemon=True)
    t.start()
    client = H.H2ClientConnection(fa)
    sid = client.request("/x", "a")
    client.send_data(sid, b"", end_stream=True)
    events = list(client.events(sid))
    t.join(timeout=5)
    assert acked["payload"] == b"12345678"
    assert [k for k, _ in events] == ["headers", "trailers"]
    for h in (fa, fb, sa, sb):
        h.close()


def test_bad_preface_rejected():
    class FakeFile(io.BytesIO):
        def flush(self):
            pass

    f = FakeFile(b"GET / HTTP/1.1\r\n" + b"\x00" * 16)
    with pytest.raises(H.H2Error, match="preface"):
        H.H2ServerConnection(f)


def test_rst_stream_surfaces():
    import socket
    import threading

    sa, sb = socket.socketpair()
    fa, fb = sa.makefile("rwb"), sb.makefile("rwb")

    def server():
        conn = H.H2ServerConnection(fb)
        sid, _, _ = conn.accept_request()
        H.write_frame(conn.f, H.RST_STREAM, 0, sid, struct.pack(">I", 8))  # CANCEL

    t = threading.Thread(target=server, daemon=True)
    t.start()
    client = H.H2ClientConnection(fa)
    sid = client.request("/x", "a")
    client.send_data(sid, b"", end_stream=True)
    events = list(client.events(sid))
    t.join(timeout=5)
    assert ("rst", 8) in events
    for h in (fa, fb, sa, sb):
        h.close()


def test_hpack_property_roundtrip():
    """Any header list roundtrips through paired encoder/decoder contexts,
    including repeated blocks exercising the dynamic table."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name_st = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz-:0123456789", min_size=1, max_size=24
    )
    value_st = st.text(min_size=0, max_size=48).filter(
        lambda s: all(ord(c) < 0x110000 for c in s)
    )
    headers_st = st.lists(st.tuples(name_st, value_st), min_size=0, max_size=12)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(headers_st, min_size=1, max_size=4))
    def check(blocks):
        enc, dec = H.HpackCodec(), H.HpackCodec()
        for hdrs in blocks:
            assert dec.decode(enc.encode(hdrs)) == hdrs

    check()


def test_hpack_integer_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 2**40), st.integers(1, 8))
    def check(value, prefix):
        data = H.encode_int(value, prefix)
        got, used = H.decode_int(data, 0, prefix)
        assert got == value and used == len(data)

    check()
