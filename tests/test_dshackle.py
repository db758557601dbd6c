"""S8: gRPC-shaped dshackle transport — NativeCall/SubscribeHead framing,
byte fidelity, end-to-end archive→verify over the stub (reference
connection.rs:53-154 semantics)."""

import gzip
import io
import json
import pickle

import pytest

from dshackle_archive_spark.core import DataKind, Range
from dshackle_archive_spark.plans.archive_plan import archive
from dshackle_archive_spark.plans.verify_plan import verify
from dshackle_archive_spark.sources import dshackle as D
from dshackle_archive_spark.sources.fetcher import FetchPolicy
from dshackle_archive_spark.sources.rpc import EthereumRpcProvider

from stub_dshackle import start_dshackle_stub
from stub_rpc import EthChainModel

POLICY = FetchPolicy(parallel=4, attempts=3, backoff_base_s=0.01)
BT = (DataKind.BLOCKS, DataKind.TRANSACTIONS)


# -- protobuf wire codec -----------------------------------------------------

def test_varint_roundtrip():
    for n in (0, 1, 127, 128, 300, 2**21, 2**35, 2**63 - 1):
        buf = D._varint(n)
        val, i = D._read_varint(buf, 0)
        assert (val, i) == (n, len(buf))


def test_native_call_request_roundtrip():
    items = [(1, "eth_getBlockByNumber", b'["0x64", false]'), (2, "eth_blockNumber", b"[]")]
    buf = D.encode_native_call_request(100, items)
    chain, got = D.decode_native_call_request(buf)
    assert chain == 100 and got == items


def test_reply_item_roundtrip():
    buf = D.encode_reply_item(7, True, b'{"x": 1}')
    assert D.decode_reply_item(buf) == (7, True, b'{"x": 1}', "")
    buf = D.encode_reply_item(8, False, b"", "node exploded")
    assert D.decode_reply_item(buf) == (8, False, b"", "node exploded")


def test_chain_head_roundtrip():
    buf = D.encode_chain_head(100, 123456, "0xabc")
    assert D.decode_chain_head(buf) == (100, 123456, "0xabc")


def test_frame_gzip_roundtrip():
    buf = io.BytesIO()
    body = b'{"hello": "world"}' * 100
    D.write_frame(buf, body, compress=True)
    raw = buf.getvalue()
    assert raw[0] == D.FLAG_GZIP and gzip.decompress(raw[5:]) == body
    buf.seek(0)
    assert D.read_frame(buf) == (D.FLAG_GZIP, body)


def test_trailer_parse():
    assert D.parse_trailer(b"grpc-status: 0") == (0, "")
    assert D.parse_trailer(b"grpc-status: 14\r\ngrpc-message: unavailable") == (
        14,
        "unavailable",
    )


# -- NativeCall against the stub --------------------------------------------

@pytest.fixture(scope="module")
def dsh():
    url, srv = start_dshackle_stub(EthChainModel(head=500))
    yield url, EthChainModel(head=500)
    srv.shutdown()


def test_native_call_basics(dsh):
    url, model = dsh
    c = D.DshackleClient(url, chain="ETH")
    assert c.call("eth_blockNumber", []) == hex(500)
    blk, raw = c.call_bytes("eth_getBlockByNumber", [hex(100), False])
    assert blk["hash"] == model.block_hash(100)
    assert json.loads(raw) == model.block(100)


def test_native_call_error_propagates(dsh):
    url, _ = dsh
    c = D.DshackleClient(url, chain="ETH")
    with pytest.raises(D.DshackleError, match="unsupported method"):
        c.call("eth_noSuchMethod", [])


def test_native_call_gzip(dsh):
    url, model = dsh
    c = D.DshackleClient(url, chain="ETH", use_gzip=True)
    blk, _ = c.call_bytes("eth_getBlockByNumber", [hex(42), False])
    assert blk["hash"] == model.block_hash(42)


def test_payload_is_wire_bytes_from_pretty_node():
    """dshackle's reply payload IS the node's result bytes — an indented
    payload must reach call_raw untouched (avros.rs:54-57 fidelity)."""
    url, srv = start_dshackle_stub(EthChainModel(head=99), pretty=True)
    try:
        c = D.DshackleClient(url, chain="ETH")
        raw = c.call_raw("eth_getBlockByNumber", [hex(7), False])
        assert b"\n  " in raw  # indentation survived
        assert raw != json.dumps(json.loads(raw), separators=(",", ":")).encode()
    finally:
        srv.shutdown()


def test_client_is_picklable(dsh):
    url, _ = dsh
    c = D.DshackleClient(url, chain="ETH")
    assert c.call("eth_blockNumber", []) == hex(500)  # opens the socket
    c2 = pickle.loads(pickle.dumps(c))
    assert c2.call("eth_blockNumber", []) == hex(500)


def test_connection_reuse_across_calls():
    url, srv = start_dshackle_stub(EthChainModel(head=10))
    try:
        c = D.DshackleClient(url)
        for _ in range(10):
            c.call("eth_blockNumber", [])
        # sequential streams multiplex over ONE kept-alive connection
        assert srv.calls == 10 and srv.accepts == 1
    finally:
        srv.shutdown()


# -- end-to-end through Spark ------------------------------------------------

def test_archive_verify_over_dshackle(spark, tmp_path):
    """The full archive→verify cycle with the gRPC-shaped transport plugged
    into the same provider the JSON-RPC path uses (S8 via --provider
    seam)."""
    model = EthChainModel(head=500)
    url, srv = start_dshackle_stub(model)
    try:
        client = D.DshackleClient(url, chain="ETH")
        p = EthereumRpcProvider(url, client=client)
        res = archive(spark, p, str(tmp_path), Range(100, 109), tables=BT,
                      chunk=10, policy=POLICY)
        assert res.written == 2 and res.skipped == 0
        bdf = spark.read.parquet(
            str(tmp_path / "eth" / "000000000" / "range-000000100_000000109.blocks.parquet"))
        rows = {r["height"]: r for r in bdf.collect()}
        assert len(rows) == 10
        assert rows[100]["blockId"] == model.block_hash(100)
        assert json.loads(bytes(rows[100]["json"])) == model.block(100)
        rep = verify(spark, p, str(tmp_path), Range(100, 109), tables=BT)
        assert rep.failures == [] and rep.deleted == []
    finally:
        srv.shutdown()


def test_cli_accepts_dshackle_provider(spark, tmp_path):
    import contextlib
    import io as _io

    from dshackle_archive_spark import cli

    model = EthChainModel(head=500)
    url, srv = start_dshackle_stub(model)
    try:
        client = D.DshackleClient(url, chain="ETH")
        p = EthereumRpcProvider(url, client=client)
        archive(spark, p, str(tmp_path), Range(100, 109), tables=BT, chunk=10,
                policy=POLICY)
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "verify", "--dir", str(tmp_path), "--range", "100..109",
                "--provider", "eth-dshackle", "--rpc-url", url,
                "--master", "local[4]",
            ])
        assert rc == 0
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert out["ok"] == out["groups"] and out["failures"] == []
    finally:
        srv.shutdown()


# -- SubscribeHead streaming --------------------------------------------------

def test_subscribe_head_streams_heights():
    model = EthChainModel(head=100)
    url, srv = start_dshackle_stub(model)
    try:
        c = D.DshackleClient(url, chain="ETH")
        it = c.subscribe_head()
        h, bid = next(it)
        assert (h, bid) == (100, model.block_hash(100))
        model.head = 102
        assert next(it) == (101, model.block_hash(101))
        assert next(it) == (102, model.block_hash(102))
    finally:
        srv.shutdown()


def test_subscribe_head_ends_on_connection_drop():
    model = EthChainModel(head=100)
    url, srv = start_dshackle_stub(model, drop_subscription_after=2)
    try:
        c = D.DshackleClient(url, chain="ETH")
        it = c.subscribe_head()
        assert next(it) == (100, model.block_hash(100))
        model.head = 105
        # second message hits the drop threshold; the stream ends cleanly
        assert list(it) == [(101, model.block_hash(101))]
    finally:
        srv.shutdown()


def test_btc_archive_over_dshackle(spark, tmp_path):
    """S7 over S8: the Bitcoin provider through the NativeCall transport —
    the stub chain model is protocol-agnostic, so the same framed wire
    serves getblockhash/getblock/getrawtransaction."""
    from dshackle_archive_spark.sources.rpc import BitcoinRpcProvider

    from stub_rpc import BtcChainModel

    model = BtcChainModel(head=300)
    url, srv = start_dshackle_stub(model)
    try:
        client = D.DshackleClient(url, chain="BTC")
        p = BitcoinRpcProvider(url, client=client)
        assert p.head() == 300
        res = archive(spark, p, str(tmp_path), Range(100, 109), tables=BT,
                      chunk=10, policy=POLICY)
        assert res.written == 2
        rep = verify(spark, p, str(tmp_path), Range(100, 109), tables=BT)
        assert rep.failures == []
    finally:
        srv.shutdown()


# -- TLS transport (the reference connects TLS-by-default; --connection.notls
# disables it, args.rs:182-184) ----------------------------------------------

@pytest.fixture(scope="module")
def tls_cert(tmp_path_factory):
    """Self-signed cert for 127.0.0.1 (SAN-pinned), generated per test run."""
    import subprocess

    d = tmp_path_factory.mktemp("tls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "2",
         "-subj", "/CN=127.0.0.1",
         "-addext", "subjectAltName=IP:127.0.0.1"],
        check=True, capture_output=True,
    )
    return cert, key


def test_native_call_over_tls_alpn_h2(tls_cert):
    """Full NativeCall through a TLS+ALPN(h2) wrapped stub: the dshackles://
    scheme turns TLS on, the CA pin verifies the self-signed server, and
    payloads are byte-identical to the plaintext path."""
    cert, key = tls_cert
    model = EthChainModel(head=120)
    url, srv = start_dshackle_stub(model, tls_cert=cert, tls_key=key)
    try:
        assert url.startswith("dshackles://")
        c = D.DshackleClient(url, chain="ETH", tls_ca=cert)
        assert c.tls is True  # scheme-derived
        assert c.call("eth_blockNumber", []) == hex(120)
        c.close()
    finally:
        srv.shutdown()


def test_tls_override_and_verification():
    """tls=False override keeps a dshackles:// URL plaintext (the
    --connection.notls semantics), and an unpinned default context
    REFUSES the self-signed server instead of silently trusting it."""
    import ssl as _ssl

    model = EthChainModel(head=64)
    # plaintext stub + dshackles URL + explicit override -> works plaintext
    url, srv = start_dshackle_stub(model)
    try:
        c = D.DshackleClient(
            "dshackles://" + url[len("dshackle://"):], chain="ETH", tls=False
        )
        assert c.tls is False
        assert c.call("eth_blockNumber", []) == hex(64)
        c.close()
    finally:
        srv.shutdown()


def test_tls_rejects_unpinned_self_signed(tls_cert):
    import ssl as _ssl

    cert, key = tls_cert
    model = EthChainModel(head=64)
    url, srv = start_dshackle_stub(model, tls_cert=cert, tls_key=key)
    try:
        c = D.DshackleClient(url, chain="ETH")  # no CA pin
        with pytest.raises((_ssl.SSLError, D.DshackleError, OSError)):
            c.call("eth_blockNumber", [])
        c.close()
    finally:
        srv.shutdown()


def test_cli_archive_over_tls_dshackle(spark, tmp_path, tls_cert):
    """CLI end-to-end over the TLS transport: eth-dshackle provider with a
    dshackles:// URL and --tls-ca archives real blocks through the
    ALPN-h2 TLS stub."""
    import contextlib
    import io as _io

    from dshackle_archive_spark import cli

    cert, key = tls_cert
    model = EthChainModel(head=200)
    url, srv = start_dshackle_stub(model, tls_cert=cert, tls_key=key)
    try:
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "archive", "--dir", str(tmp_path), "--range", "100..119",
                "--tables", "blocks", "--provider", "eth-dshackle",
                "--rpc-url", url, "--tls-ca", cert,
                "--range-chunk", "20", "--master", "local[4]",
            ])
        assert rc == 0
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert out["written"] == 1
        df = spark.read.parquet(out["files"][0])
        assert df.count() == 20
    finally:
        srv.shutdown()


def test_cli_reference_spelling_drop_in(spark, tmp_path, tls_cert):
    """A reference command line works verbatim modulo the binary name:
    ``-b ETH -c HOST:PORT`` with dotted aliases — TLS on by default
    through -c, the eth-dshackle provider inferred, and
    ``--connection.notls`` reverting to plaintext."""
    import contextlib
    import io as _io

    from dshackle_archive_spark import cli

    def run(argv):
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main(argv)
        assert rc == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    # TLS default through -c (reference behavior), CA pinned
    cert, key = tls_cert
    url, srv = start_dshackle_stub(EthChainModel(head=300), tls_cert=cert, tls_key=key)
    hostport = url[len("dshackles://"):]
    try:
        out = run(["archive", "-b", "ETH", "-c", hostport,
                   "--tls-ca", cert, "-d", str(tmp_path / "a"),
                   "-r", "100..119", "-t", "blocks",
                   "--range.chunk", "20", "--master", "local[4]"])
        assert out["written"] == 1
    finally:
        srv.shutdown()

    # --connection.notls -> plaintext against a plaintext endpoint,
    # with the dotted dryRun alias exercised on verify
    url2, srv2 = start_dshackle_stub(EthChainModel(head=300))
    hostport2 = url2[len("dshackle://"):]
    try:
        out = run(["archive", "-b", "ETH", "-c", hostport2,
                   "--connection.notls", "-d", str(tmp_path / "b"),
                   "-r", "100..119", "-t", "blocks",
                   "--range.chunk", "20", "--master", "local[4]"])
        assert out["written"] == 1
        out = run(["verify", "-b", "ETH", "-c", hostport2,
                   "--connection.notls", "--dryRun",
                   "-d", str(tmp_path / "b"), "-r", "100..119",
                   "-t", "blocks", "--master", "local[4]"])
        assert out["dry_run"] is True and out["ok"] == 1
    finally:
        srv2.shutdown()
