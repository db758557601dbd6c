"""Object-store round-trip over a real (stubbed) S3 HTTP endpoint.

Rounds ≤4 left this seam untested: `ref_layout` writes and archive listings
accepted URI roots via pyarrow, but no S3-compatible endpoint had ever
served them. These tests run the actual S3 REST protocol — multipart
uploads, ranged GETs, ListObjectsV2 — against `stub_s3`'s in-memory store
(reference exercises the same seam in-memory: ``objects.rs:388-611``).
"""

import io

import pytest

import pyarrow.fs as pafs
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dshackle_archive_spark.core import DataKind, Range
from dshackle_archive_spark.sources import archive as ARC
from dshackle_archive_spark.sources import ref_layout as RL
from dshackle_archive_spark.sources.fetcher import FetchPolicy, fetch_blocks
from dshackle_archive_spark.sources.mock_chain import MockChain
from stub_s3 import start_s3_stub

CHAIN = MockChain(head_height=10_000)
POLICY = FetchPolicy(parallel=4)


@pytest.fixture()
def s3():
    endpoint, srv = start_s3_stub()
    host = endpoint[len("http://") :]
    q = f"endpoint_override={host}&scheme=http&allow_bucket_creation=true"
    root = f"s3://k:s@archive/cold?{q}"
    yield root, srv
    srv.shutdown()


def _blocks_df(spark, n=20):
    return fetch_blocks(spark, CHAIN, Range(0, n - 1), POLICY)


def test_range_files_write_list_read_on_s3(spark, s3):
    root, srv = s3
    df = _blocks_df(spark)
    res = RL.write_range_files(
        df, root, "ETH", DataKind.BLOCKS, chunk=10, requested=Range(0, 19)
    ).collect()
    assert len(res) == 2 and all(not r["skipped"] for r in res)
    # the writer really spoke multipart S3, not a local fallback
    assert srv.requests.get("CompleteMultipartUpload", 0) >= 2

    # list through the same endpoint and parse the inventory
    inv = ARC.inventory_df(spark, root, "ETH")
    rows = {(r["kind"], r["start"], r["end"]) for r in inv.collect()}
    assert rows == {("blocks", 0, 9), ("blocks", 10, 19)}

    # read an object back (ranged-GET path) and check content fidelity
    fs, base = pafs.FileSystem.from_uri(root)
    key = f"{base}/eth/" + inv.orderBy("start").first()["path"].split("eth/")[-1]
    with fs.open_input_file(key) as f:
        table = pq.read_table(f)
    assert table.column("height").to_pylist() == list(range(10))
    assert srv.requests.get("GetObject", 0) >= 1


def test_s3_write_is_idempotent_without_overwrite(spark, s3):
    root, srv = s3
    df = _blocks_df(spark, 10)
    first = RL.write_range_files(
        df, root, "ETH", DataKind.BLOCKS, chunk=10, requested=Range(0, 9)
    ).collect()
    again = RL.write_range_files(
        df, root, "ETH", DataKind.BLOCKS, chunk=10, requested=Range(0, 9)
    ).collect()
    assert [r["skipped"] for r in first] == [False]
    assert [r["skipped"] for r in again] == [True]  # S13 skip-if-exists via HEAD
    assert srv.requests.get("HeadObject", 0) >= 1


def test_single_files_on_s3(spark, s3):
    """Stream-mode single-block files (T5 fork tolerance) on an object
    store: one PUT-committed object per height, inventory parses back."""
    root, srv = s3
    df = _blocks_df(spark, 3)
    RL.write_single_files(df, root, "ETH", DataKind.BLOCKS).collect()
    inv = ARC.inventory_df(spark, root, "ETH")
    got = {(r["start"], r["end"]) for r in inv.collect()}
    assert got == {(0, 0), (1, 1), (2, 2)}
    # every file is a real object in the store, under the chain prefix
    keys = {k for (_b, k) in srv.objects if k.endswith(".parquet")}
    assert len(keys) == 3 and all(k.startswith("cold/eth/") for k in keys)


# --------------------------------------------------------------------------
# --aws.trust-tls: self-signed HTTPS endpoint (the MinIO scenario)
# --------------------------------------------------------------------------

def _self_signed_pair(tmp_path):
    """Self-signed cert+key for 127.0.0.1 (SAN ip), à la stock MinIO."""
    import datetime
    import ipaddress

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime(2026, 1, 1)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=3650))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(ipaddress.ip_address("127.0.0.1"))]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_path, key_path = str(tmp_path / "cert.pem"), str(tmp_path / "key.pem")
    with open(cert_path, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_path, "wb") as f:
        f.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
    return cert_path, key_path


@pytest.fixture()
def s3_https(tmp_path):
    """The wire-level stub behind a self-signed TLS socket; restores the
    process trust root (SSL_CERT_FILE) afterwards."""
    import os
    import ssl

    pytest.importorskip("cryptography")
    cert_path, key_path = _self_signed_pair(tmp_path)
    endpoint, srv = start_s3_stub()
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_path, key_path)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    port = endpoint.rsplit(":", 1)[1]
    saved = os.environ.get("SSL_CERT_FILE")
    yield f"https://127.0.0.1:{port}", srv, cert_path
    srv.shutdown()
    if saved is None:
        os.environ.pop("SSL_CERT_FILE", None)
    else:
        os.environ["SSL_CERT_FILE"] = saved


_PIN_PROBE = """
import os, sys
sys.path.insert(0, {repo!r})
if sys.argv[1] == "pin":
    from dshackle_archive_spark.sources.s3_tls import trust_s3_endpoint
    pem = trust_s3_endpoint({endpoint!r})
    assert pem == os.environ["SSL_CERT_FILE"] and os.path.exists(pem)
import pyarrow.fs as pafs
fs, base = pafs.FileSystem.from_uri(
    "s3://k:s@tbucket/p?endpoint_override={host}&scheme=https"
    "&allow_bucket_creation=true")
fs.create_dir(base, recursive=True)
with fs.open_output_stream(base + "/a.bin") as w:
    w.write(b"pinned")
print("WROTE")
"""


def test_trust_tls_pins_self_signed_endpoint(s3_https):
    """Without the pin, pyarrow refuses the self-signed endpoint; with
    trust_s3_endpoint's fetch-and-pin installed first, the same writes go
    through. Each probe runs in a FRESH process because OpenSSL loads the
    default trust store once per process — exactly the constraint the CLI
    honors by wiring the flag before any S3 client exists."""
    import os
    import subprocess
    import sys

    endpoint, srv, _cert = s3_https
    host = endpoint[len("https://"):]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _PIN_PROBE.format(repo=repo, endpoint=endpoint, host=host)
    env = {k: v for k, v in os.environ.items() if k != "SSL_CERT_FILE"}

    bare = subprocess.run([sys.executable, "-c", script, "bare"],
                          capture_output=True, text=True, env=env, timeout=120)
    assert bare.returncode != 0 and "WROTE" not in bare.stdout
    assert "certificate" in (bare.stdout + bare.stderr) or \
        "curlCode" in (bare.stdout + bare.stderr), bare.stderr[-400:]

    pinned = subprocess.run([sys.executable, "-c", script, "pin"],
                            capture_output=True, text=True, env=env, timeout=120)
    assert pinned.returncode == 0 and "WROTE" in pinned.stdout, \
        pinned.stderr[-400:]
    assert ("tbucket", "p/a.bin") in srv.objects


def test_trust_tls_prefers_explicit_ca_and_noops_on_http(tmp_path):
    from dshackle_archive_spark.sources.s3_tls import trust_s3_endpoint

    ca = tmp_path / "private-ca.pem"
    ca.write_text("dummy")
    env: dict = {}
    # explicit CA wins, no network fetch
    assert trust_s3_endpoint("https://1.2.3.4:9", tls_ca=str(ca), _env=env) \
        == env["SSL_CERT_FILE"]
    assert env["SSL_CERT_FILE"].endswith("private-ca.pem")
    # plaintext endpoint / no endpoint: accepted no-ops
    assert trust_s3_endpoint("http://1.2.3.4:9", _env={}) is None
    assert trust_s3_endpoint(None, _env={}) is None


def test_cli_archive_trust_tls_e2e(s3_https):
    """Reference drop-in: `archive --aws.endpoint https://… --aws.trust-tls`
    against the self-signed HTTPS stub, end to end through the CLI
    (args.rs:248-250 — the exact self-signed-MinIO scenario the reference
    flag exists for). Runs in a fresh process: the CLI installs the pin
    during argument processing, before the first S3 client — the per-
    process trust-store constraint the in-process pytest runner violates."""
    import json as _json
    import os
    import subprocess
    import sys

    endpoint, srv, _cert = s3_https
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from dshackle_archive_spark import cli\n"
        "raise SystemExit(cli.main([\n"
        "  'archive', '--dir', 's3://archive/cold?allow_bucket_creation=true',\n"
        "  '--range', '100..149', '--tables', 'blocks', '--provider', 'mock',\n"
        "  '--range-chunk', '50', '--master', 'local[4]',\n"
        "  '--auth-aws-access-key', 'k', '--auth-aws-secret-key', 's',\n"
        "  '--aws-endpoint', {endpoint!r}, '--aws-region', 'us-east-1',\n"
        "  '--aws.trust-tls',\n"
        "]))\n"
    ).format(repo=repo, endpoint=endpoint)
    env = {k: v for k, v in os.environ.items() if k != "SSL_CERT_FILE"}
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stderr[-600:]
    out = _json.loads(res.stdout.strip().splitlines()[-1])
    assert out["written"] == 1
    keys = [k for (_b, k) in srv.objects]
    assert any(k.endswith("range-000000100_000000149.blocks.parquet")
               for k in keys), keys
