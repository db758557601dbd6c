"""TLS trust wiring for S3-compatible endpoints (``--aws.trust-tls``).

The reference exposes ``--aws.trust-tls`` — "trust any TLS certificate" —
for pointing the archive at an S3-compatible store with a self-signed
certificate (the stock MinIO deployment; ``/root/reference/src/args.rs:248-250``).

pyarrow's ``S3FileSystem`` (AWS C++ SDK over libcurl/OpenSSL, pyarrow 16)
exposes no verification toggle, so outright disabling verification is not
possible here. What IS possible — and strictly safer — is trust-on-first-use
pinning: fetch the certificate the endpoint actually presents (one
unverified TLS handshake, exactly what ``openssl s_client`` does), write it
to a PEM, and install that PEM as the process's OpenSSL trust root via
``SSL_CERT_FILE``. OpenSSL loads ``SSL_CERT_FILE`` whenever default verify
paths are requested, which is how libcurl inside the bundled AWS SDK builds
its trust store — verified empirically against an HTTPS-wrapped S3 stub
(``tests/test_s3_roundtrip.py``): unreachable without the pin, green with it.
For a self-signed certificate the leaf IS the root, so pinning it makes the
chain verify; hostname verification still runs against the cert's SAN/CN.

Caveats, stated not hidden:

- ``SSL_CERT_FILE`` is process-global: every OpenSSL default-trust handshake
  in this process now trusts ONLY the pinned cert (plus anything else in the
  file). That is the right scope for a CLI run pointed at one private
  object store, and the reason this module refuses to activate implicitly.
- The trust store is loaded ONCE per process (first S3 client); the pin
  must therefore be installed before any ``S3FileSystem`` exists. The CLI
  guarantees this by wiring the flag during argument processing, before a
  Spark session or filesystem resolution; embedded callers must call
  ``trust_s3_endpoint`` equally early (verified by the subprocess-isolated
  tests in ``tests/test_s3_roundtrip.py``).
- Executors: in ``local[*]`` mode (this engine's test envelope) executor
  threads share the driver process and inherit the env. On a real cluster
  set ``spark.executorEnv.SSL_CERT_FILE`` (or bake the CA into the image) —
  executor-side ``FileSystem.from_uri`` calls build their own S3 clients.
- A certificate signed by a private CA (not self-signed) should be trusted
  via ``--tls-ca <pem>`` instead — deterministic trust of the CA you hold,
  no network fetch; trust-on-first-use only pins whatever the network
  presented at startup.
"""

from __future__ import annotations

import os
import ssl
import tempfile

__all__ = ["fetch_server_certificate", "trust_s3_endpoint"]


def fetch_server_certificate(host: str, port: int, timeout: float = 10.0) -> str:
    """One UNVERIFIED handshake to (host, port); returns the presented leaf
    certificate as PEM text. This is the trust-on-first-use fetch — the
    caller decides to pin it, nothing is installed here."""
    return ssl.get_server_certificate((host, port), timeout=timeout)


def trust_s3_endpoint(
    endpoint: str | None,
    tls_ca: str | None = None,
    _env: dict | None = None,
) -> str | None:
    """Wire ``--aws.trust-tls`` for ``endpoint`` (``host:port``, optionally
    ``http(s)://``-prefixed, or None for AWS itself).

    Resolution order:
    - ``tls_ca`` given → install THAT PEM as the trust root (private-CA
      deployments; no network fetch).
    - https (explicit or default — pyarrow's default scheme is https) →
      fetch-and-pin the endpoint's presented certificate.
    - plain ``http://`` endpoint or no endpoint (real AWS, publicly trusted
      certs) → accepted no-op, matching the reference flag's behavior when
      there is nothing to trust.

    Returns the installed PEM path (None for the no-op cases). ``_env`` is
    a test seam standing in for ``os.environ``.
    """
    env = os.environ if _env is None else _env
    if tls_ca:
        env["SSL_CERT_FILE"] = os.path.abspath(tls_ca)
        return env["SSL_CERT_FILE"]
    if not endpoint:
        return None
    ep, scheme = endpoint, "https"
    for s in ("http", "https"):
        if ep.startswith(s + "://"):
            scheme, ep = s, ep[len(s) + 3 :]
    if scheme != "https":
        return None
    host, _, port = ep.partition(":")
    pem = fetch_server_certificate(host, int(port or 443))
    fd, path = tempfile.mkstemp(prefix="s3-pinned-", suffix=".pem")
    with os.fdopen(fd, "w") as f:
        f.write(pem)
    env["SSL_CERT_FILE"] = path
    return path
