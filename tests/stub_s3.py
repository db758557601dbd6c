"""Minimal S3-compatible object store served from memory (stdlib only).

Implements the slice of the S3 REST API that pyarrow's ``S3FileSystem``
(AWS C++ SDK) actually issues for this engine's archive flows: bucket
HEAD/PUT, object GET (with Range) / HEAD / PUT / DELETE, ListObjectsV2,
and the multipart-upload trio pyarrow uses for every output stream
(initiate / upload-part / complete). Authorization headers are accepted and
ignored (SigV4 verification is the real service's job, not the protocol
shape under test). This gives the object-store code paths
(``ref_layout._fs_and_path`` writers, pyarrow listings) a real HTTP
round-trip — the reference exercises the same seam against its in-memory
object store (``src/storage/objects.rs:388-611``).
"""

from __future__ import annotations

import threading
from datetime import datetime, timezone
from hashlib import md5
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse


def start_s3_stub() -> tuple[str, ThreadingHTTPServer]:
    """Serve on an ephemeral port; returns (endpoint 'http://h:p', server).
    ``server.objects`` is {(bucket, key): bytes}; ``server.requests`` counts
    API hits by operation name."""

    objects: dict[tuple[str, str], bytes] = {}
    buckets: set[str] = set()
    uploads: dict[str, dict[int, bytes]] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def _count(self, op: str):
            with lock:
                srv.requests[op] = srv.requests.get(op, 0) + 1

        def _split(self) -> tuple[str, str, dict]:
            u = urlparse(self.path)
            parts = u.path.lstrip("/").split("/", 1)
            bucket = parts[0]
            key = unquote(parts[1]) if len(parts) > 1 else ""
            return bucket, key, parse_qs(u.query, keep_blank_values=True)

        def _send(self, code: int, body: bytes = b"", headers: dict | None = None):
            self.send_response(code)
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def _404(self, code_str: str = "NoSuchKey"):
            body = (f'<?xml version="1.0"?><Error><Code>{code_str}</Code>'
                    f"</Error>").encode()
            self._send(404, body, {"Content-Type": "application/xml"})

        def _read_body(self) -> bytes:
            ln = int(self.headers.get("Content-Length") or 0)
            return self.rfile.read(ln) if ln else b""

        # ---- GET: object (w/ Range) or ListObjectsV2 ----------------------
        def do_GET(self):
            bucket, key, q = self._split()
            if not key:
                return self._list(bucket, q)
            self._count("GetObject")
            with lock:
                data = objects.get((bucket, key))
            if data is None:
                return self._404()
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                lo_s, _, hi_s = rng[6:].partition("-")
                lo = int(lo_s or 0)
                hi = int(hi_s) if hi_s else len(data) - 1
                part = data[lo : hi + 1]
                self._send(
                    206, part,
                    {"Content-Range": f"bytes {lo}-{lo + len(part) - 1}/{len(data)}",
                     "ETag": f'"{md5(data).hexdigest()}"',
                     "Accept-Ranges": "bytes"},
                )
            else:
                self._send(200, data, {"ETag": f'"{md5(data).hexdigest()}"',
                                       "Accept-Ranges": "bytes"})

        def _list(self, bucket: str, q: dict):
            self._count("ListObjectsV2")
            if bucket not in buckets:
                with lock:
                    known = any(b == bucket for b, _ in objects)
                if not known:
                    return self._404("NoSuchBucket")
            prefix = (q.get("prefix") or [""])[0]
            delim = (q.get("delimiter") or [""])[0]
            with lock:
                keys = sorted(k for b, k in objects if b == bucket and k.startswith(prefix))
            contents, common = [], []
            seen_prefix: set[str] = set()
            now = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.000Z")
            for k in keys:
                if delim:
                    rest = k[len(prefix):]
                    if delim in rest:
                        p = prefix + rest.split(delim, 1)[0] + delim
                        if p not in seen_prefix:
                            seen_prefix.add(p)
                            common.append(f"<CommonPrefixes><Prefix>{p}</Prefix></CommonPrefixes>")
                        continue
                with lock:
                    size = len(objects[(bucket, k)])
                contents.append(
                    f"<Contents><Key>{k}</Key><Size>{size}</Size>"
                    f"<LastModified>{now}</LastModified>"
                    f'<ETag>"0"</ETag><StorageClass>STANDARD</StorageClass></Contents>'
                )
            body = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                '<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
                f"<Name>{bucket}</Name><Prefix>{prefix}</Prefix>"
                f"<KeyCount>{len(contents) + len(common)}</KeyCount>"
                f"<MaxKeys>1000</MaxKeys><IsTruncated>false</IsTruncated>"
                + "".join(contents) + "".join(common)
                + "</ListBucketResult>"
            ).encode()
            self._send(200, body, {"Content-Type": "application/xml"})

        # ---- HEAD: bucket or object ---------------------------------------
        def do_HEAD(self):
            bucket, key, _ = self._split()
            self._count("HeadObject" if key else "HeadBucket")
            if not key:
                with lock:
                    ok = bucket in buckets or any(b == bucket for b, _ in objects)
                return self._send(200 if ok else 404)
            with lock:
                data = objects.get((bucket, key))
            if data is None:
                return self._send(404)
            # HEAD: Content-Length advertises the OBJECT size, body omitted
            self.send_response(200)
            self.send_header("ETag", f'"{md5(data).hexdigest()}"')
            self.send_header("Accept-Ranges", "bytes")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()

        # ---- PUT: bucket create, object put, or upload part ---------------
        def do_PUT(self):
            bucket, key, q = self._split()
            body = self._read_body()
            if not key:
                self._count("CreateBucket")
                with lock:
                    buckets.add(bucket)
                return self._send(200)
            if "partNumber" in q and "uploadId" in q:
                self._count("UploadPart")
                uid = q["uploadId"][0]
                part = int(q["partNumber"][0])
                with lock:
                    uploads.setdefault(uid, {})[part] = body
                return self._send(200, headers={"ETag": f'"{md5(body).hexdigest()}"'})
            self._count("PutObject")
            with lock:
                objects[(bucket, key)] = body
            self._send(200, headers={"ETag": f'"{md5(body).hexdigest()}"'})

        # ---- POST: multipart initiate / complete --------------------------
        def do_POST(self):
            bucket, key, q = self._split()
            body = self._read_body()
            if "uploads" in q:
                self._count("CreateMultipartUpload")
                uid = f"up-{len(uploads) + 1}-{abs(hash((bucket, key))) % 10_000}"
                with lock:
                    uploads[uid] = {}
                xml = (
                    '<?xml version="1.0"?><InitiateMultipartUploadResult>'
                    f"<Bucket>{bucket}</Bucket><Key>{key}</Key>"
                    f"<UploadId>{uid}</UploadId></InitiateMultipartUploadResult>"
                ).encode()
                return self._send(200, xml, {"Content-Type": "application/xml"})
            if "uploadId" in q:
                self._count("CompleteMultipartUpload")
                uid = q["uploadId"][0]
                with lock:
                    parts = uploads.pop(uid, {})
                    objects[(bucket, key)] = b"".join(
                        parts[i] for i in sorted(parts)
                    )
                xml = (
                    '<?xml version="1.0"?><CompleteMultipartUploadResult>'
                    f"<Bucket>{bucket}</Bucket><Key>{key}</Key>"
                    f'<ETag>"done"</ETag></CompleteMultipartUploadResult>'
                ).encode()
                return self._send(200, xml, {"Content-Type": "application/xml"})
            self._send(400)

        # ---- DELETE: object or abort upload -------------------------------
        def do_DELETE(self):
            bucket, key, q = self._split()
            if "uploadId" in q:
                self._count("AbortMultipartUpload")
                with lock:
                    uploads.pop(q["uploadId"][0], None)
                return self._send(204)
            self._count("DeleteObject")
            with lock:
                objects.pop((bucket, key), None)
            self._send(204)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    srv.objects = objects
    srv.requests = {}
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_address[1]}", srv
