"""Pure-Python Avro Object Container File codec — the archive-compatibility
edge (S1/S11 read/write of the reference's ``.avro`` files).

This environment has neither the spark-avro datasource nor a Python avro
library, so the container format (spec: Apache Avro 1.12 "Object Container
Files") is implemented directly: header magic ``Obj\\x01``, file-metadata map
carrying the writer schema JSON and codec, 16-byte sync marker, then blocks
of ``(record_count, byte_size, payload, sync)``. Codecs: ``null``,
``deflate`` (zlib raw), ``snappy`` (raw snappy + CRC32 suffix, decompressed
via pyarrow's codec). Binary encoding: zigzag-varint ints/longs, length-
prefixed bytes/strings, union index prefix, block-coded arrays/maps.

Scale: decoding is Python-side and intended for the compat path only (the
native analytic format is Parquet). ``read_avro_df`` distributes decoding by
file — one task per file via ``mapInPandas`` over the path list — so a
million-file archive still decodes cluster-wide.

Reference parity: reads the reference's own mainnet fixtures
(``/root/reference/testdata/fullAvroFiles/``, golden counts 1 block /
2,498 txes, ``src/storage/avro_reader.rs:79-103``).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterator

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------

def _read_varint(buf: io.BufferedIOBase) -> int:
    shift = 0
    result = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError
        byte = b[0]
        result |= (byte & 0x7F) << shift
        if not (byte & 0x80):
            break
        shift += 7
    return result


def _read_long(buf: io.BufferedIOBase) -> int:
    n = _read_varint(buf)
    return (n >> 1) ^ -(n & 1)


def _write_long(out: io.BufferedIOBase, value: int) -> None:
    n = (value << 1) ^ (value >> 63)
    while True:
        to_write = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([to_write | 0x80]))
        else:
            out.write(bytes([to_write]))
            break


def _read_bytes(buf: io.BufferedIOBase) -> bytes:
    return buf.read(_read_long(buf))


def _write_bytes(out: io.BufferedIOBase, value: bytes) -> None:
    _write_long(out, len(value))
    out.write(value)


# ---------------------------------------------------------------------------
# schema-driven record codec
# ---------------------------------------------------------------------------

def _decode(schema: Any, buf: io.BufferedIOBase) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1)[0] == 1
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unsupported primitive {t}")
    if isinstance(schema, list):  # union: long index then value
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)  # block byte size, unused
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
        return out
    if t == "fixed":
        return buf.read(schema["size"])
    # logical types ride on the underlying primitive (timestamp-millis → long)
    return _decode(t, buf)


def _encode(schema: Any, value: Any, out: io.BufferedIOBase) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            _write_long(out, int(value))
        elif t == "float":
            out.write(struct.pack("<f", float(value)))
        elif t == "double":
            out.write(struct.pack("<d", float(value)))
        elif t == "bytes":
            _write_bytes(out, bytes(value))
        elif t == "string":
            _write_bytes(out, str(value).encode("utf-8"))
        else:
            raise ValueError(f"unsupported primitive {t}")
        return
    if isinstance(schema, list):  # union: pick first matching branch
        for idx, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type", branch)
            if value is None and bt == "null":
                _write_long(out, idx)
                return
            if value is not None and bt != "null":
                _write_long(out, idx)
                _encode(branch, value, out)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), out)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out)
        _write_long(out, 0)
    elif t == "fixed":
        out.write(bytes(value))
    else:
        _encode(t, value, out)


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------

def _snappy_decompress(payload: bytes) -> bytes:
    import pyarrow as pa

    raw = payload[:-4]  # trailing CRC32 of the uncompressed data
    # raw-snappy header: uncompressed length as unsigned varint
    size = 0
    shift = 0
    for byte in raw:
        size |= (byte & 0x7F) << shift
        if not (byte & 0x80):
            break
        shift += 7
    return pa.decompress(raw, decompressed_size=size, codec="snappy").to_pybytes()


def _zstd_decompress(payload: bytes) -> bytes:
    """Decompress one zstd frame without knowing the content size up front —
    streaming-mode frames (no FCS header field, what the reference's Rust
    encoder emits) decompress the same as single-shot frames."""
    import pyarrow as pa

    with pa.CompressedInputStream(pa.BufferReader(payload), "zstd") as s:
        return s.read()


def _snappy_compress(data: bytes) -> bytes:
    """Avro-spec snappy block: raw snappy (with its uncompressed-length
    varint preamble) + 4-byte big-endian CRC32 of the UNCOMPRESSED data —
    the exact inverse of ``_snappy_decompress``."""
    import struct

    import pyarrow as pa

    raw = bytes(pa.Codec("snappy").compress(data))
    return raw + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)


def _zstd_compress(data: bytes, level: int = 9) -> bytes:
    """zstd level 9 — the reference's default block compression
    (``src/global.rs:34-40``)."""
    import pyarrow as pa

    return bytes(pa.Codec("zstd", compression_level=level).compress(data))


def read_avro_schema(path: str) -> dict:
    """The writer schema embedded in an Avro container file's header."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not an Avro container file")
        meta: dict[str, bytes] = {}
        while True:
            n = _read_long(f)
            if n == 0:
                break
            if n < 0:
                _read_long(f)
                n = -n
            for _ in range(n):
                k = _read_bytes(f).decode("utf-8")
                meta[k] = _read_bytes(f)
        return json.loads(meta["avro.schema"])


def read_avro_records(path: str, expected_record: str | None = None) -> Iterator[dict]:
    """Stream decoded records from one Avro container file.

    ``expected_record`` asserts the writer schema's record name (the
    reference's schema check on read, ``avro_reader.rs:28-45`` intent) —
    a txes file opened as blocks fails loudly instead of yielding nulls."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not an Avro container file")
        meta: dict[str, bytes] = {}
        while True:
            n = _read_long(f)
            if n == 0:
                break
            if n < 0:
                _read_long(f)
                n = -n
            for _ in range(n):
                k = _read_bytes(f).decode("utf-8")
                meta[k] = _read_bytes(f)
        schema = json.loads(meta["avro.schema"])
        if expected_record is not None and schema.get("name") != expected_record:
            raise ValueError(
                f"{path}: schema mismatch — contains {schema.get('name')!r}, "
                f"expected {expected_record!r}"
            )
        codec = meta.get("avro.codec", b"null").decode()
        sync = f.read(16)
        while True:
            try:
                count = _read_long(f)
            except EOFError:
                return
            payload = _read_bytes(f)
            if f.read(16) != sync:
                raise ValueError(f"{path}: sync marker mismatch")
            if codec == "null":
                data = payload
            elif codec == "deflate":
                data = zlib.decompress(payload, -15)
            elif codec == "snappy":
                data = _snappy_decompress(payload)
            elif codec in ("zstandard", "zstd"):
                data = _zstd_decompress(payload)
            else:
                raise ValueError(f"{path}: unsupported codec {codec}")
            buf = io.BytesIO(data)
            for _ in range(count):
                yield _decode(schema, buf)


def write_avro_records(
    path,
    schema: dict,
    records: list[dict],
    codec: str = "deflate",
    block_records: int = 1000,
) -> None:
    """Write records into an Avro container (null/deflate/snappy/zstandard).

    ``path`` is a filename or any binary file-like (the object-store sink
    serializes in memory)."""
    if codec == "zstd":
        codec = "zstandard"  # the spec'd codec name in the container header
    sync = os.urandom(16)
    from contextlib import nullcontext

    ctx = nullcontext(path) if hasattr(path, "write") else open(path, "wb")
    with ctx as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        _write_long(f, len(meta))
        for k, v in meta.items():
            _write_bytes(f, k.encode())
            _write_bytes(f, v)
        _write_long(f, 0)
        f.write(sync)
        for i in range(0, max(len(records), 1), block_records):
            chunk = records[i : i + block_records]
            if not chunk:
                break
            buf = io.BytesIO()
            for rec in chunk:
                _encode(schema, rec, buf)
            data = buf.getvalue()
            if codec == "deflate":
                co = zlib.compressobj(9, zlib.DEFLATED, -15)
                data = co.compress(data) + co.flush()
            elif codec in ("zstandard", "zstd"):
                data = _zstd_compress(data)
            elif codec == "snappy":
                data = _snappy_compress(data)
            elif codec != "null":
                raise ValueError(f"unsupported write codec {codec}")
            _write_long(f, len(chunk))
            _write_bytes(f, data)
            f.write(sync)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

_RECORD_NAMES = {"blocks": "Block", "transactions": "Transaction", "traces": "TransactionTrace"}


def read_avro_df(
    spark, paths: list[str], spark_schema, with_path: bool = False, expected_record: str | None = None
):
    """Distributed Avro read: one task per file decodes via ``mapInPandas``.

    Timestamp-millis longs are converted according to the target Spark
    schema; unknown writer fields are dropped, missing ones null-filled.
    ``with_path=True`` appends a ``_path`` column (the Avro analog of
    ``input_file_name()``)."""
    import pandas as pd
    from pyspark.sql import types as T

    from .tables import _prepare  # noqa: F401 (keeps session conf consistent)
    from ..session import ship_package

    ship_package(spark)
    out_schema = spark_schema
    if with_path:
        out_schema = T.StructType(
            list(spark_schema.fields) + [T.StructField("_path", T.StringType(), False)]
        )
    names = [f.name for f in spark_schema.fields]
    ts_cols = {
        f.name for f in spark_schema.fields if f.dataType.typeName().startswith("timestamp")
    }
    cols = names + (["_path"] if with_path else [])

    def gen(batches):
        for pdf in batches:
            for path in pdf["path"].tolist():
                rows = []
                for rec in read_avro_records(path, expected_record=expected_record):
                    row = {n: rec.get(n) for n in names}
                    for c in ts_cols:
                        if row[c] is not None:
                            row[c] = pd.Timestamp(int(row[c]), unit="ms")
                    if with_path:
                        row["_path"] = path
                    rows.append(row)
                yield pd.DataFrame(rows, columns=cols)

    pdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        min(len(paths), 256) or 1
    )
    return pdf.mapInPandas(gen, schema=out_schema)


def read_archive_data(spark, full_paths: list[str], kind: str):
    """Format-dispatching archive read: parquet natively, ``.avro`` through
    the container codec — both with a ``_path`` column, unioned into one
    DataFrame so verify/compact are format-agnostic."""
    from pyspark.sql import functions as F

    from ..schemas import TABLE_SCHEMAS

    pq = [p for p in full_paths if p.endswith(".parquet")]
    av = [p for p in full_paths if p.endswith(".avro")]
    parts = []
    if pq:
        parts.append(
            spark.read.parquet(*pq).withColumn("_path", F.input_file_name())
        )
    if av:
        parts.append(
            read_avro_df(
                spark,
                av,
                TABLE_SCHEMAS[kind],
                with_path=True,
                expected_record=_RECORD_NAMES.get(kind),
            )
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
