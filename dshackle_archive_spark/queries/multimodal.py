"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import Window


from pyspark.sql import functions as F


from ._registry import _t, query


from ._shared import _HEXMAP


@query(
    "m1_multimodal_features",
    """
    SELECT doc_id AS media_id,
           'image' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents WHERE doc_id < 200
    """,
)
def m1_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing: binary payload column → Arrow-batched feature
    extraction (mapInPandas), hash-exact media dedup downstream. Payloads are
    synthesized from document text; the codec is the deterministic stub."""
    from ..operators.multimodal import MEDIA_SCHEMA, extract_features
    from ..session import ship_package

    ship_package(spark)  # workers must import this package for the UDF stage
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/png").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(10).alias("width"),
        F.lit(10).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return extract_features(media).select("media_id", "kind", "n_bytes", "sha256")


@query(
    "m2_frame_sample_plan",
    """
    WITH media AS (
      SELECT doc_id AS media_id, 500 * (doc_id % 20 + 1) AS duration_ms
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT m.media_id, CAST(t.i * 1000 AS BIGINT) AS frame_ts_ms
    FROM media m, range(0, 11) t(i)
    WHERE t.i * 1000 <= m.duration_ms
    """,
)
def m2_frame_sample_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame timestamp)
    to decode, generated entirely in Catalyst (sequence + explode over the
    clip duration — the decode itself is the Pandas codec stage). Media
    rows are synthesized from documents with deterministic durations; the
    oracle replays the expansion with generate_series."""
    from ..operators.multimodal import frame_sample_plan

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") % 3 == 0)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("video/mp4").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (500 * (F.col("doc_id") % 20 + 1)).alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000)


def _sha_byte_sql(i: int) -> str:
    """DuckDB expression for byte ``i`` of a hex sha256 digest column
    ``sha`` (two hex chars → int via a strpos lookup — engine-portable,
    no blob indexing)."""
    hexmap = "'0123456789abcdef'"
    hi = f"(strpos({hexmap}, substr(sha, {2 * i + 1}, 1)) - 1)"
    lo = f"(strpos({hexmap}, substr(sha, {2 * i + 2}, 1)) - 1)"
    return f"({hi} * 16 + {lo})"


# features travel as float32 (ArrayType(FloatType) — the realistic embedding
# width); the oracle replays the quantization: each term is rounded to REAL
# before the double-precision fold, exactly like Arrow float32 → Spark double
_ENERGY_SQL = " + ".join(
    f"CAST(CAST({_sha_byte_sql(i)} / 255.0 AS REAL) AS DOUBLE)" for i in range(8)
)


_PEAK_SQL = "greatest(" + ", ".join(
    f"CAST(CAST({_sha_byte_sql(i)} / 255.0 AS REAL) AS DOUBLE)" for i in range(8)
) + ")"


@query(
    "m3_audio_feature_energy",
    f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS n_bytes,
             sha256(text) AS sha
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT media_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           round(({_ENERGY_SQL}) / 8, 6) AS energy,
           round({_PEAK_SQL}, 6) AS peak
    FROM media
    """,
)
def m3_audio_feature_energy(spark: SparkSession, sf: str) -> DataFrame:
    """Audio-branch multimodal pipeline with the feature VALUES under
    oracle (m1 checks only metadata): synthesized waveform payloads →
    Arrow-batched ``extract_features`` (``mapInPandas``) → per-clip energy
    (mean of the feature vector) and peak (max). The deterministic codec
    derives features from the payload sha256, so DuckDB replays the exact
    doubles from the hex digest — every Arrow batch boundary, UDF
    signature, and schema on the Spark side is the real production shape.

    Scale shape: payloads are projected down to 8-float features inside
    the one UDF stage; energy/peak are map-side array folds — nothing
    shuffles at all."""
    from ..operators.multimodal import extract_features
    from ..session import ship_package

    ship_package(spark)
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") % 5 == 0)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("audio/wav").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("doc_id") % 30 * 100 + 100).cast("long").alias("duration_ms"),
    )
    feats = extract_features(media)
    energy = F.aggregate(
        "feature", F.lit(0.0), lambda acc, x: acc + x
    ) / F.lit(8)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(energy, 6).alias("energy"),
        F.round(F.array_max("feature").cast("double"), 6).alias("peak"),
    )


@query(
    "m4_image_ahash_neardup",
    f"""
    WITH media AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id < 400
      UNION ALL
      SELECT doc_id + 100000 AS media_id, text FROM documents
      WHERE doc_id < 400 AND doc_id % 20 = 0
    ), px AS (
      SELECT media_id, i.i AS i,
             (strpos({_HEXMAP},
                     substr(concat(md5(text), md5(text || 'b')), i.i + 1, 1))
              - 1)
             + CASE WHEN media_id >= 100000 AND i.i = 0 THEN 1 ELSE 0 END AS p
      FROM media, unnest(generate_series(0, 63)) i(i)
    ), tot AS (
      SELECT media_id, sum(p) AS total FROM px GROUP BY 1
    ), bits AS (
      SELECT px.media_id, px.i,
             CASE WHEN px.p * 64 >= t.total THEN 1 ELSE 0 END AS bit
      FROM px JOIN tot t USING (media_id)
    ), bands AS (
      SELECT media_id, CAST(i / 16 AS INT) AS k,
             CAST(sum(bit * power(2, 15 - (i % 16))) AS BIGINT) AS v
      FROM bits GROUP BY 1, 2
    ), hashes AS (
      SELECT media_id,
             max(CASE WHEN k = 0 THEN v END) AS b0,
             max(CASE WHEN k = 1 THEN v END) AS b1,
             max(CASE WHEN k = 2 THEN v END) AS b2,
             max(CASE WHEN k = 3 THEN v END) AS b3
      FROM bands GROUP BY 1
    ), cand AS (
      SELECT DISTINCT a.media_id AS ma, b.media_id AS mb
      FROM bands a JOIN bands b
        ON a.k = b.k AND a.v = b.v AND a.media_id < b.media_id
    )
    SELECT c.ma AS media_a, c.mb AS media_b,
           CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
                + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
             AS BIGINT) AS hamming
    FROM cand c
    JOIN hashes ha ON ha.media_id = c.ma
    JOIN hashes hb ON hb.media_id = c.mb
    WHERE bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
          + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) <= 3
    """,
)
def m4_image_ahash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Image near-duplicate detection by perceptual hash — the multimodal
    counterpart of text MinHash dedup: decode → 8x8 mean-threshold aHash
    (Arrow-batched ``mapInPandas``, the real codec seam — see
    ``operators/multimodal.py:image_ahash``) → 4x16-bit band equi-join →
    hamming <= 3 verification via xor+bit_count. Planted: every 20th image
    re-appears "re-encoded" (media_id+100000, one pixel perturbed) and
    must pair with its original; 4-band pigeonhole guarantees recall for
    hamming <= 3.

    Scale shape: payload bytes never shuffle — the Pandas stage projects
    each image to four 16-bit ints; candidates come from band equi-joins
    (never all-pairs) and the hamming check is integer bit math on the
    8-byte hashes. The deterministic fake decode is integer-exact end to
    end, so the oracle replays hash, banding, and hamming bit-for-bit."""
    from ..operators.multimodal import image_ahash
    from ..session import ship_package

    ship_package(spark)
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 400)
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/png").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    planted = base.filter(F.col("media_id") % 20 == 0).withColumn(
        "media_id", F.col("media_id") + 100_000
    )
    hashes = image_ahash(base.unionByName(planted))
    bands = hashes.select(
        "media_id",
        F.explode(
            F.arrays_zip(
                F.array(F.lit(0), F.lit(1), F.lit(2), F.lit(3)).alias("k"),
                F.array("b0", "b1", "b2", "b3").alias("v"),
            )
        ).alias("z"),
    ).select("media_id", F.col("z.k").alias("k"), F.col("z.v").alias("v"))
    a = bands.select(
        F.col("media_id").alias("ma"), "k", "v"
    )
    b = bands.select(
        F.col("media_id").alias("mb"), "k", "v"
    )
    cand = (
        a.join(b, ["k", "v"])
        .filter(F.col("ma") < F.col("mb"))
        .select("ma", "mb")
        .distinct()
    )
    ha = hashes.select(
        F.col("media_id").alias("ma"),
        F.col("b0").alias("a0"), F.col("b1").alias("a1"),
        F.col("b2").alias("a2"), F.col("b3").alias("a3"),
    )
    hb = hashes.select(
        F.col("media_id").alias("mb"),
        F.col("b0").alias("c0"), F.col("b1").alias("c1"),
        F.col("b2").alias("c2"), F.col("b3").alias("c3"),
    )
    hamming = (
        F.bit_count(F.col("a0").bitwiseXOR(F.col("c0")))
        + F.bit_count(F.col("a1").bitwiseXOR(F.col("c1")))
        + F.bit_count(F.col("a2").bitwiseXOR(F.col("c2")))
        + F.bit_count(F.col("a3").bitwiseXOR(F.col("c3")))
    )
    return (
        cand.join(ha, "ma")
        .join(hb, "mb")
        .select(
            F.col("ma").alias("media_a"),
            F.col("mb").alias("media_b"),
            hamming.cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )


_FRAME_SQL = ", ".join(
    f"CAST(CAST({_sha_byte_sql(i)} / 255.0 AS REAL) AS DOUBLE)" for i in range(8)
)


@query(
    "m5_silence_segments",
    f"""
    WITH media AS (
      SELECT doc_id AS media_id, sha256(text) AS sha
      FROM documents WHERE doc_id % 5 = 0
    ), frames AS (
      SELECT media_id, t.f - 1 AS frame, [{_FRAME_SQL}][t.f] AS e
      FROM media, range(1, 9) t(f)
    ), silent AS (
      SELECT media_id, frame, e,
             frame - row_number() OVER (
               PARTITION BY media_id ORDER BY frame) AS grp
      FROM frames WHERE e < 0.3
    )
    SELECT media_id, min(frame) AS seg_start, max(frame) AS seg_end,
           CAST(count(*) AS BIGINT) AS n_frames,
           round(CAST(sum(e) AS DOUBLE) / count(*), 6) AS mean_energy
    FROM silent GROUP BY media_id, grp
    """,
)
def m5_silence_segments(spark: SparkSession, sf: str) -> DataFrame:
    """Silence segmentation over the audio branch: per-clip frame energies
    (the m3 ``extract_features`` decode seam — one Arrow-batched
    ``mapInPandas`` stage) → contiguous sub-threshold runs via
    gaps-and-islands — the speech-pipeline primitive behind VAD trimming
    and pause-based clip splitting, composed from the SAME island operator
    the archive uses for block-range coverage (A1). Emits one row per
    silent segment: extent, length, mean energy.

    Scale shape: decode projects payloads down to 8-float frame vectors
    inside the UDF stage; the explode is 8 rows/clip; islands are one
    window partitioned by clip id (shuffle on clip id only, never payload
    bytes — the binary column is dropped before any exchange). The
    deterministic sha-derived codec lets DuckDB replay the exact frame
    doubles."""
    from ..operators.multimodal import extract_features
    from ..session import ship_package

    ship_package(spark)
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") % 5 == 0)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("audio/wav").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("doc_id") % 30 * 100 + 100).cast("long").alias("duration_ms"),
    )
    feats = extract_features(media)
    frames = feats.select(
        "media_id", F.posexplode(F.col("feature").cast("array<double>")).alias("frame", "e")
    )
    silent = frames.filter(F.col("e") < 0.3).withColumn(
        "grp",
        F.col("frame")
        - F.row_number().over(Window.partitionBy("media_id").orderBy("frame")),
    )
    return (
        silent.groupBy("media_id", "grp")
        .agg(
            F.min("frame").cast("bigint").alias("seg_start"),
            F.max("frame").cast("bigint").alias("seg_end"),
            F.count("*").alias("n_frames"),
            F.round(F.sum("e") / F.count("*"), 6).alias("mean_energy"),
        )
        .drop("grp")
    )


@query(
    "m6_shot_boundaries",
    """
    WITH media AS (
      SELECT doc_id AS media_id,
             500 * (doc_id % 20 + 1) AS duration_ms,
             doc_id % 4 + 3 AS scene_len
      FROM documents WHERE doc_id % 3 = 0
    ), frames AS (
      SELECT m.media_id, m.scene_len, t.i AS idx,
             CAST(t.i * 500 AS BIGINT) AS ts_ms,
             t.i // m.scene_len AS scene_id
      FROM media m, range(0, 41) t(i)
      WHERE t.i * 500 <= m.duration_ms
    ), fp AS (
      -- 4 x 16-bit scene-constant bands + ONE per-frame noise bit XORed
      -- into band 0 (sensor noise stand-in): integer-exact, replayed
      -- bit-for-bit from md5 hex in both engines
      SELECT media_id, idx, ts_ms,
             xor(
               CAST(concat('0x', substr(md5(media_id || ':' || scene_id || ':0'), 1, 4)) AS BIGINT),
               CAST(1 AS BIGINT) << CAST(
                 CAST(concat('0x', substr(md5(media_id || ':' || idx || ':n'), 1, 1)) AS BIGINT) AS INT)
             ) AS b0,
             CAST(concat('0x', substr(md5(media_id || ':' || scene_id || ':1'), 1, 4)) AS BIGINT) AS b1,
             CAST(concat('0x', substr(md5(media_id || ':' || scene_id || ':2'), 1, 4)) AS BIGINT) AS b2,
             CAST(concat('0x', substr(md5(media_id || ':' || scene_id || ':3'), 1, 4)) AS BIGINT) AS b3
      FROM frames
    ), ham AS (
      SELECT media_id, idx, ts_ms,
             bit_count(CAST(xor(b0, lag(b0) OVER w) AS BIGINT))
           + bit_count(CAST(xor(b1, lag(b1) OVER w) AS BIGINT))
           + bit_count(CAST(xor(b2, lag(b2) OVER w) AS BIGINT))
           + bit_count(CAST(xor(b3, lag(b3) OVER w) AS BIGINT)) AS d
      FROM fp
      WINDOW w AS (PARTITION BY media_id ORDER BY idx)
    )
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(1 + sum(CASE WHEN d > 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_shots,
           CAST(min(CASE WHEN d > 8 THEN ts_ms END) AS BIGINT) AS first_cut_ms,
           CAST(max(coalesce(d, 0)) AS BIGINT) AS max_hamming
    FROM ham
    GROUP BY 1
    ORDER BY media_id
    """,
)
def m6_shot_boundaries(spark: SparkSession, sf: str) -> DataFrame:
    """Video shot-boundary detection over per-frame perceptual hashes:
    consecutive frames whose fingerprint hamming distance exceeds a cut
    threshold mark a shot change — the standard pre-pass before per-shot
    frame sampling (m2) and near-dup video matching (the m4 banding
    applied per shot), i.e. how a 100 TB video corpus gets deduplicated
    at SHOT granularity instead of paying full-clip comparisons.

    Media rows are synthesized from documents (the m2 convention) with a
    deterministic per-media scene structure: scenes of 3-6 frames, each
    frame's 64-bit fingerprint = four 16-bit md5 bands constant within
    the scene, plus ONE per-frame noise bit XORed into band 0 (re-encode
    jitter stand-in — a real pipeline computes the same bands from
    decoded pixels in the m4 Pandas codec stage). Within a scene
    consecutive frames differ by <= 2 bits; across a scene cut the bands
    rehash (~32 expected); the cut rule is hamming > 8.

    Scale shape: the frame plan is the m2 sequence-explode; fingerprints
    are pure Catalyst md5/conv/xor column math (zero UDFs, zero payload
    bytes shuffled); the boundary scan is ONE lag window per media
    ordered by frame index; output is one row per clip. Determinism:
    every step is integer-exact (md5 hex -> 16-bit ints, xor, bit_count),
    replayed bit-for-bit by the oracle's from_hex/xor/bit_count chain."""
    docs = _t(spark, sf, "documents").filter(F.col("doc_id") % 3 == 0)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        (500 * (F.col("doc_id") % 20 + 1)).alias("duration_ms"),
        (F.col("doc_id") % 4 + 3).alias("scene_len"),
    )
    frames = media.select(
        "media_id",
        "scene_len",
        F.explode(F.sequence(F.lit(0), (F.col("duration_ms") / 500).cast("long"))).alias("idx"),
    ).select(
        "media_id",
        "idx",
        (F.col("idx") * 500).cast("long").alias("ts_ms"),
        F.floor(F.col("idx") / F.col("scene_len")).alias("scene_id"),
    )

    def band(tag: str) -> F.Column:
        key = F.concat_ws(":", F.col("media_id"), F.col("scene_id"), F.lit(tag))
        return F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long")

    noise_slot = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("media_id"), F.col("idx"), F.lit("n"))), 1, 1),
        16, 10,
    ).cast("long")
    fp = frames.select(
        "media_id", "idx", "ts_ms",
        # 1 << slot via pow (shiftleft takes only a literal shift): exact
        # in IEEE for slot <= 15
        band("0").bitwiseXOR(F.pow(F.lit(2.0), noise_slot).cast("long")).alias("b0"),
        band("1").alias("b1"),
        band("2").alias("b2"),
        band("3").alias("b3"),
    )
    w = Window.partitionBy("media_id").orderBy("idx")
    d = sum(
        F.bit_count(F.col(c).bitwiseXOR(F.lag(c).over(w)))
        for c in ("b0", "b1", "b2", "b3")
    )
    ham = fp.select("media_id", "idx", "ts_ms", d.alias("d"))
    return (
        ham.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            (F.lit(1) + F.sum(F.when(F.col("d") > 8, 1).otherwise(0))).cast("long").alias("n_shots"),
            F.min(F.when(F.col("d") > 8, F.col("ts_ms"))).cast("long").alias("first_cut_ms"),
            F.max(F.coalesce(F.col("d"), F.lit(0))).cast("long").alias("max_hamming"),
        )
        .orderBy("media_id")
    )
