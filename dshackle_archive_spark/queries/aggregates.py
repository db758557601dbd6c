"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import Window


from pyspark.sql import functions as F


from ._registry import DEC, _t, query


from ._shared import _HEXMAP, _NORM_SQL, _u32_sql, _u32_sql_at


_ISLANDS_SQL = """
    WITH present AS (
      SELECT DISTINCT event_id AS h FROM events WHERE value > 50
    ), tagged AS (
      SELECT h, h - ROW_NUMBER() OVER (ORDER BY h) AS grp FROM present
    )
    SELECT min(h) AS start, max(h) AS "end", count(*) AS n_heights
    FROM tagged GROUP BY grp
"""


@query("a1_islands", _ISLANDS_SQL)
def a1_islands(spark: SparkSession, sf: str) -> DataFrame:
    """A1: RangeBag.compact — merge covered heights into maximal ranges
    (range_bag.rs:51-86), via the two-level distributed islands kernel."""
    from ..operators.intervals import islands

    ev = _t(spark, sf, "events")
    present = ev.filter(F.col("value") > 50).select(F.col("event_id").alias("height"))
    return islands(present, "height")


@query(
    "a2_interval_subtraction",
    """
    WITH s1 AS (SELECT DISTINCT event_id AS h FROM events WHERE value > 50),
         s2 AS (SELECT DISTINCT event_id AS h FROM events WHERE event_type = 'error'),
         diff AS (SELECT h FROM s1 EXCEPT SELECT h FROM s2),
         tagged AS (SELECT h, h - ROW_NUMBER() OVER (ORDER BY h) AS grp FROM diff)
    SELECT min(h) AS start, max(h) AS "end" FROM tagged GROUP BY grp
    """,
)
def a2_interval_subtraction(spark: SparkSession, sf: str) -> DataFrame:
    """A2: RangeBag.remove — interval-set subtraction (range_bag.rs:32-49),
    closed-form on islands (no height explode)."""
    from ..operators.intervals import islands, subtract_intervals

    ev = _t(spark, sf, "events")
    base = islands(ev.filter(F.col("value") > 50).select(F.col("event_id").alias("height")))
    cuts = islands(
        ev.filter(F.col("event_type") == "error").select(F.col("event_id").alias("height"))
    )
    return subtract_intervals(
        base.select("start", "end"), cuts.select("start", "end")
    ).select("start", "end")


@query(
    "a3_gap_detection",
    """
    WITH present AS (
      SELECT DISTINCT event_id AS h FROM events WHERE NOT (value > 50)
    ), tagged AS (
      SELECT h, h - ROW_NUMBER() OVER (ORDER BY h) AS grp FROM present
    ), islands AS (
      SELECT min(h) AS s, max(h) AS e FROM tagged GROUP BY grp
    ), g AS (
      SELECT s, e, lag(e) OVER (ORDER BY s) AS prev_e FROM islands
    ), gaps AS (
      SELECT CASE WHEN prev_e IS NULL THEN 0 ELSE prev_e + 1 END AS start,
             s - 1 AS "end"
      FROM g
      UNION ALL
      SELECT (SELECT max(e) + 1 FROM islands) AS start,
             (SELECT max(event_id) FROM events) AS "end"
    )
    SELECT start, "end" FROM gaps WHERE start <= "end"
    """,
)
def a3_gap_detection(spark: SparkSession, sf: str) -> DataFrame:
    """A3: missing-range detection — requested − covered
    (storage/mod.rs:143-207), closed-form complement over islands.

    The domain bound max(event_id) is folded into the plan as a 1-row
    broadcast (no driver ``collect()`` between bound and use) — the whole
    detection is one Spark action."""
    from ..operators.intervals import gaps_direct_bounds_df

    ev = _t(spark, sf, "events")
    bounds = ev.agg(F.max("event_id").alias("hi")).select(
        F.lit(0).cast("long").alias("lo"), "hi"
    )
    present = ev.filter(~(F.col("value") > 50)).select(F.col("event_id").alias("height"))
    return gaps_direct_bounds_df(present, bounds).select("start", "end")


@query(
    "a5_duplicate_detection",
    """
    SELECT o_custkey, count(*) AS n FROM orders
    GROUP BY o_custkey HAVING count(*) > 1
    """,
)
def a5_duplicate_detection(spark: SparkSession, sf: str) -> DataFrame:
    """A5: duplicate-height detection (verify.rs:832-836)."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_custkey").agg(F.count("*").alias("n")).filter(F.col("n") > 1)


@query(
    "a6_distinct_count_completeness",
    """
    SELECT l_orderkey,
           count(DISTINCT l_linenumber) AS n_distinct,
           count(*) AS n_rows,
           max(l_linenumber) AS max_ln,
           CASE WHEN count(DISTINCT l_linenumber) = max(l_linenumber)
                 AND min(l_linenumber) = 1 THEN 1 ELSE 0 END AS complete
    FROM lineitem GROUP BY l_orderkey
    """,
)
def a6_distinct_count_completeness(spark: SparkSession, sf: str) -> DataFrame:
    """A6: distinct-count == expected-size completeness (verify.rs:869-877):
    per order, linenumbers must be exactly 1..max with no dup/gap."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.countDistinct("l_linenumber").alias("n_distinct"),
        F.count("*").alias("n_rows"),
        F.max("l_linenumber").alias("max_ln"),
        F.when(
            (F.countDistinct("l_linenumber") == F.max("l_linenumber"))
            & (F.min("l_linenumber") == 1),
            1,
        )
        .otherwise(0)
        .alias("complete"),
    )


@query(
    "a8_stats_rollup",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def a8_stats_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """A8: per-kind processed/deleted stats rollup (verify.rs:62-96)."""
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


@query(
    "a9_throughput_window",
    """
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket_start,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
)
def a9_throughput_window(spark: SparkSession, sf: str) -> DataFrame:
    """A9: sliding/tumbling throughput windows (progress.rs:135-181) as
    event-time hour buckets (epoch math keeps the bucket type portable)."""
    ev = _t(spark, sf, "events")
    bucket = (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 3600) * 3600).cast(
        "long"
    )
    return ev.groupBy(bucket.alias("bucket_start")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


@query(
    "a10_rollup_stats",
    """
    SELECT event_type,
           CAST(user_id % 4 AS BIGINT) AS cohort,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP(event_type, CAST(user_id % 4 AS BIGINT))
    """,
)
def a10_rollup_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Beyond-reference: hierarchical rollup aggregation (free from Spark SQL;
    the reference has no grouping sets — SURVEY §2.4 note)."""
    ev = _t(spark, sf, "events")
    return ev.rollup("event_type", (F.col("user_id") % 4).alias("cohort")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


@query(
    "a11_moving_avg",
    """
    SELECT event_type, event_id,
           round(avg(value) OVER (
             PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
    FROM events
    """,
)
def a11_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-based moving aggregate (7-row trailing mean per series) — the
    smoothing pass of the reference's throughput log (progress.rs sliding
    window) as a windowed plan. Partition-parallel by event_type; the frame
    sums ≤7 doubles in ORDER BY order, so both engines compute bit-equal
    results."""
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_type",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("ma7"),
    )


@query(
    "a12_cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1
    )
    SELECT CAST(floor(datediff('day', DATE '2024-01-01',
                               CAST(f.t0 AS DATE)) / 7) AS BIGINT) AS cohort_week,
           CAST(floor(datediff('day', CAST(f.t0 AS DATE),
                               CAST(e.ts AS DATE)) / 7) AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
)
def a12_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen week, counted
    in each later activity week — the standard retention rollup. Integer
    date math only (datediff/floor — no timezone or interpolation hazards);
    first-seen folds back via a broadcast join (users ≪ events), one
    distinct-count shuffle."""
    ev = _t(spark, sf, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    cohort = F.floor(
        F.datediff(F.to_date("t0"), F.lit("2024-01-01").cast("date")) / 7
    ).cast("bigint")
    offset = F.floor(F.datediff(F.to_date("ts"), F.to_date("t0")) / 7).cast("bigint")
    return (
        ev.join(F.broadcast(first), "user_id")
        .groupBy(cohort.alias("cohort_week"), offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "a13_discrete_median",
    """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type, round(value, 6) AS median_value
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def a13_discrete_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact DISCRETE median per group (the lower median — an actual data
    value, selected by rank). Interpolating medians (percentile_cont /
    F.median) mix engine-specific float interpolation into the result;
    rank selection is pure integer arithmetic, so the value is
    bit-deterministic. One shuffle on the group key; (value, event_id)
    makes the order total."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cnt = Window.partitionBy("event_type")
    return (
        ev.select(
            "event_type",
            "value",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(cnt).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.round("value", 6).alias("median_value"))
    )


@query(
    "a14_daily_growth",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day, n,
           round(CAST(n AS DOUBLE) / lag(n) OVER (
             PARTITION BY event_type ORDER BY d), 6) AS growth
    FROM daily
    """,
)
def a14_daily_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Day-over-day growth per event type — a window analytic over an
    ALREADY-AGGREGATED series (the two-level shape behind every metrics
    dashboard): the heavy shuffle happens once at the daily rollup; the
    lag window then runs on ~30 rows per series. Integer counts divide
    exactly, NULL growth on each series' first day."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("d")
    return daily.select(
        "event_type",
        F.col("d").cast("string").alias("day"),
        "n",
        F.round(F.col("n") / F.lag("n").over(w), 6).alias("growth"),
    )


@query(
    "a15_quantile_bands",
    """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.25), 6) AS p25,
           round(quantile_cont(n_chars, 0.5), 6) AS p50,
           round(quantile_cont(n_chars, 0.75), 6) AS p75,
           round(quantile_cont(n_chars, 0.95), 6) AS p95
    FROM documents GROUP BY source
    """,
)
def a15_quantile_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-source length quantile bands (p25/p50/p75/p95 of document
    size) — the profile a curation pipeline thresholds against (e.g. "drop
    below this source's p25"). EXACT ``percentile`` (linear interpolation,
    same contract as DuckDB ``quantile_cont``), not ``percentile_approx``:
    the sketch's error bounds are engine-specific and would not oracle.

    Scale shape: one shuffle on source; exact percentile holds a per-group
    sorted buffer — bounded here because groups are sources (metadata-scale
    cardinality) and the buffered value is one BIGINT per doc. For
    billion-row groups the approx variant is the documented fallback."""
    docs = _t(spark, sf, "documents")
    pct = F.expr(
        "percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.95D))"
    )
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"), pct.alias("_q"))
        .select(
            "source",
            "n_docs",
            F.round(F.col("_q")[0], 6).alias("p25"),
            F.round(F.col("_q")[1], 6).alias("p50"),
            F.round(F.col("_q")[2], 6).alias("p75"),
            F.round(F.col("_q")[3], 6).alias("p95"),
        )
    )


def _u32_slice_sql(hexpr: str, rexpr: str) -> str:
    """The ``rexpr``-th disjoint 32-bit slice of an md5 hex string column
    ``hexpr`` as an integer (slice r = hex chars 8r+1..8r+8) — the
    Kirsch-Mitzenmacher-style way to derive d independent-enough sketch
    row hashes from ONE digest instead of salting and re-hashing per row.
    Mirrors Spark's ``conv(substring(h, 1 + 8r, 8), 16, 10)``."""
    return " + ".join(
        f"(strpos({_HEXMAP}, substr({hexpr}, 8 * ({rexpr}) + {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


@query(
    "a16_window_unique_actors",
    """
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS day_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(CAST(count(*) AS DOUBLE)
                 / count(DISTINCT user_id), 6) AS events_per_user
    FROM events GROUP BY 1, 2
    """,
)
def a16_window_unique_actors(spark: SparkSession, sf: str) -> DataFrame:
    """Unique-actor windows: per day per event type, event count, EXACT
    distinct users, and events-per-user — the engagement/abuse analytic a9
    (pure throughput) cannot answer, and physically a different aggregate:
    COUNT DISTINCT needs the partial-dedup expand/merge plan, not a plain
    combiner sum.

    Scale shape: Spark plans distinct-agg as a two-phase expand (dedup on
    (day, type, user) map-side, then merge) — one logical shuffle keyed by
    the window; no joins. Buckets are epoch longs (portable, never raw
    timestamps)."""
    ev = _t(spark, sf, "events")
    day = (
        F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400) * 86400
    ).cast("long")
    return ev.groupBy(day.alias("day_start"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(
            F.count("*").cast("double") / F.countDistinct("user_id"), 6
        ).alias("events_per_user"),
    )


@query(
    "a17_countmin_heavy_hitters",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), tok AS (
      SELECT concat(toks[i], ' ', toks[i+1]) AS token
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= len(toks) - 1
        AND length(toks[i]) > 0 AND length(toks[i+1]) > 0
    ), rows_ AS (SELECT r FROM range(0, 4) t(r)
    ), hashed AS (
      SELECT md5(concat('cm:', token)) AS h FROM tok
    ), cells AS (
      SELECT r.r AS r, ({_u32_slice_sql("h", "r.r")}) % 256 AS bucket
      FROM hashed, rows_ r
    ), sketch AS (
      SELECT r, bucket, CAST(count(*) AS BIGINT) AS cell
      FROM cells GROUP BY 1, 2
    ), truth AS (
      SELECT token, CAST(count(*) AS BIGINT) AS true_count,
             md5(concat('cm:', token)) AS h
      FROM tok GROUP BY 1
      ORDER BY true_count DESC, token ASC LIMIT 20
    ), probes AS (
      SELECT t.token, t.true_count, r.r,
             ({_u32_slice_sql("t.h", "r.r")}) % 256 AS bucket
      FROM truth t, rows_ r
    )
    SELECT p.token, any_value(p.true_count) AS true_count,
           min(s.cell) AS cm_est,
           CAST(min(s.cell) - any_value(p.true_count) AS BIGINT)
             AS overestimate
    FROM probes p JOIN sketch s ON s.r = p.r AND s.bucket = p.bucket
    GROUP BY p.token
    """,
)
def a17_countmin_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over corpus
    bigrams — the fixed-memory frequency estimator a streaming ingest
    uses before exact counts exist — audited against the exact top-20:
    estimate = min over 4 sketch rows of a 4x256 counter grid, always an
    OVERestimate (the invariant the test asserts). Like the KMV sketch,
    every hash derives from md5 so the sketch is engine-portable and
    value-replayable, unlike opaque built-in sketches; the 4 row hashes
    are the 4 DISJOINT 32-bit slices of ONE md5 per bigram (the
    Kirsch-Mitzenmacher derived-hash trick) — one digest evaluation per
    corpus bigram instead of the per-row salted re-hash this query ran
    through round 7 (4x fewer md5s on the corpus-sized branch, measured
    ~1.4x end-to-end).

    Scale shape: the grid build is ONE groupBy over (4 x corpus bigrams)
    with map-side partial agg into <= 1024 cells — the classic
    sketch-merge shape (each executor's partial grid IS a mergeable
    sketch); the probe side is 20 rows x 4 and joins the 1024-row grid
    broadcast. Nothing corpus-sized ever shuffles by token."""
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    # bigram stream WITH multiplicity (vocab ~|V|^2 >> the 256-bucket grid,
    # so hash collisions — the regime the sketch exists for — actually occur)
    toks = docs.select(F.split(normalized_text("text"), " ").alias("_t"))
    tok = (
        toks.select(
            "_t",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size("_t") - 1, F.lit(0)))
            ).alias("_i"),
        )
        .filter(F.col("_i") >= 1)
        .select(
            F.concat_ws(
                " ",
                F.try_element_at("_t", F.col("_i")),
                F.try_element_at("_t", F.col("_i") + 1),
            ).alias("token"),
            F.try_element_at("_t", F.col("_i")).alias("_wa"),
            F.try_element_at("_t", F.col("_i") + 1).alias("_wb"),
        )
        .filter((F.col("_wa") != "") & (F.col("_wb") != ""))
        .select("token")
    )
    def buckets(h_col):
        # the 4 disjoint u32 slices of one md5 hex digest, each mod width
        return F.array(
            *[
                F.conv(F.substring(h_col, 1 + 8 * r, 8), 16, 10).cast("long")
                % 256
                for r in range(4)
            ]
        )

    h = F.md5(F.concat(F.lit("cm:"), F.col("token")))
    # 4 sketch rows via map-side posexplode of the slice array — ONE md5
    # per bigram, no join, stays in codegen
    hashed = tok.select(h.alias("h")).select(
        F.posexplode(buckets(F.col("h"))).alias("r", "bucket")
    )
    sketch = hashed.groupBy("r", "bucket").agg(F.count("*").alias("cell"))
    truth = (
        tok.groupBy("token")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("token"))
        .limit(20)
    )
    probes = truth.select(
        "token", "true_count", h.alias("h")
    ).select(
        "token",
        "true_count",
        F.posexplode(buckets(F.col("h"))).alias("r", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("token")
        .agg(
            F.any_value("true_count").alias("true_count"),
            F.min("cell").alias("cm_est"),
            (F.min("cell") - F.any_value("true_count")).alias("overestimate"),
        )
    )


@query(
    "a18_hll_distinct_sketch",
    f"""
    WITH norm AS (
      SELECT source, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), tok AS (
      SELECT DISTINCT source, concat_ws(' ', toks[i], toks[i+1]) AS token
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 1))) t(i)
      WHERE length(concat_ws(' ', toks[i], toks[i+1])) > 0
    ), h AS (
      SELECT source, token,
             ({_u32_sql_at("token", 1)}) % 64 AS bucket,
             ({_u32_sql_at("token", 9)}) AS v
      FROM tok
    ), r AS (
      SELECT source, bucket,
             CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END AS rho
      FROM h
    ), m AS (
      SELECT source, bucket, max(rho) AS mj FROM r GROUP BY 1, 2
    ), agg AS (
      SELECT source, count(*) AS nb, sum(power(2.0, -mj)) AS z_ne
      FROM m GROUP BY 1
    ), ex AS (
      SELECT source, count(*) AS n_exact FROM tok GROUP BY 1
    ), est AS (
      SELECT e.source, e.n_exact, 64 - a.nb AS zeros,
             (0.7213 / (1 + 1.079 / 64)) * 64 * 64
               / ((64 - a.nb) + a.z_ne) AS e_raw
      FROM ex e JOIN agg a USING (source)
    ), final AS (
      SELECT source, n_exact,
             CASE WHEN e_raw <= 160 AND zeros > 0
                  THEN 64 * ln(64.0 / zeros) ELSE e_raw END AS e_corr
      FROM est
    )
    SELECT source,
           CAST(n_exact AS BIGINT) AS n_exact,
           round(e_corr, 6) AS hll_est,
           round(abs(e_corr - n_exact) / n_exact, 6) AS rel_err
    FROM final
    """,
)
def a18_hll_distinct_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007), m=64
    registers, next to the exact count — completing the mergeable-sketch
    trio (KMV x27 for portability, count-min a17 for frequency, HLL here
    for the register formulation every production engine actually ships).
    Made engine-portable by deriving BOTH the bucket (md5 bits 1-32 mod
    64) and the rank value (md5 bits 33-64) from the hex digest, with
    rho = 33 - bit_length(v) computed via ``bin()`` string length —
    integer-exact in Spark and DuckDB, no float log2 at the boundary.
    Standard bias constant alpha_64 = 0.7213/(1+1.079/64) and the
    small-range linear-counting correction (E <= 2.5m with empty
    registers -> m·ln(m/zeros)).

    Scale shape: per-key distinct, then map-side (bucket, rho), ONE
    groupBy(source, bucket) max — 64 rows per group forever, the
    mergeable-register contract (union of streams = elementwise max of
    registers) — then a 64-row-per-source final fold. Z's summands are
    exact powers of two spanning < 53 bits, so the double sum is exact
    and order-independent: the oracle replays it bit-for-bit."""
    from ..operators.dedup import shingles

    docs = _t(spark, sf, "documents")
    tok = shingles(docs.select("source", "text"), n=2, id_col="source").select(
        F.col("doc_id").alias("source"), F.col("shingle").alias("token")
    )
    v = F.conv(F.substring(F.md5("token"), 9, 8), 16, 10).cast("long")
    h = tok.select(
        "source",
        "token",
        (F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long") % 64)
        .alias("bucket"),
        F.when(v == 0, 33).otherwise(33 - F.length(F.bin(v))).alias("rho"),
    )
    m = h.groupBy("source", "bucket").agg(F.max("rho").alias("mj"))
    agg = m.groupBy("source").agg(
        F.count("*").alias("nb"),
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("z_ne"),
    )
    ex = tok.groupBy("source").agg(F.count("*").alias("n_exact"))
    alpha = F.lit(0.7213) / (F.lit(1) + F.lit(1.079) / F.lit(64))
    e_raw = alpha * 64 * 64 / ((F.lit(64) - F.col("nb")) + F.col("z_ne"))
    zeros = F.lit(64) - F.col("nb")
    est = ex.join(agg, "source").select(
        "source",
        "n_exact",
        F.when(
            (e_raw <= 160) & (zeros > 0), F.lit(64) * F.log(F.lit(64.0) / zeros)
        )
        .otherwise(e_raw)
        .alias("e_corr"),
    )
    return est.select(
        "source",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round("e_corr", 6).alias("hll_est"),
        F.round(F.abs(F.col("e_corr") - F.col("n_exact")) / F.col("n_exact"), 6)
        .alias("rel_err"),
    )


@query(
    "a19_histogram_quantiles",
    """
    WITH binned AS (
      SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM binned
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           round(min(CASE WHEN cum >= 0.5 * n
                         THEN CAST(bin AS DOUBLE) * 5.0 END), 6) AS est_p50,
           round(min(CASE WHEN cum >= 0.9 * n
                         THEN CAST(bin AS DOUBLE) * 5.0 END), 6) AS est_p90,
           round(min(CASE WHEN cum >= 0.99 * n
                         THEN CAST(bin AS DOUBLE) * 5.0 END), 6) AS est_p99
    FROM cum GROUP BY 1
    """,
)
def a19_histogram_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming-mergeable quantile estimation: fixed-width histogram
    sketch (the equi-width cousin of KLL/t-digest — per-group bin counts
    are associative, so partial sketches from any partitioning merge by
    addition) → p50/p90/p99 read off the cumulative bin profile (lower
    edge of the first bin covering the target mass). Completes the
    mergeable-sketch family next to count-min (a17), KMV (x27) and HLL
    (a18) with the QUANTILE axis every data-quality dashboard needs.

    Scale shape: the corpus collapses to ≤(groups × ~100 bins) cells in
    ONE shuffle with map-side partial aggregation; the quantile read-off
    runs a window over the cell table (sketch-sized, not data-sized).
    The estimate is deterministic — bin edges are data-independent — so
    unlike exact percentile, the same sketch merged in any order yields
    the identical answer."""
    events = _t(spark, sf, "events")
    binned = (
        events.groupBy(
            "event_type",
            F.floor(F.col("value") / F.lit(5.0)).cast("bigint").alias("bin"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("bin")
    wall = Window.partitionBy("event_type")
    cum = binned.select(
        "event_type",
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )

    def est(q: float):
        return F.round(
            F.min(
                F.when(
                    F.col("cum") >= F.lit(q) * F.col("n"),
                    F.col("bin") * F.lit(5.0),
                )
            ),
            6,
        )

    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        est(0.5).alias("est_p50"),
        est(0.9).alias("est_p90"),
        est(0.99).alias("est_p99"),
    )


@query(
    "a20_bloom_filter_fpr",
    f"""
    WITH mh AS (
      SELECT DISTINCT
        ({_u32_sql("CAST(c_custkey AS VARCHAR) || ':' || CAST(t.i AS VARCHAR)")})
          % 4096 AS pos
      FROM customer CROSS JOIN range(0, 3) t(i)
    ), probe AS (
      SELECT DISTINCT p_partkey + 1000000 AS pk,
        ({_u32_sql(
            "CAST(p_partkey + 1000000 AS VARCHAR) || ':' || CAST(t.i AS VARCHAR)"
        )}) % 4096 AS pos
      FROM part CROSS JOIN range(0, 3) t(i)
    ), hits AS (
      SELECT p.pk, CAST(count(*) AS BIGINT) AS needed,
             CAST(sum(CASE WHEN mh.pos IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS matched
      FROM probe p LEFT JOIN mh ON mh.pos = p.pos
      GROUP BY 1
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_probes,
             CAST(sum(CASE WHEN matched = needed THEN 1 ELSE 0 END)
                  AS BIGINT) AS false_pos
      FROM hits
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM mh
    ), c AS (
      SELECT CAST(count(*) AS BIGINT) AS n_members FROM customer
    )
    SELECT c.n_members, m.n_bits_set, a.n_probes, a.false_pos,
           round(CAST(a.false_pos AS DOUBLE) / a.n_probes, 6) AS fpr,
           round((CAST(m.n_bits_set AS DOUBLE) / 4096.0)
                 * (CAST(m.n_bits_set AS DOUBLE) / 4096.0)
                 * (CAST(m.n_bits_set AS DOUBLE) / 4096.0), 6) AS expected_fpr
    FROM c CROSS JOIN m CROSS JOIN agg a
    """,
)
def a20_bloom_filter_fpr(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter membership audit: build an m=4096-bit, j=3-hash Bloom
    filter over the customer-key set, probe it with a disjoint key set
    (shifted part keys), and report the observed false-positive rate
    against the fill-fraction prediction f³ — the last member of the
    mergeable-sketch family (count-min a17, KMV x27, HLL a18/w6,
    histogram a19): the filter is a distinct-position SET, so partial
    filters from any partitioning merge by union (bitwise OR), and the
    audit quantifies exactly what a distributed bloom-join would pay in
    false probe hits. Every number derives from md5 integer hashes —
    deterministic on any engine; the expectation is written f·f·f (no
    pow/exp transcendentals).

    Scale shape: members collapse map-side into ≤4096 distinct bit cells
    (the filter IS broadcast-sized by construction); probes explode to 3
    position rows each and probe the broadcast filter map-side — the only
    shuffles are the ≤4096-cell distinct and the per-probe-key rollup;
    the 1-row stats fold in as broadcasts."""
    cust = _t(spark, sf, "customer").select("c_custkey")
    part = _t(spark, sf, "part").select("p_partkey")

    def positions(key_col):
        return F.array(
            *[
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", key_col.cast("string"), F.lit(str(i)))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % 4096
                for i in range(3)
            ]
        )

    filt = (
        cust.select(F.explode(positions(F.col("c_custkey"))).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probes = (
        part.select((F.col("p_partkey") + 1000000).alias("pk"))
        .select("pk", F.explode(positions(F.col("pk"))).alias("pos"))
        .distinct()
    )
    hits = (
        probes.join(F.broadcast(filt), "pos", "left")
        .groupBy("pk")
        .agg(
            F.count("*").alias("needed"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("matched"),
        )
    )
    agg = hits.groupBy().agg(
        F.count("*").alias("n_probes"),
        F.sum((F.col("matched") == F.col("needed")).cast("bigint")).alias(
            "false_pos"
        ),
    )
    m = filt.groupBy().agg(F.count("*").alias("n_bits_set"))
    c = cust.groupBy().agg(F.count("*").alias("n_members"))
    fill = F.col("n_bits_set").cast("double") / F.lit(4096.0)
    return (
        c.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(agg))
        .select(
            "n_members",
            "n_bits_set",
            "n_probes",
            "false_pos",
            F.round(F.col("false_pos").cast("double") / F.col("n_probes"), 6).alias(
                "fpr"
            ),
            F.round(fill * fill * fill, 6).alias("expected_fpr"),
        )
    )


@query(
    "a21_key_skew_audit",
    """
    WITH melted AS (
      SELECT 'l_orderkey' AS key_name, l_orderkey AS k FROM lineitem
      UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
    ), freqs AS (
      SELECT key_name, k, CAST(count(*) AS BIGINT) AS freq
      FROM melted GROUP BY 1, 2
    ), ranked AS (
      SELECT key_name, freq,
             row_number() OVER (
               PARTITION BY key_name ORDER BY freq, k) AS rn
      FROM freqs
    )
    SELECT key_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(freq) AS BIGINT) AS n_rows,
           CAST(max(freq) AS BIGINT) AS max_freq,
           round(max(freq) / sum(freq), 6) AS top1_share,
           round(quantile_cont(freq, 0.5), 6) AS p50_freq,
           round(quantile_cont(freq, 0.99), 6) AS p99_freq,
           round(quantile_cont(freq, 0.99) / quantile_cont(freq, 0.5), 6)
             AS p99_over_p50,
           round(2.0 * sum(rn * freq) / (count(*) * sum(freq))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked GROUP BY key_name ORDER BY key_name
    """,
)
def a21_key_skew_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew audit: per candidate join key (orderkey / partkey /
    suppkey) the frequency-distribution shape that decides a shuffle
    strategy — top-1 key share, exact p50/p99 per-key multiplicity and
    their ratio, and the Gini coefficient of the key-frequency
    distribution. This is the diagnostic a 100 TB pipeline runs BEFORE
    picking salting factors / AQE skew thresholds (SURVEY's bucketed /
    skew levers): gini near 0 + p99/p50 near 1 means plain hash
    partitioning is fine; a fat top1_share means that key needs salting.

    Determinism: frequencies are exact integers. Gini uses the rank
    formula G = 2·Σ rn·x / (n·Σx) − (n+1)/n with x ascending — Σ rn·x is
    invariant to tie order (equal values commute across adjacent ranks),
    so the engines' different tie placements cannot change the sum.
    Both engines interpolate quantiles at position q·(n−1) on sorted
    values (the x46 contract), and every division is one double op over
    exact integer sums.

    Scale shape: one scan melts the three keys map-side (``stack``);
    the ONLY corpus-scale shuffle is the (key_name, key) groupBy —
    map-side combinable — and it executes ONCE: everything downstream
    (percentiles, Gini, totals) is derived from the (key_name, freq)
    HISTOGRAM, bounded by the number of DISTINCT multiplicities (tiny
    in any real table), never by re-branching the key-cardinality freq
    table. The Gini rank term needs no sort of the key table — each tie
    block contributes freq·(cum·cnt + cnt·(cnt+1)/2) in closed form —
    and the exact interpolated percentiles are read off the cumulative
    histogram at positions q·(n−1) (the same lo/hi interpolation both
    engines' native quantile implements, one when-guarded agg each)."""
    li = _t(spark, sf, "lineitem")
    melted = li.select(
        F.expr(
            "stack(3, 'l_orderkey', l_orderkey,"
            " 'l_partkey', l_partkey,"
            " 'l_suppkey', l_suppkey) AS (key_name, k)"
        )
    )
    freqs = melted.groupBy("key_name", "k").agg(
        F.count("*").cast("long").alias("freq")
    )
    hist = freqs.groupBy("key_name", "freq").agg(
        F.count("*").cast("long").alias("cnt")
    )
    # per-key totals as UNBOUNDED windows over the same tiny histogram —
    # a groupBy+join branch here would re-derive the whole corpus lineage
    # a second time (Catalyst branches recompute, they don't share)
    cum_w = (
        Window.partitionBy("key_name")
        .orderBy("freq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    full_w = Window.partitionBy("key_name")
    h = hist.select(
        "key_name",
        "freq",
        "cnt",
        F.coalesce(F.sum("cnt").over(cum_w), F.lit(0)).alias("cum"),
        F.sum("cnt").over(full_w).cast("long").alias("n_keys"),
        F.sum(F.col("freq") * F.col("cnt")).over(full_w).cast("long")
        .alias("n_rows"),
        F.max("freq").over(full_w).cast("long").alias("max_freq"),
    )

    def _pct_parts(q: float) -> list:
        """lo/hi sorted-position values for the interpolated q-quantile,
        read off the cumulative histogram: position q·(n−1) falls in the
        tie block with cum ≤ pos < cum + cnt (exactly one row matches,
        so the when-guarded max is just a selector)."""
        pos = F.lit(q) * (F.col("n_keys") - 1)
        parts = []
        for bound, tag in ((F.floor(pos), "lo"), (F.ceil(pos), "hi")):
            hit = (F.col("cum") <= bound) & (
                bound < F.col("cum") + F.col("cnt")
            )
            parts.append(
                F.max(F.when(hit, F.col("freq"))).alias(f"v{tag}{int(q * 100)}")
            )
        return parts

    block = F.col("freq") * (
        F.col("cum") * F.col("cnt")
        + F.col("cnt") * (F.col("cnt") + 1) / 2
    )
    agg = h.groupBy("key_name").agg(
        F.first("n_keys").alias("n_keys"),
        F.first("n_rows").alias("n_rows"),
        F.first("max_freq").alias("max_freq"),
        F.sum(block).cast("long").alias("s_rank_freq"),
        *_pct_parts(0.5),
        *_pct_parts(0.99),
    )

    def _interp(q: float) -> F.Column:
        pos = F.lit(q) * (F.col("n_keys") - 1)
        lo, hi = F.col(f"vlo{int(q * 100)}"), F.col(f"vhi{int(q * 100)}")
        return lo + (pos - F.floor(pos)) * (hi - lo)

    p50, p99 = _interp(0.5), _interp(0.99)
    return agg.select(
        "key_name",
        "n_keys",
        "n_rows",
        "max_freq",
        F.round(F.col("max_freq") / F.col("n_rows"), 6).alias("top1_share"),
        F.round(p50, 6).alias("p50_freq"),
        F.round(p99, 6).alias("p99_freq"),
        F.round(p99 / p50, 6).alias("p99_over_p50"),
        F.round(
            2.0 * F.col("s_rank_freq") / (F.col("n_keys") * F.col("n_rows"))
            - (F.col("n_keys") + 1.0) / F.col("n_keys"),
            6,
        ).alias("gini"),
    ).orderBy("key_name")
