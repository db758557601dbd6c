"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import Window


from pyspark.sql import functions as F


from ._registry import DEC, _t, query


from ._shared import _u32_sql_at


@query(
    "w1_chain_linkage",
    """
    WITH linked AS (
      SELECT l_orderkey, l_linenumber,
             lag(l_linenumber) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS prev
      FROM lineitem
    )
    SELECT l_orderkey,
           CAST(sum(CASE WHEN prev IS NOT NULL AND l_linenumber <> prev + 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS broken_links,
           count(*) AS chain_len
    FROM linked GROUP BY l_orderkey
    """,
)
def w1_chain_linkage(spark: SparkSession, sf: str) -> DataFrame:
    """W1: parent-hash chain validation (block_seq.rs:58-150) — each element
    must link to its predecessor; count broken links per chain."""
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        li.withColumn("prev", F.lag("l_linenumber").over(w))
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("l_linenumber") != F.col("prev") + 1),
                    1,
                ).otherwise(0)
            ).alias("broken_links"),
            F.count("*").alias("chain_len"),
        )
    )


@query(
    "w3_dedup_largest_covering",
    """
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) = 1
    """,
)
def w3_dedup_largest_covering(spark: SparkSession, sf: str) -> DataFrame:
    """W3: among competing entries keep the largest-covering one
    (verify.rs:373-404) — ranking window with deterministic tiebreak."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )


@query(
    "w5_global_rank_order",
    """
    SELECT event_id, value,
           row_number() OVER (ORDER BY value DESC, event_id ASC) AS rk
    FROM events WHERE event_type = 'purchase'
    QUALIFY rk <= 100
    """,
)
def w5_global_rank_order(spark: SparkSession, sf: str) -> DataFrame:
    """W5: deterministic global ordering after a parallel stage (fetch
    results sorted by height, block.rs:62-72) — as a ranked top-k.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject (per-partition
    heap + driver merge), NOT a single-partition global sort; the ranking
    window then runs over just the k surviving rows."""
    ev = _t(spark, sf, "events").filter(F.col("event_type") == "purchase")
    order = [F.desc("value"), F.asc("event_id")]
    top = ev.select("event_id", "value").orderBy(*order).limit(100)
    return top.withColumn("rk", F.row_number().over(Window.orderBy(*order)))


@query(
    "w6_cumulative_distinct_hll",
    f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS d, user_id FROM events
    ), first_seen AS (
      SELECT user_id, min(d) AS d0 FROM ev GROUP BY 1
    ), days AS (SELECT DISTINCT d FROM ev),
    new_users AS (
      SELECT d0 AS d, count(*) AS n_new FROM first_seen GROUP BY 1
    ), exact_cum AS (
      -- running sum of first-seen users: cumulative distinct without a
      -- day x user non-equi join
      SELECT days.d,
             CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY days.d)
                  AS BIGINT) AS n_exact
      FROM days LEFT JOIN new_users n ON n.d = days.d
    ), h AS (
      SELECT DISTINCT d, user_id,
             ({_u32_sql_at("CAST(user_id AS VARCHAR)", 1)}) % 64 AS bucket,
             ({_u32_sql_at("CAST(user_id AS VARCHAR)", 9)}) AS v
      FROM ev
    ), r AS (
      SELECT d, bucket,
             max(CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END) AS mj
      FROM h GROUP BY 1, 2
    ), grid AS (
      SELECT days.d, b.b AS bucket
      FROM days, unnest(generate_series(0, 63)) b(b)
    ), merged AS (
      SELECT g.d, g.bucket,
             max(r.mj) OVER (PARTITION BY g.bucket ORDER BY g.d) AS mj
      FROM grid g LEFT JOIN r ON r.d = g.d AND r.bucket = g.bucket
    ), folded AS (
      SELECT d,
             count(mj) AS nb,
             coalesce(sum(power(2.0, -mj)), 0) AS z_ne
      FROM merged GROUP BY d
    ), est AS (
      SELECT f.d, e.n_exact, 64 - f.nb AS zeros,
             (0.7213 / (1 + 1.079 / 64)) * 64 * 64
               / ((64 - f.nb) + f.z_ne) AS e_raw
      FROM folded f JOIN exact_cum e ON e.d = f.d
    ), final AS (
      SELECT d, n_exact,
             CASE WHEN e_raw <= 160 AND zeros > 0
                  THEN 64 * ln(64.0 / zeros) ELSE e_raw END AS e_corr
      FROM est
    )
    SELECT CAST(d AS VARCHAR) AS day, n_exact,
           round(e_corr, 6) AS hll_cum_est,
           round(abs(e_corr - n_exact) / n_exact, 6) AS rel_err
    FROM final
    """,
)
def w6_cumulative_distinct_hll(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative distinct users per day, twice: exact (running sum of
    first-seen users) and via HLL REGISTER MERGING — the mergeable-sketch
    contract proven in-query: "union of streams = elementwise max of
    registers" becomes a running max over each of the 64 registers across
    days, so day N's estimate folds every event since day 1 without ever
    re-touching them. This is the shape a 100 TB rolling-uniques dashboard
    runs: per-day register updates are tiny (64 rows/day), history is
    merged by max, and the raw events are read exactly once.

    Scale shape: one groupBy(day, bucket) over the event stream (map-side
    partial max), a days×64 grid (metadata-scale) for the running merge,
    and the same exact-arithmetic fold as a18 (Z summands are exact powers
    of two — order-independent, oracle replays bit-for-bit). The exact
    side is its own two-shuffle plan (first-seen per user, then a
    day-bounded count)."""
    ev = _t(spark, sf, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    days = ev.select("d").distinct()
    new_users = first_seen.groupBy(F.col("d0").alias("d")).agg(
        F.count("*").alias("n_new")
    )
    wdays = Window.orderBy("d")
    exact_cum = (
        days.join(new_users, "d", "left")
        .withColumn(
            "n_exact",
            F.sum(F.coalesce("n_new", F.lit(0))).over(wdays),
        )
        .select("d", "n_exact")
    )
    uid = F.col("user_id").cast("string")
    v = F.conv(F.substring(F.md5(uid), 9, 8), 16, 10).cast("long")
    h = ev.select(
        "d",
        "user_id",
        (F.conv(F.substring(F.md5(uid), 1, 8), 16, 10).cast("long") % 64)
        .alias("bucket"),
        F.when(v == 0, 33).otherwise(33 - F.length(F.bin(v))).alias("rho"),
    ).distinct()
    r = h.groupBy("d", "bucket").agg(F.max("rho").alias("mj"))
    grid = days.select(
        "d", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bucket")
    )
    wmerge = Window.partitionBy("bucket").orderBy("d")
    merged = grid.join(r, ["d", "bucket"], "left").withColumn(
        "mj", F.max("mj").over(wmerge)
    )
    folded = merged.groupBy("d").agg(
        F.count("mj").alias("nb"),
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("mj"))), F.lit(0.0))
        .alias("z_ne"),
    )
    alpha = F.lit(0.7213) / (F.lit(1) + F.lit(1.079) / F.lit(64))
    e_raw = alpha * 64 * 64 / ((F.lit(64) - F.col("nb")) + F.col("z_ne"))
    zeros = F.lit(64) - F.col("nb")
    est = folded.join(exact_cum, "d").select(
        "d",
        "n_exact",
        F.when(
            (e_raw <= 160) & (zeros > 0), F.lit(64) * F.log(F.lit(64.0) / zeros)
        )
        .otherwise(e_raw)
        .alias("e_corr"),
    )
    return est.select(
        F.col("d").cast("string").alias("day"),
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round("e_corr", 6).alias("hll_cum_est"),
        F.round(F.abs(F.col("e_corr") - F.col("n_exact")) / F.col("n_exact"), 6)
        .alias("rel_err"),
    )


@query(
    "w7_decayed_mean",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), based AS (
      SELECT event_type, d, v,
             datediff('day', min(d) OVER (PARTITION BY event_type), d) AS dd
      FROM daily
    ), wsum AS (
      SELECT event_type, d,
             sum(v * exp(ln(2) / 7.0 * dd)) OVER w AS num,
             sum(exp(ln(2) / 7.0 * dd)) OVER w AS den
      FROM based
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day,
           round(num / den, 6) AS decayed_mean
    FROM wsum
    """,
)
def w7_decayed_mean(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially-decayed running mean (EMA) of daily event value per
    series, 7-day half-life — the freshness-weighted metric every
    monitoring rollup wants and Spark has no built-in for. The recursive
    EMA definition looks sequential; the closed form is two ORDINARY
    cumulative window sums (weights e^{λ·day} relative to each series'
    first day, with the current-day factor cancelling in the ratio), so
    the whole operator is one shuffle to daily cells plus one window
    sort per series — see ``operators/timeseries.decayed_mean``.

    Scale shape: the corpus reduces to series × days rows at the daily
    rollup (exact DECIMAL sums); the window runs on that metadata-scale
    table. Cumulative sums add in ascending day order on both engines —
    the identical double-add sequence — so round-6 values match."""
    from ..operators.timeseries import decayed_mean

    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast(DEC)).cast("double").alias("v")
    )
    out = decayed_mean(daily, "event_type", "d", "v", half_life_days=7.0)
    return out.select(
        "event_type", F.col("d").cast("string").alias("day"), "decayed_mean"
    )


@query(
    "w8_max_concurrency",
    """
    WITH iv AS (
      SELECT o_custkey AS custkey, o_orderkey AS id,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 120 AS INT) AS e
      FROM orders
    ), ev AS (
      SELECT custkey, s AS day, 1 AS delta FROM iv
      UNION ALL
      SELECT custkey, e + 1 AS day, -1 AS delta FROM iv
    ), run AS (
      SELECT custkey,
             sum(delta) OVER (
               PARTITION BY custkey ORDER BY day, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS level
      FROM ev
    )
    SELECT custkey, CAST(max(level) AS BIGINT) AS max_concurrent,
           CAST(count(*) / 2 AS BIGINT) AS n_intervals
    FROM run GROUP BY 1
    """,
)
def w8_max_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Maximum interval CONCURRENCY per key via a sweep line — how many
    order lifetimes (same synthetic durations as j10) are open at once
    per customer. The scalable alternative to counting overlap pairs
    when the question is load, not pairings: each interval becomes a +1
    event at its start and a −1 event past its end, ONE window running
    sum per key walks the timeline, and the max is the peak concurrency.
    Session capacity, connection-pool sizing, and stream-backfill
    planning are all this query.

    Determinism: all-integer sweep. At equal day the −1 sorts before the
    +1 (closed intervals touching end-to-start never double-count), and
    within an equal (day, delta) tie-group the running sum visits the
    same VALUE SET under any permutation (the deltas are identical), so
    the per-key max is order-independent even though row order isn't.

    Scale shape: 2 rows per interval, one partition-window sort per key,
    one grouped max — linear in intervals, ZERO joins; compare j10 which
    materializes the pairs (quadratic in per-key overlap degree)."""
    o = _t(spark, sf, "orders")
    iv = o.select(
        F.col("o_custkey").alias("custkey"),
        F.to_date("o_orderdate").alias("s"),
        F.date_add(
            F.to_date("o_orderdate"), (F.col("o_orderkey") % 120).cast("int")
        ).alias("e"),
    )
    ev = iv.select(
        "custkey", F.col("s").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            "custkey",
            F.date_add("e", 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("custkey")
        .orderBy("day", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = ev.select("custkey", F.sum("delta").over(w).alias("level"))
    return run.groupBy("custkey").agg(
        F.max("level").cast("bigint").alias("max_concurrent"),
        (F.count("*") / 2).cast("bigint").alias("n_intervals"),
    )


@query(
    "w9_rolling_quantile",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day, n,
           round(quantile_cont(n, 0.5) OVER w, 6) AS p50_7d,
           round(quantile_cont(n, 0.9) OVER w, 6) AS p90_7d
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def w9_rolling_quantile(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling WINDOW QUANTILES — trailing-7-day p50/p90 of daily event
    volume per series, the alerting baseline robust dashboards use where
    a rolling MEAN (a11) gets dragged by spikes. Pairs the exact
    percentile with the bounded-frame window family (a11 mean, w7
    decayed mean) and the corpus-level quantile sketch (a19) with its
    windowed exact counterpart.

    Determinism: both engines implement the same percentile_cont rule —
    position p·(count−1) on the frame's sorted values, linear
    interpolation between the two neighbors — over exact integer daily
    counts, so the arithmetic is a handful of identical IEEE ops.

    Scale shape: the corpus reduces to series × days cells at the daily
    rollup; the quantile window then sorts ≤7 values per row of that
    metadata-scale table — never a corpus-height frame."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        F.col("d").cast("string").alias("day"),
        "n",
        F.round(F.percentile("n", F.lit(0.5)).over(w), 6).alias("p50_7d"),
        F.round(F.percentile("n", F.lit(0.9)).over(w), 6).alias("p90_7d"),
    )


@query(
    "w10_rolling_zscore",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day, n,
           round(avg(n) OVER w, 6) AS mu_7d,
           round(stddev_samp(n) OVER w, 6) AS sd_7d,
           CASE WHEN count(*) OVER w >= 3 AND stddev_samp(n) OVER w > 0
                THEN round((n - avg(n) OVER w) / stddev_samp(n) OVER w, 6)
                END AS z
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ORDER BY event_type, day
    """,
)
def w10_rolling_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing z-score of daily event volume against the PRECEDING
    7-day window (frame excludes the current row, so a spike can't
    suppress its own alert) — the classic ingest-volume anomaly score a
    feed monitor thresholds downstream; z is NULL until 3 days of
    history exist or while the baseline is flat. Emits the score, not a
    thresholded flag: a boolean at |z|>2 would be knife-edge
    nondeterministic for a value landing exactly on the fence, while
    the rounded score itself is stable.

    Determinism: daily counts are exact integers; avg/stddev_samp over a
    ≤7-value frame are the same handful of IEEE double ops in both
    engines; round(·, 6) absorbs summation-order dust.

    Scale shape: the corpus reduces to series × days at the daily
    rollup; every window after that slides over the metadata-scale
    table (a11/w7/w9's shape, now with second-moment state)."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    cnt = F.count("*").over(w)
    return (
        daily.select(
            "event_type",
            F.col("d").cast("string").alias("day"),
            "n",
            F.round(mu, 6).alias("mu_7d"),
            F.round(sd, 6).alias("sd_7d"),
            F.when(
                (cnt >= 3) & (sd > 0), F.round((F.col("n") - mu) / sd, 6)
            ).alias("z"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "w11_dow_seasonality",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), typed AS (
      SELECT event_type,
             CAST(d - DATE '1970-01-01' AS INT) % 7 AS dow, n,
             avg(n) OVER (PARTITION BY event_type) AS overall_mean
      FROM daily
    )
    SELECT event_type, dow,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(n) AS BIGINT) AS n_events,
           round(avg(n), 6) AS mean_n,
           round(avg(n) / any_value(overall_mean), 6) AS seasonal_index
    FROM typed
    GROUP BY event_type, dow
    ORDER BY event_type, dow
    """,
)
def w11_dow_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    """Day-of-week seasonal profile of daily event volume: per
    (event_type, weekday) mean daily count and its seasonal index
    (weekday mean / overall daily mean). The baseline a feed monitor
    divides out BEFORE thresholding w10's rolling z-score — without it a
    perfectly healthy Monday spike on a weekday-heavy feed pages the
    on-call every week (classical multiplicative seasonal adjustment;
    reference parity: the reference reports raw per-window counts only,
    ``progress.rs`` — this is beyond-reference monitoring depth).

    Weekday key is the PORTABLE epoch-day mod 7 (0 = Thursday), not each
    engine's dayofweek() — Spark counts Sunday=1, DuckDB Sunday=0, and a
    locale knob should never decide a hash comparison.

    Determinism: daily counts are exact integers; mean and index are one
    integer-sum division each, the same IEEE double op in both engines;
    round(·, 6) absorbs dust.

    Scale shape: the corpus reduces to series × days at the daily rollup
    (w10's shape); the weekday regroup and the per-type overall mean both
    run over that metadata-scale table, never the event log. The final
    table is |event_types| × 7 rows."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    typed = daily.select(
        "event_type",
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7)
        .alias("dow"),
        "n",
        F.avg("n").over(Window.partitionBy("event_type")).alias("overall_mean"),
    )
    return (
        typed.groupBy("event_type", "dow")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("n").cast("long").alias("n_events"),
            F.round(F.avg("n"), 6).alias("mean_n"),
            F.round(F.avg("n") / F.first("overall_mean"), 6)
            .alias("seasonal_index"),
        )
        .orderBy("event_type", "dow")
    )


@query(
    "w12_cusum_drift",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), dev AS (
      SELECT event_type, d, n,
             n - avg(n) OVER (PARTITION BY event_type) AS x
      FROM daily
    ), pre AS (
      SELECT event_type, d, n,
             sum(x) OVER (PARTITION BY event_type ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS p
      FROM dev
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day, n,
           round(p - min(p) OVER (PARTITION BY event_type ORDER BY d
                                  ROWS UNBOUNDED PRECEDING), 6) AS cusum_up,
           round(max(p) OVER (PARTITION BY event_type ORDER BY d
                              ROWS UNBOUNDED PRECEDING) - p, 6) AS cusum_down
    FROM pre
    ORDER BY event_type, day
    """,
)
def w12_cusum_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sided CUSUM drift score of daily event volume (Page 1954):
    the classic sequential change-point statistic that accumulates small
    sustained deviations a per-day z-score (w10) never trips on — a feed
    that quietly loses 5% volume every day alarms here within weeks
    while staying inside every daily band.

    The textbook recursion S_t = max(0, S_{t-1} + x_t) looks
    non-parallel, but one-sided CUSUM has the closed prefix form
    S_t = P_t − min_{j≤t} P_j with P the running sum of deviations —
    so both sides reduce to three stock window functions (per-type mean,
    ordered cumsum, running min/max), no recursion, no UDF, and the
    identical expression replays in DuckDB.

    Determinism: deviations are integer-count minus an exact integer-mean
    division; the ordered cumsum adds doubles in one deterministic order
    (ORDER BY d within each type), and the running extremum picks among
    those exact prefix values — round(·, 6) absorbs the final dust.

    Scale shape: every window runs over the daily ROLLUP partitioned by
    event_type (w10/w11's metadata-scale table); per-partition state is
    one running sum + one extremum. The event log is touched once, by
    the rollup groupBy."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    full = Window.partitionBy("event_type")
    ordered = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = daily.select(
        "event_type",
        "d",
        "n",
        F.sum(F.col("n") - F.avg("n").over(full)).over(ordered).alias("p"),
    )
    return pre.select(
        "event_type",
        F.col("d").cast("string").alias("day"),
        "n",
        F.round(F.col("p") - F.min("p").over(ordered), 6).alias("cusum_up"),
        F.round(F.max("p").over(ordered) - F.col("p"), 6).alias("cusum_down"),
    ).orderBy("event_type", "day")


@query(
    "w13_seasonal_decomposition",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), win AS (
      SELECT event_type, d, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7,
             count(*) OVER (PARTITION BY event_type ORDER BY d
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
      FROM daily
    ), full7 AS (
      SELECT event_type, d, n, sum7, 7 * n - sum7 AS det7,
             CAST(d - DATE '1970-01-01' AS INT) % 7 AS dow
      FROM win WHERE cnt7 = 7
    ), seas AS (
      SELECT *, avg(det7) OVER (PARTITION BY event_type, dow) AS s7
      FROM full7
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day, n,
           round(sum7 / 7.0, 6) AS trend,
           round(s7 / 7.0, 6) AS seasonal,
           round(det7 / 7.0 - s7 / 7.0, 6) AS residual
    FROM seas ORDER BY event_type, day
    """,
)
def w13_seasonal_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily event volume:
    trend = centered 7-row moving average, seasonal = per-weekday mean of
    the detrended series, residual = the rest (the moving-average STL
    ancestor; Cleveland et al.'s step-0). w11 answers "what does a normal
    Monday look like"; this splits EVERY observation into the three
    components so the residual stream can feed w10's z-score / w12's
    CUSUM without the weekly heartbeat drowning the signal.

    Determinism is engineered exact-integer-first: edge rows with a
    partial window are EXCLUDED (cnt7 = 7), so 7·n − sum7 is an exact
    bigint; the weekday seasonal mean averages those integers (doubles
    sum integer values < 2^53 exactly in any order, then one division);
    trend / seasonal / residual each apply the identical one-or-two IEEE
    double ops in both engines; round(·, 6) absorbs dust. Weekday is the
    portable epoch-day mod 7 (w11's contract).

    Scale shape: everything after the daily rollup groupBy runs over the
    series × days metadata table (w10-w12's shape); the two windows are
    partitioned by event_type (state = 7 rows) and by (event_type, dow)
    (one running integer sum). The event log is touched once."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    )
    full7 = (
        daily.select(
            "event_type",
            "d",
            "n",
            F.sum("n").over(w7).alias("sum7"),
            F.count("*").over(w7).alias("cnt7"),
        )
        .filter(F.col("cnt7") == 7)
        .select(
            "event_type",
            "d",
            "n",
            "sum7",
            (F.lit(7) * F.col("n") - F.col("sum7")).alias("det7"),
            (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7)
            .alias("dow"),
        )
    )
    seas = full7.withColumn(
        "s7", F.avg("det7").over(Window.partitionBy("event_type", "dow"))
    )
    return seas.select(
        "event_type",
        F.col("d").cast("string").alias("day"),
        "n",
        F.round(F.col("sum7") / 7.0, 6).alias("trend"),
        F.round(F.col("s7") / 7.0, 6).alias("seasonal"),
        F.round(F.col("det7") / 7.0 - F.col("s7") / 7.0, 6).alias("residual"),
    ).orderBy("event_type", "day")


@query(
    "w14_anomaly_incidents",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), z AS (
      SELECT event_type, d, n,
             CASE WHEN count(*) OVER w >= 3 AND stddev_samp(n) OVER w > 0
                  THEN round((n - avg(n) OVER w) / stddev_samp(n) OVER w, 6)
                  END AS z
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ), flagged AS (
      SELECT event_type, d, n, z,
             CAST(d - DATE '1970-01-01' AS INT)
               - row_number() OVER (PARTITION BY event_type ORDER BY d) AS grp
      FROM z WHERE abs(z) > 1.5
    )
    SELECT event_type,
           CAST(min(d) AS VARCHAR) AS start_day,
           CAST(max(d) AS VARCHAR) AS end_day,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(n) AS BIGINT) AS peak_n,
           round(max(abs(z)), 6) AS peak_abs_z
    FROM flagged GROUP BY event_type, grp
    ORDER BY event_type, start_day
    """,
)
def w14_anomaly_incidents(spark: SparkSession, sf: str) -> DataFrame:
    """Anomalous days merged into INCIDENTS: w10's trailing z-score
    flags days, and consecutive flagged days collapse into one incident
    row (start/end/duration/peak) via the gaps-and-islands trick
    (epoch-day minus per-type row_number is constant within a
    consecutive run) — the difference between a pager firing four times
    for one four-day outage and once with a duration (A1's island
    operator applied to the monitoring stream).

    Thresholding is done on the ROUNDED z (w10's knife-edge caveat):
    both engines compare the identical round(z, 6) double against 1.5,
    so a value landing exactly on the fence resolves the same way
    everywhere — the comparison is deterministic even though a raw
    float threshold would not be.

    Scale shape: w10's daily-rollup window, then islands arithmetic on
    the FLAGGED subset only (anomalies are rare by construction — the
    grouping key table is incident-scale, not day-scale)."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-7, -1)
    z = F.when(
        (F.count("*").over(w) >= 3) & (F.stddev_samp("n").over(w) > 0),
        F.round((F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w), 6),
    )
    scored = daily.select("event_type", "d", "n", z.alias("z"))
    rn = Window.partitionBy("event_type").orderBy("d")
    flagged = scored.filter(F.abs(F.col("z")) > 1.5).select(
        "event_type",
        "d",
        "n",
        "z",
        (
            F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(rn)
        ).alias("grp"),
    )
    return (
        flagged.groupBy("event_type", "grp")
        .agg(
            F.min("d").cast("string").alias("start_day"),
            F.max("d").cast("string").alias("end_day"),
            F.count("*").cast("long").alias("n_days"),
            F.max("n").cast("long").alias("peak_n"),
            F.round(F.max(F.abs("z")), 6).alias("peak_abs_z"),
        )
        .select(
            "event_type", "start_day", "end_day", "n_days", "peak_n", "peak_abs_z"
        )
        .orderBy("event_type", "start_day")
    )


@query(
    "w15_holt_forecast",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type, list(n ORDER BY d) AS xs,
             count(*) AS n_days
      FROM daily GROUP BY event_type
    ), folded AS (
      -- state rides as [level, trend]: DuckDB 1.0's list_reduce
      -- mis-evaluates STRUCT accumulators (later fields collapse into
      -- the first), while list accumulators fold correctly
      SELECT event_type, n_days,
             list_reduce(
               list_transform(xs,
                 x -> [CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE)]),
               (acc, x) -> [
                 0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                 0.25 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
                   + 0.75 * acc[2]
               ]
             ) AS st
      FROM series
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(st[1], 6) AS level,
           round(st[2], 6) AS trend,
           round(st[1] + 7 * st[2], 6) AS forecast_7d
    FROM folded ORDER BY event_type
    """,
)
def w15_holt_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """Holt's double exponential smoothing (level + trend) over each
    event type's daily volume, with the 7-day-ahead linear forecast —
    the capacity-planning number (α=0.5, β=0.25; Holt 1957) that w7's
    plain EMA can't produce because it has no trend state. A feed
    growing 3%/day reads "normal" to every window statistic here until
    it isn't; the trend term is the early signal.

    The recursion S_t = αx_t + (1−α)(S_{t−1}+b_{t−1}) is inherently
    sequential — no window frame expresses it — so it runs as a
    higher-order-function FOLD over the per-series value array
    (``aggregate`` in Spark, ``list_reduce`` in DuckDB), seeded with
    (level=x₁, trend=0) and folding elements 2..n in day order. Both
    engines execute the IDENTICAL sequence of IEEE double ops on the
    identical operand order, and the smoothing constants are dyadic
    (0.5/0.25/0.75 exact in binary), so the fold replays bit-for-bit;
    round(·, 6) guards the final projection.

    Scale shape: the corpus reduces to the daily rollup; each series'
    array is days-long (metadata scale — the collect_list group is the
    SERIES, never the event log). For series too long for one row, the
    same fold runs inside ``applyInPandas`` per key — the pattern, one
    ordered fold per series, is unchanged."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("double").alias("n")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "n"))).alias("pairs"),
        F.count("*").cast("long").alias("n_days"),
    )
    xs = F.transform(F.col("pairs"), lambda s: s.getField("n"))
    init = F.struct(
        F.element_at(xs, 1).alias("level"), F.lit(0.0).alias("trend")
    )

    def step(acc, x):
        new_level = 0.5 * x + 0.5 * (
            acc.getField("level") + acc.getField("trend")
        )
        return F.struct(
            new_level.alias("level"),
            (
                0.25 * (new_level - acc.getField("level"))
                + 0.75 * acc.getField("trend")
            ).alias("trend"),
        )

    tail = F.slice(xs, F.lit(2), F.greatest(F.size(xs) - 1, F.lit(0)))
    st = F.aggregate(tail, init, step)
    return series.select(
        "event_type",
        "n_days",
        F.round(st.getField("level"), 6).alias("level"),
        F.round(st.getField("trend"), 6).alias("trend"),
        F.round(st.getField("level") + 7 * st.getField("trend"), 6)
        .alias("forecast_7d"),
    ).orderBy("event_type")


@query(
    "w16_changepoint",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), pre AS (
      SELECT event_type, d, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS sl,
             sum(n * n) OVER (PARTITION BY event_type ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS sl2,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS k,
             sum(n) OVER (PARTITION BY event_type) AS st,
             sum(n * n) OVER (PARTITION BY event_type) AS st2,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM daily
    ), costs AS (
      SELECT event_type, d, k, nd, sl, st,
             (CAST(sl2 AS DOUBLE)
              - CAST(sl AS DOUBLE) * sl / k)
             + (CAST(st2 - sl2 AS DOUBLE)
                - CAST(st - sl AS DOUBLE) * (st - sl) / (nd - k)) AS cost,
             CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * st / nd AS sse_total
      FROM pre WHERE k < nd
    ), best AS (
      SELECT event_type, d, k, nd, sl, st, cost, sse_total,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cost ASC, d ASC) AS rn
      FROM costs
    )
    SELECT event_type,
           CAST(d AS VARCHAR) AS split_day,
           CAST(nd AS BIGINT) AS n_days,
           CAST(k AS BIGINT) AS left_days,
           round(CAST(sl AS DOUBLE) / k, 6) AS left_mean,
           round(CAST(st - sl AS DOUBLE) / (nd - k), 6) AS right_mean,
           round(sse_total - cost, 6) AS gain
    FROM best WHERE rn = 1
    ORDER BY event_type
    """,
)
def w16_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """Offline changepoint localization per event type: the single best
    level-shift split of the daily-volume series by binary segmentation
    (Scott & Knott 1974 / the first step of PELT-style segmentation) —
    the day k that minimizes SSE_left + SSE_right. Complements w12: CUSUM
    *alarms* that drift happened; this query *localizes* the shift and
    quantifies it (left/right means + variance-reduction gain) — the
    "when did the crawler/feed change behavior" post-mortem every corpus
    ingestion pipeline runs.

    Non-obvious reduction: each candidate split's SSE needs only prefix
    sums — SSE(1..k) = Σx² − (Σx)²/k — so the O(n²) naive scan collapses
    to three stock windows over the daily rollup (ordered cumsum of n and
    n², per-type totals) and an argmin window. No recursion, no UDF, no
    per-split pass.

    Determinism: every prefix/total sum is an exact BIGINT over integer
    day counts; the cost is a fixed chain of IEEE double ops on those
    exact operands (identical both engines), the argmin tie-breaks on
    day, and the projection is round(·, 6)-guarded.

    Scale shape: the corpus reduces to the daily rollup in its one
    groupBy; every window is partitioned by event_type over days —
    metadata-scale state (one running pair of sums per type). 100× data
    grows only the rollup scan."""
    from ..operators.timeseries import best_level_shift

    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("n")
    )
    return best_level_shift(daily).orderBy("event_type")


@query(
    "w17_theil_sen_trend",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(ts AS DATE) - DATE '1970-01-01' AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             CAST(b.n - a.n AS DOUBLE) / (b.d - a.d) AS slope,
             a.d AS da, b.d AS db
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ), ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope, da, db) AS rn,
             count(*) OVER (PARTITION BY event_type) AS np
      FROM pairs
    ), ts AS (
      SELECT event_type, slope AS ts_slope, np
      FROM ranked WHERE rn = (np + 1) // 2
    ), ols AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             (count(*) * sum(d * n) - sum(d) * sum(n)) AS num,
             (count(*) * sum(d * d) - sum(d) * sum(d)) AS den
      FROM daily GROUP BY 1
    )
    SELECT o.event_type,
           o.n_days,
           CAST(t.np AS BIGINT) AS n_pairs,
           round(t.ts_slope, 6) AS ts_slope,
           round(CAST(o.num AS DOUBLE) / o.den, 6) AS ols_slope
    FROM ols o JOIN ts t ON t.event_type = o.event_type
    ORDER BY o.event_type
    """,
)
def w17_theil_sen_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen robust trend per event type — the discrete lower median
    of all pairwise daily-count slopes (Theil 1950 / Sen 1968), side by
    side with the OLS slope. The divergence between the two IS the audit:
    OLS bends toward volume spikes and outage days; the median slope
    ignores up to ~29% contaminated points — the robust drift signal for
    corpus-ingest monitoring.

    Determinism: each pairwise slope is one IEEE division of exact
    integers (daily BIGINT counts, epoch-day ints), the median is the
    DISCRETE element at rank (m+1)//2 under a total order (slope, then
    day pair), and the OLS slope is one division of exact BIGINT
    cross-sums — no accumulation-order dependence anywhere. Scale shape:
    the O(days²) pair join runs per key on the DAILY ROLLUP (30 days →
    435 pairs), never the corpus; the corpus is touched once by the
    groupBy that builds ``daily``."""
    ev = _t(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias("d"),
    ).agg(F.count("*").alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.n") - F.col("a.n")).cast("double")
         / (F.col("b.d") - F.col("a.d"))).alias("slope"),
        F.col("a.d").alias("da"),
        F.col("b.d").alias("db"),
    )
    w = Window.partitionBy("event_type").orderBy("slope", "da", "db")
    ranked = pairs.select(
        "event_type", "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("np"),
    )
    ts = ranked.filter(
        F.col("rn") == F.floor((F.col("np") + 1) / 2)
    ).select("event_type", F.col("slope").alias("ts_slope"), "np")
    ols = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        (F.count("*") * F.sum(F.col("d") * F.col("n"))
         - F.sum("d") * F.sum("n")).alias("num"),
        (F.count("*") * F.sum(F.col("d") * F.col("d"))
         - F.sum("d") * F.sum("d")).alias("den"),
    )
    return (
        ols.join(ts, "event_type")
        .select(
            "event_type",
            F.col("n_days").cast("long").alias("n_days"),
            F.col("np").cast("long").alias("n_pairs"),
            F.round("ts_slope", 6).alias("ts_slope"),
            F.round(F.col("num").cast("double") / F.col("den"), 6)
            .alias("ols_slope"),
        )
        .orderBy("event_type")
    )
