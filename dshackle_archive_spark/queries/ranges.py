"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import Window


from pyspark.sql import functions as F


from ._registry import _t, query


@query(
    "c1_chunk_split",
    """
    SELECT CAST(floor(event_id / 100) AS BIGINT) AS chunk,
           count(*) AS n, min(event_id) AS lo, max(event_id) AS hi
    FROM events GROUP BY 1
    """,
)
def c1_chunk_split(spark: SparkSession, sf: str) -> DataFrame:
    """C1: split the height domain into absolute chunk-aligned pieces
    (range.rs:220-261) — floor-div bucketing."""
    ev = _t(spark, sf, "events")
    return ev.groupBy(F.floor(F.col("event_id") / 100).cast("long").alias("chunk")).agg(
        F.count("*").alias("n"), F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )


@query(
    "c3_tail_n",
    """
    SELECT event_id, event_type, value FROM events
    ORDER BY event_id DESC LIMIT 20
    """,
)
def c3_tail_n(spark: SparkSession, sf: str) -> DataFrame:
    """C3: --tail N — the last N heights (blocks_config.rs:27-46)."""
    ev = _t(spark, sf, "events")
    return ev.orderBy(F.desc("event_id")).limit(20).select("event_id", "event_type", "value")


@query(
    "e3_union_of_listings",
    """
    SELECT event_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'error'
    """,
)
def e3_union_of_listings(spark: SparkSession, sf: str) -> DataFrame:
    """E3/S5: union of two ordered listings — Catalyst handles merge order
    (sorted_files.rs:6-44 is unnecessary as an operator in Spark)."""
    ev = _t(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click").select("event_id", "event_type")
    b = ev.filter(F.col("event_type") == "error").select("event_id", "event_type")
    return a.unionByName(b)


@query(
    "e4_set_equality_check",
    """
    WITH expected AS (SELECT DISTINCT o_orderkey AS k FROM orders),
         actual   AS (SELECT DISTINCT l_orderkey AS k FROM lineitem)
    SELECT 'missing' AS side, k FROM expected WHERE k NOT IN (SELECT k FROM actual)
    UNION ALL
    SELECT 'unexpected' AS side, k FROM actual WHERE k NOT IN (SELECT k FROM expected)
    """,
)
def e4_set_equality_check(spark: SparkSession, sf: str) -> DataFrame:
    """E4: tx-id set equality via two anti-joins (verify.rs:689-700) —
    both directions must be empty for a verified range."""
    o = _t(spark, sf, "orders").select(F.col("o_orderkey").alias("k")).distinct()
    li = _t(spark, sf, "lineitem").select(F.col("l_orderkey").alias("k")).distinct()
    missing = o.join(li, "k", "left_anti").select(F.lit("missing").alias("side"), "k")
    unexpected = li.join(o, "k", "left_anti").select(F.lit("unexpected").alias("side"), "k")
    return missing.unionByName(unexpected)


@query(
    "t8_sessionization",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL
                       OR CAST(floor(epoch(ts)) AS BIGINT)
                          - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM ordered
    )
    SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM marked GROUP BY user_id
    """,
)
def t8_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """T8: session windows (free in Spark, absent in the reference) — 30-min
    inactivity gap sessionization per user."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn("prev_ts", F.lag("ts").over(w)).select(
        "user_id",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.unix_timestamp(F.col("ts").cast("timestamp"))
                - F.unix_timestamp(F.col("prev_ts").cast("timestamp"))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_s").alias("n_sessions"), F.count("*").alias("n_events")
    )


@query(
    "c2_aligned_complete_chunks",
    """
    SELECT CAST(floor(event_id / 100) AS BIGINT) AS chunk,
           count(*) AS n
    FROM events WHERE value > 20
    GROUP BY 1 HAVING count(DISTINCT event_id) = 100
    """,
)
def c2_aligned_complete_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """C2: only fully-covered boundary-aligned chunks qualify (compaction's
    gate, range.rs:235-251) — chunks where every height is present."""
    ev = _t(spark, sf, "events").filter(F.col("value") > 20)
    return (
        ev.groupBy(F.floor(F.col("event_id") / 100).cast("long").alias("chunk"))
        .agg(F.count("*").alias("n"), F.countDistinct("event_id").alias("nd"))
        .filter(F.col("nd") == 100)
        .drop("nd")
    )


@query(
    "t9_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1
    )
    SELECT 'view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT 'click_after_view', count(*) FROM c
    UNION ALL SELECT 'purchase_after_click', count(*) FROM p
    """,
)
def t9_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, each stage
    strictly after the previous one's first occurrence) — the sequential-
    pattern shape behind user-journey analytics. Three min-aggregations
    chained by broadcast joins on user_id; every stage's key set shrinks,
    so the expensive scans stay on the (filtered, pushed-down) event_type
    partitions."""
    from ..operators.funnel import funnel_counts

    ev = _t(spark, sf, "events")
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click_after_view", F.col("event_type") == "click"),
        ("purchase_after_click", F.col("event_type") == "purchase"),
    ]
    return funnel_counts(ev, steps).withColumnRenamed("n_keys", "n_users")
