"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import functions as F


from ._registry import _t, query


@query(
    "j1_integrity_anti_join",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j1_integrity_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """J1 shape: left-anti integrity join — expected vs present
    (verify.rs:648-703). Here: customers with no orders."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "j2_semi_join",
    """
    SELECT p.p_partkey, p.p_brand FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def j2_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """J1/J2 positive direction as a semi join: parts referenced by lineitem."""
    p = _t(spark, sf, "part")
    li = _t(spark, sf, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_brand"
    )


@query(
    "j3_group_pivot_completeness",
    """
    SELECT user_id,
           max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
           max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
    FROM events GROUP BY user_id
    HAVING max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 0
        OR max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 0
        OR max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0
    """,
)
def j3_group_pivot_completeness(spark: SparkSession, sf: str) -> DataFrame:
    """J3/A4: group-by-range assembly + incomplete-kind flags
    (range_group.rs:84-112): which users lack one of the expected kinds."""
    ev = _t(spark, sf, "events")
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("has_click"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("has_view"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_purchase"
        ),
    )
    return flags.filter(
        (F.col("has_click") == 0) | (F.col("has_view") == 0) | (F.col("has_purchase") == 0)
    )


@query(
    "j4_fork_choice_join",
    """
    WITH head AS (
      SELECT o_custkey, max(o_totalprice) AS head_price
      FROM orders GROUP BY o_custkey
    )
    SELECT o.o_custkey, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o JOIN head h
      ON o.o_custkey = h.o_custkey AND o.o_totalprice = h.head_price
    """,
)
def j4_fork_choice_join(spark: SparkSession, sf: str) -> DataFrame:
    """J4 shape: among competing candidates per key, keep the one matching
    the live-chain lookup (verify.rs:328-369). The lookup side is broadcast."""
    o = _t(spark, sf, "orders").alias("o")
    head = (
        _t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("h_custkey"))
        .agg(F.max("o_totalprice").alias("head_price"))
        .alias("h")
    )
    return o.join(
        F.broadcast(head),
        (F.col("o.o_custkey") == F.col("h.h_custkey"))
        & (F.col("o.o_totalprice") == F.col("h.head_price")),
    ).select(
        "o.o_custkey",
        "o.o_orderkey",
        F.col("o.o_totalprice").cast("double").alias("o_totalprice"),
    )


@query(
    "j7_range_chunk_assignment",
    """
    WITH spans AS (
      SELECT o_custkey, min(o_orderkey) AS span_start, max(o_orderkey) AS span_end
      FROM orders GROUP BY o_custkey
    ), chunks AS (
      SELECT DISTINCT CAST(floor(o_orderkey / 100) AS BIGINT) AS chunk_id,
             CAST(floor(o_orderkey / 100) AS BIGINT) * 100 AS chunk_start,
             CAST(floor(o_orderkey / 100) AS BIGINT) * 100 + 99 AS chunk_end
      FROM orders
    )
    SELECT s.o_custkey, c.chunk_id FROM spans s JOIN chunks c
      ON s.span_start <= c.chunk_end AND c.chunk_start <= s.span_end
    """,
)
def j7_range_chunk_assignment(spark: SparkSession, sf: str) -> DataFrame:
    """J7: interval-overlap join of file ranges to work chunks
    (compact.rs:56-113). The chunk side is tiny → broadcast range join."""
    o = _t(spark, sf, "orders")
    spans = o.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("span_start"), F.max("o_orderkey").alias("span_end")
    )
    chunks = (
        o.select(F.floor(F.col("o_orderkey") / 100).cast("long").alias("chunk_id"))
        .distinct()
        .select(
            "chunk_id",
            (F.col("chunk_id") * 100).alias("chunk_start"),
            (F.col("chunk_id") * 100 + 99).alias("chunk_end"),
        )
    )
    return spans.join(
        F.broadcast(chunks),
        (spans.span_start <= chunks.chunk_end) & (chunks.chunk_start <= spans.span_end),
    ).select("o_custkey", "chunk_id")


@query(
    "j8_asof_join",
    """
    WITH l AS (
      SELECT o_orderkey, o_custkey % 150 AS user_id, o_orderkey % 365 AS t
      FROM orders
    ), r AS (
      SELECT user_id, event_id % 365 AS t, event_id FROM events
    ), ranked AS (
      SELECT l.o_orderkey, l.user_id, l.t, r.event_id,
             row_number() OVER (
               PARTITION BY l.o_orderkey
               ORDER BY r.t DESC, r.event_id DESC) AS rn
      FROM l LEFT JOIN r ON r.user_id = l.user_id AND r.t <= l.t
    )
    SELECT o_orderkey, user_id, t, event_id AS last_event_id
    FROM ranked WHERE rn = 1
    """,
)
def j8_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """AS-OF JOIN (an operator Spark lacks natively): each order matched to
    the latest event at or before its point on a per-key timeline, ties by
    max event id, null when no prior event. The Spark plan is the union
    trick (``operators/asof.py``): ONE shuffle + sort over |L|+|R| rows
    with a running last-non-null — never the range-join expansion the
    oracle's LEFT JOIN + row_number replay builds (which is exactly why the
    oracle is an independent check, not the same algorithm twice)."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf, "events").select(
        "user_id", (F.col("event_id") % 365).alias("t"), "event_id"
    )
    orders = _t(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 150).alias("user_id"),
        (F.col("o_orderkey") % 365).alias("t"),
    )
    out = asof_join(
        orders, ev, key="user_id", left_ts="t", right_ts="t",
        value_cols=["event_id"], tie_col="event_id",
    )
    return out.withColumnRenamed("event_id", "last_event_id")


@query(
    "j9_banded_range_self_join",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
             CAST(floor(datediff('day', DATE '1995-01-01',
                                 CAST(o_orderdate AS DATE)) / 30) AS BIGINT) AS band
      FROM orders
    ), expanded AS (
      SELECT o.*, o.band + t.i AS probe_band FROM o, range(0, 2) t(i)
    ), pairs AS (
      SELECT a.o_custkey AS custkey,
             a.o_orderkey AS order_a, b.o_orderkey AS order_b,
             datediff('day', a.d, b.d) AS gap_days
      FROM expanded a JOIN o b
        ON b.o_custkey = a.o_custkey AND b.band = a.probe_band
      WHERE (a.d < b.d OR (a.d = b.d AND a.o_orderkey < b.o_orderkey))
        AND datediff('day', a.d, b.d) <= 30
    )
    SELECT custkey, count(*) AS n_rapid_pairs, min(gap_days) AS min_gap
    FROM pairs GROUP BY 1 HAVING count(*) >= 3
    """,
)
def j9_banded_range_self_join(spark: SparkSession, sf: str) -> DataFrame:
    """Banded range SELF-join: customers placing orders within 30 days of
    a previous order. A naive |date_a − date_b| ≤ 30 theta-join is a
    per-customer cartesian; BANDING makes it an equi join — each order
    lands in a 30-day band, probes its own and the NEXT band (any ≤30-day
    pair is within one band step), and the residual date predicate runs
    post-join. The standard rewrite for temporal proximity joins at scale;
    the oracle replays the identical banding."""
    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.floor(
            F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")) / 30
        ).cast("long").alias("band"),
    )
    expanded = o.select(
        "*", F.explode(F.array(F.col("band"), F.col("band") + 1)).alias("probe_band")
    )
    b = o.select(
        F.col("o_custkey").alias("b_custkey"),
        F.col("o_orderkey").alias("order_b"),
        F.col("d").alias("b_d"),
        F.col("band").alias("b_band"),
    )
    pairs = (
        expanded.join(
            b,
            (F.col("b_custkey") == F.col("o_custkey"))
            & (F.col("b_band") == F.col("probe_band")),
        )
        .filter(
            (
                (F.col("d") < F.col("b_d"))
                | ((F.col("d") == F.col("b_d")) & (F.col("o_orderkey") < F.col("order_b")))
            )
            & (F.datediff(F.col("b_d"), F.col("d")) <= 30)
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.datediff(F.col("b_d"), F.col("d")).alias("gap_days"),
        )
    )
    return (
        pairs.groupBy("custkey")
        .agg(F.count("*").alias("n_rapid_pairs"), F.min("gap_days").alias("min_gap"))
        .filter(F.col("n_rapid_pairs") >= 3)
    )


@query(
    "j10_interval_overlap_join",
    """
    WITH iv AS (
      SELECT o_custkey AS custkey, o_orderkey AS id,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 120 AS INT) AS e
      FROM orders
    ), pairs AS (
      SELECT a.custkey,
             CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT) + 1
               AS overlap_days
      FROM iv a JOIN iv b
        ON a.custkey = b.custkey AND a.id < b.id
       AND a.s <= b.e AND b.s <= a.e
    )
    SELECT custkey,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(max(overlap_days) AS BIGINT) AS max_overlap_days,
           CAST(sum(overlap_days) AS BIGINT) AS total_overlap_days
    FROM pairs GROUP BY 1
    """,
)
def j10_interval_overlap_join(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-OVERLAP self-join: pairs of order lifetimes (orderdate +
    orderkey%120 days — a deterministic synthetic duration) that overlap
    on the same customer, reduced to per-customer overlap stats. The
    third member of the temporal-join family (j8 as-of = latest-before,
    j9 banded = within-distance, j10 = ranges-intersect) and the shape
    behind session-concurrency and double-booking queries.

    Scale shape: a theta overlap join is a per-key cartesian; the
    operator (``operators/asof.overlap_self_join``) explodes each
    interval into its covered 60-day calendar bands (≤3 rows per
    interval here — bounded by duration/band), equi-joins on
    ``(key, band)``, and counts each pair exactly once in the band
    where its overlap STARTS — no DISTINCT over the collision
    explosion. The oracle runs the direct non-equi join; the engine
    never does."""
    from ..operators.asof import overlap_self_join

    o = _t(spark, sf, "orders")
    iv = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("id"),
        F.to_date("o_orderdate").alias("s"),
        F.date_add(
            F.to_date("o_orderdate"), (F.col("o_orderkey") % 120).cast("int")
        ).alias("e"),
    )
    pairs = overlap_self_join(
        iv, key="custkey", id_col="id", start_col="s", end_col="e",
        band_days=60,
    )
    return pairs.groupBy("custkey").agg(
        F.count("*").alias("n_overlaps"),
        F.max("overlap_days").cast("bigint").alias("max_overlap_days"),
        F.sum("overlap_days").alias("total_overlap_days"),
    )
