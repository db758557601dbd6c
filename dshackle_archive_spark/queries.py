"""Query registry: every SURVEY §2 operator as a (Spark builder, oracle SQL) pair.

Keys are prefixed with the SURVEY §2 operator id they exercise (p1_, j1_,
a3_, w1_, ...), so the coverage checklist maps 1:1 onto this registry. Each
Spark builder takes ``(spark, sf_dir)`` and returns a DataFrame; the oracle
is equivalent ANSI SQL run by DuckDB over the same parquet tables.

Determinism rules (the driver hash-compares values):
- monetary/quantity aggregations go through DECIMAL casts (exact, order-
  independent) and only convert to DOUBLE at the end;
- no raw TIMESTAMP outputs (ns vs us precision) — dates become strings,
  buckets become epoch longs;
- every top-k has a total tiebreak order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from .core.checkpoint import reliable_checkpoint

from .sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = fn
        if sql is not None:
            _ORACLE[name] = sql
        return fn

    return deco


def registry() -> dict[str, QueryFn]:
    """All registered queries, in registration order (the order they appear
    in this module). Any consumer-specific ordering — e.g. the external
    correctness driver's coverage rotation — belongs to that consumer's
    adapter (``__spark_entry__.py``), not to this API."""
    return dict(_REGISTRY)


def oracles() -> dict[str, str]:
    return dict(_ORACLE)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


DEC = "decimal(18,2)"


def _lsh_cte(n_tables: int, n_bits: int, source: str, dim: int = 64) -> str:
    """SQL CTE fragment replaying ``operators/similarity.py``'s deterministic
    hyperplane LSH over ``source (vec_id, embedding)`` bit-for-bit: the
    splitmix-style plane hash (HUGEINT guards the 32x32-bit products), sign
    buckets via ordered string_agg, and the candidate equi-join. Defines
    ``flat`` (unnested vectors), ``norms`` and ``cands (va < vb)``."""
    return f"""
    plane_raw AS (
      SELECT t.t AS table_id, b.b AS bit, i.i - 1 AS i,
             (t.t * 1000003 + b.b * 10007 + (i.i - 1) * 97 + 2654435769)
               % 4294967296 AS x
      FROM range(0, {n_tables}) t(t), range(0, {n_bits}) b(b),
           range(1, {dim + 1}) i(i)
    ), p1 AS (
      SELECT table_id, bit, i, xor(x, x >> 16) AS x FROM plane_raw
    ), p2 AS (
      SELECT table_id, bit, i,
             CAST((CAST(x AS HUGEINT) * 2246822507) % 4294967296 AS BIGINT) AS x
      FROM p1
    ), p3 AS (
      SELECT table_id, bit, i, xor(x, x >> 13) AS x FROM p2
    ), p4 AS (
      SELECT table_id, bit, i,
             CAST((CAST(x AS HUGEINT) * 3266489909) % 4294967296 AS BIGINT) AS x
      FROM p3
    ), planes AS (
      SELECT table_id, bit, i,
             (CAST(xor(x, x >> 16) AS DOUBLE) / 4294967295) * 2.0 - 1.0 AS w
      FROM p4
    ), flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM {source}, range(1, {dim + 1}) t(i)
    ), dots AS (
      SELECT f.vec_id, p.table_id, p.bit, sum(f.x * p.w) AS d
      FROM flat f JOIN planes p ON p.i = f.i
      GROUP BY 1, 2, 3
    ), sigs AS (
      SELECT vec_id, table_id,
             string_agg(CASE WHEN d >= 0 THEN '1' ELSE '0' END, '' ORDER BY bit)
               AS bucket
      FROM dots GROUP BY 1, 2
    ), cands AS (
      SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
      FROM sigs a JOIN sigs b
        ON a.table_id = b.table_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    )"""


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# ---------------------------------------------------------------------------

@query(
    "p1_height_range_filter",
    """
    SELECT event_id, event_type, value
    FROM events WHERE event_id BETWEEN 200 AND 400
    """,
)
def p1_height_range_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P1: keep records with height ∈ [start, end] (compact.rs:371-383).

    At scale the BETWEEN predicate reaches the parquet scan (PushedFilters)
    and, on the archive layout, prunes l1/l2 partitions.
    """
    ev = _t(spark, sf, "events")
    return ev.filter((F.col("event_id") >= 200) & (F.col("event_id") <= 400)).select(
        "event_id", "event_type", "value"
    )


@query(
    "p3_projection",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DOUBLE) AS net_price
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def p3_projection(spark: SparkSession, sf: str) -> DataFrame:
    """P3: narrow field projection + computed column (avros.rs:252-260 shape)."""
    li = _t(spark, sf, "lineitem")
    net = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("double")
    return li.filter(F.col("l_orderkey") < 100).select(
        "l_orderkey", "l_linenumber", net.alias("net_price")
    )


@query(
    "p4_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_id < 500
    """,
)
def p4_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """P4: schema-on-read projection out of an embedded JSON payload
    (compact.rs:330-341, verify.rs:838-861)."""
    ev = _t(spark, sf, "events")
    return ev.filter(F.col("event_id") < 500).select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


@query(
    "p5_null_empty_checks",
    """
    SELECT
      CASE WHEN text IS NULL OR length(text) = 0 OR lower(text) = 'null'
           THEN 'invalid' ELSE 'valid' END AS status,
      count(*) AS n
    FROM documents GROUP BY 1
    """,
)
def p5_null_empty_checks(spark: SparkSession, sf: str) -> DataFrame:
    """P5: payload must exist, be non-empty, and not literal "null"
    (verify.rs:579-621)."""
    docs = _t(spark, sf, "documents")
    status = F.when(
        F.col("text").isNull() | (F.length("text") == 0) | (F.lower("text") == "null"),
        F.lit("invalid"),
    ).otherwise(F.lit("valid"))
    return docs.groupBy(status.alias("status")).agg(F.count("*").alias("n"))


@query(
    "p7_hex_roundtrip",
    "SELECT event_id, event_id AS parsed FROM events WHERE event_id < 1000",
)
def p7_hex_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """P7: 0x-hex quantity parsing (ethereum.rs:369-372) — encode then parse
    back; the oracle states the semantic identity."""
    ev = _t(spark, sf, "events")
    return ev.filter(F.col("event_id") < 1000).select(
        "event_id",
        F.conv(F.hex(F.col("event_id")), 16, 10).cast("long").alias("parsed"),
    )


@query(
    "p8_zero_pad_format",
    """
    SELECT event_id, lpad(CAST(event_id AS VARCHAR), 9, '0') AS padded
    FROM events WHERE event_id < 100
    """,
)
def p8_zero_pad_format(spark: SparkSession, sf: str) -> DataFrame:
    """P8: 9-digit zero-padded height formatting (filenames.rs:120-122)."""
    ev = _t(spark, sf, "events")
    return ev.filter(F.col("event_id") < 100).select(
        "event_id", F.lpad(F.col("event_id").cast("string"), 9, "0").alias("padded")
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# §2.4 aggregations / interval algebra
# ---------------------------------------------------------------------------

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
    from .operators.intervals import islands

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
    from .operators.intervals import islands, subtract_intervals

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
    from .operators.intervals import gaps_direct_bounds_df

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


# ---------------------------------------------------------------------------
# §2.5 window / sequence operators
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / chunking
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# headline analytic queries (bench drivers; classic shapes over the archive)
# ---------------------------------------------------------------------------

@query(
    "h1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def h1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation; exercises map-side
    partial aggregation and decimal-exact sums."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "h3_shipping_priority",
    """
    SELECT o.o_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey ASC LIMIT 10
    """,
)
def h3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + grouped top-k with total tiebreak."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@query(
    "h5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def h5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: star join with small dims broadcast; region filter
    pushes through the dim chain."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "h4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def h4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated into a left-semi join with a
    non-equi residual (shipped after order date — the testdata lacks
    commit/receipt dates, so the residual adapts), then a tiny group-by."""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "h6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= CAST(0.05 AS DOUBLE)
      AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < 24
    """,
)
def h6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive filter + global agg —
    every predicate must reach the parquet scan (PushedFilters)."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# streaming-adjacent batch shapes (T-series have pytest coverage; this is the
# batch-expressible part)
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / text analysis / similarity) —
# first-class beyond-reference surface (BASELINE.json north star)
# ---------------------------------------------------------------------------

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


@query(
    "d1_exact_dedup",
    f"""
    SELECT md5({_NORM_SQL}) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS keep_id
    FROM documents GROUP BY 1
    """,
)
def d1_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup groups by normalized-content hash (shuffle on the hash,
    never on raw text)."""
    from .operators.dedup import exact_duplicates

    return exact_duplicates(_t(spark, sf, "documents"))


_MINHASH_AGGS_SQL = ",\n           ".join(
    f"min(md5(concat('h{i}:', shingle))) AS m{i}" for i in range(16)
)
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, md5(concat_ws('|', m{4*b}, m{4*b+1}, m{4*b+2}, m{4*b+3})) AS band_hash FROM sigs"
    for b in range(4)
)


@query(
    "d2_minhash_lsh_dedup",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), sigs AS (
      SELECT doc_id,
           {_MINHASH_AGGS_SQL}
      FROM sh GROUP BY doc_id
    ), banded AS ({_BANDS_SQL})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    """,
)
def d2_minhash_lsh_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → 16 md5-minhashes → 4 bands
    of 4 → bucket equi-join. Planted mutated copies (doc+100000, text+' zz')
    guarantee recall is visible: every planted pair must collide."""
    from .operators.dedup import lsh_candidate_pairs, minhash_signatures, shingles

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    sigs = minhash_signatures(shingles(corpus, n=3), num_hashes=16, token_col="shingle")
    return lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)


@query(
    "d3_ngram_jaccard",
    f"""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
    norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), shf AS (
      -- df cap (max_token_df=1000): drop shingles hot across >1000 docs —
      -- a no-op on this 100-doc corpus but part of the operator contract
      SELECT sh.doc_id, sh.shingle FROM sh
      JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000) f
        USING (shingle)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           sa.n AS n_a, sb.n AS n_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.02
    """,
)
def d3_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Word-3-gram Jaccard similarity over candidate pairs sharing a shingle
    (posting-list join; no cartesian)."""
    from .operators.dedup import jaccard_pairs, shingles

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    sh = shingles(docs, n=3)
    out = jaccard_pairs(sh, threshold=0.02, token_col="shingle")
    return out.withColumn("jaccard", F.round("jaccard", 6))


@query(
    "x1_token_count",
    """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
           n_chars
    FROM documents
    """,
)
def x1_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace token counting (the budget-accounting primitive)."""
    from .operators.textan import token_count

    return _t(spark, sf, "documents").select(
        "doc_id", token_count().alias("n_tokens"), "n_chars"
    )


_LANGS_SQL = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "for", "with", "on"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "pour", "une", "dans"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
}


def _lang_score_sql(lang: str) -> str:
    words = _LANGS_SQL[lang]
    hits = " + ".join(
        f"CAST(list_contains(toks, '{w}') AS INT)" for w in words
    )
    return f"({hits}) AS score_{lang}"


@query(
    "x2_language_id",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), scores AS (
      SELECT doc_id,
             {_lang_score_sql('de')},
             {_lang_score_sql('en')},
             {_lang_score_sql('es')},
             {_lang_score_sql('fr')}
      FROM norm
    )
    SELECT doc_id, score_de, score_en, score_es, score_fr,
           CASE
             WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
             WHEN score_en > score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
             WHEN score_es > score_de AND score_es > score_en AND score_es >= score_fr THEN 'es'
             ELSE 'fr'
           END AS predicted_lang
    FROM scores
    """,
)
def x2_language_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-hit language ID with deterministic argmax tiebreak."""
    from .operators.textan import language_scores

    out = language_scores(_t(spark, sf, "documents"))
    return out.select(
        "doc_id", "score_de", "score_en", "score_es", "score_fr", "predicted_lang"
    )


@query(
    "x3_quality_features",
    f"""
    WITH base AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
             string_split({_NORM_SQL}, ' ') AS toks,
             length(regexp_replace({_NORM_SQL}, ' ', '', 'g')) AS n_nonspace
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens, n_punct, n_digits,
           ({" + ".join(f"CAST(list_contains(toks, '{w}') AS INT)" for w in _LANGS_SQL['en'])}) AS n_stopwords,
           round(CASE WHEN n_tokens > 0 THEN CAST(n_nonspace AS DOUBLE) / n_tokens ELSE 0.0 END, 4) AS avg_token_len,
           round(CASE WHEN n_tokens > 0 THEN CAST(({" + ".join(f"CAST(list_contains(toks, '{w}') AS INT)" for w in _LANGS_SQL['en'])}) AS DOUBLE) / n_tokens ELSE 0.0 END, 4) AS stopword_ratio,
           round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 4) AS punct_ratio
    FROM base
    """,
)
def x3_quality_features(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic quality features (length/punct/stopword/token stats)."""
    from .operators.textan import quality_features

    return quality_features(_t(spark, sf, "documents"))


@query(
    "x7_quality_filter",
    f"""
    WITH base AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
             string_split({_NORM_SQL}, ' ') AS toks
      FROM documents
    ), rated AS (
      SELECT doc_id, n_tokens,
             round(CASE WHEN n_tokens > 0 THEN CAST(({" + ".join(f"CAST(list_contains(toks, '{w}') AS INT)" for w in _LANGS_SQL['en'])}) AS DOUBLE) / n_tokens ELSE 0.0 END, 4) AS stopword_ratio,
             round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 4) AS punct_ratio
      FROM base
    ), tagged AS (
      SELECT d.source,
             CASE WHEN r.n_tokens < 10 THEN 'too_short'
                  WHEN r.n_tokens > 5000 THEN 'too_long'
                  WHEN r.stopword_ratio < 0.05 THEN 'low_stopword'
                  WHEN r.punct_ratio > 0.2 THEN 'high_punct'
                  ELSE 'kept' END AS reason
      FROM rated r JOIN documents d USING (doc_id)
    )
    SELECT source, reason, count(*) AS n_docs FROM tagged GROUP BY 1, 2
    """,
)
def x7_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality FILTER — the decision layer over x3's features:
    token-count bounds, stopword floor, punctuation ceiling, with the first
    failing rule as the reject reason (kept otherwise), rolled up per
    source. This is the shape of a production corpus-filtering pass: every
    document gets exactly one disposition, and the per-source reason
    breakdown is the monitoring surface."""
    from .operators.textan import quality_features

    docs = _t(spark, sf, "documents")
    q = quality_features(docs).join(docs.select("doc_id", "source"), "doc_id")
    reason = (
        F.when(F.col("n_tokens") < 10, "too_short")
        .when(F.col("n_tokens") > 5000, "too_long")
        .when(F.col("stopword_ratio") < 0.05, "low_stopword")
        .when(F.col("punct_ratio") > 0.2, "high_punct")
        .otherwise("kept")
    )
    return (
        q.select("source", reason.alias("reason"))
        .groupBy("source", "reason")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "x8_pii_scrub",
    r"""
    WITH corpus AS (
      SELECT doc_id, source,
             CASE WHEN doc_id < 15
               THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                           '@example.com or 10.0.0.', CAST(doc_id AS VARCHAR))
               ELSE text END AS text
      FROM documents
    ), scanned AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text,
                 '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS n_ips,
             md5(regexp_replace(regexp_replace(text,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g')) AS fp
      FROM corpus
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_emails) AS BIGINT) AS total_emails,
           CAST(sum(n_ips) AS BIGINT) AS total_ips,
           CAST(sum(CASE WHEN n_emails + n_ips > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           count(DISTINCT fp) AS distinct_redacted
    FROM scanned GROUP BY 1
    """,
)
def x8_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII detection + redaction — the data-governance pass of a training
    pipeline: count email/IP patterns per document, redact them to stable
    tokens, and fingerprint the REDACTED text (so dedup keys can't differ
    only by contact details). Planted PII (doc_id < 15) guarantees the
    detectors demonstrably fire. Pure Catalyst regex — no UDF; one
    projection + one agg shuffle."""
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    ip_re = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
    docs = _t(spark, sf, "documents")
    text = F.when(
        F.col("doc_id") < 15,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0.0."),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(text, email_re, "<EMAIL>"), ip_re, "<IP>"
    )
    scanned = docs.select(
        "source",
        F.size(F.regexp_extract_all(text, F.lit(email_re), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(ip_re), F.lit(0))).alias("n_ips"),
        F.md5(redacted).alias("fp"),
    )
    return scanned.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_ips").alias("total_ips"),
        F.sum(
            F.when(F.col("n_emails") + F.col("n_ips") > 0, 1).otherwise(0)
        ).alias("docs_with_pii"),
        F.countDistinct("fp").alias("distinct_redacted"),
    )


@query(
    "x4_doc_fingerprint",
    f"""
    SELECT doc_id,
           md5({_NORM_SQL}) AS fingerprint,
           substr(md5({_NORM_SQL}), 1, 4) AS fp_bucket
    FROM documents
    """,
)
def x4_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Engine-portable content fingerprint + coarse bucket."""
    from .operators.textan import fingerprint

    return fingerprint(_t(spark, sf, "documents"))


@query(
    "v1_cosine_topk",
    """
    WITH flat AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 5
      GROUP BY 1, 2
    ), sims AS (
      SELECT query_id, neighbor_id,
             round(dot / (na.nrm * nb.nrm), 6) AS sim
      FROM dots JOIN norms na ON na.vec_id = query_id
                JOIN norms nb ON nb.vec_id = neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3
    """,
)
def v1_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-k for a small query set (broadcast queries,
    single corpus scan, windowed top-k)."""
    from .operators.similarity import cosine_topk

    emb = _t(spark, sf, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, dim=64)


@query(
    "s4_filename_codec",
    """
    WITH built AS (
      SELECT event_id,
             concat(
               lpad(CAST(CAST(floor(event_id / 1000000) AS BIGINT) * 1000000 AS VARCHAR), 9, '0'), '/',
               lpad(CAST(CAST(floor(event_id / 1000) AS BIGINT) * 1000 AS VARCHAR), 9, '0'), '/',
               lpad(CAST(event_id AS VARCHAR), 9, '0'), '.block.avro'
             ) AS path
      FROM events WHERE event_id < 2000
    )
    SELECT event_id, path,
           CAST(regexp_extract(path, '(\\d{9})\\.block\\.avro$', 1) AS BIGINT) AS parsed_height
    FROM built
    """,
)
def s4_filename_codec(spark: SparkSession, sf: str) -> DataFrame:
    """S4/P8: archive path build + regex parse round-trip as pure SQL."""
    ev = _t(spark, sf, "events").filter(F.col("event_id") < 2000)
    l1 = F.lpad((F.floor(F.col("event_id") / 1000000) * 1000000).cast("long").cast("string"), 9, "0")
    l2 = F.lpad((F.floor(F.col("event_id") / 1000) * 1000).cast("long").cast("string"), 9, "0")
    name = F.lpad(F.col("event_id").cast("string"), 9, "0")
    path = F.concat(l1, F.lit("/"), l2, F.lit("/"), name, F.lit(".block.avro"))
    return ev.select(
        "event_id",
        path.alias("path"),
        F.regexp_extract(path, r"(\d{9})\.block\.avro$", 1).cast("long").alias("parsed_height"),
    )


# ---------------------------------------------------------------------------
# LSH / Pandas-UDF-stage queries with full oracles: the hyperplane hash is a
# deterministic integer mix (operators/similarity.py:_hyperplane), so the
# entire ANN pipeline — planes, sign buckets, candidate join, in-bucket
# cosine — is re-derivable in ANSI SQL; the multimodal feature stage reduces
# to sha256/octet_length over the payload bytes
# ---------------------------------------------------------------------------

@query(
    "v2_ann_lsh_topk",
    f"""
    WITH {_lsh_cte(6, 8, "embeddings")}, pairs AS (
      SELECT va AS query_id, vb AS neighbor_id FROM cands
      UNION ALL
      SELECT vb AS query_id, va AS neighbor_id FROM cands
    ), sims AS (
      SELECT p.query_id, p.neighbor_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM pairs p
      JOIN flat fa ON fa.vec_id = p.query_id
      JOIN flat fb ON fb.vec_id = p.neighbor_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = p.query_id
      JOIN norms nb ON nb.vec_id = p.neighbor_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 1
    """,
)
def v2_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets — the 100 TB scale
    path where brute force is impossible. Exact cosine only within buckets.
    The hyperplanes are a deterministic integer hash, so the oracle replays
    the identical pipeline in SQL."""
    from .operators.similarity import ann_topk

    emb = _t(spark, sf, "embeddings")
    return ann_topk(emb, dim=64, k=1, n_tables=6, n_bits=8)


@query(
    "v3_ivf_topk",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), celldots AS (
      SELECT v.vec_id, s.vec_id AS cell_id,
             round(sum(v.x * s.x) / (any_value(nv.nrm) * any_value(ns.nrm)), 6)
               AS sim
      FROM flat v JOIN flat s ON s.i = v.i AND s.vec_id < 16
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN norms ns ON ns.vec_id = s.vec_id
      GROUP BY v.vec_id, s.vec_id
    ), assign AS (
      SELECT vec_id, cell_id FROM celldots
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), probes AS (
      SELECT vec_id AS query_id, cell_id FROM celldots WHERE vec_id < 5
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) <= 2
    ), cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a USING (cell_id)
      WHERE a.vec_id <> p.query_id
    ), sims AS (
      SELECT c.query_id, c.neighbor_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM cand c
      JOIN flat fa ON fa.vec_id = c.query_id
      JOIN flat fb ON fb.vec_id = c.neighbor_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = c.query_id
      JOIN norms nb ON nb.vec_id = c.neighbor_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3
    """,
)
def v3_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-flat approximate top-k (the second ANN scale path beside LSH):
    sampled coarse quantizer (first 16 vectors), nprobe=2 probed cells,
    exact cosine only within probed cells — scan cost N·nprobe/n_cells.
    Deterministic end to end, so the oracle replays it exactly."""
    from .operators.similarity import ivf_topk

    emb = _t(spark, sf, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, n_cells=16, nprobe=2, dim=64)


@query(
    "v4_ivf_trained",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), c0 AS (
      SELECT vec_id AS cell_id, i, x FROM flat WHERE vec_id < 8
    ), c0n AS (
      SELECT cell_id, sqrt(sum(x * x)) AS cn FROM c0 GROUP BY 1
    ), dots1 AS (
      SELECT v.vec_id, c.cell_id,
             round(sum(v.x * c.x) / (any_value(nv.nrm) * any_value(cn.cn)), 6)
               AS sim
      FROM flat v JOIN c0 c ON c.i = v.i
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN c0n cn ON cn.cell_id = c.cell_id
      GROUP BY 1, 2
    ), a1 AS (
      SELECT vec_id, cell_id FROM dots1
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), c1 AS (
      SELECT a.cell_id, f.i, round(avg(f.x), 6) AS x
      FROM a1 a JOIN flat f USING (vec_id) GROUP BY 1, 2
    ), c1n AS (
      SELECT cell_id, sqrt(sum(x * x)) AS cn FROM c1 GROUP BY 1
    ), dots2 AS (
      SELECT v.vec_id, c.cell_id,
             round(sum(v.x * c.x) / (any_value(nv.nrm) * any_value(cn.cn)), 6)
               AS sim
      FROM flat v JOIN c1 c ON c.i = v.i
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN c1n cn ON cn.cell_id = c.cell_id
      GROUP BY 1, 2
    ), a2 AS (
      SELECT vec_id, cell_id FROM dots2
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), c2 AS (
      SELECT a.cell_id, f.i, round(avg(f.x), 6) AS x
      FROM a2 a JOIN flat f USING (vec_id) GROUP BY 1, 2
    ), members AS (
      SELECT cell_id, count(*) AS n_members FROM a2 GROUP BY 1
    )
    SELECT m.cell_id, m.n_members,
           round(sqrt(sum(c2.x * c2.x)), 4) AS centroid_norm
    FROM members m JOIN c2 ON c2.cell_id = m.cell_id
    GROUP BY m.cell_id, m.n_members
    """,
)
def v4_ivf_trained(spark: SparkSession, sf: str) -> DataFrame:
    """TRAINED IVF coarse quantizer: two Lloyd iterations from a
    deterministic init, verified end-to-end — the oracle unrolls both
    iterations (assign → mean-update → reassign) in SQL and must land on
    identical final assignments and centroid norms. An iterative
    distributed ML algorithm under a hash-level correctness gate."""
    from .operators.similarity import ivf_train

    emb = _t(spark, sf, "embeddings")
    assign, cents = ivf_train(emb, n_cells=8, iters=2)
    counts = assign.groupBy("cell_id").agg(F.count("*").alias("n_members"))
    sq = F.aggregate(
        F.transform("cvec", lambda x: x * x), F.lit(0.0), lambda a, b: a + b
    )
    norm = cents.select("cell_id", F.round(F.sqrt(sq), 4).alias("centroid_norm"))
    return counts.join(norm, "cell_id")


@query(
    "v5_quantize_embeddings",
    """
    WITH scaled AS (
      SELECT vec_id,
             round(list_max(list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE)))) / 127.0, 6) AS scale
      FROM embeddings
    ), quant AS (
      SELECT e.vec_id, s.scale,
             list_transform(e.embedding,
               x -> CASE WHEN s.scale = 0 THEN 0
                    ELSE CAST(round(CAST(x AS DOUBLE) / s.scale) AS INT) END) AS q
      FROM embeddings e JOIN scaled s USING (vec_id)
    )
    SELECT vec_id, scale,
           CAST(list_sum(q) AS BIGINT) AS q_sum,
           CAST(list_min(q) AS INT) AS q_min,
           CAST(list_max(q) AS INT) AS q_max
    FROM quant
    """,
)
def v5_quantize_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (per-vector
    scale = max|x|/127) — the storage/transfer path every large ANN corpus
    takes (4× smaller than float32, dot products stay SIMD-friendly).
    Entirely map-side array math (transform/aggregate HOFs, no UDF, no
    shuffle); digest columns (sum/min/max of the quantized array) pin the
    full quantized content under the value-hash gate."""
    emb = _t(spark, sf, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scale = F.round(mx / 127.0, 6)
    q = emb.select(
        "vec_id",
        scale.alias("scale"),
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") / scale).cast("int")
        ).alias("q"),
    )
    qsum = F.aggregate("q", F.lit(0).cast("bigint"), lambda a, b: a + b)
    return q.select(
        "vec_id",
        "scale",
        qsum.alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


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
    from .operators.multimodal import MEDIA_SCHEMA, extract_features
    from .session import ship_package

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
    "d4_embedding_neardup",
    f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 10
    ), {_lsh_cte(8, 8, "corpus")}, sims AS (
      SELECT c.va AS vec_a, c.vb AS vec_b,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM cands c
      JOIN flat fa ON fa.vec_id = c.va
      JOIN flat fb ON fb.vec_id = c.vb AND fb.i = fa.i
      JOIN norms na ON na.vec_id = c.va
      JOIN norms nb ON nb.vec_id = c.vb
      WHERE c.va < 10 OR c.vb >= 100000
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b, sim FROM sims WHERE sim >= 0.95
    """,
)
def d4_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup detection: pairs above a similarity
    threshold. Planted exact copies (vec_id+100000) must all surface with
    sim 1.0 — identical vectors share every LSH bucket, so bucketing never
    loses them.

    Scale path: candidates come from the hyperplane-LSH equi-join
    (operators/similarity.py) — NOT an all-pairs non-equi join, which
    Catalyst would execute as an O(N²) BroadcastNestedLoopJoin. Exact cosine
    runs only inside buckets; the oracle replays the identical bucketing."""
    from .operators.similarity import cosine, hyperplane_signatures

    emb = _t(spark, sf, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    # signatures materialize once (localCheckpoint): the special side is a
    # filter of the same subtree, so both join inputs read the checkpointed
    # rows instead of recomputing the 64-dot×64-plane projection twice
    sigs = hyperplane_signatures(corpus, dim=64, n_tables=8, n_bits=8).transform(reliable_checkpoint)
    # every qualifying pair has ≥1 endpoint in the tiny special set
    # ({id<10} ∪ {id≥100000}), so join special-side signatures (broadcast)
    # against the corpus instead of distinct-ing the full all-pairs candidate
    # set first — same pair set as the oracle's cands+WHERE, ~N× less work
    special = sigs.filter((F.col("vec_id") < 10) | (F.col("vec_id") >= 100000))
    cands = (
        special.alias("a")
        .join(
            sigs.alias("b"),
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.least("a.vec_id", "b.vec_id").alias("vec_a"),
            F.greatest("a.vec_id", "b.vec_id").alias("vec_b"),
        )
        .distinct()
        .filter((F.col("vec_a") < 10) | (F.col("vec_b") >= 100000))
    )
    va = corpus.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_vec"))
    vb = corpus.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b_vec"))
    sim = F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6)
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= 0.95)
    )


_CC_CTES = """corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), norm AS (
      SELECT doc_id, string_split({norm}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), sigs AS (
      SELECT doc_id,
           {minhash}
      FROM sh GROUP BY doc_id
    ), banded AS ({bands}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), sym AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
    ), cc AS (
      SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node
    )""".format(norm=_NORM_SQL, minhash=_MINHASH_AGGS_SQL, bands=_BANDS_SQL)


def _cc_corpus_and_clusters(spark: SparkSession, sf: str):
    """Shared build for d5/d6: planted-duplicate corpus → MinHash LSH pairs
    → connected components."""
    from .operators.dedup import (
        connected_components_star,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    sigs = minhash_signatures(shingles(corpus, n=3), num_hashes=16, token_col="shingle")
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    clusters, _ = connected_components_star(pairs, nodes=corpus.select("doc_id"))
    return corpus, clusters


@query(
    "d5_neardup_clusters",
    "WITH RECURSIVE "
    + _CC_CTES
    + "\n    SELECT doc_id, cluster FROM cc",
)
def d5_neardup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup CLUSTERS: candidate pairs chain (A~B, B~C ⇒ one duplicate
    group), so keep-one dedup operates on connected components, not pairs.
    Spark side: alternating large-star/small-star contraction (two grouped
    shuffles per round, localCheckpoint lineage truncation, O(log n) rounds
    on ANY graph shape — chain-shaped duplicate graphs included). Oracle:
    DuckDB recursive-CTE reachability closure — an iterative Spark
    algorithm hash-checked against a fixpoint the SQL engine computes
    independently."""
    _, clusters = _cc_corpus_and_clusters(spark, sf)
    return clusters


@query(
    "d6_dedup_representatives",
    "WITH RECURSIVE "
    + _CC_CTES
    + """,
    ranked AS (
      SELECT c.cluster, c.doc_id,
             row_number() OVER (
               PARTITION BY c.cluster
               ORDER BY length(co.text) DESC, c.doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY c.cluster) AS n_docs
      FROM cc c JOIN corpus co USING (doc_id)
    )
    SELECT cluster, doc_id AS rep_doc_id, n_docs FROM ranked WHERE rn = 1""",
)
def d6_dedup_representatives(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-one selection per duplicate cluster: longest document wins,
    doc_id breaks ties — the final step that turns near-dup detection into
    an actual deduplicated corpus."""
    from .operators.dedup import cluster_representatives

    corpus, clusters = _cc_corpus_and_clusters(spark, sf)
    return cluster_representatives(clusters, corpus)


@query(
    "d8_chain_components",
    """
    WITH RECURSIVE nodes AS (
      SELECT doc_id FROM documents WHERE doc_id < 60
    ), edges AS (
      -- path segments of 10: i ~ i+1 unless i ends a segment
      SELECT doc_id AS a, doc_id + 1 AS b FROM nodes
      WHERE doc_id < 59 AND doc_id % 10 <> 9
    ), sym AS (
      SELECT a, b FROM edges UNION SELECT b, a FROM edges
    ), reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node
    """,
)
def d8_chain_components(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components on a CHAIN-shaped graph — the adversarial case
    for min-label propagation (O(diameter) rounds): six 10-node path
    segments over the documents ids. Spark runs large-star/small-star
    contraction (O(log n) rounds on any shape, two grouped shuffles per
    round); the oracle computes the same fixpoint via recursive-CTE
    reachability — entirely different algorithm, same answer."""
    from .operators.dedup import connected_components_star

    nodes = _t(spark, sf, "documents").filter(F.col("doc_id") < 60).select("doc_id")
    pairs = nodes.filter(
        (F.col("doc_id") < 59) & (F.col("doc_id") % 10 != 9)
    ).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
    )
    clusters, _rounds = connected_components_star(pairs, nodes=nodes)
    return clusters


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
    "p9_posexplode_index",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token
    FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
    WHERE i <= len(toks) AND length(toks[i]) > 0
    """,
)
def p9_posexplode_index(spark: SparkSession, sf: str) -> DataFrame:
    """Enumerate-with-index (posexplode — the reference's tx-index assignment
    shape, table.rs:41/108)."""
    from .operators.dedup import normalized_text

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 20)
    toks = F.split(normalized_text("text"), " ")
    return docs.select("doc_id", F.posexplode(toks).alias("pos", "token")).filter(
        F.length("token") > 0
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
    "x5_bpe_token_count",
    """
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS n_pieces
    FROM documents
    """,
)
def x5_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-flavored token estimate (letter runs + digits + punctuation) —
    the cheap deterministic proxy for tokenizer cost in data budgeting."""
    from .operators.textan import bpe_ish_token_count

    return _t(spark, sf, "documents").select(
        "doc_id", bpe_ish_token_count().alias("n_pieces")
    )


@query(
    "x6_train_split",
    """
    WITH tagged AS (
      SELECT source, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT source, split, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM tagged GROUP BY 1, 2
    """,
)
def x6_train_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (~80/10/10) with
    per-(source, split) counts — the reproducible data-splitting step of a
    training pipeline. md5-prefix banding is engine-portable, stable under
    reshuffles/re-runs, and needs no RNG state; lexicographic comparison on
    fixed-width lowercase hex equals numeric comparison, so both engines
    band identically. Map-side projection + one agg shuffle; no sampling
    pass over the data."""
    docs = _t(spark, sf, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    )
    return (
        docs.select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@query(
    "h10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
             AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def h10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer — a 4-table star
    join (two broadcast dims) feeding a grouped decimal-exact sum and a
    deterministic top-20 (TakeOrderedAndProject, no global sort)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf, "nation")
    rev = F.sum(
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("double")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "h14_promo_revenue",
    """
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS yr,
           round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             4) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
    """,
)
def h14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share per year — broadcast dim
    join + case-guarded decimal sums, division done once in double at the
    end (exact numerators/denominators, one rounding point)."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    disc = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast(DEC))
    ).cast("double")
    total = F.sum(disc).cast("double")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.year("l_shipdate").cast("bigint").alias("yr"))
        .agg(F.round(F.lit(100.0) * promo / total, 4).alias("promo_pct"))
    )


@query(
    "h22_idle_rich_customers",
    """
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_custkey % 7 AS code, count(*) AS n_cust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY 1
    """,
)
def h22_idle_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: above-global-average balance AND no recent orders — a
    scalar aggregate subquery plus NOT EXISTS, written as SQL so Catalyst
    plans the anti join and the 1-row broadcast bound itself (the same
    decorrelation machinery h2 exercises for correlated scalars)."""
    _t(spark, sf, "customer").createOrReplaceTempView("_h22_customer")
    _t(spark, sf, "orders").createOrReplaceTempView("_h22_orders")
    return spark.sql("""
        WITH avg_bal AS (
          SELECT avg(c_acctbal) AS a FROM _h22_customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_custkey % 7 AS code, count(*) AS n_cust,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM _h22_customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.a
          AND NOT EXISTS (SELECT 1 FROM _h22_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c.c_custkey % 7
    """)


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
    from .operators.asof import asof_join

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
    "h2_cheapest_supplier",
    """
    SELECT p.p_partkey, p.p_brand, l.l_suppkey,
           l.l_extendedprice AS min_price
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size = 15
      AND l.l_extendedprice = (
        SELECT min(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def h2_cheapest_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery (cheapest source per
    part). Expressed as SQL so Catalyst's subquery DECORRELATION turns the
    per-part probe into one aggregate + join — the plan a hand-written
    groupBy+join would build, derived automatically. Ties (several
    suppliers at the min price) all qualify, keeping the result a
    deterministic set."""
    _t(spark, sf, "part").createOrReplaceTempView("_h2_part")
    _t(spark, sf, "lineitem").createOrReplaceTempView("_h2_lineitem")
    return spark.sql("""
        SELECT p.p_partkey, p.p_brand, l.l_suppkey,
               l.l_extendedprice AS min_price
        FROM _h2_part p JOIN _h2_lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_size = 15
          AND l.l_extendedprice = (
            SELECT min(l2.l_extendedprice) FROM _h2_lineitem l2
            WHERE l2.l_partkey = p.p_partkey
          )
    """)


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


# ---------------------------------------------------------------------------
# TPC-H plan shapes, continued (round 4): each exercises a distinct physical
# pattern — two-dim star joins, outer-join distributions, correlated
# aggregates, group-having semi joins, disjunctive pushdown, self-join
# exists/not-exists. All money math is decimal-exact, doubles only at the end.
# ---------------------------------------------------------------------------


@query(
    "h7_nation_volume",
    """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS yr,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
             AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE (ns.n_nationkey = 1 AND nc.n_nationkey = 2)
       OR (ns.n_nationkey = 2 AND nc.n_nationkey = 1)
    GROUP BY 1, 2, 3
    """,
)
def h7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair per year — the
    two-sided dimension pattern (nation joined once through supplier, once
    through customer). The nation-pair predicate is pushed below the big
    lineitem⋈orders shuffle join: supplier and customer are pre-filtered to
    the two nations BEFORE joining, so the fact-side shuffles carry only
    qualifying rows; all four dims broadcast."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation")
    s = (
        _t(spark, sf, "supplier")
        .filter(F.col("s_nationkey").isin(1, 2))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_nationkey").alias("s_nat"), F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf, "customer")
        .filter(F.col("c_nationkey").isin(1, 2))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_nationkey").alias("c_nat"), F.col("n_name").alias("cust_nation"))
    )
    vol = F.sum(
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("double")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .filter(
            ((F.col("s_nat") == 1) & (F.col("c_nat") == 2))
            | ((F.col("s_nat") == 2) & (F.col("c_nat") == 1))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("yr")
        )
        .agg(vol.alias("volume"))
    )


@query(
    "h9_product_profit",
    """
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
             AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def h9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation × year.
    The selective LIKE filter on part runs before its broadcast, shrinking
    the fact stream at the scan (at 100 TB the p_partkey IN-set semi-joins
    the lineitem scan via DPP); lineitem⋈orders is the only shuffle join."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_name").like("%gear%")).select("p_partkey")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    profit = F.sum(
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("double")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(profit.alias("profit"))
    )


@query(
    "h12_line_priority",
    """
    SELECT l.l_linestatus AS linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def h12_line_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: order-priority class counts per line status in a
    ship-date year — conditional counts over one shuffle join, with the date
    range pushed to the lineitem parquet scan (PushedFilters on l_shipdate
    prunes row groups before the join)."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "h13_customer_distribution",
    """
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY 1
    """,
)
def h13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer — an outer
    join that must KEEP zero-order customers (count(o)=0 rows survive), then
    a second aggregation over the first's output. The second groupBy re-uses
    the first shuffle's output partitioning at metadata scale (distinct
    c_count values ≈ dozens), so the heavy shuffle happens exactly once."""
    c = _t(spark, sf, "customer").select("c_custkey")
    o = _t(spark, sf, "orders").filter(F.col("o_orderpriority") != "5-LOW").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "h17_small_quantity_revenue",
    """
    SELECT CAST(round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 4) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, avg(l_quantity) AS aq
          FROM lineitem GROUP BY 1) pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.5 * pa.aq
    """,
)
def h17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — a correlated per-part
    average, planned by hand as ONE aggregate over lineitem plus a broadcast
    join back (Catalyst's decorrelation output, written explicitly). The
    per-part averages are exact (integral quantities sum exactly in double),
    so both engines agree bit-for-bit before the final divide."""
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    per_part = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.avg("l_quantity").alias("aq")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(per_part, li["l_partkey"] == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 4
            ).cast("double").alias("avg_yearly")
        )
    )


@query(
    "h18_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(big.total_qty AS DOUBLE) AS total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def h18_large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders — a group-HAVING
    that acts as a semi-join (the qualifying key set is tiny, ~1% of orders,
    so Spark broadcasts it into the orders probe), then a deterministic
    top-10 via TakeOrderedAndProject, never a global sort."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "h19_disjunctive_revenue",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
           AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def h19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. The derivable
    single-side implications are factored out and PUSHED below the join —
    part keeps only the three brands, lineitem only quantity 1–30 — so the
    scans prune before the broadcast join; the residual disjunction runs as
    a post-join filter (exactly how Catalyst's constraint propagation wants
    it, made explicit)."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity").between(1, 30))
    p = _t(spark, sf, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    rev = F.sum(
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("double")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(rev.alias("revenue"))
    )


@query(
    "h21_sole_blamed_supplier",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY 1
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 20
    """,
)
def h21_sole_blamed_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier solely at fault on multi-supplier
    orders — EXISTS plus NOT EXISTS self-joins on the fact table. Written
    as SQL so Catalyst plans both as semi/anti joins sharing the lineitem
    scan (the self-join correlates on l_orderkey, so all three legs hash on
    the same key — one shuffle partitioning reused three times)."""
    _t(spark, sf, "supplier").createOrReplaceTempView("_h21_supplier")
    _t(spark, sf, "lineitem").createOrReplaceTempView("_h21_lineitem")
    _t(spark, sf, "orders").createOrReplaceTempView("_h21_orders")
    return spark.sql("""
        SELECT s.s_name, count(*) AS numwait
        FROM _h21_supplier s
        JOIN _h21_lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN _h21_orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM _h21_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM _h21_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name ASC
        LIMIT 20
    """)


@query(
    "x9_decontamination",
    f"""
    WITH bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 29 = 0
    ), corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 29 <> 0
    ), bnorm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM bench
    ), cnorm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), bsh AS (
      SELECT DISTINCT
             concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]) AS shingle
      FROM bnorm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 4, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])) > 0
    ), csh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]) AS shingle
      FROM cnorm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 4, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])) > 0
    ), sizes AS (
      SELECT doc_id, count(*) AS n_ngrams FROM csh GROUP BY 1
    ), hits AS (
      SELECT c.doc_id, count(*) AS n_hit
      FROM csh c WHERE c.shingle IN (SELECT shingle FROM bsh)
      GROUP BY 1
    )
    SELECT h.doc_id, h.n_hit, s.n_ngrams,
           round(CAST(h.n_hit AS DOUBLE) / s.n_ngrams, 6) AS contamination
    FROM hits h JOIN sizes s USING (doc_id)
    WHERE CAST(h.n_hit AS DOUBLE) / s.n_ngrams >= 0.05
    """,
)
def x9_decontamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing word 5-grams with a
    held-out benchmark set (docs with doc_id % 29 == 0 stand in for the eval
    suite). The benchmark n-gram set broadcasts into a left-semi probe of
    the single corpus n-gram stream — exact-dup docs of a benchmark doc
    surface at contamination 1.0, partial leaks above the 5% floor."""
    from .operators.dedup import benchmark_contamination

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 29 == 0)
    corpus = docs.filter(F.col("doc_id") % 29 != 0)
    return benchmark_contamination(corpus, bench, n=5, threshold=0.05)


@query(
    "x10_repetition",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), g AS (
      SELECT doc_id, concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    )
    SELECT doc_id, count(*) AS n_ngrams, count(DISTINCT g) AS n_distinct,
           round(CAST(count(*) - count(DISTINCT g) AS DOUBLE) / count(*), 6)
             AS dup_ngram_ratio
    FROM g GROUP BY 1
    """,
)
def x10_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Within-doc repeated-3-gram fraction (Gopher-style boilerplate
    signal). The Spark side is pure map-side array math — no explode, no
    shuffle — while the oracle replays it the expensive way (unnest +
    group), which is exactly why the plans differ but the numbers must
    not.

    The zero-gram exclusion is applied as ``length(trim(text)) > 0`` on the
    RAW column (equivalent: a doc has ≥1 n-gram iff its trimmed text is
    non-empty) — filtering on the computed ``n_ngrams`` would get predicate-
    pushed below the projection and re-evaluate the interpreted gram build
    per row (measured 3.5 s vs 0.2 s at sf0.1)."""
    from .operators.textan import repetition_features

    docs = _t(spark, sf, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    return repetition_features(docs, n=3)


@query(
    "x11_tfidf_top_terms",
    f"""
    WITH p AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS token
      FROM documents
    ), p2 AS (
      SELECT doc_id, token FROM p WHERE token <> ''
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM p2 GROUP BY 1, 2
    ), df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM p2 GROUP BY 1
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (token), n
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
      FROM scored
    )
    SELECT doc_id, rank, token, tf, df, score FROM ranked WHERE rank <= 3
    """,
)
def x11_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 characteristic terms per doc by tf × (N/df) — linear-idf
    tf-idf, chosen so every score is exact IEEE arithmetic (integer
    product, one division; no transcendentals to drift between engines).
    Corpus size N folds in as a 1-row broadcast, never a collect."""
    from .operators.textan import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf, "documents"), k=3)


@query(
    "x12_stratified_sample",
    """
    WITH ranked AS (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source, lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY source, lang) AS n
      FROM documents
    )
    SELECT doc_id, source, lang, rn AS sample_rank
    FROM ranked WHERE rn <= (n * 1 + 5 - 1) // 5
    """,
)
def x12_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 20% stratified sample per (source, lang): md5-ranked
    rows with an exact integer quota — layout- and seed-independent, so the
    same rows are picked on any cluster at any partitioning (unlike
    ``df.sample``). One shuffle on the stratum key."""
    from .operators.sampling import stratified_sample

    docs = _t(spark, sf, "documents").select("doc_id", "source", "lang")
    return stratified_sample(docs, ["source", "lang"], num=1, den=5)


@query(
    "x13_mixture_plan",
    """
    WITH tok AS (
      SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok
      FROM documents
    ), per_src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(round(sqrt(sum(n_tok)), 6) AS DECIMAL(18,6)) AS w
      FROM tok GROUP BY 1
    ), tot AS (SELECT sum(w) AS w_total FROM per_src)
    SELECT source, n_docs, n_tokens,
           round(CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE), 6) AS weight,
           round(1000000.0 * (CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE))
                 / n_tokens, 6) AS epochs
    FROM per_src, tot
    """,
)
def x13_mixture_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-weighted data-mixture plan: per-source sampling epochs
    for a 1M-token budget with weight ∝ sqrt(tokens) (t=2 temperature —
    flattens the source skew a proportional mix would have). Exact integer
    token sums + correctly-rounded sqrt + decimal-exact total keep the plan
    bit-identical across engines; the grand total folds in as a 1-row
    broadcast."""
    from .operators.sampling import mixture_plan
    from .operators.textan import token_count

    docs = _t(spark, sf, "documents")
    return mixture_plan(docs, token_count(), budget_tokens=1_000_000)


@query(
    "h8_market_share",
    """
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           round(CAST(sum(CASE WHEN s.s_nationkey = 1
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE r.r_regionkey = 0
    GROUP BY 1
    """,
)
def h8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a customer region's
    import volume per year — numerator and denominator come from the SAME
    aggregation pass (case-guarded decimal sums), so the fact stream is
    scanned and joined exactly once; region/nation/customer/supplier all
    broadcast."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    nc = _t(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf, "region").filter(F.col("r_regionkey") == 0).select("r_regionkey")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    disc = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )
    num = F.sum(
        F.when(F.col("s_nationkey") == 1, disc).otherwise(F.lit(0).cast(DEC))
    ).cast("double")
    den = F.sum(disc).cast("double")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(nc), c["c_nationkey"] == nc["n_nationkey"])
        .join(F.broadcast(r), nc["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(F.round(num / den, 6).alias("mkt_share"))
    )


@query(
    "h11_important_parts",
    """
    WITH val AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
      FROM lineitem GROUP BY 1
    ), tot AS (SELECT sum(v) AS t FROM val)
    SELECT l_partkey AS partkey, CAST(v AS DOUBLE) AS part_value
    FROM val, tot
    WHERE CAST(v AS DOUBLE) > 0.0005 * CAST(t AS DOUBLE)
    """,
)
def h11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding more than a FRACTION OF THE GLOBAL
    total — a HAVING bound that depends on a scalar over the whole
    aggregate. The global total re-aggregates the per-part sums (metadata
    scale) and folds back as a 1-row broadcast; the fact table is scanned
    once and shuffles once."""
    li = _t(spark, sf, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("v")
    )
    tot = val.agg(F.sum("v").alias("t"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("v").cast("double") > 0.0005 * F.col("t").cast("double"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
    )


@query(
    "h15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def h15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the quarter's maximum
    revenue — equality against a scalar max over an aggregated view (ties
    all qualify, keeping the result a deterministic set). The max is a
    1-row broadcast over the revenue aggregate, which itself builds from
    one pushed-down scan of the quarter."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast(DEC)
            * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
        )
    )


@query(
    "h16_supplier_relation",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0
      )
    GROUP BY 1, 2, 3
    """,
)
def h16_supplier_relation(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute triple,
    excluding a denylist via NOT IN (planned as a broadcast null-aware anti
    join — the denylist keys are non-null so it degenerates to a plain anti
    join). The countDistinct shuffles (attrs, suppkey) pairs — never raw
    part rows."""
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf, "part").filter(F.col("p_brand") != "Brand#5").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    deny = (
        _t(spark, sf, "supplier")
        .filter(F.col("s_suppkey") % 13 == 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(deny), li["l_suppkey"] == deny["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "h20_bulk_shippers",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%gear%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 50
    )
    """,
)
def h20_bulk_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who bulk-shipped any qualifying part in a
    year — a nested semi-join chain (part filter → grouped HAVING →
    IN-subquery). The inner aggregate's qualifying key set is tiny, so it
    broadcasts into a LEFT SEMI probe of supplier; quantities sum exactly
    (integral doubles)."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf, "part").filter(F.col("p_name").like("%gear%")).select("p_partkey")
    bulk = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return s.join(
        F.broadcast(bulk), s["s_suppkey"] == bulk["l_suppkey"], "left_semi"
    )


@query(
    "x14_length_outliers",
    """
    WITH pr AS (
      SELECT doc_id, source, n_chars,
             percent_rank() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id) AS p
      FROM documents
    )
    SELECT doc_id, source, n_chars, round(p, 6) AS pct_rank,
           CASE WHEN p <= 0.05 THEN 'short' ELSE 'long' END AS tag
    FROM pr WHERE p <= 0.05 OR p >= 0.95
    """,
)
def x14_length_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source length-outlier detection via rank-based percentiles —
    the distribution-trimming pass of a curation pipeline. ``percent_rank``
    is pure integer arithmetic ((rank−1)/(n−1)), so unlike value-
    interpolating quantiles it is bit-deterministic across engines; the
    (n_chars, doc_id) order makes tie handling total. One shuffle on
    source."""
    docs = _t(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    pr = docs.select(
        "doc_id", "source", "n_chars", F.percent_rank().over(w).alias("p")
    )
    return (
        pr.filter((F.col("p") <= 0.05) | (F.col("p") >= 0.95))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round("p", 6).alias("pct_rank"),
            F.when(F.col("p") <= 0.05, F.lit("short"))
            .otherwise(F.lit("long"))
            .alias("tag"),
        )
    )


@query(
    "x21_doc_chunking",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), st AS (
      SELECT doc_id, toks, u.s
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1), 24)) u(s)
    ), ch AS (
      SELECT doc_id, CAST((s - 1) / 24 AS INT) AS chunk_id,
             list_slice(toks, s, least(s + 31, len(toks))) AS sl
      FROM st
    )
    SELECT doc_id, chunk_id,
           CAST(len(sl) AS INT) AS n_tokens,
           md5(array_to_string(sl, ' ')) AS chunk_hash
    FROM ch WHERE length(array_to_string(sl, ' ')) > 0
    """,
)
def x21_doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window document chunking (size 32, stride 24 → 8-token
    overlap) — the retrieval/packing prep every RAG or long-context
    pipeline runs before embedding. Entirely map-side array math: one
    ``sequence`` of chunk starts per doc, ``transform``+``slice`` to cut
    windows, one explode — no shuffle at all, so it streams at scan speed
    over 100 TB. The content hash pins every chunk's exact text under the
    value gate without shipping raw text."""
    from .operators.dedup import normalized_text

    C, S = 32, 24
    docs = _t(spark, sf, "documents")
    toks = F.split(normalized_text("text"), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(S))
    chunk = F.explode(starts).alias("s")
    out = docs.select("doc_id", toks.alias("_toks"), chunk).select(
        "doc_id",
        (((F.col("s") - 1) / S).cast("int")).alias("chunk_id"),
        F.slice("_toks", F.col("s"), F.lit(C)).alias("_sl"),
    )
    txt = F.concat_ws(" ", F.col("_sl"))
    return (
        out.filter(F.length(txt) > 0)
        .select(
            "doc_id",
            "chunk_id",
            F.size("_sl").alias("n_tokens"),
            F.md5(txt).alias("chunk_hash"),
        )
    )


@query(
    "x23_containment_neardup",
    f"""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 80
    ), basenorm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM base
    ), corpus AS (
      SELECT doc_id, toks FROM basenorm
      UNION ALL
      -- planted fragments: the first half of every 4th doc — contained in
      -- the original (containment ≈ 1) but Jaccard-low vs a long doc
      SELECT doc_id + 200000 AS doc_id,
             list_slice(toks, 1, greatest(len(toks) // 2, 4)) AS toks
      FROM basenorm WHERE doc_id % 4 = 0
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM corpus, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), shf AS (
      SELECT sh.doc_id, sh.shingle FROM sh
      JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000) f
        USING (shingle)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter, sa.n AS n_a, sb.n AS n_b,
           round(CAST(n_inter AS DOUBLE) / sa.n, 6) AS containment_a,
           round(CAST(n_inter AS DOUBLE) / sb.n, 6) AS containment_b
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE greatest(CAST(n_inter AS DOUBLE) / sa.n,
                   CAST(n_inter AS DOUBLE) / sb.n) >= 0.5
    """,
)
def x23_containment_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment dedup (|A∩B|/|A|): catches sub-document
    duplication — excerpts, quotes, boilerplate fragments — that symmetric
    Jaccard misses (a half-doc fragment has Jaccard ≈ 0.5 vs its source but
    containment ≈ 1.0). Planted fragments (first half of every 4th doc)
    guarantee visible recall. Posting-list join with the df cap — same
    sub-quadratic shape as d3."""
    from .operators.dedup import containment_pairs, normalized_text, shingles

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 80)
    toks = F.split(normalized_text("text"), " ")
    half = F.slice(toks, 1, F.greatest((F.size(toks) / 2).cast("int"), F.lit(4)))
    corpus = docs.select("doc_id", F.col("text")).unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat_ws(" ", half).alias("text"),
        )
    )
    sh = shingles(corpus, n=3)
    return containment_pairs(sh, threshold=0.5, token_col="shingle")


@query(
    "x22_token_entropy",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), tok AS (
      SELECT doc_id, t.tok FROM norm, unnest(toks) t(tok) WHERE t.tok <> ''
    ), counts AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
    FROM counts GROUP BY doc_id
    """,
)
def x22_token_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Token-distribution Shannon entropy per document — the repetition/
    boilerplate quality signal (template docs score low, natural prose
    high). Computed as ln(n) − Σc·ln(c)/n so the only shuffle is the
    (doc_id, token) count (combiner-friendly) plus the per-doc fold; the
    algebra keeps one log per DISTINCT token instead of per occurrence.
    Rounded to 6 dp to absorb float-summation order across engines."""
    from .operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
        ).alias("entropy"),
    )


@query(
    "v6_reranked_topk",
    """
    WITH scaled AS (
      SELECT vec_id,
             round(list_max(list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE)))) / 127.0, 6) AS scale
      FROM embeddings
    ), quant AS (
      SELECT e.vec_id, s.scale,
             list_transform(e.embedding,
               x -> CASE WHEN s.scale = 0 THEN 0
                    ELSE CAST(round(CAST(x AS DOUBLE) / s.scale) AS INT) END) AS q
      FROM embeddings e JOIN scaled s USING (vec_id)
    ), qflat AS (
      SELECT vec_id, t.i, CAST(q[t.i] AS BIGINT) AS qx
      FROM quant, range(1, 65) t(i)
    ), flat AS (
      SELECT vec_id, t.i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), approx AS (
      SELECT fa.vec_id AS query_id, fb.vec_id AS neighbor_id,
             CAST(sum(fa.qx * fb.qx) AS DOUBLE)
               * any_value(sa.scale) * any_value(sb.scale) AS ap
      FROM qflat fa
      JOIN qflat fb ON fb.i = fa.i AND fb.vec_id <> fa.vec_id
      JOIN scaled sa ON sa.vec_id = fa.vec_id
      JOIN scaled sb ON sb.vec_id = fb.vec_id
      WHERE fa.vec_id < 5
      GROUP BY 1, 2
    ), short AS (
      SELECT query_id, neighbor_id, ap FROM approx
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY ap DESC, neighbor_id ASC) <= 10
    ), sims AS (
      SELECT s.query_id, s.neighbor_id, any_value(s.ap) AS ap,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM short s
      JOIN flat fa ON fa.vec_id = s.query_id
      JOIN flat fb ON fb.vec_id = s.neighbor_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = s.query_id
      JOIN norms nb ON nb.vec_id = s.neighbor_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, neighbor_id, sim, ap,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank, sim, round(ap, 6) AS approx_sim
    FROM ranked WHERE rank <= 3
    """,
)
def v6_reranked_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage retrieval: int8-quantized shortlist (exact integer dots,
    4× less memory bandwidth — the pass that scans the 100 TB corpus),
    then float-exact cosine re-rank of 10 candidates per query. The oracle
    replays quantization, both scoring passes, and both rankings."""
    from .operators.similarity import reranked_topk

    emb = _t(spark, sf, "embeddings")
    return reranked_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, shortlist=10, dim=64)


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
    from .operators.funnel import funnel_counts

    ev = _t(spark, sf, "events")
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click_after_view", F.col("event_type") == "click"),
        ("purchase_after_click", F.col("event_type") == "purchase"),
    ]
    return funnel_counts(ev, steps).withColumnRenamed("n_keys", "n_users")


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
    from .operators.multimodal import frame_sample_plan

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


@query(
    "d7_simhash_near_pairs",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), toks AS (
      SELECT DISTINCT doc_id, tok AS token
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM corpus)
      WHERE tok <> ''
    ), digits AS (
      SELECT doc_id, token, d.d,
             strpos('0123456789abcdef',
                    substring(md5(token), CAST(d.d AS INT) + 1, 1)) - 1 AS dig
      FROM toks, range(0, 16) d(d)
    ), bits AS (
      SELECT doc_id, d * 4 + b.b AS bit,
             CASE WHEN CAST(floor(dig / pow(2, b.b)) AS BIGINT) % 2 = 1
                  THEN 1 ELSE -1 END AS w
      FROM digits, range(0, 4) b(b)
    ), bitsums AS (
      SELECT doc_id, bit, sum(w) AS s FROM bits GROUP BY 1, 2
    ), sigs AS (
      SELECT doc_id,
             sum(CASE WHEN bit < 32 AND s > 0
                      THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS lo,
             sum(CASE WHEN bit >= 32 AND s > 0
                      THEN (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS hi
      FROM bitsums GROUP BY 1
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                  AS INT) AS hamming
      FROM sigs a JOIN sigs b
        ON (a.lo = b.lo OR a.hi = b.hi) AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 6
    """,
)
def d7_simhash_near_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs under the value-hash gate: 64-bit md5-derived
    token signatures, half-match blocking (a ≤6-of-64 hamming pair almost
    surely agrees exactly on one 32-bit half → two equi joins, no
    cartesian), planted one-token mutations (doc+100000) must collide at
    low hamming. The oracle rebuilds every bit in SQL."""
    from .operators.dedup import simhash64, simhash_near_pairs, tokens

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    sigs = simhash64(tokens(corpus))
    pairs = simhash_near_pairs(sigs, max_hamming=6)
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


@query(
    "p10_json_props_agg",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 10
    GROUP BY 1
    """,
)
def p10_json_props_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-on-read over the dynamic payload column (the reference's
    `json` field pattern, P4 at aggregation scale): extract a property
    from the raw JSON string, filter and aggregate on it — all inside
    whole-stage codegen via get_json_object (no parse-to-struct
    materialization). Integer sums are exact, so the aggregate is
    order-independent."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "x15_corpus_diff",
    f"""
    WITH v1 AS (
      SELECT doc_id, md5({_NORM_SQL}) AS h FROM documents
    ), v2 AS (
      -- next corpus version: 10 docs mutated, 5 dropped, 5 added
      SELECT doc_id, md5(regexp_replace(lower(trim(
               CASE WHEN doc_id % 50 = 0 THEN concat(text, ' edit')
                    ELSE text END)), '\\s+', ' ', 'g')) AS h
      FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 500000 AS doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents WHERE doc_id < 5
    ), j AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             a.h AS h1, b.h AS h2
      FROM v1 a FULL OUTER JOIN v2 b USING (doc_id)
    )
    SELECT CASE WHEN h1 IS NULL THEN 'added'
                WHEN h2 IS NULL THEN 'removed'
                WHEN h1 <> h2 THEN 'changed'
                ELSE 'unchanged' END AS status,
           count(*) AS n_docs
    FROM j GROUP BY 1
    """,
)
def x15_corpus_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-version diff: classify every doc_id across two corpus
    snapshots as added / removed / changed / unchanged by comparing
    normalized content hashes through a full outer join — the incremental-
    ingest primitive that decides what a delta pipeline must reprocess.
    Only 32-byte hashes shuffle, never text; the v2 snapshot is
    synthesized deterministically (mutate every 50th doc, drop every
    97th, add 5)."""
    from .operators.dedup import content_hash

    docs = _t(spark, sf, "documents")
    v1 = docs.select("doc_id", content_hash("text").alias("h1"))
    mutated = F.when(
        F.col("doc_id") % 50 == 0, F.concat(F.col("text"), F.lit(" edit"))
    ).otherwise(F.col("text"))
    v2 = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", mutated.alias("text"))
        .select("doc_id", content_hash("text").alias("h2"))
        .unionByName(
            docs.filter(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                F.md5(F.col("doc_id").cast("string")).alias("h2"),
            )
        )
    )
    j = v1.join(v2, "doc_id", "full_outer")
    status = (
        F.when(F.col("h1").isNull(), "added")
        .when(F.col("h2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(status.alias("status")).agg(F.count("*").alias("n_docs"))


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
    "x17_inverted_index",
    f"""
    WITH pairs AS (
      SELECT DISTINCT doc_id, tok AS token
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    )
    SELECT token, count(*) AS df,
           array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',')
             AS postings_head
    FROM pairs GROUP BY token HAVING count(*) >= 3
    """,
)
def x17_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index build: token → document frequency + the head of its
    sorted posting list — the persisted structure behind corpus search and
    the posting-join dedup family. Postings are SORTED then TRUNCATED to a
    bounded head (collect_list order is partition-dependent; sort_array
    restores determinism, and the cap bounds hot-token rows — a full
    posting list for a stopword would be corpus-sized). One shuffle on
    token with map-side combine; hapax tokens (df < 3) are dropped."""
    from .operators.dedup import tokens

    pairs = tokens(_t(spark, sf, "documents"))
    return (
        pairs.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10), ","
            ).alias("postings_head"),
        )
        .filter(F.col("df") >= 3)
    )


@query(
    "x18_keyword_search",
    f"""
    WITH pairs AS (
      SELECT doc_id, tok AS token, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
      GROUP BY 1, 2
    ), a AS (SELECT doc_id, tf FROM pairs WHERE token = 'table'),
    b AS (SELECT doc_id, tf FROM pairs WHERE token = 'query')
    SELECT a.doc_id, a.tf + b.tf AS score
    FROM a JOIN b USING (doc_id)
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def x18_keyword_search(spark: SparkSession, sf: str) -> DataFrame:
    """Conjunctive keyword search over the posting lists: docs containing
    BOTH query terms ('table' AND 'query'), ranked by combined term frequency with a total
    tiebreak. The per-term posting sets come from one tokenize pass; the
    AND is an equi join of two tiny term slices (at scale: index lookups,
    never a corpus scan); top-k via TakeOrderedAndProject."""
    docs = _t(spark, sf, "documents")
    from .operators.dedup import normalized_text

    pairs = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    a = pairs.filter(F.col("token") == "table").select("doc_id", F.col("tf").alias("tf_a"))
    b = pairs.filter(F.col("token") == "query").select("doc_id", F.col("tf").alias("tf_b"))
    return (
        a.join(b, "doc_id")
        .select("doc_id", (F.col("tf_a") + F.col("tf_b")).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "x19_sequence_packing",
    """
    WITH tok AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    ), laid AS (
      SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM tok
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor(cum_before / 512) AS BIGINT) AS seq_id,
           CAST(cum_before % 512 AS BIGINT) AS offset
    FROM laid
    """,
)
def x19_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-then-chunk sequence packing: each doc assigned to the
    512-token training sequence where it starts, per source, in an
    md5-deterministic layout order. Pure integer window math — the doc→
    sequence map a dataloader needs, computed without materializing any
    token stream."""
    from .operators.sampling import pack_sequences
    from .operators.textan import token_count

    docs = _t(spark, sf, "documents")
    return pack_sequences(docs, token_count(), context_len=512)


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
    "x20_source_vocab_overlap",
    f"""
    WITH toks AS (
      SELECT DISTINCT source, tok AS token
      FROM (SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ), sizes AS (
      SELECT source, count(*) AS n FROM toks GROUP BY 1
    ), tokf AS (
      -- source-df cap (max_source_df=256): tokens shared by more sources
      -- than that contribute df² posting pairs; a no-op on this corpus
      -- (handful of sources) but part of the operator contract
      SELECT t.source, t.token FROM toks t
      JOIN (SELECT token FROM toks GROUP BY token HAVING count(*) <= 256) f
        USING (token)
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
      FROM tokf a JOIN tokf b
        ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_inter, sa.n AS n_a, sb.n AS n_b,
           round(CAST(i.n_inter AS DOUBLE)
                 / (sa.n + sb.n - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
)
def x20_source_vocab_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-overlap matrix between sources (Jaccard of distinct
    token sets) — the corpus-composition diagnostic behind mixing
    decisions: near-identical vocabularies suggest redundant sources. The
    pair space is |sources|², tiny by construction (sources are a
    metadata-scale dimension), while the token posting join carries only
    (source, token) distinct pairs — never documents."""
    from .operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    sizes = toks.groupBy("source").agg(F.count("*").alias("n"))
    # source-df cap (same pattern as dedup.jaccard_pairs' max_token_df):
    # tokens live in ≤256 sources or drop out — bounds posting pairs at
    # df²≤65k per token on degenerate many-source corpora
    keep = (
        toks.groupBy("token")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= 256)
        .select("token")
    )
    tokf = toks.join(keep, "token")
    a = tokf.select(F.col("source").alias("source_a"), "token")
    b = tokf.select(F.col("source").alias("source_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b", "n_inter", "n_a", "n_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


_DISCLAIMER = (
    "this document is provided as is without warranty of any kind"
)


@query(
    "x24_boilerplate_ngrams",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN concat('{_DISCLAIMER} ', text) ELSE text END AS text
      FROM documents
    ), norm AS (
      SELECT doc_id, string_split(
        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    )
    SELECT shingle, CAST(count(*) AS BIGINT) AS n_docs
    FROM sh GROUP BY shingle HAVING count(*) >= 10
    ORDER BY n_docs DESC, shingle ASC LIMIT 20
    """,
)
def x24_boilerplate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate mining: the most document-frequent word 3-grams across the
    corpus — the signal behind template/disclaimer stripping in pretraining
    pipelines (a shingle shared by thousands of documents is layout, not
    content). A fixed legal disclaimer is planted on every 7th document so
    recall is visible: its shingles must dominate the top-k.

    Scale shape: ``shingles`` emits distinct (doc, shingle) pairs, ONE
    groupBy(shingle) with partial-agg count, top-k via
    TakeOrderedAndProject — no joins at all, linear in corpus tokens."""
    from .operators.dedup import shingles

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(_DISCLAIMER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sh = shingles(docs, n=3)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 10)
        .orderBy(F.desc("n_docs"), F.asc("shingle"))
        .limit(20)
    )


@query(
    "x25_vocab_growth",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, concat_ws(' ', toks[i], toks[i+1]) AS gram
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 1, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1])) > 0
    ), first_seen AS (
      SELECT gram, CAST(floor(min(doc_id) / 100) AS INT) AS bucket
      FROM sh GROUP BY gram
    ), per_bucket AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS new_grams
      FROM first_seen GROUP BY bucket
    )
    SELECT bucket, new_grams,
           CAST(sum(new_grams) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_vocab
    FROM per_bucket
    """,
)
def x25_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve over ingestion order: per
    100-document bucket, how many bigrams appear for the FIRST time, plus
    the running vocabulary size. A flattening curve tells a data-collection
    pipeline that a source is exhausted (new data adds no new language).

    Scale shape: first-occurrence via ONE groupBy(gram) min — never a
    cumulative distinct (which Spark windows cannot express without a
    quadratic self-join); the cumulative sum runs over the bucket-count
    table, metadata-sized (≤ n_docs/100 rows) on a single partition."""
    from .operators.dedup import shingles

    docs = _t(spark, sf, "documents")
    first_seen = (
        shingles(docs.select("doc_id", "text"), n=2)
        .withColumnRenamed("shingle", "gram")
        .groupBy("gram")
        .agg((F.min("doc_id") / 100).cast("int").alias("bucket"))
    )
    per_bucket = first_seen.groupBy("bucket").agg(
        F.count("*").alias("new_grams")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per_bucket.select(
        "bucket",
        "new_grams",
        F.sum("new_grams").over(w).alias("cum_vocab"),
    )


@query(
    "x26_source_kl_drift",
    f"""
    WITH tok AS (
      SELECT source, t.tok AS token
      FROM (SELECT source, string_split({_NORM_SQL}, ' ') AS toks
            FROM documents) n, unnest(toks) t(tok)
      WHERE t.tok <> ''
    ), sc AS (
      SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
    ), stot AS (
      SELECT source, sum(c) AS n_s FROM sc GROUP BY source
    ), gtot AS (
      SELECT token, sum(c) AS g FROM sc GROUP BY token
    ), n AS (SELECT sum(c) AS total FROM sc)
    SELECT s.source, CAST(any_value(t.n_s) AS BIGINT) AS n_tokens,
           round(sum((s.c / t.n_s)
                     * ln((s.c / t.n_s) / (g.g / n.total))), 6) AS kl
    FROM sc s
    JOIN stot t USING (source)
    JOIN gtot g USING (token)
    CROSS JOIN n
    GROUP BY s.source
    """,
)
def x26_source_kl_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source distribution drift: KL(source unigram dist ‖ corpus
    unigram dist) — the mixture-monitoring statistic behind "did this crawl
    slice change register?" alerts in training-data pipelines. High KL =
    the source's language diverges from the corpus average.

    Scale shape: raw tokens collapse immediately to (source, token) counts
    (ONE shuffle, partial-agg combined); everything after runs on the
    vocabulary-sized count table — the global token totals and corpus total
    ride back in as broadcast joins, never a second pass over documents."""
    from .operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    tok = (
        docs.select(
            "source",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    sc = tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    stot = sc.groupBy("source").agg(F.sum("c").alias("n_s"))
    gtot = sc.groupBy("token").agg(F.sum("c").alias("g"))
    n = sc.groupBy().agg(F.sum("c").alias("total"))
    p = F.col("c") / F.col("n_s")
    q = F.col("g") / F.col("total")
    return (
        sc.join(F.broadcast(stot), "source")
        .join(F.broadcast(gtot), "token")
        .crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(
            F.any_value("n_s").cast("bigint").alias("n_tokens"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl"),
        )
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


_SIG_MATCH_SQL = " + ".join(
    f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(16)
)


@query(
    "d9_minhash_error_audit",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), norm AS (
      SELECT doc_id, string_split({{norm}}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), sigs AS (
      SELECT doc_id,
           {{minhash}}
      FROM sh GROUP BY doc_id
    ), banded AS ({{bands}}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), est AS (
      SELECT p.doc_a, p.doc_b,
             ({_SIG_MATCH_SQL}) / 16.0 AS est_jaccard
      FROM pairs p
      JOIN sigs sa ON sa.doc_id = p.doc_a
      JOIN sigs sb ON sb.doc_id = p.doc_b
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT p.doc_a, p.doc_b, count(*) AS n_inter
      FROM pairs p
      JOIN sh a ON a.doc_id = p.doc_a
      JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT e.doc_a, e.doc_b,
           round(e.est_jaccard, 6) AS est_jaccard,
           round(CAST(i.n_inter AS DOUBLE)
                 / (sa.n + sb.n - i.n_inter), 6) AS jaccard,
           round(abs(e.est_jaccard
                     - CAST(i.n_inter AS DOUBLE)
                       / (sa.n + sb.n - i.n_inter)), 6) AS abs_err
    FROM est e
    JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
    JOIN sizes sa ON sa.doc_id = e.doc_a
    JOIN sizes sb ON sb.doc_id = e.doc_b
    """.format(norm=_NORM_SQL, minhash=_MINHASH_AGGS_SQL, bands=_BANDS_SQL),
)
def d9_minhash_error_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-quality audit: for every LSH candidate pair, the MinHash
    ESTIMATE of Jaccard (fraction of agreeing signature positions) next to
    the EXACT shingle Jaccard and their absolute error — the measurement
    that justifies (or rejects) a signature width before a corpus-wide
    dedup run. Same planted near-dup corpus as d2, so high-similarity
    pairs are guaranteed present.

    Scale shape: the estimate joins two 16-element signature rows per
    CANDIDATE pair (bounded by LSH collision rate, broadcast-joined); the
    exact side reuses ``jaccard_for_pairs`` — cost |pairs|·|doc|, never
    the Σdf² posting blowup (see dedup.py:543)."""
    from .operators.dedup import (
        jaccard_for_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    sh = shingles(corpus, n=3)
    sigs = minhash_signatures(sh, num_hashes=16, token_col="shingle")
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("signature").alias("_sa"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("signature").alias("_sb"))
    matches = F.aggregate(
        F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", (matches / 16.0).alias("_est"))
    )
    exact = jaccard_for_pairs(pairs, sh, threshold=0.0).select(
        "doc_a", "doc_b", "jaccard"
    )
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        F.round("_est", 6).alias("est_jaccard"),
        F.round("jaccard", 6).alias("jaccard"),
        F.round(F.abs(F.col("_est") - F.col("jaccard")), 6).alias("abs_err"),
    )


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
    from .operators.multimodal import extract_features
    from .session import ship_package

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


_HEXMAP = "'0123456789abcdef'"
_U32_SQL = " + ".join(
    f"(strpos({_HEXMAP}, substr(md5(token), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


def _u32_sql(expr: str) -> str:
    """First 32 bits of md5(expr) as an integer, in portable ANSI-ish SQL
    (DuckDB has no hex-to-int conv); mirrors Spark's
    ``conv(substring(md5(expr), 1, 8), 16, 10)``."""
    return " + ".join(
        f"(strpos({_HEXMAP}, substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
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
    "x27_kmv_distinct_sketch",
    f"""
    WITH norm AS (
      SELECT source, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), tok AS (
      -- bigram vocabulary: large enough per source (~700) that the sketch
      -- regime (n > k) actually exercises, unlike the ~31-word unigram set
      SELECT DISTINCT source, concat_ws(' ', toks[i], toks[i+1]) AS token
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 1))) t(i)
      WHERE length(concat_ws(' ', toks[i], toks[i+1])) > 0
    ), u AS (
      SELECT source, token,
             ({_U32_SQL}) / 4294967296.0 AS u
      FROM tok
    ), ranked AS (
      SELECT source, u,
             row_number() OVER (PARTITION BY source ORDER BY u, token) AS rn,
             count(*) OVER (PARTITION BY source) AS n_exact
      FROM u
    )
    SELECT source,
           CAST(any_value(n_exact) AS BIGINT) AS n_exact,
           round(CASE WHEN any_value(n_exact) <= 64
                      THEN CAST(any_value(n_exact) AS DOUBLE)
                      ELSE 63.0 / max(CASE WHEN rn = 64 THEN u END) END,
                 6) AS est,
           round(abs(CASE WHEN any_value(n_exact) <= 64
                          THEN CAST(any_value(n_exact) AS DOUBLE)
                          ELSE 63.0 / max(CASE WHEN rn = 64 THEN u END) END
                     - any_value(n_exact)) / any_value(n_exact), 6) AS rel_err
    FROM ranked GROUP BY source
    """,
)
def x27_kmv_distinct_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=64, next to the
    exact count and its relative error — the ENGINE-PORTABLE cardinality
    sketch: HLL registers differ between Spark and DuckDB (and between
    Spark versions), but "the k-th smallest md5-derived uniform" is a pure
    function of the value set, so the sketch itself is oracle-checkable.
    Estimator: (k-1)/u_(k); exact regime below k values.

    Scale shape: per-key distinct once (shuffle on (source, token) with
    partial-agg dedup), then ONE window shuffle on source over the
    vocabulary-sized stream. At true scale the window becomes a
    bounded-heap aggregator (collect the k smallest per group); the
    estimator and its oracle are unchanged — that swap is plan-local."""
    from .operators.dedup import shingles

    docs = _t(spark, sf, "documents")
    # bigram vocabulary per source — ``shingles`` keyed on source dedups
    # straight to the (source, gram) level
    tok = shingles(docs.select("source", "text"), n=2, id_col="source").select(
        F.col("doc_id").alias("source"), F.col("shingle").alias("token")
    )
    u = tok.select(
        "source",
        "token",
        (F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
         / F.lit(4294967296.0)).alias("u"),
    )
    w = Window.partitionBy("source").orderBy("u", "token")
    wc = Window.partitionBy("source")
    ranked = u.select(
        "source",
        "u",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_exact"),
    )
    est = F.when(
        F.any_value("n_exact") <= 64, F.any_value("n_exact").cast("double")
    ).otherwise(
        F.lit(63.0) / F.max(F.when(F.col("rn") == 64, F.col("u")))
    )
    return ranked.groupBy("source").agg(
        F.any_value("n_exact").cast("bigint").alias("n_exact"),
        F.round(est, 6).alias("est"),
        F.round(
            F.abs(est - F.any_value("n_exact")) / F.any_value("n_exact"), 6
        ).alias("rel_err"),
    )


@query(
    "x28_pmi_collocations",
    f"""
    WITH norm AS (
      SELECT string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), uni AS (
      SELECT t.tok AS w, count(*) AS c
      FROM norm, unnest(toks) t(tok) WHERE t.tok <> '' GROUP BY 1
    ), bi AS (
      SELECT toks[i] AS wa, toks[i+1] AS wb, count(*) AS c
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> ''
      GROUP BY 1, 2
    ), nu AS (SELECT sum(c) AS n FROM uni),
    nb AS (SELECT sum(c) AS n FROM bi)
    SELECT b.wa, b.wb, CAST(b.c AS BIGINT) AS n_pair,
           round(ln((CAST(b.c AS DOUBLE) / nb.n)
                    / ((CAST(ua.c AS DOUBLE) / nu.n)
                       * (CAST(ub.c AS DOUBLE) / nu.n))), 6) AS pmi
    FROM bi b
    JOIN uni ua ON ua.w = b.wa
    JOIN uni ub ON ub.w = b.wb
    CROSS JOIN nu CROSS JOIN nb
    WHERE b.c >= 5
    ORDER BY pmi DESC, b.wa ASC, b.wb ASC LIMIT 25
    """,
)
def x28_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation mining: top-25 adjacent-bigram PMI
    ``ln(p(ab) / (p(a)p(b)))`` with a count floor — the phrase-detection
    statistic (word2vec-phrases, boilerplate phrase discovery) behind
    "should these two tokens be one token?" decisions in tokenizer and
    corpus-prep pipelines.

    Scale shape: bigram and unigram COUNT tables collapse immediately from
    the token stream (one shuffle each, partial-agg combined); the PMI
    join runs on the vocabulary-sized count tables with the two corpus
    totals riding in as 1-row broadcasts; top-k via
    TakeOrderedAndProject. All probabilities are exact-integer-count
    ratios divided in a fixed order — no floating-point accumulation."""
    from .operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    toks = docs.select(F.split(normalized_text("text"), " ").alias("_t"))
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    positions = toks.select(
        "_t",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("_t") - 1, F.lit(0)))
        ).alias("_i"),
    ).filter(F.col("_i") >= 1)
    bi = (
        positions.select(
            F.try_element_at("_t", F.col("_i")).alias("wa"),
            F.try_element_at("_t", F.col("_i") + 1).alias("wb"),
        )
        .filter((F.col("wa") != "") & (F.col("wb") != ""))
        .groupBy("wa", "wb")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    nu = uni.groupBy().agg(F.sum("c").alias("n_uni"))
    nb_tot = (
        positions.select(
            F.try_element_at("_t", F.col("_i")).alias("wa"),
            F.try_element_at("_t", F.col("_i") + 1).alias("wb"),
        )
        .filter((F.col("wa") != "") & (F.col("wb") != ""))
        .groupBy()
        .agg(F.count("*").alias("n_bi"))
    )
    ua = uni.select(F.col("w").alias("wa"), F.col("c").alias("ca"))
    ub = uni.select(F.col("w").alias("wb"), F.col("c").alias("cb"))
    pmi = F.log(
        (F.col("n_pair").cast("double") / F.col("n_bi"))
        / (
            (F.col("ca").cast("double") / F.col("n_uni"))
            * (F.col("cb").cast("double") / F.col("n_uni"))
        )
    )
    return (
        bi.join(F.broadcast(ua), "wa")
        .join(F.broadcast(ub), "wb")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb_tot))
        .select(
            "wa", "wb", "n_pair", F.round(pmi, 6).alias("pmi")
        )
        .orderBy(F.desc("pmi"), F.asc("wa"), F.asc("wb"))
        .limit(25)
    )


@query(
    "v8_pq_topk",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), cb AS (
      SELECT vec_id AS k, i, x FROM flat WHERE vec_id < 16
    ), dist AS (
      SELECT f.vec_id, CAST(floor(cb.i / 16) AS INT) AS m, cb.k,
             round(sum((f.x - cb.x) * (f.x - cb.x)), 6) AS d
      FROM flat f JOIN cb ON cb.i = f.i
      GROUP BY 1, 2, 3
    ), code AS (
      SELECT vec_id, m, k FROM (
        SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
        FROM dist) WHERE rn = 1
    ), adc AS (
      SELECT q.vec_id AS query_id, CAST(floor(cb.i / 16) AS INT) AS m, cb.k,
             round(sum(q.x * cb.x), 6) AS t
      FROM flat q JOIN cb ON cb.i = q.i
      WHERE q.vec_id < 5
      GROUP BY 1, 2, 3
    ), approx AS (
      SELECT a.query_id, c.vec_id AS neighbor_id,
             round(max(CASE WHEN c.m = 0 THEN a.t END)
                 + max(CASE WHEN c.m = 1 THEN a.t END)
                 + max(CASE WHEN c.m = 2 THEN a.t END)
                 + max(CASE WHEN c.m = 3 THEN a.t END), 6) AS approx_dot
      FROM code c JOIN adc a ON a.m = c.m AND a.k = c.k
      WHERE c.vec_id <> a.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rank, approx_dot FROM (
      SELECT query_id, neighbor_id, approx_dot,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dot DESC, neighbor_id) AS rank
      FROM approx) WHERE rank <= 3
    """,
)
def v8_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN (ADC scan) — completes the retrieval
    family (flat v1, LSH v2, IVF v3/v4, int8 two-stage v5/v6): vectors
    compress to 4 subspace codes against a 16-codeword deterministic
    codebook; queries scan codes with table lookups instead of float
    dot products. The oracle replays encode (argmin with the same
    rounded-distance tiebreak) and the ADC pivot in pure SQL — an
    independent formulation of the same arithmetic."""
    from .operators.similarity import pq_topk

    emb = _t(spark, sf, "embeddings")
    return pq_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)


@query(
    "x29_hybrid_rrf_retrieval",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), tok AS (
      SELECT DISTINCT doc_id, t.tok AS token
      FROM norm, unnest(toks) t(tok) WHERE t.tok <> ''
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
    ), qtok AS (SELECT doc_id AS query_id, token FROM tok WHERE doc_id < 3),
    inter AS (
      SELECT q.query_id, c.doc_id AS cand_id, count(*) AS n_inter
      FROM qtok q JOIN tok c ON c.token = q.token AND c.doc_id <> q.query_id
      GROUP BY 1, 2
    ), lex AS (
      SELECT query_id, cand_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(i.n_inter AS DOUBLE) / (sq.n + sc.n - i.n_inter)
                          DESC, cand_id ASC) AS lex_rank
      FROM inter i
      JOIN sizes sq ON sq.doc_id = i.query_id
      JOIN sizes sc ON sc.doc_id = i.cand_id
      QUALIFY lex_rank <= 10
    ), flat AS (
      SELECT vec_id, t.i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, sum(q.x * c.x) AS dot
      FROM flat q JOIN flat c ON c.i = q.i AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 3
      GROUP BY 1, 2
    ), vec AS (
      SELECT query_id, cand_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC, cand_id ASC)
               AS vec_rank
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.query_id
      JOIN norms nc ON nc.vec_id = d.cand_id
      QUALIFY vec_rank <= 10
    ), fused AS (
      SELECT coalesce(l.query_id, v.query_id) AS query_id,
             coalesce(l.cand_id, v.cand_id) AS doc_id,
             round(coalesce(1.0 / (60 + l.lex_rank), 0)
                   + coalesce(1.0 / (60 + v.vec_rank), 0), 6) AS rrf
      FROM lex l FULL OUTER JOIN vec v
        ON v.query_id = l.query_id AND v.cand_id = l.cand_id
    )
    SELECT query_id, doc_id, rank, rrf FROM (
      SELECT query_id, doc_id, rrf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf DESC, doc_id ASC) AS rank
      FROM fused) WHERE rank <= 5
    """,
)
def x29_hybrid_rrf_retrieval(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the modern RAG-stack
    default: a LEXICAL ranking (token-set Jaccard, the x18/d3 machinery)
    and a VECTOR ranking (exact cosine, the v1 machinery) fuse per query
    as Σ 1/(60+rank), so a document strong on either signal surfaces.
    RRF needs no score calibration between the two sides — exactly why
    production hybrid search uses it.

    Scale shape: each side is its own bounded top-k (broadcast 3-query
    side against posting lists / corpus scan); fusion joins two ≤k-row
    rankings per query — metadata-sized. Ranks carry total tiebreaks so
    the fused ordering is deterministic end-to-end."""
    from .operators.dedup import tokens

    docs = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")

    tok = tokens(docs)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    qtok = tok.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    inter = (
        tok.join(F.broadcast(qtok), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("cand_id"))
        .agg(F.count("*").alias("n_inter"))
    )
    sq = sizes.select(F.col("doc_id").alias("query_id"), F.col("n").alias("n_q"))
    sc = sizes.select(F.col("doc_id").alias("cand_id"), F.col("n").alias("n_c"))
    jac = F.col("n_inter") / (F.col("n_q") + F.col("n_c") - F.col("n_inter"))
    wl = Window.partitionBy("query_id").orderBy(F.desc(jac), F.asc("cand_id"))
    lex = (
        inter.join(F.broadcast(sq), "query_id")
        .join(sc, "cand_id")
        .withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= 10)
        .select("query_id", "cand_id", "lex_rank")
    )
    from .operators.similarity import cosine_topk

    vec = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=10, dim=64).select(
        "query_id", F.col("neighbor_id").alias("cand_id"),
        F.col("rank").alias("vec_rank"),
    )
    fused = (
        lex.join(vec, ["query_id", "cand_id"], "full_outer")
        .select(
            "query_id",
            F.col("cand_id").alias("doc_id"),
            F.round(
                F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("vec_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "rank", "rrf")
    )


@query(
    "x30_lsh_recall_audit",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), norm AS (
      SELECT doc_id, string_split({{norm}}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), sigs AS (
      SELECT doc_id,
           {{minhash}}
      FROM sh GROUP BY doc_id
    ), banded AS ({{bands}}),
    pred AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), truth AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.8
    ), joined AS (
      SELECT coalesce(p.doc_a, t.doc_a) AS doc_a,
             CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_pred,
             CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_truth
      FROM pred p FULL OUTER JOIN truth t
        ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
    )
    SELECT CAST(sum(in_pred * in_truth) AS BIGINT) AS tp,
           CAST(sum(in_pred * (1 - in_truth)) AS BIGINT) AS fp,
           CAST(sum((1 - in_pred) * in_truth) AS BIGINT) AS fn,
           round(CAST(sum(in_pred * in_truth) AS DOUBLE)
                 / greatest(sum(in_truth), 1), 6) AS recall
    FROM joined
    """.format(norm=_NORM_SQL, minhash=_MINHASH_AGGS_SQL, bands=_BANDS_SQL),
)
def x30_lsh_recall_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Set-level quality audit of the LSH candidate generator: confusion
    counts (tp/fp/fn) and recall of the banded-MinHash candidates against
    EXACT-Jaccard≥0.8 ground truth on the planted-duplicate corpus —
    the go/no-go measurement before trusting a banding config on a real
    corpus (d9 audits per-pair estimate error; this audits the RETRIEVAL
    of pairs). fn = near-dup pairs the sketch would MISS.

    Scale shape: ground truth is the posting-join Jaccard (bounded here by
    corpus construction; at scale one runs it on a sampled slice), the
    prediction side is the production LSH path, and the comparison is a
    full-outer join of two metadata-sized pair lists."""
    from .operators.dedup import (
        lsh_candidate_pairs,
        jaccard_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    sh = shingles(corpus, n=3)
    pred = lsh_candidate_pairs(
        minhash_signatures(sh, num_hashes=16, token_col="shingle"),
        bands=4,
        rows_per_band=4,
    ).withColumn("in_pred", F.lit(1))
    truth = (
        jaccard_pairs(sh, threshold=0.8, token_col="shingle", max_token_df=None)
        .select("doc_a", "doc_b")
        .withColumn("in_truth", F.lit(1))
    )
    joined = pred.join(truth, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("in_pred", F.lit(0)).alias("in_pred"),
        F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
    )
    return joined.groupBy().agg(
        F.sum(F.col("in_pred") * F.col("in_truth")).cast("bigint").alias("tp"),
        F.sum(F.col("in_pred") * (1 - F.col("in_truth"))).cast("bigint").alias("fp"),
        F.sum((1 - F.col("in_pred")) * F.col("in_truth")).cast("bigint").alias("fn"),
        F.round(
            F.sum(F.col("in_pred") * F.col("in_truth")).cast("double")
            / F.greatest(F.sum("in_truth"), F.lit(1)),
            6,
        ).alias("recall"),
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
    "x31_bigram_perplexity",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), model_uni AS (
      SELECT t.tok AS w, count(*) AS c
      FROM norm, unnest(toks) t(tok)
      WHERE t.tok <> '' AND doc_id % 2 = 0 GROUP BY 1
    ), v AS (SELECT count(*) AS v FROM model_uni),
    model_bi AS (
      SELECT toks[i] AS wa, toks[i+1] AS wb, count(*) AS c
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 0
      GROUP BY 1, 2
    ), doc_bi AS (
      SELECT doc_id, toks[i] AS wa, toks[i+1] AS wb
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 1
    )
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-sum(ln((coalesce(b.c, 0) + 1.0)
                         / (coalesce(ua.c, 0) + v.v))) / count(*), 6)
             AS cross_entropy
    FROM doc_bi d
    LEFT JOIN model_bi b ON b.wa = d.wa AND b.wb = d.wb
    LEFT JOIN model_uni ua ON ua.w = d.wa
    CROSS JOIN v
    GROUP BY d.doc_id
    """,
)
def x31_bigram_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document LM cross-entropy under a HELD-OUT bigram model with
    add-1 smoothing — the CCNet-style perplexity filter: the model trains
    on half the corpus (even doc ids, standing in for the trusted
    reference corpus), the other half is scored, so a scored document
    never smooths its own surprises away; high cross-entropy marks the
    garbled/off-domain candidates a curation pipeline cuts.

    Scale shape: the model is the (bigram, count) + (unigram, count)
    tables — vocabulary-sized, BROADCAST into the scored-doc bigram
    stream (LEFT joins: unseen bigrams fall to the +1 floor) — one corpus
    pass + one groupBy(doc_id); V rides in as a 1-row broadcast. In
    production the model tables are trained once and persisted (the KenLM
    role), leaving scoring as the only per-corpus cost.

    Calibration note (honest): the synthetic corpus is uniform-random
    text, so EVERY doc's bigram cross-entropy sits near ln V and the
    filter cannot separate garbled from normal here — measured: a planted
    gibberish doc scores 3.43 vs corpus avg 3.45. The statistic is
    value-exact (oracle) and discriminates on structured language, where
    real bigram probabilities are far from uniform."""
    from .operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    toks = docs.select("doc_id", F.split(normalized_text("text"), " ").alias("_t"))
    model_toks = toks.filter(F.col("doc_id") % 2 == 0)
    uni = (
        model_toks.select(F.explode("_t").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    vocab = uni.groupBy().agg(F.count("*").alias("v"))

    def bigrams(frame):
        pos = frame.select(
            "doc_id",
            "_t",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size("_t") - 1, F.lit(0)))
            ).alias("_i"),
        ).filter(F.col("_i") >= 1)
        return pos.select(
            "doc_id",
            F.try_element_at("_t", F.col("_i")).alias("wa"),
            F.try_element_at("_t", F.col("_i") + 1).alias("wb"),
        ).filter((F.col("wa") != "") & (F.col("wb") != ""))

    bi = bigrams(model_toks).groupBy("wa", "wb").agg(F.count("*").alias("cb"))
    scored = (
        bigrams(toks.filter(F.col("doc_id") % 2 == 1))
        .join(F.broadcast(bi), ["wa", "wb"], "left")
        .join(F.broadcast(uni.withColumnRenamed("w", "wa")), "wa", "left")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            -F.sum(
                F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + 1.0)
                    / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
                )
            )
            / F.count("*"),
            6,
        ).alias("cross_entropy"),
    )


@query(
    "x32_segment_dedup",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN concat('{_DISCLAIMER} {_DISCLAIMER} {_DISCLAIMER} ',
                              text)
                  ELSE text END AS text
      FROM documents
    ), norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), st AS (
      SELECT doc_id, toks, u.s
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1), 12)) u(s)
    ), seg AS (
      SELECT doc_id, CAST((s - 1) / 12 AS INT) AS seg_id,
             array_to_string(list_slice(toks, s, least(s + 11, len(toks))),
                             ' ') AS seg_txt,
             CAST(len(list_slice(toks, s, least(s + 11, len(toks))))
               AS INT) AS n_toks
      FROM st
    ), segf AS (
      SELECT * FROM seg WHERE length(seg_txt) > 0
    ), rep AS (
      SELECT seg_txt FROM (SELECT DISTINCT doc_id, seg_txt FROM segf)
      GROUP BY seg_txt HAVING count(*) >= 5
    ), marked AS (
      SELECT s.doc_id, s.seg_id, s.seg_txt, s.n_toks,
             r.seg_txt IS NOT NULL AS is_rep
      FROM segf s LEFT JOIN rep r USING (seg_txt)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN is_rep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN is_rep THEN 0 ELSE n_toks END) AS BIGINT)
             AS kept_tokens,
           md5(coalesce(
             string_agg(CASE WHEN is_rep THEN NULL ELSE seg_txt END, ' '
                        ORDER BY seg_id), '')) AS cleaned_hash
    FROM marked GROUP BY doc_id
    """,
)
def x32_segment_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Repeated-passage removal (RefinedWeb's exact line dedup, on 12-token
    segments since the synthetic corpus has no newlines): segments shared by
    >= 5 documents are boilerplate and get stripped; each document is
    rebuilt from its surviving segments in order. A tripled legal
    disclaimer (33 tokens -> two full shared segments) is planted on every
    7th document so the removal is visible; unique documents must pass
    through with cleaned_hash == hash of their normalized text.

    Scale shape (see ``operators/dedup.py:repeated_segment_removal``):
    map-side chunking, one partial-agg groupBy for document frequency, one
    equi join back (row-preserving), one per-doc agg with in-group ordered
    rebuild — no windows over the corpus, no driver loop."""
    from .operators.dedup import repeated_segment_removal

    plant = F.lit(" ".join([_DISCLAIMER] * 3) + " ")
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(plant, F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = repeated_segment_removal(docs, seg_len=12, min_df=5)
    return out.select(
        "doc_id",
        "n_segments",
        "n_removed",
        "kept_tokens",
        F.md5("cleaned_text").alias("cleaned_hash"),
    )


@query(
    "d10_semantic_dedup",
    """
    WITH flat0 AS (
      SELECT vec_id, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), flat AS (
      SELECT vec_id, i, x FROM flat0
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, i,
             x + CASE WHEN i = 1 THEN 0.25 ELSE 0 END AS x
      FROM flat0 WHERE vec_id % 25 = 0
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), celldots AS (
      SELECT v.vec_id, s.vec_id AS cell_id,
             round(sum(v.x * s.x) / (any_value(nv.nrm) * any_value(ns.nrm)), 6)
               AS sim
      FROM flat v JOIN flat s ON s.i = v.i AND s.vec_id < 16
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN norms ns ON ns.vec_id = s.vec_id
      GROUP BY v.vec_id, s.vec_id
    ), assign AS (
      SELECT vec_id, cell_id FROM celldots
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), pairs AS (
      SELECT aa.vec_id AS ida, bb.vec_id AS idb, aa.cell_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)),
                   6) AS cos
      FROM assign aa JOIN assign bb
        ON aa.cell_id = bb.cell_id AND aa.vec_id < bb.vec_id
      JOIN flat fa ON fa.vec_id = aa.vec_id
      JOIN flat fb ON fb.vec_id = bb.vec_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = aa.vec_id
      JOIN norms nb ON nb.vec_id = bb.vec_id
      GROUP BY 1, 2, 3
    )
    SELECT idb AS vec_id, cell_id,
           CAST(min(ida) AS BIGINT) AS kept_by,
           max(cos) AS max_sim
    FROM pairs WHERE cos >= 0.9
    GROUP BY idb, cell_id
    """,
)
def d10_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup: embedding-space near-duplicate removal scoped to coarse
    quantizer cells (paraphrase dedup that token n-grams cannot see).
    Perturbed copies (+0.25 on dimension 0, exactly representable in
    binary so the oracle replays it bit-for-bit) are planted for every
    25th vector; at threshold 0.9 only planted pairs can match (the
    natural within-cell cosine maxes out below 0.5 in this corpus).

    Scale shape (see ``operators/similarity.py:semantic_dedup``): map-side
    broadcast-seed assignment, equi self-join on cell_id (cost Σ|cell|²,
    the SemDeDup contract), hoisted norms."""
    from .operators.similarity import semantic_dedup

    base = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    planted = base.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x.cast("double") + 0.25).otherwise(
                x.cast("double")
            ),
        ).alias("embedding"),
    )
    corpus = base.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).unionByName(planted)
    return semantic_dedup(corpus, n_cells=16, threshold=0.9, dim=64)


@query(
    "x33_dsir_weights",
    f"""
    WITH norm AS (
      SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS toks
      FROM documents
    ), tok0 AS (
      SELECT doc_id, lang, toks[i] AS token
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= len(toks) AND length(toks[i]) > 0
    ), tok AS (
      SELECT doc_id, lang, ({_U32_SQL}) % 256 AS bucket FROM tok0
    ), bt AS (
      SELECT bucket, count(*) AS ct FROM tok WHERE lang = 'en' GROUP BY 1
    ), br AS (
      SELECT bucket, count(*) AS cr FROM tok WHERE lang <> 'en' GROUP BY 1
    ), wtab AS (
      SELECT coalesce(bt.bucket, br.bucket) AS bucket,
             coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
      FROM bt FULL JOIN br ON bt.bucket = br.bucket
    ), lr AS (
      SELECT bucket,
             ln((ct + 1.0) / (sum(ct) OVER () + 256.0))
               - ln((cr + 1.0) / (sum(cr) OVER () + 256.0)) AS w
      FROM wtab
    ), dtok AS (
      SELECT doc_id, bucket, count(*) AS dc
      FROM tok WHERE lang <> 'en' GROUP BY 1, 2
    ), scored AS (
      SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_tokens,
             round(sum(dc * w) / sum(dc), 6) AS dsir_weight
      FROM dtok JOIN lr USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, dsir_weight
    FROM scored ORDER BY dsir_weight DESC, doc_id ASC LIMIT 20
    """,
)
def x33_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    every out-of-target document by how target-like its hashed-unigram
    distribution is — avg log p_target/p_raw over 256 md5-hashed feature
    buckets with Laplace smoothing — and return the top 20 resampling
    candidates. Target = the English subcorpus; raw = everything else.

    Scale shape: ONE explode over corpus tokens feeds both the two
    256-row bucket-count aggs (partial-agg, map-side combine) and the
    per-doc bucket counts; the log-ratio table is 256 rows and rides as a
    broadcast join onto the per-doc stream (windows run over the 256-row
    table only, never the corpus). Top-k via TakeOrderedAndProject on the
    ROUNDED weight with doc_id tiebreak, so the boundary is deterministic
    across engines."""
    docs = _t(spark, sf, "documents")
    from .operators.dedup import normalized_text

    tok = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
                % 256
            ).alias("bucket"),
        )
    )
    bt = tok.filter(F.col("lang") == "en").groupBy("bucket").agg(
        F.count("*").alias("ct")
    )
    br = tok.filter(F.col("lang") != "en").groupBy("bucket").agg(
        F.count("*").alias("cr")
    )
    wtab = (
        bt.join(br, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    wall = Window.partitionBy()
    lr = wtab.select(
        "bucket",
        (
            F.log((F.col("ct") + 1.0) / (F.sum("ct").over(wall) + 256.0))
            - F.log((F.col("cr") + 1.0) / (F.sum("cr").over(wall) + 256.0))
        ).alias("w"),
    )
    dtok = (
        tok.filter(F.col("lang") != "en")
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("dc"))
    )
    scored = (
        dtok.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("dc").alias("n_tokens"),
            F.round(
                F.sum(F.col("dc") * F.col("w")) / F.sum("dc"), 6
            ).alias("dsir_weight"),
        )
    )
    return scored.orderBy(
        F.desc("dsir_weight"), F.asc("doc_id")
    ).limit(20)


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
    from .operators.dedup import normalized_text

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
    "v9_matryoshka_recall",
    """
    WITH flat AS (
      SELECT vec_id, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm,
             sqrt(sum(CASE WHEN i <= 16 THEN x * x ELSE 0 END)) AS nrm16
      FROM flat GROUP BY 1
    ), sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(sum(q.x * c.x)
                   / (any_value(nq.nrm) * any_value(nc.nrm)), 6) AS sim_full,
             round(sum(CASE WHEN q.i <= 16 THEN q.x * c.x ELSE 0 END)
                   / (any_value(nq.nrm16) * any_value(nc.nrm16)), 6)
               AS sim_trunc
      FROM flat q JOIN flat c ON c.i = q.i AND q.vec_id < 5
        AND c.vec_id <> q.vec_id
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      GROUP BY 1, 2
    ), rk AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_full DESC, neighbor_id ASC) AS r_full,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_trunc DESC, neighbor_id ASC) AS r_trunc
      FROM sims
    )
    SELECT query_id,
           CAST(sum(CASE WHEN r_full <= 10 AND r_trunc <= 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(sum(CASE WHEN r_full <= 10 AND r_trunc <= 10
                          THEN 1 ELSE 0 END) / 10.0, 6) AS recall_at_10
    FROM rk GROUP BY query_id
    """,
)
def v9_matryoshka_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka / truncated-dimension retrieval audit (Kusupati et al.
    2022, arXiv:2205.13147): how much of the exact 64-dim cosine top-10
    survives when retrieval uses only the first 16 dimensions — the
    dimension-truncation trade every embedding-store makes before paying
    for full-dim rerank. Completes the retrieval-audit family (x30 audits
    LSH recall, d9 MinHash error; this audits prefix truncation).

    Calibration note (honest): the synthetic embeddings are random, so a
    16-of-64 prefix shares only ~chance structure with the full vector and
    recall lands at 0.1-0.3. On actual Matryoshka-trained embeddings the
    prefix concentrates information and recall approaches 1; the AUDIT
    machinery (not the absolute number) is the deliverable here.

    Scale shape: ONE corpus scan scores both similarities per candidate
    pair (prefix dot via a zip_with that zeroes indices > 16 — no second
    join); queries are a 5-row broadcast (the whitelisted small-nonequi
    BNLJ shape, as v1); both rankings come from the same per-query window
    over candidate rows."""
    from .operators.similarity import _dot, _norm

    emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    pre = emb.select(
        "vec_id",
        "embedding",
        F.slice("embedding", 1, 16).alias("emb16"),
    )
    c = pre.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.col("emb16").alias("c16"),
        _norm(F.col("embedding")).alias("c_nrm"),
        _norm(F.col("emb16")).alias("c_nrm16"),
    )
    q = pre.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("emb16").alias("q16"),
        _norm(F.col("embedding")).alias("q_nrm"),
        _norm(F.col("emb16")).alias("q_nrm16"),
    )
    sims = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("sim_full"),
            F.round(
                _dot(F.col("q16"), F.col("c16"))
                / (F.col("q_nrm16") * F.col("c_nrm16")),
                6,
            ).alias("sim_trunc"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("sim_full"), F.asc("neighbor_id")
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.desc("sim_trunc"), F.asc("neighbor_id")
    )
    hit = F.when(
        (F.col("r_full") <= 10) & (F.col("r_trunc") <= 10), 1
    ).otherwise(0)
    return (
        sims.select(
            "query_id",
            F.row_number().over(wf).alias("r_full"),
            F.row_number().over(wt).alias("r_trunc"),
        )
        .groupBy("query_id")
        .agg(
            F.sum(hit).alias("n_hit"),
            F.round(F.sum(hit) / 10.0, 6).alias("recall_at_10"),
        )
    )


@query(
    "v10_ivf_pq_topk",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), celldots AS (
      SELECT v.vec_id, s.vec_id AS cell_id,
             round(sum(v.x * s.x) / (any_value(nv.nrm) * any_value(ns.nrm)), 6)
               AS sim
      FROM flat v JOIN flat s ON s.i = v.i AND s.vec_id < 16
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN norms ns ON ns.vec_id = s.vec_id
      GROUP BY v.vec_id, s.vec_id
    ), assign AS (
      SELECT vec_id, cell_id FROM celldots
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), probes AS (
      SELECT vec_id AS query_id, cell_id FROM celldots WHERE vec_id < 5
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) <= 2
    ), cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a USING (cell_id)
      WHERE a.vec_id <> p.query_id
    ), cb AS (
      SELECT vec_id AS k, i, x FROM flat WHERE vec_id < 16
    ), dist AS (
      SELECT f.vec_id, CAST(floor(cb.i / 16) AS INT) AS m, cb.k,
             round(sum((f.x - cb.x) * (f.x - cb.x)), 6) AS d
      FROM flat f JOIN cb ON cb.i = f.i
      GROUP BY 1, 2, 3
    ), code AS (
      SELECT vec_id, m, k FROM (
        SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
        FROM dist) WHERE rn = 1
    ), adc AS (
      SELECT q.vec_id AS query_id, CAST(floor(cb.i / 16) AS INT) AS m, cb.k,
             round(sum(q.x * cb.x), 6) AS t
      FROM flat q JOIN cb ON cb.i = q.i
      WHERE q.vec_id < 5
      GROUP BY 1, 2, 3
    ), approx AS (
      SELECT a.query_id, c.vec_id AS neighbor_id,
             round(max(CASE WHEN c.m = 0 THEN a.t END)
                 + max(CASE WHEN c.m = 1 THEN a.t END)
                 + max(CASE WHEN c.m = 2 THEN a.t END)
                 + max(CASE WHEN c.m = 3 THEN a.t END), 6) AS approx_dot
      FROM code c
      JOIN adc a ON a.m = c.m AND a.k = c.k
      JOIN cand cd ON cd.query_id = a.query_id AND cd.neighbor_id = c.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rank, approx_dot FROM (
      SELECT query_id, neighbor_id, approx_dot,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dot DESC, neighbor_id) AS rank
      FROM approx) WHERE rank <= 3
    """,
)
def v10_ivf_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF+PQ — the composed production ANN shape (Jégou et al. PAMI'11;
    what FAISS's IVFPQ runs at billion scale): the coarse quantizer
    restricts the scan to nprobe probed cells (cost N·nprobe/n_cells), and
    the ADC table-lookup scores the surviving candidates without touching
    raw vectors. Built by composition: ``ivf_candidates`` (shared with
    IVF-flat v3) feeds ``pq_topk(candidates=...)`` (shared with the full
    ADC scan v8) — both halves already independently driver-verified.

    Scale shape: one broadcast seed row (assign + probes), one broadcast
    codebook row (encode + ADC tables), candidate ids equi-join the code
    table; NOTHING corpus-sized shuffles and no raw vector leaves its
    scan."""
    from .operators.similarity import ivf_candidates, pq_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cand = ivf_candidates(emb, queries, n_cells=16, nprobe=2)
    return pq_topk(emb, queries, k=3, candidates=cand)


_SPAN_K = 8  # rolling-shingle length for duplicated-span detection


@query(
    "x34_duplicated_span_extents",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 = 1
                  THEN text || ' {_DISCLAIMER}'
                  WHEN doc_id % 11 = 3
                  THEN text || ' {_DISCLAIMER} {_DISCLAIMER}'
                  ELSE text END AS text
      FROM documents
    ), norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT doc_id, len(toks) AS n_toks, u.p AS pos,
             md5(array_to_string(list_slice(toks, u.p, u.p + {_SPAN_K} - 1),
                                 ' ')) AS h
      FROM norm,
           unnest(generate_series(1, greatest(len(toks) - {_SPAN_K} + 1, 0)))
             u(p)
    ), dup AS (
      SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), marked AS (
      SELECT s.doc_id, s.n_toks, s.pos FROM sh s JOIN dup USING (h)
    ), brk AS (
      SELECT doc_id, n_toks, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos > lag(pos) OVER w + {_SPAN_K}
                  THEN 1 ELSE 0 END AS is_new
      FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), grp AS (
      SELECT doc_id, n_toks, pos,
             sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM brk
    ), spans AS (
      SELECT doc_id, any_value(n_toks) AS n_toks,
             max(pos) - min(pos) + {_SPAN_K} AS span
      FROM grp GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_dup_spans,
           CAST(max(span) AS BIGINT) AS max_span_tokens,
           CAST(sum(span) AS BIGINT) AS dup_tokens,
           round(CAST(sum(span) AS DOUBLE) / any_value(n_toks), 6)
             AS dup_ratio
    FROM spans GROUP BY doc_id
    """,
)
def x34_duplicated_span_extents(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring duplicate SPANS (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): where x32 strips fixed
    segments shared corpus-wide, this measures the *extent* of verbatim
    cross-document repetition — every length-8 rolling token shingle that
    occurs in >= 2 distinct documents marks its 8-token interval, and
    overlapping/adjacent intervals merge into maximal duplicated spans
    (the practical shingle-hash stand-in for the paper's suffix-array
    scan). Per document: span count, longest span, duplicated-token
    coverage and ratio — the signal used to cut memorization-prone
    documents. Planted: every 9th document carries one shared disclaimer
    (one ~12-token span), every 11th a doubled one (a longer span).

    Scale shape: see ``operators/dedup.py:duplicated_span_extents`` —
    map-side rolling shingles, ONE 16-byte-hash groupBy with map-side
    partial agg, broadcast join back, per-document island window; no
    corpus-wide window, no all-pairs."""
    from .operators.dedup import duplicated_span_extents

    plant1 = F.lit(" " + _DISCLAIMER)
    plant2 = F.lit(" " + _DISCLAIMER + " " + _DISCLAIMER)
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 9 == 1, F.concat(F.col("text"), plant1))
        .when(F.col("doc_id") % 11 == 3, F.concat(F.col("text"), plant2))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return duplicated_span_extents(docs, k=_SPAN_K, min_docs=2)


@query(
    "x35_perplexity_terciles",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), model_uni AS (
      SELECT t.tok AS w, count(*) AS c
      FROM norm, unnest(toks) t(tok)
      WHERE t.tok <> '' AND doc_id % 2 = 0 GROUP BY 1
    ), v AS (SELECT count(*) AS v FROM model_uni),
    model_bi AS (
      SELECT toks[i] AS wa, toks[i+1] AS wb, count(*) AS c
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 0
      GROUP BY 1, 2
    ), doc_bi AS (
      SELECT doc_id, toks[i] AS wa, toks[i+1] AS wb
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 1
    ), scores AS (
      SELECT d.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             round(-sum(ln((coalesce(b.c, 0) + 1.0)
                           / (coalesce(ua.c, 0) + v.v))) / count(*), 6)
               AS cross_entropy
      FROM doc_bi d
      LEFT JOIN model_bi b ON b.wa = d.wa AND b.wb = d.wb
      LEFT JOIN model_uni ua ON ua.w = d.wa
      CROSS JOIN v
      GROUP BY d.doc_id
    ), bucketed AS (
      SELECT s.*, docs.lang,
             ntile(3) OVER (PARTITION BY docs.lang
                            ORDER BY s.cross_entropy, s.doc_id) AS tercile
      FROM scores s JOIN documents docs USING (doc_id)
    )
    SELECT lang, tercile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
           round(min(cross_entropy), 6) AS min_ce,
           round(max(cross_entropy), 6) AS max_ce
    FROM bucketed GROUP BY 1, 2
    """,
)
def x35_perplexity_terciles(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): per language,
    rank scored documents by held-out bigram cross-entropy (x31's
    statistic, reused verbatim) and cut the ranking into terciles — the
    bucket boundaries CCNet uses to keep the head, sample the middle and
    drop the tail of a crawl. Output: per (lang, tercile) doc count,
    bigram mass, and the tercile's entropy band [min_ce, max_ce].

    Scale shape: x31's scoring plan unchanged (vocab-sized model
    broadcasts, one corpus pass), then ntile over a per-language window —
    the window's sort key is (rounded ce, doc_id), a total order, so the
    bucketing is deterministic; the final agg is tiny (langs × 3 rows).
    The per-lang window sorts only scored docs (half the corpus) and in
    production would be the once-per-crawl ranking step."""
    scores = x31_bigram_perplexity(spark, sf)
    langs = _t(spark, sf, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy("cross_entropy", "doc_id")
    bucketed = scores.join(langs, "doc_id").withColumn(
        "tercile", F.ntile(3).over(w)
    )
    return bucketed.groupBy("lang", "tercile").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bigrams").alias("sum_bigrams"),
        F.round(F.min("cross_entropy"), 6).alias("min_ce"),
        F.round(F.max("cross_entropy"), 6).alias("max_ce"),
    )


@query(
    "x36_kneser_ney_scores",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), model_bi AS (
      SELECT toks[i] AS wa, toks[i+1] AS wb, count(*) AS c12
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 0
      GROUP BY 1, 2
    ), left_ctx AS (
      SELECT wa, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n1f
      FROM model_bi GROUP BY wa
    ), right_ctx AS (
      SELECT wb, CAST(count(*) AS BIGINT) AS n1b FROM model_bi GROUP BY wb
    ), totals AS (
      SELECT CAST(count(*) AS BIGINT) AS n_bi FROM model_bi
    ), doc_bi AS (
      SELECT doc_id, toks[i] AS wa, toks[i+1] AS wb
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 1
    ), probs AS (
      SELECT d.doc_id,
             CASE
               WHEN l.c1 IS NOT NULL THEN
                 (greatest(coalesce(b.c12, 0) - 0.75, 0)
                  + 0.75 * l.n1f
                    * (coalesce(r.n1b, 0) / CAST(t.n_bi AS DOUBLE)))
                 / l.c1
               WHEN r.n1b IS NOT NULL THEN
                 r.n1b / CAST(t.n_bi AS DOUBLE)
               ELSE 1.0 / t.n_bi
             END AS p,
             CASE WHEN b.c12 IS NULL THEN 1 ELSE 0 END AS backoff
      FROM doc_bi d
      LEFT JOIN model_bi b ON b.wa = d.wa AND b.wb = d.wb
      LEFT JOIN left_ctx l ON l.wa = d.wa
      LEFT JOIN right_ctx r ON r.wb = d.wb
      CROSS JOIN totals t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(backoff) AS BIGINT) AS n_backoff,
           round(-sum(ln(p)) / count(*), 6) AS kn_cross_entropy
    FROM probs GROUP BY doc_id
    """,
)
def x36_kneser_ney_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the smoothing family KenLM
    implements and CCNet actually filters with (x31's add-1 is the
    baseline; KN replaces "how often does w2 occur" with "in how many
    distinct contexts does w2 occur", which is what separates boilerplate
    from fluent text). Model on even doc ids (the trusted half), scored on
    odd:

        P(w2|w1) = (max(c(w1w2) - D, 0) + D · N1+(w1,·) · Pcont(w2)) / c(w1)
        Pcont(w2) = N1+(·,w2) / N1+(·,·),  D = 0.75

    with documented OOV conventions: unseen left context falls back to
    Pcont(w2); both-unseen falls to 1/N1+(·,·). Per scored doc: bigram
    count, backoff count (bigrams outside the model), KN cross-entropy.

    Scale shape: the model is three count tables (bigram, left-context,
    right-context) + a 1-row total — all vocabulary-sized, all BROADCAST
    into the scored-doc bigram stream; every term is an exact integer
    count, so the oracle replays the arithmetic bit-for-bit. One corpus
    pass + one groupBy(doc_id), same as x31."""
    docs = _t(spark, sf, "documents")
    from .operators.dedup import normalized_text

    toks = docs.select("doc_id", F.split(normalized_text("text"), " ").alias("_t"))

    def bigrams(frame):
        pos = frame.select(
            "doc_id",
            "_t",
            F.explode(
                F.when(
                    F.size("_t") >= 2,
                    F.sequence(F.lit(1), F.size("_t") - 1),
                ).otherwise(F.array())
            ).alias("_i"),
        )
        return pos.select(
            "doc_id",
            F.try_element_at("_t", F.col("_i")).alias("wa"),
            F.try_element_at("_t", F.col("_i") + 1).alias("wb"),
        ).filter((F.col("wa") != "") & (F.col("wb") != ""))

    model = bigrams(toks.filter(F.col("doc_id") % 2 == 0)).groupBy("wa", "wb").agg(
        F.count("*").alias("c12")
    )
    left_ctx = model.groupBy("wa").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    right_ctx = model.groupBy("wb").agg(F.count("*").alias("n1b"))
    totals = model.groupBy().agg(F.count("*").alias("n_bi"))

    scored = (
        bigrams(toks.filter(F.col("doc_id") % 2 == 1))
        .join(F.broadcast(model), ["wa", "wb"], "left")
        .join(F.broadcast(left_ctx), "wa", "left")
        .join(F.broadcast(right_ctx), "wb", "left")
        .crossJoin(F.broadcast(totals))
    )
    pcont = F.coalesce(F.col("n1b"), F.lit(0)) / F.col("n_bi").cast("double")
    p = (
        F.when(
            F.col("c1").isNotNull(),
            (
                F.greatest(
                    F.coalesce(F.col("c12"), F.lit(0)) - F.lit(0.75), F.lit(0.0)
                )
                + F.lit(0.75) * F.col("n1f") * pcont
            )
            / F.col("c1"),
        )
        .when(F.col("n1b").isNotNull(), F.col("n1b") / F.col("n_bi").cast("double"))
        .otherwise(F.lit(1.0) / F.col("n_bi"))
    )
    probs = scored.select(
        "doc_id",
        p.alias("p"),
        F.when(F.col("c12").isNull(), 1).otherwise(0).alias("backoff"),
    )
    return probs.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("backoff").alias("n_backoff"),
        F.round(-F.sum(F.log("p")) / F.count("*"), 6).alias("kn_cross_entropy"),
    )


def _u32_sql_at(expr: str, start: int) -> str:
    """32 md5 bits starting at hex digit ``start`` (1-based) as an integer —
    the offset twin of ``_u32_sql`` (mirrors Spark's
    ``conv(substring(md5(expr), start, 8), 16, 10)``)."""
    return " + ".join(
        f"(strpos({_HEXMAP}, substr(md5({expr}), {start + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
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
    from .operators.dedup import shingles

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
    "v11_range_search",
    """
    WITH flat AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 5
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           round(dot / (na.nrm * nb.nrm), 6) AS sim
    FROM dots JOIN norms na ON na.vec_id = query_id
              JOIN norms nb ON nb.vec_id = neighbor_id
    WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.25
    """,
)
def v11_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """Radius retrieval (FAISS range_search, the other half of the
    similarity-query API next to top-k v1): every neighbor with cosine
    >= 0.25 — the query shape dedup thresholds and near-dup audits
    actually use. Scale note: unlike top-k there is NO per-query window;
    the threshold filters the scored stream map-side and only survivors
    move, so cost is one corpus scan regardless of how many queries
    exceed their radius."""
    from .operators.similarity import range_search

    emb = _t(spark, sf, "embeddings")
    return range_search(emb, emb.filter(F.col("vec_id") < 5), tau=0.25, dim=64)


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
    from .operators.multimodal import image_ahash
    from .session import ship_package

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


@query(
    "x37_bm25_ranking",
    f"""
    WITH toks AS (
      SELECT doc_id, tok AS token FROM (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
        FROM documents)
      WHERE tok <> ''
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks
      WHERE token IN ('table', 'query') GROUP BY 1, 2
    ), df AS (
      SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id,
             ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (CAST(tf.tf AS DOUBLE) * (1.2 + 1))
               / (CAST(tf.tf AS DOUBLE)
                  + 1.2 * (1 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / s.avgdl))
               AS part
      FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id, round(sum(part), 6) AS bm25
    FROM scored GROUP BY 1
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 10
    """,
)
def x37_bm25_ranking(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 ranking (k1=1.2, b=0.75) for a disjunctive two-term query
    ('table' OR 'query') — the standard lexical scorer a training-data
    pipeline uses for retrieval baselines and hard-negative mining; the
    idf-weighted, length-normalized upgrade of x18's raw tf ranking.

    Scale shape: one tokenize pass feeds both the per-doc length table and
    the two query-term posting slices; n_docs/avgdl fold back in as a 1-row
    broadcast (integer sums — exact, order-independent — divided once).
    Posting slices are term-selective (never corpus-wide), so the dl join
    and the per-doc score sum run on candidate docs only; top-k via
    TakeOrderedAndProject. The per-doc sum adds at most one part per query
    term, so the double fold is order-insensitive."""
    from .operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.groupBy().agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("token").isin("table", "query"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    k1, b = F.lit(1.2), F.lit(0.75)
    idf = F.log(
        F.lit(1)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    part = idf * (tfd * (k1 + 1)) / (
        tfd + k1 * (F.lit(1) - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", part.alias("part"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


def _pr_iter_sql(prev: str, cur_c: str, cur_r: str) -> str:
    """One unrolled PageRank power-iteration pair of CTEs (contribution
    grouped-sum, then teleport + damping), matching
    ``operators/dedup.pagerank`` exactly."""
    return f"""
    {cur_c} AS (
      SELECT e.dst AS node, sum(r.pr / d.deg) AS mass
      FROM {prev} r
      JOIN edges e ON e.src = r.node
      JOIN deg d ON d.src = r.node
      GROUP BY 1
    ), {cur_r} AS (
      SELECT v.node,
             0.15 / nn.n + 0.85 * coalesce(c.mass, 0) AS pr
      FROM verts v CROSS JOIN nn
      LEFT JOIN {cur_c} c ON c.node = v.node
    )"""


@query(
    "d11_pagerank",
    f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ), deg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY 1
    ), verts AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), nn AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM verts
    ), r0 AS (
      SELECT node, 1.0 / nn.n AS pr FROM verts CROSS JOIN nn
    ), {_pr_iter_sql("r0", "c1", "r1")},
    {_pr_iter_sql("r1", "c2", "r2")},
    {_pr_iter_sql("r2", "c3", "r3")}
    SELECT node, round(pr, 6) AS pr
    FROM r3
    ORDER BY pr DESC, node ASC
    LIMIT 20
    """,
)
def d11_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank centrality (3 power iterations, damping 0.85) over the
    customer↔supplier trade graph (who-bought-from-whom via orders ⋈
    lineitem, symmetrized so no node dangles; customers get even node ids,
    suppliers odd) — top-20 hubs. The graph-centrality companion to
    d5/d8's connected components: dedup tells you WHAT is connected,
    PageRank tells you what is IMPORTANT, the score crawl-curation
    pipelines use as a per-source quality prior.

    Scale shape: the edge list + out-degrees materialize once
    (localCheckpoint — iterating over lineage-free ids only); each
    iteration is one equi-join shuffle and one grouped sum on node ids,
    never touching the fact tables again; the node count rides in as a
    1-row broadcast; top-k via TakeOrderedAndProject on the ROUNDED score
    (deterministic cutoff)."""
    from .operators.dedup import pagerank

    orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iters=3, damping=0.85)
    return (
        ranks.select("node", F.round("pr", 6).alias("pr"))
        .orderBy(F.desc("pr"), F.asc("node"))
        .limit(20)
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


# shared CTE: upper-triangle covariance cells of the embedding columns —
# used by v12 (the matrix itself) and v13 (power iteration on top of it)
_COV_CTE = """
    flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), nn AS (
      SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS n FROM flat
    ), sums AS (
      SELECT i, sum(x) AS sx FROM flat GROUP BY 1
    ), prods AS (
      SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
      FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ), covu AS (
      SELECT p.i, p.j,
             p.sxy / nn.n - (si.sx / nn.n) * (sj.sx / nn.n) AS cov
      FROM prods p
      JOIN sums si ON si.i = p.i
      JOIN sums sj ON sj.i = p.j
      CROSS JOIN nn
    )"""


@query(
    "v12_embedding_covariance",
    f"""
    WITH {_COV_CTE}
    SELECT i, j, round(cov, 6) + 0.0 AS cov FROM covu
    """,
)
def v12_embedding_covariance(spark: SparkSession, sf: str) -> DataFrame:
    """Covariance matrix of the embedding columns (upper triangle, 64×65/2
    = 2080 cells) — the distributed front-end of PCA/whitening: collect
    this sketch-sized matrix to the driver, eigendecompose with numpy, and
    broadcast the rotation back for dimensionality reduction, the standard
    recipe for embedding compression and SemDeDup-style preprocessing.

    Scale shape: each vector expands MAP-SIDE into its 2080 upper-triangle
    products (a nested ``transform`` over index sequences — no self-join,
    no second corpus shuffle) and partial-aggregates into the fixed 2080
    cells before the ONE shuffle; per-dimension sums ride the same pattern
    (64 cells) and fold back by dimension-index equi-joins; n arrives as a
    1-row broadcast. Corpus size never appears in shuffle volume — the
    whole reduce is (2080 + 64 + 1) cells regardless of row count. The
    oracle replays the float32→double quantization per element."""
    from .operators.similarity import covariance_cells

    cells = covariance_cells(_t(spark, sf, "embeddings"))
    return cells.select(
        "i",
        "j",
        # -0.0 → 0.0: negative zero renders differently than positive zero
        (F.round("cov", 6) + F.lit(0.0)).alias("cov"),
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
    from .operators.multimodal import extract_features
    from .session import ship_package

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
    "x38_gopher_rules",
    r"""
    WITH w AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents)
      WHERE tok <> ''
    ), ws AS (
      SELECT doc_id,
             count(*) AS n_words,
             CAST(sum(length(tok)) AS BIGINT) AS sum_len,
             CAST(sum(CASE WHEN regexp_matches(tok, '[A-Za-z]')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
             count(DISTINCT CASE WHEN lower(tok) IN
               ('join', 'hash', 'row', 'batch', 'scan')
               THEN lower(tok) END) AS n_stop
      FROM w GROUP BY 1
    ), ls AS (
      SELECT doc_id,
             count(*) AS n_lines,
             CAST(sum(CASE WHEN trim(ln) LIKE '-%' OR trim(ln) LIKE '*%'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet,
             CAST(sum(CASE WHEN trim(ln) LIKE '%...'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_ellip
      FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln
            FROM documents)
      GROUP BY 1
    ), sym AS (
      SELECT doc_id,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3 AS n_dots
      FROM documents
    ), feat AS (
      SELECT ws.doc_id,
             CASE WHEN ws.n_words < 50 OR ws.n_words > 100000
                  THEN 1 ELSE 0 END AS f_word_count,
             CASE WHEN CAST(ws.sum_len AS DOUBLE) / ws.n_words < 3
                    OR CAST(ws.sum_len AS DOUBLE) / ws.n_words > 10
                  THEN 1 ELSE 0 END AS f_mean_word_len,
             CASE WHEN CAST(sym.n_hash + sym.n_dots AS DOUBLE) / ws.n_words
                    > 0.1 THEN 1 ELSE 0 END AS f_symbol_ratio,
             CASE WHEN CAST(ls.n_bullet AS DOUBLE) / ls.n_lines > 0.9
                  THEN 1 ELSE 0 END AS f_bullet_lines,
             CASE WHEN CAST(ls.n_ellip AS DOUBLE) / ls.n_lines > 0.3
                  THEN 1 ELSE 0 END AS f_ellipsis_lines,
             CASE WHEN CAST(ws.n_alpha AS DOUBLE) / ws.n_words < 0.8
                  THEN 1 ELSE 0 END AS f_alpha_words,
             CASE WHEN ws.n_stop < 2 THEN 1 ELSE 0 END AS f_stopwords
      FROM ws JOIN ls USING (doc_id) JOIN sym USING (doc_id)
    ), unp AS (
      SELECT 'word_count' AS rule, f_word_count AS fail FROM feat
      UNION ALL SELECT 'mean_word_len', f_mean_word_len FROM feat
      UNION ALL SELECT 'symbol_ratio', f_symbol_ratio FROM feat
      UNION ALL SELECT 'bullet_lines', f_bullet_lines FROM feat
      UNION ALL SELECT 'ellipsis_lines', f_ellipsis_lines FROM feat
      UNION ALL SELECT 'alpha_words', f_alpha_words FROM feat
      UNION ALL SELECT 'stopwords', f_stopwords FROM feat
    )
    SELECT rule, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(fail) AS BIGINT) AS n_fail,
           round(100.0 * CAST(sum(fail) AS DOUBLE) / count(*), 6) AS fail_pct
    FROM unp GROUP BY 1
    """,
)
def x38_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, table A1 subset):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    bullet-line and ellipsis-line fractions, alphabetic-word fraction, and
    the minimum-stopword test — the de-facto baseline heuristic filter
    every web-scale corpus pass applies before model-based scoring. (The
    stopword set here is the testdata corpus's five most frequent terms —
    the synthetic vocabulary has no English function words; production
    swaps in the usual 'the/and/of/to/in' list.)
    Reports per-rule failure counts and rates over all documents with at
    least one token (the rule universe).

    Scale shape: one tokenize pass and one line-split pass collapse
    map-side into per-doc count features (two shuffles on doc_id, both
    with partial agg); the rule battery is then pure column arithmetic on
    the per-doc feature table, unpivoted into (rule, fail) pairs and
    reduced to 7 cells. All ratios are single divisions of exact integer
    counts — no order-sensitive double folds anywhere."""
    docs = _t(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    ws = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(F.length("tok")).alias("sum_len"),
        F.sum(F.when(F.col("tok").rlike("[A-Za-z]"), 1).otherwise(0)).alias(
            "n_alpha"
        ),
        F.count_distinct(
            F.when(
                F.lower("tok").isin("join", "hash", "row", "batch", "scan"),
                F.lower("tok"),
            )
        ).alias("n_stop"),
    )
    lines = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "\n")).alias("ln")
    )
    ls = lines.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(
            F.when(
                F.trim("ln").startswith("-") | F.trim("ln").startswith("*"), 1
            ).otherwise(0)
        ).alias("n_bullet"),
        F.sum(F.when(F.trim("ln").endswith("..."), 1).otherwise(0)).alias(
            "n_ellip"
        ),
    )
    sym = docs.select(
        "doc_id",
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))).alias(
            "n_hash"
        ),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("..."))))
            / 3
        ).alias("n_dots"),
    )
    mean_len = F.col("sum_len").cast("double") / F.col("n_words")
    feat = (
        ws.join(ls, "doc_id")
        .join(sym, "doc_id")
        .select(
            F.when((F.col("n_words") < 50) | (F.col("n_words") > 100000), 1)
            .otherwise(0)
            .alias("f_word_count"),
            F.when((mean_len < 3) | (mean_len > 10), 1)
            .otherwise(0)
            .alias("f_mean_word_len"),
            F.when(
                (F.col("n_hash") + F.col("n_dots")).cast("double")
                / F.col("n_words")
                > 0.1,
                1,
            )
            .otherwise(0)
            .alias("f_symbol_ratio"),
            F.when(
                F.col("n_bullet").cast("double") / F.col("n_lines") > 0.9, 1
            )
            .otherwise(0)
            .alias("f_bullet_lines"),
            F.when(
                F.col("n_ellip").cast("double") / F.col("n_lines") > 0.3, 1
            )
            .otherwise(0)
            .alias("f_ellipsis_lines"),
            F.when(
                F.col("n_alpha").cast("double") / F.col("n_words") < 0.8, 1
            )
            .otherwise(0)
            .alias("f_alpha_words"),
            F.when(F.col("n_stop") < 2, 1).otherwise(0).alias("f_stopwords"),
        )
    )
    unp = feat.select(
        F.expr(
            "stack(7, "
            "'word_count', f_word_count, "
            "'mean_word_len', f_mean_word_len, "
            "'symbol_ratio', f_symbol_ratio, "
            "'bullet_lines', f_bullet_lines, "
            "'ellipsis_lines', f_ellipsis_lines, "
            "'alpha_words', f_alpha_words, "
            "'stopwords', f_stopwords) AS (rule, fail)"
        )
    )
    return unp.groupBy("rule").agg(
        F.count("*").alias("n_docs"),
        F.sum("fail").cast("bigint").alias("n_fail"),
        F.round(
            F.lit(100.0) * F.sum("fail").cast("double") / F.count("*"), 6
        ).alias("fail_pct"),
    )


def _power_iter_sql(prev: str, k: int) -> str:
    """One unrolled power-iteration round (matvec into dim cells, then
    L2 normalize — as a window over the matvec subquery so each CTE is
    referenced exactly ONCE), matching
    ``operators/similarity.top_eigenvector`` numerically. The
    single-reference shape matters: a ``mat{{k}}`` CTE feeding both a
    separate norm CTE and the normalized vector doubles per round under
    CTE inlining — measured >10 min at sf0.01 in DuckDB (2⁸ plan
    copies) vs ~1 s for this linear chain."""
    return f"""
    v{k} AS (
      SELECT d, mw / sqrt(sum(mw * mw) OVER ()) AS w FROM (
        SELECT s.i AS d, sum(s.cov * v.w) AS mw
        FROM sym s JOIN {prev} v ON v.d = s.j
        GROUP BY 1
      )
    )"""


@query(
    "v13_top_eigenvector",
    f"""
    WITH {_COV_CTE},
    sym AS (
      SELECT i, j, cov FROM covu
      UNION ALL
      SELECT j AS i, i AS j, cov FROM covu WHERE i <> j
    ), v0 AS (
      SELECT DISTINCT i AS d, CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END AS w
      FROM covu
    ), {",".join(_power_iter_sql(f"v{k - 1}", k) for k in range(1, 9))},
    lam AS (
      SELECT sum(va.w * s.cov * vb.w) AS lam
      FROM sym s JOIN v8 va ON va.d = s.i JOIN v8 vb ON vb.d = s.j
    )
    SELECT v8.d AS i, round(v8.w, 6) + 0.0 AS w, round(lam.lam, 6) AS lam
    FROM v8 CROSS JOIN lam
    """,
)
def v13_top_eigenvector(spark: SparkSession, sf: str) -> DataFrame:
    """First principal component of the embedding space by power iteration
    (8 fixed rounds from e₀) over the v12 covariance cells → the 64 unit
    eigenvector weights plus the Rayleigh quotient λ (the variance
    captured by the returned direction — exact for whatever vector the
    fixed iteration count lands on). Distributed linear algebra as pure
    dataflow: together with v12 this is the whole PCA front-end — at
    production scale the driver never sees more than the dim²-cell matrix
    and the dim-row vector.

    Convergence is (λ₂/λ₁)^k: real embedding spaces have a dominant
    direction and converge in a handful of rounds; this synthetic
    testdata is near-isotropic (λ₂/λ₁ ≈ 0.99, measured), so 8 rounds
    reach ~97% of λ₁ — the honest behavior of the power method on a flat
    spectrum, which the Rayleigh output makes visible rather than hiding.

    Scale shape: the corpus reduces ONCE (covariance_cells); every matvec
    is a broadcast join of the 64-row vector against the 4096-cell
    symmetrized matrix with a grouped sum back into 64 cells; norms and λ
    fold in as 1-row broadcasts. Iteration count is fixed, so the whole
    computation — including the oracle's eight unrolled CTE rounds — is a
    deterministic replayable plan."""
    from .operators.similarity import covariance_cells, top_eigenvector

    cells = covariance_cells(_t(spark, sf, "embeddings"))
    ev = top_eigenvector(cells, iters=8)
    return ev.select(
        "i",
        (F.round("w", 6) + F.lit(0.0)).alias("w"),
        F.round("lam", 6).alias("lam"),
    )


@query(
    "x39_zipf_slope",
    f"""
    WITH freq AS (
      SELECT tok AS token, count(*) AS c FROM (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents)
      WHERE tok <> '' GROUP BY 1
    ), ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, token ASC) AS DOUBLE))
               AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM freq
      ORDER BY c DESC, token ASC
      LIMIT 1000
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_tokens,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM s
    """,
)
def x39_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit of the vocabulary: OLS slope of log-frequency vs
    log-rank over the top-1000 tokens — the rank-frequency diagnostic that
    pairs with Heaps' law (x25): natural text sits near slope −1, and a
    drifting slope flags boilerplate floods or template spam in a crawl
    slice.

    Scale shape: the corpus collapses to vocabulary-sized (token, count)
    cells in ONE partial-agg shuffle; the top-1000 cut is a
    TakeOrderedAndProject with a total tiebreak; the regression reduces
    1000 rows to five sufficient statistics in a single 1-row aggregate —
    closed-form OLS, no iterative fitting."""
    from .operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    freq = (
        docs.select(
            F.explode(F.split(normalized_text("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    ranked = (
        freq.orderBy(F.desc("c"), F.asc("token"))
        .limit(1000)
        .select(
            F.log(
                F.row_number()
                .over(Window.orderBy(F.desc("c"), F.asc("token")))
                .cast("double")
            ).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    s = ranked.groupBy().agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@query(
    "d12_triangle_count",
    """
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY 1
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), corner AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ), cnt AS (
      SELECT node, CAST(count(*) AS BIGINT) AS triangles
      FROM corner GROUP BY 1
    )
    SELECT c.node AS part_id, c.triangles, d.deg,
           round(2.0 * c.triangles / (d.deg * (d.deg - 1)), 6) AS clustering
    FROM cnt c JOIN deg d ON d.node = c.node
    ORDER BY c.triangles DESC, part_id ASC
    LIMIT 15
    """,
)
def d12_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the part
    co-purchase graph (parts bought together in one order): the top-15
    most triangle-embedded parts. Triangles are the community-density
    primitive — clustering coefficient separates genuinely cohesive
    neighborhoods from star-shaped hubs, the same diagnostic a near-dup
    cluster audit runs on the d5/d8 component graphs.

    Scale shape: `dedup.triangle_counts` runs the MR node-iterator++
    (Suri & Vassilvitskii WWW'11) — edges oriented from their
    lower-(degree, id) endpoint so a degree-d hub emits O(d) oriented
    edges rather than O(d²) wedges (the power-law skew killer), then
    exactly one wedge per triangle closes via an equi-join on the
    canonical closing edge: two id-only shuffles, no all-pairs product.
    The co-purchase edge list is built with ONE groupBy(orderkey)
    collect_set + in-row array self-pairing (sorted set ⇒ u<v for free)
    instead of a row-level self-join — a TPC-H order holds ≤7 parts, so
    the per-row pair expansion is ≤21 structs, replacing two join-side
    shuffles of the (order, part) table with a single grouped pass.
    Degrees ride along from the orientation pass (with_degree=True), not
    a second scan. The oracle is the independent a<b<c three-way
    self-join. Top-k is a TakeOrderedAndProject on a total order."""
    from .operators.dedup import triangle_counts

    edges = _copurchase_edges(spark, sf)
    tri = triangle_counts(edges, src="u", dst="v", canonical=True, with_degree=True)
    return (
        tri.select(
            F.col("node").alias("part_id"),
            "triangles",
            "deg",
            F.round(
                F.lit(2.0)
                * F.col("triangles")
                / (F.col("deg") * (F.col("deg") - F.lit(1))),
                6,
            ).alias("clustering"),
        )
        .orderBy(F.desc("triangles"), F.asc("part_id"))
        .limit(15)
    )


@query(
    "x40_priority_sample",
    f"""
    WITH pr AS (
      SELECT doc_id, n_chars,
             n_chars * 4294967296.0
               / (({_u32_sql("CAST(doc_id AS VARCHAR)")}) + 1.0) AS q
      FROM documents
    ), top21 AS (
      SELECT q FROM pr ORDER BY q DESC, doc_id ASC LIMIT 21
    ), tau AS (
      SELECT min(q) AS tau FROM top21
    ), top20 AS (
      SELECT doc_id, n_chars, q FROM pr ORDER BY q DESC, doc_id ASC LIMIT 20
    )
    SELECT t.doc_id, t.n_chars,
           CAST(floor(t.q) AS BIGINT) AS priority_floor,
           CAST(floor(greatest(CAST(t.n_chars AS DOUBLE), tau.tau)) AS BIGINT)
             AS est_weight_floor
    FROM top20 t CROSS JOIN tau
    """,
)
def x40_priority_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted sampling without replacement by PRIORITY SAMPLING
    (Duffield, Lund & Thorup, JACM 2007): each document draws priority
    q = w/u with weight w = n_chars and a deterministic uniform
    u = (u32+1)/2³² from md5(doc_id); the top-20 by priority are the
    sample, and each kept item carries the unbiased subset-sum estimator
    max(w, τ) with τ the 21st priority — the principled way to build a
    small weighted training subset whose token totals still estimate the
    corpus. Deterministic BY CONSTRUCTION — same sample on any cluster,
    any partitioning, any engine: the priority is a single IEEE division
    of exactly-representable integers (no ln/pow whose last-ulp behavior
    differs across libm implementations — why this uses DLT priority
    sampling rather than Efraimidis-Espirakis exponential keys), and the
    emitted columns are integer floors.

    Scale shape: priorities are map-side arithmetic on (doc_id, n_chars);
    both cutoffs are TakeOrderedAndProject top-k heaps (k=20/21) — no
    global sort, no window; τ folds back as a 1-row broadcast."""
    docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    pr = docs.select(
        "doc_id",
        "n_chars",
        (F.col("n_chars") * F.lit(4294967296.0) / (u32 + F.lit(1.0))).alias("q"),
    )
    top21 = pr.orderBy(F.desc("q"), F.asc("doc_id")).limit(21)
    tau = top21.groupBy().agg(F.min("q").alias("tau"))
    top20 = pr.orderBy(F.desc("q"), F.asc("doc_id")).limit(20)
    return top20.crossJoin(F.broadcast(tau)).select(
        "doc_id",
        "n_chars",
        F.floor("q").cast("bigint").alias("priority_floor"),
        F.floor(F.greatest(F.col("n_chars").cast("double"), F.col("tau")))
        .cast("bigint")
        .alias("est_weight_floor"),
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
    "x41_readability",
    r"""
    WITH f AS (
      SELECT source,
             len(regexp_extract_all(trim(text), '\S+')) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
      FROM documents
    ), agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_words) AS BIGINT) AS words,
             CAST(sum(n_sents) AS BIGINT) AS sents,
             CAST(sum(n_syll) AS BIGINT) AS sylls
      FROM f GROUP BY 1
    )
    SELECT source, n_docs, words, sents, sylls,
           round(206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
                        - 84.6 * (CAST(sylls AS DOUBLE) / words), 6) AS flesch
    FROM agg
    """,
)
def x41_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source Flesch reading-ease score — corpus-level readability
    from three exact integer counts per document (whitespace words,
    sentence-ending punctuation runs floored at 1, vowel-group syllable
    heuristic), aggregated to source totals before the classic
    206.835 − 1.015·(W/S) − 84.6·(Y/W) formula. The readability axis of
    the quality battery (x3 features, x7 filter, x38 Gopher rules):
    training-mix curation commonly buckets sources by reading level, and
    a source whose score drifts flags template or OCR junk. All counts
    are integers, so the per-source sums are exact and the two divisions
    round once each — engine-identical.

    Scale shape: three regexp counts map-side per document (no explode —
    the token lists never materialize into rows), ONE partial-agg shuffle
    into source cells; the formula is arithmetic on the aggregated row."""
    docs = _t(spark, sf, "documents")
    n_words = F.size(F.regexp_extract_all(F.trim(F.col("text")), F.lit(r"\S+"), 0))
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)), F.lit(1)
    )
    n_syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    agg = (
        docs.select(
            "source",
            n_words.alias("n_words"),
            n_sents.alias("n_sents"),
            n_syll.alias("n_syll"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("words"),
            F.sum("n_sents").alias("sents"),
            F.sum("n_syll").alias("sylls"),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sents",
        "sylls",
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (F.col("words").cast("double") / F.col("sents"))
            - F.lit(84.6) * (F.col("sylls").cast("double") / F.col("words")),
            6,
        ).alias("flesch"),
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
    from .operators.timeseries import decayed_mean

    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast(DEC)).cast("double").alias("v")
    )
    out = decayed_mean(daily, "event_type", "d", "v", half_life_days=7.0)
    return out.select(
        "event_type", F.col("d").cast("string").alias("day"), "decayed_mean"
    )


@query(
    "x42_ngram_novelty",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                       toks[i+4]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 4, 1))) t(i)
      WHERE length(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                             toks[i+4])) > 0
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
    ), novel AS (
      SELECT first_doc AS doc_id, count(*) AS n_novel FROM (
        SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1)
      GROUP BY 1
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p.n_sh) AS BIGINT) AS shingles_total,
           CAST(sum(coalesce(v.n_novel, 0)) AS BIGINT) AS shingles_novel,
           round(CAST(sum(coalesce(v.n_novel, 0)) AS DOUBLE)
                 / CAST(sum(p.n_sh) AS DOUBLE), 6) AS novelty
    FROM per_doc p
    JOIN documents d USING (doc_id)
    LEFT JOIN novel v USING (doc_id)
    GROUP BY 1
    """,
)
def x42_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source n-gram NOVELTY — the fraction of each source's 5-gram
    shingles that appear for the FIRST time (by doc_id order) in that
    document. The growth-curve diagnostic behind "is this crawl slice
    adding new text or re-serving what we already have?": sources full of
    templates or near-copies score low, fresh prose scores near 1. The
    first-seen attribution is the streaming-dedup admission rule (a doc
    "owns" the shingles it introduced) expressed as a batch query.

    Scale shape: the shingle stream reduces TWICE, never joins on string
    keys against itself — (1) groupBy(doc_id) for per-doc totals, (2)
    groupBy(shingle) with a min-combiner for first-seen, whose output
    re-aggregates by the winning doc. The only joins are id-keyed on
    doc-count-sized tables. All-integer sums, one rounded division."""
    from .operators.dedup import shingles

    docs = _t(spark, sf, "documents")
    sh = shingles(docs, n=5)
    per_doc = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    novel = (
        sh.groupBy("shingle")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_novel"))
    )
    joined = (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .join(novel, "doc_id", "left")
        .select(
            "source",
            "n_sh",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
        )
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_sh").alias("shingles_total"),
        F.sum("n_novel").alias("shingles_novel"),
        F.round(
            F.sum("n_novel").cast("double") / F.sum("n_sh").cast("double"), 6
        ).alias("novelty"),
    )


@query(
    "x43_dedup_impact",
    f"""
    WITH corpus AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, source, text
      FROM documents WHERE doc_id < 40
    ), marked AS (
      SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS n_tok,
             row_number() OVER (
               PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
      FROM corpus
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_removed,
           round(CAST(sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END) AS DOUBLE)
                 / CAST(sum(n_tok) AS DOUBLE), 6) AS pct_removed
    FROM marked GROUP BY 1
    """,
)
def x43_dedup_impact(spark: SparkSession, sf: str) -> DataFrame:
    """Token-weighted exact-dedup IMPACT report per source — what the
    keep-first rule actually saves: documents dropped, tokens dropped,
    and the share of each source's token mass that was duplicate. The
    number a curation run reports to justify its cost (doc counts
    undersell dedup when duplicates skew long). Planted verbatim copies
    (doc_id < 40 re-appended) make the report non-trivial at every SF.

    Scale shape: ONE window over content-hash groups (the
    ``distinct_documents`` rn=1 rule, so the report matches what the
    dedup pass would drop), ONE partial-agg shuffle to source cells;
    token counts are the x1 whitespace convention, all sums integer."""
    from .operators.dedup import content_hash
    from .operators.textan import token_count

    docs = _t(spark, sf, "documents").select("doc_id", "source", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 40).select(
            (F.col("doc_id") + 200000).alias("doc_id"), "source", "text"
        )
    )
    w = Window.partitionBy(content_hash("text")).orderBy("doc_id")
    marked = corpus.select(
        "source",
        token_count().alias("n_tok"),
        F.row_number().over(w).alias("rn"),
    )
    dup_tok = F.sum(F.when(F.col("rn") > 1, F.col("n_tok")).otherwise(F.lit(0)))
    return marked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("rn") > 1).cast("bigint")).alias("n_dup_docs"),
        F.sum("n_tok").alias("tokens_total"),
        dup_tok.alias("tokens_removed"),
        F.round(
            dup_tok.cast("double") / F.sum("n_tok").cast("double"), 6
        ).alias("pct_removed"),
    )


@query(
    "d13_cluster_profile",
    "WITH RECURSIVE "
    + _CC_CTES
    + """,
    sizes AS (
      SELECT cluster, count(*) AS sz FROM cc GROUP BY 1
    )
    SELECT CAST(sz AS BIGINT) AS size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY 1""",
)
def d13_cluster_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster SIZE PROFILE — the histogram you read before
    trusting a dedup pass: how many singletons (unique docs), how many
    pairs, and whether a mega-cluster is swallowing the corpus (the
    classic LSH-parameter failure mode: too-loose banding chains
    everything into one component, and only the size histogram shows
    it). Same planted-duplicate corpus and component labels as d5/d6.

    Scale shape: everything downstream of the components is metadata —
    groupBy(cluster) emits cluster-count rows, the histogram reduces
    those to distinct-size rows. The expensive part (MinHash → LSH →
    star-contraction components) is the already-audited d5 plan."""
    _, clusters = _cc_corpus_and_clusters(spark, sf)
    sizes = clusters.groupBy("cluster").agg(F.count("*").alias("size"))
    return sizes.groupBy("size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("size").alias("n_docs"),
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
    from .operators.asof import overlap_self_join

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


@query(
    "v14_cluster_quality",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), celldots AS (
      SELECT v.vec_id, s.vec_id AS cell_id,
             round(sum(v.x * s.x) / (any_value(nv.nrm) * any_value(ns.nrm)), 6)
               AS sim
      FROM flat v JOIN flat s ON s.i = v.i AND s.vec_id < 16
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN norms ns ON ns.vec_id = s.vec_id
      GROUP BY v.vec_id, s.vec_id
    ), assign AS (
      SELECT vec_id, cell_id, sim FROM celldots
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), cells AS (
      SELECT cell_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(1.0 - sim, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*) AS scatter
      FROM assign GROUP BY 1
    ), sep AS (
      SELECT vec_id AS ca, cell_id AS cb, 1.0 - sim AS d
      FROM celldots
      WHERE vec_id < 16 AND vec_id <> cell_id AND sim < 1.0
    )
    SELECT s.ca AS cell_id,
           any_value(ci.n) AS n,
           any_value(ci.scatter) AS scatter,
           max((ci.scatter + cj.scatter) / s.d) AS db_component
    FROM sep s
    JOIN cells ci ON ci.cell_id = s.ca
    JOIN cells cj ON cj.cell_id = s.cb
    GROUP BY 1
    """,
)
def v14_cluster_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Davies-Bouldin quality audit of the IVF coarse partitioning (the
    index-health counterpart to v3's retrieval and x30's recall audit):
    per cell, the member count, the scatter (mean cosine distance to the
    cell seed), and ``max_j (scatter_i + scatter_j) / d(seed_i, seed_j)``
    — high components flag cells that are loose AND close to a
    neighbor, exactly where IVF recall leaks. Same deterministic
    first-16 seeds as every IVF query, so the audit grades the index
    the retrieval queries actually use.

    Scale shape (``operators/similarity.cluster_quality``): ONE corpus
    pass — broadcast 1-row seed table assigns map-side, per-cell reduce
    emits K rows; the K×K separation grid and the DB max are K-row
    metadata joins. Scatter sums ride a DECIMAL grid (order-independent);
    the mean and DB ratios stay UNROUNDED — correctly-rounded IEEE ops on
    grid inputs are already engine-identical, while a final round(·,6)
    could land on an exact half-grid tie where rounding modes differ."""
    from .operators.similarity import cluster_quality

    emb = _t(spark, sf, "embeddings")
    return cluster_quality(emb, n_cells=16)


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


def _ivf_probe_sql(np: int) -> str:
    """Per-nprobe CTE chain for v15: probe the ``np`` nearest cells, pull
    cell members as candidates, rank their exact sims (from the shared
    ``qsims``) to top-3."""
    return f"""
    probes{np} AS (
      SELECT vec_id AS query_id, cell_id FROM celldots WHERE vec_id < 5
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) <= {np}
    ), cand{np} AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes{np} p JOIN assign a USING (cell_id)
      WHERE a.vec_id <> p.query_id
    ), ranked{np} AS (
      SELECT q.query_id, q.neighbor_id
      FROM qsims q JOIN cand{np} c
        ON c.query_id = q.query_id AND c.neighbor_id = q.neighbor_id
      QUALIFY row_number() OVER (
        PARTITION BY q.query_id ORDER BY q.sim DESC, q.neighbor_id ASC) <= 3
    )"""


@query(
    "v15_recall_curve",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), celldots AS (
      SELECT v.vec_id, s.vec_id AS cell_id,
             round(sum(v.x * s.x) / (any_value(nv.nrm) * any_value(ns.nrm)), 6)
               AS sim
      FROM flat v JOIN flat s ON s.i = v.i AND s.vec_id < 16
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN norms ns ON ns.vec_id = s.vec_id
      GROUP BY v.vec_id, s.vec_id
    ), assign AS (
      SELECT vec_id, cell_id FROM celldots
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), qsims AS (
      SELECT fa.vec_id AS query_id, fb.vec_id AS neighbor_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)),
                   6) AS sim
      FROM flat fa
      JOIN flat fb ON fb.i = fa.i AND fb.vec_id <> fa.vec_id
      JOIN norms na ON na.vec_id = fa.vec_id
      JOIN norms nb ON nb.vec_id = fb.vec_id
      WHERE fa.vec_id < 5
      GROUP BY 1, 2
    ), truth AS (
      SELECT query_id, neighbor_id FROM qsims
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) <= 3
    ), """
    + ", ".join(_ivf_probe_sql(np) for np in (1, 2, 4))
    + """,
    unioned AS (
      SELECT 1 AS nprobe, * FROM ranked1
      UNION ALL SELECT 2, * FROM ranked2
      UNION ALL SELECT 4, * FROM ranked4
    )
    SELECT CAST(u.nprobe AS BIGINT) AS nprobe,
           CAST(count(*) AS BIGINT) AS n_returned,
           CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / 15.0 AS recall
    FROM unioned u
    LEFT JOIN truth t
      ON t.query_id = u.query_id AND t.neighbor_id = u.neighbor_id
    GROUP BY 1
    """,
)
def v15_recall_curve(spark: SparkSession, sf: str) -> DataFrame:
    """IVF recall-vs-nprobe TUNING CURVE — recall@3 of the v3 index at
    nprobe ∈ {1, 2, 4} against the exact brute-force top-3 (v1), in one
    query. The dial every IVF deployment turns (probe more cells → more
    recall, linearly more scan): this emits the measured curve so the
    operator picks nprobe from data instead of folklore, and a recall
    cliff at low nprobe flags a bad coarse quantizer (cross-check v14's
    scatter/DB audit of the same cells).

    Scale shape: ONE index pass for all three settings
    (``similarity.ivf_topk_curve``) — probed cells nest, so the corpus
    assign, candidate join, and exact rerank run once at nprobe=4 and
    each setting slices by probe rank (three separate ``ivf_topk`` calls
    re-assigned the corpus per setting: 4.6 s → 2.9 s at sf0.1). The
    exact side is corpus × 5 broadcast queries (the audited v1 shape,
    linear in corpus). The recall join keys on (query, neighbor) id
    pairs — 45 rows against 15. Denominator is the fixed truth size
    5 queries × k=3 (corpus always holds ≥3 neighbors), so recall is an
    exact integer/constant division."""
    from .operators.similarity import cosine_topk, ivf_topk_curve

    emb = _t(spark, sf, "embeddings")
    queries5 = emb.filter(F.col("vec_id") < 5)
    truth = cosine_topk(emb, queries5, k=3).select("query_id", "neighbor_id")
    curves = ivf_topk_curve(
        emb, queries5, k=3, n_cells=16, nprobes=(1, 2, 4)
    ).select("nprobe", "query_id", "neighbor_id")
    hit = F.when(F.col("t_q").isNotNull(), 1).otherwise(0)
    joined = curves.join(
        truth.select(
            F.col("query_id").alias("t_q"), F.col("neighbor_id").alias("t_n")
        ),
        (F.col("query_id") == F.col("t_q"))
        & (F.col("neighbor_id") == F.col("t_n")),
        "left",
    )
    return joined.groupBy("nprobe").agg(
        F.count("*").alias("n_returned"),
        F.sum(hit).cast("bigint").alias("n_hits"),
        (F.sum(hit).cast("double") / F.lit(15.0)).alias("recall"),
    )


@query(
    "x44_burstiness",
    f"""
    WITH tok AS (
      SELECT doc_id, tok AS token FROM (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
        FROM documents)
      WHERE tok <> ''
    ), per_doc AS (
      SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2
    ), terms AS (
      SELECT token, CAST(sum(c) AS BIGINT) AS tf,
             CAST(count(*) AS BIGINT) AS df
      FROM per_doc GROUP BY 1
      ORDER BY df DESC, token ASC LIMIT 50
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM tok
    )
    SELECT token, tf, df,
           CAST(tf AS DOUBLE) / df AS burstiness,
           round((CAST(tf AS DOUBLE) / n_docs)
                 / (1.0 - exp(-(CAST(tf AS DOUBLE) / n_docs))), 6)
             AS poisson_expected
    FROM terms CROSS JOIN n
    """,
)
def x44_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Term BURSTINESS (Church & Gale): for the 50 highest-document-
    frequency terms, the observed mean occurrences per containing
    document (tf/df) against the zero-truncated-Poisson expectation
    under an even scatter of the same tf. Content words burst (tf/df ≫
    expected), function words don't — and a "function-looking" token
    that bursts is boilerplate (navigation text, templates) the
    quality filters should see. Complements x24 (boilerplate n-grams)
    and x39 (Zipf slope) on the vocabulary-diagnostics axis.

    Scale shape: one (token, doc) partial-agg shuffle, one token reduce,
    a top-50 TakeOrderedAndProject with total tiebreak; the corpus doc
    count rides in as a 1-row broadcast (the x11 shape). tf/df is an
    exact integer division (deterministic unrounded); only the Poisson
    term goes through exp() and rounds."""
    from .operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(normalized_text("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    per_doc = tok.groupBy("token", "doc_id").agg(F.count("*").alias("c"))
    terms = (
        per_doc.groupBy("token")
        .agg(F.sum("c").alias("tf"), F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(50)
    )
    n = tok.groupBy().agg(F.countDistinct("doc_id").alias("n_docs"))
    lam = F.col("tf").cast("double") / F.col("n_docs")
    return terms.crossJoin(F.broadcast(n)).select(
        "token",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df")).alias("burstiness"),
        F.round(lam / (F.lit(1.0) - F.exp(-lam)), 6).alias("poisson_expected"),
    )


@query(
    "d14_cross_source_dup",
    f"""
    WITH corpus AS (
      SELECT source, {_NORM_SQL} AS norm FROM documents
      UNION ALL
      SELECT 'mirrorA' AS source, {_NORM_SQL} AS norm
      FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT 'mirrorB' AS source, {_NORM_SQL} AS norm
      FROM documents WHERE doc_id % 10 = 0
    ), hs AS (
      SELECT DISTINCT md5(norm) AS h, source FROM corpus
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def d14_cross_source_dup(spark: SparkSession, sf: str) -> DataFrame:
    """CROSS-SOURCE duplication matrix — which feeds copy which: for every
    source pair, the number of distinct normalized documents they share.
    The crawl-triage view exact dedup alone doesn't give you (per-doc
    drops say *that* mass is duplicated, not *where it flows from*); a
    hot (A, B) cell means feed B is a mirror of A and can be dropped at
    ingest instead of deduplicated after. Two planted mirror feeds
    (every 4th / every 10th document) keep the matrix non-trivial and
    give the mirrors a known shared row (ids divisible by 20).

    Scale shape: documents collapse to DISTINCT (content-hash, source)
    rows first — the join side is bounded by corpus hashes × sources
    carrying them, and the self-join is an equi join on the hash with
    per-hash fan-out = sources-carrying-that-doc (a handful), never
    doc-count. One distinct shuffle, one hash equi join, one pair agg."""
    from .operators.dedup import content_hash

    docs = _t(spark, sf, "documents")
    corpus = docs.select("source", "text").unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            F.lit("mirrorA").alias("source"), "text"
        )
    ).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            F.lit("mirrorB").alias("source"), "text"
        )
    )
    hs = corpus.select(content_hash("text").alias("h"), "source").distinct()
    a = hs.select(F.col("h"), F.col("source").alias("source_a"))
    b = hs.select(F.col("h").alias("h_b"), F.col("source").alias("source_b"))
    return (
        a.join(
            b,
            (F.col("h") == F.col("h_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )


@query(
    "x45_code_detection",
    """
    WITH corpus AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT source,
             'def f_' || doc_id || '(x):' || chr(10) ||
             '    y = (x * ' || doc_id || ');' || chr(10) ||
             '    return y + ' || doc_id AS text
      FROM documents WHERE doc_id < 30
    ), f AS (
      SELECT source,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[{}()=;:]', '', 'g'))
               AS n_sym,
             len(string_split(text, chr(10))) AS n_lines,
             len(list_filter(string_split(text, chr(10)),
                             x -> regexp_matches(x, '^(  |\t)'))) AS n_indent
      FROM corpus
    ), scored AS (
      SELECT source, n_chars, n_sym,
             CASE WHEN CAST(n_sym AS DOUBLE) / n_chars > 0.03
                    OR CAST(n_indent AS DOUBLE) / n_lines > 0.2
                  THEN 1 ELSE 0 END AS is_code
      FROM f
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_code) AS BIGINT) AS n_code,
           CAST(sum(is_code) AS DOUBLE) / count(*) AS code_frac,
           CAST(sum(n_sym) AS DOUBLE) / sum(n_chars) AS symbol_density
    FROM scored GROUP BY 1
    """,
)
def x45_code_detection(spark: SparkSession, sf: str) -> DataFrame:
    """CODE-vs-PROSE detection per source — the mix signal a training-data
    pipeline needs before routing documents to code or text tokenizers:
    symbol density ([{}()=;:] chars per char) and indented-line fraction,
    thresholded exactly like a fastText-less CommonCrawl heuristic.
    Planted code snippets (30 deterministic python-shaped docs) give the
    detector known positives; natural prose stays below both thresholds.

    Scale shape: the features are TWO regexp counts and a line-split
    filter per document, all map-side; ONE partial-agg shuffle into
    source cells. Aggregate densities divide exact integer sums
    (deterministic unrounded IEEE divisions), never averaging per-doc
    doubles."""
    docs = _t(spark, sf, "documents")
    planted = docs.filter(F.col("doc_id") < 30).select(
        "source",
        F.concat(
            F.lit("def f_"), F.col("doc_id"), F.lit("(x):\n"),
            F.lit("    y = (x * "), F.col("doc_id"), F.lit(");\n"),
            F.lit("    return y + "), F.col("doc_id"),
        ).alias("text"),
    )
    corpus = docs.select("source", "text").unionByName(planted)
    n_chars = F.length("text")
    n_sym = n_chars - F.length(F.regexp_replace("text", r"[{}()=;:]", ""))
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    n_indent = F.size(F.filter(lines, lambda x: x.rlike(r"^(  |\t)")))
    is_code = (
        (n_sym.cast("double") / n_chars > 0.03)
        | (n_indent.cast("double") / n_lines > 0.2)
    ).cast("int")
    scored = corpus.select(
        "source",
        n_chars.alias("n_chars"),
        n_sym.alias("n_sym"),
        is_code.alias("is_code"),
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("is_code").alias("n_code"),
        (F.sum("is_code").cast("double") / F.count("*")).alias("code_frac"),
        (F.sum("n_sym").cast("double") / F.sum("n_chars")).alias(
            "symbol_density"
        ),
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


def _bands_sql_cfg(bands: int, rpb: int) -> str:
    """Band rows for an arbitrary (bands × rows_per_band) split of the
    16-hash signature — the parametric form of ``_BANDS_SQL``."""
    return " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, md5(concat_ws('|', "
        + ", ".join(f"m{rpb * b + r}" for r in range(rpb))
        + ")) AS band_hash FROM sigs"
        for b in range(bands)
    )


def _lsh_cfg_sql(bands: int, rpb: int) -> str:
    """Per-config CTE chain for d15: banded rows → candidate pairs →
    confusion counts vs the shared ``truth``."""
    tag = f"{bands}x{rpb}"
    return f"""
    banded{tag} AS ({_bands_sql_cfg(bands, rpb)}),
    pred{tag} AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded{tag} a JOIN banded{tag} b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), stats{tag} AS (
      SELECT CAST({bands} AS BIGINT) AS bands,
             CAST({rpb} AS BIGINT) AS rows_per_band,
             CAST(sum(in_pred) AS BIGINT) AS n_candidates,
             CAST(sum(in_pred * in_truth) AS BIGINT) AS tp,
             CAST(sum(in_pred * (1 - in_truth)) AS BIGINT) AS fp,
             CAST(sum((1 - in_pred) * in_truth) AS BIGINT) AS fn,
             round(CAST(sum(in_pred * in_truth) AS DOUBLE)
                   / greatest(sum(in_pred), 1), 6) AS precision_,
             round(CAST(sum(in_pred * in_truth) AS DOUBLE)
                   / greatest(sum(in_truth), 1), 6) AS recall
      FROM (
        SELECT CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_pred,
               CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_truth
        FROM pred{tag} p FULL OUTER JOIN truth t
          ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
      )
    )"""


@query(
    "d15_lsh_band_tuning",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), sigs AS (
      SELECT doc_id,
           {{minhash}}
      FROM sh GROUP BY doc_id
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), truth AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.5
    ),
    {{cfg1}},
    {{cfg2}},
    {{cfg3}}
    SELECT * FROM stats2x8
    UNION ALL SELECT * FROM stats4x4
    UNION ALL SELECT * FROM stats8x2
    """.format(
        minhash=_MINHASH_AGGS_SQL,
        cfg1=_lsh_cfg_sql(2, 8),
        cfg2=_lsh_cfg_sql(4, 4),
        cfg3=_lsh_cfg_sql(8, 2),
    ),
)
def d15_lsh_band_tuning(spark: SparkSession, sf: str) -> DataFrame:
    """LSH banding TUNING CURVE — precision/recall of the MinHash
    candidate generator at three splits of the same 16-hash signature
    (2×8 strict … 8×2 loose) against exact-Jaccard≥0.5 truth. The dedup
    twin of v15's recall-vs-nprobe curve: banding theory says collision
    probability is 1−(1−J^r)^b, and this measures where each config's
    cliff actually lands on the corpus at hand, so the dedup pass picks
    (b, r) from data. x30 audits ONE config; this emits the curve.

    Scale shape: ONE signature build (the d2 plan) feeds all three
    configs — banding is a projection of the signature array, candidates
    are band equi-joins, and each config's confusion counts come from a
    full-outer join of two metadata-sized pair lists against the shared
    exact-truth side (posting-list join, corpus-bounded by construction
    here; sampled slice at scale)."""
    from .operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    sh = shingles(corpus, n=3)
    sigs = minhash_signatures(sh, num_hashes=16, token_col="shingle")
    truth = (
        jaccard_pairs(sh, threshold=0.5, token_col="shingle", max_token_df=None)
        .select("doc_a", "doc_b")
        .withColumn("in_truth", F.lit(1))
    )
    out = None
    for bands, rpb in ((2, 8), (4, 4), (8, 2)):
        pred = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rpb).withColumn(
            "in_pred", F.lit(1)
        )
        joined = pred.join(truth, ["doc_a", "doc_b"], "full_outer").select(
            F.coalesce("in_pred", F.lit(0)).alias("in_pred"),
            F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
        )
        tp = F.sum(F.col("in_pred") * F.col("in_truth"))
        stats = joined.groupBy().agg(
            F.lit(bands).cast("bigint").alias("bands"),
            F.lit(rpb).cast("bigint").alias("rows_per_band"),
            F.sum("in_pred").cast("bigint").alias("n_candidates"),
            tp.cast("bigint").alias("tp"),
            F.sum(F.col("in_pred") * (1 - F.col("in_truth")))
            .cast("bigint")
            .alias("fp"),
            F.sum((1 - F.col("in_pred")) * F.col("in_truth"))
            .cast("bigint")
            .alias("fn"),
            F.round(
                tp.cast("double") / F.greatest(F.sum("in_pred"), F.lit(1)), 6
            ).alias("precision_"),
            F.round(
                tp.cast("double") / F.greatest(F.sum("in_truth"), F.lit(1)), 6
            ).alias("recall"),
        )
        out = stats if out is None else out.unionByName(stats)
    return out


@query(
    "p11_json_schema_profile",
    """
    WITH base AS (
      SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
             CAST(floor(value) AS BIGINT) AS v_int,
             value > 50 AS has_v,
             event_type, user_id,
             count(*) OVER () AS total
      FROM events
    ), kv AS (
      SELECT 'k' AS key, CAST(k_val AS VARCHAR) AS val, total FROM base
      UNION ALL
      SELECT 'v', CAST(v_int AS VARCHAR), total FROM base WHERE has_v
      UNION ALL
      SELECT 't', event_type, total FROM base WHERE event_type <> 'click'
      UNION ALL
      SELECT 'u', CAST(user_id % 100 AS VARCHAR), total
      FROM base WHERE user_id % 3 = 0
    )
    SELECT key,
           CAST(count(*) AS BIGINT) AS n_present,
           round(CAST(count(*) AS DOUBLE) / any_value(total), 6) AS fill_rate,
           CAST(count(DISTINCT val) AS BIGINT) AS n_distinct_vals
    FROM kv GROUP BY 1
    """,
)
def p11_json_schema_profile(spark: SparkSession, sf: str) -> DataFrame:
    """JSON SCHEMA-ON-READ PROFILING — the drift detector for
    semi-structured payload columns: per key, how often it appears
    (fill rate) and how many distinct values it takes. The reference
    stores raw RPC JSON and extracts known paths (P4); a pipeline
    ingesting third-party JSON needs the inverse — "what keys are
    actually in here, and did the producer change schema mid-stream?"
    The events table's ``props`` is single-key, so the profiled column
    is a deterministic enrichment (conditional integer/string fields),
    and the ENGINE side must discover its keys generically.

    Engine path: build the JSON with ``to_json(struct(...))`` (null
    fields dropped), rediscover it with ``from_json`` to
    ``map<string,string>`` and ONE map explode — no per-key literal
    paths, so unknown producer keys profile identically. The oracle
    derives the same profile from the construction conditions directly —
    an independent route to the same counts. All values are integers or
    categorical strings (no float rendering drift across engines).

    Scale shape: one generate + one partial-agg shuffle into key cells;
    the distinct-count rides the same shuffle ((key, val) pre-aggregate);
    the event total folds in as a window over the 4-row profile, not a
    second corpus pass."""
    ev = _t(spark, sf, "events")
    props2 = F.to_json(
        F.struct(
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            F.when(
                F.col("value") > 50, F.floor("value").cast("bigint")
            ).alias("v"),
            F.when(
                F.col("event_type") != "click", F.col("event_type")
            ).alias("t"),
            F.when(
                F.col("user_id") % 3 == 0, F.col("user_id") % 100
            ).alias("u"),
        )
    )
    kv = (
        ev.select(F.explode(F.from_json(props2, "map<string,string>")).alias("key", "val"))
    )
    nn = ev.groupBy().agg(F.count("*").alias("total"))
    return (
        kv.groupBy("key")
        .agg(
            F.count("*").alias("n_present"),
            F.countDistinct("val").alias("n_distinct_vals"),
        )
        .crossJoin(F.broadcast(nn))
        .select(
            "key",
            "n_present",
            F.round(F.col("n_present") / F.col("total"), 6).alias("fill_rate"),
            "n_distinct_vals",
        )
    )


def _copurchase_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical (u < v, distinct) part co-purchase edges, materialized.

    One groupBy(orderkey) collect_set + in-row sorted-array self-pairing
    (a TPC-H order holds ≤7 parts ⇒ ≤21 pair structs per row) — one
    grouped shuffle + the dedup shuffle, instead of a two-sided row
    self-join on orderkey. Shared by the graph analytics (d12, d16)."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    return (
        g.select(F.explode(pair_structs).alias("e"))
        .select("e.u", "e.v")
        .distinct()
        .transform(reliable_checkpoint)
    )


@query(
    "d16_degree_assortativity",
    """
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY 1
    ), ends AS (
      SELECT du.deg AS dx, dv.deg AS dy
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.deg AS dx, du.deg AS dy
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           (SELECT round(avg(deg), 6) FROM deg) AS avg_deg,
           round(corr(dx, dy), 6) AS assortativity
    FROM ends
    """,
)
def d16_degree_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph — the Pearson
    correlation of endpoint degrees over the symmetrized edge-end list
    (Newman 2002). The structural dial a dedup/similarity-graph audit
    reads before trusting component shapes: assortative graphs (hubs
    link hubs) concentrate near-dup mass into dense cores that keep-one
    dedup prunes aggressively, while disassortative hub-leaf stars are
    the template/boilerplate signature (one hub document with thousands
    of light variants).

    Scale shape: edges from `_copurchase_edges` (grouped pair expansion,
    no row self-join); degrees are one explode+groupBy over the
    materialized edges; the corr() is a single agg over the 2m edge-end
    rows with the three scalar corpus stats (node count, edge count,
    mean degree) folded back as 1-row broadcasts — no driver-side math.
    The degree table is node-count-scaled (grows with the corpus), so its
    broadcast is GUARDED by the same measured-count + bytes-budget
    decision `triangle_counts` uses (`operators/dedup.maybe_broadcast`):
    under the budget the hint saves two shuffles, above it the join is a
    plain equi-join AQE plans from runtime stats — never a forced
    driver-memory broadcast of a corpus-scaled frame.
    The oracle recomputes everything from the raw a<b self-join CTE.

    Determinism: corr/avg over exact integer degrees; round(·, 6) after
    the one transcendental-free division chain both engines execute in
    IEEE doubles."""
    from .operators.dedup import maybe_broadcast

    edges = _copurchase_edges(spark, sf)
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .transform(reliable_checkpoint)
    )
    n_nodes_ct = deg.count()  # measured on the materialized checkpoint
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    du = maybe_broadcast(du, n_nodes_ct, 32)
    dv = maybe_broadcast(dv, n_nodes_ct, 32)
    j = edges.join(du, "u").join(dv, "v")
    ends = j.select(
        F.col("deg_u").alias("dx"), F.col("deg_v").alias("dy")
    ).unionByName(j.select(F.col("deg_v").alias("dx"), F.col("deg_u").alias("dy")))
    node_stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.round(F.avg("deg"), 6).alias("avg_deg"),
    )
    edge_total = edges.agg(F.count("*").alias("n_edges"))
    assort = ends.agg(F.round(F.corr("dx", "dy"), 6).alias("assortativity"))
    return (
        node_stats.crossJoin(F.broadcast(edge_total))
        .crossJoin(F.broadcast(assort))
        .select("n_nodes", "n_edges", "avg_deg", "assortativity")
    )


@query(
    "x46_mad_outliers",
    """
    WITH t AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
      FROM documents
    ), med AS (
      SELECT source, median(n) AS med FROM t GROUP BY 1
    ), mad AS (
      SELECT t.source, median(abs(t.n - med.med)) AS mad
      FROM t JOIN med USING (source) GROUP BY 1
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(any_value(med.med), 6) AS med_tokens,
           round(any_value(mad.mad), 6) AS mad_tokens,
           CAST(sum(CASE WHEN abs(t.n - med.med) > 3 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM t JOIN med USING (source) JOIN mad USING (source)
    GROUP BY t.source
    ORDER BY t.source
    """,
)
def x46_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust per-source length-outlier audit: median and MAD (median
    absolute deviation) of whitespace token counts, plus how many docs
    sit beyond the 3×MAD fence. The robust replacement for mean/σ
    outlier screens in curation — one pathological 10M-token document
    drags a mean fence wide open but moves the median fence not at all
    (the same reasoning that picked rolling quantiles over rolling means
    in w9).

    Determinism: token counts are exact integers; both engines implement
    the same interpolating median (position 0.5·(n−1) on the sorted
    values), so med/MAD agree bit-for-bit, and the 3×MAD comparison is
    exact-integer vs a small dyadic product.

    Scale shape: two grouped exact percentiles (per-source median, then
    median of |x−med| after a broadcast join of the K-row median table)
    and one final grouped agg — three shuffles of source-keyed rows, no
    corpus sort, no window over the corpus.

    Memory invariant (load-bearing — do not relax): ``F.percentile`` is
    the EXACT percentile, whose aggregation buffer is a per-group map of
    DISTINCT VALUE → count. That is safe here only because the input is
    an INTEGER token count: distinct values are bounded by the longest
    document's token count (thousands), not by group size, so the buffer
    stays KB-scale per source no matter how many billions of docs a
    source holds. Feeding a continuous column (a float quality score,
    a ratio) through this shape would grow the buffer linearly with
    group size and OOM the executor at 100 TB — switch to
    ``percentile_approx`` (fixed-size QuantileSummaries sketch) if this
    audit is ever generalized to non-integer inputs. The integer-input
    contract is pinned by ``tests/test_llm_ops.py::
    test_x46_percentile_integer_input_contract``."""
    from .operators.textan import token_count

    t = _t(spark, sf, "documents").select(
        "doc_id", "source", token_count().alias("n")
    )
    med = t.groupBy("source").agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    t2 = t.join(F.broadcast(med), "source")
    mad = t2.groupBy("source").agg(
        F.percentile(F.abs(F.col("n") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    j = t2.join(F.broadcast(mad), "source")
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.first("med"), 6).alias("med_tokens"),
            F.round(F.first("mad"), 6).alias("mad_tokens"),
            F.sum(
                F.when(
                    F.abs(F.col("n") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("source")
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
    "x47_ndcg_audit",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), xdots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 5
      GROUP BY 1, 2
    ), xsims AS (
      SELECT query_id, neighbor_id,
             round(dot / (na.nrm * nb.nrm), 6) AS sim
      FROM xdots JOIN norms na ON na.vec_id = query_id
                 JOIN norms nb ON nb.vec_id = neighbor_id
    ), xrank10 AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS rank_exact
      FROM xsims
      QUALIFY rank_exact <= 10
    ), celldots AS (
      SELECT v.vec_id, s.vec_id AS cell_id,
             round(sum(v.x * s.x) / (any_value(nv.nrm) * any_value(ns.nrm)), 6)
               AS sim
      FROM flat v JOIN flat s ON s.i = v.i AND s.vec_id < 16
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN norms ns ON ns.vec_id = s.vec_id
      GROUP BY v.vec_id, s.vec_id
    ), assign AS (
      SELECT vec_id, cell_id FROM celldots
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), probes AS (
      SELECT vec_id AS query_id, cell_id FROM celldots WHERE vec_id < 5
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) <= 2
    ), cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a USING (cell_id)
      WHERE a.vec_id <> p.query_id
    ), isims AS (
      SELECT c.query_id, c.neighbor_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM cand c
      JOIN flat fa ON fa.vec_id = c.query_id
      JOIN flat fb ON fb.vec_id = c.neighbor_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = c.query_id
      JOIN norms nb ON nb.vec_id = c.neighbor_id
      GROUP BY 1, 2
    ), ivf10 AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS rank
      FROM isims
      QUALIFY rank <= 10
    ), gains AS (
      SELECT i.query_id, i.rank,
             COALESCE(11 - x.rank_exact, 0) AS rel
      FROM ivf10 i LEFT JOIN xrank10 x
        ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
    ), idcg AS (
      SELECT sum((11 - g.i) / log2(g.i + 1)) AS v FROM range(1, 11) g(i)
    )
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS n_ranked,
           CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_at_10,
           round(sum(rel / log2(rank + 1)), 6) AS dcg,
           round(sum(rel / log2(rank + 1)) / (SELECT v FROM idcg), 6) AS ndcg
    FROM gains GROUP BY query_id ORDER BY query_id
    """,
)
def x47_ndcg_audit(spark: SparkSession, sf: str) -> DataFrame:
    """nDCG@10 of the IVF-flat retrieval against exact cosine ground truth
    — the GRADED ranking-quality audit beside x30's set-level recall: a
    candidate list can hit 9/10 of the true neighbors and still be badly
    ordered; position-discounted gain is what an embedding-dedup or
    RAG-retrieval gate actually cares about. Relevance of a returned
    neighbor is its exact-cosine rank folded to an integer gain
    (rel = 11 − rank_exact inside the true top-10, else 0), IDCG is the
    perfect-ordering constant, so ndcg = 1.0 iff IVF returns the exact
    top-10 in exact order.

    Determinism: both rankings order by round(sim, 6) with neighbor-id
    tiebreaks (v1/v3's rule); gains are exact integers; the only floats
    are log2 discounts and one division, rounded to 6.

    Scale shape: reuses the v1 broadcast-query exact side (5 query rows
    against the corpus, never corpus×corpus) and the v3 IVF side
    (broadcast 16-row seed, cell-id equi-join candidates); the audit join
    is top-10×top-10 per query — metadata-sized."""
    import math

    from .operators.similarity import cosine_topk, ivf_topk

    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") < 5)
    ex10 = cosine_topk(emb, qv, k=10, dim=64).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank_exact")
    )
    iv10 = ivf_topk(emb, qv, k=10, n_cells=16, nprobe=2, dim=64).select(
        "query_id", "neighbor_id", "rank"
    )
    rel = F.coalesce(F.lit(11) - F.col("rank_exact"), F.lit(0))
    disc = rel / F.log2(F.col("rank") + F.lit(1))
    idcg = sum((11 - i) / math.log2(i + 1) for i in range(1, 11))
    return (
        iv10.join(ex10, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_ranked"),
            F.sum((rel > 0).cast("int")).cast("long").alias("hits_at_10"),
            F.round(F.sum(disc), 6).alias("dcg"),
            F.round(F.sum(disc) / F.lit(idcg), 6).alias("ndcg"),
        )
        .orderBy("query_id")
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
    "x48_winnowing_fingerprints",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), sized AS (
      SELECT doc_id, toks, len(toks) AS n_toks FROM norm WHERE len(toks) >= 5
    ), grams AS (
      SELECT doc_id, p.g AS p,
             md5(array_to_string(list_slice(toks, p.g, p.g + 4), ' ')) AS h,
             n_toks - 4 AS n_grams
      FROM sized, unnest(generate_series(1, n_toks - 4)) p(g)
    ), fps AS (
      SELECT doc_id, n_grams,
             min(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             p
      FROM grams
      QUALIFY p <= n_grams - 3
    ), docfp AS (
      SELECT DISTINCT doc_id, n_grams, fp FROM fps
    ), df AS (
      SELECT fp, count(DISTINCT doc_id) AS df FROM docfp GROUP BY fp
    )
    SELECT d.doc_id,
           CAST(any_value(d.n_grams) AS BIGINT) AS n_kgrams,
           CAST(count(*) AS BIGINT) AS n_fps,
           round(count(*) / any_value(d.n_grams), 6) AS fp_density,
           CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_fps
    FROM docfp d JOIN df USING (fp)
    GROUP BY d.doc_id
    """,
)
def x48_winnowing_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    the MOSS algorithm): hash every 5-token k-gram, then keep the MINIMUM
    hash of each sliding 4-gram window. Guarantees: any shared run of
    ≥ 8 tokens between two documents shares at least one fingerprint
    (detection floor), while storage is ~2/(w+1) of all k-gram hashes —
    the position-robust middle ground between x4's whole-doc fingerprint
    (breaks on one edit) and x32's fixed 12-token segments (break on
    alignment shifts). Output per document: k-gram count, distinct
    fingerprints kept, density, and how many of its fingerprints appear
    in ≥ 2 documents (the cross-doc overlap signal a plagiarism/near-dup
    triage ranks by).

    Portability: the k-gram hash is md5 over the joined tokens (hex
    strings order identically everywhere); window-min over strings and
    integer-division density are engine-agnostic, so the DuckDB oracle
    replays bit-for-bit.

    Scale shape: k-gram hashing is one posexplode over token positions
    (whole-stage codegen — no interpreted higher-order lambdas in the
    hot path); the window min is partitioned BY DOCUMENT and ordered by
    position, so its state is one doc's grams (never a corpus sort); the
    only corpus-wide shuffles are the distinct-fingerprint reduce and the
    document-frequency groupBy — both on fingerprint keys, both
    map-side-combinable. At 100 TB the fingerprint store is ~0.4 of the
    k-gram count and joins back by key; nothing is all-pairs."""
    K, W = 5, 4
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    sized = (
        _t(spark, sf, "documents")
        .select("doc_id", toks.alias("toks"))
        .withColumn("n_toks", F.size("toks"))
        .filter(F.col("n_toks") >= K)
        .withColumn("n_grams", F.col("n_toks") - (K - 1))
    )
    grams = (
        sized.select(
            "doc_id",
            "n_grams",
            "toks",
            F.explode(F.sequence(F.lit(1), F.col("n_grams"))).alias("p"),
        )
        .select(
            "doc_id",
            "n_grams",
            "p",
            F.md5(F.array_join(F.slice(F.col("toks"), F.col("p"), K), " "))
            .alias("h"),
        )
    )
    wmin = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, W - 1)
    fps = (
        grams.withColumn("fp", F.min("h").over(wmin))
        .filter(F.col("p") <= F.col("n_grams") - (W - 1))
        .select("doc_id", "n_grams", "fp")
        .distinct()
    )
    df_tbl = fps.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        fps.join(df_tbl, "fp")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").cast("long").alias("n_kgrams"),
            F.count("*").cast("long").alias("n_fps"),
            F.round(F.count("*") / F.first("n_grams"), 6).alias("fp_density"),
            F.sum((F.col("df") >= 2).cast("int")).cast("long")
            .alias("n_shared_fps"),
        )
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
    "x49_lexical_diversity",
    f"""
    WITH norm AS (
      SELECT doc_id, {_NORM_SQL} AS nt FROM documents
      WHERE length(trim(text)) > 0
    ), tok AS (
      SELECT doc_id, u.t AS token
      FROM norm, unnest(string_split(nt, ' ')) u(t)
    ), tc AS (
      SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(count(*) / sum(c), 6) AS ttr,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / sum(c), 6)
             AS hapax_ratio
    FROM tc GROUP BY doc_id
    """,
)
def x49_lexical_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical diversity per document: type-token ratio and hapax-legomenon
    ratio — the vocabulary-richness pair quality pipelines use beside
    x10's repetition signal (low TTR = template/keyword-stuffed text even
    when no single n-gram repeats enough for x10 to fire; high hapax on a
    long doc = noisy OCR/gibberish). Both are emitted as scores, not
    thresholded flags (knife-edge rule).

    Determinism: token counts are exact integers; ttr/hapax_ratio are one
    bigint division each (identical IEEE doubles both engines);
    round(·, 6) absorbs dust.

    Scale shape: one explode + one (doc_id, token) groupBy + one doc_id
    groupBy — both shuffles are map-side combinable and keyed by
    document (the second is a prefix of the first's key, so AQE can
    often pipeline them). No corpus-wide vocabulary table is built:
    hapax status is per-document, unlike x25's global vocab growth."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = (
        _t(spark, sf, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", F.explode(F.split(norm, " ")).alias("token"))
    )
    tc = toks.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    return tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum((F.col("c") == 1).cast("int")).cast("long").alias("n_hapax"),
        F.round(F.count("*") / F.sum("c"), 6).alias("ttr"),
        F.round(F.sum((F.col("c") == 1).cast("int")) / F.sum("c"), 6)
        .alias("hapax_ratio"),
    )


@query(
    "v16_hard_negatives",
    """
    WITH flat AS (
      SELECT vec_id, label, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, any_value(label) AS label, sqrt(sum(x * x)) AS nrm
      FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.label <> b.label
      WHERE a.vec_id < 8
      GROUP BY 1, 2
    ), sims AS (
      SELECT query_id, na.label AS query_label,
             neighbor_id, nb.label AS neighbor_label,
             round(dot / (na.nrm * nb.nrm), 6) AS sim
      FROM dots JOIN norms na ON na.vec_id = query_id
                JOIN norms nb ON nb.vec_id = neighbor_id
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, rank, sim
    FROM ranked WHERE rank <= 5
    """,
)
def v16_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    embedding the 5 most-similar vectors with a DIFFERENT label — the
    near-misses a contrastive loss learns the most from (the offline
    mining step of ANCE/DPR-style embedding-model training; every
    retrieval-model data pipeline over a 100 TB corpus runs exactly this
    shape). Distinct from v1 (unconstrained top-k) and v6 (two-stage
    rerank): the label inequality rides IN the broadcast join condition,
    so same-label rows — including the query itself — are never scored
    or ranked.

    Determinism: sim is one hoisted-norm dot product rounded to 6 (v1's
    contract); ties break on neighbor_id.

    Scale shape (see ``operators/similarity.py:hard_negative_topk``):
    broadcast Q query rows, one corpus scan, per-query windowed top-k —
    O(N·Q) with Q tiny, no all-pairs stage. At training scale Q grows to
    the full corpus and this becomes v2/v3's bucketed problem; the
    label-aware candidate join is the piece this query pins."""
    from .operators.similarity import hard_negative_topk

    emb = _t(spark, sf, "embeddings")
    return hard_negative_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, dim=64
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
    "v17_embedding_margin",
    """
    WITH flat AS (
      SELECT vec_id, label, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, any_value(label) AS label, sqrt(sum(x * x)) AS nrm
      FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 8
      GROUP BY 1, 2
    ), sims AS (
      SELECT query_id, na.label AS query_label, neighbor_id,
             nb.label = na.label AS same_label,
             round(dot / (na.nrm * nb.nrm), 6) AS sim
      FROM dots JOIN norms na ON na.vec_id = query_id
                JOIN norms nb ON nb.vec_id = neighbor_id
    ), best AS (
      SELECT query_id, query_label, same_label, neighbor_id, sim
      FROM sims
      QUALIFY row_number() OVER (PARTITION BY query_id, same_label
                                 ORDER BY sim DESC, neighbor_id ASC) = 1
    )
    SELECT query_id,
           any_value(query_label) AS query_label,
           max(CASE WHEN same_label THEN neighbor_id END) AS pos_id,
           max(CASE WHEN same_label THEN sim END) AS pos_sim,
           max(CASE WHEN NOT same_label THEN neighbor_id END) AS neg_id,
           max(CASE WHEN NOT same_label THEN sim END) AS neg_sim,
           round(max(CASE WHEN same_label THEN sim END)
                 - max(CASE WHEN NOT same_label THEN sim END), 6) AS margin
    FROM best GROUP BY query_id
    """,
)
def v17_embedding_margin(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-quality margin audit: per query vector the best
    SAME-label similarity (nearest positive) minus the best CROSS-label
    similarity (nearest hard negative, v16's top row). A healthy
    retrieval embedding has positive margins; mass near or below zero is
    the standard go/no-go metric after an embedding-model update and the
    selector for which anchors need v16's mined negatives most. One
    number per query, NULL-margined when a label has no second member.

    Determinism: sims are v1's rounded hoisted-norm dot products; the
    per-(query, side) argmax has a total tiebreak (sim desc, id asc);
    margin subtracts two already-rounded doubles and rounds again.

    Scale shape: identical to v16 — broadcast Q query rows, one corpus
    scan, per-(query, side) windowed argmax; the final pivot groups 2
    rows per query. Nothing is all-pairs."""
    from .operators.similarity import _dot, _norm

    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("q_vec"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_vec"),
        _norm(F.col("embedding")).alias("c_nrm"),
    )
    sims = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            (F.col("neighbor_label") == F.col("query_label")).alias("same_label"),
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id", "same_label").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    best = sims.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    pos_sim = F.max(F.when(F.col("same_label"), F.col("sim")))
    neg_sim = F.max(F.when(~F.col("same_label"), F.col("sim")))
    return best.groupBy("query_id").agg(
        F.first("query_label").alias("query_label"),
        F.max(F.when(F.col("same_label"), F.col("neighbor_id"))).alias("pos_id"),
        pos_sim.alias("pos_sim"),
        F.max(F.when(~F.col("same_label"), F.col("neighbor_id"))).alias("neg_id"),
        neg_sim.alias("neg_sim"),
        F.round(pos_sim - neg_sim, 6).alias("margin"),
    )


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
    "d17_adamic_adar",
    r"""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), sym AS (
      SELECT u AS z, v AS n FROM e UNION ALL SELECT v, u FROM e
    ), wt AS (
      -- 1/ln(deg) quantized to a 1e-9 grid so the per-pair sum is an
      -- EXACT integer sum: partition-order independent on the Spark
      -- side, bit-identical here (see operators/dedup.adamic_adar)
      SELECT z, count(*) AS d,
             CAST(round(1.0 / ln(CAST(count(*) AS DOUBLE)) * 1e9)
                  AS BIGINT) AS w
      FROM sym GROUP BY z
      HAVING count(*) BETWEEN 2 AND 1024
    ), focus AS (
      SELECT DISTINCT l_partkey AS fu FROM lineitem ORDER BY 1 LIMIT 8
    ), wedges AS (
      SELECT a.n AS u, b.n AS v, wt.w
      FROM sym a
      JOIN sym b ON a.z = b.z AND a.n <> b.n
      JOIN wt ON wt.z = a.z
      JOIN focus ON focus.fu = a.n
    ), scores AS (
      SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(w) AS DOUBLE) / 1e9 AS aa
      FROM wedges GROUP BY 1, 2
    ), nonedges AS (
      SELECT s.* FROM scores s
      WHERE NOT EXISTS (SELECT 1 FROM sym WHERE sym.z = s.u AND sym.n = s.v)
    ), ranked AS (
      SELECT u, v, common_neighbors, round(aa, 6) AS aa_score,
             row_number() OVER (
               PARTITION BY u ORDER BY round(aa, 6) DESC, v ASC) AS rank
      FROM nonedges
    )
    SELECT u, v, rank, common_neighbors, aa_score
    FROM ranked WHERE rank <= 5
    """,
)
def d17_adamic_adar(spark: SparkSession, sf: str) -> DataFrame:
    """Adamic-Adar link prediction over the part co-purchase graph, scoped
    to a watchlist: for each of the 8 lowest part keys, the 5 strongest
    PREDICTED (non-existing) co-purchase links, scored
    AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z) (Adamic & Adar 2003). On a
    near-duplicate or co-occurrence graph this is the "which clusters are
    about to merge / which association is missing" audit — the graph-ML
    feature-generation step of a training-data pipeline, run for a node
    watchlist exactly as here.

    Scale shape (see ``operators/dedup.adamic_adar``): all-pairs AA is
    inherently Σ_z deg(z)² — on this deliberately DENSE graph (avg degree
    ~116 at sf0.01) that is the whole cost, so the operator takes the
    watchlist as a broadcast ``focus`` frame and carves out exactly the
    focus wedges with two EQUI-joins: sym⋈focus on the neighbor end
    gives the (z, u) legs (Σ_{u∈focus} deg u rows), and joining the legs
    back on z fans out the co-neighbors v — K focus nodes cost ≤ K·2m
    wedge rows, corpus-linear no matter how dense the graph, with no
    BNLJ and no per-node array state. Existing edges leave via a LEFT
    ANTI join on the thin adjacency. The oracle independently rebuilds
    everything from the raw row self-join formulation.

    Determinism: weights are 1/ln(exact integer degree) — identical
    IEEE doubles both engines; the per-pair sum is round(·, 6)-guarded
    and ranked with a total (score desc, v asc) tiebreak."""
    from .operators.dedup import adamic_adar

    edges = _copurchase_edges(spark, sf)
    focus = (
        _t(spark, sf, "lineitem")
        .select("l_partkey")
        .distinct()
        .orderBy("l_partkey")
        .limit(8)
    )
    scores = adamic_adar(
        edges, src="u", dst="v", canonical=True, hub_cap=1024, focus=focus
    )
    w = Window.partitionBy("u").orderBy(
        F.desc(F.round(F.col("aa_score"), 6)), F.asc("v")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "u", "v", "rank", "common_neighbors",
            F.round("aa_score", 6).alias("aa_score"),
        )
    )


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
    from .operators.timeseries import best_level_shift

    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("n")
    )
    return best_level_shift(daily).orderBy("event_type")
