"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import functions as F


from ._registry import DEC, _t, query


from ._shared import _NORM_SQL


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
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 20)
    toks = F.split(normalized_text("text"), " ")
    return docs.select("doc_id", F.posexplode(toks).alias("pos", "token")).filter(
        F.length("token") > 0
    )


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
