"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin side-by-side and
compares row count, column names, and values EXACTLY (stricter than any
value-hash). Uses sf0.001 by default for speed; set
``SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01`` to mirror the driver scale.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def duck(sf_dir_mod):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir_mod}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def sf_dir_mod() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def normalize(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return normalize(v.item())
    return v


def as_rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(map(repr, t)))


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_types_driver_safe(duck, name):
    """The driver hash-compares *rendered* values, so an oracle whose sum()
    comes back as HUGEINT renders `1764.0` while Spark's BIGINT renders
    `1764` — values equal, hashes differ (bit round 5: h12/p10/x13). The
    float-coercing comparator below can't see that, so gate on the DuckDB
    result types directly: integer aggregates must be CAST(... AS BIGINT)
    in the oracle SQL."""
    types = [str(t) for t in duck.sql(ORACLES[name]).types]
    banned = [t for t in types if t in ("HUGEINT", "UHUGEINT")]
    assert not banned, (
        f"{name}: oracle returns {banned} column(s) — wrap the integer "
        f"aggregate in CAST(... AS BIGINT) so the driver's value hash "
        f"renders identically to Spark's BIGINT (types: {types})"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir_mod, name):
    sdf = QUERIES[name](spark, sf_dir_mod)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(ORACLES[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    s_cols, s_set = as_rowset(scols, srows)
    d_cols, d_set = as_rowset(dcols, drows)

    assert s_cols == d_cols, f"{name}: column names differ: {s_cols} vs {d_cols}"
    assert len(s_set) == len(d_set), f"{name}: row count {len(s_set)} vs {len(d_set)}"
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"{name}: first mismatched rows: {mismatches[:3]}"


def test_rows_only_queries_run(spark, sf_dir_mod):
    """Queries without an oracle still must run and return a stable schema."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, sf_dir_mod)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0 and df.columns


def test_p10_tolerates_malformed_json(spark):
    """get_json_object must yield NULL (filtered out), never throw, on
    malformed/missing props — live event streams always contain garbage."""
    from dshackle_archive_spark.queries import registry
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [
            (1, "click", '{"k": 50}'),
            (2, "click", "not json at all"),
            (3, "click", None),
            (4, "click", '{"other": 1}'),
        ],
        "event_id long, event_type string, props string",
    )
    k = F.get_json_object("props", "$.k").cast("bigint")
    rows = (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
        .collect()
    )
    assert len(rows) == 1 and rows[0]["n"] == 1 and rows[0]["k_sum"] == 50
