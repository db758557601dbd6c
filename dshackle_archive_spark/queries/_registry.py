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


from ..core.checkpoint import reliable_checkpoint


from ..sources.tables import load_table

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
    """All registered queries, in registration order (family-module import
    order; see ``queries/__init__.py``). Any consumer-specific ordering — e.g. the external
    correctness driver's coverage rotation — belongs to that consumer's
    adapter (``__spark_entry__.py``), not to this API."""
    return dict(_REGISTRY)


def oracles() -> dict[str, str]:
    return dict(_ORACLE)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


DEC = "decimal(18,2)"
