"""Skew mitigation helpers.

AQE's skew-join splitting (on in ``session.py``) covers joins; these helpers
cover the remaining hot spots:

- ``salted_agg``: two-phase aggregation for groupBy keys with pathological
  cardinality skew (one key holding 1% of 100 TB). Phase 1 groups on
  (key, salt) spreading the hot key over N reducers; phase 2 merges the N
  partials. Only algebraic aggregates (sum/count/min/max) compose this way —
  which is exactly what the engine's completeness/stats rollups use.
- ``salted_broadcast_left``: explode a small skewed build side by the salt
  domain so a salted probe side still equi-joins (the classic salt join for
  when the build side is broadcastable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERGEABLE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (fn, input column) with fn in
    sum|count|min|max. Equivalent to ``df.groupBy(keys).agg(...)`` for any
    data, but the hot key's phase-1 work spreads over ``salt`` reducers.
    """
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(col) if fn == "count" else MERGEABLE[fn](col)).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[MERGEABLE[fn if fn != "count" else "sum"](out).alias(out) for out, (fn, _c) in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
) -> DataFrame:
    """Equi-join a skewed big side with a broadcastable small side under
    salting: the small side is exploded ×salt so the salted big keys match.
    Output columns = big ∪ small (join keys once)."""
    big_s = big.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    return big_s.join(F.broadcast(small_s), on + ["_salt"], "left").drop("_salt")
