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


def salted_join_hotkeys(
    big: DataFrame,
    other: DataFrame,
    on: str,
    hot_keys: list,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Targeted hot-key salting for a shuffle (sort-merge) equi-join —
    the production fix when the dim side is too big to broadcast and only
    a FEW keys are pathological (exactly what ``a21_key_skew_audit``'s
    top1_share/Gini surfaces; pick ``salt`` ≈ hot-key multiplicity /
    median multiplicity, capped by the reducer count).

    Only the hot keys pay: the big side spreads each hot key's rows over
    ``salt`` sub-keys via a deterministic per-row hash (monotonically_
    increasing_id is NOT used — it changes under retries); the other side
    replicates ONLY its hot-key rows ×salt (cold rows are untouched, so
    the replication cost is |hot_keys|·salt rows, not |other|·salt).
    Equivalent to ``big.join(other, on, how)`` for inner/left joins on
    any data.

    ``hot_keys`` is a driver-side list because it is audit output — a
    handful of keys by construction (if thousands of keys are "hot",
    the distribution isn't skewed and plain hash partitioning is fine)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join_hotkeys supports inner/left, got {how}")
    hot = F.array([F.lit(k) for k in hot_keys])
    # big side: hot rows get a stable pseudo-random salt derived from the
    # whole row (xxhash64 over all columns), cold rows salt 0
    big_s = big.withColumn(
        "_salt",
        F.when(
            F.array_contains(hot, F.col(on)),
            F.pmod(F.xxhash64(*big.columns), F.lit(salt)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    # other side: replicate hot rows across the full salt domain, cold
    # rows ride through once with salt 0
    other_s = other.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.array_contains(hot, F.col(on)),
                F.sequence(F.lit(0), F.lit(salt - 1)),
            )
            .otherwise(F.array(F.lit(0)))
            .cast("array<int>")
        ),
    )
    return big_s.join(other_s, [on, "_salt"], how).drop("_salt")


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
