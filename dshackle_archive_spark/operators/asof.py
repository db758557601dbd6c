"""As-of join — match each left row to the latest right row at or before
its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive encodings are
both scale-hostile: a range join (``l.key = r.key AND r.ts <= l.ts`` +
argmax) explodes to every-prior-row pairs before pruning, and a correlated
subquery plans the same way. This operator uses the union trick instead:

1. tag both sides and union them into one stream of (key, ts, side, ...);
2. ONE shuffle on ``key``; within each key sort by (ts, side, tie) — right
   rows sort before left rows at equal ts, so "at or before" includes ties;
3. a running ``last(value, ignorenulls=True)`` window carries the most
   recent right-side value forward; left rows read their match from it.

Cost: one shuffle + one sort over |L|+|R| rows — the same wire cost as a
plain groupBy, independent of how many prior right rows each left row has.
Skewed keys follow the usual salting/AQE story, same as any keyed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """For each left row: the latest right row with ``right_ts <= left_ts``
    on the same ``key`` (ties on ts broken by max ``tie_col``), or nulls.

    Returns the left columns plus ``value_cols`` from the matched right row.
    Both ts columns must be directly comparable (same type)."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tie_col].dataType).alias("_tie"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
            for c in value_cols
        ],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_col).alias("_tie"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r).select(
        *lcols,
        "_side",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def overlap_self_join(
    intervals: DataFrame,
    key: str,
    id_col: str,
    start_col: str,
    end_col: str,
    band_days: int = 30,
    epoch: str = "1995-01-01",
) -> DataFrame:
    """All pairs of intervals on the same ``key`` that OVERLAP
    (``a.start <= b.end AND b.start <= a.end``) — the interval-overlap join
    Spark lacks natively, as an equi join.

    The naive theta self-join is a per-key cartesian (Catalyst plans a
    BroadcastNestedLoopJoin). Banding makes it hash-partitionable: each
    interval explodes to every ``band_days``-wide calendar band it covers
    (``sequence(start_band, end_band)`` — bounded by interval length /
    band width, a few rows per interval when bands are sized near the
    typical interval), the join is an equi join on ``(key, band)``, and
    each overlapping pair is COUNTED EXACTLY ONCE by keeping only the band
    containing the overlap's start (``floor(greatest(a.start, b.start) /
    band)``) — the standard dedup for multi-band collisions, no DISTINCT
    over the pair explosion needed.

    Output: one row per overlapping pair ``(key, id_a, id_b,
    overlap_days)`` with ``id_a < id_b``; touching intervals (end = start)
    count as 1-day overlaps, consistent with closed-interval semantics.
    """
    d0 = F.lit(epoch).cast("date")
    iv = intervals.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("_id"),
        F.datediff(F.col(start_col), d0).alias("_s"),
        F.datediff(F.col(end_col), d0).alias("_e"),
    )
    exploded = iv.select(
        "_k",
        "_id",
        "_s",
        "_e",
        F.explode(
            F.sequence(
                (F.col("_s") / band_days).cast("long"),
                (F.col("_e") / band_days).cast("long"),
            )
        ).alias("_band"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = a.join(
        b,
        (F.col("a._k") == F.col("b._k"))
        & (F.col("a._band") == F.col("b._band"))
        & (F.col("a._id") < F.col("b._id")),
    ).filter(
        (F.col("a._s") <= F.col("b._e"))
        & (F.col("b._s") <= F.col("a._e"))
        # count once: only in the band where the overlap starts
        & (
            (F.greatest("a._s", "b._s") / band_days).cast("long")
            == F.col("a._band")
        )
    )
    return pairs.select(
        F.col("a._k").alias(key),
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        (
            F.least("a._e", "b._e") - F.greatest("a._s", "b._s") + F.lit(1)
        ).alias("overlap_days"),
    )
