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
