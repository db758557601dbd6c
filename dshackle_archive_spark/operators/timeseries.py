"""Time-series analytics over pre-aggregated series.

The reference's metrics pipeline stops at fixed-window counts
(``src/archiver/report.rs``-style throughput windows, SURVEY §2.9/A9);
these operators add the decayed-weighting family a monitoring or
training-data freshness dashboard needs on top of the same daily
rollups. Everything here runs AFTER the heavy corpus shuffle: inputs
are (series_key, day, value) tables whose row count is series × days —
metadata scale even at 100 TB of raw events — so the window functions
below never see more than a few thousand rows per partition.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def decayed_mean(
    daily: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    half_life_days: float = 7.0,
) -> DataFrame:
    """Exponentially-decayed running mean per series (EMA with an exact
    closed form instead of the recursive definition).

    dm(t) = Σ_{i≤t} v_i·e^{−λ(d_t−d_i)} / Σ_{i≤t} e^{−λ(d_t−d_i)} with
    λ = ln2/half_life. The e^{−λ·d_t} factor cancels in the ratio, so
    both sums reduce to ORDINARY cumulative window sums of
    ``v_i·e^{λ·d_i}`` and ``e^{λ·d_i}`` — one sort per series, no
    recursion, no self-join. The exponent basis is days since each
    SERIES' OWN first day (a window min over the same partitioning — no
    extra shuffle, and immune to how far the calendar sits from any
    fixed epoch): e^{λ·d} stays finite as long as one series spans fewer
    than ~700 half-lives, which a daily rollup with a sane half-life
    always satisfies (e.g. 7-day half-life over a 7-year span → e²⁵⁸,
    comfortably inside double range).

    Determinism: cumulative sums accumulate in ascending day order — the
    same sequence of double adds on any engine — and the output rounds
    to 6 decimals. Unlike a recursive EMA there is no per-step rounding
    drift to accumulate.
    """
    lam = math.log(2.0) / float(half_life_days)
    # materialize the per-series first day before it feeds the cumulative
    # sums — window expressions can't nest inside another window's argument
    based = daily.withColumn(
        "_d0", F.min(day_col).over(Window.partitionBy(key_col))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    basis = F.exp(
        F.lit(lam) * F.datediff(F.col(day_col), F.col("_d0")).cast("double")
    )
    return based.select(
        F.col(key_col),
        F.col(day_col),
        F.round(
            F.sum(F.col(value_col).cast("double") * basis).over(w)
            / F.sum(basis).over(w),
            6,
        ).alias("decayed_mean"),
    )


def linear_weighted_mean(values: Column, n: Column) -> Column:
    """Helper: weighted mean with linearly rising weights 1..n over an
    ordered array column (the WMA companion to :func:`decayed_mean` for
    bounded lookbacks). Pure Catalyst higher-order functions."""
    idx = F.sequence(F.lit(1), n)
    num = F.aggregate(
        F.zip_with(values, idx, lambda v, i: v * i.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return num / (n.cast("double") * (n.cast("double") + 1) / 2)
