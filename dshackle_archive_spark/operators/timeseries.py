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


def best_level_shift(
    daily: DataFrame,
    key_col: str = "event_type",
    day_col: str = "d",
    n_col: str = "n",
) -> DataFrame:
    """Binary-segmentation changepoint: per key, the split of the
    day-ordered integer series that minimizes SSE_left + SSE_right
    (Scott & Knott 1974; the single-split step PELT-style segmentation
    iterates). Returns one row per key: the split day, segment sizes and
    means, and the variance-reduction ``gain``.

    Output contract: a key needs AT LEAST 2 days of data to appear — a
    single-day series has no candidate split (no k < n_days exists), so
    the key is dropped from the output entirely rather than emitted
    with a null split. Callers (w16) that must account for every key
    should anti-join the result against the key list to recover the
    too-short ones.

    Non-obvious reduction: SSE(1..k) = Σx² − (Σx)²/k needs only prefix
    sums, so the O(n²) candidate scan collapses to three stock windows
    (ordered cumsums of n and n², per-key totals) + an argmin window —
    no recursion, no UDF, no per-split pass.

    Determinism contract (oracle-replayable): every prefix/total sum is
    an exact BIGINT over integer counts; the cost is a fixed chain of
    IEEE double ops on those exact operands; the argmin tie-breaks on
    day. Scale shape: windows partition by key over the DAILY rollup —
    per-key state is one running pair of sums; the corpus is only
    touched by whatever groupBy built ``daily``."""
    n = F.col(n_col)
    full = Window.partitionBy(key_col)
    cum = full.orderBy(day_col).rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        key_col,
        day_col,
        F.sum(n).over(cum).alias("sl"),
        F.sum(n * n).over(cum).alias("sl2"),
        F.row_number().over(full.orderBy(day_col)).alias("k"),
        F.sum(n).over(full).alias("st"),
        F.sum(n * n).over(full).alias("st2"),
        F.count("*").over(full).alias("nd"),
    )
    cost = (
        F.col("sl2").cast("double")
        - F.col("sl").cast("double") * F.col("sl") / F.col("k")
    ) + (
        (F.col("st2") - F.col("sl2")).cast("double")
        - (F.col("st") - F.col("sl")).cast("double")
        * (F.col("st") - F.col("sl"))
        / (F.col("nd") - F.col("k"))
    )
    sse_total = F.col("st2").cast("double") - F.col("st").cast(
        "double"
    ) * F.col("st") / F.col("nd")
    costs = pre.filter(F.col("k") < F.col("nd")).select(
        key_col, day_col, "k", "nd", "sl", "st",
        cost.alias("cost"), sse_total.alias("sse_total"),
    )
    best = costs.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(key_col).orderBy(F.asc("cost"), F.asc(day_col))
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        key_col,
        F.col(day_col).cast("string").alias("split_day"),
        F.col("nd").cast("long").alias("n_days"),
        F.col("k").cast("long").alias("left_days"),
        F.round(F.col("sl").cast("double") / F.col("k"), 6).alias("left_mean"),
        F.round(
            (F.col("st") - F.col("sl")).cast("double")
            / (F.col("nd") - F.col("k")),
            6,
        ).alias("right_mean"),
        F.round(F.col("sse_total") - F.col("cost"), 6).alias("gain"),
    )
