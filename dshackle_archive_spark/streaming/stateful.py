"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's only cross-batch state is the bounded height-dedup window
(W2/T6, ``block_seq.rs:161-180`` + ``next_block.rs:61-65``). Here it is a
proper Structured Streaming stateful operator: per-height state with a
processing-time timeout bounds the state store exactly like the reference's
"last N heights" buffer — heights older than the timeout are evicted, so
state never grows with chain length.

Also provides the watermarked event-time throughput aggregation (A9's
streaming form), which the reference approximates with its 5-minute sliding
snapshot log.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("height", T.LongType(), False),
        T.StructField("n_occurrences", T.LongType(), False),
        T.StructField("first_batch", T.BooleanType(), False),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType(), False)])


def dedup_heights_stateful(
    heights: DataFrame, timeout_ms: int = 600_000
) -> DataFrame:
    """Streaming height dedup with bounded state (T6 + W2).

    Input: a streaming DataFrame with a ``height`` column. Output: one row
    per (height, micro-batch) carrying whether this batch saw the height for
    the first time. State per height is one counter with a processing-time
    timeout — the scalable analog of the reference's fixed-size dedup buffer.
    """

    def update(
        key: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n_new = sum(len(p) for p in pdfs)
        (seen,) = state.get if state.exists else (0,)
        first = seen == 0
        state.update((seen + n_new,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [{"height": key[0], "n_occurrences": seen + n_new, "first_batch": first}]
        )

    return heights.groupBy("height").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


SEQ_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("chain", T.StringType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),  # emission index, 0-based
    ]
)

SEQ_STATE_SCHEMA = T.StructType(
    [
        T.StructField("next", T.LongType(), False),  # -1 = not yet anchored
        T.StructField("emitted", T.LongType(), False),
        T.StructField("buf", T.ArrayType(T.LongType()), True),
    ]
)


def bounded_sequencer(
    heights: DataFrame, chain_col: str = "chain", max_buffer: int = 64
) -> DataFrame:
    """W2: emit heights in strictly increasing order from an out-of-order
    stream, holding at most ``max_buffer`` heights in flight.

    The reference's ``BlockSeq`` (``block_seq.rs:58-180``) sequences parallel
    fetch completions the same way: arrivals below the cursor are duplicates
    (dropped, T6), arrivals ahead buffer until the gap fills, and a
    past-capacity buffer abandons the gap and resumes from the lowest
    buffered height — state stays bounded no matter how the stream behaves.
    One sequencer per ``chain`` key, so chains sequence in parallel."""

    def update(
        key: Tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            nxt, emitted, buf_list = state.get
            buf = set(buf_list or [])
        else:
            nxt, emitted, buf = -1, 0, set()
        for p in pdfs:
            for h in p["height"].tolist():
                h = int(h)
                if nxt != -1 and h < nxt:
                    continue  # behind the cursor: duplicate/stale (T6)
                buf.add(h)
        if nxt == -1 and buf:
            nxt = min(buf)
        out = []
        while buf:
            if nxt in buf:
                buf.discard(nxt)
                out.append({"chain": key[0], "height": nxt, "seq": emitted})
                emitted += 1
                nxt += 1
            elif len(buf) > max_buffer:
                nxt = min(buf)  # bounded: abandon the gap, resync
            else:
                break
        state.update((nxt, emitted, sorted(buf)))
        if out:
            yield pd.DataFrame(out)

    return heights.groupBy(chain_col).applyInPandasWithState(
        update,
        outputStructType=SEQ_OUTPUT_SCHEMA,
        stateStructType=SEQ_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_throughput(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Watermarked event-time throughput (A9 streaming form): late data
    beyond the watermark is dropped, state is bounded by the watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_windows_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "5 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming sessionization (T8's streaming form): per-key sessions
    close after ``gap`` of inactivity, computed with Spark's native
    ``session_window`` state — sessions merge as late-but-in-watermark
    events arrive, and state is bounded by the watermark horizon.
    Output: one row per closed session (key, start/end epoch, n_events).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


EMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("day", T.LongType(), False),  # days since epoch
        T.StructField("decayed_mean", T.DoubleType(), False),
    ]
)

EMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("num", T.DoubleType(), False),
        T.StructField("den", T.DoubleType(), False),
        T.StructField("last_day", T.LongType(), False),
    ]
)


def decayed_mean_stream(
    daily: DataFrame,
    half_life_days: float = 7.0,
    series_col: str = "series",
    day_col: str = "day",
    value_col: str = "v",
) -> DataFrame:
    """Streaming counterpart of ``operators/timeseries.decayed_mean``: an
    exponentially-decayed running mean per series over a stream of daily
    aggregates, as bounded keyed state.

    The batch closed form keeps the whole series behind a window sort;
    the stream keeps THREE numbers per series — decayed numerator,
    decayed denominator, last day — and folds each arriving day in as
    ``num·f + v, den·f + 1`` with ``f = e^{−λ·Δdays}``. Same recurrence
    the batch form telescopes, so outputs agree to float precision
    (tested), and state is O(1) per series forever — the sketch-style
    contract the drift/heavy-hitter monitors follow. Days arriving out
    of order within a micro-batch fold in day order; a day at or before
    the last applied day is stale replay and is dropped (at-least-once
    upstream delivery stays idempotent per day).
    """
    lam = math.log(2.0) / float(half_life_days)

    def update(
        key: Tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        num, den, last_day = state.get if state.exists else (0.0, 0.0, -(10**15))
        rows = []
        for p in pdfs:
            rows.extend(zip(p[day_col].tolist(), p[value_col].tolist()))
        out = []
        for day, v in sorted(rows):
            day = int(day)
            if day <= last_day:
                continue  # stale replay of an already-folded day
            f = math.exp(-lam * (day - last_day)) if den > 0.0 else 0.0
            num = num * f + float(v)
            den = den * f + 1.0
            last_day = day
            out.append(
                {"series": key[0], "day": day, "decayed_mean": num / den}
            )
        state.update((num, den, last_day))
        if out:
            yield pd.DataFrame(out)

    return daily.groupBy(series_col).applyInPandasWithState(
        update,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RQ_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("day", T.LongType(), False),
        T.StructField("p50_7d", T.DoubleType(), False),
        T.StructField("p90_7d", T.DoubleType(), False),
    ]
)

RQ_STATE_SCHEMA = T.StructType(
    [
        T.StructField("days", T.ArrayType(T.LongType()), True),
        T.StructField("vals", T.ArrayType(T.DoubleType()), True),
    ]
)


def _percentile_cont(sorted_vals: list, p: float) -> float:
    """The percentile_cont rule both engines (and w9) use: position
    p·(n−1) on the sorted values, linear interpolation."""
    n = len(sorted_vals)
    if n == 1:
        return float(sorted_vals[0])
    pos = p * (n - 1)
    lo = int(pos)
    frac = pos - lo
    hi = min(lo + 1, n - 1)
    return float(sorted_vals[lo]) + frac * (
        float(sorted_vals[hi]) - float(sorted_vals[lo])
    )


def rolling_quantile_stream(
    daily: DataFrame,
    window_days: int = 7,
    series_col: str = "series",
    day_col: str = "day",
    value_col: str = "v",
) -> DataFrame:
    """Streaming counterpart of w9's rolling window quantiles: trailing
    ``window_days`` p50/p90 per series as keyed state.

    State is the last ``window_days`` (day, value) pairs per series —
    bounded forever, pruned on every update. Same fold rules as
    :func:`decayed_mean_stream`: days within a micro-batch apply in day
    order, a day at or before the newest already-applied day is stale
    replay and drops. The emitted quantiles follow the percentile_cont
    rule (p·(n−1), linear interpolation), so a batch replay with w9's
    window form reproduces them exactly (tested)."""

    def update(
        key: Tuple[str],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        days, vals = state.get if state.exists else ([], [])
        days, vals = list(days or []), list(vals or [])
        rows = []
        for p in pdfs:
            rows.extend(zip(p[day_col].tolist(), p[value_col].tolist()))
        out = []
        for day, v in sorted(rows):
            day = int(day)
            if days and day <= days[-1]:
                continue  # stale replay
            days.append(day)
            vals.append(float(v))
            days, vals = days[-window_days:], vals[-window_days:]
            frame = sorted(vals)
            out.append(
                {
                    "series": key[0],
                    "day": day,
                    "p50_7d": _percentile_cont(frame, 0.5),
                    "p90_7d": _percentile_cont(frame, 0.9),
                }
            )
        state.update((days, vals))
        if out:
            yield pd.DataFrame(out)

    return daily.groupBy(series_col).applyInPandasWithState(
        update,
        outputStructType=RQ_OUTPUT_SCHEMA,
        stateStructType=RQ_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
