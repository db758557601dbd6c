"""Ordered-sequence funnel over an event stream.

Generalizes the view→click→purchase conversion funnel to any ordered list
of step predicates: a key (user) reaches step *i* at the FIRST event
matching step *i* that happens strictly after its step *i−1* time. The
classic user-journey primitive behind conversion, activation, and
drop-off analytics.

Plan shape: one aggregation per step, each consuming only the events of
that step's type (filter pushed to the scan) joined against the previous
step's per-key frontier — which shrinks monotonically, so every join after
the first broadcasts the surviving-key side. No windows over the full
event stream, no per-key event arrays (hot keys would blow either up at
ingest scale); state per step is exactly one timestamp per surviving key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key first-completion time of every step reached.

    ``steps``: ordered ``(name, predicate)`` pairs. Output: one row per key
    that completed at least step 1, with a nullable ``t_<name>`` column per
    step (NULL = never reached). Step *i*'s time is strictly after step
    *i−1*'s."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    name0, pred0 = steps[0]
    frontier = (
        events.filter(pred0)
        .groupBy(key)
        .agg(F.min(ts_col).alias(f"t_{name0}"))
    )
    out = frontier
    prev = f"t_{name0}"
    for name, pred in steps[1:]:
        nxt = (
            events.filter(pred)
            .join(F.broadcast(out.select(key, prev)), key)
            .filter(F.col(ts_col) > F.col(prev))
            .groupBy(key)
            .agg(F.min(ts_col).alias(f"t_{name}"))
        )
        out = out.join(nxt, key, "left")
        prev = f"t_{name}"
    return out


def funnel_counts(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stage attrition: ``(stage, n_keys)`` per step, keys counted once per
    deepest... no — per step they REACHED (standard funnel counting: a key
    completing step 3 counts in steps 1, 2, and 3)."""
    times = funnel_times(events, steps, key, ts_col)
    parts = None
    for name, _ in steps:
        c = times.filter(F.col(f"t_{name}").isNotNull()).agg(
            F.count("*").alias("n_keys")
        ).select(F.lit(name).alias("stage"), "n_keys")
        parts = c if parts is None else parts.unionByName(c)
    return parts
