#!/usr/bin/env python
"""Scale probe for the interval operators (j10 overlap join, w8 sweep line).

Synthetic keyed intervals, generated in-plan (no disk inputs):

- ``n`` intervals over ``n // 200`` keys (~200 intervals/key — dense
  enough that overlap pairs dominate);
- start days spread over a 4-year window per key, durations 1..120 days
  (hash-derived, deterministic), so each interval covers 1–3 of the
  60-day bands the overlap join explodes into;
- one adversarial HOT key holding 2,000 near-coincident intervals
  (everything overlaps everything: ~2M pairs from one key) — the skew
  case a naive per-key cartesian would die on and banding must survive.

Claims under test:
1. ``overlap_self_join`` scales with intervals + OUTPUT PAIRS, never with
   per-key interval² beyond the pairs actually emitted: doubling the
   corpus (hot key fixed) should ~double the time;
2. the sweep line (w8 shape) answers the load question on the SAME data
   in near-constant small time — linear, no pair materialization — and
   its hot-key max equals the hot key's planted concurrency;
3. banding is EXACT: pair counts on a 50k-interval slice equal the
   brute-force non-equi join's count (DuckDB cross-check).

Run: ``python examples/stress_interval_ops.py`` (env: SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from dshackle_archive_spark.operators.asof import overlap_self_join
from dshackle_archive_spark.session import get_spark


def build_intervals(spark, n: int, hot: int = 2000):
    n_keys = max(n // 200, 1)
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % n_keys).alias("k"),
        ((F.col("id") * 2654435761) % 1461).alias("sd"),  # 4-year window
        (1 + (F.col("id") * 40503) % 120).alias("ln"),
    )
    hot_rows = spark.range(hot).select(
        (F.col("id") + n).alias("id"),
        F.lit(-1).alias("k"),  # dedicated hot key
        (F.col("id") % 30).alias("sd"),  # all within one month
        F.lit(90).alias("ln"),  # everything overlaps everything
    )
    d0 = F.lit("1995-01-01").cast("date")
    return (
        base.unionByName(hot_rows)
        .select(
            "id",
            "k",
            F.date_add(d0, F.col("sd").cast("int")).alias("s"),
            F.date_add(d0, (F.col("sd") + F.col("ln")).cast("int")).alias("e"),
        )
        .localCheckpoint(eager=True)  # freeze inputs; probe measures the join
    )


def overlap_count(iv) -> tuple[int, float]:
    t0 = time.time()
    n = overlap_self_join(
        iv, key="k", id_col="id", start_col="s", end_col="e", band_days=60
    ).count()
    return n, time.time() - t0


def sweep_max(iv) -> tuple[int, float]:
    t0 = time.time()
    ev = iv.select("k", F.col("s").alias("day"), F.lit(1).alias("delta")).unionByName(
        iv.select("k", F.date_add("e", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("day", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = (
        ev.select("k", F.sum("delta").over(w).alias("level"))
        .groupBy("k")
        .agg(F.max("level").alias("mx"))
        .filter(F.col("k") == -1)
        .collect()[0]["mx"]
    )
    return peak, time.time() - t0


def brute_force_check(spark, iv) -> None:
    import duckdb

    rows = iv.collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE iv (id BIGINT, k BIGINT, s DATE, e DATE)")
    con.executemany(
        "INSERT INTO iv VALUES (?, ?, ?, ?)",
        [(r["id"], r["k"], r["s"], r["e"]) for r in rows],
    )
    expect = con.execute(
        """SELECT count(*) FROM iv a JOIN iv b
           ON a.k = b.k AND a.id < b.id AND a.s <= b.e AND b.s <= a.e"""
    ).fetchone()[0]
    got, _ = overlap_count(iv)
    assert got == expect, (got, expect)
    print(f"  exactness: banded={got} brute_force={expect} MATCH")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-intervals", master=f"local[{cpus}]")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(cpus) * 2))

    # exactness on a slice small enough to brute force
    small = build_intervals(spark, 50_000, hot=200)
    brute_force_check(spark, small)

    out = {}
    for n in (1_000_000, 2_000_000):
        iv = build_intervals(spark, n)
        pairs, t_join = overlap_count(iv)
        peak, t_sweep = sweep_max(iv)
        assert peak == 2000  # the hot key's planted concurrency
        out[n] = {
            "pairs": pairs,
            "overlap_join_s": round(t_join, 2),
            "sweep_line_s": round(t_sweep, 2),
        }
        print(f"  n={n}: {out[n]}")
        iv.unpersist()
    r = out[2_000_000]["overlap_join_s"] / out[1_000_000]["overlap_join_s"]
    print(json.dumps({"probe": "interval_ops", "x2_ratio": round(r, 2), **{str(k): v for k, v in out.items()}}))


if __name__ == "__main__":
    main()
