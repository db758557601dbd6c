#!/usr/bin/env python
"""Audit-to-action skew demo: a21_key_skew_audit's statistics driving a
real salting decision, with the speedup measured.

The 100 TB story this probe pins: a fact⋈dim equi-join where ONE key owns
a large share of the fact rows. Hash partitioning sends that key's whole
volume to one reducer — wall time becomes the straggler's time no matter
how many executors exist. The fix ladder:

1. baseline: plain sort-merge join, AQE skew-join OFF — the straggler.
2. AQE skew-join ON — Spark's own runtime split (works only because the
   skew is visible in shuffle-partition sizes at runtime).
3. ``salted_join_hotkeys`` — targeted salting of JUST the audited hot
   keys, salt factor derived from the audit itself
   (≈ max multiplicity / p50 multiplicity, capped at the core count),
   AQE skew-join OFF. This is the plan that still works when AQE can't
   see the skew (e.g. the skewed side is post-aggregation) and on
   engines/pipelines where runtime replanning is off.

All three must produce the identical join checksum; the probe prints one
JSON line with the three wall times and the audit-derived parameters.

Method notes: the dim side is made non-broadcastable by config
(autoBroadcastJoinThreshold=-1) so every variant pays a real shuffle
join; each variant runs REPS times (median), fact/dim are cached and
counted first so generation cost is excluded.

Run: ``python examples/skew_salting_demo.py`` (env: SPARK_GRAFT_CPUS,
BENCH_REPS, SKEW_FACT_ROWS).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.operators.skew import salted_join_hotkeys
from dshackle_archive_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
N_FACT = int(os.environ.get("SKEW_FACT_ROWS", "8000000"))
N_KEYS = 10_000
HOT_SHARE = 0.4  # key 0 owns 40% of the fact


def build(spark):
    """Skewed fact (key 0 = HOT_SHARE of rows) + 1-row-per-key dim."""
    n_hot = int(N_FACT * HOT_SHARE)
    cold = spark.range(N_FACT - n_hot).select(
        (F.pmod(F.xxhash64("id"), F.lit(N_KEYS - 1)) + 1).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    hot = spark.range(n_hot).select(
        F.lit(0).cast("long").alias("k"), (F.col("id") % 97).alias("v")
    )
    fact = cold.unionByName(hot).repartition(CPUS, "v").cache()
    dim = (
        spark.range(N_KEYS)
        .select(F.col("id").alias("k"), (F.col("id") * 13 % 101).alias("w"))
        .cache()
    )
    fact.count(), dim.count()
    return fact, dim


def audit(fact):
    """a21's statistics on the fact key: hot keys + derived salt factor."""
    freqs = fact.groupBy("k").agg(F.count("*").alias("freq"))
    stats = freqs.agg(
        F.count("*").alias("n_keys"),
        F.max("freq").alias("max_freq"),
        F.expr("percentile(freq, 0.5)").alias("p50"),
    ).collect()[0]
    hot = [
        r["k"]
        for r in freqs.filter(
            F.col("freq") > 20 * F.lit(float(stats["p50"]))
        ).collect()
    ]
    salt = min(CPUS, max(2, int(stats["max_freq"] / stats["p50"] / 100)))
    return hot, salt, stats


def checksum(df):
    return df.agg(
        F.count("*").alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
    ).collect()[0]


def timed(fn):
    outs, ts = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs.append(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), outs[-1]


def main():
    spark = get_spark("skew-salting-demo", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    fact, dim = build(spark)
    hot, salt, stats = audit(fact)

    def run(skew_aqe: bool, salted: bool):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_aqe).lower()
        )
        if salted:
            j = salted_join_hotkeys(fact, dim, "k", hot, salt=salt)
        else:
            j = fact.join(dim, "k")
        return checksum(j)

    t_base, c_base = timed(lambda: run(False, False))
    t_aqe, c_aqe = timed(lambda: run(True, False))
    t_salt, c_salt = timed(lambda: run(False, True))
    assert tuple(c_base) == tuple(c_aqe) == tuple(c_salt), (
        c_base,
        c_aqe,
        c_salt,
    )
    print(
        json.dumps(
            {
                "metric": "skew_salting_demo",
                "fact_rows": N_FACT,
                "hot_share": HOT_SHARE,
                "audit": {
                    "hot_keys": hot,
                    "salt": salt,
                    "max_freq": stats["max_freq"],
                    "p50_freq": stats["p50"],
                },
                "sec_plain_smj_no_aqe": round(t_base, 3),
                "sec_aqe_skew_join": round(t_aqe, 3),
                "sec_salted_hotkeys": round(t_salt, 3),
                "checksum": [c_base["n"], float(c_base["s"])],
                "reps": REPS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
