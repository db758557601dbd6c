#!/usr/bin/env python
"""Scale probes for the round-7 queries (round-8 task 6): d16 edge-end
correlation, x46 grouped exact percentiles, w10 daily-rollup window,
x47 top-k ranking audit — the four registry entries that had no PERF.md
scale record yet.

Method: the DEPLOYED registry functions, timed with bench.py's
methodology (fresh build + ``count()``, median of REPS) at sf0.01 and
sf0.1 — ×10 data, stronger than the ×2 ask. The claim each ratio tests:

- ``d16``: edges grow ~linearly with lineitem rows (orders×pairs-per-
  order is bounded); degrees, the guarded join, and corr() are all
  edge-linear → ratio ≲ 10.
- ``x46``: two grouped EXACT percentiles whose buffers are bounded by
  distinct integer token counts (document length), not docs — time is
  scan-dominated → ratio ≲ 10.
- ``w10``: the window slides over the DAILY ROLLUP (days × event_types),
  which barely grows with sf — only the pre-rollup scan scales → ratio
  well under 10 (output-bound).
- ``x47``: exact side is broadcast-5-query × corpus scan; IVF side scans
  nprobe cells; audit join is top-10×top-10 per query (constant) →
  ratio ≲ 10, dominated by the two scans.

Run: ``python examples/stress_round8_queries.py`` (env: SPARK_GRAFT_CPUS,
REPS via BENCH_REPS). Prints one JSON line; PERF.md records the numbers.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dshackle_archive_spark import queries as Q
from dshackle_archive_spark.session import get_spark

NAMES = [
    "d16_degree_assortativity",
    "x46_mad_outliers",
    "w10_rolling_zscore",
    "x47_ndcg_audit",
    # round-8 additions — same claims: rollup-bound windows (w11/w12),
    # doc-keyed fingerprint/token shuffles (x48/x49)
    "w11_dow_seasonality",
    "x48_winnowing_fingerprints",
    "w12_cusum_drift",
    "x49_lexical_diversity",
    # second round-8 batch — claims: broadcast-Q corpus scan (v16),
    # key-grouped freq + tiny histogram windows (a21), rollup-bound
    # decomposition windows (w13)
    "v16_hard_negatives",
    "a21_key_skew_audit",
    "w13_seasonal_decomposition",
    # fourth batch — v17 shares v16's broadcast-Q scan shape; w14 is
    # w10's rollup window + islands on the flagged (incident-scale) rows
    "v17_embedding_margin",
    "w14_anomaly_incidents",
    # w15 folds each series' day-ordered array (metadata scale)
    "w15_holt_forecast",
    # fifth batch — d17 wedges are focus-scoped (K·2m, never Σdeg²);
    # w16's three windows run over the daily rollup (days × types)
    "d17_adamic_adar",
    "w16_changepoint",
]
REPS = int(os.environ.get("BENCH_REPS", "3"))


def timed(spark, name: str, sf_dir: str) -> float:
    def one() -> float:
        t0 = time.perf_counter()
        Q.registry()[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    return statistics.median(one() for _ in range(REPS))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-round8", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * int(cpus)))

    out: dict = {}
    for name in NAMES:
        timed(spark, name, "/root/testdata/sf0.001")  # codegen warmup
        t_small = timed(spark, name, "/root/testdata/sf0.01")
        t_big = timed(spark, name, "/root/testdata/sf0.1")
        out[name] = {
            "sf0.01_sec": round(t_small, 3),
            "sf0.1_sec": round(t_big, 3),
            "ratio_x10_data": round(t_big / t_small, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
