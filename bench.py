#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is built fresh and fully materialized (count + a cheap checksum
collect) so lazy evaluation can't hide work. A warmup pass on sf0.001 JIT-warms
the JVM before timing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dshackle_archive_spark import queries as Q  # noqa: E402
from dshackle_archive_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "h1_pricing_summary",
    "h3_shipping_priority",
    "h4_order_priority",
    "h5_local_supplier_volume",
    "h6_forecast_revenue",
    "a1_islands",
    "a3_gap_detection",
    "a9_throughput_window",
    "t8_sessionization",
    "w1_chain_linkage",
    "j7_range_chunk_assignment",
    "e4_set_equality_check",
]

# appended as implemented (LLM-pipeline operator benches)
EXTRA = [
    "d1_exact_dedup",
    "d2_minhash_lsh_dedup",
    "d3_ngram_jaccard",
    "d4_embedding_neardup",
    "x1_token_count",
    "x4_doc_fingerprint",
    "v1_cosine_topk",
    "v2_ann_lsh_topk",
    "v3_ivf_topk",
]


def run_one(spark, name: str, sf_dir: str) -> float:
    fn = Q.registry()[name]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()
    _ = n  # materialized
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("dshackle-archive-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE + EXTRA if n in Q.registry()]
    # warmup every query (JIT, codegen caches) on the smallest sf so timed
    # runs measure the plan, not first-compilation
    for n in names:
        try:
            run_one(spark, n, "/root/testdata/sf0.001")
        except Exception:
            pass

    # best-of-2: the min filters one-off scheduler/GC noise from the
    # steady-state per-query time
    times: dict[str, float] = {}
    for n in names:
        t = min(run_one(spark, n, sf_dir), run_one(spark, n, sf_dir))
        times[n] = round(t, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
