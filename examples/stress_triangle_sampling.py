#!/usr/bin/env python
"""DOULION speedup/error sweep at ×8 edges (~10M-edge co-purchase graph).

d12's exact counter is triangle-OUTPUT-bound at this scale (round-8 probe:
22.7 s); this measures what the `triangle_counts(sample_p=…)` dial buys —
wall time AND estimate error vs the exact global count — at p ∈
{0.5, 0.25, 0.1} on the same ×8 key-shifted graph stress_graph_x8.py uses.

Prints one JSON line {p: {sec, est, rel_err_pct}, exact: {sec, triangles}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.session import get_spark
from stress_graph_x8 import build_scaled  # the same ×8 lineitem builder

REPS = int(os.environ.get("BENCH_REPS", "3"))


def main() -> None:
    scaled = "/tmp/sf0.1x8_graph"
    if not os.path.exists(os.path.join(scaled, "lineitem.parquet")):
        build_scaled(scaled)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-triangle-sampling", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * int(cpus)))

    from dshackle_archive_spark.operators.dedup import triangle_counts
    from dshackle_archive_spark.queries.dedup import _copurchase_edges

    def total(sample_p=None) -> tuple[float, float]:
        t0 = time.perf_counter()
        edges = _copurchase_edges(spark, scaled)
        tri = triangle_counts(edges, src="u", dst="v", canonical=True,
                              sample_p=sample_p)
        tot = tri.agg((F.sum("triangles") / 3).alias("t")).collect()[0]["t"]
        return time.perf_counter() - t0, float(tot)

    total(sample_p=0.5)  # codegen warmup
    out: dict = {}
    exact_ts = [total() for _ in range(REPS)]
    exact_sec = statistics.median(t for t, _ in exact_ts)
    exact_n = exact_ts[0][1]
    out["exact"] = {"sec": round(exact_sec, 2), "triangles": int(exact_n)}
    for p in (0.5, 0.25, 0.1):
        runs = [total(sample_p=p) for _ in range(REPS)]
        sec = statistics.median(t for t, _ in runs)
        est = runs[0][1]
        out[f"p={p}"] = {
            "sec": round(sec, 2),
            "est": round(est, 1),
            "rel_err_pct": round((est - exact_n) / exact_n * 100, 2),
            "speedup": round(exact_sec / sec, 2),
        }
        print(f"# p={p}: {out[f'p={p}']}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
