"""Isolation re-measure + plan capture for named registry queries.

The bench harness's own defense log shows whole-suite windows can be
load-polluted; per the round-11 precedent, individual queries are re-timed
in an idle warm session (3 reps, median, noop sink — bench.py methodology)
and their ``explain("formatted")`` output is captured for the plan record.

Usage:
  python examples/isolation_bench.py [--plans DIR SUFFIX] q1 q2 ...

With ``--plans plans/r11 before`` each query's formatted plan is written to
``plans/r11/<query>_before.txt`` alongside the timing line.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dshackle_archive_spark import queries as Q  # noqa: E402
from dshackle_archive_spark.core.checkpoint import release_all_pinned  # noqa: E402
from dshackle_archive_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    plans_dir = suffix = None
    if args and args[0] == "--plans":
        plans_dir, suffix = args[1], args[2]
        args = args[3:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BENCH_REPS", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    data_root = os.path.dirname(sf_dir.rstrip("/"))
    spark = get_spark("isolation-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()

    for n in names:  # warmup (JIT/codegen) on the smallest sf
        reg[n](spark, os.path.join(data_root, "sf0.001")).write.mode(
            "overwrite"
        ).format("noop").save()
        release_all_pinned(spark)

    out = {}
    for n in names:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            reg[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
            release_all_pinned(spark)
        out[n] = (statistics.median(ts), min(ts))
        print(f"{n}: median {out[n][0]:.3f}s best {out[n][1]:.3f}s reps={reps}", flush=True)
        if plans_dir:
            df = reg[n](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{n}_{suffix}.txt"), "w") as f:
                f.write(plan)
            release_all_pinned(spark)
    spark.stop()


if __name__ == "__main__":
    main()
