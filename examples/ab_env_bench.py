"""Interleaved A/B re-measure for env-switchable optimizations.

Cross-window absolute timings on this host drift 15-25% (see PERF.md's
round-7/10 canary record), so each optimization that keeps its old path
behind an env knob is measured as an INTERLEAVED A/B inside one warm
session: rep pairs alternate (A, B, A, B, ...), so ambient load hits both
arms equally and the ratio is trustworthy even when absolutes are not.

Usage:
  python examples/ab_env_bench.py VAR A_VALUE B_VALUE q1 [q2 ...]

``VAR`` starting with ``spark.`` is set as a runtime SQL conf
(``spark.conf.set``) instead of a process env var — for A/B-ing
runtime-settable session settings (AQE knobs, thresholds) the same way.

Example (round-11 CC driver-finish hybrid):
  python examples/ab_env_bench.py SPARK_GRAFT_CC_DRIVER_EDGES 0 16000000 \
      d8_chain_components d13_cluster_profile
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
    env, a_val, b_val, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BENCH_REPS", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    data_root = os.path.dirname(sf_dir.rstrip("/"))
    spark = get_spark("ab-env-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.registry()

    def set_var(v: str) -> None:
        if env.startswith("spark."):
            spark.conf.set(env, v)
        else:
            os.environ[env] = v

    def run(n: str, d: str) -> float:
        t0 = time.perf_counter()
        reg[n](spark, d).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        release_all_pinned(spark)
        return dt

    for n in names:  # warmup both arms (JIT/codegen) on the smallest sf
        for v in (a_val, b_val):
            set_var(v)
            run(n, os.path.join(data_root, "sf0.001"))

    for n in names:
        ta, tb = [], []
        for _ in range(reps):
            set_var(a_val)
            ta.append(run(n, sf_dir))
            set_var(b_val)
            tb.append(run(n, sf_dir))
        ma, mb = statistics.median(ta), statistics.median(tb)
        print(
            f"{n}: {env}={a_val} median {ma:.3f}s (best {min(ta):.3f}) | "
            f"{env}={b_val} median {mb:.3f}s (best {min(tb):.3f}) | "
            f"B/A ratio {mb / ma:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
