#!/usr/bin/env python
"""Durability-tax probe: reliable (DFS-backed) vs local checkpointing.

`core/checkpoint.reliable_checkpoint` switches every iterative/staged
materialization from executor-resident localCheckpoint blocks to
`df.checkpoint()` files under $SPARK_GRAFT_CHECKPOINT_DIR. On a real
cluster that's the difference between "one preempted executor kills the
job" and "blocks survive any executor loss" — this probe measures what
the durable mode COSTS on the checkpoint-heaviest workloads so the
trade is a number, not a guess:

- d5_neardup_clusters: iterative connected components (checkpoint per
  label-propagation round);
- d12_triangle_count: 4 materializations (edges/deg/orientation/adj);
- a full curate() cycle: checkpoint per pipeline stage.

Run: ``python examples/stress_checkpoint.py`` (idle machine; local
disk stands in for the DFS — real HDFS/S3 adds network, so treat the
measured delta as the FLOOR of the durability tax).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dshackle_archive_spark.core.checkpoint import CHECKPOINT_DIR_ENV
from dshackle_archive_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn, reps: int = 3) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    spark = get_spark("stress-checkpoint")
    import dshackle_archive_spark.queries as Q
    from dshackle_archive_spark.plans.curate_plan import curate
    from dshackle_archive_spark.sources.tables import load_tables

    reg = Q.registry()
    docs = load_tables(spark, SF)["documents"]
    reg["a1_islands"](spark, SF).collect()  # warm

    workloads = {
        "d5_neardup_clusters": lambda: reg["d5_neardup_clusters"](spark, SF).collect(),
        "d12_triangle_count": lambda: reg["d12_triangle_count"](spark, SF).collect(),
        "curate_cycle": lambda: curate(docs)[1],
    }

    out: dict = {}
    with tempfile.TemporaryDirectory() as ckpt_dir:
        for mode in ("local", "reliable"):
            if mode == "reliable":
                os.environ[CHECKPOINT_DIR_ENV] = ckpt_dir
            else:
                os.environ.pop(CHECKPOINT_DIR_ENV, None)
            for name, fn in workloads.items():
                out.setdefault(name, {})[mode] = timed(fn)
        os.environ.pop(CHECKPOINT_DIR_ENV, None)

    for name, m in out.items():
        m["tax"] = round(m["reliable"] / m["local"], 2)
    print(json.dumps({"probe": "checkpoint_tax", "sf_dir": SF, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
