"""Interleaved A/B re-measure for CODE changes (old tree vs new tree).

The env-knob A/B harness (``ab_env_bench.py``) covers optimizations that
keep their old path switchable; structural rewrites have no knob, so this
harness alternates SUBPROCESS sessions between two checkouts of the repo
(an old-HEAD ``git worktree`` and the working tree), one rep pair at a
time: old, new, old, new, ... Ambient host drift hits both arms of each
adjacent pair equally, so the per-pair ratio is trustworthy even when the
absolute seconds are not (see memory: this host swings 1.5-2x on
multi-minute timescales).

Usage:
  python examples/ab_tree_bench.py OLD_TREE NEW_TREE PAIRS q1 [q2 ...]

Each subprocess runs the named queries once each (noop sink, bench.py
methodology) inside one fresh session and prints per-query seconds; the
parent prints per-pair ratios and the median ratio per query.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from dshackle_archive_spark import queries as Q
from dshackle_archive_spark.core.checkpoint import release_all_pinned
from dshackle_archive_spark.session import get_spark

tree, sf_dir, names_json = sys.argv[1], sys.argv[2], sys.argv[3]
names = json.loads(names_json)
data_root = os.path.dirname(sf_dir.rstrip("/"))
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("ab-tree-bench", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
reg = Q.registry()
for n in names:  # warmup on the smallest sf (JIT/codegen)
    reg[n](spark, os.path.join(data_root, "sf0.001")).write.mode(
        "overwrite").format("noop").save()
    release_all_pinned(spark)
out = {}
for n in names:
    t0 = time.perf_counter()
    reg[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
    out[n] = time.perf_counter() - t0
    release_all_pinned(spark)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_tree(tree: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, tree, sf_dir, json.dumps(names)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"worker for {tree} produced no result\nstdout: {proc.stdout[-2000:]}"
        f"\nstderr: {proc.stderr[-2000:]}"
    )


def main() -> None:
    old_tree, new_tree, pairs_s, *names = sys.argv[1:]
    pairs = int(pairs_s)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ratios: dict[str, list[float]] = {n: [] for n in names}
    for i in range(pairs):
        old = run_tree(old_tree, sf_dir, names)
        new = run_tree(new_tree, sf_dir, names)
        for n in names:
            r = new[n] / old[n] if old[n] > 0 else float("nan")
            ratios[n].append(r)
            print(
                f"pair {i + 1}/{pairs} {n}: old {old[n]:.3f}s new {new[n]:.3f}s"
                f" ratio {r:.3f}", flush=True,
            )
    for n in names:
        med = statistics.median(ratios[n])
        print(
            f"MEDIAN {n}: ratio {med:.3f} over {pairs} pairs "
            f"({', '.join(f'{r:.3f}' for r in ratios[n])})"
        )


if __name__ == "__main__":
    main()
