"""Registry-wide physical-plan shape regression gate (round-9 task).

The round-8 performance wins are all plan-shaped — guarded broadcasts, leg
reuse, weighted rollups — and nothing in a value-level parity suite stops a
future refactor from silently re-adding a shuffle or degrading a broadcast
hash join to a sort-merge join. This gate freezes, per registry query, the
COUNT of each heavyweight physical node in the executed plan:

- ``shuffle``  — shuffle Exchanges (hash/range/single-partition)
- ``bcast``    — BroadcastExchanges
- ``bhj``      — BroadcastHashJoins
- ``smj``      — SortMergeJoins
- ``shj``      — ShuffledHashJoins
- ``bnlj``     — BroadcastNestedLoopJoins

and diffs every query's current plan against the committed table
``tests/plan_fingerprints.json``.

Update path (INTENTIONAL plan changes only): re-run the generator and
commit the diff together with the code change that caused it —

    python tests/test_plan_fingerprints.py --regen

Fingerprints are recorded under the suite's pinned config (local[4],
spark.sql.shuffle.partitions=4, sf0.001) — plan shapes depend on input
stats, so the gate skips itself when SPARK_GRAFT_TEST_SF_DIR points the
suite at a different scale factor.
"""

from __future__ import annotations

import json
import os
import re

FINGERPRINT_PATH = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")

# node-count dimensions: name -> regex counted over executedPlan().toString()
DIMENSIONS = {
    # "Exchange hashpartitioning…" / "Exchange rangepartitioning…" /
    # "Exchange SinglePartition…" — NOT BroadcastExchange (word-prefix guard)
    "shuffle": r"(?<![A-Za-z])Exchange (?:hash|range|SinglePartition)",
    "bcast": r"BroadcastExchange",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
}


def plan_fingerprint(plan: str) -> dict[str, int]:
    """Count heavyweight node kinds in a physical-plan string. Zero-valued
    dimensions are dropped so the committed table stays readable."""
    fp = {}
    for dim, pat in DIMENSIONS.items():
        n = len(re.findall(pat, plan))
        if n:
            fp[dim] = n
    return fp


def current_fingerprints(spark, sf_dir) -> dict[str, dict[str, int]]:
    import __spark_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name] = plan_fingerprint(plan)
    return dict(sorted(out.items()))


def test_plan_shapes_match_committed_fingerprints(spark, sf_dir):
    if os.environ.get("SPARK_GRAFT_TEST_SF_DIR"):
        import pytest

        pytest.skip("fingerprints are recorded at the default sf0.001 stats")
    with open(FINGERPRINT_PATH) as f:
        want = json.load(f)
    got = current_fingerprints(spark, sf_dir)
    assert set(got) == set(want), (
        f"registry changed: regenerate fingerprints for "
        f"{sorted(set(got) ^ set(want))} "
        f"(python tests/test_plan_fingerprints.py --regen)"
    )
    diffs = {
        name: {"want": want[name], "got": got[name]}
        for name in want
        if want[name] != got[name]
    }
    assert not diffs, (
        "physical plan shape changed — if INTENTIONAL, regenerate with "
        "`python tests/test_plan_fingerprints.py --regen` and commit the "
        f"diff alongside the code change: {json.dumps(diffs, indent=2)}"
    )


if __name__ == "__main__":
    import sys

    if "--regen" not in sys.argv:
        sys.exit("usage: python tests/test_plan_fingerprints.py --regen")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dshackle_archive_spark.session import get_spark

    spark = get_spark("plan-fingerprints", master="local[4]")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    fps = current_fingerprints(spark, "/root/testdata/sf0.001")
    with open(FINGERPRINT_PATH, "w") as f:
        json.dump(fps, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(fps)} fingerprints to {FINGERPRINT_PATH}")
    spark.stop()
