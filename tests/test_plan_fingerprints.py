"""Registry-wide physical-plan shape regression gate (rounds 9-10).

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
- ``cartesian``— CartesianProducts (also a hard invariant: always 0)

and diffs every query's current plan against a committed table.

TWO tables are committed (round-10 task — plan shapes depend on input
STATS, and broadcast-vs-SMJ choices flip between scale factors, so the
sf0.001 gate alone left the plans the bench actually executes unguarded):

- ``tests/plan_fingerprints.json``      — recorded at sf0.001, asserted by
  the default suite run;
- ``tests/plan_fingerprints_sf01.json`` — recorded at sf0.1, asserted by
  ``bench.py`` on every official bench run (stamped into BENCH_DETAIL.json
  as ``plan_drift``) and by this suite when pointed at sf0.1.

Update path (INTENTIONAL plan changes only): re-run the generator and
commit the diff together with the code change that caused it —

    python tests/test_plan_fingerprints.py --regen            # sf0.001 table
    python tests/test_plan_fingerprints.py --regen --sf 0.1   # sf0.1 table
    python tests/test_plan_fingerprints.py --regen --sf 0.1 --only d22_ktruss_prune

``--only KEY[,KEY...]`` (round-11 task) regenerates just the named
entries and leaves every other committed entry byte-identical — an
intentional single-plan change should not force a full re-record. The
full sf0.1 pass builds (not executes) all ~174 plans against the
bench-scale tables and takes ~6-8 min on local[4]; a full sf0.001 pass
~4-5 min; an --only pass is seconds per key. Fingerprints count plan
NODES, so any scale dir with the tables present works for --only as
long as it matches the table being updated (the tool derives the dir
from --sf).

Stats-robust invariants (asserted at ANY scale factor, no committed table
needed): no query's plan may contain a CartesianProduct — the one join
strategy that cannot survive a 100x scale-up under any stats.
"""

from __future__ import annotations

import json
import os
import re

import pytest

FINGERPRINT_TABLES = {
    "0.001": os.path.join(os.path.dirname(__file__), "plan_fingerprints.json"),
    "0.1": os.path.join(os.path.dirname(__file__), "plan_fingerprints_sf01.json"),
}

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
    "cartesian": r"CartesianProduct",
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


def current_fingerprints(
    spark, sf_dir, only: list[str] | None = None
) -> dict[str, dict[str, int]]:
    import __spark_entry__ as entrymod
    from dshackle_archive_spark.core.checkpoint import release_all_pinned

    registry = entrymod.queries()
    if only is not None:
        unknown = sorted(set(only) - set(registry))
        if unknown:
            raise KeyError(f"--only names not in the registry: {unknown}")
        registry = {k: registry[k] for k in only}
    out = {}
    for name, fn in registry.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name] = plan_fingerprint(plan)
    # constructing iterative queries materializes checkpoints; a full
    # registry pass (and the determinism double-pass) must not leave
    # 170 queries' worth of pinned blocks behind
    release_all_pinned(spark)
    return dict(sorted(out.items()))


def merged_table(
    existing: dict[str, dict[str, int]],
    fresh: dict[str, dict[str, int]],
    only: list[str] | None,
) -> dict[str, dict[str, int]]:
    """Merge a (possibly partial) regen pass into the committed table. A
    full pass (only=None) REPLACES the table — removed registry keys drop
    out. An --only pass updates exactly the named keys and must leave every
    other committed entry untouched (byte-identical after json round-trip);
    the partial-regen test enforces that contract."""
    if only is None:
        return dict(sorted(fresh.items()))
    out = dict(existing)
    for k in only:
        out[k] = fresh[k]
    return dict(sorted(out.items()))


def fingerprint_diff(
    want: dict[str, dict[str, int]], got: dict[str, dict[str, int]]
) -> dict:
    """Registry-key and per-query shape differences between two tables —
    shared by the suite gate and bench.py's per-round sf0.1 assert."""
    out: dict = {}
    if set(got) != set(want):
        out["registry_changed"] = sorted(set(got) ^ set(want))
    shape = {
        name: {"want": want[name], "got": got[name]}
        for name in set(want) & set(got)
        if want[name] != got[name]
    }
    if shape:
        out["shape_changed"] = shape
    return out


def _table_for(sf_dir: str) -> str | None:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir.rstrip("/"))
    return FINGERPRINT_TABLES.get(m.group(1)) if m else None


def _suite_sf_dir() -> str:
    # module-scope twin of the conftest function-scoped sf_dir fixture
    # (a module fixture cannot request a function fixture)
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def fingerprints_once(spark):
    """One full-registry fingerprint pass per suite run — the match gate's
    input. (Through round 11 this fixture computed TWO passes so the
    determinism check rode along; that doubled the most expensive fixture
    of the default tier, so the second pass now lives in the slow-marked
    determinism test itself.)"""
    return current_fingerprints(spark, _suite_sf_dir())


def test_plan_shapes_match_committed_fingerprints(fingerprints_once):
    table = _table_for(_suite_sf_dir())
    if table is None or not os.path.exists(table):
        pytest.skip(f"no committed fingerprint table for {_suite_sf_dir()}")
    with open(table) as f:
        want = json.load(f)
    diffs = fingerprint_diff(want, fingerprints_once)
    assert not diffs, (
        "physical plan shape changed — if INTENTIONAL, regenerate with "
        "`python tests/test_plan_fingerprints.py --regen` (add `--sf 0.1` "
        "for the bench-scale table) and commit the diff alongside the code "
        f"change: {json.dumps(diffs, indent=2)}"
    )


@pytest.mark.slow  # a second full-registry pass exists only to check rendering determinism
def test_regen_is_deterministic(spark, fingerprints_once):
    """Round-9 verdict task 8: the gate itself must not rot — if plan
    RENDERING ever becomes nondeterministic (unstable ids leaking into the
    counted node names, registry iteration order, release interference),
    every --regen would churn the committed table and the gate degrades to
    noise. Two back-to-back full passes must serialize byte-identically."""
    a, b = fingerprints_once, current_fingerprints(spark, _suite_sf_dir())
    assert json.dumps(a, sort_keys=True) == json.dumps(b, sort_keys=True), {
        k: (a.get(k), b.get(k)) for k in set(a) | set(b) if a.get(k) != b.get(k)
    }


def test_partial_regen_leaves_other_entries_byte_identical(spark):
    """Round-11 task: ``--regen --only KEY`` must rewrite exactly the named
    entries — every other committed entry survives the merge byte-identical
    (json round-trip), so an intentional single-plan change never churns
    unrelated fingerprints under time pressure."""
    table = _table_for(_suite_sf_dir())
    if table is None or not os.path.exists(table):
        pytest.skip(f"no committed fingerprint table for {_suite_sf_dir()}")
    with open(table) as f:
        committed = json.load(f)
    key = sorted(committed)[0]
    fresh = current_fingerprints(spark, _suite_sf_dir(), only=[key])
    assert set(fresh) == {key}  # --only computed nothing else
    merged = merged_table(committed, fresh, [key])
    strip = lambda t: json.dumps(  # noqa: E731
        {k: v for k, v in t.items() if k != key}, sort_keys=True
    )
    assert strip(merged) == strip(committed)
    assert set(merged) == set(committed)
    with pytest.raises(KeyError):  # unknown keys fail loudly, not silently
        current_fingerprints(spark, _suite_sf_dir(), only=["not_a_registry_key"])


# NOTE: the stats-robust any-SF invariants (0 CartesianProducts, BNLJ only
# on the allow-listed 1-row-bound queries) live in
# test_registry_conventions.test_no_cartesian_products_anywhere — that test
# runs at ANY SPARK_GRAFT_TEST_SF_DIR, complementing the committed-table
# gates here. The `cartesian` dimension in DIMENSIONS additionally freezes
# the zero into both committed tables.


if __name__ == "__main__":
    import sys

    if "--regen" not in sys.argv:
        sys.exit(
            "usage: python tests/test_plan_fingerprints.py --regen"
            " [--sf 0.1] [--only KEY[,KEY...]]"
        )
    sf = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else "0.001"
    if sf not in FINGERPRINT_TABLES:
        sys.exit(f"no table registered for sf{sf} ({sorted(FINGERPRINT_TABLES)})")
    only = (
        sys.argv[sys.argv.index("--only") + 1].split(",")
        if "--only" in sys.argv
        else None
    )
    table_path = FINGERPRINT_TABLES[sf]
    existing: dict = {}
    if os.path.exists(table_path):
        with open(table_path) as f:
            existing = json.load(f)
    if only is not None and not existing:
        sys.exit("--only requires an existing committed table to merge into")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dshackle_archive_spark.session import get_spark

    spark = get_spark("plan-fingerprints", master="local[4]")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    fps = current_fingerprints(spark, f"/root/testdata/sf{sf}", only=only)
    out = merged_table(existing, fps, only)
    with open(table_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    what = f"{len(fps)} of {len(out)}" if only is not None else str(len(out))
    print(f"wrote {what} fingerprints to {table_path}")
    spark.stop()
