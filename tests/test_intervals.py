"""Distributed interval kernel vs the plain-Python kernel (same semantics)."""

from dshackle_archive_spark.core import Range, merge_ranges, subtract_ranges
from dshackle_archive_spark.operators import intervals as I


def rows_to_ranges(df):
    return sorted((r["start"], r["end"]) for r in df.collect())


def test_islands_basic(spark):
    heights = [1, 2, 3, 7, 8, 10, 100, 101]
    df = spark.createDataFrame([(h,) for h in heights], "height long")
    got = rows_to_ranges(I.islands(df))
    assert got == [(1, 3), (7, 8), (10, 10), (100, 101)]


def test_islands_dedup_and_buckets(spark):
    # duplicates collapse; islands crossing bucket borders stitch (bucket=5)
    heights = [3, 4, 5, 6, 7, 9, 9, 9, 14, 15, 16]
    df = spark.createDataFrame([(h,) for h in heights], "height long")
    got = rows_to_ranges(I.islands(df, bucket=5))
    assert got == [(3, 7), (9, 9), (14, 16)]


def test_islands_keyed(spark):
    rows = [("a", 1), ("a", 2), ("a", 5), ("b", 2), ("b", 3)]
    df = spark.createDataFrame(rows, "k string, height long")
    got = sorted((r["k"], r["start"], r["end"]) for r in I.islands(df, keys=["k"]).collect())
    assert got == [("a", 1, 2), ("a", 5, 5), ("b", 2, 3)]


def test_merge_range_rows(spark):
    rows = [(5, 9), (1, 3), (4, 4), (20, 25), (22, 30)]
    df = spark.createDataFrame(rows, "start long, end long")
    got = rows_to_ranges(I.merge_range_rows(df))
    expect = [(r.start, r.end) for r in merge_ranges([Range(a, b) for a, b in rows])]
    assert got == expect == [(1, 9), (20, 30)]


def test_complement_ranges(spark):
    df = spark.createDataFrame([(10, 20), (30, 40)], "start long, end long")
    got = rows_to_ranges(I.complement_ranges(df, 0, 100))
    assert got == [(0, 9), (21, 29), (41, 100)]


def test_complement_total_gap(spark):
    # no coverage at all inside [lo,hi]
    df = spark.createDataFrame([(200, 300)], "start long, end long")
    got = rows_to_ranges(I.complement_ranges(df, 0, 100))
    assert got == [(0, 100)]


def test_missing_ranges_from_heights(spark):
    present = [0, 1, 2, 5, 6, 99]
    df = spark.createDataFrame([(h,) for h in present], "height long")
    got = rows_to_ranges(I.missing_ranges(df, 0, 100))
    assert got == [(3, 4), (7, 98), (100, 100)]


def test_subtract_intervals_matches_python(spark):
    base = [(0, 100), (200, 250)]
    cuts = [(10, 20), (30, 40), (90, 210), (250, 250)]
    bdf = spark.createDataFrame(base, "start long, end long")
    cdf = spark.createDataFrame(cuts, "start long, end long")
    got = rows_to_ranges(I.subtract_intervals(bdf, cdf))
    expect = [
        (r.start, r.end)
        for r in subtract_ranges(
            [Range(a, b) for a, b in base], [Range(a, b) for a, b in cuts]
        )
    ]
    assert got == expect == [(0, 9), (21, 29), (41, 89), (211, 249)]


def test_subtract_intervals_no_cuts(spark):
    bdf = spark.createDataFrame([(0, 10)], "start long, end long")
    cdf = spark.createDataFrame([], "start long, end long")
    got = rows_to_ranges(I.subtract_intervals(bdf, cdf))
    assert got == [(0, 10)]


def test_subtract_intervals_disjoint_cut(spark):
    bdf = spark.createDataFrame([(0, 10)], "start long, end long")
    cdf = spark.createDataFrame([(50, 60)], "start long, end long")
    got = rows_to_ranges(I.subtract_intervals(bdf, cdf))
    assert got == [(0, 10)]


def test_gaps_direct_bounds_df_matches_scalar(spark):
    heights = [1, 2, 3, 7, 8, 10, 100, 101]
    df = spark.createDataFrame([(h,) for h in heights], "height long")
    bounds = spark.createDataFrame([(0, 120)], "lo long, hi long")
    got = rows_to_ranges(I.gaps_direct_bounds_df(df, bounds))
    want = rows_to_ranges(I.missing_ranges(df, 0, 120))
    assert got == want == [(0, 0), (4, 6), (9, 9), (11, 99), (102, 120)]


def test_gaps_direct_bounds_df_empty_coverage(spark):
    df = spark.createDataFrame([], "height long")
    bounds = spark.createDataFrame([(5, 9)], "lo long, hi long")
    assert rows_to_ranges(I.gaps_direct_bounds_df(df, bounds)) == [(5, 9)]


def test_gaps_direct_bounds_df_is_lazy(spark):
    """Constructing the bounded-gaps plan launches ZERO Spark jobs — the
    bound rides inside the plan instead of a driver collect round-trip."""
    sc = spark.sparkContext
    df = spark.createDataFrame([(h,) for h in range(20)], "height long")
    bounds = df.agg({"height": "max"}).selectExpr(
        "cast(0 as long) as lo", "`max(height)` as hi"
    )
    sc.setJobGroup("gaps-plan-build", "plan build only")
    try:
        out = I.gaps_direct_bounds_df(df, bounds)
        jobs = list(sc.statusTracker().getJobIdsForGroup("gaps-plan-build"))
    finally:
        sc.setJobGroup("gaps-plan-run", "action")
    assert jobs == [], f"plan build launched jobs: {jobs}"
    assert out.count() == 0  # dense 0..19 has no gaps


def test_a3_bound_is_inside_the_plan(spark, sf_dir):
    """a3's domain bound must appear as an aggregate INSIDE the plan (one
    action), not as a literal collected beforehand."""
    from dshackle_archive_spark import queries as Q

    df = Q.registry()["a3_gap_detection"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "max(event_id" in plan, plan[:2000]
    assert df.count() > 0


def test_subtract_intervals_plans_no_nested_loop(spark):
    """The sweep-line rewrite must never plan a nested-loop/cartesian join
    (the pre-rewrite form range-joined base islands to cuts unbanded —
    11 s at sf0.1 on corpus-derived islands)."""
    from dshackle_archive_spark.operators import intervals as I

    b = spark.createDataFrame([(0, 10), (20, 30)], "start long, end long")
    c = spark.createDataFrame([(5, 7), (25, 40)], "start long, end long")
    plan = (
        I.subtract_intervals(b, c)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
