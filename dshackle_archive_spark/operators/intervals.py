"""Distributed interval algebra: islands, gaps, interval subtraction.

Replaces the reference's ``RangeBag`` (``/root/reference/src/archiver/
range_bag.rs:7-95``) and gap detection (``src/storage/mod.rs:143-207``) with
gaps-and-islands SQL.

Scale design
------------
A naive islands query is ``Window.orderBy(col)`` over the whole table — a
single-partition global sort that dies at 100 TB. ``islands`` therefore runs
two-level:

1. per-bucket islands with ``Window.partitionBy(bucket)`` — fully parallel,
   shuffle on a high-cardinality key;
2. a second islands pass over the per-bucket summaries (≤ islands+1 rows per
   bucket, i.e. metadata-scale) to stitch islands that cross bucket borders.

The stage-2 input is orders of magnitude smaller than the data, so its global
window is cheap. All expressions are native Catalyst (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# stage-1 bucket width: small enough that realistic height domains (~1e5 in
# tests, ~2e7 for a full chain) spread across many parallel windows, large
# enough that stage-2 sees only thousands of fragment rows even at 1e10
# heights
DEFAULT_BUCKET = 8_192


def _islands_single_pass(
    df: DataFrame, start: str, end: str, keys: list[str], adjacency: bool = True
) -> DataFrame:
    """Merge connected [start,end] rows into maximal disjoint islands.

    Classic gaps-and-islands: a row opens a new island iff its start exceeds
    the running max of previous ends (+1 when ``adjacency`` counts touching
    ranges as connected; without it only true overlap connects — needed for
    overlap-dedup, where adjacent ranges are NOT rivals).
    """
    w = Window.partitionBy(*keys).orderBy(start, end) if keys else Window.orderBy(start, end)
    prev_max_end = F.max(F.col(end)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    slack = 1 if adjacency else 0
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start) > prev_max_end + slack), F.lit(1)
    ).otherwise(F.lit(0))
    df = df.withColumn("_new", new_island)
    df = df.withColumn(
        "_island", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    grp = keys + ["_island"]
    return (
        df.groupBy(*grp)
        .agg(F.min(start).alias("start"), F.max(end).alias("end"))
        .drop("_island")
    )


def islands(
    df: DataFrame,
    col: str = "height",
    keys: list[str] | None = None,
    bucket: int = DEFAULT_BUCKET,
) -> DataFrame:
    """Distinct integer ``col`` values -> maximal contiguous ``[start, end]`` ranges.

    Reference semantics: ``RangeBag.compact()`` over single heights.
    Output columns: ``keys... , start, end, n_heights``.
    """
    keys = keys or []
    # no distinct(): duplicate heights satisfy h <= prev+1 and join the same
    # island, so deduping first would only add a shuffle on a different key
    pts = df.select(*keys, F.col(col).cast("long").alias("h"))
    # stage 1: islands within each bucket (parallel window)
    pts = pts.withColumn("_b", F.floor(F.col("h") / bucket))
    w1 = Window.partitionBy(*keys, "_b").orderBy("h")
    frag = (
        pts.withColumn("_prev", F.lag("h").over(w1))
        .withColumn(
            "_new",
            F.when(F.col("_prev").isNull() | (F.col("h") > F.col("_prev") + 1), 1).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(w1.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(*keys, "_b", "_island")
        .agg(F.min("h").alias("start"), F.max("h").alias("end"))
        .drop("_b", "_island")
    )
    # stage 2: stitch fragments across bucket borders (metadata-scale input)
    out = _islands_single_pass(frag, "start", "end", keys)
    return out.withColumn("n_heights", F.col("end") - F.col("start") + 1)


def merge_range_rows(
    df: DataFrame,
    start: str = "start",
    end: str = "end",
    keys: list[str] | None = None,
    adjacency: bool = True,
) -> DataFrame:
    """Union of [start,end] interval rows -> maximal disjoint intervals.

    Interval rows are metadata (file inventories, chunk lists) — already
    small; one windowed pass suffices. ``adjacency=False`` merges only
    truly-overlapping ranges (overlap-island detection for dedup)."""
    keys = keys or []
    return _islands_single_pass(df.select(*keys, start, end), start, end, keys, adjacency)


def complement_ranges(
    islands_df: DataFrame,
    lo: int,
    hi: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Gaps of an island set within [lo, hi] — closed form, no explode.

    This is the reference's missing-range detection
    (``storage/mod.rs:148-160``: requested − covered): the gap before each
    island, plus the tail gap after the last island. Works on island rows
    (metadata-scale), so the global window is cheap at any data size.
    """
    keys = keys or []
    spark = islands_df.sparkSession
    w = Window.partitionBy(*keys).orderBy("start") if keys else Window.orderBy("start")
    clipped = islands_df.filter((F.col("end") >= lo) & (F.col("start") <= hi))
    # keys (or the whole input, when unkeyed) with zero coverage inside
    # [lo,hi] -> the entire window is one gap
    if keys:
        domain = islands_df.select(*keys).distinct()
    else:
        domain = spark.range(1).select(F.lit(1).alias("_one")).drop("_one")
    uncovered = (
        domain.join(clipped.select(*keys).distinct(), on=keys, how="left_anti")
        if keys
        else domain.join(clipped.limit(1), F.lit(True), "left_anti")
    ).select(
        *keys,
        F.lit(lo).cast("long").alias("gap_start"),
        F.lit(hi).cast("long").alias("gap_end"),
    )
    gaps = (
        clipped.withColumn("_prev_end", F.lag("end").over(w))
        .select(
            *keys,
            F.when(F.col("_prev_end").isNull(), F.lit(lo))
            .otherwise(F.col("_prev_end") + 1)
            .alias("gap_start"),
            (F.col("start") - 1).alias("gap_end"),
        )
        .filter(F.col("gap_start") <= F.col("gap_end"))
    )
    tail = (
        clipped.groupBy(*keys)
        .agg(F.max("end").alias("_max_end"))
        .select(
            *keys,
            (F.col("_max_end") + 1).alias("gap_start"),
            F.lit(hi).cast("long").alias("gap_end"),
        )
        .filter(F.col("gap_start") <= F.col("gap_end"))
    )
    out = gaps.unionByName(tail).unionByName(uncovered)
    return out.select(
        *keys,
        F.greatest(F.col("gap_start"), F.lit(lo)).alias("start"),
        F.least(F.col("gap_end"), F.lit(hi)).alias("end"),
    )


def gaps_direct(
    df: DataFrame,
    lo: int,
    hi: int,
    col: str = "height",
    bucket: int = DEFAULT_BUCKET,
) -> DataFrame:
    """Gaps of a covered-heights set within [lo, hi], one windowed pass.

    Skips the islands materialization entirely: within-bucket gaps come from
    a single ``lag`` window (parallel per bucket), cross-bucket/head gaps
    from the per-bucket min/max summary (metadata-scale), the tail gap from
    one aggregate. Same result as islands→complement with ~2 fewer stages.
    """
    spark = df.sparkSession
    pts = df.select(F.col(col).cast("long").alias("h")).filter(
        (F.col("h") >= lo) & (F.col("h") <= hi)
    )
    pts = pts.withColumn("_b", F.floor(F.col("h") / bucket))
    w = Window.partitionBy("_b").orderBy("h")
    within = (
        pts.withColumn("_prev", F.lag("h").over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("h") > F.col("_prev") + 1))
        .select((F.col("_prev") + 1).alias("start"), (F.col("h") - 1).alias("end"))
    )
    summary = pts.groupBy("_b").agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    ws = Window.orderBy("mn")
    head_and_cross = (
        summary.withColumn("_prev_mx", F.lag("mx").over(ws))
        .select(
            F.when(F.col("_prev_mx").isNull(), F.lit(lo))
            .otherwise(F.col("_prev_mx") + 1)
            .alias("start"),
            (F.col("mn") - 1).alias("end"),
        )
        .filter(F.col("start") <= F.col("end"))
    )
    tail = (
        summary.agg(F.max("mx").alias("m"))
        .select((F.col("m") + 1).alias("start"), F.lit(hi).cast("long").alias("end"))
        .filter(F.col("start") <= F.col("end"))
    )
    # empty coverage -> the whole window is one gap
    uncovered = (
        spark.range(1)
        .join(pts.limit(1), F.lit(True), "left_anti")
        .select(F.lit(lo).cast("long").alias("start"), F.lit(hi).cast("long").alias("end"))
    )
    return within.unionByName(head_and_cross).unionByName(tail).unionByName(uncovered)


def gaps_direct_bounds_df(
    df: DataFrame,
    bounds: DataFrame,
    col: str = "height",
    bucket: int = DEFAULT_BUCKET,
) -> DataFrame:
    """``gaps_direct`` with the [lo, hi] window read from a 1-row ``bounds``
    DataFrame (columns ``lo``, ``hi``) broadcast into the plan.

    When the bound is itself an aggregate of the data (a3's
    ``max(event_id)``), folding it in as a broadcast build side keeps the
    whole gap detection a single Spark action — no driver ``collect()``
    round-trip between computing the bound and using it
    (``storage/mod.rs:143-207`` derives the requested window the same way,
    inside one pass)."""
    b = F.broadcast(
        bounds.select(
            F.col("lo").cast("long").alias("_lo"), F.col("hi").cast("long").alias("_hi")
        )
    )
    pts = (
        df.select(F.col(col).cast("long").alias("h"))
        .crossJoin(b)
        .filter((F.col("h") >= F.col("_lo")) & (F.col("h") <= F.col("_hi")))
    )
    pts = pts.withColumn("_b", F.floor(F.col("h") / bucket))
    w = Window.partitionBy("_b").orderBy("h")
    within = (
        pts.withColumn("_prev", F.lag("h").over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("h") > F.col("_prev") + 1))
        .select((F.col("_prev") + 1).alias("start"), (F.col("h") - 1).alias("end"))
    )
    # _lo/_hi are constant after the broadcast join; first() carries them
    # through the metadata-scale summary without another join
    summary = pts.groupBy("_b").agg(
        F.min("h").alias("mn"),
        F.max("h").alias("mx"),
        F.first("_lo").alias("_lo"),
        F.first("_hi").alias("_hi"),
    )
    ws = Window.orderBy("mn")
    head_and_cross = (
        summary.withColumn("_prev_mx", F.lag("mx").over(ws))
        .select(
            F.when(F.col("_prev_mx").isNull(), F.col("_lo"))
            .otherwise(F.col("_prev_mx") + 1)
            .alias("start"),
            (F.col("mn") - 1).alias("end"),
        )
        .filter(F.col("start") <= F.col("end"))
    )
    tail = (
        summary.agg(F.max("mx").alias("m"), F.first("_hi").alias("_hi"))
        .select((F.col("m") + 1).alias("start"), F.col("_hi").alias("end"))
        .filter(F.col("start") <= F.col("end"))
    )
    uncovered = b.join(pts.limit(1), F.lit(True), "left_anti").select(
        F.col("_lo").alias("start"), F.col("_hi").alias("end")
    )
    return within.unionByName(head_and_cross).unionByName(tail).unionByName(uncovered)


def missing_ranges(
    covered: DataFrame,
    lo: int,
    hi: int,
    col: str = "height",
    keys: list[str] | None = None,
    is_ranges: bool = False,
) -> DataFrame:
    """Requested [lo,hi] minus covered heights/ranges -> missing [start,end] rows.

    ``is_ranges=True`` treats ``covered`` as interval rows (start/end cols);
    otherwise as a height column. When a key column is given and some key has
    no coverage at all, that key is absent from the output (callers
    cross-join the expected key domain first — see inventory.find_incomplete).
    The unkeyed height path takes the fused single-window ``gaps_direct``.
    """
    if not keys and not is_ranges:
        return gaps_direct(covered, lo, hi, col)
    isl = (
        merge_range_rows(covered, keys=keys or [])
        if is_ranges
        else islands(covered, col, keys=keys or [])
    )
    return complement_ranges(isl, lo, hi, keys=keys or [])


def subtract_intervals(
    base: DataFrame,
    cuts: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Interval-set subtraction ``base − cuts`` on [start,end] rows.

    Sweep line: merge both sides to disjoint islands, turn every island
    into +1/−1 boundary deltas tagged by side, and walk the combined
    timeline once per key with a running-level window — positions where
    the base level is 1 and the cut level is 0 open a result segment,
    the next boundary closes it. Because both inputs are MERGED islands
    the levels never exceed 1 and every boundary flips activity, so the
    emitted segments are maximal by construction (no re-merge pass).

    Cost: one union + one per-position reduce + one window sort over
    boundary rows — linear in island count. (An earlier form range-joined
    base islands to overlapping cuts with no banding: a
    BroadcastNestedLoopJoin that was fine for file-range metadata but
    measured 11 s when a2 fed it ~50k corpus-derived islands a side —
    base×cut pair checks. The sweep runs the same case in <1 s.)
    """
    keys = keys or []
    b = merge_range_rows(base, keys=keys)
    c = merge_range_rows(cuts, keys=keys)

    def deltas(df: DataFrame, db: int, dc: int) -> DataFrame:
        return df.select(
            *keys, F.col("start").alias("pos"), F.lit(db).alias("db"), F.lit(dc).alias("dc")
        ).unionByName(
            df.select(
                *keys,
                (F.col("end") + 1).alias("pos"),
                F.lit(-db).alias("db"),
                F.lit(-dc).alias("dc"),
            )
        )

    bounds = (
        deltas(b, 1, 0)
        .unionByName(deltas(c, 0, 1))
        .groupBy(*keys, "pos")
        .agg(F.sum("db").alias("db"), F.sum("dc").alias("dc"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lead_w = Window.partitionBy(*keys).orderBy("pos")
    run = bounds.select(
        *keys,
        "pos",
        F.sum("db").over(w).alias("base_lv"),
        F.sum("dc").over(w).alias("cut_lv"),
        F.lead("pos").over(lead_w).alias("next_pos"),
    )
    return run.filter(
        (F.col("base_lv") > 0) & (F.col("cut_lv") == 0)
    ).select(
        *keys,
        F.col("pos").alias("start"),
        (F.col("next_pos") - 1).alias("end"),
    )


