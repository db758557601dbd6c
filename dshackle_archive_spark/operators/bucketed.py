"""Bucketed-table co-location — big-big joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (blocks↔txes by height,
docs↔signatures by doc) is shuffling both sides on the key. Spark's answer
is bucketing: write each table hash-partitioned (and optionally sorted) by
the join key ONCE via ``bucketBy(...).saveAsTable``; every later equi join
on that key reads bucket-aligned files and plans a SortMergeJoin with ZERO
Exchange operators — the shuffle was prepaid at write time and amortizes
over every subsequent query.

This is the storage-layout counterpart of `broadcast` (for small dims) and
salting (for skew): the three levers SURVEY's scale design calls out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.

    ``n_buckets`` should match the target parallelism of later joins — on a
    1000-executor cluster, thousands; bucket width ≲ executor memory."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.

    With matching bucketing this plans exchange-free (verify with
    ``assert_no_exchange``); mismatched bucketing degrades gracefully to a
    normal shuffled join."""
    l = spark.table(left_name)
    r = spark.table(right_name)
    return l.join(r, l[left_key] == r[right_key], how)


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
