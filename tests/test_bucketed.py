"""Bucketed-table co-location: the prepaid-shuffle join path.

The scale claim is concrete and plan-verifiable: two tables bucketed on
their join key produce a SortMergeJoin with ZERO Exchange operators —
the join shuffles nothing at query time."""

import pytest
from pyspark.sql import functions as F

from dshackle_archive_spark.operators.bucketed import (
    colocated_join,
    count_exchanges,
    write_bucketed,
)
from dshackle_archive_spark.sources.tables import load_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "t_li_bucketed", "l_orderkey", n_buckets=8)
    write_bucketed(o, "t_o_bucketed", "o_orderkey", n_buckets=8)
    yield li, o
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_colocated_join_is_exchange_free(spark, bucketed_pair):
    li, o = bucketed_pair
    # disable broadcast so the bucketing (not a broadcast) must remove the
    # shuffle — the big-big join case bucketing exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "t_li_bucketed", "t_o_bucketed",
                           "l_orderkey", "o_orderkey")
        assert count_exchanges(j) == 0  # the shuffle was prepaid at write
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # and the result is the same as the plain shuffled join
        expected = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
        assert j.count() == expected

        # the same join WITHOUT bucketing shuffles both sides
        plain = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        assert count_exchanges(plain) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_is_exchange_free(spark, bucketed_pair):
    """Bucketing also prepays the groupBy shuffle on the bucket key."""
    j = spark.table("t_li_bucketed").groupBy("l_orderkey").agg(
        F.count("*").alias("n")
    )
    assert count_exchanges(j) == 0
    assert j.count() == spark.table("t_li_bucketed").select("l_orderkey").distinct().count()
