"""Gap/completeness detection over archive-tree fixtures.

Mirrors the reference's e2e scenarios (``storage/mod.rs:290-610`` — 13 gap
cases; ``verify.rs:373-457`` dup/overlap handling) with golden assertions on
the resulting work lists.
"""

import os

import pytest
from pyspark.sql import functions as F

from dshackle_archive_spark.core import DataKind, Range, range_file_path, single_file_path
from dshackle_archive_spark.operators import inventory as INV
from dshackle_archive_spark.sources import archive as ARC


def make_tree(root, specs):
    """specs: list of (height_or_range, kind, hash?) -> touch files."""
    for spec in specs:
        rng, kind = spec[0], spec[1]
        h = spec[2] if len(spec) > 2 else None
        if isinstance(rng, int):
            rel = single_file_path(rng, kind, block_hash=h)
        else:
            rel = range_file_path(rng, kind)
        p = os.path.join(root, "eth", rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        open(p, "w").close()


def inv_for(spark, tmp_path, specs):
    make_tree(str(tmp_path), specs)
    return ARC.inventory_df(spark, str(tmp_path), "eth")


def missing(spark, tmp_path, specs, lo, hi, kinds=("blocks", "transactions")):
    inv = inv_for(spark, tmp_path, specs)
    rows = INV.find_incomplete_tables(inv, lo, hi, kinds=kinds).collect()
    return sorted((r["kind"], r["start"], r["end"]) for r in rows)


B, T, R = DataKind.BLOCKS, DataKind.TRANSACTIONS, DataKind.TRACES


def test_complete_singles_no_gaps(spark, tmp_path):
    # scenario 1: fully complete range, singles only
    specs = [(h, k) for h in range(100, 110) for k in (B, T)]
    assert missing(spark, tmp_path, specs, 100, 109) == []


def test_missing_one_table_one_height(spark, tmp_path):
    # scenario 2
    specs = [(h, B) for h in range(100, 110)] + [(h, T) for h in range(100, 110) if h != 105]
    assert missing(spark, tmp_path, specs, 100, 109) == [("transactions", 105, 105)]


def test_full_gap(spark, tmp_path):
    # scenario 3: height with no files at all
    specs = [(h, k) for h in (100, 101, 103) for k in (B, T)]
    assert missing(spark, tmp_path, specs, 100, 103) == [
        ("blocks", 102, 102),
        ("transactions", 102, 102),
    ]


def test_large_gap_across_level2_dirs(spark, tmp_path):
    # scenario 4: gap spanning level-2 dirs (999..2001)
    specs = [(h, B) for h in (998, 999, 2002)]
    assert missing(spark, tmp_path, specs, 998, 2002, kinds=("blocks",)) == [
        ("blocks", 1000, 2001)
    ]


def test_range_file_missing_twin(spark, tmp_path):
    # scenario 5: range file missing its txes twin
    specs = [(Range(1000, 1999), B)]
    assert missing(spark, tmp_path, specs, 1000, 1999) == [("transactions", 1000, 1999)]


def test_mixed_single_and_range_coverage(spark, tmp_path):
    # scenario 6
    specs = [(Range(1000, 1999), B), (Range(1000, 1999), T)] + [
        (h, k) for h in range(2000, 2003) for k in (B, T)
    ]
    assert missing(spark, tmp_path, specs, 1000, 2004) == [
        ("blocks", 2003, 2004),
        ("transactions", 2003, 2004),
    ]


def test_empty_archive_everything_missing(spark, tmp_path):
    os.makedirs(tmp_path / "eth", exist_ok=True)
    assert missing(spark, tmp_path, [], 5, 9) == [
        ("blocks", 5, 9),
        ("transactions", 5, 9),
    ]


def test_foreign_files_ignored(spark, tmp_path):
    make_tree(str(tmp_path), [(100, B)])
    os.makedirs(tmp_path / "eth" / "000000000", exist_ok=True)
    open(tmp_path / "eth" / "README.md", "w").close()
    open(tmp_path / "eth" / "000000000" / "notes.txt", "w").close()
    inv = ARC.inventory_df(spark, str(tmp_path), "eth")
    assert inv.count() == 1


def test_duplicate_same_kind_same_range(spark, tmp_path):
    # scenario 7: duplicate same-kind file for one range (fork singles carry
    # distinct hashes → not duplicates; same (range,hash) twice is)
    specs = [(100, B), (100, T)]
    inv = inv_for(spark, tmp_path, specs)
    # inject a duplicate row for the same (range, hash, kind) as a second path
    dup = inv.filter(F.col("kind") == "blocks").withColumn(
        "path", F.concat(F.col("path"), F.lit(".copy"))
    )
    groups = INV.group_ranges(inv.unionByName(dup), kinds=("blocks", "transactions"))
    dups = INV.duplicate_groups(groups, kinds=("blocks", "transactions")).collect()
    assert len(dups) == 1 and dups[0]["n_blocks"] == 2


def test_incomplete_groups_flags(spark, tmp_path):
    specs = [(100, B), (100, T), (101, B)]
    inv = inv_for(spark, tmp_path, specs)
    groups = INV.group_ranges(inv, kinds=("blocks", "transactions"))
    inc = INV.incomplete_groups(groups, kinds=("blocks", "transactions")).collect()
    assert len(inc) == 1
    assert inc[0]["start"] == 101 and inc[0]["missing_transactions"] is True


def test_dedup_largest_covering(spark, tmp_path):
    # scenario 8: overlapping ranges → keep the widest
    specs = [(Range(1000, 1999), B), (Range(1000, 1099), B), (Range(1050, 1149), B)]
    inv = inv_for(spark, tmp_path, specs)
    groups = INV.group_ranges(inv, kinds=("blocks",))
    marked = INV.dedup_largest_covering(groups)
    keep = sorted((r["start"], r["end"]) for r in marked.filter("keep").collect())
    drop = sorted((r["start"], r["end"]) for r in marked.filter("NOT keep").collect())
    assert keep == [(1000, 1999)]
    assert drop == [(1000, 1099), (1050, 1149)]


def test_merge_small_ranges(spark, tmp_path):
    specs = [(Range(100, 104), B), (Range(105, 109), B), (Range(200, 204), B), (Range(300, 1299), B)]
    inv = inv_for(spark, tmp_path, specs)
    groups = INV.group_ranges(inv, kinds=("blocks",))
    isl = INV.merge_small_ranges(groups, threshold=10)
    got = sorted(
        (r["island_start"], r["island_end"], len(r["members"])) for r in isl.collect()
    )
    assert got == [(100, 109, 2), (200, 204, 1), (300, 1299, 1)]


def test_delete_files_dry_run(spark, tmp_path):
    make_tree(str(tmp_path), [(100, B)])
    rel = "eth/" + single_file_path(100, B)
    res = ARC.delete_files(str(tmp_path), [rel], dry_run=True)
    assert res.deleted == [rel] and os.path.exists(tmp_path / rel)
    res = ARC.delete_files(str(tmp_path), [rel], dry_run=False)
    assert res.deleted == [rel] and not os.path.exists(tmp_path / rel)


def test_hadoop_listing_matches_oswalk(spark, tmp_path):
    specs = [(h, k) for h in range(100, 105) for k in (B, T)] + [(Range(1000, 1999), B)]
    make_tree(str(tmp_path), specs)
    base = str(tmp_path / "eth")
    assert ARC.list_archive_files_hadoop(spark, base) == ARC.list_archive_files(base)
    assert ARC.list_archive_files_hadoop(spark, str(tmp_path / "missing")) == []


def test_hadoop_inventory_matches_python(spark, tmp_path):
    HASH64 = "b" * 64
    specs = [(100, B), (100, T), (Range(1000, 1999), B), (205, B, HASH64)]
    make_tree(str(tmp_path), specs)
    py = sorted(
        (r["path"], r["kind"], r["start"], r["end"], r["hash"])
        for r in ARC.inventory_df(spark, str(tmp_path), "eth").collect()
    )
    jvm = sorted(
        (r["path"], r["kind"], r["start"], r["end"], r["hash"])
        for r in ARC.inventory_df_hadoop(spark, str(tmp_path), "eth").collect()
    )
    assert py == jvm and len(py) == 4
    hashes = [h for *_x, h in py if h]
    assert hashes == [HASH64]


def test_observe_metrics(spark, tmp_path):
    from dshackle_archive_spark.operators.metrics import ThroughputLog, observe_table
    from dshackle_archive_spark.sources.fetcher import FetchPolicy, fetch_blocks
    from dshackle_archive_spark.sources.mock_chain import MockChain

    chain = MockChain(head_height=10_000)
    df = fetch_blocks(spark, chain, Range(0, 49), FetchPolicy(parallel=2))
    observed, obs = observe_table(df, "fetch", payload_cols=["json"])
    n = observed.count()
    assert n == 50
    got = obs.get
    assert got["n_items"] == 50 and got["bytes_json"] > 50 * 50

    log = ThroughputLog()
    for i in range(7):
        log.record(i, n_rows=100, seconds=0.5)
    s = log.sliding(5)
    assert s["n_samples"] == 5 and s["rows"] == 500 and abs(s["rows_per_sec"] - 200.0) < 1e-9


def test_salted_agg_matches_plain(spark, sf_dir):
    from dshackle_archive_spark.operators.skew import salted_agg
    from dshackle_archive_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"],): (r["n"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], r["mx"])
        for r in salted_agg(
            ev, ["event_type"], {"n": ("count", "value"), "mx": ("max", "value")}, salt=8
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_left_matches_plain(spark, sf_dir):
    from dshackle_archive_spark.operators.skew import salted_broadcast_left
    from dshackle_archive_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = sorted(
        (r["o_orderkey"], r["c_name"]) for r in o.join(c, "o_custkey", "left").collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in salted_broadcast_left(o, c, ["o_custkey"], salt=8).collect()
    )
    assert salted == plain


def test_salted_join_hotkeys_matches_plain(spark, sf_dir):
    """Targeted hot-key salting must be row-for-row equivalent to the
    plain equi-join (inner AND left, duplicate dim keys included), and
    must actually spread the hot key over multiple salts on the big
    side."""
    from dshackle_archive_spark.operators.skew import salted_join_hotkeys

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey", "l_quantity")
    )
    # dim with a duplicate row for one hot key to exercise multiplicity
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    )
    hot = [r["l_suppkey"] for r in
           li.groupBy("l_suppkey").count().orderBy("count", ascending=False)
           .limit(2).collect()]
    dup = supp.filter(F.col("s_suppkey") == hot[0])
    dim = supp.union(dup).withColumnRenamed("s_suppkey", "l_suppkey")

    for how in ("inner", "left"):
        plain = sorted(
            (tuple(r) for r in li.join(dim, "l_suppkey", how).collect()),
            key=repr,
        )
        salted = sorted(
            (tuple(r) for r in
             salted_join_hotkeys(li, dim, "l_suppkey", hot, salt=8, how=how)
             .collect()),
            key=repr,
        )
        assert salted == plain, how

    # the hot key's big-side rows really fan out over >1 salt value
    from dshackle_archive_spark.operators.skew import salted_join_hotkeys as _
    big_s = li.withColumn(
        "_salt",
        F.when(
            F.array_contains(F.array(*[F.lit(k) for k in hot]), F.col("l_suppkey")),
            F.pmod(F.xxhash64(*li.columns), F.lit(8)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    n_salts = (
        big_s.filter(F.col("l_suppkey") == hot[0])
        .select("_salt").distinct().count()
    )
    assert n_salts > 1


def test_salted_join_hotkeys_edge_cases(spark):
    """Degenerate inputs must still be plain-join equivalent: empty hot
    list (pure pass-through), hot keys absent from either side, salt=1
    (replication-free), and an unsupported join type must refuse."""
    import pytest as _pytest

    from dshackle_archive_spark.operators.skew import salted_join_hotkeys

    big = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (3, 30), (3, 31), (3, 32)],
        "k long, v long",
    )
    dim = spark.createDataFrame([(1, 100), (3, 300), (4, 400)], "k long, w long")

    def rows(df):
        return sorted((tuple(r) for r in df.collect()), key=repr)

    for how in ("inner", "left"):
        plain = rows(big.join(dim, "k", how))
        for hot, salt in ([], 4), ([99], 4), ([1, 3], 1), ([1, 2, 3, 4], 6):
            got = rows(salted_join_hotkeys(big, dim, "k", hot, salt, how))
            assert got == plain, (how, hot, salt)

    with _pytest.raises(ValueError):
        salted_join_hotkeys(big, dim, "k", [1], 4, how="full")
