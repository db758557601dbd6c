"""The configurable checkpoint strategy (core/checkpoint.py).

On local[N] both strategies are correct; the difference is cluster
durability — localCheckpoint blocks die with their executor AND lineage is
gone, so iterative plans must be able to switch to reliable (DFS-backed)
checkpointing when a checkpoint dir is configured.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dshackle_archive_spark.core.checkpoint import (
    CHECKPOINT_DIR_ENV,
    reliable_checkpoint,
)


@pytest.fixture()
def _clean_env():
    old = os.environ.pop(CHECKPOINT_DIR_ENV, None)
    yield
    if old is None:
        os.environ.pop(CHECKPOINT_DIR_ENV, None)
    else:
        os.environ[CHECKPOINT_DIR_ENV] = old


def test_local_fallback_when_unconfigured(spark, _clean_env, tmp_path):
    # even with a stale sc-level checkpoint dir from earlier in the JVM,
    # the env var (not sticky SparkContext state) is the switch — nothing
    # must be written anywhere when it's unset
    probe = tmp_path / "never_used"
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = reliable_checkpoint(df)
    assert out.count() == 100
    assert not probe.exists()
    # lineage is truncated: the checkpointed frame no longer references the
    # original Range scan in its logical plan
    assert "ExistingRDD" in out._jdf.queryExecution().optimizedPlan().toString() or (
        "LogicalRDD" in out._jdf.queryExecution().logical().toString()
    )


def test_reliable_when_dir_configured(spark, _clean_env, tmp_path):
    ckpt = tmp_path / "ckpt"
    os.environ[CHECKPOINT_DIR_ENV] = str(ckpt)
    df = spark.range(50).withColumn("v", F.col("id") + 1)
    out = reliable_checkpoint(df)
    assert out.count() == 50
    # reliable path: setCheckpointDir was applied and block files landed
    # under the configured dir (Spark creates a UUID subdir beneath it)
    sc_dir = spark.sparkContext.getCheckpointDir()
    assert sc_dir is not None and str(ckpt) in sc_dir
    written = [p for p in ckpt.rglob("*") if p.is_file()]
    assert written, "reliable checkpoint wrote no block files"


def test_transform_chaining_and_parity(spark, _clean_env, tmp_path):
    """Same rows through both strategies; .transform() chain style works."""
    df = spark.range(20).withColumn("g", F.col("id") % 3)
    local = df.transform(reliable_checkpoint).groupBy("g").count()
    os.environ[CHECKPOINT_DIR_ENV] = str(tmp_path / "c2")
    reliable = df.transform(reliable_checkpoint).groupBy("g").count()
    assert sorted(map(tuple, local.collect())) == sorted(map(tuple, reliable.collect()))


def test_dfs_checkpoint_release_deletes_superseded_dirs(spark, _clean_env, tmp_path):
    """Round-10 disk-leak fix (the DFS twin of the round-9 pinned-block
    leak): on the reliable path every superseded round's ``rdd-N``
    checkpoint directory used to stay on the DFS for the session's
    lifetime — exactly the long-lived 100 TB cluster session the DFS path
    exists for. ``release()`` now deletes the superseded round's
    directory, so after an N-round kcore peel exactly ONE rdd-* dir (the
    final round the result reads from) remains, and the result frame is
    still fully readable."""
    from dshackle_archive_spark.operators.dedup import kcore

    ckpt = tmp_path / "dfs_ckpt"
    os.environ[CHECKPOINT_DIR_ENV] = str(ckpt)
    # K4 + 3-node tail: k=2 peels the tail over a 3-round cascade
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tail = [(0, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(k4 + tail, "u long, v long")
    # driver_finish_edges=0 pins the DISTRIBUTED peel (the path whose DFS
    # behavior this test gates; the default cap would driver-finish a
    # graph this small on round 0)
    out = kcore(e, 2, src="u", dst="v", canonical=True, driver_finish_edges=0)
    rows = sorted(map(tuple, out.collect()))
    assert [n for n, _ in rows] == [0, 1, 2, 3]
    assert all(d >= 2 for _, d in rows)
    rdd_dirs = [p for p in ckpt.rglob("rdd-*") if p.is_dir()]
    assert len(rdd_dirs) == 1, (
        f"superseded checkpoint dirs leaked on the DFS path: "
        f"{sorted(p.name for p in rdd_dirs)}"
    )
    # the surviving dir is the live one: the result stays readable
    assert sorted(map(tuple, out.collect())) == rows


def test_release_unpersists_exactly_the_checkpointed_rdd(spark, _clean_env):
    """Round-9 advice: the old getPersistentRDDs() set-diff captured ANY
    RDD persisted concurrently inside its snapshot window — a racing
    thread's cache could be unpersisted out from under it. release() now
    derives the pinned RDD straight from the returned DataFrame's
    LogicalRDD (no snapshots, no window), so the contract is exact by
    construction: release removes the checkpointed RDD's id and NOTHING
    else, whatever else the session pins meanwhile."""
    from dshackle_archive_spark.core.checkpoint import (
        _checkpointed_jrdd,
        checkpoint_with_release,
        release_all_pinned,
    )

    release_all_pinned(spark)  # clean slate

    def pinned_ids() -> set[int]:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(i) for i in jmap.keySet().toArray()}

    bystander = spark.range(1000).withColumn("v", F.col("id") * 3).persist()
    assert bystander.count() == 1000
    before = pinned_ids()
    df = spark.range(500).withColumn("g", F.col("id") % 7)
    ck, release = checkpoint_with_release(df)
    ck_id = int(_checkpointed_jrdd(ck).id())
    assert ck_id in pinned_ids()
    release()
    after = pinned_ids()
    assert ck_id not in after, "release() left the checkpointed RDD pinned"
    assert after == before, f"release() touched bystander RDDs: {before ^ after}"
    assert bystander.count() == 1000  # bystander blocks still readable
    bystander.unpersist()


def test_iterative_loops_release_superseded_rounds(spark):
    """Round-9 leak fix: localCheckpoint blocks are PINNED (un-evictable)
    storage, so an N-round iterative loop must not leave N pinned RDDs
    behind — at ×8-of-sf0.1 data the accumulated rounds OOM'd an 8 GiB
    driver. kcore (a multi-round peel) may leave at most its FINAL round
    pinned; release_all_pinned() then clears the session completely."""
    from dshackle_archive_spark.core.checkpoint import release_all_pinned
    from dshackle_archive_spark.operators.dedup import kcore

    release_all_pinned(spark)  # clean slate

    def pinned() -> int:
        return int(spark.sparkContext._jsc.getPersistentRDDs().size())

    base = pinned()
    # K4 + 3-node tail: k=2 peels the tail over a 3-round cascade
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tail = [(0, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(k4 + tail, "u long, v long")
    # force the distributed peel — the leak class under test lives there
    out = kcore(e, 2, src="u", dst="v", canonical=True, driver_finish_edges=0)
    assert out.count() == 4
    leaked = pinned() - base
    assert leaked <= 1, f"kcore left {leaked} pinned RDDs (superseded rounds leak)"
    released = release_all_pinned(spark)
    assert released >= leaked
    assert pinned() == 0


def test_non_convergence_error_path_releases_pin(spark):
    """Round-10 advice: on the ``did not converge`` raise path, kcore and
    ktruss must release the final round's pinned checkpoint before raising
    — the error path was the one remaining leak site of the class the
    round-9/10 release work targets (a caller catching the backstop error
    in a long-lived session would otherwise accumulate one pinned working
    set per failed attempt)."""
    import pytest

    from dshackle_archive_spark.core.checkpoint import release_all_pinned
    from dshackle_archive_spark.operators.dedup import kcore, ktruss

    release_all_pinned(spark)  # clean slate

    def pinned() -> int:
        return int(spark.sparkContext._jsc.getPersistentRDDs().size())

    # path graph: k=2 peel cascades from both ends — needs >1 round
    path = [(i, i + 1) for i in range(10)]
    e = spark.createDataFrame(path, "u long, v long")
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(
            e, 2, src="u", dst="v", canonical=True,
            max_rounds=1, driver_finish_edges=0,
        )
    assert pinned() == 0, "kcore error path leaked a pinned checkpoint"

    # no edge closes a triangle: round 1 drops everything, fixpoint is
    # only observable in round 2 — max_rounds=1 hits the backstop
    with pytest.raises(RuntimeError, match="did not converge"):
        ktruss(e, 3, src="u", dst="v", canonical=True, max_rounds=1)
    assert pinned() == 0, "ktruss error path leaked a pinned checkpoint"


def test_threshold_fn_failure_releases_pin(spark):
    """Round-11 review finding: a raising threshold_fn (or any mid-loop
    failure) must not leak the pinned round-0 checkpoint — the same leak
    class as the non-convergence path, one exception site over."""
    import pytest

    from dshackle_archive_spark.core.checkpoint import release_all_pinned
    from dshackle_archive_spark.operators.dedup import kcore

    release_all_pinned(spark)

    def pinned() -> int:
        return int(spark.sparkContext._jsc.getPersistentRDDs().size())

    e = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")

    def boom(degs):
        raise RuntimeError("threshold exploded")

    with pytest.raises(RuntimeError, match="threshold exploded"):
        kcore(e, None, src="u", dst="v", threshold_fn=boom)
    assert pinned() == 0, "threshold_fn failure leaked a pinned checkpoint"

    # an EMPTY graph with a data-relative threshold returns an empty core
    # without ever calling threshold_fn (whose statistic is undefined)
    empty = spark.createDataFrame([], "u long, v long")
    out = kcore(empty, None, src="u", dst="v", threshold_fn=boom)
    assert out.count() == 0
    # the SUCCESS contract allows exactly the final round's pin (the
    # result reads from it) — nothing more
    assert pinned() <= 1
    release_all_pinned(spark)
