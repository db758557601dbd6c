"""Configurable checkpoint strategy for iterative / staged plans.

Every iterative operator in this engine (connected components, power
iteration, k-means refinement) and every staged curation plan materializes
intermediate DataFrames to truncate lineage — otherwise the plan tree grows
by one join per round and Catalyst analysis time goes superlinear.

Two materialization strategies exist and they differ *only* under failure:

- ``df.localCheckpoint()`` stores the blocks on the executors that computed
  them AND truncates lineage.  Fast (no DFS write), and on ``local[N]`` —
  a single JVM that cannot lose an executor — always correct.  On a real
  cluster it is a durability trap: lose one executor (spot preemption,
  OOM-kill) and the blocks are gone *and* unrecomputable, failing the job.
  At a 100 TB / 1000-executor / spot-instance target that is a guaranteed
  failure mode for any long-running iterative job.
- ``df.checkpoint()`` writes the blocks to the SparkContext checkpoint
  directory (HDFS/S3/any DFS) — slower per round, but blocks survive any
  executor loss and lineage stays truncated.

``reliable_checkpoint`` picks per call: when ``SPARK_GRAFT_CHECKPOINT_DIR``
is set (e.g. ``hdfs://nn/tmp/ckpt`` on a cluster, a scratch dir in tests)
it routes through ``df.checkpoint()``; otherwise it falls back to
``localCheckpoint``.  The env var — not the sticky
``SparkContext.setCheckpointDir`` state — is the switch, so one test or
one notebook cell configuring a dir never silently flips the strategy for
the rest of the JVM's lifetime.

Reference parity note: the reference engine is single-process and keeps
iterative state in memory (no analogous durability choice exists there);
this knob is Spark-deployment surface, not reference behavior.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"

# Last env dir applied per SparkContext (setCheckpointDir appends a random
# UUID subdir, so getCheckpointDir() can't be string-compared to the env).
_applied: dict[int, str] = {}


def reliable_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    Uses a reliable (DFS-backed) ``checkpoint()`` when
    ``$SPARK_GRAFT_CHECKPOINT_DIR`` is set, else ``localCheckpoint()``.
    Chain-friendly: ``df.transform(reliable_checkpoint)``.
    """
    ckpt_dir = os.environ.get(CHECKPOINT_DIR_ENV)
    if ckpt_dir:
        sc = df.sparkSession.sparkContext
        if _applied.get(id(sc)) != ckpt_dir:
            sc.setCheckpointDir(ckpt_dir)
            _applied[id(sc)] = ckpt_dir
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def _checkpointed_jrdd(ck: DataFrame):
    """The JVM RDD a checkpointed Dataset wraps.

    ``Dataset.checkpoint`` / ``localCheckpoint`` replace the logical plan
    with a ``LogicalRDD`` over the materialized internal-row RDD, so the
    analyzed plan IS the handle to the pinned blocks (local path) and the
    checkpoint directory (DFS path). Deriving the RDD from the returned
    DataFrame — instead of diffing ``getPersistentRDDs()`` around the call
    — makes release() exact under concurrency: another thread persisting
    or checkpointing in the same window can no longer get its RDDs
    captured and unpersisted out from under it (round-10 fix)."""
    plan = ck._jdf.queryExecution().analyzed()
    cls = plan.getClass().getSimpleName()
    if cls != "LogicalRDD":  # loud, not a silent leak
        raise RuntimeError(
            f"expected LogicalRDD under a checkpointed Dataset, got {cls}"
        )
    return plan.rdd()


def checkpoint_with_release(df: DataFrame, eager: bool = True):
    """``reliable_checkpoint`` plus a ``release()`` that frees the
    materialized state once the caller no longer needs it — returns
    ``(checkpointed_df, release)``.

    Why this exists (round-9 finding): ``localCheckpoint`` blocks are
    PINNED, un-evictable storage — they cannot be recomputed, so Spark's
    memory manager may never drop them. An N-round iterative loop that
    checkpoints every round therefore holds N copies of its working set
    for the rest of the session; at ×8-of-sf0.1 data the accumulated
    rounds of one k-core run OOM'd an 8 GiB driver on a later broadcast
    build ("Not enough memory to build and broadcast"). Iterative
    operators must release round i's state as soon as round i+1 is
    materialized and any cross-round probe (count diff, exceptAll) has
    run.

    Release semantics per strategy (both derived from the returned
    DataFrame's own RDD — no getPersistentRDDs() set-diff, so concurrent
    checkpointing threads are safe):

    - local path: ``release()`` unpersists exactly the RDD this call
      pinned.
    - DFS path (``$SPARK_GRAFT_CHECKPOINT_DIR``): the blocks are FILES,
      and before round 10 they leaked — every superseded round's
      ``rdd-N`` directory stayed on the DFS for the session's lifetime,
      the disk twin of the round-9 memory leak, biting exactly the
      long-lived cluster session the DFS path exists for. ``release()``
      now deletes the superseded round's checkpoint directory
      (``RDD.getCheckpointFile``) via the Hadoop FileSystem API (works
      for hdfs://, s3a://, file://). The checkpoint file is resolved at
      RELEASE time, not capture time, so ``eager=False`` frames that
      materialize later still release correctly (and ones that never
      materialize release as a no-op).

    After ``release()`` the returned DataFrame is UNREADABLE (its state
    is gone and its lineage is truncated) — callers must only release
    a round that is strictly superseded."""
    ckpt_dir = os.environ.get(CHECKPOINT_DIR_ENV)
    if ckpt_dir:
        ck = reliable_checkpoint(df, eager=eager)
        jrdd = _checkpointed_jrdd(ck)
        sc = df.sparkSession.sparkContext

        def release() -> None:
            opt = jrdd.getCheckpointFile()
            if not opt.isDefined():
                return  # never materialized — nothing on the DFS
            path = sc._jvm.org.apache.hadoop.fs.Path(opt.get())
            fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
            fs.delete(path, True)

        return ck, release

    ck = df.localCheckpoint(eager=eager)
    jrdd = _checkpointed_jrdd(ck)
    return ck, (lambda: jrdd.unpersist(False))


def release_all_pinned(spark) -> int:
    """Unpersist EVERY pinned RDD in the session — inter-job hygiene for
    long-lived sessions (bench harnesses, probe scripts, notebook loops)
    that construct registry queries repeatedly.

    Each query construction that materializes a corpus-scale checkpoint
    (edge lists, LSH signatures) pins blocks for the session's lifetime;
    N reps × M queries at large scale accumulates to driver-heap
    exhaustion (measured: the ×8 probe's 3-rep loop OOM'd an 8 GiB
    driver on a broadcast build even after per-round releases inside the
    operators). Call between INDEPENDENT jobs only: after this, any
    previously returned checkpointed DataFrame is unreadable. Returns
    the number of RDDs released."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    jrdds = list(jmap.values())  # py4j JavaMap is a MutableMapping
    for jrdd in jrdds:
        jrdd.unpersist(False)
    return len(jrdds)
