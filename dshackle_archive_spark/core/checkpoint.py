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
