"""SparkSession factory with the engine's scale-oriented defaults.

Tested on ``local[N]``; the conf is written for a real multi-executor
cluster: AQE on (runtime coalescing + skew-join splitting), broadcast
threshold sized for dimension/lookup joins, UTC session timezone so
timestamp semantics match the DuckDB correctness oracle, and Arrow enabled
for the (rare) Pandas-UDF stages.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Make ``dshackle_archive_spark`` importable on executor Python workers.

    mapInPandas/applyInPandas closures are pickled by reference to this
    module, so workers must import it; on a real cluster this is the
    ``--py-files`` mechanism, done here programmatically."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # rebuilt on every session start so edits are never shipped stale
    zip_path = os.path.join(tempfile.gettempdir(), "dshackle_archive_spark_pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for base, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added in this context


def get_spark(app_name: str = "dshackle-archive-spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(32, int(cpus) if cpus.isdigit() else 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # bucketed saveAsTable target — keep the warehouse out of the CWD
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "dshackle_spark_warehouse"),
        )
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
