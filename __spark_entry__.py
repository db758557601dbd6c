"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship gap-detection query (the semantic heart of
the reference engine: requested − covered → missing ranges) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``dshackle_archive_spark.queries`` — one entry per implemented operator from
SURVEY.md §2, each with a DuckDB-runnable oracle unless marked rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dshackle_archive_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.registry()["a3_gap_detection"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.registry()


def oracle_sql() -> dict[str, str]:
    return Q.oracles()
