"""Loaders for the synthetic benchmark tables (TESTDATA.md).

The driver's parquet files carry TIMESTAMP(NANOS) which Spark's reader
rejects by default; ``spark.sql.legacy.parquet.nanosAsLong=true`` (runtime
settable) makes them read as ``timestamp_ntz`` — which also matches the
timezone-naive TIMESTAMP semantics of the DuckDB correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _prepare(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# columns stored as TIMESTAMP(NANOS): under the legacy flag they surface as
# BIGINT nanos and need explicit conversion (micros-precision columns like
# orders.o_orderdate surface as timestamp_ntz directly)
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _prepare(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        field = df.schema[col] if col in df.columns else None
        if field is not None and field.dataType.simpleString() == "bigint":
            df = df.withColumn(
                col,
                F.timestamp_micros(F.floor(F.col(col) / 1000).cast("long")).cast(
                    "timestamp_ntz"
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    _prepare(spark)
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
