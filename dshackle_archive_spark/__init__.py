"""dshackle-archive-spark: a PySpark-native analytics engine with the query
and data-processing capabilities of emeraldpay/dshackle-archive.

Not a port: the reference (Rust, tokio channels, Avro-record-at-a-time) tells
us WHAT to compute; this engine expresses every operator as declarative
DataFrame/SQL plans that Catalyst optimizes, with Parquet as the native
columnar format and height-derived partitioning for pruning at 100 TB scale.

Layout
------
core/        pure-Python kernel: Range algebra, chunking, filename codec
schemas.py   the three archive table StructTypes + inventory/notification
operators/   DataFrame builders: interval SQL, inventory, verify checks,
             compaction, dedup, similarity, text analysis
sources/     readers/writers (parquet native, avro-compatible), mock chain,
             partition-parallel fetch stage
plans/       the five reference workflows: archive, stream, compact, fix, verify
streaming/   Structured Streaming head-follow (stream mode)
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API: the five workflows + session factory without
    paying pyspark import cost until first use."""
    lazy = {
        "get_spark": ("dshackle_archive_spark.session", "get_spark"),
        "archive": ("dshackle_archive_spark.plans.archive_plan", "archive"),
        "verify": ("dshackle_archive_spark.plans.verify_plan", "verify"),
        "compact": ("dshackle_archive_spark.plans.compact_plan", "compact"),
        "fix": ("dshackle_archive_spark.plans.fix_plan", "fix"),
        "run_stream": ("dshackle_archive_spark.streaming.stream_plan", "run_stream"),
        "Range": ("dshackle_archive_spark.core.ranges", "Range"),
        "DataKind": ("dshackle_archive_spark.core.filenames", "DataKind"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
