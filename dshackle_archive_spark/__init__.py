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
