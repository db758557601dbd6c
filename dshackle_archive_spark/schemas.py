"""Authoritative table schemas (reference ``/root/reference/src/avros.rs``).

The reference parses three embedded Avro JSON schemas at startup
(``avros.rs:6-237``); here they are Spark ``StructType``s. Parquet is the
native analytic format (columnar, min/max pruned); Avro remains supported at
the edges for archive compatibility when the spark-avro datasource is on the
classpath (``sources.archive.avro_available``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# -- blocks (avros.rs:7-78) -------------------------------------------------
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("blockchainType", T.StringType(), False),  # ETHEREUM | BITCOIN
        T.StructField("blockchainId", T.StringType(), False),  # ETH, BTC, ...
        T.StructField("archiveTimestamp", T.TimestampType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("blockId", T.StringType(), False),  # block hash
        T.StructField("parentId", T.StringType(), False),  # parent hash
        T.StructField("timestamp", T.TimestampType(), False),  # block time
        T.StructField("json", T.BinaryType(), False),  # raw RPC block JSON
        T.StructField("unclesCount", T.IntegerType(), False),
        T.StructField("uncle0Json", T.BinaryType(), True),
        T.StructField("uncle1Json", T.BinaryType(), True),
    ]
)

# -- transactions (avros.rs:80-165) -----------------------------------------
TRANSACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("blockchainType", T.StringType(), False),
        T.StructField("blockchainId", T.StringType(), False),
        T.StructField("archiveTimestamp", T.TimestampType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("blockId", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("index", T.LongType(), False),  # position of tx in block
        T.StructField("txid", T.StringType(), False),
        T.StructField("json", T.BinaryType(), False),  # raw RPC tx JSON
        T.StructField("raw", T.BinaryType(), False),  # wire-format tx bytes
        T.StructField("from", T.StringType(), True),  # Ethereum only
        T.StructField("to", T.StringType(), True),  # Ethereum only
        T.StructField("receiptJson", T.BinaryType(), True),  # Ethereum only
    ]
)

# -- traces (avros.rs:167-236; Ethereum-only) -------------------------------
TRACES_SCHEMA = T.StructType(
    [
        T.StructField("blockchainType", T.StringType(), False),
        T.StructField("blockchainId", T.StringType(), False),
        T.StructField("archiveTimestamp", T.TimestampType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("blockId", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("index", T.LongType(), False),
        T.StructField("txid", T.StringType(), False),
        T.StructField("traceJson", T.BinaryType(), True),  # callTracer output
        T.StructField("stateDiffJson", T.BinaryType(), True),  # prestateTracer
    ]
)

TABLE_SCHEMAS = {
    "blocks": BLOCKS_SCHEMA,
    "transactions": TRANSACTIONS_SCHEMA,
    "traces": TRACES_SCHEMA,
}

# -- file-inventory relation (filenames.rs:8-49 parsed into rows) -----------
INVENTORY_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # blocks|transactions|traces
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("hash", T.StringType(), True),  # fork qualifier on singles
    ]
)

# -- per-file CDC notification (notify/mod.rs:12-35) ------------------------
NOTIFICATION_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("blockchain", T.StringType(), False),
        T.StructField("type", T.StringType(), False),  # blocks|transactions|traces
        T.StructField("run", T.StringType(), False),  # archive|stream|copy|compact|fix
        T.StructField("heightStart", T.LongType(), False),
        T.StructField("heightEnd", T.LongType(), False),
        T.StructField("location", T.StringType(), False),
        T.StructField("maturity", T.StringType(), True),  # finalized|head
    ]
)

# Schema-on-read for the embedded mock/chain block JSON payload
# (mock.rs:29-61 shape; real chains plug in their own — see sources/).
MOCK_BLOCK_JSON_SCHEMA = T.StructType(
    [
        T.StructField("height", T.LongType(), True),
        T.StructField("hash", T.StringType(), True),
        T.StructField("parent", T.StringType(), True),
        T.StructField("transactions", T.ArrayType(T.StringType()), True),
    ]
)

# Ethereum block JSON: the fields the engine itself needs (P4 projection —
# parent/hash/tx list); everything else stays raw bytes, schema-on-read.
ETH_BLOCK_JSON_SCHEMA = T.StructType(
    [
        T.StructField("number", T.StringType(), True),  # 0x-hex quantity
        T.StructField("hash", T.StringType(), True),
        T.StructField("parentHash", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),  # 0x-hex seconds
        T.StructField("transactions", T.ArrayType(T.StringType()), True),
    ]
)

# Bitcoin block JSON (verbosity=1): tx list is `tx`, parent is
# `previousblockhash`.
BTC_BLOCK_JSON_SCHEMA = T.StructType(
    [
        T.StructField("height", T.LongType(), True),
        T.StructField("hash", T.StringType(), True),
        T.StructField("previousblockhash", T.StringType(), True),
        T.StructField("time", T.LongType(), True),  # epoch seconds
        T.StructField("tx", T.ArrayType(T.StringType()), True),
    ]
)
