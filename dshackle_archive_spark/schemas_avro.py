"""Avro record schemas for the three archive tables.

Field-for-field the reference's embedded schemas (``/root/reference/src/
avros.rs:6-237``): same names, types, union-nullability and timestamp-millis
logical types — re-derived from SURVEY §1.3, so files this engine writes are
readable by the reference tooling and vice versa (round-trip covered by
``tests/test_avro_io.py`` and the cross-format lifecycle test).
"""

from __future__ import annotations

_TS = {"type": "long", "logicalType": "timestamp-millis"}
_NULLABLE_BYTES = ["null", "bytes"]
_NULLABLE_STRING = ["null", "string"]

BLOCK_AVRO_SCHEMA = {
    "type": "record",
    "name": "Block",
    "namespace": "io.emeraldpay.dshackle.archive.avro",
    "fields": [
        {
            "name": "blockchainType",
            "type": {
                "type": "enum",
                "name": "BlockchainType",
                "symbols": ["ETHEREUM", "BITCOIN"],
            },
        },
        {"name": "blockchainId", "type": "string"},
        {"name": "archiveTimestamp", "type": _TS},
        {"name": "height", "type": "long"},
        {"name": "blockId", "type": "string"},
        {"name": "parentId", "type": "string"},
        {"name": "timestamp", "type": _TS},
        {"name": "json", "type": "bytes"},
        {"name": "unclesCount", "type": "int"},
        {"name": "uncle0Json", "type": _NULLABLE_BYTES, "default": None},
        {"name": "uncle1Json", "type": _NULLABLE_BYTES, "default": None},
    ],
}

TRANSACTION_AVRO_SCHEMA = {
    "type": "record",
    "name": "Transaction",
    "namespace": "io.emeraldpay.dshackle.archive.avro",
    "fields": [
        {
            "name": "blockchainType",
            "type": {
                "type": "enum",
                "name": "BlockchainType",
                "symbols": ["ETHEREUM", "BITCOIN"],
            },
        },
        {"name": "blockchainId", "type": "string"},
        {"name": "archiveTimestamp", "type": _TS},
        {"name": "height", "type": "long"},
        {"name": "blockId", "type": "string"},
        {"name": "timestamp", "type": _TS},
        {"name": "index", "type": "long"},
        {"name": "txid", "type": "string"},
        {"name": "json", "type": "bytes"},
        {"name": "raw", "type": "bytes"},
        {"name": "from", "type": _NULLABLE_STRING, "default": None},
        {"name": "to", "type": _NULLABLE_STRING, "default": None},
        {"name": "receiptJson", "type": _NULLABLE_BYTES, "default": None},
    ],
}

TRACE_AVRO_SCHEMA = {
    "type": "record",
    "name": "TransactionTrace",
    "namespace": "io.emeraldpay.dshackle.archive.avro",
    "fields": [
        {
            "name": "blockchainType",
            "type": {
                "type": "enum",
                "name": "BlockchainType",
                "symbols": ["ETHEREUM", "BITCOIN"],
            },
        },
        {"name": "blockchainId", "type": "string"},
        {"name": "archiveTimestamp", "type": _TS},
        {"name": "height", "type": "long"},
        {"name": "blockId", "type": "string"},
        {"name": "timestamp", "type": _TS},
        {"name": "index", "type": "long"},
        {"name": "txid", "type": "string"},
        {"name": "traceJson", "type": _NULLABLE_BYTES, "default": None},
        {"name": "stateDiffJson", "type": _NULLABLE_BYTES, "default": None},
    ],
}

AVRO_TABLE_SCHEMAS = {
    "blocks": BLOCK_AVRO_SCHEMA,
    "transactions": TRANSACTION_AVRO_SCHEMA,
    "traces": TRACE_AVRO_SCHEMA,
}
