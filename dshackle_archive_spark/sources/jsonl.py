"""JSONL document interchange — the de-facto wire format of LLM data
pipelines (one JSON object per line, usually gzipped, one file per shard).

The reference archives chain data as Avro containers; a corpus pipeline's
equivalent boundary format is JSONL, so the curation surface needs to
speak it natively. Spark's JSON source/sink already distributes the work
(one task per file split / per output partition); what this module adds
is the PRODUCTION DISCIPLINE around it:

- **Explicit schema on read, always.** ``spark.read.json`` without a
  schema runs a full inference pre-pass over the data — at 100 TB that's
  a second scan before the first real job, and a schema that drifts with
  whatever the sampled shard contained. Readers here take a StructType
  (default: the documents-table shape) and never infer.
- **Corrupt-line quarantine, not job failure.** Crawl-derived JSONL
  always contains broken lines. Reads run PERMISSIVE with a corrupt-
  record column; callers get (clean_rows, quarantine_rows) as two
  DataFrames sharing one scan — count the quarantine, alert on a rate,
  never abort a 100 TB job for one bad shard.
- **Compression on write.** Defaults to gzip (the interchange norm);
  shard count = partition count, so callers control shard size with a
  repartition before the write, not with driver-side file juggling.

Scope note: the quarantine covers malformed RECORDS (bad JSON on a
readable line). A malformed gzip CONTAINER (truncated shard, garbage
bytes mid-stream) fails at the codec layer before any line exists —
that class is handled by Spark's file-level knob
(``spark.sql.files.ignoreCorruptFiles=true``), which skips the shard and
is deliberately NOT defaulted here: silently dropping whole shards is a
policy decision the caller must opt into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_CORRUPT = "_corrupt_record"


def write_jsonl(
    df: DataFrame, path: str, compression: str = "gzip", shards: int | None = None
) -> None:
    """Write a DataFrame as JSONL shards (one file per partition).

    ``shards`` repartitions first — the knob for shard size; at scale pick
    shards ≈ total_bytes / 250 MB. Executors write in parallel; nothing
    routes through the driver."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").option("compression", compression).json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCS_JSONL_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL with an explicit schema → ``(clean, quarantine)``.

    One scan, PERMISSIVE mode: lines that parse land in ``clean`` with
    exactly ``schema``'s columns; lines that don't land in ``quarantine``
    as their raw text (for re-parse or audit). Spark requires the corrupt
    column to be part of the read schema, so it is appended here and
    stripped from the clean side."""
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        # Spark's JSON reader only materializes the corrupt column if the
        # parsed rows are cached/materialized with it selected
        .cache()
    )
    clean = raw.filter(F.col(_CORRUPT).isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantine = raw.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return clean, quarantine
