"""Streaming document ingestion with incremental exact dedup.

The batch dedup family (``operators/dedup.py``) assumes the corpus sits
still; a live ingestion pipeline sees the same document arrive twice within
a batch, across batches, and across runs (already archived). This operator
handles all three with Spark's own streaming machinery:

- within/between batches: stateful ``dropDuplicates`` on the content hash
  (state-store backed, exactly-once under checkpointing); with an event-time
  watermark the state is bounded via ``dropDuplicatesWithinWatermark`` —
  at 100 TB/day the unbounded variant would accumulate state forever, so
  production callers pass ``watermark=``;
- already-archived: a stream-static LEFT ANTI join against the known-hash
  set (the static side is re-read per micro-batch, so an archive compaction
  that adds hashes is picked up without restarting the query).

Only the 32-byte hash ever enters state or the join — raw text stays in the
micro-batch projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import content_hash


def streaming_exact_dedup(
    stream_docs: DataFrame,
    known_hashes: DataFrame | None = None,
    text_col: str = "text",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Dedup a streaming documents DataFrame by normalized content hash.

    ``known_hashes``: optional static DataFrame with a ``content_hash``
    column (e.g. the archive's fingerprint table) — matching docs are
    dropped via stream-static anti join.
    ``watermark``: optional ``(event_time_col, delay)`` — bounds dedup
    state to the watermark horizon instead of keeping every hash forever.
    """
    hashed = stream_docs.withColumn("content_hash", content_hash(text_col))
    if watermark is not None:
        col, delay = watermark
        hashed = hashed.withWatermark(col, delay)
        out = hashed.dropDuplicatesWithinWatermark(["content_hash"])
    else:
        out = hashed.dropDuplicates(["content_hash"])
    if known_hashes is not None:
        out = out.join(
            known_hashes.select("content_hash"), "content_hash", "left_anti"
        )
    return out


def streaming_curate(
    stream_docs: DataFrame,
    known_hashes: DataFrame | None = None,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Incremental curation over a document stream: stateless quality gate
    (token bounds — cheap per-row math, no state) followed by the stateful
    exact dedup above. The quality gate runs FIRST so junk never enters
    the dedup state store — at ingest scale the state size is the
    constraint, and rejected docs must not occupy it.

    Near-dup and decontamination stay batch stages (they need corpus-wide
    posting lists); the streaming pass is the front door that keeps the
    batch corpus append-only and exact-dup-free."""
    from ..operators.textan import token_count

    gated = stream_docs.withColumn("_n_tok", token_count()).filter(
        (F.col("_n_tok") >= min_tokens) & (F.col("_n_tok") <= max_tokens)
    ).drop("_n_tok")
    return streaming_exact_dedup(
        gated, known_hashes=known_hashes, watermark=watermark
    )
