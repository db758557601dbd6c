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
from ..core.checkpoint import reliable_checkpoint

from ..operators.dedup import content_hash, normalized_text


def _idempotent_batch_write(df: DataFrame, output_path: str, batch_id: int) -> None:
    """Exactly-once parquet sink for the foreachBatch monitors (round-11
    restart-chaos finding): ``mode("append")`` re-appends a replayed
    batch's rows when the process is killed between the output write and
    the streaming commit — the state snapshots were already exactly-once
    by construction (a retry of batch N reads the newest pre-N manifest),
    but the OUTPUT feed was only at-least-once. Writing each batch into
    its own ``batch_id=N`` partition with DYNAMIC partition overwrite
    makes the replay overwrite its own partition: idempotent per batch,
    never a global truncate, and readers keep ``spark.read.parquet(out)``
    (``batch_id`` comes back as a partition column).

    MIGRATION NOTE: an output directory written by the pre-round-11
    APPEND sink holds flat ``part-*.parquet`` files; mixing the
    partitioned layout into it would make every subsequent read fail
    with "conflicting directory structures". A best-effort local check
    refuses loudly up front — move the legacy files into a
    ``batch_id=-1/`` subdirectory (they keep reading fine there) or
    point the monitor at a fresh output path."""
    import os as _os

    if _os.path.isdir(output_path) and any(
        n.endswith(".parquet") for n in _os.listdir(output_path)
    ):
        raise RuntimeError(
            f"{output_path} holds flat (pre-partitioned-layout) parquet "
            "files from the legacy append sink; move them into a "
            "batch_id=-1/ subdirectory or use a fresh output path"
        )
    if "batch_id" not in df.columns:
        df = df.withColumn("batch_id", F.lit(int(batch_id)))
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_path)
    )


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


# ---------------------------------------------------------------------------
# streaming NEAR-dup: stateful LSH-band matching across micro-batches
# ---------------------------------------------------------------------------
#
# Exact-hash dedup above misses mutated copies (one changed token changes the
# content hash). The near-dup front door applies the batch MinHash+LSH family
# incrementally: a document is dropped iff ANY of its LSH band hashes was
# already observed — in an earlier micro-batch (within the watermark horizon)
# or earlier in the same batch.
#
# Why ``foreachBatch`` and not a chained stateful operator: the doc-level
# verdict spans multiple state keys (a doc owns ``bands`` band hashes; any
# single collision kills it), so it cannot be keyed into one
# ``dropDuplicates``/``applyInPandasWithState`` group, and a band-keyed
# stateful op followed by a doc-keyed aggregation is a chained-stateful shape
# Structured Streaming only supports for time-window aggs. ``foreachBatch``
# turns each micro-batch into plain batch DataFrame algebra (the same
# shingle/minhash/banding operators as the batch path) against a
# watermark-pruned band-hash store — the standard production shape for
# streaming LSH.
#
# State design (100 TB/day honest): only (band_id, band_hash, event_time)
# rows are stored — never text, never signatures. The store is bounded by the
# watermark horizon: each batch's store is the horizon-pruned union of the
# previous store and this batch's bands, so its size is O(docs within the
# watermark × bands). Since round 7 the store publishes through the SAME
# manifest-pinned snapshot commits as batch curation (sources/snapshots):
# one commit per micro-batch, batch id recorded in the manifest's extra,
# reads resolved through the newest manifest with batch < N (deterministic
# retries), retention via the snapshot vacuum, and time travel over any
# retained monitor state via load_snapshot(state_dir, version).


def _load_state_snapshot(spark, state_dir: str, batch_id: int):
    """The newest snapshot-committed monitor state published by a batch
    < ``batch_id`` (a retry of batch N must read pre-N state), resolved
    through the manifest chain — None when no such snapshot exists.

    Reading through a PINNED manifest means a concurrent commit (or a
    half-written retry attempt's data dir) is invisible: the file list was
    fixed at publish time and published files are never mutated."""
    from ..sources import snapshots as SNAP

    v = SNAP.current_version(state_dir)
    if v is None:
        return None  # fresh state dir: genuinely no prior state
    while v is not None:
        snap = SNAP.load_snapshot(state_dir, v)
        if snap is None:
            # Manifests exist (a _CURRENT pointer resolved) but the walk hit
            # a deleted one before finding any batch < batch_id: retention
            # evicted the state this retry must re-read. Returning None here
            # would silently reset the band store / count-min grids / novelty
            # baseline to empty — duplicates would leak with no error. Fail
            # loudly instead; the vacuum's batch-id keep_if is supposed to
            # make this unreachable.
            raise RuntimeError(
                f"monitor state under {state_dir}: manifest v{v} was vacuumed "
                f"but no retained manifest has batch_id < {batch_id}; refusing "
                "to continue from an empty store (state-retention bug or "
                "external deletion)"
            )
        if int(snap.extra.get("batch_id", -1)) < batch_id:
            if snap.files:
                return spark.read.parquet(*snap.paths())
            return None  # an empty-store snapshot
        v = snap.parent if snap.parent is not None else (v - 1 if v > 1 else None)
    return None


def _commit_state_snapshot(
    new_store: DataFrame, state_dir: str, batch_id: int, note: str
):
    """Publish one micro-batch's monitor state as ONE snapshot commit.

    The data dir is unique per ATTEMPT (batch id + random suffix) so a
    retried batch never overwrites files an already-published manifest
    references — published versions stay immutable and time-travelable
    (``load_snapshot(state_dir, v)`` replays any retained monitor state).
    Retention is the snapshot vacuum (newest 2 manifests + their files),
    replacing the old ad-hoc gen-dir GC: a stop() landing mid-batch can no
    longer leave a third generation to sweep, because un-published data
    dirs are simply never referenced."""
    import os
    import uuid

    from ..sources import snapshots as SNAP

    rel_dir = f"store-b{batch_id:09d}-{uuid.uuid4().hex[:8]}"  # unique per attempt
    path = os.path.join(state_dir, rel_dir)
    new_store.write.mode("error").parquet(path)
    files = sorted(
        os.path.join(rel_dir, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    snap = SNAP.publish_snapshot(
        state_dir,
        files,
        note=note,
        extra={"batch_id": int(batch_id)},
    )
    # Retention is per distinct BATCH ID, not per manifest: a post-commit
    # retry of batch N publishes a second batch-N manifest, and count-based
    # keep_last=2 would then evict the batch-N−1 manifest a further retry of
    # N must read (_load_state_snapshot wants the newest batch < N). Keep
    # every manifest whose batch_id >= N−1 — attempts are rare, so this stays
    # a handful of manifests while making every replayable batch resolvable.
    SNAP.vacuum(
        state_dir,
        keep_last=2,
        keep_if=lambda s: int(s.extra.get("batch_id", -1)) >= int(batch_id) - 1,
    )
    return snap


def neardup_batch_step(
    batch_docs: DataFrame,
    state_dir: str,
    batch_id: int,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    watermark_delay_sec: int | None = None,
    event_time_col: str = "event_time",
    text_col: str = "text",
    release_to: list | None = None,
) -> DataFrame:
    """One micro-batch of streaming near-dup dedup (pure batch logic).

    Returns the surviving (non-near-dup) docs of ``batch_docs`` and writes
    band-store generation ``gen=<batch_id>``. Semantics: a doc survives iff
    it is the FIRST carrier — in (event_time, doc_id) stream order — of
    every one of its band hashes, both against the store and within the
    batch. Band hashes of dropped docs still enter the store (a near-dup
    chain A~B, B~C drops both B and C, matching batch keep-one on the
    connected component).

    ``release_to`` (round-10 soak hygiene): the step pins two
    batch-sized checkpoints (the input docs and the drop set) that the
    returned ``survivors`` frame still reads — they cannot be freed here.
    Pass a list and the step appends their release handles; the caller
    MUST invoke them after materializing/writing the survivors, or a
    long-running streaming query accumulates two pinned RDDs per
    micro-batch for the session's lifetime (the streaming twin of the
    round-9 iterative-loop leak). Handles are per-RDD exact
    (core/checkpoint.py), so concurrent monitors in one session never
    release each other's state."""
    from pyspark.sql import Window

    from ..core.checkpoint import checkpoint_with_release
    from ..operators.dedup import minhash_signatures, shingles

    spark = batch_docs.sparkSession
    batch_docs, _rel_docs = checkpoint_with_release(batch_docs)
    if release_to is not None:
        release_to.append(_rel_docs)

    sigs = minhash_signatures(
        shingles(batch_docs, n=n, text_col=text_col), num_hashes=num_hashes
    )
    bands_col = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col("signature")[b * rows_per_band + r]
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    ev = (
        batch_docs.select("doc_id", F.col(event_time_col).alias("_ev"))
        if event_time_col in batch_docs.columns
        else batch_docs.select("doc_id", F.lit(None).cast("timestamp").alias("_ev"))
    )
    doc_bands = (
        sigs.select("doc_id", F.explode(bands_col).alias("band"))
        .select("doc_id", "band.band_id", "band.band_hash")
        .join(ev, "doc_id")
    )

    store = _load_state_snapshot(spark, state_dir, batch_id)
    if store is None:
        store = spark.createDataFrame(
            [], "band_id int, band_hash string, _ev timestamp"
        )

    # advance the horizon with THIS batch's event times and prune the store
    # BEFORE the collision check — an expired band must not veto a new doc
    if watermark_delay_sec is not None:
        horizon = (
            doc_bands.select(F.col("_ev"))
            .unionByName(store.select("_ev"))
            .agg(F.max("_ev").alias("mx"))
            .collect()[0]["mx"]
        )
        if horizon is not None:
            store = store.filter(
                F.col("_ev").isNull()
                | (
                    F.col("_ev")
                    >= F.lit(horizon) - F.expr(f"INTERVAL {watermark_delay_sec} SECOND")
                )
            )

    # docs colliding with the store on any band
    store_hit = (
        doc_bands.join(
            store.select("band_id", "band_hash"), ["band_id", "band_hash"], "left_semi"
        )
        .select("doc_id")
        .distinct()
    )
    # docs beaten to any of their bands within the batch (stream order)
    w = Window.partitionBy("band_id", "band_hash").orderBy(
        F.col("_ev").asc_nulls_last(), F.col("doc_id").asc()
    )
    batch_hit = (
        doc_bands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("doc_id")
        .distinct()
    )
    # materialize the (id-only, batch-sized) drop set NOW: the survivors
    # frame returned to the caller must not lazily re-read the previous
    # store's files — this step's own commit+vacuum may delete them before
    # the caller collects (a batch-N retry retires the oldest manifest)
    dropped, _rel_dropped = checkpoint_with_release(
        store_hit.unionByName(batch_hit).distinct()
    )
    if release_to is not None:
        release_to.append(_rel_dropped)
    survivors = batch_docs.join(dropped, "doc_id", "left_anti")

    # next generation: union of the (already horizon-pruned) store and ALL
    # batch bands (kept or dropped), deduped per key keeping the newest
    # event time
    new_store = (
        store.unionByName(doc_bands.select("band_id", "band_hash", "_ev"))
        .groupBy("band_id", "band_hash")
        .agg(F.max("_ev").alias("_ev"))
    )
    _commit_state_snapshot(
        new_store, state_dir, batch_id, note=f"neardup band store, batch {batch_id}"
    )
    return survivors


def start_streaming_neardup_dedup(
    stream_docs: DataFrame,
    state_dir: str,
    output_path: str,
    checkpoint: str,
    watermark_delay_sec: int | None = None,
    trigger_processing_time: str | None = None,
    available_now: bool = False,
    **step_kwargs,
):
    """Wire ``neardup_batch_step`` into a StreamingQuery: each micro-batch's
    survivors append to ``output_path`` (parquet). Returns the query handle.

    ``trigger_processing_time``: e.g. ``"10 seconds"`` — batch the step's
    fixed per-batch cost (store read + generation write) over more rows; at
    ingest scale the step cost is dominated by the batch's own minhash pass,
    so longer triggers amortize the store overhead without growing state.
    ``available_now`` drains the currently-available input then terminates
    (catch-up / soak mode). Per-batch checkpoint pins are released as soon
    as the batch's survivors are written (round-10 soak hygiene)."""

    def on_batch(bdf: DataFrame, batch_id: int) -> None:
        releases: list = []
        surv = neardup_batch_step(
            bdf,
            state_dir,
            batch_id,
            watermark_delay_sec=watermark_delay_sec,
            release_to=releases,
            **step_kwargs,
        )
        try:
            _idempotent_batch_write(surv, output_path, batch_id)
        finally:
            for r in releases:
                r()

    w = stream_docs.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_processing_time is not None:
        w = w.trigger(processingTime=trigger_processing_time)
    return w.start()


def reference_token_distribution(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide unigram counts ``(token, g)`` + the total folded in as a
    column — the frozen baseline a drift monitor compares live batches
    against. Vocabulary-sized, so it broadcasts."""
    tok = (
        docs.select(
            F.explode(F.split(normalized_text(text_col), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("g"))
    )
    total = tok.groupBy().agg(F.sum("g").alias("g_total"))
    return tok.crossJoin(F.broadcast(total))


def drift_batch_step(
    batch_docs: DataFrame,
    reference: DataFrame,
    batch_id: int,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source distribution drift of ONE micro-batch vs the frozen
    reference: KL(batch source dist ‖ reference dist) over the unigram
    vocabulary (the x26 statistic, applied at the streaming front door —
    "did this crawl slice change register MID-INGEST?").

    Tokens absent from the reference contribute through Laplace-style
    fallback mass (count 0 → treated as 1 in the reference) so a novel
    token raises the score instead of dividing by zero.

    Scale shape: the batch collapses to (source, token) counts in one
    shuffle; the vocabulary-sized reference broadcasts. Output one row per
    source per batch: ``(batch_id, source, n_tokens, novel_tokens, kl)``.
    """
    tok = (
        batch_docs.select(
            F.col(source_col).alias("source"),
            F.explode(F.split(normalized_text(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
    )
    stot = tok.groupBy("source").agg(F.sum("c").alias("n_s"))
    joined = (
        tok.join(F.broadcast(reference), "token", "left")
        .join(F.broadcast(stot), "source")
    )
    # the reference total rides in as a 1-row broadcast (NOT backfilled
    # from matched rows: a batch of entirely novel text has no matches)
    ref_total = reference.groupBy().agg(F.max("g_total").alias("_gt"))
    joined = joined.crossJoin(F.broadcast(ref_total))
    g = F.coalesce(F.col("g"), F.lit(1))
    p = F.col("c") / F.col("n_s")
    return (
        joined.groupBy("source")
        .agg(
            F.any_value("n_s").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("g").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("novel_tokens"),
            F.round(
                F.sum(p * F.log(p / (g / F.col("_gt")))), 6
            ).alias("kl"),
        )
        .select(
            F.lit(batch_id).alias("batch_id"),
            "source",
            "n_tokens",
            "novel_tokens",
            "kl",
        )
    )


def start_streaming_drift_monitor(
    stream_docs: DataFrame,
    reference: DataFrame,
    output_path: str,
    checkpoint: str,
    alert_kl: float | None = None,
    trigger_processing_time: str | None = None,
):
    """Wire ``drift_batch_step`` into a StreamingQuery: per-batch per-source
    drift rows append to ``output_path`` (parquet) — the monitoring feed a
    pipeline alarms on. ``alert_kl`` adds an ``alert`` boolean column. The
    reference is localCheckpointed once up front so every batch reuses the
    materialized vocabulary table instead of re-aggregating the corpus."""
    ref = reference.transform(reliable_checkpoint)

    def on_batch(bdf: DataFrame, batch_id: int) -> None:
        scores = drift_batch_step(bdf, ref, batch_id)
        if alert_kl is not None:
            scores = scores.withColumn("alert", F.col("kl") >= alert_kl)
        _idempotent_batch_write(scores, output_path, batch_id)

    w = stream_docs.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_processing_time is not None:
        w = w.trigger(processingTime=trigger_processing_time)
    return w.start()


def countmin_batch_grid(
    batch_docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """One micro-batch's count-min partial grid ``(r, bucket, cell)`` over
    unigram tokens — the a17 sketch's streaming half. A partial grid IS a
    mergeable sketch: cell-wise sum of two grids equals the grid of the
    concatenated streams, which is what makes the cumulative state exact
    to maintain and bounded at depth*width rows forever.

    The ``depth`` row hashes are the disjoint 32-bit slices of ONE md5
    per token (Kirsch-Mitzenmacher derived hashes, a17's round-8 trick):
    one digest per token on the batch-sized branch instead of a salted
    re-hash per sketch row. Requires ``depth <= 4`` (an md5 yields four
    u32 slices).

    STATE-FORMAT BREAK (round 8): the slice derivation is a DIFFERENT
    hash family from the earlier per-row salted-md5 version, so a
    cumulative grid persisted by that version must be DISCARDED, not
    merged — its (r, bucket) cells no longer correspond to the same
    token sets, and a mixed :func:`countmin_merge_step` union would
    produce silently wrong estimates. ``depth >= 5`` (valid under
    salted hashing) now raises rather than silently degrading."""
    if depth > 4:
        raise ValueError("countmin_batch_grid derives rows from one md5: depth <= 4")
    tok = (
        batch_docs.select(
            F.explode(F.split(normalized_text(text_col), " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    h = F.md5(F.concat(F.lit("cm:"), F.col("token")))
    slices = F.array(
        *[
            F.conv(F.substring(F.col("h"), 1 + 8 * r, 8), 16, 10).cast("long")
            % width
            for r in range(depth)
        ]
    )
    return (
        tok.select(h.alias("h"))
        .select(F.posexplode(slices).alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cell"))
    )


def countmin_merge_step(
    batch_docs: DataFrame,
    prior_grid: DataFrame | None,
    batch_id: int,
    depth: int = 4,
    width: int = 256,
    top_m: int = 10,
    text_col: str = "text",
    release_to: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of the streaming heavy-hitter monitor (pure batch
    logic): merge the batch's partial count-min grid into the cumulative
    grid, then probe the batch's top-``top_m`` tokens (by exact BATCH
    count — the candidate heap a sketch pipeline keeps beside the grid)
    against the MERGED grid for their cumulative estimate.

    Returns ``(new_grid, report)`` where report rows are
    ``(batch_id, token, batch_count, est_total)`` — est_total carries the
    count-min overestimate invariant vs the true cumulative count.

    Scale shape: the grid state is ≤ depth*width rows regardless of stream
    length (the entire point of sketching the stream); each batch costs one
    partial-agg groupBy over (depth x batch tokens) plus metadata-sized
    merges and probes.

    ``release_to`` (round-10 soak hygiene): the merged grid is pinned so
    the snapshot commit and the report both read one materialization;
    pass a list to receive its release handle and call it once both are
    written — otherwise a long stream pins one grid copy per batch."""
    grid_b = countmin_batch_grid(batch_docs, depth, width, text_col)
    merged = grid_b if prior_grid is None else (
        grid_b.unionByName(prior_grid)
        .groupBy("r", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )
    from ..core.checkpoint import checkpoint_with_release

    merged, _rel = checkpoint_with_release(merged)
    if release_to is not None:
        release_to.append(_rel)

    tok = (
        batch_docs.select(
            F.explode(F.split(normalized_text(text_col), " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    top = (
        tok.groupBy("token")
        .agg(F.count("*").alias("batch_count"))
        .orderBy(F.desc("batch_count"), F.asc("token"))
        .limit(top_m)
    )
    probe_slices = F.array(
        *[
            F.conv(F.substring(F.col("h"), 1 + 8 * r, 8), 16, 10).cast("long")
            % width
            for r in range(depth)
        ]
    )
    probes = top.select(
        "token",
        "batch_count",
        F.md5(F.concat(F.lit("cm:"), F.col("token"))).alias("h"),
    ).select(
        "token",
        "batch_count",
        F.posexplode(probe_slices).alias("r", "bucket"),
    )
    report = (
        probes.join(F.broadcast(merged), ["r", "bucket"])
        .groupBy("token")
        .agg(
            F.lit(batch_id).alias("batch_id"),
            F.any_value("batch_count").alias("batch_count"),
            F.min("cell").alias("est_total"),
        )
        .select("batch_id", "token", "batch_count", "est_total")
    )
    return merged, report


def start_streaming_heavy_hitters(
    stream_docs: DataFrame,
    state_dir: str,
    output_path: str,
    checkpoint: str,
    depth: int = 4,
    width: int = 256,
    top_m: int = 10,
    trigger_processing_time: str | None = None,
    available_now: bool = False,
):
    """Wire ``countmin_merge_step`` into a StreamingQuery: the cumulative
    grid persists through the same manifest-pinned snapshot commits as the
    near-dup band store and batch curation (one commit per micro-batch,
    retention via the snapshot vacuum, time travel over retained grids);
    per-batch heavy-hitter reports append to ``output_path``.

    The snapshot read (newest manifest with batch < N) also closes a
    retry hazard the gen-dir store had: reading "the newest generation"
    on a retried batch N found gen N itself and merged the batch's grid
    TWICE — the manifest chain can't, by construction.

    ``available_now`` drains the currently-available input then
    terminates (catch-up / soak mode). The per-batch grid pin is released
    once the snapshot commit and the report write both land (round-10
    soak hygiene)."""

    def on_batch(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        prior = _load_state_snapshot(spark, state_dir, batch_id)
        releases: list = []
        merged, report = countmin_merge_step(
            bdf, prior, batch_id, depth, width, top_m, release_to=releases
        )
        try:
            _commit_state_snapshot(
                merged.coalesce(1), state_dir, batch_id,
                note=f"count-min grid, batch {batch_id}",
            )
            _idempotent_batch_write(report, output_path, batch_id)
        finally:
            for r in releases:
                r()

    w = stream_docs.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_processing_time is not None:
        w = w.trigger(processingTime=trigger_processing_time)
    return w.start()


def _kmv_u(col: str = "shingle"):
    """The x27 KMV uniform: first 8 md5 hex chars / 2^32 — a pure function
    of the value, so synopses built anywhere merge exactly."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
    )


def _kmv_estimate(us: list, k: int) -> float:
    """(k−1)/u_(k) above the exact regime; len(us) below it. ``us`` is the
    ASCENDING synopsis list."""
    if len(us) < k:
        return float(len(us))
    return (k - 1) / us[k - 1]


def novelty_batch_step(
    batch_docs: DataFrame,
    state_dir: str,
    batch_id: int,
    k: int = 1024,
    n: int = 5,
    text_col: str = "text",
) -> dict:
    """One micro-batch of the streaming NOVELTY monitor — "is this crawl
    slice adding new text or re-serving what we already ingested?" (the
    x42 diagnostic at the streaming front door).

    Exact cross-batch novelty would need every shingle ever seen — state
    that grows with the corpus. A KMV synopsis (the k smallest md5-derived
    uniforms over 5-gram shingles, the x27 sketch) is FIXED at k rows
    forever and mergeable by construction: distinct-count estimates for
    the prior corpus and for prior ∪ batch come from the same synopsis
    rule, and their difference estimates the batch's NEW distinct
    shingles. Relative error ~1/√k (≈3% at k=1024).

    Per batch: one distinct-shingle reduce of the batch (corpus-scale work
    happens HERE, on the batch only), a k-row TakeOrdered for the batch
    synopsis, a k-row merge with the prior synopsis (metadata), and one
    snapshot commit of the k-row synopsis (same manifest path as the
    near-dup band store and count-min grid — and the same retry fix: the
    prior synopsis is the newest snapshot with batch < N, never the
    retried batch's own union, so a retry's est_prior can't silently
    include the batch). Returns the monitor row as a plain dict.
    """
    from ..operators.dedup import shingles

    sh_u = (
        shingles(
            batch_docs.select(F.lit(0).alias("doc_id"), F.col(text_col).alias("text")),
            n=n,
        )
        .select("shingle")
        .distinct()
        .select(_kmv_u("shingle").alias("u"))
    )
    batch_distinct = sh_u.count()
    batch_syn = [r["u"] for r in sh_u.orderBy("u").limit(k).collect()]

    prior: list = []
    spark = batch_docs.sparkSession
    prior_df = _load_state_snapshot(spark, state_dir, batch_id)
    if prior_df is not None:
        prior = [r["u"] for r in prior_df.orderBy("u").collect()]

    merged = sorted(set(prior) | set(batch_syn))[:k]
    est_prior = _kmv_estimate(prior, k)
    est_union = _kmv_estimate(merged, k)
    novel_est = max(est_union - est_prior, 0.0)
    row = {
        "batch_id": batch_id,
        "batch_distinct": batch_distinct,
        "est_prior": round(est_prior, 2),
        "est_union": round(est_union, 2),
        "novel_est": round(novel_est, 2),
        "novelty_rate": round(
            min(novel_est / batch_distinct, 1.0), 6
        ) if batch_distinct else 0.0,
    }
    _commit_state_snapshot(
        spark.createDataFrame([(u,) for u in merged], "u double").coalesce(1),
        state_dir,
        batch_id,
        note=f"KMV novelty synopsis, batch {batch_id}",
    )
    return row


def start_streaming_novelty_monitor(
    stream_docs: DataFrame,
    state_dir: str,
    output_path: str,
    checkpoint: str,
    k: int = 1024,
    alert_below: float | None = None,
    trigger_processing_time: str | None = None,
    available_now: bool = False,
):
    """Wire ``novelty_batch_step`` into a StreamingQuery: one monitor row
    per micro-batch appends to ``output_path`` (parquet). ``alert_below``
    flags batches whose novelty rate drops under the floor — the "this
    feed started re-serving its own archive" alarm. ``available_now``
    drains the currently-available input and terminates (the catch-up /
    test mode); default is a continuous query."""
    import json as _json

    def on_batch(bdf: DataFrame, batch_id: int) -> None:
        row = novelty_batch_step(bdf, state_dir, batch_id, k=k)
        if alert_below is not None:
            row["alert"] = row["novelty_rate"] < alert_below
        spark = bdf.sparkSession
        schema = (
            "batch_id long, batch_distinct long, est_prior double, "
            "est_union double, novel_est double, novelty_rate double"
            + (", alert boolean" if alert_below is not None else "")
        )
        _idempotent_batch_write(
            spark.createDataFrame([tuple(row.values())], schema),
            output_path,
            batch_id,
        )

    w = stream_docs.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger_processing_time is not None:
        w = w.trigger(processingTime=trigger_processing_time)
    return w.start()
