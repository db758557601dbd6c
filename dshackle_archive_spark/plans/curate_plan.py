"""``curate`` — the end-to-end training-data curation pipeline, composing
the corpus operators into the job a data team actually runs:

    quality filter → [repeated-passage strip] → exact dedup → near-dup
    dedup (MinHash/LSH → Jaccard confirm → connected components →
    keep-best) → benchmark decontamination → deterministic split →
    partitioned write

Beyond-reference surface (the engine's north star): each stage is one of
the independently oracle-verified operators; this plan chains them with
the scale discipline they were built with — hashes and doc_ids shuffle,
raw text never does (except the one window that picks the longest doc per
duplicate cluster, whose partitions are duplicate-group-sized); the
benchmark n-gram set broadcasts; the split is md5-banded (layout- and
run-independent).

Every run is REPRODUCIBLE: no RNG, no timestamps — re-running on the same
input produces byte-identical survivors, which is what makes curation
auditable (exactly why `df.sample`-based pipelines are not).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..core.checkpoint import reliable_checkpoint

from ..operators.dedup import (
    band_rows,
    benchmark_contamination,
    cluster_representatives,
    connected_components,
    content_hash,
    distinct_documents,
    jaccard_for_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    repeated_segment_removal,
    segment_df,
    shingles,
)
from ..operators.textan import quality_features


@dataclass
class CurateResult:
    stage_counts: dict[str, int] = field(default_factory=dict)
    # wall seconds per stage, measured around each stage's materializing
    # count (round-10 memory-pressure probe evidence; the attrition audit
    # gains a cost audit)
    stage_seconds: dict[str, float] = field(default_factory=dict)
    output_path: str | None = None


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    min_stopword_ratio: float = 0.05,
    max_punct_ratio: float = 0.2,
) -> DataFrame:
    """Keep docs passing the composite quality rules (the x7 rule set)."""
    q = quality_features(docs).select(
        "doc_id", "n_tokens", "stopword_ratio", "punct_ratio"
    )
    keep = q.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("punct_ratio") <= max_punct_ratio)
    ).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")


def neardup_filter(
    docs: DataFrame,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Drop near-duplicates, keeping the longest doc per duplicate cluster.

    LSH candidates → Jaccard confirmation at ``jaccard_threshold`` →
    connected components → keep-best representative. Only confirmed pairs
    enter the component graph, so transitive chains of merely-candidate
    pairs cannot glue unrelated docs together.

    Jaccard is scored ONLY on the LSH candidate pairs
    (``jaccard_for_pairs``): a full posting-list join costs Σ df², which
    OOMed a 105k-doc low-entropy probe corpus — candidate-scoped scoring
    is bounded by the LSH collision rate regardless of vocabulary."""
    sh = shingles(docs, n=shingle_n)
    sigs = minhash_signatures(sh, num_hashes=16, token_col="shingle")
    cands = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    confirmed = jaccard_for_pairs(
        cands, sh, threshold=jaccard_threshold, token_col="shingle"
    ).select("doc_a", "doc_b")
    clusters = connected_components(confirmed)
    reps = cluster_representatives(clusters, docs)
    drop = clusters.join(
        reps.select(F.col("rep_doc_id").alias("doc_id")), "doc_id", "left_anti"
    ).select("doc_id")
    return docs.join(drop, "doc_id", "left_anti")


def split_column(id_col: str = "doc_id"):
    """The x6 md5-banded ~80/10/10 split, as a column."""
    b = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")


def curate(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    output_path: str | None = None,
    snapshot: bool = False,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    min_stopword_ratio: float = 0.05,
    max_punct_ratio: float = 0.2,
    strip_passages: bool = False,
    passage_min_df: int = 5,
    passage_seg_len: int = 12,
    jaccard_threshold: float = 0.8,
    contamination_n: int = 5,
    contamination_threshold: float = 0.05,
) -> tuple[DataFrame, CurateResult]:
    """Run the full curation chain; returns (curated DataFrame with a
    ``split`` column, stage-count result). When ``output_path`` is given
    the survivors are written as parquet partitioned by split.

    Stage counts cost one count-action per stage — intentional: a curation
    job IS an audit artifact, and the per-stage attrition numbers are its
    primary output after the data itself.

    Every stage boundary is ``localCheckpoint``-materialized: the dedup
    stages are multi-join DAGs, and leaving them as lineage means (a) each
    later stage re-executes the whole upstream chain and (b) AQE plans
    joins against size ESTIMATES compounded through that chain — a 105k-doc
    probe corpus drove it to broadcast a corpus-sized side and exhaust the
    heap. Checkpointing gives AQE true sizes and bounds recomputation; at
    cluster scale these boundaries would be persisted tables anyway."""
    import time as _time

    res = CurateResult()

    def _staged(name: str, df: DataFrame, checkpoint: bool = True) -> DataFrame:
        # timing wraps BOTH the (eager) checkpoint materialization and the
        # count — the checkpoint is where the stage's work actually runs
        t0 = _time.perf_counter()
        out_df = reliable_checkpoint(df) if checkpoint else df
        res.stage_counts[name] = out_df.count()
        res.stage_seconds[name] = round(_time.perf_counter() - t0, 3)
        return out_df

    _staged("input", docs, checkpoint=False)

    stage = _staged(
        "quality",
        quality_filter(docs, min_tokens, max_tokens, min_stopword_ratio, max_punct_ratio),
    )
    observed = stage  # post-quality, pre-strip: source of the segment-df index

    if strip_passages:
        # repeated-passage removal (RefinedWeb line-dedup stage) BEFORE
        # exact dedup: documents that differ only in shared boilerplate
        # collapse to the same cleaned text and fall to the next stage's
        # hash dedup. Rebuilt text is the normalized form (downstream
        # stages normalize anyway); docs stripped below the token floor
        # exit here.
        cleaned = repeated_segment_removal(
            stage, seg_len=passage_seg_len, min_df=passage_min_df
        )
        stage = _staged(
            "passage_strip",
            stage.drop("text")
            .join(
                cleaned.select(
                    "doc_id",
                    F.col("cleaned_text").alias("text"),
                    "kept_tokens",
                ),
                "doc_id",
            )
            .filter(F.col("kept_tokens") >= min_tokens)
            .drop("kept_tokens"),
        )

    stage = _staged("exact_dedup", distinct_documents(stage))

    stage = _staged(
        "neardup", neardup_filter(stage, jaccard_threshold=jaccard_threshold)
    )

    if benchmark is not None:
        flagged = benchmark_contamination(
            stage,
            benchmark,
            n=contamination_n,
            threshold=contamination_threshold,
        ).select("doc_id")
        stage = _staged(
            "decontaminated", stage.join(flagged, "doc_id", "left_anti")
        )

    out = stage.withColumn("split", split_column())
    if output_path is not None:
        if snapshot:
            _commit_snapshot(out, output_path, tag="b000000",
                             note="curate base", segments_source=observed)
        else:
            out.write.mode("overwrite").partitionBy("split").parquet(output_path)
        res.output_path = output_path
        # audit manifest beside the data: the attrition numbers and the
        # exact thresholds that produced this corpus version (curation is
        # an audit artifact — a corpus without its recipe is unreviewable)
        manifest = {
            "stages": res.stage_counts,
            "params": {
                "min_tokens": min_tokens,
                "max_tokens": max_tokens,
                "min_stopword_ratio": min_stopword_ratio,
                "max_punct_ratio": max_punct_ratio,
                "strip_passages": strip_passages,
                "passage_min_df": passage_min_df,
                "passage_seg_len": passage_seg_len,
                "jaccard_threshold": jaccard_threshold,
                "contamination_n": contamination_n,
                "contamination_threshold": contamination_threshold,
                "decontaminated": benchmark is not None,
            },
        }
        manifest["total_docs"] = res.stage_counts[
            "decontaminated" if benchmark is not None else "neardup"
        ]
        manifest["increments"] = []
        _write_text(output_path, "_MANIFEST.json", json.dumps(manifest, indent=2, sort_keys=True))
        if not snapshot:
            _write_index(out, output_path, mode="overwrite",
                         segments_source=observed)
    return out, res


def _join(root: str, *parts: str) -> str:
    if "://" in root:
        return root.rstrip("/") + "/" + "/".join(parts)
    return os.path.join(root, *parts)


def _write_text(root: str, name: str, payload: str) -> None:
    """Manifest write that works on posix paths AND object-store URIs —
    a local open() on an s3:// root would fail AFTER the expensive
    parquet write succeeded."""
    if "://" in root:
        import pyarrow.fs as pafs

        fs, fs_path = pafs.FileSystem.from_uri(root)
        with fs.open_output_stream(fs_path.rstrip("/") + "/" + name) as f:
            f.write(payload.encode())
    else:
        with open(os.path.join(root, name), "w") as f:
            f.write(payload)


def _read_text(root: str, name: str) -> str:
    if "://" in root:
        import pyarrow.fs as pafs

        fs, fs_path = pafs.FileSystem.from_uri(root)
        with fs.open_input_stream(fs_path.rstrip("/") + "/" + name) as f:
            return f.read().decode()
    with open(os.path.join(root, name)) as f:
        return f.read()


def _write_index(
    survivors: DataFrame,
    output_path: str,
    mode: str,
    hashes_dir: str | None = None,
    bands_dir: str | None = None,
    segments_dir: str | None = None,
    segments_source: DataFrame | None = None,
) -> None:
    """The corpus's dedup INDEX, persisted beside the data: content hashes
    (exact-dup probe) and LSH band rows (near-dup probe). An incremental
    batch joins against THESE — sized ~17 small rows per document — instead
    of rescanning the corpus text, which is what makes adding 1 TB to a
    100 TB corpus cost O(batch), not O(corpus)."""
    hashes = survivors.select(
        "doc_id", content_hash("text").alias("content_hash")
    )
    hashes.write.mode(mode).parquet(
        hashes_dir or _join(output_path, "_index", "hashes")
    )
    sigs = minhash_signatures(
        shingles(survivors, n=3), num_hashes=16, token_col="shingle"
    )
    band_rows(sigs, bands=4, rows_per_band=4).write.mode(mode).parquet(
        bands_dir or _join(output_path, "_index", "bands")
    )
    # segment-df store: the corpus's boilerplate knowledge, from the
    # OBSERVED (post-quality, pre-strip) text when the caller passes it —
    # stripped boilerplate must keep accumulating df so future increments
    # still recognize it
    segment_df(segments_source if segments_source is not None else survivors).write.mode(
        mode
    ).parquet(segments_dir or _join(output_path, "_index", "segments"))


def _list_parquet_rel(root: str, subdir: str) -> list[str]:
    """All parquet part files under root/subdir, as root-relative paths."""
    out = []
    base = os.path.join(root, subdir)
    for dirpath, _dirs, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def _commit_snapshot(
    out: DataFrame,
    root: str,
    tag: str,
    note: str,
    base_files: tuple[str, ...] = (),
    segments_source: DataFrame | None = None,
) -> None:
    """Transactional curation commit (Iceberg-style, via ``sources/
    snapshots``): the batch's data AND its dedup-index rows are written to
    fresh ``{tag}`` directories that no reader resolves yet, then ONE
    manifest publish makes data+index visible together. A crash mid-write
    leaves orphan files under an unpublished tag — readers and later
    incrementals keep resolving the previous version, never a half-visible
    batch (plain ``mode=append`` cannot give this: Spark commits each part
    file independently). ``list_orphans`` finds such never-published files
    for cleanup (``snapshots.vacuum`` handles the other retirement path:
    files owned only by dropped manifests).

    Posix roots only (the snapshot layer's ``os.replace`` commit protocol);
    object stores use the plain-append path or a conditional-put port."""
    from ..sources import snapshots as SNAP

    out.write.mode("overwrite").partitionBy("split").parquet(
        _join(root, "data", tag)
    )
    _write_index(
        out,
        root,
        mode="overwrite",
        hashes_dir=_join(root, "_index", "hashes", tag),
        bands_dir=_join(root, "_index", "bands", tag),
        segments_dir=_join(root, "_index", "segments", tag),
        segments_source=segments_source,
    )
    files = list(base_files)
    for sub in (f"data/{tag}", f"_index/hashes/{tag}", f"_index/bands/{tag}",
                f"_index/segments/{tag}"):
        files.extend(_list_parquet_rel(root, sub))
    SNAP.publish_snapshot(root, files, note=note)


def _snapshot_paths(root: str, prefix: str, version: int | None = None) -> list[str]:
    """Absolute paths of the current (or pinned) snapshot's files under
    ``prefix`` — how a reader or an incremental run resolves data/index
    through the manifest instead of a directory walk."""
    from ..sources import snapshots as SNAP

    snap = SNAP.load_snapshot(root, version)
    if snap is None:
        raise ValueError(
            f"{root}: no curation snapshot published (curate with snapshot=True)"
        )
    return [
        os.path.join(root, f) for f in snap.files if f.startswith(prefix)
    ]


def list_orphans(root: str) -> list[str]:
    """Files under ``data/`` and ``_index/`` referenced by NO manifest —
    the residue of a crashed snapshot commit (written, never published).
    Safe to delete once no writer is mid-commit; returned as root-relative
    paths so the caller stays in control of the actual deletion."""
    from ..sources import snapshots as SNAP

    mdir = os.path.join(root, "_manifests")
    live: set[str] = set()
    if os.path.isdir(mdir):
        import re as _re

        for n in os.listdir(mdir):
            if (m := _re.fullmatch(r"v(\d+)\.json", n)):
                snap = SNAP.load_snapshot(root, int(m.group(1)))
                if snap:
                    live |= set(snap.files)
    orphans = []
    for sub in ("data", "_index"):
        for rel in _list_parquet_rel(root, sub):
            if rel not in live:
                orphans.append(rel)
    return sorted(orphans)


def read_curated(spark, root: str, version: int | None = None) -> DataFrame:
    """Scan a pinned corpus version: the explicit manifest file list, so a
    concurrent incremental commit cannot change what this reader sees
    mid-query; pass ``version`` for time travel across increments. The
    ``split`` column is recomputed (it is a pure function of ``doc_id``),
    so no partition-discovery assumptions ride on the batch directory
    layout."""
    df = spark.read.parquet(*_snapshot_paths(root, "data/", version))
    return df.withColumn("split", split_column())


def curate_incremental(
    new_docs: DataFrame,
    prev_output_path: str,
    benchmark: DataFrame | None = None,
    snapshot: bool = False,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    min_stopword_ratio: float = 0.05,
    max_punct_ratio: float = 0.2,
    strip_passages: bool = False,
    passage_min_df: int = 5,
    passage_seg_len: int = 12,
    jaccard_threshold: float = 0.8,
    contamination_n: int = 5,
    contamination_threshold: float = 0.05,
) -> tuple[DataFrame, CurateResult]:
    """Add a batch to an existing curated corpus WITHOUT reprocessing it.

    The whole point at scale: a 100 TB corpus must not be rescanned to
    admit a 1 TB batch. Every cross-corpus check runs against the
    persisted ``_index`` (content hashes + LSH band rows, ~17 small rows
    per prior doc), and prior TEXT is touched only for the docs whose band
    hashes actually collide with the batch — a semi-join-pruned point
    lookup, bounded by the LSH collision rate:

    1. quality filter + in-batch exact dedup (same rules as ``curate``);
    2. exact cross-corpus dedup: anti join on ``content_hash`` vs the
       hash index;
    3. in-batch near-dup dedup (``neardup_filter``);
    4. cross-corpus near-dup: batch band rows equi-join the band index →
       candidate (new, prior) pairs → Jaccard confirmed on shingles, with
       the prior side's shingles built from ONLY the colliding prior docs;
    5. optional decontamination;
    6. survivors appended to the data AND to the index; the manifest
       gains an ``increments`` entry (the corpus recipe stays auditable).

    Contract: ``doc_id`` must be unique across corpus versions (ingestion
    pipelines already guarantee monotone ids); survivors carry the same
    schema as the base corpus.
    """
    spark = new_docs.sparkSession
    res = CurateResult()
    res.stage_counts["input"] = new_docs.count()

    stage = quality_filter(
        new_docs, min_tokens, max_tokens, min_stopword_ratio, max_punct_ratio
    ).transform(reliable_checkpoint)
    res.stage_counts["quality"] = stage.count()
    observed = stage  # post-quality, pre-strip: source of the segment-df index

    if strip_passages:
        # repeated-passage removal (RefinedWeb line-dedup stage) BEFORE
        # exact dedup: documents that differ only in shared boilerplate
        # collapse to the same cleaned text and fall to the next stage's
        # hash dedup. Rebuilt text is the normalized form (downstream
        # stages normalize anyway); docs stripped below the token floor
        # exit here.
        # CUMULATIVE strip decision: batch df + the prior corpus's
        # persisted segment-df store (missing store -> batch-scoped only,
        # e.g. a base corpus curated before the store existed)
        # Only a MISSING store degrades to batch-scoped passage stripping;
        # a real read error (transient IO, corrupt parquet) must propagate —
        # silently dropping the prior segment index would change the
        # documented cumulative semantics without anyone noticing.
        from pyspark.errors import AnalysisException

        prior_seg = None
        try:
            if snapshot:
                seg_paths = _snapshot_paths(
                    prev_output_path, "_index/segments/"
                )
                if seg_paths:
                    prior_seg = spark.read.parquet(*seg_paths)
            else:
                prior_seg = spark.read.parquet(
                    _join(prev_output_path, "_index", "segments")
                )
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
                raise
            prior_seg = None
        cleaned = repeated_segment_removal(
            stage, seg_len=passage_seg_len, min_df=passage_min_df,
            prior_segment_df=prior_seg,
        )
        stage = (
            stage.drop("text")
            .join(
                cleaned.select(
                    "doc_id",
                    F.col("cleaned_text").alias("text"),
                    "kept_tokens",
                ),
                "doc_id",
            )
            .filter(F.col("kept_tokens") >= min_tokens)
            .drop("kept_tokens")
            .transform(reliable_checkpoint)
        )
        res.stage_counts["passage_strip"] = stage.count()

    stage = distinct_documents(stage).transform(reliable_checkpoint)
    res.stage_counts["exact_dedup"] = stage.count()

    # 2. exact cross-corpus: hash anti join against the index (never text)
    if snapshot:
        from ..sources import snapshots as SNAP

        snap = SNAP.load_snapshot(prev_output_path)
        if snap is None:
            raise ValueError(
                f"{prev_output_path}: no snapshot — base corpus must be "
                "curated with snapshot=True"
            )
        prior_hashes = spark.read.parquet(
            *_snapshot_paths(prev_output_path, "_index/hashes/")
        ).select("content_hash")
    else:
        prior_hashes = spark.read.parquet(
            _join(prev_output_path, "_index", "hashes")
        ).select("content_hash")
    stage = (
        stage.withColumn("_h", content_hash("text"))
        .join(
            prior_hashes.withColumnRenamed("content_hash", "_h"),
            "_h",
            "left_anti",
        )
        .drop("_h")
        .transform(reliable_checkpoint)
    )
    res.stage_counts["prior_exact"] = stage.count()

    stage = neardup_filter(stage, jaccard_threshold=jaccard_threshold).transform(reliable_checkpoint)
    res.stage_counts["neardup"] = stage.count()

    # 4. cross-corpus near-dup: probe the band index, confirm on shingles
    sh_new = shingles(stage, n=3)
    sigs_new = minhash_signatures(sh_new, num_hashes=16, token_col="shingle")
    bands_new = band_rows(sigs_new, bands=4, rows_per_band=4)
    if snapshot:
        prior_bands = spark.read.parquet(
            *_snapshot_paths(prev_output_path, "_index/bands/")
        )
    else:
        prior_bands = spark.read.parquet(
            _join(prev_output_path, "_index", "bands")
        )
    cand = (
        bands_new.join(
            prior_bands.select(
                F.col("doc_id").alias("prior_id"), "band_id", "band_hash"
            ),
            ["band_id", "band_hash"],
        )
        .select(F.col("doc_id").alias("doc_a"), F.col("prior_id").alias("doc_b"))
        .distinct()
        .transform(reliable_checkpoint)
    )
    hit_ids = cand.select(F.col("doc_b").alias("doc_id")).distinct()
    if snapshot:
        prior_docs = spark.read.parquet(
            *_snapshot_paths(prev_output_path, "data/")
        )
    else:
        prior_docs = spark.read.parquet(prev_output_path)
    # text is read ONLY for colliding prior docs (semi-join-pruned scan)
    sh_prior = shingles(prior_docs.join(hit_ids, "doc_id", "left_semi"), n=3)
    confirmed = jaccard_for_pairs(
        cand,
        sh_new.unionByName(sh_prior),
        threshold=jaccard_threshold,
        token_col="shingle",
    ).select("doc_a")
    stage = stage.join(
        confirmed.withColumnRenamed("doc_a", "doc_id").distinct(),
        "doc_id",
        "left_anti",
    ).transform(reliable_checkpoint)
    res.stage_counts["prior_neardup"] = stage.count()

    if benchmark is not None:
        flagged = benchmark_contamination(
            stage,
            benchmark,
            n=contamination_n,
            threshold=contamination_threshold,
        ).select("doc_id")
        stage = stage.join(flagged, "doc_id", "left_anti").transform(reliable_checkpoint)
        res.stage_counts["decontaminated"] = stage.count()

    out = stage.withColumn("split", split_column())
    if snapshot:
        _commit_snapshot(
            out,
            prev_output_path,
            tag=f"b{snap.version + 1:06d}",
            note=f"curate increment on v{snap.version}",
            base_files=snap.files,
            segments_source=observed,
        )
    else:
        out.write.mode("append").partitionBy("split").parquet(prev_output_path)
        _write_index(stage, prev_output_path, mode="append",
                     segments_source=observed)
    res.output_path = prev_output_path

    admitted = res.stage_counts[
        "decontaminated" if benchmark is not None else "prior_neardup"
    ]
    manifest = json.loads(_read_text(prev_output_path, "_MANIFEST.json"))
    manifest.setdefault("increments", []).append(
        {"stages": res.stage_counts, "admitted": admitted}
    )
    manifest["total_docs"] = manifest.get("total_docs", 0) + admitted
    _write_text(
        prev_output_path, "_MANIFEST.json", json.dumps(manifest, indent=2, sort_keys=True)
    )
    return out, res
