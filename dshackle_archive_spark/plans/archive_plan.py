"""``archive`` — bulk historical copy (reference ``src/command/archive.rs`` +
``src/archiver/archiver.rs:116-176``).

Spark shape (SURVEY §3.1): the height domain for each chunk is a DataFrame,
fetch stages are rate-capped ``mapInPandas`` fan-outs, writes are one file
per (chunk, kind) via the layout sink, and each written file emits a
notification row. Unlike the reference's sequential per-chunk loop, all
chunks of a range land in ONE Spark job per kind — the chunk key is the
shuffle/group key, so a 1000-executor cluster archives 1000 chunks at once.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..core.filenames import DataKind
from ..core.ranges import Range
from ..sources import ref_layout
from ..sources.fetcher import FetchPolicy, fetch_blocks, fetch_table_for_heights

ALL_TABLES = (DataKind.BLOCKS, DataKind.TRANSACTIONS, DataKind.TRACES)


@dataclass
class ArchiveResult:
    notifications: DataFrame
    written: int = 0
    skipped: int = 0
    files: list[str] = field(default_factory=list)
    # raw write-result rows (metadata-scale; one per file) — feeds the
    # metrics registry with per-kind item counts without another action
    write_rows: list = field(default_factory=list)


def archive(
    spark: SparkSession,
    provider,
    root: str,
    rng: Range,
    tables: tuple[DataKind, ...] = ALL_TABLES,
    chunk: int = 1000,
    policy: FetchPolicy = FetchPolicy(),
    overwrite: bool = False,
    run: str = "archive",
    fmt: str = "parquet",
    compression: str = "zstd",
) -> ArchiveResult:
    """Archive ``rng`` into reference-layout range files under ``root``.

    ``fmt="avro"`` writes the reference's native Avro container format
    (schemas_avro) — byte-compatible with the reference tooling."""
    results: DataFrame | None = None
    for kind in tables:
        if kind == DataKind.BLOCKS:
            df = fetch_blocks(spark, provider, rng, policy)
        else:
            df = fetch_table_for_heights(spark, provider, rng, kind.value, policy)
        wr = ref_layout.write_range_files(
            df,
            root,
            provider.blockchain_id,
            kind,
            chunk=chunk,
            run=run,
            overwrite=overwrite,
            requested=rng,
            fmt=fmt,
            compression=compression,
        )
        results = wr if results is None else results.unionByName(wr)

    # materialize the write action once, keep the summary driver-side
    rows = results.collect()
    notif = ref_layout.notifications_df(
        spark.createDataFrame(rows, ref_layout.WRITE_RESULT_SCHEMA)
    )
    return ArchiveResult(
        notifications=notif,
        written=sum(1 for r in rows if not r["skipped"]),
        skipped=sum(1 for r in rows if r["skipped"]),
        files=[r["location"] for r in rows if not r["skipped"]],
        write_rows=rows,
    )


def archive_single_blocks(
    spark: SparkSession,
    provider,
    root: str,
    rng: Range,
    tables: tuple[DataKind, ...] = ALL_TABLES,
    policy: FetchPolicy = FetchPolicy(),
    forks: bool = False,
    run: str = "stream",
    maturity: str | None = None,
    fmt: str = "parquet",
    compression: str = "zstd",
) -> ArchiveResult:
    """Stream-shape archive: per-height single-block files, never overwritten,
    hash-qualified when fork-tolerant (T5)."""
    results: DataFrame | None = None
    blocks = fetch_blocks(spark, provider, rng, policy, forks=forks)
    for kind in tables:
        if kind == DataKind.BLOCKS:
            df = blocks
        else:
            df = fetch_table_for_heights(spark, provider, rng, kind.value, policy)
        wr = ref_layout.write_single_files(
            df,
            root,
            provider.blockchain_id,
            kind,
            run=run,
            overwrite=False,
            maturity=maturity,
            hash_in_name=forks and kind == DataKind.BLOCKS,
            requested=rng,
            fmt=fmt,
            compression=compression,
        )
        results = wr if results is None else results.unionByName(wr)
    rows = results.collect()
    notif = ref_layout.notifications_df(
        spark.createDataFrame(rows, ref_layout.WRITE_RESULT_SCHEMA)
    )
    return ArchiveResult(
        notifications=notif,
        written=sum(1 for r in rows if not r["skipped"]),
        skipped=sum(1 for r in rows if r["skipped"]),
        files=[r["location"] for r in rows if not r["skipped"]],
        write_rows=rows,
    )
