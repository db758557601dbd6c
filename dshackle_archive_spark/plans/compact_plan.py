"""``compact`` — merge single-block files into range files (reference
``src/command/compact.rs``, SURVEY §3.3 tail).

Spark shape: classic small-file compaction with a completeness gate.

1. aligned chunks only (C2 — compaction never builds partial range files,
   ``compact.rs:48``)
2. per-chunk gate (``verify_files``, ``compact.rs:221-243``): every group
   complete for the requested kinds AND the union of group ranges exactly
   covers the chunk — otherwise the chunk is skipped with a warning
3. rewrite: read the chunk's source files, P1-filter to the chunk, write one
   range file per kind (map-only plan; each output file is one task)
4. reconciliation (J6/A7): copied heights must form exactly one island equal
   to the chunk; txids promised by copied blocks == txids copied
5. delete source files fully covered by the chunk
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.filenames import DataKind
from ..core.ranges import Range
from ..operators.intervals import merge_range_rows
from ..operators.inventory import group_ranges
from ..sources import ref_layout
from ..sources.archive import delete_files, inventory_df


@dataclass
class CompactResult:
    compacted_chunks: list[tuple[int, int]] = field(default_factory=list)
    skipped_chunks: list[tuple[int, int, str]] = field(default_factory=list)
    written: list[str] = field(default_factory=list)
    deleted: list[str] = field(default_factory=list)


def _chunk_complete(spark, inv: DataFrame, chunk_rng: Range, kinds: tuple[str, ...]) -> tuple[bool, str]:
    """Gate: all kinds complete and ranges exactly covering the chunk."""
    in_chunk = inv.filter(
        (F.col("start") >= chunk_rng.start) & (F.col("end") <= chunk_rng.end)
    )
    overhang = inv.filter(
        ((F.col("end") >= chunk_rng.start) & (F.col("start") <= chunk_rng.end))
        & ((F.col("start") < chunk_rng.start) | (F.col("end") > chunk_rng.end))
    )
    if overhang.limit(1).count() > 0:
        return False, "file range crosses chunk boundary"
    for kind in kinds:
        k_inv = in_chunk.filter(F.col("kind") == kind)
        isl = merge_range_rows(k_inv.select("start", "end")).collect()
        if len(isl) != 1 or isl[0]["start"] != chunk_rng.start or isl[0]["end"] != chunk_rng.end:
            return False, f"{kind} does not exactly cover the chunk"
    groups = group_ranges(in_chunk, kinds=kinds)
    dup = None
    for k in kinds:
        c = F.col(f"n_{k}") > 1
        dup = c if dup is None else (dup | c)
    if groups.filter(dup).limit(1).count() > 0:
        return False, "duplicate files in chunk"
    return True, ""


def compact(
    spark: SparkSession,
    root: str,
    blockchain: str,
    rng: Range,
    tables: tuple[DataKind, ...] = (DataKind.BLOCKS, DataKind.TRANSACTIONS),
    chunk: int = 1000,
    dry_run: bool = False,
    block_json_schema=None,
) -> CompactResult:
    base = os.path.join(root, blockchain.lower())
    kinds = tuple(k.value for k in tables)
    result = CompactResult()

    inv_all = inventory_df(spark, root, blockchain)
    for chunk_rng in rng.split_chunks(chunk, aligned=True):
        inv = inv_all.filter(
            (F.col("end") >= chunk_rng.start) & (F.col("start") <= chunk_rng.end)
        )
        # skip chunks already compacted (single range file per kind)
        already = inv.filter(
            (F.col("start") == chunk_rng.start) & (F.col("end") == chunk_rng.end)
        )
        if already.count() == len(kinds):
            result.skipped_chunks.append((chunk_rng.start, chunk_rng.end, "already compacted"))
            continue
        ok, why = _chunk_complete(spark, inv, chunk_rng, kinds)
        if not ok:
            result.skipped_chunks.append((chunk_rng.start, chunk_rng.end, why))
            continue

        sources: list[str] = []
        copied: dict[str, DataFrame] = {}
        for kind in kinds:
            k_rows = inv.filter(F.col("kind") == kind).collect()
            # a kind already held in exactly the target range file is left
            # as-is (never rewritten-and-deleted in place)
            if any(
                r["start"] == chunk_rng.start and r["end"] == chunk_rng.end for r in k_rows
            ):
                continue
            sources.extend(r["path"] for r in k_rows)
            k_paths = [os.path.join(base, r["path"]) for r in k_rows]
            from ..sources.avro_io import read_archive_data

            df = read_archive_data(spark, k_paths, kind).drop("_path")
            # P1: trim any file overlap to the chunk
            df = df.filter(
                (F.col("height") >= chunk_rng.start) & (F.col("height") <= chunk_rng.end)
            )
            copied[kind] = df
            if not dry_run:
                wr = ref_layout.write_range_files(
                    df,
                    root,
                    blockchain,
                    DataKind(kind),
                    chunk=chunk,
                    run="compact",
                    overwrite=True,
                    requested=chunk_rng,
                )
                result.written.extend(r["location"] for r in wr.collect() if not r["skipped"])

        # J6/A7 reconciliation on the rewritten outputs
        if not dry_run:
            out_blocks = copied.get("blocks")
            recon_ok = True
            if out_blocks is not None:
                # A7: copied heights must form exactly one island == chunk
                isl = merge_range_rows(
                    out_blocks.select(F.col("height").alias("start"), F.col("height").alias("end"))
                ).collect()
                recon_ok = (
                    len(isl) == 1
                    and isl[0]["start"] == chunk_rng.start
                    and isl[0]["end"] == chunk_rng.end
                )
            if (
                recon_ok
                and out_blocks is not None
                and block_json_schema is not None
                and "transactions" in copied
            ):
                # J6: txids promised by copied blocks == txids actually copied
                promised = out_blocks.select(
                    F.explode_outer(
                        F.from_json(F.col("json").cast("string"), block_json_schema)[
                            "transactions"
                        ]
                    ).alias("txid")
                ).filter(F.col("txid").isNotNull())
                actual = copied["transactions"].select("txid")
                n_missing = promised.join(actual, "txid", "left_anti").count()
                n_unexpected = actual.join(promised, "txid", "left_anti").count()
                recon_ok = n_missing == 0 and n_unexpected == 0
            if recon_ok:
                res = delete_files(base, sorted(sources), dry_run=dry_run)
                result.deleted.extend(res.deleted)
                result.compacted_chunks.append((chunk_rng.start, chunk_rng.end))
            else:
                # roll back this chunk's outputs (reference: delete-on-drop of
                # uncommitted files) so singles remain the only coverage
                tag = f"range-{chunk_rng.start:09d}_{chunk_rng.end:09d}"
                bad_abs = [p for p in result.written if tag in p]
                delete_files(base, [os.path.relpath(p, base) for p in bad_abs], dry_run=dry_run)
                result.written = [p for p in result.written if tag not in p]
                result.skipped_chunks.append(
                    (chunk_rng.start, chunk_rng.end, "reconciliation failed")
                )
    return result
