"""``fix`` — detect and re-archive missing data (reference
``src/command/fix.rs:39-69``).

Spark shape (SURVEY §3.3.4): the gap work list comes straight from
``find_incomplete_tables`` (closed-form interval SQL over the inventory);
each (kind, missing-range) is re-archived with ``overwrite=False`` so racing
writers keep existing files (S13), narrowed to only the missing kinds
(``only_include``, P6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..core.filenames import DataKind
from ..core.ranges import Range, merge_ranges
from ..operators.inventory import find_incomplete_tables
from ..sources.archive import inventory_df
from ..sources.fetcher import FetchPolicy
from .archive_plan import ArchiveResult, archive


@dataclass
class FixResult:
    missing: list[tuple[str, int, int]]
    archived: list[ArchiveResult]


def fix(
    spark: SparkSession,
    provider,
    root: str,
    rng: Range,
    tables: tuple[DataKind, ...] = (DataKind.BLOCKS, DataKind.TRANSACTIONS, DataKind.TRACES),
    chunk: int = 1000,
    policy: FetchPolicy = FetchPolicy(),
    dry_run: bool = False,
) -> FixResult:
    inv = inventory_df(spark, root, provider.blockchain_id)
    kinds = tuple(k.value for k in tables)
    missing = find_incomplete_tables(inv, rng.start, rng.end, kinds=kinds)
    work = sorted(
        ((r["kind"], r["start"], r["end"]) for r in missing.collect()),
        key=lambda t: (t[1], t[0]),
    )
    results: list[ArchiveResult] = []
    if not dry_run:
        # group contiguous missing ranges per kind, then archive each with
        # only that kind included (P6 only_include narrowing)
        by_kind: dict[str, list[Range]] = {}
        for kind, lo, hi in work:
            by_kind.setdefault(kind, []).append(Range(lo, hi))
        for kind, ranges in by_kind.items():
            for r in merge_ranges(ranges):
                results.append(
                    archive(
                        spark,
                        provider,
                        root,
                        r,
                        tables=(DataKind(kind),),
                        chunk=chunk,
                        policy=policy,
                        overwrite=False,
                        run="fix",
                    )
                )
    return FixResult(missing=work, archived=results)
