"""Import an existing reference archive into the native analytic layout.

The migration path for a dshackle-archive user switching to this engine:
their Avro trees (or flat directories of ``.avro`` files) are read through
the container codec and rewritten as l1/l2-partitioned Parquet tables —
after which every query in the registry, the SQL views, and the native
verify run directly against it.

Distributed end-to-end: listing is metadata, decode is one task per source
file, the write is Spark's partitioned commit. Incremental: re-running skips
height partitions already present when ``append=False`` guards are handled
by the caller (imports are typically one-shot per range).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..core.filenames import parse_filename
from ..core.ranges import Range
from ..schemas import TABLE_SCHEMAS
from .archive import list_archive_files, write_table
from .avro_io import _RECORD_NAMES, read_avro_df


@dataclass
class ImportResult:
    rows: dict[str, int] = field(default_factory=dict)
    files: dict[str, int] = field(default_factory=dict)


def import_reference_archive(
    spark: SparkSession,
    src_root: str,
    dest_root: str,
    blockchain: str,
    tables: tuple[str, ...] = ("blocks", "transactions", "traces"),
    rng: Range | None = None,
) -> ImportResult:
    """Read a reference-layout (or flat) Avro archive and write the native
    partitioned tables. Foreign files are skipped by the name codec; ``rng``
    bounds the import to intersecting files."""
    result = ImportResult()
    listing = []
    for rel in list_archive_files(src_root):
        fi = parse_filename(rel)
        if fi is None or not rel.endswith(".avro"):
            continue
        if rng is not None and not fi.range.intersects(rng):
            continue
        listing.append((rel, fi))
    for kind in tables:
        paths = [f"{src_root}/{rel}" for rel, fi in listing if fi.kind.value == kind]
        if not paths:
            continue
        df = read_avro_df(
            spark,
            paths,
            TABLE_SCHEMAS[kind],
            expected_record=_RECORD_NAMES[kind],
        )
        if rng is not None:
            df = df.filter((F.col("height") >= rng.start) & (F.col("height") <= rng.end))
        write_table(df, dest_root, blockchain, kind)
        result.files[kind] = len(paths)
        result.rows[kind] = (
            spark.read.parquet(f"{dest_root}/{blockchain.lower()}/{kind}").count()
        )
    return result
