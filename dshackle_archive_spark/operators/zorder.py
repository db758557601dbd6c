"""Z-order (Morton) clustering for multi-dimensional scan pruning.

A height-partitioned layout prunes on height alone; queries filtering on
TWO dimensions (user × time, height × kind, source × length) scan every
file that matches either. Interleaving the bits of both keys into one
Morton code and range-partitioning + sorting the write on it gives every
output file a narrow bounding box in BOTH dimensions, so parquet
row-group/file min-max stats prune on either predicate — the standard
layout lever (Delta/Iceberg OPTIMIZE ZORDER) rebuilt as plain Spark
expressions.

Everything is closed-form integer bit math (`shiftright`/`&`/`<<` as
Catalyst expressions, codegen-friendly, no UDF). The write itself is
``repartitionByRange(z).sortWithinPartitions(z)`` — one range shuffle, the
same cost as any clustered rewrite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: result bit
    2i holds a's bit i, bit 2i+1 holds b's. Callers bound the inputs
    (mod/scale) — clustering only needs rank order to survive, exactness
    doesn't matter."""
    a = a.cast("long")
    b = b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z + (abit * F.lit(1 << (2 * i))) + (bbit * F.lit(1 << (2 * i + 1)))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the Morton
    code of (col_a, col_b). Each output file covers a compact rectangle of
    the key space, so min-max stats prune scans filtered on EITHER column.

    Both columns are first NORMALIZED into the same ``bits``-wide rank
    space ((x−min)·(2^bits−1)/(max−min)) — interleaving raw values with
    unequal domains lets the wider column's high bits dominate the code
    and the narrower dimension degenerates to a full-range span per file.
    The bounds fold in as a 1-row broadcast (no driver collect), so the
    rewrite is: bounds agg → normalize → one range shuffle → sorted write.
    """
    b = df.agg(
        F.min(col_a).cast("double").alias("_amin"),
        F.max(col_a).cast("double").alias("_amax"),
        F.min(col_b).cast("double").alias("_bmin"),
        F.max(col_b).cast("double").alias("_bmax"),
    )
    top = float((1 << bits) - 1)

    def norm(c: str, lo: str, hi: str) -> Column:
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1.0))
        return F.floor(
            (F.col(c).cast("double") - F.col(lo)) * top / span
        ).cast("long")

    z = morton_key(
        norm(col_a, "_amin", "_amax"), norm(col_b, "_bmin", "_bmax"), bits=bits
    )
    (
        df.join(F.broadcast(b))
        .withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_amin", "_amax", "_bmin", "_bmax")
        .write.mode("overwrite")
        .parquet(path)
    )
