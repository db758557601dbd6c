"""Z-order clustering: correctness of the Morton key and the layout's
pruning property, checked against real parquet footer statistics."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dshackle_archive_spark.operators.zorder import morton_key, zorder_write


def _interleave(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_key_matches_model(spark):
    rows = [(a, b) for a in (0, 1, 5, 100, 255) for b in (0, 3, 64, 255)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", morton_key(F.col("a"), F.col("b"), bits=8)
    )
    for r in df.collect():
        assert r["z"] == _interleave(r["a"], r["b"], 8), (r["a"], r["b"])


def _file_spans(path: str, col: str) -> list[tuple[int, int]]:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    return spans


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path, sf_dir):
    """After a z-ordered rewrite of events on (user_id, value-bucket), the
    per-file min-max footprint of EACH dimension must be a fraction of its
    domain — that narrowness is exactly what parquet min-max pruning needs.
    A single-column sort would leave the second dimension full-range in
    every file."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("vbucket", F.floor(F.col("value")).cast("long"))
        .withColumn("user_id", F.col("user_id").cast("long"))
    )
    zpath = str(tmp_path / "events_z")
    zorder_write(ev, zpath, "user_id", "vbucket", n_files=16, bits=12)

    # sanity: content survives the rewrite
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()

    u_spans = _file_spans(zpath, "user_id")
    v_spans = _file_spans(zpath, "vbucket")
    dom = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("u"),
        (F.max("vbucket") - F.min("vbucket")).alias("v"),
    ).collect()[0]
    u_domain, v_domain = dom["u"], dom["v"]
    # average per-file width must be well under the full domain in BOTH dims
    u_avg = sum(hi - lo for lo, hi in u_spans) / len(u_spans)
    v_avg = sum(hi - lo for lo, hi in v_spans) / len(v_spans)
    assert u_avg < 0.6 * u_domain, f"user span too wide: {u_spans}"
    assert v_avg < 0.6 * v_domain, f"value span too wide: {v_spans}"

    # and a 2-D box predicate must skip most files entirely via file stats
    hit = [
        1
        for (ulo, uhi), (vlo, vhi) in zip(u_spans, v_spans)
        if not (uhi < 10 or ulo > 40) and not (vhi < 10 or vlo > 40)
    ]
    assert len(hit) < len(u_spans) // 2, (u_spans, v_spans)
