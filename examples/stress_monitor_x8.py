#!/usr/bin/env python
"""×8-docs-per-batch scale probe for the streaming curation monitors.

The soak and restart-chaos tests prove bounded RESOURCES and exactly-once
across ~hundreds of micro-batches; this probe measures the THROUGHPUT
claim: per-batch monitor cost is store-read + batch-compute +
store-commit, where the store ops are bounded by watermark/sketch size —
so growing the BATCH (the 100 TB operating move: fewer, fatter triggers)
must amortize the fixed per-batch cost and the per-DOC cost must FALL,
not hold. Runs the three monitors (near-dup, count-min heavy hitters,
KMV novelty) concurrently over the same batch COUNT at 1× and 8×
docs-per-batch and prints one JSON line with wall, docs/sec, and the
per-doc ratio (×8 per-doc cost / ×1 per-doc cost; « 1 = amortizing).

Usage: python examples/stress_monitor_x8.py   (local[8], ~3-4 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

N_BATCHES = 20
BASE_DOCS = 40
SCALES = {"x1": BASE_DOCS, "x8": BASE_DOCS * 8}


def write_source(src_dir: str, docs_per_batch: int) -> None:
    from datetime import datetime, timedelta, timezone

    os.makedirs(src_dir, exist_ok=True)
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    boiler = " ".join(f"boiler{i}" for i in range(8))
    for b in range(N_BATCHES):
        ids, texts, evs = [], [], []
        for j in range(docs_per_batch):
            d = b * docs_per_batch + j
            ids.append(d)
            # 1-in-5 recurring boilerplate (near-dup pressure at every
            # scale), the rest unique arithmetic-token text
            texts.append(
                boiler if j % 5 == 0
                else " ".join(f"u{d}_{i} v{d * 7 + i}" for i in range(8))
            )
            evs.append(t0 + timedelta(seconds=10 * b))
        pq.write_table(
            pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "event_time": pa.array(evs, pa.timestamp("us", tz="UTC")),
            }),
            os.path.join(src_dir, f"batch_{b:04d}.parquet"),
        )


def run_monitors(spark, src: str, work: str) -> float:
    from dshackle_archive_spark.streaming.doc_stream import (
        start_streaming_heavy_hitters,
        start_streaming_neardup_dedup,
        start_streaming_novelty_monitor,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string, event_time timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dirs = {n: os.path.join(work, n) for n in ("neardup", "hh", "novelty")}
    t0 = time.perf_counter()
    queries = [
        start_streaming_neardup_dedup(
            stream, os.path.join(dirs["neardup"], "state"),
            os.path.join(dirs["neardup"], "out"),
            os.path.join(dirs["neardup"], "ckpt"),
            watermark_delay_sec=600, available_now=True,
        ),
        start_streaming_heavy_hitters(
            stream, os.path.join(dirs["hh"], "state"),
            os.path.join(dirs["hh"], "out"),
            os.path.join(dirs["hh"], "ckpt"), available_now=True,
        ),
        start_streaming_novelty_monitor(
            stream, os.path.join(dirs["novelty"], "state"),
            os.path.join(dirs["novelty"], "out"),
            os.path.join(dirs["novelty"], "ckpt"), available_now=True,
        ),
    ]
    for q in queries:
        assert q.awaitTermination(900), "monitor did not drain"
    return time.perf_counter() - t0


def main() -> None:
    from dshackle_archive_spark.session import get_spark

    spark = get_spark("monitor-x8", master="local[8]")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    root = "/tmp/monitor_x8_probe"
    shutil.rmtree(root, ignore_errors=True)
    out = {}
    for label, dpb in SCALES.items():
        src = os.path.join(root, label, "src")
        write_source(src, dpb)
        wall = run_monitors(spark, src, os.path.join(root, label, "work"))
        docs = N_BATCHES * dpb
        out[label] = {
            "docs": docs, "wall_s": round(wall, 2),
            "docs_per_s": round(docs / wall, 1),
            "ms_per_doc": round(1000 * wall / docs, 3),
        }
    out["per_doc_ratio_x8_over_x1"] = round(
        out["x8"]["ms_per_doc"] / out["x1"]["ms_per_doc"], 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
