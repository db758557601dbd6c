#!/usr/bin/env python
"""Subprocess driver for the restart-chaos soak (round-11 task).

Starts the three state-carrying monitors — near-dup dedup, count-min heavy
hitters, KMV novelty — CONCURRENTLY with ``availableNow=True`` over a file
source (``maxFilesPerTrigger=1`` ⇒ one micro-batch per file). The parent
test hard-kills this process (SIGKILL, no cleanup) once the parameterized
monitor's streaming commit log reaches the kill batch — so the dying batch
is interrupted between whatever writes it had in flight — then launches
this script AGAIN with the same work dir: Structured Streaming resumes
every query from its checkpoint and drains the remaining input. The parent
asserts exactly-once end state: outputs and final snapshot stores must be
IDENTICAL to an undisturbed clean run (no double-merged count-min grid, no
re-admitted or doubled near-dup survivors, no repeated novelty rows).

Usage: monitor_chaos_probe.py SRC_DIR WORK_DIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def monitor_dirs(work: str) -> dict[str, dict[str, str]]:
    return {
        name: {
            "state": os.path.join(work, name, "state"),
            "out": os.path.join(work, name, "out"),
            "ckpt": os.path.join(work, name, "ckpt"),
        }
        for name in ("neardup", "hh", "novelty")
    }


def start_monitors(spark, src: str, work: str) -> list:
    from dshackle_archive_spark.streaming.doc_stream import (
        start_streaming_heavy_hitters,
        start_streaming_neardup_dedup,
        start_streaming_novelty_monitor,
    )

    dirs = monitor_dirs(work)
    stream = (
        spark.readStream.schema("doc_id long, text string, event_time timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return [
        start_streaming_neardup_dedup(
            stream, dirs["neardup"]["state"], dirs["neardup"]["out"],
            dirs["neardup"]["ckpt"], watermark_delay_sec=600,
            available_now=True,
        ),
        start_streaming_heavy_hitters(
            stream, dirs["hh"]["state"], dirs["hh"]["out"],
            dirs["hh"]["ckpt"], available_now=True,
        ),
        start_streaming_novelty_monitor(
            stream, dirs["novelty"]["state"], dirs["novelty"]["out"],
            dirs["novelty"]["ckpt"], available_now=True,
        ),
    ]


def main() -> int:
    src, work = sys.argv[1], sys.argv[2]
    from dshackle_archive_spark.session import get_spark

    spark = get_spark("monitor-chaos", master="local[4]")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    queries = start_monitors(spark, src, work)
    for q in queries:
        if not q.awaitTermination(600):
            print("TIMEOUT", flush=True)
            return 2
    print("DRAINED", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
