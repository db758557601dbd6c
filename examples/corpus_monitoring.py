#!/usr/bin/env python
"""End-to-end corpus monitoring walkthrough: the operational loop around a
training-data corpus, on the synthetic documents/events tables.

1. land a JSONL drop (the interchange format) with corrupt-line quarantine;
2. run the report card (dup rate, novelty, code share, cross-source dup,
   bursty terms) — the artifact a data team reviews before training;
3. follow the ingest live: streaming novelty monitor (KMV synopsis) over
   two micro-batches — fresh content vs a re-served slice;
4. trend a metric: decayed mean + trailing-quantile baselines over the
   events table's daily series.

Run: ``python examples/corpus_monitoring.py`` (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.operators.timeseries import decayed_mean
from dshackle_archive_spark.plans.report_plan import corpus_report
from dshackle_archive_spark.session import get_spark
from dshackle_archive_spark.sources.jsonl import read_jsonl, write_jsonl
from dshackle_archive_spark.sources.tables import load_table
from dshackle_archive_spark.streaming.doc_stream import (
    start_streaming_novelty_monitor,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("corpus-monitoring", master=f"local[{cpus}]")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(cpus)))
    work = tempfile.mkdtemp(prefix="corpus_mon_")

    # 1. JSONL landing with quarantine
    docs = load_table(spark, SF_DIR, "documents")
    drop = os.path.join(work, "drop")
    write_jsonl(docs, drop, shards=2)
    clean, quarantine = read_jsonl(spark, drop)
    print(f"[jsonl] landed {clean.count()} docs, "
          f"{quarantine.count()} quarantined lines")

    # 2. the report card
    rep = corpus_report(clean)
    print("[report]", json.dumps({
        k: rep[k] for k in (
            "n_docs", "exact_dup_rate", "ngram_novelty", "code_frac",
            "quality_pass_rate")
    }))
    print("[report] bursty:", [b["token"] for b in rep["bursty_terms"][:5]])

    # 3. streaming novelty: batch 1 fresh, batch 2 re-serves half of it
    stream_in = os.path.join(work, "stream_in")
    os.makedirs(stream_in)
    state, mon_out = os.path.join(work, "nov_state"), os.path.join(work, "nov_out")
    ckpt = os.path.join(work, "nov_ckpt")
    half = docs.filter("doc_id % 2 = 0").select("text")
    docs.select("text").coalesce(1).write.mode("overwrite").json(
        os.path.join(stream_in, "b1")
    )
    src = spark.readStream.schema("text string").json(stream_in + "/*")
    q = start_streaming_novelty_monitor(
        src, state, mon_out, ckpt, k=512, alert_below=0.2, available_now=True
    )
    q.awaitTermination(120)
    half.coalesce(1).write.mode("overwrite").json(os.path.join(stream_in, "b2"))
    q = start_streaming_novelty_monitor(
        src, state, mon_out, ckpt, k=512, alert_below=0.2, available_now=True
    )
    q.awaitTermination(120)
    for r in sorted(spark.read.parquet(mon_out).collect(),
                    key=lambda r: r["batch_id"]):
        print(f"[novelty] batch {r['batch_id']}: rate={r['novelty_rate']} "
              f"alert={r['alert']}")

    # 4. decayed-mean trend over the daily event series
    ev = load_table(spark, SF_DIR, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"))
    trend = decayed_mean(daily, "event_type", "d", "v", half_life_days=7.0)
    last = (
        trend.orderBy(F.desc("d")).limit(3)
        .select("event_type", F.col("d").cast("string").alias("day"), "decayed_mean")
        .collect()
    )
    print("[trend] latest decayed means:", [tuple(r) for r in last])

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print("done")


if __name__ == "__main__":
    main()
