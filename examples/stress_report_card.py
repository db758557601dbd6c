#!/usr/bin/env python
"""Scale probe for the corpus report card (the `report` CLI command).

Synthetic corpora of 100k and 200k documents (~30 tokens each, generated
in-plan): 10% exact duplicates, 5% carrying a shared boilerplate passage,
1% code-shaped, spread over 20 sources with one mirror feed.

Claims under test:
1. report wall time scales ~linearly with the corpus (every section is
   one or two corpus passes with metadata-sized collects — nothing
   accumulates quadratically across sections);
2. the numbers stay exact at scale: planted dup share, mirror pair, and
   code share come back exactly; novelty reflects the planted duplicate
   mass.

Run: ``python examples/stress_report_card.py`` (env: SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.plans.report_plan import corpus_report
from dshackle_archive_spark.session import get_spark


def build_corpus(spark, n: int):
    body = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"t{j}_"), ((F.col("id") * 997 + j * 31)))
            for j in range(30)
        ],
    )
    plate = " ".join(f"plate{i}" for i in range(14))
    code = "def f(x):\n    y = (x * 3);\n    return y + 1"
    text = (
        F.when(F.col("id") % 100 == 99, F.lit(code))  # 1% code-shaped
        .when(
            F.col("id") % 20 == 5,  # 5% carry the boilerplate passage
            F.concat(F.lit(plate + " "), body),
        )
        .otherwise(body)
    )
    # every 10th doc duplicates its predecessor's BODY (re-derived
    # deterministically — no self-join); predecessors that are themselves
    # code docs (id ≡ 99 mod 100) break their pair, so the planted dup-doc
    # share is 2·(10% − 1%) = 18%, plus the 1% identical code docs = 19%
    prev_body = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"t{j}_"), (((F.col("id") - 1) * 997 + j * 31))
            )
            for j in range(30)
        ],
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 20)).alias("source"),
        F.lit("xx").alias("lang"),
        F.when(F.col("id") % 10 == 0, prev_body).otherwise(text).alias("text"),
    ).withColumn("n_chars", F.length("text"))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-report", master=f"local[{cpus}]")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(cpus) * 2))

    # warm the JIT/shuffle paths so the 100k point isn't charged for startup
    corpus_report(build_corpus(spark, 10_000), boilerplate_min_df=100)

    out = {}
    sizes = (100_000, 200_000, 500_000, 1_000_000)
    for n in sizes:
        docs = build_corpus(spark, n).localCheckpoint(eager=True)
        secs: dict = {}
        t0 = time.time()
        rep = corpus_report(docs, boilerplate_min_df=100, timings=secs)
        dt = time.time() - t0
        assert abs(rep["exact_dup_rate"] - 0.19) < 0.005, rep["exact_dup_rate"]
        assert abs(rep["code_frac"] - 0.01) < 0.002, rep["code_frac"]
        assert 0 < rep["ngram_novelty"] < 1
        assert rep["bursty_terms"], "bursty section empty"
        out[n] = {"report_s": round(dt, 2),
                  "novelty": rep["ngram_novelty"],
                  "dup_rate": rep["exact_dup_rate"],
                  "sections": secs}
        print(f"  n={n}: {out[n]}")
        docs.unpersist()
    ratios = {
        f"x{sizes[i] // sizes[i - 1]}@{sizes[i]}": round(
            out[sizes[i]]["report_s"] / out[sizes[i - 1]]["report_s"], 2
        )
        for i in range(1, len(sizes))
    }
    print(json.dumps({"probe": "report_card", "ratios": ratios,
                      **{str(k): v for k, v in out.items()}}))


if __name__ == "__main__":
    main()
