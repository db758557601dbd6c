#!/usr/bin/env python
"""Training-data curation tour: quality filter → dedup → decontamination →
split, on the synthetic documents corpus.

Run:  python examples/curate.py   (finishes in ~1 minute on local[8])
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dshackle_archive_spark as das
from dshackle_archive_spark.plans.curate_plan import curate
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = das.get_spark("curate-example", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
# pretend every 29th doc is a benchmark/eval document we must not train on
bench = docs.filter(F.col("doc_id") % 29 == 0)
corpus = docs.filter(F.col("doc_id") % 29 != 0)

with tempfile.TemporaryDirectory() as out:
    curated, res = curate(
        corpus,
        benchmark=bench,
        output_path=os.path.join(out, "curated"),
        # the synthetic corpus is random words — relax the stopword rule
        min_stopword_ratio=0.0,
    )
    print("stage attrition:")
    for stage, n in res.stage_counts.items():
        print(f"  {stage:16s} {n}")
    print("\nper-split counts:")
    curated.groupBy("split").count().orderBy("split").show()
    print("output:", res.output_path)

    # --- incremental: admit a second batch without reprocessing the corpus
    from dshackle_archive_spark.plans.curate_plan import curate_incremental

    batch = docs.filter(F.col("doc_id") % 29 != 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).limit(200)  # re-sent content: the _index catches every copy
    _, inc = curate_incremental(
        batch, os.path.join(out, "curated"), min_stopword_ratio=0.0
    )
    print("\nincremental attrition (all re-sent content rejected):")
    for stage, n in inc.stage_counts.items():
        print(f"  {stage:16s} {n}")
