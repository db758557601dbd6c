#!/usr/bin/env python
"""Scale probes for the round-5 curation wave: repeated-passage removal
under extreme key skew, and SemDeDup's cell-bounded pairwise cost.

1. **Passage-removal skew**: 120k synthetic docs, HALF sharing one 24-token
   boilerplate prefix — the worst-case join-key skew for the strip stage
   (two segment keys carry 60k rows each). The scale claim being tested:
   the repeated-segment side of the join is only as large as the number of
   DISTINCT repeated segments (2 here), so AQE broadcasts it and the hot
   keys never land on one reducer.

2. **SemDeDup cell cost**: 105k synthetic 64-dim vectors, 256 cells →
   Σ|cell|² ≈ 21M pairwise cosines. The knob under test: pair cost is set
   by cell count (corpus²/cells), NOT corpus size — the documented SemDeDup
   contract. Planted +0.25-perturbed copies must be found.

Run: ``python examples/stress_curation_wave2.py`` (env: SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.operators.dedup import repeated_segment_removal
from dshackle_archive_spark.operators.similarity import semantic_dedup
from dshackle_archive_spark.session import get_spark


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("stress-curation-wave2", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}

    # --- probe 1: passage removal under 50%-corpus boilerplate skew ------
    n_docs = 120_000
    plate = " ".join(f"plate{i}" for i in range(24))
    # 48 unique-ish tokens per doc (arithmetic token ids — no disk)
    body = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}_"), ((F.col("id") * 31 + j * 7) % 99991))
            for j in range(48)
        ],
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.concat(F.lit(plate + " "), body))
        .otherwise(body)
        .alias("text"),
    ).localCheckpoint()

    t0 = time.perf_counter()
    res = repeated_segment_removal(docs, seg_len=12, min_df=5)
    agg = res.agg(
        F.sum(F.when(F.col("n_removed") == 2, 1).otherwise(0)).alias("two"),
        F.sum(F.when(F.col("n_removed") == 0, 1).otherwise(0)).alias("zero"),
        F.count("*").alias("n"),
    ).collect()[0]
    out["passage_skew_s"] = round(time.perf_counter() - t0, 2)
    assert agg["n"] == n_docs, agg
    assert agg["two"] == n_docs // 2, agg  # every planted doc loses its 2 segments
    assert agg["zero"] == n_docs // 2, agg

    # --- probe 2: SemDeDup pair cost bounded by cell sizing --------------
    n_vecs = 105_000
    vec = F.array(
        *[
            (((F.col("id") * 31 + i * 7) % 1000) / 1000.0 - 0.5).cast("double")
            for i in range(64)
        ]
    )
    base = spark.range(n_vecs).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    planted = base.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x + 0.25).otherwise(x),
        ).alias("embedding"),
    )
    corpus = base.unionByName(planted).localCheckpoint()

    t0 = time.perf_counter()
    dup = semantic_dedup(corpus, n_cells=256, threshold=0.9, dim=64)
    found = dup.filter(F.col("vec_id") >= 1_000_000).count()
    out["semdedup_105k_s"] = round(time.perf_counter() - t0, 2)
    out["semdedup_planted_found"] = found
    out["semdedup_planted_total"] = n_vecs // 50

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
