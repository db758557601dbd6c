#!/usr/bin/env python
"""Scale probe for duplicated-span extents (x34 / Lee et al. 2022).

200k synthetic docs (~10M tokens), adversarially duplicate-heavy:

- every 10th doc carries one shared 30-token passage mid-document
  (20k-doc key skew on the passage's 23 rolling shingles);
- every 100th doc is a VERBATIM copy of its neighbor (full-coverage spans);
- everything else is unique arithmetic-token text (no disk inputs).

Claims under test:
1. wall time is set by the ONE shingle-hash groupBy (corpus-token-scale,
   map-side partial agg) — not by pairwise comparison; doubling the corpus
   should roughly double the time, never square it;
2. the 20k-document shared passage (worst-case shingle-key skew: 23 keys
   x 20k rows each) survives countDistinct without a hot reducer because
   partial aggregation collapses each key map-side;
3. planted spans come back with EXACT extents: passage docs report one
   30-token span; copy pairs report full-text coverage (ratio 1.0).

Run: ``python examples/stress_span_dedup.py`` (env: SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.operators.dedup import duplicated_span_extents
from dshackle_archive_spark.session import get_spark


def build_corpus(spark, n_docs: int):
    passage = " ".join(f"boiler{i}" for i in range(30))
    body_front = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}_"), ((F.col("id") * 131 + j * 17) % 999983))
            for j in range(24)
        ],
    )
    body_back = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"u{j}_"), ((F.col("id") * 271 + j * 29) % 999979))
            for j in range(24)
        ],
    )
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 2,
            F.concat_ws(" ", body_front, F.lit(passage), body_back),
        )
        .otherwise(F.concat_ws(" ", body_front, body_back))
        .alias("text"),
        # verbatim copies: doc 100k+1 duplicates doc 100k's text exactly
        (F.col("id") - (F.col("id") % 100)).alias("_src"),
    )
    copies = base.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 1).alias("doc_id"), "text"
    )
    return (
        base.filter(F.col("doc_id") % 100 != 1)
        .select("doc_id", "text")
        .unionByName(copies)
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("stress-span-dedup", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float | int] = {}

    for n_docs in (100_000, 200_000):
        corpus = build_corpus(spark, n_docs)
        t0 = time.perf_counter()
        stats = duplicated_span_extents(corpus, k=8, min_docs=2)
        rows = stats.collect()
        out[f"seconds_{n_docs}"] = round(time.perf_counter() - t0, 2)
        by_id = {r["doc_id"]: r for r in rows}

        # claim 3a: passage docs -> exactly one 30-token span
        passage_docs = [
            r for i, r in by_id.items() if i % 10 == 2 and i % 100 != 1
        ]
        assert passage_docs, "no passage docs detected"
        bad = [
            r
            for r in passage_docs
            if not (r["n_dup_spans"] == 1 and r["max_span_tokens"] == 30)
        ]
        assert not bad, f"wrong passage extents: {bad[:3]}"

        # claim 3b: verbatim copies -> full coverage (ratio 1.0) both ways
        copy_ids = [i for i in by_id if i % 100 == 1]
        assert copy_ids, "no copy docs detected"
        for i in copy_ids:
            for side in (i, i - 1):
                r = by_id.get(side)
                assert r is not None and r["dup_ratio"] == 1.0, (side, r)

        # claim 1/2 bookkeeping
        out[f"docs_with_spans_{n_docs}"] = len(rows)
        out[f"passage_docs_{n_docs}"] = len(passage_docs)
        out[f"copy_docs_{n_docs}"] = len(copy_ids)

    out["scale_ratio_2x_docs"] = round(
        out["seconds_200000"] / out["seconds_100000"], 2
    )
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
