#!/usr/bin/env python
"""×8-beyond-sf0.1 scale probe for the corpus-linear text battery.

Same method as the graph probe: 8 id-shifted copies of the sf0.1
documents (~40k docs) — each copy keeps its text, so per-doc operators
and token-keyed aggregations grow ×8 in rows while the vocabulary stays
fixed (the regime a growing crawl actually produces for these
statistics). Queries chosen to be corpus-LINEAR by design — per-doc
scores (x49, x5), token-keyed count tables (x11 tf-idf, x35 CCNet
perplexity terciles): the claim is ratio ≈ ×8 or below, i.e. nothing
hidden is quadratic. (Cross-document JOIN operators — d2 LSH, x48
shared-fingerprint counts — are deliberately excluded: on a copy-scaled
corpus every document has 8 twins, so their pair outputs grow ×64 BY
SEMANTICS; the dedup pair path's scale record is the planted-pair d2/d9
audits and the ×10 sweeps, not a copy probe.)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from dshackle_archive_spark import queries as Q
from dshackle_archive_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
COPIES = 8
REPS = int(os.environ.get("BENCH_REPS", "3"))
NAMES = [
    "x49_lexical_diversity",
    "x5_bpe_token_count",
    "x11_tfidf_top_terms",
    "x35_perplexity_terciles",
]


def build_scaled(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    con = duckdb.connect()
    sel = " UNION ALL ".join(
        f"SELECT doc_id + {i} * 10000000 AS doc_id, text, lang, source, n_chars"
        f" FROM read_parquet('{BASE}/documents.parquet')"
        for i in range(COPIES)
    )
    con.execute(f"COPY ({sel}) TO '{dirpath}/documents.parquet' (FORMAT PARQUET)")
    con.close()


def timed(spark, name: str, sf_dir: str, reps: int = REPS) -> float:
    def one() -> float:
        t0 = time.perf_counter()
        Q.registry()[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    return statistics.median(one() for _ in range(reps))


def main() -> None:
    scaled = "/tmp/sf0.1x8_docs"
    build_scaled(scaled)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-text-x8", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * int(cpus)))
    out: dict = {}
    for name in NAMES:
        timed(spark, name, "/root/testdata/sf0.01", 1)  # warmup
        t1 = timed(spark, name, BASE)
        t8 = timed(spark, name, scaled)
        out[name] = {
            "sf0.1_sec": round(t1, 3),
            "x8_sec": round(t8, 3),
            "ratio_x8_data": round(t8 / t1, 2),
        }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
