#!/usr/bin/env python
"""×8-beyond-sf0.1 scale probe for the HEAVIEST NON-GRAPH registry queries
(round-9 task: the graph family had ×8 evidence from stress_graph_x8.py;
every other family's scale story stopped at sf0.1 = ×10 of sf0.01).

Method (same as stress_graph_x8.py): union 8 DISJOINT key-shifted copies
of each sf0.1 base table a probe query reads — documents, embeddings,
events, lineitem, orders — so corpora grow ×8 in rows/entities while
per-entity structure stays fixed (the "corpus adds documents" growth
model, not densification). Queries whose cost is metadata-bounded (w-family
windows over daily rollups, sketch grids) should stay FLAT; corpus-scan
queries should grow ≤ linear.

Writes scaled tables once to /tmp (duckdb), points the DEPLOYED registry
functions at the dir, and prints one JSON line with per-query
sf0.1 / ×8 medians and ratios.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from dshackle_archive_spark import queries as Q
from dshackle_archive_spark.core.checkpoint import release_all_pinned
from dshackle_archive_spark.session import get_spark

# 20 heaviest non-graph queries from BENCH_DETAIL (sf0.1 medians), plus the
# w-family representatives whose claim is "flat at any corpus size" and the
# new d18 sampled-triangle audit
NAMES = [
    "d10_semantic_dedup",
    "d15_lsh_band_tuning",
    "x47_ndcg_audit",
    "v15_recall_curve",
    "v2_ann_lsh_topk",
    "x34_duplicated_span_extents",
    "v10_ivf_pq_topk",
    "x48_winnowing_fingerprints",
    "d4_embedding_neardup",
    "a21_key_skew_audit",
    "v14_cluster_quality",
    "a17_countmin_heavy_hitters",
    "v8_pq_topk",
    "x42_ngram_novelty",
    "x36_kneser_ney_scores",
    "x29_hybrid_rrf_retrieval",
    "d9_minhash_error_audit",
    "a18_hll_distinct_sketch",
    "x30_lsh_recall_audit",
    "p11_json_schema_profile",
    # w-family: windows over the daily rollup — must stay ~flat
    "w6_cumulative_distinct_hll",
    "w9_rolling_quantile",
    "w16_changepoint",
    "j10_interval_overlap_join",
    # sampled triangles: the approximate dial's own scale evidence
    "d18_triangle_sample_audit",
]
COPIES = 8
REPS = int(os.environ.get("BENCH_REPS", "3"))
BASE = "/root/testdata/sf0.1"

# per-table disjoint key shifts (copy i adds i*shift to each key column);
# non-key columns ride along unchanged so per-entity structure is identical
SHIFTS: dict[str, dict[str, int]] = {
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
    "events": {"event_id": 1_000_000_000, "user_id": 10_000_000},
    "lineitem": {"l_orderkey": 200_000_000, "l_partkey": 20_000_000},
    "orders": {"o_orderkey": 200_000_000, "o_custkey": 20_000_000},
}


def build_scaled(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    con = duckdb.connect()
    for table, shifts in SHIFTS.items():
        src = f"{BASE}/{table}.parquet"
        cols = duckdb.sql(f"SELECT * FROM read_parquet('{src}') LIMIT 0").columns
        sel = " UNION ALL ".join(
            "SELECT "
            + ", ".join(
                # pre-multiplied literal: DuckDB evaluates `3 * 1000000000`
                # as INT32×INT32 and overflows before widening
                f"{c} + {i * shifts[c]} AS {c}" if c in shifts else c
                for c in cols
            )
            + f" FROM read_parquet('{src}')"
            for i in range(COPIES)
        )
        con.execute(
            f"COPY ({sel}) TO '{dirpath}/{table}.parquet' (FORMAT PARQUET)"
        )
    con.close()


def timed(spark, name: str, sf_dir: str, reps: int) -> float:
    def one() -> float:
        t0 = time.perf_counter()
        Q.registry()[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        release_all_pinned(spark)  # inter-rep hygiene (core/checkpoint.py)
        return dt

    return statistics.median(one() for _ in range(reps))


def main() -> None:
    scaled = "/tmp/sf0.1x8_nongraph"
    build_scaled(scaled)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-scale-x8", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * int(cpus)))
    out: dict = {}
    for name in NAMES:
        timed(spark, name, "/root/testdata/sf0.01", 1)  # codegen warmup
        t1 = timed(spark, name, BASE, REPS)
        t8 = timed(spark, name, scaled, REPS)
        out[name] = {
            "sf0.1_sec": round(t1, 3),
            "x8_sec": round(t8, 3),
            "ratio_x8_data": round(t8 / t1, 2),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({
        "probe": "nongraph_x8",
        "copies": COPIES,
        "reps": REPS,
        "results": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
