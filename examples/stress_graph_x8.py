#!/usr/bin/env python
"""×8-beyond-sf0.1 scale probe for the co-purchase-graph queries.

The standard round probes stop at sf0.1 (×10 data). This one pushes the
three `_copurchase_edges` consumers (d12 triangles, d16 assortativity,
d17 Adamic-Adar) another ×8 by unioning 8 DISJOINT key-shifted copies of
the sf0.1 lineitem — same per-order structure, so the graph keeps its
density while nodes AND edges grow ×8 (~10M edges): the growth model of
a corpus that adds documents rather than densifying. Linear-or-better
scaling here is the 100 TB claim for the graph path.

Writes the scaled table once to /tmp (duckdb), points the DEPLOYED
registry functions at it, and prints one JSON line.
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
from dshackle_archive_spark.core.checkpoint import release_all_pinned
from dshackle_archive_spark.session import get_spark

NAMES = [
    "d12_triangle_count",
    "d16_degree_assortativity",
    "d17_adamic_adar",
    # round-11: the k-core driver-finish hybrid's recorded ×8 evidence
    # (sf0.1 3.62 s / ×8 12.95 s) is reproducible here
    "d19_kcore_prune",
]
COPIES = 8
REPS = int(os.environ.get("BENCH_REPS", "3"))
BASE = "/root/testdata/sf0.1"


def build_scaled(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    con = duckdb.connect()
    sel = " UNION ALL ".join(
        f"SELECT l_orderkey + {i} * 200000000 AS l_orderkey,"
        f" l_partkey + {i} * 20000000 AS l_partkey,"
        " l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,"
        " l_tax, l_returnflag, l_linestatus, l_shipdate"
        f" FROM read_parquet('{BASE}/lineitem.parquet')"
        for i in range(COPIES)
    )
    con.execute(
        f"COPY ({sel}) TO '{dirpath}/lineitem.parquet' (FORMAT PARQUET)"
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
    scaled = "/tmp/sf0.1x8_graph"
    build_scaled(scaled)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-graph-x8", master=f"local[{cpus}]")
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
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
