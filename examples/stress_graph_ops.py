#!/usr/bin/env python
"""Graph-operator stress probe: triangle counting and PageRank at the
edge counts a 100 TB near-dup/link graph actually produces, measured.

Scale claims under test (PERF.md records the numbers this prints):

- ``dedup.triangle_counts`` is the degree-oriented MR node-iterator++
  (Suri & Vassilvitskii WWW'11). The claim: a power-law hub of degree d
  emits O(d) oriented out-edges, NOT O(d²) wedges, so a skewed graph
  with a 10⁴-degree hub finishes in seconds where the naive
  pivot-on-every-vertex plan would materialize ~10⁸ wedges from that hub
  alone. The probe builds a synthetic power-law-ish graph (ring +
  hash-assigned hub attachments, pure ``spark.range`` arithmetic — no
  disk) with planted triangles and verifies exact triangle counts at the
  apex (and globally) plus wall time.
- ``dedup.pagerank`` does one equi-join shuffle + one grouped sum per
  iteration on id-only rows; per-iteration cost must stay flat across
  iterations (lineage is cut by the one-time localCheckpoint of edges).

Run: ``python examples/stress_graph_ops.py`` (env: SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.operators.dedup import pagerank, triangle_counts
from dshackle_archive_spark.session import get_spark


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-graph", master=f"local[{cpus}]")
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * int(cpus)))
    out: dict[str, float | int] = {}

    # ---- synthetic skewed graph: 1M ring edges (triangle-free backbone)
    # + 100k hub-attachment edges onto 10 hubs (degree ~10⁴ each)
    # + one apex node connected to EVERY node 0..99,999: each of the
    #   99,999 ring edges among those nodes closes a triangle with the
    #   apex, so the apex (degree 10⁵ — worst-case corner skew) must
    #   count exactly 99,999. Orientation makes all apex edges point INTO
    #   the apex: it pivots zero wedges, where a naive pivot-on-every-
    #   vertex plan would materialize C(10⁵, 2) ≈ 5·10⁹ wedges there.
    n = 1_000_000
    ring = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    hubs = spark.range(100_000).select(
        (F.col("id") * 7 % n).alias("src"),
        (n + F.col("id") % 10).alias("dst"),  # 10 hub nodes above the ring
    )
    apex = n + 100
    fan = (
        spark.range(50_000)
        .select((F.col("id") * 2).alias("i"))
        .selectExpr("i AS src", f"{apex} AS dst", "i + 1 AS tri_dst")
    )
    fan_edges = fan.selectExpr("src", "dst").unionByName(
        fan.selectExpr("tri_dst AS src", f"{apex} AS dst")
    )
    edges = ring.unionByName(hubs).unionByName(fan_edges)

    t0 = time.time()
    tc = triangle_counts(edges).localCheckpoint(eager=True)
    out["triangle_wall_s"] = round(time.time() - t0, 2)
    out["triangle_nodes"] = tc.count()
    apex_row = tc.filter(F.col("node") == apex).collect()
    out["apex_triangles"] = int(apex_row[0]["triangles"]) if apex_row else 0
    # every ring edge (i, i+1) for i in 0..99,998 has apex edges at both
    # ends and closes exactly one triangle with the apex
    assert out["apex_triangles"] == 99_999, out
    out["total_triangles"] = int(
        tc.agg((F.sum("triangles") / 3).cast("long")).first()[0]
    )

    # ---- pagerank per-iteration flatness on the same skewed graph
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    t0 = time.time()
    pr3 = pagerank(sym, iters=3)
    out["pagerank3_rows"] = pr3.count()
    out["pagerank3_wall_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    pr6 = pagerank(sym, iters=6)
    pr6.count()
    out["pagerank6_wall_s"] = round(time.time() - t0, 2)
    # 6 iterations should cost < 3x the 3-iteration run (flat per-iter cost;
    # generous bound tolerates constant setup)
    assert out["pagerank6_wall_s"] < 3 * out["pagerank3_wall_s"] + 10, out

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
