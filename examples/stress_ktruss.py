#!/usr/bin/env python
"""Scale probe for the k-truss peel (round-10 operator d22).

Planted-community graph (no disk inputs): C communities, each a 12-node
clique (every internal edge closes 10 triangles), plus one bridge edge per
community to its neighbor (support ~0) and deterministic random noise
edges between arbitrary nodes (support ~0). The 6-truss (support >= 4)
must keep EXACTLY the clique edges — bridges and noise peel away — and
every surviving edge must report support >= 10.

Claims under test at C and 8C communities (edges grow ~x8):

1. correctness at scale: truss edge set == planted clique edges exactly,
   all supports >= 10 (noise can only ADD support to clique edges);
2. wall time grows ~linearly: per-round triangle enumeration is
   wedge-bound, and planted communities bound wedges per node by the
   community size — so x8 communities cost ~x8, never a superlinear
   blowup;
3. peel depth stays flat (noise and bridges die in round 1; the fused
   fixpoint check ends it in round 2) — depth is set by cascade length,
   not graph size.

Run: ``python examples/stress_ktruss.py`` (env: SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.operators.dedup import ktruss
from dshackle_archive_spark.session import get_spark

CLIQUE = 12  # nodes per planted community


def build_graph(spark, n_comm: int):
    """Clique edges + one bridge per community + 25%-of-clique-volume
    deterministic noise edges. Node id = community*CLIQUE + slot."""
    nodes = F.transform(
        F.sequence(F.lit(0), F.lit(CLIQUE - 1)),
        lambda i: F.col("id") * CLIQUE + i,
    )
    pair_structs = F.flatten(
        F.transform(
            nodes,
            lambda x, i: F.transform(
                F.slice(nodes, i + F.lit(2), F.lit(CLIQUE)),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    comm = spark.range(n_comm)
    cliques = comm.select(F.explode(pair_structs).alias("e")).select("e.u", "e.v")
    bridges = comm.select(
        (F.col("id") * CLIQUE).alias("u"),
        (((F.col("id") + 1) % n_comm) * CLIQUE + 1).alias("v"),
    )
    n_nodes = n_comm * CLIQUE
    n_noise = n_comm * 66 // 4
    noise = (
        spark.range(n_noise)
        .select(
            (F.abs(F.hash(F.concat(F.lit("na:"), F.col("id")))) % n_nodes).alias("u"),
            (F.abs(F.hash(F.concat(F.lit("nb:"), F.col("id")))) % n_nodes).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    edges = cliques.unionByName(bridges).unionByName(noise)
    return edges, cliques


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("stress-ktruss", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float | int] = {}

    for n_comm in (2_000, 16_000):
        edges, cliques = build_graph(spark, n_comm)
        t0 = time.perf_counter()
        truss = ktruss(edges, 6, src="u", dst="v")
        got = truss.count()
        out[f"seconds_{n_comm}"] = round(time.perf_counter() - t0, 2)

        want = n_comm * (CLIQUE * (CLIQUE - 1) // 2)
        assert got == want, (got, want)
        # set equality + support floor, both sides distributed
        missing = cliques.join(
            truss.select(F.col("a").alias("u"), F.col("b").alias("v")),
            ["u", "v"], "left_anti",
        ).count()
        assert missing == 0, f"{missing} clique edges peeled away"
        weak = truss.filter(F.col("support") < CLIQUE - 2).count()
        assert weak == 0, f"{weak} truss edges below the clique support floor"
        out[f"truss_edges_{n_comm}"] = got

    out["growth_x8_comms"] = round(
        out["seconds_16000"] / out["seconds_2000"], 2
    )
    assert out["growth_x8_comms"] < 16  # ~linear, never wedge-quadratic
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
