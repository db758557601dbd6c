#!/usr/bin/env python
"""Scale probe for the PCA front-end (v12 covariance + v13 eigenvector).

Synthetic 64-dim vectors with a planted spiked spectrum (a dominant
direction e0+e1 plus hash-noise), generated in-plan — no disk inputs.

Claims under test:
1. `covariance_cells` is corpus-linear with a partition-bounded shuffle:
   each partition emits exactly 2,145 rows (one Arrow/BLAS partial
   Gramian) no matter how many vectors it holds — doubling the corpus
   should ~double the map time and leave the reduce unchanged;
2. `top_eigenvector` cost is corpus-INDEPENDENT (driver-side on the
   2,080 collected cells after the one distributed pass);
3. the recovered leading eigenvector points at the planted direction
   (|cos| > 0.99 with (e0+e1)/√2) at every scale.

Run: ``python examples/stress_covariance.py`` (env: SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.operators.similarity import (
    covariance_cells,
    top_eigenvector,
)
from dshackle_archive_spark.session import get_spark

DIM = 64


def build_vectors(spark, n: int):
    """id-hash noise in every dim, plus a strong shared component along
    e0+e1 scaled by a per-row hash — a spiked covariance with known top
    eigenvector (e0+e1)/sqrt(2)."""
    noise = [
        ((F.col("id") * (2654435761 + 97 * d)) % 1000).cast("double") / 500.0
        - 1.0
        for d in range(DIM)
    ]
    spike = ((F.col("id") * 40503) % 1000).cast("double") / 100.0  # 0..10
    comps = [
        (noise[d] + spike if d in (0, 1) else noise[d]).alias(f"x{d}")
        for d in range(DIM)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*comps).alias("embedding")
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-cov", master=f"local[{cpus}]")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(cpus) * 2))

    # warm the JIT/Arrow path so the 1M point isn't charged for startup
    warm = build_vectors(spark, 100_000).localCheckpoint(eager=True)
    covariance_cells(warm, dim=DIM).count()
    warm.unpersist()

    out = {}
    for n in (1_000_000, 2_000_000):
        vecs = build_vectors(spark, n).localCheckpoint(eager=True)
        t0 = time.time()
        cells = covariance_cells(vecs, dim=DIM).localCheckpoint(eager=True)
        assert cells.count() == DIM * (DIM + 1) // 2
        t_cov = time.time() - t0
        t0 = time.time()
        ev = {r["i"]: r["w"] for r in top_eigenvector(cells, iters=8).collect()}
        t_eig = time.time() - t0
        # cosine with the planted direction (e0+e1)/sqrt(2)
        cos = abs((ev[0] + ev[1]) / math.sqrt(2.0))
        assert cos > 0.99, cos
        out[n] = {
            "covariance_s": round(t_cov, 2),
            "eigenvector_s": round(t_eig, 2),
            "planted_cos": round(cos, 4),
        }
        print(f"  n={n}: {out[n]}")
        vecs.unpersist()
    r = out[2_000_000]["covariance_s"] / out[1_000_000]["covariance_s"]
    print(
        json.dumps(
            {
                "probe": "covariance_pca",
                "x2_ratio": round(r, 2),
                **{str(k): v for k, v in out.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
