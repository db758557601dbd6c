#!/usr/bin/env python
"""The IVF-cell lever probe: SemDeDup's Σ|cell|² cost at fixed vs scaled K.

`semantic_dedup` is cell-quadratic by contract — at a FIXED quantizer
size K, growing the corpus ×8 grows every cell ×8 and the pair stage
×64. The production lever is K ∝ N (cells keep their size; Σ|cell|²
stays corpus-linear). This probe measures both sides of that claim on
×8 key-shifted copies of the sf0.1 embeddings (~38k vectors):

- fixed K=16 at ×8 data → expect clearly superlinear wall time;
- K=128 (scaled ∝ data) at ×8 data → expect ≈linear vs the sf0.1 run.

Prints one JSON line; PERF.md records the numbers. This is a probe of
the OPERATOR (the registry query d10 pins K=16 for oracle parity).
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

from dshackle_archive_spark.operators.similarity import semantic_dedup
from dshackle_archive_spark.session import get_spark
from dshackle_archive_spark.sources.tables import load_table

BASE = "/root/testdata/sf0.1"
COPIES = 8
REPS = int(os.environ.get("BENCH_REPS", "3"))


def build_scaled(dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    con = duckdb.connect()
    sel = " UNION ALL ".join(
        f"SELECT vec_id + {i} * 10000000 AS vec_id, embedding, label"
        f" FROM read_parquet('{BASE}/embeddings.parquet')"
        for i in range(COPIES)
    )
    con.execute(f"COPY ({sel}) TO '{dirpath}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def timed(fn, reps: int = REPS) -> float:
    def one() -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    return statistics.median(one() for _ in range(reps))


def main() -> None:
    scaled = "/tmp/sf0.1x8_emb"
    build_scaled(scaled)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("stress-semdedup", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * int(cpus)))
    emb1 = load_table(spark, BASE, "embeddings")
    emb8 = load_table(spark, scaled, "embeddings")

    noop(semantic_dedup(emb1, n_cells=16))  # warmup
    out = {
        "sf0.1_k16_sec": round(timed(lambda: noop(semantic_dedup(emb1, n_cells=16))), 3),
        "x8_k16_sec": round(timed(lambda: noop(semantic_dedup(emb8, n_cells=16))), 3),
        "x8_k45_sec": round(timed(lambda: noop(semantic_dedup(emb8, n_cells=45))), 3),
        "x8_k128_sec": round(timed(lambda: noop(semantic_dedup(emb8, n_cells=128))), 3),
    }
    out["ratio_x8_fixed_k"] = round(out["x8_k16_sec"] / out["sf0.1_k16_sec"], 2)
    out["ratio_x8_k45"] = round(out["x8_k45_sec"] / out["sf0.1_k16_sec"], 2)
    out["ratio_x8_k128"] = round(out["x8_k128_sec"] / out["sf0.1_k16_sec"], 2)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
