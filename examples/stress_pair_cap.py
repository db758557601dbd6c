#!/usr/bin/env python
"""Scale probe for the near-dup output cap (round-10 task 7).

The pair stage of the near-dup family (d3/d4/d10) is OUTPUT-bound under
duplication spikes: one passage copied into M documents emits Θ(M²) pairs
however good the candidate generation is, and at 100 TB that pair shuffle
is the bottleneck. ``cap_pairs_per_doc`` (opt-in ``max_pairs_per_doc`` on
``jaccard_pairs``) bounds output at ≤ 2·k·N unconditionally.

Corpus (no disk inputs): N docs, 1% of them a single verbatim-copy
MEGA-CLUSTER (size M = N/100 — the spike grows with the corpus, as real
boilerplate does), every 50th remaining doc a near-copy of its neighbor
(one appended token — the organic pairs a curator must NOT lose), the
rest unique arithmetic-token text.

Claims under test at N and 8N (so the spike grows M → 8M):

1. UNCAPPED spike output is exactly M(M-1)/2 pairs and grows ~×64 for ×8
   docs — the quadratic pathology, measured not asserted away;
2. CAPPED (k=3) output stays ≤ 2·k·N_docs and grows ~linearly (×8-ish);
3. the cap is SELECTIVE: every organic planted pair survives (each
   endpoint's single strongest neighbor → best_rank = 1), only
   clique-internal redundancy is discarded.

Run: ``python examples/stress_pair_cap.py`` (env: SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dshackle_archive_spark.operators.dedup import jaccard_pairs, shingles
from dshackle_archive_spark.session import get_spark


def build_corpus(spark, n_docs: int):
    cluster = n_docs // 100
    boiler = " ".join(f"boiler{i}" for i in range(40))
    body = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}_"), ((F.col("id") * 131 + j * 17) % 999983))
            for j in range(40)
        ],
    )
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        # first `cluster` ids: the verbatim mega-cluster (duplication spike)
        F.when(F.col("id") < cluster, F.lit(boiler))
        .otherwise(body)
        .alias("text"),
    )
    # organic near-dups: every 50th non-cluster doc gets a +100M twin with
    # one appended token (high-but-not-1.0 jaccard, unique to the pair)
    twins = base.filter(
        (F.col("doc_id") >= cluster) & (F.col("doc_id") % 50 == 0)
    ).select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extratok")).alias("text"),
    )
    return base.unionByName(twins), cluster


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("stress-pair-cap", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float | int] = {}
    K = 3

    for n_docs in (20_000, 160_000):
        corpus, cluster = build_corpus(spark, n_docs)
        sh = shingles(corpus, n=3)
        # df cap must not hide the spike from this probe: the point is the
        # OUTPUT cap, so let the clique's shingles through
        t0 = time.perf_counter()
        uncapped = jaccard_pairs(sh, threshold=0.5, token_col="shingle",
                                 max_token_df=None).count()
        t_uncapped = time.perf_counter() - t0
        t0 = time.perf_counter()
        capped_df = jaccard_pairs(sh, threshold=0.5, token_col="shingle",
                                  max_token_df=None, max_pairs_per_doc=K)
        capped = capped_df.count()
        t_capped = time.perf_counter() - t0

        n_twins = len(range(cluster + (50 - cluster % 50) % 50, n_docs, 50))
        spike_pairs = cluster * (cluster - 1) // 2
        assert uncapped == spike_pairs + n_twins, (uncapped, spike_pairs, n_twins)

        total_docs = n_docs + n_twins
        assert capped <= 2 * K * total_docs, (capped, 2 * K * total_docs)

        # claim 3: every organic pair survives the cap
        organic_kept = capped_df.filter(F.col("doc_b") >= 100_000_000).count()
        assert organic_kept == n_twins, (organic_kept, n_twins)

        out[f"cluster_{n_docs}"] = cluster
        out[f"uncapped_pairs_{n_docs}"] = uncapped
        out[f"capped_pairs_{n_docs}"] = capped
        out[f"organic_pairs_kept_{n_docs}"] = organic_kept
        out[f"seconds_uncapped_{n_docs}"] = round(t_uncapped, 2)
        out[f"seconds_capped_{n_docs}"] = round(t_capped, 2)

    out["uncapped_growth_x8_docs"] = round(
        out["uncapped_pairs_160000"] / out["uncapped_pairs_20000"], 1
    )
    out["capped_growth_x8_docs"] = round(
        out["capped_pairs_160000"] / out["capped_pairs_20000"], 1
    )
    assert out["uncapped_growth_x8_docs"] > 30  # quadratic pathology visible
    assert out["capped_growth_x8_docs"] < 12  # cap holds ~linear
    print(json.dumps(out, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
