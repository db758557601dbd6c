#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Noise control (round-4 hardening — round 3 recorded a 42% phantom
"regression" that was pure machine drift):

- every timed number is the MEDIAN of ``BENCH_REPS`` (default 3) fresh runs,
  after a JIT/codegen warmup pass on sf0.001 (best-of-N hides steady-state
  cost; single-shot hides nothing);
- a pinned drift canary (count+sum over lineitem — plan never changes) is
  timed before and after the suite; its two medians expose machine drift
  within the session, so a slow canary flags an untrustworthy run;
- the full set also runs at sf0.001 and sf0.01 (``sweep``) with the
  sf0.1/sf0.01 time ratio per query — data grows 10×, so a flat-to-sublinear
  ratio demonstrates scale headroom, and cross-sf consistency is itself a
  drift check;
- run metadata (commit SHA, wall time, timestamp) is stamped into the
  artifact so every BENCH_r{N}.json is self-evidencing;
- Spark's console progress bars are disabled (they polluted earlier
  artifacts' captured tails).

Each query is built fresh and fully materialized (count) so lazy evaluation
can't hide work.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import statistics
import subprocess
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dshackle_archive_spark import queries as Q  # noqa: E402
from dshackle_archive_spark.core.checkpoint import release_all_pinned  # noqa: E402
from dshackle_archive_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "h1_pricing_summary",
    "h2_cheapest_supplier",
    "h3_shipping_priority",
    "h4_order_priority",
    "h5_local_supplier_volume",
    "h6_forecast_revenue",
    "a1_islands",
    "a3_gap_detection",
    "a9_throughput_window",
    "a11_moving_avg",
    "t8_sessionization",
    "w1_chain_linkage",
    "j7_range_chunk_assignment",
    "j8_asof_join",
    "e4_set_equality_check",
]

HEADLINE += [
    "h9_product_profit",
    "h13_customer_distribution",
    "h18_large_volume_customers",
    "h21_sole_blamed_supplier",
    "t9_funnel",
    "a12_cohort_retention",
    "a13_discrete_median",
    "p10_json_props_agg",
]

# appended as implemented (LLM-pipeline operator benches)
EXTRA = [
    "x9_decontamination",
    "x10_repetition",
    "x11_tfidf_top_terms",
    "d1_exact_dedup",
    "d2_minhash_lsh_dedup",
    "d3_ngram_jaccard",
    "d4_embedding_neardup",
    "x1_token_count",
    "x4_doc_fingerprint",
    "v1_cosine_topk",
    "v2_ann_lsh_topk",
    "v3_ivf_topk",
    "v6_reranked_topk",
    "x14_length_outliers",
    "x12_stratified_sample",
    "x15_corpus_diff",
    "x19_sequence_packing",
    "j9_banded_range_self_join",
    "d8_chain_components",
    "x21_doc_chunking",
    "x22_token_entropy",
    "x23_containment_neardup",
    "x24_boilerplate_ngrams",
    "x25_vocab_growth",
    "x26_source_kl_drift",
    "a15_quantile_bands",
    "d9_minhash_error_audit",
    "m3_audio_feature_energy",
    "x27_kmv_distinct_sketch",
    "x28_pmi_collocations",
    "v8_pq_topk",
    "x29_hybrid_rrf_retrieval",
    "x30_lsh_recall_audit",
    "a16_window_unique_actors",
    "x31_bigram_perplexity",
    "x32_segment_dedup",
    "d10_semantic_dedup",
    "x33_dsir_weights",
    "a17_countmin_heavy_hitters",
    "v9_matryoshka_recall",
    "v10_ivf_pq_topk",
    "x34_duplicated_span_extents",
    "x35_perplexity_terciles",
    "x36_kneser_ney_scores",
    "a18_hll_distinct_sketch",
    "v11_range_search",
    "w6_cumulative_distinct_hll",
    "m4_image_ahash_neardup",
    "x37_bm25_ranking",
    "d11_pagerank",
    "a19_histogram_quantiles",
    "v12_embedding_covariance",
    "m5_silence_segments",
    "x38_gopher_rules",
    "v13_top_eigenvector",
    "x39_zipf_slope",
    "d12_triangle_count",
    "x40_priority_sample",
    "a20_bloom_filter_fpr",
    "x41_readability",
    "w7_decayed_mean",
    "x42_ngram_novelty",
    "x43_dedup_impact",
    "d13_cluster_profile",
    "j10_interval_overlap_join",
    "v14_cluster_quality",
    "w8_max_concurrency",
    "v15_recall_curve",
    "x44_burstiness",
    "d14_cross_source_dup",
    "x45_code_detection",
    "w9_rolling_quantile",
    "d15_lsh_band_tuning",
    "p11_json_schema_profile",
    "d16_degree_assortativity",
    "x46_mad_outliers",
    "w10_rolling_zscore",
    "x47_ndcg_audit",
    "w11_dow_seasonality",
    "x48_winnowing_fingerprints",
    "w12_cusum_drift",
    "x49_lexical_diversity",
    "v16_hard_negatives",
    "a21_key_skew_audit",
    "w13_seasonal_decomposition",
    "v17_embedding_margin",
    "w14_anomaly_incidents",
    "w15_holt_forecast",
    "d17_adamic_adar",
    "w16_changepoint",
    "d18_triangle_sample_audit",
    "d19_kcore_prune",
    "w17_theil_sen_trend",
    "d20_personalized_pagerank",
    "d21_neardup_cap_audit",
    "d22_ktruss_prune",
    "d23_clustering_coefficient",
    "m6_shot_boundaries",
]

REPS = int(os.environ.get("BENCH_REPS", "3"))
SWEEP_SFS = ("0.001", "0.01")


def run_one(spark, name: str, sf_dir: str) -> float:
    fn = Q.registry()[name]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    # noop sink: full materialization of EVERY output column. count() let
    # Catalyst prune final per-row projections (a pure projection query
    # collapsed to a parquet row count — x5 measured flat across x8 data),
    # silently flattering exactly the scan-bound queries. Round-8 fix; the
    # affected queries' recorded times rose accordingly.
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    # inter-job hygiene: each fresh construction pins its own checkpoints
    # (edge lists, signatures); without releasing, reps x queries
    # accumulate to driver-heap exhaustion at large sf (core/checkpoint.py)
    release_all_pinned(spark)
    return dt


def median_time(spark, name: str, sf_dir: str, reps: int = REPS) -> tuple[float, float]:
    ts = [run_one(spark, name, sf_dir) for _ in range(reps)]
    return statistics.median(ts), min(ts)


# Round-7 hardening: BENCH_r06 was taken on a loaded machine (canary 0.189
# before vs 0.130 after; v3 median 5.86 s vs best 2.00 s) and recorded
# phantom 1.3-2.6x regressions for plans that hadn't changed. Two defenses:
# (a) a median that's >SPREAD_LIMIT x its own best-of-N is ambient load, not
#     the plan — re-measure up to MAX_RETRIES times and keep the
#     tightest-spread attempt (the one least polluted by load);
# (b) if the drift canary moves >25% across the suite, stamp
#     ``load_suspect: true`` into BOTH the stdout line and the sidecar so a
#     contaminated run can't silently become the round's official number.
SPREAD_LIMIT = 1.5
MAX_RETRIES = 2
CANARY_DRIFT_LIMIT = 0.25


def defended_time(spark, name: str, sf_dir: str) -> tuple[float, float, int]:
    """(median, best, retries) — re-run while median/best spread > 1.5x."""
    med, mn = median_time(spark, name, sf_dir)
    retries = 0
    best_attempt = (med, mn)
    while mn > 0 and med / mn > SPREAD_LIMIT and retries < MAX_RETRIES:
        retries += 1
        med, mn = median_time(spark, name, sf_dir)
        if mn > 0 and (med / mn) < (best_attempt[0] / best_attempt[1]):
            best_attempt = (med, mn)
    med, mn = best_attempt
    return med, mn, retries


def canary_time(spark, sf_dir: str) -> float:
    """Pinned trivial query: a fixed one-stage scan+agg whose plan never
    changes round-over-round — any movement here is the machine, not code."""

    def one() -> float:
        t0 = time.perf_counter()
        df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        df.selectExpr("count(*) c", "sum(l_quantity) s").collect()
        return time.perf_counter() - t0

    return statistics.median(one() for _ in range(REPS))


CPU_CANARY_ROWS = int(os.environ.get("BENCH_CPU_CANARY_ROWS", "2000000000"))


def cpu_canary_time(spark) -> float:
    """CPU-BOUND drift canary, paired with the IO-bound one (round-8
    hardening): ``sum(hash(id))`` over an in-memory 2×10⁹-row range — no
    IO, no data, one whole-stage-codegen pass saturating every core.

    Why a second canary: four identical-code round-7 runs spanned
    80.4–117.3 s — a UNIFORM ~15-25% per-query spread (CPU frequency /
    turbo window) that the IO-bound lineitem scan barely senses, so
    ``load_suspect`` stayed false while every per-query number drifted
    together. This canary's before/after pair moves WITH core frequency;
    readers can divide a query's cross-round ratio by the CPU-canary
    ratio to frequency-correct it (documented in PERF.md). Deterministic
    result (murmur3 over a fixed range) doubles as a self-check."""
    p = max(1, spark.sparkContext.defaultParallelism)

    def one() -> float:
        t0 = time.perf_counter()
        row = (
            spark.range(0, CPU_CANARY_ROWS, 1, p)
            .selectExpr("sum(cast(hash(id) as bigint)) s")
            .collect()
        )
        assert row[0][0] is not None
        return time.perf_counter() - t0

    return statistics.median(one() for _ in range(REPS))


def git_sha() -> str | None:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or None
    except OSError:
        return None


def prev_committed_detail() -> dict | None:
    """The PREVIOUS round's committed BENCH_DETAIL.json (HEAD version —
    bench.py overwrites the worktree copy, so the git blob is the last
    officially recorded run)."""
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_DETAIL.json"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return json.loads(out.stdout) if out.returncode == 0 else None
    except (OSError, json.JSONDecodeError):
        return None


def normalized_vs_prev(times: dict[str, float], canary: dict) -> dict | None:
    """Ambient-normalized cross-round ratios (round-9 task): per query,

        normalized = (median_now / median_prev) / cpu_canary_ratio

    where ``cpu_canary_ratio = mean(cpu_before, cpu_after)_now /
    mean(cpu_before, cpu_after)_prev``. The CPU-bound canary moves with
    core frequency / ambient load and is code-independent, so dividing by
    its ratio removes the uniform machine-speed component — a normalized
    ratio ≈ 1.0 means "same plan cost, machine drifted", > 1 means the
    code (or data) genuinely got slower. Judges previously hand-adjusted
    for this; now it's mechanical."""
    prev = prev_committed_detail()
    if not prev or "canary" not in prev:
        return None
    pc = prev["canary"]
    try:
        prev_cpu = (pc["cpu_before"] + pc["cpu_after"]) / 2
        now_cpu = (canary["cpu_before"] + canary["cpu_after"]) / 2
        cpu_ratio = now_cpu / prev_cpu
    except (KeyError, ZeroDivisionError, TypeError):
        return None
    prev_times = prev.get("queries_median", {})
    per_query = {
        n: round((times[n] / prev_times[n]) / cpu_ratio, 3)
        for n in times
        if prev_times.get(n)
    }
    return {
        "prev_commit": (prev.get("meta") or {}).get("commit"),
        "cpu_canary_ratio": round(cpu_ratio, 4),
        "formula": "(median_now/median_prev) / cpu_canary_ratio",
        "queries": per_query,
    }


def prev_printed_keys() -> list[str]:
    """Query keys printed in the LAST round's parsed one-line JSON (the
    committed ``BENCH_r{N}.json`` with the highest N, skipping alternate-cpu
    artifacts like ``_c8``).

    The driver captures only the final ~2,000 chars of stdout, so the line
    can never hold all per-query medians (a 121-query dict alone is ~3.6 KB
    — rounds 4-5 proved an oversized line loses its HEAD and parses as
    null). What it CAN do is keep the printed SET stable round-over-round:
    every key the previous round's line contained is kept in this round's
    line regardless of the cost cutoff, so the driver's per-query PERF
    accounting never reports a phantom ``dropped_from_bench`` when a query
    merely got faster (round-11 verdict: d8 improved ~2x and was counted as
    a drop). The complete medians for every query are always in the
    committed BENCH_DETAIL.json (``queries_median``)."""
    here = os.path.dirname(os.path.abspath(__file__))
    best_round, keys = -1, []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        base = os.path.basename(path)
        m = re.fullmatch(r"BENCH_r(\d+)\.json", base)
        if not m or int(m.group(1)) <= best_round:
            continue
        try:
            with open(path) as f:
                parsed = (json.load(f) or {}).get("parsed") or {}
        except (OSError, json.JSONDecodeError):
            continue
        q = parsed.get("queries")
        if isinstance(q, dict) and q:
            best_round, keys = int(m.group(1)), list(q)
    return keys


def norm_geomean(norm: dict | None) -> float | None:
    """Geomean of the canary-normalized per-query ratios vs the previous
    committed BENCH_DETAIL (round-12 verdict item 7: a cross-round summary
    that does not depend on matched host windows — the uniform
    machine-speed component cancels via the CPU-canary ratio)."""
    if not norm or not norm.get("queries"):
        return None
    vals = [v for v in norm["queries"].values() if isinstance(v, (int, float)) and v > 0]
    if not vals:
        return None
    return round(math.exp(sum(math.log(v) for v in vals) / len(vals)), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    data_root = os.path.dirname(sf_dir.rstrip("/")) or "/root/testdata"
    started = datetime.now(timezone.utc).isoformat(timespec="seconds")
    t_suite = time.perf_counter()

    spark = get_spark("dshackle-archive-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE + EXTRA if n in Q.registry()]
    # warmup every query (JIT, codegen caches) on the smallest sf so timed
    # runs measure the plan, not first-compilation
    for n in names:
        try:
            run_one(spark, n, os.path.join(data_root, "sf0.001"))
        except Exception:
            pass

    # Plan-shape gate at BENCH scale (round-10 task 1): the suite's
    # fingerprint gate runs at sf0.001 stats, where broadcast-vs-SMJ
    # choices differ from the plans this bench actually times. Diff the
    # full registry's fingerprints at the bench SF against the committed
    # sf-matched table (tests/plan_fingerprints_sf01.json for sf0.1) and
    # stamp any drift into both the artifact and the stdout line — an
    # unintentional shape change can no longer ride a noisy wall-clock.
    plan_drift: dict | None = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        from test_plan_fingerprints import (  # noqa: E402
            _table_for, current_fingerprints, fingerprint_diff,
        )
        table = _table_for(sf_dir)
        if table and os.path.exists(table):
            with open(table) as f:
                want = json.load(f)
            plan_drift = fingerprint_diff(want, current_fingerprints(spark, sf_dir))
    except Exception as e:  # the gate must never cost the round its bench
        plan_drift = {"gate_error": f"{type(e).__name__}: {e}"[:500]}

    # warm the canary's own scan path once, untimed: the before-canary
    # otherwise reads the target-sf lineitem cold (page cache + column
    # reader init) while the after-canary runs fully warm — a structural
    # ~0.2-0.3 "drift" that has nothing to do with ambient load and can
    # trip the load_suspect flag on a clean run
    canary_time(spark, sf_dir)
    canary_before = round(canary_time(spark, sf_dir), 4)
    cpu_canary_time(spark)  # one untimed pass: codegen compile for the canary
    cpu_before = round(cpu_canary_time(spark), 4)

    times: dict[str, float] = {}
    best: dict[str, float] = {}
    load_retries: dict[str, int] = {}
    for n in names:
        med, mn, retries = defended_time(spark, n, sf_dir)
        times[n] = round(med, 4)
        best[n] = round(mn, 4)
        if retries:
            load_retries[n] = retries

    # scale sweep: the same set at smaller sfs (medians); ratio vs sf0.01
    sweep: dict[str, dict[str, float]] = {}
    for s in SWEEP_SFS:
        d = os.path.join(data_root, f"sf{s}")
        if not os.path.isdir(d):
            continue
        sweep[s] = {
            n: round(median_time(spark, n, d)[0], 4) for n in names
        }
    ratios = {}
    if "0.01" in sweep and sf == 0.1:
        ratios = {
            n: round(times[n] / sweep["0.01"][n], 2)
            for n in names
            if sweep["0.01"].get(n)
        }

    canary_after = round(canary_time(spark, sf_dir), 4)
    cpu_after = round(cpu_canary_time(spark), 4)

    total = round(sum(times.values()), 4)
    meta = {
        "commit": git_sha(),
        "started_utc": started,
        "suite_seconds": round(time.perf_counter() - t_suite, 1),
        "cpus": int(cpus),
    }
    def _drift(a: float, b: float) -> float:
        return abs(b - a) / min(a, b) if min(a, b) > 0 else 0.0

    drift = _drift(canary_before, canary_after)
    cpu_drift = _drift(cpu_before, cpu_after)
    load_suspect = drift > CANARY_DRIFT_LIMIT or cpu_drift > CANARY_DRIFT_LIMIT
    canary = {
        "query": "lineitem count+sum",
        "before": canary_before,
        "after": canary_after,
        "drift": round(drift, 3),
        # CPU-bound pair: divide a query's cross-round ratio by the ratio of
        # the two rounds' cpu medians to frequency-correct it (PERF.md)
        "cpu_query": f"sum(hash(id)) over range({CPU_CANARY_ROWS})",
        "cpu_before": cpu_before,
        "cpu_after": cpu_after,
        "cpu_drift": round(cpu_drift, 3),
    }
    # The driver captures only a tail of stdout; round 4's artifact lost the
    # head of one giant JSON line (sweep dicts made it ~8 KB). The stdout
    # line is now compact (headline total + per-query medians + canary +
    # meta only); the bulky sweep/best/ratio detail goes to a sidecar file
    # committed to the repo.
    norm = normalized_vs_prev(times, canary)
    norm_geo = norm_geomean(norm)
    detail = {
        "queries_best": best,
        "sweep_median": sweep,
        "ratio_vs_sf0.01": ratios,
        "canary": canary,
        "load_suspect": load_suspect,
        "load_retries": load_retries,
        "plan_drift": plan_drift,
        "meta": meta,
        "queries_median": times,
        "normalized_vs_prev": norm,
        "norm_geomean_vs_prev": norm_geo,
        "total": total,
        "sf": sf,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # The driver captures only the last ~2,000 chars of stdout; a 60-query
    # medians dict alone is ~1,500 chars and round 5's full line (2,263
    # chars) lost its head and parsed as null. Emit the headline + as many
    # per-query medians as fit, and flag truncation; the complete medians
    # always live in BENCH_DETAIL.json (committed). Round-12 fixes
    # (additions-only; methodology unchanged):
    # - STABLE printed set: keys printed in the previous round's committed
    #   line are kept regardless of the cost cutoff (drop order prefers the
    #   cheapest key NOT in the previous line), so the driver's per-query
    #   accounting stops seeing phantom "dropped_from_bench" entries when a
    #   query merely drops below the cost cutoff;
    # - line values rounded to 3 decimals (sub-ms noise anyway) so more
    #   keys fit; BENCH_DETAIL.json keeps the 4-decimal medians;
    # - norm_geomean_vs_prev: canary-normalized cross-round geomean (the
    #   host-window-independent summary; null when no prev detail exists).
    def payload(qdict: dict[str, float], truncated: bool) -> str:
        return json.dumps(
            {
                "metric": "headline_query_wall_time_total",
                "value": total,
                "unit": "sec",
                "queries": {n: round(v, 3) for n, v in qdict.items()},
                "queries_truncated": truncated,
                "n_queries": len(times),
                "sf": sf,
                "reps": REPS,
                "stat": "median",
                "load_suspect": load_suspect,
                "plan_drift_keys": sorted(plan_drift) if plan_drift else [],
                "norm_geomean_vs_prev": norm_geo,
                "canary": canary,
                "meta": meta,
                "detail": "BENCH_DETAIL.json",
            }
        )

    must_keep = set(prev_printed_keys()) & set(times)
    # display order: cost-descending; drop order: cheapest key outside the
    # previous round's printed set first, previous-round keys only if the
    # stable set alone cannot fit
    by_cost = sorted(times, key=times.get, reverse=True)
    drop_order = sorted(times, key=lambda n: (n in must_keep, times[n]))
    dropped: set[str] = set()
    keep = {n: times[n] for n in by_cost}
    line = payload(keep, False)
    di = 0
    while len(line) > 1900 and di < len(drop_order):
        dropped.add(drop_order[di])
        di += 1
        keep = {n: times[n] for n in by_cost if n not in dropped}
        line = payload(keep, True)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
