"""Tests for the training-data pipeline operators: dedup, similarity, text
analysis, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from dshackle_archive_spark.operators import dedup as D
from dshackle_archive_spark.operators import multimodal as M
from dshackle_archive_spark.operators import similarity as S
from dshackle_archive_spark.operators import textan as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "The  Quick Brown Fox jumps over the lazy dog"),  # dup after norm
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "pack my box with five dozen liquor jugs"),
        (5, "der hund und die katze sind nicht da"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    dups = D.exact_duplicates(docs).filter("n_copies > 1").collect()
    assert len(dups) == 1
    assert dups[0]["n_copies"] == 3 and dups[0]["keep_id"] == 0


def test_distinct_documents(spark, docs):
    kept = sorted(r["doc_id"] for r in D.distinct_documents(docs).collect())
    assert kept == [0, 3, 4, 5, 6]


def test_jaccard_near_dup(spark, docs):
    toks = D.tokens(docs)
    pairs = D.jaccard_pairs(toks, threshold=0.6).collect()
    got = sorted((r["doc_a"], r["doc_b"], round(r["jaccard"], 3)) for r in pairs)
    # 0,1,2 identical token sets (jaccard 1.0); 3 swaps one word → 7∩/9∪
    assert (0, 1, 1.0) in got and (0, 2, 1.0) in got and (1, 2, 1.0) in got
    assert (0, 3, 0.778) in got
    assert not any(a == 4 or b == 4 for a, b, _ in got)


def test_minhash_lsh_finds_near_dups(spark, docs):
    sh = D.shingles(docs, n=2)
    sigs = D.minhash_signatures(sh, num_hashes=16)
    cands = D.lsh_candidate_pairs(sigs, bands=8, rows_per_band=2).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in cands}
    # identical docs always collide in every band
    assert {(0, 1), (0, 2), (1, 2)} <= got
    # unrelated docs don't collide
    assert (0, 4) not in got and (0, 5) not in got


def test_simhash_near_pairs(spark, docs):
    sigs = D.simhash64(D.tokens(docs))
    assert sigs.count() == 6  # doc 6 has no tokens
    pairs = D.simhash_near_pairs(sigs, max_hamming=8).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert {(0, 1), (0, 2), (1, 2)} <= got
    ham = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert ham[(0, 1)] == 0
    assert (0, 4) not in got


def test_token_counts(spark, docs):
    out = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", X.token_count().alias("n")).collect()
    }
    assert out[0] == 9 and out[4] == 8 and out[6] == 0


def test_language_scores(spark, docs):
    out = {r["doc_id"]: r["predicted_lang"] for r in X.language_scores(docs).collect()}
    assert out[0] == "en" and out[5] == "de"


def test_quality_features(spark, docs):
    q = {r["doc_id"]: r for r in X.quality_features(docs).collect()}
    assert q[0]["n_tokens"] == 9 and q[0]["n_stopwords"] == 1  # only 'the'
    assert q[6]["n_tokens"] == 0 and q[6]["stopword_ratio"] == 0.0
    assert 0 <= q[0]["punct_ratio"] <= 1


def test_fingerprint_stable(spark, docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in X.fingerprint(docs).collect()}
    assert fp[0] == fp[1] == fp[2]
    assert fp[0] != fp[3]


def test_cosine_topk_real_embeddings(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    out = S.cosine_topk(emb, queries, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]
        sims = [r["sim"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0001 <= s <= 1.0001 for s in sims)
        assert all(r["neighbor_id"] != q for r in rows)


def test_ann_vs_bruteforce_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200).cache()
    exact = S.cosine_topk(emb, emb, k=1).filter("rank = 1")
    approx = S.ann_topk(emb, dim=64, k=1, n_tables=8, n_bits=4).filter("rank = 1")
    e = {r["query_id"]: r["neighbor_id"] for r in exact.collect()}
    a = {r["query_id"]: r["neighbor_id"] for r in approx.collect()}
    hits = sum(1 for q, n in e.items() if a.get(q) == n)
    # recall@1 of the LSH path should be well above chance
    assert hits / len(e) > 0.5, f"recall {hits}/{len(e)}"


def test_multimodal_pipeline(spark):
    rows = [
        (1, "image", "image/png", b"PNGDATA" * 100, 10, 10, None),
        (2, "image", "image/png", b"PNGDATA" * 100, 10, 10, None),  # dup bytes
        (3, "audio", "audio/wav", b"WAVDATA" * 50, None, None, 2000),
        (4, "video", "video/mp4", b"MP4DATA" * 200, 64, 64, 3500),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    feats = M.extract_features(media).collect()
    assert len(feats) == 4
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["sha256"] == by_id[2]["sha256"]
    assert len(by_id[1]["feature"]) == 8
    assert by_id[1]["feature"] == by_id[2]["feature"]
    dups = M.exact_media_dedup(spark.createDataFrame(feats, M.FEATURE_SCHEMA)).collect()
    assert len(dups) == 1 and dups[0]["keep_id"] == 1
    # frame sampling plan: 0..3500 every 1000 → 4 frames
    frames = M.frame_sample_plan(media).collect()
    assert [r["frame_ts_ms"] for r in sorted(frames, key=lambda r: r["frame_ts_ms"])] == [0, 1000, 2000, 3000]

    # real backend stubs raise cleanly
    with pytest.raises(NotImplementedError):
        M.DecodeBackend().decode_image(b"x")


def test_d4_neardup_plan_is_bucketed_not_allpairs(spark, sf_dir):
    """The embedding near-dup query must route through LSH candidates: its
    physical plan may not contain a nested-loop/cartesian join over the
    corpus (the O(N²) scale-killer flagged in round 1)."""
    from dshackle_archive_spark.queries import registry

    df = registry()["d4_embedding_neardup"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ivf_assign_is_shuffle_free(spark, sf_dir):
    """Cell assignment must be map-side: the round-2 plan shuffled N·K rows
    through a ``Window.partitionBy(vec_id)`` ranking; the map-side argmax
    keeps the corpus scan shuffle-free (the only exchanges allowed are the
    K-row seed agg's SinglePartition and its broadcast)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        S.ivf_assign(emb, n_cells=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert "hashpartitioning" not in plan, plan


def test_ivf_vs_bruteforce_recall(spark, sf_dir):
    """IVF-flat with 16 cells / nprobe 2 must beat chance recall@1 by a wide
    margin (same bar as the LSH path)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200).cache()
    exact = S.cosine_topk(emb, emb, k=1).filter("rank = 1")
    approx = S.ivf_topk(emb, emb, k=1, n_cells=16, nprobe=4).filter("rank = 1")
    e = {r["query_id"]: r["neighbor_id"] for r in exact.collect()}
    a = {r["query_id"]: r["neighbor_id"] for r in approx.collect()}
    hits = sum(1 for q, n in e.items() if a.get(q) == n)
    assert hits / len(e) > 0.5, f"recall {hits}/{len(e)}"


def test_multimodal_resize_stage(spark):
    """Resize plumbing (mapInPandas, MEDIA_SCHEMA in/out): image payloads
    re-encode at the target dims deterministically; audio/video untouched."""
    rows = [
        (1, "image", "image/png", b"PNGDATA" * 100, 100, 80, None),
        (2, "audio", "audio/wav", b"WAVDATA" * 50, None, None, 2000),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in M.resize_images(media, 10, 10).collect()}
    img = out[1]
    assert (img["width"], img["height"]) == (10, 10)
    assert len(img["payload"]) == 10 * 10 // 8
    # deterministic: same input + dims -> same bytes
    again = {r["media_id"]: r for r in M.resize_images(media, 10, 10).collect()}
    assert bytes(again[1]["payload"]) == bytes(img["payload"])
    # pass-through for non-images
    assert bytes(out[2]["payload"]) == b"WAVDATA" * 50 and out[2]["duration_ms"] == 2000
    # schema stable for downstream feature extraction
    feats = M.extract_features(M.resize_images(media, 10, 10)).collect()
    assert {r["media_id"] for r in feats} == {1, 2}


def test_connected_components_chains_and_singletons(spark):
    from dshackle_archive_spark.operators.dedup import connected_components

    # A-B, B-C chain plus isolated pair (E,F) and singleton D
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 6)], "doc_id long")
    got = {r["doc_id"]: r["cluster"]
           for r in connected_components(pairs, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_connected_components_long_chain_converges(spark):
    from dshackle_archive_spark.operators.dedup import connected_components

    # a 12-node path graph: needs ~diameter rounds; must still converge
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    got = connected_components(pairs).collect()
    assert {r["cluster"] for r in got} == {0} and len(got) == 13


def test_star_cc_matches_label_propagation(spark):
    from dshackle_archive_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # mixed shapes: chain, triangle overlapping the chain, isolated pair,
    # singleton — star contraction must agree with min-label propagation
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11), (7, 7)],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 7, 10, 11, 20)],
                                  "doc_id long")
    base = {r["doc_id"]: r["cluster"]
            for r in connected_components(pairs, nodes=nodes).collect()}
    star_df, rounds = connected_components_star(pairs, nodes=nodes)
    star = {r["doc_id"]: r["cluster"] for r in star_df.collect()}
    assert star == base == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 10: 10, 11: 10, 20: 20}
    assert rounds <= 5


def test_star_cc_chain_graph_logarithmic_rounds(spark):
    """The adversarial case min-label propagation cannot handle: a 4096-node
    path graph has diameter 4095 (O(n) label-propagation rounds) but star
    contraction halves path length every round — O(log n) rounds, asserted."""
    import math

    from dshackle_archive_spark.operators.dedup import connected_components_star

    n = 4096
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    # driver_finish_edges=0 pins the DISTRIBUTED contraction — the round-11
    # driver-finish hybrid would otherwise label this graph locally in 0
    # rounds and the log-rounds assertion below would be vacuous
    got, rounds = connected_components_star(pairs, driver_finish_edges=0)
    rows = got.collect()
    assert {r["cluster"] for r in rows} == {0} and len(rows) == n
    # 2·log2(n)+4 bound: large+small star contract path length ~2× per round
    assert 1 <= rounds <= 2 * int(math.log2(n)) + 4, rounds


def test_cluster_representatives_longest_wins(spark):
    from dshackle_archive_spark.operators.dedup import (
        cluster_representatives,
        connected_components,
    )

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    corpus = spark.createDataFrame(
        [(1, "short"), (2, "the longest document"), (3, "mid text"), (9, "solo")],
        "doc_id long, text string",
    )
    clusters = connected_components(pairs, nodes=corpus.select("doc_id"))
    reps = {r["cluster"]: (r["rep_doc_id"], r["n_docs"])
            for r in cluster_representatives(clusters, corpus).collect()}
    assert reps == {1: (2, 3), 9: (9, 1)}


def test_asof_join_semantics(spark):
    from dshackle_archive_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 5), (3, "b", 7), (4, "c", 9)],
        "oid long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 5, 100), ("a", 5, 101), ("a", 8, 102), ("b", 9, 103)],
        "k string, t long, eid long",
    )
    out = {
        r["oid"]: r["eid"]
        for r in asof_join(left, right, "k", "t", "t", ["eid"], "eid").collect()
    }
    # oid1: t=10 -> latest event t=8 (eid 102); oid2: t=5 ties -> max eid 101
    # oid3: b's only event is at t=9 > 7 -> null; oid4: key c unseen -> null
    assert out == {1: 102, 2: 101, 3: None, 4: None}


def test_asof_join_plan_has_no_range_join(spark):
    """The scalable shape: one exchange on the key, no BroadcastNestedLoop /
    cartesian from the ts inequality."""
    from dshackle_archive_spark.operators.asof import asof_join

    left = spark.range(100).selectExpr("id AS oid", "id % 5 AS k", "id AS t")
    right = spark.range(50).selectExpr("id % 5 AS k", "id AS t", "id AS eid")
    out = asof_join(left, right, "k", "t", "t", ["eid"], "eid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2  # union sides feed ONE window shuffle


def test_repetition_features_is_map_side(spark, sf_dir):
    """x10's operator must stay inside whole-stage codegen: per-doc n-gram
    repetition is array math on the row — no explode, no exchange of any
    kind in the physical plan."""
    from dshackle_archive_spark.operators.textan import repetition_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        repetition_features(docs, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan  # no explode


def test_repetition_features_values(spark):
    """Planted repetition: 'a b c a b c a b c' has 7 3-grams, 3 distinct."""
    from dshackle_archive_spark.operators.textan import repetition_features

    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "all words unique here today")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_features(docs, n=3).collect()}
    assert rows[1]["n_ngrams"] == 7 and rows[1]["n_distinct"] == 3
    assert rows[1]["dup_ngram_ratio"] == round(4 / 7, 6)
    assert rows[2]["dup_ngram_ratio"] == 0.0


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    """x9's benchmark n-gram set must reach the corpus probe as a broadcast
    LEFT join feeding ONE hit-marking aggregation — the corpus n-gram
    stream is built exactly once (a sizes/hits aggregation pair would build
    it twice) and never shuffles raw shingles to meet the benchmark."""
    from dshackle_archive_spark.operators.dedup import benchmark_contamination
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = benchmark_contamination(
        docs.filter(F.col("doc_id") % 29 != 0),
        docs.filter(F.col("doc_id") % 29 == 0),
        n=5,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # one corpus-side n-gram Generate only (corpus + benchmark sides = 2)
    assert plan.count("Generate explode") == 2, plan


def test_repetition_has_no_higher_order_functions(spark, sf_dir):
    """x10's plan must contain NO lambda higher-order functions: HOFs run
    interpreted outside whole-stage codegen and the transform/filter
    formulation of this operator measured ~12× slower than the arrays_zip
    one (23 s vs ~2 s over a 105k-doc corpus)."""
    from dshackle_archive_spark.operators.textan import repetition_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        repetition_features(docs, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lambdafunction" not in plan, plan
    assert "arrays_zip" in plan, plan


def test_contamination_finds_planted_leak(spark):
    """A corpus doc that embeds a benchmark doc verbatim must be flagged at
    high contamination; an unrelated doc must not appear."""
    from dshackle_archive_spark.operators.dedup import benchmark_contamination

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro words then the quick brown fox jumps over the lazy dog near the river bank and more"),
            (2, "completely different content about parquet shuffles and broadcast joins in spark"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in benchmark_contamination(corpus, bench, n=5, threshold=0.05).collect()}
    assert 1 in rows and rows[1]["contamination"] > 0.4
    assert 2 not in rows


def test_reranked_topk_matches_exact_top1(spark, sf_dir):
    """The int8 shortlist must not lose the true nearest neighbor: top-1
    after re-rank equals brute-force float top-1 for every query (int8
    keeps ~2 decimal digits — more than enough separation at top rank)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200).cache()
    queries = emb.filter("vec_id < 5")
    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in S.cosine_topk(emb, queries, k=1).filter("rank = 1").collect()
    }
    two_stage = {
        r["query_id"]: r["neighbor_id"]
        for r in S.reranked_topk(emb, queries, k=1, shortlist=10)
        .filter("rank = 1")
        .collect()
    }
    assert two_stage == exact


from hypothesis import given, settings
from hypothesis import strategies as st

_asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=12
)
_asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 100)),
    max_size=12,
)


@given(left=_asof_left, right=_asof_right)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_naive_model(spark, left, right):
    """Property test (the reference's randomized style): the single-shuffle
    union-trick as-of join must agree with a brute-force model on random
    keyed timelines — latest right row at/before each left point, ties on
    ts broken by max value, null when no prior row."""
    from dshackle_archive_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, t long"
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t, v) in right] or [(99, 99, 0)],
        "k long, t long, val long",
    )
    out = {
        r["lid"]: r["val"]
        for r in asof_join(
            ldf, rdf, key="k", left_ts="t", right_ts="t",
            value_cols=["val"], tie_col="val",
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, rv) for (rk, rt, rv) in right if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert out[i] == expect, (i, k, t, cands, out[i])


def test_funnel_operator_ordering_semantics(spark):
    """Step i counts only events strictly after step i-1's first time:
    a purchase BEFORE the first view must not complete the funnel."""
    from dshackle_archive_spark.operators.funnel import funnel_counts, funnel_times

    rows = [
        # user 1: full ordered journey
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: purchase before view → stops at click
        (2, "purchase", 5), (2, "view", 10), (2, "click", 15),
        # user 3: view only
        (3, "view", 1),
        # user 4: click with no view → never enters
        (4, "click", 7),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    t = {r["user_id"]: r for r in funnel_times(ev, steps).collect()}
    assert set(t) == {1, 2, 3}
    assert (t[1]["t_view"], t[1]["t_click"], t[1]["t_purchase"]) == (10, 20, 30)
    assert t[2]["t_purchase"] is None and t[2]["t_click"] == 15
    assert t[3]["t_click"] is None
    c = {r["stage"]: r["n_keys"] for r in funnel_counts(ev, steps).collect()}
    assert c == {"view": 3, "click": 2, "purchase": 1}


def test_jaccard_for_pairs_matches_full_join(spark, docs):
    """Candidate-scoped Jaccard must equal the full posting-join Jaccard on
    the pairs it is asked about."""
    toks = D.tokens(docs)
    full = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in D.jaccard_pairs(toks, threshold=0.0, token_col="token").collect()
    }
    pairs = spark.createDataFrame(
        [(0, 1), (0, 3), (0, 4), (3, 4)], "doc_a long, doc_b long"
    )
    scoped = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in D.jaccard_for_pairs(pairs, toks, threshold=0.0, token_col="token").collect()
    }
    # pairs with zero token intersection drop out of BOTH formulations
    # (their jaccard is 0 and can never pass a positive threshold)
    assert set(scoped) == {(0, 1), (0, 3)}
    for k, v in scoped.items():
        assert v == full[k], (k, v, full.get(k))


def test_doc_chunking_is_shuffle_free(spark, sf_dir):
    """x21 chunking must stream at scan speed: windows are cut by map-side
    array math + one Generate (the explode of chunk starts) — no Exchange
    anywhere in the physical plan."""
    from dshackle_archive_spark.queries import registry

    df = registry()["x21_doc_chunking"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_doc_chunking_overlap_semantics(spark):
    """Window arithmetic: 80 tokens, size 32 / stride 24 → starts 1,25,49,73;
    last chunk short; consecutive chunks share exactly 8 tokens."""
    from dshackle_archive_spark.queries import registry
    import pyspark.sql.functions as F

    toks = " ".join(f"t{i}" for i in range(80))
    docs = spark.createDataFrame([(1, toks)], "doc_id long, text string")
    # build through the same operator path the query uses
    from dshackle_archive_spark.operators.dedup import normalized_text

    C, S = 32, 24
    tcol = F.split(normalized_text("text"), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(tcol), F.lit(1)), F.lit(S))
    out = (
        docs.select("doc_id", tcol.alias("_t"), F.explode(starts).alias("s"))
        .select("doc_id", "s", F.slice("_t", F.col("s"), F.lit(C)).alias("sl"))
        .collect()
    )
    got = {r["s"]: r["sl"] for r in out}
    assert sorted(got) == [1, 25, 49, 73]
    assert len(got[73]) == 8  # tail chunk short
    assert got[1][-8:] == got[25][:8]  # 8-token overlap


def test_token_entropy_extremes(spark):
    """A single repeated token has zero entropy; k equiprobable tokens have
    ln(k); template docs rank below natural ones."""
    import math

    from dshackle_archive_spark.queries import registry

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "a b c d"), (3, "x y x y x z")],
        "doc_id long, text string",
    )
    # route through the same expression by monkey-loading the table
    from dshackle_archive_spark.operators.dedup import normalized_text
    import pyspark.sql.functions as F

    tok = docs.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    ent = {
        r["doc_id"]: r["e"]
        for r in counts.groupBy("doc_id")
        .agg(
            F.round(
                F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
            ).alias("e")
        )
        .collect()
    }
    assert ent[1] == 0.0
    assert abs(ent[2] - round(math.log(4), 6)) < 1e-9
    assert ent[1] < ent[3] < ent[2]


def test_star_cc_random_graphs_match_label_propagation(spark):
    """Property check: on random edge lists (including self-loops, dup
    edges, isolated nodes), star contraction and min-label propagation
    compute identical components. Seeds fixed for reproducibility; graphs
    kept small because each check runs two iterative Spark jobs."""
    import random

    from dshackle_archive_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(20260814)
    for _trial in range(4):
        n = rng.randint(5, 25)
        m = rng.randint(0, 30)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        pairs = spark.createDataFrame(
            edges or [(0, 0)], "doc_a long, doc_b long"
        )
        base = {r["doc_id"]: r["cluster"]
                for r in connected_components(pairs, nodes=nodes).collect()}
        star_df, _ = connected_components_star(pairs, nodes=nodes)
        star = {r["doc_id"]: r["cluster"] for r in star_df.collect()}
        assert star == base, (n, sorted(edges))


def test_star_cc_driver_finish_matches_distributed(spark):
    """Path-equivalence for the round-11 CC driver-finish hybrid: the
    labeling ``cluster = min(node in component)`` is unique, so the
    vectorized driver pass and the distributed star contraction must agree
    exactly — on a deterministic pseudo-random long-keyed graph with
    singleton padding, and on STRING keys (where the driver pass relies on
    pandas/numpy code-point ordering agreeing with Spark's UTF8 binary
    ``least``/``greatest``)."""
    from dshackle_archive_spark.operators.dedup import connected_components_star

    # deterministic "random" graph: 120 nodes, ~300 multiplicative-hash
    # edges incl. self-loops (no RNG — repo convention)
    edges, x = [], 1
    for _ in range(300):
        x = (x * 1103515245 + 12345) % (2**31)
        edges.append((x % 120, (x // 120) % 120))
    nodes = spark.createDataFrame([(i,) for i in range(140)], "doc_id long")
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    dist_df, dist_rounds = connected_components_star(
        pairs, nodes=nodes, driver_finish_edges=0
    )
    drv_df, drv_rounds = connected_components_star(
        pairs, nodes=nodes, driver_finish_edges=10**9
    )
    dist = {r["doc_id"]: r["cluster"] for r in dist_df.collect()}
    drv = {r["doc_id"]: r["cluster"] for r in drv_df.collect()}
    assert dist == drv and len(dist) == 140
    assert dist_rounds >= 1 and drv_rounds == 0

    s_edges = [(f"doc-{a:03d}", f"doc-{b:03d}") for a, b in edges[:80]]
    s_pairs = spark.createDataFrame(s_edges, "doc_a string, doc_b string")
    sd, _ = connected_components_star(s_pairs, driver_finish_edges=0)
    sv, r0 = connected_components_star(s_pairs, driver_finish_edges=10**9)
    assert (
        {(r["doc_id"], r["cluster"]) for r in sd.collect()}
        == {(r["doc_id"], r["cluster"]) for r in sv.collect()}
        and r0 == 0
    )


def test_star_cc_driver_cap_env_selects_path(spark, monkeypatch):
    """The SPARK_GRAFT_CC_DRIVER_EDGES env knob picks the path when the
    parameter is not given: 0 forces the distributed star contraction (no
    local relation in the plan), a generous cap yields the driver-finish
    local relation. Values match either way."""
    import dshackle_archive_spark.operators.dedup as D

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(20, 21)], "doc_a long, doc_b long"
    )

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    monkeypatch.setenv(D.CC_DRIVER_EDGES_ENV, "0")
    dist, rd = D.connected_components_star(pairs)
    assert "LocalTableScan" not in plan_of(dist) and rd >= 1
    monkeypatch.setenv(D.CC_DRIVER_EDGES_ENV, "1000000")
    drv, rv = D.connected_components_star(pairs)
    assert "LocalTableScan" in plan_of(drv) and rv == 0
    monkeypatch.delenv(D.CC_DRIVER_EDGES_ENV)
    a = {(r["doc_id"], r["cluster"]) for r in dist.collect()}
    b = {(r["doc_id"], r["cluster"]) for r in drv.collect()}
    assert a == b and len(a) == 12


def test_containment_catches_fragment_jaccard_misses(spark):
    """A fragment wholly inside a long doc: containment ≈ 1, Jaccard low —
    containment_pairs flags it, jaccard_pairs at the same 0.5 bar doesn't."""
    from dshackle_archive_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingles,
    )

    long_text = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(40))
    frag = " ".join(long_text.split()[: 24])  # 20% of the long doc
    docs = spark.createDataFrame(
        [(1, long_text), (2, frag), (3, "totally unrelated words here")],
        "doc_id long, text string",
    )
    sh = shingles(docs, n=3)
    cont = {(r["doc_a"], r["doc_b"]): (r["containment_a"], r["containment_b"])
            for r in containment_pairs(sh, threshold=0.5, token_col="shingle").collect()}
    assert (1, 2) in cont
    ca, cb = cont[(1, 2)]
    assert cb == 1.0 and ca < 0.5  # fragment fully contained, source not
    jac = {(r["doc_a"], r["doc_b"]) for r in jaccard_pairs(sh, threshold=0.5, token_col="shingle").collect()}
    assert (1, 2) not in jac  # symmetric dedup misses it


def test_pq_encode_is_map_side_and_exact_on_codewords(spark, sf_dir):
    """PQ encode must not shuffle the corpus (the codebook is one broadcast
    row; every argmin is an array fold on the row), and every codebook
    vector must encode to ITSELF (distance 0 in all subspaces)."""
    from dshackle_archive_spark.operators.similarity import pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes = pq_encode(emb)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    # the ONLY exchange allowed is the broadcast of the 1-row codebook
    import re

    # allowed: the broadcast itself, and the SinglePartition fold that
    # builds the 1-row codebook (moves K=16 rows, not the corpus)
    non_broadcast = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln
        and "Broadcast" not in ln
        and "SinglePartition" not in ln
    ]
    assert not non_broadcast, non_broadcast
    by_id = {r["vec_id"]: r for r in codes.filter("vec_id < 16").collect()}
    for k in range(16):
        assert [by_id[k][f"code{m}"] for m in range(4)] == [k, k, k, k]


def test_triangle_counts_planted_shapes(spark):
    """K4 (every node in 3 triangles), a pendant vertex (in none), and a
    pure star (no triangles at all); edge direction, duplicates, and
    self-loops must not matter."""
    edges = [
        # K4 on 0-3, some edges reversed/duplicated, plus a self-loop
        (0, 1), (1, 0), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 3),
        # pendant vertex 4 hanging off node 0
        (4, 0),
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in D.triangle_counts(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    assert D.triangle_counts(star).count() == 0


def test_triangle_counts_random_graphs_match_naive(spark):
    """Property check: the degree-oriented wedge-close count equals the
    naive a<b<c three-way join on random graphs (the oracle algorithm),
    node for node."""
    import random

    rng = random.Random(20260815)
    for _trial in range(3):
        n = rng.randint(5, 15)
        m = rng.randint(5, 40)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["triangles"] for r in D.triangle_counts(e).collect()
        }
        canon = {
            (min(a, b), max(a, b)) for a, b in edges if a != b
        }
        naive: dict[int, int] = {}
        for a, b in canon:
            for c in range(n):
                if c > b and (a, c) in canon and (b, c) in canon:
                    for v in (a, b, c):
                        naive[v] = naive.get(v, 0) + 1
        assert got == naive, sorted(canon)


def test_x46_percentile_integer_input_contract(spark):
    """x46_mad_outliers uses EXACT F.percentile, whose aggregation buffer
    maps distinct values to counts — safe only while the input column is
    an integer token count (distinct values bounded by document length,
    not group size). Pin that contract: the column feeding the percentile
    must stay integral. If this fails, someone pointed the MAD audit at a
    continuous column — switch it to percentile_approx first
    (see the x46 docstring's memory invariant)."""
    from pyspark.sql import types as T

    from dshackle_archive_spark.operators.textan import token_count
    from dshackle_archive_spark.queries import registry

    df = spark.createDataFrame(
        [("a b c",), ("",), ("  x ",)], "text string"
    ).select(token_count().alias("n"))
    assert isinstance(df.schema["n"].dataType, T.IntegralType), \
        df.schema["n"].dataType
    assert [r["n"] for r in df.collect()] == [3, 0, 1]

    # and the deployed query's percentile inputs resolve to integral types
    plan = registry()["x46_mad_outliers"](
        spark, "/root/testdata/sf0.001"
    )
    # med/mad come out of percentile over ints -> exact doubles; n_docs and
    # n_outliers stay integral
    sch = {f.name: f.dataType for f in plan.schema.fields}
    assert isinstance(sch["n_docs"], T.IntegralType)
    assert isinstance(sch["n_outliers"], T.IntegralType)


def test_maybe_broadcast_gates_on_rows_and_bytes(spark):
    """Forced-broadcast guard (round-8 fix for d16 / triangle_counts):
    the hint is applied only when the MEASURED unit count clears both the
    row cap and the bytes budget; above either, the frame is returned
    UNTOUCHED (same object — plain equi-join, AQE decides), and the
    triangle/assortativity results are identical either way."""
    df = spark.createDataFrame([(i, i % 3) for i in range(10)], "a long, b long")

    hinted = D.maybe_broadcast(df, 10, 32)
    assert hinted is not df  # under both limits: hint applied

    assert D.maybe_broadcast(df, 2_000_000, 32) is df            # row cap
    assert D.maybe_broadcast(df, 900_000, 32, limit_rows=10**6,
                             limit_bytes=16 << 20) is df         # bytes cap
    # adjacency-style gating: 5M entries * 24 B ≈ 120 MB > 64 MB budget,
    # even though 5M "rows" would have passed the old row-count-only gate
    assert D.maybe_broadcast(df, 5_000_000, 24,
                             limit_rows=5_000_000) is df

    # equi-join fallback above the limit computes the same triangles
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (1, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    forced_plain = {
        r["node"]: r["triangles"]
        for r in D.triangle_counts(e, broadcast_limit_rows=0).collect()
    }
    hinted_res = {
        r["node"]: r["triangles"] for r in D.triangle_counts(e).collect()
    }
    assert forced_plain == hinted_res == {0: 3, 1: 3, 2: 3, 3: 3}  # K4


def test_top_eigenvector_matches_numpy_on_spiked_matrix(spark):
    """On a spiked spectrum (one dominant direction, λ₂/λ₁ ≈ 0.2) the
    8-round power iteration must land on numpy's leading eigenvector
    (up to sign) and its Rayleigh quotient on λ₁. Vectors are built by
    deterministic arithmetic: v_k = spike + small index-dependent
    perturbation, so the covariance has a strong first component."""
    import numpy as np

    dim = 8
    rows = []
    for k in range(120):
        base = [((k * (d + 3)) % 7 - 3) * 0.05 for d in range(dim)]
        spike = 1.0 if k % 2 == 0 else -1.0
        vec = [base[d] + spike * (1.0 if d < 2 else 0.0) for d in range(dim)]
        rows.append((k, [float(x) for x in vec]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cells = S.covariance_cells(emb, dim=dim)
    ev = {r["i"]: (r["w"], r["lam"]) for r in S.top_eigenvector(cells, iters=8).collect()}
    w = np.array([ev[i][0] for i in range(dim)])
    lam = ev[0][1]

    x = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    align = abs(float(np.dot(w, top)))
    assert align > 0.999, (align, w, top)
    assert abs(lam - float(vals[-1])) < 0.01 * float(vals[-1]), (lam, vals[-1])


_iv_lists = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 150)),
    min_size=1,
    max_size=14,
)


@given(ivs=_iv_lists)
@settings(max_examples=12, deadline=None)
def test_overlap_self_join_matches_naive_model(spark, ivs):
    """Property test: the banded overlap self-join must agree with the
    brute-force O(n²) overlap model on random keyed intervals — every
    overlapping pair exactly once (multi-band collisions deduped by the
    overlap-start band), closed-interval day counts."""
    from dshackle_archive_spark.operators.asof import overlap_self_join

    rows = [
        (i, k, s, s + ln)  # interval as day offsets from a fixed epoch
        for i, (k, s, ln) in enumerate(ivs)
    ]
    df = spark.createDataFrame(
        rows, "id long, k long, sd long, ed long"
    ).select(
        "id",
        "k",
        F.date_add(F.lit("1995-01-01").cast("date"), F.col("sd").cast("int")).alias("s"),
        F.date_add(F.lit("1995-01-01").cast("date"), F.col("ed").cast("int")).alias("e"),
    )
    got = {
        (r["k"], r["id_a"], r["id_b"]): r["overlap_days"]
        for r in overlap_self_join(
            df, key="k", id_col="id", start_col="s", end_col="e", band_days=30
        ).collect()
    }
    expect = {}
    for ia, ka, sa, ea in rows:
        for ib, kb, sb, eb in rows:
            if ka == kb and ia < ib and sa <= eb and sb <= ea:
                expect[(ka, ia, ib)] = min(ea, eb) - max(sa, sb) + 1
    assert got == expect


_series = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 40), st.integers(-50, 50)),
    min_size=1,
    max_size=16,
    unique_by=lambda t: (t[0], t[1]),
)


@given(pts=_series)
@settings(max_examples=12, deadline=None)
def test_decayed_mean_matches_direct_formula(spark, pts):
    """Property test: the two-cumulative-sums closed form must equal the
    direct Σ v·e^{−λΔ} / Σ e^{−λΔ} weighted mean at every point of a
    random daily series."""
    from dshackle_archive_spark.operators.timeseries import decayed_mean

    df = spark.createDataFrame(
        pts, "k long, dd long, v long"
    ).select(
        "k",
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("dd").cast("int")).alias("d"),
        F.col("v").cast("double").alias("v"),
    )
    out = {
        (r["k"], str(r["d"])): r["decayed_mean"]
        for r in decayed_mean(df, "k", "d", "v", half_life_days=7.0).collect()
    }
    lam = math.log(2.0) / 7.0
    for k, dd, _v in pts:
        prior = [(d2, v2) for (k2, d2, v2) in pts if k2 == k and d2 <= dd]
        num = sum(v2 * math.exp(-lam * (dd - d2)) for d2, v2 in prior)
        den = sum(math.exp(-lam * (dd - d2)) for d2, v2 in prior)
        import datetime

        day = str(datetime.date(2024, 1, 1) + datetime.timedelta(days=dd))
        assert abs(out[(k, day)] - num / den) < 1e-6, (k, dd, out[(k, day)])


def test_cluster_quality_planted_clusters(spark):
    """Four tight planted clusters: every member lands in its seed's cell,
    scatter stays near zero, and the DB component against a brute-force
    numpy replay of the same rounding discipline."""
    import numpy as np

    from dshackle_archive_spark.operators.similarity import cluster_quality

    rng = np.random.default_rng(7)
    centers = np.eye(4, dtype=np.float64)  # orthogonal → far-apart seeds
    vecs = []
    # ids 0..3 are the seeds themselves (one per axis)
    for i in range(4):
        vecs.append((i, centers[i].tolist()))
    vid = 4
    for i in range(4):
        for _ in range(5):
            v = centers[i] + rng.normal(0, 0.02, 4)
            vecs.append((vid, v.tolist()))
            vid += 1
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    rows = {r["cell_id"]: r for r in cluster_quality(df, n_cells=4).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r["n"] for r in rows.values()) == len(vecs)
    for r in rows.values():
        assert r["n"] == 6  # seed + its 5 planted members
        assert 0.0 <= r["scatter"] < 0.01
        assert r["db_component"] > 0

    # brute-force replay with the same round-6 discipline
    arr = {i: np.array(v) for i, v in vecs}
    sims = {}
    for i, v in arr.items():
        for c in range(4):
            s = arr[c]
            sims[(i, c)] = round(
                float(v @ s / (np.linalg.norm(v) * np.linalg.norm(s))), 6
            )
    assign = {
        i: max(range(4), key=lambda c: (sims[(i, c)], -c)) for i in arr
    }
    scatters = {}
    for c in range(4):
        members = [i for i, cc in assign.items() if cc == c]
        # replay the DECIMAL-grid discipline: exact integer micro-units,
        # then the same two correctly-rounded divisions the engines run
        micros = sum(int(round((1.0 - sims[(i, c)]) * 1e6)) for i in members)
        scatters[c] = (micros / 1e6) / len(members)
        assert abs(rows[c]["scatter"] - scatters[c]) < 1e-12
    for c in range(4):
        db = max(
            (scatters[c] + scatters[o]) / (1.0 - sims[(c, o)])
            for o in range(4)
            if o != c and sims[(c, o)] < 1.0
        )
        assert abs(rows[c]["db_component"] - db) < 1e-12


_conc_ivs = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 60), st.integers(0, 40)),
    min_size=1,
    max_size=14,
)


@given(ivs=_conc_ivs)
@settings(max_examples=12, deadline=None)
def test_sweep_max_concurrency_matches_naive(spark, ivs):
    """Property test: the +1/−1 sweep-line max concurrency (w8 shape)
    equals the brute-force per-day open-interval count on random keyed
    intervals."""
    from pyspark.sql import Window

    rows = [(k, s, s + ln) for (k, s, ln) in ivs]
    df = spark.createDataFrame(rows, "k long, sd long, ed long")
    ev = df.select("k", F.col("sd").alias("pos"), F.lit(1).alias("delta")).unionByName(
        df.select("k", (F.col("ed") + 1).alias("pos"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("pos", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["k"]: r["mx"]
        for r in ev.select("k", F.sum("delta").over(w).alias("level"))
        .groupBy("k")
        .agg(F.max("level").alias("mx"))
        .collect()
    }
    for k in {k for k, _, _ in rows}:
        expect = max(
            sum(1 for kk, s, e in rows if kk == k and s <= d <= e)
            for d in range(0, 102)
        )
        assert got[k] == expect, (k, got[k], expect)


def test_rolling_quantile_matches_numpy(spark, sf_dir):
    """The w9 interpolation rule (p·(count−1), linear) replayed in numpy
    over every trailing-7 frame of a fixed series must match Spark's
    percentile window output."""
    import numpy as np

    import dshackle_archive_spark.queries as Q

    df = Q.registry()["w9_rolling_quantile"](spark, sf_dir)
    rows = sorted(
        ((r["event_type"], r["day"], r["n"], r["p50_7d"], r["p90_7d"]) for r in df.collect())
    )
    series: dict[str, list[int]] = {}
    for et, day, n, p50, p90 in rows:
        series.setdefault(et, []).append(n)
        frame = series[et][-7:]
        assert abs(p50 - round(float(np.percentile(frame, 50)), 6)) < 1e-9
        assert abs(p90 - round(float(np.percentile(frame, 90)), 6)) < 1e-9


def test_covariance_cells_is_partition_bounded(spark, sf_dir):
    """covariance_cells must reduce partitions, not rows: the plan carries
    the Arrow mapInPandas partial-Gramian stage and no per-vector explode
    (the pre-rewrite nested-transform expansion evaluated interpreted —
    15.4 s at sf0.1 for 2,000 vectors)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        S.covariance_cells(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan, plan
    assert "Generate" not in plan, plan  # no explode anywhere


def test_ivf_topk_curve_slices_equal_standalone(spark, sf_dir):
    """The shared-assign curve's docstring contract: each nprobe slice is
    value-identical to a standalone ivf_topk run at that setting."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    curve = S.ivf_topk_curve(emb, queries, k=3, n_cells=16, nprobes=(1, 2, 4))
    rows = curve.collect()
    for np_ in (1, 2, 4):
        sliced = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
            for r in rows
            if r["nprobe"] == np_
        )
        standalone = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["sim"])
            for r in S.ivf_topk(
                emb, queries, k=3, n_cells=16, nprobe=np_
            ).collect()
        )
        assert sliced == standalone, np_


def test_hard_negative_topk_excludes_same_label(spark):
    """Planted geometry: vector 0's nearest neighbor overall (vector 1,
    same label) must NOT appear in its hard negatives; the top hard
    negative is the nearest CROSS-label vector (vector 2), and no
    returned row ever pairs equal labels."""
    rows = [
        (0, [1.0, 0.0, 0.0], 7),
        (1, [0.999, 0.01, 0.0], 7),   # closest, but same label -> excluded
        (2, [0.9, 0.1, 0.0], 3),      # nearest cross-label
        (3, [0.0, 1.0, 0.0], 3),
        (4, [0.0, 0.0, 1.0], 5),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = S.hard_negative_topk(
        emb, emb.filter("vec_id = 0"), k=3
    ).collect()
    assert all(r["query_label"] != r["neighbor_label"] for r in out)
    assert all(r["neighbor_id"] != 0 for r in out)
    top = next(r for r in out if r["rank"] == 1)
    assert top["neighbor_id"] == 2
    assert 1 not in {r["neighbor_id"] for r in out}


def test_key_skew_audit_gini_uniform_and_skewed(spark, tmp_path):
    """Gini sanity against the closed-form rank formula: perfectly
    uniform key frequencies -> gini 0; a planted heavy key moves gini
    and top1_share exactly as the direct O(n log n) computation says."""
    import numpy as np

    from dshackle_archive_spark.queries import registry

    # uniform: 40 orderkeys x 3 rows each (part/supp single-valued so
    # their gini is 0 too); heavy: orderkey 0 gets 60 extra rows
    rows = []
    for k in range(40):
        for _ in range(3):
            rows.append((k, 1, 1))
    rows += [(0, 1, 1)] * 60
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long"
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    out = {
        r["key_name"]: r
        for r in registry()["a21_key_skew_audit"](spark, d).collect()
    }
    ok = out["l_orderkey"]
    freqs = np.array([63] + [3] * 39)
    x = np.sort(freqs)
    n = len(x)
    gini = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (n + 1) / n
    assert ok["n_keys"] == 40 and ok["n_rows"] == 180
    assert ok["max_freq"] == 63
    assert abs(ok["top1_share"] - 63 / 180) < 1e-6
    assert abs(ok["gini"] - gini) < 1e-6
    # single-valued keys: one key owns everything -> gini -> 0 (n = 1)
    assert out["l_partkey"]["n_keys"] == 1
    assert abs(out["l_partkey"]["gini"]) < 1e-6


def test_seasonal_decomposition_additive_identity(spark, sf_dir):
    """The three components must reassemble the observation exactly
    (trend + seasonal + residual = n up to rounding dust) and the
    residual must average to ~0 within every (event_type, weekday) cell
    — the defining property of the per-dow seasonal fit."""
    from dshackle_archive_spark.queries import registry

    out = registry()["w13_seasonal_decomposition"](spark, sf_dir)
    rows = out.collect()
    assert rows, "decomposition returned no full-window rows"
    for r in rows:
        assert abs(r["trend"] + r["seasonal"] + r["residual"] - r["n"]) < 3e-6
    cell = (
        out.withColumn(
            "dow",
            F.datediff(F.col("day").cast("date"), F.lit("1970-01-01").cast("date")) % 7,
        )
        .groupBy("event_type", "dow")
        .agg(F.avg("residual").alias("mr"))
        .collect()
    )
    for r in cell:
        assert abs(r["mr"]) < 1e-4, (r["event_type"], r["dow"], r["mr"])


def test_embedding_margin_planted_geometry(spark, tmp_path):
    """Planted embeddings where the nearest positive/negative are known:
    query 0's best positive is vector 1 (same label, closer than vector
    3), its best negative is vector 2, and the margin is pos−neg."""
    from dshackle_archive_spark.queries import registry

    rows = [
        (0, [1.0, 0.0, 0.0] + [0.0] * 61, 7),
        (1, [0.999, 0.01, 0.0] + [0.0] * 61, 7),   # best positive
        (2, [0.9, 0.1, 0.0] + [0.0] * 61, 3),      # best negative
        (3, [0.5, 0.5, 0.0] + [0.0] * 61, 7),
        (4, [0.0, 1.0, 0.0] + [0.0] * 61, 3),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path)
    emb.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = {r["query_id"]: r
           for r in registry()["v17_embedding_margin"](spark, d).collect()}
    q0 = out[0]
    assert q0["pos_id"] == 1 and q0["neg_id"] == 2
    assert abs(q0["margin"] - (q0["pos_sim"] - q0["neg_sim"])) < 2e-6
    assert q0["margin"] > 0  # positive closer than any cross-label


def test_anomaly_incidents_merge_consecutive_days(spark, tmp_path):
    """A planted 3-day spike run becomes ONE incident row (not three),
    with the island's bounds, duration and peak; an isolated spike later
    becomes its own 1-day incident."""
    import datetime as dt

    from dshackle_archive_spark.queries import registry

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(30):
        # jittered baseline (flat would give sd=0 -> z NULL); the spike
        # run RISES day over day so each day clears the trailing window
        # even as the window absorbs the previous spike
        n = 10 + (day % 3) - 1
        if day == 15:
            n = 100
        elif day == 16:
            n = 300
        elif day == 17:
            n = 900
        elif day == 25:
            n = 90
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(days=day, minutes=eid % 60),
                         1, "ping", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = registry()["w14_anomaly_incidents"](spark, d).collect()
    spans = [(r["start_day"], r["end_day"], r["n_days"], r["peak_n"]) for r in out]
    assert ("2024-01-16", "2024-01-18", 3, 900) in spans, spans
    assert any(s[2] == 1 and s[3] == 90 for s in spans), spans


def test_holt_forecast_matches_direct_recursion(spark, tmp_path):
    """The HOF fold must equal the textbook sequential Holt recursion
    run in Python over the same day-ordered series."""
    import datetime as dt

    from dshackle_archive_spark.queries import registry

    counts = [10, 12, 11, 15, 14, 18, 17, 22, 21, 25]
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(days=day, seconds=eid % 50),
                         1, "ping", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")

    level, trend = float(counts[0]), 0.0
    for x in counts[1:]:
        nl = 0.5 * x + 0.5 * (level + trend)
        trend = 0.25 * (nl - level) + 0.75 * trend
        level = nl

    out = registry()["w15_holt_forecast"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == len(counts)
    assert abs(r["level"] - round(level, 6)) < 1e-9
    assert abs(r["trend"] - round(trend, 6)) < 1e-9
    assert abs(r["forecast_7d"] - round(level + 7 * trend, 6)) < 1e-9


def test_doulion_triangle_sampling(spark):
    """DOULION machinery: p=1.0 keeps everything (estimate == exact as
    doubles); p=0.5 must equal a naive Python recomputation that applies
    the SAME md5 keep-rule and 1/p³ scale — i.e. the sample is the
    deterministic hash rule, not rand()."""
    import hashlib
    import itertools

    import dshackle_archive_spark.operators.dedup as D

    # K7 complete graph: 35 triangles, every node in C(6,2)=15
    nodes = list(range(7))
    edges = [(u, v) for u, v in itertools.combinations(nodes, 2)]
    e = spark.createDataFrame(edges, "u long, v long")

    exact = {r["node"]: r["triangles"]
             for r in D.triangle_counts(e, src="u", dst="v", canonical=True).collect()}
    assert exact == {n: 15 for n in nodes}

    full = {r["node"]: r["triangles"]
            for r in D.triangle_counts(e, src="u", dst="v", canonical=True,
                                       sample_p=1.0).collect()}
    assert full == {n: 15.0 for n in nodes}

    p = 0.5

    def keep(u, v):
        h = hashlib.md5(f"tri:{u}:{v}".encode()).hexdigest()
        return int(h[:8], 16) < int(round(p * 2**32))

    kept = [(u, v) for u, v in edges if keep(u, v)]
    kept_set = set(kept)
    want = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= kept_set:
            for n in (a, b, c):
                want[n] = want.get(n, 0.0) + 1 / p**3
    got = {r["node"]: r["triangles"]
           for r in D.triangle_counts(e, src="u", dst="v", canonical=True,
                                      sample_p=p).collect()}
    assert got == want
    # determinism: a second run is identical
    got2 = {r["node"]: r["triangles"]
            for r in D.triangle_counts(e, src="u", dst="v", canonical=True,
                                       sample_p=p).collect()}
    assert got2 == got


def test_adamic_adar_planted_square_and_hub_cap(spark):
    """C4 (square): the two diagonals are the only non-edges, each with
    two degree-2 common neighbors -> AA = 2/ln 2. Adding a hub adjacent
    to every node raises all scores via 1/ln(deg hub) unless hub_cap
    excludes it — the truncation must remove exactly the hub's term."""
    import math

    square = [(0, 1), (1, 2), (2, 3), (0, 3)]
    e = spark.createDataFrame(square, "u long, v long")
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["aa_score"])
        for r in D.adamic_adar(e, canonical=False).collect()
    }
    aa = 2 / math.log(2)
    assert set(got) == {(0, 2), (1, 3)}
    for c, s in got.values():
        assert c == 2 and abs(s - aa) < 1e-9

    hub = square + [(0, 9), (1, 9), (2, 9), (3, 9)]
    eh = spark.createDataFrame(hub, "u long, v long")
    with_hub = {
        (r["u"], r["v"]): r["aa_score"]
        for r in D.adamic_adar(eh, canonical=False).collect()
    }
    # deg(0..3)=3, deg(9)=4; diagonals gain the hub term 1/ln 4
    assert abs(with_hub[(0, 2)] - (2 / math.log(3) + 1 / math.log(4))) < 1e-9
    capped = {
        (r["u"], r["v"]): r["aa_score"]
        for r in D.adamic_adar(eh, canonical=False, hub_cap=3).collect()
    }
    assert abs(capped[(0, 2)] - 2 / math.log(3)) < 1e-9


def test_adamic_adar_random_graphs_match_naive(spark):
    """Property check vs the naive Python formulation; the focus path
    must agree with the unfocused scores restricted to its watchlist."""
    import math
    import random

    rng = random.Random(20260816)
    for _trial in range(3):
        n = rng.randint(5, 12)
        m = rng.randint(4, 30)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        if not canon:
            continue
        nbrs: dict[int, set[int]] = {}
        for a, b in canon:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        naive = {}
        nodes = sorted(nbrs)
        for i, u in enumerate(nodes):
            for v in nodes[i + 1:]:
                if (u, v) in canon:
                    continue
                zs = nbrs[u] & nbrs[v]
                zs = {z for z in zs if len(nbrs[z]) >= 2}
                if zs:
                    naive[(u, v)] = (
                        len(zs), sum(1 / math.log(len(nbrs[z])) for z in zs)
                    )
        e = spark.createDataFrame(list(canon), "u long, v long")
        got = {
            (r["u"], r["v"]): (r["common_neighbors"], r["aa_score"])
            for r in D.adamic_adar(e).collect()
        }
        assert set(got) == set(naive), (sorted(canon), sorted(got), sorted(naive))
        for k, (c, s) in naive.items():
            assert got[k][0] == c and abs(got[k][1] - s) < 1e-9

        focus_nodes = nodes[:2]
        f = spark.createDataFrame([(x,) for x in focus_nodes], "node long")
        fgot = {
            (r["u"], r["v"]): (r["common_neighbors"], r["aa_score"])
            for r in D.adamic_adar(e, focus=f).collect()
        }
        expect = {}
        for (u, v), cs in naive.items():
            if u in focus_nodes:
                expect[(u, v)] = cs
            if v in focus_nodes:
                expect[(v, u)] = cs
        assert set(fgot) == set(expect)
        for k, (c, s) in expect.items():
            assert fgot[k][0] == c and abs(fgot[k][1] - s) < 1e-9


def test_changepoint_planted_level_shift(spark, tmp_path):
    """A 5->50 events/day shift after day 10 must split exactly at the
    boundary with the two segment means recovered; a CONSTANT series has
    zero gain everywhere and must tie-break to the earliest split day."""
    import datetime as dt

    from dshackle_archive_spark.queries import registry

    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for day in range(20):
        for per_day, etype in ((5 if day < 10 else 50, "shift"), (7, "flat")):
            for _ in range(per_day):
                rows.append(
                    (eid, base + dt.timedelta(days=day, minutes=eid % 120),
                     1, etype, 1.0, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["event_type"]: r for r in registry()["w16_changepoint"](spark, d).collect()}
    s = out["shift"]
    assert s["split_day"] == "2024-03-10" and s["left_days"] == 10
    assert s["left_mean"] == 5.0 and s["right_mean"] == 50.0
    # gain = total SSE (the split removes ALL variance): 20 days, mean 27.5
    assert abs(s["gain"] - (10 * 5 * 5 + 10 * 50 * 50 - 20 * 27.5 ** 2)) < 1e-6
    f = out["flat"]
    assert f["gain"] == 0.0 and f["split_day"] == "2024-03-01"
    assert f["left_mean"] == 7.0 and f["right_mean"] == 7.0


_shift_series = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 25), st.integers(0, 60)),
    min_size=2,
    max_size=24,
    unique_by=lambda t: (t[0], t[1]),
)


@given(pts=_shift_series)
@settings(max_examples=12, deadline=None)
def test_best_level_shift_matches_naive_scan(spark, pts):
    """Property test: the prefix-sum argmin must equal the brute-force
    O(n²) best-split scan (cost, split day, means, gain) on random
    integer daily series — including tie cases (all-constant, or a
    value-symmetric series where two splits cost EXACTLY the same),
    where the argmin must land on the earliest day.

    The naive model replays the operator's documented float chain
    (exact BIGINT prefix sums; per side one double multiply, one divide,
    one subtract; one final add) rather than a mean-based SSE: the two
    formulations agree to rationals but can round differently by one
    ULP, and on an exact tie that phantom ULP made a mean-based model
    prefer the LATER split while the operator (correctly, per its
    determinism contract) took the earlier day — a round-10 hypothesis
    find against the test model, not the operator."""
    import datetime as dt

    from dshackle_archive_spark.operators.timeseries import best_level_shift

    series: dict[int, list[tuple[int, int]]] = {}
    for k, dd, v in pts:
        series.setdefault(k, []).append((dd, v))
    series = {k: sorted(v) for k, v in series.items()}
    # 1-day keys stay IN the input: the documented contract is that they
    # are dropped from the output (no k < nd split exists), asserted below
    short_keys = {k for k, v in series.items() if len(v) < 2}
    rows = [
        (k, dt.date(2024, 1, 1) + dt.timedelta(days=dd), v)
        for k, pts_k in series.items()
        for dd, v in pts_k
    ]
    df = spark.createDataFrame(rows, "event_type long, d date, n long")
    got = {r["event_type"]: r for r in best_level_shift(df).collect()}
    assert set(got) == set(series) - short_keys
    for k, pts_k in series.items():
        if k in short_keys:
            continue
        xs = [v for _, v in pts_k]
        n = len(xs)
        st, st2 = sum(xs), sum(x * x for x in xs)

        def cost(i):  # the operator's exact double-op chain
            sl, sl2 = sum(xs[:i]), sum(x * x for x in xs[:i])
            left = float(sl2) - float(sl) * sl / i
            right = float(st2 - sl2) - float(st - sl) * (st - sl) / (n - i)
            return left + right

        def sse(seg):  # mean-based SSE only for the gain tolerance check
            m = sum(seg) / len(seg)
            return sum((x - m) ** 2 for x in seg)

        best = min(range(1, n), key=lambda i: (cost(i), pts_k[i - 1][0]))
        r = got[k]
        assert r["n_days"] == n and r["left_days"] == best
        expect_day = str(dt.date(2024, 1, 1) + dt.timedelta(days=pts_k[best - 1][0]))
        assert r["split_day"] == expect_day, (k, r, best)
        assert abs(r["left_mean"] - round(sum(xs[:best]) / best, 6)) < 1e-9
        assert abs(r["right_mean"] - round(sum(xs[best:]) / (n - best), 6)) < 1e-9
        assert abs(r["gain"] - (sse(xs) - sse(xs[:best]) - sse(xs[best:]))) < 1e-6


def test_kcore_peel_cascade_and_empty(spark):
    """K4 with a 3-node tail: k=2 must peel the tail via a CASCADE (each
    removal drags the next endpoint under k — one pass is not enough) and
    keep exactly the clique at degree 3; k=4 exceeds every degree and
    must return empty."""
    import dshackle_archive_spark.operators.dedup as D

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    tail = [(0, 10), (10, 11), (11, 12)]
    e = spark.createDataFrame(k4 + tail, "u long, v long")

    # both peel paths — the round-11 driver-finish hybrid (default cap
    # takes it on a graph this small) and the forced distributed peel —
    # must produce the identical (node, in-core degree) set
    for cap in (None, 0):
        core2 = {r["node"]: r["deg"]
                 for r in D.kcore(e, 2, src="u", dst="v", canonical=True,
                                  driver_finish_edges=cap).collect()}
        assert core2 == {0: 3, 1: 3, 2: 3, 3: 3}, f"cap={cap}"

        assert D.kcore(e, 4, src="u", dst="v", canonical=True,
                       driver_finish_edges=cap).count() == 0, f"cap={cap}"


def test_kcore_driver_finish_matches_distributed_on_random_graph(spark):
    """Path-equivalence on a non-trivial graph: the k-core is the UNIQUE
    maximal subgraph of min-degree >= k, so the round-11 driver-finish
    vectorized peel and the distributed semi-join peel must agree exactly
    — node set AND in-core degrees — on a deterministic pseudo-random
    graph with a real cascade (k chosen near the degree median)."""
    import dshackle_archive_spark.operators.dedup as D

    # deterministic "random" graph: 300 nodes, ~1800 multiplicative-hash
    # edges (no RNG — repo convention)
    edges = []
    x = 1
    for _ in range(1800):
        x = (x * 1103515245 + 12345) % (2**31)
        u, v = x % 300, (x // 300) % 300
        if u != v:
            edges.append((min(u, v), max(u, v)))
    e = spark.createDataFrame(sorted(set(edges)), "u long, v long")
    for k in (3, 8):
        dist = {r["node"]: r["deg"]
                for r in D.kcore(e, k, src="u", dst="v",
                                 driver_finish_edges=0).collect()}
        drv = {r["node"]: r["deg"]
               for r in D.kcore(e, k, src="u", dst="v",
                                driver_finish_edges=10**9).collect()}
        assert dist == drv, f"k={k}: paths diverge"
        assert dist and all(d >= k for d in dist.values())

    # round-11 threshold_fn hook: k derived from the peel's own round-0
    # degree table equals a fixed-k call, and the exactly-one-of contract
    # is loud
    import pytest as _pytest

    hooked = {r["node"]: r["deg"]
              for r in D.kcore(e, None, src="u", dst="v", threshold_fn=lambda
                               degs: 3).collect()}
    fixed = {r["node"]: r["deg"]
             for r in D.kcore(e, 3, src="u", dst="v").collect()}
    assert hooked == fixed
    with _pytest.raises(ValueError, match="exactly one"):
        D.kcore(e, None, src="u", dst="v")
    with _pytest.raises(ValueError, match="exactly one"):
        D.kcore(e, 3, src="u", dst="v", threshold_fn=lambda degs: 3)

    # the driver finish is node-type-generic (pd.factorize over object
    # arrays): the SAME graph with string node ids peels identically on
    # both paths and matches the long-keyed k=3 core exactly
    long_core3 = {r["node"]: r["deg"]
                  for r in D.kcore(e, 3, src="u", dst="v",
                                   driver_finish_edges=0).collect()}
    es = spark.createDataFrame(
        [(f"n{a:03d}", f"n{b:03d}") for a, b in sorted(set(edges))],
        "u string, v string",
    )
    for cap in (0, 10**9):
        got = {r["node"]: r["deg"]
               for r in D.kcore(es, 3, src="u", dst="v",
                                driver_finish_edges=cap).collect()}
        assert got == {f"n{n:03d}": d for n, d in long_core3.items()}, f"cap={cap}"


def test_theil_sen_resists_outlier_day(spark, tmp_path):
    """Planted series: 6 days of perfect +2/day growth plus one extreme
    outlier day. The Theil-Sen median slope must stay ~2 while the OLS
    slope is dragged far above it — both verified against a naive
    recomputation applying the IDENTICAL discrete-median rule."""
    import datetime as dt
    import itertools

    from dshackle_archive_spark.queries import registry

    counts = [10, 12, 14, 16, 18, 20, 100]
    days = [dt.datetime(2024, 3, 1 + i, 12, 0) for i in range(len(counts))]
    rows = [
        ("trend", days[i], float(i), "{}")
        for i, n in enumerate(counts)
        for _ in range(n)
    ]
    df = spark.createDataFrame(
        [(j, e, ts, v, p) for j, (e, ts, v, p) in enumerate(rows)],
        "event_id long, event_type string, ts timestamp, value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")

    out = registry()["w17_theil_sen_trend"](spark, d).collect()
    assert len(out) == 1
    r = out[0]

    ds = [(dt.date(2024, 3, 1 + i) - dt.date(1970, 1, 1)).days
          for i in range(len(counts))]
    slopes = sorted(
        (counts[j] - counts[i]) / (ds[j] - ds[i])
        for i, j in itertools.combinations(range(len(counts)), 2)
    )
    want_ts = slopes[(len(slopes) + 1) // 2 - 1]
    m = len(counts)
    want_ols = (m * sum(d_ * n for d_, n in zip(ds, counts))
                - sum(ds) * sum(counts)) / (m * sum(d_ * d_ for d_ in ds)
                                            - sum(ds) ** 2)
    assert r["n_days"] == m and r["n_pairs"] == len(slopes)
    assert abs(r["ts_slope"] - round(want_ts, 6)) < 1e-9
    assert abs(r["ols_slope"] - round(want_ols, 6)) < 1e-9
    # the planted outlier: OLS dragged well above the robust slope
    assert r["ols_slope"] > r["ts_slope"] + 5


def test_personalized_pagerank_locality_and_mass(spark):
    """Path graph 0-1-…-8 (symmetrized), seed {0}, 3 iterations: the
    sparse contract means ONLY the 3-hop neighborhood {0,1,2,3} gets a
    row; scores decay with hop distance WITHIN a parity class (a path is
    bipartite, so a 3-step walk piles mass on odd distances — comparing
    across parities would be wrong); and because every node has
    out-degree >= 1 the walk conserves mass (Σpr = 1 up to float)."""
    import dshackle_archive_spark.operators.dedup as D

    path = [(i, i + 1) for i in range(8)]
    edges = spark.createDataFrame(
        path + [(b, a) for a, b in path], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["pr"]
           for r in D.personalized_pagerank(edges, seeds, iters=3).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0] > got[2] > 0  # even-distance class decays outward
    assert got[1] > got[3] > 0  # odd-distance class decays outward
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_cap_pairs_per_doc_union_of_topk(spark):
    """Round-10 output cap: a pair survives iff it ranks in the top-k of
    AT LEAST ONE endpoint (union-of-top-k kNN-graph rule). Star graph:
    hub 0 with spokes 1..5 at descending sims — k=2 keeps the hub's two
    strongest spokes PLUS every other spoke's own view of the hub (each
    spoke's rank-1 neighbor IS the hub), i.e. all pairs survive; a
    spoke-spoke weak pair ranked below k on both ends is discarded."""
    from dshackle_archive_spark.operators.dedup import cap_pairs_per_doc, neighbor_rank

    rows = [(0, i, 1.0 - i / 10.0) for i in range(1, 6)]  # hub-spoke, sims .9-.5
    rows.append((4, 5, 0.05))  # weak spoke-spoke pair: rank>=2 on both ends
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long, jaccard double")

    ranked = {(r["doc_a"], r["doc_b"]): r["best_rank"]
              for r in neighbor_rank(pairs).collect()}
    # hub's view ranks spokes 1..5 at ranks 1..5; every spoke ranks the hub 1st
    assert ranked[(0, 1)] == 1 and ranked[(0, 5)] == 1
    assert ranked[(4, 5)] == 2  # best of: rank-2 at node 4, rank-2 at node 5

    kept = {(r["doc_a"], r["doc_b"])
            for r in cap_pairs_per_doc(pairs, 1).collect()}
    assert kept == {(0, i) for i in range(1, 6)}  # union keeps every hub edge
    kept2 = {(r["doc_a"], r["doc_b"])
             for r in cap_pairs_per_doc(pairs, 2).collect()}
    assert kept2 == {(0, i) for i in range(1, 6)} | {(4, 5)}


def test_jaccard_pairs_cap_optin_bounds_clique(spark):
    """max_pairs_per_doc on jaccard_pairs: a 6-doc verbatim clique emits
    15 uncapped pairs; k=1 keeps only each doc's single best neighbor
    (ties broken by id) while an unrelated organic pair is untouched."""
    from dshackle_archive_spark.operators.dedup import jaccard_pairs, shingles

    clique_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, clique_text) for i in range(6)]
        + [(10, "unique one two three four five"),
           (11, "unique one two three four five six")],
        "doc_id long, text string",
    )
    sh = shingles(docs, n=3)
    assert jaccard_pairs(sh, 0.3, "shingle").count() == 15 + 1
    capped = jaccard_pairs(sh, 0.3, "shingle", max_pairs_per_doc=1)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # all clique sims tie at 1.0 -> each doc's rank-1 neighbor is its
    # smallest-id partner (doc 0; doc 0's own rank-1 is doc 1)
    assert got == {(0, i) for i in range(1, 6)} | {(10, 11)}


def test_ktruss_drops_pendant_triangles_keeps_clique(spark):
    """K5 + a pendant triangle sharing one clique node: in the 4-truss
    (support >= 2) every K5 edge survives with support 3 (all its
    triangles are internal), while the pendant triangle's edges each
    close exactly ONE triangle and peel away — the hub-adjacent noise
    k-core cannot remove (all pendant nodes have degree 2, but a k=2
    CORE keeps them)."""
    from dshackle_archive_spark.operators.dedup import kcore, ktruss

    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    pendant = [(0, 10), (0, 11), (10, 11)]
    e = spark.createDataFrame(k5 + pendant, "u long, v long")
    got = {(r["a"], r["b"]): r["support"]
           for r in ktruss(e, 4, src="u", dst="v", canonical=True).collect()}
    assert got == {edge: 3 for edge in k5}
    # contrast: the 2-core keeps the pendant nodes the truss rejected
    core_nodes = {r["node"] for r in
                  kcore(e, 2, src="u", dst="v", canonical=True).collect()}
    assert {10, 11} <= core_nodes


def test_kcore_driver_cap_env_selects_path(spark, monkeypatch):
    """The SPARK_GRAFT_KCORE_DRIVER_EDGES env knob picks the peel path
    when the parameter is not given: 0 forces the distributed peel (plan
    ends in the degree aggregation), a generous cap yields the
    driver-finish local relation. Values match either way."""
    import dshackle_archive_spark.operators.dedup as D

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = spark.createDataFrame(k4 + [(0, 10), (10, 11)], "u long, v long")

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    monkeypatch.setenv(D.KCORE_DRIVER_EDGES_ENV, "0")
    dist = D.kcore(e, 2, src="u", dst="v")
    assert "LocalTableScan" not in plan_of(dist)
    monkeypatch.setenv(D.KCORE_DRIVER_EDGES_ENV, "1000000")
    drv = D.kcore(e, 2, src="u", dst="v")
    assert "LocalTableScan" in plan_of(drv)
    monkeypatch.delenv(D.KCORE_DRIVER_EDGES_ENV)
    a = {(r["node"], r["deg"]) for r in dist.collect()}
    b = {(r["node"], r["deg"]) for r in drv.collect()}
    assert a == b and len(a) > 0


def test_ktruss_threshold_fn_matches_fixed_k(spark):
    """The round-11 threshold_fn hook: k derived from the peel's OWN
    persisted round-0 (a, b, support) table equals a fixed-k run, the
    hook sees the full-graph support values exactly once, and the
    k/threshold_fn exclusivity is enforced. K5 + pendant triangle: round-0
    support is 3 on clique edges, 1 on pendant edges."""
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    pendant = [(0, 10), (0, 11), (10, 11)]
    e = spark.createDataFrame(k5 + pendant, "u long, v long")
    seen: list[dict] = []

    def fn(scored):
        seen.append({(r["a"], r["b"]): r["support"] for r in scored.collect()})
        return 4

    hooked = {(r["a"], r["b"]): r["support"]
              for r in D.ktruss(e, None, src="u", dst="v", canonical=True,
                                threshold_fn=fn).collect()}
    fixed = {(r["a"], r["b"]): r["support"]
             for r in D.ktruss(e, 4, src="u", dst="v", canonical=True).collect()}
    assert hooked == fixed == {edge: 3 for edge in k5}
    assert len(seen) == 1  # consulted once, on round 0 only
    assert seen[0][(0, 10)] == 1 and seen[0][(0, 1)] == 3
    with pytest.raises(ValueError):
        D.ktruss(e, 4, threshold_fn=fn)
    with pytest.raises(ValueError):
        D.ktruss(e, None)


def test_triangle_counts_include_zero_covers_all_nodes(spark):
    """include_zero=True rides the operator's own degree table: every
    node appears (triangles coalesced to 0), degrees match the plain
    with_degree output, and include_zero without with_degree raises.
    K4 + pendant chain: nodes 10, 11 close no triangles."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    e = spark.createDataFrame(k4 + [(0, 10), (10, 11)], "u long, v long")
    rows = D.triangle_counts(
        e, src="u", dst="v", canonical=True, with_degree=True, include_zero=True
    ).collect()
    got = {r["node"]: (r["triangles"], r["deg"]) for r in rows}
    assert got == {
        0: (3, 4), 1: (3, 3), 2: (3, 3), 3: (3, 3),
        10: (0, 2), 11: (0, 1),
    }
    with pytest.raises(ValueError):
        D.triangle_counts(e, src="u", dst="v", include_zero=True)


def test_triangle_close_edges_totals_match_two_pass(spark):
    """The d18 single-enumeration identity: from ONE
    triangle_close_edges pass, Σ size(common) equals the exact
    triangle total, and the per-triangle DOULION keep replay (all 3
    canonical edges pass the hash rule) equals running triangle_counts
    on the pre-sampled graph — on a pseudo-random graph where sampling
    actually drops edges."""
    import random

    rng = random.Random(11)
    edges = {tuple(sorted(rng.sample(range(40), 2))) for _ in range(260)}
    e = spark.createDataFrame(sorted(edges), "a long, b long")
    p = 0.5
    _deg, tri = D.triangle_close_edges(e)

    def keep(x, y):
        return D.doulion_keep(F.least(x, y), F.greatest(x, y), p)

    samp_cnt = F.when(
        keep(F.col("u"), F.col("v")),
        F.size(F.filter(
            F.col("common"),
            lambda c: keep(F.col("u"), c) & keep(F.col("v"), c),
        )),
    ).otherwise(F.lit(0))
    row = tri.agg(
        F.sum(F.size("common")).alias("exact"),
        F.sum(samp_cnt).alias("samp"),
    ).collect()[0]
    exact_nodes = D.triangle_counts(e, src="a", dst="b", canonical=True)
    assert row["exact"] == exact_nodes.agg(
        (F.sum("triangles") / 3).cast("long").alias("t")
    ).collect()[0]["t"] > 0
    samp_nodes = D.triangle_counts(e, src="a", dst="b", canonical=True,
                                   sample_p=p)
    two_pass = samp_nodes.agg(
        (F.sum("triangles") / F.lit(3.0)).alias("est")
    ).collect()[0]["est"]
    assert float(row["samp"]) / p**3 == two_pass
    assert 0 < row["samp"] < row["exact"]  # sampling genuinely dropped some


def test_pagerank_deg_window_and_join_paths_agree(spark, monkeypatch):
    """The round-11 single-shuffle count-window degree attach and the
    groupBy+join fallback (knob 0) yield bit-identical rounded ranks for
    both PageRank variants on a hubby graph."""
    import random

    rng = random.Random(11)
    pairs = {(rng.randrange(30), 30 + rng.randrange(8)) for _ in range(150)}
    e = spark.createDataFrame(
        sorted(pairs) + [(b, a) for a, b in sorted(pairs)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    out = {}
    for knob in ("1", "0"):
        monkeypatch.setenv(D.PR_DEG_WINDOW_ENV, knob)
        out[knob] = (
            {r["node"]: round(r["pr"], 9) for r in D.pagerank(e, iters=3).collect()},
            {
                r["node"]: round(r["pr"], 9)
                for r in D.personalized_pagerank(e, seeds, iters=3).collect()
            },
        )
    assert out["1"] == out["0"]
    assert len(out["1"][0]) == 37 and len(out["1"][1]) > 2


def test_pagerank_broadcast_and_shuffle_paths_agree(spark):
    """The round-11 maybe_broadcast hints on the rank/contribution
    vectors change the join strategy, never the values: forcing the
    shuffle fallback (broadcast_limit_rows=0) yields bit-identical
    rounded ranks on a graph with hubs, and the default path actually
    broadcasts (plan check)."""
    import random

    rng = random.Random(7)
    pairs = {(rng.randrange(30), 30 + rng.randrange(8)) for _ in range(150)}
    e = spark.createDataFrame(
        sorted(pairs) + [(b, a) for a, b in sorted(pairs)], "src long, dst long"
    )
    fast = D.pagerank(e, iters=3)
    slow = D.pagerank(e, iters=3, broadcast_limit_rows=0)
    plan_fast = fast._jdf.queryExecution().executedPlan().toString()
    plan_slow = slow._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_fast
    assert "BroadcastHashJoin" not in plan_slow
    a = {r["node"]: round(r["pr"], 9) for r in fast.collect()}
    b = {r["node"]: round(r["pr"], 9) for r in slow.collect()}
    assert a == b and len(a) == 38


def test_triangle_close_edges_pendant_pruning_is_lossless(spark):
    """Round-12 internals: degree-1 endpoints are pruned from the
    orientation join before the adjacency build (an edge with a degree-1
    endpoint can close no triangle). The enumeration must be IDENTICAL to
    running on the graph with those edges physically removed, the full
    per-node counts must match the naive formulation, and the returned
    degree table must still cover the pendant (degree-1) nodes."""
    import itertools
    import random

    rng = random.Random(23)
    core = {tuple(sorted(rng.sample(range(20), 2))) for _ in range(70)}
    # hang pendant leaves off core nodes: ids 100+ appear in exactly 1 edge
    pendants = {(n, 100 + i) for i, n in enumerate(range(0, 20, 2))}
    edges = sorted(core | pendants)
    e = spark.createDataFrame(edges, "a long, b long")
    deg, tri = D.triangle_close_edges(e)
    # degree table covers EVERY node, including the degree-1 leaves
    got_deg = {r["node"]: r["deg"] for r in deg.collect()}
    want_deg: dict[int, int] = {}
    for a, b in edges:
        want_deg[a] = want_deg.get(a, 0) + 1
        want_deg[b] = want_deg.get(b, 0) + 1
    assert got_deg == want_deg
    assert any(v == 1 for v in got_deg.values())  # pendants really exist
    # naive per-edge closing counts over the FULL graph
    eset = set(edges)
    naive = {
        (x, y): sum(
            1
            for z in range(120)
            if tuple(sorted((x, z))) in eset and tuple(sorted((y, z))) in eset
        )
        for x, y in edges
    }
    naive_total = sum(naive.values()) // 3
    got_rows = tri.collect()
    got_total = sum(len(r["common"]) for r in got_rows)
    assert got_total == naive_total > 0
    # per-node counts match the naive count (pendants close nothing)
    got_nodes = {
        r["node"]: r["triangles"]
        for r in D.triangle_counts(e, src="a", dst="b", canonical=True).collect()
    }
    want_nodes: dict[int, int] = {}
    for (x, y, z) in itertools.combinations(sorted(want_deg), 3):
        if (
            tuple(sorted((x, y))) in eset
            and tuple(sorted((x, z))) in eset
            and tuple(sorted((y, z))) in eset
        ):
            for n in (x, y, z):
                want_nodes[n] = want_nodes.get(n, 0) + 1
    assert got_nodes == want_nodes


def test_ivf_assign_keep_columns_ride_the_projection(spark, sf_dir):
    """Round-12 internals (semantic_dedup shuffle removal): ``keep=``
    carries input columns through the map-side assign — same cell ids as
    the bare call, the kept column intact, and still zero shuffle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bare = {r["vec_id"]: r["cell_id"] for r in S.ivf_assign(emb, 16).collect()}
    kept = S.ivf_assign(emb, 16, keep=("embedding",))
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan
    rows = kept.collect()
    assert {r["vec_id"]: r["cell_id"] for r in rows} == bare
    want_emb = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    assert all(list(r["embedding"]) == want_emb[r["vec_id"]] for r in rows)
