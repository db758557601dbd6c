"""Registry-wide invariants that keep future queries driver-safe:
column names must be clean aliases (the driver sorts/hash-compares by name),
every query needs an oracle or a documented rows-only reason, and plans must
build without an action."""

import re

import __spark_entry__ as entrymod

# every registry query now carries a full value-level oracle (the LSH
# hyperplane hash and the multimodal feature stage are deterministic, so
# even those replay in SQL) — keep this set empty
ROWS_ONLY_ALLOWED: set[str] = set()


def test_every_query_has_oracle_or_is_allowed_rows_only():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q
    assert q - o == ROWS_ONLY_ALLOWED


def test_query_columns_are_clean_aliases(spark, sf_dir):
    bad = {}
    for name, fn in entrymod.queries().items():
        cols = fn(spark, sf_dir).columns  # plan build only, no action
        ugly = [c for c in cols if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c)]
        if ugly:
            bad[name] = ugly
    assert not bad, f"unaliased computed columns: {bad}"


def test_key_prefixes_map_to_survey_sections():
    valid = re.compile(r"^(s|p|j|a|w|c|e|h|t|d|x|v|m)\d+[a-z]?_")
    for name in entrymod.queries():
        assert valid.match(name), name


# Queries allowed to contain a BroadcastNestedLoopJoin. Two legitimate
# shapes only — both have a provably SMALL broadcast side, so the nested
# loop is O(N·small), never O(N²):
# 1. 1-row aggregate bounds folded back into the plan (global total / max /
#    corpus size / domain bound) — the correct alternative to a driver
#    collect;
# 2. non-equi joins against a bounded broadcast side (interval-overlap
#    against the chunk list, ≠-self joins against a handful of query
#    vectors, seed/probe lookups of K centroids).
ONE_ROW_BOUND_QUERIES = {
    "a3_gap_detection",
    "h11_important_parts",
    "h15_top_supplier",
    "h22_idle_rich_customers",
    "x11_tfidf_top_terms",
    "x13_mixture_plan",
    "x26_source_kl_drift",  # corpus token total rides in as a 1-row broadcast
    "x28_pmi_collocations",  # corpus unigram/bigram totals as 1-row broadcasts
    "x31_bigram_perplexity",  # vocabulary size V as a 1-row broadcast
    "x35_perplexity_terciles",  # reuses x31's scoring plan (same V broadcast)
    "x36_kneser_ney_scores",  # bigram-type total N1+(·,·) as a 1-row broadcast
    "x37_bm25_ranking",  # n_docs/avgdl corpus stats as a 1-row broadcast
    "d11_pagerank",  # node count N as a 1-row broadcast (per iteration)
    "v12_embedding_covariance",  # vector count n as a 1-row broadcast
    "v13_top_eigenvector",  # matvec norms + λ as 1-row broadcasts
    "x40_priority_sample",  # threshold τ (21st priority) as a 1-row broadcast
    "a20_bloom_filter_fpr",  # filter/member/probe stats as 1-row broadcasts
    "x44_burstiness",  # corpus doc count as a 1-row broadcast (x11 shape)
    "p11_json_schema_profile",  # event total as a 1-row broadcast
    "d16_degree_assortativity",  # node/edge/corr scalars as 1-row broadcasts
    "d18_triangle_sample_audit",  # exact/estimate/edge totals as 1-row broadcasts
}
SMALL_NONEQUI_BROADCAST_QUERIES = {
    "j7_range_chunk_assignment",  # files × chunk intervals (chunks tiny)
    "v1_cosine_topk",  # corpus × 5 broadcast query vectors (≠ condition)
    "v3_ivf_topk",  # seed row + probe lookups (K=16 rows)
    "v4_ivf_trained",  # centroid row broadcast per Lloyd iteration
    "v6_reranked_topk",  # corpus × 5 broadcast query vectors (≠ condition)
    "v8_pq_topk",  # codebook row + corpus codes × 5 broadcast ADC tables
    "x29_hybrid_rrf_retrieval",  # cosine side: corpus × 3 broadcast queries
    "d10_semantic_dedup",  # IVF seed row broadcast (K=16) for the assign stage
    "v9_matryoshka_recall",  # corpus × 5 broadcast query vectors (≠ condition)
    "v10_ivf_pq_topk",  # seed row + codebook row + 5-row ADC tables, all broadcast
    "v11_range_search",  # corpus × 5 broadcast query vectors (≠ condition)
    "v14_cluster_quality",  # seed-row assign + K×K seed-separation grid
    "v15_recall_curve",  # v1 exact side + 3× v3 seed-row probes, all broadcast
    "x47_ndcg_audit",  # v1 exact side + v3 seed-row probe (same shapes)
    "v16_hard_negatives",  # corpus × 8 broadcast query vectors (label ≠ condition)
    "v17_embedding_margin",  # corpus × 8 broadcast query vectors (id ≠ condition)
}
BNLJ_ALLOWED = ONE_ROW_BOUND_QUERIES | SMALL_NONEQUI_BROADCAST_QUERIES


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """No registry query may plan a CartesianProduct, and only the 1-row-
    bound queries may plan a BroadcastNestedLoopJoin. Guards every future
    query against the O(N²) scale-killer."""
    cartesian, bnlj = {}, {}
    for name, fn in entrymod.queries().items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            cartesian[name] = True
        n = plan.count("BroadcastNestedLoopJoin")
        if n and name not in BNLJ_ALLOWED:
            bnlj[name] = n
    assert not cartesian, f"cartesian products: {sorted(cartesian)}"
    assert not bnlj, f"unexpected nested-loop joins: {bnlj}"
