"""Document deduplication operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): exact dedup, MinHash+LSH
near-dup, SimHash, and token-set Jaccard — all as declarative DataFrame plans
over a ``documents(doc_id, text, ...)`` table.

Portability note: every hash used in a *correctness-checked* path is derived
from ``md5`` hex strings (identical in Spark and DuckDB) rather than engine
hashes (``xxhash64``/``hash`` differ between engines). Spark's built-ins stay
JVM-side either way — no Python UDFs anywhere here.

Scale design
------------
- exact dedup: one shuffle on the content hash; at 100 TB hash first, never
  group raw text.
- MinHash/LSH: per-doc signatures via tokenize→explode→groupBy(doc) min-hash
  aggregation (shuffle on doc_id, combiner-friendly); candidate pairs come
  from equi-joins on (band_id, band_hash) buckets — never an all-pairs
  product. Verification joins only within buckets.
- token Jaccard: candidate pairs restricted to docs sharing ≥1 token (equi
  join on token), then intersection/union counts by pair — shuffles scale
  with the posting lists, mitigated by dropping ultra-common tokens (df cap).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..core.checkpoint import checkpoint_with_release, reliable_checkpoint
from ..core.env import env_int

TRI_CLOSE_SPREAD_ENV = "SPARK_GRAFT_TRI_CLOSE_SPREAD"
"""0 disables the broadcast-path close repartition in
:func:`triangle_close_edges` (A/B dial; default on)."""

PR_DEG_WINDOW_ENV = "SPARK_GRAFT_PR_DEG_WINDOW"
"""0 switches the PageRank out-degree attach back to groupBy+join
(A/B dial; default on = single-shuffle count window)."""


def _attach_out_degree(e: DataFrame) -> DataFrame:
    """``(src, dst) -> (src, dst, deg)`` with deg = out-degree of src.

    Default path: ONE hash shuffle by src + a count window over the
    partition — the edge list is scanned once. The groupBy+equi-join
    alternative (knob 0) scans the edge lineage twice and shuffles three
    times (deg agg, join left, join right). Skew class is identical:
    either way every edge row of a hub src lands in one task (the join
    shuffle hashes src too), so the window buys strictly fewer passes."""
    if env_int(PR_DEG_WINDOW_ENV, 1):
        w = Window.partitionBy("src")
        return e.withColumn("deg", F.count("*").over(w).cast("double"))
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    return e.join(deg, "src")


def normalized_text(col: str = "text") -> Column:
    """Lowercase, collapse whitespace — the canonical form for hashing."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def content_hash(col: str = "text") -> Column:
    return F.md5(normalized_text(col))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: content hash -> n copies + canonical (min) id."""
    return (
        docs.select(F.col(id_col), content_hash(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("keep_id"))
    )


def distinct_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one doc per content hash (the min id), dropping exact dups."""
    w = Window.partitionBy(content_hash(text_col)).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    )


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, token) pairs from whitespace tokenization."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(normalized_text(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


def shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct word n-gram shingles per doc (arrays built JVM-side).

    Plan shape: tokenize ONCE into a materialized array column, explode a
    cheap integer position sequence, then build each shingle by direct
    ``try_element_at`` indexing — every expression codegen-capable. The
    ``transform``+``slice`` higher-order build this replaced measured 14×
    slower at sf0.1 (3.4 s vs 0.25 s): HOF lambdas evaluate interpreted,
    outside whole-stage codegen, and allocate a slice per position.
    (Plain ``explode(split(...))`` is NOT affected — a generator's child
    evaluates once per input row; the lambda was the cost, not the
    explode.) Out-of-range ``try_element_at`` yields NULL and
    ``concat_ws`` skips NULLs, so docs shorter than ``n`` tokens produce
    one partial shingle — same contract as before.
    (``try_element_at``, not ``element_at`` — the latter throws under ANSI
    semantics when a position runs past the array.)"""
    toks = F.split(normalized_text(text_col), " ")
    built = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
    positions = built.select(
        "doc_id",
        "_t",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.size("_t") - n, F.lit(0)))
        ).alias("_i"),
    )
    shingle = F.concat_ws(
        " ", *[F.try_element_at("_t", F.col("_i") + k + 1) for k in range(n)]
    )
    return (
        positions.select("doc_id", shingle.alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def minhash_signatures(
    doc_tokens: DataFrame,
    num_hashes: int = 16,
    token_col: str = "shingle",
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min(md5(i || token)).

    md5-hex min is a valid permutation-min under lexicographic order and is
    engine-portable. One groupBy(doc_id) with min-combiners; signature is an
    array column."""
    sig = F.array(
        *[
            F.min(F.md5(F.concat(F.lit(f"h{i}:"), F.col(token_col)))).alias(f"m{i}")
            for i in range(num_hashes)
        ]
    )
    return doc_tokens.groupBy("doc_id").agg(sig.alias("signature"))


def band_rows(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH band rows ``(doc_id, band_id, band_hash)`` — the joinable (and
    persistable) form of a signature: equal ``(band_id, band_hash)`` ⇒
    candidate pair. Persisted by ``curate`` as the corpus's near-dup INDEX
    so an incremental batch can probe the prior corpus without rescanning
    it."""
    assert bands * rows_per_band <= 64
    bands_col = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return signatures.select("doc_id", F.explode(bands_col).alias("band")).select(
        "doc_id", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become candidates.

    Output: (doc_a, doc_b) with doc_a < doc_b, distinct across bands. The
    join key is (band_id, band_hash) — an equi join Catalyst hash-partitions;
    no cartesian anywhere."""
    banded = band_rows(signatures, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def neighbor_rank(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    score: str = "jaccard",
) -> DataFrame:
    """Per-pair BEST endpoint rank over a symmetric near-dup pair set:
    rank each pair inside both endpoints' neighbor lists (score desc,
    neighbor id asc — a total order) and keep the smaller of the two
    ranks as ``best_rank``. A pair with ``best_rank <= k`` is in at least
    one endpoint's k strongest neighbors — the standard kNN-graph
    membership rule (union-of-top-k, so the sparsified graph never
    orphans a document that IS someone's nearest neighbor).

    Cost: ONE pass over the pair set — an explode to the two directed
    views (the naive union-of-two-selects + join-back shape evaluates the
    whole upstream pair plan THREE times; on a posting-list join that
    triples the dominant cost), one row_number window per endpoint, one
    groupBy back to the canonical pair — all shuffles on doc ids, never
    on payloads; output is exactly the input pair set plus one int."""
    others = [c for c in pairs.columns if c not in (id_a, id_b)]
    directed = pairs.select(
        "*",
        F.explode(
            F.array(
                F.struct(F.col(id_a).alias("s"), F.col(id_b).alias("d")),
                F.struct(F.col(id_b).alias("s"), F.col(id_a).alias("d")),
            )
        ).alias("_e"),
    )
    w = Window.partitionBy("_e.s").orderBy(F.desc(score), F.asc("_e.d"))
    ranked = directed.withColumn("_r", F.row_number().over(w))
    # both directed rows of a pair carry identical payload -> any_value
    return (
        ranked.groupBy(id_a, id_b)
        .agg(
            F.min("_r").alias("best_rank"),
            *[F.any_value(c).alias(c) for c in others],
        )
        .select(*pairs.columns, "best_rank")
    )


def cap_pairs_per_doc(
    pairs: DataFrame,
    max_pairs_per_doc: int,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    score: str = "jaccard",
) -> DataFrame:
    """Output-cap dial for the pair-emitting near-dup family (round-10
    task 7): keep only pairs ranking in the top ``max_pairs_per_doc``
    neighbors of at least one endpoint.

    Why: the pair stage of d4/d10-style near-dup is OUTPUT-bound — correct
    plans, but a pathological duplication spike (one passage copied into M
    documents) emits Θ(M²) pairs and the downstream shuffle becomes the
    100 TB bottleneck no matter how good the candidate generation is. The
    cap bounds output at ≤ 2·k·N pairs unconditionally (the v2/cosine_topk
    shape applied to a pair graph). OPT-IN because it changes semantics:
    discarded pairs can merge clusters in a later connected-components
    pass; run the ``d21_neardup_cap_audit``-style audit to see what a k
    would discard before enabling it."""
    capped = neighbor_rank(pairs, id_a, id_b, score).filter(
        F.col("best_rank") <= max_pairs_per_doc
    )
    return capped.drop("best_rank")


def jaccard_pairs(
    doc_tokens: DataFrame,
    threshold: float = 0.6,
    token_col: str = "token",
    max_token_df: int | None = 1000,
    max_pairs_per_doc: int | None = None,
) -> DataFrame:
    """Token-set Jaccard over candidate pairs sharing ≥1 token.

    ``max_token_df`` drops tokens appearing in more than N docs (stop-token
    cap) — the standard posting-list pruning that keeps the candidate join
    sub-quadratic at scale. Default ON (1000): one hot token across M docs
    would otherwise contribute M²/2 candidate pairs; pass ``None`` only when
    exact set semantics over stop-tokens genuinely matter.

    ``max_pairs_per_doc`` (opt-in, default off) additionally caps the OUTPUT
    at each doc's top-k strongest neighbors via :func:`cap_pairs_per_doc` —
    the dial for duplication-spike corpora where even df-capped posting
    lists emit quadratic pair volume."""
    toks = doc_tokens.select("doc_id", F.col(token_col).alias("token"))
    if max_token_df is not None:
        rare = (
            toks.groupBy("token").agg(F.count("*").alias("df")).filter(F.col("df") <= max_token_df)
        )
        toks = toks.join(rare.select("token"), "token", "left_semi")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tokens").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tokens").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
    )
    if max_pairs_per_doc is not None:
        out = cap_pairs_per_doc(out, max_pairs_per_doc)
    return out


def containment_pairs(
    doc_tokens: DataFrame,
    threshold: float = 0.5,
    token_col: str = "token",
    max_token_df: int | None = 1000,
) -> DataFrame:
    """ASYMMETRIC near-dup: shingle-set containment |A∩B| / |A| per ordered
    candidate pair — the sub-document duplication detector (a short doc
    whose content lives inside a long one scores containment ≈ 1 while its
    Jaccard ≈ |A|/|B| stays low, so symmetric dedup never sees it; this is
    the standard quote/boilerplate/excerpt sweep in corpus curation).

    Same posting-list shape and ``max_token_df`` cap as ``jaccard_pairs``
    (sub-quadratic candidate join, no cartesian); keeps (doc_a < doc_b)
    pairs where EITHER direction's containment clears ``threshold`` and
    reports both directions."""
    toks = doc_tokens.select("doc_id", F.col(token_col).alias("token"))
    if max_token_df is not None:
        rare = (
            toks.groupBy("token").agg(F.count("*").alias("df")).filter(F.col("df") <= max_token_df)
        )
        toks = toks.join(rare.select("token"), "token", "left_semi")
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tokens").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tokens").alias("n_b"))
    ca = F.col("n_inter") / F.col("n_a")
    cb = F.col("n_inter") / F.col("n_b")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.greatest(ca, cb) >= threshold)
        .select(
            "doc_a", "doc_b", "n_inter", "n_a", "n_b",
            F.round(ca, 6).alias("containment_a"),
            F.round(cb, 6).alias("containment_b"),
        )
    )


def simhash64(doc_tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """64-bit SimHash per doc from md5-derived token bits.

    Each token contributes ±1 per bit position; the signature bit is the sign
    of the sum. Bits come from the first 16 hex chars of md5(token) — JVM-side
    ``conv`` + bit ops, engine-portable."""
    # bit i of the 64-bit hash = bit (i mod 4) of md5 hex digit (i div 4) —
    # stays in small-int arithmetic, no 2^63 literals
    md5c = F.md5(F.col(token_col))
    digits = [
        F.conv(F.substring(md5c, d + 1, 1), 16, 10).cast("int").alias(f"d{d}")
        for d in range(16)
    ]
    tagged = doc_tokens.select("doc_id", *digits)

    def bit(i: int) -> F.Column:
        return (F.floor(F.col(f"d{i // 4}") / (2 ** (i % 4))) % 2).cast("int")

    bit_sums = tagged.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bit(i) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sig = sum(
        (F.when(F.col(f"b{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0)) for i in range(32)),
        F.lit(0),
    ).cast("long")
    sig_hi = sum(
        (F.when(F.col(f"b{i+32}") > 0, F.lit(2 ** i)).otherwise(F.lit(0)) for i in range(32)),
        F.lit(0),
    ).cast("long")
    return bit_sums.select(
        "doc_id", sig.alias("simhash_lo"), sig_hi.alias("simhash_hi")
    )


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance over (hi, lo) 32-bit halves.

    Blocking: exact match on one half (a doc pair within ``max_hamming`` ≤ 3
    of 64 bits almost always agrees exactly on one 32-bit half) — turns the
    pair search into two equi joins instead of a cartesian."""
    def ham(a: Column, b: Column) -> Column:
        return F.bit_count(a.bitwiseXOR(b))

    out = []
    for half in ("simhash_lo", "simhash_hi"):
        a = sim.alias("a")
        b = sim.alias("b")
        pairs = a.join(
            b,
            (F.col(f"a.{half}") == F.col(f"b.{half}")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                ham(F.col("a.simhash_lo"), F.col("b.simhash_lo"))
                + ham(F.col("a.simhash_hi"), F.col("b.simhash_hi"))
            ).alias("hamming"),
        )
        out.append(pairs)
    return out[0].unionByName(out[1]).distinct().filter(F.col("hamming") <= max_hamming)


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup clusters: min-label propagation over the candidate-pair
    graph → ``(doc_id, cluster)`` where ``cluster`` = min doc_id reachable.

    The step after pair generation in every large-scale dedup pipeline:
    pairs chain (A~B, B~C ⇒ {A,B,C} is one duplicate group), so keep-one
    dedup must operate on components, not pairs.

    Scale design: each round is ONE equi-join shuffle (neighbor min) plus a
    metadata-cheap merge; rounds = graph diameter. LSH near-dup graphs are
    clique-ish (diameter 2-3), so convergence is a handful of rounds. Labels
    are ``localCheckpoint``ed every round — iterative lineage otherwise
    grows the plan O(rounds) deep and re-optimizes ever-larger trees. For
    adversarial chain-shaped graphs swap in large-star/small-star (O(log n)
    rounds) built from the same join primitives.

    ``nodes`` (optional, one ``doc_id`` column) adds isolated vertices —
    docs with no near-dup edge become singleton clusters."""
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    verts = edges.select(F.col("src").alias("node")).distinct()
    if nodes is not None:
        verts = verts.unionByName(nodes.select(F.col("doc_id").alias("node"))).distinct()
    labels = verts.withColumn("label", F.col("node"))
    # convergence probe: labels only ever DECREASE (least(old, nbr-min)), so
    # Σlabel is monotone non-increasing and stalls exactly at the fixpoint —
    # one cheap single-stage agg over the checkpointed frame per round
    # instead of a self-join diff (decimal(38,0) so 10⁸ nodes × 64-bit ids
    # cannot overflow the probe)
    prev_sum = None
    release_labels = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("dst", "node")
        )
        new_labels = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        # truncate lineage; round i's pinned blocks are released as soon as
        # round i+1 is materialized (checkpoint_with_release — an N-round
        # run must not hold N copies of the label table)
        new_labels, release_new = checkpoint_with_release(new_labels)
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        if release_labels is not None:
            release_labels()
        labels, release_labels = new_labels, release_new
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster"))


CC_DRIVER_EDGES_ENV = "SPARK_GRAFT_CC_DRIVER_EDGES"
CC_DRIVER_EDGES_DEFAULT = 16_000_000  # ≈256 MB of (long, long) pairs


def _cc_driver_finish(edges_df: DataFrame) -> DataFrame:
    """Finish connected components driver-side in one vectorized pass over
    a small canonical edge set (the d19 k-core precedent: each star round
    is two grouped shuffles + a checkpoint + a convergence probe of fixed
    ~0.5 s scheduling latency, which dwarfs the actual label work once the
    edge set is driver-manageable). Exact, not approximate: the component
    labeling ``cluster = min(node id in component)`` is unique, so any
    correct algorithm yields the identical output.

    Implementation: Arrow-collect the edges, ``pd.factorize(sort=True)``
    so code order == node-id order (min code IS min id — valid for longs
    and for strings, where numpy/pandas code-point comparison agrees with
    Spark's UTF8 binary ordering), then alternate vectorized edge
    relaxation (``np.minimum.at`` both directions) with pointer jumping
    (``labels[labels]``) until a fixpoint — O(E) per pass, O(log n)
    passes. Returns ``(doc_id, cluster)`` for every edge endpoint as a
    local relation; isolated-node handling stays with the caller."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    spark = edges_df.sparkSession
    node_type = edges_df.schema[0].dataType
    out_schema = StructType(
        [StructField("doc_id", node_type), StructField("cluster", node_type)]
    )
    pdf = edges_df.toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], out_schema)
    a, b = pdf.columns[0], pdf.columns[1]
    both = np.concatenate([pdf[a].to_numpy(), pdf[b].to_numpy()])
    codes, nodes_arr = pd.factorize(both, sort=True)
    nodes_arr = np.asarray(nodes_arr)
    m = len(pdf)
    n = len(nodes_arr)
    codes = codes.astype(np.int64)
    su, sv = codes[:m], codes[m:]
    labels = np.arange(n, dtype=np.int64)
    while True:
        prev = labels.copy()
        lu, lv = labels[su], labels[sv]
        np.minimum.at(labels, su, lv)
        np.minimum.at(labels, sv, lu)
        while True:  # pointer-jump the hop map to ITS fixpoint
            hopped = labels[labels]
            if np.array_equal(hopped, labels):
                break
            labels = hopped
        if np.array_equal(labels, prev):
            break
    out = pd.DataFrame(
        {"doc_id": nodes_arr, "cluster": nodes_arr[labels]}
    )
    return spark.createDataFrame(out, out_schema)


def connected_components_star(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 30,
    driver_finish_edges: int | None = None,
) -> tuple[DataFrame, int]:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) → ``((doc_id, cluster), rounds_run)``.

    This is the adversarial-graph upgrade over ``connected_components``:
    min-label propagation needs O(diameter) rounds, so a chain-shaped
    duplicate graph (A~B~C~…, common when boilerplate strings documents
    together) costs O(n) shuffles. Star contraction instead HALVES long
    paths every round — O(log n) rounds regardless of shape — at the price
    of two shuffles per round instead of one, so the clique-ish LSH default
    stays on min-label and this kicks in when diameter is unknown.

    One round = two grouped passes, each ONE shuffle on the node key:

    - large-star: group the symmetric edge list by ``u``; with
      ``m = min(N(u) ∪ {u})``, re-point every neighbor ``v > u`` at ``m``;
    - small-star: orient every edge ``(hi → lo)``, group by ``hi``; with
      ``m = min(N(u) ∪ {u})``, re-point ``u`` and all its kept neighbors
      at ``m``.

    Both emit strictly-smaller-target edges, so the edge set converges to
    disjoint stars centered on each component's min node; convergence =
    edge set fixpoint (probed via ``exceptAll`` + count on the
    checkpointed frames — two metadata-cheap jobs per round). Edges are
    ``localCheckpoint``ed every round to truncate iterative lineage.

    Distributed-until-small hybrid (optimization round 11, the d19 k-core
    precedent): when the canonical edge count — read from the count that
    already materializes the input checkpoint — is at most
    ``driver_finish_edges`` (default ``$SPARK_GRAFT_CC_DRIVER_EDGES`` or
    16M edges ≈ 256 MB, the size class of a broadcast dimension table;
    0 disables), the components are labeled driver-side in one exact
    vectorized pass (``_cc_driver_finish``) instead of paying ~0.5 s of
    fixed scheduling latency per star round. The labeling
    ``cluster = min(component)`` is unique, so both paths are
    value-identical (pinned by a path-equivalence test); ``rounds`` is 0
    on the driver path. At 100 TB the distributed rounds run as before —
    the knob only moves WHERE the tail of the computation finishes.
    """
    if driver_finish_edges is None:
        driver_finish_edges = env_int(CC_DRIVER_EDGES_ENV, CC_DRIVER_EDGES_DEFAULT)
    # canonical undirected edge set as (hi, lo): self-loops dropped
    e0 = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    edges = (
        e0.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .transform(reliable_checkpoint)
    )
    # non-numeric node ids (strings) are ~8x wider than a long once
    # Arrow-collected into object arrays — scale the edge-count cap so the
    # driver-memory budget it encodes holds regardless of key type
    from pyspark.sql.types import NumericType

    if not isinstance(edges.schema[0].dataType, NumericType):
        driver_finish_edges //= 8
    n_edges = edges.count()
    edges0 = edges  # the input materialization — basis for vertex recovery
    if n_edges <= driver_finish_edges:
        roots = _cc_driver_finish(edges)
        return _cc_attach_singletons(roots, edges0, nodes), 0
    rounds = 0
    release_edges = None
    for _ in range(max_iter):
        # -- large-star: symmetric neighborhoods, re-point bigger neighbors
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmin = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # -- small-star: (hi → lo) orientation, re-point u and neighbors at m
        smin = large.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        with_self = large.unionByName(
            smin.select("u", F.col("u").alias("v"))
        ).distinct()
        small = (
            with_self.join(smin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        small, release_small = checkpoint_with_release(small)
        rounds += 1
        new_n = small.count()
        # the exceptAll diff (a join-shaped job) only runs when the cheap
        # count probe is inconclusive — most non-final rounds change the
        # edge count, so the expensive probe fires ~once per run
        changed = new_n != n_edges or small.exceptAll(edges).limit(1).count() > 0
        # round i's pinned blocks are released only AFTER the exceptAll
        # probe read them; the first round's `edges` checkpoint has no
        # release handle (it is the caller-visible input materialization)
        if release_edges is not None:
            release_edges()
        edges, n_edges, release_edges = small, new_n, release_small
        if not changed:
            break
    roots = edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster"))
    return _cc_attach_singletons(roots, edges0, nodes), rounds


def _cc_attach_singletons(
    roots: DataFrame, edges0: DataFrame, nodes: DataFrame | None
) -> DataFrame:
    """Union ``roots`` with self-labeled singleton rows for every vertex it
    does not cover. Vertices are recovered from the MATERIALIZED canonical
    edge checkpoint (``edges0``) rather than the caller's raw pair lineage
    — endpoint sets are identical (canonicalization preserves endpoints,
    self-loops are dropped either way), and re-deriving them from the raw
    pairs re-ran the whole upstream pair-generation pipeline (LSH, banding)
    once more per query (guide §2.4: reuse the materialization you already
    paid for)."""
    verts = edges0.select(F.col("u").alias("doc_id")).unionByName(
        edges0.select(F.col("v").alias("doc_id"))
    )
    if nodes is not None:
        verts = verts.unionByName(nodes.select(F.col("doc_id")))
    singletons = verts.distinct().join(roots, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("cluster")
    )
    return roots.unionByName(singletons)


def cluster_representatives(
    clusters: DataFrame, corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Keep-one selection per duplicate cluster → ``(cluster, rep_doc_id,
    n_docs)``: the longest document wins, doc_id breaks ties (the usual
    keep-best-copy policy). One window over cluster — cluster cardinality
    is bounded (near-dup groups), so no skewed giant partitions."""
    joined = clusters.join(corpus.select("doc_id", text_col), "doc_id")
    w = Window.partitionBy("cluster").orderBy(
        F.length(F.col(text_col)).desc(), F.asc("doc_id")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .groupBy("cluster")
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col("doc_id"))).alias("rep_doc_id"),
            F.count("*").alias("n_docs"),
        )
    )


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    threshold: float = 0.05,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing word n-grams with
    an evaluation/benchmark set (the standard pre-training hygiene pass —
    any doc overlapping a benchmark above ``threshold`` leaks eval data).

    Plan shape for 100 TB: the benchmark side is tiny (eval suites are
    thousands of docs), so its distinct n-gram set BROADCASTS into a
    left-semi probe of the corpus n-gram stream — the corpus is touched by
    exactly one scan, the only shuffle is the per-doc hit-count groupBy
    (doc_id keyed, combiner-friendly), and no raw text ever shuffles.

    Output: one row per contaminated doc —
    ``(doc_id, n_hit, n_ngrams, contamination)`` with contamination =
    |doc ∩ benchmark n-grams| / |doc n-grams|.
    """
    corpus_sh = shingles(corpus, n=n, id_col=id_col, text_col=text_col)
    bench_sh = (
        shingles(benchmark, n=n, id_col=id_col, text_col=text_col)
        .select("shingle")
        .distinct()
    )
    # ONE pass over the corpus shingle stream: the broadcast LEFT join marks
    # benchmark hits, then a single groupBy counts totals and hits together
    # (a separate sizes/hits pair would rebuild the n-gram stream twice).
    marked = corpus_sh.join(
        F.broadcast(bench_sh.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("_hit").alias("n_hit"),
        )
        .filter(F.col("n_hit") > 0)
        # filter on the RAW ratio; round only the projected column (the x9
        # oracle filters raw — rounding first would admit ratios in
        # [threshold-5e-7, threshold) that the oracle rejects)
        .filter(F.col("n_hit") / F.col("n_ngrams") >= threshold)
        .withColumn(
            "contamination", F.round(F.col("n_hit") / F.col("n_ngrams"), 6)
        )
        .select("doc_id", "n_hit", "n_ngrams", "contamination")
    )


def jaccard_for_pairs(
    pairs: DataFrame,
    doc_tokens: DataFrame,
    threshold: float = 0.6,
    token_col: str = "shingle",
) -> DataFrame:
    """Jaccard similarity computed ONLY for the given candidate pairs.

    ``jaccard_pairs`` joins the full posting lists — correct for
    survey-style all-pairs-above-threshold queries, but its cost is
    Σ df(token)², which explodes on low-entropy corpora (a 105k-doc
    boilerplate-heavy probe OOMed: a small shared vocabulary put every
    token near its df cap → ~3·10⁹ candidate rows). When an LSH pass has
    already produced candidates, score exactly those: each pair expands
    by ONE side's token list and intersects via an equi join — cost
    |pairs|·|doc|, bounded by the LSH collision rate, independent of
    vocabulary shape."""
    toks = doc_tokens.select("doc_id", F.col(token_col).alias("_tok"))
    ta = toks.select(F.col("doc_id").alias("doc_a"), "_tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "_tok")
    # join strategies pinned: the candidate-pair side broadcasts (bounded
    # by the LSH collision rate), and the intersection join against the
    # full token stream is FORCED to shuffle — AQE's size estimate for an
    # exploded stream undershoots and it tried to broadcast the 12M-row
    # side on the 105k-doc probe (512 MB single allocation → heap death)
    inter = (
        ta.join(F.broadcast(pairs), "doc_a")
        .join(tb.hint("SHUFFLE_HASH"), ["doc_b", "_tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("_n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("_n").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
    )


def document_segments(
    docs: DataFrame,
    seg_len: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Non-overlapping ``seg_len``-token segments of every (normalized)
    document: ``(doc_id, seg_id, seg_txt, n_toks)``. Pure map-side array
    math (sequence + slice + one explode) — the shared front half of
    passage removal and of the incremental segment-df index."""
    toks = F.split(normalized_text(text_col), " ")
    n = F.size(F.col("_toks"))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(seg_len))
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .select("doc_id", "_toks", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (((F.col("s") - 1) / seg_len).cast("int")).alias("seg_id"),
            F.slice("_toks", F.col("s"), F.lit(seg_len)).alias("_sl"),
        )
        .select(
            "doc_id",
            "seg_id",
            F.concat_ws(" ", F.col("_sl")).alias("seg_txt"),
            F.size("_sl").alias("n_toks"),
        )
        .filter(F.length("seg_txt") > 0)
    )


def segment_df(
    docs: DataFrame,
    seg_len: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-segment document frequency ``(seg_hash, df)`` with seg_hash =
    md5(segment text) — the persistable form of the corpus's boilerplate
    knowledge (no raw text in the index). Rows from successive increments
    SUM: df is additive over disjoint doc sets, which is what lets an
    incremental batch strip passages by their CUMULATIVE corpus frequency
    without rescanning prior text."""
    seg = document_segments(docs, seg_len, id_col, text_col)
    return (
        seg.select("doc_id", "seg_txt")
        .distinct()
        .groupBy("seg_txt")
        .agg(F.count("*").alias("df"))
        .select(F.md5("seg_txt").alias("seg_hash"), "df")
    )


def repeated_segment_removal(
    docs: DataFrame,
    seg_len: int = 12,
    min_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    prior_segment_df: DataFrame | None = None,
) -> DataFrame:
    """Repeated-passage removal (the RefinedWeb / CCNet "exact line dedup"
    stage, adapted to fixed token segments because the synthetic corpus has
    no newlines): cut every document into non-overlapping ``seg_len``-token
    segments, count each segment's document frequency corpus-wide, strip
    segments appearing in >= ``min_df`` distinct documents, and rebuild the
    cleaned document in order. Unlike near-dup dedup (whole-doc granularity)
    this removes boilerplate passages INSIDE otherwise-unique documents.

    Returns per-doc ``(doc_id, n_segments, n_removed, kept_tokens,
    cleaned_text)`` where cleaned_text = the kept segments joined in
    segment order ('' when everything was boilerplate) — callers that only
    need an audit fingerprint hash it (the x32 registry query); the curate
    pipeline feeds it back in as the document text.

    Scale shape: segments are pure map-side array math (sequence + slice +
    one explode, as in doc chunking); document frequency is ONE
    groupBy(segment-text) with partial aggregation; the strip is ONE
    shuffle hash join back on segment text (output rows == segment rows, no
    expansion — frequent segments skew a few reducers but AQE skew-split
    handles value-heavy keys); reconstruction is one groupBy(doc) with an
    ordered in-group sort, never a window over the corpus.

    ``prior_segment_df`` (optional ``(seg_hash, df)``, the persisted
    ``segment_df`` store of previously-admitted corpus text) makes the
    strip decision CUMULATIVE: a segment is boilerplate when its batch df
    plus prior-corpus df reaches ``min_df`` — one-pass streaming
    semantics (prior docs were judged with the information available when
    THEY were admitted; the df store only grows).
    """
    seg = document_segments(docs, seg_len, id_col, text_col)
    batch_df = (
        seg.select("doc_id", "seg_txt")
        .distinct()
        .groupBy("seg_txt")
        .agg(F.count("*").alias("seg_df"))
    )
    if prior_segment_df is not None:
        prior = prior_segment_df.groupBy("seg_hash").agg(
            F.sum("df").alias("_pdf")
        )
        batch_df = (
            batch_df.withColumn("_sh", F.md5("seg_txt"))
            .join(
                prior.withColumnRenamed("seg_hash", "_sh"), "_sh", "left"
            )
            .select(
                "seg_txt",
                (
                    F.col("seg_df") + F.coalesce(F.col("_pdf"), F.lit(0))
                ).alias("seg_df"),
            )
        )
    rep = batch_df.filter(F.col("seg_df") >= min_df).select(
        "seg_txt", F.lit(1).alias("_rep")
    )
    joined = seg.join(rep, "seg_txt", "left")
    kept = F.when(F.col("_rep").isNull(), F.struct("seg_id", "seg_txt"))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum(F.when(F.col("_rep").isNotNull(), 1).otherwise(0)).alias(
                "n_removed"
            ),
            F.sum(
                F.when(F.col("_rep").isNull(), F.col("n_toks")).otherwise(0)
            ).alias("kept_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept)),
                    lambda x: x["seg_txt"],
                ),
            ).alias("cleaned_text"),
        )
    )


def duplicated_span_extents(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring duplicate SPANS (Lee et al. 2022): every length-``k``
    rolling token shingle occurring in >= ``min_docs`` distinct documents
    marks its k-token interval; overlapping/adjacent intervals merge into
    maximal spans. Returns per-document ``(doc_id, n_dup_spans,
    max_span_tokens, dup_tokens, dup_ratio)`` — the verbatim-repetition
    coverage used to cut memorization-prone documents.

    Scale shape: the rolling-shingle explode is corpus-token-scale but
    map-side (md5 of an array slice inside codegen); duplicated-shingle
    detection is ONE groupBy on the 16-byte hash with map-side partial
    agg; survivors (a small fraction) join back broadcast and the island
    merge is a per-document window — no corpus-wide window, no all-pairs.
    The shingle-hash shuffle is the same family as exact-dedup's content
    hash, with 16 bytes standing in for the text."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalized_text(text_col), " ").alias("_t"),
    )
    sh = toks.select(
        "doc_id",
        F.size("_t").alias("n_toks"),
        F.explode(
            F.when(
                F.size("_t") >= k, F.sequence(F.lit(1), F.size("_t") - k + 1)
            ).otherwise(F.array())
        ).alias("pos"),
        "_t",
    ).select(
        "doc_id",
        "n_toks",
        "pos",
        F.md5(F.concat_ws(" ", F.slice("_t", F.col("pos"), k))).alias("h"),
    )
    dup = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("h")
    )
    marked = sh.join(dup, "h").select("doc_id", "n_toks", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = marked.withColumn(
        "is_new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + k),
            1,
        ).otherwise(0),
    )
    grp = brk.withColumn("g", F.sum("is_new").over(w))
    spans = grp.groupBy("doc_id", "g").agg(
        F.any_value("n_toks").alias("n_toks"),
        (F.max("pos") - F.min("pos") + k).cast("bigint").alias("span"),
    )
    return spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.max("span").alias("max_span_tokens"),
        F.sum("span").alias("dup_tokens"),
        F.round(
            F.sum("span").cast("double") / F.any_value("n_toks"), 6
        ).alias("dup_ratio"),
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    broadcast_limit_rows: int = 1_000_000,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list →
    ``(node, pr)`` — the classic link-centrality score a web-scale
    curation pipeline uses to weight crawl sources (a page's rank feeds
    quality priors the way OPIC/harmonic centrality do in production
    crawlers). Fixed iteration count keeps the computation a pure,
    replayable dataflow.

    Scale design: per iteration ONE equi-join (ranks × out-edges) plus a
    grouped sum on the destination — the same join primitive as
    ``connected_components``; out-degrees are computed once and ride along
    the checkpointed edge table, and the node count folds in as a 1-row
    broadcast, never a driver-side constant. The rank vector and the
    per-iteration contribution table are NODE-count-scale (exactly n and
    ≤ n rows), so both sides carry a :func:`maybe_broadcast` hint gated on
    the measured vertex count (the checkpointed ``verts`` table) — under
    the budget every iteration streams the checkpointed edge table past a
    broadcast rank vector with zero edge shuffles (the SMJ cascade a
    stats-free ExistingRDD scan otherwise forces); above it the joins are
    plain equi-joins AQE plans from runtime stats. Dangling mass: callers
    that pass graphs with sink nodes should pre-symmetrize (as the d11
    registry query does) or accept rank leakage — the uniform teleport
    term keeps the recursion well-defined either way."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # NOTE (r11 negative result): checkpointing the degree table first and
    # broadcasting it into this eager build measured 1.4-2.3x SLOWER at
    # sf0.1 (alternated A/B) — the extra checkpoint materialization + count
    # job cost more than the one-off SMJ it removed. The shipped fix is
    # _attach_out_degree's count window: same skew class, one shuffle.
    ed = _attach_out_degree(e).transform(reliable_checkpoint)
    verts = ed.select(F.col("src").alias("node")).unionByName(
        ed.select(F.col("dst").alias("node"))
    ).distinct().transform(reliable_checkpoint)
    n_nodes = verts.count()  # measured on the materialized checkpoint
    nn = verts.groupBy().agg(F.count("*").cast("double").alias("n"))
    ranks = verts.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(iters):
        r = maybe_broadcast(ranks, n_nodes, 24, limit_rows=broadcast_limit_rows)
        contrib = (
            r.join(ed, r["node"] == ed["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            verts.join(
                maybe_broadcast(
                    contrib, n_nodes, 24, limit_rows=broadcast_limit_rows
                ),
                "node",
                "left",
            )
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
                ).alias("pr"),
            )
        )
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized PageRank — random walk with restart to a SEED set
    (Haveliwala, WWW'02; Jeh & Widom's rooted PageRank): the teleport
    mass returns to the seeds instead of spreading uniformly, so scores
    measure proximity TO the watchlist rather than global centrality.
    This is the standard graph-expansion primitive for "grow this seed
    set" curation moves: start from known-good (or known-bad) documents
    in a similarity/co-occurrence graph and rank everything by walk
    proximity. Returns sparse ``(node, pr)`` — only nodes reached by the
    walk appear.

    Scale design mirrors :func:`pagerank` (one equi-join shuffle + one
    grouped sum per iteration on the checkpointed out-degree edge table),
    with one structural improvement the personalized form makes possible:
    the rank vector stays SPARSE. A global-teleport PageRank must carry
    every vertex every round (the uniform restart term touches all n);
    here nodes with zero restart and zero in-mass never materialize a
    row, so K seeds cost at most the iters-hop neighborhood of the seed
    set — corpus-independent for bounded iters on bounded-degree graphs.
    Initial vector = the restart vector (all mass on seeds), the RWR
    convention."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # see pagerank(): deg-broadcast into this eager build is a measured
    # r11 negative result; the single-shuffle count window is the fix.
    ed = _attach_out_degree(e).transform(reliable_checkpoint)
    scol = seeds.columns[0]
    s = seeds.select(F.col(scol).alias("node")).distinct()
    ns = s.groupBy().agg(F.count("*").cast("double").alias("ns"))
    restart = s.crossJoin(F.broadcast(ns)).select(
        "node", (F.lit(1.0) / F.col("ns")).alias("r")
    ).transform(reliable_checkpoint)
    ranks = restart.select("node", F.col("r").alias("pr"))
    for _ in range(iters):
        contrib = (
            ranks.join(ed, ranks["node"] == ed["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("mass"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(damping) * F.col("mass")).alias("pr"),
            )
        )
        base = restart.select(
            "node", (F.lit(1.0 - damping) * F.col("r")).alias("pr")
        )
        ranks = (
            base.unionByName(contrib).groupBy("node").agg(F.sum("pr").alias("pr"))
        )
    return ranks


BROADCAST_BYTES_BUDGET = 64 << 20
"""Hard cap on any FORCED broadcast side, in estimated bytes.

A row-count gate alone is not enough: an adjacency-list frame with 5M rows
of neighbor arrays totals hundreds of MB — far past safe driver/executor
broadcast sizes even though the row count looks modest. Every forced
``F.broadcast`` hint on a corpus-scaled frame must clear BOTH a row cap and
this bytes budget, computed from a MEASURED count of the already-
materialized checkpoint (never a size estimate of an unexecuted plan).
Above either limit the frame is left unhinted and AQE picks the join
strategy from real runtime statistics."""


def maybe_broadcast(
    df: DataFrame,
    n_units: int,
    bytes_per_unit: int,
    limit_rows: int = 1_000_000,
    limit_bytes: int = BROADCAST_BYTES_BUDGET,
) -> DataFrame:
    """``F.broadcast(df)`` iff ``n_units`` clears the row cap AND
    ``n_units * bytes_per_unit`` clears the bytes budget; otherwise ``df``
    untouched (plain equi-join, AQE decides). ``n_units`` is whatever unit
    actually scales the payload — row count for thin tables, total array
    entries for adjacency lists."""
    if n_units <= limit_rows and n_units * bytes_per_unit <= limit_bytes:
        return F.broadcast(df)
    return df


KCORE_DRIVER_EDGES_ENV = "SPARK_GRAFT_KCORE_DRIVER_EDGES"
KCORE_DRIVER_EDGES_DEFAULT = 16_000_000  # ≈256 MB of (long, long) pairs


def _kcore_driver_finish(cur: DataFrame, k: int) -> DataFrame:
    """Finish a k-core peel driver-side in ONE pass over a small surviving
    edge set (the v13 eigensolve precedent: once the distributed remainder
    is driver-manageable, scheduling ~0.2 s Spark rounds per peel LEVEL is
    pure fixed overhead — measured at sf0.1 the cascade tail is 21 levels
    dropping 1-6 nodes each). Exact, not approximate: the k-core is the
    unique maximal subgraph with min-degree ≥ k, so any correct peel order
    yields the identical node set and in-core degrees.

    Implementation: Arrow-collect the canonical edges, build a CSR
    adjacency with numpy, then peel LEVEL-AT-A-TIME vectorized — per level
    the removed nodes' neighbor slices are gathered (Python touches each
    REMOVED node once, total work O(E)) and alive-neighbor degrees are
    decremented via one bincount. Returns the (node, deg-inside-core)
    DataFrame as a local relation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    spark = cur.sparkSession
    node_type = cur.schema[0].dataType
    out_schema = StructType(
        [StructField("node", node_type), StructField("deg", LongType())]
    )
    pdf = cur.toPandas()
    a, b = pdf.columns[0], pdf.columns[1]
    if len(pdf) == 0:
        return spark.createDataFrame([], out_schema)
    both = np.concatenate([pdf[a].to_numpy(), pdf[b].to_numpy()])
    # hash-based factorize (O(N)) over sort-based np.unique (O(N log N));
    # int32 codes halve the CSR sort cost (node count ≪ 2³¹ by the cap)
    inv, nodes = pd.factorize(both, sort=False)
    inv = inv.astype(np.int32)
    nodes = np.asarray(nodes)
    m, n = len(pdf), len(nodes)
    sa, sb = inv[:m], inv[m:]
    u = np.concatenate([sa, sb])
    # introsort, not stable: within-group neighbor order is irrelevant,
    # and stable/radix measured 2.5x slower on 19M int32 keys
    vs = np.concatenate([sb, sa])[np.argsort(u)]
    degc = np.bincount(u, minlength=n).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(degc, out=indptr[1:])
    alive = np.ones(n, dtype=bool)
    removed_now = np.flatnonzero(degc < k)
    while removed_now.size:
        alive[removed_now] = False
        nbr_slices = [vs[indptr[x]: indptr[x + 1]] for x in removed_now]
        nbrs = np.concatenate(nbr_slices)
        nbrs = nbrs[alive[nbrs]]  # same-level / earlier removals: no-op
        degc -= np.bincount(nbrs, minlength=n)
        removed_now = np.flatnonzero(alive & (degc < k))
    out = {"node": nodes[alive], "deg": degc[alive]}
    return spark.createDataFrame(pd.DataFrame(out), out_schema)


def kcore(
    edges: DataFrame,
    k: int | None,
    src: str = "src",
    dst: str = "dst",
    canonical: bool = False,
    max_rounds: int = 64,
    driver_finish_edges: int | None = None,
    threshold_fn=None,
) -> DataFrame:
    """k-core of an undirected simple graph (Seidman 1983): the maximal
    subgraph in which every node has degree ≥ k — the standard pruning
    primitive before community/triangle analysis on a similarity or
    co-occurrence graph (peripheral low-degree noise rarely changes the
    dense-cluster verdict but dominates the wedge cost). Returns
    ``(node, deg)`` for core members, with ``deg`` the degree INSIDE the
    core (≥ k by construction).

    Algorithm: iterative peel — drop every node whose CURRENT degree is
    < k, delete its edges, repeat until a fixpoint (removing a node can
    drag neighbors below k, so one pass is not enough). Scale shape per
    round: ONE groupBy degree count (persisted for the round, so the two
    LEFT SEMI joins read it instead of recomputing the shuffle twice) +
    two id-only semi joins, with the surviving edge set
    reliable-checkpointed (same iterative-durability contract as
    large-star/small-star CC) so a lost executor replays from the round
    boundary. The convergence test is FUSED into the round: ONE agg on
    the persisted degree table yields both the drop count (fixpoint,
    decided BEFORE the joins run) and the surviving edge count.

    Distributed-until-small hybrid (round-11): batch peeling's round
    count is the cascade DEPTH, and measured at sf0.1 the tail is 21
    levels dropping 1-6 nodes each at ~0.2-0.45 s of fixed scheduling
    overhead per level — round latency, not per-round work, dominates
    (a superstep-fusion attempt measured WORSE: 16.2 s vs 11.4 s,
    PERF.md negative-result log). So when the surviving edge count —
    read from the same agg that decides convergence — is at most
    ``driver_finish_edges`` (default ``$SPARK_GRAFT_KCORE_DRIVER_EDGES``
    or 16M edges ≈ 256 MB, the size class of a broadcast dimension
    table; 0 disables), the peel finishes driver-side in one exact
    vectorized pass (``_kcore_driver_finish``). At 100 TB scale the
    distributed rounds strip the bulk until the survivor set fits the
    cap; at bench scale the whole graph is already driver-manageable.
    ``max_rounds`` stays a loud backstop on the distributed path, never
    a silent truncation.

    Data-relative thresholds (round-11): pass ``k=None`` with
    ``threshold_fn(degs) -> int`` and the threshold derives from the
    peel's OWN persisted round-0 degree table — a caller computing a
    degree statistic (median, percentile) for k would otherwise run the
    exact aggregation round 0 immediately repeats; the hook removes one
    full pass over the edge list at any scale."""
    if (k is None) == (threshold_fn is None):
        raise ValueError("exactly one of k / threshold_fn must be given")
    if driver_finish_edges is None:
        driver_finish_edges = env_int(
            KCORE_DRIVER_EDGES_ENV, KCORE_DRIVER_EDGES_DEFAULT
        )
    if canonical:
        canon = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        canon = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    # non-numeric node ids (strings) are ~8x wider than a long once
    # Arrow-collected into object arrays — scale the edge-count cap so
    # the driver-memory budget it encodes (≈256 MB at the default) holds
    # regardless of key type
    from pyspark.sql.types import NumericType

    if not isinstance(canon.schema[0].dataType, NumericType):
        driver_finish_edges //= 8
    cur, release_cur = checkpoint_with_release(canon)
    release_nxt = None
    try:
        for _ in range(max_rounds):
            release_nxt = None
            degs = (
                cur.select(F.explode(F.array("a", "b")).alias("node"))
                .groupBy("node")
                .agg(F.count("*").alias("deg"))
                .persist()
            )
            try:
                if k is None:
                    # an empty graph has an empty core for any k>=1 — decide
                    # BEFORE calling threshold_fn (whose statistic is
                    # undefined on an empty degree table); one trivial job
                    # on the persisted (empty) table
                    if degs.limit(1).count() == 0:
                        break
                    k = int(threshold_fn(degs))  # reads the persisted table
                # one job: fixpoint drop-count + surviving-edge count (Σdeg/2)
                row = degs.agg(
                    F.count(F.when(F.col("deg") < k, 1)).alias("drops"),
                    F.sum("deg").alias("degsum"),
                ).collect()[0]
                if (row["drops"] or 0) == 0:
                    break  # fixpoint decided pre-join: no confirmation round
                if (row["degsum"] or 0) // 2 <= driver_finish_edges:
                    out = _kcore_driver_finish(cur, k)
                    release_cur()
                    return out
                keep = degs.filter(F.col("deg") >= k).select("node")
                nxt = cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
                nxt = nxt.join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
                nxt, release_nxt = checkpoint_with_release(nxt)
            finally:
                degs.unpersist()
            # round i's pinned blocks freed once round i+1 is materialized
            release_cur()
            cur, release_cur = nxt, release_nxt
            release_nxt = None
        else:
            raise RuntimeError(
                f"kcore({k}) did not converge in {max_rounds} rounds"
            )
    except BaseException:
        # NO exception path may leak a pinned checkpoint (the round-10/11
        # leak class): release the current round and, if a next-round
        # checkpoint materialized before the failure, that one too
        release_cur()
        if release_nxt is not None and release_nxt is not release_cur:
            release_nxt()
        raise
    return (
        cur.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def ktruss(
    edges: DataFrame,
    k: int | None,
    src: str = "src",
    dst: str = "dst",
    canonical: bool = False,
    max_rounds: int = 64,
    threshold_fn=None,
) -> DataFrame:
    """k-truss of an undirected simple graph (Cohen 2008): the maximal
    subgraph in which every EDGE closes >= k-2 triangles — the edge-level
    sharpening of k-core (a k-truss is always inside the (k-1)-core, but
    prunes "bridge" edges that high degrees alone cannot justify). On a
    similarity/co-occurrence graph this keeps only cohesive-community
    edges before clustering or CC, where k-core still admits hub-spoke
    noise. Returns ``(a, b, support)`` for surviving canonical edges,
    ``support`` the triangle count INSIDE the truss (>= k-2 by
    construction).

    Algorithm: iterative peel — per round enumerate triangles on the
    CURRENT edge set with the oriented wedge join (x<y<z via the
    canonical a<b orientation: e1(x,y) equi-joins e2(y,z) on the shared
    middle node, closed by e3(x,z) — the d12 shape, never an all-pairs
    product), explode each triangle to its 3 edges, one groupBy for
    per-edge support, drop edges below k-2, reliable-checkpoint the
    survivors, repeat to fixpoint. The convergence test is FUSED into the
    round (the kcore round-10 contract): the drop-count on the persisted
    (edge, support) table decides BEFORE the next round's joins, and at
    the fixpoint that same table — already >= k-2 everywhere — is
    checkpointed and returned, so the final support costs no extra
    triangle pass. Scale shape per round: one wedge join bounded by
    Σ_y deg⁺(y)·deg⁻(y) + one id-only groupBy; rounds = peel depth
    (measured: 1 at sf0.001, 4 at sf0.01 for the d22 threshold);
    ``max_rounds`` is a loud backstop.

    Data-relative thresholds (the kcore round-11 hook): pass ``k=None``
    with ``threshold_fn(scored) -> k`` and the threshold derives from the
    peel's OWN persisted round-0 ``(a, b, support)`` table — a caller
    computing a support statistic (median, percentile) for k would
    otherwise run the exact triangle enumeration + support groupBy that
    round 0 immediately repeats; the hook removes one full triangle pass
    over the edge list at any scale. On an empty edge set the (empty)
    truss returns before ``threshold_fn`` is consulted (its statistic is
    undefined there)."""
    if (k is None) == (threshold_fn is None):
        raise ValueError("exactly one of k / threshold_fn must be given")
    if canonical:
        canon = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        canon = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    min_sup = None if k is None else k - 2
    cur, release_cur = checkpoint_with_release(canon)
    release_nxt = None
    try:
        for _ in range(max_rounds):
            release_nxt = None
            e1 = cur.select(F.col("a").alias("x"), F.col("b").alias("y"))
            e2 = cur.select(F.col("a").alias("y"), F.col("b").alias("z"))
            e3 = cur.select(F.col("a").alias("x"), F.col("b").alias("z"))
            tri = e1.join(e2, "y").join(e3, ["x", "z"])
            sup = (
                tri.select(
                    F.explode(
                        F.array(
                            F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                            F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
                            F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
                        )
                    ).alias("e")
                )
                .groupBy("e.a", "e.b")
                .agg(F.count("*").alias("support"))
            )
            scored = (
                cur.join(sup, ["a", "b"], "left")
                .select("a", "b", F.coalesce("support", F.lit(0)).alias("support"))
                .persist()
            )
            try:
                if min_sup is None:
                    # empty graph ⇒ empty truss for any k — decide BEFORE
                    # calling threshold_fn (undefined on an empty table)
                    if scored.limit(1).count() == 0:
                        final, _release_final = checkpoint_with_release(scored)
                        release_cur()
                        return final
                    min_sup = int(threshold_fn(scored)) - 2  # reads the persisted table
                if scored.filter(F.col("support") < min_sup).count() == 0:
                    # fixpoint: `scored` IS the truss with its final support —
                    # checkpoint it (caller-visible pin, the kcore contract)
                    final, _release_final = checkpoint_with_release(scored)
                    release_cur()
                    return final
                nxt, release_nxt = checkpoint_with_release(
                    scored.filter(F.col("support") >= min_sup).select("a", "b")
                )
            finally:
                scored.unpersist()
            release_cur()
            cur, release_cur = nxt, release_nxt
            release_nxt = None
        raise RuntimeError(
            f"ktruss({min_sup + 2 if min_sup is not None else k}) "
            f"did not converge in {max_rounds} rounds"
        )
    except BaseException:
        # NO exception path may leak a pinned checkpoint (round-10/11
        # leak class) — current round plus any already-materialized next
        release_cur()
        if release_nxt is not None and release_nxt is not release_cur:
            release_nxt()
        raise


def doulion_keep(u: Column, v: Column, sample_p: float, salt: str = "tri") -> Column:
    """Deterministic DOULION edge-sampling predicate (Tsourakakis, Kang,
    Miller & Faloutsos, KDD'09): keep the canonical edge (u, v) iff the
    first 32 md5 bits of ``salt:u:v`` fall below ``sample_p · 2³²``.
    Hash-based instead of rand() so the sparsified graph is identical
    across retries, executors, and the DuckDB oracle (which replays the
    same slice via ``_u32_sql``)."""
    threshold = int(round(sample_p * 4294967296))
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), u, v)), 1, 8), 16, 10
    ).cast("long")
    return h < F.lit(threshold)


def triangle_close_edges(
    canon: DataFrame, broadcast_limit_rows: int = 5_000_000
) -> tuple[DataFrame, DataFrame]:
    """Shared triangle-ENUMERATION core of :func:`triangle_counts` and the
    d18 sampling audit: degree-ordered orientation (Suri & Vassilvitskii
    WWW'11) + in-row ``array_intersect`` close over a canonical
    (``a`` < ``b``, distinct) edge set.

    Returns ``(deg, tri_edges)``:

    - ``deg`` — the materialized ``(node, deg)`` undirected-degree table
      (every node, computed for the orientation anyway);
    - ``tri_edges`` — one row per oriented edge closing ≥ 1 triangle:
      ``(u, v, common)`` with ``common`` the sorted array of closing third
      nodes. Each triangle of the input graph appears EXACTLY once, at the
      edge between its two lower-(degree, id) endpoints — so callers can
      derive exact totals (Σ size(common)), per-corner rollups, or
      per-triangle predicates (the d18 DOULION replay) from a single
      enumeration pass.

    Scale shape: orientation caps out-degree at O(√2m) (a degree-d hub
    owns O(d) oriented edges, never O(d²) wedges); adjacency/degree sides
    broadcast only under a measured-count + bytes budget
    (:func:`maybe_broadcast`), else plain equi-joins AQE plans from
    runtime stats; wedges never materialize — only the O(#triangles)
    closed output.

    Round-12 shape (guide §2.3/§2.4 — one materialization and one close
    join removed):

    - ``n_nodes`` and the canonical edge count come from ONE aggregate
      over the materialized degree table (Σdeg = 2·|edges|) instead of
      two separate count jobs;
    - degree-1 endpoints are pruned from the orientation join's degree
      sides — an edge with a degree-1 endpoint closes no triangle (all
      three corners of a triangle have degree ≥ 2), so the inner joins
      drop those edges before the adjacency build and close ever see
      them. ``deg`` itself stays the FULL table for callers;
    - the oriented edge list is no longer checkpointed or counted: it
      is consumed exactly once (the adjacency groupBy), and the close's
      edge stream is re-derived from the adjacency table itself —
      ``explode(nbrs)`` regenerates each oriented edge with its u-side
      neighbor array already attached, deleting the u-side close join
      (one shuffle on the non-broadcast path, one broadcast build on
      the broadcast path)."""
    deg = (
        canon.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .transform(reliable_checkpoint)
    )
    stats = deg.agg(
        F.count("*").alias("n"), F.sum("deg").alias("sd")
    ).first()  # one job over the materialized checkpoint
    n_nodes = int(stats["n"] or 0)
    n_edges = int(stats["sd"] or 0) // 2  # Σdeg counts every edge twice
    deg2 = deg.filter(F.col("deg") >= 2)
    da = deg2.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg2.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    # two-long rows ≈ 32 B each; bytes budget caps the hint well below the
    # row cap on big graphs (round-8 fix: row count alone under-gates)
    da = maybe_broadcast(da, n_nodes, 32, limit_rows=broadcast_limit_rows)
    db = maybe_broadcast(db, n_nodes, 32, limit_rows=broadcast_limit_rows)
    oriented = (
        canon.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    adj = (
        oriented.groupBy("u")
        .agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
        .transform(reliable_checkpoint)
    )
    # the adjacency payload scales with TOTAL NEIGHBOR ENTRIES (≤ n_edges),
    # not adjacency rows: 5M oriented edges ≈ hundreds of MB of arrays.
    # Gate the hint on entry bytes (~24 B/entry), not row count alone;
    # n_edges (the pre-pruning canonical count) upper-bounds the entries.
    nv = adj.select(F.col("u").alias("_jv"), F.col("nbrs").alias("_nv"))
    will_broadcast = (
        n_edges <= broadcast_limit_rows
        and n_edges * 24 <= BROADCAST_BYTES_BUDGET
    )
    nv = maybe_broadcast(nv, n_edges, 24, limit_rows=broadcast_limit_rows)
    close_in = adj
    spread = env_int(TRI_CLOSE_SPREAD_ENV, 1)
    if will_broadcast and spread:
        # On the broadcast path the close inherits the checkpoint's
        # byte-coalesced partitioning (AQE sizes for ~64 MB of BYTES, but
        # the intersection close is CPU-bound per row — measured at sf0.1
        # the 2.8 s close ran on 10 of 32 cores). Spread the adjacency
        # table (each neighbor array moves ONCE, before the explode) to
        # full parallelism first; a round-robin pass over a byte-small
        # table costs far less than the idle cores. On the non-broadcast
        # path the close's own join shuffle already fans out to
        # spark.sql.shuffle.partitions — nothing to fix there.
        par = (
            spread
            if spread > 1
            else adj.sparkSession.sparkContext.defaultParallelism
        )
        close_in = adj.repartition(par)
    left = close_in.select(
        "u", F.col("nbrs").alias("_nu"), F.explode("nbrs").alias("v")
    )
    tri_edges = (
        left.join(nv, left["v"] == nv["_jv"], "inner")
        .select("u", "v", F.array_intersect("_nu", "_nv").alias("common"))
        .filter(F.size("common") > 0)
    )
    return deg, tri_edges


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    canonical: bool = False,
    with_degree: bool = False,
    broadcast_limit_rows: int = 5_000_000,
    sample_p: float | None = None,
    include_zero: bool = False,
) -> DataFrame:
    """Per-node triangle participation counts over an undirected simple
    graph given as (src, dst) pairs (either or both directions; duplicates
    and self-loops are dropped) → ``(node, triangles)`` covering every
    node that closes at least one triangle.

    ``canonical=True`` promises the input is already deduplicated with
    ``src < dst`` — skips the least/greatest + distinct normalization
    shuffle (callers that just built the edge list canonically shouldn't
    pay to re-canonicalize it). ``with_degree=True`` appends each node's
    undirected degree (computed anyway for the orientation) to the output
    — ``(node, triangles, deg)`` — saving callers a second degree pass
    over the edges (clustering-coefficient consumers).
    ``include_zero=True`` (requires ``with_degree``) covers EVERY node of
    the graph, with ``triangles`` coalesced to 0 for nodes closing none —
    the operator's own degree table LEFT-joins the counts, so consumers
    that need zero-triangle nodes (per-degree-band closure curves) don't
    re-aggregate the edge list for a second degree pass.

    Scale design — degree-ordered orientation (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11)
    followed by an EDGE-iterator close instead of the wedge-join close:

    - every edge is ORIENTED from its lower-(degree, id) endpoint to its
      higher one, capping out-degree at O(√2m) — a degree-d hub owns O(d)
      oriented edges, never O(d²) wedges (the power-law skew killer);
    - per-node sorted out-neighbor lists are built once (one grouped
      pass over the oriented edges), joined back onto both endpoints of
      each oriented edge, and each edge (a,b) closes its triangles as
      ``array_intersect(N⁺(a), N⁺(b))`` IN-ROW — each triangle found
      exactly once, at the edge between its two lower endpoints. The
      round-6 wedge-join formulation materialized and shuffled every
      open wedge (41M rows for 1.2M edges on the sf0.1 co-purchase
      graph, ~10s of its 15s) — the intersection never materializes
      wedges at all, only the O(#triangles) closed output;
    - adjacency/degree sides are broadcast when the edge/node count is
      under ``broadcast_limit_rows`` (decided from the materialized
      checkpoints, not estimates); above it they fall back to plain
      equi-joins — adjacency rows are node-count-scale and thin-keyed,
      so the fallback is two ordinary shuffles, no row blow-up;
    - the per-node rollup explodes each edge's contributions (a and b
      |I| times each, every c in I once) in ONE pass and grouped-sums —
      triangle-count-bounded, not wedge-bounded.

    ``sample_p`` turns the exact counter into the DOULION estimator
    (Tsourakakis et al., KDD'09) — the standard dial when the exact
    count is triangle-output-bound at corpus scale: each canonical edge
    survives with probability p (deterministic hash rule,
    :func:`doulion_keep`), triangles are counted on the sparsified
    graph (cost shrinks ~p³ on the close and p on the shuffles), and
    each node's count is scaled by 1/p³ — the unbiased estimate, since
    a triangle survives iff all 3 edges do. With sampling the
    ``triangles`` column is a DOUBLE estimate (exact in binary when p
    is a power of two: integer · 2³ᵏ) and ``deg`` (with_degree=True) is
    the SAMPLED graph's degree. Variance falls as 1/(p³·T); p ≥ 0.1 on
    graphs with ≥10⁴ triangles keeps the relative error in single-digit
    percent (see the d18 audit query for the measured error)."""
    if canonical:
        canon = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        canon = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    if sample_p is not None:
        if not 0.0 < sample_p <= 1.0:
            raise ValueError("sample_p must be in (0, 1]")
        canon = canon.filter(doulion_keep(F.col("a"), F.col("b"), sample_p))
    deg, tri_edges = triangle_close_edges(canon, broadcast_limit_rows)
    # weighted rollup: an edge closing T triangles contributes T to u and
    # v and 1 to each common neighbor — emit (u, T), (v, T) and the T
    # common nodes at weight 1 instead of repeating u/v T times each,
    # 3x fewer exploded rows through the dominant shuffle (round-8 fix,
    # measured on the honest noop-materialized bench).
    one = F.lit(1).cast("long")
    contrib = tri_edges.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.col("u").alias("node"),
                        F.size("common").cast("long").alias("w"),
                    ),
                    F.struct(
                        F.col("v").alias("node"),
                        F.size("common").cast("long").alias("w"),
                    ),
                ),
                F.transform(
                    F.col("common"),
                    lambda c: F.struct(c.alias("node"), one.alias("w")),
                ),
            )
        ).alias("e")
    ).select("e.node", "e.w")
    counts = contrib.groupBy("node").agg(F.sum("w").alias("triangles"))
    if sample_p is not None:
        counts = counts.withColumn(
            "triangles",
            (F.col("triangles").cast("double") / F.lit(sample_p**3)),
        )
    if include_zero and not with_degree:
        raise ValueError("include_zero requires with_degree=True")
    if with_degree:
        if include_zero:
            zero = F.lit(0.0) if sample_p is not None else F.lit(0).cast("long")
            return deg.join(counts, "node", "left").select(
                "node", F.coalesce("triangles", zero).alias("triangles"), "deg"
            )
        return counts.join(deg, "node")
    return counts


def adamic_adar(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    canonical: bool = True,
    hub_cap: int = 1024,
    focus: DataFrame | None = None,
) -> DataFrame:
    """Adamic-Adar link-prediction scores for NON-adjacent node pairs:
    AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z) (Adamic & Adar 2003) —
    the classic "which near-duplicate clusters are about to merge /
    which co-occurrence edge is missing" audit over a similarity or
    co-occurrence graph. Returns ``(u, v, common_neighbors, aa_score)``
    for every non-adjacent pair sharing ≥1 non-hub common neighbor.

    Scale design — the wedge stage never runs an unbounded row self-join
    on the common neighbor:

    - unfocused: the symmetrized adjacency is grouped once per node z
      into a sorted neighbor array; wedges materialize as in-row pair
      structs from that array — no (z,u)⋈(z,v) shuffle-join row blow-up;
    - all-pairs AA is inherently Σ_z deg(z)² — on dense graphs that is
      the whole cost. ``focus`` (a 1-column node DataFrame, broadcast)
      scopes scoring to "links predicted FOR these nodes" (the watchlist
      / recommendation shape) with two EQUI-joins and no array state:
      sym⋈focus on the neighbor end yields the (z, u) wedge legs
      (Σ_{u∈focus} deg u rows), and joining the legs back on z fans out
      the co-neighbors v — K focus nodes cost ≤ K·2m wedge rows,
      corpus-linear no matter how dense the graph. Focus output is
      directed (u = the focus node);
    - hub common-neighbors with deg > ``hub_cap`` are skipped BEFORE
      expansion (their 1/ln(deg) weight is the smallest in the sum while
      their wedge cost is the largest — the standard truncation in
      link prediction at scale; caps the unfocused cost at n·cap²);
    - the per-pair rollup is one map-side-combinable groupBy(u,v);
    - existing edges are removed with a broadcast-eligible LEFT ANTI join
      (AQE decides; adjacency rows are two-long);
    - determinism: ``aa_score`` is computed as an EXACT integer sum —
      each 1/ln(deg) term is quantized to a 1e-9 grid
      (``round(term·1e9)`` as BIGINT) before summing, so the sum is
      partition-order independent (long addition is associative and
      exact), then divided back. A plain IEEE double Σ 1/ln(deg) can
      differ by 1 ulp between runs/engines and flip a downstream
      round-then-rank cutoff; the grid makes replays and the DuckDB
      oracle bit-identical. Quantization error ≤ 5e-10·terms, far
      below the repo's round-6 comparison grid.

    ``canonical=True`` promises src<dst deduplicated input (the shape
    :func:`triangle_counts` callers already build)."""
    if canonical:
        canon = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        canon = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    sym = canon.select(F.col("a").alias("z"), F.col("b").alias("n")).unionByName(
        canon.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    if focus is not None:
        # Focus path: no adjacency arrays at all — two EQUI-joins carve
        # out exactly the focus wedges. sym⋈focus on the neighbor end
        # yields the (z, u) legs (Σ_{u∈focus} deg u rows, a map-side
        # filter against the broadcast watchlist); joining the legs back
        # on z fans each leg out to its co-neighbors v. The legs are
        # checkpointed and counted, and every reuse (weight join, wedge
        # fan-out, the existing-edge anti side) broadcasts them under the
        # measured-count + bytes budget — so the big adjacency shuffles
        # exactly once (the degree groupBy); above the budget each join
        # falls back to a plain shuffle AQE plans from runtime stats.
        fcol = focus.columns[0]
        f = focus.select(F.col(fcol).alias("fu"))
        legs_raw = reliable_checkpoint(
            sym.join(F.broadcast(f), sym["n"] == F.col("fu")).select("z", "fu")
        )
        n_legs = legs_raw.count()  # measured on the materialized checkpoint
        # Degree weights are only ever read for wedge-CENTER nodes (legs'
        # z values — wt is consumed solely by `legs = wt ⋈ legs_raw`), so
        # pre-filter the full adjacency with a broadcast semi-join on the
        # distinct centers BEFORE the degree groupBy (guide §3.2 — the
        # PySpark approximation of Bloom pre-filtering): the grouped
        # shuffle then carries only Σ_{z∈centers} deg(z) rows instead of
        # all 2m. deg(z) itself is still the node's FULL graph degree —
        # the filter drops other z groups, never rows within a group.
        # Above the broadcast budget the join stays a plain equi-join on z
        # whose output partitioning the groupBy reuses (no extra shuffle).
        zset = maybe_broadcast(
            legs_raw.select("z").distinct(), n_legs, 8
        )
        wt = (
            sym.join(zset, "z")
            .groupBy("z")
            .agg(F.count("*").alias("deg"))
            .filter((F.col("deg") >= 2) & (F.col("deg") <= hub_cap))
            .select(
                "z",
                F.round(
                    F.lit(1.0) / F.log(F.col("deg").cast("double")) * 1e9
                ).cast("long").alias("w"),
            )
        )
        legs = wt.join(maybe_broadcast(legs_raw, n_legs, 16), "z")
        wedges = (
            sym.select("z", F.col("n").alias("v"))
            .join(maybe_broadcast(legs, n_legs, 24), "z")
            .filter(F.col("v") != F.col("fu"))
            .select(F.col("fu").alias("u"), "v", "w")
        )
        scores = wedges.groupBy("u", "v").agg(
            F.count("*").cast("long").alias("common_neighbors"),
            (F.sum("w").cast("double") / F.lit(1e9)).alias("aa_score"),
        )
        u_adj = legs_raw.select(
            F.col("fu").alias("au"), F.col("z").alias("av")
        )
        return scores.join(
            maybe_broadcast(u_adj, n_legs, 16),
            (scores["u"] == F.col("au")) & (scores["v"] == F.col("av")),
            "left_anti",
        )
    adj = (
        sym.groupBy("z")
        .agg(F.sort_array(F.collect_set("n")).alias("nbrs"))
        .withColumn("deg", F.size("nbrs"))
        .filter((F.col("deg") >= 2) & (F.col("deg") <= hub_cap))
        .withColumn(
            "w",
            F.round(
                F.lit(1.0) / F.log(F.col("deg").cast("double")) * 1e9
            ).cast("long"),
        )
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("nbrs"),
            lambda x, i: F.transform(
                F.slice(F.col("nbrs"), i + F.lit(2), F.size(F.col("nbrs"))),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    wedges = adj.select(F.col("w"), F.explode(pair_structs).alias("e")).select(
        "e.u", "e.v", "w"
    )
    scores = wedges.groupBy("u", "v").agg(
        F.count("*").cast("long").alias("common_neighbors"),
        (F.sum("w").cast("double") / F.lit(1e9)).alias("aa_score"),
    )
    return scores.join(
        canon,
        (scores["u"] == canon["a"]) & (scores["v"] == canon["b"]),
        "left_anti",
    )
