"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import Window


from pyspark.sql import functions as F


from ..core.checkpoint import reliable_checkpoint


from ._registry import _t, query


from ._shared import _BANDS_SQL, _MINHASH_AGGS_SQL, _NORM_SQL, _lsh_cte, _u32_sql


@query(
    "d1_exact_dedup",
    f"""
    SELECT md5({_NORM_SQL}) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS keep_id
    FROM documents GROUP BY 1
    """,
)
def d1_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup groups by normalized-content hash (shuffle on the hash,
    never on raw text)."""
    from ..operators.dedup import exact_duplicates

    return exact_duplicates(_t(spark, sf, "documents"))


@query(
    "d2_minhash_lsh_dedup",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), sigs AS (
      SELECT doc_id,
           {_MINHASH_AGGS_SQL}
      FROM sh GROUP BY doc_id
    ), banded AS ({_BANDS_SQL})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    """,
)
def d2_minhash_lsh_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → 16 md5-minhashes → 4 bands
    of 4 → bucket equi-join. Planted mutated copies (doc+100000, text+' zz')
    guarantee recall is visible: every planted pair must collide."""
    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures, shingles

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    sigs = minhash_signatures(shingles(corpus, n=3), num_hashes=16, token_col="shingle")
    return lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)


@query(
    "d3_ngram_jaccard",
    f"""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
    norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), shf AS (
      -- df cap (max_token_df=1000): drop shingles hot across >1000 docs —
      -- a no-op on this 100-doc corpus but part of the operator contract
      SELECT sh.doc_id, sh.shingle FROM sh
      JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000) f
        USING (shingle)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           sa.n AS n_a, sb.n AS n_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.02
    """,
)
def d3_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Word-3-gram Jaccard similarity over candidate pairs sharing a shingle
    (posting-list join; no cartesian)."""
    from ..operators.dedup import jaccard_pairs, shingles

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    # materialized once (optimization round 12): the posting join scans its
    # token input 4-5x (df cap, semi filter, sizes, both join sides) and
    # each scan re-ran the scan→shingle→DISTINCT lineage
    sh = reliable_checkpoint(shingles(docs, n=3))
    out = jaccard_pairs(sh, threshold=0.02, token_col="shingle")
    return out.withColumn("jaccard", F.round("jaccard", 6))


@query(
    "d4_embedding_neardup",
    f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 10
    ), {_lsh_cte(8, 8, "corpus")}, sims AS (
      SELECT c.va AS vec_a, c.vb AS vec_b,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM cands c
      JOIN flat fa ON fa.vec_id = c.va
      JOIN flat fb ON fb.vec_id = c.vb AND fb.i = fa.i
      JOIN norms na ON na.vec_id = c.va
      JOIN norms nb ON nb.vec_id = c.vb
      WHERE c.va < 10 OR c.vb >= 100000
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b, sim FROM sims WHERE sim >= 0.95
    """,
)
def d4_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup detection: pairs above a similarity
    threshold. Planted exact copies (vec_id+100000) must all surface with
    sim 1.0 — identical vectors share every LSH bucket, so bucketing never
    loses them.

    Scale path: candidates come from the hyperplane-LSH equi-join
    (operators/similarity.py) — NOT an all-pairs non-equi join, which
    Catalyst would execute as an O(N²) BroadcastNestedLoopJoin. Exact cosine
    runs only inside buckets; the oracle replays the identical bucketing."""
    from ..operators.similarity import cosine, hyperplane_signatures

    emb = _t(spark, sf, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionByName(
        emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    # signatures materialize once (localCheckpoint): the special side is a
    # filter of the same subtree, so both join inputs read the checkpointed
    # rows instead of recomputing the 64-dot×64-plane projection twice
    sigs = hyperplane_signatures(corpus, dim=64, n_tables=8, n_bits=8).transform(reliable_checkpoint)
    # every qualifying pair has ≥1 endpoint in the tiny special set
    # ({id<10} ∪ {id≥100000}), so join special-side signatures (broadcast)
    # against the corpus instead of distinct-ing the full all-pairs candidate
    # set first — same pair set as the oracle's cands+WHERE, ~N× less work
    special = sigs.filter((F.col("vec_id") < 10) | (F.col("vec_id") >= 100000))
    cands = (
        special.alias("a")
        .join(
            sigs.alias("b"),
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.least("a.vec_id", "b.vec_id").alias("vec_a"),
            F.greatest("a.vec_id", "b.vec_id").alias("vec_b"),
        )
        .distinct()
        .filter((F.col("vec_a") < 10) | (F.col("vec_b") >= 100000))
    )
    va = corpus.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_vec"))
    vb = corpus.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b_vec"))
    sim = F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6)
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= 0.95)
    )


_CC_CTES = """corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), norm AS (
      SELECT doc_id, string_split({norm}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), sigs AS (
      SELECT doc_id,
           {minhash}
      FROM sh GROUP BY doc_id
    ), banded AS ({bands}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), sym AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ), reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
    ), cc AS (
      SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node
    )""".format(norm=_NORM_SQL, minhash=_MINHASH_AGGS_SQL, bands=_BANDS_SQL)


def _cc_corpus_and_clusters(spark: SparkSession, sf: str):
    """Shared build for d5/d6: planted-duplicate corpus → MinHash LSH pairs
    → connected components."""
    from ..operators.dedup import (
        connected_components_star,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    sigs = minhash_signatures(shingles(corpus, n=3), num_hashes=16, token_col="shingle")
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    clusters, _ = connected_components_star(pairs, nodes=corpus.select("doc_id"))
    return corpus, clusters


@query(
    "d5_neardup_clusters",
    "WITH RECURSIVE "
    + _CC_CTES
    + "\n    SELECT doc_id, cluster FROM cc",
)
def d5_neardup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup CLUSTERS: candidate pairs chain (A~B, B~C ⇒ one duplicate
    group), so keep-one dedup operates on connected components, not pairs.
    Spark side: alternating large-star/small-star contraction (two grouped
    shuffles per round, localCheckpoint lineage truncation, O(log n) rounds
    on ANY graph shape — chain-shaped duplicate graphs included). Oracle:
    DuckDB recursive-CTE reachability closure — an iterative Spark
    algorithm hash-checked against a fixpoint the SQL engine computes
    independently."""
    _, clusters = _cc_corpus_and_clusters(spark, sf)
    return clusters


@query(
    "d6_dedup_representatives",
    "WITH RECURSIVE "
    + _CC_CTES
    + """,
    ranked AS (
      SELECT c.cluster, c.doc_id,
             row_number() OVER (
               PARTITION BY c.cluster
               ORDER BY length(co.text) DESC, c.doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY c.cluster) AS n_docs
      FROM cc c JOIN corpus co USING (doc_id)
    )
    SELECT cluster, doc_id AS rep_doc_id, n_docs FROM ranked WHERE rn = 1""",
)
def d6_dedup_representatives(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-one selection per duplicate cluster: longest document wins,
    doc_id breaks ties — the final step that turns near-dup detection into
    an actual deduplicated corpus."""
    from ..operators.dedup import cluster_representatives

    corpus, clusters = _cc_corpus_and_clusters(spark, sf)
    return cluster_representatives(clusters, corpus)


@query(
    "d8_chain_components",
    """
    WITH RECURSIVE nodes AS (
      SELECT doc_id FROM documents WHERE doc_id < 60
    ), edges AS (
      -- path segments of 10: i ~ i+1 unless i ends a segment
      SELECT doc_id AS a, doc_id + 1 AS b FROM nodes
      WHERE doc_id < 59 AND doc_id % 10 <> 9
    ), sym AS (
      SELECT a, b FROM edges UNION SELECT b, a FROM edges
    ), reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node
    """,
)
def d8_chain_components(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components on a CHAIN-shaped graph — the adversarial case
    for min-label propagation (O(diameter) rounds): six 10-node path
    segments over the documents ids. Spark runs large-star/small-star
    contraction (O(log n) rounds on any shape, two grouped shuffles per
    round); the oracle computes the same fixpoint via recursive-CTE
    reachability — entirely different algorithm, same answer."""
    from ..operators.dedup import connected_components_star

    nodes = _t(spark, sf, "documents").filter(F.col("doc_id") < 60).select("doc_id")
    pairs = nodes.filter(
        (F.col("doc_id") < 59) & (F.col("doc_id") % 10 != 9)
    ).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
    )
    clusters, _rounds = connected_components_star(pairs, nodes=nodes)
    return clusters


@query(
    "d7_simhash_near_pairs",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), toks AS (
      SELECT DISTINCT doc_id, tok AS token
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM corpus)
      WHERE tok <> ''
    ), digits AS (
      SELECT doc_id, token, d.d,
             strpos('0123456789abcdef',
                    substring(md5(token), CAST(d.d AS INT) + 1, 1)) - 1 AS dig
      FROM toks, range(0, 16) d(d)
    ), bits AS (
      SELECT doc_id, d * 4 + b.b AS bit,
             CASE WHEN CAST(floor(dig / pow(2, b.b)) AS BIGINT) % 2 = 1
                  THEN 1 ELSE -1 END AS w
      FROM digits, range(0, 4) b(b)
    ), bitsums AS (
      SELECT doc_id, bit, sum(w) AS s FROM bits GROUP BY 1, 2
    ), sigs AS (
      SELECT doc_id,
             sum(CASE WHEN bit < 32 AND s > 0
                      THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS lo,
             sum(CASE WHEN bit >= 32 AND s > 0
                      THEN (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS hi
      FROM bitsums GROUP BY 1
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                  AS INT) AS hamming
      FROM sigs a JOIN sigs b
        ON (a.lo = b.lo OR a.hi = b.hi) AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 6
    """,
)
def d7_simhash_near_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs under the value-hash gate: 64-bit md5-derived
    token signatures, half-match blocking (a ≤6-of-64 hamming pair almost
    surely agrees exactly on one 32-bit half → two equi joins, no
    cartesian), planted one-token mutations (doc+100000) must collide at
    low hamming. The oracle rebuilds every bit in SQL."""
    from ..operators.dedup import simhash64, simhash_near_pairs, tokens

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    sigs = simhash64(tokens(corpus))
    pairs = simhash_near_pairs(sigs, max_hamming=6)
    return pairs.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


_SIG_MATCH_SQL = " + ".join(
    f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(16)
)


@query(
    "d9_minhash_error_audit",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), norm AS (
      SELECT doc_id, string_split({{norm}}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), sigs AS (
      SELECT doc_id,
           {{minhash}}
      FROM sh GROUP BY doc_id
    ), banded AS ({{bands}}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), est AS (
      SELECT p.doc_a, p.doc_b,
             ({_SIG_MATCH_SQL}) / 16.0 AS est_jaccard
      FROM pairs p
      JOIN sigs sa ON sa.doc_id = p.doc_a
      JOIN sigs sb ON sb.doc_id = p.doc_b
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT p.doc_a, p.doc_b, count(*) AS n_inter
      FROM pairs p
      JOIN sh a ON a.doc_id = p.doc_a
      JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT e.doc_a, e.doc_b,
           round(e.est_jaccard, 6) AS est_jaccard,
           round(CAST(i.n_inter AS DOUBLE)
                 / (sa.n + sb.n - i.n_inter), 6) AS jaccard,
           round(abs(e.est_jaccard
                     - CAST(i.n_inter AS DOUBLE)
                       / (sa.n + sb.n - i.n_inter)), 6) AS abs_err
    FROM est e
    JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
    JOIN sizes sa ON sa.doc_id = e.doc_a
    JOIN sizes sb ON sb.doc_id = e.doc_b
    """.format(norm=_NORM_SQL, minhash=_MINHASH_AGGS_SQL, bands=_BANDS_SQL),
)
def d9_minhash_error_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-quality audit: for every LSH candidate pair, the MinHash
    ESTIMATE of Jaccard (fraction of agreeing signature positions) next to
    the EXACT shingle Jaccard and their absolute error — the measurement
    that justifies (or rejects) a signature width before a corpus-wide
    dedup run. Same planted near-dup corpus as d2, so high-similarity
    pairs are guaranteed present.

    Scale shape: the estimate joins two 16-element signature rows per
    CANDIDATE pair (bounded by LSH collision rate, broadcast-joined); the
    exact side reuses ``jaccard_for_pairs`` — cost |pairs|·|doc|, never
    the Σdf² posting blowup (see dedup.py:543)."""
    from ..operators.dedup import (
        jaccard_for_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    # Materialize the shared intermediates ONCE (optimization round 12,
    # guide §1.2 "don't compute things you throw away" / §5 lineage cuts):
    # unmaterialized, the scan→normalize→shingle→distinct lineage executed
    # ~7x in this query's final plan (banded self-join 2x, signature
    # broadcasts 2x, jaccard_for_pairs token/size sides 3x) — every pass
    # repeating the shingle DISTINCT shuffle. All three tables are bounded
    # by the query's own doc_id<100 corpus cap, not corpus-scaled.
    sh = reliable_checkpoint(shingles(corpus, n=3))
    sigs = reliable_checkpoint(
        minhash_signatures(sh, num_hashes=16, token_col="shingle")
    )
    pairs = reliable_checkpoint(
        lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("signature").alias("_sa"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("signature").alias("_sb"))
    matches = F.aggregate(
        F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", (matches / 16.0).alias("_est"))
    )
    exact = jaccard_for_pairs(pairs, sh, threshold=0.0).select(
        "doc_a", "doc_b", "jaccard"
    )
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        F.round("_est", 6).alias("est_jaccard"),
        F.round("jaccard", 6).alias("jaccard"),
        F.round(F.abs(F.col("_est") - F.col("jaccard")), 6).alias("abs_err"),
    )


@query(
    "d10_semantic_dedup",
    """
    WITH flat0 AS (
      SELECT vec_id, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), flat AS (
      SELECT vec_id, i, x FROM flat0
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, i,
             x + CASE WHEN i = 1 THEN 0.25 ELSE 0 END AS x
      FROM flat0 WHERE vec_id % 25 = 0
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), celldots AS (
      SELECT v.vec_id, s.vec_id AS cell_id,
             round(sum(v.x * s.x) / (any_value(nv.nrm) * any_value(ns.nrm)), 6)
               AS sim
      FROM flat v JOIN flat s ON s.i = v.i AND s.vec_id < 16
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN norms ns ON ns.vec_id = s.vec_id
      GROUP BY v.vec_id, s.vec_id
    ), assign AS (
      SELECT vec_id, cell_id FROM celldots
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), pairs AS (
      SELECT aa.vec_id AS ida, bb.vec_id AS idb, aa.cell_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)),
                   6) AS cos
      FROM assign aa JOIN assign bb
        ON aa.cell_id = bb.cell_id AND aa.vec_id < bb.vec_id
      JOIN flat fa ON fa.vec_id = aa.vec_id
      JOIN flat fb ON fb.vec_id = bb.vec_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = aa.vec_id
      JOIN norms nb ON nb.vec_id = bb.vec_id
      GROUP BY 1, 2, 3
    )
    SELECT idb AS vec_id, cell_id,
           CAST(min(ida) AS BIGINT) AS kept_by,
           max(cos) AS max_sim
    FROM pairs WHERE cos >= 0.9
    GROUP BY idb, cell_id
    """,
)
def d10_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup: embedding-space near-duplicate removal scoped to coarse
    quantizer cells (paraphrase dedup that token n-grams cannot see).
    Perturbed copies (+0.25 on dimension 0, exactly representable in
    binary so the oracle replays it bit-for-bit) are planted for every
    25th vector; at threshold 0.9 only planted pairs can match (the
    natural within-cell cosine maxes out below 0.5 in this corpus).

    Scale shape (see ``operators/similarity.py:semantic_dedup``): map-side
    broadcast-seed assignment, equi self-join on cell_id (cost Σ|cell|²,
    the SemDeDup contract), hoisted norms."""
    from ..operators.similarity import semantic_dedup

    base = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    planted = base.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x.cast("double") + 0.25).otherwise(
                x.cast("double")
            ),
        ).alias("embedding"),
    )
    corpus = base.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).unionByName(planted)
    return semantic_dedup(corpus, n_cells=16, threshold=0.9, dim=64)


def _pr_iter_sql(prev: str, cur_c: str, cur_r: str) -> str:
    """One unrolled PageRank power-iteration pair of CTEs (contribution
    grouped-sum, then teleport + damping), matching
    ``operators/dedup.pagerank`` exactly."""
    return f"""
    {cur_c} AS (
      SELECT e.dst AS node, sum(r.pr / d.deg) AS mass
      FROM {prev} r
      JOIN edges e ON e.src = r.node
      JOIN deg d ON d.src = r.node
      GROUP BY 1
    ), {cur_r} AS (
      SELECT v.node,
             0.15 / nn.n + 0.85 * coalesce(c.mass, 0) AS pr
      FROM verts v CROSS JOIN nn
      LEFT JOIN {cur_c} c ON c.node = v.node
    )"""


@query(
    "d11_pagerank",
    f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ), deg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY 1
    ), verts AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), nn AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM verts
    ), r0 AS (
      SELECT node, 1.0 / nn.n AS pr FROM verts CROSS JOIN nn
    ), {_pr_iter_sql("r0", "c1", "r1")},
    {_pr_iter_sql("r1", "c2", "r2")},
    {_pr_iter_sql("r2", "c3", "r3")}
    SELECT node, round(pr, 6) AS pr
    FROM r3
    ORDER BY pr DESC, node ASC
    LIMIT 20
    """,
)
def d11_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank centrality (3 power iterations, damping 0.85) over the
    customer↔supplier trade graph (who-bought-from-whom via orders ⋈
    lineitem, symmetrized so no node dangles; customers get even node ids,
    suppliers odd) — top-20 hubs. The graph-centrality companion to
    d5/d8's connected components: dedup tells you WHAT is connected,
    PageRank tells you what is IMPORTANT, the score crawl-curation
    pipelines use as a per-source quality prior.

    Scale shape: the edge list + out-degrees materialize once
    (localCheckpoint — iterating over lineage-free ids only); each
    iteration is one equi-join shuffle and one grouped sum on node ids,
    never touching the fact tables again; the node count rides in as a
    1-row broadcast; top-k via TakeOrderedAndProject on the ROUNDED score
    (deterministic cutoff)."""
    from ..operators.dedup import pagerank

    orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, iters=3, damping=0.85)
    return (
        ranks.select("node", F.round("pr", 6).alias("pr"))
        .orderBy(F.desc("pr"), F.asc("node"))
        .limit(20)
    )


@query(
    "d12_triangle_count",
    """
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY 1
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), corner AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ), cnt AS (
      SELECT node, CAST(count(*) AS BIGINT) AS triangles
      FROM corner GROUP BY 1
    )
    SELECT c.node AS part_id, c.triangles, d.deg,
           round(2.0 * c.triangles / (d.deg * (d.deg - 1)), 6) AS clustering
    FROM cnt c JOIN deg d ON d.node = c.node
    ORDER BY c.triangles DESC, part_id ASC
    LIMIT 15
    """,
)
def d12_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the part
    co-purchase graph (parts bought together in one order): the top-15
    most triangle-embedded parts. Triangles are the community-density
    primitive — clustering coefficient separates genuinely cohesive
    neighborhoods from star-shaped hubs, the same diagnostic a near-dup
    cluster audit runs on the d5/d8 component graphs.

    Scale shape: `dedup.triangle_counts` runs the MR node-iterator++
    (Suri & Vassilvitskii WWW'11) — edges oriented from their
    lower-(degree, id) endpoint so a degree-d hub emits O(d) oriented
    edges rather than O(d²) wedges (the power-law skew killer), then
    exactly one wedge per triangle closes via an equi-join on the
    canonical closing edge: two id-only shuffles, no all-pairs product.
    The co-purchase edge list is built with ONE groupBy(orderkey)
    collect_set + in-row array self-pairing (sorted set ⇒ u<v for free)
    instead of a row-level self-join — a TPC-H order holds ≤7 parts, so
    the per-row pair expansion is ≤21 structs, replacing two join-side
    shuffles of the (order, part) table with a single grouped pass.
    Degrees ride along from the orientation pass (with_degree=True), not
    a second scan. The oracle is the independent a<b<c three-way
    self-join. Top-k is a TakeOrderedAndProject on a total order."""
    from ..operators.dedup import triangle_counts

    edges = _copurchase_edges(spark, sf)
    tri = triangle_counts(edges, src="u", dst="v", canonical=True, with_degree=True)
    return (
        tri.select(
            F.col("node").alias("part_id"),
            "triangles",
            "deg",
            F.round(
                F.lit(2.0)
                * F.col("triangles")
                / (F.col("deg") * (F.col("deg") - F.lit(1))),
                6,
            ).alias("clustering"),
        )
        .orderBy(F.desc("triangles"), F.asc("part_id"))
        .limit(15)
    )


@query(
    "d13_cluster_profile",
    "WITH RECURSIVE "
    + _CC_CTES
    + """,
    sizes AS (
      SELECT cluster, count(*) AS sz FROM cc GROUP BY 1
    )
    SELECT CAST(sz AS BIGINT) AS size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY 1""",
)
def d13_cluster_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster SIZE PROFILE — the histogram you read before
    trusting a dedup pass: how many singletons (unique docs), how many
    pairs, and whether a mega-cluster is swallowing the corpus (the
    classic LSH-parameter failure mode: too-loose banding chains
    everything into one component, and only the size histogram shows
    it). Same planted-duplicate corpus and component labels as d5/d6.

    Scale shape: everything downstream of the components is metadata —
    groupBy(cluster) emits cluster-count rows, the histogram reduces
    those to distinct-size rows. The expensive part (MinHash → LSH →
    star-contraction components) is the already-audited d5 plan."""
    _, clusters = _cc_corpus_and_clusters(spark, sf)
    sizes = clusters.groupBy("cluster").agg(F.count("*").alias("size"))
    return sizes.groupBy("size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("size").alias("n_docs"),
    )


@query(
    "d14_cross_source_dup",
    f"""
    WITH corpus AS (
      SELECT source, {_NORM_SQL} AS norm FROM documents
      UNION ALL
      SELECT 'mirrorA' AS source, {_NORM_SQL} AS norm
      FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT 'mirrorB' AS source, {_NORM_SQL} AS norm
      FROM documents WHERE doc_id % 10 = 0
    ), hs AS (
      SELECT DISTINCT md5(norm) AS h, source FROM corpus
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def d14_cross_source_dup(spark: SparkSession, sf: str) -> DataFrame:
    """CROSS-SOURCE duplication matrix — which feeds copy which: for every
    source pair, the number of distinct normalized documents they share.
    The crawl-triage view exact dedup alone doesn't give you (per-doc
    drops say *that* mass is duplicated, not *where it flows from*); a
    hot (A, B) cell means feed B is a mirror of A and can be dropped at
    ingest instead of deduplicated after. Two planted mirror feeds
    (every 4th / every 10th document) keep the matrix non-trivial and
    give the mirrors a known shared row (ids divisible by 20).

    Scale shape: documents collapse to DISTINCT (content-hash, source)
    rows first — the join side is bounded by corpus hashes × sources
    carrying them, and the self-join is an equi join on the hash with
    per-hash fan-out = sources-carrying-that-doc (a handful), never
    doc-count. One distinct shuffle, one hash equi join, one pair agg."""
    from ..operators.dedup import content_hash

    docs = _t(spark, sf, "documents")
    corpus = docs.select("source", "text").unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            F.lit("mirrorA").alias("source"), "text"
        )
    ).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            F.lit("mirrorB").alias("source"), "text"
        )
    )
    hs = corpus.select(content_hash("text").alias("h"), "source").distinct()
    a = hs.select(F.col("h"), F.col("source").alias("source_a"))
    b = hs.select(F.col("h").alias("h_b"), F.col("source").alias("source_b"))
    return (
        a.join(
            b,
            (F.col("h") == F.col("h_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )


def _bands_sql_cfg(bands: int, rpb: int) -> str:
    """Band rows for an arbitrary (bands × rows_per_band) split of the
    16-hash signature — the parametric form of ``_BANDS_SQL``."""
    return " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, md5(concat_ws('|', "
        + ", ".join(f"m{rpb * b + r}" for r in range(rpb))
        + ")) AS band_hash FROM sigs"
        for b in range(bands)
    )


def _lsh_cfg_sql(bands: int, rpb: int) -> str:
    """Per-config CTE chain for d15: banded rows → candidate pairs →
    confusion counts vs the shared ``truth``."""
    tag = f"{bands}x{rpb}"
    return f"""
    banded{tag} AS ({_bands_sql_cfg(bands, rpb)}),
    pred{tag} AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded{tag} a JOIN banded{tag} b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), stats{tag} AS (
      SELECT CAST({bands} AS BIGINT) AS bands,
             CAST({rpb} AS BIGINT) AS rows_per_band,
             CAST(sum(in_pred) AS BIGINT) AS n_candidates,
             CAST(sum(in_pred * in_truth) AS BIGINT) AS tp,
             CAST(sum(in_pred * (1 - in_truth)) AS BIGINT) AS fp,
             CAST(sum((1 - in_pred) * in_truth) AS BIGINT) AS fn,
             round(CAST(sum(in_pred * in_truth) AS DOUBLE)
                   / greatest(sum(in_pred), 1), 6) AS precision_,
             round(CAST(sum(in_pred * in_truth) AS DOUBLE)
                   / greatest(sum(in_truth), 1), 6) AS recall
      FROM (
        SELECT CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_pred,
               CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_truth
        FROM pred{tag} p FULL OUTER JOIN truth t
          ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
      )
    )"""


@query(
    "d15_lsh_band_tuning",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, concat(text, ' zz') AS text
      FROM documents WHERE doc_id < 20
    ), norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), sigs AS (
      SELECT doc_id,
           {{minhash}}
      FROM sh GROUP BY doc_id
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), truth AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.5
    ),
    {{cfg1}},
    {{cfg2}},
    {{cfg3}}
    SELECT * FROM stats2x8
    UNION ALL SELECT * FROM stats4x4
    UNION ALL SELECT * FROM stats8x2
    """.format(
        minhash=_MINHASH_AGGS_SQL,
        cfg1=_lsh_cfg_sql(2, 8),
        cfg2=_lsh_cfg_sql(4, 4),
        cfg3=_lsh_cfg_sql(8, 2),
    ),
)
def d15_lsh_band_tuning(spark: SparkSession, sf: str) -> DataFrame:
    """LSH banding TUNING CURVE — precision/recall of the MinHash
    candidate generator at three splits of the same 16-hash signature
    (2×8 strict … 8×2 loose) against exact-Jaccard≥0.5 truth. The dedup
    twin of v15's recall-vs-nprobe curve: banding theory says collision
    probability is 1−(1−J^r)^b, and this measures where each config's
    cliff actually lands on the corpus at hand, so the dedup pass picks
    (b, r) from data. x30 audits ONE config; this emits the curve.

    Scale shape: ONE signature build (the d2 plan) feeds all three
    configs — banding is a projection of the signature array, candidates
    are band equi-joins, and each config's confusion counts come from a
    full-outer join of two metadata-sized pair lists against the shared
    exact-truth side (posting-list join, corpus-bounded by construction
    here; sampled slice at scale)."""
    from ..operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
    )
    # Materialize the shared intermediates ONCE (optimization round 12 —
    # the d9 fix): unmaterialized, the scan→shingle→distinct lineage
    # re-executed ~9x here (three band configs × two sides of each banded
    # self-join all rebuild sigs→sh; truth's posting join reads sh 3x and
    # is itself re-read by all three configs). All three tables are
    # bounded by the query's own doc_id<100 corpus cap.
    sh = reliable_checkpoint(shingles(corpus, n=3))
    sigs = reliable_checkpoint(
        minhash_signatures(sh, num_hashes=16, token_col="shingle")
    )
    truth = reliable_checkpoint(
        jaccard_pairs(sh, threshold=0.5, token_col="shingle", max_token_df=None)
        .select("doc_a", "doc_b")
        .withColumn("in_truth", F.lit(1))
    )
    out = None
    for bands, rpb in ((2, 8), (4, 4), (8, 2)):
        pred = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rpb).withColumn(
            "in_pred", F.lit(1)
        )
        joined = pred.join(truth, ["doc_a", "doc_b"], "full_outer").select(
            F.coalesce("in_pred", F.lit(0)).alias("in_pred"),
            F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
        )
        tp = F.sum(F.col("in_pred") * F.col("in_truth"))
        stats = joined.groupBy().agg(
            F.lit(bands).cast("bigint").alias("bands"),
            F.lit(rpb).cast("bigint").alias("rows_per_band"),
            F.sum("in_pred").cast("bigint").alias("n_candidates"),
            tp.cast("bigint").alias("tp"),
            F.sum(F.col("in_pred") * (1 - F.col("in_truth")))
            .cast("bigint")
            .alias("fp"),
            F.sum((1 - F.col("in_pred")) * F.col("in_truth"))
            .cast("bigint")
            .alias("fn"),
            F.round(
                tp.cast("double") / F.greatest(F.sum("in_pred"), F.lit(1)), 6
            ).alias("precision_"),
            F.round(
                tp.cast("double") / F.greatest(F.sum("in_truth"), F.lit(1)), 6
            ).alias("recall"),
        )
        out = stats if out is None else out.unionByName(stats)
    return out


def _copurchase_edges(
    spark: SparkSession, sf: str, max_part: int | None = None
) -> DataFrame:
    """Canonical (u < v, distinct) part co-purchase edges, materialized.

    One groupBy(orderkey) collect_set + in-row sorted-array self-pairing
    (a TPC-H order holds ≤7 parts ⇒ ≤21 pair structs per row) — one
    grouped shuffle + the dedup shuffle, instead of a two-sided row
    self-join on orderkey. Shared by the graph analytics (d12, d16).

    ``max_part`` restricts to the subgraph induced on part keys below the
    bound (filter pushed to the lineitem scan — for induced subgraphs the
    source filter and the edge filter are equivalent, and the source
    filter never materializes out-of-scope edges)."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    if max_part is not None:
        li = li.filter(F.col("l_partkey") < max_part)
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    return (
        g.select(F.explode(pair_structs).alias("e"))
        .select("e.u", "e.v")
        .distinct()
        .transform(reliable_checkpoint)
    )


@query(
    "d16_degree_assortativity",
    """
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY 1
    ), ends AS (
      SELECT du.deg AS dx, dv.deg AS dy
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.deg AS dx, du.deg AS dy
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           (SELECT round(avg(deg), 6) FROM deg) AS avg_deg,
           round(corr(dx, dy), 6) AS assortativity
    FROM ends
    """,
)
def d16_degree_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph — the Pearson
    correlation of endpoint degrees over the symmetrized edge-end list
    (Newman 2002). The structural dial a dedup/similarity-graph audit
    reads before trusting component shapes: assortative graphs (hubs
    link hubs) concentrate near-dup mass into dense cores that keep-one
    dedup prunes aggressively, while disassortative hub-leaf stars are
    the template/boilerplate signature (one hub document with thousands
    of light variants).

    Scale shape: edges from `_copurchase_edges` (grouped pair expansion,
    no row self-join); degrees are one explode+groupBy over the
    materialized edges; the corr() is a single agg over the 2m edge-end
    rows with the three scalar corpus stats (node count, edge count,
    mean degree) folded back as 1-row broadcasts — no driver-side math.
    The degree table is node-count-scaled (grows with the corpus), so its
    broadcast is GUARDED by the same measured-count + bytes-budget
    decision `triangle_counts` uses (`operators/dedup.maybe_broadcast`):
    under the budget the hint saves two shuffles, above it the join is a
    plain equi-join AQE plans from runtime stats — never a forced
    driver-memory broadcast of a corpus-scaled frame.
    The oracle recomputes everything from the raw a<b self-join CTE.

    Determinism: corr/avg over exact integer degrees; round(·, 6) after
    the one transcendental-free division chain both engines execute in
    IEEE doubles."""
    from ..operators.dedup import maybe_broadcast

    edges = _copurchase_edges(spark, sf)
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .transform(reliable_checkpoint)
    )
    n_nodes_ct = deg.count()  # measured on the materialized checkpoint
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    du = maybe_broadcast(du, n_nodes_ct, 32)
    dv = maybe_broadcast(dv, n_nodes_ct, 32)
    j = edges.join(du, "u").join(dv, "v")
    # One-pass moment form (optimization round 11): the old
    # union-then-corr() executed the degree join TWICE (one per union
    # branch) and shuffled 2m end rows into the Pearson aggregate. Over
    # the SYMMETRIZED end list the x and y marginals are identical, so
    # r = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with n = 2m ends,
    # Σx = Σy = Σ(deg_u+deg_v), Σx² = Σy² = Σ(deg_u²+deg_v²),
    # Σxy = 2·Σ(deg_u·deg_v) — four EXACT integer sums in ONE aggregate
    # over the join (edge count rides along), combined in IEEE doubles
    # only at the final 1-row select. Deterministic (integer sums are
    # order-independent, unlike the incremental float co-moment), and
    # the corr-input shuffle + duplicate join execution are gone.
    stats = j.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.col("deg_u") + F.col("deg_v")).alias("s1"),
        F.sum(
            F.col("deg_u") * F.col("deg_u") + F.col("deg_v") * F.col("deg_v")
        ).alias("s2"),
        F.sum(F.col("deg_u") * F.col("deg_v")).alias("sxy_half"),
    )
    node_stats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.round(F.avg("deg"), 6).alias("avg_deg"),
    )
    n_ends = (F.col("n_edges") * 2).cast("double")
    s1 = F.col("s1").cast("double")
    assort = F.round(
        (n_ends * F.lit(2.0) * F.col("sxy_half") - s1 * s1)
        / (n_ends * F.col("s2").cast("double") - s1 * s1),
        6,
    )
    return (
        node_stats.crossJoin(F.broadcast(stats))
        .select("n_nodes", "n_edges", "avg_deg", assort.alias("assortativity"))
    )


@query(
    "d17_adamic_adar",
    r"""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), sym AS (
      SELECT u AS z, v AS n FROM e UNION ALL SELECT v, u FROM e
    ), wt AS (
      -- 1/ln(deg) quantized to a 1e-9 grid so the per-pair sum is an
      -- EXACT integer sum: partition-order independent on the Spark
      -- side, bit-identical here (see operators/dedup.adamic_adar)
      SELECT z, count(*) AS d,
             CAST(round(1.0 / ln(CAST(count(*) AS DOUBLE)) * 1e9)
                  AS BIGINT) AS w
      FROM sym GROUP BY z
      HAVING count(*) BETWEEN 2 AND 1024
    ), focus AS (
      SELECT DISTINCT l_partkey AS fu FROM lineitem ORDER BY 1 LIMIT 8
    ), wedges AS (
      SELECT a.n AS u, b.n AS v, wt.w
      FROM sym a
      JOIN sym b ON a.z = b.z AND a.n <> b.n
      JOIN wt ON wt.z = a.z
      JOIN focus ON focus.fu = a.n
    ), scores AS (
      SELECT u, v, CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(w) AS DOUBLE) / 1e9 AS aa
      FROM wedges GROUP BY 1, 2
    ), nonedges AS (
      SELECT s.* FROM scores s
      WHERE NOT EXISTS (SELECT 1 FROM sym WHERE sym.z = s.u AND sym.n = s.v)
    ), ranked AS (
      SELECT u, v, common_neighbors, round(aa, 6) AS aa_score,
             row_number() OVER (
               PARTITION BY u ORDER BY round(aa, 6) DESC, v ASC) AS rank
      FROM nonedges
    )
    SELECT u, v, rank, common_neighbors, aa_score
    FROM ranked WHERE rank <= 5
    """,
)
def d17_adamic_adar(spark: SparkSession, sf: str) -> DataFrame:
    """Adamic-Adar link prediction over the part co-purchase graph, scoped
    to a watchlist: for each of the 8 lowest part keys, the 5 strongest
    PREDICTED (non-existing) co-purchase links, scored
    AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z) (Adamic & Adar 2003). On a
    near-duplicate or co-occurrence graph this is the "which clusters are
    about to merge / which association is missing" audit — the graph-ML
    feature-generation step of a training-data pipeline, run for a node
    watchlist exactly as here.

    Scale shape (see ``operators/dedup.adamic_adar``): all-pairs AA is
    inherently Σ_z deg(z)² — on this deliberately DENSE graph (avg degree
    ~116 at sf0.01) that is the whole cost, so the operator takes the
    watchlist as a broadcast ``focus`` frame and carves out exactly the
    focus wedges with two EQUI-joins: sym⋈focus on the neighbor end
    gives the (z, u) legs (Σ_{u∈focus} deg u rows), and joining the legs
    back on z fans out the co-neighbors v — K focus nodes cost ≤ K·2m
    wedge rows, corpus-linear no matter how dense the graph, with no
    BNLJ and no per-node array state. Existing edges leave via a LEFT
    ANTI join on the thin adjacency. The oracle independently rebuilds
    everything from the raw row self-join formulation.

    Determinism: each weight 1/ln(deg z) is quantized to a 1e-9 fixed
    grid (``round(w·1e9)`` as BIGINT, see the oracle's ``wt`` CTE and
    the operator docstring), so the per-pair score is an EXACT integer
    sum — partition-order independent on the Spark side, bit-identical
    in DuckDB — divided back by 1e9 only at emission; ranking uses the
    round(·, 6)-guarded score with a total (score desc, v asc)
    tiebreak."""
    from ..operators.dedup import adamic_adar

    edges = _copurchase_edges(spark, sf)
    focus = (
        _t(spark, sf, "lineitem")
        .select("l_partkey")
        .distinct()
        .orderBy("l_partkey")
        .limit(8)
    )
    scores = adamic_adar(
        edges, src="u", dst="v", canonical=True, hub_cap=1024, focus=focus
    )
    w = Window.partitionBy("u").orderBy(
        F.desc(F.round(F.col("aa_score"), 6)), F.asc("v")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "u", "v", "rank", "common_neighbors",
            F.round("aa_score", 6).alias("aa_score"),
        )
    )


@query(
    "d18_triangle_sample_audit",
    f"""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), es AS (
      -- DOULION keep rule: first 32 md5 bits of 'tri:u:v' < p * 2^32
      SELECT u, v FROM e
      WHERE ({_u32_sql("'tri:' || u || ':' || v")}) < 2147483648
    ), tri_exact AS (
      SELECT e1.u FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), tri_samp AS (
      SELECT e1.u FROM es e1
      JOIN es e2 ON e2.u = e1.v
      JOIN es e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT 0.5 AS sample_p,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS total_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM es) AS kept_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM tri_exact) AS exact_triangles,
           round((SELECT count(*) FROM tri_samp) * 8.0, 6) AS est_triangles,
           round(((SELECT count(*) FROM tri_samp) * 8.0
                  - (SELECT count(*) FROM tri_exact))
                 / (SELECT count(*) FROM tri_exact) * 100, 4) AS rel_error_pct
    """,
)
def d18_triangle_sample_audit(spark: SparkSession, sf: str) -> DataFrame:
    """DOULION sampled-triangle estimate vs the exact count — the error
    audit that licenses the approximate mode at corpus scale. d12's exact
    counter is triangle-OUTPUT-bound (~10M-edge co-purchase graphs close
    tens of millions of triangles); DOULION (Tsourakakis et al., KDD'09)
    sparsifies edges at probability p and scales by 1/p³, cutting the
    intersection cost ~p³ while keeping the estimate unbiased. This query
    runs BOTH at p = 0.5 on the co-purchase graph and reports the
    relative error — the d9-style "is the cheap mode trustworthy" check.

    Determinism: the sample is a HASH rule, not rand() —
    ``operators/dedup.doulion_keep`` keeps an edge iff the first 32 md5
    bits of ``tri:u:v`` < p·2³², which the oracle replays bit-for-bit;
    with p = 2⁻¹ the 1/p³ = 8 scale-up keeps every estimate an exact
    binary integer, so the double sums are order-independent. Totals
    fold in as 1-row aggregate crossJoins (the a3 pattern), one action.

    Single-enumeration form (optimization round 11): both totals derive
    from ONE oriented-close pass (``triangle_close_edges``) instead of
    two full triangle_counts runs. A triangle of the sampled graph is
    exactly a full-graph triangle whose 3 canonical edges all pass the
    hash keep rule, so the DOULION count is replayed per enumerated
    triangle as a pure expression (2 md5s per closing node + 1 per
    closing edge) — the second degree/orientation/adjacency/close pass
    and both per-node rollup shuffles are gone, and the totals are the
    same exact integers: Σ size(common) = T_exact (each triangle closes
    at exactly one oriented edge), and Σ surviving/p³ = the old
    Σ per-node estimates / 3 (both equal 8·T_samp in exact binary)."""
    from ..operators.dedup import doulion_keep, triangle_close_edges

    p = 0.5
    edges = _copurchase_edges(spark, sf)
    _deg, tri = triangle_close_edges(
        edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    )

    def _keep(x, y):  # canonical (least, greatest) order — the sample rule
        return doulion_keep(F.least(x, y), F.greatest(x, y), p)

    samp_cnt = F.when(
        _keep(F.col("u"), F.col("v")),
        F.size(
            F.filter(
                F.col("common"),
                lambda c: _keep(F.col("u"), c) & _keep(F.col("v"), c),
            )
        ),
    ).otherwise(F.lit(0))
    tri_tot = tri.agg(  # one pass: both totals from the same enumeration
        F.sum(F.size("common")).cast("long").alias("exact_triangles"),
        (F.sum(samp_cnt).cast("double") / F.lit(p**3)).alias("est_raw"),
    )
    edge_tot = edges.agg(
        F.count("*").alias("total_edges"),
        F.sum(
            F.when(doulion_keep(F.col("u"), F.col("v"), p), 1).otherwise(0)
        ).cast("long").alias("kept_edges"),
    )
    return (
        edge_tot.crossJoin(tri_tot)
        .select(
            F.lit(p).alias("sample_p"),
            "total_edges",
            "kept_edges",
            "exact_triangles",
            F.round(F.col("est_raw"), 6).alias("est_triangles"),
            F.round(
                (F.col("est_raw") - F.col("exact_triangles"))
                / F.col("exact_triangles") * 100,
                4,
            ).alias("rel_error_pct"),
        )
    )


def _discrete_lower_median(df: DataFrame, col: str):
    """Discrete LOWER median of ``df[col]`` — the value at rank
    ``floor((n+1)/2)`` under ascending order — as ONE collected metadata
    scalar, with the row-scale work kept distributed: one groupBy on the
    value, then cumulative-count and grand-total windows over the
    DISTINCT values only (metadata scale, bounded by the value range).
    The scale-safe replacement (round-11 advice) for a global
    ``row_number`` window, which single-partition-sorts the whole table.
    Shared by d19's degree threshold and d22's support threshold; raises
    loudly on an empty input (the statistic is undefined — callers that
    can see empty inputs must decide before calling, as kcore's
    empty-graph short-circuit does)."""
    dist = df.groupBy(col).agg(F.count("*").alias("n"))
    wcum = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    rows = (
        dist.select(
            col,
            F.sum("n").over(wcum).alias("cum"),
            F.sum("n").over(Window.partitionBy()).alias("total"),
        )
        .filter(F.col("cum") >= F.floor((F.col("total") + 1) / 2))
        .orderBy(col)
        .limit(1)
        .collect()
    )
    if not rows:
        raise ValueError(f"discrete median of empty input ({col})")
    return rows[0][col]



def _kcore_iter_sql(prev: str, cur: str) -> str:
    """One unrolled k-core peel CTE: keep only edges whose BOTH endpoints
    have degree >= k in the previous round's surviving edge set — matches
    ``operators/dedup.kcore`` round-for-round. Peeling is idempotent at
    the fixpoint, so unrolling MORE stages than the data needs is a no-op
    (the oracle unrolls 12: sf0.001 needs 3, sf0.01 needs 6 — measured,
    2x margin). MATERIALIZED is load-bearing: each stage reads its
    predecessor three times, so un-materialized CTE inlining would blow
    up 3^12 scans of the base parquet."""
    return f"""
    {cur} AS MATERIALIZED (
      SELECT e.u, e.v FROM {prev} e
      JOIN (SELECT node FROM (SELECT u AS node FROM {prev}
                              UNION ALL SELECT v FROM {prev})
            GROUP BY 1 HAVING count(*) >= (SELECT k FROM kk)) ka
        ON ka.node = e.u
      JOIN (SELECT node FROM (SELECT u AS node FROM {prev}
                              UNION ALL SELECT v FROM {prev})
            GROUP BY 1 HAVING count(*) >= (SELECT k FROM kk)) kb
        ON kb.node = e.v
    )"""


@query(
    "d19_kcore_prune",
    """
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), deg0 AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
      GROUP BY 1
    ), kk AS MATERIALIZED (
      -- data-relative threshold: k = ceil(0.7 * discrete lower-median
      -- degree); both engines compute the identical IEEE 0.7*m product
      SELECT CAST(ceil(0.7 * deg) AS BIGINT) AS k
      FROM (SELECT deg,
                   row_number() OVER (ORDER BY deg, node) AS rn,
                   count(*) OVER () AS c
            FROM deg0)
      WHERE rn = (c + 1) // 2
    ),"""
    + "".join(
        _kcore_iter_sql(f"e{i}", f"e{i + 1}") + ("," if i < 11 else "")
        for i in range(12)
    )
    + """
    SELECT node, CAST(count(*) AS BIGINT) AS core_deg
    FROM (SELECT u AS node FROM e12 UNION ALL SELECT v FROM e12)
    -- fixpoint guard: the unroll is only valid if stage 12 changed
    -- nothing vs stage 11; at a scale factor whose peel depth exceeds
    -- the unroll this FAILS LOUDLY instead of silently hash-mismatching
    -- (round-9 advice; measured depth: 3 rounds at sf0.001, 6 at sf0.01
    -- — a 2x margin under the 12-stage unroll)
    WHERE (SELECT CASE WHEN (SELECT count(*) FROM e11)
                          = (SELECT count(*) FROM e12)
           THEN 1 ELSE error(
             'd19 oracle: peel depth exceeds the 12-stage unroll at this sf'
           ) END) = 1
    GROUP BY 1
    ORDER BY node
    """,
)
def d19_kcore_prune(spark: SparkSession, sf: str) -> DataFrame:
    """k-core pruning of the co-purchase graph (Seidman 1983): strip the
    low-degree periphery before dense-cluster analytics — the cheap
    pre-pass that caps the wedge/triangle cost of d12/d17 on power-law
    graphs. Nontrivial here by construction: the threshold is
    data-relative, k = ceil(0.7 x the discrete lower-median degree), so a
    peel cascade exists at every sf (measured: 3 fixpoint rounds at
    sf0.001, 6 at sf0.01).

    Scale shape: `operators/dedup.kcore` peels iteratively — per round
    ONE id-only degree groupBy (persisted, shared by the convergence test
    and both semi joins) + two LEFT SEMI joins on the surviving edges,
    reliable-checkpointed (the d8 CC durability contract); the fixpoint
    test is fused into the round (drop-count on the degree table, decided
    BEFORE the joins), so convergence costs one cheap count job instead
    of a wasted full round. The median-degree threshold is ONE metadata
    scalar collected from the degree table (the repo's convergence-scalar
    convention); everything else stays distributed. The oracle replays
    the peel as 12 unrolled CTE stages (idempotent past the fixpoint,
    and GUARDED: a WHERE-level error() fires if stage 11 vs 12 counts
    still differ, so a deeper-than-12 peel fails loudly instead of
    silently diverging) and the identical ceil(0.7*median) threshold."""
    import math

    from ..operators.dedup import kcore

    def median_k(degs: DataFrame) -> int:
        """ceil(0.7 × discrete lower median degree), computed from the
        peel's OWN persisted round-0 degree table (the round-11
        threshold_fn hook — the separate median pass used to re-aggregate
        the whole edge list that round 0 immediately re-aggregated);
        kcore's empty-graph short-circuit guarantees this is never
        called on an empty table."""
        return int(math.ceil(0.7 * _discrete_lower_median(degs, "deg")))

    core = kcore(
        _copurchase_edges(spark, sf), None,
        src="u", dst="v", canonical=True, threshold_fn=median_k,
    )
    return core.select(
        "node", F.col("deg").cast("long").alias("core_deg")
    ).orderBy("node")


def _ppr_iter_sql(prev: str, cur: str) -> str:
    """One unrolled personalized-PageRank iteration CTE, matching
    ``operators/dedup.personalized_pagerank``'s float-op order exactly:
    mass = Σ pr/deg summed FIRST, then ×0.85; restart term 0.15·r; the
    final per-node total is one two-value IEEE addition (commutative, so
    Spark's union-then-sum and this UNION ALL agree bit-for-bit)."""
    return f"""
    {cur} AS MATERIALIZED (
      SELECT node, sum(pr) AS pr FROM (
        SELECT node, 0.15 * r AS pr FROM restart
        UNION ALL
        SELECT dst AS node, 0.85 * mass AS pr FROM (
          SELECT e.dst, sum(p.pr / d.deg) AS mass
          FROM {prev} p
          JOIN edges e ON e.src = p.node
          JOIN deg d ON d.src = p.node
          GROUP BY 1
        )
      ) GROUP BY 1
    )"""


@query(
    "d20_personalized_pagerank",
    f"""
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), edges AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e
    ), deg AS MATERIALIZED (
      SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY 1
    ), seeds AS (
      SELECT DISTINCT l_partkey AS node FROM lineitem ORDER BY 1 LIMIT 8
    ), ns AS (
      SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds
    ), restart AS MATERIALIZED (
      SELECT node, 1.0 / ns.n AS r FROM seeds CROSS JOIN ns
    ), p0 AS (
      SELECT node, r AS pr FROM restart
    ), {_ppr_iter_sql("p0", "p1")},
    {_ppr_iter_sql("p1", "p2")},
    {_ppr_iter_sql("p2", "p3")}
    SELECT node, round(pr, 6) AS ppr
    FROM p3
    ORDER BY round(pr, 6) DESC, node ASC
    LIMIT 20
    """,
)
def d20_personalized_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Personalized PageRank from the d17 watchlist (8 seed parts) over
    the symmetrized co-purchase graph: top-20 nodes by walk proximity to
    the seeds — the "grow this seed set" expansion move (start from
    known-good or known-bad documents, rank the corpus by random-walk
    closeness). Complements d11 (global centrality: what is important
    anywhere) and d17 (missing-link prediction: what SHOULD be adjacent):
    d20 ranks the existing neighborhood by multi-hop reachability.

    Scale shape (see ``operators/dedup.personalized_pagerank``): the rank
    vector stays sparse — only the seeds' iters-hop neighborhood ever
    materializes rows, vs the global teleport's all-n vector; per
    iteration one equi-join + grouped sum on id-only rows. Top-k on the
    ROUNDED score with a node tiebreak (deterministic cutoff, the d11
    convention)."""
    from ..operators.dedup import personalized_pagerank

    canon = _copurchase_edges(spark, sf)
    edges = canon.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(canon.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    seeds = (
        _t(spark, sf, "lineitem")
        .select("l_partkey")
        .distinct()
        .orderBy("l_partkey")
        .limit(8)
    )
    ranks = personalized_pagerank(edges, seeds, iters=3, damping=0.85)
    return (
        ranks.select("node", F.round("pr", 6).alias("ppr"))
        .orderBy(F.desc(F.round(F.col("pr"), 6)), F.asc("node"))
        .limit(20)
    )


@query(
    "d21_neardup_cap_audit",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      -- planted duplication spike: 15 verbatim copies of doc 0 — the
      -- Theta(M^2) pair-clique pathology the cap exists for
      SELECT 200000 + i AS doc_id, text
      FROM documents, unnest(generate_series(1, 15)) t(i)
      WHERE doc_id = 0
    ), norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    ), shf AS (
      SELECT sh.doc_id, sh.shingle FROM sh
      JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000) f
        USING (shingle)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shf GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b,
             CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
      FROM inter JOIN sizes sa ON sa.doc_id = doc_a
                 JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.02
    ), ranked AS (
      SELECT least(_src, _dst) AS doc_a, greatest(_src, _dst) AS doc_b,
             min(r) AS best_rank
      FROM (
        SELECT _src, _dst,
               row_number() OVER (
                 PARTITION BY _src ORDER BY _s DESC, _dst ASC) AS r
        FROM (
          SELECT doc_a AS _src, doc_b AS _dst, jaccard AS _s FROM pairs
          UNION ALL
          SELECT doc_b, doc_a, jaccard FROM pairs
        )
      ) GROUP BY 1, 2
    ), scored AS (
      SELECT p.doc_a, p.doc_b, p.jaccard, r.best_rank,
             CAST(round(p.jaccard * 1e6) AS BIGINT) AS sim_micro
      FROM pairs p JOIN ranked r USING (doc_a, doc_b)
    )
    SELECT k, (best_rank <= k) AS kept,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN (doc_a = 0 OR doc_a >= 200000)
                          AND doc_b >= 200000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_spike_pairs,
           round(min(jaccard), 6) AS min_sim,
           round(max(jaccard), 6) AS max_sim,
           round(CAST(sum(sim_micro) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / 1e6, 6) AS mean_sim
    FROM scored, unnest([1, 3, 5]) kk(k)
    GROUP BY 1, 2
    ORDER BY k, kept
    """,
)
def d21_neardup_cap_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Audit of the near-dup output cap (round-10 task 7): what would
    ``cap_pairs_per_doc`` keep and discard at k = 1, 3, 5 on a corpus with
    a planted duplication SPIKE (15 verbatim copies of one document — the
    Theta(M^2) pair-clique pathology that makes uncapped pair emission the
    100 TB bottleneck)?

    Per (k, kept) bucket: pair count, how many are spike-clique pairs,
    and the min/max/mean similarity — the d9-style "what does the cheap
    mode cost" evidence a curator reads before opting into the cap. The
    spike rows make the headline visible: the 120-pair clique collapses
    to O(k·M) kept pairs while every discarded pair's similarity is
    bounded by the kept min of some endpoint.

    Scale shape: pairs come from the d3 posting-list join (df-capped, no
    cartesian); ranking is ``operators/dedup.neighbor_rank`` — one explode
    to the two directed copies, one row_number window per endpoint, one
    groupBy back to canonical pairs, all id-only shuffles; the k-sweep is
    an explode over three literals, not three plan copies.

    Determinism: ranking orders by the RAW IEEE jaccard (identical
    integer-division doubles both engines) with a doc-id tiebreak; the
    mean is an exact integer sum of 1e-6-quantized micro-units divided
    once at emission (the d17 scheme)."""
    from ..operators.dedup import jaccard_pairs, neighbor_rank, shingles

    docs = _t(spark, sf, "documents")
    spike = (
        docs.filter(F.col("doc_id") == 0)
        .select(F.explode(F.sequence(F.lit(1), F.lit(15))).alias("i"), "text")
        .select((F.col("i") + 200000).alias("doc_id"), "text")
    )
    corpus = docs.filter(F.col("doc_id") < 100).select("doc_id", "text").unionByName(spike)
    # shingles materialized once (optimization round 12, the d3 fix)
    pairs = jaccard_pairs(
        reliable_checkpoint(shingles(corpus, n=3)),
        threshold=0.02,
        token_col="shingle",
    )
    ranked = neighbor_rank(pairs.select("doc_a", "doc_b", "jaccard"))
    is_spike = (
        ((F.col("doc_a") == 0) | (F.col("doc_a") >= 200000))
        & (F.col("doc_b") >= 200000)
    ).cast("int")
    return (
        ranked.select(
            "doc_a", "doc_b", "jaccard", "best_rank",
            F.round(F.col("jaccard") * 1e6).cast("long").alias("sim_micro"),
            F.explode(F.array(F.lit(1), F.lit(3), F.lit(5))).alias("k"),
        )
        .groupBy("k", (F.col("best_rank") <= F.col("k")).alias("kept"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(is_spike).cast("long").alias("n_spike_pairs"),
            F.round(F.min("jaccard"), 6).alias("min_sim"),
            F.round(F.max("jaccard"), 6).alias("max_sim"),
            F.round(
                F.sum("sim_micro").cast("double")
                / F.count("*").cast("double") / F.lit(1e6),
                6,
            ).alias("mean_sim"),
        )
        .orderBy("k", "kept")
    )


def _ktruss_iter_sql(prev: str, tri: str, cur: str) -> str:
    """One unrolled k-truss peel stage: enumerate triangles on ``prev``
    with the oriented x<y<z wedge join (the d12/d18 shape), explode each
    to its 3 edges for per-edge support, keep edges with support >=
    min_sup. MATERIALIZED so stages execute once each; idempotent past
    the fixpoint."""
    return f"""
    {tri} AS MATERIALIZED (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM {prev} e1 JOIN {prev} e2 ON e2.u = e1.v
      JOIN {prev} e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    {cur} AS MATERIALIZED (
      SELECT e.u, e.v FROM {prev} e
      JOIN (
        SELECT u, v, count(*) AS s FROM (
          SELECT x AS u, y AS v FROM {tri}
          UNION ALL SELECT x, z FROM {tri}
          UNION ALL SELECT y, z FROM {tri}
        ) GROUP BY 1, 2
      ) s ON s.u = e.u AND s.v = e.v
      WHERE s.s >= (SELECT min_sup FROM kk)
    )"""


@query(
    "d22_ktruss_prune",
    """
    WITH pairs AS (
      -- analysis scope: the first 4,000 part keys (the d17 watchlist
      -- convention) — the full graph at sf <= 0.02, a bounded induced
      -- subgraph beyond; the OPERATOR takes any edge set (the unbounded
      -- full-graph run is recorded in PERF.md)
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
      WHERE l_partkey < 4000
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), tri0 AS MATERIALIZED (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM e0 e1 JOIN e0 e2 ON e2.u = e1.v
      JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
    ), supall0 AS (
      -- initial per-edge support over ALL edges (0 for triangle-free)
      SELECT e.u, e.v, coalesce(s.s, 0) AS s
      FROM e0 e LEFT JOIN (
        SELECT u, v, count(*) AS s FROM (
          SELECT x AS u, y AS v FROM tri0
          UNION ALL SELECT x, z FROM tri0
          UNION ALL SELECT y, z FROM tri0
        ) GROUP BY 1, 2
      ) s ON s.u = e.u AND s.v = e.v
    ), kk AS MATERIALIZED (
      -- data-relative threshold: min support = max(1, ceil(0.3 * discrete
      -- lower-median initial support)); identical IEEE 0.3*m both engines
      SELECT GREATEST(1, CAST(ceil(0.3 * s) AS BIGINT)) AS min_sup
      FROM (SELECT s,
                   row_number() OVER (ORDER BY s, u, v) AS rn,
                   count(*) OVER () AS c
            FROM supall0)
      WHERE rn = (c + 1) // 2
    ),"""
    + "".join(
        _ktruss_iter_sql(f"e{i}", f"tri{i + 1}", f"e{i + 1}") + ("," if i < 7 else "")
        for i in range(8)
    )
    + """,
    trif AS MATERIALIZED (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM e8 e1 JOIN e8 e2 ON e2.u = e1.v
      JOIN e8 e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT e.u, e.v, CAST(s.s AS BIGINT) AS support
    FROM e8 e JOIN (
      SELECT u, v, count(*) AS s FROM (
        SELECT x AS u, y AS v FROM trif
        UNION ALL SELECT x, z FROM trif
        UNION ALL SELECT y, z FROM trif
      ) GROUP BY 1, 2
    ) s ON s.u = e.u AND s.v = e.v
    -- fixpoint guard (the d19 convention): the 8-stage unroll is only
    -- valid if stage 8 changed nothing vs stage 7 — fail loudly at a
    -- scale factor whose peel depth exceeds the unroll (measured depth:
    -- 1 at sf0.001, 4 at sf0.01 — a 2x margin)
    WHERE (SELECT CASE WHEN (SELECT count(*) FROM e7)
                          = (SELECT count(*) FROM e8)
           THEN 1 ELSE error(
             'd22 oracle: peel depth exceeds the 8-stage unroll at this sf'
           ) END) = 1
    ORDER BY e.u, e.v
    """,
)
def d22_ktruss_prune(spark: SparkSession, sf: str) -> DataFrame:
    """k-truss pruning of the co-purchase graph (Cohen 2008): keep only
    edges closing >= k-2 triangles INSIDE the surviving subgraph — the
    edge-level sharpening of d19's k-core (a hub's spoke edges survive
    coreness but close no triangles; the truss drops them), the standard
    cohesive-community pre-pass before clustering a similarity graph.
    Nontrivial by construction: the threshold is data-relative,
    min support = max(1, ceil(0.3 x discrete lower-median initial
    support)) (measured peel: 1 fixpoint round at sf0.001 — the tiny
    graph is uniformly dense — 4 rounds / 382 pruned edges at sf0.01,
    2 rounds / 18,660 pruned at sf0.1). The QUERY analyzes the
    first-4,000-part-keys scope (the d17 watchlist convention: the full
    graph at sf <= 0.02, a bounded induced subgraph beyond, so the
    benched cost is the analysis, not an ever-growing whole-graph
    enumeration); the OPERATOR is scope-free and its unbounded
    full-graph sf0.1 run is recorded in PERF.md.

    Scale shape: `operators/dedup.ktruss` — per round ONE oriented-wedge
    triangle enumeration (the d12 x<y<z equi-join shape, never an
    all-pairs product) + one id-only support groupBy + the fused
    drop-count fixpoint test on a persisted (edge, support) table (the
    kcore round-10 contract); at the fixpoint that table IS the result,
    checkpointed and returned with no extra triangle pass. The
    median-support threshold is ONE metadata scalar (the d19
    convention). The oracle replays the peel as 8 unrolled CTE stages,
    GUARDED: a WHERE-level error() fires if stage 7 vs 8 still differ,
    so a deeper-than-8 peel fails loudly instead of silently
    diverging."""
    import math

    from ..operators.dedup import ktruss

    edges = _copurchase_edges(spark, sf, max_part=4000)

    def median_k(scored: DataFrame) -> int:
        """max(1, ceil(0.3 × discrete lower-median initial support)) + 2,
        computed from the peel's OWN persisted round-0 (a, b, support)
        table (the ktruss threshold_fn hook — the separate median pass
        used to re-run the exact wedge join + support groupBy that round
        0 immediately repeated); ktruss's empty-graph short-circuit
        guarantees this is never called on an empty table. The discrete
        LOWER median (rank floor((n+1)/2) ascending) keeps the edge-scale
        work distributed and single-pass (one metadata scalar)."""
        m = _discrete_lower_median(scored, "support")
        return max(1, int(math.ceil(0.3 * m))) + 2

    truss = ktruss(
        edges, None, src="u", dst="v", canonical=True, threshold_fn=median_k
    )
    return (
        truss.select(
            F.col("a").alias("u"), F.col("b").alias("v"),
            F.col("support").cast("long").alias("support"),
        )
        .orderBy("u", "v")
    )


@query(
    "d23_clustering_coefficient",
    """
    WITH pairs AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS MATERIALIZED (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pairs a JOIN pairs b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY 1
    ), tri AS (
      SELECT e1.u AS x, e1.v AS y, e2.v AS z
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), tnode AS (
      SELECT node, CAST(count(*) AS BIGINT) AS t
      FROM (SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
      GROUP BY 1
    ), coeff AS (
      SELECT d.node, d.deg, coalesce(t.t, 0) AS t,
             -- integer-exact band: floor(log2(deg)) via binary width —
             -- no libm in the grouping key
             CAST(length(to_base(d.deg, 2)) - 1 AS INT) AS band,
             2.0 * coalesce(t.t, 0) / (d.deg * (d.deg - 1)) AS c
      FROM deg d LEFT JOIN tnode t USING (node)
      WHERE d.deg >= 2
    )
    SELECT band,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(CASE WHEN t > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_closed,
           round(CAST(sum(CAST(round(c * 1e6) AS BIGINT)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / 1e6, 6) AS avg_coeff,
           round(max(c), 6) AS max_coeff
    FROM coeff
    GROUP BY 1
    ORDER BY band
    """,
)
def d23_clustering_coefficient(spark: SparkSession, sf: str) -> DataFrame:
    """Local clustering coefficient by degree band over the co-purchase
    graph: c(v) = 2·T(v) / (deg(v)·(deg(v)−1)), aggregated per
    floor(log2(deg)) band — the classic "does clustering fall with
    degree" curve that separates community-structured graphs (flat-ish)
    from hub-dominated ones (falling), i.e. whether a near-dup/similarity
    graph's hubs are real dense communities or boilerplate super-
    connectors that d19/d22 should strip. Completes the graph-diagnostics
    battery: d12 counts triangles globally, d16 measures degree mixing,
    d23 measures CLOSURE per degree scale.

    Scale shape: node triangle counts come from
    ``operators/dedup.triangle_counts(with_degree=True)`` — the
    Suri-Vassilvitskii degree-ordered orientation with in-row
    ``array_intersect`` close (wedges never materialize, the round-8
    shape) — left-joined onto the full degree table so zero-triangle
    nodes count in their band's average; the band is an integer-exact
    binary width (no libm in a grouping key), and the per-band mean is
    an exact integer sum of 1e-6-quantized coefficients (the d17/d21
    scheme). Output is ~log(max degree) rows at any corpus size.

    Determinism: c = 2T/(deg·(deg−1)) is one IEEE division of exact
    integers — bit-identical both engines; max_coeff rounds the same
    doubles; the DuckDB oracle recounts per-node triangles from the raw
    x<y<z 3-way self-join."""
    from ..operators.dedup import triangle_counts

    edges = _copurchase_edges(spark, sf)
    # include_zero rides the operator's OWN degree table (computed for the
    # orientation anyway) — the old second explode+groupBy degree pass
    # over the edge list and its left join are gone (round-11 opt)
    tc = triangle_counts(
        edges, src="u", dst="v", canonical=True,
        with_degree=True, include_zero=True,
    )
    c = (
        F.lit(2.0) * F.col("triangles")
        / (F.col("deg") * (F.col("deg") - F.lit(1)))
    )
    coeff = (
        tc.filter(F.col("deg") >= 2)
        .select(
            (F.length(F.conv(F.col("deg"), 10, 2)) - 1).cast("int").alias("band"),
            F.col("triangles").alias("t"),
            c.alias("c"),
        )
    )
    return (
        coeff.groupBy("band")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.when(F.col("t") > 0, 1).otherwise(0)).cast("long").alias("n_closed"),
            F.round(
                F.sum(F.round(F.col("c") * 1e6).cast("long")).cast("double")
                / F.count("*").cast("double") / F.lit(1e6),
                6,
            ).alias("avg_coeff"),
            F.round(F.max("c"), 6).alias("max_coeff"),
        )
        .orderBy("band")
    )
