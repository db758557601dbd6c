"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import Window


from pyspark.sql import functions as F


from ._registry import _t, query


from ._shared import _lsh_cte


@query(
    "v1_cosine_topk",
    """
    WITH flat AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 5
      GROUP BY 1, 2
    ), sims AS (
      SELECT query_id, neighbor_id,
             round(dot / (na.nrm * nb.nrm), 6) AS sim
      FROM dots JOIN norms na ON na.vec_id = query_id
                JOIN norms nb ON nb.vec_id = neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3
    """,
)
def v1_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-k for a small query set (broadcast queries,
    single corpus scan, windowed top-k)."""
    from ..operators.similarity import cosine_topk

    emb = _t(spark, sf, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, dim=64)


@query(
    "v2_ann_lsh_topk",
    f"""
    WITH {_lsh_cte(6, 8, "embeddings")}, pairs AS (
      SELECT va AS query_id, vb AS neighbor_id FROM cands
      UNION ALL
      SELECT vb AS query_id, va AS neighbor_id FROM cands
    ), sims AS (
      SELECT p.query_id, p.neighbor_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM pairs p
      JOIN flat fa ON fa.vec_id = p.query_id
      JOIN flat fb ON fb.vec_id = p.neighbor_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = p.query_id
      JOIN norms nb ON nb.vec_id = p.neighbor_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 1
    """,
)
def v2_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets — the 100 TB scale
    path where brute force is impossible. Exact cosine only within buckets.
    The hyperplanes are a deterministic integer hash, so the oracle replays
    the identical pipeline in SQL."""
    from ..operators.similarity import ann_topk

    emb = _t(spark, sf, "embeddings")
    return ann_topk(emb, dim=64, k=1, n_tables=6, n_bits=8)


@query(
    "v3_ivf_topk",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
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
    ), probes AS (
      SELECT vec_id AS query_id, cell_id FROM celldots WHERE vec_id < 5
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) <= 2
    ), cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a USING (cell_id)
      WHERE a.vec_id <> p.query_id
    ), sims AS (
      SELECT c.query_id, c.neighbor_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM cand c
      JOIN flat fa ON fa.vec_id = c.query_id
      JOIN flat fb ON fb.vec_id = c.neighbor_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = c.query_id
      JOIN norms nb ON nb.vec_id = c.neighbor_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 3
    """,
)
def v3_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-flat approximate top-k (the second ANN scale path beside LSH):
    sampled coarse quantizer (first 16 vectors), nprobe=2 probed cells,
    exact cosine only within probed cells — scan cost N·nprobe/n_cells.
    Deterministic end to end, so the oracle replays it exactly."""
    from ..operators.similarity import ivf_topk

    emb = _t(spark, sf, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, n_cells=16, nprobe=2, dim=64)


@query(
    "v4_ivf_trained",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), c0 AS (
      SELECT vec_id AS cell_id, i, x FROM flat WHERE vec_id < 8
    ), c0n AS (
      SELECT cell_id, sqrt(sum(x * x)) AS cn FROM c0 GROUP BY 1
    ), dots1 AS (
      SELECT v.vec_id, c.cell_id,
             round(sum(v.x * c.x) / (any_value(nv.nrm) * any_value(cn.cn)), 6)
               AS sim
      FROM flat v JOIN c0 c ON c.i = v.i
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN c0n cn ON cn.cell_id = c.cell_id
      GROUP BY 1, 2
    ), a1 AS (
      SELECT vec_id, cell_id FROM dots1
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), c1 AS (
      SELECT a.cell_id, f.i, round(avg(f.x), 6) AS x
      FROM a1 a JOIN flat f USING (vec_id) GROUP BY 1, 2
    ), c1n AS (
      SELECT cell_id, sqrt(sum(x * x)) AS cn FROM c1 GROUP BY 1
    ), dots2 AS (
      SELECT v.vec_id, c.cell_id,
             round(sum(v.x * c.x) / (any_value(nv.nrm) * any_value(cn.cn)), 6)
               AS sim
      FROM flat v JOIN c1 c ON c.i = v.i
      JOIN norms nv ON nv.vec_id = v.vec_id
      JOIN c1n cn ON cn.cell_id = c.cell_id
      GROUP BY 1, 2
    ), a2 AS (
      SELECT vec_id, cell_id FROM dots2
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), c2 AS (
      SELECT a.cell_id, f.i, round(avg(f.x), 6) AS x
      FROM a2 a JOIN flat f USING (vec_id) GROUP BY 1, 2
    ), members AS (
      SELECT cell_id, count(*) AS n_members FROM a2 GROUP BY 1
    )
    SELECT m.cell_id, m.n_members,
           round(sqrt(sum(c2.x * c2.x)), 4) AS centroid_norm
    FROM members m JOIN c2 ON c2.cell_id = m.cell_id
    GROUP BY m.cell_id, m.n_members
    """,
)
def v4_ivf_trained(spark: SparkSession, sf: str) -> DataFrame:
    """TRAINED IVF coarse quantizer: two Lloyd iterations from a
    deterministic init, verified end-to-end — the oracle unrolls both
    iterations (assign → mean-update → reassign) in SQL and must land on
    identical final assignments and centroid norms. An iterative
    distributed ML algorithm under a hash-level correctness gate."""
    from ..operators.similarity import ivf_train

    emb = _t(spark, sf, "embeddings")
    assign, cents = ivf_train(emb, n_cells=8, iters=2)
    counts = assign.groupBy("cell_id").agg(F.count("*").alias("n_members"))
    sq = F.aggregate(
        F.transform("cvec", lambda x: x * x), F.lit(0.0), lambda a, b: a + b
    )
    norm = cents.select("cell_id", F.round(F.sqrt(sq), 4).alias("centroid_norm"))
    return counts.join(norm, "cell_id")


@query(
    "v5_quantize_embeddings",
    """
    WITH scaled AS (
      SELECT vec_id,
             round(list_max(list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE)))) / 127.0, 6) AS scale
      FROM embeddings
    ), quant AS (
      SELECT e.vec_id, s.scale,
             list_transform(e.embedding,
               x -> CASE WHEN s.scale = 0 THEN 0
                    ELSE CAST(round(CAST(x AS DOUBLE) / s.scale) AS INT) END) AS q
      FROM embeddings e JOIN scaled s USING (vec_id)
    )
    SELECT vec_id, scale,
           CAST(list_sum(q) AS BIGINT) AS q_sum,
           CAST(list_min(q) AS INT) AS q_min,
           CAST(list_max(q) AS INT) AS q_max
    FROM quant
    """,
)
def v5_quantize_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (per-vector
    scale = max|x|/127) — the storage/transfer path every large ANN corpus
    takes (4× smaller than float32, dot products stay SIMD-friendly).
    Entirely map-side array math (transform/aggregate HOFs, no UDF, no
    shuffle); digest columns (sum/min/max of the quantized array) pin the
    full quantized content under the value-hash gate."""
    emb = _t(spark, sf, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scale = F.round(mx / 127.0, 6)
    q = emb.select(
        "vec_id",
        scale.alias("scale"),
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") / scale).cast("int")
        ).alias("q"),
    )
    qsum = F.aggregate("q", F.lit(0).cast("bigint"), lambda a, b: a + b)
    return q.select(
        "vec_id",
        "scale",
        qsum.alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


@query(
    "v6_reranked_topk",
    """
    WITH scaled AS (
      SELECT vec_id,
             round(list_max(list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE)))) / 127.0, 6) AS scale
      FROM embeddings
    ), quant AS (
      SELECT e.vec_id, s.scale,
             list_transform(e.embedding,
               x -> CASE WHEN s.scale = 0 THEN 0
                    ELSE CAST(round(CAST(x AS DOUBLE) / s.scale) AS INT) END) AS q
      FROM embeddings e JOIN scaled s USING (vec_id)
    ), qflat AS (
      SELECT vec_id, t.i, CAST(q[t.i] AS BIGINT) AS qx
      FROM quant, range(1, 65) t(i)
    ), flat AS (
      SELECT vec_id, t.i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), approx AS (
      SELECT fa.vec_id AS query_id, fb.vec_id AS neighbor_id,
             CAST(sum(fa.qx * fb.qx) AS DOUBLE)
               * any_value(sa.scale) * any_value(sb.scale) AS ap
      FROM qflat fa
      JOIN qflat fb ON fb.i = fa.i AND fb.vec_id <> fa.vec_id
      JOIN scaled sa ON sa.vec_id = fa.vec_id
      JOIN scaled sb ON sb.vec_id = fb.vec_id
      WHERE fa.vec_id < 5
      GROUP BY 1, 2
    ), short AS (
      SELECT query_id, neighbor_id, ap FROM approx
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY ap DESC, neighbor_id ASC) <= 10
    ), sims AS (
      SELECT s.query_id, s.neighbor_id, any_value(s.ap) AS ap,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM short s
      JOIN flat fa ON fa.vec_id = s.query_id
      JOIN flat fb ON fb.vec_id = s.neighbor_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = s.query_id
      JOIN norms nb ON nb.vec_id = s.neighbor_id
      GROUP BY 1, 2
    ), ranked AS (
      SELECT query_id, neighbor_id, sim, ap,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, rank, sim, round(ap, 6) AS approx_sim
    FROM ranked WHERE rank <= 3
    """,
)
def v6_reranked_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage retrieval: int8-quantized shortlist (exact integer dots,
    4× less memory bandwidth — the pass that scans the 100 TB corpus),
    then float-exact cosine re-rank of 10 candidates per query. The oracle
    replays quantization, both scoring passes, and both rankings."""
    from ..operators.similarity import reranked_topk

    emb = _t(spark, sf, "embeddings")
    return reranked_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, shortlist=10, dim=64)


@query(
    "v8_pq_topk",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), cb AS (
      SELECT vec_id AS k, i, x FROM flat WHERE vec_id < 16
    ), dist AS (
      SELECT f.vec_id, CAST(floor(cb.i / 16) AS INT) AS m, cb.k,
             round(sum((f.x - cb.x) * (f.x - cb.x)), 6) AS d
      FROM flat f JOIN cb ON cb.i = f.i
      GROUP BY 1, 2, 3
    ), code AS (
      SELECT vec_id, m, k FROM (
        SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
        FROM dist) WHERE rn = 1
    ), adc AS (
      SELECT q.vec_id AS query_id, CAST(floor(cb.i / 16) AS INT) AS m, cb.k,
             round(sum(q.x * cb.x), 6) AS t
      FROM flat q JOIN cb ON cb.i = q.i
      WHERE q.vec_id < 5
      GROUP BY 1, 2, 3
    ), approx AS (
      SELECT a.query_id, c.vec_id AS neighbor_id,
             round(max(CASE WHEN c.m = 0 THEN a.t END)
                 + max(CASE WHEN c.m = 1 THEN a.t END)
                 + max(CASE WHEN c.m = 2 THEN a.t END)
                 + max(CASE WHEN c.m = 3 THEN a.t END), 6) AS approx_dot
      FROM code c JOIN adc a ON a.m = c.m AND a.k = c.k
      WHERE c.vec_id <> a.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rank, approx_dot FROM (
      SELECT query_id, neighbor_id, approx_dot,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dot DESC, neighbor_id) AS rank
      FROM approx) WHERE rank <= 3
    """,
)
def v8_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN (ADC scan) — completes the retrieval
    family (flat v1, LSH v2, IVF v3/v4, int8 two-stage v5/v6): vectors
    compress to 4 subspace codes against a 16-codeword deterministic
    codebook; queries scan codes with table lookups instead of float
    dot products. The oracle replays encode (argmin with the same
    rounded-distance tiebreak) and the ADC pivot in pure SQL — an
    independent formulation of the same arithmetic."""
    from ..operators.similarity import pq_topk

    emb = _t(spark, sf, "embeddings")
    return pq_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)


@query(
    "v9_matryoshka_recall",
    """
    WITH flat AS (
      SELECT vec_id, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm,
             sqrt(sum(CASE WHEN i <= 16 THEN x * x ELSE 0 END)) AS nrm16
      FROM flat GROUP BY 1
    ), sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(sum(q.x * c.x)
                   / (any_value(nq.nrm) * any_value(nc.nrm)), 6) AS sim_full,
             round(sum(CASE WHEN q.i <= 16 THEN q.x * c.x ELSE 0 END)
                   / (any_value(nq.nrm16) * any_value(nc.nrm16)), 6)
               AS sim_trunc
      FROM flat q JOIN flat c ON c.i = q.i AND q.vec_id < 5
        AND c.vec_id <> q.vec_id
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN norms nc ON nc.vec_id = c.vec_id
      GROUP BY 1, 2
    ), rk AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_full DESC, neighbor_id ASC) AS r_full,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim_trunc DESC, neighbor_id ASC) AS r_trunc
      FROM sims
    )
    SELECT query_id,
           CAST(sum(CASE WHEN r_full <= 10 AND r_trunc <= 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(sum(CASE WHEN r_full <= 10 AND r_trunc <= 10
                          THEN 1 ELSE 0 END) / 10.0, 6) AS recall_at_10
    FROM rk GROUP BY query_id
    """,
)
def v9_matryoshka_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka / truncated-dimension retrieval audit (Kusupati et al.
    2022, arXiv:2205.13147): how much of the exact 64-dim cosine top-10
    survives when retrieval uses only the first 16 dimensions — the
    dimension-truncation trade every embedding-store makes before paying
    for full-dim rerank. Completes the retrieval-audit family (x30 audits
    LSH recall, d9 MinHash error; this audits prefix truncation).

    Calibration note (honest): the synthetic embeddings are random, so a
    16-of-64 prefix shares only ~chance structure with the full vector and
    recall lands at 0.1-0.3. On actual Matryoshka-trained embeddings the
    prefix concentrates information and recall approaches 1; the AUDIT
    machinery (not the absolute number) is the deliverable here.

    Scale shape: ONE corpus scan scores both similarities per candidate
    pair (prefix dot via a zip_with that zeroes indices > 16 — no second
    join); queries are a 5-row broadcast (the whitelisted small-nonequi
    BNLJ shape, as v1); both rankings come from the same per-query window
    over candidate rows."""
    from ..operators.similarity import _dot, _norm

    emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    pre = emb.select(
        "vec_id",
        "embedding",
        F.slice("embedding", 1, 16).alias("emb16"),
    )
    c = pre.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.col("emb16").alias("c16"),
        _norm(F.col("embedding")).alias("c_nrm"),
        _norm(F.col("emb16")).alias("c_nrm16"),
    )
    q = pre.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("emb16").alias("q16"),
        _norm(F.col("embedding")).alias("q_nrm"),
        _norm(F.col("emb16")).alias("q_nrm16"),
    )
    sims = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("sim_full"),
            F.round(
                _dot(F.col("q16"), F.col("c16"))
                / (F.col("q_nrm16") * F.col("c_nrm16")),
                6,
            ).alias("sim_trunc"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("sim_full"), F.asc("neighbor_id")
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.desc("sim_trunc"), F.asc("neighbor_id")
    )
    hit = F.when(
        (F.col("r_full") <= 10) & (F.col("r_trunc") <= 10), 1
    ).otherwise(0)
    return (
        sims.select(
            "query_id",
            F.row_number().over(wf).alias("r_full"),
            F.row_number().over(wt).alias("r_trunc"),
        )
        .groupBy("query_id")
        .agg(
            F.sum(hit).alias("n_hit"),
            F.round(F.sum(hit) / 10.0, 6).alias("recall_at_10"),
        )
    )


@query(
    "v10_ivf_pq_topk",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
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
    ), probes AS (
      SELECT vec_id AS query_id, cell_id FROM celldots WHERE vec_id < 5
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) <= 2
    ), cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a USING (cell_id)
      WHERE a.vec_id <> p.query_id
    ), cb AS (
      SELECT vec_id AS k, i, x FROM flat WHERE vec_id < 16
    ), dist AS (
      SELECT f.vec_id, CAST(floor(cb.i / 16) AS INT) AS m, cb.k,
             round(sum((f.x - cb.x) * (f.x - cb.x)), 6) AS d
      FROM flat f JOIN cb ON cb.i = f.i
      GROUP BY 1, 2, 3
    ), code AS (
      SELECT vec_id, m, k FROM (
        SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
        FROM dist) WHERE rn = 1
    ), adc AS (
      SELECT q.vec_id AS query_id, CAST(floor(cb.i / 16) AS INT) AS m, cb.k,
             round(sum(q.x * cb.x), 6) AS t
      FROM flat q JOIN cb ON cb.i = q.i
      WHERE q.vec_id < 5
      GROUP BY 1, 2, 3
    ), approx AS (
      SELECT a.query_id, c.vec_id AS neighbor_id,
             round(max(CASE WHEN c.m = 0 THEN a.t END)
                 + max(CASE WHEN c.m = 1 THEN a.t END)
                 + max(CASE WHEN c.m = 2 THEN a.t END)
                 + max(CASE WHEN c.m = 3 THEN a.t END), 6) AS approx_dot
      FROM code c
      JOIN adc a ON a.m = c.m AND a.k = c.k
      JOIN cand cd ON cd.query_id = a.query_id AND cd.neighbor_id = c.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rank, approx_dot FROM (
      SELECT query_id, neighbor_id, approx_dot,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY approx_dot DESC, neighbor_id) AS rank
      FROM approx) WHERE rank <= 3
    """,
)
def v10_ivf_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF+PQ — the composed production ANN shape (Jégou et al. PAMI'11;
    what FAISS's IVFPQ runs at billion scale): the coarse quantizer
    restricts the scan to nprobe probed cells (cost N·nprobe/n_cells), and
    the ADC table-lookup scores the surviving candidates without touching
    raw vectors. Built by composition: ``ivf_candidates`` (shared with
    IVF-flat v3) feeds ``pq_topk(candidates=...)`` (shared with the full
    ADC scan v8) — both halves already independently driver-verified.

    Scale shape: one broadcast seed row (assign + probes), one broadcast
    codebook row (encode + ADC tables), candidate ids equi-join the code
    table; NOTHING corpus-sized shuffles and no raw vector leaves its
    scan."""
    from ..operators.similarity import ivf_candidates, pq_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cand = ivf_candidates(emb, queries, n_cells=16, nprobe=2)
    return pq_topk(emb, queries, k=3, candidates=cand)


@query(
    "v11_range_search",
    """
    WITH flat AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 5
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           round(dot / (na.nrm * nb.nrm), 6) AS sim
    FROM dots JOIN norms na ON na.vec_id = query_id
              JOIN norms nb ON nb.vec_id = neighbor_id
    WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.25
    """,
)
def v11_range_search(spark: SparkSession, sf: str) -> DataFrame:
    """Radius retrieval (FAISS range_search, the other half of the
    similarity-query API next to top-k v1): every neighbor with cosine
    >= 0.25 — the query shape dedup thresholds and near-dup audits
    actually use. Scale note: unlike top-k there is NO per-query window;
    the threshold filters the scored stream map-side and only survivors
    move, so cost is one corpus scan regardless of how many queries
    exceed their radius."""
    from ..operators.similarity import range_search

    emb = _t(spark, sf, "embeddings")
    return range_search(emb, emb.filter(F.col("vec_id") < 5), tau=0.25, dim=64)


# shared CTE: upper-triangle covariance cells of the embedding columns —
# used by v12 (the matrix itself) and v13 (power iteration on top of it)
_COV_CTE = """
    flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), nn AS (
      SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS n FROM flat
    ), sums AS (
      SELECT i, sum(x) AS sx FROM flat GROUP BY 1
    ), prods AS (
      SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
      FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    ), covu AS (
      SELECT p.i, p.j,
             p.sxy / nn.n - (si.sx / nn.n) * (sj.sx / nn.n) AS cov
      FROM prods p
      JOIN sums si ON si.i = p.i
      JOIN sums sj ON sj.i = p.j
      CROSS JOIN nn
    )"""


@query(
    "v12_embedding_covariance",
    f"""
    WITH {_COV_CTE}
    SELECT i, j, round(cov, 6) + 0.0 AS cov FROM covu
    """,
)
def v12_embedding_covariance(spark: SparkSession, sf: str) -> DataFrame:
    """Covariance matrix of the embedding columns (upper triangle, 64×65/2
    = 2080 cells) — the distributed front-end of PCA/whitening: collect
    this sketch-sized matrix to the driver, eigendecompose with numpy, and
    broadcast the rotation back for dimensionality reduction, the standard
    recipe for embedding compression and SemDeDup-style preprocessing.

    Scale shape: each vector expands MAP-SIDE into its 2080 upper-triangle
    products (a nested ``transform`` over index sequences — no self-join,
    no second corpus shuffle) and partial-aggregates into the fixed 2080
    cells before the ONE shuffle; per-dimension sums ride the same pattern
    (64 cells) and fold back by dimension-index equi-joins; n arrives as a
    1-row broadcast. Corpus size never appears in shuffle volume — the
    whole reduce is (2080 + 64 + 1) cells regardless of row count. The
    oracle replays the float32→double quantization per element."""
    from ..operators.similarity import covariance_cells

    cells = covariance_cells(_t(spark, sf, "embeddings"))
    return cells.select(
        "i",
        "j",
        # -0.0 → 0.0: negative zero renders differently than positive zero
        (F.round("cov", 6) + F.lit(0.0)).alias("cov"),
    )


def _power_iter_sql(prev: str, k: int) -> str:
    """One unrolled power-iteration round (matvec into dim cells, then
    L2 normalize — as a window over the matvec subquery so each CTE is
    referenced exactly ONCE), matching
    ``operators/similarity.top_eigenvector`` numerically. The
    single-reference shape matters: a ``mat{{k}}`` CTE feeding both a
    separate norm CTE and the normalized vector doubles per round under
    CTE inlining — measured >10 min at sf0.01 in DuckDB (2⁸ plan
    copies) vs ~1 s for this linear chain."""
    return f"""
    v{k} AS (
      SELECT d, mw / sqrt(sum(mw * mw) OVER ()) AS w FROM (
        SELECT s.i AS d, sum(s.cov * v.w) AS mw
        FROM sym s JOIN {prev} v ON v.d = s.j
        GROUP BY 1
      )
    )"""


@query(
    "v13_top_eigenvector",
    f"""
    WITH {_COV_CTE},
    sym AS (
      SELECT i, j, cov FROM covu
      UNION ALL
      SELECT j AS i, i AS j, cov FROM covu WHERE i <> j
    ), v0 AS (
      SELECT DISTINCT i AS d, CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END AS w
      FROM covu
    ), {",".join(_power_iter_sql(f"v{k - 1}", k) for k in range(1, 9))},
    lam AS (
      SELECT sum(va.w * s.cov * vb.w) AS lam
      FROM sym s JOIN v8 va ON va.d = s.i JOIN v8 vb ON vb.d = s.j
    )
    SELECT v8.d AS i, round(v8.w, 6) + 0.0 AS w, round(lam.lam, 6) AS lam
    FROM v8 CROSS JOIN lam
    """,
)
def v13_top_eigenvector(spark: SparkSession, sf: str) -> DataFrame:
    """First principal component of the embedding space by power iteration
    (8 fixed rounds from e₀) over the v12 covariance cells → the 64 unit
    eigenvector weights plus the Rayleigh quotient λ (the variance
    captured by the returned direction — exact for whatever vector the
    fixed iteration count lands on). Distributed linear algebra as pure
    dataflow: together with v12 this is the whole PCA front-end — at
    production scale the driver never sees more than the dim²-cell matrix
    and the dim-row vector.

    Convergence is (λ₂/λ₁)^k: real embedding spaces have a dominant
    direction and converge in a handful of rounds; this synthetic
    testdata is near-isotropic (λ₂/λ₁ ≈ 0.99, measured), so 8 rounds
    reach ~97% of λ₁ — the honest behavior of the power method on a flat
    spectrum, which the Rayleigh output makes visible rather than hiding.

    Scale shape: the corpus reduces ONCE (covariance_cells); every matvec
    is a broadcast join of the 64-row vector against the 4096-cell
    symmetrized matrix with a grouped sum back into 64 cells; norms and λ
    fold in as 1-row broadcasts. Iteration count is fixed, so the whole
    computation — including the oracle's eight unrolled CTE rounds — is a
    deterministic replayable plan."""
    from ..operators.similarity import covariance_cells, top_eigenvector

    cells = covariance_cells(_t(spark, sf, "embeddings"))
    ev = top_eigenvector(cells, iters=8)
    return ev.select(
        "i",
        (F.round("w", 6) + F.lit(0.0)).alias("w"),
        F.round("lam", 6).alias("lam"),
    )


@query(
    "v14_cluster_quality",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
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
      SELECT vec_id, cell_id, sim FROM celldots
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) = 1
    ), cells AS (
      SELECT cell_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(1.0 - sim, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*) AS scatter
      FROM assign GROUP BY 1
    ), sep AS (
      SELECT vec_id AS ca, cell_id AS cb, 1.0 - sim AS d
      FROM celldots
      WHERE vec_id < 16 AND vec_id <> cell_id AND sim < 1.0
    )
    SELECT s.ca AS cell_id,
           any_value(ci.n) AS n,
           any_value(ci.scatter) AS scatter,
           max((ci.scatter + cj.scatter) / s.d) AS db_component
    FROM sep s
    JOIN cells ci ON ci.cell_id = s.ca
    JOIN cells cj ON cj.cell_id = s.cb
    GROUP BY 1
    """,
)
def v14_cluster_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Davies-Bouldin quality audit of the IVF coarse partitioning (the
    index-health counterpart to v3's retrieval and x30's recall audit):
    per cell, the member count, the scatter (mean cosine distance to the
    cell seed), and ``max_j (scatter_i + scatter_j) / d(seed_i, seed_j)``
    — high components flag cells that are loose AND close to a
    neighbor, exactly where IVF recall leaks. Same deterministic
    first-16 seeds as every IVF query, so the audit grades the index
    the retrieval queries actually use.

    Scale shape (``operators/similarity.cluster_quality``): ONE corpus
    pass — broadcast 1-row seed table assigns map-side, per-cell reduce
    emits K rows; the K×K separation grid and the DB max are K-row
    metadata joins. Scatter sums ride a DECIMAL grid (order-independent);
    the mean and DB ratios stay UNROUNDED — correctly-rounded IEEE ops on
    grid inputs are already engine-identical, while a final round(·,6)
    could land on an exact half-grid tie where rounding modes differ."""
    from ..operators.similarity import cluster_quality

    emb = _t(spark, sf, "embeddings")
    return cluster_quality(emb, n_cells=16)


def _ivf_probe_sql(np: int) -> str:
    """Per-nprobe CTE chain for v15: probe the ``np`` nearest cells, pull
    cell members as candidates, rank their exact sims (from the shared
    ``qsims``) to top-3."""
    return f"""
    probes{np} AS (
      SELECT vec_id AS query_id, cell_id FROM celldots WHERE vec_id < 5
      QUALIFY row_number() OVER (
        PARTITION BY vec_id ORDER BY sim DESC, cell_id ASC) <= {np}
    ), cand{np} AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes{np} p JOIN assign a USING (cell_id)
      WHERE a.vec_id <> p.query_id
    ), ranked{np} AS (
      SELECT q.query_id, q.neighbor_id
      FROM qsims q JOIN cand{np} c
        ON c.query_id = q.query_id AND c.neighbor_id = q.neighbor_id
      QUALIFY row_number() OVER (
        PARTITION BY q.query_id ORDER BY q.sim DESC, q.neighbor_id ASC) <= 3
    )"""


@query(
    "v15_recall_curve",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
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
    ), qsims AS (
      SELECT fa.vec_id AS query_id, fb.vec_id AS neighbor_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)),
                   6) AS sim
      FROM flat fa
      JOIN flat fb ON fb.i = fa.i AND fb.vec_id <> fa.vec_id
      JOIN norms na ON na.vec_id = fa.vec_id
      JOIN norms nb ON nb.vec_id = fb.vec_id
      WHERE fa.vec_id < 5
      GROUP BY 1, 2
    ), truth AS (
      SELECT query_id, neighbor_id FROM qsims
      QUALIFY row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) <= 3
    ), """
    + ", ".join(_ivf_probe_sql(np) for np in (1, 2, 4))
    + """,
    unioned AS (
      SELECT 1 AS nprobe, * FROM ranked1
      UNION ALL SELECT 2, * FROM ranked2
      UNION ALL SELECT 4, * FROM ranked4
    )
    SELECT CAST(u.nprobe AS BIGINT) AS nprobe,
           CAST(count(*) AS BIGINT) AS n_returned,
           CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(sum(CASE WHEN t.query_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / 15.0 AS recall
    FROM unioned u
    LEFT JOIN truth t
      ON t.query_id = u.query_id AND t.neighbor_id = u.neighbor_id
    GROUP BY 1
    """,
)
def v15_recall_curve(spark: SparkSession, sf: str) -> DataFrame:
    """IVF recall-vs-nprobe TUNING CURVE — recall@3 of the v3 index at
    nprobe ∈ {1, 2, 4} against the exact brute-force top-3 (v1), in one
    query. The dial every IVF deployment turns (probe more cells → more
    recall, linearly more scan): this emits the measured curve so the
    operator picks nprobe from data instead of folklore, and a recall
    cliff at low nprobe flags a bad coarse quantizer (cross-check v14's
    scatter/DB audit of the same cells).

    Scale shape: ONE index pass for all three settings
    (``similarity.ivf_topk_curve``) — probed cells nest, so the corpus
    assign, candidate join, and exact rerank run once at nprobe=4 and
    each setting slices by probe rank (three separate ``ivf_topk`` calls
    re-assigned the corpus per setting: 4.6 s → 2.9 s at sf0.1). The
    exact side is corpus × 5 broadcast queries (the audited v1 shape,
    linear in corpus). The recall join keys on (query, neighbor) id
    pairs — 45 rows against 15. Denominator is the fixed truth size
    5 queries × k=3 (corpus always holds ≥3 neighbors), so recall is an
    exact integer/constant division."""
    from ..operators.similarity import cosine_topk, ivf_topk_curve

    emb = _t(spark, sf, "embeddings")
    queries5 = emb.filter(F.col("vec_id") < 5)
    truth = cosine_topk(emb, queries5, k=3).select("query_id", "neighbor_id")
    curves = ivf_topk_curve(
        emb, queries5, k=3, n_cells=16, nprobes=(1, 2, 4)
    ).select("nprobe", "query_id", "neighbor_id")
    hit = F.when(F.col("t_q").isNotNull(), 1).otherwise(0)
    joined = curves.join(
        truth.select(
            F.col("query_id").alias("t_q"), F.col("neighbor_id").alias("t_n")
        ),
        (F.col("query_id") == F.col("t_q"))
        & (F.col("neighbor_id") == F.col("t_n")),
        "left",
    )
    return joined.groupBy("nprobe").agg(
        F.count("*").alias("n_returned"),
        F.sum(hit).cast("bigint").alias("n_hits"),
        (F.sum(hit).cast("double") / F.lit(15.0)).alias("recall"),
    )


@query(
    "v16_hard_negatives",
    """
    WITH flat AS (
      SELECT vec_id, label, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, any_value(label) AS label, sqrt(sum(x * x)) AS nrm
      FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.label <> b.label
      WHERE a.vec_id < 8
      GROUP BY 1, 2
    ), sims AS (
      SELECT query_id, na.label AS query_label,
             neighbor_id, nb.label AS neighbor_label,
             round(dot / (na.nrm * nb.nrm), 6) AS sim
      FROM dots JOIN norms na ON na.vec_id = query_id
                JOIN norms nb ON nb.vec_id = neighbor_id
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM sims
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, rank, sim
    FROM ranked WHERE rank <= 5
    """,
)
def v16_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    embedding the 5 most-similar vectors with a DIFFERENT label — the
    near-misses a contrastive loss learns the most from (the offline
    mining step of ANCE/DPR-style embedding-model training; every
    retrieval-model data pipeline over a 100 TB corpus runs exactly this
    shape). Distinct from v1 (unconstrained top-k) and v6 (two-stage
    rerank): the label inequality rides IN the broadcast join condition,
    so same-label rows — including the query itself — are never scored
    or ranked.

    Determinism: sim is one hoisted-norm dot product rounded to 6 (v1's
    contract); ties break on neighbor_id.

    Scale shape (see ``operators/similarity.py:hard_negative_topk``):
    broadcast Q query rows, one corpus scan, per-query windowed top-k —
    O(N·Q) with Q tiny, no all-pairs stage. At training scale Q grows to
    the full corpus and this becomes v2/v3's bucketed problem; the
    label-aware candidate join is the piece this query pins."""
    from ..operators.similarity import hard_negative_topk

    emb = _t(spark, sf, "embeddings")
    return hard_negative_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=5, dim=64
    )


@query(
    "v17_embedding_margin",
    """
    WITH flat AS (
      SELECT vec_id, label, t.i AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, any_value(label) AS label, sqrt(sum(x * x)) AS nrm
      FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 8
      GROUP BY 1, 2
    ), sims AS (
      SELECT query_id, na.label AS query_label, neighbor_id,
             nb.label = na.label AS same_label,
             round(dot / (na.nrm * nb.nrm), 6) AS sim
      FROM dots JOIN norms na ON na.vec_id = query_id
                JOIN norms nb ON nb.vec_id = neighbor_id
    ), best AS (
      SELECT query_id, query_label, same_label, neighbor_id, sim
      FROM sims
      QUALIFY row_number() OVER (PARTITION BY query_id, same_label
                                 ORDER BY sim DESC, neighbor_id ASC) = 1
    )
    SELECT query_id,
           any_value(query_label) AS query_label,
           max(CASE WHEN same_label THEN neighbor_id END) AS pos_id,
           max(CASE WHEN same_label THEN sim END) AS pos_sim,
           max(CASE WHEN NOT same_label THEN neighbor_id END) AS neg_id,
           max(CASE WHEN NOT same_label THEN sim END) AS neg_sim,
           round(max(CASE WHEN same_label THEN sim END)
                 - max(CASE WHEN NOT same_label THEN sim END), 6) AS margin
    FROM best GROUP BY query_id
    """,
)
def v17_embedding_margin(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-quality margin audit: per query vector the best
    SAME-label similarity (nearest positive) minus the best CROSS-label
    similarity (nearest hard negative, v16's top row). A healthy
    retrieval embedding has positive margins; mass near or below zero is
    the standard go/no-go metric after an embedding-model update and the
    selector for which anchors need v16's mined negatives most. One
    number per query, NULL-margined when a label has no second member.

    Determinism: sims are v1's rounded hoisted-norm dot products; the
    per-(query, side) argmax has a total tiebreak (sim desc, id asc);
    margin subtracts two already-rounded doubles and rounds again.

    Scale shape: identical to v16 — broadcast Q query rows, one corpus
    scan, per-(query, side) windowed argmax; the final pivot groups 2
    rows per query. Nothing is all-pairs."""
    from ..operators.similarity import _dot, _norm

    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("q_vec"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("c_vec"),
        _norm(F.col("embedding")).alias("c_nrm"),
    )
    sims = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            (F.col("neighbor_label") == F.col("query_label")).alias("same_label"),
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id", "same_label").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    best = sims.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    pos_sim = F.max(F.when(F.col("same_label"), F.col("sim")))
    neg_sim = F.max(F.when(~F.col("same_label"), F.col("sim")))
    return best.groupBy("query_id").agg(
        F.first("query_label").alias("query_label"),
        F.max(F.when(F.col("same_label"), F.col("neighbor_id"))).alias("pos_id"),
        pos_sim.alias("pos_sim"),
        F.max(F.when(~F.col("same_label"), F.col("neighbor_id"))).alias("neg_id"),
        neg_sim.alias("neg_sim"),
        F.round(pos_sim - neg_sim, 6).alias("margin"),
    )
