"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import Window


from pyspark.sql import functions as F


from ..core.checkpoint import reliable_checkpoint
from ._registry import _t, query


from ._shared import _NORM_SQL, _u32_sql


from .text_a import _DISCLAIMER, _U32_SQL, x31_bigram_perplexity


@query(
    "x33_dsir_weights",
    f"""
    WITH norm AS (
      SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS toks
      FROM documents
    ), tok0 AS (
      SELECT doc_id, lang, toks[i] AS token
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= len(toks) AND length(toks[i]) > 0
    ), tok AS (
      SELECT doc_id, lang, ({_U32_SQL}) % 256 AS bucket FROM tok0
    ), bt AS (
      SELECT bucket, count(*) AS ct FROM tok WHERE lang = 'en' GROUP BY 1
    ), br AS (
      SELECT bucket, count(*) AS cr FROM tok WHERE lang <> 'en' GROUP BY 1
    ), wtab AS (
      SELECT coalesce(bt.bucket, br.bucket) AS bucket,
             coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
      FROM bt FULL JOIN br ON bt.bucket = br.bucket
    ), lr AS (
      SELECT bucket,
             ln((ct + 1.0) / (sum(ct) OVER () + 256.0))
               - ln((cr + 1.0) / (sum(cr) OVER () + 256.0)) AS w
      FROM wtab
    ), dtok AS (
      SELECT doc_id, bucket, count(*) AS dc
      FROM tok WHERE lang <> 'en' GROUP BY 1, 2
    ), scored AS (
      SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_tokens,
             round(sum(dc * w) / sum(dc), 6) AS dsir_weight
      FROM dtok JOIN lr USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, dsir_weight
    FROM scored ORDER BY dsir_weight DESC, doc_id ASC LIMIT 20
    """,
)
def x33_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    every out-of-target document by how target-like its hashed-unigram
    distribution is — avg log p_target/p_raw over 256 md5-hashed feature
    buckets with Laplace smoothing — and return the top 20 resampling
    candidates. Target = the English subcorpus; raw = everything else.

    Scale shape: ONE explode over corpus tokens feeds both the two
    256-row bucket-count aggs (partial-agg, map-side combine) and the
    per-doc bucket counts; the log-ratio table is 256 rows and rides as a
    broadcast join onto the per-doc stream (windows run over the 256-row
    table only, never the corpus). Top-k via TakeOrderedAndProject on the
    ROUNDED weight with doc_id tiebreak, so the boundary is deterministic
    across engines."""
    docs = _t(spark, sf, "documents")
    from ..operators.dedup import normalized_text

    tok = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
        .select(
            "doc_id",
            "lang",
            (
                F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
                % 256
            ).alias("bucket"),
        )
    )
    # NOTE (optimization round 12, negative result): reducing the three
    # corpus explodes to ONE materialized per-(doc, lang, bucket) count
    # table measured 1.29x SLOWER at sf0.1 over 7 interleaved old/new
    # session pairs — the old bucket counts reduce map-side to 256 rows
    # (near-free shuffles), while the fused table shuffles docs×256 rows
    # AND pays a checkpoint. Reverted; the explodes stay cheaper than the
    # materialization until scans dominate (far above bench scale).
    bt = tok.filter(F.col("lang") == "en").groupBy("bucket").agg(
        F.count("*").alias("ct")
    )
    br = tok.filter(F.col("lang") != "en").groupBy("bucket").agg(
        F.count("*").alias("cr")
    )
    wtab = (
        bt.join(br, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    wall = Window.partitionBy()
    lr = wtab.select(
        "bucket",
        (
            F.log((F.col("ct") + 1.0) / (F.sum("ct").over(wall) + 256.0))
            - F.log((F.col("cr") + 1.0) / (F.sum("cr").over(wall) + 256.0))
        ).alias("w"),
    )
    dtok = (
        tok.filter(F.col("lang") != "en")
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("dc"))
    )
    scored = (
        dtok.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("dc").alias("n_tokens"),
            F.round(
                F.sum(F.col("dc") * F.col("w")) / F.sum("dc"), 6
            ).alias("dsir_weight"),
        )
    )
    return scored.orderBy(
        F.desc("dsir_weight"), F.asc("doc_id")
    ).limit(20)


_SPAN_K = 8  # rolling-shingle length for duplicated-span detection


@query(
    "x34_duplicated_span_extents",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 = 1
                  THEN text || ' {_DISCLAIMER}'
                  WHEN doc_id % 11 = 3
                  THEN text || ' {_DISCLAIMER} {_DISCLAIMER}'
                  ELSE text END AS text
      FROM documents
    ), norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), sh AS (
      SELECT doc_id, len(toks) AS n_toks, u.p AS pos,
             md5(array_to_string(list_slice(toks, u.p, u.p + {_SPAN_K} - 1),
                                 ' ')) AS h
      FROM norm,
           unnest(generate_series(1, greatest(len(toks) - {_SPAN_K} + 1, 0)))
             u(p)
    ), dup AS (
      SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), marked AS (
      SELECT s.doc_id, s.n_toks, s.pos FROM sh s JOIN dup USING (h)
    ), brk AS (
      SELECT doc_id, n_toks, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos > lag(pos) OVER w + {_SPAN_K}
                  THEN 1 ELSE 0 END AS is_new
      FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), grp AS (
      SELECT doc_id, n_toks, pos,
             sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM brk
    ), spans AS (
      SELECT doc_id, any_value(n_toks) AS n_toks,
             max(pos) - min(pos) + {_SPAN_K} AS span
      FROM grp GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_dup_spans,
           CAST(max(span) AS BIGINT) AS max_span_tokens,
           CAST(sum(span) AS BIGINT) AS dup_tokens,
           round(CAST(sum(span) AS DOUBLE) / any_value(n_toks), 6)
             AS dup_ratio
    FROM spans GROUP BY doc_id
    """,
)
def x34_duplicated_span_extents(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring duplicate SPANS (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): where x32 strips fixed
    segments shared corpus-wide, this measures the *extent* of verbatim
    cross-document repetition — every length-8 rolling token shingle that
    occurs in >= 2 distinct documents marks its 8-token interval, and
    overlapping/adjacent intervals merge into maximal duplicated spans
    (the practical shingle-hash stand-in for the paper's suffix-array
    scan). Per document: span count, longest span, duplicated-token
    coverage and ratio — the signal used to cut memorization-prone
    documents. Planted: every 9th document carries one shared disclaimer
    (one ~12-token span), every 11th a doubled one (a longer span).

    Scale shape: see ``operators/dedup.py:duplicated_span_extents`` —
    map-side rolling shingles, ONE 16-byte-hash groupBy with map-side
    partial agg, broadcast join back, per-document island window; no
    corpus-wide window, no all-pairs."""
    from ..operators.dedup import duplicated_span_extents

    plant1 = F.lit(" " + _DISCLAIMER)
    plant2 = F.lit(" " + _DISCLAIMER + " " + _DISCLAIMER)
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 9 == 1, F.concat(F.col("text"), plant1))
        .when(F.col("doc_id") % 11 == 3, F.concat(F.col("text"), plant2))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return duplicated_span_extents(docs, k=_SPAN_K, min_docs=2)


@query(
    "x35_perplexity_terciles",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), model_uni AS (
      SELECT t.tok AS w, count(*) AS c
      FROM norm, unnest(toks) t(tok)
      WHERE t.tok <> '' AND doc_id % 2 = 0 GROUP BY 1
    ), v AS (SELECT count(*) AS v FROM model_uni),
    model_bi AS (
      SELECT toks[i] AS wa, toks[i+1] AS wb, count(*) AS c
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 0
      GROUP BY 1, 2
    ), doc_bi AS (
      SELECT doc_id, toks[i] AS wa, toks[i+1] AS wb
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 1
    ), scores AS (
      SELECT d.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             round(-sum(ln((coalesce(b.c, 0) + 1.0)
                           / (coalesce(ua.c, 0) + v.v))) / count(*), 6)
               AS cross_entropy
      FROM doc_bi d
      LEFT JOIN model_bi b ON b.wa = d.wa AND b.wb = d.wb
      LEFT JOIN model_uni ua ON ua.w = d.wa
      CROSS JOIN v
      GROUP BY d.doc_id
    ), bucketed AS (
      SELECT s.*, docs.lang,
             ntile(3) OVER (PARTITION BY docs.lang
                            ORDER BY s.cross_entropy, s.doc_id) AS tercile
      FROM scores s JOIN documents docs USING (doc_id)
    )
    SELECT lang, tercile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
           round(min(cross_entropy), 6) AS min_ce,
           round(max(cross_entropy), 6) AS max_ce
    FROM bucketed GROUP BY 1, 2
    """,
)
def x35_perplexity_terciles(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): per language,
    rank scored documents by held-out bigram cross-entropy (x31's
    statistic, reused verbatim) and cut the ranking into terciles — the
    bucket boundaries CCNet uses to keep the head, sample the middle and
    drop the tail of a crawl. Output: per (lang, tercile) doc count,
    bigram mass, and the tercile's entropy band [min_ce, max_ce].

    Scale shape: x31's scoring plan unchanged (vocab-sized model
    broadcasts, one corpus pass), then ntile over a per-language window —
    the window's sort key is (rounded ce, doc_id), a total order, so the
    bucketing is deterministic; the final agg is tiny (langs × 3 rows).
    The per-lang window sorts only scored docs (half the corpus) and in
    production would be the once-per-crawl ranking step."""
    scores = x31_bigram_perplexity(spark, sf)
    langs = _t(spark, sf, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy("cross_entropy", "doc_id")
    bucketed = scores.join(langs, "doc_id").withColumn(
        "tercile", F.ntile(3).over(w)
    )
    return bucketed.groupBy("lang", "tercile").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bigrams").alias("sum_bigrams"),
        F.round(F.min("cross_entropy"), 6).alias("min_ce"),
        F.round(F.max("cross_entropy"), 6).alias("max_ce"),
    )


@query(
    "x36_kneser_ney_scores",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), model_bi AS (
      SELECT toks[i] AS wa, toks[i+1] AS wb, count(*) AS c12
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 0
      GROUP BY 1, 2
    ), left_ctx AS (
      SELECT wa, CAST(sum(c12) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n1f
      FROM model_bi GROUP BY wa
    ), right_ctx AS (
      SELECT wb, CAST(count(*) AS BIGINT) AS n1b FROM model_bi GROUP BY wb
    ), totals AS (
      SELECT CAST(count(*) AS BIGINT) AS n_bi FROM model_bi
    ), doc_bi AS (
      SELECT doc_id, toks[i] AS wa, toks[i+1] AS wb
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> '' AND doc_id % 2 = 1
    ), probs AS (
      SELECT d.doc_id,
             CASE
               WHEN l.c1 IS NOT NULL THEN
                 (greatest(coalesce(b.c12, 0) - 0.75, 0)
                  + 0.75 * l.n1f
                    * (coalesce(r.n1b, 0) / CAST(t.n_bi AS DOUBLE)))
                 / l.c1
               WHEN r.n1b IS NOT NULL THEN
                 r.n1b / CAST(t.n_bi AS DOUBLE)
               ELSE 1.0 / t.n_bi
             END AS p,
             CASE WHEN b.c12 IS NULL THEN 1 ELSE 0 END AS backoff
      FROM doc_bi d
      LEFT JOIN model_bi b ON b.wa = d.wa AND b.wb = d.wb
      LEFT JOIN left_ctx l ON l.wa = d.wa
      LEFT JOIN right_ctx r ON r.wb = d.wb
      CROSS JOIN totals t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(backoff) AS BIGINT) AS n_backoff,
           round(-sum(ln(p)) / count(*), 6) AS kn_cross_entropy
    FROM probs GROUP BY doc_id
    """,
)
def x36_kneser_ney_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the smoothing family KenLM
    implements and CCNet actually filters with (x31's add-1 is the
    baseline; KN replaces "how often does w2 occur" with "in how many
    distinct contexts does w2 occur", which is what separates boilerplate
    from fluent text). Model on even doc ids (the trusted half), scored on
    odd:

        P(w2|w1) = (max(c(w1w2) - D, 0) + D · N1+(w1,·) · Pcont(w2)) / c(w1)
        Pcont(w2) = N1+(·,w2) / N1+(·,·),  D = 0.75

    with documented OOV conventions: unseen left context falls back to
    Pcont(w2); both-unseen falls to 1/N1+(·,·). Per scored doc: bigram
    count, backoff count (bigrams outside the model), KN cross-entropy.

    Scale shape: the model is three count tables (bigram, left-context,
    right-context) + a 1-row total — all vocabulary-sized, all BROADCAST
    into the scored-doc bigram stream; every term is an exact integer
    count, so the oracle replays the arithmetic bit-for-bit. One corpus
    pass + one groupBy(doc_id), same as x31."""
    docs = _t(spark, sf, "documents")
    from ..operators.dedup import normalized_text

    toks = docs.select("doc_id", F.split(normalized_text("text"), " ").alias("_t"))

    def bigrams(frame):
        pos = frame.select(
            "doc_id",
            "_t",
            F.explode(
                F.when(
                    F.size("_t") >= 2,
                    F.sequence(F.lit(1), F.size("_t") - 1),
                ).otherwise(F.array())
            ).alias("_i"),
        )
        return pos.select(
            "doc_id",
            F.try_element_at("_t", F.col("_i")).alias("wa"),
            F.try_element_at("_t", F.col("_i") + 1).alias("wb"),
        ).filter((F.col("wa") != "") & (F.col("wb") != ""))

    # materialized once (optimization round 12, guide §5): the bigram
    # model table feeds FOUR consumers (left/right context tables, the
    # corpus total, and the scored-side broadcast) and each re-ran the
    # model-half corpus explode + groupBy; bigram-vocabulary-sized
    model = reliable_checkpoint(
        bigrams(toks.filter(F.col("doc_id") % 2 == 0)).groupBy("wa", "wb").agg(
            F.count("*").alias("c12")
        )
    )
    left_ctx = model.groupBy("wa").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1f")
    )
    right_ctx = model.groupBy("wb").agg(F.count("*").alias("n1b"))
    totals = model.groupBy().agg(F.count("*").alias("n_bi"))

    scored = (
        bigrams(toks.filter(F.col("doc_id") % 2 == 1))
        .join(F.broadcast(model), ["wa", "wb"], "left")
        .join(F.broadcast(left_ctx), "wa", "left")
        .join(F.broadcast(right_ctx), "wb", "left")
        .crossJoin(F.broadcast(totals))
    )
    pcont = F.coalesce(F.col("n1b"), F.lit(0)) / F.col("n_bi").cast("double")
    p = (
        F.when(
            F.col("c1").isNotNull(),
            (
                F.greatest(
                    F.coalesce(F.col("c12"), F.lit(0)) - F.lit(0.75), F.lit(0.0)
                )
                + F.lit(0.75) * F.col("n1f") * pcont
            )
            / F.col("c1"),
        )
        .when(F.col("n1b").isNotNull(), F.col("n1b") / F.col("n_bi").cast("double"))
        .otherwise(F.lit(1.0) / F.col("n_bi"))
    )
    probs = scored.select(
        "doc_id",
        p.alias("p"),
        F.when(F.col("c12").isNull(), 1).otherwise(0).alias("backoff"),
    )
    return probs.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("backoff").alias("n_backoff"),
        F.round(-F.sum(F.log("p")) / F.count("*"), 6).alias("kn_cross_entropy"),
    )


@query(
    "x37_bm25_ranking",
    f"""
    WITH toks AS (
      SELECT doc_id, tok AS token FROM (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
        FROM documents)
      WHERE tok <> ''
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks
      WHERE token IN ('table', 'query') GROUP BY 1, 2
    ), df AS (
      SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id,
             ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (CAST(tf.tf AS DOUBLE) * (1.2 + 1))
               / (CAST(tf.tf AS DOUBLE)
                  + 1.2 * (1 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / s.avgdl))
               AS part
      FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id, round(sum(part), 6) AS bm25
    FROM scored GROUP BY 1
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 10
    """,
)
def x37_bm25_ranking(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 ranking (k1=1.2, b=0.75) for a disjunctive two-term query
    ('table' OR 'query') — the standard lexical scorer a training-data
    pipeline uses for retrieval baselines and hard-negative mining; the
    idf-weighted, length-normalized upgrade of x18's raw tf ranking.

    Scale shape: one tokenize pass feeds both the per-doc length table and
    the two query-term posting slices; n_docs/avgdl fold back in as a 1-row
    broadcast (integer sums — exact, order-independent — divided once).
    Posting slices are term-selective (never corpus-wide), so the dl join
    and the per-doc score sum run on candidate docs only; top-k via
    TakeOrderedAndProject. The per-doc sum adds at most one part per query
    term, so the double fold is order-insensitive."""
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.groupBy().agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("token").isin("table", "query"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    k1, b = F.lit(1.2), F.lit(0.75)
    idf = F.log(
        F.lit(1)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfd = F.col("tf").cast("double")
    part = idf * (tfd * (k1 + 1)) / (
        tfd + k1 * (F.lit(1) - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", part.alias("part"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "x38_gopher_rules",
    r"""
    WITH w AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents)
      WHERE tok <> ''
    ), ws AS (
      SELECT doc_id,
             count(*) AS n_words,
             CAST(sum(length(tok)) AS BIGINT) AS sum_len,
             CAST(sum(CASE WHEN regexp_matches(tok, '[A-Za-z]')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
             count(DISTINCT CASE WHEN lower(tok) IN
               ('join', 'hash', 'row', 'batch', 'scan')
               THEN lower(tok) END) AS n_stop
      FROM w GROUP BY 1
    ), ls AS (
      SELECT doc_id,
             count(*) AS n_lines,
             CAST(sum(CASE WHEN trim(ln) LIKE '-%' OR trim(ln) LIKE '*%'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet,
             CAST(sum(CASE WHEN trim(ln) LIKE '%...'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_ellip
      FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln
            FROM documents)
      GROUP BY 1
    ), sym AS (
      SELECT doc_id,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3 AS n_dots
      FROM documents
    ), feat AS (
      SELECT ws.doc_id,
             CASE WHEN ws.n_words < 50 OR ws.n_words > 100000
                  THEN 1 ELSE 0 END AS f_word_count,
             CASE WHEN CAST(ws.sum_len AS DOUBLE) / ws.n_words < 3
                    OR CAST(ws.sum_len AS DOUBLE) / ws.n_words > 10
                  THEN 1 ELSE 0 END AS f_mean_word_len,
             CASE WHEN CAST(sym.n_hash + sym.n_dots AS DOUBLE) / ws.n_words
                    > 0.1 THEN 1 ELSE 0 END AS f_symbol_ratio,
             CASE WHEN CAST(ls.n_bullet AS DOUBLE) / ls.n_lines > 0.9
                  THEN 1 ELSE 0 END AS f_bullet_lines,
             CASE WHEN CAST(ls.n_ellip AS DOUBLE) / ls.n_lines > 0.3
                  THEN 1 ELSE 0 END AS f_ellipsis_lines,
             CASE WHEN CAST(ws.n_alpha AS DOUBLE) / ws.n_words < 0.8
                  THEN 1 ELSE 0 END AS f_alpha_words,
             CASE WHEN ws.n_stop < 2 THEN 1 ELSE 0 END AS f_stopwords
      FROM ws JOIN ls USING (doc_id) JOIN sym USING (doc_id)
    ), unp AS (
      SELECT 'word_count' AS rule, f_word_count AS fail FROM feat
      UNION ALL SELECT 'mean_word_len', f_mean_word_len FROM feat
      UNION ALL SELECT 'symbol_ratio', f_symbol_ratio FROM feat
      UNION ALL SELECT 'bullet_lines', f_bullet_lines FROM feat
      UNION ALL SELECT 'ellipsis_lines', f_ellipsis_lines FROM feat
      UNION ALL SELECT 'alpha_words', f_alpha_words FROM feat
      UNION ALL SELECT 'stopwords', f_stopwords FROM feat
    )
    SELECT rule, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(fail) AS BIGINT) AS n_fail,
           round(100.0 * CAST(sum(fail) AS DOUBLE) / count(*), 6) AS fail_pct
    FROM unp GROUP BY 1
    """,
)
def x38_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, table A1 subset):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio,
    bullet-line and ellipsis-line fractions, alphabetic-word fraction, and
    the minimum-stopword test — the de-facto baseline heuristic filter
    every web-scale corpus pass applies before model-based scoring. (The
    stopword set here is the testdata corpus's five most frequent terms —
    the synthetic vocabulary has no English function words; production
    swaps in the usual 'the/and/of/to/in' list.)
    Reports per-rule failure counts and rates over all documents with at
    least one token (the rule universe).

    Scale shape: one tokenize pass and one line-split pass collapse
    map-side into per-doc count features (two shuffles on doc_id, both
    with partial agg); the rule battery is then pure column arithmetic on
    the per-doc feature table, unpivoted into (rule, fail) pairs and
    reduced to 7 cells. All ratios are single divisions of exact integer
    counts — no order-sensitive double folds anywhere."""
    docs = _t(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    ws = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(F.length("tok")).alias("sum_len"),
        F.sum(F.when(F.col("tok").rlike("[A-Za-z]"), 1).otherwise(0)).alias(
            "n_alpha"
        ),
        F.count_distinct(
            F.when(
                F.lower("tok").isin("join", "hash", "row", "batch", "scan"),
                F.lower("tok"),
            )
        ).alias("n_stop"),
    )
    lines = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "\n")).alias("ln")
    )
    ls = lines.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(
            F.when(
                F.trim("ln").startswith("-") | F.trim("ln").startswith("*"), 1
            ).otherwise(0)
        ).alias("n_bullet"),
        F.sum(F.when(F.trim("ln").endswith("..."), 1).otherwise(0)).alias(
            "n_ellip"
        ),
    )
    sym = docs.select(
        "doc_id",
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))).alias(
            "n_hash"
        ),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("..."))))
            / 3
        ).alias("n_dots"),
    )
    mean_len = F.col("sum_len").cast("double") / F.col("n_words")
    feat = (
        ws.join(ls, "doc_id")
        .join(sym, "doc_id")
        .select(
            F.when((F.col("n_words") < 50) | (F.col("n_words") > 100000), 1)
            .otherwise(0)
            .alias("f_word_count"),
            F.when((mean_len < 3) | (mean_len > 10), 1)
            .otherwise(0)
            .alias("f_mean_word_len"),
            F.when(
                (F.col("n_hash") + F.col("n_dots")).cast("double")
                / F.col("n_words")
                > 0.1,
                1,
            )
            .otherwise(0)
            .alias("f_symbol_ratio"),
            F.when(
                F.col("n_bullet").cast("double") / F.col("n_lines") > 0.9, 1
            )
            .otherwise(0)
            .alias("f_bullet_lines"),
            F.when(
                F.col("n_ellip").cast("double") / F.col("n_lines") > 0.3, 1
            )
            .otherwise(0)
            .alias("f_ellipsis_lines"),
            F.when(
                F.col("n_alpha").cast("double") / F.col("n_words") < 0.8, 1
            )
            .otherwise(0)
            .alias("f_alpha_words"),
            F.when(F.col("n_stop") < 2, 1).otherwise(0).alias("f_stopwords"),
        )
    )
    unp = feat.select(
        F.expr(
            "stack(7, "
            "'word_count', f_word_count, "
            "'mean_word_len', f_mean_word_len, "
            "'symbol_ratio', f_symbol_ratio, "
            "'bullet_lines', f_bullet_lines, "
            "'ellipsis_lines', f_ellipsis_lines, "
            "'alpha_words', f_alpha_words, "
            "'stopwords', f_stopwords) AS (rule, fail)"
        )
    )
    return unp.groupBy("rule").agg(
        F.count("*").alias("n_docs"),
        F.sum("fail").cast("bigint").alias("n_fail"),
        F.round(
            F.lit(100.0) * F.sum("fail").cast("double") / F.count("*"), 6
        ).alias("fail_pct"),
    )


@query(
    "x39_zipf_slope",
    f"""
    WITH freq AS (
      SELECT tok AS token, count(*) AS c FROM (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents)
      WHERE tok <> '' GROUP BY 1
    ), ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, token ASC) AS DOUBLE))
               AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM freq
      ORDER BY c DESC, token ASC
      LIMIT 1000
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_tokens,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept
    FROM s
    """,
)
def x39_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit of the vocabulary: OLS slope of log-frequency vs
    log-rank over the top-1000 tokens — the rank-frequency diagnostic that
    pairs with Heaps' law (x25): natural text sits near slope −1, and a
    drifting slope flags boilerplate floods or template spam in a crawl
    slice.

    Scale shape: the corpus collapses to vocabulary-sized (token, count)
    cells in ONE partial-agg shuffle; the top-1000 cut is a
    TakeOrderedAndProject with a total tiebreak; the regression reduces
    1000 rows to five sufficient statistics in a single 1-row aggregate —
    closed-form OLS, no iterative fitting."""
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    freq = (
        docs.select(
            F.explode(F.split(normalized_text("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    ranked = (
        freq.orderBy(F.desc("c"), F.asc("token"))
        .limit(1000)
        .select(
            F.log(
                F.row_number()
                .over(Window.orderBy(F.desc("c"), F.asc("token")))
                .cast("double")
            ).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    s = ranked.groupBy().agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@query(
    "x40_priority_sample",
    f"""
    WITH pr AS (
      SELECT doc_id, n_chars,
             n_chars * 4294967296.0
               / (({_u32_sql("CAST(doc_id AS VARCHAR)")}) + 1.0) AS q
      FROM documents
    ), top21 AS (
      SELECT q FROM pr ORDER BY q DESC, doc_id ASC LIMIT 21
    ), tau AS (
      SELECT min(q) AS tau FROM top21
    ), top20 AS (
      SELECT doc_id, n_chars, q FROM pr ORDER BY q DESC, doc_id ASC LIMIT 20
    )
    SELECT t.doc_id, t.n_chars,
           CAST(floor(t.q) AS BIGINT) AS priority_floor,
           CAST(floor(greatest(CAST(t.n_chars AS DOUBLE), tau.tau)) AS BIGINT)
             AS est_weight_floor
    FROM top20 t CROSS JOIN tau
    """,
)
def x40_priority_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted sampling without replacement by PRIORITY SAMPLING
    (Duffield, Lund & Thorup, JACM 2007): each document draws priority
    q = w/u with weight w = n_chars and a deterministic uniform
    u = (u32+1)/2³² from md5(doc_id); the top-20 by priority are the
    sample, and each kept item carries the unbiased subset-sum estimator
    max(w, τ) with τ the 21st priority — the principled way to build a
    small weighted training subset whose token totals still estimate the
    corpus. Deterministic BY CONSTRUCTION — same sample on any cluster,
    any partitioning, any engine: the priority is a single IEEE division
    of exactly-representable integers (no ln/pow whose last-ulp behavior
    differs across libm implementations — why this uses DLT priority
    sampling rather than Efraimidis-Espirakis exponential keys), and the
    emitted columns are integer floors.

    Scale shape: priorities are map-side arithmetic on (doc_id, n_chars);
    both cutoffs are TakeOrderedAndProject top-k heaps (k=20/21) — no
    global sort, no window; τ folds back as a 1-row broadcast."""
    docs = _t(spark, sf, "documents").select("doc_id", "n_chars")
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    pr = docs.select(
        "doc_id",
        "n_chars",
        (F.col("n_chars") * F.lit(4294967296.0) / (u32 + F.lit(1.0))).alias("q"),
    )
    top21 = pr.orderBy(F.desc("q"), F.asc("doc_id")).limit(21)
    tau = top21.groupBy().agg(F.min("q").alias("tau"))
    top20 = pr.orderBy(F.desc("q"), F.asc("doc_id")).limit(20)
    return top20.crossJoin(F.broadcast(tau)).select(
        "doc_id",
        "n_chars",
        F.floor("q").cast("bigint").alias("priority_floor"),
        F.floor(F.greatest(F.col("n_chars").cast("double"), F.col("tau")))
        .cast("bigint")
        .alias("est_weight_floor"),
    )


@query(
    "x41_readability",
    r"""
    WITH f AS (
      SELECT source,
             len(regexp_extract_all(trim(text), '\S+')) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syll
      FROM documents
    ), agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_words) AS BIGINT) AS words,
             CAST(sum(n_sents) AS BIGINT) AS sents,
             CAST(sum(n_syll) AS BIGINT) AS sylls
      FROM f GROUP BY 1
    )
    SELECT source, n_docs, words, sents, sylls,
           round(206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
                        - 84.6 * (CAST(sylls AS DOUBLE) / words), 6) AS flesch
    FROM agg
    """,
)
def x41_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source Flesch reading-ease score — corpus-level readability
    from three exact integer counts per document (whitespace words,
    sentence-ending punctuation runs floored at 1, vowel-group syllable
    heuristic), aggregated to source totals before the classic
    206.835 − 1.015·(W/S) − 84.6·(Y/W) formula. The readability axis of
    the quality battery (x3 features, x7 filter, x38 Gopher rules):
    training-mix curation commonly buckets sources by reading level, and
    a source whose score drifts flags template or OCR junk. All counts
    are integers, so the per-source sums are exact and the two divisions
    round once each — engine-identical.

    Scale shape: three regexp counts map-side per document (no explode —
    the token lists never materialize into rows), ONE partial-agg shuffle
    into source cells; the formula is arithmetic on the aggregated row."""
    docs = _t(spark, sf, "documents")
    n_words = F.size(F.regexp_extract_all(F.trim(F.col("text")), F.lit(r"\S+"), 0))
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0)), F.lit(1)
    )
    n_syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    agg = (
        docs.select(
            "source",
            n_words.alias("n_words"),
            n_sents.alias("n_sents"),
            n_syll.alias("n_syll"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("words"),
            F.sum("n_sents").alias("sents"),
            F.sum("n_syll").alias("sylls"),
        )
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "sents",
        "sylls",
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (F.col("words").cast("double") / F.col("sents"))
            - F.lit(84.6) * (F.col("sylls").cast("double") / F.col("words")),
            6,
        ).alias("flesch"),
    )


@query(
    "x42_ngram_novelty",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                       toks[i+4]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 4, 1))) t(i)
      WHERE length(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                             toks[i+4])) > 0
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
    ), novel AS (
      SELECT first_doc AS doc_id, count(*) AS n_novel FROM (
        SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1)
      GROUP BY 1
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p.n_sh) AS BIGINT) AS shingles_total,
           CAST(sum(coalesce(v.n_novel, 0)) AS BIGINT) AS shingles_novel,
           round(CAST(sum(coalesce(v.n_novel, 0)) AS DOUBLE)
                 / CAST(sum(p.n_sh) AS DOUBLE), 6) AS novelty
    FROM per_doc p
    JOIN documents d USING (doc_id)
    LEFT JOIN novel v USING (doc_id)
    GROUP BY 1
    """,
)
def x42_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source n-gram NOVELTY — the fraction of each source's 5-gram
    shingles that appear for the FIRST time (by doc_id order) in that
    document. The growth-curve diagnostic behind "is this crawl slice
    adding new text or re-serving what we already have?": sources full of
    templates or near-copies score low, fresh prose scores near 1. The
    first-seen attribution is the streaming-dedup admission rule (a doc
    "owns" the shingles it introduced) expressed as a batch query.

    Scale shape: the shingle stream reduces TWICE, never joins on string
    keys against itself — (1) groupBy(doc_id) for per-doc totals, (2)
    groupBy(shingle) with a min-combiner for first-seen, whose output
    re-aggregates by the winning doc. The only joins are id-keyed on
    doc-count-sized tables. All-integer sums, one rounded division."""
    from ..operators.dedup import shingles

    docs = _t(spark, sf, "documents")
    sh = shingles(docs, n=5)
    per_doc = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    novel = (
        sh.groupBy("shingle")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_novel"))
    )
    joined = (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .join(novel, "doc_id", "left")
        .select(
            "source",
            "n_sh",
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
        )
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_sh").alias("shingles_total"),
        F.sum("n_novel").alias("shingles_novel"),
        F.round(
            F.sum("n_novel").cast("double") / F.sum("n_sh").cast("double"), 6
        ).alias("novelty"),
    )


@query(
    "x43_dedup_impact",
    f"""
    WITH corpus AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, source, text
      FROM documents WHERE doc_id < 40
    ), marked AS (
      SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS n_tok,
             row_number() OVER (
               PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
      FROM corpus
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_removed,
           round(CAST(sum(CASE WHEN rn > 1 THEN n_tok ELSE 0 END) AS DOUBLE)
                 / CAST(sum(n_tok) AS DOUBLE), 6) AS pct_removed
    FROM marked GROUP BY 1
    """,
)
def x43_dedup_impact(spark: SparkSession, sf: str) -> DataFrame:
    """Token-weighted exact-dedup IMPACT report per source — what the
    keep-first rule actually saves: documents dropped, tokens dropped,
    and the share of each source's token mass that was duplicate. The
    number a curation run reports to justify its cost (doc counts
    undersell dedup when duplicates skew long). Planted verbatim copies
    (doc_id < 40 re-appended) make the report non-trivial at every SF.

    Scale shape: ONE window over content-hash groups (the
    ``distinct_documents`` rn=1 rule, so the report matches what the
    dedup pass would drop), ONE partial-agg shuffle to source cells;
    token counts are the x1 whitespace convention, all sums integer."""
    from ..operators.dedup import content_hash
    from ..operators.textan import token_count

    docs = _t(spark, sf, "documents").select("doc_id", "source", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 40).select(
            (F.col("doc_id") + 200000).alias("doc_id"), "source", "text"
        )
    )
    w = Window.partitionBy(content_hash("text")).orderBy("doc_id")
    marked = corpus.select(
        "source",
        token_count().alias("n_tok"),
        F.row_number().over(w).alias("rn"),
    )
    dup_tok = F.sum(F.when(F.col("rn") > 1, F.col("n_tok")).otherwise(F.lit(0)))
    return marked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("rn") > 1).cast("bigint")).alias("n_dup_docs"),
        F.sum("n_tok").alias("tokens_total"),
        dup_tok.alias("tokens_removed"),
        F.round(
            dup_tok.cast("double") / F.sum("n_tok").cast("double"), 6
        ).alias("pct_removed"),
    )


@query(
    "x44_burstiness",
    f"""
    WITH tok AS (
      SELECT doc_id, tok AS token FROM (
        SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
        FROM documents)
      WHERE tok <> ''
    ), per_doc AS (
      SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2
    ), terms AS (
      SELECT token, CAST(sum(c) AS BIGINT) AS tf,
             CAST(count(*) AS BIGINT) AS df
      FROM per_doc GROUP BY 1
      ORDER BY df DESC, token ASC LIMIT 50
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM tok
    )
    SELECT token, tf, df,
           CAST(tf AS DOUBLE) / df AS burstiness,
           round((CAST(tf AS DOUBLE) / n_docs)
                 / (1.0 - exp(-(CAST(tf AS DOUBLE) / n_docs))), 6)
             AS poisson_expected
    FROM terms CROSS JOIN n
    """,
)
def x44_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Term BURSTINESS (Church & Gale): for the 50 highest-document-
    frequency terms, the observed mean occurrences per containing
    document (tf/df) against the zero-truncated-Poisson expectation
    under an even scatter of the same tf. Content words burst (tf/df ≫
    expected), function words don't — and a "function-looking" token
    that bursts is boilerplate (navigation text, templates) the
    quality filters should see. Complements x24 (boilerplate n-grams)
    and x39 (Zipf slope) on the vocabulary-diagnostics axis.

    Scale shape: one (token, doc) partial-agg shuffle, one token reduce,
    a top-50 TakeOrderedAndProject with total tiebreak; the corpus doc
    count rides in as a 1-row broadcast (the x11 shape). tf/df is an
    exact integer division (deterministic unrounded); only the Poisson
    term goes through exp() and rounds."""
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(normalized_text("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    per_doc = tok.groupBy("token", "doc_id").agg(F.count("*").alias("c"))
    terms = (
        per_doc.groupBy("token")
        .agg(F.sum("c").alias("tf"), F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(50)
    )
    n = tok.groupBy().agg(F.countDistinct("doc_id").alias("n_docs"))
    lam = F.col("tf").cast("double") / F.col("n_docs")
    return terms.crossJoin(F.broadcast(n)).select(
        "token",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df")).alias("burstiness"),
        F.round(lam / (F.lit(1.0) - F.exp(-lam)), 6).alias("poisson_expected"),
    )


@query(
    "x45_code_detection",
    """
    WITH corpus AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT source,
             'def f_' || doc_id || '(x):' || chr(10) ||
             '    y = (x * ' || doc_id || ');' || chr(10) ||
             '    return y + ' || doc_id AS text
      FROM documents WHERE doc_id < 30
    ), f AS (
      SELECT source,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[{}()=;:]', '', 'g'))
               AS n_sym,
             len(string_split(text, chr(10))) AS n_lines,
             len(list_filter(string_split(text, chr(10)),
                             x -> regexp_matches(x, '^(  |\t)'))) AS n_indent
      FROM corpus
    ), scored AS (
      SELECT source, n_chars, n_sym,
             CASE WHEN CAST(n_sym AS DOUBLE) / n_chars > 0.03
                    OR CAST(n_indent AS DOUBLE) / n_lines > 0.2
                  THEN 1 ELSE 0 END AS is_code
      FROM f
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_code) AS BIGINT) AS n_code,
           CAST(sum(is_code) AS DOUBLE) / count(*) AS code_frac,
           CAST(sum(n_sym) AS DOUBLE) / sum(n_chars) AS symbol_density
    FROM scored GROUP BY 1
    """,
)
def x45_code_detection(spark: SparkSession, sf: str) -> DataFrame:
    """CODE-vs-PROSE detection per source — the mix signal a training-data
    pipeline needs before routing documents to code or text tokenizers:
    symbol density ([{}()=;:] chars per char) and indented-line fraction,
    thresholded exactly like a fastText-less CommonCrawl heuristic.
    Planted code snippets (30 deterministic python-shaped docs) give the
    detector known positives; natural prose stays below both thresholds.

    Scale shape: the features are TWO regexp counts and a line-split
    filter per document, all map-side; ONE partial-agg shuffle into
    source cells. Aggregate densities divide exact integer sums
    (deterministic unrounded IEEE divisions), never averaging per-doc
    doubles."""
    docs = _t(spark, sf, "documents")
    planted = docs.filter(F.col("doc_id") < 30).select(
        "source",
        F.concat(
            F.lit("def f_"), F.col("doc_id"), F.lit("(x):\n"),
            F.lit("    y = (x * "), F.col("doc_id"), F.lit(");\n"),
            F.lit("    return y + "), F.col("doc_id"),
        ).alias("text"),
    )
    corpus = docs.select("source", "text").unionByName(planted)
    n_chars = F.length("text")
    n_sym = n_chars - F.length(F.regexp_replace("text", r"[{}()=;:]", ""))
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    n_indent = F.size(F.filter(lines, lambda x: x.rlike(r"^(  |\t)")))
    is_code = (
        (n_sym.cast("double") / n_chars > 0.03)
        | (n_indent.cast("double") / n_lines > 0.2)
    ).cast("int")
    scored = corpus.select(
        "source",
        n_chars.alias("n_chars"),
        n_sym.alias("n_sym"),
        is_code.alias("is_code"),
    )
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("is_code").alias("n_code"),
        (F.sum("is_code").cast("double") / F.count("*")).alias("code_frac"),
        (F.sum("n_sym").cast("double") / F.sum("n_chars")).alias(
            "symbol_density"
        ),
    )


@query(
    "x46_mad_outliers",
    """
    WITH t AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
      FROM documents
    ), med AS (
      SELECT source, median(n) AS med FROM t GROUP BY 1
    ), mad AS (
      SELECT t.source, median(abs(t.n - med.med)) AS mad
      FROM t JOIN med USING (source) GROUP BY 1
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(any_value(med.med), 6) AS med_tokens,
           round(any_value(mad.mad), 6) AS mad_tokens,
           CAST(sum(CASE WHEN abs(t.n - med.med) > 3 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM t JOIN med USING (source) JOIN mad USING (source)
    GROUP BY t.source
    ORDER BY t.source
    """,
)
def x46_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust per-source length-outlier audit: median and MAD (median
    absolute deviation) of whitespace token counts, plus how many docs
    sit beyond the 3×MAD fence. The robust replacement for mean/σ
    outlier screens in curation — one pathological 10M-token document
    drags a mean fence wide open but moves the median fence not at all
    (the same reasoning that picked rolling quantiles over rolling means
    in w9).

    Determinism: token counts are exact integers; both engines implement
    the same interpolating median (position 0.5·(n−1) on the sorted
    values), so med/MAD agree bit-for-bit, and the 3×MAD comparison is
    exact-integer vs a small dyadic product.

    Scale shape: two grouped exact percentiles (per-source median, then
    median of |x−med| after a broadcast join of the K-row median table)
    and one final grouped agg — three shuffles of source-keyed rows, no
    corpus sort, no window over the corpus.

    Memory invariant (load-bearing — do not relax): ``F.percentile`` is
    the EXACT percentile, whose aggregation buffer is a per-group map of
    DISTINCT VALUE → count. That is safe here only because the input is
    an INTEGER token count: distinct values are bounded by the longest
    document's token count (thousands), not by group size, so the buffer
    stays KB-scale per source no matter how many billions of docs a
    source holds. Feeding a continuous column (a float quality score,
    a ratio) through this shape would grow the buffer linearly with
    group size and OOM the executor at 100 TB — switch to
    ``percentile_approx`` (fixed-size QuantileSummaries sketch) if this
    audit is ever generalized to non-integer inputs. The integer-input
    contract is pinned by ``tests/test_llm_ops.py::
    test_x46_percentile_integer_input_contract``."""
    from ..operators.textan import token_count

    t = _t(spark, sf, "documents").select(
        "doc_id", "source", token_count().alias("n")
    )
    med = t.groupBy("source").agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    t2 = t.join(F.broadcast(med), "source")
    mad = t2.groupBy("source").agg(
        F.percentile(F.abs(F.col("n") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    j = t2.join(F.broadcast(mad), "source")
    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.first("med"), 6).alias("med_tokens"),
            F.round(F.first("mad"), 6).alias("mad_tokens"),
            F.sum(
                F.when(
                    F.abs(F.col("n") - F.col("med")) > 3 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("source")
    )


@query(
    "x47_ndcg_audit",
    """
    WITH flat AS (
      SELECT vec_id, t.i - 1 AS i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY 1
    ), xdots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
      FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
      WHERE a.vec_id < 5
      GROUP BY 1, 2
    ), xsims AS (
      SELECT query_id, neighbor_id,
             round(dot / (na.nrm * nb.nrm), 6) AS sim
      FROM xdots JOIN norms na ON na.vec_id = query_id
                 JOIN norms nb ON nb.vec_id = neighbor_id
    ), xrank10 AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS rank_exact
      FROM xsims
      QUALIFY rank_exact <= 10
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
    ), isims AS (
      SELECT c.query_id, c.neighbor_id,
             round(sum(fa.x * fb.x) / (any_value(na.nrm) * any_value(nb.nrm)), 6)
               AS sim
      FROM cand c
      JOIN flat fa ON fa.vec_id = c.query_id
      JOIN flat fb ON fb.vec_id = c.neighbor_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = c.query_id
      JOIN norms nb ON nb.vec_id = c.neighbor_id
      GROUP BY 1, 2
    ), ivf10 AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
             ) AS rank
      FROM isims
      QUALIFY rank <= 10
    ), gains AS (
      SELECT i.query_id, i.rank,
             COALESCE(11 - x.rank_exact, 0) AS rel
      FROM ivf10 i LEFT JOIN xrank10 x
        ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
    ), idcg AS (
      SELECT sum((11 - g.i) / log2(g.i + 1)) AS v FROM range(1, 11) g(i)
    )
    SELECT query_id,
           CAST(count(*) AS BIGINT) AS n_ranked,
           CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_at_10,
           round(sum(rel / log2(rank + 1)), 6) AS dcg,
           round(sum(rel / log2(rank + 1)) / (SELECT v FROM idcg), 6) AS ndcg
    FROM gains GROUP BY query_id ORDER BY query_id
    """,
)
def x47_ndcg_audit(spark: SparkSession, sf: str) -> DataFrame:
    """nDCG@10 of the IVF-flat retrieval against exact cosine ground truth
    — the GRADED ranking-quality audit beside x30's set-level recall: a
    candidate list can hit 9/10 of the true neighbors and still be badly
    ordered; position-discounted gain is what an embedding-dedup or
    RAG-retrieval gate actually cares about. Relevance of a returned
    neighbor is its exact-cosine rank folded to an integer gain
    (rel = 11 − rank_exact inside the true top-10, else 0), IDCG is the
    perfect-ordering constant, so ndcg = 1.0 iff IVF returns the exact
    top-10 in exact order.

    Determinism: both rankings order by round(sim, 6) with neighbor-id
    tiebreaks (v1/v3's rule); gains are exact integers; the only floats
    are log2 discounts and one division, rounded to 6.

    Scale shape: reuses the v1 broadcast-query exact side (5 query rows
    against the corpus, never corpus×corpus) and the v3 IVF side
    (broadcast 16-row seed, cell-id equi-join candidates); the audit join
    is top-10×top-10 per query — metadata-sized."""
    import math

    from ..operators.similarity import cosine_topk, ivf_topk

    emb = _t(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") < 5)
    ex10 = cosine_topk(emb, qv, k=10, dim=64).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank_exact")
    )
    iv10 = ivf_topk(emb, qv, k=10, n_cells=16, nprobe=2, dim=64).select(
        "query_id", "neighbor_id", "rank"
    )
    rel = F.coalesce(F.lit(11) - F.col("rank_exact"), F.lit(0))
    disc = rel / F.log2(F.col("rank") + F.lit(1))
    idcg = sum((11 - i) / math.log2(i + 1) for i in range(1, 11))
    return (
        iv10.join(ex10, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_ranked"),
            F.sum((rel > 0).cast("int")).cast("long").alias("hits_at_10"),
            F.round(F.sum(disc), 6).alias("dcg"),
            F.round(F.sum(disc) / F.lit(idcg), 6).alias("ndcg"),
        )
        .orderBy("query_id")
    )


@query(
    "x48_winnowing_fingerprints",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), sized AS (
      SELECT doc_id, toks, len(toks) AS n_toks FROM norm WHERE len(toks) >= 5
    ), grams AS (
      SELECT doc_id, p.g AS p,
             md5(array_to_string(list_slice(toks, p.g, p.g + 4), ' ')) AS h,
             n_toks - 4 AS n_grams
      FROM sized, unnest(generate_series(1, n_toks - 4)) p(g)
    ), fps AS (
      SELECT doc_id, n_grams,
             min(h) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             p
      FROM grams
      QUALIFY p <= n_grams - 3
    ), docfp AS (
      SELECT DISTINCT doc_id, n_grams, fp FROM fps
    ), df AS (
      SELECT fp, count(DISTINCT doc_id) AS df FROM docfp GROUP BY fp
    )
    SELECT d.doc_id,
           CAST(any_value(d.n_grams) AS BIGINT) AS n_kgrams,
           CAST(count(*) AS BIGINT) AS n_fps,
           round(count(*) / any_value(d.n_grams), 6) AS fp_density,
           CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_fps
    FROM docfp d JOIN df USING (fp)
    GROUP BY d.doc_id
    """,
)
def x48_winnowing_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    the MOSS algorithm): hash every 5-token k-gram, then keep the MINIMUM
    hash of each sliding 4-gram window. Guarantees: any shared run of
    ≥ 8 tokens between two documents shares at least one fingerprint
    (detection floor), while storage is ~2/(w+1) of all k-gram hashes —
    the position-robust middle ground between x4's whole-doc fingerprint
    (breaks on one edit) and x32's fixed 12-token segments (break on
    alignment shifts). Output per document: k-gram count, distinct
    fingerprints kept, density, and how many of its fingerprints appear
    in ≥ 2 documents (the cross-doc overlap signal a plagiarism/near-dup
    triage ranks by).

    Portability: the k-gram hash is md5 over the joined tokens (hex
    strings order identically everywhere); window-min over strings and
    integer-division density are engine-agnostic, so the DuckDB oracle
    replays bit-for-bit.

    Scale shape: k-gram hashing is one posexplode over token positions
    (whole-stage codegen — no interpreted higher-order lambdas in the
    hot path); the window min is partitioned BY DOCUMENT and ordered by
    position, so its state is one doc's grams (never a corpus sort); the
    only corpus-wide shuffles are the distinct-fingerprint reduce and the
    document-frequency groupBy — both on fingerprint keys, both
    map-side-combinable. At 100 TB the fingerprint store is ~0.4 of the
    k-gram count and joins back by key; nothing is all-pairs."""
    K, W = 5, 4
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    sized = (
        _t(spark, sf, "documents")
        .select("doc_id", toks.alias("toks"))
        .withColumn("n_toks", F.size("toks"))
        .filter(F.col("n_toks") >= K)
        .withColumn("n_grams", F.col("n_toks") - (K - 1))
    )
    grams = (
        sized.select(
            "doc_id",
            "n_grams",
            "toks",
            F.explode(F.sequence(F.lit(1), F.col("n_grams"))).alias("p"),
        )
        .select(
            "doc_id",
            "n_grams",
            "p",
            F.md5(F.array_join(F.slice(F.col("toks"), F.col("p"), K), " "))
            .alias("h"),
        )
    )
    wmin = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, W - 1)
    fps = (
        grams.withColumn("fp", F.min("h").over(wmin))
        .filter(F.col("p") <= F.col("n_grams") - (W - 1))
        .select("doc_id", "n_grams", "fp")
        .distinct()
    )
    df_tbl = fps.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        fps.join(df_tbl, "fp")
        .groupBy("doc_id")
        .agg(
            F.first("n_grams").cast("long").alias("n_kgrams"),
            F.count("*").cast("long").alias("n_fps"),
            F.round(F.count("*") / F.first("n_grams"), 6).alias("fp_density"),
            F.sum((F.col("df") >= 2).cast("int")).cast("long")
            .alias("n_shared_fps"),
        )
    )


@query(
    "x49_lexical_diversity",
    f"""
    WITH norm AS (
      SELECT doc_id, {_NORM_SQL} AS nt FROM documents
      WHERE length(trim(text)) > 0
    ), tok AS (
      SELECT doc_id, u.t AS token
      FROM norm, unnest(string_split(nt, ' ')) u(t)
    ), tc AS (
      SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(count(*) / sum(c), 6) AS ttr,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / sum(c), 6)
             AS hapax_ratio
    FROM tc GROUP BY doc_id
    """,
)
def x49_lexical_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical diversity per document: type-token ratio and hapax-legomenon
    ratio — the vocabulary-richness pair quality pipelines use beside
    x10's repetition signal (low TTR = template/keyword-stuffed text even
    when no single n-gram repeats enough for x10 to fire; high hapax on a
    long doc = noisy OCR/gibberish). Both are emitted as scores, not
    thresholded flags (knife-edge rule).

    Determinism: token counts are exact integers; ttr/hapax_ratio are one
    bigint division each (identical IEEE doubles both engines);
    round(·, 6) absorbs dust.

    Scale shape: one explode + one (doc_id, token) groupBy + one doc_id
    groupBy — both shuffles are map-side combinable and keyed by
    document (the second is a prefix of the first's key, so AQE can
    often pipeline them). No corpus-wide vocabulary table is built:
    hapax status is per-document, unlike x25's global vocab growth."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    toks = (
        _t(spark, sf, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", F.explode(F.split(norm, " ")).alias("token"))
    )
    tc = toks.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    return tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_distinct"),
        F.sum((F.col("c") == 1).cast("int")).cast("long").alias("n_hapax"),
        F.round(F.count("*") / F.sum("c"), 6).alias("ttr"),
        F.round(F.sum((F.col("c") == 1).cast("int")) / F.sum("c"), 6)
        .alias("hapax_ratio"),
    )
