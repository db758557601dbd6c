"""Registry family module (split from the original queries.py).

See ``queries/_registry.py`` for the ``@query`` decorator and the
registry/oracle accessors; importing this module registers its queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import Window


from pyspark.sql import functions as F


from ..core.checkpoint import reliable_checkpoint
from ._registry import _t, query


from ._shared import _BANDS_SQL, _HEXMAP, _MINHASH_AGGS_SQL, _NORM_SQL


@query(
    "x1_token_count",
    """
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
           n_chars
    FROM documents
    """,
)
def x1_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace token counting (the budget-accounting primitive)."""
    from ..operators.textan import token_count

    return _t(spark, sf, "documents").select(
        "doc_id", token_count().alias("n_tokens"), "n_chars"
    )


_LANGS_SQL = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "for", "with", "on"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "pour", "une", "dans"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
}


def _lang_score_sql(lang: str) -> str:
    words = _LANGS_SQL[lang]
    hits = " + ".join(
        f"CAST(list_contains(toks, '{w}') AS INT)" for w in words
    )
    return f"({hits}) AS score_{lang}"


@query(
    "x2_language_id",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), scores AS (
      SELECT doc_id,
             {_lang_score_sql('de')},
             {_lang_score_sql('en')},
             {_lang_score_sql('es')},
             {_lang_score_sql('fr')}
      FROM norm
    )
    SELECT doc_id, score_de, score_en, score_es, score_fr,
           CASE
             WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
             WHEN score_en > score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
             WHEN score_es > score_de AND score_es > score_en AND score_es >= score_fr THEN 'es'
             ELSE 'fr'
           END AS predicted_lang
    FROM scores
    """,
)
def x2_language_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-hit language ID with deterministic argmax tiebreak."""
    from ..operators.textan import language_scores

    out = language_scores(_t(spark, sf, "documents"))
    return out.select(
        "doc_id", "score_de", "score_en", "score_es", "score_fr", "predicted_lang"
    )


@query(
    "x3_quality_features",
    f"""
    WITH base AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
             string_split({_NORM_SQL}, ' ') AS toks,
             length(regexp_replace({_NORM_SQL}, ' ', '', 'g')) AS n_nonspace
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens, n_punct, n_digits,
           ({" + ".join(f"CAST(list_contains(toks, '{w}') AS INT)" for w in _LANGS_SQL['en'])}) AS n_stopwords,
           round(CASE WHEN n_tokens > 0 THEN CAST(n_nonspace AS DOUBLE) / n_tokens ELSE 0.0 END, 4) AS avg_token_len,
           round(CASE WHEN n_tokens > 0 THEN CAST(({" + ".join(f"CAST(list_contains(toks, '{w}') AS INT)" for w in _LANGS_SQL['en'])}) AS DOUBLE) / n_tokens ELSE 0.0 END, 4) AS stopword_ratio,
           round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 4) AS punct_ratio
    FROM base
    """,
)
def x3_quality_features(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic quality features (length/punct/stopword/token stats)."""
    from ..operators.textan import quality_features

    return quality_features(_t(spark, sf, "documents"))


@query(
    "x7_quality_filter",
    f"""
    WITH base AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
             length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
             string_split({_NORM_SQL}, ' ') AS toks
      FROM documents
    ), rated AS (
      SELECT doc_id, n_tokens,
             round(CASE WHEN n_tokens > 0 THEN CAST(({" + ".join(f"CAST(list_contains(toks, '{w}') AS INT)" for w in _LANGS_SQL['en'])}) AS DOUBLE) / n_tokens ELSE 0.0 END, 4) AS stopword_ratio,
             round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 4) AS punct_ratio
      FROM base
    ), tagged AS (
      SELECT d.source,
             CASE WHEN r.n_tokens < 10 THEN 'too_short'
                  WHEN r.n_tokens > 5000 THEN 'too_long'
                  WHEN r.stopword_ratio < 0.05 THEN 'low_stopword'
                  WHEN r.punct_ratio > 0.2 THEN 'high_punct'
                  ELSE 'kept' END AS reason
      FROM rated r JOIN documents d USING (doc_id)
    )
    SELECT source, reason, count(*) AS n_docs FROM tagged GROUP BY 1, 2
    """,
)
def x7_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality FILTER — the decision layer over x3's features:
    token-count bounds, stopword floor, punctuation ceiling, with the first
    failing rule as the reject reason (kept otherwise), rolled up per
    source. This is the shape of a production corpus-filtering pass: every
    document gets exactly one disposition, and the per-source reason
    breakdown is the monitoring surface."""
    from ..operators.textan import quality_features

    docs = _t(spark, sf, "documents")
    q = quality_features(docs).join(docs.select("doc_id", "source"), "doc_id")
    reason = (
        F.when(F.col("n_tokens") < 10, "too_short")
        .when(F.col("n_tokens") > 5000, "too_long")
        .when(F.col("stopword_ratio") < 0.05, "low_stopword")
        .when(F.col("punct_ratio") > 0.2, "high_punct")
        .otherwise("kept")
    )
    return (
        q.select("source", reason.alias("reason"))
        .groupBy("source", "reason")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "x8_pii_scrub",
    r"""
    WITH corpus AS (
      SELECT doc_id, source,
             CASE WHEN doc_id < 15
               THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                           '@example.com or 10.0.0.', CAST(doc_id AS VARCHAR))
               ELSE text END AS text
      FROM documents
    ), scanned AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
             len(regexp_extract_all(text,
                 '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS n_ips,
             md5(regexp_replace(regexp_replace(text,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g')) AS fp
      FROM corpus
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_emails) AS BIGINT) AS total_emails,
           CAST(sum(n_ips) AS BIGINT) AS total_ips,
           CAST(sum(CASE WHEN n_emails + n_ips > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           count(DISTINCT fp) AS distinct_redacted
    FROM scanned GROUP BY 1
    """,
)
def x8_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII detection + redaction — the data-governance pass of a training
    pipeline: count email/IP patterns per document, redact them to stable
    tokens, and fingerprint the REDACTED text (so dedup keys can't differ
    only by contact details). Planted PII (doc_id < 15) guarantees the
    detectors demonstrably fire. Pure Catalyst regex — no UDF; one
    projection + one agg shuffle."""
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    ip_re = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
    docs = _t(spark, sf, "documents")
    text = F.when(
        F.col("doc_id") < 15,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0.0."),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(text, email_re, "<EMAIL>"), ip_re, "<IP>"
    )
    scanned = docs.select(
        "source",
        F.size(F.regexp_extract_all(text, F.lit(email_re), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(ip_re), F.lit(0))).alias("n_ips"),
        F.md5(redacted).alias("fp"),
    )
    return scanned.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_ips").alias("total_ips"),
        F.sum(
            F.when(F.col("n_emails") + F.col("n_ips") > 0, 1).otherwise(0)
        ).alias("docs_with_pii"),
        F.countDistinct("fp").alias("distinct_redacted"),
    )


@query(
    "x4_doc_fingerprint",
    f"""
    SELECT doc_id,
           md5({_NORM_SQL}) AS fingerprint,
           substr(md5({_NORM_SQL}), 1, 4) AS fp_bucket
    FROM documents
    """,
)
def x4_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Engine-portable content fingerprint + coarse bucket."""
    from ..operators.textan import fingerprint

    return fingerprint(_t(spark, sf, "documents"))


@query(
    "x5_bpe_token_count",
    """
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS n_pieces
    FROM documents
    """,
)
def x5_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-flavored token estimate (letter runs + digits + punctuation) —
    the cheap deterministic proxy for tokenizer cost in data budgeting."""
    from ..operators.textan import bpe_ish_token_count

    return _t(spark, sf, "documents").select(
        "doc_id", bpe_ish_token_count().alias("n_pieces")
    )


@query(
    "x6_train_split",
    """
    WITH tagged AS (
      SELECT source, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT source, split, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM tagged GROUP BY 1, 2
    """,
)
def x6_train_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (~80/10/10) with
    per-(source, split) counts — the reproducible data-splitting step of a
    training pipeline. md5-prefix banding is engine-portable, stable under
    reshuffles/re-runs, and needs no RNG state; lexicographic comparison on
    fixed-width lowercase hex equals numeric comparison, so both engines
    band identically. Map-side projection + one agg shuffle; no sampling
    pass over the data."""
    docs = _t(spark, sf, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    )
    return (
        docs.select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@query(
    "x9_decontamination",
    f"""
    WITH bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 29 = 0
    ), corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 29 <> 0
    ), bnorm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM bench
    ), cnorm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), bsh AS (
      SELECT DISTINCT
             concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]) AS shingle
      FROM bnorm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 4, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])) > 0
    ), csh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]) AS shingle
      FROM cnorm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 4, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])) > 0
    ), sizes AS (
      SELECT doc_id, count(*) AS n_ngrams FROM csh GROUP BY 1
    ), hits AS (
      SELECT c.doc_id, count(*) AS n_hit
      FROM csh c WHERE c.shingle IN (SELECT shingle FROM bsh)
      GROUP BY 1
    )
    SELECT h.doc_id, h.n_hit, s.n_ngrams,
           round(CAST(h.n_hit AS DOUBLE) / s.n_ngrams, 6) AS contamination
    FROM hits h JOIN sizes s USING (doc_id)
    WHERE CAST(h.n_hit AS DOUBLE) / s.n_ngrams >= 0.05
    """,
)
def x9_decontamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing word 5-grams with a
    held-out benchmark set (docs with doc_id % 29 == 0 stand in for the eval
    suite). The benchmark n-gram set broadcasts into a left-semi probe of
    the single corpus n-gram stream — exact-dup docs of a benchmark doc
    surface at contamination 1.0, partial leaks above the 5% floor."""
    from ..operators.dedup import benchmark_contamination

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 29 == 0)
    corpus = docs.filter(F.col("doc_id") % 29 != 0)
    return benchmark_contamination(corpus, bench, n=5, threshold=0.05)


@query(
    "x10_repetition",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), g AS (
      SELECT doc_id, concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS g
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    )
    SELECT doc_id, count(*) AS n_ngrams, count(DISTINCT g) AS n_distinct,
           round(CAST(count(*) - count(DISTINCT g) AS DOUBLE) / count(*), 6)
             AS dup_ngram_ratio
    FROM g GROUP BY 1
    """,
)
def x10_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Within-doc repeated-3-gram fraction (Gopher-style boilerplate
    signal). The Spark side is pure map-side array math — no explode, no
    shuffle — while the oracle replays it the expensive way (unnest +
    group), which is exactly why the plans differ but the numbers must
    not.

    The zero-gram exclusion is applied as ``length(trim(text)) > 0`` on the
    RAW column (equivalent: a doc has ≥1 n-gram iff its trimmed text is
    non-empty) — filtering on the computed ``n_ngrams`` would get predicate-
    pushed below the projection and re-evaluate the interpreted gram build
    per row (measured 3.5 s vs 0.2 s at sf0.1)."""
    from ..operators.textan import repetition_features

    docs = _t(spark, sf, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    return repetition_features(docs, n=3)


@query(
    "x11_tfidf_top_terms",
    f"""
    WITH p AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS token
      FROM documents
    ), p2 AS (
      SELECT doc_id, token FROM p WHERE token <> ''
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM p2 GROUP BY 1, 2
    ), df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM p2 GROUP BY 1
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (token), n
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rank
      FROM scored
    )
    SELECT doc_id, rank, token, tf, df, score FROM ranked WHERE rank <= 3
    """,
)
def x11_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 characteristic terms per doc by tf × (N/df) — linear-idf
    tf-idf, chosen so every score is exact IEEE arithmetic (integer
    product, one division; no transcendentals to drift between engines).
    Corpus size N folds in as a 1-row broadcast, never a collect."""
    from ..operators.textan import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf, "documents"), k=3)


@query(
    "x12_stratified_sample",
    """
    WITH ranked AS (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source, lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY source, lang) AS n
      FROM documents
    )
    SELECT doc_id, source, lang, rn AS sample_rank
    FROM ranked WHERE rn <= (n * 1 + 5 - 1) // 5
    """,
)
def x12_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 20% stratified sample per (source, lang): md5-ranked
    rows with an exact integer quota — layout- and seed-independent, so the
    same rows are picked on any cluster at any partitioning (unlike
    ``df.sample``). One shuffle on the stratum key."""
    from ..operators.sampling import stratified_sample

    docs = _t(spark, sf, "documents").select("doc_id", "source", "lang")
    return stratified_sample(docs, ["source", "lang"], num=1, den=5)


@query(
    "x13_mixture_plan",
    """
    WITH tok AS (
      SELECT source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok
      FROM documents
    ), per_src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(round(sqrt(sum(n_tok)), 6) AS DECIMAL(18,6)) AS w
      FROM tok GROUP BY 1
    ), tot AS (SELECT sum(w) AS w_total FROM per_src)
    SELECT source, n_docs, n_tokens,
           round(CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE), 6) AS weight,
           round(1000000.0 * (CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE))
                 / n_tokens, 6) AS epochs
    FROM per_src, tot
    """,
)
def x13_mixture_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-weighted data-mixture plan: per-source sampling epochs
    for a 1M-token budget with weight ∝ sqrt(tokens) (t=2 temperature —
    flattens the source skew a proportional mix would have). Exact integer
    token sums + correctly-rounded sqrt + decimal-exact total keep the plan
    bit-identical across engines; the grand total folds in as a 1-row
    broadcast."""
    from ..operators.sampling import mixture_plan
    from ..operators.textan import token_count

    docs = _t(spark, sf, "documents")
    return mixture_plan(docs, token_count(), budget_tokens=1_000_000)


@query(
    "x14_length_outliers",
    """
    WITH pr AS (
      SELECT doc_id, source, n_chars,
             percent_rank() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id) AS p
      FROM documents
    )
    SELECT doc_id, source, n_chars, round(p, 6) AS pct_rank,
           CASE WHEN p <= 0.05 THEN 'short' ELSE 'long' END AS tag
    FROM pr WHERE p <= 0.05 OR p >= 0.95
    """,
)
def x14_length_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source length-outlier detection via rank-based percentiles —
    the distribution-trimming pass of a curation pipeline. ``percent_rank``
    is pure integer arithmetic ((rank−1)/(n−1)), so unlike value-
    interpolating quantiles it is bit-deterministic across engines; the
    (n_chars, doc_id) order makes tie handling total. One shuffle on
    source."""
    docs = _t(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    pr = docs.select(
        "doc_id", "source", "n_chars", F.percent_rank().over(w).alias("p")
    )
    return (
        pr.filter((F.col("p") <= 0.05) | (F.col("p") >= 0.95))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round("p", 6).alias("pct_rank"),
            F.when(F.col("p") <= 0.05, F.lit("short"))
            .otherwise(F.lit("long"))
            .alias("tag"),
        )
    )


@query(
    "x21_doc_chunking",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), st AS (
      SELECT doc_id, toks, u.s
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1), 24)) u(s)
    ), ch AS (
      SELECT doc_id, CAST((s - 1) / 24 AS INT) AS chunk_id,
             list_slice(toks, s, least(s + 31, len(toks))) AS sl
      FROM st
    )
    SELECT doc_id, chunk_id,
           CAST(len(sl) AS INT) AS n_tokens,
           md5(array_to_string(sl, ' ')) AS chunk_hash
    FROM ch WHERE length(array_to_string(sl, ' ')) > 0
    """,
)
def x21_doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window document chunking (size 32, stride 24 → 8-token
    overlap) — the retrieval/packing prep every RAG or long-context
    pipeline runs before embedding. Entirely map-side array math: one
    ``sequence`` of chunk starts per doc, ``transform``+``slice`` to cut
    windows, one explode — no shuffle at all, so it streams at scan speed
    over 100 TB. The content hash pins every chunk's exact text under the
    value gate without shipping raw text."""
    from ..operators.dedup import normalized_text

    C, S = 32, 24
    docs = _t(spark, sf, "documents")
    toks = F.split(normalized_text("text"), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(S))
    chunk = F.explode(starts).alias("s")
    out = docs.select("doc_id", toks.alias("_toks"), chunk).select(
        "doc_id",
        (((F.col("s") - 1) / S).cast("int")).alias("chunk_id"),
        F.slice("_toks", F.col("s"), F.lit(C)).alias("_sl"),
    )
    txt = F.concat_ws(" ", F.col("_sl"))
    return (
        out.filter(F.length(txt) > 0)
        .select(
            "doc_id",
            "chunk_id",
            F.size("_sl").alias("n_tokens"),
            F.md5(txt).alias("chunk_hash"),
        )
    )


@query(
    "x23_containment_neardup",
    f"""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 80
    ), basenorm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM base
    ), corpus AS (
      SELECT doc_id, toks FROM basenorm
      UNION ALL
      -- planted fragments: the first half of every 4th doc — contained in
      -- the original (containment ≈ 1) but Jaccard-low vs a long doc
      SELECT doc_id + 200000 AS doc_id,
             list_slice(toks, 1, greatest(len(toks) // 2, 4)) AS toks
      FROM basenorm WHERE doc_id % 4 = 0
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM corpus, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
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
    )
    SELECT doc_a, doc_b, n_inter, sa.n AS n_a, sb.n AS n_b,
           round(CAST(n_inter AS DOUBLE) / sa.n, 6) AS containment_a,
           round(CAST(n_inter AS DOUBLE) / sb.n, 6) AS containment_b
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE greatest(CAST(n_inter AS DOUBLE) / sa.n,
                   CAST(n_inter AS DOUBLE) / sb.n) >= 0.5
    """,
)
def x23_containment_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment dedup (|A∩B|/|A|): catches sub-document
    duplication — excerpts, quotes, boilerplate fragments — that symmetric
    Jaccard misses (a half-doc fragment has Jaccard ≈ 0.5 vs its source but
    containment ≈ 1.0). Planted fragments (first half of every 4th doc)
    guarantee visible recall. Posting-list join with the df cap — same
    sub-quadratic shape as d3."""
    from ..operators.dedup import containment_pairs, normalized_text, shingles

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 80)
    toks = F.split(normalized_text("text"), " ")
    half = F.slice(toks, 1, F.greatest((F.size(toks) / 2).cast("int"), F.lit(4)))
    corpus = docs.select("doc_id", F.col("text")).unionByName(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat_ws(" ", half).alias("text"),
        )
    )
    # materialized once (optimization round 12): containment_pairs scans
    # its token input 4-5x (df cap, semi filter, sizes, both join sides)
    # and each scan re-ran the scan→shingle→DISTINCT lineage
    sh = reliable_checkpoint(shingles(corpus, n=3))
    return containment_pairs(sh, threshold=0.5, token_col="shingle")


@query(
    "x22_token_entropy",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), tok AS (
      SELECT doc_id, t.tok FROM norm, unnest(toks) t(tok) WHERE t.tok <> ''
    ), counts AS (
      SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
    FROM counts GROUP BY doc_id
    """,
)
def x22_token_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Token-distribution Shannon entropy per document — the repetition/
    boilerplate quality signal (template docs score low, natural prose
    high). Computed as ln(n) − Σc·ln(c)/n so the only shuffle is the
    (doc_id, token) count (combiner-friendly) plus the per-doc fold; the
    algebra keeps one log per DISTINCT token instead of per occurrence.
    Rounded to 6 dp to absorb float-summation order across engines."""
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
        ).alias("entropy"),
    )


@query(
    "x15_corpus_diff",
    f"""
    WITH v1 AS (
      SELECT doc_id, md5({_NORM_SQL}) AS h FROM documents
    ), v2 AS (
      -- next corpus version: 10 docs mutated, 5 dropped, 5 added
      SELECT doc_id, md5(regexp_replace(lower(trim(
               CASE WHEN doc_id % 50 = 0 THEN concat(text, ' edit')
                    ELSE text END)), '\\s+', ' ', 'g')) AS h
      FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 500000 AS doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents WHERE doc_id < 5
    ), j AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             a.h AS h1, b.h AS h2
      FROM v1 a FULL OUTER JOIN v2 b USING (doc_id)
    )
    SELECT CASE WHEN h1 IS NULL THEN 'added'
                WHEN h2 IS NULL THEN 'removed'
                WHEN h1 <> h2 THEN 'changed'
                ELSE 'unchanged' END AS status,
           count(*) AS n_docs
    FROM j GROUP BY 1
    """,
)
def x15_corpus_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-version diff: classify every doc_id across two corpus
    snapshots as added / removed / changed / unchanged by comparing
    normalized content hashes through a full outer join — the incremental-
    ingest primitive that decides what a delta pipeline must reprocess.
    Only 32-byte hashes shuffle, never text; the v2 snapshot is
    synthesized deterministically (mutate every 50th doc, drop every
    97th, add 5)."""
    from ..operators.dedup import content_hash

    docs = _t(spark, sf, "documents")
    v1 = docs.select("doc_id", content_hash("text").alias("h1"))
    mutated = F.when(
        F.col("doc_id") % 50 == 0, F.concat(F.col("text"), F.lit(" edit"))
    ).otherwise(F.col("text"))
    v2 = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", mutated.alias("text"))
        .select("doc_id", content_hash("text").alias("h2"))
        .unionByName(
            docs.filter(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                F.md5(F.col("doc_id").cast("string")).alias("h2"),
            )
        )
    )
    j = v1.join(v2, "doc_id", "full_outer")
    status = (
        F.when(F.col("h1").isNull(), "added")
        .when(F.col("h2").isNull(), "removed")
        .when(F.col("h1") != F.col("h2"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(status.alias("status")).agg(F.count("*").alias("n_docs"))


@query(
    "x17_inverted_index",
    f"""
    WITH pairs AS (
      SELECT DISTINCT doc_id, tok AS token
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    )
    SELECT token, count(*) AS df,
           array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',')
             AS postings_head
    FROM pairs GROUP BY token HAVING count(*) >= 3
    """,
)
def x17_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index build: token → document frequency + the head of its
    sorted posting list — the persisted structure behind corpus search and
    the posting-join dedup family. Postings are SORTED then TRUNCATED to a
    bounded head (collect_list order is partition-dependent; sort_array
    restores determinism, and the cap bounds hot-token rows — a full
    posting list for a stopword would be corpus-sized). One shuffle on
    token with map-side combine; hapax tokens (df < 3) are dropped."""
    from ..operators.dedup import tokens

    pairs = tokens(_t(spark, sf, "documents"))
    return (
        pairs.groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10), ","
            ).alias("postings_head"),
        )
        .filter(F.col("df") >= 3)
    )


@query(
    "x18_keyword_search",
    f"""
    WITH pairs AS (
      SELECT doc_id, tok AS token, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
      GROUP BY 1, 2
    ), a AS (SELECT doc_id, tf FROM pairs WHERE token = 'table'),
    b AS (SELECT doc_id, tf FROM pairs WHERE token = 'query')
    SELECT a.doc_id, a.tf + b.tf AS score
    FROM a JOIN b USING (doc_id)
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def x18_keyword_search(spark: SparkSession, sf: str) -> DataFrame:
    """Conjunctive keyword search over the posting lists: docs containing
    BOTH query terms ('table' AND 'query'), ranked by combined term frequency with a total
    tiebreak. The per-term posting sets come from one tokenize pass; the
    AND is an equi join of two tiny term slices (at scale: index lookups,
    never a corpus scan); top-k via TakeOrderedAndProject."""
    docs = _t(spark, sf, "documents")
    from ..operators.dedup import normalized_text

    pairs = (
        docs.select(
            "doc_id",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    a = pairs.filter(F.col("token") == "table").select("doc_id", F.col("tf").alias("tf_a"))
    b = pairs.filter(F.col("token") == "query").select("doc_id", F.col("tf").alias("tf_b"))
    return (
        a.join(b, "doc_id")
        .select("doc_id", (F.col("tf_a") + F.col("tf_b")).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "x19_sequence_packing",
    """
    WITH tok AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
      FROM documents
    ), laid AS (
      SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM tok
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor(cum_before / 512) AS BIGINT) AS seq_id,
           CAST(cum_before % 512 AS BIGINT) AS offset
    FROM laid
    """,
)
def x19_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-then-chunk sequence packing: each doc assigned to the
    512-token training sequence where it starts, per source, in an
    md5-deterministic layout order. Pure integer window math — the doc→
    sequence map a dataloader needs, computed without materializing any
    token stream."""
    from ..operators.sampling import pack_sequences
    from ..operators.textan import token_count

    docs = _t(spark, sf, "documents")
    return pack_sequences(docs, token_count(), context_len=512)


@query(
    "x20_source_vocab_overlap",
    f"""
    WITH toks AS (
      SELECT DISTINCT source, tok AS token
      FROM (SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ), sizes AS (
      SELECT source, count(*) AS n FROM toks GROUP BY 1
    ), tokf AS (
      -- source-df cap (max_source_df=256): tokens shared by more sources
      -- than that contribute df² posting pairs; a no-op on this corpus
      -- (handful of sources) but part of the operator contract
      SELECT t.source, t.token FROM toks t
      JOIN (SELECT token FROM toks GROUP BY token HAVING count(*) <= 256) f
        USING (token)
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
      FROM tokf a JOIN tokf b
        ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_inter, sa.n AS n_a, sb.n AS n_b,
           round(CAST(i.n_inter AS DOUBLE)
                 / (sa.n + sb.n - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
)
def x20_source_vocab_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-overlap matrix between sources (Jaccard of distinct
    token sets) — the corpus-composition diagnostic behind mixing
    decisions: near-identical vocabularies suggest redundant sources. The
    pair space is |sources|², tiny by construction (sources are a
    metadata-scale dimension), while the token posting join carries only
    (source, token) distinct pairs — never documents."""
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    toks = (
        docs.select(
            "source",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    sizes = toks.groupBy("source").agg(F.count("*").alias("n"))
    # source-df cap (same pattern as dedup.jaccard_pairs' max_token_df):
    # tokens live in ≤256 sources or drop out — bounds posting pairs at
    # df²≤65k per token on degenerate many-source corpora
    keep = (
        toks.groupBy("token")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= 256)
        .select("token")
    )
    tokf = toks.join(keep, "token")
    a = tokf.select(F.col("source").alias("source_a"), "token")
    b = tokf.select(F.col("source").alias("source_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a", "source_b", "n_inter", "n_a", "n_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


_DISCLAIMER = (
    "this document is provided as is without warranty of any kind"
)


@query(
    "x24_boilerplate_ngrams",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN concat('{_DISCLAIMER} ', text) ELSE text END AS text
      FROM documents
    ), norm AS (
      SELECT doc_id, string_split(
        regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
      FROM corpus
    ), sh AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 2, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1], toks[i+2])) > 0
    )
    SELECT shingle, CAST(count(*) AS BIGINT) AS n_docs
    FROM sh GROUP BY shingle HAVING count(*) >= 10
    ORDER BY n_docs DESC, shingle ASC LIMIT 20
    """,
)
def x24_boilerplate_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate mining: the most document-frequent word 3-grams across the
    corpus — the signal behind template/disclaimer stripping in pretraining
    pipelines (a shingle shared by thousands of documents is layout, not
    content). A fixed legal disclaimer is planted on every 7th document so
    recall is visible: its shingles must dominate the top-k.

    Scale shape: ``shingles`` emits distinct (doc, shingle) pairs, ONE
    groupBy(shingle) with partial-agg count, top-k via
    TakeOrderedAndProject — no joins at all, linear in corpus tokens."""
    from ..operators.dedup import shingles

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(_DISCLAIMER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sh = shingles(docs, n=3)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 10)
        .orderBy(F.desc("n_docs"), F.asc("shingle"))
        .limit(20)
    )


@query(
    "x25_vocab_growth",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, concat_ws(' ', toks[i], toks[i+1]) AS gram
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1))) t(i)
      WHERE i <= greatest(len(toks) - 1, 1)
        AND length(concat_ws(' ', toks[i], toks[i+1])) > 0
    ), first_seen AS (
      SELECT gram, CAST(floor(min(doc_id) / 100) AS INT) AS bucket
      FROM sh GROUP BY gram
    ), per_bucket AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS new_grams
      FROM first_seen GROUP BY bucket
    )
    SELECT bucket, new_grams,
           CAST(sum(new_grams) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_vocab
    FROM per_bucket
    """,
)
def x25_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve over ingestion order: per
    100-document bucket, how many bigrams appear for the FIRST time, plus
    the running vocabulary size. A flattening curve tells a data-collection
    pipeline that a source is exhausted (new data adds no new language).

    Scale shape: first-occurrence via ONE groupBy(gram) min — never a
    cumulative distinct (which Spark windows cannot express without a
    quadratic self-join); the cumulative sum runs over the bucket-count
    table, metadata-sized (≤ n_docs/100 rows) on a single partition."""
    from ..operators.dedup import shingles

    docs = _t(spark, sf, "documents")
    first_seen = (
        shingles(docs.select("doc_id", "text"), n=2)
        .withColumnRenamed("shingle", "gram")
        .groupBy("gram")
        .agg((F.min("doc_id") / 100).cast("int").alias("bucket"))
    )
    per_bucket = first_seen.groupBy("bucket").agg(
        F.count("*").alias("new_grams")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return per_bucket.select(
        "bucket",
        "new_grams",
        F.sum("new_grams").over(w).alias("cum_vocab"),
    )


@query(
    "x26_source_kl_drift",
    f"""
    WITH tok AS (
      SELECT source, t.tok AS token
      FROM (SELECT source, string_split({_NORM_SQL}, ' ') AS toks
            FROM documents) n, unnest(toks) t(tok)
      WHERE t.tok <> ''
    ), sc AS (
      SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
    ), stot AS (
      SELECT source, sum(c) AS n_s FROM sc GROUP BY source
    ), gtot AS (
      SELECT token, sum(c) AS g FROM sc GROUP BY token
    ), n AS (SELECT sum(c) AS total FROM sc)
    SELECT s.source, CAST(any_value(t.n_s) AS BIGINT) AS n_tokens,
           round(sum((s.c / t.n_s)
                     * ln((s.c / t.n_s) / (g.g / n.total))), 6) AS kl
    FROM sc s
    JOIN stot t USING (source)
    JOIN gtot g USING (token)
    CROSS JOIN n
    GROUP BY s.source
    """,
)
def x26_source_kl_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source distribution drift: KL(source unigram dist ‖ corpus
    unigram dist) — the mixture-monitoring statistic behind "did this crawl
    slice change register?" alerts in training-data pipelines. High KL =
    the source's language diverges from the corpus average.

    Scale shape: raw tokens collapse immediately to (source, token) counts
    (ONE shuffle, partial-agg combined); everything after runs on the
    vocabulary-sized count table — the global token totals and corpus total
    ride back in as broadcast joins, never a second pass over documents."""
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    tok = (
        docs.select(
            "source",
            F.explode(F.split(normalized_text("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    # materialized once (optimization round 12, guide §5): the count table
    # feeds FOUR consumers (per-source totals, global token totals, the
    # corpus total, and the scored join itself) and each re-executed the
    # corpus explode + groupBy; the table itself is vocabulary×sources
    # sized, not corpus sized
    sc = reliable_checkpoint(
        tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    )
    stot = sc.groupBy("source").agg(F.sum("c").alias("n_s"))
    gtot = sc.groupBy("token").agg(F.sum("c").alias("g"))
    n = sc.groupBy().agg(F.sum("c").alias("total"))
    p = F.col("c") / F.col("n_s")
    q = F.col("g") / F.col("total")
    return (
        sc.join(F.broadcast(stot), "source")
        .join(F.broadcast(gtot), "token")
        .crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(
            F.any_value("n_s").cast("bigint").alias("n_tokens"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl"),
        )
    )


_U32_SQL = " + ".join(
    f"(strpos({_HEXMAP}, substr(md5(token), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


@query(
    "x27_kmv_distinct_sketch",
    f"""
    WITH norm AS (
      SELECT source, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), tok AS (
      -- bigram vocabulary: large enough per source (~700) that the sketch
      -- regime (n > k) actually exercises, unlike the ~31-word unigram set
      SELECT DISTINCT source, concat_ws(' ', toks[i], toks[i+1]) AS token
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 1))) t(i)
      WHERE length(concat_ws(' ', toks[i], toks[i+1])) > 0
    ), u AS (
      SELECT source, token,
             ({_U32_SQL}) / 4294967296.0 AS u
      FROM tok
    ), ranked AS (
      SELECT source, u,
             row_number() OVER (PARTITION BY source ORDER BY u, token) AS rn,
             count(*) OVER (PARTITION BY source) AS n_exact
      FROM u
    )
    SELECT source,
           CAST(any_value(n_exact) AS BIGINT) AS n_exact,
           round(CASE WHEN any_value(n_exact) <= 64
                      THEN CAST(any_value(n_exact) AS DOUBLE)
                      ELSE 63.0 / max(CASE WHEN rn = 64 THEN u END) END,
                 6) AS est,
           round(abs(CASE WHEN any_value(n_exact) <= 64
                          THEN CAST(any_value(n_exact) AS DOUBLE)
                          ELSE 63.0 / max(CASE WHEN rn = 64 THEN u END) END
                     - any_value(n_exact)) / any_value(n_exact), 6) AS rel_err
    FROM ranked GROUP BY source
    """,
)
def x27_kmv_distinct_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=64, next to the
    exact count and its relative error — the ENGINE-PORTABLE cardinality
    sketch: HLL registers differ between Spark and DuckDB (and between
    Spark versions), but "the k-th smallest md5-derived uniform" is a pure
    function of the value set, so the sketch itself is oracle-checkable.
    Estimator: (k-1)/u_(k); exact regime below k values.

    Scale shape: per-key distinct once (shuffle on (source, token) with
    partial-agg dedup), then ONE window shuffle on source over the
    vocabulary-sized stream. At true scale the window becomes a
    bounded-heap aggregator (collect the k smallest per group); the
    estimator and its oracle are unchanged — that swap is plan-local."""
    from ..operators.dedup import shingles

    docs = _t(spark, sf, "documents")
    # bigram vocabulary per source — ``shingles`` keyed on source dedups
    # straight to the (source, gram) level
    tok = shingles(docs.select("source", "text"), n=2, id_col="source").select(
        F.col("doc_id").alias("source"), F.col("shingle").alias("token")
    )
    u = tok.select(
        "source",
        "token",
        (F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
         / F.lit(4294967296.0)).alias("u"),
    )
    w = Window.partitionBy("source").orderBy("u", "token")
    wc = Window.partitionBy("source")
    ranked = u.select(
        "source",
        "u",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_exact"),
    )
    est = F.when(
        F.any_value("n_exact") <= 64, F.any_value("n_exact").cast("double")
    ).otherwise(
        F.lit(63.0) / F.max(F.when(F.col("rn") == 64, F.col("u")))
    )
    return ranked.groupBy("source").agg(
        F.any_value("n_exact").cast("bigint").alias("n_exact"),
        F.round(est, 6).alias("est"),
        F.round(
            F.abs(est - F.any_value("n_exact")) / F.any_value("n_exact"), 6
        ).alias("rel_err"),
    )


@query(
    "x28_pmi_collocations",
    f"""
    WITH norm AS (
      SELECT string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), uni AS (
      SELECT t.tok AS w, count(*) AS c
      FROM norm, unnest(toks) t(tok) WHERE t.tok <> '' GROUP BY 1
    ), bi AS (
      SELECT toks[i] AS wa, toks[i+1] AS wb, count(*) AS c
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 1, 0))) t(i)
      WHERE toks[i] <> '' AND toks[i+1] <> ''
      GROUP BY 1, 2
    ), nu AS (SELECT sum(c) AS n FROM uni),
    nb AS (SELECT sum(c) AS n FROM bi)
    SELECT b.wa, b.wb, CAST(b.c AS BIGINT) AS n_pair,
           round(ln((CAST(b.c AS DOUBLE) / nb.n)
                    / ((CAST(ua.c AS DOUBLE) / nu.n)
                       * (CAST(ub.c AS DOUBLE) / nu.n))), 6) AS pmi
    FROM bi b
    JOIN uni ua ON ua.w = b.wa
    JOIN uni ub ON ub.w = b.wb
    CROSS JOIN nu CROSS JOIN nb
    WHERE b.c >= 5
    ORDER BY pmi DESC, b.wa ASC, b.wb ASC LIMIT 25
    """,
)
def x28_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation mining: top-25 adjacent-bigram PMI
    ``ln(p(ab) / (p(a)p(b)))`` with a count floor — the phrase-detection
    statistic (word2vec-phrases, boilerplate phrase discovery) behind
    "should these two tokens be one token?" decisions in tokenizer and
    corpus-prep pipelines.

    Scale shape: bigram and unigram COUNT tables collapse immediately from
    the token stream (one shuffle each, partial-agg combined); the PMI
    join runs on the vocabulary-sized count tables with the two corpus
    totals riding in as 1-row broadcasts; top-k via
    TakeOrderedAndProject. All probabilities are exact-integer-count
    ratios divided in a fixed order — no floating-point accumulation."""
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    toks = docs.select(F.split(normalized_text("text"), " ").alias("_t"))
    # NOTE (optimization round 12, negative result): checkpointing the
    # unigram/bigram count tables here measured 1.35x SLOWER at sf0.1
    # over 7 interleaved old/new session pairs — at bench scale the
    # re-executed explodes are cheaper than the materialization jobs.
    # Reverted (kept where it measured faster: x26, x36; d9/d15/x30).
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    positions = toks.select(
        "_t",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("_t") - 1, F.lit(0)))
        ).alias("_i"),
    ).filter(F.col("_i") >= 1)
    bi = (
        positions.select(
            F.try_element_at("_t", F.col("_i")).alias("wa"),
            F.try_element_at("_t", F.col("_i") + 1).alias("wb"),
        )
        .filter((F.col("wa") != "") & (F.col("wb") != ""))
        .groupBy("wa", "wb")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    nu = uni.groupBy().agg(F.sum("c").alias("n_uni"))
    nb_tot = (
        positions.select(
            F.try_element_at("_t", F.col("_i")).alias("wa"),
            F.try_element_at("_t", F.col("_i") + 1).alias("wb"),
        )
        .filter((F.col("wa") != "") & (F.col("wb") != ""))
        .groupBy()
        .agg(F.count("*").alias("n_bi"))
    )
    ua = uni.select(F.col("w").alias("wa"), F.col("c").alias("ca"))
    ub = uni.select(F.col("w").alias("wb"), F.col("c").alias("cb"))
    pmi = F.log(
        (F.col("n_pair").cast("double") / F.col("n_bi"))
        / (
            (F.col("ca").cast("double") / F.col("n_uni"))
            * (F.col("cb").cast("double") / F.col("n_uni"))
        )
    )
    return (
        bi.join(F.broadcast(ua), "wa")
        .join(F.broadcast(ub), "wb")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb_tot))
        .select(
            "wa", "wb", "n_pair", F.round(pmi, 6).alias("pmi")
        )
        .orderBy(F.desc("pmi"), F.asc("wa"), F.asc("wb"))
        .limit(25)
    )


@query(
    "x29_hybrid_rrf_retrieval",
    f"""
    WITH norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
    ), tok AS (
      SELECT DISTINCT doc_id, t.tok AS token
      FROM norm, unnest(toks) t(tok) WHERE t.tok <> ''
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
    ), qtok AS (SELECT doc_id AS query_id, token FROM tok WHERE doc_id < 3),
    inter AS (
      SELECT q.query_id, c.doc_id AS cand_id, count(*) AS n_inter
      FROM qtok q JOIN tok c ON c.token = q.token AND c.doc_id <> q.query_id
      GROUP BY 1, 2
    ), lex AS (
      SELECT query_id, cand_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(i.n_inter AS DOUBLE) / (sq.n + sc.n - i.n_inter)
                          DESC, cand_id ASC) AS lex_rank
      FROM inter i
      JOIN sizes sq ON sq.doc_id = i.query_id
      JOIN sizes sc ON sc.doc_id = i.cand_id
      QUALIFY lex_rank <= 10
    ), flat AS (
      SELECT vec_id, t.i, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)
    ), norms AS (
      SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id
    ), dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, sum(q.x * c.x) AS dot
      FROM flat q JOIN flat c ON c.i = q.i AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 3
      GROUP BY 1, 2
    ), vec AS (
      SELECT query_id, cand_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC, cand_id ASC)
               AS vec_rank
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.query_id
      JOIN norms nc ON nc.vec_id = d.cand_id
      QUALIFY vec_rank <= 10
    ), fused AS (
      SELECT coalesce(l.query_id, v.query_id) AS query_id,
             coalesce(l.cand_id, v.cand_id) AS doc_id,
             round(coalesce(1.0 / (60 + l.lex_rank), 0)
                   + coalesce(1.0 / (60 + v.vec_rank), 0), 6) AS rrf
      FROM lex l FULL OUTER JOIN vec v
        ON v.query_id = l.query_id AND v.cand_id = l.cand_id
    )
    SELECT query_id, doc_id, rank, rrf FROM (
      SELECT query_id, doc_id, rrf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf DESC, doc_id ASC) AS rank
      FROM fused) WHERE rank <= 5
    """,
)
def x29_hybrid_rrf_retrieval(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the modern RAG-stack
    default: a LEXICAL ranking (token-set Jaccard, the x18/d3 machinery)
    and a VECTOR ranking (exact cosine, the v1 machinery) fuse per query
    as Σ 1/(60+rank), so a document strong on either signal surfaces.
    RRF needs no score calibration between the two sides — exactly why
    production hybrid search uses it.

    Scale shape: each side is its own bounded top-k (broadcast 3-query
    side against posting lists / corpus scan); fusion joins two ≤k-row
    rankings per query — metadata-sized. Ranks carry total tiebreaks so
    the fused ordering is deterministic end-to-end."""
    from ..operators.dedup import tokens

    docs = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")

    # one materialized token table (optimization round 12, guide §5): the
    # scan→normalize→explode→DISTINCT lineage fed three consumers (sizes,
    # the broadcast query side, the intersection's corpus side) and
    # re-executed — including its shuffle — per consumer
    tok = reliable_checkpoint(tokens(docs))
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    qtok = tok.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    inter = (
        tok.join(F.broadcast(qtok), "token")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("cand_id"))
        .agg(F.count("*").alias("n_inter"))
    )
    sq = sizes.select(F.col("doc_id").alias("query_id"), F.col("n").alias("n_q"))
    sc = sizes.select(F.col("doc_id").alias("cand_id"), F.col("n").alias("n_c"))
    jac = F.col("n_inter") / (F.col("n_q") + F.col("n_c") - F.col("n_inter"))
    wl = Window.partitionBy("query_id").orderBy(F.desc(jac), F.asc("cand_id"))
    lex = (
        inter.join(F.broadcast(sq), "query_id")
        .join(sc, "cand_id")
        .withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= 10)
        .select("query_id", "cand_id", "lex_rank")
    )
    from ..operators.similarity import cosine_topk

    vec = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=10, dim=64).select(
        "query_id", F.col("neighbor_id").alias("cand_id"),
        F.col("rank").alias("vec_rank"),
    )
    fused = (
        lex.join(vec, ["query_id", "cand_id"], "full_outer")
        .select(
            "query_id",
            F.col("cand_id").alias("doc_id"),
            F.round(
                F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("vec_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "rank", "rrf")
    )


@query(
    "x30_lsh_recall_audit",
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
    pred AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
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
      WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.8
    ), joined AS (
      SELECT coalesce(p.doc_a, t.doc_a) AS doc_a,
             CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_pred,
             CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS in_truth
      FROM pred p FULL OUTER JOIN truth t
        ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
    )
    SELECT CAST(sum(in_pred * in_truth) AS BIGINT) AS tp,
           CAST(sum(in_pred * (1 - in_truth)) AS BIGINT) AS fp,
           CAST(sum((1 - in_pred) * in_truth) AS BIGINT) AS fn,
           round(CAST(sum(in_pred * in_truth) AS DOUBLE)
                 / greatest(sum(in_truth), 1), 6) AS recall
    FROM joined
    """.format(norm=_NORM_SQL, minhash=_MINHASH_AGGS_SQL, bands=_BANDS_SQL),
)
def x30_lsh_recall_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Set-level quality audit of the LSH candidate generator: confusion
    counts (tp/fp/fn) and recall of the banded-MinHash candidates against
    EXACT-Jaccard≥0.8 ground truth on the planted-duplicate corpus —
    the go/no-go measurement before trusting a banding config on a real
    corpus (d9 audits per-pair estimate error; this audits the RETRIEVAL
    of pairs). fn = near-dup pairs the sketch would MISS.

    Scale shape: ground truth is the posting-join Jaccard (bounded here by
    corpus construction; at scale one runs it on a sampled slice), the
    prediction side is the production LSH path, and the comparison is a
    full-outer join of two metadata-sized pair lists."""
    from ..operators.dedup import (
        lsh_candidate_pairs,
        jaccard_pairs,
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
    # Materialize the shared shingle/signature tables ONCE (optimization
    # round 12 — the d9 fix): unmaterialized, the scan→shingle→distinct
    # lineage re-executed ~6x (banded self-join 2x via sigs, posting-join
    # truth 3x). Both tables are bounded by the query's own doc_id<100
    # corpus cap.
    sh = reliable_checkpoint(shingles(corpus, n=3))
    pred = lsh_candidate_pairs(
        reliable_checkpoint(
            minhash_signatures(sh, num_hashes=16, token_col="shingle")
        ),
        bands=4,
        rows_per_band=4,
    ).withColumn("in_pred", F.lit(1))
    truth = (
        jaccard_pairs(sh, threshold=0.8, token_col="shingle", max_token_df=None)
        .select("doc_a", "doc_b")
        .withColumn("in_truth", F.lit(1))
    )
    joined = pred.join(truth, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("in_pred", F.lit(0)).alias("in_pred"),
        F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
    )
    return joined.groupBy().agg(
        F.sum(F.col("in_pred") * F.col("in_truth")).cast("bigint").alias("tp"),
        F.sum(F.col("in_pred") * (1 - F.col("in_truth"))).cast("bigint").alias("fp"),
        F.sum((1 - F.col("in_pred")) * F.col("in_truth")).cast("bigint").alias("fn"),
        F.round(
            F.sum(F.col("in_pred") * F.col("in_truth")).cast("double")
            / F.greatest(F.sum("in_truth"), F.lit(1)),
            6,
        ).alias("recall"),
    )


@query(
    "x31_bigram_perplexity",
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
    )
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
    """,
)
def x31_bigram_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document LM cross-entropy under a HELD-OUT bigram model with
    add-1 smoothing — the CCNet-style perplexity filter: the model trains
    on half the corpus (even doc ids, standing in for the trusted
    reference corpus), the other half is scored, so a scored document
    never smooths its own surprises away; high cross-entropy marks the
    garbled/off-domain candidates a curation pipeline cuts.

    Scale shape: the model is the (bigram, count) + (unigram, count)
    tables — vocabulary-sized, BROADCAST into the scored-doc bigram
    stream (LEFT joins: unseen bigrams fall to the +1 floor) — one corpus
    pass + one groupBy(doc_id); V rides in as a 1-row broadcast. In
    production the model tables are trained once and persisted (the KenLM
    role), leaving scoring as the only per-corpus cost.

    Calibration note (honest): the synthetic corpus is uniform-random
    text, so EVERY doc's bigram cross-entropy sits near ln V and the
    filter cannot separate garbled from normal here — measured: a planted
    gibberish doc scores 3.43 vs corpus avg 3.45. The statistic is
    value-exact (oracle) and discriminates on structured language, where
    real bigram probabilities are far from uniform."""
    from ..operators.dedup import normalized_text

    docs = _t(spark, sf, "documents")
    toks = docs.select("doc_id", F.split(normalized_text("text"), " ").alias("_t"))
    model_toks = toks.filter(F.col("doc_id") % 2 == 0)
    # NOTE (optimization round 12, negative result): checkpointing this
    # vocabulary-sized unigram table (it feeds 3 consumers that each
    # re-run the model-half explode) measured 1.12x SLOWER at sf0.1 over
    # 7 interleaved old/new session pairs — the materialization job costs
    # more than the saved re-executions at bench scale. Reverted; see
    # OPTIMIZATION_r12.md §7 (x26/x36, where the same fix measured
    # 0.84x/0.87x, keep it).
    uni = (
        model_toks.select(F.explode("_t").alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cu"))
    )
    vocab = uni.groupBy().agg(F.count("*").alias("v"))

    def bigrams(frame):
        pos = frame.select(
            "doc_id",
            "_t",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size("_t") - 1, F.lit(0)))
            ).alias("_i"),
        ).filter(F.col("_i") >= 1)
        return pos.select(
            "doc_id",
            F.try_element_at("_t", F.col("_i")).alias("wa"),
            F.try_element_at("_t", F.col("_i") + 1).alias("wb"),
        ).filter((F.col("wa") != "") & (F.col("wb") != ""))

    bi = bigrams(model_toks).groupBy("wa", "wb").agg(F.count("*").alias("cb"))
    scored = (
        bigrams(toks.filter(F.col("doc_id") % 2 == 1))
        .join(F.broadcast(bi), ["wa", "wb"], "left")
        .join(F.broadcast(uni.withColumnRenamed("w", "wa")), "wa", "left")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            -F.sum(
                F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + 1.0)
                    / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
                )
            )
            / F.count("*"),
            6,
        ).alias("cross_entropy"),
    )


@query(
    "x32_segment_dedup",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN concat('{_DISCLAIMER} {_DISCLAIMER} {_DISCLAIMER} ',
                              text)
                  ELSE text END AS text
      FROM documents
    ), norm AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
    ), st AS (
      SELECT doc_id, toks, u.s
      FROM norm, unnest(generate_series(1, greatest(len(toks), 1), 12)) u(s)
    ), seg AS (
      SELECT doc_id, CAST((s - 1) / 12 AS INT) AS seg_id,
             array_to_string(list_slice(toks, s, least(s + 11, len(toks))),
                             ' ') AS seg_txt,
             CAST(len(list_slice(toks, s, least(s + 11, len(toks))))
               AS INT) AS n_toks
      FROM st
    ), segf AS (
      SELECT * FROM seg WHERE length(seg_txt) > 0
    ), rep AS (
      SELECT seg_txt FROM (SELECT DISTINCT doc_id, seg_txt FROM segf)
      GROUP BY seg_txt HAVING count(*) >= 5
    ), marked AS (
      SELECT s.doc_id, s.seg_id, s.seg_txt, s.n_toks,
             r.seg_txt IS NOT NULL AS is_rep
      FROM segf s LEFT JOIN rep r USING (seg_txt)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN is_rep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(sum(CASE WHEN is_rep THEN 0 ELSE n_toks END) AS BIGINT)
             AS kept_tokens,
           md5(coalesce(
             string_agg(CASE WHEN is_rep THEN NULL ELSE seg_txt END, ' '
                        ORDER BY seg_id), '')) AS cleaned_hash
    FROM marked GROUP BY doc_id
    """,
)
def x32_segment_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Repeated-passage removal (RefinedWeb's exact line dedup, on 12-token
    segments since the synthetic corpus has no newlines): segments shared by
    >= 5 documents are boilerplate and get stripped; each document is
    rebuilt from its surviving segments in order. A tripled legal
    disclaimer (33 tokens -> two full shared segments) is planted on every
    7th document so the removal is visible; unique documents must pass
    through with cleaned_hash == hash of their normalized text.

    Scale shape (see ``operators/dedup.py:repeated_segment_removal``):
    map-side chunking, one partial-agg groupBy for document frequency, one
    equi join back (row-preserving), one per-doc agg with in-group ordered
    rebuild — no windows over the corpus, no driver loop."""
    from ..operators.dedup import repeated_segment_removal

    plant = F.lit(" ".join([_DISCLAIMER] * 3) + " ")
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(plant, F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = repeated_segment_removal(docs, seg_len=12, min_df=5)
    return out.select(
        "doc_id",
        "n_segments",
        "n_removed",
        "kept_tokens",
        F.md5("cleaned_text").alias("cleaned_hash"),
    )
