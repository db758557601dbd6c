"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All expressions are native Catalyst (regex/string built-ins) — no UDFs — so
they pipeline inside whole-stage codegen over a 100 TB documents scan. Each
operator keeps a deterministic, engine-portable formulation so the DuckDB
oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text

# tiny per-language stopword lists (heuristic n-gram/stopword language ID)
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "for", "with", "on"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr": ("le", "la", "et", "les", "des", "est", "pas", "pour", "une", "dans"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
}


def token_count(col: str = "text") -> Column:
    """Whitespace token count (0 for empty text)."""
    t = F.trim(F.col(col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(col: str = "text") -> Column:
    """BPE-flavored token estimate: word pieces + digits + punctuation runs.

    Splits on the boundaries a byte-pair tokenizer respects (letter runs,
    digit runs, single punctuation) — a cheap, deterministic proxy for
    tokenizer cost used in data-budget accounting."""
    pieces = F.regexp_extract_all(
        F.lower(F.col(col)), F.lit(r"[a-z]+|[0-9]|[^a-z0-9\s]"), 0
    )
    return F.size(pieces)


def stopword_hits(col: Column, lang: str) -> Column:
    toks = F.split(col, " ")
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, words))


def language_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc stopword-hit score per language + argmax prediction."""
    norm = normalized_text(text_col)
    out = docs.withColumn("_norm", norm)
    for lang in STOPWORDS:
        out = out.withColumn(f"score_{lang}", stopword_hits(F.col("_norm"), lang))
    # argmax with deterministic tiebreak on language code order
    best = None
    for lang in sorted(STOPWORDS):
        cond = None
        for other in sorted(STOPWORDS):
            if other == lang:
                continue
            c = (
                F.col(f"score_{lang}") > F.col(f"score_{other}")
                if other < lang
                else F.col(f"score_{lang}") >= F.col(f"score_{other}")
            )
            cond = c if cond is None else (cond & c)
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return out.withColumn("predicted_lang", best).drop("_norm")


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality features: length, token stats, punctuation and
    stopword ratios, plus a composite quality score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    n_digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    norm = normalized_text(text_col)
    n_stop = stopword_hits(norm, "en")
    avg_token_len = F.when(n_tokens > 0, (F.length(F.regexp_replace(norm, " ", "")) / n_tokens)).otherwise(
        F.lit(0.0)
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_digits.alias("n_digits"),
        n_stop.alias("n_stopwords"),
        F.round(avg_token_len, 4).alias("avg_token_len"),
        F.round(
            F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)), 4
        ).alias("punct_ratio"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of normalized text + a coarse 16-hex prefix
    bucket (rolling-hash stand-in that is engine-portable and join-friendly)."""
    fp = F.md5(normalized_text(text_col))
    return docs.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 4).alias("fp_bucket"),
    )
