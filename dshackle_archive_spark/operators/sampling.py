"""Deterministic sampling and data-mixture planning for training pipelines.

Random sampling is useless in a correctness-gated pipeline (irreproducible)
and ``df.sample`` is seed-per-partition (layout-dependent). Both operators
here are pure functions of the data:

- ``stratified_sample`` ranks each stratum by ``md5(id)`` — an
  order-invariant, layout-invariant pseudo-random permutation — and keeps an
  exact integer quota per stratum. Re-running on re-partitioned data picks
  the SAME rows.
- ``mixture_plan`` turns per-source token counts into temperature-weighted
  sampling epochs (w ∝ tokens^0.5, the standard t=2 temperature mix):
  every arithmetic step is either exact integer math, a correctly-rounded
  ``sqrt``, or a decimal-exact sum, so the plan is bit-identical across
  engines and runs.

Scale: one shuffle each (the stratum window / the per-source agg); nothing
touches raw text, and quotas are integer math — no driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    num: int,
    den: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ceil(n_stratum · num/den) rows per stratum, chosen by md5-rank.

    The quota is exact integer math (``(n·num + den − 1) div den``) — no
    float fraction, so engines can't disagree at quota boundaries. Rank ties
    are impossible (md5 of distinct ids) but ``id_col`` tiebreaks anyway.
    """
    hash_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(hash_key, F.col(id_col))
    cnt = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(cnt))
        .filter(
            F.col("_rn")
            <= F.floor((F.col("_n") * num + den - 1) / den).cast("long")
        )
        .withColumn("sample_rank", F.col("_rn"))
        .drop("_rn", "_n")
    )


def mixture_plan(
    docs: DataFrame,
    token_count_col,
    budget_tokens: int,
    source_col: str = "source",
) -> DataFrame:
    """Per-source sampling plan: weight ∝ sqrt(tokens), epochs scaled to a
    token budget.

    Output: ``(source, n_docs, n_tokens, weight, epochs)`` where ``weight``
    is the source's share of the mixture and ``epochs`` how many passes over
    the source the budget implies (>1 = upsample, <1 = subsample).

    Determinism: token sums are exact integers; ``sqrt`` is correctly
    rounded by IEEE 754 (identical in every engine); the 6-dp rounding
    before the decimal-exact total removes the one order-dependent float
    sum; the total folds back in as a 1-row broadcast — no collect.
    """
    per_src = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_col).alias("n_tokens"),
    )
    w_raw = F.round(F.sqrt(F.col("n_tokens")), 6).cast("decimal(18,6)")
    weighted = per_src.withColumn("_w", w_raw)
    total = weighted.agg(F.sum("_w").alias("_w_total"))  # decimal-exact
    share = F.col("_w").cast("double") / F.col("_w_total").cast("double")
    return (
        weighted.join(F.broadcast(total))
        .withColumn("weight", F.round(share, 6))
        .withColumn(
            "epochs",
            F.round(
                F.lit(float(budget_tokens)) * share / F.col("n_tokens"), 6
            ),
        )
        .select(source_col, "n_docs", "n_tokens", "weight", "epochs")
    )


def pack_sequences(
    docs: DataFrame,
    token_count_col,
    context_len: int = 512,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-token training sequences — the
    concat-then-chunk packing every pretraining pipeline runs: documents
    are laid out in a deterministic order (md5-shuffled within each
    stratum), the token stream is cut every ``context_len`` tokens, and
    each doc belongs to the sequence where it STARTS.

    Output: ``(id, stratum, n_tokens, seq_id, offset)`` with ``seq_id``
    the per-stratum sequence index and ``offset`` the doc's first-token
    position inside it.

    Determinism & scale: the order key is md5 (layout/seed independent);
    the running total is a window cumsum per stratum — one shuffle, and
    the window partitions are strata (bounded, parallel), never a global
    single-partition sort. All integer math."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    cum_before = F.coalesce(
        F.sum(token_count_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return docs.select(
        F.col(id_col),
        F.col(strata_col),
        token_count_col.alias("n_tokens") if not isinstance(token_count_col, str)
        else F.col(token_count_col).alias("n_tokens"),
        F.floor(cum_before / context_len).cast("long").alias("seq_id"),
        (cum_before % context_len).cast("long").alias("offset"),
    )
