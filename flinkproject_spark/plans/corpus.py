"""North-star pipeline assembly: the end-to-end training-corpus build.

The reference's jobs compose log streams into serving tables; the analog a
pre-training data platform runs over `documents` is this four-stage
composition, each stage an oracle-checked operator:

  1. exact dedup          (dedup.exact_dedup winners — one content hash
                           groupBy, the O(corpus) first pass)
  2. quality gate         (text.quality_scores composite >= threshold —
                           narrow filter, Gopher/C4-style)
  3. stratified sampling  (sampling.stratified_sample — deterministic
                           hash-Bernoulli per source, reproducible across
                           runs and corpus growth)
  4. token-budget packing (sampling.token_budget_pack ordering — greedy
                           quality-first prefix under the budget)

One Catalyst plan end to end: the dedup aggregate and the final packing
window are the only shuffles; quality + sampling fuse into the scan
projection. At 100 TB stages 1-3 stream through; stage 4's global window
swaps for the banded two-phase form documented in token_budget_pack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flinkproject_spark.operators import dedup, sampling


def build_training_corpus(
    documents: DataFrame,
    min_quality: float = 0.5,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    budget_tokens: int = 1_000_000_000,
) -> DataFrame:
    """Dedup -> quality-gate -> sample -> pack; returns the packed corpus
    manifest (doc_id, lang, source, n_tokens, quality_score, cum_tokens)."""
    keepers = dedup.exact_dedup(documents).select(
        F.col("keeper_id").alias("doc_id")
    )
    base = documents.join(keepers, "doc_id")

    x = F.split("text", r"\s+")
    n_tok = F.size(x).cast("double")
    uniq = F.size(F.array_distinct(x)).cast("double")
    scored = base.select(
        "doc_id",
        "lang",
        "source",
        F.size(x).cast("bigint").alias("n_tokens"),
        (
            F.least(n_tok / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
            + (uniq / n_tok) * F.lit(0.5)
        ).alias("quality_score"),
    ).filter(F.col("quality_score") >= min_quality)

    if rates:
        scored = sampling.stratified_sample(scored, rates, default_rate=default_rate)

    w = Window.orderBy(F.desc("quality_score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_tokens)
    )
