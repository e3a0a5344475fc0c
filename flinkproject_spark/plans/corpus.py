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
    # exact dedup as a WINDOW (row_number over the content-hash partition,
    # lowest doc_id wins) instead of exact_dedup + join-back: identical
    # keeper set, same single shuffle on the content hash, but no self-join
    # — a join whose both sides derive from `documents` makes Catalyst
    # execute the upstream subplan once per side.
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    base = (
        documents.withColumn("__rn", F.row_number().over(wdup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

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


def build_training_corpus_v2(
    documents: DataFrame,
    benchmark: DataFrame | None = None,
    max_contamination: float = 0.2,
    min_quality: float = 0.5,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    budget_tokens: int = 1_000_000_000,
) -> DataFrame:
    """The FULL-surface corpus build — every hygiene stage a production
    pre-training pipeline runs, in canonical order, each stage an
    oracle-checked operator:

      1. PII redaction       (text.redact_pii — all downstream stages see
                              scrubbed text, so hashes/shingles/tokens
                              never touch raw PII; production feeds raw
                              text directly — the bench wrapper seeds
                              synthetic PII via text.seed_pii BEFORE
                              calling this plan so redaction is observable
                              on the synthetic corpus)
      2. Gopher quality gate (text.gopher_quality_flags conjunction —
                              named-rule rejection, scan-speed)
      3. decontamination     (dedup.contamination_check vs the eval corpus;
                              docs over max_contamination drop)
      4. exact dedup         (dedup.exact_dedup on the REDACTED text —
                              scrubbing first means two docs differing only
                              in PII collapse to one)
      5. stratified sampling (sampling.stratified_sample)
      6. token-budget pack   (greedy quality-first prefix under budget)

    Stage order is load-bearing: redaction before hashing (4) and before
    shingling (3) so PII spans can't split otherwise-identical content;
    the quality/contamination gates before sampling so rates apply to the
    clean pool. Same shuffle budget as v1 plus one shingle-key shuffle
    for stage 3.
    """
    from flinkproject_spark.operators import text as text_ops

    # Stage-reuse design (VERDICT r03 #7 — the audited plan re-executed the
    # scrubbed-text subplan 8x, 36 parquet scans): every stage that CAN be a
    # chained filter is one (gopher via passthrough flags, dedup via a
    # content-hash window), so the redaction projection flows through a
    # single lineage. The one structurally-unavoidable self-join left is
    # decontamination (its score changes grain: doc -> shingles -> doc), so
    # the scrubbed corpus is localCheckpoint'ed (lazy) right before that
    # branch — materialize once, both sides read the blocks. Measured at
    # sf0.01: 36 scans -> 3, 6.2 s -> ~2 s, identical oracle hash.
    base = text_ops.redact_pii(documents, passthrough=True).select(
        "doc_id", F.col("redacted").alias("text"), "lang", "source"
    )
    base = (
        text_ops.gopher_quality_flags(base, passthrough=True)
        .filter("keep")
        .select(*base.columns)
    )
    if benchmark is not None:
        base = base.localCheckpoint(eager=False)
        clean = dedup.contamination_check(base, benchmark).filter(
            F.col("contamination_pct") <= max_contamination
        ).select("doc_id")
        base = base.join(clean, "doc_id")
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    base = (
        base.withColumn("__rn", F.row_number().over(wdup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

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


def build_training_corpus_v3(
    documents: DataFrame,
    min_quality: float = 0.5,
    bands: int = 4,
    target_lang: str = "en",
    min_importance: float = 0.0,
    shards: int = 64,
    seed: str = "curriculum",
) -> DataFrame:
    """The MODERN selection-and-ordering corpus build — the round-4 surface
    composed end to end, each stage an oracle-checked operator:

      1. fused profile gate   (text.corpus_profile's columns inline:
                               Gopher conjunction AND quality >= threshold
                               in the scan projection — one pass)
      2. fingerprint dedup    (bag-of-words md5 window — collapses
                               token-PERMUTED duplicates byte-exact dedup
                               misses; one content-hash shuffle)
      3. DSIR selection       (text.dsir_vocab ∘ score_against_vocab on
                               the deduped pool, keep log-importance >=
                               threshold — arXiv:2302.03169's
                               select-toward-target step)
      4. curriculum ordering  (sampling.curriculum_order's banding +
                               shard permutation on the SELECTED pool —
                               easy-first phases, seeded in-phase shuffle)

    Stage order is load-bearing: dedup before DSIR so duplicate mass can't
    bias the raw-side LM; selection before ordering so band boundaries
    describe the corpus that actually trains. The vocab branch changes
    grain (doc -> tokens -> vocab -> doc), so the pool is
    localCheckpoint'ed (lazy) before it — v2's measured stage-reuse fix.
    """
    from flinkproject_spark.operators import text as text_ops

    # stage 1 IS corpus_profile — the passthrough form keeps text for the
    # downstream stages; no expression is re-spelled here
    gated = (
        text_ops.corpus_profile(documents, passthrough=True)
        .filter(F.col("gopher_keep") & (F.col("quality_score") >= min_quality))
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            "quality_score",
            F.col("fingerprint").alias("fp"),
        )
    )

    wdup = Window.partitionBy("fp").orderBy("doc_id")
    pool = (
        gated.withColumn("__rn", F.row_number().over(wdup))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "fp")
    )

    pool = pool.localCheckpoint(eager=False)
    scores = text_ops.score_against_vocab(
        pool, text_ops.dsir_vocab(pool, target_lang)
    )
    sel = pool.join(
        scores.filter(F.col("log_importance") >= min_importance).select(
            "doc_id", "log_importance"
        ),
        "doc_id",
    )

    # stage 4 IS sampling.curriculum_order — handed the already-scored
    # selection; lang/source/log_importance carry through
    ordered = sampling.curriculum_order(
        bands=bands,
        seed=seed,
        shards=shards,
        scored=sel.select(
            "doc_id", "lang", "source", "log_importance", "quality_score"
        ),
    )
    return ordered.select(
        "doc_id",
        "lang",
        "source",
        "phase",
        "shard",
        "quality_score",
        "log_importance",
        "global_pos",
    )


def build_training_corpus_v4(
    documents: DataFrame,
    w: int = 8,
    min_quality: float = 0.5,
    budget_tokens: int = 10_000,
) -> DataFrame:
    """The SUB-DOCUMENT-clean corpus build — the round-7 surface composed
    end to end, each stage an oracle-checked operator:

      1. span scrub   (dedup.span_dedup_apply — strip repeated w-token
                       spans from non-keeper copies, keeper protected:
                       Lee et al.'s cut step runs BEFORE doc-level dedup
                       so shared boilerplate can't make distinct docs
                       read as near-dups downstream)
      2. doc dedup    (md5 window over the SCRUBBED text — scrubbing can
                       turn former near-dups byte-identical; the same
                       single-shuffle window form as v1's stage 1)
      3. quality gate (v1's length/diversity composite, recomputed on
                       the scrubbed text — the text that actually trains)
      4. budget pack  (quality-first greedy prefix under budget_tokens —
                       v1's stage 4, global window with the banded
                       equal-output twin documented there)

    Stage order is load-bearing both ways: scrub-before-dedup (above) and
    dedup-before-quality, so a duplicated doc can't spend budget twice.
    Documents whose every token was a non-keeper duplicate vanish at
    stage 1 (audited by span_dedup_apply's count columns when run
    standalone). Returns (doc_id, n_tokens, n_tokens_dropped,
    quality_score, cum_tokens) — lang/source are deliberately not joined
    back; the manifest keys on doc_id.
    """
    scrubbed = dedup.span_dedup_apply(documents, w)

    wdup = Window.partitionBy(F.md5("clean_text")).orderBy("doc_id")
    base = (
        scrubbed.withColumn("__rn", F.row_number().over(wdup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    x = F.split("clean_text", r"\s+")
    n_tok = F.size(x).cast("double")
    uniq = F.size(F.array_distinct(x)).cast("double")
    scored = base.select(
        "doc_id",
        F.size(x).cast("bigint").alias("n_tokens"),
        "n_tokens_dropped",
        (
            F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5
            + (uniq / n_tok) * 0.5
        ).alias("quality_score"),
    ).filter(F.col("quality_score") >= min_quality)

    wpack = (
        Window.orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        scored.withColumn(
            "cum_tokens", F.sum("n_tokens").over(wpack).cast("bigint")
        )
        .filter(F.col("cum_tokens") <= budget_tokens)
    )


def build_training_corpus_v5(
    documents: DataFrame,
    model: DataFrame,
    w: int = 8,
    budget_tokens: int = 10_000,
) -> DataFrame:
    """The TRAINED-classifier corpus build (VERDICT r10 task 4): v4's
    scrub -> dedup spine unchanged, but the quality stage is the
    persisted Naive Bayes model's verdict over the SCRUBBED text (the
    text that actually trains) and the budget pack ranks by the
    classifier MARGIN (nb_score_ppm, exact int64) instead of the
    hand-weighted composite:

      1. span scrub   (dedup.span_dedup_apply — as v4)
      2. doc dedup    (md5 window over the scrubbed text — as v4)
      3. NB gate      (text.nb_model_score under the `model` table from
                       nb_quality_fit: prior + int64 sum of token
                       log-odds; keep iff margin > 0. The model is fit
                       ONCE on the raw corpus and applied to scrubbed
                       text — the production reality, where the
                       classifier predates the day's cleaning run; OOV
                       tokens created by scrubbing score a sound 0)
      4. budget pack  (greedy highest-margin prefix under budget_tokens,
                       ties to smallest doc_id — v4's window with the
                       trained ranking key)

    Returns (doc_id, n_tokens, n_tokens_dropped, nb_score_ppm,
    cum_tokens). Same scale posture as v4: the dedup window and the
    pack window are the only data-scale shuffles; the vocab join is
    broadcastable (Zipf-small model table)."""
    from flinkproject_spark.operators.text import nb_model_score

    scrubbed = dedup.span_dedup_apply(documents, w)
    wdup = Window.partitionBy(F.md5("clean_text")).orderBy("doc_id")
    base = (
        scrubbed.withColumn("__rn", F.row_number().over(wdup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        # feats AND the NB scorer both read the scrubbed+deduped corpus;
        # materialize it once (lazy) or each reference re-runs the whole
        # span-scrub pipeline — the same measured stage-reuse fix v2/v3
        # carry (r11 optimization: the before-plan held 14 scans)
        .localCheckpoint(eager=False)
    )
    x = F.split("clean_text", r"\s+")
    feats = base.select(
        "doc_id",
        F.size(x).cast("bigint").alias("n_tokens"),
        "n_tokens_dropped",
    )
    margins = nb_model_score(base, model, text_col="clean_text")
    gated = (
        feats.join(margins, "doc_id")
        .filter(F.col("nb_score_ppm") > 0)
    )
    wpack = (
        Window.orderBy(F.desc("nb_score_ppm"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        gated.withColumn(
            "cum_tokens", F.sum("n_tokens").over(wpack).cast("bigint")
        )
        .filter(F.col("cum_tokens") <= budget_tokens)
    )
