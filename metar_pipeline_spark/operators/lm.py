"""Character n-gram language-model quality scoring.

The CCNet/DataComp recipe ranks training documents by language-model
perplexity; the distributed form of its training step is just counting
(n-gram frequencies are one hash aggregate), and the scoring step is a
broadcast join of the (tiny: |charset|²) model against the corpus.
Everything is built-in column math — no UDF in either pass.

Scale notes:
- The corpus is exploded into bigrams ONCE: ``doc_bigram_counts``
  reduces occurrences to per-(doc, bigram) counts (map-side combine
  bounds each partition's stream at |docs_in_partition|·|charset|²),
  and BOTH the model (a second-level re-aggregation) and the scores
  (a broadcast join weighted by the counts) derive from it — one
  generator pass over the data instead of two.
- The model is broadcast (its size is bounded by the charset,
  independent of corpus size); scoring shuffles one row per doc.
- DETERMINISM: per-doc negative-log-likelihood accumulates as
  DECIMAL(38,18) · count — exactly equal to summing the decimal cast
  of every occurrence (decimal arithmetic is exact), so the
  count-weighted form hashes identically to an occurrence-level
  oracle; ln/exp see identical doubles on both engines and the
  6-decimal rounding absorbs any last-ulp libm difference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC18 = "decimal(38,18)"


def char_bigrams(text: Column) -> Column:
    """Array of lowercased character bigrams of ``text`` (empty for
    texts shorter than 2 chars — guard needed because Spark's
    ``sequence(1, 0)`` counts DOWN, unlike SQL generate_series).

    Column-expression convenience for array-valued contexts only. For
    bulk (explode → aggregate) paths use ``doc_bigram_counts``: its
    explode-first form is fully codegen'd, while this HOF re-evaluates
    the captured lower(text) per element when interpreted — O(len²)
    per document (measured 2.1x slower at sf0.1)."""
    t = F.lower(text)
    return F.when(
        F.length(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 1),
            lambda i: t.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_bigram_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, bg, cnt): per-document bigram occurrence counts — the one
    generator pass everything else derives from. Callers that feed
    both train and score should ``localCheckpoint`` the result so the
    explode is not replayed per consumer.

    Shape (measured r5, sf0.1): explode-FIRST — stage lower(text) as a
    bound column, explode sequence(1, len-1), substring per output row.
    All codegen'd, no higher-order function. The HOF form
    (explode(char_bigrams(text))) cost 2.1x more: the transform lambda
    captures lower(text) as an EXPRESSION and interpreted HOF eval
    re-lowers the whole document per element — O(len²) character work
    per doc (4.2 s vs 2.0 s for this stage alone)."""
    from metar_pipeline_spark.operators.fanout import fan_out

    # fan_out: the testdata tables scan as ONE partition (single file,
    # single row group), so this generator pass — the expensive
    # per-character explode feeding every LM operator — ran on one core
    # (measured round 13: 1.9-2.3 s single-task stages in perplexity/
    # platt/DSIR). Conditional floor; no-op on multi-split scans.
    staged = fan_out(
        docs.select(F.col(id_col), F.lower(F.col(text_col)).alias("_lt"))
    )
    return (
        staged.filter(F.length("_lt") >= 2)
        .select(
            F.col(id_col),
            "_lt",
            F.explode(
                F.sequence(F.lit(1), F.length("_lt") - 1)
            ).alias("_i"),
        )
        .select(
            F.col(id_col), F.expr("substring(_lt, _i, 2)").alias("bg")
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_char_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_counts: DataFrame | None = None,
) -> DataFrame:
    """Maximum-likelihood conditional bigram model: one row per seen
    bigram with ``logp = ln(count(c1c2) / count(c1·))``."""
    dc = (
        doc_counts
        if doc_counts is not None
        else doc_bigram_counts(docs, id_col, text_col)
    )
    counts = dc.groupBy("bg").agg(F.sum("cnt").alias("c"))
    prefix = counts.groupBy(
        F.substring("bg", 1, 1).alias("c1")
    ).agg(F.sum("c").alias("pn"))
    return (
        counts.join(
            F.broadcast(prefix),
            F.substring(counts["bg"], 1, 1) == prefix["c1"],
        )
        .select(
            "bg",
            F.log(F.col("c").cast("double") / F.col("pn")).alias("logp"),
        )
    )


def score_docs_nll(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    doc_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean negative log-likelihood + perplexity under a
    trained bigram model. Documents shorter than one bigram drop out
    (no evidence to score). Perplexity is exp() of the ALREADY-rounded
    mean so both engines exponentiate the identical double."""
    dc = (
        doc_counts
        if doc_counts is not None
        else doc_bigram_counts(docs, id_col, text_col)
    )
    scored = (
        dc.join(F.broadcast(model), "bg")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            # decimal(28,18) * decimal(8,0) → decimal(37,18): stays
            # within precision 38 so the product (≡ cnt repeated
            # decimal additions) is EXACT — a decimal(38,18)*bigint
            # product would overflow and silently round at scale ~6,
            # hash-mismatching the occurrence-level oracle
            F.round(
                F.sum(
                    (-F.col("logp")).cast("decimal(28,18)")
                    * F.col("cnt").cast("decimal(8,0)")
                ).cast("double")
                / F.sum("cnt"),
                round_to,
            ).alias("mean_nll"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "mean_nll",
        F.round(F.exp(F.col("mean_nll")), round_to).alias("perplexity"),
    )


def dsir_logratio_scores(
    docs: DataFrame,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    floor_logp: float = -13.815510557964274,
    doc_counts: DataFrame | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    per-document mean log p_target(x) − log p_raw(x) under two char-
    bigram models — one trained on the ``target`` subset (the domain
    you want more of), one on the whole corpus.

    ``target`` is a boolean Column over ``docs``. Bigrams the target
    model never saw score ``floor_logp`` (≈ ln(1e-6), spelled as the
    exact double literal so both engines add the identical number —
    an ln() call could differ in the last ulp across libms).

    Scale shape: ONE generator pass (``doc_bigram_counts``, shared via
    ``doc_counts``/localCheckpoint) feeds ONE flagged aggregate that
    trains BOTH models together (per-bigram total and target-subset
    counts in the same HashAggregate — the target model is a free
    conditional sum, not a second counting chain), and the combined
    model is a single charset²-bounded broadcast back onto the scoring
    join; the corpus never shuffles — same contract as the perplexity
    scorer. Output: (id, n_bigrams, avg_logratio) — feed a
    deterministic weighted sampler (Gumbel top-k) for the resample.
    """
    dc = (
        doc_counts
        if doc_counts is not None
        else doc_bigram_counts(docs, id_col, text_col).localCheckpoint()
    )
    target_ids = docs.filter(target).select(id_col)
    flagged = dc.join(
        target_ids.withColumn("_tgt", F.lit(True)), id_col, "left"
    )
    counts = flagged.groupBy("bg").agg(
        F.sum("cnt").alias("c"),
        F.sum(F.when(F.col("_tgt"), F.col("cnt")).otherwise(F.lit(0))).alias(
            "ct"
        ),
    )
    prefix = counts.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("c").alias("pn"), F.sum("ct").alias("ptn")
    )
    # logp_raw = ln(c/pn); logp_target = ln(ct/ptn) where the target
    # saw the bigram, else the floor — identical values to training
    # two separate models (the conditional sums ARE the target counts)
    model = (
        counts.join(
            F.broadcast(prefix),
            F.substring(counts["bg"], 1, 1) == prefix["c1"],
        )
        .select(
            "bg",
            (
                F.when(
                    F.col("ct") > 0,
                    F.log(F.col("ct").cast("double") / F.col("ptn")),
                ).otherwise(F.lit(floor_logp))
                - F.log(F.col("c").cast("double") / F.col("pn"))
            ).alias("_delta"),
        )
    )
    return (
        dc.join(F.broadcast(model), "bg")
        .select(F.col(id_col), F.col("cnt"), F.col("_delta"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            # decimal(28,18) * decimal(8,0): exact within precision 38
            # (see score_docs_nll for the overflow rationale)
            F.round(
                F.sum(
                    F.col("_delta").cast("decimal(28,18)")
                    * F.col("cnt").cast("decimal(8,0)")
                ).cast("double")
                / F.sum("cnt"),
                6,
            ).alias("avg_logratio"),
        )
    )


def platt_calibrated_scores(
    scores: DataFrame,
    id_col: str,
    score_col: str,
    label_col: str,
    steps: int = 2,
    lr: float = 1.0,
) -> DataFrame:
    """Platt scaling (Platt 1999): calibrate a raw discriminant score
    (e.g. the DSIR log-ratio) into a probability with a 1-feature
    logistic model, trained by ``steps`` full-batch gradient-descent
    rounds — the distributed form of the classifier-calibration step a
    CCNet/DCLM-style curation pipeline runs on LM features.

    Each step is ONE partial+final aggregate over the scores: per-row
    gradient contributions (y−σ(w0+w1·s)) and (y−σ(·))·s are rounded
    to 12 decimals (absorbing any last-ulp libm difference in exp),
    summed exactly in DECIMAL, divided by n once, and the weight
    update is re-rounded — so every engine walks the identical weight
    trajectory and the oracle can unroll the steps as CTEs. The
    per-step weight read is a one-row aggregate (the same scalar class
    as the incremental high-watermark reads), never a data collect.

    Returns ``scores`` + ``prob`` (σ of the final calibrated logit,
    rounded 6).
    """
    y = F.col(label_col).cast("double")
    s = F.col(score_col)
    w0, w1 = 0.0, 0.0
    for _ in range(steps):
        z = F.round(F.lit(w0) + F.lit(w1) * s, 12)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g0c = F.round(y - p, 12).cast("decimal(28,18)")
        g1c = F.round((y - p) * s, 12).cast("decimal(28,18)")
        row = scores.agg(
            F.round(
                (F.sum(g0c).cast("double") / F.count(F.lit(1))), 12
            ).alias("g0"),
            F.round(
                (F.sum(g1c).cast("double") / F.count(F.lit(1))), 12
            ).alias("g1"),
        ).first()
        if row["g0"] is None:  # empty input: SUM is NULL — weights stay 0
            break
        w0 = round(w0 + lr * row["g0"], 12)
        w1 = round(w1 + lr * row["g1"], 12)
    zf = F.round(F.lit(w0) + F.lit(w1) * s, 12)
    return scores.select(
        "*",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zf)), 6).alias("prob"),
    )
