"""Character n-gram language-model quality scoring.

The CCNet/DataComp recipe ranks training documents by language-model
perplexity; the distributed form of its training step is just counting
(n-gram frequencies are one hash aggregate), and the scoring step is a
broadcast join of the (tiny: |charset|²) model against the corpus.
Everything is built-in column math — no UDF in either pass.

Scale notes:
- TRAIN: explode is a narrow generator riding the document scan; the
  bigram count is a partial+final hash agg (map-side combine crushes
  the per-partition stream to ≤|charset|² rows before the exchange).
- SCORE: the model is broadcast (its size is bounded by the charset,
  independent of corpus size), so scoring is a second scan with a
  broadcast hash join + per-doc agg — shuffle carries one row per doc.
- DETERMINISM: per-doc negative-log-likelihood sums accumulate in
  DECIMAL(38,18); ln/exp inputs are identical doubles on both engines
  so the 6-decimal rounding absorbs any last-ulp libm difference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC18 = "decimal(38,18)"


def char_bigrams(text: Column) -> Column:
    """Array of lowercased character bigrams of ``text`` (empty for
    texts shorter than 2 chars — guard needed because Spark's
    ``sequence(1, 0)`` counts DOWN, unlike SQL generate_series)."""
    t = F.lower(text)
    return F.when(
        F.length(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 1),
            lambda i: t.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_char_bigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Maximum-likelihood conditional bigram model: one row per seen
    bigram with ``logp = ln(count(c1c2) / count(c1·))``."""
    counts = (
        docs.select(F.explode(char_bigrams(F.col(text_col))).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
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
) -> DataFrame:
    """Per-document mean negative log-likelihood + perplexity under a
    trained bigram model. Documents shorter than one bigram drop out
    (no evidence to score). Perplexity is exp() of the ALREADY-rounded
    mean so both engines exponentiate the identical double."""
    bg = docs.select(
        F.col(id_col), F.explode(char_bigrams(F.col(text_col))).alias("bg")
    )
    scored = (
        bg.join(F.broadcast(model), "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum((-F.col("logp")).cast(DEC18)).cast("double")
                / F.count(F.lit(1)),
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
