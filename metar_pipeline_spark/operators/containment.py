"""Containment-based asymmetric near-duplicate detection.

Jaccard (operators/dedup.py) under-scores SUBSET duplication: a long
page quoting a short one whole gives |A∩B|/|A∪B| ≈ |B|/|A| — tiny —
while the directional containment |A∩B|/|B| is 1.0. Broder's (1997)
resemblance/containment pair treats these as separate signals; a
training-data pipeline needs containment to catch quote-inclusion,
boilerplate-wrapped reposts, and truncation pairs that Jaccard's
symmetric denominator hides.

Shape: identical to the Jaccard path and built ON it — MinHash
signatures → banded LSH candidates (imported from operators/dedup:
the band-bucket join, never all-pairs), then exact shingle-set
containment on the candidate set only. Scores are ratios of integer
set sizes rounded once, so every engine agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
)
from metar_pipeline_spark.operators.textops import tokens, word_shingles


def containment_on_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
) -> DataFrame:
    """Exact directional shingle containment for candidate pairs.

    Output: (id_a, id_b, c_a_in_b, c_b_in_a) — c_a_in_b = |A∩B|/|A|
    (how much of A lies inside B), both rounded to 6. Empty shingle
    sets (docs shorter than the shingle width) score 0.0 via the
    greatest(…, 1) guard, mirroring dedup.jaccard_on_pairs.
    """
    sets_df = (
        docs.select(
            F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
        )
        .select(
            "id",
            F.array_distinct(word_shingles(F.col("_t"), shingle_n)).alias(
                "sh"
            ),
        )
        .cache()
    )
    out = (
        sets_df.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a")
        .join(pairs, "id_a")
        .join(
            sets_df.withColumnRenamed("id", "id_b").withColumnRenamed(
                "sh", "sh_b"
            ),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return out.select(
        "id_a",
        "id_b",
        F.round(
            inter / F.greatest(F.size("sh_a"), F.lit(1)), 6
        ).alias("c_a_in_b"),
        F.round(
            inter / F.greatest(F.size("sh_b"), F.lit(1)), 6
        ).alias("c_b_in_a"),
    )


def lsh_containment_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Banded-LSH candidates scored by DIRECTIONAL containment; a pair
    survives when its larger direction reaches ``threshold``."""
    sig = minhash_signature(docs, id_col, text_col, num_hashes, shingle_n)
    pairs = lsh_candidate_pairs(sig, id_col, bands, num_hashes // bands)
    scored = containment_on_pairs(pairs, docs, id_col, text_col, shingle_n)
    return scored.filter(
        F.greatest("c_a_in_b", "c_b_in_a") >= F.lit(threshold)
    )
