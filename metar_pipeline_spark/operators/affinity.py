"""Slice-centroid embedding affinity: how close are two corpus slices
in embedding space?

The dense sibling of vocab.source_vocab_jaccard, and the measurement
a domain-mixture designer reads before setting sampling weights
(slices whose centroids nearly coincide are redundant; distant ones
add coverage). Shape: the corpus reduces to (slice, dim) grain in ONE
pass (posexplode + hash agg with exact DECIMAL accumulation — float
sum order can then never move the result), giving a centroid frame of
|slices| × dim rows — trivially small at any corpus scale — and every
pairwise cosine is computed on that tiny frame (dim-keyed self-join,
never a corpus-width operation).

Determinism contract: per-dim sums accumulate as DECIMAL(38,10) of
the DOUBLE-cast elements (the house float-agg pattern — both engines
quantize the same way), ONE double division by the slice count, dot
and norm cross-products re-accumulated as DECIMAL(38,18), one final
round(…, 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC_SUM = "decimal(38,10)"
_DEC_DOT = "decimal(38,18)"


def slice_centroids(
    vectors: DataFrame,
    slice_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """(slice, dim, c): the per-slice mean vector in long form."""
    from metar_pipeline_spark.operators.fanout import fan_out

    # fan_out before the d-fold posexplode: a single-file vector scan
    # is ONE partition, so the explode + decimal partial aggregation
    # otherwise run on one core (guide §2.5; same seam as pca.gram_cells).
    dims = fan_out(vectors.select(slice_col, vec_col)).select(
        F.col(slice_col).alias("slice"),
        F.posexplode(F.col(vec_col)).alias("dim", "__e"),
    )
    return dims.groupBy("slice", "dim").agg(
        (
            F.sum(F.col("__e").cast("double").cast(_DEC_SUM)).cast(
                "double"
            )
            / F.count("*")
        ).alias("c")
    )


def centroid_affinity(
    centroids: DataFrame, ndigits: int = 6
) -> DataFrame:
    """Pairwise cosine between slice centroids.

    Input: the long (slice, dim, c) frame from slice_centroids.
    Output: (slice_a, slice_b, cosine) for slice_a < slice_b.
    """
    norms = centroids.groupBy("slice").agg(
        F.sqrt(
            F.sum((F.col("c") * F.col("c")).cast(_DEC_DOT)).cast("double")
        ).alias("nrm")
    )
    a = centroids.alias("a")
    b = centroids.alias("b")
    dots = (
        a.join(b, on="dim")
        .filter(F.col("a.slice") < F.col("b.slice"))
        .groupBy(
            F.col("a.slice").alias("slice_a"),
            F.col("b.slice").alias("slice_b"),
        )
        .agg(
            F.sum((F.col("a.c") * F.col("b.c")).cast(_DEC_DOT))
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(
        F.col("slice").alias("slice_a"), F.col("nrm").alias("na")
    )
    nb = norms.select(
        F.col("slice").alias("slice_b"), F.col("nrm").alias("nb")
    )
    return (
        dots.join(na, "slice_a")
        .join(nb, "slice_b")
        .select(
            "slice_a",
            "slice_b",
            F.round(
                F.col("dot") / (F.col("na") * F.col("nb")), ndigits
            ).alias("cosine"),
        )
    )
