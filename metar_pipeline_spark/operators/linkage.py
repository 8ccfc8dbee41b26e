"""Record linkage (entity resolution) over structured records.

The Fellegi–Sunter shape: candidate pairs come from BLOCKING (equi-join
on coarse keys — never a cross join), each pair gets a weighted
agreement score across fields, and pairs above a threshold are
"probable same entity". This is the structured-record sibling of the
document near-dup family in operators/dedup.py: same
block→score→threshold pipeline, but multi-field evidence (name
similarity + categorical equality + numeric tolerance) instead of one
text digest.

Scale shape: the join is an equi-join on the block key, so work is
Σ|block|² — the block key must bound block size the way LSH bands bound
candidate sets (at 100 TB compose more fields into the key; the
blocked-pairs explosion never leaves a block). Scores are computed on
the pair row in one projection — no UDF, no per-field shuffle.

Determinism: the name Jaccard is rounded to 6 decimals BEFORE
weighting, weights are small rationals, and the final score is rounded
again — component values land off the .5 round boundary, so Spark
(half-up) and any half-even engine agree bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def record_linkage_pairs(
    records: DataFrame,
    id_col: str,
    block_cols: Sequence[str | Column],
    name_col: str,
    name_weight: float = 4.0,
    exact_cols: Sequence[tuple[str, float]] = (),
    numeric_cols: Sequence[tuple[str, float, float]] = (),
    min_score: float = 5.0,
) -> DataFrame:
    """Blocked pairwise linkage scores.

    ``block_cols``: equality blocking keys (strings or Columns — pass
    an expression like ``floor(size/10)`` to bucket a numeric key).
    ``exact_cols``: (col, weight) — weight added when values are equal.
    ``numeric_cols``: (col, tolerance, weight) — weight added when
    |a−b| ≤ tolerance.
    Output: (id_a, id_b, name_jaccard, score) for score ≥ min_score,
    id_a < id_b.
    """
    blocks = [
        (c if isinstance(c, Column) else F.col(c)).alias(f"__blk{i}")
        for i, c in enumerate(block_cols)
    ]
    toks = F.array_distinct(F.split(F.col(name_col), " "))
    carried = (
        [F.col(id_col).alias("__id"), toks.alias("__toks")]
        + blocks
        + [F.col(c).alias(f"__x_{c}") for c, _ in exact_cols]
        + [F.col(c).alias(f"__n_{c}") for c, _, _ in numeric_cols]
    )
    # fan_out (round 13, guide §2.5): with a broadcast build side the
    # blocked pair scoring runs in the probe side's map stage — ONE
    # task over a single-file scan (measured 2.6 s in
    # record_linkage_parts at sf0.1). Conditional; no-op at scale.
    from metar_pipeline_spark.operators.fanout import fan_out

    t = fan_out(records.select(*carried))
    blk = [f"__blk{i}" for i in range(len(blocks))]
    a = t.select(
        *blk,
        F.col("__id").alias("id_a"),
        F.col("__toks").alias("__ta"),
        *[F.col(f"__x_{c}").alias(f"__xa_{c}") for c, _ in exact_cols],
        *[F.col(f"__n_{c}").alias(f"__na_{c}") for c, _, _ in numeric_cols],
    )
    b = t.select(
        *blk,
        F.col("__id").alias("id_b"),
        F.col("__toks").alias("__tb"),
        *[F.col(f"__x_{c}").alias(f"__xb_{c}") for c, _ in exact_cols],
        *[F.col(f"__n_{c}").alias(f"__nb_{c}") for c, _, _ in numeric_cols],
    )
    pairs = a.join(b, blk).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
    union = F.greatest(
        F.size(F.col("__ta")) + F.size(F.col("__tb")) - inter, F.lit(1)
    )
    nj = F.round(inter / union, 6)
    score: Column = F.lit(float(name_weight)) * F.col("name_jaccard")
    for c, w in exact_cols:
        score = score + F.when(
            F.col(f"__xa_{c}") == F.col(f"__xb_{c}"), F.lit(float(w))
        ).otherwise(F.lit(0.0))
    for c, tol, w in numeric_cols:
        score = score + F.when(
            F.abs(F.col(f"__na_{c}") - F.col(f"__nb_{c}")) <= F.lit(tol),
            F.lit(float(w)),
        ).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("name_jaccard", nj)
        .withColumn("score", F.round(score, 6))
        .filter(F.col("score") >= F.lit(float(min_score)))
        .select("id_a", "id_b", "name_jaccard", "score")
    )
