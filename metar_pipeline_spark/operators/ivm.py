"""Incremental view maintenance (IVM) over Z-sets — the DBSP /
Materialize delta-join algebra expressed in DataFrame ops.

A Z-set is a relation whose rows carry an integer weight ``_w``
(+1 insert, −1 retraction); updates are retract-old + insert-new
pairs. The delta of an inner equi-join under base changes is the
bilinear identity

    Δ(A ⋈ B) = ΔA ⋈ B_old  +  A_old ⋈ ΔB  +  ΔA ⋈ ΔB

so a materialized join view is maintained by joining only the DELTAS
against the (indexed) old states — never recomputing the view. At
100 TB this is the difference between touching |ΔA|+|ΔB| rows per
batch and rescanning both fact tables; the delta sides are typically
micro-batch-sized and broadcast, so each term is a broadcast hash
join against a partitioned base.

Consolidation (sum weights per row, drop net-0) is an ordinary hash
aggregate at the view's row grain. All weights are integers — the
algebra is exact and order-independent by construction, no float
determinism machinery needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT_COL = "_w"


def zset_delta_join(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    key,
) -> DataFrame:
    """The three bilinear terms of Δ(A ⋈ B), weights multiplied.

    Every input is a Z-set frame carrying ``_w``; ``key`` is the
    equi-join column name (or list) shared by both sides. Output
    columns: the joined row (key + both sides' payloads) + ``_w``.
    The result is UNCONSOLIDATED — pass through :func:`consolidate`
    (or your own aggregate) to net the weights.
    """

    def j(x: DataFrame, y: DataFrame) -> DataFrame:
        xw = x.withColumnRenamed(WEIGHT_COL, "_wa")
        yw = y.withColumnRenamed(WEIGHT_COL, "_wb")
        return (
            xw.join(yw, key)
            .withColumn(WEIGHT_COL, F.col("_wa") * F.col("_wb"))
            .drop("_wa", "_wb")
        )

    return (
        j(da, b_old)
        .unionByName(j(a_old, db))
        .unionByName(j(da, db))
    )


def consolidate(zset: DataFrame, cols: "list[str]") -> DataFrame:
    """Net a Z-set: sum weights per row, drop rows whose net weight is
    zero. One hash aggregate at the row grain."""
    return (
        zset.groupBy(*cols)
        .agg(F.sum(WEIGHT_COL).cast("int").alias(WEIGHT_COL))
        .filter(F.col(WEIGHT_COL) != 0)
    )
