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


def zset_weighted_agg(
    zset: DataFrame,
    group_cols: "list[str]",
    sums: "dict[str, object] | None" = None,
    count_col: str = "_n",
) -> DataFrame:
    """The DELTA of a grouped linear aggregate, from the delta Z-set
    alone: COUNT(*) is linear in the weights (Δcount = Σ _w) and
    SUM(expr) is weight-multiplied (Δsum = Σ expr·_w) — retractions
    subtract by construction. One hash aggregate over |Δ| rows; the
    maintained view is never touched here.

    ``sums``: output name → Column expression to SUM. Use EXACT types
    (integer / DECIMAL) — the whole point of incremental maintenance is
    that old_state + Δ is bit-equal to a full recompute, which float
    accumulation order would break.

    Output: ``group_cols`` + ``count_col`` (long) + one column per
    ``sums`` entry. A group absent from the delta simply emits no row.
    """
    aggs = [F.sum(F.col(WEIGHT_COL)).cast("long").alias(count_col)]
    for name, col in (sums or {}).items():
        aggs.append(F.sum(col * F.col(WEIGHT_COL)).alias(name))
    return zset.groupBy(*group_cols).agg(*aggs)


def apply_agg_delta(
    view: DataFrame,
    delta: DataFrame,
    group_cols: "list[str]",
    measure_cols: "list[str]",
    count_col: str = "_n",
) -> DataFrame:
    """MERGE a group-grain aggregate delta (:func:`zset_weighted_agg`
    output) into the materialized aggregate view: full-outer equi-join
    on the group key (new groups appear from the delta side, untouched
    groups pass through from the view side), measures ADD with
    null-as-zero, and a group whose maintained row count nets to zero
    is DROPPED — the retraction-aware upgrade of watermark+merge
    (SURVEY L7 drops late updates by design; this path absorbs them).

    Shape at 100 TB: the join touches |view_groups| + |Δ_groups| rows
    at GROUP grain (never fact grain); with the view stored partitioned
    by the group key the delta side is micro-batch-sized and broadcast.
    ``view`` and ``delta`` must share ``group_cols`` + ``count_col`` +
    ``measure_cols`` names and exact (non-float) measure types.
    """
    j = view.alias("v").join(delta.alias("d"), group_cols, "full_outer")
    sel = [F.col(c) for c in group_cols]
    sel.append(
        (
            F.coalesce(F.col(f"v.{count_col}"), F.lit(0))
            + F.coalesce(F.col(f"d.{count_col}"), F.lit(0))
        ).cast("long").alias(count_col)
    )
    for m in measure_cols:
        sel.append(
            (
                F.coalesce(F.col(f"v.{m}"), F.lit(0))
                + F.coalesce(F.col(f"d.{m}"), F.lit(0))
            ).alias(m)
        )
    return j.select(*sel).filter(F.col(count_col) != 0)
