"""Distributed weighted prefix sum (exact global running total) and
the token-budget shard planner built on it.

``SUM(w) OVER (ORDER BY …)`` with no partition key is the same
single-partition WindowExec this repo's round-7 rewrites eliminated
for ranks (operators/ranking.distributed_rank); this is the WEIGHTED
generalization, same three parallel steps:

1. range exchange on the sort keys (the price of any total order);
2. per-partition weight SUMS → prefix offsets (one row per shuffle
   partition — bounded by config, not data — broadcast back);
3. running sum over a window PARTITIONED by the range-partition id;
   global cumsum = partition offset + local running sum.

The pid-tagged frame is localCheckpoint-pinned before fanning out to
the offsets and window branches (RangePartitioner samples boundaries
with per-RDD-id seeds; two evaluations of one range exchange may
place rows differently — distributed_rank's round-7 finding).

Exactness contract: the caller supplies an integer (or DECIMAL)
weight column; LONG token/char counts make every partial sum exact,
so the result is bit-equal to the unpartitioned window regardless of
partition boundaries (pinned by tests). Float weights would
reintroduce accumulation-order drift — cast to DECIMAL first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_prefix_sum(
    df: DataFrame,
    sort_cols: list[Column],
    weight_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = inclusive running total of ``weight_col``
    in ``sort_cols`` order (which must include a unique tiebreak)."""
    ranged = (
        df.repartitionByRange(num_partitions, *sort_cols)
        if num_partitions is not None
        else df.repartitionByRange(*sort_cols)
    )
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    sums = (
        with_pid.groupBy("__pid")
        .agg(F.sum(weight_col).alias("__w"))
        .localCheckpoint(eager=True)
    )
    a, b = sums.alias("a"), sums.alias("b")
    offsets = (
        a.join(b, F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__w"), F.lit(0)).alias("__offset"))
    )
    local = F.sum(weight_col).over(
        Window.partitionBy("__pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_pid.withColumn("__local", local)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__offset") + F.col("__local"))
        .drop("__pid", "__local", "__offset")
    )


def plan_shards(
    df: DataFrame,
    sort_cols: list[Column],
    weight_col: str,
    budget: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Assign each row to a contiguous shard of ~``budget`` total
    weight, walking ``sort_cols`` order: a row starts in shard
    floor(exclusive-prefix / budget) — rows are never split, so a
    shard may exceed the budget by at most one row's weight (the
    standard greedy manifest rule; deterministic given the order).
    """
    ps = distributed_prefix_sum(df, sort_cols, weight_col)
    # `div` = exact LONG integer division: a double floor(x / budget)
    # silently goes off-by-one once the running total passes 2^53
    # (a petabyte-scale corpus in char weights) — integer div never does.
    return ps.withColumn(
        shard_col,
        F.expr(
            f"(cumsum - `{weight_col}`) div {int(budget)}"
        ).cast("int"),
    )
