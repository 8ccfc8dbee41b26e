"""Skew-mitigation operators: salted aggregation and salted join.

The reference never meets skew (≤20 keys, ≤960 rows/day —
/root/reference/src/collector/main.py:23-44), but at 100 TB a handful of
heavy-hitter keys (one airport reporting 1000x more often, one user_id
owning 10% of events) serializes a shuffle partition and stalls the
stage. Two standard remedies, both result-transparent:

- **Salted aggregation**: group by (key, salt) first — the partial
  aggregate spreads one hot key over ``n_salts`` reducers — then
  re-aggregate by key. Correct for any algebraic aggregate expressed as
  (partial, merge) pairs; identical output to the direct groupBy.
- **Salted join**: explode the small/dim side ``n_salts`` times with
  every salt value, salt the fact side randomly-but-deterministically,
  and equi-join on (key, salt) — each hot fact key now lands on
  ``n_salts`` reducers instead of one.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles
moderate sort-merge skew automatically at runtime; explicit salting is
the design-time tool for *known* pathological keys and for aggregations
(which AQE skew handling does not split). Salt derives from a stable
column hash, never rand(), so retried tasks and both engines agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _salt_col(c: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): stable across retries (no
    rand()) and fine-grained enough to split a single hot key (derives
    from a row-level column, e.g. the event id)."""
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_source: str,
    partials: dict[str, tuple[Column, Column]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partials`` maps output name -> (stage1 aggregate over raw rows,
    stage2 aggregate over stage-1 partials); the stage-2 expression must
    reference the stage-1 alias (e.g. ``F.sum("x")`` then
    ``F.sum("part_x")``). Example::

        salted_agg(events, ["user_id"], "event_id",
                   {"n": (F.count(F.lit(1)), F.sum("n")),
                    "sum_v": (F.sum("value"), F.sum("sum_v"))})

    Stage 1 groups by (keys..., salt) — a key with 10^9 rows becomes
    ``n_salts`` groups of ~10^9/n_salts each; stage 2 merges the at most
    ``n_salts`` partial rows per key. Output ≡ ``df.groupBy(keys).agg``.
    """
    stage1 = (
        df.withColumn("__salt", _salt_col(F.col(salt_source), n_salts))
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in partials.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate ``dim`` across all salts, salt
    ``fact`` deterministically, join on (key, salt).

    Use when the dim is too big to broadcast AND the fact key is skewed;
    the dim side grows ``n_salts``x (still dim-sized), while each hot
    fact key spreads over ``n_salts`` reducers. Output ≡ the unsalted
    join; the helper drops its scratch columns.
    """
    salted_fact = fact.withColumn(
        "__salt", _salt_col(F.col(salt_source), n_salts)
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_fact.join(
        replicated_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact["__salt"] == replicated_dim["__salt"]),
        how,
    )
    return out.drop("__salt")


def skew_key_report(
    df: DataFrame, key_col: str, top_n: int = 5
) -> DataFrame:
    """Pre-flight skew diagnosis for a join/aggregation key: the top-N
    heaviest keys with their share, skew ratio (key rows ÷ mean rows
    per key), and an integer recommended salt factor — the number the
    salted_agg/salted_join operators above take as ``n_salts``.

    Cost: ONE partial+final count aggregate over the key (the same
    shuffle the audited operation would pay), then ranking a
    keys-cardinality table. At 100 TB run it on a sample or reuse the
    shuffle statistics; the operator exists so the decision to salt is
    measured, not guessed. recommended_salts is computed in pure
    integer math (ceil-div) so the verdict is engine-exact.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    stats = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    # top-N via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps, merged on the driver) — the counts frame is key-grain,
    # which at 100 TB can be 10⁸⁺ rows; a global row_number window
    # would sort it in ONE task. rank_bounded then ranks only the
    # ≤top_n survivors, window-free.
    from metar_pipeline_spark.operators.ranking import rank_bounded

    top = rank_bounded(
        counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_n),
        [-F.col("n_rows"), F.col("key")],
    )
    amplified = F.col("n_rows") * F.col("n_keys")
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("rank").cast("int").alias("rank"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.round(
                F.col("n_rows") / F.col("total_rows").cast("double"), 6
            ).alias("share"),
            F.round(
                amplified / F.col("total_rows").cast("double"), 6
            ).alias("skew_ratio"),
            # ceil-div: explicit floor() on both engines (a bare
            # double->int cast truncates in Spark but ROUNDS in
            # DuckDB)
            F.floor(
                (amplified + F.col("total_rows") - 1)
                / F.col("total_rows")
            ).cast("bigint").alias("recommended_salts"),
            F.col("total_rows").cast("bigint").alias("total_rows"),
            F.col("n_keys").cast("bigint").alias("n_keys"),
        )
    )
