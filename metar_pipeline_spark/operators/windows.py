"""Window operators (SURVEY.md §2.5 W1 + general analytics surface).

The reference's only window is ROW_NUMBER latest-per-key
(/root/reference/dbt/models/int/int_metar_latest.sql:9-17). Two
implementations are provided because their physical plans differ at
scale:

- ``latest_per_key_rn``: window sort within key partitions — one shuffle
  by key, then a per-partition sort. Fine when keys are numerous and
  rows-per-key moderate.
- ``latest_per_key_maxby``: ``max_by(struct(*), ts)`` hash aggregate —
  one shuffle of PARTIAL aggregates (one row per key per map task), no
  sort. At 100 TB with few keys this is strictly cheaper and is the
  default the pipeline uses; it also sidesteps whole-partition
  materialization for skewed keys.

Tie-breaking: Postgres ROW_NUMBER with a non-unique ORDER BY is
nondeterministic; we make it deterministic by always adding trailing
tiebreak columns (FIXTURES.md §6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key_rn(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """ROW_NUMBER() OVER (PARTITION BY keys ORDER BY order) = 1 form
    (/root/reference/dbt/models/int/int_metar_latest.sql:12-15,38)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def latest_per_key_maxby(
    df: DataFrame, keys: Sequence[str], ts: str, tiebreak: str | None = None
) -> DataFrame:
    """Same semantics via max_by — aggregate form, partial-agg friendly.

    ``tiebreak`` orders equal timestamps (higher wins), making the result
    deterministic where ROW_NUMBER would not be.
    """
    ordering = (
        F.struct(F.col(ts), F.col(tiebreak)) if tiebreak else F.col(ts)
    )
    others = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), ordering).alias("_top")
    )
    return agg.select(*keys, *[F.col(f"_top.{c}").alias(c) for c in others])


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    """Generalized W1: top-k rows per group by rank."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def moving_avg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value: str,
    preceding: int,
    alias: str = "moving_avg",
) -> DataFrame:
    """ROWS BETWEEN <preceding> PRECEDING AND CURRENT ROW average —
    the analytic-frame surface the reference lacks but Spark gives free
    (SURVEY.md §2.5)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col))
        .rowsBetween(-preceding, 0)
    )
    return df.withColumn(alias, F.avg(F.col(value)).over(w))


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: int,
    session_col: str = "session_id",
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_minutes``.

    lag + conditional cumulative sum — both windows share one shuffle by
    ``key`` (same partitioning), so this is a single-exchange plan.
    ``tiebreak`` makes ordering total when timestamps can collide.
    Streaming analogue: ``session_window`` in streaming/jobs.py.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_s = gap_minutes * 60
    # cast("timestamp") first: NTZ → session-tz timestamp is a legal,
    # value-preserving cast (UTC session), and LTZ → LTZ is a no-op, so
    # the epoch math works for either input flavor.
    ts_s = F.col(ts).cast("timestamp").cast("long")
    prev_s = F.lag(F.col(ts)).over(w).cast("timestamp").cast("long")
    new_sess = F.when(ts_s - prev_s > gap_s, 1).otherwise(0)
    # lag is NULL on the first row per key → otherwise(0) starts session 0
    return df.withColumn(session_col, F.sum(new_sess).over(wsum))
