"""Ordered-step funnel analysis.

The reference's event model is append-only observations keyed by
(station, time) (SURVEY.md §1.4); a funnel is the canonical analytics
question over any such event stream: of the users who did step 1, how
many went on to do step 2 *after* step 1, then step 3 after step 2.

The naive formulation is k self-joins (one per step) — k shuffles of
the full fact table. This operator does it in ONE aggregation pass:

- per user, collect the (small, bounded-by-user-activity) timestamp
  list of each step's events — map-side combine, one shuffle on user;
- the ordered chain is then pure JVM higher-order-function math:
  ``step_i_ts = array_min(filter(ts_i, t -> t >= step_{i-1}_ts))`` —
  no second shuffle, no window, no UDF.

At 100 TB the shuffle carries only the step-filtered timestamps per
user (events not in any step are filtered before the exchange), and a
skewed power-user still only contributes its own timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_user_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Per-user first qualifying timestamp for each ordered funnel step.

    Returns one row per user with columns ``step0_ts .. step{k-1}_ts``;
    ``step_i_ts`` is the earliest step-i event at or after the user's
    chosen step-(i-1) timestamp (NULL once the chain breaks). With
    ``max_gap_seconds`` the step must also land within that many
    seconds of the previous step (the time-boxed funnel every product
    team actually runs) — the gap bound changes only the per-element
    filter predicate, not the one-shuffle shape.
    """
    per_user = (
        df.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            *[
                F.collect_list(
                    F.when(F.col(type_col) == s, F.col(ts_col))
                ).alias(f"_ts_{i}")
                for i, s in enumerate(steps)
            ]
        )
    )
    out = per_user
    for i in range(len(steps)):
        if i == 0:
            expr = F.array_min(F.col("_ts_0"))
        else:
            prev = F.col(f"step{i - 1}_ts")
            cond = (
                (lambda t: t >= prev)
                if max_gap_seconds is None
                else (
                    lambda t: (t >= prev)
                    & (
                        t.cast("long")
                        <= prev.cast("long") + max_gap_seconds
                    )
                )
            )
            expr = F.when(
                prev.isNotNull(),
                F.array_min(F.filter(F.col(f"_ts_{i}"), cond)),
            )
        out = out.withColumn(f"step{i}_ts", expr)
    return out.drop(*[f"_ts_{i}" for i in range(len(steps))])


def funnel_summary(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    round_to: int = 6,
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Funnel conversion table: one row per step with the users reached,
    conversion vs the first step, and conversion vs the previous step.

    The per-user frame reduces to ONE summary row (k counts), which is
    then unpivoted driver-free with ``stack`` — the whole funnel is a
    single job with a single exchange.
    """
    per_user = funnel_user_steps(
        df, steps, user_col, type_col, ts_col,
        max_gap_seconds=max_gap_seconds,
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"step{i}_ts")).alias(f"c{i}")
            for i in range(len(steps))
        ]
    )
    stack_args = []
    for i, s in enumerate(steps):
        c = F.col(f"c{i}")
        first = F.col("c0")
        prev = F.col(f"c{max(i - 1, 0)}")
        stack_args.append(
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                c.alias("users_reached"),
                F.round(
                    c.cast("double") / F.nullif(first, F.lit(0)), round_to
                ).alias("conv_from_first"),
                F.round(
                    c.cast("double") / F.nullif(prev, F.lit(0)), round_to
                ).alias("conv_from_prev"),
            )
        )
    return (
        counts.select(F.explode(F.array(*stack_args)).alias("r"))
        .select("r.*")
        .orderBy("step_idx")
    )
