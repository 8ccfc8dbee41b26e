"""Arrow-batched Python function surface (SURVEY.md §2.9).

The reference has zero in-engine UDFs — its custom logic is plain
Python outside Postgres (/root/reference/src/collector/main.py:86-172).
Our engine keeps that rule (hot paths are JVM column expressions) but
ships the two Arrow shapes a real pipeline needs for genuinely
non-relational logic:

- scalar ``pandas_udf``: vectorized per-row kernels (numpy/pandas over
  Arrow batches, ~10-100x over row-at-a-time Python UDFs);
- grouped ``applyInPandas``: per-key sequential algorithms that SQL
  windows express poorly.

Each exhibit is chosen to be *exactly* reproducible in ANSI SQL so the
oracle harness can verify the Arrow path end-to-end (integer outputs,
no float folds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.IntegerType())
def ws_token_count(text: pd.Series) -> pd.Series:
    """Vectorized whitespace token count — semantically identical to
    size(filter(split(lower(s),'\\s+'), x -> x <> '')) so the JVM and
    Arrow paths are mutually checkable."""
    return (
        text.fillna("").str.lower().str.split().map(len).astype("int32")
    )


STREAK_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_active_days", T.IntegerType()),
        T.StructField("longest_streak", T.IntegerType()),
    ]
)


def longest_daily_streaks(
    events: DataFrame, key: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-key longest run of consecutive active days via
    ``applyInPandas`` — the grouped-map shape for sequential per-key
    algorithms (sessionization variants, trajectory features, per-user
    curricula) that would otherwise need several window passes.

    The heavy reduction happens JVM-side first: ONE shuffle with
    map-side partial ``collect_set`` folds the raw events down to one
    (key, sorted day-ordinal array) row per key, so the Arrow boundary
    moves |keys| tiny rows, not |events| raw rows — the shape that
    survives a 100 TB input. The Python kernel then runs pure numpy on
    each pre-aggregated group.
    """
    per_key = events.groupBy(F.col(key)).agg(
        F.sort_array(
            F.collect_set(
                F.datediff(
                    F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
                )
            )
        ).alias("ds")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.asarray(pdf["ds"].iloc[0], dtype=np.int64)
        if arr.size == 0:
            return pd.DataFrame(
                columns=["user_id", "n_active_days", "longest_streak"]
            )
        breaks = np.flatnonzero(np.diff(arr) != 1)
        seg_lengths = np.diff(
            np.concatenate(([-1], breaks, [arr.size - 1]))
        )
        return pd.DataFrame(
            {
                "user_id": [pdf[key].iloc[0]],
                "n_active_days": [int(arr.size)],
                "longest_streak": [int(seg_lengths.max())],
            }
        )

    return per_key.groupBy(key).applyInPandas(kernel, STREAK_SCHEMA)


def longest_daily_streaks_jvm(
    events: DataFrame, key: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Same result as :func:`longest_daily_streaks`, fully JVM-side.

    The run-length kernel is a single ``aggregate`` fold over the sorted
    day-ordinal array — (prev, current-run, best-run) carried in a
    struct accumulator — so no Arrow boundary is crossed at all. This is
    the production form: the grouped-map version above pays pandas +
    Arrow overhead per single-row group (~ms each; measured 6.15 s vs
    <2 s at sf0.1) purely for the privilege of running numpy on data a
    whole-stage-codegen expression folds for free.
    """
    per_key = events.groupBy(F.col(key)).agg(
        F.sort_array(
            F.collect_set(
                F.datediff(
                    F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date")
                )
            )
        ).alias("ds")
    )

    def merge(acc, d):
        cur = (
            F.when(d - acc["prev"] == F.lit(1), acc["cur"] + F.lit(1))
            .otherwise(F.lit(1))  # first element / gap (prev NULL → here)
        )
        return F.struct(
            d.alias("prev"),
            cur.alias("cur"),
            F.greatest(acc["best"], cur).alias("best"),
        )

    init = F.struct(
        F.lit(None).cast("int").alias("prev"),
        F.lit(0).alias("cur"),
        F.lit(0).alias("best"),
    )
    return per_key.select(
        F.col(key),
        F.size("ds").alias("n_active_days"),
        F.aggregate(F.col("ds"), init, merge, lambda acc: acc["best"]).alias(
            "longest_streak"
        ),
    )


@pandas_udf(T.DoubleType())
def iqr_agg(v: pd.Series) -> float:
    """GROUPED_AGG pandas_udf (the Arrow UDAF shape): exact
    interquartile range. numpy's default linear interpolation is the
    same quantile definition as Spark `percentile` / DuckDB
    `quantile_cont`, so the Arrow aggregate is oracle-checkable like
    any JVM aggregate.

    Scale note: GROUPED_AGG ships each group's full column to Python —
    right only when the kernel genuinely needs the whole group in
    memory; additive statistics belong in JVM partial aggs. This is the
    API exhibit for the former case."""
    arr = v.dropna().to_numpy()
    if arr.size == 0:
        return float("nan")
    hi, lo = np.percentile(arr, [75.0, 25.0])
    return float(round(hi - lo, 6))
