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

    Shuffles once on the key; each group is a small pandas frame.
    """
    days = events.select(
        F.col(key), F.to_date(F.date_trunc("day", F.col(ts_col))).alias("d")
    ).distinct()

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ds = pd.to_datetime(pd.Series(sorted(pdf["d"].unique())))
        if ds.empty:
            return pd.DataFrame(
                columns=["user_id", "n_active_days", "longest_streak"]
            )
        gaps = ds.diff().dt.days.fillna(1).ne(1).cumsum()
        longest = int(gaps.value_counts().max())
        return pd.DataFrame(
            {
                "user_id": [pdf[key].iloc[0]],
                "n_active_days": [int(len(ds))],
                "longest_streak": [longest],
            }
        )

    return days.groupBy(key).applyInPandas(kernel, STREAK_SCHEMA)
