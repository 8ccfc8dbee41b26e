"""Grouped and scalar aggregates (SURVEY.md §2.4, A1-A4).

Implements the dwh daily-rollup semantics of
/root/reference/dbt/models/dwh/dw_daily_airport_metrics.sql:7-29 as a
generic daily key rollup, plus the scalar high-watermark aggregates
(A2/A3) used by every incremental model.

Scale notes: Spark's HashAggregate already does partial (map-side) +
final aggregation, so a groupBy over 100 TB shuffles only the per-key
partials — one row per (key, day) per map task — not the input. No skew
mitigation needed for date-bucketed keys; for pathological hot keys AQE
skew handling applies to the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_rollup(
    df: DataFrame,
    key: str,
    ts: str,
    measures: dict[str, Column],
    surrogate_name: str = "key_date",
) -> DataFrame:
    """Per-(key, day) aggregate with a ``<key>_YYYYMMDD`` surrogate key.

    Mirrors dw_daily_airport_metrics
    (/root/reference/dbt/models/dwh/dw_daily_airport_metrics.sql:7-22):
    GROUP BY key, date_trunc('day', ts) with AVG/MAX/MIN/COUNT measures
    and ``concat(key,'_',to_char(day,'YYYYMMDD'))`` (P11/P12).
    """
    day = F.to_date(F.date_trunc("day", F.col(ts)))
    out = (
        df.groupBy(F.col(key).alias(key), day.alias("observed_date"))
        .agg(*[expr.alias(name) for name, expr in measures.items()])
        .withColumn(
            surrogate_name,
            F.concat_ws(
                "_",
                F.col(key).cast("string"),
                F.date_format(F.col("observed_date"), "yyyyMMdd"),
            ),
        )
    )
    return out


def scalar_max(df: DataFrame, col: str, default=None):
    """Driver-side scalar MAX used as an incremental watermark literal.

    ≡ ``(SELECT COALESCE(MAX(observed), '<default>') FROM {{ this }})``
    (/root/reference/dbt/models/stg/stg_metar_observations.sql:15-18).
    The target table aggregate is tiny (one row), so collecting it to the
    driver is the same cost model as Postgres's uncorrelated scalar
    subquery — not a driver-side loop over data.
    """
    row = df.agg(F.max(F.col(col)).alias("mx")).first()
    v = row["mx"] if row is not None else None
    return default if v is None else v


def duplicate_keys(df: DataFrame, *keys: str) -> DataFrame:
    """Keys appearing more than once — dbt ``unique`` test shape (A4,
    /root/reference/dbt/models/stg/schema.yml:16)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
