"""Medallion pipeline end-to-end as one declarative query.

The reference's four dbt models chained (stg → ods → int → dwh,
/root/reference/dbt/models/*) over the `events` stand-in table: typed
projection → id sanitization → latest-per-key → daily rollup. Spark fuses
the whole chain into one plan (the intermediate "tables" are never
materialized), which is exactly what dbt+Postgres cannot do.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.aggregates import daily_rollup
from metar_pipeline_spark.operators.windows import latest_per_key_maxby
from metar_pipeline_spark.queries import register
from metar_pipeline_spark.queries.core import DEC2, _dsum


@register(
    "medallion_end_to_end",
    """
    WITH stg AS (
      SELECT CAST(event_id AS VARCHAR) AS id, ts AS observed, user_id,
             event_type, value,
             json_extract_string(props, '$.k') AS k_str
      FROM events
    ), ods AS (
      SELECT CASE WHEN regexp_matches(id, '^[0-9]+$')
                  THEN CAST(id AS INTEGER) ELSE NULL END AS id_int,
             observed, user_id, event_type, value
      FROM stg WHERE regexp_matches(id, '^[0-9]+$')
    ), int_latest AS (
      SELECT * FROM (
        SELECT ods.*,
               ROW_NUMBER() OVER (PARTITION BY user_id, CAST(date_trunc('day', observed) AS DATE)
                                  ORDER BY observed DESC, id_int DESC) AS rn
        FROM ods
      ) t WHERE rn = 1
    )
    SELECT concat_ws('_', CAST(user_id AS VARCHAR), strftime(observed_date, '%Y%m%d')) AS user_date,
           user_id, observed_date, last_value, last_event_type
    FROM (
      SELECT user_id, CAST(date_trunc('day', observed) AS DATE) AS observed_date,
             value AS last_value, event_type AS last_event_type
      FROM int_latest
    ) x
    """,
    doc="stg→ods→int→dwh chained in one fused plan (SURVEY §3.3); daily latest-value mart",
)
def medallion_end_to_end(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # stg: typed projection (stg_metar_observations.sql:22-40)
    stg = events.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("ts").alias("observed"),
        "user_id",
        "event_type",
        "value",
    )
    # ods: sanitize ids (ods_metar_latest.sql:13-23)
    is_num = F.col("id").rlike("^[0-9]+$")
    ods = stg.filter(is_num).withColumn(
        "id_int", F.when(is_num, F.col("id").cast("int"))
    ).drop("id")
    # int: latest per (key, day) (int_metar_latest.sql:9-17) — max_by form
    ods_day = ods.withColumn(
        "observed_date", F.to_date(F.date_trunc("day", F.col("observed")))
    )
    latest = latest_per_key_maxby(
        ods_day, ["user_id", "observed_date"], "observed", tiebreak="id_int"
    )
    # dwh: surrogate-keyed daily mart (dw_daily_airport_metrics.sql:7-22)
    return latest.select(
        F.concat_ws(
            "_",
            F.col("user_id").cast("string"),
            F.date_format("observed_date", "yyyyMMdd"),
        ).alias("user_date"),
        "user_id",
        "observed_date",
        F.col("value").alias("last_value"),
        F.col("event_type").alias("last_event_type"),
    )
