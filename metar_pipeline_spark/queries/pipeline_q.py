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


_SCD2_FULL_ORACLE = """
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             CASE WHEN LAG(o_orderstatus) OVER w IS NULL
                    OR o_orderstatus <> LAG(o_orderstatus) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered
    ),
    collapsed AS (
      SELECT o_custkey, run_id,
             MIN(o_orderstatus) AS o_orderstatus,
             MIN(o_orderdate) AS valid_from
      FROM runs GROUP BY o_custkey, run_id
    )
    SELECT o_custkey, o_orderstatus, valid_from,
           LEAD(valid_from) OVER wl AS valid_to,
           LEAD(valid_from) OVER wl IS NULL AS is_current
    FROM collapsed
    WINDOW wl AS (PARTITION BY o_custkey ORDER BY run_id)
"""


@register(
    "scd2_order_status_history",
    _SCD2_FULL_ORACLE,
    doc=(
        "SCD Type 2 batch build: each customer's order-status change "
        "log collapsed into [valid_from, valid_to) validity intervals "
        "with an is_current flag — the Type 2 companion to the "
        "reference's Type 1 latest-per-key mart "
        "(int_metar_latest.sql:13-23). Pure per-key window math, "
        "hash-partitioned on the key."
    ),
)
def scd2_order_status_history(spark, sf_dir):
    from metar_pipeline_spark.operators.scd import scd2_from_changes

    orders = load_table(spark, sf_dir, "orders")
    return scd2_from_changes(
        orders, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )


@register(
    "scd2_incremental_apply",
    _SCD2_FULL_ORACLE,
    doc=(
        "SCD Type 2 incremental merge: the dimension is built from "
        "history (< 1998-07-01), then one micro-batch of newer changes "
        "is applied with scd2_apply — open intervals replayed, closed "
        "history untouched, keys absent from the batch passed through "
        "whole. The oracle is the FULL rebuild over the combined log: "
        "the incremental path must be indistinguishable from it "
        "(SURVEY.md §2.7's incremental == full-refresh contract, "
        "extended to Type 2)."
    ),
)
def scd2_incremental_apply(spark, sf_dir):
    from metar_pipeline_spark.operators.scd import (
        scd2_apply,
        scd2_from_changes,
    )

    orders = load_table(spark, sf_dir, "orders")
    split = F.lit("1998-07-01").cast("timestamp")
    hist = orders.filter(F.col("o_orderdate") < split)
    batch = orders.filter(F.col("o_orderdate") >= split)
    dim = scd2_from_changes(
        hist, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    return scd2_apply(
        dim, batch, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )


@register(
    "scd2_asof_lookup",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             CASE WHEN LAG(o_orderstatus) OVER w IS NULL
                    OR o_orderstatus <> LAG(o_orderstatus) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM ordered
    ),
    collapsed AS (
      SELECT o_custkey, run_id,
             MIN(o_orderstatus) AS o_orderstatus,
             MIN(o_orderdate) AS valid_from
      FROM runs GROUP BY o_custkey, run_id
    ),
    dim AS (
      SELECT o_custkey, o_orderstatus, valid_from,
             LEAD(valid_from) OVER wl AS valid_to
      FROM collapsed
      WINDOW wl AS (PARTITION BY o_custkey ORDER BY run_id)
    )
    SELECT o_custkey, o_orderstatus, valid_from
    FROM dim
    WHERE valid_from <= TIMESTAMP '1998-01-01'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '1998-01-01')
    """,
    doc=(
        "SCD2 point-in-time read — the query shape Type 2 history "
        "exists for: each customer's status AS OF 1998-01-01 via the "
        "half-open interval predicate valid_from <= t < valid_to. At "
        "100 TB this is a partition-prunable filter on the dimension "
        "store, not a join or a window."
    ),
)
def scd2_asof_lookup(spark, sf_dir):
    from metar_pipeline_spark.operators.scd import scd2_from_changes

    orders = load_table(spark, sf_dir, "orders")
    dim = scd2_from_changes(
        orders, "o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey"
    )
    t = F.lit("1998-01-01").cast("timestamp")
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("o_custkey", "o_orderstatus", "valid_from")


@register(
    "tombstone_delete_audit",
    """
    WITH tombstones AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 13
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purged,
           CAST(SUM(CASE WHEN t.user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(COUNT(DISTINCT CASE WHEN t.user_id IS NOT NULL
                                    THEN e.user_id END) AS BIGINT)
               AS n_users_purged,
           round(SUM(CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS purge_rate
    FROM events e LEFT JOIN tombstones t USING (user_id)
    GROUP BY e.event_type
    """,
    doc=(
        "GDPR/right-to-be-forgotten tombstone audit: a deletion-"
        "request dimension (stand-in: user_id % 97 = 13; in production "
        "a requests table) broadcast-left-joined onto the fact ONCE, "
        "with purged/retained/affected-user counts per event_type from "
        "a single conditional agg — the pre-delete impact report. The "
        "actual purge is the same broadcast join flipped to anti "
        "(tombstone_purge operator), feeding the partition rewriter "
        "(dynamic_partition_backfill); zero-leak invariant pinned in "
        "tests/test_analytics.py."
    ),
)
def tombstone_delete_audit(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    tombstones = (
        events.filter(F.col("user_id") % 97 == 13)
        .select("user_id")
        .distinct()
        .withColumn("_ts", F.lit(1))
    )
    purged = F.col("_ts").isNotNull()
    return (
        events.join(F.broadcast(tombstones), "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(purged, 1).otherwise(0))
            .cast("bigint")
            .alias("n_purged"),
            F.sum(F.when(~purged, 1).otherwise(0))
            .cast("bigint")
            .alias("n_retained"),
            F.count_distinct(F.when(purged, F.col("user_id")))
            .cast("bigint")
            .alias("n_users_purged"),
            F.round(
                F.sum(F.when(purged, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("purge_rate"),
        )
    )


def tombstone_purge(events, tombstones):
    """The delete itself: broadcast LEFT ANTI join — every surviving
    row provably has no tombstoned key. Deletion requests are
    dimension-sized (thousands) against a 100 TB fact, so the purge is
    a map-side hash probe with NO shuffle of the fact; pair with
    dynamic_partition_backfill to rewrite only partitions that lost
    rows."""
    return events.join(
        F.broadcast(tombstones.select("user_id").distinct()),
        "user_id",
        "left_anti",
    )
