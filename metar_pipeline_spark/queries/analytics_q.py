"""Round-5 analytics suite: funnels, trend fitting, gap-fill, CDC,
graph ranking — the product-analytics layer a deployment builds on the
reference's event/observation model (SURVEY.md §1.4).

Scale notes per query are on the operators
(operators/funnel.py, operators/regression.py, operators/graph.py,
sources/cdc.py); each query here is a thin composition plus its
cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.queries import register
from metar_pipeline_spark.queries.core import DEC10, _dsum

# Seconds at 2024-01-01T00:00:00Z — the testdata epoch; x-axis origin
# for trend fits so the intercept is numerically tame.
_T0 = 1704067200

# ---------------------------------------------------------------------------
# Ordered funnel (view → click → purchase)
# ---------------------------------------------------------------------------


@register(
    "funnel_view_click_purchase",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    c AS (
      SELECT (SELECT COUNT(*) FROM s1) AS c0,
             (SELECT COUNT(*) FROM s2) AS c1,
             (SELECT COUNT(*) FROM s3) AS c2
    )
    SELECT * FROM (
      SELECT 0 AS step_idx, 'view' AS step, c0 AS users_reached,
             round(CAST(c0 AS DOUBLE) / NULLIF(c0, 0), 6) AS conv_from_first,
             round(CAST(c0 AS DOUBLE) / NULLIF(c0, 0), 6) AS conv_from_prev
      FROM c
      UNION ALL
      SELECT 1, 'click', c1,
             round(CAST(c1 AS DOUBLE) / NULLIF(c0, 0), 6),
             round(CAST(c1 AS DOUBLE) / NULLIF(c0, 0), 6) FROM c
      UNION ALL
      SELECT 2, 'purchase', c2,
             round(CAST(c2 AS DOUBLE) / NULLIF(c0, 0), 6),
             round(CAST(c2 AS DOUBLE) / NULLIF(c1, 0), 6) FROM c
    ) ORDER BY step_idx
    """,
    doc=(
        "Ordered 3-step funnel in ONE aggregation pass (per-user step "
        "timestamp lists + higher-order min-filter chain) vs the "
        "oracle's k-self-join formulation — the shape that keeps a "
        "funnel at one shuffle instead of k at 100 TB"
    ),
)
def funnel_view_click_purchase(spark, sf_dir):
    from metar_pipeline_spark.operators.funnel import funnel_summary

    events = load_table(spark, sf_dir, "events")
    return funnel_summary(events, ["view", "click", "purchase"])


# ---------------------------------------------------------------------------
# Grouped OLS trend (distributed-moments fit)
# ---------------------------------------------------------------------------


@register(
    "ols_trend_by_event_type",
    f"""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * value AS DECIMAL(38,10))) AS DOUBLE) AS sxy
      FROM (
        SELECT event_type, value,
               CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_T0} AS DOUBLE) AS x
        FROM events
      ) GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s ORDER BY event_type
    """,
    doc=(
        "Per-type least-squares trend of value over time via exact "
        "DECIMAL power sums (operators/regression.py) — one partial+"
        "final agg pass, six numbers per group across the wire, "
        "partition-order deterministic"
    ),
)
def ols_trend_by_event_type(spark, sf_dir):
    from metar_pipeline_spark.operators.regression import grouped_ols

    events = load_table(spark, sf_dir, "events")
    x = (F.col("ts").cast("timestamp").cast("long") - F.lit(_T0)).cast(
        "double"
    )
    return grouped_ols(
        events, ["event_type"], x, F.col("value")
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Linear-interpolation gap-fill over a per-key date spine
# ---------------------------------------------------------------------------


@register(
    "interpolate_daily_gaps",
    """
    WITH t AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                   / COUNT(*), 6) AS v
      FROM events WHERE event_id % 11 = 0
      GROUP BY 1, 2
    ),
    b AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM t GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             CAST(unnest(generate_series(
               CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
               INTERVAL 1 DAY)) AS DATE) AS day
      FROM b
    ),
    j AS (
      SELECT s.event_type, s.day, t.v
      FROM spine s LEFT JOIN t USING (event_type, day)
    ),
    w AS (
      SELECT *,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT event_type, day,
           CASE WHEN v IS NOT NULL THEN v
                ELSE round(pv + (nv - pv) * date_diff('day', pd, day)
                           / date_diff('day', pd, nd), 6)
           END AS value_filled,
           (v IS NULL) AS is_interpolated
    FROM w
    """,
    doc=(
        "Per-type daily series (deterministically thinned to create "
        "gaps) completed over a sequence() date spine with linear "
        "interpolation between the neighboring known points — spine "
        "generation is a narrow generator (no shuffle), both IGNORE "
        "NULLS windows share one exchange on event_type, and at 100 TB "
        "the window partitions are calendar-bounded (days per key), "
        "never event-bounded"
    ),
)
def interpolate_daily_gaps(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    t = (
        events.filter(F.col("event_id") % 11 == 0)
        .groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
        )
        .agg(
            F.round(
                _dsum(F.col("value"), DEC10) / F.count(F.lit(1)), 6
            ).alias("v")
        )
    )
    bounds = t.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    j = spine.join(t, ["event_type", "day"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_day = F.when(F.col("v").isNotNull(), F.col("day"))
    w = j.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(known_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(known_day, ignorenulls=True).over(wn).alias("nd"),
    )
    interpolated = F.round(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * F.datediff(F.col("day"), F.col("pd"))
        / F.datediff(F.col("nd"), F.col("pd")),
        6,
    )
    return w.select(
        "event_type",
        "day",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(interpolated)
        .alias("value_filled"),
        F.col("v").isNull().alias("is_interpolated"),
    )
