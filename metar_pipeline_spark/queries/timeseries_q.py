"""Time-windowed / sampling / moment-statistics queries.

The reference's only time bucketing is ``date_trunc('day', observed)``
(/root/reference/dbt/models/dwh/dw_daily_airport_metrics.sql:11) and its
only cadence a 30-minute micro-batch
(/root/reference/infra/airflow/dags/metar_pipeline_dag.py:18). A complete
engine needs the full event-time windowing surface a stream table gets in
production — tumbling/sliding windows (`F.window`), session windows
(`F.session_window`), interval/range joins, deterministic sampling, and
exact distributed moments. Each query here is the batch form (oracle-
checkable); the streaming forms reuse the identical expressions under
``withWatermark`` (see streaming/pipeline.py).

Scale notes:
- `F.window` / `F.session_window` are native Catalyst operators: the
  sliding-window expansion happens JVM-side inside codegen (no UDF, no
  explode of the raw fact), and the downstream agg is a plain partial+
  final hash aggregate on (window, key) — linear, shuffle-once.
- The range join avoids the |events| x |intervals| cross product by
  equi-joining on an hour bucket first (bucket count = interval length /
  granularity), which at 100 TB turns a nested-loop into a hash join.
- Sampling uses a multiplicative integer hash of the key — identical
  arithmetic on any engine, no RNG, so the sample is reproducible
  across runs, engines, and partitionings (the property training-data
  pipelines need for held-out splits).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.queries import register
from metar_pipeline_spark.queries.core import DEC2, _dsum

# ---------------------------------------------------------------------------
# Sliding window aggregation — F.window(ts, window, slide)
# ---------------------------------------------------------------------------


@register(
    "sliding_window_event_stats",
    """
    WITH assigned AS (
      SELECT TIMESTAMP '1970-01-01'
               + (CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                  - k * 1800) * INTERVAL 1 SECOND AS window_start,
             event_type, value
      FROM events CROSS JOIN (VALUES (0), (1)) t(k)
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM assigned
    GROUP BY 1, 2, 3
    """,
    doc=(
        "1-hour windows sliding every 30 min per event_type via native "
        "F.window (each row lands in exactly window/slide = 2 buckets; "
        "expansion is JVM-side, agg is one shuffle on (window, type))"
    ),
)
def sliding_window_event_stats(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(_dsum(F.col("value"), DEC2), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Session windows — F.session_window(ts, gap)
# ---------------------------------------------------------------------------


@register(
    "session_window_stats",
    """
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTES AS session_end,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc=(
        "Per-user session windows (30-min inactivity gap) via native "
        "F.session_window — Spark merges overlapping [ts, ts+gap) spans "
        "in a single stateful operator; oracle is the classic lag-based "
        "gaps-and-islands formulation. Session end = last event + gap "
        "(half-open), so an event exactly at expiry opens a new session "
        "on both engines."
    ),
)
def session_window_stats(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(_dsum(F.col("value"), DEC2), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Bucketed range (interval) join
# ---------------------------------------------------------------------------


@register(
    "range_join_event_windows",
    """
    WITH busy AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS n
      FROM events GROUP BY 1
      ORDER BY n DESC, d LIMIT 5
    ),
    iv AS (
      SELECT CAST(d AS TIMESTAMP) + INTERVAL 6 HOUR AS ws,
             CAST(d AS TIMESTAMP) + INTERVAL 18 HOUR AS we
      FROM busy
    )
    SELECT iv.ws AS window_start, iv.we AS window_end,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM iv JOIN events e ON e.ts >= iv.ws AND e.ts < iv.we
    GROUP BY 1, 2
    """,
    doc=(
        "Interval join: events vs the busiest-5-days' 06:00-18:00 windows. "
        "Implemented as a bucketed range join (intervals exploded to hour "
        "buckets, equi-join on the bucket, exact containment refilter) — "
        "the pattern that keeps interval joins hash-based at 100 TB "
        "instead of a nested-loop theta join."
    ),
)
def range_join_event_windows(spark, sf_dir):
    from metar_pipeline_spark.operators.joins import bucketed_range_join

    events = load_table(spark, sf_dir, "events")
    busy = (
        events.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("d"))
        .limit(5)
    )
    intervals = busy.select(
        (F.col("d").cast("timestamp") + F.expr("INTERVAL 6 HOURS")).alias("ws"),
        (F.col("d").cast("timestamp") + F.expr("INTERVAL 18 HOURS")).alias("we"),
    )
    joined = bucketed_range_join(
        events, "ts", intervals, "ws", "we", granularity="1 hour"
    )
    return (
        joined.groupBy("ws", "we")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(_dsum(F.col("value"), DEC2), 2).alias("sum_value"),
        )
        .select(
            F.col("ws").alias("window_start"),
            F.col("we").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Exact distributed moments (variance / stddev / correlation)
# ---------------------------------------------------------------------------


@register(
    "stats_moments_exact",
    """
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(CAST(length(props) AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(length(props) AS DOUBLE) * CAST(length(props) AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(value * CAST(length(props) AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round(sx / n, 6) AS mean_value,
           round((sxx - sx * sx / n) / (n - 1), 6) AS var_value,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_value,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_value_proplen
    FROM s
    """,
    doc=(
        "Per-type mean/variance/stddev and corr(value, length(props)) from "
        "exact DECIMAL power sums — the distributed-moments pattern: one "
        "partial+final agg pass, deterministic under any partition order "
        "(unlike naive float corr/var whose accumulation order drifts)"
    ),
)
def stats_moments_exact(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    y = F.length("props").cast("double")
    dec = "decimal(38,10)"

    def dsum(col):
        return F.sum(col.cast(dec)).cast("double")

    s = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value")).alias("sx"),
        dsum(y).alias("sy"),
        dsum(F.col("value") * F.col("value")).alias("sxx"),
        dsum(y * y).alias("syy"),
        dsum(F.col("value") * y).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col("n"),
        F.col("sx"),
        F.col("sy"),
        F.col("sxx"),
        F.col("syy"),
        F.col("sxy"),
    )
    return s.select(
        "event_type",
        "n",
        F.round(sx / n, 6).alias("mean_value"),
        F.round((sxx - sx * sx / n) / (n - 1), 6).alias("var_value"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_value"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr_value_proplen"),
    )


# ---------------------------------------------------------------------------
# Deterministic (stratified) sampling
# ---------------------------------------------------------------------------

# Knuth's multiplicative hash: engine-agnostic integer arithmetic, so the
# same rows are sampled on Spark, DuckDB, or any SQL engine — unlike
# rand(seed)/TABLESAMPLE whose streams are engine-private.
_SAMPLE_HASH_SQL = "(event_id * 2654435761) % 4294967296"


@register(
    "deterministic_stratified_sample",
    f"""
    WITH sampled AS (
      SELECT event_type, value
      FROM events
      WHERE ({_SAMPLE_HASH_SQL}) % 100 <
            CASE event_type WHEN 'purchase' THEN 50
                            WHEN 'click' THEN 5
                            ELSE 10 END
    )
    SELECT event_type,
           COUNT(*) AS n_sampled,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
    FROM sampled
    GROUP BY event_type
    """,
    doc=(
        "Stratified deterministic sample (50% purchases, 5% clicks, 10% "
        "rest) via a multiplicative key hash — reproducible across "
        "engines/partitionings/runs; the predicate is a pure scan-side "
        "filter (no shuffle, no RNG state), so at 100 TB sampling cost "
        "is one pushed-down scan"
    ),
)
def deterministic_stratified_sample(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    bucket = (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296) % 100
    frac = (
        F.when(F.col("event_type") == "purchase", 50)
        .when(F.col("event_type") == "click", 5)
        .otherwise(10)
    )
    return (
        events.filter(bucket < frac)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(_dsum(F.col("value"), DEC2), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram
# ---------------------------------------------------------------------------


@register(
    "value_histogram",
    """
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
           round(CAST(floor(value / 25.0) AS BIGINT) * 25.0, 2) AS bin_start,
           COUNT(*) AS n,
           round(MIN(value), 2) AS bin_min,
           round(MAX(value), 2) AS bin_max
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "Fixed-width (25.0) histogram of event values: one partial+final "
        "hash agg on a computed bin key — the O(n) single-pass shape; bin "
        "arithmetic (floor of a double division) is IEEE-identical across "
        "engines, unlike width_bucket variants with engine-private edge "
        "rules"
    ),
)
def value_histogram(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / 25.0).cast("bigint")
    return (
        events.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("bin_min"),
            F.round(F.max("value"), 2).alias("bin_max"),
        )
        .select(
            "bin",
            F.round(F.col("bin") * 25.0, 2).alias("bin_start"),
            "n",
            "bin_min",
            "bin_max",
        )
    )


@register(
    "similar_value_series_topk",
    """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), q AS (
      SELECT day, v AS qv FROM daily WHERE user_id = 7
    ), j AS (
      SELECT d.user_id, d.v, q.qv
      FROM daily d JOIN q USING (day) WHERE d.user_id <> 7
    ), s AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(v AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(sum(CAST(qv AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(sum(CAST(v * v AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(qv * qv AS DECIMAL(38,10))) AS DOUBLE) AS syy,
             CAST(sum(CAST(v * qv AS DECIMAL(38,10))) AS DOUBLE) AS sxy
      FROM j GROUP BY 1
    )
    SELECT user_id, n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                 6) AS corr_with_query
    FROM s
    WHERE n >= 5 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    ORDER BY corr_with_query DESC, user_id LIMIT 10
    """,
    doc=(
        "Time-series similarity search: top-10 users whose daily value "
        "series Pearson-correlates with user 7's. The query series "
        "broadcasts to every executor; per-user moments are one "
        "partial+final decimal agg — a full-corpus similarity scan with "
        "one shuffle, the streaming-similarity pattern from the EDBT'19 "
        "line of work expressed relationally."
    ),
)
def similar_value_series_topk(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"

    def dsum(col):
        return F.sum(col.cast(dec)).cast("double")

    daily = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(dsum(F.col("value")).alias("v"))
    q = daily.filter(F.col("user_id") == 7).select(
        "day", F.col("v").alias("qv")
    )
    j = daily.filter(F.col("user_id") != 7).join(F.broadcast(q), "day")
    s = j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("v")).alias("sx"),
        dsum(F.col("qv")).alias("sy"),
        dsum(F.col("v") * F.col("v")).alias("sxx"),
        dsum(F.col("qv") * F.col("qv")).alias("syy"),
        dsum(F.col("v") * F.col("qv")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    return (
        s.filter(
            (n >= 5) & (n * sxx - sx * sx > 0) & (n * syy - sy * sy > 0)
        )
        .select(
            "user_id",
            "n",
            F.round(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            ).alias("corr_with_query"),
        )
        .orderBy(F.desc("corr_with_query"), "user_id")
        .limit(10)
    )


@register(
    "anomaly_daily_event_spikes",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), scored AS (
      SELECT day, n,
             avg(n) OVER w AS mu,
             stddev_samp(n) OVER w AS sd,
             count(*) OVER w AS n_window
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, n,
           round(mu, 6) AS trailing_mean,
           round(CASE WHEN sd > 0 THEN (n - mu) / sd END, 6) AS z_score,
           CASE WHEN sd > 0
                THEN abs(round((n - mu) / sd, 6)) > 2.0 ELSE FALSE END
               AS is_spike
    FROM scored
    WHERE n_window >= 3
    """,
    doc=(
        "Anomaly detection over the event stream's daily volume: "
        "trailing-7-day mean/stddev window, z-score and spike flag — "
        "the Q6 monitor as an analytic query (counts are exact ints, "
        "so the float math is order-independent and engine-identical)"
    ),
)
def anomaly_daily_event_spikes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Global (unpartitioned) window is safe HERE: its input is the
    # DAILY aggregate, whose cardinality is bounded by the calendar
    # (~365 rows/year at any data scale), not by event volume. The
    # single-partition sort the plan shows is over that tiny frame.
    w = Window.orderBy("day").rowsBetween(-7, -1)
    scored = daily.select(
        "day",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return scored.filter(F.col("n_window") >= 3).select(
        "day",
        "n",
        F.round("mu", 6).alias("trailing_mean"),
        F.round(F.when(F.col("sd") > 0, z), 6).alias("z_score"),
        # compare on the ROUNDED z: a 1-ulp stddev difference between
        # engines must not flip the boundary boolean
        F.coalesce(
            F.when(F.col("sd") > 0, F.abs(F.round(z, 6)) > 2.0),
            F.lit(False),
        ).alias("is_spike"),
    )


@register(
    "ewma_user_value",
    """
    SELECT user_id,
           CAST(len(vals) AS INTEGER) AS n_events,
           round(list_reduce(vals, (acc, x) -> 0.2 * x + 0.8 * acc), 6)
               AS ewma_value
    FROM (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events GROUP BY user_id
    )
    """,
    doc=(
        "Exponentially weighted moving average per user (alpha=0.2): "
        "the recurrence is a sequential JVM aggregate fold over the "
        "time-ordered value array — one shuffle to group, zero Python, "
        "zero window-function state; per-key arrays are bounded by "
        "per-user history (the same bounded-fold contract as "
        "longest_daily_streak). Both engines fold left-to-right from "
        "the first observation, so the chained float arithmetic is "
        "bit-identical."
    ),
)
def ewma_user_value(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    grouped = events.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ),
            lambda s: s["value"],
        ).alias("vals")
    )
    ewma = F.aggregate(
        F.expr("slice(vals, 2, greatest(size(vals) - 1, 0))"),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
    )
    return grouped.select(
        "user_id",
        F.size("vals").alias("n_events"),
        F.round(ewma, 6).alias("ewma_value"),
    )


@register(
    "cohort_retention_matrix",
    """
    WITH f AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
      FROM events
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.active_day) AS INTEGER)
               AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    doc=(
        "Cohort retention matrix: users bucketed by first-seen day, "
        "counted per activity-day offset. Two partial aggregations "
        "(first-seen per user, distinct user-days) meet in a join "
        "keyed on user — the per-user reduction happens BEFORE the "
        "join on both sides, so the fact table never joins at event "
        "grain."
    ),
)
def cohort_retention_matrix(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    days = events.select("user_id", F.to_date("ts").alias("active_day"))
    first = days.groupBy("user_id").agg(
        F.min("active_day").alias("cohort_day")
    )
    active = days.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day")
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "holt_linear_forecast",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                 AS y
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type, list(y ORDER BY day) AS vals
      FROM daily GROUP BY event_type
    ), fitted AS (
      SELECT event_type, CAST(len(vals) AS INTEGER) AS n_days,
             CASE WHEN len(vals) >= 2 THEN
               list_reduce(
                 [[vals[2], vals[2] - vals[1]]]
                   || list_transform(vals[3:], v -> [v, 0.0]),
                 (acc, x) -> [
                   0.3 * x[1] + 0.7 * (acc[1] + acc[2]),
                   0.1 * ((0.3 * x[1] + 0.7 * (acc[1] + acc[2])) - acc[1])
                     + 0.9 * acc[2]
                 ])
             END AS st
      FROM series
    )
    SELECT event_type, n_days,
           round(st[1], 6) AS level,
           round(st[2], 6) AS trend,
           round(st[1] + 7 * st[2], 6) AS forecast_7d
    FROM fitted
    """,
    doc=(
        "Holt double-exponential smoothing per event type "
        "(alpha=0.3, beta=0.1) over the daily-sum series, with the "
        "7-step-ahead linear forecast — the (level, trend) state rides "
        "the same sequential JVM aggregate fold as ewma_user_value "
        "(one shuffle to group, zero Python); both engines fold "
        "left-to-right so the chained float recurrence is bit-identical"
    ),
)
def holt_linear_forecast(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(_dsum(F.col("value"), DEC2), 2).alias("y"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "y"))),
            lambda s: s["y"],
        ).alias("vals")
    )
    y1 = F.element_at(F.col("vals"), 1)
    y2 = F.element_at(F.col("vals"), 2)
    # state at t=2: level = y2, trend = first difference (standard Holt
    # init; an l=y1 init lags the level one step behind forever)
    init = F.struct(y2.alias("l"), (y2 - y1).alias("b"))
    rest = F.expr("slice(vals, 3, greatest(size(vals) - 2, 0))")

    def step(acc, x):
        # l_new duplicated textually in the trend term — the oracle
        # does the same, so both engines evaluate the identical float
        # expression (no CSE on either side changes the bits)
        l_new = F.lit(0.3) * x + F.lit(0.7) * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (
                F.lit(0.1) * (l_new - acc["l"]) + F.lit(0.9) * acc["b"]
            ).alias("b"),
        )

    st = F.when(
        F.size("vals") >= 2, F.aggregate(rest, init, step)
    )
    return series.select(
        "event_type",
        F.size("vals").alias("n_days"),
        F.round(st["l"], 6).alias("level"),
        F.round(st["b"], 6).alias("trend"),
        F.round(st["l"] + F.lit(7) * st["b"], 6).alias("forecast_7d"),
    )


@register(
    "time_weighted_avg_user_value",
    """
    WITH d AS (
      SELECT user_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             LEAD(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS t_next
      FROM events
    ), w AS (
      SELECT user_id, value, (t_next - t) AS dt
      FROM d WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS INTEGER) AS n_intervals,
           CAST(SUM(dt) AS BIGINT) AS covered_seconds,
           round(CAST(SUM(CAST(value * dt AS DECIMAL(38,10))) AS DOUBLE)
                 / CAST(SUM(CAST(dt AS DECIMAL(38,10))) AS DOUBLE), 6)
               AS twa_value
    FROM w GROUP BY user_id
    HAVING SUM(dt) > 0
    """,
    doc=(
        "Time-weighted average per user (each observation weighted by "
        "its hold time until the next one — the TSDB time_weight "
        "aggregate; an unweighted mean over-counts burst periods): "
        "one LEAD window sharing the per-user exchange, then exact "
        "DECIMAL weighted sums. Zero-duration-only users drop (no "
        "covered time)."
    ),
)
def time_weighted_avg_user_value(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.col("ts").cast("timestamp").cast("long")
    d = events.select(
        "user_id",
        "value",
        t.alias("t"),
        F.lead(t).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    dt = F.col("t_next") - F.col("t")
    return (
        d.select("user_id", "value", dt.alias("dt"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_intervals"),
            F.sum("dt").cast("bigint").alias("covered_seconds"),
            F.round(
                F.sum((F.col("value") * F.col("dt")).cast(dec)).cast(
                    "double"
                )
                / F.sum(F.col("dt").cast(dec)).cast("double"),
                6,
            ).alias("twa_value"),
        )
        .filter(F.col("covered_seconds") > 0)
    )


@register(
    "benford_first_digit_audit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(abs(value) AS DECIMAL(18,6)) AS VARCHAR),
                  CASE WHEN abs(value) < 1 THEN 3 ELSE 1 END, 1) AS INTEGER)
                 AS digit
      FROM events WHERE abs(value) >= 0.000001
    ), f AS (
      SELECT digit, COUNT(*) AS n FROM d
      WHERE digit BETWEEN 1 AND 9 GROUP BY digit
    ), t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM f)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           round(n / total, 6) AS observed_freq,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_freq,
           round(n / total - log10(1.0 + 1.0 / digit), 6) AS deviation
    FROM f, t ORDER BY digit
    """,
    doc=(
        "Benford's-law first-significant-digit audit of the value "
        "column: observed vs expected log10(1+1/d) frequencies with "
        "per-digit deviation — the classic synthetic-data / "
        "fabricated-metric detector, one agg over the scan. Digits "
        "are extracted from the DECIMAL(18,6) string form so both "
        "engines see identical renderings (no double formatting "
        "drift). |value| < 1e-6 has no significant digit and drops; "
        "values in [1e-6, 0.1) read a leading zero and drop too — "
        "the audit covers magnitudes >= 0.1, plenty for a "
        "metric-fabrication screen and exactly mirrored on both "
        "engines."
    ),
)
def benford_first_digit_audit(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    absval = F.abs(F.col("value"))
    s = absval.cast("decimal(18,6)").cast("string")
    digit = F.substring(
        s, F.when(absval < 1, 3).otherwise(1), 1
    ).cast("int")
    d = (
        events.filter(absval >= 0.000001)
        .select(digit.alias("digit"))
        .filter(F.col("digit").between(1, 9))
    )
    f = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = f.agg(F.sum("n").cast("double").alias("total"))
    benford = F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6)
    return (
        f.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("total"), 6).alias("observed_freq"),
            benford.alias("benford_freq"),
            F.round(
                F.col("n") / F.col("total")
                - F.log10(1.0 + 1.0 / F.col("digit")),
                6,
            ).alias("deviation"),
        )
    )


@register(
    "interval_coverage_islands",
    """
    WITH iv AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 60 + (event_id % 600) AS e,
             event_id
      FROM events
    ), flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > coalesce(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), -9223372036854775808)
                  THEN 1 ELSE 0 END AS brk,
             event_id
      FROM iv
    ), isl AS (
      SELECT user_id, s, e,
             SUM(brk) OVER (
               PARTITION BY user_id ORDER BY s, event_id
             ) AS island_id
      FROM flagged
    )
    SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
           MIN(s) AS island_start,
           MAX(e) AS island_end,
           CAST(COUNT(*) AS INTEGER) AS n_intervals,
           CAST(MAX(e) - MIN(s) AS BIGINT) AS covered_seconds
    FROM isl GROUP BY user_id, island_id
    """,
    doc=(
        "Gaps-and-islands over INTERVALS (not points — sessionize's "
        "sibling): merge overlapping/touching per-user validity "
        "intervals into coverage islands via the running-max-end "
        "break flag + cumulative island id; both windows share ONE "
        "per-user exchange. Interval = [ts, ts + 60 + event_id%600 s] "
        "(deterministic synthetic duration; the corpus has no native "
        "interval column)."
    ),
)
def interval_coverage_islands(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    t = F.col("ts").cast("timestamp").cast("long")
    iv = events.select(
        "user_id",
        t.alias("s"),
        (t + 60 + (F.col("event_id") % 600)).alias("e"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        F.col("s")
        > F.coalesce(prev_max_end, F.lit(-(2**63))),
        F.lit(1),
    ).otherwise(F.lit(0))
    isl = iv.withColumn("brk", brk).withColumn(
        "island_id", F.sum("brk").over(w)
    )
    return isl.groupBy("user_id", "island_id").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count(F.lit(1)).cast("int").alias("n_intervals"),
        (F.max("e") - F.min("s")).cast("bigint").alias("covered_seconds"),
    )


@register(
    "psi_value_drift",
    """
    WITH b AS (
      SELECT CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       < (SELECT (CAST(floor(epoch(MIN(ts))) AS BIGINT)
                                  + CAST(floor(epoch(MAX(ts))) AS BIGINT)) // 2
                          FROM events)
                  THEN 'ref' ELSE 'cur' END AS period,
             least(greatest(CAST(floor(value / 100.0) AS INTEGER), 0), 9)
                 AS bin
      FROM events
    ), c AS (
      SELECT period, bin, COUNT(*) AS n FROM b GROUP BY 1, 2
    ), t AS (
      SELECT period, CAST(SUM(n) AS DOUBLE) AS total FROM c GROUP BY 1
    ), p AS (
      SELECT bin,
             round(coalesce(MAX(CASE WHEN period = 'ref' THEN n END), 0)
                   / (SELECT total FROM t WHERE period = 'ref') + 0.0001, 6)
                 AS p_ref,
             round(coalesce(MAX(CASE WHEN period = 'cur' THEN n END), 0)
                   / (SELECT total FROM t WHERE period = 'cur') + 0.0001, 6)
                 AS p_cur
      FROM c GROUP BY bin
    )
    SELECT bin, p_ref, p_cur,
           round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
    FROM p ORDER BY bin
    """,
    doc=(
        "Population-stability-index drift audit: the value "
        "distribution of the later half of the stream vs the earlier "
        "half over 10 fixed bins, with the per-bin PSI contribution "
        "(sum > 0.2 = actionable drift, the standard ML-ops rule). "
        "Laplace-style +1e-4 smoothing keeps empty bins finite and is "
        "applied AFTER the 6-dp rounding on both engines so the log "
        "ratio is bit-identical. One count aggregate per period over "
        "the scan; the split point is a one-row MIN/MAX aggregate, "
        "broadcast."
    ),
)
def psi_value_drift(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    # split point in INTEGER epoch seconds (floor-div) — interval
    # halving differs between engines, integer math cannot
    span = events.agg(
        F.floor(
            (
                F.min(F.col("ts").cast("timestamp").cast("long"))
                + F.max(F.col("ts").cast("timestamp").cast("long"))
            )
            / 2
        ).alias("_mid")
    )
    b = events.crossJoin(F.broadcast(span)).select(
        F.when(
            F.col("ts").cast("timestamp").cast("long") < F.col("_mid"),
            F.lit("ref"),
        )
        .otherwise(F.lit("cur"))
        .alias("period"),
        F.least(
            F.greatest(
                F.floor(F.col("value") / 100.0).cast("int"), F.lit(0)
            ),
            F.lit(9),
        ).alias("bin"),
    )
    c = b.groupBy("period", "bin").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("period").agg(F.sum("n").cast("double").alias("total"))
    p = (
        c.join(F.broadcast(t), "period")
        .groupBy("bin")
        .agg(
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("period") == "ref",
                            F.col("n") / F.col("total"),
                        )
                    ),
                    F.lit(0.0),
                )
                + 0.0001,
                6,
            ).alias("p_ref"),
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("period") == "cur",
                            F.col("n") / F.col("total"),
                        )
                    ),
                    F.lit(0.0),
                )
                + 0.0001,
                6,
            ).alias("p_cur"),
        )
    )
    return p.select(
        "bin",
        "p_ref",
        "p_cur",
        F.round(
            (F.col("p_cur") - F.col("p_ref"))
            * F.log(F.col("p_cur") / F.col("p_ref")),
            6,
        ).alias("psi_term"),
    )


@register(
    "winsorized_mean_value_by_type",
    """
    WITH thr AS (
      SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS lo,
             round(quantile_cont(value, 0.95), 6) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(least(greatest(e.value, t.lo), t.hi)
                               AS DECIMAL(38,10))) AS DOUBLE)
                 / COUNT(*), 6) AS winsorized_mean,
           CAST(SUM(CASE WHEN e.value < t.lo OR e.value > t.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN thr t USING (event_type)
    GROUP BY e.event_type
    """,
    doc=(
        "Winsorized mean per event type: clip at the exact p5/p95 "
        "(rounded thresholds broadcast back against the scan, same "
        "shape as the MAD outlier pass) then a DECIMAL-exact mean — "
        "the robust location estimate that, unlike trimming, keeps n "
        "constant. Clipped-row count rides the same aggregate."
    ),
)
def winsorized_mean_value_by_type(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"
    thr = events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("hi"),
    )
    clipped = F.least(
        F.greatest(F.col("value"), F.col("lo")), F.col("hi")
    )
    return (
        events.join(F.broadcast(thr), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(clipped.cast(dec)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_clipped"),
        )
    )


@register(
    "user_burstiness_score",
    """
    WITH g AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT)
               - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS gap
      FROM events
    ), s AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CAST(gap AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(gap * gap AS DECIMAL(38,10))) AS DOUBLE) AS sxx
      FROM g WHERE gap IS NOT NULL GROUP BY user_id HAVING COUNT(*) >= 2
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           round(sx / n, 6) AS mean_gap_secs,
           round((round(sqrt((sxx - sx * sx / n) / n), 6) - round(sx / n, 6))
                 / (round(sqrt((sxx - sx * sx / n) / n), 6) + round(sx / n, 6)),
                 6) AS burstiness
    FROM s
    """,
    doc=(
        "Goh-Barabasi burstiness B = (sigma - mu)/(sigma + mu) of "
        "per-user inter-arrival gaps: -1 = periodic, 0 = Poisson, "
        "->1 = bursty. One LAG window sharing the per-user exchange + "
        "exact DECIMAL moments; sigma and mu are each rounded to 6 "
        "before the ratio so the composite can't drift between "
        "engines. The traffic-shape audit behind retry/batching "
        "policy and session-gap choices."
    ),
)
def user_burstiness_score(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.col("ts").cast("timestamp").cast("long")
    g = events.select(
        "user_id", (t - F.lag(t).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("gap").cast(dec)).cast("double").alias("sx"),
            F.sum((F.col("gap") * F.col("gap")).cast(dec))
            .cast("double")
            .alias("sxx"),
        )
        .filter(F.col("n") >= 2)
    )
    mu = F.round(F.col("sx") / F.col("n"), 6)
    sigma = F.round(
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / F.col("n")
        ),
        6,
    )
    return s.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_gaps"),
        mu.alias("mean_gap_secs"),
        F.round((sigma - mu) / (sigma + mu), 6).alias("burstiness"),
    )


@register(
    "session_duration_percentiles",
    """
    WITH t AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
             LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ), s AS (
      SELECT user_id, tsec,
             SUM(CASE WHEN prev IS NOT NULL AND tsec - prev > 1800
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tsec, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM t
    ), sess AS (
      SELECT user_id, sid,
             MAX(tsec) - MIN(tsec) AS dur_secs,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(round(quantile_cont(dur_secs, 0.5), 0) AS BIGINT)
               AS p50_dur_secs,
           CAST(round(quantile_cont(dur_secs, 0.9), 0) AS BIGINT)
               AS p90_dur_secs,
           CAST(round(quantile_cont(n_events, 0.5), 0) AS BIGINT)
               AS p50_events,
           CAST(MAX(n_events) AS BIGINT) AS max_events
    FROM sess
    """,
    doc=(
        "Session-shape distribution: 30-min-gap sessionization (the "
        "batch window-sum formulation sessionize_events registers "
        "per-row) reduced to duration/size percentiles in integer "
        "seconds/counts — the summary that calibrates the gap "
        "parameter and streaming state TTLs. Shares the one per-user "
        "exchange; percentiles run on the session-grain frame."
    ),
)
def session_duration_percentiles(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.col("ts").cast("timestamp").cast("long")
    flagged = events.select(
        "user_id", "event_id", t.alias("tsec"),
        F.lag(t).over(w).alias("prev"),
    ).withColumn(
        "sid",
        F.sum(
            F.when(
                F.col("prev").isNotNull()
                & (F.col("tsec") - F.col("prev") > 1800),
                1,
            ).otherwise(0)
        ).over(
            Window.partitionBy("user_id").orderBy("tsec", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sess = flagged.groupBy("user_id", "sid").agg(
        (F.max("tsec") - F.min("tsec")).alias("dur_secs"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return sess.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.round(F.expr("percentile(dur_secs, 0.5)"), 0)
        .cast("bigint")
        .alias("p50_dur_secs"),
        F.round(F.expr("percentile(dur_secs, 0.9)"), 0)
        .cast("bigint")
        .alias("p90_dur_secs"),
        F.round(F.expr("percentile(n_events, 0.5)"), 0)
        .cast("bigint")
        .alias("p50_events"),
        F.max("n_events").cast("bigint").alias("max_events"),
    )


@register(
    "hour_of_week_profile",
    """
    WITH b AS (
      SELECT ((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 3) % 7) AS dow,
             ((CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600) AS hour,
             value
      FROM events
    )
    SELECT CAST(dow AS INTEGER) AS dow, CAST(hour AS INTEGER) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_value
    FROM b GROUP BY dow, hour
    """,
    doc=(
        "Hour-of-week activity profile (the seasonality heatmap "
        "behind capacity planning): day-of-week and hour derived from "
        "INTEGER epoch arithmetic (epoch//86400 + 3) % 7 — engine "
        "date-part functions number weekdays differently (DuckDB "
        "Sunday=0, Spark Sunday=1), integer math numbers them "
        "identically: epoch day 0 is a Thursday, +3 makes 0=Monday. "
        "One agg riding the scan."
    ),
)
def hour_of_week_profile(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    e = F.col("ts").cast("timestamp").cast("long")
    return (
        events.select(
            ((F.floor(e / 86400) + 3) % 7).cast("int").alias("dow"),
            ((e % 86400) / 3600).cast("int").alias("hour"),
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("sum_value"),
        )
    )


@register(
    "daily_value_max_drawdown",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                 AS v
      FROM events GROUP BY 1
    ), cum AS (
      SELECT day,
             round(CAST(SUM(CAST(v AS DECIMAL(38,10))) OVER (
               ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2)
                 AS cum_v
      FROM daily
    ), dd AS (
      SELECT day, cum_v,
             round(MAX(cum_v) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   - cum_v, 2) AS drawdown
      FROM cum
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(MAX(drawdown), 2) AS max_drawdown,
           MIN(day) FILTER (WHERE drawdown =
               (SELECT MAX(drawdown) FROM dd)) AS worst_day
    FROM dd
    """,
    doc=(
        "Maximum drawdown of the cumulative daily value series "
        "(peak-to-trough loss — the risk statistic for any cumulative "
        "KPI): running sum then running max, both windows sharing one "
        "calendar-bounded day-grain sort; the worst day ties break to "
        "the earliest. DECIMAL at every accumulation; day-grain "
        "reduction happens FIRST so the windows never see raw events."
    ),
)
def daily_value_max_drawdown(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("v")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = daily.select(
        "day",
        F.round(
            F.sum(F.col("v").cast("decimal(38,10)")).over(w).cast(
                "double"
            ),
            2,
        ).alias("cum_v"),
    )
    dd = cum.select(
        "day",
        F.round(F.max("cum_v").over(w) - F.col("cum_v"), 2).alias(
            "drawdown"
        ),
    )
    mx = dd.agg(F.max("drawdown").alias("_m"))
    return (
        dd.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.max("drawdown"), 2).alias("max_drawdown"),
            F.min(
                F.when(F.col("drawdown") == F.col("_m"), F.col("day"))
            ).alias("worst_day"),
        )
    )


@register(
    "user_growth_curve",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM daily
    """,
    doc=(
        "Cumulative distinct-user growth curve: first-seen day per "
        "user (one user-grain MIN — the reduction that makes "
        "'cumulative distinct' map-side combinable at all), day-grain "
        "counts, then ONE calendar-bounded running sum. The naive "
        "per-day COUNT(DISTINCT user_id <= day) re-scans the stream "
        "per day; this shape is O(n) + a |days| window."
    ),
)
def user_growth_curve(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min(
            F.date_trunc("day", F.col("ts")).cast("date")
        ).alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias(
            "cumulative_users"
        ),
    )


@register(
    "xcorr_daily_lag3",
    """
    WITH per_type AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ),
    total AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT p.event_type,
             CAST(p.x AS DOUBLE) AS x, CAST(t.y AS DOUBLE) AS y
      FROM per_type p JOIN total t ON t.day = p.day - 3
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy
      FROM pairs GROUP BY 1
    )
    SELECT event_type, 3 AS lag, CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                 6) AS xcorr
    FROM s
    """,
    doc=(
        "Grouped cross-correlation at lag k (k=3 days): each event "
        "type's daily-count series Pearson-correlated against the "
        "3-days-earlier TOTAL daily series — 'does the aggregate lead "
        "the segment'. One day-grain aggregate pass over the fact "
        "(the only corpus-width work), then a calendar-bounded "
        "date-shifted equi-join (integer day arithmetic, no interval "
        "drift) and the exact-DECIMAL distributed-moments pattern "
        "(stats_moments_exact) at type grain. At 100 TB everything "
        "after the first agg touches ~2.4k day rows per type."
    ),
)
def xcorr_daily_lag3(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts")).alias("day")
    per_type = events.groupBy("event_type", day).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    total = events.groupBy(day).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    pairs = per_type.withColumn("lday", F.date_sub("day", 3)).join(
        total.withColumnRenamed("day", "lday"), "lday"
    )
    dec = "decimal(38,10)"

    def dsum(col):
        return F.sum(col.cast(dec)).cast("double")

    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxx"), F.col("syy"), F.col("sxy"),
    )
    return s.select(
        "event_type",
        F.lit(3).alias("lag"),
        n.cast("bigint").alias("n_pairs"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("xcorr"),
    )


@register(
    "ks_two_sample_click_view",
    """
    WITH base AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
      GROUP BY value
    ),
    c AS (
      SELECT value,
             SUM(c1) OVER (ORDER BY value) AS cum1,
             SUM(c2) OVER (ORDER BY value) AS cum2
      FROM base
    ),
    n AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM base
    )
    SELECT n.n1, n.n2,
           MAX(round(abs(cum1 / CAST(n.n1 AS DOUBLE)
                         - cum2 / CAST(n.n2 AS DOUBLE)), 6)) AS ks_d
    FROM c CROSS JOIN n
    GROUP BY 1, 2
    """,
    doc=(
        "EXACT two-sample Kolmogorov-Smirnov statistic (click vs view "
        "value distributions — the distribution-drift test beside the "
        "JSD monitors): D = max |ECDF₁ − ECDF₂| over the pooled "
        "values. Scale shape: the fact reduces to VALUE grain first "
        "(one hash agg carrying both sides' counts), then the running "
        "totals come from operators/prefix.distributed_prefix_sum — a "
        "range exchange + pid-partitioned window, NEVER an "
        "unpartitioned cumulative over data grain; the sample sizes "
        "ride a broadcast one-row carrier. Deterministic: integer "
        "cumulative counts, one double division per side, exact MAX."
    ),
)
def ks_two_sample_click_view(spark, sf_dir):
    from metar_pipeline_spark.operators.prefix import (
        distributed_prefix_sum,
    )

    events = load_table(spark, sf_dir, "events")
    base = (
        events.filter(
            F.col("event_type").isin("click", "view")
            & F.col("value").isNotNull()
        )
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("c1"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("c2"),
        )
    )
    p1 = distributed_prefix_sum(base, [F.asc("value")], "c1", out_col="cum1")
    p2 = distributed_prefix_sum(p1, [F.asc("value")], "c2", out_col="cum2")
    n = base.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    d = F.round(
        F.abs(
            F.col("cum1") / F.col("n1").cast("double")
            - F.col("cum2") / F.col("n2").cast("double")
        ),
        6,
    )
    return (
        p2.crossJoin(F.broadcast(n))
        .groupBy("n1", "n2")
        .agg(F.max(d).alias("ks_d"))
    )


@register(
    "mannwhitney_u_click_view",
    """
    WITH base AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
      GROUP BY value
    ),
    c AS (
      SELECT c1, c2, c1 + c2 AS t,
             SUM(c1 + c2) OVER (ORDER BY value) AS cumt
      FROM base
    ),
    s AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(CAST(c1 AS DECIMAL(18,0)) * (2 * cumt - t + 1))
                  AS DOUBLE) AS r2,
             CAST(SUM(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
                      * CAST(t AS DECIMAL(12,0)) - t) AS DOUBLE) AS ties3
      FROM c
    )
    SELECT n1, n2,
           round(r2 / 2 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2, 6) AS u1,
           round(CAST(n1 AS DOUBLE) * n2
                 - (r2 / 2 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2), 6) AS u2,
           round(((r2 / 2 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2)
                  - CAST(n1 AS DOUBLE) * n2 / 2)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                        * ((n1 + n2 + 1)
                           - ties3 / (CAST(n1 + n2 AS DOUBLE)
                                      * (n1 + n2 - 1))))
                 + 0.0, 6) AS z_score
    FROM s
    """,
    doc=(
        "EXACT tie-corrected Mann-Whitney U (click vs view value "
        "distributions) — the rank-sum sibling of the KS statistic: "
        "U detects a location shift where KS detects any ECDF gap. "
        "Same scale shape as ks_two_sample_click_view: the fact "
        "reduces to VALUE grain in one hash agg, running pooled "
        "counts come from operators/prefix.distributed_prefix_sum "
        "(range exchange + pid-partitioned window, never an "
        "unpartitioned cumulative), and the rank-sum uses the "
        "tied-rank identity avg_rank = cum_before + (t+1)/2 kept in "
        "INTEGERS (2*avg_rank = 2*cumt - t + 1) so the DECIMAL "
        "accumulation is exact and order-independent; the normal "
        "z uses the standard tie-corrected variance. One double "
        "expression per output at the very end."
    ),
)
def mannwhitney_u_click_view(spark, sf_dir):
    from metar_pipeline_spark.operators.prefix import (
        distributed_prefix_sum,
    )

    events = load_table(spark, sf_dir, "events")
    base = (
        events.filter(
            F.col("event_type").isin("click", "view")
            & F.col("value").isNotNull()
        )
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("c1"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("c2"),
        )
        .withColumn("t", F.col("c1") + F.col("c2"))
    )
    c = distributed_prefix_sum(base, [F.asc("value")], "t", out_col="cumt")
    tdec = F.col("t").cast("decimal(12,0)")
    s = c.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(
            F.col("c1").cast("decimal(18,0)")
            * (2 * F.col("cumt") - F.col("t") + 1)
        )
        .cast("double")
        .alias("r2"),
        F.sum(tdec * tdec * tdec - F.col("t")).cast("double").alias("ties3"),
    )
    n1d = F.col("n1").cast("double")
    u1 = F.col("r2") / 2 - n1d * (F.col("n1") + 1) / 2
    mu = n1d * F.col("n2") / 2
    sigma = F.sqrt(
        n1d * F.col("n2") / 12
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("ties3")
            / (
                (F.col("n1") + F.col("n2")).cast("double")
                * (F.col("n1") + F.col("n2") - 1)
            )
        )
    )
    return s.select(
        "n1",
        "n2",
        F.round(u1, 6).alias("u1"),
        F.round(n1d * F.col("n2") - u1, 6).alias("u2"),
        (F.round((u1 - mu) / sigma, 6) + F.lit(0.0)).alias("z_score"),
    )


@register(
    "cusum_changepoint_daily",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS x
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT day,
             SUM(x) OVER (ORDER BY day) AS cum,
             ROW_NUMBER() OVER (ORDER BY day) AS i
      FROM daily
    ),
    n AS (
      SELECT CAST(SUM(x) AS BIGINT) AS total,
             COUNT(*) AS n_days
      FROM daily
    )
    SELECT day,
           round(abs(cum - i * (CAST(total AS DOUBLE) / n_days)), 6)
             AS cusum_abs,
           n.n_days
    FROM c CROSS JOIN n
    ORDER BY cusum_abs DESC, day ASC
    LIMIT 1
    """,
    doc=(
        "CUSUM changepoint detection on the daily event-count series: "
        "S_i = cum_i - i*mean is the classic cumulative-sum deviation "
        "path, and argmax |S_i| is the single most likely level-shift "
        "day (Page/Taylor). Scale shape: the fact reduces to DAY grain "
        "in one hash agg; the cumulative count and row index both come "
        "from operators/prefix.distributed_prefix_sum over the "
        "day-grain frame (integer weights, exact); the global mean "
        "rides a broadcast one-row carrier so S_i is a single double "
        "expression over integers — no float accumulation anywhere. "
        "Final argmax is a TakeOrderedAndProject over day-grain rows "
        "(ties break to the earliest day)."
    ),
)
def cusum_changepoint_daily(spark, sf_dir):
    from metar_pipeline_spark.operators.prefix import (
        distributed_prefix_sum,
    )

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    c = distributed_prefix_sum(daily, [F.asc("day")], "x", out_col="cum")
    c = distributed_prefix_sum(
        c.withColumn("__one", F.lit(1)), [F.asc("day")], "__one", out_col="i"
    )
    n = daily.agg(
        F.sum("x").cast("bigint").alias("total"),
        F.count(F.lit(1)).alias("n_days"),
    )
    s = F.round(
        F.abs(
            F.col("cum")
            - F.col("i") * (F.col("total").cast("double") / F.col("n_days"))
        ),
        6,
    )
    return (
        c.crossJoin(F.broadcast(n))
        .select("day", s.alias("cusum_abs"), "n_days")
        .orderBy(F.desc("cusum_abs"), F.asc("day"))
        .limit(1)
    )


@register(
    "theilsen_daily_trend",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.day AS da, b.day AS db,
             CAST(b.y - a.y AS DOUBLE)
               / datediff('day', a.day, b.day) AS slope
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    r AS (
      SELECT slope,
             ROW_NUMBER() OVER (ORDER BY slope, da, db) AS rn
      FROM pairs
    ),
    n AS (
      SELECT COUNT(*) AS n_pairs,
             (SELECT COUNT(*) FROM daily) AS n_days
      FROM pairs
    )
    SELECT n.n_days, n.n_pairs,
           round(AVG(r.slope) + 0.0, 6) AS slope_per_day
    FROM r CROSS JOIN n
    WHERE r.rn = (n.n_pairs + 1) // 2 OR r.rn = (n.n_pairs + 2) // 2
    GROUP BY 1, 2
    """,
    doc=(
        "Theil-Sen robust trend estimator over the daily event-count "
        "series: the MEDIAN of all pairwise slopes (y_j-y_i)/(d_j-d_i) "
        "— 29%-breakdown-point alternative to the OLS trend "
        "(ols_trend_by_event_type), immune to the outlier days the "
        "anomaly query flags. Scale shape: one day-grain hash agg over "
        "the fact, then ALL work is calendar-bounded — the pair join "
        "is day-grain x day-grain (a broadcast nested-loop over ~2.4k "
        "rows max, never data grain), and the exact median avoids "
        "engine-specific interpolation by selecting the two middle "
        "ORDER STATISTICS via operators/prefix.distributed_prefix_sum "
        "row numbering (total order: slope, day_a, day_b) and "
        "averaging them — identical integer-indexed arithmetic on any "
        "engine."
    ),
)
def theilsen_daily_trend(spark, sf_dir):
    from metar_pipeline_spark.operators.prefix import (
        distributed_prefix_sum,
    )

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    a = daily.select(F.col("day").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("day").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        "da",
        "db",
        (
            (F.col("yb") - F.col("ya")).cast("double")
            / F.datediff("db", "da")
        ).alias("slope"),
    )
    r = distributed_prefix_sum(
        pairs.withColumn("__one", F.lit(1)),
        [F.asc("slope"), F.asc("da"), F.asc("db")],
        "__one",
        out_col="rn",
    )
    n = pairs.agg(F.count(F.lit(1)).alias("n_pairs")).crossJoin(
        daily.agg(F.count(F.lit(1)).alias("n_days"))
    )
    return (
        r.crossJoin(F.broadcast(n))
        .filter(
            (F.col("rn") == F.expr("(n_pairs + 1) div 2"))
            | (F.col("rn") == F.expr("(n_pairs + 2) div 2"))
        )
        .groupBy("n_days", "n_pairs")
        .agg((F.round(F.avg("slope"), 6) + F.lit(0.0)).alias("slope_per_day"))
    )


@register(
    "spearman_daily_count_value",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS x,
             CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
               / COUNT(*) AS y
      FROM events
      WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT event_type,
             2 * RANK() OVER (PARTITION BY event_type ORDER BY x)
               + COUNT(*) OVER (PARTITION BY event_type, x) - 1 AS rx2,
             2 * RANK() OVER (PARTITION BY event_type ORDER BY y)
               + COUNT(*) OVER (PARTITION BY event_type, y) - 1 AS ry2
      FROM daily
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx2 * rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(rx2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM rk GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                 + 0.0, 6) AS spearman_rho
    FROM s
    """,
    doc=(
        "Grouped Spearman rank correlation between each event type's "
        "daily VOLUME (count) and daily MEAN VALUE — 'do busy days "
        "run hot or cold', robust to any monotone transform, the "
        "rank sibling of xcorr_daily_lag3's Pearson. Exact tie "
        "handling via average ranks kept in INTEGERS: 2*avg_rank = "
        "2*RANK() + ties - 1, then Pearson over the doubled ranks "
        "(invariant under the affine x2). Scale shape: one hash agg "
        "reduces the fact to (type, day) grain, so every window here "
        "runs over a CALENDAR-BOUNDED frame (~2.4k day rows per type "
        "for the test span) — justified in "
        "tools/sweep_windows.ALLOWED_BOUNDED_INPUT; the moment sums "
        "are exact DECIMAL at type grain (rank products are bounded "
        "by (2*days+1)^2, never overflow)."
    ),
)
def spearman_daily_count_value(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("x"),
            (_dsum(F.col("value")) / F.count(F.lit(1))).alias("y"),
        )
    )

    def ranks2(col):
        return (
            2 * F.rank().over(Window.partitionBy("event_type").orderBy(col))
            + F.count(F.lit(1)).over(Window.partitionBy("event_type", col))
            - 1
        )

    rk = daily.select(
        "event_type",
        ranks2("x").alias("rx2"),
        ranks2("y").alias("ry2"),
    )
    dec = "decimal(38,0)"
    s = rk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rx2").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("ry2").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("rx2") * F.col("rx2")).cast(dec))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("ry2") * F.col("ry2")).cast(dec))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("rx2") * F.col("ry2")).cast(dec))
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxx"), F.col("syy"), F.col("sxy"),
    )
    return s.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        (
            F.round(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            )
            + F.lit(0.0)
        ).alias("spearman_rho"),
    )


@register(
    "forecast_baseline_backtest",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT day, y,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             LAG(y, 1) OVER (ORDER BY day) AS l1,
             LAG(y, 2) OVER (ORDER BY day) AS l2,
             LAG(y, 3) OVER (ORDER BY day) AS l3,
             LAG(y, 7) OVER (ORDER BY day) AS l7,
             MAX(day) OVER () AS max_day
      FROM daily
    ),
    eval_rows AS (
      SELECT * FROM lagged
      WHERE rn > 7 AND day > max_day - INTERVAL 14 DAY
    ),
    errs AS (
      SELECT 'naive' AS method, y - l1 AS e FROM eval_rows
      UNION ALL
      SELECT 'seasonal_naive', y - l7 FROM eval_rows
      UNION ALL
      SELECT 'ma3', y - (l1 + l2 + l3) / 3.0 FROM eval_rows
    )
    SELECT method, CAST(COUNT(*) AS BIGINT) AS n_eval,
           round(CAST(SUM(CAST(abs(e) AS DECIMAL(38,10))) AS DOUBLE)
                 / COUNT(*), 6) AS mae,
           round(sqrt(CAST(SUM(CAST(e * e AS DECIMAL(38,10)))
                           AS DOUBLE) / COUNT(*)), 6) AS rmse
    FROM errs GROUP BY method
    """,
    doc=(
        "Rolling-origin forecast BACKTEST of the three standard "
        "baselines (naive y[t-1], weekly seasonal-naive y[t-7], "
        "3-day moving average) over the last 14 days of the daily "
        "count series — the scorecard any real forecast "
        "(holt_linear_forecast) must beat before it ships; MAE and "
        "RMSE per method via exact DECIMAL error sums. Scale shape: "
        "one day-grain hash agg over the fact, then every lag window "
        "is a CALENDAR-GRAIN rolling frame (days elapsed — the "
        "sweep_windows allow-list class); metric agg at method grain."
    ),
)
def forecast_baseline_backtest(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "y",
        F.row_number().over(w).alias("rn"),
        F.lag("y", 1).over(w).alias("l1"),
        F.lag("y", 2).over(w).alias("l2"),
        F.lag("y", 3).over(w).alias("l3"),
        F.lag("y", 7).over(w).alias("l7"),
        F.max("day").over(
            Window.orderBy("day").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("max_day"),
    )
    ev = lagged.filter(
        (F.col("rn") > 7) & (F.col("day") > F.date_sub("max_day", 14))
    )
    errs = (
        ev.select(
            F.lit("naive").alias("method"),
            (F.col("y") - F.col("l1")).alias("e"),
        )
        .unionAll(
            ev.select(
                F.lit("seasonal_naive"),
                F.col("y") - F.col("l7"),
            )
        )
        .unionAll(
            ev.select(
                F.lit("ma3"),
                F.col("y")
                - (F.col("l1") + F.col("l2") + F.col("l3")) / 3.0,
            )
        )
    )
    dec = "decimal(38,10)"
    return errs.groupBy("method").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.round(
            F.sum(F.abs(F.col("e")).cast(dec)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mae"),
        F.round(
            F.sqrt(
                F.sum((F.col("e") * F.col("e")).cast(dec)).cast("double")
                / F.count(F.lit(1))
            ),
            6,
        ).alias("rmse"),
    )


@register(
    "session_entry_exit_profile",
    """
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(CASE WHEN prev_s IS NULL
                        OR epoch(ts) - prev_s > 1800 THEN 1
                      ELSE 0 END)
               OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS sid
      FROM (
        SELECT user_id, event_type, ts, event_id,
               epoch(LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS prev_s
        FROM events) x
    ),
    ranked AS (
      SELECT user_id, sid, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                ORDER BY ts, event_id) AS rna,
             ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                ORDER BY ts DESC, event_id DESC) AS rnd
      FROM s
    ),
    per_session AS (
      SELECT user_id, sid,
             MAX(CASE WHEN rna = 1 THEN event_type END) AS entry_type,
             MAX(CASE WHEN rnd = 1 THEN event_type END) AS exit_type,
             COUNT(*) AS n_events
      FROM ranked GROUP BY 1, 2
    )
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces,
           round(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS bounce_rate
    FROM per_session GROUP BY 1, 2
    """,
    doc=(
        "Session entry/exit census with bounce rate: sessionize "
        "(30-min inactivity gap, operators/windows.sessionize — the "
        "lag + conditional-cumsum single-exchange form), reduce each "
        "session to its FIRST and LAST event type via min_by/max_by "
        "over the (ts, event_id) total order, then a census at "
        "(entry, exit) grain — the landing/abandonment table of web "
        "analytics, single-event sessions counted as bounces. Scale "
        "shape: the sessionize windows and the per-session argmin/"
        "argmax share ONE user-keyed shuffle; census is a tiny final "
        "hash agg."
    ),
)
def session_entry_exit_profile(spark, sf_dir):
    from metar_pipeline_spark.operators.windows import sessionize

    events = load_table(spark, sf_dir, "events")
    s = sessionize(
        events, "user_id", "ts", 30, session_col="sid",
        tiebreak="event_id",
    )
    key = F.struct(F.col("ts"), F.col("event_id"))
    per_session = s.groupBy("user_id", "sid").agg(
        F.min_by("event_type", key).alias("entry_type"),
        F.max_by("event_type", key).alias("exit_type"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return per_session.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        bounce.cast("bigint").alias("n_bounces"),
        F.round(
            bounce.cast("double") / F.count(F.lit(1)), 6
        ).alias("bounce_rate"),
    )


@register(
    "ab_test_proportions",
    """
    WITH s AS (
      SELECT user_id % 2 AS variant, COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id % 2
    ),
    w AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        MAX(CASE WHEN variant = 0 THEN conv END) AS c0,
        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        MAX(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM s
    )
    SELECT CAST(n0 AS BIGINT) AS n_a, CAST(c0 AS BIGINT) AS conv_a,
           CAST(n1 AS BIGINT) AS n_b, CAST(c1 AS BIGINT) AS conv_b,
           round(CAST(c0 AS DOUBLE) / n0, 6) AS rate_a,
           round(CAST(c1 AS DOUBLE) / n1, 6) AS rate_b,
           round((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1))
                 + 0.0, 6) AS z_score
    FROM w
    """,
    doc=(
        "Two-proportion z-test (the A/B-test readout): purchase share "
        "of events split by a deterministic variant assignment "
        "(user_id parity — in production the hash split from "
        "curation.hash_unit_01), pooled-variance z on the rate "
        "difference. Completes the inference tier: KS/Mann-Whitney "
        "compare DISTRIBUTIONS, BRR bounds a MEAN, this tests "
        "PROPORTIONS — the three questions every experiment readout "
        "asks. Scale shape: one user-grain hash agg, then a 2-row "
        "conditional pivot; all counts exact integers, one double "
        "expression per output."
    ),
)
def ab_test_proportions(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    s = events.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    w = s.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    n0d, c0d = F.col("n0").cast("double"), F.col("c0").cast("double")
    n1d, c1d = F.col("n1").cast("double"), F.col("c1").cast("double")
    pool = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (c0d / F.col("n0") - c1d / F.col("n1")) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return w.select(
        F.col("n0").cast("bigint").alias("n_a"),
        F.col("c0").cast("bigint").alias("conv_a"),
        F.col("n1").cast("bigint").alias("n_b"),
        F.col("c1").cast("bigint").alias("conv_b"),
        F.round(c0d / F.col("n0"), 6).alias("rate_a"),
        F.round(c1d / F.col("n1"), 6).alias("rate_b"),
        (F.round(z, 6) + F.lit(0.0)).alias("z_score"),
    )


@register(
    "cohort_ltv_curve",
    """
    WITH firstday AS (
      SELECT user_id,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
      FROM events GROUP BY user_id
    ),
    cohorts AS (
      SELECT user_id,
             CAST(date_trunc('week', d0) AS DATE) AS cohort, d0
      FROM firstday
    ),
    sizes AS (
      SELECT cohort, COUNT(*) AS n_users FROM cohorts GROUP BY cohort
    ),
    rev AS (
      SELECT c.cohort, datediff('day', c.d0, CAST(date_trunc('day',
             e.ts) AS DATE)) AS age_days,
             SUM(CAST(e.value AS DECIMAL(30,10))) AS r
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
      WHERE e.value IS NOT NULL
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort, age_days,
             CAST(SUM(r) OVER (PARTITION BY cohort ORDER BY age_days)
                  AS DOUBLE) AS cum_rev
      FROM rev
    )
    SELECT c.cohort, c.age_days, s.n_users,
           round(c.cum_rev / s.n_users, 6) AS ltv_per_user
    FROM cum c JOIN sizes s ON s.cohort = c.cohort
    WHERE c.age_days IN (0, 7, 14, 21, 28)
    """,
    doc=(
        "Cohort lifetime-value curve: users grouped by first-touch "
        "WEEK, cumulative value per user at ages 0/7/14/21/28 days — "
        "the payback-period table growth teams read next to the "
        "retention matrix (cohort_retention_matrix). Scale shape: one "
        "user-grain agg for first-touch, one fact equi-join back (the "
        "cohort dim rides user grain), one hash agg to (cohort, age) "
        "grain, then the cumulative runs over a CALENDAR-BOUNDED "
        "frame (weeks x ages, never data grain — justified in "
        "tools/sweep_windows.ALLOWED_BOUNDED_INPUT); revenue sums are "
        "exact DECIMAL end to end with ONE double division at output."
    ),
)
def cohort_ltv_curve(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts"))
    firstday = events.groupBy("user_id").agg(F.min(day).alias("d0"))
    cohorts = firstday.select(
        "user_id",
        F.to_date(F.date_trunc("week", "d0")).alias("cohort"),
        "d0",
    )
    sizes = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    rev = (
        events.filter(F.col("value").isNotNull())
        .join(cohorts, "user_id")
        .groupBy(
            "cohort",
            F.datediff(day, F.col("d0")).alias("age_days"),
        )
        .agg(F.sum(F.col("value").cast("decimal(30,10)")).alias("r"))
    )
    cum = rev.select(
        "cohort",
        "age_days",
        F.sum("r")
        .over(
            Window.partitionBy("cohort")
            .orderBy("age_days")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("double")
        .alias("cum_rev"),
    )
    return (
        cum.filter(F.col("age_days").isin(0, 7, 14, 21, 28))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age_days",
            "n_users",
            F.round(F.col("cum_rev") / F.col("n_users"), 6).alias(
                "ltv_per_user"
            ),
        )
    )


@register(
    "did_value_uplift",
    """
    WITH cells AS (
      SELECT user_id % 2 AS grp,
             CASE WHEN CAST(date_trunc('day', ts) AS DATE)
                       >= DATE '2024-01-16' THEN 1 ELSE 0 END AS post,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS s
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ),
    w AS (
      SELECT
        MAX(CASE WHEN grp = 0 AND post = 0 THEN s / n END) AS a_pre,
        MAX(CASE WHEN grp = 0 AND post = 1 THEN s / n END) AS a_post,
        MAX(CASE WHEN grp = 1 AND post = 0 THEN s / n END) AS b_pre,
        MAX(CASE WHEN grp = 1 AND post = 1 THEN s / n END) AS b_post,
        CAST(SUM(n) AS BIGINT) AS n_total
      FROM cells
    )
    SELECT n_total,
           round(a_pre, 6) AS a_pre, round(a_post, 6) AS a_post,
           round(b_pre, 6) AS b_pre, round(b_post, 6) AS b_post,
           round((b_post - b_pre) - (a_post - a_pre) + 0.0, 6)
             AS did_estimate
    FROM w
    """,
    doc=(
        "Difference-in-differences uplift estimate: mean event value "
        "in the 2x2 (group x pre/post day-16) design, DiD = "
        "(B_post - B_pre) - (A_post - A_pre) — the quasi-experimental "
        "readout when assignment is not randomized per event (group = "
        "user parity; in production the hash split). Completes the "
        "experimentation tier beside the randomized two-proportion z. "
        "Scale shape: ONE hash agg to the 4-cell design grain with "
        "exact-DECIMAL sums, then a 4-way conditional pivot and one "
        "double expression — nothing after the first agg touches the "
        "fact."
    ),
)
def did_value_uplift(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    day = F.to_date(F.date_trunc("day", "ts"))
    cells = events.groupBy(
        (F.col("user_id") % 2).alias("grp"),
        F.when(day >= F.lit("2024-01-16").cast("date"), 1)
        .otherwise(0)
        .alias("post"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,10)"))
        .cast("double")
        .alias("s"),
    )

    def cell(g, p):
        return F.max(
            F.when(
                (F.col("grp") == g) & (F.col("post") == p),
                F.col("s") / F.col("n"),
            )
        )

    w = cells.agg(
        cell(0, 0).alias("a_pre"),
        cell(0, 1).alias("a_post"),
        cell(1, 0).alias("b_pre"),
        cell(1, 1).alias("b_post"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return w.select(
        "n_total",
        F.round("a_pre", 6).alias("a_pre"),
        F.round("a_post", 6).alias("a_post"),
        F.round("b_pre", 6).alias("b_pre"),
        F.round("b_post", 6).alias("b_post"),
        (
            F.round(
                (F.col("b_post") - F.col("b_pre"))
                - (F.col("a_post") - F.col("a_pre")),
                6,
            )
            + F.lit(0.0)
        ).alias("did_estimate"),
    )
