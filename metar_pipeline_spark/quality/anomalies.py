"""Run-history column-anomaly detection — Q6's statistical flagging rule.

The reference declares ``elementary.column_anomalies`` on its staging
model (reference ``dbt/models/stg/schema.yml:9,17``): every run appends
per-column stats (row count, null rate, bounds) to a metrics store, and
a monitor flags the latest run when a stat sits k·σ outside its own run
history. The engine already persists the store
(``quality.assertions.profile``, observe-riding batch metrics in
``plans/medallion.py``); this module adds the missing DETECTION rule.

Engine-exact by construction: every stat is an exact BIGINT (counts,
half-up integer parts-per-million ratios, integer-scaled bounds) and
the k·σ test is evaluated in cross-multiplied integer algebra —

    |x − S/n| > k·σ   ⇔   (n·x − S)² > k² · (n·Q − S²),   Q = Σx²

with every product formed in DECIMAL(38,0) (no doubles anywhere), so
Spark and a SQL replay agree bit-for-bit; the σ=0 constant-history case
degrades correctly (any deviation from a constant history flags).
Magnitude envelope: stats up to ~1e15 over ~1e3 runs keep (n·x − S)²
under 1e38 — within DECIMAL(38,0) at any realistic cadence.

Scale shape: the metrics store is metadata-grain — (runs × columns ×
stats) rows, KB-sized regardless of fact volume. Profiling rides the
batch's own scan (one hash aggregate, or ``DataFrame.observe`` as in
``plans/medallion.py``); the rule aggregates the partition-pruned
last-N-runs slice at (column, stat) grain — nothing here ever rescans
fact data, which is what makes per-batch monitoring affordable at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _profile_aggs(count_cols, int_cols) -> "list[Column]":
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in count_cols:
        aggs.append(F.count(F.col(c)).alias(f"__cnt_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}")
        )
    for name, expr in int_cols.items():
        aggs.append(F.min(expr).cast("long").alias(f"__min_{name}"))
        aggs.append(F.max(expr).cast("long").alias(f"__max_{name}"))
    return aggs


def _profile_entries(count_cols, int_cols) -> Column:
    """Literal-struct array for the wide→long unpivot — JVM-side
    explode, no Python rows shipped."""
    entries = []
    for c in count_cols:
        entries.append((c, "count", F.col(f"__cnt_{c}")))
        entries.append((c, "null_count", F.col(f"__null_{c}")))
        ppm = (
            F.when(
                F.col("__total") > 0,
                F.expr(
                    f"(2 * {PPM} * __null_{c} + __total)"
                    " DIV (2 * __total)"
                ),
            )
            .otherwise(F.lit(0))
        )
        entries.append((c, "null_ppm", ppm))
    for name in int_cols:
        entries.append((name, "min_i", F.col(f"__min_{name}")))
        entries.append((name, "max_i", F.col(f"__max_{name}")))
    return F.array(
        *[
            F.struct(
                F.lit(col).alias("column_name"),
                F.lit(stat).alias("stat"),
                val.cast("long").alias("value"),
            )
            for col, stat, val in entries
        ]
    )


def column_profile_long(
    df: DataFrame,
    run_id: int,
    count_cols: "list[str]",
    int_cols: "dict[str, Column] | None" = None,
) -> DataFrame:
    """One-pass long-form profile of a batch:
    ``(run_id, column_name, stat, value)`` with exact BIGINT values.

    - every name in ``count_cols`` emits stats ``count`` (non-null),
      ``null_count`` and ``null_ppm`` (half-up integer ppm);
    - every ``int_cols`` entry (name → bigint-valued Column, e.g. a
      price pre-scaled to cents) additionally emits ``min_i``/``max_i``.

    One hash aggregate over the batch (ride an existing scan where
    possible); the wide→long unpivot is a JVM-side explode of a
    literal-struct array — no Python rows are shipped.
    """
    int_cols = int_cols or {}
    wide = df.agg(*_profile_aggs(count_cols, int_cols))
    return wide.select(
        F.explode(_profile_entries(count_cols, int_cols)).alias("e")
    ).select(
        F.lit(int(run_id)).cast("long").alias("run_id"),
        "e.column_name",
        "e.stat",
        "e.value",
    )


def grouped_profile_long(
    df: DataFrame,
    run_col: str,
    count_cols: "list[str]",
    int_cols: "dict[str, Column] | None" = None,
) -> DataFrame:
    """Backfill form of :func:`column_profile_long`: profile MANY runs
    in one pass (``run_col`` partitions the frame into runs — e.g. a
    day bucket when reconstructing a metrics store from history). Same
    long output shape; one hash aggregate at run grain."""
    int_cols = int_cols or {}
    wide = df.groupBy(run_col).agg(*_profile_aggs(count_cols, int_cols))
    return wide.select(
        F.col(run_col).cast("long").alias("run_id"),
        F.explode(_profile_entries(count_cols, int_cols)).alias("e"),
    ).select("run_id", "e.column_name", "e.stat", "e.value")


def profile_anomalies(
    history: DataFrame,
    k: int = 3,
    min_history: int = 3,
    season_of=None,
) -> DataFrame:
    """Flag the LATEST run's stats against their run history — the
    ``elementary.column_anomalies`` contract.

    ``history``: ``(run_id, column_name, stat, value)`` long rows (the
    :func:`column_profile_long` shape, one slice per persisted run;
    read the last N runs partition-pruned when the store is partitioned
    by run). The latest run is the global ``max(run_id)``; every
    strictly-earlier run is history.

    Rule, per (column_name, stat): anomaly ⇔ hist_n ≥ ``min_history``
    AND (n·x − S)² > k²·(n·Q − S²) — the cross-multiplied form of
    |x − μ| > k·σ (population σ), computed entirely in DECIMAL(38,0).
    A stat absent from the latest run is not reported (nothing to
    flag); a stat with insufficient history reports is_anomaly=false
    with its hist_n so callers can see why.

    ``season_of`` (optional): a callable Column→Column mapping a run id
    to its season bucket (e.g. ``lambda r: F.pmod(r, 7)`` for
    day-of-week over daily run ids — the elementary
    ``seasonality: day_of_week`` config). When set, the history is
    restricted to runs in the SAME season as the latest run, so a
    weekend-shaped stat is judged against weekends only.

    Returns ``(column_name, stat, run_id, value, hist_n, hist_mean_i,
    is_anomaly)`` — hist_mean_i is the half-up integer mean of the
    history. Group grain: (columns × stats) rows, broadcastable.
    """
    latest_run = history.agg(
        F.max("run_id").cast("long").alias("__latest")
    )
    tagged = history.join(F.broadcast(latest_run))
    in_hist = F.col("run_id") < F.col("__latest")
    if season_of is not None:
        in_hist = in_hist & (
            season_of(F.col("run_id")) == season_of(F.col("__latest"))
        )
    h = tagged.filter(in_hist)
    latest = tagged.filter(F.col("run_id") == F.col("__latest")).select(
        "column_name", "stat", "run_id", "value"
    )
    dv = F.col("value").cast("decimal(38,0)")
    hist = h.groupBy("column_name", "stat").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum(dv).cast("decimal(38,0)").alias("__s"),
        F.sum(dv * dv).cast("decimal(38,0)").alias("__q"),
    )
    j = latest.join(hist, ["column_name", "stat"], "left")
    dx = F.col("value").cast("decimal(38,0)")
    lhs = (F.col("__n") * dx - F.col("__s")) * (
        F.col("__n") * dx - F.col("__s")
    )
    rhs = F.lit(int(k) * int(k)).cast("decimal(38,0)") * (
        F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")
    )
    return j.select(
        "column_name",
        "stat",
        "run_id",
        "value",
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("hist_n"),
        # FLOOR division, not DIV: Spark's DIV truncates toward zero
        # while DuckDB's // floors, so a NEGATIVE sum (signed stats
        # like temperature bounds) would diverge by 1 across engines —
        # caught by the exact-rational hypothesis law. (m − pmod(m,d))
        # is exactly divisible, so the DIV afterwards IS floor.
        F.when(
            F.coalesce(F.col("__n"), F.lit(0)) > 0,
            F.expr(
                "((2 * __s + __n) - pmod(2 * __s + __n, 2 * __n))"
                " DIV (2 * __n)"
            ),
        ).cast("long").alias("hist_mean_i"),
        (
            (F.coalesce(F.col("__n"), F.lit(0)) >= int(min_history))
            & (lhs > rhs)
        ).alias("is_anomaly"),
    )


def metrics_store_anomalies(
    metrics: DataFrame,
    layer: str = "stg",
    k: int = 3,
    min_history: int = 3,
    rule: str = "sigma",
) -> DataFrame:
    """Adapter over the medallion ``_metrics`` store
    (``plans/medallion.py:_append_batch_metrics`` schema: one wide row
    per (layer, batch) with observe-derived counts): reshape to the
    long profile form keyed by the batch-identity run id
    (``max_observed_epoch``) and run :func:`profile_anomalies`.

    Stats per run: ``_table.count`` (row volume), ``observed`` /
    ``icao`` null counts and half-up ppm rates — the
    elementary.column_anomalies monitors the reference declares on its
    staging model. Store grain: one row per batch — the reshape and
    rule are metadata-sized at any fact scale.
    """
    m = metrics.filter(F.col("layer") == layer).select(
        F.col("max_observed_epoch").alias("run_id"),
        F.col("n_rows").cast("long").alias("__tot"),
        F.col("null_observed").cast("long").alias("__no"),
        F.col("null_icao").cast("long").alias("__ni"),
    )
    packed = F.array(
        F.struct(
            F.lit("_table").alias("column_name"),
            F.lit("count").alias("stat"),
            F.col("__tot").alias("value"),
        ),
        F.struct(
            F.lit("observed").alias("column_name"),
            F.lit("null_count").alias("stat"),
            F.col("__no").alias("value"),
        ),
        F.struct(
            F.lit("observed").alias("column_name"),
            F.lit("null_ppm").alias("stat"),
            F.when(
                F.col("__tot") > 0,
                F.expr(f"(2 * {PPM} * __no + __tot) DIV (2 * __tot)"),
            ).otherwise(F.lit(0)).alias("value"),
        ),
        F.struct(
            F.lit("icao").alias("column_name"),
            F.lit("null_count").alias("stat"),
            F.col("__ni").alias("value"),
        ),
        F.struct(
            F.lit("icao").alias("column_name"),
            F.lit("null_ppm").alias("stat"),
            F.when(
                F.col("__tot") > 0,
                F.expr(f"(2 * {PPM} * __ni + __tot) DIV (2 * __tot)"),
            ).otherwise(F.lit(0)).alias("value"),
        ),
    )
    long = m.select("run_id", F.explode(packed).alias("e")).select(
        "run_id",
        "e.column_name",
        "e.stat",
        F.col("e.value").cast("long").alias("value"),
    )
    if rule == "sigma":
        return profile_anomalies(long, k=k, min_history=min_history)
    if rule == "iqr":
        return profile_anomalies_iqr(long, k=k, min_history=min_history)
    raise ValueError(f"unknown anomaly rule {rule!r} (use sigma|iqr)")


def profile_anomalies_iqr(
    history: DataFrame,
    k: int = 3,
    min_history: int = 4,
    season_of=None,
) -> DataFrame:
    """Robust (quartile-fence) variant of :func:`profile_anomalies`:
    flag the latest run's stat when it falls outside
    ``[Q1 − k·IQR, Q3 + k·IQR]`` of its history. Median-based fences
    survive what breaks the k·σ rule operationally — a single corrupt
    run in the HISTORY inflates σ enough to mask every later anomaly,
    while quartiles barely move (the standard robust-statistics
    argument; Tukey's fences with a wider k).

    Exactness: the quartiles are exact ORDER STATISTICS over the
    bounded history sample — Q_p = the ceil(n·p/100)-th smallest value
    (1-based, the engine-portable integer rank (n·p + 99) DIV 100, the
    same contract as sketches.kmv_quantile_estimate) — and the fence
    comparison is pure BIGINT arithmetic, so a SQL replay agrees
    bit-for-bit. No floats anywhere.

    Scale shape: per (column, stat) the history is ≤ N runs, so the
    collect_list → array_sort ranking runs inside one hash aggregate at
    metadata grain — no corpus data, no windows."""
    latest_run = history.agg(
        F.max("run_id").cast("long").alias("__latest")
    )
    tagged = history.join(F.broadcast(latest_run))
    in_hist = F.col("run_id") < F.col("__latest")
    if season_of is not None:  # same-season history (see profile_anomalies)
        in_hist = in_hist & (
            season_of(F.col("run_id")) == season_of(F.col("__latest"))
        )
    h = tagged.filter(in_hist)
    latest = tagged.filter(F.col("run_id") == F.col("__latest")).select(
        "column_name", "stat", "run_id", "value"
    )
    g = h.groupBy("column_name", "stat").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.array_sort(F.collect_list("value")).alias("__vs"),
    )
    q = g.select(
        "column_name",
        "stat",
        F.col("__n").alias("hist_n"),
        F.element_at(
            F.col("__vs"), F.expr("CAST((__n * 25 + 99) DIV 100 AS INT)")
        ).alias("q1"),
        F.element_at(
            F.col("__vs"), F.expr("CAST((__n * 75 + 99) DIV 100 AS INT)")
        ).alias("q3"),
    )
    j = latest.join(q, ["column_name", "stat"], "left")
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - F.lit(int(k)) * iqr
    hi = F.col("q3") + F.lit(int(k)) * iqr
    return j.select(
        "column_name",
        "stat",
        "run_id",
        "value",
        F.coalesce(F.col("hist_n"), F.lit(0)).alias("hist_n"),
        "q1",
        "q3",
        (
            (F.coalesce(F.col("hist_n"), F.lit(0)) >= int(min_history))
            & ((F.col("value") < lo) | (F.col("value") > hi))
        ).alias("is_anomaly"),
    )
