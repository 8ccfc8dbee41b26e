"""Grouped ordinary-least-squares trend fitting.

The reference aggregates daily means (dbt/models/dwh/
dw_daily_airport_metrics.sql:7-29) but has no trend primitive; any
monitoring deployment on top of it ("is temperature drifting?") needs
per-key slope/intercept/R² over time. This is the distributed-moments
pattern (see queries/timeseries_q.py stats_moments_exact): OLS over
(x, y) needs only the five power sums n, Σx, Σy, Σxx, Σxy (+Σyy for
R²), each a plain partial+final hash aggregate.

Scale notes:
- ONE aggregation pass, map-side partial combine, shuffle carries six
  numbers per group — the cheapest possible shape at 100 TB.
- Sums accumulate in DECIMAL so the result is bit-identical under any
  partition order / AQE re-plan (float accumulation order drifts).
- No window, no sort, no UDF: the whole fit is JVM column math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    round_to: int = 6,
) -> DataFrame:
    """Per-group least-squares fit of ``y = slope * x + intercept``.

    Returns one row per group: n, slope, intercept, r2 (all doubles,
    rounded to ``round_to``). Groups with a degenerate x-variance
    (single point or constant x) yield NULL slope/intercept/r2.
    """

    def dsum(col: Column) -> Column:
        return F.sum(col.cast(DEC)).cast("double")

    s = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
        dsum(x * y).alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    den_x = n * sxx - sx * sx  # n² · var(x); 0 → vertical/degenerate fit
    den_y = n * syy - sy * sy  # n² · var(y); 0 → R² undefined
    slope = F.when(den_x != 0, (n * sxy - sx * sy) / den_x)
    intercept = F.when(den_x != 0, (sy - ((n * sxy - sx * sy) / den_x) * sx) / n)
    r2 = F.when(
        (den_x != 0) & (den_y != 0),
        (n * sxy - sx * sy) * (n * sxy - sx * sy) / (den_x * den_y),
    )
    return s.select(
        *group_cols,
        "n",
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )
