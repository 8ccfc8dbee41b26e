"""dbt-style data-quality assertions as first-class operators.

Each mirrors a dbt generic/singular test used by the reference
(SURVEY.md §2.10 Q1-Q5):

- not_null        → dbt not_null (dbt/models/stg/schema.yml:15,22,51,57)
- unique          → dbt unique (stg/schema.yml:16, dwh/schema.yml:13)
- accepted_values → stg.icao ∈ 20-value list (stg/schema.yml:23-45)
- relationships   → dwh.icao ⊆ stg.icao (dwh/schema.yml:19-22)
- singular        → arbitrary no-rows predicate, e.g. visibility_m < 0
                    (dbt/tests/not_negative_visibility.sql:1-3)

An assertion evaluates to the DataFrame of VIOLATING rows; ``passed``
means zero violations. ``run_assertions`` evaluates a suite with one
Spark action per assertion (counts are cheap aggregates, fully
distributed — no collect of data rows).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Assertion:
    name: str
    severity: str  # "error" | "warn" (dbt severity, stg/schema.yml:54-60)
    violations: Callable[[], DataFrame]


def not_null(df: DataFrame, col: str, severity: str = "error") -> Assertion:
    return Assertion(
        f"not_null_{col}", severity, lambda: df.filter(F.col(col).isNull())
    )


def unique(df: DataFrame, *cols: str, severity: str = "error") -> Assertion:
    def _v() -> DataFrame:
        return (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
        )

    return Assertion("unique_" + "_".join(cols), severity, _v)


def accepted_values(
    df: DataFrame, col: str, values: list, severity: str = "error"
) -> Assertion:
    return Assertion(
        f"accepted_values_{col}",
        severity,
        lambda: df.filter(
            F.col(col).isNotNull() & ~F.col(col).isin(values)
        ),
    )


def relationships(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str,
    severity: str = "error",
) -> Assertion:
    def _v() -> DataFrame:
        return child.filter(F.col(child_key).isNotNull()).join(
            F.broadcast(
                parent.select(F.col(parent_key).alias(child_key)).distinct()
            ),
            child_key,
            "left_anti",
        )

    return Assertion(f"relationships_{child_key}", severity, _v)


def singular(
    name: str, df: DataFrame, predicate: Column, severity: str = "error"
) -> Assertion:
    """Query-returns-no-rows convention: rows matching ``predicate`` are
    violations."""
    return Assertion(name, severity, lambda: df.filter(predicate))


def run_assertions(assertions: list[Assertion]) -> list[dict]:
    """Evaluate a suite; returns [{name, severity, violations, passed}]."""
    results = []
    for a in assertions:
        n = a.violations().count()
        results.append(
            {
                "name": a.name,
                "severity": a.severity,
                "violations": n,
                "passed": n == 0,
            }
        )
    return results


def quarantine_violations(
    assertions: list[Assertion], store_path: str, run_id: int
) -> list[dict]:
    """``run_assertions`` + dead-letter persistence: each failing
    assertion's VIOLATING ROWS are written to
    ``{store}/{assertion_name}/_run={run_id}`` — the way dbt's
    ``store_failures`` materializes a relationships/unique test's
    failing keys (reference surfaces them per dwh/schema.yml:19-22) so
    an operator can inspect, replay, or backfill the quarantined rows
    instead of just reading a count.

    Per-assertion subdirectories keep heterogeneous violation schemas
    apart; the ``_run`` partition key makes a re-run of the same
    ``run_id`` idempotent (dynamic partition overwrite, the same
    exactly-once contract as the streaming sinks). Violation frames are
    assertion outputs (small by contract — a healthy pipeline
    quarantines ~0 rows), so the count-then-write double evaluation is
    the affordable form of dbt's CTAS-then-count.

    Cost attribution (round 9): the pass-transition cleanup below is
    ONE fs.exists per passing assertion per run — already guarded (the
    delete only fires when a stale ``_run=N`` partition actually
    exists), µs-scale on any filesystem and independent of data size.
    The r8 bench reading that suggested it doubled quarantine_fk_rows
    did not reproduce isolated (~1.0 s warm at sf0.1, in line with the
    r7 number — in-bench order effects, see README bench variance)."""
    import os

    results = []
    for a in assertions:
        v = a.violations()
        n = v.count()
        if n:
            (
                v.withColumn("_severity", F.lit(a.severity))
                .withColumn("_run", F.lit(int(run_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_run")
                .parquet(os.path.join(store_path, a.name))
            )
        else:
            # Pass-transition idempotency: a rerun of run_id whose
            # violations dropped to zero must not leave the previous
            # attempt's _run=N partition behind (the store would show
            # stale quarantined rows for a run the results list
            # reports as passed). Drop that one partition if present.
            spark = v.sparkSession
            part = os.path.join(
                store_path, a.name, f"_run={int(run_id)}"
            )
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(part)
            fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(hpath):
                fs.delete(hpath, True)
        results.append(
            {
                "name": a.name,
                "severity": a.severity,
                "violations": n,
                "passed": n == 0,
            }
        )
    return results


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column batch profile (count / null-rate / min / max) — the
    engine's approximation of elementary.column_anomalies (Q6,
    /root/reference/dbt/models/stg/schema.yml:9,17). Append per batch to
    a metrics table and alert on deltas."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__count"),
            F.avg(F.col(c).isNull().cast("double")).alias(f"{c}__null_rate"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    return df.agg(*aggs)
