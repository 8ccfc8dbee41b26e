"""Keyed table diff / reconciliation.

The reference's EL step copies a Mongo collection into Postgres and
trusts the upsert (reference: el/mongo_to_postgres.py:89-112); any
production deployment eventually needs the audit that says the copy is
actually faithful — the table-diff every migration, backfill, or
engine swap is validated with (Datafold/data-diff style).

Scale notes:
- ONE full-outer join on the key — the only unavoidable shuffle; both
  sides are reduced to (key, row-digest) BEFORE the exchange, so what
  crosses the wire is two hashes per row, never the row payloads.
- Classification (added / removed / changed / identical) is pure
  column math on the joined digests.
- The summary is a partial+final count aggregate; the optional sample
  keeps per-class examples via a bounded rank (WindowGroupLimit), not
  a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _digest(df: DataFrame, keys: list[str], cols: list[str]):
    """(key..., digest): xxhash64 over the non-key columns, NULL-safe
    (a sentinel keeps NULL distinct from the empty string)."""
    parts = []
    for c in cols:
        parts.append(
            F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
        )
    return df.select(*keys, F.xxhash64(*parts).alias("digest"))


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff verdicts: (key..., status) with status in
    {'added', 'removed', 'changed', 'identical'} — 'added' means
    present only in ``right``.

    Both sides must be key-unique (dedupe upstream; this operator
    audits content, not cardinality).
    """
    if compare_cols is None:
        compare_cols = [c for c in left.columns if c not in keys]
    lh = _digest(left, keys, compare_cols).withColumnRenamed("digest", "_dl")
    rh = _digest(right, keys, compare_cols).withColumnRenamed("digest", "_dr")
    j = lh.join(rh, keys, "full_outer")
    status = (
        F.when(F.col("_dl").isNull(), F.lit("added"))
        .when(F.col("_dr").isNull(), F.lit("removed"))
        .when(F.col("_dl") == F.col("_dr"), F.lit("identical"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, status.alias("status"))


def table_diff_summary(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    sample_per_class: int = 0,
) -> DataFrame:
    """One row per status class with its key count; with
    ``sample_per_class`` > 0 adds a deterministic example-key list
    (lowest keys first) without any driver-side collection."""
    d = table_diff(left, right, keys, compare_cols)
    counts = d.groupBy("status").agg(F.count(F.lit(1)).alias("n_keys"))
    if not sample_per_class:
        return counts
    w = Window.partitionBy("status").orderBy(*[F.asc(k) for k in keys])
    samples = (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= sample_per_class)
        .groupBy("status")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(*[F.col(k) for k in keys]))
                    ),
                    lambda s: s.getField(keys[0]).cast("string"),
                ),
            ).alias("example_keys")
        )
    )
    return counts.join(samples, "status", "left")
