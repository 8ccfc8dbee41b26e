"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4).

The reference's Postgres tables are unpartitioned heaps (its data fits
one node); at 100 TB the dominant cost of a fact-fact join
(lineitem ⋈ orders on the orderkey) is the shuffle of both sides. If
both tables are written bucketed **by the join key into the same number
of buckets**, Spark's scan is already hash-distributed: the join planner
drops both Exchanges and sort-merge-joins bucket-to-bucket. The write
pays the shuffle once; every subsequent join of the pair is
exchange-free.

Bucketing requires the session catalog (``saveAsTable``); plain
path-based parquet has no bucket metadata. Bucket count is chosen once
per table pair (powers of two compose: a 512-bucket table co-locates
with a 512-bucket table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally removes the per-task Sort from
    later sort-merge joins on the bucket key.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_pair(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    num_buckets: int,
    names: tuple[str, str] = ("__bk_left", "__bk_right"),
) -> tuple[DataFrame, DataFrame]:
    """Write both sides bucketed on their join keys and return the
    bucket-aware scans. Joining the returned frames on
    ``key_left == key_right`` plans with NO Exchange on either side."""
    write_bucketed(left, names[0], [key_left], num_buckets)
    write_bucketed(right, names[1], [key_right], num_buckets)
    return spark.table(names[0]), spark.table(names[1])
