"""Partition-scoped backfill (dynamic partition overwrite).

The reference reprocesses by rerunning the whole dbt build (SURVEY.md
§3.3); at 100 TB a late-arriving batch must instead repair ONLY the
partitions it touches. Spark's dynamic partition-overwrite mode is the
primitive: an overwrite write replaces exactly the partitions present
in the dataframe and leaves every other partition's files untouched —
the plain-parquet equivalent of Delta's `replaceWhere` / Hive's
INSERT OVERWRITE ... PARTITION.

Scale notes:
- The repair recomputes only the affected partitions' slice of the
  fact (a partition-pruned scan driven by the late batch's distinct
  partition values — broadcast semi join), never the full history.
- The write rewrites only those partitions' files; untouched
  partitions keep their exact files (asserted byte-for-byte in
  tests/test_analytics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def overwrite_affected_partitions(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    partition_col: str,
) -> None:
    """Overwrite ONLY the partitions present in ``df`` at ``path``.

    Temporarily flips ``partitionOverwriteMode`` to dynamic — under
    the default (static) mode the same write would TRUNCATE the whole
    table, which is exactly the failure mode this helper fences off.
    """
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set(key, prev)
