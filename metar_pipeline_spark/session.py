"""SparkSession factory with scale-aware defaults.

The reference delegates all execution to single-node Postgres 16
(/root/reference/infra/docker-compose.yml:33-51); here the executor is
Spark. Defaults below are chosen so the same code runs on local[32] for
tests and on a 1000-executor cluster unchanged:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting mean
  we do not hand-tune partition counts per scale factor.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; on a
  real cluster raise via SPARK_GRAFT_SHUFFLE_PARTITIONS (rule of thumb:
  2-3x total cores, or ~128MB per shuffle partition at 100 TB).
- Session timezone pinned to UTC to match the collector's
  ``datetime.utcnow()`` stamps (/root/reference/src/collector/main.py:90)
  and keep timestamp semantics identical to the DuckDB oracle.
- Arrow enabled for the few Pandas-UDF operators (vector ops fallback,
  multimodal decode plumbing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "metar-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Env overrides: SPARK_GRAFT_CPUS (local parallelism),
    SPARK_GRAFT_SHUFFLE_PARTITIONS.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime bloom-filter join pruning (fact-fact joins): when one
        # side carries a selective filter, Catalyst injects
        # bloom_filter_agg on it and BloomFilterMightContain on the
        # other side's scan, pruning shuffle input before the join. The
        # built-in size thresholds (creation side ≥10MB, application
        # side ≥10GB scan) keep it a no-op at test scale and a large
        # win at 100 TB. Plan pinned in tests/test_plans.py.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata parquet stamps are naive (isAdjustedToUTC=false); read
        # them as session-tz TIMESTAMP (UTC) — same wall-clock values the
        # DuckDB oracle sees — instead of TIMESTAMP_NTZ, which many
        # engine ops (epoch casts, unix_timestamp) reject.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # parquet scans: vectorized reader + pushdown are on by default;
        # keep files splittable at ~128MB so a 100 TB table yields ~800k
        # well-sized input partitions instead of a few huge ones.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
