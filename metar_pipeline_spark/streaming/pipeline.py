"""Streaming medallion pipeline — the reference's incremental semantics
re-expressed as Structured Streaming (SURVEY.md §2.7).

Reference behavior being reproduced:
- L1/L2 high-watermark filters (`observed > (SELECT max(observed) FROM
  {{this}})`, /root/reference/dbt/models/stg/stg_metar_observations.sql:14-19)
  → event-time watermark on the stream; the file source's exactly-once
  offset tracking subsumes the "only new rows" contract.
- L4 merge materialization (`incremental_strategy='merge'`,
  stg:5-6 / int:4-5) → ``foreachBatch`` + last-writer-wins MERGE
  (sources/merge.py; Delta ``MERGE INTO`` on a lakehouse deployment).
- L6 30-minute cadence (/root/reference/infra/airflow/dags/
  metar_pipeline_dag.py:18) → ``trigger(processingTime="30 minutes")``;
  tests and backfills use ``trigger(availableNow=True)`` (L3 first-run
  full refresh ≡ a catch-up run over all existing files).
- L7 late data: rows older than the watermark are dropped by Spark
  exactly like rows below dbt's high-watermark are silently skipped.

Scale: the file source lists incrementally; state for the windowed
aggregate is bounded by (keys x open windows), and the watermark bounds
open windows. The foreachBatch merge inherits upsert_parquet's
partition-limited rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from metar_pipeline_spark.sources.merge import upsert_parquet

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def idempotent_batch_append(
    df: DataFrame,
    path: str,
    batch_id: int,
    batch_col: str = "_batch",
) -> None:
    """Exactly-once append sink for ``foreachBatch``.

    foreachBatch delivers AT-LEAST-ONCE: if the query dies between the
    sink write and the checkpoint commit, the restart REPLAYS the last
    batch_id, and a plain ``mode("append")`` then duplicates every row
    of that batch. Keying the write by batch_id and overwriting ONLY
    that partition (dynamic partitionOverwriteMode) makes a replay
    rewrite the same ``{batch_col}=N`` directory instead of appending a
    second copy — the sink is idempotent per batch, which combined with
    the checkpoint's monotone batch numbering yields effective
    exactly-once output. (Delta/Iceberg get this from txn log commits;
    this is the plain-parquet form.)

    Readers see ``batch_col`` as an extra partition column: select the
    data columns explicitly. Seed/bootstrap data written OUTSIDE the
    stream must also go through this helper (any negative batch_id) —
    mixing bare files and partition directories under one root breaks
    parquet partition discovery.
    """
    (
        df.withColumn(batch_col, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(batch_col)
        .parquet(path)
    )


def parallel_batch_drops(writes) -> None:
    """Run DISJOINT-path seed/drop writes concurrently from a small
    driver pool (guide §2.6 — overlap independent jobs).

    Round 13: the streaming exhibits seed 2-5 single-file batch drops
    back to back; each write pays a ~0.3-0.5 s plan/commit fixed cost
    while the cluster idles. The callers' mtime pinning (replay order)
    happens AFTER the pool joins, so batch ordering is unchanged.
    ``writes`` is a sequence of zero-arg callables writing disjoint
    paths."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    # Wrap in the CALLING thread (round-13 ADVICE): the wrapper clones
    # the wrapping thread's JVM-local properties (job group/description/
    # scheduler pool), so wrapping inside the pool worker would clone
    # the worker's EMPTY locals — a functional no-op in pinned-thread
    # mode. filelog.append_all has always used this correct pattern.
    wrapped = [inheritable_thread_target(fn) for fn in writes]
    with ThreadPoolExecutor(max_workers=min(len(wrapped), 8)) as pool:
        list(pool.map(lambda f: f(), wrapped))


def read_event_stream(
    spark: SparkSession, source_dir: str, schema: T.StructType | None = None
) -> DataFrame:
    """File-source stream over a directory of parquet drops (S2/S3: the
    bronze append log). Exactly-once per file via checkpoint offsets."""
    return (
        spark.readStream.schema(schema or EVENTS_STREAM_SCHEMA)
        .parquet(source_dir)
    )


def run_latest_per_key_merge(
    spark: SparkSession,
    source_dir: str,
    target_path: str,
    checkpoint_dir: str,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> None:
    """Streaming int-layer: keep the latest row per key (W1 streaming
    analogue, /root/reference/dbt/models/int/int_metar_latest.sql:9-17)
    maintained incrementally via foreachBatch MERGE.

    Each micro-batch is first reduced to its own per-key winner (max_by,
    partial-aggregatable) so the MERGE input is ≤ |keys| rows, then
    merged last-writer-wins into the target. Restarting from the same
    checkpoint processes only new files (L1 incremental contract).
    """
    stream = read_event_stream(spark, source_dir)
    payload = [c for c in stream.columns if c != key]

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        winner = (
            batch.groupBy(key)
            .agg(
                F.max_by(
                    F.struct(*payload),
                    F.struct(F.col(ts_col), F.col(tiebreak)),
                ).alias("__w")
            )
            .select(key, *[f"__w.{c}" for c in payload])
        )
        upsert_parquet(
            spark, winner, target_path, keys=[key], order_col=ts_col
        )

    (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def daily_rollup_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Windowed daily aggregate with watermark (the dwh mart's streaming
    form, /root/reference/dbt/models/dwh/dw_daily_airport_metrics.sql:7-19).

    watermark="0 seconds" reproduces the reference's late-data behavior
    exactly: anything at or before the max seen event time is late and
    dropped (L7); a window emits (append mode) once the watermark passes
    its end.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 day").alias("win"),
            F.col(key),
        )
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_dec"),
            F.max(value_col).alias("max_value"),
            F.min(value_col).alias("min_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("win.start").cast("date").alias("observed_date"),
            F.col(key),
            F.round(F.col("sum_dec").cast("double") / F.col("n_events"), 6).alias(
                "avg_value"
            ),
            "max_value",
            "min_value",
            "n_events",
        )
    )


def run_daily_rollup_append(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    watermark: str = "0 seconds",
    trigger_interval: str | None = None,
):
    """Append-mode daily rollup: emits each (day, key) aggregate once its
    window is sealed by the watermark; output is date-partitioned parquet
    (the partition-pruned gold layout, SURVEY.md §4).

    trigger_interval=None (tests/backfills) runs trigger(availableNow)
    to completion and returns None. A cadence string (the production L6
    shape, e.g. "30 minutes" ≡ the reference's schedule_interval,
    /root/reference/airflow/dags/metar_pipeline_dag.py:18) starts a
    long-lived trigger(processingTime=...) query and RETURNS the
    StreamingQuery — the caller owns its lifecycle."""
    events = read_event_stream(spark, source_dir)
    rolled = daily_rollup_stream(events, watermark=watermark)
    writer = (
        rolled.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("observed_date")
        .outputMode("append")
    )
    if trigger_interval is None:
        writer.trigger(availableNow=True).start().awaitTermination()
        return None
    return writer.trigger(processingTime=trigger_interval).start()


def attribution_join_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_gap: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase matched to the
    clicks of the same key in the preceding ``max_gap`` window.

    Beyond the reference (its joins are batch-only dbt tests); included
    because a streaming engine must bound join state: the watermark +
    the time-range condition let Spark evict buffered rows once they can
    no longer match (state ∝ keys x max_gap of data, not the whole
    stream). Both inputs need a watermark for state cleanup on each
    side — the standard stream-stream interval-join shape from the
    public Structured Streaming guide.
    """
    c = (
        clicks.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("c_key"),
            F.col(ts_col).alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("p_key"),
            F.col(ts_col).alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return p.join(
        c,
        (F.col("p_key") == F.col("c_key"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")
        ),
    ).select(
        F.col("p_key").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def attribution_join_stream_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_gap: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: every purchase emits —
    matched to preceding-``max_gap`` clicks of its key, or with NULL
    click columns once the watermark proves no match can still arrive.

    The semantic difference from the inner form is WHEN the null row
    can be emitted: a buffered unmatched purchase is released only
    after the watermark passes the latest click time that could match
    it (here click_ts ≤ purchase_ts, so after purchase_ts itself).
    State stays keys × max_gap like the inner join; the null emission
    is what makes outer stream-stream joins the canonical "eventual
    completeness" exhibit. On bounded availableNow input the final
    no-data micro-batch flushes state against the terminal watermark,
    so purchases at the stream's maximum event time may remain
    unemitted — callers bound the input accordingly (see the
    registered query, which excludes the terminal instant on both
    engines).
    """
    c = (
        clicks.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("c_key"),
            F.col(ts_col).alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("p_key"),
            F.col(ts_col).alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return p.join(
        c,
        (F.col("p_key") == F.col("c_key"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap}")
        ),
        "leftOuter",
    ).select(
        F.col("p_key").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )
