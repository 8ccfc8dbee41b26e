"""Streaming corpus-drift monitor: per-micro-batch unigram
Jensen-Shannon divergence against a broadcast reference distribution.

The batch twin (``operators/corpus_ops.unigram_js_divergence``) diffs
two corpus slices after the fact; an ingest pipeline wants the drift
signal AS BATCHES ARRIVE — "this hour's crawl shard looks nothing like
the curated reference" is an alert, not a retrospective. This module
scores each document micro-batch against a fixed reference unigram
distribution and appends one (batch_id, n_tokens, vocab, jsd_nats)
row per batch to a metrics store — the same land-a-row-per-batch shape
as streaming/monitor.py, but content drift instead of throughput.

Scale shape: the reference distribution is vocab-grain (sublinear;
optionally truncated to its top-V mass) and BROADCAST; each micro-batch
pays one explode + vocab-grain hash aggregate + broadcast join — no
state operator, no watermark, nothing carried between batches, so
state size is zero regardless of stream length. The JSD term uses the
0·ln(0/m) := 0 convention on both sides; reference mass absent from
the batch still contributes (the sum over the reference side runs on
the broadcast frame joined full-outer at vocab grain).

Determinism: per-batch output depends only on the batch's rows and the
reference — DECIMAL(38,18) term accumulation, same as the batch twin.
Sinks go through ``idempotent_batch_append`` so an at-least-once
replay overwrites its own ``_batch=N`` partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metar_pipeline_spark.operators import textops as tx
from metar_pipeline_spark.streaming.pipeline import idempotent_batch_append


def reference_unigrams(
    docs: DataFrame, text_col: str = "text", top_v: int | None = None
) -> DataFrame:
    """Build the reference distribution: (w, p_ref) with Σ p_ref = 1.

    ``top_v`` keeps only the most frequent V words (renormalized) —
    the broadcastable truncation for open-vocabulary corpora; drift in
    the dropped tail then shows up as batch mass on unmatched words,
    which the scorer counts against m correctly.
    """
    counts = (
        docs.select(F.explode(tx.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    if top_v is not None:
        counts = counts.orderBy(F.desc("c"), F.asc("w")).limit(top_v)
    counts = counts.localCheckpoint(eager=True)  # consumed twice below
    total = counts.agg(F.sum("c").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("w", (F.col("c").cast("double") / F.col("t")).alias("p_ref"))
    )


def batch_jsd(batch: DataFrame, reference: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row frame: (n_tokens, vocab, jsd_nats) of ``batch`` vs the
    reference distribution (full-outer at vocab grain: words on either
    side only still contribute their term)."""
    q = (
        batch.select(F.explode(tx.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cq"))
        .localCheckpoint(eager=True)
    )
    tq = q.agg(F.sum("cq").alias("tq"))
    joined = (
        q.join(F.broadcast(reference), "w", "full_outer")
        .crossJoin(F.broadcast(tq))
        .select(
            F.col("cq"),
            F.coalesce(F.col("p_ref"), F.lit(0.0)).alias("p"),
            (
                F.coalesce(F.col("cq"), F.lit(0)).cast("double")
                / F.col("tq")
            ).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / F.lit(2.0)
    term = F.when(
        F.col("p") > 0, F.lit(0.5) * F.col("p") * F.log(F.col("p") / m)
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("q") > 0, F.lit(0.5) * F.col("q") * F.log(F.col("q") / m)
    ).otherwise(F.lit(0.0))
    return joined.agg(
        F.sum(F.when(F.col("cq").isNotNull(), F.col("cq")).otherwise(0))
        .alias("n_tokens"),
        F.sum(F.when(F.col("cq").isNotNull(), 1).otherwise(0)).alias("vocab"),
        F.round(
            F.sum(term.cast("decimal(38,18)")).cast("double"), 6
        ).alias("jsd_nats"),
    )


def run_drift_monitor(
    spark: SparkSession,
    source_dir: str,
    reference: DataFrame,
    metrics_dir: str,
    checkpoint_dir: str,
    schema,
    text_col: str = "text",
):
    """Attach the drift scorer to a file stream of documents.

    Each micro-batch lands exactly one row in ``metrics_dir``
    (partitioned ``_batch=N`` — replay-idempotent). Returns the
    StreamingQuery; callers own its lifecycle.
    """
    ref = reference.localCheckpoint(eager=True)

    def score(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        row = batch_jsd(batch, ref, text_col).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        idempotent_batch_append(row, metrics_dir, batch_id)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
