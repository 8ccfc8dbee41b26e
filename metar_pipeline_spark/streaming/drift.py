"""Streaming corpus-drift monitor: per-micro-batch unigram
Jensen-Shannon divergence against a broadcast reference distribution.

The batch twin (``operators/corpus_ops.unigram_js_divergence``) diffs
two corpus slices after the fact; an ingest pipeline wants the drift
signal AS BATCHES ARRIVE — "this hour's crawl shard looks nothing like
the curated reference" is an alert, not a retrospective. This module
scores each document micro-batch against a unigram reference — either
FIXED (``run_drift_monitor``: a curated target distribution) or
TRAILING (``run_trailing_drift_monitor``: everything ingested before
this batch, via a ``_batch``-partitioned counts store read with the
strictly-earlier contract) — and appends one (batch_id, n_tokens,
vocab, jsd_nats) row per batch to a metrics store — the same
land-a-row-per-batch shape as streaming/monitor.py, but content drift
instead of throughput.

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


def unigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, c) token counts — one explode pass, map-side combined."""
    return (
        docs.select(F.explode(tx.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )


def counts_to_distribution(counts: DataFrame) -> DataFrame:
    """Normalize a (w, c) counts frame to (w, p_ref) with Σ p_ref = 1.

    The counts frame is checkpointed (two consumers: the totals row
    and the normalized output) — vocab grain, sublinear in corpus."""
    cc = counts.localCheckpoint(eager=True)
    total = cc.agg(F.sum("c").alias("t"))
    return cc.crossJoin(F.broadcast(total)).select(
        "w", (F.col("c").cast("double") / F.col("t")).alias("p_ref")
    )


def reference_unigrams(
    docs: DataFrame, text_col: str = "text", top_v: int | None = None
) -> DataFrame:
    """Build the reference distribution: (w, p_ref) with Σ p_ref = 1.

    ``top_v`` keeps only the most frequent V words (renormalized) —
    the broadcastable truncation for open-vocabulary corpora; drift in
    the dropped tail then shows up as batch mass on unmatched words,
    which the scorer counts against m correctly.
    """
    counts = unigram_counts(docs, text_col)
    if top_v is not None:
        counts = counts.orderBy(F.desc("c"), F.asc("w")).limit(top_v)
    return counts_to_distribution(counts)


def _jsd_of_counts_vs_ref(q: DataFrame, reference: DataFrame) -> DataFrame:
    """One-row (n_tokens, vocab, jsd_nats): batch counts ``q`` (w, cq —
    already checkpointed by the caller; two consumers) against a
    (w, p_ref) distribution, full-outer at vocab grain so words on
    either side only still contribute their term."""
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


def batch_jsd(
    batch: DataFrame, reference: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One-row frame: (n_tokens, vocab, jsd_nats) of ``batch``'s text
    against a fixed (w, p_ref) reference distribution."""
    q = (
        unigram_counts(batch, text_col)
        .select("w", F.col("c").alias("cq"))
        .localCheckpoint(eager=True)
    )
    return _jsd_of_counts_vs_ref(q, reference)


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

def _store_has_data_files(fs, jvm_path) -> bool:
    """True iff the store directory holds at least one DATA file —
    Spark's own hidden-path rule (a segment starting with ``_`` and
    not containing ``=``, or starting with ``.``, is invisible), so
    ``_SUCCESS``, ``.crc`` sidecars, and ``_temporary`` leftovers of a
    crashed write don't count, while ``_batch=N`` partition dirs do.
    Only segments BELOW the store root are inspected (the root's own
    ancestors may legitimately contain underscore names)."""
    root = jvm_path.toUri().getPath().rstrip("/")
    it = fs.listFiles(jvm_path, True)
    while it.hasNext():
        p = it.next().getPath().toUri().getPath()
        rel = p[len(root):] if p.startswith(root) else p
        hidden = any(
            (s.startswith("_") and "=" not in s) or s.startswith(".")
            for s in rel.split("/")
            if s
        )
        if not hidden:
            return True
    return False


def run_trailing_drift_monitor(
    spark: SparkSession,
    source_dir: str,
    counts_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    schema,
    text_col: str = "text",
    max_files_per_trigger: int = 1,
):
    """Drift vs HISTORY: score each micro-batch against the unigram
    distribution of all STRICTLY-EARLIER batches, then fold the batch's
    own counts into the store.

    The trailing store is (w, c) partitioned by ``_batch`` — each
    batch appends its vocab-grain counts once; the reference for batch
    N aggregates partitions ``_batch < N`` (the same strictly-earlier
    contract stream_ingest_dedup uses), so a crash-replay of batch N
    sees exactly the state the first attempt saw and lands identical
    metric VALUES, not just identical row counts. Batch 0 has no
    reference and lands ``jsd_nats = NULL`` (the documented cold-start
    row) — its counts still seed the store.

    Per batch: one explode + vocab hash-agg (checkpointed — feeds both
    the score and the store append), one partition-pruned store read
    aggregated to vocab grain, the broadcast full-outer JSD join. No
    streaming state operator; the store IS the state, replay-safe.
    """
    def score(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        if batch.isEmpty():
            return
        bc = unigram_counts(batch, text_col).localCheckpoint(eager=True)
        # Cold start is decided by explicit store-path inspection, NOT
        # by catching read errors: a transient IO failure or corrupt
        # store masked as "first batch" would land a NULL-jsd row for
        # batch N>0, and a later replay of that batch (store readable
        # again) would land DIFFERENT values — violating this module's
        # replay-identical-values contract. Real read errors must fail
        # the batch so the checkpoint retries it. "Exists" alone is not
        # enough (round-9 ADVICE): a crashed first-batch write can
        # leave the dir holding only _temporary/_SUCCESS leftovers, and
        # spark.read.parquet over a dataless dir throws on EVERY retry
        # — a permanently poisoned batch. A store with no DATA files is
        # therefore cold start too; only genuine read/corruption errors
        # surface from the read below.
        jvm_path = sp._jvm.org.apache.hadoop.fs.Path(counts_dir)
        fs = jvm_path.getFileSystem(
            sp._jsc.hadoopConfiguration()
        )
        have_prior = False
        if fs.exists(jvm_path) and _store_has_data_files(fs, jvm_path):
            prior = (
                sp.read.parquet(counts_dir)
                .filter(F.col("_batch") < batch_id)
                .groupBy("w")
                .agg(F.sum("c").alias("c"))
            )
            have_prior = not prior.isEmpty()
        if have_prior:
            ref = counts_to_distribution(prior)
            # bc is already checkpointed — the rename projection on top
            # of it re-reads checkpoint blocks, never the source
            q = bc.select("w", F.col("c").alias("cq"))
            row = _jsd_of_counts_vs_ref(q, ref)
        else:
            row = bc.agg(
                F.sum("c").alias("n_tokens"),
                F.count("*").alias("vocab"),
                F.lit(None).cast("double").alias("jsd_nats"),
            )
        row = row.withColumn("batch_id", F.lit(batch_id).cast("long"))
        idempotent_batch_append(row, metrics_dir, batch_id)
        idempotent_batch_append(bc, counts_dir, batch_id)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("recursiveFileLookup", "true")
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
