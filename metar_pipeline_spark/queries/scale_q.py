"""Scale-technique queries: skew salting and bucketed co-location.

These register the skew operators (operators/skew.py) against the
oracle: salting is result-transparent, so the oracle SQL is simply the
UNSALTED form — the hash match proves the two-stage rewrite is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.skew import salted_agg, salted_join
from metar_pipeline_spark.queries import register
from metar_pipeline_spark.queries.core import DEC2, _dsum


@register(
    "salted_user_value_sums",
    """
    SELECT user_id,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
    doc="Skew-safe two-stage salted aggregation — output identical to the direct groupBy",
)
def salted_user_value_sums(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = salted_agg(
        events,
        keys=["user_id"],
        salt_source="event_id",
        partials={
            "n_events": (F.count(F.lit(1)), F.sum("n_events")),
            "sum_dec": (
                F.sum(F.col("value").cast(DEC2)),
                F.sum("sum_dec"),
            ),
            "max_value": (F.max("value"), F.max("max_value")),
        },
        n_salts=8,
    )
    return out.select(
        "user_id",
        "n_events",
        F.round(F.col("sum_dec").cast("double"), 2).alias("sum_value"),
        "max_value",
    )


@register(
    "salted_join_event_suppliers",
    """
    SELECT e.user_id, s.s_name, COUNT(*) AS n_events
    FROM events e
    JOIN supplier s ON e.user_id = s.s_suppkey
    GROUP BY e.user_id, s.s_name
    """,
    doc="Skew-safe salted equi-join (dim replicated across salts) — output identical to the plain join",
)
def salted_join_event_suppliers(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    joined = salted_join(
        events,
        supplier,
        fact_key="user_id",
        dim_key="s_suppkey",
        salt_source="event_id",
        n_salts=8,
    )
    return joined.groupBy("user_id", "s_name").agg(
        F.count(F.lit(1)).alias("n_events")
    )


_STREAM_SEQ = [0]


def _event_file_stream(spark, sf_dir):
    """(stream_df, ts_expr) for a file stream over events.parquet.

    File streams need an explicit schema; derive it from a batch read
    of the same file so the stream matches whatever flavor the
    generator wrote (TIMESTAMP(NANOS) → LongType under nanosAsLong;
    micros NTZ/LTZ → TimestampType). Single source of truth for the
    timestamp-flavor handling on the STREAM side — the batch side's
    twin is io.load_table."""
    import os

    from metar_pipeline_spark.io import _read_cached_schema

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # schema via the process-wide catalog cache (io.py) — no
    # per-query schema-inference job
    raw = _read_cached_schema(spark, os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes).get("ts") == "bigint":
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts = F.col("ts").cast("timestamp")
    # File streams take a directory; pick the events file by glob.
    stream = (
        spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream, ts



@register(
    "stream_daily_rollup_complete",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2)
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "Structured Streaming oracle-parity DEMO: the daily rollup as a "
        "file-source stream in complete mode must hash-match the plain "
        "batch SQL — proves the micro-batch path computes the same "
        "algebra as the batch engine. Demo only: complete mode re-emits "
        "the whole aggregate each batch and never evicts state, so the "
        "scale path is stream_daily_rollup_append (watermarked append, "
        "bounded state), not this."
    ),
)
def stream_daily_rollup_complete(spark, sf_dir):
    stream, ts = _event_file_stream(spark, sf_dir)
    agg = (
        stream.select(
            F.to_date(ts).alias("day"), "event_type", "value"
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(_dsum(F.col("value")), 2).alias("sum_value"),
        )
    )
    _STREAM_SEQ[0] += 1
    name = f"__stream_rollup_{_STREAM_SEQ[0]}"
    # Stateful-stream partitioning is pinned at query start and sized by
    # OUTPUT group cardinality (~150 day×type groups ⇒ a handful of
    # state stores), not input size — 32 state-store instances for 150
    # groups is pure per-batch overhead (measured 3.5x slower). At real
    # scale raise it toward the session default before first start; it
    # is sticky in the checkpoint thereafter.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


@register(
    "stream_daily_rollup_append",
    """
    WITH mx AS (SELECT max(ts) AS mts FROM events)
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2)
               AS sum_value
    FROM events, mx
    WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= mx.mts
    GROUP BY 1, 2
    """,
    doc=(
        "The PRODUCTION streaming rollup: watermarked event-time window "
        "in APPEND mode — each (day, type) aggregate is emitted exactly "
        "once when the watermark seals its window, and its state is "
        "evicted, so state is bounded by open windows, not stream "
        "history (complete mode above is the oracle-parity demo only). "
        "The oracle is the batch SQL restricted to sealed windows: every "
        "day whose end <= max event time — the still-open last day is "
        "correctly withheld by both sides."
    ),
)
def stream_daily_rollup_append(spark, sf_dir):
    import os
    import shutil
    import tempfile

    stream, ts = _event_file_stream(spark, sf_dir)
    agg = (
        stream.select(ts.alias("ets"), "event_type", "value")
        .withWatermark("ets", "0 seconds")
        .groupBy(F.window("ets", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(_dsum(F.col("value")), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    out_dir = tempfile.mkdtemp(prefix="stream_rollup_append_")
    ckpt = os.path.join(out_dir, "_ckpt")
    data = os.path.join(out_dir, "data")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.format("parquet")
            .option("path", data)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # materialize the sealed-window result off the temp dir before it
        # is removed: localCheckpoint(eager) pins the partitions in the
        # block manager, so no driver-side collect round-trip is needed
        result = (
            spark.read.schema(agg.schema)
            .parquet(data)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(out_dir, ignore_errors=True)
    return result


# approx_distinct_users_by_type and hll_mergeable_daily_users (the two
# permanent rows-only DataSketches-HLL registrations) were RETIRED in
# round 11 in favor of the oracle-verified FM twins below — with them
# gone, EVERY registered query is hash-verified against the DuckDB
# oracle. The HLL operators (sketches.approx_distinct_by /
# partial_then_union) remain, with their <2% calibration and
# shard-merge ≡ single-pass contracts asserted in
# tests/test_scale_ops.py — DataSketches estimates are
# implementation-private, so they can never hash-match a second engine.
def _fm_grouped_oracle(
    group_sql: str, group_alias: str, m: int = 64, shards: "int | None" = None
) -> str:
    """Grouped twin of _fm_oracle: per-group m MINs (the oracle needs
    no shard level — merging shards' mins IS the same MIN, which is
    exactly the property the Spark side demonstrates when ``shards``
    is set there)."""
    from metar_pipeline_spark.operators.sketches import _CMS_P, fm_constants

    h1s, mins = [], []
    for i in range(m):
        a1, b1, a2 = fm_constants(i)
        h1s.append(f"(user_id * {a1} + {b1}) % {_CMS_P} AS h{i}")
        mins.append(
            f"MIN(CAST((h{i} * h{i} + h{i} * {a2}) % {_CMS_P} AS DOUBLE)"
            f" / {_CMS_P}.0) AS m{i}"
        )
    chain = "m0"
    for i in range(1, m):
        chain = f"({chain} + m{i})"
    return f"""
    WITH hx AS (
      SELECT {group_sql} AS {group_alias}, user_id, {", ".join(h1s)}
      FROM events
    ),
    s AS (
      SELECT {group_alias},
             COUNT(DISTINCT user_id) AS n_exact, {", ".join(mins)}
      FROM hx GROUP BY 1
    )
    SELECT {group_alias},
           CAST(n_exact AS BIGINT) AS n_exact,
           round({m}.0 / {chain} - 1.0, 2) AS n_est
    FROM s
    """


@register(
    "fm_distinct_users_by_type",
    _fm_grouped_oracle("event_type", "event_type"),
    doc=(
        "Per-group approximate distinct, ORACLE-VERIFIED (replaces the "
        "rows-only DataSketches-HLL registration — same question, "
        "engine-portable estimator): per-event-type FM m-mins user "
        "cardinality (m=64, rel. error ~1/√m), all 64 MINs map-side "
        "combinable per group in ONE scan; the exact COUNT(DISTINCT) "
        "rides along as the calibration column (the expensive path "
        "being replaced at 100 TB). DuckDB replays every min."
    ),
)
def fm_distinct_users_by_type(spark, sf_dir):
    # Round 13 (guide §1.2 fixed costs): the one-pass wide aggregate is
    # the right EXECUTION shape (0.8 s of jobs — all 64 MINs map-side
    # combinable in one scan), but building it Column-by-Column cost
    # 2.4 s of py4j round-trips per call. The same expression tree is
    # now built as SQL strings (sketches.fm_min_exprs /
    # fm_estimate_expr — verified bit-identical), one parser call per
    # aggregate. A long/exploded form was tried and REJECTED: 64×N
    # exploded rows made execution 6.1 s of jobs on the full events
    # table (see OPTIMIZATION_r13.md).
    from metar_pipeline_spark.operators.sketches import (
        fm_estimate_expr,
        fm_min_exprs,
    )

    events = load_table(spark, sf_dir, "events")
    m = 64
    s = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact"),
        *fm_min_exprs("user_id", m),
    )
    return s.select(
        "event_type",
        "n_exact",
        F.round(fm_estimate_expr(m), 2).alias("n_est"),
    )


@register(
    "fm_mergeable_daily_users",
    _fm_grouped_oracle("CAST(date_trunc('day', ts) AS DATE)", "day"),
    doc=(
        "The mergeable-summary shape a 1000-executor cluster uses, "
        "ORACLE-VERIFIED (replaces the rows-only HLL registration): "
        "per-(day, shard) partial FM sketches (event_id mod 4 shards "
        "— one 64-double row per shard crosses the wire, never the "
        "distinct user set) merged to day grain by element-wise MIN — "
        "for the m-mins sketch the merge of shards' mins IS the same "
        "MIN, so the oracle's direct single-pass per-day sketch "
        "proves shard-merge ≡ whole at the gate; exact COUNT(DISTINCT) "
        "as the calibration column."
    ),
)
def fm_mergeable_daily_users(spark, sf_dir):
    # Round 13 (guide §1.2): same py4j-construction fix as
    # fm_distinct_users_by_type — identical wide shard-merge shape
    # (partial per-(day, shard) sketches merged by element-wise MIN),
    # expressions built as SQL strings (bit-identical, verified).
    from metar_pipeline_spark.operators.sketches import (
        fm_estimate_expr,
        fm_min_exprs,
    )

    events = load_table(spark, sf_dir, "events")
    m = 64
    keyed = events.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "user_id",
        F.pmod(F.col("event_id"), F.lit(4)).alias("__shard"),
    )
    partial = keyed.groupBy("day", "__shard").agg(
        *fm_min_exprs("user_id", m)
    )
    merged = partial.groupBy("day").agg(
        *[F.expr(f"min(__fm{i}) AS __fm{i}") for i in range(m)]
    )
    exact = keyed.groupBy("day").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    return exact.join(merged, "day").select(
        "day", "n_exact", F.round(fm_estimate_expr(m), 2).alias("n_est")
    )


# approx_value_quantiles_by_type (rows-only percentile_approx query)
# was RETIRED in round 11 in favor of kmv_quantile_sketch_value below:
# Greenwald-Khanna outputs are implementation-defined (compaction
# schedule), so that query could never be hash-verified. The
# percentile_approx operator (sketches.approx_quantiles_by) remains,
# with its rank-error bound asserted in tests/test_scale_ops.py.
def _kmv_oracle(k: int = 256, pcts: tuple = (25, 50, 75, 90)) -> str:
    """Literal twin of kmv_quantile_sketch_value: the same fm_hash01
    row-0 bottom-k sample, then exact order statistics at the
    integer ceil-div ranks."""
    from metar_pipeline_spark.operators.sketches import _CMS_P, fm_constants

    a1, b1, a2 = fm_constants(0)
    picks = ",\n           ".join(
        f"round(MAX(CASE WHEN rn = CAST(floor((n * {p} + 99) / 100.0)"
        f" AS INT) THEN value END), 6) AS p{p}"
        for p in pcts
    )
    return f"""
    WITH hx AS (
      SELECT event_type, event_id, value,
             (event_id * {a1} + {b1}) % {_CMS_P} AS h1
      FROM events WHERE value IS NOT NULL
    ),
    hu AS (
      SELECT event_type, event_id, value,
             CAST((h1 * h1 + h1 * {a2}) % {_CMS_P} AS DOUBLE)
               / {_CMS_P}.0 AS u
      FROM hx
    ),
    samp AS (
      SELECT * FROM hu
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY u, event_id
      ) <= {k}
    ),
    r AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM samp
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_sample,
           {picks}
    FROM r GROUP BY event_type
    """


@register(
    "kmv_quantile_sketch_value",
    _kmv_oracle(),
    doc=(
        "Deterministic mergeable QUANTILE sketch — completes the "
        "oracle-verified sketch family (frequency: CMS, distinct: FM, "
        "quantiles: this): a bottom-k (KMV) sample per event type "
        "keeps the 256 rows with the smallest fixed-integer-hash "
        "fm_hash01(event_id), built here as TWO shard partials "
        "(event_id parity) union-merged and re-truncated — bottom-k "
        "is a semilattice, so merge ≡ whole EXACTLY, and the gate "
        "proves it: the oracle computes the single-pass sketch. "
        "Estimates are exact order statistics over the bounded sample "
        "(rank error ~1/sqrt(k)); ranks use integer ceil-div, the "
        "per-group selection runs through ranking.grouped_topk "
        "(salted two-level — literal type keys never single-task a "
        "corpus), and the estimate step is window-free "
        "(collect_list→array_sort→element_at on ≤k rows). "
        "operators/sketches.kmv_quantile_sketch/_merge/_estimate; "
        "calibration twin: sampled_quantile_accuracy."
    ),
)
def kmv_quantile_sketch_value(spark, sf_dir):
    from metar_pipeline_spark.operators.sketches import (
        kmv_merge,
        kmv_quantile_estimate,
        kmv_quantile_sketch,
    )

    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    shard_a = kmv_quantile_sketch(
        events.filter(F.col("event_id") % 2 == 0),
        ["event_type"], "value", "event_id", k=256,
    )
    shard_b = kmv_quantile_sketch(
        events.filter(F.col("event_id") % 2 == 1),
        ["event_type"], "value", "event_id", k=256,
    )
    merged = kmv_merge([shard_a, shard_b], ["event_type"], "event_id", k=256)
    est = kmv_quantile_estimate(
        merged, ["event_type"], "value", "event_id", [25, 50, 75, 90]
    )
    return est.select(
        "event_type",
        "n_sample",
        *[F.round(F.col(f"p{p}"), 6).alias(f"p{p}") for p in (25, 50, 75, 90)],
    )


@register(
    "freq_tokens_sketch_topk",
    """
    SELECT item, est_count, rank FROM (
      SELECT t AS item, CAST(COUNT(*) AS BIGINT) AS est_count,
             CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t) AS INTEGER) AS rank
      FROM (
        SELECT unnest(list_filter(
                 regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''
               )) AS t
        FROM documents
      )
      GROUP BY t
    ) WHERE rank <= 10
    """,
    doc=(
        "Heavy-hitter tokens via the approx_top_k frequent-items "
        "sketch: bounded counters per partition, merged map-side — at "
        "100 TB the corpus vocabulary never shuffles, only KB-sized "
        "sketches do. Counts are exact while the vocabulary fits the "
        "tracked budget (the regime this oracle checks); beyond it "
        "they degrade to the sketch's upper-bound guarantee."
    ),
)
def freq_tokens_sketch_topk(spark, sf_dir):
    from metar_pipeline_spark.operators.sketches import top_k_frequent
    from metar_pipeline_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return top_k_frequent(toks, F.col("tok"), k=10)


@register(
    "stream_attribution_join",
    """
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.value AS purchase_value, c.event_id AS click_id,
           c.ts AS click_ts
    FROM events p
    JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
    doc=(
        "Watermarked stream-stream interval join run as a streaming "
        "query (availableNow over the bounded file): each purchase "
        "matched to same-user clicks in the preceding hour. The "
        "time-range condition + both-sides watermark bound the join "
        "state to keys x 1h of rows — the property that makes the "
        "join runnable on an unbounded stream; on bounded input the "
        "emitted matches equal the batch interval join, which is the "
        "oracle."
    ),
)
def stream_attribution_join(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.streaming.pipeline import (
        attribution_join_stream,
    )

    cstream, cts = _event_file_stream(spark, sf_dir)
    pstream, pts = _event_file_stream(spark, sf_dir)
    clicks = cstream.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", cts.alias("ts")
    )
    purchases = pstream.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "value", pts.alias("ts")
    )
    joined = attribution_join_stream(clicks, purchases, max_gap="1 hour")
    out_dir = tempfile.mkdtemp(prefix="stream_attr_join_")
    ckpt = os.path.join(out_dir, "_ckpt")
    data = os.path.join(out_dir, "data")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("parquet")
            .option("path", data)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.read.schema(joined.schema)
            .parquet(data)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(out_dir, ignore_errors=True)
    return result


@register(
    "stream_attribution_left_outer",
    """
    WITH wm AS (
      SELECT least(
        (SELECT max(ts) FROM events WHERE event_type = 'click'),
        (SELECT max(ts) FROM events WHERE event_type = 'purchase')
      ) AS t
    )
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           p.value AS purchase_value, c.event_id AS click_id, c.ts AS click_ts
    FROM events p
    LEFT JOIN events c
      ON c.event_type = 'click' AND p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
    CROSS JOIN wm
    WHERE p.event_type = 'purchase'
      AND (c.event_id IS NOT NULL OR p.ts < wm.t)
    """,
    doc=(
        "Stream-stream LEFT OUTER interval join (availableNow): every "
        "purchase emits — matched, or with NULL click columns once the "
        "watermark proves no click can still arrive. The oracle "
        "encodes the eviction rule exactly: an unmatched purchase "
        "appears iff purchase_ts < min(max click ts, max purchase ts) "
        "— the terminal watermark across both inputs — with the "
        "STRICT inequality verified empirically at two scales "
        "(a purchase AT the watermark stays buffered). State is keys "
        "x 1h either way; null emission is what distinguishes the "
        "outer form."
    ),
)
def stream_attribution_left_outer(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.streaming.pipeline import (
        attribution_join_stream_outer,
    )

    cstream, cts = _event_file_stream(spark, sf_dir)
    pstream, pts = _event_file_stream(spark, sf_dir)
    clicks = cstream.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", cts.alias("ts")
    )
    purchases = pstream.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "value", pts.alias("ts")
    )
    joined = attribution_join_stream_outer(clicks, purchases, max_gap="1 hour")
    out_dir = tempfile.mkdtemp(prefix="stream_attr_outer_")
    ckpt = os.path.join(out_dir, "_ckpt")
    data = os.path.join(out_dir, "data")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            joined.writeStream.format("parquet")
            .option("path", data)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.read.schema(joined.schema)
            .parquet(data)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(out_dir, ignore_errors=True)
    return result


@register(
    "stream_dedup_watermark",
    """
    SELECT user_id, event_id, ts, value FROM events
    """,
    doc=(
        "Bounded-state streaming dedup under at-least-once delivery: "
        "the event stream unioned with a full duplicate of itself is "
        "collapsed back to exactly-once by "
        "dropDuplicatesWithinWatermark on (user_id, event_id) — each "
        "id is held in state only until the watermark passes its "
        "event time + lateness, so state tracks the duplicate-arrival "
        "window, not stream history. Duplicates are exact copies, so "
        "whichever copy survives the output is value-identical; the "
        "oracle is simply the original event set."
    ),
)
def stream_dedup_watermark(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.streaming.stateful import (
        streaming_dedup_within_watermark,
    )

    s1, t1 = _event_file_stream(spark, sf_dir)
    s2, t2 = _event_file_stream(spark, sf_dir)
    cols = lambda s, t: s.select(  # noqa: E731
        "user_id", "event_id", t.alias("ts"), "value"
    )
    doubled = cols(s1, t1).unionByName(cols(s2, t2))
    deduped = streaming_dedup_within_watermark(doubled, lateness="10 minutes")
    out_dir = tempfile.mkdtemp(prefix="stream_dedup_")
    ckpt = os.path.join(out_dir, "_ckpt")
    data = os.path.join(out_dir, "data")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            deduped.writeStream.format("parquet")
            .option("path", data)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.read.schema(deduped.schema)
            .parquet(data)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(out_dir, ignore_errors=True)
    return result


@register(
    "stream_sessionize_stateful",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events
    ),
    t AS (
      SELECT user_id, event_id, tms,
             LAG(tms) OVER (PARTITION BY user_id
                            ORDER BY tms, event_id) AS prev
      FROM e
    ),
    s AS (
      SELECT user_id, tms,
             SUM(CASE WHEN prev IS NOT NULL AND tms - prev > 1800000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tms, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM t
    ),
    sess AS (
      SELECT user_id, MIN(tms) AS sms, MAX(tms) AS ems,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM s GROUP BY user_id, sid
    ),
    mx AS (SELECT MAX(epoch_ms(ts)) AS mts FROM events)
    SELECT user_id, make_timestamp(sms * 1000) AS session_start,
           make_timestamp(ems * 1000) AS session_end, n_events
    FROM sess, mx
    WHERE ems + 1800000 < mts
    """,
    doc=(
        "Custom stateful streaming operator driver-verified end-to-end: "
        "gap-based sessionization via applyInPandasWithState (per-user "
        "open-session state, EventTimeTimeout TTL). Emitted sessions = "
        "those closed by a wider-than-gap event or by the final "
        "watermark passing session_end + gap; each user's still-open "
        "trailing session is withheld by BOTH engines (the oracle "
        "models the operator's millisecond state arithmetic and the "
        "strict watermark-exceeds-timeout close). sum_value is "
        "deliberately not exposed: equal-timestamp accumulation order "
        "is unspecified, so only the deterministic surface "
        "(boundaries + counts) is the contract."
    ),
)
def stream_sessionize_stateful(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.streaming.stateful import streaming_sessionize

    stream, ts = _event_file_stream(spark, sf_dir)
    src = stream.select("user_id", ts.alias("ts"), "value")
    sessions = streaming_sessionize(src, gap_seconds=1800).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    out_dir = tempfile.mkdtemp(prefix="stream_sessionize_")
    ckpt = os.path.join(out_dir, "_ckpt")
    data = os.path.join(out_dir, "data")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    # Unlike the ~150-group rollup above, the stateful stage here is
    # Python-side work over ~|users| groups — parallelism dominates
    # state-store overhead (measured 3x faster at 16 than 4 at sf0.1).
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = (
            sessions.writeStream.format("parquet")
            .option("path", data)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.read.schema(sessions.schema)
            .parquet(data)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(out_dir, ignore_errors=True)
    return result


@register(
    "bucketed_join_priority_revenue",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY o.o_orderpriority
    """,
    doc=(
        "Shuffle-free co-located fact-fact join: both sides written "
        "bucketed by the orderkey into the same bucket count, then "
        "joined bucket-to-bucket with NO Exchange on either side (the "
        "write pays the shuffle once; every later join of the pair is "
        "exchange-free — the 100 TB answer to the lineitem⋈orders "
        "shuffle). Oracle is the plain join; bucketing must be "
        "result-invisible."
    ),
)
def bucketed_join_priority_revenue(spark, sf_dir):
    from metar_pipeline_spark.sources.bucketed import bucketed_pair

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    names = ("__bkq_orders", "__bkq_lineitem")
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    # Broadcast off while this plan runs: at test scale the filtered
    # orders side fits the broadcast threshold and Catalyst would pick
    # BHJ, hiding the bucket benefit; at 100 TB neither fact side
    # broadcasts and the bucket-to-bucket SMJ below IS the plan. Only
    # the post-join groupBy exchanges (on the tiny priority key).
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = bucketed_pair(
            spark, orders, li, "o_orderkey", "l_orderkey", 8, names=names
        )
        joined = bl.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
        result = (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.round(
                    _dsum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ),
                    2,
                ).alias("revenue"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        for t in names:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return result


@register(
    "stream_mv_merge_rollup",
    """
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc=(
        "Streaming materialized-view maintenance: the fact file is "
        "split into 4 chunk files and streamed maxFilesPerTrigger=1, "
        "so foreachBatch runs 4 genuine micro-batches, each reduced to "
        "a key-grain DECIMAL partial and merged into the running "
        "rollup via incremental.merge_partial_rollups (localCheckpoint "
        "pins each MV generation; history never rescanned) — additive "
        "partials make the final MV EXACTLY equal the batch rollup, "
        "which is what the oracle asserts"
    ),
)
def stream_mv_merge_rollup(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.operators.incremental import (
        merge_partial_rollups,
    )

    events = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="stream_mv_")
    src = os.path.join(tmp, "src")
    ckpt = os.path.join(tmp, "_ckpt")
    # 4 deterministic chunks → 4 micro-batches (any split yields the
    # same MV: merge is content-order agnostic)
    events.repartition(4, F.col("event_id")).write.parquet(src)
    schema = spark.read.parquet(src).schema

    keys = ["event_type", "day"]

    def partial(df):
        return df.groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )

    mv = {"df": None}

    def upsert(batch_df, _batch_id):
        p = partial(batch_df)
        merged = (
            p
            if mv["df"] is None
            else merge_partial_rollups(
                [mv["df"], p], keys, ["n_events", "sum_value"]
            )
        )
        mv["df"] = merged.localCheckpoint(eager=True)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return mv["df"].select(
        "event_type",
        "day",
        "n_events",
        F.round(F.col("sum_value").cast("double"), 2).alias("sum_value"),
    )


@register(
    "stream_static_enrichment",
    """
    SELECT c.c_mktsegment AS segment, e.event_type,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc=(
        "Stream-static enrichment — the most common production "
        "streaming join: the event stream joins the static customer "
        "dim executor-side (the dim is read fresh per micro-batch, "
        "broadcast under AQE; NO join state is kept, unlike "
        "stream-stream), then a watermark-free running aggregate in "
        "complete mode over the bounded availableNow input equals the "
        "batch join+agg — which is what the oracle asserts"
    ),
)
def stream_static_enrichment(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.io import load_table

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    stream, _ts = _event_file_stream(spark, sf_dir)
    enriched = (
        stream.join(dim, stream["user_id"] == dim["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(_dsum(F.col("value")), 2).alias("sum_value"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="stream_static_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            enriched.writeStream.format("memory")
            .queryName("stream_static_enrichment_result")
            .outputMode("complete")
            .option(
                "checkpointLocation", os.path.join(tmp, "_ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = spark.table(
            "stream_static_enrichment_result"
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "stream_trending_topk",
    """
    WITH mx AS (SELECT MAX(ts) AS mts FROM events),
    sealed AS (
      SELECT time_bucket(INTERVAL 6 HOUR, ts) AS win_start,
             event_type,
             COUNT(*) AS n_events
      FROM events, mx
      WHERE time_bucket(INTERVAL 6 HOUR, ts) + INTERVAL 6 HOUR <= mx.mts
      GROUP BY 1, 2
    )
    SELECT win_start, event_type, CAST(n_events AS BIGINT) AS n_events,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY win_start ORDER BY n_events DESC, event_type
      ) AS rnk
      FROM sealed
    ) WHERE rnk <= 3
    """,
    doc=(
        "Streaming trending top-k: watermarked 6h tumbling windows in "
        "APPEND mode (state evicted as each window seals), then a batch "
        "rank over the sealed aggregates — counts stream, ranking reads "
        "the (tiny) per-window rollup, never the events"
    ),
)
def stream_trending_topk(spark, sf_dir):
    """Windowed heavy-hitters over the stream: per sealed 6-hour
    window, the 3 most frequent event types.

    Two-tier shape (the only one that scales): tier 1 is the streaming
    windowed COUNT — state bounded by open windows × types, emitted
    once on seal; tier 2 ranks the sealed aggregate table, whose size
    is windows × types, independent of stream volume. Ranking inside
    the stream would need complete-mode state over everything;
    ranking the rollup is a window function over a dimension-sized
    frame. Cites the reference's 30-min cadence contract
    (infra/airflow/dags/metar_pipeline_dag.py:18) — same
    micro-batch-then-serve split, applied to trending."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    stream, ts = _event_file_stream(spark, sf_dir)
    agg = (
        stream.select(ts.alias("ets"), "event_type")
        .withWatermark("ets", "0 seconds")
        .groupBy(F.window("ets", "6 hours").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    out_dir = tempfile.mkdtemp(prefix="stream_trending_")
    ckpt = os.path.join(out_dir, "_ckpt")
    data = os.path.join(out_dir, "data")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            agg.writeStream.format("parquet")
            .option("path", data)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        sealed = (
            spark.read.schema(agg.schema)
            .parquet(data)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(out_dir, ignore_errors=True)
    w = Window.partitionBy("win_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        sealed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("win_start", "event_type", "n_events", "rnk")
    )


@register(
    "skew_key_report",
    """
    WITH c AS (
      SELECT event_type AS key, COUNT(*) AS n_rows
      FROM events GROUP BY 1
    ), s AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys
      FROM c
    ), r AS (
      SELECT key, n_rows,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS rank
      FROM c
    )
    SELECT CAST(key AS VARCHAR) AS key,
           CAST(rank AS INTEGER) AS rank,
           CAST(n_rows AS BIGINT) AS n_rows,
           round(n_rows / CAST(total_rows AS DOUBLE), 6) AS share,
           round(n_rows * n_keys / CAST(total_rows AS DOUBLE), 6)
               AS skew_ratio,
           CAST(floor((n_rows * n_keys + total_rows - 1)
                      / CAST(total_rows AS DOUBLE)) AS BIGINT)
               AS recommended_salts,
           total_rows, n_keys
    FROM r, s WHERE rank <= 5
    """,
    doc=(
        "Pre-flight skew diagnosis: top-5 heaviest join/agg keys with "
        "share, skew ratio, and the integer salt factor salted_agg/"
        "salted_join should use — salting decided by measurement, not "
        "guesswork"
    ),
)
def skew_key_report(spark, sf_dir):
    from metar_pipeline_spark.operators.skew import skew_key_report as rpt

    events = load_table(spark, sf_dir, "events")
    return rpt(events, "event_type", top_n=5)


@register(
    "zorder_locality_audit",
    """
    WITH k AS (
      SELECT (user_id % 256) AS a,
             ((CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 256) AS b
      FROM events
    ),
    z AS (
      SELECT a, b,
             CAST(list_sum(list_transform(generate_series(0, 7), i ->
               (((a >> i) & 1) * (1 << (2 * i)))
               + (((b >> i) & 1) * (1 << (2 * i + 1)))
             )) AS BIGINT) AS zv
      FROM k
    )
    SELECT CAST(zv // 4096 AS INTEGER) AS zrange,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(a) AS BIGINT) AS a_min, CAST(MAX(a) AS BIGINT) AS a_max,
           CAST(MIN(b) AS BIGINT) AS b_min, CAST(MAX(b) AS BIGINT) AS b_max
    FROM z GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Z-order (Morton) locality audit: events keyed by "
        "(user_id, epoch-day) on an 8-bit grid, z-codes bucketed into "
        "4096-code ranges — each range is an ALIGNED 64x64 tile, so "
        "BOTH dimension spans are <= 63 inside every range (asserted in "
        "test_layout.py); the property that makes a z-laid-out table "
        "skip files for two-dimensional box predicates, where a "
        "single-key sort bounds only one dimension "
        "(sources/layout.py:morton_interleave — pure JVM bit math)"
    ),
)
def zorder_locality_audit(spark, sf_dir):
    from metar_pipeline_spark.sources.layout import morton_interleave

    events = load_table(spark, sf_dir, "events")
    e = F.col("ts").cast("timestamp").cast("long")
    keyed = events.select(
        (F.col("user_id") % 256).cast("bigint").alias("a"),
        (F.floor(e / 86400) % 256).cast("bigint").alias("b"),
    )
    z = keyed.withColumn("zv", morton_interleave(F.col("a"), F.col("b"), 8))
    return (
        z.groupBy(F.floor(F.col("zv") / 4096).cast("int").alias("zrange"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
        )
        .orderBy("zrange")
    )


@register(
    "stream_ivm_delta_view",
    """
    WITH st AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CASE WHEN event_id % 4 <> 3 AND event_id % 7 = 0
                  THEN value + 1.0 ELSE value END AS v
      FROM events
      WHERE NOT (event_id % 4 <> 3 AND event_id % 7 <> 0
                 AND event_id % 11 = 0)
    )
    SELECT event_type, day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_value
    FROM st GROUP BY 1, 2
    """,
    doc=(
        "Z-set IVM in the engine's REAL incremental loop: a 3-file CDC "
        "changelog (batch 0 inserts; batch 1 update retraction+insert "
        "pairs [event_id%7=0, value+1] plus late inserts [%4=3]; batch "
        "2 deletes [%11=0]) streamed maxFilesPerTrigger=1, each "
        "micro-batch reduced to a group-grain weighted delta "
        "(ivm.zset_weighted_agg), persisted replay-idempotently "
        "(idempotent_batch_append — a replayed batch overwrites its "
        "own _batch partition, so the durable delta log never "
        "double-counts) and merged into the running view "
        "(ivm.apply_agg_delta; localCheckpoint pins each generation). "
        "Unlike the watermark path (SURVEY L7) the view absorbs the "
        "late updates and deletes; the oracle recomputes the final "
        "state from scratch — streaming algebra ≡ batch recompute, "
        "exact by DECIMAL/integer arithmetic."
    ),
)
def stream_ivm_delta_view(spark, sf_dir):
    import glob
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    live = eid % 4 != 3
    upd = live & (eid % 7 == 0)
    dele = live & (eid % 7 != 0) & (eid % 11 == 0)
    row = lambda v, w: [  # noqa: E731 — changelog row shape
        "event_type", "ts", v.alias("v"), F.lit(w).alias("_w"),
    ]
    b0 = events.filter(live).select(*row(F.col("value"), 1))
    b1 = (
        events.filter(upd)
        .select(*row(F.col("value"), -1))
        .unionByName(
            events.filter(upd).select(*row(F.col("value") + 1.0, 1))
        )
        .unionByName(
            events.filter(~live).select(*row(F.col("value"), 1))
        )
    )
    b2 = events.filter(dele).select(*row(F.col("value"), -1))

    tmp = tempfile.mkdtemp(prefix="stream_ivm_")
    src = os.path.join(tmp, "src")
    ckpt = os.path.join(tmp, "_ckpt")
    log = os.path.join(tmp, "delta_log")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        import time as _t

        from metar_pipeline_spark.streaming.pipeline import (
            parallel_batch_drops,
        )

        now = _t.time()
        bs = (b0, b1, b2)
        parallel_batch_drops(
            [
                (
                    lambda d=os.path.join(src, f"b{i}"), b=b: b.coalesce(
                        1
                    ).write.parquet(d)
                )
                for i, b in enumerate(bs)
            ]
        )
        for i in range(len(bs)):
            d = os.path.join(src, f"b{i}")
            # pin mtimes: FileStreamSource orders by mtime, so the
            # changelog replays b0→b1→b2 (the result is order-free —
            # Z-set merge is commutative — but batch ids stay stable)
            for fn in glob.glob(os.path.join(d, "*")):
                _t_i = now - 30 + i * 10
                os.utime(fn, (_t_i, _t_i))
        schema = spark.read.parquet(os.path.join(src, "b0")).schema

        keys = ["event_type", "day"]
        mv = {"df": None}

        def fold(batch_df, batch_id):
            d = zset_weighted_agg(
                batch_df.select(
                    "event_type",
                    F.to_date(F.date_trunc("day", "ts")).alias("day"),
                    "v",
                    "_w",
                ),
                keys,
                sums={"total": F.col("v").cast("decimal(18,2)")},
            )
            # durable, replay-idempotent delta log (at-least-once safe)
            idempotent_batch_append(d, log, batch_id)
            prev = mv["df"] if mv["df"] is not None else d.limit(0)
            mv["df"] = apply_agg_delta(
                prev, d, keys, ["total"]
            ).localCheckpoint(eager=True)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = mv["df"].select(
            "event_type",
            "day",
            F.col("_n").alias("n_events"),
            F.round(F.col("total").cast("double"), 2).alias("sum_value"),
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "stream_cms_sketch_store",
    """
    WITH h AS (
      SELECT * FROM (VALUES (0, 998244353, 12289), (1, 1000000007, 257),
                            (2, 69061, 65537), (3, 40503, 97)) AS t(r, a, b)
    )
    SELECT CAST(h.r AS INTEGER) AS row,
           CAST(((e.user_id * h.a + h.b) % 2147483647) % 1024 AS BIGINT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events e CROSS JOIN h
    GROUP BY 1, 2
    """,
    doc=(
        "STREAMING sketch store — the sketch analogue of "
        "stream_ivm_delta_view (round-10 VERDICT optional #7): events "
        "arrive in 3 micro-batches (event_id mod 3, "
        "maxFilesPerTrigger=1); each micro-batch is reduced to its own "
        "4x1024 Count-Min partial (operators/sketches.cms_build — 4 KB "
        "regardless of batch size) and persisted replay-idempotently "
        "(streaming.idempotent_batch_append: a replayed batch "
        "overwrites its own _batch partition, so the durable sketch "
        "log never double-counts); the serving sketch is the cell-wise "
        "merge of the store (cms_merge). Because CMS cells are fixed "
        "integer hashing, the oracle replays the WHOLE-corpus sketch "
        "directly — streaming partials + merge ≡ single batch pass, "
        "verified cell-exactly at the gate. This is the 100 TB "
        "monitoring loop: per-micro-batch KB-sized partials, "
        "mergeable to any window, no raw-data reprocessing."
    ),
)
def stream_cms_sketch_store(spark, sf_dir):
    import glob
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.operators.sketches import cms_build, cms_merge
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    events = load_table(spark, sf_dir, "events")
    batches = [
        events.filter(F.col("event_id") % 3 == i).select("user_id")
        for i in range(3)
    ]
    tmp = tempfile.mkdtemp(prefix="stream_cms_")
    src = os.path.join(tmp, "src")
    ckpt = os.path.join(tmp, "_ckpt")
    log = os.path.join(tmp, "sketch_log")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        import time as _t

        from metar_pipeline_spark.streaming.pipeline import (
            parallel_batch_drops,
        )

        now = _t.time()
        parallel_batch_drops(
            [
                (
                    lambda d=os.path.join(src, f"b{i}"), b=b: b.coalesce(
                        1
                    ).write.parquet(d)
                )
                for i, b in enumerate(batches)
            ]
        )
        for i in range(len(batches)):
            d = os.path.join(src, f"b{i}")
            # FileStreamSource orders by mtime — pin the replay order
            for fn in glob.glob(os.path.join(d, "*")):
                t_i = now - 30 + i * 10
                os.utime(fn, (t_i, t_i))
        schema = spark.read.parquet(os.path.join(src, "b0")).schema

        def fold(batch_df, batch_id):
            idempotent_batch_append(
                cms_build(batch_df, "user_id"), log, batch_id
            )

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        store = spark.read.parquet(log).select("row", "bucket", "c")
        result = cms_merge(store).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


def _bloom_oracle(m_bits: int = 8192, k_hashes: int = 4) -> str:
    """Literal twin of bloom_membership_audit: the same CMS hash rows
    → bit positions → 32-bit words BIT_OR'd, probed with the same
    all-bits-set rule."""
    from metar_pipeline_spark.operators.sketches import _CMS_P, _CMS_ROWS

    def pos(i):
        a, b = _CMS_ROWS[i]
        return f"(((user_id * {a} + {b}) % {_CMS_P}) % {m_bits})"

    build_pairs = " UNION ALL ".join(
        f"SELECT {pos(i)} // 32 AS word,"
        f" (CAST(1 AS BIGINT) << CAST({pos(i)} % 32 AS INTEGER)) AS bitval,"
        f" user_id FROM members"
        for i in range(k_hashes)
    )
    probe_pairs = " UNION ALL ".join(
        f"SELECT user_id, {pos(i)} // 32 AS word,"
        f" (CAST(1 AS BIGINT) << CAST({pos(i)} % 32 AS INTEGER)) AS bitval"
        f" FROM allu"
        for i in range(k_hashes)
    )
    return f"""
    WITH members AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    allu AS (
      SELECT DISTINCT user_id FROM events
      UNION
      -- deterministic ABSENT probes (every synthetic user purchases,
      -- so without these the false-positive audit would be vacuous)
      SELECT DISTINCT user_id + 10000000 FROM events
    ),
    sketch AS (
      SELECT word, BIT_OR(bitval) AS bits
      FROM ({build_pairs}) GROUP BY word
    ),
    probes AS ({probe_pairs}),
    hits AS (
      SELECT p.user_id,
             BOOL_AND(COALESCE(s.bits, 0) & p.bitval <> 0) AS est_member
      FROM probes p LEFT JOIN sketch s ON p.word = s.word
      GROUP BY p.user_id
    ),
    audit AS (
      SELECT h.user_id, h.est_member,
             m.user_id IS NOT NULL AS true_member
      FROM hits h LEFT JOIN members m ON h.user_id = m.user_id
    )
    SELECT CAST({m_bits} AS BIGINT) AS m_bits,
           CAST({k_hashes} AS BIGINT) AS k_hashes,
           CAST((SELECT COUNT(*) FROM members) AS BIGINT) AS n_members,
           CAST((SELECT SUM(bit_count(bits)) FROM sketch) AS BIGINT)
             AS n_bits_set,
           CAST(SUM(CASE WHEN NOT true_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_probed_absent,
           CAST(SUM(CASE WHEN true_member AND NOT est_member
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_negatives,
           CAST(SUM(CASE WHEN est_member AND NOT true_member
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positives
    FROM audit
    """


@register(
    "bloom_membership_audit",
    _bloom_oracle(),
    doc=(
        "Deterministic Bloom filter — MEMBERSHIP joins the "
        "oracle-verified sketch family (frequency: CMS, distinct: FM, "
        "quantiles: KMV): an 8192-bit / 4-hash filter over the "
        "purchasing users (CMS fixed integer hash rows → bit "
        "positions packed into 32-bit words via one narrow explode + "
        "word-grain BIT_OR, ≤256-row mergeable summary), probed with "
        "ALL distinct users through a broadcast word join + key-grain "
        "BOOL_AND. The audit row pins the structural guarantee at the "
        "gate: n_false_negatives is ZERO by construction, false "
        "positives are counted against the exact membership join "
        "(rate bound asserted in pytest). DuckDB replays every bit. "
        "operators/sketches.bloom_build/bloom_probe"
    ),
)
def bloom_membership_audit(spark, sf_dir):
    from metar_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    m_bits, k_hashes = 8192, 4
    events = load_table(spark, sf_dir, "events")
    members = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .localCheckpoint(eager=True)  # feeds the build AND the truth join
    )
    # probe set = real users ∪ deterministic ABSENT ids (every
    # synthetic user purchases, so the false-positive audit needs
    # guaranteed-absent probes; +10M keeps the ids inside the hash
    # rows' int64 bound)
    allu = (
        events.select("user_id")
        .union(events.select(F.col("user_id") + 10_000_000))
        .distinct()
    )
    sketch = bloom_build(members, "user_id", m_bits, k_hashes)
    sketch = sketch.localCheckpoint(eager=True)  # feeds probe + popcount
    probed = bloom_probe(sketch, allu, "user_id", m_bits, k_hashes)
    audit = probed.join(
        members.withColumn("__true", F.lit(True)), "user_id", "left"
    ).select(
        "est_member", F.coalesce("__true", F.lit(False)).alias("true_member")
    )
    counts = audit.agg(
        F.sum(F.when(~F.col("true_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_probed_absent"),
        F.sum(
            F.when(F.col("true_member") & ~F.col("est_member"), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_false_negatives"),
        F.sum(
            F.when(F.col("est_member") & ~F.col("true_member"), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_false_positives"),
    )
    nm = members.agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    nbits = sketch.agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_bits_set")
    )
    return (
        nm.crossJoin(F.broadcast(nbits))
        .crossJoin(F.broadcast(counts))
        .select(
            F.lit(m_bits).cast("bigint").alias("m_bits"),
            F.lit(k_hashes).cast("bigint").alias("k_hashes"),
            "n_members",
            "n_bits_set",
            "n_probed_absent",
            "n_false_negatives",
            "n_false_positives",
        )
    )


def _fm_oracle(m: int = 64) -> str:
    """Literal twin of operators/sketches.fm_hash01/fm_estimate: the
    same per-row integer hash rounds, m MINs, and the fixed left-assoc
    sum chain."""
    from metar_pipeline_spark.operators.sketches import _CMS_P, fm_constants

    h1s, mins = [], []
    for i in range(m):
        a1, b1, a2 = fm_constants(i)
        h1s.append(f"(user_id * {a1} + {b1}) % {_CMS_P} AS h{i}")
        mins.append(
            f"MIN(CAST((h{i} * h{i} + h{i} * {a2}) % {_CMS_P} AS DOUBLE)"
            f" / {_CMS_P}.0) AS m{i}"
        )
    chain = "m0"
    for i in range(1, m):
        chain = f"({chain} + m{i})"
    return f"""
    WITH hx AS (
      SELECT user_id, {", ".join(h1s)}
      FROM events
    ),
    s AS (
      SELECT COUNT(DISTINCT user_id) AS n_exact, {", ".join(mins)}
      FROM hx
    )
    SELECT CAST({m} AS BIGINT) AS m,
           CAST(n_exact AS BIGINT) AS n_exact,
           round({m}.0 / {chain} - 1.0, 2) AS n_est
    FROM s
    """


@register(
    "fm_distinct_users_estimate",
    _fm_oracle(),
    doc=(
        "Flajolet-Martin m-mins distinct estimator (m=64) — the "
        "ORACLE-VERIFIED sibling of the rows-only DataSketches HLL "
        "queries (like the Count-Min audit, the hash rows are fixed "
        "engine-portable integer arithmetic, so DuckDB replays every "
        "min): E[min of n uniforms] = 1/(n+1) ⇒ n̂ = m/Σminᵢ − 1, "
        "rel. error ~1/√m. All 64 MINs ride ONE scan as map-side-"
        "combinable aggregates (zero data shuffle, a 1-row result; "
        "merge of shards ≡ the same MIN — trivially mergeable); the "
        "exact COUNT(DISTINCT) column is the calibration reference, "
        "the expensive path being replaced at 100 TB. The final sum "
        "is a fixed left-assoc chain — deterministic on both engines "
        "(operators/sketches.fm_hash01 / fm_min_columns / fm_estimate)"
    ),
)
def fm_distinct_users_estimate(spark, sf_dir):
    # Round 13: string-built expressions (sketches.fm_min_exprs —
    # bit-identical, see fm_distinct_users_by_type) remove ~2 s of
    # py4j construction per call; same one-pass wide aggregate.
    from metar_pipeline_spark.operators.sketches import (
        fm_estimate_expr,
        fm_min_exprs,
    )

    events = load_table(spark, sf_dir, "events")
    m = 64
    s = events.agg(
        F.count_distinct(F.col("user_id")).cast("bigint").alias("n_exact"),
        *fm_min_exprs("user_id", m),
    )
    return s.select(
        F.lit(m).cast("bigint").alias("m"),
        "n_exact",
        F.round(fm_estimate_expr(m), 2).alias("n_est"),
    )


def _fm_setops_oracle(m: int = 64) -> str:
    """Literal twin of the fm_sketch_set_ops query: per-row hash
    rounds computed once, per-SIDE conditional MINs, LEAST-merged
    union sketch, inclusion-exclusion intersection."""
    from metar_pipeline_spark.operators.sketches import _CMS_P, fm_constants

    h1s, mins = [], []
    for i in range(m):
        a1, b1, a2 = fm_constants(i)
        h1s.append(f"(user_id * {a1} + {b1}) % {_CMS_P} AS h{i}")
        expr = (
            f"CAST((h{i} * h{i} + h{i} * {a2}) % {_CMS_P} AS DOUBLE)"
            f" / {_CMS_P}.0"
        )
        mins.append(
            f"MIN(CASE WHEN day = DATE '2024-01-05' THEN {expr} END)"
            f" AS a{i}"
        )
        mins.append(
            f"MIN(CASE WHEN day = DATE '2024-01-06' THEN {expr} END)"
            f" AS b{i}"
        )

    def chain(fmt):
        s = fmt.format(i=0)
        for i in range(1, m):
            s = f"({s} + {fmt.format(i=i)})"
        return s

    est_a = f"{m}.0 / {chain('a{i}')} - 1.0"
    est_b = f"{m}.0 / {chain('b{i}')} - 1.0"
    est_u = f"{m}.0 / {chain('LEAST(a{i}, b{i})')} - 1.0"
    return f"""
    WITH hx AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             {", ".join(h1s)}
      FROM events
      WHERE CAST(date_trunc('day', ts) AS DATE)
            IN (DATE '2024-01-05', DATE '2024-01-06')
    ),
    s AS (
      SELECT
        COUNT(DISTINCT CASE WHEN day = DATE '2024-01-05'
                            THEN user_id END) AS na,
        COUNT(DISTINCT CASE WHEN day = DATE '2024-01-06'
                            THEN user_id END) AS nb,
        COUNT(DISTINCT user_id) AS nu,
        {", ".join(mins)}
      FROM hx
    )
    SELECT CAST({m} AS BIGINT) AS m,
           CAST(na AS BIGINT) AS na_exact,
           CAST(nb AS BIGINT) AS nb_exact,
           CAST(nu AS BIGINT) AS nu_exact,
           CAST(na + nb - nu AS BIGINT) AS ni_exact,
           round({est_a}, 2) AS na_est,
           round({est_b}, 2) AS nb_est,
           round({est_u}, 2) AS nu_est,
           round(({est_a}) + ({est_b}) - ({est_u}), 2) AS ni_est
    FROM s
    """


@register(
    "fm_sketch_set_ops",
    _fm_setops_oracle(),
    doc=(
        "Mergeable-sketch SET OPERATIONS on the Flajolet-Martin "
        "m-mins estimator: per-side (Jan-5 / Jan-6 active users — "
        "the day-over-day audience-overlap question) sketches "
        "built as CONDITIONAL MINs in one scan, the union sketch as "
        "the element-wise LEAST of the two sides (the merge property "
        "that makes the sketch shardable — merging two shards' mins "
        "IS the same MIN), and the intersection by inclusion-"
        "exclusion n̂A + n̂B − n̂A∪B. Exact distinct counts ride the "
        "same aggregate as calibration references. Zero data shuffle "
        "(map-side-combinable mins to a 1-row result); every hash is "
        "the fixed engine-portable integer arithmetic of "
        "operators/sketches.fm_hash01, every sum a fixed left-assoc "
        "chain — DuckDB replays all 128 mins exactly."
    ),
)
def fm_sketch_set_ops(spark, sf_dir):
    # Round 13 (guide §1.2 fixed costs): the one-pass wide aggregate
    # (64 staged hash columns + 3 conditional COUNT DISTINCTs + 128
    # conditional MINs) is the right execution shape (1.2 s of jobs);
    # what cost 3.1 s per call was CONSTRUCTING it Column-by-Column
    # over py4j. The identical tree is now built as SQL strings
    # (sketches.fm_hash01_sql — verified bit-identical), one parser
    # call per column/aggregate. A long/exploded form was tried and
    # REJECTED (more job time than it saved — OPTIMIZATION_r13.md).
    from metar_pipeline_spark.operators.sketches import fm_hash01_sql

    m = 64
    day = F.to_date(F.date_trunc("day", "ts"))
    events = (
        load_table(spark, sf_dir, "events")
        .filter(day.isin("2024-01-05", "2024-01-06"))
        .withColumn("day", day)
    )
    is_a = F.col("day") == F.lit("2024-01-05").cast("date")
    hx = events.select(
        "user_id",
        is_a.alias("__is_a"),
        *[
            F.expr(f"{fm_hash01_sql('user_id', i)} AS __h{i}")
            for i in range(m)
        ],
    )
    aggs = [
        F.expr(
            "count(DISTINCT CASE WHEN __is_a THEN user_id END) AS na"
        ),
        F.expr(
            "count(DISTINCT CASE WHEN NOT __is_a THEN user_id END) AS nb"
        ),
        F.expr("count(DISTINCT user_id) AS nu"),
    ]
    for i in range(m):
        aggs.append(
            F.expr(f"min(CASE WHEN __is_a THEN __h{i} END) AS __a{i}")
        )
        aggs.append(
            F.expr(
                f"min(CASE WHEN NOT __is_a THEN __h{i} END) AS __b{i}"
            )
        )
    s = hx.agg(*aggs)

    def est_sql(fmt):
        chain = fmt.format(i=0)
        for i in range(1, m):
            chain = f"({chain} + {fmt.format(i=i)})"
        return f"(CAST({m} AS DOUBLE) / {chain} - CAST(1 AS DOUBLE))"

    ea = est_sql("__a{i}")
    eb = est_sql("__b{i}")
    eu = est_sql("least(__a{i}, __b{i})")
    return s.select(
        F.lit(m).cast("bigint").alias("m"),
        F.col("na").cast("bigint").alias("na_exact"),
        F.col("nb").cast("bigint").alias("nb_exact"),
        F.col("nu").cast("bigint").alias("nu_exact"),
        (F.col("na") + F.col("nb") - F.col("nu"))
        .cast("bigint")
        .alias("ni_exact"),
        F.expr(f"round({ea}, 2) AS na_est"),
        F.expr(f"round({eb}, 2) AS nb_est"),
        F.expr(f"round({eu}, 2) AS nu_est"),
        F.expr(f"round({ea} + {eb} - {eu}, 2) AS ni_est"),
    )


@register(
    "sampled_quantile_accuracy",
    """
    WITH h AS (
      SELECT event_type, value,
             ((event_id * 1043823026 + 99338872) % 2147483647)
               AS h1
      FROM events WHERE value IS NOT NULL
    ),
    hx AS (
      SELECT event_type, value,
             CAST((h1 * h1 + h1 * 268545020) % 2147483647 AS DOUBLE)
               / 2147483647.0 AS u
      FROM h
    ),
    ex AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS e50,
             quantile_cont(value, 0.9) AS e90
      FROM hx GROUP BY 1
    ),
    sa AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sample,
             quantile_cont(value, 0.5) AS s50,
             quantile_cont(value, 0.9) AS s90
      FROM hx WHERE u < 0.1 GROUP BY 1
    )
    SELECT ex.event_type, sa.n_sample,
           round(ex.e50, 6) AS p50_exact, round(sa.s50, 6) AS p50_sample,
           round(abs(sa.s50 - ex.e50), 6) AS p50_abs_err,
           round(ex.e90, 6) AS p90_exact, round(sa.s90, 6) AS p90_sample,
           round(abs(sa.s90 - ex.e90), 6) AS p90_abs_err
    FROM ex JOIN sa ON sa.event_type = ex.event_type
    """,
    doc=(
        "Hash-sampled quantile accuracy audit: exact per-type "
        "p50/p90 beside the same quantiles over a DETERMINISTIC 10% "
        "Bernoulli sample (operators/sketches.fm_hash01 row 0 on "
        "event_id — the engine-portable integer hash, so the sample "
        "is identical across runs, engines, and partitionings — "
        "unlike rand()-based sampling, and unlike the rows-only "
        "DataSketches KLL estimates this is fully oracle-replayable). "
        "The calibration table for the 100-TB posture: exact "
        "percentile is a full sort per group; the sampled path reads "
        "10% and its error column says what that buys. Scale shape: "
        "one scan (hash is a projection, the sample a pushed filter), "
        "two sort-based ordered-set aggregates at type grain."
    ),
)
def sampled_quantile_accuracy(spark, sf_dir):
    from metar_pipeline_spark.operators.sketches import fm_hash01

    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    hx = events.select(
        "event_type",
        "value",
        fm_hash01(F.col("event_id"), 0).alias("u"),
    )
    ex = hx.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.9)").alias("e90"),
    )
    sa = (
        hx.filter(F.col("u") < 0.1)
        .groupBy(F.col("event_type").alias("set"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sample"),
            F.expr("percentile(value, 0.5)").alias("s50"),
            F.expr("percentile(value, 0.9)").alias("s90"),
        )
    )
    return ex.join(sa, F.col("set") == F.col("event_type")).select(
        "event_type",
        "n_sample",
        F.round("e50", 6).alias("p50_exact"),
        F.round("s50", 6).alias("p50_sample"),
        F.round(F.abs(F.col("s50") - F.col("e50")), 6).alias(
            "p50_abs_err"
        ),
        F.round("e90", 6).alias("p90_exact"),
        F.round("s90", 6).alias("p90_sample"),
        F.round(F.abs(F.col("s90") - F.col("e90")), 6).alias(
            "p90_abs_err"
        ),
    )


_BRR_R = 32


def _brr_oracle(r_count: int = _BRR_R) -> str:
    """Literal twin of brr_mean_ci_value: the same hash half-samples,
    DECIMAL replicate means, fixed left-assoc deviation chain."""
    from metar_pipeline_spark.operators.sketches import _CMS_P, fm_constants

    h1s, sums = [], []
    for i in range(r_count):
        a1, b1, a2 = fm_constants(i)
        h1s.append(f"(event_id * {a1} + {b1}) % {_CMS_P} AS h{i}")
        pick = (
            f"CAST((h{i} * h{i} + h{i} * {a2}) % {_CMS_P} AS DOUBLE)"
            f" / {_CMS_P}.0 < 0.5"
        )
        sums.append(
            f"CAST(SUM(CASE WHEN {pick} THEN CAST(value AS"
            f" DECIMAL(30,10)) END) AS DOUBLE) AS s{i}"
        )
        sums.append(
            f"SUM(CASE WHEN {pick} THEN 1 ELSE 0 END) AS c{i}"
        )
    # An empty half-sample (possible only at degenerate n) must not
    # divide by zero — ANSI Spark would throw where DuckDB yields inf.
    # Fall back to the grand mean so the replicate contributes 0.
    def _rm(i: int) -> str:
        return f"CASE WHEN c{i} > 0 THEN s{i} / c{i} ELSE mean END"

    dev = f"({_rm(0)} - mean) * ({_rm(0)} - mean)"
    for i in range(1, r_count):
        dev = f"({dev} + ({_rm(i)} - mean) * ({_rm(i)} - mean))"
    return f"""
    WITH hx AS (
      SELECT value, {", ".join(h1s)}
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS st,
             {", ".join(sums)}
      FROM hx
    ),
    m AS (SELECT *, st / n AS mean FROM s),
    v AS (
      SELECT n, mean,
             sqrt(({dev}) / {r_count}.0) AS se
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST({r_count} AS BIGINT) AS n_replicates,
           round(mean, 6) AS mean,
           round(se, 6) AS se,
           round(mean - 1.959963984540054 * se, 6) AS ci_lo,
           round(mean + 1.959963984540054 * se, 6) AS ci_hi
    FROM v
    """


@register(
    "brr_mean_ci_value",
    _brr_oracle(),
    doc=(
        "Balanced-repeated-replication confidence interval for the "
        "mean event value: 32 DETERMINISTIC hash half-samples "
        "(operators/sketches.fm_hash01 rows — identical across runs, "
        "engines, partitionings; no rand()), each replicate's "
        "exact-DECIMAL mean, and Var = (1/R) sum (theta_r - theta)^2 "
        "— the survey-statistics replicate-weight method that gives "
        "a 100-TB pipeline an uncertainty band in ONE scan with zero "
        "data shuffle (all 64 conditional aggregates are map-side "
        "combinable to a 1-row result). The z constant is spelled as "
        "an exact double literal in both engines (no transcendental "
        "divergence); the deviation sum is a fixed left-assoc chain."
    ),
)
def brr_mean_ci_value(spark, sf_dir):
    # Round 13 (guide §1.2 fixed costs): identical expression tree,
    # built as SQL strings — the Column-by-Column construction of the
    # 32 hash predicates + 66 aggregates + 32-term deviation chain
    # cost 2.8 s of py4j round-trips per call (vs 1.9 s of jobs).
    from metar_pipeline_spark.operators.sketches import fm_hash01_sql

    r_count = _BRR_R
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    hx = events.select(
        "value",
        *[
            F.expr(f"{fm_hash01_sql('event_id', i)} < 0.5 AS __p{i}")
            for i in range(r_count)
        ],
    )
    aggs = [
        F.expr("count(1) AS n"),
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS st"
        ),
    ]
    for i in range(r_count):
        aggs.append(
            F.expr(
                f"CAST(SUM(CASE WHEN __p{i} THEN"
                f" CAST(value AS DECIMAL(30,10)) END) AS DOUBLE)"
                f" AS s{i}"
            )
        )
        aggs.append(
            F.expr(f"SUM(CASE WHEN __p{i} THEN 1 ELSE 0 END) AS c{i}")
        )
    s = hx.agg(*aggs)
    m = s.withColumn("mean", F.expr("st / n"))

    def _rm(i: int) -> str:
        # empty half-sample → grand-mean fallback (0 deviation): guards
        # ANSI DIVIDE_BY_ZERO at degenerate n, mirrored in the oracle
        return f"CASE WHEN c{i} > 0 THEN s{i} / c{i} ELSE mean END"

    dev = f"({_rm(0)} - mean) * ({_rm(0)} - mean)"
    for i in range(1, r_count):
        dev = f"({dev} + ({_rm(i)} - mean) * ({_rm(i)} - mean))"
    z = 1.959963984540054
    v = m.withColumn(
        "se", F.expr(f"sqrt(({dev}) / CAST({r_count} AS DOUBLE))")
    )
    return v.select(
        F.col("n").cast("bigint").alias("n"),
        F.lit(r_count).cast("bigint").alias("n_replicates"),
        F.round("mean", 6).alias("mean"),
        F.round("se", 6).alias("se"),
        F.round(F.col("mean") - z * F.col("se"), 6).alias("ci_lo"),
        F.round(F.col("mean") + z * F.col("se"), 6).alias("ci_hi"),
    )


@register(
    "equidepth_histogram_value",
    """
    WITH r AS (
      SELECT value,
             NTILE(10) OVER (ORDER BY value, event_id) AS bin
      FROM events WHERE value IS NOT NULL
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
           round(MIN(value), 6) AS lo,
           round(MAX(value), 6) AS hi
    FROM r GROUP BY bin
    """,
    doc=(
        "Equi-DEPTH histogram of the value column (10 bins of equal "
        "row count with their boundaries) — the column statistic a "
        "cost-based optimizer ships (ANALYZE ... FOR COLUMNS), "
        "complementing the equi-WIDTH value_histogram: equi-depth "
        "boundaries adapt to skew, so selectivity estimates stay "
        "honest on heavy-tailed columns. Scale shape: "
        "operators/ranking.distributed_rank (range exchange + "
        "pid-partitioned window — never a single-task NTILE over "
        "data grain) + the closed-form ntile_from_rank, bit-identical "
        "to the oracle's NTILE(10) under the (value, event_id) total "
        "order; then one hash agg at bin grain."
    ),
)
def equidepth_histogram_value(spark, sf_dir):
    from metar_pipeline_spark.operators.ranking import (
        distributed_rank,
        ntile_from_rank,
    )

    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    n = events.agg(F.count(F.lit(1)).alias("__n"))
    r = distributed_rank(
        events.select("value", "event_id"),
        [F.asc("value"), F.asc("event_id")],
        rank_col="__rk",
    ).crossJoin(F.broadcast(n))
    binned = r.select(
        "value",
        ntile_from_rank(F.col("__rk"), F.col("__n"), 10).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@register(
    "sketch_log_checkpoint_truncate",
    """
    WITH h AS (
      SELECT * FROM (VALUES (0, 998244353, 12289), (1, 1000000007, 257),
                            (2, 69061, 65537), (3, 40503, 97)) AS t(r, a, b)
    )
    SELECT CAST(h.r AS INTEGER) AS row,
           CAST(((e.user_id * h.a + h.b) % 2147483647) % 1024 AS BIGINT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events e CROSS JOIN h
    GROUP BY 1, 2
    """,
    doc=(
        "Snapshot-and-truncate lifecycle for the _batch-partitioned "
        "sketch log (round-11 VERDICT #2 — the ops story "
        "stream_cms_sketch_store leaves open: a 30-min cadence grows "
        "~17.5k partitions/year per store). Three micro-batch CMS "
        "partials land via idempotent_batch_append; batches 0-1 are "
        "FOLDED into a durable cell-wise snapshot and their partitions "
        "expired (streaming.lifecycle.checkpoint_and_truncate — "
        "snapshot atomically visible BEFORE any delete); then batch 0 "
        "is maliciously REPLAYED (at-least-once upstream re-creating "
        "an already-consumed partition). The serving view (snapshot ∪ "
        "log strictly after it, partition-pruned) must ignore the "
        "replay and equal the single-pass whole-corpus sketch, which "
        "the oracle replays cell-exactly. The log ends bounded: one "
        "live partition + one snapshot, content ≡ never-truncated "
        "store."
    ),
)
def sketch_log_checkpoint_truncate(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.operators.sketches import cms_build, cms_merge
    from metar_pipeline_spark.streaming.lifecycle import (
        checkpoint_and_truncate,
        serving_view,
    )
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    events = load_table(spark, sf_dir, "events")
    parts = [
        cms_build(
            events.filter(F.col("event_id") % 3 == i).select("user_id"),
            "user_id",
        )
        for i in range(3)
    ]
    tmp = tempfile.mkdtemp(prefix="sketch_lifecycle_")
    log = os.path.join(tmp, "sketch_log")
    snaps = os.path.join(tmp, "sketch_snapshots")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        for i, p in enumerate(parts):
            idempotent_batch_append(p, log, i)
        checkpoint_and_truncate(
            spark,
            log,
            snaps,
            lambda snap, consumed: (
                cms_merge(snap, consumed) if snap is not None
                else cms_merge(consumed)
            ),
            through_batch=1,
        )
        # at-least-once upstream replays an already-consumed batch
        idempotent_batch_append(parts[0], log, 0)
        result = cms_merge(
            serving_view(spark, log, snaps)
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "skipping_scan_value_range",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    WHERE CAST(FLOOR(value * 100) AS BIGINT) BETWEEN 10000 AND 15000
    GROUP BY event_type
    """,
    doc=(
        "File-level min/max data skipping for a NON-partition column "
        "(round-11 VERDICT #3 — the Iceberg/Delta data-skipping idea, "
        "partition pruning's complement): events are laid out by "
        "cent-scaled value into range files (sources/layout."
        "write_range_layout — disjoint per-file footer ranges), a "
        "(file, n_rows, col_min, col_max) manifest is built from "
        "DISTRIBUTED parquet-footer reads only (layout."
        "build_skipping_manifest via mapInPandas — KBs of metadata per "
        "file, never data pages), and a value BETWEEN scan opens only "
        "the files the manifest cannot exclude (layout.skipping_scan). "
        "The aggregate is manifest-INVARIANT: the row filter applies "
        "regardless, so the oracle is the plain full-scan predicate — "
        "same rows with and without skipping; the touched-file-count "
        "pin lives in tests/test_layout.py. At 100 TB this is the "
        "difference between touching ~1% and 100% of files for a "
        "range predicate on an unpartitioned column."
    ),
)
def skipping_scan_value_range(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.layout import (
        skipping_scan,
        write_range_layout,
        write_skipping_manifest,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("value_c"),
    )
    tmp = tempfile.mkdtemp(prefix="skipping_scan_")
    table = os.path.join(tmp, "events_by_value")
    manifest = os.path.join(tmp, "manifest")
    try:
        write_range_layout(ev, table, ["value_c"], num_files=8)
        write_skipping_manifest(spark, table, ["value_c"], manifest)
        pruned = skipping_scan(
            spark, table, manifest, "value_c", 10000, 15000
        )
        result = (
            pruned.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("value_c").cast("long").alias("sum_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "ivm_log_checkpoint_truncate",
    """
    WITH st AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CASE WHEN event_id % 4 <> 3 AND event_id % 7 = 0
                  THEN value + 1.0 ELSE value END AS v
      FROM events
      WHERE NOT (event_id % 4 <> 3 AND event_id % 7 <> 0
                 AND event_id % 11 = 0)
    )
    SELECT event_type, day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_value
    FROM st GROUP BY 1, 2
    """,
    doc=(
        "Snapshot-and-truncate over the IVM DELTA LOG — the second of "
        "the three growing _batch stores (round-11 VERDICT #2; the "
        "sketch log is q:sketch_log_checkpoint_truncate). The same "
        "3-batch CDC changelog as stream_ivm_delta_view lands as "
        "group-grain Z-set deltas (ivm.zset_weighted_agg) in a "
        "replay-idempotent delta log; batches 0-1 are folded into a "
        "durable VIEW-STATE snapshot (Z-set group sums — null-as-zero "
        "adds, net-zero groups dropped, exact DECIMAL, so fold order "
        "can never matter) and their partitions expired; batch 1 is "
        "then maliciously replayed and batch 2 appended. The serving "
        "view (snapshot ∪ strictly-later partitions, reduced by the "
        "same Z-set merge) must equal the from-scratch recompute of "
        "the final CDC state, which the oracle performs — "
        "view-after-truncation ≡ full recompute, exact by "
        "DECIMAL/integer arithmetic."
    ),
)
def ivm_log_checkpoint_truncate(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.operators.ivm import zset_weighted_agg
    from metar_pipeline_spark.streaming.lifecycle import (
        checkpoint_and_truncate,
        serving_view,
    )
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    live = eid % 4 != 3
    upd = live & (eid % 7 == 0)
    dele = live & (eid % 7 != 0) & (eid % 11 == 0)
    keys = ["event_type", "day"]
    row = lambda v, w: [  # noqa: E731 — changelog row shape
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        v.alias("v"),
        F.lit(w).alias("_w"),
    ]
    b0 = events.filter(live).select(*row(F.col("value"), 1))
    b1 = (
        events.filter(upd)
        .select(*row(F.col("value"), -1))
        .unionByName(
            events.filter(upd).select(*row(F.col("value") + 1.0, 1))
        )
        .unionByName(
            events.filter(~live).select(*row(F.col("value"), 1))
        )
    )
    b2 = events.filter(dele).select(*row(F.col("value"), -1))
    deltas = [
        zset_weighted_agg(
            b, keys, sums={"total": F.col("v").cast("decimal(18,2)")}
        )
        for b in (b0, b1, b2)
    ]

    def zset_fold(snap, consumed):
        u = consumed if snap is None else snap.unionByName(consumed)
        return (
            u.groupBy(*keys)
            .agg(
                F.sum("_n").cast("long").alias("_n"),
                # exact decimal add; cast back so the snapshot schema
                # is a fixpoint across checkpoint generations
                F.sum("total").cast("decimal(18,2)").alias("total"),
            )
            .filter(F.col("_n") != 0)
        )

    tmp = tempfile.mkdtemp(prefix="ivm_lifecycle_")
    log = os.path.join(tmp, "delta_log")
    snaps = os.path.join(tmp, "view_snapshots")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        idempotent_batch_append(deltas[0], log, 0)
        idempotent_batch_append(deltas[1], log, 1)
        checkpoint_and_truncate(
            spark, log, snaps, zset_fold, through_batch=1
        )
        # at-least-once upstream replays a consumed batch, then the
        # next real batch arrives
        idempotent_batch_append(deltas[1], log, 1)
        idempotent_batch_append(deltas[2], log, 2)
        view = zset_fold(None, serving_view(spark, log, snaps))
        result = view.select(
            "event_type",
            "day",
            F.col("_n").alias("n_events"),
            F.round(F.col("total").cast("double"), 2).alias("sum_value"),
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


def _ivm_kmv_oracle(k: int = 32, pcts=(25, 50, 75, 90)) -> str:
    """Full-recompute twin of ivm_kmv_quantile_view: rebuild the KMV
    sample from the post-CDC state and take the same integer-rank
    order statistics."""
    from metar_pipeline_spark.operators.sketches import _CMS_P, fm_constants

    a1, b1, a2 = fm_constants(0)
    picks = ",\n           ".join(
        f"round(MAX(CASE WHEN rn = CAST((n * {p} + 99) // 100 AS INT)"
        f" THEN value END), 6) AS p{p}"
        for p in pcts
    )
    return f"""
    WITH st AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             event_id,
             CASE WHEN event_id % 5 <> 0 AND event_id % 101 = 0
                  THEN value + 0.5 ELSE value END AS value
      FROM events
      WHERE value IS NOT NULL
        AND NOT (event_id % 5 <> 0 AND event_id % 101 <> 0
                 AND event_id % 97 = 0)
    ),
    hx AS (
      SELECT event_type, day, event_id, value,
             (event_id * {a1} + {b1}) % {_CMS_P} AS h1
      FROM st
    ),
    hu AS (
      SELECT event_type, day, event_id, value,
             (h1 * h1 + h1 * {a2}) % {_CMS_P} AS h
      FROM hx
    ),
    samp AS (
      SELECT * FROM hu
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY event_type, day ORDER BY h, event_id
      ) <= {k}
    ),
    r AS (
      SELECT event_type, day, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, day ORDER BY value, event_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY event_type, day) AS n
      FROM samp
    )
    SELECT event_type, day, CAST(MAX(n) AS BIGINT) AS n_sample,
           {picks}
    FROM r GROUP BY event_type, day
    """


@register(
    "ivm_kmv_quantile_view",
    _ivm_kmv_oracle(),
    doc=(
        "IVM for a QUANTILE view — the sketch-backed completion of the "
        "maintained-view family (COUNT/SUM: ivm_delta_agg_view, "
        "MIN/MAX: minmax, TOP-K: topk, variance: var; quantiles close "
        "it): a per-type KMV bottom-k sample IS a top-k by ascending "
        "fixed integer hash, so it maintains under a CDC Z-set with "
        "the ALREADY-VERIFIED ivm.apply_topk_delta — inserts re-rank "
        "at view grain; a retraction (delete, or the retract half of "
        "an update) hitting a SAMPLED id rescans only that group from "
        "the post-batch base; non-member retractions are provably "
        "no-ops (removing an element larger than the k-th smallest "
        "hash cannot change the bottom-k), and updates keep membership "
        "invariant (the hash is on the id) so only sampled-member "
        "updates pay a rescan. Values join back to the post-state at "
        "sample grain (broadcast, ≤k·|groups| rows); estimates are the "
        "kmv_quantile_estimate exact order statistics at integer "
        "DIV ranks. Oracle = full sample recompute from the new state "
        "— maintenance ≡ recompute at the gate. (type, day) grain with "
        "k=32: at every SF some groups see no retraction of a sampled "
        "id (pure algebra) while others rescan — both paths exercised "
        "at the gate (a type-only grain measured 5/5 groups rescanning)."
    ),
)
def ivm_kmv_quantile_view(spark, sf_dir):
    from metar_pipeline_spark.operators.ivm import apply_topk_delta
    from metar_pipeline_spark.operators.ranking import grouped_topk
    from metar_pipeline_spark.operators.sketches import (
        _CMS_P as P,
        fm_constants,
    )
    from metar_pipeline_spark.operators.sketches import (
        kmv_quantile_estimate,
    )

    k = 32
    a1, b1, a2 = fm_constants(0)
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    eid = F.col("event_id")
    is_ins = eid % 5 == 0
    is_upd = (eid % 5 != 0) & (eid % 101 == 0)
    is_del = (eid % 5 != 0) & (eid % 101 != 0) & (eid % 97 == 0)
    h1 = F.pmod(eid.cast("bigint") * F.lit(a1) + F.lit(b1), F.lit(P))
    score = (-F.pmod(h1 * h1 + h1 * F.lit(a2), F.lit(P))).alias("score")
    groups = ["event_type", "day"]
    base = events.select(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_id",
        score,
        "value",
    )
    salt = F.pmod(F.col("event_id"), F.lit(32))
    # the STORED sample: pre-batch bottom-k (= top-k by negated hash)
    view = grouped_topk(
        base.filter(~is_ins).select(*groups, "event_id", "score"),
        groups,
        [F.desc("score"), F.asc("event_id")],
        k,
        salt=salt,
    ).drop("rank")
    ids = [*groups, "event_id", "score"]
    dz = (
        base.filter(is_ins).select(*ids).withColumn("_w", F.lit(1))
        .unionByName(
            base.filter(is_upd).select(*ids).withColumn("_w", F.lit(-1))
        )
        .unionByName(
            base.filter(is_upd).select(*ids).withColumn("_w", F.lit(1))
        )
        .unionByName(
            base.filter(is_del).select(*ids).withColumn("_w", F.lit(-1))
        )
    )
    base_new = base.filter(~is_del).withColumn(
        "value",
        F.when(is_upd, F.col("value") + 0.5).otherwise(F.col("value")),
    )
    sample = apply_topk_delta(
        view,
        dz,
        base_new.select(*ids),
        groups,
        "event_id",
        "score",
        k,
    )
    # current values at sample grain (≤ k·|groups| rows — broadcast)
    joined = base_new.select(*groups, "event_id", "value").join(
        F.broadcast(sample.select(*groups, "event_id")),
        [*groups, "event_id"],
    )
    est = kmv_quantile_estimate(
        joined, groups, "value", "event_id", [25, 50, 75, 90]
    )
    return est.select(
        *groups,
        "n_sample",
        *[F.round(F.col(f"p{p}"), 6).alias(f"p{p}") for p in (25, 50, 75, 90)],
    )


@register(
    "stream_profile_anomaly_store",
    """
    WITH p AS (
      SELECT event_id % 5 AS run_id,
             CASE WHEN event_id % 5 = 4 AND user_id % 2 = 0
                  THEN NULL ELSE user_id END AS user_id,
             value
      FROM events
    ),
    prof AS (
      SELECT run_id, 'user_id' AS column_name, 'count' AS stat,
             CAST(COUNT(user_id) AS BIGINT) AS value
      FROM p GROUP BY run_id
      UNION ALL
      SELECT run_id, 'user_id', 'null_count',
             CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM p GROUP BY run_id
      UNION ALL
      SELECT run_id, 'user_id', 'null_ppm',
             CAST((2 * 1000000 *
                   SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                   + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
      FROM p GROUP BY run_id
      UNION ALL
      SELECT run_id, 'value', 'min_i',
             CAST(MIN(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
      FROM p GROUP BY run_id
      UNION ALL
      SELECT run_id, 'value', 'max_i',
             CAST(MAX(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
      FROM p GROUP BY run_id
    ),
    lt AS (SELECT MAX(run_id) AS lr FROM prof),
    h AS (
      SELECT column_name, stat,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(value AS HUGEINT)) AS HUGEINT) AS s,
             CAST(SUM(CAST(value AS HUGEINT) * CAST(value AS HUGEINT))
                  AS HUGEINT) AS q
      FROM prof WHERE run_id < (SELECT lr FROM lt)
      GROUP BY 1, 2
    ),
    l AS (SELECT * FROM prof WHERE run_id = (SELECT lr FROM lt))
    SELECT l.column_name, l.stat,
           CAST(l.run_id AS BIGINT) AS run_id,
           l.value,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS hist_n,
           CASE WHEN COALESCE(h.n, 0) > 0
                THEN CAST((2 * h.s + h.n) // (2 * h.n) AS BIGINT)
           END AS hist_mean_i,
           (COALESCE(h.n, 0) >= 3 AND
            (h.n * CAST(l.value AS HUGEINT) - h.s)
              * (h.n * CAST(l.value AS HUGEINT) - h.s)
              > 9 * (h.n * h.q - h.s * h.s)) AS is_anomaly
    FROM l LEFT JOIN h USING (column_name, stat)
    """,
    doc=(
        "Q6 riding the REAL streaming loop — the monitoring story "
        "end-to-end: 5 micro-batches (event_id mod 5, "
        "maxFilesPerTrigger=1), each reduced IN the foreachBatch to "
        "its exact-BIGINT column profile (quality.anomalies."
        "column_profile_long riding the batch's only scan) and "
        "persisted replay-idempotently into the _batch-partitioned "
        "metrics log; the LAST batch arrives poisoned (half its "
        "user_ids null). The k·σ rule then runs off the persisted "
        "store and flags exactly the poisoned run's null stats — the "
        "oracle replays the per-batch profiles and the rule from the "
        "raw table. The store grows 5 rows × stats per batch (KB/"
        "year); its retention is the proven snapshot-and-truncate "
        "lifecycle (q:sketch_log_checkpoint_truncate)."
    ),
)
def stream_profile_anomaly_store(spark, sf_dir):
    import glob
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.quality.anomalies import (
        column_profile_long,
        profile_anomalies,
    )
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    events = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    batches = [
        events.filter(eid % 5 == i).select(
            "event_id",
            F.when(
                F.lit(i == 4) & (F.col("user_id") % 2 == 0), F.lit(None)
            )
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "value",
        )
        for i in range(5)
    ]
    tmp = tempfile.mkdtemp(prefix="stream_profile_")
    src = os.path.join(tmp, "src")
    ckpt = os.path.join(tmp, "_ckpt")
    log = os.path.join(tmp, "metrics_log")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        import time as _t

        now = _t.time()

        # The five batch drops write DISJOINT directories — overlap
        # them from a driver pool (guide §2.6; round 13: the serial
        # loop paid five ~0.3 s plan/commit fixed costs back to back).
        # mtimes are pinned AFTER all writes land, so replay order is
        # exactly as before.
        from metar_pipeline_spark.streaming.pipeline import (
            parallel_batch_drops,
        )

        def _drop(i, b):
            return lambda: b.coalesce(1).write.parquet(
                os.path.join(src, f"b{i}")
            )

        parallel_batch_drops(
            [_drop(i, b) for i, b in enumerate(batches)]
        )
        for i in range(len(batches)):
            d = os.path.join(src, f"b{i}")
            # FileStreamSource orders by mtime — pin the replay order
            for fn in glob.glob(os.path.join(d, "*")):
                t_i = now - 60 + i * 10
                os.utime(fn, (t_i, t_i))
        schema = spark.read.parquet(os.path.join(src, "b0")).schema

        def fold(batch_df, batch_id):
            prof = column_profile_long(
                batch_df,
                batch_id,
                ["user_id"],
                {"value": F.floor(F.col("value") * 100).cast("long")},
            )
            idempotent_batch_append(prof.coalesce(1), log, batch_id)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        store = spark.read.parquet(log).select(
            "run_id", "column_name", "stat", "value"
        )
        result = profile_anomalies(
            store, k=3, min_history=3
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "skipping_scan_box_zorder",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(user_id) AS BIGINT) AS sum_users
    FROM events
    WHERE CAST(FLOOR(value * 100) AS BIGINT) BETWEEN 5000 AND 20000
      AND user_id % 100 BETWEEN 10 AND 39
    GROUP BY event_type
    """,
    doc=(
        "Multi-column (box) data skipping over a Z-ORDERED layout — "
        "the two-dimensional completion of skipping_scan_value_range: "
        "events are laid out along the Morton curve of (cents, "
        "user-id bucket) (sources/layout.write_zorder_layout — both "
        "share file locality), the footer manifest covers both "
        "columns, and a conjunctive box predicate opens only files "
        "the manifest cannot exclude on EITHER dimension "
        "(layout.skipping_scan_multi — per-column exclusions AND "
        "together, so the box touches strictly fewer files than "
        "either range alone, pinned in tests/test_layout.py). "
        "Manifest-invariant as before: the row filter always applies, "
        "so the oracle is the plain full-scan predicate."
    ),
)
def skipping_scan_box_zorder(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.layout import (
        skipping_scan_multi,
        write_skipping_manifest,
        write_zorder_layout,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        (F.col("user_id") % 100).alias("u_bucket"),
        F.floor(F.col("value") * 100).cast("long").alias("value_c"),
    )
    tmp = tempfile.mkdtemp(prefix="skipping_box_")
    table = os.path.join(tmp, "events_z")
    manifest = os.path.join(tmp, "manifest")
    try:
        write_zorder_layout(
            ev, table, "value_c", "u_bucket", num_files=16, bits=10
        )
        write_skipping_manifest(
            spark, table, ["value_c", "u_bucket"], manifest
        )
        pruned = skipping_scan_multi(
            spark,
            table,
            manifest,
            {"value_c": (5000, 20000), "u_bucket": (10, 39)},
        )
        result = (
            pruned.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("user_id").cast("long").alias("sum_users"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "versioned_store_time_travel",
    """
    WITH w AS (
      SELECT v.version, o_custkey, MAX(o_orderkey) AS winner
      FROM orders o CROSS JOIN (VALUES (0), (1), (2)) AS v(version)
      WHERE (o_orderkey % 4) <= v.version
      GROUP BY 1, 2
    )
    SELECT CAST(version AS INTEGER) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(winner) AS BIGINT) AS sum_winner_keys
    FROM w
    GROUP BY 1
    """,
    doc=(
        "Optimistic-concurrency commit protocol with as-of time travel "
        "(round-12 VERDICT #1 — the Postgres transaction the reference "
        "leans on at src/etl/mongo_to_postgres.py:89-112, rebuilt for "
        "plain parquet as a Delta-style numbered commit log claimed by "
        "atomic rename, sources/txn.py). Three order batches "
        "(o_orderkey mod 4 = generation) MERGE through "
        "upsert_versioned — each commit an immutable snapshot dir "
        "referenced by its claimed commit file — and the query reads "
        "the store AS OF every version: per-version key counts and "
        "the sum of each key's last-writer-wins winner orderkey. The "
        "oracle replays the cumulative merge per version in SQL; a "
        "hash match proves both the merge semantics and that history "
        "is immutable (old versions re-read exactly, never "
        "reconstructed). Interleaved-writer conflict/retry is pinned "
        "in tests/test_txn.py; vacuum GC of loser snapshots in "
        "tests/test_vacuum.py."
    ),
)
def versioned_store_time_travel(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.txn import (
        VersionedStore,
        upsert_versioned,
    )

    orders = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="versioned_store_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        store = VersionedStore(spark, os.path.join(tmp, "orders_v"))
        for gen in range(3):
            batch = orders.filter(
                F.col("o_orderkey") % 4 == gen
            ).select("o_custkey", "o_orderkey")
            upsert_versioned(
                store, batch, keys=["o_custkey"], order_col="o_orderkey"
            )
        out = None
        for v in range(3):
            agg = (
                store.read(as_of=v)
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_keys"),
                    F.sum("o_orderkey").cast("long").alias(
                        "sum_winner_keys"
                    ),
                )
                .select(
                    F.lit(v).cast("int").alias("version"),
                    "n_keys",
                    "sum_winner_keys",
                )
            )
            out = agg if out is None else out.unionByName(agg)
        result = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "wap_publish_gate",
    """
    WITH b0 AS (SELECT * FROM events WHERE event_id % 3 = 0),
         b1 AS (SELECT * FROM events WHERE event_id % 3 = 1)
    SELECT 'after_failed_publish' AS phase, CAST(0 AS INTEGER) AS version,
           CAST((SELECT COUNT(*) FROM b0) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'rejected_staged', CAST(-1 AS INTEGER),
           CAST((SELECT COUNT(*) FROM b0)
                + (SELECT COUNT(*) FROM b1) AS BIGINT)
    UNION ALL
    SELECT 'after_clean_publish', CAST(1 AS INTEGER),
           CAST((SELECT COUNT(*) FROM b0)
                + (SELECT COUNT(*) FROM b1) AS BIGINT)
    """,
    doc=(
        "Write-Audit-Publish over the commit protocol (round-12 "
        "VERDICT #5): a poisoned batch (event_type nulled on every "
        "7th id) is STAGED as an unclaimed snapshot, audited with the "
        "dbt-style Q1/Q2 assertions against the staged FILES, and "
        "rejected — the published version is untouched (phase row 1: "
        "still version 0 with the v0 row count) while the staged "
        "snapshot remains inspectable for triage (phase row 2: its "
        "full row count under version sentinel -1). The clean retry "
        "publishes as version 1 (phase row 3). The oracle recomputes "
        "every phase's expected count from the raw events — a hash "
        "match proves the failing publish had no observable effect "
        "on the serving store, which is the entire WAP contract "
        "(Iceberg's audit-branch pattern in its minimal form)."
    ),
)
def wap_publish_gate(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.quality.assertions import not_null, unique
    from metar_pipeline_spark.sources.txn import (
        VersionedStore,
        write_audit_publish,
    )

    events = load_table(spark, sf_dir, "events")
    base = events.select("event_id", "user_id", "event_type", "value")
    b0 = base.filter(F.col("event_id") % 3 == 0)
    b1 = base.filter(F.col("event_id") % 3 == 1)
    tmp = tempfile.mkdtemp(prefix="wap_gate_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    audits = [
        lambda df: not_null(df, "event_type"),
        lambda df: unique(df, "event_id"),
    ]
    try:
        store = VersionedStore(spark, os.path.join(tmp, "serving"))
        store.commit(b0, "init", read_version=-1)
        poisoned = b0.unionByName(
            b1.withColumn(
                "event_type",
                F.when(
                    F.col("event_id") % 7 == 0, F.lit(None).cast("string")
                ).otherwise(F.col("event_type")),
            )
        )
        r1 = write_audit_publish(store, poisoned, audits)
        assert r1["status"] == "rejected"

        def phase_row(phase):
            return (
                store.read()
                .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
                .select(
                    F.lit(phase).alias("phase"),
                    F.lit(store.latest_version()).cast("int").alias(
                        "version"
                    ),
                    "n_rows",
                )
            )

        after_fail = phase_row("after_failed_publish")
        staged = (
            spark.read.parquet(r1["staged_path"])
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .select(
                F.lit("rejected_staged").alias("phase"),
                F.lit(-1).cast("int").alias("version"),
                "n_rows",
            )
        )
        r2 = write_audit_publish(store, b0.unionByName(b1), audits)
        assert r2["status"] == "published"
        after_clean = phase_row("after_clean_publish")
        result = (
            after_fail.unionByName(staged)
            .unionByName(after_clean)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "versioned_store_changes",
    """
    WITH v0 AS (
      SELECT o_custkey, MAX(o_orderkey) AS w
      FROM orders WHERE o_orderkey % 4 = 0 GROUP BY 1
    ), v2 AS (
      SELECT o_custkey, MAX(o_orderkey) AS w
      FROM orders WHERE o_orderkey % 4 <= 2 GROUP BY 1
    ), d AS (
      SELECT coalesce(v0.o_custkey, v2.o_custkey) AS k,
             CASE WHEN v0.o_custkey IS NULL THEN 'inserted'
                  WHEN v2.o_custkey IS NULL THEN 'deleted'
                  WHEN v0.w <> v2.w THEN 'updated'
                  ELSE 'unchanged' END AS change_type
      FROM v0 FULL OUTER JOIN v2 ON v0.o_custkey = v2.o_custkey
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_checksum
    FROM d GROUP BY 1
    """,
    doc=(
        "Change feed BETWEEN committed versions, derived on read from "
        "immutable snapshots (sources/txn.table_changes — the Delta "
        "Change-Data-Feed idea without write-path bookkeeping): the "
        "same three-merge store as versioned_store_time_travel, "
        "diffed v0→v2 with a full-outer fingerprint join "
        "(operators/diffops.snapshot_diff) and rolled up to "
        "(change_type, n_rows, key_checksum). The oracle recomputes "
        "both cumulative last-writer-wins states and classifies every "
        "key in SQL — a hash match proves the feed is exactly the "
        "semantic difference of the two merges, reproducible forever "
        "from the immutable version dirs."
    ),
)
def versioned_store_changes(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.operators.diffops import diff_summary
    from metar_pipeline_spark.sources.txn import (
        VersionedStore,
        table_changes,
        upsert_versioned,
    )

    orders = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="versioned_cdf_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        store = VersionedStore(spark, os.path.join(tmp, "orders_v"))
        for gen in range(3):
            batch = orders.filter(
                F.col("o_orderkey") % 4 == gen
            ).select("o_custkey", "o_orderkey")
            upsert_versioned(
                store, batch, keys=["o_custkey"], order_col="o_orderkey"
            )
        feed = table_changes(store, 0, 2, "o_custkey", ["o_orderkey"])
        result = diff_summary(feed, "o_custkey").localCheckpoint(
            eager=True
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "stream_versioned_ingest",
    """
    WITH w AS (
      SELECT user_id, MAX(event_id) AS weid FROM events GROUP BY 1
    )
    SELECT CAST(4 AS INTEGER) AS n_versions,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(weid) AS BIGINT) AS sum_winner_event_ids
    FROM w
    """,
    doc=(
        "Structured-Streaming ingest THROUGH the optimistic commit "
        "protocol: the fact file streams as 4 real micro-batches "
        "(maxFilesPerTrigger=1), each foreachBatch MERGING its rows "
        "into a VersionedStore via upsert_versioned (last-writer-wins "
        "per user_id by event_id) — every micro-batch lands as one "
        "claimed commit, so the store's history is an auditable "
        "one-version-per-batch log and a crash between batches leaves "
        "a consistent committed prefix (the exactly-once story "
        "foreachBatch alone does not give a plain-parquet sink). The "
        "result reads the FINAL version plus the commit count; the "
        "oracle replays the cumulative merge as a plain per-user "
        "argmax over the whole fact — batch boundaries must not leak "
        "into the final state."
    ),
)
def stream_versioned_ingest(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.txn import (
        VersionedStore,
        upsert_versioned,
    )

    events = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="stream_versioned_")
    src = os.path.join(tmp, "src")
    ckpt = os.path.join(tmp, "_ckpt")
    events.select("event_id", "user_id", "value").repartition(
        4, F.col("event_id")
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    store = VersionedStore(spark, os.path.join(tmp, "serving"))

    def ingest(batch_df, batch_id):
        # app identity makes a foreachBatch RETRY of the same batch a
        # no-op returning the already-claimed version (exactly-once
        # commits over at-least-once delivery — Delta's txnAppId idea)
        upsert_versioned(
            store,
            batch_df.select("event_id", "user_id"),
            keys=["user_id"],
            order_col="event_id",
            app_id="stream_versioned_ingest",
            app_batch=int(batch_id),
        )

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_versions = store.latest_version() + 1
        result = (
            store.read()
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.sum("event_id").cast("long").alias(
                    "sum_winner_event_ids"
                ),
            )
            .select(
                F.lit(n_versions).cast("int").alias("n_versions"),
                "n_users",
                "sum_winner_event_ids",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_partition_backfill",
    """
    WITH flagged AS (
      SELECT *, (ts >= TIMESTAMP '2024-01-28' AND event_id % 2 = 0)
               AS is_late
      FROM events
    )
    SELECT 'v0_pre_backfill' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM flagged WHERE NOT is_late
    UNION ALL
    SELECT 'v1_post_backfill',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
    FROM flagged
    """,
    doc=(
        "File-ACTION commit log — the O(changed files) half of the "
        "commit protocol (sources/filelog.py, the Delta txn-log "
        "design: commits record add/remove file actions, data files "
        "are written once and never rewritten). The on-time fact "
        "slice lands as an append partitioned by day; the late slice "
        "then backfills via overwrite_partitions, which removes and "
        "re-adds ONLY the affected day partitions (other days' "
        "physical files stay byte-identical — pinned in "
        "tests/test_filelog.py) while the claim CAS serializes "
        "concurrent writers. The result reads BOTH versions: as-of 0 "
        "must equal the on-time-only state (time travel across a "
        "destructive-looking backfill) and latest must equal the "
        "full recompute — exactly what the oracle computes from the "
        "raw fact. At 100 TB this is the difference between a "
        "backfill costing O(late days) and O(table)."
    ),
)
def filelog_partition_backfill(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    is_late = (
        F.col("ts") >= F.lit("2024-01-28").cast("timestamp")
    ) & (F.col("event_id") % 2 == 0)
    base = events.select(
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        day,
        is_late.alias("is_late"),
    )
    tmp = tempfile.mkdtemp(prefix="filelog_backfill_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(
            base.filter(~F.col("is_late")).drop("is_late"),
            partition_cols=["day"],
        )
        affected = [
            str(r.day)
            for r in base.filter(F.col("is_late"))
            .select("day")
            .distinct()
            .collect()  # bounded-collect: affected-day grain
        ]
        repaired = base.filter(
            F.col("day").isin(affected)
        ).drop("is_late")
        log.overwrite_partitions(repaired, "day", sorted(affected))

        def phase(name, ver):
            return (
                log.read(as_of=ver)
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum("cents").cast("long").alias("sum_cents"),
                )
                .select(
                    F.lit(name).alias("phase"), "n_rows", "sum_cents"
                )
            )

        result = (
            phase("v0_pre_backfill", 0)
            .unionByName(phase("v1_post_backfill", 1))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_stats_pruned_scan",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    WHERE CAST(FLOOR(value * 100) AS BIGINT) BETWEEN 10000 AND 15000
    GROUP BY event_type
    """,
    doc=(
        "Stats-in-log data skipping (the Delta design that makes the "
        "standalone manifest's staleness problem structurally "
        "impossible): each commit to a FileCommitLog captures its own "
        "files' parquet-footer min/max ATOMICALLY with the file "
        "actions (distributed footer reads via mapInPandas; "
        "commit-grain json), so a range scan prunes from the log with "
        "no separate refresh step ever. Events are range-laid-out on "
        "cent-scaled value and appended as four disjoint-range "
        "commits; read_pruned opens only the files the stats cannot "
        "exclude. The aggregate is stats-INVARIANT (row filter always "
        "applied) — the oracle is the plain full-scan predicate; the "
        "pruned-file-count pin and checkpoint-survival live in "
        "tests/test_filelog.py."
    ),
)
def filelog_stats_pruned_scan(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    # fixed cent-range banding (disjoint per-file ranges WITHOUT a
    # global-sort window — ntile over an unpartitioned orderBy would
    # be a single-task sort at scale)
    cents = F.floor(F.col("value") * 100).cast("long")
    base = events.select(
        "event_id",
        "event_type",
        cents.alias("cents"),
        F.least(F.lit(3), F.floor(cents / 5000)).cast("int").alias("band"),
    )
    tmp = tempfile.mkdtemp(prefix="filelog_stats_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(
            spark, os.path.join(tmp, "fact"), stats_cols=["cents"]
        )
        banded = base.localCheckpoint(eager=True)  # 4 slices, one pass
        # independent commits overlap on a driver thread pool (append
        # order is result-invisible — appends commute; guide §2.6)
        log.append_all(
            [
                banded.filter(F.col("band") == b).drop("band").coalesce(1)
                for b in range(0, 4)
            ]
        )
        result = (
            log.read_pruned("cents", 10000, 15000)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_deletion_vectors",
    """
    SELECT 'v0_all_rows' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    UNION ALL
    SELECT 'v1_after_delete',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
    FROM events WHERE NOT (user_id % 7 = 0)
    """,
    doc=(
        "Row-level DELETE via deletion vectors (the Delta/Iceberg v2 "
        "position-delete design — the GDPR right-to-be-forgotten "
        "shape at 100 TB): delete_where identifies matching rows by "
        "(file, _metadata.row_index), commits them as a position "
        "vector under _dv/, and NEVER rewrites a data file (pinned in "
        "tests/test_filelog.py: the live file set is unchanged). "
        "Readers anti-join active vectors; compaction later "
        "materializes and spends them; vacuum reclaims spent vectors. "
        "The result reads the pre-delete version (time travel — the "
        "deleted users are still there at v0, which is also the audit "
        "story) and the post-delete latest; the oracle recomputes "
        "both from the raw fact. Delete cost: one scan + O(matched "
        "rows) written, independent of table size."
    ),
)
def filelog_deletion_vectors(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    tmp = tempfile.mkdtemp(prefix="filelog_dv_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(base)
        assert log.delete_where(F.col("user_id") % 7 == 0) == 1

        def phase(name, ver):
            return (
                log.read(as_of=ver)
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum("cents").cast("long").alias("sum_cents"),
                )
                .select(
                    F.lit(name).alias("phase"), "n_rows", "sum_cents"
                )
            )

        result = (
            phase("v0_all_rows", 0)
            .unionByName(phase("v1_after_delete", 1))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_merge_upsert",
    """
    WITH upd AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) + 1000000 AS cents
      FROM orders WHERE o_orderkey % 5 = 0
    ), merged AS (
      SELECT o.o_orderkey,
             coalesce(u.cents,
                      CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders o LEFT JOIN upd u USING (o_orderkey)
    )
    SELECT 'v0_initial' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    UNION ALL
    SELECT 'v1_after_merge',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM merged
    """,
    doc=(
        "Keyed MERGE on the file-action log as ONE atomic commit with "
        "ZERO data-file rewrites (filelog.merge_by_key): stored rows "
        "matching the batch's keys are deletion-vectored and the "
        "batch's files appended IN THE SAME claimed commit — readers "
        "see pre- or post-merge, never a mix, and the merge costs "
        "O(scan + |batch| + |matches|) instead of txn's O(table) "
        "snapshot rewrite. Every fifth order gets a re-priced row; "
        "the oracle recomputes last-writer-wins with a LEFT JOIN "
        "coalesce. The pre-merge version still reads exactly (time "
        "travel); the no-file-rewrite pin and the empty-store / "
        "no-match edge cases live in tests/test_filelog.py."
    ),
)
def filelog_merge_upsert(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    upd = base.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "cents", F.col("cents") + F.lit(1000000)
    )
    tmp = tempfile.mkdtemp(prefix="filelog_merge_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(base)
        assert log.merge_by_key(upd, ["o_orderkey"]) == 1

        def phase(name, ver):
            return (
                log.read(as_of=ver)
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum("cents").cast("long").alias("sum_cents"),
                )
                .select(
                    F.lit(name).alias("phase"), "n_rows", "sum_cents"
                )
            )

        result = (
            phase("v0_initial", 0)
            .unionByName(phase("v1_after_merge", 1))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_change_feed",
    """
    WITH base AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), merged AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN cents + 1000000
                  ELSE cents END AS cents
      FROM base
    )
    SELECT 0 AS _commit_version, 'insert' AS _change_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM base
    UNION ALL
    SELECT 1, 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM base WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT 1, 'insert', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM merged WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT 2, 'delete', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM merged WHERE o_orderkey % 7 = 0
    """,
    doc=(
        "Exact change-data-feed off the file-action commit log "
        "(filelog.read_changes — Delta CDF semantics, derived purely "
        "from the committed file actions): an append feeds inserts, a "
        "keyed MERGE feeds delete(pre-image)+insert(post-image) in one "
        "version, a deletion-vector DELETE feeds exactly the vectored "
        "rows — each commit's slice costs O(files that commit "
        "touched), never a table scan, which is what lets a 100-TB "
        "downstream consumer keep a cursor instead of re-reading. The "
        "oracle recomputes every (version, change-type) stratum from "
        "the raw fact: the merge's pre-images carry PRE-merge cents, "
        "the delete's pre-images carry POST-merge cents — any "
        "double-feed, missed vector, or stale-image bug breaks a "
        "stratum sum. Fold-equality (inserts − deletes ≡ table) and "
        "compact-neutrality are pinned in tests/test_filelog.py."
    ),
)
def filelog_change_feed(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    upd = base.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "cents", F.col("cents") + F.lit(1000000)
    )
    tmp = tempfile.mkdtemp(prefix="filelog_cdf_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(base)                                    # v0
        assert log.merge_by_key(upd, ["o_orderkey"]) == 1   # v1
        assert log.delete_where(F.col("o_orderkey") % 7 == 0) == 2
        result = (
            log.read_changes(-1)
            .groupBy("_commit_version", "_change_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_cdf_downstream_agg",
    """
    SELECT user_id % 10 AS user_band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    WHERE event_id % 11 <> 0
    GROUP BY user_id % 10
    """,
    doc=(
        "Cursor-driven incremental consumer on the change feed: a "
        "downstream aggregate is maintained PURELY from "
        "read_changes deltas (insert adds, delete subtracts), "
        "consumed in two cursor windows — (-1, v1] then (v1, latest] "
        "— across an append, a partition backfill (whose replaced "
        "files feed deletes and replacements feed inserts), and a "
        "deletion-vector DELETE. The maintained result must equal the "
        "direct aggregate over the final table, which is exactly what "
        "the oracle computes — any missed delete, double-fed file, or "
        "wrong pre-image breaks a band. This is the 100-TB downstream "
        "pattern: each refresh costs O(changed files since the "
        "cursor), never a re-scan of the fact."
    ),
)
def filelog_cdf_downstream_agg(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    is_late = (
        F.col("ts") >= F.lit("2024-01-28").cast("timestamp")
    ) & (F.col("event_id") % 2 == 0)
    base = events.select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        day,
        is_late.alias("is_late"),
    )
    tmp = tempfile.mkdtemp(prefix="filelog_cdf_agg_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(
            base.filter(~F.col("is_late")).drop("is_late"),
            partition_cols=["day"],
        )                                                   # v0
        affected = [
            str(r.day)
            for r in base.filter(F.col("is_late"))
            .select("day")
            .distinct()
            .collect()  # bounded-collect: affected-day grain
        ]
        log.overwrite_partitions(
            base.filter(F.col("day").isin(affected)).drop("is_late"),
            "day",
            sorted(affected),
        )                                                   # v1
        assert log.delete_where(F.col("event_id") % 11 == 0) == 2
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        feed = log.read_changes(-1, 1).unionByName(
            log.read_changes(1)  # cursor advanced to v1, then drained
        )
        result = (
            feed.groupBy((F.col("user_id") % 10).alias("user_band"))
            .agg(
                F.sum(sign).cast("long").alias("n_rows"),
                F.sum(sign * F.col("cents")).cast("long").alias(
                    "sum_cents"
                ),
            )
            .filter(F.col("n_rows") > 0)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_schema_evolution",
    """
    WITH base AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderpriority
      FROM orders
    )
    SELECT 'v0_old_schema' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(0 AS BIGINT) AS n_with_priority
    FROM base WHERE o_orderkey % 3 <> 0
    UNION ALL
    SELECT 'v1_evolved',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM base
    """,
    doc=(
        "Additive schema evolution on the file-action log (Delta's "
        "mergeSchema): v0 lands (key, cents); v1 appends a batch "
        "carrying a NEW o_orderpriority column under "
        "merge_schema=True. Every commit records the canonical column "
        "list, so the latest read serves the evolved schema with v0's "
        "files null-filling the added column (counted here: "
        "n_with_priority counts only v1 rows), while time travel to "
        "v0 serves the ORIGINAL two-column schema — no retroactive "
        "columns. A schema surprise without merge_schema fails "
        "loudly BEFORE any file lands, and the canonical list rides "
        "checkpoints past log expiry (tests/test_filelog.py). At "
        "100 TB this is evolution with zero data rewritten: old files "
        "are never touched, the schema is just versioned metadata."
    ),
)
def filelog_schema_evolution(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderpriority",
    )
    tmp = tempfile.mkdtemp(prefix="filelog_schema_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(
            base.filter(F.col("o_orderkey") % 3 != 0).drop(
                "o_orderpriority"
            )
        )                                                   # v0
        log.append(
            base.filter(F.col("o_orderkey") % 3 == 0).withColumnRenamed(
                "o_orderpriority", "priority"
            ),
            merge_schema=True,
        )                                                   # v1
        old = (
            log.read(as_of=0)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
            .select(
                F.lit("v0_old_schema").alias("phase"),
                "n_rows",
                "sum_cents",
                F.lit(0).cast("long").alias("n_with_priority"),
            )
        )
        new = (
            log.read()
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
                F.count("priority").cast("long").alias(
                    "n_with_priority"
                ),
            )
            .select(
                F.lit("v1_evolved").alias("phase"),
                "n_rows",
                "sum_cents",
                "n_with_priority",
            )
        )
        result = old.unionByName(new).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_clustered_compact",
    """
    WITH f AS (
      SELECT event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE CAST(FLOOR(value * 100) AS BIGINT) BETWEEN 2500 AND 7500
    )
    SELECT 'pre_compact' AS phase, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM f GROUP BY event_type
    UNION ALL
    SELECT 'post_compact', event_type,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM f GROUP BY event_type
    """,
    doc=(
        "Clustered OPTIMIZE through the commit log (Delta's OPTIMIZE "
        "ZORDER BY): three interleaved appends each span the full "
        "cents range, so footer stats exclude nothing; "
        "compact(cluster_by=[cents]) rewrites the live set "
        "range-clustered into near-disjoint files whose stats commit "
        "ATOMICALLY with the rewrite — read_pruned tightens "
        "immediately, no ANALYZE/refresh step exists to forget. The "
        "result runs the SAME pruned range scan before and after the "
        "rewrite: both phases must equal the oracle's plain filter "
        "(clustering is result-invisible; only I/O changes). The "
        "pruned-file-count drop and the 2-key Z-order path are pinned "
        "in tests/test_filelog.py."
    ),
)
def filelog_clustered_compact(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    tmp = tempfile.mkdtemp(prefix="filelog_cluster_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(
            spark, os.path.join(tmp, "fact"), stats_cols=["cents"]
        )
        staged = base.localCheckpoint(eager=True)  # 3 slices, one pass
        # each slice spans the FULL cents range; commits overlap on a
        # driver thread pool (append order is result-invisible)
        log.append_all(
            [
                staged.filter(F.col("event_id") % 3 == m).coalesce(1)
                for m in range(3)
            ]
        )

        def scan(phase):
            return (
                log.read_pruned("cents", 2500, 7500)
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_events"),
                    F.sum("cents").cast("long").alias("sum_cents"),
                )
                .select(
                    F.lit(phase).alias("phase"),
                    "event_type",
                    "n_events",
                    "sum_cents",
                )
            )

        pre = scan("pre_compact").localCheckpoint(eager=True)
        assert log.compact(cluster_by=["cents"], target_files=6) == 3
        result = (
            pre.unionByName(scan("post_compact"))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_cdc_replication",
    """
    WITH merged AS (
      SELECT user_id % 10 AS user_band,
             CASE WHEN event_id % 9 = 0
                  THEN CAST(FLOOR(value * 100) AS BIGINT) + 500000
                  ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS cents,
             user_id
      FROM events
    )
    SELECT user_band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           2 AS n_dst_commits
    FROM merged
    WHERE user_id % 13 <> 0
    GROUP BY user_band
    """,
    doc=(
        "EXACTLY-ONCE change-feed replication between two file-action "
        "logs (filelog.sync_changes_from): the destination changelog's "
        "idempotent (app_id, app_batch=source-version) commits ARE the "
        "cursor — no separate cursor file exists to desync from the "
        "data. The run syncs after a merge window, injects a blind "
        "CRASH-RETRY of that same window (the idempotent append "
        "deduplicates it — no third commit, pinned by the "
        "n_dst_commits column: 2, not 3), syncs the delete window, "
        "and folds the replicated changelog (inserts − deletes) into "
        "the per-band aggregate the oracle computes directly from the "
        "source math. Each sync costs O(files the new source commits "
        "touched) — the 100-TB replication pattern where neither side "
        "ever re-scans the table."
    ),
)
def filelog_cdc_replication(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        (F.col("user_id") % 10).alias("user_band"),
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    upd = base.filter(F.col("event_id") % 9 == 0).withColumn(
        "cents", F.col("cents") + F.lit(500000)
    )
    tmp = tempfile.mkdtemp(prefix="filelog_cdc_rep_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        src = FileCommitLog(spark, os.path.join(tmp, "src"))
        dst = FileCommitLog(spark, os.path.join(tmp, "dst"))
        src.append(base)                                    # v0
        assert src.merge_by_key(upd, ["event_id"]) == 1     # v1
        assert dst.sync_changes_from(src, app_id="mirror") == 0
        # blind crash-retry of the already-committed window: no-op
        assert dst.append(
            src.read_changes(-1, 1), app_id="mirror", app_batch=1
        ) == 0
        assert src.delete_where(F.col("user_id") % 13 == 0) == 2
        assert dst.sync_changes_from(src, app_id="mirror") == 1
        n_dst = dst.latest_version() + 1  # 2 — dedup held
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        result = (
            dst.read()
            .groupBy("user_band")
            .agg(
                F.sum(sign).cast("long").alias("n_rows"),
                F.sum(sign * F.col("cents")).cast("long").alias(
                    "sum_cents"
                ),
            )
            .filter(F.col("n_rows") > 0)
            .select(
                "user_band",
                "n_rows",
                "sum_cents",
                F.lit(n_dst).cast("int").alias("n_dst_commits"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "stream_filelog_cdf_tail",
    """
    WITH merged AS (
      SELECT o_orderkey % 8 AS band, o_custkey,
             CASE WHEN o_orderkey % 6 = 0
                  THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                       + 2000000
                  ELSE CAST(FLOOR(o_totalprice * 100) AS BIGINT)
             END AS cents
      FROM orders
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM merged
    WHERE o_custkey % 5 <> 0
    GROUP BY band
    """,
    doc=(
        "NATIVE Structured-Streaming source over the commit log "
        "(sources/filelog_stream.py — the Delta-as-a-stream parity "
        "piece): spark.readStream.format('filelog_changes') tails the "
        "change feed with engine-checkpointed VERSION offsets; each "
        "micro-batch plans one input partition per file a commit "
        "touched, and executors read those files as vectorized "
        "pyarrow RecordBatches — merge pre-images and DV deletes "
        "loaded positionally, schema handled like read_changes. The "
        "run streams an append + keyed-merge + DV-delete history "
        "(availableNow) through foreachBatch into a changelog store, "
        "then folds inserts minus deletes per band — which must equal "
        "the oracle's direct last-writer-wins recompute. Offset "
        "continuity across restarts, compact silence, and the "
        "hive-partitioned refusal are pinned in tests/test_filelog.py."
    ),
)
def stream_filelog_cdf_tail(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog
    from metar_pipeline_spark.sources.filelog_stream import (
        FileLogChangeDataSource,
    )

    spark.dataSource.register(FileLogChangeDataSource)
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        (F.col("o_orderkey") % 8).alias("band"),
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    upd = base.filter(F.col("o_orderkey") % 6 == 0).withColumn(
        "cents", F.col("cents") + F.lit(2000000)
    )
    tmp = tempfile.mkdtemp(prefix="filelog_stream_tail_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(base)                                     # v0
        assert log.merge_by_key(upd, ["o_orderkey"]) == 1    # v1
        assert log.delete_where(F.col("o_custkey") % 5 == 0) == 2

        store = os.path.join(tmp, "changelog")

        def ingest(bdf, _bid):
            bdf.write.mode("append").parquet(store)

        q = (
            spark.readStream.format("filelog_changes")
            .option("path", os.path.join(tmp, "fact"))
            .load()
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        result = (
            spark.read.parquet(store)
            .groupBy("band")
            .agg(
                F.sum(sign).cast("long").alias("n_rows"),
                F.sum(sign * F.col("cents")).cast("long").alias(
                    "sum_cents"
                ),
            )
            .filter(F.col("n_rows") > 0)
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_tagged_snapshot",
    """
    WITH base AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), mutated AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 4 = 0 THEN cents + 3000000
                  ELSE cents END AS cents
      FROM base
      WHERE o_orderkey % 9 <> 0
    )
    SELECT 'tag_train_v1' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM base
    UNION ALL
    SELECT 'latest', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM mutated
    """,
    doc=(
        "TAGS — pinned reproducible snapshots (Iceberg tags; the "
        "'which exact bytes trained run X' primitive): create_tag "
        "materializes the resolved live-file set, deletion vectors, "
        "and schema into a self-contained json, so the pinned dataset "
        "reads EXACTLY even after the table is merged, row-deleted, "
        "compacted, checkpointed, and its history EXPIRED below the "
        "retention floor — where as_of time travel correctly fails, "
        "the tag still serves (and vacuum counts tag references, so "
        "the pinned tokens survive the sweep; pinned in "
        "tests/test_filelog.py along with pin immutability and "
        "release-then-reclaim). The oracle recomputes the pinned "
        "v0 state and the mutated latest directly from the fact."
    ),
)
def filelog_tagged_snapshot(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog
    from metar_pipeline_spark.sources.vacuum import vacuum_store

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    upd = base.filter(F.col("o_orderkey") % 4 == 0).withColumn(
        "cents", F.col("cents") + F.lit(3000000)
    )
    tmp = tempfile.mkdtemp(prefix="filelog_tag_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        root = os.path.join(tmp, "fact")
        log = FileCommitLog(spark, root)
        log.append(base)                                    # v0
        assert log.create_tag("train_v1") == 0
        assert log.merge_by_key(upd, ["o_orderkey"]) == 1
        assert log.delete_where(F.col("o_orderkey") % 9 == 0) == 2
        assert log.compact() == 3
        log.write_checkpoint()
        log.expire_commits()
        vacuum_store(spark, root, older_than_seconds=0)

        def phase(name, df):
            return df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            ).select(F.lit(name).alias("phase"), "n_rows", "sum_cents")

        result = (
            phase("tag_train_v1", log.read_tag("train_v1"))
            .unionByName(phase("latest", log.read()))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_check_constraints",
    """
    WITH base AS (
      SELECT event_id, user_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT 'after_rejected_batch' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM base WHERE event_id % 2 = 0
    UNION ALL
    SELECT 'after_compliant_batch',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM base
    """,
    doc=(
        "CHECK constraints on the commit log (Delta's ALTER TABLE ADD "
        "CONSTRAINT): set_check_constraint records the active "
        "predicate set in a metadata-only commit (validated against "
        "EXISTING data first, silent in the change feed, carried by "
        "checkpoints past expiry), and every writer validates its "
        "batch BEFORE any file lands — FALSE violates, NULL passes. "
        "The run lands the even half, adds cents >= 0, proves a "
        "poisoned batch (negated cents) is refused with the table "
        "byte-unchanged, then lands the compliant odd half. The "
        "oracle recomputes both phases; the NULL-passes rule, "
        "merge-path refusal, and drop-lifts-gate are pinned in "
        "tests/test_filelog.py."
    ),
)
def filelog_check_constraints(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=True)  # three slices, one upstream pass
    tmp = tempfile.mkdtemp(prefix="filelog_check_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(base.filter(F.col("event_id") % 2 == 0))  # v0
        assert log.set_check_constraint("cents_nonneg", "cents >= 0") == 1

        poisoned = base.filter(F.col("event_id") % 2 == 1).withColumn(
            "cents", -F.col("cents") - 1
        )
        try:
            log.append(poisoned)
            raise AssertionError("constraint did not fire")
        except ValueError:
            pass

        def phase(name):
            return (
                log.read()
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum("cents").cast("long").alias("sum_cents"),
                )
                .select(
                    F.lit(name).alias("phase"), "n_rows", "sum_cents"
                )
            )

        rejected = phase("after_rejected_batch").localCheckpoint(
            eager=True
        )
        log.append(base.filter(F.col("event_id") % 2 == 1))  # v2
        result = (
            rejected.unionByName(phase("after_compliant_batch"))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_restore_rollback",
    """
    WITH base AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), damaged AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN cents + 9999999
                  ELSE cents END AS cents
      FROM base
      WHERE o_orderkey % 8 <> 0
    )
    SELECT 'damaged_head' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM damaged
    UNION ALL
    SELECT 'restored', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM base
    """,
    doc=(
        "RESTORE TABLE TO VERSION (Delta RESTORE — mistake recovery "
        "with history preserved): after a bad re-pricing merge and a "
        "bad row delete, restore(0) claims ONE new commit whose "
        "content is the v0 table materialized into a fresh token — "
        "the damaged states stay time-travelable for audit (the "
        "result reads the damaged head AS OF its version), deletion "
        "vectors are spent like compaction, the change feed carries "
        "the gross delta (fold-exact — pinned in tests/test_filelog "
        "alongside schema restore and restore-to-head no-op), and the "
        "oracle recomputes both the damaged and restored states from "
        "the raw fact. Cost O(|table at target|) — the compact shape, "
        "which is what keeps every downstream contract exact."
    ),
)
def filelog_restore_rollback(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    upd = base.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "cents", F.col("cents") + F.lit(9999999)
    )
    tmp = tempfile.mkdtemp(prefix="filelog_restore_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(base)                                    # v0
        assert log.merge_by_key(upd, ["o_orderkey"]) == 1   # bad
        assert log.delete_where(F.col("o_orderkey") % 8 == 0) == 2
        assert log.restore(0) == 3

        def phase(name, df):
            return df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            ).select(F.lit(name).alias("phase"), "n_rows", "sum_cents")

        result = (
            phase("damaged_head", log.read(as_of=2))
            .unionByName(phase("restored", log.read()))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "maintenance_filelog_lifecycle",
    """
    WITH f AS (
      SELECT event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT 'clustered_pruned_scan' AS phase, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           4 AS n_tasks_ok
    FROM f WHERE cents BETWEEN 3000 AND 9000
    GROUP BY event_type
    UNION ALL
    SELECT 'synced_changelog_fold', event_type,
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT),
           4
    FROM f GROUP BY event_type
    """,
    doc=(
        "The scheduled OPS LIFECYCLE driven end-to-end through "
        "run_maintenance at the gate (plans/maintenance.py — one "
        "metadata-driven entrypoint, per-task isolation): over a "
        "stats-tracked filelog store seeded with three full-range "
        "appends, the runner executes a CLUSTERED compact (stats_cols "
        "forwarded — skipping survives the rewrite), a log checkpoint "
        "+ expiry, a vacuum sweep (reclaims the three pre-compact "
        "tokens), and an exactly-once sync_filelog replication into a "
        "downstream changelog. The result proves all four landed "
        "(n_tasks_ok pinned in every row), the post-maintenance "
        "pruned scan still equals the oracle's plain filter, and the "
        "replicated changelog folds to the full table. At 100 TB this "
        "is the nightly job: every task metadata-grain or "
        "delta-grain, none table-grain."
    ),
)
def maintenance_filelog_lifecycle(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.plans.maintenance import run_maintenance
    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=True)
    tmp = tempfile.mkdtemp(prefix="maint_filelog_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        root = os.path.join(tmp, "fact")
        dst_root = os.path.join(tmp, "changelog")
        log = FileCommitLog(spark, root, stats_cols=["cents"])
        # each slice spans the full cents range; commits overlap on a
        # driver thread pool (append order is result-invisible)
        log.append_all(
            [
                base.filter(F.col("event_id") % 3 == m).coalesce(1)
                for m in range(3)
            ]
        )
        # order matters and mirrors the real nightly: replicate the
        # feed BEFORE checkpoint+expire truncate the history it reads
        rep = run_maintenance(
            spark,
            [
                {"task": "compact_filelog", "path": root,
                 "stats_cols": ["cents"], "cluster_by": ["cents"],
                 "target_files": 5},
                {"task": "sync_filelog", "path": dst_root,
                 "source": root},
                {"task": "checkpoint_filelog", "path": root},
                {"task": "vacuum", "path": root,
                 "older_than_seconds": 0},
            ],
        )
        n_ok = rep.filter("ok").count()  # 4 when every task landed

        pruned = (
            log.read_pruned("cents", 3000, 9000)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
            .select(
                F.lit("clustered_pruned_scan").alias("phase"),
                "event_type", "n_rows", "sum_cents",
                F.lit(n_ok).cast("int").alias("n_tasks_ok"),
            )
        )
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        folded = (
            FileCommitLog(spark, dst_root)
            .read()
            .groupBy("event_type")
            .agg(
                F.sum(sign).cast("long").alias("n_rows"),
                F.sum(sign * F.col("cents")).cast("long").alias(
                    "sum_cents"
                ),
            )
            .select(
                F.lit("synced_changelog_fold").alias("phase"),
                "event_type", "n_rows", "sum_cents",
                F.lit(n_ok).cast("int").alias("n_tasks_ok"),
            )
        )
        result = pruned.unionByName(folded).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_cdf_ivm_view",
    """
    WITH merged AS (
      SELECT user_id % 10 AS user_band, user_id,
             CASE WHEN event_id % 7 = 0
                  THEN CAST(FLOOR(value * 100) AS BIGINT) + 250000
                  ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS cents
      FROM events
    )
    SELECT user_band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM merged
    WHERE user_id % 11 <> 0
    GROUP BY user_band
    """,
    doc=(
        "The CDC → IVM bridge: the commit log's change feed IS a "
        "Z-set (insert = +1, delete = −1), so a materialized "
        "aggregate view is maintained by the engine's own "
        "retraction-aware IVM operators — zset_weighted_agg turns "
        "each change window into a group-grain delta (Δcount = Σw, "
        "Δsum = Σ cents·w, exact integer types), apply_agg_delta "
        "merges it into the view (full-outer at GROUP grain, "
        "net-zero groups dropped). Three windows — initial load, a "
        "keyed merge (whose pre-image deletes are the retractions), "
        "a DV delete — maintain the view incrementally; the result "
        "must equal the oracle's direct aggregate over the final "
        "table, which any missed retraction or double-fed window "
        "breaks. At 100 TB each refresh touches O(Δ files) + "
        "O(view groups), never the fact."
    ),
)
def filelog_cdf_ivm_view(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )
    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    upd = base.filter(F.col("event_id") % 7 == 0).withColumn(
        "cents", F.col("cents") + F.lit(250000)
    )
    tmp = tempfile.mkdtemp(prefix="filelog_ivm_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(base)                                    # v0
        assert log.merge_by_key(upd, ["event_id"]) == 1     # v1
        assert log.delete_where(F.col("user_id") % 11 == 0) == 2

        def window_delta(lo, hi):
            z = log.read_changes(lo, hi).select(
                (F.col("user_id") % 10).alias("user_band"),
                "cents",
                F.when(F.col("_change_type") == "insert", 1)
                .otherwise(-1).alias("_w"),
            )
            return zset_weighted_agg(
                z, ["user_band"], sums={"sum_cents": F.col("cents")}
            )

        view = window_delta(-1, 0).localCheckpoint(eager=True)
        for lo, hi in [(0, 1), (1, 2)]:
            view = apply_agg_delta(
                view, window_delta(lo, hi), ["user_band"],
                ["sum_cents"],
            ).localCheckpoint(eager=True)
        result = view.select(
            "user_band",
            F.col("_n").cast("long").alias("n_rows"),
            F.col("sum_cents").cast("long").alias("sum_cents"),
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_branch_publish",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), dev AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 6 = 0 THEN cents + 1500000
                  ELSE cents END AS cents
      FROM base
      WHERE o_custkey % 10 <> 0
    )
    SELECT 'main_during_branch' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM base
    UNION ALL
    SELECT 'main_after_publish', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM dev
    """,
    doc=(
        "BRANCHES — dev-test on production data with zero copy (the "
        "Nessie/LakeFS/Iceberg-branch shape): create_branch forks a "
        "writable sibling commit chain over the SAME immutable token "
        "namespace (v0 = self-contained base snapshot: files + "
        "vectors + schema + skipping stats); the dev branch re-prices "
        "and row-deletes while MAIN remains byte-identical (first "
        "phase), then publish_branch FAST-FORWARDS main in one "
        "metadata-only commit — add(branch-only files) + "
        "remove(main-only) + dv_add(branch-new vectors), zero data "
        "moved (second phase ≡ the oracle's recompute of the dev "
        "work). A diverged main refuses loudly; vacuum counts branch "
        "references; the published delta feeds the change feed "
        "fold-exactly — all pinned in tests/test_filelog.py."
    ),
)
def filelog_branch_publish(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    upd = base.filter(F.col("o_orderkey") % 6 == 0).withColumn(
        "cents", F.col("cents") + F.lit(1500000)
    )
    tmp = tempfile.mkdtemp(prefix="filelog_branch_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(base)                                    # main v0
        br = log.create_branch("reprice")
        assert br.merge_by_key(upd, ["o_orderkey"]) == 1
        assert br.delete_where(F.col("o_custkey") % 10 == 0) == 2

        def phase(name, df):
            return df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            ).select(F.lit(name).alias("phase"), "n_rows", "sum_cents")

        during = phase(
            "main_during_branch", log.read().drop("o_custkey")
        ).localCheckpoint(eager=True)
        assert log.publish_branch("reprice") == 1
        result = (
            during.unionByName(
                phase("main_after_publish",
                      log.read().drop("o_custkey"))
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "filelog_branch_wap",
    """
    WITH base AS (
      SELECT event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT 'main_during_dev' AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM base WHERE event_id % 2 = 0
    UNION ALL
    SELECT 'main_after_publish', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM base
    """,
    doc=(
        "The modern release flow composed end-to-end: "
        "WRITE-AUDIT-PUBLISH at BRANCH granularity. Main carries a "
        "CHECK constraint (cents >= 0) that the branch base snapshot "
        "INHERITS, so a poisoned batch is refused on the dev branch "
        "by the same gate production has — before any file lands; "
        "the compliant batch lands on the branch; a final audit on "
        "the branch head (zero rows violating the release predicate) "
        "gates publish_branch, which fast-forwards main in one "
        "metadata commit. Main is byte-identical all through dev "
        "(first phase) and exactly the audited dev state after "
        "(second phase ≡ oracle). Constraint inheritance and the "
        "divergence refusal are pinned in tests/test_filelog.py."
    ),
)
def filelog_branch_wap(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.filelog import FileCommitLog

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=True)
    tmp = tempfile.mkdtemp(prefix="filelog_bwap_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        log = FileCommitLog(spark, os.path.join(tmp, "fact"))
        log.append(base.filter(F.col("event_id") % 2 == 0))  # main v0
        assert log.set_check_constraint("cents_nonneg", "cents >= 0") == 1
        br = log.create_branch("release")

        poisoned = base.filter(F.col("event_id") % 2 == 1).withColumn(
            "cents", -F.col("cents") - 1
        )
        try:  # production's gate fires ON THE BRANCH
            br.append(poisoned)
            raise AssertionError("inherited constraint did not fire")
        except ValueError:
            pass
        br.append(base.filter(F.col("event_id") % 2 == 1))

        during = (
            log.read()
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"),
            )
            .select(
                F.lit("main_during_dev").alias("phase"),
                "n_rows", "sum_cents",
            )
            .localCheckpoint(eager=True)
        )
        # release audit on the branch head gates the publish
        n_bad = br.read().filter(F.col("cents") < 0).count()
        assert n_bad == 0, "audit failed — publish withheld"
        assert log.publish_branch("release") == 2
        result = (
            during.unionByName(
                log.read()
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum("cents").cast("long").alias("sum_cents"),
                )
                .select(
                    F.lit("main_after_publish").alias("phase"),
                    "n_rows", "sum_cents",
                )
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return result
