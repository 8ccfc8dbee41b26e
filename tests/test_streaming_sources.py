"""Streaming medallion + sources/sinks tests (SURVEY.md §2.1, §2.7).

Covers: S1 collector normalization, S5 parquet MERGE sink, L1-L4
incremental latest-per-key stream, L7 watermark late-data drop.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.windows import latest_per_key_maxby
from metar_pipeline_spark.sources.collector import collect_once, fake_fetcher
from metar_pipeline_spark.sources.merge import upsert_parquet
from metar_pipeline_spark.streaming.pipeline import (
    run_daily_rollup_append,
    run_latest_per_key_merge,
)

SF_DIR = "/root/testdata/sf0.001"
SPLIT = datetime.datetime(2024, 1, 15)


@pytest.fixture()
def events_halves(spark):
    ev = load_table(spark, SF_DIR, "events")
    return (
        ev.filter(F.col("ts") < F.lit(SPLIT)),
        ev.filter(F.col("ts") >= F.lit(SPLIT)),
    )


# ---------------------------------------------------------------------------
# S5: parquet MERGE sink
# ---------------------------------------------------------------------------
def test_upsert_parquet_last_writer_wins(spark, tmp_path):
    target = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "id int, v string, ver int"
    )
    upsert_parquet(spark, b1, target, keys=["id"], order_col="ver")
    b2 = spark.createDataFrame(
        [(2, "b2", 11), (3, "c", 11)], "id int, v string, ver int"
    )
    upsert_parquet(spark, b2, target, keys=["id"], order_col="ver")
    got = {
        (r.id, r.v, r.ver) for r in spark.read.parquet(target).collect()
    }
    assert got == {(1, "a", 10), (2, "b2", 11), (3, "c", 11)}

    # equal order_col: the new batch wins (reference's unconditional
    # DO UPDATE, mongo_to_postgres.py:103-105)
    b3 = spark.createDataFrame([(3, "c3", 11)], "id int, v string, ver int")
    upsert_parquet(spark, b3, target, keys=["id"], order_col="ver")
    got = dict(
        (r.id, r.v) for r in spark.read.parquet(target).collect()
    )
    assert got[3] == "c3"


# ---------------------------------------------------------------------------
# L1-L4: incremental latest-per-key stream == batch answer
# ---------------------------------------------------------------------------
def test_stream_latest_per_key_incremental(spark, tmp_path, events_halves):
    half1, half2 = events_halves
    src = str(tmp_path / "src")
    target = str(tmp_path / "latest")
    ckpt = str(tmp_path / "ckpt")

    half1.write.mode("append").parquet(src)
    run_latest_per_key_merge(spark, src, target, ckpt)
    got1 = spark.read.parquet(target)
    want1 = latest_per_key_maxby(
        half1.select(*got1.columns), ["user_id"], "ts", tiebreak="event_id"
    )
    assert got1.count() == want1.count()
    assert got1.exceptAll(want1.select(*got1.columns)).count() == 0

    # second drop: only the new files are processed; merge must land on
    # the same answer as a batch over the full data
    half2.write.mode("append").parquet(src)
    run_latest_per_key_merge(spark, src, target, ckpt)
    got2 = spark.read.parquet(target)
    full = load_table(spark, SF_DIR, "events")
    want2 = latest_per_key_maxby(
        full.select(*got2.columns), ["user_id"], "ts", tiebreak="event_id"
    )
    assert got2.count() == want2.count()
    assert got2.exceptAll(want2.select(*got2.columns)).count() == 0


# ---------------------------------------------------------------------------
# L7: windowed rollup emits sealed windows, drops late rows
# ---------------------------------------------------------------------------
def test_stream_daily_rollup_watermark(spark, tmp_path, events_halves):
    half1, half2 = events_halves
    src = str(tmp_path / "src")
    out = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    half1.write.mode("append").parquet(src)
    run_daily_rollup_append(spark, src, out, ckpt)
    half2.write.mode("append").parquet(src)
    run_daily_rollup_append(spark, src, out, ckpt)

    got = spark.read.parquet(out)
    # with watermark 0s, every day strictly before the max event day is
    # sealed and must have been emitted exactly once
    full = load_table(spark, SF_DIR, "events")
    max_day = full.agg(
        F.to_date(F.date_trunc("day", F.max("ts")))
    ).first()[0]
    want = (
        full.filter(F.to_date(F.date_trunc("day", F.col("ts"))) < F.lit(max_day))
        .groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("observed_date"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    sealed = got.filter(F.col("observed_date") < F.lit(max_day))
    assert sealed.count() == want.count()
    joined = sealed.join(want, ["observed_date", "user_id"], "inner")
    assert joined.filter(
        sealed["n_events"] != want["n_events"]
    ).count() == 0

    # a late row (event-time far below the watermark) must be dropped:
    # appending it and re-running changes nothing (L7 ≡ dbt watermark skip)
    late = spark.createDataFrame(
        [(999999, datetime.datetime(2024, 1, 2, 0, 0, 1), 1, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    late.write.mode("append").parquet(src)
    run_daily_rollup_append(spark, src, out, ckpt)
    got2 = spark.read.parquet(out)
    before = got.filter(F.col("observed_date") == "2024-01-02").agg(
        F.sum("n_events")
    ).first()[0]
    after = got2.filter(F.col("observed_date") == "2024-01-02").agg(
        F.sum("n_events")
    ).first()[0]
    assert before == after


# ---------------------------------------------------------------------------
# S1: collector fetch→normalize parity with the reference's semantics
# ---------------------------------------------------------------------------
def test_collector_normalization(spark):
    docs = [
        {
            "icao": "UUEE",
            "observed": "2024-01-10T12:30:00",
            "raw_text": "UUEE 101230Z 24005MPS",
            "flight_category": "VFR",
            "temperature": {"celsius": -5.0, "fahrenheit": 23.0},
            "dewpoint": {"celsius": -7.0},
            "wind": {"degrees": 240.0, "speed_kts": 10.0, "gust_kts": 15.0},
            "visibility": {"meters_float": 9999.0},
            "barometer": {"hpa": 1013.2},
            "humidity": {"percent": 85.0},
            "station": {
                "name": "Sheremetyevo",
                "location": "Moscow",
                "geometry": {"type": "Point", "coordinates": [37.41, 55.97]},
            },
        },
        # degenerate doc: missing groups, raw fallback, short coordinates
        {
            "icao": "ULLI",
            "observed": "2024-01-10T12:35:00",
            "raw": "ULLI 101235Z",
            "station": {"geometry": {"type": "Point", "coordinates": [30.26]}},
        },
    ]
    flat = collect_once(spark, fake_fetcher(docs)).orderBy("icao")
    rows = {r.icao: r for r in flat.collect()}

    r1 = rows["UUEE"]
    assert r1.temperature_c == -5.0
    assert r1.wind_gust_kt == 15.0
    assert r1.station_lon == 37.41 and r1.station_lat == 55.97
    assert r1.raw_text == "UUEE 101230Z 24005MPS"
    assert r1.source == "checkwx"
    assert r1.observed == datetime.datetime(2024, 1, 10, 12, 30)

    r2 = rows["ULLI"]
    # missing keys → NULL (->> semantics); raw fallback via coalesce;
    # 1-element coordinates fails the size guard → NULL lon/lat
    assert r2.temperature_c is None and r2.barometer_hpa is None
    assert r2.raw_text == "ULLI 101235Z"
    assert r2.station_lon is None and r2.station_lat is None


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Built-in bounded-state dedup: duplicates arriving within the
    watermark horizon are dropped; state is evicted beyond it (the
    built-in twin of streaming_first_seen_dedup for bounded lateness)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    src = tmp_path / "ddw_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long"
    rows1 = [(1, base, 10), (2, base + dt.timedelta(minutes=5), 10)]
    rows2 = [
        (1, base, 10),  # duplicate within horizon -> dropped
        (3, base + dt.timedelta(hours=2), 11),
    ]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("memory")
        .queryName("ddw_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination()
    got = sorted(
        r["event_id"] for r in spark.table("ddw_out").collect()
    )
    assert got == [1, 2, 3]


# ---------------------------------------------------------------------------
# S1 at scale: Spark 4 Python DataSource collector (executor-side fetch)
# ---------------------------------------------------------------------------
def test_datasource_collector_matches_driver_side(spark):
    """The registered metar_collector DataSource (fetch distributed
    across input partitions) must normalize to exactly the rows the
    driver-side collect_once produces from the same documents."""
    import json

    from metar_pipeline_spark.sources.datasource import (
        collect_distributed,
        offline_fetcher,
    )

    stations = ["UUEE", "ULLI", "UUDD", "URSS", "UNNT", "USSS", "UHWW"]
    docs = [json.loads(p) for p in offline_fetcher(stations)]
    want = collect_once(spark, fake_fetcher(docs), stations)
    got = collect_distributed(spark, stations, stations_per_partition=3)

    assert got.columns == want.columns
    # 7 stations / 3 per partition → 3 fetch partitions
    assert got.rdd.getNumPartitions() == 3
    drop = ("inserted_at", "id")  # timestamps / payload-key-order digests
    assert sorted(
        tuple(r) for r in got.drop(*drop).collect()
    ) == sorted(tuple(r) for r in want.drop(*drop).collect())


# ---------------------------------------------------------------------------
# Q6 streaming side: per-micro-batch progress metrics listener
# ---------------------------------------------------------------------------
def test_progress_metrics_listener(spark, tmp_path):
    """Every micro-batch of a watermarked stateful stream lands one
    metrics row: input rows sum to the source size, durations are
    positive, and the stateful operator reports state rows."""
    import time

    from pyspark.sql import functions as F

    from metar_pipeline_spark.streaming.monitor import (
        ProgressMetricsListener,
    )
    from metar_pipeline_spark.streaming.pipeline import (
        EVENTS_STREAM_SCHEMA,
        daily_rollup_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    events.coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))

    listener = ProgressMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            daily_rollup_stream(stream)
            .writeStream.format("memory")
            .queryName("mon_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline:
            if sum(r[4] for r in listener.rows) >= events.count():
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    m = listener.to_df(spark)
    rows = m.collect()
    assert sum(r.num_input_rows for r in rows) == events.count()
    assert all(r.batch_duration_ms >= 0 for r in rows)
    # the windowed aggregate is stateful: some batch must report state
    assert any(r.state_rows_total > 0 for r in rows)


def test_datasource_collector_stream_offsets(spark, tmp_path):
    """The streaming collector processes exactly the available cycle
    range, resumes from the checkpointed offset when a restart finds
    new cycles available, and re-runs idempotently once drained."""
    from metar_pipeline_spark.sources.datasource import (
        MetarCollectorDataSource,
    )

    spark.dataSource.register(MetarCollectorDataSource)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run_once(max_cycles):
        stream = (
            spark.readStream.format("metar_collector")
            .option("max_cycles", str(max_cycles))
            .option("stations", "UUEE,ULLI,UUDD")
            .option("stations_per_partition", "2")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)  # python source: one batch/run
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    assert run_once(1) == 3   # cycle 0: 3 stations
    assert run_once(2) == 6   # cycle 1 arrived; resumed from checkpoint
    assert run_once(2) == 6   # offset drained: idempotent re-run


def test_stream_merge_replay_after_lost_commit_is_idempotent(
    spark, tmp_path, events_halves
):
    """Exactly-once SINK semantics under the crash Spark cannot prevent:
    the foreachBatch MERGE lands, then the process dies BEFORE the
    checkpoint commit marker is written. On restart Spark re-executes
    that batch id with the same input files — the last-writer-wins
    MERGE must absorb the replay (same rows, same winners, no dupes).
    Simulated with a checkpoint SNAPSHOT taken before the final batch:
    restarting from it re-runs that batch against a target that already
    absorbed it. (Deleting the live commit marker in place trips
    Spark's same-session concurrent-checkpoint-use guard, so the crash
    is reproduced via the copied pre-commit state instead.)"""
    import shutil

    half1, half2 = events_halves
    src = str(tmp_path / "src")
    target = str(tmp_path / "latest")
    ckpt = str(tmp_path / "ckpt")
    ckpt_crashed = str(tmp_path / "ckpt_crashed")

    half1.write.mode("append").parquet(src)
    run_latest_per_key_merge(spark, src, target, ckpt)
    # the state a crash-before-commit would leave behind for the NEXT
    # batch: its offsets/commit not yet recorded...
    shutil.copytree(ckpt, ckpt_crashed)
    half2.write.mode("append").parquet(src)
    run_latest_per_key_merge(spark, src, target, ckpt)

    # ...but the sink-side MERGE of that batch already landed (the run
    # above). Restart from the crashed checkpoint: the half2 batch is
    # re-executed against the already-merged target.
    run_latest_per_key_merge(spark, src, target, ckpt_crashed)

    got = spark.read.parquet(target)
    full = load_table(spark, SF_DIR, "events")
    want = latest_per_key_maxby(
        full.select(*got.columns), ["user_id"], "ts", tiebreak="event_id"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want.select(*got.columns)).count() == 0
    # keys are still unique — the replay created no duplicates
    assert got.groupBy("user_id").count().filter("count > 1").count() == 0


# ---------------------------------------------------------------------------
# L6: the production processingTime cadence (not just availableNow)
# ---------------------------------------------------------------------------
def test_daily_rollup_processing_time_trigger(spark, tmp_path, events_halves):
    """Smoke for the long-lived trigger(processingTime=...) form — the
    reference's 30-minute cadence scaled to 1 s so a microbatch fires in
    test time. The query must process the backlog, keep running (L6 is a
    continuous service, not a one-shot), and stop cleanly."""
    import time

    half1, _ = events_halves
    src = str(tmp_path / "src")
    out = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")
    half1.write.mode("append").parquet(src)

    q = run_daily_rollup_append(
        spark, src, out, ckpt, trigger_interval="1 second"
    )
    try:
        deadline = time.time() + 60
        done = False
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["numInputRows"] == 0 and q.isActive:
                done = True  # backlog drained, query idling on cadence
                break
            time.sleep(0.5)
        assert done, f"no idle microbatch within 60s: {q.lastProgress}"
        assert q.isActive  # still running — continuous, not availableNow
    finally:
        q.stop()
    # sealed windows landed in the date-partitioned gold layout
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert "observed_date" in got.columns


# ---------------------------------------------------------------------------
# Exactly-once foreachBatch sink: batch replay must not duplicate
# ---------------------------------------------------------------------------
def test_idempotent_batch_append_replay_safe(spark, tmp_path):
    """foreachBatch is at-least-once: after a crash between sink write
    and checkpoint commit the last batch_id REPLAYS. The batch-keyed
    dynamic-overwrite sink must make that replay rewrite its own
    partition (same rows, no duplicates), leave other batches
    untouched, and keep appending new batch ids."""
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    path = str(tmp_path / "sink")
    b0 = spark.range(0, 10).withColumnRenamed("id", "k")
    b1 = spark.range(10, 15).withColumnRenamed("id", "k")

    idempotent_batch_append(b0, path, -1)  # seed/bootstrap form
    idempotent_batch_append(b1, path, 0)
    assert spark.read.parquet(path).count() == 15

    # replay batch 0 (same content): rowcount unchanged, rows identical
    idempotent_batch_append(b1, path, 0)
    got = spark.read.parquet(path).select("k")
    assert got.count() == 15
    assert got.groupBy("k").count().filter("count > 1").count() == 0

    # replay with corrected content: the batch's partition is REPLACED
    idempotent_batch_append(
        spark.range(10, 12).withColumnRenamed("id", "k"), path, 0
    )
    assert sorted(
        r.k for r in spark.read.parquet(path).select("k").collect()
    ) == list(range(12))

    # a new batch id appends beside the others
    idempotent_batch_append(
        spark.range(20, 22).withColumnRenamed("id", "k"), path, 1
    )
    assert spark.read.parquet(path).count() == 14


def test_idempotent_sink_survives_real_checkpoint_replay(spark, tmp_path):
    """End-to-end replay: run a foreachBatch query to completion, then
    delete the LAST batch's commit marker from the checkpoint — exactly
    the on-disk state after a crash between sink write and commit — and
    restart. Structured Streaming re-runs that batch; the batch-keyed
    sink must absorb the rerun without duplicating rows."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    # one file per source drop → exactly two micro-batches
    spark.range(0, 10).coalesce(1).write.parquet(os.path.join(src, "b1"))
    spark.range(10, 20).coalesce(1).write.parquet(os.path.join(src, "b2"))

    def run():
        stream = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: idempotent_batch_append(df, sink, bid)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert spark.read.parquet(sink).count() == 20
    # drop the commit marker of the NUMERICALLY last batch: recovery
    # replays exactly the latest uncommitted batch on restart
    last = max(
        int(c)
        for c in os.listdir(os.path.join(ckpt, "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", str(last)))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):  # local-FS checksum sidecar
        os.remove(crc)
    replayed_dir = os.path.join(sink, f"_batch={last}")
    files_before = set(os.listdir(replayed_dir))

    run()  # restart: the uncommitted batch replays into the same sink
    # prove the batch actually re-ran: the overwrite wrote fresh files
    assert set(os.listdir(replayed_dir)) != files_before
    got = spark.read.parquet(sink).select("id")
    assert got.count() == 20
    assert got.groupBy("id").count().filter("count > 1").count() == 0


def test_ingest_dedup_replay_is_value_deterministic(spark, tmp_path):
    """Replay must reproduce the SAME VERDICT CONTENT, not just the
    same row count. Crash window: a batch's signatures/text are already
    appended to the store but its checkpoint commit is missing — the
    replay then reads the store WITH its own rows present. If the
    ingest loop did not filter to strictly-earlier batches, the replay
    would see its own batch as corpus: a doc could suddenly match a
    HIGHER-id doc of its own batch through the corpus quadrant,
    flipping matched_id/jaccard in the rewritten _batch=N partition.

    Fixture: batch2 holds two identical docs (ids 100 < 101) with no
    match anywhere else. First run: 101 matches 100 (earlier-id same
    batch); 100 matches nothing. A wrongly-enlarged replay pool would
    make 100 match 101 too."""
    import os

    from metar_pipeline_spark.operators.dedup import (
        band_buckets,
        incremental_dedup_verdicts,
        minhash_signature,
    )
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    src = str(tmp_path / "src")
    store = str(tmp_path / "sig_store")
    corpus_txt = str(tmp_path / "corpus_text")
    outp = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    dup_text = "the quick brown fox jumps over the lazy dog again and again"

    def docs_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def buckets_of(d):
        sigs = minhash_signature(d, "doc_id", "text", 12, 3)
        return band_buckets(sigs, "doc_id", 6, 2)

    corpus = docs_df([(1, "completely unrelated corpus document body"),
                      (2, "another corpus text with different words")])
    idempotent_batch_append(buckets_of(corpus), store, -1)
    idempotent_batch_append(corpus, corpus_txt, -1)

    b1 = docs_df([(50, "first stream drop with its own vocabulary")])
    b2 = docs_df([(100, dup_text), (101, dup_text)])
    b1.coalesce(1).write.parquet(os.path.join(src, "b1"))
    b2.coalesce(1).write.parquet(os.path.join(src, "b2"))
    import time as _t

    now = _t.time()
    for sub, mt in (("b1", now - 20), ("b2", now - 10)):
        d = os.path.join(src, sub)
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (mt, mt))

    def ingest(batch_df, batch_id):
        sp = batch_df.sparkSession
        prior_buckets = (
            sp.read.parquet(store)
            .filter(F.col("_batch") < batch_id)
            .select("id", "band", "bucket")
        )
        prior_text = (
            sp.read.parquet(corpus_txt)
            .filter(F.col("_batch") < batch_id)
            .select("doc_id", "text")
        )
        batch_b = buckets_of(batch_df).localCheckpoint(eager=True)
        verdicts = incremental_dedup_verdicts(
            batch_df, prior_text, "doc_id", "text",
            num_hashes=12, bands=6, shingle_n=3, threshold=0.5,
            corpus_buckets=prior_buckets, new_buckets=batch_b,
        )
        idempotent_batch_append(verdicts, outp, batch_id)
        idempotent_batch_append(batch_b, store, batch_id)
        idempotent_batch_append(batch_df, corpus_txt, batch_id)

    def run():
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()

    def verdict_rows():
        return sorted(
            (r.doc_id, r.matched_id, r.jaccard, r.is_duplicate)
            for r in spark.read.parquet(outp)
            .select("doc_id", "matched_id", "jaccard", "is_duplicate")
            .collect()
        )

    first = verdict_rows()
    # sanity: the earlier-id doc of the dup pair is NOT a duplicate,
    # the later-id one matched it
    by_id = {r[0]: r for r in first}
    assert by_id[100][3] is False
    assert by_id[101][1] == 100 and by_id[101][3] is True

    # crash window: drop the last batch's commit marker (its store
    # appends already landed) and restart — the batch replays against
    # a store that now CONTAINS its own signatures
    last = max(
        int(c)
        for c in os.listdir(os.path.join(ckpt, "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", str(last)))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    run()
    assert verdict_rows() == first


# ---------------------------------------------------------------------------
# S1: concrete HTTP fetcher (reference src/collector/main.py:53-69)
# ---------------------------------------------------------------------------
def test_http_fetcher_request_contract(spark):
    """Offline twin: the fetcher must GET {base}/{csv}/decoded with the
    X-API-Key header and 15 s timeout, raise on HTTP errors, and yield
    payload['data'] re-serialized for raw_to_bronze."""
    from metar_pipeline_spark.sources.collector import (
        collect_once,
        http_fetcher,
    )

    calls = {}

    class FakeResp:
        def __init__(self, status, data):
            self.status = status
            self._data = data

        def raise_for_status(self):
            if self.status >= 400:
                raise RuntimeError(f"http {self.status}")

        def json(self):
            return {"data": self._data}

    class FakeSession:
        def __init__(self, status=200):
            self.status = status

        def get(self, url, headers=None, timeout=None):
            calls.update(url=url, headers=headers, timeout=timeout)
            return FakeResp(
                self.status,
                [
                    {"icao": "UUEE", "observed": "2024-02-01T06:00:00",
                     "temperature": {"celsius": -5.0}},
                    {"icao": "ULLI", "observed": "2024-02-01T06:00:00",
                     "temperature": {"celsius": -3.0}},
                ],
            )

    f = http_fetcher(
        base_url="https://example.invalid/metar",
        api_key="k123",
        session=FakeSession(),
    )
    df = collect_once(spark, f, ["UUEE", "ULLI"])
    assert calls["url"] == "https://example.invalid/metar/UUEE,ULLI/decoded"
    assert calls["headers"] == {"X-API-Key": "k123"}
    assert calls["timeout"] == 15.0
    rows = {r.icao: r for r in df.collect()}
    assert set(rows) == {"UUEE", "ULLI"}
    assert rows["UUEE"].temperature_c == -5.0

    # HTTP errors FAIL the batch (deviation from the reference's
    # swallow-and-exit-0, documented in the module docstring)
    bad = http_fetcher(
        base_url="https://example.invalid/metar",
        api_key="k123",
        session=FakeSession(status=503),
    )
    with pytest.raises(RuntimeError):
        bad(["UUEE"])

    # missing API key is a hard config error (reference main.py:19-20)
    import os

    assert "CHECKWX_API_KEY" not in os.environ
    with pytest.raises(RuntimeError):
        http_fetcher(base_url="https://example.invalid/metar")


@pytest.mark.skipif(
    "CHECKWX_API_KEY" not in __import__("os").environ,
    reason="live CheckWX integration needs CHECKWX_API_KEY + network",
)
def test_http_fetcher_live(spark):
    from metar_pipeline_spark.sources.collector import (
        collect_once,
        http_fetcher,
    )

    df = collect_once(spark, http_fetcher(), ["UUEE"])
    assert df.count() >= 0  # a valid (possibly empty) normalized frame


def test_attribution_outer_boundary_at_terminal_watermark(spark, tmp_path):
    """Pins the state-eviction boundary the registered query's oracle
    hardcodes: an unmatched purchase is null-emitted iff its timestamp
    is STRICTLY below the terminal watermark (min of the two inputs'
    max event times); a purchase exactly AT the watermark stays
    buffered. If a Spark upgrade ever flips this inequality, this test
    fails loudly in pytest rather than at the external gate."""
    import os

    from metar_pipeline_spark.streaming.pipeline import (
        attribution_join_stream_outer,
    )

    def drop(rows, schema, name):
        path = str(tmp_path / name)
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
        return path

    cschema = "user_id long, event_id long, ts timestamp"
    pschema = "user_id long, event_id long, value double, ts timestamp"
    import datetime as dt

    T = dt.datetime(2024, 3, 1, 10, 0, 0)
    H = dt.timedelta(hours=1)
    cpath = drop([(1, 100, T)], cschema, "clicks")
    ppath = drop(
        [
            (1, 200, 5.0, T + dt.timedelta(minutes=30)),  # matched
            (2, 201, 6.0, T - 2 * H),  # unmatched, < watermark → null row
            (3, 202, 7.0, T),  # unmatched, AT watermark → buffered
        ],
        pschema,
        "purchases",
    )
    clicks = spark.readStream.schema(cschema).parquet(cpath)
    purchases = spark.readStream.schema(pschema).parquet(ppath)
    joined = attribution_join_stream_outer(
        clicks, purchases, max_gap="1 hour"
    )
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r.purchase_id: (r.click_id,)
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {200: (100,), 201: (None,)}, rows
