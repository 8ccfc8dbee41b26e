"""Persisted medallion pipeline tests (plans/medallion.py): two
incremental runs over collector-shaped data, layer-by-layer assertions
mirroring the reference's dbt contracts (SURVEY.md §2.7).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.plans.medallion import run_medallion
from metar_pipeline_spark.sources.collector import collect_once, fake_fetcher


def _docs(icaos, day, temp):
    return [
        {
            "icao": icao,
            "observed": f"2024-02-{day:02d}T{6 + i}:00:00",
            "raw_text": f"{icao} RAW",
            "temperature": {"celsius": temp + i},
            "wind": {"speed_kts": 10.0 + i},
            "visibility": {"meters_float": 8000.0},
            "station": {
                "name": icao,
                "geometry": {"type": "Point", "coordinates": [30.0, 60.0]},
            },
        }
        for i, icao in enumerate(icaos)
    ]


def _normalized(spark, docs):
    flat = collect_once(spark, fake_fetcher(docs), [d["icao"] for d in docs])
    # md5 ids are hex; the ods digits-only sanitizer
    # (ods_metar_latest.sql:13-23) would drop them — give the pipeline
    # numeric ids like the reference's stringified sequence ids.
    return flat.withColumn(
        "id", F.conv(F.substring("id", 1, 7), 16, 10)
    )


def test_medallion_two_runs(spark, tmp_path):
    base = str(tmp_path / "lake")
    icaos = ["UUEE", "ULLI", "URSS"]

    run1 = run_medallion(spark, _normalized(spark, _docs(icaos, 1, -5.0)), base)
    assert run1["stg"].count() == 3
    assert run1["int"].count() == 3  # one per airport
    assert run1["dwh"].count() == 3  # one per (airport, day)
    d = {r.icao: r for r in run1["dwh"].collect()}
    assert d["UUEE"].n_observations == 1
    assert d["UUEE"].icao_date == "UUEE_20240201"

    # run 2: a newer day for two airports; strict stg watermark must keep
    # run-1 rows intact, int must roll to the newest observation
    run2 = run_medallion(
        spark, _normalized(spark, _docs(icaos[:2], 2, 3.0)), base
    )
    assert run2["stg"].count() == 5
    ints = {r.icao: r for r in run2["int"].collect()}
    assert ints["UUEE"].observed.day == 2  # advanced
    assert ints["URSS"].observed.day == 1  # untouched
    days = {
        (r.icao, r.icao_date[-8:]) for r in run2["dwh"].collect()
    }
    assert ("UUEE", "20240202") in days and ("URSS", "20240201") in days

    # dwh is physically partitioned by observed_date (partition pruning)
    import os

    parts = {
        p for p in os.listdir(os.path.join(base, "dwh"))
        if p.startswith("observed_date=")
    }
    assert {"observed_date=2024-02-01", "observed_date=2024-02-02"} <= parts

    # re-running the same batch is a no-op for stg/int (strict watermark
    # drops everything already seen — L1 idempotence)
    run3 = run_medallion(
        spark, _normalized(spark, _docs(icaos[:2], 2, 3.0)), base
    )
    assert run3["stg"].count() == 5
    assert run3["int"].count() == 3


def test_medallion_batch_metrics_observe(spark, tmp_path):
    """stg writes one profile row per run to base/_metrics via
    DataFrame.observe — metrics ride the merge scan, no extra pass."""
    import os

    base = str(tmp_path / "lake_m")
    icaos = ["UUEE", "ULLI"]
    run_medallion(spark, _normalized(spark, _docs(icaos, 1, -5.0)), base)
    run_medallion(spark, _normalized(spark, _docs(icaos, 2, 3.0)), base)

    m = spark.read.parquet(os.path.join(base, "_metrics")).orderBy("batch_ts")
    rows = m.collect()
    assert len(rows) == 2
    assert all(r["layer"] == "stg" for r in rows)
    assert [r["n_rows"] for r in rows] == [2, 2]
    assert all(r["null_observed"] == 0 and r["null_icao"] == 0 for r in rows)
    assert rows[0]["min_observed"].day == 1
    assert rows[1]["max_observed"].day == 2


def test_medallion_schema_snapshots_and_drift(spark, tmp_path):
    """Each stg run snapshots the batch schema (elementary.schema_changes
    twin); identical runs report no drift, an evolved batch reports the
    exact added/removed/retyped rows."""
    import os

    from metar_pipeline_spark.quality.schema_drift import detect_drift

    base = str(tmp_path / "lake_s")
    icaos = ["UUEE", "ULLI"]
    run_medallion(spark, _normalized(spark, _docs(icaos, 1, -5.0)), base)
    run_medallion(spark, _normalized(spark, _docs(icaos, 2, 3.0)), base)

    store = os.path.join(base, "_schema_snapshots")

    def _runs():
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(store)
            if d.startswith("_run=")
        )

    # run_id = the batch's own watermark boundary (epoch seconds):
    # batch identity, not a directory count — two batches, two runs,
    # chronologically ordered
    runs = _runs()
    assert len(runs) == 2 and runs[0] < runs[1]
    # same normalization schema both runs → empty report
    assert detect_drift(spark, store).count() == 0

    # replaying batch 2 (all rows now behind the stg watermark → empty
    # fresh set) must NOT allocate a new snapshot run: the rerun has no
    # fresh data and no batch identity of its own
    run_medallion(spark, _normalized(spark, _docs(icaos, 2, 3.0)), base)
    assert _runs() == runs
    assert detect_drift(spark, store).count() == 0

    # an evolved third batch: drop wind_speed_kt, retype temperature_c,
    # add a new column — drift must name each change
    n3 = _normalized(spark, _docs(icaos, 3, 1.0))
    evolved = n3.drop("wind_speed_kt").withColumn(
        "temperature_c", F.col("temperature_c").cast("string")
    ).withColumn("station_kind", F.lit("intl"))
    from metar_pipeline_spark.quality.schema_drift import (
        record_schema_snapshot,
    )

    # a caller-passed run id newer than the epoch-derived ones: the
    # evolved batch's snapshot must become the detect_drift "current"
    evolved_run = _runs()[-1] + 60
    record_schema_snapshot(evolved, store, evolved_run)
    got = {
        (r.column_name, r.change_type, r.from_type, r.to_type)
        for r in detect_drift(spark, store).collect()
    }
    assert ("wind_speed_kt", "removed", "double", None) in got
    assert ("station_kind", "added", None, "string") in got
    assert ("temperature_c", "type_changed", "double", "string") in got
    assert len(got) == 3

    # idempotent re-record of the same run (replay) does not duplicate
    record_schema_snapshot(evolved, store, evolved_run)
    assert detect_drift(spark, store).count() == 3


def test_schema_snapshot_run_id_is_engine_utc_epoch(spark, tmp_path):
    """Round-9 ADVICE fix: the snapshot run_id comes from
    unix_timestamp(max(observed)) INSIDE the observe metrics — a pure
    function of the data under the pinned UTC session tz — never from
    a driver-side .timestamp() of a naive datetime, which interprets
    the wall time in the host's local timezone and would change across
    a tz switch between a run and its replay."""
    import calendar
    import os

    base = str(tmp_path / "lake_tz")
    run_medallion(spark, _normalized(spark, _docs(["UUEE", "ULLI"], 1, -5.0)), base)
    store = os.path.join(base, "_schema_snapshots")
    runs = [
        int(d.split("=", 1)[1])
        for d in os.listdir(store)
        if d.startswith("_run=")
    ]
    # batch max observed = 2024-02-01T07:00:00 (second icao, i=1)
    want = calendar.timegm((2024, 2, 1, 7, 0, 0))
    assert runs == [want]


def test_metrics_store_anomaly_rule(spark, tmp_path):
    """Q6 completion (round-11 VERDICT #1): the persisted batch-metrics
    store drives the elementary.column_anomalies flagging rule — a
    poisoned batch (nulled icaos) flags its null stats against the run
    history, and a clean follow-up run clears."""
    from metar_pipeline_spark.plans.medallion import stg_stage
    from metar_pipeline_spark.quality.anomalies import (
        metrics_store_anomalies,
    )

    base = str(tmp_path / "lake")
    icaos = ["UUEE", "ULLI", "URSS"]
    for day in (1, 2, 3, 4):
        stg_stage(spark, _normalized(spark, _docs(icaos, day, -5.0)), base)
    bad = _normalized(spark, _docs(icaos, 5, -5.0)).withColumn(
        "icao",
        F.when(F.col("icao") == "UUEE", F.col("icao")).otherwise(
            F.lit(None).cast("string")
        ),
    )
    stg_stage(spark, bad, base)
    metrics = spark.read.parquet(base + "/_metrics")
    rep = {
        (r.column_name, r.stat): r
        for r in metrics_store_anomalies(metrics).collect()
    }
    assert rep[("icao", "null_count")].is_anomaly
    assert rep[("icao", "null_ppm")].is_anomaly
    assert rep[("icao", "null_ppm")].value == 666667  # half-up 2/3 ppm
    assert not rep[("_table", "count")].is_anomaly  # volume unchanged
    assert not rep[("observed", "null_count")].is_anomaly
    assert rep[("icao", "null_count")].hist_n == 4

    # robust-rule dispatch over the same store: constant-zero history
    # quartiles give [0,0] fences — the poisoned run flags there too
    iqr = {
        (r.column_name, r.stat): r
        for r in metrics_store_anomalies(
            metrics, rule="iqr", min_history=4
        ).collect()
    }
    assert iqr[("icao", "null_count")].is_anomaly
    assert not iqr[("_table", "count")].is_anomaly

    # a clean run on top: latest is healthy again, nothing flags (the
    # poisoned run is now merely one history point)
    stg_stage(spark, _normalized(spark, _docs(icaos, 6, -5.0)), base)
    rep2 = metrics_store_anomalies(
        spark.read.parquet(base + "/_metrics")
    ).collect()
    assert rep2 and not any(r.is_anomaly for r in rep2)


def test_stg_anomaly_circuit_breaker(spark, tmp_path):
    """The elementary severity:error analogue: a poisoned batch is
    QUARANTINED before the merge — stg, the metrics history, and the
    schema snapshots all keep their last good state — and a clean
    follow-up batch merges normally (history never polluted by the
    rejected batch). Insufficient history never blocks."""
    import os as _os

    from metar_pipeline_spark.plans.medallion import stg_stage

    base = str(tmp_path / "lake")
    icaos = ["UUEE", "ULLI", "URSS"]
    guard = {"rule": "sigma", "k": 3, "min_history": 3}
    # first batches: guard active but history insufficient → merges
    for day in (1, 2, 3, 4):
        r = stg_stage(
            spark,
            _normalized(spark, _docs(icaos, day, -5.0)),
            base,
            anomaly_guard=guard,
        )
        assert r["status"] == "merged"
    n_before = spark.read.parquet(base + "/stg").count()
    n_metrics = spark.read.parquet(base + "/_metrics").count()

    bad = _normalized(spark, _docs(icaos, 5, -5.0)).withColumn(
        "icao",
        F.when(F.col("icao") == "UUEE", F.col("icao")).otherwise(
            F.lit(None).cast("string")
        ),
    )
    r = stg_stage(spark, bad, base, anomaly_guard=guard)
    assert r["status"] == "quarantined"
    flagged = {
        (x.column_name, x.stat)
        for x in r["flags"].filter("is_anomaly").collect()
    }
    assert ("icao", "null_count") in flagged
    # nothing merged, history unpolluted, batch preserved for triage
    assert spark.read.parquet(base + "/stg").count() == n_before
    assert spark.read.parquet(base + "/_metrics").count() == n_metrics
    q = spark.read.parquet(base + "/_quarantine_stg")
    assert q.count() == 3 and q.select("_run").distinct().count() == 1
    # re-running the same poisoned batch is idempotent (same _run dir)
    r2 = stg_stage(spark, bad, base, anomaly_guard=guard)
    assert r2["status"] == "quarantined"
    assert spark.read.parquet(base + "/_quarantine_stg").count() == 3

    # a clean later batch sails through — the breaker resets itself
    r3 = stg_stage(
        spark,
        _normalized(spark, _docs(icaos, 6, -5.0)),
        base,
        anomaly_guard=guard,
    )
    assert r3["status"] == "merged"
    assert spark.read.parquet(base + "/stg").count() == n_before + 3
    assert _os.path.isdir(base + "/_quarantine_stg")
