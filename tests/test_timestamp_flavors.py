"""Timestamp-flavor robustness: the testdata generator has shipped three
parquet timestamp encodings across rounds — TIMESTAMP(NANOS) (read as
long under nanosAsLong), micros NTZ (isAdjustedToUTC=false), and plain
micros LTZ. The engine must read all of them as session-tz TIMESTAMP so
epoch casts, windows, and the DuckDB oracle agree."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.functions.pandas_fns import (
    longest_daily_streaks,
    longest_daily_streaks_jvm,
)
from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.windows import sessionize

SF_DIR = "/root/testdata/sf0.001"


def test_load_table_normalizes_to_session_tz_timestamp(spark):
    """Whatever the generator wrote, engine code sees `timestamp`."""
    for name, col in (("events", "ts"), ("orders", "o_orderdate"),
                      ("lineitem", "l_shipdate")):
        df = load_table(spark, SF_DIR, name)
        assert dict(df.dtypes)[col] == "timestamp", (name, col)


def test_sessionize_accepts_ntz_timestamps(spark, tmp_path):
    """sessionize's epoch math must not reject TIMESTAMP_NTZ inputs
    (the exact failure that zeroed the r2 bench)."""
    path = os.path.join(str(tmp_path), "ntz_events")
    (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            "user_id",
            F.to_timestamp_ntz(F.col("ts")).alias("ts"),
        )
        .write.mode("overwrite").parquet(path)
    )
    # read WITH NTZ inference on: df carries a true timestamp_ntz column
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        ntz = spark.read.parquet(path)
        assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
        out = sessionize(ntz, "user_id", "ts", gap_minutes=30,
                         tiebreak="event_id")
        ltz = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "ts"
        )
        expect = sessionize(ltz, "user_id", "ts", gap_minutes=30,
                            tiebreak="event_id")
        got = {(r.event_id, r.session_id) for r in out.collect()}
        want = {(r.event_id, r.session_id) for r in expect.collect()}
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
        )


def test_streak_jvm_and_grouped_map_forms_agree(spark):
    """The JVM aggregate fold (production) and the applyInPandas
    grouped-map exhibit must return identical streaks."""
    ev = load_table(spark, SF_DIR, "events")
    a = {tuple(r) for r in longest_daily_streaks(ev).collect()}
    b = {tuple(r) for r in longest_daily_streaks_jvm(ev).collect()}
    assert a == b
    assert len(b) > 0


def test_streak_jvm_plan_has_no_python_stage(spark):
    """The registered streak query must stay whole-stage-codegen JVM —
    no ArrowEvalPython / FlatMapGroupsInPandas in the plan."""
    ev = load_table(spark, SF_DIR, "events")
    plan = longest_daily_streaks_jvm(ev)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Pandas" not in plan


@pytest.mark.parametrize("flavor", ["TIMESTAMP_MICROS", "INT96"])
def test_load_table_absorbs_utc_adjusted_flavors(spark, tmp_path, flavor):
    """Third (and fourth) generator flavor: int64 micros with
    isAdjustedToUTC=true, and legacy INT96. load_table must read both
    as session-tz TIMESTAMP with values identical to the current
    testdata — so the next generator change is absorbed silently."""
    src = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    want = sorted((r.event_id, r.ts) for r in src.collect())

    out_sf = str(tmp_path / flavor)
    os.makedirs(out_sf)
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", flavor)
    try:
        src.write.mode("overwrite").parquet(
            os.path.join(out_sf, "events.parquet")
        )
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)

    if flavor == "TIMESTAMP_MICROS":
        # make the fixture honest: the file really is adjusted-UTC micros
        import glob

        import pyarrow.parquet as pq

        f = glob.glob(os.path.join(out_sf, "events.parquet", "*.parquet"))[0]
        ts_field = next(
            c for c in pq.ParquetFile(f).schema
            if c.name == "ts"
        )
        assert "isAdjustedToUTC=true" in str(ts_field.logical_type).replace(
            " ", ""
        ) or "UTC" in str(ts_field.logical_type)

    got_df = load_table(spark, out_sf, "events")
    assert dict(got_df.dtypes)["ts"] == "timestamp"
    got = sorted((r.event_id, r.ts) for r in got_df.collect())
    assert got == want
