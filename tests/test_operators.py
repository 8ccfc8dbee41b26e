"""Unit tests for the operator layer on tiny in-memory frames.

Edge cases follow FIXTURES.md §6: NULLs, duplicate keys, late rows,
non-numeric ids, all-NULL measure groups.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from metar_pipeline_spark.operators.aggregates import (
    daily_rollup,
    duplicate_keys,
    scalar_max,
)
from metar_pipeline_spark.operators.incremental import (
    append_only,
    high_watermark_filter,
    merge_upsert,
)
from metar_pipeline_spark.operators.joins import fk_violations
from metar_pipeline_spark.operators.windows import (
    latest_per_key_maxby,
    latest_per_key_rn,
    sessionize,
    top_k_per_group,
)
from metar_pipeline_spark.quality import (
    accepted_values,
    not_null,
    relationships,
    run_assertions,
    singular,
    unique,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def obs_df(spark):
    rows = [
        # (id, icao, observed, temp)
        ("1", "UUEE", ts("2024-01-01T00:00:00"), 1.0),
        ("2", "UUEE", ts("2024-01-01T12:00:00"), 3.0),
        ("3", "UUDD", ts("2024-01-01T06:00:00"), None),  # NULL measure
        ("4", "UUDD", ts("2024-01-02T06:00:00"), 5.0),
        ("5", "UUEE", ts("2024-01-01T12:00:00"), 2.0),  # duplicate (key, ts)
    ]
    return spark.createDataFrame(rows, "id string, icao string, observed timestamp, temp double")


def test_daily_rollup_null_measures(spark):
    out = daily_rollup(
        obs_df(spark),
        key="icao",
        ts="observed",
        measures={
            "avg_temp": F.avg("temp"),
            "n": F.count(F.lit(1)),
        },
        surrogate_name="icao_date",
    )
    rows = {r["icao_date"]: r for r in out.collect()}
    # COUNT(*) counts NULL-measure rows; AVG excludes them (SQL semantics)
    assert rows["UUDD_20240101"]["n"] == 1
    assert rows["UUDD_20240101"]["avg_temp"] is None
    assert rows["UUEE_20240101"]["n"] == 3
    assert abs(rows["UUEE_20240101"]["avg_temp"] - 2.0) < 1e-9


def test_latest_per_key_forms_agree_with_tiebreak(spark):
    df = obs_df(spark)
    a = latest_per_key_maxby(df, ["icao"], "observed", tiebreak="id")
    b = latest_per_key_rn(df, ["icao"], [F.desc("observed"), F.desc("id")])
    sa = {(r["icao"], r["id"]) for r in a.collect()}
    sb = {(r["icao"], r["id"]) for r in b.collect()}
    assert sa == sb == {("UUEE", "5"), ("UUDD", "4")}


def test_top_k_per_group(spark):
    df = obs_df(spark)
    out = top_k_per_group(df, ["icao"], [F.desc("observed"), F.desc("id")], 2)
    assert out.filter(F.col("icao") == "UUEE").count() == 2


def test_high_watermark_strict_vs_inclusive(spark):
    df = obs_df(spark)
    target = df.filter(F.col("observed") <= ts("2024-01-01T12:00:00"))
    strict = high_watermark_filter(df, target, "observed", inclusive=False)
    incl = high_watermark_filter(df, target, "observed", inclusive=True)
    assert {r["id"] for r in strict.collect()} == {"4"}
    # inclusive reprocesses the boundary instant (L2)
    assert {r["id"] for r in incl.collect()} == {"2", "4", "5"}


def test_high_watermark_empty_target_full_refresh(spark):
    df = obs_df(spark)
    empty = df.filter(F.lit(False))
    assert high_watermark_filter(df, empty, "observed").count() == df.count()
    assert high_watermark_filter(df, None, "observed").count() == df.count()


def test_merge_upsert_last_writer_wins(spark):
    existing = obs_df(spark)
    updates = spark.createDataFrame(
        [("1", "UUEE", ts("2024-01-03T00:00:00"), 9.0)],
        "id string, icao string, observed timestamp, temp double",
    )
    merged = merge_upsert(existing, updates, ["id"], "observed")
    rows = {r["id"]: r for r in merged.collect()}
    assert len(rows) == 5
    assert rows["1"]["temp"] == 9.0  # updated
    assert rows["2"]["temp"] == 3.0  # untouched


def test_append_only_schema_drift(spark):
    existing = obs_df(spark)
    updates = spark.createDataFrame(
        [("9", "UUEE", ts("2024-01-05T00:00:00"), 1.0, "new")],
        "id string, icao string, observed timestamp, temp double, extra string",
    )
    out = append_only(existing, updates)
    assert "extra" in out.columns  # on_schema_change='append_new_columns'
    assert out.count() == 6


def test_scalar_max_default(spark):
    empty = obs_df(spark).filter(F.lit(False))
    assert scalar_max(empty, "observed", default="fallback") == "fallback"


def test_duplicate_keys(spark):
    df = obs_df(spark).withColumn(
        "k", F.when(F.col("id").isin("1", "2"), "dup").otherwise(F.col("id"))
    )
    dups = duplicate_keys(df, "k").collect()
    assert len(dups) == 1 and dups[0]["k"] == "dup"


def test_fk_violations(spark):
    child = obs_df(spark)
    parent = spark.createDataFrame([("UUEE",)], "icao string")
    v = fk_violations(child, parent, "icao", "icao")
    assert {r["icao"] for r in v.collect()} == {"UUDD"}


def test_sessionize_gap(spark):
    rows = [
        (1, "u", ts("2024-01-01T00:00:00")),
        (2, "u", ts("2024-01-01T00:10:00")),
        (3, "u", ts("2024-01-01T02:00:00")),  # > 30 min gap → new session
        (4, "v", ts("2024-01-01T00:00:00")),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = sessionize(df, "user_id", "ts", 30, tiebreak="event_id")
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}


def test_assertions_suite(spark):
    df = obs_df(spark)
    parent = spark.createDataFrame([("UUEE",), ("UUDD",)], "icao string")
    results = run_assertions(
        [
            not_null(df, "icao"),
            not_null(df, "temp", severity="warn"),
            unique(df, "id"),
            accepted_values(df, "icao", ["UUEE", "UUDD"]),
            relationships(df, parent, "icao", "icao"),
            singular("non_negative_temp", df, F.col("temp") < -90),
        ]
    )
    by_name = {r["name"]: r for r in results}
    assert by_name["not_null_icao"]["passed"]
    assert not by_name["not_null_temp"]["passed"]  # one NULL temp
    assert by_name["not_null_temp"]["violations"] == 1
    assert by_name["unique_id"]["passed"]
    assert by_name["accepted_values_icao"]["passed"]
    assert by_name["relationships_icao"]["passed"]
    assert by_name["non_negative_temp"]["passed"]


# ---------------------------------------------------------------------------
# P13 to_json round trip + cross join surface
# ---------------------------------------------------------------------------
def test_to_json_roundtrip(spark):
    from pyspark.sql import types as T

    from metar_pipeline_spark.functions.json_fns import (
        from_json_typed,
        to_json_row,
    )

    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None)], "id int, s string, v double"
    )
    as_json = to_json_row(src)  # json.dumps(doc) equivalent (P13)
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("s", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    back = from_json_typed(
        as_json.select("payload"), "payload", schema, keep=[]
    )
    assert {tuple(r) for r in back.collect()} == {
        (1, "a", 1.5),
        (2, None, None),
    }


def test_cross_join(spark):
    a = spark.createDataFrame([(1,), (2,)], "x int")
    b = spark.createDataFrame([(10,), (20,), (30,)], "y int")
    assert a.crossJoin(b).count() == 6


def test_quarantine_violations_dead_letter_store(spark, tmp_path):
    """Failing assertions persist their VIOLATING ROWS (dbt
    store_failures twin): per-assertion subdir, _run partition,
    idempotent on re-run; passing assertions write nothing."""
    import os

    from metar_pipeline_spark.quality import (
        not_null,
        quarantine_violations,
        relationships,
    )

    child = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "ZZ"), (4, None), (5, "YY")],
        "id long, fk string",
    )
    parent = spark.createDataFrame([("A",), ("B",)], "pk string")
    store = str(tmp_path / "quarantine")
    suite = [
        relationships(child, parent, "fk", "pk"),
        not_null(child, "id"),  # passes → no dead-letter dir
    ]
    res = {r["name"]: r for r in quarantine_violations(suite, store, 0)}
    assert res["relationships_fk"]["violations"] == 2
    assert res["not_null_id"]["passed"] is True

    q = spark.read.parquet(os.path.join(store, "relationships_fk"))
    assert sorted(r.fk for r in q.collect()) == ["YY", "ZZ"]
    assert set(q.columns) == {"id", "fk", "_severity", "_run"}
    assert not os.path.exists(os.path.join(store, "not_null_id"))

    # replay of the same run_id overwrites, never duplicates
    quarantine_violations(suite, store, 0)
    assert spark.read.parquet(
        os.path.join(store, "relationships_fk")
    ).count() == 2
    # a later run appends beside it
    quarantine_violations(suite, store, 1)
    assert spark.read.parquet(
        os.path.join(store, "relationships_fk")
    ).count() == 4

    # pass-transition idempotency: replaying run 1 after the data was
    # fixed (violations now zero) must DROP run 1's stale partition —
    # the store must not show quarantined rows for a passing run
    fixed_child = child.filter(F.col("fk").isin("A", "B") | F.col("fk").isNull())
    fixed_suite = [relationships(fixed_child, parent, "fk", "pk")]
    res2 = quarantine_violations(fixed_suite, store, 1)
    assert res2[0]["passed"] is True
    remaining = spark.read.parquet(os.path.join(store, "relationships_fk"))
    assert remaining.count() == 2
    assert [r._run for r in remaining.select("_run").distinct().collect()] == [0]


def test_cms_never_undercounts_and_bound(spark):
    """CMS guarantees: est(k) >= true(k) for EVERY key (min over
    monotone counters), and on this dataset the overcount stays inside
    the classical e/width * N bound (observational pin for the fixed
    hash rows)."""
    import math

    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    sketch = cms_build(events, "user_id")
    truth = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_cnt")
    )
    est = cms_estimate(sketch, truth, "user_id")
    j = truth.join(est, "user_id").collect()
    n_total = events.count()
    bound = math.ceil(math.e / 1024 * n_total)
    assert all(r.est_cnt >= r.true_cnt for r in j)
    assert all(r.est_cnt - r.true_cnt <= bound for r in j), bound


def test_cms_merge_equals_whole_sketch(spark):
    """sketch(A ⊎ B) == cms_merge(sketch(A), sketch(B)) cell-exactly."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.sketches import cms_build, cms_merge

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    whole = cms_build(events, "user_id")
    halves = cms_merge(
        cms_build(events.filter(F.col("event_id") % 2 == 0), "user_id"),
        cms_build(events.filter(F.col("event_id") % 2 == 1), "user_id"),
    )
    assert whole.exceptAll(halves).count() == 0
    assert halves.exceptAll(whole).count() == 0


def test_fm_estimator_accuracy_and_mergeability(spark):
    """m-mins estimator: relative error within ~3/sqrt(m) of the exact
    distinct count on the test data, and shard-merge ≡ whole (MIN is
    its own merge)."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.sketches import (
        fm_estimate,
        fm_min_columns,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    m = 64
    row = events.agg(
        F.count_distinct("user_id").alias("n"),
        *fm_min_columns(F.col("user_id"), m),
    ).select("n", fm_estimate(m).alias("est")).first()
    assert abs(row.est - row.n) / row.n <= 3.0 / (m ** 0.5)

    halves = [
        events.filter(F.col("event_id") % 2 == p).agg(
            *fm_min_columns(F.col("user_id"), m)
        )
        for p in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1])
        .agg(*[F.min(f"__fm{i}").alias(f"__fm{i}") for i in range(m)])
        .select(fm_estimate(m).alias("est"))
        .first()
        .est
    )
    whole = (
        events.agg(*fm_min_columns(F.col("user_id"), m))
        .select(fm_estimate(m).alias("est"))
        .first()
        .est
    )
    assert merged == whole


def test_kmv_merge_equals_whole_sketch(spark):
    """Bottom-k is a semilattice: merge(bottom-k(A), bottom-k(B)) is
    row-identical to bottom-k(A ⊎ B) — the property that lets shards
    ship one k-row summary each."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.sketches import (
        kmv_merge,
        kmv_quantile_sketch,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").filter(
        F.col("value").isNotNull()
    )
    whole = kmv_quantile_sketch(
        events, ["event_type"], "value", "event_id", k=64
    )
    merged = kmv_merge(
        [
            kmv_quantile_sketch(
                events.filter(F.col("event_id") % 2 == i),
                ["event_type"], "value", "event_id", k=64,
            )
            for i in (0, 1)
        ],
        ["event_type"], "event_id", k=64,
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0


def test_kmv_quantile_estimate_rank_error(spark):
    """The KMV sample is a uniform row sample, so the p50 estimate
    must land within ~3/sqrt(k) rank error of the exact percentile's
    rank (checked in VALUE space via the exact CDF)."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.sketches import (
        kmv_quantile_estimate,
        kmv_quantile_sketch,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events").filter(
        F.col("value").isNotNull()
    )
    k = 256
    sk = kmv_quantile_sketch(
        events, ["event_type"], "value", "event_id", k=k
    )
    est = {
        r.event_type: r.p50
        for r in kmv_quantile_estimate(
            sk, ["event_type"], "value", "event_id", [50]
        ).collect()
    }
    rows = events.select("event_type", "value").collect()
    from collections import defaultdict

    vals = defaultdict(list)
    for r in rows:
        vals[r.event_type].append(r.value)
    for t, v in vals.items():
        v.sort()
        # rank of the estimate in the TRUE distribution
        import bisect

        rank01 = bisect.bisect_right(v, est[t]) / len(v)
        assert abs(rank01 - 0.5) <= 3.0 / (k ** 0.5) + 2.0 / len(v), (
            t, rank01, len(v)
        )


def test_kmv_estimate_small_sample_exact(spark):
    """n < k: the sketch keeps EVERYTHING, so estimates are the exact
    order statistics (p50 of [1..10] at ceil-div rank 5 → value 5)."""
    from metar_pipeline_spark.operators.sketches import (
        kmv_quantile_estimate,
        kmv_quantile_sketch,
    )

    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(1, 11)],
        "t string, id long, value double",
    )
    sk = kmv_quantile_sketch(df, ["t"], "value", "id", k=256)
    r = kmv_quantile_estimate(sk, ["t"], "value", "id", [25, 50, 90]).collect()[0]
    assert r.n_sample == 10
    assert (r.p25, r.p50, r.p90) == (3.0, 5.0, 9.0)


def test_bloom_no_false_negatives_fp_bound_and_merge(spark):
    """Bloom contract on real keys: every member probes TRUE (no false
    negatives, structural), the false-positive rate on absent keys
    stays within 2x the classical (1 - e^{-kn/m})^k bound, and
    shard-merge (word-wise OR) equals the whole-set filter exactly."""
    import math

    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    m_bits, k = 8192, 4
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    members = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = members.count()
    sketch = bloom_build(members, "user_id", m_bits, k).localCheckpoint(
        eager=True
    )
    # members all hit
    hits = bloom_probe(sketch, members, "user_id", m_bits, k)
    assert hits.filter(~F.col("est_member")).count() == 0
    # absent keys: fp rate within 2x theory
    absent = spark.range(10_000_000, 10_002_000).select(
        F.col("id").alias("user_id")
    )
    fp = (
        bloom_probe(sketch, absent, "user_id", m_bits, k)
        .filter(F.col("est_member"))
        .count()
    )
    bound = (1 - math.exp(-k * n / m_bits)) ** k
    assert fp / 2000 <= max(2 * bound, 0.005), (fp, n, bound)
    # merge == whole (bit-exact rows)
    halves = bloom_merge(
        bloom_build(
            members.filter(F.col("user_id") % 2 == 0), "user_id", m_bits, k
        ),
        bloom_build(
            members.filter(F.col("user_id") % 2 == 1), "user_id", m_bits, k
        ),
    )
    assert sketch.exceptAll(halves).count() == 0
    assert halves.exceptAll(sketch).count() == 0


def test_profile_anomalies_integer_sigma_rule(spark):
    """Hand history pins of the cross-multiplied k·σ algebra
    (quality/anomalies.py): σ=0 constant history flags ANY deviation,
    within-k·σ points stay quiet, insufficient history never flags,
    and a latest-only stat (no history) reports hist_n=0 unflagged."""
    from metar_pipeline_spark.quality.anomalies import profile_anomalies

    rows = []
    # stat A: constant history 5,5,5,5 then latest 6 (σ=0 → flag)
    for i, v in enumerate([5, 5, 5, 5]):
        rows.append((i, "c", "A", v))
    rows.append((4, "c", "A", 6))
    # stat B: history 10,20,10,20 (μ=15, σ=5), latest 20 → |Δ|=5 ≤ 3σ
    for i, v in enumerate([10, 20, 10, 20]):
        rows.append((i, "c", "B", v))
    rows.append((4, "c", "B", 20))
    # stat C: only 2 history points, wild latest → insufficient history
    rows += [(2, "c", "C", 1), (3, "c", "C", 1), (4, "c", "C", 99)]
    # stat D: appears only in the latest run
    rows.append((4, "c", "D", 7))
    hist = spark.createDataFrame(
        rows, "run_id long, column_name string, stat string, value long"
    )
    got = {
        r.stat: r
        for r in profile_anomalies(hist, k=3, min_history=3).collect()
    }
    assert got["A"].is_anomaly and got["A"].hist_mean_i == 5
    assert not got["B"].is_anomaly and got["B"].hist_mean_i == 15
    assert not got["C"].is_anomaly and got["C"].hist_n == 2
    assert not got["D"].is_anomaly and got["D"].hist_n == 0
    assert got["D"].hist_mean_i is None
    assert all(r.run_id == 4 for r in got.values())


def test_grouped_profile_long_matches_batch_form(spark):
    """grouped_profile_long over run buckets ≡ column_profile_long per
    bucket — and the ppm rounding is half-up integer."""
    from metar_pipeline_spark.quality.anomalies import (
        column_profile_long,
        grouped_profile_long,
    )

    df = spark.createDataFrame(
        [(0, 1, 10), (0, None, 20), (0, 3, 30), (1, None, 5), (1, 2, 7)],
        "r long, u long, v long",
    )
    grouped = grouped_profile_long(
        df, "r", ["u"], {"v": F.col("v")}
    ).collect()
    per_batch = []
    for r in (0, 1):
        per_batch += column_profile_long(
            df.filter(F.col("r") == r).drop("r"),
            r,
            ["u"],
            {"v": F.col("v")},
        ).collect()
    key = lambda x: (x.run_id, x.column_name, x.stat)  # noqa: E731
    assert sorted(map(tuple, grouped)) == sorted(map(tuple, per_batch))
    g = {key(x): x.value for x in grouped}
    assert g[(0, "u", "null_ppm")] == 333333  # half-up 1/3
    assert g[(1, "u", "null_ppm")] == 500000
    assert g[(0, "v", "max_i")] == 30 and g[(1, "v", "min_i")] == 5


def test_profile_anomalies_iqr_resists_history_poisoning(spark):
    """The robustness case for quartile fences: ONE corrupt run in the
    history inflates σ enough that the k·σ rule misses a later real
    anomaly, while the IQR fences (history quartiles untouched by the
    outlier) still flag it. Both rules evaluated in exact integers."""
    from metar_pipeline_spark.quality.anomalies import (
        profile_anomalies,
        profile_anomalies_iqr,
    )

    rows = [(i, "c", "X", v) for i, v in enumerate([10, 10, 10, 10, 10, 1000])]
    rows.append((6, "c", "X", 200))  # the real anomaly, post-poison
    # a clean stat rides along: constant history, constant latest
    rows += [(i, "c", "Y", 7) for i in range(7)]
    hist = spark.createDataFrame(
        rows, "run_id long, column_name string, stat string, value long"
    )
    sigma = {r.stat: r for r in profile_anomalies(hist, k=3).collect()}
    iqr = {r.stat: r for r in profile_anomalies_iqr(hist, k=3).collect()}
    # σ: |200-175| = 25 « 3·369 — masked by the poisoned history
    assert not sigma["X"].is_anomaly
    # IQR: history quartiles are both 10 → fences [10,10] → flagged
    assert iqr["X"].is_anomaly
    assert (iqr["X"].q1, iqr["X"].q3) == (10, 10)
    assert not sigma["Y"].is_anomaly and not iqr["Y"].is_anomaly
    # insufficient history never flags (IQR min_history=4)
    short = spark.createDataFrame(
        [(0, "c", "Z", 1), (1, "c", "Z", 1), (2, "c", "Z", 1),
         (3, "c", "Z", 999)],
        "run_id long, column_name string, stat string, value long",
    )
    z = profile_anomalies_iqr(short, k=3, min_history=4).collect()[0]
    assert not z.is_anomaly and z.hist_n == 3


def test_profile_anomalies_day_of_week_seasonality(spark):
    """elementary's `seasonality: day_of_week`: a weekend-shaped count
    judged against ALL days flags (false positive); judged against the
    same weekday bucket it is normal — and a genuinely corrupt weekend
    run still flags seasonally."""
    from pyspark.sql import functions as F2

    from metar_pipeline_spark.quality.anomalies import profile_anomalies

    dow = lambda r: F2.pmod(r, F2.lit(7))  # noqa: E731
    rows = []
    for d in range(28):  # 4 weeks of history, mild day-to-day jitter
        v = (1000 + d) if d % 7 in (5, 6) else (100 + d)
        rows.append((d, "c", "count", v))
    # latest run: day 33 (a Saturday, 33 % 7 == 5) with a normal
    # weekend count (inside the Saturday jitter band)
    rows.append((33, "c", "count", 1005))
    hist = spark.createDataFrame(
        rows, "run_id long, column_name string, stat string, value long"
    )
    unseasonal = profile_anomalies(hist, k=3).collect()[0]
    seasonal = profile_anomalies(hist, k=3, season_of=dow).collect()[0]
    # unseasonal: history is ALL 28 runs and the mean is polluted by
    # the weekday/weekend mix (the bimodal σ is so inflated that even
    # this rule stays quiet — exactly why the mean is useless here)
    vals = [v for (_, _, _, v) in rows[:-1]]
    mean_i = (2 * sum(vals) + len(vals)) // (2 * len(vals))  # half-up
    assert unseasonal.hist_n == 28 and unseasonal.hist_mean_i == mean_i
    # seasonal: judged against the 4 prior Saturdays only
    assert not seasonal.is_anomaly
    assert seasonal.hist_n == 4  # Saturdays 5,12,19,26 only
    assert seasonal.hist_mean_i == 1016  # half-up mean of 1005..1026
    # a truly corrupt Saturday still flags under the seasonal rule
    bad = spark.createDataFrame(
        rows[:-1] + [(33, "c", "count", 5)],
        "run_id long, column_name string, stat string, value long",
    )
    assert profile_anomalies(bad, k=3, season_of=dow).collect()[0].is_anomaly
