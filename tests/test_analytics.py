"""Semantic tests for the round-5 analytics operators: funnels, OLS
trend, interpolation gap-fill (oracle-hash parity is covered by
tests/test_queries_oracle.py; these pin the SEMANTICS on planted
fixtures where the right answer is known by construction)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


class TestFunnel:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id bigint, event_type string, ts timestamp"
        )

    def test_order_constraint_enforced(self, spark):
        from metar_pipeline_spark.operators.funnel import funnel_user_steps

        # u1 converts in order; u2 clicked BEFORE its first view → the
        # click must not count (funnel steps are order-constrained).
        rows = [
            (1, "view", _ts(1)),
            (1, "click", _ts(2)),
            (1, "purchase", _ts(3)),
            (2, "click", _ts(1)),
            (2, "view", _ts(2)),
        ]
        out = {
            r["user_id"]: r
            for r in funnel_user_steps(
                self._events(spark, rows), ["view", "click", "purchase"]
            ).collect()
        }
        assert out[1]["step0_ts"] == _ts(1)
        assert out[1]["step1_ts"] == _ts(2)
        assert out[1]["step2_ts"] == _ts(3)
        assert out[2]["step0_ts"] == _ts(2)
        assert out[2]["step1_ts"] is None  # click precedes view
        assert out[2]["step2_ts"] is None

    def test_same_timestamp_counts(self, spark):
        from metar_pipeline_spark.operators.funnel import funnel_user_steps

        # >= comparison: a step at the exact same instant qualifies.
        rows = [(1, "view", _ts(1)), (1, "click", _ts(1))]
        r = funnel_user_steps(
            self._events(spark, rows), ["view", "click"]
        ).collect()[0]
        assert r["step1_ts"] == _ts(1)

    def test_summary_counts_and_conversion(self, spark):
        from metar_pipeline_spark.operators.funnel import funnel_summary

        rows = [
            (1, "view", _ts(1)),
            (1, "click", _ts(2)),
            (2, "view", _ts(1)),
            (3, "purchase", _ts(1)),  # no view → outside the funnel top
        ]
        out = {
            r["step"]: r
            for r in funnel_summary(
                self._events(spark, rows), ["view", "click"]
            ).collect()
        }
        assert out["view"]["users_reached"] == 2
        assert out["click"]["users_reached"] == 1
        assert out["click"]["conv_from_first"] == 0.5
        assert out["click"]["conv_from_prev"] == 0.5


class TestGroupedOLS:
    def test_exact_line_recovered(self, spark):
        from metar_pipeline_spark.operators.regression import grouped_ols

        # y = 3x + 7 exactly → slope/intercept exact, r2 == 1.
        rows = [("a", float(x), 3.0 * x + 7.0) for x in range(10)]
        df = spark.createDataFrame(rows, "k string, x double, y double")
        r = grouped_ols(df, ["k"], F.col("x"), F.col("y")).collect()[0]
        assert r["slope"] == 3.0
        assert r["intercept"] == 7.0
        assert r["r2"] == 1.0

    def test_matches_numpy_on_noisy_data(self, spark):
        import numpy as np

        from metar_pipeline_spark.operators.regression import grouped_ols

        rng = np.random.default_rng(7)
        xs = rng.uniform(0, 100, 200)
        ys = 1.5 * xs - 4.0 + rng.normal(0, 5.0, 200)
        df = spark.createDataFrame(
            [("g", float(x), float(y)) for x, y in zip(xs, ys)],
            "k string, x double, y double",
        )
        r = grouped_ols(df, ["k"], F.col("x"), F.col("y")).collect()[0]
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(r["slope"] - slope) < 1e-5
        assert abs(r["intercept"] - intercept) < 1e-4
        cc = np.corrcoef(xs, ys)[0, 1] ** 2
        assert abs(r["r2"] - cc) < 1e-5

    def test_degenerate_group_yields_nulls(self, spark):
        from metar_pipeline_spark.operators.regression import grouped_ols

        df = spark.createDataFrame(
            [("a", 1.0, 2.0), ("a", 1.0, 5.0), ("b", 2.0, 2.0)],
            "k string, x double, y double",
        )
        out = {r["k"]: r for r in grouped_ols(df, ["k"], F.col("x"), F.col("y")).collect()}
        assert out["a"]["slope"] is None  # constant x
        assert out["b"]["slope"] is None  # single point


class TestInterpolation:
    def test_midpoint_and_flags(self, spark, tmp_path):
        # Plant a per-type daily series with one interior gap; the
        # registered query thins by event_id % 11 == 0 — craft ids so
        # exactly the kept rows form days 1, 2, 4 (day 3 missing).
        import pyspark.sql.functions as F  # noqa: F401

        from metar_pipeline_spark.queries.analytics_q import (
            interpolate_daily_gaps,
        )

        rows = [
            # (event_id % 11 == 0 → kept)
            (0, _ts(1), 1, "view", 10.0, "{}"),
            (11, _ts(2), 1, "view", 20.0, "{}"),
            (22, _ts(4), 1, "view", 40.0, "{}"),
            (3, _ts(3), 1, "view", 999.0, "{}"),  # thinned out
        ]
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )
        d = tmp_path / "sf"
        df.write.parquet(str(d / "events.parquet"))
        out = {
            r["day"]: r
            for r in interpolate_daily_gaps(spark, str(d)).collect()
        }
        assert out[dt.date(2024, 1, 3)]["is_interpolated"] is True
        # linear between 20 (day 2) and 40 (day 4) → 30 at day 3
        assert out[dt.date(2024, 1, 3)]["value_filled"] == 30.0
        assert out[dt.date(2024, 1, 2)]["is_interpolated"] is False
        assert out[dt.date(2024, 1, 2)]["value_filled"] == 20.0
        assert len(out) == 4


class TestCDC:
    def _changes(self, spark, rows):
        return spark.createDataFrame(
            rows, "k bigint, seq int, op string, v string"
        )

    def test_snapshot_apply(self, spark):
        from metar_pipeline_spark.sources.cdc import apply_changelog

        rows = [
            (1, 1, "I", "a"),
            (1, 2, "U", "b"),
            (2, 1, "I", "x"),
            (2, 2, "D", None),
            (3, 1, "I", "z"),
        ]
        out = {
            r["k"]: r["v"]
            for r in apply_changelog(
                self._changes(spark, rows), ["k"]
            ).collect()
        }
        assert out == {1: "b", 3: "z"}  # key 2 deleted

    def test_incremental_target_only_touches_changed_keys(self, spark):
        from metar_pipeline_spark.sources.cdc import apply_changelog

        target = spark.createDataFrame(
            [(1, "old1"), (2, "old2"), (3, "old3")], "k bigint, v string"
        )
        batch = self._changes(
            spark, [(1, 10, "U", "new1"), (2, 10, "D", None)]
        )
        out = {
            r["k"]: r["v"]
            for r in apply_changelog(batch, ["k"], target=target).collect()
        }
        # 1 updated, 2 deleted, 3 passed through untouched
        assert out == {1: "new1", 3: "old3"}

    def test_replay_converges(self, spark):
        from metar_pipeline_spark.sources.cdc import apply_changelog

        rows = [(1, 1, "I", "a"), (1, 1, "D", None)]  # same seq: D wins
        out = apply_changelog(self._changes(spark, rows), ["k"]).collect()
        assert out == []
        # replaying the doubled feed yields the same state
        doubled = self._changes(spark, rows + rows)
        assert apply_changelog(doubled, ["k"]).collect() == []


class TestPageRank:
    def test_star_graph_center_wins_and_mass_conserved(self, spark):
        from metar_pipeline_spark.operators.graph import pagerank

        # 4 leaves all point at the center; the center is dangling.
        edges = spark.createDataFrame(
            [(f"leaf{i}", "center") for i in range(4)],
            "src string, dst string",
        )
        out = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
        assert len(out) == 5
        leaf_ranks = {v for k, v in out.items() if k.startswith("leaf")}
        assert len(leaf_ranks) == 1  # symmetric leaves tie exactly
        assert out["center"] > max(leaf_ranks)
        # total rank mass stays 1 (dangling mass redistributed, each
        # step only rounds at the 12th decimal)
        assert abs(sum(out.values()) - 1.0) < 1e-9

    def test_chain_converges_toward_sink(self, spark):
        from metar_pipeline_spark.operators.graph import pagerank

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
        out = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
        assert out["c"] > out["b"] > out["a"]


class TestBigramLM:
    def test_model_probs_and_scoring(self, spark):
        import math

        from metar_pipeline_spark.operators.lm import (
            score_docs_nll,
            train_char_bigram_lm,
        )

        # corpus 'abab' + 'abc': bigrams ab,ba,ab / ab,bc
        docs = spark.createDataFrame(
            [(1, "abab"), (2, "abc")], "doc_id bigint, text string"
        )
        model = {r["bg"]: r["logp"] for r in train_char_bigram_lm(docs).collect()}
        # prefix counts are over bigram START positions: 'a' starts
        # {ab,ab,ab} → P(b|a)=1; 'b' starts {ba,bc} → P(a|b)=P(c|b)=1/2
        assert model["ab"] == 0.0
        assert abs(model["ba"] - math.log(1 / 2)) < 1e-12
        assert abs(model["bc"] - math.log(1 / 2)) < 1e-12
        scored = {
            r["doc_id"]: r
            for r in score_docs_nll(docs, train_char_bigram_lm(docs)).collect()
        }
        # doc1 NLL = (0 + ln2 + 0)/3
        assert abs(scored[1]["mean_nll"] - round(math.log(2) / 3, 6)) < 1e-9
        assert scored[1]["n_bigrams"] == 3
        # perplexity = exp(mean_nll)
        assert abs(
            scored[1]["perplexity"] - round(math.exp(scored[1]["mean_nll"]), 6)
        ) < 1e-9

    def test_short_and_empty_docs_drop_out(self, spark):
        from metar_pipeline_spark.operators.lm import (
            score_docs_nll,
            train_char_bigram_lm,
        )

        docs = spark.createDataFrame(
            [(1, "abcd"), (2, "x"), (3, "")], "doc_id bigint, text string"
        )
        out = score_docs_nll(docs, train_char_bigram_lm(docs)).collect()
        assert {r["doc_id"] for r in out} == {1}

    def test_platt_empty_scores_no_crash(self, spark):
        # every doc shorter than one bigram → dsir scores are empty;
        # the gradient SUM is NULL and the weight update must not
        # TypeError — weights stay at 0 and the result is empty
        from metar_pipeline_spark.operators.lm import platt_calibrated_scores

        empty = spark.createDataFrame(
            [], "doc_id bigint, score double, label int"
        )
        out = platt_calibrated_scores(empty, "doc_id", "score", "label")
        assert out.columns == ["doc_id", "score", "label", "prob"]
        assert out.count() == 0


class TestTriangleCensus:
    def test_k4_and_canonicalization(self, spark):
        from metar_pipeline_spark.operators.graph import triangle_census

        # K4 given with mixed edge orientation + a duplicate edge:
        # canonicalization must still see 6 edges, 4 triangles,
        # wedges = 4 * C(3,2) = 12 → transitivity 3*4/12 = 1.0
        edges = spark.createDataFrame(
            [(1, 2), (3, 1), (1, 4), (2, 3), (4, 2), (3, 4), (2, 1)],
            "id_a bigint, id_b bigint",
        )
        r = triangle_census(edges).collect()[0]
        assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
        assert r["transitivity"] == 1.0

    def test_triangle_free_graph(self, spark):
        from metar_pipeline_spark.operators.graph import triangle_census

        # a path 1-2-3-4 has wedges but no triangles
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "id_a bigint, id_b bigint"
        )
        r = triangle_census(edges).collect()[0]
        assert r["n_triangles"] == 0
        assert r["transitivity"] == 0.0


class TestRollupMerge:
    def test_merge_equals_full_recompute(self, spark):
        from metar_pipeline_spark.operators.incremental import (
            merge_partial_rollups,
        )

        df = spark.createDataFrame(
            [("a", 1, 10.0), ("a", 1, 5.0), ("b", 2, 1.5), ("a", 2, 2.0)],
            "k string, d int, v double",
        )

        def partial(x):
            return x.groupBy("k", "d").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
            )

        full = {tuple(r[:2]): r[2:] for r in partial(df).collect()}
        merged = merge_partial_rollups(
            [partial(df.filter("d = 1")), partial(df.filter("d = 2"))],
            ["k", "d"],
            ["n", "s"],
        )
        got = {tuple(r[:2]): r[2:] for r in merged.collect()}
        assert got == full


class TestM4AndWeightedSample:
    def test_m4_semantics(self, spark, tmp_path):
        from metar_pipeline_spark.queries.analytics_q import (
            m4_downsample_value,
        )

        rows = [
            (1, dt.datetime(2024, 1, 1, 0, 0), 1, "view", 5.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 1, 0), 1, "view", 9.0, "{}"),
            (3, dt.datetime(2024, 1, 1, 2, 0), 1, "view", 1.0, "{}"),
            (4, dt.datetime(2024, 1, 1, 7, 0), 1, "view", 4.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )
        d = tmp_path / "sf"
        df.write.parquet(str(d / "events.parquet"))
        out = sorted(
            m4_downsample_value(spark, str(d)).collect(),
            key=lambda r: r["bucket_start"],
        )
        first = out[0]  # 00:00-06:00 bucket: values 5, 9, 1
        assert (first["n"], first["v_min"], first["v_max"]) == (3, 1.0, 9.0)
        assert first["v_first"] == 5.0 and first["v_last"] == 1.0
        assert out[1]["n"] == 1 and out[1]["v_first"] == 4.0

    def test_weighted_sample_matches_reference_computation(self, spark):
        import math

        from metar_pipeline_spark.io import load_table
        from metar_pipeline_spark.queries.analytics_q import (
            weighted_sample_docs,
        )

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        ref = []
        for r in docs.select("doc_id", "n_chars").collect():
            if r["n_chars"] > 0:
                u = ((r["doc_id"] * 2654435761) % 4294967296 + 0.5) / 4294967296.0
                ref.append((math.log(u) / r["n_chars"], -r["doc_id"]))
        ref.sort(reverse=True)
        want = [-d for _, d in ref[:50]]
        got = [
            r["doc_id"]
            for r in weighted_sample_docs(
                spark, "/root/testdata/sf0.001"
            ).orderBy("rank").collect()
        ]
        assert got == want


class TestTableDiff:
    def test_statuses_and_null_handling(self, spark):
        from metar_pipeline_spark.operators.diffing import (
            table_diff,
            table_diff_summary,
        )

        left = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None), (4, "")],
            "k bigint, v string",
        )
        right = spark.createDataFrame(
            [(1, "a"), (2, "B"), (3, ""), (5, "new")],
            "k bigint, v string",
        )
        out = {r["k"]: r["status"] for r in table_diff(left, right, ["k"]).collect()}
        assert out == {
            1: "identical",
            2: "changed",
            3: "changed",  # NULL vs '' must NOT hash equal
            4: "removed",
            5: "added",
        }
        summary = {
            r["status"]: (r["n_keys"], r["example_keys"])
            for r in table_diff_summary(
                left, right, ["k"], sample_per_class=2
            ).collect()
        }
        assert summary["changed"] == (2, "2,3")
        assert summary["added"] == (1, "5")


class TestDynamicPartitionBackfill:
    def test_untouched_partitions_keep_exact_files(self, spark, tmp_path):
        import os

        from metar_pipeline_spark.sources.backfill import (
            overwrite_affected_partitions,
        )

        store = str(tmp_path / "store")
        full = spark.createDataFrame(
            [(d, i, float(i)) for d in ("a", "b", "c") for i in range(3)],
            "part string, k int, v double",
        )
        full.write.partitionBy("part").parquet(store)

        def files(p):
            out = {}
            for d in os.listdir(p):
                if d.startswith("part="):
                    sub = os.path.join(p, d)
                    out[d] = {
                        f: os.path.getmtime(os.path.join(sub, f))
                        for f in os.listdir(sub)
                        if f.endswith(".parquet")
                    }
            return out

        before = files(store)
        repaired = spark.createDataFrame(
            [("b", 99, 99.0)], "part string, k int, v double"
        )
        overwrite_affected_partitions(spark, repaired, store, "part")
        after = files(store)
        # a and c byte-identical (same files, same mtimes); b replaced
        assert after["part=a"] == before["part=a"]
        assert after["part=c"] == before["part=c"]
        assert after["part=b"] != before["part=b"]
        back = spark.read.parquet(store)
        assert back.filter("part = 'b'").count() == 1
        assert back.count() == 7
        # the conf is restored to its previous value
        assert (
            spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            != "dynamic"
        )


class TestGeo:
    def test_haversine_known_distance(self, spark):
        from metar_pipeline_spark.operators.geo import haversine_km

        # Paris (48.8566, 2.3522) to London (51.5074, -0.1278) ≈ 334 km
        df = spark.createDataFrame(
            [(48.8566, 2.3522, 51.5074, -0.1278)],
            "lat1 double, lon1 double, lat2 double, lon2 double",
        )
        d = df.select(
            haversine_km(
                F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
            ).alias("d")
        ).collect()[0]["d"]
        assert 330 < d < 345
        # zero distance to itself
        z = df.select(
            haversine_km(
                F.col("lat1"), F.col("lon1"), F.col("lat1"), F.col("lon1")
            ).alias("d")
        ).collect()[0]["d"]
        assert z == 0.0

    def test_grid_nearest_agrees_with_bruteforce_when_found(self, spark):
        """Grid blocking is radius-bounded: wherever it returns a
        station, that station must be the TRUE nearest whenever the
        true nearest lies within the 3x3 neighborhood — at this
        density (sf0.001 customers) every probe's true nearest is
        in-neighborhood, so the two agree exactly."""
        from metar_pipeline_spark.queries.geo_q import (
            geo_grid_nearest_station,
            geo_nearest_station_bruteforce,
        )

        sf = "/root/testdata/sf0.001"
        brute = {
            r["probe_id"]: (r["station_id"], r["dist_km"])
            for r in geo_nearest_station_bruteforce(spark, sf).collect()
        }
        grid = {
            r["probe_id"]: (r["station_id"], r["dist_km"])
            for r in geo_grid_nearest_station(spark, sf).collect()
        }
        for pid, (sid, dist) in grid.items():
            assert brute[pid] == (sid, dist)
        assert len(grid) >= 3  # most probes find a neighbor in 3x3


def test_holt_is_exact_on_linear_series(spark):
    """On perfectly linear data Holt's recurrence is exact for ANY
    alpha/beta with the (l1=y1, b1=y2-y1) init: level tracks y_t,
    trend stays at the slope, and the h-step forecast extrapolates the
    line exactly — a closed-form anchor the oracle hash can't state."""
    from metar_pipeline_spark.queries import all_queries

    import datetime

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1 + i, 12, 0, 0),
            1,
            "lin",
            10.0 + 2.5 * i,
            "{}",
        )
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")  # only table this reads
        out = all_queries()["holt_linear_forecast"].spark_fn(
            spark, d
        ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 10
    assert abs(r["level"] - (10.0 + 2.5 * 9)) < 1e-6
    assert abs(r["trend"] - 2.5) < 1e-6
    assert abs(r["forecast_7d"] - (10.0 + 2.5 * 9 + 7 * 2.5)) < 1e-6


def test_time_weighted_avg_on_planted_holds(spark, tmp_path):
    """TWA semantics by construction: value 10 held for 30s then value
    20 held for 10s -> (10*30 + 20*10) / 40 = 12.5 (an unweighted mean
    would say 15); a constant series returns the constant; the final
    observation carries no weight."""
    import datetime

    from metar_pipeline_spark.queries import all_queries

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 10.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=30), 1, "view", 20.0, "{}"),
        (3, t0 + datetime.timedelta(seconds=40), 1, "view", 999.0, "{}"),
        (4, t0, 2, "view", 7.0, "{}"),
        (5, t0 + datetime.timedelta(seconds=60), 2, "view", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    d = str(tmp_path)
    df.write.parquet(f"{d}/events.parquet")
    out = {
        r["user_id"]: r
        for r in all_queries()["time_weighted_avg_user_value"]
        .spark_fn(spark, d)
        .collect()
    }
    assert out[1]["twa_value"] == 12.5  # 999 at the tail has no weight
    assert out[1]["covered_seconds"] == 40
    assert out[2]["twa_value"] == 7.0


def test_interval_islands_merge_overlaps(spark, tmp_path):
    """Overlapping and touching intervals merge; a gap starts a new
    island. Durations are 60 + event_id % 600 seconds, so event_id
    picks the overlap structure exactly."""
    import datetime

    from metar_pipeline_spark.queries import all_queries

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # island A: [0, 60] and [30, 90+60] overlap (dur 60, 120)
        (0, t0, 1, "v", 0.0, "{}"),
        (60, t0 + datetime.timedelta(seconds=30), 1, "v", 0.0, "{}"),
        # island B: starts at 1000 > 150 (gap)
        (0, t0 + datetime.timedelta(seconds=1000), 1, "v", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    d = str(tmp_path)
    df.write.parquet(f"{d}/events.parquet")
    out = sorted(
        all_queries()["interval_coverage_islands"]
        .spark_fn(spark, d)
        .collect(),
        key=lambda r: r["island_id"],
    )
    assert len(out) == 2
    assert out[0]["n_intervals"] == 2 and out[1]["n_intervals"] == 1
    assert out[0]["covered_seconds"] == 150  # [t0, t0+30+120]


def test_benford_frequencies_sum_to_one(spark):
    from metar_pipeline_spark.queries import all_queries

    rows = all_queries()["benford_first_digit_audit"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r["digit"] for r in sorted(rows, key=lambda r: r["digit"])] \
        == list(range(1, 10))
    assert abs(sum(r["observed_freq"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_freq"] for r in rows) - 1.0) < 1e-4


def test_funnel_max_gap_excludes_late_steps(spark):
    """A click 2h after the view converts in the unbounded funnel but
    NOT in a 1h-boxed funnel; within the box both agree."""
    from metar_pipeline_spark.operators.funnel import funnel_user_steps

    rows = [
        (1, "view", _ts(1, 0)),
        (1, "click", _ts(1, 2)),  # 2h later
        (2, "view", _ts(2, 0)),
        (2, "click", _ts(2, 0)),  # same instant
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )
    unbounded = {
        r["user_id"]: r["step1_ts"]
        for r in funnel_user_steps(df, ["view", "click"]).collect()
    }
    boxed = {
        r["user_id"]: r["step1_ts"]
        for r in funnel_user_steps(
            df, ["view", "click"], max_gap_seconds=3600
        ).collect()
    }
    assert unbounded[1] is not None and boxed[1] is None
    assert unbounded[2] == boxed[2] == _ts(2, 0)


def test_gini_bounds_and_uniform_case(spark, tmp_path):
    """Gini of a perfectly uniform activity distribution is 0; adding
    one dominant user pushes it strictly positive; always within
    [0, 1)."""
    import datetime

    from metar_pipeline_spark.queries import all_queries

    t0 = datetime.datetime(2024, 1, 1)
    uniform = [
        (u * 10 + i, t0, u, "view", 1.0, "{}")
        for u in range(1, 6)
        for i in range(4)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    d1 = str(tmp_path / "u")
    spark.createDataFrame(uniform, schema).write.parquet(
        f"{d1}/events.parquet"
    )
    g1 = all_queries()["activity_gini_coefficient"].spark_fn(
        spark, d1
    ).collect()[0]
    assert g1["gini"] == 0.0 and g1["n_users"] == 5

    skewed = uniform + [
        (1000 + i, t0, 9, "view", 1.0, "{}") for i in range(100)
    ]
    d2 = str(tmp_path / "s")
    spark.createDataFrame(skewed, schema).write.parquet(
        f"{d2}/events.parquet"
    )
    g2 = all_queries()["activity_gini_coefficient"].spark_fn(
        spark, d2
    ).collect()[0]
    assert 0.0 < g2["gini"] < 1.0


def test_pmi_marginal_consistency(spark):
    """Lift and PMI agree (pmi == ln(lift)) and pair counts never
    exceed either marginal's user count."""
    import math

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    rows = all_queries()["event_cooccurrence_pmi"].spark_fn(
        spark, sf
    ).collect()
    events = load_table(spark, sf, "events")
    marg = {
        r["event_type"]: r["n"]
        for r in events.select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows
    for r in rows:
        assert abs(r["pmi"] - round(math.log(r["lift"]), 6)) <= 1e-5
        assert r["n_users_both"] <= min(marg[r["type_a"]], marg[r["type_b"]])


def test_winsorized_mean_bounds_and_clipping(spark):
    """The winsorized mean lies within [lo, hi]; clipped count is at
    most ~10% of rows (5% each tail, up to interpolation ties)."""
    from metar_pipeline_spark.queries import all_queries

    rows = all_queries()["winsorized_mean_value_by_type"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_clipped"] <= 0.12 * r["n"]


def test_decile_concentration_shares_sum_to_one(spark):
    from metar_pipeline_spark.queries import all_queries

    rows = sorted(
        all_queries()["value_decile_concentration"].spark_fn(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert abs(sum(r["share_of_total"] for r in rows) - 1.0) < 1e-4
    # deciles are ranked top-down: shares are non-increasing
    shares = [r["share_of_total"] for r in rows]
    assert shares == sorted(shares, reverse=True)


def test_psi_terms_are_finite_and_smoothed(spark):
    """Smoothing keeps every PSI term finite; ref/cur frequencies are
    proper distributions up to the +1e-4 smoothing mass."""
    import math

    from metar_pipeline_spark.queries import all_queries

    rows = all_queries()["psi_value_drift"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert math.isfinite(r["psi_term"])
        assert r["p_ref"] > 0 and r["p_cur"] > 0
    for col in ("p_ref", "p_cur"):
        s = sum(r[col] for r in rows)
        assert abs(s - 1.0) < 0.01 + 1e-4 * len(rows)


class TestTombstonePurge:
    def test_purge_leaves_zero_tombstoned_rows(self, spark):
        """The anti-join delete is provably complete: after
        tombstone_purge, a semi-join back against the tombstone set is
        empty, and retained + purged partitions the fact exactly."""
        from metar_pipeline_spark.io import load_table
        from metar_pipeline_spark.queries.pipeline_q import tombstone_purge
        SF_DIR = "/root/testdata/sf0.001"
        events = load_table(spark, SF_DIR, "events")
        tombstones = (
            events.filter(F.col("user_id") % 97 == 13)
            .select("user_id")
            .distinct()
        )
        retained = tombstone_purge(events, tombstones)
        leaked = retained.join(tombstones, "user_id", "left_semi")
        assert leaked.count() == 0
        assert retained.count() + events.join(
            tombstones, "user_id", "left_semi"
        ).count() == events.count()


class TestSkylineFrontier:
    def test_frontier_dominance_properties(self, spark):
        """Planted fixture: every returned point must be undominated,
        every omitted day dominated by some frontier point, and
        best_price strictly decreasing over frontier days."""
        import datetime as _dt

        from metar_pipeline_spark.queries.analytics_q import (
            skyline_price_date_frontier,
        )
        from metar_pipeline_spark.io import load_table

        SF_DIR = "/root/testdata/sf0.001"
        out = skyline_price_date_frontier(spark, SF_DIR).collect()
        days = [r["day"] for r in out]
        prices = [r["best_price"] for r in out]
        assert days == sorted(days)
        assert all(a > b for a, b in zip(prices, prices[1:])), (
            "frontier prices must strictly improve"
        )
        # every non-frontier day is dominated: its per-day min price is
        # >= some earlier-or-equal frontier price
        per_day = {
            r["day"]: r["p"]
            for r in load_table(spark, SF_DIR, "orders")
            .groupBy(F.col("o_orderdate").cast("date").alias("day"))
            .agg(F.round(F.min("o_totalprice"), 2).alias("p"))
            .collect()
        }
        frontier = dict(zip(days, prices))
        for day, p in per_day.items():
            if day in frontier:
                continue
            assert any(fd <= day and fp <= p for fd, fp in frontier.items()), (
                f"non-frontier day {day} (price {p}) is not dominated"
            )


class TestBM25:
    def test_planted_relevance_ordering(self, spark):
        """A doc stuffed with a rare query term must outrank docs that
        merely mention common terms once; docs with zero query terms
        never appear."""
        from metar_pipeline_spark.queries import all_queries

        docs = spark.createDataFrame(
            [
                (1, "vector vector vector vector", "en", "a", 20),
                (2, "join the big table stream", "en", "a", 25),
                (3, "nothing relevant here at all", "en", "a", 28),
                (4, "spark join vector", "en", "a", 17),
            ],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            docs.write.parquet(f"{d}/documents.parquet")
            out = all_queries()["bm25_keyword_search"].spark_fn(
                spark, d
            ).collect()
        ranks = {r["doc_id"]: r["rank"] for r in out}
        hits = {r["doc_id"]: r["n_terms_hit"] for r in out}
        assert 3 not in ranks  # no query term -> never retrieved
        assert hits[4] == 3 and hits[1] == 1 and hits[2] == 1
        # doc 4 matches all three terms (incl. rare 'spark') and is
        # short -> top rank; the single-common-term doc 2 ranks last
        assert ranks[4] == 1
        assert ranks[2] == max(ranks.values())
