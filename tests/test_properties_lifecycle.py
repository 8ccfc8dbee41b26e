"""Property-based tests (hypothesis) for the round-12 ops algebra:

- lifecycle law: for ANY batch sequence and ANY checkpoint schedule
  (including replays of consumed batches), the serving view's group
  sums equal the plain fold of every batch ever appended once;
- anomaly-rule law: the cross-multiplied DECIMAL k·σ test equals an
  exact-rational reference ((n·x−S)² vs k²·(n·Q−S²) in Fractions) for
  ANY integer history — the float-free claim, checked against floats'
  only trustworthy stand-in (exact rationals);
- IQR-rule law: the integer-rank quartiles equal the Python reference
  rank selection, and the fence verdict matches.

Examples are deliberately small (one Spark job per example); domains
chosen to hit σ=0 histories, single-point histories, duplicate values
and empty logs.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

batch_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=-5, max_value=9),
    ),
    min_size=1,
    max_size=4,
)
batches = st.lists(batch_rows, min_size=1, max_size=5)


@given(
    bs=batches,
    ckpt_mask=st.lists(st.booleans(), min_size=5, max_size=5),
    replay=st.integers(min_value=0, max_value=4),
)
@SETTINGS
def test_lifecycle_serving_equals_plain_fold(spark, tmp_path_factory, bs, ckpt_mask, replay):
    import pyspark.sql.functions as F

    from metar_pipeline_spark.streaming.lifecycle import (
        checkpoint_and_truncate,
        serving_view,
    )
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    tmp = tmp_path_factory.mktemp("lc")
    log, snaps = str(tmp / "log"), str(tmp / "snaps")

    def merge(snap, consumed):
        u = consumed if snap is None else snap.unionByName(consumed)
        return u.groupBy("k").agg(F.sum("d").cast("long").alias("d"))

    truth: dict[int, int] = {}
    for i, rows in enumerate(bs):
        for k, d in rows:
            truth[k] = truth.get(k, 0) + d
        idempotent_batch_append(
            spark.createDataFrame(rows, "k long, d long"), log, i
        )
        if ckpt_mask[i]:
            checkpoint_and_truncate(spark, log, snaps, merge, through_batch=i)
    # an at-least-once replay of some earlier batch (consumed or live)
    if replay < len(bs):
        idempotent_batch_append(
            spark.createDataFrame(bs[replay], "k long, d long"), log, replay
        )
    got = {
        r.k: r.d
        for r in merge(None, serving_view(spark, log, snaps)).collect()
    }
    # exact group sums; groups the merge dropped/kept at 0 both read 0
    for k in set(truth) | set(got):
        assert got.get(k, 0) == truth.get(k, 0)


hist_vals = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=8
)


@given(vals=hist_vals, latest=st.integers(min_value=-60, max_value=60))
@SETTINGS
def test_sigma_rule_matches_exact_rational_reference(spark, vals, latest):
    from metar_pipeline_spark.quality.anomalies import profile_anomalies

    rows = [(i, "c", "s", v) for i, v in enumerate(vals)]
    rows.append((len(vals), "c", "s", latest))
    hist = spark.createDataFrame(
        rows, "run_id long, column_name string, stat string, value long"
    )
    got = profile_anomalies(hist, k=3, min_history=3).collect()[0]
    n = Fraction(len(vals))
    s = Fraction(sum(vals))
    q = Fraction(sum(v * v for v in vals))
    lhs = (n * latest - s) ** 2
    rhs = 9 * (n * q - s * s)
    want = len(vals) >= 3 and lhs > rhs
    assert bool(got.is_anomaly) == want
    # half-up integer mean matches the rational reference
    want_mean = (2 * sum(vals) + len(vals)) // (2 * len(vals))
    assert got.hist_mean_i == want_mean


@given(vals=hist_vals, latest=st.integers(min_value=-60, max_value=60))
@SETTINGS
def test_iqr_rule_matches_reference_rank_selection(spark, vals, latest):
    from metar_pipeline_spark.quality.anomalies import (
        profile_anomalies_iqr,
    )

    rows = [(i, "c", "s", v) for i, v in enumerate(vals)]
    rows.append((len(vals), "c", "s", latest))
    hist = spark.createDataFrame(
        rows, "run_id long, column_name string, stat string, value long"
    )
    got = profile_anomalies_iqr(hist, k=3, min_history=4).collect()[0]
    sv = sorted(vals)
    n = len(sv)
    q1 = sv[(n * 25 + 99) // 100 - 1]
    q3 = sv[(n * 75 + 99) // 100 - 1]
    want = n >= 4 and (latest < q1 - 3 * (q3 - q1) or latest > q3 + 3 * (q3 - q1))
    assert (got.q1, got.q3) == (q1, q3)
    assert bool(got.is_anomaly) == want
