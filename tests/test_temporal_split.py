"""operators/temporal_split.py — purged split: boundary inclusivity,
embargo exclusion zone, explicit-cutoff path, the leakage invariant."""

from __future__ import annotations

import datetime as dt

from metar_pipeline_spark.operators.temporal_split import embargo_split


def _events(spark, epochs):
    rows = [
        (i, dt.datetime.utcfromtimestamp(e)) for i, e in enumerate(epochs)
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp")


def test_explicit_cutoff_bands(spark):
    # cutoff 1000, embargo 100: train <= 1000 < embargo <= 1100 < test
    eps = [900, 1000, 1001, 1100, 1101, 2000]
    out = {
        r.ep: r.split
        for r in embargo_split(
            _events(spark, eps), "ts", embargo_s=100, cutoff=1000.0
        ).collect()
    }
    assert out == {
        900: "train",
        1000: "train",  # boundary is train-inclusive
        1001: "embargo",
        1100: "embargo",  # embargo upper edge inclusive
        1101: "test",
        2000: "test",
    }


def test_leakage_invariant_holds(spark):
    eps = list(range(10_000, 10_000 + 500 * 60, 60))  # one event/min
    out = embargo_split(
        _events(spark, eps), "ts", train_frac=0.6, embargo_s=600
    ).collect()
    train = [r.ep for r in out if r.split == "train"]
    test = [r.ep for r in out if r.split == "test"]
    assert train and test
    assert min(test) - max(train) > 600  # the embargo gap, always


def test_percentile_cutoff_fraction(spark):
    eps = list(range(0, 1000))
    out = embargo_split(
        _events(spark, eps), "ts", train_frac=0.7, embargo_s=0
    ).collect()
    n_train = sum(1 for r in out if r.split == "train")
    assert abs(n_train - 700) <= 1  # exact percentile → exact fraction


def test_epoch_column_is_integer_seconds(spark):
    ts = dt.datetime(2025, 1, 2, 3, 4, 5, 678901)  # sub-second micros
    df = spark.createDataFrame([(1, ts)], "id long, ts timestamp")
    r = embargo_split(df, "ts", cutoff=0.0).collect()[0]
    want = int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
    assert r.ep == want  # truncated, never rounded up
