"""SCD Type 2 semantics: interval collapse + incremental/full parity."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.scd import scd2_apply, scd2_from_changes


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


@pytest.fixture(scope="module")
def change_log(spark):
    # key 1: A,A,B,A — runs A[1,3) B[3,5) A[5,∞)
    # key 2: single change — one open interval
    # key 3: same-ts tie broken by the tiebreak id (B then C by id order)
    rows = [
        (1, "A", _ts(1), 10),
        (1, "A", _ts(2), 11),
        (1, "B", _ts(3), 12),
        (1, "A", _ts(5), 13),
        (2, "X", _ts(4), 20),
        (3, "B", _ts(6), 31),
        (3, "C", _ts(6), 32),
    ]
    return spark.createDataFrame(rows, "k int, attr string, ts timestamp, tb long")


def test_scd2_intervals(change_log):
    out = {
        (r.k, r.attr, r.valid_from): (r.valid_to, r.is_current)
        for r in scd2_from_changes(change_log, "k", "attr", "ts", "tb").collect()
    }
    assert len(out) == 6
    assert out[(1, "A", _ts(1))] == (_ts(3), False)
    assert out[(1, "B", _ts(3))] == (_ts(5), False)
    assert out[(1, "A", _ts(5))] == (None, True)
    assert out[(2, "X", _ts(4))] == (None, True)
    # same-ts runs: B (tb=31) precedes C (tb=32); C closes B at the tied ts
    assert out[(3, "B", _ts(6))] == (_ts(6), False)
    assert out[(3, "C", _ts(6))] == (None, True)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("split_day", [2, 4, 6])
def test_scd2_apply_parity(change_log, split_day):
    """Incremental apply == full rebuild, whatever the batch boundary."""
    split = _ts(split_day)
    hist = change_log.filter(F.col("ts") < split)
    batch = change_log.filter(F.col("ts") >= split)
    dim = scd2_from_changes(hist, "k", "attr", "ts", "tb")
    merged = scd2_apply(dim, batch, "k", "attr", "ts", "tb")
    full = scd2_from_changes(change_log, "k", "attr", "ts", "tb")
    assert _canon(merged) == _canon(full)


def test_scd2_apply_untouched_keys_pass_through(change_log, spark):
    """A batch touching only key 1 must not rewrite keys 2 and 3."""
    dim = scd2_from_changes(change_log, "k", "attr", "ts", "tb")
    batch = spark.createDataFrame(
        [(1, "Z", _ts(9), 99)], "k int, attr string, ts timestamp, tb long"
    )
    merged = scd2_apply(dim, batch, "k", "attr", "ts", "tb")
    others_before = _canon(dim.filter(F.col("k") != 1))
    others_after = _canon(merged.filter(F.col("k") != 1))
    assert others_before == others_after
    # key 1's open A-run closed at day 9 by the Z change
    k1 = {
        (r.attr, r.valid_from): (r.valid_to, r.is_current)
        for r in merged.filter(F.col("k") == 1).collect()
    }
    assert k1[("A", _ts(5))] == (_ts(9), False)
    assert k1[("Z", _ts(9))] == (None, True)
