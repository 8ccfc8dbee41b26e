"""operators/projection.py — JL sign projection: deterministic signs,
numpy parity, zero-exchange plan, JL norm preservation."""

from __future__ import annotations

import math
import random

import numpy as np

from metar_pipeline_spark.operators.projection import (
    jl_project,
    jl_project_long,
    jl_scale,
    jl_sign_rows,
)


def test_sign_rows_deterministic_and_balanced():
    a = jl_sign_rows(64, 8, seed=7)
    b = jl_sign_rows(64, 8, seed=7)
    assert a == b
    assert all(v in (1.0, -1.0) for row in a for v in row)
    # different seed → different matrix
    assert a != jl_sign_rows(64, 8, seed=8)
    # signs roughly balanced (splitmix64 bit 0)
    total = sum(v for row in a for v in row)
    assert abs(total) < 0.3 * 64 * 8


def test_numpy_parity(spark):
    rng = random.Random(3)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(5)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, embedding array<double>"
    )
    out = {
        r.id: r.proj
        for r in jl_project(df, 16, 4, seed=1, out_col="proj").collect()
    }
    R = np.array(jl_sign_rows(16, 4, seed=1))
    for i, v in enumerate(vecs):
        want = R @ np.array(v) / math.sqrt(4)
        got = np.array(out[i])
        assert np.allclose(got, want, atol=1e-9)


def test_zero_exchange_plan(spark):
    df = spark.range(10).select(
        "id",
        *[],
    ).selectExpr("id", "array(1.0d, 2.0d, 3.0d, 4.0d) as embedding")
    plan = (
        jl_project(df, 4, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_long_form_shape_and_rounding(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    rows = jl_project_long(df, 8, 2, seed=0).collect()
    assert sorted(r.j for r in rows) == [0, 1]
    R = jl_sign_rows(8, 2, seed=0)
    for r in rows:
        want = round(sum(R[r.j]) / jl_scale(2), 6)
        assert r.p == want + 0.0


def test_norm_preserved_in_expectation(spark):
    rng = random.Random(11)
    vecs = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(80)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "id long, embedding array<double>",
    )
    out = jl_project(df, 64, 8, seed=5, out_col="p").collect()
    ratios = []
    for r in out:
        v = np.array(vecs[r.id])
        p = np.array(r.p)
        ratios.append(float(p @ p) / float(v @ v))
    # E[ratio] = 1 for the ±1/sqrt(k) JL family; 80 samples, k=8 →
    # the mean concentrates well inside ±25%
    m = sum(ratios) / len(ratios)
    assert 0.75 < m < 1.25
