"""operators/pca.py — Gram matrix exactness and partition invariance,
eigenbasis properties, numpy agreement, zero-exchange projection."""

from __future__ import annotations

import random

import numpy as np

from metar_pipeline_spark.operators.pca import (
    gram_matrix,
    pca_fit,
    pca_project,
)


def _vecs(spark, rows, parts=1):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)],
        "id long, embedding array<double>",
    )
    return df.repartition(parts) if parts > 1 else df


def _rand(n, d, seed=0):
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(d)] for _ in range(n)]


def test_gram_matches_numpy_and_partition_invariant(spark):
    X = _rand(80, 6, seed=1)
    g1 = gram_matrix(_vecs(spark, X, 3), "embedding", 6)
    g2 = gram_matrix(_vecs(spark, X, 13), "embedding", 6)
    want = np.array(X).T @ np.array(X)
    assert np.allclose(np.array(g1), want, atol=1e-8)
    assert g1 == g2  # DECIMAL accumulation: exact, not just close


def test_centered_gram_is_scatter_matrix(spark):
    X = _rand(60, 4, seed=2)
    g = gram_matrix(_vecs(spark, X, 5), "embedding", 4, center=True)
    Xc = np.array(X) - np.array(X).mean(axis=0)
    assert np.allclose(np.array(g), Xc.T @ Xc, atol=1e-6)


def test_fit_matches_numpy_pca(spark):
    X = _rand(100, 8, seed=3)
    comps, vals = pca_fit(_vecs(spark, X, 7), "embedding", 8, k=3)
    want_vals, want_vecs = np.linalg.eigh(np.array(X).T @ np.array(X))
    order = np.argsort(want_vals)[::-1][:3]
    assert np.allclose(vals, want_vals[order], atol=1e-6)
    for row, idx in zip(comps, order):
        v = want_vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        assert np.allclose(row, v, atol=1e-6)
    # eigenvalues descending, components unit-norm and orthogonal
    assert vals == sorted(vals, reverse=True)
    C = np.array(comps)
    assert np.allclose(C @ C.T, np.eye(3), atol=1e-9)


def test_projection_zero_exchange_and_values(spark):
    X = _rand(40, 6, seed=4)
    df = _vecs(spark, X)
    comps, _ = pca_fit(df, "embedding", 6, k=2)
    out = pca_project(df, comps)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r.id: r.proj for r in out.collect()}
    C = np.array(comps)
    for i, v in enumerate(X):
        assert np.allclose(got[i], C @ np.array(v), atol=1e-9)


def test_reconstruction_improves_with_k(spark):
    X = _rand(120, 8, seed=5)
    df = _vecs(spark, X, 4)
    errs = []
    for k in (2, 4, 8):
        comps, _ = pca_fit(df, "embedding", 8, k=k)
        C = np.array(comps)
        Xn = np.array(X)
        rec = Xn @ C.T @ C
        errs.append(float(((Xn - rec) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 1e-12  # k = d reconstructs exactly


def test_power_iteration_matches_numpy_same_steps(spark):
    """The distributed loop reproduces EXACTLY the same 8 rounded power
    steps computed in numpy (matvec → round 12 → normalize → round 12),
    and its Rayleigh quotient strictly improves over the start vector —
    the gate verifies the iteration, not convergence (the synthetic
    embeddings' spectrum is near-degenerate: λ2/λ1 ≈ 0.93, so full
    convergence would need ~100+ steps; real embedding corpora have a
    dominant direction and converge in the configured handful)."""
    import numpy as np
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.pca import (
        gram_cells,
        power_iteration_top,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cells = gram_cells(emb, "embedding", 64).select(
        "i", "j", (F.round("g", 6) + F.lit(0.0)).alias("g")
    )
    rows = cells.collect()  # bounded-collect: d(d+1)/2 test readback
    G = np.zeros((64, 64))
    for r in rows:
        G[r.i][r.j] = r.g
        G[r.j][r.i] = r.g
    ref = np.full(64, 0.125)
    for _ in range(8):
        w = np.round(G @ ref, 12)
        ref = np.round(w / np.sqrt(float(w @ w)), 12)

    got = power_iteration_top(cells, 64, iters=8).collect()
    v = np.zeros(64)
    for r in got:
        v[r.i] = r.v
    assert np.allclose(v, ref, atol=1e-9)
    v0 = np.full(64, 0.125)
    v0 /= np.linalg.norm(v0)
    rq = lambda x: float(x @ G @ x) / float(x @ x)  # noqa: E731
    assert rq(v) > rq(v0)
    # and it moves toward the dominant eigenvalue
    assert rq(v) > 0.9 * float(np.linalg.eigvalsh(G)[-1])
