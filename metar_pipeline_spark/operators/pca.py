"""Distributed PCA for embedding columns (Gram-matrix route).

The QUALITY dimensionality reduction beside the cheap one
(operators/projection.py's JL sign matrix): JL needs no data pass and
preserves distances in expectation; PCA spends one corpus pass to
find the directions that actually carry the variance — the standard
pre-reduction before IVF/PQ when recall matters.

Scale shape (the MLlib RowMatrix.computeGramianMatrix idea expressed
in DataFrame ops): the d×d Gram matrix Σ vvᵀ is a hash aggregate over
per-row (i, j, vᵢ·vⱼ) upper-triangle terms — the explode costs the
honest O(n·d²) Gram arithmetic, while MAP-SIDE partial aggregation
bounds the shuffle at (d² × map tasks) rows regardless of corpus
size. Accumulation is exact DECIMAL, so the Gram matrix — and
therefore the eigenbasis — is partition-invariant. The d×d
eigendecomposition is driver-side numpy (d is the embedding width,
never the corpus), and the projection back over the data is a
ZERO-EXCHANGE pure projection against the literal component matrix,
exactly like jl_project.

Mean-centering is deliberately optional (center=False default): ANN
pipelines usually reduce raw vectors; pass center=True for the
covariance eigenbasis instead (costs one extra tiny agg: the per-dim
DECIMAL mean, broadcast back as literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.similarity import dot

_DEC = "decimal(38,12)"


def gram_cells(
    df: DataFrame, vec_col: str, dim: int, center: bool = False
) -> DataFrame:
    """The aggregated upper-triangle Gram frame: (i, j, g) with
    0-based i ≤ j — d×(d+1)/2 rows total, exact DECIMAL partials cast
    to double once. This is the distributed piece; fitting collects
    it, and the gate query exposes it directly (the Gram agg is
    SQL-expressible even though the eigensolve is not)."""
    vec = F.col(vec_col)
    if center:
        means_rows = (
            df.select(F.posexplode(vec).alias("i", "e"))
            .groupBy("i")
            .agg(
                (
                    F.sum(F.col("e").cast("double").cast(_DEC)).cast(
                        "double"
                    )
                    / F.count("*")
                ).alias("m")
            )
            .collect()  # bounded-collect: d aggregated per-dim means
        )
        mu = [0.0] * dim
        for r in means_rows:
            mu[r.i] = r.m
        vec = F.zip_with(
            vec, F.array(*[F.lit(v) for v in mu]), lambda x, m: x - m
        )
    # Double explode-first, NOT a per-element HOF: posexplode i (carry
    # the bound vector — a cheap attribute), posexplode j, keep the
    # upper triangle, multiply as plain codegen'd column arithmetic
    # (the HOF form — transform + slice per i — ran interpreted and
    # measured 7.7 s warm at sf0.1 vs 5.7 s for this shape). The
    # remaining cost is the Decimal128 aggregation itself (measured:
    # double sum 0.6 s, scaled-long 2.5 s, DECIMAL 5.7 s at sf0.1) —
    # kept deliberately: a double sum is partition-order-dependent
    # (breaks the determinism contract) and a fixed-point long
    # overflows at 100-TB per-cell term counts; DECIMAL(38,12) is the
    # only choice that is exact, reproducible, AND unbounded. The cost
    # is constant-factor CPU on the one corpus pass and parallelizes —
    # PROVIDED the scan is wider than one partition: fan_out spreads a
    # narrow scan across every core before the d² expansion (measured
    # 7.6 s in ONE task at sf0.1 otherwise; no-op at scale), and the
    # projection to just the vector column keeps its exchange minimal.
    # Map-side combine still bounds the shuffle at d² × tasks.
    from metar_pipeline_spark.operators.fanout import fan_out

    staged = fan_out(df.select(vec.alias("__v"))).select(
        F.posexplode("__v").alias("i", "__vi"), F.col("__v")
    )
    pairs = staged.select(
        "i",
        "__vi",
        F.posexplode("__v").alias("j", "__vj"),
    ).filter(F.col("j") >= F.col("i"))
    return pairs.groupBy("i", "j").agg(
        F.sum(
            (
                F.col("__vi").cast("double") * F.col("__vj").cast("double")
            ).cast(_DEC)
        )
        .cast("double")
        .alias("g")
    )


def gram_matrix(
    df: DataFrame, vec_col: str, dim: int, center: bool = False
) -> "list[list[float]]":
    """Collect the exact d×d Gram (or covariance, center=True) matrix.

    Only the d×(d+1)/2 aggregated upper-triangle rows are collected —
    never data rows.
    """
    # bounded-collect: d*(d+1)/2 aggregated cells (embedding width²,
    # config-bounded, never data rows) — the driver-side eigensolve
    # needs the matrix, exactly like MLlib computeGramianMatrix
    cells = gram_cells(
        df, vec_col, dim, center=center
    ).collect()  # bounded-collect: dim-grain
    G = [[0.0] * dim for _ in range(dim)]
    for r in cells:
        G[r.i][r.j] = r.g
        G[r.j][r.i] = r.g
    return G


def pca_fit(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    center: bool = False,
) -> "tuple[list[list[float]], list[float]]":
    """Top-k principal directions of the (optionally centered) Gram.

    Returns (components, eigenvalues): k rows of length dim, ordered
    by eigenvalue descending, each sign-fixed so its largest-magnitude
    entry is positive (eigenvectors are sign-ambiguous; the convention
    makes results reproducible).
    """
    import numpy as np

    G = np.array(gram_matrix(df, vec_col, dim, center=center))
    vals, vecs = np.linalg.eigh(G)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps, [float(vals[i]) for i in order]


def pca_project(
    df: DataFrame,
    components: "list[list[float]]",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Zero-exchange projection onto the fitted components (literal
    matrix, sequential-fold dots — the jl_project plan shape)."""
    vec = F.col(vec_col)
    cols = [
        dot(vec, F.array(*[F.lit(v) for v in row])) for row in components
    ]
    return df.withColumn(out_col, F.array(*cols))


def power_iteration_top(
    cells: DataFrame, dim: int, iters: int = 8
) -> DataFrame:
    """``iters`` steps of POWER ITERATION toward the top principal
    direction, over the aggregated Gram frame — the SQL-expressible
    eigensolver (``pca_fit``'s numpy eigensolve is driver-side and thus
    gate-unverifiable; this one unrolls as CTEs, so the external oracle
    can replay it exactly). Convergence rate is (λ₂/λ₁)^iters — pick
    ``iters`` for the spectrum at hand (a handful suffices when a
    dominant direction exists; the synthetic near-degenerate test
    embeddings would need ~100); the RESULT is deterministic at any
    ``iters``, which is what the gate checks.

    ``cells``: the (i, j, g) upper-triangle Gram frame (use the SAME
    rounding as the caller's oracle — parity depends on both engines
    iterating identical inputs). Returns (i, v): the unit top
    eigenvector after ``iters`` matvec+normalize steps from the exact
    start vector 1/8 (0.125 — exactly representable, so both engines
    start bit-identical; the sign of the result is pinned by the start
    vector, no sign-fix needed).

    Determinism across engines: each matvec accumulates
    ``DECIMAL(38,18)`` partials (order-independent) and rounds to 12
    decimals per step — the pagerank iteration recipe; the norm uses
    IEEE ``sqrt`` (correctly rounded on both engines, unlike ln/exp).
    Scale: every frame in the loop is d- or d²-grain (never corpus);
    the symmetrized Gram is localCheckpoint-ed once and reused. The
    step chain itself is LAZY with strictly linear lineage — the norm
    is a global window over the d-grain matvec result (identical
    DECIMAL(38,18) accumulation, so bit-equal to the old one-row
    aggregate+crossJoin form), which means each step references its
    predecessor exactly once and one downstream action evaluates the
    whole chain once. The old shape (per-step eager localCheckpoint +
    broadcast norm) paid ~8 driver-synchronized jobs per call —
    measured round 13: pca_top2_projection ran 70 jobs, ~0.05 s fixed
    cost each; the markov absorb_power chain documented the same
    lesson. The RETURNED frame is checkpointed once (d-grain), since
    callers (deflation, Rayleigh, output joins) consume it repeatedly.
    """
    from pyspark.sql import Window

    full = cells.select("i", "j", "g").union(
        cells.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("g")
        )
    ).localCheckpoint(eager=True)
    v = full.select("i").distinct().select(
        "i", F.lit(0.125).cast("double").alias("v")
    )
    wall = Window.partitionBy()  # d-grain frame: a global window is fine
    for _ in range(iters):
        w = (
            full.join(
                v.select(F.col("i").alias("j"), "v"), "j"
            )
            .groupBy("i")
            .agg(
                F.round(
                    F.sum(
                        (F.col("g") * F.col("v")).cast("decimal(38,18)")
                    ).cast("double"),
                    12,
                ).alias("w")
            )
        )
        nrm = F.sqrt(
            F.sum(
                (F.col("w") * F.col("w")).cast("decimal(38,18)")
            ).over(wall).cast("double")
        )
        v = w.select("i", F.round(F.col("w") / nrm, 12).alias("v"))
    return v.localCheckpoint(eager=True)


def rayleigh_quotient(cells: DataFrame, v: DataFrame) -> DataFrame:
    """One-row frame ``(lam)``: the Rayleigh quotient vᵀGv of a unit
    vector over the upper-triangle Gram frame — the eigenvalue estimate
    deflation needs. DECIMAL(38,18) accumulation + 12-decimal rounding
    (the power-iteration determinism recipe), so both engines agree
    bit-for-bit. All frames are d²-grain or smaller."""
    full = cells.select("i", "j", "g").union(
        cells.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), F.col("g")
        )
    )
    return (
        full.join(v.select(F.col("i"), F.col("v").alias("__vi")), "i")
        .join(
            v.select(F.col("i").alias("j"), F.col("v").alias("__vj")), "j"
        )
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("g") * F.col("__vi") * F.col("__vj")
                    ).cast("decimal(38,18)")
                ).cast("double"),
                12,
            ).alias("lam")
        )
    )


def deflate_top(
    cells: DataFrame, v: DataFrame, round_to: int = 6
) -> DataFrame:
    """Hotelling deflation over the d²-grain frame: the upper-triangle
    cells of G − λ·vvᵀ, where λ is the Rayleigh quotient of ``v``
    (``rayleigh_quotient``). Plain per-cell arithmetic against the
    broadcast one-row λ — no corpus pass, everything stays at Gram
    grain — so a second ``power_iteration_top`` run on the result
    yields the (deflated) next principal direction, keeping the whole
    top-k eigensolve SQL-expressible/CTE-replayable. ``round_to``
    matches the caller's Gram-cell rounding so both engines iterate
    identical inputs."""
    lam = rayleigh_quotient(cells, v)
    return (
        cells.join(v.select(F.col("i"), F.col("v").alias("__vi")), "i")
        .join(
            v.select(F.col("i").alias("j"), F.col("v").alias("__vj")), "j"
        )
        .crossJoin(F.broadcast(lam))
        .select(
            "i",
            "j",
            (
                F.round(
                    F.col("g")
                    - F.col("lam") * F.col("__vi") * F.col("__vj"),
                    round_to,
                )
                + F.lit(0.0)
            ).alias("g"),
        )
    )
