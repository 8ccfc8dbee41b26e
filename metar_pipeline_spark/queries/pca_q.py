"""PCA queries — the gate-verifiable eigensolve loop (rounds 8-10).

The round-7 staged ``embedding_gram_matrix`` verified the distributed
Gram aggregation, but the eigensolve behind ``pca_fit``/``pca_project``
was driver-side numpy — real, tested in pytest, yet invisible to the
external oracle. Power iteration IS SQL-expressible (matvec = join +
hash agg over the d²-grain Gram frame), so ``pca_top2_projection``
runs the whole chain — Gram → top eigenvector (λ₁ via the Rayleigh
quotient) → Hotelling deflation (G ← G − λ₁·v₁v₁ᵀ as plain d²-grain
arithmetic) → second power iteration → corpus projection onto BOTH
directions — with a DuckDB oracle that unrolls every iteration as
CTEs (the pagerank recipe: DECIMAL(38,18) matvec partials, 12-decimal
per-step rounding, IEEE sqrt for the norm).

Round 10 retired the separate top-1 query (``pca_top_component_
projection``, green r8-r9): its entire chain is the FIRST HALF of the
top-2 query — one registered query now carries the same gate evidence
at half the bench fixed cost (the DECIMAL Gram pass, ~5.7 s at sf0.1,
is the irreducible floor and was being paid twice). Iteration count is
4 everywhere: the gate checks DETERMINISM (same steps on both
engines), not convergence — the synthetic spectrum is near-degenerate
(λ₂/λ₁ ≈ 0.93), so no realistic count converges and extra steps only
buy fixed per-step checkpoint overhead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.pca import (
    deflate_top,
    gram_cells,
    power_iteration_top,
)
from metar_pipeline_spark.operators.similarity import dot
from metar_pipeline_spark.queries import register

_ITERS = 4

_GRAM_CTE = """
    gc AS MATERIALIZED (
      SELECT (p).i - 1 AS i, (p).j - 1 AS j,
             round(CAST(SUM(CAST((p).v AS DECIMAL(38,12))) AS DOUBLE), 6)
               + 0.0 AS g
      FROM (
        SELECT unnest(flatten(list_transform(
                 generate_series(1, len(embedding)), i ->
                   list_transform(generate_series(i, len(embedding)), j ->
                     {'i': i, 'j': j,
                      'v': embedding[i]::DOUBLE * embedding[j]::DOUBLE}))))
               AS p
        FROM embeddings)
      GROUP BY 1, 2
    ),
    gf AS MATERIALIZED (
      SELECT i, j, g FROM gc
      UNION ALL
      SELECT j AS i, i AS j, g FROM gc WHERE i <> j
    ),
    v0 AS (SELECT DISTINCT i, CAST(0.125 AS DOUBLE) AS v FROM gf)"""


def _power_steps(gram: str, vp: str, iters: int) -> str:
    """The unrolled power-iteration CTE chain: ``iters`` rounds of
    matvec (DECIMAL partials, round 12) + IEEE-sqrt normalize, reading
    the symmetric Gram frame ``gram`` and the vector CTEs ``{vp}{t}``."""
    steps = []
    for t in range(1, iters + 1):
        steps.append(
            f"""
    {vp}w{t} AS (
      SELECT g_.i,
             round(CAST(SUM(CAST(g_.g * v.v AS DECIMAL(38,18)))
                        AS DOUBLE), 12) AS w
      FROM {gram} g_ JOIN {vp}{t - 1} v ON g_.j = v.i
      GROUP BY g_.i
    ),
    {vp}n{t} AS (
      SELECT sqrt(CAST(SUM(CAST(w * w AS DECIMAL(38,18))) AS DOUBLE))
               AS nrm
      FROM {vp}w{t}
    ),
    {vp}{t} AS (
      SELECT i, round(w / nrm, 12) AS v FROM {vp}w{t} CROSS JOIN {vp}n{t}
    )"""
        )
    return ",".join(steps)


def _pca2_oracle(iters: int = _ITERS) -> str:
    """Top-2 chain: first power iteration, Rayleigh λ₁, deflated Gram
    (upper triangle, re-symmetrized), second power iteration, then one
    zero-exchange projection onto both directions."""
    return (
        "\n    WITH"
        + _GRAM_CTE
        + ","
        + _power_steps("gf", "v", iters)
        + f""",
    lam AS (
      SELECT round(CAST(SUM(CAST(gf.g * a.v * b.v AS DECIMAL(38,18)))
                        AS DOUBLE), 12) AS lam
      FROM gf JOIN v{iters} a ON gf.i = a.i
              JOIN v{iters} b ON gf.j = b.i
    ),
    gc2 AS MATERIALIZED (
      SELECT c.i, c.j,
             round(c.g - lam.lam * a.v * b.v, 6) + 0.0 AS g
      FROM gc c JOIN v{iters} a ON c.i = a.i
                JOIN v{iters} b ON c.j = b.i
                CROSS JOIN lam
    ),
    gf2 AS MATERIALIZED (
      SELECT i, j, g FROM gc2
      UNION ALL
      SELECT j AS i, i AS j, g FROM gc2 WHERE i <> j
    ),
    u0 AS (SELECT DISTINCT i, CAST(0.125 AS DOUBLE) AS v FROM gf2),"""
        + _power_steps("gf2", "u", iters)
        + f""",
    vl1 AS (SELECT list(v ORDER BY i) AS vl FROM v{iters}),
    vl2 AS (SELECT list(v ORDER BY i) AS vl FROM u{iters})
    SELECT vec_id,
           round(list_reduce(
                   list_transform(generate_series(1, len(embedding)),
                                  k -> embedding[k]::DOUBLE * vl1.vl[k]),
                   (x, y) -> x + y), 6) + 0.0 AS pc1_score,
           round(list_reduce(
                   list_transform(generate_series(1, len(embedding)),
                                  k -> embedding[k]::DOUBLE * vl2.vl[k]),
                   (x, y) -> x + y), 6) + 0.0 AS pc2_score
    FROM embeddings CROSS JOIN vl1 CROSS JOIN vl2"""
    )


def _rounded_cells(emb):
    return gram_cells(emb, "embedding", 64).select(
        "i", "j", (F.round("g", 6) + F.lit(0.0)).alias("g")
    )


def _as_vector_array(v):
    """(i, v) frame → one-row broadcastable array column ``vl``."""
    return v.agg(
        F.array_sort(F.collect_list(F.struct("i", "v"))).alias("s")
    ).select(F.expr("transform(s, x -> x.v)").alias("vl"))


@register(
    "pca_top2_projection",
    _pca2_oracle(),
    doc=(
        "Top-2 PCA via Hotelling deflation, gate-verified end to end: "
        f"{_ITERS}-step power iteration → Rayleigh λ₁ (DECIMAL "
        "accumulation, round 12) → G − λ₁·v₁v₁ᵀ as plain d²-grain "
        "arithmetic against the broadcast one-row λ — no second corpus "
        "pass — → a second power iteration on the deflated Gram → "
        "zero-exchange projection onto both directions. "
        "operators/pca.deflate_top / rayleigh_quotient"
    ),
)
def pca_top2_projection(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # d²-grain; checkpointed because FOUR downstream consumers (the
    # first iteration's symmetrize, the Rayleigh joins, the deflation
    # base) would each replay the corpus Gram pass otherwise.
    cells = _rounded_cells(emb).localCheckpoint(eager=True)
    v1 = power_iteration_top(cells, 64, iters=_ITERS)
    cells2 = deflate_top(cells, v1, round_to=6)
    v2 = power_iteration_top(cells2, 64, iters=_ITERS)
    basis = F.broadcast(
        _as_vector_array(v1).crossJoin(
            _as_vector_array(v2).withColumnRenamed("vl", "vl2")
        )
    )
    return emb.crossJoin(basis).select(
        "vec_id",
        (
            F.round(dot(F.col("embedding"), F.col("vl")), 6) + F.lit(0.0)
        ).alias("pc1_score"),
        (
            F.round(dot(F.col("embedding"), F.col("vl2")), 6) + F.lit(0.0)
        ).alias("pc2_score"),
    )
