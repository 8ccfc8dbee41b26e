"""Round-8 PCA queries — the gate-verifiable eigensolve loop.

``pca_top_component_projection`` closes the loop the round-7 staged
work opened: ``embedding_gram_matrix`` verified the distributed Gram
aggregation, but the eigensolve behind ``pca_fit``/``pca_project``
was driver-side numpy — real, tested in pytest, yet invisible to the
external oracle. Power iteration IS SQL-expressible (matvec = join +
hash agg over the d²-grain Gram frame), so this query runs the whole
chain — Gram → top eigenvector → corpus projection — with a DuckDB
oracle that unrolls every iteration as CTEs (the pagerank recipe:
DECIMAL(38,18) matvec partials, 12-decimal per-step rounding, IEEE
sqrt for the norm).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.pca import gram_cells, power_iteration_top
from metar_pipeline_spark.operators.similarity import dot
from metar_pipeline_spark.queries import register

_ITERS = 8

_GRAM_CTE = """
    gc AS (
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
    gf AS (
      SELECT i, j, g FROM gc
      UNION ALL
      SELECT j AS i, i AS j, g FROM gc WHERE i <> j
    ),
    v0 AS (SELECT DISTINCT i, CAST(0.125 AS DOUBLE) AS v FROM gf)"""


def _pca_oracle(iters: int = _ITERS) -> str:
    steps = []
    for t in range(1, iters + 1):
        steps.append(
            f"""
    w{t} AS (
      SELECT gf.i,
             round(CAST(SUM(CAST(gf.g * v.v AS DECIMAL(38,18)))
                        AS DOUBLE), 12) AS w
      FROM gf JOIN v{t - 1} v ON gf.j = v.i
      GROUP BY gf.i
    ),
    n{t} AS (
      SELECT sqrt(CAST(SUM(CAST(w * w AS DECIMAL(38,18))) AS DOUBLE))
               AS nrm
      FROM w{t}
    ),
    v{t} AS (
      SELECT i, round(w / nrm, 12) AS v FROM w{t} CROSS JOIN n{t}
    )"""
        )
    return (
        "\n    WITH"
        + _GRAM_CTE
        + ","
        + ",".join(steps)
        + f""",
    vl AS (SELECT list(v ORDER BY i) AS vl FROM v{iters})
    SELECT vec_id,
           round(list_reduce(
                   list_transform(generate_series(1, len(embedding)),
                                  k -> embedding[k]::DOUBLE * vl.vl[k]),
                   (x, y) -> x + y), 6) + 0.0 AS pc1_score
    FROM embeddings CROSS JOIN vl"""
    )


@register(
    "pca_top_component_projection",
    _pca_oracle(),
    doc=(
        f"PCA via {_ITERS}-step power iteration: exact-DECIMAL Gram agg "
        "(one corpus pass, shuffle bounded at d² × tasks), d²-grain "
        "matvec+normalize loop (localCheckpoint per step), then a "
        "zero-exchange projection of every embedding onto the top "
        "component (broadcast 1-row eigenvector, sequential-fold dot) — "
        "operators/pca.power_iteration_top"
    ),
)
def pca_top_component_projection(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cells = gram_cells(emb, "embedding", 64).select(
        "i", "j", (F.round("g", 6) + F.lit(0.0)).alias("g")
    )
    v = power_iteration_top(cells, 64, iters=_ITERS)
    v_arr = v.agg(
        F.array_sort(F.collect_list(F.struct("i", "v"))).alias("s")
    ).select(F.expr("transform(s, x -> x.v)").alias("vl"))
    return emb.crossJoin(F.broadcast(v_arr)).select(
        "vec_id",
        (
            F.round(dot(F.col("embedding"), F.col("vl")), 6) + F.lit(0.0)
        ).alias("pc1_score"),
    )
