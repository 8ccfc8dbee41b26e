"""Johnson-Lindenstrauss random projection for embedding columns.

Dimensionality reduction as a PRE-step for the ANN family
(operators/similarity.py): project ``array<float>`` vectors onto a
deterministic ±1 sign matrix (Achlioptas 2003's database-friendly JL
variant — no Gaussians, exact integer signs, so the projection is
reproducible across engines and across runs with no RNG state). At
100 TB the point is the plan shape: the projection is a PURE
PROJECTION — one ``transform`` over a literal sign matrix per row,
zero exchange, zero UDF — so it pipelines into whatever scan feeds it
and cuts every downstream shuffle/score byte count by in_dim/out_dim.

Determinism contract (driver value-hash): the sign of cell (j, i) is
bit 0 of splitmix64(seed, j, i) — pure integer arithmetic, identical
in any engine that re-implements the three-line mixer. The projected
value divides the ±1 dot by sqrt(out_dim) spelled as ONE exact double
literal in both engine texts (repr(math.sqrt(out_dim))), and the dot
is a sequential left fold exactly like similarity.dot, which is
bit-equal to DuckDB's ``list_reduce(list_transform(...), +)``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.similarity import dot

_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return (z ^ (z >> 31)) & _M64


def jl_sign_rows(
    in_dim: int, out_dim: int, seed: int = 0
) -> list[list[float]]:
    """out_dim rows of in_dim deterministic ±1.0 signs."""
    return [
        [
            1.0
            if _splitmix64((seed << 40) ^ (j << 20) ^ i) & 1
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_scale(out_dim: int) -> float:
    """The single normalization constant (exact double both engines
    must spell identically: ``repr(jl_scale(out_dim))``)."""
    return math.sqrt(out_dim)


def jl_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    seed: int = 0,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Append ``out_col``: array<double> of length out_dim.

    Vectors must have exactly ``in_dim`` elements (zip_with against the
    literal sign row null-pads shorter vectors and the fold then
    poisons to NULL — by design loud, not silently truncated).
    Zero exchange: each output element is a sequential-fold dot of the
    row's vector with one literal sign row, divided by sqrt(out_dim).
    """
    rows = jl_sign_rows(in_dim, out_dim, seed)
    scale = F.lit(jl_scale(out_dim))
    vec = F.col(vec_col)

    def _component(row: list[float]) -> Column:
        signs = F.array(*[F.lit(v) for v in row])
        return dot(vec, signs) / scale

    return df.withColumn(out_col, F.array(*[_component(r) for r in rows]))


def jl_project_long(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ndigits: int = 6,
) -> DataFrame:
    """Long form for audits/oracles: (id, j, p) with p rounded.

    ``+ 0.0`` after the round collapses IEEE negative zero (a dot in
    (-5e-7, 0) rounds to -0.0 under C semantics but +0.0 under Java's
    HALF_UP BigDecimal — the one engine divergence left after the
    bit-equal fold; the oracle spells the same ``+ 0.0``).
    """
    proj = jl_project(df, in_dim, out_dim, seed, vec_col=vec_col)
    return proj.select(
        F.col(id_col),
        F.posexplode("proj").alias("j", "__p"),
    ).select(
        id_col,
        "j",
        (F.round(F.col("__p"), ndigits) + F.lit(0.0)).alias("p"),
    )
