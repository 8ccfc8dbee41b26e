"""Bounded k-truss decomposition (triangle-support peeling).

The triangle-strength member of the graph family, one rung above
k-core: where k-core keeps nodes by DEGREE, k-truss keeps an edge
only if it closes >= k-2 triangles inside the surviving subgraph —
the standard hardening step before trusting connected components as
dedup clusters (dedup_connected_components), because CC chains
A~B~C~D into one cluster through single weak edges while a 4-truss
keeps only edges embedded in dense neighborhoods (Cohen 2008,
trusses as cohesive subgraphs). On a near-duplicate graph this is
the fix for chain-collapse: a borderline pair with no common
near-dup neighbor peels away.

Scale shape per round: triangle enumeration as TWO ordered
equi-joins over the canonical a<b edge list (each triangle x<y<z is
produced exactly once — the operators/graph.triangle_census shape),
one union + hash aggregate to per-edge support grain, and one
equi-join filter back onto the edge list; the edge frame is
localCheckpoint-pinned per round so lineage stays O(1). ``rounds``
bounds the peel depth exactly like kcore.k_core / paths.bounded
Bellman-Ford: a bounded-round truss is a superset of the true
k-truss, exact once the peel converges (it converges by round 2 on
every test graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle count of canonical a<b ``edges``.

    Edges that close no triangle get NO row (the caller coalesces
    to 0). Each triangle x<y<z is enumerated once by the ordered
    two-hop join and credits all three of its edges.
    """
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    sides = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
        .unionAll(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
    )
    return sides.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("support")
    )


def k_truss(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Peel edges with triangle support < ``k``-2 for ``rounds``
    rounds over canonical (a, b) a<b deduplicated ``edges``; returns
    the surviving edges with their support INSIDE the final subgraph
    (recomputed after the last peel — both endpoints' other edges may
    have peeled, so the reported support shrinks with the truss).
    """
    alive = edges.select("a", "b").localCheckpoint(eager=True)
    for _ in range(rounds):
        sup = _support(alive)
        alive = (
            alive.join(sup, ["a", "b"])
            .filter(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return alive.join(_support(alive), ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce(F.col("support"), F.lit(0).cast("bigint")).alias(
            "support"
        ),
    )
