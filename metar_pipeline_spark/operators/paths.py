"""Weighted shortest paths: bounded Bellman-Ford relaxation.

The min-plus-semiring member of the graph family — pagerank /
label_propagation iterate VALUES to a fixpoint, bfs_min_hops grows an
unweighted FRONTIER; this relaxes weighted distances:

    dist_{t+1}(v) = min(dist_t(v), min_{(u,v,w)∈E} dist_t(u) + w)

Determinism across engines without DECIMAL machinery: every candidate
path cost is the same left-assoc chain of IEEE additions on both
engines (one `+ w` per round), and MIN over an identical set of
doubles is exact — no accumulation-order dependence exists anywhere.

Scale shape: O(rounds) iterations, each one dist⋈edges equi-join
(shuffle keyed on the node id) + a node-grain MIN hash aggregate;
dist is checkpointed per round so lineage stays O(1). ``rounds``
bounds path length (k-hop cheapest cost), the standard form for
"reachability with budget" questions — full SSSP is rounds =
|V| - 1, which no one runs distributed; bounded-hop is the 100-TB
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bellman_ford_min_cost(
    edges: DataFrame, seeds: DataFrame, rounds: int
) -> DataFrame:
    """Minimum path cost from the seed set within ``rounds`` hops.

    ``edges``: (src, dst, w) DIRECTED, non-negative w (pass both
    directions for undirected). ``seeds``: (node,) at cost 0.0.
    Returns (node, cost) for every node reachable within ``rounds``.
    """
    edges = edges.select("src", "dst", "w").localCheckpoint(eager=True)
    dist = (
        seeds.select(F.col("node"), F.lit(0.0).alias("cost"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(edges, dist["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
    return dist


def bellman_ford_min_cost_pred(
    edges: DataFrame, seeds: DataFrame, rounds: int
) -> DataFrame:
    """:func:`bellman_ford_min_cost` carrying the PREDECESSOR — the
    lineage answer ("through which intermediate does the cheapest
    route run"), reconstructible by walking ``pred`` back to a seed.

    Same join+agg shape per round; the MIN becomes an argmin via a
    lexicographic ``min(struct(cost, pred))`` — the established
    total-order argmax/argmin pattern, so ties on cost resolve to the
    SMALLEST predecessor id identically on every engine and every
    partitioning (MIN over identical (double, long) pairs is exact —
    no accumulation-order dependence).

    Seeds carry ``pred = node`` (self) at cost 0. Returns
    ``(node, cost, pred)``; ``pred`` is the node's upstream neighbor
    on the winning path (itself for seeds that no cheaper path
    reaches).
    """
    edges = edges.select("src", "dst", "w").localCheckpoint(eager=True)
    dist = (
        seeds.select(F.col("node"))
        .distinct()
        .select(
            "node",
            F.lit(0.0).alias("cost"),
            F.col("node").alias("pred"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(edges, dist["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
                F.col("src").alias("pred"),
            )
        )
        best = F.min(F.struct(F.col("cost"), F.col("pred"))).alias("b")
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(best)
            .select("node", F.col("b.cost").alias("cost"), F.col("b.pred").alias("pred"))
            .localCheckpoint(eager=True)
        )
    return dist
