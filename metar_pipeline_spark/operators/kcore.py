"""Bounded k-core decomposition (degree peeling).

The degeneracy member of the graph family: pagerank/LPA iterate
VALUES, BFS grows a frontier, Bellman-Ford relaxes weighted costs —
this one iteratively REMOVES structure: delete every node of degree
< k, which lowers its neighbors' degrees, and repeat. The fixpoint
(the k-core) is the standard dense-subgraph filter web-scale corpus
curation runs on link graphs (spam farms and boilerplate rings live
in high cores; tendrils and one-off pages peel away).

Scale shape per round: one node-grain degree hash aggregate + two
semi-joins filtering the edge list to surviving endpoints — all
equi-joins keyed on the node id; the edge frame is checkpointed per
round so lineage stays O(1) (the established iterative-operator
recipe). ``rounds`` bounds the peel depth, exactly like the bounded
Bellman-Ford: full decomposition is O(peel depth) rounds, and a
bounded-round core (a superset of the true k-core, exact once the
peel has converged — it always had by round 2 on the test graphs) is
the distributed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Peel nodes of degree < ``k`` for ``rounds`` rounds.

    ``edges``: (src, dst) DIRECTED and deduplicated — pass both
    directions for an undirected graph, so a node's degree is its
    out-degree in this frame. Returns the surviving subgraph's
    (node, degree): nodes still present after the last peel, with
    their degree INSIDE the core (both numbers shrink as neighbors
    peel — the defining property).
    """
    alive = edges.select("src", "dst").localCheckpoint(eager=True)
    for _ in range(rounds):
        keep = (
            alive.groupBy("src")
            .agg(F.count(F.lit(1)).alias("__d"))
            .filter(F.col("__d") >= k)
            .select("src")
        )
        alive = (
            alive.join(keep, "src")
            .join(keep.withColumnRenamed("src", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    return alive.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
