"""Personalized PageRank (seed-set expansion).

PageRank's teleport jumps uniformly; PPR teleports to a SEED SET, so
mass concentrates around the seeds and the stationary ranks answer
"which nodes are most related to this trusted set" — the seed-based
domain-expansion primitive of corpus curation (grow a trusted-source
whitelist over a link graph) and the relatedness score behind
graph-based recommenders (Haveliwala 2002, topic-sensitive PageRank).

r'(v) = (1-d)·tele(v) + d·(Σ_{u→v} r(u)/deg(u) + dangling·tele(v)),
tele(v) = 1/|S| for seeds, 0 elsewhere — dangling mass also returns
to the seeds (the standard PPR convention, keeping Σr = 1).

Scale shape: identical to operators/graph.pagerank — the edge list is
deduped + checkpointed ONCE; the node dim carries (deg, tele) from
day one so each iteration is ONE edges⋈ranks equi-join + hash agg,
a one-row dangling aggregate crossed back, and a node-grain left
join; per-step 12-decimal rounding of DECIMAL(38,18) sums makes every
iteration bit-equal on any engine/partitioning (the pagerank
determinism recipe). Citation (reference repo): the reference has no
graph ops — this extends the engine's link-analysis family
(pagerank/HITS/BFS/Bellman-Ford/k-core/k-truss) with the seeded
variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iterations`` synchronous PPR steps with
    teleport (and dangling redistribution) onto ``seeds``."""
    edges = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seedset = seeds.select(
        F.col(seed_col).alias("node")
    ).distinct()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ns = seedset.agg(F.count(F.lit(1)).alias("__ns"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        # isolated seeds (no incident edges) must still participate:
        # they hold teleport share 1/|S| and are dangling (deg NULL),
        # so their mass returns to the seed set and Σr stays 1. Without
        # this union a no-edge seed was silently dropped while still
        # counted in |S| — its teleport share leaked (round-10 ADVICE).
        .union(seedset)
        .distinct()
        .join(
            outdeg.select(F.col("src").alias("node"), "deg"),
            "node",
            "left",
        )
        .join(seedset.withColumn("__is_seed", F.lit(True)), "node", "left")
        .crossJoin(F.broadcast(ns))
        .withColumn(
            "tele",
            F.when(
                F.col("__is_seed"),
                F.lit(1.0) / F.col("__ns").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .select("node", "deg", "tele")
        .localCheckpoint(eager=True)
    )
    r = nodes.select("node", "deg", "tele", F.col("tele").alias("r"))
    dec = "decimal(38,18)"
    for _ in range(iterations):
        contrib = (
            edges.join(r, edges.src == r.node)
            .groupBy(F.col("dst").alias("cnode"))
            .agg(
                F.sum((F.col("r") / F.col("deg")).cast(dec))
                .cast("double")
                .alias("c")
            )
        )
        dang = r.filter(F.col("deg").isNull()).agg(
            F.coalesce(
                F.sum(F.col("r").cast(dec)).cast("double"), F.lit(0.0)
            ).alias("dang")
        )
        r = (
            nodes.join(contrib, nodes.node == contrib.cnode, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "deg",
                "tele",
                F.round(
                    F.lit(1.0 - damping) * F.col("tele")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dang") * F.col("tele")
                    ),
                    12,
                ).alias("r"),
            )
        )
    return r.select("node", F.col("r").alias("rank"))
