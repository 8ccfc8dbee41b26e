"""Iterative graph ranking (PageRank).

Companion to the hash-min connected components in operators/dedup.py
(:322) — the other canonical iterative graph primitive a curation
pipeline needs (rank hosts/domains by link mass before sampling).

Scale shape per iteration (the only shape that survives 100 TB):
- contributions: edges ⋈ ranks is ONE equi-join shuffled on the node
  id, followed by a partial+final hash aggregate on dst — no
  all-pairs, no driver state;
- out-degrees are a node-grain dim (≪ edges) joined broadcast;
- the dangling mass is a one-row aggregate crossed back in broadcast —
  never a driver round-trip;
- lineage is cut per iteration with localCheckpoint (same pattern as
  dedup.connected_components and similarity.kmeans_refine), so k
  iterations stay k jobs, not a 2^k plan.

Determinism (the oracle contract): per-iteration sums accumulate in
DECIMAL(38,18) (partition-order-free), and each iteration's rank is
rounded to 12 decimals so the NEXT iteration starts from bit-identical
doubles on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC18 = "decimal(38,18)"


def pagerank_prep(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    pre_deduped: bool = False,
) -> "tuple[DataFrame, DataFrame, int]":
    """Materialize the (edges, nodes, n) trio the pagerank iteration
    consumes — the operator's eager prefix, exposed so a caller running
    SEVERAL pagerank calls can overlap independent preps/chains from a
    driver pool (guide §2.6: pagerank_warm_start_delta's warm-graph
    prep is data-independent of the old-graph chain evaluation —
    measured ~2.2 s each at sf0.1, serialized before this seam existed).
    Results are unchanged by construction: these are the exact frames
    (same expressions, same checkpoints) the inline path builds."""
    from pyspark.sql import Observation

    from metar_pipeline_spark.operators.fanout import fan_out

    dedup = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not pre_deduped:
        dedup = dedup.distinct()
    # (Round 13: pre-hash-partitioning the checkpointed frame by src to
    # share the per-iteration join exchange was tried and REJECTED — a
    # PySpark localCheckpoint's LogicalRDD does not preserve output
    # partitioning, so EnsureRequirements re-shuffled the edges every
    # iteration anyway and the extra up-front repartition+materialize
    # cost ~+3 s on pagerank_warm_start_delta. Round 14 re-tested with
    # .repartition(P, "src").persist() — InMemoryRelation DOES preserve
    # the partitioning, but warm A/B read 5.7-5.8 s vs 5.2-6.0 s for
    # the checkpoint+fan_out form: the saved per-iteration edge
    # exchange is offset by the persist materialization, a wash. Plan
    # inspected both ways; keeping the simpler checkpoint form.)
    edges = fan_out(dedup.localCheckpoint(eager=True))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Scalar node count rides the checkpoint materialization as an
    # observed metric (same fusion as dedup.connected_components) — no
    # separate count job, and still an aggregated single number, not a
    # data collect.
    obs = Observation()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        # no broadcast hint: outdeg is O(nodes) — at graph scale it is
        # NOT broadcastable, and this one-time shuffle join amortizes
        # over all iterations (AQE still broadcasts it when small)
        .join(
            outdeg.select(F.col("src").alias("node"), "deg"),
            "node",
            "left",
        )
        .withColumn("dangling", F.col("deg").isNull())
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    return edges, nodes, obs.get["n"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    ckpt_every: int = 4,
    init_ranks: "DataFrame | None" = None,
    pre_deduped: bool = False,
    prep: "tuple[DataFrame, DataFrame, int] | None" = None,
) -> DataFrame:
    """Rank nodes of a directed graph: ``iterations`` synchronous
    PageRank steps with uniform dangling-mass redistribution.

    r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + dangling/N),
    rounded to 12 decimals per step. Returns (node, rank).

    ``ckpt_every`` sets the lineage-cut cadence: an eager
    localCheckpoint costs a full materialization per cut (measured
    2.6x wall-time for 3 iterations when cutting EVERY step), so short
    runs coast on lineage and long runs cut every few steps before the
    plan compounds.

    ``init_ranks``: optional (node, rank) WARM START — the IVM spirit
    applied to the fixpoint family: after an edge delta, seed the
    iteration with the previous converged ranks instead of uniform
    1/N. Convergence is geometric in the damping factor from wherever
    the start vector is, and a post-delta fixpoint is near the old one
    when the delta is small, so the same accuracy needs fewer
    iterations (the classic incremental-PageRank observation —
    Langville & Meyer 2006, ch. 10 "Updating"). Nodes absent from
    ``init_ranks`` (new in the delta) start at 1/N; seeds are rounded
    to 12 decimals so a warm chain is bit-replayable cross-engine.
    Σr0 may differ slightly from 1 — the iteration contracts the total
    toward 1 geometrically, no renormalization pass needed.
    """
    # Materialize the deduped edge list ONCE: every iteration joins it
    # and derives outdeg/dangling from it, so without the checkpoint
    # the upstream scan+distinct shuffle would replay ~2x per
    # iteration (measured 3x wall-time at sf0.1). fan_out AFTER the
    # checkpoint (probing a materialized RDD's partition count is free;
    # probing a pre-execution AQE plan would run its stages): AQE
    # coalesces the small-byte distinct shuffle to ONE partition, which
    # would serialize every iteration's join + DECIMAL matvec map side
    # on a single core (measured ~1.9 s/iteration in one task at
    # sf0.1); at scale the edge set exceeds the floor and fan_out is a
    # no-op.
    # ``pre_deduped=True``: the caller guarantees (src, dst) rows are
    # already distinct (e.g. a shared flagged-edge aggregate feeding
    # several pagerank calls) — skip the distinct shuffle, keep the
    # materialization.
    # Node dim carries (deg, dangling) from day one: the per-iteration
    # dangling mass is then a FILTER + one-row aggregate over ranks —
    # no anti-join shuffle inside the loop (one less exchange per
    # iteration; bit-identical ranks, verified against the join form).
    # ``prep``: a precomputed pagerank_prep(...) trio — pass it when
    # overlapping several pagerank calls from a driver pool (§2.6).
    if prep is None:
        prep = pagerank_prep(
            edges, src=src, dst=dst, pre_deduped=pre_deduped
        )
    edges, nodes, n = prep
    if n == 0:
        return nodes.select(
            F.col("node"), F.lit(None).cast("double").alias("rank")
        )
    if init_ranks is None:
        ranks = nodes.withColumn("r", F.lit(1.0 / n))
    else:
        ir = init_ranks.select(
            F.col("node"), F.col("rank").alias("__r0")
        )
        # node-grain ⋈ node-grain: one shuffle before the loop (AQE
        # broadcasts when the seed frame is small); absent nodes (new
        # in the delta) start uniform.
        ranks = (
            nodes.join(ir, "node", "left")
            .withColumn(
                "r",
                F.coalesce(F.round("__r0", 12), F.lit(1.0 / n)),
            )
            .drop("__r0")
        )
    for i in range(iterations):
        # SHUFFLE_HASH on the rank side (guide §3.1, chosen
        # deliberately): the rank frame is NODE-grain — always the
        # small side of the edges⋈ranks join, but its lazy
        # join+crossJoin lineage makes Catalyst OVERestimate it and
        # broadcast the EDGE side instead (measured: a 591k-row
        # broadcast build serializing ~1.8 s per iteration at sf0.1;
        # 8.6 → 4.4 s after the hint). A shuffled hash join moves only
        # the node-grain rows, builds per-partition hash tables of the
        # provably smaller side, and never sorts the edge corpus — the
        # right strategy at every scale. (No broadcast hint: node dim
        # is NOT broadcastable at graph scale.)
        contribs = (
            edges.join(
                ranks.filter(~F.col("dangling"))
                .select(F.col("node").alias("src"), "r", "deg")
                .hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum((F.col("r") / F.col("deg")).cast(DEC18))
                .cast("double")
                .alias("c")
            )
        )
        dangling = (
            ranks.filter(F.col("dangling"))
            .agg(F.sum(F.col("r").cast(DEC18)).cast("double").alias("dang"))
            .select(F.coalesce("dang", F.lit(0.0)).alias("dang"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "deg",
                "dangling",
                F.round(
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n))
                    ),
                    12,
                ).alias("r"),
            )
        )
        if (i + 1) % ckpt_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank"))


def triangle_census(
    edges: DataFrame, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """Undirected-graph triangle census: one row with node / edge /
    triangle counts and the global transitivity 3·T / wedges.

    Input edges must carry each undirected edge once; rows are
    canonicalized to a < b and deduped defensively. Each triangle
    a<b<c is counted exactly once via the ordered two-hop join
    (e1: a-b, e2: b-c, closing edge e3: a-c) — the standard
    distributed formulation: two equi-joins on node ids, no
    enumeration of non-edges. Wedge counts come from the degree
    table (Σ deg·(deg-1)/2), so transitivity needs no extra pass
    over paths.

    At 100 TB the join cost is Σ_v deg(v)² over MIDDLE vertices —
    for skew-heavy graphs, pre-drop super-nodes or use
    degree-ordering (orient edges low-degree → high-degree) before
    calling; for the near-dup graphs this repo feeds it, components
    are blocking-bounded so deg is naturally capped.
    """
    lo, hi = F.least(F.col(a), F.col(b)), F.greatest(F.col(a), F.col(b))
    e = (
        edges.select(lo.alias("a"), hi.alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by degree + both joins
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nodes_wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum((F.col("c") * (F.col("c") - 1) / 2).cast("bigint")).alias(
            "_wedges"
        ),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            e.alias("e3"),
            (F.col("e1.a") == F.col("e3.a"))
            & (F.col("e2.b") == F.col("e3.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        nodes_wedges.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(
                F.when(
                    F.col("_wedges") > 0,
                    F.lit(3.0)
                    * F.col("n_triangles")
                    / F.col("_wedges"),
                ),
                6,
            ).alias("transitivity"),
        )
    )


def label_propagation(
    edges: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    iterations: int = 2,
) -> DataFrame:
    """Synchronous label propagation (community detection) over an
    undirected edge list: every node starts as its own label; each
    round, a node adopts the most frequent label among its neighbors
    (ties -> smallest label; isolated behavior n/a — every node here
    has >= 1 edge). Deterministic by construction, so a fixed
    ``iterations`` unrolls to an exact SQL oracle.

    Scale shape per round (same budget class as pagerank:32): ONE
    equi-join of the symmetrized edge list against the label table,
    then a two-level hash aggregate — (node, label) counts with
    map-side combine, then a max_by argmax per node. No windows over
    the edge set, no driver state; lineage cut per round with
    localCheckpoint. Communities differ from connected components
    (dedup.connected_components): LPA splits weakly-joined clusters
    that CC merges — the right grain when near-dup "bridges" chain
    unrelated groups.
    """
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionAll(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(iterations):
        neigh = (
            sym.join(
                labels.withColumnRenamed("node", "dst"), "dst"
            )
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # min_by over (-count, label): argmax count, then SMALLEST
        # label — negating the count (always numeric) instead of the
        # label keeps the tie-break valid for string labels too (the
        # id-type-agnostic form ADVICE r3 asked of the dedup tie-break)
        labels = (
            neigh.groupBy("node")
            .agg(
                F.min_by(
                    F.col("label"), F.struct(-F.col("c"), F.col("label"))
                ).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels


def bfs_min_hops(
    edges: DataFrame, seeds: DataFrame, max_hops: int
) -> DataFrame:
    """Breadth-first minimum hop distance from a seed set — the
    frontier-expansion shape beside the fixpoint family (pagerank /
    label_propagation iterate values to convergence; BFS grows a
    visited set level by level).

    ``edges``: (src, dst), DIRECTED — pass both directions for an
    undirected graph. ``seeds``: (node,) at hop 0. Returns (node, hop)
    for every node reachable within ``max_hops``; BFS's first-visit
    property IS the minimum hop, so no min-aggregate is ever needed.

    Scale shape: O(max_hops) rounds, each one frontier⋈edges equi-join
    (shuffle keyed on the node id) + distinct + anti-join against the
    visited set; frontier and visited are node-grain frames,
    localCheckpoint-ed per round so lineage stays O(1). Early exit on
    an empty frontier (cheap head(1) off the eager checkpoint) — the
    loop runs min(max_hops, eccentricity) rounds.
    """
    # Materialize the edge set ONCE (same as pagerank): every level
    # re-joins it, and an expensive caller frame (scan + union +
    # distinct) would otherwise be re-evaluated per round — measured
    # 6.8 s → ~4 s at sf0.1 on the supplier↔part graph.
    from functools import reduce

    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    # Visited is APPEND-ONLY (levels are disjoint by the anti-join), so
    # keep one checkpointed PIECE per level and union lazily (round 14,
    # guide §1.2/§5): the old per-level `visited.union(nxt)` checkpoint
    # rewrote the WHOLE visited set every level — O(V·hops) materialized
    # bytes at scale and one extra driver-synced job per level — while
    # the anti-join/return read identical rows from the lazy union of
    # already-materialized pieces.
    level0 = (
        seeds.select(F.col("node"), F.lit(0).cast("int").alias("hop"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pieces = [level0]
    visited_nodes = level0.select("node")
    frontier = level0.select("node")
    for level in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited_nodes, "node", "left_anti")
            .select("node", F.lit(level).cast("int").alias("hop"))
            .localCheckpoint(eager=True)
        )
        if not nxt.head(1):
            break
        pieces.append(nxt)
        visited_nodes = visited_nodes.unionByName(nxt.select("node"))
        frontier = nxt.select("node")
    return reduce(lambda a, b: a.unionByName(b), pieces)


def incremental_lpa(
    all_edges: DataFrame,
    delta_edges: DataFrame,
    iterations: int = 2,
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """Incremental label-propagation maintenance under EDGE ADDITIONS —
    the community-grain sibling of ``dedup.incremental_components``
    (round-11 VERDICT #4): a batch of new near-dup edges must not
    re-run LPA over the whole corpus graph.

    Exactness argument (why a bounded recompute can be bit-equal to the
    full one): :func:`label_propagation` starts every node at its OWN
    id, so a node's k-round label is a pure function of the STRUCTURE
    of its k-hop ball — no persisted state enters the iteration. Adding
    edges Δ (endpoints = "seeds") can therefore change final labels
    only inside B_k(seeds) (any node farther than k from every seed has
    an identical k-ball before and after — additions only create paths
    through seeds). And to recompute B_k(seeds) exactly it suffices to
    run k rounds on the subgraph induced by B_2k(seeds): by the
    standard light-cone induction, round-t labels are correct for every
    node of hop ≤ 2k−t (all its neighbors live in the ball), so round k
    is correct precisely on B_k — which is all we keep.

    Inputs: ``all_edges`` = the POST-batch edge set (old ∪ Δ),
    ``delta_edges`` = Δ. Returns ``(node, label)`` for exactly the
    nodes of B_k(seeds) — the maintenance WRITE set; every other stored
    label is provably unchanged (and is never read here: the caller
    upserts the delta, the store itself enters no join at all).

    Scale shape (round-13 ADVICE: NO corpus-grain shuffle anywhere):
    seed discovery is |Δ|-grain; the 2k-hop ball grows by probing the
    RAW (asymmetric) edge table on BOTH endpoint columns with a
    broadcast frontier — symmetrization of the whole corpus (a
    corpus-wide unionAll+distinct+checkpoint) never happens. Each
    round is therefore a pruned SCAN of the edge table (broadcast
    semi-grain joins, zero shuffle; a by-node bucketed/partitioned
    layout prunes the scan itself); the only distincts and the only
    symmetrized edge set are BALL-grain — the induced subgraph the
    k LPA rounds then run on. Per-batch shuffle work is
    affected-subgraph-bounded; corpus cost is O(2k) pruned scans.

    Caller contract: pass ``all_edges`` as a STORED table or a
    checkpointed frame — each BFS round re-probes it, so a lazily
    derived frame (scan+union+filter) would re-evaluate its whole
    lineage per round (the gate query checkpoints its candidate-pair
    frame once; measured 6.2 → 4.9 s at sf0.1 vs the old corpus-wide
    symmetrize+distinct).
    """
    k = int(iterations)
    raw = all_edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    seeds = (
        delta_edges.select(F.col(a).alias("node"))
        .union(delta_edges.select(F.col(b).alias("node")))
        .distinct()
    )
    # Undirected BFS over the raw edge list: per round the broadcast
    # frontier probes src and dst separately (two broadcast equi-joins
    # against the scan — the checkpointed frontier has no stats, so
    # the broadcast hint is explicit per the round-12 pitfall).
    # Same append-only piece-union as bfs_min_hops (round 14): the ball
    # grows level by level, so checkpoint each level once and union
    # lazily instead of rewriting the whole visited set per level.
    from functools import reduce

    level0 = (
        seeds.select("node", F.lit(0).cast("int").alias("hop"))
        .localCheckpoint(eager=True)
    )
    pieces = [level0]
    visited_nodes = level0.select("node")
    frontier = level0.select("node")
    for level in range(1, 2 * k + 1):
        fb = F.broadcast(frontier)
        nxt = (
            raw.join(fb.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .unionAll(
                raw.join(fb.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"))
            )
            .distinct()  # frontier-neighborhood grain
            .join(
                F.broadcast(visited_nodes), "node", "left_anti"
            )
            .select("node", F.lit(level).cast("int").alias("hop"))
            .localCheckpoint(eager=True)
        )
        if not nxt.head(1):
            break
        pieces.append(nxt)
        visited_nodes = visited_nodes.unionByName(nxt.select("node"))
        frontier = nxt.select("node")
    ball = reduce(lambda a, b: a.unionByName(b), pieces)
    bn = ball.select("node")
    # Induced subgraph: two broadcast semi-joins of the raw edges
    # against the ball, THEN symmetrize — the unionAll+distinct is
    # ball-grain, never corpus-grain.
    sub_raw = raw.join(
        F.broadcast(bn.withColumnRenamed("node", "src")), "src", "semi"
    ).join(F.broadcast(bn.withColumnRenamed("node", "dst")), "dst", "semi")
    sub = (
        sub_raw.unionAll(
            sub_raw.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)  # ball-grain; feeds k LPA rounds
    )
    sub_labels = label_propagation(
        sub, a="src", b="dst", iterations=k
    )
    inner = ball.filter(F.col("hop") <= k).select("node")
    return sub_labels.join(F.broadcast(inner), "node", "semi")


def node_triangle_counts(
    edges: DataFrame, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """(node, n_triangles) for every node in ≥1 triangle — the per-node
    grain of :func:`triangle_census` (local clustering, dedup-cluster
    density audits). Same ordered two-hop enumeration (each triangle
    a<b<c found once), then one narrow explode of the 3-node triple and
    a node-grain hash aggregate."""
    lo, hi = F.least(F.col(a), F.col(b)), F.greatest(F.col(a), F.col(b))
    e = (
        edges.select(lo.alias("a"), hi.alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by both joins
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            e.alias("e3"),
            (F.col("e1.a") == F.col("e3.a"))
            & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    return (
        tri.select(
            F.explode(F.array("x", "y", "z")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def incremental_triangle_counts(
    all_edges: DataFrame,
    delta_edges: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """Maintain PER-NODE triangle counts under EDGE ADDITIONS — the
    third member of the incremental graph family (components:
    ``dedup.incremental_components``; communities:
    :func:`incremental_lpa`; now the density statistic).

    Exactness: every triangle GAINED by the batch contains at least one
    Δ edge, so enumerate exactly those — for each Δ edge (u, v), every
    common neighbor w in the POST-batch graph closes {u, v, w}. A
    triangle with 2 or 3 new edges is discovered by each of them; the
    canonical SORTED TRIPLE + distinct collapses it to one row, so the
    count is exact relationally (no sequential edge ordering needed).
    Per-node increments are a count over the distinct-triple explode;
    only nodes in a gained triangle are emitted — the store is never
    read here (the caller upserts old + delta).

    Precondition: ``delta_edges`` are genuinely new (disjoint from the
    pre-batch edge set) — the same ingest contract as
    ``incremental_components``. Returns ``(node, d_triangles)``.

    Scale shape (round-13 ADVICE: NO corpus-grain shuffle): the
    adjacency probed for common neighbors is restricted FIRST — the
    raw edge table is semi-joined by the broadcast Δ-endpoint set on
    each endpoint column (pruned scans, zero shuffle), and only that
    Δ-incident slice is symmetrized/distinct-ed (degree-of-Δ grain,
    never corpus grain). Then one explode at gained-triangle grain
    and one node-grain hash agg.
    """
    lo, hi = F.least(F.col(a), F.col(b)), F.greatest(F.col(a), F.col(b))
    d = (
        delta_edges.select(lo.alias("u"), hi.alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)  # Δ-grain; probed 3×
    )
    ends = d.select(F.col("u").alias("n")).union(
        d.select(F.col("v").alias("n"))
    ).distinct()
    raw = all_edges.select(F.col(a).alias("x"), F.col(b).alias("y"))
    adj = (
        raw.join(
            F.broadcast(ends.withColumnRenamed("n", "x")), "x", "semi"
        )
        .select(F.col("x").alias("n"), F.col("y").alias("w"))
        .unionAll(
            raw.join(
                F.broadcast(ends.withColumnRenamed("n", "y")), "y", "semi"
            ).select(F.col("y").alias("n"), F.col("x").alias("w"))
        )
        .distinct()  # Δ-incident adjacency grain
        .localCheckpoint(eager=True)  # probed twice by the Δ joins
    )
    n1 = adj.select(F.col("n").alias("u"), F.col("w"))
    n2 = adj.select(F.col("n").alias("v"), F.col("w"))
    closed = (
        d.join(n1, "u")
        .join(n2, ["v", "w"])
        .filter((F.col("w") != F.col("u")) & (F.col("w") != F.col("v")))
    )
    triples = closed.select(
        F.array_sort(F.array("u", "v", "w")).alias("t")
    ).distinct()
    return (
        triples.select(F.explode("t").alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d_triangles"))
    )
