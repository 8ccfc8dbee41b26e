"""operators/linkanalysis.py — integer HITS on a hand-computed
bipartite graph, iteration semantics, input contracts."""

from __future__ import annotations

import pytest

from metar_pipeline_spark.operators.linkanalysis import hits_bipartite


def _edges(spark, rows):
    return spark.createDataFrame(rows, "hub long, auth long")


# Hand graph: hubs {1,2,3}, auths {10, 20}
#   1 -> 10;  2 -> 10, 20;  3 -> 20
# a1 (in-degree):        a(10)=2, a(20)=2
# h1 = sum a over edges: h(1)=2, h(2)=4, h(3)=2
# a2 = sum h1:           a(10)=h1+h2=6, a(20)=h2+h3=6
# h2 = sum a2:           h(1)=6, h(2)=12, h(3)=6
GRAPH = [(1, 10), (2, 10), (2, 20), (3, 20)]


def test_hits_one_round(spark):
    h, a = hits_bipartite(_edges(spark, GRAPH), "hub", "auth", iters=1)
    assert {r.auth: r.score for r in a.collect()} == {10: 2, 20: 2}
    assert {r.hub: r.score for r in h.collect()} == {1: 2, 2: 4, 3: 2}


def test_hits_two_rounds_hand_computed(spark):
    h, a = hits_bipartite(_edges(spark, GRAPH), "hub", "auth", iters=2)
    assert {r.auth: r.score for r in a.collect()} == {10: 6, 20: 6}
    assert {r.hub: r.score for r in h.collect()} == {1: 6, 2: 12, 3: 6}


def test_hits_asymmetric_star(spark):
    # star: every hub points at auth 99; hub 1 also points at 50
    edges = [(i, 99) for i in range(1, 5)] + [(1, 50)]
    h, a = hits_bipartite(_edges(spark, edges), "hub", "auth", iters=2)
    auth = {r.auth: r.score for r in a.collect()}
    hub = {r.hub: r.score for r in h.collect()}
    # a1: 99->4, 50->1; h1: hub1=5, hubs2-4=4
    # a2: 99 = 5+4+4+4 = 17, 50 = 5
    assert auth == {99: 17, 50: 5}
    # h2: hub1 = 17+5 = 22, others = 17
    assert hub == {1: 22, 2: 17, 3: 17, 4: 17}


def test_hits_rejects_zero_iters(spark):
    with pytest.raises(ValueError):
        hits_bipartite(_edges(spark, GRAPH), "hub", "auth", iters=0)


def test_hits_partition_invariance(spark):
    e = _edges(spark, [(i % 7, (i * 3) % 5 + 100) for i in range(60)])
    e = e.distinct()
    h1, a1 = hits_bipartite(e, "hub", "auth", iters=3)
    h2, a2 = hits_bipartite(e.repartition(7), "hub", "auth", iters=3)
    assert sorted(map(tuple, h1.collect())) == sorted(
        map(tuple, h2.collect())
    )
    assert sorted(map(tuple, a1.collect())) == sorted(
        map(tuple, a2.collect())
    )


def test_personalized_pagerank_hand_graph(spark):
    """PPR on a 4-node path a->b->c plus isolated-ish d (a->d):
    teleport and dangling mass return to the single seed a, so rank
    concentrates at/near the seed and follows the numpy power
    iteration with the identical per-step 12-decimal rounding."""
    import numpy as np
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.ppr import personalized_pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(1,)], "node int")
    got = {
        r.node: r.rank
        for r in personalized_pagerank(
            edges, seeds, iterations=3
        ).collect()  # bounded-collect: hand graph
    }
    # numpy twin: nodes 1..4, deg(1)=2, deg(2)=1, 3 and 4 dangling
    tele = np.array([1.0, 0.0, 0.0, 0.0])
    deg = {0: 2, 1: 1}
    r = tele.copy()
    d = 0.85
    for _ in range(3):
        c = np.zeros(4)
        c[1] += r[0] / 2  # 1->2
        c[3] += r[0] / 2  # 1->4
        c[2] += r[1] / 1  # 2->3
        dang = r[2] + r[3]
        r = np.round((1 - d) * tele + d * (c + dang * tele), 12)
    for i in range(4):
        assert got[i + 1] == np.float64(r[i]), (i + 1, got[i + 1], r[i])
    # mass conservation (up to per-step rounding) and seed dominance
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[1] == max(got.values())


def test_personalized_pagerank_isolated_seed_conserves_mass(spark):
    """A seed with NO incident edges (round-10 ADVICE): it must hold
    teleport share 1/|S| as a dangling node, so Σrank stays 1 and
    |S| = 2 is honored — previously the isolated seed was dropped and
    its teleport share leaked (Σrank < 1)."""
    from metar_pipeline_spark.operators.ppr import personalized_pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    seeds = spark.createDataFrame([(1,), (99,)], "node int")  # 99 isolated
    got = {
        r.node: r.rank
        for r in personalized_pagerank(
            edges, seeds, iterations=3
        ).collect()  # bounded-collect: hand graph
    }
    assert 99 in got  # the isolated seed participates
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the isolated seed keeps receiving teleport + dangling mass
    assert got[99] > 0.0


def test_markov_reserved_label_collision_raises(spark):
    """Channel names colliding with the reserved variant/absorber
    labels must fail loudly (round-10 ADVICE): a channel named 'full'
    would silently corrupt every removal effect."""
    import pytest
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.markov import removal_variant_probs

    tcnt = spark.createDataFrame(
        [("START", "a", 3), ("a", "purchase", 2), ("a", "NULL", 1)],
        "src string, dst string, c long",
    )
    with pytest.raises(ValueError, match="reserved"):
        removal_variant_probs(tcnt, ["a", "full"])
    with pytest.raises(ValueError, match="reserved"):
        removal_variant_probs(tcnt, ["a", "NULL"])
    # an OBSERVED state named 'full' is just as corrupting — guarded
    # ENGINE-side (raise_error branch; no driver materialization), so
    # it surfaces as a Spark execution error at the first action
    tbad = spark.createDataFrame(
        [("START", "full", 3), ("full", "purchase", 2)],
        "src string, dst string, c long",
    )
    with pytest.raises(Exception, match="reserved label"):
        removal_variant_probs(tbad, ["a"])


def test_pagerank_warm_start_converges_faster(spark):
    """The warm-start claim, measured: after a 20% edge delta, 2
    iterations FROM THE OLD RANKS land closer (L1) to the converged
    reference than 2 cold iterations from uniform — the quantified
    convergence-distance audit for pagerank_warm_start_delta."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.graph import pagerank

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    src = (F.col("l_suppkey") * 2).alias("src")
    dst = (F.col("l_partkey") * 2 + 1).alias("dst")
    old_e = li.filter(F.col("l_orderkey") % 5 != 0).select(src, dst)
    new_e = li.select(src, dst).localCheckpoint(eager=True)
    r_old = pagerank(old_e, iterations=3).localCheckpoint(eager=True)
    warm = {r.node: r.rank for r in pagerank(
        new_e, iterations=2, init_ranks=r_old).collect()}
    cold = {r.node: r.rank for r in pagerank(
        new_e, iterations=2).collect()}
    ref = {r.node: r.rank for r in pagerank(
        new_e, iterations=10, ckpt_every=3).collect()}
    l1_warm = sum(abs(warm[n] - ref[n]) for n in ref)
    l1_cold = sum(abs(cold[n] - ref[n]) for n in ref)
    assert l1_warm < l1_cold, (l1_warm, l1_cold)
    # and the warm chain is a genuine improvement, not a wash
    assert l1_warm < 0.7 * l1_cold, (l1_warm, l1_cold)
