"""Unit semantics for connected_components and bucketed_range_join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.dedup import connected_components
from metar_pipeline_spark.operators.joins import bucketed_range_join


def test_connected_components_chain_and_singleton(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["node"])
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 5-6,
    # isolated 7
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (6, 5)], ["src", "dst"]
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_connected_components_merging_stars(spark):
    # two stars bridged by one edge -> single component labeled min id
    star1 = [(10, x) for x in (11, 12, 13)]
    star2 = [(20, x) for x in (21, 22, 23)]
    bridge = [(13, 21)]
    nodes = spark.createDataFrame(
        [(n,) for n in (10, 11, 12, 13, 20, 21, 22, 23)], ["node"]
    )
    edges = spark.createDataFrame(star1 + star2 + bridge, ["src", "dst"])
    got = connected_components(nodes, edges)
    assert {r["component_id"] for r in got.collect()} == {10}


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_bucketed_range_join_half_open_boundaries(spark):
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 05:59:59")),  # before start
            (2, _ts("2024-01-01 06:00:00")),  # == start -> in
            (3, _ts("2024-01-01 11:30:00")),  # mid -> in
            (4, _ts("2024-01-01 18:00:00")),  # == end -> out (half-open)
            (5, _ts("2024-01-02 07:00:00")),  # other interval -> in
        ],
        ["id", "ts"],
    )
    iv = spark.createDataFrame(
        [
            (_ts("2024-01-01 06:00:00"), _ts("2024-01-01 18:00:00")),
            (_ts("2024-01-02 06:00:00"), _ts("2024-01-02 18:00:00")),
        ],
        ["ws", "we"],
    )
    out = bucketed_range_join(events, "ts", iv, "ws", "we", "1 hour")
    assert sorted(r["id"] for r in out.collect()) == [2, 3, 5]


def test_bucketed_range_join_rejects_multi_unit_granularity(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"))], ["id", "ts"])
    with pytest.raises(ValueError):
        bucketed_range_join(df, "ts", df.select(
            F.col("ts").alias("ws"), F.col("ts").alias("we")
        ), "ws", "we", "6 hours")


def test_incremental_dedup_from_persisted_signature_store(spark, tmp_path):
    """Production incremental-dedup path: the corpus band-bucket table
    is persisted once (partitioned by band) and each new batch joins
    against the STORE — verdicts must be identical to the inline form,
    with no corpus signature recomputation in the store path."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.dedup import (
        band_buckets,
        incremental_dedup_verdicts,
        minhash_signature,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    store = str(tmp_path / "sigstore")
    band_buckets(
        minhash_signature(corpus, "doc_id", "text", 12, 3), "doc_id", 6, 2
    ).write.partitionBy("band").mode("overwrite").parquet(store)

    inline = incremental_dedup_verdicts(
        new, corpus, "doc_id", "text",
        num_hashes=12, bands=6, shingle_n=3, threshold=0.5,
    )
    stored = incremental_dedup_verdicts(
        new, corpus, "doc_id", "text",
        num_hashes=12, bands=6, shingle_n=3, threshold=0.5,
        corpus_buckets=spark.read.parquet(store),
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, stored.collect())
    )


def test_incremental_dedup_catches_planted_near_duplicate(spark):
    """Semantic check beyond oracle parity: a new-batch doc that is a
    lightly mutated copy of a corpus doc must be flagged as a duplicate
    of exactly that doc; a clearly novel doc must not be flagged."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.dedup import (
        incremental_dedup_verdicts,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    victim = docs.filter(F.col("doc_id") == 7).first()
    mutated = victim.text + " extra tail token"
    novel = "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii"
    new_batch = spark.createDataFrame(
        [(100001, mutated), (100002, novel)], "doc_id long, text string"
    )
    corpus = docs.select("doc_id", "text")

    verdicts = {
        r.doc_id: r
        for r in incremental_dedup_verdicts(
            new_batch, corpus, "doc_id", "text",
            num_hashes=12, bands=6, shingle_n=3, threshold=0.5,
        ).collect()
    }
    assert verdicts[100001].is_duplicate
    assert verdicts[100001].matched_id == 7
    assert verdicts[100001].jaccard > 0.8
    assert not verdicts[100002].is_duplicate
    assert verdicts[100002].matched_id is None


def test_incremental_dedup_string_ids_and_id_collision(spark):
    """The dedup API is id-type agnostic: string ids must work (the
    best-match tie-break is (jaccard desc, id asc) via row_number, not
    numeric negation), and a new-batch id that COLLIDES with a corpus id
    must never be reported as a duplicate of itself."""
    from metar_pipeline_spark.operators.dedup import (
        incremental_dedup_verdicts,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            ("doc-a", base),
            ("doc-b", base + " lambda"),  # near-dup of doc-a
            ("doc-z", "one two three four five six seven eight nine ten"),
        ],
        "id string, text string",
    )
    new_batch = spark.createDataFrame(
        [
            # same id as a corpus doc AND same text: must match doc-b
            # (or doc-a), never itself
            ("doc-a", base),
            ("doc-new", "totally different words nothing shared here at all"),
        ],
        "id string, text string",
    )
    verdicts = {
        r.id: r
        for r in incremental_dedup_verdicts(
            new_batch, corpus, "id", "text",
            num_hashes=12, bands=6, shingle_n=2, threshold=0.5,
        ).collect()
    }
    assert verdicts["doc-a"].is_duplicate
    assert verdicts["doc-a"].matched_id != "doc-a"
    assert verdicts["doc-a"].matched_id in ("doc-b",)  # ties: id asc
    assert not verdicts["doc-new"].is_duplicate


def test_incremental_dedup_shingles_only_candidates(spark):
    """Scale pin: the verdict plan must semi-join doc TEXT to the
    candidate id set BEFORE shingling. Without it, jaccard_on_pairs
    builds shingle sets for every corpus doc — O(corpus) tokenization
    per ingest cycle instead of O(batch x dup-rate)."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.dedup import (
        incremental_dedup_verdicts,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    new_batch = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") >= 20).select("doc_id", "text")
    verdicts = incremental_dedup_verdicts(
        new_batch, corpus, "doc_id", "text",
        num_hashes=12, bands=6, shingle_n=3, threshold=0.5,
    )
    plan = verdicts._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan


def test_label_propagation_separates_disjoint_triangles(spark):
    """Two disjoint triangles converge to two communities labeled by
    their min node; a one-edge bridge still leaves the left triangle
    uniformly labeled after 2 synchronous rounds (communities are
    finer than connected components, which would merge everything)."""
    from metar_pipeline_spark.operators.graph import label_propagation

    tri = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    df = spark.createDataFrame(tri, ["id_a", "id_b"])
    out = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=3).collect()
    }
    assert {out[1], out[2], out[3]} == {1}
    assert {out[4], out[5], out[6]} == {4}

    bridged = spark.createDataFrame(tri + [(3, 4)], ["id_a", "id_b"])
    out2 = {
        r["node"]: r["label"]
        for r in label_propagation(bridged, iterations=2).collect()
    }
    assert len({out2[1], out2[2], out2[3]}) == 1  # left stays uniform
    # determinism: a rerun is bit-identical
    out3 = {
        r["node"]: r["label"]
        for r in label_propagation(bridged, iterations=2).collect()
    }
    assert out2 == out3


def test_bfs_min_hops_chain_and_early_exit(spark):
    """BFS on a directed chain 1→2→3→4 seeded at 1: first-visit hop is
    the minimum hop; max_hops truncates; an exhausted frontier exits
    early (disconnected node 9 never appears); a revisit through a
    back-edge never lowers or duplicates a hop."""
    from metar_pipeline_spark.operators.graph import bfs_min_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 1)],  # back-edge 2->1
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.hop
        for r in bfs_min_hops(edges, seeds, max_hops=2).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}
    full = {
        r.node: r.hop
        for r in bfs_min_hops(edges, seeds, max_hops=10).collect()
    }
    assert full == {1: 0, 2: 1, 3: 2, 4: 3}  # early exit after level 3


def test_bellman_ford_hand_graph(spark):
    """Weighted relaxation on a hand graph: the 2-hop cheap route
    (1→2→4, cost 3) beats the 1-hop expensive edge (1→4, cost 10)
    once rounds >= 2; rounds=1 still reports the direct edge."""
    from metar_pipeline_spark.operators.paths import bellman_ford_min_cost

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 4, 2.0), (1, 4, 10.0), (4, 5, 1.0)],
        "src long, dst long, w double",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    one = {
        r.node: r.cost
        for r in bellman_ford_min_cost(edges, seeds, rounds=1).collect()
    }
    assert one == {1: 0.0, 2: 1.0, 4: 10.0}
    three = {
        r.node: r.cost
        for r in bellman_ford_min_cost(edges, seeds, rounds=3).collect()
    }
    assert three == {1: 0.0, 2: 1.0, 4: 3.0, 5: 4.0}


def test_bellman_ford_pred_hand_graph_and_tiebreak(spark):
    """Predecessor carry: the winning route's upstream neighbor is
    reported per node, and a COST TIE resolves to the SMALLEST pred id
    (lexicographic min(struct(cost, pred))) — pinned on a graph where
    node 4 is reachable at identical cost 3.0 via 2 and via 3."""
    from metar_pipeline_spark.operators.paths import (
        bellman_ford_min_cost_pred,
    )

    edges = spark.createDataFrame(
        [
            (1, 2, 1.0),
            (1, 3, 1.0),
            (2, 4, 2.0),  # 1→2→4 = 3.0
            (3, 4, 2.0),  # 1→3→4 = 3.0 (tie) → pred must be 2
            (4, 5, 1.0),
        ],
        "src long, dst long, w double",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: (r.cost, r.pred)
        for r in bellman_ford_min_cost_pred(edges, seeds, rounds=3).collect()
    }
    assert got == {
        1: (0.0, 1),  # seed: self-pred
        2: (1.0, 1),
        3: (1.0, 1),
        4: (3.0, 2),  # tie broken to smaller pred
        5: (4.0, 4),
    }


def test_bellman_ford_pred_costs_match_min_cost_form(spark):
    """The argmin carry must not change the cost fixpoint."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.paths import (
        bellman_ford_min_cost,
        bellman_ford_min_cost_pred,
    )

    edges = (
        spark.range(0, 300)
        .select(
            (F.col("id") % 23).alias("src"),
            (F.col("id") * 7 % 19 + 23).alias("dst"),
            ((F.col("id") % 5) + 0.5).alias("w"),
        )
        .distinct()
    )
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    plain = sorted(
        (r.node, r.cost)
        for r in bellman_ford_min_cost(edges, seeds, rounds=3).collect()
    )
    withp = sorted(
        (r.node, r.cost)
        for r in bellman_ford_min_cost_pred(edges, seeds, rounds=3).collect()
    )
    assert plain == withp


def test_kcore_cascade_hand_graph(spark):
    """Peeling CASCADES: E (deg 1) falls in round 1, which drops D to
    deg 1 so it falls in round 2 — the 2-core is exactly the triangle,
    every survivor at degree 2."""
    from metar_pipeline_spark.operators.kcore import k_core

    und = [(1, 2), (2, 3), (1, 3), (1, 4), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        r.node: r.degree for r in k_core(edges, k=2, rounds=3).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    # one round is NOT enough: D survives the first peel
    partial = {
        r.node: r.degree for r in k_core(edges, k=2, rounds=1).collect()
    }
    assert 4 in partial and 5 not in partial


def _cc_store(spark, rows):
    return spark.createDataFrame(rows, "node long, component_id long")


def test_incremental_components_merge_relabel_and_untouched(spark):
    """Hand graph: comps {1,2}, {5}, {7,8}. Batch: node 0 bridges into
    {1,2} (and 0 is the NEW global min — the whole component must
    relabel to 0), node 11 joins {5} (label survives), node 10 is an
    isolated singleton. {7,8} is untouched and must emit NOTHING."""
    from metar_pipeline_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    labels = _cc_store(spark, [(1, 1), (2, 1), (5, 5), (7, 7), (8, 7)])
    new_nodes = spark.createDataFrame([(0,), (10,), (11,)], "node long")
    new_edges = spark.createDataFrame(
        [(0, 2), (11, 5)], "src long, dst long"
    )
    delta, relabel = incremental_components(labels, new_nodes, new_edges)
    got = sorted(
        (r.node, r.component_id, r.is_new) for r in delta.collect()
    )
    assert got == [
        (0, 0, True),
        (1, 0, False),
        (2, 0, False),
        (10, 10, True),
        (11, 5, True),
    ]
    assert sorted(
        (r.old_label, r.component_id) for r in relabel.collect()
    ) == [(1, 0), (5, 5)]
    # applying the delta to the store reproduces the full recompute
    applied = labels.join(delta.select("node"), "node", "anti").unionByName(
        delta.select("node", "component_id")
    )
    all_nodes = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 5, 7, 8, 10, 11)], "node long"
    )
    all_edges = spark.createDataFrame(
        [(1, 2), (7, 8), (0, 2), (11, 5)], "src long, dst long"
    )
    truth = sorted(
        (r.node, r.component_id)
        for r in connected_components(all_nodes, all_edges).collect()
    )
    assert sorted(map(tuple, applied.collect())) == truth


def test_incremental_components_two_cycles_preserve_invariant(spark):
    """The min-id label invariant survives chained incremental cycles
    (cycle 2 consumes cycle 1's applied store), including a batch edge
    that bridges TWO existing components through a new node."""
    from metar_pipeline_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    store = _cc_store(spark, [(3, 3), (4, 3), (6, 6), (9, 9)])
    batches = [
        # cycle 1: node 2 joins {3,4} -> relabels to 2
        ([(2,)], [(2, 4)]),
        # cycle 2: node 5 bridges {2,3,4} and {6} -> all relabel to 2
        ([(5,)], [(5, 3), (5, 6)]),
    ]
    all_nodes = [(3,), (4,), (6,), (9,)]
    all_edges = [(3, 4)]
    for nodes, edges in batches:
        nn = spark.createDataFrame(nodes, "node long")
        ne = spark.createDataFrame(edges, "src long, dst long")
        delta, _ = incremental_components(store, nn, ne)
        store = (
            store.join(delta.select("node"), "node", "anti")
            .unionByName(delta.select("node", "component_id"))
            .localCheckpoint(eager=True)
        )
        all_nodes += nodes
        all_edges += edges
    truth = sorted(
        (r.node, r.component_id)
        for r in connected_components(
            spark.createDataFrame(all_nodes, "node long"),
            spark.createDataFrame(all_edges, "src long, dst long"),
        ).collect()
    )
    assert sorted(map(tuple, store.collect())) == truth
    lbls = {r.node: r.component_id for r in store.collect()}
    assert lbls[6] == 2 and lbls[9] == 9


def test_incremental_components_batch_work_is_affected_bounded(spark, tmp_path):
    """Scale pin (round-10 VERDICT #1 'done' criterion): with a store
    of many components and a batch touching ONE, (a) the delta emits
    only the affected component's members + the batch, and (b) the
    final delta plan reads the store through BroadcastHashJoin only —
    no store-wide shuffle (SortMergeJoin) anywhere."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.dedup import incremental_components

    p = str(tmp_path / "labels")
    # 200 two-node components: (2i, 2i+1) labeled 2i
    spark.range(200).select(
        F.explode(
            F.array(F.col("id") * 2, F.col("id") * 2 + 1)
        ).alias("node"),
        (F.col("id") * 2).alias("component_id"),
    ).write.parquet(p)
    labels = spark.read.parquet(p)
    new_nodes = spark.createDataFrame([(100000,)], "node long")
    new_edges = spark.createDataFrame(
        [(100000, 7)], "src long, dst long"
    )  # touches only component 6 = {6, 7}
    delta, relabel = incremental_components(labels, new_nodes, new_edges)
    # label 6 is already the component minimum, so the old members do
    # NOT re-emit — the delta is exactly the batch node (minimality),
    # and the touched component still appears in relabel (identity row)
    assert sorted(
        (r.node, r.component_id) for r in delta.collect()
    ) == [(100000, 6)]
    assert [
        (r.old_label, r.component_id) for r in relabel.collect()
    ] == [(6, 6)]
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_incremental_canonical_update_merged_champion(spark):
    """Merged component's survivor = associative max over old
    champions + new members (longest key, then smallest id)."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.dedup import (
        incremental_canonical_update,
    )

    champs = spark.createDataFrame(
        [(1, 2, 20), (5, 5, 50), (7, 8, 80)],
        "component_id long, kept_id long, kept_key long",
    )
    relabel = spark.createDataFrame(
        [(1, 0), (5, 5)], "old_label long, component_id long"
    )
    new_members = spark.createDataFrame(
        [(0, 0, 5), (5, 11, 300), (10, 10, 100)],
        "component_id long, kept_id long, kept_key long",
    )
    got = sorted(
        map(
            tuple,
            incremental_canonical_update(
                champs, relabel, new_members
            ).collect(),
        )
    )
    # comp 0: old champ (2, 20) beats new member (0, 5); comp 5: new
    # member (11, 300) beats (5, 50); comp 10: new singleton. comp 7
    # untouched -> absent.
    assert got == [(0, 2, 20), (5, 11, 300), (10, 10, 100)]


def test_incremental_components_custom_label_col(spark):
    """Round-11 ADVICE: label_col must forward through the inner
    connected_components call — a non-default name previously hit an
    AnalysisException in the relabel selects."""
    from metar_pipeline_spark.operators.dedup import incremental_components

    labels = spark.createDataFrame(
        [(1, 1), (2, 1)], "node long, cluster long"
    )
    new_nodes = spark.createDataFrame([(0,)], "node long")
    new_edges = spark.createDataFrame([(0, 2)], "src long, dst long")
    delta, relabel = incremental_components(
        labels, new_nodes, new_edges, label_col="cluster"
    )
    assert sorted(
        (r.node, r.cluster, r.is_new) for r in delta.collect()
    ) == [(0, 0, True), (1, 0, False), (2, 0, False)]
    assert sorted(
        (r.old_label, r.cluster) for r in relabel.collect()
    ) == [(1, 0)]


def _lpa_assembled(spark, old_edges, delta_edges, k):
    """old labels outside the write set ∪ incremental delta."""
    from metar_pipeline_spark.operators.graph import (
        incremental_lpa,
        label_propagation,
    )

    all_edges = old_edges.unionByName(delta_edges)
    old = label_propagation(old_edges, iterations=k)
    delta = incremental_lpa(all_edges, delta_edges, iterations=k)
    keep = old.join(delta.select("node"), "node", "anti")
    return keep.unionByName(delta), delta


def test_incremental_lpa_equals_full_recompute_hand_chain(spark):
    """Chain 1-2-3-4-5-6-7-8 plus batch edge (4,5) joining the halves:
    the k=2 write set is exactly B_2({4,5}) = {2..7}, endpoints 1 and 8
    keep their stored labels, and the assembled state is bit-equal to
    the full recompute."""
    from metar_pipeline_spark.operators.graph import label_propagation

    old = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (7, 8)],
        "id_a long, id_b long",
    )
    delta = spark.createDataFrame([(4, 5)], "id_a long, id_b long")
    assembled, dz = _lpa_assembled(spark, old, delta, k=2)
    full = label_propagation(old.unionByName(delta), iterations=2)
    assert sorted(map(tuple, assembled.collect())) == sorted(
        map(tuple, full.collect())
    )
    assert sorted(r.node for r in dz.collect()) == [2, 3, 4, 5, 6, 7]


def test_incremental_lpa_law_on_pseudo_random_graph(spark):
    """200-node deterministic pseudo-random graph, 10% of edges arrive
    as the batch (plus brand-new nodes 200..204 chained in): assembled
    incremental state ≡ full recompute at k=2, and the write set stays
    a strict subset of the corpus."""
    from metar_pipeline_spark.operators.graph import label_propagation

    pairs = []
    for i in range(300):
        u, v = (i * 7919) % 200, (i * 104729 + 13) % 200
        if u != v:
            pairs.append((min(u, v), max(u, v)))
    pairs = sorted(set(pairs))
    old = spark.createDataFrame(
        [p for i, p in enumerate(pairs) if i % 10 != 0],
        "id_a long, id_b long",
    )
    delta_rows = [p for i, p in enumerate(pairs) if i % 10 == 0]
    delta_rows += [(200, 201), (201, 202), (202, 0), (203, 204)]
    delta = spark.createDataFrame(delta_rows, "id_a long, id_b long")
    assembled, dz = _lpa_assembled(spark, old, delta, k=2)
    full = label_propagation(old.unionByName(delta), iterations=2)
    assert sorted(map(tuple, assembled.collect())) == sorted(
        map(tuple, full.collect())
    )
    n_delta = dz.count()
    assert 0 < n_delta < full.count()  # bounded write set
    # brand-new nodes are always in the write set
    got_nodes = {r.node for r in dz.collect()}
    assert {200, 201, 202, 203, 204} <= got_nodes


def test_incremental_triangle_counts_law(spark):
    """Additions-only triangle maintenance ≡ full per-node recompute,
    including triangles with 2 and 3 new edges (the canonical-triple
    dedup): K4 grown edge by edge, plus a batch forming a brand-new
    triangle among ONLY new edges."""
    from metar_pipeline_spark.operators.graph import (
        incremental_triangle_counts,
        node_triangle_counts,
    )

    # old graph: path 1-2-3-4 plus edge 1-3 (one triangle {1,2,3})
    old = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "id_a long, id_b long"
    )
    # batch: 1-4 and 2-4 (completes K4 — new triangles {1,3,4} [1 new
    # edge], {2,3,4} [1 new], {1,2,4} [2 new edges]) plus a disjoint
    # all-new triangle {10,11,12} (3 new edges)
    delta = spark.createDataFrame(
        [(1, 4), (2, 4), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    all_edges = old.unionByName(delta)
    old_counts = {
        r.node: r.n_triangles for r in node_triangle_counts(old).collect()
    }
    dz = {
        r.node: r.d_triangles
        for r in incremental_triangle_counts(all_edges, delta).collect()
    }
    merged = {
        n: old_counts.get(n, 0) + dz.get(n, 0)
        for n in set(old_counts) | set(dz)
    }
    truth = {
        r.node: r.n_triangles
        for r in node_triangle_counts(all_edges).collect()
    }
    assert merged == truth
    # K4: every node in 3 triangles; the standalone triangle: 1 each
    assert truth == {1: 3, 2: 3, 3: 3, 4: 3, 10: 1, 11: 1, 12: 1}
    # node 3 gained exactly the 2 new triangles through it
    assert dz[3] == 2 and 3 in old_counts
