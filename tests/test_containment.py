"""operators/containment.py — directional shingle containment: the
subset-duplication case Jaccard hides, score math, threshold rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.operators.containment import (
    containment_on_pairs,
    lsh_containment_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_subset_pair_full_containment_low_jaccard(spark):
    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(12))
    docs = _docs(spark, [(1, short), (2, long)])
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = containment_on_pairs(pairs, docs, "doc_id", "text", 3).collect()[0]
    # every shingle of the short doc appears in the long one
    assert r.c_a_in_b == 1.0
    assert r.c_b_in_a < 0.5  # the direction Jaccard's denominator hides


def test_hand_computed_scores(spark):
    # shingle-2 sets: A = {a b, b c}, B = {b c, c d} → inter = 1
    docs = _docs(spark, [(1, "a b c"), (2, "b c d")])
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = containment_on_pairs(pairs, docs, "doc_id", "text", 2).collect()[0]
    assert r.c_a_in_b == 0.5 and r.c_b_in_a == 0.5


def test_lsh_path_finds_contained_doc(spark):
    base = " ".join(f"tok{i} val{i} key{i}" for i in range(20))
    rows = [(1, base), (2, base + " extra tail words here now")] + [
        (i, " ".join(f"z{i}_{j} q{i}_{j} r{i}_{j}" for j in range(15)))
        for i in range(3, 10)
    ]
    out = lsh_containment_pairs(
        _docs(spark, rows), "doc_id", "text", threshold=0.6
    ).collect()
    got = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in got
    assert got[(1, 2)].c_a_in_b == 1.0
    # unrelated docs never pair
    assert all(k == (1, 2) for k in got)


def test_threshold_filters_on_larger_direction(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "a b c q")])
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    scored = containment_on_pairs(pairs, docs, "doc_id", "text", 2)
    # shingle-2: A={ab,bc,cd}, B={ab,bc,cq} → inter=2, c=2/3 each side
    kept = scored.filter(
        F.greatest("c_a_in_b", "c_b_in_a") >= F.lit(0.6)
    ).count()
    assert kept == 1
    kept_high = scored.filter(
        F.greatest("c_a_in_b", "c_b_in_a") >= F.lit(0.7)
    ).count()
    assert kept_high == 0
