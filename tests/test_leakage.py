"""operators/leakage.py — leakage-safe splits keep near-dup clusters
on one side of every split boundary; the audit quantifies violations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.curation import train_val_test_split
from metar_pipeline_spark.operators.leakage import (
    leakage_safe_split,
    split_leakage_audit,
)


@pytest.fixture()
def corpus(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # near-dup clusters: chains {0..4}, {10,11}, star {20,21,22,23},
    # and a long transitive chain {100..109}
    edges = (
        [(i, i + 1) for i in range(0, 4)]
        + [(10, 11)]
        + [(20, 21), (20, 22), (20, 23)]
        + [(i, i + 1) for i in range(100, 109)]
    )
    pairs = spark.createDataFrame(edges, "a long, b long")
    return docs, pairs


def test_clusters_never_straddle(spark, corpus):
    docs, pairs = corpus
    assigned = leakage_safe_split(docs, pairs)
    # every component maps to exactly one split
    per_comp = (
        assigned.groupBy("component_id")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k").alias("mx"))
        .collect()[0]
    )
    assert per_comp.mx == 1
    audit = split_leakage_audit(assigned, pairs)
    off = audit.filter(F.col("split_a") != F.col("split_b")).collect()
    assert off == []
    # all pairs accounted for on the diagonal
    total = audit.agg(F.sum("n_pairs").alias("s")).collect()[0].s
    assert total == 17


def test_naive_split_leaks_and_audit_sees_it(spark, corpus):
    docs, pairs = corpus
    naive = train_val_test_split(docs)
    audit = split_leakage_audit(naive, pairs)
    rows = {(r.split_a, r.split_b): r.n_pairs for r in audit.collect()}
    # the per-doc hash split scatters the 10-doc chain across splits —
    # the audit must report at least one straddling pair
    assert any(a != b for (a, b) in rows)
    assert sum(rows.values()) == 17


def test_singletons_match_plain_split(spark):
    # no pairs at all → cluster split degrades to the per-doc split
    docs = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    )
    empty = spark.createDataFrame([], "a long, b long")
    safe = leakage_safe_split(docs, empty)
    plain = train_val_test_split(docs, id_col="doc_id")
    diff = (
        safe.select("doc_id", "split")
        .exceptAll(plain.select("doc_id", "split"))
        .count()
    )
    assert diff == 0
    # and every doc is its own component
    assert (
        safe.filter(F.col("component_id") != F.col("doc_id")).count() == 0
    )


def test_partitioning_invariance(spark, corpus):
    docs, pairs = corpus
    a = leakage_safe_split(docs, pairs).select("doc_id", "split")
    b = leakage_safe_split(
        docs.repartition(13), pairs.repartition(3)
    ).select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_fractions_roughly_hold(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    empty = spark.createDataFrame([], "a long, b long")
    got = {
        r.split: r.n
        for r in leakage_safe_split(docs, empty)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert 0.7 < got["train"] / 2000 < 0.9
    assert 0.05 < got["val"] / 2000 < 0.15
    assert 0.05 < got["test"] / 2000 < 0.15
