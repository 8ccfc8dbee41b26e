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


def test_hash_unit_overflow_safe_for_huge_ids(spark):
    """Ids ≥ 2^33 (the 100-TB doc-id range; component ids inherit it)
    must still map into [0, 1) — the naive `id * 2654435761` wrapped
    negative in non-ANSI Spark and sent every such cluster to 'train'.
    For ids < 2^32 the overflow-safe form is bit-identical to the
    naive formula (what the registered oracles spell in SQL)."""
    from metar_pipeline_spark.operators.curation import hash_unit_01

    small = list(range(0, 2000, 7)) + [2**31 - 1]
    # the naive multiply already overflows at id ≈ 2^31.8; everything
    # from there up is the regression range
    huge = [2**32 - 1, 2**33 + 1, 2**40 + 123, 2**52 + 5, 2**62 + 17]
    # under this session's ANSI mode the naive multiply THROWS on huge
    # ids (non-ANSI clusters wrap negative instead) — either way the
    # operator must not use it; compare against naive on small ids only
    sm = spark.createDataFrame([(i,) for i in small], "id long")
    got = sm.select(
        "id",
        hash_unit_01(F.col("id")).alias("u"),
        (
            ((F.col("id") * F.lit(2654435761)) % F.lit(4294967296)
             + F.lit(0.5)) / F.lit(4294967296.0)
        ).alias("naive"),
    ).collect()
    for r in got:
        assert r.u == r.naive, r.id
        assert 0.0 < r.u < 1.0
    hg = spark.createDataFrame([(i,) for i in huge], "id long")
    by_id = {
        r.id: r.u for r in hg.select("id", hash_unit_01(F.col("id")).alias("u")).collect()
    }
    for i in huge:
        assert 0.0 < by_id[i] < 1.0, (i, by_id[i])
        # true mathematical value, engine-independent
        expect = ((i * 2654435761) % 4294967296 + 0.5) / 4294967296.0
        assert abs(by_id[i] - expect) < 1e-12, i

    # a split over huge-id docs lands a MIX of splits, never all-train
    docs = spark.createDataFrame(
        [(2**33 + i,) for i in range(500)], "doc_id long"
    )
    empty = spark.createDataFrame([], "a long, b long")
    splits = {
        r.split
        for r in leakage_safe_split(docs, empty).select("split").distinct().collect()
    }
    assert splits == {"train", "val", "test"}
