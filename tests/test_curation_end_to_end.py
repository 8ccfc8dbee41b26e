"""End-to-end curation composition over real testdata: intra-document
cleanup → near-dup pair generation → leakage-safe split → contamination
audit. Proves the round's operators compose — the whole point of a
pipeline engine — and that the leakage guarantee holds on REAL near-dup
structure (the sf0.001 documents table has 28 MinHash-LSH pairs), not
just hand-built fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.dedup import minhash_lsh_dedup_pairs
from metar_pipeline_spark.operators.intradoc import dedup_paragraphs
from metar_pipeline_spark.operators.leakage import (
    leakage_safe_split,
    split_leakage_audit,
)

SF = "/root/testdata/sf0.001"


def test_curation_flow_on_documents(spark):
    docs = load_table(spark, SF, "documents")
    n_docs = docs.count()

    # 1. intra-document cleanup: lossless on this corpus (single-
    #    paragraph rows), and the frame keeps its grain and columns
    cleaned = dedup_paragraphs(docs)
    assert cleaned.count() == n_docs
    assert cleaned.agg(F.sum("n_dropped")).collect()[0][0] == 0
    assert set(docs.columns) <= set(cleaned.columns)

    # 2. near-dup pairs on the cleaned text (the generator any
    #    split-guard composes with)
    pairs = minhash_lsh_dedup_pairs(
        cleaned.select("doc_id", "text"), "doc_id", "text"
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    assert n_pairs > 0  # the testdata really contains near-dups

    # 3. cluster-grain split: every doc assigned exactly once
    assigned = leakage_safe_split(
        cleaned, pairs, src_col="id_a", dst_col="id_b"
    ).localCheckpoint(eager=True)
    assert assigned.count() == n_docs
    assert (
        assigned.groupBy("component_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )

    # 4. the audit proves zero contamination across split boundaries
    audit = split_leakage_audit(
        assigned, pairs, src_col="id_a", dst_col="id_b"
    )
    assert (
        audit.filter(F.col("split_a") != F.col("split_b")).count() == 0
    )
    assert (
        audit.agg(F.sum("n_pairs")).collect()[0][0] == n_pairs
    )

    # 5. and the split still covers all three partitions at this size
    assert assigned.select("split").distinct().count() == 3
