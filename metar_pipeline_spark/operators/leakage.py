"""Leakage-safe train/val/test splitting — near-duplicate clusters
never straddle a split boundary.

A plain per-document hash split (curation.train_val_test_split) leaks:
two near-copies of one document can land in train AND test, and the
eval score silently measures memorization. The fix is standard in
large-scale LM data work (the dedup literature's motivation — Lee et
al. 2021 §6 measure exactly this effect): assign splits at the
NEAR-DUP-CLUSTER grain, so every member of a cluster rides together.

Spark shape: the near-dup pair list (LSH/SimHash/winnowing output —
whatever pair generator the pipeline already ran) collapses to
clusters via :func:`dedup.connected_components` (hash-min label
propagation, O(diameter) rounds); each document's split is then the
SAME multiplicative-hash rule ``train_val_test_split`` uses, applied
to its ``component_id`` instead of its own id. Singletons (docs in no
pair) keep their own id as component, so a pair-free corpus degrades
to exactly the plain split. One equi-join on the doc key beyond the
CC cost; nothing new shuffles at corpus width.

Determinism: identical to the plain split's contract — the assignment
depends only on ids, never on partitioning, cluster size, or rerun
(``rand(seed)`` is partition-dependent; the integer hash is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.dedup import connected_components


def _hash_unit(col) -> F.Column:
    # the multiplicative integer hash train_val_test_split uses —
    # shared (one implementation) so cluster-grain and doc-grain splits
    # are comparable. Component ids here are min-node labels, so at
    # 100 TB they inherit the full 64-bit doc-id range — the shared
    # helper's overflow-safe reduction (curation.hash_unit_01) is what
    # keeps u in [0, 1) for ids ≥ 2^33 (the naive multiply wrapped
    # negative and sent every such cluster to "train").
    from metar_pipeline_spark.operators.curation import hash_unit_01

    return hash_unit_01(col)


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "a",
    dst_col: str = "b",
    fractions: tuple[float, float] = (0.8, 0.1),
) -> DataFrame:
    """Assign train/val/test at near-dup-cluster grain.

    ``pairs``: the near-duplicate edge list (any generator: LSH,
    SimHash, winnowing). Returns ``docs`` plus ``component_id`` and
    ``split``; every document of one component carries one split.
    Remainder after (train, val) fractions → test.
    """
    nodes = docs.select(F.col(id_col).alias("node"))
    comp = connected_components(
        nodes,
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")),
        node_col="node",
        src_col="src",
        dst_col="dst",
    )
    u = _hash_unit(F.col("component_id"))
    train_f, val_f = fractions
    split = (
        F.when(u < F.lit(train_f), F.lit("train"))
        .when(u < F.lit(train_f + val_f), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.join(comp, docs[id_col] == comp["node"])
        .drop("node")
        .withColumn("split", split)
    )


def split_leakage_audit(
    assigned: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "a",
    dst_col: str = "b",
    split_col: str = "split",
) -> DataFrame:
    """Count near-dup pairs that straddle split boundaries.

    The audit you run against ANY split assignment (including one made
    before the near-dup pass existed): joins the pair list to the
    assignment on both endpoints and reports, per (split_a, split_b)
    combination with split_a <= split_b, the number of pairs. A
    leakage-safe split shows zero off-diagonal rows; a naive
    per-document split shows train/test rows — the quantified
    contamination. Two narrow equi-joins on the doc key; the pair list
    is the small side by construction (dup-rate × corpus).
    """
    a = assigned.select(
        F.col(id_col).alias("__ida"), F.col(split_col).alias("__sa")
    )
    b = assigned.select(
        F.col(id_col).alias("__idb"), F.col(split_col).alias("__sb")
    )
    return (
        pairs.join(a, pairs[src_col] == a["__ida"])
        .join(b, pairs[dst_col] == b["__idb"])
        .select(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count("*").alias("n_pairs"))
    )
