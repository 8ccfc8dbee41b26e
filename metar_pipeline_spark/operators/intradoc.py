"""Intra-document deduplication: drop repeated paragraphs within each
document, keeping the first occurrence in reading order.

The CCNet-family preprocessing step (Wenzek et al. 2020 dedup
paragraphs before LM filtering; boilerplate headers/footers and
navigation blocks repeat WITHIN pages as well as across them). The
cross-document near-dup family (operators/dedup.py) treats a document
as atomic; this operator cleans inside it.

Spark shape: split → posexplode → first-occurrence filter via a
window PARTITIONED by (doc, paragraph-digest) — thousands of tiny
partitions, never a global sort — then rebuild with
``array_sort(collect_list(struct(pos, para)))`` so reading order is
restored without any ordered aggregate assumption (collect_list order
is partition-dependent; the sort makes the rebuild deterministic).
Everything is JVM built-ins; the only shuffles are the (doc, digest)
window and the per-doc rebuild agg, both keyed finer than or equal to
the document key.

Matching is normalized (trim + casefold + inner-whitespace collapse):
"Header" and "  header " are the same paragraph; the KEPT text is the
original first occurrence, unmodified. Paragraphs that are empty after
trimming are dropped outright (split artifacts, not content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Return ``docs`` with ``text_col`` paragraph-deduplicated, plus
    ``n_paragraphs`` (non-empty, pre-dedup) and ``n_dropped``.

    Documents whose text is empty or all-blank keep an empty string
    and report (0, 0).
    """
    paras = docs.select(
        F.col(id_col),
        F.posexplode_outer(
            F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
        ).alias("__pos", "__para"),
    ).filter(F.trim(F.col("__para")) != "")
    norm = F.sha2(
        F.regexp_replace(F.trim(F.lower(F.col("__para"))), r"\s+", " "),
        256,
    )
    w = Window.partitionBy(id_col, "__k").orderBy("__pos")
    kept = (
        paras.withColumn("__k", norm)
        .withColumn("__rn", F.row_number().over(w))
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_paragraphs"),
            F.sum(F.when(F.col("__rn") > 1, 1).otherwise(0)).alias(
                "n_dropped"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rn") == 1,
                                F.struct(
                                    F.col("__pos"), F.col("__para")
                                ),
                            )
                        )
                    ),
                    lambda s: s["__para"],
                ),
                sep,
            ).alias("__clean"),
        )
    )
    out_cols = [c for c in docs.columns if c != text_col]
    return (
        docs.join(rebuilt, id_col, "left")
        .select(
            *out_cols,
            F.coalesce(F.col("__clean"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_paragraphs"), F.lit(0)).alias(
                "n_paragraphs"
            ),
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped"),
        )
    )
