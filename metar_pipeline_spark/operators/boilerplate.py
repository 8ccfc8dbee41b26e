"""Corpus-wide boilerplate line removal (CCNet / RefinedWeb stage).

Drops lines whose normalized form appears in at least ``min_docs``
DISTINCT documents — navigation menus, cookie banners, footers: text
that repeats ACROSS pages. The intra-document twin
(operators/intradoc.dedup_paragraphs) removes repeats WITHIN one page;
this operator removes the corpus-frequent lines everywhere, including
their first occurrences.

Scale shape: explode lines → digest → document-frequency hash agg at
the line-digest grain (the only corpus-width shuffle, carrying only a
32-byte digest) → the blacklist frame is BOUNDED by
total_lines / min_docs regardless of corpus size, so the membership
join back is a small-side join AQE can broadcast → per-doc rebuild agg
keyed by the document. No global sort anywhere: reading order is
restored with ``array_sort(collect_list(struct(pos, line)))`` exactly
like intradoc's rebuild.

Semantics (pinned by tests):
- matching is normalized (trim + casefold + inner-whitespace collapse)
  but the REMOVED/KEPT text is the original line, unmodified;
- blank/whitespace-only lines are structure, not content: never
  counted toward document frequency, never removed;
- document frequency is distinct-document count, not occurrence count
  (a line repeated 50× inside ONE page is intradoc's job, not ours);
- a document whose every content line is boilerplate keeps its blank
  lines (if any) or becomes the empty string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Return ``docs`` with corpus-frequent lines removed from
    ``text_col``, plus ``n_lines`` (content lines, pre-removal) and
    ``n_removed``.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode_outer(
            F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
        ).alias("__pos", "__line"),
    )
    is_blank = F.trim(F.col("__line")) == ""
    key = F.sha2(
        F.regexp_replace(F.trim(F.lower(F.col("__line"))), r"\s+", " "),
        256,
    )
    keyed = lines.withColumn(
        "__k", F.when(is_blank, F.lit(None)).otherwise(key)
    )
    # Document frequency at line-digest grain; the blacklist is bounded
    # by total_lines / min_docs — small-side joinable at any scale.
    blacklist = (
        keyed.filter(F.col("__k").isNotNull())
        .select("__k", id_col)
        .distinct()
        .groupBy("__k")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__k")
        .withColumn("__hit", F.lit(1))
    )
    flagged = keyed.join(blacklist, "__k", "left").select(
        id_col,
        "__pos",
        "__line",
        (F.col("__k").isNotNull()).alias("__content"),
        (F.col("__hit") == 1).alias("__rm"),
    )
    rebuilt = (
        flagged.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("__content"), 1).otherwise(0)).alias(
                "n_lines"
            ),
            F.sum(
                F.when(F.col("__content") & F.col("__rm"), 1).otherwise(0)
            ).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.coalesce(F.col("__rm"), F.lit(False)),
                                F.struct(F.col("__pos"), F.col("__line")),
                            )
                        )
                    ),
                    lambda s: s["__line"],
                ),
                sep,
            ).alias("__clean"),
        )
    )
    out_cols = [c for c in docs.columns if c != text_col]
    return docs.join(rebuilt, id_col, "left").select(
        *out_cols,
        F.coalesce(F.col("__clean"), F.lit("")).alias(text_col),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed"),
    )
