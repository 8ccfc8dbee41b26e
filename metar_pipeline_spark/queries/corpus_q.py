"""Corpus statistics, diff-audit, and funnel queries (round 7b).

Five beyond-reference shapes closing canonical curation/data-eng gaps:
exact-substring duplication (Lee et al. 2021), snapshot diff audit,
ordered event funnels, unigram JS divergence (dataset drift), and PMI
collocation mining. Reference parity note: the reference pipeline
(dbt over METAR observations) has none of these — they extend the
training-data operator family SURVEY.md §2 treats as first-class.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.corpus_ops import (
    duplicated_span_stats,
    pmi_collocations,
    unigram_js_divergence,
)
from metar_pipeline_spark.operators.diffops import diff_summary, snapshot_diff
from metar_pipeline_spark.operators.textops import tokens as _tokens
from metar_pipeline_spark.queries import register

_DUCK_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
)


@register(
    "substring_dup_spans",
    f"""
    WITH tk AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 7),
                                   i -> array_to_string(toks[i:i+7], ' ')))
               AS gram
      FROM tk
    ),
    gc AS (SELECT gram, COUNT(*) AS g_occ FROM grams GROUP BY 1)
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN gc.g_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_grams,
           round(CAST(SUM(CASE WHEN gc.g_occ > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS dup_frac
    FROM grams g JOIN gc USING (gram)
    GROUP BY g.doc_id
    """,
    doc=(
        "Exact-substring duplication profile (word-8-gram form of Lee "
        "et al. 2021): per document, the fraction of k-gram positions "
        "whose gram occurs more than once corpus-wide. One generator "
        "pass, one gram-grain hash agg, one equi-join back — the "
        "shuffle carries only the 8-token gram, never the document"
    ),
)
def substring_dup_spans(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_stats(docs, "doc_id", "text", k=8)


@register(
    "table_snapshot_diff",
    """
    WITH v1 AS (SELECT * FROM customer),
    v2 AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 97 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 89 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 101 = 0
    ),
    d AS (
      SELECT COALESCE(o.c_custkey, n.c_custkey) AS k,
             CASE WHEN o.c_custkey IS NULL THEN 'inserted'
                  WHEN n.c_custkey IS NULL THEN 'deleted'
                  WHEN o.c_name IS DISTINCT FROM n.c_name
                    OR o.c_nationkey IS DISTINCT FROM n.c_nationkey
                    OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
                    OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                    THEN 'updated'
                  ELSE 'unchanged' END AS change_type
      FROM v1 o FULL OUTER JOIN v2 n ON o.c_custkey = n.c_custkey
    )
    SELECT change_type, COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS key_checksum
    FROM d GROUP BY change_type
    """,
    doc=(
        "CDC-style snapshot diff audit: classify every key across two "
        "table versions as inserted/deleted/updated/unchanged via "
        "narrow (key, md5-fingerprint) frames — the audit that checks "
        "a watermark's honesty. The second snapshot is derived "
        "deterministically (drop %89 keys, bump %97 balances, add %101 "
        "keys shifted by 1e6) so both engines diff identical inputs; "
        "the oracle compares columns directly, proving the fingerprint "
        "path classifies exactly like a field-by-field comparison"
    ),
)
def table_snapshot_diff(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    v2 = (
        cust.filter(k % 89 != 0)
        .withColumn(
            "c_acctbal",
            F.when(k % 97 == 0, F.col("c_acctbal") + F.lit(100.0)).otherwise(
                F.col("c_acctbal")
            ),
        )
        .unionByName(
            cust.filter(k % 101 == 0).withColumn(
                "c_custkey", k + F.lit(1000000)
            )
        )
    )
    cols = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    return diff_summary(
        snapshot_diff(cust, v2, "c_custkey", cols), "c_custkey"
    )


@register(
    "event_funnel_conversion",
    """
    WITH fv AS (SELECT user_id, MIN(ts) AS fv FROM events
                WHERE event_type = 'view' GROUP BY 1),
    fc AS (SELECT e.user_id, MIN(e.ts) AS fc
           FROM events e JOIN fv ON e.user_id = fv.user_id
           WHERE e.event_type = 'click' AND e.ts > fv.fv GROUP BY 1),
    fp AS (SELECT e.user_id, MIN(e.ts) AS fp
           FROM events e JOIN fc ON e.user_id = fc.user_id
           WHERE e.event_type = 'purchase' AND e.ts > fc.fc GROUP BY 1)
    SELECT (SELECT COUNT(*) FROM fv) AS n_view_users,
           (SELECT COUNT(*) FROM fc) AS n_click_users,
           (SELECT COUNT(*) FROM fp) AS n_purchase_users,
           round(CAST((SELECT COUNT(*) FROM fc) AS DOUBLE)
                 / (SELECT COUNT(*) FROM fv), 6) AS click_rate,
           round(CAST((SELECT COUNT(*) FROM fp) AS DOUBLE)
                 / (SELECT COUNT(*) FROM fc), 6) AS purchase_rate,
           round(CAST((SELECT COUNT(*) FROM fp) AS DOUBLE)
                 / (SELECT COUNT(*) FROM fv), 6) AS overall_rate
    """,
    doc=(
        "Ordered funnel view→click→purchase with STRICT step ordering "
        "(each step's first event must be later than the previous "
        "step's): three user-grain min-aggregates chained by "
        "equi-joins on the same key — each stage partial-aggregates "
        "map-side and reuses the user_id hash partitioning; no "
        "windows, no per-user event lists"
    ),
)
def event_funnel_conversion(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    fc = (
        ev.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("fv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fc"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("ts") > F.col("fc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    nv = fv.agg(F.count("*").alias("n_view_users"))
    nc = fc.agg(F.count("*").alias("n_click_users"))
    np_ = fp.agg(F.count("*").alias("n_purchase_users"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view_users",
            "n_click_users",
            "n_purchase_users",
            F.round(
                F.col("n_click_users").cast("double")
                / F.col("n_view_users"),
                6,
            ).alias("click_rate"),
            F.round(
                F.col("n_purchase_users").cast("double")
                / F.col("n_click_users"),
                6,
            ).alias("purchase_rate"),
            F.round(
                F.col("n_purchase_users").cast("double")
                / F.col("n_view_users"),
                6,
            ).alias("overall_rate"),
        )
    )


@register(
    "corpus_js_divergence",
    f"""
    WITH w AS (
      SELECT (lang = 'en') AS is_p, unnest({_DUCK_TOKS}) AS w
      FROM documents
    ),
    c AS (SELECT w,
                 SUM(CASE WHEN is_p THEN 1 ELSE 0 END) AS cp,
                 SUM(CASE WHEN is_p THEN 0 ELSE 1 END) AS cq
          FROM w GROUP BY 1),
    t AS (SELECT SUM(cp) AS tp, SUM(cq) AS tq,
                 SUM(CASE WHEN cp > 0 THEN 1 ELSE 0 END) AS vocab_p,
                 SUM(CASE WHEN cq > 0 THEN 1 ELSE 0 END) AS vocab_q
          FROM c),
    pq AS (SELECT cp, cq, tp, tq, vocab_p, vocab_q,
                  CAST(cp AS DOUBLE) / tp AS p,
                  CAST(cq AS DOUBLE) / tq AS q
           FROM c CROSS JOIN t),
    terms AS (
      SELECT tp, tq, vocab_p, vocab_q,
             CASE WHEN cp > 0
                  THEN 0.5 * p * ln(p / ((p + q) / 2.0)) ELSE 0.0 END
           + CASE WHEN cq > 0
                  THEN 0.5 * q * ln(q / ((p + q) / 2.0)) ELSE 0.0 END
               AS term
      FROM pq
    )
    SELECT CAST(MAX(tp) AS BIGINT) AS n_tokens_p,
           CAST(MAX(tq) AS BIGINT) AS n_tokens_q,
           CAST(MAX(vocab_p) AS BIGINT) AS vocab_p,
           CAST(MAX(vocab_q) AS BIGINT) AS vocab_q,
           round(CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DOUBLE), 6)
             AS jsd_nats
    FROM terms
    """,
    doc=(
        "Dataset-drift monitor: Jensen-Shannon divergence between the "
        "unigram distributions of the English and non-English corpus "
        "slices, in nats. One scan+explode, one vocab-grain hash agg, "
        "a one-row totals cross join, DECIMAL-accumulated final sum — "
        "two exchanges regardless of corpus size"
    ),
)
def corpus_js_divergence(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return unigram_js_divergence(docs, F.col("lang") == "en", "text")


@register(
    "cooccurrence_pmi",
    f"""
    WITH dw0 AS (
      SELECT DISTINCT doc_id AS d, unnest(toks) AS w
      FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
    ),
    kept AS (SELECT d FROM dw0 GROUP BY d HAVING COUNT(*) <= 512),
    dw AS (SELECT dw0.d, dw0.w FROM dw0 JOIN kept USING (d)),
    wc AS (SELECT w, COUNT(*) AS c1 FROM dw GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n_docs FROM kept),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c12
      FROM dw a JOIN dw b ON a.d = b.d AND a.w < b.w
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    )
    SELECT w1, w2, c12,
           round(ln((CAST(c12 AS DOUBLE) * n_docs) / (ca.c1 * cb.c1)), 6)
             AS pmi
    FROM pairs
    JOIN wc ca ON pairs.w1 = ca.w
    JOIN wc cb ON pairs.w2 = cb.w
    CROSS JOIN nd
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
    doc=(
        "PMI collocation mining over within-document co-occurrence "
        "(document frequencies, pairs w1<w2, support ≥5 docs, top 50). "
        "Pair generation is a per-document self-equi-join at "
        "DISTINCT-token grain (Σ|doc vocab|², never corpus²) with a "
        "512-token per-doc vocab cap as the boilerplate-skew guard; "
        "top-k is orderBy+limit → TakeOrderedAndProject"
    ),
)
def cooccurrence_pmi(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return pmi_collocations(
        docs, "doc_id", "text", min_pair_docs=5, top_n=50,
        max_doc_vocab=512,
    )


from metar_pipeline_spark.queries.text_ml import (  # noqa: E402
    _DUCK_WINNOW_CTES,
)

_REMOVABLE_VERDICTS = """
    , occ AS (SELECT fp, COUNT(DISTINCT doc_id) AS n_docs FROM e GROUP BY fp)
    , cov AS (
      SELECT e.doc_id,
             round(CAST(SUM(CASE WHEN occ.n_docs > 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / COUNT(*), 6) AS dup_coverage
      FROM e JOIN occ USING (fp) GROUP BY e.doc_id
    )
    , grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 7),
                                   i -> array_to_string(toks[i:i+7], ' ')))
               AS gram
      FROM t
    )
    , gc AS (SELECT gram, COUNT(*) AS g_occ FROM grams GROUP BY 1)
    , spans AS (
      SELECT g.doc_id,
             round(CAST(SUM(CASE WHEN gc.g_occ > 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / COUNT(*), 6) AS dup_frac
      FROM grams g JOIN gc USING (gram) GROUP BY g.doc_id
    )
    , base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
    , per_doc AS (
      SELECT b.doc_id, b.n_tokens,
             COALESCE(s.dup_frac, 0.0) AS dup_frac,
             COALESCE(c.dup_coverage, 0.0) AS dup_coverage
      FROM base b LEFT JOIN spans s USING (doc_id)
                  LEFT JOIN cov c USING (doc_id)
    )
    , verdicts AS (
      SELECT CASE WHEN dup_frac >= 0.8 AND dup_coverage >= 0.5 THEN 'drop'
                  WHEN dup_frac >= 0.2 THEN 'trim'
                  ELSE 'keep' END AS verdict,
             n_tokens,
             CASE WHEN dup_frac >= 0.8 AND dup_coverage >= 0.5
                    THEN n_tokens
                  WHEN dup_frac >= 0.2
                    THEN CAST(floor(dup_frac * n_tokens) AS BIGINT)
                  ELSE 0 END AS removable_tokens
      FROM per_doc
    )
    , agg AS (
      SELECT verdict,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(SUM(removable_tokens) AS BIGINT) AS removable_tokens
      FROM verdicts GROUP BY 1
    )
    , tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens
              FROM base)
    SELECT verdict, n_docs, n_tokens, removable_tokens,
           round(CAST(removable_tokens AS DOUBLE) / tot.corpus_tokens, 6)
             AS removable_pct
    FROM agg CROSS JOIN tot
"""


@register(
    "corpus_removable_span_report",
    _DUCK_WINNOW_CTES + _REMOVABLE_VERDICTS,
    doc=(
        "The decision-grade end of the dedup pipeline (Lee et al. 2021 "
        "headline): per drop/trim/keep verdict, how many documents and "
        "tokens, and what fraction of the whole corpus is removable "
        "span text. Composes the k-gram span profile "
        "(duplicated_span_stats) with the winnowing cross-doc coverage "
        "(dup_span_coverage) — drop = mostly-duplicated AND "
        "cross-doc-shared, trim = partially duplicated. Both inputs "
        "are the already-verified single-generator-pass shapes; the "
        "composition adds only doc-grain left joins and a 3-row "
        "rollup + one-row totals broadcast."
    ),
)
def corpus_removable_span_report(spark, sf_dir):
    from metar_pipeline_spark.operators import textops as tx
    from metar_pipeline_spark.operators.corpus_ops import (
        duplicated_span_stats,
    )
    from metar_pipeline_spark.queries.text_ml import dup_span_coverage

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    spans = duplicated_span_stats(docs, "doc_id", "text", k=8).select(
        "doc_id", "dup_frac"
    )
    # dup_span_coverage filters to n_shared > 0; the left-join default
    # 0.0 below IS the true coverage for every filtered/absent doc
    cov = dup_span_coverage(spark, sf_dir).select(
        "doc_id", "dup_coverage"
    )
    per_doc = (
        base.join(spans, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "n_tokens",
            F.coalesce("dup_frac", F.lit(0.0)).alias("dup_frac"),
            F.coalesce("dup_coverage", F.lit(0.0)).alias("dup_coverage"),
        )
    )
    is_drop = (F.col("dup_frac") >= 0.8) & (F.col("dup_coverage") >= 0.5)
    is_trim = F.col("dup_frac") >= 0.2
    verdicts = per_doc.select(
        F.when(is_drop, F.lit("drop"))
        .when(is_trim, F.lit("trim"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
        "n_tokens",
        F.when(is_drop, F.col("n_tokens"))
        .when(
            is_trim,
            F.floor(F.col("dup_frac") * F.col("n_tokens")).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("removable_tokens"),
    )
    agg = verdicts.groupBy("verdict").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("removable_tokens").cast("bigint").alias("removable_tokens"),
    )
    tot = base.agg(
        F.sum("n_tokens").cast("bigint").alias("corpus_tokens")
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "verdict",
        "n_docs",
        "n_tokens",
        "removable_tokens",
        F.round(
            F.col("removable_tokens").cast("double")
            / F.col("corpus_tokens"),
            6,
        ).alias("removable_pct"),
    )


# ---------------------------------------------------------------------------
# Pseudo-paragraph construction (round 9): the synthetic corpus has no
# newline structure, so the intra-document and boilerplate operators are
# exercised over DETERMINISTIC pseudo-paragraphs — fixed 2-token windows
# of the whitespace tokenization, joined back with the operator's
# separator (the chunk_documents construction, which has oracle
# precedent). Both engines replay the identical construction, so the
# oracle verifies the OPERATOR semantics (first-occurrence-kept /
# df-threshold removal), not the synthetic split.

_PSEUDO_P = 2  # tokens per pseudo-paragraph/line


def _pseudo_split_text(docs, sep):
    """doc_id + text rebuilt as ``sep``-joined 2-token windows."""
    toked = docs.select(
        "doc_id", _tokens(F.col("text")).alias("__toks")
    )
    nch = F.greatest(
        F.ceil(F.size("__toks") / float(_PSEUDO_P)).cast("int"), F.lit(1)
    )
    paras = F.filter(
        F.transform(
            F.sequence(F.lit(0), nch - F.lit(1)),
            lambda i: F.array_join(
                F.slice(F.col("__toks"), i * _PSEUDO_P + 1, _PSEUDO_P),
                " ",
            ),
        ),
        lambda p: p != F.lit(""),
    )
    return toked.select(
        "doc_id", F.array_join(paras, sep).alias("text")
    )


_PSEUDO_SPLIT_SQL = f"""
      SELECT doc_id,
             unnest(generate_series(0,
               CAST(greatest(ceil(len(toks) / {_PSEUDO_P}.0), 1) AS INT) - 1
             )) AS pos,
             toks
      FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
"""


@register(
    "intradoc_paragraph_dedup",
    f"""
    WITH e AS ({_PSEUDO_SPLIT_SQL}),
    p AS (
      SELECT doc_id, pos,
             array_to_string(list_slice(toks, pos * {_PSEUDO_P} + 1,
                                        pos * {_PSEUDO_P} + {_PSEUDO_P}),
                             ' ') AS para
      FROM e
    ),
    k AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY doc_id, para ORDER BY pos)
               AS rn
      FROM p WHERE para <> ''
    ),
    r AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_paragraphs,
             CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
             md5(coalesce(string_agg(CASE WHEN rn = 1 THEN para END,
                                     repeat(chr(10), 2) ORDER BY pos),
                          '')) AS clean_md5
      FROM k GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(r.n_paragraphs, 0) AS BIGINT) AS n_paragraphs,
           CAST(coalesce(r.n_dropped, 0) AS BIGINT) AS n_dropped,
           coalesce(r.clean_md5, md5('')) AS clean_md5
    FROM documents d LEFT JOIN r USING (doc_id)
    """,
    doc=(
        "Intra-document paragraph dedup (CCNet stage) over deterministic "
        f"{_PSEUDO_P}-token pseudo-paragraphs: first occurrence kept in "
        "reading order, repeats dropped; per-doc counts + md5 of the "
        "rebuilt text. The only shuffles are the (doc, digest) "
        "first-occurrence window and the per-doc rebuild agg — both "
        "keyed at or below document grain, scale-linear."
    ),
)
def intradoc_paragraph_dedup(spark, sf_dir):
    from metar_pipeline_spark.operators.intradoc import dedup_paragraphs

    docs = load_table(spark, sf_dir, "documents")
    out = dedup_paragraphs(
        _pseudo_split_text(docs, "\n\n"),
        id_col="doc_id",
        text_col="text",
        sep="\n\n",
    )
    return out.select(
        "doc_id",
        F.col("n_paragraphs").cast("bigint").alias("n_paragraphs"),
        F.col("n_dropped").cast("bigint").alias("n_dropped"),
        F.md5("text").alias("clean_md5"),
    )


_BOILER_MIN_DOCS = 20  # df threshold: ~top-11% of distinct lines at sf0.01


@register(
    "boilerplate_line_removal",
    f"""
    WITH e AS ({_PSEUDO_SPLIT_SQL}),
    p AS (
      SELECT doc_id, pos,
             array_to_string(list_slice(toks, pos * {_PSEUDO_P} + 1,
                                        pos * {_PSEUDO_P} + {_PSEUDO_P}),
                             ' ') AS line
      FROM e
    ),
    pl AS (SELECT doc_id, pos, line FROM p WHERE line <> ''),
    df AS (
      SELECT line, count(DISTINCT doc_id) AS df
      FROM pl GROUP BY line
    ),
    fl AS (
      SELECT pl.doc_id, pl.pos, pl.line,
             (df.df >= {_BOILER_MIN_DOCS}) AS rm
      FROM pl JOIN df USING (line)
    ),
    r AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
             md5(coalesce(string_agg(CASE WHEN NOT rm THEN line END,
                                     chr(10) ORDER BY pos),
                          '')) AS clean_md5
      FROM fl GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(r.n_lines, 0) AS BIGINT) AS n_lines,
           CAST(coalesce(r.n_removed, 0) AS BIGINT) AS n_removed,
           coalesce(r.clean_md5, md5('')) AS clean_md5
    FROM documents d LEFT JOIN r USING (doc_id)
    """,
    doc=(
        "Corpus-wide boilerplate line removal (RefinedWeb stage) over "
        f"deterministic {_PSEUDO_P}-token pseudo-lines: lines whose "
        f"normalized form appears in >= {_BOILER_MIN_DOCS} distinct "
        "documents are removed everywhere (first occurrences too); "
        "per-doc counts + md5 of the rebuilt text. The corpus-width "
        "shuffle carries only a 32-byte line digest; the blacklist is "
        "bounded by total_lines/min_docs, so the membership join back "
        "is broadcastable at any scale."
    ),
)
def boilerplate_line_removal(spark, sf_dir):
    from metar_pipeline_spark.operators.boilerplate import (
        remove_boilerplate_lines,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = remove_boilerplate_lines(
        _pseudo_split_text(docs, "\n"),
        min_docs=_BOILER_MIN_DOCS,
        id_col="doc_id",
        text_col="text",
        sep="\n",
    )
    return out.select(
        "doc_id",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_removed").cast("bigint").alias("n_removed"),
        F.md5("text").alias("clean_md5"),
    )


_RM_K = 5  # span gram width for the REMOVAL demo (k=8 finds only the
# planted full-doc dups in the synthetic corpus; k=5 also catches the
# chance-duplicated spans, so all three verdicts are exercised)
_RM_DROP, _RM_TRIM = 0.95, 0.02


@register(
    "corpus_span_removal_audit",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    gpos AS MATERIALIZED (
      SELECT doc_id, (p).i AS i, (p).g AS gram
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(toks) - {_RM_K - 1}),
                 i -> {{'i': i,
                       'g': array_to_string(toks[i:i+{_RM_K - 1}], ' ')}}))
                 AS p
        FROM t)
    ),
    gc AS MATERIALIZED (
      SELECT gram, COUNT(*) AS occ FROM gpos GROUP BY 1
    ),
    spans AS (
      SELECT g.doc_id,
             round(CAST(SUM(CASE WHEN gc.occ > 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / COUNT(*), 6) AS dup_frac
      FROM gpos g JOIN gc USING (gram) GROUP BY g.doc_id
    ),
    verd AS (
      SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens_before,
             CASE WHEN COALESCE(s.dup_frac, 0) >= {_RM_DROP} THEN 'drop'
                  WHEN COALESCE(s.dup_frac, 0) >= {_RM_TRIM} THEN 'trim'
                  ELSE 'keep' END AS verdict,
             t.toks
      FROM t LEFT JOIN spans s USING (doc_id)
    ),
    covered AS (
      SELECT DISTINCT doc_id, pos FROM (
        SELECT g.doc_id,
               unnest(generate_series(g.i, g.i + {_RM_K - 1})) AS pos
        FROM gpos g JOIN gc USING (gram)
                    JOIN verd v ON v.doc_id = g.doc_id
        WHERE gc.occ > 1 AND v.verdict = 'trim')
    ),
    tokpos AS (
      SELECT doc_id, (x).j AS j, (x).tok AS tok FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(toks)),
                                     j -> {{'j': j, 'tok': toks[j]}})) AS x
        FROM verd WHERE verdict = 'trim')
    ),
    kept AS (
      SELECT tp.doc_id, tp.j, tp.tok
      FROM tokpos tp LEFT JOIN covered c
        ON c.doc_id = tp.doc_id AND c.pos = tp.j
      WHERE c.doc_id IS NULL
    ),
    rebuilt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_after,
             md5(string_agg(tok, ' ' ORDER BY j)) AS clean_md5
      FROM kept GROUP BY doc_id
    )
    SELECT v.doc_id, v.verdict, v.n_tokens_before,
           CASE WHEN v.verdict = 'keep' THEN v.n_tokens_before
                ELSE COALESCE(r.n_after, 0) END AS n_tokens_after,
           CASE WHEN v.verdict = 'keep'
                THEN md5(array_to_string(v.toks, ' '))
                ELSE COALESCE(r.clean_md5, md5('')) END AS clean_md5
    FROM verd v LEFT JOIN rebuilt r USING (doc_id)
    WHERE v.verdict <> 'drop'
    """,
    doc=(
        "The ACTION end of exact-substring dedup (Lee et al. 2021 §4), "
        "completing profile → decision → action: span-stat verdicts "
        f"(k={_RM_K}: dup_frac ≥ {_RM_DROP} drop, ≥ {_RM_TRIM} trim) "
        "applied by operators/corpus_ops.remove_duplicated_spans — "
        "drop-docs excluded, trim-docs have every token covered by a "
        "corpus-duplicated k-gram removed, keep-docs pass through; "
        "emitted with before/after token counts and the md5 digest of "
        "the trimmed text. One gram-window corpus pass + bounded "
        "covered-position expansion + (doc,pos) anti-join + doc-grain "
        "rebuild."
    ),
)
def corpus_span_removal_audit(spark, sf_dir):
    from metar_pipeline_spark.operators.corpus_ops import (
        duplicated_span_stats,
        remove_duplicated_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    stats = duplicated_span_stats(docs, "doc_id", "text", k=_RM_K)
    verdicts = docs.select("doc_id").join(
        stats.select("doc_id", "dup_frac"), "doc_id", "left"
    ).select(
        "doc_id",
        F.when(
            F.coalesce("dup_frac", F.lit(0.0)) >= _RM_DROP, F.lit("drop")
        )
        .when(
            F.coalesce("dup_frac", F.lit(0.0)) >= _RM_TRIM, F.lit("trim")
        )
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )
    out = remove_duplicated_spans(
        docs, verdicts, id_col="doc_id", text_col="text", k=_RM_K
    )
    return out.select(
        "doc_id",
        "verdict",
        "n_tokens_before",
        "n_tokens_after",
        F.md5("text").alias("clean_md5"),
    )


@register(
    "source_scorecard",
    f"""
    WITH t AS (SELECT doc_id, source, text, {_DUCK_TOKS} AS toks
               FROM documents),
    card AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
      FROM t GROUP BY source
    ),
    dup AS (
      SELECT source,
             round(SUM(CASE WHEN doc_id <> cmin THEN 1 ELSE 0 END)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS exact_dup_rate
      FROM (SELECT source, doc_id,
                   MIN(doc_id) OVER (PARTITION BY md5(text)) AS cmin
            FROM documents)
      GROUP BY source
    ),
    gsig AS (
      SELECT source,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             round(CASE WHEN len(toks) = 0 THEN 0
                   ELSE list_reduce(list_transform(toks, x -> length(x)),
                                    (x, y) -> x + y) END
                   / greatest(len(toks), 1), 6) AS mean_word_len,
             round(len(list_filter(toks,
                                   x -> regexp_matches(x, '[A-Za-z]')))
                   / greatest(len(toks), 1), 6) AS alpha_word_frac,
             round(len(list_filter(toks, x -> x IN ('#', '...', '…')))
                   / greatest(len(toks), 1), 6) AS symbol_ratio
      FROM t
    ),
    gq AS (
      SELECT source,
             round(SUM(CASE WHEN n_tokens BETWEEN 20 AND 100000
                             AND mean_word_len BETWEEN 2 AND 10
                             AND alpha_word_frac >= 0.8
                             AND symbol_ratio < 0.1
                            THEN 1 ELSE 0 END)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS gopher_pass_rate
      FROM gsig GROUP BY source
    ),
    ng AS (
      SELECT DISTINCT source, gram FROM (
        SELECT source,
               unnest(list_distinct(list_transform(
                 generate_series(1, len(toks) - 2),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                 AS gram
        FROM t)
    ),
    fi AS (SELECT gram, MIN(source) AS source FROM ng GROUP BY 1),
    novn AS (SELECT source, COUNT(*) AS new_grams FROM fi GROUP BY 1),
    novt AS (SELECT source, COUNT(*) AS n_grams FROM ng GROUP BY 1),
    nov AS (
      SELECT nt.source,
             round(COALESCE(nn.new_grams, 0) / nt.n_grams, 6)
               AS novelty_rate
      FROM novt nt LEFT JOIN novn nn USING (source)
    ),
    ttr AS (
      SELECT source,
             round(CAST(SUM(CAST(
                     round(len(list_distinct(toks[1:100]))
                           / CAST(least(len(toks), 100) AS DOUBLE), 6)
                   AS DECIMAL(38,10))) AS DOUBLE)
                   / COUNT(*), 6) AS mean_ttr100
      FROM t WHERE len(toks) >= 20 GROUP BY source
    )
    SELECT c.source, c.n_docs, c.n_tokens,
           d.exact_dup_rate, g.gopher_pass_rate, n.novelty_rate,
           tt.mean_ttr100,
           round(g.gopher_pass_rate * n.novelty_rate
                 * (1 - d.exact_dup_rate), 6) AS keep_score
    FROM card c
    JOIN dup d USING (source)
    JOIN gq g USING (source)
    JOIN nov n ON n.source = c.source
    LEFT JOIN ttr tt ON tt.source = c.source
    """,
    doc=(
        "Per-source acquisition scorecard — the decision table a "
        "data-sourcing team reads: volume (docs/tokens), exact-dup "
        "redundancy rate (corpus-wide md5 canonical, one window "
        "exchange), Gopher quality pass rate (pure per-row column "
        "math), marginal 3-gram novelty (gram-grain MIN agg), mean "
        "TTR-100 lexical diversity, and a keep_score composite "
        "(quality × novelty × uniqueness). Five source-grain frames "
        "joined at dimension grain — every input shape is an "
        "already-verified operator; the composite adds only "
        "broadcastable joins."
    ),
)
def source_scorecard(spark, sf_dir):
    from pyspark.sql import Window

    from metar_pipeline_spark.operators.textops import (
        gopher_passes,
        gopher_signals,
    )
    from metar_pipeline_spark.operators.vocab import gram_novelty_by_slice

    docs = load_table(spark, sf_dir, "documents")
    card = (
        docs.select("source", F.size(_tokens(F.col("text"))).alias("_nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
        )
    )
    keyed = docs.select(
        "source",
        "doc_id",
        F.min("doc_id")
        .over(Window.partitionBy(F.md5("text")))
        .alias("_cmin"),
    )
    dup = keyed.groupBy("source").agg(
        F.round(
            F.sum(
                F.when(F.col("doc_id") != F.col("_cmin"), 1).otherwise(0)
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("exact_dup_rate")
    )
    sig = gopher_signals(F.col("text"))
    gq = (
        docs.select(
            "source", gopher_passes(sig).cast("int").alias("_p")
        )
        .groupBy("source")
        .agg(
            F.round(
                F.sum("_p") / F.count(F.lit(1)).cast("double"), 6
            ).alias("gopher_pass_rate")
        )
    )
    nov = gram_novelty_by_slice(docs, "source", "text", shingle_n=3).select(
        F.col("slice").alias("source"), "novelty_rate"
    )
    toked = docs.select("source", _tokens(F.col("text")).alias("_t"))
    ttr = (
        toked.filter(F.size("_t") >= 20)
        .select(
            "source",
            F.round(
                F.size(F.array_distinct(F.slice("_t", 1, 100)))
                / F.least(F.size("_t"), F.lit(100)).cast("double"),
                6,
            ).alias("_ttr100"),
        )
        .groupBy("source")
        .agg(
            F.round(
                F.sum(F.col("_ttr100").cast("decimal(38,10)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("mean_ttr100")
        )
    )
    return (
        card.join(dup, "source")
        .join(gq, "source")
        .join(nov, "source")
        .join(ttr, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "exact_dup_rate",
            "gopher_pass_rate",
            "novelty_rate",
            "mean_ttr100",
            F.round(
                F.col("gopher_pass_rate")
                * F.col("novelty_rate")
                * (F.lit(1) - F.col("exact_dup_rate")),
                6,
            ).alias("keep_score"),
        )
    )
