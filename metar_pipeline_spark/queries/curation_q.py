"""Training-data curation queries: sequence packing, mixture sampling,
decontamination, PII scrubbing (operators/curation.py).

These are the post-filtering corpus-preparation steps of an LLM data
pipeline; each is registered with an exact ANSI-SQL oracle so the
Spark composition is hash-verified end to end. PII-bearing text is
synthesized deterministically from doc_id on BOTH engines (same
convention as the multimodal byte synthesis) because the corpus itself
contains none.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators import curation as cu
from metar_pipeline_spark.queries import register

_DUCK_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
)
_PACK_WINDOW = 512
_EVAL_MOD = 23  # doc_id % 23 == 0 → eval set (~4% of the corpus)


@register(
    "pack_training_sequences",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             CAST(coalesce(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST(cum_before // {_PACK_WINDOW} AS BIGINT) AS pack_id,
           CAST(cum_before % {_PACK_WINDOW} AS INTEGER) AS offset_in_pack
    FROM c
    """,
    doc=(
        "Sequence packing (concat-then-chunk): each doc tagged with the "
        f"{_PACK_WINDOW}-token training window containing its first "
        "token — one cumsum window per packing domain, no Python"
    ),
)
def pack_training_sequences(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = cu.pack_sequences(docs, window_tokens=_PACK_WINDOW)
    return out.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "pack_id",
        "offset_in_pack",
    )


@register(
    "mixture_quota_sample",
    """
    WITH ranked AS (
      SELECT doc_id, source, lang,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    )
    SELECT doc_id, source, lang, CAST(sample_rank AS INTEGER) AS sample_rank
    FROM ranked
    WHERE sample_rank <= CASE WHEN source IN ('src0','src1','src2')
                              THEN 15 ELSE 8 END
    """,
    doc=(
        "Data-mixture curation: per-domain quota sampling by salted "
        "hash rank — reproducible under any partitioning; upweighted "
        "domains get a larger quota"
    ),
)
def mixture_quota_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    quota = (
        F.when(F.col("source").isin("src0", "src1", "src2"), F.lit(15))
        .otherwise(F.lit(8))
    )
    out = cu.mixture_sample(docs, quota)
    return out.select(
        "doc_id", "source", "lang",
        F.col("sample_rank").cast("int").alias("sample_rank"),
    )


@register(
    "decontaminate_ngram_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents
    ), grams AS (
      SELECT doc_id,
             md5(g) AS g
      FROM (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, len(tk) - 4),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
                      || tk[i+3] || ' ' || tk[i+4]))) AS g
        FROM toks
      )
    ), eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0
    ), corpus AS (
      SELECT * FROM grams WHERE doc_id % {_EVAL_MOD} <> 0
    ), totals AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
      FROM corpus GROUP BY doc_id
    ), hits AS (
      SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
      FROM corpus c JOIN eval_grams e USING (g)
      GROUP BY c.doc_id
    )
    SELECT t.doc_id, t.n_grams,
           CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           round(coalesce(h.n_overlap, 0) / greatest(t.n_grams, 1), 6)
               AS overlap_ratio,
           coalesce(h.n_overlap, 0) > 0 AS contaminated
    FROM totals t LEFT JOIN hits h USING (doc_id)
    """,
    doc=(
        "Benchmark decontamination: distinct 5-gram digests of the eval "
        "slice (doc_id % 23 = 0) broadcast-joined against corpus "
        "5-grams; per-doc overlap count/ratio + contamination flag"
    ),
)
def decontaminate_ngram_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return cu.ngram_overlap(corpus, eval_set, n=5)


@register(
    "pii_redaction_stats",
    f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 2 THEN text
                  ELSE text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or +1-555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{cu.EMAIL_RE}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{cu.PHONE_RE}')) AS INTEGER)
               AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{cu.EMAIL_RE}',
               '<EMAIL>', 'g'), '{cu.PHONE_RE}', '<PHONE>', 'g'))
               AS redacted_md5
    FROM aug
    """,
    doc=(
        "PII scrub: email/phone regex counts + digest of the redacted "
        "text; PII synthesized from doc_id on both engines (1/3 of "
        "docs kept clean as control)"
    ),
)
def pii_redaction_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 2, F.col("text"))
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            )
        )
        .alias("text"),
    )
    return cu.redact_pii(aug)


@register(
    "quality_quantile_filter",
    f"""
    WITH c AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   / greatest(length(text), 1), 6) AS alpha_ratio,
             round(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g'))
                   / greatest(length(text), 1), 6) AS punct_ratio,
             round(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that','for','with')))
                   / greatest(len(toks), 1), 6) AS stopword_ratio
      FROM (SELECT doc_id, lang, text, {_DUCK_TOKS} AS toks FROM documents)
    ), q AS (
      SELECT doc_id, lang,
             round(0.4 * CAST(least(n_tokens / 100.0, 1.0) AS DECIMAL(18,6))
                   + 0.3 * CAST(alpha_ratio AS DECIMAL(18,6))
                   + 0.2 * CAST(stopword_ratio AS DECIMAL(18,6))
                   + 0.1 * CAST(1 - least(punct_ratio * 10, 1.0) AS DECIMAL(18,6)),
                   6)::DOUBLE AS quality
      FROM c
    ), thr AS (
      SELECT lang, round(quantile_cont(quality, 0.6), 6) AS t
      FROM q GROUP BY lang
    )
    SELECT q.doc_id, q.lang, round(q.quality, 6) AS quality
    FROM q JOIN thr USING (lang)
    WHERE round(q.quality, 6) >= thr.t
    """,
    doc=(
        "Corpus filtering: keep docs at/above the per-language 60th "
        "quality percentile — per-stratum thresholds broadcast back "
        "against the scan, so no language is wiped out by a global "
        "cutoff and the corpus is never shuffled"
    ),
)
def quality_quantile_filter(spark, sf_dir):
    from metar_pipeline_spark.operators import textops as tx

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    return cu.quality_quantile_filter(
        docs, tx.quality_score(F.col("text")), 0.6
    )


@register(
    "render_packed_windows",
    f"""
    WITH t AS (
      SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents
    ), c AS (
      SELECT doc_id, source, toks,
             coalesce(SUM(len(toks)) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM t
    ), e AS (
      SELECT source, cum_before + k - 1 AS gpos, toks[k] AS tok
      FROM c, LATERAL (
        SELECT unnest(generate_series(1, len(toks))) AS k
      ) ks
    )
    SELECT source,
           CAST(gpos // {_PACK_WINDOW} AS BIGINT) AS window_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           md5(string_agg(tok, ' ' ORDER BY gpos)) AS window_md5
    FROM e GROUP BY 1, 2
    """,
    doc=(
        "Packed-sequence rendering: each domain's token stream cut into "
        f"exact {_PACK_WINDOW}-token training windows (docs split across "
        "boundaries); windows re-assembled order-exactly, digest-verified"
    ),
)
def render_packed_windows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return cu.render_packed_windows(docs, window_tokens=_PACK_WINDOW)


_CHUNK, _CHUNK_OVERLAP = 128, 32
_CHUNK_STRIDE = _CHUNK - _CHUNK_OVERLAP


@register(
    "chunk_documents_overlap",
    f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), e AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               CAST(greatest(1, ceil((len(toks) - {_CHUNK_OVERLAP})
                                     / {_CHUNK_STRIDE}.0)) AS INTEGER) - 1
             )) AS chunk_id
      FROM t
    )
    SELECT doc_id,
           CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(len(list_slice(toks, chunk_id * {_CHUNK_STRIDE} + 1,
                               chunk_id * {_CHUNK_STRIDE} + {_CHUNK})) AS INTEGER) AS n_tokens,
           md5(array_to_string(list_slice(toks, chunk_id * {_CHUNK_STRIDE} + 1,
                                          chunk_id * {_CHUNK_STRIDE} + {_CHUNK}), ' ')) AS chunk_md5
    FROM e
    """,
    doc=(
        f"RAG retrieval prep: every document cut into {_CHUNK}-token "
        f"chunks sliding by {_CHUNK_STRIDE} ({_CHUNK_OVERLAP}-token "
        "overlap), digest-verified — pure per-row HOF math riding the "
        "scan (explode is a narrow generator; no shuffle, no UDF)"
    ),
)
def chunk_documents_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return cu.chunk_documents(
        docs, _CHUNK, _CHUNK_OVERLAP, id_col="doc_id", text_col="text"
    )


@register(
    "dataset_card_summary",
    """
    SELECT source, lang,
           CAST(2 * GROUPING(source) + GROUPING(lang) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(list_filter(
               regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''
           ))) AS BIGINT) AS n_tokens,
           round(CAST(SUM(CAST(n_chars AS DECIMAL(30,10))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_chars
    FROM documents
    GROUP BY ROLLUP (source, lang)
    """,
    doc=(
        "Dataset-card rollup: corpus composition by (source, lang) "
        "with subtotals and a grand total in ONE pass (ROLLUP's "
        "partial-agg tree) — doc counts, token totals, mean length; "
        "the release-documentation summary a training corpus ships "
        "with."
    ),
)
def dataset_card_summary(spark, sf_dir):
    from metar_pipeline_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            "lang",
            F.size(tokens(F.col("text"))).alias("_nt"),
            "n_chars",
        )
        .rollup("source", "lang")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(30,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_chars"),
        )
        .select("source", "lang", "gid", "n_docs", "n_tokens", "avg_chars")
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split manifest
# ---------------------------------------------------------------------------


@register(
    "train_val_test_manifest",
    """
    WITH assigned AS (
      SELECT source,
             CASE WHEN u < 0.8 THEN 'train'
                  WHEN u < 0.9 THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM (
        SELECT source, n_chars,
               ((doc_id * 2654435761) % 4294967296 + 0.5)
                 / 4294967296.0 AS u
        FROM documents
      )
    )
    SELECT split, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split, source
    """,
    doc=(
        "Train/val/test split manifest: the 80/10/10 assignment is a "
        "multiplicative integer hash of doc_id mapped to [0,1) — the "
        "same doc lands in the same split on any engine, partitioning "
        "or rerun (rand(seed) is partition-dependent, hence banned); "
        "curation.train_val_test_split also writes partitionBy(split) "
        "so training reads are partition-pruned (write path exercised "
        "in test_curation_semantics)"
    ),
)
def train_val_test_manifest(spark, sf_dir):
    from metar_pipeline_spark.operators.curation import train_val_test_split

    docs = load_table(spark, sf_dir, "documents")
    assigned = train_val_test_split(docs)
    return assigned.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "length_bucket_padding_stats",
    f"""
    WITH t AS (
      SELECT doc_id, CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens,
             NTILE(8) OVER (ORDER BY n_tokens, doc_id) AS bucket
      FROM t
    )
    SELECT bucket,
           COUNT(*) AS n_docs,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           round(1.0 - SUM(n_tokens) / CAST(MAX(n_tokens) * COUNT(*) AS DOUBLE), 6)
             AS padding_frac
    FROM b GROUP BY bucket
    """,
    doc="Sorted-batching audit: 8 length quantiles with per-bucket "
    "padding waste under pad-to-batch-max",
)
def length_bucket_padding_stats(spark, sf_dir):
    from metar_pipeline_spark.operators import textops as tx

    docs = load_table(spark, sf_dir, "documents")
    return cu.length_bucket_padding(
        docs, "doc_id", F.size(tx.tokens(F.col("text"))), n_buckets=8
    )


@register(
    "corpus_curation_funnel",
    f"""
    WITH base AS (
      SELECT doc_id, lang, text, toks,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             md5(text) AS k,
             (doc_id % {_EVAL_MOD} <> 0) AS is_corpus,
             round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   / greatest(length(text), 1), 6) AS alpha_ratio,
             round(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g'))
                   / greatest(length(text), 1), 6) AS punct_ratio,
             round(len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','that','for','with')))
                   / greatest(len(toks), 1), 6) AS stopword_ratio
      FROM (SELECT doc_id, lang, text, {_DUCK_TOKS} AS toks FROM documents)
    ), flags AS (
      SELECT doc_id, lang, n_tokens, is_corpus,
             (min(CASE WHEN is_corpus THEN doc_id END)
                OVER (PARTITION BY k) = doc_id) AS canon,
             (CAST(len(toks) AS INTEGER) BETWEEN 20 AND 100000
              AND round(CASE WHEN len(toks) = 0 THEN 0
                    ELSE list_reduce(list_transform(toks, t -> length(t)),
                                     (x, y) -> x + y) END
                    / greatest(len(toks), 1), 6) BETWEEN 2 AND 10
              AND round(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                    / greatest(len(toks), 1), 6) >= 0.8
              AND round(len(list_filter(toks, t -> t IN ('#', '...', '…')))
                    / greatest(len(toks), 1), 6) < 0.1) AS gopher_ok,
             round(0.4 * CAST(least(n_tokens / 100.0, 1.0) AS DECIMAL(18,6))
                   + 0.3 * CAST(alpha_ratio AS DECIMAL(18,6))
                   + 0.2 * CAST(stopword_ratio AS DECIMAL(18,6))
                   + 0.1 * CAST(1 - least(punct_ratio * 10, 1.0) AS DECIMAL(18,6)),
                   6)::DOUBLE AS q
      FROM base
    ), eval_grams AS (
      SELECT DISTINCT md5(g) AS g FROM (
        SELECT unnest(list_distinct(list_transform(
                 generate_series(1, len(toks) - 4),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                      || toks[i+3] || ' ' || toks[i+4]))) AS g
        FROM base WHERE NOT is_corpus
      )
    ), cont AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, md5(g) AS g FROM (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, len(toks) - 4),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                        || toks[i+3] || ' ' || toks[i+4]))) AS g
          FROM base WHERE is_corpus
        )
      ) JOIN eval_grams USING (g)
    ), f2 AS (
      SELECT f.*, (c.doc_id IS NOT NULL) AS contaminated
      FROM flags f LEFT JOIN cont c USING (doc_id)
    ), s4 AS (
      SELECT * FROM f2
      WHERE is_corpus AND canon AND gopher_ok AND NOT contaminated
    ), thr AS (
      SELECT lang, round(quantile_cont(q, 0.6), 6) AS t
      FROM s4 GROUP BY lang
    ), s5 AS (
      SELECT s4.* FROM s4 JOIN thr USING (lang) WHERE q >= t
    ), rawn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS rn FROM f2)
    SELECT stage_idx, stage,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(n_toks, 0) AS BIGINT) AS n_tokens,
           round(n_docs / rn, 6) AS pct_of_raw
    FROM (
      SELECT 0 AS stage_idx, 'raw' AS stage,
             COUNT(*) AS n_docs, SUM(n_tokens) AS n_toks FROM f2
      UNION ALL
      SELECT 1, 'holdout_split', COUNT(*), SUM(n_tokens)
      FROM f2 WHERE is_corpus
      UNION ALL
      SELECT 2, 'exact_dedup', COUNT(*), SUM(n_tokens)
      FROM f2 WHERE is_corpus AND canon
      UNION ALL
      SELECT 3, 'gopher_filter', COUNT(*), SUM(n_tokens)
      FROM f2 WHERE is_corpus AND canon AND gopher_ok
      UNION ALL
      SELECT 4, 'decontaminated', COUNT(*), SUM(n_tokens) FROM s4
      UNION ALL
      SELECT 5, 'quality_top', COUNT(*), SUM(n_tokens) FROM s5
    ), rawn
    """,
    doc=(
        "End-to-end corpus-curation funnel: holdout split -> exact "
        "dedup -> Gopher filter -> decontamination -> per-language "
        "quality quantile, with doc/token survivors per stage. "
        "Stages 0-4 are ONE conditional aggregate over a single "
        "flagged scan; only the quantile stage needs a second "
        "(dimension-sized) pass."
    ),
)
def corpus_curation_funnel(spark, sf_dir):
    """The flagship curation composition: every per-doc verdict
    (canonical-after-dedup, Gopher pass, decontaminated) is computed as
    a FLAG on one scan, so the whole five-stage funnel costs one md5
    window + one gram join + one conditional aggregate — not five
    passes over the corpus. Only the per-language quality threshold is
    inherently sequential (it is defined over stage-4 survivors) and it
    aggregates a dimension-sized frame.
    """
    from pyspark.sql import Window

    from metar_pipeline_spark.operators import textops as tx

    docs = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        "lang",
        "text",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.md5("text").alias("_k"),
        (F.col("doc_id") % _EVAL_MOD != 0).alias("is_corpus"),
        tx.gopher_passes(tx.gopher_signals(F.col("text"))).alias(
            "gopher_ok"
        ),
        tx.quality_score(F.col("text")).alias("q"),
    )
    wk = Window.partitionBy("_k")
    canon = (
        F.min(F.when(F.col("is_corpus"), F.col("doc_id"))).over(wk)
        == F.col("doc_id")
    )
    cont_ids = (
        cu.ngram_overlap(
            docs.filter(F.col("doc_id") % _EVAL_MOD != 0),
            docs.filter(F.col("doc_id") % _EVAL_MOD == 0),
            n=5,
        )
        .filter(F.col("contaminated"))
        .select("doc_id", F.lit(True).alias("_cont"))
    )
    flagged = (
        base.withColumn("canon", canon)
        .drop("text", "_k")
        .join(cont_ids, "doc_id", "left")
        .withColumn(
            "contaminated", F.coalesce(F.col("_cont"), F.lit(False))
        )
        .drop("_cont")
        .cache()  # three consumers: stage agg, threshold agg, stage-5 agg
    )
    s4 = (
        F.col("is_corpus")
        & F.col("canon")
        & F.col("gopher_ok")
        & ~F.col("contaminated")
    )
    conds = [
        ("raw", F.lit(True)),
        ("holdout_split", F.col("is_corpus")),
        ("exact_dedup", F.col("is_corpus") & F.col("canon")),
        (
            "gopher_filter",
            F.col("is_corpus") & F.col("canon") & F.col("gopher_ok"),
        ),
        ("decontaminated", s4),
    ]
    main = flagged.agg(
        *[
            x
            for i, (_, c) in enumerate(conds)
            for x in (
                F.count(F.when(c, 1)).alias(f"_c{i}"),
                F.coalesce(
                    F.sum(F.when(c, F.col("n_tokens"))), F.lit(0)
                ).alias(f"_t{i}"),
            )
        ]
    )
    thr = (
        flagged.filter(s4)
        .groupBy("lang")
        .agg(F.round(F.expr("percentile(q, 0.6)"), 6).alias("_thr"))
    )
    s5agg = (
        flagged.filter(s4)
        .join(F.broadcast(thr), "lang")
        .filter(F.col("q") >= F.col("_thr"))
        .agg(
            F.count(F.lit(1)).alias("_c5"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("_t5"),
        )
    )
    rows = [
        F.struct(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(f"_c{i}").cast("bigint").alias("n_docs"),
            F.col(f"_t{i}").cast("bigint").alias("n_tokens"),
            F.round(
                F.col(f"_c{i}").cast("double") / F.col("_c0"), 6
            ).alias("pct_of_raw"),
        )
        for i, name in enumerate(
            [n for n, _ in conds] + ["quality_top"]
        )
    ]
    return (
        main.crossJoin(s5agg)
        .select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
    )


_NEYMAN_BUDGET = 120


@register(
    "neyman_stratified_sample",
    f"""
    WITH q AS (
      SELECT doc_id, source,
             round(0.4 * CAST(least(CAST(len({_DUCK_TOKS}) AS INTEGER) / 100.0, 1.0) AS DECIMAL(18,6))
                   + 0.3 * CAST(round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         / greatest(length(text), 1), 6) AS DECIMAL(18,6))
                   + 0.2 * CAST(round(len(list_filter({_DUCK_TOKS},
                           t -> t IN ('the','a','of','and','to','in','is','that','for','with')))
                         / greatest(CAST(len({_DUCK_TOKS}) AS INTEGER), 1), 6) AS DECIMAL(18,6))
                   + 0.1 * CAST(1 - least(round(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g'))
                         / greatest(length(text), 1), 6) * 10, 1.0) AS DECIMAL(18,6)),
                   6)::DOUBLE AS qual
      FROM documents
    ), s AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(CAST(qual AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(qual * qual AS DECIMAL(38,10))) AS DOUBLE) AS sxx
      FROM q GROUP BY source
    ), sig AS (
      SELECT source, n,
             round(sqrt((sxx - sx * sx / n) / n), 6) AS sigma
      FROM s
    ), w AS (
      SELECT source, n, sigma,
             round(CAST(n * CAST(sigma AS DECIMAL(18,6)) AS DOUBLE)
                   / CAST((SELECT SUM(n * CAST(sigma AS DECIMAL(18,6))) FROM sig) AS DOUBLE),
                   6) AS weight
      FROM sig
    ), alloc AS (
      SELECT source, n AS stratum_n, sigma, weight,
             greatest(1, CAST(floor({_NEYMAN_BUDGET} * CAST(weight AS DECIMAL(18,6))) AS BIGINT))
                 AS alloc
      FROM w
    ), ranked AS (
      SELECT d.doc_id, d.source,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5('mix:' || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS sample_rank
      FROM documents d
    )
    SELECT r.doc_id, r.source,
           CAST(r.sample_rank AS INTEGER) AS sample_rank,
           a.stratum_n, a.sigma, a.weight,
           CAST(a.alloc AS BIGINT) AS alloc
    FROM ranked r JOIN alloc a USING (source)
    WHERE r.sample_rank <= a.alloc
    """,
    doc=(
        "Neyman-allocation stratified sampling: per-source sample "
        "sizes proportional to N_h * sigma_h (exact DECIMAL moments, "
        "decimal-exact floor allocation), drawn with the deterministic "
        "salted-hash rank — high-variance strata get more of the "
        "budget, the statistically efficient split of a labeling/eval "
        "budget over a heterogeneous corpus"
    ),
)
def neyman_stratified_sample(spark, sf_dir):
    from metar_pipeline_spark.operators import textops as tx

    docs = load_table(spark, sf_dir, "documents")
    dec = "decimal(38,10)"
    scored = docs.select(
        "doc_id",
        "source",
        tx.quality_score(F.col("text")).alias("qual"),
    )
    s = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qual").cast(dec)).cast("double").alias("sx"),
        F.sum((F.col("qual") * F.col("qual")).cast(dec))
        .cast("double")
        .alias("sxx"),
    )
    sig = s.select(
        "source",
        "n",
        F.round(
            F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / F.col("n")
            ),
            6,
        ).alias("sigma"),
    )
    # N_h * sigma_h in exact DECIMAL (sigma is 6dp), so the weight
    # ratio and the floor allocation are engine-exact
    prod = F.col("n") * F.col("sigma").cast("decimal(18,6)")
    tot = sig.agg(F.sum(prod).alias("_tot"))
    alloc = (
        sig.crossJoin(F.broadcast(tot))
        .withColumn(
            "weight",
            F.round(prod.cast("double") / F.col("_tot").cast("double"), 6),
        )
        .withColumn(
            "alloc",
            F.greatest(
                F.lit(1),
                F.floor(
                    F.lit(_NEYMAN_BUDGET)
                    * F.col("weight").cast("decimal(18,6)")
                ),
            ).cast("bigint"),
        )
        .select(
            "source",
            F.col("n").alias("stratum_n"),
            "sigma",
            "weight",
            "alloc",
        )
    )
    sampled = cu.mixture_sample(
        docs.select("doc_id", "source").join(
            F.broadcast(alloc), "source"
        ),
        F.col("alloc"),
    )
    return sampled.select(
        "doc_id",
        "source",
        F.col("sample_rank").cast("int").alias("sample_rank"),
        "stratum_n",
        "sigma",
        "weight",
        F.col("alloc").cast("bigint").alias("alloc"),
    )


@register(
    "quality_percent_rank_by_source",
    f"""
    WITH q AS (
      SELECT doc_id, source,
             round(0.4 * CAST(least(CAST(len({_DUCK_TOKS}) AS INTEGER) / 100.0, 1.0) AS DECIMAL(18,6))
                   + 0.3 * CAST(round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         / greatest(length(text), 1), 6) AS DECIMAL(18,6))
                   + 0.2 * CAST(round(len(list_filter({_DUCK_TOKS},
                           t -> t IN ('the','a','of','and','to','in','is','that','for','with')))
                         / greatest(CAST(len({_DUCK_TOKS}) AS INTEGER), 1), 6) AS DECIMAL(18,6))
                   + 0.1 * CAST(1 - least(round(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g'))
                         / greatest(length(text), 1), 6) * 10, 1.0) AS DECIMAL(18,6)),
                   6)::DOUBLE AS qual
      FROM documents
    )
    SELECT doc_id, source, qual,
           round(PERCENT_RANK() OVER (
             PARTITION BY source ORDER BY qual, doc_id
           ), 6) AS pct_rank
    FROM q
    """,
    doc=(
        "Cross-source score normalization: per-source percent_rank of "
        "the quality score (total order via doc_id tiebreak) — maps "
        "every domain's score distribution onto [0,1] so a threshold "
        "means the same thing in every domain; one rank window per "
        "source partition"
    ),
)
def quality_percent_rank_by_source(spark, sf_dir):
    from pyspark.sql import Window

    from metar_pipeline_spark.operators import textops as tx

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        tx.quality_score(F.col("text")).alias("qual"),
    )
    w = Window.partitionBy("source").orderBy("qual", "doc_id")
    return scored.withColumn(
        "pct_rank", F.round(F.percent_rank().over(w), 6)
    )


@register(
    "k_anonymity_audit",
    """
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS cls_size
      FROM customer
      GROUP BY 1, 2
    )
    SELECT cls_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(cls_size) AS BIGINT) AS n_rows,
           cls_size < 5 AS below_k
    FROM classes
    GROUP BY 1
    """,
    doc=(
        "k-anonymity audit of the customer table under the "
        "quasi-identifier pair (nation, market segment): the "
        "equivalence-class size histogram, flagging classes below "
        "k=5 — the re-identification-risk table a privacy review "
        "reads before releasing a dataset (Sweeney k-anonymity; the "
        "training-data analogue is auditing metadata columns shipped "
        "alongside text). Scale shape: two chained hash aggregates "
        "(row grain -> class grain -> class-SIZE grain), no joins, "
        "no windows — the cheapest possible full-table audit."
    ),
)
def k_anonymity_audit(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    classes = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cls_size")
    )
    return classes.groupBy("cls_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("cls_size").cast("bigint").alias("n_rows"),
        (F.col("cls_size") < 5).alias("below_k"),
    )


@register(
    "l_diversity_audit",
    """
    WITH classes AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(DISTINCT user_id) AS n_distinct
      FROM events
      GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(n_distinct) AS BIGINT) AS min_distinct,
           CAST(SUM(CASE WHEN n_distinct < 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS classes_below_l,
           round(CAST(SUM(CASE WHEN n_distinct < 3 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS frac_below_l
    FROM classes
    GROUP BY 1
    """,
    doc=(
        "Distinct l-diversity audit of the event log under the "
        "quasi-identifier (event_type, day) with user_id as the "
        "sensitive attribute: a QI class whose rows all belong to "
        "< l = 3 distinct users lets an observer who knows someone "
        "acted that day attribute the rows to them even when the "
        "table is k-anonymous (Machanavajjhala l-diversity). "
        "Distinct-count form only — entropy l-diversity needs float "
        "p*log(p) accumulation, which is order-dependent; the "
        "distinct form is exact integers end to end. Scale shape: "
        "one expand-style distinct aggregate at (type, day, user) "
        "grain, then a type-grain rollup; no joins, no windows."
    ),
)
def l_diversity_audit(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    classes = events.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.countDistinct("user_id").alias("n_distinct"))
    below = F.sum(
        F.when(F.col("n_distinct") < 3, 1).otherwise(0)
    )
    return classes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("n_distinct").cast("bigint").alias("min_distinct"),
        below.cast("bigint").alias("classes_below_l"),
        F.round(
            below.cast("double") / F.count(F.lit(1)), 6
        ).alias("frac_below_l"),
    )
