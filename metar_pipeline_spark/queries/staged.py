"""Round-7-staged queries — REGISTERED as of round 8.

These specs were authored in round 7 while the verification window was
full (49/50) and parked here un-registered; the round-7 gate re-greened
the whole window (47/50 green, 3 permanent rows-only sketches), so as
of round 8 the decorator below dual-registers each spec into the real
REGISTRY (they are category-1 "never driver-green" entries until their
first CORRECTNESS row lands) while keeping the STAGED dict populated so
`tools/check_oracle.py --staged` can still target exactly this family.

Contents (SURVEY.md round-7 additions table):
- jl_random_projection — operators/projection.py (JL sign projection)
- bpe_merge_candidates — operators/vocab.py (BPE round-1 vocab merge)
- source_vocab_jaccard — operators/vocab.py (slice vocabulary overlap)
- hits_supply_graph — operators/linkanalysis.py (HITS hubs/authorities)
- source_centroid_affinity — operators/affinity.py (dense slice affinity)
- temporal_embargo_split — operators/temporal_split.py (purged split)
- shard_plan_manifest — operators/prefix.py (distributed prefix sum)
- embedding_gram_matrix — operators/pca.py (exact Gram aggregation)
- mixture_temperature_weights / split_balance_chi2 — mixture QA
(dedup_containment_pairs graduated to the registry — text_ml.py.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.affinity import (
    centroid_affinity,
    slice_centroids,
)
from metar_pipeline_spark.operators.linkanalysis import hits_bipartite
from metar_pipeline_spark.operators.projection import (
    jl_project_long,
    jl_scale,
    jl_sign_rows,
)
from metar_pipeline_spark.operators.ranking import rank_bounded
from metar_pipeline_spark.operators.vocab import (
    bpe_merge_candidates as _bpe,
    source_vocab_jaccard as _jacc,
)
from metar_pipeline_spark.queries import REGISTRY, QuerySpec

STAGED: dict[str, QuerySpec] = {}


def register_staged(name: str, oracle: str, doc: str = ""):
    """Dual-register: into the live driver REGISTRY (round 8+) and into
    STAGED so the family stays addressable as a unit (--staged flag)."""

    def deco(fn):
        # Same loud duplicate guard as register() (round-9 ADVICE): a
        # staged name colliding with a normally-registered query must
        # fail at import time, not silently win by import order.
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name!r}")
        spec = QuerySpec(name, fn, oracle, doc)
        STAGED[name] = spec
        REGISTRY[name] = spec
        return fn

    return deco


_JL_IN, _JL_OUT, _JL_SEED = 64, 8, 7
_JL_VALUES = ",\n      ".join(
    f"({j}, {row})"
    for j, row in enumerate(jl_sign_rows(_JL_IN, _JL_OUT, _JL_SEED))
)


@register_staged(
    "jl_random_projection",
    f"""
    SELECT vec_id, j,
           round(list_reduce(
                   list_transform(generate_series(1, len(embedding)),
                                  i -> embedding[i]::DOUBLE * s.signs[i]),
                   (x, y) -> x + y) / {jl_scale(_JL_OUT)!r}, 6) + 0.0 AS p
    FROM embeddings,
         (VALUES {_JL_VALUES}) AS s(j, signs)
    """,
    doc=(
        "Johnson-Lindenstrauss ±1 sign projection of the 64-dim "
        "embeddings to 8 dims (long form): a zero-exchange pure "
        "projection against a deterministic splitmix64 sign matrix — "
        "the ANN-family pre-reduction step"
    ),
)
def jl_random_projection(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return jl_project_long(emb, _JL_IN, _JL_OUT, _JL_SEED)


@register_staged(
    "bpe_merge_candidates",
    r"""
    WITH w AS (
      SELECT word, COUNT(*) AS n FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  x -> x <> '')) AS word
        FROM documents)
      GROUP BY 1
    ),
    p AS (
      SELECT unnest(list_transform(generate_series(1, len(word) - 1),
                                   i -> substr(word, i, 2))) AS pair, n
      FROM w WHERE len(word) >= 2
    ),
    t AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS total FROM p GROUP BY 1
      ORDER BY total DESC, pair LIMIT 20
    )
    SELECT pair, total,
           CAST(ROW_NUMBER() OVER (ORDER BY total DESC, pair) AS INTEGER)
             AS rank
    FROM t
    """,
    doc=(
        "First BPE vocabulary-induction round: top-20 adjacent "
        "character pairs weighted by corpus word frequency — pair "
        "counting off the word-VOCAB frame (Zipf-small), never the "
        "token stream; TakeOrderedAndProject top-k; window-free rank"
    ),
)
def bpe_merge_candidates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return _bpe(docs, k=20)


@register_staged(
    "source_vocab_jaccard",
    r"""
    WITH tok AS (
      SELECT DISTINCT g, word FROM (
        SELECT source AS g,
               unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  x -> x <> '')) AS word
        FROM documents)
    ),
    sz AS (SELECT g, COUNT(*) AS n_vocab FROM tok GROUP BY 1),
    c AS (
      SELECT a.g AS slice_a, b.g AS slice_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b USING (word)
      WHERE a.g < b.g
      GROUP BY 1, 2
    )
    SELECT slice_a, slice_b, sa.n_vocab AS n_a, sb.n_vocab AS n_b,
           CAST(n_common AS BIGINT) AS n_common,
           round(n_common / (sa.n_vocab + sb.n_vocab - n_common), 6)
             AS jaccard
    FROM c
    JOIN sz sa ON sa.g = c.slice_a
    JOIN sz sb ON sb.g = c.slice_b
    """,
    doc=(
        "Pairwise vocabulary Jaccard between sources: the crawl/"
        "snapshot similarity audit — token-keyed self-join (never a "
        "cross join), slice-grain aggs"
    ),
)
def source_vocab_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return _jacc(docs, group_col="source")


@register_staged(
    "hits_supply_graph",
    """
    WITH e AS (
      SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    a1 AS (SELECT supp, COUNT(*) AS s FROM e GROUP BY 1),
    h1 AS (SELECT cust, CAST(SUM(s) AS BIGINT) AS s
           FROM e JOIN a1 USING (supp) GROUP BY 1),
    a2 AS (SELECT supp, CAST(SUM(s) AS BIGINT) AS s
           FROM e JOIN h1 USING (cust) GROUP BY 1),
    h2 AS (SELECT cust, CAST(SUM(s) AS BIGINT) AS s
           FROM e JOIN a2 USING (supp) GROUP BY 1),
    th AS (SELECT 'hub' AS node_type, cust AS node_key, s AS score
           FROM h2 ORDER BY s DESC, cust LIMIT 25),
    ta AS (SELECT 'authority' AS node_type, supp AS node_key, s AS score
           FROM a2 ORDER BY s DESC, supp LIMIT 25)
    SELECT node_type, node_key, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY node_type
                                   ORDER BY score DESC, node_key)
                AS INTEGER) AS rank
    FROM (SELECT * FROM th UNION ALL SELECT * FROM ta)
    """,
    doc=(
        "HITS hubs/authorities on the customer-supplier bipartite "
        "graph (2 authority rounds, exact integer scores): one "
        "equi-join + hash agg per half-step, the PageRank-approved "
        "iteration shape; top-25 per side via TakeOrderedAndProject, "
        "window-free rank on the bounded survivors"
    ),
)
def hits_supply_graph(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_suppkey").alias("supp"),
        )
        .distinct()
    )
    hubs, auths = hits_bipartite(edges, "cust", "supp", iters=2)
    th = hubs.orderBy(F.desc("score"), F.asc("cust")).limit(25)
    ta = auths.orderBy(F.desc("score"), F.asc("supp")).limit(25)
    rh = rank_bounded(
        th, [(-F.col("score")).alias("ns"), F.col("cust")], n=25
    ).select(
        F.lit("hub").alias("node_type"),
        F.col("cust").alias("node_key"),
        "score",
        F.col("rank").cast("int").alias("rank"),
    )
    ra = rank_bounded(
        ta, [(-F.col("score")).alias("ns"), F.col("supp")], n=25
    ).select(
        F.lit("authority").alias("node_type"),
        F.col("supp").alias("node_key"),
        "score",
        F.col("rank").cast("int").alias("rank"),
    )
    return rh.unionByName(ra)


@register_staged(
    "source_centroid_affinity",
    """
    WITH v AS (
      SELECT d.source AS slice, e.embedding
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    ),
    dims AS (
      SELECT slice,
             unnest(generate_series(1, len(embedding))) - 1 AS dim,
             unnest(embedding) AS e
      FROM v
    ),
    cent AS (
      SELECT slice, dim,
             CAST(SUM(CAST(CAST(e AS DOUBLE) AS DECIMAL(38,10)))
                  AS DOUBLE) / COUNT(*) AS c
      FROM dims GROUP BY 1, 2
    ),
    nrm AS (
      SELECT slice,
             sqrt(CAST(SUM(CAST(c * c AS DECIMAL(38,18))) AS DOUBLE))
               AS nrm
      FROM cent GROUP BY 1
    ),
    dots AS (
      SELECT a.slice AS source_a, b.slice AS source_b,
             CAST(SUM(CAST(a.c * b.c AS DECIMAL(38,18))) AS DOUBLE)
               AS dot
      FROM cent a JOIN cent b USING (dim)
      WHERE a.slice < b.slice
      GROUP BY 1, 2
    )
    SELECT source_a, source_b,
           round(dot / (na.nrm * nb.nrm), 6) + 0.0 AS cosine
    FROM dots
    JOIN nrm na ON na.slice = dots.source_a
    JOIN nrm nb ON nb.slice = dots.source_b
    """,
    doc=(
        "Pairwise cosine between per-source embedding CENTROIDS — the "
        "dense sibling of source_vocab_jaccard and the redundancy "
        "measurement behind domain-mixture weights. One corpus pass to "
        "(slice, dim) grain with exact DECIMAL accumulation; every "
        "pairwise op runs on the |slices|x(dim) centroid frame"
    ),
)
def source_centroid_affinity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    v = emb.join(
        docs.select(F.col("doc_id").alias("vec_id"), "source"), "vec_id"
    )
    cent = slice_centroids(v, "source")
    return centroid_affinity(cent).select(
        F.col("slice_a").alias("source_a"),
        F.col("slice_b").alias("source_b"),
        (F.col("cosine") + F.lit(0.0)).alias("cosine"),
    )


# (dedup_containment_pairs graduated from this file into the round-7
# gate's one free window slot — now registered in queries/text_ml.py.)


@register_staged(
    "mixture_temperature_weights",
    """
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
    ),
    z AS (
      SELECT
        CAST(SUM(CAST(sqrt(n_docs) AS DECIMAL(38,10))) AS DOUBLE) AS z5,
        CAST(SUM(CAST(sqrt(sqrt(n_docs)) AS DECIMAL(38,10))) AS DOUBLE)
          AS z25
      FROM c
    )
    SELECT source, n_docs,
           round(sqrt(n_docs) / z5, 6) AS w_half,
           round(sqrt(sqrt(n_docs)) / z25, 6) AS w_quarter
    FROM c, z
    """,
    doc=(
        "Temperature-based mixture weights per source (the "
        "multilingual/domain upsampling rule w_s ∝ n_s^α): α = 0.5 and "
        "0.25 spelled as nested sqrt — IEEE-exact in both engines, "
        "unlike pow() — normalizers DECIMAL-accumulated, one-row "
        "normalizer frame broadcast back"
    ),
)
def mixture_temperature_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    z = counts.agg(
        F.sum(F.sqrt("n_docs").cast("decimal(38,10)"))
        .cast("double")
        .alias("z5"),
        F.sum(F.sqrt(F.sqrt("n_docs")).cast("decimal(38,10)"))
        .cast("double")
        .alias("z25"),
    )
    return counts.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round(F.sqrt("n_docs") / F.col("z5"), 6).alias("w_half"),
        F.round(F.sqrt(F.sqrt("n_docs")) / F.col("z25"), 6).alias(
            "w_quarter"
        ),
    )


from metar_pipeline_spark.operators.temporal_split import (  # noqa: E402
    embargo_split,
)


@register_staged(
    "temporal_embargo_split",
    """
    WITH e AS (
      SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ep
      FROM events
    ),
    q AS (SELECT quantile_cont(ep, 0.7) AS cutoff FROM e)
    SELECT CASE WHEN ep <= cutoff THEN 'train'
                WHEN ep <= cutoff + 259200.0 THEN 'embargo'
                ELSE 'test' END AS split,
           event_type,
           COUNT(*) AS n_events,
           MIN(ep) AS min_ep,
           MAX(ep) AS max_ep
    FROM e, q
    GROUP BY 1, 2
    """,
    doc=(
        "Purged temporal split with a 3-day embargo (de Prado 2018): "
        "train <= exact 0.7 epoch percentile < embargo band < test, so "
        "min(test) - max(train) > embargo by construction — the "
        "autocorrelation-leakage guard beside the hash and "
        "near-dup-cluster splits. One-row boundary broadcast; "
        "integer-epoch convention shared by both engines"
    ),
)
def temporal_embargo_split(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    s = embargo_split(ev, "ts", train_frac=0.7, embargo_s=3 * 86400)
    return s.groupBy("split", "event_type").agg(
        F.count("*").alias("n_events"),
        F.min("ep").alias("min_ep"),
        F.max("ep").alias("max_ep"),
    )


from metar_pipeline_spark.operators.prefix import plan_shards  # noqa: E402


@register_staged(
    "shard_plan_manifest",
    """
    WITH c AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cs
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_chars,
             CAST(floor((cs - n_chars) / 20000.0) AS INTEGER) AS shard_id
      FROM c
    )
    SELECT shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM s
    GROUP BY 1
    """,
    doc=(
        "Token-budget shard manifest: docs walk doc_id order into "
        "~20k-char shards via a DISTRIBUTED weighted prefix sum "
        "(range exchange → per-partition sums → broadcast offsets → "
        "pid-partitioned running window) — the weighted generalization "
        "of distributed_rank; never a single-partition cumsum window. "
        "The oracle IS the unpartitioned window, proving bit-equality"
    ),
)
def shard_plan_manifest(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    s = plan_shards(
        docs.select("doc_id", "n_chars"),
        [F.asc("doc_id")],
        "n_chars",
        budget=20_000,
    )
    return s.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


from metar_pipeline_spark.operators.pca import gram_cells  # noqa: E402


@register_staged(
    "embedding_gram_matrix",
    """
    SELECT (p).i - 1 AS i, (p).j - 1 AS j,
           round(CAST(SUM(CAST((p).v AS DECIMAL(38,12))) AS DOUBLE), 6)
             + 0.0 AS g
    FROM (
      SELECT unnest(flatten(list_transform(
               generate_series(1, len(embedding)), i ->
                 list_transform(generate_series(i, len(embedding)), j ->
                   {'i': i, 'j': j,
                    'v': embedding[i]::DOUBLE * embedding[j]::DOUBLE}))))
             AS p
      FROM embeddings)
    GROUP BY 1, 2
    """,
    doc=(
        "The exact d x d embedding Gram matrix (upper triangle, 2080 "
        "cells at d=64) — the distributed piece of PCA "
        "(operators/pca.py): per-row pair products, DECIMAL partials, "
        "map-side combine bounds the shuffle at d^2 x tasks regardless "
        "of corpus size; the d x d eigensolve is driver-side numpy "
        "(not SQL-expressible), so the GATE checks the Gram agg"
    ),
)
def embedding_gram_matrix(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cells = gram_cells(emb, "embedding", 64)
    return cells.select(
        "i", "j", (F.round("g", 6) + F.lit(0.0)).alias("g")
    )


@register_staged(
    "split_balance_chi2",
    """
    WITH assigned AS (
      SELECT source,
             CASE WHEN u < 0.8 THEN 'train'
                  WHEN u < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT source,
               ((doc_id * 2654435761) % 4294967296 + 0.5)
                 / 4294967296.0 AS u
        FROM documents)
    ),
    cells AS (
      SELECT split, source, COUNT(*) AS observed
      FROM assigned GROUP BY 1, 2
    ),
    bs AS (SELECT split, CAST(SUM(observed) AS BIGINT) AS ns
           FROM cells GROUP BY 1),
    bc AS (SELECT source, CAST(SUM(observed) AS BIGINT) AS nc
           FROM cells GROUP BY 1),
    t AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cells)
    SELECT c.split, c.source, c.observed,
           round(bs.ns * bc.nc / t.n, 6) AS expected,
           round((c.observed - bs.ns * bc.nc / t.n)
                 * (c.observed - bs.ns * bc.nc / t.n)
                 / (bs.ns * bc.nc / t.n), 6) AS chi2_term
    FROM cells c
    JOIN bs USING (split)
    JOIN bc USING (source)
    CROSS JOIN t
    """,
    doc=(
        "Split-balance audit: observed vs expected (independence) "
        "counts per (split, source) cell of the REAL hash splitter, "
        "with per-cell chi-square contributions — the stratification "
        "QA a mixture designer reads before trusting a split. One "
        "corpus-width agg at cell grain; every marginal derives from "
        "the 60-cell frame (empty cells are absent identically on "
        "both engines)"
    ),
)
def split_balance_chi2(spark, sf_dir):
    from metar_pipeline_spark.operators.curation import (
        train_val_test_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    cells = (
        train_val_test_split(docs)
        .groupBy("split", "source")
        .agg(F.count("*").alias("observed"))
    )
    bs = cells.groupBy("split").agg(F.sum("observed").alias("ns"))
    bc = cells.groupBy("source").agg(F.sum("observed").alias("nc"))
    t = cells.agg(F.sum("observed").alias("n"))
    e = F.col("ns") * F.col("nc") / F.col("n")
    return (
        cells.join(bs, "split")
        .join(bc, "source")
        .crossJoin(F.broadcast(t))
        .select(
            "split",
            "source",
            "observed",
            F.round(e, 6).alias("expected"),
            F.round(
                (F.col("observed") - e) * (F.col("observed") - e) / e, 6
            ).alias("chi2_term"),
        )
    )


from metar_pipeline_spark.operators.vocab import (  # noqa: E402
    gram_novelty_by_slice,
)

# Shared tokenizer/shingle SQL fragments (single source of truth with
# the registered dedup family's oracles).
from metar_pipeline_spark.queries.text_ml import (  # noqa: E402
    _DUCK_SHINGLE3,
    _DUCK_TOKS,
)


@register_staged(
    "source_novelty_curve",
    f"""
    WITH tk AS (SELECT source, {_DUCK_TOKS} AS toks FROM documents),
    g AS (
      SELECT DISTINCT source AS slice, gram FROM (
        SELECT source,
               unnest(list_distinct({_DUCK_SHINGLE3})) AS gram
        FROM tk)
    ),
    first AS (SELECT gram, MIN(slice) AS slice FROM g GROUP BY 1),
    new AS (SELECT slice, COUNT(*) AS new_grams FROM first GROUP BY 1),
    tot AS (SELECT slice, COUNT(*) AS n_grams FROM g GROUP BY 1)
    SELECT t.slice, t.n_grams,
           COALESCE(n.new_grams, 0) AS new_grams,
           round(COALESCE(n.new_grams, 0) / t.n_grams, 6) AS novelty_rate
    FROM tot t LEFT JOIN new n ON n.slice = t.slice
    """,
    doc=(
        "Data-collection diminishing-returns curve: per source (in "
        "ingestion order), the count and rate of word-3-grams no "
        "earlier source contributed — gram-grain MIN agg, shuffle "
        "carries grams only, never documents"
    ),
)
def source_novelty_curve(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return gram_novelty_by_slice(docs, "source", "text", shingle_n=3)
