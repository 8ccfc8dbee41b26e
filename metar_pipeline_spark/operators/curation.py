"""Training-data curation operators — the corpus-preparation steps a
large-scale LLM data pipeline runs after dedup/quality filtering
(beyond the reference, which stops at relational marts; see SURVEY.md
"Beyond-reference training-data operators").

All four are pure DataFrame compositions — no UDFs, no collect — so
they inherit Catalyst pushdown/pruning and scale by partitioning:

- pack_sequences: GPT-style concat-then-chunk packing. Documents are
  concatenated in a deterministic order within a packing domain and
  chunked into fixed token windows; each doc is tagged with the window
  its first token lands in. One shuffle (by domain), one window pass.
- mixture_sample: per-domain quota sampling (data-mixture curation).
  Hash-ranked row_number so the sample is reproducible under any
  partitioning, then quota filter. At 100 TB the rank shuffle is
  per-domain; degenerate domains split via AQE skew handling.
- ngram_overlap: benchmark decontamination. Distinct n-gram digests of
  the (small) eval set are inner-joined against corpus n-grams;
  overlap counts per doc flag contaminated documents. The eval side of
  the join is broadcast — the corpus is never reshuffled.
- redact_pii: regex scrub (emails/phones) with per-doc match counts and
  a digest of the redacted text. Rides the scan; patterns are
  RE2-compatible so any engine applies the same replacements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.textops import tokens, word_shingles

EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def pack_sequences(
    docs: DataFrame,
    window_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """Concat-then-chunk sequence packing.

    Within each packing domain documents are laid out in ``id_col``
    order; ``pack_id`` is the window containing the document's first
    token and ``offset_in_pack`` its start offset there. Exactly the
    layout a renderer that concatenates docs into fixed-length training
    sequences would produce — computed with one cumulative-sum window,
    no Python. At 100 TB, pick a finer domain (e.g. source × day) so no
    single domain serializes the cumsum.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select(F.col(id_col), F.col(domain_col), n_tok.alias("n_tokens"))
        .withColumn("pack_id", F.floor(cum_before / window_tokens))
        .withColumn(
            "offset_in_pack", (cum_before % window_tokens).cast("int")
        )
    )


def mixture_sample(
    docs: DataFrame,
    quota: Column,
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Per-domain quota sampling for data-mixture curation.

    ``quota`` is a per-row Column giving the domain's target count.
    Rows are ranked inside each domain by a salted md5 of the id —
    a total, engine-portable, partitioning-independent order — and the
    first ``quota`` survive. Deterministic: re-running on re-partitioned
    data returns the identical sample.
    """
    rank_key = F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(rank_key, F.col(id_col))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
    )


def ngram_overlap(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many of its
    distinct word n-grams appear anywhere in the eval set.

    Shuffle shape: n-grams travel as md5 digests (32 bytes, never the
    text); the eval digest set is distinct-reduced and broadcast, so
    the corpus side joins in place with no exchange.
    """

    def grams(df: DataFrame) -> DataFrame:
        sh = F.array_distinct(word_shingles(tokens(F.col(text_col)), n))
        return df.select(
            F.col(id_col), F.explode(sh).alias("_g")
        ).select(id_col, F.md5(F.col("_g")).alias("g"))

    eval_grams = eval_set.select(
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col(text_col)), n))
        ).alias("_g")
    ).select(F.md5(F.col("_g")).alias("g")).distinct()

    corpus_grams = grams(corpus)
    totals = corpus_grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    overlaps = (
        corpus_grams.join(F.broadcast(eval_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        totals.join(overlaps, id_col, "left")
        .select(
            F.col(id_col),
            "n_grams",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0))
                / F.greatest(F.col("n_grams"), F.lit(1)),
                6,
            ).alias("overlap_ratio"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scrub emails/phones; report per-doc counts and redacted digest."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


def quality_quantile_filter(
    docs: DataFrame,
    quality: Column,
    q: float,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Keep documents at or above their stratum's q-th quality quantile
    (per-language thresholding, so no language is wiped out by a global
    cutoff — the standard corpus-filtering practice).

    Thresholds are ONE tiny per-stratum aggregate broadcast back
    against the scan — the corpus is never shuffled. Exact interpolated
    percentile on both engines; score AND threshold are rounded to the
    same 6 decimals before the >= so a 1-ulp interpolation difference
    between Spark's percentile and an oracle's quantile_cont can never
    flip a boundary document's membership.
    """
    scored = docs.withColumn("_q", F.round(quality, 6))
    thr = scored.groupBy(stratum_col).agg(
        F.round(F.expr(f"percentile(_q, {q})"), 6).alias("_thr")
    )
    return (
        scored.join(F.broadcast(thr), stratum_col)
        .filter(F.col("_q") >= F.col("_thr"))
        .select(
            F.col(id_col),
            F.col(stratum_col),
            F.col("_q").alias("quality"),
        )
    )


def render_packed_windows(
    docs: DataFrame,
    window_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """Materialize the packed training sequences themselves: the
    domain's token stream (docs concatenated in ``id_col`` order) cut
    into exact ``window_tokens``-length windows — documents SPLIT across
    window boundaries, unlike pack_sequences which only tags each doc's
    start window.

    Shape: one cumsum window per domain (token offsets), one explode
    (token rows carry (domain, global_pos, token) — 8-byte positions,
    not documents), one groupBy(domain, window) re-assembling each
    window's ordered token span. Everything combines map-side; the
    shuffle carries one building window per map task, never the corpus.
    """
    toks = tokens(F.col(text_col))
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    laid = docs.select(
        F.col(id_col), F.col(domain_col), toks.alias("_toks")
    ).select(
        F.col(id_col),
        F.col(domain_col),
        F.col("_toks"),
        F.coalesce(
            F.sum(F.size("_toks")).over(w), F.lit(0).cast("bigint")
        ).alias("_cum"),
    )
    positioned = laid.select(
        domain_col,
        F.posexplode("_toks").alias("_k", "tok"),
        F.col("_cum"),
    ).select(
        domain_col,
        (F.col("_cum") + F.col("_k")).alias("gpos"),
        "tok",
    )
    return (
        positioned.groupBy(
            F.col(domain_col),
            F.floor(F.col("gpos") / window_tokens).alias("window_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("gpos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("window_md5"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style sliding-window chunking: each document cut into
    ``chunk_tokens``-token windows advancing by ``chunk_tokens -
    overlap_tokens``, so consecutive chunks share ``overlap_tokens``
    context (the retrieval-prep twin of render_packed_windows, which
    splits the DOMAIN stream at exact boundaries instead).

    Every chunk is computed as per-row higher-order-function math
    (sequence → slice → digest) and fanned out with explode — a narrow
    generator, not a shuffle; no window, no UDF: the whole operator
    rides the scan and scales embarrassingly.
    A short document (fewer tokens than one chunk) yields exactly one
    (possibly partial) chunk, never zero, so no document silently
    disappears from the retrieval index.

    The token array is staged as a BOUND column before the transform:
    interpreted HOF lambdas re-evaluate captured expressions per
    element, so slicing an inline tokens(text) expression would
    re-tokenize the whole document once per chunk — O(len²/chunk) at
    long-document scale (the lm.py bigram finding, measured 2.1x at
    sf0.1; far worse on real 100k-token documents).

    Output: (id, chunk_id, n_tokens, chunk_md5) — one row per chunk.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    staged = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap_tokens)) / F.lit(stride).cast("double")),
    ).cast("int")
    piece = lambda i: F.slice(toks, i * stride + 1, chunk_tokens)  # noqa: E731
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.size(piece(i)).alias("n_tokens"),
            F.md5(F.concat_ws(" ", piece(i))).alias("chunk_md5"),
        ),
    )
    return staged.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(
        id_col,
        F.col("_c.chunk_id").alias("chunk_id"),
        F.col("_c.n_tokens").alias("n_tokens"),
        F.col("_c.chunk_md5").alias("chunk_md5"),
    )


_HASH_MULT = 2654435761  # Knuth multiplicative constant (mod 2^32)


def hash_unit_01(col) -> Column:
    """Deterministic id → [0, 1): ``((id * 2654435761) mod 2^32 + 0.5)
    / 2^32`` computed overflow-safely for ANY nonnegative 64-bit id.

    The naive ``col * 2654435761`` wraps negative in (non-ANSI) Spark
    once ``col`` ≥ ~2^33 — and ``%`` keeps the sign, so every such id
    mapped below 0 (always "train" in a split). DuckDB instead promotes
    to INT128, silently breaking engine parity. This form reduces the
    id to 32 bits first (``pmod``), then does the 32×32→mod-2^32
    multiply in two 16-bit halves so no intermediate exceeds ~2^48:
    exact on any engine's int64, bit-identical to the naive formula for
    all ids in [0, 2^32) — which is why the registered oracles that
    spell the naive formula in SQL over small test ids still match.
    """
    y = F.pmod(col.cast("long"), F.lit(4294967296))
    hi = F.shiftright(y, 16)  # y < 2^32 ⇒ exact high half
    lo = y - hi * F.lit(65536)
    m = F.pmod(
        F.pmod(hi * F.lit(_HASH_MULT), F.lit(65536)) * F.lit(65536)
        + lo * F.lit(_HASH_MULT),
        F.lit(4294967296),
    )
    return (m + F.lit(0.5)) / F.lit(4294967296.0)


def train_val_test_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[float, float] = (0.8, 0.1),
    out_dir: str | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment (remainder → test).

    The split is a multiplicative integer hash of the id mapped to
    [0, 1) — the same document lands in the same split on any engine,
    partitioning, cluster size, or rerun (the property held-out sets
    MUST have; rand(seed) is partition-dependent). With ``out_dir``
    the assigned frame is also written ``partitionBy("split")`` so
    each split is a partition-pruned read, and the write pays the one
    pass; nothing is re-derived at training time.
    """
    u = hash_unit_01(F.col(id_col))
    train_f, val_f = fractions
    split = (
        F.when(u < F.lit(train_f), F.lit("train"))
        .when(u < F.lit(train_f + val_f), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    assigned = docs.withColumn("split", split)
    if out_dir is not None:
        assigned.write.mode("overwrite").partitionBy("split").parquet(
            out_dir
        )
    return assigned


def length_bucket_padding(
    docs: DataFrame,
    id_col: str,
    len_col,
    n_buckets: int = 8,
) -> DataFrame:
    """Padding-efficiency audit for length-bucketed batching.

    Training dataloaders pad every sequence in a batch to the batch
    max; sorting the corpus into ``n_buckets`` length quantiles first
    (the standard "sorted batching" / bucketing trick) bounds the
    waste to the within-bucket spread. This measures it: per bucket,
    doc count, min/max/total tokens, and padding_frac — the fraction
    of a max-padded bucket that would be pad tokens.

    Scale shape: NTILE needs a total order over n_tokens, but an
    unpartitioned ntile window would sort the ENTIRE corpus-grain
    frame in one task. Instead the bucket comes from
    ``distributed_rank`` (range exchange + per-partition offsets + a
    partitioned window — the parallel cost of a distributed ORDER BY)
    and the closed-form ``ntile_from_rank``, which is bit-identical to
    the window NTILE over the same total order — the oracle's NTILE
    semantics are preserved exactly. The per-bucket aggregate then
    combines map-side.
    """
    from metar_pipeline_spark.operators.ranking import (
        distributed_rank,
        ntile_from_rank,
    )

    s = docs.select(F.col(id_col), len_col.cast("bigint").alias("_len"))
    n = s.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    t = (
        distributed_rank(
            s, [F.asc("_len"), F.asc(id_col)], rank_col="__r"
        )
        .crossJoin(F.broadcast(n))
        .withColumn(
            "bucket", ntile_from_rank(F.col("__r"), F.col("__n"), n_buckets)
        )
    )
    return (
        t.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_len").alias("min_tokens"),
            F.max("_len").alias("max_tokens"),
            F.sum("_len").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "min_tokens",
            "max_tokens",
            "sum_tokens",
            F.round(
                F.lit(1.0)
                - F.col("sum_tokens")
                / (F.col("max_tokens") * F.col("n_docs")).cast("double"),
                6,
            ).alias("padding_frac"),
        )
    )
