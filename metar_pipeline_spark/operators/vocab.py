"""Vocabulary induction and cross-slice vocabulary comparison.

Two corpus-grain text-ML shapes the tokenizer-training stage of a
data pipeline needs:

- ``bpe_merge_candidates``: the first round of byte-pair-encoding
  vocabulary induction (Sennrich et al. 2016) — count every adjacent
  character pair inside every word, weighted by corpus word frequency,
  and surface the top merge candidates. The scale shape collapses the
  corpus to the WORD-VOCAB grain first (one hash agg at word grain —
  Zipf makes this frame tiny relative to the token stream), then
  explodes character pairs off the vocab frame only: the per-pair agg
  never sees corpus-width data. Top-k via orderBy().limit() →
  TakeOrderedAndProject (per-partition heaps), ranked window-free by
  ranking.rank_bounded on the ≤k survivors.

- ``source_vocab_jaccard``: pairwise Jaccard similarity of the
  DISTINCT-token vocabularies of two corpus slices (source × source
  here; any grouping column works). The classic "how similar are two
  data sources / crawl snapshots" audit. Shape: one distinct at
  (slice, token) grain, one self-equi-join ON TOKEN (never a cross
  join — the pair frame is Σ per-token slice-count², bounded by the
  slice count, not the corpus), one hash agg at (slice, slice) grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.ranking import rank_bounded

_WS = r"\s+"


def word_vocab(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n) corpus word frequencies; lowercase, whitespace split."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _WS)
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def bpe_merge_candidates(
    docs: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Top-k adjacent-character merge candidates: (pair, total, rank).

    Words shorter than 2 chars carry no pair (filtered BEFORE the
    sequence() generator on both engines: Spark's sequence(1, 0) counts
    DOWN — it would fabricate indices — while DuckDB's generate_series
    returns empty; the filter keeps the two texts equivalent).
    Ties break on the pair string ascending; total order, so the top-k
    frontier is deterministic.
    """
    vocab = word_vocab(docs, text_col).filter(F.length("word") >= 2)
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        F.col("n"),
    )
    totals = (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("total"))
        .orderBy(F.desc("total"), F.asc("pair"))
        .limit(k)
    )
    return rank_bounded(
        totals, [(-F.col("total")).alias("nt"), F.col("pair")], n=k
    ).select("pair", "total", F.col("rank").cast("int").alias("rank"))


def source_vocab_jaccard(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Pairwise vocabulary Jaccard between slices of ``group_col``.

    Returns (slice_a, slice_b, n_a, n_b, n_common, jaccard) for every
    unordered pair slice_a < slice_b that shares at least one token.
    """
    toks = (
        docs.select(
            F.col(group_col).alias("g"),
            F.explode(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _WS)
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    sizes = toks.groupBy("g").agg(F.count("*").alias("n_vocab"))
    a = toks.alias("a")
    b = toks.alias("b")
    common = (
        a.join(b, on="word")
        .filter(F.col("a.g") < F.col("b.g"))
        .groupBy(
            F.col("a.g").alias("slice_a"), F.col("b.g").alias("slice_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        F.col("g").alias("slice_a"), F.col("n_vocab").alias("n_a")
    )
    sb = sizes.select(
        F.col("g").alias("slice_b"), F.col("n_vocab").alias("n_b")
    )
    return (
        common.join(sa, "slice_a")
        .join(sb, "slice_b")
        .select(
            "slice_a",
            "slice_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                ndigits,
            ).alias("jaccard"),
        )
    )


def gram_novelty_by_slice(
    docs: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Marginal-contribution curve: per slice, how many of its distinct
    word-``shingle_n``-grams appear in NO earlier slice (slices ordered
    by ``slice_col`` ascending — the caller picks a column whose order
    IS the ingestion order).

    The data-collection diminishing-returns audit: a source whose
    novelty_rate ≈ 0 re-crawls what the corpus already holds. Shape:
    one (slice, gram) distinct, one gram-grain MIN agg (first slice to
    contribute each gram — map-side combinable), two slice-grain
    rollups; the shuffle carries only grams, never documents.

    Output: (slice, n_grams, new_grams, novelty_rate).
    """
    from metar_pipeline_spark.operators.textops import (
        tokens as _tokens,
        word_shingles as _shingles,
    )

    g = (
        docs.select(
            F.col(slice_col).alias("slice"),
            _tokens(F.col(text_col)).alias("_t"),
        )
        .select(
            "slice",
            F.explode(
                F.array_distinct(_shingles(F.col("_t"), shingle_n))
            ).alias("gram"),
        )
        .distinct()
    )
    first = g.groupBy("gram").agg(F.min("slice").alias("slice"))
    new = first.groupBy("slice").agg(F.count("*").alias("new_grams"))
    tot = g.groupBy("slice").agg(F.count("*").alias("n_grams"))
    return tot.join(new, "slice", "left").select(
        "slice",
        "n_grams",
        F.coalesce(F.col("new_grams"), F.lit(0)).alias("new_grams"),
        F.round(
            F.coalesce(F.col("new_grams"), F.lit(0)) / F.col("n_grams"), 6
        ).alias("novelty_rate"),
    )


def bpe_vocab_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
) -> DataFrame:
    """Iterative BPE vocabulary induction (Sennrich et al. 2016): mine
    the first ``n_merges`` merge rules by repeatedly (1) counting
    adjacent symbol pairs over the word-vocab frame weighted by corpus
    word frequency, (2) picking the single most frequent pair
    (ties → lexicographic (a, b) ascending, total order), (3) applying
    that merge greedily left-to-right inside every word's symbol
    sequence — the same single-pass non-overlapping replace the
    reference algorithm's ``re.sub`` does.

    Output: one row per round — (merge_round, sym_a, sym_b, merged,
    total),
    the merge TABLE a tokenizer trainer persists.

    Scale shape (the k-means/PageRank iteration pattern): every round
    operates on the word-VOCAB grain frame (Zipf-small relative to the
    token stream — the corpus is scanned exactly once, by the initial
    ``word_vocab`` hash agg). Per round: one vocab-grain explode + hash
    agg + TakeOrderedAndProject(1) for the best pair, one broadcast
    1-row cross join + fold to apply the merge. The symbol frame is
    ``localCheckpoint``-ed each round so the fold chain's lineage stays
    O(1) deep, and the winning pair is checkpointed too (1 row) so its
    two consumers (the output union, the merge join) cannot re-race the
    top-1. Words that shrink below 2 symbols stop contributing pairs
    (filtered BEFORE the sequence() generator — Spark's
    ``sequence(1, 0)`` counts DOWN and would fabricate indices).

    If the corpus runs out of pairs early, the loop STOPS at the
    exhaustion round (no empty winner ever enters the merge chain) and
    the merge table is simply shorter than ``n_merges`` — empty when
    the corpus has no mergeable pair at all.
    """
    from functools import reduce

    out, _, _ = _bpe_rounds(docs, text_col, n_merges)
    if not out:
        return docs.sparkSession.createDataFrame(
            [],
            "merge_round int, sym_a string, sym_b string,"
            " merged string, total bigint",
        )
    return reduce(lambda x, y: x.unionByName(y), out)


def bpe_compression_curve(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
) -> DataFrame:
    """Diminishing-returns curve of the BPE loop: corpus token count
    under the vocabulary after each merge round (round 0 = character
    baseline) — the number a tokenizer-training run watches to decide
    when to stop mining merges.

    Output: (merge_round, corpus_tokens) for rounds 0..n_merges, where
    corpus_tokens = Σ word_freq × |symbol sequence| over the word
    vocab. Single-character words carry no mergeable pair and are
    excluded on both engines (same ≥2-char vocab filter as the merge
    miner), so successive rounds are directly comparable.

    Cost: the same shared iteration as :func:`bpe_vocab_merges` plus
    one tiny vocab-grain SUM per round off the already-checkpointed
    symbol frames — nothing new shuffles.

    Rounds past pair exhaustion are OMITTED (the curve is shorter than
    ``n_merges + 1`` rows), and a vocabulary state that is empty
    outright (no ≥2-char words) emits no row either — the curve never
    contains NULL token counts.
    """
    from functools import reduce

    _, stages, _ = _bpe_rounds(docs, text_col, n_merges)
    out = [
        s.agg(
            F.lit(r).cast("int").alias("merge_round"),
            F.sum(F.col("n") * F.size("syms"))
            .cast("bigint")
            .alias("corpus_tokens"),
        )
        for r, s in enumerate(stages)
    ]
    return reduce(lambda x, y: x.unionByName(y), out).filter(
        F.col("corpus_tokens").isNotNull()
    )


def _bpe_rounds(docs: DataFrame, text_col: str, n_merges: int):
    """Shared BPE iteration: returns (merge_rows, stages, winners)
    where ``merge_rows[r-1]`` is round r's renamed 1-row merge frame,
    ``stages[r]`` the checkpointed symbol frame after r merges
    (``stages[0]`` = the character baseline), and ``winners[r-1]`` the
    raw checkpointed (a, b, total) winner — the form
    :func:`bpe_apply_merges` replays onto other symbol frames."""
    vocab = word_vocab(docs, text_col).filter(F.length("word") >= 2)
    syms = vocab.select(
        "n",
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    out = []
    stages = []
    winners = []
    exhausted = False
    for r in range(1, n_merges + 1):
        syms = syms.localCheckpoint(eager=True)
        stages.append(syms)
        pairs = syms.filter(F.size("syms") >= 2).select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("total"))
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        if not best.head(1):
            # Pair exhaustion: every word is a single merged symbol.
            # Stop BEFORE recording the empty winner — an empty 1-row
            # frame cross-joined into the symbol chain would annihilate
            # it (empty stages, NULL curve rows, empty equity reports).
            # head(1) is a cheap driver read off the eager checkpoint.
            exhausted = True
            break
        winners.append(best)
        out.append(
            best.select(
                F.lit(r).cast("int").alias("merge_round"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.concat("a", "b").alias("merged"),
                F.col("total"),
            )
        )
        syms = (
            syms.crossJoin(
                F.broadcast(
                    best.select(
                        F.col("a").alias("_ma"), F.col("b").alias("_mb")
                    )
                )
            )
            .withColumn("syms", F.expr(_MERGE_FOLD))
            .drop("_ma", "_mb")
        )
    # final stage: single-consumer (the compression curve's one agg),
    # depth-1 fold off the last checkpoint — no checkpoint needed. On
    # exhaustion the pre-merge stage was already recorded and no merge
    # was applied, so there is no new state to append.
    if not exhausted:
        stages.append(syms)
    return out, stages, winners


_MERGE_FOLD = (
    "aggregate(syms, cast(array() as array<string>),"
    " (acc, s) -> CASE WHEN size(acc) > 0"
    "   AND element_at(acc, -1) = _ma AND s = _mb"
    "  THEN concat(slice(acc, 1, size(acc) - 1),"
    "              array(concat(_ma, _mb)))"
    "  ELSE concat(acc, array(s)) END)"
)


def bpe_apply_merges(syms: DataFrame, winners: list) -> DataFrame:
    """Replay an ordered merge table onto any symbol frame (the ENCODE
    side of BPE): each 1-row winner is broadcast-crossed in and applied
    with the same greedy left-to-right fold the miner used; the frame
    is checkpointed per merge so lineage stays O(1). Extra columns
    (grouping keys, weights) pass through untouched."""
    for best in winners:
        syms = (
            syms.localCheckpoint(eager=True)
            .crossJoin(
                F.broadcast(
                    best.select(
                        F.col("a").alias("_ma"), F.col("b").alias("_mb")
                    )
                )
            )
            .withColumn("syms", F.expr(_MERGE_FOLD))
            .drop("_ma", "_mb")
        )
    return syms


def bpe_source_compression(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n_merges: int = 6,
) -> DataFrame:
    """Tokenizer-equity audit: per corpus slice, how well the
    CORPUS-mined BPE vocabulary compresses that slice — the fertility
    number that exposes under-served domains/languages (a slice whose
    ratio stays near 1.0 gains nothing from the shared vocab).

    Output: (group, char_tokens, bpe_tokens, compression_ratio) with
    compression_ratio = bpe_tokens / char_tokens (lower = better
    compressed). Same ≥2-char-word vocab convention as the miner.

    Shape: the merge rules come from the shared corpus-wide iteration
    (one corpus scan); the slice frame is (slice, word)-vocab grain
    (Zipf-small per slice) and each merge is a broadcast 1-row fold —
    nothing corpus-width moves after the two initial hash aggs.

    On early pair exhaustion the report is computed under the merges
    actually mined (the loop stops; no empty winner ever annihilates
    the slice frame), so the audit stays meaningful on small or
    character-poor corpora.
    """
    _, _, winners = _bpe_rounds(docs, text_col, n_merges)
    ws = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.split(
                    F.lower(F.coalesce(F.col(text_col), F.lit(""))), _WS
                )
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("grp", "word")
        .agg(F.count("*").alias("n"))
        .filter(F.length("word") >= 2)
    )
    ss = ws.select(
        "grp",
        "n",
        F.length("word").alias("chars"),
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    ss = bpe_apply_merges(ss, winners)
    return (
        ss.groupBy("grp")
        .agg(
            F.sum(F.col("n") * F.col("chars"))
            .cast("bigint")
            .alias("char_tokens"),
            F.sum(F.col("n") * F.size("syms"))
            .cast("bigint")
            .alias("bpe_tokens"),
        )
        .select(
            F.col("grp").alias(group_col),
            "char_tokens",
            "bpe_tokens",
            F.round(
                F.col("bpe_tokens").cast("double") / F.col("char_tokens"),
                6,
            ).alias("compression_ratio"),
        )
    )
