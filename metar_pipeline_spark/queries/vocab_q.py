"""Round-8 vocabulary-induction queries.

``bpe_vocab_merge_table`` is the iterative extension of the round-7
``bpe_merge_candidates`` single round: the full Sennrich loop (count →
pick top pair → greedy merge → repeat), registered with an oracle that
unrolls every round as a (totals, merged-symbols) CTE pair — the same
unrolled-CTE pattern as the ``pagerank_supply_graph`` oracle.
"""

from __future__ import annotations

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.vocab import (
    bpe_compression_curve,
    bpe_source_compression,
    bpe_vocab_merges,
)
from metar_pipeline_spark.queries import register

_N_MERGES = 6


def _bpe_ctes(n_merges: int = _N_MERGES) -> str:
    """Unrolled-CTE twin of operators/vocab.bpe_vocab_merges.

    Per round r: ``t{r}`` picks the top pair off the previous symbol
    frame (adjacent pairs via two position-aligned ``unnest`` slices,
    the LIMIT 1 total-ordered on (total DESC, a, b)); ``s{r}`` applies
    the merge with a ``list_reduce`` greedy left-to-right fold — the
    no-init/acc-type-equals-element-type constraint is met by folding
    single-element LISTS (the [[l0]]-style trick), so the first symbol
    seeds the accumulator exactly as Spark's ``aggregate`` with an
    empty-array init does.
    """
    head = r"""
    WITH w AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  x -> x <> '')) AS word
        FROM documents)
      GROUP BY 1
    ),
    s0 AS (
      SELECT n, list_transform(generate_series(1, len(word)),
                               i -> substr(word, i, 1)) AS syms
      FROM w WHERE len(word) >= 2
    )"""
    steps = []
    for r in range(1, n_merges + 1):
        p = f"s{r - 1}"
        steps.append(
            f"""
    t{r} AS (
      SELECT a, b, CAST(SUM(n) AS BIGINT) AS total FROM (
        SELECT unnest(list_slice(syms, 1, len(syms) - 1)) AS a,
               unnest(list_slice(syms, 2, len(syms))) AS b,
               n
        FROM {p} WHERE len(syms) >= 2)
      GROUP BY 1, 2
      ORDER BY total DESC, a, b LIMIT 1
    ),
    s{r} AS (
      SELECT s.n,
             list_reduce(list_transform(s.syms, x -> [x]),
               (acc, e) -> CASE WHEN acc[-1] = t.a AND e[1] = t.b
                           THEN list_concat(
                                  list_slice(acc, 1, len(acc) - 1),
                                  [t.a || t.b])
                           ELSE list_concat(acc, e) END) AS syms
      FROM {p} s CROSS JOIN t{r} t
    )"""
        )
    return head + "," + ",".join(steps)


def _bpe_oracle(n_merges: int = _N_MERGES) -> str:
    finals = "\n    UNION ALL\n".join(
        f"    SELECT CAST({r} AS INTEGER) AS merge_round, a AS sym_a,"
        f" b AS sym_b, a || b AS merged, total FROM t{r}"
        for r in range(1, n_merges + 1)
    )
    return _bpe_ctes(n_merges) + "\n" + finals


def _bpe_curve_oracle(n_merges: int = _N_MERGES) -> str:
    # HAVING COUNT(*) > 0 mirrors the operator's exhaustion contract:
    # rounds whose symbol frame annihilated (empty winner upstream)
    # emit NO row — the Spark loop breaks there, and the curve never
    # carries NULL token counts on either engine.
    finals = "\n    UNION ALL\n".join(
        f"    SELECT CAST({r} AS INTEGER) AS merge_round,"
        f" CAST(SUM(n * len(syms)) AS BIGINT) AS corpus_tokens FROM s{r}"
        f" HAVING COUNT(*) > 0"
        for r in range(0, n_merges + 1)
    )
    return _bpe_ctes(n_merges) + "\n" + finals


@register(
    "bpe_vocab_merge_table",
    _bpe_oracle(),
    doc=(
        f"Iterative BPE vocabulary induction: the first {_N_MERGES} "
        "merge rules over the documents corpus — one corpus scan total, "
        "then per round a word-vocab-grain explode + hash agg + "
        "TakeOrderedAndProject(1) and a broadcast 1-row merge fold, "
        "lineage cut per round (operators/vocab.bpe_vocab_merges)"
    ),
)
def bpe_vocab_merge_table(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return bpe_vocab_merges(docs, n_merges=_N_MERGES)


@register(
    "bpe_compression_curve",
    _bpe_curve_oracle(),
    doc=(
        "Tokenizer-training stop rule: corpus token count under the "
        "BPE vocab after each merge round (round 0 = character "
        "baseline) — rides the SAME shared iteration as the merge "
        "table, adding one vocab-grain SUM per checkpointed stage "
        "(operators/vocab.bpe_compression_curve)"
    ),
)
def bpe_compression_curve_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return bpe_compression_curve(docs, n_merges=_N_MERGES)


def _bpe_source_oracle(n_merges: int = _N_MERGES) -> str:
    """Source-grain twin: the corpus-wide t{r} winners (from _bpe_ctes)
    replayed onto a (source, word)-vocab symbol chain ss{r}."""
    head = r""",
    ws AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT source,
               unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  x -> x <> '')) AS word
        FROM documents)
      GROUP BY 1, 2
    ),
    ss0 AS (
      SELECT source, n, len(word) AS chars,
             list_transform(generate_series(1, len(word)),
                            i -> substr(word, i, 1)) AS syms
      FROM ws WHERE len(word) >= 2
    )"""
    steps = []
    for r in range(1, n_merges + 1):
        steps.append(
            f"""
    ss{r} AS (
      SELECT s.source, s.n, s.chars,
             CASE WHEN t.a IS NULL THEN s.syms ELSE
               list_reduce(list_transform(s.syms, x -> [x]),
                 (acc, e) -> CASE WHEN acc[-1] = t.a AND e[1] = t.b
                             THEN list_concat(
                                    list_slice(acc, 1, len(acc) - 1),
                                    [t.a || t.b])
                             ELSE list_concat(acc, e) END)
             END AS syms
      FROM ss{r - 1} s LEFT JOIN t{r} t ON TRUE
    )"""
        )
    return (
        _bpe_ctes(n_merges)
        + head
        + ","
        + ",".join(steps)
        + f"""
    SELECT source,
           CAST(SUM(n * chars) AS BIGINT) AS char_tokens,
           CAST(SUM(n * len(syms)) AS BIGINT) AS bpe_tokens,
           round(CAST(SUM(n * len(syms)) AS DOUBLE)
                 / CAST(SUM(n * chars) AS DOUBLE), 6) AS compression_ratio
    FROM ss{n_merges} GROUP BY source"""
    )


@register(
    "bpe_source_compression",
    _bpe_source_oracle(),
    doc=(
        "Tokenizer-equity audit: per source, the compression the "
        "CORPUS-mined BPE vocab achieves (bpe_tokens / char_tokens) — "
        "the fertility number that exposes under-served domains. Merge "
        "rules ride the shared corpus iteration; the slice frame is "
        "(source, word)-vocab grain with broadcast 1-row merge folds "
        "(operators/vocab.bpe_source_compression / bpe_apply_merges)"
    ),
)
def bpe_source_compression_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return bpe_source_compression(docs, n_merges=_N_MERGES)
