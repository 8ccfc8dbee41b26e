"""operators/vocab.py — BPE merge candidates and slice-vocabulary
Jaccard: hand-computed counts, short-word exclusion, tie order,
pair-join (not cross-join) semantics."""

from __future__ import annotations

from metar_pipeline_spark.operators.vocab import (
    bpe_merge_candidates,
    source_vocab_jaccard,
    word_vocab,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_word_vocab_counts_and_case(spark):
    docs = _docs(spark, [(1, "Ab ab  CD", "s"), (2, "ab", "s")])
    got = {r.word: r.n for r in word_vocab(docs).collect()}
    assert got == {"ab": 3, "cd": 1}


def test_bpe_hand_counts(spark):
    docs = _docs(spark, [(1, "ab ab cd", "s"), (2, "ab xy", "s")])
    rows = bpe_merge_candidates(docs, k=10).collect()
    got = {r.pair: (r.total, r.rank) for r in rows}
    assert got == {"ab": (3, 1), "cd": (1, 2), "xy": (1, 3)}


def test_bpe_single_char_words_carry_no_pair(spark):
    docs = _docs(spark, [(1, "a a a bc", "s")])
    rows = bpe_merge_candidates(docs, k=10).collect()
    assert {r.pair for r in rows} == {"bc"}


def test_bpe_overlapping_pairs_within_word(spark):
    docs = _docs(spark, [(1, "abc abc", "s")])
    got = {r.pair: r.total for r in bpe_merge_candidates(docs, k=10).collect()}
    assert got == {"ab": 2, "bc": 2}


def test_bpe_topk_and_tie_order(spark):
    docs = _docs(spark, [(1, "zz aa zz aa mm", "s")])
    rows = bpe_merge_candidates(docs, k=2).collect()
    ranked = sorted(rows, key=lambda r: r.rank)
    # aa and zz tie at 2; pair-ascending breaks the tie; mm cut by k=2
    assert [(r.pair, r.total, r.rank) for r in ranked] == [
        ("aa", 2, 1),
        ("zz", 2, 2),
    ]


def test_jaccard_hand_case(spark):
    docs = _docs(
        spark,
        [
            (1, "x y", "A"),
            (2, "y z", "B"),
            (3, "q", "C"),
            (4, "y", "B"),  # dup token within B — distinct at slice grain
        ],
    )
    rows = source_vocab_jaccard(docs).collect()
    got = {(r.slice_a, r.slice_b): r for r in rows}
    # only (A, B) share a token; C pairs with nothing
    assert set(got) == {("A", "B")}
    r = got[("A", "B")]
    assert (r.n_a, r.n_b, r.n_common) == (2, 2, 1)
    assert r.jaccard == round(1 / 3, 6)


def test_jaccard_partition_invariance(spark):
    rows = [(i, f"tok{i % 4} shared", f"s{i % 3}") for i in range(30)]
    a = sorted(
        map(tuple, source_vocab_jaccard(_docs(spark, rows)).collect())
    )
    b = sorted(
        map(
            tuple,
            source_vocab_jaccard(_docs(spark, rows).repartition(7)).collect(),
        )
    )
    assert a == b
