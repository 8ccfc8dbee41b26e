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


def test_gram_novelty_first_slice_wins(spark):
    from metar_pipeline_spark.operators.vocab import gram_novelty_by_slice

    # slices in lexical order: A then B. 2-grams:
    # A: {x y, y z}; B doc1: {x y (old), q r (new)}
    docs = spark.createDataFrame(
        [
            (1, "x y z", "A"),
            (2, "x y", "B"),
            (3, "q r", "B"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.slice: r
        for r in gram_novelty_by_slice(
            docs, "source", "text", shingle_n=2
        ).collect()
    }
    assert got["A"].n_grams == 2 and got["A"].new_grams == 2
    assert got["A"].novelty_rate == 1.0
    assert got["B"].n_grams == 2  # {x y, q r} distinct at slice grain
    assert got["B"].new_grams == 1  # only "q r" is new
    assert got["B"].novelty_rate == 0.5


def test_gram_novelty_totals_partition_invariant(spark):
    from metar_pipeline_spark.operators.vocab import gram_novelty_by_slice

    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 9}" for j in range(6)), f"s{i % 4}")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted(map(tuple, gram_novelty_by_slice(df, "source").collect()))
    b = sorted(
        map(tuple, gram_novelty_by_slice(df.repartition(7), "source").collect())
    )
    assert a == b
    # every gram is new in exactly one slice: Σ new == distinct grams
    total_new = sum(r[2] for r in a)
    import pyspark.sql.functions as F
    from metar_pipeline_spark.operators.textops import tokens, word_shingles

    n_grams = (
        df.select(
            F.explode(word_shingles(tokens(F.col("text")), 3)).alias("g")
        )
        .distinct()
        .count()
    )
    assert total_new == n_grams


def _py_bpe(words: dict[str, int], n_merges: int):
    """Pure-Python reference: Sennrich count-and-greedy-replace."""
    seqs = {w: [c for c in w] for w in words}
    table = []
    for r in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, n in words.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        (a, b), total = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        table.append((r, a, b, a + b, total))
        for w, s in seqs.items():
            out: list[str] = []
            for tok in s:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            seqs[w] = out
    return table


def test_bpe_vocab_merges_matches_reference(spark):
    """The distributed multi-round loop reproduces the sequential
    Sennrich algorithm exactly — counts, tie-breaks, and the greedy
    left-to-right merge application (incl. overlap handling: 'aaaa'
    under merge (a,a) → [aa, aa], never [aa, a, a])."""
    from metar_pipeline_spark.operators.vocab import bpe_vocab_merges

    texts = [
        "low low low lower lowest",
        "new newer newest wide wider",
        "aaaa aaa new new low wide",
        "banana bandana",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    words: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            if len(w) >= 2:
                words[w] = words.get(w, 0) + 1
    want = _py_bpe(words, 5)
    got = sorted(
        (r.merge_round, r.sym_a, r.sym_b, r.merged, r.total)
        for r in bpe_vocab_merges(docs, n_merges=5).collect()
    )
    assert got == sorted(want)


def test_bpe_vocab_merges_runs_out_of_pairs(spark):
    """A corpus whose words collapse to single symbols stops emitting
    rows instead of erroring (sequence(1,0) down-count guard)."""
    from metar_pipeline_spark.operators.vocab import bpe_vocab_merges

    docs = spark.createDataFrame([("ab ab",)], "text string")
    rows = bpe_vocab_merges(docs, n_merges=4).collect()
    assert [(r.merge_round, r.merged, r.total) for r in rows] == [(1, "ab", 2)]


def test_bpe_compression_curve_semantics(spark):
    """Round 0 equals the character baseline (Σ freq × word length over
    ≥2-char words); each merge round removes exactly merge-total tokens
    (every applied merge replaces 2 symbols with 1), so the curve is
    the baseline minus the cumulative merge totals."""
    from metar_pipeline_spark.operators.vocab import (
        bpe_compression_curve,
        bpe_vocab_merges,
    )

    texts = ["low low lower lowest", "new newer newest wide wider"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    base = sum(
        len(w)
        for t in texts
        for w in t.lower().split()
        if len(w) >= 2
    )
    curve = {
        r.merge_round: r.corpus_tokens
        for r in bpe_compression_curve(docs, n_merges=3).collect()
    }
    merges = {
        r.merge_round: r.total
        for r in bpe_vocab_merges(docs, n_merges=3).collect()
    }
    assert curve[0] == base
    run = base
    for r in (1, 2, 3):
        run -= merges[r]
        assert curve[r] == run


def test_bpe_source_compression_partitions_the_corpus_curve(spark):
    """Per-source totals partition the corpus totals exactly: a word's
    final symbol sequence depends only on the word and the shared merge
    table, so Σ_source char/bpe tokens equals the corpus curve's round-0
    and round-N values; every ratio sits in (0, 1]."""
    from metar_pipeline_spark.operators.vocab import (
        bpe_compression_curve,
        bpe_source_compression,
    )

    docs = spark.createDataFrame(
        [
            ("a", "low low lower lowest"),
            ("a", "new newer newest"),
            ("b", "wide wider lowest new"),
            ("c", "banana bandana low"),
        ],
        "source string, text string",
    )
    per_src = bpe_source_compression(docs, n_merges=3).collect()
    curve = {
        r.merge_round: r.corpus_tokens
        for r in bpe_compression_curve(docs, n_merges=3).collect()
    }
    assert sum(r.char_tokens for r in per_src) == curve[0]
    assert sum(r.bpe_tokens for r in per_src) == curve[3]
    for r in per_src:
        assert 0.0 < r.compression_ratio <= 1.0


def test_bpe_exhaustion_stops_loop_not_annihilates(spark):
    """Round-9 ADVICE fix: when pairs run out before n_merges the loop
    BREAKS — the curve stops at the exhaustion round (no NULL
    corpus_tokens rows) and the equity report is computed under the
    merges actually mined (non-empty), instead of an empty winner
    cross-join annihilating the symbol chain."""
    from metar_pipeline_spark.operators.vocab import (
        bpe_compression_curve,
        bpe_source_compression,
        bpe_vocab_merges,
    )

    docs = spark.createDataFrame(
        [("s1", "ab ab"), ("s2", "ab")], "source string, text string"
    )
    # merge table: one rule, then exhausted
    rows = bpe_vocab_merges(docs, n_merges=5).collect()
    assert [(r.merge_round, r.merged, r.total) for r in rows] == [
        (1, "ab", 3)
    ]
    # curve: rounds 0 and 1 only, no NULLs
    curve = {
        r.merge_round: r.corpus_tokens
        for r in bpe_compression_curve(docs, n_merges=5).collect()
    }
    assert curve == {0: 6, 1: 3}
    # equity report: computed under the one mined merge, not empty
    per_src = {
        r.source: (r.char_tokens, r.bpe_tokens)
        for r in bpe_source_compression(
            docs, group_col="source", n_merges=5
        ).collect()
    }
    assert per_src == {"s1": (4, 2), "s2": (2, 1)}


def test_bpe_no_pairs_at_all_yields_empty_table(spark):
    """A corpus with no >=2-char words exhausts at round 1: empty merge
    table with a stable schema, empty curve (the round-0 state is
    itself empty)."""
    from metar_pipeline_spark.operators.vocab import (
        bpe_compression_curve,
        bpe_vocab_merges,
    )

    docs = spark.createDataFrame([("a b c",)], "text string")
    table = bpe_vocab_merges(docs, n_merges=3)
    assert table.columns == [
        "merge_round",
        "sym_a",
        "sym_b",
        "merged",
        "total",
    ]
    assert table.count() == 0
    assert bpe_compression_curve(docs, n_merges=3).count() == 0
