"""operators/corpus_ops.py + operators/diffops.py — corpus statistics
and snapshot-diff semantics on small hand-built frames.

The oracle gate (check_oracle) proves the sf0.01 values; these tests pin
the SEMANTIC edge cases the oracle's data may not exercise: short docs
dropping out of the gram frame, within-document repeats counting as
duplication, one-sided-vocabulary JSD limits, PMI's document-frequency
(not token-frequency) convention, and the NULL-injectivity of the diff
fingerprint.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.corpus_ops import (
    duplicated_span_stats,
    pmi_collocations,
    unigram_js_divergence,
)
from metar_pipeline_spark.operators.diffops import (
    diff_summary,
    row_fingerprint,
    snapshot_diff,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDuplicatedSpans:
    def test_unique_corpus_has_zero_dup(self, spark):
        df = _docs(
            spark,
            [(1, "a b c d"), (2, "e f g h"), (3, "i j k l")],
        )
        out = duplicated_span_stats(df, k=2).collect()
        assert {r.doc_id: r.dup_grams for r in out} == {1: 0, 2: 0, 3: 0}
        assert all(r.dup_frac == 0.0 for r in out)

    def test_cross_doc_duplication_counts_both_sides(self, spark):
        # "a b" appears in docs 1 and 2 — both positions are duplicated
        df = _docs(spark, [(1, "a b x"), (2, "a b y")])
        out = {r.doc_id: r for r in duplicated_span_stats(df, k=2).collect()}
        assert out[1].n_grams == 2 and out[1].dup_grams == 1
        assert out[2].n_grams == 2 and out[2].dup_grams == 1
        assert out[1].dup_frac == 0.5

    def test_within_doc_repeat_is_duplication(self, spark):
        # exact-substring-dedup convention: a gram repeated inside ONE
        # document is duplicated text (Lee et al. count every extra
        # occurrence); the corpus-wide count is 2 even with one doc
        df = _docs(spark, [(1, "a b z a b")])
        out = duplicated_span_stats(df, k=2).collect()[0]
        assert out.n_grams == 4  # (a b)(b z)(z a)(a b)
        assert out.dup_grams == 2  # both "a b" positions

    def test_short_docs_absent(self, spark):
        df = _docs(spark, [(1, "solo"), (2, "a b c")])
        out = duplicated_span_stats(df, k=2).collect()
        assert {r.doc_id for r in out} == {2}


class TestJsDivergence:
    def test_identical_distributions_zero(self, spark):
        df = _docs(spark, [(1, "a b c"), (2, "a b c")])
        row = unigram_js_divergence(df, F.col("doc_id") == 1).collect()[0]
        assert row.jsd_nats == 0.0
        assert row.n_tokens_p == 3 and row.n_tokens_q == 3

    def test_disjoint_distributions_ln2(self, spark):
        # disjoint supports: JSD attains its maximum, ln 2 nats
        df = _docs(spark, [(1, "a a b"), (2, "x y z")])
        row = unigram_js_divergence(df, F.col("doc_id") == 1).collect()[0]
        assert row.jsd_nats == pytest.approx(math.log(2.0), abs=1e-6)
        assert row.vocab_p == 2 and row.vocab_q == 3

    def test_hand_computed_value(self, spark):
        # P over "a a b" = {a:2/3, b:1/3}; Q over "a b b b" =
        # {a:1/4, b:3/4}
        df = _docs(spark, [(1, "a a b"), (2, "a b b b")])
        row = unigram_js_divergence(df, F.col("doc_id") == 1).collect()[0]
        p = {"a": 2 / 3, "b": 1 / 3}
        q = {"a": 1 / 4, "b": 3 / 4}
        want = sum(
            0.5 * p[w] * math.log(p[w] / ((p[w] + q[w]) / 2))
            + 0.5 * q[w] * math.log(q[w] / ((p[w] + q[w]) / 2))
            for w in ("a", "b")
        )
        assert row.jsd_nats == pytest.approx(want, abs=1e-6)


class TestPmi:
    def test_document_frequency_convention(self, spark):
        # "a a a b" contributes ONE (a,b) co-occurrence — document
        # frequency, not token frequency
        rows = [(i, "a a a b") for i in range(5)]
        out = pmi_collocations(
            _docs(spark, rows), min_pair_docs=5, top_n=10
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.w1, r.w2, r.c12) == ("a", "b", 5)
        # c1=c2=5, n_docs=5 → pmi = ln(5*5/(5*5)) = 0
        assert r.pmi == 0.0

    def test_min_support_filters(self, spark):
        rows = [(1, "a b"), (2, "a b"), (3, "c d")]
        out = pmi_collocations(
            _docs(spark, rows), min_pair_docs=2, top_n=10
        ).collect()
        assert [(r.w1, r.w2) for r in out] == [("a", "b")]

    def test_vocab_cap_drops_pathological_docs(self, spark):
        big = " ".join(f"w{i}" for i in range(20))
        rows = [(1, "a b"), (2, "a b"), (3, big)]
        out = pmi_collocations(
            _docs(spark, rows),
            min_pair_docs=1,
            top_n=500,
            max_doc_vocab=5,
        ).collect()
        # doc 3 (vocab 20 > 5) contributes no pairs and is excluded
        # from n_docs; survivors: the (a,b) pair over n_docs=2
        assert [(r.w1, r.w2, r.c12) for r in out] == [("a", "b", 2)]
        assert out[0].pmi == pytest.approx(math.log(2 * 2 / (2 * 2)), abs=1e-6)


class TestSnapshotDiff:
    def _v(self, spark, rows):
        return spark.createDataFrame(rows, "k long, a string, b long")

    def test_four_way_classification(self, spark):
        old = self._v(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
        new = self._v(spark, [(2, "y", 20), (3, "z", 99), (4, "w", 40)])
        got = {
            r.k: r.change_type
            for r in snapshot_diff(old, new, "k", ["a", "b"]).collect()
        }
        assert got == {
            1: "deleted",
            2: "unchanged",
            3: "updated",
            4: "inserted",
        }

    def test_null_shift_is_an_update(self, spark):
        # (NULL, 5) vs ('5', NULL): bare concat_ws skips NULLs and
        # would alias both rows to "5" — the coalesce sentinel keeps
        # the fingerprint injective per column position
        old = self._v(spark, [(1, None, 5)])
        new = self._v(spark, [(1, "5", None)])
        got = snapshot_diff(old, new, "k", ["a", "b"]).collect()
        assert got[0].change_type == "updated"
        # and NULL == NULL is unchanged, not spuriously updated
        same = snapshot_diff(
            self._v(spark, [(1, None, 5)]),
            self._v(spark, [(1, None, 5)]),
            "k",
            ["a", "b"],
        ).collect()
        assert same[0].change_type == "unchanged"

    def test_summary_checksum(self, spark):
        old = self._v(spark, [(1, "x", 1), (2, "y", 2)])
        new = self._v(spark, [(1, "x", 1), (3, "z", 3)])
        s = {
            r.change_type: (r.n_rows, r.key_checksum)
            for r in diff_summary(
                snapshot_diff(old, new, "k", ["a", "b"]), "k"
            ).collect()
        }
        assert s == {
            "unchanged": (1, 1),
            "deleted": (1, 2),
            "inserted": (1, 3),
        }

    def test_fingerprint_column_order_matters(self, spark):
        fp_ab = row_fingerprint([F.lit("a"), F.lit("b")])
        fp_ba = row_fingerprint([F.lit("b"), F.lit("a")])
        row = spark.range(1).select(
            (fp_ab != fp_ba).alias("diff")
        ).collect()[0]
        assert row.diff


class TestSnapshotDiffPruned:
    def _write(self, spark, path, rows):
        df = spark.createDataFrame(rows, "k long, p int, v string")
        df.write.mode("overwrite").partitionBy("p").parquet(path)
        return path

    def test_prunes_identical_partitions(self, spark, tmp_path):
        from metar_pipeline_spark.operators.diffops import (
            snapshot_diff_pruned,
        )

        old_rows = [(i, i % 5, f"v{i}") for i in range(100)]
        # p=2: one update (k=12); p=4: one insert (k=999); others equal
        new_rows = [
            (k, p, "CHANGED" if k == 12 else v) for k, p, v in old_rows
        ] + [(999, 4, "new")]
        po = self._write(spark, str(tmp_path / "old"), old_rows)
        pn = self._write(spark, str(tmp_path / "new"), new_rows)
        old = spark.read.parquet(po)
        new = spark.read.parquet(pn)

        diff, changed = snapshot_diff_pruned(old, new, "p", "k", ["v"])
        assert sorted(r.p for r in changed.collect()) == [2, 4]
        got = {
            r.k: r.change_type
            for r in diff.filter(
                diff.change_type != "unchanged"
            ).collect()
        }
        assert got == {12: "updated", 999: "inserted"}
        # every key the row pass touches lives in a changed partition
        assert diff.count() == 41  # 20 rows in p=2 + 21 in p=4

        # the pass-2 scans must prune at RUNTIME: the changed-partition
        # frame is runtime content, so the pin is a dynamicpruning
        # subquery under the scans' PartitionFilters (inputFiles()
        # ignores pruning — assert via the plan, per the r6 gotcha)
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]

    def test_no_changes_empty_diff(self, spark, tmp_path):
        from metar_pipeline_spark.operators.diffops import (
            snapshot_diff_pruned,
        )

        rows = [(i, i % 3, f"v{i}") for i in range(30)]
        po = self._write(spark, str(tmp_path / "a"), rows)
        pn = self._write(spark, str(tmp_path / "b"), rows)
        diff, changed = snapshot_diff_pruned(
            spark.read.parquet(po), spark.read.parquet(pn), "p", "k", ["v"]
        )
        assert changed.count() == 0
        assert diff.count() == 0

    def test_rollup_is_row_order_independent(self, spark):
        from metar_pipeline_spark.operators.diffops import (
            partition_fingerprints,
        )

        rows = [(i, 0, f"v{i}") for i in range(50)]
        a = spark.createDataFrame(rows, "k long, p int, v string")
        b = spark.createDataFrame(
            list(reversed(rows)), "k long, p int, v string"
        ).repartition(7)
        fa = partition_fingerprints(a, "p", "k", ["v"]).collect()[0]
        fb = partition_fingerprints(b, "p", "k", ["v"]).collect()[0]
        assert (fa.n_rows, fa.fp_sum) == (fb.n_rows, fb.fp_sum)


# ---------------------------------------------------------------------------
# Property tests: brute-force Python twins on random tiny corpora
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

# 4-letter vocabulary on purpose: gram collisions and shared vocab are
# where the corpus laws can break
_word = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


class TestCorpusProperties:
    @_SETTINGS
    @given(_corpus)
    def test_dup_spans_match_bruteforce(self, docs):
        from collections import Counter

        spark = _shared_spark()
        k = 2
        df = _docs(spark, list(enumerate(docs)))
        got = {
            r.doc_id: (r.n_grams, r.dup_grams)
            for r in duplicated_span_stats(df, k=k).collect()
        }
        occ = Counter()
        per_doc = {}
        for i, d in enumerate(docs):
            toks = d.split()
            grams = [
                " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
            ]
            if grams:
                per_doc[i] = grams
                occ.update(grams)
        want = {
            i: (len(g), sum(1 for x in g if occ[x] > 1))
            for i, g in per_doc.items()
        }
        assert got == want

    @_SETTINGS
    @given(_corpus, _corpus)
    def test_jsd_bounded_and_symmetric(self, p_docs, q_docs):
        spark = _shared_spark()
        both = [(i, d) for i, d in enumerate(p_docs)] + [
            (1000 + i, d) for i, d in enumerate(q_docs)
        ]
        # need at least one token on each side for the distributions
        if not any(d.strip() for d in p_docs) or not any(
            d.strip() for d in q_docs
        ):
            return
        df = _docs(spark, both)
        flag = F.col("doc_id") < 1000
        a = unigram_js_divergence(df, flag).collect()[0].jsd_nats
        b = unigram_js_divergence(df, ~flag).collect()[0].jsd_nats
        assert a == b  # symmetric
        assert 0.0 <= a <= math.log(2.0) + 1e-9  # bounded


_SPARK_REF = []


def _shared_spark():
    # hypothesis @given cannot take pytest fixtures; reuse the live
    # session the conftest fixture already built for this process
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()


def test_remove_duplicated_spans_hand_case(spark):
    """The action operator: drop-docs excluded, keep-docs pass through
    token-normalized, trim-docs lose exactly the tokens covered by any
    corpus-duplicated k-gram (survivors close ranks in reading
    order)."""
    from metar_pipeline_spark.operators.corpus_ops import (
        remove_duplicated_spans,
    )

    # k=2 grams; "x y" appears in docs 1 AND 2 → duplicated corpus-wide.
    # doc 1 (trim): tokens [a x y b] — gram "x y" at pos 1 covers
    #   positions 1-2 → kept [a b]
    # doc 2 (drop): excluded from output (but its grams still counted)
    # doc 3 (keep): untouched, re-emitted normalized
    docs = spark.createDataFrame(
        [
            (1, "A x  y b"),
            (2, "x y x y"),
            (3, "Q r s"),
        ],
        "doc_id long, text string",
    )
    verdicts = spark.createDataFrame(
        [(1, "trim"), (2, "drop"), (3, "keep")],
        "doc_id long, verdict string",
    )
    got = {
        r.doc_id: (
            r.verdict,
            r.n_tokens_before,
            r.n_tokens_after,
            r.text,
        )
        for r in remove_duplicated_spans(
            docs, verdicts, k=2
        ).collect()
    }
    assert set(got) == {1, 3}
    assert got[1] == ("trim", 4, 2, "a b")
    assert got[3] == ("keep", 3, 3, "q r s")


def test_remove_duplicated_spans_fully_covered_trim_doc(spark):
    """A trim document whose every position is covered emits the empty
    string with n_tokens_after = 0 — it survives as a row (the caller
    said trim, not drop)."""
    from metar_pipeline_spark.operators.corpus_ops import (
        remove_duplicated_spans,
    )

    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z")], "doc_id long, text string"
    )
    verdicts = spark.createDataFrame(
        [(1, "trim"), (2, "keep")], "doc_id long, verdict string"
    )
    got = {
        r.doc_id: (r.n_tokens_after, r.text)
        for r in remove_duplicated_spans(docs, verdicts, k=2).collect()
    }
    assert got[1] == (0, "")
    assert got[2] == (3, "x y z")


def test_remove_duplicated_spans_incomplete_verdicts_drop(spark):
    """Join contract: a document absent from the verdict table (or
    with a NULL verdict) is treated as drop — an incomplete policy
    table must never silently pass unruled documents."""
    from metar_pipeline_spark.operators.corpus_ops import (
        remove_duplicated_spans,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "e f")],
        "doc_id long, text string",
    )
    verdicts = spark.createDataFrame(
        [(1, "keep"), (3, None)], "doc_id long, verdict string"
    )
    got = {r.doc_id for r in remove_duplicated_spans(docs, verdicts, k=2).collect()}
    assert got == {1}  # 2 absent, 3 NULL -> both dropped
