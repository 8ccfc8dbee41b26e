"""operators/boilerplate.py — corpus-wide frequent-line removal:
document-frequency threshold, normalized matching, blank-line
structure preservation, within-doc repeats don't inflate df,
partition invariance."""

from __future__ import annotations

from metar_pipeline_spark.operators.boilerplate import (
    remove_boilerplate_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_frequent_line_removed_everywhere(spark):
    rows = [
        (1, "cookie banner\nreal content one", "en"),
        (2, "cookie banner\nreal content two", "en"),
        (3, "cookie banner\nreal content three", "en"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            _docs(spark, rows), min_docs=3
        ).collect()
    }
    assert out[1].text == "real content one"
    assert out[2].text == "real content two"
    assert all(out[i].n_removed == 1 for i in (1, 2, 3))
    assert all(out[i].n_lines == 2 for i in (1, 2, 3))
    assert out[1].lang == "en"  # passthrough survives


def test_below_threshold_kept(spark):
    rows = [
        (1, "shared twice\nunique a", "en"),
        (2, "shared twice\nunique b", "en"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            _docs(spark, rows), min_docs=3
        ).collect()
    }
    assert out[1].text == "shared twice\nunique a"
    assert out[1].n_removed == 0


def test_normalized_matching(spark):
    rows = [
        (1, "  COOKIE   banner \nbody one", "en"),
        (2, "cookie banner\nbody two", "en"),
        (3, "Cookie  Banner\nbody three", "en"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            _docs(spark, rows), min_docs=3
        ).collect()
    }
    assert out[1].text == "body one"
    assert out[3].text == "body three"


def test_within_doc_repeats_do_not_inflate_df(spark):
    # "menu" appears 3× but inside a single document: df = 1 < 2
    rows = [
        (1, "menu\nmenu\nmenu\ncontent", "en"),
        (2, "other\nstuff", "en"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            _docs(spark, rows), min_docs=2
        ).collect()
    }
    assert out[1].text == "menu\nmenu\nmenu\ncontent"
    assert out[1].n_removed == 0


def test_blank_lines_are_structure_not_content(spark):
    # the blank line appears in every doc but is never blacklisted
    rows = [
        (1, "a\n\nb", "en"),
        (2, "c\n\nd", "en"),
        (3, "e\n\nf", "en"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            _docs(spark, rows), min_docs=2
        ).collect()
    }
    assert out[1].text == "a\n\nb"
    assert out[1].n_lines == 2  # blanks don't count as content


def test_doc_fully_boilerplate_becomes_empty(spark):
    rows = [
        (1, "footer", "en"),
        (2, "footer", "en"),
        (3, "footer", "en"),
        (4, "footer\nactual text", "en"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            _docs(spark, rows), min_docs=3
        ).collect()
    }
    assert out[1].text == ""
    assert out[4].text == "actual text"
    assert out[1].n_removed == 1 and out[1].n_lines == 1


def test_empty_and_null_docs_survive(spark):
    rows = [(1, "", "en"), (2, None, "de"), (3, "x", "fr")]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            _docs(spark, rows), min_docs=2
        ).collect()
    }
    assert out[1].text == "" and out[1].n_lines == 0
    assert out[2].text == "" and out[2].n_removed == 0
    assert out[3].text == "x"


def test_partition_invariance_and_order(spark):
    lines = [f"line {i}" for i in range(12)]
    rows = [
        (1, "\n".join(lines + ["shared footer"]), "en"),
        (2, "shared footer\nown text", "en"),
        (3, "shared footer", "en"),
    ]
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            _docs(spark, rows).repartition(7), min_docs=3
        ).collect()
    }
    assert out[1].text == "\n".join(lines)  # reading order preserved
    assert out[2].text == "own text"
    assert out[3].text == ""
