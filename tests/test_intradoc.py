"""operators/intradoc.py — paragraph dedup inside documents: first
occurrence wins, reading order preserved, normalized matching, empty
paragraphs dropped, and the doc frame's other columns pass through."""

from __future__ import annotations

from metar_pipeline_spark.operators.intradoc import dedup_paragraphs


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_repeated_paragraph_dropped_first_kept(spark):
    txt = "intro\n\nbody A\n\nintro\n\nbody B\n\nintro"
    out = dedup_paragraphs(_docs(spark, [(1, txt, "en")])).collect()[0]
    assert out.text == "intro\n\nbody A\n\nbody B"
    assert out.n_paragraphs == 5 and out.n_dropped == 2
    assert out.lang == "en"  # passthrough column survives


def test_normalized_matching_keeps_original_form(spark):
    txt = "The  Header\n\ncontent\n\n  the header "
    out = dedup_paragraphs(_docs(spark, [(1, txt, "en")])).collect()[0]
    # the trailing variant normalizes equal to the first — dropped;
    # the KEPT text is the original first occurrence, unmodified
    assert out.text == "The  Header\n\ncontent"
    assert out.n_dropped == 1


def test_order_preserved_across_many_paragraphs(spark):
    paras = [f"p{i}" for i in range(20)]
    txt = "\n\n".join(paras + paras[:5])
    out = dedup_paragraphs(
        _docs(spark, [(1, txt, "en")]).repartition(7)
    ).collect()[0]
    assert out.text == "\n\n".join(paras)
    assert out.n_paragraphs == 25 and out.n_dropped == 5


def test_blank_paragraphs_dropped_and_empty_doc_survives(spark):
    rows = [(1, "a\n\n   \n\nb", "en"), (2, "", "de"), (3, None, "fr")]
    got = {
        r.doc_id: r for r in dedup_paragraphs(_docs(spark, rows)).collect()
    }
    assert got[1].text == "a\n\nb" and got[1].n_paragraphs == 2
    assert got[2].text == "" and got[2].n_paragraphs == 0
    assert got[3].text == "" and got[3].n_dropped == 0
    assert got[3].lang == "fr"


def test_no_duplicates_is_identity_modulo_blank_squeeze(spark):
    txt = "alpha\n\nbeta\n\ngamma"
    out = dedup_paragraphs(_docs(spark, [(1, txt, "en")])).collect()[0]
    assert out.text == txt
    assert out.n_dropped == 0
