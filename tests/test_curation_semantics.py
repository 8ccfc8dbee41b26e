"""Semantic checks for the curation operators — the behavior the oracle
hash can't articulate: redaction really removes PII, quantile filtering
keeps the intended fraction per stratum, quota sampling honors quotas."""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators import curation as cu
from metar_pipeline_spark.operators import textops as tx

SF_DIR = "/root/testdata/sf0.001"


def test_redact_pii_removes_matches(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice.b@example.org or call +1-555-0199 now"),
            (2, "no contact information here"),
        ],
        "doc_id long, text string",
    )
    redacted = df.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), cu.EMAIL_RE, "<EMAIL>"),
            cu.PHONE_RE,
            "<PHONE>",
        ).alias("clean"),
    )
    rows = {r.doc_id: r.clean for r in redacted.collect()}
    assert "<EMAIL>" in rows[1] and "<PHONE>" in rows[1]
    assert "alice" not in rows[1] and "0199" not in rows[1]
    assert rows[2] == "no contact information here"
    stats = {r.doc_id: r for r in cu.redact_pii(df).collect()}
    assert stats[1].n_emails == 1 and stats[1].n_phones == 1
    assert stats[2].n_emails == 0 and stats[2].n_phones == 0


def test_quality_quantile_filter_keeps_top_fraction_per_stratum(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    )
    kept = cu.quality_quantile_filter(
        docs, tx.quality_score(F.col("text")), 0.6
    )
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    kept_by = {r.lang: r.n for r in kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for lang, total in totals.items():
        frac = kept_by.get(lang, 0) / total
        # >= because of ties at the threshold; keeps roughly the top 40%
        assert 0.35 <= frac <= 0.65, (lang, frac)


def test_mixture_sample_honors_quotas(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    )
    quota = (
        F.when(F.col("source") == "src0", F.lit(2)).otherwise(F.lit(5))
    )
    out = cu.mixture_sample(docs, quota)
    counts = {r.source: r.n for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts["src0"] == 2
    assert all(v == 5 for s, v in counts.items() if s != "src0")


def test_chunk_documents_overlap_properties(spark):
    """Chunking invariants: every doc yields >=1 chunk; chunk sizes are
    full except the tail; consecutive chunks overlap by exactly
    overlap_tokens (token multiset conservation: sum(n_tokens) =
    n + overlap * (n_chunks - 1) whenever the last chunk is longer than
    the overlap)."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.curation import chunk_documents
    from metar_pipeline_spark.operators.textops import tokens

    chunk, ov = 128, 32
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = chunk_documents(docs, chunk, ov)
    per_doc = {
        r.doc_id: r
        for r in got.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("tok_sum"),
            F.min("n_tokens").alias("min_tok"),
            F.max("n_tokens").alias("max_tok"),
        )
        .collect()
    }
    true_len = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n")
        ).collect()
    }
    assert set(per_doc) == set(true_len)  # no doc disappears
    for d, r in per_doc.items():
        n = true_len[d]
        assert r.n_chunks >= 1
        assert r.max_tok <= chunk
        if r.n_chunks > 1:
            # all but the tail are full-size, so the sum double-counts
            # exactly the overlapping spans
            assert r.tok_sum == n + ov * (r.n_chunks - 1), (d, n, dict(r.asDict()))


def test_dedup_canonical_keep_one_survivor_per_cluster(spark):
    """Exactly one kept doc per component; the survivor is the longest
    text (doc_id tiebreak); every dropped doc points at its survivor."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.queries import all_queries

    spec = all_queries()["dedup_canonical_keep"]
    rows = spec.spark_fn(spark, "/root/testdata/sf0.001").collect()
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    lens = {r.doc_id: r.l for r in docs.select(
        "doc_id", F.length("text").alias("l")).collect()}

    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    for comp, members in by_comp.items():
        kept = [m for m in members if m.is_kept]
        assert len(kept) == 1, comp
        k = kept[0]
        assert all(m.kept_doc_id == k.doc_id for m in members)
        best = max(members, key=lambda m: (lens[m.doc_id], -m.doc_id))
        assert k.doc_id == best.doc_id


class TestTrainValTestSplit:
    def test_partitioned_write_and_determinism(self, spark, tmp_path):
        from metar_pipeline_spark.io import load_table
        from metar_pipeline_spark.operators.curation import (
            train_val_test_split,
        )

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        out = str(tmp_path / "splits")
        a1 = train_val_test_split(docs, out_dir=out)
        counts = {
            r["split"]: r["n"]
            for r in a1.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        total = sum(counts.values())
        # 80/10/10 within hash tolerance on 500 docs
        assert 0.7 < counts["train"] / total < 0.9
        assert set(counts) == {"train", "val", "test"}
        # the partitioned store round-trips identically and prunes
        back = spark.read.parquet(out)
        assert back.count() == total
        import os

        assert sorted(
            d for d in os.listdir(out) if d.startswith("split=")
        ) == ["split=test", "split=train", "split=val"]
        # rerun assigns the SAME docs to the same split (derandomized)
        a2 = {
            r["doc_id"]: r["split"]
            for r in train_val_test_split(docs).select("doc_id", "split").collect()
        }
        for r in a1.select("doc_id", "split").collect():
            assert a2[r["doc_id"]] == r["split"]


def test_winnow_guarantee_detects_planted_long_run(spark):
    """MOSS guarantee: two docs sharing an exact run of
    window + shingle_k - 1 = 11 tokens MUST share >= 1 fingerprint;
    disjoint-vocabulary docs must share none."""
    from metar_pipeline_spark.operators import dedup as dd

    shared = " ".join(f"tok{i}" for i in range(11))  # 11-token run
    rows = [
        (1, "alpha beta gamma " + shared + " delta epsilon"),
        (2, shared + " zeta eta theta iota kappa"),
        (3, " ".join(f"other{i}" for i in range(30))),  # disjoint
        (4, "short doc"),  # < shingle_k tokens -> no fingerprints
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared_fps"]
        for r in dd.winnow_span_pairs(
            df, "doc_id", "text", shingle_k=8, window=4
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(k == (1, 2) for k in pairs)
    fps = {
        r["id"]: r["fps"]
        for r in dd.winnow_fingerprints(
            df, "doc_id", "text", shingle_k=8, window=4
        ).collect()
    }
    assert fps[4] == []  # sub-shingle doc yields empty, not null/error


def test_winnow_max_bucket_drops_boilerplate_hashes(spark):
    """A fingerprint shared by more docs than max_bucket is stop-listed
    out of the candidate join (the corpus-scale skew guard)."""
    from metar_pipeline_spark.operators import dedup as dd

    boiler = " ".join(f"lic{i}" for i in range(20))
    rows = [(i, boiler) for i in range(1, 6)]  # 5 identical docs
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = dd.winnow_span_pairs(df, "doc_id", "text").count()
    capped = dd.winnow_span_pairs(
        df, "doc_id", "text", max_bucket=3
    ).count()
    assert full == 10  # all C(5,2) pairs collide
    assert capped == 0  # every fingerprint occupancy is 5 > 3


def test_length_bucket_padding_conservation(spark):
    """Buckets partition the corpus: doc and token totals are conserved,
    padding_frac is within [0, 1), and bucket max is non-decreasing."""
    docs = load_table(spark, SF_DIR, "documents")
    out = (
        cu.length_bucket_padding(
            docs, "doc_id", F.size(tx.tokens(F.col("text"))), n_buckets=8
        )
        .orderBy("bucket")
        .collect()
    )
    assert [r["bucket"] for r in out] == list(range(1, 9))
    assert sum(r["n_docs"] for r in out) == docs.count()
    maxes = [r["max_tokens"] for r in out]
    assert maxes == sorted(maxes)
    for r in out:
        assert 0.0 <= r["padding_frac"] < 1.0
        assert r["min_tokens"] <= r["max_tokens"]


def test_corpus_curation_funnel_is_monotone(spark):
    """Each curation stage can only shrink the corpus; stage 0 equals
    the raw doc count; pct_of_raw is consistent with n_docs."""
    from metar_pipeline_spark.queries import all_queries

    spec = all_queries()["corpus_curation_funnel"]
    rows = sorted(
        spec.spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "raw", "holdout_split", "exact_dedup", "gopher_filter",
        "decontaminated", "quality_top",
    ]
    docs = load_table(spark, SF_DIR, "documents")
    assert rows[0]["n_docs"] == docs.count()
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] <= a["n_docs"]
        assert b["n_tokens"] <= a["n_tokens"]
    for r in rows:
        assert abs(r["pct_of_raw"] - r["n_docs"] / rows[0]["n_docs"]) < 1e-6


def test_winnow_incremental_store_backed_equals_inline(spark, tmp_path):
    """The persisted fingerprint store path (corpus text never re-read)
    returns exactly the inline derivation's verdicts, and no
    corpus-corpus pair is ever reported."""
    from metar_pipeline_spark.operators import dedup as dd

    docs = load_table(spark, SF_DIR, "documents")
    new_docs = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    inline = dd.winnow_incremental_pairs(
        new_docs, corpus, "doc_id", "text"
    )
    store = str(tmp_path / "fp_store")
    (
        dd.winnow_fingerprints(corpus, "doc_id", "text")
        .select("id", F.explode("fps").alias("fp"))
        .write.parquet(store)
    )
    backed = dd.winnow_incremental_pairs(
        new_docs,
        None,
        "doc_id",
        "text",
        corpus_fps=spark.read.parquet(store),
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, backed.collect())
    )
    for r in inline.collect():
        assert r["id_new"] % 10 == 0  # every verdict is about a new doc


def test_winnow_incremental_requires_a_corpus(spark):
    """corpus_docs=None + corpus_fps=None is a contract violation and
    must fail loudly at the call site, not as an opaque AttributeError
    deep inside winnow_fingerprints."""
    import pytest

    from metar_pipeline_spark.operators import dedup as dd

    docs = load_table(spark, SF_DIR, "documents").limit(5)
    with pytest.raises(ValueError, match="corpus_docs.*corpus_fps"):
        dd.winnow_incremental_pairs(docs, None, "doc_id", "text")


def test_neyman_allocation_favors_high_variance_strata(spark):
    """With equal stratum sizes, a zero-variance source gets the
    floor allocation of 1 while the varied source takes essentially
    the whole budget; every stratum is represented; no stratum
    exceeds its allocation."""
    from metar_pipeline_spark.queries import all_queries

    import tempfile

    rows = []
    for i in range(50):  # constant-quality stratum: sigma = 0
        rows.append((i, "x " * 50, "en", "flat", 100))
    for i in range(50, 100):  # wildly varied lengths: sigma >> 0
        text = "word " * (2 + (i % 25) * 40)
        rows.append((i, text, "en", "varied", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = all_queries()["neyman_stratified_sample"].spark_fn(
            spark, d
        ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"flat", "varied"}  # both represented
    assert len(by_src["flat"]) == 1  # sigma=0 -> floor alloc of 1
    # the varied stratum is granted ~the whole budget (alloc 120),
    # capped by its actual size
    assert by_src["varied"][0]["alloc"] >= 100
    assert len(by_src["varied"]) == 50
    for src, members in by_src.items():
        alloc = members[0]["alloc"]
        assert len(members) == min(alloc, members[0]["stratum_n"])
        assert all(m["sample_rank"] <= alloc for m in members)


def test_dup_coverage_consistent_with_winnow_pairs(spark):
    """Cross-operator invariant: a document has dup_coverage > 0 iff it
    appears in some winnow span pair — the coverage aggregate and the
    pair join are two views of the same fingerprint collisions."""
    from metar_pipeline_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    pairs = all_queries()["dedup_winnow_span_pairs"].spark_fn(
        spark, sf
    ).collect()
    cov = all_queries()["dup_span_coverage"].spark_fn(spark, sf).collect()
    in_pairs = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    covered = {r["doc_id"] for r in cov}
    assert covered == in_pairs
    for r in cov:
        assert 0 < r["dup_coverage"] <= 1.0
        assert r["n_shared"] <= r["n_fps"]
