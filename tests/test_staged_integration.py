"""Cross-operator invariants for the round-7 staged family on REAL
testdata (sf0.001), plus plan-shape pins for the new operators.

The invariants are mathematical, not fixture-tuned:
- containment dominates Jaccard (|∩|/min ≥ |∩|/∪), so every pair the
  Jaccard query keeps at θ must appear in the containment query at θ;
- temperature weights are a probability distribution per α;
- centroid affinity is bounded to [-1, 1] and covers every slice pair
  that shares support;
- the embargo invariant holds on the real event stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.containment import (
    lsh_containment_pairs,
)
from metar_pipeline_spark.operators.dedup import minhash_lsh_dedup_pairs
from metar_pipeline_spark.operators.temporal_split import embargo_split
from metar_pipeline_spark.queries.staged import (
    mixture_temperature_weights,
    source_centroid_affinity,
)

SF = "/root/testdata/sf0.001"


def test_containment_dominates_jaccard(spark):
    docs = load_table(spark, SF, "documents")
    jac = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_dedup_pairs(
            docs, "doc_id", "text",
            num_hashes=12, bands=6, shingle_n=3, threshold=0.5,
        ).collect()
    }
    cont = {
        (r.id_a, r.id_b): (r.c_a_in_b, r.c_b_in_a)
        for r in lsh_containment_pairs(
            docs, "doc_id", "text",
            num_hashes=12, bands=6, shingle_n=3, threshold=0.5,
        ).collect()
    }
    assert jac, "fixture has near-dup pairs by construction"
    missing = jac - set(cont)
    assert not missing, f"jaccard pairs missing from containment: {missing}"
    # and the dominance is strict on the scores themselves
    for pair in jac:
        assert max(cont[pair]) >= 0.5


def test_temperature_weights_are_distributions(spark):
    rows = mixture_temperature_weights(spark, SF).collect()
    assert abs(sum(r.w_half for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.w_quarter for r in rows) - 1.0) < 1e-4
    # lower temperature flattens: every below-average source gains
    n_tot = sum(r.n_docs for r in rows)
    for r in rows:
        raw = r.n_docs / n_tot
        if raw < 1.0 / len(rows):
            assert r.w_quarter >= r.w_half >= raw - 1e-9


def test_affinity_bounded_and_complete(spark):
    rows = source_centroid_affinity(spark, SF).collect()
    n_sources = 20
    assert len(rows) == n_sources * (n_sources - 1) // 2
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)


def test_embargo_invariant_on_real_events(spark):
    ev = load_table(spark, SF, "events")
    s = embargo_split(ev, "ts", train_frac=0.7, embargo_s=3 * 86400)
    agg = s.groupBy("split").agg(
        F.min("ep").alias("mn"), F.max("ep").alias("mx")
    )
    got = {r.split: (r.mn, r.mx) for r in agg.collect()}
    assert "train" in got and "test" in got
    assert got["test"][0] - got["train"][1] > 3 * 86400


def test_new_operator_plans_have_no_cartesian(spark):
    docs = load_table(spark, SF, "documents")
    plans = {
        "containment": lsh_containment_pairs(docs, "doc_id", "text"),
        "affinity": source_centroid_affinity(spark, SF),
        "embargo": embargo_split(
            load_table(spark, SF, "events"), "ts"
        ),
    }
    for name, df in plans.items():
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p, name
