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


def test_projection_shortlist_quality_laws(spark):
    """The production use of a projection is filter-then-rerank:
    shortlist by projected-space cosine, rerank at full width. The
    testdata embeddings are NEAR-ISOTROPIC (the top-8 eigenvalues of
    the Gram carry only ~20% of total variance vs the 12.5% uniform
    floor — measured), so no 8-dim view can shortlist perfectly here;
    the laws that must hold regardless of spectrum shape are
    (a) shortlist recall improves monotonically with the projection
    width, and (b) PCA at width k never does materially worse than JL
    at width k (PCA picks the TOP-variance directions; JL picks random
    ones)."""
    import numpy as np

    from metar_pipeline_spark.operators.pca import pca_fit, pca_project
    from metar_pipeline_spark.operators.projection import jl_project

    emb = load_table(spark, SF, "embeddings")
    base = emb.select("vec_id", "embedding")
    X = np.array(
        [r.embedding for r in base.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    def recall(P, shortlist=50):
        Pn = P / np.maximum(
            np.linalg.norm(P, axis=1, keepdims=True), 1e-12
        )
        rs = []
        for q in range(5):
            full = Xn @ Xn[q]
            proj = Pn @ Pn[q]
            full[q] = -2.0
            proj[q] = -2.0
            t = set(np.argsort(full)[::-1][:10])
            s = set(np.argsort(proj)[::-1][:shortlist])
            rs.append(len(t & s) / 10)
        return sum(rs) / len(rs)

    def jl_mat(k):
        rows = (
            jl_project(base, 64, k, seed=7)
            .orderBy("vec_id")
            .collect()
        )
        return np.array([r.proj for r in rows])

    r8, r16, r32 = (recall(jl_mat(k)) for k in (8, 16, 32))
    assert r8 < r16 < r32, (r8, r16, r32)  # (a) width monotonicity
    assert r32 >= 0.5  # half-width JL already a usable shortlist

    comps, _ = pca_fit(base, "embedding", 64, k=8)
    rows = pca_project(base, comps).orderBy("vec_id").collect()
    r_pca8 = recall(np.array([r.proj for r in rows]))
    assert r_pca8 >= r8 - 0.05, (r_pca8, r8)  # (b) PCA ≥ JL at k
