"""Property tests (hypothesis) for the round-7 staged operator family.

Laws, not fixtures:
- distributed_prefix_sum ≡ the unpartitioned window under any weights,
  duplicate-free order keys, and any partitioning;
- plan_shards: contiguity, completeness, and the budget rule (a shard
  exceeds the budget only by its own last row);
- containment bounds and its dominance over Jaccard on the same sets.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.containment import containment_on_pairs
from metar_pipeline_spark.operators.dedup import jaccard_on_pairs
from metar_pipeline_spark.operators.prefix import (
    distributed_prefix_sum,
    plan_shards,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

weights = st.lists(
    st.integers(min_value=1, max_value=60), min_size=1, max_size=50
)


@SETTINGS
@given(ws=weights, parts=st.integers(min_value=1, max_value=9))
def test_prefix_sum_law(spark, ws, parts):
    df = spark.createDataFrame(
        list(enumerate(ws)), "id long, w long"
    ).repartition(parts)
    got = {
        r.id: r.cumsum
        for r in distributed_prefix_sum(df, [F.asc("id")], "w").collect()
    }
    acc, want = 0, {}
    for i, w in enumerate(ws):
        acc += w
        want[i] = acc
    assert got == want


@SETTINGS
@given(
    ws=weights,
    budget=st.integers(min_value=10, max_value=200),
)
def test_shard_budget_law(spark, ws, budget):
    df = spark.createDataFrame(list(enumerate(ws)), "id long, w long")
    out = sorted(
        plan_shards(df, [F.asc("id")], "w", budget=budget).collect(),
        key=lambda r: r.id,
    )
    assert len(out) == len(ws)  # completeness, no splits
    sizes: dict[int, int] = {}
    last = 0
    for r in out:
        assert r.shard_id >= last  # contiguity
        last = r.shard_id
        sizes[r.shard_id] = sizes.get(r.shard_id, 0) + r.w
    # budget rule: a shard only exceeds budget by its own LAST row —
    # equivalently, each shard minus its final row fits the budget
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r.w)
    for sid, ww in by_shard.items():
        assert sum(ww[:-1]) < budget


texts = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        min_size=3,
        max_size=12,
    ).map(" ".join),
    min_size=2,
    max_size=6,
)


@SETTINGS
@given(ts=texts)
def test_containment_bounds_and_dominance(spark, ts):
    docs = spark.createDataFrame(
        list(enumerate(ts)), "doc_id long, text string"
    )
    n = len(ts)
    pairs = spark.createDataFrame(
        [(i, j) for i in range(n) for j in range(i + 1, n)],
        "id_a long, id_b long",
    )
    cont = {
        (r.id_a, r.id_b): (r.c_a_in_b, r.c_b_in_a)
        for r in containment_on_pairs(
            pairs, docs, "doc_id", "text", 2
        ).collect()
    }
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_on_pairs(pairs, docs, "doc_id", "text", 2).collect()
    }
    for pair, (ca, cb) in cont.items():
        assert 0.0 <= ca <= 1.0 and 0.0 <= cb <= 1.0
        # containment dominates jaccard (|∩|/min ≥ |∩|/∪); rounding
        # both to 6 keeps the inequality within one ulp of the round
        assert max(ca, cb) >= jac[pair] - 1e-9
