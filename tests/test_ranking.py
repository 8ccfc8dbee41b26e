"""operators/ranking.py — distributed rank / bounded rank / ntile.

The contract is BIT-EQUALITY with the window forms they replace
(row_number / ntile over an unpartitioned Window), so every query that
switched to these operators kept its oracle and its driver hash."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.ranking import (
    distributed_rank,
    ntile_from_rank,
    rank_bounded,
)


@pytest.fixture()
def skewed(spark):
    # non-uniform keys, duplicate sort values (tiebreak required),
    # enough rows to span many range partitions
    return (
        spark.range(0, 5000)
        .withColumn("v", (F.col("id") * F.col("id")) % 97)
        .withColumn("neg", -F.col("id"))
    )


def test_distributed_rank_equals_global_row_number(spark, skewed):
    want = skewed.withColumn(
        "rank", F.row_number().over(Window.orderBy("v", "id")).cast("long")
    )
    got = distributed_rank(skewed, [F.asc("v"), F.asc("id")])
    assert (
        want.select("id", "rank")
        .exceptAll(got.select("id", "rank"))
        .count()
        == 0
    )
    assert got.count() == 5000


def test_distributed_rank_desc_and_mixed_order(spark, skewed):
    want = skewed.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("v"), F.asc("id")))
        .cast("long"),
    )
    got = distributed_rank(skewed, [F.desc("v"), F.asc("id")])
    assert (
        want.select("id", "rank")
        .exceptAll(got.select("id", "rank"))
        .count()
        == 0
    )


def test_distributed_rank_invariant_to_partitioning(spark, skewed):
    base = sorted(
        (r.id, r.rank)
        for r in distributed_rank(
            skewed, [F.asc("v"), F.asc("id")], num_partitions=3
        ).collect()
    )
    more = sorted(
        (r.id, r.rank)
        for r in distributed_rank(
            skewed, [F.asc("v"), F.asc("id")], num_partitions=17
        ).collect()
    )
    assert base == more


def test_distributed_rank_plan_has_no_unpartitioned_window(spark, skewed):
    got = distributed_rank(skewed, [F.asc("v"), F.asc("id")])
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            # partitioned form: partition cols (no sort marker) come
            # before the first ASC/DESC-marked sort col
            head = line.split("windowspecdefinition(", 1)[1]
            first_arg = head.split(",", 1)[0]
            assert " ASC" not in first_arg and " DESC" not in first_arg, (
                "unpartitioned window in plan:\n" + line
            )


@pytest.mark.parametrize("k", [1, 3, 7, 10])
@pytest.mark.parametrize("n", [1, 5, 9, 100, 101])
def test_ntile_from_rank_matches_window_ntile(spark, k, n):
    df = spark.range(1, n + 1).withColumnRenamed("id", "r")
    w = Window.orderBy("r")
    want = df.withColumn("b", F.ntile(k).over(w))
    got = df.withColumn(
        "b", ntile_from_rank(F.col("r"), F.lit(n).cast("long"), k)
    )
    assert sorted((r.r, r.b) for r in want.collect()) == sorted(
        (r.r, r.b) for r in got.collect()
    )


def test_rank_bounded_matches_row_number_and_cuts_topn(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, 5.0, "b"), (3, 9.0, "c"), (4, 1.0, "d")],
        "id int, score double, tag string",
    )
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    want = sorted(
        (r.id, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3")
        .collect()
    )
    got_df = rank_bounded(df, [-F.col("score"), F.col("id")], n=3)
    got = sorted((r.id, r.rank) for r in got_df.collect())
    assert got == want
    # all payload columns survive, rank is int
    assert set(got_df.columns) == {"id", "score", "tag", "rank"}
    assert "WindowExec" not in (
        got_df._jdf.queryExecution().executedPlan().toString()
    )


def test_centroid_argmax_tie_rule_and_parity(spark):
    """centroid_argmax must reproduce the (score desc, cid asc) winner
    of the old groupBy/max_by formulation — including exact-tie
    geometries (equidistant centroids -> LOWEST cid wins) — while
    keeping the corpus unshuffled."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.similarity import (
        centroid_argmax,
        dot,
        norm2,
    )

    # centroids: 0=(1,0), 1=(0,1), 2=(1,1)/sqrt2-direction
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "cid long, centvec array<double>",
    )
    rows = spark.createDataFrame(
        [
            (10, [2.0, 0.1]),   # clearly cid 0
            (11, [0.1, 3.0]),   # clearly cid 1
            (12, [1.0, 1.0]),   # exact tie with cid 2 (cos=1) -> cid 2
            (13, [5.0, 5.0]),   # parallel to cid 2 -> cid 2
            (14, [1.0, 0.0]),   # ties cids 0 (cos=1) and 2? no: cos(0)=1 wins -> 0
        ],
        "id long, v array<double>",
    )
    got = {
        r.id: (r.cid, r.s)
        for r in centroid_argmax(rows, cents, "v", score_col="s").collect()
    }
    # max_by reference formulation (the pre-round-7 shape)
    ref = (
        rows.join(F.broadcast(cents))
        .select(
            "id",
            "cid",
            F.round(
                dot(F.col("v"), F.col("centvec"))
                / (norm2(F.col("v")) * norm2(F.col("centvec"))),
                6,
            ).alias("s"),
        )
        .groupBy("id")
        .agg(
            F.max_by(
                F.struct("cid", "s"), F.struct(F.col("s"), -F.col("cid"))
            ).alias("a")
        )
        .select("id", "a.cid", "a.s")
    )
    want = {r.id: (r.cid, r.s) for r in ref.collect()}
    assert got == want
    assert got[12][0] == 2 and got[13][0] == 2 and got[14][0] == 0
    # zero-exchange: no hash exchange anywhere in the assignment plan
    plan = (
        centroid_argmax(rows, cents, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(" not in plan


def test_grouped_topk_equals_naive_per_group_window(spark, skewed):
    """Bit-equality with Window.partitionBy(group): exact top-k under a
    total order is invariant to the level-1 salt split."""
    from metar_pipeline_spark.operators.ranking import grouped_topk

    df = skewed.withColumn("g", F.col("id") % 3)
    naive = (
        df.withColumn(
            "rank",
            F.row_number()
            .over(Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id")))
            .cast("int"),
        )
        .filter(F.col("rank") <= 7)
    )
    got = grouped_topk(
        df, ["g"], [F.desc("v"), F.asc("id")], 7,
        salt=F.pmod(F.col("id"), F.lit(32)),
    )
    assert sorted(
        (r.g, r.id, r.rank) for r in naive.select("g", "id", "rank").collect()
    ) == sorted(
        (r.g, r.id, r.rank) for r in got.select("g", "id", "rank").collect()
    )


def test_grouped_topk_invariant_to_salt_cardinality(spark, skewed):
    from metar_pipeline_spark.operators.ranking import grouped_topk

    df = skewed.withColumn("g", F.col("id") % 2)
    a = sorted(
        (r.g, r.id, r.rank)
        for r in grouped_topk(
            df, ["g"], [F.asc("v"), F.asc("id")], 5,
            salt=F.pmod(F.col("id"), F.lit(4)),
        ).select("g", "id", "rank").collect()
    )
    b = sorted(
        (r.g, r.id, r.rank)
        for r in grouped_topk(
            df, ["g"], [F.asc("v"), F.asc("id")], 5,
            salt=F.pmod(F.col("id"), F.lit(64)),
        ).select("g", "id", "rank").collect()
    )
    assert a == b


def test_grouped_topk_level1_window_is_salted(spark, skewed):
    """The corpus-grain window must be the SALTED one; the group-only
    window runs over the ≤ k·n_salts level-1 survivors."""
    from metar_pipeline_spark.operators.ranking import grouped_topk

    df = skewed.withColumn("g", F.col("id") % 3)
    got = grouped_topk(
        df, ["g"], [F.desc("v"), F.asc("id")], 7,
        salt=F.pmod(F.col("id"), F.lit(32)),
    )
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(g" in plan
    assert "__salt" in plan
