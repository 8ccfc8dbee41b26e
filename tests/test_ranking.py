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
