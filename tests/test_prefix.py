"""operators/prefix.py — distributed weighted prefix sum: bit-equal to
the unpartitioned window, partition invariance, rank degeneration,
shard-planner budget rule."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.prefix import (
    distributed_prefix_sum,
    plan_shards,
)


def _df(spark, rows, parts=1):
    d = spark.createDataFrame(rows, "id long, w long")
    return d.repartition(parts) if parts > 1 else d


def test_equals_unpartitioned_window(spark):
    rng = random.Random(9)
    rows = [(i, rng.randint(1, 50)) for i in range(300)]
    rng.shuffle(rows)
    df = _df(spark, rows, parts=11)
    got = {
        r.id: r.cumsum
        for r in distributed_prefix_sum(
            df, [F.asc("id")], "w"
        ).collect()
    }
    want = {
        r.id: r.cs
        for r in df.withColumn(
            "cs",
            F.sum("w").over(
                Window.orderBy("id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        ).collect()
    }
    assert got == want  # exact: integer weights, no float drift


def test_partition_invariance(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
    a = sorted(
        map(
            tuple,
            distributed_prefix_sum(
                _df(spark, rows, 3), [F.asc("id")], "w"
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            distributed_prefix_sum(
                _df(spark, rows, 17), [F.asc("id")], "w",
                num_partitions=5,
            ).collect(),
        )
    )
    assert a == b


def test_unit_weights_degenerate_to_rank(spark):
    rows = [(i, 1) for i in range(50)]
    got = {
        r.id: r.cumsum
        for r in distributed_prefix_sum(
            _df(spark, rows, 7), [F.asc("id")], "w"
        ).collect()
    }
    assert got == {i: i + 1 for i in range(50)}


def test_shard_planner_budget_rule(spark):
    # weights 10 each, budget 25: shards hold rows starting at
    # exclusive-prefix 0,10,20 | 30,40 | 50,... → sizes 3,2,3,2,...
    rows = [(i, 10) for i in range(10)]
    out = plan_shards(
        _df(spark, rows, 4), [F.asc("id")], "w", budget=25
    ).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r.id)
    assert {k: sorted(v) for k, v in by_shard.items()} == {
        0: [0, 1, 2],
        1: [3, 4],
        2: [5, 6, 7],
        3: [8, 9],
    }


def test_shard_never_splits_a_row_and_is_contiguous(spark):
    rng = random.Random(4)
    rows = [(i, rng.randint(5, 40)) for i in range(120)]
    out = sorted(
        plan_shards(
            _df(spark, rows, 9), [F.asc("id")], "w", budget=100
        ).collect(),
        key=lambda r: r.id,
    )
    # shard ids are non-decreasing in walk order (contiguity)
    ids = [r.shard_id for r in out]
    assert ids == sorted(ids)
    # every row appears exactly once
    assert len(out) == 120
