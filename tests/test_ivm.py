"""operators/ivm.py — Z-set delta-join algebra: the bilinear identity
Δ(A⋈B) = ΔA⋈B_old + A_old⋈ΔB + ΔA⋈ΔB equals the recompute-diff, with
retraction pairs (updates/deletes) and exact cancellation."""

from __future__ import annotations

from metar_pipeline_spark.operators.ivm import consolidate, zset_delta_join


def _z(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_delta_join_update_and_delete_cancellation(spark):
    """A delete on the left (o1 retracted, o3 inserted) plus an update
    on the right (k1: x→y) — cross terms must cancel exactly so the
    consolidated delta is {-(o1,x), +(o3,y)}: the recompute-diff."""
    sa = "oid string, k string, _w int"
    sb = "k string, val string, _w int"
    a_old = _z(spark, [("o1", "k1", 1)], sa)
    da = _z(spark, [("o3", "k1", 1), ("o1", "k1", -1)], sa)
    b_old = _z(spark, [("k1", "x", 1)], sb)
    db = _z(spark, [("k1", "y", 1), ("k1", "x", -1)], sb)
    dv = consolidate(
        zset_delta_join(a_old, da, b_old, db, "k"),
        ["oid", "k", "val"],
    )
    got = {(r.oid, r.val): r._w for r in dv.collect()}
    assert got == {("o1", "x"): -1, ("o3", "y"): 1}


def test_delta_join_multiplicity_weights(spark):
    """Weights multiply: two left rows on one key joined against a +1
    right insert produce weight +1 each; a duplicated left row (weight
    2) scales the output weight."""
    sa = "oid string, k string, _w int"
    sb = "k string, val string, _w int"
    a_old = _z(spark, [("o1", "k1", 2), ("o2", "k1", 1)], sa)
    da = a_old.limit(0)
    b_old = _z(spark, [], sb)
    db = _z(spark, [("k1", "v", 1)], sb)
    dv = consolidate(
        zset_delta_join(a_old, da, b_old, db, "k"),
        ["oid", "k", "val"],
    )
    got = {(r.oid, r.val): r._w for r in dv.collect()}
    assert got == {("o1", "v"): 2, ("o2", "v"): 1}


def test_consolidate_drops_net_zero(spark):
    z = _z(
        spark,
        [("a", 1), ("a", -1), ("b", 1)],
        "k string, _w int",
    )
    got = {(r.k): r._w for r in consolidate(z, ["k"]).collect()}
    assert got == {"b": 1}


def test_weighted_agg_delta_equals_recompute_diff(spark):
    """Δ(grouped COUNT/SUM) from the delta Z-set alone equals the
    recompute difference: new_state agg − old_state agg, per group."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.ivm import zset_weighted_agg

    s = "g string, v long, _w int"
    # old state: g1 {10, 20}, g2 {5}
    # batch: insert g1:+7, update g2: 5→6, delete g1:10
    dz = _z(
        spark,
        [("g1", 7, 1), ("g2", 5, -1), ("g2", 6, 1), ("g1", 10, -1)],
        s,
    )
    d = zset_weighted_agg(dz, ["g"], sums={"dv": F.col("v")})
    got = {(r.g): (r._n, r.dv) for r in d.collect()}
    # g1: count 2→2 (Δ0), sum 30→27 (Δ-3); g2: count 1→1, sum 5→6 (Δ+1)
    assert got == {"g1": (0, -3), "g2": (0, 1)}


def test_apply_agg_delta_merge_new_group_and_net_zero_drop(spark):
    """Merging the delta into the view: untouched groups pass through,
    new groups appear, a group whose count nets to zero DROPS — the
    retraction case the watermark path cannot express."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )

    view = _z(
        spark,
        [("a", 2, 30), ("b", 1, 5), ("c", 3, 99)],
        "g string, _n long, total long",
    )
    dz = _z(
        spark,
        # delete both of a's rows (group drops), bump b, create d
        [("a", 10, -1), ("a", 20, -1), ("b", 1, 1), ("d", 4, 1)],
        "g string, v long, _w int",
    )
    d = zset_weighted_agg(dz, ["g"], sums={"total": F.col("v")})
    out = apply_agg_delta(view, d, ["g"], ["total"])
    got = {(r.g): (r._n, r.total) for r in out.collect()}
    assert got == {"b": (2, 6), "c": (3, 99), "d": (1, 4)}


def test_apply_agg_delta_equals_full_recompute(spark):
    """End-to-end on generated data: old facts + delta batch maintained
    incrementally equals a full groupBy over the new facts."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )

    facts = spark.range(0, 1000).select(
        (F.col("id") % 37).alias("g"), (F.col("id") * 3 % 101).alias("v")
    )
    old = facts.filter(F.col("v") % 5 != 0)
    ins = facts.filter(F.col("v") % 5 == 0)
    upd = old.filter(F.col("g") == 7)  # bump v by 1000 for group 7
    dz = (
        ins.select("g", "v", F.lit(1).alias("_w"))
        .unionByName(upd.select("g", "v", F.lit(-1).alias("_w")))
        .unionByName(
            upd.select(
                "g", (F.col("v") + 1000).alias("v"), F.lit(1).alias("_w")
            )
        )
    )
    view = old.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("v").alias("total"),
    )
    got = apply_agg_delta(
        view, zset_weighted_agg(dz, ["g"], sums={"total": F.col("v")}),
        ["g"], ["total"],
    )
    new_facts = facts.withColumn(
        "v",
        F.when(
            (F.col("g") == 7) & (F.col("v") % 5 != 0), F.col("v") + 1000
        ).otherwise(F.col("v")),
    )
    want = new_facts.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("v").alias("total"),
    )
    assert sorted((r.g, r._n, r.total) for r in got.collect()) == sorted(
        (r.g, r._n, r.total) for r in want.collect()
    )


def test_delta_log_replay_idempotent_and_rebuilds_view(spark, tmp_path):
    """The durable delta log behind stream_ivm_delta_view: a REPLAYED
    batch overwrites its own _batch partition (no double count), and
    folding the log reconstructs exactly the sequentially-maintained
    view — the crash-recovery contract."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    log = str(tmp_path / "delta_log")
    b0 = _z(spark, [("a", 10, 1), ("b", 5, 1)], "g string, v long, _w int")
    b1 = _z(spark, [("a", 10, -1), ("a", 12, 1), ("c", 7, 1)],
            "g string, v long, _w int")
    d0 = zset_weighted_agg(b0, ["g"], sums={"total": F.col("v")})
    d1 = zset_weighted_agg(b1, ["g"], sums={"total": F.col("v")})
    idempotent_batch_append(d0, log, 0)
    idempotent_batch_append(d1, log, 1)
    # at-least-once replay of batch 1 (the failure mode a plain append
    # would double)
    idempotent_batch_append(d1, log, 1)

    rebuilt = (
        spark.read.parquet(log)
        .groupBy("g")
        .agg(
            F.sum("_n").cast("long").alias("_n"),
            F.sum("total").alias("total"),
        )
        .filter(F.col("_n") != 0)
    )
    view = apply_agg_delta(
        apply_agg_delta(d0.limit(0), d0, ["g"], ["total"]),
        d1, ["g"], ["total"],
    )
    assert sorted(
        (r.g, r._n, r.total) for r in rebuilt.collect()
    ) == sorted((r.g, r._n, r.total) for r in view.collect())
    assert {r.g: r.total for r in rebuilt.collect()} == {
        "a": 12, "b": 5, "c": 7
    }


def test_minmax_delta_retraction_of_extreme_forces_rescan(spark):
    """Hand case (round-10 VERDICT #2): group 'a' retracts its current
    MAX (needs a per-group rescan), group 'b' retracts a non-extreme
    row (algebraic path must suffice), group 'c' is new from inserts,
    group 'd' nets to zero and must drop. Result ≡ full recompute."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.ivm import apply_minmax_delta

    old = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 9), ("b", 2), ("b", 7), ("d", 4)],
        "g string, v int",
    )
    view = old.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    # batch: delete a=9 (a's max → unsafe, rescan), insert b=3
    # (algebraic), delete d=4 (group nets to zero), insert c=6 twice
    # (new group from the delta alone).
    dz = spark.createDataFrame(
        [
            ("a", 9, -1),
            ("b", 3, 1),
            ("d", 4, -1),
            ("c", 6, 1),
            ("c", 6, 1),
        ],
        "g string, v int, _w int",
    )
    base_new = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 2), ("b", 7), ("b", 3),
         ("c", 6), ("c", 6)],
        "g string, v int",
    )
    got = {
        r.g: (r._n, r.min_v, r.max_v)
        for r in apply_minmax_delta(
            view, dz, base_new, ["g"], "v"
        ).collect()
    }
    # full recompute ground truth
    exp = {
        r.g: (r._n, r.min_v, r.max_v)
        for r in base_new.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    assert got == exp
    assert got["a"] == (2, 1, 5)  # rescan found the runner-up max
    assert got["c"] == (2, 6, 6)  # new group from inserts alone
    assert "d" not in got  # net-zero count dropped


def test_minmax_delta_retraction_of_min_and_insert_beyond(spark):
    """Retract the current MIN while the same batch inserts a value
    below it: the rescan must see the post-batch base (insert wins)."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.ivm import apply_minmax_delta

    old = spark.createDataFrame([("g", 3), ("g", 8)], "g string, v int")
    view = old.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    dz = spark.createDataFrame(
        [("g", 3, -1), ("g", 1, 1)], "g string, v int, _w int"
    )
    base_new = spark.createDataFrame(
        [("g", 8), ("g", 1)], "g string, v int"
    )
    got = apply_minmax_delta(view, dz, base_new, ["g"], "v").collect()
    assert len(got) == 1
    assert (got[0]._n, got[0].min_v, got[0].max_v) == (2, 1, 8)


def test_minmax_delta_rescan_is_broadcast_semi_join(spark, tmp_path):
    """Scale pin: the ONLY base read is a broadcast LEFT-SEMI join of
    the affected keys against the post-batch base — never a view-wide
    or base-wide recompute path, and the final merge broadcasts the
    rescan result."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.ivm import apply_minmax_delta

    p = str(tmp_path / "base")
    spark.createDataFrame(
        [("a", 1), ("a", 9), ("b", 2)], "g string, v int"
    ).write.parquet(p)
    base_new = spark.read.parquet(p)
    view = base_new.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    dz = spark.createDataFrame(
        [("a", 9, -1)], "g string, v int, _w int"
    )
    out = apply_minmax_delta(view, dz, base_new, ["g"], "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # the semi join and the rescan merge are both broadcast
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_topk_delta_insert_retraction_and_rescan(spark):
    """apply_topk_delta hand cases: group 'a' loses a stored member
    (rescan must surface the runner-up from base), group 'b' gets an
    insert that displaces the boundary (algebraic path), group 'c'
    retracts a NON-member (no-op for the stored rows). Result ≡ full
    recompute top-2."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.ivm import apply_topk_delta
    from metar_pipeline_spark.operators.ranking import grouped_topk

    old = spark.createDataFrame(
        [("a", 1, 9.0), ("a", 2, 7.0), ("a", 3, 5.0),
         ("b", 4, 8.0), ("b", 5, 6.0), ("b", 6, 4.0),
         ("c", 7, 3.0), ("c", 8, 2.0), ("c", 9, 1.0)],
        "g string, id long, v double",
    )
    k = 2
    order = [F.desc("v"), F.asc("id")]
    view = grouped_topk(
        old, ["g"], order, k, salt=F.pmod(F.col("id"), F.lit(32))
    ).drop("rank")
    dz = spark.createDataFrame(
        [
            ("a", 1, 9.0, -1),   # delete a's #1 -> rescan finds id 3
            ("b", 10, 7.5, 1),   # insert displaces b's #2 (id 5)
            ("c", 9, 1.0, -1),   # delete c's NON-member -> no-op
        ],
        "g string, id long, v double, _w int",
    )
    base_new = spark.createDataFrame(
        [("a", 2, 7.0), ("a", 3, 5.0),
         ("b", 4, 8.0), ("b", 5, 6.0), ("b", 6, 4.0), ("b", 10, 7.5),
         ("c", 7, 3.0), ("c", 8, 2.0)],
        "g string, id long, v double",
    )
    got = sorted(
        (r.g, r.id, r.v, r.rank)
        for r in apply_topk_delta(
            view, dz, base_new, ["g"], "id", "v", k
        ).collect()
    )
    exp = sorted(
        (r.g, r.id, r.v, r.rank)
        for r in grouped_topk(
            base_new, ["g"], order, k,
            salt=F.pmod(F.col("id"), F.lit(32)),
        ).collect()
    )
    assert got == exp
    as_map = {(g, rk): (i, v) for g, i, v, rk in got}
    assert as_map[("a", 2)] == (3, 5.0)  # runner-up surfaced by rescan
    assert as_map[("b", 2)] == (10, 7.5)  # insert displaced the boundary
    assert as_map[("c", 1)] == (7, 3.0)  # non-member retraction: no-op
