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
