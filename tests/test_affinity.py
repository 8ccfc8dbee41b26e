"""operators/affinity.py — slice centroids and centroid cosine:
hand-computed means, identical/orthogonal slices, decimal-accumulation
partition invariance."""

from __future__ import annotations

from metar_pipeline_spark.operators.affinity import (
    centroid_affinity,
    slice_centroids,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "slice string, embedding array<double>"
    )


def test_centroids_hand_means(spark):
    df = _vecs(
        spark,
        [("A", [1.0, 3.0]), ("A", [3.0, 5.0]), ("B", [10.0, 0.0])],
    )
    got = {
        (r.slice, r.dim): r.c
        for r in slice_centroids(df, "slice").collect()
    }
    assert got == {
        ("A", 0): 2.0,
        ("A", 1): 4.0,
        ("B", 0): 10.0,
        ("B", 1): 0.0,
    }


def test_identical_slices_cosine_one(spark):
    df = _vecs(
        spark,
        [("A", [1.0, 2.0, 3.0]), ("B", [2.0, 4.0, 6.0])],  # parallel
    )
    cent = slice_centroids(df, "slice")
    rows = centroid_affinity(cent).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.slice_a, r.slice_b) == ("A", "B")
    assert r.cosine == 1.0


def test_orthogonal_slices_cosine_zero(spark):
    df = _vecs(spark, [("A", [1.0, 0.0]), ("B", [0.0, 5.0])])
    rows = centroid_affinity(slice_centroids(df, "slice")).collect()
    assert rows[0].cosine == 0.0


def test_negative_direction(spark):
    df = _vecs(spark, [("A", [1.0, 0.0]), ("B", [-2.0, 0.0])])
    rows = centroid_affinity(slice_centroids(df, "slice")).collect()
    assert rows[0].cosine == -1.0


def test_partition_invariance(spark):
    import random

    rng = random.Random(5)
    rows = [
        (f"s{i % 4}", [rng.uniform(-1, 1) for _ in range(16)])
        for i in range(100)
    ]
    a = sorted(
        map(
            tuple,
            centroid_affinity(
                slice_centroids(_vecs(spark, rows), "slice")
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            centroid_affinity(
                slice_centroids(_vecs(spark, rows).repartition(7), "slice")
            ).collect(),
        )
    )
    assert a == b  # exact equality: DECIMAL accumulation, not float
