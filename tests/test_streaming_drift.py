"""streaming/drift.py — per-micro-batch unigram JSD against a broadcast
reference: zero on an identical batch, positive on a shifted one, one
idempotent metrics row per batch, zero streaming state."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.streaming.drift import (
    batch_jsd,
    reference_unigrams,
    run_drift_monitor,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_batch_scores_zero(spark):
    docs = _docs(spark, [(1, "a a b c"), (2, "b c d")])
    ref = reference_unigrams(docs)
    row = batch_jsd(docs, ref).collect()[0]
    assert row.jsd_nats == 0.0
    assert row.n_tokens == 7 and row.vocab == 4


def test_disjoint_batch_scores_ln2(spark):
    ref = reference_unigrams(_docs(spark, [(1, "a b c")]))
    row = batch_jsd(_docs(spark, [(2, "x y z")]), ref).collect()[0]
    assert row.jsd_nats == pytest.approx(math.log(2.0), abs=1e-6)


def test_matches_batch_twin(spark):
    # the streaming scorer against reference P must equal the batch
    # operator's JSD over the two slices
    from metar_pipeline_spark.operators.corpus_ops import (
        unigram_js_divergence,
    )

    p_rows = [(1, "a a b"), (2, "c d a")]
    q_rows = [(100, "a b b b"), (101, "d d e")]
    ref = reference_unigrams(_docs(spark, p_rows))
    got = batch_jsd(_docs(spark, q_rows), ref).collect()[0].jsd_nats
    both = _docs(spark, p_rows + q_rows)
    want = (
        unigram_js_divergence(both, F.col("doc_id") < 100)
        .collect()[0]
        .jsd_nats
    )
    assert got == pytest.approx(want, abs=1e-6)


def test_top_v_truncation_renormalizes(spark):
    ref = reference_unigrams(
        _docs(spark, [(1, "a a a b b c")]), top_v=2
    )
    rows = {r.w: r.p_ref for r in ref.collect()}
    # keeps a (3) and b (2), renormalized over 5
    assert rows == {"a": pytest.approx(0.6), "b": pytest.approx(0.4)}


def test_stream_lands_one_idempotent_row_per_batch(spark, tmp_path):
    docs = _docs(spark, [(i, "a b c" if i % 2 else "a a a") for i in range(20)])
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    ref = reference_unigrams(docs)
    metrics = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")
    q = run_drift_monitor(
        spark, src, ref, metrics, ckpt, schema=docs.schema
    )
    q.awaitTermination()
    out = spark.read.parquet(metrics)
    rows = out.collect()
    assert len(rows) == 1  # availableNow over one dir = one batch
    assert rows[0].jsd_nats == 0.0  # the stream IS the reference corpus
    assert rows[0].n_tokens == 60 - 10 * 0  # 10 odd docs*3 + 10 even*3
    # no state operator: the scorer is stateless per batch
    assert (q.lastProgress.get("stateOperators") or []) == []
    # replay the same batch id -> same single row (partition overwrite)
    from metar_pipeline_spark.streaming.pipeline import (
        idempotent_batch_append,
    )

    idempotent_batch_append(
        batch_jsd(docs, ref).withColumn(
            "batch_id", F.lit(0).cast("long")
        ),
        metrics,
        0,
    )
    assert spark.read.parquet(metrics).count() == 1


def test_trailing_monitor_two_batches(spark, tmp_path):
    """Two ordered micro-batches: batch 0 is the cold-start NULL row,
    batch 1 scores against batch 0's distribution exactly as the
    batch-twin math says; the counts store holds one partition per
    batch."""
    import os
    import time as _t

    from metar_pipeline_spark.streaming.drift import (
        run_trailing_drift_monitor,
    )

    b1 = _docs(spark, [(1, "a a b"), (2, "c d a")])
    b2 = _docs(spark, [(100, "a b b b"), (101, "d d e")])
    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(os.path.join(src, "b1"))
    b2.coalesce(1).write.parquet(os.path.join(src, "b2"))
    # pin distinct mtimes so b1-before-b2 ordering is deterministic
    now = _t.time()
    for sub, mt in (("b1", now - 20), ("b2", now - 10)):
        d = os.path.join(src, sub)
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (mt, mt))

    counts = str(tmp_path / "counts")
    metrics = str(tmp_path / "metrics")
    q = run_trailing_drift_monitor(
        spark,
        src,
        counts,
        metrics,
        str(tmp_path / "ckpt"),
        schema=b1.schema,
    )
    q.awaitTermination()

    got = {
        r.batch_id: r for r in spark.read.parquet(metrics).collect()
    }
    assert set(got) == {0, 1}
    assert got[0].jsd_nats is None  # cold start: no reference yet
    assert got[0].n_tokens == 6
    want = batch_jsd(b2, reference_unigrams(b1)).collect()[0].jsd_nats
    assert got[1].jsd_nats == pytest.approx(want, abs=1e-6)
    # the store holds one _batch partition per batch, at vocab grain
    store = spark.read.parquet(counts)
    assert {r["_batch"] for r in store.select("_batch").collect()} == {0, 1}
    assert (
        store.groupBy("_batch", "w").count().filter("count > 1").count()
        == 0
    )


def test_trailing_monitor_corrupt_store_fails_not_cold_start(
    spark, tmp_path
):
    """A readable-path failure on the counts store must FAIL the batch
    (checkpoint retries it) — never masquerade as cold start: a NULL-jsd
    row for batch N>0 would land different values than a later replay,
    breaking the replay-identical-values contract."""
    import os

    from metar_pipeline_spark.streaming.drift import (
        run_trailing_drift_monitor,
    )

    b1 = _docs(spark, [(1, "a a b"), (2, "c d a")])
    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(os.path.join(src, "b1"))

    # counts store EXISTS but is unreadable garbage — not a cold start
    counts = str(tmp_path / "counts")
    os.makedirs(os.path.join(counts, "_batch=0"))
    with open(
        os.path.join(counts, "_batch=0", "part-junk.parquet"), "wb"
    ) as f:
        f.write(b"this is not parquet")

    q = run_trailing_drift_monitor(
        spark,
        src,
        counts,
        str(tmp_path / "metrics"),
        str(tmp_path / "ckpt"),
        schema=b1.schema,
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    # and no metrics row was committed for the failed batch
    assert not os.path.exists(str(tmp_path / "metrics"))


def test_trailing_monitor_dataless_store_dir_is_cold_start(
    spark, tmp_path
):
    """Round-9 ADVICE fix: a counts dir that EXISTS but holds no data
    files (crashed first-batch write leaving only _temporary/_SUCCESS,
    or an empty dir) is cold start — before, spark.read.parquet threw
    on every retry, permanently poisoning the batch. Genuine corrupt
    data still fails (the corrupt-store test above)."""
    import os

    from metar_pipeline_spark.streaming.drift import (
        run_trailing_drift_monitor,
    )

    b1 = _docs(spark, [(1, "a a b"), (2, "c d a")])
    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(os.path.join(src, "b1"))

    # store dir exists with only write-machinery leftovers, zero data
    counts = str(tmp_path / "counts")
    os.makedirs(os.path.join(counts, "_temporary", "0"))
    open(os.path.join(counts, "_SUCCESS"), "w").close()
    open(
        os.path.join(counts, "_temporary", "0", "part-0.parquet"), "wb"
    ).close()

    metrics = str(tmp_path / "metrics")
    q = run_trailing_drift_monitor(
        spark,
        src,
        counts,
        metrics,
        str(tmp_path / "ckpt"),
        schema=b1.schema,
    )
    q.awaitTermination()

    got = {r.batch_id: r for r in spark.read.parquet(metrics).collect()}
    assert set(got) == {0}
    assert got[0].jsd_nats is None  # treated as cold start
    assert got[0].n_tokens == 6
    # and the batch's counts seeded the store as a real partition
    store = spark.read.parquet(counts)
    assert {r["_batch"] for r in store.select("_batch").collect()} == {0}
