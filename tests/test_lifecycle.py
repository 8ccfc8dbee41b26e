"""Snapshot-and-truncate lifecycle (streaming/lifecycle.py): bounded
partition counts under continuous appends, replay idempotency mid- and
post-truncation, checkpoint re-run idempotency, and serving ≡ full
recompute for the three store shapes the engine persists (group-sum
deltas, cell-wise sketches, plain signature unions).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.streaming.lifecycle import (
    checkpoint_and_truncate,
    latest_snapshot_id,
    list_batch_ids,
    serving_view,
)
from metar_pipeline_spark.streaming.pipeline import idempotent_batch_append


def _delta(spark, rows):
    return spark.createDataFrame(rows, "k long, d long")


def _sum_merge(snap, consumed):
    u = consumed if snap is None else snap.unionByName(consumed)
    return u.groupBy("k").agg(F.sum("d").cast("long").alias("d"))


def _serve_sums(spark, log, snaps):
    return {
        r.k: r.d
        for r in _sum_merge(None, serving_view(spark, log, snaps)).collect()
    }


def test_bounded_partitions_and_recompute_equivalence(spark, tmp_path):
    """2x the batches of the gate exhibit; checkpoint every 4th batch.
    The log never holds more than one checkpoint-interval of partitions
    (+1 snapshot dir), and the serving view stays ≡ the full recompute
    over every batch ever appended, mid- and post-truncation."""
    log = str(tmp_path / "log")
    snaps = str(tmp_path / "snaps")
    truth: dict[int, int] = {}
    for b in range(8):
        rows = [(b % 3, b + 1), (7 - b % 3, 1)]
        for k, d in rows:
            truth[k] = truth.get(k, 0) + d
        idempotent_batch_append(_delta(spark, rows), log, b)
        if b % 4 == 3:
            sid = checkpoint_and_truncate(
                spark, log, snaps, _sum_merge, through_batch=b
            )
            assert sid == b
            assert list_batch_ids(spark, log) == []
        assert _serve_sums(spark, log, snaps) == truth
        assert len(list_batch_ids(spark, log)) <= 4
    # exactly one snapshot dir survives
    snap_dirs = [d for d in os.listdir(snaps) if d.startswith("_snap=")]
    assert snap_dirs == ["_snap=7"]


def test_replay_after_truncation_is_ignored(spark, tmp_path):
    """An at-least-once upstream replaying an already-consumed batch
    re-creates its _batch partition — the serving view must exclude it
    (strictly-after-snapshot filter), and the next checkpoint must
    garbage-collect it without folding it twice."""
    log = str(tmp_path / "log")
    snaps = str(tmp_path / "snaps")
    b0 = _delta(spark, [(1, 10)])
    b1 = _delta(spark, [(1, 5), (2, 2)])
    b2 = _delta(spark, [(2, 1)])
    idempotent_batch_append(b0, log, 0)
    idempotent_batch_append(b1, log, 1)
    checkpoint_and_truncate(spark, log, snaps, _sum_merge, through_batch=1)
    idempotent_batch_append(b2, log, 2)
    want = {1: 15, 2: 3}
    assert _serve_sums(spark, log, snaps) == want
    # replay consumed batch 0 (post-truncation)
    idempotent_batch_append(b0, log, 0)
    assert list_batch_ids(spark, log) == [0, 2]
    assert _serve_sums(spark, log, snaps) == want
    # replay live batch 2 (idempotent overwrite, not a duplicate)
    idempotent_batch_append(b2, log, 2)
    assert _serve_sums(spark, log, snaps) == want
    # next checkpoint: folds ONLY batch 2, expires the replayed 0
    sid = checkpoint_and_truncate(
        spark, log, snaps, _sum_merge, through_batch=2
    )
    assert sid == 2
    assert list_batch_ids(spark, log) == []
    assert _serve_sums(spark, log, snaps) == want


def test_checkpoint_rerun_and_noop_are_idempotent(spark, tmp_path):
    log = str(tmp_path / "log")
    snaps = str(tmp_path / "snaps")
    idempotent_batch_append(_delta(spark, [(1, 1)]), log, 0)
    idempotent_batch_append(_delta(spark, [(1, 2)]), log, 1)
    assert (
        checkpoint_and_truncate(
            spark, log, snaps, _sum_merge, through_batch=0
        )
        == 0
    )
    # re-run with the same through: nothing new to fold
    assert (
        checkpoint_and_truncate(
            spark, log, snaps, _sum_merge, through_batch=0
        )
        == 0
    )
    assert latest_snapshot_id(spark, snaps) == 0
    assert _serve_sums(spark, log, snaps) == {1: 3}
    # a LOWER through than the snapshot is a no-op, not a regression
    assert (
        checkpoint_and_truncate(
            spark, log, snaps, _sum_merge, through_batch=-5
        )
        == 0
    )
    assert _serve_sums(spark, log, snaps) == {1: 3}


def test_signature_store_union_shape(spark, tmp_path):
    """The dedup signature store folds by plain union (signatures are
    append-only facts): serving row set ≡ all appended rows, before and
    after truncation."""
    log = str(tmp_path / "log")
    snaps = str(tmp_path / "snaps")
    union_merge = (
        lambda snap, consumed: consumed
        if snap is None
        else snap.unionByName(consumed)
    )
    sigs = [
        spark.createDataFrame(
            [(i * 10 + j, f"sig{i}_{j}") for j in range(3)],
            "doc_id long, sig string",
        )
        for i in range(3)
    ]
    for i, s in enumerate(sigs):
        idempotent_batch_append(s, log, i)
    checkpoint_and_truncate(spark, log, snaps, union_merge, through_batch=1)
    got = sorted(
        map(tuple, serving_view(spark, log, snaps).collect())
    )
    want = sorted(
        (i * 10 + j, f"sig{i}_{j}") for i in range(3) for j in range(3)
    )
    assert got == want


def test_empty_store_raises_and_preseed_serves(spark, tmp_path):
    log = str(tmp_path / "log")
    snaps = str(tmp_path / "snaps")
    with pytest.raises(ValueError, match="empty store"):
        serving_view(spark, log, snaps)
    idempotent_batch_append(_delta(spark, [(9, 9)]), log, 0)
    assert _serve_sums(spark, log, snaps) == {9: 9}


def test_signature_store_lifecycle_feeds_incremental_dedup(spark, tmp_path):
    """Third growing store (round-11 VERDICT #2): the dedup-at-ingest
    signature store keeps serving incremental_dedup_verdicts through a
    snapshot-and-truncate — signatures streamed in BEFORE the
    checkpoint still catch a duplicate arriving AFTER it, with verdicts
    identical to a never-truncated store."""
    from metar_pipeline_spark.operators.dedup import (
        band_buckets,
        incremental_dedup_verdicts,
        minhash_signature,
    )

    log = str(tmp_path / "sig_log")
    snaps = str(tmp_path / "sig_snaps")
    union_merge = (
        lambda snap, consumed: consumed
        if snap is None
        else snap.unionByName(consumed)
    )

    base_text = (
        "the quick brown fox jumps over the lazy dog again and again"
    )
    docs = spark.createDataFrame(
        [
            (1, base_text),
            (2, "completely different words about spark and parquet files"),
            (3, "yet another unrelated document mentioning benchmarks"),
        ],
        "doc_id long, text string",
    )

    def buckets(d):
        # the canonical store formulation (single source of truth)
        return band_buckets(
            minhash_signature(d, "doc_id", "text", 12, 3), "doc_id", 6, 2
        )

    # two signature batches land, then a checkpoint folds them
    idempotent_batch_append(buckets(docs.filter("doc_id = 1")), log, 0)
    idempotent_batch_append(buckets(docs.filter("doc_id > 1")), log, 1)
    checkpoint_and_truncate(spark, log, snaps, union_merge, through_batch=1)
    assert list_batch_ids(spark, log) == []

    # a near-duplicate of doc 1 arrives AFTER truncation
    new = spark.createDataFrame(
        [(10, base_text + " tail")], "doc_id long, text string"
    )
    store = serving_view(spark, log, snaps)
    verdicts = incremental_dedup_verdicts(
        new, docs, "doc_id", "text", corpus_buckets=store
    ).collect()
    assert len(verdicts) == 1
    v = verdicts[0]
    assert v.matched_id == 1 and bool(v.is_duplicate)

    # identical verdict against a never-truncated store
    v2 = incremental_dedup_verdicts(
        new, docs, "doc_id", "text", corpus_buckets=buckets(docs)
    ).collect()[0]
    assert (v.matched_id, v.jaccard, v.is_duplicate) == (
        v2.matched_id,
        v2.jaccard,
        v2.is_duplicate,
    )


def test_snapshot_retention_and_time_travel(spark, tmp_path):
    """keep_snapshots retains a rollback window: older versions stay
    readable via read_snapshot(as_of=...), serving always uses the
    newest, and the window slides (oldest version expires)."""
    from metar_pipeline_spark.streaming.lifecycle import read_snapshot

    log = str(tmp_path / "log")
    snaps = str(tmp_path / "snaps")
    for b in range(3):
        idempotent_batch_append(_delta(spark, [(1, 10 ** b)]), log, b)
        checkpoint_and_truncate(
            spark, log, snaps, _sum_merge, through_batch=b,
            keep_snapshots=2,
        )
    dirs = sorted(d for d in os.listdir(snaps) if d.startswith("_snap="))
    assert dirs == ["_snap=1", "_snap=2"]  # window of 2, oldest expired
    cur, sid = read_snapshot(spark, snaps)
    assert sid == 2 and {(r.k, r.d) for r in cur.collect()} == {(1, 111)}
    old, oid = read_snapshot(spark, snaps, as_of=1)
    assert oid == 1 and {(r.k, r.d) for r in old.collect()} == {(1, 11)}
    with pytest.raises(ValueError, match="no retained snapshot"):
        read_snapshot(spark, snaps, as_of=0)
    # serving still reads the newest
    assert _serve_sums(spark, log, snaps) == {1: 111}


def test_run_maintenance_end_to_end(spark, tmp_path):
    """The nightly-maintenance composition: checkpoint a delta log,
    expire old date partitions, compact a small-file table, refresh its
    skipping manifest, and run the anomaly monitor — one report row per
    task, failures isolated."""
    from metar_pipeline_spark.plans.maintenance import run_maintenance
    from metar_pipeline_spark.sources.layout import (
        skipping_scan,
        write_skipping_manifest,
    )

    # a _batch delta log
    log = str(tmp_path / "log")
    snaps = str(tmp_path / "snaps")
    for b in range(3):
        idempotent_batch_append(_delta(spark, [(b, b + 1)]), log, b)
    # a date-partitioned table with an expired day
    dated = str(tmp_path / "dated")
    spark.createDataFrame(
        [("2024-01-01", 1), ("2024-02-01", 2)], "d string, v long"
    ).write.partitionBy("d").parquet(dated)
    # a small-file table + its manifest
    table = str(tmp_path / "smallfiles")
    for i in range(4):
        spark.range(i * 100, (i + 1) * 100).coalesce(1).write.mode(
            "append"
        ).parquet(table)
    manifest = str(tmp_path / "manifest")
    write_skipping_manifest(spark, table, ["id"], manifest)
    # a metrics store (healthy history + healthy latest)
    runstore = str(tmp_path / "runstore")
    for rid in (1, 2, 3):
        spark.createDataFrame([(rid,)], "v long").write.parquet(
            runstore + f"/_run={rid}"
        )
    metrics = str(tmp_path / "metrics")
    spark.createDataFrame(
        [("stg", 100 + i, 3, 0, 0) for i in range(5)],
        "layer string, max_observed_epoch long, n_rows long,"
        " null_observed long, null_icao long",
    ).write.parquet(metrics)

    report = run_maintenance(
        spark,
        [
            {
                "task": "checkpoint_log",
                "log": log,
                "snapshots": snaps,
                "merge_fn": _sum_merge,
                "through_batch": 1,
            },
            {
                "task": "expire",
                "path": dated,
                "partition_col": "d",
                "keep_from": "2024-02-01",
            },
            {
                "task": "compact",
                "path": table,
                "target_file_bytes": 1 << 30,
            },
            # compaction invalidated the manifest — refresh is the
            # stats-commit step of the rewrite, in the same run
            {
                "task": "refresh_manifest",
                "table": table,
                "cols": ["id"],
                "manifest": manifest,
            },
            {"task": "monitor", "metrics": metrics},
            {
                "task": "expire_runs",
                "path": runstore,
                "keep_last": 2,
            },
            {"task": "expire", "path": str(tmp_path / "missing"),
             "partition_col": "d", "keep_from": "2024-01-01"},
        ],
    )
    rows = report.collect()
    assert [r.ok for r in rows] == [True] * 6 + [False]
    by = {(r.task, r.target): r.detail for r in rows if r.ok}
    assert by[("checkpoint_log", log)] == "snapshot=1"
    assert by[("expire", dated)] == "dropped=1"
    assert by[("compact", table)] == "n_files=1"
    assert by[("refresh_manifest", manifest)] == "added=1 removed=4"
    assert by[("monitor", metrics)] == "anomalies=0"
    assert by[("expire_runs", runstore)] == "dropped=1"
    assert "missing" in rows[-1].error or rows[-1].error
    # the lake is actually maintained: log truncated, day dropped,
    # manifest serves the rewritten file set
    assert list_batch_ids(spark, log) == [2]
    assert _serve_sums(spark, log, snaps) == {0: 1, 1: 2, 2: 3}
    import os as _os

    assert sorted(
        d for d in _os.listdir(dated) if d.startswith("d=")
    ) == ["d=2024-02-01"]
    assert (
        skipping_scan(spark, table, manifest, "id", 150, 249).count()
        == 100
    )


def test_expire_integer_partitions_run_stores(spark, tmp_path):
    """Retention for _run=-partitioned stores (schema snapshots /
    quarantine): newest-N kept by NUMERIC order, non-integer dirs
    untouched, dry-run reports without deleting, empties never."""
    from metar_pipeline_spark.sources.compaction import (
        expire_integer_partitions,
    )

    store = str(tmp_path / "snapstore")
    # ids straddle a lexicographic trap: 9 < 10 numerically
    for rid in (9, 10, 11, 2):
        spark.createDataFrame([(rid,)], "v long").write.parquet(
            store + f"/_run={rid}"
        )
    with pytest.raises(ValueError, match="keep_last"):
        expire_integer_partitions(spark, store, "_run", 0)
    assert expire_integer_partitions(
        spark, store, "_run", 2, dry_run=True
    ) == [2, 9]
    assert sorted(os.listdir(store)) == [
        "_run=10", "_run=11", "_run=2", "_run=9"
    ]
    assert expire_integer_partitions(spark, store, "_run", 2) == [2, 9]
    assert sorted(os.listdir(store)) == ["_run=10", "_run=11"]
    # idempotent; never empties
    assert expire_integer_partitions(spark, store, "_run", 2) == []
    assert expire_integer_partitions(spark, store, "_run", 5) == []
    # missing store: no-op
    assert expire_integer_partitions(
        spark, str(tmp_path / "nope"), "_run", 3
    ) == []
