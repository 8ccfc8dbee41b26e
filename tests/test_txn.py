"""Optimistic-concurrency commit protocol (sources/txn.py).

The scenarios the single-writer stores could not survive: two writers
computing from the same version, a merge racing a compaction, a crash
between stage and claim. The protocol must serialize them through the
commit log — losers retry cleanly, readers never see a torn table.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from metar_pipeline_spark.sources.txn import (
    CommitConflict,
    VersionedStore,
    compact_versioned,
    expire_versions,
    upsert_versioned,
    write_audit_publish,
)


def _batch(spark, ids, gen):
    return spark.createDataFrame(
        [(i, gen, f"p{gen}_{i}") for i in ids], "id long, gen long, p string"
    )


def test_commit_read_asof_history_roundtrip(spark, tmp_path):
    store = VersionedStore(spark, str(tmp_path / "t"))
    assert store.latest_version() == -1
    with pytest.raises(ValueError):
        store.read()
    v0 = store.commit(_batch(spark, [1, 2], 0), "merge", read_version=-1)
    v1 = store.commit(_batch(spark, [1, 2, 3], 1), "merge", read_version=v0)
    assert (v0, v1) == (0, 1)
    assert store.read().count() == 3
    assert store.read(as_of=0).count() == 2
    # as_of reads are stable snapshots: the old version's rows are the
    # old bytes, not a reconstruction
    assert {r.gen for r in store.read(as_of=0).collect()} == {0}
    h = store.history().orderBy("version").collect()
    assert [(r.version, r.parent, r.action) for r in h] == [
        (0, -1, "merge"),
        (1, 0, "merge"),
    ]


def test_claim_is_compare_and_swap(spark, tmp_path):
    """Two writers computed against v0; one claim wins, the other gets
    CommitConflict and its orphan snapshot never becomes visible."""
    store = VersionedStore(spark, str(tmp_path / "t"))
    store.commit(_batch(spark, [1], 0), "init", read_version=-1)
    a = store.stage(_batch(spark, [1, 2], 1))
    b = store.stage(_batch(spark, [1, 3], 2))
    assert store.claim(a, "merge", read_version=0) == 1
    with pytest.raises(CommitConflict):
        store.claim(b, "merge", read_version=0)
    # the loser's data is invisible to every reader
    assert {r.id for r in store.read().collect()} == {1, 2}
    assert store.latest_version() == 1
    # the loser retries against the NEW latest and lands as v2
    assert store.claim(b, "merge", read_version=1) == 2
    assert {r.id for r in store.read().collect()} == {1, 3}


def test_interleaved_merge_vs_compaction(spark, tmp_path):
    """The exact race the maintenance runner introduced: a compaction
    and a merge both start from version v. Whichever claims second
    must conflict and retry against the winner — afterwards the table
    holds BOTH effects (merged rows, compacted files), never a torn
    or clobbered state."""
    store = VersionedStore(spark, str(tmp_path / "t"))
    # seed a deliberately fragmented snapshot (many files)
    seed = _batch(spark, range(20), 0).repartition(10)
    store.commit(seed, "init", read_version=-1)

    # compaction reads v0 and STAGES its rewrite (not yet claimed —
    # this is the in-flight window) ...
    v_seen = store.latest_version()
    snap = spark.read.parquet(store.snapshot_path(v_seen))
    staged_compact = store.stage(snap.repartition(1))
    # ... meanwhile a merge lands first, claiming v1 (itself written
    # fragmented, so the compaction retry still has work to do)
    from metar_pipeline_spark.sources.merge import merge_last_writer_wins

    merged = merge_last_writer_wins(
        snap, _batch(spark, [5, 99], 1), keys=["id"], order_col="gen"
    ).repartition(8)
    store.commit(merged, "merge", read_version=0)
    assert store.latest_version() == 1
    # the compaction's claim against its stale read version conflicts
    with pytest.raises(CommitConflict):
        store.claim(staged_compact, "compact", read_version=v_seen)
    # retry path: compact_versioned re-reads the NEW latest
    v2 = compact_versioned(store, target_file_bytes=1 << 30)
    assert v2 == 2
    final = store.read()
    assert final.count() == 21  # 20 seed + 1 new key
    assert final.filter("id = 5").first().gen == 1  # merge survived
    files = [
        f
        for f in os.listdir(store.snapshot_path(2))
        if f.endswith(".parquet")
    ]
    assert len(files) == 1  # compaction survived


def test_upsert_versioned_last_writer_wins(spark, tmp_path):
    store = VersionedStore(spark, str(tmp_path / "t"))
    upsert_versioned(store, _batch(spark, [1, 2], 0), ["id"], "gen")
    upsert_versioned(store, _batch(spark, [2, 3], 1), ["id"], "gen")
    rows = {r.id: r.gen for r in store.read().collect()}
    assert rows == {1: 0, 2: 1, 3: 1}
    # time travel: the pre-merge state is intact
    assert {r.id: r.gen for r in store.read(as_of=0).collect()} == {
        1: 0,
        2: 0,
    }


def test_expire_versions_retention(spark, tmp_path):
    store = VersionedStore(spark, str(tmp_path / "t"))
    for g in range(4):
        store.commit(_batch(spark, [1], g), "merge", read_version=g - 1)
    assert expire_versions(store, keep_last=2) == [0, 1]
    assert store.latest_version() == 3
    assert store.read(as_of=2).count() == 1
    with pytest.raises(ValueError):
        store.read(as_of=0)  # expired: loud, never silent
    with pytest.raises(ValueError):
        expire_versions(store, keep_last=0)


def test_write_audit_publish_gate(spark, tmp_path):
    """A failing error-severity audit leaves the published version
    untouched and the staged snapshot inspectable; a passing batch
    publishes as the next version."""
    from metar_pipeline_spark.quality.assertions import not_null, unique

    store = VersionedStore(spark, str(tmp_path / "t"))
    store.commit(_batch(spark, [1, 2], 0), "init", read_version=-1)

    audits = [
        lambda df: not_null(df, "p"),
        lambda df: unique(df, "id"),
    ]
    bad = _batch(spark, [1, 2, 3], 1).withColumn(
        "p", F.when(F.col("id") == 3, F.lit(None)).otherwise(F.col("p"))
    )
    r = write_audit_publish(store, bad, audits)
    assert r["status"] == "rejected" and r["version"] is None
    assert store.latest_version() == 0  # published state untouched
    assert {a["name"]: a["passed"] for a in r["audits"]} == {
        "not_null_p": False,
        "unique_id": True,
    }
    staged = spark.read.parquet(r["staged_path"])  # triage-able
    assert staged.count() == 3

    good = _batch(spark, [1, 2, 3], 2)
    r2 = write_audit_publish(store, good, audits)
    assert r2["status"] == "published" and r2["version"] == 1
    assert store.read().count() == 3


def test_crash_between_stage_and_claim_is_invisible(spark, tmp_path):
    """A writer that staged data and died never pollutes reads; its
    orphan dir sits under _data/ until vacuum."""
    store = VersionedStore(spark, str(tmp_path / "t"))
    store.commit(_batch(spark, [1], 0), "init", read_version=-1)
    store.stage(_batch(spark, [7, 8, 9], 9))  # crash: never claimed
    assert store.read().count() == 1
    assert store.latest_version() == 0
    # two data dirs on disk, one referenced
    data_dirs = os.listdir(str(tmp_path / "t" / "_data"))
    assert len(data_dirs) == 2


def test_partitioned_snapshots_roundtrip_and_changes(spark, tmp_path):
    """partition_cols flows through stage/commit; hive layout survives
    the read back, and table_changes classifies keys correctly."""
    from metar_pipeline_spark.sources.txn import table_changes

    store = VersionedStore(spark, str(tmp_path / "t"))
    df0 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "id long, part string, v long",
    )
    store.commit(df0, "init", -1, partition_cols=["part"])
    df1 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 99), (4, "b", 40)],
        "id long, part string, v long",
    )
    store.commit(df1, "merge", 0, partition_cols=["part"])
    snap = store.read(as_of=1)
    assert set(snap.columns) == {"id", "part", "v"}
    # hive partition dirs exist in the snapshot
    assert any(
        d.startswith("part=")
        for d in os.listdir(store.snapshot_path(1))
        if not d.startswith(("_", "."))
    )
    feed = {
        r.id: r.change_type
        for r in table_changes(store, 0, 1, "id", ["v"]).collect()
    }
    assert feed == {
        1: "unchanged",
        2: "updated",
        3: "deleted",
        4: "inserted",
    }


def test_idempotent_app_batch_commits(spark, tmp_path):
    """Delta txnAppId/txnVersion semantics: re-committing the same
    (app_id, app_batch) — a foreachBatch retry — is a no-op that
    returns the already-claimed version; a NEW batch id commits."""
    store = VersionedStore(spark, str(tmp_path / "t"))
    v0 = upsert_versioned(
        store, _batch(spark, [1, 2], 0), ["id"], "gen",
        app_id="ingest", app_batch=0,
    )
    v_retry = upsert_versioned(
        store, _batch(spark, [1, 2], 0), ["id"], "gen",
        app_id="ingest", app_batch=0,
    )
    assert (v0, v_retry) == (0, 0)
    assert store.latest_version() == 0  # no duplicate version
    v1 = upsert_versioned(
        store, _batch(spark, [3], 1), ["id"], "gen",
        app_id="ingest", app_batch=1,
    )
    assert v1 == 1 and store.read().count() == 3
    h = {r.version: (r.app_id, r.app_batch) for r in store.history().collect()}
    assert h == {0: ("ingest", 0), 1: ("ingest", 1)}


def test_concurrent_threaded_writers_all_land(spark, tmp_path):
    """8 genuinely concurrent writers (threads sharing one store root,
    separate VersionedStore instances — coordination is purely through
    the filesystem) each merge their own key via commit_with_retry.
    Every effect must land exactly once, versions must be contiguous."""
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "t")
    VersionedStore(spark, root).commit(
        _batch(spark, [999], 0), "init", read_version=-1
    )

    from metar_pipeline_spark.sources.merge import merge_last_writer_wins

    def writer(i):
        s = VersionedStore(spark, root)
        return s.commit_with_retry(
            lambda cur: merge_last_writer_wins(
                cur, _batch(spark, [i], 1), ["id"], "gen"
            ),
            action=f"merge_{i}",
            max_retries=30,
        )

    with ThreadPoolExecutor(max_workers=8) as ex:
        versions = list(ex.map(writer, range(8)))

    store = VersionedStore(spark, root)
    assert sorted(versions) == list(range(1, 9))  # contiguous, unique
    assert store.latest_version() == 8
    final = {r.id for r in store.read().collect()}
    assert final == {999, 0, 1, 2, 3, 4, 5, 6, 7}  # nothing lost


def test_zero_copy_restore_and_reference_aware_expiry(spark, tmp_path):
    """restore_version claims a commit that ALIASES the target's
    immutable snapshot — no byte moves; retention keeps an aliased
    snapshot alive while any retained commit references it."""
    from metar_pipeline_spark.sources.txn import restore_version

    store = VersionedStore(spark, str(tmp_path / "t"))
    store.commit(_batch(spark, [1, 2, 3], 0), "merge", read_version=-1)
    want = {(r.id, r.gen) for r in store.read().collect()}
    store.commit(_batch(spark, [1, 2], 7), "merge", read_version=0)  # bad

    assert restore_version(store, 0) == 2
    assert {(r.id, r.gen) for r in store.read().collect()} == want
    # zero-copy: the restore commit references v0's snapshot dir
    assert store.get_commit(2).data == store.get_commit(0).data
    # the bad state stays auditable
    assert store.read(as_of=1).count() == 2
    # restore to the current head claims nothing
    assert restore_version(store, 2) == 2

    # retention: dropping v0 and v1 must NOT delete the snapshot the
    # restore commit still references
    assert expire_versions(store, keep_last=1) == [0, 1]
    assert {(r.id, r.gen) for r in store.read().collect()} == want
    # restoring an expired version is loud
    with pytest.raises(ValueError):
        restore_version(store, 1)
