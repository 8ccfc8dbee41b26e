"""File-action commit log (sources/filelog.py) — O(changed files)
commits: appends that retry claims without rewriting data, partition
overwrites bounded to their partitions, log checkpoint + retention,
and vacuum understanding the layout."""

from __future__ import annotations

import os

import pytest

from metar_pipeline_spark.sources.filelog import FileCommitLog


def _batch(spark, lo, hi, day):
    return spark.createDataFrame(
        [(i, day, i * 10) for i in range(lo, hi)],
        "id long, day string, v long",
    )


def test_append_read_asof(spark, tmp_path):
    log = FileCommitLog(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        log.read()
    assert log.append(_batch(spark, 0, 5, "d1")) == 0
    assert log.append(_batch(spark, 5, 8, "d1")) == 1
    assert log.read().count() == 8
    assert log.read(as_of=0).count() == 5
    # appends never rewrite: version 1 keeps referencing v0's files
    assert set(log.live_files(0)) <= set(log.live_files(1))


def test_partition_overwrite_is_partition_bounded(spark, tmp_path):
    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(
        _batch(spark, 0, 4, "d1").unionByName(_batch(spark, 4, 8, "d2")),
        partition_cols=["day"],
    )
    untouched_before = [
        f for f in log.live_files() if "day=d2/" in f
    ]
    # late data replaces ONLY day=d1
    log.overwrite_partitions(
        _batch(spark, 100, 102, "d1"), "day", ["d1"]
    )
    rows = {(r.id, r.day) for r in log.read().collect()}
    assert rows == {(100, "d1"), (101, "d1"), (4, "d2"), (5, "d2"),
                    (6, "d2"), (7, "d2")}
    # d2's physical files are byte-identical references
    untouched_after = [f for f in log.live_files() if "day=d2/" in f]
    assert untouched_after == untouched_before
    # time travel still sees the pre-backfill day
    old = {(r.id, r.day) for r in log.read(as_of=0).collect()
           if r.day == "d1"}
    assert old == {(0, "d1"), (1, "d1"), (2, "d1"), (3, "d1")}
    # replacement files outside the declared partitions are refused
    with pytest.raises(ValueError):
        log.overwrite_partitions(
            _batch(spark, 0, 2, "d9"), "day", ["d1"]
        )


def test_disjoint_partition_writers_both_land(spark, tmp_path):
    """Two overwrites targeting DISJOINT partitions, interleaved: the
    second claim conflicts on version but retries and lands without
    touching the first writer's partition."""
    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(
        _batch(spark, 0, 2, "d1").unionByName(_batch(spark, 2, 4, "d2")),
        partition_cols=["day"],
    )
    log.overwrite_partitions(_batch(spark, 10, 12, "d1"), "day", ["d1"])
    log.overwrite_partitions(_batch(spark, 20, 22, "d2"), "day", ["d2"])
    rows = {(r.id, r.day) for r in log.read().collect()}
    assert rows == {(10, "d1"), (11, "d1"), (20, "d2"), (21, "d2")}


def test_concurrent_threaded_appends(spark, tmp_path):
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "t")
    FileCommitLog(spark, root).append(_batch(spark, 999, 1000, "d0"))

    def writer(i):
        return FileCommitLog(spark, root).append(
            _batch(spark, i * 10, i * 10 + 2, f"d{i}"), max_retries=40
        )

    with ThreadPoolExecutor(max_workers=8) as ex:
        versions = list(ex.map(writer, range(8)))
    log = FileCommitLog(spark, root)
    assert sorted(versions) == list(range(1, 9))
    assert log.read().count() == 1 + 16  # nothing lost


def test_claim_phantom_rename_false_is_not_a_double_commit(
    spark, tmp_path
):
    """Round-13 hardening: a transport hiccup can report false for a
    rename that LANDED (non-idempotent RPC — observed once as a
    phantom 4th commit in a bench run). If the committed file carries
    exactly this claim's payload, _claim must treat the claim as WON
    (a retry would re-commit the same files at the next version =
    duplicate rows); a different payload stays a real conflict."""
    import json as _json

    from metar_pipeline_spark.sources.filelog import (
        CommitConflict,
        _write_small_file,
    )

    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(_batch(spark, 0, 2, "d0"))  # v0 — creates the log dirs
    meta = {
        "version": 1, "op": "append", "add": ["f1"], "remove": [],
        "writer": "tok-abc", "stats": {}, "cols": ["k"],
        "schema_json": "{}", "ts": 123,
    }
    final = log._path(f"{log._cdir}/{1:020d}.json")
    # simulate OUR earlier rename having landed despite a false report
    _write_small_file(log._fs, final, _json.dumps(meta))
    log._claim(1, dict(meta), "tok-abc")  # must NOT raise
    # a DIFFERENT writer's commit at the same version is a real conflict
    other = dict(meta, writer="tok-other")
    with pytest.raises(CommitConflict):
        log._claim(1, other, "tok-other")
    # the landed commit is intact and readable
    assert log.get_commit(1)["writer"] == "tok-abc"


def test_checkpoint_expire_and_loud_history_floor(spark, tmp_path):
    log = FileCommitLog(spark, str(tmp_path / "t"))
    for i in range(4):
        log.append(_batch(spark, i * 10, i * 10 + 3, "d1"))
    assert log.write_checkpoint() == 3
    assert log.expire_commits() == [0, 1, 2, 3]
    # resolution from the checkpoint alone still works
    assert log.latest_version() == 3
    assert log.read().count() == 12
    # a post-checkpoint commit replays from the checkpoint
    log.append(_batch(spark, 100, 101, "d1"))
    assert log.read().count() == 13
    # history below the floor is gone LOUDLY
    with pytest.raises(ValueError):
        log.live_files(1)


def test_vacuum_reclaims_unreferenced_filelog_tokens(spark, tmp_path):
    """After overwrite + checkpoint + expire, the replaced files'
    token dirs become unreferenced; vacuum deletes exactly those."""
    from metar_pipeline_spark.sources.vacuum import vacuum_store

    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    log.append(_batch(spark, 0, 3, "d1"), partition_cols=["day"])
    log.overwrite_partitions(_batch(spark, 10, 12, "d1"), "day", ["d1"])
    # both tokens referenced while the full log remains: vacuum keeps all
    rep = vacuum_store(spark, root, older_than_seconds=0)
    assert not [r for r in rep if r["action"] == "deleted"]
    assert len(os.listdir(f"{root}/_data")) == 2
    # fold + expire: v0's add-only token is no longer referenced
    log.write_checkpoint()
    log.expire_commits()
    assert len(log.referenced_tokens()) == 1
    rep2 = vacuum_store(spark, root, older_than_seconds=0)
    assert [r for r in rep2 if r["action"] == "deleted"]
    assert len(os.listdir(f"{root}/_data")) == 1
    assert log.read().count() == 2  # live data untouched


def test_compact_collapses_tokens_content_unchanged(spark, tmp_path):
    log = FileCommitLog(spark, str(tmp_path / "t"))
    for i in range(4):
        log.append(
            _batch(spark, i * 10, i * 10 + 3, f"d{i % 2}"),
            partition_cols=["day"],
        )
    before = {(r.id, r.day, r.v) for r in log.read().collect()}
    assert len({f.split("/")[1] for f in log.live_files()}) == 4
    v = log.compact(partition_cols=["day"])
    assert v == 4
    assert len({f.split("/")[1] for f in log.live_files()}) == 1
    after = {(r.id, r.day, r.v) for r in log.read().collect()}
    assert after == before
    # pre-compaction version still resolvable (history intact)
    assert log.read(as_of=3).count() == 12
    # below threshold: no-op
    assert log.compact(partition_cols=["day"]) is None
    # checkpoint + expire + vacuum then reclaims the 4 old tokens
    from metar_pipeline_spark.sources.vacuum import vacuum_store

    log.write_checkpoint()
    log.expire_commits()
    rep = vacuum_store(
        spark, str(tmp_path / "t"), older_than_seconds=0
    )
    assert len(
        [r for r in rep if r["action"] == "deleted"]
    ) == 4
    assert {(r.id, r.day, r.v) for r in log.read().collect()} == before


def test_filelog_maintenance_tasks(spark, tmp_path):
    from metar_pipeline_spark.plans.maintenance import run_maintenance

    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    for i in range(3):
        log.append(_batch(spark, i * 10, i * 10 + 2, "d1"),
                   partition_cols=["day"])
    rep = run_maintenance(
        spark,
        [
            {"task": "compact_filelog", "path": root,
             "partition_cols": ["day"]},
            {"task": "checkpoint_filelog", "path": root},
            {"task": "vacuum", "path": root, "older_than_seconds": 0},
        ],
    ).collect()
    assert all(r.ok for r in rep)
    assert rep[0].detail == "version=3"
    assert rep[1].detail.startswith("checkpoint=3 dropped=4")
    assert log.read().count() == 6
    assert len(os.listdir(f"{root}/_data")) == 1


def test_stats_in_log_pruned_scan(spark, tmp_path):
    """Delta's stats-in-log: footer min/max commit WITH the files, so
    skipping can never go stale; pruning excludes provably-out files
    and survives checkpoint+expire."""
    from pyspark.sql import functions as F

    log = FileCommitLog(
        spark, str(tmp_path / "t"), stats_cols=["v"]
    )
    # three appends with disjoint v-ranges → per-file ranges disjoint
    for i in range(3):
        log.append(
            spark.range(i * 100, i * 100 + 50)
            .select(
                F.col("id").alias("k"), (F.col("id") * 1).alias("v")
            )
            .coalesce(1)
        )
    live, stats = log._live_with_stats()
    assert len(live) == 3 and len(stats) == 3
    got = log.read_pruned("v", 110, 130)
    assert got.count() == 21
    # only the middle token's file survives pruning
    kept = [
        f
        for f in live
        if not (
            stats[f]["v"][1] < 110 or stats[f]["v"][0] > 130
        )
    ]
    assert len(kept) == 1
    # semantics are stats-invariant: equals the full-scan filter
    full = log.read().filter(F.col("v").between(110, 130))
    assert got.agg(F.sum("v")).first()[0] == full.agg(F.sum("v")).first()[0]
    # stats survive the log checkpoint + expiry
    log.write_checkpoint()
    log.expire_commits()
    assert log.read_pruned("v", 110, 130).count() == 21
    _, stats2 = log._live_with_stats()
    assert len(stats2) == 3
    # empty pruning result: schema-stable zero rows
    assert log.read_pruned("v", 10_000, 10_001).count() == 0


def test_deletion_vectors_row_delete_without_rewrite(spark, tmp_path):
    """delete_where writes position vectors, never touches data files;
    reads (plain and pruned) hide the rows, time travel restores them,
    compaction materializes and resets the vectors."""
    from pyspark.sql import functions as F

    log = FileCommitLog(spark, str(tmp_path / "t"), stats_cols=["v"])
    log.append(_batch(spark, 0, 10, "d1").coalesce(1))
    log.append(_batch(spark, 10, 20, "d1").coalesce(1))
    files_before = log.live_files()

    v = log.delete_where(F.col("id") % 3 == 0)  # ids 0,3,...,18
    assert v == 2
    assert log.live_files() == files_before  # no data file rewritten
    assert {r.id for r in log.read().collect()} == {
        i for i in range(20) if i % 3 != 0
    }
    # pruned scans respect the vectors too
    assert {r.id for r in log.read_pruned("v", 0, 60).collect()} == {
        1, 2, 4, 5
    }
    # time travel: the pre-delete version still serves every row
    assert log.read(as_of=1).count() == 20
    # deleting nothing is a no-op, not an empty commit
    assert log.delete_where(F.col("id") > 1000) is None
    assert log.latest_version() == 2
    # a second delete composes with the first
    assert log.delete_where(F.col("id") == 1) == 3
    assert log.read().count() == 12
    # checkpoint carries vectors; vacuum keeps the referenced dv token
    from metar_pipeline_spark.sources.vacuum import vacuum_store

    log.write_checkpoint()
    log.expire_commits()
    assert log.read().count() == 12
    vacuum_store(spark, str(tmp_path / "t"), older_than_seconds=0)
    assert log.read().count() == 12
    # compaction materializes the deletes and spends the vectors
    assert log.compact() == 4
    assert log._active_dvs() == []
    assert {r.id for r in log.read().collect()} == {
        i for i in range(20) if i % 3 != 0 and i != 1
    }
    # spent vectors become unreferenced after the next fold → reclaimed
    log.write_checkpoint()
    log.expire_commits()
    rep = vacuum_store(spark, str(tmp_path / "t"), older_than_seconds=0)
    dv_deleted = [
        r for r in rep
        if r["action"] == "deleted" and "/_dv/" in r["path"]
    ]
    assert dv_deleted
    assert log.read().count() == 12


def test_merge_by_key_single_commit_no_rewrite(spark, tmp_path):
    """Keyed upsert = one commit carrying both the match vector and
    the batch files; stored files untouched; time travel intact."""
    from pyspark.sql import functions as F

    log = FileCommitLog(spark, str(tmp_path / "t"))
    # empty-store merge behaves as an append at v0
    assert log.merge_by_key(_batch(spark, 0, 6, "d1"), ["id"]) == 0
    files_v0 = log.live_files()

    upd = spark.createDataFrame(
        [(2, "d1", 999), (4, "d1", 888), (100, "d1", 777)],
        "id long, day string, v long",
    )
    assert log.merge_by_key(upd, ["id"]) == 1
    assert log.live_files() == sorted(
        files_v0 + [f for f in log.live_files() if f not in files_v0]
    )
    assert set(files_v0) <= set(log.live_files())  # nothing rewritten
    rows = {r.id: r.v for r in log.read().collect()}
    assert rows == {0: 0, 1: 10, 3: 30, 5: 50, 2: 999, 4: 888, 100: 777}
    assert {r.id: r.v for r in log.read(as_of=0).collect()} == {
        i: i * 10 for i in range(6)
    }
    # merge with zero matching keys = plain append, no vector
    assert log.merge_by_key(
        spark.createDataFrame([(200, "d1", 1)], "id long, day string, v long"),
        ["id"],
    ) == 2
    assert log.get_commit(2)["dv_add"] == []
    assert log.read().count() == 8
    # compaction then materializes everything into one token
    assert log.compact() == 3
    assert {r.id: r.v for r in log.read().collect()} == {
        0: 0, 1: 10, 3: 30, 5: 50, 2: 999, 4: 888, 100: 777, 200: 1
    }


def test_idempotent_appends_survive_expiry(spark, tmp_path):
    """txnAppId idempotency on the file log: a retried batch is a
    no-op returning the claimed version — and the identity survives
    checkpoint+expire (retention cannot reopen the replay window)."""
    log = FileCommitLog(spark, str(tmp_path / "t"))
    v0 = log.append(_batch(spark, 0, 3, "d1"), app_id="ing", app_batch=0)
    v_retry = log.append(
        _batch(spark, 0, 3, "d1"), app_id="ing", app_batch=0
    )
    assert (v0, v_retry) == (0, 0)
    assert log.read().count() == 3  # not doubled
    log.append(_batch(spark, 3, 5, "d1"), app_id="ing", app_batch=1)
    log.write_checkpoint()
    log.expire_commits()
    # replay of batch 0 AFTER its commit file was expired: the
    # checkpoint's carried identities still dedupe it
    assert log.append(
        _batch(spark, 0, 3, "d1"), app_id="ing", app_batch=0
    ) == 0
    assert log.read().count() == 5


def test_schema_evolution_additive(spark, tmp_path):
    """Additive schema evolution: merge_schema appends new columns to
    the canonical order, old files null-fill them on read, time travel
    shows the schema AS OF the version, and schema surprises without
    merge_schema fail loudly before any file is written."""
    from pyspark.sql import functions as F

    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(_batch(spark, 0, 4, "d1"))
    assert log.columns_at() == ["id", "day", "v"]

    wide = spark.createDataFrame(
        [(10, "d2", 100, 0.5), (11, "d2", 110, 0.7)],
        "id long, day string, v long, score double",
    )
    # surprise column without merge_schema: loud, nothing committed
    with pytest.raises(ValueError, match="merge_schema"):
        log.append(wide)
    assert log.latest_version() == 0

    assert log.append(wide, merge_schema=True) == 1
    assert log.columns_at() == ["id", "day", "v", "score"]
    cur = log.read()
    assert cur.columns == ["id", "day", "v", "score"]
    got = {r.id: r.score for r in cur.collect()}
    assert got[10] == 0.5 and got[0] is None
    # time travel: the pre-evolution version has the old schema
    assert log.read(as_of=0).columns == ["id", "day", "v"]

    # a batch missing an EXISTING column is refused outright
    narrow = spark.createDataFrame([(99, "d3")], "id long, day string")
    with pytest.raises(ValueError, match="missing table columns"):
        log.append(narrow, merge_schema=True)

    # post-evolution writers may keep using the old shape? No —
    # every existing column is required; the evolved col is existing now
    with pytest.raises(ValueError, match="missing table columns"):
        log.append(_batch(spark, 20, 22, "d3"))

    # delete/merge operate across the evolved schema (null-filled rows)
    assert log.delete_where(F.col("score") > 0.6) == 2
    assert {r.id for r in log.read().collect()} == {0, 1, 2, 3, 10}


def test_schema_evolution_survives_checkpoint_expiry(spark, tmp_path):
    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(_batch(spark, 0, 3, "d1"))
    wide = spark.createDataFrame(
        [(5, "d2", 50, 1)], "id long, day string, v long, extra long"
    )
    log.append(wide, merge_schema=True)
    log.write_checkpoint()
    log.expire_commits()
    # the canonical columns now come from the checkpoint
    assert log.columns_at() == ["id", "day", "v", "extra"]
    assert log.read().columns == ["id", "day", "v", "extra"]
    assert log.read().count() == 4
    # and a fresh append still validates against them
    with pytest.raises(ValueError, match="missing table columns"):
        log.append(_batch(spark, 9, 10, "d9"))


def test_read_changes_exact_feed(spark, tmp_path):
    """The change feed replays commits into exact inserts/deletes:
    appends feed inserts, backfills feed delete(replaced)+insert(new),
    DV deletes feed the vectored rows, merges feed pre-image deletes +
    post-image inserts — and folding inserts minus deletes equals the
    table delta."""
    from pyspark.sql import functions as F

    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(
        _batch(spark, 0, 4, "d1").unionByName(_batch(spark, 4, 8, "d2")),
        partition_cols=["day"],
    )                                                   # v0 insert x8
    log.overwrite_partitions(
        _batch(spark, 100, 102, "d1"), "day", ["d1"]
    )                                                   # v1 -4 +2
    log.delete_where(F.col("id") == 5)                  # v2 -1
    upd = spark.createDataFrame(
        [(6, "d2", 999), (300, "d2", 1)],
        "id long, day string, v long",
    )
    log.merge_by_key(upd, ["id"])                       # v3 -1 +2

    ch = log.read_changes(-1)
    counts = {
        (r._commit_version, r._change_type): r.n
        for r in ch.groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == {
        (0, "insert"): 8,
        (1, "delete"): 4, (1, "insert"): 2,
        (2, "delete"): 1,
        (3, "delete"): 1, (3, "insert"): 2,
    }
    # pre-image values ride the deletes: the merged id carries v=60
    pre = {r.id: r.v for r in ch.filter(
        (F.col("_commit_version") == 3)
        & (F.col("_change_type") == "delete")).collect()}
    assert pre == {6: 60}
    # folding the feed reconstructs the table exactly
    folded = (
        ch.groupBy("id", "day", "v")
        .agg(F.sum(F.when(F.col("_change_type") == "insert", 1)
                   .otherwise(-1)).alias("net"))
        .filter(F.col("net") > 0)
    )
    assert {(r.id, r.day, r.v) for r in folded.collect()} == {
        (r.id, r.day, r.v) for r in log.read().collect()
    }
    # cursor windows compose: (−1,1] ∪ (1,3] ≡ (−1,3]
    a = log.read_changes(-1, 1).count()
    b = log.read_changes(1, 3).count()
    assert a + b == ch.count()
    # cursor at the head: empty feed, stable schema, no error
    head = log.read_changes(log.latest_version())
    assert head.count() == 0
    assert "_change_type" in head.columns


def test_read_changes_compact_neutral_and_retention_floor(
    spark, tmp_path
):
    from pyspark.sql import functions as F

    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(_batch(spark, 0, 4, "d1"))
    log.append(_batch(spark, 4, 8, "d1"))
    assert log.compact() == 2
    # OPTIMIZE-style rewrite is content-neutral: feeds nothing
    assert log.read_changes(1).count() == 0
    # deletes AFTER a compact still feed (vectors reference new files)
    log.delete_where(F.col("id") < 2)
    assert log.read_changes(2).filter(
        F.col("_change_type") == "delete"
    ).count() == 2
    # expired history below the floor fails loudly
    log.write_checkpoint()
    log.expire_commits()
    with pytest.raises(ValueError, match="expired"):
        log.read_changes(-1)


def test_clustered_compact_improves_pruning(spark, tmp_path):
    """OPTIMIZE ZORDER/range-cluster through the commit log: after a
    clustered rewrite the committed footer stats become near-disjoint
    per file, so read_pruned opens a strict subset; content unchanged."""
    from pyspark.sql import functions as F

    log = FileCommitLog(spark, str(tmp_path / "t"), stats_cols=["v"])
    # three appends, each spanning the FULL v-range (stats useless)
    for i in range(3):
        log.append(
            spark.range(i, 300, 3)
            .select(F.col("id").alias("k"), F.col("id").alias("v"))
            .coalesce(1)
        )
    live, stats = log._live_with_stats()

    def kept(lo, hi):
        return [
            f for f in live
            if not (stats[f]["v"][1] < lo or stats[f]["v"][0] > hi)
        ]

    assert len(kept(40, 60)) == 3  # every file overlaps the range
    before = {r.k for r in log.read_pruned("v", 40, 60).collect()}

    assert log.compact(cluster_by=["v"], target_files=5) == 3
    live, stats = log._live_with_stats()
    assert len(live) == 5
    assert len(kept(40, 60)) <= 2  # clustering made ranges disjoint
    after = {r.k for r in log.read_pruned("v", 40, 60).collect()}
    assert after == before == set(range(40, 61))

    # two-key Z-order path: correctness + both columns' stats captured
    log2 = FileCommitLog(
        spark, str(tmp_path / "z"), stats_cols=["a", "b"]
    )
    log2.append(
        spark.range(0, 256).select(
            (F.col("id") % 16).alias("a"),
            (F.col("id") / 16).cast("long").alias("b"),
            F.col("id").alias("payload"),
        )
    )
    log2.append(
        spark.range(256, 260).select(
            (F.col("id") % 16).alias("a"),
            (F.col("id") / 16).cast("long").alias("b"),
            F.col("id").alias("payload"),
        )
    )
    assert log2.compact(cluster_by=["a", "b"], target_files=4) == 2
    got = log2.read_pruned("a", 3, 5).filter(
        F.col("b").between(3, 5)
    ).count()
    want = log2.read().filter(
        F.col("a").between(3, 5) & F.col("b").between(3, 5)
    ).count()
    assert got == want
    # k-key Z-order (k=3): correctness unchanged, box still prunes
    log2.append(
        spark.range(260, 264).select(
            (F.col("id") % 16).alias("a"),
            (F.col("id") / 16).cast("long").alias("b"),
            F.col("id").alias("payload"),
        )
    )
    assert log2.compact(cluster_by=["a", "b", "payload"],
                        target_files=4) == 4
    got3 = log2.read_pruned("a", 3, 5).filter(
        F.col("b").between(3, 5)
    ).count()
    assert got3 == want
    with pytest.raises(ValueError, match="at least one key"):
        log2.compact(cluster_by=[])


def test_cdc_replication_exactly_once(spark, tmp_path):
    """sync_changes_from: the destination's idempotent app-commits ARE
    the cursor — duplicate syncs and crash-retries converge, and the
    folded changelog always equals the source table."""
    from pyspark.sql import functions as F

    src = FileCommitLog(spark, str(tmp_path / "src"))
    dst = FileCommitLog(spark, str(tmp_path / "dst"))

    src.append(_batch(spark, 0, 6, "d1"))                   # v0
    upd = spark.createDataFrame(
        [(2, "d1", 999)], "id long, day string, v long"
    )
    src.merge_by_key(upd, ["id"])                           # v1

    assert dst.sync_changes_from(src, app_id="mirror") == 0
    assert dst.last_app_batch("mirror") == 1
    # caught up: no-op
    assert dst.sync_changes_from(src, app_id="mirror") is None
    # crash-retry of the same window: idempotent commit deduplicates
    assert dst.append(
        src.read_changes(-1, 1), app_id="mirror", app_batch=1
    ) == 0
    assert dst.latest_version() == 0

    src.delete_where(F.col("id") == 0)                      # v2
    assert dst.sync_changes_from(src, app_id="mirror") == 1

    def fold(df):
        sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        return {
            (r.id, r.day, r.v)
            for r in df.groupBy("id", "day", "v")
            .agg(F.sum(sign).alias("net"))
            .filter(F.col("net") > 0)
            .collect()
        }

    assert fold(dst.read()) == {
        (r.id, r.day, r.v) for r in src.read().collect()
    }
    # the cursor survives destination checkpoint + log expiry
    dst.write_checkpoint()
    dst.expire_commits()
    assert dst.last_app_batch("mirror") == 2
    assert dst.sync_changes_from(src, app_id="mirror") is None
    # a compact-only source window still advances the cursor
    assert src.compact() == 3
    v = dst.sync_changes_from(src, app_id="mirror")
    assert v == 2 and dst.last_app_batch("mirror") == 3
    assert fold(dst.read()) == {
        (r.id, r.day, r.v) for r in src.read().collect()
    }


def test_read_pruned_multi_box_after_zorder(spark, tmp_path):
    """Conjunctive box pruning off committed stats, composed with a
    Z-order clustered compact: both keys' per-file ranges narrow, so
    the box opens a strict subset of files; semantics stay
    stats-invariant."""
    from pyspark.sql import functions as F

    log = FileCommitLog(
        spark, str(tmp_path / "t"), stats_cols=["a", "b"]
    )
    grid = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("a"),
        (F.col("id") / 32).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    log.append(grid)  # row-major: a cycles fast → a-stats useless
    log.append(
        spark.range(1024, 1040).select(
            (F.col("id") % 32).alias("a"),
            (F.col("id") / 32).cast("long").alias("b"),
            F.col("id").alias("payload"),
        )
    )
    want = {
        r.payload
        for r in log.read()
        .filter(F.col("a").between(4, 7) & F.col("b").between(4, 7))
        .collect()
    }
    got = {
        r.payload
        for r in log.read_pruned_multi(
            {"a": (4, 7), "b": (4, 7)}
        ).collect()
    }
    assert got == want

    assert log.compact(cluster_by=["a", "b"], target_files=8) == 2
    live, stats = log._live_with_stats()

    def box_kept():
        n = 0
        for f in live:
            fs = stats.get(f, {})
            skip = False
            for c, (lo, hi) in {"a": (4, 7), "b": (4, 7)}.items():
                s = fs.get(c)
                if s and s[0] is not None and (s[1] < lo or s[0] > hi):
                    skip = True
            n += 0 if skip else 1
        return n

    assert len(live) == 8
    assert box_kept() < 8  # the Z-layout makes the box prune
    got2 = {
        r.payload
        for r in log.read_pruned_multi(
            {"a": (4, 7), "b": (4, 7)}
        ).collect()
    }
    assert got2 == want
    # empty box: schema-stable zero rows
    assert log.read_pruned_multi(
        {"a": (500, 600), "b": (4, 7)}
    ).count() == 0


def test_maintenance_clustered_compact_and_sync(spark, tmp_path):
    """compact_filelog keeps skipping stats through a maintenance
    rewrite (and clusters on request); sync_filelog replicates the
    change feed exactly-once on a schedule."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.plans.maintenance import run_maintenance

    root = str(tmp_path / "src")
    log = FileCommitLog(spark, root, stats_cols=["v"])
    for i in range(3):
        log.append(
            spark.range(i, 300, 3)
            .select(F.col("id").alias("k"), F.col("id").alias("v"))
            .coalesce(1)
        )
    dst_root = str(tmp_path / "dst")
    rep = run_maintenance(
        spark,
        [
            {"task": "compact_filelog", "path": root,
             "stats_cols": ["v"], "cluster_by": ["v"],
             "target_files": 5},
            {"task": "sync_filelog", "path": dst_root, "source": root},
        ],
    ).collect()
    assert all(r.ok for r in rep)
    assert rep[0].detail == "version=3"
    assert rep[1].detail == "version=0"
    # stats survived the maintenance rewrite: the range scan prunes
    live, stats = log._live_with_stats()
    assert len(live) == 5 and len(stats) == 5
    kept = [
        f for f in live
        if not (stats[f]["v"][1] < 40 or stats[f]["v"][0] > 60)
    ]
    assert len(kept) <= 2
    # the replicated changelog folds to the source table (compact fed
    # nothing; the three appends fed pure inserts)
    dst = FileCommitLog(spark, dst_root)
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    assert (
        dst.read().agg(F.sum(sign * F.col("v"))).first()[0]
        == log.read().agg(F.sum("v")).first()[0]
    )
    # a second scheduled sync: caught up (compact-only tail advanced)
    rep2 = run_maintenance(
        spark,
        [{"task": "sync_filelog", "path": dst_root, "source": root}],
    ).collect()
    assert rep2[0].ok and rep2[0].detail in ("noop", "version=1")


def test_streaming_source_tails_change_feed(spark, tmp_path):
    """spark.readStream.format('filelog_changes'): the native
    streaming form of the change feed — version offsets checkpointed
    by the engine, per-file partitions read executor-side as arrow
    batches, DV pre-images loaded positionally; a restart resumes
    exactly after the committed version."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.sources.filelog_stream import (
        FileLogChangeDataSource,
    )

    spark.dataSource.register(FileLogChangeDataSource)
    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    log.append(
        spark.range(0, 8).select(
            F.col("id"), (F.col("id") * 10).alias("v")
        )
    )                                                        # v0
    upd = spark.createDataFrame([(2, 999), (100, 777)], "id long, v long")
    log.merge_by_key(upd, ["id"])                            # v1

    ckpt = str(tmp_path / "ckpt")
    sink: "list" = []

    def run_once():
        q = (
            spark.readStream.format("filelog_changes")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: sink.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got = {(r.id, r.v, r._change_type, r._commit_version) for r in sink}
    want = {
        (r.id, r.v, r._change_type, r._commit_version)
        for r in log.read_changes(-1).collect()
    }
    assert got == want
    assert (2, 20, "delete", 1) in got      # merge pre-image
    assert (2, 999, "insert", 1) in got     # merge post-image

    # restart: only the NEW window feeds (offset continuity)
    sink.clear()
    log.delete_where(F.col("id") == 5)                       # v2
    assert log.compact() == 3                                # silent
    run_once()
    assert {(r.id, r.v, r._change_type, r._commit_version)
            for r in sink} == {(5, 50, "delete", 2)}

    # caught up: an availableNow run with nothing new feeds nothing
    sink.clear()
    run_once()
    assert sink == []


def test_streaming_source_schema_evolution_and_guards(spark, tmp_path):
    from pyspark.sql import functions as F

    from metar_pipeline_spark.sources.filelog_stream import (
        FileLogChangeDataSource,
    )

    spark.dataSource.register(FileLogChangeDataSource)
    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    log.append(spark.range(0, 3).select("id"))
    log.append(
        spark.range(3, 5).select(
            "id", (F.col("id") * 1.5).alias("score")
        ),
        merge_schema=True,
    )
    df = (
        spark.readStream.format("filelog_changes").option("path", root)
        .load()
    )
    assert df.columns == ["id", "score", "_change_type",
                          "_commit_version"]
    sink: "list" = []
    q = (
        df.writeStream.foreachBatch(
            lambda d, b: sink.extend(d.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    by_id = {r.id: r for r in sink}
    assert by_id[0].score is None          # pre-evolution null-fill
    assert by_id[4].score == 6.0
    # a LEGACY partitioned log (schema stripped from its commits) is
    # refused loudly — the footer cannot type hive path values
    import json as _json
    import os as _os

    proot = str(tmp_path / "p")
    plog = FileCommitLog(spark, proot)
    plog.append(
        spark.range(0, 4).select(
            "id", (F.col("id") % 2).cast("string").alias("day")
        ),
        partition_cols=["day"],
    )
    cpath = _os.path.join(proot, "_commits", f"{0:020d}.json")
    meta = _json.loads(open(cpath).read())
    meta.pop("schema_json"), meta.pop("cols")
    open(cpath, "w").write(_json.dumps(meta))
    with pytest.raises(Exception, match="LEGACY"):
        (
            spark.readStream.format("filelog_changes")
            .option("path", proot)
            .load()
        )


def test_streaming_source_partitioned_table(spark, tmp_path):
    """Partitioned tables stream: hive path values are typed from the
    WRITER's recorded schema (date partition column round-trips as a
    real date), and a partition backfill feeds replaced-partition
    deletes + replacement inserts."""
    import datetime

    from pyspark.sql import functions as F

    from metar_pipeline_spark.sources.filelog_stream import (
        FileLogChangeDataSource,
    )

    spark.dataSource.register(FileLogChangeDataSource)
    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    base = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1), 10),
         (2, datetime.date(2024, 1, 1), 20),
         (3, datetime.date(2024, 1, 2), 30)],
        "id long, day date, v long",
    )
    log.append(base, partition_cols=["day"])                # v0
    log.overwrite_partitions(
        spark.createDataFrame(
            [(9, datetime.date(2024, 1, 1), 90)],
            "id long, day date, v long",
        ),
        "day",
        ["2024-01-01"],
    )                                                       # v1
    sink: "list" = []
    q = (
        spark.readStream.format("filelog_changes")
        .option("path", root)
        .load()
        .writeStream.foreachBatch(lambda d, b: sink.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.id, r.day, r.v, r._change_type, r._commit_version)
           for r in sink}
    want = {
        (r.id, r.day, r.v, r._change_type, r._commit_version)
        for r in log.read_changes(-1).collect()
    }
    assert got == want
    d1 = datetime.date(2024, 1, 1)
    assert (1, d1, 10, "delete", 1) in got   # replaced partition
    assert (9, d1, 90, "insert", 1) in got
    assert (3, datetime.date(2024, 1, 2), 30, "insert", 0) in got


def test_tags_pin_snapshots_past_retention(spark, tmp_path):
    """create_tag materializes the live set + vectors + schema: the
    pinned dataset reads EXACTLY even after checkpoint+expire drop
    the commits below the floor and vacuum sweeps — reproducible
    training snapshots at 100 TB."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.sources.vacuum import vacuum_store

    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    log.append(_batch(spark, 0, 6, "d1"))                   # v0
    assert log.create_tag("train-v1") == 0
    want = {(r.id, r.v) for r in log.read().collect()}

    # history moves on: merge, delete, compact, retention
    upd = spark.createDataFrame(
        [(2, "d1", 999)], "id long, day string, v long"
    )
    log.merge_by_key(upd, ["id"])                           # v1
    log.delete_where(F.col("id") == 0)                      # v2
    assert log.compact() == 3
    log.write_checkpoint()
    log.expire_commits()
    # as_of below the floor is GONE from the log…
    with pytest.raises(ValueError, match="expired"):
        log.read(as_of=0)
    # …but the tag still serves the exact pinned bytes
    vacuum_store(spark, root, older_than_seconds=0)
    assert {(r.id, r.v) for r in log.read_tag("train-v1").collect()} \
        == want
    assert log.list_tags() == {"train-v1": 0}

    # tags are immutable pins
    with pytest.raises(ValueError, match="immutable"):
        log.create_tag("train-v1")
    with pytest.raises(ValueError, match="invalid tag name"):
        log.create_tag("_bad/name")
    # releasing the pin frees its tokens for the next vacuum
    assert log.delete_tag("train-v1")
    rep = vacuum_store(spark, root, older_than_seconds=0)
    freed = [r for r in rep if r["action"] == "deleted"
             and "/_data/" in r["path"]]
    assert freed  # the pre-compact token was only tag-referenced
    with pytest.raises(ValueError, match="no tag"):
        log.read_tag("train-v1")
    # the live table is untouched throughout
    assert {r.id for r in log.read().collect()} == {1, 2, 3, 4, 5}


def test_tag_pins_deletion_vectors_and_schema(spark, tmp_path):
    from pyspark.sql import functions as F

    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(_batch(spark, 0, 6, "d1"))
    log.delete_where(F.col("id") % 2 == 0)                  # v1: DVs
    log.create_tag("post-gdpr")                             # pins DVs
    wide = spark.createDataFrame(
        [(9, "d2", 90, 1.5)], "id long, day string, v long, s double"
    )
    log.append(wide, merge_schema=True)                     # v2 evolves
    # the tag serves the v1 state: vectors applied, OLD schema
    got = log.read_tag("post-gdpr")
    assert got.columns == ["id", "day", "v"]
    assert {r.id for r in got.collect()} == {1, 3, 5}


def test_check_constraints_gate_writes(spark, tmp_path):
    """Delta CHECK-constraint semantics: FALSE violates, NULL passes;
    writers refuse BEFORE any file lands; existing-data validation on
    ADD; the active set rides checkpoints."""
    from pyspark.sql import functions as F

    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(_batch(spark, 0, 4, "d1"))                   # v0
    assert log.set_check_constraint("v_nonneg", "v >= 0") == 1
    assert log.constraints_at() == {"v_nonneg": "v >= 0"}

    bad = spark.createDataFrame(
        [(50, "d1", -1)], "id long, day string, v long"
    )
    with pytest.raises(ValueError, match="v_nonneg"):
        log.append(bad)
    with pytest.raises(ValueError, match="v_nonneg"):
        log.merge_by_key(bad, ["id"])
    assert log.latest_version() == 1  # nothing landed

    # NULL passes (Delta semantics)
    nullish = spark.createDataFrame(
        [(60, "d1", None)], "id long, day string, v long"
    )
    assert log.append(nullish) == 2

    # a constraint the EXISTING data violates is refused
    with pytest.raises(ValueError, match="existing rows violate"):
        log.set_check_constraint("v_small", "v < 10")

    # survives checkpoint + expiry; drop lifts the gate
    log.write_checkpoint()
    log.expire_commits()
    assert log.constraints_at() == {"v_nonneg": "v >= 0"}
    with pytest.raises(ValueError, match="v_nonneg"):
        log.append(bad)
    log.drop_check_constraint("v_nonneg")
    assert log.constraints_at() == {}
    assert log.append(bad) == 4
    # meta commits are silent in the change feed
    assert log.read_changes(2, 3).count() == 0


def test_restore_rolls_back_with_history(spark, tmp_path):
    """RESTORE TABLE TO VERSION: a new materialized commit whose
    content is exactly the target version — bad commits stay in
    history for audit, vectors reset, the change feed carries the
    gross delta, fold stays exact."""
    from pyspark.sql import functions as F

    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(_batch(spark, 0, 6, "d1"))                   # v0 good
    want = {(r.id, r.v) for r in log.read().collect()}
    upd = spark.createDataFrame(
        [(2, "d1", 666)], "id long, day string, v long"
    )
    log.merge_by_key(upd, ["id"])                           # v1 bad
    log.delete_where(F.col("id") < 2)                       # v2 bad
    assert log.restore(0) == 3
    assert {(r.id, r.v) for r in log.read().collect()} == want
    # history preserved: the bad states still time-travel
    assert {r.v for r in log.read(as_of=2).filter(
        F.col("id") == 2).collect()} == {666}
    # vectors are spent by the materialized restore
    assert log._active_dvs() == []
    # change-feed fold across the restore reconstructs the table
    ch = log.read_changes(-1)
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    folded = {
        (r.id, r.v)
        for r in ch.groupBy("id", "day", "v")
        .agg(F.sum(sign).alias("net")).filter(F.col("net") > 0)
        .collect()
    }
    assert folded == want
    # restoring to the current head claims nothing
    assert log.restore(3) == 3
    assert log.latest_version() == 3
    # schema is restored too
    wide = spark.createDataFrame(
        [(9, "d9", 9, 1.0)], "id long, day string, v long, s double"
    )
    log.append(wide, merge_schema=True)                     # v4
    assert log.restore(3) == 5
    assert log.read().columns == ["id", "day", "v"]


def test_timestamp_time_travel(spark, tmp_path):
    ticks = iter([100.0, 200.0, 300.0])
    log = FileCommitLog(
        spark, str(tmp_path / "t"), clock=lambda: next(ticks)
    )
    log.append(_batch(spark, 0, 2, "d1"))    # v0 @ t=100
    log.append(_batch(spark, 2, 5, "d1"))    # v1 @ t=200
    log.append(_batch(spark, 5, 6, "d1"))    # v2 @ t=300
    assert log.version_at_timestamp(100.0) == 0
    assert log.version_at_timestamp(250.0) == 1
    assert log.read_at_timestamp(250.0).count() == 5
    assert log.read_at_timestamp(999.0).count() == 6
    with pytest.raises(ValueError, match="no retained commit"):
        log.version_at_timestamp(99.9)


def test_streaming_source_survives_log_expiry(spark, tmp_path):
    """A stream starting ABOVE the retention floor plans fine after
    checkpoint+expire: schema/DV resolution falls back to the
    checkpoint instead of replaying expired commits."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.sources.filelog_stream import (
        FileLogChangeDataSource,
    )

    spark.dataSource.register(FileLogChangeDataSource)
    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    log.append(spark.range(0, 6).select("id"))              # v0
    log.delete_where(F.col("id") % 2 == 0)                  # v1 (DVs)
    log.write_checkpoint()
    log.expire_commits()                                    # floor=1
    upd = spark.createDataFrame([(1, ), (9, )], "id long")
    log.merge_by_key(upd, ["id"])                           # v2
    sink: "list" = []
    q = (
        spark.readStream.format("filelog_changes")
        .option("path", root)
        .option("starting_version", "2")
        .load()
        .writeStream.foreachBatch(lambda d, b: sink.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.id, r._change_type) for r in sink}
    # the merge window feeds pre-image delete for the stored id=1 and
    # post-image inserts; the v1-deleted evens never resurface
    assert got == {(1, "delete"), (1, "insert"), (9, "insert")}


def test_type_drift_on_existing_column_refused(spark, tmp_path):
    """Additive-only means NO type changes: a batch feeding ints into
    a long column (or strings into a long) is refused at write time,
    before any file lands — not discovered later as a reader's arrow
    type clash."""
    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(_batch(spark, 0, 3, "d1"))  # v long
    drifted = spark.createDataFrame(
        [(9, "d1", 7)], "id long, day string, v int"
    )
    with pytest.raises(ValueError, match="type"):
        log.append(drifted)
    with pytest.raises(ValueError, match="type"):
        log.append(drifted, merge_schema=True)  # not an evolution
    assert log.latest_version() == 0
    # same types in a different column ORDER are fine (projection)
    reordered = spark.createDataFrame(
        [("d2", 40, 4)], "day string, v long, id long"
    )
    assert log.append(reordered.select("id", "day", "v")) == 1
    assert log.append(reordered) == 2  # order normalized by cols
    assert log.read().count() == 5


def test_branch_isolated_writes_and_publish(spark, tmp_path):
    """Branches: a writable fork over the shared data namespace —
    branch writes never touch main, publish fast-forwards main in one
    metadata commit, a diverged main refuses, vacuum keeps
    branch-referenced tokens."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.sources.vacuum import vacuum_store

    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    log.append(_batch(spark, 0, 6, "d1"))                   # main v0
    main_before = {(r.id, r.v) for r in log.read().collect()}

    br = log.create_branch("dev")
    assert log.list_branches() == {"dev": 0}
    # branch starts as an exact fork
    assert {(r.id, r.v) for r in br.read().collect()} == main_before

    # dev work: merge + delete + an evolution — main stays untouched
    upd = spark.createDataFrame(
        [(2, "d1", 999), (50, "d1", 500)],
        "id long, day string, v long",
    )
    br.merge_by_key(upd, ["id"])
    br.delete_where(F.col("id") == 0)
    assert {(r.id, r.v) for r in log.read().collect()} == main_before
    assert log.latest_version() == 0
    dev_state = {(r.id, r.v) for r in br.read().collect()}
    assert (2, 999) in dev_state and (0, 0) not in dev_state

    # vacuum during dev: branch tokens are referenced, nothing eaten
    rep = vacuum_store(spark, root, older_than_seconds=0)
    assert not [r for r in rep if r["action"] == "deleted"]
    assert {(r.id, r.v) for r in br.read().collect()} == dev_state

    # publish: one metadata commit fast-forwards main
    assert log.publish_branch("dev") == 1
    assert {(r.id, r.v) for r in log.read().collect()} == dev_state
    # time travel to pre-publish main still serves the old table
    assert {(r.id, r.v) for r in log.read(as_of=0).collect()} \
        == main_before
    # the change feed carries the published delta fold-exactly
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    folded = {
        (r.id, r.v)
        for r in log.read_changes(-1)
        .groupBy("id", "day", "v")
        .agg(F.sum(sign).alias("net")).filter(F.col("net") > 0)
        .collect()
    }
    assert folded == dev_state

    # divergence: a branch forked at v0 cannot publish onto v1 main
    br2 = log.create_branch("stale", as_of=0)
    br2.append(_batch(spark, 90, 91, "d1"))
    with pytest.raises(ValueError, match="advanced"):
        log.publish_branch("stale")

    # drop the branches; their exclusive tokens become reclaimable
    assert log.delete_branch("dev") and log.delete_branch("stale")
    rep2 = vacuum_store(spark, root, older_than_seconds=0)
    freed = [r for r in rep2 if r["action"] == "deleted"]
    assert freed  # stale's append token at minimum
    assert {(r.id, r.v) for r in log.read().collect()} == dev_state
    with pytest.raises(ValueError, match="no branch"):
        log.branch_ref("dev")
    with pytest.raises(ValueError, match="branch-of-branch"):
        br.create_branch("x")


def test_streaming_source_on_a_branch(spark, tmp_path):
    """option('branch', name): the stream tails the BRANCH's commit
    chain — base snapshot feeds as the initial load, dev commits feed
    their deltas, main's chain is untouched."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.sources.filelog_stream import (
        FileLogChangeDataSource,
    )

    spark.dataSource.register(FileLogChangeDataSource)
    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    log.append(spark.range(0, 4).select("id", (F.col("id") * 10)
                                        .alias("v")))
    br = log.create_branch("dev")
    br.delete_where(F.col("id") == 1)
    br.append(spark.createDataFrame([(9, 90)], "id long, v long"))
    sink: "list" = []
    q = (
        spark.readStream.format("filelog_changes")
        .option("path", root)
        .option("branch", "dev")
        .load()
        .writeStream.foreachBatch(lambda d, b: sink.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sign_fold = {}
    for r in sink:
        k = (r.id, r.v)
        sign_fold[k] = sign_fold.get(k, 0) + (
            1 if r._change_type == "insert" else -1
        )
    assert {k for k, n in sign_fold.items() if n > 0} == {
        (r.id, r.v) for r in br.read().collect()
    }
    # version stamps are BRANCH versions (base=0, delete=1, append=2)
    assert {r._commit_version for r in sink} == {0, 1, 2}


def test_tag_and_branch_creation_races(spark, tmp_path):
    """The rename-CAS holds for governance objects too: concurrent
    same-name tag/branch creations — exactly one winner, losers get a
    clean error, no torn metadata."""
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "t")
    log = FileCommitLog(spark, root)
    log.append(_batch(spark, 0, 3, "d1"))

    def mk_tag(_):
        try:
            FileCommitLog(spark, root).create_tag("pin")
            return "ok"
        except ValueError:
            return "lost"

    with ThreadPoolExecutor(max_workers=4) as ex:
        outcomes = list(ex.map(mk_tag, range(4)))
    assert outcomes.count("ok") == 1
    assert log.read_tag("pin").count() == 3

    def mk_branch(_):
        try:
            FileCommitLog(spark, root).create_branch("dev")
            return "ok"
        except ValueError:
            return "lost"

    with ThreadPoolExecutor(max_workers=4) as ex:
        outcomes = list(ex.map(mk_branch, range(4)))
    assert outcomes.count("ok") == 1
    assert log.branch_ref("dev").read().count() == 3


def test_append_all_parallel_commits_commute(spark, tmp_path):
    """Round-13 optimization: independent appends submitted from a
    driver thread pool (guide §2.6). Claim order is a race, but the
    committed STATE must be order-invisible: every batch lands exactly
    once, versions are dense 0..n-1, and the table equals the
    sequential union."""
    log = FileCommitLog(spark, str(tmp_path / "t"), stats_cols=["v"])
    vs = log.append_all(
        [_batch(spark, i * 10, i * 10 + 10, "d1") for i in range(4)]
    )
    assert sorted(vs) == [0, 1, 2, 3]
    assert log.read().count() == 40
    assert {r.id for r in log.read().collect()} == set(range(40))
    # every commit carries its own stats (each append's file set)
    live, stats = log._live_with_stats()
    assert set(stats) == set(live)


def test_commit_stats_driver_vs_distributed_paths_identical(
    spark, tmp_path, monkeypatch
):
    """The scale-adaptive footer-stats capture (driver-side pyarrow
    below SPARK_GRAFT_STATS_DISTRIBUTED_MIN_FILES, mapInPandas at or
    above) must record byte-identical commit stats either way."""
    monkeypatch.setenv("SPARK_GRAFT_STATS_DISTRIBUTED_MIN_FILES", "64")
    a = FileCommitLog(spark, str(tmp_path / "a"), stats_cols=["v"])
    a.append(_batch(spark, 0, 50, "d1").coalesce(1))
    monkeypatch.setenv("SPARK_GRAFT_STATS_DISTRIBUTED_MIN_FILES", "0")
    b = FileCommitLog(spark, str(tmp_path / "b"), stats_cols=["v"])
    b.append(_batch(spark, 0, 50, "d1").coalesce(1))
    sa = list(a.get_commit(0)["stats"].values())
    sb = list(b.get_commit(0)["stats"].values())
    assert sa == sb and sa[0]["v"] == [0, 490] and sa[0]["n"] == 50


def test_dv_victims_recorded_and_legacy_fallback(spark, tmp_path):
    """delete_where/merge_by_key record the victim-file set with the
    vector (observed on the DV write); read_changes consumes it — and
    still derives it from the vector for commits without the key
    (legacy logs)."""
    log = FileCommitLog(spark, str(tmp_path / "t"))
    log.append(_batch(spark, 0, 10, "d1").coalesce(1))
    assert log.delete_where("id % 2 = 0") == 1
    c = log.get_commit(1)
    assert sorted(c["dv_victims"]) == sorted(
        {f for f in log.live_files(0)}
    )
    changes = log.read_changes(0, 1)
    deleted = {r.id for r in changes.collect()}
    assert deleted == {0, 2, 4, 6, 8}
    # legacy fallback: strip the key from the commit json and re-read
    import json as _json

    from metar_pipeline_spark.sources.txn import (
        _read_small_file,
        _write_small_file,
    )

    p = log._path(f"{log._cdir}/{1:020d}.json")
    meta = _json.loads(_read_small_file(log._fs, p, log._jvm))
    meta.pop("dv_victims")
    log._fs.delete(p, False)
    _write_small_file(log._fs, p, _json.dumps(meta))
    legacy = {r.id for r in log.read_changes(0, 1).collect()}
    assert legacy == deleted
