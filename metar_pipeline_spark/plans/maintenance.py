"""Scheduled table maintenance — one entrypoint for the ops lifecycle.

The reference delegates all upkeep to Postgres autovacuum and an
Airflow schedule (infra/airflow/dags/metar_pipeline_dag.py); a parquet
lake at 100 TB needs the equivalent run explicitly. This module is the
nightly-maintenance composition of the engine's verified pieces — what
an operator actually schedules:

- ``compact``        → :func:`sources.compaction.compact_parquet_dir` /
                       ``compact_partitions`` (small-file rewrite)
- ``expire``         → :func:`sources.compaction.expire_partitions`
                       (date-partition retention, directory surgery)
- ``expire_runs``    → :func:`sources.compaction.expire_integer_partitions`
                       (newest-N retention for ``_run=``/``_batch=`` stores)
- ``checkpoint_log`` → :func:`streaming.lifecycle.checkpoint_and_truncate`
                       (fold + truncate a ``_batch`` store)
- ``refresh_manifest`` → :func:`sources.layout.refresh_skipping_manifest`
                       (incremental footer stats for data skipping)
- ``monitor``        → :func:`quality.anomalies.metrics_store_anomalies`
                       (run-history anomaly flags over a metrics store)
- ``vacuum``         → :func:`sources.vacuum.vacuum_store`
                       (orphan-file GC with a safety horizon; restores
                       stranded asides, deletes dead staging/snapshots)
- ``compact_versioned`` / ``expire_versions``
                     → :mod:`sources.txn` (optimistic-commit compaction
                       and commit-log retention for versioned stores —
                       maintenance through the SAME protocol the ingest
                       writers use, so a racing merge conflicts cleanly
                       instead of corrupting)
- ``compact_filelog`` / ``checkpoint_filelog`` / ``sync_filelog``
                     → :mod:`sources.filelog` (token compaction —
                       optionally CLUSTERED with stats re-capture, the
                       OPTIMIZE ZORDER shape — log checkpoint+expire,
                       and scheduled exactly-once change-feed
                       replication into a downstream changelog table)

Each task is independent and isolated: a failing task records its error
and the runner continues (the ops-runner contract — one bad table must
not block retention everywhere else). The report is returned as a
DataFrame so it can be appended to an ops log like any other table.

Scale notes: every task here is metadata-driven (directory listings,
footer reads, store-grain folds) — the runner never scans fact data
itself; the heavy I/O (compaction rewrite) is bounded to the targeted
paths.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

REPORT_SCHEMA = (
    "task string, target string, ok boolean, detail string, error string"
)


def _run_one(spark: SparkSession, t: "dict[str, Any]") -> "tuple[str, str]":
    kind = t["task"]
    if kind == "compact":
        from metar_pipeline_spark.sources.compaction import (
            compact_parquet_dir,
            compact_partitions,
        )

        if "partition_col" in t:
            out = compact_partitions(
                spark,
                t["path"],
                t["partition_col"],
                target_file_bytes=t.get("target_file_bytes", 128 << 20),
                min_files_to_compact=t.get("min_files_to_compact", 2),
            )
            return t["path"], f"compacted_partitions={len(out)}"
        n = compact_parquet_dir(
            spark,
            t["path"],
            target_file_bytes=t.get("target_file_bytes", 128 << 20),
            min_files_to_compact=t.get("min_files_to_compact", 2),
            manifest_cols=t.get("manifest_cols"),
            manifest_path=t.get("manifest"),
        )
        return t["path"], f"n_files={n}"
    if kind == "expire":
        from metar_pipeline_spark.sources.compaction import expire_partitions

        dropped = expire_partitions(
            spark,
            t["path"],
            t["partition_col"],
            t["keep_from"],
            dry_run=t.get("dry_run", False),
        )
        return t["path"], f"dropped={len(dropped)}"
    if kind == "expire_runs":
        from metar_pipeline_spark.sources.compaction import (
            expire_integer_partitions,
        )

        dropped = expire_integer_partitions(
            spark,
            t["path"],
            t.get("partition_col", "_run"),
            t["keep_last"],
            dry_run=t.get("dry_run", False),
        )
        return t["path"], f"dropped={len(dropped)}"
    if kind == "checkpoint_log":
        from metar_pipeline_spark.streaming.lifecycle import (
            checkpoint_and_truncate,
        )

        sid = checkpoint_and_truncate(
            spark,
            t["log"],
            t["snapshots"],
            t["merge_fn"],
            through_batch=t["through_batch"],
            keep_snapshots=t.get("keep_snapshots", 1),
        )
        return t["log"], f"snapshot={sid}"
    if kind == "refresh_manifest":
        from metar_pipeline_spark.sources.layout import (
            refresh_skipping_manifest,
        )

        added, removed = refresh_skipping_manifest(
            spark, t["table"], t["cols"], t["manifest"]
        )
        return t["manifest"], f"added={added} removed={removed}"
    if kind == "vacuum":
        from metar_pipeline_spark.sources.vacuum import vacuum_store

        report = vacuum_store(
            spark,
            t["path"],
            older_than_seconds=t.get(
                "older_than_seconds", 7 * 24 * 3600
            ),
        )
        by_action: "dict[str, int]" = {}
        for r in report:
            by_action[r["action"]] = by_action.get(r["action"], 0) + 1
        return t["path"], " ".join(
            f"{k}={v}" for k, v in sorted(by_action.items())
        ) or "clean"
    if kind == "compact_versioned":
        from metar_pipeline_spark.sources.txn import (
            VersionedStore,
            compact_versioned,
        )

        v = compact_versioned(
            VersionedStore(spark, t["path"]),
            target_file_bytes=t.get("target_file_bytes", 128 << 20),
            min_files_to_compact=t.get("min_files_to_compact", 2),
        )
        return t["path"], f"version={v}" if v is not None else "noop"
    if kind == "expire_versions":
        from metar_pipeline_spark.sources.txn import (
            VersionedStore,
            expire_versions,
        )

        dropped = expire_versions(
            VersionedStore(spark, t["path"]), t["keep_last"]
        )
        return t["path"], f"dropped={len(dropped)}"
    if kind == "compact_filelog":
        from metar_pipeline_spark.sources.filelog import FileCommitLog

        # stats_cols must ride the rewrite or a maintenance compaction
        # silently degrades the log's data skipping (files without
        # stats are never prunable); cluster_by turns the task into
        # Delta's OPTIMIZE ZORDER.
        v = FileCommitLog(
            spark, t["path"], stats_cols=t.get("stats_cols")
        ).compact(
            partition_cols=t.get("partition_cols"),
            min_tokens=t.get("min_tokens", 2),
            cluster_by=t.get("cluster_by"),
            target_files=t.get("target_files", 8),
        )
        return t["path"], f"version={v}" if v is not None else "noop"
    if kind == "sync_filelog":
        from metar_pipeline_spark.sources.filelog import FileCommitLog

        dst = FileCommitLog(
            spark, t["path"], stats_cols=t.get("stats_cols")
        )
        v = dst.sync_changes_from(
            FileCommitLog(spark, t["source"]),
            app_id=t.get("app_id", "maintenance-sync"),
            partition_cols=t.get("partition_cols"),
        )
        return t["path"], f"version={v}" if v is not None else "noop"
    if kind == "checkpoint_filelog":
        from metar_pipeline_spark.sources.filelog import FileCommitLog

        log = FileCommitLog(spark, t["path"])
        v = log.write_checkpoint()
        dropped = log.expire_commits()
        return t["path"], f"checkpoint={v} dropped={len(dropped)}"
    if kind == "monitor":
        from metar_pipeline_spark.quality.anomalies import (
            metrics_store_anomalies,
        )

        metrics = spark.read.parquet(t["metrics"])
        flags = metrics_store_anomalies(
            metrics,
            layer=t.get("layer", "stg"),
            k=t.get("k", 3),
            min_history=t.get("min_history", 3),
            rule=t.get("rule", "sigma"),
        )
        n_bad = flags.filter("is_anomaly").count()
        return t["metrics"], f"anomalies={n_bad}"
    raise ValueError(f"unknown maintenance task {kind!r}")


def run_maintenance(
    spark: SparkSession, tasks: "list[dict[str, Any]]"
) -> DataFrame:
    """Run the maintenance ``tasks`` in order; one report row each.
    A task failure is recorded (ok=false, error) and the run continues.
    Append the returned frame to an ops log for run-history auditing
    (it is itself a fine :mod:`quality.anomalies` input once keyed)."""
    rows = []
    for t in tasks:
        kind = str(t.get("task"))
        try:
            target, detail = _run_one(spark, t)
            rows.append((kind, target, True, detail, None))
        except Exception as e:  # noqa: BLE001 — ops-runner isolation
            rows.append(
                (
                    kind,
                    str(
                        t.get("path")
                        or t.get("log")
                        or t.get("table")
                        or t.get("metrics")
                        or ""
                    ),
                    False,
                    None,
                    f"{type(e).__name__}: {e}",
                )
            )
    return spark.createDataFrame(rows, REPORT_SCHEMA)
