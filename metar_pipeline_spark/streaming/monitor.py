"""Streaming observability: per-micro-batch progress metrics captured
via ``StreamingQueryListener`` (SURVEY.md §2.10 Q6, streaming side).

The batch pipeline profiles each merge with ``DataFrame.observe``
(plans/medallion.py — zero extra passes); a streaming deployment needs
the same signal per micro-batch: rows ingested, processing rate, batch
duration, and stateful-operator state size. Spark already computes all
of it for every progress event — this listener just lands each event as
a metrics ROW, giving the anomaly monitor (quality/assertions.profile)
a queryable table instead of log lines.

Scale: the listener runs driver-side on already-aggregated progress
events (one tiny dict per micro-batch per query) — zero executor cost,
no extra jobs. Retention of the metrics table itself is
sources/compaction.expire_partitions.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.listener import StreamingQueryListener

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("query_name", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("event_ts", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("process_rate", T.DoubleType()),
        T.StructField("batch_duration_ms", T.LongType()),
        T.StructField("state_rows_total", T.LongType()),
        T.StructField("state_memory_bytes", T.LongType()),
        T.StructField("watermark", T.StringType()),
    ]
)


@dataclass
class ProgressMetricsListener(StreamingQueryListener):
    """Collects one metrics row per micro-batch progress event.

    Rows buffer driver-side (tiny: one per batch); ``to_df`` snapshots
    them as a DataFrame for assertions, dashboards, or an append sink.
    """

    rows: list[tuple] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        self.rows.append(
            (
                p.get("id"),
                p.get("name"),
                int(p.get("batchId", -1)),
                p.get("timestamp"),
                int(p.get("numInputRows", 0) or 0),
                float(p.get("processedRowsPerSecond", 0.0) or 0.0),
                int((p.get("durationMs") or {}).get("triggerExecution", 0)),
                sum(int(s.get("numRowsTotal", 0) or 0) for s in state),
                sum(int(s.get("memoryUsedBytes", 0) or 0) for s in state),
                (p.get("eventTime") or {}).get("watermark"),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, PROGRESS_SCHEMA)
