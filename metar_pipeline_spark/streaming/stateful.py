"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only stateful behavior is "latest row per airport"
maintained by re-running a window over the whole table every 30 minutes
(/root/reference/dbt/models/int/int_metar_latest.sql:9-17). A streaming
engine keeps that state per key and touches only the keys present in
each micro-batch. Two operators:

- ``streaming_latest_per_key``: per-key (ts, tiebreak)-max payload,
  emitted whenever it changes — the int-layer as an O(|batch keys|)
  incremental update instead of an O(|table|) rescan.
- ``streaming_first_seen_dedup``: exactly-once emission of the first
  occurrence of each (key, id) — the streaming form of exact dedup
  (dbt's merge-by-unique-key, stg_metar_observations.sql:5-6, keeps one
  row per id the same way).

State size is bounded by the key cardinality (latest) / seen-id count
(dedup); production deployments bound the latter with state TTL
(GroupStateTimeout) or a watermark-scoped id set. Arrow moves each
group's rows to Python in one batch — this is the
`applyInPandasWithState` shape from the public Structured Streaming
docs, not a per-row UDF.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LATEST_STATE_SCHEMA = "max_ts long, event_id long, event_type string, value double"
LATEST_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def streaming_latest_per_key(events: DataFrame) -> DataFrame:
    """Latest event per user_id, maintained incrementally across
    micro-batches (update semantics: a key re-emits only when its winner
    changes)."""

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        best_ts, best_id, best_type, best_val = (
            state.get if state.exists else (None, None, None, None)
        )
        changed = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            # micro-batch winner first (vectorized), then compare to state
            ts_ns = pdf["ts"].astype("int64")
            idx = (
                pd.DataFrame({"t": ts_ns, "i": pdf["event_id"]})
                .sort_values(["t", "i"])
                .index[-1]
            )
            row_ts = int(ts_ns.loc[idx])
            row_id = int(pdf["event_id"].loc[idx])
            if best_ts is None or (row_ts, row_id) > (best_ts, best_id):
                best_ts, best_id = row_ts, row_id
                best_type = pdf["event_type"].loc[idx]
                best_val = float(pdf["value"].loc[idx])
                changed = True
        if changed:
            state.update((best_ts, best_id, best_type, best_val))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "ts": [pd.Timestamp(best_ts, unit="ns")],
                    "event_id": [best_id],
                    "event_type": [best_type],
                    "value": [best_val],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=LATEST_OUTPUT_SCHEMA,
        stateStructType=LATEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_STATE_SCHEMA = "seen array<long>"
DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def streaming_first_seen_dedup(events: DataFrame) -> DataFrame:
    """Emit only the first occurrence of each (user_id, event_id) across
    the stream's lifetime — exactly-once dedup with per-key id state.

    The in-state id set is the bounded-cardinality piece a production
    deployment would scope with a watermark (dropDuplicatesWithinWatermark
    is the built-in when ids repeat only within a bounded lateness).
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            fresh = pdf[~pdf["event_id"].isin(seen)].drop_duplicates(
                subset=["event_id"]
            )
            if not fresh.empty:
                seen.update(int(x) for x in fresh["event_id"])
                out.append(
                    pd.DataFrame(
                        {
                            "user_id": user_id,
                            "event_id": fresh["event_id"].astype("int64"),
                            "ts": fresh["ts"],
                            "value": fresh["value"].astype("float64"),
                        }
                    )
                )
        state.update((sorted(seen),))
        for o in out:
            yield o

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
