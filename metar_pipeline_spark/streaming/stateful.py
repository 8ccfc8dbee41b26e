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


def streaming_dedup_within_watermark(
    events: DataFrame, lateness: str = "10 minutes"
) -> DataFrame:
    """BOUNDED-state streaming dedup — the built-in production form.

    `dropDuplicatesWithinWatermark` keeps each (user_id, event_id) in
    state only until the watermark passes its event time + lateness,
    then evicts it: state is proportional to the duplicate-arrival
    window, not stream history. Use this when duplicates arrive within
    a bounded delay (at-least-once sources, retried producers) — the
    applyInPandasWithState form above is the unbounded-lifetime
    fallback for sources that can repeat ids arbitrarily late.
    """
    return events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(
        ["user_id", "event_id"]
    )


SESSIONIZE_STATE_SCHEMA = (
    "start_ms long, end_ms long, n_events long, sum_value double"
)
SESSIONIZE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def streaming_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization with event-time state TTL — the custom
    stateful operator ``F.session_window`` is the batch twin of.

    Per user: merge events into the open session while the event-time
    gap stays ≤ ``gap_seconds``; a wider gap closes the session
    immediately (append emission). The open session closes via
    ``GroupStateTimeout.EventTimeTimeout`` when the watermark passes
    session_end + gap — so state size stays bounded by the number of
    concurrently-open sessions, never by stream history. This is the
    TTL pattern the latest/dedup operators above reference.

    Late rows behind the watermark are dropped (watermark delay 0 ≡ the
    reference's high-watermark skip, SURVEY.md L7).
    """
    gap_ms = gap_seconds * 1000

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        import numpy as np

        (user_id,) = key

        def emit_many(sessions) -> pd.DataFrame:
            # ONE frame per group call. The first implementation
            # yielded a 1-row frame per closed session; at sf0.1 that
            # was ~95k tiny DataFrame constructions per micro-batch
            # and dominated the whole query (10.9 s of a 13 s run).
            return pd.DataFrame(
                {
                    "user_id": np.full(len(sessions), user_id, "int64"),
                    "session_start": pd.to_datetime(
                        [s[0] for s in sessions], unit="ms"
                    ),
                    "session_end": pd.to_datetime(
                        [s[1] for s in sessions], unit="ms"
                    ),
                    "n_events": np.array(
                        [s[2] for s in sessions], "int64"
                    ),
                    "sum_value": np.array(
                        [s[3] for s in sessions], "float64"
                    ),
                }
            )

        if state.hasTimedOut:
            closed = state.get
            state.remove()
            yield emit_many([tuple(closed)])
            return

        cur = list(state.get) if state.exists else None
        ts_parts, v_parts = [], []
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_parts.append(
                (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
            )
            v_parts.append(pdf["value"].astype("float64").to_numpy())
        sessions: list = [] if cur is None else [cur]
        if ts_parts:
            t = np.concatenate(ts_parts)
            v = np.concatenate(v_parts)
            o = np.argsort(t, kind="stable")
            t, v = t[o], v[o]
            # Segment boundaries over the sorted batch. Because rows
            # behind the watermark are dropped, every batch t is >= the
            # stored session end, so the running session end the old
            # per-event loop tracked is just the previous sorted t —
            # consecutive diffs (with the state end prepended as
            # sentinel) segment identically to that loop.
            if cur is not None and len(t) and int(t[0]) < int(cur[1]):
                # The prev-diff sentinel below assumes every batch
                # timestamp >= the stored session end — true ONLY
                # because withWatermark is pinned to '0 seconds' (late
                # rows are dropped before reaching this function). A
                # future non-zero allowed-lateness must fail loudly
                # here instead of silently mis-segmenting (r13 ADVICE).
                raise AssertionError(
                    "streaming_sessionize: batch row behind stored "
                    "session end — non-zero watermark lateness breaks "
                    "the sorted-batch segmentation invariant"
                )
            prev = np.concatenate(([cur[1]], t[:-1])) if cur else t[:-1]
            if cur:
                starts = np.flatnonzero((t - prev) > gap_ms)
            else:
                starts = np.concatenate(
                    ([0], np.flatnonzero((t[1:] - prev) > gap_ms) + 1)
                )
            if cur and (len(starts) == 0 or starts[0] > 0):
                # head rows extend the stored open session; the fold
                # order (state sum, then each v in time order) matches
                # the old loop's += exactly — reduceat is a sequential
                # left fold, unlike add.reduce's pairwise summation.
                e0 = int(starts[0]) if len(starts) else len(t)
                cur[1] = max(cur[1], int(t[e0 - 1]))
                cur[2] = int(cur[2]) + e0
                cur[3] = float(
                    np.add.reduceat(
                        np.concatenate(([cur[3]], v[:e0])), [0]
                    )[0]
                )
            if len(starts):
                ends = np.append(starts[1:], len(t))
                seg_sums = np.add.reduceat(v, starts)
                for i in range(len(starts)):
                    sessions.append(
                        [
                            int(t[starts[i]]),
                            int(t[ends[i] - 1]),
                            int(ends[i] - starts[i]),
                            float(seg_sums[i]),
                        ]
                    )
        if sessions:
            cur = sessions[-1]
            state.update(tuple(cur))
            # Timeout must sit strictly beyond the current watermark or
            # Spark rejects it; the max() keeps an already-expired open
            # session alive one more cycle, closing on the next batch.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(cur[1] + gap_ms, wm + 1))
        if len(sessions) > 1:
            yield emit_many(sessions[:-1])

    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSIONIZE_OUTPUT_SCHEMA,
            stateStructType=SESSIONIZE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 successor API
# ---------------------------------------------------------------------------
def _make_latest_processor():
    """StatefulProcessor for latest-per-key with typed ValueState.

    Same semantics as streaming_latest_per_key (update mode: a key
    re-emits only when its winner changes), expressed in the Spark 4
    ``transformWithState`` API: the winner lives in a named, typed
    ValueState slot (RocksDB-backed on a real deployment, with optional
    TTL), instead of the single opaque state tuple of
    ``applyInPandasWithState``. Kept as a parity twin so the engine
    exercises both public stateful surfaces. Runtime requirement: the
    TWS state-server protocol needs the ``protobuf`` python package
    (absent in this container — the parity test import-skips then,
    same convention as the optional media decoders).
    """
    import pandas as pd  # local import: executor-side pickling

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LatestPerKey(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._best = handle.getValueState(
                "best",
                "max_ts long, event_id long, event_type string, value double",
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            cur = self._best.get() if self._best.exists() else None
            best = tuple(cur) if cur is not None else None
            changed = False
            for pdf in rows:
                if pdf.empty:
                    continue
                ts_ns = pdf["ts"].astype("int64")
                idx = (
                    pd.DataFrame({"t": ts_ns, "i": pdf["event_id"]})
                    .sort_values(["t", "i"])
                    .index[-1]
                )
                cand = (
                    int(ts_ns.loc[idx]),
                    int(pdf["event_id"].loc[idx]),
                    str(pdf["event_type"].loc[idx]),
                    float(pdf["value"].loc[idx]),
                )
                if best is None or cand[:2] > best[:2]:
                    best = cand
                    changed = True
            if changed:
                self._best.update(best)
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "ts": [pd.Timestamp(best[0], unit="ns")],
                        "event_id": [best[1]],
                        "event_type": [best[2]],
                        "value": [best[3]],
                    }
                )

        def close(self) -> None:
            pass

    return LatestPerKey()


def streaming_latest_per_key_tws(events: DataFrame) -> DataFrame:
    """latest-per-key via ``transformWithStateInPandas`` (Spark 4 API);
    output-identical to streaming_latest_per_key."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_latest_processor(),
        outputStructType=LATEST_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
