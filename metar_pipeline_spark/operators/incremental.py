"""Incremental / high-watermark processing (SURVEY.md §2.7 L1-L5).

The reference's only engine-level design is dbt's incremental contract:
on each run, read the target's MAX(observed) and process only newer
source rows, then merge/append
(/root/reference/dbt/models/stg/stg_metar_observations.sql:9-19,
 /root/reference/dbt/models/ods/ods_metar_latest.sql:26-41).

Batch mode reproduces that exactly (including the deliberate ``>`` vs
``>=`` asymmetry between models — L1 vs L2). Streaming mode reframes it
as event-time watermarks (streaming/jobs.py).

Upsert without Delta Lake: parquet cannot MERGE in place, so
``merge_upsert`` implements last-writer-wins as unionByName +
latest-per-key — semantically identical to
``ON CONFLICT (id) DO UPDATE`` (/root/reference/src/etl/mongo_to_postgres.py:103-105).
At scale this is a shuffle by key over (existing ∪ new); with the target
partitioned by date, only affected partitions need rewriting
(dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.aggregates import scalar_max
from metar_pipeline_spark.operators.windows import latest_per_key_maxby


def high_watermark_filter(
    source: DataFrame,
    target: DataFrame | None,
    ts_col: str,
    inclusive: bool = False,
    default=None,
) -> DataFrame:
    """Keep source rows newer than the target's max timestamp.

    ``inclusive=False`` ≡ stg/int strict ``>`` (L1,
    stg_metar_observations.sql:15); ``inclusive=True`` ≡ ods/dwh ``>=``
    which deliberately reprocesses the boundary instant (L2,
    ods_metar_latest.sql:36). ``target=None`` ≡ first-run full refresh
    (L3, ods_metar_latest.sql:26-30).

    Late rows (ts ≤ watermark) are silently dropped, exactly like the
    reference (L7) and like a zero-delay streaming watermark.
    """
    if target is None:
        return source
    wm = scalar_max(target, ts_col, default=default)
    if wm is None:
        return source
    cmp = F.col(ts_col) >= F.lit(wm) if inclusive else F.col(ts_col) > F.lit(wm)
    return source.filter(cmp)


def merge_upsert(
    existing: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Last-writer-wins MERGE (S5/L4).

    new rows win over existing on equal keys; among duplicates the max
    ``version_col`` (then ``tiebreak``) wins. Equivalent to Delta
    ``MERGE INTO ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
    INSERT`` with updates deduped to one row per key.
    """
    if existing is None:
        merged = updates
    else:
        merged = existing.select(updates.columns).unionByName(updates)
    return latest_per_key_maxby(merged, keys, version_col, tiebreak=tiebreak)


def append_only(existing: DataFrame | None, updates: DataFrame) -> DataFrame:
    """Append materialization (L5, ods incremental_strategy='append').

    Uniqueness is enforced only by the upstream watermark filter, exactly
    like the reference (SURVEY.md §1.4). Schema drift: unionByName with
    allowMissingColumns reproduces on_schema_change='append_new_columns'.
    """
    if existing is None:
        return updates
    return existing.unionByName(updates, allowMissingColumns=True)


def merge_partial_rollups(
    parts: list[DataFrame], keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Combine pre-aggregated rollup partials by re-aggregation —
    incremental materialized-view maintenance for ADDITIVE aggregates
    (count/sum and anything derived from them downstream).

    The stored rollup and a new micro-batch's partial are both
    key-grain; merging is union + one hash aggregate at that grain,
    so advancing a 100 TB fact table's daily rollup costs O(|rollup| +
    |batch partial|) — the history is NEVER rescanned. (Non-additive
    aggregates need a mergeable sketch instead: see
    operators/sketches.py for the HLL/quantile forms.)
    """
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
