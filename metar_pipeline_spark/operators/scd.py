"""Slowly-changing-dimension (Type 2) operators.

The reference's warehouse layer keeps only latest-row-per-key
(/root/reference/dbt/models/int/int_metar_latest.sql:13-23 — Type 1
overwrite semantics). A production warehouse built on the same medallion
shape almost always also needs the Type 2 form — full validity-interval
history per key — so the engine ships it as a first-class operator pair:

- ``scd2_from_changes``: batch build — collapse an ordered change log
  into one row per (key, attribute-run) with ``[valid_from, valid_to)``
  intervals and an ``is_current`` flag.
- ``scd2_apply``: incremental build — merge a new micro-batch of changes
  into an existing dimension WITHOUT rescanning closed history. The
  contract (verified by tests and the driver oracle) is strict parity:
  ``scd2_apply(scd2_from_changes(hist), batch) ==
  scd2_from_changes(hist ∪ batch)``.

Scale shape: everything is per-key window math (hash-partitioned on the
key — the natural SCD parallelism) plus key-level semi/anti joins for
the incremental split; the new batch's key set is DISTINCT-reduced
before joining, so with a typical "few keys change per batch" workload
the join probe side is tiny (broadcast-able). Closed intervals are
never recomputed — at 100 TB the closed history is the overwhelming
bulk of the dimension and it rides through untouched (file-level
no-op under a partition-on-key layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    changes: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Consecutive rows (per key, ordered by ``(ts, tiebreak)``) with the
    same attribute value merge into one interval; an interval's
    ``valid_from`` is its first change's timestamp and its ``valid_to``
    is the next interval's ``valid_from`` (NULL + ``is_current`` for
    the open one) — the standard half-open ``[from, to)`` convention.

    Output: (key, attr, valid_from, valid_to, is_current) with the
    input's column names for key/attr.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    # run boundary ⇔ first row or attribute differs from predecessor
    flagged = changes.select(
        key_col,
        attr_col,
        ts_col,
        tiebreak_col,
        F.when(
            F.lag(attr_col).over(w).isNull()
            | (F.col(attr_col) != F.lag(attr_col).over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_chg"),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    collapsed = runs.groupBy(key_col, "run_id").agg(
        F.min(attr_col).alias(attr_col),  # constant within a run
        F.min(ts_col).alias("valid_from"),
    )
    # run_id is monotone in change order per key, so it is the correct
    # deterministic LEAD order even when two runs start at the same ts
    wl = Window.partitionBy(key_col).orderBy(F.col("run_id").asc())
    return collapsed.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        F.lead("valid_from").over(wl).isNull().alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge a new batch of changes into an existing SCD2 dimension.

    Contract: every batch timestamp is strictly after the open
    interval's ``valid_from`` for its key (the incremental
    high-watermark guarantee, SURVEY.md §2.7 L1) — the same late-data
    contract the reference's incremental models assume.

    Only keys present in the batch are touched: their OPEN interval is
    replayed as a seed pseudo-change (so a batch continuing the same
    attribute value extends the open run instead of opening a new one),
    re-collapsed together with the batch, and stitched back onto their
    untouched CLOSED intervals; keys absent from the batch pass through
    whole. Result is bit-identical to a full rebuild over the combined
    change log.
    """
    batch_keys = batch.select(F.col(key_col)).distinct()
    untouched = dim.join(batch_keys, key_col, "left_anti")
    affected = dim.join(F.broadcast(batch_keys), key_col, "left_semi")
    closed = affected.filter(~F.col("is_current"))
    # the open interval becomes the earliest pseudo-change of the replay
    # (tiebreak below any real change id so it sorts first on ts ties —
    # unreachable anyway under the strict-watermark contract)
    seed = affected.filter(F.col("is_current")).select(
        key_col,
        attr_col,
        F.col("valid_from").alias(ts_col),
        F.lit(-1).cast("long").alias(tiebreak_col),
    )
    replay = seed.unionByName(
        batch.select(
            key_col,
            attr_col,
            ts_col,
            F.col(tiebreak_col).cast("long"),
        )
    )
    rebuilt = scd2_from_changes(replay, key_col, attr_col, ts_col, tiebreak_col)
    return untouched.unionByName(closed).unionByName(rebuilt)
