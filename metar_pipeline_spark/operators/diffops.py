"""Snapshot diff audit — row-level change detection between two
versions of a keyed table.

The data-engineering twin of the reference's incremental models: where
the dbt layer (reference ``dbt/models/dwh``) trusts a watermark to tell
it what changed, ``snapshot_diff`` DERIVES the change set by comparing
two full snapshots — the audit you run when a watermark is suspected
of lying (backfills, late mutations, upstream rewrites). Output grain
is one row per changed/unchanged key with a change_type in
{inserted, deleted, updated, unchanged}.

Scale shape: each side is reduced to (key, fingerprint) before the
join — the fingerprint is a single md5 of the compare columns, so the
full-outer join shuffles two NARROW frames co-partitioned on the key,
never the wide rows. At 100 TB the natural extension is bucketed
storage on the key (both sides then sort-merge with zero exchange) and
partition-level pruning via per-partition fingerprint rollups (skip
identical partitions entirely); the per-row comparison here is the
partition-level pass's inner loop.

Determinism: fingerprints are compared only WITHIN an engine run,
never emitted — each engine may format values into the hash input its
own way as long as the mapping is injective per column value, which
string casts of keys/decimals/varchars are.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unit separator: cannot appear in the testdata's value domains, so
# concat_ws(FS, ...) is injective over the column tuple.
_FS = "\x1f"


def row_fingerprint(cols: Sequence[Column]) -> Column:
    """md5 over the FS-joined string forms of ``cols``.

    NULL handling: concat_ws skips NULLs, which would alias
    (NULL, 'x') with ('x', NULL) — coalesce each side to a sentinel
    first so the mapping stays injective.
    """
    safe = [F.coalesce(c.cast("string"), F.lit("\x00")) for c in cols]
    return F.md5(F.concat_ws(_FS, *safe))


def snapshot_diff(
    v_old: DataFrame,
    v_new: DataFrame,
    key_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns (key, change_type) where change_type ∈
    {'inserted','deleted','updated','unchanged'}; 'inserted' means the
    key exists only in ``v_new``, 'deleted' only in ``v_old``.
    """
    old_fp = v_old.select(
        F.col(key_col).alias("k"),
        row_fingerprint([F.col(c) for c in compare_cols]).alias("fp_old"),
    )
    new_fp = v_new.select(
        F.col(key_col).alias("k"),
        row_fingerprint([F.col(c) for c in compare_cols]).alias("fp_new"),
    )
    joined = old_fp.join(new_fp, "k", "full_outer")
    return joined.select(
        F.col("k").alias(key_col),
        F.when(F.col("fp_old").isNull(), F.lit("inserted"))
        .when(F.col("fp_new").isNull(), F.lit("deleted"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )


def diff_summary(diff: DataFrame, key_col: str) -> DataFrame:
    """Roll the per-key diff up to (change_type, n_rows, key_checksum).

    The key checksum (sum of keys per class) makes the summary a VALUE
    check, not just a count — two runs that classify different keys
    the same way in aggregate still disagree here.
    """
    return diff.groupBy("change_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(key_col)).alias("key_checksum"),
    )

def partition_fingerprints(
    df: DataFrame,
    part_col: str,
    key_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Order-independent per-partition rollup of row fingerprints.

    Each row's (key + compare columns) md5 is truncated to 60 bits and
    SUMMED per partition in DECIMAL(38,0) — commutative, so partition-
    internal row order can never change the rollup, and exact, so no
    two runs of the same data disagree. Two partitions with equal
    (n_rows, fp_sum) are byte-equal for diff purposes (a forged
    collision needs ~2^30 adversarial rows per Birthday bound on the
    60-bit truncation — an audit, not a cryptographic, guarantee; the
    row-level pass confirms every partition the rollup flags).
    """
    fp = row_fingerprint(
        [F.col(key_col)] + [F.col(c) for c in compare_cols]
    )
    fp60 = F.conv(F.substring(fp, 1, 15), 16, 10).cast("decimal(38,0)")
    return df.groupBy(F.col(part_col)).agg(
        F.count("*").alias("n_rows"),
        F.sum(fp60).alias("fp_sum"),
    )


def snapshot_diff_pruned(
    v_old: DataFrame,
    v_new: DataFrame,
    part_col: str,
    key_col: str,
    compare_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """The 100-TB diff shape: skip identical partitions entirely.

    Pass 1 rolls each side up to one (n_rows, fp_sum) row per
    PARTITION (map-side-combined aggregate — the full scan, but the
    shuffle is partition-grain). Partitions whose rollups match on
    both sides cannot contain any inserted/deleted/updated key and are
    excluded from pass 2: the changed-partition frame (partition-grain,
    checkpointed once — two branches consume it) inner-joins both
    sides, and with a Hive-partitioned store DYNAMIC PARTITION PRUNING
    pushes it into the scans (``dynamicpruningexpression`` under
    ``PartitionFilters``) so unchanged partitions' files are never
    opened (pinned in tests/test_corpus_ops.py). Everything stays
    distributed — no changed-partition list ever rides the driver.

    The ``_dpp_tag`` filter exists for the planner, not the data:
    DPP's ``hasSelectivePredicate`` heuristic only inserts a pruning
    subquery when the dim side carries a selective predicate — a bare
    (checkpointed) table scan is assumed unselective (same device as
    test_scale_ops.py::test_dynamic_partition_pruning_on_day_partitioned_fact).

    Returns ``(row_diff, changed_partitions)`` — the second a
    one-column DataFrame; keys in unchanged partitions are omitted
    from ``row_diff`` (they are all 'unchanged' by construction).
    """
    fps_old = partition_fingerprints(v_old, part_col, key_col, compare_cols)
    fps_new = partition_fingerprints(v_new, part_col, key_col, compare_cols)
    o = fps_old.alias("o")
    n = fps_new.alias("n")
    changed = (
        o.join(n, F.col(f"o.{part_col}") == F.col(f"n.{part_col}"), "full_outer")
        .filter(
            F.col("o.n_rows").isNull()
            | F.col("n.n_rows").isNull()
            | (F.col("o.n_rows") != F.col("n.n_rows"))
            | (F.col("o.fp_sum") != F.col("n.fp_sum"))
        )
        .select(
            F.coalesce(F.col(f"o.{part_col}"), F.col(f"n.{part_col}")).alias(
                part_col
            ),
            F.lit("changed").alias("_dpp_tag"),
        )
        .localCheckpoint(eager=True)
    )
    dim = changed.filter(F.col("_dpp_tag") == "changed").select(part_col)
    diff = snapshot_diff(
        v_old.join(F.broadcast(dim), part_col),
        v_new.join(F.broadcast(dim), part_col),
        key_col,
        compare_cols,
    )
    return diff, changed.select(part_col)
