"""Join surface (SURVEY.md §2.3).

The reference itself contains exactly one join shape — the dbt
``relationships`` test compiled to a LEFT JOIN ... IS NULL
(/root/reference/dbt/models/dwh/schema.yml:19-22) — but the engine ships
the full join surface because the correctness harness runs TPC-H-style
multi-table queries.

Scale policy:
- dimension tables (region/nation/supplier/part at TPC-H shapes, the
  20-row station dim in METAR terms) are always broadcast — an explicit
  ``F.broadcast`` hint so the plan is BroadcastHashJoin regardless of
  stats staleness;
- fact-fact joins shuffle on the join key and rely on AQE for skew
  splitting; helpers below keep key types aligned so no cast blocks
  pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Fact⋈dim with an explicit broadcast hint on the dim side."""
    return fact.join(F.broadcast(dim), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """As-of join: for each left row, the right row with the greatest
    ``right_ts`` <= ``left_ts`` in the same key group (ties on right_ts
    broken by greatest ``tiebreak``). Left rows with no prior right row
    are dropped (inner as-of).

    Scale design: NOT a range join (which explodes to |L|x|R| per key
    before filtering). Both sides are tagged and unioned, then a single
    window per key ordered by (t, side, tiebreak) carries the last seen
    right payload forward — one shuffle on the key, linear work, the
    standard big-data as-of formulation. Right rows sort before left
    rows at equal t (inclusive <=).
    """
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
    )
    lcols = left.columns
    l = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in lcols],
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__t"), F.asc("__side"), F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r.select(*l.columns[:5]), allowMissingColumns=True)
    carried = carried.withColumn(
        "__last", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(
        (F.col("__side") == 1) & F.col("__last").isNotNull()
    )
    return out.select(*lcols, *[F.col(f"__last.{c}").alias(c) for c in payload])


def bucketed_range_join(
    left: DataFrame,
    left_ts: str,
    intervals: DataFrame,
    start: str,
    end: str,
    granularity: str = "1 hour",
) -> DataFrame:
    """Interval join: left rows whose ``left_ts`` falls in ``[start, end)``
    of an intervals row, without the |L|x|I| theta-join cross product.

    Each interval is exploded into the coarse time buckets it covers
    (``F.sequence`` — JVM-side, rows = interval_len/granularity), the fact
    side gets its bucket via ``date_trunc``, and the join is a plain hash
    equi-join on the bucket followed by the exact containment refilter.
    At 100 TB this is the difference between a BroadcastNestedLoopJoin
    (quadratic, non-shuffleable) and a shuffled/broadcast hash join that
    AQE can size. Granularity should be >= the typical interval length's
    order of magnitude divided by ~100 to bound the explode factor.
    """
    amount, unit = granularity.split()
    if amount != "1":
        raise ValueError(
            "granularity must be a single date_trunc unit (e.g. '1 hour') "
            "so fact-side truncation aligns with the interval bucket grid"
        )
    gran = F.expr(f"INTERVAL {amount} {unit.rstrip('s').upper()}S")
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc(unit.rstrip("s"), F.col(start)),
                F.date_trunc(unit.rstrip("s"), F.col(end) - F.expr("INTERVAL 1 SECOND")),
                gran,
            )
        ),
    )
    fact = left.withColumn(
        "__bucket", F.date_trunc(unit.rstrip("s"), F.col(left_ts))
    )
    return (
        fact.join(iv, "__bucket")
        .filter((F.col(left_ts) >= F.col(start)) & (F.col(left_ts) < F.col(end)))
        .drop("__bucket")
    )


def fk_violations(child: DataFrame, parent: DataFrame, child_key, parent_key) -> DataFrame:
    """Rows of ``child`` whose key has no match in ``parent`` (J1).

    LEFT ANTI join ≡ dbt relationships test; broadcast the parent side
    when it is a dim (the reference's parent is the 20-icao stg table).
    """
    # Alias the parent key so self-named keys don't collide in resolution.
    parent_keys = parent.select(F.col(parent_key).alias("__fk")).distinct()
    return child.join(
        F.broadcast(parent_keys), F.col(child_key) == F.col("__fk"), "left_anti"
    )
