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
