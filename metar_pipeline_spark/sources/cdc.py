"""Change-data-capture (changelog) application.

The reference's EL step is a full-collection MERGE of Mongo documents
into Postgres (reference: el/mongo_to_postgres.py:89-112) — last
writer wins, no deletes. A real CDC feed (Debezium-style) is the
general form: an ordered stream of I/U/D operations per key. This
module applies such a feed to produce (or advance) table state.

Scale notes:
- Reducing the feed to its latest change per key is ONE window pass
  (row_number over key ordered by sequence desc) — a single shuffle on
  the key, partial-agg-free but shuffle-minimal; at 100 TB the feed
  batch is the small side, never the accumulated table.
- Advancing an existing target touches only changed keys: the batch's
  key set drives a broadcast-able anti-join against the target, so the
  unchanged majority of the table is never rewritten through a
  shuffle (same pattern as operators/scd.py::scd2_apply).
- Ordering ties (same key, same seq) break deterministically by op
  precedence D > U > I so replays converge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tie-break precedence when one key carries several ops at one seq:
# the delete wins over the update wins over the insert (a replayed
# at-least-once feed then converges to the same state).
_OP_RANK = {"D": 3, "U": 2, "I": 1}


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Collapse a change feed to each key's winning (latest) change."""
    op_rank = F.when(F.col(op_col) == "D", 3).when(
        F.col(op_col) == "U", 2
    ).otherwise(1)
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col), op_rank.desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changelog(
    changes: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    target: DataFrame | None = None,
) -> DataFrame:
    """Apply an op-coded change feed and return the resulting state.

    ``changes`` carries the key columns, ``seq_col`` (monotone per
    key), ``op_col`` in {'I','U','D'}, and the payload columns. With a
    ``target`` the feed advances it incrementally: untouched target
    rows pass through, touched keys take their winning change, and a
    winning delete removes the key. Without a target the feed itself
    is the history (an initial-load snapshot).
    """
    winner = latest_changes(changes, keys, seq_col, op_col)
    survivors = winner.filter(F.col(op_col) != "D").drop(seq_col, op_col)
    if target is None:
        return survivors
    touched = winner.select(*keys).distinct()
    untouched = target.join(touched, keys, "left_anti")
    return untouched.unionByName(survivors)
