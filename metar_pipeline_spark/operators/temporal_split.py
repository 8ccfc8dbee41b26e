"""Temporal train/test split with an embargo gap (purged split).

The time-series leakage guard: hash splits (operators/curation) and
near-dup-cluster splits (operators/leakage) stop CONTENT leakage, but
a model evaluated on events later than its training window still
leaks through AUTOCORRELATION unless a gap separates the two — the
"purged K-fold with embargo" rule from financial ML (de Prado 2018),
equally standard for any event-stream corpus. Rows inside the embargo
band belong to NEITHER side; by construction
min(test epoch) > max(train epoch) + embargo_s.

Scale note: the boundary is ONE scalar. Production either knows it
(calendar cutoffs) or takes approx_percentile over the epoch column;
``cutoff=None`` here computes the EXACT interpolated percentile —
the oracle-parity path, same tradeoff as the MAD query's exact
percentile (documented there) — then broadcasts the one-row frame.
Epochs are integer seconds (Spark's timestamp→long truncation ==
DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)``, the house convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embargo_split(
    df: DataFrame,
    ts_col: str = "ts",
    train_frac: float = 0.7,
    embargo_s: int = 3 * 86400,
    cutoff: float | None = None,
) -> DataFrame:
    """Append ``ep`` (epoch seconds, BIGINT) and ``split``
    ('train' | 'embargo' | 'test').

    ``cutoff``: explicit epoch-seconds boundary; None computes the
    exact interpolated ``train_frac`` percentile of ``ep`` and
    broadcasts it (one extra scan — the production path passes the
    known boundary instead).
    """
    withep = df.withColumn("ep", F.col(ts_col).cast("long"))
    if cutoff is None:
        cut = withep.agg(
            F.expr(f"percentile(ep, {train_frac!r})").alias("__cut")
        )
        withep = withep.crossJoin(F.broadcast(cut))
    else:
        withep = withep.withColumn("__cut", F.lit(float(cutoff)))
    return withep.withColumn(
        "split",
        F.when(F.col("ep") <= F.col("__cut"), F.lit("train"))
        .when(
            F.col("ep") <= F.col("__cut") + F.lit(float(embargo_s)),
            F.lit("embargo"),
        )
        .otherwise(F.lit("test")),
    ).drop("__cut")
