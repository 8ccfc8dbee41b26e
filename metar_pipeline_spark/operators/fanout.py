"""Scale-adaptive parallelism floor for CPU-heavy per-row expansion.

Guide §2.5/§6: a scan of one small file yields ONE input partition, so
an operator that multiplies per-row work (the d² Gram explode, token
explodes, n-gram shingling) runs its whole map side on a single core
while the rest of the cluster idles — measured round 13:
embedding_gram_matrix spent 7.6 s in ONE task (31 cores idle) because
embeddings/ is a single 780 KB parquet file at sf0.1.

At 100 TB the same scan carries thousands of splits and needs no help —
so the floor is CONDITIONAL: repartition up to the cluster's task-slot
count only when the upstream partitioning is narrower. The no-op branch
costs nothing at scale; the repartition branch is a shuffle of the
small input (by construction: it only fires when the input is narrow,
i.e. small or badly laid out — and for badly-laid-out big inputs the
shuffle is exactly what you want before multiplying its rows).

Callers should PROJECT FIRST (guide §2.3) so only the columns the
expansion needs cross the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to ``defaultParallelism``
    partitions iff it currently has fewer — the scale-adaptive floor
    described in the module docstring. Safe only when downstream
    results are partitioning-invariant (exact/deterministic
    aggregation, per-row functions); every caller in this repo is.

    CALLER CONTRACT: ``df`` must be exchange-free above its source (a
    scan + narrow ops) or already materialized (localCheckpoint) — the
    partition-count probe on a pre-execution AQE plan would otherwise
    trigger execution of its query stages just to read the count.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
