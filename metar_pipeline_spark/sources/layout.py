"""Data-layout writers for scan pruning at scale.

The reference stores everything in unpartitioned Postgres heaps
(/root/reference/infra/docker-compose.yml:33-51) — fine at 960 rows/day,
fatal at 100 TB. These writers arrange parquet so the engine's scans can
skip data instead of reading it:

- ``write_range_layout``: repartitionByRange on the pruning key(s) +
  sortWithinPartitions. Each output file then owns a narrow,
  non-overlapping key range, so parquet footer min/max stats prune whole
  files/row-groups for range predicates on that key. This is the layout
  for "one dominant filter column" tables (event time, order date).

- ``write_zorder_layout``: Morton (Z-order) interleaving of two integer
  keys, then range-partition + sort on the Z-value. Locality is shared
  between BOTH columns, so box predicates on either (or both) keys prune
  well — the multi-dimensional analogue of the single-key layout
  (public technique; Delta OPTIMIZE ZORDER BY implements the same idea).

Neither writer shuffles more than once (the range exchange), and the
sort is within-partition only — no global sort barrier. AQE still
coalesces small range buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_range_layout(
    df: DataFrame,
    path: str,
    keys: list[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-partition on ``keys`` into ``num_files`` buckets and sort
    rows within each, then write one parquet file per bucket."""
    (
        df.repartitionByRange(num_files, *[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .write.mode(mode)
        .parquet(path)
    )


def morton_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) code: interleave the low ``bits`` bits of two
    non-negative ints — bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1. Pure JVM bitwise math (codegen-friendly, no UDF).

    Inputs are clamped to the ``bits``-bit range; callers with wider
    domains should quantile-bucket first (see ``write_zorder_layout``).
    """
    mask = (1 << bits) - 1
    aa = F.least(F.greatest(a.cast("bigint"), F.lit(0)), F.lit(mask))
    bb = F.least(F.greatest(b.cast("bigint"), F.lit(0)), F.lit(mask))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(aa.bitwiseAND(F.lit(1 << i)), i)
        ).bitwiseOR(F.shiftleft(bb.bitwiseAND(F.lit(1 << i)), i + 1))
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    key_a: str,
    key_b: str,
    num_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Lay out parquet along the Z-curve of (key_a, key_b).

    Keys are first min-max scaled onto the ``bits``-bit grid. The
    min/max pass is one cheap distributed aggregate (no global sort, no
    single-partition window — those would not survive 100 TB). Heavily
    skewed keys can swap in approxQuantile cut points; the layout
    property is unchanged.
    """
    scale = (1 << bits) - 1
    lo_a, hi_a, lo_b, hi_b = df.select(
        F.min(key_a), F.max(key_a), F.min(key_b), F.max(key_b)
    ).first()

    def quant(col: str, lo, hi) -> Column:
        span = float(hi - lo) or 1.0
        return ((F.col(col) - F.lit(lo)) / F.lit(span) * scale).cast(
            "bigint"
        )

    zdf = df.withColumn(
        "_z",
        morton_interleave(
            quant(key_a, lo_a, hi_a), quant(key_b, lo_b, hi_b), bits
        ),
    )
    (
        zdf.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
