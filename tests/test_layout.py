"""Data-layout writers (sources/layout.py): verify the files on disk
actually have the pruning-friendly statistics the writers promise, by
reading parquet footers with pyarrow — not just that Spark round-trips
the rows.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from metar_pipeline_spark.sources.layout import (
    morton_interleave,
    write_range_layout,
    write_zorder_layout,
)


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet file under ``path``."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        out.append((lo, hi))
    return out


def test_range_layout_disjoint_file_ranges(spark, tmp_path):
    out = str(tmp_path / "range")
    df = spark.range(0, 100_000).withColumn(
        "v", (F.col("id") * 7919) % 1000
    )
    write_range_layout(df, out, ["id"], num_files=8)

    ranges = sorted(_file_ranges(out, "id"))
    assert len(ranges) >= 4  # AQE may coalesce, but several buckets stay
    # Non-overlapping key ranges: a filter id BETWEEN x AND y can skip
    # every file whose [min,max] misses the interval.
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next
    # Rows intact.
    back = spark.read.parquet(out)
    assert back.count() == 100_000
    assert back.agg(F.sum("id")).first()[0] == 100_000 * 99_999 // 2


def test_morton_interleave_known_values(spark):
    rows = (
        spark.range(1)
        .select(
            morton_interleave(F.lit(0), F.lit(0)).alias("z00"),
            morton_interleave(F.lit(1), F.lit(0)).alias("z10"),
            morton_interleave(F.lit(0), F.lit(1)).alias("z01"),
            morton_interleave(F.lit(3), F.lit(5)).alias("z35"),
            morton_interleave(F.lit(65535), F.lit(65535)).alias("zmax"),
        )
        .first()
    )
    assert rows["z00"] == 0
    assert rows["z10"] == 1  # a-bits land on even positions
    assert rows["z01"] == 2  # b-bits land on odd positions
    # 3=0b011, 5=0b101 -> interleave(a=011, b=101) = 0b100111 = 39
    assert rows["z35"] == 0b100111
    assert rows["zmax"] == (1 << 32) - 1


def test_zorder_layout_shared_locality(spark, tmp_path):
    """Each Z-ordered file should cover only a small patch of the (x, y)
    domain, so box filters on either key prune most files. Compare the
    mean per-file area against the full domain."""
    out = str(tmp_path / "z")
    n = 64
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("bigint").alias("y"),
        )
    )
    write_zorder_layout(grid, out, "x", "y", num_files=16, bits=8)

    xr = _file_ranges(out, "x")
    yr = _file_ranges(out, "y")
    areas = [
        (xhi - xlo + 1) * (yhi - ylo + 1)
        for (xlo, xhi), (ylo, yhi) in zip(xr, yr)
    ]
    domain = n * n
    mean_area = sum(areas) / len(areas)
    # 16 perfect Z-tiles of a 64x64 grid cover 1/16 of the domain each;
    # allow generous slack for bucket-boundary straddling.
    assert mean_area <= domain / 3
    assert spark.read.parquet(out).count() == n * n


def test_zorder_ranges_are_aligned_tiles(spark):
    """Every 4096-code range of the 8-bit Morton curve is an aligned
    64x64 tile: within any range, BOTH dimension spans are <= 63 —
    the property that lets a z-laid-out table prune files for 2-D box
    predicates (a single-key sort bounds only one dimension)."""
    from metar_pipeline_spark.queries.scale_q import zorder_locality_audit
    from tests.conftest import SF_SMOKE

    rows = zorder_locality_audit(spark, SF_SMOKE).collect()
    assert rows, "no ranges produced"
    for r in rows:
        assert 0 <= r["a_max"] - r["a_min"] <= 63, r
        assert 0 <= r["b_max"] - r["b_min"] <= 63, r
        # and the tile is ALIGNED: both mins share the range's quadrant
        assert r["a_min"] // 64 == r["a_max"] // 64, r
        assert r["b_min"] // 64 == r["b_max"] // 64, r


def test_skipping_manifest_prunes_files_and_preserves_rows(spark, tmp_path):
    """Round-11 VERDICT #3: the min/max manifest turns footer stats
    into a pruned FILE LIST for a range predicate on an unpartitioned
    column — touched-file count pinned, result ≡ full-scan filter."""
    from metar_pipeline_spark.sources.layout import (
        build_skipping_manifest,
        pruned_files,
        skipping_scan,
        write_range_layout,
        write_skipping_manifest,
    )

    table = str(tmp_path / "table")
    manifest = str(tmp_path / "manifest")
    df = spark.range(0, 80_000).withColumn(
        "v", (F.col("id") * 7919) % 1000
    )
    write_range_layout(df, table, ["id"], num_files=8)
    write_skipping_manifest(spark, table, ["id", "v"], manifest)

    m = spark.read.parquet(manifest)
    n_files = m.count()
    assert n_files >= 4
    assert m.agg(F.sum("n_rows")).first()[0] == 80_000
    # every manifest row has closed stats on the layout key
    assert m.filter(F.col("id__min").isNull()).count() == 0

    # a narrow BETWEEN on the layout key touches ~1 bucket, not all
    lo, hi = 10_000, 10_999
    touched = pruned_files(spark, manifest, "id", lo, hi)
    assert 1 <= len(touched) <= 2  # range buckets are disjoint
    got = skipping_scan(spark, table, manifest, "id", lo, hi)
    assert got.count() == 1_000
    full = spark.read.parquet(table).filter(
        (F.col("id") >= lo) & (F.col("id") <= hi)
    )
    assert got.agg(F.sum("v")).first()[0] == full.agg(F.sum("v")).first()[0]

    # a predicate on the NON-layout column v can't prune (v spans all
    # files) — skipping degrades to a full read, never a wrong one
    all_files = pruned_files(spark, manifest, "v", 500, 501)
    assert len(all_files) == n_files
    assert (
        skipping_scan(spark, table, manifest, "v", 500, 501).count()
        == spark.read.parquet(table)
        .filter(F.col("v").between(500, 501))
        .count()
    )

    # out-of-domain predicate: zero files, empty-but-schema-stable scan
    none = skipping_scan(spark, table, manifest, "id", 10**9, 2 * 10**9)
    assert none.count() == 0
    assert [f.name for f in none.schema.fields] == ["id", "v"]

    # manifest builder is the distributed-footer path: spot-check one
    # file row against a direct pyarrow read
    row = build_skipping_manifest(spark, table, ["id"]).orderBy(
        "id__min"
    ).first()
    local = row.file[len("file:"):] if row.file.startswith("file:") else row.file
    md = pq.ParquetFile(local).metadata
    assert row.n_rows == md.num_rows


def test_skipping_manifest_partitioned_table_keeps_partition_cols(
    spark, tmp_path
):
    """Leaf-file reads with basePath keep hive partition columns."""
    from metar_pipeline_spark.sources.layout import (
        skipping_scan,
        write_skipping_manifest,
    )

    table = str(tmp_path / "ptable")
    manifest = str(tmp_path / "pmanifest")
    df = spark.range(0, 1_000).withColumn("p", F.col("id") % 2)
    df.write.partitionBy("p").parquet(table)
    write_skipping_manifest(spark, table, ["id"], manifest)
    got = skipping_scan(spark, table, manifest, "id", 100, 199)
    assert got.count() == 100
    assert "p" in [f.name for f in got.schema.fields]
    assert got.select("p").distinct().count() == 2


def test_skipping_manifest_rejects_unsupported_types(spark, tmp_path):
    from metar_pipeline_spark.sources.layout import build_skipping_manifest
    import pytest as _pt

    table = str(tmp_path / "stable")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(
        table
    )
    with _pt.raises(ValueError, match="unsupported manifest column type"):
        build_skipping_manifest(spark, table, ["s"])
    with _pt.raises(ValueError, match="not in table schema"):
        build_skipping_manifest(spark, table, ["zzz"])


def test_skipping_manifest_staleness_contract_under_compaction(
    spark, tmp_path
):
    """Compaction changes the FILE SET: a stale manifest must fail
    loudly (vanished paths), and a refresh restores pruning over the
    rewritten files — the Delta/Iceberg rewrite+stats-commit contract
    in plain-parquet form."""
    import pytest as _pt

    from metar_pipeline_spark.sources.compaction import compact_parquet_dir
    from metar_pipeline_spark.sources.layout import (
        skipping_scan,
        write_range_layout,
        write_skipping_manifest,
    )

    table = str(tmp_path / "ctable")
    manifest = str(tmp_path / "cmanifest")
    df = spark.range(0, 40_000).withColumn("v", F.col("id") % 100)
    write_range_layout(df, table, ["id"], num_files=8)
    write_skipping_manifest(spark, table, ["id"], manifest)
    before = skipping_scan(spark, table, manifest, "id", 0, 999).count()
    assert before == 1_000

    # rewrite into one file: every manifest path vanishes
    compact_parquet_dir(spark, table, target_file_bytes=1 << 30)
    with _pt.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
        skipping_scan(spark, table, manifest, "id", 0, 999).count()

    # refresh = the stats-commit step of the rewrite
    write_skipping_manifest(spark, table, ["id"], manifest)
    assert (
        skipping_scan(spark, table, manifest, "id", 0, 999).count()
        == 1_000
    )


def test_skipping_manifest_composes_with_zorder(spark, tmp_path):
    """Z-order + manifest: box predicates on EITHER key prune files —
    the two-column complement of the range-layout pin (Z-curve tiles
    give each file a bounded footprint in both dimensions)."""
    from metar_pipeline_spark.sources.layout import (
        pruned_files,
        skipping_scan,
        write_skipping_manifest,
        write_zorder_layout,
    )

    table = str(tmp_path / "ztable")
    manifest = str(tmp_path / "zmanifest")
    df = spark.range(0, 65_536).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )
    write_zorder_layout(df, table, "x", "y", num_files=16, bits=8)
    write_skipping_manifest(spark, table, ["x", "y"], manifest)
    n_files = spark.read.parquet(manifest).count()
    assert n_files >= 8

    for col in ("x", "y"):
        touched = pruned_files(spark, manifest, col, 0, 15)
        assert len(touched) < n_files  # both dimensions prune
        got = skipping_scan(spark, table, manifest, col, 0, 15).count()
        assert got == 16 * 256  # 16 of 256 values in that dimension


def test_refresh_skipping_manifest_incremental(spark, tmp_path):
    """Incremental manifest maintenance: appends footer-read only the
    NEW files, expiry drops only vanished rows, refresh ∘ refresh ≡
    full rebuild, and pruning stays correct throughout."""
    from metar_pipeline_spark.sources.layout import (
        build_skipping_manifest,
        refresh_skipping_manifest,
        skipping_scan,
    )

    table = str(tmp_path / "rtable")
    manifest = str(tmp_path / "rmanifest")

    def batch(lo, hi, sub):
        spark.range(lo, hi).withColumn("v", F.col("id") % 7).coalesce(
            1
        ).write.mode("append").parquet(table + "/" + sub)

    batch(0, 1000, "b0")
    # first refresh with no manifest = full build
    added, removed = refresh_skipping_manifest(
        spark, table, ["id"], manifest
    )
    assert (added, removed) == (1, 0)

    # two appended files: only they are new
    batch(1000, 2000, "b1")
    batch(2000, 3000, "b2")
    added, removed = refresh_skipping_manifest(
        spark, table, ["id"], manifest
    )
    assert (added, removed) == (2, 0)
    # no-op refresh
    assert refresh_skipping_manifest(spark, table, ["id"], manifest) == (
        0,
        0,
    )

    # expiry: drop one batch directory → one vanished row
    import shutil as _sh

    _sh.rmtree(table + "/b1")
    added, removed = refresh_skipping_manifest(
        spark, table, ["id"], manifest
    )
    assert (added, removed) == (0, 1)

    # refreshed manifest ≡ full rebuild, and pruning is correct
    got = sorted(
        map(tuple, spark.read.parquet(manifest).collect())
    )
    want = sorted(
        map(tuple, build_skipping_manifest(spark, table, ["id"]).collect())
    )
    assert got == want
    assert (
        skipping_scan(spark, table, manifest, "id", 2500, 2599).count()
        == 100
    )
    assert (
        skipping_scan(spark, table, manifest, "id", 1200, 1299).count()
        == 0  # expired range
    )


def test_skipping_scan_multi_box_predicate_on_zorder(spark, tmp_path):
    """Conjunctive (box) pruning over a Z-ordered layout: the AND of
    two range predicates touches fewer files than either alone, and the
    result equals the full-scan filter."""
    from metar_pipeline_spark.sources.layout import (
        pruned_files,
        pruned_files_multi,
        skipping_scan_multi,
        write_skipping_manifest,
        write_zorder_layout,
    )

    table = str(tmp_path / "box")
    manifest = str(tmp_path / "boxmanifest")
    df = spark.range(0, 65_536).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )
    write_zorder_layout(df, table, "x", "y", num_files=16, bits=8)
    write_skipping_manifest(spark, table, ["x", "y"], manifest)

    box = {"x": (0, 31), "y": (0, 31)}
    both = pruned_files_multi(spark, manifest, box)
    only_x = pruned_files(spark, manifest, "x", 0, 31)
    only_y = pruned_files(spark, manifest, "y", 0, 31)
    assert set(both) <= set(only_x) and set(both) <= set(only_y)
    assert len(both) < min(len(only_x), len(only_y))
    got = skipping_scan_multi(spark, table, manifest, box)
    assert got.count() == 32 * 32
    full = spark.read.parquet(table).filter(
        F.col("x").between(0, 31) & F.col("y").between(0, 31)
    )
    assert got.agg(F.sum(F.col("x") + F.col("y"))).first()[0] == full.agg(
        F.sum(F.col("x") + F.col("y"))
    ).first()[0]
    # empty box: schema-stable zero rows
    assert (
        skipping_scan_multi(
            spark, table, manifest, {"x": (500, 600), "y": (0, 1)}
        ).count()
        == 0
    )


def test_manifest_auto_refresh_through_writers(spark, tmp_path):
    """Round-12 VERDICT #6: a merge + compaction cycle keeps
    skipping_scan green WITHOUT any explicit refresh call — the
    writers themselves keep the manifest fresh when given its path."""
    from metar_pipeline_spark.sources.compaction import compact_parquet_dir
    from metar_pipeline_spark.sources.layout import (
        skipping_scan,
        write_skipping_manifest,
    )
    from metar_pipeline_spark.sources.merge import upsert_parquet

    table = str(tmp_path / "t")
    manifest = str(tmp_path / "t_manifest")

    def batch(lo, hi, gen):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("v"),
            F.lit(gen).cast("long").alias("gen"),
        )

    # first merge creates table + manifest
    upsert_parquet(
        spark, batch(0, 100, 0), table, keys=["k"], order_col="gen",
        manifest_cols=["v"], manifest_path=manifest,
    )
    assert skipping_scan(spark, table, manifest, "v", 100, 300).count() == 21
    # second merge rewrites the file set; manifest must follow
    upsert_parquet(
        spark, batch(50, 150, 1), table, keys=["k"], order_col="gen",
        manifest_cols=["v"], manifest_path=manifest,
    )
    got = skipping_scan(spark, table, manifest, "v", 100, 300)
    assert got.count() == 21
    assert got.filter("k = 12").first().gen == 0  # untouched key
    merged = skipping_scan(spark, table, manifest, "v", 500, 700)
    assert merged.count() == 21
    assert merged.filter("k = 52").first().gen == 1  # merged key
    # compaction replaces every file; manifest must follow again
    compact_parquet_dir(
        spark, table, target_file_bytes=1 << 30, min_files_to_compact=1,
        manifest_cols=["v"], manifest_path=manifest,
    )
    assert skipping_scan(spark, table, manifest, "v", 100, 300).count() == 21

    # the stale-manifest contract is unchanged when the caller opts out:
    # a refresh-less rewrite still fails LOUDLY on vanished files
    write_skipping_manifest(spark, table, ["v"], manifest)
    upsert_parquet(spark, batch(0, 10, 2), table, keys=["k"], order_col="gen")
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception) as ei:
        skipping_scan(spark, table, manifest, "v", 100, 300).count()
    assert isinstance(ei.value, Py4JJavaError) or "PATH_NOT_FOUND" in str(
        ei.value
    )
