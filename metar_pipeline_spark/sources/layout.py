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


def morton_interleave_k(cols: "list[Column]", bits: int) -> Column:
    """K-way Morton code: bit j of key i lands at position j·k + i
    (round-robin interleave — the 2-key :func:`morton_interleave`
    generalized). Pure JVM bitwise math; inputs clamped to ``bits``
    bits each. Callers keep k·bits ≤ 63 (see the bits clamp in
    ``filelog.FileCommitLog._clustered``)."""
    k = len(cols)
    if k < 1:
        raise ValueError("morton_interleave_k needs at least one key")
    mask = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        cc = F.least(F.greatest(c.cast("bigint"), F.lit(0)), F.lit(mask))
        for j in range(bits):
            # shift bit j (at position j) to position j*k + i
            z = z.bitwiseOR(
                F.shiftleft(cc.bitwiseAND(F.lit(1 << j)),
                            j * (k - 1) + i)
            )
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


# ---------------------------------------------------------------------------
# File-level min/max data skipping for NON-partition columns
# ---------------------------------------------------------------------------
MANIFEST_META_COLS = ("file", "n_rows")


def _manifest_schema(table_schema, cols: "list[str]") -> str:
    """Manifest DDL: (file, n_rows, <col>__min, <col>__max ...) with
    min/max typed as the table column (numeric columns only — string
    footer stats can be TRUNCATED by writers, so a string manifest
    would need prefix-aware comparisons; out of scope here)."""
    by_name = {f.name: f for f in table_schema.fields}
    parts = ["file string", "n_rows long"]
    for c in cols:
        if c not in by_name:
            raise ValueError(f"column {c!r} not in table schema")
        t = by_name[c].dataType.simpleString()
        if t not in ("bigint", "int", "smallint", "tinyint", "double",
                     "float", "date"):
            raise ValueError(
                f"unsupported manifest column type {t!r} for {c!r}"
            )
        wide = {"int": "bigint", "smallint": "bigint", "tinyint": "bigint",
                "float": "double"}.get(t, t)
        parts += [f"{c}__min {wide}", f"{c}__max {wide}"]
    return ", ".join(parts)


def build_skipping_manifest(
    spark, table_path: str, cols: "list[str]"
) -> DataFrame:
    """(file, n_rows, <col>__min, <col>__max ...) — one row per data
    file, built from parquet FOOTER statistics only (the Iceberg
    manifest / Delta stats idea: at 100 TB this reads KBs of metadata
    per file, never data pages).

    The footer reads are DISTRIBUTED: the file list (a directory
    listing — metadata grain) fans out over ``mapInPandas`` and each
    task reads only its files' footers with pyarrow. Missing stats
    (all-null column, stats-less writer) yield NULL min/max — skipping
    then KEEPS the file (can't prove exclusion), never drops it.
    """
    ddl = _manifest_schema(_table_schema(spark, table_path), cols)
    files = _list_data_files(spark, table_path)
    return _manifest_for_files(spark, files, cols, ddl)


def _table_schema(spark, table_path: str):
    """Schema of a parquet table root — tolerant of plain (non-hive)
    subdirectory layouts such as streaming batch drops, which the
    default reader refuses to infer."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(table_path).schema
    except AnalysisException:
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(table_path)
            .schema
        )


def _list_data_files(spark, table_path: str) -> "list[str]":
    """Recursive data-file listing under Spark's FULL hidden-path rule:
    a file is excluded if ANY path component below the table root —
    not just its own basename — starts with ``_`` or ``.`` (Spark's
    reader skips whole hidden subtrees, e.g. ``_quarantine_stg/`` or a
    dot-staging dir, so a manifest that listed files under them would
    carry rows the table scan never serves)."""
    from metar_pipeline_spark.sources.merge import _hadoop_fs

    fs, hpath, _ = _hadoop_fs(spark, table_path)
    root = hpath.toUri().getPath().rstrip("/")
    files = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        if not st.isFile():
            continue
        rel = st.getPath().toUri().getPath()
        rel = rel[len(root):].lstrip("/") if rel.startswith(root) else rel
        if any(part.startswith(("_", ".")) for part in rel.split("/")):
            continue
        files.append(st.getPath().toString())
    return files


def _manifest_for_files(spark, files: "list[str]", cols, ddl: str):
    paths = spark.createDataFrame([(f,) for f in files], "file string")
    want = list(cols)

    def footer_stats(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["file"]:
                local = path[len("file:"):] if path.startswith("file:") else path
                md = pq.ParquetFile(local).metadata
                idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }
                row = {"file": path, "n_rows": md.num_rows}
                for c in want:
                    mn = mx = None
                    i = idx.get(c)
                    if i is not None:
                        for g in range(md.num_row_groups):
                            s = md.row_group(g).column(i).statistics
                            if s is None or not s.has_min_max:
                                mn = mx = None
                                break
                            mn = s.min if mn is None else min(mn, s.min)
                            mx = s.max if mx is None else max(mx, s.max)
                    row[f"{c}__min"] = mn
                    row[f"{c}__max"] = mx
                out.append(row)
            yield pd.DataFrame(
                out, columns=["file", "n_rows"]
                + [f"{c}__{s}" for c in want for s in ("min", "max")]
            )

    return paths.mapInPandas(footer_stats, ddl)


def write_skipping_manifest(
    spark, table_path: str, cols: "list[str]", manifest_path: str
) -> None:
    """Persist the manifest beside the table (call after each write /
    compaction — the write-time capture Delta gets from its txn log).
    Manifest grain: one row per file — KB-sized metadata at any data
    scale."""
    build_skipping_manifest(spark, table_path, cols).write.mode(
        "overwrite"
    ).parquet(manifest_path)


def refresh_skipping_manifest(
    spark, table_path: str, cols: "list[str]", manifest_path: str
) -> "tuple[int, int]":
    """INCREMENTAL manifest maintenance: footer-read only files that are
    NEW since the last manifest, drop rows for files that vanished
    (compaction, merge rewrites, partition expiry). Returns
    (n_added, n_removed).

    At a streaming-append cadence this is the difference between
    re-reading every footer per cycle and reading O(|new files|) — the
    same incremental-first contract as the rest of the engine (Delta
    gets it from txn-log deltas; this is the plain-parquet form).
    Falls back to a full build when no manifest exists yet. Retained
    rows keep their recorded stats verbatim, so refresh ∘ refresh ≡
    full rebuild (pinned in tests/test_layout.py).

    Concurrency contract (single maintenance writer, reader-retry):
    the rewrite is staged under DOT-PREFIXED hidden siblings and
    swapped by rename(live→aside); rename(staging→live) — so a
    concurrent reader can observe a brief manifest-absent window
    between the two renames and should simply retry (exactly the
    window Delta's `_last_checkpoint` pointer papers over; a plain
    directory store cannot replace a dir atomically). A crash inside
    the window is self-healing: on entry this function restores a
    stranded aside whose live path is absent and clears any stale
    staging/aside leftovers, so no state is lost and the gap never
    outlives one refresh cycle."""
    from metar_pipeline_spark.sources.merge import _hadoop_fs

    mfs, m_h, _ = _hadoop_fs(spark, manifest_path)
    root = manifest_path.rstrip("/")
    parent, name = root.rsplit("/", 1)
    staging = f"{parent}/.{name}.__staging__"
    aside = f"{parent}/.{name}.__old__"
    _, s_h, _ = _hadoop_fs(spark, staging)
    _, a_h, _ = _hadoop_fs(spark, aside)
    # Entry recovery: a crash between the two swap renames strands the
    # manifest in the aside with no live dir — restore it; any other
    # stale staging/aside is a dead leftover from a crashed attempt.
    if mfs.exists(a_h) and not mfs.exists(m_h):
        mfs.rename(a_h, m_h)
    mfs.delete(s_h, True)
    mfs.delete(a_h, True)
    current = _list_data_files(spark, table_path)
    if not mfs.exists(m_h):
        write_skipping_manifest(spark, table_path, cols, manifest_path)
        return len(current), 0
    old = spark.read.parquet(manifest_path)
    rows = old.select("file").collect()  # bounded-collect: manifest grain
    known = {r.file for r in rows}
    cur = set(current)
    new_files = sorted(cur - known)
    vanished = sorted(known - cur)
    if not new_files and not vanished:
        return 0, 0
    ddl = _manifest_schema(_table_schema(spark, table_path), cols)
    kept = old
    if vanished:
        kept = kept.filter(~F.col("file").isin(vanished))
    merged = kept
    if new_files:
        merged = kept.unionByName(
            _manifest_for_files(spark, new_files, cols, ddl)
        )
    merged.write.mode("overwrite").parquet(staging)
    mfs.rename(m_h, a_h)
    mfs.rename(s_h, m_h)
    mfs.delete(a_h, True)
    return len(new_files), len(vanished)


def pruned_files(
    spark, manifest_path: str, col: str, lo, hi
) -> "list[str]":
    """Files that MAY contain ``col`` values in [lo, hi]: keep unless
    the footer proves ``max < lo`` or ``min > hi``; files with missing
    stats are kept. Manifest-grain collect (one row per file, tagged
    bounded)."""
    m = spark.read.parquet(manifest_path)
    keep = ~(
        (F.col(f"{col}__max") < F.lit(lo))
        | (F.col(f"{col}__min") > F.lit(hi))
    )
    rows = (
        m.filter(keep | F.col(f"{col}__min").isNull())
        .select("file")
        .collect()  # bounded-collect: manifest grain (one row per file)
    )
    return [r.file for r in rows]


def skipping_scan(
    spark, table_path: str, manifest_path: str, col: str, lo, hi
) -> DataFrame:
    """``table.filter(lo <= col <= hi)`` that opens ONLY the files the
    manifest cannot exclude — the difference between touching 1% and
    100% of a 100 TB table for a range predicate on an UNPARTITIONED
    column (partition pruning's complement; footer row-group pruning
    still applies inside each kept file). Semantics are
    manifest-invariant: the row filter is applied regardless, so
    loose/missing STATS only cost I/O, never correctness.

    Staleness contract: the manifest is a FILE LIST, so any operation
    that changes the file set (``compaction.compact_parquet_dir``,
    ``merge.upsert_parquet`` rewrites) invalidates it — the next
    skipping_scan fails LOUDLY on the vanished paths (never silently
    returns a subset); rewrite the manifest after such maintenance
    (``write_skipping_manifest``), exactly as Delta/Iceberg commit new
    stats in the same transaction as the rewrite. Pinned in
    tests/test_layout.py."""
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    files = pruned_files(spark, manifest_path, col, lo, hi)
    if not files:
        # empty-but-schema-stable scan: read ONE listed data file (with
        # basePath, so hive partition columns survive) under an
        # always-false predicate — a plain root read would refuse
        # non-hive subdirectory layouts (streaming batch drops)
        all_files = _list_data_files(spark, table_path)
        if not all_files:
            return spark.read.parquet(table_path).filter(F.lit(False))
        return (
            spark.read.option("basePath", table_path)
            .parquet(all_files[0])
            .filter(F.lit(False))
        )
    # basePath keeps hive partition columns alive when the table is
    # partitioned and we hand Spark leaf files directly
    base = spark.read.option("basePath", table_path).parquet(*files)
    return base.filter(pred)


def pruned_files_multi(
    spark, manifest_path: str, preds: "dict[str, tuple]"
) -> "list[str]":
    """Conjunctive multi-column pruning: keep a file only if EVERY
    ``col: (lo, hi)`` predicate may match it (per-column exclusion is
    independent, so the keep-conditions AND together). Missing stats on
    a column keep the file for that column, as in :func:`pruned_files`.
    The Z-order layout is the natural producer: box predicates prune on
    both keys at once."""
    m = spark.read.parquet(manifest_path)
    cond = F.lit(True)
    for col, (lo, hi) in preds.items():
        keep = ~(
            (F.col(f"{col}__max") < F.lit(lo))
            | (F.col(f"{col}__min") > F.lit(hi))
        )
        cond = cond & (keep | F.col(f"{col}__min").isNull())
    rows = m.filter(cond).select("file").collect()  # bounded-collect: manifest grain
    return [r.file for r in rows]


def skipping_scan_multi(
    spark, table_path: str, manifest_path: str, preds: "dict[str, tuple]"
) -> DataFrame:
    """:func:`skipping_scan` for a conjunction of range predicates —
    the box-query form over a Z-ordered layout. Same manifest-invariant
    contract: every row predicate is applied regardless."""
    pred = F.lit(True)
    for col, (lo, hi) in preds.items():
        pred = pred & (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    files = pruned_files_multi(spark, manifest_path, preds)
    if not files:
        all_files = _list_data_files(spark, table_path)
        if not all_files:
            return spark.read.parquet(table_path).filter(F.lit(False))
        return (
            spark.read.option("basePath", table_path)
            .parquet(all_files[0])
            .filter(F.lit(False))
        )
    return (
        spark.read.option("basePath", table_path)
        .parquet(*files)
        .filter(pred)
    )
