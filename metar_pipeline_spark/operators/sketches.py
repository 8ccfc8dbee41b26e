"""Approximate sketches: HLL distinct and approximate quantiles.

At 100 TB, exact COUNT(DISTINCT) over a high-cardinality key is a full
shuffle of every distinct value; an HLL sketch is a fixed-size (KB)
mergeable summary that combines map-side, ships one sketch per
partition, and answers within ~1-2% — the standard trade for
cardinality dashboards, join-size estimation, and dedup ratio tracking.
Spark's hll_sketch_agg / hll_union_agg are Apache DataSketches HLL
(java-side, codegen-friendly); estimates are DETERMINISTIC for a given
input multiset and lgConfigK, but implementation-specific — so these
operators register as rows-only queries (no cross-engine oracle), with
calibration asserted against exact counts in the pytest suite instead.

The mergeability contract is the scale property: sketch(shard_1) ∪ … ∪
sketch(shard_n) == sketch(whole). partial_then_union() exercises
exactly that shape — it is what lets a 1000-executor cluster compute
global cardinality with one KB-sized row per executor instead of a
distinct-shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_estimate(value: Column, lgk: int = 12) -> Column:
    """HLL distinct-count estimate aggregate (~1.6% rse at lgk=12)."""
    return F.hll_sketch_estimate(F.hll_sketch_agg(value, F.lit(lgk)))


def approx_distinct_by(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HLL estimate next to the exact distinct count.

    The exact column exists for calibration/monitoring (and IS the
    expensive path being replaced); production dashboards at 100 TB
    would drop it and keep only the sketch.
    """
    return df.groupBy(*keys).agg(
        F.count_distinct(F.col(value_col)).alias("n_exact"),
        hll_estimate(F.col(value_col), lgk).alias("n_hll"),
    )


def partial_then_union(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    shard_col: Column,
    lgk: int = 12,
) -> DataFrame:
    """Two-level sketch: per-(key, shard) partial sketches, then
    hll_union_agg to the key level — the mergeable-summary shape a
    cluster uses (one partial per executor/partition, KB-sized shuffle).
    Estimates are identical to the single-pass sketch (HLL union is
    lossless at equal lgConfigK)."""
    partial = df.withColumn("__shard", shard_col).groupBy(
        *keys, "__shard"
    ).agg(F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("__sk"))
    return partial.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("__sk"), F.lit(True))
        ).alias("n_hll")
    )


def approx_quantiles_by(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probs: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna): mergeable,
    bounded-memory — rank error ≤ 1/accuracy, vs an exact percentile's
    full sort. One output column per requested quantile."""
    aggs = [
        F.percentile_approx(
            F.col(value_col), F.lit(p), F.lit(accuracy)
        ).alias(f"q{str(p).replace('0.', '')}")
        for p in probs
    ]
    return df.groupBy(*keys).agg(*aggs)


def top_k_frequent(
    df: DataFrame,
    item_col: Column,
    k: int,
    max_items_tracked: int = 10000,
) -> DataFrame:
    """Heavy hitters via the approx_top_k frequent-items sketch.

    The sketch tracks at most ``max_items_tracked`` counters per
    partition and merges map-side — bounded memory regardless of item
    cardinality, vs the exact top-k's full (item → count) shuffle. When
    the true cardinality fits inside the tracked budget the counts are
    EXACT (that is the regime the oracle checks); above it they are
    upper-bound estimates within the sketch's guarantee.

    Output: (item, est_count, rank) — re-ranked with an item tiebreak
    so the result has a total order.
    """
    from metar_pipeline_spark.operators.ranking import rank_bounded

    # over-fetch from the sketch, then cut deterministically: ties at
    # the boundary are resolved by (count desc, item asc), which the
    # sketch's own internal order does not promise. The exploded sketch
    # is ≤fetch rows — rank_bounded orders it window-free.
    fetch = max(4 * k, 64)
    sk = df.select(item_col.alias("__item")).agg(
        F.expr(
            f"approx_top_k(__item, {fetch}, {max_items_tracked})"
        ).alias("tk")
    )
    flat = sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"),
        F.col("e.count").alias("est_count"),
    )
    return rank_bounded(
        flat, [-F.col("est_count"), F.col("item")], n=k
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (round 10): a DETERMINISTIC mergeable frequency
# sketch — unlike the DataSketches HLL aggregates above, the hash rows
# are fixed engine-portable integer arithmetic, so a SQL oracle can
# replay every cell and the gate verifies it on all four axes.
# ---------------------------------------------------------------------------

# (a, b) per hash row: ((key*a + b) mod P) mod width, P = 2^31 - 1.
# Exact on any engine while key*a stays inside int64 — i.e. keys up to
# ~2^32 with these multipliers; fold larger ids down first with the
# overflow-safe curation.hash_unit_01 pattern (16-bit-halves multiply).
_CMS_P = 2147483647
_CMS_ROWS = ((998244353, 12289), (1000000007, 257), (69061, 65537), (40503, 97))


def cms_bucket(key: Column, row_i: int, width: int) -> Column:
    a, b = _CMS_ROWS[row_i]
    return F.pmod(
        F.pmod(key.cast("bigint") * F.lit(a) + F.lit(b), F.lit(_CMS_P)),
        F.lit(width),
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch cells ``(row, bucket, c)`` — d×w bounded size
    (4 KB of counters at the defaults) regardless of key cardinality.

    One narrow explode (the per-row bucket pairs; the exploded row
    carries two ints, so explode-first is the codegen-friendly shape)
    + one cell-grain hash aggregate with map-side partials. Sketches
    are MERGEABLE by cell-wise add (:func:`cms_merge`): partials built
    per shard/executor/day combine losslessly — the 100 TB shape is
    one 4 KB sketch per partition shipped to a d×w-cell reduce.

    Estimates (:func:`cms_estimate`) never undercount: est(k) =
    min_rows(cell) ≥ true(k), with overcount ≤ e/width · N at
    probability 1 − e^−depth for random hashes (pinned observationally
    for the fixed rows in tests/test_operators.py).
    """
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_bucket(F.col(key_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("rb"))
        .groupBy(
            F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise add — sketch(A ⊎ B) == merge(sketch(A), sketch(B))
    exactly (integer SUM is associative-commutative)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("c").cast("bigint").alias("c")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``keys``: est = MIN over the d
    matching cells. The sketch is d×w cells — broadcast — so the probe
    is a broadcast equi-join + key-grain MIN, never a shuffle of the
    keyed data."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_bucket(F.col(key_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probes = keys.select(
        F.col(key_col), F.explode(pairs).alias("rb")
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# Flajolet-Martin m-mins distinct estimator (round 10): like the CMS
# above, a DETERMINISTIC engine-portable estimator — the oracle-
# verified sibling of the rows-only DataSketches HLL queries.
# ---------------------------------------------------------------------------

def fm_constants(row_i: int) -> tuple:
    """(a1, b1, a2) for hash row ``row_i`` — a1/a2 forced ≥ 2²⁸ so the
    affine round wraps P even for tiny keys (a plain small-a affine
    map leaves consecutive ids UNMIXED below the modulus — measured
    estimates off by 100× before the quadratic round was added)."""
    a1 = ((2654435761 * (row_i + 1)) % (_CMS_P - (1 << 28))) + (1 << 28)
    b1 = (2246822519 * (row_i + 1)) % _CMS_P
    a2 = ((40503 * (row_i + 1) + 69061) % (_CMS_P - (1 << 28))) + (1 << 28)
    return a1, b1, a2


def fm_hash01(key: Column, row_i: int) -> Column:
    """Uniform (0,1) hash, row ``row_i``: an affine mod-P round then a
    QUADRATIC round (h² + h·a₂ mod P — avalanche for small ids), one
    final division. Exact int64 arithmetic throughout (key < 2³² keeps
    every intermediate < 2⁶³ — same bound as the CMS rows), identical
    on every engine."""
    a1, b1, a2 = fm_constants(row_i)
    h1 = F.pmod(
        key.cast("bigint") * F.lit(a1) + F.lit(b1), F.lit(_CMS_P)
    )
    h = F.pmod(h1 * h1 + h1 * F.lit(a2), F.lit(_CMS_P))
    return h.cast("double") / F.lit(float(_CMS_P))


def fm_hash01_sql(key_sql: str, row_i: int) -> str:
    """SQL-text twin of :func:`fm_hash01` — the identical expression
    tree built as ONE parser call instead of ~16 py4j round-trips.

    Why (round 13, guide §1.2 fixed costs): every PySpark Column
    operation is a py4j round-trip (~1-3 ms); a 64-row sketch built
    operator-by-operator spends 2-3 s of DRIVER time just constructing
    the query (measured: fm_distinct_users_by_type 2.44 s construct vs
    0.95 s execute, warm). The parsed tree is the same expression
    Catalyst saw before — constants, operand order, and casts match
    :func:`fm_hash01` exactly, so results are bit-identical."""
    a1, b1, a2 = fm_constants(row_i)
    h1 = f"pmod(CAST({key_sql} AS BIGINT) * {a1} + {b1}, {_CMS_P})"
    h = f"pmod({h1} * {h1} + {h1} * {a2}, {_CMS_P})"
    return f"CAST({h} AS DOUBLE) / CAST({_CMS_P} AS DOUBLE)"


def fm_min_exprs(key_sql: str, m: int = 64) -> list:
    """String-built twin of :func:`fm_min_columns` (one F.expr per
    aggregate — see fm_hash01_sql for why). Same column names, same
    arithmetic, same map-side-combinable MIN shape."""
    return [
        F.expr(f"min({fm_hash01_sql(key_sql, i)}) AS __fm{i}")
        for i in range(m)
    ]


def fm_estimate_expr(m: int = 64) -> Column:
    """String-built twin of :func:`fm_estimate`: the identical fixed
    left-assoc chain, one parser call instead of m py4j round-trips."""
    s = "__fm0"
    for i in range(1, m):
        s = f"({s} + __fm{i})"
    return F.expr(
        f"CAST({m} AS DOUBLE) / {s} - CAST(1 AS DOUBLE)"
    )


def fm_min_columns(key: Column, m: int = 64) -> list:
    """The m MIN aggregate expressions: E[min of n uniforms] =
    1/(n+1), so n̂ = m/Σminᵢ − 1 with relative error ~1/√m. All m
    mins ride ONE scan as map-side-combinable aggregates — zero
    shuffle beyond the 1-row final agg, trivially mergeable (the
    merge of two shards' mins IS the same MIN)."""
    return [F.min(fm_hash01(key, i)).alias(f"__fm{i}") for i in range(m)]


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """Deterministic Bloom filter over a key column — the MEMBERSHIP
    member of the oracle-verified sketch family (frequency: CMS,
    distinct: FM, quantiles: KMV, membership: this). The classic use
    at 100 TB: an m-bit summary of a huge key set (users who
    purchased, doc ids already ingested) that any executor can probe
    broadcast-locally — no false negatives, false-positive rate
    ≈ (1 − e^{−kn/m})^k.

    Hash rows are the CMS fixed integer rows ((key·a+b) mod 2³¹−1 mod
    m — engine-portable, so a SQL oracle replays every bit), positions
    pack into 32-bit words (bit 31 stays positive in an int64 on every
    engine; 64-bit words would hit sign/overflow divergence at bit
    63). Build = one narrow explode + a word-grain BIT_OR with
    map-side partials; output (word, bits) rows, ≤ m/32 of them —
    mergeable by word-wise OR, exactly like cms_merge's cell-wise add.
    """
    pos = [
        cms_bucket(F.col(key_col), i, m_bits) for i in range(k_hashes)
    ]
    pairs = F.array(
        *[
            F.struct(
                (p / 32).cast("long").alias("word"),
                # 2^bit as exact integer (bit ≤ 31, so the double
                # pow is exact); F.shiftleft needs a literal bit count
                F.pow(F.lit(2.0), F.pmod(p, F.lit(32)))
                .cast("long")
                .alias("bitval"),
            )
            for p in pos
        ]
    )
    return (
        df.select(F.explode(pairs).alias("wb"))
        .groupBy(F.col("wb.word").alias("word"))
        .agg(F.bit_or(F.col("wb.bitval")).alias("bits"))
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Word-wise OR — bloom(A ∪ B) == merge(bloom(A), bloom(B))
    exactly (BIT_OR is associative-commutative-idempotent), the same
    shard-partials shape as cms_merge."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 8192,
    k_hashes: int = 4,
) -> DataFrame:
    """(key, est_member): a key is flagged iff ALL k of its bits are
    set. The sketch is ≤ m/32 rows — broadcast — so the probe is a
    broadcast equi-join on the word index + a key-grain BOOL_AND;
    a word absent from the sketch means those bits are 0 (left join,
    null → false). No false negatives by construction."""
    pos = [
        cms_bucket(F.col(key_col), i, m_bits) for i in range(k_hashes)
    ]
    pairs = F.array(
        *[
            F.struct(
                (p / 32).cast("long").alias("word"),
                # 2^bit as exact integer (bit ≤ 31, so the double
                # pow is exact); F.shiftleft needs a literal bit count
                F.pow(F.lit(2.0), F.pmod(p, F.lit(32)))
                .cast("long")
                .alias("bitval"),
            )
            for p in pos
        ]
    )
    probes = keys.select(F.col(key_col), F.explode(pairs).alias("wb")).select(
        key_col,
        F.col("wb.word").alias("word"),
        F.col("wb.bitval").alias("bitval"),
    )
    return (
        probes.join(F.broadcast(sketch), "word", "left")
        .select(
            key_col,
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                    F.col("bitval")
                )
                != 0
            ).alias("__hit"),
        )
        .groupBy(key_col)
        .agg(F.bool_and("__hit").alias("est_member"))
    )


def kmv_quantile_sketch(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    id_col: str,
    k: int = 256,
    hash_row: int = 0,
) -> DataFrame:
    """Bottom-k (KMV) quantile sketch per group: the ``k`` rows whose
    deterministic :func:`fm_hash01`(id) is smallest — a bounded,
    MERGEABLE, engine-portable quantile summary, completing the
    oracle-verified sketch family (frequency: CMS, distinct: FM,
    quantiles: this).

    Why this shape: Greenwald-Khanna / t-digest summaries are
    implementation-defined (compaction schedules), so their outputs
    can never hash-match a second engine. Bottom-k by a FIXED integer
    hash is a deterministic function of the input SET — the sketch
    CELLS themselves replay exactly in SQL (the CMS/FM recipe), and
    the k kept rows are a uniform random sample of the rows, so exact
    order statistics over the sample estimate quantiles with rank
    error ~1/√k (Bar-Yossef et al. 2002 for KMV; sampling-based
    quantile bounds are classical).

    Mergeability: bottom-k(A ⊎ B) == bottom-k(bottom-k(A) ∪
    bottom-k(B)) — shard partials, union, re-truncate
    (:func:`kmv_merge`); one k-row summary per shard crosses the
    wire, never the data.

    Scale shape: the per-group selection runs through
    ``ranking.grouped_topk`` (salted two-level rank) — a handful of
    literal group keys never pulls a corpus-sized group into one
    task. Output: ``group_cols`` + (``__u`` hash, ``id_col``,
    ``value_col``) rows, ≤ k per group.
    """
    from metar_pipeline_spark.operators.ranking import grouped_topk

    hashed = df.select(
        *group_cols,
        F.col(id_col),
        F.col(value_col),
        fm_hash01(F.col(id_col), hash_row).alias("__u"),
    )
    return grouped_topk(
        hashed,
        list(group_cols),
        [F.asc("__u"), F.asc(id_col)],
        k,
        salt=F.pmod(F.col(id_col), F.lit(32)),
    ).drop("rank")


def kmv_merge(
    sketches: "list[DataFrame]",
    group_cols: list,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """Merge KMV partials: union, re-select the k smallest hashes per
    group. Exactly the whole-data sketch (bottom-k is a semilattice)."""
    from metar_pipeline_spark.operators.ranking import grouped_topk

    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return grouped_topk(
        out,
        list(group_cols),
        [F.asc("__u"), F.asc(id_col)],
        k,
        salt=F.pmod(F.col(id_col), F.lit(32)),
    ).drop("rank")


def kmv_quantile_estimate(
    sketch: DataFrame,
    group_cols: list,
    value_col: str,
    id_col: str,
    pcts: "list[int]",
) -> DataFrame:
    """Exact order statistics over the bounded sample: est(p%) = the
    ⌈n·p/100⌉-th smallest sampled value (1-based, (value, id) total
    order). The rank is computed in INTEGER arithmetic
    (floor((n·p + 99) / 100) — the engine-portable ceil-div), never a
    float ceil near a boundary.

    Window-free by construction: each group's sample is ≤ k rows, so
    a collect_list → array_sort → element_at projection does the
    ranking inside one hash aggregate — no single-task corpus sort,
    no WindowExec at all."""
    g = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.array_sort(
            F.collect_list(F.struct(F.col(value_col), F.col(id_col)))
        ).alias("__vs"),
    )
    sel = [*[F.col(c) for c in group_cols], F.col("n_sample")]
    for p in pcts:
        # integer division end-to-end (round-11 ADVICE: the previous
        # floor(x / 100) went through Spark's double division — exact
        # at n<=k=256 but off-contract with the doc; DIV keeps the
        # whole rank computation in int64 for any k)
        rank = F.expr(f"(n_sample * {int(p)} + 99) DIV 100").cast("int")
        sel.append(
            F.element_at(F.col("__vs"), rank)[value_col].alias(f"p{p}")
        )
    return g.select(*sel)


def fm_estimate(m: int = 64) -> Column:
    """n̂ from the aggregated min columns — the sum is a FIXED
    left-assoc chain in row order, deterministic on every engine."""
    s = F.col("__fm0")
    for i in range(1, m):
        s = s + F.col(f"__fm{i}")
    return F.lit(float(m)) / s - F.lit(1.0)
