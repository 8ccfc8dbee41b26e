"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring production ANN practice:

- Brute-force cosine top-k: the correctness baseline. The dot product is
  a single codegen'd ``aggregate(zip_with(...))`` fold — JVM-side, no
  Python, no explode. Used broadcast-style: the (tiny) query vector set
  is broadcast against the corpus scan, so the plan is one pass over the
  corpus with no shuffle besides the final top-k.
- Sign-LSH bucketed search: the scale path. Each vector gets a b-bit
  bucket from the signs of its leading components (a deterministic
  random-hyperplane sketch with axis-aligned planes); search probes only
  the query's bucket. At 100 TB the corpus would be written
  ``partitionBy(bucket)`` so a probe is a partition-pruned scan.

Determinism: all float folds are sequential left-to-right in array
order, identical across engines; cosine is rounded at the boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.ranking import grouped_topk


def _as_double(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + _as_double(x) * _as_double(x)
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def centroid_argmax(
    rows: DataFrame,
    cents: DataFrame,
    vec_col: str,
    *,
    norm_col: str | None = None,
    score_col: str | None = None,
) -> DataFrame:
    """ZERO-EXCHANGE nearest-centroid assignment: adds ``cid`` (and
    optionally ``score_col``, the rounded cosine to the winner) to
    ``rows`` as a pure per-row PROJECTION.

    The tiny centroid set (``cid``, ``centvec``[, ``centnorm``]) is
    packed into ONE row (``collect_list`` aggregate — the only exchange
    in the plan, over k rows) and broadcast; each corpus row then scores
    all k centroids with a codegen'd ``transform`` and picks the winner
    with ``array_max`` over ``struct(score, -cid)`` — exactly the
    (score DESC, cid ASC) tie rule of the ``groupBy(id)``/``max_by``
    formulation this replaces, which exchanged the corpus at FULL WIDTH
    (one row per vector carrying the embedding). Here the corpus never
    moves: scan → broadcast-append centroid array → project. Every IVF
    build, SemDeDup pass, and k-means iteration sits on this path, so
    the exchange it saves is corpus-sized × iterations.

    ``norm_col``: a precomputed row-norm column (computed once here
    otherwise — never inside the per-centroid lambda, which would
    re-evaluate it k times per row).
    """
    if "centnorm" not in cents.columns:
        cents = cents.withColumn("centnorm", norm2(F.col("centvec")))
    packed = cents.select(
        F.struct("cid", "centvec", "centnorm").alias("__c")
    ).agg(F.collect_list("__c").alias("__cents"))
    vnorm = (
        F.col(norm_col) if norm_col is not None else norm2(F.col(vec_col))
    )
    out = rows.crossJoin(F.broadcast(packed)).withColumn("__vn", vnorm)
    scored = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            F.round(
                dot(F.col(vec_col), c["centvec"])
                / (F.col("__vn") * c["centnorm"]),
                6,
            ).alias("s"),
            (-c["cid"]).alias("__nc"),
            c["cid"].alias("cid"),
        ),
    )
    out = out.withColumn("__best", F.array_max(scored))
    # cid is NON-NULL by construction (−1 iff the centroid set is
    # empty, which no caller produces): downstream equi-joins on cid
    # then cannot infer an isnotnull(cid) filter — which Catalyst would
    # inline as isnotnull(array_max(transform(...))), silently
    # DUPLICATING the whole per-row argmax into the join condition
    # (measured 2× the corpus pass before this guard).
    result = out.withColumn(
        "cid", F.coalesce(F.col("__best.cid"), F.lit(-1))
    )
    if score_col is not None:
        result = result.withColumn(score_col, F.col("__best.s"))
    return result.drop("__vn", "__cents", "__best")


def sign_bucket(vec: Column, bits: int) -> Column:
    """b-bit bucket key from the signs of vec[0..b-1] (axis-aligned
    hyperplane LSH). Bit i set ⇔ vec[i] >= 0."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(
            F.element_at(vec, i + 1) >= 0, F.lit(1 << i)
        ).otherwise(0)
    return out


def brute_force_topk(
    corpus: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (broadcast queries).

    Norms are precomputed once per vector on each side (a projection
    over n rows), so the n×q scoring loop does only the dot-product
    fold — not three folds per pair.

    Output: (query_id, id, cos_sim, rank) — rank has a total order
    (cos desc, id asc)."""
    q = query.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm2(F.col(vec_col)).alias("qnorm"),
    )
    # fan_out (round 13, guide §2.5): the n×q scoring loop runs in the
    # corpus side's map stage (queries broadcast); a single-file scan
    # is ONE partition/one core. Per-row work ⇒ partitioning-invariant.
    from metar_pipeline_spark.operators.fanout import fan_out

    c = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cvec"),
        norm2(F.col(vec_col)).alias("cnorm"),
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("id")
    ).select(
        "query_id",
        "id",
        F.round(
            dot(F.col("cvec"), F.col("qvec"))
            / (F.col("cnorm") * F.col("qnorm")),
            6,
        ).alias("cos_sim"),
    )
    # two-level exact top-k: the naive Window.partitionBy("query_id")
    # would sort each query's ENTIRE scored frame in one task (the
    # bounded-literal-key scale-killer) — grouped_topk salts level 1
    return grouped_topk(
        scored, ["query_id"], [F.desc("cos_sim"), F.asc("id")], k,
        salt=F.pmod(F.col("id"), F.lit(32)),
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int,
    bits: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only the query's sign-LSH bucket.

    Same output shape as brute_force_topk; recall < 1 by design. The
    bucket equi-join prunes the corpus scan to ~1/2^bits of the data
    (partition pruning when the corpus is bucket-partitioned on disk).
    """
    cb = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cvec"),
        norm2(F.col(vec_col)).alias("cnorm"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    q = query.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm2(F.col(vec_col)).alias("qnorm"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        cb.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            "id",
            F.round(
                dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    # two-level exact top-k: the naive Window.partitionBy("query_id")
    # would sort each query's ENTIRE scored frame in one task (the
    # bounded-literal-key scale-killer) — grouped_topk salts level 1
    return grouped_topk(
        scored, ["query_id"], [F.desc("cos_sim"), F.asc("id")], k,
        salt=F.pmod(F.col("id"), F.lit(32)),
    )


def ivf_assignments(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    centroid_source: DataFrame | None = None,
    keep_cscore: bool = False,
) -> DataFrame:
    """The IVF INDEX: (id, cid, cvec, cnorm) — each corpus vector's
    nearest deterministic centroid plus its precomputed norm. Build
    once, persist ``partitionBy("cid")`` (the inverted lists), and
    every probe becomes a partition-pruned read of the probed cells —
    the corpus is never rescanned or re-assigned per query batch.

    ``centroid_source``: frame the centroids are taken from (ids <
    ``n_centroids``); defaults to ``corpus`` itself. Pass the BASE
    corpus when assigning an incremental batch, so new vectors join the
    EXISTING quantizer's cells and the batch can be appended to the
    partitioned store without touching (or re-reading) the base lists —
    index maintenance is then O(batch), never O(corpus).

    ``keep_cscore``: also emit ``cscore`` (rounded cosine to the
    winning centroid) — SemDeDup's keep-order key."""
    cents = (centroid_source if centroid_source is not None else corpus
             ).filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("centvec"),
        norm2(F.col(vec_col)).alias("centnorm"),
    )
    # fan_out (round 13, guide §2.5): the per-vector × n_centroids
    # argmax scoring is the heavy map side; over a single-file scan it
    # ran on ONE core (measured 2.2 s single-task stage in
    # semantic_dedup_cells at sf0.1). Per-row projection ⇒
    # partitioning-invariant; no-op on multi-split scans.
    from metar_pipeline_spark.operators.fanout import fan_out

    c = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("cvec"),
        norm2(F.col(vec_col)).alias("cnorm"),
    )
    # assignment is a zero-exchange projection (centroid_argmax): the
    # corpus is scanned once and never shuffled — the old
    # groupBy(id)/max_by form exchanged one full-width row per vector
    assigned = centroid_argmax(
        c, cents, "cvec", norm_col="cnorm",
        score_col="cscore" if keep_cscore else None,
    )
    carried = ["cid", "cscore", "cvec", "cnorm"] if keep_cscore else [
        "cid", "cvec", "cnorm"
    ]
    return assigned.select("id", *carried)


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int,
    n_centroids: int,
    nprobe: int,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    into ``n_centroids`` cells, probe the ``nprobe`` nearest cells per
    query.

    Centroids are the corpus vectors with id < n_centroids — a
    deterministic coarse quantizer (k-means init without iterations), so
    the oracle can reproduce the exact same cells. Structure:

    1. assignment: per-vector argmax cosine against the broadcast
       centroid array — a zero-exchange projection (centroid_argmax);
       the corpus is scanned once and never shuffled;
    2. the inverted lists are the assignment keyed by cell — at 100 TB
       the corpus is written ``partitionBy(cell)`` so a probe is a
       partition-pruned scan (same layout contract as sign-LSH);
    3. probe: each query ranks cells by centroid cosine, takes
       ``nprobe``; candidates = inverted lists of probed cells only;
    4. exact scoring + per-query top-k on the candidates.

    Output: (query_id, id, cos_sim, rank) — same shape as
    brute_force_topk; recall < 1 by design (quantization misses).
    """
    from pyspark.sql import Window

    cents = corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("centvec"),
        norm2(F.col(vec_col)).alias("centnorm"),
    )
    # rounded cosine so argmax ties resolve identically across engines
    def _cell_score(vec, nrm):
        return F.round(
            dot(vec, F.col("centvec")) / (nrm * F.col("centnorm")), 6
        )

    assigned = (
        assignments
        if assignments is not None
        else ivf_assignments(corpus, id_col, vec_col, n_centroids)
    )
    q = query.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm2(F.col(vec_col)).alias("qnorm"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("qscore"), F.asc("cid")
    )
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "query_id",
            "qvec",
            "qnorm",
            "cid",
            _cell_score(F.col("qvec"), F.col("qnorm")).alias("qscore"),
        )
        .withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "qvec", "qnorm", "cid")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            "id",
            F.round(
                dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    # two-level exact top-k: the naive Window.partitionBy("query_id")
    # would sort each query's ENTIRE scored frame in one task (the
    # bounded-literal-key scale-killer) — grouped_topk salts level 1
    return grouped_topk(
        scored, ["query_id"], [F.desc("cos_sim"), F.asc("id")], k,
        salt=F.pmod(F.col("id"), F.lit(32)),
    )


def semdedup_verdicts(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    threshold: float,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication inside coarse-quantizer cells.

    1. assign every vector to its nearest deterministic centroid
       (corpus ids < ``n_centroids`` — same coarse quantizer as
       ``ivf_assignments``, so the oracle replays it exactly), keeping
       the centroid cosine ``csim``;
    2. within each cell, a vector is DROPPED iff some other vector of
       the same cell has cosine ≥ ``threshold`` with it AND precedes it
       in keep order. Keep order is (csim ASC, id ASC): the paper keeps
       the example FARTHEST from the centroid of each near-dup
       neighborhood (preserves diversity; near-centroid copies are the
       redundant ones). No transitive closure needed — the rule is a
       per-vector EXISTS, deterministic under the rounded csim + id
       tiebreak.

    Scale shape: candidate pairs are generated per cell only (the
    IVF-style blocking every ANN path here uses) — Σ|cell|² work, never
    corpus²; at 100 TB raise ``n_centroids`` so cells stay bounded and
    persist the assignment ``partitionBy(cid)`` like the IVF stores.
    Output: (id, cid, csim, is_kept) — one row per corpus vector.
    """
    # The coarse quantizer IS ivf_assignments (keep_cscore exposes the
    # keep-order key); localCheckpoint the assignment because three
    # consumers read it (a-side, b-side, final verdict join) — without
    # it the zero-exchange projection re-scans the corpus and re-scores
    # every centroid per consumer on every action.
    assigned = (
        ivf_assignments(
            corpus, id_col, vec_col, n_centroids, keep_cscore=True
        )
        .select(
            "id",
            "cid",
            F.col("cscore").alias("csim"),
            F.col("cvec").alias("vec"),
            F.col("cnorm").alias("vnorm"),
        )
        .localCheckpoint(eager=True)
    )
    a = assigned.select(
        "cid",
        F.col("id").alias("id_a"),
        F.col("csim").alias("csim_a"),
        F.col("vec").alias("vec_a"),
        F.col("vnorm").alias("norm_a"),
    )
    b = assigned.select(
        "cid",
        F.col("id").alias("id_b"),
        F.col("csim").alias("csim_b"),
        F.col("vec").alias("vec_b"),
        F.col("vnorm").alias("norm_b"),
    )
    pair_cos = F.round(
        dot(F.col("vec_a"), F.col("vec_b"))
        / (F.col("norm_a") * F.col("norm_b")),
        6,
    )
    dropped = (
        a.join(b, "cid")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(
            (F.col("csim_a") < F.col("csim_b"))
            | (
                (F.col("csim_a") == F.col("csim_b"))
                & (F.col("id_a") < F.col("id_b"))
            )
        )
        .filter(pair_cos >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        assigned.join(dropped, "id", "left")
        .select(
            "id", "cid", "csim", F.col("_dropped").isNull().alias("is_kept")
        )
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    partition_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs with cosine ≥ threshold, candidate-limited to equal
    ``partition_col`` (coarse IVF-style blocking — at scale this is the
    inverted-list pruning; a full cross join is never materialized)."""
    from metar_pipeline_spark.operators.fanout import fan_out

    # fan_out on the probe side: with a broadcast build side the pair
    # dot-product work runs in THIS side's map stage, which over a
    # single-file scan is ONE partition/one core (measured round 13:
    # 2.5 s single-task stage in neardup_triangle_census). Conditional
    # floor; no-op on multi-split scans.
    a = fan_out(df.select(partition_col, id_col, vec_col)).select(
        F.col(partition_col).alias("part"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        norm2(F.col(vec_col)).alias("norm_a"),
    )
    b = df.select(
        F.col(partition_col).alias("part"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        norm2(F.col(vec_col)).alias("norm_b"),
    )
    pairs = a.join(b, "part").filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(
            dot(F.col("vec_a"), F.col("vec_b"))
            / (F.col("norm_a") * F.col("norm_b")),
            6,
        ).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def quantize_codes(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, codes array<int>, scale double): the int8 codes themselves
    (not just the audit stats — see quantize_embeddings_int8 for those).
    ``scale`` is kept as the UNROUNDED double max|x|/127 so that any
    engine reconstructing ``code * scale`` lands on the identical IEEE
    value."""
    x = F.col(vec_col)
    maxabs = F.aggregate(
        x, F.lit(0.0), lambda a, v: F.greatest(a, F.abs(v.cast("double")))
    )
    d = df.select(F.col(id_col).alias("id"), x.alias("_v"), maxabs.alias("_m"))
    scale = F.col("_m") / F.lit(127.0)
    codes = F.transform(
        F.col("_v"),
        lambda v: F.when(F.col("_m") == 0.0, F.lit(0)).otherwise(
            F.floor(v.cast("double") / scale + F.lit(0.5)).cast("int")
        ),
    )
    return d.select("id", codes.alias("codes"), scale.alias("scale"))


def reconstructed(codes: Column, scale: Column) -> Column:
    """Dequantize: x̂_i = code_i * scale (double array)."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def ivf_quantized_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
) -> DataFrame:
    """The 4×-compressed serving index: (id, cid, codes, scale) — each
    corpus vector stored as int8 codes + one scale, assigned to its
    nearest centroid measured on the RECONSTRUCTED vectors (so the
    assignment is consistent with what a probe scores against).
    Persist ``partitionBy("cid")``; probes then read only the probed
    cells' partitions. At 100 TB also persist the tiny centroid slice
    (id < n_centroids) as a sidecar so probes never touch the big store
    to rank cells — ivf_quantized_topk accepts it as ``centroids``."""
    qc = quantize_codes(corpus, id_col, vec_col)
    rv = reconstructed(F.col("codes"), F.col("scale"))
    rec = qc.select(
        "id", "codes", "scale", rv.alias("_rv"), norm2(rv).alias("_rn")
    )
    cents = rec.filter(F.col("id") < n_centroids).select(
        F.col("id").alias("cid"),
        F.col("_rv").alias("centvec"),
        F.col("_rn").alias("centnorm"),
    )
    # zero-exchange assignment on the reconstructed vectors (see
    # centroid_argmax): scan → broadcast → project, no corpus shuffle
    return centroid_argmax(rec, cents, "_rv", norm_col="_rn").select(
        "id", "cid", "codes", "scale"
    )


def ivf_quantized_topk(
    index: DataFrame,
    query: DataFrame,
    query_id_col: str,
    vec_col: str,
    k: int,
    n_centroids: int,
    nprobe: int,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Probe the quantized IVF store: full-precision queries scored
    against int8-reconstructed corpus vectors (asymmetric distance
    computation — the standard serving trade: 4× less store memory,
    queries keep their precision).

    ``index`` is (id, cid, codes, scale), e.g. the partitionBy("cid")
    store read back; ``centroids`` the tiny (id, codes, scale) sidecar
    (defaults to filtering the store — fine locally, but at scale pass
    the sidecar so cell ranking never scans the big store). The cid
    equi-join is what partition pruning rides on.

    Output: (query_id, id, cos_sim, rank) — same shape as
    brute_force_topk; recall < 1 by design (quantization + cell misses).
    """
    from pyspark.sql import Window

    cent_src = centroids if centroids is not None else index
    crv = reconstructed(F.col("codes"), F.col("scale"))
    cents = cent_src.filter(F.col("id") < n_centroids).select(
        F.col("id").alias("cid2"),
        crv.alias("centvec"),
        norm2(crv).alias("centnorm"),
    )
    q = query.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm2(F.col(vec_col)).alias("qnorm"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qscore"), F.asc("cid"))
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "query_id",
            "qvec",
            "qnorm",
            F.col("cid2").alias("cid"),
            F.round(
                dot(F.col("qvec"), F.col("centvec"))
                / (F.col("qnorm") * F.col("centnorm")),
                6,
            ).alias("qscore"),
        )
        .withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "qvec", "qnorm", "cid")
    )
    rv = reconstructed(F.col("codes"), F.col("scale"))
    inv = index.select(
        "id", "cid", rv.alias("cvec"), norm2(rv).alias("cnorm")
    )
    scored = (
        inv.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            "id",
            F.round(
                dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    # two-level exact top-k: the naive Window.partitionBy("query_id")
    # would sort each query's ENTIRE scored frame in one task (the
    # bounded-literal-key scale-killer) — grouped_topk salts level 1
    return grouped_topk(
        scored, ["query_id"], [F.desc("cos_sim"), F.asc("id")], k,
        salt=F.pmod(F.col("id"), F.lit(32)),
    )


def quantize_embeddings_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4× memory
    reduction for an embedding store (float32 → int8 + one scale per
    vector), as pure column math riding the scan.

    q_i = floor(127 * x_i / max|x| + 0.5) (explicit half-up so every
    engine rounds identically), reconstruction x̂_i = q_i * max|x| / 127.
    Output keeps the quantized codes plus the audit stats a pipeline
    gates on: reconstruction max-abs error, MSE (sequential fold —
    order-deterministic), and the integer code checksum (exact).
    """
    x = F.col(vec_col)
    maxabs = F.aggregate(
        x, F.lit(0.0), lambda a, v: F.greatest(a, F.abs(v.cast("double")))
    )
    d = df.select(
        F.col(id_col),
        x.alias("_v"),
        maxabs.alias("_m"),
        F.size(x).alias("dim"),
    )
    scale = F.col("_m") / F.lit(127.0)
    q = F.transform(
        F.col("_v"),
        lambda v: F.when(F.col("_m") == 0.0, F.lit(0)).otherwise(
            F.floor(v.cast("double") / scale + F.lit(0.5)).cast("int")
        ),
    )
    d = d.select(
        id_col,
        "dim",
        F.round(scale, 9).alias("scale"),
        q.alias("_q"),
        "_v",
        "_m",
    )
    recon_err = F.zip_with(
        F.col("_v"),
        F.col("_q"),
        lambda v, qq: v.cast("double") - qq * (F.col("_m") / F.lit(127.0)),
    )
    return d.select(
        id_col,
        "dim",
        "scale",
        F.aggregate(
            F.col("_q"), F.lit(0).cast("bigint"), lambda a, v: a + v
        ).alias("code_checksum"),
        F.round(
            F.aggregate(
                recon_err, F.lit(0.0), lambda a, e: F.greatest(a, F.abs(e))
            ),
            6,
        ).alias("max_abs_err"),
        F.round(
            F.aggregate(recon_err, F.lit(0.0), lambda a, e: a + e * e)
            / F.greatest(F.col("dim"), F.lit(1)),
            9,
        ).alias("mse"),
    )


def kmeans_refine(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    iters: int,
    init_centroids: "DataFrame | None" = None,
) -> DataFrame:
    """Lloyd's k-means refinement of the IVF coarse quantizer, as pure
    DataFrame iterations (the iterative-algorithm shape on Spark).

    Starts from the engine's deterministic init (vectors with
    id < n_centroids — the same cells ivf_topk uses), then per
    iteration: (1) assign every vector to its argmax-cosine centroid —
    a ZERO-EXCHANGE projection against the broadcast centroid array
    (centroid_argmax; the corpus truly never shuffles, at any width);
    (2) recompute each centroid
    as the elementwise mean of its members via posexplode →
    (cid, pos) partial-agg → array re-assembly — the shuffle carries
    (cid, pos, sum, count) tuples, i.e. O(k × dim), not vectors.
    Each new centroid set is localCheckpoint'd: the tiny k×dim frame is
    pinned so the plan does not grow with the iteration count (the same
    lineage control connected_components uses).

    Cells that lose all members drop out (standard Lloyd behavior with
    a fixed init; documented, matched by the oracle). Means accumulate
    in exact DECIMAL then divide once — deterministic across partition
    orders and engines. Returns (cid, centvec) after ``iters`` rounds.

    ``init_centroids``: optional (cid, centvec) WARM START — the index-
    maintenance shape: after a batch of vectors upserts into the store,
    refresh the coarse quantizer from the PREVIOUS converged centroids
    with one Lloyd round instead of re-clustering from the fixed init
    (half or fewer corpus passes for the same quality near convergence).
    Chaining invariant (pinned in tests/test_scale_ops.py): on an
    unchanged corpus, refine(iters=j) warm-started into refine(iters=k)
    is BIT-IDENTICAL to refine(iters=j+k) — warm start is literally
    resuming the same deterministic iteration.
    """
    # work in double throughout (floats widened once at the boundary)
    # so the decimal mean accumulation sees the same IEEE values the
    # oracle's ::DOUBLE projection sees
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if init_centroids is None:
        cents = c.filter(F.col("id") < n_centroids).select(
            F.col("id").alias("cid"), F.col("v").alias("centvec")
        )
    else:
        cents = init_centroids.select("cid", "centvec")
    for _ in range(iters):
        # zero-exchange assignment (centroid_argmax): each iteration's
        # corpus pass is scan → broadcast centroid array → project;
        # only the O(k×dim) means recompute below shuffles anything
        assigned = centroid_argmax(c, cents, "v").select("cid", "v")
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(30,10)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
        )
        cents = (
            means.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centvec")
            )
            .localCheckpoint(eager=True)
        )
    return cents


def kmeans_cells(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    iters: int,
    init_centroids: "DataFrame | None" = None,
) -> DataFrame:
    """Final cell census after k-means refinement: one row per
    surviving cell with its member count and refined-centroid norm —
    the quantizer-quality summary an IVF build job would log.
    ``init_centroids`` warm-starts the refinement (index maintenance
    after a batch upsert — see kmeans_refine)."""
    cents = kmeans_refine(
        corpus, id_col, vec_col, n_centroids, iters,
        init_centroids=init_centroids,
    )
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # zero-exchange assignment (centroid_argmax), then a map-side
    # combined count per cell — the corpus is scanned once, unshuffled
    final = centroid_argmax(c, cents, "v").select("id", "cid")
    norms = cents.select(
        "cid", F.round(norm2(F.col("centvec")), 6).alias("centroid_norm")
    )
    # LEFT join on purpose: an INNER join's null-filter on cid gets
    # inferred down into the assignment projection as
    # isnotnull(array_max(...)) — duplicating the whole per-row argmax
    # into the join condition (2× the corpus pass). Every assigned cid
    # exists in the centroid set, so the left form is row-identical.
    return (
        final.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .join(F.broadcast(norms), "cid", "left")
        .select("cid", "n_members", "centroid_norm")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — asymmetric-distance ANN serving
# ---------------------------------------------------------------------------
# The next compression step after per-vector int8 (quantize_codes):
# each vector becomes m sub-space codes (m·log2(ksub) bits instead of
# dim·8), and queries score candidates through a per-query distance
# TABLE (m × ksub partial distances) — the standard IVF-PQ/ADC serving
# shape (Jégou et al., "Product Quantization for Nearest Neighbor
# Search"). Codebooks follow the house deterministic-quantizer contract
# (the sub-vectors of corpus ids < ksub, the same "k-means init" rule
# as ivf_topk's coarse centroids, refinable with kmeans_refine), so a
# SQL oracle can replay encoding and probing exactly.


def _subvectors(vec: Column, m: int) -> Column:
    """Split a vector into m equal consecutive sub-vectors."""
    sd = (F.size(vec) / m).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.slice(vec, j * sd + 1, sd),
    )


def l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance (deterministic order —
    mirrors the oracle's list_reduce)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    ksub: int,
) -> DataFrame:
    """(j, c, cv): codeword ``c`` of sub-space ``j`` is the j-th
    sub-vector of corpus vector ``c`` (ids < ksub) — deterministic
    PQ codebooks, total size m·ksub rows (always broadcastable)."""
    return (
        corpus.filter(F.col(id_col) < ksub)
        .select(
            F.col(id_col).cast("int").alias("c"),
            F.posexplode(_subvectors(F.col(vec_col), m)).alias("j", "cv"),
        )
        .select("j", "c", "cv")
    )


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    ksub: int,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """(id, pqcodes array<int>): each sub-vector's nearest codeword
    (squared-L2 argmin, rounded distance + lowest-code tie-break).

    Scale shape: posexplode is a narrow m-fold generator riding the
    scan; the codebook join is broadcast (ksub-fold amplification
    map-side, immediately collapsed by the min_by partial agg) — ONE
    shuffle on (id) carrying m rows per vector, then an array_sort
    re-assembly with no further exchange (same-key groupBys chain)."""
    cb = (
        codebooks
        if codebooks is not None
        else pq_codebooks(corpus, id_col, vec_col, m, ksub)
    )
    sub = corpus.select(
        F.col(id_col).alias("id"),
        F.posexplode(_subvectors(F.col(vec_col), m)).alias("j", "sv"),
    )
    enc = (
        sub.join(F.broadcast(cb), "j")
        .groupBy("id", "j")
        .agg(
            F.min_by(
                "c",
                F.struct(
                    F.round(l2sq(F.col("sv"), F.col("cv")), 6).alias("d"),
                    F.col("c"),
                ),
            ).alias("code")
        )
    )
    return enc.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "code"))),
            lambda s: s.getField("code"),
        ).alias("pqcodes")
    )


def pq_adc_topk(
    codes_df: DataFrame,
    query: DataFrame,
    codebooks: DataFrame,
    query_id_col: str,
    vec_col: str,
    m: int,
    k: int,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: each query precomputes
    its m×ksub distance table against the broadcast codebooks, then a
    candidate's distance is m table lookups + a sequential-fold sum —
    the corpus pass never touches a float vector, only the codes.

    Output: (query_id, id, adc_dist, rank) ascending by distance.
    At 100 TB this runs inside probed IVF cells (codes_df = the
    partition-pruned cell read), exactly the FAISS IVF-PQ layout."""
    qsub = query.select(
        F.col(query_id_col).alias("query_id"),
        F.posexplode(_subvectors(F.col(vec_col), m)).alias("j", "qv"),
    )
    per_j = (
        qsub.join(F.broadcast(codebooks), "j")
        .select(
            "query_id",
            "j",
            "c",
            F.round(l2sq(F.col("qv"), F.col("cv")), 6).alias("pd"),
        )
        .groupBy("query_id", "j")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("c", "pd"))),
                lambda s: s.getField("pd"),
            ).alias("row")
        )
    )
    qtab = per_j.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "row"))),
            lambda s: s.getField("row"),
        ).alias("tab")
    )
    dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("pqcodes"),
                F.col("tab"),
                lambda c, row: F.element_at(row, c + 1),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    scored = (
        codes_df.crossJoin(F.broadcast(qtab))
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "id", dist.alias("adc_dist"))
    )
    # two-level exact top-k (see brute_force_topk): no per-query
    # single-task sort of the scored frame
    return grouped_topk(
        scored, ["query_id"], [F.asc("adc_dist"), F.asc("id")], k,
        salt=F.pmod(F.col("id"), F.lit(32)),
    )


def ivfpq_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    m: int,
    ksub: int,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """The FAISS IVF-PQ store: (id, cid, pqcodes) — every corpus
    vector carries its inverted-list cell and its m sub-space codes.
    Persist ``partitionBy("cid")``; a probe then reads only the probed
    cells' partitions AND never touches a float vector (the two
    compressions compose: cell pruning × m·log2(ksub)-bit codes).

    Codes quantize the RAW vectors (codebooks shared across cells);
    the residual-encoding variant (encode x − centroid per cell) buys
    accuracy at the cost of per-cell codebooks — same plumbing, train
    ``pq_codebooks`` per cell and join on (cid, j) instead of (j).
    """
    cb = (
        codebooks
        if codebooks is not None
        else pq_codebooks(corpus, id_col, vec_col, m, ksub)
    )
    cells = ivf_assignments(corpus, id_col, vec_col, n_centroids).select(
        "id", "cid"
    )
    codes = pq_encode(corpus, id_col, vec_col, m, ksub, codebooks=cb)
    # both sides arrive hash-partitioned by id from their aggregates
    return cells.join(codes, "id")


def ivfpq_probe(
    index: DataFrame,
    query: DataFrame,
    codebooks: DataFrame,
    centroids: DataFrame,
    query_id_col: str,
    vec_col: str,
    m: int,
    k: int,
    nprobe: int,
) -> DataFrame:
    """Probe the IVF-PQ store: rank cells by full-precision centroid
    cosine (the tiny ``centroids`` sidecar — never the store), take
    ``nprobe``, then ADC-score only those cells' code rows via each
    query's broadcast distance table. Output (query_id, id, adc_dist,
    rank), ascending distance — recall < 1 by design (cell misses +
    quantization), the standard serving trade."""
    from pyspark.sql import Window

    cents = centroids.select(
        F.col("cid"),
        F.col("centvec"),
        norm2(F.col("centvec")).alias("centnorm"),
    )
    q = query.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm2(F.col(vec_col)).alias("qnorm"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("qscore"), F.asc("cid")
    )
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "query_id",
            "qvec",
            "cid",
            F.round(
                dot(F.col("qvec"), F.col("centvec"))
                / (F.col("qnorm") * F.col("centnorm")),
                6,
            ).alias("qscore"),
        )
        .withColumn("prank", F.row_number().over(wq))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "qvec", "cid")
    )
    qsub = probes.select(
        "query_id",
        "cid",
        F.posexplode(_subvectors(F.col("qvec"), m)).alias("j", "qv"),
    )
    qtab = (
        qsub.join(F.broadcast(codebooks), "j")
        .select(
            "query_id",
            "cid",
            "j",
            "c",
            F.round(l2sq(F.col("qv"), F.col("cv")), 6).alias("pd"),
        )
        .groupBy("query_id", "cid", "j")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("c", "pd"))),
                lambda s: s.getField("pd"),
            ).alias("row")
        )
        .groupBy("query_id", "cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "row"))),
                lambda s: s.getField("row"),
            ).alias("tab")
        )
    )
    dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("pqcodes"),
                F.col("tab"),
                lambda c, row: F.element_at(row, c + 1),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    # the cid equi-join is what partition pruning rides on: only the
    # probed cells' store partitions are read
    scored = (
        index.join(F.broadcast(qtab), "cid")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "id", dist.alias("adc_dist"))
    )
    # two-level exact top-k (see brute_force_topk): no per-query
    # single-task sort of the scored frame
    return grouped_topk(
        scored, ["query_id"], [F.asc("adc_dist"), F.asc("id")], k,
        salt=F.pmod(F.col("id"), F.lit(32)),
    )
