"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these operators at 100 TB):

- exact_dedup: hash-groupBy on a digest, not on the full text — the
  shuffle carries 32-byte keys + doc ids, never document bodies.
- MinHash+LSH: the classic shingle → minhash signature → band-bucket →
  within-bucket candidate join. Candidate generation is an equi-join on
  (band_id, bucket_hash), so Spark executes it as a shuffled hash join
  whose cardinality is bounded by bucket occupancy — NOT an O(n²)
  cross join. Exact Jaccard is then computed only on candidates.
- SimHash: 32-bit signature per doc computed inside one expression
  (operators/textops.simhash32); near-dup = Hamming distance ≤ k on
  band-bucketed candidates.

Hashes are md5-derived (portable across engines) — see textops.hash32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metar_pipeline_spark.operators.textops import tokens, word_shingles


def exact_dedup_groups(
    df: DataFrame, id_col: str, text_col: str, key_expr=None
) -> DataFrame:
    """Group documents by content digest; keep the min-id canonical doc.

    ``key_expr`` overrides the digest (e.g. a normalized prefix for
    near-exact grouping). Returns (content_key, canonical_id, n_copies).
    """
    key = key_expr if key_expr is not None else F.md5(F.col(text_col))
    return (
        df.select(key.alias("content_key"), F.col(id_col))
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 32-bit SimHash per document, explode formulation.

    explode(tokens) → one md5 per token row → 32 ±1 contribution columns
    → groupBy(id).sum: every expression is statically codegen'd and the
    32 sums combine map-side, so the shuffle carries one 32-counter row
    per doc per map task. This is the bulk/scale form of
    textops.simhash32 (same bits, same oracle).

    Documents with zero tokens keep a NULL token row (explode_outer) and
    contribute 0 to every counter → simhash 0, matching the
    aggregate-over-empty-array semantics of the column form.
    """
    from metar_pipeline_spark.operators.fanout import fan_out

    # fan_out: a single-file scan is ONE partition, so the tokenize →
    # md5-per-token → 32-sum map side ran on one core (guide §2.5).
    # Conditional floor; no-op on multi-split scans. The 32 bit-sums
    # are exact integers, so partitioning is result-invariant.
    ex = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("_t")
    )
    # Two-step select so md5 runs once per row; the 32 bit tests read the
    # materialized hash column (CollapseProject keeps non-cheap exprs
    # referenced many times un-inlined).
    hashed = ex.select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("_t")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("_h"),
    )
    # Counter math without branches: per bit b, ones_b = Σ (h>>b)&1 and
    # sign(Σ ±1) > 0  ⟺  2*ones_b > n_tokens. Pure shift/and keeps the
    # generated code ~6x smaller than a nested-CASE formulation (cold
    # codegen time matters when thousands of plans compile per day);
    # NULL hash rows (empty docs) drop out of both sums, giving
    # simhash 0, same as the aggregate-over-empty-array column form.
    # Round 13 (guide §1.2 fixed costs): the 32 bit-sum aggregates and
    # the 32-term reassembly chain are built as SQL strings — the
    # Column-by-Column construction cost ~2 s of py4j round-trips per
    # call. Identical expression trees (shiftright/& and the same
    # CASE/cast shapes), so results are bit-identical.
    sums = hashed.groupBy(id_col).agg(
        *[
            F.expr(f"sum(shiftright(_h, {b}) & 1) AS _s{b}")
            for b in range(32)
        ],
        F.expr("count(_h) AS _n"),
    )
    chain = "CAST(0 AS BIGINT)"
    for b in range(32):
        chain = (
            f"({chain} + CASE WHEN _s{b} * 2 > _n"
            f" THEN CAST({1 << b} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
        )
    return sums.select(F.col(id_col), F.expr(f"{chain} AS simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: band-bucket blocking → Hamming ≤ k.

    Splits the 32-bit signature into ``n_bands`` byte bands; by pigeonhole
    any pair within Hamming distance < n_bands shares at least one intact
    band, so the candidate join on (band, band_value) is complete for
    max_hamming < n_bands. Candidate cardinality is bounded by band-value
    bucket occupancy — never O(n²).
    """
    width = 32 // n_bands
    mask = (1 << width) - 1
    # Materialize signatures once: the band self-join would otherwise
    # recompute the whole explode→md5→32-sum lineage on BOTH sides
    # (exchange reuse is not guaranteed under AQE). One row per doc, so
    # the checkpoint is tiny relative to the corpus at any scale.
    s = simhash_table(df, id_col, text_col).localCheckpoint(eager=True)
    bands = s.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).select(
        "id",
        "simhash",
        "band",
        F.expr(f"shiftright(simhash, band * {width}) & {mask}").alias("val"),
    )
    a = bands.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"),
        "band", "val",
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"),
        "band", "val",
    )
    cands = (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        cands.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int, shingle_n: int
) -> DataFrame:
    """(id, signature: array<string>) — string-min MinHash, md5-derived
    so it is identical in any engine (no integer-hash portability
    issues).

    Cost shaping for scale: one md5 yields FOUR independent 32-bit
    hashes (8 hex chars each), so a k-hash signature needs only
    ceil(k/4) digests per shingle instead of k. signature[i] = min over
    distinct shingles of substr(md5((i div 4) || ':' || s), (i mod 4)*8+1, 8).
    """
    n_digests = (num_hashes + 3) // 4
    # Materialize the token array in its own projection first: the
    # shingle lambda then reads a bound attribute instead of re-deriving
    # split/filter per element (HOFs run interpreted, without CSE).
    from metar_pipeline_spark.operators.fanout import fan_out

    # fan_out: parallelize the tokenize+shingle+md5 map side when the
    # scan is narrower than the cluster (single-file test tables scan
    # as ONE partition — guide §2.5). min/count aggregates are exact,
    # so partitioning is result-invariant; no-op at scale.
    tokd = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    sh = F.array_distinct(word_shingles(F.col("_toks"), shingle_n))
    # explode → flat md5 columns → groupBy-min: every expression here is
    # statically codegen'd (Spark's higher-order-function lambdas are
    # interpreted per element and ~30x slower), and the min-aggregate is
    # partial map-side, so the shuffle carries one signature row per doc
    # per map task. This is the formulation that survives 100 TB.
    ex = tokd.select(F.col(id_col), F.explode(sh).alias("_s"))
    digests = ex.select(
        F.col(id_col),
        *[
            F.md5(F.concat(F.lit(f"{d}:"), F.col("_s"))).alias(f"_d{d}")
            for d in range(n_digests)
        ],
    )
    hash_cols = [
        F.substring(F.col(f"_d{i // 4}"), (i % 4) * 8 + 1, 8).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    flat = digests.select(F.col(id_col), *hash_cols)
    agg = flat.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(num_hashes)],
        F.count(F.lit(1)).alias("n_shingles"),
    )
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias(
            "signature"
        ),
        F.col("n_shingles"),
    )


def band_buckets(
    sig_df: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band, bucket): one LSH band-bucket row per signature band.

    bucket = md5 of the band's signature slice joined by '|'; the band
    index rides along so buckets never collide across bands. This is
    THE banding formulation — the oracle SQL replays it verbatim, and
    both the batch self-join and the incremental batch-vs-corpus dedup
    derive their candidates from it (single source of truth)."""
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return sig_df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.slice(
                                F.col("signature"),
                                b * rows_per_band + 1,
                                rows_per_band,
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    sig_df: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing ≥1 LSH band bucket.

    Band-bucket rows (band_buckets) self-equi-joined. At scale, bucket
    skew (a degenerate bucket holding half the corpus) is the classic
    failure; AQE skew-join splitting handles moderate skew, and
    pathological buckets should be dropped by a count filter upstream
    (not needed at these SFs).
    """
    buckets = band_buckets(sig_df, id_col, bands, rows_per_band)
    # The self-join would otherwise recompute the whole signature lineage
    # on both sides (exchange reuse is not guaranteed under AQE); the
    # bucket table is tiny (docs x bands), so cache it.
    buckets = buckets.cache()
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_on_pairs(
    pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    Joins the (small) candidate set back to per-doc distinct-shingle
    arrays; similarity = |A∩B| / |A∪B| via array_intersect sizes — all
    JVM-side. Output: (id_a, id_b, jaccard) with jaccard rounded to 6.
    """
    # cache: the shingle-set table is joined twice (id_a and id_b side).
    # No broadcast hint on the candidate set: post-LSH candidates are
    # O(corpus × dup-rate) — unbounded at scale — so let AQE broadcast
    # only when the runtime size actually fits.
    sets_df = (
        docs.select(
            F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks")
        )
        .select(
            "id",
            F.array_distinct(
                word_shingles(F.col("_toks"), shingle_n)
            ).alias("sh"),
        )
        .cache()
    )
    out = (
        sets_df.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
        .join(pairs, "id_a")
        .join(
            sets_df.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return out.select(
        "id_a",
        "id_b",
        F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature → banded candidates
    → exact Jaccard filter ≥ threshold."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    sims = jaccard_on_pairs(cands, df, id_col, text_col, shingle_n)
    return sims.filter(F.col("jaccard") >= threshold)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list: every node gets
    ``component_id`` = the minimum node id reachable from it.

    This is the step that turns near-dup PAIRS (LSH/Jaccard output) into
    dedup GROUPS — at training-data scale a doc can pair with thousands
    of near-copies and transitive chains must collapse to one canonical
    id per cluster.

    Algorithm: hash-min label propagation. Each round every node takes
    the min of its own label and its neighbors' labels (one shuffled
    equi-join on node id + one groupBy-min), converging in
    O(component diameter) rounds — near-dup clusters are shallow (stars /
    short chains), so typically 2-4 rounds. Per round the iterate is
    ``localCheckpoint``-ed: lineage stays O(1) so Catalyst never replans
    a 25-join tree, and the convergence check is a scalar count, not a
    driver collect of the labels. For adversarial high-diameter graphs
    the large-star/small-star variant (Kiveris et al., "Connected
    Components in MapReduce") halves diameter per round; near-dup graphs
    don't need it.
    """
    # Materialize the (possibly expensive — LSH/Jaccard) edge derivation
    # ONCE; every propagation round re-reads checkpointed blocks, never
    # re-runs the pair-generation join.
    from pyspark.sql import Observation

    sym = (
        edges.select(F.col(src_col).alias("__s"), F.col(dst_col).alias("__d"))
        .union(
            edges.select(
                F.col(dst_col).alias("__s"), F.col(src_col).alias("__d")
            )
        )
        .localCheckpoint()
    )

    def _ckpt_with_sum(lbls):
        # Labels only ever decrease (min-propagation), so the exact total
        # is a strictly decreasing fixpoint witness. The sum rides the
        # checkpoint materialization as an OBSERVED metric (CollectMetrics
        # node) — one job per round, not checkpoint + a second scalar-agg
        # job (measured on the sf0.1 iterate: 1.61 s → 1.35 s median).
        # decimal(38) cannot overflow at any realistic id x row scale.
        obs = Observation()
        out = lbls.observe(
            obs, F.sum(F.col("__lbl").cast("decimal(38,0)")).alias("s")
        ).localCheckpoint()
        return out, obs.get["s"]

    labels, prev_sum = _ckpt_with_sum(
        nodes.select(
            F.col(node_col).alias("__n"), F.col(node_col).alias("__lbl")
        )
    )
    for _ in range(max_iter):
        neighbor = (
            sym.join(labels, sym["__d"] == labels["__n"])
            .select(F.col("__s").alias("__n"), "__lbl")
        )
        labels, cur_sum = _ckpt_with_sum(
            labels.unionByName(neighbor)
            .groupBy("__n")
            .agg(F.min("__lbl").alias("__lbl"))
        )
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(
        F.col("__n").alias(node_col), F.col("__lbl").alias("component_id")
    )


def incremental_components(
    labels: DataFrame,
    new_nodes: DataFrame,
    new_edges: DataFrame,
    node_col: str = "node",
    label_col: str = "component_id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> "tuple[DataFrame, DataFrame]":
    """Incremental connected-component (dedup cluster) maintenance —
    the label store analogue of :func:`incremental_dedup_verdicts`,
    closing the last O(corpus)-per-cycle step in the dedup story: a
    daily batch must not re-run CC over the whole near-dup graph
    (the incremental-first contract is the reference's core identity —
    dbt/models/stg/stg_metar_observations.sql:14-19 and every
    is_incremental() block).

    Inputs:
    - ``labels``: the persisted (node, component_id) store from the
      previous cycle — a valid hash-min labeling (component_id = min
      node id of the component, which is exactly what
      :func:`connected_components` emits);
    - ``new_nodes``: the batch's node ids (ids must be disjoint from
      corpus ids — the ingest contract);
    - ``new_edges``: near-dup edges incident to the batch (new↔corpus
      and new↔new; late corpus↔corpus edges are also legal).

    Algorithm — CC over the CONTRACTED graph: each old component is
    already one label, so map every edge endpoint through its stored
    label (endpoint reads are a broadcast semi-join of the ≤2|Δ| edge
    endpoints against the store — untouched labels are never read),
    then run hash-min CC over {touched labels ∪ batch ids} with the
    label-mapped edges. That graph is O(|Δ edges| + |batch|) —
    per-batch work is bounded by the AFFECTED-COMPONENT subgraph,
    never the corpus. Because old labels are min member ids, the
    contracted minimum IS the global minimum, so the result is
    bit-equal to a full recompute over old ∪ new (the IVM
    algebra ≡ recompute pattern, proven at the gate by
    q:dedup_incremental_components).

    Returns ``(label_delta, comp_relabel)``:
    - ``label_delta``: (node_col, label_col, is_new) — ONE row per
      batch node and per old node whose label changed; the caller
      upserts these into the store (untouched rows are never emitted,
      and only the changed components' store rows are read — via a
      broadcast join on their old labels);
    - ``comp_relabel``: (old_label, label_col) — every OLD component
      touched by the batch (identity rows included when the label
      survives), the key set a component-grain side store (canonical
      survivors — :func:`incremental_canonical_update`) needs for its
      own upsert.
    """
    lbl = labels.select(
        F.col(node_col).alias("__n"), F.col(label_col).alias("__l")
    )
    e = (
        new_edges.select(
            F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
        )
        .distinct()
        .localCheckpoint(eager=True)  # |Δ| edges; feeds endpoints + map
    )
    endpoints = (
        e.select(F.col("__s").alias("__n"))
        .union(e.select(F.col("__d").alias("__n")))
        .distinct()
    )
    # the FIRST of exactly two bounded store reads: labels of the edge
    # endpoints (broadcast semi-join — partition-prunable when the
    # store is bucketed by node id).
    elbl = lbl.join(F.broadcast(endpoints), "__n", "semi").localCheckpoint(
        eager=True
    )  # ≤ 2|Δ| rows; feeds both endpoint maps + the old-label domain
    ms = elbl.select(F.col("__n").alias("__s"), F.col("__l").alias("__ls"))
    md = elbl.select(F.col("__n").alias("__d"), F.col("__l").alias("__ld"))
    ce = (
        e.join(F.broadcast(ms), "__s", "left")
        .join(F.broadcast(md), "__d", "left")
        .select(
            F.coalesce("__ls", "__s").alias("__cs"),
            F.coalesce("__ld", "__d").alias("__cd"),
        )
        .filter(F.col("__cs") != F.col("__cd"))
    )
    nn = new_nodes.select(F.col(node_col).alias("__cn"))
    cnodes = (
        ce.select(F.col("__cs").alias("__cn"))
        .union(ce.select(F.col("__cd").alias("__cn")))
        .union(nn)
        .distinct()
    )
    # contracted-grain CC: O(|Δ|) nodes/edges, O(merged diameter)
    # rounds — the corpus never enters the iteration.
    # connected_components emits a fixed "component_id" column — rename
    # to the caller's label_col (round-11 ADVICE: the selects below use
    # label_col, so a non-default caller hit an AnalysisException here).
    sub = (
        connected_components(
            cnodes, ce, node_col="__cn", src_col="__cs", dst_col="__cd",
            max_iter=max_iter,
        )
        .withColumnRenamed("component_id", label_col)
        .localCheckpoint(eager=True)  # tiny; feeds relabel + new-node rows
    )
    old_lbls = elbl.select(F.col("__l").alias("__cn")).distinct()
    comp_relabel = (
        sub.join(F.broadcast(old_lbls), "__cn", "semi")
        .select(
            F.col("__cn").alias("old_label"),
            F.col(label_col),
        )
    )
    delta_new = (
        nn.join(F.broadcast(sub), "__cn", "left")
        .select(
            F.col("__cn").alias(node_col),
            F.coalesce(F.col(label_col), F.col("__cn")).alias(label_col),
            F.lit(True).alias("is_new"),
        )
    )
    changed = comp_relabel.filter(
        F.col("old_label") != F.col(label_col)
    )
    # the SECOND bounded store read: members of the components whose
    # label changed (broadcast equi-join on the old label — with the
    # store partitioned by a label bucket this prunes to the affected
    # partitions).
    delta_old = (
        labels.join(
            F.broadcast(changed),
            labels[label_col] == changed["old_label"],
        )
        .select(
            F.col(node_col),
            changed[label_col].alias(label_col),
            F.lit(False).alias("is_new"),
        )
    )
    return delta_new.unionByName(delta_old), comp_relabel


def incremental_canonical_update(
    champions: DataFrame,
    comp_relabel: DataFrame,
    new_members: DataFrame,
    label_col: str = "component_id",
    id_col: str = "kept_id",
    key_col: str = "kept_key",
) -> DataFrame:
    """Canonical-survivor maintenance riding the same incremental pass
    (dedup_canonical_keep semantics: max ``key_col`` — e.g. text
    length — then min id). ``champions`` is the component-grain store
    (label_col, id_col, key_col); ``comp_relabel`` comes from
    :func:`incremental_components`; ``new_members`` is the labeled
    batch (label_col, id_col, key_col).

    The survivor rule is an associative max, so the merged component's
    champion = max over its constituent old components' champions ∪
    its new members — one broadcast join against the store (touched
    components only) + one hash aggregate at affected-component grain.
    Returns the upsert delta: one champion row per AFFECTED component;
    merged-away old labels are exactly ``comp_relabel``'s non-identity
    domain. Numeric ``key_col``/``id_col`` required (negation trick).
    """
    old_c = (
        champions.join(
            F.broadcast(comp_relabel),
            champions[label_col] == comp_relabel["old_label"],
        )
        .select(
            comp_relabel[label_col].alias(label_col),
            F.col(id_col),
            F.col(key_col),
        )
    )
    cand = old_c.unionByName(
        new_members.select(label_col, id_col, key_col)
    )
    m = cand.groupBy(label_col).agg(
        F.min(
            F.struct(
                (-F.col(key_col)).alias("nk"), F.col(id_col).alias("i")
            )
        ).alias("__m")
    )
    return m.select(
        label_col,
        F.col("__m.i").alias(id_col),
        (-F.col("__m.nk")).alias(key_col),
    )


def incremental_dedup_verdicts(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    threshold: float = 0.5,
    corpus_buckets: DataFrame | None = None,
    new_buckets: DataFrame | None = None,
) -> DataFrame:
    """Dedup a NEW batch against an existing corpus without re-pairing
    the corpus with itself — the shape a continuously-ingesting pipeline
    runs every cycle.

    Candidates are (new, prior) only: prior = any corpus doc, or an
    earlier-id doc of the same batch. The corpus×corpus quadrant — by
    far the largest at 100 TB — is never generated. In production the
    corpus band-buckets live in a persisted SIGNATURE STORE (written
    once, partitioned by band — pass it as ``corpus_buckets``: columns
    (id, band, bucket)), so each cycle re-derives signatures only for
    the new batch and the corpus TEXT is joined by id only for the
    candidate pairs. When ``corpus_buckets`` is None, the store is
    derived inline from the same md5 formulation the oracle replays.

    Returns one verdict row per new doc: (id, matched_id, jaccard,
    is_duplicate) with the best match chosen by (rounded jaccard desc,
    id asc) — deterministic on both engines.

    ``new_buckets``: precomputed band-buckets of the NEW batch
    ((id, band, bucket) from the same minhash formulation) — pass it
    when the caller also persists the batch's signatures (the
    dedup-at-ingest stream), so the batch text is exploded once, not
    twice.
    """
    rows_per_band = num_hashes // bands

    def buckets_of(docs: DataFrame, tag: int) -> DataFrame:
        sigs = minhash_signature(docs, id_col, text_col, num_hashes, shingle_n)
        return band_buckets(sigs, id_col, bands, rows_per_band).withColumn(
            "is_corpus", F.lit(tag)
        )

    if new_buckets is not None:
        new_b = new_buckets.select("id", "band", "bucket").withColumn(
            "is_corpus", F.lit(0)
        ).cache()
    else:
        new_b = buckets_of(new_docs, 0).cache()
    if corpus_buckets is not None:
        corpus_b = corpus_buckets.select("id", "band", "bucket").withColumn(
            "is_corpus", F.lit(1)
        )
    else:
        corpus_b = buckets_of(corpus_docs, 1)
    prior_b = corpus_b.unionByName(new_b)
    # a.id != b.id everywhere: if a new-batch id ever collides with a
    # corpus id, the doc must not match ITSELF through the corpus side.
    cands = (
        new_b.alias("a")
        .join(
            prior_b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.id") != F.col("a.id"))
            & (
                (F.col("b.is_corpus") == 1)
                | (F.col("b.id") < F.col("a.id"))
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Enforce the contract above: corpus TEXT is shingled only for
    # candidate ids. Without this semi-join, jaccard_on_pairs builds
    # (and caches) shingle sets for EVERY corpus doc — O(corpus) work
    # per cycle, which at 100 TB means re-tokenizing the whole corpus
    # every micro-batch. Candidates are O(batch × dup-rate), so the
    # semi-join side is tiny. localCheckpoint (not cache) because cands
    # feeds two downstream branches of ONE job — a cache can be raced
    # by parallel stages before it populates — and the materialized
    # size lets the planner broadcast the semi-join side.
    cands = cands.localCheckpoint(eager=True)
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .unionByName(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    all_docs = new_docs.unionByName(corpus_docs).join(
        cand_ids, id_col, "semi"
    )
    sims = jaccard_on_pairs(cands, all_docs, id_col, text_col, shingle_n)
    # Best match per new doc by (jaccard desc, id_b asc) via row_number —
    # works for ANY orderable id type (string ids included), unlike a
    # negated-id struct max which requires numeric ids.
    wb = Window.partitionBy("id_a").orderBy(
        F.desc("jaccard"), F.asc("id_b")
    )
    best = (
        sims.filter(F.col("jaccard") >= threshold)
        .withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("id_a"),
            F.col("id_b").alias("matched_id"),
            F.col("jaccard"),
        )
    )
    return (
        new_docs.select(F.col(id_col))
        .join(best.withColumnRenamed("id_a", id_col), id_col, "left")
        .select(
            id_col,
            "matched_id",
            "jaccard",
            F.col("matched_id").isNotNull().alias("is_duplicate"),
        )
    )


# Winnowing polynomial-hash constants, shared verbatim with the DuckDB
# oracle: shingle hash = sum_j tokh[j]*BASE^j mod MOD, mod applied per
# step so every intermediate fits int64 on both engines.
WINNOW_MOD = 2147483647  # 2^31 - 1
WINNOW_BASE = 1000003


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): per document, the set of selected shingle hashes that
    GUARANTEES any exact shared token run of length >= window +
    shingle_k - 1 produces at least one shared fingerprint.

    Selection: hash every ``shingle_k``-token shingle with a rolling
    polynomial over per-token hashes (Σ_j tokh[i+j]·B^j mod 2³¹−1 —
    one portable textops.hash32 digest per token, int math for the
    rest), slide a ``window``-wide window over the hash sequence, keep
    the minimum of each window, dedupe. Expected density
    is 2/(window+1) of positions — the bandwidth knob for 100 TB: the
    downstream self-join shuffles (hash, id) pairs only, never text,
    and raising ``window`` thins the fingerprint stream linearly while
    keeping the detection guarantee for proportionally longer runs.

    This is the scale-correct form of "docs sharing an exact substring"
    (exact-substring dedup a la Lee et al. 2022 "Deduplicating Training
    Data Makes Language Models Better"): emitting ALL positions is
    O(tokens) rows/doc; winnowing keeps the guarantee at a fraction of
    the volume. Returns (id, fps: array<bigint>).
    """
    from metar_pipeline_spark.operators.textops import hash32

    # Shingle hashes as a POLYNOMIAL over per-token hashes (the actual
    # MOSS formulation): one md5 per TOKEN, then shingle_hash =
    # Σ_j tokh[i+j]·B^j mod M — pure int64 zip_with math. The naive
    # alternative (md5 over each materialized k-token shingle STRING)
    # costs k× the digests plus k string concats per position: measured
    # 4.5 s → ~1 s for the fingerprint pass at sf0.1. Every step mods
    # by M = 2³¹−1 so intermediates stay under int64 on both engines.
    #
    # Evaluation-order trap (costs O(len²) if ignored): higher-order
    # functions are interpreted with no common-subexpression
    # elimination, so the hash array must be staged as a BOUND column
    # before any sliding-window form references it repeatedly — an
    # inline transform(sequence(1, n), i -> array_min(slice(h, i, w)))
    # re-computed every digest once per window position (measured
    # 270 s at sf0.1). Same pitfall and fix as textops.word_shingles.
    M, B = WINNOW_MOD, WINNOW_BASE
    # Stage 1: per-token hashes, bound as a real column (referenced
    # shingle_k times below — inline it and the digests replay per
    # reference; CollapseProject keeps non-cheap multi-referenced
    # aliases staged, so this stays a separate projection).
    from metar_pipeline_spark.operators.fanout import fan_out

    # fan_out: the per-token digest + polynomial zip_with chain is the
    # expensive map side; over a single-file scan it ran on one core
    # (guide §2.5). Conditional floor; no-op on multi-split scans.
    tok_staged = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.transform(
            tokens(F.col(text_col)), lambda t: hash32(t) % M
        ).alias("_th"),
    )
    tokh = F.col("_th")

    def _poly_step(cj: int):
        return lambda a, b: (a + b * F.lit(cj)) % M

    sh_h = tokh
    for j in range(1, shingle_k):
        shifted = F.slice(
            tokh, j + 1, F.greatest(F.size(tokh) - j, F.lit(0))
        )
        sh_h = F.zip_with(sh_h, shifted, _poly_step(pow(B, j, M)))
    staged = tok_staged.select(
        "id",
        F.filter(sh_h, lambda x: x.isNotNull()).alias("_h"),
    )
    # Rolling min as a zip_with chain over the bound column: O(window)
    # references to _h per row, one pass per shift. zip_with pads the
    # shorter (shifted) side with NULL; propagating NULL through the
    # pairwise min marks trailing partial windows, dropped by the
    # final filter (least() alone would SKIP nulls and emit partials).
    h = F.col("_h")
    out = h
    for j in range(1, window):
        shifted = F.slice(h, j + 1, F.greatest(F.size(h) - j, F.lit(0)))
        out = F.zip_with(
            out,
            shifted,
            lambda a, b: F.when(
                a.isNull() | b.isNull(), F.lit(None)
            ).otherwise(F.least(a, b)),
        )
    fps = F.array_distinct(F.filter(out, lambda x: x.isNotNull()))
    return staged.select("id", fps.alias("fps"))


def winnow_span_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 8,
    window: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Document pairs sharing at least one winnowing fingerprint, i.e.
    candidates for exact-substring duplication (shared runs of
    >= window + shingle_k - 1 tokens).

    Shape: explode fingerprints -> self-equi-join on the 32-bit hash ->
    per-pair distinct-fingerprint count. The join is bucket-occupancy
    bounded exactly like LSH (lsh_candidate_pairs:233); boilerplate
    hashes (licence headers, templates) are the skew risk at corpus
    scale — ``max_bucket`` drops any fingerprint held by more than that
    many docs before the self-join (the standard stop-list move; None
    keeps exact semantics for the oracle). Returns
    (id_a, id_b, n_shared_fps).
    """
    # Materialize the per-doc fingerprint table (1 row/doc, ~2/(w+1)
    # selected hashes each) BEFORE the explode. Two reasons, both
    # measured at sf0.1: (a) InferFiltersFromGenerate synthesizes
    # size(fps) > 0 from the explode and pushes it through the staged
    # projections, inlining the whole hash chain into one filter
    # expression that replays every digest per reference (~26 s vs
    # ~4 s); (b) the self-join needs the rows twice, and the
    # checkpoint is the cheap reuse point (same pattern as
    # simhash_neardup_pairs:116).
    fp_rows = (
        winnow_fingerprints(
            df, id_col, text_col, shingle_k=shingle_k, window=window
        )
        .localCheckpoint(eager=True)
        .select("id", F.explode("fps").alias("fp"))
    )
    if max_bucket is not None:
        w_ok = (
            fp_rows.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("fp")
        )
        # w_ok is O(distinct fingerprints) — nearly all of them pass
        # the stop-list, so never force a broadcast; AQE picks one
        # only when the survivor set is actually small
        fp_rows = fp_rows.join(w_ok, "fp")
    a, b = fp_rows.alias("a"), fp_rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count_distinct(F.col("a.fp")).alias("n_shared_fps"))
    )


def winnow_incremental_pairs(
    new_docs: DataFrame,
    corpus_docs: DataFrame | None,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 8,
    window: int = 4,
    corpus_fps: DataFrame | None = None,
) -> DataFrame:
    """Exact-substring screening of a NEW batch against an existing
    corpus — the winnowing twin of incremental_dedup_verdicts (:396),
    for the continuously-ingesting pipeline shape.

    Candidate pairs are (new, prior) only: prior = any corpus doc, or
    an earlier-id doc of the same batch. The corpus×corpus quadrant is
    never generated, and in production the corpus fingerprints come
    from a persisted store (pass ``corpus_fps``: columns (id, fp),
    written once and appended per cycle) so each cycle hashes only the
    new batch; the corpus TEXT is never re-read at all — fingerprints
    alone decide candidacy.

    Returns (id_new, matched_id, n_shared_fps, is_corpus_match) — one
    row per detected (new, prior) fingerprint collision, i.e. a shared
    exact token run of >= window + shingle_k - 1 tokens.
    """
    if corpus_docs is None and corpus_fps is None:
        raise ValueError(
            "winnow_incremental_pairs: pass corpus_docs (texts to "
            "fingerprint) or corpus_fps (persisted (id, fp) store)"
        )
    new_rows = (
        winnow_fingerprints(
            new_docs, id_col, text_col, shingle_k=shingle_k, window=window
        )
        .localCheckpoint(eager=True)  # same Generate-filter guard as
        .select("id", F.explode("fps").alias("fp"))  # winnow_span_pairs
    )
    if corpus_fps is not None:
        corp_rows = corpus_fps.select("id", "fp")
    else:
        corp_rows = (
            winnow_fingerprints(
                corpus_docs,
                id_col,
                text_col,
                shingle_k=shingle_k,
                window=window,
            )
            .localCheckpoint(eager=True)
            .select("id", F.explode("fps").alias("fp"))
        )
    prior = corp_rows.withColumn("is_corpus", F.lit(True)).unionByName(
        new_rows.withColumn("is_corpus", F.lit(False))
    )
    a, b = new_rows.alias("a"), prior.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("b.id") != F.col("a.id"))
            & (F.col("b.is_corpus") | (F.col("b.id") < F.col("a.id"))),
        )
        .groupBy(
            F.col("a.id").alias("id_new"),
            F.col("b.id").alias("matched_id"),
            F.col("b.is_corpus").alias("is_corpus_match"),
        )
        .agg(F.count_distinct(F.col("a.fp")).alias("n_shared_fps"))
        .select("id_new", "matched_id", "n_shared_fps", "is_corpus_match")
    )
