"""Incremental view maintenance (IVM) over Z-sets — the DBSP /
Materialize delta-join algebra expressed in DataFrame ops.

A Z-set is a relation whose rows carry an integer weight ``_w``
(+1 insert, −1 retraction); updates are retract-old + insert-new
pairs. The delta of an inner equi-join under base changes is the
bilinear identity

    Δ(A ⋈ B) = ΔA ⋈ B_old  +  A_old ⋈ ΔB  +  ΔA ⋈ ΔB

so a materialized join view is maintained by joining only the DELTAS
against the (indexed) old states — never recomputing the view. At
100 TB this is the difference between touching |ΔA|+|ΔB| rows per
batch and rescanning both fact tables; the delta sides are typically
micro-batch-sized and broadcast, so each term is a broadcast hash
join against a partitioned base.

Consolidation (sum weights per row, drop net-0) is an ordinary hash
aggregate at the view's row grain. All weights are integers — the
algebra is exact and order-independent by construction, no float
determinism machinery needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT_COL = "_w"


def zset_delta_join(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    key,
) -> DataFrame:
    """The three bilinear terms of Δ(A ⋈ B), weights multiplied.

    Every input is a Z-set frame carrying ``_w``; ``key`` is the
    equi-join column name (or list) shared by both sides. Output
    columns: the joined row (key + both sides' payloads) + ``_w``.
    The result is UNCONSOLIDATED — pass through :func:`consolidate`
    (or your own aggregate) to net the weights.
    """

    def j(x: DataFrame, y: DataFrame) -> DataFrame:
        xw = x.withColumnRenamed(WEIGHT_COL, "_wa")
        yw = y.withColumnRenamed(WEIGHT_COL, "_wb")
        return (
            xw.join(yw, key)
            .withColumn(WEIGHT_COL, F.col("_wa") * F.col("_wb"))
            .drop("_wa", "_wb")
        )

    return (
        j(da, b_old)
        .unionByName(j(a_old, db))
        .unionByName(j(da, db))
    )


def consolidate(zset: DataFrame, cols: "list[str]") -> DataFrame:
    """Net a Z-set: sum weights per row, drop rows whose net weight is
    zero. One hash aggregate at the row grain."""
    return (
        zset.groupBy(*cols)
        .agg(F.sum(WEIGHT_COL).cast("int").alias(WEIGHT_COL))
        .filter(F.col(WEIGHT_COL) != 0)
    )


def zset_weighted_agg(
    zset: DataFrame,
    group_cols: "list[str]",
    sums: "dict[str, object] | None" = None,
    count_col: str = "_n",
) -> DataFrame:
    """The DELTA of a grouped linear aggregate, from the delta Z-set
    alone: COUNT(*) is linear in the weights (Δcount = Σ _w) and
    SUM(expr) is weight-multiplied (Δsum = Σ expr·_w) — retractions
    subtract by construction. One hash aggregate over |Δ| rows; the
    maintained view is never touched here.

    ``sums``: output name → Column expression to SUM. Use EXACT types
    (integer / DECIMAL) — the whole point of incremental maintenance is
    that old_state + Δ is bit-equal to a full recompute, which float
    accumulation order would break.

    Output: ``group_cols`` + ``count_col`` (long) + one column per
    ``sums`` entry. A group absent from the delta simply emits no row.
    """
    aggs = [F.sum(F.col(WEIGHT_COL)).cast("long").alias(count_col)]
    for name, col in (sums or {}).items():
        aggs.append(F.sum(col * F.col(WEIGHT_COL)).alias(name))
    return zset.groupBy(*group_cols).agg(*aggs)


def apply_agg_delta(
    view: DataFrame,
    delta: DataFrame,
    group_cols: "list[str]",
    measure_cols: "list[str]",
    count_col: str = "_n",
) -> DataFrame:
    """MERGE a group-grain aggregate delta (:func:`zset_weighted_agg`
    output) into the materialized aggregate view: full-outer equi-join
    on the group key (new groups appear from the delta side, untouched
    groups pass through from the view side), measures ADD with
    null-as-zero, and a group whose maintained row count nets to zero
    is DROPPED — the retraction-aware upgrade of watermark+merge
    (SURVEY L7 drops late updates by design; this path absorbs them).

    Shape at 100 TB: the join touches |view_groups| + |Δ_groups| rows
    at GROUP grain (never fact grain); with the view stored partitioned
    by the group key the delta side is micro-batch-sized and broadcast.
    ``view`` and ``delta`` must share ``group_cols`` + ``count_col`` +
    ``measure_cols`` names and exact (non-float) measure types.
    """
    j = view.alias("v").join(delta.alias("d"), group_cols, "full_outer")
    sel = [F.col(c) for c in group_cols]
    sel.append(
        (
            F.coalesce(F.col(f"v.{count_col}"), F.lit(0))
            + F.coalesce(F.col(f"d.{count_col}"), F.lit(0))
        ).cast("long").alias(count_col)
    )
    for m in measure_cols:
        sel.append(
            (
                F.coalesce(F.col(f"v.{m}"), F.lit(0))
                + F.coalesce(F.col(f"d.{m}"), F.lit(0))
            ).alias(m)
        )
    return j.select(*sel).filter(F.col(count_col) != 0)


def apply_topk_delta(
    view: DataFrame,
    dz: DataFrame,
    base_new: DataFrame,
    group_cols: "list[str]",
    id_col: str,
    score_col: str,
    k: int,
) -> DataFrame:
    """Maintain a per-group TOP-K view (score desc, id asc) under a
    delta Z-set — the ranked generalization of
    :func:`apply_minmax_delta` (MIN/MAX is top-1): materialized
    leaderboards, per-query retrieval caches, per-partner top
    offenders.

    Inserts are fully algebraic: after inserts alone, the new top-k is
    the top-k of (stored top-k ∪ inserted rows) — a row outside the
    old top-k cannot enter. A retraction that hits a STORED member
    leaves an unknowable runner-up, so exactly those groups rescan
    from the post-batch base (broadcast semi-join of the affected
    keys); a retraction of a non-member is a no-op by construction.

    Precondition (well-formed Z-set): an UPDATE to an existing
    (group, id) must arrive as a retract+insert pair. Defensively
    (round-11 ADVICE), an insert whose (group, id) already sits in the
    stored view ALSO marks its group unsafe — otherwise the safe
    path's view ∪ dpos union would rank the same id twice — so a
    malformed insert-without-retraction degrades to a correct rescan
    instead of a duplicated rank. In the well-formed case inserts
    carry new ids and the unsafe set is driven by retractions alone.

    Work shape: the safe path re-ranks O(k·|groups| + |Δ|) rows (view
    grain, never fact grain); the rescan reads only the unsafe groups.
    Both rankings run through ``ranking.grouped_topk`` (salted
    two-level), so a low-cardinality group key never single-tasks a
    corpus. ``view``/``base_new`` carry group_cols + id_col +
    score_col; ``dz`` adds ``_w``. Returns group_cols + id + score +
    rank (int). Numeric id required (salt + negation-free total
    order via F.desc/F.asc handles any orderable score).
    """
    from metar_pipeline_spark.operators.ranking import grouped_topk

    w = F.col(WEIGHT_COL)
    cols = [*group_cols, id_col, score_col]
    dneg = dz.filter(w < 0).select(*cols)
    dpos = dz.filter(w > 0).select(*cols)
    # unsafe ⇔ ANY delta row matches a stored member (group+id): a
    # retraction of a member leaves an unknowable runner-up, and an
    # insert colliding with a member (malformed Z-set — see
    # precondition) would double-rank that id on the safe path; both
    # degrade to the per-group rescan.
    unsafe = (
        view.join(
            F.broadcast(
                dneg.select(*group_cols, id_col).unionByName(
                    dpos.select(*group_cols, id_col)
                )
            ),
            [*group_cols, id_col],
            "semi",
        )
        .select(*group_cols)
        .distinct()
        .localCheckpoint(eager=True)  # tiny; feeds anti + semi below
    )
    order = [F.desc(score_col), F.asc(id_col)]
    salt = F.pmod(F.col(id_col), F.lit(32))
    cand_safe = (
        view.select(*cols)
        .unionByName(dpos)
        .join(F.broadcast(unsafe), group_cols, "anti")
    )
    topk_safe = grouped_topk(cand_safe, list(group_cols), order, k, salt=salt)
    rescan = base_new.select(*cols).join(
        F.broadcast(unsafe), group_cols, "semi"
    )
    topk_rescan = grouped_topk(rescan, list(group_cols), order, k, salt=salt)
    return topk_safe.unionByName(topk_rescan)


def minmax_delta_state(
    zset: DataFrame,
    group_cols: "list[str]",
    value_col: str,
) -> DataFrame:
    """Group-grain summary of a delta Z-set for extreme (MIN/MAX)
    maintenance: the net row-count change plus the inserted-value and
    retracted-value extremes. One hash aggregate over |Δ| rows.

    MIN/MAX are NOT linear in the weights, so unlike
    :func:`zset_weighted_agg` this cannot finish the job alone — the
    retracted extremes exist precisely to DETECT the groups where the
    maintained extreme may have been retracted (see
    :func:`apply_minmax_delta`)."""
    w = F.col(WEIGHT_COL)
    v = F.col(value_col)
    return zset.groupBy(*group_cols).agg(
        F.sum(w).cast("long").alias("_dn"),
        F.min(F.when(w > 0, v)).alias("_ins_min"),
        F.max(F.when(w > 0, v)).alias("_ins_max"),
        F.min(F.when(w < 0, v)).alias("_ret_min"),
        F.max(F.when(w < 0, v)).alias("_ret_max"),
    )


def apply_minmax_delta(
    view: DataFrame,
    dz: DataFrame,
    base_new: DataFrame,
    group_cols: "list[str]",
    value_col: str,
    count_col: str = "_n",
    min_col: str = "min_v",
    max_col: str = "max_v",
) -> DataFrame:
    """Maintain a grouped MIN/MAX (+COUNT) view under a delta Z-set —
    the non-linear-aggregate case of IVM (the reference's dwh rollup
    computes MAX/MIN per day, dbt/models/dwh/
    dw_daily_airport_metrics.sql:12-13; its semantics under late
    DELETES are exactly this).

    Inserts are algebraic: new_min = least(old_min, min(inserted)),
    same for max. Retractions are not — deleting the CURRENT extreme
    cannot be resolved from the view alone (the runner-up was never
    stored). The standard treatment (DBSP / Materialize "reduction
    with a rescan fallback"): detect the groups whose retracted-value
    extreme EQUALS the maintained extreme, and recompute ONLY those
    groups from the post-batch base via a broadcast semi-join of the
    affected keys — |unsafe| ≤ |Δ groups|, so the rescan reads the
    affected groups' partitions, never the fact table's breadth.

    ``view``: group_cols + count_col + min_col + max_col (the stored
    state). ``dz``: fact-grain delta Z-set with ``_w``. ``base_new``:
    the post-batch fact frame (group_cols + value_col) — only read for
    the unsafe groups. COUNT stays maintained algebraically; a group
    whose count nets 0 is dropped.
    """
    d = minmax_delta_state(dz, group_cols, value_col).localCheckpoint(
        eager=True
    )  # |Δ|-group grain; feeds the merge AND the unsafe probe
    vstate = view.select(
        *group_cols,
        F.col(min_col).alias("_vmin"),
        F.col(max_col).alias("_vmax"),
    )
    # unsafe ⇔ a retraction touched the maintained extreme. eqNullSafe:
    # a group with no retractions (_ret_* NULL) is never unsafe.
    unsafe = (
        vstate.join(F.broadcast(d), group_cols)
        .filter(
            F.col("_ret_min").eqNullSafe(F.col("_vmin"))
            | F.col("_ret_max").eqNullSafe(F.col("_vmax"))
        )
        .select(*group_cols)
    )
    # the ONLY base read: affected groups, keys broadcast — with the
    # base stored partitioned/bucketed by the group key this prunes to
    # the affected partitions.
    # lazy on purpose: rescan has exactly ONE consumer (the final left
    # join), and staying lazy keeps the semi-join visible in the plan
    # (pinned by tests/test_ivm.py); the broadcast hint below does not
    # need materialized stats.
    rescan = (
        base_new.join(F.broadcast(unsafe), group_cols, "semi")
        .groupBy(*group_cols)
        .agg(
            F.min(value_col).alias("_rmin"),
            F.max(value_col).alias("_rmax"),
        )
    )
    j = view.alias("v").join(d.alias("d"), group_cols, "full_outer")
    new_n = (
        F.coalesce(F.col(f"v.{count_col}"), F.lit(0))
        + F.coalesce(F.col("d._dn"), F.lit(0))
    ).cast("long")
    # least/greatest skip NULLs: new groups take the inserted extreme,
    # untouched groups keep the stored one.
    safe_min = F.least(F.col(f"v.{min_col}"), F.col("d._ins_min"))
    safe_max = F.greatest(F.col(f"v.{max_col}"), F.col("d._ins_max"))
    return (
        j.join(F.broadcast(rescan), group_cols, "left")
        .select(
            *group_cols,
            new_n.alias(count_col),
            F.coalesce(F.col("_rmin"), safe_min).alias(min_col),
            F.coalesce(F.col("_rmax"), safe_max).alias(max_col),
        )
        .filter(F.col(count_col) != 0)
    )
