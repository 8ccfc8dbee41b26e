"""Round-5 analytics suite: funnels, trend fitting, gap-fill, CDC,
graph ranking — the product-analytics layer a deployment builds on the
reference's event/observation model (SURVEY.md §1.4).

Scale notes per query are on the operators
(operators/funnel.py, operators/regression.py, operators/graph.py,
sources/cdc.py); each query here is a thin composition plus its
cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.queries import register
from metar_pipeline_spark.queries.core import DEC10, _dsum

# Seconds at 2024-01-01T00:00:00Z — the testdata epoch; x-axis origin
# for trend fits so the intercept is numerically tame.
_T0 = 1704067200

# ---------------------------------------------------------------------------
# Ordered funnel (view → click → purchase)
# ---------------------------------------------------------------------------


@register(
    "funnel_view_click_purchase",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    c AS (
      SELECT (SELECT COUNT(*) FROM s1) AS c0,
             (SELECT COUNT(*) FROM s2) AS c1,
             (SELECT COUNT(*) FROM s3) AS c2
    )
    SELECT * FROM (
      SELECT 0 AS step_idx, 'view' AS step, c0 AS users_reached,
             round(CAST(c0 AS DOUBLE) / NULLIF(c0, 0), 6) AS conv_from_first,
             round(CAST(c0 AS DOUBLE) / NULLIF(c0, 0), 6) AS conv_from_prev
      FROM c
      UNION ALL
      SELECT 1, 'click', c1,
             round(CAST(c1 AS DOUBLE) / NULLIF(c0, 0), 6),
             round(CAST(c1 AS DOUBLE) / NULLIF(c0, 0), 6) FROM c
      UNION ALL
      SELECT 2, 'purchase', c2,
             round(CAST(c2 AS DOUBLE) / NULLIF(c0, 0), 6),
             round(CAST(c2 AS DOUBLE) / NULLIF(c1, 0), 6) FROM c
    ) ORDER BY step_idx
    """,
    doc=(
        "Ordered 3-step funnel in ONE aggregation pass (per-user step "
        "timestamp lists + higher-order min-filter chain) vs the "
        "oracle's k-self-join formulation — the shape that keeps a "
        "funnel at one shuffle instead of k at 100 TB"
    ),
)
def funnel_view_click_purchase(spark, sf_dir):
    from metar_pipeline_spark.operators.funnel import funnel_summary

    events = load_table(spark, sf_dir, "events")
    return funnel_summary(events, ["view", "click", "purchase"])


# ---------------------------------------------------------------------------
# Grouped OLS trend (distributed-moments fit)
# ---------------------------------------------------------------------------


@register(
    "ols_trend_by_event_type",
    f"""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(value * value AS DECIMAL(38,10))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * value AS DECIMAL(38,10))) AS DOUBLE) AS sxy
      FROM (
        SELECT event_type, value,
               CAST(CAST(floor(epoch(ts)) AS BIGINT) - {_T0} AS DOUBLE) AS x
        FROM events
      ) GROUP BY event_type
    )
    SELECT event_type, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s ORDER BY event_type
    """,
    doc=(
        "Per-type least-squares trend of value over time via exact "
        "DECIMAL power sums (operators/regression.py) — one partial+"
        "final agg pass, six numbers per group across the wire, "
        "partition-order deterministic"
    ),
)
def ols_trend_by_event_type(spark, sf_dir):
    from metar_pipeline_spark.operators.regression import grouped_ols

    events = load_table(spark, sf_dir, "events")
    x = (F.col("ts").cast("timestamp").cast("long") - F.lit(_T0)).cast(
        "double"
    )
    return grouped_ols(
        events, ["event_type"], x, F.col("value")
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Linear-interpolation gap-fill over a per-key date spine
# ---------------------------------------------------------------------------


@register(
    "interpolate_daily_gaps",
    """
    WITH t AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                   / COUNT(*), 6) AS v
      FROM events WHERE event_id % 11 = 0
      GROUP BY 1, 2
    ),
    b AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM t GROUP BY 1
    ),
    spine AS (
      SELECT event_type,
             CAST(unnest(generate_series(
               CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
               INTERVAL 1 DAY)) AS DATE) AS day
      FROM b
    ),
    j AS (
      SELECT s.event_type, s.day, t.v
      FROM spine s LEFT JOIN t USING (event_type, day)
    ),
    w AS (
      SELECT *,
        last_value(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(v IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
          (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT event_type, day,
           CASE WHEN v IS NOT NULL THEN v
                ELSE round(pv + (nv - pv) * date_diff('day', pd, day)
                           / date_diff('day', pd, nd), 6)
           END AS value_filled,
           (v IS NULL) AS is_interpolated
    FROM w
    """,
    doc=(
        "Per-type daily series (deterministically thinned to create "
        "gaps) completed over a sequence() date spine with linear "
        "interpolation between the neighboring known points — spine "
        "generation is a narrow generator (no shuffle), both IGNORE "
        "NULLS windows share one exchange on event_type, and at 100 TB "
        "the window partitions are calendar-bounded (days per key), "
        "never event-bounded"
    ),
)
def interpolate_daily_gaps(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    t = (
        events.filter(F.col("event_id") % 11 == 0)
        .groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
        )
        .agg(
            F.round(
                _dsum(F.col("value"), DEC10) / F.count(F.lit(1)), 6
            ).alias("v")
        )
    )
    bounds = t.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    j = spine.join(t, ["event_type", "day"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_day = F.when(F.col("v").isNotNull(), F.col("day"))
    w = j.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(known_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(known_day, ignorenulls=True).over(wn).alias("nd"),
    )
    interpolated = F.round(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * F.datediff(F.col("day"), F.col("pd"))
        / F.datediff(F.col("nd"), F.col("pd")),
        6,
    )
    return w.select(
        "event_type",
        "day",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(interpolated)
        .alias("value_filled"),
        F.col("v").isNull().alias("is_interpolated"),
    )


# ---------------------------------------------------------------------------
# CDC changelog apply (I/U/D, ordered by sequence)
# ---------------------------------------------------------------------------


@register(
    "cdc_apply_changelog",
    """
    WITH ch AS (
      SELECT o_orderkey, 1 AS seq, 'I' AS op,
             o_totalprice AS price, o_orderstatus
      FROM orders
      UNION ALL
      -- the +10% reprice runs in exact DECIMAL (prices are 2-decimal
      -- values): double round() half-ties resolve differently across
      -- engines, decimal HALF_UP ties do not
      SELECT o_orderkey, 2, 'U',
             CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE),
             o_orderstatus
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', CAST(NULL AS DOUBLE),
             CAST(NULL AS VARCHAR)
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    w AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey
        ORDER BY seq DESC,
                 CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 ELSE 1 END DESC
      ) AS rn
      FROM ch
    )
    SELECT o_orderkey, price, o_orderstatus
    FROM w WHERE rn = 1 AND op <> 'D'
    """,
    doc=(
        "Debezium-style I/U/D change feed (derived deterministically "
        "from orders: every key inserted, every 3rd updated +10%, every "
        "5th deleted) collapsed to final state by sources/cdc.py — ONE "
        "window pass on the key with a D>U>I tie-break so at-least-once "
        "replays converge; the incremental target path touches only "
        "changed keys (broadcast anti-join), tested in test_analytics"
    ),
)
def cdc_apply_changelog(spark, sf_dir):
    from metar_pipeline_spark.sources.cdc import apply_changelog

    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    ins = orders.select(
        key.alias("o_orderkey"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_totalprice").alias("price"),
        "o_orderstatus",
    )
    upd = orders.filter(key % 3 == 0).select(
        key.alias("o_orderkey"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("1.1").cast("decimal(2,1)"),
            2,
        )
        .cast("double")
        .alias("price"),
        "o_orderstatus",
    )
    dele = orders.filter(key % 5 == 0).select(
        key.alias("o_orderkey"),
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("string").alias("o_orderstatus"),
    )
    changes = ins.unionByName(upd).unionByName(dele)
    return apply_changelog(changes, ["o_orderkey"])


# ---------------------------------------------------------------------------
# PageRank over the supplier→part supply graph
# ---------------------------------------------------------------------------


def _pagerank_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    """Unrolled-CTE twin of operators/graph.pagerank — one (contrib,
    dangling, rank) CTE triple per iteration, the same DECIMAL(38,18)
    accumulation and 12-decimal per-step rounding. Float literals are
    interpolated from the SAME Python doubles the Spark side uses, so
    e.g. 1-0.85 = 0.15000000000000002 appears identically on both
    engines."""
    head = """
    WITH edges AS (
      SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
      FROM lineitem
    ),
    nodes AS (
      SELECT node FROM (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges)
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS r
           FROM nodes CROSS JOIN nn)"""
    steps = []
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        steps.append(
            f"""
    c{i} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(r.r / o.deg AS DECIMAL(38,18))) AS DOUBLE) AS c
      FROM edges e JOIN {p} r ON e.src = r.node
                   JOIN outdeg o ON e.src = o.src
      GROUP BY e.dst
    ),
    d{i} AS (
      SELECT COALESCE(
        CAST(SUM(CAST(r.r AS DECIMAL(38,18))) AS DOUBLE), 0.0) AS dang
      FROM {p} r LEFT JOIN outdeg o ON r.node = o.src
      WHERE o.src IS NULL
    ),
    r{i} AS (
      SELECT nd.node,
             round(CAST({1.0 - damping!r} AS DOUBLE) / nn.n
                   + CAST({damping!r} AS DOUBLE)
                     * (COALESCE(c.c, 0.0) + d{i}.dang / nn.n), 12) AS r
      FROM nodes nd LEFT JOIN c{i} c ON nd.node = c.node
      CROSS JOIN nn CROSS JOIN d{i}
    )"""
        )
    # ranks iterate on BIGINT node ids (integer shuffles/joins beat
    # string shuffles ~2x at any scale); labels appear only in the
    # final projection
    label = (
        "CASE WHEN node % 2 = 0 THEN 's' || CAST(node // 2 AS VARCHAR) "
        "ELSE 'p' || CAST((node - 1) // 2 AS VARCHAR) END"
    )
    return (
        head
        + ","
        + ",".join(steps)
        + f"\n    SELECT {label} AS node, r AS rank FROM r{iterations}"
    )


@register(
    "pagerank_supply_graph",
    _pagerank_oracle(),
    doc=(
        "3-iteration PageRank over the distinct supplier→part edges of "
        "lineitem (every part node is dangling, so uniform dangling "
        "redistribution is genuinely exercised) — per iteration one "
        "edges⋈ranks equi-join + hash agg, broadcast out-degrees, "
        "one-row dangling aggregate crossed back in, lineage cut with "
        "localCheckpoint (operators/graph.py)"
    ),
)
def pagerank_supply_graph(spark, sf_dir):
    from metar_pipeline_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    # iterate on bigint node ids (suppliers even, parts odd); the
    # human-readable labels are a final-projection concern only
    edges = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    ranks = pagerank(edges, iterations=3, damping=0.85)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("s"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("p"), ((F.col("node") - 1) / 2).cast("long").cast("string")
        )
    )
    return ranks.select(label.alias("node"), "rank")


def _pr_chain(
    prefix: str,
    edges_cte: str,
    nodes_cte: str,
    nn_cte: str,
    od_cte: str,
    iters: int,
    damping: float,
) -> str:
    """One unrolled PageRank chain (c/d/r triple per iteration) over
    pre-named edge/node/count/outdeg CTEs, iterate names
    ``{prefix}0..{prefix}{iters}`` — shared by the cold and warm
    oracles."""
    steps = []
    for i in range(1, iters + 1):
        p = f"{prefix}{i - 1}"
        steps.append(
            f"""
    {prefix}c{i} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(r.r / o.deg AS DECIMAL(38,18))) AS DOUBLE) AS c
      FROM {edges_cte} e JOIN {p} r ON e.src = r.node
                   JOIN {od_cte} o ON e.src = o.src
      GROUP BY e.dst
    ),
    {prefix}d{i} AS (
      SELECT COALESCE(
        CAST(SUM(CAST(r.r AS DECIMAL(38,18))) AS DOUBLE), 0.0) AS dang
      FROM {p} r LEFT JOIN {od_cte} o ON r.node = o.src
      WHERE o.src IS NULL
    ),
    {prefix}{i} AS (
      SELECT nd.node,
             round(CAST({1.0 - damping!r} AS DOUBLE) / {nn_cte}.n
                   + CAST({damping!r} AS DOUBLE)
                     * (COALESCE(c.c, 0.0) + {prefix}d{i}.dang / {nn_cte}.n),
                   12) AS r
      FROM {nodes_cte} nd LEFT JOIN {prefix}c{i} c ON nd.node = c.node
      CROSS JOIN {nn_cte} CROSS JOIN {prefix}d{i}
    )"""
        )
    return ",".join(steps)


def _pagerank_warm_oracle(
    old_iters: int = 2, warm_iters: int = 2, damping: float = 0.85
) -> str:
    """Twin of pagerank_warm_start_delta: cold chain on the pre-delta
    edge set, then a warm chain on the full edge set seeded from the
    old converged ranks (new nodes start uniform)."""
    label = (
        "CASE WHEN nd.node % 2 = 0 THEN 's' || CAST(nd.node // 2 AS VARCHAR) "
        "ELSE 'p' || CAST((nd.node - 1) // 2 AS VARCHAR) END"
    )
    return (
        f"""
    WITH eold AS MATERIALIZED (
      SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
      FROM lineitem WHERE l_orderkey % 5 <> 0
    ),
    n1d AS (SELECT node FROM (
      SELECT src AS node FROM eold UNION SELECT dst FROM eold)),
    nn1 AS (SELECT COUNT(*) AS n FROM n1d),
    od1 AS (SELECT src, COUNT(*) AS deg FROM eold GROUP BY src),
    a0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn1.n AS r
           FROM n1d CROSS JOIN nn1),"""
        + _pr_chain("a", "eold", "n1d", "nn1", "od1", old_iters, damping)
        + f""",
    enew AS MATERIALIZED (
      SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
      FROM lineitem
    ),
    n2d AS (SELECT node FROM (
      SELECT src AS node FROM enew UNION SELECT dst FROM enew)),
    nn2 AS (SELECT COUNT(*) AS n FROM n2d),
    od2 AS (SELECT src, COUNT(*) AS deg FROM enew GROUP BY src),
    b0 AS (
      SELECT nd.node,
             COALESCE(round(o.r, 12), CAST(1.0 AS DOUBLE) / nn2.n) AS r
      FROM n2d nd LEFT JOIN a{old_iters} o ON nd.node = o.node
      CROSS JOIN nn2
    ),"""
        + _pr_chain("b", "enew", "n2d", "nn2", "od2", warm_iters, damping)
        + f"""
    SELECT {label} AS node, o.r AS rank_old, w.r AS rank_warm
    FROM n2d nd
    LEFT JOIN a{old_iters} o ON nd.node = o.node
    JOIN b{warm_iters} w ON nd.node = w.node
    """
    )


@register(
    "pagerank_warm_start_delta",
    _pagerank_warm_oracle(),
    doc=(
        "WARM-START incremental PageRank (round-10 VERDICT optional "
        "#7 — the IVM spirit applied to the fixpoint family): ranks "
        "converge on the pre-delta supply graph (lineitem rows with "
        "l_orderkey % 5 <> 0, 2 iterations — trimmed from 3 per the "
        "round-11 watch-list: the oracle unrolls whatever the query "
        "does, and 2 cold rounds prove the same warm-start contract "
        "for ~2/5 the bench cost), then a 20% edge delta "
        "arrives and the iteration RESTARTS FROM THE OLD RANKS "
        "(graph.pagerank init_ranks; delta-new nodes seed uniform) "
        "for only 2 iterations — the post-delta fixpoint is near the "
        "old one, so the warm chain buys the same accuracy with "
        "fewer edges⋈ranks rounds (Langville & Meyer 2006 ch. 10; "
        "convergence-distance audit vs cold/reference chains pinned "
        "in tests/test_linkanalysis.py). Output carries both the old "
        "rank (NULL for delta-new nodes) and the warm rank; the "
        "oracle replays both chains unrolled with identical "
        "DECIMAL(38,18)/round-12 steps."
    ),
)
def pagerank_warm_start_delta(spark, sf_dir):
    from metar_pipeline_spark.operators.graph import pagerank, pagerank_prep

    li = load_table(spark, sf_dir, "lineitem")
    src = (F.col("l_suppkey") * 2).alias("src")
    dst = (F.col("l_partkey") * 2 + 1).alias("dst")
    # ONE corpus pass + ONE dedup shuffle feed BOTH chains (guide §2.4):
    # the flagged-edge aggregate carries whether any pre-delta row
    # produced the pair, so old_edges = filter(in_old) and all_edges =
    # the frame itself — identical to the two independent
    # scan+distincts it replaces (max-of-flag over the dup group ≡
    # distinct of the filtered rows), ~2 s less fixed cost at sf0.1.
    flagged = (
        li.select(src, dst, (F.col("l_orderkey") % 5 != 0).alias("__old"))
        .groupBy("src", "dst")
        .agg(F.max("__old").alias("__old"))
        .localCheckpoint(eager=True)
    )
    old_edges = flagged.filter(F.col("__old")).select("src", "dst")
    all_edges = flagged.select("src", "dst")
    # Overlap the two independent eager phases (guide §2.6, round 14):
    # the WARM graph's prep (edge checkpoint + node dim of all_edges)
    # is data-independent of the OLD chain's evaluation — profiled
    # ~2.2 s each at sf0.1, previously strictly serialized. Both hang
    # off the already-checkpointed `flagged`, results are the exact
    # same frames either way (the pool only reorders eager
    # materializations of independent subtrees).
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    # the previous cycle's converged state (in production: the rank
    # store); consumed by the warm seed AND the output join
    def _old_chain():
        return pagerank(
            old_edges, iterations=2, pre_deduped=True
        ).localCheckpoint(eager=True)

    def _warm_prep():
        return pagerank_prep(all_edges, pre_deduped=True)

    t_old = inheritable_thread_target(_old_chain)
    t_prep = inheritable_thread_target(_warm_prep)
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_old = pool.submit(t_old)
        f_prep = pool.submit(t_prep)
        r_old = f_old.result()
        prep_all = f_prep.result()
    r_warm = pagerank(
        all_edges, iterations=2, init_ranks=r_old, pre_deduped=True,
        prep=prep_all,
    )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("s"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("p"), ((F.col("node") - 1) / 2).cast("long").cast("string")
        )
    )
    return (
        r_warm.withColumnRenamed("rank", "rank_warm")
        .join(
            r_old.withColumnRenamed("rank", "rank_old"), "node", "left"
        )
        .select(label.alias("node"), "rank_old", "rank_warm")
    )


# ---------------------------------------------------------------------------
# M4 time-series downsampling (min/max/first/last per bucket)
# ---------------------------------------------------------------------------
_T0MS = 1704067200000  # 2024-01-01T00:00:00Z in epoch millis


@register(
    "m4_downsample_value",
    f"""
    WITH k AS (
      SELECT event_type, value,
             (epoch_ms(ts) - {_T0MS}) // 21600000 AS b,
             (epoch_ms(ts) - {_T0MS}) * 1000000 + event_id AS okey
      FROM events
    )
    SELECT event_type,
           make_timestamp(({_T0MS} + b * 21600000) * 1000) AS bucket_start,
           COUNT(*) AS n,
           MIN(value) AS v_min,
           MAX(value) AS v_max,
           arg_min(value, okey) AS v_first,
           arg_max(value, okey) AS v_last
    FROM k GROUP BY event_type, b
    """,
    doc=(
        "M4 chart downsampling: per (series, 6h bucket) the min / max "
        "/ first / last values — the four points that preserve a "
        "line-chart's visual extremes (Jugel et al., M4). ONE hash "
        "aggregate over the scan (arg_min/arg_max = min_by/max_by on "
        "a composite millis+id ordering key, so ties are total); at "
        "100 TB this is how a dashboard reads a trillion-point series"
    ),
)
def m4_downsample_value(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp")) - F.lit(_T0MS)
    # composite total-order key: millis then event_id (event_id stays
    # below the 1e6 multiplier through sf0.1; the oracle uses the
    # identical arithmetic)
    okey = ms * F.lit(1000000) + F.col("event_id")
    b = F.floor(ms / F.lit(21600000)).alias("b")
    k = events.select("event_type", "value", b, okey.alias("okey"))
    return (
        k.groupBy("event_type", "b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min_by("value", F.col("okey")).alias("v_first"),
            F.max_by("value", F.col("okey")).alias("v_last"),
        )
        .select(
            "event_type",
            F.timestamp_millis(
                F.lit(_T0MS) + F.col("b") * F.lit(21600000)
            ).alias("bucket_start"),
            "n",
            "v_min",
            "v_max",
            "v_first",
            "v_last",
        )
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling without replacement (A-ES)
# ---------------------------------------------------------------------------


@register(
    "weighted_sample_docs",
    """
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln(((doc_id * 2654435761) % 4294967296 + 0.5)
                / 4294967296.0) / n_chars AS skey
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, round(skey, 10) AS sample_key,
           CAST(ROW_NUMBER() OVER (ORDER BY skey DESC, doc_id)
                AS INTEGER) AS rank
    FROM keyed
    QUALIFY rank <= 50
    """,
    doc=(
        "Efraimidis-Spirakis weighted sampling without replacement "
        "(weight = document length), derandomized: the uniform draw is "
        "a multiplicative integer hash of the key, so the SAME sample "
        "falls out on any engine, partitioning, or rerun — top-k by "
        "ln(u)/w is a scan + bounded top-k (WindowGroupLimit), no "
        "global sort, no RNG state"
    ),
)
def weighted_sample_docs(spark, sf_dir):
    from metar_pipeline_spark.operators.ranking import rank_bounded

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars") > 0
    )
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id", "n_chars", (F.log(u) / F.col("n_chars")).alias("skey")
    )
    # top-50 via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps over the corpus-sized keyed frame); rank_bounded orders
    # only the 50 survivors — row-identical, window-free
    return (
        rank_bounded(
            keyed.orderBy(F.desc("skey"), F.asc("doc_id")).limit(50),
            [-F.col("skey"), F.col("doc_id")],
        )
        .select(
            "doc_id",
            "n_chars",
            F.round("skey", 10).alias("sample_key"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (additive rollup merge)
# ---------------------------------------------------------------------------


@register(
    "rollup_incremental_merge",
    """
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc=(
        "Incremental MV maintenance: the stored daily rollup (events "
        "before the watermark) merges with the new batch's partial "
        "(events after) by union + ONE key-grain re-aggregation "
        "(operators/incremental.merge_partial_rollups) — additive "
        "DECIMAL partials make merged == full-recompute EXACT, which "
        "is what the oracle asserts; history is never rescanned"
    ),
)
def rollup_incremental_merge(spark, sf_dir):
    from metar_pipeline_spark.operators.incremental import (
        merge_partial_rollups,
    )

    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")

    def partial(df):
        return df.groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )

    stored = partial(events.filter(F.col("ts") < cutoff))
    batch = partial(events.filter(F.col("ts") >= cutoff))
    merged = merge_partial_rollups(
        [stored, batch], ["event_type", "day"], ["n_events", "sum_value"]
    )
    return merged.select(
        "event_type",
        "day",
        "n_events",
        F.round(F.col("sum_value").cast("double"), 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Keyed table diff (migration/backfill reconciliation)
# ---------------------------------------------------------------------------


@register(
    "table_diff_orders_replica",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS s
      FROM orders
    ),
    kept AS (
      SELECT k, CASE WHEN k % 7 = 0 THEN p + 1 ELSE p END AS p, s
      FROM base WHERE k % 5 <> 0
    ),
    added AS (
      SELECT k + 10000000 AS k, p, s FROM base WHERE k % 11 = 0
    ),
    r AS (SELECT * FROM kept UNION ALL SELECT * FROM added),
    d AS (
      SELECT COALESCE(b.k, r.k) AS k,
             CASE WHEN b.k IS NULL THEN 'added'
                  WHEN r.k IS NULL THEN 'removed'
                  WHEN b.p IS NOT DISTINCT FROM r.p
                   AND b.s IS NOT DISTINCT FROM r.s THEN 'identical'
                  ELSE 'changed' END AS status
      FROM base b FULL OUTER JOIN r ON b.k = r.k
    ),
    c AS (SELECT status, COUNT(*) AS n_keys FROM d GROUP BY status),
    sm AS (
      SELECT status,
             string_agg(CAST(k AS VARCHAR), ',' ORDER BY k)
               AS example_keys
      FROM (SELECT status, k,
                   row_number() OVER (PARTITION BY status ORDER BY k)
                     AS rn
            FROM d)
      WHERE rn <= 3 GROUP BY status
    )
    SELECT c.status, c.n_keys, sm.example_keys
    FROM c LEFT JOIN sm USING (status)
    """,
    doc=(
        "data-diff-style reconciliation of orders vs a perturbed "
        "replica (every 5th key dropped, every 7th repriced, every "
        "11th re-keyed as new): both sides reduce to (key, xxhash64 "
        "row digest) BEFORE the single full-outer shuffle — two hashes "
        "per row cross the wire, never payloads — then added/removed/"
        "changed/identical is column math with bounded per-class "
        "example keys (operators/diffing.py; the oracle compares "
        "columns directly, so the digest equivalence is itself under "
        "test)"
    ),
)
def table_diff_orders_replica(spark, sf_dir):
    from metar_pipeline_spark.operators.diffing import table_diff_summary

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    k = F.col("o_orderkey")
    kept = base.filter(k % 5 != 0).withColumn(
        "o_totalprice",
        F.when(k % 7 == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    added = base.filter(k % 11 == 0).withColumn(
        "o_orderkey", k + 10000000
    )
    replica = kept.unionByName(added)
    return table_diff_summary(
        base, replica, ["o_orderkey"], sample_per_class=3
    ).withColumnRenamed("o_orderkey", "k")


# ---------------------------------------------------------------------------
# Robust statistics: per-group median absolute deviation + outliers
# ---------------------------------------------------------------------------


@register(
    "robust_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, med.m,
             abs(e.value - med.m) AS ad
      FROM events e JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, m, quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY event_type, m
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           round(mad.m, 6) AS median_value,
           round(mad.mad, 6) AS mad,
           -- CAST to DOUBLE first: a bare 3 * 1.4826 would be DECIMAL
           -- arithmetic in DuckDB but IEEE double on the Spark side,
           -- and the two can differ in the last ulp at the threshold
           CAST(SUM(CASE WHEN d.ad > CAST(3 AS DOUBLE)
                                     * CAST(1.4826 AS DOUBLE) * mad.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type, mad.m, mad.mad
    """,
    doc=(
        "Robust per-group dispersion: median absolute deviation and a "
        "3-sigma-equivalent outlier count (MAD * 1.4826 consistency "
        "constant) — two exact interpolated-percentile passes with the "
        "5-row median frame broadcast back against the scan; the "
        "robust alternative to stats_moments_exact when heavy tails "
        "would poison mean/stddev gates"
    ),
)
def robust_mad_outliers(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "m",
        F.abs(F.col("value") - F.col("m")).alias("ad"),
    )
    mad = dev.groupBy("event_type", "m").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    out = (
        dev.join(F.broadcast(mad.drop("m")), "event_type")
        .groupBy("event_type", "m", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("ad") > F.lit(3) * F.lit(1.4826) * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )
    return out.select(
        "event_type",
        "n",
        F.round("m", 6).alias("median_value"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
    )


# ---------------------------------------------------------------------------
# User-journey Markov transitions (event-type transition matrix)
# ---------------------------------------------------------------------------


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, SUM(n) AS row_n FROM t GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           round(CAST(t.n AS DOUBLE) / tot.row_n, 6) AS p
    FROM t JOIN tot USING (from_type)
    """,
    doc=(
        "First-order Markov transition matrix of the user journey: "
        "LEAD over (user, time) pairs consecutive events — ONE window "
        "pass sharing its user_id exchange, then a 25-cell hash agg; "
        "row-normalized probabilities say where users go next from "
        "each state (event_id tiebreak makes tied timestamps total)"
    ),
)
def event_transition_matrix(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = t.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return t.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day active users (exact sliding distinct)
# ---------------------------------------------------------------------------


@register(
    "rolling_7d_active_users",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud)
    SELECT d.day,
           COUNT(DISTINCT u.user_id) AS active_7d
    FROM days d JOIN ud u
      ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
    doc=(
        "Exact trailing-7-day active users: events reduce to the "
        "user-day grain FIRST (the big cardinality drop), then each "
        "calendar day joins its 7-day window of user-days and counts "
        "distinct — the x7 amplification happens on the small deduped "
        "grain, never the raw events, and sliding count-distinct "
        "(which no window frame supports) becomes a plain join+agg; "
        "the HLL sketch variant (operators/sketches.py) is the "
        "approximate fallback when even user-day is too big"
    ),
)
def rolling_7d_active_users(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    j = days.alias("d").join(
        ud.alias("u"),
        (F.col("u.day") >= F.expr("d.day - INTERVAL 6 DAYS"))
        & (F.col("u.day") <= F.col("d.day")),
    )
    return (
        j.groupBy(F.col("d.day").alias("day"))
        .agg(F.count_distinct(F.col("u.user_id")).alias("active_7d"))
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (trend + day-of-week seasonality + residual)
# ---------------------------------------------------------------------------


@register(
    "seasonal_decompose_daily",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             round(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
                   / COUNT(*), 6) AS v
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT day, v,
             round(CAST(SUM(CAST(v AS DECIMAL(38,10))) OVER (
                     ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                   ) AS DOUBLE)
                   / COUNT(*) OVER (
                     ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                   ), 6) AS trend
      FROM daily
    ),
    season AS (
      SELECT dayofweek(day) AS dow,
             round(CAST(SUM(CAST(v - trend AS DECIMAL(38,10)))
                        AS DOUBLE) / COUNT(*), 6) AS seasonal
      FROM tr GROUP BY 1
    )
    SELECT tr.day, tr.v, tr.trend, s.seasonal,
           round(tr.v - tr.trend - s.seasonal, 6) AS residual
    FROM tr JOIN season s ON dayofweek(tr.day) = s.dow
    """,
    doc=(
        "Additive seasonal decomposition of the daily series: trend = "
        "centered 7-day moving average (DECIMAL window sums), "
        "seasonality = mean detrended value per day-of-week (a 7-row "
        "broadcast frame), residual = the rest — the classical-"
        "decomposition recipe as three cheap passes; the calendar-"
        "bounded window partitions make the global window safe at any "
        "fact size"
    ),
)
def seasonal_decompose_daily(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.round(_dsum(F.col("value"), DEC10) / F.count(F.lit(1)), 6).alias(
            "v"
        )
    )
    wt = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "v",
        F.round(
            F.sum(F.col("v").cast("decimal(38,10)")).over(wt).cast("double")
            / F.count(F.lit(1)).over(wt),
            6,
        ).alias("trend"),
    )
    season = tr.groupBy(F.dayofweek("day").alias("dow")).agg(
        F.round(
            F.sum((F.col("v") - F.col("trend")).cast("decimal(38,10)"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("seasonal")
    )
    return (
        tr.join(
            F.broadcast(season), F.dayofweek(tr["day"]) == season["dow"]
        )
        .select(
            "day",
            "v",
            "trend",
            "seasonal",
            F.round(
                F.col("v") - F.col("trend") - F.col("seasonal"), 6
            ).alias("residual"),
        )
    )


# ---------------------------------------------------------------------------
# Partition-scoped backfill (dynamic partition overwrite)
# ---------------------------------------------------------------------------


@register(
    "dynamic_partition_backfill",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc=(
        "Late-data repair via dynamic partition overwrite: the daily "
        "rollup store (partitionBy day) is built without a "
        "deterministic 'late' slice, then the late batch's distinct "
        "days drive a partition-scoped recompute whose overwrite "
        "rewrites ONLY those day-partitions (sources/backfill.py; "
        "untouched partitions keep their exact files, asserted "
        "byte-for-byte in tests). The repaired store read back must "
        "equal the full-recompute oracle"
    ),
)
def dynamic_partition_backfill(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from metar_pipeline_spark.sources.backfill import (
        overwrite_affected_partitions,
    )

    events = load_table(spark, sf_dir, "events")
    # the late slice: half of the last 3 days' events arrive after the
    # store was built
    is_late = (F.col("ts") >= F.lit("2024-01-28").cast("timestamp")) & (
        F.col("event_id") % 2 == 0
    )

    def rollup(df):
        return df.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
        )

    tmp = tempfile.mkdtemp(prefix="backfill_")
    store = os.path.join(tmp, "rollup")
    try:
        rollup(events.filter(~is_late)).write.partitionBy("day").parquet(
            store
        )
        late = events.filter(is_late)
        affected = late.select(
            F.to_date(F.date_trunc("day", "ts")).alias("day")
        ).distinct()
        # partition-scoped recompute: only the affected days' slice of
        # the fact (at scale: a day-pruned scan), on-time + late
        repaired = rollup(
            events.join(
                F.broadcast(affected),
                F.to_date(F.date_trunc("day", "ts")) == affected["day"],
                "leftsemi",
            )
        )
        overwrite_affected_partitions(spark, repaired, store, "day")
        result = (
            spark.read.parquet(store)
            .select(
                F.col("day").cast("date").alias("day"),
                "event_type",
                "n_events",
                F.round(F.col("sum_dec").cast("double"), 2).alias(
                    "sum_value"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return result


@register(
    "table_fingerprint_orders",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(('0x' || substr(md5(
                 CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(o_custkey AS VARCHAR) || '|' ||
                 coalesce(o_orderstatus, '<N>') || '|' ||
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
               ), 1, 8))::BIGINT) % 2147483647 AS BIGINT)
               AS content_fingerprint
    FROM orders
    """,
    doc=(
        "Order-insensitive table fingerprint: SUM of per-row 32-bit "
        "content digests (md5 over a canonical '|'-joined rendering, "
        "doubles via DECIMAL so both engines print identical text), "
        "reduced mod the Mersenne prime 2^31-1 — two tables are "
        "byte-equal iff (n_rows, fingerprint) agree up to digest "
        "collisions; the O(1)-output companion to the per-key "
        "table_diff, cheap enough to run after every copy/backfill. "
        "The sum accumulates in 128-bit (DECIMAL(38,0) / HUGEINT) so "
        "it never overflows int64 regardless of row count; only the "
        "mod-reduced value is cast back. Commutative sum => "
        "partition-order free; rides the scan with one partial+final "
        "agg."
    ),
)
def table_fingerprint_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.coalesce(F.col("o_orderstatus"), F.lit("<N>")),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("bigint")
    return orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(h.cast("decimal(38,0)")) % F.lit(2147483647))
        .cast("bigint")
        .alias("content_fingerprint"),
    )


@register(
    "linear_attribution_revenue",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pt, value
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, event_type, ts AS tt
      FROM events WHERE event_type IN ('view', 'click')
    ), j AS (
      SELECT p.pid, p.value, t.event_type
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.tt >= p.pt - INTERVAL 1 HOUR AND t.tt < p.pt
    ), n AS (
      SELECT pid, COUNT(*) AS c FROM j GROUP BY pid
    ), shares AS (
      SELECT j.event_type, j.value / n.c AS share
      FROM j JOIN n USING (pid)
    )
    SELECT event_type AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           round(CAST(SUM(CAST(share AS DECIMAL(38,10))) AS DOUBLE), 2)
               AS attributed_revenue
    FROM shares GROUP BY 1
    UNION ALL
    SELECT 'direct',
           CAST(COUNT(*) AS BIGINT),
           round(CAST(SUM(CAST(value AS DECIMAL(38,10))) AS DOUBLE), 2)
    FROM p WHERE pid NOT IN (SELECT pid FROM n)
    """,
    doc=(
        "Linear multi-touch attribution: each purchase's value split "
        "equally across the user's view/click touches in the "
        "preceding hour; untouched purchases fall to 'direct'. The "
        "touch join is a per-user equi-join (cardinality bounded by "
        "per-user activity) + time filter — never a theta cross "
        "join; shares accumulate in DECIMAL"
    ),
)
def linear_attribution_revenue(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pt"),
        "value",
    )
    t = events.filter(
        F.col("event_type").isin("view", "click")
    ).select("user_id", "event_type", F.col("ts").alias("tt"))
    j = p.join(t, "user_id").filter(
        (F.col("tt") >= F.col("pt") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("tt") < F.col("pt"))
    )
    n = j.groupBy("pid").agg(F.count(F.lit(1)).alias("c"))
    shares = j.join(n, "pid").select(
        "event_type", (F.col("value") / F.col("c")).alias("share")
    )
    touched = shares.groupBy(
        F.col("event_type").alias("touch_type")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.round(
            F.sum(F.col("share").cast(dec)).cast("double"), 2
        ).alias("attributed_revenue"),
    )
    direct = (
        p.join(n.select("pid"), "pid", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.round(
                F.sum(F.col("value").cast(dec)).cast("double"), 2
            ).alias("attributed_revenue"),
        )
        .select(
            F.lit("direct").alias("touch_type"),
            "n_touches",
            "attributed_revenue",
        )
    )
    return touched.unionByName(direct)


@register(
    "funnel_time_boxed_24h",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
       AND e.ts >= s1.t1
       AND CAST(floor(epoch(e.ts)) AS BIGINT)
           <= CAST(floor(epoch(s1.t1)) AS BIGINT) + 86400
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
       AND e.ts >= s2.t2
       AND CAST(floor(epoch(e.ts)) AS BIGINT)
           <= CAST(floor(epoch(s2.t2)) AS BIGINT) + 86400
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    c AS (
      SELECT (SELECT COUNT(*) FROM s1) AS c0,
             (SELECT COUNT(*) FROM s2) AS c1,
             (SELECT COUNT(*) FROM s3) AS c2
    )
    SELECT * FROM (
      SELECT 0 AS step_idx, 'view' AS step, c0 AS users_reached,
             round(CAST(c0 AS DOUBLE) / NULLIF(c0, 0), 6) AS conv_from_first,
             round(CAST(c0 AS DOUBLE) / NULLIF(c0, 0), 6) AS conv_from_prev
      FROM c
      UNION ALL
      SELECT 1, 'click', c1,
             round(CAST(c1 AS DOUBLE) / NULLIF(c0, 0), 6),
             round(CAST(c1 AS DOUBLE) / NULLIF(c0, 0), 6) FROM c
      UNION ALL
      SELECT 2, 'purchase', c2,
             round(CAST(c2 AS DOUBLE) / NULLIF(c0, 0), 6),
             round(CAST(c2 AS DOUBLE) / NULLIF(c1, 0), 6) FROM c
    ) ORDER BY step_idx
    """,
    doc=(
        "Time-boxed funnel: each step must land within 24h of the "
        "previous one (the form product funnels actually use — an "
        "unbounded funnel credits conversions months later). Same "
        "one-aggregation-pass shape; the gap bound only changes the "
        "per-element filter predicate."
    ),
)
def funnel_time_boxed_24h(spark, sf_dir):
    from metar_pipeline_spark.operators.funnel import funnel_summary

    events = load_table(spark, sf_dir, "events")
    return funnel_summary(
        events,
        ["view", "click", "purchase"],
        max_gap_seconds=86400,
    ).select(
        "step_idx",
        "step",
        F.col("users_reached").cast("bigint").alias("users_reached"),
        "conv_from_first",
        "conv_from_prev",
    )


@register(
    "event_cooccurrence_pmi",
    """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), nu AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n FROM events
    ), m AS (
      SELECT event_type, COUNT(*) AS c FROM ut GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS c_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.c_ab AS BIGINT) AS n_users_both,
           round(p.c_ab * nu.n / (ma.c * mb.c), 6) AS lift,
           round(ln(p.c_ab * nu.n / (ma.c * mb.c)), 6) AS pmi
    FROM pairs p
    JOIN m ma ON ma.event_type = p.type_a
    JOIN m mb ON mb.event_type = p.type_b
    CROSS JOIN nu
    """,
    doc=(
        "Association mining: pointwise mutual information / lift for "
        "every event-type pair co-occurring in a user's history. The "
        "user-grain distinct FIRST (the deduped grain bounds the "
        "self-join at types-per-user, not events-per-user), then a "
        "per-user pair join against a broadcast marginal table — "
        "market-basket analysis that survives 100 TB because the "
        "exploded grain is |users| x |distinct types|, never raw "
        "events squared."
    ),
)
def event_cooccurrence_pmi(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    nu = events.agg(
        F.count_distinct("user_id").cast("double").alias("n")
    )
    m = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ratio = (
        F.col("c_ab")
        * F.col("n")
        / (F.col("ca") * F.col("cb"))
    )
    return (
        pairs.join(
            F.broadcast(
                m.select(
                    F.col("event_type").alias("type_a"),
                    F.col("c").alias("ca"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                m.select(
                    F.col("event_type").alias("type_b"),
                    F.col("c").alias("cb"),
                )
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(nu))
        .select(
            "type_a",
            "type_b",
            F.col("c_ab").cast("bigint").alias("n_users_both"),
            F.round(ratio, 6).alias("lift"),
            F.round(F.log(ratio), 6).alias("pmi"),
        )
    )


@register(
    "partition_fingerprints_events",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(('0x' || substr(md5(
                 CAST(event_id AS VARCHAR) || '|' ||
                 CAST(user_id AS VARCHAR) || '|' ||
                 coalesce(event_type, '<N>') || '|' ||
                 CAST(CAST(value AS DECIMAL(18,6)) AS VARCHAR)
               ), 1, 8))::BIGINT) % 2147483647 AS BIGINT) AS fingerprint
    FROM events GROUP BY 1
    """,
    doc=(
        "Merkle-style per-partition fingerprints: the table-level "
        "content digest (table_fingerprint_orders) at day grain, so a "
        "copy/backfill mismatch is LOCALIZED to the divergent day "
        "partitions instead of one table-wide boolean — compare two "
        "sides' day rows, recompute only where they differ. Digest "
        "sums accumulate in 128-bit and reduce mod 2^31-1 (int64-safe "
        "at any partition size). Commutative per-day digest sums "
        "combine map-side; one agg on the scan."
    ),
)
def partition_fingerprints_events(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    canon = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.coalesce(F.col("event_type"), F.lit("<N>")),
        F.col("value").cast("decimal(18,6)").cast("string"),
    )
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("bigint")
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(h.cast("decimal(38,0)")) % F.lit(2147483647))
        .cast("bigint")
        .alias("fingerprint"),
    )


@register(
    "activity_gini_coefficient",
    """
    WITH c AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ), r AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS i FROM c
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS total,
             CAST(SUM((2 * i - (SELECT COUNT(*) FROM r) - 1) * n) AS BIGINT)
                 AS wsum
      FROM r
    )
    SELECT k AS n_users, total AS n_events,
           round(CAST(wsum AS DOUBLE) / (CAST(k AS DOUBLE) * total), 6)
               AS gini
    FROM t
    """,
    doc=(
        "Gini coefficient of per-user event concentration (0 = "
        "uniform, ->1 = one user dominates) via the sorted-rank "
        "formula sum((2i-k-1)·x_i)/(k·sum x) — all-integer weighted "
        "sum, one rank window over the USER-grain aggregate (|users| "
        "rows, never events). The concentration audit that decides "
        "whether per-key skew handling is needed at all."
    ),
)
def activity_gini_coefficient(spark, sf_dir):
    from metar_pipeline_spark.operators.ranking import distributed_rank

    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    # exact global rank over the USER-grain frame via distributed_rank
    # (range exchange + partitioned window) — user grain is 10⁸–10⁹
    # rows at 100 TB, so no unpartitioned window anywhere; the total
    # count rides in on a broadcast single-row aggregate
    kdf = c.agg(F.count(F.lit(1)).alias("k"))
    r = distributed_rank(
        c, [F.asc("n"), F.asc("user_id")], rank_col="i"
    ).crossJoin(F.broadcast(kdf))
    return r.agg(
        F.max("k").cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.round(
            F.sum(
                (F.lit(2) * F.col("i") - F.col("k") - 1) * F.col("n")
            ).cast("double")
            / (F.max("k").cast("double") * F.sum("n")),
            6,
        ).alias("gini"),
    )


@register(
    "source_mix_entropy",
    """
    WITH c AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total,
                    CAST(COUNT(*) AS BIGINT) AS k FROM c)
    SELECT k AS n_sources,
           round(CAST(SUM(-(n / total) * ln(n / total)) AS DOUBLE), 6)
               AS shannon_entropy,
           round(CAST(SUM(-(n / total) * ln(n / total)) AS DOUBLE)
                 / ln(CAST(k AS DOUBLE)), 6) AS evenness
    FROM c, t GROUP BY k
    """,
    doc=(
        "Dataset-card diversity: Shannon entropy of the source mix and "
        "Pielou evenness (entropy / ln k; 1 = perfectly balanced "
        "domains) — the one-number balance check before mixture "
        "sampling. One count aggregate; the entropy sum runs over the "
        "|sources|-row marginal."
    ),
)
def source_mix_entropy(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    p = F.col("n") / F.col("total")
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("k")
        .agg(
            F.round(F.sum(-p * F.log(p)).cast("double"), 6).alias(
                "shannon_entropy"
            ),
            F.round(
                F.sum(-p * F.log(p)).cast("double")
                / F.log(F.col("k").cast("double")),
                6,
            ).alias("evenness"),
        )
        .select(
            F.col("k").alias("n_sources"), "shannon_entropy", "evenness"
        )
    )


@register(
    "conversion_time_percentiles",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id,
             MIN(CAST(floor(epoch(e.ts)) AS BIGINT)
                 - CAST(floor(epoch(v.t_view)) AS BIGINT)) AS secs
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts >= v.t_view
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
           CAST(MIN(secs) AS BIGINT) AS p0_secs,
           CAST(round(quantile_cont(secs, 0.5), 0) AS BIGINT) AS p50_secs,
           CAST(round(quantile_cont(secs, 0.9), 0) AS BIGINT) AS p90_secs,
           CAST(MAX(secs) AS BIGINT) AS p100_secs
    FROM p
    """,
    doc=(
        "Time-to-convert distribution: per converting user, seconds "
        "from first view to first subsequent purchase, summarized as "
        "min/median/p90/max (exact interpolated percentiles rounded to "
        "whole seconds — integer in, integer out, so interpolation "
        "half-cases cannot drift between engines). Two user-grain "
        "aggregates; the join is per-user equi."
    ),
)
def conversion_time_percentiles(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    t = F.col("ts").cast("timestamp").cast("long")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(t).alias("t_view"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", t.alias("t_p"))
        .join(v, "user_id")
        .filter(F.col("t_p") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min(F.col("t_p") - F.col("t_view")).alias("secs"))
    )
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converters"),
        F.min("secs").cast("bigint").alias("p0_secs"),
        F.round(F.expr("percentile(secs, 0.5)"), 0)
        .cast("bigint")
        .alias("p50_secs"),
        F.round(F.expr("percentile(secs, 0.9)"), 0)
        .cast("bigint")
        .alias("p90_secs"),
        F.max("secs").cast("bigint").alias("p100_secs"),
    )


@register(
    "value_decile_concentration",
    """
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY user_id
    ), d AS (
      SELECT total, NTILE(10) OVER (ORDER BY total DESC, user_id) AS decile
      FROM u
    ), t AS (
      SELECT CAST(SUM(CAST(total AS DECIMAL(38,10))) AS DOUBLE)
                 AS grand FROM u
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(CAST(total AS DECIMAL(38,10))) AS DOUBLE), 2)
               AS decile_value,
           round(CAST(SUM(CAST(total AS DECIMAL(38,10))) AS DOUBLE)
                 / t.grand, 6) AS share_of_total
    FROM d, t GROUP BY decile, t.grand
    """,
    doc=(
        "Pareto concentration curve: users ranked into value deciles "
        "(top decile first), per-decile share of total value — the "
        "80/20 curve that pairs with the Gini scalar. The ntile runs "
        "on the USER-grain aggregate; DECIMAL sums end to end."
    ),
)
def value_decile_concentration(spark, sf_dir):
    from metar_pipeline_spark.operators.ranking import (
        distributed_rank,
        ntile_from_rank,
    )

    events = load_table(spark, sf_dir, "events")
    u = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total")
    )
    # NTILE over the user-grain frame without an unpartitioned window:
    # exact distributed rank + the closed-form ntile (bit-identical to
    # the window NTILE the oracle runs)
    t = u.agg(
        F.sum(F.col("total").cast("decimal(38,10)"))
        .cast("double")
        .alias("grand"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    d = (
        distributed_rank(
            u, [F.desc("total"), F.asc("user_id")], rank_col="__r"
        )
        .crossJoin(F.broadcast(t.select("__n")))
        .withColumn(
            "decile", ntile_from_rank(F.col("__r"), F.col("__n"), 10)
        )
    )
    t = t.select("grand")
    return (
        d.crossJoin(F.broadcast(t))
        .groupBy("decile", "grand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(
                F.sum(F.col("total").cast("decimal(38,10)")).cast(
                    "double"
                ),
                2,
            ).alias("decile_value"),
            F.round(
                F.sum(F.col("total").cast("decimal(38,10)")).cast(
                    "double"
                )
                / F.col("grand"),
                6,
            ).alias("share_of_total"),
        )
        .drop("grand")
    )


@register(
    "skyline_price_date_frontier",
    """
    WITH per_day AS (
      SELECT o_orderdate AS day,
             CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS best_price,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT day, best_price, n_orders,
             MIN(best_price) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_best
      FROM per_day
    )
    SELECT CAST(day AS DATE) AS day,
           round(CAST(best_price AS DOUBLE), 2) AS best_price,
           round(CAST(prev_best AS DOUBLE), 2) AS prev_best,
           round(CAST(coalesce(prev_best - best_price, 0)
                      AS DOUBLE), 2) AS improvement,
           n_orders
    FROM c
    WHERE prev_best IS NULL OR best_price < prev_best
    """,
    doc=(
        "Pareto-skyline frontier (minimize order date, minimize "
        "price): the orders no other order dominates on both axes — "
        "the classic SKYLINE operator reduced to one date-grain MIN "
        "agg (map-side partial, fact scanned once) plus a strict "
        "running-min window over the calendar-bounded day table; the "
        "100 TB fact never feeds a pairwise dominance join. DECIMAL "
        "min/compare keeps the frontier test exact; doubles appear "
        "only rounded at the output."
    ),
)
def skyline_price_date_frontier(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    per_day = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.min(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("best_price"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = per_day.withColumn("prev_best", F.min("best_price").over(w))
    return c.filter(
        F.col("prev_best").isNull()
        | (F.col("best_price") < F.col("prev_best"))
    ).select(
        "day",
        F.round(F.col("best_price").cast("double"), 2).alias("best_price"),
        F.round(F.col("prev_best").cast("double"), 2).alias("prev_best"),
        F.round(
            F.coalesce(
                F.col("prev_best") - F.col("best_price"), F.lit(0)
            ).cast("double"),
            2,
        ).alias("improvement"),
        "n_orders",
    )


@register(
    "record_linkage_parts",
    """
    WITH t AS (
      SELECT p_partkey, p_brand,
             CAST(floor(p_size / 10) AS BIGINT) AS szb,
             p_type, p_size, p_retailprice,
             list_distinct(string_split(p_name, ' ')) AS toks
      FROM part
    )
    SELECT id_a, id_b, name_jaccard,
           round(4.0 * name_jaccard + te + se + pe, 6) AS score
    FROM (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             round(len(list_intersect(a.toks, b.toks))
                   / greatest(len(a.toks) + len(b.toks)
                              - len(list_intersect(a.toks, b.toks)), 1),
                   6) AS name_jaccard,
             CASE WHEN a.p_type = b.p_type THEN 2.0 ELSE 0.0 END AS te,
             CASE WHEN abs(a.p_size - b.p_size) <= 2 THEN 1.0 ELSE 0.0 END AS se,
             CASE WHEN abs(a.p_retailprice - b.p_retailprice) <= 1.0
                  THEN 1.0 ELSE 0.0 END AS pe
      FROM t a JOIN t b
        ON a.p_brand = b.p_brand AND a.szb = b.szb
       AND a.p_partkey < b.p_partkey
    )
    WHERE round(4.0 * name_jaccard + te + se + pe, 6) >= 5.0
    """,
    doc=(
        "Fellegi-Sunter record linkage over the part catalog: blocked "
        "on (brand, size decade), scored on name-token Jaccard (w=4) + "
        "type equality (w=2) + size/price tolerance (w=1 each), "
        "threshold 5.0 — the structured-record sibling of document "
        "near-dup (operators/linkage.py)"
    ),
)
def record_linkage_parts(spark, sf_dir):
    from metar_pipeline_spark.operators.linkage import record_linkage_pairs

    part = load_table(spark, sf_dir, "part")
    return record_linkage_pairs(
        part,
        "p_partkey",
        ["p_brand", F.floor(F.col("p_size") / 10).cast("bigint")],
        "p_name",
        name_weight=4.0,
        exact_cols=[("p_type", 2.0)],
        numeric_cols=[("p_size", 2.0, 1.0), ("p_retailprice", 1.0, 1.0)],
        min_score=5.0,
    )


def _bfs_oracle(max_hops: int = 4) -> str:
    """Unrolled-CTE twin of operators/graph.bfs_min_hops: one
    (frontier, visited) CTE pair per level over the UNDIRECTED
    supplier↔part edge set; NOT IN replays the anti-join (node ids are
    never NULL, so NOT IN is safe)."""
    head = """
    WITH ed AS (
      SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
      FROM lineitem
      UNION
      SELECT DISTINCT l_partkey * 2 + 1 AS src, l_suppkey * 2 AS dst
      FROM lineitem
    ),
    v0 AS (SELECT s_suppkey * 2 AS node, 0 AS hop
           FROM supplier WHERE s_suppkey < 3)"""
    steps = []
    for h in range(1, max_hops + 1):
        steps.append(
            f"""
    f{h} AS (
      SELECT DISTINCT e.dst AS node
      FROM ed e JOIN v{h - 1} v ON e.src = v.node
      WHERE e.dst NOT IN (SELECT node FROM v{h - 1})
    ),
    v{h} AS (
      SELECT node, hop FROM v{h - 1}
      UNION ALL
      SELECT node, {h} AS hop FROM f{h}
    )"""
        )
    label = (
        "CASE WHEN node % 2 = 0 THEN 's' || CAST(node // 2 AS VARCHAR) "
        "ELSE 'p' || CAST((node - 1) // 2 AS VARCHAR) END"
    )
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT {label} AS node, CAST(hop AS INTEGER) AS hop
    FROM v{max_hops}"""
    )


@register(
    "supply_bfs_hops",
    _bfs_oracle(),
    doc=(
        "BFS minimum hop distance over the undirected supplier↔part "
        "graph of lineitem, seeded at suppliers {1, 2} — the "
        "frontier-expansion shape beside the fixpoint iterators "
        "(pagerank/LPA): per level one frontier⋈edges equi-join + "
        "distinct + anti-join vs the visited set, node-grain frames "
        "checkpointed per round, early exit on an empty frontier "
        "(operators/graph.bfs_min_hops)"
    ),
)
def supply_bfs_hops(spark, sf_dir):
    from metar_pipeline_spark.operators.graph import bfs_min_hops

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    fwd = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    seeds = sup.filter(F.col("s_suppkey") < 3).select(
        (F.col("s_suppkey") * 2).alias("node")
    )
    hops = bfs_min_hops(edges, seeds, max_hops=4)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("s"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("p"), ((F.col("node") - 1) / 2).cast("long").cast("string")
        )
    )
    return hops.select(label.alias("node"), F.col("hop").cast("int").alias("hop"))


@register(
    "ivm_delta_join_view",
    """
    WITH c_old AS (
      SELECT c_custkey, c_acctbal AS acctbal FROM customer
    ),
    c_new AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 89 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS acctbal
      FROM customer
    ),
    v_old AS (
      SELECT o.o_orderkey, c.c_custkey, c.acctbal
      FROM orders o JOIN c_old c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderkey % 97 <> 0
    ),
    v_new AS (
      SELECT o.o_orderkey, c.c_custkey, c.acctbal
      FROM orders o JOIN c_new c ON o.o_custkey = c.c_custkey
    ),
    plus AS (
      SELECT *, 1 AS w FROM
        (SELECT * FROM v_new EXCEPT ALL SELECT * FROM v_old)
    ),
    minus AS (
      SELECT *, -1 AS w FROM
        (SELECT * FROM v_old EXCEPT ALL SELECT * FROM v_new)
    )
    SELECT o_orderkey, c_custkey, round(acctbal, 2) AS acctbal,
           CAST(SUM(w) AS INTEGER) AS weight
    FROM (SELECT * FROM plus UNION ALL SELECT * FROM minus)
    GROUP BY 1, 2, 3
    HAVING SUM(w) <> 0
    """,
    doc=(
        "Incremental view maintenance via the DBSP Z-set delta-join "
        "algebra: the orders⋈customer view's DELTA under a batch of "
        "order inserts (o_orderkey % 97 = 0) and customer updates "
        "(c_custkey % 89 = 0, retraction + insertion pairs) computed "
        "as ΔO⋈C_old + O_old⋈ΔC + ΔO⋈ΔC — the view is NEVER "
        "recomputed; each term joins a micro-batch-sized broadcast "
        "delta against the base. The oracle computes the same delta "
        "the expensive way (full recompute + EXCEPT ALL both "
        "directions), proving algebra ≡ recompute-diff. "
        "operators/ivm.zset_delta_join / consolidate"
    ),
)
def ivm_delta_join_view(spark, sf_dir):
    from metar_pipeline_spark.operators.ivm import (
        consolidate,
        zset_delta_join,
    )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c_old = cust.select(
        "c_custkey", F.col("c_acctbal").alias("acctbal")
    ).withColumn("_w", F.lit(1))
    changed = cust.filter(F.col("c_custkey") % 89 == 0)
    dc = (
        changed.select(
            "c_custkey", (F.col("c_acctbal") + F.lit(100.0)).alias("acctbal")
        )
        .withColumn("_w", F.lit(1))
        .unionByName(
            changed.select(
                "c_custkey", F.col("c_acctbal").alias("acctbal")
            ).withColumn("_w", F.lit(-1))
        )
    )
    o_all = orders.select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey")
    )
    o_old = o_all.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "_w", F.lit(1)
    )
    do = o_all.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "_w", F.lit(1)
    )
    dv = zset_delta_join(o_old, do, c_old, dc, "c_custkey")
    out = consolidate(
        dv.select(
            "o_orderkey",
            "c_custkey",
            F.round("acctbal", 2).alias("acctbal"),
            "_w",
        ),
        ["o_orderkey", "c_custkey", "acctbal"],
    )
    return out.withColumnRenamed("_w", "weight")


@register(
    "ivm_delta_agg_view",
    """
    WITH new_state AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CASE WHEN o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0
                  THEN o_totalprice + 50.0
                  ELSE o_totalprice END AS price
      FROM orders
      WHERE NOT (o_orderkey % 103 = 0 AND o_orderkey % 97 <> 0
                 AND o_orderkey % 101 <> 0)
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM new_state
    GROUP BY 1
    """,
    doc=(
        "Incremental maintenance of an AGGREGATE view (the engine "
        "analogue of the reference's incremental dwh rollup, "
        "dbt/models/dwh/dw_daily_airport_metrics.sql:7-19, upgraded to "
        "absorb late UPDATES and DELETES that the watermark path drops "
        "by design — SURVEY L7): the daily orders rollup (COUNT, "
        "DECIMAL SUM) maintained from a delta Z-set of inserts "
        "(o_orderkey%97=0), update retraction+insertion pairs "
        "(%101=0, price+50) and deletes (%103=0) — Δcount = Σw, "
        "Δsum = Σ price·w over |Δ| rows only (ivm.zset_weighted_agg), "
        "merged into the stored view at GROUP grain "
        "(ivm.apply_agg_delta full-outer + null-as-zero add, net-0 "
        "groups dropped). The oracle recomputes the view from the full "
        "new state — algebra ≡ recompute, exact by DECIMAL/integer "
        "arithmetic."
    ),
)
def ivm_delta_agg_view(spark, sf_dir):
    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").cast("date").alias("day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        (F.col("o_totalprice") + F.lit(50.0))
        .cast("decimal(18,2)")
        .alias("bumped"),
    )
    is_ins = F.col("k") % 97 == 0
    is_upd = (F.col("k") % 101 == 0) & (F.col("k") % 97 != 0)
    is_del = (
        (F.col("k") % 103 == 0)
        & (F.col("k") % 97 != 0)
        & (F.col("k") % 101 != 0)
    )
    # the STORED materialized view: old state = facts before the batch
    view = (
        base.filter(~is_ins)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("price").alias("total"),
        )
    )
    # the batch as a delta Z-set: inserts +1, updates as retract+insert
    # pairs, deletes -1 — never a rescan of the old facts
    dz = (
        base.filter(is_ins)
        .select("day", "price", F.lit(1).alias("_w"))
        .unionByName(
            base.filter(is_upd).select(
                "day", "price", F.lit(-1).alias("_w")
            )
        )
        .unionByName(
            base.filter(is_upd).select(
                "day", F.col("bumped").alias("price"), F.lit(1).alias("_w")
            )
        )
        .unionByName(
            base.filter(is_del).select(
                "day", "price", F.lit(-1).alias("_w")
            )
        )
    )
    d_agg = zset_weighted_agg(dz, ["day"], sums={"total": F.col("price")})
    new_view = apply_agg_delta(view, d_agg, ["day"], ["total"])
    return new_view.select(
        "day",
        F.col("_n").alias("n_orders"),
        F.round(F.col("total").cast("double"), 2).alias("total_price"),
    )


@register(
    "ivm_delta_join_agg_view",
    """
    WITH b_new AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 89 = 0 THEN (c_nationkey + 1) % 25
                  ELSE c_nationkey END AS nation
      FROM customer
    )
    SELECT b.nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS total_price
    FROM orders o JOIN b_new b ON o.o_custkey = b.c_custkey
    GROUP BY 1
    """,
    doc=(
        "COMPOSITIONAL IVM — the DBSP algebra chained end-to-end: a "
        "per-nation revenue rollup over orders⋈customer maintained "
        "under deltas on BOTH base tables (order inserts, o_orderkey "
        "% 97 = 0, AND customers MOVING nation, c_custkey % 89 = 0 as "
        "retraction+insertion pairs — group membership itself "
        "changes). Δ(γ(A⋈B)) = γ_w(Δ(A⋈B)): the three bilinear join "
        "terms (ivm.zset_delta_join — each joins a micro-batch-sized "
        "delta against an indexed base), then the weighted group "
        "aggregate of the join delta alone (ivm.zset_weighted_agg), "
        "merged into the stored rollup at GROUP grain "
        "(ivm.apply_agg_delta). A moved customer's orders leave one "
        "nation and arrive in another purely by weight algebra; the "
        "oracle recomputes from the full new state — composition ≡ "
        "recompute, exact by integer/DECIMAL arithmetic."
    ),
)
def ivm_delta_join_agg_view(spark, sf_dir):
    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_delta_join,
        zset_weighted_agg,
    )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    moved = F.col("c_custkey") % 89 == 0
    b_all = cust.select(
        "c_custkey", F.col("c_nationkey").alias("nation")
    )
    b_old = b_all.withColumn("_w", F.lit(1))
    db = (
        b_all.filter(moved)
        .withColumn("_w", F.lit(-1))
        .unionByName(
            cust.filter(moved).select(
                "c_custkey",
                ((F.col("c_nationkey") + 1) % 25).alias("nation"),
                F.lit(1).alias("_w"),
            )
        )
    )
    o = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    a_old = o.filter(F.col("k") % 97 != 0).drop("k").withColumn(
        "_w", F.lit(1)
    )
    da = o.filter(F.col("k") % 97 == 0).drop("k").withColumn(
        "_w", F.lit(1)
    )
    # the STORED rollup: old join state aggregated once (the store)
    view = (
        a_old.drop("_w")
        .join(b_all, "c_custkey")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("price").alias("total"),
        )
    )
    dv = zset_delta_join(a_old, da, b_old, db, "c_custkey")
    d_agg = zset_weighted_agg(
        dv.select("nation", "price", "_w"),
        ["nation"],
        sums={"total": F.col("price")},
    )
    new_view = apply_agg_delta(view, d_agg, ["nation"], ["total"])
    return new_view.select(
        "nation",
        F.col("_n").alias("n_orders"),
        F.round(F.col("total").cast("double"), 2).alias("total_price"),
    )


@register(
    "ivm_delta_var_view",
    """
    WITH new_state AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CASE WHEN o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0
                  THEN o_totalprice + 50.0
                  ELSE o_totalprice END AS price
      FROM orders
      WHERE NOT (o_orderkey % 103 = 0 AND o_orderkey % 97 <> 0
                 AND o_orderkey % 101 <> 0)
    ),
    pcs AS (
      SELECT day,
             CAST(CAST(price AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
      FROM new_state
    ),
    m AS (
      SELECT day,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(pc) AS HUGEINT) AS sc,
             CAST(SUM(pc * pc) AS HUGEINT) AS s2c
      FROM pcs GROUP BY 1
    )
    SELECT day, CAST(n AS BIGINT) AS n_orders,
           CAST((2 * sc * 10000 + n) // (2 * n) AS DOUBLE) / 1000000.0
             AS mean_price,
           CAST((2 * (n * s2c - sc * sc) + n * n) // (2 * n * n)
                AS BIGINT) AS var_price_e4
    FROM m
    """,
    doc=(
        "IVM for SECOND-MOMENT views (mean + population variance): "
        "variance is not linear, but its SUFFICIENT STATISTICS are — "
        "maintain (count, Σx, Σx²) per group from the delta Z-set "
        "alone (ivm.zset_weighted_agg with two weighted sums), merge "
        "at group grain (ivm.apply_agg_delta), derive mean and "
        "variance only at read time — the standard decomposable-"
        "aggregate treatment (same CDC pattern as ivm_delta_agg_view: "
        "inserts %97, update pairs %101, deletes %103; retractions "
        "subtract from all three states by weight algebra). "
        "Portability shape: the statistics are EXACT INTEGER CENTS "
        "(Σx² in cents² needs >53 bits, and a big-decimal→double "
        "cast differs by 1 ulp across engines — measured on the "
        "first formulation of this very query), so the variance is "
        "emitted as an integer: var·10⁴ = round_half_up((n·S2 − S²) "
        "/ n²) computed as the pure-integer floor((2D + n²)/(2n²)) — "
        "bit-exact on any engine; the mean's numerator stays under "
        "2⁵³ so its single float division is safe. Oracle recomputes "
        "from the full new state — maintained ≡ recomputed exactly."
    ),
)
def ivm_delta_var_view(spark, sf_dir):
    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").cast("date").alias("day"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("pc"),
        ((F.col("o_totalprice") + F.lit(50.0)).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("bumped_pc"),
    )
    is_ins = F.col("k") % 97 == 0
    is_upd = (F.col("k") % 101 == 0) & (F.col("k") % 97 != 0)
    is_del = (
        (F.col("k") % 103 == 0)
        & (F.col("k") % 97 != 0)
        & (F.col("k") % 101 != 0)
    )
    # sufficient statistics of the STORED view: (n, Σx, Σx²) in exact
    # integer cents (long adds merge exactly; at 100 TB day-grain
    # sums approaching 2⁶³ these become DECIMAL(38,0) — same algebra)
    view = (
        base.filter(~is_ins)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("pc").alias("sc"),
            F.sum(F.col("pc") * F.col("pc")).alias("s2c"),
        )
    )
    dz = (
        base.filter(is_ins)
        .select("day", "pc", F.lit(1).alias("_w"))
        .unionByName(
            base.filter(is_upd).select("day", "pc", F.lit(-1).alias("_w"))
        )
        .unionByName(
            base.filter(is_upd).select(
                "day", F.col("bumped_pc").alias("pc"), F.lit(1).alias("_w")
            )
        )
        .unionByName(
            base.filter(is_del).select("day", "pc", F.lit(-1).alias("_w"))
        )
    )
    d = zset_weighted_agg(
        dz,
        ["day"],
        sums={
            "sc": F.col("pc"),
            "s2c": F.col("pc") * F.col("pc"),
        },
    )
    new_view = apply_agg_delta(view, d, ["day"], ["sc", "s2c"])
    # Read-time products in DECIMAL(38,0), not BIGINT (round-11 ADVICE,
    # medium): on the shipped sf0.1 data max(n·s2c) is already 6.87e18
    # — 1.34× below int64 max — so at ~sf1 a BIGINT n*s2c silently
    # wraps (non-ANSI) while the oracle's HUGEINT does not. The stored
    # sums stay long (the docstring's DECIMAL migration note covers
    # them at day-grain 2⁶³); the overflow-first READ products are
    # widened here. scale-0 decimals: no fractional loss, exact to
    # 38 digits.
    dn = F.col("_n").cast("decimal(38,0)")
    dsc = F.col("sc").cast("decimal(38,0)")
    ds2c = F.col("s2c").cast("decimal(38,0)")
    derived = new_view.select(
        "day",
        F.col("_n").alias("_n"),
        dsc.alias("sc"),
        (dn * ds2c - dsc * dsc).alias("_D"),
        (dn * dn).alias("_nn"),
    )
    # both roundings as pure-integer half-up divisions (a float round
    # at 6 decimals hit an exact ...5 half-way on this data — engines
    # disagree there; integers cannot). DIV on decimal operands
    # returns the integral quotient as BIGINT — the quotients (mean
    # in e6, variance in e4) fit int64 by magnitudes.
    return derived.select(
        "day",
        F.col("_n").alias("n_orders"),
        (
            F.expr("(2 * sc * 10000 + _n) DIV (2 * _n)").cast("double")
            / F.lit(1000000.0)
        ).alias("mean_price"),
        F.expr("(2 * _D + _nn) DIV (2 * _nn)").alias("var_price_e4"),
    )


@register(
    "ivm_delta_minmax_view",
    """
    WITH new_state AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CASE WHEN o_orderkey % 101 = 0 AND o_orderkey % 97 <> 0
                  THEN o_totalprice + 50.0
                  ELSE o_totalprice END AS price
      FROM orders
      WHERE NOT (o_orderkey % 103 = 0 AND o_orderkey % 97 <> 0
                 AND o_orderkey % 101 <> 0)
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(CAST(MIN(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS min_price,
           round(CAST(MAX(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS max_price
    FROM new_state
    GROUP BY 1
    """,
    doc=(
        "Incremental maintenance of a MIN/MAX view — the NON-LINEAR "
        "aggregate case of IVM (the reference's dwh rollup keeps "
        "per-day MAX/MIN, dbt/models/dwh/dw_daily_airport_metrics"
        ".sql:12-13; this is its behavior under late updates/deletes): "
        "the daily orders (COUNT, MIN price, MAX price) view maintained "
        "from the same CDC Z-set as ivm_delta_agg_view. Inserts merge "
        "algebraically (least/greatest); a retraction that hits the "
        "maintained extreme flags the group UNSAFE and ONLY those "
        "groups are recomputed from the post-batch base via a "
        "broadcast semi-join of the affected keys "
        "(ivm.apply_minmax_delta) — |unsafe| ≤ |Δ groups|, never a "
        "view-wide rescan. The oracle recomputes the view from the "
        "full new state — algebra+rescan ≡ recompute."
    ),
)
def ivm_delta_minmax_view(spark, sf_dir):
    from metar_pipeline_spark.operators.ivm import apply_minmax_delta

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").cast("date").alias("day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        (F.col("o_totalprice") + F.lit(50.0))
        .cast("decimal(18,2)")
        .alias("bumped"),
    )
    is_ins = F.col("k") % 97 == 0
    is_upd = (F.col("k") % 101 == 0) & (F.col("k") % 97 != 0)
    is_del = (
        (F.col("k") % 103 == 0)
        & (F.col("k") % 97 != 0)
        & (F.col("k") % 101 != 0)
    )
    view = (
        base.filter(~is_ins)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.min("price").alias("min_v"),
            F.max("price").alias("max_v"),
        )
    )
    dz = (
        base.filter(is_ins)
        .select("day", "price", F.lit(1).alias("_w"))
        .unionByName(
            base.filter(is_upd).select(
                "day", "price", F.lit(-1).alias("_w")
            )
        )
        .unionByName(
            base.filter(is_upd).select(
                "day", F.col("bumped").alias("price"), F.lit(1).alias("_w")
            )
        )
        .unionByName(
            base.filter(is_del).select(
                "day", "price", F.lit(-1).alias("_w")
            )
        )
    )
    # the post-batch base — read ONLY for the unsafe groups
    base_new = base.filter(~is_del).select(
        "day",
        F.when(is_upd, F.col("bumped")).otherwise(F.col("price")).alias(
            "price"
        ),
    )
    new_view = apply_minmax_delta(view, dz, base_new, ["day"], "price")
    return new_view.select(
        "day",
        F.col("_n").alias("n_orders"),
        F.round(F.col("min_v").cast("double"), 2).alias("min_price"),
        F.round(F.col("max_v").cast("double"), 2).alias("max_price"),
    )


@register(
    "ivm_delta_topk_view",
    """
    WITH st AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             event_id,
             CASE WHEN event_id % 5 <> 0 AND event_id % 101 = 0
                  THEN value + 0.5 ELSE value END AS v
      FROM events
      WHERE value IS NOT NULL
        AND NOT (event_id % 5 <> 0 AND event_id % 101 <> 0
                 AND event_id % 97 = 0)
    )
    SELECT event_type, day, event_id, round(v, 6) AS value,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY event_type, day ORDER BY v DESC, event_id
           ) AS INTEGER) AS rank
    FROM st
    QUALIFY rank <= 5
    """,
    doc=(
        "IVM for a per-group TOP-K view — the ranked generalization "
        "of ivm_delta_minmax_view (MIN/MAX is top-1; materialized "
        "leaderboards are the serving shape): the per-(type, day) "
        "top-5 events by value maintained under a CDC Z-set (inserts "
        "event_id % 5 = 0; updates % 101 = 0 as retract+insert "
        "pairs, value+0.5; deletes % 97 = 0 — rates chosen so at "
        "every SF SOME groups lose a stored member and rescan while "
        "MOST merge algebraically, exercising both paths at the "
        "gate). Inserts re-rank only (stored top-k ∪ inserts) — view "
        "grain, never fact grain; a retraction hitting a stored "
        "member rescans ONLY that group from the post-batch base via "
        "a broadcast semi-join (ivm.apply_topk_delta; both rankings "
        "through the salted ranking.grouped_topk). Oracle = full "
        "recompute with plain ROW_NUMBER/QUALIFY — algebra+rescan ≡ "
        "recompute."
    ),
)
def ivm_delta_topk_view(spark, sf_dir):
    from metar_pipeline_spark.operators.ivm import apply_topk_delta
    from metar_pipeline_spark.operators.ranking import grouped_topk

    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    eid = F.col("event_id")
    is_ins = eid % 5 == 0
    is_upd = (eid % 5 != 0) & (eid % 101 == 0)
    is_del = (eid % 5 != 0) & (eid % 101 != 0) & (eid % 97 == 0)
    base = events.select(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_id",
        "value",
    )
    k = 5
    # the STORED leaderboard: pre-batch top-5 per (type, day)
    view = grouped_topk(
        base.filter(~is_ins),
        ["event_type", "day"],
        [F.desc("value"), F.asc("event_id")],
        k,
        salt=F.pmod(F.col("event_id"), F.lit(32)),
    ).drop("rank")
    dz = (
        base.filter(is_ins)
        .withColumn("_w", F.lit(1))
        .unionByName(base.filter(is_upd).withColumn("_w", F.lit(-1)))
        .unionByName(
            base.filter(is_upd)
            .withColumn("value", F.col("value") + 0.5)
            .withColumn("_w", F.lit(1))
        )
        .unionByName(base.filter(is_del).withColumn("_w", F.lit(-1)))
    )
    base_new = base.filter(~is_del).withColumn(
        "value",
        F.when(is_upd, F.col("value") + 0.5).otherwise(F.col("value")),
    )
    out = apply_topk_delta(
        view, dz, base_new, ["event_type", "day"], "event_id", "value", k
    )
    return out.select(
        "event_type",
        "day",
        "event_id",
        F.round("value", 6).alias("value"),
        "rank",
    )


def _bf_oracle(rounds: int = 3) -> str:
    """Unrolled twin of operators/paths.bellman_ford_min_cost over the
    undirected min-price supplier↔part edge set."""
    head = """
    WITH ep AS (
      SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst,
             MIN(l_extendedprice) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    ed AS (
      SELECT src, dst, w FROM ep
      UNION ALL
      SELECT dst AS src, src AS dst, w FROM ep
    ),
    d0 AS (SELECT s_suppkey * 2 AS node, CAST(0.0 AS DOUBLE) AS cost
           FROM supplier WHERE s_suppkey < 3)"""
    steps = []
    for r in range(1, rounds + 1):
        steps.append(
            f"""
    r{r} AS (
      SELECT e.dst AS node, MIN(d.cost + e.w) AS cost
      FROM ed e JOIN d{r - 1} d ON e.src = d.node
      GROUP BY e.dst
    ),
    d{r} AS (
      SELECT node, MIN(cost) AS cost FROM (
        SELECT node, cost FROM d{r - 1}
        UNION ALL
        SELECT node, cost FROM r{r})
      GROUP BY node
    )"""
        )
    label = (
        "CASE WHEN node % 2 = 0 THEN 's' || CAST(node // 2 AS VARCHAR) "
        "ELSE 'p' || CAST((node - 1) // 2 AS VARCHAR) END"
    )
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT {label} AS node, round(cost, 2) AS cost FROM d{rounds}"""
    )


def _bf_pred_oracle(rounds: int = 3) -> str:
    """Unrolled twin of operators/paths.bellman_ford_min_cost_pred:
    the per-round MIN becomes a (cost, pred) lexicographic argmin via
    a per-node ROW_NUMBER — identical tie semantics to Spark's
    ``min(struct(cost, pred))``."""
    head = """
    WITH ep AS (
      SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst,
             MIN(l_extendedprice) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    ed AS (
      SELECT src, dst, w FROM ep
      UNION ALL
      SELECT dst AS src, src AS dst, w FROM ep
    ),
    d0 AS (SELECT s_suppkey * 2 AS node, CAST(0.0 AS DOUBLE) AS cost,
                  s_suppkey * 2 AS pred
           FROM supplier WHERE s_suppkey < 3)"""
    steps = []
    for r in range(1, rounds + 1):
        steps.append(
            f"""
    r{r} AS (
      SELECT e.dst AS node, d.cost + e.w AS cost, e.src AS pred
      FROM ed e JOIN d{r - 1} d ON e.src = d.node
    ),
    d{r} AS (
      SELECT node, cost, pred FROM (
        SELECT node, cost, pred,
               ROW_NUMBER() OVER (
                 PARTITION BY node ORDER BY cost, pred
               ) AS rn
        FROM (SELECT node, cost, pred FROM d{r - 1}
              UNION ALL
              SELECT node, cost, pred FROM r{r})
      ) WHERE rn = 1
    )"""
        )
    lbl = (
        "CASE WHEN {c} % 2 = 0 THEN 's' || CAST({c} // 2 AS VARCHAR) "
        "ELSE 'p' || CAST(({c} - 1) // 2 AS VARCHAR) END"
    )
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT {lbl.format(c="node")} AS node, round(cost, 2) AS cost,
           {lbl.format(c="pred")} AS pred
    FROM d{rounds}"""
    )


@register(
    "supply_cheapest_path_3hop_pred",
    _bf_pred_oracle(),
    doc=(
        "Bellman-Ford with PATH RECONSTRUCTION: the bounded min-plus "
        "relaxation of supply_cheapest_path_3hop carrying the "
        "predecessor — per round the MIN becomes a lexicographic "
        "min(struct(cost, pred)) argmin (the established total-order "
        "argmax pattern), so cost ties resolve to the smallest "
        "upstream id identically on both engines and the cheapest "
        "route is walkable back to its seed. Same per-round "
        "equi-join + node-grain hash-agg shape "
        "(operators/paths.bellman_ford_min_cost_pred)"
    ),
)
def supply_cheapest_path_3hop_pred(spark, sf_dir):
    from metar_pipeline_spark.operators.paths import (
        bellman_ford_min_cost_pred,
    )

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    ep = (
        li.groupBy(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .agg(F.min("l_extendedprice").alias("w"))
    )
    edges = ep.unionByName(
        ep.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    seeds = sup.filter(F.col("s_suppkey") < 3).select(
        (F.col("s_suppkey") * 2).alias("node")
    )
    dist = bellman_ford_min_cost_pred(edges, seeds, rounds=3)

    def lbl(c):
        return F.when(
            c % 2 == 0,
            F.concat(F.lit("s"), (c / 2).cast("long").cast("string")),
        ).otherwise(
            F.concat(F.lit("p"), ((c - 1) / 2).cast("long").cast("string"))
        )

    return dist.select(
        lbl(F.col("node")).alias("node"),
        F.round("cost", 2).alias("cost"),
        lbl(F.col("pred")).alias("pred"),
    )


@register(
    "supply_cheapest_path_3hop",
    _bf_oracle(),
    doc=(
        "Bounded Bellman-Ford (min-plus semiring, completing the graph "
        "trio beside pagerank's fixpoint values and BFS's frontier): "
        "cheapest ≤3-hop path cost from suppliers {1, 2} over the "
        "undirected supplier↔part graph weighted by the minimum "
        "observed line price — per round one dist⋈edges equi-join + "
        "node-grain MIN hash agg, dist checkpointed per round. "
        "Determinism needs no DECIMAL: every candidate cost is the "
        "same left-assoc IEEE add chain on both engines and MIN over "
        "identical doubles is exact (operators/paths.py)"
    ),
)
def supply_cheapest_path_3hop(spark, sf_dir):
    from metar_pipeline_spark.operators.paths import bellman_ford_min_cost

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    ep = (
        li.groupBy(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("l_partkey") * 2 + 1).alias("dst"),
        )
        .agg(F.min("l_extendedprice").alias("w"))
    )
    edges = ep.unionByName(
        ep.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    seeds = sup.filter(F.col("s_suppkey") < 3).select(
        (F.col("s_suppkey") * 2).alias("node")
    )
    dist = bellman_ford_min_cost(edges, seeds, rounds=3)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("s"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("p"), ((F.col("node") - 1) / 2).cast("long").cast("string")
        )
    )
    return dist.select(
        label.alias("node"), F.round("cost", 2).alias("cost")
    )


@register(
    "cms_user_frequency_audit",
    """
    WITH h AS (
      SELECT * FROM (VALUES (0, 998244353, 12289), (1, 1000000007, 257),
                            (2, 69061, 65537), (3, 40503, 97)) AS t(r, a, b)
    ),
    cells AS (
      SELECT h.r,
             ((e.user_id * h.a + h.b) % 2147483647) % 1024 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events e CROSS JOIN h
      GROUP BY 1, 2
    ),
    topu AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM events GROUP BY 1
      ORDER BY true_cnt DESC, user_id LIMIT 10
    )
    SELECT t.user_id, t.true_cnt, MIN(c.c) AS est_cnt,
           MIN(c.c) - t.true_cnt AS overcount
    FROM topu t CROSS JOIN h
    JOIN cells c
      ON c.r = h.r
     AND c.bucket = ((t.user_id * h.a + h.b) % 2147483647) % 1024
    GROUP BY 1, 2
    """,
    doc=(
        "Count-Min sketch frequency audit (mergeable, DETERMINISTIC — "
        "unlike the DataSketches HLL rows-only queries, the fixed hash "
        "rows let the oracle replay every cell, so this sketch is "
        "verified on all four axes): the 4×1024-cell sketch is built "
        "as TWO half-corpus partials (event_id parity) merged "
        "cell-wise (operators/sketches.cms_merge — sketch(A⊎B) ≡ "
        "merge(sketch A, sketch B), the 100 TB shape: one 4 KB sketch "
        "per shard into a cell-grain reduce), then point-estimates the "
        "10 true heavy hitters: est = min over the 4 matching cells, "
        "never undercounting (overcount ≥ 0 structurally; bound "
        "pinned in tests/test_operators.py)"
    ),
)
def cms_user_frequency_audit(spark, sf_dir):
    from metar_pipeline_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    events = load_table(spark, sf_dir, "events")
    # mergeability demonstrated for real: two disjoint half sketches
    s1 = cms_build(events.filter(F.col("event_id") % 2 == 0), "user_id")
    s2 = cms_build(events.filter(F.col("event_id") % 2 == 1), "user_id")
    sketch = cms_merge(s1, s2)
    topu = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
        .limit(10)
    )
    est = cms_estimate(sketch, topu, "user_id")
    return topu.join(est, "user_id").select(
        "user_id",
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
    )


@register(
    "ivm_delta_distinct_view",
    """
    WITH new_state AS (
      SELECT c_mktsegment AS segment,
             CASE WHEN c_custkey % 41 = 0 AND c_custkey % 37 <> 0
                  THEN (c_custkey + 7) % 499
                  ELSE c_custkey % 499 END AS bucket
      FROM customer
      WHERE c_custkey % 37 <> 0
    )
    SELECT DISTINCT segment, CAST(bucket AS BIGINT) AS bucket
    FROM new_state
    """,
    doc=(
        "IVM of a DISTINCT view — the multiplicity-threshold case the "
        "join/aggregate forms don't exercise: membership is "
        "(maintained row count > 0), so a pair LEAVES the view only "
        "when its LAST copy is retracted and re-enters on any insert. "
        "The (segment, custkey%499) domain gives multiplicities of "
        "1-2, so the %37 deletes genuinely zero out pairs while "
        "2-copy pairs survive; %41 updates move pairs (retract old + "
        "insert new bucket). Maintained entirely by "
        "ivm.zset_weighted_agg + apply_agg_delta with NO measures — "
        "the count IS the view; oracle = DISTINCT over the full new "
        "state (membership algebra ≡ recompute)."
    ),
)
def ivm_delta_distinct_view(spark, sf_dir):
    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    base = cust.select(
        k.alias("k"),
        F.col("c_mktsegment").alias("segment"),
        (k % 499).cast("bigint").alias("bucket"),
        ((k + 7) % 499).cast("bigint").alias("moved"),
    )
    is_del = F.col("k") % 37 == 0
    is_upd = (F.col("k") % 41 == 0) & (F.col("k") % 37 != 0)
    keys = ["segment", "bucket"]
    # the stored view: multiset multiplicities of the old state
    view = base.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    dz = (
        base.filter(is_del)
        .select(*keys, F.lit(-1).alias("_w"))
        .unionByName(
            base.filter(is_upd).select(*keys, F.lit(-1).alias("_w"))
        )
        .unionByName(
            base.filter(is_upd).select(
                "segment", F.col("moved").alias("bucket"),
                F.lit(1).alias("_w"),
            )
        )
    )
    merged = apply_agg_delta(
        view, zset_weighted_agg(dz, keys), keys, []
    )
    return merged.select("segment", "bucket")


def _kcore_oracle(k: int = 15, rounds: int = 3) -> str:
    """Unrolled twin of operators/kcore.k_core over the undirected
    supplier↔part edge set."""
    head = """
    WITH ep AS (
      SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
      FROM lineitem
    ),
    e0 AS (
      SELECT src, dst FROM ep
      UNION ALL
      SELECT dst AS src, src AS dst FROM ep
    )"""
    steps = []
    for r in range(1, rounds + 1):
        steps.append(
            f"""
    k{r} AS (
      SELECT src FROM (
        SELECT src, COUNT(*) AS d FROM e{r - 1} GROUP BY 1
      ) WHERE d >= {k}
    ),
    e{r} AS (
      SELECT e.src, e.dst
      FROM e{r - 1} e
      JOIN k{r} a ON e.src = a.src
      JOIN k{r} b ON e.dst = b.src
    )"""
        )
    lbl = (
        "CASE WHEN src % 2 = 0 THEN 's' || CAST(src // 2 AS VARCHAR) "
        "ELSE 'p' || CAST((src - 1) // 2 AS VARCHAR) END"
    )
    return (
        head
        + ","
        + ",".join(steps)
        + f"""
    SELECT {lbl} AS node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY 1"""
    )


@register(
    "supply_kcore_15",
    _kcore_oracle(),
    doc=(
        "Bounded k-core decomposition (k=15, 3 peel rounds) of the "
        "undirected supplier↔part graph — the degeneracy member of "
        "the graph family (dense-subgraph filtering: spam farms and "
        "boilerplate rings live in high cores of a link graph). Per "
        "round one node-grain degree hash agg + two semi-joins "
        "filtering the checkpointed edge frame to surviving "
        "endpoints; degrees in the output are INSIDE the core "
        "(operators/kcore.k_core; oracle unrolls every round)"
    ),
)
def supply_kcore_15(spark, sf_dir):
    from metar_pipeline_spark.operators.kcore import k_core

    li = load_table(spark, sf_dir, "lineitem")
    ep = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = ep.unionByName(
        ep.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    core = k_core(edges, k=15, rounds=3)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("s"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("p"), ((F.col("node") - 1) / 2).cast("long").cast("string")
        )
    )
    return core.select(label.alias("node"), "degree")


# ---------------------------------------------------------------------------
# Markov-chain attribution with removal effects (operators/markov.py)
# ---------------------------------------------------------------------------
_MARKOV_STEPS = 8


def _markov_oracle(steps: int = _MARKOV_STEPS) -> str:
    base = """
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    firstp AS (
      SELECT user_id, MIN(rn) AS prn FROM seq
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    j AS (
      SELECT s.user_id, s.event_type, s.rn
      FROM seq s LEFT JOIN firstp f USING (user_id)
      WHERE f.prn IS NULL OR s.rn <= f.prn
    ),
    j2 AS (
      SELECT user_id, event_type, rn,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY rn) AS nxt
      FROM j
    ),
    tcnt AS MATERIALIZED (
      SELECT src, dst, COUNT(*) AS c FROM (
        SELECT 'START' AS src, event_type AS dst FROM j2 WHERE rn = 1
        UNION ALL
        SELECT event_type AS src, COALESCE(nxt, 'NULL') AS dst
        FROM j2 WHERE event_type <> 'purchase') u
      GROUP BY 1, 2
    ),
    vars(variant) AS (
      VALUES ('full'), ('view'), ('click'), ('signup'), ('error')
    ),
    tv AS (
      SELECT v.variant, t.src,
             CASE WHEN t.dst = v.variant THEN 'NULL' ELSE t.dst END AS dst,
             SUM(t.c) AS c
      FROM tcnt t CROSS JOIN vars v
      WHERE t.src <> v.variant
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT variant, src, SUM(c) AS tot FROM tv GROUP BY 1, 2),
    tp AS MATERIALIZED (
      SELECT tv.variant, tv.src, tv.dst,
             CAST(tv.c AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS p
      FROM tv JOIN tot ON tot.variant = tv.variant AND tot.src = tv.src
      UNION ALL
      SELECT v2.variant, s.state, s.state, CAST(1.0 AS DOUBLE)
      FROM (VALUES ('purchase'), ('NULL')) s(state) CROSS JOIN vars v2
    ),
    v0 AS (
      SELECT variant, 'START' AS state, CAST(1.0 AS DOUBLE) AS val
      FROM vars
    )"""
    chain = "".join(
        f""",
    v{k} AS (
      SELECT t.variant, t.dst AS state,
             round(CAST(SUM(CAST(v.val * t.p AS DECIMAL(38,18)))
                        AS DOUBLE), 12) AS val
      FROM v{k - 1} v JOIN tp t
        ON t.variant = v.variant AND t.src = v.state
      GROUP BY 1, 2
    )"""
        for k in range(1, steps + 1)
    )
    return (
        base
        + chain
        + f""",
    conv AS (SELECT variant, val FROM v{steps} WHERE state = 'purchase'),
    fullp AS (SELECT val AS pfull FROM conv WHERE variant = 'full'),
    eff AS (
      SELECT variant AS channel,
             round(val, 6) AS p_conv_removed,
             round(1 - val / pfull, 6) + 0.0 AS removal_effect,
             pfull
      FROM conv CROSS JOIN fullp WHERE variant <> 'full'
    ),
    te AS (
      SELECT CAST(SUM(CAST(removal_effect AS DECIMAL(38,10)))
                  AS DOUBLE) AS t
      FROM eff
    )
    SELECT channel, round(pfull, 6) AS p_conv_full,
           p_conv_removed, removal_effect,
           round(removal_effect / te.t, 6) + 0.0 AS attribution_share
    FROM eff CROSS JOIN te"""
    )


@register(
    "markov_attribution_removal",
    _markov_oracle(),
    doc=(
        "Markov-chain attribution by REMOVAL EFFECT (Anderl et al.): "
        "model per-user journeys (cut at first purchase, total order "
        "ts+event_id) as a first-order chain over channel states, "
        "then credit each channel by how much 8-step conversion "
        "probability drops when it is deleted and its incoming mass "
        "redirected to the null absorber — the principled upgrade of "
        "linear_attribution_revenue (a channel that appears often but "
        "never moves users toward purchase earns ~0 here). Scale "
        "shape (operators/markov.py): ONE corpus pass (two user-"
        "partitioned windows + a hash agg to transition-count grain), "
        "variant expansion in exact integer counts, then the "
        "absorption power iteration runs on a ~35-row frame per step "
        "(broadcast join + DECIMAL(38,18) matvec rounded to 12 — the "
        "pagerank determinism recipe; oracle unrolls all 8 steps)."
    ),
)
def markov_attribution_removal(spark, sf_dir):
    from metar_pipeline_spark.operators.markov import (
        absorb_power,
        journey_transitions,
        removal_variant_probs,
    )

    events = load_table(spark, sf_dir, "events")
    tcnt = journey_transitions(events)
    tp = removal_variant_probs(
        tcnt, ["view", "click", "signup", "error"]
    )
    # conv feeds THREE consumers (fullp, eff, te) — materialize the
    # 5-row result once; without this every consumer re-evaluates the
    # whole absorption chain.
    conv = (
        absorb_power(tp, _MARKOV_STEPS)
        .filter(F.col("state") == "purchase")
        .localCheckpoint(eager=True)
    )
    fullp = conv.filter(F.col("variant") == "full").select(
        F.col("val").alias("pfull")
    )
    eff = (
        conv.filter(F.col("variant") != "full")
        .crossJoin(F.broadcast(fullp))
        .select(
            F.col("variant").alias("channel"),
            F.round("val", 6).alias("p_conv_removed"),
            (
                F.round(1 - F.col("val") / F.col("pfull"), 6)
                + F.lit(0.0)
            ).alias("removal_effect"),
            "pfull",
        )
    )
    te = eff.agg(
        F.sum(F.col("removal_effect").cast("decimal(38,10)"))
        .cast("double")
        .alias("t")
    )
    return eff.crossJoin(F.broadcast(te)).select(
        "channel",
        F.round("pfull", 6).alias("p_conv_full"),
        "p_conv_removed",
        "removal_effect",
        (
            F.round(F.col("removal_effect") / F.col("t"), 6)
            + F.lit(0.0)
        ).alias("attribution_share"),
    )


@register(
    "rfm_segment_census",
    """
    WITH anchor AS (
      SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS a FROM events
    ),
    u AS (
      SELECT user_id,
             datediff('day', MAX(CAST(date_trunc('day', ts) AS DATE)),
                      (SELECT a FROM anchor)) AS r_days,
             COUNT(*) AS freq,
             COALESCE(CAST(SUM(CAST(value AS DECIMAL(30,10)))
                           AS DOUBLE), 0.0) AS monetary
      FROM events GROUP BY user_id
    ),
    q AS (
      SELECT NTILE(5) OVER (ORDER BY r_days, user_id) AS r_q,
             NTILE(5) OVER (ORDER BY freq DESC, user_id) AS f_q,
             NTILE(5) OVER (ORDER BY monetary DESC, user_id) AS m_q,
             monetary
      FROM u
    )
    SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(CAST(monetary AS DECIMAL(38,10)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_monetary
    FROM q GROUP BY 1, 2, 3
    """,
    doc=(
        "RFM segmentation census: every user scored into "
        "recency/frequency/monetary QUINTILES (1 = best) and the "
        "(r,f,m) segment grid reported with size and mean spend — "
        "the classic lifecycle-marketing segmentation (champions "
        "1/1/1, at-risk high-r low-f, etc). Scale shape: one hash agg "
        "reduces the fact to USER grain; each quintile assignment is "
        "operators/ranking.distributed_rank (range exchange + "
        "pid-partitioned window — never a single-task NTILE) composed "
        "with the closed-form ntile_from_rank, bit-identical to the "
        "oracle's NTILE(5) over the same total order (tiebreak "
        "user_id); the census is a second hash agg at segment grain "
        "(<=125 rows)."
    ),
)
def rfm_segment_census(spark, sf_dir):
    from metar_pipeline_spark.operators.ranking import (
        distributed_rank,
        ntile_from_rank,
    )

    events = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts"))
    u = events.groupBy("user_id").agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.coalesce(
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double"),
            F.lit(0.0),
        ).alias("monetary"),
    )
    anchor = events.agg(F.max(day).alias("__a"))
    carrier = anchor.crossJoin(
        u.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    )
    u = u.crossJoin(F.broadcast(carrier)).withColumn(
        "r_days", F.datediff("__a", "last_day")
    )
    u = distributed_rank(
        u, [F.asc("r_days"), F.asc("user_id")], rank_col="__rr"
    )
    u = distributed_rank(
        u, [F.desc("freq"), F.asc("user_id")], rank_col="__rf"
    )
    u = distributed_rank(
        u, [F.desc("monetary"), F.asc("user_id")], rank_col="__rm"
    )
    seg = u.select(
        ntile_from_rank(F.col("__rr"), F.col("__n"), 5).alias("r_q"),
        ntile_from_rank(F.col("__rf"), F.col("__n"), 5).alias("f_q"),
        ntile_from_rank(F.col("__rm"), F.col("__n"), 5).alias("m_q"),
        "monetary",
    )
    return seg.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(
            F.sum(F.col("monetary").cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_monetary"),
    )


def _ppr_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    """Unrolled-CTE twin of operators/ppr.personalized_pagerank —
    same DECIMAL(38,18) accumulation, 12-decimal per-step rounding,
    and float literals interpolated from the SAME Python doubles."""
    head = """
    WITH edges AS (
      SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
      FROM lineitem
    ),
    nodes0 AS (
      SELECT node FROM (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges)
    ),
    seeds AS (
      SELECT DISTINCT l_suppkey * 2 AS node FROM lineitem
      WHERE l_suppkey <= 5
    ),
    ns AS (SELECT COUNT(*) AS s FROM seeds),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (
      SELECT n.node, o.deg,
             CASE WHEN sd.node IS NOT NULL
                  THEN CAST(1.0 AS DOUBLE) / CAST(ns.s AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END AS tele
      FROM nodes0 n
      LEFT JOIN outdeg o ON n.node = o.src
      LEFT JOIN seeds sd ON n.node = sd.node
      CROSS JOIN ns
    ),
    r0 AS (SELECT node, deg, tele, tele AS r FROM nodes)"""
    steps = []
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        steps.append(
            f"""
    c{i} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(r.r / r.deg AS DECIMAL(38,18))) AS DOUBLE) AS c
      FROM edges e JOIN {p} r ON e.src = r.node
      GROUP BY e.dst
    ),
    d{i} AS (
      SELECT COALESCE(
        CAST(SUM(CAST(r AS DECIMAL(38,18))) AS DOUBLE), 0.0) AS dang
      FROM {p} WHERE deg IS NULL
    ),
    r{i} AS (
      SELECT nd.node, nd.deg, nd.tele,
             round(CAST({1.0 - damping!r} AS DOUBLE) * nd.tele
                   + CAST({damping!r} AS DOUBLE)
                     * (COALESCE(c.c, 0.0) + d{i}.dang * nd.tele),
                   12) AS r
      FROM nodes nd LEFT JOIN c{i} c ON nd.node = c.node
      CROSS JOIN d{i}
    )"""
        )
    label = (
        "CASE WHEN node % 2 = 0 THEN 's' || CAST(node // 2 AS VARCHAR) "
        "ELSE 'p' || CAST((node - 1) // 2 AS VARCHAR) END"
    )
    return (
        head
        + ","
        + ",".join(steps)
        + f"\n    SELECT {label} AS node, r AS rank FROM r{iterations}"
    )


@register(
    "ppr_seed_expansion",
    _ppr_oracle(),
    doc=(
        "Personalized PageRank from a trusted seed set (suppliers "
        "1-5) over the supplier->part graph: teleport AND dangling "
        "mass return to the seeds, so ranks measure relatedness to "
        "the seed set — the seed-based domain-expansion primitive of "
        "corpus curation (grow a source whitelist over a link graph; "
        "Haveliwala topic-sensitive PageRank). Same scale shape as "
        "pagerank_supply_graph: edges deduped + checkpointed once, "
        "node dim carries (deg, tele) from day one, per iteration ONE "
        "edges-ranks equi-join + hash agg, a one-row dangling "
        "aggregate crossed back, 12-decimal DECIMAL rounding per step "
        "(operators/ppr.py; oracle unrolls all 3 iterations)."
    ),
)
def ppr_seed_expansion(spark, sf_dir):
    from metar_pipeline_spark.operators.ppr import personalized_pagerank

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    seeds = li.filter(F.col("l_suppkey") <= 5).select(
        (F.col("l_suppkey") * 2).alias("node")
    )
    ranks = personalized_pagerank(edges, seeds, iterations=3)
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("s"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("p"), ((F.col("node") - 1) / 2).cast("long").cast("string")
        )
    )
    return ranks.select(label.alias("node"), "rank")


@register(
    "eb_shrunk_conversion_rates",
    """
    WITH u AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(SUM(conv) AS DOUBLE) / SUM(n) AS p0 FROM u
    )
    SELECT u.user_id, CAST(u.n AS BIGINT) AS n,
           CAST(u.conv AS BIGINT) AS conv,
           round(CAST(u.conv AS DOUBLE) / u.n, 6) AS raw_rate,
           round((u.conv + 20 * g.p0) / (u.n + 20), 6) AS shrunk_rate
    FROM u CROSS JOIN g
    """,
    doc=(
        "Empirical-Bayes shrinkage of per-user conversion rates "
        "(beta-binomial with prior strength M=20 centered on the "
        "global rate — the baseball-batting-average estimator): a "
        "user with 3 events and 1 purchase reads 33% raw but shrinks "
        "hard toward the prior, while heavy users keep their own "
        "rate. The per-key-rate smoothing every leaderboard/ranking "
        "over sparse keys needs before sorting by rate (raw-rate "
        "ordering is dominated by tiny-n noise). Scale shape: one "
        "user-grain hash agg, the global rate on a broadcast one-row "
        "carrier, one fixed double expression per row — no windows, "
        "no second shuffle."
    ),
)
def eb_shrunk_conversion_rates(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    u = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    g = u.agg(
        (
            F.sum("conv").cast("double") / F.sum("n")
        ).alias("p0")
    )
    return u.crossJoin(F.broadcast(g)).select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.col("conv").cast("bigint").alias("conv"),
        F.round(F.col("conv").cast("double") / F.col("n"), 6).alias(
            "raw_rate"
        ),
        F.round(
            (F.col("conv") + 20 * F.col("p0")) / (F.col("n") + 20), 6
        ).alias("shrunk_rate"),
    )
