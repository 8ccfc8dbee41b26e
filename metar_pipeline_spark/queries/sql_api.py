"""SQL-API queries: the engine's second front door.

The reference's whole relational layer is SQL text shipped to Postgres
(SURVEY.md §3.3) — so beyond the DataFrame API, this engine exposes the
same capability through ``spark.sql`` over registered views. Each query
here is ONE ANSI SQL string executed verbatim by BOTH Spark and the
DuckDB oracle: the strongest possible parity statement (no dialect
translation at all), and proof that Catalyst's SQL front end covers the
reference's query class.
"""

from __future__ import annotations

from metar_pipeline_spark.io import register_views
from metar_pipeline_spark.queries import register


def _sql_query(name: str, sql: str, doc: str):
    @register(name, sql, doc=doc)
    def run(spark, sf_dir, _sql=sql):
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    run.__name__ = name
    return run


_sql_query(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
      AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 via spark.sql — identical ANSI text on both engines",
)


_sql_query(
    "tpch_q4_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape via spark.sql: correlated EXISTS planned as semi join",
)


_sql_query(
    "grouping_sets_type_cohort",
    """
    SELECT event_type,
           user_id % 10 AS cohort,
           CAST(2 * GROUPING(event_type) + GROUPING(user_id % 10) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    """,
    doc="Explicit GROUPING SETS via spark.sql (beyond rollup/cube shorthands)",
)


_sql_query(
    "recursive_date_spine_gapfill",
    """
    WITH RECURSIVE bounds AS (
      SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS dmin,
             CAST(MAX(date_trunc('day', ts)) AS DATE) AS dmax
      FROM events
    ),
    spine(d, dmax) AS (
      -- dmax rides along in the recursion state so the per-step WHERE is
      -- a column comparison; a correlated (SELECT dmax FROM bounds) would
      -- re-scan events on every one of the ~O(days) iterations.
      SELECT dmin AS d, dmax FROM bounds
      UNION ALL
      SELECT CAST(d + INTERVAL 1 DAY AS DATE) AS d, dmax FROM spine
      WHERE d < dmax
    ),
    daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS n
      FROM events GROUP BY 1
    )
    SELECT s.d, CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN daily ON s.d = daily.d
    """,
    doc="Recursive CTE date spine + gap-filling left join (Spark 4 recursion), identical ANSI text on both engines",
)


@register(
    "scripted_incremental_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2)
               AS sum_value
    FROM events
    WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    GROUP BY 1, 2
    """,
    doc=(
        "Spark 4 SQL scripting (BEGIN/DECLARE/SET): the incremental "
        "watermark-then-rollup flow as ONE procedural SQL block — the "
        "dbt-style two-step (resolve high watermark, then filter+agg) "
        "without leaving the SQL engine; oracle = the equivalent "
        "subquery form. Timestamp arithmetic is exact (micros), so the "
        "scripted and declarative forms hash-match."
    ),
)
def scripted_incremental_rollup(spark, sf_dir):
    register_views(spark, sf_dir)
    # scripting is only needed while spark.sql PARSES the block; the
    # returned DataFrame's plan is already built, so restoring the conf
    # immediately avoids leaking scripting mode into later queries on
    # the shared session.
    prev = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
        """
        BEGIN
          DECLARE hw TIMESTAMP;
          SET hw = (SELECT max(ts) - INTERVAL 7 DAY FROM events);
          SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                 event_type,
                 CAST(count(*) AS BIGINT) AS n_events,
                 round(CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE), 2)
                     AS sum_value
          FROM events
          WHERE ts > hw
          GROUP BY 1, 2;
        END
        """
        )
    finally:
        spark.conf.set("spark.sql.scripting.enabled", prev)


@register(
    "parameterized_sql_topn",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events WHERE value >= 50.0
    GROUP BY 1 ORDER BY n DESC, event_type LIMIT 3
    """,
    doc=(
        "Parameterized SQL (Spark 4 named markers): the same statement "
        "text executes with bound :min_v / :k arguments — injection-"
        "safe templating inside the SQL front end; oracle = the bound "
        "literal form"
    ),
)
def parameterized_sql_topn(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events WHERE value >= :min_v
        GROUP BY 1 ORDER BY n DESC, event_type LIMIT :k
        """,
        args={"min_v": 50.0, "k": 3},
    )


_sql_query(
    "lateral_top2_customers",
    """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
    """,
    doc=(
        "Correlated LATERAL subquery with per-row ORDER BY/LIMIT — the "
        "SQL-standard top-n-per-group form, identical ANSI text on "
        "both engines; Catalyst decorrelates it into the same "
        "window/top-k physical shape the DataFrame form plans"
    ),
)


# ---------------------------------------------------------------------------
# Spark 4.1 SQL pipe syntax (|>)
# ---------------------------------------------------------------------------
# The second sql_api query whose text differs per engine: Spark 4.1
# parses the SQL pipe-operator form (FROM ... |> WHERE ... |> AGGREGATE
# ... GROUP BY ...); DuckDB runs the equivalent plain-ANSI rewrite. The
# pipe form is purely front-end sugar — Catalyst plans the identical
# join/filter/agg tree, which the hash match proves.
_PIPE_SPARK = """
    FROM orders
    |> JOIN customer ON o_custkey = c_custkey
    |> WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    |> EXTEND CAST(date_trunc('month', o_orderdate) AS DATE) AS month
    |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                 round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
       GROUP BY c_mktsegment, month
    |> WHERE n_orders > 5
    |> ORDER BY month, c_mktsegment
    |> LIMIT 100
"""

_PIPE_DUCK = """
    SELECT c_mktsegment, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c_mktsegment, month
    HAVING CAST(COUNT(*) AS BIGINT) > 5
    ORDER BY month, c_mktsegment
    LIMIT 100
"""


@register(
    "pipe_syntax_monthly_revenue",
    _PIPE_DUCK,
    doc=(
        "Spark 4.1 SQL pipe operators: orders ⋈ customer |> filter |> "
        "EXTEND month |> AGGREGATE |> post-agg filter |> order/limit — "
        "the linear pipeline spelling of the monthly-revenue rollup; "
        "oracle is the plain-ANSI rewrite (HAVING form), proving the "
        "pipe front end plans the identical relational tree"
    ),
)
def pipe_syntax_monthly_revenue(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SPARK)


_sql_query(
    "recursive_cte_hierarchy_rollup",
    """
    WITH RECURSIVE edges AS (
      SELECT c_custkey AS child,
             CAST(floor(c_custkey / 2) AS BIGINT) AS parent
      FROM customer WHERE c_custkey > 1
    ),
    walk(node, anc, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      UNION ALL
      SELECT w.node, e.parent, w.depth + 1
      FROM walk w JOIN edges e ON w.anc = e.child
    ),
    node_depth AS (
      SELECT node, CAST(MAX(depth) AS BIGINT) AS depth FROM walk GROUP BY node
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(node) AS BIGINT) AS min_custkey
    FROM node_depth GROUP BY depth ORDER BY depth
    """,
    doc=(
        "Variable-depth hierarchy traversal via Spark 4 recursive CTE "
        "with a JOIN in the recursive step (the BOM/org-chart shape the "
        "fixed date-spine recursion can't express): each customer walks "
        "a synthetic binary-tree parent edge list to the root, then the "
        "walk collapses to a per-depth census — identical ANSI text on "
        "both engines; depth is data-dependent (log2 of the key space), "
        "not a constant join count"
    ),
)


# ---------------------------------------------------------------------------
# Spark 4 SQL-surface: GROUP BY ALL + ordered LISTAGG
# ---------------------------------------------------------------------------
# The one sql_api query whose text differs per engine: Spark 4 spells
# the ordered string aggregate `listagg(x, sep) WITHIN GROUP (ORDER BY
# ...)`, DuckDB spells it `string_agg(x, sep ORDER BY ...)`. Both use
# GROUP BY ALL (which DuckDB pioneered and Spark 4 adopted).
_LISTAGG_SPARK = """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY ALL
    )
    SELECT event_type, COUNT(*) AS n_busy_days,
           listagg(CAST(day AS STRING), ',')
             WITHIN GROUP (ORDER BY day) AS busy_days
    FROM daily
    WHERE n > (SELECT AVG(n) FROM daily)
    GROUP BY ALL
    ORDER BY event_type
"""

_LISTAGG_DUCK = """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events GROUP BY ALL
    )
    SELECT event_type, COUNT(*) AS n_busy_days,
           string_agg(CAST(day AS VARCHAR), ',' ORDER BY day)
             AS busy_days
    FROM daily
    WHERE n > (SELECT AVG(n) FROM daily)
    GROUP BY ALL
    ORDER BY event_type
"""


@register(
    "listagg_group_by_all",
    _LISTAGG_DUCK,
    doc=(
        "Ordered LISTAGG + GROUP BY ALL (both Spark 4 additions): "
        "above-average busy days per event type concatenated in day "
        "order — WITHIN GROUP ordering makes the string deterministic, "
        "and the scalar-subquery threshold decorrelates to a broadcast "
        "1-row join"
    ),
)
def listagg_group_by_all(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(_LISTAGG_SPARK)


# ---------------------------------------------------------------------------
# Kaplan-Meier time-to-conversion survival (recursive running product)
# ---------------------------------------------------------------------------
# One template, two datediff spellings (Spark: datediff(end, start);
# DuckDB: datediff('day', start, end)) — everything else is shared
# ANSI, including the WITH RECURSIVE running product.
_KM_TEMPLATE = """
    WITH RECURSIVE
    bounds AS (
      SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS max_day
      FROM events
    ),
    peruser AS (
      SELECT user_id,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(date_trunc('day', ts) AS DATE)
                 END) AS conv_day
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT CASE WHEN conv_day IS NOT NULL
                  THEN {dd_conv}
                  ELSE {dd_cens} END AS dur,
             CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM peruser CROSS JOIN bounds
    ),
    nt AS (SELECT COUNT(*) AS n_total FROM obs),
    life AS (
      SELECT dur, SUM(ev) AS d, COUNT(*) AS leaving
      FROM obs GROUP BY dur
    ),
    ranked0 AS (
      SELECT dur, d, leaving,
             SUM(leaving) OVER (ORDER BY dur) AS cum_leave
      FROM life
    ),
    ranked AS (
      SELECT dur, d, leaving, cum_leave,
             ROW_NUMBER() OVER (ORDER BY dur) AS rk
      FROM ranked0 WHERE d > 0
    ),
    km(rk, dur, d, n_risk, s) AS (
      SELECT r.rk, r.dur, r.d,
             nt.n_total - r.cum_leave + r.leaving,
             1.0 - CAST(r.d AS DOUBLE)
                   / (nt.n_total - r.cum_leave + r.leaving)
      FROM ranked r CROSS JOIN nt WHERE r.rk = 1
      UNION ALL
      SELECT r.rk, r.dur, r.d,
             nt.n_total - r.cum_leave + r.leaving,
             km.s * (1.0 - CAST(r.d AS DOUBLE)
                           / (nt.n_total - r.cum_leave + r.leaving))
      FROM km JOIN ranked r ON r.rk = km.rk + 1 CROSS JOIN nt
    )
    SELECT CAST(dur AS BIGINT) AS duration_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           round(s, 6) AS survival
    FROM km
"""

_KM_DUCK = _KM_TEMPLATE.format(
    dd_conv="datediff('day', first_day, conv_day)",
    dd_cens="datediff('day', first_day, max_day)",
)

# Spark executes the SAME text in two stages: the life-table prefix
# (everything before the recursion) is materialized ONCE with
# localCheckpoint and registered as a view — Spark's recursive-CTE
# loop re-evaluates every CTE its recursive member references on EACH
# iteration, and re-running the events scan + windows per step
# measured 7.3 s at sf0.1 vs ~1 s over the pinned 16-row table.
_KM_SPARK_LIFE = """
    WITH peruser AS (
      SELECT user_id,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(date_trunc('day', ts) AS DATE)
                 END) AS conv_day
      FROM events GROUP BY user_id
    ),
    bounds AS (
      SELECT MAX(CAST(date_trunc('day', ts) AS DATE)) AS max_day
      FROM events
    ),
    obs AS (
      SELECT CASE WHEN conv_day IS NOT NULL
                  THEN datediff(conv_day, first_day)
                  ELSE datediff(max_day, first_day) END AS dur,
             CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM peruser CROSS JOIN bounds
    ),
    nt AS (SELECT COUNT(*) AS n_total FROM obs),
    life AS (
      SELECT dur, SUM(ev) AS d, COUNT(*) AS leaving
      FROM obs GROUP BY dur
    ),
    ranked0 AS (
      SELECT dur, d, leaving,
             SUM(leaving) OVER (ORDER BY dur) AS cum_leave
      FROM life
    )
    SELECT dur, d, leaving, cum_leave,
           ROW_NUMBER() OVER (ORDER BY dur) AS rk,
           (SELECT n_total FROM nt) AS n_total
    FROM ranked0 WHERE d > 0
"""

_KM_SPARK_WALK = """
    WITH RECURSIVE
    km(rk, dur, d, n_risk, s) AS (
      SELECT r.rk, r.dur, r.d,
             r.n_total - r.cum_leave + r.leaving,
             1.0 - CAST(r.d AS DOUBLE)
                   / (r.n_total - r.cum_leave + r.leaving)
      FROM km_life r WHERE r.rk = 1
      UNION ALL
      SELECT r.rk, r.dur, r.d,
             r.n_total - r.cum_leave + r.leaving,
             km.s * (1.0 - CAST(r.d AS DOUBLE)
                           / (r.n_total - r.cum_leave + r.leaving))
      FROM km JOIN km_life r ON r.rk = km.rk + 1
    )
    SELECT CAST(dur AS BIGINT) AS duration_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           round(s, 6) AS survival
    FROM km
"""


@register(
    "km_conversion_survival",
    _KM_DUCK,
    doc=(
        "Kaplan-Meier time-to-conversion survival curve: days from "
        "each user's first touch to first purchase, users who never "
        "purchase RIGHT-CENSORED at the observation end — S(t) = "
        "prod(1 - d_i/n_i) over event durations, the estimator that "
        "makes censored funnels honest (a naive conversion-lag "
        "percentile silently drops non-converters). The running "
        "PRODUCT is a Spark 4 recursive CTE walking the life table in "
        "duration order — a sequential fold both engines execute in "
        "the identical order, so the double chain is bit-equal "
        "(identical text up to the two datediff spellings). Scale "
        "shape: one hash agg to user grain, one to the DURATION-grain "
        "life table (calendar-bounded), recursion over EVENT durations only (censor-only "
        "durations contribute through the pre-filter cumulative "
        "at-risk, not loop steps — measured 7.4 -> ~4 s at sf0.1)."
    ),
)
def km_conversion_survival(spark, sf_dir):
    register_views(spark, sf_dir)
    life = spark.sql(_KM_SPARK_LIFE).localCheckpoint(eager=True)
    life.createOrReplaceTempView("km_life")
    return spark.sql(_KM_SPARK_WALK)
