"""Extended TPC-H-style surface (SURVEY.md §2.3 note / §7 Phase 2).

The reference contains a single join shape (the dbt relationships test,
/root/reference/dbt/models/dwh/schema.yml:19-22); the rest of the join /
aggregate surface below exists because a complete engine must run the
multi-table analytics a reference user would expect. Queries are adapted
TPC-H where the testdata schema lacks a column (no partsupp, l_shipmode,
l_commitdate, c_phone, p_mfgr):

- q7/q8/q9: multi-way fact⋈dim plans — dims (nation/supplier/part/region)
  are broadcast, the lineitem⋈orders fact-fact join shuffles on the
  orderkey; nation/region predicates are pushed below the fact join so
  the shuffled side is pre-reduced (the scale-critical property).
- q12/q13/q14/q16: conditional aggregation, left-join distribution,
  ratio-of-sums, distinct-agg.
- q15/q17/q22: scalar-subquery shapes (global max, per-group correlated
  threshold, global average) — expressed as broadcast one-row joins /
  pre-aggregated self-joins, never a driver-side collect of a big side.
- q19/q20: OR-of-ANDs pushdown and semi-join with an inner-join subquery.

Determinism: every float SUM/AVG accumulates in DECIMAL then converts to
double exactly once (see queries/__init__ docstring), so the driver's
value-hash is stable across partition orders and engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metar_pipeline_spark.io import load_table
from metar_pipeline_spark.operators.joins import broadcast_dim_join
from metar_pipeline_spark.queries import register
from metar_pipeline_spark.queries.core import DEC2, _dsum


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7: nation-pair trade volume by year; nation filters pushed below the fact join",
)
def tpch_q7_volume_shipping(spark, sf_dir):
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    # Pre-reduce both fact inputs with the broadcast nation dim BEFORE the
    # fact-fact shuffle: at 100 TB this cuts the shuffled volume ~12x.
    supp = broadcast_dim_join(
        load_table(spark, sf_dir, "supplier"),
        nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust = broadcast_dim_join(
        load_table(spark, sf_dir, "customer"),
        nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1999-01-01"))
    )
    orders = broadcast_dim_join(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        cust,
        F.col("o_custkey") == F.col("c_custkey"),
    )
    joined = (
        broadcast_dim_join(li, supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    """
    SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           round(CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END AS DECIMAL(30,10))) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey AND r.r_name = 'EUROPE'
    GROUP BY 1
    """,
    doc="TPC-H Q8: NATION_3 market share of PROMO parts in EUROPE by year (ratio of decimal sums)",
)
def tpch_q8_market_share(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp_nat = broadcast_dim_join(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        ),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    eur_nations = broadcast_dim_join(
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("c_nk"))
    cust = broadcast_dim_join(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
        eur_nations,
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey")
    orders = broadcast_dim_join(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate"
        ),
        cust,
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("o_orderkey", "o_orderdate")
    li = broadcast_dim_join(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        ),
        part.select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    li = broadcast_dim_join(li, supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            _dsum(nation_vol).alias("__num"),
            _dsum(vol).alias("__den"),
        )
        .select(
            "o_year",
            F.round(F.col("__num") / F.col("__den"), 6).alias("mkt_share"),
        )
    )


@register(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 (adapted, no supplycost): widget-part profit by supplier nation and order year",
)
def tpch_q9_product_profit(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    supp_nat = broadcast_dim_join(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("__nk"), F.col("n_name").alias("nation")
        ),
        F.col("s_nationkey") == F.col("__nk"),
    ).select("s_suppkey", "nation")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    li = broadcast_dim_join(
        li, part.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey")
    )
    li = broadcast_dim_join(li, supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
    joined = li.join(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_profit")
        )
    )


@register(
    "tpch_q12_priority_shipping",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    doc="TPC-H Q12 (adapted, no shipmode): priority-split conditional counts over the fact-fact join",
)
def tpch_q12_priority_shipping(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    ).select("l_orderkey", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
    doc="TPC-H Q13: order-count distribution via conditional LEFT JOIN + double aggregation",
)
def tpch_q13_customer_distribution(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14_promo_revenue",
    """
    SELECT round(CAST(100.0 AS DOUBLE)
                 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END AS DECIMAL(30,10))) AS DOUBLE)
                 / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    doc="TPC-H Q14: promo revenue percentage — ratio of conditional decimal sums, broadcast part dim",
)
def tpch_q14_promo_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = broadcast_dim_join(
        li, part, F.col("l_partkey") == F.col("p_partkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0))
    return joined.agg(
        _dsum(promo).alias("__num"), _dsum(vol).alias("__den")
    ).select(
        F.round(
            F.lit(100.0).cast("double") * F.col("__num") / F.col("__den"), 6
        ).alias("promo_revenue")
    )


@register(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue — global-max scalar as a broadcast 1-row join",
)
def tpch_q15_top_supplier(spark, sf_dir):
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    # Scalar MAX as a broadcast one-row cross join — no driver collect, no
    # single-partition window; the same plan shape works at any scale.
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx")).drop(
        "__mx"
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return broadcast_dim_join(
        top, supplier, F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "total_revenue")


@register(
    "tpch_q16_supplier_part_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 (adapted, lineitem for partsupp): distinct-supplier counts per part group",
)
def tpch_q16_supplier_part_cnt(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        broadcast_dim_join(li, part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_qty_revenue",
    """
    SELECT round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey,
             CAST(0.2 AS DOUBLE) * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS qty_thresh
      FROM lineitem
      GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND l.l_quantity < t.qty_thresh
    """,
    doc="TPC-H Q17: correlated avg-quantity threshold as a pre-aggregated self-join (no per-row subquery)",
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # The correlated subquery decorrelates to one partial-aggregated pass
    # over lineitem — a single shuffle on l_partkey, reused by the join.
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2).cast("double")
            * (_dsum(F.col("l_quantity"), DEC2) / F.count(F.lit(1)))
        ).alias("qty_thresh")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    joined = (
        broadcast_dim_join(li, part, F.col("l_partkey") == F.col("p_partkey"))
        .join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
    )
    return joined.agg(
        F.round(_dsum(F.col("l_extendedprice"), DEC2) / F.lit(7.0), 6).alias(
            "avg_yearly"
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19: OR-of-ANDs mixed-table predicate applied post-broadcast-join",
)
def tpch_q19_discounted_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    joined = broadcast_dim_join(
        li, part, F.col("l_partkey") == F.col("p_partkey")
    ).filter(cond)
    return joined.agg(
        F.round(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


@register(
    "tpch_q20_promo_suppliers",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_suppkey = s.s_suppkey AND p.p_type = 'PROMO'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01')
    """,
    doc="TPC-H Q20 (adapted): suppliers of PROMO parts in 1997 — LEFT SEMI over a broadcast-joined subquery",
)
def tpch_q20_promo_suppliers(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    ).select("l_partkey", "l_suppkey")
    promo_suppliers = broadcast_dim_join(
        li, part, F.col("l_partkey") == F.col("p_partkey")
    ).select("l_suppkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supplier.join(
        promo_suppliers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    )


@register(
    "tpch_q22_idle_customers",
    """
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           round(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS totacctbal
    FROM customer c, (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    ) avgbal
    WHERE c.c_acctbal > avgbal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 (adapted, no phone): rich customers with no recent orders — broadcast scalar avg + LEFT ANTI",
)
def tpch_q22_idle_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    avgbal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (_dsum(F.col("c_acctbal"), DEC2) / F.count(F.lit(1))).alias("__avg")
    )
    rich = cust.join(F.broadcast(avgbal)).filter(
        F.col("c_acctbal") > F.col("__avg")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2001-01-01"))
        .select("o_custkey")
    )
    idle = rich.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(_dsum(F.col("c_acctbal"), DEC2), 2).alias("totacctbal"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ),
    best AS (
      SELECT l_partkey, l_suppkey, unit_cost FROM (
        SELECT ps.*, ROW_NUMBER() OVER (
          PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey
        ) AS rn FROM ps
      ) t WHERE rn = 1
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, b.unit_cost
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size <= 5
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
    doc="TPC-H Q2 (adapted, lineitem economics for partsupp): cheapest supplier per small part — two-level agg + argmin",
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") <= 5
    ).select("p_partkey", "p_name")
    # The p_size filter joins BEFORE the big aggregation (broadcast
    # semi): at 100 TB this cuts the agg's shuffle to the qualifying
    # parts' share of lineitem instead of aggregating everything and
    # discarding most of it. Same result — the oracle keeps the
    # aggregate-then-filter text.
    li_small = li.join(
        F.broadcast(part.select("p_partkey")),
        li["l_partkey"] == F.col("p_partkey"),
        "left_semi",
    )
    ps = li_small.groupBy("l_partkey", "l_suppkey").agg(
        F.round(
            _dsum(F.col("l_extendedprice"), DEC2)
            / _dsum(F.col("l_quantity"), DEC2),
            6,
        ).alias("unit_cost")
    )
    # argmin via min(struct): one more partial+final agg round instead
    # of a per-part sort — (unit_cost, l_suppkey) struct order matches
    # the oracle's ORDER BY unit_cost, l_suppkey tiebreak.
    best = ps.groupBy("l_partkey").agg(
        F.min(F.struct("unit_cost", "l_suppkey")).alias("b")
    ).select(
        "l_partkey",
        F.col("b.l_suppkey").alias("l_suppkey"),
        F.col("b.unit_cost").alias("unit_cost"),
    )
    supp_nat = broadcast_dim_join(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "n_name")
    return (
        broadcast_dim_join(best, part, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
    )


@register(
    "tpch_q11_important_stock",
    """
    WITH pv AS (
      SELECT l.l_partkey,
             round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_1'
      GROUP BY l.l_partkey
    ),
    tot AS (
      SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,2))) AS DOUBLE) AS t FROM pv
    )
    SELECT pv.l_partkey AS partkey, pv.part_value
    FROM pv, tot
    WHERE pv.part_value > 0.001 * tot.t
    """,
    doc="TPC-H Q11 (adapted): parts above a fraction of one nation's total volume — HAVING vs broadcast global scalar",
)
def tpch_q11_important_stock(spark, sf_dir):
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1"
    )
    supp = broadcast_dim_join(
        load_table(spark, sf_dir, "supplier"),
        nat.select("n_nationkey"),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    pv = (
        broadcast_dim_join(
            load_table(spark, sf_dir, "lineitem"),
            supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(F.round(_dsum(F.col("l_extendedprice"), DEC2), 2).alias("part_value"))
    )
    tot = pv.agg(_dsum(F.col("part_value"), DEC2).alias("t"))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("t"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


@register(
    "tpch_q21_suppliers_kept_waiting",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_1'
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY s.s_name
    """,
    doc=(
        "TPC-H Q21 (adapted: late := shipped >30 days after order date, no "
        "receipt/commit dates in testdata): sole-late supplier on multi-"
        "supplier 'F' orders. EXISTS/NOT EXISTS decorrelated to one "
        "per-order aggregate (n distinct suppliers / n distinct late "
        "suppliers) — one extra shuffle instead of two correlated "
        "re-scans of lineitem; the scale-correct plan for a 100 TB fact."
    ),
)
def tpch_q21_suppliers_kept_waiting(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    # Fact-fact equi-join on orderkey (shuffle), then ONE per-order agg
    # replaces both correlated subqueries.
    l = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    sole_late_orders = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey")
    waiting_lines = l.filter(F.col("late")).join(
        sole_late_orders, "l_orderkey"
    )
    supp = broadcast_dim_join(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_1")
        .select("n_nationkey"),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        waiting_lines.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "order_backlog_sweepline",
    """
    WITH iv AS (
      SELECT CAST(o_orderdate AS DATE) AS open_day,
             CAST(o_orderdate AS DATE)
               + CAST((1 + o_orderkey % 90) AS INTEGER) AS close_day
      FROM orders
    ), deltas AS (
      SELECT open_day AS day, CAST(1 AS BIGINT) AS delta FROM iv
      UNION ALL
      SELECT close_day, CAST(-1 AS BIGINT) FROM iv
    ), daily AS (
      SELECT day, SUM(delta) AS net FROM deltas GROUP BY day
    )
    SELECT day,
           CAST(SUM(net) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS open_orders
    FROM daily
    """,
    doc=(
        "Concurrent-intervals backlog via the sweep line: each order "
        "contributes +1 at open and -1 at close (synthetic 1-90-day "
        "fulfilment from the orderkey), net deltas aggregate per day "
        "FIRST (map-side combinable, |days| rows), then ONE cumulative "
        "sum over the calendar-bounded day grain. The O(n) alternative "
        "to the per-day interval-containment join, and the shape that "
        "answers any 'how many X were open at time T' at 100 TB."
    ),
)
def order_backlog_sweepline(spark, sf_dir):
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    open_day = F.col("o_orderdate").cast("date")
    close_day = F.date_add(
        open_day, (1 + F.col("o_orderkey") % 90).cast("int")
    )
    iv = orders.select(open_day.alias("open_day"), close_day.alias("close_day"))
    deltas = iv.select(
        F.col("open_day").alias("day"), F.lit(1).cast("bigint").alias("delta")
    ).unionAll(
        iv.select(
            F.col("close_day").alias("day"),
            F.lit(-1).cast("bigint").alias("delta"),
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day", F.sum("net").over(w).cast("bigint").alias("open_orders")
    )


@register(
    "shipping_lag_percentiles",
    """
    WITH lag AS (
      SELECT o.o_orderpriority,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT)
                 AS lag_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(round(quantile_cont(lag_days, 0.5), 0) AS BIGINT)
               AS p50_days,
           CAST(round(quantile_cont(lag_days, 0.9), 0) AS BIGINT)
               AS p90_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_days
    FROM lag GROUP BY o_orderpriority
    """,
    doc=(
        "Order-to-ship latency profile by priority: integer-day "
        "percentiles of (shipdate - orderdate) over the fact-fact "
        "join (broadcast orders side at these SFs, shuffled+AQE at "
        "scale) — integer in, integer out, so interpolation "
        "half-cases cannot drift. The supply-chain SLA readout."
    ),
)
def shipping_lag_percentiles(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("od"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    lag = li.join(
        F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "o_orderpriority", F.datediff("sd", "od").cast("bigint").alias("lag_days")
    )
    return lag.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(F.expr("percentile(lag_days, 0.5)"), 0)
        .cast("bigint")
        .alias("p50_days"),
        F.round(F.expr("percentile(lag_days, 0.9)"), 0)
        .cast("bigint")
        .alias("p90_days"),
        F.max("lag_days").cast("bigint").alias("max_days"),
    )
