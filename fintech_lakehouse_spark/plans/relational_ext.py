"""Round-3 relational extensions: TPC-H-shaped decorrelation /
conditional-agg / global-threshold queries (Q17/Q18/Q14/Q22/Q7
shapes). Kept in their own module so they REGISTER right after the
training-data families: the driver samples its per-round correctness
snapshot in registration order, and these queries have no driver rows
yet, while everything in plans/relational.py is multiple rounds green.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans._num import (
    dsum,
    money,
    sql_dsum,
    sql_isum,
    sql_money,
    sql_one_minus,
)
from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table

_SQL_EP = sql_money("l_extendedprice")
_SQL_DISC_PRICE = f"{_SQL_EP} * {sql_one_minus('l_discount')}"


def _disc_price():
    from fintech_lakehouse_spark.plans._num import one_minus

    return money("l_extendedprice") * one_minus("l_discount")


@register(
    "small_qty_avg_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS BIGINT)) AS s,
               COUNT(*) AS c
        FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small_lines,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7,
                 2) AS avg_yearly
    FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE 5 * CAST(l.l_quantity AS BIGINT) * pa.c < pa.s
    """,
)
def small_qty_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated aggregate: revenue from lineitems
    whose quantity is below 20% of their part's average quantity.
    The correlated subquery decorrelates into a per-part aggregate
    joined back on l_partkey — both sides shuffle-partition on the
    SAME key, so the join is co-partitioned with the agg (one exchange
    reused). The 20%-of-average test runs in exact integer arithmetic
    (5*qty*count < sum) — a double avg threshold comparison could flip
    at representation boundaries between engines."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    pa = lineitem.groupBy("l_partkey").agg(
        F.sum(qty).alias("s"), F.count(F.lit(1)).alias("c")
    )
    return (
        lineitem.join(pa, "l_partkey")
        .filter(F.lit(5) * qty * F.col("c") < F.col("s"))
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            F.round(
                F.sum(money("l_extendedprice")).cast("double") / 7, 2
            ).alias("avg_yearly"),
        )
    )


@register(
    "large_order_details",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               {sql_isum('CAST(l_quantity AS BIGINT)')} AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
    )
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           big.total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_order_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: orders whose lineitem
    quantity total exceeds 300, joined back to order and customer
    detail. The HAVING prunes the aggregate to a tiny survivor set
    BEFORE any join, so both dimension joins broadcast the survivors —
    at 100 TB the expensive side is one co-partitioned groupBy on
    l_orderkey and nothing else shuffles."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        F.broadcast(big)
        .join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@register(
    "promo_revenue_monthly",
    oracle=f"""
    SELECT date_trunc('month', l.l_shipdate) AS ship_month,
           ROUND(100 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN {_SQL_DISC_PRICE} ELSE CAST(0 AS DECIMAL(12,2)) END)
                 AS DOUBLE)
                 / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE), 4) AS promo_pct,
           {sql_dsum(_SQL_DISC_PRICE)} AS total_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY date_trunc('month', l.l_shipdate)
    """,
)
def promo_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion share, widened to a monthly series:
    per ship month, the percentage of discounted revenue from PROMO
    parts. part is a broadcast dimension (no shuffle on the fact);
    conditional aggregation folds both sums into ONE scan pass. The
    ratio divides two exact decimal sums cast to double — both engines
    divide identical operands, so the 4-dp round is deterministic."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100) * F.sum(promo).cast("double")
                / F.sum(disc).cast("double"),
                4,
            ).alias("promo_pct"),
            dsum(disc).alias("total_revenue"),
        )
    )


@register(
    "sales_opportunity_segments",
    oracle="""
    WITH m AS (
        SELECT SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) AS s,
               COUNT(*) AS c
        FROM customer WHERE c_acctbal > 0
    ),
    oc AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
    cu AS (
        SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
               COALESCE(oc.n, 0) AS n_orders
        FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2)
               AS total_acctbal
    FROM cu, m
    WHERE CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) * m.c > m.s
      AND n_orders < 6
    GROUP BY c_mktsegment
    """,
)
def sales_opportunity_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped sales opportunity: customers whose balance
    beats the positive-balance average but who placed fewer than six
    orders, grouped by market segment. The global average is a 1-row
    aggregate broadcast back over the scan (crossJoin of one row — the
    scale-safe way to apply a global statistic), and the above-average
    test runs in exact integer cents (cents * count > sum_cents): a
    double avg threshold is exactly the comparison an ulp difference
    between engines can flip."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cents = (money("c_acctbal") * 100).cast("long")
    m = F.broadcast(
        customer.filter(F.col("c_acctbal") > 0).agg(
            F.sum(cents).alias("s"), F.count(F.lit(1)).alias("c")
        )
    )
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    cu = (
        customer.join(oc, customer.c_custkey == oc.o_custkey, "left")
        .select(
            "c_custkey",
            "c_acctbal",
            "c_mktsegment",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        )
    )
    return (
        cu.crossJoin(m)
        .filter((cents * F.col("c") > F.col("s")) & (F.col("n_orders") < 6))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(money("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           COUNT(*) AS n_lineitems,
           {sql_dsum(_SQL_DISC_PRICE)} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped cross-nation trade: discounted revenue between
    every (supplier nation, customer nation) pair per ship year. Six
    relations; the two big sides (lineitem, orders) shuffle on their
    join keys while supplier/customer/nation (twice, aliased) all
    broadcast — at 100 TB exactly one fact-fact exchange pair
    survives, everything else is map-side. The same-nation filter
    applies AFTER the dim joins on broadcast columns, costing nothing
    extra. Revenue is the exact decimal sum (plans/_num.py)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("s_nk") != F.col("c_nk"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dsum(_disc_price()).alias("revenue"),
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
    WITH oc AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM oc
    GROUP BY n_orders
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped order-count distribution: how many customers
    placed exactly N orders (customers with zero orders count at
    N=0 — the LEFT join is the point of the query; an inner join
    silently drops them). Two aggregations: the first shuffles on
    the customer key, the second on the tiny distinct-count domain.
    The classic histogram shape for engagement/cohort reporting."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_customer = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_customer.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "discounted_brand_revenue",
    oracle=f"""
    SELECT COUNT(*) AS n_lineitems,
           {sql_dsum(_SQL_DISC_PRICE)} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def discounted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: an OR of
    brand/size/quantity conjunctions across the join. Catalyst derives
    the cross-side implications (brand IN (...) pushes into the part
    scan, quantity BETWEEN 1 AND 30 into the lineitem scan) so both
    scans prune BEFORE the broadcast join even though no single
    conjunct is common — the canonical test that complex boolean
    pushdown works. Revenue is the exact decimal sum."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dsum(_disc_price()).alias("revenue"),
        )
    )


@register(
    "top_revenue_supplier",
    oracle=f"""
    WITH sr AS (
        SELECT l_suppkey, {sql_dsum(_SQL_DISC_PRICE)} AS total_revenue
        FROM lineitem GROUP BY l_suppkey
    ),
    m AS (SELECT MAX(total_revenue) AS max_rev FROM sr)
    SELECT s.s_suppkey, s.s_name, sr.total_revenue
    FROM sr JOIN supplier s ON s.s_suppkey = sr.l_suppkey, m
    WHERE sr.total_revenue = m.max_rev
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: per-supplier revenue, then the
    supplier(s) achieving the maximum (ties all emit — a LIMIT 1
    would be nondeterministic). The max is a 1-row aggregate broadcast
    back over the supplier-cardinality aggregate; comparing the
    already-rounded decimal-exact revenue keeps the equality
    engine-deterministic (a double==double on unrounded sums would
    not be)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    sr = lineitem.groupBy("l_suppkey").agg(
        dsum(_disc_price()).alias("total_revenue")
    )
    m = F.broadcast(sr.agg(F.max("total_revenue").alias("max_rev")))
    return (
        sr.join(F.broadcast(supplier), sr.l_suppkey == supplier.s_suppkey)
        .crossJoin(m)
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "forecast_revenue_change",
    oracle="""
    SELECT COUNT(*) AS n_lineitems,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)
               AS potential_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecasting aggregate: the revenue that would
    have been gained had mid-range discounts on small orders been
    eliminated. Zero joins, one scan — every predicate (ship-date
    range, discount band, quantity cap) pushes into the parquet scan,
    so at 100 TB the query reads only the row groups whose min/max
    stats intersect the bands. The ep*discount product runs in exact
    decimal and rounds in decimal (plans/_num.py rule)."""
    from fintech_lakehouse_spark.plans._num import rate

    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum(money("l_extendedprice") * rate("l_discount")), 2)
            .cast("double")
            .alias("potential_revenue"),
        )
    )


@register(
    "sole_late_supplier_orders",
    oracle="""
    WITH late AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) > 90
    )
    SELECT s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def sole_late_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted to the test lake's columns (no
    commitdate/receiptdate — "late" is shipping >90 days after the
    order date): for each supplier, count multi-supplier orders where
    THEY were the only late supplier. The signature composition —
    EXISTS plus NOT EXISTS against the SAME fact with an inequality
    on the correlation key — realizes as a left-SEMI then a
    left-ANTI self-join (equi on orderkey carries the shuffle, the
    suppkey inequality rides as a join residual), the plan Spark
    needs at 100 TB because neither quantifier widens or duplicates
    the probe side. Late lines are first collapsed to DISTINCT
    (orderkey, suppkey) so multi-line orders count once. Top-20 by a
    total order (numwait desc, name) is TakeOrderedAndProject."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    late = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            > 90
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late
    l2 = lineitem.select(
        F.col("l_orderkey").alias("_k2"), F.col("l_suppkey").alias("_s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("_k3"), F.col("l_suppkey").alias("_s3")
    )
    sole_late = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("_k2"))
            & (F.col("l_suppkey") != F.col("_s2")),
            "leftsemi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("_k3"))
            & (F.col("l_suppkey") != F.col("_s3")),
            "leftanti",
        )
    )
    out = (
        sole_late.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )
    return out


@register(
    "high_volume_part_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type LIKE 'PROMO%'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 50
    )
    ORDER BY s_name
    """,
)
def high_volume_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape adapted to the test lake (no partsupp table —
    availability is proxied by shipped volume): suppliers whose total
    shipped quantity of PROMO-type parts exceeds a threshold. The
    signature structure — IN over a GROUP BY ... HAVING subquery —
    realizes as an aggregate-then-left-SEMI chain: the fact⋈part
    semi-filter prunes to promo lines (dim broadcast), the per-
    supplier aggregate collapses the fact map-side before its
    shuffle, the HAVING is a post-agg filter, and the final semi join
    never duplicates supplier rows. The sort is supplier-cardinality,
    post-aggregation."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    promo_volume = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type").like("PROMO%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 50)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            promo_volume, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "cheapest_supplier_per_part",
    oracle="""
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               (CAST(l_extendedprice AS DECIMAL(12,2)) * 1000000)::BIGINT
                   // CAST(l_quantity AS BIGINT) AS unit_price_e6
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
    ),
    mins AS (
        SELECT l_partkey, MIN(unit_price_e6) AS min_unit_price
        FROM unit GROUP BY l_partkey
    )
    SELECT u.l_partkey AS partkey, u.l_suppkey AS suppkey,
           u.unit_price_e6
    FROM unit u JOIN mins m
      ON u.l_partkey = m.l_partkey AND u.unit_price_e6 = m.min_unit_price
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated MIN subquery): for each part of one
    brand, the supplier(s) offering the minimum unit price — realized
    as groupwise-MIN then an equality JOIN-BACK, the decorrelated
    plan Spark produces for `WHERE price = (SELECT MIN … WHERE
    correlated)`. Unlike the window-argmin formulation
    (latest_order_per_customer), the join-back returns ALL tied
    minima — Q2's actual semantics. Brand filter broadcast into the
    fact scan bounds the probe; the min agg collapses map-side before
    its shuffle.

    Unit price is computed ENTIRELY in exact integers — micro-units:
    floor(cents × 10⁴ / quantity) — per the plans/_num.py discipline.
    The r5 formulation divided doubles and ROUND(…, 4)-ed for
    display; at sf0.1 it hit a real quotient midpoint
    (20355.17 / 40 = 508.87925 exactly in decimal, stored as the
    double 508.87924999999996): Spark rounds the BINARY value (down),
    DuckDB rounds the shortest-decimal rendering (up) — a one-ulp
    display flake the smaller SFs dodged by data luck (caught by the
    r6 full sf0.1 sweep). Integer floor-division is bit-identical in
    both engines at every SF; min/tie semantics now operate at 1e-6
    price granularity, which collapses no real ties in this data."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    unit = lineitem.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 1000000 AS BIGINT)"
            " div CAST(l_quantity AS BIGINT)"
        ).alias("unit_price_e6"),
    )
    mins = unit.groupBy(F.col("l_partkey").alias("_mk")).agg(
        F.min("unit_price_e6").alias("min_unit_price")
    )
    return (
        unit.join(
            mins,
            (F.col("l_partkey") == F.col("_mk"))
            & (F.col("unit_price_e6") == F.col("min_unit_price")),
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "unit_price_e6",
        )
    )


@register(
    "nation_market_share_by_year",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT)
               AS order_year,
           {sql_dsum(f"CASE WHEN n_name = 'NATION_7' THEN {sql_money('l_extendedprice')} ELSE CAST(0 AS DECIMAL(12,2)) END")}
               AS nation_revenue,
           {sql_dsum(sql_money('l_extendedprice'))} AS total_revenue,
           ROUND({sql_dsum(f"CASE WHEN n_name = 'NATION_7' THEN {sql_money('l_extendedprice')} ELSE CAST(0 AS DECIMAL(12,2)) END")}
                 / {sql_dsum(sql_money('l_extendedprice'))}, 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def nation_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share): per order year, the fraction of
    global supplier revenue contributed by one nation — the
    conditional-fraction pattern (SUM(CASE)/SUM) computed in ONE
    aggregate pass instead of a self-join of two aggregates. Both
    sums follow the exact-decimal round-then-cast discipline
    (plans/_num.py); the share divides the two already-rounded
    doubles, a single IEEE op, then rounds — deterministic on both
    engines. Scale shape: dims (supplier, nation) broadcast; the one
    fact-fact exchange is lineitem⋈orders on orderkey; the yearly
    aggregate collapses map-side to ≤7 rows per task."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    is_n7 = F.col("n_name") == "NATION_7"
    zero = F.lit(0).cast("decimal(12,2)")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy(
        F.year(F.col("o_orderdate").cast("date")).cast("long").alias("order_year")
    ).agg(
        dsum(F.when(is_n7, money("l_extendedprice")).otherwise(zero)).alias(
            "nation_revenue"
        ),
        dsum(money("l_extendedprice")).alias("total_revenue"),
    )
    return agg.select(
        "order_year",
        "nation_revenue",
        "total_revenue",
        F.round(
            F.col("nation_revenue") / F.col("total_revenue"), 6
        ).alias("mkt_share"),
    )


@register(
    "nation_profit_by_year",
    oracle=f"""
    SELECT n_name,
           CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT)
               AS order_year,
           {sql_dsum(f"{_SQL_DISC_PRICE} - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.08 AS DECIMAL(3,2))")}
               AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, 2
    """,
)
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape adapted to the test lake (no partsupp —
    supply cost is proxied as 8% of the part's retail price): profit
    per supplier nation per order year, where the measure is a
    DERIVED DECIMAL EXPRESSION over columns from three relations
    (discounted revenue minus proxied cost), not a bare column sum.
    All arithmetic stays in controlled-width decimals until the final
    round-then-cast (plans/_num.py discipline) so the 175-group sums
    hash exactly against DuckDB.

    Scale shape: part/supplier/nation broadcast (part is the largest
    dim — 2k rows at sf0.01, still far under the broadcast
    threshold at any realistic dim size); the single fact-fact
    exchange is lineitem⋈orders on orderkey; the (nation, year)
    aggregate collapses map-side to ≤175 rows per task before its
    shuffle."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    from fintech_lakehouse_spark.plans._num import one_minus

    cost_rate = F.lit(0.08).cast("decimal(3,2)")
    profit_term = money("l_extendedprice") * one_minus("l_discount") - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * cost_rate
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.year(F.col("o_orderdate").cast("date"))
            .cast("long")
            .alias("order_year"),
        )
        .agg(dsum(profit_term).alias("profit"))
    )
