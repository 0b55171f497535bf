"""Core relational queries: scans, projections, filters, joins, aggs,
sorts, set ops (SURVEY.md §2.1-§2.8).

These are the medallion/gold-layer analytics the reference declares
(agg_daily_metrics / agg_customer_360 / agg_merchant_performance at
src/config/base.py:92-94) re-expressed over the driver's TPC-H-ish lake.

Money aggregates go through exact decimal arithmetic (see plans/_num.py)
so engine-vs-oracle value hashes are deterministic — double summation
order otherwise flips round() at boundary-aligned averages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans._num import (
    davg,
    dsum,
    money,
    one_minus,
    one_plus,
    rate,
    sql_davg,
    sql_dsum,
    sql_isum,
    sql_money,
    sql_one_minus,
    sql_one_plus,
)
from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table

# Shared money expressions (Spark side / SQL side).
_EP = lambda: money("l_extendedprice")  # noqa: E731
_DISC_PRICE = lambda: _EP() * one_minus("l_discount")  # noqa: E731
_SQL_EP = sql_money("l_extendedprice")
_SQL_DISC_PRICE = f"{_SQL_EP} * {sql_one_minus('l_discount')}"


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                AS sum_qty,
           {sql_dsum(_SQL_EP)}                                      AS sum_base_price,
           {sql_dsum(_SQL_DISC_PRICE)}                              AS sum_disc_price,
           {sql_dsum(f"{_SQL_DISC_PRICE} * {sql_one_plus('l_tax')}")} AS sum_charge,
           ROUND(SUM(l_quantity) / COUNT(*), 4)                     AS avg_qty,
           {sql_davg("l_extendedprice")}                                      AS avg_price,
           {sql_davg("l_discount")}          AS avg_disc,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → hash-agg, fully
    whole-stage-codegen'd; partial aggregation makes the shuffle tiny
    (6 groups regardless of input size). Quantities are integral so a
    double sum is already exact; money goes through decimals."""
    lineitem = load_table(spark, sf_dir, "lineitem", spread="l_orderkey")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            dsum(_EP()).alias("sum_base_price"),
            dsum(_DISC_PRICE()).alias("sum_disc_price"),
            dsum(_DISC_PRICE() * one_plus("l_tax")).alias("sum_charge"),
            F.round(F.sum("l_quantity") / F.count(F.lit(1)), 4).alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum(_SQL_DISC_PRICE)}  AS revenue,
           CAST(o_orderdate AS DATE)    AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective filters on both join sides (pushed to
    the parquet scans), two equi-joins, agg, top-k.

    The final orderBy+limit plans as TakeOrderedAndProject — no global
    sort materialization at scale. Revenue is decimal-exact so the
    top-10 cut is engine-deterministic."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders", spread="o_orderkey")
    lineitem = load_table(spark, sf_dir, "lineitem", spread="l_orderkey")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            lineitem.filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(dsum(_DISC_PRICE()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "regional_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dsum(_SQL_DISC_PRICE)} AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY r_name, n_name
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-flavoured star join: region and nation are tiny dims →
    broadcast explicitly so the fact side never shuffles for them."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders", spread="o_orderkey")
    lineitem = load_table(spark, sf_dir, "lineitem", spread="l_orderkey")
    dims = F.broadcast(nation.join(region, nation.n_regionkey == region.r_regionkey))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            dsum(_DISC_PRICE()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "daily_order_metrics",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE)           AS order_date,
           COUNT(*)                            AS n_orders,
           {sql_dsum(sql_money('o_totalprice'))} AS total_value,
           {sql_davg("o_totalprice")} AS avg_value,
           COUNT(DISTINCT o_custkey)           AS n_customers,
           ROUND(MAX(o_totalprice), 2)         AS max_value,
           ROUND(MIN(o_totalprice), 2)         AS min_value
    FROM orders
    GROUP BY CAST(o_orderdate AS DATE)
    """,
)
def daily_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_daily_metrics analog (ref: src/config/base.py:92): the daily
    rollup a medallion gold layer materializes. Group key = the storage
    partition column, so at scale this aggregates partition-locally."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_orderdate").cast("date").alias("order_date")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(money("o_totalprice")).alias("total_value"),
        davg("o_totalprice").alias("avg_value"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.max("o_totalprice"), 2).alias("max_value"),
        F.round(F.min("o_totalprice"), 2).alias("min_value"),
    )


@register(
    "customer_360",
    oracle=f"""
    SELECT c_custkey, c_name, c_mktsegment, n_name AS nation,
           COUNT(o_orderkey)                     AS n_orders,
           {sql_dsum(sql_money('o_totalprice'))} AS lifetime_value,
           {sql_davg("o_totalprice")} AS avg_order_value,
           CAST(MIN(o_orderdate) AS DATE)        AS first_order_date,
           CAST(MAX(o_orderdate) AS DATE)        AS last_order_date
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name, c_mktsegment, n_name
    """,
)
def customer_360(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_customer_360 analog (ref: src/config/base.py:93): per-entity
    profile = fact agg + dim join. nation broadcast; the orders↔customer
    join shuffles on custkey once (AQE picks broadcast when the filtered
    side is small)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment", F.col("n_name").alias("nation"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(money("o_totalprice")).alias("lifetime_value"),
            davg("o_totalprice").alias("avg_order_value"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_order_date"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_order_date"),
        )
    )


@register(
    "supplier_performance",
    oracle=f"""
    SELECT s_suppkey, s_name,
           {sql_dsum(_SQL_DISC_PRICE)}  AS revenue,
           COUNT(*)                     AS n_items,
           {sql_davg("l_discount")} AS avg_discount,
           {sql_dsum(f"{_SQL_EP} * CAST(l_discount AS DECIMAL(4,2))")} AS discount_given
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_suppkey, s_name
    """,
)
def supplier_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_merchant_performance analog (ref: src/config/base.py:94).
    Supplier dim is tiny → broadcast; lineitem aggregates after a
    map-side partial agg on suppkey."""
    lineitem = load_table(spark, sf_dir, "lineitem", spread="l_orderkey")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        lineitem.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(
            dsum(_DISC_PRICE()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            davg("l_discount").alias("avg_discount"),
            dsum(_EP() * rate("l_discount")).alias("discount_given"),
        )
    )


@register(
    "top_customers",
    oracle=f"""
    SELECT c_custkey, c_name, c_mktsegment,
           {sql_dsum(sql_money('o_totalprice'))} AS total_spend,
           COUNT(*)                              AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name, c_mktsegment
    ORDER BY total_spend DESC, c_custkey
    LIMIT 25
    """,
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k pattern (SURVEY §2.6 O1): agg → orderBy+limit plans as a
    TakeOrderedAndProject, never a full sort."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            dsum(money("o_totalprice")).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
        .limit(25)
    )


@register(
    "priority_returned_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def priority_returned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (TPC-H Q4 shape): EXISTS realized as leftsemi so
    the fact side is never widened or duplicated."""
    orders = load_table(spark, sf_dir, "orders")
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the referential-integrity / orphan check the
    reference declares but never implements (SURVEY §2.3 J2,
    ref: src/utils/data_quality.py:82)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "segment_nation_setops",
    oracle="""
    WITH building AS (SELECT DISTINCT c_nationkey FROM customer
                      WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 7000),
         machinery AS (SELECT DISTINCT c_nationkey FROM customer
                       WHERE c_mktsegment = 'MACHINERY' AND c_acctbal > 7000)
    SELECT 'building_only' AS side, c_nationkey FROM
        (SELECT c_nationkey FROM building EXCEPT SELECT c_nationkey FROM machinery)
    UNION ALL
    SELECT 'machinery_only' AS side, c_nationkey FROM
        (SELECT c_nationkey FROM machinery EXCEPT SELECT c_nationkey FROM building)
    UNION ALL
    SELECT 'both' AS side, c_nationkey FROM
        (SELECT c_nationkey FROM building INTERSECT SELECT c_nationkey FROM machinery)
    """,
)
def segment_nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (SURVEY §2.7, [ABSENT] in the reference): distinct,
    except, intersect, unionByName in one plan."""
    customer = load_table(spark, sf_dir, "customer")
    rich = customer.filter(F.col("c_acctbal") > 7000)
    building = (
        rich.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    )
    machinery = (
        rich.filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_nationkey")
        .distinct()
    )

    def tag(df: DataFrame, side: str) -> DataFrame:
        return df.select(F.lit(side).alias("side"), F.col("c_nationkey"))

    return (
        tag(building.exceptAll(machinery).distinct(), "building_only")
        .unionByName(tag(machinery.exceptAll(building).distinct(), "machinery_only"))
        .unionByName(tag(building.intersect(machinery), "both"))
    )


@register(
    "part_type_rollup",
    oracle=f"""
    SELECT p_type, p_brand,
           COUNT(*)                                AS n_parts,
           {sql_dsum(sql_money('p_retailprice'))}  AS total_retail,
           ROUND(SUM(p_size) / COUNT(*), 4)        AS avg_size
    FROM part
    GROUP BY ROLLUP (p_type, p_brand)
    """,
)
def part_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (SURVEY §2.4 A9, [ABSENT] in reference):
    subtotals per type, per type+brand, and grand total in one pass."""
    part = load_table(spark, sf_dir, "part")
    return part.rollup("p_type", "p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum(money("p_retailprice")).alias("total_retail"),
        F.round(F.sum("p_size") / F.count(F.lit(1)), 4).alias("avg_size"),
    )


@register(
    "silver_orders_enriched",
    oracle="""
    SELECT o_orderkey,
           CONCAT('ORD-', CAST(o_orderkey AS VARCHAR)) AS order_ref,
           CAST(o_orderdate AS DATE)                   AS order_date,
           CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INT)      AS order_dow,
           CAST(STR_SPLIT(o_orderpriority, '-')[1] AS INT) AS priority_code,
           ROUND(o_totalprice, 2)                      AS total_price,
           o_orderstatus = 'F'                         AS is_fulfilled
    FROM orders
    """,
)
def silver_orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze→Silver typed/derived projection (SURVEY §2.2 P12-P14):
    date-part derivation, split-and-cast enum codes, boolean flags,
    string concat — the implied Silver transform the reference declares
    in its schemas (ref: src/schemas/silver.py:57-59,73) but never codes.
    Pure narrow projection: no shuffle, whole-stage codegen end to end."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.concat_ws("-", F.lit("ORD"), F.col("o_orderkey")).alias("order_ref"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.split(F.col("o_orderpriority"), "-").getItem(0).cast("int").alias(
            "priority_code"
        ),
        F.round(F.col("o_totalprice"), 2).alias("total_price"),
        (F.col("o_orderstatus") == "F").alias("is_fulfilled"),
    )


@register(
    "lineitem_global_stats",
    oracle=f"""
    SELECT COUNT(*)                          AS n_rows,
           COUNT(DISTINCT l_orderkey)        AS n_orders,
           ROUND(SUM(l_quantity), 2)         AS total_qty,
           {sql_davg("l_extendedprice")}               AS avg_price,
           ROUND(MIN(l_extendedprice), 2)    AS min_price,
           ROUND(MAX(l_extendedprice), 2)    AS max_price,
           ROUND(STDDEV_SAMP(l_discount), 6) AS sd_discount
    FROM lineitem
    """,
)
def lineitem_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) aggregate incl. exact distinct + stddev
    (SURVEY §2.4 A1/A3/A4). At 100 TB swap countDistinct for
    approx_count_distinct — kept exact here because the oracle is exact."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_discount"),
    )


@register(
    "brand_supplier_diversity",
    oracle="""
    SELECT p.p_brand,
           substr(p.p_type, 1, 6)          AS type_prefix,
           COUNT(DISTINCT l.l_suppkey)     AS n_suppliers,
           COUNT(DISTINCT p.p_partkey)     AS n_parts
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size >= 10
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, type_prefix
    """,
)
def brand_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape adapted to the test lake (SURVEY §2.3/§2.4):
    how many distinct suppliers serve each (brand, type-prefix) —
    excluding deadbeat suppliers via an anti join. Part is the
    broadcast side; the NOT IN compiles to a broadcast anti join on a
    key-only projection (suppliers with negative balances), never a
    per-row subquery. Multiple distinct aggregates plan through one
    Expand."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    bad_suppliers = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        lineitem.join(bad_suppliers, "l_suppkey", "left_anti")
        .join(
            F.broadcast(
                part.select("p_partkey", "p_brand", "p_type")
            ),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            "p_brand", F.substring("p_type", 1, 6).alias("type_prefix")
        )
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )
