"""Round-6 relational extensions: the two TPC-H shapes still missing
from the registry — Q10 (returned-item reporting: agg over a
fact-fact join, then top-k) and Q12 (conditional two-way counts over
a join, adapted to the test lake's columns: no l_shipmode /
l_commitdate / l_receiptdate, so lateness buckets of
l_shipdate − o_orderdate stand in for the shipmode dimension).
Own module so the queries register as never-checked and rotation
front-loads them into the next driver window."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans._num import (
    dsum,
    money,
    one_minus,
    sql_dsum,
    sql_isum,
    sql_money,
    sql_one_minus,
)
from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table

_SQL_EP = sql_money("l_extendedprice")
_SQL_DISC_PRICE = f"{_SQL_EP} * {sql_one_minus('l_discount')}"


@register(
    "returned_item_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum(_SQL_DISC_PRICE)} AS revenue_lost,
           {sql_isum('1')}             AS n_returned_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_lost DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: the 20 customers
    who returned the most revenue (the chargeback/fraud review queue a
    fintech runs daily; ref's l_returnflag analog is transaction
    status REVERSED/DISPUTED, src/config/base.py enum).

    Plan shape at 100 TB: the returnflag filter pushes to the
    lineitem scan (~25% selectivity), the surviving rows join orders
    on the SINGLE fact-fact exchange (orderkey — the bucketing key of
    write_bucketed_table, which would eliminate even that), customer
    and nation broadcast, and the top-20 runs as
    TakeOrderedAndProject — no global sort ever materializes.
    Revenue in exact decimal (plans/_num.py) with the custkey
    tie-break making the LIMIT boundary deterministic."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(money("l_extendedprice") * one_minus("l_discount")).alias(
                "revenue_lost"
            ),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.col("revenue_lost").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "shipment_delay_priority",
    oracle=f"""
    SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'very_late'
                WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 30
                THEN 'late'
                ELSE 'on_time' END AS delay_bucket,
           {sql_isum("CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END")}
               AS high_priority_lines,
           {sql_isum("CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END")}
               AS low_priority_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY delay_bucket
    """,
)
def shipment_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional two-way counts over the fact-fact
    join: how many high- vs low-priority order lines fall in each
    shipping-delay bucket (the SLA-breach dashboard split; the test
    lake has no l_shipmode/l_receiptdate, so delay buckets of
    l_shipdate − o_orderdate are the grouping dimension).

    Shape notes: only (l_orderkey, l_shipdate) survive the lineitem
    scan and (o_orderkey, o_orderdate, o_orderpriority) the orders
    scan (column pruning); the join is the single orderkey exchange;
    the CASE-WHEN pair is map-side partial-aggregated into 3 output
    rows, so the reduce stage moves O(tasks×3) rows at any scale —
    the one-pass conditional-aggregation design the DQ checker uses
    (SURVEY §4.1)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(delay > 90, "very_late")
            .when(delay > 30, "late")
            .otherwise("on_time")
            .alias("delay_bucket"),
            high.alias("_high"),
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).alias(
                "high_priority_lines"
            ),
            F.sum(F.when(~F.col("_high"), 1).otherwise(0)).alias(
                "low_priority_lines"
            ),
        )
    )
