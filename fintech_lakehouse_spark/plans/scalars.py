"""Scalar-function surface + SQL-API queries (SURVEY §2.8).

The gallery query exercises the string/date/math/conditional scalar
set in one narrow projection; the SQL-API query runs through
``spark.sql`` over registered temp views — the engine's second query
surface (the reference registers tables in a metastore and queries by
name, src/utils/spark_utils.py:248-282).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table


@register(
    "scalar_function_gallery",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           lower(c_mktsegment)                             AS segment_lower,
           length(c_name)                                  AS name_len,
           substring(c_name, 1, 8)                         AS name_prefix,
           replace(c_name, 'Customer#', 'C-')              AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0')       AS key_padded,
           CAST(c_custkey % 7 AS BIGINT)                   AS key_mod,
           ABS(c_acctbal)                                  AS bal_abs,
           ROUND(SQRT(ABS(c_acctbal)), 4)                  AS bal_sqrt,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT)         AS bal_k,
           CASE WHEN c_acctbal < 0 THEN 'OVERDRAWN'
                WHEN c_acctbal < 1000 THEN 'LOW'
                ELSE 'OK' END                              AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'B') AS seg_coalesced,
           c_custkey IN (1, 2, 3)                          AS is_vip
    FROM customer
    WHERE c_custkey <= 200
    """,
)
def scalar_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/conditional scalar coverage (SURVEY §2.8) in one
    whole-stage-codegen projection — upper/lower/length/substring/
    replace/lpad, mod/abs/sqrt/floor, CASE, COALESCE/NULLIF, IN."""
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias(
            "name_short"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.pmod(F.col("c_custkey"), F.lit(7)).cast("long").alias("key_mod"),
        F.abs("c_acctbal").alias("bal_abs"),
        F.round(F.sqrt(F.abs("c_acctbal")), 4).alias("bal_sqrt"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_k"),
        F.when(F.col("c_acctbal") < 0, "OVERDRAWN")
        .when(F.col("c_acctbal") < 1000, "LOW")
        .otherwise("OK")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("B")).alias(
            "seg_coalesced"
        ),
        F.col("c_custkey").isin(1, 2, 3).alias("is_vip"),
    )


@register(
    "event_props_json_path",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k_value,
           CAST(props->>'$.k' AS INT) % 10 AS k_bucket
    FROM events
    WHERE CAST(props->>'$.k' AS INT) >= 90
    """,
)
def event_props_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object JSON-path extraction (SURVEY §2.8 [NEW]) — the
    schemaless sibling of from_json: no parse schema, per-path access.
    Use from_json when extracting several fields (one parse); this
    when grabbing one."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select(
            "event_id",
            k.alias("k_value"),
            F.pmod(k, F.lit(10)).alias("k_bucket"),
        )
        .filter(F.col("k_value") >= 90)
    )


@register(
    "sql_api_revenue",
    oracle="""
    SELECT n_name,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
    GROUP BY n_name
    HAVING COUNT(DISTINCT o_orderkey) > 10
    ORDER BY revenue DESC
    """,
)
def sql_api_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface: identical text runs on Spark SQL and
    DuckDB (registered temp views stand in for the metastore tables
    the reference registers — SURVEY §2.1 S5). Exercises HAVING +
    ORDER BY through spark.sql."""
    for name in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT n_name,
               COUNT(DISTINCT o_orderkey) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
        GROUP BY n_name
        HAVING COUNT(DISTINCT o_orderkey) > 10
        ORDER BY revenue DESC
        """
    )


@register(
    "weighted_event_scores",
    oracle="""
    SELECT user_id % 100 AS user_bucket,
           ROUND(SUM(value * CASE event_type
                 WHEN 'purchase' THEN 5.0 WHEN 'signup' THEN 3.0
                 WHEN 'click' THEN 1.0 WHEN 'view' THEN 2.0
                 ELSE -2.0 END), 4)            AS weighted_score,
           COUNT(*)                            AS n_events
    FROM events
    GROUP BY user_id % 100
    """,
)
def weighted_event_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed lookup (SURVEY §2.8 — MapType was unused in the
    reference): a literal create_map scores event types; element_at
    resolves per row inside codegen. The oracle expresses the same
    lookup as a CASE (values, not constructs, are compared)."""
    # Integral weights on purpose: value is 4-decimal, so products
    # stay multiples of 1e-4 and ROUND(,4) never sits on a midpoint
    # (a 0.5 weight would put true sums exactly on the boundary).
    weights = {"purchase": 5.0, "signup": 3.0, "click": 1.0, "view": 2.0}
    events = load_table(spark, sf_dir, "events")
    weight_map = F.create_map(
        *[F.lit(x) for pair in weights.items() for x in pair]
    )
    weight = F.coalesce(
        F.element_at(weight_map, F.col("event_type")), F.lit(-2.0)
    )
    return events.groupBy(
        F.pmod(F.col("user_id"), F.lit(100)).alias("user_bucket")
    ).agg(
        F.round(F.sum(F.col("value") * weight), 4).alias("weighted_score"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "date_function_gallery",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                            AS order_date,
           CAST(o_orderdate AS DATE) + 30                       AS due_date,
           CAST(o_orderdate AS DATE) - 7                        AS week_before,
           last_day(CAST(o_orderdate AS DATE))                  AS month_end,
           CAST(date_trunc('month', o_orderdate) AS DATE)       AS month_start,
           CAST(date_trunc('quarter', o_orderdate) AS DATE)     AS quarter_start,
           CAST(quarter(o_orderdate) AS INT)                    AS q,
           CAST(dayofyear(o_orderdate) AS INT)                  AS doy,
           (2026 - CAST(EXTRACT(year FROM o_orderdate) AS INT)) * 12 +
           (8 - CAST(EXTRACT(month FROM o_orderdate) AS INT))   AS months_ago_whole
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def date_function_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/calendar scalar coverage (SURVEY §2.8 P13 family):
    date_add/sub, last_day, trunc to month/quarter, quarter/dayofyear,
    whole-month age — the silver-layer derivation vocabulary.
    (months_between is fractional with engine-specific day-fraction
    rules; the whole-month formulation is the portable semantic.)"""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        d.alias("order_date"),
        F.date_add(d, 30).alias("due_date"),
        F.date_sub(d, 7).alias("week_before"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        F.trunc(d, "quarter").alias("quarter_start"),
        F.quarter(d).alias("q"),
        F.dayofyear(d).alias("doy"),
        # pinned 'now' (2026-08): current_date on both engines risks a
        # midnight race between the side-by-side runs
        ((F.lit(2026) - F.year(d)) * 12 + (F.lit(8) - F.month(d))).alias(
            "months_ago_whole"
        ),
    )


@register(
    "above_customer_avg_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
    FROM orders o
    WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) * 1.5
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
      AND o_custkey <= 300
    """,
)
def above_customer_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (SURVEY §2.8 escape hatch — Catalyst
    decorrelates it into an aggregate + join): orders 50% above their
    own customer's average. Identical SQL text runs on both engines;
    the per-customer average is a single deterministic double (exact
    sum order per group after decorrelation).

    At scale prefer the explicit window formulation (one shuffle,
    no decorrelation surprises) — this query exists to pin the
    subquery surface itself."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total_price
        FROM orders o
        WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) * 1.5
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
          AND o_custkey <= 300
        """
    )


_SUPPLIER_TREE_SQL = """
    WITH RECURSIVE chain(s_suppkey, root, depth) AS (
        SELECT s_suppkey, s_suppkey AS root, 0 AS depth
        FROM supplier WHERE s_suppkey <= 3
        UNION ALL
        SELECT s.s_suppkey, c.root, c.depth + 1
        FROM supplier s JOIN chain c
          ON CAST(FLOOR(s.s_suppkey / 2) AS BIGINT) = c.s_suppkey
         AND s.s_suppkey > c.s_suppkey
    )
    SELECT root,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(depth) AS BIGINT) AS max_depth,
           CAST(SUM(CAST(s2.s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               AS subtree_acctbal
    FROM chain JOIN supplier s2 USING (s_suppkey)
    GROUP BY root
"""


@register("supplier_tree_rollup", oracle=_SUPPLIER_TREE_SQL)
def supplier_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4 WITH RECURSIVE — the iterative-SQL
    surface next to the DataFrame-loop iteration of dedup_clusters /
    dup_graph_pagerank): treat each supplier's parent as
    s_suppkey DIV 2 — a deterministic binary management hierarchy —
    (floor-division via CAST(FLOOR(x/2)) — the one integer-division
    spelling both engines parse; the strict s > parent guard removes
    key 0's self-loop, which otherwise recurses past the level limit)
    and roll every subtree up from its roots (keys 0-3): member count,
    max depth, subtree account-balance total. The org-chart /
    bill-of-materials closure every warehouse eventually needs, now
    expressible IN SQL on both engines — the oracle runs the identical
    statement, so the recursion semantics themselves are value-checked.

    Termination/scale: the parent edge halves the key, so the
    recursion is depth-log2(max key) on a DAG — no cycle risk, and
    each iteration is one equi-join of the frontier against supplier
    (the same shuffle-join-per-step shape as dedup_clusters, with the
    engine handling the loop instead of Python). s_acctbal sums in
    DECIMAL then renders as DOUBLE — the exact-money-then-one-cast
    discipline of plans/_num.py."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_SUPPLIER_TREE_SQL)


@register(
    "pipe_syntax_shipmode_stats",
    oracle="""
    SELECT l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS gross_value
    FROM lineitem
    WHERE l_returnflag = 'N' AND l_quantity >= 10
    GROUP BY l_linestatus
    """,
)
def pipe_syntax_shipmode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4 ``|>`` operators — the linear
    query-authoring surface next to classic SELECT): each stage reads
    top-to-bottom in execution order, the form interactive analysis
    and generated SQL increasingly use. Catalyst lowers it to the SAME
    logical plan as the classic statement — which is exactly what the
    oracle proves: DuckDB runs the traditional SELECT and the values
    hash-match, so the pipe form is verified as pure syntax, zero
    semantic drift."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_returnflag = 'N' AND l_quantity >= 10
        |> AGGREGATE COUNT(*) AS n_items,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                         AS total_qty,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                          AS DOUBLE) AS gross_value
           GROUP BY l_linestatus
        |> SELECT l_linestatus, n_items, total_qty, gross_value
        """
    )


@register(
    "collated_name_groups",
    oracle="""
    WITH variants AS (
        SELECT CASE WHEN p_partkey % 3 = 0 THEN upper(p_name)
                    ELSE p_name END AS display_name
        FROM part
    )
    SELECT min(display_name) AS canonical_name,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM variants
    GROUP BY lower(display_name)
    HAVING COUNT(*) > 1
    """,
)
def collated_name_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 COLLATE): group case-divergent
    display names under UTF8_LCASE WITHOUT rewriting the data — the
    collation is a comparison rule on the expression, so the original
    casing survives for display while grouping/joins treat variants as
    equal (lower() normalizes-and-destroys; collation compares). Case
    variants are derived deterministically (every third part renders
    uppercase — the pii_redaction_stats non-vacuity pattern, since the
    synthetic catalog is uniformly lowercase), and the output keys on
    min(name) because the collated group's REPRESENTATIVE is
    engine-arbitrary — the oracle groups by lower() and must land on
    identical canonical rows."""
    part = load_table(spark, sf_dir, "part")
    variants = part.select(
        F.when(
            F.col("p_partkey") % 3 == 0, F.upper("p_name")
        ).otherwise(F.col("p_name")).alias("display_name")
    )
    return (
        variants.groupBy(
            F.collate("display_name", "UTF8_LCASE").alias("_k")
        )
        .agg(
            F.min(F.col("display_name").cast("string")).alias("canonical_name"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .filter(F.col("n_parts") > 1)
        .select("canonical_name", "n_parts")
    )


BAND_EDGES = [("high", 200_000.0, 1e12), ("low", 0.0, 50_000.0),
              ("mid", 50_000.0, 200_000.0)]


def _band_case(col: str) -> str:
    """Render the banding CASE from BAND_EDGES — the ONE source of
    truth shared by the SQL UDF body and the oracle (r7s3 review
    wave 5 finding #3: three hand-written CASE copies could silently
    desync from the edge table while both engines kept agreeing)."""
    ordered = sorted(BAND_EDGES, key=lambda e: e[1])
    whens = " ".join(
        f"WHEN {col} < {hi!r} THEN '{band}'" for band, _, hi in ordered[:-1]
    )
    return f"CASE {whens} ELSE '{ordered[-1][0]}' END"


@register(
    "sql_udf_band_report",
    oracle=f"""
    WITH edges(band, lo, hi) AS (VALUES
        {", ".join(f"('{b}', {lo!r}, {hi!r})" for b, lo, hi in BAND_EDGES)}),
    banded AS (
        SELECT {_band_case('o_totalprice')} AS band,
               o_totalprice
        FROM orders
    )
    SELECT b.band AS band,
           CAST(e.lo AS DOUBLE)  AS band_lo,
           CAST(e.hi AS DOUBLE)  AS band_hi,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                AS DOUBLE)       AS total_value
    FROM banded b JOIN edges e ON b.band = e.band
    GROUP BY b.band, e.lo, e.hi
    ORDER BY b.band
    """,
)
def sql_udf_band_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions (Spark 4 CREATE FUNCTION — the last
    member of the §2.8 modern-SQL gallery next to pipe syntax,
    collation, VARIANT, recursive CTEs, and SQL scripting): a SCALAR
    SQL UDF classifies each order into a value band, and a SQL TABLE
    FUNCTION serves the band-edge dimension the report joins back —
    both defined in pure SQL (CREATE ... RETURNS ... RETURN), no
    Python or JVM code, which is how analysts package reusable logic
    in a lakehouse without shipping jars. Catalyst INLINES the
    function bodies at plan time, so the report plans exactly like
    the hand-written CASE + VALUES join (no black-box call overhead —
    the reason SQL UDFs beat script UDFs at 100 TB).

    The oracle inlines both bodies (DuckDB's CREATE MACRO equivalent
    would work too; inlining keeps the twin self-contained). Money
    totals via the exact-decimal dsum rule; band edges are literal
    doubles rendered identically on both engines."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION order_band(p DOUBLE)"
        f" RETURNS STRING RETURN {_band_case('p')}"
    )
    edge_rows = ", ".join(
        f"('{b}', {lo!r}, {hi!r})" for b, lo, hi in BAND_EDGES
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION band_edges()"
        " RETURNS TABLE(band STRING, lo DOUBLE, hi DOUBLE)"
        f" RETURN SELECT * FROM VALUES {edge_rows} AS t(band, lo, hi)"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_sql_udf_orders"
    )
    return spark.sql(
        """
        SELECT o.band,
               CAST(e.lo AS DOUBLE) AS band_lo,
               CAST(e.hi AS DOUBLE) AS band_hi,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_value
        FROM (SELECT order_band(o_totalprice) AS band, o_totalprice
              FROM _sql_udf_orders) o
        JOIN band_edges() e ON o.band = e.band
        GROUP BY o.band, e.lo, e.hi
        ORDER BY band
        """
    )


PARAM_THRESHOLD = 300_000.0


@register(
    "parameterized_query_report",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                AS DOUBLE) AS total_value
    FROM orders
    WHERE o_totalprice > {PARAM_THRESHOLD!r}
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def parameterized_query_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named parameter markers +
    IDENTIFIER() — the injection-safe way to template queries, and
    the API surface every SQL-generating service should use instead
    of string interpolation): the table name binds through
    IDENTIFIER(:tbl) and the value threshold through :threshold, both
    as spark.sql(..., args=...) parameters — neither ever enters the
    SQL text. Catalyst resolves the markers at parse time, so the
    plan is byte-identical to the inlined query (filter pushed to the
    scan) — parameterization is free.

    The oracle inlines the same literal values (the parameter
    MECHANISM is Spark-side; the driver hash pins that binding
    produces exactly the inlined semantics)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_param_orders"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_value
        FROM IDENTIFIER(:tbl)
        WHERE o_totalprice > :threshold
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"tbl": "_param_orders", "threshold": PARAM_THRESHOLD},
    )
