"""Deterministic sampling / splitting queries over `documents`
(SURVEY §7.6 extension — training-data prep: stratified corpus
sampling and leakage-safe train/val/test splits).

All decisions come from the portable md5 hash bucket
(functions/sampling.py), so the DuckDB oracles verify EXACT
membership, not just statistical shape — rand()-based sampling could
never be oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_lakehouse_spark.functions.sampling import (
    deterministic_sample,
    hash_bucket,
    hash_split,
    sql_hash_bucket,
)
from fintech_lakehouse_spark.plans._num import sql_isum
from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table

# Downsample the dominant language, keep all of the rarest — the
# class-rebalancing move every pretraining corpus makes.
STRATA_RATES = {"en": 0.25, "zh": 1.0}
DEFAULT_RATE = 0.5
SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _sql_strata_threshold() -> str:
    return (
        "CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 10000 ELSE 5000 END"
    )


@register(
    "stratified_sample_rates",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {sql_isum(f'''CASE WHEN {sql_hash_bucket('doc_id', 'sample')}
                         < {_sql_strata_threshold()}
                    THEN 1 ELSE 0 END''')} AS n_sampled
    FROM documents
    GROUP BY lang
    """,
)
def stratified_sample_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum realized sampling counts: one scan, the in-sample
    decision is a hash-bucket comparison against a CASE threshold —
    no shuffle beyond the final small aggregate, no rand(), exact
    membership the oracle can recompute."""
    documents = load_table(spark, sf_dir, "documents")
    threshold = (
        F.when(F.col("lang") == "en", 2500)
        .when(F.col("lang") == "zh", 10000)
        .otherwise(5000)
    )
    in_sample = hash_bucket("doc_id", "sample") < threshold
    return documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(in_sample, 1).otherwise(0)).alias("n_sampled"),
    )


@register(
    "deterministic_sample_members",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE doc_id < 200
      AND {sql_hash_bucket('doc_id', 'sample')} < 3000
    """,
)
def deterministic_sample_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level sample membership (30% of doc_id < 200): the oracle
    checks the EXACT surviving rows, proving the bucket arithmetic is
    engine-identical — the property that makes the sample reproducible
    across runs, retries, and engines."""
    documents = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return deterministic_sample(documents, 0.3, "doc_id").select("doc_id", "lang")


@register(
    "consistent_sample_join",
    oracle=f"""
    WITH sc AS (
        SELECT c_custkey FROM customer
        WHERE {sql_hash_bucket('c_custkey', 'cust')} < 3000
    ),
    so AS (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE {sql_hash_bucket('o_custkey', 'cust')} < 3000
    )
    SELECT (SELECT COUNT(*) FROM sc) AS n_sampled_customers,
           (SELECT COUNT(*) FROM so) AS n_sampled_orders,
           (SELECT COUNT(*) FROM so
             WHERE o_custkey NOT IN (SELECT c_custkey FROM sc)) AS n_orphan_orders
    """,
)
def consistent_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table sampling consistency (functions/sampling.py's core
    guarantee): sampling CUSTOMERS by c_custkey and ORDERS by o_custkey
    with the same salt keeps every sampled order's customer in the
    sample — n_orphan_orders is structurally zero. rand()-based
    sampling cannot give this; it is what makes a 30% development
    slice of a 100 TB lake referentially intact."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    sc = deterministic_sample(customer, 0.3, "c_custkey", salt="cust").select(
        "c_custkey"
    )
    so = deterministic_sample(orders, 0.3, "o_custkey", salt="cust").select(
        "o_orderkey", "o_custkey"
    )
    orphans = so.join(
        sc, so.o_custkey == sc.c_custkey, "left_anti"
    )
    return (
        sc.agg(F.count(F.lit(1)).alias("n_sampled_customers"))
        .crossJoin(so.agg(F.count(F.lit(1)).alias("n_sampled_orders")))
        .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphan_orders")))
    )


@register(
    "train_test_split_counts",
    oracle=f"""
    SELECT split, lang, COUNT(*) AS n_docs
    FROM (
        SELECT lang,
               CASE WHEN {sql_hash_bucket('doc_id', 'split')} < 8000 THEN 'train'
                    WHEN {sql_hash_bucket('doc_id', 'split')} < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY split, lang
    """,
)
def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 hash split × language: a document's split assignment is
    a pure function of its id, so train/test membership can never leak
    across runs (the guarantee rand() splits do not give). Output is
    the (split, lang) contingency table."""
    documents = load_table(spark, sf_dir, "documents")
    return (
        hash_split(documents, "doc_id", SPLIT_WEIGHTS)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# Priority sampling (Duffield-Lund-Thorup): resolution of the uniform
# draw and the fixed sample size.
PRI_BUCKETS = 1_000_000
PRI_SCALE = 1_000_000_000
PRI_K = 25


@register(
    "priority_weighted_sample",
    oracle=f"""
    SELECT doc_id, weight, priority FROM (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS weight,
               (CAST(len(string_split(text, ' ')) AS BIGINT) * {PRI_SCALE})
                 // ({sql_hash_bucket('doc_id', 'wsample', PRI_BUCKETS)} + 1)
                 AS priority
        FROM documents
    )
    ORDER BY priority DESC, doc_id
    LIMIT {PRI_K}
    """,
)
def priority_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield, Lund & Thorup 2007): each doc gets priority
    q_i = w_i / u_i for a uniform u_i in (0, 1], and the k highest
    priorities form the sample — a one-pass, mergeable scheme whose
    inclusion probabilities are proportional to weight for heavy items
    (here weight = token count: sampling docs proportional to their
    training-token contribution, the corpus-audit draw).

    Determinism design: u_i is the portable md5 bucket (+1, so the
    divisor is in [1, {PRI_BUCKETS}]) and the priority is the
    floor-divided integer w*{PRI_SCALE} DIV (h+1) — exact on both
    engines (non-negative operands, fact 32), so the oracle pins EXACT
    sample membership, which no rand()-based sampler could. Ties are
    broken by doc_id; the float q = w/u ordering is preserved under
    the integer scaling wherever it is unambiguous.

    Scale shape: a scan-shaped projection followed by a global top-k —
    Spark plans TakeOrderedAndProject (per-partition heaps of k rows,
    driver merges partition heads; no global sort, no full shuffle —
    the O1-O3 top-k pattern). Priority sampling is also MERGEABLE:
    shard-local top-k heaps union to the global sample, which is how
    the draw distributes over 1000 executors."""
    documents = load_table(spark, sf_dir, "documents")
    weight = F.size(F.split(F.col("text"), " ")).cast("long")
    h = hash_bucket("doc_id", "wsample", n_buckets=PRI_BUCKETS)
    return (
        documents.select(
            "doc_id",
            weight.alias("weight"),
            F.expr(f"weight * {PRI_SCALE}").alias("_num"),
            (h + 1).alias("_den"),
        )
        .select(
            "doc_id",
            "weight",
            F.expr("_num DIV _den").alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(PRI_K)
    )


NEYMAN_BUDGET = 1000  # total sample rows to allocate


@register(
    "stratified_allocation_plan",
    oracle=f"""
    WITH cents AS (
        SELECT o_orderpriority AS stratum,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
        FROM orders
    ),
    s AS (
        SELECT stratum,
               CAST(COUNT(*) AS BIGINT)  AS n_rows,
               CAST(SUM(x) AS BIGINT)    AS sx,
               CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
                    AS HUGEINT)          AS sxx
        FROM cents GROUP BY stratum
    ),
    scored AS (
        SELECT stratum, n_rows,
               sqrt(CAST(sxx * n_rows - CAST(sx AS HUGEINT)
                         * CAST(sx AS HUGEINT) AS DOUBLE)) AS weight
        FROM s
    ),
    shared AS (
        SELECT stratum, n_rows,
               weight / NULLIF(SUM(weight) OVER (), 0) AS share
        FROM scored
    ),
    floored AS (
        SELECT stratum, n_rows, share,
               CAST(FLOOR({NEYMAN_BUDGET} * share) AS BIGINT) AS base_rows,
               {NEYMAN_BUDGET} * share
                 - FLOOR({NEYMAN_BUDGET} * share)    AS frac,
               ROW_NUMBER() OVER (ORDER BY {NEYMAN_BUDGET} * share
                 - FLOOR({NEYMAN_BUDGET} * share) DESC, stratum) AS rn
        FROM shared
    )
    SELECT stratum, n_rows,
           ROUND(share, 6) AS neyman_share,
           CAST(base_rows + CASE WHEN share IS NOT NULL
                AND rn <= {NEYMAN_BUDGET} - CAST(SUM(base_rows) OVER ()
                                                 AS BIGINT)
                THEN 1 ELSE 0 END AS BIGINT) AS allocated_rows
    FROM floored ORDER BY stratum
    """,
)
def stratified_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation plan for stratified sampling (Neyman 1934 —
    the DESIGN step the deterministic draw operators consume: sample
    size per stratum ∝ N_h·σ_h, which minimizes estimator variance
    for a fixed budget; proportional allocation over-samples large
    LOW-variance strata): per order-priority stratum, the population
    size, the Neyman share, and the integer row allocation out of a
    {NEYMAN_BUDGET}-row budget.

    Determinism: the per-stratum moment sums (Σx, Σx² over exact
    cents) are exact 128-bit-class integers (Σx² exceeds int64 at
    fact scale — DECIMAL(38) on Spark, HUGEINT on DuckDB); N_h·σ_h =
    sqrt(n·Σx² − (Σx)²) enters float through ONE identical
    cast-sqrt-divide tree on both engines, shares ROUND 6, and the
    integer allocation FLOORS the float (the r7s3 finding-#1 rule:
    never bare-CAST a fractional double cross-engine) then spends the
    full budget by largest-remainder top-up (floors alone under-spend
    by up to strata−1 rows); an all-zero-variance corpus yields NULL
    shares/allocations on both engines (NULLIF-guarded), never a NaN
    divergence.

    Scale shape: one fact scan folding to one row per stratum
    (map-side combinable moments); shares and allocations from a
    window over the ≤5-row frame. The plan is as cheap at 100 TB as
    the moments pass."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    x_dec = "CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS DECIMAL(38,0))"
    s = orders.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        )
        .cast("long")
        .alias("sx"),
        F.expr(f"SUM({x_dec} * {x_dec})").alias("sxx"),
    )
    # N_h·σ_h = sqrt(n·Σx² − (Σx)²) — the n_rows factors cancel
    # algebraically (wave-2 finding #5: the ×n/÷n float round-trip was
    # dead work and one more place for the engine trees to drift)
    weight = F.expr(
        "sqrt(CAST(sxx * CAST(n_rows AS DECIMAL(38,0))"
        "      - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))"
        "      AS DOUBLE))"
    )
    everything = Window.partitionBy(F.lit(1))
    scored = s.select("stratum", "n_rows", weight.alias("weight"))
    # NULLIF guards the all-zero-variance corpus (share NULL on both
    # engines instead of NaN-crash/NULL divergence — wave-2 finding
    # #3); the largest-remainder pass spends the FULL budget (floors
    # alone under-spend by up to strata−1 — wave-2 finding #4): the
    # `leftover` strata with the largest fractional remainders get +1,
    # frac ties broken by stratum so the top-up is total-ordered.
    shared = scored.withColumn(
        "share",
        F.col("weight")
        / F.expr("NULLIF(SUM(weight) OVER (PARTITION BY 1), 0)"),
    )
    floored = shared.select(
        "stratum",
        "n_rows",
        "share",
        F.floor(NEYMAN_BUDGET * F.col("share")).cast("long").alias("base_rows"),
        (
            NEYMAN_BUDGET * F.col("share")
            - F.floor(NEYMAN_BUDGET * F.col("share"))
        ).alias("frac"),
    ).withColumn(
        "rn",
        F.row_number().over(Window.orderBy(F.desc("frac"), "stratum")),
    )
    leftover = F.lit(NEYMAN_BUDGET) - F.sum("base_rows").over(everything)
    return (
        floored.select(
            "stratum",
            "n_rows",
            F.round("share", 6).alias("neyman_share"),
            (
                F.col("base_rows")
                + F.when(
                    F.col("share").isNotNull() & (F.col("rn") <= leftover), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("allocated_rows"),
        )
        .orderBy("stratum")
    )
