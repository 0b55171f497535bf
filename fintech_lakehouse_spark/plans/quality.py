"""Data-quality queries (SURVEY.md §2.9) — the reference's signature
surface, rebuilt as ONE-PASS conditional aggregation instead of its
one-Spark-job-per-check loop (anti-pattern, SURVEY §4.1,
ref: src/utils/data_quality.py:515-518).

The library implementation lives in fintech_lakehouse_spark.quality;
these registry entries prove the semantics against SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table

# The rule set mirrors the reference's check families over lineitem:
# completeness (Q1), range (Q4), set-membership (Q3), custom
# cross-column (Q5), uniqueness (Q2). Built lazily — Column exprs need
# an active session.
def _rules() -> dict[str, "F.Column"]:
    return {
        "null_orderkey": F.col("l_orderkey").isNull(),
        "qty_out_of_range": F.col("l_quantity").isNotNull()
        & ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 45)),
        "discount_out_of_range": F.col("l_discount").isNotNull()
        & ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.08)),
        "bad_returnflag": F.col("l_returnflag").isNotNull()
        & ~F.col("l_returnflag").isin("A", "N", "R"),
        "nonpositive_price": F.col("l_extendedprice").isNotNull()
        & (F.col("l_extendedprice") <= 0),
    }


_RULES_SQL = {
    "null_orderkey": "l_orderkey IS NULL",
    "qty_out_of_range": "l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 45)",
    "discount_out_of_range": "l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.08)",
    "bad_returnflag": "l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R')",
    "nonpositive_price": "l_extendedprice IS NOT NULL AND l_extendedprice <= 0",
}


@register(
    "dq_lineitem_report",
    oracle=f"""
    SELECT
        (SELECT COUNT(*) FROM lineitem) AS total_rows,
        {", ".join(f"(SELECT COUNT(*) FILTER (WHERE {sql}) FROM lineitem) AS {name}" for name, sql in _RULES_SQL.items())},
        (SELECT COUNT(*) FROM (
            SELECT l_orderkey, l_linenumber FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)) AS duplicate_pk_groups
    """,
)
def dq_lineitem_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass DQ report: N checks = ONE scan via sum(when(cond,1))
    conditional aggregation (the SURVEY §4.1 rewrite of the reference's
    N-scan loop). Uniqueness needs its own shuffle (it is a group-by),
    joined back as a 1×1 broadcast."""
    lineitem = load_table(spark, sf_dir, "lineitem", spread="l_orderkey")
    stats = lineitem.agg(
        F.count(F.lit(1)).alias("total_rows"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in _rules().items()
        ],
    )
    dup_groups = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .agg(F.count(F.lit(1)).alias("duplicate_pk_groups"))
    )
    return stats.crossJoin(F.broadcast(dup_groups))


@register(
    "dq_quarantine_split",
    oracle=f"""
    SELECT COALESCE(NOT ({" OR ".join(f"({sql})" for sql in _RULES_SQL.values())}), TRUE) AS is_valid,
           COUNT(*)                       AS n_rows,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    GROUP BY 1
    """,
)
def dq_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid/quarantine split semantics (ref get_valid_invalid_dfs,
    src/utils/data_quality.py:570-634 / SURVEY §2.9 Q7): tag rows
    against every rule in one projection, aggregate per validity.
    The library version materializes both sides from one cached scan."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    any_violation = None
    for cond in _rules().values():
        any_violation = cond if any_violation is None else (any_violation | cond)
    is_valid = ~F.coalesce(any_violation, F.lit(False))
    return (
        lineitem.withColumn("is_valid", is_valid)
        .groupBy("is_valid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@register(
    "freshness_check",
    oracle="""
    SELECT CAST(MAX(ts) AS TIMESTAMP)  AS latest_ts,
           COUNT(*)                    AS n_rows,
           CAST(FLOOR(EXTRACT(EPOCH FROM (TIMESTAMP '2024-02-01 00:00:00' - MAX(ts))) / 3600) AS BIGINT) AS hours_stale
    FROM events
    """,
)
def freshness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness monitoring query (ref check_data_freshness,
    src/utils/monitoring.py:317-384 / SURVEY §2.10 M2), pinned to a
    fixed 'now' so the result is deterministic."""
    events = load_table(spark, sf_dir, "events")
    now = F.lit("2024-02-01 00:00:00").cast("timestamp")
    return events.agg(
        F.max("ts").alias("latest_ts"),
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.floor(
                (F.unix_timestamp(now) - F.unix_timestamp(F.max("ts"))) / 3600
            ).cast("long")
        ).alias("hours_stale"),
    )


@register(
    "daily_volume_anomaly",
    oracle="""
    WITH observed AS (
        SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS row_count
        FROM events GROUP BY 1
    ),
    bounds AS (
        SELECT MIN(event_date) AS lo, MAX(event_date) AS hi FROM observed
    ),
    calendar AS (
        SELECT unnest([lo + CAST(d AS INT) FOR d IN range(0, CAST(hi - lo AS INT) + 1)])
               AS event_date
        FROM bounds
    ),
    daily AS (
        SELECT c.event_date, CAST(COALESCE(o.row_count, 0) AS BIGINT)
               AS row_count
        FROM calendar c LEFT JOIN observed o USING (event_date)
    )
    SELECT event_date, row_count,
           ROUND(AVG(row_count) OVER (ORDER BY event_date
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 4) AS trailing_avg,
           CASE WHEN AVG(row_count) OVER (ORDER BY event_date
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) IS NULL THEN NULL
                WHEN AVG(row_count) OVER (ORDER BY event_date
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) = 0 THEN NULL
                ELSE ROUND(100.0 * (row_count - AVG(row_count) OVER (ORDER BY event_date
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
                     / AVG(row_count) OVER (ORDER BY event_date
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 4)
           END AS pct_change
    FROM daily
    """,
)
def daily_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection (ref check_volume_anomaly,
    src/utils/monitoring.py:392-468 / SURVEY §2.10 M3) — but fully
    distributed: trailing-mean %-change via a window over the daily
    rollup instead of the reference's driver-side collect() loop
    (anti-pattern, SURVEY §4.4). The window is over ~30 daily rows
    (post-agg), so the unpartitioned frame is fine.

    Densified onto the full calendar since r6s5 (monitoring review):
    a day with ZERO rows produced no groupBy row at all, so a full
    outage — the most important volume anomaly — was structurally
    invisible; the calendar join materializes it as row_count 0. The
    densification also makes rows ≡ days, so the rowsBetween frame is
    a true trailing-7-DAY window across gaps. A zero trailing average
    keeps pct_change NULL (a double division would render Infinity,
    engine-divergently). The test events table is gap-free, so the
    densify is inert at every SF — pure insurance, like the
    hot-shingle drops."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    observed = events.groupBy(F.col("ts").cast("date").alias("event_date")).agg(
        F.count(F.lit(1)).alias("row_count")
    )
    calendar = observed.agg(
        F.min("event_date").alias("lo"), F.max("event_date").alias("hi")
    ).select(F.explode(F.sequence("lo", "hi")).alias("event_date"))
    daily = calendar.join(observed, "event_date", "left").select(
        "event_date",
        F.coalesce("row_count", F.lit(0)).cast("long").alias("row_count"),
    )
    trailing = Window.orderBy("event_date").rowsBetween(-7, -1)
    avg_prev = F.avg("row_count").over(trailing)
    pct = F.when(avg_prev.isNull() | (avg_prev == 0), F.lit(None)).otherwise(
        F.round(100.0 * (F.col("row_count") - avg_prev) / avg_prev, 4)
    )
    return daily.select(
        "event_date",
        "row_count",
        F.round(avg_prev, 4).alias("trailing_avg"),
        pct.alias("pct_change"),
    )


@register(
    "order_snapshot_changelog",
    oracle="""
    SELECT * FROM (
        WITH old_snap AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey % 7 <> 0
        ),
        new_snap AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderkey % 5 <> 0
        )
        SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
                    ELSE n.o_totalprice END         AS o_totalprice,
               CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus
                    ELSE n.o_orderstatus END        AS o_orderstatus,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    WHEN o.o_totalprice <> n.o_totalprice
                         OR o.o_orderstatus <> n.o_orderstatus THEN 'update'
               END AS change_type
        FROM old_snap o FULL OUTER JOIN new_snap n
          ON o.o_orderkey = n.o_orderkey
    ) WHERE change_type IS NOT NULL
    """,
)
def order_snapshot_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing as a registered query (SURVEY §7.6
    snapshot changelog / Delta CDF analog, previously unit-only):
    two deterministic snapshots are derived from ``orders`` — the old
    one missing keys ≡0 (mod 7) (→ inserts), the new one missing keys
    ≡0 (mod 5) (→ deletes) and doubling o_totalprice on keys ≡0
    (mod 3) (→ updates; exact in binary floating point) — and
    ``snapshot_diff`` emits the insert/update/delete changelog with
    NEW values for upserts and OLD values for deletes.

    Scale shape: one full-outer equi-join on the key — the unavoidable
    lower bound for differencing two snapshots (incremental systems
    avoid it by recording changes at write time, which is what the
    env-gated Delta CDF branch does); unchanged keys are dropped
    before any downstream work, so the output is change-cardinality
    sized. The replay ≡ direct-state guarantee is property-tested in
    tests/test_property_based.py; this entry pins the exact changelog
    against the SQL twin under the driver's hash check."""
    from fintech_lakehouse_spark.sources.writers import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old_snap = orders.filter(F.col("o_orderkey") % 7 != 0)
    new_snap = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(
        old_snap, new_snap, keys=["o_orderkey"]
    ).withColumnRenamed("_change_type", "change_type")


@register(
    "changelog_incremental_agg",
    oracle="""
    WITH old_snap AS (
        SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
               o_orderstatus
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    new_snap AS (
        SELECT o_orderkey,
               CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                         ELSE o_totalprice END AS DECIMAL(12,2)) AS price,
               o_orderstatus
        FROM orders WHERE o_orderkey % 5 <> 0
    ),
    j AS (
        SELECT o.o_orderkey AS ok_o, n.o_orderkey AS ok_n,
               o.price AS p_o, n.price AS p_n,
               o.o_orderstatus AS s_o, n.o_orderstatus AS s_n
        FROM old_snap o FULL OUTER JOIN new_snap n
          ON o.o_orderkey = n.o_orderkey
    ),
    changes AS (
        SELECT * FROM j
        WHERE ok_o IS NULL OR ok_n IS NULL OR p_o <> p_n OR s_o <> s_n
    ),
    contrib AS (
        SELECT s_n AS o_orderstatus, 1 AS sgn, p_n AS price
        FROM changes WHERE ok_n IS NOT NULL
        UNION ALL
        SELECT s_o, -1, p_o FROM changes WHERE ok_o IS NOT NULL
    ),
    delta AS (
        SELECT o_orderstatus,
               CAST(SUM(sgn) AS BIGINT) AS n_delta,
               CAST(SUM(sgn * price) AS DECIMAL(18,2)) AS total_delta
        FROM contrib GROUP BY o_orderstatus
    ),
    base AS (
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(price) AS DECIMAL(18,2)) AS total_price
        FROM old_snap GROUP BY o_orderstatus
    ),
    maintained AS (
        SELECT COALESCE(b.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
               COALESCE(b.n_rows, 0) + COALESCE(d.n_delta, 0) AS n_rows,
               CAST(COALESCE(b.total_price, 0) + COALESCE(d.total_delta, 0)
                    AS DECIMAL(18,2)) AS total_price
        FROM base b FULL OUTER JOIN delta d
          ON b.o_orderstatus = d.o_orderstatus
    ),
    recomputed AS (
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(price) AS DECIMAL(18,2)) AS total_price
        FROM new_snap GROUP BY o_orderstatus
    )
    SELECT m.o_orderstatus,
           CAST(m.n_rows AS BIGINT)             AS n_maintained,
           CAST(m.total_price AS DOUBLE)        AS total_maintained,
           r.n_rows                             AS n_recomputed,
           CAST(r.total_price AS DOUBLE)        AS total_recomputed,
           (m.n_rows = r.n_rows AND m.total_price = r.total_price)
                                                AS consistent
    FROM maintained m JOIN recomputed r
      ON m.o_orderstatus = r.o_orderstatus
    WHERE m.n_rows <> 0
    """,
)
def changelog_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance from a CDF changelog, self-checked
    (SURVEY §7.6 / operators/ivm.py; the scale answer to the
    reference's full-recompute Gold layer, src/config/base.py:92-96):
    maintain a per-status (count, exact money total) aggregate as
    base + signed changelog delta, and emit it NEXT TO the direct
    recomputation over the new snapshot with a per-group `consistent`
    flag — the driver's hash check then pins maintained == recomputed
    on both engines, making the IVM algebra itself the thing under
    test.

    Uses the same deterministic snapshot derivation as
    order_snapshot_changelog (old = keys !=0 mod 7, new = keys !=0
    mod 5 with prices doubled on mod 3), but diffs with
    ``emit_preimage=True``: the update_preimage rows are what let the
    delta RETRACT an updated row's old contribution — including
    status-changing updates, which move value across groups (mod-15
    keys here: deleted AND doubled). A three-type changelog cannot
    maintain sums; operators/ivm.py raises on one.

    Determinism: deltas and totals are DECIMAL(12,2) end-to-end
    (exact, order-independent — plans/_num.py), counts are longs; the
    equality in `consistent` is decimal equality, not a tolerance.

    Scale shape: delta = one map-side-combinable groupBy over the
    changelog (change-cardinality sized); apply = full-outer join of
    two group-cardinality relations. The base fact table is read only
    by the snapshot derivation here (test scaffolding); in production
    the changelog comes from the foreach_batch_cdf sink and NOTHING
    rescans the fact table — that asymmetry is the entire point."""
    from fintech_lakehouse_spark.operators.ivm import (
        apply_agg_delta,
        changelog_agg_delta,
    )
    from fintech_lakehouse_spark.sources.writers import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        "o_orderstatus",
    )
    old_snap = orders.filter(F.col("o_orderkey") % 7 != 0)
    new_snap = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "price",
        F.when(
            F.col("o_orderkey") % 3 == 0,
            (F.col("price") * 2).cast("decimal(12,2)"),
        ).otherwise(F.col("price")),
    )
    changelog = snapshot_diff(
        old_snap, new_snap, keys=["o_orderkey"], emit_preimage=True
    )
    delta = changelog_agg_delta(
        changelog, ["o_orderstatus"], {"total_price": "price"}
    )
    base = old_snap.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("price").cast("decimal(18,2)").alias("total_price"),
    )
    maintained = apply_agg_delta(
        base, delta, ["o_orderstatus"], ["total_price"]
    )
    recomputed = new_snap.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("price").cast("decimal(18,2)").alias("total_price"),
    )
    m, r = maintained.alias("m"), recomputed.alias("r")
    return m.join(r, F.col("m.o_orderstatus") == F.col("r.o_orderstatus")).select(
        F.col("m.o_orderstatus").alias("o_orderstatus"),
        F.col("m.n_rows").alias("n_maintained"),
        F.col("m.total_price").cast("double").alias("total_maintained"),
        F.col("r.n_rows").alias("n_recomputed"),
        F.col("r.total_price").cast("double").alias("total_recomputed"),
        (
            (F.col("m.n_rows") == F.col("r.n_rows"))
            & (F.col("m.total_price") == F.col("r.total_price"))
        ).alias("consistent"),
    )


@register(
    "changelog_join_view_maintenance",
    oracle="""
    WITH old_snap AS (
        SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
               o_custkey
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    new_snap AS (
        SELECT o_orderkey,
               CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                         ELSE o_totalprice END AS DECIMAL(12,2)) AS price,
               o_custkey
        FROM orders WHERE o_orderkey % 5 <> 0
    ),
    dim AS (
        SELECT c_custkey, n_name
        FROM customer JOIN nation ON n_nationkey = c_nationkey
    ),
    j AS (
        SELECT o.o_orderkey AS ok_o, n.o_orderkey AS ok_n,
               o.price AS p_o, n.price AS p_n,
               o.o_custkey AS k_o, n.o_custkey AS k_n
        FROM old_snap o FULL OUTER JOIN new_snap n
          ON o.o_orderkey = n.o_orderkey
    ),
    changes AS (
        SELECT * FROM j
        WHERE ok_o IS NULL OR ok_n IS NULL OR p_o <> p_n OR k_o <> k_n
    ),
    contrib AS (
        SELECT k_n AS o_custkey, 1 AS sgn, p_n AS price
        FROM changes WHERE ok_n IS NOT NULL
        UNION ALL
        SELECT k_o, -1, p_o FROM changes WHERE ok_o IS NOT NULL
    ),
    delta AS (
        SELECT d.n_name,
               CAST(SUM(sgn) AS BIGINT) AS n_delta,
               CAST(SUM(sgn * price) AS DECIMAL(18,2)) AS total_delta
        FROM contrib c JOIN dim d ON d.c_custkey = c.o_custkey
        GROUP BY d.n_name
    ),
    base AS (
        SELECT d.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(price) AS DECIMAL(18,2)) AS total_price
        FROM old_snap o JOIN dim d ON d.c_custkey = o.o_custkey
        GROUP BY d.n_name
    ),
    maintained AS (
        SELECT COALESCE(b.n_name, d.n_name) AS n_name,
               COALESCE(b.n_rows, 0) + COALESCE(d.n_delta, 0) AS n_rows,
               CAST(COALESCE(b.total_price, 0) + COALESCE(d.total_delta, 0)
                    AS DECIMAL(18,2)) AS total_price
        FROM base b FULL OUTER JOIN delta d ON b.n_name = d.n_name
    ),
    recomputed AS (
        SELECT d.n_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(price) AS DECIMAL(18,2)) AS total_price
        FROM new_snap o JOIN dim d ON d.c_custkey = o.o_custkey
        GROUP BY d.n_name
    )
    SELECT m.n_name,
           CAST(m.n_rows AS BIGINT)      AS n_maintained,
           CAST(m.total_price AS DOUBLE) AS total_maintained,
           r.n_rows                      AS n_recomputed,
           CAST(r.total_price AS DOUBLE) AS total_recomputed,
           (m.n_rows = r.n_rows AND m.total_price = r.total_price)
                                         AS consistent
    FROM maintained m JOIN recomputed r ON m.n_name = r.n_name
    WHERE m.n_rows <> 0
    """,
)
def changelog_join_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM for a JOIN-aggregate view (the companion of
    changelog_incremental_agg): the maintained view is per-NATION
    order totals — a γ(orders ⋈ customer ⋈ nation) star view, i.e.
    exactly the shape of the reference's declared Gold rollups
    (agg_daily_metrics / agg_customer_360, src/config/base.py:92-96).
    When only the FACT side changes, the delta rule for joins is
    ΔV = γ(ΔOrders ⋈ dim): join the change-cardinality changelog to
    the (static) dimension, aggregate signed contributions, add to
    the base view. The fact table is never rescanned; the dim join
    runs over the changelog only.

    Emits maintained NEXT TO recomputed with a per-group consistency
    flag, so the driver's hash check pins the delta-join propagation
    rule itself. Group-moving updates here move value across NATIONS
    (a customer-key update relocates the order's contribution); the
    preimage retracts from the old nation, the postimage adds to the
    new one.

    Scale shape: the changelog-to-dim join BROADCASTS the dim (or at
    real dim sizes, shuffles change-cardinality rows — never fact
    rows); delta and apply are group-cardinality. The base/recomputed
    legs exist only for the self-check; production reads the base
    view from storage (foreach_batch_ivm's versioned snapshots)."""
    from fintech_lakehouse_spark.operators.ivm import (
        apply_agg_delta,
        changelog_agg_delta,
    )
    from fintech_lakehouse_spark.sources.writers import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        "o_custkey",
    )
    old_snap = orders.filter(F.col("o_orderkey") % 7 != 0)
    new_snap = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "price",
        F.when(
            F.col("o_orderkey") % 3 == 0,
            (F.col("price") * 2).cast("decimal(12,2)"),
        ).otherwise(F.col("price")),
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dim = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
    ).select("c_custkey", "n_name")
    changelog = snapshot_diff(
        old_snap, new_snap, keys=["o_orderkey"], emit_preimage=True
    )
    enriched = changelog.join(
        F.broadcast(dim), changelog["o_custkey"] == dim["c_custkey"]
    )
    delta = changelog_agg_delta(enriched, ["n_name"], {"total_price": "price"})
    base = (
        old_snap.join(
            F.broadcast(dim), old_snap["o_custkey"] == dim["c_custkey"]
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("price").cast("decimal(18,2)").alias("total_price"),
        )
    )
    maintained = apply_agg_delta(base, delta, ["n_name"], ["total_price"])
    recomputed = (
        new_snap.join(
            F.broadcast(dim), new_snap["o_custkey"] == dim["c_custkey"]
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("price").cast("decimal(18,2)").alias("total_price"),
        )
    )
    m, r = maintained.alias("m"), recomputed.alias("r")
    return m.join(r, F.col("m.n_name") == F.col("r.n_name")).select(
        F.col("m.n_name").alias("n_name"),
        F.col("m.n_rows").alias("n_maintained"),
        F.col("m.total_price").cast("double").alias("total_maintained"),
        F.col("r.n_rows").alias("n_recomputed"),
        F.col("r.total_price").cast("double").alias("total_recomputed"),
        (
            (F.col("m.n_rows") == F.col("r.n_rows"))
            & (F.col("m.total_price") == F.col("r.total_price"))
        ).alias("consistent"),
    )


K_ANON_LEVELS = [2, 5, 10]
# $500-wide balance bucket over shifted non-negative cents: acctbal
# spans [-999.99, 9999.99], so +100000 cents keeps DIV == //.
K_ANON_BAL_BUCKET = 50_000

# ONE definition of the QI balance bucket, shared (Spark + oracle) by
# k_anonymity_audit and l_diversity_audit — the two audits' bucketing
# must stay identical or their "both release designs" claim breaks
# (r7s3 review finding #7).
_SQL_BAL_BUCKET = (
    "(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
    f" + 100000) // {K_ANON_BAL_BUCKET}"
)
_SPARK_BAL_BUCKET = (
    "(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
    f" + 100000) DIV {K_ANON_BAL_BUCKET}"
)


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey AS nation, c_mktsegment AS segment,
               {_SQL_BAL_BUCKET} AS bal_bucket
        FROM customer
    ),
    groups AS (
        SELECT nation, segment, bal_bucket, COUNT(*) AS gsize
        FROM qi GROUP BY 1, 2, 3
    ),
    total AS (SELECT SUM(gsize) AS t, COUNT(*) AS g FROM groups)
    SELECT CAST(k.k AS BIGINT) AS k,
           CAST(SUM(CASE WHEN g.gsize < k.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_risky_groups,
           CAST(SUM(CASE WHEN g.gsize < k.k THEN g.gsize ELSE 0 END)
                AS BIGINT) AS n_risky_customers,
           CAST(SUM(CASE WHEN g.gsize < k.k THEN g.gsize ELSE 0 END)
                * 1000000 // ANY_VALUE(t.t) AS BIGINT) AS risky_ppm,
           CAST(ANY_VALUE(t.g) AS BIGINT) AS n_groups_total
    FROM groups g
    CROSS JOIN (VALUES {", ".join(f"({k})" for k in K_ANON_LEVELS)}) AS k(k)
    CROSS JOIN total t
    GROUP BY k.k
    ORDER BY k
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk profile over customer quasi-identifiers — the
    privacy audit a data-release/training-data pipeline runs before
    shipping records that are individually harmless but jointly
    identifying (Sweeney 2002): group by (nation, market segment,
    $500 balance bucket) and report, for k ∈ {2, 5, 10}, how many
    QI-groups fall below k members, how many customers sit in those
    groups (the re-identifiable population a k-anonymizer would have
    to suppress or generalize), and that population as exact integer
    ppm. The balance bucket floor-divides SHIFTED non-negative cents
    (fact 32: Spark DIV == DuckDB // only for non-negative operands;
    acctbal goes to -$999.99).

    Scale shape: one scan → map-side-combined groupBy on the QI tuple
    (output is bounded by QI-domain cardinality, ~|nations|×|segments|
    ×|buckets|, never row count) → all three thresholds evaluated as
    conditional sums over that bounded group table in one pass (a
    3-row literal cross join, not 3 scans) → 3-row result. The same
    shape audits any QI set at 100 TB; group cardinality, not corpus
    size, is the working set after the first aggregate.

    Privacy-family companion to pii_redaction_stats (content-level
    PII) — this is the STRUCTURAL re-identification check content
    scrubbing cannot see."""
    customer = load_table(spark, sf_dir, "customer")
    qi = customer.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr(_SPARK_BAL_BUCKET).alias("bal_bucket"),
    )
    from pyspark.sql.window import Window

    # grand totals via a window over the bounded group table — the
    # separate total-aggregate + crossJoin re-derived the whole scan
    # subtree (fact-20 class; rewritten r7s3 with l_diversity_audit)
    everything = Window.partitionBy(F.lit(1))
    groups = (
        qi.groupBy("nation", "segment", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("gsize"))
        .withColumn("t", F.sum("gsize").over(everything))
        .withColumn("g", F.count(F.lit(1)).over(everything))
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in K_ANON_LEVELS])).alias("k")
    )
    risky = F.when(F.col("gsize") < F.col("k"), F.col("gsize")).otherwise(F.lit(0))
    return (
        groups.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum((F.col("gsize") < F.col("k")).cast("long"))
            .cast("long")
            .alias("n_risky_groups"),
            F.sum(risky).cast("long").alias("n_risky_customers"),
            F.expr("SUM(CASE WHEN gsize < k THEN gsize ELSE 0 END)"
                   " * 1000000 DIV ANY_VALUE(t)")
            .cast("long")
            .alias("risky_ppm"),
            F.any_value(F.col("g")).cast("long").alias("n_groups_total"),
        )
        .orderBy("k")
    )


RECON_TOL_BP = 100  # reconciled = header within 1% of its lines


@register(
    "order_ledger_reconciliation",
    oracle=f"""
    WITH ledger AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                        * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))
                    * 1000000 AS BIGINT) AS ledger_e6
        FROM lineitem GROUP BY l_orderkey
    ),
    diffs AS (
        SELECT abs(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1000000 AS BIGINT)
                   - ledger_e6) * 10000
               // CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 1000000 AS BIGINT)
                   AS diff_bp
        FROM orders JOIN ledger ON o_orderkey = l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT)                          AS n_orders,
           CAST(SUM(CASE WHEN diff_bp <= {RECON_TOL_BP}
                         THEN 1 ELSE 0 END) AS BIGINT)       AS n_reconciled,
           CAST(SUM(CASE WHEN diff_bp <= {RECON_TOL_BP}
                         THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT)                       AS reconciled_ppm,
           quantile_cont(diff_bp, 0.50)                      AS p50_diff_bp,
           quantile_cont(diff_bp, 0.90)                      AS p90_diff_bp,
           CAST(MAX(diff_bp) AS BIGINT)                      AS max_diff_bp
    FROM diffs
    """,
)
def order_ledger_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-entry value reconciliation — header total vs the sum of
    its lines (the ledger-vs-subledger tie-out every finance close
    runs; the DQ family's referential checks prove KEYS exist, this
    proves the MONEY adds up): per order, the exact-decimal line total
    Σ extprice·(1−disc)·(1+tax) against o_totalprice, discrepancy in
    exact integer BASIS POINTS of the header (scale-6 decimal
    micro-units, floor-divided non-negative integers), reported as a
    reconciliation-rate + discrepancy-distribution readout. On this
    synthetic lake the generator does NOT maintain the TPC-H price
    identity, so the report is a non-vacuous mismatch DISTRIBUTION
    (p50/p90/max bp) rather than an all-pass flag — exactly what the
    query is for.

    Scale shape: one map-side-combinable groupBy(l_orderkey) over
    lineitem, an equi-join to orders on the same key (co-partitioned
    shuffle; bucketed storage makes it shuffle-free), then a 1-row
    readout. The exact p50/p90 are sort-based over post-join
    cardinality; at 100 TB swap to GK quantiles
    (functions/sketches.py) — the integer diff_bp column is exactly
    what the sketch family consumes."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    from fintech_lakehouse_spark.plans._num import money, one_minus, one_plus

    ledger = lineitem.groupBy("l_orderkey").agg(
        (
            F.sum(
                money("l_extendedprice")
                * one_minus("l_discount")
                * one_plus("l_tax")
            )
            * 1000000
        )
        .cast("long")
        .alias("ledger_e6")
    )
    diffs = (
        orders.select(
            "o_orderkey",
            (money("o_totalprice") * 1000000).cast("long").alias("total_e6"),
        )
        .join(ledger, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.expr("abs(total_e6 - ledger_e6) * 10000 DIV total_e6").alias(
                "diff_bp"
            )
        )
    )
    ok = (F.col("diff_bp") <= RECON_TOL_BP).cast("long")
    return diffs.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(ok).cast("long").alias("n_reconciled"),
        F.expr(
            f"SUM(CASE WHEN diff_bp <= {RECON_TOL_BP} THEN 1 ELSE 0 END)"
            " * 1000000 DIV COUNT(1)"
        )
        .cast("long")
        .alias("reconciled_ppm"),
        F.percentile("diff_bp", 0.50).alias("p50_diff_bp"),
        F.percentile("diff_bp", 0.90).alias("p90_diff_bp"),
        F.max("diff_bp").cast("long").alias("max_diff_bp"),
    )


L_DIV_LEVELS = [2, 3, 5]


@register(
    "l_diversity_audit",
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey AS nation,
               {_SQL_BAL_BUCKET} AS bal_bucket,
               c_mktsegment AS sensitive
        FROM customer
    ),
    groups AS (
        SELECT nation, bal_bucket,
               COUNT(*) AS gsize,
               COUNT(DISTINCT sensitive) AS div
        FROM qi GROUP BY 1, 2
    ),
    total AS (SELECT SUM(gsize) AS t, COUNT(*) AS g FROM groups)
    SELECT CAST(l.l AS BIGINT) AS l,
           CAST(SUM(CASE WHEN g.div < l.l THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_div_groups,
           CAST(SUM(CASE WHEN g.div < l.l THEN g.gsize ELSE 0 END)
                AS BIGINT) AS n_exposed_customers,
           CAST(SUM(CASE WHEN g.div < l.l THEN g.gsize ELSE 0 END)
                * 1000000 // ANY_VALUE(t.t) AS BIGINT) AS exposed_ppm,
           CAST(ANY_VALUE(t.g) AS BIGINT) AS n_groups_total
    FROM groups g
    CROSS JOIN (VALUES {", ".join(f"({v})" for v in L_DIV_LEVELS)}) AS l(l)
    CROSS JOIN total t
    GROUP BY l.l
    ORDER BY l
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007) — the
    ATTRIBUTE-disclosure companion of k_anonymity_audit (k-anonymity
    protects against re-identification, but a QI group whose members
    all share one sensitive value still leaks that value to anyone who
    can place a person in the group — the homogeneity attack): per
    QI group (nation, $500 balance bucket), the number of DISTINCT
    market-segment values; for l ∈ {{{", ".join(map(str, L_DIV_LEVELS))}}},
    how many groups fall below l distinct values, how many customers
    sit in those groups, and that exposure as exact floor-divided
    integer ppm. The sensitive attribute (segment) is deliberately
    EXCLUDED from the QI tuple — k_anonymity_audit includes it, so the
    two audits cover both release designs.

    Scale shape: identical to the k-anonymity contract — one scan,
    map-side-combined groupBy on the QI tuple with a distinct-count
    (bounded by QI-domain × sensitive-domain cardinality, never row
    count), conditional sums over the bounded group table against a
    literal threshold spine, 3-row result."""
    customer = load_table(spark, sf_dir, "customer")
    qi = customer.select(
        F.col("c_nationkey").alias("nation"),
        F.expr(_SPARK_BAL_BUCKET).alias("bal_bucket"),
        F.col("c_mktsegment").alias("sensitive"),
    )
    from pyspark.sql.window import Window

    # grand totals via a window over the ALREADY-BOUNDED group table —
    # a second groups.agg() would re-derive the whole scan subtree
    # (fact-20 class; the benford window-total precedent)
    everything = Window.partitionBy(F.lit(1))
    groups = (
        qi.groupBy("nation", "bal_bucket")
        .agg(
            F.count(F.lit(1)).alias("gsize"),
            F.countDistinct("sensitive").alias("div"),
        )
        .withColumn("t", F.sum("gsize").over(everything))
        .withColumn("g", F.count(F.lit(1)).over(everything))
    )
    ls = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in L_DIV_LEVELS])).alias("l")
    )
    exposed = F.when(F.col("div") < F.col("l"), F.col("gsize")).otherwise(
        F.lit(0)
    )
    return (
        groups.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.sum((F.col("div") < F.col("l")).cast("long"))
            .cast("long")
            .alias("n_low_div_groups"),
            F.sum(exposed).cast("long").alias("n_exposed_customers"),
            F.expr(
                "SUM(CASE WHEN div < l THEN gsize ELSE 0 END)"
                " * 1000000 DIV ANY_VALUE(t)"
            )
            .cast("long")
            .alias("exposed_ppm"),
            F.any_value(F.col("g")).cast("long").alias("n_groups_total"),
        )
        .orderBy("l")
    )
