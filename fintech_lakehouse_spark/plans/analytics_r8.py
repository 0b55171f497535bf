"""Round-8 analytics additions: first/last-touch revenue attribution
and a label-balance / effective-sample-size audit — staples of a
production BI + training-data stack the registry did not yet name
(RFM segmentation and the Markov transition matrix already exist:
``rfm_segment_counts``, ``event_transition_matrix``). Every query is
exact-integer (ppm shares, cents money, cross-multiplied ratios) so
the DuckDB twin is bit-replayable; [NEW] vs the reference throughout
(its transformations layer is empty — SURVEY §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table


@register(
    "last_touch_attribution",
    oracle="""
    WITH stream AS (
        SELECT event_type, value,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS channel
        FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                AS BIGINT) AS attributed_cents
    FROM stream WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY channel
    """,
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution — the marketing-analytics staple:
    each purchase's value is credited to the user's most recent
    NON-purchase event type strictly before it (the "touch"); a
    purchase with no preceding touch credits 'direct'. Output per
    channel: purchase count + attributed exact cents.

    Mechanics: one user-ordered window pass — last non-null touch over
    ROWS UNBOUNDED PRECEDING .. 1 PRECEDING (the frame excludes the
    purchase row itself, so consecutive purchases share their last
    real touch rather than chaining onto each other). The
    (ts, event_id) order is total; money is exact cents via the
    decimal-first cast.

    Scale shape: ONE user_id shuffle (the per-user stream exchange),
    then a map-side-combinable groupBy into ≤ event-type-count rows.
    First-touch is the same plan with an UNBOUNDED FOLLOWING frame."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    return (
        events.select("event_type", "value", touch.alias("channel"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(cents).cast("long").alias("attributed_cents"),
        )
        .orderBy("channel")
    )


@register(
    "label_balance_ess",
    oracle="""
    WITH c AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n
        FROM embeddings GROUP BY label
    ),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS tot,
               CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS ss,
               CAST(MAX(n) AS BIGINT) AS max_n,
               CAST(MIN(n) AS BIGINT) AS min_n
        FROM c
    )
    SELECT k AS n_labels, tot AS n_vectors,
           CAST(max_n * 1000000 // tot AS BIGINT) AS max_share_ppm,
           CAST(min_n * 1000000 // tot AS BIGINT) AS min_share_ppm,
           CAST(CAST(tot AS HUGEINT) * tot * 1000000 // ss AS BIGINT)
               AS ess_labels_micro,
           CAST(CAST(tot AS HUGEINT) * tot * 1000000 // (ss * k)
               AS BIGINT) AS balance_ppm
    FROM t
    """,
)
def label_balance_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-imbalance audit of a labeled training set — the check run
    before trusting accuracy metrics or stratified samplers: per-label
    counts fold into the effective number of classes
    ESS = (Σn)² / Σn² (Kish's effective sample size over the label
    distribution — equals k when perfectly balanced, →1 as one label
    dominates), reported in exact micro-units plus a balance ratio
    ESS/k in ppm and the max/min label shares.

    Determinism: every statistic is integer arithmetic on exact
    counts; the squares widen to DECIMAL(38)/HUGEINT from the start —
    Σn² exceeds int64 once labels hold ~3B rows (the chi²/Neyman
    widening precedent, applied BEFORE the 1B-row scale run finds it).

    Scale shape: one map-side-combinable groupBy(label) to k rows,
    then a 1-row fold — the cheapest possible audit of a 100 TB
    training table."""
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return c.agg(
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.sum("n").cast("long").alias("tot"),
        F.sum(F.expr("CAST(n AS DECIMAL(38,0)) * n")).alias("ss"),
        F.max("n").cast("long").alias("max_n"),
        F.min("n").cast("long").alias("min_n"),
    ).select(
        F.col("n_labels"),
        F.col("tot").alias("n_vectors"),
        F.expr("max_n * 1000000 DIV tot").cast("long").alias("max_share_ppm"),
        F.expr("min_n * 1000000 DIV tot").cast("long").alias("min_share_ppm"),
        F.expr(
            "CAST(CAST(tot AS DECIMAL(38,0)) * tot * 1000000 DIV ss"
            " AS BIGINT)"
        ).alias("ess_labels_micro"),
        F.expr(
            "CAST(CAST(tot AS DECIMAL(38,0)) * tot * 1000000"
            " DIV (ss * n_labels) AS BIGINT)"
        ).alias("balance_ppm"),
    )


@register(
    "first_touch_attribution",
    oracle="""
    WITH stream AS (
        SELECT event_type, value,
               FIRST_VALUE(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS channel
        FROM events
    )
    SELECT COALESCE(channel, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT))
                AS BIGINT) AS attributed_cents
    FROM stream WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY channel
    """,
)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch revenue attribution — the acquisition-side
    complement of ``last_touch_attribution`` (same one-window plan,
    FIRST_VALUE instead of LAST_VALUE): each purchase's exact cents
    credit the EARLIEST non-purchase event type in the user's history
    before it — the channel that acquired the user, versus
    last-touch's channel that closed the sale; marketing teams read
    the two side by side to see acquisition vs conversion credit.
    Same strictly-before frame (a purchase never observes itself),
    same (ts, event_id) total order, same exact-cents money, same
    single user_id shuffle + channel-cardinality aggregate."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.first(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    cents = F.expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)")
    return (
        events.select("event_type", "value", touch.alias("channel"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(cents).cast("long").alias("attributed_cents"),
        )
        .orderBy("channel")
    )
