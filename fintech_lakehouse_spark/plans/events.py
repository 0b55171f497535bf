"""Event-stream queries, batch form (SURVEY.md §2.12 [NEW] + §2.8
from_json). The streaming module (fintech_lakehouse_spark.streaming)
runs the same logic with readStream/watermarks; these batch twins are
what the DuckDB oracle can check — the driver contract requires
batch-over-events equivalents (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from fintech_lakehouse_spark.plans._num import davg_int, sql_davg_int, sql_isum
from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table

PROPS_SCHEMA = StructType([StructField("k", IntegerType(), True)])


@register(
    "event_props_extract",
    oracle=f"""
    SELECT event_type,
           COUNT(*)   AS n_events,
           {sql_isum('k')} AS total_k,
           {sql_davg_int('k')} AS avg_k
    FROM (
        SELECT event_type,
               CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS INT) AS k
        FROM events
    )
    GROUP BY event_type
    """,
)
def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: from_json on the events.props JSON
    string (SURVEY §2.8 [NEW] — the reference has no JSON functions but
    the events table demands them). JSON parse happens once in the
    scan stage; the aggregate is then plain codegen. avg_k uses the
    exact integer floor-division average (plans/_num.py) — the k values
    are small ints whose true averages hit round() midpoints."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("k", F.from_json("props", PROPS_SCHEMA).getField("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k")).alias("total_k"),
            davg_int("k").alias("avg_k"),
        )
    )


@register(
    "hourly_event_windows",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*)               AS n_events,
           ROUND(SUM(value), 4)   AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window aggregation — batch twin of the streaming
    windowed agg (SURVEY §2.12). F.window() emits the same aligned
    buckets the streaming engine produces; window.start ≡ SQL
    date_trunc('hour')."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "user_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTES
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — batch
    session_window (SURVEY §2.12). One shuffle on user_id; the oracle
    proves the semantics via the classic gaps-and-islands rewrite.

    Session identity: (user_id, session start). Events exactly 30min
    apart continue a session in Spark's session_window (the merge is
    INCLUSIVE at the exact-gap boundary — pinned empirically in
    tests/test_streaming.py::test_session_gap_boundary_semantics) —
    LAG > INTERVAL '30m' (strictly greater starts a new session)
    matches that."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "event_dedup_first",
    oracle="""
    SELECT event_type, COUNT(*) AS n_unique_users
    FROM (
        SELECT event_type, user_id FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
    )
    GROUP BY event_type
    """,
)
def event_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch dedup per (user, event_type) then rollup — the
    streaming dropDuplicates shape in batch form (SURVEY §2.12)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    window = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("_rn", F.row_number().over(window))
        .filter(F.col("_rn") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_users"))
    )


@register(
    "sliding_event_windows",
    oracle="""
    WITH starts AS (
        SELECT unnest([
            time_bucket(INTERVAL 30 MINUTES, ts),
            time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES
        ]) AS window_start, event_type, value
        FROM events
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM starts
    WHERE window_start <= (SELECT max(ts) FROM events)
    GROUP BY window_start, event_type
    """,
)
def sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window agg (1h window, 30m slide — SURVEY §2.12): each
    event lands in two overlapping windows. The oracle reconstructs
    the window-assignment rule (starts on the 30m grid covering ts);
    the trailing filter mirrors Spark emitting only windows whose
    start ≤ max event time."""
    events = load_table(spark, sf_dir, "events")
    # Keep the max-ts bound INSIDE the plan as an NTZ scalar (broadcast
    # 1-row cross join): collecting it to a naive Python datetime and
    # re-creating a literal shifts on non-UTC hosts — lit() and the
    # NTZ cast do not use the same zone.
    max_ts = F.broadcast(events.agg(F.max("ts").alias("_max_ts")))
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .crossJoin(max_ts)
        .filter(F.col("w.start") <= F.col("_max_ts"))
        .drop("_max_ts")
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "user_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events
    )
    SELECT f.cohort_date,
           a.active_date - f.cohort_date AS day_offset,
           COUNT(DISTINCT a.user_id)     AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    WHERE a.active_date - f.cohort_date BETWEEN 0 AND 7
    GROUP BY f.cohort_date, day_offset
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (SURVEY §2.4 analytics shape): users grouped by
    first-seen date, counted on each of their first 8 active days.
    Both sides aggregate per user BEFORE the join, so the join carries
    one row per (user, active day) — never raw events — and the
    cohort table is the smaller side."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    activity = events.select(
        "user_id", F.to_date("ts").alias("active_date")
    ).distinct()
    offset = F.datediff("active_date", "cohort_date")
    return (
        activity.join(firsts, "user_id")
        .filter(offset.between(0, 7))
        .groupBy("cohort_date", offset.alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "purchase_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS first_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS first_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.first_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS first_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
)
def purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (SURVEY §2.12 analytics shape):
    view → later click → later purchase, per user, counted per stage.
    Three stacked conditional-min windows over ONE user_id partition —
    a single shuffle carries all three stages (the oracle's join
    cascade re-derives the same minima)."""
    from pyspark.sql.window import Window

    # Non-funnel event types can never contribute to a conditional
    # min; filtering first pushes the IN-predicate into the scan and
    # shrinks the window input.
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = Window.partitionBy("user_id")
    ts, typ = F.col("ts"), F.col("event_type")
    staged = events.withColumn(
        "first_view", F.min(F.when(typ == "view", ts)).over(w)
    )
    staged = staged.withColumn(
        "first_click",
        F.min(
            F.when((typ == "click") & (ts > F.col("first_view")), ts)
        ).over(w),
    )
    staged = staged.withColumn(
        "first_purchase",
        F.min(
            F.when((typ == "purchase") & (ts > F.col("first_click")), ts)
        ).over(w),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("first_view").alias("fv"),
        F.max("first_click").alias("fc"),
        F.max("first_purchase").alias("fp"),
    )
    return per_user.agg(
        F.count("fv").alias("n_viewed"),
        F.count("fc").alias("n_clicked_after_view"),
        F.count("fp").alias("n_purchased_after_click"),
    )


@register(
    "purchase_click_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           COUNT(c.event_id)    AS n_prior_clicks_30m,
           ROUND(COALESCE(SUM(c.value), 0), 4) AS prior_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTES
     AND c.ts <= p.ts
    GROUP BY p.event_id
    """,
)
def purchase_click_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join — the batch twin of the stream-stream
    join (SURVEY §2.12): each purchase pairs with same-user clicks in
    the preceding 30 minutes. The equality key (user_id) carries the
    shuffle; the time bound filters within groups, so this does NOT
    explode into a cross product. streaming/events.py::
    purchase_click_stream_join runs the same condition with
    watermarked state."""
    events = load_table(spark, sf_dir, "events", spread="event_id")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
        F.col("event_id").alias("click_id"),
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("click_id").alias("n_prior_clicks_30m"),
        F.round(F.coalesce(F.sum("c_value"), F.lit(0.0)), 4).alias(
            "prior_click_value"
        ),
    )


@register(
    "event_props_variant",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS total_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
           'OBJECT<k: BIGINT>' AS merged_schema
    FROM events
    GROUP BY event_type
    """,
)
def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type — the
    schema-on-read path next to event_props_extract's from_json
    (schema-on-write): parse_json keeps the payload as an open
    half-typed value, try_variant_get extracts typed fields lazily,
    and schema_of_variant_agg MERGES the observed schema across every
    row of the group — the drift detector that tells you when a
    producer starts emitting a new field, without declaring a schema
    anywhere.

    Why this matters at 100 TB: VARIANT stores the parsed binary form
    columnar-side, so repeated multi-field extraction skips re-parsing
    the JSON text per access (from_json pays one parse per declared
    schema; get_json_object one parse PER CALL). The oracle pins the
    typed aggregates against DuckDB's json_extract and pins the merged
    schema Spark derives from the data to the expected literal — a
    drifted producer (new key, retyped value) flips the row red."""
    events = load_table(spark, sf_dir, "events")
    v = events.withColumn("v", F.parse_json("props"))
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.try_variant_get("v", "$.k", "long")).alias("total_k"),
        F.max(F.try_variant_get("v", "$.k", "long")).alias("max_k"),
        F.schema_of_variant_agg("v").alias("merged_schema"),
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type)
                           AS DOUBLE) AS transition_prob
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (the behavioral-model input of churn prediction,
    anomaly scoring, and session simulation — and the sequence-mining
    complement of purchase_funnel's fixed-order shape): for every
    (previous event, next event) pair across all users, the
    transition count and its row-normalized probability (exact
    int/int IEEE division, unrounded).

    Shape: ONE lag window per user (sort by ts with the event_id
    tie-break both engines share) — unlike a sliding RANGE frame this
    is O(1) per row after the per-key sort, so a hot user costs
    O(n log n) in its task, not the O(n·frame) quadratic the velocity
    family guards against; then a map-side-combinable 2-key count
    whose output is |event_types|² ≤ tiny, and the row normalization
    runs over that tiny aggregate (25 rows here), not the fact
    stream. At 100 TB the only fact-sized cost is the one sort-shuffle
    on user_id that every sequence model pays."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    seq = events.select(
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_total = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions")
            / F.sum("n_transitions").over(row_total).cast("double")
        ).alias("transition_prob"),
    )


AB_Z_FLAG = 1.96  # two-sided 95% critical value

# The one float in the A/B readout: pooled two-proportion z — an
# identical expression tree on both engines (divisions/multiplies +
# ONE sqrt, all IEEE-exact; no libm transcendentals), NULLIF-guarded
# against a degenerate pooled rate (0 or 1 → zero standard error).
_AB_Z_SQL = (
    "ROUND((CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)"
    " - CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE))"
    " / NULLIF(sqrt((CAST(conv_control + conv_treatment AS DOUBLE)"
    " / CAST(n_control + n_treatment AS DOUBLE))"
    " * (1.0 - CAST(conv_control + conv_treatment AS DOUBLE)"
    " / CAST(n_control + n_treatment AS DOUBLE))"
    " * (1.0 / CAST(n_control AS DOUBLE)"
    " + 1.0 / CAST(n_treatment AS DOUBLE))), 0.0), 4)"
)


@register(
    "ab_test_lift",
    oracle=f"""
    WITH units AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id, day
    ),
    armed AS (
        SELECT (('0x' || substr(md5('abtest' || '|' || COALESCE(CAST(user_id AS VARCHAR), '__NULL_KEY__')), 1, 12))::BIGINT % 2) AS arm, converted FROM units
    ),
    agg AS (
        SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment,
               CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_control,
               CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_treatment
        FROM armed
    )
    SELECT n_control, n_treatment, conv_control, conv_treatment,
           CAST(conv_control * 1000000 // n_control AS BIGINT)     AS rate_control_ppm,
           CAST(conv_treatment * 1000000 // n_treatment AS BIGINT) AS rate_treatment_ppm,
           CAST(conv_treatment * 1000000 // n_treatment
                - conv_control * 1000000 // n_control AS BIGINT)   AS lift_ppm,
           {_AB_Z_SQL} AS z_score,
           abs({_AB_Z_SQL}) > {AB_Z_FLAG} AS significant
    FROM agg
    """,
)
def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm experiment readout (the A/B analysis every growth/risk
    team runs): analysis units are user-DAYS (user-level conversion
    saturates to 100% over a month of activity — a degenerate pooled
    rate zeroes the standard error; day grain keeps ~40% conversion
    at every SF), arms are CLUSTER-randomized at the user level by the
    portable md5 bucket (the industry-standard design: a user's arm
    is stable forever, across engines and retries — never re-randomized
    per day), conversion = any purchase event that day, and the
    two-proportion pooled z-test on the rate difference. Rates and
    lift are exact integer ppm (floor-divided non-negative counts);
    the z-statistic is the ONE float — an identical division/multiply/
    sqrt expression tree on both engines (sqrt is IEEE-exact; libm
    transcendentals stay out), NULLIF-guarded and rounded to 4.
    ``significant`` compares the ROUNDED z to ±{AB_Z_FLAG} so both
    engines flag from the same value.

    Scale shape: unit construction is one map-side-combinable
    groupBy(user_id, day); the arm is a scan-side hash expression (no
    join against an assignment table); the readout is conditional sums
    collapsing to ONE row. At 100 TB: a single shuffle on the unit
    key. Multi-variant tests add arms to the same conditional-sum
    pass, never extra scans.

    Reference parity: extends the reference's declared event-analytics
    family (funnels, sessions, velocity — SURVEY §2.4/§2.12) with the
    experimentation readout none of those express."""
    from fintech_lakehouse_spark.functions.sampling import hash_bucket

    events = load_table(spark, sf_dir, "events")
    units = events.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max((F.col("event_type") == "purchase").cast("long")).alias("converted")
    )
    armed = units.select(
        hash_bucket("user_id", "abtest", 2).alias("arm"), "converted"
    )
    agg = armed.agg(
        F.sum((F.col("arm") == 0).cast("long")).cast("long").alias("n_control"),
        F.sum((F.col("arm") == 1).cast("long")).cast("long").alias("n_treatment"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(F.lit(0)))
        .cast("long")
        .alias("conv_control"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(F.lit(0)))
        .cast("long")
        .alias("conv_treatment"),
    )
    return agg.select(
        "n_control",
        "n_treatment",
        "conv_control",
        "conv_treatment",
        F.expr("conv_control * 1000000 DIV n_control")
        .cast("long")
        .alias("rate_control_ppm"),
        F.expr("conv_treatment * 1000000 DIV n_treatment")
        .cast("long")
        .alias("rate_treatment_ppm"),
        F.expr(
            "conv_treatment * 1000000 DIV n_treatment"
            " - conv_control * 1000000 DIV n_control"
        )
        .cast("long")
        .alias("lift_ppm"),
        F.expr(_AB_Z_SQL).alias("z_score"),
        F.expr(f"abs({_AB_Z_SQL}) > {AB_Z_FLAG}").alias("significant"),
    )


PATH_TOP_K = 20


@register(
    "top_session_paths",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTES
                    OR LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_no,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
               COUNT(*) AS path_len
        FROM numbered
        GROUP BY user_id, session_no
    )
    SELECT path,
           CAST(ANY_VALUE(path_len) AS BIGINT) AS path_len,
           CAST(COUNT(*) AS BIGINT)            AS n_sessions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOP_K}
    """,
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: the most common complete event-type PATHS
    through a session (the product-analytics view funnels and
    first-order transition matrices both miss — purchase_funnel fixes
    the order, event_transition_matrix forgets everything but the last
    step; paths keep the whole trajectory). Sessions are the same
    30-minute-gap islands as user_sessions (strictly-greater gap
    starts a session, the session_window-pinned boundary); within a
    session events order by (ts, event_id) — the total tie-break that
    makes the path STRING deterministic on both engines. Spark builds
    the ordered path by sorting the collected (ts, event_id, type)
    structs inside the aggregate (collect_list order is
    partition-dependent; array_sort makes it canonical), the oracle by
    ordered string_agg.

    Scale shape: one shuffle on user_id carries sessionization AND
    path construction (the window and the groupBy share the
    partitioning); path counting is a map-side-combinable groupBy on
    the path string; top-k is TakeOrderedAndProject. Path cardinality,
    not event volume, is the post-shuffle working set. At 100 TB add a
    path-length cap (slice the sorted array) to bound hot-session
    strings — the synthetic lake's sessions are short enough to keep
    whole."""
    events = load_table(spark, sf_dir, "events")
    sessions = events.groupBy(
        "user_id",
        F.session_window("ts", "30 minutes").alias("_w"),
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("path_len"),
    )
    return (
        sessions.groupBy("path")
        .agg(
            F.any_value("path_len").cast("long").alias("path_len"),
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP_K)
    )


RAPID_GAP_US = 7_200_000_000  # 2 h between purchases counts as rapid
RAPID_FLAG_US = 600_000_000  # <= 10 min min-gap warrants review
RAPID_TOP = 20


@register(
    "rapid_repeat_purchases",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_id, epoch_us(ts) AS us
        FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
        SELECT user_id,
               us - LAG(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS gap_us
        FROM p
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                AS n_purchases,
           CAST(MIN(gap_us) // 1000 AS BIGINT)     AS min_gap_ms,
           CAST(SUM(CASE WHEN gap_us <= {RAPID_GAP_US} THEN 1 ELSE 0 END)
                AS BIGINT)                         AS n_rapid_2h,
           MIN(gap_us) <= {RAPID_FLAG_US}          AS review_flag
    FROM gaps
    GROUP BY user_id
    HAVING COUNT(gap_us) > 0
    ORDER BY min_gap_ms, user_id
    LIMIT {RAPID_TOP}
    """,
)
def rapid_repeat_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-payment velocity screen — the double-charge /
    card-testing detector a payments-risk team runs (many purchases
    from one account separated by seconds are retries, bot runs, or
    fraud probes; the per-user MIN inter-purchase gap is the ranking
    signal): per user with >= 2 purchases, the purchase count, the
    smallest gap between consecutive purchases in exact integer
    milliseconds, how many gaps fall under 2 hours, and a <= 10 min
    review flag; the {RAPID_TOP} tightest accounts reported with the
    deterministic (min_gap, user_id) tie-break.

    Determinism: gaps are differences of epoch microseconds, so the
    session-timezone offset that the NTZ→epoch mapping injects cancels
    exactly (only gaps are emitted, never absolute epochs); the
    (ts, event_id) window order is total; ms via integer floor-div.

    Scale shape: the lag window is ONE shuffle on user_id, and frame
    cost is O(n log n) per key — structurally survivable, unlike the
    rangeBetween velocity windows (ROUND_NOTES fact 19's quadratic
    hazard does not apply to lag). The per-user aggregate rides the
    same partitioning (no second exchange), and top-k plans as
    TakeOrderedAndProject. One BOT/AGGREGATOR key still serializes
    its sort into a single task (measured at 1B rows with an 800M-row
    hot user: >13× the parallel form and killed unfinished, BASELINE
    §3) — when event_key_skew_profile flags a hot key, compute the
    same profile via operators/skew.py::bucketed_min_gap (two-phase,
    exact-equivalent, 222.8 s at 1B)."""
    events = load_table(spark, sf_dir, "events")
    return purchase_gap_profile(events).orderBy("min_gap_ms", "user_id").limit(
        RAPID_TOP
    )


def purchase_gap_profile(events: DataFrame) -> DataFrame:
    """The un-limited per-user gap aggregate behind
    rapid_repeat_purchases — shared with the streaming monitor
    (streaming/events.py::purchase_gap_monitor) so batch and stream
    can never disagree on the gap arithmetic. Emits one row per user
    with >= 2 purchases."""
    from pyspark.sql.window import Window

    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = p.withColumn("gap_us", F.col("us") - F.lag("us").over(w))
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.expr("MIN(gap_us) DIV 1000").cast("long").alias("min_gap_ms"),
            F.sum(
                F.when(F.col("gap_us") <= RAPID_GAP_US, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_rapid_2h"),
            (F.min("gap_us") <= RAPID_FLAG_US).alias("review_flag"),
            F.count("gap_us").alias("_n_gaps"),
        )
        .filter(F.col("_n_gaps") > 0)
        .drop("_n_gaps")
    )


@register(
    "purchase_nearest_click",
    oracle="""
    WITH c AS (
        SELECT user_id, epoch_us(ts) AS us, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    p AS (
        SELECT user_id, event_id AS purchase_event_id, epoch_us(ts) AS us
        FROM events WHERE event_type = 'purchase'
    ),
    u AS (
        SELECT user_id, us, 0 AS stream, click_id,
               CAST(NULL AS BIGINT) AS purchase_event_id
        FROM c
        UNION ALL
        SELECT user_id, us, 1, NULL, purchase_event_id FROM p
    ),
    w AS (
        SELECT *,
               last_value(CASE WHEN stream = 0 THEN click_id END
                          IGNORE NULLS) OVER bw AS prev_id,
               last_value(CASE WHEN stream = 0 THEN us END
                          IGNORE NULLS) OVER bw AS prev_us,
               first_value(CASE WHEN stream = 0 THEN click_id END
                           IGNORE NULLS) OVER fw AS next_id,
               first_value(CASE WHEN stream = 0 THEN us END
                           IGNORE NULLS) OVER fw AS next_us
        FROM u
        WINDOW bw AS (PARTITION BY user_id ORDER BY us, stream
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fw AS (PARTITION BY user_id ORDER BY us, stream
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    picked AS (
        SELECT user_id, purchase_event_id,
               CASE WHEN next_id IS NULL OR (prev_id IS NOT NULL
                         AND (us - prev_us) <= (next_us - us))
                    THEN prev_id ELSE next_id END AS click_event_id,
               CASE WHEN next_id IS NULL OR (prev_id IS NOT NULL
                         AND (us - prev_us) <= (next_us - us))
                    THEN prev_us - us ELSE next_us - us END AS delta_us
        FROM w WHERE stream = 1
    )
    SELECT user_id, purchase_event_id,
           CAST(click_event_id AS BIGINT) AS click_event_id,
           CAST(delta_us AS BIGINT)       AS delta_us
    FROM picked
    """,
)
def purchase_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event join: for every purchase, the SAME user's click
    closest in time in EITHER direction, with the signed gap in exact
    microseconds (negative = the click came first). The bidirectional
    completion of the as-of family — purchase_asof_click answers
    "which click preceded this purchase" (attribution);
    nearest answers "which click is this purchase's closest neighbor"
    (the feature-store / kdb nearest-observation lookup, and the
    matching step of uplift analyses where the influencing event may
    land just AFTER the conversion clock tick). Equal distances
    prefer the earlier click; unmatched purchases survive with NULLs
    (left-join semantics).

    Determinism: the operator requires NUMERIC time — both engines
    compare exact epoch-microsecond differences, and only
    DIFFERENCES are emitted, so the session-offset of the NTZ→epoch
    mapping cancels (the rapid_repeat_purchases contract); clicks
    tied on (user, ts) reduce with max(event_id) first.

    Scale shape: operators/joins.py::nearest_join — ONE shuffle on
    user_id carries the union stream and both window directions
    (backward last + forward first over the same sort); no
    self-join, no range explosion. 100 TB cost = one
    sort-within-partitions of events."""
    from fintech_lakehouse_spark.operators import nearest_join

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("us"), "event_id"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        us.alias("us"),
    )
    joined = nearest_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="us",
        right_time="us",
        value_columns=["event_id"],
        suffix="_click",
    )
    return joined.select(
        "user_id",
        "purchase_event_id",
        F.col("event_id_click").cast("long").alias("click_event_id"),
        (F.col("us_click") - F.col("us")).cast("long").alias("delta_us"),
    )


CONVERT_FAST_US = 86_400_000_000  # converted within one day


@register(
    "signup_conversion_latency",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               MIN(epoch_us(ts)) FILTER (event_type = 'signup') AS t0,
               MIN(epoch_us(ts)) FILTER (
                   event_type = 'purchase'
                   AND epoch_us(ts) >= (
                       SELECT MIN(epoch_us(ts)) FROM events s
                       WHERE s.user_id = e.user_id
                         AND s.event_type = 'signup')
               ) AS first_p
        FROM events e
        WHERE event_type IN ('signup', 'purchase')
        GROUP BY user_id
    ),
    lat AS (
        SELECT user_id, t0, first_p, first_p - t0 AS lat_us
        FROM per_user WHERE t0 IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT)                       AS n_signups,
           CAST(COUNT(lat_us) AS BIGINT)                  AS n_converted,
           CAST(COUNT(lat_us) * 1000000 // COUNT(*)
                AS BIGINT)                                AS conversion_ppm,
           CAST(CAST(FLOOR(quantile_cont(lat_us, 0.5)) AS BIGINT)
                // 1000000 AS BIGINT)                     AS p50_latency_s,
           CAST(CAST(FLOOR(quantile_cont(lat_us, 0.9)) AS BIGINT)
                // 1000000 AS BIGINT)                     AS p90_latency_s,
           CAST(SUM(CASE WHEN lat_us <= {CONVERT_FAST_US}
                         THEN 1 ELSE 0 END) * 1000000
                // COUNT(lat_us) AS BIGINT)               AS within_1d_ppm
    FROM lat
    """,
)
def signup_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase conversion latency — the activation
    metric growth teams track next to purchase_funnel (the funnel
    counts WHO converts; this measures HOW FAST): per signed-up user,
    the gap from first signup to the first purchase AT OR AFTER it,
    rolled up to conversion rate, exact-interpolated p50/p90 latency
    in floor-divided whole seconds, and the within-one-day share in
    ppm.

    Determinism: latencies are exact integer-µs differences (the NTZ
    session-offset cancels — rapid_repeat_purchases contract);
    percentile interpolation is the quantity_percentiles-established
    cross-engine-exact pair (Spark percentile ≡ DuckDB quantile_cont:
    identical IEEE interpolation over exact integers), then FLOORED
    to integer µs on BOTH engines before the floor-div to seconds —
    an explicit FLOOR, because bare CAST(double AS BIGINT) truncates
    on Spark but rounds half-away on DuckDB, and a fractional
    percentile straddling a whole value flips the hash (r7s3 review
    finding #1, live-reproduced).

    Scale shape: ONE scan (both event types in one filter), one
    user_id groupBy; each user's purchase epochs fold into a sorted
    in-row array (bounded per key — avg ~13 here; the
    collect-then-filter beats a second purchase scan + re-join), and
    the readout is a 1-row aggregate. At extreme per-user volumes
    swap the array for the asof_join union-stream form."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    per_user = (
        events.filter(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "event_type", us.alias("us"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("us"))).alias(
                "t0"
            ),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("event_type") == "purchase", F.col("us"))
                )
            ).alias("ps"),
        )
        .filter(F.col("t0").isNotNull())
        .select(
            "t0",
            F.array_min(
                F.filter("ps", lambda x: x >= F.col("t0"))
            ).alias("first_p"),
        )
    )
    lat = per_user.select((F.col("first_p") - F.col("t0")).alias("lat_us"))
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_signups"),
        F.count("lat_us").cast("long").alias("n_converted"),
        F.expr("COUNT(lat_us) * 1000000 DIV COUNT(1)")
        .cast("long")
        .alias("conversion_ppm"),
        F.expr("CAST(FLOOR(percentile(lat_us, 0.5)) AS BIGINT) DIV 1000000")
        .cast("long")
        .alias("p50_latency_s"),
        F.expr("CAST(FLOOR(percentile(lat_us, 0.9)) AS BIGINT) DIV 1000000")
        .cast("long")
        .alias("p90_latency_s"),
        F.expr(
            f"SUM(CASE WHEN lat_us <= {CONVERT_FAST_US} THEN 1 ELSE 0 END)"
            " * 1000000 DIV COUNT(lat_us)"
        )
        .cast("long")
        .alias("within_1d_ppm"),
    )


@register(
    "event_burstiness_profile",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT)   AS n_hours,
               CAST(SUM(x) AS BIGINT)     AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(MAX(x) AS BIGINT)     AS peak_hour_events
        FROM hourly GROUP BY event_type
    )
    SELECT event_type, n_hours,
           CAST(sx AS BIGINT)                          AS n_events,
           CAST((CAST(n_hours AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                * 1000000
                // (CAST(n_hours AS HUGEINT) * sx) AS BIGINT) AS fano_ppm,
           peak_hour_events,
           CAST((CAST(n_hours AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                * 1000000
                // (CAST(n_hours AS HUGEINT) * sx) AS BIGINT)
               > 2000000 AS overdispersed
    FROM m ORDER BY event_type
    """,
)
def event_burstiness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor) of event arrivals per type — the
    overdispersion diagnostic behind bot/incident detection (a Poisson
    arrival process has variance ≈ mean, Fano ≈ 1; bots, retry storms,
    and flash events push variance-to-mean far above it; a Fano well
    below 1 means rate-limited/scheduled traffic). Per event type over
    hourly buckets: hours observed, total events, the Fano factor in
    exact floor-divided ppm, the busiest hour's count, and a > 2.0
    overdispersion flag.

    Determinism: Fano = var/mean telescopes to the single integer
    quotient (n·Σx² − (Σx)²) · 1e6 DIV (n·Σx) over exact hourly
    counts — the daily_order_autocorrelation moment algebra with the
    division folded in; no float exists anywhere in the query. The
    numerator equals n²·σ²·1e6 and exceeds int64 once n_hours·σ_hourly
    passes ~3e6 (reachable at 1B-row event scale: hourly stdev ~4k
    over a 744-hour month), so the moment products compute in
    DECIMAL(38,0) on Spark / HUGEINT on the oracle (the chi²/Neyman
    widening pattern) before the final BIGINT quotient.

    Moments run over ACTIVE hours only (no zero-densification): a
    type that bursts once and stays silent shows up through
    peak_hour_events and a low n_hours, not through the Fano —
    densifying onto the full calendar (the daily_volume_anomaly
    recipe) is the variant for silence-sensitive monitoring.

    Scale shape: the fact scan folds to one row per (type, hour)
    map-side; moments aggregate that calendar-bounded frame to one
    row per type. Same cost profile as the drift monitor — at 100 TB
    the hourly rollup is the only fact-scale work."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    fano = (
        "(CAST(n_hours AS DECIMAL(38,0)) * sxx"
        " - CAST(sx AS DECIMAL(38,0)) * sx) * 1000000"
        " DIV (CAST(n_hours AS DECIMAL(38,0)) * sx)"
    )
    return (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.sum("x").cast("long").alias("sx"),
            F.sum(F.expr("x * x")).cast("long").alias("sxx"),
            F.max("x").cast("long").alias("peak_hour_events"),
        )
        .select(
            "event_type",
            "n_hours",
            F.col("sx").alias("n_events"),
            F.expr(fano).cast("long").alias("fano_ppm"),
            "peak_hour_events",
            (F.expr(fano) > 2_000_000).alias("overdispersed"),
        )
        .orderBy("event_type")
    )


@register(
    "event_props_variant_extract",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           MIN(k)   AS min_k,
           MAX(k)   AS max_k,
           {sql_isum('k')} AS total_k,
           {sql_isum('missing_null')} AS n_missing_null
    FROM (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               CASE WHEN json_extract(props, '$.nope') IS NULL
                    THEN 1 ELSE 0 END AS missing_null
        FROM events
    )
    GROUP BY event_type
    """,
)
def event_props_variant_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VARIANT-typed semi-structured extraction (r14 — the variantType
    feature's query-side twin, next to ``event_props_extract``'s
    from_json form): ``parse_json`` lifts events.props into a real
    VARIANT column, ``variant_get`` path-extracts with a type cast,
    and a missing path yields SQL NULL (pinned by ``n_missing_null``
    == n_events). The DuckDB oracle extracts through its own JSON
    path machinery — two independent semi-structured engines agreeing
    on values, not a string comparison of representations.

    Scale shape: parse once in the scan stage (the variant binary
    never shuffles — extraction happens before the aggregate), then
    one low-cardinality hash agg with map-side partials. At 100 TB
    variant columns beat repeated JSON string parsing precisely
    because the parse cost is paid once at ingest/scan."""
    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    extracted = events.select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'long')").alias("k"),
        F.expr(
            "CASE WHEN variant_get(v, '$.nope', 'long') IS NULL "
            "THEN 1 ELSE 0 END"
        ).alias("missing_null"),
    )
    return extracted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("total_k"),
        F.sum("missing_null").alias("n_missing_null"),
    )
