"""Structured Streaming surface over the events stream (SURVEY §2.12
— [NEW]: the reference configures a checkpoint dir but ships no
streaming code; this is the declared-but-missing capability).

Design decisions (documented per SURVEY §7.4 risk 5, tested against
batch recomputation in tests/test_streaming.py):

* watermark 1 hour — late events beyond it are dropped from windowed
  state; adjust per SLA.
* tumbling/sliding windows and session windows use the SAME
  expressions as the batch twins in plans/events.py, so streaming
  output == batch output over a closed input (verified in tests with
  availableNow trigger).
* dedup uses dropDuplicatesWithinWatermark on event_id — bounded
  state, exactly-once per id within the watermark horizon.
* sink: foreachBatch → MERGE-style upsert (reuses
  sources.writers.upsert_lake_table) — idempotent under micro-batch
  replay, the production pattern for streaming→lake writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of event parquet files landing in ``path``.

    At scale the source would be Kafka (`spark.readStream.format
    ("kafka")`) — the downstream operators are source-agnostic."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide_duration`` is set) windowed
    counts/sums per event_type. Watermark bounds state: windows older
    than max(ts) − watermark finalize and evict."""
    window_col = (
        F.window("ts", window_duration, slide_duration)
        if slide_duration
        else F.window("ts", window_duration)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(window_col.alias("w"), "event_type")
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


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user (gap-based), streaming-native state
    merging. Batch twin: plans/events.py::user_sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
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


def dedup_events_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once per event_id within the watermark horizon —
    bounded-state streaming dedup (SURVEY §2.12)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def purchase_click_stream_join(
    events: DataFrame, lookback: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join (SURVEY §2.12): purchases pair with
    same-user clicks from the preceding ``lookback``. Watermarks on
    BOTH sides + the time-bound condition let the engine evict click
    state once no future purchase can match it — unbounded joins are
    refused in streaming. Batch twin (oracle-checked):
    plans/events.py::purchase_click_interval_join."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id", "p_ts", "c_ts", "c_value")


STATEFUL_TOTALS_SCHEMA = (
    "user_id long, events_seen long, total_value double, batch_events long"
)
_STATE_SCHEMA = "events_seen long, total_value double"


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (SURVEY §2.12: applyInPandasWithState
    — the escape hatch when built-in windows can't express the state
    machine): per-user running totals that persist across micro-batches
    in the state store.

    Each invocation receives the user's Arrow batches for this
    micro-batch plus their persisted state; emits one row per user per
    batch with lifetime totals. The same pattern carries fraud
    velocity counters, session enrichment, or per-entity model state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        user_id = key[0]
        batch_events = 0
        batch_value = 0.0
        for pdf in pdfs:
            batch_events += len(pdf)
            batch_value += float(pdf["value"].fillna(0.0).sum())
        if state.exists:
            seen, total = state.get
        else:
            seen, total = 0, 0.0
        seen += batch_events
        total += batch_value
        state.update((seen, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "events_seen": [seen],
                "total_value": [round(total, 4)],
                "batch_events": [batch_events],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=STATEFUL_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def foreach_batch_upsert(target_path: str, merge_keys: list[str]):
    """foreachBatch sink: MERGE each micro-batch into a lake table —
    idempotent under replay (micro-batch reprocessing upserts the same
    keys). Reuses the batch upsert operator (SURVEY §2.1 S6)."""
    from fintech_lakehouse_spark.sources.writers import upsert_lake_table

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        upsert_lake_table(
            batch_df.sparkSession, batch_df, target_path, merge_keys=merge_keys
        )

    return _write
