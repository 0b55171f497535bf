"""Streaming correctness: run each streaming operator over a closed
file source (availableNow trigger) and compare against the batch
recomputation — the only trustworthy oracle for streaming semantics
(SURVEY §7.4 risk 5)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.sources.readers import load_table
from fintech_lakehouse_spark.streaming import (
    dedup_events_stream,
    foreach_batch_upsert,
    read_events_stream,
    sessionize_stream,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Stage the events table as a landing directory (2 files so the
    stream sees multiple source splits)."""
    path = tmp_path_factory.mktemp("events_landing")
    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    batch.repartition(2).write.mode("overwrite").parquet(str(path / "data"))
    return str(path / "data")


def _run_to_memory(spark, stream_df, name: str, mode: str = "complete"):
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return spark.table(name)


def _norm(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_windowed_counts_match_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_to_memory(
        spark, windowed_event_counts(stream), "windowed_counts"
    )
    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _norm(got, cols) == _norm(expected, cols)


def test_sessionize_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = _run_to_memory(spark, sessionize_stream(stream), "sessions_stream")
    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    expected = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
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
    cols = ["user_id", "session_start", "n_events", "session_value"]
    assert _norm(got, cols) == _norm(expected, cols)


def test_streaming_dedup(spark, tmp_path):
    """Duplicate event_ids across files collapse to one row each."""
    base = load_table(spark, "/root/testdata/sf0.001", "events").limit(50)
    landing = str(tmp_path / "dup_landing")
    base.write.mode("overwrite").parquet(landing)
    base.write.mode("append").parquet(landing)  # exact duplicates
    stream = read_events_stream(spark, landing)
    got = _run_to_memory(
        spark, dedup_events_stream(stream), "dedup_stream", mode="append"
    )
    assert got.count() == 50
    assert got.select("event_id").distinct().count() == 50


def test_foreach_batch_upsert_sink(spark, events_dir, tmp_path):
    """Stream → foreachBatch MERGE sink: lake table ends up with one
    row per event_id; replaying the stream is idempotent."""
    target = str(tmp_path / "events_lake")
    for _ in range(2):  # second run replays the same data → idempotent
        stream = read_events_stream(spark, events_dir)
        query = (
            stream.writeStream.foreachBatch(
                foreach_batch_upsert(target, merge_keys=["event_id"])
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{_}"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
    lake = spark.read.parquet(target)
    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    assert lake.count() == batch.count()
    assert lake.select("event_id").distinct().count() == batch.count()


def test_stateful_user_totals_state_persists(spark, events_dir):
    """applyInPandasWithState: state must accumulate ACROSS
    micro-batches (maxFilesPerTrigger=1 over 2 files → 2 batches);
    the final per-user totals must equal the batch aggregate."""
    from fintech_lakehouse_spark.streaming import stateful_user_totals

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    got = _run_to_memory(
        spark, stateful_user_totals(stream), "stateful_totals", mode="append"
    )
    # Last emitted row per user carries the lifetime totals.
    final = (
        got.withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("user_id")
                .orderBy(F.col("events_seen").desc())
            ),
        )
        .filter("_rn = 1")
        .select("user_id", "events_seen", "total_value")
    )
    batch = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    cols = ["user_id", "events_seen", "total_value"]
    assert _norm(final, cols) == _norm(batch, cols)
    # more than one emission per user proves multi-batch state updates
    assert got.count() > batch.count()


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data policy (SURVEY §7.4 risk 5): an event older than
    watermark behind the stream's max ts must NOT reopen a finalized
    window in append mode."""
    from pyspark.sql.types import Row
    import datetime as dt

    landing = str(tmp_path / "late_landing")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows, mode):
        spark.createDataFrame(
            [Row(event_id=i, ts=base + dt.timedelta(minutes=m), user_id=1,
                 event_type="click", value=1.0, props="{}")
             for i, m in rows],
            schema="event_id long, ts timestamp, user_id long, "
                   "event_type string, value double, props string",
        ).coalesce(1).write.mode(mode).parquet(landing)

    ckpt = str(tmp_path / "late_ckpt")
    sink = str(tmp_path / "late_sink")

    def run_once():
        stream = read_events_stream(spark, landing)
        agg = windowed_event_counts(stream, watermark="10 minutes")
        q = (agg.writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # run 1: events at minute 5 and minute 600 → watermark advances to
    # ~9:50, finalizing and emitting the hour-0 window.
    mk([(1, 5), (2, 600)], "overwrite")
    run_once()
    # run 2 (same checkpoint → watermark persisted): a late event back
    # in hour 0 arrives; it must be dropped, not re-emitted.
    mk([(3, 7)], "append")
    run_once()
    out = {
        r["window_start"]: r["n_events"]
        for r in spark.read.parquet(sink).collect()
    }
    assert out.get(base) == 1  # only the on-time event; late one dropped


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Stream-stream interval join emits exactly the (purchase, click)
    pairs the batch interval join produces over the closed input."""
    from fintech_lakehouse_spark.streaming import purchase_click_stream_join

    stream = read_events_stream(spark, events_dir)
    got = _run_to_memory(
        spark, purchase_click_stream_join(stream), "ss_join", mode="append"
    )
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    p = events.filter("event_type = 'purchase'").selectExpr(
        "event_id AS purchase_id", "user_id AS pu", "ts AS p_ts"
    )
    c = events.filter("event_type = 'click'").selectExpr(
        "event_id AS click_id", "user_id AS cu", "ts AS c_ts"
    )
    expected = p.join(
        c,
        (F.col("pu") == F.col("cu"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    got_pairs = {(r["purchase_id"], r["click_id"]) for r in got.collect()}
    exp_pairs = {(r["purchase_id"], r["click_id"]) for r in expected.collect()}
    assert got_pairs == exp_pairs
    assert len(got_pairs) > 0
