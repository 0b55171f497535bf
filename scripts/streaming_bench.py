#!/usr/bin/env python
"""Streaming throughput/latency bench (VERDICT r7 item 7): the batch
surface has BASELINE contracts; this records rows/sec and micro-batch
durations for the streaming surface under the StreamMetricsListener —
the 4 batch-twin foreachBatch pipelines (drift monitor, BM25 index,
online MinHash dedup, CDF upsert via sketch state) plus the stateful
DataFrame streams (windowed counts, sessionization, watermark dedup,
applyInPandasWithState totals, the purchase-gap velocity screen).

Protocol (mirrors the bench.py min-of-N discipline where it can):
the sf0.1 source table is split into N_FILES parquet files with
strictly ascending mtimes (fact 48: the file source orders batches by
(mtime, path)); each stream runs once with maxFilesPerTrigger=1 under
``trigger(availableNow=True)`` against a noop/foreachBatch sink and a
fresh checkpoint, and the listener's progress rows give per-batch
input counts + trigger durations. Aggregate rows/sec = total input
rows / total trigger-execution seconds — the end-to-end number a
capacity plan needs (per-batch processedRowsPerSecond excludes
inter-batch overhead).

Usage: python scripts/streaming_bench.py [sf_dir]
Env:   SPARK_GRAFT_CPUS (default 32)
Prints one markdown row per stream:
| stream | batches | rows | total_s | rows/s | max_batch_ms |
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.sources.readers import load_table
from fintech_lakehouse_spark.streaming import (
    StreamMetricsListener,
    dedup_events_stream,
    foreach_batch_bm25_index,
    foreach_batch_drift,
    foreach_batch_online_dedup,
    foreach_batch_sketch_rollup,
    purchase_gap_monitor,
    read_events_stream,
    sessionize_stream,
    stateful_user_totals,
    windowed_event_counts,
)

N_FILES = 4


def stage_landing(df, root: str, name: str, key: str) -> str:
    """Write ``df`` as N_FILES single-file parquet chunks (split by
    key hash so every chunk is a cross-section, like arrival order
    would be) with strictly ascending mtimes."""
    dest = os.path.join(root, name)
    os.makedirs(dest)
    now = time.time()
    for i in range(N_FILES):
        tmp = os.path.join(root, f"_tmp_{name}_{i}")
        df.filter(F.pmod(F.col(key), F.lit(N_FILES)) == i).coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
        tgt = os.path.join(dest, f"{i:02d}.parquet")
        os.replace(os.path.join(tmp, part), tgt)
        shutil.rmtree(tmp)
        os.utime(tgt, (now + 10 * i, now + 10 * i))
    return dest


def run_one(spark, name, start_query, input_rows: int) -> str:
    """Run one availableNow stream to completion under a fresh
    listener; return the markdown metrics row. ``input_rows`` is the
    TRUE staged row count — the engine's numInputRows over-counts for
    foreachBatch sinks (every action inside the sink re-scans the
    batch file, so a 4-action sink reports 4× the rows), so rows/sec
    is computed against reality, and the engine total is reported
    alongside as the re-scan diagnostic."""
    listener = StreamMetricsListener()
    spark.streams.addListener(listener)
    try:
        query = start_query()
        query.awaitTermination(600)
        # progress events are async to query end: wait until the
        # buffered rows STABILIZE (a non-empty check alone loses the
        # trailing batches)
        deadline = time.time() + 30
        seen = -1
        while time.time() < deadline:
            if len(listener.rows) == seen and seen > 0:
                break
            seen = len(listener.rows)
            time.sleep(2.0)
        rows = listener.rows
        n_batches = len([r for r in rows if r[4] > 0])
        engine_rows = sum(r[4] for r in rows)
        total_ms = sum(r[6] for r in rows if r[6] > 0)
        max_ms = max((r[6] for r in rows), default=-1)
        rps = input_rows / (total_ms / 1000.0) if total_ms > 0 else 0.0
        return (
            f"| {name} | {n_batches} | {input_rows} | {engine_rows} | "
            f"{total_ms / 1000.0:.2f} s | {rps:,.0f} | {max_ms} |"
        )
    finally:
        spark.streams.removeListener(listener)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "streaming-bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev_dir = stage_landing(events, work, "events", "event_id")
    od_dir = stage_landing(orders, work, "orders", "o_orderkey")
    dc_dir = stage_landing(docs, work, "docs", "doc_id")
    orders_schema = spark.read.parquet(od_dir).schema
    docs_schema = spark.read.parquet(dc_dir).schema
    events_schema = spark.read.parquet(ev_dir).schema

    def ckpt(name):
        return os.path.join(work, f"ckpt_{name}")

    def df_stream(name, build, mode):
        def start():
            stream = read_events_stream(
                spark, ev_dir, max_files_per_trigger=1
            )
            return (
                build(stream)
                .writeStream.format("noop")
                .outputMode(mode)
                .option("checkpointLocation", ckpt(name))
                .trigger(availableNow=True)
                .start()
            )

        return start

    def bridge_sink_stream(name, src_dir, src_schema):
        from fintech_lakehouse_spark.sources.deltastream import (
            register_deltabridge_source,
        )

        register_deltabridge_source(spark)
        target = os.path.join(work, f"{name}_table")
        os.makedirs(target, exist_ok=True)

        def start():
            stream = (
                spark.readStream.schema(src_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
            )
            return (
                stream.writeStream.format("deltabridge")
                .option("path", target)
                .option("checkpointLocation", ckpt(name))
                .trigger(availableNow=True)
                .start()
            )

        return start

    def fb_stream(name, src_dir, src_schema, sink):
        def start():
            stream = (
                spark.readStream.schema(src_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
            )
            return (
                stream.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt(name))
                .trigger(availableNow=True)
                .start()
            )

        return start

    benches = [
        ("windowed_event_counts", df_stream(
            "windowed_event_counts",
            lambda s: windowed_event_counts(s), "update")),
        ("sessionize_stream", df_stream(
            "sessionize_stream", lambda s: sessionize_stream(s), "append")),
        ("dedup_events_stream", df_stream(
            "dedup_events_stream",
            lambda s: dedup_events_stream(s), "append")),
        ("stateful_user_totals", df_stream(
            "stateful_user_totals",
            lambda s: stateful_user_totals(s), "append")),
        ("purchase_gap_monitor", df_stream(
            "purchase_gap_monitor",
            lambda s: purchase_gap_monitor(s), "append")),
        ("foreach_batch_drift", fb_stream(
            "foreach_batch_drift", od_dir, orders_schema,
            foreach_batch_drift(os.path.join(work, "drift_view")))),
        ("foreach_batch_sketch_rollup", fb_stream(
            "foreach_batch_sketch_rollup", ev_dir, events_schema,
            foreach_batch_sketch_rollup(
                os.path.join(work, "sketch_view"),
                ["event_type"], "user_id"))),
        ("foreach_batch_bm25_index", fb_stream(
            "foreach_batch_bm25_index", dc_dir, docs_schema,
            foreach_batch_bm25_index(os.path.join(work, "bm25_index")))),
        ("deltabridge_stream_sink", bridge_sink_stream(
            "deltabridge_stream_sink", od_dir, orders_schema)),
        ("foreach_batch_online_dedup", fb_stream(
            "foreach_batch_online_dedup", dc_dir, docs_schema,
            foreach_batch_online_dedup(
                os.path.join(work, "dedup_state"),
                os.path.join(work, "dedup_decisions")))),
    ]
    n_events = events.count()
    n_orders = orders.count()
    n_docs = docs.count()
    inputs = {
        "deltabridge_stream_sink": n_orders,
        "foreach_batch_drift": n_orders,
        "foreach_batch_bm25_index": n_docs,
        "foreach_batch_online_dedup": n_docs,
    }
    # warmup: one throwaway stream pays JVM codegen + state-store init
    # so the first table row isn't charged for it (memory: warmup-
    # before-bench)
    run_one(spark, "_warmup", df_stream(
        "_warmup", lambda s: windowed_event_counts(s), "update"), n_events)
    print(
        "| stream | batches | rows | engine_rows | total_s | rows/s "
        "| max_batch_ms |"
    )
    print("|---|---|---|---|---|---|---|")
    for name, start in benches:
        print(
            run_one(spark, name, start, inputs.get(name, n_events)),
            flush=True,
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
