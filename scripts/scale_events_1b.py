#!/usr/bin/env python
"""1,000,000,000-row events experiment — one order of magnitude above
the 100M skewed-events run (BASELINE §3): build the table in resumable
appended chunks (each invocation adds up to --chunks slices of 100M
rows and exits, so the build fits any wall-clock budget), then
``profile`` times the key-skew profiler and the salted bucketed
velocity window at the full size.

Usage:
  python scripts/scale_events_1b.py build [n_chunks_this_run]
  python scripts/scale_events_1b.py profile
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_lakehouse_spark.operators.skew import salted_aggregate
from fintech_lakehouse_spark.session import get_spark

PATH = "/tmp/events_1b/events.parquet"
CHUNK = 100_000_000
TARGET = 1_000_000_000
HOT_FRAC = 0.8


def _spark():
    spark = get_spark(
        "events-1b",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "96",
            "spark.driver.memory": "12g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _chunk_df(spark, chunk_no: int):
    lo = chunk_no * CHUNK
    return (
        spark.range(lo, lo + CHUNK)
        .withColumn(
            "user_id",
            F.when(F.rand(seed=chunk_no * 2 + 1) < HOT_FRAC, F.lit(1)).otherwise(
                (F.rand(seed=chunk_no * 2 + 2) * 10_000).cast("long") + 2
            ),
        )
        .withColumn(
            "ts",
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + (F.rand(seed=chunk_no * 7 + 3) * 30 * 86400 * 1_000_000).cast(
                    "long"
                )
            ).cast("timestamp_ntz"),
        )
        .select(
            F.col("id").alias("event_id"),
            "user_id",
            "ts",
            (F.rand(seed=chunk_no * 11 + 4) * 100).alias("value"),
        )
    )


def build(n_this_run: int) -> None:
    spark = _spark()
    marker_dir = os.path.dirname(PATH)
    os.makedirs(marker_dir, exist_ok=True)
    done_file = os.path.join(marker_dir, "chunks_done")
    done = int(open(done_file).read()) if os.path.exists(done_file) else 0
    total_chunks = TARGET // CHUNK
    for chunk_no in range(done, min(done + n_this_run, total_chunks)):
        t0 = time.time()
        _chunk_df(spark, chunk_no).repartition(32).write.mode(
            "append"
        ).parquet(PATH)
        with open(done_file, "w") as fh:
            fh.write(str(chunk_no + 1))
        print(
            f"chunk {chunk_no + 1}/{total_chunks} appended "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
    print(f"chunks done: {open(done_file).read()}/{total_chunks}")


def profile() -> None:
    spark = _spark()
    events = spark.read.parquet(PATH)
    t0 = time.time()
    n = events.count()
    print(f"rows: {n:,} (count {time.time() - t0:.1f}s)", flush=True)

    def timed(fn):
        t = time.time()
        fn()
        return round(time.time() - t, 2)

    def skew_profile():
        per_user = events.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        per_user.agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").alias("n_events"),
            F.max("n").alias("mx"),
            F.percentile("n", 0.99).alias("p99"),
            F.expr("(MAX(n)*1000000) DIV SUM(n)").alias("top1_ppm"),
        ).write.format("noop").mode("overwrite").save()

    def salted_bucketed():
        hourly = salted_aggregate(
            events.withColumn("hour", F.date_trunc("hour", F.col("ts"))),
            ["user_id", "hour"],
            {"n_events": F.count(F.lit(1)), "value_sum": F.sum("value")},
            n_salts=32,
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_timestamp("hour"))
            .rangeBetween(-23 * 3600, 0)
        )
        hourly.select(
            "user_id",
            "hour",
            F.sum("n_events").over(w).alias("e24"),
            F.sum("value_sum").over(w).alias("v24"),
        ).write.format("noop").mode("overwrite").save()

    for name, fn in (
        ("key_skew_profile", skew_profile),
        ("salted_bucketed_window", salted_bucketed),
    ):
        r = [timed(fn) for _ in range(2)]
        print(f"| {name} | {r[0]} | {r[1]} | {min(r)} |", flush=True)


def gaps() -> None:
    """Round-7 session-3: the per-key MIN-GAP family at 1B rows with an
    ~800M-row hot user. Compares the skew-safe two-phase bucketed form
    (operators/skew.py::bucketed_min_gap, 60 s buckets → ≤ ~19k rows
    per (key, bucket) task even for the hot key) against the exact
    lag-window form (O(n log n) per key: finishes, unlike the
    quadratic rangeBetween — but the hot key serializes one external
    sort). Both produce IDENTICAL results (equivalence-tested at lake
    scale in tests/test_operators.py::TestBucketedMinGap)."""
    from fintech_lakehouse_spark.operators.skew import bucketed_min_gap

    spark = _spark()
    events = spark.read.parquet(PATH).select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )

    def timed(fn):
        t = time.time()
        fn()
        return round(time.time() - t, 2)

    def bucketed():
        bucketed_min_gap(
            events, "user_id", "us", bucket_us=60_000_000,
            rapid_us=7_200_000_000,
        ).write.format("noop").mode("overwrite").save()

    def exact_lag():
        w = Window.partitionBy("user_id").orderBy("us")
        gapped = events.withColumn("_g", F.col("us") - F.lag("us").over(w))
        gapped.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_g").alias("mn"),
            F.sum(F.when(F.col("_g") <= 7_200_000_000, 1).otherwise(0)).alias(
                "nr"
            ),
        ).write.format("noop").mode("overwrite").save()

    for name, fn in (
        ("bucketed_min_gap_60s", bucketed),
        ("exact_lag_window", exact_lag),
    ):
        r = timed(fn)
        print(f"| {name} | {r} s |", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    if mode == "build":
        build(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif mode == "gaps":
        gaps()
    else:
        profile()
