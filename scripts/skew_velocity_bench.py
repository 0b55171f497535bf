#!/usr/bin/env python
"""Measured skew experiment for the 24h velocity detector (VERDICT r5
item 8, the measurement behind user_hourly_velocity_salted): build an
events table with ONE hot user owning 80% of all rows (the bot /
payment-aggregator shape), then time

  (a) the exact per-event range window (user_velocity_24h's shape) —
      every hot-user row lands in one window partition, so one task
      sorts and scans 80% of the table alone;
  (b) the salted bucketed form (user_hourly_velocity_salted's shape) —
      salted two-phase rollup to hourly buckets, then the range window
      over ≤24·days bucket rows per user.

Outputs differ by design (per-event vs per-hour alerting grain); the
comparison is wall-clock under skew, not result equality (equality vs
SQL is the oracle's job). Usage:

    python scripts/skew_velocity_bench.py [n_rows] [hot_frac]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_lakehouse_spark.operators.skew import salted_aggregate
from fintech_lakehouse_spark.session import get_spark

WORK = "/tmp/skew_velocity"


def build(spark, n_rows: int, hot_frac: float) -> str:
    out = f"{WORK}/events.parquet"
    if os.path.exists(out):
        return out
    df = (
        spark.range(n_rows)
        .withColumn(
            "user_id",
            F.when(F.rand(seed=1) < hot_frac, F.lit(1)).otherwise(
                (F.rand(seed=2) * 10_000).cast("long") + 2
            ),
        )
        .withColumn(
            "ts",
            F.timestamp_micros(
                (F.lit(1_700_000_000_000_000) + (F.rand(seed=3) * 30 * 86400
                 * 1_000_000).cast("long"))
            ).cast("timestamp_ntz"),
        )
        .select(
            F.col("id").alias("event_id"),
            "user_id",
            "ts",
            (F.rand(seed=4) * 100).alias("value"),
        )
    )
    df.repartition(32).write.mode("overwrite").parquet(out)
    return out


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    spark = get_spark(
        "skew-velocity",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = build(spark, n_rows, hot_frac)
    events = spark.read.parquet(path)

    def exact_window():
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_timestamp("ts"))
            .rangeBetween(-86400, 0)
        )
        events.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("events_24h"),
            F.sum("value").over(w).alias("value_24h"),
        ).write.format("noop").mode("overwrite").save()

    def salted_bucketed():
        hourly = salted_aggregate(
            events.withColumn("hour", F.date_trunc("hour", F.col("ts"))),
            ["user_id", "hour"],
            {"n_events": F.count(F.lit(1)), "value_sum": F.sum("value")},
            n_salts=16,
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_timestamp("hour"))
            .rangeBetween(-23 * 3600, 0)
        )
        hourly.select(
            "user_id",
            "hour",
            F.sum("n_events").over(w).alias("events_24h"),
            F.sum("value_sum").over(w).alias("value_24h"),
        ).write.format("noop").mode("overwrite").save()

    # warm both plan shapes once on a 1% slice
    small = events.limit(max(1, n_rows // 100))
    for _ in range(1):
        pass
    print(f"rows={n_rows} hot_user_share={hot_frac}")
    print("| variant | run1 | run2 | run3 | min |")
    print("|---|---|---|---|---|")
    for name, fn in (("exact_per_event_window", exact_window),
                     ("salted_bucketed_window", salted_bucketed)):
        samples = [round(timed(fn), 2) for _ in range(3)]
        print(f"| {name} | " + " | ".join(str(s) for s in samples)
              + f" | {min(samples)} |", flush=True)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
