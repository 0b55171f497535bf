#!/usr/bin/env python
"""100M-row events experiment (round-6 session 5): the windows/skew
family's 100 TB evidence, complementing the 100M-row medallion run.

Builds a skewed events table (default 100M rows, one hot user owning
80% — the bot/payment-aggregator shape from skew_velocity_bench, which
already established that the EXACT per-event range window is
unfinishable at 2M rows under this skew: ROUND_NOTES fact 19), then
times the two operators that claim skew-proof shapes:

* the salted two-phase bucketed velocity window
  (user_hourly_velocity_salted's operator core), and
* the key-skew profiler (event_key_skew_profile's two-level agg, which
  must itself absorb the hot key in its map-side combine).

Usage: python scripts/scale_events_bench.py [n_rows] [hot_frac]
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
from skew_velocity_bench import build  # same generator, bigger n


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    spark = get_spark(
        "scale-events",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    path = build(spark, n_rows, hot_frac)
    print(f"build/reuse: {time.time()-t0:.1f}s", flush=True)
    events = spark.read.parquet(path)

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

    def skew_profile():
        per_user = events.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        per_user.agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").alias("n_events"),
            F.max("n").alias("max_user_events"),
            F.percentile("n", 0.99).alias("p99"),
            F.expr("(MAX(n) * 1000000) DIV SUM(n)").alias("top1_share_ppm"),
        ).write.format("noop").mode("overwrite").save()

    print(f"rows={n_rows} hot_user_share={hot_frac}")
    print("| operator | run1 | run2 | min |")
    print("|---|---|---|---|")
    for name, fn in (
        ("salted_bucketed_window", salted_bucketed),
        ("key_skew_profile", skew_profile),
    ):
        samples = [round(timed(fn), 2) for _ in range(2)]
        print(
            f"| {name} | " + " | ".join(str(s) for s in samples)
            + f" | {min(samples)} |",
            flush=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
