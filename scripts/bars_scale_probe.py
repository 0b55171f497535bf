#!/usr/bin/env python
"""TWAP + OHLC at 100M events (r11) — the scale readings for the new
time-series family. Both shapes window on fine-grained keys:
TWAP on (user, day) (cardinality ≈ users × days — never hot), OHLC on
(event_type, hour) (few types, but rows-per-bar is bounded by the bar
grain: 100M rows / (types × hours) stays a manageable in-bar sort).
One window shuffle + same-key aggregate each; this probe records the
wall at 500× the bench SF and the per-bar row bound that keeps the
OHLC window safe.

Usage: python scripts/bars_scale_probe.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_lakehouse_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
USERS = 100_000
TYPES = 5
DAYS = 30


def source(spark):
    us_per_span = DAYS * 86_400 * 1_000_000
    return spark.range(N).select(
        F.col("id").alias("event_id"),
        (
            F.timestamp_micros(
                F.lit(820454400 * 1_000_000)
                + (F.col("id") * F.lit(us_per_span // N))
            )
        ).cast("timestamp_ntz").alias("ts"),
        F.pmod(F.xxhash64("id"), F.lit(USERS)).alias("user_id"),
        F.concat(
            F.lit("t"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(TYPES))
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10_000)) / 100.0).alias(
            "value"
        ),
    )


def twap(events):
    day = F.to_date("ts").alias("day")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    seq = events.select(
        "user_id", day, "value", "ts",
        F.lead("ts").over(w).alias("ts_next"),
    ).filter(F.col("ts_next").isNotNull())
    gap = F.expr("timestampdiff(MICROSECOND, ts, ts_next)")
    span = F.expr("timestampdiff(MICROSECOND, min(ts), max(ts_next))")
    return (
        seq.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(F.sum(F.col("value") * gap) / span, 4).alias("twav"),
        )
    )


def ohlc(events):
    bar = F.date_trunc("hour", F.col("ts"))
    w_a = Window.partitionBy("event_type", bar).orderBy("ts", "event_id")
    w_d = Window.partitionBy("event_type", bar).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    seq = events.select(
        "event_type", bar.alias("bar_ts"), "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return seq.groupBy("event_type", "bar_ts").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    )


def main():
    spark = get_spark(
        "bars-scale-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": "64"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    src = source(spark)
    print(f"rows={N} users={USERS} types={TYPES} days={DAYS}")
    for label, fn in (("twap(user,day)", twap), ("ohlc(type,hour)", ohlc)):
        t0 = time.time()
        row = fn(src).agg(
            F.count(F.lit(1)).alias("groups"),
            F.sum("n_events" if label.startswith("ohlc") else "n_intervals")
            .alias("rows_in"),
        ).collect()[0]
        print(
            f"| {label} | {time.time()-t0:.1f} s | {row['groups']} groups |"
            f" {row['rows_in']} rows |",
            flush=True,
        )


if __name__ == "__main__":
    main()
