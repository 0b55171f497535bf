#!/usr/bin/env python
"""FIFO lot matching at scale with a HOT part (r11). Two skew hazards
live in the registry query's shape when one part holds 30% of all
lots:

1. the cumulative-quantity WINDOW serializes the hot part into one
   sort task (the fact-49 class) — fixed by the TWO-PHASE bucketed
   cumsum (window inside (part, time-bucket), then a bucket-grain
   offset, the bucketed_fill_forward construction);
2. the per-part equi-JOIN evaluates |buys_p| × |sells_p| candidate
   pairs before the range filter — quadratic in the hot part's lots
   (~2e12 at 10M rows) even though FIFO intervals are DISJOINT per
   side, so the true pair count is LINEAR. Fixed by the BINNED
   interval join: quantity-axis buckets of width W, each lot exploded
   to the buckets its [lo, hi) span touches, join on (part, qbucket),
   each pair emitted exactly once at the bucket of its overlap start
   (the canonical-bucket trick — customer_proximity_pairs' grid join
   on the quantity axis).

The probe pins binned ≡ naive on a 1M-row run (xxhash64 bit_xor
signature), then runs the scalable form at full size where the naive
join cannot finish.

Usage: python scripts/fifo_scale_probe.py [n_rows] [hot_share_pct]
Default 10_000_000 rows, 30% on one hot part.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_lakehouse_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
HOT_PCT = int(sys.argv[2]) if len(sys.argv) > 2 else 30
N_PARTS = 10_000
HOT_KEY = -1
TIME_BUCKETS = 512  # phase-1 buckets for the two-phase cumsum
QTY_W = 64          # quantity-axis bin width (qty ∈ [1, 50], avg 25)


def lots_source(spark, n):
    base = spark.range(n).withColumn(
        "part",
        F.when(F.pmod("id", F.lit(100)) < HOT_PCT, F.lit(HOT_KEY)).otherwise(
            F.pmod(F.xxhash64("id"), F.lit(N_PARTS))
        ),
    )
    return base.select(
        F.col("id").alias("seq"),
        "part",
        (F.lit(1) + F.pmod("id", F.lit(50))).alias("qty"),
        F.when(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(100)) < 30, "R")
        .otherwise("N")
        .alias("flag"),
    )


def plain_lots(df, n):
    w = Window.partitionBy("part").orderBy("seq")
    return df.withColumn("hi", F.sum("qty").over(w)).withColumn(
        "lo", F.col("hi") - F.col("qty")
    )


def bucketed_lots(df, n):
    df = df.withColumn("bkt", (F.col("seq") * TIME_BUCKETS / n).cast("long"))
    w_in = Window.partitionBy("part", "bkt").orderBy("seq")
    inb = df.withColumn("cs", F.sum("qty").over(w_in))
    totals = inb.groupBy("part", "bkt").agg(F.max("cs").alias("tot"))
    w_b = (
        Window.partitionBy("part")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.withColumn(
        "off", F.coalesce(F.sum("tot").over(w_b), F.lit(0))
    ).select("part", "bkt", "off")
    return (
        inb.join(offs, ["part", "bkt"])
        .withColumn("hi", F.col("off") + F.col("cs"))
        .withColumn("lo", F.col("hi") - F.col("qty"))
        .drop("bkt", "cs", "off")
    )


def naive_match(b, s):
    b, s = b.alias("b"), s.alias("s")
    return (
        b.join(
            s,
            (F.col("b.part") == F.col("s.part"))
            & (F.col("b.lo") < F.col("s.hi"))
            & (F.col("s.lo") < F.col("b.hi")),
        )
        .select(
            F.col("b.part").alias("part"),
            (
                F.least(F.col("b.hi"), F.col("s.hi"))
                - F.greatest(F.col("b.lo"), F.col("s.lo"))
            ).alias("m"),
        )
    )


def binned_match(b, s):
    def binned(df):
        return df.withColumn(
            "qb",
            F.explode(
                F.sequence(
                    (F.col("lo") / QTY_W).cast("long"),
                    ((F.col("hi") - 1) / QTY_W).cast("long"),
                )
            ),
        )

    b, s = binned(b).alias("b"), binned(s).alias("s")
    start = F.greatest(F.col("b.lo"), F.col("s.lo"))
    return (
        b.join(
            s,
            (F.col("b.part") == F.col("s.part"))
            & (F.col("b.qb") == F.col("s.qb"))
            & (F.col("b.lo") < F.col("s.hi"))
            & (F.col("s.lo") < F.col("b.hi")),
        )
        # canonical bucket: emit the pair ONLY where its overlap starts
        .filter((start / QTY_W).cast("long") == F.col("b.qb"))
        .select(
            F.col("b.part").alias("part"),
            (
                F.least(F.col("b.hi"), F.col("s.hi")) - start
            ).alias("m"),
        )
    )


def run(spark, label, lots_fn, match_fn, src, n):
    t0 = time.time()
    b = lots_fn(src.filter(F.col("flag") != "R"), n)
    s = lots_fn(src.filter(F.col("flag") == "R"), n)
    pairs = match_fn(b, s)
    per_part = pairs.groupBy("part").agg(
        F.sum("m").alias("matched"), F.count(F.lit(1)).alias("n_pairs")
    )
    row = per_part.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("matched").cast("long").alias("total_matched"),
        F.bit_xor(F.xxhash64("part", "matched", "n_pairs")).alias("sig"),
    ).collect()[0]
    wall = time.time() - t0
    print(
        f"| {label} | {wall:.1f} s | {row['n']} parts | "
        f"{row['total_matched']} matched | sig {row['sig']} |",
        flush=True,
    )
    return row["sig"], row["total_matched"]


def main():
    spark = get_spark(
        "fifo-scale-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": "64"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin_n = min(N, 1_000_000)
    pin = lots_source(spark, pin_n).persist()
    pin.count()
    print(f"equality pin at {pin_n} rows (hot {HOT_PCT}%):")
    print("| form | wall | parts | matched | signature |")
    print("|---|---|---|---|---|")
    a = run(spark, "naive join + single window", plain_lots, naive_match,
            pin, pin_n)
    c = run(spark, "binned join + two-phase cumsum", bucketed_lots,
            binned_match, pin, pin_n)
    assert a == c, f"forms disagree: {a} vs {c}"
    print("signatures EQUAL — binned/two-phase is exact")
    pin.unpersist()
    if N > pin_n:
        src = lots_source(spark, N).persist()
        src.count()
        print(f"\nscale run at {N} rows (naive join infeasible here):")
        print("| form | wall | parts | matched | signature |")
        print("|---|---|---|---|---|")
        run(spark, "binned join + two-phase cumsum", bucketed_lots,
            binned_match, src, N)


if __name__ == "__main__":
    main()
