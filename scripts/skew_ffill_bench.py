#!/usr/bin/env python
"""Skew measurement for operators/skew.py::bucketed_fill_forward
(BASELINE §3 protocol, the bucketed_min_gap experiment applied to the
carry-forward window): N rows with an 80%-hot user, a sparse non-null
`touch` column, exact last-non-null window vs the two-phase bucketed
form — walls plus an order-insensitive checksum proving the outputs
identical at full scale.

Usage: python scripts/skew_ffill_bench.py [n_rows] (default 100M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_lakehouse_spark.operators.skew import bucketed_fill_forward
from fintech_lakehouse_spark.session import get_spark

HOT_FRAC = 0.8


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    spark = get_spark(
        "ffill-skew",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "96",
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = f"/tmp/ffill_skew_{n}"
    if not os.path.exists(path):
        (
            spark.range(n)
            .withColumn(
                "user_id",
                F.when(F.rand(seed=1) < HOT_FRAC, F.lit(1)).otherwise(
                    (F.rand(seed=2) * 10_000).cast("long") + 2
                ),
            )
            # unique per-key time axis: the row id itself (monotone)
            .select(
                F.col("id").alias("t_us"),
                "user_id",
                F.when(
                    F.rand(seed=3) < 0.1,
                    F.concat(F.lit("c"), (F.rand(seed=4) * 5).cast("int")),
                ).alias("touch"),
            )
            .repartition(32)
            .write.parquet(path)
        )
    df = spark.read.parquet(path)
    print(f"rows: {df.count():,}", flush=True)

    def checksum(filled):
        # bit_xor: order-insensitive and overflow-free (a SUM of 100M
        # xxhash64 values blows int64 under ANSI)
        return filled.agg(
            F.expr(
                "bit_xor(xxhash64(user_id, t_us, touch_ffill))"
            ).alias("sig"),
            F.count("touch_ffill").alias("n_filled"),
        ).collect()[0]

    t0 = time.time()
    bucketed = bucketed_fill_forward(
        df, "user_id", "t_us", "touch",
        bucket_us=max(n // 1024, 1),
    )
    sig_b = checksum(bucketed)
    wall_b = time.time() - t0
    print(f"bucketed: {wall_b:.1f}s sig={sig_b['sig']} "
          f"filled={sig_b['n_filled']:,}", flush=True)

    t0 = time.time()
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    exact = df.withColumn(
        "touch_ffill", F.last("touch", ignorenulls=True).over(w)
    )
    sig_e = checksum(exact)
    wall_e = time.time() - t0
    print(f"exact:    {wall_e:.1f}s sig={sig_e['sig']} "
          f"filled={sig_e['n_filled']:,}", flush=True)
    print(f"signatures match: {tuple(sig_b) == tuple(sig_e)}")


if __name__ == "__main__":
    main()
