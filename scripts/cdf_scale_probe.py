#!/usr/bin/env python
"""Partitioned change-feed scale probe (r13, BASELINE §CDF): an
N-row table across P partitions, one CoW DELETE touching EVERY
partition, then ``read_delta_changes`` over the range — timing the
cdc read (one scan + broadcast partitionValues lookup; the plan must
stay constant-size in P) and the synthesized-insert branch.

Usage: python scripts/cdf_scale_probe.py [n_rows] [n_partitions]
Default 10M rows / 64 partitions.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.sources.deltalog import (
    delete_from_delta_table,
    enable_change_data_feed,
    read_delta_changes,
    write_delta_commit,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(
        "cdf-probe",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/cdf_scale_probe"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % parts).alias("p"),
        F.sha1(F.col("id").cast("string")).alias("v"),
    )
    t0 = time.time()
    write_delta_commit(spark, df, root, partition_by=["p"])  # v0
    print(f"seed write ({n} rows / {parts} partitions): "
          f"{time.time()-t0:6.2f} s")
    enable_change_data_feed(spark, root)  # v1
    t0 = time.time()
    delete_from_delta_table(spark, root, "id % 100 = 0")  # v2: all parts
    print(f"CoW DELETE touching all partitions:        "
          f"{time.time()-t0:6.2f} s")
    t0 = time.time()
    ch = read_delta_changes(spark, root, 2)
    plan = ch._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    rows = ch.count()
    print(f"table_changes over the delete:             "
          f"{time.time()-t0:6.2f} s  ({rows} change rows, "
          f"{n_scans} scans in plan)")
    assert n_scans <= 3, n_scans
    t0 = time.time()
    write_delta_commit(  # v3: append to every partition
        spark,
        spark.range(n, n + n // 10).select(
            F.col("id"),
            (F.col("id") % parts).alias("p"),
            F.sha1(F.col("id").cast("string")).alias("v"),
        ),
        root,
        partition_by=["p"],
    )
    ch2 = read_delta_changes(spark, root, 3)
    rows2 = ch2.count()
    print(f"synthesized inserts (append branch):       "
          f"{time.time()-t0:6.2f} s  ({rows2} change rows)")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
