#!/usr/bin/env python
"""Row-tracking read/write cost at scale (r14) — the design-for-100×
readings for the rowTracking feature:

1. ``read_delta_table(row_ids=True)`` vs the plain read over an
   N-row / F-file row-tracked table: the id resolution is ONE extra
   broadcast hash join from the file basename (F rows, driver-built)
   plus a per-row coalesce — plan size constant in N, no extra scan.
   The probe records both walls and asserts the plan shape (exactly
   one extra BroadcastHashJoin, same parquet scan count).
2. OPTIMIZE preservation overhead: compaction on a row-tracked table
   reads-with-ids and writes two extra int64 columns (the
   materialized id/version) — the probe records compaction wall with
   row tracking on vs off at the same N.

At 100 TB the same shapes hold: the broadcast side is one row per
live FILE (bounded by the table's file count, the same object the
driver already enumerates for any scan), and materialization adds two
fixed-width columns to rewritten files only.

Usage: python scripts/rowid_scale_probe.py [n_rows=5_000_000] [files=16]
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
from fintech_lakehouse_spark.sources.deltalog import (
    enable_row_tracking,
    optimize_delta_table,
    read_delta_table,
    write_delta_commit,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def build(spark, root: str, tracked: bool) -> None:
    df = spark.range(N).select(
        F.col("id"),
        (F.col("id") % 9973).alias("k"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    ).repartition(FILES)
    write_delta_commit(spark, df, root)
    if tracked:
        enable_row_tracking(spark, root)


def main() -> None:
    spark = get_spark(
        "rowid-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="rowid_probe_")
    try:
        rt_root = os.path.join(base, "tracked")
        plain_root = os.path.join(base, "plain")
        build(spark, rt_root, tracked=True)
        build(spark, plain_root, tracked=False)

        def timed(fn):
            best = None
            for _ in range(3):
                t0 = time.monotonic()
                fn()
                w = time.monotonic() - t0
                best = w if best is None else min(best, w)
            return round(best, 2)

        plain = timed(
            lambda: read_delta_table(spark, rt_root)
            .agg(F.count("*"), F.sum("k"))
            .collect()
        )
        with_ids = timed(
            lambda: read_delta_table(spark, rt_root, row_ids=True)
            .agg(F.count("*"), F.sum("_row_id"), F.sum("k"))
            .collect()
        )
        # plan-shape assertion: exactly one extra broadcast join, the
        # SAME number of parquet scans (no second pass over the data)
        p0 = (
            read_delta_table(spark, rt_root)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        p1 = (
            read_delta_table(spark, rt_root, row_ids=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        scans0, scans1 = p0.count("Scan parquet"), p1.count("Scan parquet")
        bj0, bj1 = (
            p0.count("BroadcastHashJoin"),
            p1.count("BroadcastHashJoin"),
        )
        assert scans1 == scans0, (scans0, scans1)
        assert bj1 == bj0 + 1, (bj0, bj1)

        # expected total: sum of 0..N-1 (dense backfill ids)
        got = (
            read_delta_table(spark, rt_root, row_ids=True)
            .agg(F.sum("_row_id"))
            .collect()[0][0]
        )
        assert got == N * (N - 1) // 2, got

        opt_rt = timed(
            lambda: optimize_delta_table(spark, rt_root, target_files=8)
        )
        opt_plain = timed(
            lambda: optimize_delta_table(
                spark, plain_root, target_files=8
            )
        )
        print(
            {
                "n_rows": N,
                "files": FILES,
                "read_plain_s": plain,
                "read_row_ids_s": with_ids,
                "read_overhead_x": round(with_ids / plain, 2),
                "optimize_tracked_s": opt_rt,
                "optimize_plain_s": opt_plain,
                "optimize_overhead_x": round(opt_rt / opt_plain, 2),
                "extra_scans": scans1 - scans0,
                "extra_broadcast_joins": bj1 - bj0,
            }
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
