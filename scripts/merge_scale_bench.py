#!/usr/bin/env python
"""MERGE INTO scale probe (r10): copy-on-write vs deletion-vector
merge on the offline Delta bridge — N base rows across several files,
a source of U updates + I inserts hitting every file, result sets
asserted identical. The design question it answers: at what update
density does DV merge's no-rewrite property beat CoW's touched-file
rewrite (CoW rewrites every touched file in full; DV writes only
bitmaps + the source rows).

Usage: python scripts/merge_scale_bench.py [n_rows] [n_files] [n_upd]
Default 10M rows / 8 files / 100k updates + 100k inserts.
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
    delta_snapshot,
    merge_into_delta_table,
    read_delta_table,
    write_delta_commit,
)

WORK = "/tmp/merge_scale_bench"


def build(spark, root: str, n: int, files: int) -> None:
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    df = spark.range(n).selectExpr(
        "id", "CAST(id % 97 AS STRING) AS v"
    ).repartition(files)
    write_delta_commit(spark, df, root)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_upd = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    shutil.rmtree(WORK, ignore_errors=True)
    spark = get_spark(
        "merge-scale",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # updates spread across the FULL id range (touch every file) +
    # brand-new keys
    source = (
        spark.range(n_upd)
        .selectExpr(
            f"id * CAST({n} / {n_upd} AS LONG) AS id",
            "'UPDATED' AS v",
        )
        .unionByName(
            spark.range(n, n + n_upd).selectExpr("id", "'NEW' AS v")
        )
    )
    results = {}
    for mode, use_dv in (("cow", False), ("dv", True)):
        root = os.path.join(WORK, mode)
        build(spark, root, n, files)
        read_delta_table(spark, root).count()  # warm the scan
        t0 = time.monotonic()
        merge_into_delta_table(
            spark, root, source, ["id"], use_deletion_vectors=use_dv
        )
        wall = time.monotonic() - t0
        snap = delta_snapshot(spark, root)
        t0 = time.monotonic()
        cnt = read_delta_table(spark, root).count()
        t_read = time.monotonic() - t0
        upd = (
            read_delta_table(spark, root)
            .filter(F.col("v") == "UPDATED")
            .count()
        )
        results[mode] = (wall, t_read, cnt, upd, len(snap.files),
                         len(snap.deletion_vectors))
    assert results["cow"][2] == results["dv"][2] == n + n_upd
    assert results["cow"][3] == results["dv"][3] == n_upd
    print("| mode | merge wall | post-read | rows | updated | live files | DV files |")
    print("|---|---|---|---|---|---|---|")
    for mode, (wall, t_read, cnt, upd, nf, ndv) in results.items():
        print(
            f"| {mode} | {wall:.2f} s | {t_read:.2f} s | {cnt} | {upd} | "
            f"{nf} | {ndv} |"
        )
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
