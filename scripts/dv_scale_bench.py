#!/usr/bin/env python
"""Deletion-vector scale probe (BASELINE §DV; VERDICT r9 item 1):
one N-row Delta table, a DV deleting every 10th row, measured through
BOTH read strategies —

* ``broadcast``: driver-side decode into a broadcast anti-join (the
  small-DV default, below ``FLS_DV_BROADCAST_MAX_ROWS``),
* ``distributed``: executor-side decode (``mapInPandas`` over the
  descriptor list) + shuffle anti-join — the 100 TB escape path; the
  decoded index set never lands on the driver,

plus the DV WRITE itself (``delete_from_delta_table(...,
use_deletion_vectors=True)``), timed end-to-end.

Usage: python scripts/dv_scale_bench.py [n_rows] [n_files]
Default 10M rows / 4 files (≥10M deleted rows: pass 100000000).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.sources import deltalog
from fintech_lakehouse_spark.sources.deltalog import (
    delete_from_delta_table,
    delta_snapshot,
    read_delta_table,
    write_delta_commit,
)

WORK = "/tmp/dv_scale_bench"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    spark = get_spark(
        "dv-scale",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(n).selectExpr(
        "id", "CAST(id % 97 AS STRING) AS v"
    ).repartition(n_files)
    write_delta_commit(spark, df, WORK)

    t0 = time.monotonic()
    n_clean = read_delta_table(spark, WORK).count()
    t_clean = time.monotonic() - t0
    assert n_clean == n

    # the DV WRITE: delete every 10th row without rewriting any file
    t0 = time.monotonic()
    delete_from_delta_table(spark, WORK, "id % 10 = 0",
                            use_deletion_vectors=True)
    t_write = time.monotonic() - t0
    snap = delta_snapshot(spark, WORK)
    n_del = sum(int(d["cardinality"]) for d in snap.deletion_vectors.values())
    dv_mb = sum(
        int(d["sizeInBytes"]) for d in snap.deletion_vectors.values()
    ) / 1e6
    assert n_del == n // 10

    results = {}
    saved = deltalog.DV_BROADCAST_MAX_ROWS
    for mode, threshold in (("broadcast", 1 << 62), ("distributed", 0)):
        deltalog.DV_BROADCAST_MAX_ROWS = threshold
        try:
            t0 = time.monotonic()
            dv_df = read_delta_table(spark, WORK)
            t_plan = time.monotonic() - t0
            t0 = time.monotonic()
            n_dv = dv_df.count()
            t_cnt = time.monotonic() - t0
        finally:
            deltalog.DV_BROADCAST_MAX_ROWS = saved
        assert n_dv == n - n_del, (mode, n_dv)
        results[mode] = (t_plan, t_cnt)

    print(
        f"| {n} | {n_files} | {t_clean:.2f} s | {n_del} | {dv_mb:.2f} MB | "
        f"write {t_write:.2f} s | "
        f"bcast plan {results['broadcast'][0]:.2f} s cnt "
        f"{results['broadcast'][1]:.2f} s | "
        f"dist plan {results['distributed'][0]:.2f} s cnt "
        f"{results['distributed'][1]:.2f} s |"
    )
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
