#!/usr/bin/env python
"""Type-widening read cost at scale (r14): a widened table's OLD data
files keep their narrow parquet types and every scan up-casts them
in the vectorized reader — this probe measures that up-cast against
a natively-wide table of identical content, and against the
pre-widening narrow read, at N rows.

The claim under test: widening is metaData-only at WRITE time (zero
bytes rewritten — the DDL is one JSON commit) and ~free at READ time
(the converter runs inside the columnar batch decode, no extra plan
nodes). At 100 TB that trade is the whole point of the feature: the
alternative is rewriting every historical file.

Usage: python scripts/widen_read_probe.py [n_rows=10_000_000]
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
    read_delta_table,
    widen_delta_column,
    write_delta_commit,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000


def main() -> None:
    spark = get_spark(
        "widen-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="widen_probe_")
    try:
        narrow = os.path.join(base, "narrow")
        wide = os.path.join(base, "wide")
        src = spark.range(N).select(
            (F.col("id") % 1_000_000).cast("int").alias("k"),
            (F.col("id") % 997).cast("float").alias("x"),
        ).repartition(16)
        write_delta_commit(spark, src, narrow)
        write_delta_commit(
            spark,
            src.select(
                F.col("k").cast("long").alias("k"),
                F.col("x").cast("double").alias("x"),
            ),
            wide,
        )

        def timed(fn):
            best = None
            for _ in range(3):
                t0 = time.monotonic()
                fn()
                w = time.monotonic() - t0
                best = w if best is None else min(best, w)
            return round(best, 2)

        agg = lambda root: (  # noqa: E731
            read_delta_table(spark, root)
            .agg(F.sum("k"), F.sum("x"), F.count("*"))
            .collect()
        )
        pre = timed(lambda: agg(narrow))
        t0 = time.monotonic()
        widen_delta_column(spark, narrow, "k", "long")
        widen_delta_column(spark, narrow, "x", "double")
        ddl_s = round(time.monotonic() - t0, 2)
        upcast = timed(lambda: agg(narrow))
        native = timed(lambda: agg(wide))
        # the widened read returns the SAME answer as the native-wide
        # table of identical content
        assert agg(narrow)[0] == agg(wide)[0]
        print(
            {
                "n_rows": N,
                "widen_ddl_s": ddl_s,  # metaData-only: no data rewrite
                "read_narrow_pre_s": pre,
                "read_upcast_s": upcast,
                "read_native_wide_s": native,
                "upcast_vs_native_x": round(upcast / native, 2),
            }
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
