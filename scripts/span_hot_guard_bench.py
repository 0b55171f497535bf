#!/usr/bin/env python
"""Pathological-duplication experiment for duplicate_span_runs
(BASELINE.md §3): multiply the sf0.01 documents table k× with EXACT
copies (same text, fresh doc_ids). Unlike scale_corpus_bench's
token-suffixed copies, exact copies make every positional gram shared
by all k replicas, so the pair join's output grows ~k² per base doc —
the worst-case input for any pair-emitting dedup operator.

What the numbers must show:
* below the hot-gram threshold (k <= 100 docs per gram) the cost is
  the TRUE quadratic pair output — span detection is REPORTING k²/2
  genuinely duplicated pairs, so the blowup is the answer's size, not
  plan waste;
* past the threshold (k > SPAN_HOT_DOCS) the hot-gram drop removes
  boilerplate-level grams before the join, so wall time COLLAPSES
  instead of exploding — the guard that keeps the operator alive when
  a 100 TB crawl contains a million copies of the same cookie banner.
  (The dropped pairs are not lost to the pipeline: exact/MinHash dedup
  runs BEFORE span detection in the curation order — plans/selection.py
  module docstring — and catches whole-document copies trivially.)

Usage: python scripts/span_hot_guard_bench.py [k ...]   (default 8 32 128)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans import QUERIES
from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.sources.readers import load_table

BASE_SF = "/root/testdata/sf0.01"
WORK = "/tmp/span_hot_guard"


def build(spark, k: int) -> str:
    out = f"{WORK}/x{k}"
    if not os.path.exists(f"{out}/documents.parquet"):
        base = load_table(spark, BASE_SF, "documents")
        df = base
        for i in range(1, k):
            df = df.unionByName(
                base.withColumn("doc_id", F.col("doc_id") + i * 10_000_000)
            )
        df.repartition(32).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [8, 32, 128]
    spark = get_spark(
        "span-hot-guard",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            # the k<=100 regime REPORTS ~k²/2 pairs per base doc — real
            # output, so give the local-mode driver a real heap
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # codegen warmup
    QUERIES["duplicate_span_runs"](spark, BASE_SF).write.format("noop").mode(
        "overwrite"
    ).save()
    print("| copies k | docs | wall | pairs out |")
    print("|---|---|---|---|")
    for k in ks:
        sf = build(spark, k)
        t0 = time.monotonic()
        df = QUERIES["duplicate_span_runs"](spark, sf)
        n = df.count()
        wall = time.monotonic() - t0
        print(f"| {k}x exact | {500 * k} | {wall:.2f} s | {n} |", flush=True)


if __name__ == "__main__":
    main()
