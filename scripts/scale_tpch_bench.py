#!/usr/bin/env python
"""TPC-H scale-up experiment for the round-5 relational shapes
(VERDICT r5 item 6): multiply the sf0.1 FACT tables k× — lineitem and
orders, with order keys remapped per copy so copies are distinct
orders — while the dimension tables (supplier, part, nation, customer,
region) stay FIXED. That is the realistic 100 TB growth shape: facts
grow, dims don't, so per-dim-key group sizes grow k× and any plan
whose cost is super-linear in fact size (or whose shuffle skews on a
dim key) shows a super-linear wall-clock curve here.

Usage: python scripts/scale_tpch_bench.py [--queries a,b] [k ...]
(default queries sole_late_supplier_orders, nation_profit_by_year,
cheapest_supplier_per_part; default k 1 4 16; any registry query over
the TPC-H tables works)
Writes multiplied tables under /tmp/scale_tpch/, prints one markdown
table row per (query, k).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans import QUERIES
from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.sources.readers import load_table

BASE_SF = "/root/testdata/sf0.1"
WORK = "/tmp/scale_tpch"
QUERY_NAMES = [
    "sole_late_supplier_orders",
    "nation_profit_by_year",
    "cheapest_supplier_per_part",
]
FACTS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
DIMS = ("supplier", "part", "nation", "customer", "region")
KEY_OFFSET = 100_000_000  # far above any sf0.1 orderkey


def build(spark, k: int) -> str:
    out = f"{WORK}/x{k}"
    if os.path.exists(f"{out}/lineitem.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    for dim in DIMS:
        dst = f"{out}/{dim}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE_SF}/{dim}.parquet", dst)
    for fact, key in FACTS.items():
        base = load_table(spark, BASE_SF, fact)
        copies = [
            base.withColumn(key, F.col(key) + F.lit(i * KEY_OFFSET)).select(
                *base.columns
            )
            for i in range(k)
        ]
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{fact}.parquet"
        )
    return out


def main() -> None:
    args = sys.argv[1:]
    names = QUERY_NAMES
    if args and args[0] == "--queries":
        names = args[1].split(",")
        args = args[2:]
    ks = [int(a) for a in args] or [1, 4, 16]
    spark = get_spark(
        "scale-tpch",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            # keep stdout parseable: the \r progress bar interleaves with
            # the markdown rows when output is captured to a file
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        # codegen warmup at the smallest sf
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    print("| query | k | lineitem rows | wall | rows |")
    print("|---|---|---|---|---|")
    for k in ks:
        sf_dir = build(spark, k)
        n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
        for name in names:
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            wall = time.time() - t0
            print(f"| {name} | {k}x | {n_li} | {wall:.2f} s | {n} |", flush=True)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
