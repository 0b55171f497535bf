#!/usr/bin/env python
"""Round-6 pin of the supplier_performance r5 anomaly (VERDICT r5 item 2).

Protocol: identical to bench.py — warm the plan shape once at sf0.001,
then N cold runs (stage caches reset per run) at sf0.1, reporting every
sample so run-to-run variance is visible, not hidden behind min().
Run a second query (pricing_summary) interleaved as a control: if both
swing together the cause is environment contention, not the plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fintech_lakehouse_spark.plans import QUERIES
from fintech_lakehouse_spark.plans.text import reset_stage_caches
from fintech_lakehouse_spark.session import get_spark


def run_query(spark, name: str, sf_dir: str) -> float:
    reset_stage_caches()
    start = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - start


def main() -> None:
    n = int(os.environ.get("PIN_RUNS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "pin-supplier-perf",
        master="local[32]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in ("supplier_performance", "pricing_summary"):
        run_query(spark, name, "/root/testdata/sf0.001")  # codegen warmup
    samples: dict[str, list[float]] = {"supplier_performance": [], "pricing_summary": []}
    for _ in range(n):
        for name in samples:
            samples[name].append(round(run_query(spark, name, sf_dir), 3))
    out = {
        name: {"samples": vals, "min": min(vals), "max": max(vals)}
        for name, vals in samples.items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
