#!/usr/bin/env python
"""Misra-Gries at one billion rows — the r7 sketch-family scale run
(the r6 1B-skewed-events precedent applied to the counter sketch):
generate 1e9 Zipf-law items entirely in JVM expressions (no I/O), run
the mergeable MG summary + the exact top-10, and check the two
guarantees the registry query pins — every true heavy hitter present,
every counter within N/m of exact — at a scale where any
stream-proportional state would be fatal. State ceiling: partitions × m
counters (32 × 256 = 8,192 longs) regardless of the billion rows.

Usage: python scripts/mg_billion_bench.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fintech_lakehouse_spark.functions.sketches import (
    misra_gries_merged,
    misra_gries_summaries,
)
from fintech_lakehouse_spark.session import get_spark


def main_wide(n: int) -> None:
    """distinct >> memory config: ~1e8-item Zipf (pow-6 over a 1e8-
    resolution uniform) — tens of millions of realized distinct items,
    where a full exact rollup is the expensive path and the sketch's
    bounded state is the point. Guarantees are checked against exact
    counts computed ONLY for the analytic head (items < 1000, a
    pushed filter before the aggregate): under the pow-6 law every
    item with f > N/m lies far inside that head."""
    m = 256
    spark = get_spark(
        "mg-1b-wide",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    stream = spark.range(n).selectExpr(
        "CAST(floor(pow(pmod(hash(id), 100000000) / 100000000.0 + "
        "CAST(pmod(hash(id), 100000000) < 0 AS INT), 6.0) * 100000000)"
        " AS LONG) AS item"
    )
    t0 = time.time()
    merged = {
        r["item"]: r["counter"]
        for r in misra_gries_merged(stream, "item", m=m).collect()
    }
    t_sketch = time.time() - t0
    t0 = time.time()
    head_exact = {
        r["item"]: r["n"]
        for r in stream.filter("item < 1000")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    t_head = time.time() - t0
    t0 = time.time()
    n_distinct = stream.agg(
        F.approx_count_distinct("item").alias("d")
    ).collect()[0]["d"]
    t_distinct = time.time() - t0
    bound = n / m
    guaranteed = [i for i, f in head_exact.items() if f > bound]
    missing = [i for i in guaranteed if i not in merged]
    errs = [head_exact[i] - merged[i] for i in head_exact if i in merged]
    print(f"rows={n} ~distinct={n_distinct} m={m} bound=N/m={bound:.0f}")
    print(f"merged sketch: {len(merged)} counters, {t_sketch:.1f}s "
          f"(head-exact {t_head:.1f}s, approx-distinct {t_distinct:.1f}s)")
    print(f"guaranteed heavy hitters (analytic head): {len(guaranteed)}, "
          f"missing: {len(missing)}; max head err {max(errs):.0f}")
    assert not missing and max(errs) <= bound
    print("GUARANTEES HOLD (wide)")


def main() -> None:
    if "--wide" in sys.argv:
        main_wide(int(sys.argv[-1]) if sys.argv[-1].isdigit() else 1_000_000_000)
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000_000
    m = 256
    spark = get_spark(
        "mg-1b",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    stream = spark.range(n).selectExpr(
        "CAST(floor(pow(pmod(hash(id), 1000000) / 1000000.0 + "
        "CAST(pmod(hash(id), 1000000) < 0 AS INT), 3.0) * 1000) AS LONG)"
        " AS item"
    )
    t0 = time.time()
    summaries = misra_gries_summaries(stream, "item", m=m)
    n_summary_rows = summaries.count()
    t_partial = time.time() - t0
    t0 = time.time()
    merged = {
        r["item"]: r["counter"]
        for r in misra_gries_merged(stream, "item", m=m).collect()
    }
    t_sketch = time.time() - t0
    t0 = time.time()
    exact = {
        r["item"]: r["n"]
        for r in stream.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    t_exact = time.time() - t0
    n_total = sum(exact.values())
    bound = n_total / m
    guaranteed = [i for i, f in exact.items() if f > bound]
    missing = [i for i in guaranteed if i not in merged]
    max_err = max(exact[i] - c for i, c in merged.items())
    over = sum(1 for i, c in merged.items() if c > exact[i])
    print(f"rows={n_total} distinct={len(exact)} m={m} bound=N/m={bound:.0f}")
    print(f"partial summaries: {n_summary_rows} rows, {t_partial:.1f}s")
    print(f"merged sketch: {len(merged)} counters, {t_sketch:.1f}s "
          f"(exact groupBy twin: {t_exact:.1f}s)")
    print(f"guaranteed heavy hitters: {len(guaranteed)}, missing: {len(missing)}")
    print(f"max (exact - counter) = {max_err:.0f} (bound {bound:.0f}); "
          f"overcounts: {over}")
    assert not missing and max_err <= bound and over == 0
    print("GUARANTEES HOLD")


if __name__ == "__main__":
    main()
