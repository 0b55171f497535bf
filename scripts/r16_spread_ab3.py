#!/usr/bin/env python
"""r16 batch 3 (focused re-run): A/B the conditional scan spread on the relational /
window / dedup / vector bench queries (single-row-group test lake —
every scan is structurally one task; see r16_spread_ab.py).

Patches load_table in every plans module with a per-table key spread;
interleaved min-of-N cold per query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fintech_lakehouse_spark.plans.text import reset_stage_caches  # noqa: E402
from fintech_lakehouse_spark.session import get_spark  # noqa: E402

SPREAD_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "embeddings": "vec_id",
    "customer": "c_custkey",
}

QUERIES_AB = [
    "pricing_summary",
    "regional_revenue",
    "shipping_priority",
    "supplier_performance",
    "dq_lineitem_report",
    "purchase_click_interval_join",
    "knn_bruteforce_cosine",
    "customer_proximity_pairs",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r16-spread-ab2",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import importlib

    import fintech_lakehouse_spark.plans as plans_pkg
    from fintech_lakehouse_spark.plans import QUERIES
    from fintech_lakehouse_spark.sources import readers

    mods = []
    for m in list(sys.modules):
        if m.startswith("fintech_lakehouse_spark.plans.") and hasattr(
            sys.modules[m], "load_table"
        ):
            mods.append(sys.modules[m])
    orig = readers.load_table
    par = spark.sparkContext.defaultParallelism

    def spread_load(spark, sf_dir, name):
        df = orig(spark, sf_dir, name)
        key = SPREAD_KEYS.get(name)
        if key is not None:
            df = df.repartition(par, key)
        return df

    def set_mode(spread: bool):
        fn = spread_load if spread else orig
        for mod in mods:
            mod.load_table = fn

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for spread in (False, True):
        set_mode(spread)
        for q in QUERIES_AB:
            try:
                reset_stage_caches()
                noop(QUERIES[q](spark, "/root/testdata/sf0.001"))
            except Exception as e:
                print(f"warmup {q} [{spread}] failed: {e}", file=sys.stderr)

    def _steal():
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
        return vals[7], sum(vals)

    results: dict[str, dict[bool, float]] = {q: {} for q in QUERIES_AB}
    s0, t0 = _steal()
    for q in QUERIES_AB:
        for spread in (False, True, False, True):
            set_mode(spread)
            best = results[q].get(spread, float("inf"))
            for _ in range(repeats):
                reset_stage_caches()
                spark.sparkContext.setJobDescription(
                    f"{q} [{'spread' if spread else 'plain'}]")
                t = time.time()
                noop(QUERIES[q](spark, sf_dir))
                best = min(best, time.time() - t)
            results[q][spread] = best
    s1, t1 = _steal()
    set_mode(False)
    print(f"steal over A/B window: {(s1 - s0) / max(1, t1 - t0):.4f}")
    print(f"{'query':32s} {'plain':>8s} {'spread':>8s} {'speedup':>8s}")
    for q in QUERIES_AB:
        a, b = results[q][False], results[q][True]
        print(f"{q:32s} {a:8.3f} {b:8.3f} {a / b:8.2f}")


if __name__ == "__main__":
    main()
