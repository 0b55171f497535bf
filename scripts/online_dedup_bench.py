#!/usr/bin/env python
"""Throughput-vs-batch-size curve for the streaming doc-pipeline
sinks (VERDICT r9 item 3): drive the online-dedup and incremental-BM25
foreachBatch sinks over the SAME total corpus at several batch sizes
and record docs/s per operating point. The r9 finding under test:
at tiny (~1.25k-doc) micro-batches the cost floor is per-batch stage
scheduling (~6 shuffle stages × ~0.2 s local floor) + the md5-minhash
map work, so throughput scales with batch size — sub-1k-doc batches
are the wrong operating point for these sinks, not a design defect.

Also prints the per-batch wall within each operating point so the
original sub-linearity claim (cost grows with the PROBE, not with
total history) stays visible as the store grows.

Usage: python scripts/online_dedup_bench.py [total_docs] [sizes,csv]
Default: 40000 docs at batch sizes 1250,5000,20000.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.streaming import (
    foreach_batch_bm25_index,
    foreach_batch_online_dedup,
)

WORK = "/tmp/online_dedup_bench"


from scale_corpus_bench import synth_text_expr  # noqa: E402  (shared generator)


def synth_batch(spark, lo: int, n: int):
    """scale_corpus_bench's shared generator, offset so doc_ids stay
    monotone across batches (the sink's arrival-order contract)."""
    return spark.range(lo, lo + n).selectExpr(
        "id AS doc_id",
        f"{synth_text_expr(lo=lo)} AS text",
    )


def drive(spark, label: str, make_sink, total: int, per_batch: int) -> str:
    root = os.path.join(WORK, f"{label}_{per_batch}")
    shutil.rmtree(root, ignore_errors=True)
    sink = make_sink(root)
    walls = []
    for i in range(total // per_batch):
        df = synth_batch(spark, i * per_batch, per_batch)
        t0 = time.time()
        sink(df, i)
        walls.append(time.time() - t0)
    total_s = sum(walls)
    shutil.rmtree(root, ignore_errors=True)
    return (
        f"| {label} | {per_batch} | {len(walls)} | {total_s:.1f} s | "
        f"{total / total_s:,.0f} | first {walls[0]:.2f} s / "
        f"last {walls[-1]:.2f} s |"
    )


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    sizes = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1250, 5000, 20000]
    )
    shutil.rmtree(WORK, ignore_errors=True)
    spark = get_spark(
        "online-dedup-bench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def mk_dedup(root):
        return foreach_batch_online_dedup(
            os.path.join(root, "state"), os.path.join(root, "decisions")
        )

    def mk_bm25(root):
        return foreach_batch_bm25_index(os.path.join(root, "index"))

    # warmup: one throwaway batch per sink pays codegen/first-scan cost
    for mk in (mk_dedup, mk_bm25):
        s = mk(os.path.join(WORK, "_warm"))
        s(synth_batch(spark, 0, 500), 0)
        shutil.rmtree(os.path.join(WORK, "_warm"), ignore_errors=True)

    print("| sink | batch size | batches | total | docs/s | batch walls |")
    print("|---|---|---|---|---|---|")
    for per_batch in sizes:
        print(drive(spark, "online_dedup", mk_dedup, total, per_batch),
              flush=True)
    for per_batch in sizes:
        print(drive(spark, "bm25_index", mk_bm25, total, per_batch),
              flush=True)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
