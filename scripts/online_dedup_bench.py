#!/usr/bin/env python
"""Per-batch cost curve for the streaming online dedup
(streaming/events.py::foreach_batch_online_dedup): feed K synthetic
batches of B docs each (same Zipf-ish generator as
scale_corpus_bench --synthetic, ~1% planted predecessor near-dups)
directly through the foreachBatch function and time each batch while
the accumulated fingerprint store grows. The claim under test: batch
cost grows with STORE PROBE size (bands join), not with re-running
dedup over all history — i.e. far sub-linear in total corpus, the
reason the online form exists.

Usage: python scripts/online_dedup_bench.py [batches] [docs_per_batch]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.streaming import foreach_batch_online_dedup

WORK = "/tmp/online_dedup_bench"


from scale_corpus_bench import synth_text_expr  # noqa: E402  (shared generator)


def synth_batch(spark, batch_idx: int, n: int):
    """scale_corpus_bench's shared generator, offset so doc_ids stay
    monotone across batches (the sink's arrival-order contract)."""
    lo = batch_idx * n
    return spark.range(lo, lo + n).selectExpr(
        "id AS doc_id",
        f"{synth_text_expr(lo=lo)} AS text",
    )


def main() -> None:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
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
    sink = foreach_batch_online_dedup(f"{WORK}/state", f"{WORK}/decisions")
    print("| batch | new docs | stored docs before | wall | dups found |")
    print("|---|---|---|---|---|")
    for i in range(batches):
        df = synth_batch(spark, i, per_batch)
        t0 = time.time()
        sink(df, i)
        wall = time.time() - t0
        dups = (
            spark.read.parquet(f"{WORK}/decisions/version={i}")
            .filter("is_dup")
            .count()
        )
        print(
            f"| {i} | {per_batch} | {i * per_batch} | {wall:.2f} s | {dups} |"
        )
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
