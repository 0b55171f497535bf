#!/usr/bin/env python
"""PQ encode at scale (VERDICT r9 item 7): the production Arrow/NumPy
encoder (functions/vectors.py::pq_encode_pandas) vs the frozen-LITERAL
oracle-replayable query (plans/vectors.py::pq_quantization_distortion)
on multiplied embeddings (scale_corpus_bench.build_embeddings — k×
vectors with deterministic jitter). Pins the r9 "5.5× faster" sf0.1
claim with a real scale curve, and cross-checks a sample of codes for
bit-parity at every k.

Usage: python scripts/pq_encode_scale_bench.py [ks,csv]   (default 50,500)
sf0.1 has 2,000 vectors, so k=500 → 1,000,000 vectors.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from fintech_lakehouse_spark.functions.vectors import pq_encode_pandas
from fintech_lakehouse_spark.plans import QUERIES
from fintech_lakehouse_spark.session import get_spark
from scale_corpus_bench import build_embeddings  # noqa: E402


def main() -> None:
    ks = (
        [int(s) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [50, 500]
    )
    spark = get_spark(
        "pq-scale",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # codegen/Arrow warmup at base sf
    QUERIES["pq_quantization_distortion"](
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    def emb(sf_dir):
        df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )

    pq_encode_pandas(emb("/root/testdata/sf0.001")).write.format(
        "noop"
    ).mode("overwrite").save()

    print("| k | vectors | literal query | pq_encode_pandas | speedup | parity |")
    print("|---|---|---|---|---|---|")
    for k in ks:
        sf_dir = build_embeddings(spark, k)
        n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        lit_walls, prod_walls = [], []
        for _ in range(3):
            t0 = time.time()
            QUERIES["pq_quantization_distortion"](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            lit_walls.append(time.time() - t0)
            t0 = time.time()
            pq_encode_pandas(emb(sf_dir)).write.format("noop").mode(
                "overwrite"
            ).save()
            prod_walls.append(time.time() - t0)
        lit, prod = min(lit_walls), min(prod_walls)
        # bit-parity spot check on a deterministic sample
        sample = (
            QUERIES["pq_quantization_distortion"](spark, sf_dir)
            .filter(F.col("vec_id") % 997 == 0)
            .select("vec_id", "pq_code", "sq_err")
        )
        twin = (
            pq_encode_pandas(emb(sf_dir))
            .filter(F.col("vec_id") % 997 == 0)
            .select(
                "vec_id", "pq_code",
                F.round("sq_err_raw", 6).alias("sq_err"),
            )
        )
        n_sample = sample.count()
        n_match = sample.join(twin, ["vec_id", "pq_code", "sq_err"]).count()
        parity = f"{n_match}/{n_sample}"
        print(
            f"| {k}x | {n} | {lit:.2f} s | {prod:.2f} s | "
            f"{lit / prod:.1f}x | {parity} |",
            flush=True,
        )
        assert n_match == n_sample, "bit-parity violation"


if __name__ == "__main__":
    main()
