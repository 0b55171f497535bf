#!/usr/bin/env python
"""Train the PQ codebook ONCE and freeze it as Python literals — the
scripts/train_ivf_codebook.py promotion applied to product
quantization: per 8-dim subspace, spark.ml KMeans (k=16, seed=42) over
the sf0.01 embeddings' subvectors, centroids written to
``fintech_lakehouse_spark/plans/_pq_codebook.py`` as integer
MILLI-units. The md5-derived bootstrap codebook quantized the real
embedding distribution (stddev ~0.125, range ~±0.58) so poorly that
ADC recall@5 was 0/5 — a vacuous eval (the r6 lesson); trained
centroids make distortion and recall MEANINGFUL while keeping the
frozen-literal determinism.

Re-run only deliberately (it changes the frozen query results):

    python scripts/train_pq_codebook.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, SUBDIM, K = 8, 8, 16

DOC = """FROZEN product-quantization codebook (Jegou, Douze, Schmid,
\"Product Quantization for Nearest Neighbor Search\", TPAMI 2011 -
public result): the 64-dim embedding space splits into M=8 contiguous
8-dim subspaces, each quantized against K=16 centroids.

TRAINED literals (scripts/train_pq_codebook.py - spark.ml KMeans k=16
seed=42 per subspace over the sf0.01 embeddings, centroids
lexicographically sorted then frozen as integer MILLI-units): like
plans/_ivf_codebook.py, the codebook is deterministic shared state
between the Spark plan and the DuckDB oracle, so both engines inline
IDENTICAL literals, divide by the same 1000.0, and the driver hash
check replays the full encode pipeline bit-for-bit. The first
(md5-derived) bootstrap codebook mismatched the embedding
distribution so badly that ADC recall@5 was zero - vacuous; training
makes the distortion/recall numbers meaningful without touching the
determinism machinery.

Size note: M*K*SUBDIM = 1024 integer literals - a few KB of plan text.
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.session import get_spark
    from fintech_lakehouse_spark.sources.readers import load_table

    spark = get_spark(
        "train-pq",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    books = []
    for s in range(M):
        sub = emb.select(
            array_to_vector(
                F.slice("v", s * SUBDIM + 1, SUBDIM)
            ).alias("features")
        )
        model = KMeans(k=K, seed=42, maxIter=20).fit(sub)
        cents = [
            [int(round(float(x) * 1000)) for x in c]
            for c in model.clusterCenters()
        ]
        # deterministic order: sort centroids lexicographically so the
        # frozen file is independent of spark.ml's internal ordering
        books.append(sorted(cents))
        print(f"subspace {s}: trained", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fintech_lakehouse_spark", "plans", "_pq_codebook.py",
    )
    with open(out, "w") as fh:
        fh.write('"""' + DOC + '"""\n')
        fh.write("\nfrom __future__ import annotations\n\n")
        fh.write(f"M = {M}  # subspaces\n")
        fh.write(f"SUBDIM = {SUBDIM}  # dims per subspace\n")
        fh.write(f"K = {K}  # centroids per subspace\n\n")
        fh.write("CODEBOOK: list[list[list[int]]] = [\n")
        for book in books:
            fh.write("    [\n")
            for c in book:
                fh.write(f"        {c},\n")
            fh.write("    ],\n")
        fh.write("]\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
