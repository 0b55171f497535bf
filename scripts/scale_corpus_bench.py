#!/usr/bin/env python
"""Corpus scale-up experiment for the round-3 training-data operators
(BASELINE.md §3 protocol, same construction as the round-2 dedup
scale-up): multiply the sf0.1 documents table k× with every copy
token-suffixed so copies share NO n-grams (cross-copy contamination
stays zero, per-copy structure is preserved), then time
test_set_decontamination and sequence_pack_manifest at each scale.

Usage: python scripts/scale_corpus_bench.py [--queries a,b]
       [--driver-memory 16g] [k ...]
(default queries test_set_decontamination + sequence_pack_manifest,
default k 1 4 16, default driver memory 4g — the exact gram joins
need 16g+ at 64×+; any documents-only registry query works; flags may
appear in any order)
Writes multiplied corpora under /tmp/scale_corpus/, prints one
markdown table row per (query, k).
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
WORK = "/tmp/scale_corpus"
QUERY_NAMES = ["test_set_decontamination", "sequence_pack_manifest"]

# Queries that read `embeddings` instead of `documents`: the multiplied
# corpus gets k× vectors, each copy jittered with deterministic
# per-copy noise so copies are NOT mutual near-duplicates (cos(v, v+ε)
# stays below the dup thresholds for most pairs) — the pair structure
# then grows ~linearly with k instead of k² copies-of-the-same-vector.
EMBEDDINGS_QUERIES = {
    "semantic_dedup_clusters",
    "embedding_near_duplicates",
    "ivf_approx_neighbors",
    "knn_bruteforce_cosine",
    "lsh_bucketed_neighbors",
    "embedding_dim_stats",
    "embedding_quantization_error",
    "hard_negative_pairs",
}


def build(spark, k: int) -> str:
    out = f"{WORK}/x{k}"
    if os.path.exists(f"{out}/documents.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    base = load_table(spark, BASE_SF, "documents")
    copies = []
    for i in range(k):
        if i == 0:
            copies.append(base)
            continue
        suffixed = F.array_join(
            F.transform(F.split("text", " "), lambda x: F.concat(x, F.lit(f"_{i}"))),
            " ",
        )
        copies.append(
            base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                "lang",
                "source",
                "n_chars",
                suffixed.alias("text"),
            ).select(*base.columns)
        )
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def build_embeddings(spark, k: int) -> str:
    out = f"{WORK}/x{k}"
    if os.path.exists(f"{out}/embeddings.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    base = load_table(spark, BASE_SF, "embeddings")
    copies = []
    for i in range(k):
        if i == 0:
            copies.append(base)
            continue
        seed = F.lit(i * 31)
        jittered = F.transform(
            F.col("embedding"),
            lambda x, j: (
                x
                + (
                    (
                        F.pmod(
                            F.hash(F.col("vec_id") * 97 + j * 13 + seed), F.lit(997)
                        )
                        / 997.0
                    )
                    - 0.5
                )
                * 0.3
            ).cast("float"),
        )
        copies.append(
            base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                jittered.alias("embedding"),
                "label",
            ).select(*base.columns)
        )
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def main() -> None:
    args = sys.argv[1:]
    names = QUERY_NAMES
    driver_mem = "4g"
    rest: list[str] = []
    i = 0
    while i < len(args):  # flags accepted in any position/order
        if args[i] == "--queries":
            names = args[i + 1].split(",")
            i += 2
        elif args[i] == "--driver-memory":
            driver_mem = args[i + 1]
            i += 2
        else:
            rest.append(args[i])
            i += 1
    ks = [int(a) for a in rest] or [1, 4, 16]
    spark = get_spark(
        "scale-corpus",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            # 64×+ corpora push the exact gram joins past the 4g
            # local-mode default (the 256× run OOMed); pass 16g+ there
            "spark.driver.memory": driver_mem,
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
    need_docs = any(n not in EMBEDDINGS_QUERIES for n in names)
    need_emb = any(n in EMBEDDINGS_QUERIES for n in names)
    print("| query | k | rows_in | wall | rows |")
    print("|---|---|---|---|---|")
    for k in ks:
        if need_docs:
            sf_dir = build(spark, k)
            n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        if need_emb:
            sf_dir = build_embeddings(spark, k)
            n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        for name in names:
            n_in = n_vecs if name in EMBEDDINGS_QUERIES else n_docs
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            n = df.count()
            wall = time.time() - t0
            print(f"| {name} | {k}x | {n_in} | {wall:.2f} s | {n} |")
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
