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
    "kmeans_lloyd_clusters",
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


def synth_text_expr(lo: int = 0, vocab: int = 200_000) -> str:
    """The ONE definition of the synthetic-corpus text generator SQL
    expression (shared with scripts/online_dedup_bench.py — review
    finding r7: a copy there had started drifting from the version
    BASELINE numbers are quoted against). Tokens are Zipf-ishly
    hash-sampled from a ``vocab``-word lexicon (u³ rank mapping) over
    a `spark.range` ``id`` column; ~1% of docs are near-duplicates of
    their predecessor (shared stream except the last 5 tokens) so
    pair/verify stages carry real, linearly-growing work — a corpus
    with zero near-dups would let the candidate join emit nothing and
    prove nothing about the verify bound. ``lo`` offsets the
    predecessor guard so batched generation keeps ids monotone."""
    base = f"(CASE WHEN id % 97 = 0 AND id > {lo} THEN id - 1 ELSE id END)"
    n_tok = f"30 + pmod(hash({base}), 51)"
    token_of = (
        "concat('w', cast(floor(pow(pmod(hash({src} * 2654435761 + "
        "j * 40503), 1000000) / 1000000.0, 3.0) * {v}) as long))"
    )
    own = token_of.format(src="id", v=vocab)
    inherited = token_of.format(src=base, v=vocab)
    token = f"(CASE WHEN j >= {n_tok} - 5 THEN {own} ELSE {inherited} END)"
    return (
        f"array_join(transform(sequence(0, {n_tok} - 1), j -> {token}), ' ')"
    )


def build_synthetic(spark, n_docs: int, vocab: int = 200_000) -> str:
    """N DISTINCT documents with a GROWING vocabulary (VERDICT r6
    item 4): the multiplied-corpus protocol repeats per-copy structure,
    so hot-gram counters stay flat by construction; this builder
    instead samples every token Zipf-ishly from a ``vocab``-word
    lexicon via pure hash mixing (u³ rank mapping concentrates mass on
    a head of common words, the shape real text has), entirely in JVM
    expressions — no Python in the generate path, deterministic for a
    fixed (n_docs, vocab). Hot grams now arise the way they do in real
    corpora — head-word collocations shared across unrelated docs —
    which is exactly the load the hot-fingerprint/hot-gram drops must
    bound when vocabulary grows rather than repeats."""
    out = f"{WORK}/synth{n_docs}"
    if os.path.exists(f"{out}/documents.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    df = spark.range(n_docs).selectExpr(
        "id AS doc_id",
        "element_at(array('en','de','fr','es','it'), "
        "cast(pmod(hash(id * 7919), 5) + 1 AS int)) AS lang",
        "'synth' AS source",
        f"{synth_text_expr(lo=0, vocab=vocab)} AS text",
    ).selectExpr("doc_id", "lang", "source", "length(text) AS n_chars", "text")
    df.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def gram_profile(spark, sf_dir: str, n: int = 3) -> str:
    """Fan-out-bound counters for the pair-join family at this corpus:
    distinct n-grams, max docs-per-gram, and how many grams sit above
    the WINNOW_HOT_DOCS drop threshold — the numbers that prove the
    candidate join is index-bounded, not quadratic, as vocabulary
    grows."""
    from fintech_lakehouse_spark.plans.curation import WINNOW_HOT_DOCS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("t")
    ).selectExpr(
        "doc_id",
        f"transform(sequence(0, size(t) - {n}), "
        f"i -> array_join(slice(t, i + 1, {n}), ' ')) AS grams",
    )
    per_gram = (
        toks.select("doc_id", F.explode("grams").alias("gram"))
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("docs"))
    )
    row = per_gram.agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.max("docs").alias("max_docs_per_gram"),
        F.sum((F.col("docs") > WINNOW_HOT_DOCS).cast("long")).alias("n_hot"),
    ).collect()[0]
    return (
        f"grams={row['n_grams']} max_docs/gram={row['max_docs_per_gram']} "
        f"hot(>{WINNOW_HOT_DOCS})={row['n_hot']}"
    )


def main() -> None:
    args = sys.argv[1:]
    names = QUERY_NAMES
    driver_mem = "4g"
    synthetic: list[int] = []
    profile = False
    rest: list[str] = []
    i = 0
    while i < len(args):  # flags accepted in any position/order
        if args[i] == "--queries":
            names = args[i + 1].split(",")
            i += 2
        elif args[i] == "--driver-memory":
            driver_mem = args[i + 1]
            i += 2
        elif args[i] == "--synthetic":
            synthetic = [int(v) for v in args[i + 1].split(",")]
            i += 2
        elif args[i] == "--gram-profile":
            profile = True
            i += 1
        else:
            rest.append(args[i])
            i += 1
    ks = [int(a) for a in rest] or ([] if synthetic else [1, 4, 16])
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
    for n_docs in synthetic:
        sf_dir = build_synthetic(spark, n_docs)
        if profile:
            print(f"| gram_profile | synth{n_docs} | {n_docs} | - | "
                  f"{gram_profile(spark, sf_dir)} |")
        for name in names:
            t0 = time.time()
            n = QUERIES[name](spark, sf_dir).count()
            wall = time.time() - t0
            print(f"| {name} | synth{n_docs} | {n_docs} | {wall:.2f} s | {n} |")
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
