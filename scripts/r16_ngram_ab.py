#!/usr/bin/env python
"""r16: A/B the ngram pair family's hot-shingle drop formulation.

Current (shipped): groupBy(shingle).count -> filter df>100 ->
left_anti join back onto the exploded index (two passes over the
1.1M-row index + a join). Variant: a COUNT window over the
shingle-partitioned index (one pass, no join; the window's sort also
pre-sorts the index for the SMJ self-join that follows). Same rows out
by construction. Interleaved min-of-N cold.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fintech_lakehouse_spark.functions.text import word_shingles  # noqa: E402
from fintech_lakehouse_spark.plans.text import reset_stage_caches  # noqa: E402
from fintech_lakehouse_spark.session import get_spark  # noqa: E402
from fintech_lakehouse_spark.sources.readers import load_table  # noqa: E402


def build(spark, sf_dir, variant: str, score: str):
    documents = load_table(spark, sf_dir, "documents")
    exploded = (
        word_shingles(documents, n=3)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .repartition("shingle")
    )
    if variant == "anti":
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > 100)
            .select("shingle")
        )
        clean = exploded.join(hot, "shingle", "left_anti")
    else:
        w = Window.partitionBy("shingle")
        clean = (
            exploded.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= 100)
            .drop("_df")
        )
    sizes = clean.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = clean.alias("a"), clean.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    if score == "jaccard":
        metric = F.col("n_shared").cast("double") / (
            F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_shared")
        )
        thr = 0.30
    else:
        metric = F.col("n_shared").cast("double") / F.least(
            F.col("sa.n_shingles"), F.col("sb.n_shingles")
        )
        thr = 0.25
    return (
        pairs.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(metric >= thr)
        .select("doc_a", "doc_b", F.round(metric, 4).alias(score))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r16-ngram-ab",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # result identity first (the variant must be row-identical)
    small = "/root/testdata/sf0.01"
    for score in ("jaccard", "containment"):
        va = sorted(map(tuple, build(spark, small, "anti", score).collect()))
        vw = sorted(map(tuple, build(spark, small, "window", score).collect()))
        assert va == vw, f"variant mismatch for {score}"
    print("row-identity at sf0.01: OK")

    for v in ("anti", "window"):
        noop(build(spark, "/root/testdata/sf0.001", v, "jaccard"))

    results = {}
    for score in ("jaccard", "containment"):
        for v in ("anti", "window", "anti", "window"):
            best = results.get((score, v), float("inf"))
            for _ in range(repeats):
                reset_stage_caches()
                spark.sparkContext.setJobDescription(f"ngram {score} [{v}]")
                t = time.time()
                noop(build(spark, sf_dir, v, score))
                best = min(best, time.time() - t)
            results[(score, v)] = best
    for score in ("jaccard", "containment"):
        a, w = results[(score, "anti")], results[(score, "window")]
        print(f"{score:12s} anti {a:6.3f}  window {w:6.3f}  speedup {a / w:5.2f}")


if __name__ == "__main__":
    main()
