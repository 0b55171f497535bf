"""A/B: ngram pair queries — baseline vs explicit repartition("shingle").

Fact-20 hypothesis (ROUND_NOTES): the scan->shingle->explode derivation
recomputes once per distinct-keyed consumer (hot groupBy on shingle,
sizes groupBy on doc_id, self-join on shingle) because ReusedExchange
only dedupes IDENTICAL exchanges. Inserting one explicit
repartition("shingle") right after explode gives every consumer an
identical exchange subtree to reuse, so the derivation should run once.

Protocol: fresh SparkSession per run (true cold JVM-side caches are not
achievable in-process; we at least clearCache + new session), min of N
wall timings of a full collect. Run:  python scripts/ab_ngram_reuse.py
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")
from fintech_lakehouse_spark.functions.text import word_shingles  # noqa: E402
from fintech_lakehouse_spark.sources.readers import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
RUNS = 3


def build(spark, variant: str):
    documents = load_table(spark, SF_DIR, "documents")
    shingled = word_shingles(documents, n=3)
    exploded = shingled.select("doc_id", F.explode("shingles").alias("shingle"))
    if variant == "repartition":
        exploded = exploded.repartition("shingle")
    hot = (
        exploded.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 100)
        .select("shingle")
    )
    exploded2 = exploded.join(hot, "shingle", "left_anti")
    sizes = exploded2.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = exploded2.alias("a")
    b = exploded2.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_shared")
    )
    return (
        pairs.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.30)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def session():
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def scan_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("FileScan parquet") + plan.count("Scan parquet")


def main():
    for variant in ["baseline", "repartition"]:
        times = []
        rows = None
        for i in range(RUNS):
            spark = session()
            spark.catalog.clearCache()
            df = build(spark, variant)
            t0 = time.time()
            rows = df.count()
            times.append(time.time() - t0)
            spark.stop()
        spark = session()
        df = build(spark, variant)
        df.count()  # trigger AQE final plan
        scans = scan_count(df)
        spark.stop()
        print(
            f"{variant}: rows={rows} times={[round(t, 2) for t in times]} "
            f"min={min(times):.2f} scans_in_final_plan={scans}"
        )


if __name__ == "__main__":
    main()
