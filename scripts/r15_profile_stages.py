#!/usr/bin/env python
"""r15 optimization round: decompose the most expensive bench queries
into sub-pipelines and time each with the noop sink (guide §1.4), so
the optimization targets the stage that actually costs, not the one
that looks heavy in the plan.

Usage: python scripts/r15_profile_stages.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fintech_lakehouse_spark.functions.text import (  # noqa: E402
    band_signatures,
    lsh_band_pairs_md5,
    minhash_signatures_md5,
    shingle_rows,
    verified_jaccard_pairs,
    winnow_selected,
)
from fintech_lakehouse_spark.plans.text import reset_stage_caches  # noqa: E402
from fintech_lakehouse_spark.session import get_spark  # noqa: E402
from fintech_lakehouse_spark.sources.readers import load_table  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label: str, build, repeats: int = 3) -> float:
    """Min-of-N cold timing of build() → noop, including the Python
    plan-construction cost (the bench times it too)."""
    best = float("inf")
    for _ in range(repeats):
        reset_stage_caches()
        t0 = time.time()
        noop(build())
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best:7.3f} s")
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r15-profile",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    def docs():
        return load_table(spark, sf_dir, "documents")

    def docs_rep():
        return docs().repartition(par, "doc_id")

    # -- warmup: compile every plan shape once at the smallest SF
    small = "/root/testdata/sf0.001"
    for build in (
        lambda: load_table(spark, small, "documents"),
        lambda: minhash_signatures_md5(
            shingle_rows(load_table(spark, small, "documents"), n=3)
        ),
    ):
        try:
            noop(build())
        except Exception:
            pass

    print(f"== minhash_lsh_pairs decomposition (sf_dir={sf_dir}) ==")
    spark.sparkContext.setJobDescription("mh: scan only")
    timed(spark, "scan documents", docs, repeats)
    spark.sparkContext.setJobDescription("mh: scan+repartition")
    timed(spark, "scan + repartition(doc_id)", docs_rep, repeats)
    spark.sparkContext.setJobDescription("mh: shingles")
    timed(spark, "+ shingle_rows(n=3)", lambda: shingle_rows(docs_rep(), n=3),
          repeats)
    spark.sparkContext.setJobDescription("mh: signatures")
    timed(
        spark,
        "+ minhash_signatures_md5 (K=32)",
        lambda: minhash_signatures_md5(shingle_rows(docs_rep(), n=3), 32),
        repeats,
    )
    spark.sparkContext.setJobDescription("mh: bands")
    timed(
        spark,
        "+ band_signatures (B=8)",
        lambda: band_signatures(
            minhash_signatures_md5(shingle_rows(docs_rep(), n=3), 32), 32, 8
        ),
        repeats,
    )
    spark.sparkContext.setJobDescription("mh: candidates")
    timed(
        spark,
        "+ lsh_band_pairs_md5 (self-join + distinct)",
        lambda: lsh_band_pairs_md5(
            minhash_signatures_md5(shingle_rows(docs_rep(), n=3), 32), 32, 8
        ),
        repeats,
    )
    spark.sparkContext.setJobDescription("mh: verified")
    timed(
        spark,
        "+ verified_jaccard_pairs (full pipeline)",
        lambda: verified_jaccard_pairs(
            docs_rep(),
            lsh_band_pairs_md5(
                minhash_signatures_md5(shingle_rows(docs_rep(), n=3), 32), 32, 8
            ),
            n=3,
            threshold=0.5,
        ),
        repeats,
    )

    print("== winnowing stage ==")
    spark.sparkContext.setJobDescription("win: selected")
    timed(spark, "winnow_selected", lambda: winnow_selected(docs(), k=4, w=5),
          repeats)
    from fintech_lakehouse_spark.plans.curation import (
        winnowing_pairs_stage,
    )

    spark.sparkContext.setJobDescription("win: pairs stage")
    timed(
        spark,
        "winnowing_pairs_stage (cached stage, cold)",
        lambda: winnowing_pairs_stage(spark, sf_dir),
        repeats,
    )

    print("== pagerank on top of winnowing (cold) ==")
    from fintech_lakehouse_spark.plans import QUERIES

    spark.sparkContext.setJobDescription("pr: full")
    timed(
        spark,
        "dup_graph_pagerank (full, cold)",
        lambda: QUERIES["dup_graph_pagerank"](spark, sf_dir),
        repeats,
    )

    print("== curated_corpus_shards sub-stages ==")
    from fintech_lakehouse_spark.plans.text import (
        _is_repetitive,
        _with_repetition_metrics,
    )
    from fintech_lakehouse_spark.functions.sampling import hash_bucket

    def quality():
        m = _with_repetition_metrics(docs()).withColumn(
            "b", hash_bucket("doc_id", "split")
        )
        return m.filter(
            (F.col("b") < 9000) & (F.col("n_tokens") >= 10) & ~_is_repetitive()
        )

    spark.sparkContext.setJobDescription("ccs: quality")
    timed(spark, "quality filter (repetition metrics)", quality, repeats)
    spark.sparkContext.setJobDescription("ccs: full")
    timed(
        spark,
        "curated_corpus_shards (full, cold)",
        lambda: QUERIES["curated_corpus_shards"](spark, sf_dir),
        repeats,
    )
    print("== other heavy queries (cold, for reference) ==")
    for name in (
        "ngram_jaccard_pairs",
        "test_set_decontamination",
        "minhash_lsh_pairs",
        "winnowing_candidate_pairs",
        "pricing_summary",
    ):
        spark.sparkContext.setJobDescription(name)
        timed(spark, name, lambda n=name: QUERIES[n](spark, sf_dir), repeats)


if __name__ == "__main__":
    main()
