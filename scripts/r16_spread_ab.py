#!/usr/bin/env python
"""r16: A/B the documents-scan spread for the gram/shingle family.

The sf0.1 lake stores `documents` as ONE parquet file, so the whole
shingle/gram/winnow derivation of every text query runs in a single
scan task on one core (guide §2.5 input skew — same pathology the r15
multimodal `_spread` fixed for codec stages). This harness interleaves
plain vs doc_id-repartitioned `load_table` over the affected queries,
min-of-N cold each, same session.

Usage: python scripts/r16_spread_ab.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fintech_lakehouse_spark.plans.text import reset_stage_caches  # noqa: E402
from fintech_lakehouse_spark.session import get_spark  # noqa: E402


def _steal():
    with open("/proc/stat") as fh:
        vals = [int(x) for x in fh.readline().split()[1:]]
    return vals[7], sum(vals)


QUERIES_AB = [
    "ngram_containment_pairs",
    "ngram_jaccard_pairs",
    "test_set_decontamination",
    "curated_corpus_shards",
    "winnowing_fingerprints",
    "winnowing_candidate_pairs",
    "dup_graph_pagerank",
    "bloom_decontamination",
    "doc_repetition_scores",
    "bigram_familiarity_scores",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r16-spread-ab",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import fintech_lakehouse_spark.plans.curation as PC
    import fintech_lakehouse_spark.plans.text as PT
    from fintech_lakehouse_spark.plans import QUERIES

    par = spark.sparkContext.defaultParallelism
    orig = PT.load_table

    def spread_load(spark, sf_dir, name):
        df = orig(spark, sf_dir, name)
        if name == "documents":
            df = df.repartition(par, "doc_id")
        return df

    def set_mode(spread: bool):
        for mod in (PT, PC):
            mod.load_table = spread_load if spread else orig

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup both plan shapes at the smallest SF
    for spread in (False, True):
        set_mode(spread)
        for q in QUERIES_AB:
            try:
                reset_stage_caches()
                noop(QUERIES[q](spark, "/root/testdata/sf0.001"))
            except Exception as e:
                print(f"warmup {q} failed: {e}", file=sys.stderr)

    results: dict[str, dict[bool, float]] = {q: {} for q in QUERIES_AB}
    s0, t0 = _steal()
    # interleave A/B per query to keep ambient noise symmetric
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
