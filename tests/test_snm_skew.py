"""sorted_neighborhood_pairs oversized-block guard (r14, VERDICT r13
item 5): an adversarial corpus whose docs ALL share one 6-char prefix
(the boilerplate case — "copyright …") must not serialize the block
into a single window task. The guard sub-splits hot blocks by the full
24-char sort key and resolves neighbors by a (block, rank) equi-join,
so the answer is IDENTICAL at any cap while the largest window
partition stays bounded by the full-key tie count."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans.text import sorted_neighborhood_pairs


@pytest.fixture()
def adversarial_corpus(spark, tmp_path):
    """~600 docs, every one starting with the same 6-char prefix; tails
    vary so full 24-char sort keys are (mostly) distinct; consecutive
    doc pairs are near-duplicates so the answer is non-trivial."""
    rows = []
    for i in range(300):
        body = f"copyright notice {i:04d} all rights reserved clause"
        rows.append((2 * i, body + " alpha beta gamma delta"))
        rows.append((2 * i + 1, body + " alpha beta gamma epsilon"))
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("probe").alias("source"),
        F.length("text").alias("n_chars"),
    )
    root = str(tmp_path / "corpus")
    df.coalesce(2).write.parquet(os.path.join(root, "documents.parquet"))
    return root


def _pairs(spark, root, cap):
    os.environ["FLS_SNM_BLOCK_CAP"] = str(cap)
    try:
        return sorted(
            (r["doc_a"], r["doc_b"], r["jac_ppm"])
            for r in sorted_neighborhood_pairs(spark, root).collect()
        )
    finally:
        os.environ.pop("FLS_SNM_BLOCK_CAP", None)


def test_same_answer_any_cap_and_bounded_partitions(
    spark, adversarial_corpus
):
    root = adversarial_corpus
    unguarded = _pairs(spark, root, cap=10_000_000)  # one block, one sub
    guarded = _pairs(spark, root, cap=50)  # every block is "hot"
    assert guarded == unguarded
    assert len(guarded) >= 300  # the planted near-dup pairs survive
    # bounded-task evidence: under the guard the window partitions by
    # (block, full 24-char key) — the largest such group on this
    # adversarial corpus is the full-key tie count, NOT the block size
    docs = spark.read.parquet(
        os.path.join(root, "documents.parquet")
    ).select(
        F.substring(F.lower("text"), 1, 6).alias("blk"),
        F.lower(F.substring("text", 1, 24)).alias("sk"),
    )
    blk_max = (
        docs.groupBy("blk").count().agg(F.max("count")).collect()[0][0]
    )
    sub_max = (
        docs.groupBy("blk", "sk").count().agg(F.max("count")).collect()[0][0]
    )
    assert blk_max == 600  # the adversary really did concentrate a block
    assert sub_max <= 50  # ...and the guard's partitions stay tiny


def test_cold_path_unchanged_on_testdata(spark, sf_dir):
    """Default cap (100k) leaves real blocks cold — and the r14 rank
    form must equal itself under a forced-hot run on real data too."""
    base = sorted(
        (r["doc_a"], r["doc_b"])
        for r in sorted_neighborhood_pairs(spark, sf_dir).collect()
    )
    os.environ["FLS_SNM_BLOCK_CAP"] = "2"
    try:
        forced = sorted(
            (r["doc_a"], r["doc_b"])
            for r in sorted_neighborhood_pairs(spark, sf_dir).collect()
        )
    finally:
        os.environ.pop("FLS_SNM_BLOCK_CAP", None)
    assert forced == base
