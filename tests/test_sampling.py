"""Deterministic sampling/splitting tests (functions/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fintech_lakehouse_spark.functions.sampling import (
    N_BUCKETS,
    deterministic_sample,
    hash_bucket,
    hash_split,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("de").alias("lang"),
    )


def test_hash_bucket_range_and_determinism(spark):
    df = _docs(spark).select(hash_bucket("doc_id").alias("b"))
    row = df.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"),
        F.countDistinct("b").alias("nd"),
    ).collect()[0]
    assert 0 <= row["lo"] and row["hi"] < N_BUCKETS
    assert row["nd"] > 1000  # spreads
    # identical across invocations
    a = set(r["b"] for r in df.collect())
    b = set(r["b"] for r in df.collect())
    assert a == b


def test_deterministic_sample_rate_and_stability(spark):
    docs = _docs(spark)
    s1 = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
    assert s1 == s2  # stable membership
    assert 0.25 < len(s1) / 2000 < 0.35
    # a larger rate strictly contains a smaller one (nested samples)
    s_half = {r["doc_id"] for r in deterministic_sample(docs, 0.5, "doc_id").collect()}
    assert s1 <= s_half


def test_stratified_sample_rates(spark):
    docs = _docs(spark)
    sampled = stratified_sample(
        docs, "lang", {"en": 1.0, "de": 0.2}, "doc_id"
    )
    counts = {
        r["lang"]: r["n"]
        for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["en"] == 500  # rate 1.0 keeps every en doc
    assert 0.12 < counts["de"] / 1500 < 0.28


def test_hash_split_partition_and_leakage(spark):
    docs = _docs(spark)
    split = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert 0.74 < counts["train"] / 2000 < 0.86
    # every doc in exactly one split, stable across runs
    again = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    m1 = {r["doc_id"]: r["split"] for r in split.collect()}
    m2 = {r["doc_id"]: r["split"] for r in again.collect()}
    assert m1 == m2
    # split and sample decisions are decorrelated (different salts)
    sampled = {r["doc_id"] for r in deterministic_sample(docs, 0.5, "doc_id").collect()}
    train = {d for d, s in m1.items() if s == "train"}
    overlap = len(sampled & train) / len(sampled)
    assert 0.7 < overlap < 0.9  # ≈ P(train), not 1.0 or 0.5-correlated
