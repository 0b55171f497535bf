"""Operator unit tests (pattern from reference tests/unit/
test_spark_utils.py — inline micro-fixtures, collect-based asserts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.operators import (
    add_dense_surrogate_key,
    add_ingestion_metadata,
    add_processing_metadata,
    add_surrogate_key,
    asof_join,
    deduplicate_by_key,
    standardize_string_columns,
)


@pytest.fixture()
def txns(spark):
    return spark.createDataFrame(
        [
            ("TXN1", "C1", "2024-01-01 10:00:00", 100.0),
            ("TXN1", "C1", "2024-01-02 10:00:00", 120.0),  # later dup
            ("TXN2", "C2", "2024-01-01 09:00:00", 50.0),
        ],
        ["transaction_id", "customer_id", "updated_at", "amount"],
    ).withColumn("updated_at", F.to_timestamp("updated_at"))


def test_dedup_keep_latest(txns):
    out = deduplicate_by_key(txns, ["transaction_id"], "updated_at")
    rows = {r["transaction_id"]: r["amount"] for r in out.collect()}
    assert rows == {"TXN1": 120.0, "TXN2": 50.0}


def test_dedup_keep_first(txns):
    out = deduplicate_by_key(
        txns, ["transaction_id"], "updated_at", order_ascending=True
    )
    rows = {r["transaction_id"]: r["amount"] for r in out.collect()}
    assert rows == {"TXN1": 100.0, "TXN2": 50.0}


def test_surrogate_key_unique(spark):
    df = spark.range(1000).withColumnRenamed("id", "x")
    out = add_surrogate_key(df, "sk")
    assert out.select("sk").distinct().count() == 1000


def test_dense_surrogate_key_dense_and_ordered(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("d",), ("c",)], ["k"]
    ).repartition(3)
    out = add_dense_surrogate_key(df, "sk", ["k"]).orderBy("sk").collect()
    assert [r["sk"] for r in out] == [1, 2, 3, 4]  # dense, 1-based
    assert [r["k"] for r in out] == ["a", "b", "c", "d"]  # natural-key order


def test_standardize_strings(spark):
    df = spark.createDataFrame([("  usd ", "x"), ("eur", "y")], ["cur", "other"])
    out = standardize_string_columns(df, ["cur", "missing_col"]).collect()
    assert [r["cur"] for r in out] == ["USD", "EUR"]
    assert [r["other"] for r in out] == ["x", "y"]  # untouched


def test_metadata_columns(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    out = add_processing_metadata(add_ingestion_metadata(df))
    assert {"_source_file", "_ingestion_timestamp", "_processing_timestamp"} <= set(
        out.columns
    )
    assert out.collect()[0]["_processing_timestamp"] is not None


def test_asof_join_currency_conversion(spark):
    """The currency-conversion shape (SURVEY §2.3 J4): each txn gets
    the latest rate at or before its timestamp."""
    rates = spark.createDataFrame(
        [
            ("EUR", "2024-01-01 00:00:00", 1.10),
            ("EUR", "2024-01-03 00:00:00", 1.20),
            ("GBP", "2024-01-02 00:00:00", 1.30),
        ],
        ["currency", "rate_ts", "rate"],
    ).withColumn("rate_ts", F.to_timestamp("rate_ts"))
    txns = spark.createDataFrame(
        [
            ("T1", "EUR", "2024-01-02 12:00:00", 100.0),
            ("T2", "EUR", "2024-01-03 00:00:00", 100.0),  # exactly at rate ts
            ("T3", "GBP", "2024-01-01 00:00:00", 100.0),  # before any rate
        ],
        ["txn_id", "currency", "txn_ts", "amount"],
    ).withColumn("txn_ts", F.to_timestamp("txn_ts"))
    out = asof_join(
        txns, rates, on=["currency"], left_time="txn_ts", right_time="rate_ts"
    )
    got = {r["txn_id"]: r["rate_asof"] for r in out.collect()}
    assert got == {"T1": 1.10, "T2": 1.20, "T3": None}
    assert out.count() == 3  # left join: every txn survives
