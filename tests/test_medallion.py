"""Bronze→Silver cast/derive tests (the transform the reference
declares via schemas but never implements — SURVEY §0)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.operators.medallion import bronze_to_silver
from fintech_lakehouse_spark.schemas import bronze_schema, silver_schema


@pytest.fixture()
def bronze_txns(spark):
    schema = bronze_schema("transactions")
    rows = [
        (
            "TXN1", "C1", "M1", "100.50", "USD", "100.50", "2.50", "98.00",
            "PURCHASE", "CARD", "ONLINE", "COMPLETED", "US", "US", "false",
            "true", "VELOCITY_SPIKE|HIGH_RISK_MCC", "1.2.3.4", "D1",
            "2024-01-15 13:45:00", "2024-01-15 13:45:01",
        ),
        (
            "TXN2", "C2", "M2", "not-a-number", "EUR", "", None, "9.00",
            "REFUND", "WALLET", "POS", "PENDING", "DE", "FR", "TRUE",
            "0", "", None, None, "2024-02-29 23:00:00", None,
        ),
    ]
    return spark.createDataFrame(rows, schema)


def test_silver_types_and_derived(bronze_txns):
    silver = bronze_to_silver(bronze_txns, "transactions")
    expected_names = [f.name for f in silver_schema("transactions").fields
                      if not f.name.startswith("_")]
    assert silver.columns == expected_names

    r1, r2 = silver.orderBy("transaction_id").collect()
    # typed casts
    assert str(r1["amount"]) == "100.50"  # DecimalType(18,2)
    assert r1["is_cross_border"] is False and r1["is_flagged"] is True
    assert r1["fraud_indicators"] == ["VELOCITY_SPIKE", "HIGH_RISK_MCC"]
    assert r1["transaction_timestamp"] == datetime.datetime(2024, 1, 15, 13, 45)
    # derived (ref: src/schemas/silver.py:57-59)
    assert r1["transaction_date"] == datetime.date(2024, 1, 15)
    assert r1["transaction_hour"] == 13
    assert r1["transaction_day_of_week"] == 2  # Monday (Spark: Sun=1)
    # permissive casts: malformed → NULL, empty array-string → NULL
    assert r2["amount"] is None
    assert r2["amount_usd"] is None
    assert r2["fraud_indicators"] is None
    assert r2["is_cross_border"] is True  # "TRUE" accepted case-insensitively


def test_silver_customer_derivations(spark):
    schema = bronze_schema("customers")
    row = (
        "C1", "Ada", "Lovelace", "ada@x.io", "+1", "GB", "London", "N1",
        "1990-06-15", "PREMIUM", "VERIFIED", "2020-01-01", "12", "false",
        "2020-01-01 00:00:00", "2024-01-01 00:00:00",
    )
    silver = bronze_to_silver(spark.createDataFrame([row], schema), "customers")
    r = silver.collect()[0]
    assert r["full_name"] == "Ada Lovelace"
    assert r["risk_score"] == 12
    assert r["age"] >= 34  # moves with current_date; sanity bound
    assert r["date_of_birth"] == datetime.date(1990, 6, 15)


def test_bronze_schema_is_all_string():
    for table in ("transactions", "customers", "merchants", "exchange_rates"):
        schema = bronze_schema(table)
        assert all(f.dataType.typeName() == "string" for f in schema.fields)
        assert all(f.nullable for f in schema.fields)


def test_silver_schema_constraints():
    silver = silver_schema("transactions")
    by_name = {f.name: f for f in silver.fields}
    assert not by_name["transaction_id"].nullable
    assert by_name["amount"].dataType.simpleString() == "decimal(18,2)"
    assert by_name["fraud_indicators"].dataType.simpleString() == "array<string>"
    assert by_name["_source_file"].nullable


def test_generated_ages_in_documented_range(spark):
    """date_of_birth must yield ages 18..67 as of the 2024-01-01 data
    epoch — the 2006 anchor double-counted the 18-year floor and no
    customer under 36 was ever generated (review finding r6s5)."""
    from fintech_lakehouse_spark.datagen import generate_customers

    ages = (
        generate_customers(spark, n=500)
        .select(
            (
                F.datediff(
                    F.lit("2024-01-01").cast("date"),
                    F.col("date_of_birth").cast("date"),
                )
                / 365.25
            ).alias("age")
        )
        .agg(F.min("age").alias("lo"), F.max("age").alias("hi"))
        .collect()[0]
    )
    assert 17.5 <= ages["lo"] <= 20, ages
    assert 60 <= ages["hi"] <= 67.5, ages


def test_generated_cross_border_consistent_with_countries(spark):
    """is_cross_border must be derived (it was NULL end-to-end: the
    generator deferred to silver and silver's spec row never derived
    it — review finding r6s5) and agree with the per-row countries."""
    from fintech_lakehouse_spark.datagen import generate_transactions

    df = generate_transactions(spark, n=500).select(
        "merchant_country", "customer_country", "is_cross_border"
    )
    assert df.filter(F.col("is_cross_border").isNull()).count() == 0
    mism = df.filter(
        (
            (F.col("merchant_country") != F.col("customer_country"))
            & (F.col("is_cross_border") != "true")
        )
        | (
            (F.col("merchant_country") == F.col("customer_country"))
            & (F.col("is_cross_border") != "false")
        )
    )
    assert mism.count() == 0
    # both values actually occur
    assert df.select("is_cross_border").distinct().count() == 2


def test_promote_silver_exchange_rates_spec_gate(spark, tmp_path):
    """The generic silver gate derives its NOT-NULL columns from
    TABLE_SPECS — the fabricated '<singular>_id' guess crashed for
    exchange_rates (review finding r6s5)."""
    from fintech_lakehouse_spark.config import EngineConfig
    from fintech_lakehouse_spark.datagen import generate_exchange_rates
    from fintech_lakehouse_spark.pipeline import MedallionPipeline

    config = EngineConfig(env="dev", base_path=str(tmp_path / "lake"))
    pipe = MedallionPipeline(spark, config)
    raw = generate_exchange_rates(spark, days=3)
    bronze = pipe.ingest_bronze("exchange_rates", raw)
    silver = pipe.promote_silver("exchange_rates", bronze)
    assert silver.count() > 0


def test_promote_silver_quarantines_null_timestamp_rows(spark, tmp_path):
    """A garbage timestamp casts to NULL; the spec declares the column
    NOT NULL, so the row must quarantine instead of landing in a
    __HIVE_DEFAULT_PARTITION__ dir of the date-partitioned silver
    table (review finding r6s5)."""
    from fintech_lakehouse_spark.config import EngineConfig
    from fintech_lakehouse_spark.datagen import generate_transactions
    from fintech_lakehouse_spark.pipeline import MedallionPipeline

    config = EngineConfig(env="dev", base_path=str(tmp_path / "lake"))
    pipe = MedallionPipeline(spark, config)
    raw = generate_transactions(spark, n=50)
    poisoned = raw.withColumn(
        "transaction_timestamp",
        F.when(F.col("transaction_id") == raw.first()["transaction_id"],
               F.lit("NOT A TIMESTAMP"))
        .otherwise(F.col("transaction_timestamp")),
    )
    bronze = pipe.ingest_bronze("transactions", poisoned)
    silver = pipe.promote_silver("transactions", bronze)
    assert silver.filter(F.col("transaction_date").isNull()).count() == 0
    quarantined = spark.read.parquet(
        config.layer_path("quarantine", "transactions")
    )
    assert quarantined.count() >= 1
