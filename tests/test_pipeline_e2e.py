"""End-to-end medallion integration test: Spark-native generator →
bronze → DQ/quarantine → silver → gold star schema. This is the
composed flow from SURVEY §3.2-3.3 (absent from the reference repo,
whose integration suite is empty — SURVEY §5.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.config import EngineConfig
from fintech_lakehouse_spark.datagen import (
    generate_customers,
    generate_exchange_rates,
    generate_merchants,
    generate_transactions,
)
from fintech_lakehouse_spark.pipeline import MedallionPipeline

N_TXN, N_CUST, N_MERCH = 2_000, 300, 40


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    config = EngineConfig(
        env="dev", base_path=str(tmp_path_factory.mktemp("lake"))
    )
    pipe = MedallionPipeline(spark, config)
    raw = {
        "transactions": generate_transactions(
            spark, N_TXN, n_customers=N_CUST, n_merchants=N_MERCH
        ),
        "customers": generate_customers(spark, N_CUST),
        "merchants": generate_merchants(spark, N_MERCH),
    }
    silver = {}
    for table, df in raw.items():
        bronze = pipe.ingest_bronze(table, df)
        silver[table] = pipe.promote_silver(table, bronze)
    gold = pipe.build_gold(
        silver["transactions"], silver["customers"], silver["merchants"]
    )
    return {"pipe": pipe, "silver": silver, "gold": gold, "config": config}


def test_generator_determinism(spark):
    a = generate_transactions(spark, 100).collect()
    b = generate_transactions(spark, 100).collect()
    assert a == b  # same seed → identical rows
    c = generate_transactions(spark, 100, seed=7).collect()
    assert a != c


def test_silver_typed_and_gated(lake):
    txns = lake["silver"]["transactions"]
    assert dict(txns.dtypes)["amount"] == "decimal(18,2)"
    assert dict(txns.dtypes)["transaction_date"] == "date"
    # silver + quarantine = bronze row count
    spark = txns.sparkSession
    quarantined = 0
    try:
        quarantined = spark.read.parquet(
            lake["config"].layer_path("quarantine", "transactions")
        ).count()
    except Exception:
        pass
    assert txns.count() + quarantined == N_TXN


def test_gold_star_schema(lake):
    gold = lake["gold"]
    fact = gold["fact_transactions"]
    assert fact.filter(F.col("customer_sk").isNull()).count() == 0
    assert fact.filter(F.col("merchant_sk").isNull()).count() == 0
    # dims dense from 1
    for dim, key in [("dim_customer", "customer_sk"), ("dim_merchant", "merchant_sk")]:
        keys = [r[0] for r in gold[dim].select(key).orderBy(key).collect()]
        assert keys == list(range(1, len(keys) + 1))
    # daily metrics reconcile with the fact
    daily = gold["agg_daily_metrics"]
    assert daily.agg(F.sum("n_transactions")).collect()[0][0] == fact.count()
    # customer 360 covers every transacting customer
    assert (
        gold["agg_customer_360"].count()
        == fact.select("customer_id").distinct().count()
    )


def test_monitoring_recorded(lake):
    summary = lake["pipe"].monitor.finish()
    stage_names = {r["stage_name"] for r in summary["rows"]}
    assert {"bronze_transactions", "silver_transactions", "gold"} <= stage_names
    assert not summary["failed_stages"]


def test_fx_rates_shape(spark):
    fx = generate_exchange_rates(spark, days=10)
    assert fx.count() == 80  # 10 days × 8 currencies
    assert fx.select("rate_date").distinct().count() == 10


def test_incremental_fact_update_touches_only_batch_dates(lake, spark):
    """Day-N refresh: a one-date incremental batch must update the
    fact and daily metrics for that date only — untouched fact date
    partitions keep their exact files."""
    import os

    config = lake["config"]
    pipe = lake["pipe"]
    fact_path = config.layer_path("gold", "fact_transactions")

    # pick a date present in the fact and build a batch restating one
    # existing transaction (bigger amount) + one brand-new transaction
    silver = lake["silver"]["transactions"]
    some = silver.orderBy("transaction_id").limit(1).collect()[0]
    target_date = some["transaction_date"]
    batch = silver.filter(F.col("transaction_id") == some["transaction_id"])
    restated = batch.withColumn(
        "amount_usd", (F.col("amount_usd") * 2).cast("decimal(18,2)")
    )
    new_row = batch.withColumn(
        "transaction_id", F.concat(F.col("transaction_id"), F.lit("_NEW"))
    )
    delta = restated.unionByName(new_row)

    def part_files():
        out = {}
        for d in os.listdir(fact_path):
            if d.startswith("transaction_date=") and str(target_date) not in d:
                full = os.path.join(fact_path, d)
                out[d] = {
                    f: os.path.getmtime(os.path.join(full, f))
                    for f in os.listdir(full)
                    if f.endswith(".parquet")
                }
        return out

    untouched_before = part_files()
    before_count = spark.read.parquet(fact_path).count()

    pipe.incremental_fact_update(
        delta, lake["silver"]["customers"], lake["silver"]["merchants"]
    )

    fact = spark.read.parquet(fact_path)
    assert fact.count() == before_count + 1  # one insert, one update
    doubled = fact.filter(
        F.col("transaction_id") == some["transaction_id"]
    ).collect()[0]
    assert float(doubled["amount_usd"]) == pytest.approx(
        2 * float(some["amount_usd"])
    )
    assert part_files() == untouched_before  # other dates untouched

    # daily metrics refreshed for the touched date, others preserved
    daily = spark.read.parquet(config.layer_path("gold", "agg_daily_metrics"))
    row = daily.filter(F.col("transaction_date") == target_date).collect()[0]
    expect = fact.filter(F.col("transaction_date") == target_date).count()
    assert row["n_transactions"] == expect
    assert daily.select("transaction_date").distinct().count() == (
        fact.select("transaction_date").distinct().count()
    )


def test_incremental_restated_date_refreshes_old_aggregate(lake, spark):
    """A restated transaction whose transaction_date CHANGES must
    refresh the OLD date's aggregate too — and when the old date ends
    with zero fact rows, its stale aggregate row is DELETED rather
    than left behind (ADVICE r2 medium: MERGE updates and inserts but
    can never delete)."""
    import datetime as dt

    config = lake["config"]
    pipe = lake["pipe"]
    fact_path = config.layer_path("gold", "fact_transactions")
    agg_path = config.layer_path("gold", "agg_daily_metrics")

    fact = spark.read.parquet(fact_path)
    smallest = (
        fact.groupBy("transaction_date")
        .count()
        .orderBy("count", "transaction_date")
        .limit(1)
        .collect()[0]
    )
    old_date = smallest["transaction_date"]
    moved_ids = [
        r["transaction_id"]
        for r in fact.filter(F.col("transaction_date") == old_date)
        .select("transaction_id")
        .collect()
    ]
    assert moved_ids
    new_date = dt.date(2031, 6, 1)  # far outside the generated range
    silver = lake["silver"]["transactions"]
    batch = silver.filter(F.col("transaction_id").isin(moved_ids)).withColumn(
        "transaction_date", F.lit(new_date)
    )
    assert batch.count() == len(moved_ids)

    pipe.incremental_fact_update(
        batch, lake["silver"]["customers"], lake["silver"]["merchants"]
    )

    fact_after = spark.read.parquet(fact_path)
    assert fact_after.filter(F.col("transaction_date") == old_date).count() == 0
    assert (
        fact_after.filter(F.col("transaction_date") == new_date).count()
        == len(moved_ids)
    )
    daily = spark.read.parquet(agg_path)
    stale = daily.filter(F.col("transaction_date") == old_date).collect()
    assert stale == [], f"stale aggregate row survived: {stale}"
    row = daily.filter(F.col("transaction_date") == new_date).collect()[0]
    assert row["n_transactions"] == len(moved_ids)


def test_scd2_dimension_in_pipeline(lake, spark):
    """Pipeline-level SCD2: customer risk restatements accumulate
    history in the gold layer and point-in-time lookups resolve."""
    import datetime as dt

    pipe = lake["pipe"]
    schema = (
        "customer_id string, risk_rating string, city string, "
        "effective_ts timestamp"
    )
    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    pipe.update_dimension_scd2(
        "dim_customer_history",
        spark.createDataFrame([("C1", "LOW", "oslo", t1)], schema),
        key="customer_id", tracked_cols=["risk_rating"],
    )
    dim = pipe.update_dimension_scd2(
        "dim_customer_history",
        spark.createDataFrame([("C1", "HIGH", "oslo", t2)], schema),
        key="customer_id", tracked_cols=["risk_rating"],
    )
    # point-in-time: a March fact sees LOW, a July fact sees HIGH
    march = dt.datetime(2024, 3, 1)
    row = dim.filter(
        (F.col("effective_from") <= march)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > march))
    ).collect()
    assert len(row) == 1 and row[0]["risk_rating"] == "LOW"
    assert dim.filter("is_current").collect()[0]["risk_rating"] == "HIGH"


def test_incremental_refresh_keeps_surrogate_keys_stable(spark, tmp_path):
    """A new customer inserted between existing natural keys must NOT
    renumber them: positional 1..N rebuilds shifted every key after
    the insertion point, so fact rows from earlier runs misjoined the
    dims (review finding r6s5)."""
    import datetime

    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.config import EngineConfig
    from fintech_lakehouse_spark.pipeline import MedallionPipeline

    config = EngineConfig(env="dev", base_path=str(tmp_path / "lake"))
    pipe = MedallionPipeline(spark, config)

    def txns(ids):
        return spark.createDataFrame(
            [
                (f"T{i}", f"C{c}", "M1", 10.0, 10.0, 0.0, 10.0,
                 datetime.date(2024, 1, 1), False, "COMPLETED")
                for i, c in enumerate(ids)
            ],
            "transaction_id string, customer_id string, merchant_id string, "
            "amount double, amount_usd double, fee_amount double, "
            "net_amount double, transaction_date date, is_flagged boolean, "
            "status string",
        )

    def custs(ids):
        return spark.createDataFrame(
            [(f"C{c}", f"Name{c}") for c in ids], "customer_id string, name string"
        )

    merch = spark.createDataFrame([("M1", "Shop")], "merchant_id string, name string")

    # day 1: customers C1, C3
    pipe.incremental_fact_update(txns([1, 3]), custs([1, 3]), merch)
    dim1 = {
        r["customer_id"]: r["customer_sk"]
        for r in spark.read.parquet(
            config.layer_path("gold", "dim_customer")
        ).collect()
    }
    # day 2: C2 appears BETWEEN C1 and C3
    pipe.incremental_fact_update(txns([2]), custs([1, 2, 3]), merch)
    dim2 = {
        r["customer_id"]: r["customer_sk"]
        for r in spark.read.parquet(
            config.layer_path("gold", "dim_customer")
        ).collect()
    }
    assert dim2["C1"] == dim1["C1"] and dim2["C3"] == dim1["C3"]  # stable
    assert dim2["C2"] not in (dim1["C1"], dim1["C3"])  # new key, new sk
    # every fact row joins its dim row back to the RIGHT customer
    fact = spark.read.parquet(config.layer_path("gold", "fact_transactions"))
    dim = spark.read.parquet(config.layer_path("gold", "dim_customer"))
    joined = fact.join(dim, "customer_sk").select(
        fact["customer_id"].alias("fact_cust"), dim["customer_id"].alias("dim_cust")
    )
    assert joined.filter(F.col("fact_cust") != F.col("dim_cust")).count() == 0
    assert joined.count() == fact.count()
