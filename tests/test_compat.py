"""Reference-API compatibility: code written against the reference's
utility names runs unchanged against this engine (SURVEY goal)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fintech_lakehouse_spark import compat
from fintech_lakehouse_spark.sources.readers import load_table


def test_reference_pipeline_shape_runs(spark, sf_dir, tmp_path):
    """The reference's canonical flow, verbatim call shapes:
    read → metadata → standardize → dedup → DQ → write → register →
    read back → upsert → surrogate key → freshness."""
    path = str(tmp_path / "tbl")
    df = load_table(spark, sf_dir, "orders").limit(500)

    staged = compat.add_processing_metadata(compat.add_ingestion_metadata(df))
    staged = compat.standardize_string_columns(staged, ["o_orderstatus"])
    deduped = compat.deduplicate_by_key(
        staged, ["o_orderkey"], "o_orderdate", order_ascending=False
    )
    report = compat.quick_quality_check(
        deduped, "orders", pk_columns=["o_orderkey"],
        required_columns=["o_custkey"],
    )
    assert report.passed
    compat.write_delta_table(deduped, path, partition_by=None)
    compat.register_delta_table(spark, path, "compat_db", "orders")
    assert compat.get_table_row_count(spark, "compat_db", "orders") == 500

    back = compat.read_delta_table(spark, path=path)
    updates = back.limit(10).withColumn("o_totalprice", F.lit(1.0))
    compat.upsert_delta_table(spark, updates, path, merge_keys=["o_orderkey"])
    merged = compat.read_delta_table(spark, path=path)
    assert merged.count() == 500
    assert merged.filter("o_totalprice = 1.0").count() == 10

    # use the post-upsert read: the parquet-mode upsert rewrites the
    # path, so pre-upsert DataFrames point at deleted files (Delta mode
    # would keep them readable via the transaction log)
    keyed = compat.add_surrogate_key(merged, "order_sk", ["o_orderkey"])
    assert keyed.select("order_sk").distinct().count() == 500

    fresh = compat.check_data_freshness(
        spark, "compat_db.orders", "o_orderdate", max_age_hours=24
    )
    assert fresh["fresh"] is False  # 1990s data is stale

    assert compat.optimize_delta_table(spark, path=path) in (True, False)
    assert compat.vacuum_delta_table(spark, path) in (True, False)
    spark.sql("DROP TABLE compat_db.orders")
    spark.sql("DROP DATABASE compat_db")


def test_dq_checker_reference_call_shape(spark, sf_dir):
    report = (
        compat.DataQualityChecker(load_table(spark, sf_dir, "lineitem"), "lineitem")
        .check_completeness(["l_orderkey"], threshold=0.95)
        .check_uniqueness(["l_orderkey", "l_linenumber"])
        .check_values_in_set("l_returnflag", ["A", "N", "R"])
        .check_range("l_quantity", 1, 50)
        .run()
    )
    assert report.total_checks == 4
    assert {r.check_type for r in report.results} <= set(compat.DQCheckType)


def test_dq_report_field_for_field_conformance(spark):
    """Pin the full DQReport against hand-computed values (VERDICT r4
    item 7) so the compat DQ surface can't drift.

    Normative-behavior note (SURVEY §7.4 item 4): the reference stores
    pass_rate ×100 (data_quality.py:534) while comparing the 0-1
    fraction against the 0-1 threshold (:519-520) — an internal
    inconsistency. We keep the :519-520 COMPARISON as normative:
    pass_rate is the 0-1 fraction, consistent with the threshold. The
    completeness_id case below distinguishes the two conventions: at
    0.8 < 0.95 it correctly FAILS, whereas an ×100 store compared
    against the raw threshold (80 >= 0.95) would vacuously pass."""
    rows = [
        ("t1", 10.0, "USD"),
        ("t2", 20.0, "EUR"),
        ("t3", -5.0, "USD"),          # below range min
        ("t3", 30.0, "USD"),          # duplicate id
        ("t4", float("nan"), "USD"),  # NaN: completeness fail + range fail
        ("t5", 40.0, "GBP"),          # not in currency set
        ("t6", 50.0, None),           # null currency: set-check exempt
        (None, 60.0, "USD"),          # null id
        ("", 70.0, "EUR"),            # blank id
        ("t7", 80.0, "USD"),
    ]
    df = spark.createDataFrame(rows, "id string, amount double, currency string")
    report = (
        compat.DataQualityChecker(df, "txns")
        .check_completeness(["id", "amount"], threshold=0.95)
        .check_completeness(
            ["currency"], threshold=0.5, severity=compat.DQSeverity.WARNING
        )
        .check_range("amount", 0.01, 100_000)
        .check_values_in_set("currency", ["USD", "EUR"])
        .check_uniqueness(["id"])
        .run()
    )

    got = [
        (
            r.check_name,
            r.check_type,
            r.severity,
            r.passed,
            r.total_records,
            r.failed_records,
            round(r.pass_rate, 10),
        )
        for r in report.results
    ]
    C, W = compat.DQSeverity.CRITICAL, compat.DQSeverity.WARNING
    T = compat.DQCheckType
    assert got == [
        # null + blank id → 2/10 fail; 0.8 < 0.95 ⇒ FAILS (see docstring)
        ("completeness_id", T.COMPLETENESS, C, False, 10, 2, 0.8),
        # one NaN amount
        ("completeness_amount", T.COMPLETENESS, C, False, 10, 1, 0.9),
        # one null currency, threshold 0.5 ⇒ passes
        ("completeness_currency", T.COMPLETENESS, W, True, 10, 1, 0.9),
        # -5.0 below min, and NaN: Spark orders NaN greater than any
        # numeric, so NaN > max also counts out-of-range → 2 fails
        ("range_amount", T.VALIDITY, C, False, 10, 2, 0.8),
        # GBP invalid; the null currency row is exempt by contract
        ("values_in_set_currency", T.VALIDITY, W, False, 10, 1, 0.9),
        # 9 distinct ids (null and blank each their own group) of 10
        ("uniqueness_id", T.UNIQUENESS, C, False, 10, 1, 0.9),
    ]

    assert report.passed is False  # CRITICAL failures present
    assert report.total_checks == 6
    assert report.failed_checks == 5
    assert report.summary() == {
        "table": "txns",
        "passed": False,
        "total_checks": 6,
        "failed_checks": 5,
        "critical_failures": [
            "completeness_id",
            "completeness_amount",
            "range_amount",
            "uniqueness_id",
        ],
    }


def test_save_to_csv_writes_a_real_file(spark, tmp_path):
    """The reference writes a FILE at the path; Spark's csv() writes a
    directory — compat must bridge so pd.read_csv(paths[name]) works
    unchanged (review finding r6s5)."""
    import pandas as pd

    from fintech_lakehouse_spark.compat import DataGenerator

    gen = DataGenerator(spark)
    df = gen.generate_merchants(n=20)
    target = str(tmp_path / "out" / "merchants.csv")
    gen.save_to_csv(df, target)
    import os

    assert os.path.isfile(target)
    assert len(pd.read_csv(target)) == 20


def test_generator_config_date_range_drives_window(spark):
    """GeneratorConfig.start_date/end_date were accepted and silently
    ignored (review finding r6s5); the configured span must bound the
    transaction timestamps."""
    import datetime as dt

    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.compat import DataGenerator, GeneratorConfig

    cfg = GeneratorConfig(
        start_date=dt.datetime(2024, 1, 1), end_date=dt.datetime(2024, 1, 8)
    )
    txns = DataGenerator(spark, cfg).generate_transactions(n=500)
    span = txns.agg(
        F.min("transaction_timestamp").alias("lo"),
        F.max("transaction_timestamp").alias("hi"),
    ).collect()[0]
    lo = dt.datetime.fromisoformat(str(span["lo"]))
    hi = dt.datetime.fromisoformat(str(span["hi"]))
    assert (hi - lo).days <= 7


def test_generated_segments_match_validation_vocabulary(spark):
    """BusinessRules.VALID_SEGMENTS must cover what the generator
    emits — a vocabulary the data never carries fails 100% of rows
    (review finding r6s5)."""
    from fintech_lakehouse_spark.compat import DataGenerator, get_config_for_env

    segs = {
        r["segment"]
        for r in DataGenerator(spark).generate_customers(n=200).collect()
    }
    valid = set(get_config_for_env("dev").business_rules.VALID_SEGMENTS)
    assert segs <= valid and segs
