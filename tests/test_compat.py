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
