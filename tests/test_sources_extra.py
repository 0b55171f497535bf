"""JSON source, metastore registration, maintenance gating, CSV→
pipeline ingestion (SURVEY §2.1 S2/S5, §2.11 T1-T3), and the
pandas-UDF escape hatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.functions.vectors import (
    cosine,
    cosine_to_query_pandas_udf,
)
from fintech_lakehouse_spark.sources.readers import load_table, read_json_to_df
from fintech_lakehouse_spark.sources.writers import (
    lake_format,
    optimize_lake_table,
    register_lake_table,
    table_exists,
    vacuum_lake_table,
    write_lake_table,
)


def test_json_lines_reader(spark, tmp_path):
    p = tmp_path / "events.jsonl"
    p.write_text(
        '{"id": 1, "v": 1.5}\n{"id": 2, "v": 2.5}\n{bad json}\n'
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [StructField("id", LongType(), True), StructField("v", DoubleType(), True)]
    )
    df = read_json_to_df(spark, str(p), schema=schema).cache()
    assert df.count() == 3
    assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert df.filter("id = 2").collect()[0]["v"] == 2.5


def test_register_and_table_exists(spark, tmp_path, sf_dir):
    path = str(tmp_path / "nation_tbl")
    write_lake_table(load_table(spark, sf_dir, "nation"), path)
    register_lake_table(spark, path, "test_db", "nation")
    assert table_exists(spark, "test_db", "nation")
    assert spark.table("test_db.nation").count() == 25
    assert not table_exists(spark, "test_db", "missing")
    spark.sql("DROP TABLE test_db.nation")
    spark.sql("DROP DATABASE test_db")


def test_maintenance_gated_without_delta(spark, tmp_path, sf_dir):
    """OPTIMIZE/VACUUM are Delta features; in parquet fallback they
    must no-op (False) instead of failing."""
    path = str(tmp_path / "maint")
    write_lake_table(load_table(spark, sf_dir, "region"), path)
    if lake_format() == "parquet":
        assert optimize_lake_table(spark, path, ["r_name"]) is False
        assert vacuum_lake_table(spark, path) is False
    else:  # pragma: no cover - delta-enabled environments
        assert optimize_lake_table(spark, path, ["r_name"]) is True


def test_csv_bronze_ingestion_roundtrip(spark, tmp_path):
    """Generator → CSV landing → PERMISSIVE bronze read with explicit
    schema → silver cast: the reference's entry-point-B flow
    (SURVEY §3.2) over actual CSV files."""
    from fintech_lakehouse_spark.datagen import generate_transactions
    from fintech_lakehouse_spark.operators.medallion import bronze_to_silver
    from fintech_lakehouse_spark.schemas import bronze_schema
    from fintech_lakehouse_spark.sources.readers import read_csv_to_df

    landing = str(tmp_path / "landing")
    generate_transactions(spark, 500, 100, 20).write.option("header", True).csv(
        landing
    )
    bronze = read_csv_to_df(
        spark, landing, schema=bronze_schema("transactions")
    )
    silver = bronze_to_silver(bronze.drop("_corrupt_record"), "transactions")
    assert silver.count() == 500
    assert silver.filter(F.col("amount").isNull()).count() == 0
    assert dict(silver.dtypes)["transaction_timestamp"] == "timestamp"


def test_pandas_udf_cosine_matches_jvm(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    query = emb.filter("vec_id = 0").collect()[0]["embedding"]
    udf_cos = cosine_to_query_pandas_udf(query)
    jvm = emb.select(
        "vec_id",
        cosine(
            F.col("embedding"), F.array(*[F.lit(float(x)) for x in query])
        ).alias("c"),
    )
    arrow = emb.select("vec_id", udf_cos("embedding").alias("c"))
    joined = jvm.alias("a").join(arrow.alias("b"), "vec_id")
    max_diff = joined.agg(
        F.max(F.abs(F.col("a.c") - F.col("b.c"))).alias("d")
    ).collect()[0]["d"]
    assert max_diff < 1e-12


def test_orc_roundtrip(spark, tmp_path, sf_dir):
    from fintech_lakehouse_spark.sources.readers import read_orc_to_df

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    orders.write.format("orc").save(path)
    back = read_orc_to_df(spark, path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)


def test_clustered_zstd_write(spark, tmp_path, sf_dir):
    """cluster_by + zstd: rows sorted on the cluster key within files,
    codec honored (file extension), and a range predicate still reads
    correct results."""
    import glob

    lineitem = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_clustered")
    write_lake_table(
        lineitem, path, cluster_by=["l_shipdate"], compression="zstd"
    )
    files = glob.glob(f"{path}/*.zstd.parquet") or glob.glob(f"{path}/*zstd*")
    assert files, "zstd codec not reflected in files"
    back = spark.read.parquet(path)
    assert back.count() == lineitem.count()
    # within-file sortedness on the cluster key
    from pyspark.sql.window import Window

    by_file = (
        back.withColumn("_f", F.input_file_name())
        .withColumn(
            "_prev",
            F.lag("l_shipdate").over(
                Window.partitionBy("_f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .filter(F.col("_prev") > F.col("l_shipdate"))
    )
    assert by_file.count() == 0
    want = lineitem.filter("l_shipdate >= '2000-01-01'").count()
    assert back.filter("l_shipdate >= '2000-01-01'").count() == want
