"""Lineage metadata projections (ref: src/utils/spark_utils.py:352-390,
SURVEY §2.2 P1/P2). Non-deterministic columns — excluded from any
oracle-compared output."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_ingestion_metadata(df: DataFrame) -> DataFrame:
    """Bronze stamp: source file + ingestion time."""
    return df.withColumn("_source_file", F.input_file_name()).withColumn(
        "_ingestion_timestamp", F.current_timestamp()
    )


def add_processing_metadata(df: DataFrame) -> DataFrame:
    """Silver stamp: processing time."""
    return df.withColumn("_processing_timestamp", F.current_timestamp())
