"""Reference-API compatibility layer: every public utility name from
the reference's ``src/utils/spark_utils.py`` / ``data_quality.py`` /
``monitoring.py``, callable with the same signatures, backed by this
engine's implementations. A user of the reference can switch imports
to ``fintech_lakehouse_spark.compat`` and run their existing pipeline
code unchanged (SURVEY goal: 'a user of the reference could switch').

Names that differ only because this engine is storage-agnostic
(delta→lake) keep the reference spelling here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fintech_lakehouse_spark.monitoring import (  # noqa: F401
    PipelineMonitor,
    check_volume_anomaly,
)
from fintech_lakehouse_spark.monitoring import (
    check_data_freshness as _freshness,
)
from fintech_lakehouse_spark.operators.dedup import deduplicate_by_key  # noqa: F401
from fintech_lakehouse_spark.operators.keys import add_dense_surrogate_key
from fintech_lakehouse_spark.operators.metadata import (  # noqa: F401
    add_ingestion_metadata,
    add_processing_metadata,
)
from fintech_lakehouse_spark.operators.standardize import (  # noqa: F401
    standardize_string_columns,
)
from fintech_lakehouse_spark.quality import (  # noqa: F401
    DataQualityChecker,
    DQCheckType,
    DQReport,
    DQSeverity,
    quick_quality_check,
)
from fintech_lakehouse_spark.session import get_spark  # noqa: F401
from fintech_lakehouse_spark.alerting import (  # noqa: F401
    Alert,
    AlertManager,
    Severity,
    send_dq_failure_alert,
    send_freshness_alert,
    send_pipeline_failure_alert,
)
from fintech_lakehouse_spark.sources.readers import (  # noqa: F401
    read_csv_to_df,
    read_json_to_df,
)
from fintech_lakehouse_spark.sources.writers import (
    optimize_lake_table,
    read_lake_table,
    register_lake_table,
    table_exists,
    upsert_lake_table,
    vacuum_lake_table,
    write_lake_table,
)


def read_delta_table(
    spark: SparkSession, path: str | None = None, table_name: str | None = None
) -> DataFrame:
    """ref: src/utils/spark_utils.py:160-195 (path XOR metastore name)."""
    if (path is None) == (table_name is None):
        raise ValueError("exactly one of path / table_name required")
    return read_lake_table(spark, path) if path else spark.table(table_name)


def write_delta_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    merge_schema: bool = True,
    optimize_write: bool = True,
) -> None:
    """ref: src/utils/spark_utils.py:203-245."""
    write_lake_table(
        df, path, mode=mode, partition_by=partition_by, merge_schema=merge_schema
    )


def register_delta_table(
    spark: SparkSession, path: str, database: str, table: str
) -> None:
    """ref: src/utils/spark_utils.py:248-282."""
    register_lake_table(spark, path, database, table)


def upsert_delta_table(
    spark: SparkSession,
    source_df: DataFrame,
    target_path: str,
    merge_keys: list[str],
    update_columns: list[str] | None = None,
) -> None:
    """ref: src/utils/spark_utils.py:285-344 (update_columns accepted
    for signature parity; the MERGE updates all columns, the
    reference's default)."""
    upsert_lake_table(spark, source_df, target_path, merge_keys)


def add_surrogate_key(
    df: DataFrame, key_column_name: str, natural_key_columns: list[str]
) -> DataFrame:
    """ref: src/utils/spark_utils.py:486-511 — dense 1..N ordered by
    the natural key, but via the parallel per-partition-offset plan
    instead of the reference's single-task global window (SURVEY §4.2)."""
    return add_dense_surrogate_key(df, key_column_name, natural_key_columns)


def optimize_delta_table(
    spark: SparkSession,
    path: str | None = None,
    table_name: str | None = None,
    z_order_columns: list[str] | None = None,
) -> bool:
    """ref: src/utils/spark_utils.py:519-555 (no-op False without Delta)."""
    return optimize_lake_table(spark, path or table_name, z_order_columns)


def vacuum_delta_table(
    spark: SparkSession, path: str, retention_hours: int = 168
) -> bool:
    """ref: src/utils/spark_utils.py:558-588."""
    return vacuum_lake_table(spark, path, retention_hours)


def _fresh_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read with a REFRESH first: external-path writes (e.g.
    the parquet-mode upsert's rewrite) leave the metastore relation
    cache pointing at deleted files — refreshByPath alone does not
    invalidate it."""
    spark.sql(f"REFRESH TABLE {name}")
    return spark.table(name)


def get_table_row_count(spark: SparkSession, database: str, table: str) -> int:
    """ref: src/utils/spark_utils.py:596-614."""
    return _fresh_table(spark, f"{database}.{table}").count()


def check_data_freshness(
    spark: SparkSession,
    table_name: str,
    timestamp_column: str,
    max_age_hours: float = 24,
) -> dict:
    """ref: src/utils/monitoring.py:317-384 (metastore-name form)."""
    return _freshness(
        _fresh_table(spark, table_name), timestamp_column, max_age_hours
    )
