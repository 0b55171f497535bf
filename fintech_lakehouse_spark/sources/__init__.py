from fintech_lakehouse_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv_to_df,
    read_json_to_df,
    read_parquet_to_df,
)
from fintech_lakehouse_spark.sources.writers import (
    read_lake_table,
    upsert_lake_table,
    write_lake_table,
)
from fintech_lakehouse_spark.sources.deltalog import (
    checkpoint_delta_table,
    delete_from_delta_table,
    expire_delta_log,
    delta_snapshot,
    optimize_delta_table,
    read_delta_table,
    update_delta_table,
    vacuum_delta_table,
    write_delta_commit,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv_to_df",
    "read_json_to_df",
    "read_parquet_to_df",
    "read_lake_table",
    "upsert_lake_table",
    "write_lake_table",
    "delta_snapshot",
    "checkpoint_delta_table",
    "expire_delta_log",
    "read_delta_table",
    "write_delta_commit",
    "delete_from_delta_table",
    "update_delta_table",
    "optimize_delta_table",
    "vacuum_delta_table",
]
