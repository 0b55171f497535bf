from fintech_lakehouse_spark.operators.dedup import deduplicate_by_key
from fintech_lakehouse_spark.operators.keys import (
    add_dense_surrogate_key,
    add_surrogate_key,
)
from fintech_lakehouse_spark.operators.metadata import (
    add_ingestion_metadata,
    add_processing_metadata,
)
from fintech_lakehouse_spark.operators.standardize import standardize_string_columns
from fintech_lakehouse_spark.operators.joins import asof_join, nearest_join
from fintech_lakehouse_spark.operators.graph import (
    iterate_edges,
    peel_to_kcore,
    release_checkpoint,
)

__all__ = [
    "add_dense_surrogate_key",
    "add_ingestion_metadata",
    "add_processing_metadata",
    "add_surrogate_key",
    "asof_join",
    "nearest_join",
    "deduplicate_by_key",
    "iterate_edges",
    "peel_to_kcore",
    "release_checkpoint",
    "standardize_string_columns",
]
