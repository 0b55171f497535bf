from fintech_lakehouse_spark.schemas.spec import (
    TABLE_SPECS,
    bronze_schema,
    silver_schema,
)

__all__ = ["TABLE_SPECS", "bronze_schema", "silver_schema"]
