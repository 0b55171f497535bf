from fintech_lakehouse_spark.functions import text, vectors  # noqa: F401

__all__ = ["text", "vectors"]
