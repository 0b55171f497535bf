from fintech_lakehouse_spark.quality.checker import (
    DataQualityChecker,
    DQCheckResult,
    DQCheckType,
    DQReport,
    DQSeverity,
    quick_quality_check,
)

__all__ = [
    "DataQualityChecker",
    "DQCheckResult",
    "DQCheckType",
    "DQReport",
    "DQSeverity",
    "quick_quality_check",
]
