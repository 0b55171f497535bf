"""String standardization (ref: standardize_string_columns,
src/utils/spark_utils.py:398-439 / SURVEY §2.2 P3)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def standardize_string_columns(
    df: DataFrame,
    columns: list[str],
    case: str = "upper",
    trim_whitespace: bool = True,
) -> DataFrame:
    """Trim + case-normalize the named string columns; silently skips
    columns not present (reference behavior). One projection — all
    columns rewritten in a single whole-stage-codegen pass."""
    if case not in ("upper", "lower", "none"):
        raise ValueError(f"case must be upper|lower|none, got {case!r}")
    exprs = []
    requested = set(columns)
    for name in df.columns:
        if name in requested:
            c = F.col(name)
            if trim_whitespace:
                c = F.trim(c)
            if case == "upper":
                c = F.upper(c)
            elif case == "lower":
                c = F.lower(c)
            exprs.append(c.alias(name))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)
