"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``fintech_lakehouse_spark.plans`` (one registry
entry per operator family from SURVEY.md §2 / §7.6).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fintech_lakehouse_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    regional_revenue: the full star join (fact ⋈ orders ⋈ customer ⋈
    broadcast dims) + aggregation — exercises scan, broadcast join,
    shuffle join, and hash agg in one plan."""
    return QUERIES["regional_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.6."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys absent here (approximate / Spark-hash-specific
    ops) get the driver's weaker rows-only check."""
    return dict(ORACLES)
