"""Registry mapping query names → (Spark callable, optional DuckDB oracle).

The driver (``__spark_entry__.py``) compares each Spark query with its
oracle at sf0.01 by row-count + schema + order-insensitive value hash,
with columns sorted by name — so every computed column is aliased
identically on both sides, doubles are rounded to a fixed scale on both
sides, and non-deterministic columns are excluded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the driver-visible registry.

    ``oracle`` is ANSI SQL for DuckDB over the same parquet tables
    (views: region nation customer supplier part orders lineitem events
    documents embeddings). Omit it only for genuinely
    non-SQL-expressible ops (the driver then records a weaker rows-only
    check — SURVEY.md §5).
    """

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap
