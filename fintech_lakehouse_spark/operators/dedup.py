"""Keyed deduplication (ref: deduplicate_by_key,
src/utils/spark_utils.py:442-483 / SURVEY §2.5 W1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def deduplicate_by_key(
    df: DataFrame,
    key_columns: list[str],
    order_by_column: str,
    order_ascending: bool = False,
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Keep one row per key: latest (default) or first by
    ``order_by_column``.

    row_number over a window PARTITIONED by the key — each key group
    dedups independently in its shuffle partition, so the operator
    scales with partition count (never the single-task global window).
    ``tie_breakers`` make the survivor deterministic when order values
    collide (the reference leaves ties arbitrary)."""
    order_col = (
        F.col(order_by_column).asc()
        if order_ascending
        else F.col(order_by_column).desc()
    )
    ordering = [order_col] + [F.col(c).asc() for c in (tie_breakers or [])]
    window = Window.partitionBy(*key_columns).orderBy(*ordering)
    # collision-safe temp name: a caller whose frame already carries
    # '_row_num' (an upstream window step) must not have it clobbered
    # and dropped (review finding r6s5)
    rn = "_row_num"
    while rn in df.columns:
        rn = "_" + rn
    return (
        df.withColumn(rn, F.row_number().over(window))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )
