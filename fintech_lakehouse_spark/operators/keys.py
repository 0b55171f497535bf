"""Surrogate keys (ref: add_surrogate_key,
src/utils/spark_utils.py:486-511 / SURVEY §2.5 W2 and §4.2).

The reference uses ``row_number().over(Window.orderBy(...))`` — an
UNPARTITIONED window that collapses the whole table into one task
(Spark even logs a warning). Two scale-correct alternatives:

* ``add_surrogate_key`` — non-dense but parallel and stable-ish:
  ``monotonically_increasing_id`` (partition-id ⊕ in-partition
  counter). Right choice for facts where only uniqueness matters.
* ``add_dense_surrogate_key`` — dense 1..N like the reference, built
  from per-partition counts + a cumulative offset (the classic
  zipWithIndex shape, expressed with DataFrame ops): one narrow pass
  to count per sort-partition, tiny driver-side offset table,
  broadcast back. Cost: one range-partitioning sort shuffle — pay it
  only for dims that truly need dense keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def add_surrogate_key(df: DataFrame, key_column_name: str = "sk") -> DataFrame:
    """Parallel, unique, NON-dense 64-bit surrogate key."""
    return df.withColumn(key_column_name, F.monotonically_increasing_id())


def add_dense_surrogate_key(
    df: DataFrame,
    key_column_name: str = "sk",
    natural_key_columns: list[str] | None = None,
) -> DataFrame:
    """Dense 1..N surrogate key ordered by the natural key.

    Sort by the natural key (range shuffle), number rows within each
    partition, then add each partition's global offset (computed from
    per-partition counts — a few hundred rows on the driver, bounded
    by partition count, not data size)."""
    order_cols = natural_key_columns or df.columns
    parted = df.repartitionByRange(*[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    in_part = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    numbered = parted.withColumn("_rn", F.row_number().over(in_part))
    counts = (
        numbered.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        numbered.join(F.broadcast(counts), "_pid")
        .withColumn(key_column_name, (F.col("_offset") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )


def extend_dense_surrogate_key(
    existing: DataFrame | None,
    snapshot: DataFrame,
    key_column_name: str,
    natural_key_columns: list[str],
) -> DataFrame:
    """STABLE dense surrogate keys across refreshes: natural keys
    already present in ``existing`` keep their surrogate key; new
    natural keys get max(existing sk) + dense rank. This is the
    incremental-dimension contract a positional 1..N rebuild cannot
    give — re-running add_dense_surrogate_key on a grown snapshot
    RENUMBERS every key after an insertion point, so fact rows written
    against the old numbering silently misjoin (review finding r6s5).

    Rows in ``existing`` whose natural key is absent from the snapshot
    are kept as-is (they may anchor historical fact rows); known keys
    take their ATTRIBUTES from the snapshot (SCD1 refresh).

    Shape: one key-join of snapshot to the dim (dim-cardinality), the
    dense-rank pass only over NEW keys, and a broadcast 1-row max —
    nothing scales with the fact table."""
    if existing is None:
        return add_dense_surrogate_key(
            snapshot, key_column_name, natural_key_columns
        )
    known = existing.select(*natural_key_columns, key_column_name)
    joined = snapshot.join(F.broadcast(known), natural_key_columns, "left")
    kept = joined.filter(F.col(key_column_name).isNotNull())
    new_rows = joined.filter(F.col(key_column_name).isNull()).drop(
        key_column_name
    )
    max_sk = existing.agg(
        F.coalesce(F.max(key_column_name), F.lit(0)).alias("_max_sk")
    )
    new_keyed = (
        add_dense_surrogate_key(new_rows, "_new_rank", natural_key_columns)
        .crossJoin(F.broadcast(max_sk))
        .withColumn(
            key_column_name,
            (F.col("_max_sk") + F.col("_new_rank")).cast("long"),
        )
        .drop("_new_rank", "_max_sk")
    )
    retired = existing.join(
        snapshot.select(*natural_key_columns).distinct(),
        natural_key_columns,
        "left_anti",
    )
    cols = kept.columns
    return (
        kept.unionByName(new_keyed.select(*cols))
        .unionByName(retired.select(*cols))
    )
