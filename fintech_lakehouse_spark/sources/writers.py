"""Lake sinks: write / register / upsert / maintenance.

Mirrors the reference's Delta surface (src/utils/spark_utils.py:203-344
and 519-588 — S4-S6, T1-T2 in SURVEY §2.1/§2.11) but runs in two modes:

* ``delta`` when delta-spark is importable: real Delta writes, MERGE
  upsert, OPTIMIZE/ZORDER/VACUUM.
* ``parquet`` fallback (this container): plain partitioned parquet,
  upsert implemented as a unionByName + window-dedup overwrite — same
  logical result, full-rewrite cost (documented; Delta is the scale
  path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_lakehouse_spark.session import delta_available


def lake_format() -> str:
    return "delta" if delta_available() else "parquet"


def write_lake_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    merge_schema: bool = True,
    cluster_by: list[str] | None = None,
    compression: str | None = None,
    files_per_partition: int = 1,
) -> None:
    """Partitioned lake write (ref: src/utils/spark_utils.py:203-245).

    ``partition_by`` should be the dominant filter column (e.g. the
    transaction/order date) so partition pruning kicks in on read.

    ``cluster_by`` is the parquet-mode answer to Delta Z-ORDER (T1):
    range-repartition + sort-within-partitions on the filter columns
    tightens per-row-group min/max stats, so the parquet reader skips
    row groups on those predicates. One clustering shuffle at write
    time buys data skipping on every read.

    ``compression``: parquet codec (e.g. "zstd" for cold data,
    "snappy" default for hot)."""
    if cluster_by:
        df = df.repartitionByRange(*[F.col(c) for c in cluster_by])
        df = df.sortWithinPartitions(*[F.col(c) for c in cluster_by])
    elif partition_by:
        # One shuffle so output tasks hold whole partition values:
        # without this, every input task writes a file into every
        # partition dir (tasks × values small files — measured 4× wall
        # on the gold fact write). ``files_per_partition`` salts the
        # shuffle so heavy partition values still write in parallel —
        # raise it when rows-per-value is large relative to executors
        # (at 10M rows / 90 dates, 8 salts restored full parallelism).
        salt = (F.rand(seed=0) * files_per_partition).cast("int")
        df = df.repartition(*[F.col(c) for c in partition_by], salt)
    writer = df.write.format(lake_format()).mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if lake_format() == "delta":
        if merge_schema:
            writer = writer.option("mergeSchema", "true")
        writer = writer.option("optimizeWrite", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    # Invalidate cached file listings (path readers AND registered
    # tables over this location) — without this, a catalog table read
    # after an overwrite resolves to deleted files.
    df.sparkSession.catalog.refreshByPath(path)


def read_lake_table(spark: SparkSession, path: str) -> DataFrame:
    """Lake scan by path (ref: src/utils/spark_utils.py:160-195)."""
    return spark.read.format(lake_format()).load(path)


def register_lake_table(
    spark: SparkSession, path: str, database: str, table: str
) -> None:
    """Metastore registration DDL (ref: src/utils/spark_utils.py:248-282)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {database}.{table} "
        f"USING {lake_format().upper()} LOCATION '{path}'"
    )


def upsert_lake_table(
    spark: SparkSession,
    source_df: DataFrame,
    target_path: str,
    merge_keys: list[str],
    order_by: str | None = None,
) -> None:
    """MERGE upsert (ref: src/utils/spark_utils.py:285-344, S6).

    Delta mode: ``whenMatchedUpdateAll / whenNotMatchedInsertAll`` on the
    conjunctive key equality — a co-partitioned join under the hood.

    Parquet mode: read target, unionByName with source (source rows
    ranked first), keep one row per key. ``order_by`` breaks ties among
    source rows; the source-over-target preference is exact MERGE
    semantics for updates, and new keys insert. Full rewrite — fine for
    dims, wrong for a 100 TB fact (use Delta there).
    """
    try:
        existing = read_lake_table(spark, target_path)
    except Exception:
        write_lake_table(source_df, target_path, mode="overwrite")
        return

    if lake_format() == "delta":
        from delta.tables import DeltaTable

        target = DeltaTable.forPath(spark, target_path)
        cond = " AND ".join(f"target.{k} = source.{k}" for k in merge_keys)
        (
            target.alias("target")
            .merge(source_df.alias("source"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    tagged_source = source_df.withColumn("_merge_rank", F.lit(0))
    tagged_target = existing.withColumn("_merge_rank", F.lit(1))
    order_cols = [F.col("_merge_rank").asc()]
    if order_by:
        order_cols.append(F.col(order_by).desc())
    window = Window.partitionBy(*merge_keys).orderBy(*order_cols)
    merged = (
        tagged_source.unionByName(tagged_target, allowMissingColumns=True)
        .withColumn("_merge_rn", F.row_number().over(window))
        .filter(F.col("_merge_rn") == 1)
        .drop("_merge_rank", "_merge_rn")
    )
    # Parquet can't atomically overwrite a path it is reading; stage
    # through a temp dir next to the target.
    staging = target_path.rstrip("/") + "__staging"
    merged.write.format("parquet").mode("overwrite").save(staging)
    spark.read.parquet(staging).write.format("parquet").mode("overwrite").save(
        target_path
    )
    spark.catalog.refreshByPath(target_path)


def optimize_lake_table(
    spark: SparkSession, path: str, z_order_columns: list[str] | None = None
) -> bool:
    """Compaction + Z-order (ref: src/utils/spark_utils.py:519-555, T1).

    No-op (returns False) in parquet mode — data skipping / clustering
    is a Delta capability.
    """
    if lake_format() != "delta":
        return False
    zorder = f" ZORDER BY ({', '.join(z_order_columns)})" if z_order_columns else ""
    spark.sql(f"OPTIMIZE delta.`{path}`{zorder}")
    return True


def vacuum_lake_table(spark: SparkSession, path: str, retention_hours: int = 168) -> bool:
    """Unreferenced-file cleanup (ref: src/utils/spark_utils.py:558-588, T2)."""
    if lake_format() != "delta":
        return False
    spark.sql(f"VACUUM delta.`{path}` RETAIN {retention_hours} HOURS")
    return True


def table_exists(spark: SparkSession, database: str, table: str) -> bool:
    """Metastore introspection (ref: src/utils/spark_utils.py:596-650, T3)."""
    return spark.catalog.tableExists(f"{database}.{table}")


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (SURVEY §4 co-located joins): both sides
    of a recurring equi-join bucketed on the join key with the same
    bucket count join WITHOUT a shuffle — the exchange disappears from
    the plan. The write pays one clustering pass; every subsequent
    join/aggregation on the key is exchange-free. This is the batch
    answer to 'this join is the bottleneck at 100 TB'."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
