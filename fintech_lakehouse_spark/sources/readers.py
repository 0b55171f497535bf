"""Batch sources (ref: src/utils/spark_utils.py:60-195, S1-S3 in SURVEY §2.1).

Schema-on-read everywhere: explicit StructType when the caller has one
(skips the inference scan), PERMISSIVE mode with a ``_corrupt_record``
column instead of fail-fast, so a bad row quarantines rather than kills
a 100 TB job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_RECORD_COLUMN = "_corrupt_record"

# The driver-generated test lake (TESTDATA.md): one parquet per table.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _with_corrupt_column(schema: StructType | None) -> StructType | None:
    """PERMISSIVE mode only captures bad rows if the schema carries the
    corrupt-record column; add it to explicit schemas transparently."""
    if schema is None:
        return None
    if CORRUPT_RECORD_COLUMN in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_RECORD_COLUMN, StringType(), True)]
    )


def read_csv_to_df(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """CSV scan (ref: src/utils/spark_utils.py:60-112)."""
    reader = (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_RECORD_COLUMN)
    )
    if schema is None:
        # Inference alone can't quarantine: the inferred schema never
        # contains the corrupt-record column, so PERMISSIVE mode turns
        # malformed rows into silent all-nulls. Infer first, then
        # re-read with the corrupt column appended — the stated
        # quarantine guarantee holds on both paths (review finding
        # r6s5; cost is the inference scan the caller already chose).
        probe = (
            spark.read.format("csv")
            .option("header", str(header).lower())
            .option("delimiter", delimiter)
            .option("inferSchema", "true")
        )
        for key, value in (options or {}).items():
            probe = probe.option(key, value)
        schema = probe.load(path).schema
    schema = _with_corrupt_column(schema)
    reader = reader.schema(schema)
    for key, value in (options or {}).items():
        reader = reader.option(key, value)
    return reader.load(path)


def read_json_to_df(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = False,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """JSON scan, JSON-Lines by default (ref: src/utils/spark_utils.py:115-157)."""
    reader = (
        spark.read.format("json")
        .option("multiLine", str(multiline).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_RECORD_COLUMN)
    )
    schema = _with_corrupt_column(schema)
    if schema is not None:
        reader = reader.schema(schema)
    for key, value in (options or {}).items():
        reader = reader.option(key, value)
    return reader.load(path)


def read_parquet_to_df(
    spark: SparkSession, path: str, options: dict[str, str] | None = None
) -> DataFrame:
    """Parquet scan — [NEW] vs the reference (SURVEY §2.1 S12); the test
    lake and any serious 100 TB deployment are columnar."""
    reader = spark.read.format("parquet")
    for key, value in (options or {}).items():
        reader = reader.option(key, value)
    return reader.load(path)


def read_orc_to_df(
    spark: SparkSession, path: str, options: dict[str, str] | None = None
) -> DataFrame:
    """ORC scan — the other columnar format Spark ships natively
    (same pushdown/pruning machinery as parquet; SURVEY §2.1 S12)."""
    reader = spark.read.format("orc")
    for key, value in (options or {}).items():
        reader = reader.option(key, value)
    return reader.load(path)


# Schema catalog for the driver test lake (r15 optimization round):
# ``spark.read.parquet`` runs schema inference on EVERY call — measured
# 245 ms per table at sf0.1 vs 37 ms with an explicit schema (the
# footer read + merge dominates the per-query fixed cost: every bench
# repeat re-paid it for each of its 1-5 tables). Production engines
# resolve table schemas from a catalog/metastore once, not per query;
# this dict is that catalog for the path-addressed test lake. It holds
# METADATA ONLY (StructType per (path, mtime)) — never rows, plans, or
# results — so the bench cold-run protocol (reset_stage_caches) is
# unaffected: every repeat still computes from the parquet inputs.
# The mtime key invalidates on rewrite (a new file/dir timestamp →
# fresh inference), matching Spark's own session-level file-index
# cache semantics.
_SCHEMA_CATALOG: dict[tuple[str, float | None], "StructType"] = {}


def reset_table_schema_catalog() -> None:
    """Drop every cached table schema (tests that rewrite a lake path
    in place within one mtime granule can force re-inference)."""
    _SCHEMA_CATALOG.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver test table (TESTDATA.md): ``{sf_dir}/{name}.parquet``.

    The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark reads only as LongType nanos (legacy.parquet.nanosAsLong) —
    convert back to a proper timestamp (microsecond precision, the data
    has no sub-microsecond components). The conf is runtime-settable,
    so set it here too: callers may hand us a session built without
    fintech_lakehouse_spark.session.get_spark (e.g. the verify
    driver's own session), which would otherwise fail the read with
    PARQUET_TYPE_ILLEGAL."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if name == "documents":
        # Perf self-heal for caller-supplied sessions (the verify
        # driver builds its own): InferFiltersFromGenerate pushes the
        # derived shingle array into scan filters — 5-8× on every
        # shingle-explode query (see session.py). Runtime-settable;
        # correctness is unaffected either way. APPEND to whatever the
        # caller already excluded — a wholesale overwrite would
        # silently re-enable their own opt-outs (review finding r6s5).
        rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
        current = spark.conf.get("spark.sql.optimizer.excludedRules", None) or ""
        rules = [r for r in current.split(",") if r]
        if rule not in rules:
            rules.append(rule)
        spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(rules))
    path = f"{sf_dir}/{name}.parquet"
    import os as _os

    try:
        mtime: float | None = _os.path.getmtime(path)
    except OSError:
        mtime = None
    key = (path, mtime)
    schema = _SCHEMA_CATALOG.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CATALOG[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # NTZ, like every other timestamp in the lake: TimestampType
            # values are rendered through the OS timezone at collect(),
            # so a non-UTC host would shift results; NTZ is
            # tz-independent end to end. The conversion is PURE
            # ARITHMETIC — epoch NTZ + a day-time interval of exact
            # decimal seconds — so it needs NO session-timezone pin
            # (the previous instant→NTZ cast read the session tz at
            # execution, which forced a session-wide UTC mutation on
            # caller-supplied sessions; review finding r6s5). The
            # micros derivation floor-divides, so pre-1970 nanos land
            # on the correct microsecond (DIV truncates toward zero).
            df = df.withColumn(
                "ts",
                F.expr(
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval("
                    "0, 0, 0, CAST(ts DIV 1000 - (CASE WHEN ts % 1000 < 0 "
                    "THEN 1 ELSE 0 END) AS DECIMAL(20, 0)) / 1000000)"
                ),
            )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """All (or selected) driver test tables as lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}
