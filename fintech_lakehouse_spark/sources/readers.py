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
    schema = _with_corrupt_column(schema)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
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
        # The engine's time semantics are UTC (session.py); pin it here
        # too so the nanos→timestamp conversion and window alignment
        # are correct even on caller-supplied sessions.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "documents":
        # Perf self-heal for caller-supplied sessions (the verify
        # driver builds its own): InferFiltersFromGenerate pushes the
        # derived shingle array into scan filters — 5-8× on every
        # shingle-explode query (see session.py). Runtime-settable;
        # correctness is unaffected either way.
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # NTZ, like every other timestamp in the lake: TimestampType
            # values are rendered through the OS timezone at collect(),
            # so a non-UTC host would shift results; NTZ is
            # tz-independent end to end. (The TIMESTAMP→NTZ cast uses
            # the session tz, pinned to UTC above, so the wall time is
            # exactly the stored UTC instant.)
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """All (or selected) driver test tables as lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}
