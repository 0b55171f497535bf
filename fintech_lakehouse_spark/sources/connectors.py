"""External connectors (SURVEY §2.1 S12): Kafka, JDBC, Avro.

The connector JARS are absent in this offline container (same class as
delta-spark — ROUND_NOTES r6 probe), so these wrappers split into two
layers:

* **Configuration plumbing** (`kafka_stream`, `read_jdbc_table`,
  `write_jdbc_table`): builds the reader/writer with the exact options
  a cluster run needs. Pinned by mocked-session tests
  (tests/test_connectors.py) the way the Delta branches are — the
  chain executes offline, only `.load()`/`.save()` needs the jar.
* **Payload transforms** (`parse_kafka_json`, `decode_avro_column`):
  pure DataFrame logic over connector-SHAPED data (Kafka's fixed
  output schema: key/value binary + topic/partition/offset/timestamp),
  fully executable and tested offline on synthetic frames — at the
  cluster, the same function applies unchanged to the real source.

Reference basis: the reference configures streaming checkpoints
(src/config/dev.py:40, prod.py:42) but ships no connector code; Kafka
is the implied scale source (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The Kafka source's fixed output columns (Spark docs, structured
# streaming Kafka integration guide).
KAFKA_OUTPUT_COLUMNS = (
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    options: dict[str, str] | None = None,
):
    """Configured Kafka readStream (returns the loaded streaming
    DataFrame; requires the spark-sql-kafka package on the cluster).

    ``max_offsets_per_trigger`` is the backpressure bound — without it
    the first micro-batch after downtime reads the whole backlog in
    one task wave. ``fail_on_data_loss=False`` is for topics with
    aggressive retention where a restart may point at expired offsets
    (accept the gap rather than kill the query)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", subscribe)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "true" if fail_on_data_loss else "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def parse_kafka_json(df: DataFrame, schema, drop_corrupt: bool = False) -> DataFrame:
    """Kafka payload → typed columns: cast the binary ``value`` to
    string, parse JSON against ``schema`` (DDL string or StructType),
    keep the source metadata (topic/partition/offset/timestamp) for
    exactly-once bookkeeping and late-data debugging.

    PERMISSIVE semantics match the engine's file readers (SURVEY S1):
    an unparseable payload yields a row of nulls carried alongside its
    raw bytes in ``_raw_value`` — quarantine, not crash; pass
    ``drop_corrupt=True`` to filter them instead. Works identically on
    a real Kafka stream and any kafka-shaped batch frame (how the
    offline tests drive it).

    A payload field named like a Kafka metadata column (topic,
    partition, offset, _key, _raw_value, _kafka_ts) keeps its name;
    the COLLIDING metadata column is emitted as ``_kafka_<name>``
    instead — two same-named output columns would make every
    downstream F.col() an AMBIGUOUS_REFERENCE."""
    staged = df.select(
        F.col("key").cast("string").alias("_key"),
        F.col("value").cast("string").alias("_raw_value"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("_kafka_ts"),
        F.from_json(F.col("value").cast("string"), schema).alias("_data"),
    )
    payload_names = list(staged.schema["_data"].dataType.names)
    meta_cols = []
    for name in ("_key", "_raw_value", "topic", "partition", "offset", "_kafka_ts"):
        out_name = f"_kafka_{name.lstrip('_')}" if name in payload_names else name
        meta_cols.append(F.col(name).alias(out_name))
    parsed = staged.select(*meta_cols, "_data.*")
    if drop_corrupt:
        # from_json yields an all-null struct for corrupt payloads, so
        # corrupt ≡ every parsed column null while raw bytes exist (a
        # JSON object of literal nulls is indistinguishable — at 100 TB
        # that edge case belongs in a DQ rule, not the parser). The
        # null test walks the PAYLOAD schema's names, so a payload
        # field shadowing a metadata name still counts.
        raw_col = (
            "_raw_value" if "_raw_value" not in payload_names
            else "_kafka_raw_value"
        )
        all_null = F.lit(True)
        for c in payload_names:
            all_null = all_null & F.col(c).isNull()
        parsed = parsed.filter(~(all_null & F.col(raw_col).isNotNull()))
    return parsed


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC scan (requires the database's JDBC driver jar).

    Without ``partition_column`` a JDBC read is ONE task pulling the
    whole table through one connection — the classic single-reader
    bottleneck. With it, Spark issues ``num_partitions`` range-bounded
    queries in parallel; bounds only steer the split points, rows
    outside them are still read. ``fetch_size`` overrides driver
    defaults (MySQL's default streams row-by-row)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """JDBC sink. ``num_partitions`` caps concurrent connections (a
    1000-task write is a denial-of-service on the database);
    ``batch_size`` batches inserts instead of row-at-a-time.
    repartition, not coalesce: coalesce merges into the PARENT stage,
    so a 4-connection cap would also run the whole upstream
    computation on 4 tasks — the shuffle barrier keeps upstream
    parallelism intact and only narrows the write."""
    out = df.repartition(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()


def decode_avro_column(col, avro_schema_json: str):
    """``from_avro`` wrapper (requires the spark-avro package at
    runtime; the function itself ships with pyspark). Kept as the one
    Avro seam so callers import it from here and the availability
    check lives in one place."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as exc:  # pragma: no cover - pyspark always has it
        raise RuntimeError(
            "pyspark.sql.avro is unavailable in this build"
        ) from exc
    return from_avro(col, avro_schema_json)


# ---------------------------------------------------------------------------
# Pure-Python Avro binary codec (no jars): the spark-avro package is
# absent offline (same class as the Kafka jar), but the Avro BINARY
# ENCODING itself is a ~1-page spec — zigzag-varint longs, length-
# prefixed utf8 strings/bytes, little-endian IEEE doubles/floats,
# 1-byte booleans, record = field-order concatenation. Implementing it
# directly makes the payload path EXECUTABLE offline: decode_avro_python
# is an Arrow-batched mapInPandas over binary payloads, and
# encode_avro_python exists so tests can round-trip real binary Avro
# without any external library. Scope: flat records of the primitive
# types above plus nullable unions ["null", T] — the shape of every
# Kafka event payload this engine models. from_avro (the jar path)
# remains the cluster fast path; this is the functional fallback and
# the offline test oracle for it.
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _parse_flat_schema(avro_schema: dict) -> list[tuple[str, str, bool]]:
    """(name, primitive_type, nullable) per field; rejects shapes
    outside the supported flat-record subset loudly."""
    if avro_schema.get("type") != "record":
        raise ValueError("only record schemas are supported")
    fields = []
    for f in avro_schema["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            members = [m for m in t if m != "null"]
            if len(members) != 1 or len(t) != 2 or "null" not in t:
                raise ValueError(f"unsupported union {t!r} for {f['name']}")
            t, nullable = members[0], True
        if t not in ("long", "int", "string", "double", "float", "boolean", "bytes"):
            raise ValueError(f"unsupported type {t!r} for {f['name']}")
        fields.append((f["name"], t, nullable))
    return fields


def encode_avro_python(record: dict, avro_schema: dict) -> bytes:
    """One record → Avro binary body (no container header, the Kafka
    wire shape)."""
    import struct

    out = bytearray()
    for name, t, nullable in _parse_flat_schema(avro_schema):
        v = record.get(name)
        if nullable:
            if v is None:
                out += _zigzag_encode(0)  # union branch 0 = null
                continue
            out += _zigzag_encode(1)
        elif v is None:
            raise ValueError(f"null for non-nullable field {name}")
        if t in ("long", "int"):
            out += _zigzag_encode(int(v))
        elif t == "string":
            b = str(v).encode("utf-8")
            out += _zigzag_encode(len(b)) + b
        elif t == "bytes":
            out += _zigzag_encode(len(v)) + bytes(v)
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "float":
            out += struct.pack("<f", float(v))
        elif t == "boolean":
            out += b"\x01" if v else b"\x00"
    return bytes(out)


def decode_avro_record_python(payload: bytes, avro_schema: dict) -> dict:
    """Avro binary body → dict (driver/executor-side primitive)."""
    import struct

    pos = 0
    out: dict = {}
    for name, t, nullable in _parse_flat_schema(avro_schema):
        if nullable:
            branch, pos = _zigzag_decode(payload, pos)
            if branch == 0:
                out[name] = None
                continue
        if t in ("long", "int"):
            out[name], pos = _zigzag_decode(payload, pos)
        elif t in ("string", "bytes"):
            ln, pos = _zigzag_decode(payload, pos)
            raw = payload[pos : pos + ln]
            pos += ln
            out[name] = raw.decode("utf-8") if t == "string" else raw
        elif t == "double":
            out[name] = struct.unpack("<d", payload[pos : pos + 8])[0]
            pos += 8
        elif t == "float":
            out[name] = struct.unpack("<f", payload[pos : pos + 4])[0]
            pos += 4
        elif t == "boolean":
            out[name] = payload[pos] == 1
            pos += 1
    return out


def decode_avro_python(df: DataFrame, payload_col: str, avro_schema: dict) -> DataFrame:
    """Arrow-batched offline Avro decode: mapInPandas over the binary
    payload column, emitting the record fields as typed columns
    alongside every other input column. The no-jar twin of
    decode_avro_column — same flat-record subset, pure Python on the
    executors, batches crossing via Arrow."""
    import pandas as pd

    fields = _parse_flat_schema(avro_schema)
    spark_types = {
        "long": "bigint",
        "int": "bigint",
        "string": "string",
        "bytes": "binary",
        "double": "double",
        "float": "double",
        "boolean": "boolean",
    }
    carry = [c for c in df.columns if c != payload_col]
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in carry]
        + [f"`{n}` {spark_types[t]}" for n, t, _ in fields]
    )

    def decode(batches):
        none_row = {n: None for n, _, _ in fields}
        for pdf in batches:
            # a compacted Kafka topic delivers tombstones (value NULL):
            # quarantine to an all-null row like parse_kafka_json, do
            # not crash the stream on buf[0] of None
            decoded = [
                decode_avro_record_python(p, avro_schema)
                if p is not None
                else none_row
                for p in pdf[payload_col]
            ]
            dec = pd.DataFrame(decoded, columns=[n for n, _, _ in fields])
            yield pd.concat(
                [pdf[carry].reset_index(drop=True), dec], axis=1
            )

    return df.mapInPandas(decode, out_schema)
