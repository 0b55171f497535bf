"""Connector surface tests (SURVEY §2.1 S12). The Kafka/JDBC jars are
absent offline, so — exactly like the Delta branches
(tests/test_delta_branches.py) — the configuration plumbing is pinned
against recording doubles, while the payload transforms run for real
on connector-shaped synthetic frames."""

from unittest.mock import MagicMock

import pytest

from fintech_lakehouse_spark.sources.connectors import (
    kafka_stream,
    parse_kafka_json,
    read_jdbc_table,
    write_jdbc_table,
)


def _chained_reader():
    """A reader double whose option/format/mode calls all return
    itself, recording everything."""
    reader = MagicMock()
    for m in ("format", "option", "mode"):
        getattr(reader, m).return_value = reader
    return reader


def _options_of(reader) -> dict:
    return {args[0]: args[1] for args, _ in reader.option.call_args_list}


# ----------------------------------------------------------- config plumbing


def test_kafka_stream_options():
    spark = MagicMock()
    reader = _chained_reader()
    spark.readStream = reader
    kafka_stream(
        spark,
        bootstrap_servers="broker1:9092,broker2:9092",
        subscribe="events",
        starting_offsets="earliest",
        max_offsets_per_trigger=50_000,
        fail_on_data_loss=False,
        options={"kafka.security.protocol": "SASL_SSL"},
    )
    reader.format.assert_called_once_with("kafka")
    assert _options_of(reader) == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "50000",
        "kafka.security.protocol": "SASL_SSL",
    }
    reader.load.assert_called_once_with()


def test_jdbc_read_partitioned_options():
    spark = MagicMock()
    reader = _chained_reader()
    spark.read = reader
    read_jdbc_table(
        spark,
        url="jdbc:postgresql://db:5432/fintech",
        table="public.transactions",
        partition_column="transaction_id",
        lower_bound=1,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    reader.format.assert_called_once_with("jdbc")
    opts = _options_of(reader)
    assert opts["url"] == "jdbc:postgresql://db:5432/fintech"
    assert opts["dbtable"] == "public.transactions"
    assert opts["partitionColumn"] == "transaction_id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "1000000")
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"
    reader.load.assert_called_once_with()


def test_jdbc_read_requires_bounds_with_partition_column():
    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc_table(
            MagicMock(), "jdbc:x", "t", partition_column="id"
        )


def test_jdbc_write_caps_connections():
    df = MagicMock()
    out = df.repartition.return_value
    writer = _chained_reader()
    out.write = writer
    write_jdbc_table(
        df, "jdbc:postgresql://db/f", "t", mode="overwrite",
        batch_size=5000, num_partitions=4,
    )
    # repartition since r6s5: coalesce merged into the parent stage
    # and throttled the whole upstream computation, not just the write
    df.repartition.assert_called_once_with(4)
    writer.format.assert_called_once_with("jdbc")
    writer.mode.assert_called_once_with("overwrite")
    opts = _options_of(writer)
    assert opts["batchsize"] == "5000"
    writer.save.assert_called_once_with()


# ------------------------------------------------- payload transform (real)


def _kafka_shaped(spark, payloads):
    """A batch frame with the Kafka source's exact output schema."""
    rows = [
        (
            bytearray(b"k%d" % i),
            bytearray(p) if p is not None else None,
            "events",
            i % 3,
            100 + i,
        )
        for i, p in enumerate(payloads)
    ]
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset long",
    ).withColumn("timestamp", F.current_timestamp())


def test_parse_kafka_json_typed_and_quarantined(spark):
    """Real execution over a kafka-shaped frame: good payloads parse
    to typed columns with source metadata kept; corrupt payloads
    quarantine to null rows (and drop under drop_corrupt=True)."""
    good1 = b'{"user_id": 7, "event_type": "click", "value": 1.5}'
    good2 = b'{"user_id": 9, "event_type": "purchase", "value": 20.0}'
    bad = b"{not json at all"
    df = _kafka_shaped(spark, [good1, good2, bad])
    parsed = parse_kafka_json(
        df, "user_id long, event_type string, value double"
    )
    rows = {r["offset"]: r for r in parsed.collect()}
    assert len(rows) == 3
    assert (rows[100]["user_id"], rows[100]["event_type"]) == (7, "click")
    assert rows[101]["value"] == 20.0
    assert rows[100]["topic"] == "events"
    # corrupt payload: nulls + raw bytes preserved for quarantine
    assert rows[102]["user_id"] is None
    assert rows[102]["_raw_value"] == "{not json at all"

    kept = parse_kafka_json(
        df, "user_id long, event_type string, value double", drop_corrupt=True
    ).collect()
    assert sorted(r["offset"] for r in kept) == [100, 101]


def test_parse_kafka_json_in_streaming_pipeline(spark, tmp_path):
    """The payload transform applies UNCHANGED to a streaming source
    (the real deployment shape: kafka_stream → parse_kafka_json →
    windowed agg). A file stream of kafka-shaped parquet stands in
    for the broker, as in the rest of the streaming suite; results
    must equal the batch twin over the same closed input."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = tmp_path / "kafka_shaped"
    src.mkdir()
    payloads = [
        (b"k1", b'{"user_id": 1, "event_type": "click", "value": 2.0}'),
        (b"k2", b'{"user_id": 1, "event_type": "click", "value": 3.0}'),
        (b"k3", b'{"user_id": 2, "event_type": "purchase", "value": 5.0}'),
        (b"k4", b"corrupt {"),
    ]
    pd.DataFrame(
        {
            "key": [k for k, _ in payloads],
            "value": [v for _, v in payloads],
            "topic": ["events"] * 4,
            "partition": [0, 1, 0, 1],
            "offset": list(range(4)),
            "timestamp": pd.to_datetime(["2024-01-01 00:00:00"] * 4),
        }
    ).to_parquet(src / "b0.parquet", index=False)

    schema = "user_id long, event_type string, value double"
    stream = spark.readStream.schema(
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp"
    ).parquet(str(src))
    counts = (
        parse_kafka_json(stream, schema, drop_corrupt=True)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    query = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("kafka_parsed")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {
        r["user_id"]: (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM kafka_parsed").collect()
    }
    assert got == {1: (2, 5.0), 2: (1, 5.0)}
    # batch twin over the same files agrees
    batch = (
        parse_kafka_json(
            spark.read.parquet(str(src)), schema, drop_corrupt=True
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    )
    assert {r["user_id"]: (r["n"], r["total"]) for r in batch} == got


def test_decode_avro_column_offline_boundary(spark):
    """The Avro seam offline: Column construction succeeds (the
    function ships with pyspark), execution raises Spark's documented
    AVRO_NOT_LOADED error because the spark-avro jar is absent — the
    exact boundary a cluster run crosses by adding the package."""
    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.sources.connectors import decode_avro_column

    col = decode_avro_column(
        F.col("v"),
        '{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}',
    )
    base = spark.createDataFrame([(bytearray(b"xx"),)], "v binary")
    # the gate fires at ANALYSIS (select), not execution
    with pytest.raises(Exception, match="AVRO_NOT_LOADED|Avro"):
        base.select(col.alias("d")).collect()


def test_streaming_ingest_end_to_end(spark, tmp_path):
    """The full streaming ingest a deployment runs, composed from the
    engine's pieces: kafka-shaped source → parse_kafka_json → per-batch
    DQ split (DataQualityChecker) → invalid rows to quarantine with
    failure reasons, valid rows through the CDF-producing upsert sink.
    Closed input ⇒ exact expectations on the target, the quarantine,
    AND the changelog."""
    import pandas as pd
    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.quality.checker import DataQualityChecker
    from fintech_lakehouse_spark.streaming import foreach_batch_cdf

    src = tmp_path / "stream"
    src.mkdir()
    payloads = [
        b'{"user_id": 1, "tier": "gold", "v": 1}',
        b'{"user_id": 2, "tier": "bronze", "v": 1}',
        b'{"user_id": 3, "tier": "PLATINUM-INVALID", "v": 1}',  # enum fail
        b"corrupt {",                                           # parse fail
        b'{"user_id": 1, "tier": "silver", "v": 2}',            # update u1
    ]
    pd.DataFrame(
        {
            "key": [b"k%d" % i for i in range(len(payloads))],
            "value": payloads,
            "topic": ["tiers"] * len(payloads),
            "partition": [0] * len(payloads),
            "offset": list(range(len(payloads))),
            "timestamp": pd.to_datetime(["2024-01-01"] * len(payloads)),
        }
    ).to_parquet(  # micro-precision: NANOS would hit PARQUET_TYPE_ILLEGAL
        src / "b0.parquet", index=False, coerce_timestamps="us"
    )

    target = str(tmp_path / "tiers")
    changelog = str(tmp_path / "tiers_cdf")
    quarantine = str(tmp_path / "quarantine")
    cdf_sink = foreach_batch_cdf(target, changelog, key="user_id", order_by="v")

    def ingest(batch_df, batch_id):
        parsed = parse_kafka_json(
            batch_df, "user_id long, tier string, v long"
        ).select("user_id", "tier", "v", "_raw_value")
        checker = (
            DataQualityChecker(parsed, "tiers")
            .check_completeness(["user_id"])
            .check_values_in_set("tier", ["gold", "silver", "bronze"])
        )
        valid, invalid = checker.get_valid_invalid_dfs()
        if not invalid.isEmpty():
            invalid.write.mode("append").parquet(quarantine)
        cdf_sink(valid.select("user_id", "tier", "v"), batch_id)

    stream = spark.readStream.schema(
        "key binary, value binary, topic string, partition long, "
        "offset long, timestamp timestamp"
    ).parquet(str(src))
    query = (
        stream.writeStream.foreachBatch(ingest)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    # target: valid rows merged, u1 collapsed to its latest version
    table = {
        r["user_id"]: (r["tier"], r["v"])
        for r in spark.read.parquet(target).collect()
    }
    assert table == {1: ("silver", 2), 2: ("bronze", 1)}

    # quarantine: the enum failure AND the corrupt payload, with reasons
    q = spark.read.parquet(quarantine).collect()
    by_user = {r["user_id"]: r for r in q}
    assert set(by_user) == {3, None}
    assert any("TIER" in f for f in by_user[3]["_validation_failures"])
    assert by_user[None]["_raw_value"] == "corrupt {"

    # changelog: one batch, u1's two versions collapsed intra-batch by
    # order_by="v" => exactly two insert rows, u1 already at (silver, 2)
    cdf = spark.read.parquet(changelog).collect()
    assert {(r["user_id"], r["tier"], r["_change_type"]) for r in cdf} == {
        (1, "silver", "insert"), (2, "bronze", "insert"),
    }


AVRO_SCHEMA = {
    "type": "record",
    "name": "Txn",
    "fields": [
        {"name": "txn_id", "type": "long"},
        {"name": "account", "type": "string"},
        {"name": "amount", "type": "double"},
        {"name": "approved", "type": "boolean"},
        {"name": "memo", "type": ["null", "string"]},
    ],
}


def test_avro_python_codec_roundtrips():
    """The no-jar Avro codec: encode → decode is identity over the
    flat-record subset, including zigzag edge values and null unions."""
    from fintech_lakehouse_spark.sources.connectors import (
        decode_avro_record_python,
        encode_avro_python,
    )

    records = [
        {"txn_id": 0, "account": "a", "amount": 1.5, "approved": True, "memo": "hi"},
        {"txn_id": -1, "account": "", "amount": -0.0, "approved": False, "memo": None},
        {"txn_id": 2**62, "account": "ünïcode", "amount": 3.14159,
         "approved": True, "memo": None},
        {"txn_id": -(2**62), "account": "x" * 300, "amount": float("inf"),
         "approved": False, "memo": "m"},
    ]
    for r in records:
        assert decode_avro_record_python(
            encode_avro_python(r, AVRO_SCHEMA), AVRO_SCHEMA
        ) == r


def test_avro_python_codec_rejects_unsupported():
    from fintech_lakehouse_spark.sources.connectors import encode_avro_python

    bad = {"type": "record", "name": "X",
           "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}]}
    with pytest.raises(ValueError):
        encode_avro_python({"m": {}}, bad)


def test_decode_avro_python_dataframe(spark):
    """Arrow-batched decode over a kafka-shaped frame: every payload
    decodes to typed columns next to the carried source metadata."""
    from fintech_lakehouse_spark.sources.connectors import (
        decode_avro_python,
        encode_avro_python,
    )

    rows = [
        (i, encode_avro_python(
            {"txn_id": i, "account": f"acct{i}", "amount": i * 2.5,
             "approved": i % 2 == 0, "memo": None if i % 3 else f"m{i}"},
            AVRO_SCHEMA,
        ))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "offset long, value binary")
    out = decode_avro_python(df, "value", AVRO_SCHEMA)
    assert out.columns == ["offset", "txn_id", "account", "amount", "approved", "memo"]
    got = {r["txn_id"]: r for r in out.collect()}
    assert len(got) == 50
    for i in (0, 7, 49):
        r = got[i]
        assert r["offset"] == i and r["account"] == f"acct{i}"
        assert r["amount"] == i * 2.5 and r["approved"] == (i % 2 == 0)
        assert r["memo"] == (None if i % 3 else f"m{i}")


def test_kafka_payload_field_shadowing_metadata(spark):
    """A payload field named 'partition' must keep its name while the
    Kafka metadata column is emitted as _kafka_partition — two
    same-named output columns made every downstream reference an
    AMBIGUOUS_REFERENCE (review finding r6s5)."""
    import datetime as dt

    from fintech_lakehouse_spark.sources.connectors import parse_kafka_json

    kafkaish = spark.createDataFrame(
        [
            (b"k1", b'{"partition": 7, "amount": 1.5}', "t", 0, 0,
             dt.datetime(2024, 1, 1)),
            (b"k2", b"corrupt", "t", 0, 1, dt.datetime(2024, 1, 1)),
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    out = parse_kafka_json(kafkaish, "partition int, amount double")
    assert out.columns.count("partition") == 1
    assert "_kafka_partition" in out.columns
    rows = {r["_key"]: r for r in out.collect()}
    assert rows["k1"]["partition"] == 7          # payload field
    assert rows["k1"]["_kafka_partition"] == 0   # kafka metadata
    # drop_corrupt still works with the shadowed field counted
    kept = parse_kafka_json(
        kafkaish, "partition int, amount double", drop_corrupt=True
    ).collect()
    assert len(kept) == 1


def test_avro_decode_null_payload_quarantines(spark):
    """A Kafka tombstone (value NULL) must decode to an all-null row,
    not crash the stream on buf[0] of None (review finding r6s5)."""
    from fintech_lakehouse_spark.sources.connectors import (
        decode_avro_python,
        encode_avro_python,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "x", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    good = encode_avro_python({"x": 5, "s": "hi"}, schema)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, None)], "id long, payload binary"
    )
    rows = {r["id"]: r for r in decode_avro_python(df, "payload", schema).collect()}
    assert rows[1]["x"] == 5 and rows[1]["s"] == "hi"
    assert rows[2]["x"] is None and rows[2]["s"] is None
