"""typeWidening table feature (r14, VERDICT r13 item 4): widened
tables READ correctly — data files written before the widening keep
their narrow parquet types and the schema'd scan up-casts them (Spark
4's parquet readers implement the feature's conversion matrix) — and
`widen_delta_column` provides the metaData-only WRITE side with the
spec's `delta.typeChanges` bookkeeping and protocol upgrade. The r13
reader-gate refusal is now a roundtrip.

Reference parity note: the reference has no Delta-protocol surface;
this is repo-native scope.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from decimal import Decimal

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    _widening_allowed,
    delta_snapshot,
    read_delta_table,
    widen_delta_column,
    write_delta_commit,
)


def _commit_actions(root, v):
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{v:020d}.json")) as fh:
        return [json.loads(line) for line in fh]


def test_widen_int_to_long_reads_old_and_new_files(spark, tmp_path):
    root = str(tmp_path / "tw")
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, k int"),
        root,
    )
    v = widen_delta_column(spark, root, "k", "long")
    snap = delta_snapshot(spark, root)
    assert snap.schema["k"].dataType.typeName() == "long"
    assert "typeWidening" in snap.protocol_raw["readerFeatures"]
    assert "typeWidening" in snap.protocol_raw["writerFeatures"]
    changes = snap.schema["k"].metadata["delta.typeChanges"]
    assert changes == [
        {"fromType": "integer", "toType": "long", "tableVersion": v}
    ]
    # append with the widened type; the old int32 file up-casts at scan
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(3, 5_000_000_000)], "id long, k long"
        ),
        root,
    )
    got = {r["id"]: r["k"] for r in read_delta_table(spark, root).collect()}
    assert got == {1: 10, 2: 20, 3: 5_000_000_000}
    # the widening commit itself was metaData-only: no file rewritten
    acts = _commit_actions(root, v)
    assert not any("add" in a or "remove" in a for a in acts)


def test_widen_float_double_and_decimal(spark, tmp_path):
    root = str(tmp_path / "fd")
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, 1.5, Decimal("3.14"))],
            "id long, x float, m decimal(5,2)",
        ),
        root,
    )
    widen_delta_column(spark, root, "x", "double")
    widen_delta_column(spark, root, "m", "decimal(12,4)")
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(2, 2.25, Decimal("12345678.9999"))],
            "id long, x double, m decimal(12,4)",
        ),
        root,
    )
    got = {
        r["id"]: (r["x"], r["m"])
        for r in read_delta_table(spark, root).collect()
    }
    assert got[1] == (1.5, Decimal("3.1400"))
    assert got[2] == (2.25, Decimal("12345678.9999"))


def test_widen_date_to_timestamp_ntz_adds_both_features(spark, tmp_path):
    root = str(tmp_path / "dn")
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, dt.date(2024, 3, 5))], "id long, d date"
        ),
        root,
    )
    widen_delta_column(spark, root, "d", "timestamp_ntz")
    snap = delta_snapshot(spark, root)
    rf = set(snap.protocol_raw["readerFeatures"])
    assert {"typeWidening", "timestampNtz"} <= rf
    got = read_delta_table(spark, root).collect()[0]
    assert got["d"] == dt.datetime(2024, 3, 5, 0, 0)


def test_widen_nested_struct_field(spark, tmp_path):
    root = str(tmp_path / "nest")
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, (7, "x"))], "id long, s struct<n:int,t:string>"
        ),
        root,
    )
    widen_delta_column(spark, root, "s.n", "long")
    snap = delta_snapshot(spark, root)
    assert (
        snap.schema["s"].dataType["n"].dataType.typeName() == "long"
    )
    row = read_delta_table(spark, root).collect()[0]
    assert row["s"]["n"] == 7


def test_widening_matrix_refusals(spark, tmp_path):
    root = str(tmp_path / "bad")
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, 10, 1.5)], "id long, k long, x double"
        ),
        root,
    )
    for col, bad in [
        ("k", "int"),          # narrowing
        ("k", "float"),        # long→float loses precision
        ("x", "float"),        # narrowing
        ("k", "string"),       # cross-family
        ("k", "decimal(10,2)"),  # long needs 20 integer digits
    ]:
        with pytest.raises(ValueError, match="not an allowed widening"):
            widen_delta_column(spark, root, col, bad)
    with pytest.raises(ValueError, match="no column"):
        widen_delta_column(spark, root, "zz", "long")


def test_widening_matrix_pure():
    from pyspark.sql.types import (
        ByteType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        TimestampNTZType,
    )

    ok = _widening_allowed
    assert ok(ByteType(), ShortType())
    assert ok(ByteType(), LongType())
    assert ok(ShortType(), IntegerType())
    assert ok(IntegerType(), LongType())
    assert ok(IntegerType(), DoubleType())
    assert ok(FloatType(), DoubleType())
    assert ok(DateType(), TimestampNTZType())
    assert ok(IntegerType(), DecimalType(10, 0))
    assert ok(LongType(), DecimalType(20, 0))
    assert ok(DecimalType(5, 2), DecimalType(10, 4))
    assert not ok(LongType(), IntegerType())
    assert not ok(DoubleType(), FloatType())
    assert not ok(LongType(), DecimalType(19, 0))
    assert not ok(DecimalType(10, 4), DecimalType(10, 2))
    assert not ok(DecimalType(5, 2), DecimalType(6, 4))  # int digits shrink
    assert not ok(TimestampNTZType(), DateType())


def test_foreign_widened_fixture_reads(spark, tmp_path):
    """A hand-built log shaped like delta-spark's typeWidening output:
    v0 int file + int schema, v1 protocol upgrade + widened metaData,
    v2 long file — replay reads both files under the widened schema."""
    root = str(tmp_path / "foreign")
    os.makedirs(root)

    def _one_file(df, rel):
        stage = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            n for n in os.listdir(stage) if n.endswith(".parquet")
        )
        os.replace(os.path.join(stage, part), os.path.join(root, rel))

    _one_file(
        spark.createDataFrame([(1, 100)], "id long, k int"), "f0.parquet"
    )
    _one_file(
        spark.createDataFrame(
            [(2, 6_000_000_000)], "id long, k long"
        ),
        "f1.parquet",
    )
    sch_int = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "k", "type": "integer", "nullable": True,
             "metadata": {}},
        ],
    }
    sch_long = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {
                "name": "k",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.typeChanges": [
                        {"fromType": "integer", "toType": "long",
                         "tableVersion": 1}
                    ]
                },
            },
        ],
    }
    meta = {
        "id": "0" * 32,
        "format": {"provider": "parquet", "options": {}},
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1700000000000,
    }
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    commits = [
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {**meta, "schemaString": json.dumps(sch_int)}},
            {"add": {"path": "f0.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 1700000000000,
                     "dataChange": True}},
        ],
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening"],
                    "writerFeatures": ["typeWidening"],
                }
            },
            {"metaData": {**meta, "schemaString": json.dumps(sch_long)}},
        ],
        [
            {"add": {"path": "f1.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 1700000001000,
                     "dataChange": True}},
        ],
    ]
    for v, actions in enumerate(commits):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
    out = read_delta_table(spark, root)
    assert out.schema["k"].dataType.typeName() == "long"
    assert sorted((r["id"], r["k"]) for r in out.collect()) == [
        (1, 100),
        (2, 6_000_000_000),
    ]
    # time travel BEFORE the widening still reads the int schema
    old = read_delta_table(spark, root, version=0)
    assert old.schema["k"].dataType.typeName() == "integer"
    assert [(r["id"], r["k"]) for r in old.collect()] == [(1, 100)]
