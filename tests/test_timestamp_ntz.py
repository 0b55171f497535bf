"""timestampNtz table feature (r14, VERDICT r13 item 2): TIMESTAMP_NTZ
columns read / write / partition correctly through the engine writer
(`write_delta_commit`), CONVERT TO DELTA, and the deltabridge batch +
streaming paths, with the protocol feature declared on BOTH sides
(Delta PROTOCOL.md: a table with TIMESTAMP_NTZ columns must carry
`timestampNtz` in readerFeatures and writerFeatures at (3, 7)) — the
r13 blanket refusal at the reader gate is now a roundtrip.

Reference parity note: the reference (src/utils/spark_utils.py) has no
Delta-protocol surface at all; this is repo-native scope.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.sources.deltalog import (
    convert_parquet_to_delta,
    delta_snapshot,
    prune_delta_files,
    read_delta_table,
    write_delta_commit,
)

NTZ_SCHEMA = "id long, ts timestamp_ntz, v string"


def _ntz_df(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + d, h), s) for i, d, h, s in rows],
        NTZ_SCHEMA,
    )


def _protocol_of(root):
    snap_log = os.path.join(root, "_delta_log")
    protos = []
    for name in sorted(os.listdir(snap_log)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(snap_log, name)) as fh:
            for line in fh:
                a = json.loads(line)
                if "protocol" in a:
                    protos.append(a["protocol"])
    return protos[-1] if protos else None


def test_ntz_create_declares_feature_and_roundtrips(spark, tmp_path):
    root = str(tmp_path / "ntz")
    df = _ntz_df(spark, [(1, 0, 5, "a"), (2, 1, 6, "b")])
    assert write_delta_commit(spark, df, root) == 0
    proto = _protocol_of(root)
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert proto["readerFeatures"] == ["timestampNtz"]
    assert "timestampNtz" in proto["writerFeatures"]
    # legacy writer-v2 implied features enumerated per the upgrade rule
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])
    out = read_delta_table(spark, root)
    assert out.schema["ts"].dataType.typeName() == "timestamp_ntz"
    got = sorted((r["id"], r["ts"]) for r in out.collect())
    assert got == [
        (1, dt.datetime(2024, 1, 1, 5)),
        (2, dt.datetime(2024, 1, 2, 6)),
    ]
    # appends to the declared table keep working (writer gate accepts)
    write_delta_commit(
        spark, _ntz_df(spark, [(3, 2, 7, "c")]), root
    )
    assert read_delta_table(spark, root).count() == 3


def test_ntz_without_column_stays_legacy_protocol(spark, tmp_path):
    root = str(tmp_path / "plain")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    write_delta_commit(spark, df, root)
    proto = _protocol_of(root)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}


def test_ntz_nested_in_struct_triggers_feature(spark, tmp_path):
    root = str(tmp_path / "nested")
    df = spark.createDataFrame(
        [(1, (dt.datetime(2024, 3, 1, 12), "x"))],
        "id long, payload struct<at:timestamp_ntz,tag:string>",
    )
    write_delta_commit(spark, df, root)
    proto = _protocol_of(root)
    assert proto["readerFeatures"] == ["timestampNtz"]
    row = read_delta_table(spark, root).collect()[0]
    assert row["payload"]["at"] == dt.datetime(2024, 3, 1, 12)


def test_ntz_partition_column_roundtrip_and_prune(spark, tmp_path):
    root = str(tmp_path / "part")
    df = _ntz_df(
        spark, [(1, 0, 0, "a"), (2, 0, 0, "b"), (3, 4, 0, "c")]
    )
    write_delta_commit(spark, df, root, partition_by=["ts"])
    snap = delta_snapshot(spark, root)
    # the log's partitionValues carry the true (unescaped) value
    pvals = sorted({pv["ts"] for pv in snap.files.values()})
    assert pvals == ["2024-01-01 00:00:00", "2024-01-05 00:00:00"]
    out = read_delta_table(spark, root)
    assert out.schema["ts"].dataType.typeName() == "timestamp_ntz"
    got = sorted((r["id"], r["ts"]) for r in out.collect())
    assert got == [
        (1, dt.datetime(2024, 1, 1)),
        (2, dt.datetime(2024, 1, 1)),
        (3, dt.datetime(2024, 1, 5)),
    ]
    # partition pruning on the ntz column: datetime literal coerces
    kept = prune_delta_files(
        snap, [("ts", ">", dt.datetime(2024, 1, 2))]
    )
    assert len(kept) >= 1
    assert all(snap.files[r]["ts"] == "2024-01-05 00:00:00" for r in kept)


def test_ntz_data_stats_written_and_prunable(spark, tmp_path):
    root = str(tmp_path / "stats")
    write_delta_commit(
        spark,
        _ntz_df(spark, [(1, 0, 0, "a")]).repartition(1),
        root,
    )
    write_delta_commit(
        spark,
        _ntz_df(spark, [(2, 9, 0, "b")]).repartition(1),
        root,
    )
    snap = delta_snapshot(spark, root)
    stats = [
        json.loads(a["stats"]) for a in snap.adds_raw.values() if "stats" in a
    ]
    assert len(stats) == 2
    ts_mins = sorted(s["minValues"]["ts"] for s in stats)
    # ISO-8601 serialization — lexicographic == chronological
    assert ts_mins == ["2024-01-01T00:00:00", "2024-01-10T00:00:00"]
    # ISO-string literal prunes the early file on a > conjunct
    kept = prune_delta_files(snap, [("ts", ">", "2024-01-05T00:00:00")])
    assert len(kept) == 1
    assert json.loads(snap.adds_raw[kept[0]]["stats"])["minValues"][
        "ts"
    ].startswith("2024-01-10")


def test_ntz_merge_schema_upgrades_protocol_same_commit(spark, tmp_path):
    root = str(tmp_path / "merge")
    base = spark.createDataFrame([(1, "a")], "id long, v string")
    write_delta_commit(spark, base, root)
    assert _protocol_of(root) == {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }
    widened = spark.createDataFrame(
        [(2, "b", dt.datetime(2024, 6, 1, 8))],
        "id long, v string, seen_at timestamp_ntz",
    )
    v = write_delta_commit(spark, widened, root, merge_schema=True)
    # the upgrade landed in the SAME commit as the widened metaData
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{v:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh]
    protos = [a["protocol"] for a in actions if "protocol" in a]
    metas = [a["metaData"] for a in actions if "metaData" in a]
    assert len(protos) == 1 and len(metas) == 1
    assert protos[0]["minReaderVersion"] == 3
    assert "timestampNtz" in protos[0]["readerFeatures"]
    assert "timestampNtz" in protos[0]["writerFeatures"]
    assert {"appendOnly", "invariants"} <= set(protos[0]["writerFeatures"])
    out = read_delta_table(spark, root)
    assert out.schema["seen_at"].dataType.typeName() == "timestamp_ntz"
    got = sorted(
        (r["id"], r["seen_at"]) for r in out.collect()
    )
    assert got == [(1, None), (2, dt.datetime(2024, 6, 1, 8))]


def test_ntz_convert_to_delta_declares_feature(spark, tmp_path):
    root = str(tmp_path / "conv")
    _ntz_df(spark, [(1, 0, 1, "a"), (2, 1, 2, "b")]).write.parquet(root)
    convert_parquet_to_delta(spark, root)
    proto = _protocol_of(root)
    assert proto["minReaderVersion"] == 3
    assert proto["readerFeatures"] == ["timestampNtz"]
    out = read_delta_table(spark, root)
    assert out.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert out.count() == 2


def test_reader_accepts_ntz_feature_refuses_others(spark, tmp_path):
    """The r13 refusal flipped: a foreign-written table declaring
    timestampNtz reads; an undeclared feature still fails closed."""
    root = str(tmp_path / "foreign")
    _ntz_df(spark, [(5, 0, 3, "z")]).coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    part = next(
        n
        for n in os.listdir(str(tmp_path / "stage"))
        if n.endswith(".parquet")
    )
    os.makedirs(root)
    os.replace(
        os.path.join(str(tmp_path / "stage"), part),
        os.path.join(root, "f1.parquet"),
    )
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "ts", "type": "timestamp_ntz", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["timestampNtz"],
                "writerFeatures": ["timestampNtz"],
            }
        },
        {
            "metaData": {
                "id": "0" * 32,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": [],
                "configuration": {},
                "createdTime": 1700000000000,
            }
        },
        {
            "add": {
                "path": "f1.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 1700000000000,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    out = read_delta_table(spark, root)
    assert [(r["id"], r["ts"]) for r in out.collect()] == [
        (5, dt.datetime(2024, 1, 1, 3))
    ]
    # rowTracking stays refused
    bad = dict(actions[0]["protocol"])
    bad["readerFeatures"] = ["timestampNtz", "rowTracking"]
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": bad}) + "\n")
    with pytest.raises(NotImplementedError, match="rowTracking"):
        read_delta_table(spark, root)


def test_ntz_bridge_batch_and_stream_sink(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltastream import (
        register_deltabridge_source,
    )

    register_deltabridge_source(spark)
    landing = str(tmp_path / "landing")
    _ntz_df(
        spark, [(1, 0, 4, "a"), (2, 1, 5, "b")]
    ).coalesce(1).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    target = str(tmp_path / "target")
    os.makedirs(target)
    q = (
        spark.readStream.schema(schema)
        .parquet(landing)
        .writeStream.format("deltabridge")
        .option("path", target)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    proto = _protocol_of(target)
    assert proto["minReaderVersion"] == 3
    assert proto["readerFeatures"] == ["timestampNtz"]
    assert "timestampNtz" in proto["writerFeatures"]
    back = spark.read.format("deltabridge").option("path", target).load()
    assert back.schema["ts"].dataType.typeName() == "timestamp_ntz"
    got = sorted((r["id"], r["ts"]) for r in back.collect())
    assert got == [
        (1, dt.datetime(2024, 1, 1, 4)),
        (2, dt.datetime(2024, 1, 2, 5)),
    ]


def test_ntz_dml_roundtrip(spark, tmp_path):
    """DELETE / UPDATE / MERGE against an ntz-featured table go through
    the writer gate (timestampNtz is a supported writer feature) and
    preserve ntz values exactly."""
    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
        update_delta_table,
    )

    root = str(tmp_path / "dml")
    write_delta_commit(
        spark,
        _ntz_df(spark, [(1, 0, 1, "a"), (2, 1, 2, "b"), (3, 2, 3, "c")]),
        root,
    )
    delete_from_delta_table(spark, root, "id = 2")
    update_delta_table(
        spark, root, "id = 3", {"ts": "timestamp_ntz'2024-02-02 09:00:00'"}
    )
    got = sorted(
        (r["id"], r["ts"]) for r in read_delta_table(spark, root).collect()
    )
    assert got == [
        (1, dt.datetime(2024, 1, 1, 1)),
        (3, dt.datetime(2024, 2, 2, 9)),
    ]
