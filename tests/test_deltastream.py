"""deltabridge Python DataSource (sources/deltastream.py, r10): batch
and version-offset STREAMING reads of a real ``_delta_log`` table
through the Spark 4 Python DataSource API — append streams with
checkpointed resume, skipChangeCommits, the CDF stream mode, DV-aware
batch scans, and the fail-closed scope guards."""

from __future__ import annotations

import os

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    delete_from_delta_table,
    enable_change_data_feed,
    update_delta_table,
    write_delta_commit,
)
from fintech_lakehouse_spark.sources.deltastream import (
    register_deltabridge_source,
)


@pytest.fixture()
def registered(spark):
    register_deltabridge_source(spark)
    return spark


def _run_available_now(spark, reader, out, ck):
    q = (
        reader.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    return spark.read.parquet(out)


def test_batch_read_partitioned_schema_order_and_dv(registered, tmp_path):
    """Batch scan: schema derives from the log (partition column in
    its DECLARED mid-schema position), partitionValues attach typed,
    deletion vectors drop exactly their rows."""
    spark = registered
    root = str(tmp_path / "b")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, 7, "a"), (2, 8, "b"), (3, 7, "c")],
            "id long, d long, v string",
        ),
        root,
        partition_by=["d"],
    )
    df = spark.read.format("deltabridge").option("path", root).load()
    assert [f.name for f in df.schema.fields] == ["id", "d", "v"]
    assert sorted(map(tuple, df.collect())) == [
        (1, 7, "a"), (2, 8, "b"), (3, 7, "c"),
    ]
    # unpartitioned DV table
    root2 = str(tmp_path / "bdv")
    os.makedirs(root2)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        ).coalesce(1),
        root2,
    )
    delete_from_delta_table(
        spark, root2, "id % 2 = 0", use_deletion_vectors=True
    )
    df2 = spark.read.format("deltabridge").option("path", root2).load()
    assert sorted(r["id"] for r in df2.collect()) == [1, 3, 5, 7, 9]


def test_stream_version_offsets_resume(registered, tmp_path):
    """availableNow over the current log, then a restart from the SAME
    checkpoint picks up only the commits added in between — the
    version-offset exactly-once contract."""
    spark = registered
    root = str(tmp_path / "s")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        root,
    )
    write_delta_commit(
        spark,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        root,
    )
    reader = spark.readStream.format("deltabridge").option(
        "path", root
    ).load()
    got = _run_available_now(spark, reader, out, ck)
    assert sorted(r["id"] for r in got.collect()) == [1, 2]
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c")], "id long, v string"),
        root,
    )
    reader = spark.readStream.format("deltabridge").option(
        "path", root
    ).load()
    got = _run_available_now(spark, reader, out, ck)
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]


def test_stream_change_commit_refuses_unless_skipped(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "sc")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        root,
    )
    delete_from_delta_table(spark, root, "id = 1")  # change commit
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c")], "id long, v string"),
        root,
    )
    reader = spark.readStream.format("deltabridge").option(
        "path", root
    ).load()
    q = (
        reader.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="append stream"):
        q.awaitTermination(180)
    # with skipChangeCommits the delete commit is skipped wholesale
    reader = (
        spark.readStream.format("deltabridge")
        .option("path", root)
        .option("skipChangeCommits", "true")
        .load()
    )
    got = _run_available_now(
        spark, reader, str(tmp_path / "out2"), str(tmp_path / "ck2")
    )
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]


def test_stream_change_feed_mode(registered, tmp_path):
    """readChangeFeed=true streams row-level changes: cdc files for
    DML commits, synthesized inserts for appends, with the commit
    version/timestamp columns."""
    spark = registered
    root = str(tmp_path / "cf")
    os.makedirs(root)
    write_delta_commit(  # v0
        spark,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(5)], "id long, v string"
        ),
        root,
    )
    enable_change_data_feed(spark, root)  # v1
    write_delta_commit(  # v2
        spark,
        spark.createDataFrame([(10, "x")], "id long, v string"),
        root,
    )
    delete_from_delta_table(  # v3 (DV + cdc)
        spark, root, "id = 3", use_deletion_vectors=True
    )
    update_delta_table(  # v4 (DV + cdc)
        spark, root, "id = 0", {"v": "'Z'"}, use_deletion_vectors=True
    )
    reader = (
        spark.readStream.format("deltabridge")
        .option("path", root)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .load()
    )
    got = _run_available_now(
        spark, reader, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    rows = sorted(
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in got.collect()
    )
    assert rows == sorted(
        [
            (10, "x", "insert", 2),
            (3, "v3", "delete", 3),
            (0, "v0", "update_preimage", 4),
            (0, "Z", "update_postimage", 4),
        ]
    )
    assert got.select("_commit_timestamp_ms").first()[0] > 0


def test_scope_guards_fail_closed(registered, tmp_path):
    """Column-mapped tables refuse at plan time; a missing path option
    refuses."""
    import json

    spark = registered
    root = str(tmp_path / "g")
    os.makedirs(os.path.join(root, "_delta_log"))
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-1",
                },
            }
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "x",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
                "createdTime": 0,
            }
        },
    ]
    with open(
        os.path.join(root, "_delta_log", "0" * 20 + ".json"), "w"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(Exception, match="column-mapped"):
        spark.read.format("deltabridge").option("path", root).load().collect()
    with pytest.raises(Exception, match="path"):
        spark.read.format("deltabridge").load().collect()

def test_max_versions_per_trigger_paces_batches(registered, tmp_path):
    """maxVersionsPerTrigger=1 admits one commit per micro-batch under
    a processing-time trigger (with availableNow the engine snapshots
    the end offset ONCE, so a rate limit would end the run early — the
    documented trigger caveat); all rows still arrive exactly once,
    one version per batch."""
    import time

    spark = registered
    root = str(tmp_path / "mv")
    os.makedirs(root)
    for i in range(3):
        write_delta_commit(
            spark,
            spark.createDataFrame([(i, f"v{i}")], "id long, v string"),
            root,
        )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("deltabridge")
        .option("path", root)
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        got: list = []
        while time.time() < deadline:
            try:
                got = sorted(
                    r["id"] for r in spark.read.parquet(out).collect()
                )
            except Exception:
                got = []
            if got == [0, 1, 2]:
                break
            time.sleep(1)
        assert got == [0, 1, 2]
        # one version per batch: at least 3 non-empty batches ran
        nonempty = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(nonempty) >= 3
        for p in nonempty:
            assert p["numInputRows"] == 1
    finally:
        q.stop()
