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
    """A missing path option refuses at plan time."""
    spark = registered
    with pytest.raises(Exception, match="path"):
        spark.read.format("deltabridge").load().collect()


def test_id_mode_bridge_batch_read_write(registered, tmp_path):
    """r13 (VERDICT r12 item 1, bridge half): the bridge READS an
    id-mode table by resolving each file's columns via parquet footer
    field ids, and WRITES id-mode files whose footers pyarrow stamps
    from PARQUET:field_id metadata — engine and bridge agree both
    ways."""
    import pyarrow.parquet as pq

    from fintech_lakehouse_spark.sources.deltalog import (
        delta_snapshot,
        read_delta_table,
    )
    from tests.test_column_mapping_ddl import _flip_to_id_mode

    spark = registered
    root = str(tmp_path / "idb")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
        ),
        root,
    )
    _flip_to_id_mode(spark, root)
    # engine overwrite → field-id-stamped files the bridge must read
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
        ),
        root,
        mode="overwrite",
    )
    df = spark.read.format("deltabridge").option("path", root).load()
    assert [f.name for f in df.schema.fields] == ["id", "v", "d"]
    assert sorted(map(tuple, df.collect())) == [(1, "a", 7), (2, "b", 8)]
    # bridge write → footer field ids land, engine reads them back
    spark.createDataFrame(
        [(3, "c", 9)], "id long, v string, d long"
    ).write.format("deltabridge").option("path", root).mode(
        "append"
    ).save()
    assert sorted(
        map(tuple, read_delta_table(spark, root).collect())
    ) == [(1, "a", 7), (2, "b", 8), (3, "c", 9)]
    assert sorted(
        map(
            tuple,
            spark.read.format("deltabridge").option("path", root)
            .load().collect(),
        )
    ) == [(1, "a", 7), (2, "b", 8), (3, "c", 9)]
    snap = delta_snapshot(spark, root)
    newest = sorted(snap.files)[-1]
    pf = pq.ParquetFile(os.path.join(root, newest))
    assert "field_id=1" in str(pf.schema)
    assert pf.schema_arrow.names == ["col-1", "col-2", "col-3"]


def test_id_mode_bridge_stream_read(registered, tmp_path):
    """r13: the append STREAM over an id-mode table resolves footer
    field ids per file and emits logical names."""
    from tests.test_column_mapping_ddl import _flip_to_id_mode

    spark = registered
    root = str(tmp_path / "ids")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        root,
    )
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        root,
        mode="overwrite",
    )
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c")], "id long, v string"),
        root,
    )
    write_delta_commit(
        spark,
        spark.createDataFrame([(4, "d")], "id long, v string"),
        root,
    )
    reader = (
        spark.readStream.format("deltabridge")
        .option("path", root)
        # v0 pre-flip data, v1 flip, v2 overwrite (removes) — stream
        # the id-mode appends v3..v4 only
        .option("startingversion", 3)
        .load()
    )
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    got = _run_available_now(spark, reader, out, ck)
    assert sorted(map(tuple, got.collect())) == [(3, "c"), (4, "d")]

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


def test_stream_partitions_unquote_action_paths(spark, tmp_path):
    """ADVICE r10: a table written by real delta-spark URL-encodes
    special characters in add/remove/cdc action paths; the stream
    reader must unquote them like deltalog does, or the executor read
    hits FileNotFoundError. Build the log by hand with a quoted path
    and check every partition carries the DECODED file name."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fintech_lakehouse_spark.sources.deltastream import (
        DeltaBridgeStreamReader,
    )

    root = str(tmp_path / "uq")
    os.makedirs(os.path.join(root, "_delta_log"))
    fname = "part a=b.parquet"  # space and '=' both quote
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64())}),
        os.path.join(root, fname),
    )
    quoted = "part%20a%3Db.parquet"
    meta = {
        "metaData": {
            "id": "t-uq",
            "format": {"provider": "parquet"},
            "schemaString": _json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {
                            "name": "id",
                            "type": "long",
                            "nullable": True,
                            "metadata": {},
                        }
                    ],
                }
            ),
            "partitionColumns": [],
            "configuration": {},
        }
    }
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        meta,
        {
            "add": {
                "path": quoted,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(root, fname)),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(_json.dumps(a) for a in actions) + "\n")
    rdr = DeltaBridgeStreamReader(root, {})
    parts = rdr.partitions({"version": -1}, {"version": 0})
    assert [p.file_path for p in parts] == [fname]
    # and the rows actually read through the decoded path
    rows = list(
        __import__(
            "fintech_lakehouse_spark.sources.deltastream",
            fromlist=["_read_partition"],
        )._read_partition(root, parts[0], [("id", False, "id", None)])
    )
    assert sorted(rows) == [(1,), (2,)]


def test_read_partition_fails_closed_on_out_of_range_dv(spark, tmp_path):
    """ADVICE r10: a decoded DV row index >= the file's row count is a
    DV/file MISMATCH (corruption); masking it out silently returned
    the extra rows. The executor read must raise instead."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fintech_lakehouse_spark.sources.deletionvectors import (
        make_dv_descriptor,
    )
    from fintech_lakehouse_spark.sources.deltastream import (
        DeltaFilePartition,
        _read_partition,
    )

    root = str(tmp_path / "oor")
    os.makedirs(root)
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(root, "f.parquet"),
    )
    dv = make_dv_descriptor(root, [1, 99])  # 99 >= num_rows(3)
    part = DeltaFilePartition("f.parquet", _json.dumps(dv), {})
    with pytest.raises(ValueError, match="DV/file mismatch"):
        list(_read_partition(root, part, [("id", False, "id", None)]))
    # in-range DV still filters normally
    ok = make_dv_descriptor(root, [1])
    part2 = DeltaFilePartition("f.parquet", _json.dumps(ok), {})
    assert sorted(_read_partition(root, part2, [("id", False, "id", None)])) == [
        (1,),
        (3,),
    ]


def test_strip_deleted_rows_refuses_cross_encoding_collision(spark):
    """ADVICE r10: live files named 'a b' and 'a%20b' both produce the
    lookup key 'a%20b' — the basename-resolution join would duplicate
    scan rows; _strip_deleted_rows must refuse like the raw-basename
    guard does."""
    from pyspark.sql.types import StructType

    from fintech_lakehouse_spark.sources.deltalog import (
        DeltaSnapshot,
        _strip_deleted_rows,
    )

    snap = DeltaSnapshot(
        version=0,
        schema=StructType([]),
        partition_columns=[],
        files={"a b.parquet": {}, "a%20b.parquet": {}},
        deletion_vectors={"a b.parquet": {"cardinality": 1}},
    )
    with pytest.raises(NotImplementedError, match="across URI encodings"):
        _strip_deleted_rows(spark, "/nonexistent", snap, spark.range(1))


class TestDeltaBridgeWriter:
    """r11: df.write.format("deltabridge") — the WRITE half of the
    bridge through the Python DataSource API (executors stage parquet
    via pyarrow; the driver promotes + publishes the log version with
    pure-Python replay, no Spark-side helper)."""

    def test_create_append_overwrite_roundtrip(self, registered, tmp_path):
        import json as _json

        from fintech_lakehouse_spark.sources.deltalog import (
            read_delta_table,
        )

        spark = registered
        root = str(tmp_path / "w1")
        os.makedirs(root)
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "id long, v string, x double"
        )
        df.write.format("deltabridge").option("path", root).mode(
            "append"
        ).save()
        got = sorted(map(tuple, read_delta_table(spark, root).collect()))
        assert got == [(1, "a", 1.5), (2, "b", 2.5)]
        # append a second commit
        spark.createDataFrame(
            [(3, "c", 3.5)], "id long, v string, x double"
        ).write.format("deltabridge").option("path", root).mode(
            "append"
        ).save()
        assert read_delta_table(spark, root).count() == 3
        # adds carry per-file stats (data skipping works on them)
        with open(
            os.path.join(root, "_delta_log", f"{1:020d}.json")
        ) as fh:
            adds = [
                _json.loads(line)["add"]
                for line in fh
                if '"add"' in line
            ]
        assert adds and all("stats" in a for a in adds)
        # overwrite replaces the live set
        spark.createDataFrame(
            [(9, "z", 0.0)], "id long, v string, x double"
        ).write.format("deltabridge").option("path", root).mode(
            "overwrite"
        ).save()
        got = sorted(map(tuple, read_delta_table(spark, root).collect()))
        assert got == [(9, "z", 0.0)]
        # and the bridge READER agrees with the Spark-side reader
        got2 = sorted(
            map(
                tuple,
                spark.read.format("deltabridge")
                .option("path", root)
                .load()
                .collect(),
            )
        )
        assert got2 == got

    def test_writer_schema_mismatch_refused(self, registered, tmp_path):
        import pytest as _pytest

        spark = registered
        root = str(tmp_path / "w2")
        os.makedirs(root)
        spark.createDataFrame([(1, "a")], "id long, v string").write.format(
            "deltabridge"
        ).option("path", root).mode("append").save()
        with _pytest.raises(Exception, match="schema mismatch"):
            spark.createDataFrame(
                [("a", 1)], "v string, id long"
            ).write.format("deltabridge").option("path", root).mode(
                "append"
            ).save()

    def test_writer_keeps_icts_and_respects_append_only(
        self, registered, tmp_path
    ):
        import json as _json

        import pytest as _pytest

        from fintech_lakehouse_spark.sources.deltalog import (
            enable_in_commit_timestamps,
            write_delta_commit,
        )

        spark = registered
        root = str(tmp_path / "w3")
        os.makedirs(root)
        write_delta_commit(
            spark,
            spark.createDataFrame([(1,)], "id long").coalesce(1),
            root,
        )
        enable_in_commit_timestamps(spark, root)
        spark.createDataFrame([(2,)], "id long").write.format(
            "deltabridge"
        ).option("path", root).mode("append").save()
        with open(
            os.path.join(root, "_delta_log", f"{2:020d}.json")
        ) as fh:
            first = _json.loads(fh.readline())
        assert "inCommitTimestamp" in first["commitInfo"]
        # appendOnly forbids overwrite through this writer too
        from fintech_lakehouse_spark.sources.deltalog import (
            _next_version,
            _write_commit,
            delta_snapshot,
        )

        snap = delta_snapshot(spark, root)
        md = dict(snap.metadata_raw)
        conf = dict(md.get("configuration") or {})
        conf["delta.appendOnly"] = "true"
        md["configuration"] = conf
        _write_commit(
            root, _next_version(root), [{"metaData": md}],
            operation="SET TBLPROPERTIES",
        )
        with _pytest.raises(Exception, match="appendOnly"):
            spark.createDataFrame([(3,)], "id long").write.format(
                "deltabridge"
            ).option("path", root).mode("overwrite").save()

    def test_writer_validates_generated_columns(self, registered, tmp_path):
        """r13 (was a refusal through r12): the bridge VALIDATES
        provided generated-column values against the declared
        expression — consistent writes land, a mismatch raises naming
        the column (full coverage in test_bridge_stream_sink.py)."""
        import pytest as _pytest

        from fintech_lakehouse_spark.sources.deltalog import (
            read_delta_table,
            write_delta_commit,
        )

        spark = registered
        root = str(tmp_path / "w4")
        os.makedirs(root)
        write_delta_commit(
            spark,
            spark.createDataFrame(
                [(1, 2)], "id long, price long"
            ).coalesce(1),
            root,
            generated_columns_spec={"twice": "price * 2"},
        )
        spark.createDataFrame(
            [(2, 3, 6)], "id long, price long, twice long"
        ).write.format("deltabridge").option("path", root).mode(
            "append"
        ).save()
        assert sorted(
            map(tuple, read_delta_table(spark, root).collect())
        ) == [(1, 2, 4), (2, 3, 6)]
        with _pytest.raises(Exception, match="twice"):
            spark.createDataFrame(
                [(3, 4, 99)], "id long, price long, twice long"
            ).write.format("deltabridge").option("path", root).mode(
                "append"
            ).save()


def test_bridge_batch_time_travel(registered, tmp_path):
    """r13: the batch bridge supports delta-spark's versionAsOf /
    timestampAsOf read options — resolved through the no-Spark
    snapshot (timestamp → greatest commit at-or-before it)."""
    import time

    from fintech_lakehouse_spark.sources.deltalog import (
        enable_in_commit_timestamps,
    )

    spark = registered
    root = str(tmp_path / "tt")
    os.makedirs(root)
    write_delta_commit(  # v0
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), root
    )
    enable_in_commit_timestamps(spark, root)  # v1 (monotone stamps)
    time.sleep(0.05)
    write_delta_commit(  # v2
        spark, spark.createDataFrame([(2, "b")], "id long, v string"), root
    )
    from fintech_lakehouse_spark.sources.deltastream import _commit_ts_ms

    ts_v1 = _commit_ts_ms(root, 1)
    write_delta_commit(  # v3
        spark, spark.createDataFrame([(3, "c")], "id long, v string"), root
    )

    def read(**opts):
        r = spark.read.format("deltabridge").option("path", root)
        for k, v in opts.items():
            r = r.option(k, str(v))
        return sorted(x.id for x in r.load().collect())

    assert read() == [1, 2, 3]
    assert read(versionAsOf=0) == [1]
    assert read(versionAsOf=2) == [1, 2]
    # a timestamp at v1's commit resolves to v1 (rows of v0 only —
    # v1 was the ICT property flip, no data)
    assert read(timestampAsOf=ts_v1) == [1]
    with pytest.raises(Exception, match="mutually exclusive"):
        read(versionAsOf=1, timestampAsOf=ts_v1)
    with pytest.raises(Exception, match="precedes the first"):
        read(timestampAsOf=1)


def test_id_mode_bridge_read_with_deletion_vectors(registered, tmp_path):
    """r13 combo pin: id-mode footer-field-id resolution AND deletion
    vectors in the same bridge partition read — the two executor-side
    mechanisms compose."""
    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
    )
    from tests.test_column_mapping_ddl import _flip_to_id_mode

    spark = registered
    root = str(tmp_path / "iddv")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(0, "seed")], "id long, v string"),
        root,
    )
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        ).coalesce(1),
        root,
        mode="overwrite",
    )
    delete_from_delta_table(
        spark, root, "id % 3 = 0", use_deletion_vectors=True
    )
    df = spark.read.format("deltabridge").option("path", root).load()
    assert sorted(r.id for r in df.collect()) == [1, 2, 4, 5, 7, 8]
