"""CDF on PARTITIONED tables (r13 — lifts the r10 'unpartitioned
only' refusal class across read_delta_changes, the DML writers, and
the deltabridge CDF stream): cdc files mirror the data layout
(partitionBy staging, partition columns physically excluded, carried
in the cdc actions' partitionValues), and every reconstruction branch
attaches typed partition columns from the log."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    delete_from_delta_table,
    delta_snapshot,
    enable_change_data_feed,
    merge_into_delta_table,
    read_delta_changes,
    update_delta_table,
    write_delta_commit,
)


def _mk(spark, root):
    os.makedirs(root, exist_ok=True)
    write_delta_commit(  # v0
        spark,
        spark.createDataFrame(
            [(i, i % 2, f"v{i}") for i in range(8)],
            "id long, p long, v string",
        ).coalesce(1),
        root,
        partition_by=["p"],
    )
    enable_change_data_feed(spark, root)  # v1


def _changes(spark, root, frm, to=None):
    return sorted(
        (r.id, r.p, r.v, r._change_type, r._commit_version)
        for r in read_delta_changes(spark, root, frm, to).collect()
    )


def test_partitioned_append_and_cow_delete_changes(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    write_delta_commit(  # v2: insert branch (adds carry pvals)
        spark,
        spark.createDataFrame([(10, 0, "x")], "id long, p long, v string"),
        root,
        partition_by=["p"],
    )
    delete_from_delta_table(spark, root, "id = 3")  # v3: cdc branch
    got = _changes(spark, root, 2)
    assert (10, 0, "x", "insert", 2) in got
    assert (3, 1, "v3", "delete", 3) in got
    # the delete's cdc row carries the TRUE partition value (p=1)
    assert all(r[1] in (0, 1) for r in got)


def test_partitioned_cdc_files_mirror_data_layout(spark, tmp_path):
    """cdc actions carry partitionValues; the staged change files
    physically EXCLUDE the partition column (the spec's layout — a
    delta-spark reader attaches it from the action)."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    _mk(spark, root)
    update_delta_table(spark, root, "id = 2", {"v": "'Z'"})  # v2
    log = os.path.join(root, "_delta_log", f"{2:020d}.json")
    cdcs = [
        json.loads(ln)["cdc"]
        for ln in open(log)
        if ln.strip() and "cdc" in json.loads(ln)
    ]
    assert cdcs, "UPDATE with CDF must emit cdc actions"
    assert all(c["partitionValues"].get("p") is not None for c in cdcs)
    for c in cdcs:
        names = pq.read_schema(os.path.join(root, c["path"])).names
        assert "p" not in names  # physically excluded
        assert "_change_type" in names
    got = _changes(spark, root, 2)
    assert (2, 0, "v2", "update_preimage", 2) in got
    assert (2, 0, "Z", "update_postimage", 2) in got


def test_partitioned_dv_delete_and_merge_changes(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    delete_from_delta_table(  # v2: DV + cdc
        spark, root, "id = 5", use_deletion_vectors=True
    )
    merge_into_delta_table(  # v3: DV merge (update 0, insert 20 —
        # CoW on a DV-carrying table refuses by design)
        spark,
        root,
        spark.createDataFrame(
            [(0, 0, "upd"), (20, 1, "new")], "id long, p long, v string"
        ),
        ["id"],
        use_deletion_vectors=True,
    )
    got = _changes(spark, root, 2)
    assert (5, 1, "v5", "delete", 2) in got
    assert (0, 0, "upd", "update_postimage", 3) in got
    assert (20, 1, "new", "insert", 3) in got
    assert (0, 0, "v0", "update_preimage", 3) in got


def test_partitioned_dv_diff_without_cdc(spark, tmp_path):
    """The cdc-less DV commit (foreign-writer shape) on a PARTITIONED
    table: the DV-diff branch attaches the file's partition value."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    delete_from_delta_table(
        spark, root, "id in (2, 4)", use_deletion_vectors=True
    )  # v2
    jp = os.path.join(root, "_delta_log", f"{2:020d}.json")
    lines = [
        ln for ln in open(jp) if ln.strip() and "cdc" not in json.loads(ln)
    ]
    with open(jp, "w") as fh:
        fh.writelines(lines)
    shutil.rmtree(os.path.join(root, "_change_data"), ignore_errors=True)
    assert _changes(spark, root, 2) == [
        (2, 0, "v2", "delete", 2),
        (4, 0, "v4", "delete", 2),
    ]


def test_partitioned_cdf_stream_matches_batch(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltastream import (
        register_deltabridge_source,
    )

    register_deltabridge_source(spark)
    root = str(tmp_path / "t")
    _mk(spark, root)
    write_delta_commit(  # v2
        spark,
        spark.createDataFrame([(10, 1, "x")], "id long, p long, v string"),
        root,
        partition_by=["p"],
    )
    delete_from_delta_table(spark, root, "id = 1")  # v3 cdc
    batch = _changes(spark, root, 2)
    reader = (
        spark.readStream.format("deltabridge")
        .option("path", root)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .load()
    )
    q = (
        reader.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(
        (r.id, r.p, r.v, r._change_type, r._commit_version)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == batch


def test_unpartitioned_cdc_layout_unchanged(spark, tmp_path):
    """Regression guard: unpartitioned tables keep the pre-r13 cdc
    layout (all columns in-file, empty partitionValues)."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        root,
    )
    enable_change_data_feed(spark, root)
    delete_from_delta_table(spark, root, "id = 1")  # v2
    log = os.path.join(root, "_delta_log", f"{2:020d}.json")
    cdcs = [
        json.loads(ln)["cdc"]
        for ln in open(log)
        if ln.strip() and "cdc" in json.loads(ln)
    ]
    assert cdcs and all(c["partitionValues"] == {} for c in cdcs)
    names = pq.read_schema(os.path.join(root, cdcs[0]["path"])).names
    assert set(names) >= {"id", "v", "_change_type"}
    assert sorted(
        (r.id, r.v, r._change_type)
        for r in read_delta_changes(spark, root, 2).collect()
    ) == [(1, "a", "delete")]


def test_partitioned_cdf_plan_constant_in_partition_count(spark, tmp_path):
    """The r8 lesson, pinned for the change feed: a commit touching
    MANY partitions must read through ONE scan + a broadcast
    partitionValues lookup, not one union branch per partition value
    (which compiles minutes of plan at 500+ partitions)."""
    root = str(tmp_path / "t")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(i, i % 60, f"v{i}") for i in range(240)],
            "id long, p long, v string",
        ),
        root,
        partition_by=["p"],
    )
    enable_change_data_feed(spark, root)
    delete_from_delta_table(spark, root, "id % 4 = 0")  # touches all 60
    df = read_delta_changes(spark, root, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2, plan[:2000]
    got = sorted(
        (r.id, r.p) for r in df.collect() if r._change_type == "delete"
    )
    assert got == [(i, i % 60) for i in range(0, 240, 4)]


def test_id_mode_partitioned_cdf_stream(spark, tmp_path):
    """Triple combo pin: id-mode column mapping × partitioned table ×
    CDF stream — cdc files carry field-id-stamped physical columns and
    partition values ride the cdc actions; the stream resolves both."""
    from fintech_lakehouse_spark.sources.deltastream import (
        register_deltabridge_source,
    )
    from tests.test_column_mapping_ddl import _flip_to_id_mode

    register_deltabridge_source(spark)
    root = str(tmp_path / "t")
    os.makedirs(root)
    write_delta_commit(  # v0
        spark,
        spark.createDataFrame(
            [(i, i % 2, f"v{i}") for i in range(6)],
            "id long, p long, v string",
        ).coalesce(1),
        root,
        partition_by=["p"],
    )
    _flip_to_id_mode(spark, root)  # v1
    write_delta_commit(  # v2: field-id-stamped files replace the set
        spark,
        spark.createDataFrame(
            [(i, i % 2, f"v{i}") for i in range(6)],
            "id long, p long, v string",
        ).coalesce(1),
        root,
        mode="overwrite",
        partition_by=["p"],
    )
    enable_change_data_feed(spark, root)  # v3
    delete_from_delta_table(spark, root, "id = 4")  # v4: cdc
    batch = _changes(spark, root, 4)
    assert batch == [(4, 0, "v4", "delete", 4)]
    reader = (
        spark.readStream.format("deltabridge")
        .option("path", root)
        .option("readChangeFeed", "true")
        .option("startingVersion", "4")
        .load()
    )
    q = (
        reader.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(
        (r.id, r.p, r.v, r._change_type, r._commit_version)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == batch
