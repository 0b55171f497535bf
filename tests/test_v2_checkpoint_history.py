"""Round-12 carried tasks: V2-checkpoint WRITE (manifest json +
parquet sidecars + ``_last_checkpoint``), the no-Spark v2 replay in
the deltabridge planner, ``describe_delta_history``, and the pyarrow
map-normalization fix for checkpoint replay of configured tables."""

from __future__ import annotations

import json
import os

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    checkpoint_delta_table,
    checkpoint_delta_table_v2,
    delete_from_delta_table,
    delta_snapshot,
    describe_delta_history,
    enable_change_data_feed,
    enable_in_commit_timestamps,
    enable_v2_checkpoints,
    expire_delta_log,
    optimize_delta_table,
    read_delta_table,
    shallow_clone_delta_table,
    write_delta_commit,
)
from fintech_lakehouse_spark.sources.deltastream import (
    _pure_snapshot,
    register_deltabridge_source,
)


def _mk(spark, root, partition_by=None):
    os.makedirs(root, exist_ok=True)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8), (3, "c", 7)],
            "id long, v string, d long",
        ),
        root,
        partition_by=partition_by,
    )


def test_v2_checkpoint_write_expire_replay_both_readers(spark, tmp_path):
    """The VERDICT done-criteria: write → expire → replay through the
    Spark reader AND the no-Spark bridge planner."""
    root = str(tmp_path / "t")
    _mk(spark, root, partition_by=["d"])
    write_delta_commit(
        spark,
        spark.createDataFrame([(4, "d", 9)], "id long, v string, d long"),
        root,
        partition_by=["d"],
    )
    enable_v2_checkpoints(spark, root)
    v = checkpoint_delta_table_v2(spark, root, sidecars=2)
    log = os.path.join(root, "_delta_log")
    manifests = [
        n for n in os.listdir(log)
        if ".checkpoint." in n and n.endswith(".json")
        and len(n.split(".")) == 4
    ]
    assert len(manifests) == 1
    sidecars = os.listdir(os.path.join(log, "_sidecars"))
    assert len(sidecars) == 2
    hint = json.load(open(os.path.join(log, "_last_checkpoint")))
    assert hint["version"] == v and hint["checkpointPolicy"] == "v2"
    deleted = expire_delta_log(spark, root)
    assert deleted  # every JSON <= v gone
    # Spark-side replay
    out = read_delta_table(spark, root)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 4]
    # no-Spark planner replay
    snap = _pure_snapshot(root)
    assert snap["partition_columns"] == ["d"]
    assert len(snap["files"]) == len(delta_snapshot(spark, root).files)
    # and the bridge batch reader end-to-end
    register_deltabridge_source(spark)
    back = spark.read.format("deltabridge").option("path", root).load()
    assert sorted(r["id"] for r in back.collect()) == [1, 2, 3, 4]


def test_v2_checkpoint_requires_enablement(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    with pytest.raises(ValueError, match="enable_v2_checkpoints"):
        checkpoint_delta_table_v2(spark, root)


def test_enable_v2_upgrades_protocol_both_sides(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_v2_checkpoints(spark, root)
    snap = delta_snapshot(spark, root)
    proto = snap.protocol_raw
    assert proto["minReaderVersion"] == 3
    assert "v2Checkpoint" in proto["readerFeatures"]
    assert proto["minWriterVersion"] == 7
    assert "v2Checkpoint" in proto["writerFeatures"]
    # legacy-implied writer features survive the upgrade
    assert "appendOnly" in proto["writerFeatures"]
    # idempotent
    assert enable_v2_checkpoints(spark, root) == snap.version


def test_v2_checkpoint_missing_sidecar_fails_closed(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_v2_checkpoints(spark, root)
    checkpoint_delta_table_v2(spark, root)
    log = os.path.join(root, "_delta_log")
    side = os.path.join(log, "_sidecars")
    for n in os.listdir(side):
        os.remove(os.path.join(side, n))
    expire_delta_log(spark, root)
    with pytest.raises(ValueError, match="sidecar"):
        _pure_snapshot(root)
    with pytest.raises(ValueError, match="sidecar"):
        read_delta_table(spark, root).collect()


def test_pure_snapshot_reads_configured_table_checkpoint(spark, tmp_path):
    """r12 latent-bug fix: a CLASSIC checkpoint of a table with a
    non-empty configuration map (CDF enabled) replays through the
    no-Spark planner (pyarrow maps arrive as tuple lists)."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_change_data_feed(spark, root)
    checkpoint_delta_table(spark, root)
    expire_delta_log(spark, root)
    snap = _pure_snapshot(root)
    conf = snap["metadata_raw"]["configuration"]
    assert isinstance(conf, dict)
    assert conf["delta.enableChangeDataFeed"] == "true"
    assert len(snap["files"]) == 1 or len(snap["files"]) >= 1


def test_ict_survives_v2_checkpoint_expiry(spark, tmp_path):
    """The ADVICE-r11 ICT floor also resolves through a V2 manifest
    (json branch of _checkpoint_metadata_noscan)."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_in_commit_timestamps(spark, root)
    enable_v2_checkpoints(spark, root)
    checkpoint_delta_table_v2(spark, root)
    expire_delta_log(spark, root)
    v = write_delta_commit(
        spark,
        spark.createDataFrame([(9, "z", 1)], "id long, v string, d long"),
        root,
    )
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{v:020d}.json")) as fh:
        first = json.loads(fh.readline())
    assert first["commitInfo"].get("inCommitTimestamp") is not None


def test_describe_history_mixed_operations(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(4, "d", 9)], "id long, v string, d long"),
        root,
    )
    delete_from_delta_table(spark, root, "id = 1")
    optimize_delta_table(spark, root, target_files=1)
    dst = str(tmp_path / "clone")
    shallow_clone_delta_table(spark, root, dst)
    hist = describe_delta_history(spark, root)
    rows = hist.collect()
    ops = [r["operation"] for r in rows]
    assert ops == ["OPTIMIZE", "DELETE", "WRITE", "WRITE"]
    assert [r["version"] for r in rows] == [3, 2, 1, 0]
    # operationParameters carry the DML payloads
    by_op = {r["operation"]: r for r in rows}
    assert by_op["DELETE"]["operationParameters"]["predicate"] == "id = 1"
    assert by_op["WRITE"]["operationParameters"]["mode"] == "append"
    assert by_op["OPTIMIZE"]["operationParameters"]["targetFiles"] == "1"
    # timestamps are non-increasing newest-first
    ts = [r["timestamp"] for r in rows]
    assert all(a >= b for a, b in zip(ts, ts[1:]))
    # the clone's own history starts with its CLONE commit
    chist = describe_delta_history(spark, dst).collect()
    assert chist[-1]["operation"] == "CLONE"
    assert chist[-1]["operationParameters"]["sourceVersion"] == "3"
    # limit keeps the newest N
    assert describe_delta_history(spark, root, limit=2).count() == 2


def test_time_travel_error_cites_history(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    with pytest.raises(ValueError, match="describe_delta_history"):
        delta_snapshot(spark, root, version=99)
