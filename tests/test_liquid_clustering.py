"""Liquid clustering + vacuumProtocolCheck (r14 — two more rows of
the modern Delta feature matrix, after r13's convert/reorg and r14's
timestampNtz/rowTracking/typeWidening): the ``clustering`` writer
feature stores its column set in the ``delta.clustering`` metadata
domain and OPTIMIZE picks it up automatically; ``vacuumProtocolCheck``
pins that VACUUM validates the protocol before deleting anything."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    CLUSTERING_DOMAIN,
    checkpoint_delta_table,
    clustering_columns,
    delta_snapshot,
    enable_liquid_clustering,
    expire_delta_log,
    optimize_delta_table,
    read_delta_table,
    vacuum_delta_table,
    write_delta_commit,
)


def _mk(spark, tmp_path, n=64):
    root = str(tmp_path / "lc")
    rng = np.random.default_rng(5)
    xs = rng.permutation(n)
    ys = rng.permutation(n)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(int(x), int(y), f"r{x}-{y}") for x, y in zip(xs, ys)],
            "x long, y long, v string",
        ).repartition(4),
        root,
    )
    return root


def test_enable_records_domain_and_features(spark, tmp_path):
    root = _mk(spark, tmp_path)
    v = enable_liquid_clustering(spark, root, ["x", "y"])
    snap = delta_snapshot(spark, root)
    feats = set(snap.protocol_raw["writerFeatures"])
    assert {"clustering", "domainMetadata"} <= feats
    assert snap.protocol_raw["minWriterVersion"] == 7
    assert clustering_columns(snap.domain_metadata) == ["x", "y"]
    cfg = json.loads(snap.domain_metadata[CLUSTERING_DOMAIN])
    assert cfg["clusteringColumns"] == [["x"], ["y"]]
    # idempotent on the same column set
    assert enable_liquid_clustering(spark, root, ["x", "y"]) == v
    # re-clustering on a different set commits a new domain
    enable_liquid_clustering(spark, root, ["y"])
    assert clustering_columns(
        delta_snapshot(spark, root).domain_metadata
    ) == ["y"]


def test_enable_refusals(spark, tmp_path):
    root = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown columns"):
        enable_liquid_clustering(spark, root, ["zz"])
    proot = str(tmp_path / "part")
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, "a", "p")], "x long, v string, p string"),
        proot,
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="partitioned"):
        enable_liquid_clustering(spark, proot, ["x"])


def test_optimize_clusters_on_domain_columns(spark, tmp_path):
    """An un-arg'd OPTIMIZE on a clustered table Morton-clusters on
    the domain's columns: each output file covers a compact (x, y)
    region instead of a random spread — pinned by per-file bounding-box
    area being far below the random layout's."""
    root = _mk(spark, tmp_path, n=64)
    enable_liquid_clustering(spark, root, ["x", "y"])
    before = sorted(
        map(tuple, read_delta_table(spark, root).collect())
    )
    optimize_delta_table(spark, root, target_files=4)
    after = read_delta_table(spark, root)
    assert sorted(map(tuple, after.collect())) == before
    snap = delta_snapshot(spark, root)
    import pyarrow.parquet as pq

    areas = []
    for rel in snap.files:
        t = pq.read_table(os.path.join(root, rel), columns=["x", "y"])
        xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
        areas.append(
            (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        )
    # 64x64 domain over 4 files: random spread gives ~4096 per file,
    # Morton clustering compact quadrant-ish regions (~1024 ideal)
    assert max(areas) < 4096 * 0.75


def test_vacuum_protocol_check_blocks_unknown_features(spark, tmp_path):
    root = _mk(spark, tmp_path)
    write_delta_commit(
        spark,
        spark.createDataFrame([(999, 999, "z")], "x long, y long, v string"),
        root,
        mode="overwrite",
    )
    # declare vacuumProtocolCheck + an UNKNOWN writer feature: vacuum
    # must refuse before touching any file
    from fintech_lakehouse_spark.sources.deltalog import (
        _next_version,
        _write_commit,
    )

    snap = delta_snapshot(spark, root)
    _write_commit(
        root,
        _next_version(root),
        [
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 7,
                    "writerFeatures": [
                        "appendOnly", "invariants",
                        "vacuumProtocolCheck", "someFutureFeature",
                    ],
                }
            }
        ],
        operation="SET TBLPROPERTIES",
    )
    n_files_before = sum(
        1 for f in os.listdir(root) if f.endswith(".parquet")
    )
    with pytest.raises(NotImplementedError, match="someFutureFeature"):
        vacuum_delta_table(spark, root, keep_versions=1)
    assert sum(
        1 for f in os.listdir(root) if f.endswith(".parquet")
    ) == n_files_before


def test_vacuum_accepts_vacuum_protocol_check_alone(spark, tmp_path):
    root = _mk(spark, tmp_path, n=8)
    from fintech_lakehouse_spark.sources.deltalog import (
        _next_version,
        _write_commit,
    )

    _write_commit(
        root,
        _next_version(root),
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["vacuumProtocolCheck"],
                    "writerFeatures": ["vacuumProtocolCheck"],
                }
            }
        ],
        operation="SET TBLPROPERTIES",
    )
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, 1, "n")], "x long, y long, v string"),
        root,
        mode="overwrite",
    )
    deleted = vacuum_delta_table(spark, root, keep_versions=1)
    assert deleted  # the overwritten originals really went away
    assert read_delta_table(spark, root).count() == 1


def test_clustering_domain_survives_checkpoint_expiry(spark, tmp_path):
    root = _mk(spark, tmp_path, n=8)
    enable_liquid_clustering(spark, root, ["x"])
    checkpoint_delta_table(spark, root)
    assert expire_delta_log(spark, root)
    assert clustering_columns(
        delta_snapshot(spark, root).domain_metadata
    ) == ["x"]
