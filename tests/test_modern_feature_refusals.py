"""Named fail-closed refusals for the Delta 4.x features the bridge
does NOT implement (r15, VERDICT r14 item 8): collations (reader),
checkpointProtection (writer), coordinatedCommits (writer) — a foreign
table carrying one of these must refuse by NAME, never silently
misread/miswrite. allowColumnDefaults flipped to SUPPORTED in r15
(tests/test_column_defaults.py); these stay refused."""

from __future__ import annotations

import json
import os

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    read_delta_table,
    write_delta_commit,
)


def _mk_foreign(spark, root: str, protocol: dict) -> None:
    import shutil

    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, "_tmp")
    spark.createDataFrame([(1, "a")], "id long, v string").coalesce(
        1
    ).write.mode("overwrite").parquet(tmp)
    part = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), os.path.join(root, "f1.parquet"))
    shutil.rmtree(tmp)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    actions = [
        {"protocol": protocol},
        {"metaData": {
            "id": "00000000-0000-0000-0000-0000000000ff",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 1700000000000,
        }},
        {"add": {"path": "f1.parquet", "partitionValues": {},
                 "size": os.path.getsize(os.path.join(root, "f1.parquet")),
                 "modificationTime": 1700000000000, "dataChange": True}},
    ]
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def test_collations_reader_feature_refused_by_name(spark, tmp_path):
    """collationsPreview/collations gate READS: a collated column's
    comparison semantics differ from binary ordering — returning rows
    anyway could mis-evaluate the user's own downstream filters."""
    for feat in ("collations-preview", "collations"):
        root = str(tmp_path / f"coll_{feat}")
        _mk_foreign(spark, root, {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": [feat],
            "writerFeatures": [feat],
        })
        with pytest.raises(NotImplementedError, match=feat):
            read_delta_table(spark, root)


def test_checkpoint_protection_writer_feature_refused_by_name(
    spark, tmp_path
):
    """checkpointProtection gates WRITES (reads are legal — the feature
    only constrains history truncation): a commit from a writer that
    doesn't honor it could break the protected-checkpoint invariant."""
    root = str(tmp_path / "ckprot")
    _mk_foreign(spark, root, {
        "minReaderVersion": 1, "minWriterVersion": 7,
        "writerFeatures": ["checkpointProtection"],
    })
    # reading is fine — writer-only feature
    assert read_delta_table(spark, root).count() == 1
    with pytest.raises(NotImplementedError, match="checkpointProtection"):
        write_delta_commit(
            spark, spark.createDataFrame([(2, "b")], "id long, v string"),
            root,
        )


def test_coordinated_commits_writer_feature_refused_by_name(
    spark, tmp_path
):
    """coordinatedCommits moves commit arbitration to an external
    coordinator — a filesystem-ordered commit from this writer could
    silently race it."""
    root = str(tmp_path / "coord")
    _mk_foreign(spark, root, {
        "minReaderVersion": 1, "minWriterVersion": 7,
        "writerFeatures": ["coordinatedCommits"],
    })
    with pytest.raises(NotImplementedError, match="coordinatedCommits"):
        write_delta_commit(
            spark, spark.createDataFrame([(2, "b")], "id long, v string"),
            root,
        )
