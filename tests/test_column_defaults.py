"""allowColumnDefaults (r15, VERDICT r14 item 5 — protocol: Column
Default Values): a write omitting a DEFAULT-bearing column materializes
the default, not NULL; the writer feature is declared on DDL and
accepted from foreign tables (refusal-flip — this feature was
fail-closed through r14)."""

from __future__ import annotations

import json
import os

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    delta_snapshot,
    merge_into_delta_table,
    read_delta_table,
    set_column_default,
    write_delta_commit,
)


def _foreign_defaults_table(spark, root: str) -> None:
    """A table shaped as delta-spark writes it: v7 protocol declaring
    allowColumnDefaults, schema carrying CURRENT_DEFAULT metadata."""
    import shutil

    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, "_tmp")
    spark.createDataFrame(
        [(1, "paid")], "id long, status string"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(n for n in os.listdir(tmp) if n.endswith(".parquet"))
    os.replace(os.path.join(tmp, part), os.path.join(root, "f1.parquet"))
    shutil.rmtree(tmp)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "status", "type": "string", "nullable": True,
             "metadata": {"CURRENT_DEFAULT": "'pending'"}},
        ],
    }
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["allowColumnDefaults"]}},
        {"metaData": {
            "id": "00000000-0000-0000-0000-00000000defa",
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
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def test_foreign_fixture_refusal_flip_and_default_append(spark, tmp_path):
    root = str(tmp_path / "foreign")
    _foreign_defaults_table(spark, root)
    # refusal-flip: through r14 _gate_writer_features raised on
    # allowColumnDefaults; the append below commits through the gate
    write_delta_commit(
        spark, spark.createDataFrame([(2,)], "id long"), root
    )
    got = sorted(
        (r["id"], r["status"])
        for r in read_delta_table(spark, root).collect()
    )
    # stored row untouched; appended row got the DEFAULT, not NULL
    assert got == [(1, "paid"), (2, "pending")]


def test_set_column_default_ddl_roundtrip(spark, tmp_path):
    root = str(tmp_path / "ddl")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, "x", 5)], "id long, v string, n long"),
        root,
    )
    set_column_default(spark, root, "n", "42")
    snap = delta_snapshot(spark, root)
    proto = snap.protocol_raw
    assert proto["minWriterVersion"] == 7
    assert "allowColumnDefaults" in proto["writerFeatures"]
    assert "appendOnly" in proto["writerFeatures"]  # legacy v2 carried over
    # append WITHOUT the defaulted column → default value
    write_delta_commit(
        spark, spark.createDataFrame([(2, "y")], "id long, v string"), root
    )
    # append WITH the column → provided value wins
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "z", 7)], "id long, v string, n long"),
        root,
    )
    got = {r["id"]: r["n"] for r in read_delta_table(spark, root).collect()}
    assert got == {1: 5, 2: 42, 3: 7}
    # DROP DEFAULT: a missing column is a schema mismatch again
    set_column_default(spark, root, "n", None)
    with pytest.raises(ValueError, match="schema column mismatch"):
        write_delta_commit(
            spark, spark.createDataFrame([(4, "w")], "id long, v string"),
            root,
        )


def test_set_column_default_guards(spark, tmp_path):
    root = str(tmp_path / "guards")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, 10)], "id long, amt long"),
        root,
        generated_columns_spec={"dbl": "amt * 2"},
    )
    with pytest.raises(ValueError, match="does not exist"):
        set_column_default(spark, root, "nope", "1")
    with pytest.raises(ValueError, match="generated/identity"):
        set_column_default(spark, root, "dbl", "1")
    with pytest.raises(ValueError, match="not constant-evaluable"):
        set_column_default(spark, root, "amt", "not_a_function(")


@pytest.mark.parametrize("use_dv", [False, True], ids=["cow", "dv"])
def test_merge_insert_clause_applies_default(spark, tmp_path, use_dv):
    root = str(tmp_path / f"mi_{use_dv}")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", "paid")], "id long, v string, status string"
        ),
        root,
    )
    set_column_default(spark, root, "status", "'pending'")
    merge_into_delta_table(
        spark, root,
        spark.createDataFrame([(1, "A"), (9, "N")], "id long, v string"),
        ["id"], use_deletion_vectors=use_dv,
        clauses=[
            {"when": "matched", "action": "update",
             "set": {"v": "source.v"}},
            # insert names id+v only → status gets the DEFAULT
            {"when": "not_matched", "action": "insert",
             "values": {"id": "source.id", "v": "source.v"}},
        ],
    )
    got = {r["id"]: (r["v"], r["status"])
           for r in read_delta_table(spark, root).collect()}
    # matched update keeps the stored status; insert gets the default
    assert got == {1: ("A", "paid"), 9: ("N", "pending")}


def test_merge_insertall_still_strict_without_column(spark, tmp_path):
    """delta parity: updateAll/insertAll require every column even when
    a default exists — defaults fill explicit insert clauses only."""
    root = str(tmp_path / "strict")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, "a", "s")],
                              "id long, v string, status string"),
        root,
    )
    set_column_default(spark, root, "status", "'pending'")
    with pytest.raises(ValueError, match="merge source columns|missing"):
        merge_into_delta_table(
            spark, root,
            spark.createDataFrame([(9, "N")], "id long, v string"),
            ["id"],
        )
