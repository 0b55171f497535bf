"""variantType table feature (r14 — after timestampNtz, the other
TYPE-gated modern Delta feature): VARIANT columns write/read through
the engine bridge with the feature declared on both protocol sides
(Spark 4's parquet source carries the binary metadata/value pair
natively), mergeSchema upgrades in-commit, and the no-Spark bridge
reader fails closed instead of emitting undecodable binary."""

from __future__ import annotations

import json
import os

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    delta_snapshot,
    read_delta_table,
    write_delta_commit,
)


def _variant_df(spark, rows):
    return spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"({i}, parse_json('{j}'))" for i, j in rows)
        + " AS t(id, payload)"
    ).selectExpr("CAST(id AS LONG) AS id", "payload")


def test_variant_create_declares_feature_and_roundtrips(spark, tmp_path):
    root = str(tmp_path / "vt")
    df = _variant_df(
        spark,
        [(1, '{"a": 5, "b": [1, 2]}'), (2, '{"a": 7, "c": "x"}')],
    )
    assert df.schema["payload"].dataType.typeName() == "variant"
    write_delta_commit(spark, df, root)
    snap = delta_snapshot(spark, root)
    assert snap.protocol_raw["minReaderVersion"] == 3
    assert snap.protocol_raw["readerFeatures"] == ["variantType"]
    assert "variantType" in snap.protocol_raw["writerFeatures"]
    out = read_delta_table(spark, root)
    assert out.schema["payload"].dataType.typeName() == "variant"
    got = {
        r["id"]: (r["j"], r["a"])
        for r in out.selectExpr(
            "id", "to_json(payload) AS j",
            "variant_get(payload, '$.a', 'int') AS a",
        ).collect()
    }
    assert got[1] == ('{"a":5,"b":[1,2]}', 5)
    assert got[2] == ('{"a":7,"c":"x"}', 7)
    # appends keep flowing through the declared table
    write_delta_commit(
        spark, _variant_df(spark, [(3, '{"z": true}')]), root
    )
    assert read_delta_table(spark, root).count() == 3


def test_variant_merge_schema_upgrades_protocol(spark, tmp_path):
    root = str(tmp_path / "mv")
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        root,
    )
    assert delta_snapshot(spark, root).protocol_raw == {
        "minReaderVersion": 1,
        "minWriterVersion": 2,
    }
    widened = spark.sql(
        "SELECT CAST(2 AS LONG) AS id, 'b' AS v, "
        "parse_json('{\"n\": 1}') AS extra"
    )
    v = write_delta_commit(spark, widened, root, merge_schema=True)
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{v:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh]
    protos = [a["protocol"] for a in actions if "protocol" in a]
    assert len(protos) == 1
    assert "variantType" in protos[0]["readerFeatures"]
    assert "variantType" in protos[0]["writerFeatures"]
    out = read_delta_table(spark, root)
    got = {
        r["id"]: r["j"]
        for r in out.selectExpr(
            "id", "to_json(extra) AS j"
        ).collect()
    }
    assert got == {1: None, 2: '{"n":1}'}


def test_bridge_refuses_variant_tables(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltastream import (
        register_deltabridge_source,
    )

    register_deltabridge_source(spark)
    root = str(tmp_path / "bv")
    write_delta_commit(
        spark, _variant_df(spark, [(1, '{"a": 1}')]), root
    )
    with pytest.raises(Exception, match="VARIANT"):
        spark.read.format("deltabridge").option(
            "path", root
        ).load().collect()
