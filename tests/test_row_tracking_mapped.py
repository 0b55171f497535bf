"""Row tracking × column mapping (r15, VERDICT r14 item 6 — was a
two-direction refusal through r14): the materialized row-id /
row-commit-version columns are PHYSICAL-only names, so they compose
with name- and id-mode mapping — the mapped read carries them through
unmapped, the physical-write projections pass them through unchanged.
Pins id STABILITY across the DML surface on both mapping modes."""

from __future__ import annotations

import os

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    ROW_ID_COL,
    delete_from_delta_table,
    delta_snapshot,
    enable_column_mapping,
    enable_row_tracking,
    merge_into_delta_table,
    read_delta_table,
    update_delta_table,
    write_delta_commit,
)
from test_column_mapping_ddl import _flip_to_id_mode


def _mk_mapped(spark, root: str, mode: str):
    os.makedirs(root, exist_ok=True)
    df = spark.createDataFrame(
        [(i, f"v{i}", 10 * i) for i in range(6)],
        "id long, v string, d long",
    ).coalesce(2)
    write_delta_commit(spark, df, root)
    if mode == "name":
        enable_column_mapping(spark, root)
    else:
        # the flip helper re-stamps metadata only — rewrite the data so
        # the files carry the physical names (same as the r13 id-mode
        # suite does)
        _flip_to_id_mode(spark, root)
        write_delta_commit(spark, df, root, mode="overwrite")


def _ids(spark, root):
    return {
        r["id"]: r[ROW_ID_COL]
        for r in read_delta_table(spark, root, row_ids=True).collect()
    }


@pytest.mark.parametrize("mode", ["name", "id"])
def test_row_tracking_mapped_dml_id_stability(spark, tmp_path, mode):
    root = str(tmp_path / f"rtcm_{mode}")
    _mk_mapped(spark, root, mode)
    enable_row_tracking(spark, root)
    snap = delta_snapshot(spark, root)
    assert snap.column_mapping_mode == mode
    before = _ids(spark, root)
    assert len(set(before.values())) == 6

    # copy-on-write UPDATE: touched-file rows rewritten, ids preserved
    update_delta_table(spark, root, "id = 1", {"v": "'upd'"})
    after_upd = _ids(spark, root)
    assert after_upd == before

    # legacy MERGE (CoW): matched row keeps its id, insert gets fresh
    merge_into_delta_table(
        spark, root,
        spark.createDataFrame([(2, "m", 0), (9, "n", 0)],
                              "id long, v string, d long"),
        ["id"],
    )
    after_mg = _ids(spark, root)
    assert after_mg[2] == before[2]
    assert after_mg[9] not in set(before.values())

    # DV DELETE: no rewrite, survivors keep ids via baseRowId re-add
    delete_from_delta_table(spark, root, "id = 5",
                            use_deletion_vectors=True)
    after_del = _ids(spark, root)
    assert after_del == {k: v for k, v in after_mg.items() if k != 5}

    # clause MERGE (DV mode): update keeps id, by-source delete drops
    merge_into_delta_table(
        spark, root,
        spark.createDataFrame([(3, "mm", 1)], "id long, v string, d long"),
        ["id"], use_deletion_vectors=True,
        clauses=[
            {"when": "matched", "action": "update",
             "set": {"v": "source.v"}},
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "target.id = 4"},
        ],
    )
    after_cl = _ids(spark, root)
    assert after_cl[3] == before[3]
    assert 4 not in after_cl
    # values still read back logically (mapping intact)
    got = {r["id"]: r["v"] for r in read_delta_table(spark, root).collect()}
    assert got[3] == "mm" and got[1] == "upd" and got[9] == "n"


@pytest.mark.parametrize("mode", ["name", "id"])
def test_row_tracking_mapped_rename_keeps_ids(spark, tmp_path, mode):
    """A column RENAME (the thing mapping exists for) never disturbs
    row ids — they key off physical storage, not logical names."""
    from fintech_lakehouse_spark.sources.deltalog import rename_delta_column

    root = str(tmp_path / f"rtren_{mode}")
    _mk_mapped(spark, root, mode)
    enable_row_tracking(spark, root)
    before = _ids(spark, root)
    rename_delta_column(spark, root, "v", "label")
    df = read_delta_table(spark, root, row_ids=True)
    assert "label" in df.columns and "v" not in df.columns
    assert {r["id"]: r[ROW_ID_COL] for r in df.collect()} == before
