"""Generalized MERGE clause surface (r15, VERDICT r14 items 2+3):
conditional matched update/delete, conditional insert,
whenNotMatchedBySource update/delete, cardinality under conditions,
schema evolution — in copy-on-write AND deletion-vector modes, with
CDF and row-tracking interactions.

Semantics model delta-spark's MERGE builder (public Delta Lake docs:
whenMatchedUpdate/Delete, whenNotMatchedInsert,
whenNotMatchedBySourceUpdate/Delete; reference repo has no MERGE —
its lake layer is upsert-only, reference src/utils/spark_utils.py)."""

from __future__ import annotations

import os

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    delta_snapshot,
    enable_change_data_feed,
    merge_into_delta_table,
    read_delta_changes,
    read_delta_table,
    write_delta_commit,
)


def _mk(spark, tmp_path, name, rows, schema, n_files=2):
    root = str(tmp_path / name)
    os.makedirs(root)
    write_delta_commit(
        spark, spark.createDataFrame(rows, schema).coalesce(n_files), root
    )
    return root


SYNC_CLAUSES = [
    {"when": "matched", "action": "update"},
    {"when": "not_matched", "action": "insert"},
    {"when": "not_matched_by_source", "action": "delete"},
]


@pytest.mark.parametrize("use_dv", [False, True], ids=["cow", "dv"])
def test_merge_conditional_clauses(spark, tmp_path, use_dv):
    root = _mk(
        spark, tmp_path, f"cond_{use_dv}",
        [(i, f"v{i}", 10 * i) for i in range(8)],
        "id long, v string, amt long",
    )
    src = spark.createDataFrame(
        [(2, "U2", 999), (3, "U3", -5), (5, "DEL", 0), (50, "NEW", 1),
         (51, "SKIP", -1)],
        "id long, v string, amt long",
    )
    merge_into_delta_table(
        spark, root, src, ["id"], use_deletion_vectors=use_dv,
        clauses=[
            {"when": "matched", "action": "delete",
             "condition": "source.v = 'DEL'"},
            {"when": "matched", "action": "update",
             "condition": "source.amt > 0",
             "set": {"v": "upper(source.v)", "amt": "source.amt + target.amt"}},
            {"when": "matched", "action": "update"},
            {"when": "not_matched", "action": "insert",
             "condition": "source.amt >= 0"},
            {"when": "not_matched_by_source", "action": "update",
             "condition": "target.id = 0", "set": {"v": "'STALE'"}},
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "target.id = 7"},
        ],
    )
    got = sorted(
        (r["id"], r["v"], r["amt"])
        for r in read_delta_table(spark, root).collect()
    )
    assert got == [
        (0, "STALE", 0), (1, "v1", 10), (2, "U2", 1019),
        (3, "U3", -5),  # updateAll fallback (amt <= 0)
        (4, "v4", 40),  # untouched
        (6, "v6", 60),  # untouched (5 deleted, 7 by-source deleted)
        (50, "NEW", 1),  # conditional insert; 51 skipped
    ]
    if use_dv:
        assert delta_snapshot(spark, root).deletion_vectors


@pytest.mark.parametrize("use_dv", [False, True], ids=["cow", "dv"])
def test_merge_sync_shape_target_equals_source(spark, tmp_path, use_dv):
    """The delta-spark sync idiom: updateAll + insertAll +
    whenNotMatchedBySourceDelete makes the target an exact copy of the
    source."""
    root = _mk(
        spark, tmp_path, f"sync_{use_dv}",
        [(i, f"old{i}") for i in range(6)], "id long, v string",
    )
    src_rows = [(2, "s2"), (4, "s4"), (9, "s9"), (None, "snull")]
    src = spark.createDataFrame(src_rows, "id long, v string")
    merge_into_delta_table(
        spark, root, src, ["id"], use_deletion_vectors=use_dv,
        clauses=SYNC_CLAUSES,
    )
    got = sorted(
        ((r["id"], r["v"]) for r in read_delta_table(spark, root).collect()),
        key=str,
    )
    assert got == sorted(src_rows, key=str)


def test_merge_cardinality_violation_condition_aware(spark, tmp_path):
    root = _mk(spark, tmp_path, "card", [(1, "a")], "id long, v string", 1)
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "id long, v string")
    with pytest.raises(ValueError, match="CARDINALITY"):
        merge_into_delta_table(
            spark, root, dup, ["id"],
            clauses=[{"when": "matched", "action": "update",
                      "set": {"v": "source.v"}}],
        )
    # two matching source rows where only ONE clause fires: legal
    ok = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 0)], "id long, v string, f long"
    )
    merge_into_delta_table(
        spark, root, ok, ["id"],
        clauses=[{"when": "matched", "action": "update",
                  "condition": "source.f = 1", "set": {"v": "source.v"}}],
    )
    assert [(r["id"], r["v"]) for r in
            read_delta_table(spark, root).collect()] == [(1, "x")]


def test_merge_clause_validation(spark, tmp_path):
    root = _mk(spark, tmp_path, "val", [(1, "a")], "id long, v string", 1)
    src = spark.createDataFrame([(1, "x")], "id long, v string")
    cases = [
        ([], "empty clause list"),
        ([{"when": "matched", "action": "insert"}], "allows actions"),
        ([{"when": "not_matched", "action": "delete"}], "allows actions"),
        ([{"when": "nope", "action": "update"}], "'when' must be"),
        ([{"when": "matched", "action": "update", "bogus": 1}],
         "unknown keys"),
        ([{"when": "matched", "action": "delete", "set": {"v": "'x'"}}],
         "cannot carry 'set'"),
        ([{"when": "not_matched_by_source", "action": "update"}],
         "requires an explicit 'set'"),
        ([{"when": "matched", "action": "update"},
          {"when": "matched", "action": "delete"}],
         "not the last of its group"),
    ]
    for clauses, msg in cases:
        with pytest.raises(ValueError, match=msg):
            merge_into_delta_table(spark, root, src, ["id"], clauses=clauses)


@pytest.mark.parametrize("use_dv", [False, True], ids=["cow", "dv"])
def test_merge_schema_evolution_roundtrip(spark, tmp_path, use_dv):
    root = _mk(
        spark, tmp_path, f"evo_{use_dv}", [(1, "a"), (2, "b")],
        "id long, v string", 1,
    )
    src = spark.createDataFrame(
        [(2, "B2", 3.5), (9, "N", 1.25)], "id long, v string, score double"
    )
    # refused without the flag when updateAll/insertAll present
    with pytest.raises(ValueError, match="schema_evolution=True"):
        merge_into_delta_table(
            spark, root, src, ["id"], use_deletion_vectors=use_dv
        )
    merge_into_delta_table(
        spark, root, src, ["id"], use_deletion_vectors=use_dv,
        schema_evolution=True,
    )
    snap = delta_snapshot(spark, root)
    assert [f.name for f in snap.schema.fields] == ["id", "v", "score"]
    assert snap.schema.fields[2].nullable  # evolution forces nullable
    got = sorted(
        (r["id"], r["v"], r["score"])
        for r in read_delta_table(spark, root).collect()
    )
    # unmatched target row null-backfilled for the new column
    assert got == [(1, "a", None), (2, "B2", 3.5), (9, "N", 1.25)]
    # the widened table keeps working: plain default merge
    merge_into_delta_table(
        spark, root,
        spark.createDataFrame([(1, "A1", 0.5)],
                              "id long, v string, score double"),
        ["id"], use_deletion_vectors=use_dv,
    )
    got2 = {r["id"]: r["score"]
            for r in read_delta_table(spark, root).collect()}
    assert got2[1] == 0.5 and got2[9] == 1.25


def test_merge_extra_source_cols_without_evolution(spark, tmp_path):
    """Explicit clauses may USE source columns the table lacks without
    widening the schema (delta allows this — the extra column is
    expression input, not output)."""
    root = _mk(spark, tmp_path, "extra", [(1, "a"), (2, "b")],
               "id long, v string", 1)
    src = spark.createDataFrame(
        [(1, "x", 1), (2, "y", 0)], "id long, v string, keepit long"
    )
    merge_into_delta_table(
        spark, root, src, ["id"],
        clauses=[{"when": "matched", "action": "update",
                  "condition": "source.keepit = 1",
                  "set": {"v": "source.v"}}],
    )
    snap = delta_snapshot(spark, root)
    assert [f.name for f in snap.schema.fields] == ["id", "v"]
    got = sorted((r["id"], r["v"])
                 for r in read_delta_table(spark, root).collect())
    assert got == [(1, "x"), (2, "b")]


@pytest.mark.parametrize("use_dv", [False, True], ids=["cow", "dv"])
def test_merge_clauses_cdf(spark, tmp_path, use_dv):
    root = _mk(spark, tmp_path, f"cdf_{use_dv}",
               [(1, "a"), (2, "b"), (3, "c")], "id long, v string", 1)
    enable_change_data_feed(spark, root)
    v = merge_into_delta_table(
        spark, root,
        spark.createDataFrame([(2, "B"), (9, "N")], "id long, v string"),
        ["id"], use_deletion_vectors=use_dv,
        clauses=[
            {"when": "matched", "action": "update"},
            {"when": "not_matched", "action": "insert"},
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "target.id = 3"},
        ],
    )
    got = sorted(
        (r["id"], r["v"], r["_change_type"])
        for r in read_delta_changes(spark, root, v).collect()
    )
    assert got == [
        (2, "B", "update_postimage"), (2, "b", "update_preimage"),
        (3, "c", "delete"), (9, "N", "insert"),
    ]


@pytest.mark.parametrize("use_dv", [False, True], ids=["cow", "dv"])
def test_merge_clauses_row_tracking_id_stability(spark, tmp_path, use_dv):
    from fintech_lakehouse_spark.sources.deltalog import ROW_ID_COL

    root = str(tmp_path / f"rt_{use_dv}")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "id long, v string"
    ).coalesce(2)
    write_delta_commit(spark, df, root)
    # flip on row tracking the way the r14 suite does
    from fintech_lakehouse_spark.sources.deltalog import enable_row_tracking

    enable_row_tracking(spark, root)
    before = {
        r["id"]: r[ROW_ID_COL]
        for r in read_delta_table(spark, root, row_ids=True).collect()
    }
    merge_into_delta_table(
        spark, root,
        spark.createDataFrame([(2, "U"), (9, "N")], "id long, v string"),
        ["id"], use_deletion_vectors=use_dv,
        clauses=[
            {"when": "matched", "action": "update",
             "set": {"v": "source.v"}},
            {"when": "not_matched", "action": "insert"},
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "target.id = 5"},
        ],
    )
    after = {
        r["id"]: r[ROW_ID_COL]
        for r in read_delta_table(spark, root, row_ids=True).collect()
    }
    # updated row keeps its id; untouched rows keep theirs; insert fresh
    assert after[2] == before[2]
    for k in (0, 1, 3, 4):
        assert after[k] == before[k]
    assert 5 not in after
    assert after[9] not in set(before.values())


def test_merge_clauses_generated_columns(spark, tmp_path):
    root = str(tmp_path / "gen")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "id long, amt long"),
        root,
        generated_columns_spec={"dbl": "amt * 2"},
    )
    # explicit assignment to a generated column refused
    with pytest.raises(ValueError, match="GENERATED"):
        merge_into_delta_table(
            spark, root,
            spark.createDataFrame([(1, 11)], "id long, amt long"),
            ["id"],
            clauses=[{"when": "matched", "action": "update",
                      "set": {"dbl": "source.amt"}}],
        )
    # conditional update recomputes the generated column post-image
    merge_into_delta_table(
        spark, root,
        spark.createDataFrame([(1, 11)], "id long, amt long"),
        ["id"],
        clauses=[{"when": "matched", "action": "update",
                  "set": {"amt": "source.amt"}}],
    )
    got = {r["id"]: (r["amt"], r["dbl"])
           for r in read_delta_table(spark, root).collect()}
    assert got == {1: (11, 22), 2: (20, 40)}


def test_merge_empty_source_by_source_still_fires(spark, tmp_path):
    root = _mk(spark, tmp_path, "empty", [(1, "a"), (2, "b")],
               "id long, v string", 1)
    empty = spark.createDataFrame([], "id long, v string")
    # no by-source clause → no-op, version unchanged
    v0 = delta_snapshot(spark, root).version
    v = merge_into_delta_table(
        spark, root, empty, ["id"],
        clauses=[{"when": "matched", "action": "update"},
                 {"when": "not_matched", "action": "insert"}],
    )
    assert v == v0
    # with a by-source delete, an empty source clears the table
    merge_into_delta_table(
        spark, root, empty, ["id"],
        clauses=[{"when": "not_matched_by_source", "action": "delete"}],
    )
    assert read_delta_table(spark, root).count() == 0


@pytest.mark.parametrize("use_dv", [False, True], ids=["cow", "dv"])
def test_merge_clauses_partitioned_table(spark, tmp_path, use_dv):
    root = str(tmp_path / f"part_{use_dv}")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(i, f"v{i}", "A" if i % 2 == 0 else "B") for i in range(8)],
        "id long, v string, seg string",
    )
    write_delta_commit(spark, df, root, partition_by=["seg"])
    merge_into_delta_table(
        spark, root,
        spark.createDataFrame(
            [(2, "U2", "A"), (9, "N9", "B")], "id long, v string, seg string"
        ),
        ["id"], use_deletion_vectors=use_dv,
        clauses=[
            {"when": "matched", "action": "update"},
            {"when": "not_matched", "action": "insert"},
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "target.id = 7"},
        ],
    )
    got = sorted(
        (r["id"], r["v"], r["seg"])
        for r in read_delta_table(spark, root).collect()
    )
    assert (2, "U2", "A") in got and (9, "N9", "B") in got
    assert all(t[0] != 7 for t in got)
    assert len(got) == 8  # 8 - deleted 7 + inserted 9


def test_merge_clauses_dv_then_cow_read_parity(spark, tmp_path):
    """A clause-merge over a table ALREADY carrying DVs classifies
    against live rows only (a DV-deleted row is not a match target)."""
    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
    )

    root = _mk(spark, tmp_path, "dvlive",
               [(i, f"v{i}") for i in range(6)], "id long, v string", 1)
    delete_from_delta_table(spark, root, "id = 2", use_deletion_vectors=True)
    merge_into_delta_table(
        spark, root,
        spark.createDataFrame([(2, "REBORN")], "id long, v string"),
        ["id"], use_deletion_vectors=True, clauses=SYNC_CLAUSES[:2],
    )
    got = {r["id"]: r["v"] for r in read_delta_table(spark, root).collect()}
    # id=2 was dead → the source row is an INSERT, not an update
    assert got[2] == "REBORN" and len(got) == 6
