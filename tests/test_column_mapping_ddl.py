"""Writer-side column mapping (r12): ``enable_column_mapping`` +
``rename_delta_column`` / ``drop_delta_column`` — metaData-only
commits that the EXISTING name-mode reader resolves (files are never
touched). Carried VERDICT-r10/r11 task #3."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row

from fintech_lakehouse_spark.sources.deltalog import (
    delta_snapshot,
    drop_delta_column,
    enable_column_mapping,
    enable_in_commit_timestamps,
    read_delta_table,
    rename_delta_column,
    write_delta_commit,
)


def _mk(spark, root, partition_by=None, nested=False):
    os.makedirs(root, exist_ok=True)
    if nested:
        df = spark.createDataFrame(
            [
                Row(id=1, u=Row(name="ann", age=30), d=7),
                Row(id=2, u=Row(name="bob", age=40), d=8),
            ],
            "id long, u struct<name:string, age:long>, d long",
        )
    else:
        df = spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
        )
    write_delta_commit(spark, df, root, partition_by=partition_by)
    return df


def test_enable_assigns_ids_and_physical_names(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, nested=True)
    enable_column_mapping(spark, root)
    snap = delta_snapshot(spark, root)
    assert snap.column_mapping_mode == "name"
    conf = snap.metadata_raw["configuration"]
    # ids are unique and cover nested fields: id, u, u.name, u.age, d
    assert conf["delta.columnMapping.maxColumnId"] == "5"
    seen = set()

    def walk(dt):
        if dt.typeName() == "struct":
            for f in dt.fields:
                meta = f.metadata or {}
                assert meta["delta.columnMapping.physicalName"] == f.name
                seen.add(meta["delta.columnMapping.id"])
                walk(f.dataType)

    walk(snap.schema)
    assert seen == {1, 2, 3, 4, 5}
    # idempotent
    v = enable_column_mapping(spark, root)
    assert v == snap.version


def test_rename_flat_column_reads_back(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "label")
    out = read_delta_table(spark, root)
    assert [f.name for f in out.schema.fields] == ["id", "label", "d"]
    assert sorted(map(tuple, out.collect())) == [(1, "a", 7), (2, "b", 8)]
    # time travel across the rename sees the OLD logical name
    before = read_delta_table(spark, root, version=0)
    assert [f.name for f in before.schema.fields] == ["id", "v", "d"]


def test_rename_nested_field_reads_back(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, nested=True)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "u.name", "full_name")
    out = read_delta_table(spark, root)
    u = [f for f in out.schema.fields if f.name == "u"][0]
    assert [f.name for f in u.dataType.fields] == ["full_name", "age"]
    rows = sorted(
        ((r["id"], r["u"]["full_name"], r["u"]["age"]) for r in out.collect())
    )
    assert rows == [(1, "ann", 30), (2, "bob", 40)]


def test_rename_partition_column(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, partition_by=["d"])
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "d", "day_bucket")
    snap = delta_snapshot(spark, root)
    assert snap.partition_columns == ["day_bucket"]
    out = read_delta_table(spark, root)
    assert sorted(map(tuple, out.collect())) == [(1, "a", 7), (2, "b", 8)]
    assert [f.name for f in out.schema.fields] == ["id", "v", "day_bucket"]


def test_rename_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    with pytest.raises(ValueError, match="enable_column_mapping"):
        rename_delta_column(spark, root, "v", "label")
    enable_column_mapping(spark, root)
    with pytest.raises(ValueError, match="already exists"):
        rename_delta_column(spark, root, "v", "id")
    with pytest.raises(ValueError, match="no column"):
        rename_delta_column(spark, root, "nope", "x")


def test_drop_column_flat_and_nested(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, nested=True)
    enable_column_mapping(spark, root)
    drop_delta_column(spark, root, "u.age")
    out = read_delta_table(spark, root)
    u = [f for f in out.schema.fields if f.name == "u"][0]
    assert [f.name for f in u.dataType.fields] == ["name"]
    drop_delta_column(spark, root, "u")
    out2 = read_delta_table(spark, root)
    assert [f.name for f in out2.schema.fields] == ["id", "d"]
    assert sorted(map(tuple, out2.collect())) == [(1, 7), (2, 8)]
    # the data files still physically carry the dropped columns
    snap = delta_snapshot(spark, root)
    import pyarrow.parquet as pq

    rel = sorted(snap.files)[0]
    assert "u" in pq.read_schema(os.path.join(root, rel)).names


def test_drop_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, partition_by=["d"])
    enable_column_mapping(spark, root)
    with pytest.raises(ValueError, match="partition column"):
        drop_delta_column(spark, root, "d")


def test_enable_on_table_features_protocol(spark, tmp_path):
    """A table already on the v7 table-features form (ICT enabled)
    gets columnMapping appended to BOTH feature lists."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_in_commit_timestamps(spark, root)
    enable_column_mapping(spark, root)
    snap = delta_snapshot(spark, root)
    proto = snap.protocol_raw
    assert "columnMapping" in (proto.get("writerFeatures") or [])
    # reader side: either legacy minReaderVersion>=2 or the v3 list
    rv = int(proto.get("minReaderVersion", 1))
    assert rv >= 2
    if rv >= 3:
        assert "columnMapping" in (proto.get("readerFeatures") or [])
    # renames still work on the upgraded table and keep ICT flowing
    rename_delta_column(spark, root, "v", "w")
    log = os.path.join(root, "_delta_log")
    latest = sorted(n for n in os.listdir(log) if n.endswith(".json"))[-1]
    with open(os.path.join(log, latest)) as fh:
        first = json.loads(fh.readline())
    assert first["commitInfo"].get("inCommitTimestamp") is not None


def test_append_after_rename(spark, tmp_path):
    """r12: a rename must not lock the table out of appends — the
    writer projects logical → physical names before staging."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "label")
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c", 9)], "id long, label string, d long"),
        root,
    )
    out = read_delta_table(spark, root)
    assert sorted(map(tuple, out.collect())) == [
        (1, "a", 7), (2, "b", 8), (3, "c", 9),
    ]
    # the new file physically carries the ORIGINAL physical name
    import pyarrow.parquet as pq

    snap = delta_snapshot(spark, root)
    newest = max(
        snap.files, key=lambda r: os.path.getmtime(os.path.join(root, r))
    )
    assert "v" in pq.read_schema(os.path.join(root, newest)).names


def test_partitioned_mapped_append_and_overwrite(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, partition_by=["d"])
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "d", "bucket")
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(3, "c", 9)], "id long, v string, bucket long"
        ),
        root,
        partition_by=["bucket"],
    )
    out = read_delta_table(spark, root)
    assert sorted(map(tuple, out.collect())) == [
        (1, "a", 7), (2, "b", 8), (3, "c", 9),
    ]
    # partitionValues keys are PHYSICAL names
    snap = delta_snapshot(spark, root)
    assert all("d" in pv for pv in snap.files.values())
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(4, "x", 1)], "id long, v string, bucket long"
        ),
        root,
        mode="overwrite",
        partition_by=["bucket"],
    )
    assert sorted(map(tuple, read_delta_table(spark, root).collect())) == [
        (4, "x", 1)
    ]


def test_nested_mapped_append_after_nested_rename(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, nested=True)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "u.name", "who")
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [Row(id=3, u=Row(who="cat", age=9), d=5)],
            "id long, u struct<who:string, age:long>, d long",
        ),
        root,
    )
    out = read_delta_table(spark, root)
    rows = sorted((r["id"], r["u"]["who"], r["u"]["age"]) for r in out.collect())
    assert rows == [(1, "ann", 30), (2, "bob", 40), (3, "cat", 9)]


def test_mapped_merge_schema_assigns_fresh_ids(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_column_mapping(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(3, "c", 9, 1.5)], "id long, v string, d long, score double"
        ),
        root,
        merge_schema=True,
    )
    snap = delta_snapshot(spark, root)
    f = snap.schema["score"]
    assert f.metadata["delta.columnMapping.id"] == 4  # 3 existing + 1
    # ADVICE r12 high: post-enablement columns get FRESH col-<uuid>
    # physical names (delta-spark's rule) — reusing the logical name
    # can collide with a renamed column's physicalName or resurrect a
    # dropped column's stale data from old files
    phys = f.metadata["delta.columnMapping.physicalName"]
    assert phys.startswith("col-") and phys != "score"
    conf = snap.metadata_raw["configuration"]
    assert conf["delta.columnMapping.maxColumnId"] == "4"
    out = read_delta_table(spark, root)
    got = sorted(map(tuple, out.collect()))
    assert got == [(1, "a", 7, None), (2, "b", 8, None), (3, "c", 9, 1.5)]


def test_mapped_merge_schema_after_rename_no_collision(spark, tmp_path):
    """The ADVICE r12 failure shape: rename a→b keeps physical 'a';
    mergeSchema-adding a new column named 'a' must NOT collide with
    b's physicalName (which would silently map two logical columns to
    one physical column)."""
    from fintech_lakehouse_spark.sources.deltalog import (
        rename_delta_column,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "w")  # physical stays "v"
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(3, "c", 9, "fresh")], "id long, w string, d long, v string"
        ),
        root,
        merge_schema=True,
    )
    snap = delta_snapshot(spark, root)
    phys = {
        f.name: f.metadata["delta.columnMapping.physicalName"]
        for f in snap.schema.fields
    }
    assert phys["w"] == "v"
    assert phys["v"].startswith("col-") and phys["v"] != "v"
    got = sorted(map(tuple, read_delta_table(spark, root).collect()))
    # old rows: w reads back the old physical-'v' data, new 'v' is NULL
    assert got == [
        (1, "a", 7, None), (2, "b", 8, None), (3, "c", 9, "fresh")
    ]


def _flip_to_id_mode(spark, root):
    """Re-commit the table metaData in ID mapping mode with
    columnMapping id/physicalName on every field at EVERY nesting
    level — the state a foreign id-mode writer leaves behind."""
    import json as _json

    from fintech_lakehouse_spark.sources.deltalog import (
        _next_version,
        _write_commit,
    )
    from pyspark.sql.types import ArrayType, MapType, StructField
    from pyspark.sql.types import StructType

    snap = delta_snapshot(spark, root)
    counter = [0]

    def stamp(dt):
        if isinstance(dt, StructType):
            fields = []
            for f in dt.fields:
                counter[0] += 1
                meta = dict(f.metadata or {})
                meta["delta.columnMapping.id"] = counter[0]
                meta["delta.columnMapping.physicalName"] = (
                    f"col-{counter[0]}"
                )
                fields.append(
                    StructField(f.name, stamp(f.dataType), f.nullable, meta)
                )
            return StructType(fields)
        if isinstance(dt, ArrayType):
            return ArrayType(stamp(dt.elementType), dt.containsNull)
        if isinstance(dt, MapType):
            return MapType(
                stamp(dt.keyType), stamp(dt.valueType), dt.valueContainsNull
            )
        return dt

    stamped = stamp(snap.schema)
    md = dict(snap.metadata_raw)
    md["schemaString"] = _json.dumps(stamped.jsonValue())
    conf = dict(md.get("configuration") or {})
    conf["delta.columnMapping.mode"] = "id"
    conf["delta.columnMapping.maxColumnId"] = str(counter[0])
    md["configuration"] = conf
    proto = {"minReaderVersion": 2, "minWriterVersion": 5}
    _write_commit(
        root, _next_version(root),
        [{"protocol": proto}, {"metaData": md}],
        operation="SET TBLPROPERTIES",
    )


def test_id_mode_flat_append_with_field_ids(spark, tmp_path):
    """r12: id-mode tables accept flat writes — the staged parquet
    carries field ids matching delta.columnMapping.id, which the
    footer-id read path resolves. The pre-flip files were written
    unmapped (logical column names, no ids), so the test starts with
    an OVERWRITE that replaces the live set with stamped files, then
    appends on top."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    _flip_to_id_mode(spark, root)
    # overwrite: all live files are replaced by field-id-stamped ones
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
        ),
        root,
        mode="overwrite",
    )
    out = read_delta_table(spark, root)
    assert [f.name for f in out.schema.fields] == ["id", "v", "d"]
    assert sorted(map(tuple, out.collect())) == [(1, "a", 7), (2, "b", 8)]
    # the data files physically carry the PHYSICAL names + field ids
    import pyarrow.parquet as pq

    snap = delta_snapshot(spark, root)
    rel = sorted(snap.files)[0]
    pf = pq.ParquetFile(os.path.join(root, rel))
    names = pf.schema_arrow.names
    assert names == ["col-1", "col-2", "col-3"]
    assert "field_id=1" in str(pf.schema)
    # plain appends stack on top
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c", 9)], "id long, v string, d long"),
        root,
    )
    assert sorted(map(tuple, read_delta_table(spark, root).collect())) == [
        (1, "a", 7), (2, "b", 8), (3, "c", 9),
    ]


def test_id_mode_nested_write_stamps_all_levels(spark, tmp_path):
    """r13 (VERDICT r12 item 1): id-mode writes on NESTED schemas —
    struct fields at every level get parquet footer field ids matching
    delta.columnMapping.id, and the footer-id read path resolves the
    roundtrip. (Replaces the r12 flat-schema-only refusal test.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import Row

    root = str(tmp_path / "t")
    _mk(spark, root, nested=True)
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [
                Row(id=1, u=Row(name="ann", age=30), d=7),
                Row(id=3, u=None, d=9),
            ],
            "id long, u struct<name:string, age:long>, d long",
        ),
        root,
        mode="overwrite",
    )
    out = read_delta_table(spark, root)
    got = sorted(map(tuple, out.collect()))
    assert got == [(1, ("ann", 30), 7), (3, None, 9)]
    # footers carry physical names + field ids at every struct level
    snap = delta_snapshot(spark, root)
    rel = sorted(snap.files)[0]
    ids = {}

    def walk(fld):
        md = fld.metadata or {}
        if b"PARQUET:field_id" in md:
            ids[fld.name] = int(md[b"PARQUET:field_id"])
        if pa.types.is_struct(fld.type):
            for i in range(fld.type.num_fields):
                walk(fld.type.field(i))

    for fld in pq.read_schema(os.path.join(root, rel)):
        walk(fld)
    # _flip_to_id_mode stamps DFS pre-order: id=1, u=2, name=3, age=4, d=5
    assert ids == {
        "col-1": 1, "col-2": 2, "col-3": 3, "col-4": 4, "col-5": 5
    }
    # appends stack on top and nested NULL structs stay NULL
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [Row(id=4, u=Row(name="dee", age=50), d=2)],
            "id long, u struct<name:string, age:long>, d long",
        ),
        root,
    )
    got = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert got == [(1, ("ann", 30), 7), (3, None, 9), (4, ("dee", 50), 2)]


def test_id_mode_partitioned_append_overwrite(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, partition_by=["d"])
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
        ),
        root,
        mode="overwrite",
        partition_by=["d"],
    )
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c", 7)], "id long, v string, d long"),
        root,
        partition_by=["d"],
    )
    snap = delta_snapshot(spark, root)
    # partitionValues are keyed by the PHYSICAL partition column name
    assert all("col-3" in pv for pv in snap.files.values())
    out = read_delta_table(spark, root)
    assert sorted(map(tuple, out.collect())) == [
        (1, "a", 7), (2, "b", 8), (3, "c", 7)
    ]
    got = out.filter("d = 7").select("id").orderBy("id")
    assert [r.id for r in got.collect()] == [1, 3]


def test_id_mode_merge_schema_fresh_ids(spark, tmp_path):
    """r13: mergeSchema on an id-mode table assigns fresh ids AND
    fresh col-<uuid> physical names; new files stamp the new id."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
        ),
        root,
        mode="overwrite",
    )
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(3, "c", 9, 1.5)], "id long, v string, d long, score double"
        ),
        root,
        merge_schema=True,
    )
    snap = delta_snapshot(spark, root)
    f = snap.schema["score"]
    assert f.metadata["delta.columnMapping.id"] == 4
    phys = f.metadata["delta.columnMapping.physicalName"]
    assert phys.startswith("col-") and phys != "score"
    assert snap.metadata_raw["configuration"][
        "delta.columnMapping.maxColumnId"
    ] == "4"
    got = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert got == [(1, "a", 7, None), (2, "b", 8, None), (3, "c", 9, 1.5)]


def test_id_mode_rename_write_readback(spark, tmp_path):
    """RENAME on an id-mode table is metaData-only; writes after the
    rename stamp the SAME field id, so old and new files co-resolve."""
    from fintech_lakehouse_spark.sources.deltalog import (
        rename_delta_column,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
        ),
        root,
        mode="overwrite",
    )
    rename_delta_column(spark, root, "v", "w")
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c", 9)], "id long, w string, d long"),
        root,
    )
    out = read_delta_table(spark, root)
    assert [f.name for f in out.schema.fields] == ["id", "w", "d"]
    assert sorted(map(tuple, out.collect())) == [
        (1, "a", 7), (2, "b", 8), (3, "c", 9)
    ]


def test_id_mode_delete_update_cow(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
        update_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8), (3, "c", 9)],
            "id long, v string, d long",
        ),
        root,
        mode="overwrite",
    )
    delete_from_delta_table(spark, root, "id = 2")
    assert sorted(map(tuple, read_delta_table(spark, root).collect())) == [
        (1, "a", 7), (3, "c", 9)
    ]
    update_delta_table(spark, root, "id = 3", {"v": "'cc'"})
    assert sorted(map(tuple, read_delta_table(spark, root).collect())) == [
        (1, "a", 7), (3, "cc", 9)
    ]


def test_id_mode_dv_delete_update(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
        update_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8), (3, "c", 9)],
            "id long, v string, d long",
        ),
        root,
        mode="overwrite",
    )
    files_before = set(delta_snapshot(spark, root).files)
    delete_from_delta_table(
        spark, root, "id = 2", use_deletion_vectors=True
    )
    snap = delta_snapshot(spark, root)
    # DV delete rewrites nothing — same live files, one carries a DV
    assert set(snap.files) == files_before
    assert snap.deletion_vectors
    assert sorted(map(tuple, read_delta_table(spark, root).collect())) == [
        (1, "a", 7), (3, "c", 9)
    ]
    update_delta_table(
        spark, root, "id = 3", {"v": "'cc'"}, use_deletion_vectors=True
    )
    assert sorted(map(tuple, read_delta_table(spark, root).collect())) == [
        (1, "a", 7), (3, "cc", 9)
    ]


def test_id_mode_merge_cow_and_dv(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltalog import (
        merge_into_delta_table,
    )

    for dv in (False, True):
        root = str(tmp_path / f"t_dv_{dv}")
        _mk(spark, root)
        _flip_to_id_mode(spark, root)
        write_delta_commit(
            spark,
            spark.createDataFrame(
                [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
            ),
            root,
            mode="overwrite",
        )
        merge_into_delta_table(
            spark,
            root,
            spark.createDataFrame(
                [(2, "bb", 80), (4, "d", 10)], "id long, v string, d long"
            ),
            ["id"],
            use_deletion_vectors=dv,
        )
        got = sorted(map(tuple, read_delta_table(spark, root).collect()))
        assert got == [(1, "a", 7), (2, "bb", 80), (4, "d", 10)], f"dv={dv}"


def test_id_mode_cdf(spark, tmp_path):
    """CDF on an id-mode table: cdc files carry physical names +
    field ids; table_changes resolves them back to logical."""
    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
        enable_change_data_feed,
        read_delta_changes,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
        ),
        root,
        mode="overwrite",
    )
    v0 = enable_change_data_feed(spark, root)
    delete_from_delta_table(spark, root, "id = 1")
    changes = read_delta_changes(spark, root, v0 + 1)
    rows = sorted(
        (r.id, r.v, r.d, r._change_type) for r in changes.collect()
    )
    assert rows == [(1, "a", 7, "delete")]


def test_id_mode_optimize(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltalog import (
        optimize_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, "a", 7), (2, "b", 8)], "id long, v string, d long"
        ),
        root,
        mode="overwrite",
    )
    for i in range(3, 6):
        write_delta_commit(
            spark,
            spark.createDataFrame(
                [(i, "x", i * 10)], "id long, v string, d long"
            ),
            root,
        )
    before = sorted(map(tuple, read_delta_table(spark, root).collect()))
    optimize_delta_table(spark, root, target_files=1)
    snap = delta_snapshot(spark, root)
    assert len(snap.files) == 1
    after = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert after == before


def test_optimize_mapped_table_after_rename(spark, tmp_path):
    """r12: OPTIMIZE compacts a name-mapped table — the compacted
    files carry PHYSICAL names, content is unchanged, ZORDER works on
    logical names."""
    from fintech_lakehouse_spark.sources.deltalog import (
        optimize_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c", 9)], "id long, v string, d long"),
        root,
    )
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "label")
    before = sorted(map(tuple, read_delta_table(spark, root).collect()))
    optimize_delta_table(spark, root, target_files=1, zorder=["id"])
    snap = delta_snapshot(spark, root)
    assert len(snap.files) == 1
    import pyarrow.parquet as pq

    rel = next(iter(snap.files))
    assert "v" in pq.read_schema(os.path.join(root, rel)).names
    after = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert after == before


def test_optimize_mapped_partitioned_table(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltalog import (
        optimize_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root, partition_by=["d"])
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c", 7)], "id long, v string, d long"),
        root,
        partition_by=["d"],
    )
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "d", "bucket")
    before = sorted(map(tuple, read_delta_table(spark, root).collect()))
    optimize_delta_table(spark, root)
    snap = delta_snapshot(spark, root)
    # one compacted file per partition value, keyed by PHYSICAL name
    assert sorted(pv.get("d") for pv in snap.files.values()) == ["7", "8"]
    after = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert after == before


def test_delete_update_on_mapped_table_after_rename(spark, tmp_path):
    """r12: CoW DELETE/UPDATE work on a name-mapped table — the scan
    reads physical names back to logical for predicate evaluation and
    the rewrite stages physical files."""
    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
        update_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root, partition_by=["d"])
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(3, "c", 7), (4, "dd", 8)], "id long, v string, d long"
        ),
        root,
        partition_by=["d"],
    )
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "label")
    rename_delta_column(spark, root, "d", "bucket")
    delete_from_delta_table(spark, root, "label = 'c'")
    got = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert got == [(1, "a", 7), (2, "b", 8), (4, "dd", 8)]
    update_delta_table(
        spark, root, "bucket = 8", {"label": "upper(label)"}
    )
    got = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert got == [(1, "a", 7), (2, "B", 8), (4, "DD", 8)]
    # rewritten files carry PHYSICAL names
    import pyarrow.parquet as pq

    snap = delta_snapshot(spark, root)
    newest = max(
        snap.files, key=lambda r: os.path.getmtime(os.path.join(root, r))
    )
    assert "v" in pq.read_schema(os.path.join(root, newest)).names
    assert all("d" in pv for pv in snap.files.values())


def test_merge_on_mapped_table_after_rename(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltalog import (
        merge_into_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "label")
    src = spark.createDataFrame(
        [(2, "B2", 8), (9, "new", 1)], "id long, label string, d long"
    )
    merge_into_delta_table(spark, root, src, merge_keys=["id"])
    got = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert got == [(1, "a", 7), (2, "B2", 8), (9, "new", 1)]


def test_cdf_on_mapped_table(spark, tmp_path):
    """r12: change data feed works on a name-mapped table — change
    files carry physical names, table_changes emits logical ones."""
    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
        enable_change_data_feed,
        read_delta_changes,
        update_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_change_data_feed(spark, root)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "label")
    v_del = delete_from_delta_table(spark, root, "label = 'a'")
    v_upd = update_delta_table(spark, root, "id = 2", {"label": "'B'"})
    write_delta_commit(
        spark,
        spark.createDataFrame([(3, "c", 9)], "id long, label string, d long"),
        root,
    )
    changes = read_delta_changes(spark, root, v_del)
    got = sorted(
        (r["_change_type"], r["id"], r["label"]) for r in changes.collect()
    )
    assert got == [
        ("delete", 1, "a"),
        ("insert", 3, "c"),
        ("update_postimage", 2, "B"),
        ("update_preimage", 2, "b"),
    ]
    # the change files themselves are PHYSICAL-named
    import pyarrow.parquet as pq

    cdc_dir = os.path.join(root, "_change_data")
    one = sorted(os.listdir(cdc_dir))[0]
    names = pq.read_schema(os.path.join(cdc_dir, one)).names
    assert "v" in names and "_change_type" in names and "label" not in names


def test_dv_delete_on_mapped_table(spark, tmp_path):
    """r12: deletion-vector DELETE/UPDATE on a name-mapped table —
    the DML scan reads physically, the DV marks rows without touching
    files, and the mapped+DV read path strips exactly those rows."""
    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
        update_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "label")
    delete_from_delta_table(spark, root, "label = 'a'",
                            use_deletion_vectors=True)
    snap = delta_snapshot(spark, root)
    assert snap.deletion_vectors  # marked, not rewritten
    got = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert got == [(2, "b", 8)]
    update_delta_table(spark, root, "id = 2", {"label": "'B'"},
                       use_deletion_vectors=True)
    got = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert got == [(2, "B", 8)]


def test_shallow_clone_of_mapped_table(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltalog import (
        shallow_clone_delta_table,
    )

    root = str(tmp_path / "src")
    _mk(spark, root)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "label")
    dst = str(tmp_path / "dst")
    shallow_clone_delta_table(spark, root, dst)
    out = read_delta_table(spark, dst)
    assert [f.name for f in out.schema.fields] == ["id", "label", "d"]
    assert sorted(map(tuple, out.collect())) == [(1, "a", 7), (2, "b", 8)]
    # the clone can keep renaming independently
    rename_delta_column(spark, dst, "label", "tag")
    assert [f.name for f in read_delta_table(spark, dst).schema.fields] == [
        "id", "tag", "d",
    ]
    assert [f.name for f in read_delta_table(spark, root).schema.fields] == [
        "id", "label", "d",
    ]


def test_dv_merge_on_mapped_table(spark, tmp_path):
    from fintech_lakehouse_spark.sources.deltalog import (
        merge_into_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)
    enable_column_mapping(spark, root)
    rename_delta_column(spark, root, "v", "label")
    src = spark.createDataFrame(
        [(1, "A2", 70), (9, "new", 1)], "id long, label string, d long"
    )
    merge_into_delta_table(spark, root, src, merge_keys=["id"],
                           use_deletion_vectors=True)
    got = sorted(map(tuple, read_delta_table(spark, root).collect()))
    assert got == [(1, "A2", 70), (2, "b", 8), (9, "new", 1)]


def test_reorg_purge_sheds_dropped_column_and_dvs(spark, tmp_path):
    """r13: REORG APPLY (PURGE) — after DROP COLUMN the old parquet
    still physically carries the dropped column, and DV'd rows still
    occupy bytes; the purge rewrite re-encodes exactly the live bytes
    (current schema only, deletion vectors applied), and VACUUM then
    reclaims the superseded files and bins."""
    import pyarrow.parquet as pq

    from fintech_lakehouse_spark.sources.deltalog import (
        delete_from_delta_table,
        drop_delta_column,
        reorg_delta_table_purge,
        vacuum_delta_table,
    )

    root = str(tmp_path / "t")
    _mk(spark, root)  # columns id, v, d
    enable_column_mapping(spark, root)
    drop_delta_column(spark, root, "v")
    delete_from_delta_table(spark, root, "id = 2",
                            use_deletion_vectors=True)
    # pre-purge: the files still carry v's physical column + a DV
    snap = delta_snapshot(spark, root)
    assert snap.deletion_vectors
    old_names = pq.read_schema(
        os.path.join(root, sorted(snap.files)[0])
    ).names
    assert "v" in old_names
    reorg_delta_table_purge(spark, root, target_files=1)
    snap2 = delta_snapshot(spark, root)
    assert not snap2.deletion_vectors
    assert len(snap2.files) == 1
    new_names = pq.read_schema(
        os.path.join(root, sorted(snap2.files)[0])
    ).names
    assert "v" not in new_names  # dropped column physically gone
    assert sorted(map(tuple, read_delta_table(spark, root).collect())) == [
        (1, 7)
    ]
    reclaimed = vacuum_delta_table(spark, root)
    assert any(r.endswith(".parquet") for r in reclaimed)
    assert sorted(map(tuple, read_delta_table(spark, root).collect())) == [
        (1, 7)
    ]


def test_id_mode_map_key_struct_roundtrip(spark, tmp_path):
    """r14 (VERDICT r13 item 8): id-mode writes with STRUCT-bearing map
    KEYS — the last stamping refusal, now rebuilt through a key-array
    transform + map_from_arrays. Footer field ids verified at the
    key-struct level; write → read-back roundtrips."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import Row

    root = str(tmp_path / "t")
    schema = (
        "id long, m map<struct<a:long,b:string>, struct<x:long>>"
    )
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, {Row(a=7, b="k"): Row(x=70)})], schema
        ),
        root,
    )
    _flip_to_id_mode(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [
                (2, {Row(a=8, b="m"): Row(x=80),
                     Row(a=9, b="n"): Row(x=90)}),
                (3, None),
            ],
            schema,
        ),
        root,
        mode="overwrite",
    )
    out = read_delta_table(spark, root)
    got = {r["id"]: r["m"] for r in out.collect()}
    assert got[3] is None
    m2 = {tuple(k): tuple(v) for k, v in got[2].items()}
    assert m2 == {(8, "m"): (70 + 10,), (9, "n"): (90,)}
    # footer ids exist INSIDE the map's key struct and value struct
    snap = delta_snapshot(spark, root)
    rel = sorted(snap.files)[0]
    ids = {}

    def walk(fld):
        md = fld.metadata or {}
        if b"PARQUET:field_id" in md:
            ids[fld.name] = int(md[b"PARQUET:field_id"])
        t = fld.type
        if pa.types.is_struct(t):
            for i in range(t.num_fields):
                walk(t.field(i))
        elif pa.types.is_map(t):
            walk(t.key_field)
            walk(t.item_field)

    for fld in pq.read_schema(os.path.join(root, rel)):
        walk(fld)
    # _flip_to_id_mode DFS: id=1, m=2, key.a=3, key.b=4, value.x=5
    assert ids == {
        "col-1": 1, "col-2": 2, "col-3": 3, "col-4": 4, "col-5": 5
    }
    # append after the overwrite stacks on top
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(4, {Row(a=1, b="z"): Row(x=10)})], schema
        ),
        root,
    )
    assert read_delta_table(spark, root).count() == 3
