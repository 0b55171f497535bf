"""Round-12 surface: optimistic-concurrency commits
(``deltalog.commit_with_retry``), partitioned writes through the
deltabridge Python DataSource writer, uuid-embedded promoted data
file names, and the ADVICE-r11 fixes (fractional partition-prune
literals, ICT survival across log expiry, RESTORE gates)."""

from __future__ import annotations

import json
import os

import pytest

from fintech_lakehouse_spark.sources.deltalog import (
    DeltaConcurrentWriteError,
    _next_version,
    _write_commit,
    checkpoint_delta_table,
    commit_with_retry,
    delta_snapshot,
    enable_in_commit_timestamps,
    expire_delta_log,
    prune_delta_files,
    read_delta_table,
    restore_delta_table,
    write_delta_commit,
)
from fintech_lakehouse_spark.sources.deltastream import (
    register_deltabridge_source,
)


@pytest.fixture()
def registered(spark):
    register_deltabridge_source(spark)
    return spark


def _mk_table(spark, root, rows=((1, "a"), (2, "b"))):
    os.makedirs(root, exist_ok=True)
    write_delta_commit(
        spark,
        spark.createDataFrame(list(rows), "id long, v string"),
        root,
    )


def _blind_add(root, name, size=10):
    # a synthetic add action for a file that exists on disk
    full = os.path.join(root, name)
    with open(full, "wb") as fh:
        fh.write(b"x" * size)
    return {
        "add": {
            "path": name,
            "partitionValues": {},
            "size": size,
            "modificationTime": 1,
            "dataChange": True,
        }
    }


# ---------------------------------------------------------------- retry


def test_disjoint_appends_land_as_n_and_n_plus_one(spark, tmp_path):
    """The VERDICT-r11 contract: two writers that both read version N-1
    and race disjoint appends — the loser REBASES and lands at N+1,
    no data lost, no error surfaced."""
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    v = _next_version(root)
    a_writer = [_blind_add(root, "wa.parquet")]
    b_writer = [_blind_add(root, "wb.parquet")]
    # writer B wins version v out from under writer A
    _write_commit(root, v, b_writer, operation="WRITE")
    landed = commit_with_retry(root, v, a_writer, operation="WRITE")
    assert landed == v + 1
    snap = delta_snapshot(spark, root)
    assert {"wa.parquet", "wb.parquet"} <= set(snap.files)


def test_append_rebases_past_many_winners(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    v = _next_version(root)
    for i in range(3):
        _write_commit(
            root, v + i, [_blind_add(root, f"w{i}.parquet")],
            operation="WRITE",
        )
    landed = commit_with_retry(
        root, v, [_blind_add(root, "mine.parquet")], operation="WRITE"
    )
    assert landed == v + 3
    assert "mine.parquet" in delta_snapshot(spark, root).files


def test_remove_carrying_txn_conflicts_with_concurrent_data_change(
    spark, tmp_path
):
    """A transaction that tombstones files (DELETE/overwrite class)
    cannot rebase past a concurrent data change — its remove set was
    derived from a snapshot the winner invalidated."""
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    snap = delta_snapshot(spark, root)
    rel = sorted(snap.files)[0]
    v = _next_version(root)
    _write_commit(root, v, [_blind_add(root, "winner.parquet")],
                  operation="WRITE")
    ours = [
        _blind_add(root, "repl.parquet"),
        {"remove": {"path": rel, "deletionTimestamp": 1,
                    "dataChange": True}},
    ]
    with pytest.raises(DeltaConcurrentWriteError, match="stale"):
        commit_with_retry(root, v, ours, operation="DELETE")


def test_blind_append_raises_on_concurrent_metadata_change(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    snap = delta_snapshot(spark, root)
    v = _next_version(root)
    md = dict(snap.metadata_raw)
    conf = dict(md.get("configuration") or {})
    conf["foo"] = "bar"
    md["configuration"] = conf
    _write_commit(root, v, [{"metaData": md}],
                  operation="SET TBLPROPERTIES")
    with pytest.raises(DeltaConcurrentWriteError, match="metadata"):
        commit_with_retry(
            root, v, [_blind_add(root, "mine.parquet")], operation="WRITE"
        )


def test_optimize_style_datachange_false_is_not_blind(spark, tmp_path):
    """dataChange=false adds mark a REWRITE (OPTIMIZE): the chosen
    input files came from a snapshot, so a concurrent data change
    conflicts."""
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    v = _next_version(root)
    _write_commit(root, v, [_blind_add(root, "winner.parquet")],
                  operation="WRITE")
    compacted = _blind_add(root, "compact.parquet")
    compacted["add"]["dataChange"] = False
    with pytest.raises(DeltaConcurrentWriteError):
        commit_with_retry(root, v, [compacted], operation="OPTIMIZE")


def test_retry_budget_exhausts(spark, tmp_path, monkeypatch):
    """Bounded retries: with max_retries=0 the loser surfaces the
    conflict instead of rebasing."""
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    v = _next_version(root)
    _write_commit(root, v, [_blind_add(root, "w.parquet")],
                  operation="WRITE")
    with pytest.raises(DeltaConcurrentWriteError, match="gave up"):
        commit_with_retry(
            root, v, [_blind_add(root, "m.parquet")],
            operation="WRITE", max_retries=0,
        )


# --------------------------------------------- bridge writer: partitions


def test_bridge_partitioned_create_and_roundtrip(registered, tmp_path):
    """partitionBy at table creation: partition values land in the
    log (NOT in the data files), both readers rebuild the column."""
    spark = registered
    root = str(tmp_path / "p")
    os.makedirs(root)
    rows = [(1, 7, "a"), (2, 8, "b"), (3, 7, "c"), (4, None, "d")]
    df = spark.createDataFrame(rows, "id long, d long, v string")
    (
        df.write.format("deltabridge")
        .option("path", root)
        .option("partitionBy", "d")
        .mode("append")
        .save()
    )
    snap = delta_snapshot(spark, root)
    assert snap.partition_columns == ["d"]
    # data files physically exclude the partition column
    import pyarrow.parquet as pq

    rel = sorted(snap.files)[0]
    assert "d" not in pq.read_schema(os.path.join(root, rel)).names
    # null partition value round-trips as null
    back = spark.read.format("deltabridge").option("path", root).load()
    assert sorted(map(tuple, back.collect()), key=str) == sorted(
        rows, key=str
    )
    via_spark = read_delta_table(spark, root)
    assert sorted(map(tuple, via_spark.collect()), key=str) == sorted(
        rows, key=str
    )


def test_bridge_partitioned_append_derives_spec_from_log(
    registered, tmp_path
):
    spark = registered
    root = str(tmp_path / "p")
    os.makedirs(root)
    base = spark.createDataFrame([(1, 7, "a")], "id long, d long, v string")
    (
        base.write.format("deltabridge")
        .option("path", root)
        .option("partitionBy", "d")
        .mode("append")
        .save()
    )
    more = spark.createDataFrame([(2, 9, "b")], "id long, d long, v string")
    # no partitionBy option: derived from the table
    more.write.format("deltabridge").option("path", root).mode(
        "append"
    ).save()
    snap = delta_snapshot(spark, root)
    pvals = {snap.files[rel].get("d") for rel in snap.files}
    assert pvals == {"7", "9"}
    back = spark.read.format("deltabridge").option("path", root).load()
    assert back.count() == 2


def test_bridge_partitionby_mismatch_refuses(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "p")
    _mk_table(spark, root)  # unpartitioned
    df = spark.createDataFrame([(9, "z")], "id long, v string")
    with pytest.raises(Exception, match="partitionBy mismatch"):
        (
            df.write.format("deltabridge")
            .option("path", root)
            .option("partitionBy", "id")
            .mode("append")
            .save()
        )


def test_bridge_partition_gate_all_columns(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "p")
    os.makedirs(root)
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(Exception, match="every column"):
        (
            df.write.format("deltabridge")
            .option("path", root)
            .option("partitionBy", "id")
            .mode("append")
            .save()
        )


def test_bridge_partition_gate_unknown_column(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "p")
    os.makedirs(root)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(Exception, match="not in the written schema"):
        (
            df.write.format("deltabridge")
            .option("path", root)
            .option("partitionBy", "nope")
            .mode("append")
            .save()
        )


def test_bridge_promoted_names_embed_uuid(registered, tmp_path):
    """ADVICE r11 medium: promoted data file names must be unique per
    writer so racing commits can never clobber each other's files."""
    spark = registered
    root = str(tmp_path / "u")
    os.makedirs(root)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    df.write.format("deltabridge").option("path", root).mode("append").save()
    snap = delta_snapshot(spark, root)
    rel = sorted(snap.files)[0]
    stem = rel[:-len(".parquet")]
    parts = stem.split("-")
    assert len(parts) == 4 and len(parts[3]) == 32  # uuid4 hex suffix


def test_bridge_writer_append_races_rebase(registered, tmp_path):
    """End-to-end two-writer race through the DataSource API: force
    the version the bridge computes to be stolen, and verify the
    bridge commit rebases (both appends survive)."""
    spark = registered
    root = str(tmp_path / "race")
    _mk_table(spark, root)
    import fintech_lakehouse_spark.sources.deltastream as ds

    real_next = ds.DeltaBridgeWriter.commit

    # steal the version by committing between _validate and the
    # bridge's _write_commit: monkeypatching commit itself is racy to
    # express, so instead pre-commit a winner and hand the bridge a
    # stale-version path via commit_with_retry's own behavior —
    # covered at the unit level above; here just verify the e2e append
    # path still lands when another commit slips in FIRST.
    v = _next_version(root)
    _write_commit(root, v, [_blind_add(root, "sneak.parquet")],
                  operation="WRITE")
    df = spark.createDataFrame([(9, "z")], "id long, v string")
    df.write.format("deltabridge").option("path", root).mode("append").save()
    snap = delta_snapshot(spark, root)
    assert "sneak.parquet" in snap.files
    assert real_next is ds.DeltaBridgeWriter.commit


# ------------------------------------------------------- ADVICE fixes


def test_prune_keeps_file_on_fractional_literal(spark, tmp_path):
    """ADVICE r11 high: ('k','<',3.5) on an integer partition column
    must KEEP the k=3 file (int(3.5) truncation dropped it)."""
    root = str(tmp_path / "fp")
    os.makedirs(root)
    write_delta_commit(
        spark,
        spark.createDataFrame(
            [(1, 3), (2, 4)], "id long, k long"
        ),
        root,
        partition_by=["k"],
    )
    snap = delta_snapshot(spark, root)
    kept = prune_delta_files(snap, [("k", "<", 3.5)])
    vals = {snap.files[rel].get("k") for rel in kept}
    assert vals == {"3"}
    # negative-fraction '>' case: k > -0.5 keeps k=0
    root2 = str(tmp_path / "fp2")
    os.makedirs(root2)
    write_delta_commit(
        spark,
        spark.createDataFrame([(1, 0), (2, -1)], "id long, k long"),
        root2,
        partition_by=["k"],
    )
    snap2 = delta_snapshot(spark, root2)
    kept2 = prune_delta_files(snap2, [("k", ">", -0.5)])
    assert {snap2.files[rel].get("k") for rel in kept2} == {"0"}


def test_ict_survives_log_expiry(spark, tmp_path):
    """ADVICE r11 medium: after checkpoint + expire removes every
    commit JSON, the NEXT commit on an ICT table must still carry a
    monotone inCommitTimestamp."""
    root = str(tmp_path / "ict")
    _mk_table(spark, root)
    enable_in_commit_timestamps(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(9, "z")], "id long, v string"),
        root,
    )
    prev_snap = delta_snapshot(spark, root)
    log = os.path.join(root, "_delta_log")
    last_ict = None
    with open(os.path.join(log, f"{prev_snap.version:020d}.json")) as fh:
        for line in fh:
            a = json.loads(line)
            if "commitInfo" in a:
                last_ict = a["commitInfo"].get("inCommitTimestamp")
    assert last_ict is not None
    checkpoint_delta_table(spark, root)
    expire_delta_log(spark, root)
    assert not [n for n in os.listdir(log) if n.endswith(".json")]
    v = write_delta_commit(
        spark,
        spark.createDataFrame([(10, "y")], "id long, v string"),
        root,
    )
    with open(os.path.join(log, f"{v:020d}.json")) as fh:
        first = json.loads(fh.readline())
    assert "commitInfo" in first
    new_ict = first["commitInfo"].get("inCommitTimestamp")
    assert new_ict is not None and new_ict > last_ict


def test_restore_gated_on_append_only(spark, tmp_path):
    """ADVICE r11 low: RESTORE commits removes, so delta.appendOnly
    refuses it like every other remove-generating path."""
    root = str(tmp_path / "ro")
    _mk_table(spark, root)
    write_delta_commit(
        spark,
        spark.createDataFrame([(9, "z")], "id long, v string"),
        root,
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
    with pytest.raises(Exception, match="appendOnly"):
        restore_delta_table(spark, root, version=0)


def test_jl_project_rejects_expression_columns(spark):
    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.functions.vectors import jl_project

    with pytest.raises(ValueError, match="bare column"):
        jl_project(F.col("a") + F.col("b"), [[1, -1]])
    # bare reference still works
    df = spark.createDataFrame([([1.0, 2.0],)], "emb array<double>")
    out = df.select(jl_project(F.col("emb"), [[1, -1]]).alias("p"))
    [(p,)] = out.collect()
    assert abs(p[0] - (1.0 - 2.0)) < 1e-12


def test_threaded_writers_all_land_contiguously(spark, tmp_path):
    """CONTENTION stress: 8 threads race 3 blind appends each through
    commit_with_retry against one table — all 24 commits must land at
    contiguous versions with every data file live (the serializable-
    history guarantee the retry loop exists for)."""
    import threading

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    base = _next_version(root)
    errors: list = []

    def writer(wid: int) -> None:
        try:
            for k in range(3):
                name = f"w{wid}-{k}.parquet"
                actions = [_blind_add(root, name)]
                commit_with_retry(
                    root, _next_version(root), actions,
                    operation="WRITE", max_retries=50,
                )
        except Exception as exc:  # surface in the main thread
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    log = os.path.join(root, "_delta_log")
    versions = sorted(
        int(n[:-5]) for n in os.listdir(log) if n.endswith(".json")
    )
    assert versions == list(range(0, base + 24))
    snap = delta_snapshot(spark, root)
    expect = {f"w{w}-{k}.parquet" for w in range(8) for k in range(3)}
    assert expect <= set(snap.files)


def test_write_delta_commit_concurrent_appends(spark, tmp_path):
    """r12: the MAIN writer also rides commit_with_retry — concurrent
    write_delta_commit appends all land (uuid'd file names make a lost
    race rebase-safe) and every row survives."""
    import threading

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    errors: list = []

    def writer(wid: int) -> None:
        try:
            write_delta_commit(
                spark,
                spark.createDataFrame(
                    [(100 + wid, f"w{wid}")], "id long, v string"
                ),
                root,
            )
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    out = read_delta_table(spark, root)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 100, 101, 102, 103]


def test_same_appid_txn_conflict_raises(spark, tmp_path):
    """r13 (ADVICE r12 medium): a winning commit carrying a
    SetTransaction with OUR appId means another run of the same
    streaming query committed first — rebasing would double-commit
    the micro-batch; ConcurrentTransaction raises instead."""
    from fintech_lakehouse_spark.sources.deltalog import (
        DeltaConcurrentTransactionError,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    v = _next_version(root)
    winner = [
        _blind_add(root, "winner.parquet"),
        {"txn": {"appId": "stream-abc", "version": 7, "lastUpdated": 1}},
    ]
    _write_commit(root, v, winner, operation="STREAMING UPDATE")
    ours = [
        _blind_add(root, "mine.parquet"),
        {"txn": {"appId": "stream-abc", "version": 7, "lastUpdated": 2}},
    ]
    with pytest.raises(DeltaConcurrentTransactionError, match="stream-abc"):
        commit_with_retry(
            root, v, ours, operation="STREAMING UPDATE",
            txn_app_id="stream-abc",
        )
    # a DIFFERENT appId's txn is a harmless blind append — rebases
    got = commit_with_retry(
        root,
        v,
        [
            _blind_add(root, "other.parquet"),
            {"txn": {"appId": "stream-xyz", "version": 1,
                     "lastUpdated": 3}},
        ],
        operation="STREAMING UPDATE",
        txn_app_id="stream-xyz",
    )
    assert got == v + 1


def test_checkpoint_only_tail_classifies_blind_append(spark, tmp_path):
    """r13 (VERDICT r12 item 3): log expiry between attempt and rebase
    leaves a checkpoint-only tail — a blind append classifies from the
    STATE diff (metaData/protocol unchanged) and still commits; a
    remove-carrying txn still raises with the classified reason."""
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    snap = delta_snapshot(spark, root)
    base_state = {
        "metadata_raw": snap.metadata_raw,
        "protocol_raw": snap.protocol_raw,
        "txns": {},
    }
    # winners: two data-only commits, then checkpoint + expire so their
    # JSONs vanish and only the checkpoint tail remains
    v = _next_version(root)
    for i in range(2):
        _write_commit(
            root, v + i, [_blind_add(root, f"w{i}.parquet")],
            operation="WRITE",
        )
    checkpoint_delta_table(spark, root)
    expire_delta_log(spark, root)
    log = os.path.join(root, "_delta_log")
    assert not os.path.exists(os.path.join(log, f"{v:020d}.json"))
    # blind append at the raced version: classify via checkpoint replay
    got = commit_with_retry(
        root, v, [_blind_add(root, "mine.parquet")], operation="WRITE",
        base_state=base_state,
    )
    assert got == v + 2
    snap2 = delta_snapshot(spark, root)
    assert snap2.version == v + 2
    assert "mine.parquet" in snap2.files


def test_checkpoint_only_tail_remove_txn_still_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_table(spark, root)
    snap = delta_snapshot(spark, root)
    base_state = {
        "metadata_raw": snap.metadata_raw,
        "protocol_raw": snap.protocol_raw,
        "txns": {},
    }
    rel = sorted(snap.files)[0]
    v = _next_version(root)
    _write_commit(root, v, [_blind_add(root, "w.parquet")],
                  operation="WRITE")
    checkpoint_delta_table(spark, root)
    expire_delta_log(spark, root)
    ours = [
        _blind_add(root, "repl.parquet"),
        {"remove": {"path": rel, "deletionTimestamp": 1,
                    "dataChange": True}},
    ]
    with pytest.raises(DeltaConcurrentWriteError, match="checkpointed"):
        commit_with_retry(
            root, v, ours, operation="DELETE", base_state=base_state
        )


def test_checkpoint_only_tail_same_appid_raises(spark, tmp_path):
    """The zombie-driver case THROUGH log expiry: the winner's txn
    action survives only in the checkpoint; the state's txn map still
    detects the same-appId commit."""
    from fintech_lakehouse_spark.sources.deltalog import (
        DeltaConcurrentTransactionError,
    )

    root = str(tmp_path / "t")
    _mk_table(spark, root)
    snap = delta_snapshot(spark, root)
    base_state = {
        "metadata_raw": snap.metadata_raw,
        "protocol_raw": snap.protocol_raw,
        "txns": {},
    }
    v = _next_version(root)
    _write_commit(
        root,
        v,
        [
            _blind_add(root, "w.parquet"),
            {"txn": {"appId": "stream-abc", "version": 7,
                     "lastUpdated": 1}},
        ],
        operation="STREAMING UPDATE",
    )
    checkpoint_delta_table(spark, root)
    expire_delta_log(spark, root)
    with pytest.raises(DeltaConcurrentTransactionError, match="stream-abc"):
        commit_with_retry(
            root,
            v,
            [
                _blind_add(root, "mine.parquet"),
                {"txn": {"appId": "stream-abc", "version": 7,
                         "lastUpdated": 2}},
            ],
            operation="STREAMING UPDATE",
            txn_app_id="stream-abc",
            base_state=base_state,
        )
