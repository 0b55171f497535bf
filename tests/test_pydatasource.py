"""Custom Python DataSource (sources/pydatasource.py): batch
parallelism, source-side filter pushdown, and streaming page-offset
resume — the connector surface that runs with no jars (SURVEY S12)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.sources.pydatasource import (
    PagedJsonDataSource,
    page_files,
)

SCHEMA = "id long, kind string, v double"


def _write_page(path, n: int, rows: list[dict]) -> None:
    with open(path / f"page-{n}.jsonl", "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


@pytest.fixture()
def pages(tmp_path):
    for n in range(3):
        _write_page(
            tmp_path,
            n,
            [
                {"id": n * 100 + i, "kind": "a" if i % 2 else "b", "v": i * 1.5}
                for i in range(5)
            ],
        )
    return tmp_path


def _register(spark):
    spark.dataSource.register(PagedJsonDataSource)


def test_batch_read_one_partition_per_page(spark, pages):
    _register(spark)
    df = (
        spark.read.format("pagedjson")
        .schema(SCHEMA)
        .option("path", str(pages))
        .load()
    )
    assert df.count() == 15
    assert df.rdd.getNumPartitions() == 3  # pages parse in parallel
    got = {r["id"] for r in df.collect()}
    assert got == {n * 100 + i for n in range(3) for i in range(5)}


def test_partial_filter_pushdown(spark, pages):
    """Equality filters drop source-side (pushFilters accepts them);
    the range predicate comes back unsupported and Spark evaluates it
    post-scan — the standard partial-pushdown contract, and the
    combined result must equal the full predicate either way."""
    _register(spark)
    df = (
        spark.read.format("pagedjson")
        .schema(SCHEMA)
        .option("path", str(pages))
        .load()
    )
    out = df.filter((F.col("kind") == "a") & (F.col("v") > 2.0))
    assert sorted(r["id"] for r in out.collect()) == [3, 103, 203]


def test_missing_keys_become_null(spark, tmp_path):
    _register(spark)
    _write_page(tmp_path, 0, [{"id": 1, "kind": "a"}, {"id": 2, "v": 9.0}])
    df = (
        spark.read.format("pagedjson")
        .schema(SCHEMA)
        .option("path", str(tmp_path))
        .load()
    )
    rows = {r["id"]: (r["kind"], r["v"]) for r in df.collect()}
    assert rows == {1: ("a", None), 2: (None, 9.0)}


def test_stream_resumes_at_first_unseen_page(spark, pages, tmp_path_factory):
    """Page-offset streaming: first availableNow run ingests pages
    0-2; a page landing afterwards is picked up by a SECOND run on the
    SAME checkpoint without re-reading the old pages — exactly-once
    per page via engine-checkpointed offsets, no connector state."""
    _register(spark)
    ckpt = str(tmp_path_factory.mktemp("pagedjson_ckpt"))
    # file sink, not memory: the memory sink cannot recover from a
    # checkpoint, and checkpoint RESUME is exactly what this pins
    out_dir = str(tmp_path_factory.mktemp("pagedjson_out"))

    def run_once():
        q = (
            spark.readStream.format("pagedjson")
            .schema(SCHEMA)
            .option("path", str(pages))
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = [r["id"] for r in spark.read.parquet(out_dir).collect()]
    assert len(first) == 15 and len(set(first)) == 15

    _write_page(pages, 3, [{"id": 300 + i, "kind": "c", "v": 0.0} for i in range(4)])
    run_once()
    second = [r["id"] for r in spark.read.parquet(out_dir).collect()]
    assert len(second) == 19 and len(set(second)) == 19  # no re-reads
    assert page_files(str(pages))[-1][0] == 3


def test_batch_write_roundtrip_and_overwrite(spark, tmp_path):
    """Writer side: two-phase temp-then-rename paging — pages land
    contiguously numbered, temp files never survive a commit, append
    continues the numbering, overwrite resets it, and reading the
    written directory back yields exactly the input rows."""
    import os

    _register(spark)
    out = str(tmp_path / "written")
    df = spark.createDataFrame(
        [(i, "k" + str(i % 3), float(i)) for i in range(20)],
        "id long, kind string, v double",
    ).repartition(4)
    df.write.format("pagedjson").option("path", out).mode("append").save()
    pages = page_files(out)
    assert [n for n, _ in pages] == list(range(len(pages)))
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    back = (
        spark.read.format("pagedjson").schema(SCHEMA).option("path", out).load()
    )
    assert sorted(r["id"] for r in back.collect()) == list(range(20))

    df.limit(5).write.format("pagedjson").option("path", out).mode(
        "append"
    ).save()
    assert (
        spark.read.format("pagedjson").schema(SCHEMA).option("path", out).load()
    ).count() == 25

    df.limit(3).write.format("pagedjson").option("path", out).mode(
        "overwrite"
    ).save()
    back2 = (
        spark.read.format("pagedjson").schema(SCHEMA).option("path", out).load()
    )
    assert back2.count() == 3
    assert page_files(out)[0][0] == 0  # numbering reset by overwrite


def test_stream_loopback_source_to_sink(spark, pages, tmp_path_factory):
    """Streaming loopback: pagedjson source -> pagedjson SINK. Each
    micro-batch appends pages through the same temp-then-rename
    protocol, so the sink directory is itself a valid source feed."""
    _register(spark)
    ckpt = str(tmp_path_factory.mktemp("loop_ckpt"))
    sink = str(tmp_path_factory.mktemp("loop_sink") / "feed")
    q = (
        spark.readStream.format("pagedjson")
        .schema(SCHEMA)
        .option("path", str(pages))
        .load()
        .writeStream.format("pagedjson")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = (
        spark.read.format("pagedjson").schema(SCHEMA).option("path", sink).load()
    )
    src = (
        spark.read.format("pagedjson")
        .schema(SCHEMA)
        .option("path", str(pages))
        .load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_failed_write_leaves_no_pages_and_no_temp_files(spark, tmp_path):
    """Fault injection: a task that dies mid-write must leave the
    target directory exactly as it was — no pages (commit never runs)
    and no orphaned temp files (the failing task reaps its own; abort
    only ever sees completed tasks' messages)."""
    import os

    from pyspark.sql.types import LongType
    from pyspark.sql.functions import udf

    _register(spark)
    out = str(tmp_path / "fail_out")

    @udf(LongType())
    def boom(x):
        if x == 7:
            raise RuntimeError("injected task failure")
        return x

    df = spark.range(10).select(boom(F.col("id")).alias("id"))
    with pytest.raises(Exception):
        df.write.format("pagedjson").option("path", out).mode("append").save()
    leftovers = os.listdir(out) if os.path.exists(out) else []
    # commit never ran: no pages. Completed-then-aborted tasks may
    # orphan temp files (this Spark build's JVM abort does not
    # round-trip into the Python writer) — the NEXT successful commit
    # reaps them, and vacuum_paged_dir does it standalone.
    assert not [f for f in leftovers if f.endswith(".jsonl")], leftovers

    ok = spark.range(5).select(F.col("id"))
    ok.write.format("pagedjson").option("path", out).mode("append").save()
    after = os.listdir(out)
    assert not [f for f in after if f.endswith(".tmp")], after
    back = (
        spark.read.format("pagedjson")
        .schema("id long")
        .option("path", out)
        .load()
    )
    assert sorted(r["id"] for r in back.collect()) == [0, 1, 2, 3, 4]


def test_vacuum_paged_dir_reaps_only_temps(tmp_path):
    from fintech_lakehouse_spark.sources.pydatasource import vacuum_paged_dir

    _write_page(tmp_path, 0, [{"id": 1}])
    (tmp_path / ".dead1.tmp").write_text("x")
    (tmp_path / ".dead2.tmp").write_text("y")
    assert vacuum_paged_dir(str(tmp_path)) == 2
    assert page_files(str(tmp_path)) and vacuum_paged_dir(str(tmp_path)) == 0


def test_batch_read_of_empty_drop_zone(spark, tmp_path):
    """A brand-new directory with no pages must read as an empty
    DataFrame — Spark substitutes a None partition for an empty
    partitions() list and read() crashed on it (review finding r6s5,
    execution-confirmed)."""
    d = tmp_path / "empty_zone"
    d.mkdir()
    df = (
        spark.read.format("pagedjson")
        .schema("a long, b string")
        .option("path", str(d))
        .load()
    )
    assert df.count() == 0


def test_corrupt_line_quarantines_not_poisons(spark, tmp_path):
    """One malformed JSON line must not fail the page: captured via a
    declared _corrupt_record column, or skipped without one — in
    streaming the offset could otherwise never advance past the bad
    page (review finding r6s5)."""
    d = tmp_path / "zone"
    d.mkdir()
    (d / "page-0.jsonl").write_text('{"a": 1}\nNOT JSON\n{"a": 3}\n')
    plain = (
        spark.read.format("pagedjson")
        .schema("a long")
        .option("path", str(d))
        .load()
        .collect()
    )
    assert sorted(r["a"] for r in plain) == [1, 3]
    with_capture = (
        spark.read.format("pagedjson")
        .schema("a long, _corrupt_record string")
        .option("path", str(d))
        .load()
        .collect()
    )
    bad = [r for r in with_capture if r["_corrupt_record"] is not None]
    assert len(with_capture) == 3 and len(bad) == 1
    assert bad[0]["_corrupt_record"] == "NOT JSON"


def test_stream_offset_waits_at_page_gaps(spark, tmp_path):
    """latestOffset must stop at the first missing page number: an
    out-of-order landing (page-2 visible before page-1) previously
    advanced the offset past the gap and the late page was silently
    lost forever (review finding r6s5)."""
    from fintech_lakehouse_spark.sources.pydatasource import (
        PagedJsonStreamReader,
    )

    d = tmp_path / "zone"
    d.mkdir()
    (d / "page-0.jsonl").write_text('{"a": 1}\n')
    (d / "page-2.jsonl").write_text('{"a": 3}\n')  # gap at page-1
    reader = PagedJsonStreamReader(None, {"path": str(d)})
    assert reader.latestOffset() == {"next_page": 1}  # waits at the gap
    (d / "page-1.jsonl").write_text('{"a": 2}\n')
    assert reader.latestOffset() == {"next_page": 3}  # gap filled


def test_stream_writer_replayed_batch_is_noop(spark, tmp_path):
    """A replayed micro-batch id (crash between page rename and the
    engine's checkpoint commit) must not append its pages twice
    (review finding r6s5)."""
    from pyspark.sql.types import StructType

    from fintech_lakehouse_spark.sources.pydatasource import (
        PagedJsonStreamWriter,
        page_files,
    )

    d = tmp_path / "sink"
    d.mkdir()
    w = PagedJsonStreamWriter(StructType([]), {"path": str(d)})

    class Msg:
        def __init__(self, tmp, rows):
            self.tmp_path, self.rows = tmp, rows

    def msg(content):
        import uuid

        t = d / f".{uuid.uuid4().hex}.tmp"
        t.write_text(content)
        return Msg(str(t), 1)

    w.commit([msg('{"a": 1}\n')], batchId=0)
    assert len(page_files(str(d))) == 1
    w.commit([msg('{"a": 1}\n')], batchId=0)  # replay of batch 0
    assert len(page_files(str(d))) == 1  # no duplicate page
    w.commit([msg('{"a": 2}\n')], batchId=1)
    assert len(page_files(str(d))) == 2
