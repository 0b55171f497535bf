"""Custom PYTHON data source (Spark 4 DataSource API, SURVEY §2.1
S12 complement): a paginated JSONL feed — the shape of every
REST-export / object-store drop-zone integration — implemented
entirely in Python, so unlike the Kafka/JDBC/Avro wrappers
(sources/connectors.py) it EXECUTES offline: no jars, the connector
code itself is the product.

Layout contract: a directory of ``page-<n>.jsonl`` files, one JSON
object per line — what a paginated API dump or an incremental
export lands. The source exposes:

* batch reads with one InputPartition PER PAGE (pages parse in
  parallel across executors, not on the driver);
* source-side equality-filter pushdown (rows drop at parse time,
  before they ever reach Spark — the Python-source analog of
  parquet's PushedFilters);
* a streaming reader with page-index offsets: each micro-batch
  covers [start, latest) pages, offsets checkpoint through the
  standard mechanism, so a restarted query resumes at the first
  unseen page — exactly-once per page without any connector-side
  state files.

Values are parsed per the user-declared schema (long/double/string
fields); missing keys become NULL, matching semi-structured source
convention.
"""

from __future__ import annotations

import json
import os
import re
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    WriterCommitMessage,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.types import StructType

_PAGE_RE = re.compile(r"^page-(\d+)\.jsonl$")


def page_files(path: str) -> list[tuple[int, str]]:
    """Sorted (page_no, absolute_path) pairs under ``path``."""
    out = []
    for name in os.listdir(path):
        m = _PAGE_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(path, name)))
    return sorted(out)


class PagePartition(InputPartition):
    def __init__(self, page_no: int, file_path: str):
        self.page_no = page_no
        self.file_path = file_path


def _parse_page(
    file_path: str, schema: "StructType", eq_filters: dict[str, object]
) -> Iterator[tuple]:
    names = [f.name for f in schema.fields]
    with open(file_path, "r", encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            if any(obj.get(k) != v for k, v in eq_filters.items()):
                continue  # pushed filter: dropped source-side
            yield tuple(obj.get(n) for n in names)


class PagedJsonReader(DataSourceReader):
    def __init__(self, schema: "StructType", options: dict):
        self._schema = schema
        self._path = options["path"]
        self._eq: dict[str, object] = {}

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept equality filters on top-level columns; everything
        else is returned to Spark to evaluate post-scan (the standard
        partial-pushdown contract)."""
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1:
                self._eq[f.attribute[0]] = f.value
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self):
        return [PagePartition(n, p) for n, p in page_files(self._path)]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        return _parse_page(partition.file_path, self._schema, self._eq)


class PagedJsonStreamReader(DataSourceStreamReader):
    def __init__(self, schema: "StructType", options: dict):
        self._schema = schema
        self._path = options["path"]

    def initialOffset(self) -> dict:  # noqa: N802
        return {"next_page": 0}

    def latestOffset(self) -> dict:  # noqa: N802
        pages = page_files(self._path)
        return {"next_page": (pages[-1][0] + 1) if pages else 0}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["next_page"], end["next_page"]
        return [
            PagePartition(n, p) for n, p in page_files(self._path) if lo <= n < hi
        ] or [PagePartition(-1, "")]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        if partition.page_no < 0:
            return iter(())  # empty batch placeholder partition
        return _parse_page(partition.file_path, self._schema, {})

    def commit(self, end: dict) -> None:
        pass  # offsets checkpoint via the engine; pages are immutable


class PagedJsonDataSource(DataSource):
    """``spark.read.format("pagedjson").schema(s).option("path", d)``
    after ``spark.dataSource.register(PagedJsonDataSource)``; same for
    ``readStream``. Schema is user-declared (a paginated API has a
    contract, not an inferred shape)."""

    @classmethod
    def name(cls) -> str:
        return "pagedjson"

    def reader(self, schema: "StructType") -> PagedJsonReader:
        return PagedJsonReader(schema, self.options)

    def streamReader(self, schema: "StructType") -> PagedJsonStreamReader:
        return PagedJsonStreamReader(schema, self.options)

    def writer(self, schema: "StructType", overwrite: bool) -> "PagedJsonWriter":
        return PagedJsonWriter(schema, self.options, overwrite)

    def streamWriter(
        self, schema: "StructType", overwrite: bool
    ) -> "PagedJsonStreamWriter":
        return PagedJsonStreamWriter(schema, self.options)


class _PageCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class PagedJsonWriter(DataSourceWriter):
    """Two-phase paged write: each task streams its partition to a
    UUID-named ``.tmp`` file (invisible to readers — page_files only
    matches ``page-<n>.jsonl``) and returns it in the commit message;
    the DRIVER's commit() renames the temp files onto the next
    contiguous page numbers. The rename step is what makes the write
    atomic-per-job: a failed or speculative task's temp file is never
    named into the page sequence — the same staged-rename discipline
    as sources/writers.py's ``__staging`` protocol. Cleanup is
    SELF-HEALING rather than abort-dependent: a task dying
    mid-iteration reaps its own temp (write()'s except path), and
    commit() reaps any stale temps from prior failed jobs, because on
    this Spark build the JVM-side job abort does NOT round-trip into
    the Python writer's abort() (observed; abort() is still
    implemented for builds where it does)."""

    def __init__(self, schema: "StructType", options: dict, overwrite: bool):
        self._schema = schema
        self._path = options["path"]
        self._overwrite = overwrite

    def write(self, iterator) -> "_PageCommit":
        import uuid

        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f".{uuid.uuid4().hex}.tmp")
        n = 0
        try:
            with open(tmp, "w", encoding="utf-8") as fh:
                for row in iterator:
                    fh.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
        except BaseException:
            # abort() only sees COMPLETED tasks' commit messages — a
            # task dying mid-iteration must reap its own temp file or
            # crash leftovers accumulate invisibly (they never become
            # pages, but they also never get cleaned).
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        return _PageCommit(tmp, n)

    def commit(self, messages) -> None:
        committed = {
            m.tmp_path for m in messages if m is not None
        }
        # Reap crash leftovers from PRIOR failed jobs: the engine's
        # JVM-side abort does not round-trip into the Python writer
        # (PythonBatchWrite aborts without calling abort() here —
        # observed on this Spark build), so completed-then-aborted
        # tasks orphan their temp files. Single-writer layout (page
        # numbering assumes it) makes reaping every non-this-job temp
        # safe; vacuum_paged_dir does the same standalone.
        for name in os.listdir(self._path):
            full = os.path.join(self._path, name)
            if name.endswith(".tmp") and full not in committed:
                os.remove(full)
        if self._overwrite:
            for _, p in page_files(self._path):
                os.remove(p)
        existing = page_files(self._path)
        next_no = (existing[-1][0] + 1) if existing else 0
        for m in messages:
            if m is None or m.rows == 0:
                if m is not None and os.path.exists(m.tmp_path):
                    os.remove(m.tmp_path)  # empty partition: no page
                continue
            os.rename(
                m.tmp_path, os.path.join(self._path, f"page-{next_no}.jsonl")
            )
            next_no += 1

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class PagedJsonStreamWriter(DataSourceStreamWriter):
    """Streaming sink: every micro-batch appends its pages through the
    same temp-then-rename protocol. Page numbering continues from the
    directory state, so a feed written here is immediately readable by
    the streaming READER of another query — the loopback tested in
    tests/test_pydatasource.py."""

    def __init__(self, schema: "StructType", options: dict):
        self._inner = PagedJsonWriter(schema, options, overwrite=False)

    def write(self, iterator) -> "_PageCommit":
        return self._inner.write(iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        self._inner.commit(messages)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        self._inner.abort(messages)


def vacuum_paged_dir(path: str) -> int:
    """Remove crash-leftover ``.tmp`` files from a paged directory
    (the standalone twin of the reap PagedJsonWriter.commit performs;
    same single-writer assumption, same rationale as
    sources/writers.py::vacuum_lake_table's ``__staging`` cleanup).
    Returns the number of files removed."""
    removed = 0
    if not os.path.isdir(path):
        return 0
    for name in os.listdir(path):
        if name.endswith(".tmp"):
            os.remove(os.path.join(path, name))
            removed += 1
    return removed
