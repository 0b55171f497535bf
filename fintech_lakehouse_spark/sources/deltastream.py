"""Streaming DELTA source over the offline ``_delta_log`` bridge —
a Spark 4 PYTHON DataSource (``format("deltabridge")``) whose stream
OFFSETS are log versions, the same contract as delta-spark's own
streaming source: each micro-batch covers the table versions in
``(start, end]``, offsets checkpoint through the standard mechanism,
and a restarted query resumes at the first unseen version —
exactly-once per commit with no connector-side state.

Modes:

* default — APPEND stream: each batch yields the rows ADDED by its
  versions' dataChange add actions. A version that REMOVES data (a
  DELETE/UPDATE/MERGE/overwrite rewrite) breaks append semantics, so
  it RAISES unless ``skipChangeCommits=true`` (delta's option: such
  commits are skipped wholesale) — fail closed, never silently wrong.
* ``readChangeFeed=true`` — CDF stream: versions yield their
  row-level changes (``_change_type`` / ``_commit_version`` /
  ``_commit_timestamp_ms`` columns): cdc files verbatim when the
  commit carries them, synthesized inserts for plain appends,
  synthesized deletes (read at the prior snapshot) for plain removes
  — the same reconstruction rule as
  ``deltalog.read_delta_changes``.
* ``maxVersionsPerTrigger=N`` — micro-batch pacing (delta's
  maxFilesPerTrigger analog at the commit grain): each trigger admits
  at most N versions. Use with processing-time triggers;
  ``availableNow`` snapshots the end offset ONCE, so a rate limit
  would end that run early (the engine-side trigger semantics).

The STREAMING SINK (``df.writeStream.format("deltabridge")``, r12)
publishes one log version per micro-batch with a SetTransaction
action — txn-watermark exactly-once across restarts and log expiry
(see :class:`DeltaBridgeStreamWriter`).

The batch reader (``spark.read.format("deltabridge")``) serves the
LIVE snapshot with one InputPartition per data file; deletion vectors
decode in the partition reader (pure Python + pyarrow — executors
drop exactly the indexed rows), and partition-column values attach
from the log's partitionValues, typed per the table schema. TIME
TRAVEL (r13): ``versionAsOf`` / ``timestampAsOf`` read options, the
delta-spark batch contract (timestamp → greatest commit at-or-before
it, ICT-aware; mutually exclusive; pre-first-commit raises).

Everything here runs WITHOUT a SparkSession (driver planning reads
the log with os/json/pyarrow only — classic AND v2 checkpoints),
which is what lets the source derive its own schema from the table
metaData. Column-mapped tables read and write in BOTH modes: name
(physical parquet names, logical emit — r12) and id (r13 — reads
resolve each file's columns by parquet footer field id with
physicalName fallback; writes stamp the footers via pyarrow field
metadata); fail-closed scope: partition/value types beyond the
simple scalar set refuse at plan time.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Iterator
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from fintech_lakehouse_spark.sources.deltalog import (
    LOG_DIR,
    _apply_action,
    _checkpoint_files,
    _commit_versions,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.types import StructType


def _fix_pa_maps(action: dict) -> dict:
    """pyarrow renders parquet MAP columns as key/value TUPLE LISTS;
    the action machinery expects dicts (``conf.get`` etc. — a replay
    of a checkpointed table with a non-empty configuration crashed
    before this, r12). Dict-ify every map-typed action field."""

    def fix(d: dict, key: str) -> None:
        v = d.get(key)
        if isinstance(v, list):
            d[key] = dict(v)

    md = action.get("metaData")
    if isinstance(md, dict):
        fix(md, "configuration")
        fmt = md.get("format")
        if isinstance(fmt, dict):
            fix(fmt, "options")
    for k in ("add", "remove", "cdc"):
        a = action.get(k)
        if isinstance(a, dict):
            fix(a, "partitionValues")
            fix(a, "tags")
    return action


def _pa_checkpoint_actions(p: str) -> list[dict]:
    """One parquet checkpoint/sidecar file → action dicts (pure
    pyarrow; nulls dropped, maps dict-ified, replay-irrelevant
    commitInfo stripped — txn rows are KEPT, they carry the streaming
    sink's exactly-once watermarks)."""
    import pyarrow.parquet as pq

    out = []
    for row in pq.read_table(p).to_pylist():
        action = {
            k: ({vk: vv for vk, vv in v.items() if vv is not None}
                if isinstance(v, dict) else v)
            for k, v in row.items()
            if v is not None
        }
        action.pop("commitInfo", None)
        if action:
            out.append(_fix_pa_maps(action))
    return out


def _pure_v2_checkpoint_actions(log: str, ck_path: str) -> list[dict]:
    """V2-checkpoint replay WITHOUT Spark (r12): parse the manifest
    (json lines or parquet) for its own protocol/metaData actions and
    sidecar references, then flatten every sidecar parquet under
    ``_delta_log/_sidecars/``. Fails closed on a missing sidecar or a
    checkpointMetadata version mismatch — the same contract as
    deltalog's Spark-side ``_v2_checkpoint_actions``."""
    v = int(os.path.basename(ck_path).split(".")[0])
    raw: list[dict] = []
    if ck_path.endswith(".json"):
        with open(ck_path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    raw.append(json.loads(line))
    else:
        raw = _pa_checkpoint_actions(ck_path)
    out: list[dict] = []
    sidecars: list[str] = []
    for a in raw:
        if "checkpointMetadata" in a:
            cm_v = a["checkpointMetadata"].get("version")
            if cm_v is not None and int(cm_v) != v:
                raise ValueError(
                    f"v2 checkpoint {ck_path}: checkpointMetadata "
                    f"version {cm_v} != file version {v} — corrupt"
                )
            continue
        if "sidecar" in a:
            sidecars.append(a["sidecar"]["path"])
            continue
        a.pop("commitInfo", None)
        if a:
            out.append(a)
    for rel in sidecars:
        full = os.path.join(log, "_sidecars", rel)
        if not os.path.isfile(full):
            raise ValueError(
                f"v2 checkpoint {ck_path}: sidecar {rel!r} is missing "
                "— refusing a partial snapshot"
            )
        out.extend(_pa_checkpoint_actions(full))
    return out


def _pure_snapshot(path: str, version: int | None = None) -> dict:
    """Log replay WITHOUT a SparkSession: classic AND v2 checkpoints
    read via pyarrow/json, JSON commits via json — the same action
    machinery as deltalog (gapless guard included). Returns the raw
    state dict."""
    log = os.path.join(path, LOG_DIR)
    versions = _commit_versions(log)
    found = _checkpoint_files(log, version if version is not None else 1 << 62)
    ckpt, ck_paths = (found if found else (None, []))
    if version is None:
        pool = versions + ([ckpt] if ckpt is not None else [])
        if not pool:
            raise FileNotFoundError(f"no Delta commits under {log}")
        version = max(pool)
    state: dict = {
        "schema": None,
        "partition_columns": [],
        "files": {},
        "column_mapping": {},
        "column_mapping_mode": "none",
        "dvs": {},
        "protocol_raw": {},
        "metadata_raw": {},
        "adds_raw": {},
        "txns": {},
        "domain_metadata": {},
    }
    if ckpt is not None:
        if len(ck_paths) == 1 and len(
            os.path.basename(ck_paths[0]).split(".")
        ) == 4:
            for action in _pure_v2_checkpoint_actions(log, ck_paths[0]):
                _apply_action(state, action)
        else:
            for p in ck_paths:
                for action in _pa_checkpoint_actions(p):
                    _apply_action(state, action)
    start = (ckpt + 1) if ckpt is not None else 0
    replay = [v for v in versions if start <= v <= version]
    if replay != list(range(start, version + 1)):
        raise ValueError(
            f"Delta log under {log} is GAPPED for version {version} — "
            "refusing to replay a partial log"
        )
    for v in replay:
        with open(os.path.join(log, f"{v:020d}.json")) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _apply_action(state, json.loads(line))
    if state["schema"] is None:
        raise ValueError(f"no metaData action under {log}")
    state["version"] = version
    return state


def _row_plan(snap: dict) -> list:
    """(logical, is_partition, physical, field_id) per schema field.
    field_id is set only in ID mapping mode (r13) — the executor-side
    read resolves the ACTUAL per-file column name from the parquet
    footer's field ids, falling back to physicalName (the spec
    requires it alongside the id)."""
    mapping = snap["column_mapping"] or {}
    id_mode = snap["column_mapping_mode"] == "id"
    part = set(snap["partition_columns"])
    plan = []
    for f in snap["schema"].fields:
        fid = None
        if id_mode:
            raw = (f.metadata or {}).get("delta.columnMapping.id")
            fid = int(raw) if raw is not None else None
        plan.append(
            (f.name, f.name in part, mapping.get(f.name, f.name), fid)
        )
    return plan


def _commit_actions(path: str, v: int) -> list[dict]:
    out = []
    with open(os.path.join(path, LOG_DIR, f"{v:020d}.json")) as fh:
        for line in fh:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _commit_ts_ms(path: str, v: int) -> int:
    f = os.path.join(path, LOG_DIR, f"{v:020d}.json")
    for a in _commit_actions(path, v):
        if "commitInfo" in a:
            info = a["commitInfo"]
            ts = info.get("inCommitTimestamp", info.get("timestamp"))
            if ts:
                return int(ts)
    return int(os.path.getmtime(f) * 1000)


_SIMPLE_PV_CASTS = {
    "long": int,
    "integer": int,
    "short": int,
    "byte": int,
    "double": float,
    "float": float,
    "string": str,
    "boolean": lambda s: s.lower() == "true",
}


def _typed_pv(value, type_name: str, col: str):
    if value is None:
        return None
    cast = _SIMPLE_PV_CASTS.get(type_name)
    if cast is None:
        raise NotImplementedError(
            f"deltabridge source: partition column {col!r} of type "
            f"{type_name!r} — only {sorted(_SIMPLE_PV_CASTS)} supported"
        )
    return cast(value)


class DeltaFilePartition(InputPartition):
    def __init__(
        self,
        file_path: str,
        dv_json: str | None,
        pvals: dict,
        change_type: str | None = None,
        version: int | None = None,
        ts_ms: int | None = None,
        has_change_col: bool = False,
        keep_dv_json: str | None = None,
        rt_base: int | None = None,
        rt_dcv: int | None = None,
    ):
        self.file_path = file_path
        self.dv_json = dv_json  # descriptor of row indexes to DROP
        self.pvals = pvals  # partition column -> typed value
        self.change_type = change_type
        self.version = version
        self.ts_ms = ts_ms
        self.has_change_col = has_change_col
        # row tracking (r14): the add's baseRowId /
        # defaultRowCommitVersion when the read asked for row ids
        self.rt_base = rt_base
        self.rt_dcv = rt_dcv
        # descriptor of the ONLY row indexes to emit (r13 — the CDF
        # stream's DV-diff partitions: "the rows this commit deleted")
        self.keep_dv_json = keep_dv_json


def _variant_cols(snap: dict) -> frozenset:
    """VARIANT columns gate the pure reader (probed r15, kept
    fail-closed): the emission half exists — the row loop rebuilds
    VariantVal from the files' (metadata, value) struct when this
    returns names — but Spark writes variant columns with the Parquet
    VARIANT LogicalType, which this container's pyarrow cannot parse
    at all (``Metadata contains Thrift LogicalType that is not
    recognized`` at file open), so the scan itself is the blocker, not
    the value rebuild. Refuse by name; the engine path
    (deltalog.read_delta_table) reads variant tables natively."""
    bad = sorted(
        f.name
        for f in snap["schema"].fields
        if "variant" in f.dataType.json()
    )
    if bad:
        raise NotImplementedError(
            f"deltabridge read: VARIANT columns {bad} are not supported "
            "by the no-Spark reader (this pyarrow cannot parse the "
            "Parquet VARIANT LogicalType) — use "
            "deltalog.read_delta_table"
        )
    return frozenset()


def _read_partition(
    table_path: str,
    part: DeltaFilePartition,
    row_plan: list,
    rt_cols: tuple | None = None,
    variant_cols: frozenset = frozenset(),
) -> Iterator[tuple]:
    """Executor-side file read: pyarrow scan of the declared data
    columns (+ the cdc file's own _change_type when present), deletion
    vector indexes dropped, rows emitted in DECLARED schema order
    (``row_plan``: (logical, is_partition, physical, field_id)
    quadruples — data files are read by PHYSICAL name (r12, name-mode
    column mapping; physical == logical on unmapped tables) or by the
    footer's parquet FIELD ID (r13, id mode — per-file resolution,
    physicalName fallback), partition values come from the log,
    everything emits under LOGICAL names), CDF metadata appended last
    when streaming changes."""
    import pyarrow.parquet as pq

    full = os.path.join(table_path, part.file_path)
    read_name = {c: phys for c, is_pv, phys, fid in row_plan if not is_pv}
    if any(fid is not None for _, is_pv, _, fid in row_plan if not is_pv):
        by_id = {}
        for fld in pq.read_schema(full):
            md = fld.metadata or {}
            raw = md.get(b"PARQUET:field_id")
            if raw is not None:
                by_id[int(raw)] = fld.name
        for c, is_pv, phys, fid in row_plan:
            if not is_pv and fid is not None and fid in by_id:
                read_name[c] = by_id[fid]
    cols = [read_name[c] for c, is_pv, _, _ in row_plan if not is_pv]
    if part.has_change_col:
        cols.append("_change_type")
    rt = part.rt_base is not None
    rt_present: list[str] = []
    if rt:
        # row-id read (r14): the MATERIALIZED columns ride along when
        # the file physically has them (preserved rows after OPTIMIZE /
        # CoW DML); fresh files simply lack them → fresh resolution
        in_file = {f.name for f in pq.read_schema(full)}
        rt_present = [c for c in (rt_cols or ()) if c in in_file]
        cols = cols + rt_present
    table = pq.read_table(full, columns=cols)
    if rt:
        import pyarrow as pa

        # physical row index captured BEFORE any DV filtering — DV
        # masks remove rows but never renumber the survivors
        table = table.append_column(
            "_rt_idx", pa.array(range(table.num_rows), type=pa.int64())
        )
    if part.dv_json or part.keep_dv_json:
        from fintech_lakehouse_spark.sources.deletionvectors import (
            decode_deletion_vector,
        )

        import numpy as np
        import pyarrow as pa

        mask = np.ones(table.num_rows, dtype=bool)
        if part.dv_json:
            deleted = decode_deletion_vector(
                table_path, json.loads(part.dv_json)
            )
            idx = np.asarray(deleted, dtype=np.int64)
            if idx.size and int(idx.max()) >= table.num_rows:
                # ADVICE r10: an index past the file's row count means
                # the DV and data file DISAGREE — fail closed like
                # everywhere else instead of silently returning the
                # extra rows
                raise ValueError(
                    f"deletion vector for {part.file_path} marks row "
                    f"{int(idx.max())} but the file has only "
                    f"{table.num_rows} rows — DV/file mismatch"
                )
            mask[idx] = False
        if part.keep_dv_json:
            keep = decode_deletion_vector(
                table_path, json.loads(part.keep_dv_json)
            )
            kidx = np.asarray(keep, dtype=np.int64)
            if kidx.size and int(kidx.max()) >= table.num_rows:
                raise ValueError(
                    f"DV-diff for {part.file_path} selects row "
                    f"{int(kidx.max())} but the file has only "
                    f"{table.num_rows} rows — DV/file mismatch"
                )
            kmask = np.zeros(table.num_rows, dtype=bool)
            kmask[kidx] = True
            mask &= kmask
        table = table.filter(pa.array(mask))
    if variant_cols:
        from pyspark.sql.types import VariantVal

        def _cell(c, r):
            v = r[read_name[c]]
            if c in variant_cols and v is not None:
                # files store variant as struct<metadata, value>
                return VariantVal(v["value"], v["metadata"])
            return v

    else:

        def _cell(c, r):
            return r[read_name[c]]

    rows = table.to_pylist()
    for r in rows:
        base = [
            part.pvals[c] if is_pv else _cell(c, r)
            for c, is_pv, phys, fid in row_plan
        ]
        if part.change_type is not None or part.has_change_col:
            ct = r.get("_change_type") if part.has_change_col else None
            base.append(ct if ct is not None else part.change_type)
            base.append(part.version)
            base.append(part.ts_ms)
        if rt:
            rid_col, rcv_col = rt_cols
            rid = r.get(rid_col) if rid_col in rt_present else None
            rcv = r.get(rcv_col) if rcv_col in rt_present else None
            base.append(
                rid if rid is not None else part.rt_base + r["_rt_idx"]
            )
            base.append(rcv if rcv is not None else part.rt_dcv)
        yield tuple(base)


def _resolve_as_of(path: str, options: dict) -> int | None:
    """TIME TRAVEL resolution for the batch bridge (r13, delta-spark's
    ``versionAsOf`` / ``timestampAsOf`` read options): a timestamp
    resolves to the greatest committed version whose commit timestamp
    is ≤ the given epoch-milliseconds (ICT-aware via
    :func:`_commit_ts_ms`); both options together, or a timestamp
    before the first commit, raise like delta-spark does."""
    v_opt = options.get("versionasof") or options.get("versionAsOf")
    t_opt = options.get("timestampasof") or options.get("timestampAsOf")
    if v_opt is not None and t_opt is not None:
        raise ValueError(
            "deltabridge read: versionAsOf and timestampAsOf are "
            "mutually exclusive"
        )
    if v_opt is not None:
        return int(v_opt)
    if t_opt is None:
        return None
    ts = int(t_opt)
    versions = _commit_versions(os.path.join(path, LOG_DIR))
    best = None
    for v in sorted(versions):
        if _commit_ts_ms(path, v) <= ts:
            best = v
    if best is None:
        raise ValueError(
            f"deltabridge read: timestampAsOf={ts} precedes the first "
            "available commit — nothing to time-travel to"
        )
    return best


class DeltaBridgeReader(DataSourceReader):
    def __init__(self, path: str, options: dict | None = None):
        self.path = path
        options = options or {}
        snap = _pure_snapshot(
            path, version=_resolve_as_of(path, options)
        )
        self.snap = snap
        self.part_cols = snap["partition_columns"]
        mapping = snap["column_mapping"] or {}
        self.mapping = mapping
        # r15 (was an r14 fail-closed refusal): top-level VARIANT
        # columns rebuild through VariantVal in the row emission;
        # nested variants still refuse inside _variant_cols
        self.variant_cols = _variant_cols(snap)
        self.row_plan = _row_plan(snap)
        self.part_types = {
            f.name: f.dataType.typeName()
            for f in snap["schema"].fields
            if f.name in self.part_cols
        }
        # rowIds=true (r14): append _row_id/_row_commit_version — the
        # same materialized-or-fresh resolution as the engine's
        # read_delta_table(row_ids=True), executor-side
        self.rt_cols: tuple | None = None
        if str(options.get("rowids", "false")).lower() == "true":
            from fintech_lakehouse_spark.sources.deltalog import (
                _rt_materialized_names,
                row_tracking_enabled,
            )

            if not row_tracking_enabled(snap["metadata_raw"]):
                raise ValueError(
                    "deltabridge read: rowIds=true but the table does "
                    "not declare delta.enableRowTracking"
                )
            if snap["column_mapping_mode"] in ("name", "id"):
                raise NotImplementedError(
                    "deltabridge read: rowIds on a column-mapped table "
                    "is not implemented — refusing"
                )
            no_base = sorted(
                r
                for r in snap["files"]
                if (snap["adds_raw"].get(r) or {}).get("baseRowId")
                is None
            )
            if no_base:
                raise ValueError(
                    f"deltabridge read: live files {no_base[:3]} carry "
                    "no baseRowId — refusing to fabricate row ids"
                )
            self.rt_cols = _rt_materialized_names(snap["metadata_raw"])

    def partitions(self):
        out = []
        for rel in sorted(self.snap["files"]):
            pv = self.snap["files"][rel]
            dv = self.snap["dvs"].get(rel)
            # partitionValues are keyed by PHYSICAL name on a mapped
            # table; the partition dict hands executors LOGICAL keys
            pvals = {
                c: _typed_pv(
                    pv.get(self.mapping.get(c, c)), self.part_types[c], c
                )
                for c in self.part_cols
            }
            kwargs = {}
            if self.rt_cols is not None:
                add = self.snap["adds_raw"].get(rel) or {}
                kwargs = {
                    "rt_base": int(add["baseRowId"]),
                    "rt_dcv": int(
                        add.get("defaultRowCommitVersion") or 0
                    ),
                }
            out.append(
                DeltaFilePartition(
                    rel, json.dumps(dv) if dv else None, pvals, **kwargs
                )
            )
        return out

    def read(self, partition: DeltaFilePartition) -> Iterator[tuple]:
        return _read_partition(
            self.path, partition, self.row_plan, rt_cols=self.rt_cols,
            variant_cols=self.variant_cols,
        )


class DeltaBridgeStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, options: dict):
        self.path = path
        self.cdf = str(options.get("readchangefeed", "false")).lower() == "true"
        self.skip_change = (
            str(options.get("skipchangecommits", "false")).lower() == "true"
        )
        starting = options.get("startingversion")
        snap = _pure_snapshot(path)
        self.part_cols = snap["partition_columns"]
        self.mapping = snap["column_mapping"] or {}
        self.row_plan = _row_plan(snap)
        self.variant_cols = _variant_cols(snap)
        self.part_types = {
            f.name: f.dataType.typeName()
            for f in snap["schema"].fields
            if f.name in self.part_cols
        }
        if starting is not None:
            self.start_version = int(starting) - 1
        else:
            # default: everything the log still has
            self.start_version = -1
        mv = options.get("maxversionspertrigger")
        self.max_versions = int(mv) if mv else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("maxVersionsPerTrigger must be >= 1")
        self._last_end = self.start_version

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"version": self.start_version}

    def latestOffset(self) -> dict:  # noqa: N802
        versions = _commit_versions(os.path.join(self.path, LOG_DIR))
        latest = max(versions) if versions else self.start_version
        if self.max_versions is not None:
            # micro-batch pacing (delta's maxFilesPerTrigger analog at
            # the commit grain): admit at most N versions per trigger,
            # tracked from the previous admitted end
            latest = min(latest, self._last_end + self.max_versions)
        self._last_end = max(self._last_end, latest)
        return {"version": latest}

    def partitions(self, start: dict, end: dict):
        # a restarted query resumes from the CHECKPOINTED offset, which
        # a fresh reader instance hasn't seen — let the engine's own
        # range drive the pacing tracker forward
        self._last_end = max(self._last_end, start["version"],
                             end["version"])
        out = []
        for v in range(start["version"] + 1, end["version"] + 1):
            out.extend(self._version_partitions(v))
        return out

    def _typed_pvals(self, pv: dict) -> dict:
        """The log's (physically keyed) partitionValues → typed
        values under LOGICAL names, the executor emit contract."""
        return {
            c: _typed_pv(
                (pv or {}).get(self.mapping.get(c, c)),
                self.part_types[c],
                c,
            )
            for c in self.part_cols
        }

    def _version_partitions(self, v: int) -> list:
        actions = _commit_actions(self.path, v)
        adds = [
            a["add"]
            for a in actions
            if "add" in a and a["add"].get("dataChange", True)
        ]
        removes = [
            a["remove"]
            for a in actions
            if "remove" in a and a["remove"].get("dataChange", True)
        ]
        cdcs = [a["cdc"] for a in actions if "cdc" in a]
        ts = _commit_ts_ms(self.path, v)
        if self.cdf:
            if cdcs:
                return [
                    DeltaFilePartition(
                        unquote(c["path"]),
                        None,
                        self._typed_pvals(c.get("partitionValues")),
                        None,
                        v,
                        ts,
                        has_change_col=True,
                    )
                    for c in cdcs
                ]
            dv_adds = [a for a in adds if a.get("deletionVector")]
            plain_adds = [a for a in adds if not a.get("deletionVector")]
            re_added = {unquote(a["path"]) for a in adds}
            prev = None
            if (dv_adds or removes or plain_adds) and v > 0:
                prev = _pure_snapshot(self.path, version=v - 1)
            parts = []
            from fintech_lakehouse_spark.sources.deletionvectors import (
                decode_deletion_vector,
                encode_roaring_bitmap_array,
                z85_encode,
            )

            def _keep_desc(indexes) -> str:
                bitmap = encode_roaring_bitmap_array(sorted(indexes))
                return json.dumps(
                    {
                        "storageType": "i",
                        "pathOrInlineDv": z85_encode(bitmap),
                        "offset": None,
                        "sizeInBytes": len(bitmap),
                        "cardinality": len(indexes),
                    }
                )

            if dv_adds:
                # r13 (VERDICT r12 item 2): reconstruct row-level
                # changes from the per-file DV DIFF — newly masked
                # indexes are deletes, newly unmasked inserts. The
                # diff ships to the executor as an INLINE roaring
                # descriptor (keep_dv_json), decoded by the same
                # machinery as real DVs.
                for a in dv_adds:
                    rel = unquote(a["path"])
                    old = prev["dvs"].get(rel)
                    old_idx = (
                        set(decode_deletion_vector(self.path, old))
                        if old
                        else set()
                    )
                    new_idx = set(
                        decode_deletion_vector(
                            self.path, a["deletionVector"]
                        )
                    )
                    newly = new_idx - old_idx
                    restored = old_idx - new_idx
                    pvals = self._typed_pvals(
                        a.get("partitionValues")
                        or prev["files"].get(rel)
                    )
                    if newly:
                        parts.append(
                            DeltaFilePartition(
                                rel, None, pvals, "delete", v, ts,
                                keep_dv_json=_keep_desc(newly),
                            )
                        )
                    if restored:
                        parts.append(
                            DeltaFilePartition(
                                rel, None, pvals, "insert", v, ts,
                                keep_dv_json=_keep_desc(restored),
                            )
                        )
            for a in plain_adds:
                rel = unquote(a["path"])
                if prev is not None and rel in prev["dvs"]:
                    # RESTORE shape (r14, VERDICT r13 item 6): the DV
                    # dropped from a live file — the previously-masked
                    # rows transition dead→live, so exactly they are
                    # the inserts (keep_dv_json mask). Refuse only the
                    # truly ambiguous case: the file's bytes changed
                    # too, so the old DV names unknowable rows.
                    old_add = prev["adds_raw"].get(rel) or {}
                    if (
                        old_add.get("size") is not None
                        and a.get("size") is not None
                        and old_add["size"] != a["size"]
                    ):
                        raise NotImplementedError(
                            f"deltabridge CDF stream: version {v} "
                            f"re-adds {rel!r} without its deletion "
                            "vector AND with a different size — the "
                            "old DV's indexes no longer name known "
                            "rows; refusing an ambiguous "
                            "reconstruction"
                        )
                    restored = sorted(
                        decode_deletion_vector(
                            self.path, prev["dvs"][rel]
                        )
                    )
                    if restored:
                        parts.append(
                            DeltaFilePartition(
                                rel,
                                None,
                                self._typed_pvals(
                                    a.get("partitionValues")
                                    or prev["files"].get(rel)
                                ),
                                "insert",
                                v,
                                ts,
                                keep_dv_json=_keep_desc(restored),
                            )
                        )
                    continue
                parts.append(
                    DeltaFilePartition(
                        rel,
                        None,
                        self._typed_pvals(a.get("partitionValues")),
                        "insert",
                        v,
                        ts,
                    )
                )
            for r in removes:
                rel = unquote(r["path"])
                if rel in re_added:
                    continue  # the DV-swap half, handled above
                # r13: a removed file that carried a DV synthesizes
                # deletes for its LIVE rows only — its old descriptor
                # rides as the DROP mask
                old = prev["dvs"].get(rel) if prev else None
                parts.append(
                    DeltaFilePartition(
                        rel,
                        json.dumps(old) if old else None,
                        self._typed_pvals(
                            (prev["files"].get(rel) if prev else None)
                            or r.get("partitionValues")
                        ),
                        "delete",
                        v,
                        ts,
                    )
                )
            return parts
        # append-stream mode
        if removes or any(a.get("deletionVector") for a in adds):
            if self.skip_change:
                return []  # delta's skipChangeCommits: drop wholesale
            raise ValueError(
                f"deltabridge stream: version {v} changes existing data "
                "(remove/deletion-vector actions) — an append stream "
                "cannot represent it; set skipChangeCommits=true to "
                "skip such commits, or stream the change feed"
            )
        out = []
        for a in adds:
            pv = a.get("partitionValues") or {}
            pvals = {
                c: _typed_pv(
                    pv.get(self.mapping.get(c, c)), self.part_types[c], c
                )
                for c in self.part_cols
            }
            out.append(DeltaFilePartition(unquote(a["path"]), None, pvals))
        return out

    def read(self, partition: DeltaFilePartition) -> Iterator[tuple]:
        return _read_partition(
            self.path, partition, self.row_plan,
            variant_cols=self.variant_cols,
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are the only state; the log itself is durable


_PA_TYPES = {
    "long": "int64",
    "integer": "int32",
    "short": "int16",
    "byte": "int8",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool",
    "date": "date32",
    "timestamp_ntz": "timestamp[us]",
    "timestamp": "timestamp[us]",
}


def _pv_string(value, type_name: str, col: str):
    """Serialize one partition value to the log's STRING form, the
    inverse of :func:`_typed_pv` (null stays null; booleans lower;
    numerics via str). Restricted to the same simple types the bridge
    reader accepts — fail closed on the rest."""
    if value is None:
        return None
    if type_name not in _SIMPLE_PV_CASTS:
        raise NotImplementedError(
            f"deltabridge write: partition column {col!r} of type "
            f"{type_name!r} — only {sorted(_SIMPLE_PV_CASTS)} supported"
        )
    if type_name == "boolean":
        return "true" if value else "false"
    return str(value)


class _DeltaWriteCommit(WriterCommitMessage):
    """One staged parquet per partition-value combination the task
    saw: ``files`` is a list of (tmp_path, partitionValues-dict).
    ``id_bounds`` (r13): identity column → (min, max) over the task's
    rows — the driver folds these into the table's high-water mark."""

    def __init__(self, files: list, rows: int, id_bounds: dict | None = None):
        self.files = files
        self.rows = rows
        self.id_bounds = id_bounds or {}


class DeltaBridgeWriter(DataSourceWriter):
    """``df.write.format("deltabridge")`` — the WRITE half of the
    bridge through Spark 4's Python DataSource API (r11): executors
    write parquet pages of their partition via pyarrow into a staging
    dir; the driver's ``commit()`` promotes them to
    ``part-<version>-<n>.parquet``, builds add actions (with per-file
    stats) and publishes the next log version through deltalog's
    put-if-absent commit — append or overwrite, exactly-once at the
    commit grain, ICT maintained automatically by ``_write_commit``.
    No SparkSession is touched anywhere: the snapshot checks replay
    the log with :func:`_pure_snapshot`.

    PARTITIONED tables (r12): pass ``.option("partitionBy",
    "col1,col2")`` at table creation; appends to an existing
    partitioned table derive the spec from the log (an explicit
    option must match it — the ADVICE-r8 rule from
    write_delta_commit). Executors split their rows by partition
    tuple and stage ONE parquet per combination, physically EXCLUDING
    the partition columns (the protocol stores those only in the add
    actions' partitionValues); the bridge/Spark readers rebuild them
    from the log.

    CHECK constraints and GENERATED columns validate executor-side
    (r13: duckdb over the staged arrow rows — an expression the
    offline evaluator cannot parse fails closed); IDENTITY columns
    accept explicit values when allowExplicitInsert is declared and
    the commit advances the high-water mark (GENERATED ALWAYS refuses
    explicit values — delta's own rule).

    Fail-closed scope (each would corrupt silently if ignored):
    schema mismatch vs the table, unsupported
    writerFeatures, delta.appendOnly under overwrite, overwrite of a
    DV-carrying table (the removes must carry DV descriptors),
    partition columns of non-simple types."""

    def __init__(self, schema: "StructType", options: dict, overwrite: bool):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("deltabridge write requires .option('path')")
        self.overwrite = overwrite
        opt_pb = options.get("partitionby") or options.get("partitionBy")
        self.opt_part_cols = (
            [c.strip() for c in opt_pb.split(",") if c.strip()]
            if opt_pb
            else None
        )
        for f in schema.fields:
            if f.dataType.typeName() not in _PA_TYPES:
                raise NotImplementedError(
                    f"deltabridge write: column {f.name!r} type "
                    f"{f.dataType.typeName()!r} unsupported"
                )
        self.stage = os.path.join(
            self.path, f"_pystage_{__import__('uuid').uuid4().hex}"
        )
        # fail FAST on the driver before any executor work (the same
        # checks re-run at commit time against the then-current log)
        self._validate()

    def _resolve_part_cols(self, snap: dict | None) -> list:
        """The effective partition spec: the TABLE's when it exists
        (an explicit option must agree), else the option's."""
        if snap is not None:
            table_pc = list(snap["partition_columns"])
            if (
                self.opt_part_cols is not None
                and self.opt_part_cols != table_pc
            ):
                raise ValueError(
                    "deltabridge write: partitionBy mismatch vs table "
                    f"(table is partitioned by {table_pc}, write "
                    f"specifies {self.opt_part_cols}) — changing a "
                    "table's partitioning requires replacing the table"
                )
            part_cols = table_pc
        else:
            part_cols = list(self.opt_part_cols or [])
        names = {f.name for f in self.schema.fields}
        missing = [c for c in part_cols if c not in names]
        if missing:
            raise ValueError(
                f"deltabridge write: partition columns {missing} not in "
                f"the written schema {sorted(names)}"
            )
        if part_cols and len(part_cols) == len(names):
            raise ValueError(
                "deltabridge write: every column is a partition column — "
                "data files would be empty"
            )
        for f in self.schema.fields:
            if (
                f.name in part_cols
                and f.dataType.typeName() not in _SIMPLE_PV_CASTS
            ):
                raise NotImplementedError(
                    f"deltabridge write: partition column {f.name!r} of "
                    f"type {f.dataType.typeName()!r} — only "
                    f"{sorted(_SIMPLE_PV_CASTS)} supported"
                )
        return part_cols

    def write(self, iterator) -> "_DeltaWriteCommit":
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        names = [f.name for f in self.schema.fields]
        part_cols = self.part_cols
        pidx = [names.index(c) for c in part_cols]
        data_fields = [f for f in self.schema.fields if f.name not in
                       set(part_cols)]
        didx = [names.index(f.name) for f in data_fields]
        # rows grouped by partition tuple; unpartitioned tables have
        # the single () group
        groups: dict[tuple, list] = {}
        all_rows: list = []
        check_rows = bool(
            getattr(self, "constraints", None)
            or getattr(self, "generated", None)
            or getattr(self, "identity", None)
        )
        n_rows = 0
        for row in iterator:
            key = tuple(row[i] for i in pidx)
            groups.setdefault(key, []).append(tuple(row[i] for i in didx))
            if check_rows:
                all_rows.append(tuple(row))
            n_rows += 1
        if n_rows == 0:
            return _DeltaWriteCommit([], 0)
        id_bounds: dict = {}
        if check_rows:
            id_bounds = self._validate_rows(all_rows)
        del all_rows
        os.makedirs(self.stage, exist_ok=True)
        files = []
        phys = getattr(self, "phys", {}) or {}
        field_ids = getattr(self, "field_ids", {}) or {}
        pa_fields = []
        for f in data_fields:
            meta = None
            if f.name in field_ids:
                meta = {
                    b"PARQUET:field_id": str(field_ids[f.name]).encode()
                }
            pa_fields.append(
                pa.field(
                    phys.get(f.name, f.name),
                    pa.type_for_alias(_PA_TYPES[f.dataType.typeName()]),
                    metadata=meta,
                )
            )
        pa_schema = pa.schema(pa_fields)
        for key in sorted(groups, key=lambda k: tuple(map(str, k))):
            rows = groups[key]
            arrays = [
                pa.array(
                    [r[i] for r in rows],
                    pa.type_for_alias(_PA_TYPES[f.dataType.typeName()]),
                )
                for i, f in enumerate(data_fields)
            ]
            tmp = os.path.join(self.stage, f"{uuid.uuid4().hex}.parquet")
            pq.write_table(
                pa.Table.from_arrays(arrays, schema=pa_schema), tmp
            )
            pvals = {
                phys.get(c, c): _pv_string(
                    key[j],
                    self.schema[c].dataType.typeName(),
                    c,
                )
                for j, c in enumerate(part_cols)
            }
            files.append((tmp, pvals))
        return _DeltaWriteCommit(files, n_rows, id_bounds)

    def _validate_rows(self, all_rows: list) -> dict:
        """Executor-side row validation (r13): CHECK constraints and
        generated-column derivations evaluate over the task's rows via
        duckdb on an arrow batch — SQL-expression evaluation with no
        SparkSession. An expression duckdb cannot parse (a
        Spark-dialect-only function) fails CLOSED with a pointer to
        the engine path, never silently accepts. Returns the identity
        columns' (min, max) bounds for the driver's high-water-mark
        fold."""
        import duckdb
        import pyarrow as pa

        names = [f.name for f in self.schema.fields]
        if self.constraints or self.generated:
            arrays = {
                f.name: pa.array(
                    [r[i] for r in all_rows],
                    pa.type_for_alias(_PA_TYPES[f.dataType.typeName()]),
                )
                for i, f in enumerate(self.schema.fields)
            }
            batch = pa.table(arrays)
            con = duckdb.connect()
            con.register("_dl_rows", batch)
            checks = [
                (
                    f"CHECK constraint {name!r} ({expr})",
                    f"NOT coalesce(({expr}), TRUE)",
                )
                for name, expr in sorted(self.constraints.items())
            ] + [
                (
                    f"generated column {name!r} "
                    f"(GENERATED ALWAYS AS ({expr}))",
                    f'NOT ("{name}" IS NOT DISTINCT FROM ({expr}))',
                )
                for name, expr in sorted(self.generated.items())
            ]
            for label, predicate in checks:
                try:
                    bad = con.execute(
                        f"SELECT * FROM _dl_rows WHERE {predicate} "
                        "LIMIT 1"
                    ).fetchall()
                except Exception as exc:  # noqa: BLE001 — dialect gap
                    raise NotImplementedError(
                        f"deltabridge write: {label} is not evaluatable "
                        f"offline ({exc}) — use "
                        "deltalog.write_delta_commit"
                    ) from None
                if bad:
                    raise ValueError(
                        f"deltabridge write: {label} violated by row "
                        f"{dict(zip(names, bad[0]))}"
                    )
        id_bounds: dict = {}
        for name in sorted(self.identity):
            i = names.index(name)
            vals = [r[i] for r in all_rows if r[i] is not None]
            if len(vals) != len(all_rows):
                raise ValueError(
                    f"deltabridge write: identity column {name!r} "
                    "contains NULLs"
                )
            if vals:
                id_bounds[name] = (min(vals), max(vals))
        return id_bounds

    def _validate(self):
        """Driver-side fail-closed gates against the CURRENT log (pure
        replay, no Spark)."""
        from fintech_lakehouse_spark.sources.deltalog import (
            _SUPPORTED_WRITER_FEATURES,
            generated_columns,
            identity_columns,
            table_constraints,
        )

        log = os.path.join(self.path, LOG_DIR)
        # the table EXISTS if any commit JSON survives OR a checkpoint
        # covers the expired ones (r12: treating a checkpoint-only log
        # as "table creation" skipped every gate AND the streaming
        # sink's replay detection after expire_delta_log)
        if not os.path.isdir(log) or not (
            _commit_versions(log) or _checkpoint_files(log, 1 << 62)
        ):
            self.part_cols = self._resolve_part_cols(None)
            self.phys = {}
            self.field_ids = {}
            self.constraints = {}
            self.generated = {}
            self.identity = {}
            return None  # table creation
        snap = _pure_snapshot(self.path)
        feats = (snap["protocol_raw"] or {}).get("writerFeatures") or []
        unknown = sorted(set(feats) - _SUPPORTED_WRITER_FEATURES)
        if unknown:
            raise NotImplementedError(
                f"deltabridge write: writerFeatures {unknown} not "
                "implemented — refusing"
            )
        conf = (snap["metadata_raw"] or {}).get("configuration") or {}
        self.part_cols = self._resolve_part_cols(snap)
        # column mapping (r12; id mode r13): executors stage parquet
        # under the PHYSICAL names and the add actions key
        # partitionValues physically; id mode additionally stamps the
        # footers with parquet field ids (pyarrow maps the
        # PARQUET:field_id field-metadata key on write)
        self.phys = dict(snap["column_mapping"] or {})
        self.field_ids = {}
        if snap["column_mapping_mode"] == "id":
            for f in snap["schema"].fields:
                raw = (f.metadata or {}).get("delta.columnMapping.id")
                if raw is None:
                    raise ValueError(
                        f"deltabridge write: id-mode field {f.name!r} "
                        "lacks columnMapping.id metadata — corrupt "
                        "table metadata"
                    )
                self.field_ids[f.name] = int(raw)
        # r13 (VERDICT r12 items 6+8): CHECK constraints and generated
        # columns validate EXECUTOR-side on the staged rows (duckdb
        # over the arrow batch — no SparkSession exists anywhere in
        # the bridge); identity columns accept explicit values when
        # the column declares allowExplicitInsert (the bridge always
        # writes every column, so values are always explicit — the
        # GENERATED ALWAYS refusal below is delta's own rule, not a
        # gap) and the commit advances the high-water mark.
        self.constraints = table_constraints(conf)
        self.generated = generated_columns(snap["schema"])
        ids = identity_columns(snap["schema"])
        always = sorted(
            n for n, s in ids.items() if not s["allow_explicit"]
        )
        if always:
            raise ValueError(
                f"deltabridge write: identity columns {always} are "
                "GENERATED ALWAYS AS IDENTITY — explicit values are "
                "not allowed (append via deltalog.write_delta_commit "
                "to have values assigned)"
            )
        self.identity = ids
        if self.overwrite:
            if str(conf.get("delta.appendOnly", "false")).lower() == "true":
                raise ValueError(
                    "deltabridge write: table is delta.appendOnly=true — "
                    "overwrite forbidden"
                )
            if snap["dvs"]:
                raise NotImplementedError(
                    "deltabridge write: overwrite of a deletion-vector "
                    "table — refusing"
                )
        want = [(f.name, f.dataType.typeName()) for f in snap["schema"].fields]
        have = [(f.name, f.dataType.typeName()) for f in self.schema.fields]
        # timestamp vs timestamp_ntz both land as parquet us — compare
        # names strictly, types by parquet physical alias
        if [w[0] for w in want] != [h[0] for h in have] or [
            _PA_TYPES.get(w[1]) for w in want
        ] != [_PA_TYPES.get(h[1]) for h in have]:
            raise ValueError(
                f"deltabridge write: schema mismatch (table {want}, "
                f"writing {have})"
            )
        return snap

    def commit(self, messages) -> None:
        import shutil

        try:
            self._publish(messages)
        finally:
            shutil.rmtree(self.stage, ignore_errors=True)

    def _publish(
        self,
        messages,
        txn_app_id: str | None = None,
        txn_batch_id: int | None = None,
    ) -> bool:
        """Promote staged files and publish ONE log version. With a
        txn identity (streaming sink), the commit carries a SetTxn
        action and a REPLAYED batch (batchId <= the table's recorded
        watermark for the appId) is skipped — the protocol's
        exactly-once rule. Returns True when a version was committed.
        """
        import uuid

        from fintech_lakehouse_spark.sources.deltalog import (
            _creation_protocol,
            _file_stats_json,
            _next_version,
            commit_with_retry,
        )

        snap = self._validate()
        if (
            txn_app_id is not None
            and snap is not None
            and txn_batch_id is not None
            and txn_batch_id <= snap["txns"].get(txn_app_id, -1)
        ):
            # REPLAYED micro-batch (engine retry after a commit):
            # the table already recorded this (appId, batchId) —
            # drop the staged files, publish nothing
            for m in messages:
                for tmp_path, _ in (m.files if m else []):
                    try:
                        os.unlink(tmp_path)
                    except OSError:
                        pass
            return False
        os.makedirs(os.path.join(self.path, LOG_DIR), exist_ok=True)
        version = _next_version(self.path)
        actions: list = []
        if version == 0:
            # TIMESTAMP_NTZ anywhere in the sink schema forces the
            # timestampNtz feature form (r14) — same rule as the
            # engine writer
            actions.append({"protocol": _creation_protocol(self.schema, 2)})
            actions.append(
                {
                    "metaData": {
                        "id": uuid.uuid4().hex,
                        "format": {
                            "provider": "parquet",
                            "options": {},
                        },
                        "schemaString": json.dumps(
                            self.schema.jsonValue()
                        ),
                        "partitionColumns": list(self.part_cols),
                        "configuration": {},
                        "createdTime": int(
                            os.path.getmtime(self.path) * 1000
                        ),
                    }
                }
            )
        n = 0
        for m in messages:
            if not m:
                continue
            for tmp_path, pvals in m.files:
                # uuid in the PROMOTED name (ADVICE r11 medium):
                # two writers racing to the same version can never
                # collide on data paths — the losing commit's
                # orphaned files are harmless, and the retry below
                # may re-point these adds at a later version
                rel = f"part-{version:05d}-{n:05d}-{uuid.uuid4().hex}.parquet"
                os.replace(tmp_path, os.path.join(self.path, rel))
                add = {
                    "path": rel,
                    "partitionValues": pvals,
                    "size": os.path.getsize(
                        os.path.join(self.path, rel)
                    ),
                    "modificationTime": int(
                        os.path.getmtime(os.path.join(self.path, rel))
                        * 1000
                    ),
                    "dataChange": True,
                }
                stats = _file_stats_json(os.path.join(self.path, rel))
                if stats:
                    add["stats"] = stats
                actions.append({"add": add})
                n += 1
        if self.overwrite and snap is not None:
            from urllib.parse import quote as _q

            now = int(os.path.getmtime(self.path) * 1000)
            for rel in sorted(snap["files"]):
                actions.append(
                    {
                        "remove": {
                            "path": _q(rel),
                            "deletionTimestamp": now,
                            "dataChange": True,
                        }
                    }
                )
        # r13: explicit identity inserts advance the table's
        # high-water mark in the SAME commit (the engine path's rule —
        # without it a later engine-side append would re-assign values
        # the bridge already wrote)
        id_specs = getattr(self, "identity", {}) or {}
        if id_specs and snap is not None:
            merged: dict = {}
            for m in messages:
                if not m:
                    continue
                for name, (lo, hi) in (
                    getattr(m, "id_bounds", {}) or {}
                ).items():
                    cur = merged.get(name)
                    merged[name] = (
                        (min(lo, cur[0]), max(hi, cur[1]))
                        if cur
                        else (lo, hi)
                    )
            new_hwm: dict = {}
            for name, spec in sorted(id_specs.items()):
                if name not in merged:
                    continue
                lo, hi = merged[name]
                cand = int(hi if spec["step"] > 0 else lo)
                hwm = spec["high_water_mark"]
                nh = (
                    cand
                    if hwm is None
                    else (
                        max(hwm, cand)
                        if spec["step"] > 0
                        else min(hwm, cand)
                    )
                )
                if hwm is None or nh != hwm:
                    new_hwm[name] = int(nh)
            if new_hwm:
                from fintech_lakehouse_spark.sources.deltalog import (
                    _schema_with_identity_hwm,
                )

                widened = _schema_with_identity_hwm(
                    snap["schema"], new_hwm
                )
                md = dict(snap["metadata_raw"])
                md["schemaString"] = json.dumps(widened.jsonValue())
                actions.append({"metaData": md})
        if snap is not None:
            from fintech_lakehouse_spark.sources.deltalog import (
                _assign_fresh_row_ids,
                _rt_hwm,
                row_tracking_enabled,
            )

            if row_tracking_enabled(snap.get("metadata_raw")):
                # row tracking (r14): bridge-written files get fresh
                # baseRowId ranges + the advanced high-water mark in
                # the same commit, like the engine writer; a rebase
                # inside commit_with_retry re-points them
                _assign_fresh_row_ids(
                    actions,
                    _rt_hwm(snap.get("domain_metadata")),
                    version,
                    self.path,
                )
        if txn_app_id is not None and txn_batch_id is not None:
            actions.append(
                {
                    "txn": {
                        "appId": txn_app_id,
                        "version": int(txn_batch_id),
                        "lastUpdated": int(
                            os.path.getmtime(self.path) * 1000
                        ),
                    }
                }
            )
        # appends REBASE past concurrent data-only commits (a txn
        # action does not break blind-append class); overwrites
        # and creation races classify as conflicts and raise
        # (commit_with_retry's WriteSerializable rules). r13 (ADVICE
        # r12 medium): the txn appId rides into the classification —
        # a concurrent commit from another run of the SAME streaming
        # query (zombie driver) raises ConcurrentTransaction instead
        # of rebasing into a double-commit; base_state lets a
        # checkpoint-only tail classify from the state diff.
        commit_with_retry(
            self.path,
            version,
            actions,
            operation="STREAMING UPDATE"
            if txn_app_id is not None
            else "WRITE",
            txn_app_id=txn_app_id,
            base_state=snap,
        )
        return True

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.stage, ignore_errors=True)


class DeltaBridgeStreamWriter(DataSourceStreamWriter):
    """``df.writeStream.format("deltabridge")`` — the STREAMING sink
    half of the bridge (r12): each micro-batch publishes ONE log
    version through the batch writer's machinery (executors stage
    parquet via pyarrow, the driver promotes + commits through
    ``commit_with_retry``), and the commit carries the protocol's
    **SetTransaction** action ``{appId, version=batchId}`` — delta's
    exactly-once rule for streaming sinks. A restarted query that
    REPLAYS its last micro-batch is recognized (the table's recorded
    txn watermark for the appId is >= the incoming batchId) and the
    batch is dropped instead of double-committed; the watermark
    survives checkpoint + log expiry because both checkpoint writers
    carry txn actions.

    The txn appId resolves in delta-spark's precedence: an explicit
    ``.option("txnAppId", ...)``, else a stable hash of the query's
    ``checkpointLocation`` (the engine passes it through to the sink
    options), else a per-run uuid (within-run retries still dedup;
    cross-restart exactly-once then needs one of the stable forms).
    Append output mode only — a streaming "complete" rewrite is the
    foreachBatch MERGE/SCD2 sinks' job. Partitioned tables and all
    the batch writer's fail-closed gates apply unchanged."""

    def __init__(self, schema: "StructType", options: dict, overwrite: bool):
        import hashlib
        import uuid

        if overwrite:
            raise NotImplementedError(
                "deltabridge streaming sink supports APPEND output mode "
                "only (use foreachBatch upsert/SCD2 sinks for "
                "complete-mode maintenance)"
            )
        self._writer = DeltaBridgeWriter(schema, options, overwrite=False)
        explicit = options.get("txnappid") or options.get("txnAppId")
        ck = options.get("checkpointlocation") or options.get(
            "checkpointLocation"
        )
        if explicit:
            self.app_id = str(explicit)
        elif ck:
            self.app_id = (
                "deltabridge-"
                + hashlib.md5(str(ck).encode("utf-8")).hexdigest()
            )
        else:
            self.app_id = f"deltabridge-run-{uuid.uuid4().hex}"

    def write(self, iterator) -> "_DeltaWriteCommit":
        return self._writer.write(iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        # rmtree like the batch writer's commit() (ADVICE r12 low:
        # _publish alone left the _stage_<uuid> dir under the table
        # root for the life of the query). Safe per micro-batch:
        # staged files are promoted or unlinked before cleanup, and
        # the next batch's executors re-mkdir the stage.
        import shutil

        try:
            self._writer._publish(
                messages, txn_app_id=self.app_id, txn_batch_id=int(batchId)
            )
        finally:
            shutil.rmtree(self._writer.stage, ignore_errors=True)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        import shutil

        try:
            for m in messages:
                for tmp_path, _ in (m.files if m else []):
                    try:
                        os.unlink(tmp_path)
                    except OSError:
                        pass
        finally:
            shutil.rmtree(self._writer.stage, ignore_errors=True)


class DeltaBridgeDataSource(DataSource):
    """``spark.read.format("deltabridge").option("path", ...)`` /
    ``spark.readStream.format("deltabridge")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "deltabridge"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("deltabridge requires .option('path', ...)")
        return path

    def schema(self) -> "StructType":
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        snap = _pure_snapshot(
            self._path(),
            version=_resolve_as_of(self._path(), dict(self.options)),
        )
        fields = list(snap["schema"].fields)
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            fields += [
                StructField("_change_type", StringType(), True),
                StructField("_commit_version", LongType(), True),
                StructField("_commit_timestamp_ms", LongType(), True),
            ]
        if str(self.options.get("rowids", "false")).lower() == "true":
            fields += [
                StructField("_row_id", LongType(), True),
                StructField("_row_commit_version", LongType(), True),
            ]
        return StructType(fields)

    def reader(self, schema: "StructType") -> DeltaBridgeReader:
        return DeltaBridgeReader(self._path(), dict(self.options))

    def writer(self, schema: "StructType", overwrite: bool) -> DeltaBridgeWriter:
        return DeltaBridgeWriter(schema, dict(self.options), overwrite)

    def streamReader(self, schema: "StructType") -> DeltaBridgeStreamReader:
        return DeltaBridgeStreamReader(self._path(), dict(self.options))

    def streamWriter(
        self, schema: "StructType", overwrite: bool
    ) -> DeltaBridgeStreamWriter:
        return DeltaBridgeStreamWriter(schema, dict(self.options), overwrite)


def register_deltabridge_source(spark) -> None:
    """Idempotent registration:
    ``spark.dataSource.register(DeltaBridgeDataSource)``."""
    spark.dataSource.register(DeltaBridgeDataSource)
