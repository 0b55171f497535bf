#!/usr/bin/env python
"""Multi-writer CONTENTION probe for commit_with_retry (r12): N
threads race M blind appends each against one Delta-bridge table —
measures end-to-end commits/s and the rebase amplification (how many
put-if-absent attempts the optimistic protocol burned per landed
commit). All commits must land at CONTIGUOUS versions with every data
file live, or the probe fails loudly.

Usage: python scripts/concurrency_probe.py [threads] [commits_each]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    threads = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    each = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fintech_lakehouse_spark.sources import deltalog as dl

    root = tempfile.mkdtemp(prefix="ccr_probe_")
    # seed the table without Spark: protocol+metaData commit
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    dl._write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "probe",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": 0,
                }
            },
        ],
        operation="WRITE",
    )

    attempts = [0]
    attempts_lock = threading.Lock()
    real_write = dl._write_commit

    def counting_write(*a, **kw):
        with attempts_lock:
            attempts[0] += 1
        return real_write(*a, **kw)

    dl._write_commit = counting_write
    errors: list = []

    def writer(wid: int) -> None:
        try:
            for k in range(each):
                name = f"w{wid}-{k}.parquet"
                pq.write_table(
                    pa.table({"id": pa.array([wid * 1000 + k], pa.int64())}),
                    os.path.join(root, name),
                )
                actions = [
                    {
                        "add": {
                            "path": name,
                            "partitionValues": {},
                            "size": os.path.getsize(
                                os.path.join(root, name)
                            ),
                            "modificationTime": 1,
                            "dataChange": True,
                        }
                    }
                ]
                dl.commit_with_retry(
                    root,
                    dl._next_version(root),
                    actions,
                    operation="WRITE",
                    max_retries=1000,
                )
        except Exception as exc:  # surfaces in the summary
            errors.append(repr(exc))

    t0 = time.time()
    ts = [threading.Thread(target=writer, args=(w,)) for w in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.time() - t0
    dl._write_commit = real_write

    log = os.path.join(root, "_delta_log")
    versions = sorted(
        int(n[:-5]) for n in os.listdir(log) if n.endswith(".json")
    )
    want = threads * each
    contiguous = versions == list(range(0, want + 1))
    snap = None
    live_ok = False
    if contiguous and not errors:
        state = __import__(
            "fintech_lakehouse_spark.sources.deltastream",
            fromlist=["_pure_snapshot"],
        )._pure_snapshot(root)
        expect = {f"w{w}-{k}.parquet" for w in range(threads)
                  for k in range(each)}
        live_ok = expect <= set(state["files"])
        snap = len(state["files"])
    print(
        json.dumps(
            {
                "metric": "concurrent_commits_per_sec",
                "value": round(want / wall, 1),
                "unit": "commits/s",
                "threads": threads,
                "commits": want,
                "wall_s": round(wall, 2),
                "attempts": attempts[0],
                "rebase_amplification": round(attempts[0] / max(want, 1), 2),
                "contiguous": contiguous,
                "all_files_live": live_ok,
                "errors": errors[:3],
            }
        )
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    if errors or not contiguous or not live_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
