#!/usr/bin/env python
"""Deletion-vector read overhead probe (BASELINE §DV, r9): one N-row
data file, an inline DV deleting every 10th row, measured against the
clean snapshot count. Reproduces the recorded 10M/1M datum.

Usage: python scripts/dv_scale_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.sources.deletionvectors import z85_encode
from fintech_lakehouse_spark.sources.deltalog import read_delta_table

WORK = "/tmp/dv_scale_bench"


def roaring_portable(values) -> bytes:
    """Spec-correct 'RoaringBitmapArray portable' encoder (array
    containers to card 4096, bitmap above) — the test-fixture encoder,
    kept here so the probe is self-contained."""
    by_key: dict = defaultdict(lambda: defaultdict(list))
    for v in sorted(values):
        by_key[v >> 32][(v & 0xFFFFFFFF) >> 16].append(v & 0xFFFF)
    out = struct.pack("<i", 1681511377) + struct.pack("<q", len(by_key))
    for key in sorted(by_key):
        containers = by_key[key]
        out += struct.pack("<i", key)
        out += struct.pack("<I", 12346)
        out += struct.pack("<I", len(containers))
        for hk in sorted(containers):
            out += struct.pack("<HH", hk, len(containers[hk]) - 1)
        pos = 0
        for hk in sorted(containers):
            n = len(containers[hk])
            out += struct.pack("<I", pos)
            pos += 2 * n if n <= 4096 else 8192
        for hk in sorted(containers):
            vals = containers[hk]
            if len(vals) <= 4096:
                out += struct.pack(f"<{len(vals)}H", *vals)
            else:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                out += struct.pack("<1024Q", *words)
    return out


def commit(root: str, version: int, actions: list) -> None:
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    spark = get_spark(
        "dv-scale",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(n).selectExpr(
        "id", "CAST(id % 97 AS STRING) AS v"
    ).coalesce(1).write.mode("overwrite").parquet(f"{WORK}/_st")
    part = next(
        p for p in os.listdir(f"{WORK}/_st") if p.endswith(".parquet")
    )
    os.replace(f"{WORK}/_st/{part}", f"{WORK}/f1.parquet")
    shutil.rmtree(f"{WORK}/_st")
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        }
    )
    meta = {
        "metaData": {
            "id": "0" * 32,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 0,
        }
    }
    add = {
        "add": {
            "path": "f1.parquet",
            "partitionValues": {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }
    commit(
        WORK, 0,
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
         meta, add],
    )
    t0 = time.monotonic()
    n_clean = read_delta_table(spark, WORK).count()
    t_clean = time.monotonic() - t0
    deleted = list(range(0, n, 10))
    bitmap = roaring_portable(deleted)
    add_dv = json.loads(json.dumps(add))
    add_dv["add"]["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(bitmap),
        "offset": None,
        "sizeInBytes": len(bitmap),
        "cardinality": len(deleted),
    }
    commit(WORK, 1, [add_dv])
    t0 = time.monotonic()
    df = read_delta_table(spark, WORK)
    t_plan = time.monotonic() - t0
    t0 = time.monotonic()
    n_dv = df.count()
    t_cnt = time.monotonic() - t0
    assert n_clean == n and n_dv == n - len(deleted)
    print(
        f"| {n} | {t_clean:.2f} s | {len(deleted)} | "
        f"{len(bitmap) / 1e6:.2f} MB | {t_plan:.2f} s | {t_cnt:.2f} s |"
    )
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
