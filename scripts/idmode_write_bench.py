#!/usr/bin/env python
"""Column-mapping write-path scale probe (r13, BASELINE §id-mode):
the SAME N-row append measured against three table states —

* ``none``  — unmapped (baseline staging write),
* ``name``  — name-mode mapping (physical-name projection: top-level
  aliases + positional struct casts),
* ``id``    — id-mode mapping (the r13 path: physical names AND
  ``parquet.field.id`` metadata at every struct level, footers
  stamped under ``spark.sql.parquet.fieldId.write.enabled``),

each with a flat and a NESTED (struct + array<struct>) schema, so the
number being bought is visible: the id-mode struct REBUILD
(CreateNamedStruct behind an isNotNull guard) versus name mode's
positional cast versus no projection at all. A read-back count
verifies each write landed resolvable.

Usage: python scripts/idmode_write_bench.py [n_rows]   (default 2M)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.sources.deltalog import (
    delta_snapshot,
    enable_column_mapping,
    read_delta_table,
    write_delta_commit,
)


def _flip_to_id(spark, root) -> None:
    """Re-commit the metaData in ID mode (nested-stamping test-helper
    semantics: ids/physicalNames at every level)."""
    import json as _json

    from pyspark.sql.types import ArrayType, MapType, StructField
    from pyspark.sql.types import StructType

    from fintech_lakehouse_spark.sources.deltalog import (
        _next_version,
        _write_commit,
    )

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
                stamp(dt.keyType), stamp(dt.valueType),
                dt.valueContainsNull,
            )
        return dt

    stamped = stamp(snap.schema)
    md = dict(snap.metadata_raw)
    md["schemaString"] = _json.dumps(stamped.jsonValue())
    conf = dict(md.get("configuration") or {})
    conf["delta.columnMapping.mode"] = "id"
    conf["delta.columnMapping.maxColumnId"] = str(counter[0])
    md["configuration"] = conf
    _write_commit(
        root,
        _next_version(root),
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": md},
        ],
        operation="SET TBLPROPERTIES",
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(
        "idmode-bench",
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "/tmp/idmode_bench"
    shutil.rmtree(base, ignore_errors=True)

    def frame(nested: bool):
        df = spark.range(n).select(
            F.col("id"),
            (F.col("id") % 997).alias("k"),
            F.sha1(F.col("id").cast("string")).alias("payload"),
        )
        if nested:
            df = df.select(
                "id",
                F.struct(
                    F.col("k").alias("k"),
                    F.col("payload").alias("payload"),
                ).alias("s"),
                F.array(
                    F.struct((F.col("id") % 7).alias("w"))
                ).alias("arr"),
            )
        return df

    for nested in (False, True):
        shape = "nested" if nested else "flat"
        for mode in ("none", "name", "id"):
            root = os.path.join(base, f"{shape}_{mode}")
            os.makedirs(root)
            write_delta_commit(spark, frame(nested).limit(10), root)
            if mode == "name":
                enable_column_mapping(spark, root)
            elif mode == "id":
                _flip_to_id(spark, root)
            df = frame(nested)
            df.count()  # materialize the input plan once (JIT warm)
            t0 = time.time()
            write_delta_commit(spark, df, root, mode="overwrite")
            dt = time.time() - t0
            got = read_delta_table(spark, root).count()
            assert got == n, (mode, shape, got)
            print(f"{shape:6s} {mode:4s}: {dt:6.2f} s  ({n} rows, "
                  f"read-back OK)")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
