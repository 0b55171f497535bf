#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
registered query on Spark and its DuckDB oracle side-by-side, compare
row count + column names + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from fintech_lakehouse_spark.plans import ORACLES, QUERIES
from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.sources.readers import TESTDATA_TABLES


class UnhashableCell(TypeError):
    """A cell value the driver's pandas-based hasher cannot hash."""


def normalize(rows: list[tuple], columns: list[str]) -> list[tuple]:
    """Sort columns by name, stringify values, sort rows.

    Mirrors the driver's comparator: FULL-precision float reprs (the
    round-1 gate rounded to 6dp, which masked last-ulp ROUND(AVG)
    divergences the driver catches) and a hard failure on list/dict/
    set/bytearray cells (the driver's pandas value-hasher raises
    `unhashable type` on those — see CORRECTNESS_r01
    segment_nation_arrays)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, (list, dict, set, bytearray)):
            raise UnhashableCell(
                f"driver-unhashable cell type {type(v).__name__}: {v!r:.80}"
            )
        if isinstance(v, bool):
            return str(bool(v))
        if isinstance(v, float):
            return repr(v)
        return str(v)

    return sorted(tuple(norm_val(row[i]) for i in order) for row in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for table in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
        )
    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failures += 1
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only, {len(spark_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            if not spark_rows:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(ORACLES[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failures += 1
            continue
        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"columns {sorted(spark_cols)} vs {sorted(duck_cols)}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if not problems:
            try:
                a = normalize(spark_rows, spark_cols)
                b = normalize(duck_rows, duck_cols)
            except UnhashableCell as e:
                problems.append(str(e))
            else:
                if a != b:
                    diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                    problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
