#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
registered query on Spark and its DuckDB oracle side-by-side, compare
row count + column names + order-insensitive DTYPE-SENSITIVE value
hashes.

The comparator mirrors the driver byte-for-byte (VERDICT r2 item 2):
  * Spark side fetched via ``toPandas()``; DuckDB side via ``.df()``.
  * Columns sorted by name, then per-row ``pd.util.hash_pandas_object``
    with ``index=False``; the sorted multiset of row hashes must match.
  * This is dtype-sensitive on purpose: DuckDB returns integer ``SUM``s
    as HUGEINT which ``.df()`` converts to float64, while Spark emits
    int64 — ``5.0`` vs ``5`` hash differently even though ``==`` holds.
    The round-1/2 gate compared ``fetchall()`` Python values and was
    blind to that channel for two rounds running (CORRECTNESS_r01
    ``event_props_extract``, CORRECTNESS_r02 ``stratified_sample_rates``).
  * List/dict/ndarray cells make ``hash_pandas_object`` raise — that is
    the driver's behavior too (CORRECTNESS_r01 ``segment_nation_arrays``),
    so the gate reports it as a failure rather than working around it.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
Env:   CHECK_ORACLES_JOBS=N  run N queries concurrently (default 1;
       4 roughly halves the full-registry wall — Spark schedules the
       concurrent actions fairly, DuckDB gets one connection per
       thread). Output order becomes nondeterministic above 1.
       CHECK_ORACLES_MASTER / CHECK_ORACLES_SHUFFLE /
       CHECK_ORACLES_CONF (k=v,k=v) perturb the Spark config — the
       r13 stale-green re-sweep runs the same gate under a deliberately
       different parallelism/AQE shape to catch plans that only pass
       at the default config.
"""

from __future__ import annotations

import os
import sys
import threading
import time
import traceback
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from fintech_lakehouse_spark.plans import ORACLES, QUERIES
from fintech_lakehouse_spark.session import get_spark
from fintech_lakehouse_spark.sources.readers import TESTDATA_TABLES


def normalize_temporal(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize temporal columns to datetime64[ns].

    The two fetch paths represent the same instant differently — Spark
    ``toPandas()`` gives datetime64[ns] for timestamps and object
    ``datetime.date`` for dates, DuckDB ``.df()`` gives datetime64[us]
    for both — and the driver is GREEN on every temporal query
    (CORRECTNESS_r02: hourly_event_windows, daily_order_metrics, …), so
    its comparator tolerates temporal representation while staying
    strict on int64-vs-float64. Mirror that: unify temporal units,
    never touch numeric dtypes."""
    import datetime as _dt

    df = df.copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[ns]")
        elif s.dtype == object:
            nn = s.dropna()
            if len(nn) and all(
                isinstance(v, (_dt.date, _dt.datetime)) for v in nn.head(10)
            ):
                df[c] = pd.to_datetime(s)
    return df


def row_hashes(df: pd.DataFrame) -> list:
    """Sorted multiset of per-row hashes, columns ordered by name.

    ``hash_pandas_object`` hashes the underlying numpy values, so int64
    vs float64 produces different hashes even when values compare
    equal — exactly like the driver (VERDICT r2 defect #1)."""
    df = normalize_temporal(df)
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(pd.util.hash_pandas_object(df, index=False).tolist())


def dtype_report(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    """Human diagnostics for a hash mismatch: per-column dtype pairs."""
    out = []
    for c in sorted(spark_df.columns):
        s, d = spark_df[c].dtype, duck_df[c].dtype if c in duck_df else "?"
        mark = "" if str(s) == str(d) else "  <-- DTYPE"
        out.append(f"    {c}: spark={s} duck={d}{mark}")
    return "\n".join(out)


def check_one(spark, sf_dir: str, name, fn, local) -> tuple[str, bool]:
    """Run one query + oracle compare; returns (report line, ok)."""
    t0 = time.time()
    try:
        spark_pd = fn(spark, sf_dir).toPandas()
    except Exception:
        return f"FAIL {name}: spark error\n{traceback.format_exc()}", False
    if name not in ORACLES:
        line = (f"ok   {name}: rows-only, {len(spark_pd)} rows "
                f"({time.time()-t0:.1f}s)")
        if spark_pd.empty:
            line += f"\nWARN {name}: zero rows"
        return line, True
    # one DuckDB connection per thread (connections are not thread-safe)
    con = getattr(local, "con", None)
    if con is None:
        con = duckdb.connect()
        for table in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {table} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
            )
        local.con = con
    try:
        duck_pd = con.execute(ORACLES[name]).df()
    except Exception:
        return f"FAIL {name}: duckdb error\n{traceback.format_exc()}", False
    problems = []
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        problems.append(
            f"columns {sorted(spark_pd.columns)} vs {sorted(duck_pd.columns)}"
        )
    if len(spark_pd) != len(duck_pd):
        problems.append(f"rowcount {len(spark_pd)} vs {len(duck_pd)}")
    if not problems:
        try:
            a = row_hashes(spark_pd)
            b = row_hashes(duck_pd)
        except TypeError as e:
            problems.append(f"driver-unhashable cell: {e}")
        else:
            if a != b:
                problems.append(
                    "value-hash mismatch; dtypes:\n"
                    + dtype_report(spark_pd, duck_pd)
                )
    if problems:
        return f"FAIL {name}: {'; '.join(problems)}", False
    return f"PASS {name}: {len(spark_pd)} rows ({time.time()-t0:.1f}s)", True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    jobs = int(os.environ.get("CHECK_ORACLES_JOBS", "1"))
    master = os.environ.get("CHECK_ORACLES_MASTER", "local[8]")
    shuffle = os.environ.get("CHECK_ORACLES_SHUFFLE", "8")
    conf = {"spark.sql.shuffle.partitions": shuffle}
    for kv in os.environ.get("CHECK_ORACLES_CONF", "").split(","):
        if "=" in kv:
            k, _, v = kv.partition("=")
            conf[k.strip()] = v.strip()
    spark = get_spark("oracle-check", master=master, extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    local = threading.local()
    todo = [(n, f) for n, f in QUERIES.items() if not only or n in only]
    failures = 0
    if jobs <= 1:
        for name, fn in todo:
            line, ok = check_one(spark, sf_dir, name, fn, local)
            print(line)
            failures += 0 if ok else 1
    else:
        with ThreadPoolExecutor(max_workers=jobs) as pool:
            results = pool.map(
                lambda nf: check_one(spark, sf_dir, nf[0], nf[1], local), todo
            )
            for line, ok in results:
                print(line)
                failures += 0 if ok else 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
