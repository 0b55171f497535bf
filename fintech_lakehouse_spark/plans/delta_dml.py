"""Delta DML registry queries (r15): the generalized MERGE clause
surface exercised END-TO-END against a real ``_delta_log`` — the query
builds a temp Delta table from ``customer``, runs a sync-shape clause
MERGE through :func:`merge_into_delta_table` (conditional matched
delete + conditional matched update + conditional insert +
``whenNotMatchedBySource`` update/delete), and returns the post-MERGE
table state; the DuckDB oracle recomputes the same state relationally
(one FULL OUTER JOIN with the clause cascade as CASE logic — delta's
documented first-true-wins semantics).

The reference's lake layer is upsert-only (``upsert_lake_table``,
reference src/utils/spark_utils.py) — the clause surface models
delta-spark's public MERGE builder instead."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table


@register(
    "delta_merge_sync_state",
    oracle="""
    WITH tgt AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 <> 0
    ),
    src AS (
        SELECT c_custkey, c_name,
               c_acctbal + CASE WHEN c_custkey % 2 = 0
                                THEN 100 ELSE 0 END AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 5 <> 0
    ),
    j AS (
        SELECT t.c_custkey AS tk, s.c_custkey AS sk,
               t.c_name AS tn, s.c_name AS sn,
               t.c_acctbal AS tb, s.c_acctbal AS sb,
               t.c_mktsegment AS tm, s.c_mktsegment AS sm
        FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    )
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM (
        -- matched pairs, clause cascade: delete MACHINERY wins first,
        -- then the conditional balance update, else keep untouched
        SELECT tk AS c_custkey, tn AS c_name,
               CASE WHEN sb > tb THEN sb + 1 ELSE tb END AS c_acctbal,
               tm AS c_mktsegment
        FROM j WHERE tk IS NOT NULL AND sk IS NOT NULL
          AND sm <> 'MACHINERY'
        UNION ALL
        -- source-only: conditional insert
        SELECT sk, sn, sb, sm FROM j
        WHERE tk IS NULL AND sb >= 0
        UNION ALL
        -- target-only: by-source delete AUTOMOBILE, else mark stale
        SELECT tk, 'stale', tb, tm FROM j
        WHERE sk IS NULL AND tm <> 'AUTOMOBILE'
    )
    """,
)
def delta_merge_sync_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync-shape clause MERGE, oracle-checked end-to-end (r15, VERDICT
    r14 item 2's "Done" gate): target = customers with key % 3 != 0,
    source = customers with key % 5 != 0 (balances bumped +100 on even
    keys), merged through the REAL offline Delta log with the clause
    cascade::

        whenMatched   delete  if source.segment = 'MACHINERY'
        whenMatched   update  if source.balance > target.balance
                              set balance = source.balance + 1
        whenNotMatched insert if source.balance >= 0
        whenNotMatchedBySource delete if target.segment = 'AUTOMOBILE'
        whenNotMatchedBySource update set name = 'stale'

    so every clause family and the first-true-wins ordering rule is
    exercised in one statement; the returned frame is the post-MERGE
    snapshot READ BACK through the bridge (log replay + file scan),
    not the in-memory merge plan — file staging, remove actions and
    commit JSON all sit between the query and its oracle.

    Scale shape: the MERGE core is one right/full-outer key join at
    file grain plus one classification select (persisted, consumed by
    cardinality check, touched-file resolution, staging); matched rows
    never hit the driver — only touched file NAMES do. The temp table
    is rebuilt per invocation (bounded by the SF's customer count);
    arithmetic stays in DOUBLE so Spark and DuckDB produce identical
    IEEE-754 bits."""
    from fintech_lakehouse_spark.sources.deltalog import (
        merge_into_delta_table,
        read_delta_table,
        write_delta_commit,
    )

    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"fls_merge_sync_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    write_delta_commit(
        spark, customer.filter(F.col("c_custkey") % 3 != 0), root
    )
    source = customer.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_acctbal",
        F.col("c_acctbal")
        + F.when(F.col("c_custkey") % 2 == 0, F.lit(100.0)).otherwise(
            F.lit(0.0)
        ),
    )
    merge_into_delta_table(
        spark, root, source, ["c_custkey"],
        clauses=[
            {"when": "matched", "action": "delete",
             "condition": "source.c_mktsegment = 'MACHINERY'"},
            {"when": "matched", "action": "update",
             "condition": "source.c_acctbal > target.c_acctbal",
             "set": {"c_acctbal": "source.c_acctbal + 1"}},
            {"when": "not_matched", "action": "insert",
             "condition": "source.c_acctbal >= 0"},
            {"when": "not_matched_by_source", "action": "delete",
             "condition": "target.c_mktsegment = 'AUTOMOBILE'"},
            {"when": "not_matched_by_source", "action": "update",
             "set": {"c_name": "'stale'"}},
        ],
    )
    return read_delta_table(spark, root)
