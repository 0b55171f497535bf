"""Operator unit tests (pattern from reference tests/unit/
test_spark_utils.py — inline micro-fixtures, collect-based asserts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.operators import (
    add_dense_surrogate_key,
    add_ingestion_metadata,
    add_processing_metadata,
    add_surrogate_key,
    asof_join,
    deduplicate_by_key,
    standardize_string_columns,
)


@pytest.fixture()
def txns(spark):
    return spark.createDataFrame(
        [
            ("TXN1", "C1", "2024-01-01 10:00:00", 100.0),
            ("TXN1", "C1", "2024-01-02 10:00:00", 120.0),  # later dup
            ("TXN2", "C2", "2024-01-01 09:00:00", 50.0),
        ],
        ["transaction_id", "customer_id", "updated_at", "amount"],
    ).withColumn("updated_at", F.to_timestamp("updated_at"))


def test_dedup_keep_latest(txns):
    out = deduplicate_by_key(txns, ["transaction_id"], "updated_at")
    rows = {r["transaction_id"]: r["amount"] for r in out.collect()}
    assert rows == {"TXN1": 120.0, "TXN2": 50.0}


def test_dedup_keep_first(txns):
    out = deduplicate_by_key(
        txns, ["transaction_id"], "updated_at", order_ascending=True
    )
    rows = {r["transaction_id"]: r["amount"] for r in out.collect()}
    assert rows == {"TXN1": 100.0, "TXN2": 50.0}


def test_surrogate_key_unique(spark):
    df = spark.range(1000).withColumnRenamed("id", "x")
    out = add_surrogate_key(df, "sk")
    assert out.select("sk").distinct().count() == 1000


def test_dense_surrogate_key_dense_and_ordered(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("d",), ("c",)], ["k"]
    ).repartition(3)
    out = add_dense_surrogate_key(df, "sk", ["k"]).orderBy("sk").collect()
    assert [r["sk"] for r in out] == [1, 2, 3, 4]  # dense, 1-based
    assert [r["k"] for r in out] == ["a", "b", "c", "d"]  # natural-key order


def test_standardize_strings(spark):
    df = spark.createDataFrame([("  usd ", "x"), ("eur", "y")], ["cur", "other"])
    out = standardize_string_columns(df, ["cur", "missing_col"]).collect()
    assert [r["cur"] for r in out] == ["USD", "EUR"]
    assert [r["other"] for r in out] == ["x", "y"]  # untouched


def test_metadata_columns(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    out = add_processing_metadata(add_ingestion_metadata(df))
    assert {"_source_file", "_ingestion_timestamp", "_processing_timestamp"} <= set(
        out.columns
    )
    assert out.collect()[0]["_processing_timestamp"] is not None


def test_asof_join_currency_conversion(spark):
    """The currency-conversion shape (SURVEY §2.3 J4): each txn gets
    the latest rate at or before its timestamp."""
    rates = spark.createDataFrame(
        [
            ("EUR", "2024-01-01 00:00:00", 1.10),
            ("EUR", "2024-01-03 00:00:00", 1.20),
            ("GBP", "2024-01-02 00:00:00", 1.30),
        ],
        ["currency", "rate_ts", "rate"],
    ).withColumn("rate_ts", F.to_timestamp("rate_ts"))
    txns = spark.createDataFrame(
        [
            ("T1", "EUR", "2024-01-02 12:00:00", 100.0),
            ("T2", "EUR", "2024-01-03 00:00:00", 100.0),  # exactly at rate ts
            ("T3", "GBP", "2024-01-01 00:00:00", 100.0),  # before any rate
        ],
        ["txn_id", "currency", "txn_ts", "amount"],
    ).withColumn("txn_ts", F.to_timestamp("txn_ts"))
    out = asof_join(
        txns, rates, on=["currency"], left_time="txn_ts", right_time="rate_ts"
    )
    got = {r["txn_id"]: r["rate_asof"] for r in out.collect()}
    assert got == {"T1": 1.10, "T2": 1.20, "T3": None}
    assert out.count() == 3  # left join: every txn survives


def test_asof_join_null_axes(spark):
    """The three NULL edges of as-of semantics (review finding r6s5):
    a NULL right value must NOT be backfilled from an older row (the
    latest right ROW wins atomically), a NULL right_time row can never
    match, and NULL keys never match each other."""
    from fintech_lakehouse_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("usd", 30), (None, 30)], "ccy string, t long"
    )
    right = spark.createDataFrame(
        [
            ("usd", 10, 1.0, 100.0),
            ("usd", 20, None, 200.0),   # latest row: rate legitimately NULL
            ("usd", None, 9.9, 999.0),  # null-time row: never matches
            (None, 5, 7.7, 777.0),      # null-key row: never matches
        ],
        "ccy string, t long, rate double, vol double",
    )
    rows = {
        r["ccy"]: (r["rate_asof"], r["vol_asof"])
        for r in asof_join(
            left, right, on=["ccy"], left_time="t", right_time="t"
        ).collect()
    }
    # latest right row (t=20) wins ATOMICALLY: rate NULL, vol 200
    assert rows["usd"] == (None, 200.0)
    # null-key left row matches nothing
    assert rows[None] == (None, None)


def test_point_in_time_join_column_collision(spark):
    """A dim column sharing a fact column's name must come out as
    <name>_dim, and a fact's own effective_from must survive (review
    finding r6s5)."""
    import datetime as dt

    from fintech_lakehouse_spark.operators.joins import point_in_time_join

    fact = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2), "F_STATUS", dt.datetime(2020, 1, 1))],
        "k long, ts timestamp, status string, effective_from timestamp",
    )
    dim = spark.createDataFrame(
        [(1, "D_STATUS", dt.datetime(2024, 1, 1), None, True)],
        "k long, status string, effective_from timestamp, "
        "effective_to timestamp, is_current boolean",
    )
    out = point_in_time_join(fact, dim, key="k", fact_time="ts")
    assert out.columns.count("status") == 1
    assert "status_dim" in out.columns
    assert "effective_from" in out.columns  # the FACT's own column
    (row,) = out.collect()
    assert row["status"] == "F_STATUS" and row["status_dim"] == "D_STATUS"
    assert row["effective_from"] == dt.datetime(2020, 1, 1)


def test_lsh_band_validation(spark):
    import pytest as _pytest

    from fintech_lakehouse_spark.functions.text import (
        lsh_band_pairs_md5,
        minhash_signatures_md5,
        shingle_rows,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], ["doc_id", "text"]
    )
    sig = minhash_signatures_md5(shingle_rows(docs, 3), n_hashes=8)
    with _pytest.raises(ValueError, match="n_bands"):
        lsh_band_pairs_md5(sig, n_hashes=8, n_bands=16)  # 0 rows/band
    with _pytest.raises(ValueError, match="n_bands"):
        lsh_band_pairs_md5(sig, n_hashes=8, n_bands=3)  # non-divisor


def test_language_best_guess_und_for_zero_overlap(spark):
    from fintech_lakehouse_spark.functions.text import language_best_guess

    df = spark.createDataFrame(
        [(1, "quarterly revenue increased substantially")], ["doc_id", "text"]
    )
    (row,) = df.select(language_best_guess().alias("g")).collect()
    assert row["g"]["lang"] == "und" and row["g"]["score"] == 0


class TestR7S2AnalyticsSemantics:
    """Semantic pins for the round-7 session-2 metric family: each
    metric is checked against a hand-computable synthetic distribution
    (the oracle sweep proves engine parity; these prove the MATH)."""

    def test_tvd_bounds_on_identical_and_disjoint(self, spark, tmp_path):
        import pyspark.sql.functions as F
        from fintech_lakehouse_spark.plans.analytics import (
            order_price_drift_tvd,
        )

        # identical periods -> TVD 0; disjoint value ranges -> TVD 1e6
        rows = []
        for i in range(200):
            rows.append((i, "1996-06-01", 100.0 + i))          # period A
            rows.append((10_000 + i, "1999-06-01", 100.0 + i))  # period B, same dist
        self._write_orders(spark, tmp_path / "same", rows)
        out = {
            r["bucket"]: r
            for r in order_price_drift_tvd(
                spark, str(tmp_path / "same")
            ).collect()
        }
        assert out[-1]["drift_ppm"] == 0

        rows = []
        for i in range(200):
            rows.append((i, "1996-06-01", 1000.0))      # A: all bucket 0
            rows.append((10_000 + i, "1999-06-01", 450_000.0))  # B: top bucket
        self._write_orders(spark, tmp_path / "disj", rows)
        out = {
            r["bucket"]: r
            for r in order_price_drift_tvd(
                spark, str(tmp_path / "disj")
            ).collect()
        }
        assert out[-1]["drift_ppm"] == 1_000_000

    def test_gini_zero_for_equal_spend(self, spark, tmp_path):
        from fintech_lakehouse_spark.plans.analytics import (
            revenue_concentration,
        )

        rows = [(i, "1996-06-01", 500.0) for i in range(100)]
        self._write_orders(spark, tmp_path / "flat", rows, custkey_from_id=True)
        row = revenue_concentration(spark, str(tmp_path / "flat")).collect()[0]
        assert row["gini"] == 0.0
        assert row["n_customers"] == 100
        # equal spend: top 1% (1 customer) holds exactly 1/100
        assert row["top1pct_share_ppm"] == 10_000
        assert row["top10pct_share_ppm"] == 100_000

    def test_benford_flags_uniform_digits(self, spark, tmp_path):
        from fintech_lakehouse_spark.plans.analytics import (
            benford_first_digit_audit,
        )

        # fabricated books: every leading digit equally likely (1/9 =
        # 111111 ppm) -> digit 1 (expected 301030) must flag
        rows = []
        k = 0
        for d in range(1, 10):
            for i in range(100):
                rows.append((k, "1996-06-01", float(d * 1000 + i)))
                k += 1
        self._write_orders(spark, tmp_path / "uni", rows)
        out = {
            r["digit"]: r
            for r in benford_first_digit_audit(
                spark, str(tmp_path / "uni")
            ).collect()
        }
        assert len(out) == 9
        assert all(r["observed_ppm"] == 111_111 for r in out.values())
        assert out[1]["review_flag"] and out[2]["review_flag"]
        # digit 3 (expected 124939 ppm) sits within 20k of uniform
        assert not out[3]["review_flag"]
        # digit 8/9 expectations (~51k/46k ppm) differ by >20k -> flag
        assert out[9]["review_flag"]

    def test_rfm_quintiles_partition_evenly(self, spark, tmp_path):
        from fintech_lakehouse_spark.plans.analytics import (
            rfm_segment_counts,
        )

        # 100 customers, one order each, distinct amounts -> every
        # quintile holds exactly 20 customers in every dimension
        rows = [(i, "1996-06-01", 100.0 + i) for i in range(100)]
        self._write_orders(spark, tmp_path / "rfm", rows, custkey_from_id=True)
        out = rfm_segment_counts(spark, str(tmp_path / "rfm")).collect()
        assert sum(r["n_customers"] for r in out) == 100
        from collections import defaultdict

        per_m = defaultdict(int)
        for r in out:
            per_m[r["m_score"]] += r["n_customers"]
        assert per_m == {1: 20, 2: 20, 3: 20, 4: 20, 5: 20}

    @staticmethod
    def _write_orders(spark, path, rows, custkey_from_id=False):
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [
                (
                    i,
                    (i if custkey_from_id else i % 37),
                    "O",
                    float(price),
                    date,
                    "1-URGENT",
                    "clerk",
                    0,
                    "",
                )
                for (i, date, price) in rows
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, _d string, o_orderpriority string,"
            " o_clerk string, o_shippriority int, o_comment string",
        ).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            F.to_timestamp("_d").alias("o_orderdate"),
            "o_orderpriority", "o_clerk", "o_shippriority", "o_comment",
        )
        df.write.mode("overwrite").parquet(f"{path}/orders.parquet")
