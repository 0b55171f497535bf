"""Spark-native synthetic fintech data generator (ref:
src/data_generator/generator.py — SURVEY §2.14).

The reference generates row dicts in a single Python process and
writes CSV (fine for 100k rows, impossible for 100 TB). This generator
is DISTRIBUTED and seeded: ``spark.range(n)`` partitions the id space;
every attribute derives deterministically from ``xxhash64(id, seed,
tag)``, so any scale generates in parallel with reproducible content
(same seed → same rows, any partitioning).

Distributions mirror the reference's (weights cited inline); values
are emitted in BRONZE form (all strings — ref src/schemas/bronze.py)
so the generator feeds the medallion pipeline end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_START = "2024-01-01"
CURRENCIES = ["USD", "EUR", "GBP", "JPY", "CAD", "AUD", "CHF", "CNY", "INR"]
MCC_CATEGORIES = [
    ("5411", "GROCERY", "LOW"),
    ("5812", "RESTAURANT", "LOW"),
    ("5999", "RETAIL", "MEDIUM"),
    ("7995", "GAMBLING", "HIGH"),
    ("6051", "CRYPTO", "HIGH"),
    ("5122", "PHARMACY", "MEDIUM"),
    ("4829", "MONEY_TRANSFER", "HIGH"),
    ("5732", "ELECTRONICS", "MEDIUM"),
]
COUNTRIES = ["US", "GB", "DE", "FR", "JP", "CA", "AU", "CH", "CN", "IN"]


def _u(id_col: Column, seed: int, tag: str) -> Column:
    """Deterministic uniform [0,1) from (id, seed, tag)."""
    h = F.xxhash64(id_col, F.lit(seed), F.lit(tag))
    return (F.pmod(h, F.lit(2**31)) / F.lit(float(2**31))).cast("double")


def _pick(id_col: Column, seed: int, tag: str, values: list[str]) -> Column:
    idx = F.pmod(F.xxhash64(id_col, F.lit(seed), F.lit(tag)), F.lit(len(values)))
    return F.element_at(
        F.array(*[F.lit(v) for v in values]), (idx + 1).cast("int")
    )


def _weighted(u: Column, weighted_values: list[tuple[str, float]]) -> Column:
    """CASE chain over cumulative weights (ref uses random.choices)."""
    expr = None
    cumulative = 0.0
    for value, weight in weighted_values:
        cumulative += weight
        cond = u < cumulative
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return expr.otherwise(weighted_values[-1][0])


def _gauss(id_col: Column, seed: int, tag: str) -> Column:
    """Box-Muller from two deterministic uniforms."""
    u1 = _u(id_col, seed, tag + "_g1")
    u2 = _u(id_col, seed, tag + "_g2")
    safe = F.greatest(u1, F.lit(1e-12))
    return F.sqrt(-2.0 * F.log(safe)) * F.cos(2.0 * 3.141592653589793 * u2)


def generate_customers(
    spark: SparkSession, n: int = 10_000, seed: int = 42
) -> DataFrame:
    """Bronze customers (ref: generate_customers, generator.py:227-330:
    KYC 85% VERIFIED, risk ~ Beta-ish low-skew, PEP 0.5%)."""
    ids = spark.range(n).select(F.col("id"))
    i = F.col("id")
    # age 18..67 AS OF the 2024-01-01 data epoch: offset = 18y..67y
    # back from the epoch itself (anchoring at 2006 double-counted the
    # 18-year floor and produced ages 36..85 — review finding r6s5)
    dob_days = (_u(i, seed, "dob") * 18_000 + 6_570).cast("int")
    risk = (F.pow(_u(i, seed, "risk"), 3.0) * 100).cast("int")  # low-skewed
    return ids.select(
        F.format_string("CUST%07d", i).alias("customer_id"),
        F.concat(F.lit("First"), i.cast("string")).alias("first_name"),
        F.concat(F.lit("Last"), F.pmod(i, F.lit(997)).cast("string")).alias(
            "last_name"
        ),
        F.format_string("user%d@example.com", i).alias("email"),
        F.format_string("+1%010d", i).alias("phone"),
        _pick(i, seed, "country", COUNTRIES).alias("country"),
        F.concat(F.lit("City"), F.pmod(i, F.lit(100)).cast("string")).alias("city"),
        F.format_string("%05d", F.pmod(i, F.lit(99999))).alias("postal_code"),
        F.date_sub(F.lit("2024-01-01").cast("date"), dob_days)
        .cast("string")
        .alias("date_of_birth"),
        _weighted(
            _u(i, seed, "segment"),
            [("RETAIL", 0.70), ("PREMIUM", 0.20), ("BUSINESS", 0.08), ("PRIVATE", 0.02)],
        ).alias("segment"),
        _weighted(
            _u(i, seed, "kyc"),
            [("VERIFIED", 0.85), ("PENDING", 0.10), ("EXPIRED", 0.03), ("REJECTED", 0.02)],
        ).alias("kyc_status"),
        F.lit("2024-01-01").alias("kyc_verified_date"),
        risk.cast("string").alias("risk_score"),
        F.when(_u(i, seed, "pep") < 0.005, "true").otherwise("false").alias("is_pep"),
        F.lit("2024-01-01 00:00:00").alias("created_at"),
        F.lit("2024-01-01 00:00:00").alias("updated_at"),
    )


def generate_merchants(spark: SparkSession, n: int = 500, seed: int = 42) -> DataFrame:
    """Bronze merchants (ref: generate_merchants, generator.py:332-415:
    fee by risk tier 1.5/2.5/3.5% ±0.5%, 95% ACTIVE)."""
    ids = spark.range(n)
    i = F.col("id")
    mcc_idx = F.pmod(F.xxhash64(i, F.lit(seed), F.lit("mcc")), F.lit(len(MCC_CATEGORIES)))
    mcc_code = F.element_at(
        F.array(*[F.lit(c) for c, _, _ in MCC_CATEGORIES]), (mcc_idx + 1).cast("int")
    )
    mcc_cat = F.element_at(
        F.array(*[F.lit(c) for _, c, _ in MCC_CATEGORIES]), (mcc_idx + 1).cast("int")
    )
    risk_tier = F.element_at(
        F.array(*[F.lit(t) for _, _, t in MCC_CATEGORIES]), (mcc_idx + 1).cast("int")
    )
    base_fee = (
        F.when(risk_tier == "LOW", 0.015)
        .when(risk_tier == "MEDIUM", 0.025)
        .otherwise(0.035)
    )
    fee = F.round(base_fee + (_u(i, seed, "fee") - 0.5) * 0.01, 4)
    return ids.select(
        F.format_string("MERCH%05d", i).alias("merchant_id"),
        F.format_string("Merchant %d Inc", i).alias("merchant_name"),
        mcc_code.alias("mcc_code"),
        mcc_cat.alias("mcc_category"),
        _pick(i, seed, "mcountry", COUNTRIES).alias("country"),
        _pick(i, seed, "mcur", CURRENCIES[:4]).alias("currency"),
        risk_tier.alias("risk_tier"),
        F.round(_u(i, seed, "ticket") * 500 + 5, 2).cast("string").alias(
            "avg_ticket_size"
        ),
        (_u(i, seed, "vol") * 10_000).cast("int").cast("string").alias(
            "monthly_volume"
        ),
        F.date_sub(
            F.lit("2024-01-01").cast("date"),
            (_u(i, seed, "onb") * 1500).cast("int"),
        )
        .cast("string")
        .alias("onboarding_date"),
        _weighted(
            _u(i, seed, "status"),
            [("ACTIVE", 0.95), ("SUSPENDED", 0.03), ("CLOSED", 0.02)],
        ).alias("status"),
        fee.cast("string").alias("fee_rate"),
        F.lit("2024-01-01 00:00:00").alias("created_at"),
        F.lit("2024-01-01 00:00:00").alias("updated_at"),
    )


def generate_transactions(
    spark: SparkSession,
    n: int = 100_000,
    n_customers: int = 10_000,
    n_merchants: int = 500,
    seed: int = 42,
    days: int = 90,
) -> DataFrame:
    """Bronze transactions (ref: generate_transactions, generator.py:
    417-545): amount ~ LogNormal(3.5, 1.5) clamped [0.01, 50000];
    currency 60% USD; fee 1-3%; net = amount_usd − fee; status 92%
    COMPLETED; fraud base rate 2.5% + structuring 9-10k ~0.5% +
    after-hours flag; cross_border = customer country ≠ merchant
    country (joined downstream)."""
    ids = spark.range(n)
    i = F.col("id")
    amount_raw = F.exp(3.5 + 1.5 * _gauss(i, seed, "amt"))
    amount = F.round(
        F.least(F.greatest(amount_raw, F.lit(0.01)), F.lit(50_000.0)), 2
    )
    structuring = _u(i, seed, "structuring") < 0.005
    amount = F.when(
        structuring, F.round(9_000 + _u(i, seed, "samt") * 1_000, 2)
    ).otherwise(amount)
    currency = _weighted(
        _u(i, seed, "cur"),
        [("USD", 0.60), ("EUR", 0.15), ("GBP", 0.08), ("JPY", 0.05),
         ("CAD", 0.04), ("AUD", 0.03), ("CHF", 0.02), ("CNY", 0.02), ("INR", 0.01)],
    )
    # simplified: USD amounts equal amount (rate joins happen in gold)
    amount_usd = amount
    fee = F.round(amount_usd * (0.01 + _u(i, seed, "feepct") * 0.02), 2)
    net = F.round(amount_usd - fee, 2)
    ts_seconds = (_u(i, seed, "ts") * days * 86_400).cast("long")
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(f"{EPOCH_START} 00:00:00")) + ts_seconds
    )
    hour = F.hour(ts)
    flagged_base = _u(i, seed, "fraud") < 0.025
    after_hours = (hour >= 2) & (hour <= 4) & (_u(i, seed, "ah") < 0.3)
    indicators = F.concat_ws(
        "|",
        F.array_compact(
            F.array(
                F.when(structuring, "STRUCTURING"),
                F.when(flagged_base, "VELOCITY_SPIKE"),
                F.when(after_hours, "AFTER_HOURS"),
            )
        ),
    )
    return ids.select(
        F.format_string("TXN%09d", i).alias("transaction_id"),
        F.format_string(
            "CUST%07d", F.pmod(F.xxhash64(i, F.lit(seed), F.lit("cust")), F.lit(n_customers))
        ).alias("customer_id"),
        F.format_string(
            "MERCH%05d", F.pmod(F.xxhash64(i, F.lit(seed), F.lit("merch")), F.lit(n_merchants))
        ).alias("merchant_id"),
        amount.cast("string").alias("amount"),
        currency.alias("currency"),
        amount_usd.cast("string").alias("amount_usd"),
        fee.cast("string").alias("fee_amount"),
        net.cast("string").alias("net_amount"),
        _weighted(
            _u(i, seed, "type"),
            [("PURCHASE", 0.80), ("REFUND", 0.08), ("TRANSFER", 0.07), ("WITHDRAWAL", 0.05)],
        ).alias("transaction_type"),
        _weighted(
            _u(i, seed, "method"),
            [("CARD", 0.60), ("WALLET", 0.20), ("BANK", 0.15), ("CRYPTO", 0.05)],
        ).alias("payment_method"),
        _weighted(
            _u(i, seed, "channel"), [("ONLINE", 0.55), ("POS", 0.35), ("ATM", 0.10)]
        ).alias("channel"),
        _weighted(
            _u(i, seed, "status"),
            [("COMPLETED", 0.92), ("PENDING", 0.04), ("FAILED", 0.03), ("REVERSED", 0.01)],
        ).alias("status"),
        _pick(i, seed, "mcountry2", COUNTRIES).alias("merchant_country"),
        _pick(i, seed, "ccountry2", COUNTRIES).alias("customer_country"),
        # derived HERE, not "in silver": no layer ever derived it (the
        # spec row is derive=None), so the column was permanently NULL
        # end-to-end — review finding r6s5. Same-country pairs render
        # "false", cross-border "true"; silver's boolean cast reads it.
        F.when(
            _pick(i, seed, "mcountry2", COUNTRIES)
            != _pick(i, seed, "ccountry2", COUNTRIES),
            "true",
        )
        .otherwise("false")
        .alias("is_cross_border"),
        F.when(flagged_base | structuring | after_hours, "true")
        .otherwise("false")
        .alias("is_flagged"),
        indicators.alias("fraud_indicators_raw"),
        F.format_string("10.0.%d.%d", F.pmod(i, F.lit(255)), F.pmod(i * 7, F.lit(255))).alias(
            "ip_address"
        ),
        F.format_string("DEV%08d", F.pmod(F.xxhash64(i, F.lit(seed), F.lit("dev")), F.lit(50_000))).alias(
            "device_id"
        ),
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("transaction_timestamp"),
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("created_at"),
    )


def generate_exchange_rates(
    spark: SparkSession, days: int = 90, seed: int = 42
) -> DataFrame:
    """Bronze fx rates (ref: generate_exchange_rates, generator.py:
    586-601): per-day per-currency rate = base ±2%)."""
    base_rates = {
        "EUR": 1.09, "GBP": 1.27, "JPY": 0.0067, "CAD": 0.74,
        "AUD": 0.66, "CHF": 1.13, "CNY": 0.14, "INR": 0.012,
    }
    day_df = spark.range(days).select(F.col("id").alias("day_no"))
    cur_df = spark.createDataFrame(
        [(c, r) for c, r in base_rates.items()], ["source_currency", "base_rate"]
    )
    crossed = day_df.crossJoin(F.broadcast(cur_df))
    wiggle = _u(
        F.xxhash64(F.col("day_no"), F.col("source_currency")), seed, "fx"
    )
    return crossed.select(
        F.date_add(F.lit(EPOCH_START).cast("date"), F.col("day_no").cast("int"))
        .cast("string")
        .alias("rate_date"),
        "source_currency",
        F.lit("USD").alias("target_currency"),
        F.round(F.col("base_rate") * (0.98 + 0.04 * wiggle), 6)
        .cast("string")
        .alias("rate"),
        F.lit("2024-01-01 00:00:00").alias("created_at"),
    )
