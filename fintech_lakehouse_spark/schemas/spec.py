"""Declarative table specs driving BOTH layer schemas and the
Bronze→Silver cast (SURVEY §1.2-1.3, §2.2 P12-P14).

Design difference from the reference: instead of hand-maintaining a
StructType per table per layer (src/schemas/bronze.py + silver.py,
which drifted — the silver "derived" columns have no producing code),
ONE spec per table declares each column's silver type, nullability,
and (for derived columns) the producing expression. Bronze schema
(all-string, ref bronze.py:5-9), silver schema, and the cast step
(operators/medallion.py) are all generated from it — they cannot
drift.

Spec row: (name, silver_type, nullable, derive)
  derive: None → cast from the same-named bronze string column;
          str  → SQL expression over already-cast silver columns.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MONEY = DecimalType(18, 2)  # ref: src/schemas/silver.py:32-37
FEE_RATE = DecimalType(8, 4)  # ref: src/schemas/silver.py:109

# (name, type, nullable, derive-expression-or-None)
TABLE_SPECS: dict[str, list[tuple[str, DataType, bool, str | None]]] = {
    # ref: src/schemas/silver.py:25-66
    "transactions": [
        ("transaction_id", StringType(), False, None),
        ("customer_id", StringType(), False, None),
        ("merchant_id", StringType(), False, None),
        ("amount", MONEY, False, None),
        ("currency", StringType(), False, None),
        ("amount_usd", MONEY, True, None),
        ("fee_amount", MONEY, True, None),
        ("net_amount", MONEY, True, None),
        ("transaction_type", StringType(), False, None),
        ("payment_method", StringType(), False, None),
        ("channel", StringType(), False, None),
        ("status", StringType(), False, None),
        ("merchant_country", StringType(), True, None),
        ("customer_country", StringType(), True, None),
        ("is_cross_border", BooleanType(), True, None),
        ("is_flagged", BooleanType(), False, None),
        # Bronze stores fraud_indicators pipe-joined
        # (ref: src/data_generator/generator.py:540)
        (
            "fraud_indicators",
            ArrayType(StringType()),
            True,
            "CASE WHEN fraud_indicators_raw = '' OR fraud_indicators_raw IS NULL "
            "THEN NULL ELSE split(fraud_indicators_raw, '\\\\|') END",
        ),
        ("ip_address", StringType(), True, None),
        ("device_id", StringType(), True, None),
        ("transaction_timestamp", TimestampType(), False, None),
        ("created_at", TimestampType(), True, None),
        # Derived (ref: src/schemas/silver.py:57-59)
        ("transaction_date", DateType(), False, "to_date(transaction_timestamp)"),
        ("transaction_hour", IntegerType(), True, "hour(transaction_timestamp)"),
        (
            "transaction_day_of_week",
            IntegerType(),
            True,
            "dayofweek(transaction_timestamp)",
        ),
    ],
    # ref: src/schemas/silver.py:69-95
    "customers": [
        ("customer_id", StringType(), False, None),
        ("first_name", StringType(), True, None),
        ("last_name", StringType(), True, None),
        # ref: src/schemas/silver.py:73
        ("full_name", StringType(), True, "concat_ws(' ', first_name, last_name)"),
        ("email", StringType(), True, None),
        ("phone", StringType(), True, None),
        ("country", StringType(), True, None),
        ("city", StringType(), True, None),
        ("postal_code", StringType(), True, None),
        ("date_of_birth", DateType(), True, None),
        # ref: src/schemas/silver.py:80
        (
            "age",
            IntegerType(),
            True,
            "CAST(floor(months_between(current_date(), date_of_birth) / 12) AS INT)",
        ),
        ("segment", StringType(), True, None),
        ("kyc_status", StringType(), True, None),
        ("kyc_verified_date", DateType(), True, None),
        ("risk_score", IntegerType(), True, None),
        ("is_pep", BooleanType(), True, None),
        ("created_at", TimestampType(), True, None),
        ("updated_at", TimestampType(), True, None),
    ],
    # ref: src/schemas/silver.py:98-117
    "merchants": [
        ("merchant_id", StringType(), False, None),
        ("merchant_name", StringType(), True, None),
        ("mcc_code", StringType(), True, None),
        ("mcc_category", StringType(), True, None),
        ("country", StringType(), True, None),
        ("currency", StringType(), True, None),
        ("risk_tier", StringType(), True, None),
        ("avg_ticket_size", MONEY, True, None),
        ("monthly_volume", IntegerType(), True, None),
        ("onboarding_date", DateType(), True, None),
        # ref: src/schemas/silver.py:107
        (
            "days_active",
            IntegerType(),
            True,
            "datediff(current_date(), onboarding_date)",
        ),
        ("status", StringType(), True, None),
        ("fee_rate", FEE_RATE, True, None),
        ("created_at", TimestampType(), True, None),
        ("updated_at", TimestampType(), True, None),
    ],
    # ref: src/schemas/bronze.py:85-93 (bronze-only table)
    "exchange_rates": [
        ("rate_date", DateType(), False, None),
        ("source_currency", StringType(), False, None),
        ("target_currency", StringType(), False, None),
        ("rate", DecimalType(18, 6), False, None),
        ("created_at", TimestampType(), True, None),
    ],
}

_METADATA_FIELDS = [
    ("_source_file", StringType()),
    ("_ingestion_timestamp", TimestampType()),
    ("_processing_timestamp", TimestampType()),
]


def bronze_schema(table: str) -> StructType:
    """All-string, all-nullable raw schema (ref: src/schemas/bronze.py:
    5-9): preserve source bytes; cast in Silver. Derived silver columns
    have no bronze counterpart; array columns arrive pipe-joined under
    ``<name>_raw``."""
    fields = []
    for name, dtype, _nullable, derive in TABLE_SPECS[table]:
        if derive is not None and not isinstance(dtype, ArrayType):
            continue  # derived in silver, absent in bronze
        raw_name = f"{name}_raw" if isinstance(dtype, ArrayType) else name
        fields.append(StructField(raw_name, StringType(), True))
    return StructType(fields)


def silver_schema(table: str, with_metadata: bool = True) -> StructType:
    """Typed, constraint-carrying schema (ref: src/schemas/silver.py:5-9)."""
    fields = [
        StructField(name, dtype, nullable)
        for name, dtype, nullable, _derive in TABLE_SPECS[table]
    ]
    if with_metadata:
        fields += [StructField(n, t, True) for n, t in _METADATA_FIELDS]
    return StructType(fields)
