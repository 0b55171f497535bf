"""Deterministic numeric aggregation helpers.

Why: the driver compares Spark vs DuckDB by value hash. Summing
doubles is order-dependent, and this lake's money values are exact
2-decimal quantities whose true averages/products land EXACTLY on
rounding boundaries (e.g. avg of 8 cent-values is a multiple of
0.00125 → half the groups sit on the 4th-decimal half-point), so
`ROUND(SUM(double), k)` flips between engines. The fix (SURVEY §7.4
risk 1): cast to decimal first — decimal addition is exact and
order-independent — aggregate exactly, cast the exact total to double
once, then round. Both engines then round the *same* double, so the
result is deterministic even at boundaries.

The same pattern is what you'd run at 100 TB for financial-grade sums
(the reference keeps money DECIMAL(18,2) end-to-end for this reason,
ref: src/schemas/silver.py:32-37).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for any money column in the lake (≤1e10) while keeping
# decimal-product precision under the 38-digit cap on both engines.
MONEY = "decimal(12,2)"
RATE = "decimal(4,2)"  # discounts / taxes in [0, 1)


def money(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def rate(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(RATE)


def one_minus(col: str | Column) -> Column:
    """(1 - rate) with controlled decimal width: (5,2)."""
    return F.lit(1).cast("decimal(3,2)") - rate(col)


def one_plus(col: str | Column) -> Column:
    return F.lit(1).cast("decimal(3,2)") + rate(col)


def dsum(expr: Column, scale: int = 2) -> Column:
    """Exact decimal sum → round IN DECIMAL → double.

    The rounding must happen while the value is still exact: both
    engines round decimals half-away-from-zero identically, but they
    round DOUBLES differently at midpoints (verified: DuckDB
    ROUND(536532.315::DOUBLE, 2) = .31, Spark = .32, while both give
    .32 for the DECIMAL) — and a scale-4 sum of money*(1-disc)
    products lands on a 2-dp midpoint in ~1/1000 groups
    (nation_trade_volume found 4 of 4188). The final cast of the
    rounded 2-dp decimal to double is exact for any money total under
    2^53."""
    return F.round(F.sum(expr), scale).cast("double")


def davg(colname: str, scale: int = 4) -> Column:
    """Exact average of a 2-decimal money column, floor-rounded at
    ``scale`` decimals via integer arithmetic.

    Rationale: true money averages often land EXACTLY on a rounding
    midpoint (sum_cents/8 ends in …5), and Spark and DuckDB round
    midpoint doubles differently (BigDecimal-of-string HALF_UP vs
    binary-value rounding). Integer floor-division has no midpoint, so
    both engines produce bit-identical results. Assumes non-negative
    values (true for all prices/rates in this lake)."""
    cents = f"CAST(CAST({colname} AS DECIMAL(12,2)) * 100 AS BIGINT)"
    factor = 10 ** (scale - 2)
    return F.expr(
        f"CAST((SUM({cents}) * {factor}) DIV COUNT({colname}) AS DOUBLE)"
        f" / {10 ** scale}"
    )


def davg_int(expr: str, scale: int = 4) -> Column:
    """Exact average of a non-negative integer SQL expression, floor-
    divided at ``scale`` decimals.

    Same midpoint rationale as :func:`davg` but for integer inputs
    (token counts, extracted JSON ints): ``SUM(x)/n`` lands exactly on
    round()-midpoints whenever ``SUM(x)*10^scale % n == n/2``, and the
    engines round those doubles differently. Integer floor-division has
    no midpoint. Spark ``DIV`` and DuckDB ``//`` both truncate toward
    zero, which equals floor for the non-negative inputs used here."""
    f = 10 ** scale
    return F.expr(
        f"CAST((SUM(CAST(({expr}) AS BIGINT)) * {f})"
        f" DIV COUNT({expr}) AS DOUBLE) / {f}"
    )


# SQL twins for the DuckDB oracles (same widths ⇒ same exact values).
SQL_MONEY = "DECIMAL(12,2)"
SQL_RATE = "DECIMAL(4,2)"


def sql_money(col: str) -> str:
    return f"CAST({col} AS {SQL_MONEY})"


def sql_one_minus(col: str) -> str:
    return f"(CAST(1 AS DECIMAL(3,2)) - CAST({col} AS {SQL_RATE}))"


def sql_one_plus(col: str) -> str:
    return f"(CAST(1 AS DECIMAL(3,2)) + CAST({col} AS {SQL_RATE}))"


def sql_dsum(expr: str, scale: int = 2) -> str:
    # round in DECIMAL, then cast — see dsum() for why the order matters
    return f"CAST(ROUND(SUM({expr}), {scale}) AS DOUBLE)"


def sql_davg(colname: str, scale: int = 4) -> str:
    cents = f"CAST(CAST({colname} AS DECIMAL(12,2)) * 100 AS BIGINT)"
    factor = 10 ** (scale - 2)
    return (
        f"(CAST((SUM({cents}) * {factor}) // COUNT({colname}) AS DOUBLE)"
        f" / {10 ** scale})"
    )


def sql_isum(expr: str) -> str:
    """Integer SUM for DuckDB oracles, forced back to BIGINT.

    DuckDB types ``SUM(int)`` as HUGEINT, which ``duckdb.df()`` converts
    to pandas float64 — while Spark's ``sum(int)`` arrives as int64. The
    driver's value hash is dtype-sensitive, so ``5.0`` vs ``5`` is a
    mismatch even though the values are equal (VERDICT r2 defect #1 —
    both red rows and four latent ones). CAST back to BIGINT makes
    ``.df()`` emit int64, matching Spark. Use for EVERY integer-typed
    final column produced by SUM in an oracle."""
    return f"CAST(SUM({expr}) AS BIGINT)"


def sql_davg_int(expr: str, scale: int = 4) -> str:
    f = 10 ** scale
    return (
        f"(CAST((SUM(CAST(({expr}) AS BIGINT)) * {f})"
        f" // COUNT({expr}) AS DOUBLE) / {f})"
    )
