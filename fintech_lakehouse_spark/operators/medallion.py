"""Bronze→Silver cast/derive operator (SURVEY §2.2 P12-P14 — the
transform the reference's silver schemas imply but never implement;
src/transformations/ is empty).

Generated from the declarative TABLE_SPECS so schema and transform
cannot drift. One narrow projection: every cast and derived column in
a single whole-stage-codegen pass, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, DateType, TimestampType

from fintech_lakehouse_spark.schemas.spec import TABLE_SPECS


def bronze_to_silver(df: DataFrame, table: str) -> DataFrame:
    """Cast an all-string bronze DataFrame to the typed silver shape
    and compute derived columns.

    Casting is permissive (malformed values → NULL via try-style
    semantics) so a bad cell quarantines downstream via the DQ
    checker's NOT-NULL completeness checks instead of failing the job.
    Metadata columns (underscore-prefixed) pass through untouched."""
    spec = TABLE_SPECS[table]
    cast_cols: list = []
    derived: list[tuple[str, str]] = []
    for name, dtype, _nullable, derive in spec:
        if isinstance(dtype, ArrayType):
            # array columns are always produced by a derive expression
            # (split of the pipe-joined raw column) — a None here would
            # surface later as an opaque F.expr(None) TypeError
            if derive is None:
                raise ValueError(
                    f"spec row {name!r}: ArrayType requires a derive expression"
                )
            derived.append((name, derive))  # array split runs post-cast
            continue
        if derive is not None:
            derived.append((name, derive))
            continue
        source = F.col(name)
        if isinstance(dtype, BooleanType):
            # Accept true/false/1/0 in any case (bronze is raw text).
            casted = F.when(
                F.lower(F.trim(source)).isin("true", "1", "t", "yes"), F.lit(True)
            ).when(
                F.lower(F.trim(source)).isin("false", "0", "f", "no"), F.lit(False)
            )
        elif isinstance(dtype, TimestampType):
            casted = F.try_to_timestamp(source)
        elif isinstance(dtype, DateType):
            casted = F.try_to_timestamp(source).cast("date")
        else:
            casted = source.try_cast(dtype)
        cast_cols.append(casted.alias(name))
    passthrough = [F.col(c) for c in df.columns if c.startswith("_")]
    raw_arrays = [
        F.col(f"{name}_raw")
        for name, dtype, _n, _d in spec
        if isinstance(dtype, ArrayType) and f"{name}_raw" in df.columns
    ]
    typed = df.select(*cast_cols, *raw_arrays, *passthrough)
    for name, expr in derived:
        typed = typed.withColumn(name, F.expr(expr))
    drop_raw = [c for c in typed.columns if c.endswith("_raw")]
    # Order columns exactly as the silver schema declares.
    ordered = [name for name, *_ in spec] + [
        c for c in typed.columns if c.startswith("_")
    ]
    return typed.drop(*drop_raw).select(*ordered)
