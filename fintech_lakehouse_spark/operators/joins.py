"""As-of join operator (SURVEY §2.3 J4 — the currency-conversion
shape: each left row picks the most recent right row at or before its
timestamp, per key).

Spark has no ASOF JOIN; the scalable realization is union-the-streams
+ last(ignorenulls) over a keyed time-ordered window: ONE shuffle on
the key, no interval-join row explosion, no skew amplification. This
is the same rewrite the plans registry proves against DuckDB's native
ASOF JOIN (plans/windows.py::purchase_asof_click).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_columns: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right_time <= left_time`` matching the key columns ``on``.

    ``value_columns``: right columns to carry (default: all non-key,
    non-time). Right rows tied on (key, time) are reduced with max()
    first so the result is deterministic."""
    if value_columns is None:
        value_columns = [
            c for c in right.columns if c not in set(on) and c != right_time
        ]
    # ASOF semantics on the three NULL axes (review finding r6s5):
    # * a right row with NULL time can never satisfy right_time <=
    #   left_time (three-valued comparison) — drop it, or it would
    #   sort nulls-first and act as a universal "before all time"
    #   default for every left row;
    # * NULL join keys never match in SQL joins — right rows with a
    #   null key are dropped (left rows with null keys keep flowing
    #   and get NULL asof values, since no right rows share their
    #   window partition);
    # * the filled payload is ONE STRUCT of all value columns, so the
    #   LATEST RIGHT ROW wins atomically — per-column
    #   last(ignorenulls) skipped legitimately-NULL values and could
    #   stitch a frankenrow out of different right rows.
    key_ok = None
    for k in on:
        c = F.col(k).isNotNull()
        key_ok = c if key_ok is None else key_ok & c
    right_clean = right.filter(key_ok & F.col(right_time).isNotNull())
    # Deterministic: one right row per (key, time).
    right_dedup = right_clean.groupBy(*on, F.col(right_time).alias("_t")).agg(
        *[F.max(c).alias(c) for c in value_columns]
    )
    payload = F.struct(*[F.col(c) for c in value_columns])
    payload_type = right_dedup.select(payload.alias("_p")).schema["_p"].dataType
    right_stream = right_dedup.select(
        *on,
        F.col("_t"),
        F.lit(0).alias("_stream"),
        payload.alias("_r_vals"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
        ],
    )
    left_stream = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_stream"),
        F.lit(None).cast(payload_type).alias("_r_vals"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # Right rows sort before left rows at equal time (_stream 0 < 1):
    # a right row at exactly the left timestamp is visible (<=).
    window = (
        Window.partitionBy(*on)
        .orderBy("_t", "_stream")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = right_stream.unionByName(left_stream)
    filled = unioned.select(
        "*",
        F.last("_r_vals", ignorenulls=True).over(window).alias("_f_vals"),
    )
    return filled.filter(F.col("_stream") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[
            F.col("_f_vals").getField(c).alias(f"{c}{suffix}")
            for c in value_columns
        ],
    )


def point_in_time_join(
    fact: DataFrame,
    scd2_dim: DataFrame,
    key: str,
    fact_time: str,
    dim_columns: list[str] | None = None,
) -> DataFrame:
    """Join a fact to the SCD2 dimension version that was valid AT the
    fact's own timestamp: ``effective_from <= ts < effective_to``
    (open-ended current rows have effective_to IS NULL). The
    companion to ``sources.writers.scd2_upsert`` — without it a
    restated attribute silently rewrites history in every report.

    Shape: equi-join on the key carries the shuffle; the validity
    range is a post-join filter within the key group, so there is no
    interval-join row explosion (a key's version count is the fan-out
    bound, typically single digits). Facts with no valid dim version
    (before the key existed) are kept with null dim columns — dropping
    them would silently shrink the fact table."""
    if dim_columns is None:
        dim_columns = [
            c
            for c in scd2_dim.columns
            if c not in (key, "effective_from", "effective_to", "is_current")
        ]
    # Collision-safe carry: a dim column sharing a fact column's name
    # (e.g. both carry `status`) would emit two same-named output
    # columns (AMBIGUOUS_REFERENCE downstream), and dropping the
    # validity columns by bare name would also strip a same-named
    # FACT column (review finding r6s5). Colliding dim columns get a
    # `_dim` suffix; validity bounds ride internal aliases.
    fact_cols = set(fact.columns)
    out_names = {
        c: (f"{c}_dim" if c in fact_cols else c) for c in dim_columns
    }
    dim = scd2_dim.select(
        F.col(key).alias("_pit_key"),
        F.col("effective_from").alias("_pit_from"),
        F.col("effective_to").alias("_pit_to"),
        *[F.col(c).alias(out_names[c]) for c in dim_columns],
    )
    cond = (
        (fact[fact_time] >= dim._pit_from)
        & (dim._pit_to.isNull() | (fact[fact_time] < dim._pit_to))
    )
    return (
        fact.join(dim, (fact[key] == dim._pit_key) & cond, "left")
        .drop("_pit_key", "_pit_from", "_pit_to")
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_columns: list[str] | None = None,
    suffix: str = "_nearest",
) -> DataFrame:
    """Left NEAREST-event join: for each left row, the right row
    matching ``on`` whose time is CLOSEST in either direction — the
    bidirectional completion of :func:`asof_join` (kdb's ``aj`` looks
    only backward; TimescaleDB/feature-store "nearest observation"
    lookups need both). Equal distances prefer the EARLIER right row
    (the backward candidate), so the result is total.

    Both directions come from ONE union-stream window pass (the
    asof_join machinery run forward and backward over the same
    shuffle): backward = last non-null payload up to the left row,
    forward = first non-null payload after it. A right row at exactly
    the left time is visible to the backward frame (delta 0, which
    wins every tie), so forward-frame exclusivity at equal times is
    immaterial.

    ``left_time`` / ``right_time`` must be NUMERIC (epoch micros, not
    raw timestamps): nearest-ness needs subtraction, and converting
    timestamps upstream keeps the tie arithmetic engine-exact.
    NULL-key and NULL-time right rows are dropped (the asof_join
    contract); right rows tied on (key, time) reduce with max() first.
    Output: every left row + ``value_columns`` and the matched right
    time, all suffixed; unmatched left rows keep NULLs.

    Scale shape: one shuffle on the key columns carries both window
    directions; state per key is one payload struct each way."""
    # Fail fast on reserved-name collisions: the union-stream pass
    # rides internal columns (_t/_stream/_r_vals/_prev/_next/_chosen/
    # _rt and the _l_<col> left-carry prefix); an input already
    # carrying one of these would silently corrupt the window logic
    # instead of erroring (review finding r7).
    _reserved = {"_t", "_stream", "_r_vals", "_prev", "_next", "_chosen", "_rt"}
    _bad = sorted(
        {c for c in (*left.columns, *right.columns) if c in _reserved}
        | {c for c in (*left.columns, *right.columns) if c.startswith("_l_")}
    )
    if _bad:
        raise ValueError(
            "nearest_join: input columns collide with reserved internal "
            f"names (rename before joining): {_bad}"
        )
    if value_columns is None:
        value_columns = [
            c for c in right.columns if c not in set(on) and c != right_time
        ]
    key_ok = None
    for k in on:
        c = F.col(k).isNotNull()
        key_ok = c if key_ok is None else key_ok & c
    right_clean = right.filter(key_ok & F.col(right_time).isNotNull())
    right_dedup = right_clean.groupBy(*on, F.col(right_time).alias("_t")).agg(
        *[F.max(c).alias(c) for c in value_columns]
    )
    payload = F.struct(
        F.col("_t").alias("_rt"), *[F.col(c) for c in value_columns]
    )
    payload_type = right_dedup.select(payload.alias("_p")).schema["_p"].dataType
    right_stream = right_dedup.select(
        *on,
        F.col("_t"),
        F.lit(0).alias("_stream"),
        payload.alias("_r_vals"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
        ],
    )
    left_stream = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_stream"),
        F.lit(None).cast(payload_type).alias("_r_vals"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    order = Window.partitionBy(*on).orderBy("_t", "_stream")
    bw = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fw = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned = right_stream.unionByName(left_stream)
    filled = unioned.select(
        "*",
        F.last("_r_vals", ignorenulls=True).over(bw).alias("_prev"),
        F.first("_r_vals", ignorenulls=True).over(fw).alias("_next"),
    )
    pick_prev = F.col("_next").isNull() | (
        F.col("_prev").isNotNull()
        & (
            (F.col("_t") - F.col("_prev._rt"))
            <= (F.col("_next._rt") - F.col("_t"))
        )
    )
    chosen = F.when(pick_prev, F.col("_prev")).otherwise(F.col("_next"))
    return (
        filled.filter(F.col("_stream") == 1)
        .withColumn("_chosen", chosen)
        .select(
            *[F.col(f"_l_{c}").alias(c) for c in left.columns],
            F.col("_chosen._rt").alias(f"{right_time}{suffix}"),
            *[
                F.col("_chosen").getField(c).alias(f"{c}{suffix}")
                for c in value_columns
            ],
        )
    )
