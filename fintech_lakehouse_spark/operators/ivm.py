"""Incremental view maintenance (IVM) from a change-data-feed.

The reference maintains its Gold aggregates (`agg_daily_metrics`,
`agg_customer_360`, `agg_merchant_performance` — declared at
reference src/config/base.py:92-96) by full recomputation over Silver.
At 100 TB a nightly full groupBy over the fact table is the single
most expensive job in the lake; the standard fix is to maintain the
aggregate INCREMENTALLY from the table's change feed (Delta CDF /
Databricks materialized views do exactly this). This module is the
parquet-mode analog, built on the four-type changelog that
``sources.writers.snapshot_diff(emit_preimage=True)`` and the
``foreach_batch_cdf`` streaming sink produce:

* ``insert`` / ``update_postimage`` rows contribute +1 (and +value),
* ``delete`` / ``update_preimage`` rows contribute -1 (and -value),

so ``agg_new = agg_old + signed_delta`` holds EXACTLY for any
distributive aggregate (count, sum — and avg as sum/count), including
rows whose update MOVES them across groups (the preimage retracts
from the old group while the postimage adds to the new one).

Determinism: value deltas are summed in DECIMAL (exact,
order-independent — plans/_num.py rationale), so a maintained total
is bit-equal to the recomputed total, not merely close; the
self-check query `changelog_incremental_agg` (plans/quality.py) and
the streaming consumer test pin that equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Change types that ADD a row's contribution vs RETRACT it.
_ADDS = ("insert", "update_postimage")
_RETRACTS = ("delete", "update_preimage")

# Exact-arithmetic types: per-row money values are DECIMAL(12,2)
# (plans/_num.MONEY; literal duplicated to keep operators/ free of
# plans/ imports), but MAINTAINED TOTALS get the reference's wider
# DECIMAL(18,2) (ref src/schemas/silver.py:32-37) — a per-group sum
# over a 100 TB fact table overflows (12,2)'s 1e10 ceiling (it did at
# sf0.1 already: 1.06e10 per status).
_MONEY = "decimal(12,2)"
_TOTAL = "decimal(18,2)"


def changelog_agg_delta(
    changelog: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Signed per-group delta of a four-type changelog.

    Returns one row per group touched by the changelog with
    ``n_delta`` (net row-count change) and one ``<alias>_delta``
    DECIMAL column per entry of ``sum_cols`` (alias -> source column).

    Shape: a single map-side-combinable groupBy over the changelog —
    change-cardinality sized, never base-table sized. That asymmetry
    is the entire point of IVM: the nightly Gold rebuild is
    O(fact table), this is O(what changed today).

    Raises on change types outside the four-type vocabulary — a
    three-type changelog (plain 'update' rows, no preimage) is NOT
    sufficient to maintain sums and silently treating it as inserts
    would corrupt the view."""
    sum_cols = sum_cols or {}
    sign = (
        F.when(F.col("_change_type").isin(*_ADDS), F.lit(1))
        .when(F.col("_change_type").isin(*_RETRACTS), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("changelog_agg_delta: unsupported _change_type '"),
                    F.col("_change_type"),
                    F.lit("' (need emit_preimage=True changelogs)"),
                )
            )
        )
    )
    aggs = [F.sum(sign).cast("long").alias("n_delta")]
    for alias, col in sum_cols.items():
        aggs.append(
            F.sum(sign.cast(_MONEY) * F.col(col).cast(_MONEY))
            .cast(_TOTAL)
            .alias(f"{alias}_delta")
        )
    return changelog.groupBy(*group_cols).agg(*aggs)


def apply_agg_delta(
    current: DataFrame | None,
    delta: DataFrame,
    group_cols: list[str],
    sum_aliases: list[str] | None = None,
) -> DataFrame:
    """Merge a signed delta into the maintained aggregate.

    ``current`` has columns ``group_cols + [n_rows] + sum_aliases``;
    ``None`` means the view does not exist yet (first batch). Groups
    whose maintained ``n_rows`` drops to 0 are removed — a group with
    no surviving base rows must disappear from the view exactly as it
    would from a recomputation.

    Shape: full-outer join on the group key between two
    GROUP-CARDINALITY relations (the view and the delta) — the base
    table is never touched. At 100 TB the view is orders of magnitude
    smaller than the fact table; if even the view is huge, partition
    both sides by the group key so the join co-locates."""
    sum_aliases = sum_aliases or []
    if current is None:
        out = delta.select(
            *group_cols,
            F.col("n_delta").alias("n_rows"),
            *[F.col(f"{a}_delta").alias(a) for a in sum_aliases],
        )
        return out.filter(F.col("n_rows") != 0)
    cur = current.alias("cur")
    d = delta.alias("d")
    cond = None
    for k in group_cols:
        eq = F.col(f"cur.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = eq if cond is None else cond & eq
    zero_n = F.lit(0).cast("long")
    merged = cur.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"d.{k}"), F.col(f"cur.{k}")).alias(k)
            for k in group_cols
        ],
        (
            F.coalesce(F.col("cur.n_rows"), zero_n)
            + F.coalesce(F.col("d.n_delta"), zero_n)
        ).alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"cur.{a}"), F.lit(0).cast(_TOTAL))
                + F.coalesce(F.col(f"d.{a}_delta"), F.lit(0).cast(_TOTAL))
            )
            .cast(_TOTAL)
            .alias(a)
            for a in sum_aliases
        ],
    )
    return merged.filter(F.col("n_rows") != 0)
