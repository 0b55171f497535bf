"""Deterministic sampling & splitting (SURVEY §7.6 extension — the
training-data-prep surface: stratified corpus sampling and train/val/
test splits).

Everything keys off a PORTABLE md5 hash bucket rather than rand():

* reproducible — the same row lands in the same sample/split on every
  run, every retry, every repartitioning (rand() changes under task
  retry and partition count; at 100 TB retries are a certainty);
* joinable — two tables sampled on the same key sample CONSISTENTLY
  (a user's orders and events stay together);
* oracle-able — DuckDB computes the identical buckets, so sampling
  queries get exact value-hash verification (functions/text.py
  documents the md5 portability contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(
    key: str | Column, salt: str = "", n_buckets: int = N_BUCKETS
) -> Column:
    """Uniform bucket in [0, n_buckets) from the md5 of salt|key. The
    salt decorrelates independent sampling decisions on the same key
    (e.g. sampling vs splitting); ``n_buckets`` generalizes the recipe
    to hashed feature spaces (plans/selection.py) — ONE definition of
    the md5 contract, so the Spark and DuckDB sides can never drift
    apart per call site."""
    c = F.col(key) if isinstance(key, str) else key
    # NULL keys get an explicit sentinel: concat_ws silently DROPS a
    # null argument (bucket = md5 of the salt alone) while the DuckDB
    # twin's '||' nulls the whole expression — the one input where the
    # "bit-exact twin" contract broke (review finding r6s5). With the
    # sentinel both engines bucket null keys identically.
    k = F.coalesce(c.cast("string"), F.lit("__NULL_KEY__"))
    h = F.md5(F.concat_ws("|", F.lit(salt), k).cast("binary"))
    return (
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % n_buckets
    ).alias("bucket")


def sql_hash_bucket(key: str, salt: str = "", n_buckets: int = N_BUCKETS) -> str:
    """DuckDB twin of :func:`hash_bucket` (same values, bit-exact,
    including the NULL-key sentinel)."""
    return (
        f"(('0x' || substr(md5('{salt}' || '|' || "
        f"COALESCE(CAST({key} AS VARCHAR), '__NULL_KEY__')), 1, 12))"
        f"::BIGINT % {n_buckets})"
    )


def deterministic_sample(
    df: DataFrame, rate: float, key: str, salt: str = "sample"
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by hash bucket — a filter, no
    shuffle, no rand(). Same key ⇒ same decision forever."""
    # round, not int: float products like 0.07*10000 land a hair below
    # the integer and truncation silently drops a whole bucket
    return df.filter(hash_bucket(key, salt) < round(rate * N_BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata: str,
    rates: dict[str, float],
    key: str,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum sampling rates (downsample dominant languages,
    keep all of rare ones — the class-rebalancing move every corpus
    pipeline makes). Implemented as one hash-bucket comparison against
    a CASE over the strata column: single scan, no shuffle, no join."""
    threshold = F.lit(round(default_rate * N_BUCKETS))
    for value, rate in rates.items():
        threshold = (
            F.when(F.col(strata) == value, round(rate * N_BUCKETS)).otherwise(
                threshold
            )
        )
    return df.filter(hash_bucket(key, salt) < threshold)


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test'/...) by hash-bucket
    range. Weights must sum to ≤ 1; any remainder falls into the LAST
    named split. Deterministic: a document never migrates between
    train and test across runs — the leakage guarantee rand() cannot
    give."""
    if not weights:
        raise ValueError("hash_split needs at least one named split")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(
            f"split weights sum to {total:.4f} > 1 — later splits would "
            f"silently receive zero rows"
        )
    bucket = hash_bucket(key, salt)
    expr = None
    cumulative = 0.0
    names = list(weights.items())
    for name, w in names[:-1]:
        cumulative += w
        cond = bucket < round(cumulative * N_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
