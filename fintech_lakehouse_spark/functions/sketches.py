"""Mergeable sketches for approximate analytics at corpus scale.

Count-min sketch is the streaming/production answer to "how often does
token X appear in 100 TB of text" when the exact global token count
(vocab_top_tokens) is too expensive to maintain online: the sketch is
a fixed-size (eps, confidence)-parameterized array that aggregates
distributedly (map-side partial merge, exactly like a sum) and answers
point queries with a ONE-SIDED error guarantee —
``exact <= estimate <= exact + eps * N`` with probability
``confidence``. Spark's built-in `count_min_sketch` aggregate
(org.apache.spark.util.sketch.CountMinSketch) does the distributed
build; querying the merged sketch is a driver-side O(depth) lookup on
a kilobyte-scale object — the same bounded-collect pattern as the IVF
query batch (functions/vectors.py).

Complements the exact paths: vocab_top_tokens is the ground truth
(full shuffle), approx_distinct_users covers cardinality (HLL), this
covers frequency point queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Column
from pyspark.sql import functions as F


def build_count_min_sketch(
    df: DataFrame,
    col: str | Column,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """One merged count-min sketch over every value of ``col``.

    Runs as a single distributed aggregate (partial sketches merge
    associatively on the executors); only the final ~100 KB sketch
    reaches the driver. ``eps`` bounds the overestimate at ``eps * N``
    items; ``seed`` fixes the hash family so rebuilds are
    deterministic."""
    # build over the STRING rendering: query_count_min_sketch hashes
    # Python strings, and a sketch built over a long column's native
    # 8-byte encoding would answer every string query from an
    # unrelated bucket with no error (review finding r6s5)
    c = F.col(col) if isinstance(col, str) else col
    row = df.agg(
        F.count_min_sketch(
            c.cast("string"), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("sketch")
    ).collect()[0]
    return bytes(row["sketch"])


def cms_bucket_md5(col: str | Column, j: int, width: int) -> Column:
    """Row-``j`` bucket of the PORTABLE count-min hash family: bucket =
    first-48-bits(md5('cms{j}|' || value)) mod width. Seed-salting the
    row index into the md5 input gives ``depth`` independent hash
    functions from one primitive; 12 hex chars keep the conv() inside
    long range (same convention as functions/sampling.py::hash_bucket,
    so the DuckDB twin is the same '0x'||substr(md5(..),1,12) cast)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat_ws("|", F.lit(f"cms{j}"), c.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % width


def cms_sketch_table_md5(
    df: DataFrame, col: str = "token", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch as a (h, bucket, cnt) DataFrame — the fully
    DISTRIBUTED formulation: each value contributes one count to its
    bucket in each of ``depth`` hash rows (explode over a struct
    array), and the groupBy's map-side partial aggregation IS the
    mergeable-sketch property — executors build partial sketches and
    the shuffle merges them, with at most depth×width rows ever
    materialized. Unlike the JVM build_count_min_sketch (driver-side
    collect of an opaque binary), the sketch here stays a relation:
    queryable by join, persistable as a table, and — because the hash
    family is seed-salted md5 — bit-replicable in any engine with md5
    (the DuckDB oracle twin replays it exactly)."""
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("h"),
                cms_bucket_md5(col, j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(probes).alias("p"))
        .select("p.h", "p.bucket")
        .groupBy("h", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates_md5(
    sketch: DataFrame,
    items: DataFrame,
    col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query a (h, bucket, cnt) sketch for every row of
    ``items``: estimate = MIN over hash rows of the bucket count —
    carrying all other ``items`` columns through. The probe side is
    bounded by the query list (broadcast), the sketch streams — at
    production width (millions of buckets over 100 TB of tokens) the
    sketch is the big side and never moves. One-sided guarantee:
    exact <= estimate <= exact + (e/width)·N with prob 1 - e^-depth."""
    carry = [c for c in items.columns]
    probes = items.select(
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("h"),
                        cms_bucket_md5(col, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select(*carry, "p.h", "p.bucket")
    # An empty bucket has NO sketch row, so an inner join alone drops
    # it — min over only the non-empty buckets INFLATES the estimate,
    # and an item with zero non-empty buckets vanished from the output
    # entirely (review finding r6s5). Correct CMS semantics: a missing
    # bucket contributes count 0. Keep the streamed-sketch join shape
    # (sketch big side, probes broadcast, inner) and repair the
    # semantics with a hit counter + a broadcast join back to items:
    # fewer than ``depth`` hits means some probed bucket was empty →
    # the true minimum is 0.
    hits = (
        sketch.join(F.broadcast(probes), ["h", "bucket"])
        .groupBy(*carry)
        .agg(
            F.min("cnt").alias("_min_cnt"),
            F.count(F.lit(1)).alias("_n_hit"),
        )
    )
    return items.join(F.broadcast(hits), carry, "left").select(
        *carry,
        F.when(
            F.col("_n_hit").isNull() | (F.col("_n_hit") < depth), F.lit(0)
        )
        .otherwise(F.col("_min_cnt"))
        .cast("long")
        .alias("cms_estimate"),
    )


def query_count_min_sketch(spark, sketch: bytes, items: list[str]) -> dict[str, int]:
    """Point-query a serialized sketch for ``items`` (driver-side,
    O(len(items) * depth) — bounded by the query list, never data
    size). Uses the same JVM CountMinSketch class that built the
    sketch, so hashing is bit-identical."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(sketch)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return {item: int(cms.estimateCount(item)) for item in items}


# ---------------------------------------------------------------------------
# Portable Bloom filter (set-membership sketch)
#
# The third classic sketch next to CMS (frequency) and HLL
# (cardinality): a fixed-bit-domain set-membership structure with a
# ONE-SIDED guarantee — a member is NEVER reported absent; a
# non-member is falsely reported present with probability
# ~(1 - e^(-k*n/m))^k. That one-sidedness is exactly what
# decontamination needs: bloom-flagged is a superset of truly
# contaminated, so the cheap pass can never hide real leakage.
#
# Like cms_*_md5, the hash family is probe-salted md5, so any engine
# with md5 replays membership bit-for-bit (the DuckDB oracle twin
# does). Spark's own BloomFilter aggregate
# (org.apache.spark.util.sketch.BloomFilter) is the JVM fast path but
# hashes with a private murmur variant — unverifiable cross-engine —
# so the portable family is the default here.
# ---------------------------------------------------------------------------

BLOOM_K = 4
BLOOM_M_BITS = 1 << 20


def bloom_position_md5(col: str | Column, j: int, m_bits: int = BLOOM_M_BITS) -> Column:
    """Probe-``j`` bit position of the portable Bloom hash family:
    first-48-bits(md5('bloom{j}|' || value)) mod m_bits — the same
    salted-md5 construction as cms_bucket_md5, sharing its DuckDB twin
    ('0x' || substr(md5(..), 1, 12) cast)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(
        F.concat_ws("|", F.lit(f"bloom{j}"), c.cast("string")).cast("binary")
    )
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % m_bits


def bloom_build_md5(
    df: DataFrame,
    col: str | Column = "gram",
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """Build the Bloom filter over every value of ``col`` as a
    single-column relation of set bit positions (``pos: long``).

    The build is one distributed explode + distinct whose result is
    bounded by ``m_bits`` ROWS REGARDLESS OF INPUT SIZE — that bound
    (not the input's cardinality) is what makes the filter
    broadcastable: at the default 2^20 bits the relation tops out at
    8 MiB of longs even if the build side held billions of values.
    Kept as a relation (not a packed bitmap literal) for the same
    reason cms_sketch_table_md5 is: it stays joinable, persistable,
    and engine-replicable. A packed representation for broadcast
    variables would group pos DIV 63 into 63-bit words via
    bit_or(shiftleft(1, pos % 63)) — 63, not 64, because DuckDB
    raises on 1::BIGINT << 63 while Spark wraps silently, and the
    oracle must replay every word identically."""
    probes = F.array(*[bloom_position_md5(col, j, m_bits) for j in range(k)])
    return df.select(F.explode(probes).alias("pos")).distinct()


def bloom_filter_members(
    items: DataFrame,
    bloom: DataFrame,
    col: str | Column = "gram",
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """Filter ``items`` to rows whose ``col`` the Bloom filter reports
    as members (all ``k`` probe bits set), as a chain of ``k``
    broadcast LEFT SEMI joins — the probe side keeps its partitioning
    and NEVER SHUFFLES, which is the whole point at 100 TB: corpus-side
    membership against a build-side set becomes a pipelined scan
    against 8 MiB of broadcast bits instead of an equi-join shuffle of
    every corpus gram. One-sided: every true member survives; false
    positives ~(k*n/m)^k leak through and must be tolerated (or
    re-checked by the exact join on the tiny flagged subset)."""
    out = items
    for j in range(k):
        out = out.join(
            F.broadcast(bloom),
            bloom_position_md5(col, j, m_bits) == bloom["pos"],
            "left_semi",
        )
    return out


def bloom_size_for(n_items: int, target_fp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate — the sizing rule
    the BASELINE scale experiment demonstrates empirically (an
    undersized 2^20-bit filter saturates at 16× corpus; 2^24 restores
    linearity): m = -n·ln(p)/ln(2)², k = (m/n)·ln(2), both rounded up
    to safe values, m to the next power of two so the modulo stays a
    cheap mask-equivalent. The build relation is bounded by min(m,
    k·n) rows, so oversizing costs broadcast bytes, never
    correctness."""
    import math

    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not 0 < target_fp < 1:
        raise ValueError("target_fp must be in (0, 1)")
    m = -n_items * math.log(target_fp) / (math.log(2) ** 2)
    m_bits = 1 << max(6, math.ceil(math.log2(m)))
    k = max(1, round((m_bits / n_items) * math.log(2)))
    return m_bits, min(k, 16)


def misra_gries_summaries(
    df: DataFrame, col: str, m: int = 256
) -> DataFrame:
    """Per-partition Misra-Gries heavy-hitter summaries (Misra &
    Gries 1982; mergeable-summaries formulation of Agarwal et al.,
    PODS'12 — both public results), Arrow-batched: each partition
    folds its batches' value_counts through MG-merge (sum counts; if
    more than ``m`` survive, subtract the (m+1)-th largest and drop
    ≤0) and emits its ≤m (item, counter) rows.

    Guarantees carried to the merged result (sum counters per item
    across partitions — do NOT truncate the union): for true count
    f(t) over N rows, f(t) − N/m ≤ C(t) ≤ f(t), so every item with
    f(t) > N/m is PRESENT. Counter values depend on partitioning
    (like any streaming summary); the guarantees do not — queries must
    emit only guarantee-derived columns, never raw counters.

    This is the counter-based complement of the CMS family above:
    deterministic (no hash collisions), O(m) state, and the natural
    distributed shape — tiny per-partition state, one
    map-side-combinable merge, no second pass over raw data."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("item", LongType(), False),
            StructField("counter", LongType(), False),
        ]
    )

    def part(iterator):
        import pandas as pd

        counters: dict[int, int] = {}
        for pdf in iterator:
            for item, cnt in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > m:
                sub = sorted(counters.values(), reverse=True)[m]
                counters = {
                    k: v - sub for k, v in counters.items() if v > sub
                }
        yield pd.DataFrame(
            {"item": list(counters), "counter": list(counters.values())}
        )

    return df.select(F.col(col).cast("long").alias(col)).mapInPandas(
        part, schema
    )


def misra_gries_merged(df: DataFrame, col: str, m: int = 256) -> DataFrame:
    """Merged global MG summary: per-partition summaries unioned by a
    map-side-combinable sum. Output (item, counter) with the
    f(t) − N/m ≤ counter ≤ f(t) contract of misra_gries_summaries."""
    return (
        misra_gries_summaries(df, col, m)
        .groupBy("item")
        .agg(F.sum("counter").alias("counter"))
    )
