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
    c = F.col(col) if isinstance(col, str) else col
    row = df.agg(
        F.count_min_sketch(c, F.lit(eps), F.lit(confidence), F.lit(seed)).alias(
            "sketch"
        )
    ).collect()[0]
    return bytes(row["sketch"])


def query_count_min_sketch(spark, sketch: bytes, items: list[str]) -> dict[str, int]:
    """Point-query a serialized sketch for ``items`` (driver-side,
    O(len(items) * depth) — bounded by the query list, never data
    size). Uses the same JVM CountMinSketch class that built the
    sketch, so hashing is bit-identical."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(sketch)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    return {item: int(cms.estimateCount(item)) for item in items}
