#!/usr/bin/env python
"""Skew-join A/B (companion to skew_velocity_bench): one hot key owns
80% of a fact table joining a non-broadcastable side. Times three
strategies so the skew toolkit's guidance is measured, not asserted:

  (a) plain shuffle join, AQE skew-join ENABLED (Spark's own fix —
      splits oversized partitions at runtime),
  (b) plain shuffle join, AQE skew-join disabled (the baseline
      failure mode),
  (c) salted_shuffle_join (operators/skew.py) — works even where AQE
      can't engage (non-sort-merge paths, pre-AQE Spark, streaming
      micro-batches).

Broadcast is disabled throughout to force the shuffle-join regime the
operator exists for. Usage:

    python scripts/skew_join_bench.py [n_fact] [n_dim] [hot_frac]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fintech_lakehouse_spark.operators.skew import salted_shuffle_join
from fintech_lakehouse_spark.session import get_spark


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    hot = float(sys.argv[3]) if len(sys.argv) > 3 else 0.8
    spark = get_spark(
        "skew-join",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact = (
        spark.range(n_fact)
        .withColumn(
            "k",
            F.when(F.rand(seed=1) < hot, F.lit(1)).otherwise(
                (F.rand(seed=2) * n_dim).cast("long")
            ),
        )
        .withColumn("v", F.rand(seed=3))
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("d")
    )

    def run(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    def plain():
        return fact.join(dim, "k").select("id", "v", "d")

    def salted():
        return salted_shuffle_join(fact, dim, "k", n_salts=32).select(
            "id", "v", "d"
        )

    # warm codegen
    run(plain().limit(1000))
    print(f"fact={n_fact} dim={n_dim} hot_share={hot} (broadcast disabled)")
    print("| strategy | run1 | run2 | run3 | min |")
    print("|---|---|---|---|---|")
    cases = [
        ("plain_aqe_skewjoin_on", plain, "true"),
        ("plain_aqe_skewjoin_off", plain, "false"),
        ("salted_shuffle_join", salted, "false"),
    ]
    for name, fn, aqe_skew in cases:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
        samples = [run(fn()) for _ in range(3)]
        print(
            f"| {name} | " + " | ".join(str(s) for s in samples)
            + f" | {min(samples)} |",
            flush=True,
        )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


if __name__ == "__main__":
    main()
