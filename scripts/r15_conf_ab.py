#!/usr/bin/env python
"""r15 config A/B probe: time a query subset under a conf variant in a
FRESH JVM (static confs like spark.io.compression.codec only apply at
JVM launch). Prints one JSON line.

Usage: python scripts/r15_conf_ab.py '<json-conf-overrides>' [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fintech_lakehouse_spark.plans import QUERIES  # noqa: E402
from fintech_lakehouse_spark.plans.text import reset_stage_caches  # noqa: E402
from fintech_lakehouse_spark.session import get_spark  # noqa: E402

DEFAULT_SET = [
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "test_set_decontamination",
    "winnowing_candidate_pairs",
    "pricing_summary",
    "regional_revenue",
    "knn_bruteforce_cosine",
    "lsh_bucketed_neighbors",
    "curated_corpus_shards",
]


def _steal() -> tuple[int, int]:
    v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return v[7], sum(v)


def main() -> None:
    overrides = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    names = sys.argv[2:] or DEFAULT_SET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("R15_AB_REPEATS", "3"))
    conf = {"spark.sql.shuffle.partitions": cpus}
    conf.update(overrides)
    spark = get_spark("r15-conf-ab", master=f"local[{cpus}]", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:  # codegen warmup
        try:
            reset_stage_caches()
            QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
    out: dict[str, float] = {}
    s0, t0 = _steal()
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            reset_stage_caches()
            t = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t)
        out[name] = round(best, 3)
    s1, t1 = _steal()
    print(
        json.dumps(
            {
                "conf": overrides,
                "queries": out,
                "total": round(sum(out.values()), 3),
                "steal_fraction": round((s1 - s0) / max(t1 - t0, 1), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
