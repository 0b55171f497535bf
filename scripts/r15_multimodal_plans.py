#!/usr/bin/env python
"""Dump before/after plans for the multimodal codec queries changed in
r15. The 'before' plan is reconstructed by patching the one change
(_spread) to identity — bit-identical to the pre-change plan, since
_spread is the only r15 diff on these queries."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fintech_lakehouse_spark.plans import QUERIES  # noqa: E402
from fintech_lakehouse_spark.plans import multimodal  # noqa: E402
from fintech_lakehouse_spark.session import get_spark  # noqa: E402

NAMES = [
    "image_decode_roundtrip",
    "audio_decode_roundtrip",
    "media_header_roundtrip",
    "jpeg_lossless_roundtrip",
]


def dump(spark, name: str, suffix: str, out_dir: str) -> None:
    df = QUERIES[name](spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                             "/root/testdata/sf0.1"))
    text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(text)
    print(f"wrote {path}")


def main() -> None:
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("r15-mm-plans", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": cpus})
    spark.sparkContext.setLogLevel("ERROR")
    real_spread = multimodal._spread
    multimodal._spread = lambda df: df  # reconstruct the pre-r15 plan
    try:
        for name in NAMES:
            dump(spark, name, "before", out_dir)
    finally:
        multimodal._spread = real_spread
    for name in NAMES:
        dump(spark, name, "after", out_dir)


if __name__ == "__main__":
    main()
