#!/usr/bin/env python
"""Dump .explain("formatted") for headline/v2 queries to plans/r16/.

Usage: python scripts/r16_explain.py <suffix> [query ...]
Writes plans/r16/<query>_<suffix>.txt for each query (default: every
headline + v2 query from bench.py). The explain is taken against
$SPARK_GRAFT_SF_DIR (default sf0.1) with the same session config as
bench.py, so the plan shape matches what the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, HEADLINE_V2  # noqa: E402
from fintech_lakehouse_spark.plans import QUERIES  # noqa: E402
from fintech_lakehouse_spark.plans.text import reset_stage_caches  # noqa: E402
from fintech_lakehouse_spark.session import get_spark  # noqa: E402


def _patch_pre_r16() -> None:
    """Reconstruct the r15-shipped plan shapes (the r15 multimodal
    before-file recipe): conditional scan spread off, winnowing back
    on the JVM expression twin, pair-stage view un-coalesced."""
    import fintech_lakehouse_spark.plans.curation as PC
    from fintech_lakehouse_spark.functions import text as FT
    from fintech_lakehouse_spark.sources import readers as RD

    orig = RD.load_table

    def no_spread(spark, sf_dir, name, spread=None):
        return orig(spark, sf_dir, name)

    for mod_name, mod in list(sys.modules.items()):
        if mod_name.startswith("fintech_lakehouse_spark.plans") and hasattr(
            mod, "load_table"
        ):
            mod.load_table = no_spread
    PC.winnow_selected = FT.winnow_selected_expr
    PC.PAIRS_PER_PARTITION = 0.0001  # target >= cached partitions -> no coalesce


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    if suffix == "before":
        _patch_pre_r16()
    names = sys.argv[2:] or (HEADLINE + HEADLINE_V2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "r16-explain",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        reset_stage_caches()
        df = QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
