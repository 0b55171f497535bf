#!/usr/bin/env python
"""Run the full medallion pipeline on generated fintech data (the
composed entry point the reference implies but never ships — its
scripts/ only generate CSVs; SURVEY §3.2-3.4).

Usage: python scripts/run_pipeline.py [--base-path DIR] [--txns N]
       [--customers N] [--merchants N] [--env dev|prod] [--seed N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-path", default="/tmp/fintech_lakehouse_run")
    parser.add_argument("--txns", type=int, default=100_000)
    parser.add_argument("--customers", type=int, default=10_000)
    parser.add_argument("--merchants", type=int, default=500)
    parser.add_argument("--env", choices=["dev", "prod"], default="dev")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--driver-memory",
        default=None,
        help="local-mode driver heap (e.g. 48g) — the driver JVM IS the "
        "cluster in local mode, so 100M-row runs need far more than the "
        "4g session default",
    )
    args = parser.parse_args()

    from fintech_lakehouse_spark.config import EngineConfig, prod_config
    from fintech_lakehouse_spark.datagen import (
        generate_customers,
        generate_exchange_rates,
        generate_merchants,
        generate_transactions,
    )
    from fintech_lakehouse_spark.pipeline import MedallionPipeline
    from fintech_lakehouse_spark.session import get_spark

    extra = (
        {"spark.driver.memory": args.driver_memory} if args.driver_memory else None
    )
    spark = get_spark("medallion-run", master="local[*]", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    config = (
        prod_config(args.base_path)
        if args.env == "prod"
        else EngineConfig(env="dev", base_path=args.base_path)
    )
    pipe = MedallionPipeline(spark, config)

    raw = {
        "transactions": generate_transactions(
            spark,
            args.txns,
            n_customers=args.customers,
            n_merchants=args.merchants,
            seed=args.seed,
        ),
        "customers": generate_customers(spark, args.customers, seed=args.seed),
        "merchants": generate_merchants(spark, args.merchants, seed=args.seed),
    }
    generate_exchange_rates(spark, seed=args.seed).write.mode("overwrite").parquet(
        config.layer_path("bronze", "exchange_rates")
    )
    silver = {}
    for table, df in raw.items():
        silver[table] = pipe.promote_silver(table, pipe.ingest_bronze(table, df))
    gold = pipe.build_gold(
        silver["transactions"], silver["customers"], silver["merchants"]
    )
    summary = pipe.monitor.finish()
    print(
        json.dumps(
            {
                "run_id": summary["run_id"],
                "env": config.env,
                "base_path": config.base_path,
                "stages": {
                    r["stage_name"]: {
                        "status": r["status"],
                        "rows_written": r["rows_written"],
                        "rows_quarantined": r["rows_quarantined"],
                        "seconds": round(r["duration_seconds"] or 0, 2),
                    }
                    for r in summary["rows"]
                },
                "gold_tables": {name: df.count() for name, df in gold.items()},
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
