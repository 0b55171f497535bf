#!/usr/bin/env python
"""Stale-green re-sweep (r13, the standing driver-window hygiene task):
pick the N queries whose latest GREEN driver row is oldest and re-run
the oracle gate over them under a PERTURBED Spark config (different
core count, a prime shuffle-partition count, AQE coalescing off) — a
plan that only passes at the default local[8]/8 shape is a latent bug
the rotation alone cannot catch.

Usage: python scripts/stale_resweep.py [sf_dir] [N=50]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fintech_lakehouse_spark.plans import QUERIES  # noqa: E402
from fintech_lakehouse_spark.plans.rotation import (  # noqa: E402
    load_driver_history,
)


def stalest_greens(n: int) -> list[str]:
    history = load_driver_history()
    greens = [
        (rnd, name)
        for name, (status, rnd) in history.items()
        if status == "green" and name in QUERIES
    ]
    greens.sort()  # oldest round first; name tiebreak
    return [name for _, name in greens[:n]]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    names = stalest_greens(n)
    if not names:
        print("no stale greens to re-sweep")
        return 0
    print(f"re-sweeping {len(names)} stalest greens under perturbed conf")
    env = dict(os.environ)
    env.update(
        {
            "CHECK_ORACLES_MASTER": "local[3]",
            "CHECK_ORACLES_SHUFFLE": "7",
            "CHECK_ORACLES_CONF": (
                "spark.sql.adaptive.coalescePartitions.enabled=false"
            ),
            "CHECK_ORACLES_JOBS": env.get("CHECK_ORACLES_JOBS", "4"),
        }
    )
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(__file__), "check_oracles.py"),
        sf_dir,
        *names,
    ]
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    raise SystemExit(main())
