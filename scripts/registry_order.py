#!/usr/bin/env python
"""Registry-order guard (VERDICT r3 item 8).

Fails (exit 1) if any query that NEEDS a fresh driver row — red-latest,
never driver-checked, or rows-only-latest despite now having an oracle
— sits outside the first ``DRIVER_WINDOW`` registry positions, i.e.
outside the slice the round driver actually samples for
CORRECTNESS_r{N}.json. Run it after adding queries or editing
rotation-relevant code; it is also covered by tests/test_registry.py.

Usage: python scripts/registry_order.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fintech_lakehouse_spark.plans import ORACLES, QUERIES  # noqa: E402
from fintech_lakehouse_spark.plans.rotation import (  # noqa: E402
    DRIVER_WINDOW,
    OVERDUE_ROUNDS,
    load_driver_history,
)


def main() -> int:
    history = load_driver_history()
    order = list(QUERIES)
    window = set(order[:DRIVER_WINDOW])
    latest = max((r for _, r in history.values()), default=0)

    must_be_windowed: dict[str, str] = {}
    for name in order:
        row = history.get(name)
        if row is None:
            must_be_windowed[name] = "never driver-checked"
        elif row[0] == "red":
            must_be_windowed[name] = f"red-latest (r{row[1]})"
        elif row[0] == "no_oracle" and name in ORACLES:
            must_be_windowed[name] = (
                f"rows-only-latest (r{row[1]}) but oracle now registered"
            )
        elif latest - row[1] >= OVERDUE_ROUNDS:
            must_be_windowed[name] = (
                f"overdue green (r{row[1]}, {latest - row[1]} rounds stale)"
            )

    missed = {n: why for n, why in must_be_windowed.items() if n not in window}
    if len(must_be_windowed) > DRIVER_WINDOW:
        # overflow round (more needy queries than slots): degrade to
        # "window is filled with needy queries; overdue stales (and,
        # only after every overdue is already waiting, never-checked)
        # may wait" — mirrors tests/test_registry.py. Red/upgraded rows
        # must NEVER overflow, and never-checked queries outrank
        # overdue stales (r9 flip, VERDICT r8 item 4: first contact is
        # the ever-sampled close-out condition), so a never-checked
        # query may only wait if no overdue stale holds a slot it could
        # have taken (the rank ordering guarantees this; the guard
        # re-asserts it).
        wasted = [n for n in order[:DRIVER_WINDOW] if n not in must_be_windowed]
        hard_missed = {
            n: why
            for n, why in missed.items()
            if not (
                why == "never driver-checked" or why.startswith("overdue")
            )
        }
        never_missed = [
            n
            for n, why in missed.items()
            if why == "never driver-checked"
        ]
        overdue_in_window = [
            n
            for n in order[:DRIVER_WINDOW]
            if must_be_windowed.get(n, "").startswith("overdue")
        ]
        if never_missed and overdue_in_window:
            print(
                f"FAIL (overflow round): never-checked {never_missed} "
                f"wait while overdue stales {overdue_in_window} hold slots"
            )
            return 1
        if wasted or hard_missed:
            print(
                f"FAIL (overflow round): wasted slots {wasted}; "
                f"red/upgraded outside window: {hard_missed}"
            )
            return 1
        print(
            f"OK (overflow round): {len(must_be_windowed)} needy > "
            f"{DRIVER_WINDOW} slots; window fully needy, overflow is "
            f"{len(missed)} query(ies) deferred one round: "
            f"{sorted(missed)}"
        )
        return 0
    if missed:
        print(
            f"FAIL: {len(missed)} query(ies) needing a fresh driver row sit "
            f"outside the first {DRIVER_WINDOW} registry positions:"
        )
        for name, why in sorted(missed.items()):
            print(f"  - {name} (position {order.index(name)}): {why}")
        return 1

    stale = [
        (name, history[name][1])
        for name in order[:DRIVER_WINDOW]
        if name in history
    ]
    print(
        f"OK: all {len(must_be_windowed)} priority queries inside the "
        f"{DRIVER_WINDOW}-slot driver window "
        f"({sorted(must_be_windowed) or 'none pending'})"
    )
    if stale:
        oldest = min(r for _, r in stale)
        print(
            f"window occupancy: {len(window)} slots; oldest driver row in "
            f"window: r{oldest}; outside window every query is green with "
            f"a row from r{min((history[n][1] for n in order[DRIVER_WINDOW:] if n in history), default=0)}+"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
