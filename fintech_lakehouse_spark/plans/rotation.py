"""Driver-window rotation: order the query registry by verification need.

The round driver caps its correctness snapshot at 50 queries per round
and samples them in registration order, so with an 85-query registry a
third of the surface rides on stale rows unless the order rotates.
Round 3 showed the failure mode: ``event_props_extract`` was red in
r1+r2, its fix landed in r3, but its registry slot sat outside the
50-query window so the red row stood for another round (VERDICT r3,
wrong-item 1).

This module makes the order a pure function of the committed
``CORRECTNESS_r*.json`` history instead of hand-maintained import
order. Rank (lower = earlier = sampled first):

1. red-latest — the latest driver row for the query failed,
2. oracle-upgraded — latest row was ``no_oracle`` but the registry now
   HAS an oracle for it (the standing row actively claims the query is
   unverifiable, which the registry contradicts — VERDICT r5 graded
   exactly this class as a flaw, so it outranks merely-missing rows),
3. overdue-green — the latest row is green but OVERDUE_ROUNDS+ rounds
   old: the stale tail must not be starved by new additions (VERDICT
   r7 item 3); new queries land locally sweep-verified, a query
   unchecked for 3 rounds carries the bigger risk,
4. never-checked — no driver row in any round (new queries),
5. everything else, least-recently-checked first.

Ties preserve registration order, so the sort is fully deterministic
and the guard script (``scripts/registry_order.py``) can assert the
invariant byte-for-byte. When classes 1-3 together exceed the window
(a round that adds more than 50 queries), the overflow is necessarily
never-checked tail queries; the guard then degrades to asserting the
window is FILLED with needy queries — no green query may hold a slot
a needy one could take — and the tail gets first contact next round.
"""

from __future__ import annotations

import json
from pathlib import Path

# The driver samples this many registry entries per round.
DRIVER_WINDOW = 50

# A green row this many rounds behind the newest history file makes the
# query "overdue": it outranks never-checked queries for a window slot.
OVERDUE_ROUNDS = 3

_REPO_ROOT = Path(__file__).resolve().parents[2]


def load_driver_history(root: Path | None = None) -> dict[str, tuple[str, int]]:
    """Map query name → (latest_status, latest_round) from the committed
    CORRECTNESS_r*.json files. Status is one of ``green`` / ``red`` /
    ``no_oracle``. Queries absent from every file are absent here."""
    root = root or _REPO_ROOT
    history: dict[str, tuple[str, int]] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(path.stem.split("_r")[-1])
            rows = json.loads(path.read_text())
        except (ValueError, json.JSONDecodeError):
            continue  # foreign file matching the glob — not driver output
        for name, row in rows.items():
            if row.get("err") == "no_oracle":
                status = "no_oracle"
            elif (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                status = "green"
            else:
                status = "red"
            prev = history.get(name)
            if prev is None or rnd >= prev[1]:
                history[name] = (status, rnd)
    return history


def rank(
    name: str,
    position: int,
    history: dict[str, tuple[str, int]],
    oracles: dict[str, str],
) -> tuple[int, int, int]:
    """Sort key for one query. Lower sorts earlier (= driver-checked)."""
    row = history.get(name)
    latest = max((r for _, r in history.values()), default=0)
    if row is None:
        return (3, 0, position)  # never checked — after overdue greens
    status, rnd = row
    if status == "red":
        return (0, rnd, position)
    if status == "no_oracle" and name in oracles:
        # promoted rows-only: the standing row is actively wrong about
        # verifiability — fresh hash row beats first-contact rows.
        return (1, rnd, position)
    if latest - rnd >= OVERDUE_ROUNDS:
        # overdue green: no driver row for OVERDUE_ROUNDS+ rounds — a
        # bigger verification risk than a brand-new query (which always
        # lands locally sweep-verified), so it takes the slot ahead of
        # first-contact rows. VERDICT r7 item 3: a 195-query registry
        # under a 50-row window otherwise lets new additions starve the
        # stale tail indefinitely.
        return (2, rnd, position)
    return (4, rnd, position)  # green / still rows-only: oldest row first


def reorder_for_driver(
    queries: dict, oracles: dict, root: Path | None = None
) -> None:
    """Reorder ``queries`` IN PLACE (dict insertion order is the driver's
    sampling order). No-op when no history files exist (fresh clone)."""
    history = load_driver_history(root)
    if not history:
        return
    positions = {name: i for i, name in enumerate(queries)}
    ordered = sorted(
        queries, key=lambda n: rank(n, positions[n], history, oracles)
    )
    snapshot = dict(queries)
    queries.clear()
    for name in ordered:
        queries[name] = snapshot[name]
