"""Query plan library: every operator from SURVEY.md §2 exposed as a
named query over the driver test lake, each with a DuckDB oracle twin
where SQL can express it (driver contract in __spark_entry__.py)."""

from fintech_lakehouse_spark.plans.registry import QUERIES, ORACLES, register

# Importing the domain modules populates the registry; the static
# import order is then REORDERED by driver-check history (below), so
# module order no longer decides which queries the driver samples.
from fintech_lakehouse_spark.plans import text  # noqa: E402,F401
from fintech_lakehouse_spark.plans import vectors  # noqa: E402,F401
from fintech_lakehouse_spark.plans import sampling  # noqa: E402,F401
from fintech_lakehouse_spark.plans import relational_ext  # noqa: E402,F401
from fintech_lakehouse_spark.plans import relational_r6  # noqa: E402,F401
from fintech_lakehouse_spark.plans import curation  # noqa: E402,F401
from fintech_lakehouse_spark.plans import selection  # noqa: E402,F401
from fintech_lakehouse_spark.plans import scalars  # noqa: E402,F401
from fintech_lakehouse_spark.plans import quality  # noqa: E402,F401
from fintech_lakehouse_spark.plans import analytics  # noqa: E402,F401
from fintech_lakehouse_spark.plans import analytics_r8  # noqa: E402,F401
from fintech_lakehouse_spark.plans import multimodal  # noqa: E402,F401
from fintech_lakehouse_spark.plans import events  # noqa: E402,F401
from fintech_lakehouse_spark.plans import windows  # noqa: E402,F401
from fintech_lakehouse_spark.plans import relational  # noqa: E402,F401
from fintech_lakehouse_spark.plans import delta_dml  # noqa: E402,F401

from fintech_lakehouse_spark.plans.rotation import (  # noqa: E402
    reorder_for_driver,
)

# The driver's per-round correctness snapshot samples the FIRST 50
# registry entries, so registration order is verification-freshness
# policy (VERDICT r3 items 1+8: event_props_extract stayed red-latest
# for a round because its slot fell outside the window). Rank from the
# committed CORRECTNESS_r*.json history instead of hand-ordering:
# red-latest first, then never-checked, then rows-only queries that
# have since gained an oracle, then least-recently-checked.
# scripts/registry_order.py is the CI guard that this invariant holds.
reorder_for_driver(QUERIES, ORACLES)

__all__ = ["QUERIES", "ORACLES", "register"]
