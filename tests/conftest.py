"""Shared pytest fixtures: one session-scoped local SparkSession
(pattern from the reference's tests/conftest.py:17-53 — small
shuffle-partition count so tiny-data tests don't pay 200-partition
overhead)."""

from __future__ import annotations

import pytest

from fintech_lakehouse_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "fintech-lakehouse-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
