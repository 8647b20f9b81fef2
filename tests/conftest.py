"""Shared pytest fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import pytest

from ufo_dedup_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="ufo-dedup-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            # keep test plans small & deterministic
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1b",
        },
    )
    yield s
    s.stop()


def rows_set(df, cols=None):
    """Collect a DataFrame to a set of tuples for order-insensitive asserts."""
    if cols:
        df = df.select(*cols)
    return {tuple(r) for r in df.collect()}
