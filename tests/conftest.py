"""Shared fixtures: one session-scoped local SparkSession (reference model:
``tests/conftest.py:28-41`` — local[2], session scope)."""

from __future__ import annotations

import pytest

from ons_utils_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    session = get_session(
        app_name="ons_utils_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield session
    session.stop()
