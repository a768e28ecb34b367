"""Shared Spark fixture: one local session for the whole test run."""

from __future__ import annotations

import pytest

from jsonschema_jl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="jss_tests",
        cores=4,
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s
    s.stop()
