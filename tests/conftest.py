from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drive_health_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def get_shared_spark():
    """Session accessor for tests (e.g. hypothesis bodies) that cannot take
    the fixture as a parameter; getOrCreate returns the shared session."""
    return get_spark("dhe-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))


@pytest.fixture(scope="session")
def spark():
    yield get_shared_spark()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
