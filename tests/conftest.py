from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webcrawlerfull_spark.session import get_spark  # noqa: E402
from webcrawlerfull_spark.synthgen import World  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="wcf-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def world():
    return World(seed=42, n_hosts=12, base_pages=60)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
