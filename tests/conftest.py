from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dshackle_archive_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("dshackle-archive-spark-tests", master="local[4]")
    # small data in tests: keep shuffle fan-out low for speed
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s


@pytest.fixture()
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
