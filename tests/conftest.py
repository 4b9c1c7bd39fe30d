from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from haystack_traces_spark.session import get_spark  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("haystack-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # default keeps the suite fast; the full oracle comparison also passes at
    # sf0.01 and sf0.1 (verified) — opt in with e.g.
    #   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 pytest tests/test_entry_queries.py
    import os

    d = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    # the ivf_pq_residual oracle generator trains its codebook literals
    # driver-side; point it at the same data the comparison will run on
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = d
    return d
