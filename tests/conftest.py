from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from herodb_spark.session import get_spark  # noqa: E402
from tests.harness import duckdb_con  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("herodb_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def spark_prop():
    """Session for property tests (hypothesis drives many tiny jobs —
    same session, low parallelism overhead)."""
    return get_spark("herodb_spark_tests")


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb_con(sf_dir)
    yield con
    con.close()
