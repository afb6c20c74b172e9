"""Shared fixtures: one SparkSession + one DuckDB connection per test run."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_computing_final_project_spark.catalog import TABLES
from big_data_computing_final_project_spark.session import get_spark

# Small SF keeps the suite fast; oracle checks at sf0.01 run via
# tools/check_oracle.py and the driver's own gate.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# Fast tier (VERDICT r11 item 2): the default run excludes the measured
# slow tail so the driver's bounded `pytest tests/ -x -q` completes with
# a real pass/fail summary (the r11 driver run was killed at ~96%).
# tests/slow_tests.txt holds the nodeids of the slowest ~120 tests from a
# full --durations run (67% of total suite wall at 11% of test count);
# they carry @pytest.mark.slow via the hook below and run with
# `-m "slow or not slow"` (full suite — the close-battery gate) or
# `-m slow`. The r12 PQ-kernel equivalence pin is deliberately NOT
# listed: it stays in the fast tier.
_SLOW_LIST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    try:
        with open(_SLOW_LIST) as f:
            slow = {ln.strip() for ln in f if ln.strip() and not ln.startswith("#")}
    except OSError:
        return
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if nodeid in slow or f"tests/{nodeid}" in slow:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
