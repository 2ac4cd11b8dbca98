"""Shared fixtures: one SparkSession for the whole test run (JVM startup
is ~20 s; the suite shares it), plus tmp warehouse dirs per test."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_importer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="graft-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
