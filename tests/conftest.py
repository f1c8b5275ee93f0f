"""Shared test fixtures: one local SparkSession per test run."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark import (  # noqa: E402
    build_session,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "s3: runs against an emulated S3 endpoint (moto server)"
    )


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="engine-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
