"""Oracle-checked correctness for every catalog query (driver-gate mirror).

One parametrized test per registry entry that declares an oracle: run the
Spark query and the DuckDB SQL at sf=0.01, compare exactly. Queries with
``oracle=None`` get a rows-only smoke check.
"""

from __future__ import annotations

import pytest

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.plans.catalog import (
    REGISTRY,
    _load_all,
)

from .conftest import SF_DIR
from .oracle import compare, duckdb_connect

_load_all()
ALL = sorted(REGISTRY)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, con):
    spec = REGISTRY[name]
    df = spec.spark_fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only: runs and has a stable schema
        assert len(df.columns) > 0
    else:
        compare(df, con, spec.oracle)
