"""Loaders extensibility + physical-plan regression guards."""

from __future__ import annotations

import contextlib
import io

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.plans.catalog import (
    REGISTRY,
    _load_all,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sources.loaders import (
    Loaders,
)

from .conftest import SF_DIR


def test_loaders_custom_source_type(spark):
    """source_type registry is extensible (reference reserves DYNAMODB,
    incremental_etl_orders.py:31)."""
    payload = [
        {"source_type": "FAKEDB", "table_name": "fake", "spark_table_name": "fake_view"},
        {"source_type": "PARQUET", "table_name": "customer",
         "spark_table_name": "cust_view", "path": f"{SF_DIR}/customer.parquet"},
    ]
    loaders = Loaders(payload, spark)
    loaders.register(
        "FAKEDB",
        lambda item: spark.createDataFrame([(1, "x")], "id long, v string"),
    )
    views = loaders.load()
    assert set(views) == {"fake_view", "cust_view"}
    assert spark.table("fake_view").count() == 1
    assert spark.table("cust_view").count() == 1500


def _plan(spark, name):
    _load_all()
    df = REGISTRY[name].spark_fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    p = _plan(spark, "q01_projection_alias")
    assert "PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,0.0)]" in p
    # column pruning: only the 4 projected columns are read
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_acctbal:double,c_mktsegment:string>" in p


def test_flagship_join_is_broadcast(spark):
    p = _plan(spark, "q02_flagship_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # the fact side must not shuffle


def test_tpch_q1_partial_aggregation(spark):
    p = _plan(spark, "agg_tpch_q1")
    # partial → exchange → final: map-side combine before the shuffle
    assert p.count("HashAggregate") >= 2
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p
