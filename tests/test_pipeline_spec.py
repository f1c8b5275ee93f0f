"""Declarative pipeline runner (engine/pipeline.py): the reference's
whole ETL main() as one spec-driven call, run twice + no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.pipeline import (
    run_pipeline,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.session import (
    load_tables,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
    Table,
)

from .conftest import SF_SMOKE


def test_run_pipeline_incremental_twice_then_noop(spark, tmp_path):
    base = str(tmp_path)
    orders = load_tables(spark, SF_SMOKE, "orders")["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    silver = Table.create(
        spark, f"{base}/silver_orders", key="o_orderkey", precombine="o_orderkey",
        table_name="orders",
    )
    silver.upsert(orders.where(F.col("o_orderkey") % 2 == 0))

    spec = {
        "sources": [
            {"source_type": "ENGINE", "table_name": "orders",
             "spark_table_name": "orders_v", "path": silver.path, "type": "INC"},
            {"source_type": "PARQUET", "table_name": "customer",
             "spark_table_name": "customers_v",
             "path": f"{SF_SMOKE}/customer.parquet", "type": "FULL"},
        ],
        "transform_sql": """
            SELECT o.o_orderkey AS order_id, c.c_name AS customer_name,
                   o.o_totalprice AS order_value
            FROM customers_v c JOIN orders_v o ON c.c_custkey = o.o_custkey
        """,
        "sink": {"path": f"{base}/gold", "record_key": "order_id",
                 "table_name": "gold"},
        "checkpoint_root": f"{base}/ckpt",
    }

    c1 = run_pipeline(spark, spec)
    assert c1 is not None
    gold = Table.load(spark, f"{base}/gold")
    n1 = gold.snapshot().count()
    assert n1 == orders.where(F.col("o_orderkey") % 2 == 0).count()

    # second silver commit → pipeline picks up only the delta
    silver.upsert(orders.where(F.col("o_orderkey") % 2 != 0))
    c2 = run_pipeline(spark, spec)
    assert c2 is not None and c2 != c1
    assert gold.snapshot().count() == orders.count()

    # no new silver commits → no-op, gold timeline unchanged
    assert run_pipeline(spark, spec) is None
    assert gold.latest_commit() == c2
