"""Declarative medallion pipeline runner.

The reference's ETL job is a fixed script: JSON source payload →
Loaders → SQL join over views → gold upsert → checkpoint
(``incremental_etl_orders.py:454-496``). This module packages that whole
shape as one reusable, declarative function, keeping the reference's
payload schema as the spec format (SURVEY §1.1 "source descriptor")::

    run_pipeline(spark, {
        "sources": [  # same shape as incremental_etl_orders.py:27-46
            {"source_type": "ENGINE", "table_name": "orders",
             "spark_table_name": "orders", "path": ..., "type": "INC"},
            {"source_type": "ENGINE", "table_name": "customers",
             "spark_table_name": "customers", "path": ..., "type": "FULL"},
        ],
        "transform_sql": "SELECT ... FROM customers c JOIN orders o ...",
        "sink": {"path": ..., "record_key": "order_id",
                 "precombine": "order_id", "partition_fields": []},
        "checkpoint_root": ...,
    })

Semantics: INC sources advance their checkpoint only after the sink
upsert commits (at-least-once, SURVEY §2.6 fix); an empty incremental
batch short-circuits to a no-op.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .checkpoint import CheckpointStore
from .sources.loaders import Loaders
from .table import META_COL, Table


def run_pipeline(spark: SparkSession, spec: dict) -> str | None:
    """Execute one pipeline run; returns the sink commit id (None if the
    incremental batch was empty → no-op)."""
    store = (
        CheckpointStore(spec["checkpoint_root"])
        if spec.get("checkpoint_root")
        else None
    )
    loaders = Loaders(spec["sources"], spark, checkpoint_store=store)
    views = loaders.load()

    inc_views = [
        s.get("spark_table_name", s["table_name"])
        for s in spec["sources"]
        if s.get("type", "FULL").upper() == "INC"
    ]
    for v in inc_views:
        if v not in views or views[v].isEmpty():
            return None  # nothing new on an incremental source

    result = spark.sql(spec["transform_sql"]).drop(META_COL)
    result.cache()
    try:
        sink = spec["sink"]
        table = Table.create(
            spark,
            sink["path"],
            key=sink["record_key"],
            precombine=sink.get("precombine", sink["record_key"]),
            partition_fields=sink.get("partition_fields"),
            table_name=sink.get("table_name"),
            exists_ok=True,
        )
        commit = table.upsert(result)
        loaders.commit_checkpoints()  # after the sink write (§2.6)
        return commit
    finally:
        result.unpersist()
