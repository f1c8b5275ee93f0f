"""Gold ETL job (reference parity: ``incremental_etl_orders.py``).

Incremental pull of silver orders (checkpointed) + full snapshot of
silver customers → SQL inner equi-join with projection/aliasing
(``incremental_etl_orders.py:467-478``) → upsert into the gold table.
The checkpoint advances only AFTER the gold write commits (at-least-once
— SURVEY §2.6 ordering fix over the reference).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark import (
    Table,
    build_session,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.checkpoint import (
    CheckpointStore,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sources.loaders import (
    Loaders,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
    META_COL,
)

# Reference join, verbatim shape (incremental_etl_orders.py:467-478).
GOLD_QUERY = """
SELECT
    c.customer_id,
    c.name  AS customer_name,
    c.email,
    o.order_id,
    o.name  AS order_name,
    o.order_value
FROM customers c
JOIN orders o ON c.customer_id = o.customer_id
"""


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/tmp/engine_warehouse")
    p.add_argument("--db", default="engine_db")
    args = p.parse_args(argv)
    base, db = args.base, args.db

    spark = build_session(app_name="incremental_etl")
    store = CheckpointStore(f"{base}/checkpoints")
    # Declarative source spec — same payload shape as
    # incremental_etl_orders.py:27-46.
    payload = [
        {
            "source_type": "ENGINE",
            "table_name": "orders",
            "spark_table_name": "orders",
            "path": f"{base}/silver/database={db}/table_name=orders",
            "type": "INC",
        },
        {
            "source_type": "ENGINE",
            "table_name": "customers",
            "spark_table_name": "customers",
            "path": f"{base}/silver/database={db}/table_name=customers",
            "type": "FULL",
        },
    ]
    loaders = Loaders(payload, spark, checkpoint_store=store)
    views = loaders.load()
    if "orders" not in views or views["orders"].isEmpty():
        print("no new orders commits — nothing to do")
        spark.stop()
        return

    gold_df = spark.sql(GOLD_QUERY).drop(META_COL)
    # The reference re-executes the full plan for its show()+write pair
    # (SURVEY §3.2) — cache once instead.
    gold_df.cache()
    gold_df.show(5)

    gold = Table.create(
        spark,
        f"{base}/gold/database={db}/table_name=orders_with_customers",
        key="order_id",
        precombine="order_id",
        table_name="orders_with_customers",
        exists_ok=True,
    )
    gold.upsert(gold_df)
    loaders.commit_checkpoints()  # only after the gold write succeeded
    gold_df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
