"""Silver table build job (reference parity: ``create_hudi_tables.py``).

Generates deterministic customers + orders batches and upserts them into
two silver engine tables — customers partitioned by ``state`` with the
reference's key/precombine choices (``create_hudi_tables.py:238-278``),
orders unpartitioned. Batch sizes default to the reference's 50/100
(``create_hudi_tables.py:87-90``); pass ``--customers/--orders`` to scale.

spark-submit-able: ``spark-submit jobs/create_tables.py --base /path``.
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
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sources.generate import (
    customers_df,
    orders_df,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sources.transform import (
    sql_transform,
)


def silver_path(base: str, db: str, name: str) -> str:
    # medallion path convention (incremental_etl_orders.py:425)
    return f"{base}/silver/database={db}/table_name={name}"


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/tmp/engine_warehouse")
    p.add_argument("--db", default="engine_db")
    p.add_argument("--customers", type=int, default=50)
    p.add_argument("--orders", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--transform-sql",
        default=None,
        help="optional pre-write SQL over view `temp` (K4 transformer)",
    )
    args = p.parse_args(argv)

    spark = build_session(app_name="create_tables")
    customers = customers_df(spark, args.customers, seed=args.seed)
    orders = orders_df(spark, args.orders, args.customers, seed=args.seed)
    if args.transform_sql:
        orders = sql_transform(spark, orders, args.transform_sql)

    cust_t = Table.create(
        spark,
        silver_path(args.base, args.db, "customers"),
        key="customer_id",
        precombine="created_at",
        partition_fields=["state"],
        table_name="customers",
        exists_ok=True,
    )
    if not customers.isEmpty():  # K5 guard, without the eager count()
        cust_t.upsert(customers)

    ord_t = Table.create(
        spark,
        silver_path(args.base, args.db, "orders"),
        key="order_id",
        precombine="order_date",
        table_name="orders",
        exists_ok=True,
    )
    if not orders.isEmpty():
        ord_t.upsert(orders)

    cust_t.snapshot().show(2)
    ord_t.snapshot().show(3)
    spark.stop()


if __name__ == "__main__":
    main()
