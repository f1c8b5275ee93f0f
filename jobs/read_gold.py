"""Gold smoke-read job (reference parity: ``Lab2/test.py``).

Snapshot-read the gold table, register it as a temp view, SELECT * and
show — the reference's manual verification flow (``test.py:32-34``).
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


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/tmp/engine_warehouse")
    p.add_argument("--db", default="engine_db")
    args = p.parse_args(argv)

    spark = build_session(app_name="read_gold")
    gold = Table.load(
        spark, f"{args.base}/gold/database={args.db}/table_name=orders_with_customers"
    )
    gold.snapshot().createOrReplaceTempView("gold_orders")
    spark.sql("SELECT * FROM gold_orders").show()
    spark.stop()


if __name__ == "__main__":
    main()
