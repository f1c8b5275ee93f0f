"""Airflow DAGs (reference parity: O1, SURVEY §2.4).

Same linear shape as the reference's three DAGs
(``Lab2/dags/dag_create_hudi_tables.py:8-42``,
``dag_incremental_etl.py:8-42``, ``Lab1/dags/spark_airflow.py:8-42``):
``start(Python) >> spark-submit job >> end(Python)``, daily schedule,
driver/executor 1 GB. The jobs are the engine's spark-submit-able
modules in ``jobs/`` — no Hudi/hadoop-aws packages needed.

Import-guarded: Airflow isn't installed in the dev/test image; this file
is deployable to an Airflow dags/ folder as-is.
"""

from __future__ import annotations

import os

try:
    import airflow
    from airflow import DAG
    from airflow.operators.python import PythonOperator
    from airflow.providers.apache.spark.operators.spark_submit import (
        SparkSubmitOperator,
    )
except ImportError:  # dev image has no airflow — DAGs are deploy-time only
    airflow = None

JOBS_DIR = os.environ.get(
    "ENGINE_JOBS_DIR", os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs")
)
SPARK_CONN = os.environ.get("ENGINE_SPARK_CONN", "spark-conn")


def _linear_dag(dag_id: str, application: str) -> "DAG":
    dag = DAG(
        dag_id=dag_id,
        default_args={"owner": "engine", "start_date": airflow.utils.dates.days_ago(1)},
        schedule_interval="@daily",
        catchup=False,
    )
    start = PythonOperator(
        task_id="start",
        python_callable=lambda: print("Jobs started"),
        dag=dag,
    )
    job = SparkSubmitOperator(
        task_id="engine_spark_job",
        conn_id=SPARK_CONN,
        application=application,
        conf={
            "spark.driver.memory": "1g",
            "spark.executor.memory": "1g",
            "spark.executor.instances": "1",
        },
        dag=dag,
    )
    end = PythonOperator(
        task_id="end",
        python_callable=lambda: print("Jobs completed successfully"),
        dag=dag,
    )
    start >> job >> end
    return dag


if airflow is not None:
    dag_create_tables = _linear_dag(
        "engine_create_tables", os.path.join(JOBS_DIR, "create_tables.py")
    )
    dag_incremental_etl = _linear_dag(
        "engine_incremental_etl", os.path.join(JOBS_DIR, "incremental_etl.py")
    )
    dag_read_gold = _linear_dag(
        "engine_read_gold", os.path.join(JOBS_DIR, "read_gold.py")
    )
