"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real definitions live in the engine's query catalog
(``learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.plans.catalog``)
so each operator's Spark implementation and DuckDB oracle are maintained
side by side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.plans import (
    catalog,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's gold
    customers⋈orders join (SURVEY §2.3 Q1+Q2)."""
    return catalog.queries()["q02_flagship_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query above."""
    return catalog.oracle_sql()
