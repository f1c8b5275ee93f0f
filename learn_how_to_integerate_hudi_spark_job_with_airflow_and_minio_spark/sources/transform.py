"""Pre-write SQL transformer (reference parity: K4).

The reference optionally replaces a write batch with the result of an
arbitrary SQL SELECT over it, exposed as temp view ``temp``
(``create_hudi_tables.py:214-216``). Identical surface here: any SELECT
the user supplies, planned by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def sql_transform(spark: SparkSession, df: DataFrame, query: str) -> DataFrame:
    """Register ``df`` as view ``temp`` and return ``spark.sql(query)``."""
    df.createOrReplaceTempView("temp")
    return spark.sql(query)
