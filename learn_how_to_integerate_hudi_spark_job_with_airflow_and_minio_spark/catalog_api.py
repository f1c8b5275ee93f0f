"""SQL-surface catalog: expose engine tables to ``spark.sql`` as views.

The reference's primary query interface is SQL over temp views
(SURVEY §1.1 temp-view catalog): every loaded table is registered by
name and all queries are strings. ``attach`` recreates that surface over
engine tables — each name binds to the table's current snapshot (or an
incremental window), after which arbitrary ``spark.sql`` runs against
them with full Catalyst planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .table import Table


def attach(
    spark: SparkSession,
    tables: dict[str, str],
    query_type: str = "snapshot",
    **read_kw,
) -> dict[str, Table]:
    """Register each ``{view_name: table_path}`` as a temp view.

    Returns the opened Table handles (for writes/services on the same
    objects)."""
    out: dict[str, Table] = {}
    for name, path in tables.items():
        t = Table.load(spark, path)
        t.read(query_type, **read_kw).createOrReplaceTempView(name)
        out[name] = t
    return out


def sql_over(
    spark: SparkSession, tables: dict[str, str], query: str
) -> DataFrame:
    """One-shot: attach snapshots and run a SQL string over them."""
    attach(spark, tables)
    return spark.sql(query)
