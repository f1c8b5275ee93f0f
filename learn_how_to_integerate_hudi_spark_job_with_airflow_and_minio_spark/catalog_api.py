"""SQL-surface catalog: expose engine tables to ``spark.sql`` as views.

The reference's primary query interface is SQL over temp views
(SURVEY §1.1 temp-view catalog): every loaded table is registered by
name and all queries are strings. ``attach`` recreates that surface over
engine tables — each name binds to the table's current snapshot (or an
incremental window), after which arbitrary ``spark.sql`` runs against
them with full Catalyst planning.

Scale note: a plain snapshot view names EVERY live file in its scan —
Catalyst still pushes predicates into the parquet reads, but at 10⁵
files the listing itself dominates a selective query. Pass ``where``
to bind a view through :meth:`Table.read_where`, which consults the
manifest's file stats FIRST and only plans the surviving files (the
read-side analog of the upsert key-prune envelope). The predicate is
also applied exactly, so the view's contents equal the plain snapshot
filtered by it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .table import Table


def attach(
    spark: SparkSession,
    tables: dict[str, str],
    query_type: str = "snapshot",
    where: dict[str, str] | None = None,
    **read_kw,
) -> dict[str, Table]:
    """Register each ``{view_name: table_path}`` as a temp view.

    ``where`` maps view names to Spark-SQL predicate strings: those
    views bind manifest-pruned reads (:meth:`Table.read_where`) instead
    of the full snapshot — same rows as filtering the snapshot, but a
    selective key/partition predicate scans only the files whose stats
    admit it.

    Returns the opened Table handles (for writes/services on the same
    objects)."""
    out: dict[str, Table] = {}
    for name, path in tables.items():
        t = Table.load(spark, path)
        pred = (where or {}).get(name)
        if pred is not None:
            df = t.read_where(pred)
        else:
            df = t.read(query_type, **read_kw)
        df.createOrReplaceTempView(name)
        out[name] = t
    return out


def sql_over(
    spark: SparkSession,
    tables: dict[str, str],
    query: str,
    where: dict[str, str] | None = None,
) -> DataFrame:
    """One-shot: attach snapshots (manifest-pruned where ``where`` names
    a view) and run a SQL string over them."""
    attach(spark, tables, where=where)
    return spark.sql(query)
