"""Array/collection functions, explode, first/last windows, arg-max
aggregates, unpivot — remaining general-surface operators (extension
mandate, SURVEY §2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import load_tables
from .catalog import register
from .common import dsum


@register(
    "scalar_array_funcs",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' '))                          AS n_tokens,
               list_contains(string_split(text, ' '), 'spark')      AS has_spark,
               array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '|') AS first_tokens,
               array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], '|') AS token_key,
               list_sort(list_distinct(string_split(text, ' ')))[len(list_distinct(string_split(text, ' ')))] AS last_token
        FROM documents
    """,
    doc="array family: split, size, contains, distinct+sort, slice, "
    "join, element access",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.col("text"), " ")
    sorted_distinct = F.array_sort(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(sorted_distinct, 1, 5), "|").alias("first_tokens"),
        F.array_join(F.slice(sorted_distinct, 1, 3), "|").alias("token_key"),
        F.element_at(sorted_distinct, -1).alias("last_token"),
    )


@register(
    "explode_token_counts",
    oracle="""
        SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
    """,
    doc="explode (lateral unnest) + aggregate: corpus token frequencies",
)
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "win_first_last",
    oracle="""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_order,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    doc="navigation windows: first_value / last_value (full frame) / "
    "nth_value",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
    )


@register(
    "agg_arg_minmax",
    oracle="""
        SELECT o_orderstatus,
               arg_max(o_totalprice, o_orderkey) AS latest_key_price,
               arg_min(o_totalprice, o_orderkey) AS earliest_key_price,
               max(o_orderkey) AS max_key,
               min(o_orderkey) AS min_key
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="arg-max/arg-min aggregates (max_by/min_by): value at the extreme "
    "of another (unique) column",
)
def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_totalprice", "o_orderkey").alias("latest_key_price"),
        F.min_by("o_totalprice", "o_orderkey").alias("earliest_key_price"),
        F.max("o_orderkey").alias("max_key"),
        F.min("o_orderkey").alias("min_key"),
    )


@register(
    "unpivot_metrics",
    oracle="""
        WITH wide AS (
            SELECT l_returnflag,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS qty,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS price
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'qty' AS metric, qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'price' AS metric, price AS value FROM wide
    """,
    doc="unpivot (wide→long via stack): the inverse of pivot",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("qty"), dsum("l_extendedprice").alias("price")
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(2, 'qty', qty, 'price', price) AS (metric, value)",
    )
