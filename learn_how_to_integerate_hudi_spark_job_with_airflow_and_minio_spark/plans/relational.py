"""Core relational parity queries (SURVEY §2.3, Q1-Q10).

These re-express, on the driver testdata star schema, exactly the SQL
surface the reference exercises: projection+aliasing (Q1,
``incremental_etl_orders.py:467-478``), the flagship inner equi-join (Q2,
``:474-477``), DISTINCT (Q3, ``:209-211``), ORDER BY (Q4), top-k via
LIMIT (Q5, ``:209-215`` — plus the min/max-aggregate replacement SURVEY
§2.6 recommends), identity scans (Q6), and the latest-per-key window
dedup that IS the Hudi precombine upsert semantics (Q10,
``create_hudi_tables.py:126``). The pre-write SQL transformer (K4,
``create_hudi_tables.py:214-216``) is exercised via
``sources.transform.sql_transform``.

Mapping (FIXTURES.md): reference ``customers ⋈ orders`` ≡ testdata
``customer ⋈ orders`` on ``c_custkey = o_custkey``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import load_tables
from .catalog import register


@register(
    "q01_projection_alias",
    oracle="""
        SELECT c_custkey AS customer_id,
               c_name    AS customer_name,
               c_mktsegment AS segment,
               c_acctbal AS balance
        FROM customer
        WHERE c_acctbal > 0
    """,
    doc="Q1: projection + column aliasing + filter (pushed to parquet scan)",
)
def q01_projection_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer")
    return (
        t["customer"]
        .where(F.col("c_acctbal") > 0)
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").alias("balance"),
        )
    )


@register(
    "q02_flagship_join",
    oracle="""
        SELECT c.c_custkey    AS customer_id,
               c.c_name       AS customer_name,
               c.c_mktsegment AS segment,
               o.o_orderkey   AS order_id,
               o.o_orderstatus AS order_status,
               o.o_totalprice AS order_value
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
    """,
    doc=(
        "Q2: the reference's gold query — inner equi-join customers⋈orders "
        "with projection/aliasing (incremental_etl_orders.py:467-478). "
        "Hint-free: AQE broadcasts the dim while it fits, shuffles at scale."
    ),
)
def q02_flagship_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    cust = t["customer"].select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    orders = t["orders"].select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_totalprice").alias("order_value"),
        F.col("o_custkey"),
    )
    # customer is the dim side (1:N FK join) but grows with SF, so no
    # forced broadcast hint — AQE picks BHJ while the dim fits under
    # autoBroadcastJoinThreshold and falls back to shuffle join at 100×.
    return (
        orders.join(cust, orders.o_custkey == cust.customer_id, "inner")
        .select(
            "customer_id",
            "customer_name",
            "segment",
            "order_id",
            "order_status",
            "order_value",
        )
    )


@register(
    "q03_distinct_orderby",
    oracle="""
        SELECT DISTINCT o_orderpriority AS priority
        FROM orders
        ORDER BY priority ASC
    """,
    doc="Q3+Q4: DISTINCT + ORDER BY asc (commit-time listing shape, "
    "incremental_etl_orders.py:209-211)",
)
def q03_distinct_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .select(F.col("o_orderpriority").alias("priority"))
        .distinct()
        .orderBy(F.asc("priority"))
    )


@register(
    "q04_minmax_agg",
    oracle="""
        SELECT min(o_orderdate) AS first_commit,
               max(o_orderdate) AS last_commit,
               count(*)         AS n_rows
        FROM orders
    """,
    doc="Q5 fixed for scale: min/max aggregate replaces the reference's "
    "distinct+sort+limit(50)+collect commit probe (SURVEY §2.6) — one "
    "partial-aggregated pass, no driver-side list",
)
def q04_minmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return t["orders"].agg(
        F.min("o_orderdate").alias("first_commit"),
        F.max("o_orderdate").alias("last_commit"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q05_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 50
    """,
    doc="Q5: top-k to driver (orderBy+limit → Spark TakeOrderedAndProject: "
    "per-partition heap, no global sort)",
)
def q05_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "q06_latest_per_key",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        )
        WHERE rn = 1
    """,
    doc="Q10: latest-version-per-key window dedup — the Hudi precombine "
    "upsert kernel as a pure query (max precombine wins, deterministic "
    "tie-break; create_hudi_tables.py:126)",
)
def q06_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@register(
    "q07_sql_transformer",
    oracle="""
        SELECT o_orderstatus AS status,
               count(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS total_value
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="K4: pre-write SQL transformer — batch registered as view `temp`, "
    "replaced by an arbitrary SELECT before the write "
    "(create_hudi_tables.py:214-216)",
)
def q07_sql_transformer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.transform import sql_transform

    t = load_tables(spark, sf_dir, "orders")
    return sql_transform(
        spark,
        t["orders"],
        """
        SELECT o_orderstatus AS status,
               count(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS total_value
        FROM temp
        GROUP BY o_orderstatus
        """,
    )
