"""Aggregation operators (extension mandate — SURVEY §2.5/§7 item 6).

The reference runs no GROUP BY at all (nearest: DISTINCT + the eager
count() guard); a complete engine owes the full aggregation surface:
grouped aggregates, HAVING, multi-dimensional (cube/rollup/grouping
sets), pivot, exact + approximate distinct counts, and moment-based
statistics. All built-in Catalyst operators — partial aggregation
(map-side combine) comes free, which is the 100 TB design point: the
shuffle carries one row per (group × partition), not per input row.

Float determinism: every sum runs in DECIMAL and is surfaced as DOUBLE
(see plans/common.py); variance/stddev are computed from decimal moment
sums with an explicit double formula so Spark and DuckDB agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from .catalog import register
from .common import as_double, davg, dsum


@register(
    "agg_tpch_q1",
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6)) * CAST(1 + l_tax AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
               CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
               CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
               CAST(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS DOUBLE) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: the canonical OLAP grouped-aggregate — 8 measures, "
    "2 group keys; Catalyst plans partial_hashagg → shuffle → final",
)
def agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount")
    ).cast("decimal(18,6)")
    charge = disc_price * (1 + F.col("l_tax")).cast("decimal(18,6)")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            as_double(F.sum(disc_price)).alias("sum_disc_price"),
            as_double(F.sum(charge)).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_having",
    oracle="""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 20
    """,
    doc="GROUP BY + HAVING (post-aggregation filter)",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("spend"),
        )
        .where(F.col("n_orders") >= 20)
    )


@register(
    "agg_count_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="exact multi-column COUNT DISTINCT (expand + two-phase agg in Spark)",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_approx_distinct",
    # Checkable contract for engine-specific sketches: the HLL estimate
    # itself can't cross the engine boundary (sketches differ by
    # design), but |approx − exact| ≤ rsd-bound CAN — Spark emits the
    # exact count plus tolerance booleans, DuckDB recomputes the exact
    # count and asserts the booleans are literally TRUE. A broken HLL
    # (or approx-percentile) path now fails the gate instead of
    # recording a ⊘ rows-only row.
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               TRUE AS hll_within_5pct,
               TRUE AS pct_within_5pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++) + approx_percentile: the "
    "100 TB-scale distinct/quantile path — sketch estimates checked "
    "against in-plan exact values at 5% tolerance; exact count crosses "
    "the engine boundary, sketch values stay engine-side.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    pct = F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99))")
    exact_pct = F.expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("_approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        pct.alias("_apct"),
        exact_pct.alias("_epct"),
    )
    within = F.lit(True)
    for i in range(1, 4):
        a, e = F.element_at("_apct", i), F.element_at("_epct", i)
        within = within & (F.abs(a - e) <= 0.05 * F.abs(e))
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("_approx_parts") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("hll_within_5pct"),
        within.alias("pct_within_5pct"),
    )


@register(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE: all 2^k grouping combinations in one pass",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP: hierarchical subtotals",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice").alias("revenue")
    )


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    doc="GROUPING SETS: explicit grouping combinations",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "orders", views=True)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_pivot",
    oracle="""
        SELECT l_returnflag,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) FILTER (WHERE l_linestatus = 'O') AS VARCHAR) AS DOUBLE) AS "O",
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) FILTER (WHERE l_linestatus = 'F') AS VARCHAR) AS DOUBLE) AS "F"
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="PIVOT: wide-format aggregation (explicit value list → single pass, "
    "no second job to discover pivot values)",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )


@register(
    "agg_variance_stddev",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(
                 (CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*))
                 / (COUNT(*) - 1) AS DOUBLE) AS var_price,
               SQRT(CAST(
                 (CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*))
                 / (COUNT(*) - 1) AS DOUBLE)) AS stddev_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="moment-based variance/stddev from exact decimal moment sums — "
    "order-independent and bit-identical across engines (native stddev "
    "aggregates use different summation orders)",
)
def agg_variance_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    p = F.col("o_totalprice").cast("decimal(18,2)")
    s1 = as_double(F.sum(p))
    s2 = as_double(F.sum(p * p))
    n = F.count(F.lit(1))
    var = ((s2 - s1 * s1 / n) / (n - 1)).cast("double")
    return o.groupBy("o_orderpriority").agg(
        n.alias("n"), var.alias("var_price"), F.sqrt(var).alias("stddev_price")
    )


@register(
    "agg_filter_clause",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                        FILTER (WHERE l_discount > 0.05) AS VARCHAR)
                   AS disc_qty_str
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="FILTER-clause aggregates (conditional aggregation without "
    "CASE-wrapping): the map-side-combinable form of per-predicate "
    "counts; decimal sum routed through string for cross-engine float "
    "exactness",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    li.createOrReplaceTempView("lineitem_fc")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
               COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                        FILTER (WHERE l_discount > 0.05) AS STRING)
                   AS disc_qty_str
        FROM lineitem_fc
        GROUP BY l_returnflag
        """
    )


@register(
    "agg_tpch_q6",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                             * CAST(l_discount AS DECIMAL(18,6)))
                    AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecast revenue change): the canonical "
    "pushdown/partial-agg showcase — a single lineitem scan with every "
    "predicate pushed to parquet (shipdate year, discount band, "
    "quantity cap), one decimal-exact ungrouped sum; the shuffle "
    "carries one partial row per partition",
)
def agg_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * F.col(
        "l_discount"
    ).cast("decimal(18,6)")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(as_double(F.sum(rev)).alias("revenue"))
    )
