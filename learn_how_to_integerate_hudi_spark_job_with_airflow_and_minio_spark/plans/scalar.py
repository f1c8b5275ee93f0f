"""Scalar-function surface (extension mandate — SURVEY §2.5/§7 item 6).

The reference imports ``pyspark.sql.functions`` but never calls a scalar
function in SQL (``create_hudi_tables.py:6-7`` is unused surface). The
engine exposes the standard string / date / math / JSON / conditional
families — all JVM-side Catalyst expressions inside whole-stage codegen,
no UDFs.

Cross-engine determinism notes: sqrt is IEEE-exact; transcendental
functions (ln/exp) are libm-dependent and excluded from oracled queries;
day-of-week numbering differs between engines, so date parts stick to
the unambiguous fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from .catalog import register


@register(
    "scalar_string_funcs",
    oracle="""
        SELECT p_partkey,
               upper(p_brand)                            AS brand_upper,
               lower(p_type)                             AS type_lower,
               length(p_name)                            AS name_len,
               substr(p_name, 1, 10)                     AS name_prefix,
               concat(p_brand, ':', p_type)              AS brand_type,
               replace(p_brand, 'Brand#', 'B')           AS brand_short,
               regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
               trim('  ' || p_type || ' ')               AS type_trim,
               reverse(p_brand)                          AS brand_rev,
               lpad(CAST(p_size AS VARCHAR), 4, '0')     AS size_padded,
               starts_with(p_type, 'STANDARD')           AS is_standard
        FROM part
    """,
    doc="string family: case, length, substr, concat, replace, regexp "
    "group extract, trim, reverse, pad, predicates",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trim"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.startswith(F.col("p_type"), F.lit("STANDARD")).alias("is_standard"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT)    AS order_year,
               CAST(month(o_orderdate) AS INT)   AS order_month,
               CAST(day(o_orderdate) AS INT)     AS order_day,
               CAST(quarter(o_orderdate) AS INT) AS order_quarter,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE)        AS due_date,
               datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
               CAST(date_trunc('month', o_orderdate) AS DATE)     AS order_month_start,
               last_day(CAST(o_orderdate AS DATE))                AS month_end,
               strftime(o_orderdate, '%Y-%m')                     AS ym
        FROM orders
    """,
    doc="date/time family: extract parts, interval add, datediff, trunc, "
    "last_day, format",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        F.date_trunc("month", d).cast("date").alias("order_month_start"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05)                    AS disc_dev,
               round(l_extendedprice, 1)                 AS price_round,
               CAST(floor(l_quantity) AS BIGINT)         AS qty_floor,
               CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
               sqrt(l_quantity)                          AS qty_sqrt,
               l_extendedprice * l_extendedprice         AS price_sq,
               CAST(l_partkey % 16 AS BIGINT)            AS part_bucket,
               greatest(l_tax, l_discount)               AS max_rate,
               least(l_tax, l_discount)                  AS min_rate,
               CAST(sign(l_discount - l_tax) AS DOUBLE)  AS rate_sign
        FROM lineitem
    """,
    doc="math family: abs/round/floor/ceil/sqrt/power/mod/greatest/least/"
    "sign — IEEE-deterministic subset (no libm transcendentals)",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.col("l_extendedprice"), 1).alias("price_round"),
        F.floor(F.col("l_quantity")).alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.sqrt(F.col("l_quantity")).alias("qty_sqrt"),
        (F.col("l_extendedprice") * F.col("l_extendedprice")).alias("price_sq"),
        (F.col("l_partkey") % 16).alias("part_bucket"),
        F.greatest(F.col("l_tax"), F.col("l_discount")).alias("max_rate"),
        F.least(F.col("l_tax"), F.col("l_discount")).alias("min_rate"),
        F.signum(F.col("l_discount") - F.col("l_tax")).alias("rate_sign"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k')               AS k_str,
               CAST(json_extract_string(props, '$.k') AS INT)  AS k_int,
               json_extract_string(props, '$.missing')         AS missing_key
        FROM events
    """,
    doc="JSON access on a string column (events.props): path extract + "
    "cast; missing path → null",
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


@register(
    "scalar_case_coalesce",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 1000 THEN 'low'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END                       AS bal_band,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
               c_acctbal IS NULL                          AS bal_is_null,
               IF(c_acctbal > 0, c_acctbal, 0.0)          AS bal_positive
        FROM customer
    """,
    doc="conditional family: CASE WHEN bands, NULLIF+COALESCE, IS NULL, IF",
)
def scalar_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt")
        .when(bal < 1000, "low")
        .when(bal < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
        .alias("segment_masked"),
        bal.isNull().alias("bal_is_null"),
        F.when(bal > 0, bal).otherwise(F.lit(0.0)).alias("bal_positive"),
    )


@register(
    "scalar_cast_chain",
    oracle="""
        SELECT c_custkey,
               CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS name_num,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)  AS bal_str,
               CAST(CAST(trunc(c_acctbal) AS INT) AS DOUBLE)      AS bal_truncated
        FROM customer
    """,
    doc="cast chains incl. string→numeric (the reference's "
    "order_value-as-string quirk: queries must cast, SURVEY §1.2)",
)
def scalar_cast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint").alias(
            "name_num"
        ),
        F.col("c_acctbal").cast("decimal(18,2)").cast("string").alias("bal_str"),
        F.col("c_acctbal").cast("int").cast("double").alias("bal_truncated"),
    )
