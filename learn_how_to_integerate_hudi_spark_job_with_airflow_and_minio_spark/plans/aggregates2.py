"""Collection aggregates, boolean aggregates, ALL-variant set ops, and
null-ordering — closing out the general aggregate surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from .catalog import register


@register(
    "agg_collect_list_sorted",
    oracle="""
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), ',') AS nations,
               len(list(n_name)) AS n
        FROM nation
        GROUP BY n_regionkey
    """,
    doc="collect_list + deterministic ordering (array_sort over the "
    "collected list — collection order is nondeterministic by contract, "
    "sorting makes it comparable; joined to a csv string because the "
    "gate's canonicalizer cannot hash array cells)",
)
def agg_collect_list_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_tables(spark, sf_dir, "nation")["nation"]
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_string_agg",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nation_csv
        FROM nation
        GROUP BY n_regionkey
    """,
    doc="string aggregation with explicit ordering (listagg/string_agg ≡ "
    "concat_ws over the sorted collected list)",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_tables(spark, sf_dir, "nation")["nation"]
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nation_csv")
    )


@register(
    "agg_bool",
    oracle="""
        SELECT o_orderstatus,
               bool_and(o_totalprice > 1000)   AS all_over_1k,
               bool_or(o_totalprice > 400000)  AS any_over_400k,
               CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_100k
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="boolean aggregates: every/any (bool_and/bool_or) + conditional "
    "count",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderstatus").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias(
            "n_over_100k"
        ),
    )


@register(
    "setop_all_variants",
    oracle="""
        WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
             b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        SELECT 'intersect_all' AS op, COUNT(*) AS n
        FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        UNION ALL
        SELECT 'except_all', COUNT(*)
        FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        UNION ALL
        SELECT 'union_all', COUNT(*)
        FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    """,
    doc="multiset (ALL) set operations: INTERSECT ALL / EXCEPT ALL / "
    "UNION ALL preserve duplicates",
)
def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    i = a.intersectAll(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    e = a.exceptAll(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    u = a.unionAll(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union_all").alias("op"), "n"
    )
    return i.unionByName(e).unionByName(u)


@register(
    "orderby_nulls_ordering",
    oracle="""
        SELECT o_orderkey, second_order
        FROM (
            SELECT o_orderkey,
                   nth_value(o_orderkey, 2) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ) AS second_order
            FROM orders
        )
        ORDER BY second_order ASC NULLS FIRST, o_orderkey ASC
        LIMIT 100
    """,
    doc="explicit NULLS FIRST ordering over a nullable computed column "
    "(engines default differently — the explicit spec makes it portable)",
)
def orderby_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.select(
            "o_orderkey", F.nth_value("o_orderkey", 2).over(w).alias("second_order")
        )
        .orderBy(F.asc_nulls_first("second_order"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "agg_histogram_numeric",
    # Fixed-width binning is plain integer arithmetic in both engines —
    # no histogram_numeric()-style approximation, so the comparison is
    # exact. Two partial-aggregatable groupBys, map-side combined.
    oracle="""
        SELECT event_type,
               CAST(floor(value / 25.0) AS BIGINT) AS bin,
               COUNT(*) AS n,
               round(MIN(value), 6) AS bin_min,
               round(MAX(value), 6) AS bin_max
        FROM events
        WHERE value IS NOT NULL
        GROUP BY event_type, CAST(floor(value / 25.0) AS BIGINT)
    """,
    doc="fixed-width numeric histogram per event type (width-25 bins "
    "with per-bin min/max): the analytics staple for value "
    "distributions — one partial-aggregatable groupBy on "
    "(type, floor(value/width)), no sorting, no approximation",
)
def agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    bin_col = F.floor(F.col("value") / 25.0).cast("long")
    return (
        ev.where(F.col("value").isNotNull())
        .groupBy("event_type", bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("bin_min"),
            F.round(F.max("value"), 6).alias("bin_max"),
        )
    )


@register(
    "agg_linear_regression",
    # Exactness: the five moment sums run in DECIMAL (order-independent,
    # scale 2 — exact for TPC-H's 2-decimal values, and narrow enough that
    # cross products stay inside both engines' decimal mul width),
    # exact), each surfaces to double via the string cast (bit-identical
    # across engines, common.py convention), and slope/intercept/r2 are
    # then a fixed dag of IEEE double ops on identical inputs — so the
    # regression coefficients cross the engine boundary exactly, with no
    # reliance on regr_* builtins whose internal summation order differs.
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS sxy,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_extendedprice AS DECIMAL(14,2))) AS VARCHAR) AS DOUBLE) AS syy
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
               ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
        FROM m
    """,
    doc="grouped least-squares fit (price ~ quantity per returnflag): "
    "slope/intercept/r2 from five decimal-exact moment sums — one "
    "partial-aggregatable pass over the table, coefficients derived in "
    "a fixed IEEE dag so both engines produce identical doubles "
    "(regr_slope/regr_r2 builtins are NOT cross-engine stable)",
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import as_double

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    dx = F.col("l_quantity").cast("decimal(12,2)")
    dy = F.col("l_extendedprice").cast("decimal(14,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        as_double(F.sum(dx)).alias("sx"),
        as_double(F.sum(dy)).alias("sy"),
        as_double(F.sum(dx * dy)).alias("sxy"),
        as_double(F.sum(dx * dx)).alias("sxx"),
        as_double(F.sum(dy * dy)).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_distinct
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="EXACT distinct counting via two-level bitmaps (the ClickHouse/"
    "Doris bitmap path Spark ships as bitmap_construct_agg/bitmap_count): "
    "keys bucket into 32k-bit bitmaps, per-(group, bucket) partial "
    "bitmaps OR map-side, counts sum exactly — distinct-at-scale without "
    "the count-distinct expand and without HLL error. Result equals "
    "COUNT(DISTINCT) by construction, which is the oracle",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    level1 = li.groupBy(
        "l_returnflag",
        F.bitmap_bucket_number(F.col("l_partkey")).alias("_bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_partkey"))).alias(
            "_bm"
        )
    )
    return level1.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count("_bm")).alias("exact_distinct")
    )


@register(
    "agg_grouping_id",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="grouping() / grouping_id() over CUBE: the bitmask that tells a "
    "rolled-up NULL apart from a NULL data value — without it every "
    "cube/rollup consumer misattributes subtotal rows. Same single-pass "
    "expand as agg_cube",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping_id("o_orderstatus", "o_orderpriority")
        .cast("long")
        .alias("gid"),
        F.count(F.lit(1)).alias("n"),
    )
