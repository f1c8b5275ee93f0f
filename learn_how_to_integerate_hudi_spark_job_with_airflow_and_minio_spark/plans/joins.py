"""Join matrix + subqueries (extension mandate — SURVEY §2.5/§7 item 6).

The reference's only join is the inner equi-join Q2; a complete engine
owes the full matrix: outer/semi/anti, multiway star joins, non-equi
range joins, as-of temporal joins, and scalar/correlated subqueries.

Scale notes per shape: dim sides are broadcast (map-side join, no fact
shuffle); the multiway TPC-H plans rely on Catalyst join reordering +
AQE; the range join is a broadcast nested-loop against a tiny literal
band table (never a cartesian on the fact side); the as-of join is a
single shuffle + window pass (operators/asof.py), not a per-key loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..session import load_tables
from .catalog import register
from .common import as_double, dsum


@register(
    "join_left_outer",
    oracle="""
        SELECT c.c_custkey,
               COUNT(o.o_orderkey) AS n_orders,
               COALESCE(CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE), 0.0) AS spend
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    """,
    doc="LEFT OUTER join + aggregate: customers with zero orders kept "
    "(count of null = 0, null sum coalesced)",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice", 2), F.lit(0.0)).alias("spend"),
        )
    )


@register(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
    """,
    doc="LEFT SEMI join (EXISTS): no right-side columns, no row "
    "multiplication — one lookup per left row",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return (
        t["customer"]
        .join(urgent, t["customer"].c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    """,
    doc="LEFT ANTI join (NOT EXISTS): customers with no orders",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_full_outer",
    oracle="""
        WITH c AS (
            SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
            FROM customer GROUP BY c_nationkey
        ), s AS (
            SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
            FROM supplier GROUP BY s_nationkey
        )
        SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
               COALESCE(c.n_customers, 0) AS n_customers,
               COALESCE(s.n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    doc="FULL OUTER join of two aggregates with COALESCE null handling",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = (
        t["customer"]
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        t["supplier"]
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "join_tpch_q3",
    oracle="""
        SELECT l.l_orderkey,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l.l_discount AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way star join + filter + grouped revenue + "
    "top-10. customer is SF-proportional so it carries NO broadcast "
    "hint — AQE picks BHJ at small SF and falls back to shuffle join "
    "at scale; orders⋈lineitem shuffles on orderkey",
)
def join_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = "1998-03-15"
    building = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    revenue = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount")
    ).cast("decimal(18,6)")
    return (
        t["orders"]
        .where(F.col("o_orderdate") < cutoff)
        .join(building, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t["lineitem"].where(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(as_double(F.sum(revenue)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "join_tpch_q5",
    oracle="""
        SELECT n.n_name,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l.l_discount AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS revenue
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way join across the whole star schema with a "
    "local-supplier condition; only fixed-cardinality region/nation are "
    "hint-broadcast — customer/supplier grow with SF so AQE chooses "
    "their join strategy (BHJ at bench scale, shuffle join at 100×)",
)
def join_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount")
    ).cast("decimal(18,6)")
    asia_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        t["orders"]
        .where(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
        )
        .join(t["customer"].select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"].select("s_suppkey", "s_nationkey"),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(as_double(F.sum(revenue)).alias("revenue"))
    )


@register(
    "join_range_bands",
    oracle="""
        SELECT b.band,
               COUNT(l.l_quantity) AS n,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS value
        FROM (VALUES ('00-10', 0.0, 10.0), ('10-20', 10.0, 20.0),
                     ('20-30', 20.0, 30.0), ('30-40', 30.0, 40.0),
                     ('40-99', 40.0, 99.0)) AS b(band, lo, hi)
        JOIN lineitem l ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
        GROUP BY b.band
    """,
    doc="non-equi range join against a literal band table: broadcast "
    "nested-loop on the tiny side — the fact scan stays map-only",
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    bands = spark.createDataFrame(
        [("00-10", 0.0, 10.0), ("10-20", 10.0, 20.0), ("20-30", 20.0, 30.0),
         ("30-40", 30.0, 40.0), ("40-99", 40.0, 99.0)],
        "band string, lo double, hi double",
    )
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("l_quantity").alias("n"),
            dsum("l_extendedprice").alias("value"),
        )
    )


@register(
    "join_asof",
    oracle="""
        SELECT p.event_id AS purchase_id,
               p.user_id,
               p.ts        AS purchase_ts,
               v.event_id  AS matched_event_id,
               v.ts        AS matched_ts,
               v.value     AS matched_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts > v.ts
    """,
    doc="as-of temporal join (operators/asof.py): each purchase matched to "
    "the user's most recent strictly-prior view; DuckDB's native ASOF "
    "JOIN is the oracle — an independent implementation of the semantics",
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), "event_id", "value"
    )
    out = asof_join(
        purchases,
        views,
        by=["user_id"],
        left_ts="purchase_ts",
        right_ts="view_ts",
        allow_exact_matches=False,
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("matched_event_id"),
        F.col("matched_view_ts").alias("matched_ts"),
        F.col("matched_value"),
    )


@register(
    "subquery_scalar",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (
            SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) / COUNT(*)
            FROM orders
        )
    """,
    doc="scalar subquery: orders above 1.5× the (decimal-exact) mean price",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "orders", views=True)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (
            SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) / COUNT(*)
            FROM orders
        )
        """
    )


@register(
    "subquery_correlated",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
        )
        AND c_acctbal < 0
    """,
    doc="correlated EXISTS subquery (decorrelated by Catalyst into a "
    "semi-join — no per-row re-execution)",
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "customer", "orders", views=True)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
        )
        AND c_acctbal < 0
        """
    )


@register(
    "subquery_in",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        AND o_orderpriority = '1-URGENT'
    """,
    doc="IN subquery → semi-join",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "customer", "orders", views=True)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        AND o_orderpriority = '1-URGENT'
        """
    )


@register(
    "setop_union_intersect_except",
    oracle="""
        WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM building UNION SELECT * FROM rich)
        UNION ALL
        SELECT 'intersect', COUNT(*) FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
        UNION ALL
        SELECT 'except', COUNT(*) FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
    """,
    doc="set operations: UNION (distinct), INTERSECT, EXCEPT",
)
def setop_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    u = building.union(rich).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union").alias("op"), "n"
    )
    i = building.intersect(rich).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    e = building.subtract(rich).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return u.unionByName(i).unionByName(e)


@register(
    "join_lateral_topk",
    # Same SQL text runs on DuckDB (LATERAL is standard there) — the
    # oracle IS the query, proving Spark's correlated-lateral planning
    # against an independent implementation.
    oracle="""
        SELECT c.c_custkey, s.o_orderkey, s.o_totalprice
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC
                      LIMIT 2) s
    """,
    doc="correlated LATERAL subquery join (Spark 3.2+ LATERAL): top-2 "
    "orders per customer expressed as a per-row dependent subquery — "
    "Catalyst decorrelates it into a ranked window join, so the "
    "executed plan is the same shuffle-once shape as "
    "win_topk_per_group, but exercised through the SQL decorrelation "
    "path",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "customer", "orders", views=True)
    return spark.sql(
        """
        SELECT c.c_custkey, s.o_orderkey, s.o_totalprice
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC
                      LIMIT 2) s
        """
    )


@register(
    "sql_recursive_cte",
    # Identical SQL text on both engines (WITH RECURSIVE landed in
    # Spark 4.0): a 3-row installment ladder per selected order — the
    # recursion generates rows with data-dependent values rather than
    # enumerating a constant series.
    oracle="""
        WITH RECURSIVE inst(o_orderkey, n, amount) AS (
            SELECT o_orderkey, 1, round(o_totalprice / 3, 2)
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT o_orderkey, n + 1, amount
            FROM inst WHERE n < 3
        )
        SELECT o_orderkey, CAST(n AS INT) AS n, amount FROM inst
    """,
    doc="WITH RECURSIVE (Spark 4.0): per-order 3-installment ladder — "
    "the recursive member re-selects from the working set until the "
    "guard fails; oracle runs the IDENTICAL SQL text on DuckDB",
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, "orders", views=True)
    return spark.sql(
        """
        WITH RECURSIVE inst(o_orderkey, n, amount) AS (
            SELECT o_orderkey, 1, round(o_totalprice / 3, 2)
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT o_orderkey, n + 1, amount
            FROM inst WHERE n < 3
        )
        SELECT o_orderkey, CAST(n AS INT) AS n, amount FROM inst
        """
    )


@register(
    "join_tpch_q8",
    # Share = ratio of two decimal-exact sums, each surfaced to double
    # via the string cast, divided once in IEEE — cross-engine identical.
    oracle="""
        WITH vol AS (
            SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
                   CAST(l.l_extendedprice AS DECIMAL(18,6))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,6))) AS volume,
                   n2.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o    ON l.l_orderkey = o.o_orderkey
            JOIN part p      ON l.l_partkey  = p.p_partkey
            JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
            JOIN customer c  ON o.o_custkey  = c.c_custkey
            JOIN nation n1   ON c.c_nationkey = n1.n_nationkey
            JOIN region r    ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2   ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
        )
        SELECT CAST(o_year AS BIGINT) AS o_year,
               CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                  THEN volume ELSE CAST(0 AS DECIMAL(18,6))
                             END) AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE)
                   AS mkt_share
        FROM vol
        GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): an 8-table star join — "
    "region/nation filters reach the small dims, AQE broadcasts every "
    "dimension into the lineitem scan so the fact table shuffles only "
    "for the final year aggregate; share computed from two decimal-"
    "exact sums",
)
def join_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import as_double, dec

    t = load_tables(
        spark, sf_dir,
        "lineitem", "orders", "part", "supplier", "customer", "nation", "region",
    )
    li, o, p, s, c = t["lineitem"], t["orders"], t["part"], t["supplier"], t["customer"]
    n1 = t["nation"].alias("n1")
    n2 = t["nation"].alias("n2")
    r = t["region"]
    vol = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(p.where(F.col("p_type") == "PROMO"), li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n1, c["c_nationkey"] == F.col("n1.n_nationkey"))
        .join(
            r.where(F.col("r_name") == "AMERICA"),
            F.col("n1.n_regionkey") == r["r_regionkey"],
        )
        .join(n2, s["s_nationkey"] == F.col("n2.n_nationkey"))
        .select(
            F.year(o["o_orderdate"]).cast("long").alias("o_year"),
            (dec("l_extendedprice") * (1 - dec("l_discount"))).alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return vol.groupBy("o_year").agg(
        (
            as_double(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(zero)
                )
            )
            / as_double(F.sum("volume"))
        ).alias("mkt_share")
    )


@register(
    "join_null_safe_eq",
    oracle="""
        WITH f AS (
            SELECT o_orderkey,
                   NULLIF(o_orderkey % 5, 3) AS grp
            FROM orders
        ),
        d AS (
            SELECT DISTINCT NULLIF(o_orderkey % 5, 3) AS grp FROM orders
        )
        SELECT COALESCE(CAST(f.grp AS VARCHAR), 'NULL') AS grp_key,
               COUNT(*) AS n
        FROM f
        JOIN d ON f.grp IS NOT DISTINCT FROM d.grp
        GROUP BY 1
    """,
    doc="null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL "
    "matches NULL instead of silently dropping those rows — the "
    "late-arriving-dimension pattern where unknown keys must still "
    "land in an 'unknown' bucket, expressed as a join condition "
    "Catalyst still hash-partitions on",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    f = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderkey") % 5, F.lit(3)).alias("grp"),
    )
    d = f.select("grp").distinct().select(F.col("grp").alias("dgrp"))
    return (
        f.join(d, F.col("grp").eqNullSafe(F.col("dgrp")))
        .groupBy(
            F.coalesce(F.col("grp").cast("string"), F.lit("NULL")).alias(
                "grp_key"
            )
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_tpch_q14",
    oracle="""
        SELECT CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(l.l_extendedprice AS DECIMAL(18,6))
                                  * (1 - CAST(l.l_discount AS DECIMAL(18,6)))
                             ELSE CAST(0 AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE)
                   * 100.0
                   / CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                                   * (1 - CAST(l.l_discount AS DECIMAL(18,6))))
                          AS VARCHAR) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-02-01 00:00:00'
    """,
    doc="TPC-H Q14 shape (promo revenue share): one month of lineitem "
    "joined to part — the shipdate range predicate pushes into the fact "
    "scan, part broadcasts, and the whole query is one conditional "
    "aggregate with a decimal-exact ratio; a single-row global result",
)
def join_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import as_double, dec

    t = load_tables(spark, sf_dir, "lineitem", "part")
    li, p = t["lineitem"], t["part"]
    month = li.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-02-01").cast("timestamp"))
    )
    vol = dec("l_extendedprice") * (1 - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,6)")
    joined = month.join(p, month["l_partkey"] == p["p_partkey"]).select(
        F.when(F.col("p_type") == "PROMO", vol).otherwise(zero).alias("promo_vol"),
        vol.alias("vol"),
    )
    return joined.agg(
        (
            as_double(F.sum("promo_vol")) * 100.0 / as_double(F.sum("vol"))
        ).alias("promo_revenue_pct")
    )


@register(
    "join_tpch_q10",
    oracle="""
        SELECT c.c_custkey,
               c.c_name,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l.l_discount AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS revenue,
               round(c.c_acctbal, 2) AS c_acctbal,
               n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, round(c.c_acctbal, 2), n.n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): which customers "
    "returned the most revenue in a quarter — 4-way star join, decimal-"
    "exact grouped revenue, top-20. nation (fixed 25 rows) broadcast; "
    "customer is SF-proportional so it is hint-free — AQE picks its "
    "join strategy; quarter + returnflag filters push into both fact scans",
)
def join_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    revenue = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount")
    ).cast("decimal(18,6)")
    return (
        t["orders"]
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-04-01")
        )
        .join(
            t["lineitem"].where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .agg(as_double(F.sum(revenue)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "join_tpch_q7",
    oracle="""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                             * CAST(1 - l.l_discount AS DECIMAL(18,6)))
                    AS VARCHAR) AS DOUBLE) AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (volume shipping between two nations): 6-way "
    "join with a cross-pair nation condition and per-year decimal "
    "revenue. Dimension legs REDUCE FIRST (r11 reorder): supplier and "
    "customer each join their hint-broadcast 2-row nation slice before "
    "touching a fact table, so the selective nation filter (2/25 of "
    "suppliers/customers) applies before the big joins — orders joins "
    "an 8%-customer leg, and the lineitem join's build side is 8% of "
    "orders, small enough for AQE to broadcast at any bounded pair "
    "selectivity (at 100 TB it degrades to a shuffle of 8% of orders, "
    "still 12x less than the old full-orders exchange; the old shape "
    "shuffled the full fact side TWICE before any nation filtering). "
    "The two-year shipdate band pushes into the fact scan; the "
    "asymmetric pair condition applies as a post-join filter over the "
    "two broadcast legs — never a cartesian",
)
def join_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    pair = ["NATION_3", "NATION_7"]
    n1 = t["nation"].where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_n1k"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_n2k"), F.col("n_name").alias("cust_nation")
    )
    # Nation-filtered dimension legs, built before any fact join:
    supp = t["supplier"].select("s_suppkey", "s_nationkey").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("_n1k")
    )
    cust = t["customer"].select("c_custkey", "c_nationkey").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("_n2k")
    )
    ordc = t["orders"].select("o_orderkey", "o_custkey").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount")
    ).cast("decimal(18,6)")
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ordc, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(as_double(F.sum(revenue)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "join_tpch_q13",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        ) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape (customer order distribution): LEFT OUTER join "
    "with an extra ON-clause predicate (zero-order customers must "
    "survive, so the filter can't move to WHERE), per-customer count, "
    "then a second aggregation over the counts — the agg-of-agg shape. "
    "Both aggregations partial-combine map-side; the second one's input "
    "is one row per customer, so the re-shuffle is tiny at any scale",
)
def join_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "join_tpch_q18",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice,
               CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6)))
                    AS VARCHAR) AS DOUBLE) AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                 o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
        LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume customers): IN-subquery over a "
    "grouped-HAVING aggregate compiled as an aggregate + semi-join on "
    "the fact key — the having set is SF-proportional so the semi-join "
    "is hint-free (AQE picks the strategy); decimal-exact quantity "
    "sums, top-20 by order value",
)
def join_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_q"))
        .where(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == big["l_orderkey"], "left_semi")
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(as_double(F.sum(qty)).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "join_tpch_q22",
    oracle="""
        WITH a AS (
            SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                        AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c.c_nationkey,
               COUNT(*) AS numcust,
               CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6)))
                    AS VARCHAR) AS DOUBLE) AS totacctbal
        FROM customer c, a
        WHERE c.c_acctbal > a.avg_bal
          AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT'
          )
        GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape (global-customer opportunity): scalar subquery "
    "(corpus-wide average balance, exact decimal-sum/count) broadcast "
    "as a 1-row cross join, NOT EXISTS compiled as a left-anti join "
    "against the filtered fact, grouped decimal totals. The testdata "
    "gives every customer at least one order, so the anti-join "
    "predicate is 'no URGENT order' to keep the shape non-degenerate",
)
def join_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    c = t["customer"]
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (
                as_double(F.sum(F.col("c_acctbal").cast("decimal(18,6)")))
                / F.count(F.lit(1))
            ).alias("_avg_bal")
        )
    )
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            as_double(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            ).alias("totacctbal"),
        )
    )


@register(
    "join_tpch_q19",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                             * CAST(1 - l.l_discount AS DECIMAL(18,6)))
                    AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
    "a join whose WHERE is an OR of three brand/size/quantity conjunct "
    "groups — the disjunction references BOTH sides so it can only "
    "apply post-join, but Catalyst derives the single-side implications "
    "(brand IN (...), quantity within the hull) and pushes those into "
    "each scan; one decimal-exact global sum. part joins hint-free",
)
def join_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount")
    ).cast("decimal(18,6)")
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        t["lineitem"]
        .join(
            t["part"].select("p_partkey", "p_brand", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .where(band)
        .agg(as_double(F.sum(rev)).alias("revenue"))
    )


@register(
    "join_tpch_q15",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                                 * CAST(1 - l_discount AS DECIMAL(18,6)))
                        AS VARCHAR) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN rev r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape (top supplier): a quarter's per-supplier "
    "revenue view, then the supplier(s) hitting the view's MAX — the "
    "scalar-subquery-over-aggregate shape. The 1-row max broadcasts "
    "(Aggregate-bounded); revenue is a decimal-exact sum so the "
    "equality comparison is bit-stable cross-engine; supplier joins "
    "hint-free",
)
def join_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev_expr = F.col("l_extendedprice").cast("decimal(18,6)") * (
        1 - F.col("l_discount")
    ).cast("decimal(18,6)")
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(as_double(F.sum(rev_expr)).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        t["supplier"]
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "join_tpch_q17",
    oracle="""
        WITH li_b AS (
            SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = 'Brand#4'
        ), th AS (
            SELECT l_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                   COUNT(*) AS cnt
            FROM li_b
            GROUP BY l_partkey
        )
        SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                    AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
        FROM li_b l
        JOIN th ON l.l_partkey = th.l_partkey
        WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * th.cnt < th.sum_qty
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): per-part "
    "correlated scalar aggregate — revenue from lineitems below 20% of "
    "their part's average quantity, for one brand. Testdata part has no "
    "p_container, so the filter is brand-only; the correlated-agg shape "
    "is unchanged. The per-part threshold aggregates BEFORE the join "
    "(map-side-combinable, output bounded by |parts of brand| ~1% of "
    "part): AQE broadcasts that small aggregate, so the final join "
    "adds NO shuffle — the brand-filtered lineitem is scanned twice "
    "(threshold build + revenue pass, the standard Q17 shape; "
    "persisting the SF-proportional intermediate would cost more at "
    "scale than the second pushed-filter scan). The below-threshold "
    "test runs in exact decimals — `5*cnt*qty < sum_qty` avoids a "
    "double-rounded 0.2*avg whose last bits differ across engines. No "
    "broadcast hints: part is SF-proportional, AQE decides.",
)
def join_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .common import dec

    t = load_tables(spark, sf_dir, "lineitem", "part")
    bparts = (
        t["part"]
        .where(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    li_b = (
        t["lineitem"]
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(bparts, F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    th = li_b.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity", 2)).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li_b.join(th, "l_partkey")
        .where(dec("l_quantity", 2) * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (as_double(F.sum(dec("l_extendedprice", 2))) / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "join_tpch_q21",
    oracle="""
        SELECT s.s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        JOIN orders o   ON o.o_orderkey = l1.l_orderkey
                       AND o.o_orderstatus = 'F'
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
                       AND n.n_name = 'NATION_1'
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting — adapted: "
    "the testdata has no commit/receipt dates, so l_returnflag='R' "
    "stands in for 'late'): the signature DOUBLE-CORRELATED self-"
    "subquery — EXISTS another supplier's line in the same order, NOT "
    "EXISTS another supplier's LATE line. A literal translation is two "
    "self-joins of the fact against itself; this plan DECORRELATES "
    "both into ONE per-order aggregate (distinct suppliers / distinct "
    "late suppliers per order — since l1's own supplier always "
    "belongs to both sets, EXISTS-other ⟺ n_supp ≥ 2 and NOT-EXISTS-"
    "other-late ⟺ n_late_supp = 1), so the fact shuffles ONCE on "
    "l_orderkey instead of three times; the oracle keeps the textbook "
    "EXISTS form as an independent formulation. Nation leg broadcast; "
    "deterministic order with s_name tie-break",
)
def join_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "orders", "nation")
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    # two distinct counts in ONE pass: collect_set instead of two
    # countDistinct (which would Expand the fact 2× before the
    # shuffle); per-order supplier sets are bounded by lines-per-order,
    # so the state is O(1) per group at any corpus size
    per_order = li.groupBy("l_orderkey").agg(
        F.size(F.collect_set("l_suppkey")).alias("_n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            )
        ).alias("_n_late_supp"),
    )
    nat = t["nation"].where(F.col("n_name") == "NATION_1").select("n_nationkey")
    supp = t["supplier"].select("s_suppkey", "s_name", "s_nationkey").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    forders = t["orders"].where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(forders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(per_order, "l_orderkey")
        .where((F.col("_n_supp") >= 2) & (F.col("_n_late_supp") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "join_tpch_q4",
    oracle="""
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R'
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking — adapted: no "
    "commit/receipt dates in the testdata, so l_returnflag='R' stands "
    "in for 'late line'): a quarter-windowed fact with a correlated "
    "EXISTS against the bigger fact, compiled as one LEFT-SEMI join — "
    "the lineitem side is pre-filtered to R-lines and deduped by the "
    "semi itself (no count inflation), the orders side carries the "
    "pushed date band; the quarter window makes the semi's probe side "
    "a fraction of the table at any scale",
)
def join_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    late = t["lineitem"].where(F.col("l_returnflag") == "R").select(
        "l_orderkey"
    )
    return (
        t["orders"]
        .where(
            (F.col("o_orderdate") >= "1996-07-01")
            & (F.col("o_orderdate") < "1996-10-01")
        )
        .join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "join_tpch_q12",
    oracle="""
        SELECT l.l_returnflag AS shipgroup,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_returnflag IN ('R', 'A')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape (shipping-mode priority split — adapted: no "
    "l_shipmode in the testdata, so l_returnflag IN ('R','A') stands "
    "in for the two audited modes): year-banded, mode-filtered fact "
    "joined to orders with BOTH conditional counts folded into one "
    "pass (SUM of CASE, never two joins); the IN filter and date band "
    "push into the lineitem scan, and the aggregate partial-combines "
    "map-side to two rows per partition before the shuffle",
)
def join_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .where(
            F.col("l_returnflag").isin("R", "A")
            & (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .select("l_orderkey", "l_returnflag")
        .join(
            t["orders"].select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_returnflag").alias("shipgroup"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipgroup")
    )
