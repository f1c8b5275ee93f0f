"""Gated query for incremental materialized-view maintenance.

Builds a base orders table, computes a grouped-aggregate MV at the first
commit, then drives inserts + updates + deletes through the base table
and refreshes the MV **only from the CDC delta feed**
(`operators/mv.py`). The returned MV snapshot must equal a from-scratch
group-by over the simulated final state — which is exactly what the
DuckDB oracle computes, so the gate proves the maintenance algebra, not
just the read path.

Exactness: the MV measure is DECIMAL(18,2); decimal addition is exact
and order-independent, so initial-build + delta application is
bit-identical to the oracle's direct aggregation (see common.py for the
decimal→string→double surfacing trick).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mv import incremental_mv_refresh
from ..session import load_tables
from ..table import Table
from .catalog import register
from .common import as_double, sql_as_double

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]

# Final base-table state the oracle reproduces:
#   c1: full orders          c2: keys %5=0 price*2  +  keys %11=3 cloned
#   c3: delete keys %7=0 (applies to clones too: +10000000 ≡ +3 mod 7)
_MV_SQL = f"""
    WITH final AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS price
        FROM orders
        WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 100.0 AS price
        FROM orders
        WHERE o_orderkey % 11 = 3 AND (o_orderkey + 10000000) % 7 <> 0
    )
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {sql_as_double("SUM(CAST(price AS DECIMAL(18,2)))")} AS spend
    FROM final
    GROUP BY o_custkey
"""


@register(
    "mv_incremental_refresh",
    oracle=_MV_SQL,
    doc="incremental materialized-view maintenance (Gupta & Mumick "
    "algebra): per-custkey COUNT+SUM MV built at commit 1, then inserts/"
    "updates/deletes applied to the base table and folded into the MV "
    "from the changes_full CDC feed alone — O(|delta|) refresh, decimal-"
    "exact, equals a full recompute (the oracle) bit-for-bit",
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"].select(*_COLS)
    base = Table.create(
        spark,
        tempfile.mkdtemp(prefix="engine_mv_base_"),
        key="o_orderkey",
        precombine="o_orderdate",
        table_name="orders",
    )
    c1 = base.upsert(orders)

    # MV at c1: custkey -> (n_orders, spend DECIMAL(18,2)).
    mv = Table.create(
        spark,
        tempfile.mkdtemp(prefix="engine_mv_"),
        key="o_custkey",
        precombine="_refresh_seq",
        table_name="orders_by_cust_mv",
    )
    initial = (
        base.snapshot(as_of=c1)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("spend"),
        )
        .withColumn("_refresh_seq", F.lit(c1))
    )
    mv.bulk_insert(initial)

    # c2: updates (%5 price*2, status U) + inserts (%11=3 cloned at +10M).
    updates = (
        orders.where(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderstatus", F.lit("U"))
    )
    inserts = (
        orders.where(F.col("o_orderkey") % 11 == 3)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10000000)
        .withColumn("o_totalprice", F.lit(100.0))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    base.upsert(updates.unionByName(inserts).select(*_COLS))
    # c3: delete every key ≡ 0 (mod 7), clones included.
    base.delete(
        base.snapshot()
        .where(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey")
    )

    # Fold the whole c1→now delta into the MV. The feed needs a decimal
    # view of the measure so maintenance stays exact.
    changes = base.changes_full(begin=c1).select(
        "o_custkey",
        "o_custkey_before",
        F.col("o_totalprice").cast("decimal(18,2)").alias("spend"),
        F.col("o_totalprice_before").cast("decimal(18,2)").alias("spend_before"),
        "_change_type",
    )
    incremental_mv_refresh(
        mv,
        changes,
        group_col="o_custkey",
        measure_cols=["spend"],
        refresh_seq=base.latest_commit(),
        count_col="n_orders",
    )
    return mv.snapshot().select(
        "o_custkey",
        F.col("n_orders").cast("long").alias("n_orders"),
        as_double(F.col("spend")).alias("spend"),
    )
