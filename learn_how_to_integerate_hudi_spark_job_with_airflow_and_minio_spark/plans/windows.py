"""Window-function operators (extension mandate — SURVEY §2.5/§7 item 6).

The reference never calls a window function (its precombine dedup is
Hudi config); the engine's upsert kernel already IS a window
(q06_latest_per_key), and this module adds the general surface: ranking,
running aggregates, lag/lead, range frames, and sessionization.

All are one shuffle on the partition keys + in-partition sort — the
canonical Spark window plan. Running float sums are decimal-cast so the
segment-tree evaluation DuckDB uses and Spark's running evaluation agree
bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import load_tables
from .catalog import register


@register(
    "win_topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    doc="top-K per group via row_number — the scalable 'greatest N per "
    "key' pattern (no per-group sort spill at 100 TB: partial top-K "
    "within partitions)",
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ) AS order_seq
        FROM orders
    """,
    doc="running (cumulative) aggregate per key, deterministic full "
    "ordering; decimal-exact so evaluation strategy doesn't matter",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("string")
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@register(
    "win_lag_lead",
    oracle="""
        SELECT user_id, event_id, ts,
               lag(value)  OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               value - lag(value) OVER w AS delta,
               CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS DOUBLE) / 1000000.0 AS secs_since_prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    doc="lag/lead navigation: per-user deltas between consecutive events",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        (
            (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)).cast("double")
            / F.lit(1000000.0)
        ).alias("secs_since_prev"),
    )


@register(
    "win_rank_percent",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               rank()        OVER w AS bal_rank,
               dense_rank()  OVER w AS bal_dense_rank,
               ntile(4)      OVER w AS bal_quartile,
               percent_rank() OVER w AS bal_pct_rank
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    doc="ranking family: rank / dense_rank / ntile / percent_rank",
)
def win_rank_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
    )


@register(
    "win_range_frame",
    oracle="""
        SELECT user_id, event_id, ts,
               COUNT(*) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts)
                   RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
               ) AS events_last_10min
        FROM events
    """,
    doc="RANGE frame over event time: events within the trailing 10 "
    "minutes per user (epoch-µs framed so both engines share the frame "
    "arithmetic)",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600_000_000, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("events_last_10min"),
    )


@register(
    "win_sessionize",
    oracle="""
        WITH gaps AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ), sess AS (
            SELECT user_id, event_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM gaps
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end
        FROM sess
        GROUP BY user_id, session_id
    """,
    doc="sessionization: 30-min-gap lag/cumsum pattern (the batch analog "
    "of streaming session windows) — one shuffle, two window passes",
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1
    ).otherwise(0)
    sess = ev.withColumn("new_session", new_session).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "win_locf_ignore_nulls",
    oracle="""
        SELECT event_id, user_id,
               last_value(CASE WHEN event_type <> 'click' THEN value END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS value_locf
        FROM events
    """,
    doc="last-observation-carried-forward gap fill (IGNORE NULLS window "
    "semantics): clicks carry no reading, so each row takes the most "
    "recent non-click value per user — the standard sensor/telemetry "
    "forward-fill, one shuffle + in-partition sort; carried values are "
    "moved, never recomputed, so both engines agree bitwise",
)
def win_locf_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    v = F.when(F.col("event_type") != "click", F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(v, ignorenulls=True).over(w).alias("value_locf"),
    )


@register(
    "win_ntile_cume_dist",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               ntile(10) OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY o_totalprice ASC, o_orderkey ASC
               ) AS decile,
               round(cume_dist() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY o_totalprice ASC, o_orderkey ASC
               ), 6) AS cdist
        FROM orders
    """,
    doc="distribution ranking: ntile deciles + cume_dist per status "
    "partition (explicit total order so both engines tile identically) "
    "— one shuffle + in-partition sort, the price-band bucketing shape",
)
def win_ntile_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "funnel_steps",
    # All step comparisons happen on epoch-microsecond BIGINTs so both
    # engines order identically regardless of their native timestamp
    # precision (Spark reads the events ns column truncated to µs).
    oracle="""
        WITH v AS (
            SELECT user_id, min(epoch_us(ts)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t2
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t3
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
            GROUP BY e.user_id
        )
        SELECT '1_view' AS step, COUNT(*) AS n_users FROM v
        UNION ALL SELECT '2_click', COUNT(*) FROM c
        UNION ALL SELECT '3_purchase', COUNT(*) FROM p
    """,
    doc="event funnel (view -> click -> purchase, strictly event-time "
    "ordered per user): users reaching each step, where step N counts "
    "only events after the user's earliest step-N-1 time. Three "
    "filtered min-aggregations chained by user-keyed equi-joins — "
    "after the first shuffle on user_id every later join is "
    "co-partitioned, and each stage partial-aggregates map-side",
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"].withColumn(
        "us", F.unix_micros("ts")
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )

    def n(df, step):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step).alias("step"), "n_users"
        )

    return n(v, "1_view").unionByName(n(c, "2_click")).unionByName(
        n(p, "3_purchase")
    )


@register(
    "skyline_pareto_2d",
    # Oracle uses the same distinct-pairs running-max formulation (a
    # window, not an n-squared NOT EXISTS) — both engines compute the
    # exact skyline, value-for-value.
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT o_totalprice AS x, o_orderdate AS y FROM orders
        ),
        flag AS (
            SELECT x, y,
                   max(y) OVER (ORDER BY x DESC, y DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS mx
            FROM pairs
        ),
        sky AS (SELECT x, y FROM flag WHERE mx IS NULL OR y > mx)
        SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
        FROM orders o
        SEMI JOIN sky s ON o.o_totalprice = s.x AND o.o_orderdate = s.y
    """,
    doc="skyline / Pareto-optimal set (Integration of Skyline Queries "
    "into Spark SQL, EDBT 2023 — PAPERS.md): orders not dominated on "
    "(totalprice, orderdate), maximize both. Exact two-phase plan: "
    "distinct pairs -> range-partitioned per-partition running-max "
    "window (local skylines, parallel) -> one tiny global pass over "
    "the survivors -> semi-join back; no UDFs, no dominance self-join",
)
def skyline_pareto_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skyline import skyline_2d

    o = load_tables(spark, sf_dir, "orders")["orders"]
    return skyline_2d(
        o.select("o_orderkey", "o_totalprice", "o_orderdate"),
        "o_totalprice",
        "o_orderdate",
    )


@register(
    "win_gaps_islands",
    # Interval end = ts + floor(value*60) seconds: floor() because the
    # two engines' double->int CASTs disagree (Spark truncates, DuckDB
    # rounds); the product and floor are IEEE-identical. (ts, event_id)
    # ordering makes the running max — and so island formation —
    # deterministic under timestamp ties.
    oracle="""
        WITH iv AS (
            SELECT user_id, event_id, ts,
                   ts + INTERVAL (CAST(floor(value * 60) AS INT)) SECOND AS end_ts
            FROM events
        ), flags AS (
            SELECT user_id, event_id, ts, end_ts,
                   CASE WHEN max(end_ts) OVER w IS NULL
                             OR ts > max(end_ts) OVER w
                        THEN 1 ELSE 0 END AS new_island
            FROM iv
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ), isl AS (
            SELECT user_id, ts, end_ts,
                   SUM(new_island) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island_id
            FROM flags
        )
        SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
               COUNT(*) AS n_events,
               min(ts) AS island_start,
               max(end_ts) AS island_end
        FROM isl
        GROUP BY user_id, island_id
    """,
    doc="gaps-and-islands: merge overlapping [ts, ts+duration] intervals "
    "per user via the running-max-end + cumulative-flag pattern — two "
    "window passes over one (user_id) shuffle, no self-join (the "
    "classic O(n log n) interval-merge, fully relational)",
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    iv = ev.withColumn(
        "end_ts",
        F.expr("ts + make_interval(0, 0, 0, 0, 0, 0, CAST(floor(value * 60) AS INT))"),
    )
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev_max = F.max("end_ts").over(w.rowsBetween(W.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("ts") > prev_max), 1).otherwise(0),
    )
    isl = flagged.withColumn(
        "island_id",
        F.sum("new_island").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return isl.groupBy("user_id", "island_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("island_start"),
        F.max("end_ts").alias("island_end"),
    )


@register(
    "win_pattern_match",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_id, ts, event_type,
                   lag(event_type, 2) OVER w AS t2,
                   lag(event_type, 1) OVER w AS t1,
                   lag(event_id, 2)   OVER w AS id2,
                   lag(event_id, 1)   OVER w AS id1
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
        SELECT user_id,
               id2 AS view_id,
               id1 AS click_id,
               event_id AS purchase_id,
               ts AS purchase_ts
        FROM seq
        WHERE t2 = 'view' AND t1 = 'click' AND event_type = 'purchase'
    """,
    doc="sequence pattern detection (MATCH_RECOGNIZE emulation — the "
    "Flink/Trino CEP surface Spark lacks natively): strictly-"
    "consecutive view->click->purchase runs per user via lag columns — "
    "one (user_id) shuffle, one sort, no joins; arbitrary fixed "
    "patterns compile to the same lag-conjunction shape",
)
def win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("event_id", 2).over(w).alias("id2"),
        F.lag("event_id", 1).over(w).alias("id1"),
    )
    return seq.where(
        (F.col("t2") == "view")
        & (F.col("t1") == "click")
        & (F.col("event_type") == "purchase")
    ).select(
        "user_id",
        F.col("id2").alias("view_id"),
        F.col("id1").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
