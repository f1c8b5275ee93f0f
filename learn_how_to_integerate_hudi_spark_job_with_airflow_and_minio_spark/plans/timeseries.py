"""Time-series resampling over the events stream.

Regularizing an irregular event stream onto a fixed-interval grid
(resample + gap-fill) is the standard telemetry/feature-store prep step;
Spark has no built-in resample, so the engine composes it from
aggregation, `sequence`+`explode` grid generation, a left join, and an
IGNORE-NULLS forward-fill window — all Catalyst, no UDFs.

Scale design: the exploded grid is bounded by span/granularity per key
(720 buckets/user for a 30-day hourly grid), never by event count; the
grid-to-aggregate join shuffles on (key, bucket); the LOCF window is one
in-partition sort per key. At 100 TB the hourly aggregate is the big
side and partial-aggregates map-side; the grid is generated, not stored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import load_tables
from .catalog import register
from .common import dsum, sql_dsum


@register(
    "ts_resample_gapfill",
    # Determinism: bucket sums are decimal-exact (common.py convention);
    # the LOCF fill MOVES an already-agreed value, never recomputes it,
    # so both engines agree bitwise. Grid endpoints come from per-user
    # min/max truncated to the hour — exact timestamp arithmetic.
    oracle=f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket,
                   COUNT(*) AS n_events,
                   {sql_dsum("value")} AS hour_value
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT user_id,
                   date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events GROUP BY 1
        ),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
            FROM span
        )
        SELECT g.user_id, g.bucket,
               COALESCE(h.n_events, 0) AS n_events,
               h.hour_value IS NULL AS is_gap,
               last_value(h.hour_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM grid g
        LEFT JOIN hourly h ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
    doc="fixed-interval resample of an irregular event stream: per-user "
    "hourly grid (sequence+explode over the user's span), decimal-exact "
    "bucket sums, LOCF fill for empty buckets — the telemetry/feature "
    "regularization op Spark lacks natively",
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    bucket = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(F.col("user_id"), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("hour_value"),
    )
    span = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket"),
    )
    joined = grid.join(hourly, ["user_id", "bucket"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("bucket"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.col("hour_value").isNull().alias("is_gap"),
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "agg_retention_cohorts",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
            FROM events GROUP BY user_id
        )
        SELECT f.cohort_date,
               date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS day_offset,
               COUNT(DISTINCT e.user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events e
        JOIN first_seen f ON e.user_id = f.user_id
        GROUP BY f.cohort_date, day_offset
    """,
    doc="cohort retention matrix: users bucketed by first-seen date, "
    "activity counted per (cohort, day-offset) cell — the product-"
    "analytics staple. Scale shape: the first-seen aggregate and the "
    "events join both hash-partition on user_id (one shuffle reused), "
    "then the cell aggregate partial-aggregates map-side to a "
    "|cohorts|x|offsets| result",
)
def agg_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    first = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_date")
    )
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_date",
            F.datediff(F.to_date("ts"), F.col("cohort_date"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# alpha = 0.5 makes every weight (1-alpha)^k = 2^-k exactly dyadic, and
# both engines LEFT-FOLD the weighted sums in prefix order (F.aggregate
# ≡ DuckDB list_sum over an ordered comprehension), so the EWMA doubles
# are bit-identical with no pow() parity risk. Shared by ts_ewma and
# ts_ewma_grouped — same semantics, two execution strategies.
_EWMA_ORACLE = """
        WITH seq AS (
            SELECT user_id, event_id, ts, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS prefix
            FROM events
        )
        SELECT user_id, event_id, ts,
               round(
                   list_sum([prefix[i] * 0.5 ^ (len(prefix) - i)
                             for i in range(1, len(prefix) + 1)])
                   / list_sum([0.5 ^ (len(prefix) - i)
                               for i in range(1, len(prefix) + 1)]),
                   6
               ) AS ewma
        FROM seq
"""


@register(
    "ts_ewma_grouped",
    # same dyadic-alpha oracle as ts_ewma: the grouped recurrence
    # num_t = num_{t-1}*0.5 + x_t is Horner's form of the oracle's
    # oldest-first weighted fold, and halving is EXACT in binary floating
    # point, so the two evaluation orders round identically at every
    # addition — bit-equal doubles, no pow() parity risk.
    oracle=_EWMA_ORACLE,
    doc="scale-safe EWMA (r5 verdict item 4): partition-sorted "
    "mapInPandas recurrence — O(n) time and O(1) state per key instead "
    "of ts_ewma's O(n²) per-key prefix arrays. mapInPandas over a "
    "hash-repartitioned, key-sorted partition rather than "
    "applyInPandas: grouped-map dispatches one Python call PER KEY "
    "(r6 measured 3.6 s at sf0.1, ~1500 tiny groups), while this shape "
    "streams whole Arrow batches through one carry-across-batches scan "
    "(1500 groups → ~32 partition scans). THE unbounded-series path; "
    "ts_ewma's array formulation stays as the bounded-series "
    "whole-stage-codegen variant",
)
def ts_ewma_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"].select(
        "user_id", "event_id", "ts", "value"
    )
    # one shuffle + in-partition sort — the same cost a groupBy pays,
    # but every key's series arrives contiguous and ordered, so the scan
    # below is a single sequential pass with per-key state resets
    sorted_ev = ev.repartition(F.col("user_id")).sortWithinPartitions(
        "user_id", "ts", "event_id"
    )

    def _ewma(batches):
        import numpy as np

        # carry (num, den, key) across Arrow batch boundaries: a key's
        # series may span batches, but batches arrive in partition order.
        #
        # Vectorized LOCKSTEP over keys (r6 verdict item 7): instead of a
        # per-row Python loop, split the batch into per-key segments and
        # advance ALL segments one time-step per iteration with
        # elementwise numpy ops — interpreter iterations drop from
        # O(rows) to O(longest series in batch). Bit parity with the
        # scalar recurrence (and the oracle) is exact: each key still
        # sees num = num*0.5 + x, den = den*0.5 + 1, num/den in the same
        # order on the same doubles; vectorizing across keys reorders
        # nothing WITHIN a key.
        cur_key, num, den = None, 0.0, 0.0
        for pdf in batches:
            users = pdf["user_id"].to_numpy()
            vals = pdf["value"].to_numpy(dtype="float64")
            n = len(vals)
            if n == 0:
                continue
            starts = np.concatenate(
                ([0], np.flatnonzero(users[1:] != users[:-1]) + 1)
            )
            lens = np.diff(np.append(starts, n))
            num_v = np.zeros(len(starts))
            den_v = np.zeros(len(starts))
            if users[0] == cur_key:
                num_v[0], den_v[0] = num, den
            out = np.empty(n)
            for j in range(int(lens.max())):
                mask = lens > j
                idx = starts[mask] + j
                num_v[mask] = num_v[mask] * 0.5 + vals[idx]
                den_v[mask] = den_v[mask] * 0.5 + 1.0
                out[idx] = num_v[mask] / den_v[mask]
            cur_key, num, den = users[-1], num_v[-1], den_v[-1]
            yield pdf.assign(ewma=out)[["user_id", "event_id", "ts", "ewma"]]

    raw = sorted_ev.mapInPandas(
        _ewma, schema="user_id bigint, event_id bigint, ts timestamp, ewma double"
    )
    # round JVM-side with F.round (half-up), the same rounding ts_ewma
    # and the DuckDB oracle use — np.round is half-EVEN and could flip a
    # tie at the 6th digit
    return raw.withColumn("ewma", F.round("ewma", 6))


@register(
    "ts_ewma",
    oracle=_EWMA_ORACLE,
    doc="exponentially weighted moving average per user (adjust-mode "
    "EWMA, alpha=0.5): Spark has no recursive window, so the prefix "
    "array is collected per row and folded with exact dyadic weights — "
    "right for BOUNDED per-key series (the prefix arrays are O(n²) per "
    "key); unbounded series route through ts_ewma_grouped, the "
    "partition-sorted mapInPandas O(n) recurrence",
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prefix = F.collect_list("value").over(w)
    weights = F.transform(
        F.sequence(F.lit(1), F.size("prefix")),
        lambda i: F.pow(F.lit(0.5), (F.size("prefix") - i).cast("double")),
    )
    num = F.aggregate(
        F.zip_with(F.col("prefix"), weights, lambda x, wt: x * wt),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(weights, F.lit(0.0), lambda acc, x: acc + x)
    return (
        ev.withColumn("prefix", prefix)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.round(num / den, 6).alias("ewma"),
        )
    )


@register(
    "ts_anomaly_zscore",
    # Determinism without rounding tricks on the STATISTICS: the trailing
    # window's Σv and Σv² are DECIMAL (exact, order-independent — value
    # has 2 fractional digits, so DECIMAL(18,2) and its square at scale 4
    # are lossless); mean/variance/z then derive from those exact inputs
    # through the SAME double formula text on both sides, so every
    # intermediate double is bit-identical. Only the final z is rounded.
    oracle="""
        WITH win AS (
            SELECT user_id, event_id, ts, value,
                   SUM(CAST(value AS DECIMAL(18,2))) OVER w AS s,
                   SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS sq,
                   COUNT(value) OVER w AS n
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
            )
        ),
        stats AS (
            SELECT user_id, event_id, ts, value, n,
                   CAST(s AS DOUBLE) / n AS mean,
                   (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                       / (n - 1) AS var
            FROM win
            WHERE n >= 12
        )
        SELECT user_id, event_id, ts,
               round((value - mean) / sqrt(var), 6) AS zscore,
               abs((value - mean) / sqrt(var)) > 2.0 AS is_anomaly
        FROM stats
        WHERE var > 0
    """,
    doc="rolling z-score anomaly detection per key: each event scored "
    "against the mean/stddev of its 20 trailing events (excluding "
    "itself — no self-masking), flagged at |z| > 2. The telemetry "
    "outlier staple. Scale shape: one hash shuffle on the key, "
    "whole-stage-codegen window sums, no UDF; decimal window sums keep "
    "the statistics exact at any partition order",
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-20, -1)
    )
    vdec = F.col("value").cast("decimal(18,2)")
    s = F.sum(vdec).over(w)
    sq = F.sum(vdec * vdec).over(w)
    n = F.count(vdec).over(w)
    mean = s.cast("double") / n
    var = (sq.cast("double") - s.cast("double") * s.cast("double") / n) / (n - 1)
    z = (F.col("value") - F.col("mean")) / F.sqrt(F.col("var"))
    return (
        ev.select(
            "user_id", "event_id", "ts", "value",
            n.alias("n"), mean.alias("mean"), var.alias("var"),
        )
        .where(F.col("n") >= 12)
        .where(F.col("var") > 0)
        .select(
            "user_id", "event_id", "ts",
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
    )


@register(
    "ts_moving_median",
    # Exact-percentile interpolation over the same ≤6-value trailing
    # multiset: both engines sort the frame exactly and apply the same
    # (1-f)·lo + f·hi continuous-quantile formula to identical doubles;
    # round(6) absorbs nothing structural, it just normalizes display.
    oracle="""
        SELECT user_id, event_id, ts,
               round(quantile_cont(value, 0.5) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW
               ), 6) AS med
        FROM events
    """,
    doc="trailing moving median per key (6-row frame): the robust "
    "telemetry smoother — immune to the spike outliers that drag a "
    "moving mean. Exact windowed percentile, whole-stage codegen, one "
    "hash shuffle on the key; the frame bound caps per-row state so the "
    "plan is O(frame) memory at any series length",
)
def ts_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-5, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("med"),
    )


@register(
    "ts_cusum_changepoint",
    # Exactness: everything is INTEGER until the output — value has 2
    # fractional digits, so vi = round(value*100) is lossless BIGINT;
    # the CUSUM statistic is |n·S_i − i·T| (the mean-shift CUSUM
    # multiplied through by n to avoid the one division that would
    # differ across engines), all BIGINT arithmetic with no float
    # association anywhere. Ties break on earliest (ts, event_id).
    oracle="""
        WITH v AS (
            SELECT user_id, ts, event_id,
                   CAST(round(value * 100) AS BIGINT) AS vi
            FROM events
        ),
        s AS (
            SELECT user_id, ts,  event_id,
                   CAST(SUM(vi) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ) AS BIGINT) AS si,
                   CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ) AS BIGINT) AS i,
                   CAST(SUM(vi) OVER (PARTITION BY user_id) AS BIGINT)
                       AS t,
                   CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
                       AS n
            FROM v
        ),
        st AS (
            SELECT user_id, ts, n,
                   abs(n * si - i * t) AS stat,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY abs(n * si - i * t) DESC,
                                ts ASC, event_id ASC
                   ) AS rk
            FROM s
        )
        SELECT user_id, ts AS cp_ts,
               CAST(stat AS BIGINT) AS cusum_stat,
               n AS n_events
        FROM st WHERE rk = 1
    """,
    doc="CUSUM change-point detection per series: the point maximizing "
    "the cumulative deviation from the series mean — the standard "
    "level-shift detector for telemetry and drift monitoring (Page "
    "1954). Scale shape: one hash shuffle on the key, two in-partition "
    "window passes (prefix sum + argmax rank), no UDF, no global "
    "window; per-series state is O(1) in whole-stage codegen",
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    order = [F.asc("ts"), F.asc("event_id")]
    w_cum = W.partitionBy("user_id").orderBy(*order)
    w_all = W.partitionBy("user_id")
    vi = F.round(F.col("value") * 100).cast("long")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(vi).over(w_cum).alias("si"),
        F.row_number().over(w_cum).cast("long").alias("i"),
        F.sum(vi).over(w_all).alias("t"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    )
    stat = F.abs(F.col("n") * F.col("si") - F.col("i") * F.col("t"))
    w_rk = W.partitionBy("user_id").orderBy(
        stat.desc(), F.asc("ts"), F.asc("event_id")
    )
    return (
        s.withColumn("rk", F.row_number().over(w_rk))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("ts").alias("cp_ts"),
            stat.alias("cusum_stat"),
            F.col("n").alias("n_events"),
        )
    )
