"""Driver-gated streaming queries (streaming/windows.py).

Each query runs a REAL Structured Streaming job synchronously (memory
sink, ``processAllAvailable``) and returns the materialized result; the
oracle is the batch recomputation in DuckDB — the streaming-oracle
strategy from SURVEY §7 ("use batch re-computation as oracle").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windows import (
    events_stream,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from .catalog import register
from .formats import _PYDS_ORACLE


@register(
    "stream_tumbling_window",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="streaming tumbling-window aggregate (1h windows, watermarked), "
    "driven to completion through the memory sink; oracle = batch "
    "recomputation (epoch-aligned hour buckets)",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = tumbling_counts(events_stream(spark, sf_dir))
    return run_stream_to_memory(agg, output_mode="complete")


@register(
    "stream_sliding_window",
    oracle="""
        WITH starts AS (
            SELECT unnest([
                       time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
                   ]) AS window_start
            FROM events
        )
        SELECT window_start, COUNT(*) AS n_events
        FROM starts
        GROUP BY window_start
    """,
    doc="streaming sliding windows (1h size / 30min slide — every event "
    "in exactly two windows); oracle enumerates both window starts per "
    "event in batch",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = sliding_counts(events_stream(spark, sf_dir))
    return run_stream_to_memory(agg, output_mode="complete")


@register(
    "stream_session_window",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ), sess AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM gaps
        )
        SELECT user_id,
               min(ts) AS session_start,
               COUNT(*) AS n_events,
               min(ts) AS first_event,
               max(ts) AS last_event
        FROM sess
        GROUP BY user_id, sid
    """,
    doc="session windows (30min gap, per user) via session_window — "
    "identical semantics in batch and streaming plans; oracle = the "
    "lag/cumsum sessionization (session closes when gap >= the "
    "threshold, matching session_window's half-open [start, last+gap))",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import load_tables

    # batch plan of the same session_window operator — streaming flavor
    # (two-phase state merge) is exercised in tests/test_streaming.py
    ev = load_tables(spark, sf_dir, "events")["events"]
    return session_counts(ev)


@register(
    "stream_table_feed",
    oracle="""
        SELECT o_orderstatus AS status, COUNT(*) AS n
        FROM orders
        WHERE o_orderkey % 2 = 0
        GROUP BY o_orderstatus
    """,
    doc="Structured-Streaming incremental consumption of an engine table "
    "(Table.read_stream over the commit-partitioned layout): two "
    "append-only commits land, the stream discovers both commits' files "
    "and aggregates — the streaming twin of S5/S6",
)
def stream_table_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..session import load_tables
    from ..table import Table

    orders = (
        load_tables(spark, sf_dir, "orders")["orders"]
        .where(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    path = tempfile.mkdtemp(prefix="engine_stream_tbl_")
    t = Table.create(
        spark, path, key="o_orderkey", precombine="o_orderkey", table_name="orders_feed"
    )
    # append-only feed of unique-keyed rows: skip the precombine dedup
    # shuffle, exactly Hudi's combine.before.insert=false default — one
    # job per commit instead of two
    t.insert(orders.where(F.col("o_orderkey") % 4 == 0), dedup_batch=False)
    t.insert(orders.where(F.col("o_orderkey") % 4 != 0), dedup_batch=False)
    agg = (
        t.read_stream()
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return run_stream_to_memory(agg, output_mode="complete")


@register(
    "stream_foreachbatch_upsert",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey % 3 = 0
    """,
    doc="streaming ETL into a lakehouse table: foreachBatch routes every "
    "micro-batch through the engine's keyed upsert (exactly-once per "
    "batch via the commit manifest) — the streaming version of the "
    "reference's silver→gold pipeline",
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..session import load_tables
    from ..table import META_COL, Table

    orders = (
        load_tables(spark, sf_dir, "orders")["orders"]
        .where(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    scratch = tempfile.mkdtemp(prefix="engine_febatch_")
    src = Table.create(
        spark, f"{scratch}/src", key="o_orderkey", precombine="o_orderkey",
        table_name="src",
    )
    src.insert(orders.where(F.col("o_orderkey") % 2 == 0), dedup_batch=False)
    src.insert(orders.where(F.col("o_orderkey") % 2 != 0), dedup_batch=False)

    gold = Table.create(
        spark, f"{scratch}/gold", key="o_orderkey", precombine="o_orderkey",
        table_name="gold",
    )

    def sink(batch_df, epoch_id):
        if not batch_df.isEmpty():
            # batch_id = replay guard: a restart-replayed epoch is
            # recognized from the commit metadata and skipped, making
            # the sink exactly-once under at-least-once delivery
            # sink_id scopes the replay guard to THIS query's checkpoint
            # identity — a second query on the table never collides
            gold.upsert(
                batch_df.drop(META_COL),
                batch_id=str(epoch_id),
                sink_id="gold_feed",
            )

    q = (
        src.read_stream()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{scratch}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return gold.snapshot().drop(META_COL)


@register(
    "stream_dedup_watermark",
    oracle="""
        SELECT event_type, COUNT(DISTINCT event_id) AS n
        FROM events
        GROUP BY event_type
    """,
    doc="streaming deduplication: two copies of the event stream unioned "
    "(planted duplicates), watermarked dropDuplicates on event_id, then "
    "a downstream aggregate — chained stateful operators; at scale the "
    "watermark bounds dedup state to the lateness window",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1 = events_stream(spark, sf_dir)
    s2 = events_stream(spark, sf_dir)
    deduped = (
        s1.unionByName(s2)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return run_stream_to_memory(agg, output_mode="complete")


@register(
    "stream_stateful_user_stats",
    # Oracle = the batch recomputation (SURVEY §7 streaming strategy):
    # every emitted stat is order-independent (count / max / min), so
    # the folded final row per user equals plain GROUP BY regardless of
    # how the file source split micro-batches.
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               max(value) AS max_value,
               min(ts) AS first_ts,
               max(ts) AS last_ts
        FROM events
        GROUP BY user_id
    """,
    doc="custom stateful streaming operator: applyInPandasWithState "
    "per-user running stats (explicit GroupState, Arrow-batched pandas "
    "transition fn) — the extension point for state machines windowed "
    "aggs can't express; update-mode re-emissions folded by a monotone "
    "aggregate",
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import events_stream, run_stream_to_memory, stateful_user_stats

    out = run_stream_to_memory(
        stateful_user_stats(events_stream(spark, sf_dir)), output_mode="update"
    )
    # update mode re-emits a key's running row per micro-batch; all five
    # stats are monotone, so max/min folds to the final state exactly
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
        F.min("first_ts").alias("first_ts"),
        F.max("last_ts").alias("last_ts"),
    )


@register(
    "stream_stream_join",
    # Batch recomputation oracle: a single-source-batch inner
    # stream-stream join emits exactly the batch join result (append
    # mode emits matched pairs as found; no watermark-dependent
    # emission timing for INNER joins).
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id,
               c.ts AS click_ts,
               p.event_id AS purchase_id,
               p.ts AS purchase_ts
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    doc="watermarked stream-stream inner join (click -> purchase "
    "attribution within 1h): both sides watermarked + event-time-bounded "
    "condition so join state expires — the finite-memory requirement at "
    "scale; oracle is the batch range join",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import (
        events_stream,
        run_stream_to_memory,
        stream_stream_attribution_join,
    )

    joined = stream_stream_attribution_join(events_stream(spark, sf_dir))
    return run_stream_to_memory(joined, output_mode="append")


@register(
    "stream_mor_delta_feed",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE 'O' END AS status,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS price
        FROM orders
        WHERE o_orderkey % 2 = 0
    """,
    doc="streaming consumption of a MERGE_ON_READ table's delta commits "
    "(K12 x S5 streaming twin): two delta writes land (base + keyed "
    "update), the file-source stream discovers both, and the consumer "
    "reconciles latest-per-key with max_by over _commit_time — the "
    "downstream dedup contract Table.read_stream documents for "
    "merge-style tables",
)
def stream_mor_delta_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..session import load_tables
    from ..table import META_COL, Table

    orders = (
        load_tables(spark, sf_dir, "orders")["orders"]
        .where(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .withColumn("o_orderstatus", F.lit("O"))
    )
    path = tempfile.mkdtemp(prefix="engine_stream_mor_")
    t = Table.create(
        spark,
        path,
        key="o_orderkey",
        precombine="o_totalprice",
        table_name="orders_mor_feed",
        table_type="mor",
    )
    t.upsert(orders)
    t.upsert(
        orders.where(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderstatus", F.lit("U"))
    )
    latest = (
        t.read_stream()
        .groupBy("o_orderkey")
        .agg(
            F.max_by(
                F.struct("o_orderstatus", "o_totalprice"), F.col(META_COL)
            ).alias("_r")
        )
        .select(
            "o_orderkey",
            F.col("_r.o_orderstatus").alias("status"),
            F.col("_r.o_totalprice").alias("price"),
        )
    )
    return run_stream_to_memory(latest, output_mode="complete")


@register(
    "stream_mv_refresh",
    # Deterministic under ANY micro-batch split: the base table's
    # precombine (_ver) makes its final state arrival-order-independent,
    # changes_full diffs actual pre/post states per batch, and the MV
    # maintenance algebra is additive in exact decimals — so the folded
    # MV equals a full GROUP BY of the final base state bit-for-bit.
    oracle="""
        WITH final AS (
            SELECT CASE WHEN o_orderkey % 5 = 0 THEN o_custkey + 1000
                        ELSE o_custkey END AS g,
                   CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS price
            FROM orders
        )
        SELECT g AS o_custkey,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS spend
        FROM final
        GROUP BY g
    """,
    doc="streaming materialized-view maintenance: each micro-batch "
    "upserts the base table, diffs it against the pre-batch commit "
    "(changes_full CDC), and folds the O(delta) before/after images "
    "into a grouped-aggregate MV table — group migrations (custkey "
    "reassignment) and measure updates maintained without ever "
    "recomputing the base aggregate; the streaming lakehouse MV loop",
)
def stream_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.mv import incremental_mv_refresh
    from ..session import load_tables
    from ..table import META_COL, Table

    orders = load_tables(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    scratch = tempfile.mkdtemp(prefix="engine_smv_")
    src = Table.create(
        spark, f"{scratch}/src", key="o_orderkey", precombine="_ver",
        table_name="smv_src",
    )
    # coalesce(2): four ~equal source files → four micro-batches at
    # maxFilesPerTrigger=1 — enough to exercise insert, update, AND
    # group-migration maintenance without per-file scheduling overhead
    # dominating the query
    src.insert(
        orders.withColumn("_ver", F.lit(1)).coalesce(2), dedup_batch=False
    )
    src.insert(
        orders.where(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_custkey", F.col("o_custkey") + 1000)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("_ver", F.lit(2))
        .coalesce(2),
        dedup_batch=False,
    )

    base = Table.create(
        spark, f"{scratch}/base", key="o_orderkey", precombine="_ver",
        table_name="smv_base",
    )
    mv = Table.create(
        spark, f"{scratch}/mv", key="o_custkey", precombine="_refresh_seq",
        table_name="smv_mv",
    )
    # seed the MV's schema with an empty commit so refresh #1 can diff
    mv.bulk_insert(
        spark.createDataFrame(
            [],
            "o_custkey long, n_orders long, spend decimal(18,2), _refresh_seq string",
        )
    )

    def fold(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        prev = base.latest_commit()
        base.upsert(batch_df.drop(META_COL))
        changes = base.changes_full(begin=prev).select(
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

    q = (
        src.read_stream(maxFilesPerTrigger=1)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{scratch}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from .common import as_double

    return mv.snapshot().select(
        "o_custkey",
        F.col("n_orders").cast("long").alias("n_orders"),
        as_double(F.col("spend")).alias("spend"),
    )


@register(
    "stream_python_datasource",
    # Same deterministic md5 rows as the batch connector; batch=125 makes
    # the micro-batch index equal the batch reader's part_id, so one
    # oracle covers both surfaces.
    oracle=_PYDS_ORACLE,
    doc="custom Python STREAMING data source (Spark 4 "
    "SimpleDataSourceStreamReader): row-index offsets, one batch per "
    "trigger, readBetweenOffsets replays any committed range exactly — "
    "determinism makes the exactly-once replay contract trivial. The "
    "drained stream equals the batch connector's full output",
)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from ..sources.pysource import register_python_sources

    register_python_sources(spark)
    name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("synthetic_customers")
        .option("n", 1000)
        .option("batch", 125)
        .option("seed", 42)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="engine_pyds_"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "stream_multimodal_feed",
    # Batch-recompute oracle (the stream_table_feed pattern): DuckDB
    # rebuilds the aHash chain over ALL documents from characters and
    # brute-forces the Hamming-<=1 pair set — if the streaming path
    # dropped, duplicated, or re-hashed any micro-batch item, the
    # persisted index would yield a different pair set.
    oracle="""
        WITH bytes AS (
            SELECT doc_id, (i - 1) % 8 AS dim, ord(substr(text, i, 1)) AS b
            FROM (
                SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
                FROM documents
            )
        ),
        fq AS (
            SELECT doc_id, dim, CAST(COALESCE(SUM(b), 0) % 997 AS BIGINT) AS q
            FROM bytes GROUP BY doc_id, dim
        ),
        qv AS (SELECT doc_id, list(q ORDER BY dim) AS q FROM fq GROUP BY doc_id),
        h AS (
            SELECT doc_id,
                   CAST(list_sum([CASE WHEN q[d + 1] * 8 >= list_sum(q)
                                       THEN (1::BIGINT << d) ELSE 0 END
                                  for d in range(0, 8)]) AS BIGINT) AS h
            FROM qv
        )
        SELECT a.doc_id AS id_1, b.doc_id AS id_2,
               CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.h, b.h)) <= 1
    """,
    doc="streaming media/embedding feed: a media table lands in two "
    "commits, Structured Streaming consumes it (Table.read_stream), and "
    "each micro-batch's payloads are decoded + aHash-signatured and "
    "upserted into a PERSISTED (media_id, ahash) index via foreachBatch "
    "— decode cost paid once per item ever. Near-dup pairs are then "
    "served from the index alone by the multi-probe bucketing join "
    "(ahash_pairs_from_hashes); at 100 TB the steady-state per-batch "
    "cost is O(batch) decode + one keyed upsert, with pair queries "
    "never touching payload bytes",
)
def stream_multimodal_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators import multimodal as M
    from ..session import load_tables
    from ..table import META_COL, Table

    d = load_tables(spark, sf_dir, "documents")["documents"]
    media = M.to_media_table(d, "doc_id", "text", mime="text/plain")
    scratch = tempfile.mkdtemp(prefix="engine_stream_mm_")
    src = Table.create(
        spark, f"{scratch}/src", key="media_id", precombine="media_id",
        table_name="media_src",
    )
    src.insert(media.where(F.col("media_id") % 2 == 0), dedup_batch=False)
    src.insert(media.where(F.col("media_id") % 2 != 0), dedup_batch=False)
    idx = Table.create(
        spark, f"{scratch}/idx", key="media_id", precombine="media_id",
        table_name="ahash_idx",
    )

    def sink(batch_df, epoch_id):
        if not batch_df.isEmpty():
            idx.upsert(
                M.ahash_hashes(batch_df.drop(META_COL)).withColumnRenamed(
                    "_h", "ahash"
                ),
                batch_id=str(epoch_id),
                sink_id="ahash_feed",
            )

    q = (
        src.read_stream()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{scratch}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    hashes = idx.snapshot().select("media_id", F.col("ahash").alias("_h"))
    return M.ahash_pairs_from_hashes(hashes, max_hamming=1)


from .common import dsum as _dsum  # noqa: E402 — module-tail extension
from .common import sql_dsum as _sql_dsum  # noqa: E402


@register(
    "stream_rename_feed",
    oracle=f"""
        SELECT c_mktsegment AS segment, COUNT(*) AS n,
               {_sql_dsum("c_acctbal")} AS total_balance
        FROM customer
        GROUP BY c_mktsegment
    """,
    doc="Structured-Streaming consumption ACROSS a column rename (r12): "
    "half the customers land BEFORE c_acctbal is renamed to balance "
    "(their files carry the old physical name), half after — "
    "read_stream unions one fixed-glob stream per stale name vintage "
    "(physical-schema scan aliased back) with the open-glob "
    "current+future stream, so the aggregate sees every row under the "
    "CURRENT name with values intact (a single-schema stream would "
    "surface nulls for the pre-rename files). Decimal-exact balance "
    "sum; the union is bounded by #renames, collapsing after "
    "compact()",
)
def stream_rename_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..session import load_tables
    from ..table import Table

    cust = load_tables(spark, sf_dir, "customer")["customer"].select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    path = tempfile.mkdtemp(prefix="engine_stream_ren_")
    t = Table.create(
        spark, path, key="c_custkey", precombine="c_custkey",
        table_name="cust_ren_feed",
    )
    t.insert(cust.where(F.col("c_custkey") % 2 == 0), dedup_batch=False)
    t.alter_rename_column("c_acctbal", "balance")
    t.insert(
        cust.where(F.col("c_custkey") % 2 != 0).withColumnRenamed(
            "c_acctbal", "balance"
        ),
        dedup_batch=False,
    )
    agg = (
        t.read_stream()
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("balance").alias("total_balance"),
        )
    )
    return run_stream_to_memory(agg, output_mode="complete")
