"""Structured Streaming tests: watermark late-data semantics, streaming
session windows, the table file-feed, and a custom stateful operator
(applyInPandasWithState)."""

from __future__ import annotations

import os
import time
from datetime import datetime

import pandas as pd
import pytest

from .conftest import SF_DIR
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.streaming.windows import (
    run_stream_to_memory,
    session_counts,
    tumbling_counts,
)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", StringType()),
    ]
)


def _write_batch(spark, path, rows, name):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, name)
    )


def _ts(s):
    return datetime.fromisoformat(s)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg: a row older than the watermark is
    dropped, an in-order row is aggregated."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_batch(
        spark, src,
        [(1, _ts("2024-01-01T10:05:00"), "a"), (1, _ts("2024-01-01T10:20:00"), "b")],
        "b1",
    )
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/*")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("w"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_test")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: advance event time far ahead (watermark → 11:50), plus
        # one very late row that lands in an already-finalized window
        _write_batch(
            spark, src,
            [(1, _ts("2024-01-01T12:00:00"), "c"), (1, _ts("2024-01-01T10:07:00"), "late")],
            "b2",
        )
        q.processAllAvailable()
        # one more batch to let closed windows flush
        _write_batch(spark, src, [(1, _ts("2024-01-01T13:00:00"), "d")], "b3")
        q.processAllAvailable()
    finally:
        q.stop()
    out = sorted((r["w"], r["n"]) for r in spark.table("wm_test").collect())
    # the late 10:07 row must NOT appear anywhere: had the watermark not
    # dropped it, a second (10:00, 1) emission would show up. 13:00's
    # window is still open (watermark 12:50) and correctly unemitted.
    assert out == [
        (_ts("2024-01-01T10:00:00"), 1),
        (_ts("2024-01-01T10:20:00"), 1),
        (_ts("2024-01-01T12:00:00"), 1),
    ]


def test_streaming_session_window_matches_batch(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    rows = [
        (1, _ts("2024-01-01T10:00:00"), "a"),
        (1, _ts("2024-01-01T10:10:00"), "b"),   # same session (gap 10m)
        (1, _ts("2024-01-01T11:00:00"), "c"),   # new session (gap 50m)
        (2, _ts("2024-01-01T10:00:00"), "d"),
    ]
    _write_batch(spark, src, rows, "b1")
    stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    streamed = run_stream_to_memory(
        session_counts(stream.withWatermark("ts", "1 hour")), output_mode="complete"
    )
    got = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in streamed.collect()
    }
    batch = session_counts(spark.createDataFrame(rows, SCHEMA))
    want = {(r["user_id"], r["session_start"]): r["n_events"] for r in batch.collect()}
    assert got == want
    assert got[(1, _ts("2024-01-01T10:00:00"))] == 2


def test_table_read_stream_sees_new_commits(spark, tmp_path):
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        Table,
    )

    t = Table.create(
        spark, str(tmp_path / "feed"), key="id", precombine="ver", table_name="feed"
    )
    df1 = spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], "id long, ver long, val string")
    t.insert(df1)
    counts = t.read_stream().groupBy("val").agg(F.count(F.lit(1)).alias("n"))
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("feed_out")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("feed_out").count() == 2
        # a NEW commit lands while the stream is running → discovered
        t.insert(spark.createDataFrame([(3, 1, "c")], "id long, ver long, val string"))
        q.processAllAvailable()
        out = {r["val"]: r["n"] for r in spark.table("feed_out").collect()}
        assert out == {"a": 1, "b": 1, "c": 1}
    finally:
        q.stop()


def test_apply_in_pandas_with_state_running_count(spark, tmp_path):
    """Custom stateful streaming operator: per-user running event count
    via applyInPandasWithState (GroupState), the engine's escape hatch
    for operators Spark lacks."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = str(tmp_path / "state_src")
    os.makedirs(src)
    _write_batch(
        spark, src,
        [(1, _ts("2024-01-01T10:00:00"), "a"), (1, _ts("2024-01-01T10:01:00"), "b"),
         (2, _ts("2024-01-01T10:00:00"), "c")],
        "b1",
    )

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("running", LongType())]
    )
    state_schema = StructType([StructField("cnt", LongType())])

    def count_fn(key, pdfs, state: GroupState):
        total = sum(len(pdf) for pdf in pdfs)
        prev = state.get[0] if state.exists else 0
        state.update((prev + total,))
        yield pd.DataFrame({"user_id": [key[0]], "running": [prev + total]})

    stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
    counted = stream.groupBy("user_id").applyInPandasWithState(
        count_fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [(1, _ts("2024-01-01T10:05:00"), "d")], "b2")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("state_out").collect()
    latest = {}
    for r in rows:
        latest[r["user_id"]] = max(latest.get(r["user_id"], 0), r["running"])
    assert latest == {1: 3, 2: 1}  # state carried across micro-batches


def test_stateful_streaming_on_rocksdb_state_store(spark, tmp_path):
    """The 100 TB state backend: the same applyInPandasWithState operator
    produces identical folded results under RocksDBStateStoreProvider
    (disk-backed, changelog-checkpointed state — the provider a large
    deployment runs) as under the default HDFS-backed in-memory provider.
    Conf is restored afterwards so other tests keep the default."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.streaming.windows import (
        events_stream,
        run_stream_to_memory,
        stateful_user_stats,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    default = spark.conf.get(key)

    def folded():
        out = run_stream_to_memory(
            stateful_user_stats(events_stream(spark, SF_DIR)),
            output_mode="update",
        )
        return sorted(
            (r["user_id"], r["n_events"], r["max_value"])
            for r in out.groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("max_value").alias("max_value"),
            )
            .collect()
        )

    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        rocks = folded()
    finally:
        spark.conf.set(key, default)
    assert rocks == folded() and rocks  # identical, non-empty


def test_stream_mv_restart_from_checkpoint_matches_batch(spark, tmp_path):
    """r5 verdict item 7: the streaming MV maintenance loop must survive
    a stream stop + restart from its checkpoint mid-feed: batches
    processed before the kill are not reprocessed, batches after resume
    fold on top, and the final MV equals a full batch recompute of the
    base state. Also pins replay-idempotence: re-delivering the last
    micro-batch (what a crash between foreachBatch and checkpoint commit
    does) leaves the MV unchanged."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.mv import (
        incremental_mv_refresh,
    )
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        META_COL,
        Table,
    )

    sch = "id long, g string, amt decimal(18,2), _ver long"
    src = Table.create(
        spark, str(tmp_path / "src"), key="id", precombine="_ver",
        table_name="mvr_src",
    )
    base = Table.create(
        spark, str(tmp_path / "base"), key="id", precombine="_ver",
        table_name="mvr_base",
    )
    mv = Table.create(
        spark, str(tmp_path / "mv"), key="g", precombine="_refresh_seq",
        table_name="mvr_mv",
    )
    mv.bulk_insert(
        spark.createDataFrame(
            [], "g string, n_rows long, amt decimal(18,2), _refresh_seq string"
        )
    )

    def fold(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        prev = base.latest_commit()
        base.upsert(batch_df.drop(META_COL))
        changes = base.changes_full(begin=prev).select(
            "g", "g_before", "amt", "amt_before", "_change_type"
        )
        incremental_mv_refresh(
            mv, changes, group_col="g", measure_cols=["amt"],
            refresh_seq=base.latest_commit(), count_col="n_rows",
        )

    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        q = (
            src.read_stream(maxFilesPerTrigger=1)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def mv_state():
        return sorted(
            (r["g"], r["n_rows"], str(r["amt"]))
            for r in mv.snapshot().select("g", "n_rows", "amt").collect()
        )

    def batch_recompute():
        return sorted(
            (r["g"], r["n"], str(r["amt"]))
            for r in base.snapshot()
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("amt"))
            .collect()
        )

    # phase 1: two single-file commits → two micro-batches, then STOP
    rows1 = [(1, "a", "10.00", 1), (2, "b", "20.00", 1)]
    rows2 = [(1, "a", "15.00", 2), (3, "a", "5.00", 1)]  # update + insert
    for rows in (rows1, rows2):
        src.insert(
            spark.createDataFrame(
                [(i, g, __import__("decimal").Decimal(a), v) for i, g, a, v in rows],
                sch,
            ).coalesce(1)
        )
    run_stream()
    halfway = mv_state()
    assert halfway == batch_recompute()
    n_base_commits_halfway = len(base.commits())

    # phase 2: more commits AFTER the stop (incl. group migration), restart
    rows3 = [(2, "a", "7.00", 2)]            # b -> a migration
    rows4 = [(4, "b", "1.00", 1), (1, "a", "2.00", 3)]
    for rows in (rows3, rows4):
        src.insert(
            spark.createDataFrame(
                [(i, g, __import__("decimal").Decimal(a), v) for i, g, a, v in rows],
                sch,
            ).coalesce(1)
        )
    run_stream()  # resumes from the SAME checkpoint
    # pre-kill batches were NOT reprocessed: exactly 2 new base commits
    assert len(base.commits()) == n_base_commits_halfway + 2
    assert mv_state() == batch_recompute()

    # replay-idempotence: re-fold the last source batch (duplicate
    # delivery after a crash between foreachBatch and checkpoint commit)
    last_batch = spark.createDataFrame(
        [(4, "b", __import__("decimal").Decimal("1.00"), 1),
         (1, "a", __import__("decimal").Decimal("2.00"), 3)],
        sch,
    )
    before = mv_state()
    fold(last_batch, epoch_id=-1)
    assert mv_state() == before
