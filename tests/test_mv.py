"""Incremental MV maintenance: paths the gated query doesn't reach.

`mv_incremental_refresh` (the catalog query) proves insert/update/delete
deltas against a DuckDB oracle; these tests force the two remaining
branches of the maintenance algebra — a row *migrating between groups*
(update emits −before-group, +after-group) and a group whose count
reaches zero (MV row must be deleted) — and assert the refreshed MV
equals a from-scratch recompute of the base snapshot.
"""

from __future__ import annotations

import tempfile
from decimal import Decimal

from pyspark.sql import functions as F

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.mv import (
    incremental_mv_refresh,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
    Table,
)

_SCHEMA = "id long, g string, m decimal(18,2), v long"


def _mv_rows(mv):
    return {
        (r["g"], r["n_rows"], str(r["m"]))
        for r in mv.snapshot().select("g", "n_rows", "m").collect()
    }


def _recompute_rows(base):
    return {
        (r["g"], r["n_rows"], str(r["m"]))
        for r in base.snapshot()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("m").cast("decimal(18,2)").alias("m"),
        )
        .collect()
    }


def test_mv_refresh_group_migration_and_vanish(spark):
    base = Table.create(
        spark, tempfile.mkdtemp(prefix="mv_base_"), key="id", precombine="v"
    )
    c1 = base.upsert(
        spark.createDataFrame(
            [(1, "a", Decimal("10.00"), 1), (2, "a", Decimal("5.00"), 1), (3, "b", Decimal("7.00"), 1)], _SCHEMA
        )
    )
    mv = Table.create(
        spark, tempfile.mkdtemp(prefix="mv_"), key="g", precombine="_refresh_seq"
    )
    mv.bulk_insert(
        base.snapshot(as_of=c1)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("m").cast("decimal(18,2)").alias("m"),
        )
        .withColumn("_refresh_seq", F.lit(c1))
    )

    # migration: id=3 moves b -> c; update: id=2 value changes;
    # insert: id=4 joins b.
    base.upsert(
        spark.createDataFrame(
            [(3, "c", Decimal("7.00"), 2), (2, "a", Decimal("6.00"), 2), (4, "b", Decimal("1.00"), 2)], _SCHEMA
        )
    )
    # vanish: group a loses both members -> its MV row must disappear;
    # group b also loses the original member but keeps id=4.
    base.delete(spark.createDataFrame([(1,), (2,)], "id long"))

    changes = base.changes_full(begin=c1).select(
        "g", "g_before", "m", "m_before", "_change_type"
    )
    incremental_mv_refresh(
        mv,
        changes,
        group_col="g",
        measure_cols=["m"],
        refresh_seq=base.latest_commit(),
    )

    got = _mv_rows(mv)
    assert got == _recompute_rows(base)
    assert got == {("b", 1, "1.00"), ("c", 1, "7.00")}
    assert "a" not in {g for g, *_ in got}


def test_mv_refresh_is_idempotent_per_feed_window(spark):
    """Applying the NEXT window's delta (empty) is a no-op."""
    base = Table.create(
        spark, tempfile.mkdtemp(prefix="mv_base2_"), key="id", precombine="v"
    )
    c1 = base.upsert(spark.createDataFrame([(1, "a", Decimal("2.00"), 1)], _SCHEMA))
    mv = Table.create(
        spark, tempfile.mkdtemp(prefix="mv2_"), key="g", precombine="_refresh_seq"
    )
    mv.bulk_insert(
        base.snapshot()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("m").cast("decimal(18,2)").alias("m"),
        )
        .withColumn("_refresh_seq", F.lit(c1))
    )
    before = _mv_rows(mv)
    changes = base.changes_full(begin=base.latest_commit()).select(
        "g", "g_before", "m", "m_before", "_change_type"
    )
    incremental_mv_refresh(
        mv, changes, group_col="g", measure_cols=["m"], refresh_seq="zzz"
    )
    assert _mv_rows(mv) == before
