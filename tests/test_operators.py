"""Unit tests for custom operators (beyond the oracle harness)."""

from __future__ import annotations

from datetime import datetime

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.asof import (
    asof_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_strict_vs_exact(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "q1"), (1, _ts("2024-01-01T12:00:00"), "q2"),
         (2, _ts("2024-01-01T09:00:00"), "q3")],
        "uid long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100.0), (1, _ts("2024-01-01T11:00:00"), 200.0),
         (3, _ts("2024-01-01T08:00:00"), 999.0)],
        "uid long, rts timestamp, price double",
    )
    strict = {
        r["tag"]: r["matched_price"]
        for r in asof_join(
            left, right, by=["uid"], left_ts="ts", right_ts="rts"
        ).collect()
    }
    # strict (<): q1 at 10:00 must NOT match the 10:00 right row
    assert strict == {"q1": None, "q2": 200.0, "q3": None}

    exact = {
        r["tag"]: r["matched_price"]
        for r in asof_join(
            left, right, by=["uid"], left_ts="ts", right_ts="rts",
            allow_exact_matches=True,
        ).collect()
    }
    assert exact == {"q1": 100.0, "q2": 200.0, "q3": None}


def test_connected_components_multihop(spark):
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        dedup as D,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_1 long, id_2 long"
    )
    got = {r["id"]: r["component"] for r in D.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
