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


def test_quality_check_single_pass_unique_null_semantics(spark):
    """unique_<col> counts NULL as ONE distinct slot (the old
    .distinct().count() semantics), now folded into the same
    aggregation pass as the rule counts."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        quality as Q,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, None), (3, None), (4, "c")],
        "k long, v string",
    )
    rep = {
        r["rule"]: (r["violations"], r["total"])
        for r in Q.check(df, [Q.NotNull("v")], unique=["k", "v"]).collect()
    }
    # k: 5 rows, distinct {1,2,3,4} -> 1 dup; v: distinct {a,b,c,NULL} -> 1 dup
    assert rep["unique_k"] == (1, 5)
    assert rep["unique_v"] == (1, 5)
    assert rep["not_null_v"] == (2, 5)


def test_contamination_pairs_directionality(spark):
    """Overlap is measured against the BENCHMARK doc's n-grams: a long
    training doc that contains a short eval doc verbatim scores 1.0 even
    though the reverse fraction is small."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        dedup as D,
    )

    eval_text = "the quick brown fox jumps"
    train_text = eval_text + " over the lazy dog near the quiet river bank today"
    corpus = spark.createDataFrame(
        [(1, train_text), (2, "completely unrelated words here only")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")
    got = {
        (r["corpus_id"], r["bench_id"]): r["overlap"]
        for r in D.contamination_pairs(corpus, bench, threshold=0.5).collect()
    }
    assert got == {(1, 100): 1.0}
