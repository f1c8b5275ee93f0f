"""Plan-level lint over the ENTIRE catalog: structural anti-patterns
that correctness oracles can't catch.

- ``BatchEvalPython`` (row-at-a-time Python UDF) must appear in NO
  plan: the engine's claim is Arrow-vectorized-or-JVM everywhere.
- ``CartesianProduct`` / non-broadcast ``NestedLoopJoin`` only in the
  by-design bounded allowlist (brute-force exactness baselines that
  broadcast a small query/pair side).

Runs at the cheapest SF: only plan construction is needed, but table/
stream-backed queries do execute their build pipelines, so this stays a
single sweep.
"""

from __future__ import annotations

import re

import pytest

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.plans.catalog import (
    REGISTRY,
    _load_all,
)

_load_all()
ALL = sorted(REGISTRY)

# Bounded-by-design brute-force paths: one side is a broadcast of a
# small query set / the pair enumeration IS the contract (exactness
# baselines and their consumers).
_CARTESIAN_OK = {
    "sim_topk_bruteforce",
    "sim_matmul_topk",
    "sim_ivf_probe",
    "dedup_embedding_cosine",
}

SF_SMOKE = "/root/testdata/sf0.001"


def _plan_of(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_SMOKE)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    return je.explainString(mode)


def test_keep_representative_has_no_forced_broadcast(spark):
    """The drop list in keep_representative is O(corpus) at web scale
    (dedup drops 30-50% of documents) — a forced ``F.broadcast()`` hint
    there OOMs executors at 100 TB. Build the operator over a literal
    pair set (no upstream lineage, which legitimately carries the
    bounded stop-shingle broadcast) and assert its anti-join ships with
    NO hint, leaving the strategy to AQE (shuffle anti-join at scale)."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.dedup import (
        keep_representative,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_1", "id_2"])
    df = keep_representative(corpus, pairs, "doc_id")
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, (
        f"forced join-strategy hint in keep_representative plan:\n{analyzed[:1500]}"
    )


@pytest.mark.parametrize("name", ALL)
def test_no_row_python_udf_and_no_stray_cartesian(name, spark):
    plan = _plan_of(spark, name)
    assert "BatchEvalPython" not in plan, (
        f"{name} ships a row-at-a-time Python UDF:\n{plan[:1500]}"
    )
    if name not in _CARTESIAN_OK:
        bad = re.search(r"CartesianProduct|BroadcastNestedLoopJoin Cross", plan)
        assert not bad, (
            f"{name} has an unapproved cartesian/cross join:\n{plan[:1500]}"
        )


def test_partitioned_table_join_uses_dynamic_partition_pruning(spark, tmp_path):
    """Scale evidence: a selective dim-side filter joined against a
    hive-partitioned fact must reach the fact scan as a runtime
    partition filter (Catalyst DPP), not a full scan — at 100 TB this
    is the difference between reading one partition and reading the
    table. Asserts the physical plan carries a dynamicpruning
    expression on the partitioned scan."""
    from pyspark.sql import functions as F

    fact = spark.range(0, 10000).select(
        F.col("id").alias("k"),
        (F.col("id") % 25).alias("part"),
        (F.col("id") * 2).alias("v"),
    )
    path = str(tmp_path / "fact")
    fact.write.partitionBy("part").parquet(path)
    dim = spark.range(0, 25).select(
        F.col("id").alias("part"), (F.col("id") % 5).alias("grp")
    )
    joined = (
        spark.read.parquet(path)
        .join(dim.where(F.col("grp") == 0), "part")
        .groupBy("part")
        .agg(F.sum("v").alias("sv"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        f"no dynamic partition pruning in plan:\n{plan[:2000]}"
    )
