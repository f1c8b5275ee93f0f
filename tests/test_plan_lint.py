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
    # broadcast query set × corpus scan with an int8 shortlist — the
    # nested-loop side is the bounded |Q| broadcast by contract
    "sim_quantized_topk",
}

SF_SMOKE = "/root/testdata/sf0.001"

# Forced-broadcast-hint audit: a `F.broadcast()` over an input that
# grows with scale factor is a permanent scale liability (executor OOM
# at 100 TB — the hint overrides autoBroadcastJoinThreshold). A hint
# subtree is considered bounded if it contains a cardinality-bounding
# operator (Aggregate / Limit / Deduplicate) or touches only
# fixed-cardinality tables (nation 25 rows / region 5 rows / literal
# LocalRelations). Anything else must be allowlisted here with a
# bounded-by-contract argument.
_HINT_OK = {
    # |Q| probe sets: vec_id < 10 key-range filter — 10 rows at any SF
    # by the operator's contract (the query side IS the small side)
    "sim_hard_negatives",
    "sim_ivf_probe",
    "sim_ivf_recall",
    # same |Q| contract: the vec_id < 10 query set feeds both the probe
    # and the brute-force recall ground truth; the broadcast side is 10
    # rows at any SF
    "sim_ivf_incremental",
    "sim_lsh_ann",
    "sim_quantized_topk",
    "sim_topk_bruteforce",
    # benchmark/eval shingle table: the bench suite is small by the
    # decontamination contract (eval sets don't grow with corpus SF)
    "decontaminate_ngram_overlap",
}

_SF_TABLE_MARKERS = re.compile(
    r"\b(c_custkey|s_suppkey|o_orderkey|l_orderkey|p_partkey"
    r"|doc_id|vec_id|event_id|user_id)#"
)
_CARDINALITY_BOUNDED = re.compile(r"\b(Aggregate|GlobalLimit|Deduplicate)")


def _tree_indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-"))


def _forced_sf_broadcasts(analyzed: str) -> list[str]:
    """ResolvedHint subtrees in an analyzed-plan string that reference
    an SF-proportional table without a cardinality-bounding operator."""
    lines = analyzed.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln:
            continue
        depth = _tree_indent(ln)
        sub = []
        for ln2 in lines[i + 1 :]:
            if ln2.strip() and _tree_indent(ln2) <= depth:
                break
            sub.append(ln2)
        subtree = "\n".join(sub)
        if _SF_TABLE_MARKERS.search(subtree) and not _CARDINALITY_BOUNDED.search(
            subtree
        ):
            bad.append(subtree)
    return bad


def _plan_of(spark, name: str) -> tuple[str, str]:
    df = REGISTRY[name].spark_fn(spark, SF_SMOKE)
    je = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    return je.analyzed().toString(), je.explainString(mode)


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
    analyzed, plan = _plan_of(spark, name)
    assert "BatchEvalPython" not in plan, (
        f"{name} ships a row-at-a-time Python UDF:\n{plan[:1500]}"
    )
    if name not in _CARTESIAN_OK:
        bad = re.search(r"CartesianProduct|BroadcastNestedLoopJoin Cross", plan)
        assert not bad, (
            f"{name} has an unapproved cartesian/cross join:\n{plan[:1500]}"
        )
    if name not in _HINT_OK:
        offenders = _forced_sf_broadcasts(analyzed)
        assert not offenders, (
            f"{name} forces a broadcast of an SF-proportional input "
            f"(OOM at scale — drop the hint and let AQE choose):\n"
            f"{offenders[0][:1500]}"
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


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Scale evidence: two tables bucketed by the join key into the same
    bucket count must sort-merge join with NO Exchange on either side —
    at 100 TB, pre-bucketing the fact tables turns every co-located
    join/agg on the bucket key from a full shuffle into a map-side zip.
    """
    from pyspark.sql import functions as F

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}'")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(0, 10000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        for name, df in [("l", left), ("r", right)]:
            df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
                f"bkt.{name}"
            )
        joined = spark.table("bkt.l").join(spark.table("bkt.r"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, (
            f"bucketed join still shuffles:\n{plan[:2000]}"
        )
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_scan_projection_and_filter_pushdown(spark):
    """Scale evidence: a 2-column projection with a selective filter
    must reach the parquet scan as ReadSchema pruning + PushedFilters —
    a scan that reads every column for a 2-column projection is wrong
    at any scale, catastrophic at 100 TB."""
    df = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .where("l_quantity > 45")
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, f"no ReadSchema in plan:\n{plan[:1500]}"
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert sorted(cols) == ["l_orderkey", "l_quantity"], cols
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(l_quantity", plan), (
        f"quantity filter not pushed down:\n{plan[:1500]}"
    )


def test_dehinted_tpch_dims_still_broadcast_at_small_sf(spark):
    """The r6-verdict fix removed forced F.broadcast() hints from
    SF-proportional dims (customer/supplier in q02/Q3/Q5/Q10). The
    stated contract is that AQE still picks a broadcast join while the
    dim fits under autoBroadcastJoinThreshold — pin that, so the
    de-hinting can never silently degrade small-scale plans to full
    shuffle joins."""
    for name in ("q02_flagship_join", "join_tpch_q3", "join_tpch_q10"):
        df = REGISTRY[name].spark_fn(spark, SF_SMOKE)
        df.write.mode("overwrite").format("noop").save()  # finalize AQE
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, (
            f"{name}: AQE did not broadcast the dim at smoke SF:\n"
            f"{plan[:2000]}"
        )
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert not _forced_sf_broadcasts(analyzed), (
            f"{name} regained a forced SF-proportional broadcast hint"
        )
