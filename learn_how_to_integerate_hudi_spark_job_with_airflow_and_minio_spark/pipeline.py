"""Declarative medallion pipeline runner.

The reference's ETL job is a fixed script: JSON source payload →
Loaders → SQL join over views → gold upsert → checkpoint
(``incremental_etl_orders.py:454-496``). This module packages that whole
shape as one reusable, declarative function, keeping the reference's
payload schema as the spec format (SURVEY §1.1 "source descriptor")::

    run_pipeline(spark, {
        "sources": [  # same shape as incremental_etl_orders.py:27-46
            {"source_type": "ENGINE", "table_name": "orders",
             "spark_table_name": "orders", "path": ..., "type": "INC"},
            {"source_type": "ENGINE", "table_name": "customers",
             "spark_table_name": "customers", "path": ..., "type": "FULL"},
        ],
        "transform_sql": "SELECT ... FROM customers c JOIN orders o ...",
        "sink": {"path": ..., "record_key": "order_id",
                 "precombine": "order_id", "partition_fields": []},
        "checkpoint_root": ...,
    })

Semantics: INC sources advance their checkpoint only after the sink
upsert commits (at-least-once, SURVEY §2.6 fix); an empty incremental
batch short-circuits to a no-op.

This module also holds ``build_corpus``, the second end-to-end pipeline
the engine ships: the LLM training-corpus medallion build (bronze keyed
ingest → quality filter → exact + near-dup removal → decontamination →
domain-mix sampling → sequence packing → gold table), gated end-to-end
as the catalog query ``pipeline_llm_corpus_gold``.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .checkpoint import CheckpointStore
from .operators import dedup as D
from .operators import quality as Q
from .operators.sampling import domain_mix_sample, retention_maximizing_rates
from .sources.loaders import Loaders
from .table import META_COL, Table


def run_pipeline(spark: SparkSession, spec: dict) -> str | None:
    """Execute one pipeline run; returns the sink commit id (None if the
    incremental batch was empty → no-op)."""
    store = (
        CheckpointStore(spec["checkpoint_root"])
        if spec.get("checkpoint_root")
        else None
    )
    loaders = Loaders(spec["sources"], spark, checkpoint_store=store)
    views = loaders.load()

    inc_views = [
        s.get("spark_table_name", s["table_name"])
        for s in spec["sources"]
        if s.get("type", "FULL").upper() == "INC"
    ]
    for v in inc_views:
        if v not in views or views[v].isEmpty():
            return None  # nothing new on an incremental source

    result = spark.sql(spec["transform_sql"]).drop(META_COL)
    result.cache()
    try:
        sink = spec["sink"]
        table = Table.create(
            spark,
            sink["path"],
            key=sink["record_key"],
            precombine=sink.get("precombine", sink["record_key"]),
            partition_fields=sink.get("partition_fields"),
            table_name=sink.get("table_name"),
            exists_ok=True,
        )
        commit = table.upsert(result)
        loaders.commit_checkpoints()  # after the sink write (§2.6)
        return commit
    finally:
        result.unpersist()


def build_corpus(
    spark, base: str, docs_path: str, eval_modulus: int = 7, audit: bool = True
):
    """Run the full pipeline; returns (gold Table, stage-count dict,
    quality report DataFrame). ``audit=False`` skips the per-stage count
    actions (the counts dict stays empty) — used by the gated catalog
    query, where only the gold output is checked and every extra action
    costs a full job round-trip."""
    counts: dict[str, int] = {}

    def _audit(stage: str, df) -> None:
        if audit:
            counts[stage] = df.count()

    raw = spark.read.parquet(docs_path)
    _audit("raw", raw)

    # --- bronze: idempotent keyed ingest -------------------------------
    bronze = Table.create(
        spark,
        f"{base}/bronze_documents",
        key="doc_id",
        precombine="n_chars",
        table_name="bronze_documents",
    )
    bronze.upsert(raw)
    docs = bronze.snapshot().drop(META_COL)

    # --- silver: quality gate ------------------------------------------
    # expectation report is the audit artifact; the filter itself is the
    # same predicates applied row-wise
    rules = [Q.NotNull("text"), Q.Expr("length(text) >= 20", "min_len_20")]
    report = Q.check(docs, rules, unique=["doc_id"])
    # Persist policy (r4 ADVICE refinement): persist a stage iff its
    # lineage is traversed more than once. `filtered`, `deduped`, and
    # `clean` are each referenced on MULTIPLE DAG branches (dedup keeper
    # + semi-join; bench + train split; src_counts collect + sampling)
    # — Catalyst does not share those subplans, so they'd recompute the
    # whole chain per branch even with audit=False. `mixed` is consumed
    # by exactly one downstream action unless auditing, so it persists
    # only when audit=True. Unpersist as each stage retires.
    filtered = docs.where(
        F.col("text").isNotNull() & (F.length("text") >= 20)
    ).persist()
    _audit("after_quality", filtered)

    # --- silver: exact + near-dup removal ------------------------------
    # No broadcast hints on keeper/drop sets: both scale with the corpus
    # (one keeper per exact-dup GROUP ≈ the whole key set), so a forced
    # broadcast OOMs at web scale. AQE still picks a broadcast join when
    # the side is actually small at runtime.
    exact_groups = D.exact_dedup(filtered, ["text"], "doc_id")
    keep_exact = exact_groups.select(F.col("keeper_id").alias("doc_id"))
    uniq = filtered.join(keep_exact, "doc_id", "left_semi")
    pairs = D.ngram_jaccard_pairs(
        uniq, "doc_id", "text", n=3, threshold=0.8, max_df=0.1
    )
    deduped = D.keep_representative(uniq, pairs, "doc_id").persist()
    _audit("after_dedup", deduped)
    filtered.unpersist()

    # --- silver: decontamination vs the eval split ---------------------
    bench = deduped.where(F.col("doc_id") % eval_modulus == 0)
    train = deduped.where(F.col("doc_id") % eval_modulus != 0)
    contaminated = D.contamination_pairs(
        train, bench, "doc_id", "doc_id", "text", n=3, threshold=0.5
    ).select(F.col("corpus_id").alias("doc_id")).distinct()
    clean = train.join(contaminated, "doc_id", "left_anti").persist()
    _audit("after_decontam", clean)
    deduped.unpersist()

    # --- gold: domain mix to uniform target ----------------------------
    src_counts = {
        r["source"]: r["n"]
        for r in clean.groupBy("source").agg(F.count("*").alias("n")).collect()
    }  # bounded: one row per source
    target = {s: 1.0 / len(src_counts) for s in src_counts}
    # Rates rounded to 6 decimals so membership (md5-frac < rate) is
    # bit-reproducible across engines: the solver's float path and the
    # oracle's min(count)/count differ by ulps, which the rounding
    # absorbs. floor(x*1e6 + 0.5) is half-up in BOTH engines (Python's
    # round() is half-even — don't use it here).
    rates = {
        s: math.floor(r * 1_000_000 + 0.5) / 1_000_000
        for s, r in retention_maximizing_rates(src_counts, target).items()
    }
    mixed = domain_mix_sample(clean, "doc_id", "source", rates)
    if audit:
        mixed = mixed.persist()
    _audit("after_mix", mixed)
    if audit:
        # the after_mix count materialized mixed's cache, which now
        # carries the lineage — clean can retire early
        clean.unpersist()

    # --- gold: sequence packing + table write --------------------------
    from pyspark.sql.window import Window as W

    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = (
        W.partitionBy("source")
        .orderBy(F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = (
        mixed.withColumn("n_tokens", n_tokens)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("n_tokens")).cast("double") / 4096).cast(
                "long"
            ),
        )
        .drop("cum")
    )
    gold = Table.create(
        spark,
        f"{base}/gold_corpus",
        key="doc_id",
        precombine="n_chars",
        table_name="gold_corpus",
    )
    gold.upsert(packed)
    if audit:
        mixed.unpersist()
    else:
        # without the audit counts nothing materialized mixed, so the
        # upsert is the one traversal — it read straight from clean's
        # cache (populated by the src_counts collect), which retires now
        clean.unpersist()
    if audit:
        counts["gold"] = gold.snapshot().count()
    return gold, counts, report
