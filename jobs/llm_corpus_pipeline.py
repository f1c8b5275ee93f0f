"""End-to-end LLM training-corpus pipeline over the engine's operators.

The medallion flow a 100 TB training-data build actually runs, chained
from the engine's own primitives (each individually driver-gated; this
job proves they compose):

  bronze   raw documents ingested into a keyed table (upsert — re-runs
           are idempotent)
  silver   quality filter (expectation rules) → exact + near-dup
           removal (Jaccard pairs → components → keep representative)
           → benchmark decontamination (n-gram overlap vs an eval set)
  gold     domain-mix sampling to target source proportions →
           sequence packing (fixed token budget per pack) written as a
           gold table partitioned nowhere (pack_id is the batch unit)

Every stage is a DataFrame-in/DataFrame-out operator — no driver-side
data loops; the only collects are bounded metadata (per-source counts
for the rate solver). Run:

    python jobs/llm_corpus_pipeline.py --base /tmp/llm_wh \
        --docs /root/testdata/sf0.01/documents.parquet
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark import (
    Table,
    build_session,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
    dedup as D,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
    quality as Q,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.sampling import (
    domain_mix_sample,
    retention_maximizing_rates,
)
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
    META_COL,
)


def build_corpus(spark, base: str, docs_path: str, eval_modulus: int = 7):
    """Run the full pipeline; returns (gold Table, stage-count dict)."""
    counts: dict[str, int] = {}
    raw = spark.read.parquet(docs_path)
    counts["raw"] = raw.count()

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
    # Each audit .count() below would otherwise re-run the whole lineage
    # from the bronze snapshot — invisible at sf0.01, several-fold cost at
    # 100 TB. Persist every stage boundary once; unpersist when the next
    # stage is materialized.
    filtered = docs.where(
        F.col("text").isNotNull() & (F.length("text") >= 20)
    ).persist()
    counts["after_quality"] = filtered.count()

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
    counts["after_dedup"] = deduped.count()
    filtered.unpersist()

    # --- silver: decontamination vs the eval split ---------------------
    bench = deduped.where(F.col("doc_id") % eval_modulus == 0)
    train = deduped.where(F.col("doc_id") % eval_modulus != 0)
    contaminated = D.contamination_pairs(
        train, bench, "doc_id", "doc_id", "text", n=3, threshold=0.5
    ).select(F.col("corpus_id").alias("doc_id")).distinct()
    clean = train.join(contaminated, "doc_id", "left_anti").persist()
    counts["after_decontam"] = clean.count()
    deduped.unpersist()

    # --- gold: domain mix to uniform target ----------------------------
    src_counts = {
        r["source"]: r["n"]
        for r in clean.groupBy("source").agg(F.count("*").alias("n")).collect()
    }  # bounded: one row per source
    target = {s: 1.0 / len(src_counts) for s in src_counts}
    rates = retention_maximizing_rates(src_counts, target)
    mixed = domain_mix_sample(clean, "doc_id", "source", rates).persist()
    counts["after_mix"] = mixed.count()
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
    mixed.unpersist()
    counts["gold"] = gold.snapshot().count()
    return gold, counts, report


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="/tmp/llm_warehouse")
    p.add_argument("--docs", default="/root/testdata/sf0.01/documents.parquet")
    args = p.parse_args(argv)

    spark = build_session(app_name="llm_corpus_pipeline")
    gold, counts, report = build_corpus(spark, args.base, args.docs)
    report.show(truncate=False)
    for stage, n in counts.items():
        print(f"{stage:16s} {n}")
    spark.stop()


if __name__ == "__main__":
    main()
