"""Sequence packing operator (operators/packing.py): concat-and-chunk
invariants and the distributed two-phase prefix sum's equality with a
serial cumsum."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.packing import (
    pack_sequences,
    pack_stats,
)


def _docs(spark, weights):
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, n long"
    )


def test_pack_basic_layout(spark):
    # budget 10: docs 4,4,4 → doc2 straddles bins 0/1
    packed = pack_sequences(_docs(spark, [4, 4, 4]), "n", budget=10)
    rows = sorted(
        (r["doc_id"], r["bin_id"], r["doc_offset"], r["bin_offset"], r["n_tokens"])
        for r in packed.collect()
    )
    assert rows == [
        (0, 0, 0, 0, 4),
        (1, 0, 0, 4, 4),
        (2, 0, 0, 8, 2),
        (2, 1, 2, 0, 2),
    ]


def test_pack_doc_spanning_many_bins(spark):
    packed = pack_sequences(_docs(spark, [3, 25, 2]), "n", budget=10)
    spans = sorted(
        (r["bin_id"], r["bin_offset"], r["n_tokens"])
        for r in packed.where("doc_id = 1").collect()
    )
    # doc1 occupies [3, 28): bins 0 (7), 1 (10), 2 (8)
    assert spans == [(0, 3, 7), (1, 0, 10), (2, 0, 8)]


def test_pack_invariants_random(spark):
    import random

    rng = random.Random(11)
    weights = [rng.randint(0, 40) for _ in range(500)]
    budget = 64
    packed = pack_sequences(
        _docs(spark, weights), "n", budget=budget, bucket_width=37
    ).cache()
    rows = packed.collect()
    # each doc's segments sum to its weight and chain contiguously
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, segs in by_doc.items():
        segs.sort(key=lambda r: r["bin_id"])
        assert sum(s["n_tokens"] for s in segs) == weights[d]
        assert segs[0]["doc_offset"] == 0
        for a, b in zip(segs, segs[1:]):
            assert b["bin_id"] == a["bin_id"] + 1
            assert b["doc_offset"] == a["doc_offset"] + a["n_tokens"]
            assert a["bin_offset"] + a["n_tokens"] == budget  # a fills its bin
            assert b["bin_offset"] == 0
    # zero-weight docs are absent
    assert set(by_doc) == {i for i, w in enumerate(weights) if w > 0}
    # every bin except the last is exactly full
    stats = {r["bin_id"]: r["n_tokens"] for r in pack_stats(packed, budget).collect()}
    last = max(stats)
    for b, n in stats.items():
        assert n == budget or b == last
    assert sum(stats.values()) == sum(weights)
    packed.unpersist()


def test_pack_bucket_width_invariance(spark):
    # the distributed prefix sum must be bucket-width independent —
    # identical to the serial layout for any partitioning
    weights = [(i * 7919) % 50 for i in range(300)]
    a = pack_sequences(_docs(spark, weights), "n", budget=100, bucket_width=8)
    b = pack_sequences(
        _docs(spark, weights), "n", budget=100, bucket_width=100000
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_pack_rejects_bad_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(_docs(spark, [1]), "n", budget=0)


def test_pack_no_single_partition_corpus_window(spark):
    # the only unpartitioned window must consume the bucket AGGREGATE,
    # not the corpus: with bucket_width=32 over 500 docs the plan's
    # Window over an empty partition spec sits above an Aggregate.
    # Structural check on the optimized plan: a Window line prints
    # `Window [exprs], [partitionSpec], [orderSpec]` — three bracket
    # groups when partitioned, two when the partition spec is empty.
    packed = pack_sequences(
        _docs(spark, [5] * 500), "n", budget=64, bucket_width=32
    )
    lines = (
        packed._jdf.queryExecution().optimizedPlan().toString().splitlines()
    )
    wins = [
        (i, ln, re.findall(r"\[[^\]]*\]", ln))
        for i, ln in enumerate(lines)
        if re.search(r"\bWindow \[", ln)
    ]
    assert len(wins) >= 2, lines
    unpart = [(i, ln) for i, ln, g in wins if len(g) == 2]
    # exactly one global window, and it aggregates the bucket TOTALS
    # (its direct child is the per-bucket Aggregate) — never the corpus
    assert len(unpart) == 1, wins
    i, ln = unpart[0]
    assert "sum(_tot" in ln, ln
    assert re.search(r"\bAggregate \[_bkt", lines[i + 1]), lines[i : i + 2]
    # every corpus-touching window is bucket-partitioned
    for _, ln, g in wins:
        if len(g) == 3:
            assert g[1].startswith("[_bkt"), ln
