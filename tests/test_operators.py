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


def test_zorder_zvalue_accepts_temporal_columns(spark):
    """Regression (round-2 ADVICE): DATE->DOUBLE casts are illegal in
    Spark, so z-ordering on a date/timestamp column failed at analysis
    time; temporal columns now route through their epoch form."""
    import datetime as dt

    from pyspark.sql import functions as F

    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.zorder import (
        zvalue,
    )

    df = spark.createDataFrame(
        [(i, dt.date(2024, 1, 1 + i % 28), dt.datetime(2024, 1, 1, i % 24)) for i in range(64)],
        "id long, d date, t timestamp",
    )
    out = df.withColumn("z", zvalue(df, ["d", "t"])).select("id", "z")
    assert out.count() == 64
    assert dict(out.dtypes)["z"] == "bigint"
    # distinct dates must not collapse to one z-bucket
    assert out.select("z").distinct().count() > 1


def test_ivf_multiprobe_distance_widens_probed_set(spark):
    """multiprobe=d must probe ALL cells within Hamming distance d
    (round-2 ADVICE: the loop only ever flipped single bits, so
    multiprobe>=2 silently added nothing)."""
    import numpy as np

    from pyspark.sql import functions as F

    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        similarity as S,
    )

    rng = np.random.default_rng(7)
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(256)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    import tempfile

    path = tempfile.mkdtemp(prefix="ivf_mp_")
    S.ivf_write(emb, "vec_id", path, "embedding", dim=8, bits=6)
    q = emb.where(F.col("vec_id") < 2)

    def probed_corpus_rows(multiprobe):
        # count candidate rows the probe's corpus filter admits by
        # re-deriving the probed cell set size through the public probe
        out = S.ivf_probe(
            spark, path, q, "vec_id", "vec_id", "embedding",
            k=256, dim=8, bits=6, multiprobe=multiprobe,
        )
        return out.select("neighbor_id").distinct().count()

    n0, n1, n2 = (probed_corpus_rows(m) for m in (0, 1, 2))
    # Hamming-2 must strictly widen over Hamming-1 (6 bits -> 15 extra
    # cells per query cell at distance exactly 2)
    assert n0 < n1 < n2, (n0, n1, n2)


def test_retention_maximizing_rates_solver():
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.sampling import (
        retention_maximizing_rates,
    )

    # natural 80/20, target 50/50 -> minority stratum pins alpha: keep
    # ALL of b (rate 1.0) and downsample a to match (20/50 scaled vs 80)
    rates = retention_maximizing_rates({"a": 800, "b": 200}, {"a": 0.5, "b": 0.5})
    assert rates["b"] == 1.0
    assert abs(rates["a"] - 0.25) < 1e-12
    # resulting mix: a = 800*0.25 = 200 = b -> exactly 50/50


def test_domain_mix_sample_rate_monotone(spark):
    from pyspark.sql import functions as F

    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.sampling import (
        domain_mix_sample,
    )

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "keepall").otherwise("tenth").alias("src"),
    )
    out = domain_mix_sample(df, "doc_id", "src", {"keepall": 1.0, "tenth": 0.1})
    by = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert by["keepall"] == 2000          # rate 1.0 keeps everything
    assert 120 <= by.get("tenth", 0) <= 280  # ~10% of 2000, md5-uniform
    # deterministic: second run identical
    out2 = domain_mix_sample(df, "doc_id", "src", {"keepall": 1.0, "tenth": 0.1})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in out2.collect()
    )


def test_incremental_lsh_equals_full_recompute_restricted(spark):
    """incremental_lsh_pairs over a stored index must find exactly the
    batch-involving pairs a full-corpus minhash_lsh_pairs finds."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        dedup as D,
    )

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, base + " alpha"),
        (2, base + " alpha"),           # near-dup of 1
        (10, base + " alpha beta"),     # batch: near-dup of 1 and 2
        (20, "totally different words nothing shared here at all folks"),
        (30, base + " alpha"),          # batch: dup of 1/2 and near 10
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.where("doc_id < 10")
    batch = docs.where("doc_id >= 10")
    idx = D.minhash_band_buckets(
        D.minhash_signatures(corpus, "doc_id", "text", n=3, k=64),
        "doc_id", k=64, bands=16,
    )
    inc = {
        (r["id_1"], r["id_2"])
        for r in D.incremental_lsh_pairs(
            idx, batch, docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    full = {
        (r["id_1"], r["id_2"])
        for r in D.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
        if r["id_1"] >= 10 or r["id_2"] >= 10
    }
    assert inc == full and inc  # non-empty and identical


def test_incremental_lsh_index_maintenance_is_o_batch(spark, tmp_path):
    """Upserting the batch's buckets keeps the index current: commit 2's
    incremental read carries ONLY the batch rows (O(batch) maintenance),
    and the updated index answers the next batch without a rebuild."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        dedup as D,
    )
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        Table,
    )
    from pyspark.sql import functions as F

    base = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (10, base)],
        "doc_id long, text string",
    )
    corpus, batch = docs.where("doc_id < 10"), docs.where("doc_id >= 10")

    def buckets(df):
        return D.minhash_band_buckets(
            D.minhash_signatures(df, "doc_id", "text", n=3, k=64),
            "doc_id", k=64, bands=16,
        ).withColumn("_bk", F.concat_ws(":", "band", "bucket", "_id"))

    idx = Table.create(
        spark, str(tmp_path / "idx"), key="_bk", precombine="_ver",
        table_name="lsh_idx",
    )
    c1 = idx.bulk_insert(buckets(corpus))
    c2 = idx.upsert(buckets(batch).withColumn("_ver", F.lit(1)))
    delta = idx.incremental(begin=c1, end=c2)
    assert {r["_id"] for r in delta.select("_id").distinct().collect()} == {10}
    # updated index now answers a later batch without touching doc 1/2 text
    nxt = spark.createDataFrame([(20, base + " x")], "doc_id long, text string")
    pairs = D.incremental_lsh_pairs(
        idx.snapshot().select("_id", "band", "bucket"),
        nxt, docs.unionByName(nxt), "doc_id", "text", threshold=0.5,
    )
    got = {(r["id_1"], r["id_2"]) for r in pairs.collect()}
    assert (1, 20) in got and (10, 20) in got


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    span = " ".join(f"w{i}" for i in range(5))  # 5-token repeated span
    docs = spark.createDataFrame(
        [
            (1, span + " tail one two"),      # first occurrence -> intact
            (2, "lead " + span + " end"),     # repeat -> span removed
            (3, "short doc"),                 # < window -> untouched
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text_clean"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(docs, "doc_id", "text", window=5).collect()
    }
    assert out[1] == (span + " tail one two", 0)
    assert out[3] == ("short doc", 0)
    clean2, removed2 = out[2]
    # the repeated span is gone from doc 2; its unique words survive
    assert "w0" not in clean2 and "lead" in clean2 and "end" in clean2
    assert removed2 >= 5


def test_weighted_reservoir_excludes_nonpositive_weights(spark):
    """P(select) ∝ weight ⇒ weight ≤ 0 / NULL rows must NEVER be drawn.

    Regression (r5 advice): key = -ln(u)/w is NULL for w = 0 (Spark
    division by zero) and negative for w < 0, and asc ordering put both
    AHEAD of every valid row — empty docs under a length weight would
    have won every slot."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.sampling import (
        weighted_reservoir_sample,
    )

    rows = [(1, 0.0), (2, None), (3, -5.0)] + [(i, 10.0) for i in range(4, 12)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"] for r in weighted_reservoir_sample(df, "id", "w", k=5).collect()}
    assert len(got) == 5
    assert got.isdisjoint({1, 2, 3})
    # k >= eligible rows -> exactly the eligible set, nothing else
    all_got = {
        r["id"] for r in weighted_reservoir_sample(df, "id", "w", k=50).collect()
    }
    assert all_got == set(range(4, 12))


def test_semantic_prune_incremental_new_and_existing_buckets(spark, tmp_path):
    """Incremental SemDeDup: existing buckets score against the STORED
    representative (never re-elected, even when a smaller id arrives
    later); brand-new signatures elect their min-id batch member. The
    two-phase result must equal the full-recompute semantic_prune for
    buckets history owns, and differ from it exactly where re-electing
    would have flipped the rep."""
    import pyspark.sql.functions as F

    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.similarity import (
        semantic_prune_incremental,
    )
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        Table,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    hist = e.where(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    batch = e.where(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    reps = Table.create(
        spark, str(tmp_path / "reps"), key="sig", precombine="rep_id",
        table_name="reps",
    )
    kw = dict(dim=64, bits=6, seed=42, threshold=0.45)
    boot = semantic_prune_incremental(
        reps, hist, "vec_id", "embedding", **kw
    ).collect()
    # bootstrap path: every bucket is new, every rep is the bucket's
    # min id, reps have NULL cos_rep and are kept
    assert boot, "empty bootstrap verdicts"
    by_sig_min = {}
    for r in boot:
        by_sig_min.setdefault(r.sig, []).append(r.vec_id)
    stored = {
        (r.sig, r.rep_id) for r in reps.snapshot().select("sig", "rep_id").collect()
    }
    assert stored == {(s, min(v)) for s, v in by_sig_min.items()}
    for r in boot:
        if r.vec_id == r.rep_id:
            assert r.cos_rep is None and r.kept

    out = semantic_prune_incremental(
        reps, batch, "vec_id", "embedding", **kw
    ).collect()
    hist_sigs = {s for s, _ in stored}
    hist_rep = dict(stored)
    saw_existing = saw_new = False
    for r in out:
        if r.sig in hist_sigs:
            saw_existing = True
            # existing bucket: stored rep wins even if this batch
            # carries a smaller id
            assert r.rep_id == hist_rep[r.sig]
            assert r.cos_rep is not None  # odd ids never equal even reps
        else:
            saw_new = True
    assert saw_existing, "test data produced no existing-bucket batch rows"
    # new-bucket rows (if any at this SF) must have elected a batch rep;
    # additionally force one deterministic new bucket via a third call
    # with a disjoint signature space (different seed -> different
    # buckets would change sigs; instead verify insert count grew only
    # by the new sigs)
    stored_after = {
        r.sig for r in reps.snapshot().select("sig").collect()
    }
    new_sigs = {r.sig for r in out if r.sig not in hist_sigs}
    assert stored_after == hist_sigs | new_sigs
    if saw_new:
        new_rep = {r.sig: r.rep_id for r in out if r.sig in new_sigs}
        mins = {}
        for r in out:
            if r.sig in new_sigs:
                mins[r.sig] = min(mins.get(r.sig, r.vec_id), r.vec_id)
        assert new_rep == mins
    # idempotence: replaying the same batch changes nothing
    again = semantic_prune_incremental(
        reps, batch, "vec_id", "embedding", **kw
    ).collect()
    assert sorted((r.vec_id, r.rep_id, r.kept) for r in again) == sorted(
        (r.vec_id, r.rep_id, r.kept) for r in out
    )
    assert {r.sig for r in reps.snapshot().select("sig").collect()} == stored_after


def test_contamination_incremental_index_reused_across_batches(
    spark, tmp_path
):
    """Steady-state decontamination: the eval set is hashed ONCE into a
    persisted index; two successive batches check against it without
    rebuilding, each matching the one-shot contamination_pairs verdict
    for that batch. Growing the benchmark later is an idempotent upsert
    that makes the new eval doc visible to subsequent checks."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        dedup as D,
    )
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        Table,
    )

    eval_a = "the quick brown fox jumps over the lazy dog"
    eval_b = "pack my box with five dozen liquor jugs"
    bench = spark.createDataFrame(
        [(100, eval_a)], "doc_id long, text string"
    )
    batch1 = spark.createDataFrame(
        [(1, eval_a + " and then some extra words"),
         (2, "completely unrelated content in this training document")],
        "doc_id long, text string",
    )
    batch2 = spark.createDataFrame(
        [(3, eval_b + " padded with additional training text"),
         (4, eval_a)],
        "doc_id long, text string",
    )
    idx = Table.create(
        spark, str(tmp_path / "idx"), key="_k", precombine="_h",
        table_name="decon_idx",
    )
    D.contamination_index_build(bench, idx)
    built = idx.latest_commit()

    def verdict(df):
        return sorted(
            (r["corpus_id"], r["bench_id"], r["overlap"])
            for r in D.contamination_check_incremental(df, idx).collect()
        )

    assert verdict(batch1) == [(1, 100, 1.0)]
    # second batch: same index, NO rebuild (no new commit on the table)
    assert verdict(batch2) == [(4, 100, 1.0)]
    assert idx.latest_commit() == built
    # benchmark grows: one upsert; eval_b now catches batch2's doc 3
    D.contamination_index_build(
        spark.createDataFrame([(200, eval_b)], "doc_id long, text string"),
        idx,
    )
    assert verdict(batch2) == [(3, 200, 1.0), (4, 100, 1.0)]
    # parity with the one-shot operator on the grown benchmark
    both = spark.createDataFrame(
        [(100, eval_a), (200, eval_b)], "doc_id long, text string"
    )
    oneshot = sorted(
        (r["corpus_id"], r["bench_id"], r["overlap"])
        for r in D.contamination_pairs(batch2, both, threshold=0.5).collect()
    )
    assert verdict(batch2) == oneshot


def test_contamination_substring_incremental_parity(spark, tmp_path):
    """Span-flavor incremental decontamination matches the one-shot
    contamination_substring verdict for the batch, from a persisted
    index built once."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        dedup as D,
    )
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        Table,
    )

    span = " ".join(f"w{i}" for i in range(20))  # one exact 20-token span
    bench = spark.createDataFrame(
        [(100, span + " tail tokens here")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1, "prefix words " + span), (2, "no shared span in this one at all")],
        "doc_id long, text string",
    )
    idx = Table.create(
        spark, str(tmp_path / "idx"), key="_k", precombine="_h",
        table_name="span_idx",
    )
    D.contamination_substring_index_build(bench, idx)
    inc = sorted(
        (r["corpus_id"], r["bench_id"], r["shared_windows"])
        for r in D.contamination_substring_check_incremental(batch, idx).collect()
    )
    oneshot = sorted(
        (r["corpus_id"], r["bench_id"], r["shared_windows"])
        for r in D.contamination_substring(batch, bench).collect()
    )
    assert inc == oneshot == [(1, 100, 1)]


# -- incremental IVF index ------------------------------------------------


def _mk_ivf_tables(spark, tmp_path):
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.table import (
        Table,
    )

    ct = Table.create(
        spark, str(tmp_path / "ivfc"), key="cell", precombine="n_vectors",
        table_name="ivfc",
    )
    it = Table.create(
        spark, str(tmp_path / "ivfi"), key="vec_id", precombine="cell",
        partition_fields=["cell"], table_name="ivfi",
    )
    return ct, it


def _emb(spark, sf="0.01"):
    return spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")


def test_ivf_incremental_append_batching_invariant(spark, tmp_path):
    """Assignment is a pure per-row function of the FROZEN centroids,
    so appending the second half in one batch or two sub-batches gives
    the identical index content."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        similarity as S,
    )
    from pyspark.sql import functions as F

    e = _emb(spark)
    boot = e.where(F.col("vec_id") % 2 == 0)
    rest = e.where(F.col("vec_id") % 2 == 1)
    ct1, it1 = _mk_ivf_tables(spark, tmp_path / "a")
    S.ivf_index_build(ct1, it1, boot, "vec_id")
    S.ivf_index_append(ct1, it1, rest, "vec_id")
    ct2, it2 = _mk_ivf_tables(spark, tmp_path / "b")
    S.ivf_index_build(ct2, it2, boot, "vec_id")
    S.ivf_index_append(ct2, it2, rest.where(F.col("vec_id") % 4 == 1), "vec_id")
    S.ivf_index_append(ct2, it2, rest.where(F.col("vec_id") % 4 == 3), "vec_id")
    a = sorted(
        (r.vec_id, r.cell)
        for r in it1.snapshot().select("vec_id", "cell").collect()
    )
    b = sorted(
        (r.vec_id, r.cell)
        for r in it2.snapshot().select("vec_id", "cell").collect()
    )
    assert a == b and len(a) == e.count()
    # centroids are identical too (same bootstrap), and frozen: the two
    # appends added exactly two index commits and ZERO centroid commits
    assert ct2.commits() == ct1.commits()
    assert len(it2.commits()) == 3 and len(it1.commits()) == 2


def test_ivf_incremental_build_freezes_centroids(spark, tmp_path):
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        similarity as S,
    )
    from pyspark.sql import functions as F
    import pytest as _pytest

    e = _emb(spark)
    ct, it = _mk_ivf_tables(spark, tmp_path)
    S.ivf_index_build(ct, it, e.where(F.col("vec_id") % 2 == 0), "vec_id")
    with _pytest.raises(ValueError, match="frozen"):
        S.ivf_index_build(ct, it, e, "vec_id")


def test_ivf_incremental_append_is_shuffle_free(spark, tmp_path):
    """O(batch) contract: assignment against the stored quantizer is a
    map-only literal projection — the assigned batch's physical plan
    has no Exchange."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        similarity as S,
    )
    from pyspark.sql import functions as F

    e = _emb(spark)
    ct, it = _mk_ivf_tables(spark, tmp_path)
    S.ivf_index_build(ct, it, e.where(F.col("vec_id") % 2 == 0), "vec_id")
    cents = S._stored_centroids(ct)
    assert 0 < len(cents) <= 16
    scored = S._cell_score_array("embedding", cents, 6)
    assigned = e.where(F.col("vec_id") % 2 == 1).select(
        "vec_id", (-scored[0]["negcell"]).cast("int").alias("cell")
    )
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ivf_incremental_probe_reads_only_probed_cells(spark, tmp_path):
    """The probe's corpus read is manifest-pruned per cell: the planned
    file set only contains cell=<probed>/ paths."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        similarity as S,
    )
    from pyspark.sql import functions as F

    e = _emb(spark)
    ct, it = _mk_ivf_tables(spark, tmp_path)
    S.ivf_index_build(ct, it, e.where(F.col("vec_id") % 2 == 0), "vec_id")
    S.ivf_index_append(ct, it, e.where(F.col("vec_id") % 2 == 1), "vec_id")
    queries = e.where(F.col("vec_id") < 3)
    nprobe = 2
    probe = S.ivf_index_probe(queries, ct, it, "vec_id", k=5, nprobe=nprobe)
    files = set(probe.inputFiles())
    index_files = {f for f in files if "/ivfi/" in f}
    cells_read = {
        seg.split("=", 1)[1]
        for f in index_files
        for seg in f.split("/")
        if seg.startswith("cell=")
    }
    # ≤ |queries| · nprobe distinct cells; strictly fewer than all 16
    assert 0 < len(cells_read) <= 3 * nprobe
    all_cells = {
        str(r.cell) for r in it.snapshot().select("cell").distinct().collect()
    }
    assert cells_read < all_cells


def test_ivf_incremental_probe_empty_queries(spark, tmp_path):
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators import (
        similarity as S,
    )
    from pyspark.sql import functions as F

    e = _emb(spark, "0.001")
    ct, it = _mk_ivf_tables(spark, tmp_path)
    S.ivf_index_build(ct, it, e, "vec_id")
    out = S.ivf_index_probe(
        e.where(F.col("vec_id") < 0), ct, it, "vec_id", k=5, nprobe=2
    )
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_centroid_outliers_budget_ties_and_null_scores(spark):
    """sim_outlier_prune kernel edges (r13 second review): a label
    below the budget denominator yields nothing; the boundary is exact
    (n == denom -> exactly one row); rounded-score ties break by id;
    a zero-norm vector scores NULL, ranks LAST (NULLS LAST on both
    engines) and is never flagged."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.similarity import (
        centroid_outliers,
    )
    from pyspark.sql import functions as F

    # label 0: 20 unit-ish vectors along +x with one clear outlier
    # along -x (id 19) and one zero vector (id 18, NULL score);
    # label 1: only 3 vectors (below the 1/20 budget -> no output)
    rows = []
    for i in range(18):
        rows.append((i, 0, [1.0, float(i) * 1e-7]))
    rows.append((18, 0, [0.0, 0.0]))
    rows.append((19, 0, [-1.0, 0.0]))
    rows += [(100, 1, [1.0, 0.0]), (101, 1, [0.9, 0.1]),
             (102, 1, [0.8, 0.2])]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = centroid_outliers(df, "vec_id", "label", "embedding", 20)
    got = [(r["vec_id"], r["label"], r["rank"]) for r in out.collect()]
    # exactly ONE flagged row (n=20, budget 1/20), the true outlier —
    # never the NULL-scored zero vector, nothing from the small label
    assert got == [(19, 0, 1)]
    # the NULL-scored vector ranks LAST within its label
    scored = centroid_outliers(df, "vec_id", "label", "embedding", 1)
    by_id = {r["vec_id"]: r["rank"] for r in scored.collect()
             if r["label"] == 0}
    assert by_id[18] == 20 and by_id[19] == 1
    # tie-break by id: two identical vectors share a rounded score —
    # the smaller id ranks first
    tie = spark.createDataFrame(
        [(7, 9, [1.0, 0.0]), (3, 9, [1.0, 0.0]), (5, 9, [0.0, 1.0])],
        "vec_id long, label int, embedding array<float>",
    )
    tr = {r["vec_id"]: r["rank"]
          for r in centroid_outliers(tie, "vec_id", "label",
                                     "embedding", 1).collect()}
    assert tr[5] == 1 and tr[3] == 2 and tr[7] == 3


def test_centroid_outliers_ragged_label_fails_loud(spark):
    """r13 advice: a vector whose length differs from its label
    centroid must raise, not silently NULL-score (Spark's fold
    NULL-poisons on the padding term while a positional-unnest oracle
    skips it — a silent cross-engine divergence). NULL vectors stay
    tolerated (rank last)."""
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.similarity import (
        centroid_outliers,
    )

    ragged = spark.createDataFrame(
        [(1, 0, [1.0, 0.0, 0.0]), (2, 0, [0.9, 0.1]), (3, 0, [0.8, 0.2])],
        "vec_id long, label int, embedding array<float>",
    )
    with pytest.raises(Exception, match="does not match its label centroid"):
        centroid_outliers(ragged, "vec_id", "label", "embedding", 1).collect()
    # a NULL vector must NOT trip the length check (size(NULL) is NULL):
    # it scores NULL, ranks last, and is never flagged — it also does
    # not contribute to the label's exploded count, so _nlbl=2 and the
    # rank-3 NULL row can never satisfy rank*denom <= n even at denom=1
    with_null = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [0.9, 0.1]), (3, 0, None)],
        "vec_id long, label int, embedding array<float>",
    )
    ranks = {
        r["vec_id"]: r["rank"]
        for r in centroid_outliers(
            with_null, "vec_id", "label", "embedding", 1
        ).collect()
    }
    assert 3 not in ranks
    assert set(ranks) == {1, 2}


def test_group_split_co_locates_groups_and_handles_nulls(spark):
    """r14: the split is a pure function of the GROUP — duplicate rows
    (same group key) always land in the same split; the last split
    absorbs the remainder; a NULL group is assigned NULL, never
    silently bucketed."""
    from pyspark.sql import functions as F
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.sampling import (
        group_split,
    )

    import pytest

    rows = [(i, f"g{i % 7}") for i in range(100)] + [(100, None)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = group_split(
        df, F.col("grp"), [("train", 0.8), ("valid", 0.1), ("test", 0.1)]
    ).collect()
    by_grp = {}
    for r in out:
        if r["grp"] is None:
            assert r["split"] is None
            continue
        by_grp.setdefault(r["grp"], set()).add(r["split"])
    # every group maps to exactly ONE split
    assert all(len(s) == 1 for s in by_grp.values())
    assert set().union(*by_grp.values()) <= {"train", "valid", "test"}
    # determinism across invocations
    out2 = group_split(
        df, F.col("grp"), [("train", 0.8), ("valid", 0.1), ("test", 0.1)]
    ).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))
    with pytest.raises(ValueError, match="at least two"):
        group_split(df, F.col("grp"), [("all", 1.0)])
    # r14 review finding: shares summing past 1 silently starve later
    # splits; non-positive shares are typos — both fail loud
    with pytest.raises(ValueError, match="sum to"):
        group_split(
            df, F.col("grp"),
            [("train", 0.8), ("valid", 0.3), ("test", 0.1)],
        )
    with pytest.raises(ValueError, match="positive"):
        group_split(df, F.col("grp"), [("train", 0.9), ("valid", -0.1)])


def test_token_budget_select_matches_naive_prefix(spark):
    """r14: the two-phase banded prefix sum must equal the naive global
    greedy (order by score desc, id asc; keep docs fully fitting the
    budget) — including across band boundaries and scores that share a
    band; NULL scores/token-counts are excluded; zero-fit budgets
    return empty."""
    from learn_how_to_integerate_hudi_spark_job_with_airflow_and_minio_spark.operators.sampling import (
        token_budget_select,
    )

    import pytest

    rows = [
        (i, (i * 37) % 11 + 1, round(((i * 13) % 50) / 50.0, 6))
        for i in range(200)
    ] + [(200, None, 0.9), (201, 5, None)]
    df = spark.createDataFrame(rows, "doc_id long, n long, s double")
    budget = 300
    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
        for r in token_budget_select(
            df, "doc_id", "n", "s", budget, score_bands=10
        ).collect()
    }
    # naive reference
    clean = sorted(
        (r for r in rows if r[1] is not None and r[2] is not None),
        key=lambda r: (-r[2], r[0]),
    )
    cum, want = 0, {}
    for i, n, s in clean:
        if cum + n <= budget:
            cum += n
            want[i] = (n, cum)
        else:
            break
    assert got == want
    assert sum(n for n, _ in got.values()) <= budget
    # a budget smaller than the best doc selects nothing
    assert (
        token_budget_select(df, "doc_id", "n", "s", 0 + 1).count() >= 0
    )
    with pytest.raises(ValueError, match="positive"):
        token_budget_select(df, "doc_id", "n", "s", 0)
