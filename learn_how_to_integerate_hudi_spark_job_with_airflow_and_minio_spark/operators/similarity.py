"""Similarity search over embedding columns (north-star extension
mandate — SURVEY §2.5/§7 item 6).

Embeddings are plain ``array<float>`` columns; all vector math is
built-in higher-order functions (``zip_with`` + ``aggregate``) — JVM
expressions, no Python boundary, codegen-friendly.

Two search paths:

- **brute-force top-k** — the exactness baseline: broadcast the (small)
  query set against the corpus, score every pair, per-query window
  top-k. The corpus scan is map-only; cost O(|Q|·N) — right up to a few
  thousand queries at any corpus size.
- **LSH-bucketed ANN** (random hyperplanes) — the scale path: b-bit
  signatures from fixed seeded hyperplanes, candidates = signature
  (prefix) collisions, exact re-score within candidates. Probing
  neighboring buckets trades recall for cost. An IVF-style layout falls
  out of the same signature: partition/cluster the corpus by signature
  so a probe touches a bounded number of cells (see ``ivf_cells``).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double (left-fold — deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors per query (self-matches excluded).

    ``round_digits`` rounds the score before ranking so rank order is
    reproducible across engines/runs; ties broken by neighbor id.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    score = cosine(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", score.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Fixed seeded random hyperplanes (driver-side constants, broadcast
    into the plan as literals — no state to ship)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)
    ]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec · plane_i)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def _table_signatures(
    df: DataFrame, id_alias: str, id_col: str, vec_col: str,
    dim: int, bits: int, tables: int, seed: int, keep_vec: str,
) -> DataFrame:
    """(id, vec, table, sig) — one row per (vector, hash table)."""
    out = df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(keep_vec),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_signature(
                            F.col(vec_col), hyperplanes(dim, bits, seed + 1000 * t)
                        ).alias("sig"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("ts"),
    )
    return out.select(id_alias, keep_vec, "ts.table", "ts.sig")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    round_digits: int | None = 6,
) -> DataFrame:
    """Multi-table ANN top-k: ``tables`` independent b-bit signatures;
    candidates = vectors colliding with the query in ANY table (the
    standard L-table LSH recall lever); exact cosine re-score + window
    top-k over the candidate set only.

    Expected candidate fraction ≈ 1-(1-2^-bits)^tables of the corpus —
    bits and tables tune the recall/cost point; recall vs brute force is
    measured in pytest.
    """
    q = _table_signatures(
        queries, "query_id", query_id, vec_col, dim, bits, tables, seed, "_qv"
    )
    c = _table_signatures(
        corpus, "neighbor_id", corpus_id, vec_col, dim, bits, tables, seed, "_cv"
    )
    # candidate ids first (narrow distinct), vectors re-joined after —
    # never hash/shuffle float arrays for the dedup
    cand = (
        c.select("neighbor_id", "table", "sig")
        .join(F.broadcast(q.select("query_id", "table", "sig")), ["table", "sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # collide in ≥1 table → single candidate row
    )
    qv = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    score = cosine(F.col("_qv"), F.col("_cv"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", score.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k
    )


def matmul_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 6,
) -> DataFrame:
    """BLAS brute-force top-k: the *fast* exact path when the query set
    fits in memory. The query matrix (|Q|×d float64) ships to executors
    as a broadcast variable; each Arrow batch of corpus vectors computes
    one GEMM (batch×d @ d×|Q|) and emits its per-query candidates; a
    final window keeps the global top-k.

    Complexity identical to ``brute_force_topk`` but ~vectorized-BLAS
    constant factors; scores are rounded before ranking so the GEMM's
    blocked summation and the expression fold agree.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(
        F.col(query_id).alias("qid"), F.col(vec_col).alias("v")
    ).collect()
    q_ids = np.array([r["qid"] for r in q_rows])
    q_mat = np.array([r["v"] for r in q_rows], dtype=np.float64)
    # zero-norm guard: score 0.0 (matches the expression-fold path) instead
    # of NaN/inf from a 0-division inside the GEMM
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm = np.where(q_norm == 0, 1.0, q_norm)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norm))

    def score_batches(batches):
        ids, mat, norms = bq.value
        for pdf in batches:
            c_mat = np.array(list(pdf["_cv"]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            c_norm = np.where(c_norm == 0, 1.0, c_norm)
            sims = (c_mat @ mat.T) / np.outer(c_norm, norms)
            if round_digits is not None:
                sims = np.round(sims, round_digits)
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.tile(ids, n_c),
                    "neighbor_id": np.repeat(pdf["neighbor_id"].to_numpy(), n_q),
                    "cosine": sims.reshape(-1),
                }
            )

    # derive id field types from the inputs — string/uuid ids must survive
    # the Arrow round-trip, not be coerced to a hardcoded long
    q_id_type = queries.schema[query_id].dataType.simpleString()
    c_id_type = corpus.schema[corpus_id].dataType.simpleString()
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = c.mapInPandas(
        score_batches,
        schema=f"query_id {q_id_type}, neighbor_id {c_id_type}, cosine double",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= k
    )


def ivf_cells(
    corpus: DataFrame,
    corpus_id: str,
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style coarse partitioning: cell id = LSH signature. Writing
    the corpus partitioned by ``cell`` gives probe-time partition pruning
    (scan 1/2^bits of the data per probe, more with multi-probe)."""
    planes = hyperplanes(dim, bits, seed)
    return corpus.select(
        F.col(corpus_id),
        F.col(vec_col),
        lsh_signature(F.col(vec_col), planes).alias("cell"),
    )


def ivf_write(
    corpus: DataFrame,
    corpus_id: str,
    path: str,
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 4,
    seed: int = 42,
) -> str:
    """Materialize the corpus as an IVF index: parquet partitioned by
    ``cell=<signature>/`` (hive-style). At 100 TB this is the layout that
    makes ANN probes cheap: a probe reads only the matched cell
    directories — partition pruning happens before any file I/O, scanning
    ~(probed cells)/2^bits of the corpus."""
    cells = ivf_cells(corpus, corpus_id, vec_col, dim=dim, bits=bits, seed=seed)
    cells.write.partitionBy("cell").mode("overwrite").parquet(path)
    return path


def ivf_probe(
    spark,
    path: str,
    queries: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    bits: int = 4,
    seed: int = 42,
    multiprobe: int = 1,
    round_digits: int | None = 6,
) -> DataFrame:
    """Probe an :func:`ivf_write` index: read ONLY the query cells
    (+ all Hamming-``multiprobe`` neighbor cells for recall), then exact
    re-score within the probed subset.

    The cell filter is a partition-column predicate, so Catalyst prunes
    the non-matching ``cell=.../`` directories at planning time —
    verified via ``inputFiles()`` in tests."""
    planes = hyperplanes(dim, bits, seed)
    q_cells = (
        queries.select(lsh_signature(F.col(vec_col), planes).alias("cell"))
        .distinct()
        .collect()
    )
    from itertools import combinations

    probed: set[int] = set()
    for r in q_cells:
        base = int(r["cell"])
        probed.add(base)
        # every cell within Hamming distance ``multiprobe`` of the query
        # cell: flip each subset of up to ``multiprobe`` bit positions
        for d in range(1, min(multiprobe, bits) + 1):
            for flips in combinations(range(bits), d):
                mask = 0
                for b in flips:
                    mask |= 1 << b
                probed.add(base ^ mask)
    corpus = spark.read.parquet(path).where(
        F.col("cell").isin(sorted(probed))
    ).drop("cell")
    return brute_force_topk(
        queries, corpus, query_id, corpus_id, vec_col, k=k, round_digits=round_digits
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.45,
    round_digits: int | None = 6,
) -> DataFrame:
    """Embedding near-dup pairs: all (id_1 < id_2) with cosine ≥ τ.

    Brute self-join — the EXACT VERIFICATION BASELINE only (it is the
    ground truth :func:`embedding_lsh_pairs` recall is measured
    against). Production dedup at scale must use
    :func:`embedding_lsh_pairs`: this plan is O(N²) in the corpus.
    """
    a = df.select(F.col(id_col).alias("id_1"), F.col(vec_col).alias("_v1"))
    b = df.select(F.col(id_col).alias("id_2"), F.col(vec_col).alias("_v2"))
    score = cosine(F.col("_v1"), F.col("_v2"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        a.crossJoin(b)
        .where(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", score.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.45,
    dim: int = 64,
    bits: int = 4,
    tables: int = 8,
    seed: int = 42,
    round_digits: int | None = 6,
) -> DataFrame:
    """Bucketed embedding near-dup pairs — the scale path for corpus
    self-dedup, replacing :func:`cosine_pairs`'s all-pairs scan.

    Exactly the MinHash-LSH shape (``dedup.minhash_lsh_pairs``) applied
    to random-hyperplane signatures: ``tables`` independent ``bits``-bit
    signatures per vector; candidates = id pairs colliding in ANY table
    (one equi-self-join on ``(table, sig)`` — 8-byte keys, never vector
    payloads); narrow ``distinct`` on the id pair; exact cosine re-score
    of candidates only, then the τ filter.

    Cost is O(Σ bucket² · tables) instead of O(N²): with b bits the
    expected bucket holds N/2^b vectors, so candidate volume is
    ~N²·L/2^b — tune ``bits`` up as the corpus grows (each extra bit
    halves candidates; each extra table adds recall). For a pair at
    cosine θ the per-bit collision probability is 1−arccos(θ)/π, so
    recall = 1−(1−p^bits)^tables — measured against the exact baseline
    in ``tests/test_similarity.py``.
    """
    s = _table_signatures(
        df, "_id", id_col, vec_col, dim, bits, tables, seed, "_v"
    ).select("_id", "table", "sig")
    a, b = s.alias("a"), s.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_1"), F.col("b._id").alias("id_2"))
        .distinct()
    )
    v1 = df.select(F.col(id_col).alias("id_1"), F.col(vec_col).alias("_v1"))
    v2 = df.select(F.col(id_col).alias("id_2"), F.col(vec_col).alias("_v2"))
    score = cosine(F.col("_v1"), F.col("_v2"))
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (
        cand.join(v1, "id_1")
        .join(v2, "id_2")
        .select("id_1", "id_2", score.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def quantization_scales(df: DataFrame, vec_col: str) -> list[float]:
    """Per-dimension symmetric int8 scale: max |x| over the corpus.

    One partial-aggregatable max per dimension (the posexplode is
    map-side narrow; the shuffle carries |dim| cells). At 100 TB this
    is computed once per corpus build and stored with the index — the
    64-float result is driver-side by design, like the seeded
    hyperplane literals.

    Raises ``ValueError`` on an empty corpus / all-null vector column —
    there is no dimensionality to index (the old ``max()`` of an empty
    collect crashed unhelpfully, r5 advice)."""
    rows = (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("x").cast("double"))).alias("s"))
        .collect()
    )
    if not rows:
        raise ValueError(
            f"quantization_scales: no vectors to index — {vec_col!r} is "
            "empty or all-NULL in the corpus"
        )
    scales = [1.0] * (max(r["pos"] for r in rows) + 1)
    for r in rows:
        scales[r["pos"]] = r["s"] if (r["s"] or 0.0) > 0 else 1.0
    return scales


def quantize_vec(vec: Column, scales: list[float]) -> Column:
    """array<float> → array<long> int8 codes: round(x/s_d * 127).

    round() halves go away-from-zero in Spark AND DuckDB, so codes are
    cross-engine exact; 4× smaller than float32, and the score loop
    becomes integer multiply-adds (SIMD-able on any engine)."""
    lits = F.array(*[F.lit(float(s)) for s in scales])
    return F.zip_with(
        vec,
        lits,
        lambda x, s: F.round(x.cast("double") / s * 127.0).cast("long"),
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 15,
) -> DataFrame:
    """Scalar-quantized ANN: int8 dot-product shortlist → exact cosine
    re-rank of the shortlist only.

    The 100 TB shape: the corpus is stored quantized (4× less IO/memory,
    integer dot products), the broadcast query set scans it map-only,
    and the expensive float cosine touches ``shortlist`` rows per query
    instead of the corpus. Both stages are deterministic — integer
    scores exactly, re-rank on the 6-digit-rounded cosine — so the
    final top-k is reproducible cross-engine (the DuckDB oracle
    rebuilds codes, shortlist, and re-rank bit-identically)."""
    scales = quantization_scales(corpus, vec_col)

    # Quantize only vectors of the indexed dimensionality; a non-null
    # vector of any OTHER length fails LOUD per row (zip_with would
    # null-pad a longer query vector, the int8 dot would go NULL, and
    # the row would silently vanish from the shortlist — r5 advice).
    # NULL vectors are excluded up front like everywhere else in this
    # module (quantization_scales deliberately tolerates a partially-
    # null corpus — a null row has no vector to rank, it is not a
    # dimensionality bug). raise_error costs nothing unless a
    # mismatched row exists: no validation job, no extra pass.
    dim = len(scales)
    def _quantize_checked(col: Column) -> Column:
        return F.when(F.size(col) == dim, quantize_vec(col, scales)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("quantized_topk: vector of length "),
                    F.size(col).cast("string"),
                    F.lit(f" does not match the indexed dimensionality {dim}"),
                )
            )
        )

    q = queries.where(F.col(vec_col).isNotNull()).select(
        F.col(query_id).alias("query_id"),
        _quantize_checked(F.col(vec_col)).alias("_qq"),
        F.col(vec_col).alias("_qv"),
    )
    c = corpus.where(F.col(vec_col).isNotNull()).select(
        F.col(corpus_id).alias("neighbor_id"),
        _quantize_checked(F.col(vec_col)).alias("_cq"),
        F.col(vec_col).alias("_cv"),
    )
    qscore = F.aggregate(
        F.zip_with("_qq", "_cq", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_qs", qscore)
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("_qs"), F.asc("neighbor_id")
    )
    cand = scored.withColumn("_r", F.row_number().over(wq)).where(
        F.col("_r") <= shortlist
    )
    rerank = cand.withColumn(
        "cosine", F.round(cosine(F.col("_qv"), F.col("_cv")), 6)
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rerank.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def semantic_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 6,
    seed: int = 42,
    threshold: float = 0.45,
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023): partition the
    corpus into semantic clusters, keep ONE representative per cluster,
    and drop every other member whose cosine to the representative
    clears ``threshold`` — removing semantically-redundant training
    documents rather than near-literal duplicates.

    Deterministic engine-portable variant: the cluster is the corpus's
    seeded random-hyperplane LSH bucket (the paper's k-means step is
    non-deterministic; same-bucket ⇒ all ``bits`` sign agreements, a
    cosine-similarity proxy), and the representative is the bucket's
    MINIMUM id — reproducible bit-for-bit in any engine, no trained
    artifact to ship.

    Returns one row per input vector: (vec_id, sig, rep_id, cos_rep,
    kept, *other input columns) — ``cos_rep`` is NULL for
    representatives; ``kept`` is true for representatives and members
    below the threshold. Non-vector input columns pass through so a
    pipeline never re-joins its source just to recover them.

    Scale shape: signatures are map-only literal arithmetic; the per-
    bucket min is partial-aggregatable; representatives (≤ 2^bits rows)
    broadcast to both joins; the cosine touches each vector ONCE
    (member × its rep), never pairwise — O(N) total at any corpus size.
    """
    planes = hyperplanes(dim, bits, seed)
    extra = [c for c in df.columns if c not in (id_col, vec_col)]
    s = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        lsh_signature(F.col(vec_col), planes).alias("sig"),
        *extra,
    )
    reps = s.groupBy("sig").agg(F.min("vec_id").alias("rep_id"))
    rep_vecs = (
        s.join(reps, s["vec_id"] == reps["rep_id"], "left_semi")
        .select(F.col("vec_id").alias("rep_id"), F.col("_v").alias("_rv"))
    )
    cos = F.round(cosine(F.col("_v"), F.col("_rv")), round_digits)
    return (
        s.join(F.broadcast(reps), "sig")
        .join(F.broadcast(rep_vecs), "rep_id")
        .select(
            "vec_id",
            "sig",
            "rep_id",
            F.when(F.col("vec_id") != F.col("rep_id"), cos).alias("cos_rep"),
            (
                (F.col("vec_id") == F.col("rep_id")) | (cos < threshold)
            ).alias("kept"),
            *extra,
        )
    )


def semantic_prune_incremental(
    reps_table,
    batch: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 6,
    seed: int = 42,
    threshold: float = 0.45,
    round_digits: int = 6,
) -> DataFrame:
    """Steady-state :func:`semantic_prune`: prune a NEW batch against a
    PERSISTED representative index instead of re-clustering the corpus —
    the same batch-vs-index evolution :func:`incremental_lsh_pairs` is
    to ``minhash_lsh`` (`operators/dedup.py`), applied to SemDeDup.

    ``reps_table`` is an engine ``Table`` keyed by ``sig`` (precombine
    ``rep_id``) with columns ``(sig, rep_id, rep_vec)`` — the vector is
    stored WITH the rep so pruning a batch never rescans the corpus
    embedding store. Per batch: signatures are map-only arithmetic;
    members of known buckets score against the STORED representative
    (which is immutable — first writer wins, so reruns and later
    batches can never flap a bucket's rep); brand-new signatures elect
    their min-id batch member and INSERT it (anti-join insert, no
    upsert churn). O(batch) cosines, reps ≤ 2^bits rows broadcast —
    corpus size never appears in the per-batch cost.

    Returns the batch verdicts ``(vec_id, sig, rep_id, cos_rep, kept)``
    with ``cos_rep`` NULL for elected representatives, and persists the
    new representatives as one commit (none → no commit).
    """
    planes = hyperplanes(dim, bits, seed)
    s = batch.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        lsh_signature(F.col(vec_col), planes).alias("sig"),
    )
    if reps_table.latest_commit() is None:
        snap = s.select(
            "sig",
            F.col("vec_id").alias("rep_id"),
            F.col("_v").alias("rep_vec"),
        ).limit(0)
    else:
        snap = reps_table.snapshot().select("sig", "rep_id", "rep_vec")
    # The batch is scanned by the new-sig election, the rep-vec lookup,
    # and the verdict join; the signature math is deterministic literal
    # arithmetic, so re-evaluation across those branches is safe (no
    # persist needed, unlike the uuid()-style hazards the write paths
    # guard against).
    new_reps = (
        s.join(snap.select("sig"), "sig", "left_anti")
        .groupBy("sig")
        .agg(F.min("vec_id").alias("rep_id"))
    )
    # new_reps derives from s — alias both sides so the self-join's sig
    # references resolve unambiguously
    new_rep_vecs = (
        s.alias("_b")
        .join(
            new_reps.alias("_nr"),
            (F.col("_b.sig") == F.col("_nr.sig"))
            & (F.col("_b.vec_id") == F.col("_nr.rep_id")),
        )
        .select(
            F.col("_nr.sig").alias("sig"),
            F.col("_nr.rep_id").alias("rep_id"),
            F.col("_b._v").alias("rep_vec"),
        )
    )
    if not new_rep_vecs.isEmpty():
        reps_table.insert(new_rep_vecs, dedup_batch=False)
    # Verdicts read the PERSISTED state back, so the returned plan is
    # anchored to the committed reps, not the batch lineage.
    if reps_table.latest_commit() is None:
        all_reps = snap  # empty table and an empty batch
    else:
        all_reps = reps_table.snapshot().select("sig", "rep_id", "rep_vec")
    cos = F.round(cosine(F.col("_v"), F.col("rep_vec")), round_digits)
    return s.join(F.broadcast(all_reps), "sig").select(
        "vec_id",
        "sig",
        "rep_id",
        F.when(F.col("vec_id") != F.col("rep_id"), cos).alias("cos_rep"),
        ((F.col("vec_id") == F.col("rep_id")) | (cos < threshold)).alias("kept"),
    )


# -- incremental IVF index (persisted-index pattern) ----------------------
#
# The one-shot IVF (ivf_write/ivf_probe) rebuilds cells per run; the
# 100 TB serving shape is the persisted-index pattern the engine ships
# for LSH dedup, SemDeDup, and decontamination: centroids + cell
# assignments live in engine Tables, each batch pays O(batch) to join
# the stored state, and probes never touch the raw corpus store.
#
# Centroids are LEARNED ONCE from the bootstrap batch (per-LSH-cell
# quantized means — the coarse quantizer) and then FROZEN: every later
# batch assigns to the nearest stored centroid, so assignments never
# flap when the corpus grows (first-writer-wins, the same immutability
# rule semantic_prune_incremental uses for bucket representatives).
# All centroid math is quantized-integer-exact (sum of round(x*1e6) as
# BIGINT, one IEEE division) so an independent engine recomputes the
# same centroids bit-for-bit — the property the DuckDB oracle checks.

_IVF_QUANT = 1_000_000.0


def _stored_centroids(centroids_table) -> list[tuple[int, list[float]]]:
    """(cell, centroid) pairs from the persisted quantizer — a
    metadata-plane collect bounded by the cell count (≤ 2^bits rows by
    construction), never corpus data.

    Memoized on the table handle, invalidated by the latest commit id:
    centroids are frozen at build, but append paths can land new cells
    in principle, so the cache key is the commit — one snapshot collect
    per table STATE instead of one per build/append/probe call."""
    key = centroids_table.latest_commit()
    cached = getattr(centroids_table, "_ivf_centroid_cache", None)
    if cached is None or cached[0] != key:
        rows = centroids_table.snapshot().select(
            "cell", "centroid"
        ).collect()
        cached = (
            key,
            sorted((int(r["cell"]), list(r["centroid"])) for r in rows),
        )
        centroids_table._ivf_centroid_cache = cached
    # copy-on-return: callers must not be able to mutate the cached
    # centroid set in place (the vectors are lists)
    return [(cell, list(vec)) for cell, vec in cached[1]]


def _cell_score_array(
    vec_col: str, cents: list[tuple[int, list[float]]], round_digits: int
) -> Column:
    """Per-row array of struct(score, negcell) sorted DESC — score =
    rounded cosine to each stored centroid, ties broken toward the
    SMALLEST cell id (negcell descending ≡ cell ascending). The
    centroids are literal expressions, so assignment and probing are
    map-only projections: no join, no shuffle, whatever the batch
    size — the per-row cost is |cells| · dim multiply-adds inside
    whole-stage codegen.

    Expression-size discipline (the compile cost is paid per PLAN, so
    it must stay constant): the centroid set is ONE literal array of
    (cell, vector, norm) structs and the scoring lambda appears ONCE,
    applied per element by ``transform`` — r11-verdict item 8: the
    earlier shape unrolled one dot-fold subtree PER centroid, and
    whole-stage codegen of the |cells| copies dominated small-batch
    assignment (~2 s/plan at 16 cells × dim 64). Each centroid norm is
    precomputed driver-side — a plain left-to-right Python float sum,
    the same IEEE op sequence as the engine's ``dot`` fold and the
    oracle's in-order SUM, so the embedded literal is bit-identical to
    what either engine would compute — and the row vector's norm
    subtree appears ONCE, shared across cells."""
    import math

    vnorm = norm(F.col(vec_col))
    cents_arr = F.array(
        *(
            F.struct(
                F.lit(int(cell)).cast("int").alias("cell"),
                F.lit(cv).alias("c"),
                F.lit(
                    math.sqrt(sum(float(y) * float(y) for y in cv))
                ).alias("cn"),
            )
            for cell, cv in cents
        )
    )
    pairs = F.transform(
        cents_arr,
        lambda s: F.struct(
            F.round(
                dot(F.col(vec_col), s["c"]) / (vnorm * s["cn"]),
                round_digits,
            ).alias("score"),
            (-s["cell"]).cast("int").alias("negcell"),
        ),
    )
    return F.sort_array(pairs, asc=False)


def ivf_index_build(
    centroids_table,
    index_table,
    bootstrap: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 4,
    seed: int = 42,
    round_digits: int = 6,
) -> tuple[str, str]:
    """Bootstrap the persisted IVF index: learn the coarse quantizer
    from ``bootstrap`` and assign the bootstrap itself through it.

    Centroid = per-LSH-cell quantized mean (Σ round(x·1e6) as BIGINT,
    then one exact double division) — deterministic and
    cross-engine-reproducible. The centroids commit FIRST; bootstrap
    assignment then reads the PERSISTED quantizer (like every later
    append), so build-then-append and one-shot builds are pointwise
    identical. Raises if the quantizer already exists — centroids are
    frozen at build (re-clustering an incremental index would silently
    invalidate every stored assignment; create a new index instead).

    Returns (centroids_commit, index_commit).
    """
    if centroids_table.latest_commit() is not None:
        raise ValueError(
            "IVF quantizer already built — centroids are frozen; "
            "use ivf_index_append for new batches"
        )
    planes = hyperplanes(dim, bits, seed)
    cells = bootstrap.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        lsh_signature(F.col(vec_col), planes).alias("cell"),
    )
    ex = cells.select("cell", F.posexplode("_v").alias("pos", "x"))
    qs = F.round(F.col("x").cast("double") * F.lit(_IVF_QUANT)).cast("long")
    per = ex.groupBy("cell", "pos").agg(
        F.sum(qs).alias("_qs"), F.count(F.lit(1)).alias("_n")
    )
    comp = (F.col("_qs").cast("double") / (F.col("_n").cast("double") * F.lit(_IVF_QUANT))).alias("c")
    cent = per.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), comp))),
            lambda s: s["c"],
        ).alias("centroid"),
        F.first("_n").cast("long").alias("n_vectors"),
    )
    c_commit = centroids_table.bulk_insert(
        cent.select("cell", "n_vectors", "centroid")
    )
    i_commit = ivf_index_append(
        centroids_table,
        index_table,
        bootstrap,
        id_col,
        vec_col,
        round_digits=round_digits,
    )
    return c_commit, i_commit


def ivf_index_append(
    centroids_table,
    index_table,
    batch: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> str:
    """Assign a new batch to the nearest FROZEN centroid and append it
    to the index in one commit. The stored quantizer is collected
    (≤ 2^bits rows) into literal expressions, so the assignment is a
    map-only projection over the batch — O(batch) work, zero shuffle,
    corpus size absent from the cost. CALLER CONTRACT: ids must be
    unique across batches (a corpus index). Appends are pure inserts —
    the COW index table does no per-key merge at read, so a re-ingested
    id would surface twice in probe candidate sets; dedup upstream (or
    route re-ingests through ``index_table.upsert``, paying its keyed
    merge) when the source can replay."""
    cents = _stored_centroids(centroids_table)
    if not cents:
        raise ValueError("no centroids stored — run ivf_index_build first")
    scored = _cell_score_array(vec_col, cents, round_digits)
    assigned = batch.select(
        F.col(id_col).alias("vec_id"),
        (-scored[0]["negcell"]).cast("int").alias("cell"),
        F.col(vec_col).alias("embedding"),
    )
    return index_table.insert(assigned, dedup_batch=False)


def ivf_index_probe(
    queries: DataFrame,
    centroids_table,
    index_table,
    query_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """ANN top-k served ENTIRELY from the persisted index: each query
    probes its ``nprobe`` nearest frozen centroids (map-only literal
    scoring, same function as assignment), the probed cells' vectors
    are read per-cell through manifest/partition pruning (the index
    table is partitioned by ``cell`` — a probe plans only the matched
    cell directories' files, never the corpus), and candidates are
    exactly re-scored with the rounded cosine, ranked per query.

    Returns (query_id, neighbor_id, cosine, rank), rank ≤ k,
    self-matches excluded."""
    cents = _stored_centroids(centroids_table)
    if not cents:
        raise ValueError("no centroids stored — run ivf_index_build first")
    scored = _cell_score_array("_qv", cents, round_digits)
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(scored, 1, min(nprobe, len(cents))),
                lambda s: (-s["negcell"]).cast("int"),
            )
        ),
    )
    # the probed-cell SET is bounded by 2^bits — collect it and read
    # all probed cells in ONE manifest-pruned snapshot (a value-SET
    # stats filter: partition stats admit exactly the probed cell
    # directories' files). One relation instead of an nprobe-branch
    # union — same file set read, ~1/nprobe the plan size and scan
    # relations (the per-cell union paid plan+listing constants per
    # probed cell).
    probed = sorted(
        r["cell"] for r in q.select("cell").distinct().collect()
    )
    if not probed:
        # zero queries (or none with a vector): an empty result with
        # the contract schema, not a reduce() crash
        return q.sparkSession.createDataFrame(
            [],
            "query_id long, neighbor_id long, cosine double, rank int",
        )
    corpus = index_table.snapshot(filters={"cell": frozenset(probed)}).select(
        "cell",
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("_nv"),
    )
    cand = q.join(corpus, "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    score = F.round(cosine(F.col("_qv"), F.col("_nv")), round_digits)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.select("query_id", "neighbor_id", score.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def centroid_outliers(
    df: DataFrame,
    id_col: str,
    label_col: str,
    vec_col: str = "embedding",
    budget_denom: int = 20,
) -> DataFrame:
    """Per-label embedding OUTLIER pruning (corpus-cleaning op): flag
    the bottom ``1/budget_denom`` of each label's vectors by cosine to
    the label centroid — the mislabeled/noisy tail a curation pipeline
    drops before training (the budgeted complement of SemDeDup's
    near-duplicate prune, which removes the over-dense head).

    Exactness across engines: the centroid is the quantized-integer
    exact mean per (label, dim) (the ``sim_label_centroid`` kernel —
    order-independent BIGINT sums, one IEEE division), the per-vector
    cosine is the engine's left-assoc fold against that centroid array
    (the IVF literal-centroid contract), and the budget test is
    integer-scaled (``rank * denom <= n``), so no float fraction
    crosses the engine boundary.

    Scale shape (100 TB): the centroid build is a map-side posexplode
    with partial aggregation — the shuffle carries |labels|×|dim|
    cells, not rows; the scoring join broadcasts the |labels|-row
    centroid table (hint-free — AQE picks it) with the centroid NORM
    precomputed once per label (not re-folded per corpus row); the
    budget rank is one window per label (for a label-skewed corpus
    swap the exact rank for approx_percentile at the same API —
    documented trade, exactness kept here for the oracle). A NULL
    score (zero-norm or null vector) ranks LAST and is never flagged —
    outlierness of a direction-free vector is undefined, and NULLS
    LAST is also DuckDB's ASC default, so the oracle agrees. A non-null
    vector whose length differs from its label centroid fails LOUD per
    row (the quantized_topk dimensionality contract): engines disagree
    on NULL-padded dot products, so ragged labels are a corpus bug,
    not a rankable input.
    """
    ex = df.select(
        F.col(label_col).alias("_lbl"),
        F.posexplode(vec_col).alias("_pos", "_x"),
    )
    q = F.round(F.col("_x").cast("double") * 1000000.0).cast("long")
    cent = (
        ex.groupBy("_lbl", "_pos")
        .agg(F.sum(q).alias("_qs"), F.count(F.lit(1)).alias("_n"))
        .select(
            "_lbl",
            "_pos",
            (
                F.col("_qs").cast("double")
                / (F.col("_n").cast("double") * 1000000.0)
            ).alias("_c"),
            "_n",
        )
        .groupBy("_lbl")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_c"))),
                lambda s: s["_c"],
            ).alias("_cvec"),
            # max, not first: first() is nondeterministic under the
            # shuffle and the oracle takes MAX — a ragged label (one
            # short vector) must not split the budget denominator
            # across engines or runs (r13 second-review finding)
            F.max("_n").alias("_nlbl"),
        )
        .select(
            "_lbl", "_cvec", "_nlbl", norm(F.col("_cvec")).alias("_cnorm")
        )
    )
    # Ragged labels fail LOUD per row (the quantized_topk contract at
    # _quantize_checked): the engine's dot() is a left fold over
    # zip_with, so ONE null padding term (vector shorter/longer than
    # the label centroid) would poison the sum to NULL and the row
    # would silently rank last / never flag, while a positional-unnest
    # oracle SUM skips NULL terms and can flag it — a silent
    # cross-engine divergence (r13 advice). A length mismatch within a
    # label is a dimensionality bug in the corpus, not a rankable
    # vector. NULL vectors stay tolerated: no direction → NULL score →
    # ranks last, never flagged (size(NULL) is NULL, so the when-chain
    # must test nullness FIRST or the raise branch would fire).
    checked_dot = (
        F.when(F.col(vec_col).isNull(), F.lit(None).cast("double"))
        .when(
            F.size(vec_col) == F.size("_cvec"),
            dot(F.col(vec_col), F.col("_cvec")),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("centroid_outliers: vector of length "),
                    F.size(vec_col).cast("string"),
                    F.lit(" does not match its label centroid length "),
                    F.size("_cvec").cast("string"),
                )
            )
        )
    )
    scored = df.join(cent, F.col(label_col) == F.col("_lbl")).select(
        F.col(id_col),
        F.col(label_col),
        # try_divide: a zero-norm vector must score NULL (rank last,
        # never flagged — DuckDB's x/0 behavior), not raise under ANSI
        F.round(
            F.try_divide(
                checked_dot,
                norm(F.col(vec_col)) * F.col("_cnorm"),
            ),
            6,
        ).alias("cos_centroid"),
        F.col("_nlbl"),
    )
    w = Window.partitionBy(label_col).orderBy(
        F.asc_nulls_last("cos_centroid"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") * budget_denom <= F.col("_nlbl"))
        .drop("_nlbl")
    )
