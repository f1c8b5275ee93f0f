"""Driver-gated similarity-search queries (operators/similarity.py)
over ``embeddings``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..session import load_tables
from .catalog import register

_COS = """
round(
  (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
   FROM (SELECT unnest(q.embedding) x, unnest(c.embedding) y))
  / (sqrt((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
           FROM (SELECT unnest(q.embedding) x)))
     * sqrt((SELECT SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
             FROM (SELECT unnest(c.embedding) y)))),
  6)
"""


_TOPK_SQL = f"""
    SELECT query_id, neighbor_id, cosine, rank
    FROM (
        SELECT q.vec_id AS query_id,
               c.vec_id AS neighbor_id,
               {_COS}   AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_COS} DESC, c.vec_id ASC
               ) AS rank
        FROM embeddings q
        JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10
    )
    WHERE rank <= 5
"""


@register(
    "sim_topk_bruteforce",
    oracle=_TOPK_SQL,
    doc="brute-force cosine top-5 for 10 query vectors: broadcast queries "
    "× map-only corpus scan × per-query window top-k — the exactness "
    "baseline for ANN",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.where(F.col("vec_id") < 10)
    return S.brute_force_topk(
        queries, e, "vec_id", "vec_id", "embedding", k=5, round_digits=6
    )


def _duck_sig(dim: int, bits: int, seed: int) -> str:
    """DuckDB expression recomputing :func:`operators.similarity.
    lsh_signature` bit-for-bit: the hyperplanes are deterministic seeded
    literals, ``repr(float)`` round-trips exactly in both engines, and
    both sides sum the 64 products left-associatively in index order
    (Spark's ``F.aggregate`` fold ≡ a left-assoc ``+`` chain), so the
    doubles — and therefore every sign decision — are identical."""
    planes = S.hyperplanes(dim, bits, seed)
    parts = []
    for i, p in enumerate(planes):
        dot_terms = " + ".join(
            f"CAST(embedding[{j + 1}] AS DOUBLE)*{w!r}" for j, w in enumerate(p)
        )
        parts.append(f"(CASE WHEN ({dot_terms}) >= 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(parts)


_LSH_SIG_BRANCHES = "\n            UNION ALL\n".join(
    f"SELECT vec_id, {t} AS tbl, {_duck_sig(64, 4, 42 + 1000 * t)} AS sig"
    " FROM embeddings"
    for t in range(8)
)

_LSH_ANN_SQL = f"""
    WITH sig AS (
        {_LSH_SIG_BRANCHES}
    ),
    cand AS (
        SELECT DISTINCT cq.vec_id AS query_id, cc.vec_id AS neighbor_id
        FROM sig cq
        JOIN sig cc ON cq.tbl = cc.tbl AND cq.sig = cc.sig
        WHERE cq.vec_id < 10 AND cq.vec_id <> cc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT cand.query_id, cand.neighbor_id,
               {_COS} AS cosine,
               row_number() OVER (
                   PARTITION BY cand.query_id
                   ORDER BY {_COS} DESC, cand.neighbor_id ASC
               ) AS rank
        FROM cand
        JOIN embeddings q ON q.vec_id = cand.query_id
        JOIN embeddings c ON c.vec_id = cand.neighbor_id
    ) WHERE rank <= 5
"""


@register(
    "sim_lsh_ann",
    # Full cross-engine oracle (same technique as dedup_simhash): the
    # 8×4-bit hyperplane signatures are recomputed from their literal
    # coefficients inside DuckDB, the collision-candidate pair set is
    # rebuilt exactly, and candidates are re-scored/ranked with the same
    # rounded cosine — so the oracle checks signature math, candidate
    # completeness, AND the re-score path, not just row counts.
    oracle=_LSH_ANN_SQL,
    doc="multi-table LSH ANN (8 tables x 4-bit random-hyperplane "
    "signatures): exact re-score only within signature collisions — "
    "the 100 TB path; DuckDB oracle rebuilds signatures + candidates",
)
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.where(F.col("vec_id") < 10)
    return S.lsh_topk(
        queries, e, "vec_id", "vec_id", "embedding", k=5, dim=64, bits=4, tables=8
    )


@register(
    "sim_ivf_cells",
    # Exact oracle: the cell histogram is a pure function of the seeded
    # hyperplane signatures, recomputed in DuckDB from the same literals.
    oracle=f"""
        SELECT CAST(cell AS BIGINT) AS cell,
               COUNT(*) AS n_vectors,
               min(vec_id) AS min_vec_id,
               max(vec_id) AS max_vec_id
        FROM (SELECT vec_id, {_duck_sig(64, 4, 42)} AS cell FROM embeddings)
        GROUP BY cell
    """,
    doc="IVF-style coarse partitioning: LSH signature as cell id; "
    "partition-by-cell layout gives probe-time partition pruning",
)
def sim_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cells = S.ivf_cells(e, "vec_id", "embedding", dim=64, bits=4)
    return cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("vec_id").alias("min_vec_id"),
        F.max("vec_id").alias("max_vec_id"),
    )


_IVF_PROBE_SQL = f"""
    WITH cells AS (
        SELECT vec_id, {_duck_sig(64, 4, 42)} AS cell FROM embeddings
    ),
    qcells AS (SELECT DISTINCT cell FROM cells WHERE vec_id < 10),
    probed AS (
        SELECT DISTINCT xor(qcells.cell, m.m) AS cell
        FROM qcells CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8]) AS m) m
    ),
    cand AS (
        SELECT c.vec_id FROM cells c JOIN probed p ON c.cell = p.cell
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_COS} AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_COS} DESC, c.vec_id ASC
               ) AS rank
        FROM embeddings q
        JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10
          AND c.vec_id IN (SELECT vec_id FROM cand)
    ) WHERE rank <= 5
"""


@register(
    "sim_ivf_probe",
    # Deterministic ANN ⇒ exact oracle: the probed cell set (query cells
    # + all Hamming-1 neighbors, masks 0/1/2/4/8 over 4 bits) is a pure
    # function of the seeded signatures, so DuckDB rebuilds the exact
    # candidate subset and re-ranks it with the same rounded cosine.
    oracle=_IVF_PROBE_SQL,
    doc="IVF index probe: corpus written partitioned by cell "
    "(cell=<sig>/ dirs), probe reads ONLY query cells + Hamming-1 "
    "neighbors (partition pruning before I/O), exact re-score within "
    "the probed subset — the at-scale ANN serving path",
)
def sim_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    path = tempfile.mkdtemp(prefix="engine_ivf_")
    S.ivf_write(e, "vec_id", path, "embedding", dim=64, bits=4)
    queries = e.where(F.col("vec_id") < 10)
    return S.ivf_probe(
        spark, path, queries, "vec_id", "vec_id", "embedding", k=5, dim=64, bits=4
    )


@register(
    "sim_matmul_topk",
    # Exact path: scores rounded to 6 digits BEFORE ranking, so the GEMM's
    # blocked summation and DuckDB's expression fold agree bit-for-bit —
    # same oracle as the brute-force query.
    oracle=_TOPK_SQL,
    doc="BLAS brute-force top-k (broadcast query matrix + mapInPandas "
    "GEMM per Arrow batch): the vectorized exact path — same results as "
    "sim_topk_bruteforce at ~BLAS constant factors",
)
def sim_matmul_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.where(F.col("vec_id") < 10)
    return S.matmul_topk(queries, e, "vec_id", "vec_id", "embedding", k=5)


_IVF_RECALL_SQL = f"""
    WITH probe AS ({_IVF_PROBE_SQL}),
    ex AS ({_TOPK_SQL})
    SELECT p.query_id,
           round(CAST(COUNT(e.neighbor_id) AS DOUBLE) / 5, 6) AS recall_at_5,
           COUNT(e.neighbor_id) >= 4 AS recall_ge_80pct
    FROM probe p
    LEFT JOIN ex e
      ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
    GROUP BY p.query_id
"""


@register(
    "sim_ivf_recall",
    # Both sides of the recall fraction are deterministic (seeded
    # signatures ⇒ exact probe set; rounded cosine ⇒ exact top-k), so
    # the recall VALUES cross the engine boundary exactly — DuckDB
    # rebuilds the probe result and the brute-force ground truth and
    # recomputes the same per-query recall@5.
    oracle=_IVF_RECALL_SQL,
    doc="ANN quality contract: per-query recall@5 of the IVF probe "
    "(Hamming-1 multiprobe) against the brute-force ground truth, plus "
    "a >=80% contract flag — the measurement a 100 TB ANN deployment "
    "monitors; both engines compute identical recall values",
)
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    path = tempfile.mkdtemp(prefix="engine_ivf_")
    S.ivf_write(e, "vec_id", path, "embedding", dim=64, bits=4)
    queries = e.where(F.col("vec_id") < 10)
    probe = S.ivf_probe(
        spark, path, queries, "vec_id", "vec_id", "embedding", k=5, dim=64, bits=4
    )
    exact = S.brute_force_topk(
        queries, e, "vec_id", "vec_id", "embedding", k=5, round_digits=6
    ).select("query_id", "neighbor_id").withColumn("_hit", F.lit(1))
    return (
        probe.join(exact, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double") / 5, 6
            ).alias("recall_at_5"),
            (F.sum(F.coalesce(F.col("_hit"), F.lit(0))) >= 4).alias(
                "recall_ge_80pct"
            ),
        )
    )


@register(
    "sim_label_centroid",
    # Cross-engine float aggregation: a float's exact value times 1e6 is
    # never a half-integer (binary fractions have no 5s in the
    # denominator), so round(x*1e6) is unambiguous and identical in both
    # engines; the per-(label,pos) BIGINT sums are then order-independent
    # and exact (< 2^53), and the final division is one correctly-rounded
    # IEEE op. No decimal casts of doubles cross the engine boundary.
    oracle="""
        WITH ex AS (
            SELECT label,
                   unnest([{'pos': i - 1, 'x': embedding[i]}
                           for i in range(1, len(embedding) + 1)]) AS px
            FROM embeddings
        )
        SELECT label,
               CAST(px.pos AS BIGINT) AS pos,
               CAST(SUM(CAST(round(CAST(px.x AS DOUBLE) * 1000000.0) AS BIGINT))
                    AS DOUBLE) / (COUNT(*) * 1000000.0) AS centroid,
               COUNT(*) AS n_vectors
        FROM ex
        GROUP BY label, px.pos
    """,
    doc="per-label embedding centroid (class prototype / cluster mean): "
    "posexplode to (label, dim) cells, quantized-integer sums for exact "
    "cross-engine means. Scale shape: the explode is map-side narrow "
    "and partial aggregation collapses each partition to |labels|x|dim| "
    "cells before the shuffle — the shuffle carries centroids, not rows",
)
def sim_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    ex = e.select("label", F.posexplode("embedding").alias("pos", "x"))
    q = F.round(F.col("x").cast("double") * 1000000.0).cast("long")
    return (
        ex.groupBy("label", "pos")
        .agg(F.sum(q).alias("_qs"), F.count(F.lit(1)).alias("n_vectors"))
        .select(
            "label",
            F.col("pos").cast("long").alias("pos"),
            (
                F.col("_qs").cast("double")
                / (F.col("n_vectors").cast("double") * 1000000.0)
            ).alias("centroid"),
            "n_vectors",
        )
    )


_QUANT_SQL = f"""
    WITH ex AS (
        SELECT vec_id,
               unnest([{{'pos': i, 'x': embedding[i]}}
                       for i in range(1, len(embedding) + 1)]) AS px
        FROM embeddings
    ),
    scales AS (
        SELECT px.pos AS pos,
               CASE WHEN max(abs(CAST(px.x AS DOUBLE))) > 0
                    THEN max(abs(CAST(px.x AS DOUBLE))) ELSE 1.0 END AS s
        FROM ex GROUP BY px.pos
    ),
    qv AS (
        SELECT e.vec_id,
               list(CAST(round(CAST(e.px.x AS DOUBLE) / sc.s * 127.0) AS BIGINT)
                    ORDER BY e.px.pos) AS q
        FROM ex e JOIN scales sc ON e.px.pos = sc.pos
        GROUP BY e.vec_id
    ),
    scores AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               (SELECT SUM(x * y) FROM (SELECT unnest(a.q) x, unnest(b.q) y)) AS qs
        FROM qv a JOIN qv b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 10
    ),
    short AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY qs DESC, neighbor_id ASC) AS r
            FROM scores
        ) WHERE r <= 15
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT s.query_id, s.neighbor_id,
               {_COS} AS cosine,
               row_number() OVER (
                   PARTITION BY s.query_id
                   ORDER BY {_COS} DESC, s.neighbor_id ASC
               ) AS rank
        FROM short s
        JOIN embeddings q ON q.vec_id = s.query_id
        JOIN embeddings c ON c.vec_id = s.neighbor_id
    )
    WHERE rank <= 5
"""


@register(
    "sim_quantized_topk",
    # Every stage is cross-engine exact: int8 codes (round halves go
    # away-from-zero in both engines and x/s*127 is two correctly-
    # rounded IEEE ops on identical doubles), integer shortlist scores,
    # 6-digit-rounded cosine re-rank. The oracle rebuilds all three.
    oracle=_QUANT_SQL,
    doc="scalar-quantized ANN: per-dim symmetric int8 codes (4x smaller "
    "corpus, integer dot products) -> top-15 shortlist per query -> "
    "exact cosine re-rank to top-5. The memory/IO-bound scale path "
    "between brute force and IVF; deterministic end to end",
)
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.where(F.col("vec_id") < 10)
    return S.quantized_topk(
        queries, e, "vec_id", "vec_id", "embedding", k=5, shortlist=15
    )


_HARDNEG_SQL = f"""
    SELECT query_id, neighbor_id, cosine, rank
    FROM (
        SELECT q.vec_id AS query_id,
               c.vec_id AS neighbor_id,
               {_COS}   AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_COS} DESC, c.vec_id ASC
               ) AS rank
        FROM embeddings q
        JOIN embeddings c
          ON q.vec_id <> c.vec_id AND q.label <> c.label
        WHERE q.vec_id < 10
    )
    WHERE rank <= 5
"""


@register(
    "sim_hard_negatives",
    oracle=_HARDNEG_SQL,
    doc="hard-negative mining (contrastive-training prep): per query, "
    "the top-5 most-similar vectors with a DIFFERENT label — the "
    "near-boundary negatives that make embedding training converge. "
    "Same broadcast-queries x map-only corpus envelope as "
    "sim_topk_bruteforce with the label guard fused into the join "
    "condition, so mismatched pairs never reach the scorer",
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("_qlabel"),
        F.col("embedding").alias("_qv"),
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("_clabel"),
        F.col("embedding").alias("_cv"),
    )
    from pyspark.sql.window import Window

    scored = (
        corpus.join(
            F.broadcast(queries),
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("_qlabel") != F.col("_clabel")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(S.cosine(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= 5
    )


# -- incremental IVF (persisted quantizer + index tables) -----------------


def _cent_cos(emb: str) -> str:
    """DuckDB rounded cosine of ``emb`` vs the centroid row ``ct.cvec``
    — same left-to-right summation and round-6 as the engine's
    ``cosine`` fold, so every assignment/probe decision is identical."""
    return f"""
round(
  (SELECT SUM(CAST(x AS DOUBLE) * y)
   FROM (SELECT unnest({emb}) x, unnest(ct.cvec) y))
  / (sqrt((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
           FROM (SELECT unnest({emb}) x)))
     * sqrt((SELECT SUM(y * y) FROM (SELECT unnest(ct.cvec) y)))),
  6)
"""


_IVF_INC_SQL = f"""
    WITH boot AS (
        SELECT vec_id, embedding, {_duck_sig(64, 4, 42)} AS cell
        FROM embeddings WHERE vec_id % 2 = 0
    ),
    cent AS (
        SELECT cell, list(c ORDER BY pos) AS cvec FROM (
            SELECT cell, px.pos AS pos,
                   CAST(SUM(CAST(round(CAST(px.x AS DOUBLE) * 1000000.0)
                                 AS BIGINT)) AS DOUBLE)
                     / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS c
            FROM (
                SELECT cell,
                       unnest([{{'pos': i, 'x': embedding[i]}}
                               for i in range(1, len(embedding) + 1)]) AS px
                FROM boot
            )
            GROUP BY cell, px.pos
        ) GROUP BY cell
    ),
    asn AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, ct.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_cent_cos('e.embedding')} DESC, ct.cell ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN cent ct
        ) WHERE rn = 1
    ),
    pc AS (
        SELECT vec_id AS qid, cell FROM (
            SELECT q.vec_id, ct.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_cent_cos('q.embedding')} DESC, ct.cell ASC
                   ) AS rn
            FROM embeddings q CROSS JOIN cent ct
            WHERE q.vec_id < 10
        ) WHERE rn <= 4
    ),
    cand AS (
        SELECT pc.qid AS query_id, a.vec_id AS neighbor_id
        FROM pc JOIN asn a ON pc.cell = a.cell
        WHERE a.vec_id <> pc.qid
    ),
    probe AS (
        SELECT query_id, neighbor_id FROM (
            SELECT cand.query_id, cand.neighbor_id,
                   row_number() OVER (
                       PARTITION BY cand.query_id
                       ORDER BY {_COS} DESC, cand.neighbor_id ASC
                   ) AS rank
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
        ) WHERE rank <= 5
    ),
    ex AS ({_TOPK_SQL})
    SELECT p.query_id,
           round(CAST(COUNT(e.neighbor_id) AS DOUBLE) / 5, 6) AS recall_at_5,
           COUNT(e.neighbor_id) >= 4 AS recall_ge_80pct
    FROM probe p
    LEFT JOIN ex e
      ON p.query_id = e.query_id AND p.neighbor_id = e.neighbor_id
    GROUP BY p.query_id
"""


@register(
    "sim_ivf_incremental",
    # Fully deterministic pipeline ⇒ exact oracle: DuckDB relearns the
    # quantizer from the bootstrap batch (LSH cells from literal seeded
    # hyperplanes; quantized-integer centroid means — BIGINT sums, one
    # IEEE division), reassigns the WHOLE corpus to nearest centroids
    # with the same rounded cosine + cell tie-break, rebuilds the
    # nprobe=4 probe set, re-ranks candidates, and computes the same
    # per-query recall@5 vs the brute-force ground truth — checking the
    # persisted centroids, both batches' assignments, the probe, AND
    # the recall math end-to-end.
    oracle=_IVF_INC_SQL,
    doc="incremental IVF: centroids learned ONCE from the bootstrap "
    "batch and frozen in an engine Table; the second batch assigns to "
    "the nearest stored centroid as a map-only literal projection "
    "(O(batch), zero shuffle — corpus size absent from the append "
    "cost) and lands as one commit in a cell-partitioned index table; "
    "probes serve from the index alone, reading ONLY the probed "
    "cells' files via manifest partition stats — the persisted-index "
    "serving shape (LSH r5 / SemDeDup r7 / decontamination r8) "
    "completed for ANN",
)
def sim_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..table import Table

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    boot = e.where(F.col("vec_id") % 2 == 0)
    batch2 = e.where(F.col("vec_id") % 2 == 1)
    ct = Table.create(
        spark, tempfile.mkdtemp(prefix="engine_ivfc_"),
        key="cell", precombine="n_vectors", table_name="ivf_centroids",
    )
    it = Table.create(
        spark, tempfile.mkdtemp(prefix="engine_ivfi_"),
        key="vec_id", precombine="cell", partition_fields=["cell"],
        table_name="ivf_index",
    )
    S.ivf_index_build(ct, it, boot, "vec_id", "embedding", dim=64, bits=4, seed=42)
    S.ivf_index_append(ct, it, batch2, "vec_id", "embedding")
    probe = S.ivf_index_probe(
        e.where(F.col("vec_id") < 10), ct, it, "vec_id", "embedding",
        k=5, nprobe=4,
    )
    exact = (
        S.brute_force_topk(
            e.where(F.col("vec_id") < 10), e, "vec_id", "vec_id",
            "embedding", k=5, round_digits=6,
        )
        .select("query_id", "neighbor_id")
        .withColumn("_hit", F.lit(1))
    )
    return (
        probe.join(exact, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("double") / 5, 6
            ).alias("recall_at_5"),
            (F.sum(F.coalesce(F.col("_hit"), F.lit(0))) >= 4).alias(
                "recall_ge_80pct"
            ),
        )
    )


@register(
    "sim_outlier_prune",
    # Exactness contract, piece by piece: the centroid is the
    # quantized-integer exact mean (order-independent BIGINT sums per
    # (label, dim), one IEEE division — the sim_label_centroid proof),
    # the cosine folds the same doubles in the same index order on both
    # engines (ordered unnest ≡ Spark's left-assoc F.aggregate fold,
    # the sim_ivf _cent_cos contract) and rounds to 6dp, and the 5%
    # budget is integer-scaled (rank*20 <= n) — no float fraction
    # crosses the engine boundary.
    oracle="""
        WITH ex AS (
            SELECT label,
                   unnest([{'pos': i - 1, 'x': embedding[i]}
                           for i in range(1, len(embedding) + 1)]) AS px
            FROM embeddings
        ),
        cent AS (
            SELECT label, px.pos AS pos,
                   CAST(SUM(CAST(round(CAST(px.x AS DOUBLE) * 1000000.0)
                                 AS BIGINT)) AS DOUBLE)
                   / (COUNT(*) * 1000000.0) AS c,
                   COUNT(*) AS n
            FROM ex GROUP BY label, px.pos
        ),
        ct AS (
            SELECT label, list(c ORDER BY pos) AS cvec, MAX(n) AS nlbl
            FROM cent GROUP BY label
        ),
        scored AS (
            SELECT e.vec_id, e.label,
                   round(
                     (SELECT SUM(CAST(x AS DOUBLE) * y)
                      FROM (SELECT unnest(e.embedding) x,
                                   unnest(ct.cvec) y))
                     / (sqrt((SELECT SUM(CAST(x AS DOUBLE)
                                         * CAST(x AS DOUBLE))
                              FROM (SELECT unnest(e.embedding) x)))
                        * sqrt((SELECT SUM(y * y)
                                FROM (SELECT unnest(ct.cvec) y)))),
                     6) AS cos_centroid,
                   ct.nlbl AS nlbl
            FROM embeddings e JOIN ct ON e.label = ct.label
        )
        SELECT vec_id, label, cos_centroid, rank FROM (
            SELECT vec_id, label, cos_centroid, nlbl,
                   CAST(row_number() OVER (
                       PARTITION BY label
                       ORDER BY cos_centroid ASC, vec_id ASC
                   ) AS BIGINT) AS rank
            FROM scored
        )
        WHERE rank * 20 <= nlbl
    """,
    doc="per-label embedding OUTLIER pruning (corpus cleaning): flag "
    "the bottom 5% of each label's vectors by cosine to the exact "
    "label centroid — the mislabeled/noisy tail dropped before "
    "training, the budgeted complement of dedup_semantic_prune (which "
    "removes the over-dense head). Centroid build is map-side explode "
    "+ partial agg (the shuffle carries |labels|x|dim| cells, not "
    "rows); scoring broadcasts the |labels|-row centroid table "
    "(hint-free, AQE); one rank window per label",
)
def sim_outlier_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return S.centroid_outliers(e, "vec_id", "label", "embedding", 20)
