"""Driver-gated deduplication queries (operators/dedup.py +
operators/similarity.py) over ``documents`` / ``embeddings``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.similarity import cosine_pairs, embedding_lsh_pairs
from ..session import load_tables
from .catalog import register
from .similarity_plans import _LSH_SIG_BRANCHES

# DuckDB shingle expression shared by the jaccard oracles (word 3-grams,
# distinct, 1-based list comprehension).
_SHINGLES = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (
    SELECT doc_id,
           list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in range(1, len(w) - 1)]) s
    FROM toks
)
"""

_JACCARD_SQL = (
    _SHINGLES
    + """
SELECT a.doc_id AS id_1,
       b.doc_id AS id_2,
       len(list_intersect(a.s, b.s)) * 1.0
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sh a
JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 1.0
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
"""
)


@register(
    "dedup_exact",
    oracle="""
        SELECT md5(text) AS dedup_key,
               min(doc_id) AS keeper_id,
               count(*) AS group_size
        FROM documents
        GROUP BY md5(text)
    """,
    doc="exact dedup: hash-groupBy on content hash, keeper = min id",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return D.exact_dedup(d, cols=["text"], id_col="doc_id")


# Same Jaccard pair query, but over the df-capped shingle sets: shingles
# shared by more than max_df of the corpus are dropped BEFORE the self-join
# (they generate quadratic join fan-out and carry no near-dup signal). The
# oracle applies the identical cap so both engines measure the same sets.
# Cap base = COUNT(DISTINCT doc_id) over the exploded shingles (docs with
# >= n tokens), mirroring the engine, which derives the count from the
# already-persisted hashed shingle table instead of a second corpus pass.
_JACCARD_CAPPED_SQL = (
    _SHINGLES
    + """
, ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
hot AS (
    SELECT g FROM ex GROUP BY g
    HAVING COUNT(*) > CAST(floor((SELECT COUNT(DISTINCT doc_id) FROM ex) * 0.1) AS BIGINT)
),
kept AS (
    SELECT doc_id, list(g) AS s
    FROM ex ANTI JOIN hot USING (g)
    GROUP BY doc_id
)
SELECT a.doc_id AS id_1,
       b.doc_id AS id_2,
       len(list_intersect(a.s, b.s)) * 1.0
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM kept a
JOIN kept b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 1.0
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
"""
)


@register(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_CAPPED_SQL,
    doc="exact n-gram (word 3-shingle) Jaccard near-dup pairs at τ=0.8 — "
    "explode→self-join-on-shingle→per-pair counts; the stop-shingle "
    "df-cap (max_df=0.1) is ON in the gated query so the measured plan "
    "is the one that survives hot shingles at 100×",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.8, max_df=0.1
    )


@register(
    "dedup_minhash_lsh",
    oracle=_JACCARD_SQL,
    doc="MinHash(k=64)+LSH(16 bands × 4 rows) near-dup pairs, exact-"
    "Jaccard verified at τ=0.8. Oracle = the exact pair set: at the "
    "corpus's planted-pair similarity (j≈0.98) LSH miss probability is "
    "(1-j⁴)¹⁶ ≈ 1e-18, so ANN equals exact here by construction",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return D.minhash_lsh_pairs(
        d, "doc_id", "text", n=3, k=64, bands=16, threshold=0.8
    )


@register(
    "dedup_simhash",
    # The oracle recomputes the ENTIRE simhash pipeline from scratch in
    # DuckDB — portable md5-derived 60-bit token hashes (identical bytes in
    # both engines), per-bit ±1 vote aggregation, signature assembly, then
    # brute-force all-pairs Hamming ≤ 3. Matching the Spark side therefore
    # verifies both the signature math AND that the multi-block banded
    # candidate generation is complete (pigeonhole guarantee) — a stronger
    # contract than the previous rows-only check.
    oracle=r"""
        WITH tok AS (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
            FROM documents
        ),
        h AS (SELECT doc_id, md5(t) AS m FROM tok),
        bits AS (
            SELECT doc_id, bb.b AS b,
                   CASE WHEN ((strpos('0123456789abcdef',
                                      substr(h.m, 15 - bb.b // 4, 1)) - 1)
                              >> (bb.b % 4)) & 1 = 1
                        THEN 1 ELSE -1 END AS v
            FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) bb
        ),
        votes AS (SELECT doc_id, b, SUM(v) AS sv FROM bits GROUP BY doc_id, b),
        sig AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN sv >= 0 THEN (1::BIGINT << b) ELSE 0 END)
                        AS BIGINT) AS sh
            FROM votes GROUP BY doc_id
        )
        SELECT a.doc_id AS id_1, b.doc_id AS id_2,
               CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """,
    doc="SimHash(60-bit portable hash) near-dup pairs at Hamming ≤ 3; "
    "candidates via Manku multi-block banding (any (blocks-d)-subset of "
    "segments equal), verified by popcount. Oracle rebuilds signatures "
    "independently and brute-forces the pair set.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return D.simhash_pairs(
        d,
        "doc_id",
        "text",
        max_hamming=3,
        nbits=60,
        token_hash=D.portable_token_hash,
    ).withColumn("hamming", F.col("hamming").cast("int"))


@register(
    "dedup_embedding_cosine",
    oracle="""
        SELECT a.vec_id AS id_1,
               b.vec_id AS id_2,
               round(
                 (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                  FROM (SELECT unnest(a.embedding) x, unnest(b.embedding) y))
                 / (sqrt((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                          FROM (SELECT unnest(a.embedding) x)))
                    * sqrt((SELECT SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
                            FROM (SELECT unnest(b.embedding) y)))),
                 6) AS cosine
        FROM embeddings a
        JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(
                 (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
                  FROM (SELECT unnest(a.embedding) x, unnest(b.embedding) y))
                 / (sqrt((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                          FROM (SELECT unnest(a.embedding) x)))
                    * sqrt((SELECT SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
                            FROM (SELECT unnest(b.embedding) y)))),
                 6) >= 0.45
    """,
    doc="embedding-cosine near-dup pairs at τ=0.45 (rounded to 6 digits "
    "for cross-engine rank stability); brute pair scan — the EXACT "
    "VERIFICATION BASELINE for dedup_embedding_lsh, not the scale path",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return cosine_pairs(e, "vec_id", "embedding", threshold=0.45, round_digits=6)


# Exact cosine between the two candidate-pair vectors (aliases a/b),
# mirroring similarity_plans._COS.
_COS_AB = """
round(
  (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
   FROM (SELECT unnest(a.embedding) x, unnest(b.embedding) y))
  / (sqrt((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
           FROM (SELECT unnest(a.embedding) x)))
     * sqrt((SELECT SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
             FROM (SELECT unnest(b.embedding) y)))),
  6)
"""

_EMB_LSH_SQL = f"""
    WITH sig AS (
        {_LSH_SIG_BRANCHES}
    ),
    cand AS (
        SELECT DISTINCT ca.vec_id AS id_1, cb.vec_id AS id_2
        FROM sig ca
        JOIN sig cb ON ca.tbl = cb.tbl AND ca.sig = cb.sig
        WHERE ca.vec_id < cb.vec_id
    )
    SELECT cand.id_1, cand.id_2, {_COS_AB} AS cosine
    FROM cand
    JOIN embeddings a ON a.vec_id = cand.id_1
    JOIN embeddings b ON b.vec_id = cand.id_2
    WHERE {_COS_AB} >= 0.45
"""


@register(
    "dedup_embedding_lsh",
    # Full cross-engine oracle (the sim_lsh_ann technique): DuckDB
    # recomputes the 8×4-bit hyperplane signatures from their literal
    # coefficients, rebuilds the exact collision-candidate pair set, and
    # re-scores it with the same rounded cosine — verifying signature
    # math, candidate completeness, AND the re-score/threshold path.
    oracle=_EMB_LSH_SQL,
    doc="bucketed embedding near-dup pairs (8 tables × 4-bit random-"
    "hyperplane signatures, equi-self-join on (table,sig), exact cosine "
    "re-score of collisions only) — the 100 TB corpus self-dedup path; "
    "dedup_embedding_cosine is its exact verification baseline",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return embedding_lsh_pairs(
        e, "vec_id", "embedding", threshold=0.45, dim=64, bits=4, tables=8
    )


# Connected components over the capped Jaccard pair set, computed
# independently in DuckDB via a recursive transitive-closure CTE (fine at
# oracle scale; the Spark side uses join-based min-label propagation,
# which is the shape that survives 100 TB).
_COMPONENTS_SQL = (
    _SHINGLES.replace("WITH", "WITH RECURSIVE", 1)
    + """
, ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
hot AS (
    SELECT g FROM ex GROUP BY g
    HAVING COUNT(*) > CAST(floor((SELECT COUNT(DISTINCT doc_id) FROM ex) * 0.1) AS BIGINT)
),
kept AS (
    SELECT doc_id, list(g) AS s
    FROM ex ANTI JOIN hot USING (g)
    GROUP BY doc_id
),
pairs AS (
    SELECT a.doc_id AS id_1, b.doc_id AS id_2
    FROM kept a JOIN kept b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s)) * 1.0
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
),
edges AS (
    SELECT id_1 AS a, id_2 AS b FROM pairs
    UNION SELECT id_2, id_1 FROM pairs
    UNION SELECT id_1, id_1 FROM pairs
    UNION SELECT id_2, id_2 FROM pairs
),
reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS id, min(b) AS component FROM reach GROUP BY a
"""
)


@register(
    "dedup_components",
    oracle=_COMPONENTS_SQL,
    doc="near-dup pair set collapsed into duplicate GROUPS: (id, "
    "component=min reachable id) via join-based min-label propagation — "
    "the step that turns pairwise dedup output into per-document "
    "keep/drop decisions; oracle recomputes components with a recursive "
    "transitive-closure CTE",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8, max_df=0.1)
    return D.connected_components(pairs)


@register(
    "decontaminate_ngram_overlap",
    # Oracle recomputes the overlap from raw shingle STRINGS
    # (list_intersect); the Spark plan joins on xxhash64'd shingles —
    # agreement also certifies the 8-byte join-key compression loses
    # nothing on this corpus.
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (
    SELECT doc_id,
           list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in range(1, len(w) - 1)]) s
    FROM toks
),
bench AS (
    SELECT doc_id AS bench_id, s FROM sh
    WHERE doc_id % 7 = 0 AND len(s) > 0
),
corp AS (SELECT doc_id AS corpus_id, s FROM sh WHERE doc_id % 7 <> 0)
SELECT c.corpus_id, b.bench_id,
       CAST(len(list_intersect(c.s, b.s)) AS BIGINT) AS shared_ngrams,
       CAST(len(b.s) AS BIGINT) AS bench_ngrams,
       round(CAST(len(list_intersect(c.s, b.s)) AS DOUBLE) / len(b.s), 6)
           AS overlap
FROM corp c CROSS JOIN bench b
WHERE round(CAST(len(list_intersect(c.s, b.s)) AS DOUBLE) / len(b.s), 6)
          >= 0.5
    """,
    doc="benchmark decontamination: corpus docs sharing >= 50% of an "
    "eval doc's word 3-grams (bench side = doc_id %% 7, broadcast; "
    "corpus side map-only explode + hashed equi-join — no self-join, "
    "no cartesian)",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    bench = d.where(F.col("doc_id") % 7 == 0)
    corpus = d.where(F.col("doc_id") % 7 != 0)
    return D.contamination_pairs(
        corpus, bench, "doc_id", "doc_id", "text", n=3, threshold=0.5
    )


_DEDUP_APPLY_SQL = (
    _COMPONENTS_SQL.replace(
        "SELECT a AS id, min(b) AS component FROM reach GROUP BY a",
        """, drops AS (
    SELECT a AS id FROM reach GROUP BY a HAVING a <> min(b)
)
SELECT d.doc_id, d.lang, CAST(length(d.text) AS BIGINT) AS text_len
FROM documents d ANTI JOIN drops ON d.doc_id = drops.id""",
    )
)


@register(
    "dedup_apply_keep_representative",
    oracle=_DEDUP_APPLY_SQL,
    doc="end-to-end near-dup REMOVAL: Jaccard pairs -> connected "
    "components -> keep min-id representative per group -> anti-join "
    "the corpus (the op a training pipeline actually runs); oracle "
    "rebuilds the whole chain incl. a recursive transitive closure",
)
def dedup_apply_keep_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8, max_df=0.1)
    return D.keep_representative(d, pairs, "doc_id").select(
        "doc_id", "lang", F.length("text").cast("long").alias("text_len")
    )


@register(
    "dedup_exact_substring",
    # Oracle re-derives the rolling windows as raw strings and joins on
    # them directly; the Spark plan joins on xxhash64(span) — agreement
    # certifies both the window construction and the 8-byte join-key
    # compression.
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        sp AS (
            SELECT doc_id,
                   list_distinct([array_to_string(w[i:i+19], ' ')
                                  for i in range(1, len(w) - 18)]) s
            FROM toks WHERE len(w) >= 20
        ),
        ex AS (SELECT doc_id, unnest(s) AS g FROM sp)
        SELECT a.doc_id AS id_1, b.doc_id AS id_2,
               CAST(COUNT(*) AS BIGINT) AS shared_windows
        FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= 1
    """,
    doc="exact-substring duplication candidates (Lee et al. 2022 shape): "
    "docs sharing any verbatim 20-token span, via rolling window hash "
    "explode + equi-join — catches one-copied-paragraph dups that "
    "whole-doc Jaccard misses; suffix arrays don't distribute, span "
    "hashing does",
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return D.substring_window_pairs(d, "doc_id", "text", window=20, min_shared=1)


_GROUP_STATS_SQL = _COMPONENTS_SQL.replace(
    "SELECT a AS id, min(b) AS component FROM reach GROUP BY a",
    """, comp AS (SELECT a AS id, min(b) AS component FROM reach GROUP BY a)
SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups
FROM (SELECT component, CAST(COUNT(*) AS BIGINT) AS group_size
      FROM comp GROUP BY component)
GROUP BY group_size""",
)


@register(
    "dedup_group_stats",
    oracle=_GROUP_STATS_SQL,
    doc="dedup audit histogram: duplicate-group size distribution "
    "(pairs -> connected components -> per-component member count -> "
    "size histogram) — the number a dedup run reports to judge corpus "
    "duplication; two partial-aggregatable groupBys over the component "
    "labels",
)
def dedup_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8, max_df=0.1)
    comp = D.connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .groupBy("group_size")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )


@register(
    "dedup_minhash_estimate_contract",
    # Sketch-quality contract (same technique as agg_approx_distinct):
    # the signature-based Jaccard ESTIMATE can't cross the engine
    # boundary (xxhash64 has no DuckDB twin), but |estimate − exact| ≤
    # 4σ CAN — Spark emits the exact Jaccard plus the tolerance boolean,
    # DuckDB recomputes the exact pair set and asserts TRUE.
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (
    SELECT doc_id,
           list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in range(1, len(w) - 1)]) s
    FROM toks
)
SELECT a.doc_id AS id_1,
       b.doc_id AS id_2,
       len(list_intersect(a.s, b.s)) * 1.0
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard,
       TRUE AS est_within_4sigma
FROM sh a
JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 1.0
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
    """,
    doc="MinHash sketch-quality contract: per near-dup pair, the "
    "fraction of matching signature components estimates Jaccard with "
    "sd sqrt(j(1-j)/k); assert |estimate - exact| <= 0.2 (4 sigma at "
    "k=64) — the bound that justifies trusting banded LSH at 100 TB",
)
def dedup_minhash_estimate_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    # The pair set under test is the EXACT >= 0.8 set (same enumeration
    # as the oracle), not the banded-LSH candidates: with b=16/r=4 a
    # j=0.8 pair is LSH-missed with p≈4e-4, so gating the contract on
    # LSH output silently asserted 100% LSH recall — a testdata
    # regeneration could flip this row red with a confusing row-count
    # mismatch instead of a sketch-quality failure (r4 ADVICE). LSH
    # candidate completeness is covered by dedup_minhash_lsh, whose
    # planted pairs sit at j≈0.98 (miss p≈1e-18, robust by construction);
    # THIS row certifies only the signature→estimate accuracy bound.
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    sigs = D.minhash_signatures(d, "doc_id", "text", n=3, k=64)
    s1 = sigs.select(F.col("doc_id").alias("id_1"), F.col("signature").alias("_s1"))
    s2 = sigs.select(F.col("doc_id").alias("id_2"), F.col("signature").alias("_s2"))
    est = (
        F.size(
            F.filter(
                F.zip_with("_s1", "_s2", lambda a, b: a == b), lambda x: x
            )
        ).cast("double")
        / 64
    )
    return (
        pairs.join(s1, "id_1")
        .join(s2, "id_2")
        .select(
            "id_1",
            "id_2",
            "jaccard",
            (F.abs(est - F.col("jaccard")) <= 0.2).alias("est_within_4sigma"),
        )
    )


@register(
    "decontaminate_exact_substring",
    # Oracle re-derives the rolling 20-token windows as raw strings on
    # both splits and joins them directly; the Spark plan joins on
    # xxhash64(span) — agreement certifies the window construction and
    # the 8-byte join-key compression, cross-table this time.
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        sp AS (
            SELECT doc_id,
                   list_distinct([array_to_string(w[i:i+19], ' ')
                                  for i in range(1, len(w) - 18)]) s
            FROM toks WHERE len(w) >= 20
        ),
        ex AS (SELECT doc_id, unnest(s) AS g FROM sp),
        bench AS (SELECT doc_id AS bench_id, g FROM ex WHERE doc_id % 7 = 0),
        corp AS (SELECT doc_id AS corpus_id, g FROM ex WHERE doc_id % 7 <> 0)
        SELECT c.corpus_id, b.bench_id,
               CAST(COUNT(*) AS BIGINT) AS shared_windows
        FROM corp c JOIN bench b ON c.g = b.g
        GROUP BY c.corpus_id, b.bench_id
        HAVING COUNT(*) >= 1
    """,
    doc="exact-substring decontamination (Lee et al. 2022 shape, "
    "cross-table): training docs sharing any verbatim 20-token span "
    "with an eval doc — the copied-question case that n-gram overlap "
    "RATIOS dilute away in long training documents; rolling span-hash "
    "explode on both splits, one equi-join (bench side broadcast by "
    "AQE)",
)
def decontaminate_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    bench = d.where(F.col("doc_id") % 7 == 0)
    corpus = d.where(F.col("doc_id") % 7 != 0)
    return D.contamination_substring(
        corpus, bench, "doc_id", "doc_id", "text", window=20, min_shared=1
    )


_INCREMENTAL_JACCARD_SQL = (
    _SHINGLES
    + """
SELECT a.doc_id AS id_1,
       b.doc_id AS id_2,
       len(list_intersect(a.s, b.s)) * 1.0
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sh a
JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 1.0
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
  AND (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)
"""
)


@register(
    "dedup_incremental_lsh",
    oracle=_INCREMENTAL_JACCARD_SQL,
    doc="steady-state incremental dedup: the corpus's MinHash band "
    "buckets live in a persisted engine Table (built once, upsert-"
    "maintained per batch); a new batch (doc_id % 10 = 0) is signatured "
    "alone and equi-joined against the stored index — the corpus is "
    "never re-shingled or re-paired. Colliding pairs exact-Jaccard "
    "verified over a semi-joined text slice. Oracle = the exact "
    "batch-involving pair set (planted pairs sit at j≈0.98, where LSH "
    "miss probability is (1-j⁴)¹⁶ ≈ 1e-18)",
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..table import Table

    d = load_tables(spark, sf_dir, "documents")["documents"]
    corpus = d.where(F.col("doc_id") % 10 != 0)
    batch = d.where(F.col("doc_id") % 10 == 0)
    # "yesterday": bucket index of the existing corpus, persisted as an
    # engine table (in production this table already exists; building it
    # here is test scaffolding, not part of the measured steady state).
    idx = Table.create(
        spark,
        tempfile.mkdtemp(prefix="engine_lshidx_"),
        key="_bk",
        precombine="_ver",
        table_name="lsh_bucket_index",
    )
    corpus_buckets = D.minhash_band_buckets(
        D.minhash_signatures(corpus, "doc_id", "text", n=3, k=64),
        "doc_id",
        k=64,
        bands=16,
    )
    idx.bulk_insert(
        corpus_buckets.withColumn(
            "_bk", F.concat_ws(":", "band", "bucket", "_id")
        )
    )
    # "today": only the batch is hashed; the index is READ, not rebuilt.
    stored = idx.snapshot().select("_id", "band", "bucket")
    return D.incremental_lsh_pairs(
        stored, batch, d, "doc_id", "text", n=3, k=64, bands=16, threshold=0.8
    )


_CONTAINMENT_SQL = (
    _SHINGLES
    + """
, pairs AS (
    SELECT a.doc_id AS id_1, b.doc_id AS id_2,
           len(list_intersect(a.s, b.s)) AS n_inter,
           len(a.s) AS n_1, len(b.s) AS n_2
    FROM sh a
    JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s)) > 0
)
SELECT id_sub, id_super, containment FROM (
    SELECT id_1 AS id_sub, id_2 AS id_super,
           n_inter * 1.0 / n_1 AS containment FROM pairs
    UNION ALL
    SELECT id_2 AS id_sub, id_1 AS id_super,
           n_inter * 1.0 / n_2 AS containment FROM pairs
)
WHERE containment >= 0.9
"""
)


@register(
    "dedup_containment",
    oracle=_CONTAINMENT_SQL,
    doc="directional n-gram containment pairs at tau=0.9 (|A∩B|/|A| — "
    "Broder's containment vs resemblance): the quote/subset detector "
    "for a paragraph copied into a long document, which symmetric "
    "Jaccard dilutes to ~0. Same hashed-shingle self-join envelope as "
    "dedup_ngram_jaccard; each unordered pair fans into two directional "
    "checks",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return D.ngram_containment_pairs(
        d, "doc_id", "text", n=3, threshold=0.9
    )


_REMOVE_SPANS_SQL = """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        occ AS (
            SELECT doc_id, px.p AS pos, px.s AS span
            FROM (
                SELECT doc_id,
                       unnest([{'p': i - 1,
                                's': array_to_string(w[i:i+19], ' ')}
                               for i in range(1, len(w) - 18)]) AS px
                FROM toks
                WHERE len(w) >= 20
            )
        ),
        ranked AS (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY span
                                      ORDER BY doc_id, pos) AS rn
            FROM occ
        ),
        covered AS (
            SELECT DISTINCT doc_id, unnest(range(pos, pos + 20)) AS p
            FROM ranked WHERE rn > 1
        ),
        words AS (
            SELECT doc_id, wx.p AS p, wx.word
            FROM (
                SELECT doc_id,
                       unnest([{'p': i - 1, 'word': w[i]}
                               for i in range(1, len(w) + 1)]) AS wx
                FROM toks
            )
        ),
        kept AS (SELECT * FROM words ANTI JOIN covered USING (doc_id, p)),
        cleaned AS (
            SELECT doc_id,
                   array_to_string(list(word ORDER BY p), ' ') AS text_clean
            FROM kept GROUP BY doc_id
        ),
        removed AS (
            SELECT doc_id, COUNT(*) AS n_removed_tokens
            FROM covered GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(c.text_clean, '') AS text_clean,
               COALESCE(r.n_removed_tokens, 0) AS n_removed_tokens
        FROM documents d
        LEFT JOIN cleaned c USING (doc_id)
        LEFT JOIN removed r USING (doc_id)
"""


@register(
    "dedup_remove_spans",
    # Engine groups occurrences by the 64-bit span hash, the oracle by
    # the span string — identical removal decisions modulo hash
    # collisions (~1e-11 at this span count). (doc_id, pos) ordering
    # makes "first occurrence survives" deterministic in both engines.
    oracle=_REMOVE_SPANS_SQL,
    doc="exact-substring REMOVAL (the Lee et al. 2022 step the pair "
    "detectors stop short of): every repeated 20-token span keeps its "
    "first (doc,pos) occurrence and is cut everywhere else — repetition "
    "gone, content kept. Rolling span hashes carry positions, one "
    "row_number window finds non-first occurrences, one anti-join "
    "filters the token table, per-doc reassembly restores order",
)
def dedup_remove_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return D.remove_duplicate_spans(d, "doc_id", "text", window=20)


# cosine(member, representative) with aliases m / re, same fold order as
# _COS_AB — both engines sum the unnested products in list order.
_COS_MR = """
round(
  (SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
   FROM (SELECT unnest(m.embedding) x, unnest(re.embedding) y))
  / (sqrt((SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
           FROM (SELECT unnest(m.embedding) x)))
     * sqrt((SELECT SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE))
             FROM (SELECT unnest(re.embedding) y)))),
  6)
"""


def _semantic_prune_sql() -> str:
    from .similarity_plans import _duck_sig

    return f"""
        WITH sig AS (
            SELECT vec_id, embedding,
                   CAST({_duck_sig(64, 6, 42)} AS BIGINT) AS sig
            FROM embeddings
        ),
        reps AS (SELECT sig, min(vec_id) AS rep_id FROM sig GROUP BY sig)
        SELECT m.vec_id,
               m.sig,
               r.rep_id,
               CASE WHEN m.vec_id <> r.rep_id THEN {_COS_MR} END AS cos_rep,
               (m.vec_id = r.rep_id OR {_COS_MR} < 0.45) AS kept
        FROM sig m
        JOIN reps r USING (sig)
        JOIN embeddings re ON re.vec_id = r.rep_id
    """


@register(
    "dedup_semantic_prune",
    # Full cross-engine oracle (sim_lsh_ann technique): DuckDB recomputes
    # the 6-bit bucket signature from the literal hyperplane
    # coefficients, picks the same min-id representative per bucket, and
    # re-scores every member against it with the same rounded cosine —
    # signature math, representative choice, and keep/drop policy all
    # independently verified.
    oracle=_semantic_prune_sql(),
    doc="SemDeDup-style semantic pruning (Abbas et al. 2023): LSH-bucket "
    "semantic clusters, min-id representative, members at cosine >= "
    "0.45 to their representative dropped. O(N) cosines (member x rep, "
    "never pairwise), representatives broadcast — the semantic-"
    "redundancy removal pass of a corpus pipeline, distinct from "
    "near-literal dedup_embedding_lsh",
)
def dedup_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_prune

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return semantic_prune(
        e.select("vec_id", "embedding"),
        "vec_id", "embedding", dim=64, bits=6, seed=42, threshold=0.45,
    )


def _semantic_incremental_sql() -> str:
    from .similarity_plans import _duck_sig

    return f"""
        WITH sig AS (
            SELECT vec_id, embedding,
                   CAST({_duck_sig(64, 6, 42)} AS BIGINT) AS sig
            FROM embeddings
        ),
        hist_reps AS (
            SELECT sig, min(vec_id) AS rep_id
            FROM sig WHERE vec_id % 2 = 0 GROUP BY sig
        ),
        new_reps AS (
            SELECT s.sig, min(s.vec_id) AS rep_id
            FROM sig s
            WHERE s.vec_id % 2 = 1
              AND s.sig NOT IN (SELECT sig FROM hist_reps)
            GROUP BY s.sig
        ),
        reps AS (
            SELECT * FROM hist_reps UNION ALL SELECT * FROM new_reps
        )
        SELECT m.vec_id,
               m.sig,
               r.rep_id,
               CASE WHEN m.vec_id <> r.rep_id THEN {_COS_MR} END AS cos_rep,
               (m.vec_id = r.rep_id OR {_COS_MR} < 0.45) AS kept
        FROM sig m
        JOIN reps r USING (sig)
        JOIN embeddings re ON re.vec_id = r.rep_id
        WHERE m.vec_id % 2 = 1
    """


@register(
    "dedup_semantic_incremental",
    # Same cross-engine technique as dedup_semantic_prune, applied to
    # the two-phase shape: DuckDB recomputes the historical corpus's
    # representatives (min even vec_id per bucket), elects new reps
    # only for buckets the history never saw (min odd vec_id), and
    # scores the batch against that union — independently verifying
    # that the engine pruned the batch against PERSISTED reps rather
    # than re-clustering.
    oracle=_semantic_incremental_sql(),
    doc="Incremental SemDeDup: a new batch is pruned against a "
    "PERSISTED representative index (engine Table keyed by bucket "
    "signature, rep vector stored with the rep) instead of "
    "re-clustering the corpus — the steady-state evolution of "
    "dedup_semantic_prune, exactly as dedup_incremental_lsh is to "
    "dedup_minhash_lsh. Existing buckets score against the stored "
    "immutable rep; brand-new signatures elect their min-id member and "
    "insert it in one commit. O(batch) cosines, corpus size absent "
    "from the per-batch cost",
)
def dedup_semantic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.similarity import semantic_prune_incremental
    from ..table import Table

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    hist = e.where(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    batch = e.where(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    path = tempfile.mkdtemp(prefix="engine_semreps_")
    reps = Table.create(
        spark, path, key="sig", precombine="rep_id", table_name="sem_reps"
    )
    kw = dict(dim=64, bits=6, seed=42, threshold=0.45)
    # bootstrap: the historical corpus populates the reps index (its
    # verdict frame is discarded; the inserts are eager)
    semantic_prune_incremental(reps, hist, "vec_id", "embedding", **kw)
    return semantic_prune_incremental(reps, batch, "vec_id", "embedding", **kw)


@register(
    "decontaminate_incremental",
    # Oracle recomputes the overlap from raw shingle STRINGS over
    # (eval set ∪ batch) — independently verifying both the persisted
    # index content (bench n-grams hashed once at build time) and the
    # batch check, plus the 8-byte join-key compression, exactly as
    # decontaminate_ngram_overlap's oracle does for the one-shot path.
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (
    SELECT doc_id,
           list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in range(1, len(w) - 1)]) s
    FROM toks
),
bench AS (
    SELECT doc_id AS bench_id, s FROM sh
    WHERE doc_id % 7 = 0 AND len(s) > 0
),
corp AS (
    SELECT doc_id AS corpus_id, s FROM sh
    WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0
)
SELECT c.corpus_id, b.bench_id,
       CAST(len(list_intersect(c.s, b.s)) AS BIGINT) AS shared_ngrams,
       CAST(len(b.s) AS BIGINT) AS bench_ngrams,
       round(CAST(len(list_intersect(c.s, b.s)) AS DOUBLE) / len(b.s), 6)
           AS overlap
FROM corp c CROSS JOIN bench b
WHERE round(CAST(len(list_intersect(c.s, b.s)) AS DOUBLE) / len(b.s), 6)
          >= 0.5
    """,
    doc="steady-state incremental decontamination: the eval set's "
    "3-gram hashes live in a PERSISTED engine Table (built once, "
    "upsert-maintained when the benchmark grows); each new corpus "
    "batch (doc_id %% 3 = 0 here) hashes map-side and equi-joins the "
    "stored index — O(batch) per batch, the eval set never re-"
    "tokenized, corpus size absent from the steady-state cost. The "
    "same batch-vs-persisted-index evolution dedup_incremental_lsh is "
    "to dedup_minhash_lsh and dedup_semantic_incremental is to "
    "dedup_semantic_prune, applied to decontaminate_ngram_overlap",
)
def decontaminate_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..table import Table

    d = load_tables(spark, sf_dir, "documents")["documents"]
    bench = d.where(F.col("doc_id") % 7 == 0)
    batch = d.where((F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 3 == 0))
    # "once": the benchmark is hashed into a persisted index (in
    # production this table already exists; building it here is test
    # scaffolding, not part of the measured steady state).
    idx = Table.create(
        spark,
        tempfile.mkdtemp(prefix="engine_decon_idx_"),
        key="_k",
        precombine="_h",
        table_name="decon_ngram_index",
    )
    D.contamination_index_build(bench, idx, "doc_id", "text", n=3)
    # "every batch": only the batch is tokenized; the index is READ.
    return D.contamination_check_incremental(
        batch, idx, "doc_id", "text", n=3, threshold=0.5
    )


@register(
    "decontaminate_substring_incremental",
    # Oracle re-derives the rolling 20-token windows as raw strings on
    # both splits and joins them directly (same technique as
    # decontaminate_exact_substring), restricted to the batch — so
    # agreement verifies the persisted span index AND the batch check.
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        sp AS (
            SELECT doc_id,
                   list_distinct([array_to_string(w[i:i+19], ' ')
                                  for i in range(1, len(w) - 18)]) s
            FROM toks WHERE len(w) >= 20
        ),
        ex AS (SELECT doc_id, unnest(s) AS g FROM sp),
        bench AS (SELECT doc_id AS bench_id, g FROM ex WHERE doc_id % 7 = 0),
        corp AS (
            SELECT doc_id AS corpus_id, g FROM ex
            WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0
        )
        SELECT c.corpus_id, b.bench_id,
               CAST(COUNT(*) AS BIGINT) AS shared_windows
        FROM corp c JOIN bench b ON c.g = b.g
        GROUP BY c.corpus_id, b.bench_id
        HAVING COUNT(*) >= 1
    """,
    doc="steady-state exact-substring decontamination: the eval set's "
    "rolling 20-token span hashes live in a PERSISTED engine Table "
    "(built once); each new corpus batch (doc_id %% 3 = 0) hashes its "
    "spans map-side and equi-joins the stored index — the Lee et al. "
    "copied-question check at O(batch) steady-state cost, the span "
    "flavor of decontaminate_incremental",
)
def decontaminate_substring_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from ..table import Table

    d = load_tables(spark, sf_dir, "documents")["documents"]
    bench = d.where(F.col("doc_id") % 7 == 0)
    batch = d.where((F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 3 == 0))
    idx = Table.create(
        spark,
        tempfile.mkdtemp(prefix="engine_decon_span_idx_"),
        key="_k",
        precombine="_h",
        table_name="decon_span_index",
    )
    D.contamination_substring_index_build(bench, idx, "doc_id", "text", window=20)
    return D.contamination_substring_check_incremental(
        batch, idx, "doc_id", "text", window=20, min_shared=1
    )
