"""Driver-gated end-to-end corpus pipeline query.

``pipeline_llm_corpus_gold`` runs the WHOLE training-data build
(``pipeline.build_corpus``: bronze ingest → quality filter → exact +
near-dup removal → decontamination → domain-mix sampling → sequence
packing → gold table) and returns the gold snapshot. The oracle chains
each stage's proven DuckDB SQL (the per-stage oracles are individually
gated in dedup_plans.py / text2.py), so a green row certifies the
COMPOSITION, not just the parts — mirroring ``incremental_pipeline_gold``
for the reference's Lab2 flow (incremental_etl_orders.py:454-496).

Determinism notes (why an exact hash-compare is possible):
- representatives are min-id, sampling is md5-fraction (bit-identical
  md5 both engines), packing is a window cumsum over an explicit order;
- sampling rates are rounded to 6 decimals half-up on BOTH sides, so
  the solver's float path (Python) and min(count)/count (SQL) agree.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from ..table import META_COL
from .catalog import register
from .dedup_plans import _REMOVE_SPANS_SQL
from .text2 import _DUCK_MD5_FRAC, _duck_md5_frac_of, token_budget_ctes

_CORPUS_GOLD_SQL = (
    # The prelude mirrors the bronze KEYED ingest (key=doc_id,
    # precombine=n_chars): if documents.parquet ever ships duplicate
    # doc_ids, Spark's bronze upsert keeps max(n_chars) per key
    # (table.py within-batch row_number dedup) — without this prelude the
    # oracle would keep both rows and the mismatch would masquerade as a
    # pipeline bug (r4 ADVICE).
    """
WITH RECURSIVE
bronze AS (
    SELECT * EXCLUDE (_rn) FROM (
        SELECT d.*, row_number() OVER (
            PARTITION BY doc_id ORDER BY n_chars DESC) AS _rn
        FROM documents d
    ) WHERE _rn = 1
),
filtered AS (
    SELECT * FROM bronze WHERE text IS NOT NULL AND length(text) >= 20
),
keepers AS (SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)),
uniq AS (SELECT f.* FROM filtered f SEMI JOIN keepers k ON f.doc_id = k.doc_id),
toks AS (SELECT doc_id, string_split(text, ' ') w FROM uniq),
sh AS (
    SELECT doc_id,
           list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in range(1, len(w) - 1)]) s
    FROM toks
),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
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
),
drops AS (SELECT a AS id FROM reach GROUP BY a HAVING a <> min(b)),
deduped AS (SELECT u.* FROM uniq u ANTI JOIN drops ON u.doc_id = drops.id),
dsh AS (SELECT s1.doc_id, s1.s FROM sh s1 SEMI JOIN deduped d ON s1.doc_id = d.doc_id),
bench AS (SELECT doc_id AS bench_id, s FROM dsh WHERE doc_id % 7 = 0 AND len(s) > 0),
corp AS (SELECT doc_id AS corpus_id, s FROM dsh WHERE doc_id % 7 <> 0),
contaminated AS (
    SELECT DISTINCT c.corpus_id AS doc_id
    FROM corp c CROSS JOIN bench b
    WHERE round(CAST(len(list_intersect(c.s, b.s)) AS DOUBLE) / len(b.s), 6)
              >= 0.5
),
train AS (SELECT * FROM deduped WHERE doc_id % 7 <> 0),
clean AS (SELECT t.* FROM train t ANTI JOIN contaminated c ON t.doc_id = c.doc_id),
cnts AS (SELECT source, COUNT(*) AS n FROM clean GROUP BY source),
rates AS (
    SELECT source,
           floor((CAST((SELECT min(n) FROM cnts) AS DOUBLE) / n) * 1000000
                 + 0.5) / 1000000.0 AS rate
    FROM cnts
),
mixed AS (
    SELECT c.* FROM clean c JOIN rates r USING (source)
    WHERE """
    + _DUCK_MD5_FRAC
    + r""" < r.rate
),
packed AS (
    SELECT doc_id, source,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens,
           SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT))
               OVER (
               PARTITION BY source ORDER BY doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM mixed
)
SELECT doc_id, source, n_tokens,
       CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 4096) AS BIGINT) AS pack_id
FROM packed
"""
)


@register(
    "pipeline_llm_corpus_gold",
    oracle=_CORPUS_GOLD_SQL,
    doc="the WHOLE llm corpus pipeline as one checked query: bronze "
    "keyed ingest -> quality filter -> exact dedup (min-id keeper) -> "
    "n-gram Jaccard near-dup removal (tau=0.8, max_df=0.1) -> "
    "decontamination vs the doc_id%7 eval split (overlap>=0.5) -> "
    "uniform domain-mix sampling (retention-maximizing rates) -> "
    "4096-token sequence packing -> gold table snapshot; oracle chains "
    "every stage's SQL incl. a recursive transitive closure",
)
def pipeline_llm_corpus_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..pipeline import build_corpus

    base = tempfile.mkdtemp(prefix="engine_corpus_")
    gold, _counts, _report = build_corpus(
        spark, base, f"{sf_dir}/documents.parquet", audit=False
    )
    return gold.snapshot().drop(META_COL).select(
        "doc_id", "source", F.col("n_tokens").cast("long").alias("n_tokens"),
        "pack_id",
    )


@register(
    "pipeline_span_clean_gold",
    oracle=(
        "SELECT doc_id, text_clean, n_removed_tokens FROM ("
        + _REMOVE_SPANS_SQL
        + ") WHERE n_removed_tokens * 4 <= length(text_clean) - length(replace(text_clean, ' ', '')) + 1"
        "   AND length(text_clean) >= 50"
    ),
    doc="span-clean corpus stage composed end-to-end: exact-substring "
    "REMOVAL (keep-first) -> repetition gate (removed tokens <= 25% of "
    "surviving tokens) -> length floor -> keyed gold table write -> "
    "snapshot. The write path proves the cleaned text survives the "
    "table kernel byte-identically",
)
def pipeline_span_clean_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.dedup import remove_duplicate_spans
    from ..table import Table

    d = load_tables(spark, sf_dir, "documents")["documents"]
    cleaned = remove_duplicate_spans(d, "doc_id", "text", window=20)
    # surviving token count = spaces + 1 (documents are single-space
    # delimited; identical arithmetic on the oracle side)
    surv_tokens = (
        F.length("text_clean")
        - F.length(F.regexp_replace("text_clean", " ", ""))
        + 1
    )
    gated = cleaned.where(
        (F.col("n_removed_tokens") * 4 <= surv_tokens)
        & (F.length("text_clean") >= 50)
    )
    gold = Table.create(
        spark,
        tempfile.mkdtemp(prefix="engine_spanclean_"),
        key="doc_id",
        precombine="n_removed_tokens",
        table_name="span_clean_gold",
    )
    gold.bulk_insert(gated)
    return gold.snapshot().drop(META_COL)


def _semantic_gold_sql() -> str:
    from .dedup_plans import _COS_MR
    from .similarity_plans import _duck_sig

    return f"""
        WITH filtered AS (
            SELECT doc_id, source FROM documents
            WHERE text IS NOT NULL AND length(text) >= 20
        ),
        joined AS (
            SELECT f.doc_id, f.source, e.embedding
            FROM filtered f JOIN embeddings e ON e.vec_id = f.doc_id
        ),
        sig AS (
            SELECT doc_id, source, embedding,
                   CAST({_duck_sig(64, 6, 42)} AS BIGINT) AS sig
            FROM joined
        ),
        reps AS (SELECT sig, min(doc_id) AS rep_id FROM sig GROUP BY sig)
        SELECT m.doc_id, m.source,
               m.sig AS cluster_id,
               r.rep_id
        FROM sig m
        JOIN reps r USING (sig)
        JOIN sig re ON re.doc_id = r.rep_id
        WHERE m.doc_id = r.rep_id OR {_COS_MR} < 0.45
    """


@register(
    "pipeline_semantic_gold",
    # The oracle chains the quality filter, the docs×embeddings join,
    # and the full semantic-prune algebra (signatures from literal
    # hyperplane coefficients, min-id representative, rounded-cosine
    # keep policy) — certifying the multimodal COMPOSITION and that the
    # kept set survives the table kernel byte-identically.
    oracle=_semantic_gold_sql(),
    doc="semantic curation stage composed end-to-end: quality filter -> "
    "join the text table to its embedding table on id -> SemDeDup-style "
    "semantic prune (LSH clusters, min-id rep, cosine>=0.45 dropped) -> "
    "keyed gold table write -> snapshot. The text x embedding join is "
    "the multimodal-pipeline staple; at 100 TB both sides hash-shuffle "
    "on the id once and every later stage is map-only or broadcast",
)
def pipeline_semantic_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile as _tf

    from ..operators.similarity import semantic_prune
    from ..table import Table

    d = load_tables(spark, sf_dir, "documents")["documents"]
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    filtered = d.where(
        F.col("text").isNotNull() & (F.length("text") >= 20)
    ).select("doc_id", "source")
    joined = filtered.join(
        e, filtered["doc_id"] == e["vec_id"]
    ).select("doc_id", "source", "embedding")
    # semantic_prune passes non-vector columns through, so `source`
    # survives the prune and no re-join against the documents scan is
    # needed — the id join above stays the ONLY shuffle of the stage
    pruned = semantic_prune(
        joined, "doc_id", "embedding", dim=64, bits=6, seed=42, threshold=0.45
    )
    kept = pruned.where("kept").select(
        F.col("vec_id").alias("doc_id"),
        "source",
        F.col("sig").alias("cluster_id"),
        "rep_id",
    )
    gold = Table.create(
        spark,
        _tf.mkdtemp(prefix="engine_semgold_"),
        key="doc_id",
        precombine="cluster_id",
        table_name="semantic_gold",
    )
    gold.bulk_insert(kept)
    return gold.snapshot().drop(META_COL)


@register(
    "pipeline_train_split_gold",
    # Chains the r14 births' proven SQL VERBATIM (r14 second-review
    # finding: the first cut copy-pasted it): the score+carve CTEs come
    # from text2.token_budget_ctes (shared with sample_token_budget)
    # and the split CASE reuses text2._duck_md5_frac_of (shared with
    # sample_group_split) — a green row certifies the COMPOSITION of
    # the curation tail (score -> carve -> split), and the shared
    # fragments make divergence from the stage queries impossible.
    oracle=token_budget_ctes(extra_cols=", text")
    + f"""
        SELECT doc_id, score, n_tokens, cum_tokens,
               CASE WHEN {_duck_md5_frac_of("'0|' || md5(text)")} < 0.8
                    THEN 'train'
                    WHEN {_duck_md5_frac_of("'0|' || md5(text)")} < 0.9
                    THEN 'valid'
                    ELSE 'test' END AS split
        FROM sel
    """,
    doc="the curation TAIL as one checked composition: unique-token-"
    "ratio quality score -> greedy 10k-token budget carve (banded "
    "two-phase prefix sum) -> leakage-safe 80/10/10 split keyed on "
    "the exact-dup group — the score->carve->split chain every "
    "training-mix build ends with; oracle chains all three stages' "
    "proven SQL through the SAME shared fragments the stage queries "
    "use",
)
def pipeline_train_split_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import group_split, token_budget_select
    from .text2 import unique_ratio_scored

    d = load_tables(spark, sf_dir, "documents")["documents"].where(
        F.col("text").isNotNull()
    )
    sel = token_budget_select(
        unique_ratio_scored(d), "doc_id", "n_tokens", "score",
        budget=10_000,
    )
    # re-attach text for the group key: the carve output is budget-
    # bounded (small), so AQE broadcasts it against the documents scan
    with_text = sel.join(d.select("doc_id", "text"), "doc_id")
    return group_split(
        with_text,
        F.md5(F.col("text")),
        [("train", 0.8), ("valid", 0.1), ("test", 0.1)],
    ).select("doc_id", "score", "n_tokens", "cum_tokens", "split")
