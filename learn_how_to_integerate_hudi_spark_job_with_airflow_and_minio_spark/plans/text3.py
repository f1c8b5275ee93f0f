"""Third text batch: language-model quality scoring.

The CCNet pipeline (Wenzek et al. 2019) ranks Common-Crawl documents by
LM perplexity and keeps the low-perplexity head; the engine-portable
version scores each document under a corpus-level *unigram* LM (Laplace
smoothed), which needs no external model artifact and is exactly
reproducible in ANSI SQL. Distinct from text_dsir_importance (text2.py):
DSIR scores the *ratio* between a target and raw distribution for domain
selection; this scores absolute likelihood for fluency/quality filtering.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from .catalog import register

# Keep threshold: documents in the lower-likelihood half (below the
# corpus median mean-logprob) are flagged, the CCNet "tail" bucket.
_UNIGRAM_SQL = r"""
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
    FROM documents
),
cw AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM cw),
lp AS (
    SELECT cw.w, ln((cw.c + 1) * 1.0 / (tot.n + tot.v)) AS lp
    FROM cw CROSS JOIN tot
),
per_doc AS (
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           round(SUM(lp.lp) / COUNT(*), 6) AS mean_logprob
    FROM tok JOIN lp USING (w)
    GROUP BY doc_id
),
med AS (
    SELECT round(median(mean_logprob), 6) AS m FROM per_doc
)
SELECT doc_id, n_tokens, mean_logprob,
       round(-mean_logprob / ln(2), 6) AS bits_per_token,
       mean_logprob >= med.m AS keep_head
FROM per_doc CROSS JOIN med
"""


@register(
    "text_unigram_logprob",
    # Determinism: the per-token ln is computed from identical integer
    # counts in both engines (bit-identical doubles); the per-doc mean is
    # rounded to 6 decimals before anything compares or derives from it,
    # absorbing float summation-order differences (~1e-13). The median
    # is taken over the ROUNDED means and itself rounded, so the
    # keep_head boundary is exact in both engines.
    oracle=_UNIGRAM_SQL,
    doc="CCNet-style LM quality score (Wenzek et al. 2019): per-document "
    "mean token log-probability under the Laplace-smoothed corpus "
    "unigram LM, bits-per-token, and a keep flag vs the corpus median. "
    "Two partial-aggregatable counts, one broadcast totals join, one "
    "word-keyed join, one broadcast median join — no UDFs, no collects",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens

    d = load_tables(spark, sf_dir, "documents")["documents"]
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    cw = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = cw.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")).withColumn(
        "_one", F.lit(1)
    )
    lp = (
        cw.withColumn("_one", F.lit(1))
        .join(F.broadcast(totals), "_one")
        .select("w", F.log((F.col("c") + 1) / (F.col("n") + F.col("v"))).alias("lp"))
    )
    per_doc = (
        tok.join(lp, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lp") / F.count(F.lit(1)), 6).alias("mean_logprob"),
        )
    )
    med = per_doc.agg(
        F.round(F.expr("percentile(mean_logprob, 0.5)"), 6).alias("m")
    ).withColumn("_one", F.lit(1))
    return (
        per_doc.withColumn("_one", F.lit(1))
        .join(F.broadcast(med), "_one")
        .select(
            "doc_id",
            "n_tokens",
            "mean_logprob",
            F.round(-F.col("mean_logprob") / F.lit(math.log(2.0)), 6).alias(
                "bits_per_token"
            ),
            (F.col("mean_logprob") >= F.col("m")).alias("keep_head"),
        )
    )


# -- sentence-splitting UDTF (Spark 4 Python table function surface) --

try:  # pyspark >= 3.5: Python UDTFs; useArrow requires 4.x
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="sent_idx int, sentence string, n_chars int",
        useArrow=True,
    )
    class _SplitSentences:
        """One output row per sentence of the input text. Split rule is
        deliberately explicit-ASCII (`[.!?][ \\t\\n\\r]+`) so the DuckDB
        oracle's RE2 regexp_split_to_array reproduces it byte-for-byte
        (Python's `\\s` is Unicode-wide, RE2's is not — never use it in
        a cross-engine contract)."""

        def eval(self, text: str):  # noqa: D102 — contract above
            import re

            if text is None:
                return
            idx = 0
            for seg in re.split(r"[.!?][ \t\n\r]+", text):
                if seg.strip(" \t\n\r"):
                    yield idx, seg, len(seg)
                    idx += 1

except ImportError:  # pragma: no cover — older pyspark
    _SplitSentences = None


@register(
    "text_sentence_udtf",
    oracle=r"""
        WITH sents AS (
            SELECT doc_id,
                   [s for s in regexp_split_to_array(text, '[.!?][ \t\n\r]+')
                    if trim(s, ' ' || chr(9) || chr(10) || chr(13)) != ''] AS ss
            FROM documents
        )
        SELECT doc_id,
               CAST(px.idx AS INT) AS sent_idx,
               px.s AS sentence,
               CAST(length(px.s) AS INT) AS n_chars
        FROM (
            SELECT doc_id,
                   unnest([{'idx': i - 1, 's': ss[i]}
                           for i in range(1, len(ss) + 1)]) AS px
            FROM sents
        )
    """,
    doc="Python UDTF (arrow-vectorized, ArrowEvalPythonUDTF — not the "
    "row-eval path plan-lint bans) exploding documents into sentences "
    "via LATERAL: the user-defined-table-function surface for "
    "row-to-many transforms that outgrow explode(); per-doc work, "
    "map-only, no shuffle",
)
def text_sentence_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    if _SplitSentences is None:  # pragma: no cover
        raise RuntimeError("Python UDTFs need pyspark >= 3.5")
    d = load_tables(spark, sf_dir, "documents")["documents"]
    d.createOrReplaceTempView("_docs_for_udtf")
    spark.udtf.register("split_sentences", _SplitSentences)
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM _docs_for_udtf d, LATERAL split_sentences(d.text) s
        """
    )


_CHUNK_W, _CHUNK_S = 32, 16

@register(
    "text_chunk_sliding",
    # Both engines slice the SAME token array with the SAME start
    # sequence (multiples of S up to max(n-W, 0)), so chunks are
    # string-identical; everything is integer/string — no float parity
    # surface at all.
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        st AS (
            SELECT doc_id, t,
                   unnest(range(0, greatest(len(t) - {_CHUNK_W}, 0) + 1,
                                {_CHUNK_S})) AS s
            FROM toks
        )
        SELECT doc_id,
               s // {_CHUNK_S} AS chunk_id,
               CAST(len(t[s + 1 : s + {_CHUNK_W}]) AS BIGINT) AS n_tokens,
               array_to_string(t[s + 1 : s + {_CHUNK_W}], ' ') AS chunk
        FROM st
    """,
    doc=f"sliding-window document chunking for RAG / training-sequence "
    f"prep: split each doc into overlapping {_CHUNK_W}-token windows at "
    f"stride {_CHUNK_S} (last window truncates). Scale shape: pure "
    "map-only Catalyst — split + sequence + posexplode + slice, no "
    "shuffle, no UDF; 100 TB of text chunks at scan speed and the "
    "output is Σceil(n/S) rows partitioned exactly like the input",
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - _CHUNK_W, F.lit(0)),
        F.lit(_CHUNK_S),
    )
    return (
        d.select("doc_id", toks.alias("_t"), F.posexplode(starts).alias("_pos", "_s"))
        .select(
            "doc_id",
            F.col("_pos").cast("long").alias("chunk_id"),
            F.slice("_t", F.col("_s") + 1, F.lit(_CHUNK_W)).alias("_c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("_c").cast("long").alias("n_tokens"),
            F.array_join("_c", " ").alias("chunk"),
        )
    )


_BIGRAM_SQL = r"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
bg AS (
    SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1]}
                           for i in range(1, len(t))]) AS b
    FROM toks
),
pairs AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
c12 AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c) AS n FROM c12 GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w2) AS v FROM pairs),
lp AS (
    SELECT c12.w1, c12.w2,
           ln((c12.c + 1) * 1.0 / (c1.n + v.v)) AS lp
    FROM c12 JOIN c1 USING (w1) CROSS JOIN v
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       round(SUM(lp.lp) / COUNT(*), 6) AS mean_logprob
FROM pairs JOIN lp USING (w1, w2)
GROUP BY doc_id
"""


@register(
    "text_bigram_logprob",
    # Same determinism contract as text_unigram_logprob: each bigram's
    # ln comes from identical integer counts (bit-identical doubles);
    # the per-doc mean is rounded to 6 decimals, absorbing ~1e-13
    # summation-order drift. Docs with < 2 tokens have no bigrams and
    # drop out on both sides.
    oracle=_BIGRAM_SQL,
    doc="corpus bigram LM per-doc likelihood (Laplace-smoothed "
    "P(w2|w1)): the CCNet-style fluency score one order above the "
    "unigram model — word-ORDER violations now lower the score. Scale "
    "shape: bigram extraction is map-only (transform over the token "
    "array, no self-join on positions); the count tables partial-"
    "aggregate; the per-doc score is one hash join of the bigram "
    "stream against the |V²|-bounded logprob table",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    pairs = (
        d.select(
            "doc_id",
            F.split(F.trim(F.col("text")), r"\s+").alias("_t"),
        )
        # sequence(1, 0) DESCENDS in Spark — a 1-token doc would emit
        # bogus null-keyed bigrams that pollute the count tables (DuckDB
        # range(1, 1) is empty); keep only docs that have a bigram
        .where(F.size("_t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_t) - 1), "
                    "i -> struct(_t[i-1] AS w1, _t[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c1 = c12.groupBy("w1").agg(F.sum("c").alias("n"))
    v = pairs.agg(F.countDistinct("w2").alias("v"))
    lp = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1", "w2",
            F.log((F.col("c") + 1) / (F.col("n") + F.col("v"))).alias("lp"),
        )
    )
    return (
        pairs.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("lp") / F.count(F.lit(1)), 6).alias("mean_logprob"),
        )
    )


# Fixed classifier weights — a deterministic stand-in for a trained
# quality model (fastText-style GPT-3/CCNet corpus filter). The gated
# score is the LINEAR logit: every feature is a ratio of exact integer
# counts, so z is identical IEEE arithmetic in both engines with no
# libm (exp) parity surface at all; the sigmoid is monotone in z, so
# keep = z >= 0 is exactly the 0.5-probability decision.
_QC_BIAS = -2.0
_QC_W_TTR = 3.0        # type-token ratio: lexical diversity
_QC_W_STOP = 4.0       # stopword ratio: fluent prose carries function words
_QC_W_MEANLEN = 0.15   # mean token length: penalizes fragment/noise tokens
_QC_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


@register(
    "text_quality_classifier",
    oracle=f"""
        WITH f AS (
            SELECT doc_id,
                   string_split(text, ' ') AS t
            FROM documents
            WHERE len(string_split(text, ' ')) > 0
        ),
        feat AS (
            SELECT doc_id,
                   CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
                   CAST(len(list_filter(t, x -> x IN {_QC_STOPWORDS}))
                        AS DOUBLE) / len(t) AS stop_ratio,
                   CAST(list_sum([len(x) for x in t]) AS DOUBLE) / len(t)
                       AS mean_len
            FROM f
        )
        SELECT doc_id,
               round(ttr, 6) AS ttr,
               round(stop_ratio, 6) AS stop_ratio,
               round(mean_len, 6) AS mean_len,
               round({_QC_BIAS} + {_QC_W_TTR} * ttr
                     + {_QC_W_STOP} * stop_ratio
                     - {_QC_W_MEANLEN} * mean_len, 6) AS logit,
               ({_QC_BIAS} + {_QC_W_TTR} * ttr
                     + {_QC_W_STOP} * stop_ratio
                     - {_QC_W_MEANLEN} * mean_len) >= 0 AS keep
        FROM feat
    """,
    doc="model-based quality filter (the fastText-classifier corpus "
    "gate, GPT-3/CCNet style) with deterministic fixed weights standing "
    "in for the trained artifact: type-token ratio, stopword ratio, and "
    "mean token length feed a linear logit; keep = logit >= 0 is "
    "exactly the sigmoid-0.5 decision with no libm parity risk. Scale "
    "shape: pure map-only Catalyst over the token array — 100 TB "
    "scores at scan speed, no shuffle, no UDF",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    t = F.split(F.col("text"), " ")
    n = F.size(t).cast("double")
    ttr = F.size(F.array_distinct(t)) / n
    stop_lits = F.array(*[F.lit(s) for s in _QC_STOPWORDS])
    stop_ratio = (
        F.size(F.filter(t, lambda x: F.array_contains(stop_lits, x))) / n
    )
    mean_len = (
        F.aggregate(
            F.transform(t, F.length), F.lit(0), lambda acc, x: acc + x
        ).cast("double")
        / n
    )
    logit = (
        F.lit(_QC_BIAS)
        + F.lit(_QC_W_TTR) * ttr
        + F.lit(_QC_W_STOP) * stop_ratio
        - F.lit(_QC_W_MEANLEN) * mean_len
    )
    return (
        d.where(F.size(t) > 0)
        .select(
            "doc_id",
            F.round(ttr, 6).alias("ttr"),
            F.round(stop_ratio, 6).alias("stop_ratio"),
            F.round(mean_len, 6).alias("mean_len"),
            F.round(logit, 6).alias("logit"),
            (logit >= 0).alias("keep"),
        )
    )


@register(
    "text_novelty_fraction",
    oracle=r"""
        WITH sh AS (
            SELECT DISTINCT doc_id, g AS shingle FROM (
                SELECT doc_id,
                       unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)]) AS g
                FROM (SELECT doc_id, string_split(text, ' ') AS w
                      FROM documents WHERE text IS NOT NULL)
                WHERE len(w) >= 3
            )
        ),
        first AS (
            SELECT shingle, MIN(doc_id) AS first_id
            FROM sh GROUP BY shingle
        )
        SELECT sh.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(*) FILTER (WHERE first.first_id = sh.doc_id)
                    AS BIGINT) AS n_novel,
               round(CAST(COUNT(*) FILTER (WHERE first.first_id = sh.doc_id)
                          AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
        FROM sh JOIN first USING (shingle)
        GROUP BY sh.doc_id
    """,
    doc="per-document NOVELTY: the fraction of a doc's distinct word "
    "3-grams whose corpus-wide FIRST occurrence (min doc_id, the "
    "deterministic corpus order) is this doc — the dedup-aware "
    "curation signal that separates original content from recombined "
    "boilerplate before any pair-level dedup runs. Scale shape: one "
    "shingle explode, a partial-aggregated min per shingle (map-side "
    "combine keeps hot stop-grams benign — a window min would put "
    "every occurrence of a mega-shingle in one partition), one "
    "shuffle join back on shingle, one doc_id agg; no all-pairs path",
)
def text_novelty_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import exploded_shingles

    from pyspark.storagelevel import StorageLevel

    d = load_tables(spark, sf_dir, "documents")["documents"].where(
        F.col("text").isNotNull()
    )
    # consumed twice (first-occurrence agg + the join back): persist
    # the exploded rows — NOT the documents — so the corpus split +
    # shingle explode runs once (the operators/dedup.py persist
    # discipline); MEMORY_AND_DISK spills gracefully at scale and the
    # ContextCleaner drops the blocks once the plan is unreferenced
    sh = exploded_shingles(d, "doc_id", "text", 3, id_out="doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_id"))
    novel = F.sum(
        F.when(F.col("first_id") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty"),
        )
    )
