"""Second text batch: BPE-ish regex tokenization, normalization/
cleaning, PII-style redaction, and deterministic stratified sampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from .catalog import register

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
# symbol — the GPT-2-style split approximated with an engine-portable
# character-class regex (no \w differences between Java and RE2).
_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "text_bpe_token_count",
    oracle=f"""
        SELECT doc_id,
               len(string_split_regex(trim(text), '\\s+'))  AS ws_tokens,
               len(regexp_extract_all(text, '{_BPE_RE}'))   AS bpe_tokens,
               CAST(n_chars AS DOUBLE)
                   / len(regexp_extract_all(text, '{_BPE_RE}')) AS chars_per_token
        FROM documents
    """,
    doc="token counting both ways the brief asks for: whitespace split + "
    "a BPE-ish regex pre-tokenizer (letter runs / digit runs / symbols); "
    "chars-per-token is the usual budget estimator",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        (F.col("n_chars").cast("double") / bpe).alias("chars_per_token"),
    )


@register(
    "text_normalize",
    oracle="""
        SELECT doc_id,
               regexp_replace(lower(trim(text)), ' +', ' ', 'g')   AS norm_ws,
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')  AS alnum_only,
               substr(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), 1, 64) AS norm_prefix
        FROM documents
    """,
    doc="text normalization/cleaning: case-fold, whitespace collapse, "
    "non-alphanumeric strip — the canonical pre-dedup cleanup stage",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    return d.select(
        "doc_id",
        norm.alias("norm_ws"),
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "").alias(
            "alnum_only"
        ),
        F.substring(norm, 1, 64).alias("norm_prefix"),
    )


@register(
    "text_redact_pii",
    oracle="""
        SELECT p_partkey,
               regexp_replace(
                   concat('contact user', CAST(p_partkey AS STRING),
                          '@example.com or +1-555-',
                          lpad(CAST(p_partkey % 10000 AS STRING), 4, '0'),
                          ' re: ', p_name),
                   '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g') AS email_redacted,
               regexp_replace(
                   concat('contact user', CAST(p_partkey AS STRING),
                          '@example.com or +1-555-',
                          lpad(CAST(p_partkey % 10000 AS STRING), 4, '0'),
                          ' re: ', p_name),
                   '\\+?[0-9][0-9-]{6,}', '<PHONE>', 'g') AS phone_redacted
        FROM part
    """,
    doc="PII-style redaction (regex masking of emails/phone shapes) over "
    "synthesized contact strings — the masking stage of a training-data "
    "pipeline, engine-portable regexes",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, "part")["part"]
    contact = F.concat(
        F.lit("contact user"),
        F.col("p_partkey").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("p_partkey") % 10000).cast("string"), 4, "0"),
        F.lit(" re: "),
        F.col("p_name"),
    )
    return p.select(
        "p_partkey",
        F.regexp_replace(contact, r"[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>").alias(
            "email_redacted"
        ),
        F.regexp_replace(contact, r"\+?[0-9][0-9-]{6,}", "<PHONE>").alias(
            "phone_redacted"
        ),
    )


@register(
    "sample_stratified_deterministic",
    oracle="""
        SELECT lang, doc_id
        FROM (
            SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
            FROM documents
        )
        WHERE rn % 5 = 1
    """,
    doc="deterministic stratified (systematic) sampling: every 5th doc "
    "per language stratum by key order — reproducible sampling for "
    "train/eval splits (rand()-based sampling is run-dependent; "
    "key-systematic is not)",
)
def sample_stratified_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_tables(spark, sf_dir, "documents")["documents"]
    w = W.partitionBy("lang").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") % 5 == 1)
        .select("lang", "doc_id")
    )


@register(
    "fuzzy_match_pairs",
    oracle="""
        WITH p AS (
            SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
            FROM part
        )
        SELECT a.p_partkey AS id_1,
               b.p_partkey AS id_2,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM p a
        JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 5
    """,
    doc="record linkage: fuzzy name pairs (levenshtein ≤ 5) with "
    "first-token blocking — candidates bounded by block sizes, never "
    "an all-pairs cross join",
)
def fuzzy_match_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import fuzzy_match_pairs

    p = load_tables(spark, sf_dir, "part")["part"]
    return fuzzy_match_pairs(
        p, "p_partkey", "p_name",
        block=F.split(F.col("p_name"), " ").getItem(0),
        max_dist=5,
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
            FROM documents
        ),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf, rnk
        FROM (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
                   ) AS rnk
            FROM scored
        )
        WHERE rnk <= 3
    """,
    doc="TF-IDF top-3 terms per document (term frequency × smoothed "
    "inverse document frequency): explode → two aggregates (per-doc tf, "
    "corpus df) → broadcast-joined scoring → per-doc window top-k; "
    "scores rounded before ranking for cross-engine rank stability",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..operators.text import tokens

    d = load_tables(spark, sf_dir, "documents")["documents"]
    n_docs = d.count()
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_t), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )


@register(
    "text_pack_sequences",
    # Chunked packing is deterministic given an explicit order:
    # pack_id = floor(preceding-cumsum / budget) over (lang, doc_id
    # ascending) — both engines compute the identical window cumsum.
    oracle=r"""
        SELECT doc_id, lang, n_tokens,
               CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 4096) AS BIGINT)
                   AS pack_id
        FROM (
            SELECT doc_id, lang,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                       AS n_tokens,
                   SUM(CAST(len(string_split_regex(trim(text), '\s+'))
                            AS BIGINT)) OVER (
                       PARTITION BY lang ORDER BY doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM documents
        )
    """,
    doc="sequence packing for training data loading: assign each doc a "
    "pack_id so every pack holds ~4096 tokens (chunked greedy in "
    "deterministic (lang, doc_id) order — one window cumsum per "
    "language partition, no UDFs, no shuffle beyond the window)",
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_tables(spark, sf_dir, "documents")["documents"]
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    w = (
        W.partitionBy("lang")
        .orderBy(F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        d.select("doc_id", "lang", n_tokens.alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor((F.col("cum") - F.col("n_tokens")).cast("double") / 4096)
            .cast("long")
            .alias("pack_id"),
        )
    )


# Portable md5-fraction (first 6 hex nibbles as an integer / 2^24),
# rebuilt in DuckDB as a strpos polynomial — md5 is bit-identical across
# engines, and k/2^24 is exact in double.
_DUCK_MD5_FRAC = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), {k + 1}, 1)) - 1)"
        f" * {16 ** (5 - k)}"
        for k in range(6)
    )
    + ") / 16777216.0"
)

_MIX_RATES = {f"src{i}": r for i, r in zip(range(20), [1.0] * 5 + [0.5] * 5 + [0.25] * 5 + [0.1] * 5)}

_MIX_CASE = (
    "CASE "
    + " ".join(f"WHEN source = '{s}' THEN {r}" for s, r in _MIX_RATES.items())
    + " ELSE 1.0 END"
)


@register(
    "sample_domain_mix",
    oracle=f"""
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   {_DUCK_MD5_FRAC} AS frac,
                   {_MIX_CASE} AS rate
            FROM documents
        ) WHERE frac < rate
    """,
    doc="domain-mix sampling: per-source deterministic retention rates "
    "(1.0/0.5/0.25/0.1 bands) via md5-fraction membership — map-only, "
    "reproducible across runs and engines (the training-mixture "
    "down-weighting op); rate-solver helper tested in pytest",
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import domain_mix_sample

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return domain_mix_sample(d, "doc_id", "source", _MIX_RATES).select(
        "doc_id", "source"
    )


@register(
    "text_repetition_gopher",
    oracle=r"""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        g AS (
            SELECT doc_id,
                   [w[i] || ' ' || w[i+1] for i in range(1, len(w))] g2,
                   [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                    for i in range(1, len(w) - 1)] g3
            FROM toks
        )
        SELECT doc_id,
               CAST(len(g2) AS BIGINT) AS n_2grams,
               round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                     / nullif(CAST(len(g2) AS DOUBLE), 0), 6) AS dup_2gram_frac,
               CAST(len(g3) AS BIGINT) AS n_3grams,
               round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
                     / nullif(CAST(len(g3) AS DOUBLE), 0), 6) AS dup_3gram_frac,
               (round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE)
                      / nullif(CAST(len(g2) AS DOUBLE), 0), 6) <= 0.2
                AND round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
                          / nullif(CAST(len(g3) AS DOUBLE), 0), 6) <= 0.18)
                   AS gopher_keep
        FROM g
    """,
    doc="Gopher-style repetition quality signals (Rae et al. 2021 A1): "
    "duplicate 2-/3-gram fractions + keep decision at the paper's "
    "0.2/0.18 thresholds — map-only Catalyst array math, the standard "
    "boilerplate/SEO-spam filter stage of a training-data pipeline",
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import repetition_signals

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return repetition_signals(d, "text").select(
        "doc_id",
        "n_2grams",
        "dup_2gram_frac",
        "n_3grams",
        "dup_3gram_frac",
        (
            (F.col("dup_2gram_frac") <= 0.2) & (F.col("dup_3gram_frac") <= 0.18)
        ).alias("gopher_keep"),
    )


@register(
    "sample_exact_k_per_stratum",
    oracle="""
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ) AS rn
            FROM documents
        ) WHERE rn <= 50
    """,
    doc="deterministic exact-k sample per stratum: rank rows by md5(id) "
    "inside each source and keep the first 50 — reservoir-sampling "
    "semantics without randomness (reproducible across runs/engines), "
    "one shuffle + per-partition top-k; the eval-set carving op",
)
def sample_exact_k_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_tables(spark, sf_dir, "documents")["documents"]
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .select("doc_id", "source")
    )


def _duck_md5_frac_of(inner: str) -> str:
    """The portable md5-fraction polynomial over an arbitrary DuckDB
    string expression (the ``_DUCK_MD5_FRAC`` technique generalized)."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({inner}), {k + 1}, 1)) - 1)"
            f" * {16 ** (5 - k)}"
            for k in range(6)
        )
        + ") / 16777216.0"
    )


@register(
    "sample_group_split",
    oracle=f"""
        SELECT doc_id, md5(text) AS dup_group,
               CASE WHEN {_duck_md5_frac_of("'0|' || md5(text)")} < 0.8
                    THEN 'train'
                    WHEN {_duck_md5_frac_of("'0|' || md5(text)")} < 0.9
                    THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
        WHERE text IS NOT NULL
    """,
    doc="leakage-safe train/valid/test split (80/10/10): the split is "
    "a pure md5-fraction function of the exact-dup GROUP (md5 of the "
    "text), so byte-identical documents always land in the same split "
    "— row-id splits leak train content into eval through duplicates. "
    "Map-only, one md5 per row, reproducible across runs and engines",
)
def sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import group_split

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return group_split(
        d.where(F.col("text").isNotNull()),
        F.md5(F.col("text")),
        [("train", 0.8), ("valid", 0.1), ("test", 0.1)],
    ).select("doc_id", F.md5(F.col("text")).alias("dup_group"), "split")


def token_budget_ctes(extra_cols: str = "") -> str:
    """The unique-token-ratio score + greedy 10k-token budget carve as
    DuckDB CTEs (``t`` → ``c`` → ``sel``), shared VERBATIM between
    ``sample_token_budget`` and ``pipeline_train_split_gold`` so the
    composition query can never drift from the stage it certifies (r14
    second-review finding — they were copy-pasted). ``extra_cols``
    (e.g. ``", text"``) threads passthrough columns to ``sel``."""
    return f"""
        WITH t AS (
            SELECT doc_id{extra_cols},
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   round(CAST(len(list_distinct(string_split(text, ' ')))
                              AS DOUBLE)
                         / CAST(len(string_split(text, ' ')) AS DOUBLE),
                         6) AS score
            FROM documents
            WHERE text IS NOT NULL
        ),
        c AS (
            SELECT doc_id{extra_cols}, n_tokens, score,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY score DESC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS strt
            FROM t
        ),
        sel AS (
            SELECT doc_id{extra_cols}, score, n_tokens,
                   strt + n_tokens AS cum_tokens
            FROM c WHERE strt + n_tokens <= 10000
        )
    """


def unique_ratio_scored(d: DataFrame) -> DataFrame:
    """Spark side of ``token_budget_ctes``'s ``t`` stage: (doc_id,
    n_tokens, unique-token-ratio score) over non-null texts — shared so
    the pipeline composition and the stage query stay provably
    identical."""
    toks = F.split(F.col("text"), " ")
    return d.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double"),
            6,
        ).alias("score"),
    )


@register(
    "sample_token_budget",
    oracle=token_budget_ctes()
    + "SELECT doc_id, score, n_tokens, cum_tokens FROM sel",
    doc="token-budget corpus selection: keep the highest-quality "
    "documents (unique-token ratio, ties by id) whose tokens fit "
    "fully inside a 10k budget — the fixed-size training-mix carve. "
    "Scale: distributed two-phase prefix sum over quantized score "
    "bands (the pack_sequences kernel shape) with pre-window budget "
    "pruning of whole bands; never a single-partition corpus window",
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import token_budget_select

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return token_budget_select(
        unique_ratio_scored(d), "doc_id", "n_tokens", "score",
        budget=10_000,
    )


_DSIR_SQL = r"""
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
    FROM documents
),
tgt AS (
    SELECT t.doc_id, t.w
    FROM tok t JOIN documents d ON t.doc_id = d.doc_id AND d.lang = 'en'
),
cr AS (SELECT w, COUNT(*) AS c_r FROM tok GROUP BY w),
ct AS (SELECT w, COUNT(*) AS c_t FROM tgt GROUP BY w),
wt AS (
    SELECT cr.w,
           ln((COALESCE(ct.c_t, 0) + 1) * 1.0
              / ((SELECT SUM(c_t) FROM ct) + (SELECT COUNT(*) FROM cr)))
         - ln((cr.c_r + 1) * 1.0
              / ((SELECT SUM(c_r) FROM cr) + (SELECT COUNT(*) FROM cr)))
               AS lr
    FROM cr LEFT JOIN ct USING (w)
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       round(SUM(lr), 6) AS dsir_logweight
FROM tok JOIN wt USING (w)
GROUP BY doc_id
    """


@register(
    "text_dsir_importance",
    # Laplace-smoothed unigram log importance weights (DSIR, Xie et al.
    # 2023 "Data Selection for Language Models via Importance
    # Resampling"): weight(doc) = Σ_tokens ln p_target(w) − ln p_raw(w),
    # target = the English subset, raw = the whole candidate pool.
    # Per-token ln values are deterministic given the integer counts;
    # the per-doc sum is rounded to 6 decimals on both sides (float
    # summation order differs between engines by ~1e-13).
    oracle=_DSIR_SQL,
    doc="DSIR importance weights (Xie et al. 2023): per-doc sum of "
    "smoothed unigram log-probability ratios between a target domain "
    "(English docs) and the raw pool — the standard pretraining-data "
    "selection score. Two partial-aggregatable word counts, a "
    "broadcast 1-row totals join, one word-keyed equi-join; no "
    "driver-side scalars, no UDFs",
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_weights(spark, sf_dir)


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens

    d = load_tables(spark, sf_dir, "documents")["documents"]
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    tgt = tok.join(
        d.where(F.col("lang") == "en").select("doc_id"), "doc_id", "left_semi"
    )
    cr = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c_r"))
    ct = tgt.groupBy("w").agg(F.count(F.lit(1)).alias("c_t"))
    wt = cr.join(ct, "w", "left").na.fill({"c_t": 0})
    # corpus totals as a broadcast 1-row join, NOT collected scalars —
    # the plan stays fully distributed. Joined on a constant key so the
    # plan is a BroadcastHashJoin, not a nested-loop cross join.
    totals = wt.agg(
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    ).withColumn("_one", F.lit(1))
    wt = (
        wt.withColumn("_one", F.lit(1))
        .join(F.broadcast(totals), "_one")
        .drop("_one")
        .withColumn(
            "lr",
            F.log((F.col("c_t") + 1) / (F.col("n_t") + F.col("v")))
            - F.log((F.col("c_r") + 1) / (F.col("n_r") + F.col("v"))),
        )
        .select("w", "lr")
    )
    return (
        tok.join(wt, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lr"), 6).alias("dsir_logweight"),
        )
    )


@register(
    "sample_dsir_top_k",
    # The actual SELECTION step of DSIR: rank the pool by importance
    # weight and keep the top k. Ordering is on the ROUNDED weight
    # (ties broken by doc_id) so the k-boundary is identical in both
    # engines regardless of float summation order.
    oracle="SELECT doc_id, n_tokens, dsir_logweight FROM ("
    + _DSIR_SQL
    + ") ORDER BY dsir_logweight DESC, doc_id LIMIT 100",
    doc="DSIR selection: top-100 documents by importance weight — "
    "Spark plans orderBy+limit as TakeOrderedAndProject (per-partition "
    "top-k, then a k-row merge on one reducer), so the global sort "
    "never materializes; deterministic tie-break on (rounded weight, "
    "doc_id)",
)
def sample_dsir_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _dsir_weights(spark, sf_dir)
    return w.orderBy(F.desc("dsir_logweight"), F.asc("doc_id")).limit(100)


def _duck_u(expr: str) -> str:
    """DuckDB mirror of weighted_reservoir_sample's uniform draw:
    (first-6-nibble md5 integer + 1) / 2^24 ∈ (0, 1] — exact dyadic."""
    poly = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {j + 1}, 1)) - 1)"
        f" * {16 ** (5 - j)}"
        for j in range(6)
    )
    return f"((({poly}) + 1) / 16777216.0)"


@register(
    "sample_weighted_reservoir",
    # ln() is the one non-exact op: both engines evaluate it on the SAME
    # exact double, and a selection flip needs the rank-k/rank-k+1 keys
    # within an ulp of each other — vanishing at any corpus size, with
    # (key, doc_id) as the in-engine tie-break.
    oracle=f"""
        SELECT doc_id, source, n_chars FROM (
            SELECT doc_id, source, n_chars,
                   -ln({_duck_u("'7|' || CAST(doc_id AS VARCHAR)")})
                       / CAST(n_chars AS DOUBLE) AS es_key
            FROM documents
            WHERE CAST(n_chars AS DOUBLE) > 0
        )
        ORDER BY es_key ASC, doc_id ASC
        LIMIT 50
    """,
    doc="weighted sampling without replacement (Efraimidis-Spirakis "
    "A-ES): deterministic md5 uniform -> key = -ln(u)/weight -> global "
    "k-smallest. Compiles to TakeOrderedAndProject: per-partition "
    "top-k heaps + driver merge of p*k rows, never a full sort — the "
    "length-weighted corpus subsample at 100 TB is one map pass",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_reservoir_sample

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return weighted_reservoir_sample(
        d.select("doc_id", "source", "n_chars"),
        id_col="doc_id",
        weight_col="n_chars",
        k=50,
        seed=7,
    )


# BM25 retrieval queries: fixed literal term sets (the corpus is the
# synthetic word-salad documents table, so these are common terms with
# distinct document-frequency profiles per query).
_BM25_QUERIES = [
    (1, "spark"), (1, "merge"), (1, "batch"),
    (2, "hash"), (2, "join"), (2, "sort"),
    (3, "window"), (3, "table"), (3, "key"),
]


@register(
    "text_bm25_search",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS term
            FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        n AS (
            SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                   (SELECT COUNT(*) FROM tok) AS total
        ),
        q(query_id, term) AS (VALUES
            (1,'spark'),(1,'merge'),(1,'batch'),
            (2,'hash'),(2,'join'),(2,'sort'),
            (3,'window'),(3,'table'),(3,'key')
        ),
        tf AS (
            SELECT CAST(q.query_id AS BIGINT) AS query_id, tok.term,
                   tok.doc_id, COUNT(*) AS tf
            FROM tok JOIN q ON q.term = tok.term
            GROUP BY 1, 2, 3
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok
            WHERE term IN (SELECT DISTINCT term FROM q)
            GROUP BY term
        ),
        scored AS (
            SELECT tf.query_id, tf.doc_id,
                   CAST(round(
                       round(ln((CAST(n.n_docs AS DOUBLE) - df.df + 0.5)
                                / (df.df + 0.5) + 1.0), 6)
                       * ((tf.tf * CAST(2.2 AS DOUBLE))
                          / (tf.tf + 1.2 * (0.25 + 0.75
                             * (dl.dl / (CAST(n.total AS DOUBLE)
                                         / n.n_docs))))),
                   6) AS DECIMAL(18,6)) AS ts
            FROM tf
            JOIN df USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN n
        ),
        agg AS (
            SELECT query_id, doc_id,
                   CAST(CAST(SUM(ts) AS VARCHAR) AS DOUBLE) AS score
            FROM scored GROUP BY 1, 2
        )
        SELECT query_id, doc_id, score, rnk
        FROM (
            SELECT query_id, doc_id, score,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, doc_id ASC
                   ) AS rnk
            FROM agg
        )
        WHERE rnk <= 5
    """,
    doc="BM25 ranked retrieval (k1=1.2, b=0.75, Lucene-style "
    "ln(1 + (N-df+0.5)/(df+0.5)) idf) — the retrieval-quality "
    "counterpart to text_tfidf_top_terms: query terms broadcast into "
    "the exploded token stream, so only matching postings survive the "
    "first join (at 100 TB the per-term posting lists, never the "
    "corpus, flow through tf/df aggregation); doc-length "
    "normalization joins one COUNT-per-doc aggregate; idf rounded to 6dp "
    "before the product (ln is the one non-portable libm op), per-term "
    "scores rounded to 6dp and summed as DECIMAL so both engines rank "
    "identical exact values (ties broken by doc_id); top-5 per query "
    "via one window",
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..operators.text import tokens

    d = load_tables(spark, sf_dir, "documents")["documents"]
    n_docs = d.count()
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    total_tokens = tok.count()
    avgdl = total_tokens / n_docs  # exact IEEE division of two ints
    qterms = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, term string"
    )
    tf = (
        tok.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    # ln() is the one libm op with cross-engine ulp drift (BASELINE
    # history) — round the idf itself to 6dp on BOTH sides so the later
    # product-level round(.,6) never sees a boundary-tie seeded by ln.
    idf = F.round(
        F.log(
            (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
            + 1.0
        ),
        6,
    )
    tfn = (F.col("tf") * 2.2) / (
        F.col("tf")
        + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.lit(avgdl)))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.round(idf * tfn, 6).cast("decimal(18,6)").alias("ts"),
        )
    )
    from .common import as_double

    agg = scored.groupBy("query_id", "doc_id").agg(
        as_double(F.sum("ts")).alias("score")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
    )
