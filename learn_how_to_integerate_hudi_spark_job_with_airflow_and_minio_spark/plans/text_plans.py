"""Driver-gated text-analysis queries (operators/text.py) over the
``documents`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import text as T
from ..session import load_tables
from .catalog import register

_TOK = r"string_split_regex(trim(text), '\s+')"


@register(
    "text_token_stats",
    oracle=f"""
        SELECT doc_id,
               length(text)                                   AS n_chars,
               len({_TOK})                                    AS n_tokens,
               len(list_distinct({_TOK}))                     AS n_distinct_tokens
        FROM documents
    """,
    doc="token counting (whitespace tokenizer): totals + distinct per doc",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        T.token_count(t).cast("long").alias("n_tokens"),
        T.distinct_token_count(t).cast("long").alias("n_distinct_tokens"),
    )


@register(
    "text_quality",
    oracle=f"""
        SELECT doc_id,
               length(text) AS n_chars,
               len({_TOK})  AS n_tokens,
               CAST(len(list_distinct({_TOK})) AS DOUBLE) / len({_TOK}) AS type_token_ratio,
               CAST(len(list_filter({_TOK}, t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                   / len({_TOK})                              AS stopword_ratio,
               CAST(length(text) - (len({_TOK}) - 1) AS DOUBLE) / len({_TOK}) AS avg_token_len
        FROM documents
    """,
    doc="quality scoring features: length/type-token/stopword/word-length "
    "ratios — the cheap pre-filter stage of a training-data pipeline",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    feats = T.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_chars"].cast("long").alias("n_chars"),
        feats["n_tokens"].cast("long").alias("n_tokens"),
        feats["type_token_ratio"].alias("type_token_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["avg_token_len"].alias("avg_token_len"),
    )


def _sql_lang_score(words: list[str]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_TOK}, t -> t IN ({inlist})))"


_LANG_SCORES = {
    lang: _sql_lang_score(words) for lang, words in T.LANG_STOPWORDS.items()
}
_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang in T.LANG_STOPWORDS) + ")"
_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN s_{lang} = {_BEST} AND {_BEST} > 0 THEN '{lang}'"
        for lang in T.LANG_STOPWORDS
    )
    + " ELSE 'unknown' END"
)


@register(
    "text_langid",
    oracle=f"""
        SELECT doc_id, lang AS labeled_lang, s_en, s_es, s_de, s_fr,
               {_LANG_CASE} AS detected_lang
        FROM (
            SELECT doc_id, lang,
                   {_LANG_SCORES['en']} AS s_en,
                   {_LANG_SCORES['es']} AS s_es,
                   {_LANG_SCORES['de']} AS s_de,
                   {_LANG_SCORES['fr']} AS s_fr
            FROM documents
        )
    """,
    doc="language ID by stopword-hit argmax (n-gram heuristic router); "
    "deterministic tie-break by language order",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    t = F.col("text")
    scores = T.lang_scores(t)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[scores[lang].cast("long").alias(f"s_{lang}") for lang in T.LANG_STOPWORDS],
        T.lang_id(t).alias("detected_lang"),
    )


@register(
    "text_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   string_split_regex(trim(text), '\\s+'))), ' ')) AS fingerprint,
               COUNT(*) OVER (PARTITION BY md5(array_to_string(list_sort(list_distinct(
                   string_split_regex(trim(text), '\\s+'))), ' '))) AS group_size
        FROM documents
    """,
    doc="document fingerprinting: md5 over the canonical (sorted distinct) "
    "token set + duplicate-group sizes",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    fp = T.fingerprint(F.col("text"))
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.count(F.lit(1))
        .over(Window.partitionBy(fp))
        .alias("group_size"),
    )
