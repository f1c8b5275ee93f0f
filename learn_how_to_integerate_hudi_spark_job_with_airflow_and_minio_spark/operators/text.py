"""Text-analysis operators for training-data pipelines (north-star
extension mandate; no reference analog — SURVEY §2.5).

Everything here is built-in Catalyst expressions (split/transform/
aggregate/md5) — JVM-side, whole-stage-codegen'd, no UDFs — so the ops
run at fact-table scale as pure map work (no shuffle at all until an
aggregation is asked for).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small: language ID at pipeline scale is a
# first-pass router, not a classifier.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "que"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on one-or-more whitespace)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word-level n-gram shingles (the dedup unit)."""
    w = F.split(text, " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def exploded_shingles(df, id_col: str, text_col: str, n: int = 3,
                      id_out: str = "_id", out: str = "shingle"):
    """(id, shingle) rows: one per distinct word n-gram, with BOTH
    inline hazards avoided — the token array is staged behind a
    projection (else each ``element_at`` re-splits the document,
    O(tokens²) per row), and the shingle array feeds ``explode`` as an
    EXPRESSION, not a projected column (a projected array column is
    materialized into an UnsafeRow before the Generate, ~2× on the
    shingle scan: 7.0s vs 3.5s inline vs 0.3s this shape at sf0.1)."""
    w = F.col("__tok")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    arr = F.when(F.size(w) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )
    return df.withColumn("__tok", F.split(F.col(text_col), " ")).select(
        F.col(id_col).alias(id_out), F.explode(arr).alias(out)
    )


def shingle_column(df, text_col: str, out_col: str, n: int = 3,
                   distinct: bool = True):
    """Append a word n-gram array column with the token array staged
    behind a projection boundary.

    The inline expression (:func:`word_shingles`)
    references the ``split`` result once per ``element_at``, and Catalyst
    does not share that subexpression — each element access re-splits
    the document, O(tokens²) per row (measured 10× on the sf0.1 shingle
    scan: 3.7s → 0.3s). Staging the token array as its own projected
    column makes CollapseProject keep the boundary (the alias is
    referenced more than once and is non-trivial), so the split runs
    once per row and every shingle-based operator inherits the fix."""
    w_col = f"__tok_{out_col}"
    w = F.col(w_col)
    g = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    if distinct:
        g = F.array_distinct(g)
    return (
        df.withColumn(w_col, F.split(F.col(text_col), " "))
        .withColumn(
            out_col,
            F.when(F.size(w) >= n, g).otherwise(F.array().cast("array<string>")),
        )
        .drop(w_col)
    )


def repetition_signals(df, text_col: str = "text"):
    """Gopher-style repetition filters (Rae et al. 2021, "Scaling
    Language Models", table A1): fraction of duplicate n-grams in a
    document. Heavily repetitive documents (boilerplate, SEO spam,
    degenerate generations) score high and get filtered before
    training. Map-only Catalyst array expressions — no shuffle, no UDFs.

    Takes and returns a DataFrame (appends ``n_2grams``,
    ``dup_2gram_frac``, ``n_3grams``, ``dup_3gram_frac``) rather than a
    dict of Columns: the n-gram arrays MUST be materialized behind
    projection boundaries, because Catalyst does not share common
    subexpressions across output columns — inlining the transform into
    four derived columns re-evaluates the O(tokens) array build per
    column (measured 17.8s → 0.6s at sf0.1 for this exact query)."""
    frac = lambda n, d: F.round(  # noqa: E731
        (n - d).cast("double") / F.nullif(n.cast("double"), F.lit(0.0)), 6
    )
    staged = shingle_column(
        shingle_column(df, text_col, "_g2", n=2, distinct=False),
        text_col,
        "_g3",
        n=3,
        distinct=False,
    )
    return (
        staged.withColumn("_n2", F.size("_g2"))
        .withColumn("_d2", F.size(F.array_distinct("_g2")))
        .withColumn("_n3", F.size("_g3"))
        .withColumn("_d3", F.size(F.array_distinct("_g3")))
        .withColumn("n_2grams", F.col("_n2").cast("long"))
        .withColumn("dup_2gram_frac", frac(F.col("_n2"), F.col("_d2")))
        .withColumn("n_3grams", F.col("_n3").cast("long"))
        .withColumn("dup_3gram_frac", frac(F.col("_n3"), F.col("_d3")))
        .drop("_g2", "_g3", "_n2", "_d2", "_n3", "_d3")
    )


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    """How many tokens are in the stopword list (built-in filter+size)."""
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t)))


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, type-token ratio,
    stopword ratio — the usual cheap filters before expensive pipeline
    stages. All exact integer/ratio arithmetic."""
    n_tok = token_count(text)
    n_chars = F.length(text)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_distinct_tokens": distinct_token_count(text),
        "type_token_ratio": (
            distinct_token_count(text).cast("double") / n_tok
        ),
        "stopword_ratio": (
            stopword_hits(text, LANG_STOPWORDS["en"]).cast("double") / n_tok
        ),
        "avg_token_len": (
            (n_chars - (n_tok - 1)).cast("double") / n_tok
        ),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: stopword_hits(text, words) for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties broken by the fixed
    language order; all-zero → 'unknown'."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    # reversed so that earlier languages win ties
    for lang in reversed(list(scores)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Canonical-form document fingerprint: md5 over the sorted distinct
    token set (a rolling-hash-class canonicalization — robust to word
    order and repetition)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))
