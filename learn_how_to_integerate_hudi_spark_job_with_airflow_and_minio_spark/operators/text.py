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


def ngrams_all(text: Column, n: int) -> Column:
    """ALL word n-grams, duplicates preserved (vs ``word_shingles``'
    distinct sets) — the unit for repetition-ratio quality signals."""
    w = F.split(text, " ")
    g = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, g).otherwise(F.array().cast("array<string>"))


def repetition_signals(text: Column) -> dict[str, Column]:
    """Gopher-style repetition filters (Rae et al. 2021, "Scaling
    Language Models", table A1): fraction of duplicate n-grams in a
    document. Heavily repetitive documents (boilerplate, SEO spam,
    degenerate generations) score high and get filtered before
    training. All map-only Catalyst array expressions — no shuffle, no
    UDFs; cost is O(tokens) per row, which is the scan itself."""
    g2, g3 = ngrams_all(text, 2), ngrams_all(text, 3)
    n2, n3 = F.size(g2), F.size(g3)
    d2, d3 = F.size(F.array_distinct(g2)), F.size(F.array_distinct(g3))
    frac = lambda n, d: F.round(  # noqa: E731
        (n - d).cast("double") / F.nullif(n.cast("double"), F.lit(0.0)), 6
    )
    return {
        "n_2grams": n2.cast("long"),
        "dup_2gram_frac": frac(n2, d2),
        "n_3grams": n3.cast("long"),
        "dup_3gram_frac": frac(n3, d3),
    }


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
