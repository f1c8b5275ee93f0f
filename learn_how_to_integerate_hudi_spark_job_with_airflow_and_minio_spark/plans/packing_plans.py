"""Sequence-packing queries (LLM training-batch layout) over the
``documents`` table — gated demos of :mod:`..operators.packing`.

The budget is in document weight units; the demo uses the table's
``n_chars`` column (any upstream tokenizer count column works the same
way). The DuckDB oracle recomputes the concat-and-chunk layout with a
SERIAL window cumsum — the engine's distributed two-phase prefix sum
must produce bit-identical intervals."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import pack_sequences, pack_stats
from ..session import load_tables
from .catalog import register

_BUDGET = 2048

_PACK_CTE = f"""
    WITH c AS (
        SELECT doc_id, n_chars AS n,
               COALESCE(SUM(n_chars) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS s
        FROM documents
    ),
    e AS (
        SELECT doc_id, n, s, s + n AS f,
               UNNEST(generate_series(
                   CAST(FLOOR(s / {_BUDGET}.0) AS BIGINT),
                   CAST(FLOOR((s + n - 1) / {_BUDGET}.0) AS BIGINT)
               )) AS bin_id
        FROM c WHERE n > 0
    ),
    packed AS (
        -- BIGINT casts: DuckDB widens the window SUM to HUGEINT,
        -- Spark's is long — type classes must agree for the gate
        SELECT doc_id, bin_id,
               CAST(GREATEST(s, bin_id * {_BUDGET}) - s AS BIGINT)
                   AS doc_offset,
               CAST(GREATEST(s, bin_id * {_BUDGET}) - bin_id * {_BUDGET}
                    AS BIGINT) AS bin_offset,
               CAST(LEAST(f, (bin_id + 1) * {_BUDGET})
                    - GREATEST(s, bin_id * {_BUDGET}) AS BIGINT)
                   AS n_tokens
        FROM e
    )
"""


@register(
    "text_pack_chunk_spans",
    oracle=_PACK_CTE + "SELECT * FROM packed",
    doc="concat-and-chunk sequence packing (GPT-style fixed-length "
    "training batches): documents concatenated in doc_id order and "
    "split at exact budget boundaries, straddling docs emitting one "
    "row per touched bin — computed with a DISTRIBUTED two-phase "
    "prefix sum (per-bucket totals → tiny offsets window → "
    "co-partitioned intra-bucket cumsum; the only unpartitioned "
    "window runs over bucket totals, corpus_rows/bucket_width rows), "
    "never a single-partition corpus window; the oracle's serial "
    "cumsum must match interval-for-interval",
)
def text_pack_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return pack_sequences(
        docs, tokens_col="n_chars", budget=_BUDGET, bucket_width=64
    )


@register(
    "text_pack_bin_stats",
    oracle=_PACK_CTE
    + f"""
    SELECT bin_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_tokens) AS BIGINT) / {_BUDGET}.0 AS fill_ratio
    FROM packed GROUP BY bin_id
    """,
    doc="per-bin fill statistics over the packed layout: docs per bin, "
    "packed tokens, fill ratio — under concat-and-chunk every bin but "
    "the last is exactly full (fill_ratio 1.0), the zero-padding-waste "
    "property that makes this the standard training layout; one narrow "
    "aggregate over the packing output",
)
def text_pack_bin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    packed = pack_sequences(
        docs, tokens_col="n_chars", budget=_BUDGET, bucket_width=64
    )
    return pack_stats(packed, _BUDGET)
