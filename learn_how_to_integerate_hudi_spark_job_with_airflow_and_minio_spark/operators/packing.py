"""Sequence packing for LLM training batches (concat-and-chunk).

Training pipelines feed fixed-length token sequences; packing documents
end-to-end and splitting at exact ``budget`` boundaries (docs may
straddle a boundary) is the standard GPT-style formulation — zero
padding waste, deterministic layout. The operator assigns every
document its global token interval ``[start, start + n)`` under a total
order, then explodes it over the budget bins it covers.

Scale design (100 TB): the global running sum is computed as a
DISTRIBUTED two-phase prefix sum, never a single-partition window —
1. bucket documents by id range (map-only);
2. one narrow aggregate gives per-bucket token totals;
3. a window over the *bucket totals* (thousands of rows, not the
   corpus) produces per-bucket prefix offsets;
4. offsets broadcast-join back and a window PARTITIONED BY bucket
   finishes the intra-bucket cumsum — every shuffle is bounded by the
   bucket count or co-partitioned by bucket.
The bin explode is map-side (``sequence`` + ``explode``); a document
adds one output row per bin it touches (≥1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    tokens_col: str,
    budget: int,
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """Pack documents (ordered by ``id_col``) into ``budget``-token bins.

    ``tokens_col`` is any per-document token count supplied upstream
    (a tokenizer output column; char counts work for byte-level
    budgets). Zero-token documents occupy no bin and are dropped.

    Returns one row per (document, bin) with scalar columns:
    ``id_col``, ``bin_id``, ``doc_offset`` (first packed token's offset
    within the doc), ``bin_offset`` (its position inside the bin), and
    ``n_tokens`` (tokens of this doc in this bin). A document fully
    inside one bin yields a single row; a straddling document yields
    one row per touched bin, n_tokens summing to its total.

    ``bucket_width``: id-range width of the prefix-sum buckets — size
    it so corpus_rows / bucket_width (the stage-3 window input) stays
    driver-window-friendly (≤ ~10⁶).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    b = docs.select(
        F.col(id_col), F.col(tokens_col).cast("long").alias("_n")
    ).withColumn("_bkt", F.floor(F.col(id_col) / F.lit(bucket_width)))
    totals = b.groupBy("_bkt").agg(F.sum("_n").alias("_tot"))
    w_off = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the only unpartitioned window runs over BUCKET TOTALS — bounded
    # by corpus_rows / bucket_width, not the corpus
    offs = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_bkt", "_off")
    w_cum = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        b.join(F.broadcast(offs), "_bkt")
        .withColumn(
            "_start",
            F.col("_off") + F.coalesce(F.sum("_n").over(w_cum), F.lit(0)),
        )
        .withColumn("_end", F.col("_start") + F.col("_n"))
        .where(F.col("_n") > 0)
    )
    bin_lo = F.floor(F.col("_start") / F.lit(budget))
    bin_hi = F.floor((F.col("_end") - 1) / F.lit(budget))
    packed = spans.withColumn(
        "bin_id", F.explode(F.sequence(bin_lo, bin_hi))
    )
    bin_start = F.col("bin_id") * F.lit(budget)
    seg_start = F.greatest(F.col("_start"), bin_start)
    seg_end = F.least(F.col("_end"), bin_start + F.lit(budget))
    return packed.select(
        F.col(id_col),
        F.col("bin_id"),
        (seg_start - F.col("_start")).alias("doc_offset"),
        (seg_start - bin_start).alias("bin_offset"),
        (seg_end - seg_start).alias("n_tokens"),
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bin fill stats over :func:`pack_sequences` output: documents
    per bin, packed tokens, and fill ratio (every bin but the last is
    exactly full under concat-and-chunk). One narrow aggregate."""
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.sum("n_tokens") / F.lit(float(budget))).alias("fill_ratio"),
    )
