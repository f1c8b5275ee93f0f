"""Record linkage / fuzzy matching (extension mandate — SURVEY §2.5).

Approximate string matching at scale follows the dedup playbook:
a cheap BLOCKING key bounds the candidate space (only pairs sharing a
block are compared), then the exact edit-distance predicate runs on the
candidates only. All built-in expressions (levenshtein/soundex are JVM
functions); the block join is an equi-join Catalyst shuffles on the
block key — never an all-pairs cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column,
    max_dist: int = 2,
) -> DataFrame:
    """(id_1, id_2, dist) for pairs with levenshtein ≤ ``max_dist``
    sharing a blocking key. ``block`` is any expression over the input
    row (first token, soundex, length bucket, ...) — recall depends on
    the blocking choice, cost is Σ block² instead of n²."""
    keyed = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_s"), block.alias("_blk")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    dist = F.levenshtein(F.col("a._s"), F.col("b._s"))
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .where(dist <= max_dist)
        .select(
            F.col("a._id").alias("id_1"),
            F.col("b._id").alias("id_2"),
            dist.cast("long").alias("dist"),
        )
    )
