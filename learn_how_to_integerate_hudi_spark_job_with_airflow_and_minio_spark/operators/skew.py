"""Skew-handling operators (SURVEY §7 item 7: salting for hot keys).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in build_session); these
explicit operators cover the two places AQE can't help:

- **salted_aggregate** — a low-cardinality/hot-key groupBy (e.g. 5 event
  types across 100 TB) puts each key on ONE reducer. Salting splits
  every key across ``salt`` reducers (partial per (key, salt), then
  final per key) — both phases map-side-combinable, max reducer load
  divided by ``salt``.
- **salted_join** — large⋈large on a hot key: the build side is
  replicated ``salt`` ways, the probe side deterministically salted by a
  high-cardinality column, so one hot key spreads over ``salt`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column] | None = None,
    count_alias: str = "n",
    salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase salted count/sum aggregate.

    ``sum_cols``: {alias: column-expression-to-sum} (expressions are
    evaluated in the partial phase; sums must be decomposable).
    ``salt_on``: a column whose hash spreads rows (defaults to a
    per-partition-unique id — deterministic result either way since sums
    and counts are reorderable).
    """
    salt_col = (
        F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt))
        if salt_on
        else F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    sum_cols = sum_cols or {}
    partial = (
        df.withColumn("_salt", salt_col)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_pn"),
            *[F.sum(expr).alias(f"_ps_{alias}") for alias, expr in sum_cols.items()],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_pn").alias(count_alias),
        *[F.sum(f"_ps_{alias}").alias(alias) for alias in sum_cols],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Inner equi-join with the right side replicated across ``salt``
    buckets and the left side deterministically salted — a hot join key
    spreads over ``salt`` shuffle tasks instead of one.

    Right-side rows are duplicated ``salt``× (use only when the right
    side is too big to broadcast but small enough to replicate)."""
    salt_col = (
        F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt))
        if salt_on
        else F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    l = left.withColumn("_salt", salt_col.cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, [key, "_salt"]).drop("_salt")
