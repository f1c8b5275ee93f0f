"""As-of (temporal) join — an operator Spark lacks natively.

Implemented as a composition of built-in DataFrame ops (SURVEY §7 item 6
preference order (a)): union the two sides, one window pass per group
carries the most recent right-side row forward, keep left rows. One
shuffle on the ``by`` keys, sort within partitions — no pandas, no
cartesian range explosion, scales to any partition count. (Same plan
shape Flink/kdb use for as-of; ``pd.merge_asof`` semantics.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    allow_exact_matches: bool = False,
    right_prefix: str = "matched_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts < left.ts`` (or ``<=`` when ``allow_exact_matches``) within
    the same ``by`` group; unmatched left rows keep nulls (left join).

    Right columns are emitted as ``{right_prefix}{col}``.
    """
    rpay = [c for c in right.columns if c not in by]
    # order marker: at equal ts, right sorts before left iff exact matches
    # are allowed (so the window frame up to current row includes it)
    l_mark, r_mark = (1, 0) if allow_exact_matches else (0, 1)

    l = left.select(
        *by,
        F.col(left_ts).alias("_ts"),
        F.lit(l_mark).alias("_mark"),
        F.lit(True).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r = right.select(
        *by,
        F.col(right_ts).alias("_ts"),
        F.lit(r_mark).alias("_mark"),
        F.lit(False).alias("_is_left"),
        F.struct(*[F.col(c) for c in rpay]).alias("_rrow"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        # _rrow as final key: deterministic winner among equal-ts right rows
        .orderBy(F.col("_ts").asc(), F.col("_mark").asc(), F.col("_rrow").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
        .where(F.col("_is_left"))
    )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in rpay
    ]
    return matched.select(*out_cols)
