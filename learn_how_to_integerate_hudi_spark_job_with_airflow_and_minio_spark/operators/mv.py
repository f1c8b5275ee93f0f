"""Incremental materialized-view maintenance from CDC deltas.

A grouped-aggregate MV (``GROUP BY g`` with COUNT + SUMs) is
*self-maintainable* under inserts/updates/deletes: each change row
contributes a bounded delta, so refreshing costs O(|changes|) instead of
O(|base table|) — the reason materialized views stay cheap at 100 TB.
The engine composes it from its own primitives: `Table.changes_full`
(before/after images, table.py) supplies the delta feed; the MV is
itself an engine `Table`, refreshed with an upsert of adjusted rows and
a delete of emptied groups.

Semantics per change row (the classical view-maintenance algebra,
Gupta & Mumick 1995):
- insert      → +1 / +measure      to the AFTER-image group
- delete      → −1 / −measure_before to the BEFORE-image group
- update      → both of the above (handles rows migrating between groups)

Exactness: measures should be DECIMAL columns in the MV schema — decimal
addition is associative and exact, so the incrementally-maintained sum
is bit-identical to a full recompute regardless of delta order. (Double
measures would drift by summation order.) MIN/MAX are NOT delta-
maintainable under deletes and are deliberately unsupported.

Scale design: the delta aggregation is partial-aggregatable (map-side
combine over the change feed); the merge joins the delta (small, keyed)
against the MV snapshot — at scale AQE broadcast-joins the delta side;
emptied-group deletes reuse the table kernel's pruned anti-join rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mv_delta(
    changes: DataFrame,
    group_col: str,
    measure_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Collapse a `changes_full` feed into one additive delta per group.

    Returns ``(group_col, count_col, *measure_cols)`` where each value is
    the signed contribution to apply; measures keep their input type
    (pass decimals for exact maintenance).
    """
    ct = F.col("_change_type")
    after = changes.where(ct != "delete").select(
        F.col(group_col).alias(group_col),
        F.lit(1).cast("long").alias(count_col),
        *[F.col(m).alias(m) for m in measure_cols],
    )
    before = changes.where(ct != "insert").select(
        F.col(f"{group_col}_before").alias(group_col),
        F.lit(-1).cast("long").alias(count_col),
        *[(-F.col(f"{m}_before")).alias(m) for m in measure_cols],
    )
    return (
        after.unionByName(before)
        .groupBy(group_col)
        .agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(m).alias(m) for m in measure_cols],
        )
    )


def incremental_mv_refresh(
    mv_table,
    changes: DataFrame,
    group_col: str,
    measure_cols: list[str],
    refresh_seq: str,
    count_col: str = "n_rows",
    precombine_col: str = "_refresh_seq",
) -> None:
    """Apply a CDC delta feed to a grouped-aggregate MV `Table` in place.

    ``mv_table`` must be keyed on ``group_col`` with schema
    ``(group_col, count_col, *measure_cols, precombine_col)``. Groups
    whose maintained count reaches zero are deleted from the MV.
    """
    delta = mv_delta(changes, group_col, measure_cols, count_col)
    cur = mv_table.snapshot().select(group_col, count_col, *measure_cols)
    # Spark widens decimal addition (precision+1); cast each maintained
    # measure back to the MV's declared type so repeated refreshes don't
    # creep the schema.
    types = dict(cur.dtypes)
    d = delta.select(
        F.col(group_col).alias("_g"),
        F.col(count_col).alias("_dn"),
        *[F.col(m).alias(f"_d_{m}") for m in measure_cols],
    )
    merged = cur.join(d, cur[group_col] == d["_g"], "full_outer").select(
        F.coalesce(cur[group_col], d["_g"]).alias(group_col),
        (
            F.coalesce(cur[count_col], F.lit(0)) + F.coalesce(d["_dn"], F.lit(0))
        ).alias(count_col),
        *[
            (F.coalesce(cur[m], F.lit(0)) + F.coalesce(F.col(f"_d_{m}"), F.lit(0)))
            .cast(types[m])
            .alias(m)
            for m in measure_cols
        ],
    )
    merged = merged.persist()
    try:
        upserts = merged.where(F.col(count_col) > 0).withColumn(
            precombine_col, F.lit(refresh_seq)
        )
        mv_table.upsert(upserts)
        emptied = merged.where(F.col(count_col) <= 0).select(group_col)
        if not emptied.isEmpty():
            mv_table.delete(emptied)
    finally:
        merged.unpersist()
