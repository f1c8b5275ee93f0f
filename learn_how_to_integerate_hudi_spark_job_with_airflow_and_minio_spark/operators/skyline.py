"""Skyline (Pareto-optimal set) operator.

The OLAP skyline query (cf. "Integration of Skyline Queries into Spark
SQL", EDBT 2023 — PAPERS.md): rows not dominated by any other row,
where s dominates r iff s is >= r in every dimension and > in at least
one (maximize semantics).

2-D skylines admit an exact, fully-relational plan — no UDFs, no n²
dominance join: over the DISTINCT (x, y) pairs sorted by (x desc,
y desc), a pair is in the skyline iff its y exceeds the running max of
y over all strictly-preceding pairs (any preceding pair has x >= cur,
so a preceding y >= cur.y witnesses dominance; ties on BOTH dims are
incomparable-equal and correctly survive because they only meet each
other at y == mx of themselves excluded — the distinct-pairs base keeps
one representative and the final semi-join restores every row carrying
a skyline pair).

Distributed in two phases (the standard partition-then-merge skyline):

1. LOCAL pass: range-partition on x, per-partition running-max window →
   each partition's local skyline. A window over a GLOBAL order would
   put every row on one reducer; per-partition windows keep the big
   pass parallel, and skyline(union of local skylines) == skyline
   (dominance is transitive and partition-independent).
2. GLOBAL pass: the survivors (bounded by the skyline size × partition
   count — tiny) go through the same window once over the total order.

The final skyline is invariant to the partitioning even though each
local pass's survivor set is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _skyline_pass(pairs: DataFrame, x: str, y: str, part_col=None) -> DataFrame:
    order = [F.desc(x), F.desc(y)]
    w = (
        (W.partitionBy(part_col) if part_col is not None else W.partitionBy())
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        pairs.withColumn("_mx", F.max(y).over(w))
        .where(F.col("_mx").isNull() | (F.col(y) > F.col("_mx")))
        .drop("_mx")
    )


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of ``df`` whose (x, y) is Pareto-optimal (maximize both)."""
    pairs = df.select(x, y).distinct()
    n = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    local = _skyline_pass(
        pairs.repartitionByRange(int(n), F.desc(x), F.desc(y)).withColumn(
            "_p", F.spark_partition_id()
        ),
        x,
        y,
        part_col="_p",
    ).drop("_p")
    sky = _skyline_pass(local, x, y)
    return df.join(sky, [x, y], "left_semi")
