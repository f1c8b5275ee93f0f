"""Z-order (Morton) clustering for multi-column file pruning.

The engine's compaction sorts by one key, which gives tight manifest
stats on that key only. Z-ordering interleaves the bits of several
columns' quantile-bucket ids, so a range-partitioned sort on the z-value
makes EVERY participating column's per-file min/max range narrow — the
multi-dimensional analog of the reference's sort-and-size clustering
(SparkSortAndSizeExecutionStrategy), and the layout Delta/Hudi expose as
ZORDER.

All Catalyst expressions: quantile cut points are computed once with
``approxQuantile`` (sample-based, driver gets only the cut array) and
folded into the plan as literals; bucketing is a fold over the cut
array; bit interleave is a fixed chain of shifts/ors — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 8  # bits per column; 2 cols -> 16-bit z-value (256 buckets
# per column is plenty for FILE-level clustering, and keeps the literal
# cut array and the interleave expression small)


def _bucket(col: Column, cuts: list[float]) -> Column:
    """Quantile bucket id in [0, 2^ZBITS): count of cut points <= value
    (fold over the literal cut array — handles skew, unlike equal-width)."""
    arr = F.array(*[F.lit(c) for c in cuts])
    return F.aggregate(
        F.filter(arr, lambda c: c <= col.cast("double")),
        F.lit(0).cast("long"),
        lambda acc, _: acc + 1,
    )


def _interleave(cols: list[Column], bits: int = ZBITS) -> Column:
    """Morton-interleave the low ``bits`` bits of each bucket id."""
    z = F.lit(0).cast("long")
    k = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def _numeric(df: DataFrame, c: str) -> Column:
    """Numeric view of a z-order column. Spark forbids DATE→DOUBLE
    casts, so temporal types go through their epoch representation
    (unix_date / unix_micros) before the double cast."""
    dt = dict(df.dtypes).get(c, "")
    col = F.col(c)
    if dt == "date":
        return F.unix_date(col).cast("double")
    if dt.startswith("timestamp"):
        # unix_micros rejects TIMESTAMP_NTZ — route it through LTZ first
        # (z-ordering only needs a monotone numeric image, so any fixed
        # zone reinterpretation preserves the sort).
        if dt == "timestamp_ntz":
            col = col.cast("timestamp")
        return F.unix_micros(col).cast("double")
    return col.cast("double")


def zvalue(df: DataFrame, cols: list[str], bits: int = ZBITS) -> Column:
    """Z-value column for ``cols`` (numeric, date, or timestamp). Cut
    points are (2^bits - 1) approximate quantiles per column, sampled
    once — the standard sort-key preparation pass."""
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    buckets = []
    for c in cols:
        casted = df.select(_numeric(df, c).alias("_v"))
        cuts = casted.approxQuantile("_v", qs, 0.001)
        buckets.append(_bucket(_numeric(df, c), cuts))
    return _interleave(buckets, bits)
