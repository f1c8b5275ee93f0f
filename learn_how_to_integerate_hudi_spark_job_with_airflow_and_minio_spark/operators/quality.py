"""Data-quality expectation checks (training-data pipeline support).

Declarative rules evaluated in ONE pass over the data (a single
aggregate of conditional counts — no per-rule scans):

    rules = [
        NotNull("o_custkey"),
        InSet("o_orderpriority", ("1-URGENT", "2-HIGH")),
        InRange("o_totalprice", 0, None),
        Expr("o_totalprice > 0", name="positive_price"),
    ]
    report = check(df, rules, unique=["o_orderkey"])
    # → rows of (rule, violations, total)

At 100 TB the conditional-count pass is map-side-combined like any
aggregate; each ``unique`` column adds one hash-shuffle distinct count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Rule:
    def __init__(self, name: str):
        self.name = name

    def violation(self) -> Column:
        raise NotImplementedError


class NotNull(Rule):
    def __init__(self, col: str, name: str | None = None):
        super().__init__(name or f"not_null_{col}")
        self.col = col

    def violation(self) -> Column:
        return F.col(self.col).isNull()


class InSet(Rule):
    def __init__(self, col: str, allowed, name: str | None = None):
        super().__init__(name or f"in_set_{col}")
        self.col = col
        self.allowed = tuple(allowed)

    def violation(self) -> Column:
        return ~F.col(self.col).isin(*self.allowed) | F.col(self.col).isNull()


class InRange(Rule):
    def __init__(
        self,
        col: str,
        lo: float | None,
        hi: float | None,
        name: str | None = None,
    ):
        super().__init__(name or f"in_range_{col}")
        self.col = col
        self.lo = lo
        self.hi = hi

    def violation(self) -> Column:
        v = F.lit(False)
        if self.lo is not None:
            v = v | (F.col(self.col) < self.lo)
        if self.hi is not None:
            v = v | (F.col(self.col) > self.hi)
        return v | F.col(self.col).isNull()


class Expr(Rule):
    """Violation = rows where the SQL predicate is NOT satisfied."""

    def __init__(self, predicate: str, name: str | None = None):
        super().__init__(name or "expr_rule")
        self.predicate = predicate

    def violation(self) -> Column:
        sat = F.expr(self.predicate)
        return ~sat | sat.isNull()


def check(
    df: DataFrame, rules: list[Rule], unique: list[str] | None = None
) -> DataFrame:
    """Evaluate all rules AND ``unique`` distinct-counts in ONE
    aggregation pass (conditional counts + countDistinct per column —
    Spark's Expand handles multiple distincts in a single shuffle, vs
    one full job per column). ``countDistinct`` skips NULLs, so a
    max(isNull) term re-adds the one distinct slot NULL occupies in the
    previous ``.distinct().count()`` semantics. Returns (rule string,
    violations long, total long)."""
    uniq = list(unique or [])
    agg = df.agg(
        F.count(F.lit(1)).alias("_total"),
        *[
            F.sum(r.violation().cast("long")).alias(f"_v_{i}")
            for i, r in enumerate(rules)
        ],
        *[
            (
                F.countDistinct(c)
                + F.coalesce(F.max(F.col(c).isNull().cast("long")), F.lit(0))
            ).alias(f"_u_{j}")
            for j, c in enumerate(uniq)
        ],
    )
    row = agg.collect()[0]
    total = int(row["_total"])
    out = [(r.name, int(row[f"_v_{i}"] or 0), total) for i, r in enumerate(rules)]
    for j, c in enumerate(uniq):
        out.append((f"unique_{c}", total - int(row[f"_u_{j}"] or 0), total))
    return df.sparkSession.createDataFrame(
        out, "rule string, violations long, total long"
    )
