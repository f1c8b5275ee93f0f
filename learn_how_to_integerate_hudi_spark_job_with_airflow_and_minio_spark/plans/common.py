"""Shared helpers for plan definitions.

Oracle-exactness convention: Spark and DuckDB sum doubles in different
orders, so floating aggregates computed naively hash-mismatch in the last
bits. Every money/measure aggregate therefore runs in DECIMAL (exact,
order-independent) and casts the final result to DOUBLE — both engines
then produce bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 6) -> Column:
    """Cast to an exact decimal for order-independent aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Exact decimal sum, surfaced as double (bit-identical across engines)."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Exact-sum-based average surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, scale)).cast("double") / F.count(c)).cast("double")


# DuckDB-side equivalents (string templates for oracle SQL).
def sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
