"""Shared helpers for plan definitions.

Oracle-exactness convention: Spark and DuckDB sum doubles in different
orders, so floating aggregates computed naively hash-mismatch in the last
bits. Every money/measure aggregate therefore runs in DECIMAL (exact,
order-independent). The final decimal is surfaced as DOUBLE **via a
string cast**: large-significand decimals round differently under the two
engines' native decimal→double casts (Spark: BigDecimal.doubleValue;
DuckDB: int128/10^scale in double arithmetic — up to 1 ulp apart), while
decimal→string is exact digits and string→double parsing is correctly
rounded everywhere. decimal → string → double is therefore bit-identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 6) -> Column:
    """Cast to an exact decimal for order-independent aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def as_double(dec_col: Column) -> Column:
    """Exact decimal → bit-identical double (via string; see module doc)."""
    return dec_col.cast("string").cast("double")


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Exact decimal sum, surfaced as double (bit-identical across engines)."""
    return as_double(F.sum(dec(col, scale)))


def davg(col: Column | str, scale: int = 6) -> Column:
    """Exact-sum-based average surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (as_double(F.sum(dec(c, scale))) / F.count(c)).cast("double")


# DuckDB-side equivalents (string templates for oracle SQL).
def sql_as_double(expr: str) -> str:
    return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, scale: int = 6) -> str:
    return sql_as_double(f"SUM(CAST(({expr}) AS DECIMAL(18,{scale})))")


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"CAST({sql_dsum(expr, scale)} / COUNT({expr}) AS DOUBLE)"
