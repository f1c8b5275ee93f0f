"""Query catalog: single registry pairing each Spark query with its oracle.

Every operator the engine claims (SURVEY §2 + extension mandate) registers
here once, as a Spark callable ``(spark, sf_dir) -> DataFrame`` plus an
equivalent DuckDB SQL string (or ``None`` for genuinely non-SQL-expressible
ops → the driver records a weaker rows-only check). ``__spark_entry__.py``
re-exports this registry verbatim, so the queries() / oracle_sql() contract
is maintained in exactly one place.

Correctness conventions (driver compares by column-name-sorted value hash):
- alias every computed column identically on both sides;
- round floating aggregates on BOTH sides (Spark and DuckDB sum doubles in
  different orders — raw doubles will hash-mismatch);
- truncate timestamps to a precision both engines represent exactly
  (testdata events.ts is ns in parquet; Spark reads µs).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered testdata views
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every plan module so its @register calls run."""
    global _LOADED
    if _LOADED:
        return
    # Explicit, fail-loud imports: a broken plan module must fail the whole
    # registry, not silently shrink it. Extend this list as modules land.
    from . import (  # noqa: F401
        aggregates,
        aggregates2,
        arrays_misc,
        dedup_plans,
        formats,
        joins,
        multimodal_plans,
        pandas_udfs,
        relational,
        scalar,
        scalar2,
        similarity_plans,
        streaming_plans,
        tablekernel,
        text_plans,
        text2,
        windows,
    )

    _LOADED = True
