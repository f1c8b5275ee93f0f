"""Local mirror of the driver's correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values
order-insensitively. Comparison is STRICT (exact values after minimal
normalization) — stricter than any tolerance the driver might apply — so
queries must make themselves deterministic (decimal-exact aggregates,
explicit tie-breaks, truncated timestamps).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Normalize a cell to a comparison-stable python value."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows(records: list[dict]) -> list[tuple]:
    if not records:
        return []
    cols = sorted(records[0].keys())
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in records),
        key=lambda t: tuple(repr(x) for x in t),
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = [r.asDict(recursive=True) for r in spark_df.collect()]
    exp_rel = con.execute(sql)
    exp_cols = [d[0] for d in exp_rel.description]
    exp = [dict(zip(exp_cols, row)) for row in exp_rel.fetchall()]

    got_cols = sorted(spark_df.columns)
    assert got_cols == sorted(exp_cols), f"columns differ: {got_cols} vs {sorted(exp_cols)}"
    assert len(got) == len(exp), f"row count differs: spark={len(got)} duckdb={len(exp)}"

    grows, erows = _rows(got), _rows(exp)
    for i, (g, e) in enumerate(zip(grows, erows)):
        assert g == e, f"row {i} differs:\n  spark : {g}\n  duckdb: {e}"
