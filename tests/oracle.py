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


# Coarse-but-width-aware type classes: the driver's canonicalizer may
# compare dtypes, and Spark defaults to 32-bit where DuckDB produces
# 64-bit (row_number, size, length, year, datediff, ...). Flag any
# column whose class differs so the mismatch is fixed at the query, not
# discovered at the gate.
_SPARK_TYPE_CLASS = {
    "tinyint": "int32",
    "smallint": "int32",
    "int": "int32",
    "bigint": "int64",
    "float": "float",
    "double": "float",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
}
_DUCK_TYPE_CLASS = {
    "TINYINT": "int32",
    "SMALLINT": "int32",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int64",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
}


def _type_classes_match(spark_df, exp_rel) -> list[str]:
    spark_types = {
        f.name: _SPARK_TYPE_CLASS.get(f.dataType.simpleString())
        for f in spark_df.schema.fields
    }
    bad = []
    for name, type_code, *_ in exp_rel.description:
        duck = _DUCK_TYPE_CLASS.get(str(type_code))
        sp = spark_types.get(name)
        if sp is not None and duck is not None and sp != duck:
            bad.append(f"{name}: spark={sp} duckdb={duck}")
    return bad


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = [r.asDict(recursive=True) for r in spark_df.collect()]
    exp_rel = con.execute(sql)
    exp_cols = [d[0] for d in exp_rel.description]
    exp = [dict(zip(exp_cols, row)) for row in exp_rel.fetchall()]

    got_cols = sorted(spark_df.columns)
    assert got_cols == sorted(exp_cols), f"columns differ: {got_cols} vs {sorted(exp_cols)}"
    mismatched = _type_classes_match(spark_df, exp_rel)
    assert not mismatched, f"column type classes differ: {mismatched}"
    assert len(got) == len(exp), f"row count differs: spark={len(got)} duckdb={len(exp)}"

    grows, erows = _rows(got), _rows(exp)
    for i, (g, e) in enumerate(zip(grows, erows)):
        assert g == e, f"row {i} differs:\n  spark : {g}\n  duckdb: {e}"
