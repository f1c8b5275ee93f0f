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


# Width-exact type classes: the driver's canonicalizer hash-compares the
# Arrow-level dtypes, so Spark BIGINT vs DuckDB DOUBLE (44 vs 44.0), or
# DuckDB's windowed-SUM HUGEINT (-> decimal128) vs Spark bigint, fail at
# the gate even when every value prints identically. Classify BOTH sides
# down to exact width and flag any difference so the mismatch is fixed at
# the query, not discovered at the gate. NOTE: DuckDB types must come
# from the relation (``con.sql(...).types``) — the DB-API
# ``description`` returns generic codes ('NUMBER', 'DATETIME') that match
# nothing and silently disable the check (round-2 lesson).
_SPARK_TYPE_CLASS = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bytes",
}
_DUCK_TYPE_CLASS = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "hugeint",  # arrow decimal128 — matches NO spark type
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
    "BLOB": "bytes",
}


def _spark_class(simple: str) -> str:
    if simple.startswith("decimal"):
        return "decimal" + simple[len("decimal") :]
    if simple.startswith("array<") and simple.endswith(">"):
        return f"list<{_spark_class(simple[6:-1])}>"
    return _SPARK_TYPE_CLASS.get(simple, f"unknown-spark({simple})")


def _duck_class(t: str) -> str:
    t = str(t)
    if t.startswith("DECIMAL"):
        return "decimal" + t[len("DECIMAL") :].replace(" ", "")
    if t.endswith("[]"):
        return f"list<{_duck_class(t[:-2])}>"
    return _DUCK_TYPE_CLASS.get(t, f"unknown-duckdb({t})")


def type_class_mismatches(spark_df, con, sql: str) -> list[str]:
    """Compare Spark vs DuckDB column type classes for one oracle SQL.

    Runs the oracle at LIMIT 0 cost (relation metadata only). Returns a
    human-readable list of mismatched columns, empty when clean.
    """
    spark_types = {
        f.name: _spark_class(f.dataType.simpleString())
        for f in spark_df.schema.fields
    }
    rel = con.sql(sql)
    bad = []
    for name, dtype in zip(rel.columns, rel.types):
        duck = _duck_class(dtype)
        sp = spark_types.get(name)
        if sp is None:
            continue  # column-name mismatch is its own assertion
        if sp != duck:
            bad.append(f"{name}: spark={sp} duckdb={duck}")
    return bad


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = [r.asDict(recursive=True) for r in spark_df.collect()]
    exp_rel = con.execute(sql)
    exp_cols = [d[0] for d in exp_rel.description]
    exp = [dict(zip(exp_cols, row)) for row in exp_rel.fetchall()]

    got_cols = sorted(spark_df.columns)
    assert got_cols == sorted(exp_cols), f"columns differ: {got_cols} vs {sorted(exp_cols)}"
    mismatched = type_class_mismatches(spark_df, con, sql)
    assert not mismatched, f"column type classes differ: {mismatched}"
    assert len(got) == len(exp), f"row count differs: spark={len(got)} duckdb={len(exp)}"

    grows, erows = _rows(got), _rows(exp)
    for i, (g, e) in enumerate(zip(grows, erows)):
        assert g == e, f"row {i} differs:\n  spark : {g}\n  duckdb: {e}"
