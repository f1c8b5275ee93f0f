"""One SQL entry point over engine tables: route ANY statement string
— query, DML, DDL, or CALL procedure — against a single shared
``{name: Table}`` catalog.

The reference's whole interface is SQL strings over registered views
(``AirflowHudiLabs/Lab2/jobs/python/incremental_etl_orders.py:467-478``);
this module is that interface made stateful. A :class:`SqlSession`
owns the catalog the three statement surfaces already share —
:func:`.catalog_api.sql_over` (reads: manifest auto-pruning +
``VERSION/TIMESTAMP AS OF`` time travel), :func:`.sql_dml.execute`
(writes), :func:`.sql_ddl.execute_ddl` (lifecycle),
:func:`.sql_dml.call_procedure` (maintenance) — and dispatches on the
statement's first keyword, so a user drives the entire engine through
``session.sql(...)`` exactly as they would drive Hudi through
``spark.sql(...)``:

    s = SqlSession(spark, base_dir="/lake")
    s.sql("CREATE TABLE orders (...) USING engine TBLPROPERTIES (...)")
    s.sql("INSERT INTO orders SELECT * FROM staged")        -> commit id
    s.sql("MERGE INTO orders USING updates ON ... WHEN ...")-> commit id
    s.sql("CALL run_compaction(table => 'orders')")         -> DataFrame
    s.sql("SELECT ... FROM orders WHERE o_orderkey = 5")    -> DataFrame
                                         (manifest-pruned, auto)

Per-route return values are the underlying surface's (DataFrame for
queries / SHOW / DESCRIBE / CALL; commit-id string for DML and
schema-publishing ALTERs; :class:`Table` for CREATE; ``None`` for
metadata-plane DDL) — a session is a thin router, not a new
abstraction layer.

Before DML/DDL statements with an embedded query (``INSERT .. SELECT``,
CTAS, MERGE ``USING (subquery)``), every catalog table the statement
references is attached as a CURRENT-snapshot temp view, so statements
can read catalog tables by name without a prior ``attach`` call. Reads
bind only the views the query text references (quote-aware token
scan) — a session holding hundreds of tables replays only the
manifests a query actually touches.

``script(...)`` splits a multi-statement string on top-level ``;`` and
runs the statements in order (the reference's job files are exactly
such scripts), returning the last statement's result.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from .catalog_api import _table_changes, attach, sql_over
from .sql_ddl import execute_ddl
from .sql_dml import call_procedure, execute
from .sqltext import contains_subquery, split_top
from .table import Table

__all__ = ["SqlSession"]

_READ_KW = {"SELECT", "WITH", "VALUES", "TABLE"}
_DML_KW = {"MERGE", "DELETE", "UPDATE", "INSERT", "OPTIMIZE", "VACUUM"}
_DDL_KW = {"CREATE", "ALTER", "DROP", "SHOW", "DESCRIBE", "DESC", "TRUNCATE"}

_WORD = re.compile(r"[A-Za-z_][\w$]*")


def _strip_quoted(s: str) -> str:
    """The statement with single/double-quoted literals and comments
    blanked (one shared walker — :func:`.sqltext.walk` — so the escape
    and comment rules can never drift from the DML/prune lexers again)
    so identifier scans never match text inside strings or comments;
    backtick CONTENTS are kept (they are identifiers), the ticks are
    replaced with spaces."""
    from .sqltext import walk

    out = []
    for kind, a, b in walk(s):
        if kind == "text":
            out.append(s[a:b])
        elif kind == "backtick":
            seg = s[a + 1 : b - 1] if s[b - 1 : b] == "`" else s[a + 1 : b]
            out.append(f" {seg} ")
        else:  # string or comment: nothing inside is an identifier
            out.append(" ")
    return "".join(out)


class SqlSession:
    """A statement router over a shared ``{name: Table}`` catalog.

    ``base_dir`` is where ``CREATE TABLE`` without a LOCATION clause
    places table directories. ``tables`` seeds the catalog (values are
    paths or opened :class:`Table` handles); :meth:`attach` adds more
    later. The catalog dict is exposed as ``.catalog`` and is mutated
    by DDL exactly as :func:`.sql_ddl.execute_ddl` documents.
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, str | Table] | None = None,
        base_dir: str | None = None,
    ):
        self.spark = spark
        self.base_dir = base_dir
        self.catalog: dict[str, Table] = {
            name: (t if isinstance(t, Table) else Table.load(spark, t))
            for name, t in (tables or {}).items()
        }

    def attach(self, name: str, table: str | Table) -> Table:
        """Register an existing table (path or handle) under ``name``."""
        t = table if isinstance(table, Table) else Table.load(self.spark, table)
        if name in self.catalog:
            raise ValueError(f"table {name!r} already attached")
        self.catalog[name] = t
        return t

    def _referenced(self, stmt: str) -> dict[str, Table]:
        tokens = {m.group(0) for m in _WORD.finditer(_strip_quoted(stmt))}
        # table_changes('name', ...) names its view inside a QUOTED
        # string (Hudi's TVF form), which the token scan blanks — pull
        # those names back in with the rewriter's own quote/comment-
        # aware walk, so TVF text sitting inside a string literal or a
        # comment (which the rewriter would not touch) binds nothing
        from .catalog_api import tc_referenced_names

        tokens |= tc_referenced_names(stmt)
        return {n: t for n, t in self.catalog.items() if n in tokens}

    def _bind_views(self, refs: dict[str, Table]) -> dict[str, Table]:
        """Split ``refs`` into tables attach() can snapshot and
        zero-commit tables: a table created via DDL but never written
        has no manifest to replay, so its DECLARED schema binds an
        empty view instead (SQL semantics: a fresh table reads as 0
        rows, not as an error). Returns the attachable remainder."""
        live: dict[str, Table] = {}
        for n, t in refs.items():
            if t.latest_commit() is None:
                sch = t.effective_schema()
                if sch is not None:
                    self.spark.createDataFrame(
                        [], sch
                    ).createOrReplaceTempView(n)
                # no declared schema either: leave unbound — Spark's
                # own table-not-found error is the right failure
            else:
                live[n] = t
        return live

    def sql(self, stmt: str):
        """Route one statement; see the module docstring for the
        per-route return values."""
        s = stmt.strip().rstrip(";")
        m = _WORD.match(s)
        if not m:
            raise ValueError(f"empty or unparseable statement: {stmt[:60]!r}")
        kw = m.group(0).upper()
        if kw in _READ_KW:
            return sql_over(
                self.spark, self._bind_views(self._referenced(s)), s
            )
        if kw == "CALL":
            return call_procedure(self.spark, s, self.catalog)
        if kw in _DML_KW:
            # bind current snapshots for embedded SELECT/USING text so
            # DML can read catalog tables by name — but ONLY for the
            # statements that can embed a query (INSERT .. SELECT,
            # MERGE .. USING, and UPDATE/DELETE whose WHERE/SET text
            # embeds a subquery); plain UPDATE/DELETE/OPTIMIZE/VACUUM
            # compile expressions against the target alone, so binding
            # views for them is a wasted manifest replay per statement
            if kw in ("INSERT", "MERGE") or (
                kw in ("UPDATE", "DELETE") and contains_subquery(s)
            ):
                live = self._bind_views(self._referenced(s))
                if live:
                    attach(self.spark, live)
                # table_changes(...) inside the embedded query (MERGE
                # USING (SELECT ... FROM table_changes(bronze, ...)) —
                # the reference's incremental-ETL idiom in pure SQL)
                # rewrites to a bound window view BEFORE the DML parse,
                # exactly as the read route does
                s = _table_changes(self.spark, s, live)
            return execute(self.spark, s, self.catalog)
        if kw in _DDL_KW:
            if kw == "CREATE":
                live = self._bind_views(self._referenced(s))
                if live:
                    attach(self.spark, live)  # CTAS queries read by name
            return execute_ddl(self.spark, s, self.catalog, self.base_dir)
        raise ValueError(f"unrecognized statement keyword {kw!r}")

    def script(self, text: str) -> object:
        """Run a ``;``-separated statement script in order; returns the
        LAST statement's result. ``;`` inside quoted strings or
        parentheses does not split (sqltext rules)."""
        result = None
        ran = 0
        for stmt in split_top(text, r";"):
            if stmt.strip():
                result = self.sql(stmt)
                ran += 1
        if ran == 0:
            raise ValueError("script contains no statements")
        return result
