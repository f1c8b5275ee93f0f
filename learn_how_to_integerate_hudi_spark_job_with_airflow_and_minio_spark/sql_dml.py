"""SQL DML front-end over engine tables: ``MERGE INTO`` /
``DELETE FROM`` / ``UPDATE`` strings compiled onto the Table kernels.

The reference drives everything through SQL strings over temp views
(``AirflowHudiLabs/Lab2/jobs/python/incremental_etl_orders.py:467-478``
registers views and runs string queries); this module gives engine
tables the matching WRITE-side SQL surface — Spark itself cannot plan
DML over plain parquet-backed views. Statements are parsed here with a
small quote/paren-aware tokenizer; every embedded expression
(conditions, SET right-hand sides, INSERT values) is handed to
Catalyst verbatim via ``F.expr``, so the full Spark-SQL expression
language works inside clauses.

Grammar (case-insensitive keywords; ``<expr>`` = any Spark-SQL
expression — parenthesize CASE expressions inside MERGE conditions so
their WHEN/THEN tokens don't terminate a clause):

    MERGE [WITH SCHEMA EVOLUTION] INTO <target> [[AS] alias]
          USING <source|(subquery)> [[AS] alias]
    ON <expr>
    { WHEN MATCHED [AND <expr>] THEN { UPDATE SET col = <expr>[, ...]
                                     | DELETE }
    | WHEN NOT MATCHED [BY TARGET] [AND <expr>] THEN
          { INSERT (col[, ...]) VALUES (<expr>[, ...]) | INSERT * }
    | WHEN NOT MATCHED BY SOURCE [AND <expr>] THEN
          { UPDATE SET col = <expr>[, ...] | DELETE } }+

    DELETE FROM <target> [WHERE <expr>]
    UPDATE <target> SET col = <expr>[, ...] [WHERE <expr>]
      -- <expr> in DELETE/UPDATE may embed subqueries (IN / NOT IN /
      -- EXISTS / scalar), including self-references to the target;
      -- they evaluate against the pre-statement snapshot via spark.sql
      -- and the matched keys route through the index-pruned kernels
    INSERT INTO <target> [(col[, ...])] { SELECT ... | VALUES ... }
    INSERT OVERWRITE [TABLE] <target> [PARTITION (col = lit[, ...])]
           [(col[, ...])] { SELECT ... | VALUES ... }
    OPTIMIZE <target> [WHERE <partition pred>] [ZORDER BY (col[, ...])]
      -- WHERE scope: AND-ed partition_col <op> literal conjuncts only
      -- (per-file provable); rewrites O(partition), not O(table).
      -- Empty scope returns "" (no commit published)
    VACUUM <target> [RETAIN <n> {COMMITS | HOURS}]
      -- default: RETAIN 5 COMMITS; HOURS routes to the time-based
      -- cleaner (Hudi KEEP_LATEST_BY_HOURS / Delta VACUUM RETAIN)

    CALL <procedure>(key => value[, ...])  -- see :func:`call_procedure`
                                           -- (returns a DataFrame, so it
                                           -- has its own entry point)

``INSERT INTO`` routes through the keyed upsert (Hudi Spark-SQL's
INSERT INTO semantics on a primary-keyed table): a re-inserted key
replaces the stored row rather than duplicating it — the keyed
snapshot invariant outranks the append-only SQL reading.
``INSERT OVERWRITE`` routes to :meth:`Table.insert_overwrite` (Hudi's
insert_overwrite / insert_overwrite_table write ops, the reference's
``method`` param at ``create_hudi_tables.py:218-221``): a static
``PARTITION (col = lit)`` spec replaces exactly the named partition
(the literals become the batch's partition values); without a spec,
``spark.sql.sources.partitionOverwriteMode`` decides — ``dynamic``
replaces only the partitions present in the query output (the conf
the reference's jobs set), the ``static`` default replaces the whole
table, exactly Spark's own INSERT OVERWRITE contract. ``OPTIMIZE``
is sort-and-size compaction (``ZORDER BY`` = Morton-clustered);
``VACUUM`` is the retention cleaner, retaining 5 commits of history
when the RETAIN clause is omitted. VACUUM is the one statement that
publishes NO commit (the cleaner deletes retired files without
changing table state), so :func:`execute` returns the PRE-EXISTING
latest commit id for it, unchanged — every other route returns the
commit the statement produced.

Clause semantics (order, first-match-wins, cardinality violation on
multi-matched target rows) live in :meth:`Table.merge_into`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sqltext import IDENT as _IDENT
from .sqltext import contains_subquery as _contains_subquery
from .sqltext import scan_top as _scan_top
from .sqltext import split_top as _split_top
from .table import META_COL, Table, TableServices

__all__ = ["call_procedure", "execute", "parse_merge"]


def _parse_rel(s: str) -> tuple[str, str]:
    """``name [[AS] alias]`` or ``(subquery) [[AS] alias]`` →
    (name_or_subquery, alias)."""
    s = s.strip()
    if s.startswith("("):
        depth, i, n = 0, 0, len(s)
        while i < n:
            c = s[i]
            if c == "'" or c == "`" or c == '"':  # quoted parens don't count
                j = s.find(c, i + 1)
                i = n if j < 0 else j + 1
                continue
            depth += c == "("
            depth -= c == ")"
            if depth == 0:
                break
            i += 1
        if i >= n:
            raise ValueError(f"unbalanced parentheses in relation {s!r}")
        body, rest = s[: i + 1], s[i + 1 :].strip()
    else:
        m = re.match(rf"({_IDENT})", s)
        if not m:
            raise ValueError(f"cannot parse relation in {s!r}")
        body, rest = m.group(1), s[m.end() :].strip()
    if not body.startswith("("):
        # strip backticks from the relation NAME too, not just the
        # alias — MERGE INTO `t` must hit the same tables={"t": ...}
        # lookup the DELETE/UPDATE/INSERT routes resolve
        body = body.strip("`")
        alias = body
    else:
        alias = None
    if rest:
        m = re.match(rf"(?:AS\s+)?({_IDENT})\s*$", rest, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse relation alias in {s!r}")
        alias = m.group(1).strip("`")
    if alias is None:
        raise ValueError(f"subquery source needs an alias: {s!r}")
    return body, alias


def _parse_assignments(s: str) -> dict[str, str]:
    sets: dict[str, str] = {}
    for part in _split_top(s, r","):
        m = re.match(
            rf"\s*(?:(?:{_IDENT})\s*\.\s*)?({_IDENT})\s*=\s*(.+?)\s*$",
            part,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse assignment {part!r}")
        sets[m.group(1).strip("`")] = m.group(2)
    return sets


def parse_merge(stmt: str) -> dict:
    """Parse a MERGE INTO statement into the :meth:`Table.merge_into`
    argument shape. Returns ``{target, target_alias, source,
    source_alias, on, matched, not_matched}`` where ``source`` is a
    view name or a parenthesized subquery string."""
    m = re.match(
        r"\s*MERGE\s+(WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+",
        stmt,
        re.IGNORECASE,
    )
    if not m:
        raise ValueError("not a MERGE INTO statement")
    evolve = bool(m.group(1))
    rest = stmt[m.end() :].rstrip().rstrip(";")
    using = _scan_top(rest, r"\bUSING\b")
    if len(using) != 1:
        raise ValueError("MERGE needs exactly one top-level USING")
    target, t_alias = _parse_rel(rest[: using[0][0]])
    rest = rest[using[0][1] :]
    on = _scan_top(rest, r"\bON\b")
    if not on:
        raise ValueError("MERGE needs an ON condition")
    source, s_alias = _parse_rel(rest[: on[0][0]])
    rest = rest[on[0][1] :]
    whens = _scan_top(rest, r"\bWHEN\b")
    if not whens:
        raise ValueError("MERGE needs at least one WHEN clause")
    on_cond = rest[: whens[0][0]].strip()
    matched: list[tuple] = []
    not_matched: list[tuple] = []
    not_matched_by_source: list[tuple] = []
    starts = [a for a, _b in whens]
    for i, (_a, b) in enumerate(whens):
        seg = rest[b : starts[i + 1] if i + 1 < len(starts) else None].strip()
        m = re.match(r"(NOT\s+)?MATCHED\b\s*", seg, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse WHEN clause {seg!r}")
        is_not, tail = m.group(1), seg[m.end() :]
        by_source = False
        bm = re.match(r"BY\s+(SOURCE|TARGET)\b\s*", tail, re.IGNORECASE)
        if bm:
            if not is_not:
                raise ValueError(
                    f"WHEN MATCHED takes no BY qualifier: {seg!r}"
                )
            by_source = bm.group(1).upper() == "SOURCE"
            tail = tail[bm.end() :]  # BY TARGET ≡ plain NOT MATCHED
        # depth/quote-aware THEN split, so parenthesized CASE
        # expressions and string literals containing THEN inside the
        # AND-condition parse correctly (the docstring's contract)
        thens = _scan_top(tail, r"\bTHEN\b")
        if not thens:
            raise ValueError(f"WHEN clause has no THEN: {seg!r}")
        cond_part = tail[: thens[0][0]].strip()
        act = tail[thens[0][1] :].strip()
        cond = None
        if cond_part:
            am = re.match(r"AND\s+(.*)$", cond_part, re.IGNORECASE | re.DOTALL)
            if not am:
                raise ValueError(f"cannot parse WHEN condition {cond_part!r}")
            cond = am.group(1).strip()
        if is_not and not by_source:
            am = re.match(
                r"INSERT\s*(\*|\((?P<cols>[^)]*)\)\s*VALUES\s*\((?P<vals>.*)\))\s*$",
                act,
                re.IGNORECASE | re.DOTALL,
            )
            if not am:
                raise ValueError(f"cannot parse INSERT action {act!r}")
            if am.group(1) == "*":
                not_matched.append(("insert", cond, None))
            else:
                cols = [
                    c.strip().strip("`") for c in am.group("cols").split(",")
                ]
                vals = [v.strip() for v in _split_top(am.group("vals"), r",")]
                if len(cols) != len(vals):
                    raise ValueError(
                        f"INSERT column/value count mismatch in {act!r}"
                    )
                not_matched.append(("insert", cond, dict(zip(cols, vals))))
        else:
            family = not_matched_by_source if by_source else matched
            if re.match(r"DELETE\s*$", act, re.IGNORECASE):
                family.append(("delete", cond, None))
            else:
                am = re.match(
                    r"UPDATE\s+SET\s+(.*)$", act, re.IGNORECASE | re.DOTALL
                )
                if not am:
                    raise ValueError(
                        f"cannot parse {'NOT MATCHED BY SOURCE' if by_source else 'MATCHED'} "
                        f"action {act!r}"
                    )
                family.append(
                    ("update", cond, _parse_assignments(am.group(1)))
                )
    return {
        "target": target,
        "target_alias": t_alias,
        "source": source,
        "source_alias": s_alias,
        "on": on_cond,
        "matched": matched,
        "not_matched": not_matched,
        "not_matched_by_source": not_matched_by_source,
        "evolve_schema": evolve,
    }


def _resolve_source(spark: SparkSession, source: str) -> DataFrame:
    if source.startswith("("):
        return spark.sql(source[1:-1])
    return spark.table(source)


_PART_LIT = r"'[^']*'|[+-]?(?:\d+\.?\d*|\.\d+)|true|false|null"


def _parse_partition_spec(spec: str, t: Table) -> dict[str, str]:
    """``col = literal[, ...]`` → {col: literal_sql}. Static values
    only — a bare column name (Spark's mixed static/dynamic spec) is
    rejected with guidance to drop the PARTITION clause instead (the
    dynamic kernel reads partition values from the batch). The spec
    must name EXACTLY the table's partition fields: a partial spec
    would silently widen the replace envelope to sibling partitions."""
    out: dict[str, str] = {}
    for piece in _split_top(spec, r","):
        pm = re.match(
            rf"\s*({_IDENT})\s*=\s*({_PART_LIT})\s*$", piece, re.IGNORECASE
        )
        if not pm:
            raise ValueError(
                f"unsupported PARTITION spec entry {piece.strip()!r}: "
                "static `col = literal` entries only — omit the "
                "PARTITION clause for dynamic partition overwrite"
            )
        col = pm.group(1).strip("`")
        if col in out:
            raise ValueError(f"duplicate PARTITION spec column {col!r}")
        out[col] = pm.group(2)
    parts = t.meta.get("partition_fields") or []
    if sorted(out) != sorted(parts):
        raise ValueError(
            f"PARTITION spec columns {sorted(out)} must name exactly "
            f"the table's partition fields {sorted(parts)}"
        )
    return out


def partition_spec_to_hive(
    spark: SparkSession, schema, static: dict[str, str]
) -> dict[str, str | None]:
    """Static PARTITION-spec literals → the writer's hive-string codec.

    Each literal is cast through the TABLE's partition column type and
    then to string (a 1-row driver evaluation), so ``'5'`` against a
    double partition column yields the ``'5.0'`` the directory layout
    uses, and a NULL literal maps to the hive null sentinel (None)."""
    by_name = (
        {f.name: f.dataType for f in schema.fields}
        if schema is not None
        else {}
    )
    hive: dict[str, str | None] = {}
    for pcol, lit in static.items():
        c = F.expr(lit)
        if pcol in by_name:
            c = c.cast(by_name[pcol])
        hive[pcol] = (
            spark.range(1).select(c.cast("string").alias("v")).first()["v"]
        )
    return hive


def _subquery_frame(
    spark: SparkSession, t: Table, name: str, projection: str, cond: str
) -> DataFrame:
    """``SELECT <projection> FROM <current snapshot> AS <name> WHERE
    <cond>`` evaluated through ``spark.sql`` — the only engine surface
    where IN/NOT IN/EXISTS/scalar subqueries resolve (DataFrame
    ``where(expr)`` cannot host them). Other table names inside the
    subquery resolve against registered temp views (:class:`.SqlSession`
    binds the referenced catalog views before routing here); a
    self-reference to the TARGET table (``WHERE x > (SELECT avg(x) FROM
    <name>)``) binds the same pre-statement snapshot, per standard SQL
    ("subqueries see the table state before the statement").

    The target name is ALWAYS (re)bound to the pre-statement snapshot
    for the duration of the statement — probing the catalog first would
    let a stale or unrelated temp view with the target's name silently
    feed wrong data to the subquery (review-confirmed). If a user temp
    view already held the name it is RESTORED afterwards (analysis is
    eager, so capturing ``spark.table(name)`` before the override pins
    the old view's resolved plan); otherwise the scratch binding is
    dropped.

    ``spark.sql`` analyzes eagerly, so the scratch views are dropped
    before returning — the resolved plan keeps the snapshot lineage.

    Scale note: the WHERE evaluates over the full snapshot (a subquery
    predicate is not manifest-prunable by nature), but the WRITE phase
    downstream is still key-pruned — the matched keys flow into
    :meth:`.Table.delete` / :meth:`.Table.upsert`, whose range/bucket/
    bloom/record-index prunes bound the rewrite to affected files."""
    import uuid as _uuid

    if t.latest_commit() is None:
        # zero-commit table: SQL semantics say it reads as 0 rows (the
        # plain-predicate path is a no-op commit on the same state)
        sch = t.effective_schema()
        if sch is None:
            raise ValueError(
                f"table {name!r} has no schema yet (no commits and no "
                "declared columns) — nothing for the subquery to bind"
            )
        snap = spark.createDataFrame([], sch)
    else:
        snap = t.snapshot()
    tag = f"__dml_src_{_uuid.uuid4().hex[:10]}"
    prev = None
    try:
        # single-name catalog probe — the previous listTables() scan
        # was O(entire session catalog) per statement; a long-lived
        # session accumulates unbounded temp views (measured flat at
        # 300 views, but the scan has no business growing with them)
        if spark.catalog.getTable(name).isTemporary:
            prev = spark.table(name)  # eager analysis pins the old plan
    except Exception:
        prev = None
    snap.createOrReplaceTempView(tag)
    snap.createOrReplaceTempView(name)
    try:
        return spark.sql(
            f"SELECT {projection} FROM {tag} AS `{name}` WHERE {cond}"
        )
    finally:
        spark.catalog.dropTempView(tag)
        if prev is not None:
            prev.createOrReplaceTempView(name)
        else:
            spark.catalog.dropTempView(name)


def execute(
    spark: SparkSession, stmt: str, tables: dict[str, Table]
) -> str:
    """Execute a DML string against engine tables. ``tables`` maps the
    statement's target name to an open :class:`Table`; MERGE sources
    resolve against ``tables`` (current snapshot), then Spark temp
    views, then inline subqueries. Returns the commit id."""
    s = stmt.strip().rstrip(";")
    if re.match(
        r"MERGE\s+(WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\b", s, re.IGNORECASE
    ):
        p = parse_merge(s)
        if p["target"] not in tables:
            raise ValueError(f"unknown MERGE target table {p['target']!r}")
        t = tables[p["target"]]
        if p["source"] in tables:
            src = tables[p["source"]].snapshot()
        else:
            src = _resolve_source(spark, p["source"])
        return t.merge_into(
            src,
            on=p["on"],
            matched=p["matched"],
            not_matched=p["not_matched"],
            target_alias=p["target_alias"],
            source_alias=p["source_alias"],
            not_matched_by_source=p["not_matched_by_source"],
            evolve_schema=p["evolve_schema"],
        )
    m = re.match(
        rf"DELETE\s+FROM\s+({_IDENT})(?:\s+WHERE\s+(.*))?$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        name = m.group(1).strip("`")
        if name not in tables:
            raise ValueError(f"unknown DELETE target table {name!r}")
        cond = m.group(2) or "true"
        if _contains_subquery(cond):
            # subquery predicate (IN/NOT IN/EXISTS/scalar): evaluate the
            # WHERE via spark.sql over the snapshot, then route the
            # matched KEYS through the keyed delete kernel (index-pruned
            # rewrite; MOR tombstone delta) — snapshot keys are unique,
            # so the key set identifies the matched rows exactly
            t = tables[name]
            keys = _subquery_frame(spark, t, name, f"`{t.key}`", cond)
            return t.delete(keys)
        # WHERE omitted = delete every row (Spark/Hudi DELETE FROM t):
        # one commit, time travel keeps the pre-delete state readable
        return tables[name].delete_where(cond)
    m = re.match(
        rf"UPDATE\s+({_IDENT})\s+SET\s+(.*)$", s, re.IGNORECASE | re.DOTALL
    )
    if m:
        name = m.group(1).strip("`")
        if name not in tables:
            raise ValueError(f"unknown UPDATE target table {name!r}")
        body = m.group(2)
        wh = _scan_top(body, r"\bWHERE\b")
        if wh:
            sets, cond = body[: wh[0][0]], body[wh[0][1] :]
        else:
            sets, cond = body, "true"
        if _contains_subquery(body):
            # subquery in the WHERE or a SET expression: compute the
            # matched rows' NEW versions in one spark.sql pass
            # (simultaneous-assignment semantics — every SET evaluates
            # against the OLD row, scalar subqueries included), then
            # upsert them: the merge kernel replaces batch keys
            # unconditionally and its range/bucket/bloom/record-index
            # prunes bound the rewrite to affected files (MOR: one
            # O(matches) delta). History records the commit as
            # "upsert"/"deltacommit" — the read-modify-write shape.
            t = tables[name]
            assigns = _parse_assignments(sets)
            t._validate_update_targets(assigns)
            schema = t.effective_schema()
            if schema is None:
                raise ValueError(f"UPDATE target {name!r} has no schema")
            proj = ", ".join(
                f"({assigns[c]}) AS `{c}`" if c in assigns else f"`{c}`"
                for c in schema.fieldNames()
                if c != META_COL
            )
            updated = _subquery_frame(spark, t, name, proj, cond)
            return t.upsert(updated)
        return tables[name].update_where(_parse_assignments(sets), cond)
    m = re.match(
        rf"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?({_IDENT})\s*"
        rf"(?:PARTITION\s*\(([^)]*)\)\s*)?"
        rf"(\(([^)]*)\)\s*)?(SELECT\b.*|VALUES\b.*)$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        verb = m.group(1).upper()
        name = m.group(2).strip("`")
        if name not in tables:
            raise ValueError(f"unknown INSERT target table {name!r}")
        t = tables[name]
        if m.group(3) is not None and verb == "INTO":
            raise ValueError(
                "PARTITION spec is only supported with INSERT OVERWRITE "
                "(INSERT INTO routes through the keyed upsert, which "
                "places rows in their partitions by value)"
            )
        static = _parse_partition_spec(m.group(3), t) if m.group(3) else {}
        df = spark.sql(m.group(6))
        if "_commit_time" in df.columns:
            # SELECT * from an attached engine view carries the system
            # meta column; the target stamps its own (same rule as CTAS)
            df = df.drop("_commit_time")
        schema = t.effective_schema()
        if m.group(5):
            cols = [c.strip().strip("`") for c in m.group(5).split(",")]
            clash = sorted(set(cols) & set(static))
            if clash:
                raise ValueError(
                    f"column(s) {clash} appear in both the column list "
                    "and the static PARTITION spec"
                )
        else:
            # no column list: positional mapping onto the table's data
            # columns (standard SQL INSERT semantics — VALUES/SELECT
            # outputs arrive as col1..colN / arbitrary names); an empty
            # table created via DDL with an explicit column list maps
            # onto that declared schema. Statically-specified partition
            # columns are filled from the spec, so the query's output
            # maps onto the REMAINING columns (Spark INSERT semantics).
            if schema is None:
                raise ValueError(
                    f"INSERT {verb} an empty table needs an explicit "
                    "column list (no schema to map positionally onto)"
                )
            cols = [
                f.name
                for f in schema.fields
                if f.name != "_commit_time" and f.name not in static
            ]
        if len(cols) != len(df.columns):
            raise ValueError(
                f"INSERT column/select arity mismatch: {len(cols)} "
                f"columns vs {len(df.columns)} query outputs"
            )
        out = df.toDF(*cols)
        for pcol, lit in static.items():
            out = out.withColumn(pcol, F.expr(lit))
        if schema is not None:
            # standard INSERT INTO semantics: the query's output types
            # cast to the TABLE's types (VALUES literals arrive as
            # int/NullType; without the cast the first write would
            # silently publish the drifted types as the table schema)
            by_name = {f.name: f.dataType for f in schema.fields}
            out = out.select(
                *(
                    F.col(c).cast(by_name[c]).alias(c) if c in by_name else F.col(c)
                    for c in out.columns
                )
            )
            # INSERT writes rows, never a column order: restore the
            # TABLE's column order so the commit re-publishes the same
            # schema (a static PARTITION spec appends its column last,
            # which would otherwise reorder the schema and break later
            # positional INSERTs)
            have = set(out.columns)
            order = [
                f.name
                for f in schema.fields
                if f.name != "_commit_time" and f.name in have
            ]
            if len(order) == len(out.columns):
                out = out.select(*order)
        if verb == "INTO":
            return t.upsert(out)
        if static:
            # a fully-static PARTITION spec replaces exactly the NAMED
            # partition — resolved from the SPEC, not the batch, so an
            # empty SELECT still clears it (Spark's static-spec INSERT
            # OVERWRITE contract). The hive-codec value comes from
            # casting the literal through the TABLE's partition column
            # type then to string (a 1-row driver evaluation), so '5'
            # against a double partition column matches the '5.0' the
            # writer's directory layout uses.
            hive = partition_spec_to_hive(spark, schema, static)
            return t.insert_overwrite(
                out, dynamic=True, static_partitions=hive
            )
        mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        return t.insert_overwrite(out, dynamic=mode.lower() == "dynamic")
    m = re.match(
        rf"OPTIMIZE\s+({_IDENT})"
        r"(?:\s+WHERE\s+(.+?))?"
        r"(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        name = m.group(1).strip("`")
        if name not in tables:
            raise ValueError(f"unknown OPTIMIZE target table {name!r}")
        zcols = (
            [c.strip().strip("`") for c in m.group(3).split(",")]
            if m.group(3)
            else None
        )
        # WHERE scope = partition-provable conjuncts only (Delta's
        # OPTIMIZE t WHERE contract) — compact() validates fail-closed
        c = TableServices(tables[name]).compact(
            zorder_cols=zcols, where=m.group(2)
        )
        return c if c is not None else ""
    m = re.match(
        rf"VACUUM\s+({_IDENT})"
        r"(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+(COMMITS|HOURS))?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        name = m.group(1).strip("`")
        if name not in tables:
            raise ValueError(f"unknown VACUUM target table {name!r}")
        unit = (m.group(3) or "COMMITS").upper()
        if unit == "HOURS":
            # Delta's VACUUM t RETAIN n HOURS — routes to the
            # time-based cleaner policy (Hudi KEEP_LATEST_BY_HOURS)
            TableServices(tables[name]).clean(
                retain_hours=float(m.group(2))
            )
        else:
            if m.group(2) is not None and "." in m.group(2):
                raise ValueError(
                    f"RETAIN {m.group(2)} COMMITS must be an integer"
                )
            retain = int(m.group(2)) if m.group(2) else 5  # doc default
            TableServices(tables[name]).clean(retain_commits=retain)
        # clean() publishes no commit — return the (unchanged) latest
        # commit id; documented in the module grammar
        return tables[name].latest_commit()
    if re.match(r"CALL\b", s, re.IGNORECASE):
        raise ValueError(
            "CALL returns a result DataFrame, not a commit id — use "
            "sql_dml.call_procedure for procedure statements"
        )
    raise ValueError(f"unsupported DML statement: {s[:80]!r}")


# -- CALL procedures ----------------------------------------------------
#
# Hudi's Spark-SQL procedure surface (the public ``CALL`` statement
# family: show_commits / create_savepoint / rollback_to_savepoint /
# run_compaction / run_clustering / run_clean / archive_commits ...)
# re-expressed over the engine's table services. Named arguments only
# (``CALL proc(table => 't', ...)``); every procedure returns a small
# result DataFrame like Hudi's do — maintenance procedures run the
# corresponding :class:`TableServices` job and report what it did,
# ``show_*`` procedures are metadata-plane reads (manifest headers
# only, no data files touched).

_CALL_ARG_RX = re.compile(
    rf"\s*({_IDENT})\s*=>\s*('[^']*'|\"[^\"]*\"|[+-]?\d+\.?\d*|true|false)\s*$",
    re.IGNORECASE,
)


def _parse_call(stmt: str) -> tuple[str, dict]:
    """``CALL name(k => v, ...)`` → (name, {k: python_value})."""
    m = re.match(
        rf"\s*CALL\s+({_IDENT})\s*\((.*)\)\s*;?\s*$",
        stmt,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"not a CALL statement: {stmt[:80]!r}")
    name = m.group(1).strip("`").lower()
    args: dict = {}
    body = m.group(2).strip()
    for part in _split_top(body, r",") if body else []:
        am = _CALL_ARG_RX.match(part)
        if not am:
            raise ValueError(
                f"cannot parse CALL argument {part!r} (named "
                "`key => value` arguments only; strings quoted)"
            )
        k = am.group(1).strip("`").lower()
        v: object = am.group(2)
        if v[0] in "'\"":
            v = v[1:-1]
        elif v.lower() in ("true", "false"):
            v = v.lower() == "true"
        elif "." in v:
            v = float(v)
        else:
            v = int(v)
        if k in args:
            raise ValueError(f"duplicate CALL argument {k!r}")
        args[k] = v
    return name, args


def _call_target(args: dict, tables: dict[str, Table]) -> Table:
    name = args.pop("table", None)
    if name is None:
        raise ValueError("CALL procedure needs a table => '<name>' argument")
    if name not in tables:
        raise ValueError(f"unknown CALL target table {name!r}")
    return tables[name]


def call_procedure(
    spark: SparkSession, stmt: str, tables: dict[str, Table]
) -> DataFrame:
    """Execute a ``CALL`` procedure statement against engine tables.

    Supported (signatures mirror Hudi's Spark-SQL procedures; all take
    ``table => '<name>'`` resolved against ``tables``):

    - ``show_commits(table[, limit])`` — newest-first timeline rows
      (default limit 10).
    - ``show_fsview_all(table)`` — the live file set with stats.
    - ``show_table_properties(table)`` — table config as key/value.
    - ``show_savepoints(table)`` — savepointed commit ids.
    - ``create_savepoint(table[, commit_time])`` — pin a commit
      against the cleaner (defaults to the latest).
    - ``delete_savepoint(table, instant_time)`` — release the pin.
    - ``rollback_to_savepoint(table, instant_time)`` — restore the
      table to a SAVEPOINTED commit (raises if not savepointed —
      Hudi's contract; the pin is what guarantees the files survived
      the cleaner).
    - ``rollback_to_instant(table, instant_time)`` — restore to any
      commit still readable (manifest surgery, no data copied).
    - ``run_compaction(table[, op])`` — ``op => 'run'`` (default)
      folds MOR deltas into the base; ``op => 'schedule'`` only
      reports whether the trigger policy would compact.
    - ``run_clustering(table[, order][, zorder][, small_file_rows]
      [, bucket_count])``
      — sort-and-size rewrite; ``order`` is a comma-separated column
      list, ``zorder => true`` Morton-clusters on those columns
      instead of linear sorting; ``small_file_rows => N`` switches to
      the size-based strategy (rewrite ONLY base files under N rows —
      O(small files), Hudi's small-file limit; mutually exclusive
      with order/zorder).
    - ``run_clean(table[, retain_commits][, retain_hours])`` —
      retention GC (default: last 5 commits, the VACUUM default;
      ``retain_hours => H`` switches to Hudi's KEEP_LATEST_BY_HOURS —
      commits inside the trailing window plus the latest stay
      readable).
    - ``archive_commits(table[, keep_active])`` — fold old manifests
      into the archive (default keep_active 20).
    - ``show_rollbacks(table[, limit])`` — the restore commits
      (every rollback publishes ``action='restore'``), newest first.
    - ``show_archived_commits(table[, limit])`` — timeline rows
      already folded out of the active window.
    - ``commits_compare(table, other => '<name>')`` — commit-depth
      delta vs another attached table (replication monitoring).
    - ``shallow_clone(table, location => '<path>'[, clone_name])`` —
      zero-copy clone (:meth:`Table.shallow_clone`): the clone commit
      adopts the source's live files in place and the clone is
      ATTACHED to the session under ``clone_name`` (default
      ``<table>_clone``) so later statements can query/write it.
    """
    name, args = _parse_call(stmt)
    t = _call_target(args, tables)
    svc = TableServices(t)

    def _df(rows, schema):
        return spark.createDataFrame(rows, schema)

    known = {
        "show_commits", "show_fsview_all", "show_table_properties",
        "show_savepoints", "create_savepoint", "delete_savepoint",
        "rollback_to_savepoint", "rollback_to_instant", "run_compaction",
        "run_clustering", "run_clean", "archive_commits",
        "show_archived_commits", "commits_compare", "show_rollbacks",
        "shallow_clone",
    }
    if name not in known:
        raise ValueError(f"unknown CALL procedure {name!r}")

    def _take(*keys) -> dict:
        unknown = set(args) - set(keys)
        if unknown:
            raise ValueError(
                f"unexpected argument(s) for {name}: {sorted(unknown)}"
            )
        return args

    if name == "show_commits":
        kw = _take("limit")
        limit = int(kw.get("limit", 10))
        return t.history_df().orderBy(F.desc("commit")).limit(limit)
    if name == "show_rollbacks":
        # Hudi's show_rollbacks: the timeline rows where the table was
        # rolled back — every restore commit (rollback_to_savepoint /
        # rollback_to_instant / RESTORE all publish action='restore'),
        # newest first; manifest headers only
        kw = _take("limit")
        limit = int(kw.get("limit", 10))
        return (
            t.history_df()
            .where(F.col("action") == "restore")
            .orderBy(F.desc("commit"))
            .limit(limit)
        )
    if name == "show_archived_commits":
        # Hudi's show_archived_commits: timeline rows already folded
        # out of the active window by archive_commits — manifest
        # headers only, loaded from the consolidated archive batches
        kw = _take("limit")
        limit = int(kw.get("limit", 10))
        rows = [
            (
                c,
                m.get("action"),
                m.get("ts"),
                len(m.get("files_added") or []),
                len(m.get("files_removed") or []),
            )
            for c, m in sorted(t._archived_manifests().items(), reverse=True)
        ][:limit]
        return _df(
            rows,
            "commit string, action string, ts string, "
            "n_files_added long, n_files_removed long",
        )
    if name == "shallow_clone":
        # _call_target already popped `table` from args
        kw = _take("location", "clone_name")
        loc = kw.get("location")
        if loc is None:
            raise ValueError("shallow_clone needs location => '<path>'")
        src_name = next((k for k, v in tables.items() if v is t), "src")
        cname = kw.get("clone_name") or f"{src_name}_clone"
        if cname in tables:
            raise ValueError(
                f"clone_name {cname!r} is already an attached table"
            )
        clone = Table.shallow_clone(spark, loc, t, table_name=cname)
        # attach so subsequent session statements can query/write it
        tables[cname] = clone
        return _df(
            [(
                cname,
                loc,
                clone.commits()[0],
                len(clone.current_files()),
            )],
            "clone_name string, location string, clone_commit string, "
            "n_adopted_files long",
        )
    if name == "commits_compare":
        # Hudi's commits_compare: how far this table's timeline is
        # ahead of / behind another attached table's (replication /
        # backfill monitoring). Driver-side manifest headers only.
        kw = _take("other")
        oname = kw.get("other")
        if oname is None:
            raise ValueError(
                "commits_compare needs other => '<attached table name>'"
            )
        if oname not in tables:
            raise ValueError(f"unknown CALL table {oname!r}")
        o = tables[oname]
        mine = t.commits(include_archived=True)
        theirs = o.commits(include_archived=True)
        delta = len(mine) - len(theirs)
        msg = (
            f"source is ahead by {delta} commits"
            if delta > 0
            else f"source is behind by {-delta} commits"
            if delta < 0
            else "source and target are at the same commit depth"
        )
        return _df(
            [
                (
                    t.latest_commit(),
                    o.latest_commit(),
                    len(mine),
                    len(theirs),
                    msg,
                )
            ],
            "source_latest string, target_latest string, "
            "source_commits long, target_commits long, message string",
        )
    if name == "show_fsview_all":
        _take()
        return t.files_df()
    if name == "show_table_properties":
        _take()
        rows = sorted(
            (k, _json_str(v)) for k, v in t.meta.items() if v is not None
        )
        return _df(rows, "key string, value string")
    if name == "show_savepoints":
        _take()
        return _df(
            [(c,) for c in t.savepoints()], "savepoint_time string"
        )
    if name == "create_savepoint":
        kw = _take("commit_time")
        c = t.savepoint(kw.get("commit_time"))
        return _df([(c, True)], "savepoint_time string, result boolean")
    if name == "delete_savepoint":
        kw = _take("instant_time")
        t.release_savepoint(kw["instant_time"])
        return _df(
            [(kw["instant_time"], True)],
            "savepoint_time string, result boolean",
        )
    if name == "rollback_to_savepoint":
        kw = _take("instant_time")
        target = kw["instant_time"]
        if target not in t.savepoints():
            raise ValueError(
                f"commit {target!r} is not savepointed — use "
                "rollback_to_instant for unpinned commits"
            )
        c = t.restore(target)
        return _df([(target, c, True)],
                   "instant_time string, commit string, result boolean")
    if name == "rollback_to_instant":
        kw = _take("instant_time")
        c = t.restore(kw["instant_time"])
        return _df([(kw["instant_time"], c, True)],
                   "instant_time string, commit string, result boolean")
    if name == "run_compaction":
        kw = _take("op")
        op = str(kw.get("op", "run")).lower()
        if op == "schedule":
            return _df([(svc.should_compact(),)], "should_compact boolean")
        if op != "run":
            raise ValueError(f"run_compaction op must be run|schedule: {op!r}")
        c = svc.compact()
        return _df([(c, "completed")], "commit string, state string")
    if name == "run_clustering":
        kw = _take(
            "order", "zorder", "target_records_per_file",
            "small_file_rows", "bucket_count",
        )
        if "bucket_count" in kw:
            # bucket-layout resize IS a clustering strategy (Hudi's
            # consistent-hashing resize runs as clustering too); the
            # CALL form always rewrites — the metadata-only migration
            # is the API's resize_buckets(rewrite=False)
            if cols_clash := {
                k
                for k in (
                    "order", "zorder", "small_file_rows",
                    "target_records_per_file",
                )
                if k in kw
            }:
                raise ValueError(
                    "bucket_count is its own strategy — omit "
                    f"{sorted(cols_clash)} (bucket tables cluster by "
                    "(bucket, key))"
                )
            c = svc.resize_buckets(int(kw["bucket_count"]), rewrite=True)
            state = "completed" if c is not None else "skipped"
            return _df([(c, state)], "commit string, state string")
        cols = (
            [c.strip().strip("`") for c in str(kw["order"]).split(",")]
            if "order" in kw
            else None
        )
        tr = kw.get("target_records_per_file")
        if tr is not None:
            tr = int(tr)  # users habitually quote CALL args
        if "small_file_rows" in kw:
            # Hudi's size-based plan strategy: rewrite only small file
            # groups — O(small files), not O(table)
            if cols or kw.get("zorder"):
                raise ValueError(
                    "small_file_rows is its own strategy — omit "
                    "order/zorder (output is key-clustered)"
                )
            c = svc.cluster_small_files(
                int(kw["small_file_rows"]), target_records_per_file=tr
            )
            state = "completed" if c is not None else "skipped"
            return _df([(c, state)], "commit string, state string")
        if kw.get("zorder"):
            if not cols:
                raise ValueError(
                    "run_clustering zorder => true needs order => 'c1,c2'"
                )
            c = svc.compact(
                zorder_cols=cols, target_records_per_file=tr
            )
        else:
            c = svc.compact(sort_cols=cols, target_records_per_file=tr)
        return _df([(c, "completed")], "commit string, state string")
    if name == "run_clean":
        kw = _take("retain_commits", "retain_hours")
        rh = kw.get("retain_hours")
        deleted = svc.clean(
            retain_commits=int(kw.get("retain_commits", 5)),
            retain_hours=float(rh) if rh is not None else None,
        )
        return _df([(len(deleted),)], "deleted_files bigint")
    # archive_commits
    kw = _take("keep_active")
    archived = svc.archive_timeline(keep_active=int(kw.get("keep_active", 20)))
    return _df([(len(archived),)], "archived_commits bigint")


def _json_str(v) -> str:
    import json

    return v if isinstance(v, str) else json.dumps(v)
