"""SQL-surface catalog: expose engine tables to ``spark.sql`` as views.

The reference's primary query interface is SQL over temp views
(SURVEY §1.1 temp-view catalog): every loaded table is registered by
name and all queries are strings. ``attach`` recreates that surface over
engine tables — each name binds to the table's current snapshot (or an
incremental window), after which arbitrary ``spark.sql`` runs against
them with full Catalyst planning.

Scale note: a plain snapshot view names EVERY live file in its scan —
Catalyst still pushes predicates into the parquet reads, but at 10⁵
files the listing itself dominates a selective query. Two ways to get
manifest pruning on this surface:

- pass ``where`` to bind a view through :meth:`Table.read_where`, which
  consults the manifest's file stats FIRST and only plans the
  surviving files (the read-side analog of the upsert key-prune
  envelope); or
- just call :func:`sql_over` — it scans the query string's own
  top-level WHERE conjuncts (``view.col <op> literal`` or
  unambiguous bare columns), attributes them to attached views, and
  binds those views pre-pruned, with NO API change for the reader.

Both are fail-closed: a predicate the extractor can't attribute with
certainty contributes no pruning and the full query semantics are
untouched (pruning only drops files whose stats PROVE the predicate
false for every row in them — under outer joins a pruned right side
just null-extends rows the WHERE conjunct then removes, same result).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .sqltext import IDENT, scan_top, split_top
from .table import Table, _filters_from_predicate


def attach(
    spark: SparkSession,
    tables: dict[str, str | Table],
    query_type: str = "snapshot",
    where: dict[str, str] | None = None,
    **read_kw,
) -> dict[str, Table]:
    """Register each ``{view_name: table_path}`` as a temp view.

    ``where`` maps view names to Spark-SQL predicate strings: those
    views bind manifest-pruned reads (:meth:`Table.read_where`) instead
    of the full snapshot — same rows as filtering the snapshot, but a
    selective key/partition predicate scans only the files whose stats
    admit it. ``read_where`` is a SNAPSHOT read, so naming a view in
    ``where`` while asking for a different ``query_type`` is a
    conflict and raises rather than silently widening an incremental/
    CDC window to filtered-full-history.

    ``tables`` values may be paths or already-opened :class:`Table`
    handles (no second manifest load on the hot read path).

    Returns the opened Table handles (for writes/services on the same
    objects)."""
    if where and query_type != "snapshot":
        raise ValueError(
            f"where= binds snapshot reads; conflicting "
            f"query_type={query_type!r} for view(s) {sorted(where)}"
        )
    out: dict[str, Table] = {}
    for name, path in tables.items():
        t = path if isinstance(path, Table) else Table.load(spark, path)
        pred = (where or {}).get(name)
        if pred is not None:
            df = t.read_where(pred)
        else:
            df = t.read(query_type, **read_kw)
        df.createOrReplaceTempView(name)
        out[name] = t
    return out


_REL_RX = re.compile(
    rf"^\s*({IDENT})\s*(?:(?:AS\s+)?({IDENT})\s*)?$", re.IGNORECASE
)
# STRICT conjunct form: (qual.)col <op> literal — the only shape
# read_where can prune on, and the only shape that is guaranteed to
# resolve on the bare single-table view after de-qualification (a
# conjunct like ``a.k = b.k2 + 1`` must NOT be extracted: stripped of
# its qualifier it references another relation's column).
_LITERAL = r"'[^']*'|[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?|true|false"
_QCOL_RX = re.compile(
    rf"^\s*(?:({IDENT})\s*\.\s*)?({IDENT})\s*(==|=|<=|>=|<|>)\s*"
    rf"({_LITERAL})\s*$",
    re.IGNORECASE,
)


def _idents_in_parens(s: str) -> set[str]:
    """Lower-cased identifier tokens that occur at paren depth > 0,
    outside quoted strings/backticks. Subqueries are parenthesized, so
    any view NAME appearing here may be read independently of its
    top-level FROM binding — pruning that binding would change the
    subquery's input."""
    out: set[str] = set()
    i, n, depth = 0, len(s), 0
    while i < n:
        c = s[i]
        if c in ("'", '"', "`"):
            j = s.find(c, i + 1)
            i = n if j < 0 else j + 1
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        m = re.match(r"[A-Za-z_][\w$]*", s[i:])
        if m:
            if depth > 0:
                out.add(m.group(0).lower())
            i += m.end()
            continue
        i += 1
    return out


def _from_relations(query: str) -> dict[str, str] | None:
    """{qualifier: view_name} for every relation in the query's single
    top-level FROM clause, or None (fail closed: no FROM / more than
    one / a subquery or anything else unparseable in it). Subqueries
    elsewhere are parenthesized, so ``scan_top`` never sees their
    keywords."""
    froms = scan_top(query, r"\bFROM\b")
    if len(froms) != 1:
        return None
    seg = query[froms[0][1] :]
    ends = scan_top(
        seg,
        r"\bWHERE\b|\bGROUP\s+BY\b|\bHAVING\b|\bORDER\s+BY\b|\bLIMIT\b"
        r"|\bWINDOW\b|\bUNION\b|\bINTERSECT\b|\bEXCEPT\b",
    )
    if ends:
        seg = seg[: ends[0][0]]
    rels: dict[str, str] = {}
    for part in split_top(seg, r",|\bJOIN\b"):
        # strip join-type keywords that precede JOIN and the ON clause
        # that follows the relation
        part = re.sub(
            r"\b(INNER|LEFT|RIGHT|FULL|OUTER|CROSS|SEMI|ANTI|NATURAL)\b",
            " ",
            part,
            flags=re.IGNORECASE,
        )
        on = scan_top(part, r"\bON\b|\bUSING\b")
        if on:
            part = part[: on[0][0]]
        if not part.strip():
            continue
        m = _REL_RX.match(part)
        if not m:
            return None  # subquery / lateral / unparseable → no pruning
        name = m.group(1).strip("`")
        alias = (m.group(2) or name).strip("`")
        if alias.upper() in ("ON", "USING"):
            return None
        if alias in rels:
            return None  # duplicate qualifier → ambiguous
        rels[alias] = name
    return rels or None


def _auto_where(
    query: str, tables: dict[str, Table]
) -> dict[str, str]:
    """Extract per-view predicate strings from the query's own
    top-level WHERE conjuncts. Attribution rules (each fail-closed):

    - ``qual.col <op> literal`` → the view ``qual`` names (directly or
      via its FROM alias), if attached;
    - bare ``col <op> literal`` → only when EVERY relation in FROM is
      an attached engine view and exactly ONE of their schemas has
      ``col`` (otherwise the reference is ambiguous or could belong to
      a relation whose contents we can't see);
    - a top-level OR anywhere in the WHERE disables extraction
      entirely (the conjuncts are not all required);
    - anything unparseable contributes nothing.

    The returned fragments feed :meth:`Table.read_where` per view —
    which itself extracts only provable ``col op literal`` conjuncts —
    so double fail-closed."""
    if scan_top(query, r"\bWITH\b"):
        # a CTE can shadow an attached view's name or read the view
        # inside its (parenthesized, hence invisible) body — pre-
        # filtering the binding would change what the CTE sees
        return {}
    wh = scan_top(query, r"\bWHERE\b")
    if len(wh) != 1:
        return {}
    pred = query[wh[0][1] :]
    ends = scan_top(
        pred,
        r"\bGROUP\s+BY\b|\bHAVING\b|\bORDER\s+BY\b|\bLIMIT\b|\bWINDOW\b"
        r"|\bUNION\b|\bINTERSECT\b|\bEXCEPT\b",
    )
    if ends:
        pred = pred[: ends[0][0]]
    if scan_top(pred, r"\bOR\b"):
        return {}
    all_rels = _from_relations(query)
    if all_rels is None:
        return {}
    # a view joined to ITSELF under two aliases cannot take a per-view
    # pre-filter (each alias needs the unfiltered relation) — exclude
    # such views from attribution; ambiguity bookkeeping below still
    # runs over ALL relations, so their columns stay unattributable
    counts: dict[str, int] = {}
    for n in all_rels.values():
        counts[n] = counts.get(n, 0) + 1
    rels = {a: n for a, n in all_rels.items() if counts[n] == 1}
    if not rels:
        return {}
    all_attached = all(n in tables for n in all_rels.values())
    col_owner: dict[str, str | None] = {}
    if all_attached:
        for alias, name in all_rels.items():
            schema = tables[name]._schema()
            for f in schema.fields if schema is not None else []:
                # None marks a column seen in >1 relation → ambiguous
                col_owner[f.name] = (
                    alias if f.name not in col_owner else None
                )
    out: dict[str, list[str]] = {}
    for conj in split_top(pred, r"\bAND\b"):
        m = _QCOL_RX.match(conj)
        if not m:
            continue
        qual = m.group(1).strip("`") if m.group(1) else None
        col = m.group(2).strip("`")
        if qual is None:
            qual = col_owner.get(col)
        if qual is None or qual not in rels or rels[qual] not in tables:
            continue
        # rebuild the fragment FROM THE MATCH GROUPS (never a textual
        # qualifier strip — that would also rewrite a string literal
        # that happens to contain "<qual>.")
        frag = f"{col} {m.group(3)} {m.group(4)}"
        out.setdefault(rels[qual], []).append(frag)
    # a view whose NAME also appears inside any parenthesized region
    # (scalar/IN/EXISTS subquery) is read there independently of the
    # top-level FROM binding — pruning the binding would filter that
    # second read too. Drop such views from attribution.
    deep = _idents_in_parens(query)
    return {
        name: " AND ".join(frags)
        for name, frags in out.items()
        if name.lower() not in deep
    }


def sql_over(
    spark: SparkSession,
    tables: dict[str, str | Table],
    query: str,
    where: dict[str, str] | None = None,
) -> DataFrame:
    """One-shot: attach snapshots and run a SQL string over them — the
    reference's interface, plus manifest pruning for free: unless
    ``where`` overrides it, the query's own top-level WHERE conjuncts
    are attributed to the attached views (see :func:`_auto_where`) and
    those views bind pre-pruned, so a selective SQL-string reader
    plans only the files whose stats admit its predicate."""
    opened = {
        n: (p if isinstance(p, Table) else Table.load(spark, p))
        for n, p in tables.items()
    }
    if where is None:
        auto = _auto_where(query, opened)
        where = {
            name: pred
            for name, pred in auto.items()
            if _filters_from_predicate(pred, opened[name]._schema())
        } or None
    attach(spark, opened, where=where)
    return spark.sql(query)
