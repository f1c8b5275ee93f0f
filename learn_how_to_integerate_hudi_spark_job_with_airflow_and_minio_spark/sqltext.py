"""Tiny quote/paren-aware SQL text scanning shared by the DML parser
(:mod:`.sql_dml`) and the manifest-prune predicate extractor
(:meth:`.table.Table.read_where`).

Not a SQL parser: just enough lexical awareness (single- AND
double-quoted strings — Spark SQL treats ``"..."`` as a string literal
by default — backtick identifiers, paren depth) to find top-level
keyword tokens so callers can split statements/predicates without
being fooled by quoted or parenthesized content. Anything these
helpers can't see through, the callers treat fail-closed.
"""

from __future__ import annotations

import re

IDENT = r"[A-Za-z_][\w$]*|`[^`]+`"


def skip_string(s: str, i: int, q: str) -> int:
    """Index just past the string/identifier opened by ``s[i] == q``.
    Single/double-quoted strings honor backslash escapes (Spark's
    default lexer does — ``'it\\'s'`` is ONE literal, so a walker using
    a bare find() would end it early and mis-lex everything after,
    review finding); backtick identifiers have no backslash escapes."""
    n = len(s)
    j = i + 1
    while j < n:
        c = s[j]
        if c == "\\" and q != "`":
            j += 2
            continue
        if c == q:
            return j + 1
        j += 1
    return n


def walk(s: str):
    """THE quote/comment/escape walker (r10 unified three copies).

    Yields ``(kind, start, end)`` segments that tile ``s`` exactly once,
    in order, where kind is:

    - ``"text"`` — plain SQL outside strings and comments;
    - ``"string"`` — a single- or double-quoted literal INCLUDING its
      quotes (Spark's default lexer treats ``"..."`` as a string
      literal), backslash-escape-aware via :func:`skip_string`;
    - ``"backtick"`` — a backtick-quoted identifier including its
      ticks (no backslash escapes);
    - ``"comment"`` — a ``--``-to-newline (newline included) or
      ``/* */`` comment.

    Every lexical scan in the engine (:func:`scan_top`,
    :func:`blank_strings`, :func:`.sql_session._strip_quoted`) is a
    thin adapter over this generator, so an escape/comment rule fix
    lands in ONE place — the r10 backslash fix had to patch three
    hand-rolled loops separately.
    """
    i, n = 0, len(s)
    text_start = 0
    while i < n:
        c = s[i]
        if c == "'" or c == '"' or c == "`":
            if text_start < i:
                yield ("text", text_start, i)
            end = skip_string(s, i, c)
            yield ("backtick" if c == "`" else "string", i, end)
            i = text_start = end
            continue
        if c == "-" and s.startswith("--", i):
            if text_start < i:
                yield ("text", text_start, i)
            j = s.find("\n", i)
            end = n if j < 0 else j + 1
            yield ("comment", i, end)
            i = text_start = end
            continue
        if c == "/" and s.startswith("/*", i):
            if text_start < i:
                yield ("text", text_start, i)
            j = s.find("*/", i + 2)
            end = n if j < 0 else j + 2
            yield ("comment", i, end)
            i = text_start = end
            continue
        i += 1
    if text_start < n:
        yield ("text", text_start, n)


def scan_top(s: str, pattern: str) -> list[tuple[int, int]]:
    """(start, end) spans of ``pattern`` matches at paren depth 0,
    outside single/double-quoted strings, backtick identifiers, and
    comments. Matches are bounded to one text segment (the patterns
    used here are keywords/separators — whitespace in them never
    legitimately crosses a string or comment, which the old
    position-by-position loop couldn't either since ``'``/``/`` are
    not ``\\s``)."""
    rx = re.compile(pattern, re.IGNORECASE)
    spans: list[tuple[int, int]] = []
    depth = 0
    for kind, a, b in walk(s):
        if kind != "text":
            continue
        i = a
        while i < b:
            c = s[i]
            if c == "(":
                depth += 1
                i += 1
                continue
            if c == ")":
                depth -= 1
                i += 1
                continue
            if depth == 0:
                m = rx.match(s, i, b)
                if m:
                    spans.append((m.start(), m.end()))
                    i = m.end()
                    continue
            i += 1
    return spans


def blank_strings(s: str) -> str:
    """``s`` with quoted-string contents, backtick-identifier contents,
    and comments replaced by spaces (same-length, so offsets survive).
    Keyword scans over the result can never match text a user typed
    inside a literal or a comment."""
    out = []
    for kind, a, b in walk(s):
        out.append(s[a:b] if kind == "text" else " " * (b - a))
    return "".join(out)


_SUBQ_RX = re.compile(r"\(\s*SELECT\b", re.IGNORECASE)


def contains_subquery(s: str) -> bool:
    """True when a ``(SELECT`` opens anywhere outside quoted strings
    and comments — i.e. the text embeds a genuine subquery (IN/EXISTS/
    scalar), which Spark's DataFrame expression engine cannot evaluate
    (subqueries resolve only through ``spark.sql``). Used by the DML
    router to pick the SQL-evaluated path for DELETE/UPDATE."""
    return _SUBQ_RX.search(blank_strings(s)) is not None


def rewrite_ident(s: str, old: str, new: str) -> str:
    """``s`` with whole-word occurrences of the identifier ``old``
    replaced by ``new`` in TEXT segments only — string literals and
    comments pass through untouched (so ``concat(col, 'col')`` renames
    the column reference, never the literal), and a backtick segment
    naming exactly ``old`` is rewritten as ``\\`new\\``` (it IS a
    column reference, just quoted).

    Raises ``ValueError`` on an unterminated string/backtick segment:
    the walker would treat the whole tail as a literal and silently
    skip real references — the one genuinely unparseable case, kept
    fail-closed by the caller (``alter_rename_column``).
    """
    rx = re.compile(rf"\b{re.escape(old)}\b")
    out = []
    for kind, a, b in walk(s):
        seg = s[a:b]
        if kind in ("string", "backtick") and (
            len(seg) < 2 or seg[-1] != seg[0]
        ):
            raise ValueError(
                f"unterminated quoted segment in expression: {s!r}"
            )
        if kind == "text":
            out.append(rx.sub(new, seg))
        elif kind == "backtick" and seg[1:-1] == old:
            out.append(f"`{new}`")
        else:
            out.append(seg)
    return "".join(out)


def split_top(s: str, pattern: str) -> list[str]:
    """Split on top-level matches of ``pattern`` (the separators are
    dropped)."""
    spans = scan_top(s, pattern)
    out, pos = [], 0
    for a, b in spans:
        out.append(s[pos:a])
        pos = b
    out.append(s[pos:])
    return out
