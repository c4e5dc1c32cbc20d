"""Recursive-descent parser for the catalog's statement surface.

Replaces the regex statement layer (``iceberg/dml.py`` pre-round-8)
with a grammar over the token stream of :mod:`.lexer` — the Spark-side
answer to the reference delegating statement parsing to DataFusion
(``datafusion_iceberg/src/table.rs:106-108``).

Supported statements::

    INSERT INTO|OVERWRITE [TABLE] cat.ns.tbl [(cols)] <query>
    DELETE FROM cat.ns.tbl [WHERE <pred>]
    UPDATE cat.ns.tbl SET col = <expr>, ... [WHERE <pred>]
    MERGE INTO cat.ns.tbl [AS] t USING <source> [AS] s ON <cond>
        WHEN MATCHED THEN UPDATE SET ... | DELETE
        WHEN NOT MATCHED THEN INSERT *
    CREATE [OR REPLACE] TABLE [IF NOT EXISTS] cat.ns.tbl
        [(ddl)] [PARTITIONED BY (...)] [TBLPROPERTIES (...)] [AS <query>]
    CREATE [OR REPLACE] VIEW cat.ns.tbl AS <query>
    DROP TABLE|VIEW [IF EXISTS] cat.ns.tbl
    ALTER TABLE cat.ns.tbl ADD COLUMN | RENAME COLUMN | DROP COLUMN
        | ALTER COLUMN t TYPE | SET/UNSET TBLPROPERTIES
    TRUNCATE TABLE cat.ns.tbl
    REFRESH TABLE cat.ns.tbl
    ANALYZE TABLE cat.ns.tbl [COMPUTE STATISTICS]
    CALL cat.system.proc(arg, name => arg, ...)
    SHOW NAMESPACES IN cat | SHOW TABLES IN cat[.ns]
        | SHOW PARTITIONS/TBLPROPERTIES/CREATE TABLE cat.ns.tbl
    DESCRIBE [TABLE] cat.ns.tbl

Contract with the dispatcher: :func:`parse_statement` returns ``None``
when the statement does not target ``catalog_name`` (the query falls
through to the read path / plain ``spark.sql``), raises
:class:`ParseError` when it IS ours but malformed, and otherwise
returns a typed AST node (:mod:`.ast_nodes`).  Expression slots come
back as verbatim source spans whose boundaries the grammar guarantees —
a keyword inside a string literal or comment can never terminate a
span, the failure class the regex layer carried.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from datafusion_iceberg_spark.sql import ast_nodes as A
from datafusion_iceberg_spark.sql.lexer import (
    EOF,
    IDENT,
    NUMBER,
    OP,
    QIDENT,
    STRING,
    LexError,
    Token,
    tokenize,
)


class ParseError(ValueError):
    """A statement targeting this catalog failed to parse."""


class _NotOurs(Exception):
    """Internal: statement does not target this catalog."""


class _P:
    def __init__(self, text: str, catalog: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0
        self.catalog = catalog

    # ---- navigation -----------------------------------------------------
    def peek(self, k: int = 0) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> Token:
        t = self.toks[self.i]
        if t.kind != EOF:
            self.i += 1
        return t

    def at_end(self) -> bool:
        return self.peek().kind == EOF

    def error(self, msg: str) -> ParseError:
        t = self.peek()
        where = (
            f"at end of statement"
            if t.kind == EOF
            else f"at offset {t.start}: {self.text[t.start:t.start + 30]!r}"
        )
        return ParseError(f"{msg} ({where})")

    # ---- keywords / idents ----------------------------------------------
    def at_kw(self, *words: str) -> bool:
        return self.peek().is_kw(*(w.upper() for w in words))

    def accept_kw(self, *words: str) -> bool:
        if self.at_kw(*words):
            self.advance()
            return True
        return False

    def expect_kw(self, *words: str) -> Token:
        if not self.at_kw(*words):
            raise self.error(f"expected {'/'.join(words)}")
        return self.advance()

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t.kind == OP and t.value == op

    def accept_op(self, op: str) -> bool:
        if self.at_op(op):
            self.advance()
            return True
        return False

    def expect_op(self, op: str) -> Token:
        if not self.at_op(op):
            raise self.error(f"expected {op!r}")
        return self.advance()

    def ident(self, what: str = "identifier") -> str:
        t = self.peek()
        if t.kind in (IDENT, QIDENT):
            self.advance()
            return t.value
        raise self.error(f"expected {what}")

    def expect_end(self) -> None:
        if not self.at_end():
            raise self.error("unexpected trailing input")

    # ---- names ----------------------------------------------------------
    def dotted_name(self) -> list[str]:
        parts = [self.ident("name")]
        while self.at_op("."):
            self.advance()
            parts.append(self.ident("name segment"))
        return parts

    def catalog_target(self) -> tuple[str, str]:
        """``<catalog>.<ns>.<tbl>`` or :class:`_NotOurs`.  Called at the
        position where the statement's target name must appear; raising
        _NotOurs hands the whole statement back to Spark."""
        t = self.peek()
        if t.kind not in (IDENT, QIDENT):
            raise _NotOurs()
        start = self.i
        parts = self.dotted_name()
        if len(parts) != 3 or parts[0].lower() != self.catalog.lower():
            self.i = start
            raise _NotOurs()
        return parts[1], parts[2]

    def namespace_target(self) -> str:
        """``<catalog>.<ns>`` or :class:`_NotOurs` — the 2-part form of
        :meth:`catalog_target` for namespace DDL."""
        t = self.peek()
        if t.kind not in (IDENT, QIDENT):
            raise _NotOurs()
        start = self.i
        parts = self.dotted_name()
        if len(parts) != 2 or parts[0].lower() != self.catalog.lower():
            self.i = start
            raise _NotOurs()
        return parts[1]

    # ---- spans ----------------------------------------------------------
    def span(self, start_tok: int, end_tok: Optional[int] = None) -> str:
        """Source text from token index ``start_tok`` up to (excluding)
        ``end_tok`` (default: current position)."""
        end_tok = self.i if end_tok is None else end_tok
        if end_tok <= start_tok:
            return ""
        return self.text[
            self.toks[start_tok].start : self.toks[end_tok - 1].end
        ]

    def consume_balanced(self) -> None:
        """Advance past one token; if it opens a bracket, past the whole
        balanced group (strings/comments already atomic after lexing)."""
        t = self.advance()
        if t.kind == OP and t.value in "([{":
            close = {"(": ")", "[": "]", "{": "}"}[t.value]
            while not self.at_end():
                u = self.peek()
                if u.kind == OP and u.value == close:
                    self.advance()
                    return
                self.consume_balanced()
            raise self.error(f"unbalanced {t.value!r}")

    def expr_span(self, stop: Callable[[Token], bool]) -> str:
        """Verbatim source of the expression starting here, ending before
        the first DEPTH-0 token satisfying ``stop`` (or EOF).  Bracketed
        groups are opaque — a stop keyword inside parens never ends the
        span."""
        start = self.i
        while not self.at_end() and not stop(self.peek()):
            self.consume_balanced()
        return self.span(start).strip()

    def expr_span_case_aware(self, stop: Callable[[Token], bool]) -> str:
        """Like :meth:`expr_span`, but CASE ... END expressions are also
        opaque — a WHEN/THEN inside a CASE never terminates the span
        (needed where the grammar's own stop keywords are WHEN/THEN:
        MERGE clause conditions and SET expressions)."""
        start = self.i
        case_depth = 0
        while not self.at_end():
            t = self.peek()
            if t.is_kw("CASE"):
                case_depth += 1
            elif case_depth and t.is_kw("END"):
                case_depth -= 1
            elif case_depth == 0 and stop(t):
                break
            self.consume_balanced()
        return self.span(start).strip()

    def rest_span(self) -> str:
        return self.expr_span(lambda t: False)

    def paren_span(self) -> str:
        """Consume a parenthesized group, returning the INNER text."""
        self.expect_op("(")
        start = self.i
        depth = 1
        while not self.at_end():
            t = self.peek()
            if t.kind == OP and t.value == "(":
                depth += 1
            elif t.kind == OP and t.value == ")":
                depth -= 1
                if depth == 0:
                    inner = self.span(start)
                    self.advance()
                    return inner
            self.advance()
        raise self.error("unbalanced '('")

    # ---- literals -------------------------------------------------------
    def literal(self) -> Any:
        """SQL literal: string, number (with optional sign), TRUE/FALSE,
        NULL."""
        t = self.peek()
        if t.kind == STRING:
            self.advance()
            return t.value
        neg = False
        if t.kind == OP and t.value in ("-", "+"):
            neg = t.value == "-"
            self.advance()
            t = self.peek()
        if t.kind == NUMBER:
            self.advance()
            raw = t.value.rstrip("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
            v: Any = float(raw) if ("." in raw or "e" in raw.lower()) else int(raw)
            return -v if neg else v
        if t.is_kw("TRUE", "FALSE"):
            self.advance()
            return t.upper() == "TRUE"
        if t.is_kw("NULL"):
            self.advance()
            return None
        raise self.error("expected literal")


def _kw_stop(*words: str) -> Callable[[Token], bool]:
    ws = tuple(w.upper() for w in words)
    return lambda t: t.is_kw(*ws)


def replace_alias_refs(sql: str, mapping: dict[str, str]) -> str:
    """Rewrite ``alias.`` prefixes in an expression at TOKEN level
    (``mapping`` keys compared case-insensitively) — occurrences inside
    string literals survive untouched, which the old regex rewrite
    could not guarantee."""
    low = {k.lower(): v for k, v in mapping.items()}
    toks = tokenize(sql)
    out: list[str] = []
    pos = 0
    for j, t in enumerate(toks):
        if t.kind == EOF:
            break
        out.append(sql[pos : t.start])
        nxt = toks[j + 1]
        prev = toks[j - 1] if j else None
        if (
            t.kind == IDENT
            and t.value.lower() in low
            and nxt.kind == OP
            and nxt.value == "."
            and not (prev is not None and prev.kind == OP and prev.value == ".")
        ):
            out.append(low[t.value.lower()])
        else:
            out.append(sql[t.start : t.end])
        pos = t.end
    out.append(sql[pos:])
    return "".join(out)


# ---------------------------------------------------------------------------


def parse_statement(text: str, catalog: str) -> Optional[A.Statement]:
    """Parse one statement (no trailing ``;``).  ``None`` = not this
    catalog's statement; :class:`ParseError` = ours but malformed."""
    try:
        p = _P(text, catalog)
    except LexError:
        return None  # Spark's parser will produce its own error
    t = p.peek()
    if t.kind != IDENT:
        return None
    head = t.upper()
    fn = _DISPATCH.get(head)
    if fn is None:
        return None
    try:
        return fn(p)
    except _NotOurs:
        return None


# ---- statement parsers ----------------------------------------------------


def _parse_insert(p: _P) -> A.Statement:
    p.expect_kw("INSERT")
    mode_tok = p.expect_kw("INTO", "OVERWRITE")
    p.accept_kw("TABLE")
    ns, tbl = p.catalog_target()
    cols: Optional[list[str]] = None
    if p.at_op("("):
        # column list vs parenthesized source query: look ahead to the
        # matching ')' — a plain ident/comma list followed by a query
        # starter is a column list
        save = p.i
        try:
            inner_start = p.i
            _ = p.paren_span()
            inner_toks = p.toks[inner_start + 1 : p.i - 1]
            is_col_list = bool(inner_toks) and all(
                (tok.kind in (IDENT, QIDENT))
                if k % 2 == 0
                else (tok.kind == OP and tok.value == ",")
                for k, tok in enumerate(inner_toks)
            ) and len(inner_toks) % 2 == 1
            follows_query = p.at_kw(
                "SELECT", "VALUES", "WITH", "TABLE", "FROM"
            ) or p.at_op("(")
            if is_col_list and follows_query:
                cols = [tok.value for tok in inner_toks[::2]]
            else:
                p.i = save  # the parens ARE the source query
        except ParseError:
            p.i = save
    if p.at_end():
        raise p.error("INSERT requires a source query")
    query_sql = p.rest_span()
    return A.Insert(mode_tok.upper(), ns, tbl, cols, query_sql)


def _parse_delete(p: _P) -> A.Statement:
    p.expect_kw("DELETE")
    p.expect_kw("FROM")
    ns, tbl = p.catalog_target()
    where = None
    if p.accept_kw("WHERE"):
        where = p.rest_span()
        if not where:
            raise p.error("empty WHERE predicate")
    else:
        p.expect_end()
    return A.Delete(ns, tbl, where)


def _assignments(p: _P, stop: Callable[[Token], bool]) -> list[tuple[str, str]]:
    """``col = <expr>, ...`` — each expr span runs to the next depth-0
    comma or the caller's stop token, so subqueries / function calls
    with internal commas — and CASE WHEN ... THEN ... END expressions —
    parse whole."""
    out: list[tuple[str, str]] = []
    while True:
        col = p.ident("assignment target column")
        # optional alias prefix `t.col` — keep the LAST segment
        while p.at_op("."):
            p.advance()
            col = p.ident("assignment target column")
        p.expect_op("=")
        expr = p.expr_span_case_aware(
            lambda t: (t.kind == OP and t.value == ",") or stop(t)
        )
        if not expr:
            raise p.error(f"empty SET expression for {col!r}")
        out.append((col, expr))
        if p.accept_op(","):
            continue
        return out


def _parse_update(p: _P) -> A.Statement:
    p.expect_kw("UPDATE")
    ns, tbl = p.catalog_target()
    p.expect_kw("SET")
    assigns = _assignments(p, _kw_stop("WHERE"))
    where = None
    if p.accept_kw("WHERE"):
        where = p.rest_span()
        if not where:
            raise p.error("empty WHERE predicate")
    else:
        p.expect_end()
    return A.Update(ns, tbl, assigns, where)


def _merge_on_keys(
    p: _P, on_sql: str, talias: str, salias: str
) -> list[tuple[str, str]]:
    """The ON condition must be AND-ed equality terms, each equating one
    target-alias column with one source-alias column (the equi-join
    shape ``writer.merge_into`` joins on; the column NAMES may differ —
    ``t.o_orderkey = s.k``).  Returns (target_col, source_col) pairs."""
    q = _P(on_sql, p.catalog)
    keys: list[tuple[str, str]] = []
    while True:
        try:
            a1 = q.ident("alias")
            q.expect_op(".")
            c1 = q.ident("column")
            q.expect_op("=")
            a2 = q.ident("alias")
            q.expect_op(".")
            c2 = q.ident("column")
        except ParseError as e:
            raise ParseError(
                "MERGE ON must be AND-ed single equality terms "
                f"t.k = s.k, got {on_sql!r} ({e})"
            ) from None
        sides = {a1.lower(): c1, a2.lower(): c2}
        if set(sides) != {talias.lower(), salias.lower()}:
            raise ParseError(
                "MERGE ON terms must equate a target-alias column with "
                f"a source-alias column, got {a1}.{c1} = {a2}.{c2}"
            )
        keys.append((sides[talias.lower()], sides[salias.lower()]))
        if q.accept_kw("AND"):
            continue
        q.expect_end()
        return keys


def _parse_merge(p: _P) -> A.Statement:
    p.expect_kw("MERGE")
    p.expect_kw("INTO")
    ns, tbl = p.catalog_target()
    p.accept_kw("AS")
    talias = p.ident("target alias")
    p.expect_kw("USING")
    if p.at_op("("):
        # arbitrary parenthesized query — nested CTEs, set ops, more
        # parens: the balanced-group walk takes it whole
        source_sql = p.paren_span().strip()
        if not source_sql:
            raise p.error("empty MERGE USING source")
    else:
        start = p.i
        p.dotted_name()
        source_sql = f"SELECT * FROM {p.span(start)}"
    p.accept_kw("AS")
    if p.at_kw("ON"):
        raise p.error("MERGE USING source needs an alias")
    salias = p.ident("source alias")
    p.expect_kw("ON")
    on_sql = p.expr_span(_kw_stop("WHEN"))
    if not on_sql:
        raise p.error("empty MERGE ON condition")
    keys = _merge_on_keys(p, on_sql, talias, salias)
    clauses: list[Any] = []
    if not p.at_kw("WHEN"):
        raise p.error("MERGE requires at least one WHEN clause")
    amap = {salias: "src", talias: "t"}
    while p.accept_kw("WHEN"):
        # WHEN [NOT] MATCHED [BY SOURCE|BY TARGET] [AND cond] THEN ...
        if p.accept_kw("NOT"):
            p.expect_kw("MATCHED")
            kind = "not_matched"
            if p.accept_kw("BY"):
                # BY TARGET = explicit spelling of the default;
                # BY SOURCE = target rows with no source match
                if p.accept_kw("SOURCE"):
                    kind = "not_matched_by_source"
                else:
                    p.expect_kw("TARGET")
        else:
            p.expect_kw("MATCHED")
            kind = "matched"
        condition: Optional[str] = None
        if p.accept_kw("AND"):
            condition = p.expr_span_case_aware(_kw_stop("THEN"))
            if not condition:
                raise p.error("empty MERGE clause condition")
            condition = replace_alias_refs(condition, amap)
        p.expect_kw("THEN")
        if kind == "not_matched":
            p.expect_kw("INSERT")
            if p.accept_op("*"):
                clauses.append(A.MergeInsertStar(condition))
                continue
            p.expect_op("(")
            ins_cols = []
            while True:
                ins_cols.append(p.ident("INSERT column"))
                if p.accept_op(","):
                    continue
                p.expect_op(")")
                break
            p.expect_kw("VALUES")
            p.expect_op("(")
            vals = []
            while True:
                v = p.expr_span_case_aware(
                    lambda t: t.kind == OP and t.value in (",", ")")
                )
                if not v:
                    raise p.error("empty INSERT VALUES expression")
                vals.append(replace_alias_refs(v, amap))
                if p.accept_op(","):
                    continue
                p.expect_op(")")
                break
            if len(ins_cols) != len(vals):
                raise p.error(
                    "MERGE INSERT column/value arity mismatch"
                )
            clauses.append(A.MergeInsert(ins_cols, vals, condition))
            continue
        if p.accept_kw("DELETE"):
            clauses.append(A.MergeDelete(condition, kind))
            continue
        p.expect_kw("UPDATE")
        p.expect_kw("SET")
        items = _assignments(p, _kw_stop("WHEN"))
        # writer.merge evaluates SET exprs on the joined frame under
        # fixed aliases t (target) / src (source)
        items = [
            (col, replace_alias_refs(expr, amap)) for col, expr in items
        ]
        clauses.append(A.MergeUpdate(items, condition, kind))
    p.expect_end()
    return A.Merge(ns, tbl, talias, source_sql, salias, keys, clauses)


def _tblproperties(p: _P) -> dict[str, str]:
    p.expect_op("(")
    props: dict[str, str] = {}
    while True:
        t = p.peek()
        if t.kind != STRING:
            raise p.error("TBLPROPERTIES keys are string literals")
        p.advance()
        p.expect_op("=")
        v = p.peek()
        if v.kind != STRING:
            raise p.error("TBLPROPERTIES values are string literals")
        p.advance()
        props[t.value] = v.value
        if p.accept_op(","):
            continue
        p.expect_op(")")
        return props


def _parse_create(p: _P) -> A.Statement:
    p.expect_kw("CREATE")
    if p.at_kw("NAMESPACE") or p.at_kw("SCHEMA"):
        p.advance()
        if_not_exists = False
        if p.accept_kw("IF"):
            p.expect_kw("NOT")
            p.expect_kw("EXISTS")
            if_not_exists = True
        ns = p.namespace_target()
        p.expect_end()
        return A.CreateNamespace(if_not_exists, ns)
    replace = False
    if p.accept_kw("OR"):
        p.expect_kw("REPLACE")
        replace = True
    if p.at_kw("MATERIALIZED"):
        if replace:
            raise p.error(
                "CREATE OR REPLACE MATERIALIZED VIEW is not supported — "
                "DROP it and recreate (the MV is a real Iceberg table)"
            )
        p.advance()
        p.expect_kw("VIEW")
        ns, tbl = p.catalog_target()
        p.expect_kw("AS")
        p.expect_kw("SELECT")
        # incrementally-maintainable aggregate shape (r10, VERDICT r9
        # #4; r11 adds AVG): SELECT g..., {SUM(v) | COUNT(*) | MIN(v) |
        # MAX(v) | AVG(v)}... FROM <cat.ns.t> [WHERE pred] GROUP BY g...
        # — anything else is refused with the shape spelled out (the MV
        # maintains exactly this; MIN/MAX recompute per touched group on
        # retraction; AVG derives from the maintained sum+count)
        sel_cols: list[str] = []
        value_col = None
        aggs: list[str] = []
        aliases: list = []
        while True:
            matched_agg = None
            for kw in ("SUM", "COUNT", "MIN", "MAX", "AVG"):
                if p.accept_kw(kw):
                    matched_agg = kw.lower()
                    break
            if matched_agg is not None:
                p.expect_op("(")
                if matched_agg == "count":
                    p.expect_op("*")
                else:
                    col = p.ident("measure column")
                    if value_col is not None and col != value_col:
                        raise p.error(
                            "MV SUM/MIN/MAX/AVG must share ONE measure "
                            f"column (got {value_col!r} and {col!r})"
                        )
                    value_col = col
                p.expect_op(")")
                # an alias names the STORED MV column (default
                # sum_micros/cnt/min_v/max_v) — accepted-and-dropped
                # would strand the user's follow-up SELECT <alias>
                aliases.append(
                    p.ident("alias") if p.accept_kw("AS") else None
                )
                aggs.append(matched_agg)
            else:
                if aggs:
                    raise p.error(
                        "MV group columns must precede the aggregates"
                    )
                name = p.ident("group column")
                if p.at_op("("):
                    raise p.error(
                        f"MV aggregate {name.upper()} is not incrementally "
                        "maintainable — CREATE MATERIALIZED VIEW supports "
                        "exactly {SUM(c)|COUNT(*)|MIN(c)|MAX(c)|AVG(c)}"
                    )
                sel_cols.append(name)
            if not p.accept_op(","):
                break
        if not aggs:
            raise p.error(
                "CREATE MATERIALIZED VIEW supports exactly "
                "SELECT <group cols...>, "
                "{SUM(c)|COUNT(*)|MIN(c)|MAX(c)|AVG(c)}... "
                "FROM t [WHERE pred] GROUP BY <group cols...>"
            )
        p.expect_kw("FROM")
        sns, stbl = p.catalog_target()
        # join-MV form: FROM <fact> JOIN <dim> ON key = key (bare or
        # qualified keys; the executor resolves which side is which by
        # schema membership).  Maintained fact-delta incrementally with
        # a dim-movement full rebuild (iceberg/mv.py::create_join_mv).
        jns = jtbl = jl = jr = None
        if p.accept_kw("JOIN"):
            jns, jtbl = p.catalog_target()
            p.expect_kw("ON")

            def _key() -> str:
                name = p.ident("join key")
                while p.accept_op("."):
                    name = p.ident("join key")
                return name  # qualifier stripped: last segment is the col

            jl = _key()
            p.expect_op("=")
            jr = _key()
        where = None
        if p.accept_kw("WHERE"):
            if jtbl is not None:
                raise p.error(
                    "join MVs do not support WHERE (filter the fact "
                    "into a staging table, or use a single-table MV)"
                )
            where = p.expr_span(lambda t: t.is_kw("GROUP"))
        p.expect_kw("GROUP")
        p.expect_kw("BY")
        gb: list[str] = [p.ident("group column")]
        while p.accept_op(","):
            gb.append(p.ident("group column"))
        p.expect_end()
        if sorted(sel_cols) != sorted(gb):
            raise p.error(
                f"MV SELECT columns {sel_cols} must equal GROUP BY {gb}"
            )
        if jtbl is not None and (
            set(aggs) - {"sum", "count"} or "sum" not in aggs or any(aliases)
        ):
            raise p.error(
                "join MVs maintain exactly SUM(c) [+ COUNT(*)] under "
                "their default column names (sum_micros/cnt)"
            )
        return A.CreateMaterializedView(
            ns,
            tbl,
            sns,
            stbl,
            gb,
            value_col,
            aggs=tuple(aggs),
            where=where,
            agg_aliases=tuple(aliases),
            join_namespace=jns,
            join_table=jtbl,
            join_left_key=jl,
            join_right_key=jr,
        )
    if p.accept_kw("VIEW"):
        ns, tbl = p.catalog_target()
        p.expect_kw("AS")
        body = p.rest_span()
        if not body:
            raise p.error("empty CREATE VIEW body")
        return A.CreateView(replace, ns, tbl, body)
    p.expect_kw("TABLE")
    if_not_exists = False
    if p.accept_kw("IF"):
        p.expect_kw("NOT")
        p.expect_kw("EXISTS")
        if_not_exists = True
    ns, tbl = p.catalog_target()
    columns_ddl: Optional[str] = None
    partition_by: Optional[list[str]] = None
    properties: Optional[dict[str, str]] = None
    ctas: Optional[str] = None
    if p.at_op("("):
        columns_ddl = p.paren_span().strip()
        if not columns_ddl:
            raise p.error("empty column list")
    while not p.at_end():
        if p.at_kw("PARTITIONED"):
            p.advance()
            p.expect_kw("BY")
            p.expect_op("(")
            partition_by = []
            while True:
                item = p.expr_span(
                    lambda t: t.kind == OP and t.value in (",", ")")
                )
                if not item:
                    raise p.error("empty PARTITIONED BY entry")
                partition_by.append(item)
                if p.accept_op(","):
                    continue
                p.expect_op(")")
                break
            continue
        if p.at_kw("TBLPROPERTIES"):
            p.advance()
            properties = _tblproperties(p)
            continue
        if p.at_kw("USING"):
            # `USING iceberg` — accepted and checked (this catalog only
            # writes Iceberg tables)
            p.advance()
            fmt = p.ident("format name")
            if fmt.lower() != "iceberg":
                raise p.error(f"unsupported USING format {fmt!r}")
            continue
        if p.at_kw("AS"):
            p.advance()
            ctas = p.rest_span()
            if not ctas:
                raise p.error("empty CTAS body")
            break
        raise p.error("unexpected CREATE TABLE clause")
    if columns_ddl is None and ctas is None:
        raise p.error("CREATE TABLE needs a column list or AS SELECT")
    return A.CreateTable(
        replace, if_not_exists, ns, tbl, columns_ddl, partition_by,
        properties, ctas,
    )


def _parse_drop(p: _P) -> A.Statement:
    p.expect_kw("DROP")
    if p.at_kw("NAMESPACE") or p.at_kw("SCHEMA"):
        p.advance()
        if_exists = False
        if p.accept_kw("IF"):
            p.expect_kw("EXISTS")
            if_exists = True
        ns = p.namespace_target()
        p.expect_end()
        return A.DropNamespace(if_exists, ns)
    kind = p.expect_kw("TABLE", "VIEW").upper()
    if_exists = False
    if p.accept_kw("IF"):
        p.expect_kw("EXISTS")
        if_exists = True
    ns, tbl = p.catalog_target()
    p.expect_end()
    return A.Drop(kind, if_exists, ns, tbl)


def _type_ddl(p: _P) -> str:
    """A column type in DDL: ident plus optional parenthesized params
    (``decimal(10,2)``) or angle-bracket-free nested spellings — taken
    as a span up to the clause boundary."""
    start = p.i
    p.ident("type name")
    if p.at_op("("):
        p.paren_span()
    # array<int>, map<string,int>, struct<...>: consume the <...> group
    if p.at_op("<"):
        depth = 0
        while not p.at_end():
            t = p.peek()
            if t.kind == OP and t.value == "<":
                depth += 1
            elif t.kind == OP and t.value == ">":
                depth -= 1
                if depth == 0:
                    p.advance()
                    break
            p.advance()
    return p.span(start)


def _partition_entry(p: _P) -> str:
    """Partition transform: ``col`` | ``day(col)`` | ``bucket(8, col)``
    | ``truncate(4, col)`` — rendered in the canonical string form
    ``transforms.parse_spec_entry`` accepts."""
    name = p.ident("partition transform or column")
    if not p.accept_op("("):
        return name
    args = []
    while True:
        t = p.peek()
        if t.kind in (IDENT, QIDENT, NUMBER):
            args.append(t.value)
            p.advance()
        else:
            raise p.error("partition transform arguments are columns/ints")
        if p.accept_op(","):
            continue
        p.expect_op(")")
        break
    return f"{name}({', '.join(args)})"


def _parse_alter(p: _P) -> A.Statement:
    p.expect_kw("ALTER")
    if p.at_kw("NAMESPACE") or p.at_kw("SCHEMA"):
        p.advance()
        ns = p.namespace_target()
        if p.accept_kw("SET"):
            p.expect_kw("PROPERTIES", "TBLPROPERTIES", "DBPROPERTIES")
            updates = _tblproperties(p)
            p.expect_end()
            return A.AlterNamespace(ns, updates, [])
        p.expect_kw("UNSET")
        p.expect_kw("PROPERTIES", "TBLPROPERTIES", "DBPROPERTIES")
        p.expect_op("(")
        removals = []
        while True:
            t = p.peek()
            if t.kind != STRING:
                raise p.error("UNSET PROPERTIES keys are string literals")
            p.advance()
            removals.append(t.value)
            if p.accept_op(","):
                continue
            p.expect_op(")")
            break
        p.expect_end()
        return A.AlterNamespace(ns, {}, removals)
    p.expect_kw("TABLE")
    ns, tbl = p.catalog_target()
    if p.accept_kw("CREATE") or (
        p.at_kw("REPLACE") and p.peek(1).is_kw("TAG", "BRANCH")
    ):
        replace = p.accept_kw("REPLACE")
        rt = "tag" if p.accept_kw("TAG") else (
            "branch" if p.accept_kw("BRANCH") else None
        )
        if rt is None:
            raise ParseError("expected TAG or BRANCH")
        if_not_exists = False
        if not replace and p.accept_kw("IF"):
            p.expect_kw("NOT")
            p.expect_kw("EXISTS")
            if_not_exists = True
        name = p.ident("ref name")
        sid = None
        if p.accept_kw("AS"):
            p.expect_kw("OF")
            p.expect_kw("VERSION")
            sid = int(p.literal())
        p.expect_end()
        return A.Alter(
            ns, tbl,
            A.RefDdl("replace" if replace else "create", rt, name,
                     snapshot_id=sid, if_not_exists=if_not_exists),
        )
    if p.accept_kw("ADD"):
        if p.accept_kw("PARTITION"):
            p.expect_kw("FIELD")
            entry = _partition_entry(p)
            p.expect_end()
            return A.Alter(ns, tbl, A.AddPartitionField(entry))
        if p.accept_kw("CONSTRAINT"):
            cname = p.ident("constraint name")
            p.expect_kw("CHECK")
            expr = p.paren_span().strip()
            if not expr:
                raise p.error("empty CHECK expression")
            p.expect_end()
            return A.Alter(ns, tbl, A.AddConstraint(cname, expr))
        p.expect_kw("COLUMN", "COLUMNS")
        wrapped = p.accept_op("(")
        col = p.ident("column name")
        while p.accept_op("."):  # nested struct field: ADD COLUMN s.z BIGINT
            col += "." + p.ident("nested field name")
        type_ddl = _type_ddl(p)
        default: Any = None
        if p.accept_kw("DEFAULT"):
            default = p.literal()
        if wrapped:
            p.expect_op(")")
        p.expect_end()
        return A.Alter(ns, tbl, A.AddColumn(col, type_ddl, default))
    if p.accept_kw("RENAME"):
        if p.accept_kw("TO"):
            # ALTER TABLE a RENAME TO [cat.][ns.]b — bare name keeps the
            # source namespace; a leading segment equal to the catalog
            # name is stripped
            segs = [p.ident("table name")]
            while p.accept_op("."):
                segs.append(p.ident("table name"))
            p.expect_end()
            if len(segs) > 1 and segs[0].lower() == p.catalog.lower():
                segs = segs[1:]
            if len(segs) == 1:
                new_ns, new_tbl = ns, segs[0]
            else:
                new_ns, new_tbl = ".".join(segs[:-1]), segs[-1]
            return A.Alter(ns, tbl, A.RenameTable(new_ns, new_tbl))
        p.expect_kw("COLUMN")
        old = p.ident("column name")
        p.expect_kw("TO")
        new = p.ident("column name")
        p.expect_end()
        return A.Alter(ns, tbl, A.RenameColumn(old, new))
    if p.accept_kw("DROP"):
        if p.accept_kw("TAG") or p.at_kw("BRANCH"):
            rt = "branch" if p.accept_kw("BRANCH") else "tag"
            if_exists = False
            if p.accept_kw("IF"):
                p.expect_kw("EXISTS")
                if_exists = True
            name = p.ident("ref name")
            p.expect_end()
            return A.Alter(
                ns, tbl,
                A.RefDdl("drop", rt, name, if_exists=if_exists),
            )
        if p.accept_kw("PARTITION"):
            p.expect_kw("FIELD")
            entry = _partition_entry(p)
            p.expect_end()
            return A.Alter(ns, tbl, A.DropPartitionField(entry))
        if p.accept_kw("CONSTRAINT"):
            cname = p.ident("constraint name")
            p.expect_end()
            return A.Alter(ns, tbl, A.DropConstraint(cname))
        p.expect_kw("COLUMN")
        col = p.ident("column name")
        p.expect_end()
        return A.Alter(ns, tbl, A.DropColumn(col))
    if p.accept_kw("ALTER"):
        p.expect_kw("COLUMN")
        col = p.ident("column name")
        p.expect_kw("TYPE")
        type_ddl = _type_ddl(p)
        p.expect_end()
        return A.Alter(ns, tbl, A.AlterColumnType(col, type_ddl))
    if p.accept_kw("REPLACE"):
        # Spark-Iceberg: ALTER TABLE t REPLACE PARTITION FIELD a WITH b
        p.expect_kw("PARTITION")
        p.expect_kw("FIELD")
        old = _partition_entry(p)
        p.expect_kw("WITH")
        new = _partition_entry(p)
        p.expect_end()
        return A.Alter(ns, tbl, A.ReplacePartitionField(old, new))
    if p.accept_kw("WRITE"):
        # Spark-Iceberg: ALTER TABLE t WRITE ORDERED BY c [, ...],
        # ALTER TABLE t WRITE UNORDERED, and
        # ALTER TABLE t WRITE DISTRIBUTED BY PARTITION
        if p.accept_kw("DISTRIBUTED"):
            p.expect_kw("BY")
            p.expect_kw("PARTITION")
            p.expect_end()
            return A.Alter(ns, tbl, A.SetDistributionMode("hash"))
        if p.accept_kw("UNORDERED"):
            p.expect_end()
            return A.Alter(ns, tbl, A.SetSortOrder([]))
        p.expect_kw("ORDERED")
        p.expect_kw("BY")
        cols = [p.ident("column name")]
        while p.accept_op(","):
            cols.append(p.ident("column name"))
        p.expect_end()
        return A.Alter(ns, tbl, A.SetSortOrder(cols))
    if p.accept_kw("SET"):
        if p.accept_kw("IDENTIFIER"):
            # Spark-Iceberg: ALTER TABLE t SET IDENTIFIER FIELDS k [, ...]
            p.expect_kw("FIELDS")
            cols = [p.ident("column name")]
            while p.accept_op(","):
                cols.append(p.ident("column name"))
            p.expect_end()
            return A.Alter(ns, tbl, A.SetIdentifierFields(cols))
        p.expect_kw("TBLPROPERTIES")
        props = _tblproperties(p)
        p.expect_end()
        return A.Alter(ns, tbl, A.SetProperties(props))
    if p.accept_kw("UNSET"):
        p.expect_kw("TBLPROPERTIES")
        p.expect_op("(")
        keys = []
        while True:
            t = p.peek()
            if t.kind != STRING:
                raise p.error("UNSET TBLPROPERTIES keys are string literals")
            p.advance()
            keys.append(t.value)
            if p.accept_op(","):
                continue
            p.expect_op(")")
            break
        p.expect_end()
        return A.Alter(ns, tbl, A.UnsetProperties(keys))
    raise p.error("unsupported ALTER TABLE action")


def _parse_truncate(p: _P) -> A.Statement:
    p.expect_kw("TRUNCATE")
    p.expect_kw("TABLE")
    ns, tbl = p.catalog_target()
    p.expect_end()
    return A.Truncate(ns, tbl)


def _parse_refresh(p: _P) -> A.Statement:
    p.expect_kw("REFRESH")
    p.expect_kw("TABLE")
    ns, tbl = p.catalog_target()
    p.expect_end()
    return A.Refresh(ns, tbl)


def _parse_analyze(p: _P) -> A.Statement:
    p.expect_kw("ANALYZE")
    p.expect_kw("TABLE")
    ns, tbl = p.catalog_target()
    if p.accept_kw("COMPUTE"):
        p.expect_kw("STATISTICS")
    p.expect_end()
    return A.Analyze(ns, tbl)


def _parse_call(p: _P) -> A.Statement:
    p.expect_kw("CALL")
    t = p.peek()
    if t.kind not in (IDENT, QIDENT) or t.value.lower() != p.catalog.lower():
        raise _NotOurs()
    p.advance()
    p.expect_op(".")
    if p.ident("'system'").lower() != "system":
        raise _NotOurs()
    p.expect_op(".")
    proc = p.ident("procedure name").lower()
    p.expect_op("(")
    args: list[Any] = []
    kwargs: dict[str, Any] = {}
    if not p.at_op(")"):
        while True:
            t = p.peek()
            if t.kind == IDENT and p.peek(1).kind == OP and p.peek(1).value == "=>":
                p.advance()
                p.advance()
                kwargs[t.value] = p.literal()
            else:
                if kwargs:
                    raise p.error("positional CALL argument after named")
                args.append(p.literal())
            if p.accept_op(","):
                continue
            break
    p.expect_op(")")
    p.expect_end()
    return A.Call(proc, args, kwargs)


def _parse_show(p: _P) -> A.Statement:
    p.expect_kw("SHOW")
    if p.accept_kw("NAMESPACES"):
        p.expect_kw("IN")
        t = p.peek()
        if t.kind not in (IDENT, QIDENT) or t.value.lower() != p.catalog.lower():
            raise _NotOurs()
        p.advance()
        p.expect_end()
        return A.ShowNamespaces()
    if p.accept_kw("TABLES"):
        p.expect_kw("IN")
        t = p.peek()
        if t.kind not in (IDENT, QIDENT) or t.value.lower() != p.catalog.lower():
            raise _NotOurs()
        p.advance()
        ns = None
        if p.accept_op("."):
            ns = p.ident("namespace")
        p.expect_end()
        return A.ShowTables(ns)
    if p.accept_kw("VIEWS"):
        p.expect_kw("IN")
        t = p.peek()
        if t.kind not in (IDENT, QIDENT) or t.value.lower() != p.catalog.lower():
            raise _NotOurs()
        p.advance()
        ns = None
        if p.accept_op("."):
            ns = p.ident("namespace")
        p.expect_end()
        return A.ShowViews(ns)
    if p.accept_kw("PARTITIONS"):
        ns, tbl = p.catalog_target()
        p.expect_end()
        return A.ShowPartitions(ns, tbl)
    if p.accept_kw("TBLPROPERTIES"):
        ns, tbl = p.catalog_target()
        p.expect_end()
        return A.ShowTblProperties(ns, tbl)
    if p.accept_kw("CREATE"):
        p.expect_kw("TABLE")
        ns, tbl = p.catalog_target()
        p.expect_end()
        return A.ShowCreateTable(ns, tbl)
    raise _NotOurs()  # other SHOW verbs belong to Spark


def _parse_describe(p: _P) -> A.Statement:
    p.expect_kw("DESCRIBE", "DESC")
    if p.at_kw("NAMESPACE") or p.at_kw("SCHEMA"):
        p.advance()
        p.accept_kw("EXTENDED")
        ns = p.namespace_target()
        p.expect_end()
        return A.DescribeNamespace(ns)
    p.accept_kw("TABLE")
    ns, tbl = p.catalog_target()
    p.expect_end()
    return A.Describe(ns, tbl)


def _parse_begin(p: _P) -> A.Statement:
    p.expect_kw("BEGIN")
    p.accept_kw("TRANSACTION")
    p.expect_end()
    return A.BeginTransaction()


def _parse_commit(p: _P) -> A.Statement:
    p.expect_kw("COMMIT")
    p.expect_end()
    return A.CommitTransaction()


def _parse_rollback(p: _P) -> A.Statement:
    p.expect_kw("ROLLBACK")
    p.expect_end()
    return A.RollbackTransaction()


_DISPATCH: dict[str, Callable[[_P], A.Statement]] = {
    "INSERT": _parse_insert,
    "DELETE": _parse_delete,
    "UPDATE": _parse_update,
    "MERGE": _parse_merge,
    "CREATE": _parse_create,
    "DROP": _parse_drop,
    "ALTER": _parse_alter,
    "TRUNCATE": _parse_truncate,
    "REFRESH": _parse_refresh,
    "ANALYZE": _parse_analyze,
    "CALL": _parse_call,
    "SHOW": _parse_show,
    "DESCRIBE": _parse_describe,
    "DESC": _parse_describe,
    "BEGIN": _parse_begin,
    "COMMIT": _parse_commit,
    "ROLLBACK": _parse_rollback,
}
