"""SQL-surface SPJ routing: the SAME SQL text that plans a shuffling
join or aggregation today runs shuffle-free when the storage contract
allows, with SILENT fallback to the plain plan on any refusal.

The reference's whole point is that the catalog surface IS the query
surface (``datafusion_iceberg/src/catalog.rs:114-117`` — a user writes
``SELECT ... FROM my_catalog.ns.a JOIN my_catalog.ns.b ON a.k = b.k``
and DataFusion plans over the partition-grouped scan units of
``table.rs:128-131`` without any API call).  Spark-Iceberg users get the
same transparency from Catalyst's KeyGroupedPartitioning (SPARK-37375).
Until round 14 this repo's zero-Exchange plans required calling
``spj.bucket_join``/``bucket_agg`` by hand; this module closes that gap
for ``Catalog.sql()``:

* an equi-JOIN of two attached Iceberg tables whose default specs are
  SPJ-compatible routes through :func:`spj.bucket_join`, and the REST of
  the statement (SELECT list, WHERE, GROUP BY, HAVING, ORDER BY, LIMIT)
  executes VERBATIM over the joined frame — registered as a temp view
  aliased with the left table's alias, right-alias qualifiers rewritten
  to it token-by-token;
* a single-table GROUP BY whose keys include a partition-backed column
  routes through :func:`spj.bucket_apply` with the statement's
  SELECT/WHERE/GROUP BY/HAVING executed PER BRANCH (each branch is a
  complete set of whole partition groups read as one Spark partition,
  so the per-branch SQL is globally exact and plans partial+final
  HashAggregate with zero Exchange), ORDER BY/LIMIT lifted above the
  union.

Safety model — the router must never be WRONG, only absent:

* the statement is recognized with the repo's span-preserving lexer
  (``sql/lexer.py``), never regex over raw text, so literals/comments
  cannot be mistaken for structure;
* the grammar is a conservative allow-list: any depth-0 set operator,
  outer/cross/natural/semi/anti join, USING clause, WITH,
  LATERAL, TABLESAMPLE, PIVOT, OFFSET, window clause, subquery
  (a SELECT anywhere past token 0), window function (OVER anywhere),
  statement-scoped/nondeterministic functions (CURRENT_TIMESTAMP, RAND,
  UUID, ... — per-branch re-execution would compute them more than
  once), or metadata-table suffix fails recognition and falls back;
  ``SELECT DISTINCT`` routes per branch when its column set covers the
  partition-backed/join key and falls back otherwise; ``FOR
  [SYSTEM_]VERSION/TIMESTAMP AS OF`` pins resolve to snapshot ids and
  route through the snapshot-parameterized SPJ readers (same grammar
  position as the plain path: after the dotted name, before the alias)
  UNLESS the snapshot was written under a different schema id — the
  router's audits resolve against the current schema, so
  schema-evolved history takes the plain path;
* both join tables must carry EXPLICIT aliases (without one, qualified
  references in the plain path resolve against the flat view name, and
  accepting them here would widen the accepted dialect);
* a non-key column name shared by both sides falls back (the joined
  view could not hold both);
* any exception while routing falls back silently — the plain path
  re-executes the statement and surfaces ITS error, so error behavior
  is identical to the un-routed surface.

The routed plan is byte-identical to the plain one by construction
(bucket_join/bucket_apply correctness contracts, tests/test_spj.py) and
asserted per statement in tests/test_spj_sql.py.
"""

from __future__ import annotations

import itertools

from collections import Counter
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.sql.lexer import (
    IDENT,
    NUMBER,
    OP,
    QIDENT,
    STRING,
    Token,
    tokenize,
)

# depth-0 keywords outside the recognized dialect: set ops, CTEs, other
# join flavors, sampling, windows, pagination.  FOR is NOT here: the
# FROM parser consumes legal `FOR [SYSTEM_]VERSION/TIMESTAMP AS OF`
# time-travel suffixes (routed via snapshot-parameterized SPJ) and any
# other FOR placement fails a route parse or errors identically to the
# plain path through the verbatim splice.
_REFUSE_DEPTH0 = {
    "UNION",
    "INTERSECT",
    "EXCEPT",
    "MINUS",
    "WITH",
    "LATERAL",
    "SORT",
    "CLUSTER",
    "DISTRIBUTE",
    "WINDOW",
    "OFFSET",
    "QUALIFY",
    "USING",
    "NATURAL",
    "CROSS",
    "LEFT",
    "RIGHT",
    "FULL",
    "SEMI",
    "ANTI",
    "TABLESAMPLE",
    "PIVOT",
    "UNPIVOT",
    "VALUES",
}

_CLAUSES = ("SELECT", "FROM", "WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT")

# statement-scoped or nondeterministic functions: the routed agg paths
# re-execute the statement once PER BRANCH, so a value the plain path
# computes once per statement would diverge across branches — refuse at
# recognition (any depth; matching a user column of the same name only
# narrows the router, never widens it)
_REFUSE_NONDETERMINISTIC = {
    "CURRENT_TIMESTAMP",
    "CURRENT_DATE",
    "CURRENT_TIME",
    "CURRENT_TIMEZONE",
    "LOCALTIMESTAMP",
    "NOW",
    "RAND",
    "RANDN",
    "RANDOM",
    "UUID",
    "SHUFFLE",
    "MONOTONICALLY_INCREASING_ID",
    "SPARK_PARTITION_ID",
    "INPUT_FILE_NAME",
    "INPUT_FILE_BLOCK_START",
    "INPUT_FILE_BLOCK_LENGTH",
}

_view_counter = itertools.count()


def _quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


class _NoRoute(Exception):
    """Internal: statement is outside the recognized dialect."""


def _clause_ranges(toks: list[Token]) -> dict[str, tuple[int, int]]:
    """Split the token stream at depth-0 clause keywords.  Returns
    ``{clause: (first_body_token, one_past_last)}`` — body EXCLUDES the
    clause keyword itself (both tokens for two-word clauses).  Raises
    :class:`_NoRoute` on anything outside the dialect."""
    if not toks or not toks[0].is_kw("SELECT"):
        raise _NoRoute
    if len(toks) > 1 and toks[1].is_kw("ALL"):
        raise _NoRoute
    # SELECT DISTINCT is recognized (routed by _route_distinct /
    # _join_branch_distinct when the distinct set covers the key; the
    # join SPLICE path also handles it verbatim) — body starts after it
    sel_body = 2 if len(toks) > 1 and toks[1].is_kw("DISTINCT") else 1
    marks: list[tuple[str, int, int]] = [("SELECT", 0, sel_body)]
    depth = 0
    for i in range(sel_body, len(toks)):
        t = toks[i]
        if t.kind == OP:
            if t.value == "(":
                depth += 1
            elif t.value == ")":
                depth -= 1
                if depth < 0:
                    raise _NoRoute
            elif t.value == ";":
                raise _NoRoute
            continue
        if t.kind != IDENT:
            continue
        u = t.upper()
        if u in ("SELECT", "OVER"):
            # subquery / window function anywhere (any depth)
            raise _NoRoute
        if u in _REFUSE_NONDETERMINISTIC:
            raise _NoRoute
        if depth:
            continue
        if u in _REFUSE_DEPTH0:
            raise _NoRoute
        if u == "FROM":
            marks.append(("FROM", i, i + 1))
        elif u == "WHERE":
            marks.append(("WHERE", i, i + 1))
        elif u == "GROUP":
            if not toks[i + 1].is_kw("BY"):
                raise _NoRoute
            marks.append(("GROUP BY", i, i + 2))
        elif u == "HAVING":
            marks.append(("HAVING", i, i + 1))
        elif u == "ORDER":
            if not toks[i + 1].is_kw("BY"):
                raise _NoRoute
            marks.append(("ORDER BY", i, i + 2))
        elif u == "LIMIT":
            marks.append(("LIMIT", i, i + 1))
    if depth:
        raise _NoRoute
    names = [m[0] for m in marks]
    if len(set(names)) != len(names) or "FROM" not in names:
        raise _NoRoute
    if names != [c for c in _CLAUSES if c in names]:
        raise _NoRoute  # clauses out of canonical order
    end = len(toks) - 1  # EOF token index
    out: dict[str, tuple[int, int]] = {}
    for j, (name, _kw_at, body) in enumerate(marks):
        stop = marks[j + 1][1] if j + 1 < len(marks) else end
        if body >= stop:
            raise _NoRoute  # empty clause body
        out[name] = (body, stop)
    return out


def _name_tok(t: Token) -> Optional[str]:
    return t.value if t.kind in (IDENT, QIDENT) else None


def _is_dot(t: Token) -> bool:
    return t.kind == OP and t.value == "."


def _parse_table(
    toks: list[Token], i: int, stop: int, catalog
) -> tuple[str, Optional[str], int, Optional[tuple[str, Token]]]:
    """Parse ``<catalog>.<ns>.<table> [AS] alias [FOR [SYSTEM_]VERSION|
    TIMESTAMP AS OF <literal>]`` at ``toks[i:stop]``.  Returns
    (relation key, alias or None, next index, time-travel spec or None
    as ``(kind, literal token)`` with kind VERSION|TIMESTAMP)."""
    if i + 4 >= stop:
        raise _NoRoute
    cat = _name_tok(toks[i])
    if cat is None or cat.lower() != catalog.name.lower():
        raise _NoRoute
    if not (_is_dot(toks[i + 1]) and _is_dot(toks[i + 3])):
        raise _NoRoute
    ns = _name_tok(toks[i + 2])
    bare = _name_tok(toks[i + 4])
    if ns is None or bare is None:
        raise _NoRoute
    want = f"{ns}.{bare}".lower()
    key = next(
        (k for k in catalog._relation_keys() if k.lower() == want), None
    )
    if key is None:
        raise _NoRoute
    i += 5
    # time travel comes BEFORE the alias, matching the plain grammar
    # (`_rewrite_time_travel` matches `<name> FOR ...` immediately after
    # the dotted name — an alias in between is a plain-path parse error)
    tt: Optional[tuple[str, Token]] = None
    if i < stop and toks[i].is_kw("FOR"):
        j = i + 1
        if j < stop and toks[j].is_kw(
            "VERSION", "TIMESTAMP", "SYSTEM_VERSION", "SYSTEM_TIMESTAMP"
        ):
            kind = toks[j].upper().replace("SYSTEM_", "")
            j += 1
        else:
            raise _NoRoute
        if not (
            j + 1 < stop and toks[j].is_kw("AS") and toks[j + 1].is_kw("OF")
        ):
            raise _NoRoute
        j += 2
        if j >= stop or toks[j].kind not in (NUMBER, STRING):
            raise _NoRoute
        tt = (kind, toks[j])
        i = j + 1
    alias: Optional[str] = None
    if i < stop and toks[i].is_kw("AS"):
        if i + 1 < stop and toks[i + 1].kind in (IDENT, QIDENT):
            alias = toks[i + 1].value
            i += 2
        else:
            raise _NoRoute
    elif i < stop and (
        toks[i].kind == QIDENT
        or (
            toks[i].kind == IDENT
            and not toks[i].is_kw("JOIN", "INNER", "ON", "FOR")
        )
    ):
        alias = toks[i].value
        i += 1
    return key, alias, i, tt


def _resolve_time_travel(table, tt: Optional[tuple[str, Token]]):
    """Snapshot id for a parsed time-travel spec (None = current).
    Mirrors ``Catalog._rewrite_time_travel``'s resolution exactly:
    VERSION takes a snapshot id or a quoted branch/tag ref; TIMESTAMP
    takes epoch millis or an ISO timestamp (naive = UTC).  Resolution
    errors propagate — ``try_spj_sql`` falls back and the plain path
    surfaces ITS error for the same bad spec."""
    if tt is None:
        return None
    kind, tok = tt
    if kind == "VERSION":
        if tok.kind == NUMBER:
            if not tok.value.isdigit():
                raise _NoRoute
            sid = int(tok.value)
        else:
            sid = table.metadata.resolve_ref(tok.value)
        snap = table.metadata.snapshot(snapshot_id=sid)  # existence check
    else:
        if tok.kind == NUMBER:
            if not tok.value.isdigit():
                raise _NoRoute
            ts_ms = int(tok.value)
        else:
            from datetime import datetime, timezone

            d = datetime.fromisoformat(tok.value)
            if d.tzinfo is None:
                d = d.replace(tzinfo=timezone.utc)
            ts_ms = int(d.timestamp() * 1000)
        snap = table.metadata.snapshot(as_of_timestamp_ms=ts_ms)
        if snap is None:
            raise _NoRoute  # pre-history timestamp: plain path decides
    # schema-evolution fence: the router's column audits resolve against
    # the CURRENT schema; a snapshot written under a different schema id
    # must take the plain path (which reads the snapshot's own schema)
    cur = table.metadata.current_schema.get("schema-id", 0)
    if snap.schema_id is not None and snap.schema_id != cur:
        raise _NoRoute
    return snap.snapshot_id


def _resolve_cols(table, cols: Sequence[str]) -> list[str]:
    """Case-insensitive resolution of referenced column names to the
    table's actual field names; raises _NoRoute on a miss."""
    actual = {f.name.lower(): f.name for f in table.metadata.struct_type().fields}
    out = []
    for c in cols:
        r = actual.get(c.lower())
        if r is None:
            raise _NoRoute
        out.append(r)
    return out


def _qualifier_positions(
    toks: list[Token], ranges, skip: tuple[int, int]
) -> list[int]:
    """Indices k (outside ``skip``) where ``toks[k]`` is a name token
    qualifying a reference (``name . member``)."""
    out = []
    for k in range(len(toks) - 2):
        if skip[0] <= k < skip[1]:
            continue
        if (
            toks[k].kind in (IDENT, QIDENT)
            and _is_dot(toks[k + 1])
            # not itself the member of an outer qualification (x.y.z)
            and not (k >= 1 and _is_dot(toks[k - 1]))
        ):
            out.append(k)
    return out


def _route_join(
    catalog, spark: SparkSession, query: str, toks: list[Token], ranges
) -> Optional[DataFrame]:
    """FROM <t1> AS a JOIN <t2> AS b ON a.k = b.k [AND ...] [JOIN <t3>
    AS c ON ...]* — route through bucket_join (two sides, composite
    keys allowed) or bucket_join_chain (three+, single-column keys),
    register the result as a temp view aliased by the FIRST table's
    alias, rewrite the other aliases' qualifiers to it, execute the
    otherwise-verbatim statement over it."""
    from datafusion_iceberg_spark.iceberg.spj import (
        bucket_join,
        bucket_join_chain,
        compatible_partitioning,
    )
    from datafusion_iceberg_spark.iceberg.table import IcebergTable

    lo, hi = ranges["FROM"]
    key0, alias0, i, tt0 = _parse_table(toks, lo, hi, catalog)
    sides: list[tuple[str, Optional[str]]] = [(key0, alias0)]
    tts: list[Optional[tuple[str, Token]]] = [tt0]
    ons: list[list[tuple[tuple[str, str], tuple[str, str]]]] = []
    while i < hi:
        if toks[i].is_kw("INNER"):
            i += 1
        if not (i < hi and toks[i].is_kw("JOIN")):
            raise _NoRoute
        skey, salias, i, stt = _parse_table(toks, i + 1, hi, catalog)
        tts.append(stt)
        if not (i < hi and toks[i].is_kw("ON")):
            raise _NoRoute
        i += 1
        pairs: list[tuple[tuple[str, str], tuple[str, str]]] = []
        while i < hi:
            refs = []
            for _ in range(2):
                q = _name_tok(toks[i]) if i < hi else None
                if (
                    q is None
                    or i + 2 >= hi + 1
                    or not _is_dot(toks[i + 1])
                    or _name_tok(toks[i + 2]) is None
                ):
                    raise _NoRoute
                refs.append((q, toks[i + 2].value))
                i += 3
                if len(refs) == 1:
                    if not (
                        i < hi
                        and toks[i].kind == OP
                        and toks[i].value == "="
                    ):
                        raise _NoRoute
                    i += 1
            pairs.append((refs[0], refs[1]))
            if i < hi and toks[i].is_kw("AND"):
                i += 1
                continue
            break
        if not pairs:
            raise _NoRoute
        sides.append((skey, salias))
        ons.append(pairs)
    if not ons:
        raise _NoRoute
    # explicit, pairwise-distinct aliases only: without one the plain
    # path resolves qualifiers against flat view names, and accepting
    # bare-table qualifiers here would WIDEN the dialect
    aliases = [a for _, a in sides]
    if any(a is None for a in aliases) or len(
        {a.lower() for a in aliases}
    ) != len(aliases):
        raise _NoRoute
    tables = [catalog._rel(k) for k, _ in sides]
    if not all(isinstance(t, IcebergTable) for t in tables):
        raise _NoRoute
    alias_idx = {a.lower(): j for j, (_, a) in enumerate(sides)}
    n = len(sides)

    if n == 2:
        la, ra = aliases
        lcols: list[str] = []
        rcols: list[str] = []
        for (q1, c1), (q2, c2) in ons[0]:
            side = {la.lower(): "l", ra.lower(): "r"}
            tagged = {side.get(q1.lower()): c1}
            tagged[side.get(q2.lower())] = c2
            if set(tagged) != {"l", "r"}:
                raise _NoRoute
            lcols.append(tagged["l"])
            rcols.append(tagged["r"])
        left, right = tables
        lcols = _resolve_cols(left, lcols)
        rcols = _resolve_cols(right, rcols)
        if len(set(lcols)) != len(lcols) or len(set(rcols)) != len(rcols):
            raise _NoRoute
        try:
            compatible_partitioning(left, right, lcols, rcols)
        except Exception:
            raise _NoRoute from None
        same_name = lcols == rcols
        lnames = {f.name.lower() for f in left.metadata.struct_type().fields}
        rnames = {f.name.lower() for f in right.metadata.struct_type().fields}
        joined_keys = {c.lower() for c in lcols} if same_name else set()
        if (lnames & rnames) - joined_keys:
            raise _NoRoute  # shared non-key column: view cannot hold both
        star_ok = not same_name
        s0 = _resolve_time_travel(left, tts[0])
        s1 = _resolve_time_travel(right, tts[1])
        builder = lambda: bucket_join(  # noqa: E731
            spark,
            left,
            right,
            lcols,
            rcols,
            how="inner",
            left_snapshot_id=s0,
            right_snapshot_id=s1,
        )
        key_alternatives = [
            {lc.lower(), rc.lower()} for lc, rc in zip(lcols, rcols)
        ]
        make_branch_join = lambda fn: bucket_join(  # noqa: E731
            spark,
            left,
            right,
            lcols,
            rcols,
            how="inner",
            left_snapshot_id=s0,
            right_snapshot_id=s1,
            branch_fn=fn,
        )
    else:
        # N-way chain: each ON is ONE single-column equality pairing the
        # NEW side against one PREVIOUS side's established key column
        keys: list[Optional[str]] = [None] * n
        for j, pairs in enumerate(ons, start=1):
            if len(pairs) != 1:
                raise _NoRoute
            (q1, c1), (q2, c2) = pairs[0]
            i1, i2 = alias_idx.get(q1.lower()), alias_idx.get(q2.lower())
            if i1 is None or i2 is None:
                raise _NoRoute
            if i1 == j and i2 < j:
                new_col, prev_i, prev_col = c1, i2, c2
            elif i2 == j and i1 < j:
                new_col, prev_i, prev_col = c2, i1, c1
            else:
                raise _NoRoute
            if keys[prev_i] is None:
                keys[prev_i] = prev_col
            elif keys[prev_i].lower() != prev_col.lower():
                raise _NoRoute  # references a different column of that side
            keys[j] = new_col
        if any(k is None for k in keys):
            raise _NoRoute
        keys = [
            _resolve_cols(t, [k])[0] for t, k in zip(tables, keys)
        ]
        star_ok = False
        snap_ids = [
            _resolve_time_travel(t, tt) for t, tt in zip(tables, tts)
        ]
        builder = lambda: bucket_join_chain(  # noqa: E731
            spark, tables, keys, snapshot_ids=snap_ids
        )
        key_alternatives = [{k.lower() for k in keys}]
        make_branch_join = lambda fn: bucket_join_chain(  # noqa: E731
            spark, tables, keys, snapshot_ids=snap_ids, branch_fn=fn
        )

    # qualifier audit outside the FROM clause: every `x.y` must qualify
    # by one of the join aliases AND name a column of THAT side's table
    # (the rewritten view would happily resolve `b.c` for a left-side c
    # the plain path rejects — the router must be absent, never wider);
    # `alias.*` never routes
    allowed = set(alias_idx)
    side_fields = [
        {f.name.lower() for f in t.metadata.struct_type().fields}
        for t in tables
    ]
    rewrite_positions: list[int] = []
    for k in _qualifier_positions(toks, ranges, skip=(lo - 1, hi)):
        q = toks[k].value.lower()
        if q not in allowed:
            raise _NoRoute
        nxt = toks[k + 2]
        if nxt.kind == OP and nxt.value == "*":
            raise _NoRoute
        member = _name_tok(nxt)
        if member is None or member.lower() not in side_fields[alias_idx[q]]:
            raise _NoRoute
        if q != alias0.lower():
            rewrite_positions.append(k)
    # bare-reference audit: a name-deduplicated join key has ONE column
    # in the routed view but TWO in the plain scope, so a bare reference
    # the view resolves is AMBIGUOUS_REFERENCE in plain SQL — refuse
    # every un-qualified occurrence of a deduped key name outside FROM
    # (ORDER BY included: plain only disambiguates there when the select
    # list exports the name, which this audit doesn't try to prove)
    if n == 2:
        amb = {c.lower() for c in lcols} if same_name else set()
    else:
        cnt = Counter(k.lower() for k in keys)
        amb = {k_ for k_, c in cnt.items() if c > 1}
    if amb:
        for cname, (a, b) in ranges.items():
            if cname == "FROM":
                continue
            for k in range(a, b):
                t = toks[k]
                if (
                    t.kind in (IDENT, QIDENT)
                    and t.value.lower() in amb
                    and not (k > 0 and _is_dot(toks[k - 1]))
                ):
                    raise _NoRoute
    if not star_ok:
        # bare projection star: the view deduplicates same-name keys but
        # plain SQL keeps every side's copy — refuse; a 2-way join with
        # distinct key names is exactly left-then-right, same as plain *
        sel_lo, sel_hi = ranges["SELECT"]
        depth = 0
        for k in range(sel_lo, sel_hi):
            t = toks[k]
            if t.kind == OP and t.value == "(":
                depth += 1
            elif t.kind == OP and t.value == ")":
                depth -= 1
            elif (
                t.kind == OP
                and t.value == "*"
                and depth == 0
                and (
                    k == sel_lo
                    or (toks[k - 1].kind == OP and toks[k - 1].value == ",")
                )
            ):
                raise _NoRoute
    distinct = _is_distinct(toks)
    if "GROUP BY" in ranges and not distinct:
        # Branch-local aggregation: when the GROUP BY keys cover every
        # join-key position (any side's copy — inner output rows
        # satisfy the key equalities, so grouping by ANY copy pins the
        # group to one branch), every group lives wholly inside a
        # single branch on all sides and the statement's
        # SELECT/WHERE/GROUP BY/HAVING runs per branch: join AND
        # aggregation plan zero-Exchange end-to-end, ORDER BY/LIMIT
        # lifted above the union.  Any _NoRoute inside the attempt
        # degrades to the splice path below — the join still routes,
        # only the aggregation shuffles.  (DISTINCT over a grouped
        # output never runs per branch: the rebuilt inner statement
        # would drop the DISTINCT — the splice path executes it
        # verbatim instead.)
        try:
            return _join_branch_agg(
                spark,
                query,
                toks,
                ranges,
                key_alternatives,
                alias_idx,
                alias0,
                rewrite_positions,
                make_branch_join,
            )
        except _NoRoute:
            pass
    if distinct and "GROUP BY" not in ranges and "HAVING" not in ranges:
        # Branch-local DISTINCT: exact when the distinct column set
        # covers the join key (tuples pin to branches); refusal
        # degrades to the splice path — join routed, dedup shuffles.
        try:
            return _join_branch_distinct(
                spark,
                query,
                toks,
                ranges,
                key_alternatives,
                alias_idx,
                alias0,
                rewrite_positions,
                make_branch_join,
            )
        except _NoRoute:
            pass
    joined = builder()
    view = f"__spj_sql_join_{next(_view_counter)}"
    joined.createOrReplaceTempView(view)
    # splice: FROM section -> view AS first-alias; other qualifiers -> it
    # (the FROM keyword sits at body-1; the last ON token is toks[hi-1])
    edits = [
        (
            toks[ranges["FROM"][0] - 1].start,
            toks[hi - 1].end,
            f"FROM {_quote(view)} AS {_quote(alias0)}",
        )
    ]
    for k in rewrite_positions:
        edits.append((toks[k].start, toks[k].end, _quote(alias0)))
    out_text = query
    for a, b, repl in sorted(edits, reverse=True):
        out_text = out_text[:a] + repl + out_text[b:]
    res = spark.sql(out_text)
    # eager analysis inlined the view; drop it so routed statements
    # don't leak one catalog entry each
    spark.catalog.dropTempView(view)
    return res


def _split_depth0_commas(
    toks: list[Token], lo: int, hi: int
) -> list[tuple[int, int]]:
    items = []
    depth, start = 0, lo
    for k in range(lo, hi):
        t = toks[k]
        if t.kind == OP and t.value == "(":
            depth += 1
        elif t.kind == OP and t.value == ")":
            depth -= 1
        elif t.kind == OP and t.value == "," and depth == 0:
            items.append((start, k))
            start = k + 1
    items.append((start, hi))
    if any(a >= b for a, b in items):
        raise _NoRoute
    return items


def _parse_order_limit(toks, ranges):
    """Conservative ORDER BY/LIMIT parse for shapes whose aggregation
    runs per branch (output = the select list's names): ORDER BY items
    must be bare output names or positional ints with optional
    ASC/DESC/NULLS FIRST|LAST; LIMIT a bare int.  Raises _NoRoute."""
    order_items: list[tuple[Any, bool, Optional[str]]] = []
    if "ORDER BY" in ranges:
        olo, ohi = ranges["ORDER BY"]
        for a, b in _split_depth0_commas(toks, olo, ohi):
            item = list(toks[a:b])
            nulls: Optional[str] = None
            if (
                len(item) >= 2
                and item[-2].is_kw("NULLS")
                and item[-1].is_kw("FIRST", "LAST")
            ):
                nulls = item[-1].upper()
                item = item[:-2]
            asc = True
            if item and item[-1].is_kw("ASC", "DESC"):
                asc = item[-1].upper() == "ASC"
                item = item[:-1]
            if len(item) != 1:
                raise _NoRoute
            t = item[0]
            if t.kind == NUMBER and t.value.isdigit():
                order_items.append((int(t.value), asc, nulls))
            elif _name_tok(t) is not None:
                order_items.append((t.value, asc, nulls))
            else:
                raise _NoRoute
    limit_n: Optional[int] = None
    if "LIMIT" in ranges:
        llo, lhi = ranges["LIMIT"]
        if lhi - llo != 1 or toks[llo].kind != NUMBER or not toks[
            llo
        ].value.isdigit():
            raise _NoRoute
        limit_n = int(toks[llo].value)
    return order_items, limit_n


def _output_names(toks, ranges) -> tuple[set[str], int]:
    """Bare-identifier-addressable output names of the SELECT list
    (``AS`` aliases and plain column references; expression items
    without an alias contribute no name) plus the item count — the
    PREFLIGHT resolution scope for ORDER BY, checked before any branch
    plan is built so a name miss degrades cheaply instead of throwing
    away a fully-constructed join (auto-generated expression names are
    not bare identifiers, so this never widens what
    :func:`_apply_order_limit` would accept)."""
    names: set[str] = set()
    count = 0
    slo, shi = ranges["SELECT"]
    for a, b in _split_depth0_commas(toks, slo, shi):
        count += 1
        item = toks[a:b]
        if (
            len(item) >= 2
            and item[-2].is_kw("AS")
            and _name_tok(item[-1]) is not None
        ):
            names.add(item[-1].value.lower())
        elif len(item) == 1 and _name_tok(item[0]) is not None:
            names.add(item[0].value.lower())
        elif (
            len(item) == 3
            and _name_tok(item[0]) is not None
            and _is_dot(item[1])
            and _name_tok(item[2]) is not None
        ):
            names.add(item[2].value.lower())
    return names, count


def _preflight_order(order_items, names: set[str], count: int) -> None:
    """Raise :class:`_NoRoute` for any ORDER BY item that could not
    resolve against the parsed output names — BEFORE the branch build."""
    for ref, _asc, _nulls in order_items:
        if isinstance(ref, int):
            if not (1 <= ref <= count):
                raise _NoRoute
        elif ref.lower() not in names:
            raise _NoRoute


def _apply_order_limit(out: DataFrame, order_items, limit_n) -> DataFrame:
    if order_items:
        cols = []
        for ref, asc, nulls in order_items:
            if isinstance(ref, int):
                if not (1 <= ref <= len(out.columns)):
                    raise _NoRoute
                name = out.columns[ref - 1]
            else:
                lower = {c.lower(): c for c in out.columns}
                name = lower.get(ref.lower())
                if name is None:
                    raise _NoRoute
            c = F.col(name)
            if asc:
                c = c.asc_nulls_first() if nulls != "LAST" else c.asc_nulls_last()
            else:
                c = (
                    c.desc_nulls_last()
                    if nulls != "FIRST"
                    else c.desc_nulls_first()
                )
            cols.append(c)
        out = out.orderBy(*cols)
    if limit_n is not None:
        out = out.limit(limit_n)
    return out


def _clause_text(query, toks, ranges, name, rewrites=(), alias0=None):
    """Verbatim source slice of a clause body, with the given qualifier
    token positions rewritten to ``alias0``."""
    if name not in ranges:
        return None
    a, b = ranges[name]
    start, end = toks[a].start, toks[b - 1].end
    text = query[start:end]
    edits = [
        (toks[k].start, toks[k].end)
        for k in rewrites
        if a <= k < b
    ]
    for s, e in sorted(edits, reverse=True):
        text = text[: s - start] + _quote(alias0) + text[e - start :]
    return text


def _join_branch_agg(
    spark: SparkSession,
    query: str,
    toks: list[Token],
    ranges,
    key_alternatives: Sequence[set[str]],
    alias_idx,
    alias0: str,
    rewrite_positions: list[int],
    make_join,
) -> DataFrame:
    """Routed join (two-table or chain) whose GROUP BY covers every
    join-key position (any side's copy per position — inner output rows
    satisfy the key equalities, so grouping by ANY copy pins the group
    to one branch): run SELECT/WHERE/GROUP BY/HAVING per SPJ branch via
    the ``make_join(branch_fn)`` builder — exact because the joined
    view's column names are unique by construction (shared non-key
    names were refused), so a group-key name equal to a join-key name
    IS that key column.  ``key_alternatives[p]`` is the lowercased name
    set accepted for key position p.  Raises :class:`_NoRoute` when the
    GROUP BY shape or the ORDER BY/LIMIT tail is outside the per-branch
    dialect."""
    gset: set[str] = set()
    glo, ghi = ranges["GROUP BY"]
    for a, b in _split_depth0_commas(toks, glo, ghi):
        item = toks[a:b]
        if len(item) == 1 and _name_tok(item[0]) is not None:
            gset.add(item[0].value.lower())
        elif (
            len(item) == 3
            and _name_tok(item[0]) is not None
            and item[0].value.lower() in alias_idx
            and _is_dot(item[1])
            and _name_tok(item[2]) is not None
        ):
            gset.add(item[2].value.lower())
        else:
            raise _NoRoute
    for alts in key_alternatives:
        if not (alts & gset):
            raise _NoRoute
    order_items, limit_n = _parse_order_limit(toks, ranges)
    _preflight_order(order_items, *_output_names(toks, ranges))
    rw = rewrite_positions
    sel = _clause_text(query, toks, ranges, "SELECT", rw, alias0)
    where = _clause_text(query, toks, ranges, "WHERE", rw, alias0)
    gb = _clause_text(query, toks, ranges, "GROUP BY", rw, alias0)
    having = _clause_text(query, toks, ranges, "HAVING", rw, alias0)
    qid = next(_view_counter)
    branch_counter = itertools.count()

    def fn(df: DataFrame) -> DataFrame:
        vname = f"__spj_sql_jagg_{qid}_b{next(branch_counter)}"
        # SinglePartition satisfies the group-by's ClusteredDistribution,
        # so the per-branch aggregate plans one-phase with no Exchange
        # (same trade as bucket_agg: parallelism = branch count)
        df.coalesce(1).createOrReplaceTempView(vname)
        inner = f"SELECT {sel} FROM {_quote(vname)} AS {_quote(alias0)}"
        if where:
            inner += f" WHERE {where}"
        inner += f" GROUP BY {gb}"
        if having:
            inner += f" HAVING {having}"
        out = spark.sql(inner)
        # sql() analyzes eagerly (the view subtree is inlined into the
        # plan), so dropping the per-branch view immediately avoids
        # accumulating one session-catalog entry per branch forever
        spark.catalog.dropTempView(vname)
        return out

    return _apply_order_limit(make_join(fn), order_items, limit_n)


def _join_branch_distinct(
    spark: SparkSession,
    query: str,
    toks: list[Token],
    ranges,
    key_alternatives: Sequence[set[str]],
    alias_idx,
    alias0: str,
    rewrite_positions: list[int],
    make_join,
) -> DataFrame:
    """Routed join (two-table or chain) under ``SELECT DISTINCT`` whose
    column set covers every join-key position (any side's copy — inner
    rows satisfy the key equalities, so each distinct tuple pins to one
    branch on all sides): the whole statement runs per branch via the
    ``make_join(branch_fn)`` builder — join AND dedup plan zero-Exchange
    end-to-end, ORDER BY/LIMIT lifted above the union."""
    names = {
        nm.lower()
        for nm in _select_item_names(toks, ranges, set(alias_idx))
    }
    for alts in key_alternatives:
        if not (alts & names):
            raise _NoRoute
    order_items, limit_n = _parse_order_limit(toks, ranges)
    _preflight_order(order_items, *_output_names(toks, ranges))
    rw = rewrite_positions
    sel = _clause_text(query, toks, ranges, "SELECT", rw, alias0)
    where = _clause_text(query, toks, ranges, "WHERE", rw, alias0)
    qid = next(_view_counter)
    branch_counter = itertools.count()

    def fn(df: DataFrame) -> DataFrame:
        vname = f"__spj_sql_jd_{qid}_b{next(branch_counter)}"
        # SinglePartition satisfies the dedup's ClusteredDistribution,
        # so the per-branch DISTINCT plans with no Exchange
        df.coalesce(1).createOrReplaceTempView(vname)
        inner = f"SELECT DISTINCT {sel} FROM {_quote(vname)} AS {_quote(alias0)}"
        if where:
            inner += f" WHERE {where}"
        out = spark.sql(inner)
        spark.catalog.dropTempView(vname)
        return out

    return _apply_order_limit(make_join(fn), order_items, limit_n)


def _is_distinct(toks: list[Token]) -> bool:
    return len(toks) > 1 and toks[1].is_kw("DISTINCT")


def _select_item_names(
    toks: list[Token], ranges, allowed_quals: set[str]
) -> list[str]:
    """Member names of a SELECT list whose every item is a plain column
    reference — bare ``name`` or ``qual.name`` with ``qual`` in
    ``allowed_quals`` (lowercased).  Aliases, expressions, and stars
    raise :class:`_NoRoute`."""
    names: list[str] = []
    slo, shi = ranges["SELECT"]
    for a, b in _split_depth0_commas(toks, slo, shi):
        item = toks[a:b]
        if len(item) == 1 and _name_tok(item[0]) is not None:
            names.append(item[0].value)
        elif (
            len(item) == 3
            and _name_tok(item[0]) is not None
            and item[0].value.lower() in allowed_quals
            and _is_dot(item[1])
            and _name_tok(item[2]) is not None
        ):
            names.append(item[2].value)
        else:
            raise _NoRoute
    return names


def _route_distinct(
    catalog, spark: SparkSession, query: str, toks: list[Token], ranges
) -> DataFrame:
    """Single-table ``SELECT DISTINCT`` whose column set contains a
    partition-backed key: every distinct tuple carries its key, so the
    tuples for a key value live wholly inside that key's SPJ branch and
    per-branch DISTINCT is globally exact — the statement runs per
    branch (SinglePartition, so the dedup plans with zero Exchange),
    ORDER BY/LIMIT lifted above the union.  Plain Spark plans a full
    hashpartitioning shuffle for the same text."""
    from datafusion_iceberg_spark.iceberg.spj import (
        _partition_backed_key,
        bucket_apply,
    )
    from datafusion_iceberg_spark.iceberg.table import IcebergTable

    if "GROUP BY" in ranges or "HAVING" in ranges:
        raise _NoRoute
    lo, hi = ranges["FROM"]
    key, alias, i, tt = _parse_table(toks, lo, hi, catalog)
    if i != hi:
        raise _NoRoute
    table = catalog._rel(key)
    if not isinstance(table, IcebergTable):
        raise _NoRoute
    quals = {alias.lower()} if alias is not None else set()
    dcols = _resolve_cols(table, _select_item_names(toks, ranges, quals))
    try:
        _partition_backed_key(table, dcols)
    except Exception:
        raise _NoRoute from None
    for k in _qualifier_positions(toks, ranges, skip=(lo - 1, hi)):
        if toks[k].value.lower() not in quals:
            raise _NoRoute
        if toks[k + 2].kind == OP and toks[k + 2].value == "*":
            raise _NoRoute
    order_items, limit_n = _parse_order_limit(toks, ranges)
    _preflight_order(order_items, *_output_names(toks, ranges))
    sel = _clause_text(query, toks, ranges, "SELECT")
    where = _clause_text(query, toks, ranges, "WHERE")
    qid = next(_view_counter)
    branch_counter = itertools.count()

    def fn(df: DataFrame) -> DataFrame:
        vname = f"__spa_sql_d_{qid}_b{next(branch_counter)}"
        df.createOrReplaceTempView(vname)
        rel = _quote(vname) + (f" AS {_quote(alias)}" if alias else "")
        inner = f"SELECT DISTINCT {sel} FROM {rel}"
        if where:
            inner += f" WHERE {where}"
        out = spark.sql(inner)
        spark.catalog.dropTempView(vname)
        return out

    kcol, _ = _partition_backed_key(table, dcols)
    out = bucket_apply(
        spark, table, kcol, fn, snapshot_id=_resolve_time_travel(table, tt)
    )
    return _apply_order_limit(out, order_items, limit_n)


def _route_agg(
    catalog, spark: SparkSession, query: str, toks: list[Token], ranges
) -> Optional[DataFrame]:
    """Single-table GROUP BY on a partition-backed key: run the
    statement's SELECT/WHERE/GROUP BY/HAVING per SPJ branch (exact —
    every branch holds ALL rows for its keys), lift ORDER BY/LIMIT
    above the union."""
    from datafusion_iceberg_spark.iceberg.spj import (
        _partition_backed_key,
        bucket_apply,
    )
    from datafusion_iceberg_spark.iceberg.table import IcebergTable

    lo, hi = ranges["FROM"]
    key, alias, i, tt = _parse_table(toks, lo, hi, catalog)
    if i != hi:
        raise _NoRoute
    table = catalog._rel(key)
    if not isinstance(table, IcebergTable):
        raise _NoRoute
    # group keys: bare or alias-qualified plain columns
    gcols: list[str] = []
    glo, ghi = ranges["GROUP BY"]
    for a, b in _split_depth0_commas(toks, glo, ghi):
        item = toks[a:b]
        if len(item) == 1 and _name_tok(item[0]) is not None:
            gcols.append(item[0].value)
        elif (
            len(item) == 3
            and alias is not None
            and _name_tok(item[0]) is not None
            and item[0].value.lower() == alias.lower()
            and _is_dot(item[1])
            and _name_tok(item[2]) is not None
        ):
            gcols.append(item[2].value)
        else:
            raise _NoRoute
    gcols = _resolve_cols(table, gcols)
    try:
        _partition_backed_key(table, gcols)
    except Exception:
        raise _NoRoute from None
    # qualifier audit: only the table alias may qualify references
    allowed = {alias.lower()} if alias is not None else set()
    for k in _qualifier_positions(toks, ranges, skip=(lo - 1, hi)):
        if toks[k].value.lower() not in allowed:
            raise _NoRoute
        if toks[k + 2].kind == OP and toks[k + 2].value == "*":
            raise _NoRoute
    # ORDER BY: bare output names / positional ints, optional direction
    order_items, limit_n = _parse_order_limit(toks, ranges)
    _preflight_order(order_items, *_output_names(toks, ranges))

    sel = _clause_text(query, toks, ranges, "SELECT")
    where = _clause_text(query, toks, ranges, "WHERE")
    gb = _clause_text(query, toks, ranges, "GROUP BY")
    having = _clause_text(query, toks, ranges, "HAVING")
    qid = next(_view_counter)
    branch_counter = itertools.count()

    def fn(df: DataFrame) -> DataFrame:
        vname = f"__spa_sql_{qid}_b{next(branch_counter)}"
        df.createOrReplaceTempView(vname)
        rel = _quote(vname) + (f" AS {_quote(alias)}" if alias else "")
        inner = f"SELECT {sel} FROM {rel}"
        if where:
            inner += f" WHERE {where}"
        inner += f" GROUP BY {gb}"
        if having:
            inner += f" HAVING {having}"
        out = spark.sql(inner)
        # sql() analyzes eagerly (the view subtree is inlined into the
        # plan), so dropping the per-branch view immediately avoids
        # accumulating one session-catalog entry per branch forever
        spark.catalog.dropTempView(vname)
        return out

    kcol, _ = _partition_backed_key(table, gcols)
    out = bucket_apply(
        spark, table, kcol, fn, snapshot_id=_resolve_time_travel(table, tt)
    )
    return _apply_order_limit(out, order_items, limit_n)


def try_spj_sql(catalog, spark: SparkSession, query: str) -> Optional[DataFrame]:
    """Route one SELECT statement through the SPJ planner when the
    storage contract allows; return None (silent fallback) otherwise.
    Never raises: any exception during recognition or plan construction
    falls back — the plain path re-executes the statement and surfaces
    its own error, so error behavior matches the un-routed surface."""
    try:
        toks = tokenize(query)
        ranges = _clause_ranges(toks)
        lo, hi = ranges["FROM"]
        has_join = any(
            toks[k].is_kw("JOIN") for k in range(lo, hi)
        )
        if has_join:
            return _route_join(catalog, spark, query, toks, ranges)
        if _is_distinct(toks):
            return _route_distinct(catalog, spark, query, toks, ranges)
        if "GROUP BY" in ranges:
            return _route_agg(catalog, spark, query, toks, ranges)
        return None
    except _NoRoute:
        return None
    except Exception:
        return None
