"""Warehouse catalog: namespaces → tables/views, with an eager in-memory
mirror (SURVEY.md §2A A13-A16; reference:
datafusion_iceberg_catalog_rest/src/{catalog,schema,mirror}.rs).

Layout: ``<warehouse>/<namespace>/<table>/metadata/...`` — the same shape
as the reference fixture's ``warehouse/nyc/taxis``.

The mirror is built eagerly at construction like ``Mirror::new``
(mirror.rs:23-53), but **mutations are synchronous** — the reference
spawns register/drop futures on a LocalPool it never polls, silently
dropping the remote write (bug #3, SURVEY.md §4.4).
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datafusion_iceberg_spark.iceberg.table import IcebergTable
from datafusion_iceberg_spark.iceberg.view import IcebergView
from datafusion_iceberg_spark.iceberg.writer import IcebergWriter

Relation = Union[IcebergTable, IcebergView]


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except (OverflowError, ValueError, OSError):
        return False
    return True


def _rel_token(rel) -> tuple:
    """Cheap version identity for a relation: changes whenever the
    table/view advances (snapshot, schema, view version).  Used to
    re-register temp views whose backing relation moved since the last
    attach (statement-scoped attach must not serve stale plans through
    indirectly-referencing session views)."""
    raw = getattr(getattr(rel, "metadata", None), "raw", None)
    if raw is None:
        raw = getattr(rel, "raw", {}) or {}
    return (
        raw.get("current-snapshot-id"),
        raw.get("last-updated-ms"),
        raw.get("last-sequence-number"),
        raw.get("current-schema-id"),
        raw.get("current-version-id"),
    )


class SqlSurface:
    """SQL entry shared by every catalog flavor (filesystem Catalog and
    the REST mirror): 3-part name rewriting with literal/comment safety,
    ``FOR VERSION/TIMESTAMP AS OF`` time travel (snapshot ids, epoch
    millis, ISO strings, and named refs), and ``$<kind>`` metadata
    tables.  Hosts need: ``self.name``, ``self._mirror``,
    ``self.namespaces()``, ``self.attach(spark)``."""

    def _relation_keys(self) -> list:
        """Every known relation ident.  A lazy catalog (REST mirror)
        overrides this to list names WITHOUT loading metadata."""
        return list(self._mirror)

    def _rel(self, key: str):
        """Resolve one relation by ident (lazy catalogs load on demand)."""
        return self._mirror[key]

    def _referenced_keys(self, query: str) -> list[str]:
        """Conservative superset of the catalog relations ``query`` can
        touch — matched by flattened ``ns_bare``, dotted ``ns.bare`` /
        ``cat.ns.bare``, or bare-name spellings — plus, to a fixpoint,
        relations referenced from matched VIEWS' stored SQL.  attach()
        then builds DataFrames only for these instead of every relation
        in the catalog (r10: attach cost now tracks the statement, not
        the warehouse); sql() falls back to one full attach if an exotic
        spelling slips past the matcher."""
        import re

        # backticks are only quoting — strip them so `ns_t`, ns.`t` and
        # bare spellings all match one pattern
        texts = [query.replace("`", "")]
        seen: set[str] = set()
        i = 0
        while i < len(texts):
            text = texts[i]
            i += 1
            for key in self._relation_keys():
                if key in seen:
                    continue
                ns, bare = key.split(".", 1)
                pat = (
                    rf"(?<!\w)(?:{re.escape(ns)}[._]{re.escape(bare)}"
                    rf"|{re.escape(bare)})(?!\w)"
                )
                if re.search(pat, text, flags=re.IGNORECASE):
                    seen.add(key)
                    rel = self._rel(key)
                    if isinstance(rel, IcebergView):
                        # EVERY version's SQL: view time travel may
                        # expand an old version referencing tables the
                        # current one dropped
                        for v in rel.raw.get("versions", []):
                            for r in v.get("representations", []):
                                if r.get("type") == "sql":
                                    texts.append(
                                        r["sql"].replace("`", "")
                                    )
        return sorted(seen)

    @staticmethod
    def _split_sql_literals(query: str) -> list[tuple[bool, str]]:
        """Split a SQL string into (is_code, text) spans so name rewriting
        never touches string literals or comments.  Handles '...'/"..."
        literals (with doubled-quote and backslash escapes), ``--`` line
        comments, and ``/* */`` block comments.  Backtick identifiers stay
        in code spans — they ARE names and must be rewritable."""
        parts: list[tuple[bool, str]] = []
        i, n, start = 0, len(query), 0

        def flush_code(upto: int) -> None:
            if upto > start:
                parts.append((True, query[start:upto]))

        while i < n:
            c = query[i]
            if c in ("'", '"'):
                j = i + 1
                while j < n:
                    if query[j] == "\\":
                        j += 2
                        continue
                    if query[j] == c:
                        if j + 1 < n and query[j + 1] == c:  # '' escape
                            j += 2
                            continue
                        break
                    j += 1
                j = min(j, n - 1)
                flush_code(i)
                parts.append((False, query[i : j + 1]))
                i = start = j + 1
            elif query.startswith("--", i):
                j = query.find("\n", i)
                j = n if j < 0 else j
                flush_code(i)
                parts.append((False, query[i:j]))
                i = start = j
            elif query.startswith("/*", i):
                j = query.find("*/", i + 2)
                j = n if j < 0 else j + 2
                flush_code(i)
                parts.append((False, query[i:j]))
                i = start = j
            else:
                i += 1
        flush_code(n)
        return parts

    def _rewrite_time_travel(self, spark: SparkSession, query: str) -> str:
        """Rewrite ``<catalog>.<ns>.<table> FOR [SYSTEM_]VERSION AS OF
        <snapshot-id>`` / ``FOR [SYSTEM_]TIMESTAMP AS OF '<ts>'`` (the
        Spark/Iceberg SQL time-travel surface the reference never had —
        it is pinned to the current snapshot, SURVEY.md §2C) into a
        dedicated temp view over the historical snapshot's file list.
        Timestamp literals parse as UTC (snapshot timestamps are epoch
        UTC); a bare integer after TIMESTAMP AS OF is epoch millis."""
        import re
        from datetime import datetime, timezone

        def seg(x: str) -> str:
            return rf"(?:`{re.escape(x)}`|{re.escape(x)})"

        # positions belonging to code spans (never literals/comments)
        code_mask = []
        off = 0
        for is_code, text in self._split_sql_literals(query):
            if is_code:
                code_mask.append((off, off + len(text)))
            off += len(text)

        def in_code(pos: int) -> bool:
            return any(a <= pos < b for a, b in code_mask)

        edits: list[tuple[int, int, str]] = []
        for key in self._relation_keys():
            ns, bare = key.split(".", 1)
            pat = (
                rf"(?<![\w`.]){seg(self.name)}\.{seg(ns)}\.{seg(bare)}"
                r"\s+FOR\s+(?:SYSTEM_)?(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
                r"('(?:[^']|'')*'|\d+)"
            )
            rel = None
            for m in re.finditer(pat, query, flags=re.IGNORECASE):
                if not in_code(m.start()):
                    continue
                if rel is None:
                    rel = self._rel(key)  # resolve only on a match (lazy)
                kind, val = m.group(1).upper(), m.group(2)
                if isinstance(rel, IcebergView):
                    # VIEW time travel: resolve the requested VERSION
                    # (or the version current AS OF the timestamp) and
                    # expand THAT stored SQL — yesterday's report
                    # definition stays queryable after REPLACE VIEW
                    if kind == "VERSION":
                        if val.startswith("'"):
                            raise ValueError(
                                "view VERSION AS OF takes a version id"
                            )
                        vid = int(val)
                    else:
                        if val.isdigit():
                            ts_ms = int(val)
                        else:
                            from datetime import (
                                datetime as _dt,
                                timezone as _tz,
                            )

                            d = _dt.fromisoformat(
                                val[1:-1].replace("''", "'")
                            )
                            if d.tzinfo is None:
                                d = d.replace(tzinfo=_tz.utc)
                            ts_ms = int(d.timestamp() * 1000)
                        vid = rel.version_at_timestamp(ts_ms)
                    df = spark.sql(rel.sql_at(vid))
                    view = f"{ns}_{bare}__vv{vid}"
                    df.createOrReplaceTempView(view)
                    edits.append((m.start(), m.end(), f"`{view}`"))
                    continue
                if kind == "VERSION":
                    if val.startswith("'"):
                        # quoted ref name (Spark/Iceberg: VERSION AS OF
                        # accepts a branch/tag) -> pinned snapshot
                        ref = val[1:-1].replace("''", "'")
                        snap_id = rel.metadata.resolve_ref(ref)
                    else:
                        snap_id = int(val)
                    df = rel.to_df(spark, snapshot_id=snap_id)
                    view = f"{ns}_{bare}__v{snap_id}"
                else:
                    if val.isdigit():
                        ts_ms = int(val)
                    else:
                        dt = datetime.fromisoformat(val[1:-1].replace("''", "'"))
                        if dt.tzinfo is None:
                            dt = dt.replace(tzinfo=timezone.utc)
                        ts_ms = int(dt.timestamp() * 1000)
                    df = rel.to_df(spark, as_of_timestamp_ms=ts_ms)
                    view = f"{ns}_{bare}__ts{ts_ms}"
                df.createOrReplaceTempView(view)
                edits.append((m.start(), m.end(), f"`{view}`"))
        for a, b, repl in sorted(edits, reverse=True):
            query = query[:a] + repl + query[b:]
        return query

    def _rewrite_metadata_tables(self, spark: SparkSession, query: str) -> str:
        """Rewrite ``<catalog>.<ns>.<table>$<meta>`` (Trino-style metadata
        table suffix; accepted bare or with the last segment backticked as
        ``` `table$files` ```) into a temp view over the corresponding
        inspect DataFrame.  Supported kinds: snapshots, files, manifests,
        partitions, history, refs (iceberg/inspect.py)."""
        import re

        from datafusion_iceberg_spark.iceberg.inspect import (
            METADATA_TABLES,
            metadata_df,
        )

        code_mask = []
        off = 0
        for is_code, text in self._split_sql_literals(query):
            if is_code:
                code_mask.append((off, off + len(text)))
            off += len(text)

        def in_code(pos: int) -> bool:
            return any(a <= pos < b for a, b in code_mask)

        def seg(x: str) -> str:
            return rf"(?:`{re.escape(x)}`|{re.escape(x)})"

        kinds = "|".join(sorted(METADATA_TABLES))
        edits: list[tuple[int, int, str]] = []
        for key in self._relation_keys():
            ns, bare = key.split(".", 1)
            pat = (
                rf"(?<![\w`.]){seg(self.name)}\.{seg(ns)}\."
                rf"(?:`{re.escape(bare)}\$({kinds})`|{re.escape(bare)}\$({kinds}))"
                r"(?![\w`$])"
            )
            rel = None
            for m in re.finditer(pat, query, flags=re.IGNORECASE):
                if not in_code(m.start()):
                    continue
                if rel is None:
                    rel = self._rel(key)  # resolve only on a match (lazy)
                if not isinstance(rel, IcebergTable):
                    break
                kind = (m.group(1) or m.group(2)).lower()
                view = f"{ns}_{bare}__meta_{kind}"
                metadata_df(rel, spark, kind).createOrReplaceTempView(view)
                edits.append((m.start(), m.end(), f"`{view}`"))
        for a, b, repl in sorted(edits, reverse=True):
            query = query[:a] + repl + query[b:]
        return query

    def _split_statements(self, query: str) -> list[str]:
        """Split a script on top-level ``;`` (never inside string
        literals or comments); drops empty trailing statements."""
        parts: list[str] = []
        cur: list[str] = []
        for is_code, text in self._split_sql_literals(query):
            if not is_code:
                cur.append(text)
                continue
            while ";" in text:
                head, text = text.split(";", 1)
                cur.append(head)
                parts.append("".join(cur))
                cur = []
            cur.append(text)
        parts.append("".join(cur))
        return [p for p in parts if p.strip()]

    def resolve_names(self, query: str) -> str:
        """Rewrite ``<catalog>.<ns>.<table>`` references (bare or
        backticked, literal/comment-safe) to the flat ``<ns>_<table>``
        view names — the storable spelling for view SQL, which replays
        through plain ``spark.sql`` at scan time (view.py:to_df)."""
        import re

        def seg(x: str) -> str:
            return rf"(?:`{re.escape(x)}`|{re.escape(x)})"

        out: list[str] = []
        for is_code, text in self._split_sql_literals(query):
            if is_code:
                for key in self._relation_keys():
                    ns, bare = key.split(".", 1)
                    text = re.sub(
                        rf"(?<![\w`.]){seg(self.name)}\.{seg(ns)}\.{seg(bare)}(?![\w`])",
                        f"`{ns}_{bare}`",
                        text,
                        flags=re.IGNORECASE,
                    )
            out.append(text)
        return "".join(out)

    def sql(self, spark: SparkSession, query: str) -> DataFrame:
        """SQL over the attached catalog, with THREE-PART name resolution:
        occurrences of ``<catalog>.<ns>.<table>`` — bare or with any
        segment backtick-quoted — rewrite to the registered flat view,
        mirroring the reference's ``my_catalog.dashbook.covid_nyt``
        resolution (catalog.rs:114-117) without a JVM TableCatalog plugin.
        ``FOR [SYSTEM_]VERSION/TIMESTAMP AS OF`` suffixes on catalog
        tables time-travel (``_rewrite_time_travel``).

        Hardening (VERDICT r2 Missing #2 / ADVICE): string literals and
        comments are never rewritten; quoted spellings resolve like bare
        ones; and a ``<catalog>.``-prefixed name that survives the rewrite
        (unknown table) raises a clear error here instead of surfacing as
        Spark's confusing TABLE_OR_VIEW_NOT_FOUND on a name this layer
        owns.

        DML/DDL statements (INSERT/DELETE/UPDATE/MERGE/CREATE/DROP/
        ALTER) on catalog tables dispatch to the write path (dml.py) and
        return a one-row (operation, target, snapshot_id) DataFrame.

        Multi-statement scripts (top-level ``;`` separators, literal-
        and comment-safe) execute sequentially; the LAST statement's
        result is returned — the standard script contract."""
        import re

        from datafusion_iceberg_spark.iceberg import dml

        stmts = self._split_statements(query)
        if len(stmts) > 1:
            # Script isolation (r12, VERDICT r11 #8): REPEATABLE READ —
            # every table the script references is pinned to its
            # snapshot AT SCRIPT ENTRY, so a concurrent commit between
            # statements never changes what statement N+1 reads.  The
            # script's OWN DML advances the pin for its target (later
            # statements see earlier statements' writes), mirroring how
            # LocalTransaction chains staged metadata for writes.
            own_pins = not hasattr(self, "_script_pins")
            if own_pins:
                self._script_pins = {}
                for k in self._referenced_keys(query):
                    try:
                        rel = self._rel(k)
                    except KeyError:
                        continue
                    if isinstance(rel, IcebergTable):
                        self._script_pins[k] = (
                            rel.metadata.current_snapshot_id
                        )
            out: Optional[DataFrame] = None
            txn = None
            txn_surface = None
            try:
                for st in stmts:
                    from datafusion_iceberg_spark.sql import ast_nodes as _A
                    from datafusion_iceberg_spark.sql.parser import (
                        parse_statement,
                    )

                    import re as _re

                    # head keyword AFTER any leading comments (the
                    # splitter keeps them attached to their statement)
                    lead = _re.sub(
                        r"^(\s*(--[^\n]*(\n|$)|/\*.*?\*/))*",
                        "",
                        st,
                        flags=_re.S,
                    ).strip()
                    head = lead.split(None, 1)
                    headkw = head[0].upper() if head else ""
                    if headkw in ("BEGIN", "COMMIT", "ROLLBACK"):
                        # SQL transactions (r12): statements between
                        # BEGIN and COMMIT route their WRITES through a
                        # LocalTransaction (staged metadata, one
                        # all-or-nothing publish at COMMIT); reads keep
                        # the script-entry pins — snapshot isolation.
                        node = parse_statement(st.strip(), self.name)
                        if isinstance(node, _A.BeginTransaction):
                            if txn is not None:
                                raise ValueError(
                                    "nested BEGIN TRANSACTION"
                                )
                            # flavor-routed: Catalog -> LocalTransaction,
                            # RestCatalog -> RestTransaction (same shape)
                            txn = self.transaction()
                            txn_surface = _TxnSqlSurface(self, txn)
                            op = "begin_transaction"
                        elif isinstance(node, _A.CommitTransaction):
                            if txn is None:
                                raise ValueError(
                                    "COMMIT outside a transaction"
                                )
                            touched = sorted(txn._pending)
                            txn.commit()
                            # read-your-writes after COMMIT: advance
                            # the pins for every table the txn landed
                            if own_pins:
                                for k in touched:
                                    if k in self._script_pins:
                                        self._script_pins[k] = self._rel(
                                            k
                                        ).metadata.current_snapshot_id
                            txn = txn_surface = None
                            op = "commit_transaction"
                        else:
                            if txn is None:
                                raise ValueError(
                                    "ROLLBACK outside a transaction"
                                )
                            # abort marks the txn finished and clears
                            # staged metadata; eagerly-written data
                            # files become orphans (remove_orphan_files
                            # reclaims them — the documented semantics
                            # of context-manager discard too)
                            abort = getattr(txn, "abort", None)
                            if abort is not None:
                                abort()
                            txn = txn_surface = None
                            op = "rollback_transaction"
                        out = dml._result(spark, op, self.name, None)
                        continue
                    if txn is not None:
                        node = parse_statement(
                            lead.rstrip(";").strip(), self.name
                        )
                        if isinstance(
                            node,
                            (
                                _A.ShowTables,
                                _A.ShowViews,
                                _A.ShowNamespaces,
                                _A.ShowPartitions,
                                _A.ShowTblProperties,
                                _A.ShowCreateTable,
                                _A.Describe,
                                _A.DescribeNamespace,
                            ),
                        ):
                            # read-only statements: fine inside a txn,
                            # answered from the catalog (entry state)
                            out = dml.try_execute(self, spark, st)
                            continue
                        if node is not None and not isinstance(
                            node,
                            (_A.Insert, _A.Delete, _A.Update, _A.Merge),
                        ):
                            raise ValueError(
                                "only INSERT/DELETE/UPDATE/MERGE (and "
                                "reads) are allowed inside BEGIN/COMMIT "
                                f"— got {type(node).__name__}"
                            )
                        handled = dml.try_execute(txn_surface, spark, st)
                        if handled is not None:
                            out = handled
                            continue
                        out = self.sql(spark, st)  # read: entry snapshot
                        continue
                    handled = dml.try_execute(self, spark, st)
                    if handled is not None:
                        out = handled
                        # advance the pin for the statement's OWN write
                        # target; SHOW/DESCRIBE/CALL results carry no
                        # ``target`` column and advance nothing
                        if own_pins and "target" in out.columns:
                            rows = out.collect()
                            tgt = rows[0].target if rows else None
                            try:
                                rel = self._rel(tgt) if tgt else None
                            except KeyError:
                                rel = None
                            if (
                                tgt in self._script_pins
                                and isinstance(rel, IcebergTable)
                            ):
                                self._script_pins[tgt] = (
                                    rel.metadata.current_snapshot_id
                                )
                        continue
                    out = self.sql(spark, st)
            finally:
                if own_pins:
                    del self._script_pins
            if txn is not None:
                raise ValueError(
                    "script ended inside a transaction — close it with "
                    "COMMIT or ROLLBACK (nothing was committed)"
                )
            if out is None:
                raise ValueError("empty SQL script")
            return out

        out = dml.try_execute(self, spark, query)
        if out is not None:
            return out
        # SPJ routing (VERDICT r14 #1): an equi-join of two attached
        # Iceberg tables with SPJ-compatible specs — or a single-table
        # GROUP BY on a partition-backed key — runs shuffle-free from
        # the SAME SQL text, with silent fallback to the plain plan on
        # any refusal.  Skipped inside multi-statement scripts: routing
        # reads the CURRENT snapshot, while scripts pin REPEATABLE READ
        # snapshots at entry.
        if getattr(self, "enable_spj_sql", True) and not hasattr(
            self, "_script_pins"
        ):
            from datafusion_iceberg_spark.iceberg.spj_sql import try_spj_sql

            routed = try_spj_sql(self, spark, query)
            if routed is not None:
                return routed
        keys = set(self._referenced_keys(query))
        # ALSO re-register any previously-attached relation whose backing
        # version moved since its registration: a session view derived
        # from ns_t (CREATE TEMP VIEW x AS SELECT ... FROM ns_t) carries
        # no token matching ns.t, so the reference matcher alone would
        # leave x resolving against the file list frozen at the earlier
        # attach (r10 review find)
        known = None
        for k, tok in list(getattr(self, "_attached_tokens", {}).items()):
            if k in keys:
                continue
            rel = self._mirror.get(k)
            if rel is not None and _rel_token(rel) == tok:
                continue  # unchanged since registration
            if known is None:
                known = set(self._relation_keys())
            if k in known:
                keys.add(k)  # changed (or lazily evicted): refresh it
        self.attach(spark, keys=sorted(keys))
        query = self._rewrite_metadata_tables(spark, query)
        query = self._rewrite_time_travel(spark, query)

        def seg(x: str) -> str:
            return rf"(?:`{re.escape(x)}`|{re.escape(x)})"

        spans = self._split_sql_literals(query)
        # alias/CTE shadow detection must see the WHOLE statement's code
        # (the alias definition and the dotted reference may sit in
        # different code spans when a string literal separates them)
        all_code = "".join(t for c, t in spans if c)
        rewritten: list[str] = []
        for is_code, text in spans:
            if is_code:
                # Spark identifiers are case-insensitive by default, so
                # MY_CATALOG.ns.tbl must rewrite (and be caught) the same
                # as my_catalog.ns.tbl (ADVICE r3).
                for key in self._relation_keys():
                    ns, bare = key.split(".", 1)
                    text = re.sub(
                        rf"(?<![\w`.]){seg(self.name)}\.{seg(ns)}\.{seg(bare)}(?![\w`])",
                        f"`{ns}_{bare}`",
                        text,
                        flags=re.IGNORECASE,
                    )
                # TABLE POSITION (after FROM/JOIN) is unambiguous — no
                # alias can appear there — so any surviving
                # '<catalog>.<...>' is a genuine miss: a two-part ref
                # with the namespace omitted, or an unknown table/ns.
                # Raise this layer's clear error listing known tables
                # instead of Spark's generic TABLE_OR_VIEW_NOT_FOUND
                # (ADVICE r4 #2).
                tbl_pos = re.search(
                    rf"\b(?:FROM|JOIN)\s+{seg(self.name)}\."
                    r"((?:`[^`]+`|\w+)(?:\.(?:`[^`]+`|\w+))?)(?![\w`.])",
                    text,
                    flags=re.IGNORECASE,
                )
                if tbl_pos:
                    known = ", ".join(sorted(self._relation_keys()))
                    raise ValueError(
                        f"unresolved catalog reference "
                        f"{tbl_pos.group(0).split(None, 1)[1]!r}: no table "
                        f"{tbl_pos.group(1)!r} registered in catalog "
                        f"{self.name!r} (known: {known})"
                    )
                # Elsewhere, '<catalog>.<x>.<y>' is only this layer's to
                # own when <x> is a REGISTERED NAMESPACE and nothing in
                # the statement shadows the catalog name: an alias/CTE
                # named like the catalog (SELECT mycat.meta.width_hint
                # FROM t AS mycat — even when 'meta' is also a namespace)
                # makes the reference a struct-field access that must
                # pass through to Spark untouched (ADVICE r3 two-part /
                # r4 #1 three-part / r5 alias-shadowing).
                shadow = re.search(
                    rf"(?:\bAS\s+{seg(self.name)}(?![\w`.(])"  # ... AS mycat
                    rf"|\bWITH\s+{seg(self.name)}\s+AS\b"  # WITH mycat AS
                    rf"|,\s*{seg(self.name)}\s+AS\s*\("  # , mycat AS (
                    # bare alias: FROM/JOIN <rel> mycat
                    rf"|\b(?:FROM|JOIN)\s+(?:`[^`]+`|[\w.]+)\s+"
                    rf"{seg(self.name)}(?![\w`.(]))",
                    all_code,
                    flags=re.IGNORECASE,
                )
                if shadow is None:
                    for lm in re.finditer(
                        rf"(?<![\w`.]){seg(self.name)}\."
                        r"((?:`[^`]+`|\w+))\.(?:`[^`]+`|\w+)(?![\w`])",
                        text,
                        flags=re.IGNORECASE,
                    ):
                        mid = lm.group(1).strip("`").lower()
                        if any(ns.lower() == mid for ns in self.namespaces()):
                            known = ", ".join(sorted(self._relation_keys()))
                            raise ValueError(
                                f"unresolved catalog reference "
                                f"{lm.group(0)!r}: no such table in namespace "
                                f"{lm.group(1)!r} of catalog "
                                f"{self.name!r} (known: {known})"
                            )
            rewritten.append(text)
        final = "".join(rewritten)
        try:
            return spark.sql(final)
        except Exception as e:
            # referenced-only attach is a conservative superset, but a
            # truly exotic spelling could slip past the matcher: fall
            # back to a FULL attach once before surfacing the error
            if "TABLE_OR_VIEW_NOT_FOUND" not in str(e):
                raise
            self.attach(spark)
            return spark.sql(final)

    def ds_sql(self, spark: SparkSession, query: str) -> DataFrame:
        """One SELECT statement routed through the PYTHON DATASOURCE with
        STATEMENT-DRIVEN projection (VERDICT r11 missing #2 follow-up):
        pyspark's DataSource API has no column-pruning hook, so a plain
        ``.load().select(two_cols)`` still ships every column out of the
        Python reader; this surface derives each referenced table's
        ``columns`` option from the statement itself — the identifier
        tokens the statement can possibly touch — so a SELECT of 2 of 16
        columns reads a 2-column reader schema.

        The column set is a conservative SUPERSET: every identifier
        token in code spans (literals/comments excluded) that matches a
        column name counts, so WHERE/JOIN/ORDER BY columns are always
        included; a projection star (``SELECT *``/``t.*`` — but not
        ``COUNT(*)``) or a NATURAL JOIN falls back to the full schema.
        Over-inclusion only costs bytes, never correctness; a column the
        statement touches MUST appear as a token.  Tables register under
        ``<ns>_<table>__ds`` views so the ``to_df`` views of :meth:`sql`
        are never shadowed by a projected schema.  Scope: SELECT-only,
        Iceberg tables only (views/DML route through :meth:`sql`)."""
        import re

        from datafusion_iceberg_spark.sources.iceberg_datasource import (
            ds_read,
            register_iceberg_datasource,
        )

        if len(self._split_statements(query)) != 1 or not re.match(
            r"\s*(SELECT|WITH)\b", query, flags=re.IGNORECASE
        ):
            raise ValueError("ds_sql takes exactly one SELECT statement")
        register_iceberg_datasource(spark)
        code = "".join(
            t for is_code, t in self._split_sql_literals(query) if is_code
        )
        tokens = {
            (a or b).lower()
            for a, b in re.findall(r"`([^`]+)`|\b(\w+)\b", code)
        }
        # projection star: '*' preceded (ignoring whitespace) by SELECT,
        # DISTINCT, ',' or '.' — COUNT(*) / a*b are not projection stars
        has_star = bool(
            re.search(
                r"(?:\bSELECT|\bDISTINCT|,|\.)\s*\*", code, flags=re.IGNORECASE
            )
        )
        natural = bool(re.search(r"\bNATURAL\s+JOIN\b", code, flags=re.IGNORECASE))

        def seg(x: str) -> str:
            return rf"(?:`{re.escape(x)}`|{re.escape(x)})"

        hit = False
        for key in self._referenced_keys(query):
            rel = self._rel(key)
            if not isinstance(rel, IcebergTable):
                raise ValueError(
                    f"ds_sql: {key} is not an Iceberg table (views and "
                    "metadata tables route through sql())"
                )
            ns, bare = key.split(".", 1)
            names = [f.name for f in rel.metadata.struct_type().fields]
            if has_star or natural:
                cols = None  # full schema
            else:
                cols = [c for c in names if c.lower() in tokens]
                if not cols:
                    cols = None
            ds_read(spark, rel.metadata.root, columns=cols).createOrReplaceTempView(
                f"{ns}_{bare}__ds"
            )
            hit = True
            out = []
            for is_code, text in self._split_sql_literals(query):
                if is_code:
                    text = re.sub(
                        rf"(?<![\w`.]){seg(self.name)}\.{seg(ns)}\.{seg(bare)}(?![\w`])",
                        f"`{ns}_{bare}__ds`",
                        text,
                        flags=re.IGNORECASE,
                    )
                out.append(text)
            query = "".join(out)
        if not hit:
            raise ValueError(
                f"ds_sql: no {self.name}.<ns>.<table> reference found"
            )
        return spark.sql(query)


class _StagedLocalWriter(IcebergWriter):
    """An :class:`IcebergWriter` participating in a LOCAL multi-table
    transaction: reads chain through the transaction's pending metadata
    (a 2nd op on the same table sees the 1st's staged commit, incl.
    mid-txn DDL) and ``_commit_metadata`` stages instead of writing —
    :meth:`LocalTransaction.commit` validates every table's version and
    lands all final metadata files together."""

    def __init__(self, txn: "LocalTransaction", ident: str, **kw):
        super().__init__(**kw)
        self._txn = txn
        self._ident = ident

    def _load_current(self) -> dict:
        import copy as _copy

        if self._ident in self._txn._pending:
            return _copy.deepcopy(self._txn._pending[self._ident])
        meta = super()._load_current()
        self._txn._base_version.setdefault(
            self._ident, getattr(self, "_loaded_version", None)
        )
        return meta

    def _load_table(self) -> IcebergTable:
        import copy as _copy

        if self._ident in self._txn._pending:
            from datafusion_iceberg_spark.iceberg.metadata import (
                metadata_from_dict,
            )

            pend = self._txn._pending[self._ident]
            return IcebergTable(
                metadata_from_dict(
                    _copy.deepcopy(pend), pend.get("location", self.root)
                )
            )
        return super()._load_table()

    def _commit_metadata(self, meta: dict) -> None:
        import copy as _copy

        if self._ident not in self._txn._base_version:
            # first mutation read through pending only (possible after
            # a prior op): base version was already recorded then
            self._txn._base_version[self._ident] = self._current_version()
        self._txn._pending[self._ident] = _copy.deepcopy(meta)


class _TxnSqlSurface:
    """The SQL face of a :class:`LocalTransaction` inside a
    ``BEGIN TRANSACTION ... COMMIT`` script: the copy-on-write DML
    methods route to the transaction (data now, metadata staged for one
    all-or-nothing publish), everything else — ``load``, ``sql``,
    ``name``, name resolution — delegates to the catalog, so reads
    inside the transaction see the script-entry snapshot (snapshot
    isolation).  The MOR write variants are deliberately ABSENT: a
    merge-on-read DELETE/UPDATE cannot be staged here, and delegating
    them would commit OUTSIDE the transaction — ``_need`` fails them
    closed instead."""

    # every write-shaped method the DML executors may route: the ones
    # the transaction flavor implements stage through it; the rest fail
    # closed (hasattr False -> _need's clean refusal) instead of
    # delegating to the catalog, which would commit OUTSIDE the txn.
    # RestTransaction stages DV deletes; LocalTransaction does not —
    # the lookup below is flavor-correct automatically.
    _WRITE_SHAPED = frozenset(
        {
            "append",
            "overwrite",
            "overwrite_partitions",
            "delete_where",
            "delete_where_mor",
            "delete_where_eq",
            "delete_where_dv",
            "update_where",
            "update_where_mor",
            "merge_into",
            "upsert",
        }
    )

    def __init__(self, cat, txn):
        self._cat = cat
        self._txn = txn

    @property
    def name(self) -> str:
        # MUST be the catalog's own name: statement dispatch matches
        # 3-part targets against it (a decorated name would silently
        # un-handle every statement and bypass the transaction)
        return self._cat.name

    def __getattr__(self, attr):
        if attr in _TxnSqlSurface._WRITE_SHAPED:
            return getattr(self._txn, attr)  # AttributeError if absent
        return getattr(self._cat, attr)


class LocalTransaction:
    """Atomic multi-table transaction on the FILESYSTEM catalog — the
    local mirror of :class:`rest_catalog.RestTransaction`: every staged
    operation's DATA files write eagerly through the normal path, the
    METADATA commits stage, and :meth:`commit` first validates that no
    table advanced since the transaction read it (conflict anywhere →
    CommitConflict, NOTHING lands), then writes each table's single
    folded metadata version.  Consistency note (documented): a local
    filesystem cannot land N files atomically — a crash mid-commit
    leaves earlier tables committed; the validation window is the
    commit loop itself (each write still uses the exclusive-create
    version link, so concurrent writers can never be clobbered)."""

    def __init__(self, catalog: "Catalog"):
        self._cat = catalog
        self._pending: dict[str, dict] = {}
        self._base_version: dict[str, Optional[int]] = {}
        self._done = False

    def writer(self, ident: str) -> _StagedLocalWriter:
        import copy as _copy

        if ident in self._pending:
            from datafusion_iceberg_spark.iceberg.metadata import (
                metadata_from_dict,
            )

            pend = self._pending[ident]
            meta = metadata_from_dict(
                _copy.deepcopy(pend), pend.get("location", "")
            )
        else:
            rel = self._cat._mirror[ident]
            assert isinstance(rel, IcebergTable), f"{ident} is not a table"
            meta = rel.metadata
        from datafusion_iceberg_spark.iceberg.rest_catalog import (
            _writer_kwargs,
        )

        return _StagedLocalWriter(self, ident, **_writer_kwargs(meta))

    # staged operation surface (data now, metadata at commit)
    def append(self, ident: str, spark, df, merge_schema=None) -> int:
        return self.writer(ident).append(spark, df, merge_schema=merge_schema)

    def overwrite(self, ident: str, spark, df) -> int:
        return self.writer(ident).overwrite(spark, df)

    def overwrite_partitions(self, ident: str, spark, df) -> int:
        return self.writer(ident).overwrite_partitions(spark, df)

    def delete_where(self, ident: str, spark, pred) -> int:
        return self.writer(ident).delete(spark, pred)

    def update_where(self, ident: str, spark, pred, set_exprs: dict) -> int:
        return self.writer(ident).update(spark, pred, set_exprs)

    def merge_into(self, ident: str, spark, source, on, **kw) -> int:
        return self.writer(ident).merge(spark, source, on, **kw)

    def upsert(self, ident: str, spark, df, on=None, merge_schema=None) -> int:
        return self.writer(ident).upsert(spark, df, on, merge_schema=merge_schema)

    def add_column(self, ident: str, name: str, dtype, default=None) -> int:
        return self.writer(ident).add_column(name, dtype, default)

    def set_properties(self, ident: str, props: dict) -> None:
        self.writer(ident).set_properties(props)

    def commit(self) -> None:
        from datafusion_iceberg_spark.iceberg.writer import CommitConflict

        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        if not self._pending:
            return
        # phase 1: validate EVERY table before touching any (the
        # all-or-nothing property up to crash tolerance)
        plain: dict[str, IcebergWriter] = {}
        for ident in sorted(self._pending):
            w = self._cat.writer(ident)
            cur = w._current_version()
            base = self._base_version.get(ident)
            if base is not None and cur != base:
                raise CommitConflict(
                    f"transaction conflict: {ident} advanced to metadata "
                    f"version {cur} (read at {base}) — nothing committed"
                )
            w._loaded_version = base if base is not None else cur
            plain[ident] = w
        # phase 1.5: INTENT LOG (VERDICT r9 #7) — one atomically-renamed
        # manifest naming every table's staged metadata and target
        # version, written BEFORE the first table commits; a crash (or
        # late conflict) between table commits rolls FORWARD on the next
        # Catalog() load, restoring all-or-nothing across the loop.
        txn_path = self._cat._write_txn_intent(
            {
                ident: {
                    "target_version": plain[ident]._loaded_version + 1,
                    "metadata": self._pending[ident],
                }
                for ident in sorted(self._pending)
            }
        )
        # phase 2: land the folded metadata, one version per table.  A
        # LIVE failure cleans up its own intent: nothing landed → the
        # manifest is removed and the conflict surfaces as a clean abort
        # (no poisoned warehouse, r10 review find); some landed → the
        # manifest is REWRITTEN to the unfinished tail so the next
        # catalog load rolls the genuinely torn remainder forward.
        landed: list[str] = []
        try:
            for ident in sorted(self._pending):
                plain[ident]._commit_metadata(self._pending[ident])
                landed.append(ident)
        except BaseException:
            if not landed:
                os.remove(txn_path)
            else:
                remaining = {
                    ident: {
                        "target_version": plain[ident]._loaded_version + 1,
                        "metadata": self._pending[ident],
                    }
                    for ident in sorted(self._pending)
                    if ident not in landed
                }
                new_path = self._cat._write_txn_intent(remaining)
                os.remove(txn_path)
                import warnings

                warnings.warn(
                    f"multi-table transaction tore after {landed}: the "
                    f"unfinished tail is recorded in {new_path} and rolls "
                    "forward on the next catalog load"
                )
            raise
        os.remove(txn_path)  # every table landed: intent fulfilled
        for ident in sorted(self._pending):
            rel = self._cat._mirror.get(ident)
            if isinstance(rel, IcebergTable):
                self._cat._mirror[ident] = IcebergTable.load(
                    rel.metadata.root
                )

    def abort(self) -> None:
        self._done = True
        self._pending.clear()

    def __enter__(self) -> "LocalTransaction":
        return self

    def __exit__(self, exc_type, *exc) -> None:
        if exc_type is not None:
            self.abort()
        elif not self._done:
            self.commit()


class Catalog(SqlSurface):
    """Filesystem-warehouse catalog with a dict mirror."""

    def __init__(self, warehouse: str, name: str = "iceberg"):
        self.warehouse = os.path.abspath(warehouse)
        self.name = name
        os.makedirs(self.warehouse, exist_ok=True)
        self._mirror: dict[str, Relation] = {}
        # bare-name temp views THIS catalog created: these must be
        # refreshed on every attach() (tableExists() can't distinguish
        # "pre-existing session view" from "view we made last attach")
        self._bare_views: set[str] = set()
        self._load_mirror()
        if self._recover_txn_intents():
            self._load_mirror()  # recovered tables re-read at their new tip

    # -- multi-table transaction intent log (VERDICT r9 #7) ------------------

    def _txn_dir(self) -> str:
        return os.path.join(self.warehouse, ".txn")

    def _write_txn_intent(self, tables: dict) -> str:
        """Persist one transaction manifest {ident: {target_version,
        metadata}} atomically (tmp + rename: a half-written intent never
        recovers).  Returns the manifest path; the commit loop removes
        it once every table landed."""
        import json as _json
        import uuid as _uuid

        import time as _time

        os.makedirs(self._txn_dir(), exist_ok=True)
        path = os.path.join(self._txn_dir(), f"txn-{_uuid.uuid4()}.json")
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            _json.dump(
                {
                    "tables": tables,
                    "pid": os.getpid(),
                    "created-ms": int(_time.time() * 1000),
                },
                fh,
            )
        os.replace(tmp, path)
        return path

    def _recover_txn_intents(self) -> bool:
        """Roll FORWARD any interrupted multi-table transaction: for each
        surviving intent manifest, commit every table whose target
        metadata version is still missing (exclusive-create, same as the
        live commit loop); a target version that landed with IDENTICAL
        content is treated as done.  A target taken by a FOREIGN commit
        leaves the manifest in place and raises — partial state needs a
        human decision, silently dropping the intent would un-do the
        all-or-nothing contract.  Returns True when anything rolled
        forward."""
        import glob as _glob
        import json as _json

        from datafusion_iceberg_spark.iceberg.writer import CommitConflict

        recovered = False
        for path in sorted(
            _glob.glob(os.path.join(self._txn_dir(), "txn-*.json"))
        ):
            try:
                with open(path) as fh:
                    manifest = _json.load(fh)
            except (OSError, ValueError):
                continue
            # ownership/liveness: a manifest whose writing PROCESS is
            # still alive belongs to an in-flight transaction — rolling
            # it forward would make a mere reader commit another
            # process's data and the live committer report failure (r10
            # review find).  Same-host check (the filesystem catalog is
            # single-host by construction); a reused pid delays recovery
            # to the next load, it never corrupts.
            pid = manifest.get("pid")
            if pid is not None and _pid_alive(int(pid)):
                continue
            for ident, entry in sorted(manifest.get("tables", {}).items()):
                target = int(entry["target_version"])
                staged = entry["metadata"]
                w = self.writer(ident)
                meta_dir = os.path.join(w.root, "metadata")
                existing = None
                for spelling in (
                    f"v{target}.metadata.json",
                    f"v{target}.gz.metadata.json",
                ):
                    p = os.path.join(meta_dir, spelling)
                    if os.path.exists(p):
                        existing = p
                        break
                if existing is not None:
                    if existing.endswith(".gz.metadata.json"):
                        import gzip as _gzip

                        with _gzip.open(existing, "rt") as fh:
                            landed = _json.load(fh)
                    else:
                        with open(existing) as fh:
                            landed = _json.load(fh)
                    if _json.dumps(landed, sort_keys=True) == _json.dumps(
                        staged, sort_keys=True
                    ):
                        continue  # this table already landed pre-crash
                    raise RuntimeError(
                        f"transaction recovery: {ident} metadata v{target} "
                        f"was taken by a foreign commit; resolve manually "
                        f"and delete {path}"
                    )
                w._loaded_version = target - 1
                try:
                    w._commit_metadata(staged)
                    recovered = True
                except CommitConflict:
                    raise RuntimeError(
                        f"transaction recovery: {ident} metadata v{target} "
                        f"raced during roll-forward; re-open the catalog "
                        f"(manifest kept at {path})"
                    )
            os.remove(path)
        return recovered

    # -- mirror build (A15) -------------------------------------------------

    def _load_mirror(self) -> None:
        self._mirror.clear()
        for ns in self.namespaces():
            ns_dir = os.path.join(self.warehouse, ns)
            for entry in sorted(os.listdir(ns_dir)):
                root = os.path.join(ns_dir, entry)
                if not os.path.isdir(os.path.join(root, "metadata")):
                    continue
                key = f"{ns}.{entry}"
                try:
                    if IcebergView.is_view(root):
                        self._mirror[key] = IcebergView.load(root)
                    else:
                        self._mirror[key] = IcebergTable.load(root)
                except (FileNotFoundError, ValueError, KeyError):
                    continue  # half-written table: skip, stay consistent

    # -- namespace ops (A13/A14) --------------------------------------------

    def namespaces(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
            and not d.startswith(".")  # .txn intent dir is not a namespace
        )

    def create_namespace(self, ns: str) -> None:
        os.makedirs(os.path.join(self.warehouse, ns), exist_ok=True)

    def _ns_props_path(self, ns: str) -> str:
        return os.path.join(self.warehouse, ns, ".namespace_properties.json")

    def namespace_properties(self, ns: str) -> dict:
        if not os.path.isdir(os.path.join(self.warehouse, ns)):
            raise KeyError(f"no such namespace: {ns}")
        try:
            with open(self._ns_props_path(ns)) as fh:
                import json as _json

                return _json.load(fh)
        except OSError:
            return {}

    def update_namespace_properties(
        self, ns: str, updates: dict, removals: Optional[list] = None
    ) -> dict:
        """REST-spec shaped: returns {"updated": [...], "removed": [...],
        "missing": [...]} — removals absent from the current properties
        report as missing, matching UpdateNamespacePropertiesResponse."""
        props = self.namespace_properties(ns)
        removed, missing = [], []
        for k in removals or []:
            (removed if k in props else missing).append(k)
            props.pop(k, None)
        props.update({str(k): str(v) for k, v in (updates or {}).items()})
        import json as _json

        tmp = self._ns_props_path(ns) + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(props, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._ns_props_path(ns))
        return {
            "updated": sorted((updates or {}).keys()),
            "removed": sorted(removed),
            "missing": sorted(missing),
        }

    def drop_namespace(self, ns: str) -> None:
        """DROP NAMESPACE: refuses a namespace that still holds tables
        or views (standard RESTRICT semantics — no cascading deletes of
        100 TB of data from one statement)."""
        path = os.path.join(self.warehouse, ns)
        if not os.path.isdir(path):
            raise KeyError(f"no such namespace: {ns}")
        live = [k for k in self._mirror if k.startswith(ns + ".")]
        if live:
            raise ValueError(
                f"namespace {ns} is not empty: {sorted(live)[:5]}"
            )
        import shutil

        shutil.rmtree(path)

    def table_names(self, ns: Optional[str] = None) -> list[str]:
        keys = sorted(self._mirror)
        if ns is None:
            return keys
        return [k for k in keys if k.startswith(ns + ".")]

    def table_exists(self, ident: str) -> bool:
        return ident in self._mirror

    def load(self, ident: str) -> Relation:
        return self._mirror[ident]

    # -- table lifecycle (A16, synchronous) ---------------------------------

    def create_table(
        self,
        ident: str,
        schema: T.StructType,
        partition_by: Optional[list[str]] = None,
        sort_by: Optional[list[str]] = None,
        properties: Optional[dict] = None,
        iceberg_types: Optional[dict] = None,
    ) -> IcebergWriter:
        """``iceberg_types``: per-column overrides of the derived Iceberg
        type for Spark-inexpressible declarations (v3 ``timestamp_ns`` /
        ``timestamptz_ns`` columns ride LongType physically)."""
        ns, name = ident.split(".", 1)
        self.create_namespace(ns)
        root = os.path.join(self.warehouse, ns, name)
        writer = IcebergWriter(root, schema, partition_by, sort_by=sort_by)
        if iceberg_types:
            unknown = set(iceberg_types) - set(writer.iceberg_types)
            if unknown:
                raise ValueError(f"iceberg_types for unknown columns: {sorted(unknown)}")
            writer.iceberg_types.update(iceberg_types)
        writer.create(properties)
        self._mirror[ident] = IcebergTable.load(root)
        return writer

    def writer(self, ident: str) -> IcebergWriter:
        table = self._mirror[ident]
        assert isinstance(table, IcebergTable)
        meta = table.metadata
        return IcebergWriter(
            meta.root,
            meta.struct_type(),
            meta.partition_spec_entries(),
            field_ids=meta.field_ids_by_name(),
            sort_by=meta.sort_order_columns(),
            spec_id=meta.default_spec_id,
            # types verbatim from metadata: nested element/key/value ids
            # must stay the recorded ones, not a fresh re-allocation
            iceberg_types={
                f["name"]: f["type"] for f in meta.current_schema["fields"]
            },
            last_column_id=meta.last_column_id,
            write_defaults={
                f["name"]: f["write-default"]
                for f in meta.current_schema["fields"]
                if f.get("write-default") is not None
            },
        )

    def append(
        self,
        ident: str,
        spark: SparkSession,
        df: DataFrame,
        merge_schema=None,
        wap_id=None,
    ) -> int:
        snap = self.writer(ident).append(
            spark, df, merge_schema=merge_schema, wap_id=wap_id
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)  # refresh snapshot view
        self._maybe_auto_maintain(ident, spark)
        return snap

    def overwrite(self, ident: str, spark: SparkSession, df: DataFrame) -> int:
        """INSERT OVERWRITE (writer.overwrite: single replace snapshot)
        + mirror refresh."""
        snap = self.writer(ident).overwrite(spark, df)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def overwrite_partitions(
        self, ident: str, spark: SparkSession, df: DataFrame
    ) -> int:
        """Dynamic partition overwrite (writer.overwrite_partitions:
        one snapshot replaces only the partitions present in df) +
        mirror refresh; re-plans on concurrent-commit conflicts."""
        snap = self._replan(
            ident, lambda: self.writer(ident).overwrite_partitions(spark, df)
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def transaction(self) -> "LocalTransaction":
        """Atomic multi-table transaction (see LocalTransaction) —
        the filesystem mirror of RestCatalog.transaction()."""
        return LocalTransaction(self)

    def _replan(self, ident: str, fn, attempts: int = 3) -> int:
        """Run a rewrite operation, re-planning on RewriteConflict (the
        writer refuses to commit a rewrite planned against a superseded
        snapshot — see writer.RewriteConflict): refresh the mirror and
        re-run the WHOLE operation against fresh state, bounded.  This
        is Iceberg's commit-retry-with-revalidation at the catalog
        layer; the strict check stays in the writer for direct users."""
        from datafusion_iceberg_spark.iceberg.writer import RewriteConflict

        for attempt in range(attempts):
            try:
                return fn()
            except RewriteConflict:
                if attempt == attempts - 1:
                    raise
                root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
                self._mirror[ident] = IcebergTable.load(root)

    def delete_where(self, ident: str, spark: SparkSession, pred) -> int:
        """Copy-on-write DELETE (writer.delete) + mirror refresh;
        re-plans on concurrent-commit conflicts."""
        snap = self._replan(
            ident, lambda: self.writer(ident).delete(spark, pred)
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def delete_where_mor(self, ident: str, spark: SparkSession, pred) -> int:
        """Merge-on-read DELETE (writer.delete_where_mor: position-delete
        file + content=1 manifest) + mirror refresh; re-plans on
        concurrent-rewrite conflicts."""
        snap = self._replan(
            ident, lambda: self.writer(ident).delete_where_mor(spark, pred)
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def delete_where_dv(self, ident: str, spark: SparkSession, pred) -> int:
        """Merge-on-read DELETE via v3 deletion vectors
        (writer.delete_where_dv: roaring bitmaps in a puffin container,
        one blob per data file) + mirror refresh; re-plans on
        concurrent-rewrite conflicts."""
        snap = self._replan(
            ident, lambda: self.writer(ident).delete_where_dv(spark, pred)
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def delete_where_eq(
        self, ident: str, spark: SparkSession, keys_df: DataFrame
    ) -> int:
        """Merge-on-read EQUALITY DELETE (writer.delete_where_eq: key-tuple
        file + content=2 manifest entries) + mirror refresh."""
        snap = self.writer(ident).delete_where_eq(spark, keys_df)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def set_sort_order(self, ident: str, columns: list) -> None:
        """ALTER TABLE ... WRITE ORDERED BY (writer.set_sort_order:
        new/reused sort order becomes the default for future appends)."""
        self.writer(ident).set_sort_order(columns)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)

    def compute_table_stats(
        self, ident: str, spark: SparkSession, columns: Optional[list] = None
    ) -> dict:
        """Per-column NDV statistics file (writer.compute_table_stats:
        deterministic KMV sketches in puffin, registered under the spec
        ``statistics`` field) + mirror refresh."""
        out = self.writer(ident).compute_table_stats(spark, columns)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return out

    def table_stats(self, ident: str) -> dict:
        """Registered NDV statistics for the current snapshot
        (column → ndv), empty if never computed."""
        return self.writer(ident).table_stats()

    def set_identifier_fields(self, ident: str, columns: list) -> None:
        """Declare the schema's row-identity columns (Iceberg
        identifier-field-ids) — the keys :meth:`upsert` deletes on."""
        self.writer(ident).set_identifier_fields(columns)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)

    def upsert(
        self,
        ident: str,
        spark: SparkSession,
        df: DataFrame,
        on: Optional[list] = None,
        merge_schema=None,
    ) -> int:
        """Flink-style upsert (writer.upsert: one snapshot = equality
        delete on the keys + the batch's data files) + mirror refresh."""
        snap = self.writer(ident).upsert(spark, df, on, merge_schema=merge_schema)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def update_where(
        self, ident: str, spark: SparkSession, pred, set_exprs: dict[str, str]
    ) -> int:
        """Copy-on-write UPDATE (writer.update) + mirror refresh;
        re-plans on concurrent-commit conflicts."""
        snap = self._replan(
            ident, lambda: self.writer(ident).update(spark, pred, set_exprs)
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def update_where_mor(
        self, ident: str, spark: SparkSession, pred, set_exprs: dict[str, str]
    ) -> int:
        """Merge-on-read UPDATE (writer.update_where_mor: one row-delta
        snapshot = position deletes + replacement rows) + mirror
        refresh; re-plans on concurrent-rewrite conflicts."""
        snap = self._replan(
            ident,
            lambda: self.writer(ident).update_where_mor(
                spark, pred, set_exprs
            ),
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def merge_into(
        self,
        ident: str,
        spark: SparkSession,
        source: DataFrame,
        on,
        when_matched_set=None,
        insert_not_matched: bool = True,
        when_matched_delete: bool = False,
        clauses=None,
        merge_schema=None,
        extra_summary=None,
    ) -> int:
        """MERGE INTO (writer.merge; ``on`` may be a composite key list)
        + mirror refresh; re-plans on concurrent-commit conflicts.
        Honors ``write.merge.mode='merge-on-read'`` — one row-delta
        snapshot (writer.merge_mor) instead of the COW rewrite.
        ``clauses`` (a ``writer.MergeClause`` list) carries the full SQL
        clause surface — conditional WHEN clauses, explicit INSERT
        column lists, NOT MATCHED BY SOURCE — and overrides the legacy
        kwargs."""
        mode = (
            self.load(ident)
            .metadata.properties.get("write.merge.mode", "copy-on-write")
            .lower()
        )
        method = "merge_mor" if mode == "merge-on-read" else "merge"
        snap = self._replan(
            ident,
            lambda: getattr(self.writer(ident), method)(
                spark,
                source,
                on,
                when_matched_set,
                insert_not_matched,
                when_matched_delete,
                clauses=clauses,
                merge_schema=merge_schema,
                # both COW merge and merge_mor accept extra_summary —
                # dropping it on the MOR route lost refresh_aggregate_mv's
                # mv.source-snapshot-id marker (r9 ADVICE, medium)
                **({"extra_summary": extra_summary} if extra_summary else {}),
            ),
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        self._maybe_auto_maintain(ident, spark)
        return snap

    def add_column(self, ident: str, name: str, dtype, default=None) -> int:
        """ADD COLUMN evolution (writer.add_column, optional v3
        initial-default) + mirror refresh."""
        fid = self.writer(ident).add_column(name, dtype, default=default)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return fid

    def widen_column(self, ident: str, name: str, new_type) -> None:
        """ALTER COLUMN TYPE widening (writer.widen_column) + mirror
        refresh."""
        self.writer(ident).widen_column(name, new_type)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)

    def rename_column(self, ident: str, old: str, new: str) -> None:
        """RENAME COLUMN evolution (writer.rename_column) + mirror refresh;
        old data files keep the old parquet name and resolve by field id."""
        self.writer(ident).rename_column(old, new)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)

    def drop_column(self, ident: str, name: str) -> None:
        """DROP COLUMN evolution (writer.drop_column) + mirror refresh."""
        self.writer(ident).drop_column(name)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)

    def evolve_partition_spec(
        self, ident: str, partition_by: Optional[list[str]]
    ) -> int:
        """Partition-spec evolution (writer.evolve_partition_spec:
        metadata-only re-partitioning going forward) + mirror refresh."""
        new_id = self.writer(ident).evolve_partition_spec(partition_by)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return new_id

    def rollback_to_snapshot(self, ident: str, snapshot_id: int) -> int:
        """ROLLBACK (writer.rollback_to_snapshot) + mirror refresh."""
        snap = self.writer(ident).rollback_to_snapshot(snapshot_id)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return snap

    def create_changelog_view(
        self,
        ident: str,
        spark: SparkSession,
        changelog_view: Optional[str] = None,
        start_snapshot_id: Optional[int] = None,
        end_snapshot_id: Optional[int] = None,
    ) -> str:
        """Spark-Iceberg ``create_changelog_view`` parity: register the
        row-level CDC frame (table.changelog_df — _change_type /
        _change_ordinal / _commit_snapshot_id columns) as a Spark temp
        view and return its name (default ``<table>_changes``)."""
        table = self.load(ident)
        name = changelog_view or f"{ident.rsplit('.', 1)[-1]}_changes"
        df = table.changelog_df(
            spark,
            from_snapshot_id=(
                int(start_snapshot_id)
                if start_snapshot_id is not None
                else None
            ),
            to_snapshot_id=(
                int(end_snapshot_id) if end_snapshot_id is not None else None
            ),
        )
        df.createOrReplaceTempView(name)
        return name

    def cherrypick_snapshot(self, ident: str, snapshot_id: int) -> int:
        """Apply a staged append snapshot onto current main
        (writer.cherrypick_snapshot) + mirror refresh."""
        snap = self.writer(ident).cherrypick_snapshot(int(snapshot_id))
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return snap

    def publish_changes(self, ident: str, wap_id) -> int:
        """``CALL publish_changes``: cherry-pick the staged snapshot
        carrying this wap.id onto main (writer.publish_changes) + mirror
        refresh."""
        snap = self.writer(ident).publish_changes(str(wap_id))
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return snap

    def rollback_to_timestamp(self, ident: str, ts) -> int:
        """Spark-Iceberg ``rollback_to_timestamp`` parity: roll back to
        the newest snapshot committed AT OR BEFORE ``ts`` (epoch millis,
        or an ISO string parsed as UTC)."""
        if isinstance(ts, str):
            from datetime import datetime, timezone

            dt = datetime.fromisoformat(ts)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            ts = int(dt.timestamp() * 1000)
        meta = self.load(ident).metadata
        eligible = [
            s for s in meta.snapshots if s.timestamp_ms <= int(ts)
        ]
        if not eligible:
            raise ValueError(
                f"rollback_to_timestamp: no snapshot of {ident} at or "
                f"before {ts}"
            )
        target = max(eligible, key=lambda s: s.timestamp_ms)
        return self.rollback_to_snapshot(ident, target.snapshot_id)

    def set_current_snapshot(self, ident: str, snapshot_id: int) -> int:
        """Spark-Iceberg ``set_current_snapshot`` parity: point main at
        ANY listed snapshot (rollback and roll-forward are the same
        metadata move here)."""
        return self.rollback_to_snapshot(ident, int(snapshot_id))

    def stage_append(
        self, ident: str, spark: SparkSession, df: DataFrame, branch: str
    ) -> int:
        """Write-audit-publish step 1: stage an append on ``branch``
        without moving main; audit via ``to_df(ref=branch)``; publish
        with :meth:`fast_forward`."""
        snap = self.writer(ident).append(spark, df, stage_branch=branch)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return snap

    def fast_forward(self, ident: str, branch: str) -> int:
        """Write-audit-publish step 3: advance main to the staged
        branch's snapshot (writer.fast_forward) + mirror refresh."""
        snap = self.writer(ident).fast_forward(branch)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return snap

    def create_tag(
        self, ident: str, name: str, snapshot_id: Optional[int] = None
    ) -> int:
        """Tag a snapshot (default: current) + mirror refresh."""
        sid = self.writer(ident).create_tag(name, snapshot_id)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return sid

    def create_branch(
        self, ident: str, name: str, snapshot_id: Optional[int] = None
    ) -> int:
        """Branch from a snapshot (default: current) + mirror refresh."""
        sid = self.writer(ident).create_branch(name, snapshot_id)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return sid

    def drop_ref(self, ident: str, name: str) -> None:
        self.writer(ident).drop_ref(name)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)

    def compact(
        self, ident: str, spark: SparkSession, target_file_bytes: int = 128 << 20
    ) -> int:
        """Small-file compaction: rewrite current data files to target size
        in a replace snapshot (writer.compact), then refresh the mirror —
        mutation + mirror update stay in lockstep (the reference leaves
        its mirror stale on writes, SURVEY.md §4.4 bug #3)."""
        snap = self._replan(
            ident, lambda: self.writer(ident).compact(spark, target_file_bytes)
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return snap

    def set_properties(
        self, ident: str, updates: dict, removes: Optional[list] = None
    ) -> None:
        """ALTER TABLE SET/UNSET TBLPROPERTIES + mirror refresh."""
        self.writer(ident).set_properties(updates, removes)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)

    def expire_snapshots(
        self,
        ident: str,
        keep_last: int = 1,
        older_than_ms: Optional[int] = None,
    ) -> dict:
        """Snapshot expiry (writer.expire_snapshots) + mirror refresh —
        the refresh matters here: the mirror's cached snapshot list
        would otherwise still offer expired snapshots for time travel."""
        out = self.writer(ident).expire_snapshots(keep_last, older_than_ms)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return out


    def compact_binpack(
        self, ident: str, spark: SparkSession, *args, **kw
    ) -> dict:
        """Selective small-file compaction (writer.compact_binpack) +
        mirror refresh; skipped commits leave the mirror untouched."""
        out = self._replan(
            ident,
            lambda: self.writer(ident).compact_binpack(spark, *args, **kw),
        )
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return out

    def refresh(self, ident: str) -> None:
        """Reload the mirror entry from storage (REFRESH TABLE): needed
        after an EXTERNAL writer commits — only this catalog's own
        mutators refresh the cached view."""
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)

    def ancestors_of(self, ident: str, snapshot_id=None) -> dict:
        """Spark-Iceberg ``CALL ancestors_of`` parity: the parent chain
        from the given snapshot (default: current) back to the table's
        first commit, as {snapshot_id: timestamp_ms}.  Metadata-only."""
        meta = self.load(ident).metadata
        by_id = {s.snapshot_id: s for s in meta.snapshots}
        cur = (
            int(snapshot_id)
            if snapshot_id is not None
            else meta.current_snapshot_id
        )
        out: dict = {}
        while cur is not None and cur in by_id:
            s = by_id[cur]
            out[s.snapshot_id] = s.timestamp_ms
            cur = s.parent_id
        if not out:
            raise ValueError(
                f"ancestors_of: snapshot {snapshot_id!r} not found in {ident}"
            )
        return out

    def table_health(self, ident: str) -> dict:
        """Metadata-derived health report — the signals a scheduled
        maintenance job triages on, computed with ZERO data IO:
        data-file count and average size, small-file ratio (< 1/4 of
        the 128 MB target), delete-file and DV-container counts,
        manifest and snapshot counts, and whether partition statistics
        are stale for the current snapshot."""
        t = self._mirror[ident]
        assert isinstance(t, IcebergTable)
        meta = t.metadata
        files = list(t.files())
        n = len(files)
        total = sum(f.file_size_in_bytes or 0 for f in files)
        small = sum(
            1
            for f in files
            if (f.file_size_in_bytes or 0) < 32 * 1024 * 1024
        )
        dels = t.position_delete_files()
        dv_containers = {
            d.path for d in dels if d.referenced_data_file is not None
        }
        n_pos_parquet = sum(
            1 for d in dels if d.referenced_data_file is None
        )
        cur = meta.raw.get("current-snapshot-id")
        stats_fresh = any(
            s.get("snapshot-id") == cur
            for s in meta.raw.get("partition-statistics", [])
        )
        return {
            "data_files": n,
            "avg_file_bytes": int(total / n) if n else 0,
            "small_file_ratio": round(small / n, 4) if n else 0.0,
            "position_delete_files": n_pos_parquet,
            "equality_delete_files": len(t.equality_delete_files()),
            "dv_containers": len(dv_containers),
            "manifests": len(t.manifests()),
            "snapshots": len(meta.snapshots),
            "partition_stats_stale": bool(
                meta.partition_spec_entries()
            ) and not stats_fresh,
        }

    def maintain(
        self,
        ident: str,
        spark: SparkSession,
        small_file_ratio: float = 0.5,
        min_files: int = 8,
        max_dv_containers: int = 8,
        max_position_delete_files: int = 8,
        max_manifests: int = 8,
    ) -> dict:
        """Policy-driven auto-maintenance: read :meth:`table_health`,
        run ONLY the operations the thresholds call for, and report
        what ran — the one-call form of the maintenance a 100 TB
        deployment schedules nightly (each underlying op is the same
        CALL procedure a human would run; this just triages).

        Order matters: data compaction first (folds deletes, so the
        delete-side rewrites become no-ops when it runs), then DV /
        position-delete consolidation, manifest collapse, and a
        partition-stats refresh last (keyed to the final snapshot)."""
        before = self.table_health(ident)
        ran: dict = {"before": before}
        if (
            before["data_files"] >= min_files
            and before["small_file_ratio"] >= small_file_ratio
        ):
            # the file-count floor keeps the policy from re-compacting a
            # table whose files are simply small-data small (compaction
            # of 3 files buys nothing and never converges the ratio).
            # SELECTIVE binpack, not the full rewrite: scheduled
            # maintenance must cost ∝ small-file bytes, not the table
            out = self.compact_binpack(ident, spark)
            ran["compacted"] = out["rewritten_files"] > 0
            ran["compaction"] = out
        h = self.table_health(ident)
        if h["dv_containers"] > max_dv_containers:
            ran["dv_rewrite"] = self.rewrite_deletion_vectors(ident)
        if h["position_delete_files"] > max_position_delete_files:
            ran["position_delete_rewrite"] = self.rewrite_position_deletes(
                ident, spark
            )
        h = self.table_health(ident)
        if (
            h["manifests"] > max_manifests
            and not h["dv_containers"]
            and not h["position_delete_files"]
            and not h["equality_delete_files"]
        ):
            ran["manifest_rewrite"] = self.rewrite_manifests(ident)
        if self.table_health(ident)["partition_stats_stale"]:
            ran["partition_stats"] = self.compute_partition_stats(ident)
        ran["after"] = self.table_health(ident)
        return ran

    def _maybe_auto_maintain(
        self, ident: str, spark: SparkSession
    ) -> Optional[dict]:
        """Opt-in automatic maintenance: when the table property
        ``maintenance.auto-after-commits=N`` is set, every Nth snapshot
        (stateless cadence: ``len(snapshots) % N == 0``, so it survives
        catalog restarts) runs the :meth:`maintain` triage after the
        commit that landed.  The triage itself is zero-IO
        (:meth:`table_health` reads only cached metadata); data work
        runs only when thresholds trip.  Re-entrancy-guarded —
        maintenance's own commits (compaction, DV rewrite) never
        re-trigger it.  Failures are swallowed into the returned report:
        background hygiene must never fail the user's commit."""
        if getattr(self, "_in_auto_maintain", False):
            return None
        t = self._mirror.get(ident)
        if not isinstance(t, IcebergTable):
            return None
        raw = t.metadata.properties.get("maintenance.auto-after-commits")
        if not raw:
            return None
        try:
            n = int(raw)
        except ValueError:
            return None
        if n <= 0 or len(t.metadata.snapshots) % n != 0:
            return None
        self._in_auto_maintain = True
        try:
            return self.maintain(ident, spark)
        except Exception as e:  # pragma: no cover - defensive
            return {"error": str(e)}
        finally:
            self._in_auto_maintain = False

    def vacuum(
        self,
        ident: str,
        keep_last: int = 1,
        older_than_ms: Optional[int] = None,
        min_age_ms: int = 0,
    ) -> dict:
        """One-call table hygiene: expire old snapshots, drop orphan
        files, and collapse manifests — the composition every scheduled
        maintenance job runs.  Manifest rewrite is skipped (reported,
        not failed) while delete manifests are outstanding."""
        out = {}
        out.update(self.expire_snapshots(ident, keep_last, older_than_ms))
        out.update(self.remove_orphan_files(ident, min_age_ms=min_age_ms))
        try:
            rw = self.rewrite_manifests(ident)
            out["manifests_before"] = rw["manifests_before"]
            out["manifests_after"] = rw["manifests_after"]
        except ValueError as e:
            out["manifests_skipped"] = str(e)
        return out

    def refresh_mv(self, ident: str, spark: SparkSession) -> dict:
        """Refresh a changelog-maintained MV (iceberg/mv.py) — routes on
        the MV's kind: join MVs take the fact-delta/dim-rebuild path."""
        from datafusion_iceberg_spark.iceberg.mv import (
            refresh_aggregate_mv,
            refresh_join_mv,
        )

        props = self.load(ident).metadata.properties
        if props.get("mv.kind") == "join":
            return refresh_join_mv(self, spark, ident)
        return refresh_aggregate_mv(self, spark, ident)

    def rewrite_position_deletes(self, ident: str, spark: SparkSession) -> dict:
        """Merge accumulated position-delete files into one
        (writer.rewrite_position_deletes) + mirror refresh."""
        out = self.writer(ident).rewrite_position_deletes(spark)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return out

    def compute_partition_stats(self, ident: str) -> dict:
        """Write + register the partition statistics file for the
        current snapshot (writer.compute_partition_stats) + mirror
        refresh."""
        out = self.writer(ident).compute_partition_stats()
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return out

    def rewrite_deletion_vectors(self, ident: str) -> dict:
        """Consolidate carry-forward deletion-vector containers into one
        (writer.rewrite_deletion_vectors) + mirror refresh."""
        out = self.writer(ident).rewrite_deletion_vectors()
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return out

    def convert_position_deletes_to_dvs(self, ident: str) -> dict:
        """Iceberg v3 migration: all outstanding position-type deletes
        (parquet + existing DVs) → one DV puffin container
        (writer.convert_position_deletes_to_dvs) + mirror refresh."""
        out = self.writer(ident).convert_position_deletes_to_dvs()
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return out

    def add_files(self, ident: str, source_dir: str) -> dict:
        """Register existing parquet files into the table in place
        (writer.add_files) + mirror refresh — the plain-parquet-to-
        Iceberg migration path."""
        out = self.writer(ident).add_files(source_dir)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return out

    def remove_orphan_files(
        self, ident: str, dry_run: bool = False, min_age_ms: int = 0
    ) -> dict:
        """Orphan-file cleanup (writer.remove_orphan_files) — metadata
        unchanged, so no mirror refresh needed."""
        return self.writer(ident).remove_orphan_files(dry_run, min_age_ms)

    def rewrite_manifests(self, ident: str) -> dict:
        """Metadata-only manifest compaction (writer.rewrite_manifests)
        + mirror refresh."""
        out = self.writer(ident).rewrite_manifests()
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return out

    def rewrite_zorder(
        self,
        ident: str,
        spark: SparkSession,
        columns: list,
        target_file_bytes: int = 128 << 20,
    ) -> int:
        """Z-order clustering rewrite (writer.rewrite_zorder) + mirror
        refresh."""
        snap = self.writer(ident).rewrite_zorder(spark, columns, target_file_bytes)
        root = self._mirror[ident].metadata.root  # type: ignore[union-attr]
        self._mirror[ident] = IcebergTable.load(root)
        return snap

    def create_view(self, ident: str, sql: str) -> IcebergView:
        ns, name = ident.split(".", 1)
        self.create_namespace(ns)
        root = os.path.join(self.warehouse, ns, name)
        view = IcebergView.create(root, sql)
        self._mirror[ident] = view
        return view

    def replace_view(self, ident: str, sql: str) -> IcebergView:
        """CREATE OR REPLACE VIEW as a NEW VIEW VERSION (Iceberg view
        spec): the version log keeps every prior SQL body; readers of
        old metadata versions still see their SQL."""
        view = self._mirror[ident]
        assert isinstance(view, IcebergView), f"{ident} is not a view"
        view.replace(sql)
        self._mirror[ident] = view
        return view

    def rename_table(self, src: str, dst: str) -> None:
        """Move a table to a new identifier: one directory rename inside
        the warehouse.  Recorded metadata paths keep resolving because
        every read goes through TableMetadata.localize (location-relative
        mapping), and writers derive paths from the actual root."""
        rel = self._mirror.pop(src)
        assert isinstance(rel, IcebergTable), f"{src} is not a table"
        ns, name = dst.split(".", 1)
        self.create_namespace(ns)
        dst_root = os.path.join(self.warehouse, ns, name)
        if dst in self._mirror or os.path.exists(dst_root):
            self._mirror[src] = rel
            raise ValueError(f"cannot rename {src}: {dst} already exists")
        os.rename(rel.metadata.root, dst_root)
        self._mirror[dst] = IcebergTable.load(dst_root)

    def drop(self, ident: str) -> None:
        """Synchronous drop: mirror AND storage, atomically from the
        caller's perspective (contrast mirror.rs:146-184 where the storage
        call is spawned and never polled)."""
        rel = self._mirror.pop(ident)
        root = rel.metadata.root if isinstance(rel, IcebergTable) else rel.root
        shutil.rmtree(root, ignore_errors=True)

    # -- Spark integration --------------------------------------------------

    # metadata-sized tables get a broadcast hint at registration — this is
    # the Spark rendering of the reference feeding Statistics{num_rows,
    # is_exact} into its planner (statistics.rs:8-49): the planner input
    # is our MANIFEST stats, not a runtime sample, so dimension tables
    # broadcast even when the SQL author writes no hint.
    BROADCAST_BYTES = 64 * 1024 * 1024

    def attach(
        self,
        spark: SparkSession,
        snapshot_id: Optional[int] = None,
        keys: Optional[list] = None,
    ) -> None:
        """Register relations as temp views ``<ns>_<table>`` (and the
        bare table name when unambiguous) so SQL can address the catalog —
        the flattened-name analogue of 3-part resolution
        (catalog.rs:114-117).  Tables whose manifest-stat footprint is
        under BROADCAST_BYTES register with a broadcast hint.  ``keys``
        restricts registration to those idents (sql() passes the
        statement's referenced superset, r10 — attach cost tracks the
        statement, not the warehouse); None registers everything."""
        bare_counts: dict[str, int] = {}
        for key in self._relation_keys():
            bare = key.split(".", 1)[1]
            bare_counts[bare] = bare_counts.get(bare, 0) + 1
        # tables first, then views (a view's SQL may reference the tables)
        wanted = (
            self._mirror.items()
            if keys is None
            else [(k, self._rel(k)) for k in keys]
        )
        items = sorted(
            wanted, key=lambda kv: isinstance(kv[1], IcebergView)
        )
        if not hasattr(self, "_attached_tokens"):
            self._attached_tokens: dict = {}
        pins = getattr(self, "_script_pins", None)
        for key, rel in items:
            ns, bare = key.split(".", 1)
            pinned = (
                pins is not None
                and key in pins
                and isinstance(rel, IcebergTable)
            )
            if pinned and pins[key] is not None:
                # multi-statement script: REPEATABLE READ — every
                # statement reads the snapshot captured at script entry
                # (own writes re-pin via sql()'s script loop)
                df = rel.to_df(spark, snapshot_id=pins[key])
            else:
                df = rel.to_df(spark)
            if isinstance(rel, IcebergTable):
                stats = rel.statistics()
                if 0 < stats.get("total_bytes", 0) < self.BROADCAST_BYTES:
                    df = df.hint("broadcast")
            df.createOrReplaceTempView(f"{ns}_{bare}")
            # a pinned registration records a sentinel token so the
            # FIRST post-script sql() always re-attaches the live view
            self._attached_tokens[key] = (
                ("script-pin", pins[key]) if pinned else _rel_token(rel)
            )
            # bare-name convenience view ONLY when it would not shadow an
            # existing temp view: the session may already expose a base
            # table under this name (the harness does for every testdata
            # table), and silently replacing it would redirect every
            # later query in the session to this catalog's copy.  Views we
            # created ourselves on a prior attach() ARE refreshed — else
            # the bare name would keep serving the file list frozen at
            # first attach after any append/delete/evolution.
            if bare_counts[bare] == 1 and (
                bare in self._bare_views or not spark.catalog.tableExists(bare)
            ):
                df.createOrReplaceTempView(bare)
                self._bare_views.add(bare)

