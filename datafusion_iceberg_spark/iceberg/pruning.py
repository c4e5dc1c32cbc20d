"""Two-level statistics pruning (SURVEY.md §2A A2-A5) — the reference's
``PruningStatistics`` machinery (datafusion_iceberg/src/
pruning_statistics.rs:34-196) rebuilt as a conservative driver-side
interval evaluator.

Design invariants (mirroring the reference's, minus its bugs):

- **Conservative**: a predicate evaluates to "maybe" whenever bounds are
  missing or the operator is unsupported ⇒ the file is KEPT.  Correctness
  never depends on pruning — Spark re-applies the full filter after the
  scan (reference: filters forwarded to ParquetExec, table.rs:291-293).
- **Field-ID keyed**: bounds are looked up by Iceberg field ID via the
  schema (reference bug #1, SURVEY.md §4.4).
- Runs on the driver *before* any DataFrame exists, so no Catalyst rule
  is involved — this is metadata pruning, one level above the row-group
  pruning Spark's parquet reader does on its own.

Predicates are a tiny tuple AST (also convertible to a Spark SQL string
for re-filtering)::

    ("and", p, q) ("or", p, q) ("not", p)
    ("=" | "!=" | "<" | "<=" | ">" | ">=", col, value)
    ("in", col, [v, ...])  ("between", col, lo, hi)
    ("isnull", col)  ("notnull", col)
"""

from __future__ import annotations

from typing import Any, Optional

from datafusion_iceberg_spark.iceberg.manifests import DataFile, ManifestFile
from datafusion_iceberg_spark.iceberg.metadata import TableMetadata
from datafusion_iceberg_spark.iceberg.stats import decode_stat

Pred = tuple


class ColumnStats:
    """Decoded (lower, upper, null_count, value_count) for one column of
    one container (file or manifest-partition-summary)."""

    __slots__ = ("lower", "upper", "null_count", "value_count")

    def __init__(self, lower, upper, null_count, value_count):
        self.lower = lower
        self.upper = upper
        self.null_count = null_count
        self.value_count = value_count


MAYBE = None  # three-valued logic: True=always, False=never, None=maybe


def _cmp_maybe(op: str, st: ColumnStats, v: Any) -> Optional[bool]:
    """Can `col <op> v` be true for any row given [lower, upper]?"""
    lo, hi = st.lower, st.upper
    if v is None:
        return False  # comparisons with NULL match nothing
    try:
        if op == "=":
            if lo is not None and lo > v:
                return False
            if hi is not None and hi < v:
                return False
            return MAYBE
        if op == "<":
            if lo is not None and lo >= v:
                return False
            return MAYBE
        if op == "<=":
            if lo is not None and lo > v:
                return False
            return MAYBE
        if op == ">":
            if hi is not None and hi <= v:
                return False
            return MAYBE
        if op == ">=":
            if hi is not None and hi < v:
                return False
            return MAYBE
        if op == "!=":
            # only prunable when the file is a single constant == v
            if lo is not None and hi is not None and lo == hi == v:
                if not st.null_count:
                    return False
            return MAYBE
    except TypeError:
        return MAYBE  # incomparable types (e.g. decoded None) → keep
    return MAYBE


def evaluate(pred: Pred, stats: dict[str, ColumnStats]) -> Optional[bool]:
    """Three-valued 'can any row match?'.  False ⇒ container provably
    empty for the predicate ⇒ safe to skip."""
    op = pred[0]
    if op == "maybe":  # sentinel from transform rewriting: always keep
        return MAYBE
    if op == "and":
        results = [evaluate(p, stats) for p in pred[1:]]
        if any(r is False for r in results):
            return False
        if all(r is True for r in results):
            return True
        return MAYBE
    if op == "or":
        results = [evaluate(p, stats) for p in pred[1:]]
        if any(r is not False for r in results):
            return MAYBE if not all(r is True for r in results) else True
        return False
    if op == "not":
        inner = pred[1]
        if inner[0] == "isnull":
            return evaluate(("notnull", inner[1]), stats)
        if inner[0] == "notnull":
            return evaluate(("isnull", inner[1]), stats)
        return MAYBE  # conservative: cannot invert interval logic safely
    col = pred[1]
    st = stats.get(col)
    if st is None:
        return MAYBE  # no stats for this column → keep
    if op == "isnull":
        if st.null_count == 0 and st.null_count is not None:
            return False
        return MAYBE
    if op == "notnull":
        if (
            st.null_count is not None
            and st.value_count is not None
            and st.null_count == st.value_count
        ):
            return False
        return MAYBE
    if op == "in":
        results = [_cmp_maybe("=", st, v) for v in pred[2]]
        if all(r is False for r in results):
            return False
        return MAYBE
    if op == "between":
        lo_ok = _cmp_maybe(">=", st, pred[2])
        hi_ok = _cmp_maybe("<=", st, pred[3])
        if lo_ok is False or hi_ok is False:
            return False
        return MAYBE
    if op in ("=", "!=", "<", "<=", ">", ">="):
        return _cmp_maybe(op, st, pred[2])
    return MAYBE  # unknown operator → keep (conservative)


def pred_to_sql(pred: Pred) -> str:
    """Render the tuple AST as a Spark SQL boolean expression (for the
    exactness re-filter after pruning)."""

    def lit(v: Any) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if hasattr(v, "isoformat"):
            s = v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
            kind = "TIMESTAMP" if hasattr(v, "hour") else "DATE"
            return f"{kind} '{s}'"
        return repr(v)

    op = pred[0]
    if op in ("and", "or"):
        return "(" + f" {op.upper()} ".join(pred_to_sql(p) for p in pred[1:]) + ")"
    if op == "not":
        return f"(NOT {pred_to_sql(pred[1])})"
    col = f"`{pred[1]}`"
    if op == "isnull":
        return f"({col} IS NULL)"
    if op == "notnull":
        return f"({col} IS NOT NULL)"
    if op == "in":
        return f"({col} IN (" + ", ".join(lit(v) for v in pred[2]) + "))"
    if op == "between":
        return f"({col} BETWEEN {lit(pred[2])} AND {lit(pred[3])})"
    return f"({col} {op} {lit(pred[2])})"


def sql_to_pred(where: str) -> Optional[Pred]:
    """Parse a SQL WHERE clause into the tuple AST (the inverse of
    :func:`pred_to_sql`), so the SQL DML surface (``DELETE FROM`` /
    ``UPDATE``) can drive file-level pruning from the user's predicate.

    Only the prunable subset is accepted: comparisons, ``[NOT] IN``,
    ``[NOT] BETWEEN``, ``IS [NOT] NULL``, ``AND/OR/NOT``, parentheses,
    and string/number/bool/DATE/TIMESTAMP literals.  Anything else —
    function calls, arithmetic, subqueries — returns ``None``, and the
    caller must treat every file as a candidate (pruning is an
    optimization; the exact SQL string is always re-applied row-wise)."""
    import datetime as _dt
    import re as _re

    tok_re = _re.compile(
        r"\s*(?:"
        r"(?P<str>'(?:[^']|'')*')"
        r"|(?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
        r"|(?P<qid>`[^`]+`)"
        r"|(?P<word>[A-Za-z_]\w*)"
        r"|(?P<op><=|>=|!=|<>|=|<|>|\(|\)|,)"
        r")"
    )

    def tokenize(s: str) -> Optional[list[tuple[str, Any]]]:
        out: list[tuple[str, Any]] = []
        pos = 0
        while pos < len(s):
            m = tok_re.match(s, pos)
            if m is None:
                return None if s[pos:].strip() else out
            pos = m.end()
            if m.group("str") is not None:
                out.append(("lit", m.group("str")[1:-1].replace("''", "'")))
            elif m.group("num") is not None:
                t = m.group("num")
                out.append(("lit", float(t) if ("." in t or "e" in t.lower()) else int(t)))
            elif m.group("qid") is not None:
                out.append(("ident", m.group("qid")[1:-1]))
            elif m.group("word") is not None:
                w = m.group("word")
                kw = w.upper()
                if kw in ("AND", "OR", "NOT", "IN", "BETWEEN", "IS", "NULL"):
                    out.append(("kw", kw))
                elif kw in ("TRUE", "FALSE"):
                    out.append(("lit", kw == "TRUE"))
                elif kw in ("DATE", "TIMESTAMP"):
                    out.append(("kw", kw))
                else:
                    out.append(("ident", w))
            else:
                out.append(("op", m.group("op")))
        return out

    toks = tokenize(where)
    if not toks:
        return None
    i = 0

    class Bail(Exception):
        pass

    def peek(k: int = 0):
        return toks[i + k] if i + k < len(toks) else ("eof", None)

    def take(kind: str, val=None):
        nonlocal i
        t = peek()
        if t[0] != kind or (val is not None and t[1] != val):
            raise Bail()
        i += 1
        return t[1]

    def literal():
        nonlocal i
        t = peek()
        if t == ("kw", "NULL"):
            i += 1
            return None
        if t[0] == "kw" and t[1] in ("DATE", "TIMESTAMP"):
            kind = t[1]
            i += 1
            s = take("lit")
            if not isinstance(s, str):
                raise Bail()
            try:
                if kind == "DATE":
                    return _dt.date.fromisoformat(s)
                return _dt.datetime.fromisoformat(s)
            except ValueError:
                raise Bail()
        if t[0] == "lit":
            i += 1
            return t[1]
        raise Bail()

    def predicate():
        nonlocal i
        # literal <op> ident  (flipped spelling)
        if peek()[0] == "lit" or peek() in (("kw", "DATE"), ("kw", "TIMESTAMP")):
            v = literal()
            op = take("op")
            if op not in ("=", "!=", "<>", "<", "<=", ">", ">="):
                raise Bail()
            col = take("ident")
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            op = "!=" if op == "<>" else op
            return (flip.get(op, op), col, v)
        col = take("ident")
        t = peek()
        if t == ("kw", "IS"):
            i += 1
            if peek() == ("kw", "NOT"):
                i += 1
                take("kw", "NULL")
                return ("notnull", col)
            take("kw", "NULL")
            return ("isnull", col)
        negate = False
        if t == ("kw", "NOT"):
            i += 1
            negate = True
            t = peek()
        if t == ("kw", "IN"):
            i += 1
            take("op", "(")
            vals = [literal()]
            while peek() == ("op", ","):
                i += 1
                vals.append(literal())
            take("op", ")")
            node = ("in", col, vals)
            return ("not", node) if negate else node
        if t == ("kw", "BETWEEN"):
            i += 1
            lo = literal()
            take("kw", "AND")
            hi = literal()
            node = ("between", col, lo, hi)
            return ("not", node) if negate else node
        if negate:
            raise Bail()
        op = take("op")
        if op not in ("=", "!=", "<>", "<", "<=", ">", ">="):
            raise Bail()
        return ("!=" if op == "<>" else op, col, literal())

    def unary():
        nonlocal i
        if peek() == ("kw", "NOT"):
            # NOT <predicate-or-parens>, but `col NOT IN` never reaches
            # here (predicate() consumes it after the identifier)
            i += 1
            return ("not", unary())
        if peek() == ("op", "("):
            i += 1
            node = disjunction()
            take("op", ")")
            return node
        return predicate()

    def conjunction():
        nonlocal i
        node = unary()
        while peek() == ("kw", "AND"):
            i += 1
            node = ("and", node, unary())
        return node

    def disjunction():
        nonlocal i
        node = conjunction()
        while peek() == ("kw", "OR"):
            i += 1
            node = ("or", node, conjunction())
        return node

    try:
        out = disjunction()
        if i != len(toks):
            return None
        return out
    except Bail:
        return None


def referenced_columns(pred: Pred) -> set[str]:
    op = pred[0]
    if op in ("and", "or", "not"):
        out: set[str] = set()
        for p in pred[1:]:
            out |= referenced_columns(p)
        return out
    return {pred[1]}


# --------------------------------------------------------------------------
# Level 1: manifest pruning via partition summaries  (A2)
# --------------------------------------------------------------------------


def prune_manifests(
    manifests: list[ManifestFile], pred: Optional[Pred], meta: TableMetadata
) -> list[ManifestFile]:
    """Keep manifests whose partition-summary ranges may satisfy pred.
    Summaries are positional per partition-spec field; values decode with
    the *source column's* type (reference consumes the same summaries at
    pruning_statistics.rs:49-70 but looks types up by position — we key by
    source field ID)."""
    if pred is None:
        return manifests
    from datafusion_iceberg_spark.iceberg.transforms import (
        result_iceberg_type,
        rewrite_pred,
    )

    types_by_id = meta.types_by_field_id()

    # Summaries are positional per the MANIFEST'S OWN spec (a table whose
    # spec evolved carries manifests under several spec ids); the
    # rewritten predicate and column alignment are cached per spec id.
    # Unknown spec id → no stats → conservative keep.
    per_spec: dict[int, tuple] = {}

    def spec_ctx(spec_id: int):
        if spec_id not in per_spec:
            fields = meta.partition_fields_for_spec(spec_id)
            if fields is None:
                per_spec[spec_id] = None
            else:
                part_cols = meta.partition_column_names(spec_id)
                eff_pred = pred
                transformed: dict[int, str] = {}
                for i, pf in enumerate(fields):
                    if pf.transform != "identity":
                        transformed[i] = pf.transform
                        eff_pred = rewrite_pred(eff_pred, part_cols[i], pf.transform)
                per_spec[spec_id] = (fields, part_cols, eff_pred, transformed)
        return per_spec[spec_id]

    kept = []
    for mf in manifests:
        ctx = spec_ctx(mf.partition_spec_id)
        if ctx is None:
            kept.append(mf)  # unknown spec — cannot interpret summaries
            continue
        fields, part_cols, eff_pred, transformed = ctx
        stats: dict[str, ColumnStats] = {}
        for i, pf in enumerate(fields):
            if i >= len(mf.partitions):
                continue  # no summary for this field → no stats
            ps = mf.partitions[i]
            t = types_by_id.get(pf.source_id)
            if t is None or not isinstance(t, str):
                continue
            if i in transformed:
                t = result_iceberg_type(pf.transform, t)
            stats[part_cols[i]] = ColumnStats(
                decode_stat(t, ps.lower_bound),
                decode_stat(t, ps.upper_bound),
                0 if not ps.contains_null else None,
                None,
            )
        if evaluate(eff_pred, stats) is not False:
            kept.append(mf)
    return kept


# --------------------------------------------------------------------------
# Level 2: data-file pruning via per-column bounds  (A3 + A4)
# --------------------------------------------------------------------------


def prune_data_files(
    files: list[DataFile], pred: Optional[Pred], meta: TableMetadata
) -> list[DataFile]:
    """Keep data files whose per-column [lower, upper] / null counts may
    satisfy pred.  Bounds maps are keyed by field ID (spec) and looked up
    through the name→ID schema mapping."""
    if pred is None:
        return files
    from datafusion_iceberg_spark.iceberg.transforms import rewrite_pred

    ids_by_name = meta.field_ids_by_name()
    types_by_id = meta.types_by_field_id()
    cols = referenced_columns(pred)

    # Non-identity partition transforms: each file carries its exact
    # partition tuple, so evaluate the transformed-domain predicate
    # against point stats (lower == upper == the file's partition value).
    # This is a SECOND, independent pass — the raw predicate keeps using
    # raw footer bounds; mixing the two domains in one stats dict would
    # be unsound.  The rewrite is per the FILE'S spec (cached by spec id)
    # so a spec-evolved table never evaluates a file's partition tuple
    # under the wrong transform; unknown spec → skip the pass.
    per_spec: dict[int, tuple] = {}

    def tf_ctx(spec_id: int):
        if spec_id not in per_spec:
            fields = meta.partition_fields_for_spec(spec_id)
            if fields is None:
                per_spec[spec_id] = (pred, [], [])
            else:
                part_cols = meta.partition_column_names(spec_id)
                tf_pred = pred
                tf_fields = []  # (source_col_name, partition_field_name)
                id_fields = []  # identity fields: partition value IS the value
                for i, pf in enumerate(fields):
                    if pf.transform != "identity":
                        tf_pred = rewrite_pred(tf_pred, part_cols[i], pf.transform)
                        tf_fields.append((part_cols[i], pf.name))
                    else:
                        id_fields.append((part_cols[i], pf.name))
                per_spec[spec_id] = (tf_pred, tf_fields, id_fields)
        return per_spec[spec_id]

    def _rehydrate(raw, ice_t):
        """Manifest partition values for date/timestamp are epoch ints
        (Avro logical types) while decode_stat's domain is python
        date/datetime — rehydrate before using one as a point stat."""
        if isinstance(raw, int) and isinstance(ice_t, str):
            from datetime import timedelta, timezone

            from datafusion_iceberg_spark.iceberg.stats import (
                EPOCH_DATE,
                EPOCH_TS,
            )

            if ice_t == "date":
                return EPOCH_DATE + timedelta(days=raw)
            if ice_t in ("timestamp_ns", "timestamptz_ns"):
                # v3 ns-timestamps: decode_stat deliberately leaves the
                # raw int64 nanos undecoded (stats.py) — the predicate
                # domain is the integer, so the partition value must
                # stay raw too (mirrors decode_stat's dispatch order).
                return raw
            if ice_t.startswith("timestamptz"):
                # decode_stat's timestamptz domain is tz-AWARE — a naive
                # point stat would TypeError against aware predicate
                # literals and the evaluator would keep every file
                return EPOCH_TS.replace(tzinfo=timezone.utc) + timedelta(
                    microseconds=raw
                )
            if ice_t.startswith("timestamp"):
                return EPOCH_TS + timedelta(microseconds=raw)
        return raw

    kept = []
    for f in files:
        stats: dict[str, ColumnStats] = {}
        for name in cols:
            fid = ids_by_name.get(name)
            if fid is None:
                continue
            t = types_by_id.get(fid)
            if not isinstance(t, str):
                continue
            stats[name] = ColumnStats(
                decode_stat(t, f.lower_bounds.get(fid)),
                decode_stat(t, f.upper_bounds.get(fid)),
                f.null_value_counts.get(fid),
                f.value_counts.get(fid),
            )
        tf_pred, tf_fields, id_fields = tf_ctx(f.spec_id)
        # Identity partition values are exact per-file constants: when a
        # referenced column has no footer bounds (directory-style files —
        # Hive migrations, foreign ORC writers — never stamp them), the
        # partition tuple IS a point stat [v, v].  Footer bounds, when
        # present, are identical or tighter, so they win.
        for src, fname in id_fields:
            if src not in cols:
                continue
            cur = stats.get(src)
            if cur is not None and (
                cur.lower is not None or cur.upper is not None
            ):
                continue
            if fname in f.partition:
                pv = f.partition[fname]
                if pv is None:
                    # whole file is NULL in this column: rows can only
                    # match IS NULL-shaped predicates; a [None,None]
                    # bound with null_count=value_count conveys exactly
                    # that when counts are known, else stay conservative
                    continue
                fid = ids_by_name.get(src)
                pv = _rehydrate(pv, types_by_id.get(fid))
                stats[src] = ColumnStats(
                    pv,
                    pv,
                    f.null_value_counts.get(fid, 0),
                    f.value_counts.get(fid),
                )
        if evaluate(pred, stats) is False:
            continue
        if tf_fields:
            tf_stats = {
                src: ColumnStats(pv, pv, 0, None)
                for src, fname in tf_fields
                if (pv := f.partition.get(fname)) is not None
            }
            if evaluate(tf_pred, tf_stats) is False:
                continue
        kept.append(f)
    return kept
