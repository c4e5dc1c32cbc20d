"""SQL DML/DDL for the catalog SQL surface: ``INSERT INTO/OVERWRITE``,
``DELETE FROM``, ``UPDATE``, ``MERGE INTO``, ``CREATE TABLE [AS]``,
``CREATE VIEW``, ``DROP TABLE/VIEW``, ``ALTER TABLE ADD/RENAME/DROP
COLUMN`` on three-part catalog names.

The reference is read-only (its ``TableProvider`` never implements
``insert_into``; SURVEY.md §2C), so this whole surface is
beyond-reference — but it is what every SQL user of an Iceberg catalog
expects, and it simply dispatches to the existing write path
(``writer.py``): every statement lands as one atomic snapshot commit
with the same pruning the Python API gets (``DELETE``/``UPDATE`` WHERE
clauses parse into the stats-pruning AST via ``pruning.sql_to_pred``,
so a partition-aligned predicate rewrites one partition's files, not
the table).

Statements that do not target this catalog return ``None`` and fall
through to the read path / plain ``spark.sql``.
"""

from __future__ import annotations

import re
import uuid as uuidlib
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IDENT = r"(?:`[^`]+`|[A-Za-z_]\w*)"

_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("operation", T.StringType(), False),
        T.StructField("target", T.StringType(), False),
        T.StructField("snapshot_id", T.LongType(), True),
    ]
)


def _result(
    spark: SparkSession, op: str, target: str, snap: Optional[int]
) -> DataFrame:
    return spark.createDataFrame([(op, target, snap)], _RESULT_SCHEMA)


def _unq(x: str) -> str:
    x = x.strip()
    return x[1:-1] if x.startswith("`") and x.endswith("`") else x


def _split_top(s: str, sep_word: Optional[str] = None) -> list[str]:
    """Split on top-level commas (default) or a top-level keyword,
    respecting single-quoted strings, backticks, and parentheses."""
    parts: list[str] = []
    depth = 0
    i = 0
    start = 0
    n = len(s)
    word_re = (
        re.compile(rf"\b{sep_word}\b", re.IGNORECASE) if sep_word else None
    )
    while i < n:
        c = s[i]
        if c == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if c == "`":
            j = s.find("`", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            if sep_word is None and c == ",":
                parts.append(s[start:i])
                start = i + 1
            elif word_re is not None:
                m = word_re.match(s, i)
                if m and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")):
                    parts.append(s[start:i])
                    start = m.end()
                    i = m.end()
                    continue
        i += 1
    parts.append(s[start:])
    return parts


def _split_where(s: str) -> tuple[str, Optional[str]]:
    parts = _split_top(s, "WHERE")
    if len(parts) == 1:
        return parts[0].strip(), None
    # everything after the FIRST top-level WHERE is the predicate
    return parts[0].strip(), s[len(parts[0]):].lstrip()[5:].strip()


def _align(
    df: DataFrame,
    st: T.StructType,
    cols: Optional[list[str]],
    defaults: Optional[dict] = None,
) -> DataFrame:
    """SQL INSERT alignment: positional into ``cols`` (or the full
    schema), unlisted target columns take their v3 WRITE-DEFAULT when
    declared (else NULL), everything cast to the target type.  A
    full-schema positional INSERT may omit TRAILING columns only when
    every omitted one has a write-default (post-ADD-COLUMN-DEFAULT
    inserts with the old arity keep working)."""
    defaults = defaults or {}
    target_cols = cols if cols is not None else [f.name for f in st.fields]
    if (
        cols is None
        and len(df.columns) < len(target_cols)
        and all(c in defaults for c in target_cols[len(df.columns):])
    ):
        target_cols = target_cols[: len(df.columns)]
    if len(df.columns) != len(target_cols):
        raise ValueError(
            f"INSERT column arity mismatch: source has {len(df.columns)} "
            f"columns, target list has {len(target_cols)}"
        )
    if len({c.lower() for c in target_cols}) != len(target_cols):
        raise ValueError(f"duplicate INSERT target column in {target_cols}")
    # positional mapping (df[i] — source column NAMES are irrelevant and
    # may repeat, e.g. `VALUES` literals)
    by_target = {tgt.lower(): df[i] for i, tgt in enumerate(target_cols)}
    unknown = set(by_target) - {f.name.lower() for f in st.fields}
    if unknown:
        raise ValueError(f"INSERT into unknown columns: {sorted(unknown)}")
    sel = []
    for f in st.fields:
        src = by_target.get(f.name.lower())
        if src is not None:
            sel.append(src.cast(f.dataType).alias(f.name))
        else:
            sel.append(
                F.lit(defaults.get(f.name)).cast(f.dataType).alias(f.name)
            )
    return df.select(*sel)


def _need(surface, *methods: str) -> None:
    missing = [m for m in methods if not hasattr(surface, m)]
    if missing:
        raise NotImplementedError(
            f"catalog {surface.name!r} is read-only on the SQL surface "
            f"(missing {', '.join(missing)})"
        )


def try_execute(
    surface, spark: SparkSession, query: str
) -> Optional[DataFrame]:
    """Execute ``query`` if it is a DML/DDL statement targeting a
    three-part name in this catalog; otherwise return ``None``."""
    q = query.strip().rstrip(";").strip()
    head = q.split(None, 1)[0].upper() if q else ""
    if head in ("SHOW", "DESCRIBE", "DESC"):
        return _show_describe(surface, spark, q)
    if head == "TRUNCATE":
        m = re.match(
            rf"TRUNCATE\s+TABLE\s+(?:`{re.escape(surface.name)}`|{re.escape(surface.name)})"
            rf"\.({IDENT})\.({IDENT})\s*$",
            q,
            re.IGNORECASE,
        )
        if m is None:
            return None
        ident = f"{_unq(m.group(1))}.{_unq(m.group(2))}"
        _need(surface, "overwrite", "load")
        st = surface.load(ident).metadata.struct_type()
        snap = surface.overwrite(ident, spark, spark.createDataFrame([], st))
        return _result(spark, "truncate", ident, snap)
    if head == "CALL":
        return _call_procedure(surface, spark, q)
    if head == "ANALYZE":
        m = re.match(
            rf"ANALYZE\s+TABLE\s+(?:`{re.escape(surface.name)}`|{re.escape(surface.name)})"
            rf"\.({IDENT})\.({IDENT})(?:\s+COMPUTE\s+STATISTICS)?\s*$",
            q,
            re.IGNORECASE,
        )
        if m is None:
            return None
        ident = f"{_unq(m.group(1))}.{_unq(m.group(2))}"
        table = surface.load(ident)
        files = table.files()
        # manifest-derived, zero data IO — the statistics feed the
        # reference exposes to its planner (statistics.rs:8-49), as SQL
        rows = [
            ("num_files", str(len(files))),
            ("num_rows", str(sum(f.record_count for f in files))),
            ("total_size_bytes", str(sum(f.file_size_in_bytes for f in files))),
            ("num_snapshots", str(len(table.metadata.snapshots))),
            ("num_manifests", str(len(table.manifests()))),
        ]
        return spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("key", T.StringType(), False),
                    T.StructField("value", T.StringType(), False),
                ]
            ),
        )
    if head not in ("INSERT", "DELETE", "UPDATE", "MERGE", "CREATE", "DROP", "ALTER"):
        return None
    cat = rf"(?:`{re.escape(surface.name)}`|{re.escape(surface.name)})"
    tgt3 = rf"{cat}\.({IDENT})\.({IDENT})"

    if head == "INSERT":
        return _insert(surface, spark, q, tgt3)
    if head == "DELETE":
        return _delete(surface, spark, q, tgt3)
    if head == "UPDATE":
        return _update(surface, spark, q, tgt3)
    if head == "MERGE":
        return _merge(surface, spark, q, tgt3)
    if head == "CREATE":
        return _create(surface, spark, q, tgt3)
    if head == "DROP":
        return _drop(surface, spark, q, tgt3)
    return _alter(surface, spark, q, tgt3)


def _parse_call_args(raw: str) -> tuple[list, dict]:
    """Positional and named (``name => value``) procedure arguments;
    values are SQL literals: 'string', numbers, TRUE/FALSE."""
    args: list = []
    kwargs: dict = {}

    def lit(v: str):
        v = v.strip()
        if v.startswith("'") and v.endswith("'"):
            return v[1:-1].replace("''", "'")
        if v.upper() in ("TRUE", "FALSE"):
            return v.upper() == "TRUE"
        if re.fullmatch(r"-?\d+", v):
            return int(v)
        if re.fullmatch(r"-?\d+\.\d+", v):
            return float(v)
        raise ValueError(f"cannot parse CALL argument literal: {v!r}")

    if not raw.strip():
        return args, kwargs
    for part in _split_top(raw):
        nm = re.match(r"\s*(\w+)\s*=>\s*(.*)$", part, re.DOTALL)
        if nm:
            kwargs[nm.group(1)] = lit(nm.group(2))
        else:
            args.append(lit(part))
    return args, kwargs


# procedure name -> (catalog method, result shaping).  Every procedure
# takes the table identifier first (as 'ns.table'); remaining args pass
# through positionally/named.  Mirrors Spark-Iceberg's
# `CALL catalog.system.<proc>(...)` surface.
_PROCEDURES = {
    "expire_snapshots": "expire_snapshots",
    "remove_orphan_files": "remove_orphan_files",
    "rewrite_manifests": "rewrite_manifests",
    "rewrite_data_files": "compact",
    "rewrite_zorder": "rewrite_zorder",
    "rollback_to_snapshot": "rollback_to_snapshot",
    "fast_forward": "fast_forward",
    "create_tag": "create_tag",
    "create_branch": "create_branch",
    "drop_ref": "drop_ref",
    "refresh_mv": "refresh_mv",
    "vacuum": "vacuum",
    "add_files": "add_files",
    "rewrite_position_delete_files": "rewrite_position_deletes",
    "rewrite_deletion_vectors": "rewrite_deletion_vectors",
    "compute_partition_stats": "compute_partition_stats",
    "maintain": "maintain",
}

# procedures whose underlying method takes (ident, spark, ...) rather
# than (ident, ...)
_PROC_NEEDS_SPARK = {
    "maintain",
    "rewrite_data_files",
    "rewrite_zorder",
    "refresh_mv",
    "rewrite_position_delete_files",
}


def _call_procedure(surface, spark, q) -> Optional[DataFrame]:
    cat = rf"(?:`{re.escape(surface.name)}`|{re.escape(surface.name)})"
    m = re.match(
        rf"CALL\s+{cat}\.system\.(\w+)\s*\((.*)\)\s*$",
        q,
        re.IGNORECASE | re.DOTALL,
    )
    if m is None:
        return None
    proc = m.group(1).lower()
    method_name = _PROCEDURES.get(proc)
    if method_name is None:
        raise ValueError(
            f"unknown procedure {proc!r} (known: {sorted(_PROCEDURES)})"
        )
    args, kwargs = _parse_call_args(m.group(2))
    ident = kwargs.pop("table", None)
    if ident is None:
        if not args:
            raise ValueError(f"CALL {proc}: missing table identifier")
        ident = args.pop(0)
    _need(surface, method_name)
    method = getattr(surface, method_name)
    if proc == "rewrite_zorder":
        # columns arrive as a comma-separated string literal
        cols = kwargs.pop("columns", None)
        if cols is None:
            if not args:
                raise ValueError("rewrite_zorder: missing columns")
            cols = args.pop(0)
        if isinstance(cols, str):
            cols = [c.strip() for c in cols.split(",")]
        out = method(ident, spark, cols, *args, **kwargs)
    elif proc in _PROC_NEEDS_SPARK:
        out = method(ident, spark, *args, **kwargs)
    else:
        out = method(ident, *args, **kwargs)
    if isinstance(out, dict):
        rows = [(k, str(v)) for k, v in sorted(out.items())]
    else:
        rows = [("result", str(out))]
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("key", T.StringType(), False),
                T.StructField("value", T.StringType(), True),
            ]
        ),
    )


def _show_describe(surface, spark, q) -> Optional[DataFrame]:
    """SHOW NAMESPACES / SHOW TABLES [IN ns] / DESCRIBE table for this
    catalog.  Returns None for other catalogs' names so Spark's own
    SHOW/DESCRIBE still work."""
    cat = rf"(?:`{re.escape(surface.name)}`|{re.escape(surface.name)})"
    m = re.match(rf"SHOW\s+NAMESPACES\s+IN\s+{cat}\s*$", q, re.IGNORECASE)
    if m:
        return spark.createDataFrame(
            [(ns,) for ns in surface.namespaces()],
            T.StructType([T.StructField("namespace", T.StringType(), False)]),
        )
    m = re.match(
        rf"SHOW\s+TABLES\s+IN\s+{cat}(?:\.({IDENT}))?\s*$", q, re.IGNORECASE
    )
    if m:
        ns = _unq(m.group(1)) if m.group(1) else None
        rows = []
        for key in surface.table_names(ns):
            k_ns, bare = key.split(".", 1)
            rel = surface.load(key)
            is_view = not hasattr(rel, "files")
            rows.append((k_ns, bare, is_view))
        return spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("namespace", T.StringType(), False),
                    T.StructField("tableName", T.StringType(), False),
                    T.StructField("isView", T.BooleanType(), False),
                ]
            ),
        )
    m = re.match(
        rf"SHOW\s+PARTITIONS\s+{cat}\.({IDENT})\.({IDENT})\s*$",
        q,
        re.IGNORECASE,
    )
    if m:
        from datafusion_iceberg_spark.iceberg.inspect import metadata_df

        ident = f"{_unq(m.group(1))}.{_unq(m.group(2))}"
        parts = metadata_df(surface.load(ident), spark, "partitions")
        # Spark's SHOW PARTITIONS shape: one 'partition' string per
        # partition tuple, col=val[/col=val], sorted
        return (
            parts.select(
                F.array_join(
                    F.transform(
                        F.map_entries(F.col("partition")),
                        lambda e: F.concat_ws("=", e["key"], e["value"]),
                    ),
                    "/",
                ).alias("partition")
            )
            .distinct()
            .orderBy("partition")
        )
    m = re.match(
        rf"SHOW\s+TBLPROPERTIES\s+{cat}\.({IDENT})\.({IDENT})\s*$",
        q,
        re.IGNORECASE,
    )
    if m:
        ident = f"{_unq(m.group(1))}.{_unq(m.group(2))}"
        props = surface.load(ident).metadata.properties
        return spark.createDataFrame(
            sorted(props.items()) or [("", "")][:0],
            T.StructType(
                [
                    T.StructField("key", T.StringType(), False),
                    T.StructField("value", T.StringType(), True),
                ]
            ),
        )
    m = re.match(
        rf"SHOW\s+CREATE\s+TABLE\s+{cat}\.({IDENT})\.({IDENT})\s*$",
        q,
        re.IGNORECASE,
    )
    if m:
        ident = f"{_unq(m.group(1))}.{_unq(m.group(2))}"
        meta = surface.load(ident).metadata
        cols = ",\n  ".join(
            f"{f.name} {f.dataType.simpleString().upper()}"
            for f in meta.struct_type().fields
        )
        stmt = f"CREATE TABLE {surface.name}.{ident} (\n  {cols}\n)"
        spec = meta.partition_spec_entries()
        if spec:
            stmt += f"\nPARTITIONED BY ({', '.join(spec)})"
        props = meta.properties
        if props:
            kv = ", ".join(
                f"'{k}' = '{v}'" for k, v in sorted(props.items())
            )
            stmt += f"\nTBLPROPERTIES ({kv})"
        return spark.createDataFrame(
            [(stmt,)],
            T.StructType(
                [T.StructField("createtab_stmt", T.StringType(), False)]
            ),
        )
    m = re.match(
        rf"(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?{cat}\.({IDENT})\.({IDENT})\s*$",
        q,
        re.IGNORECASE,
    )
    if m:
        ident = f"{_unq(m.group(1))}.{_unq(m.group(2))}"
        table = surface.load(ident)
        if not hasattr(table, "metadata"):  # an Iceberg VIEW
            return spark.createDataFrame(
                [("# view sql", table.sql(), None)],
                T.StructType(
                    [
                        T.StructField("col_name", T.StringType(), False),
                        T.StructField("data_type", T.StringType(), False),
                        T.StructField("field_id", T.IntegerType(), True),
                    ]
                ),
            )
        meta = table.metadata
        ids = meta.field_ids_by_name()
        rows = [
            (f.name, f.dataType.simpleString(), ids.get(f.name))
            for f in meta.struct_type().fields
        ]
        for spec in meta.partition_spec_entries():
            rows.append(("# partitioned by", spec, None))
        return spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("col_name", T.StringType(), False),
                    T.StructField("data_type", T.StringType(), False),
                    T.StructField("field_id", T.IntegerType(), True),
                ]
            ),
        )
    return None


def _insert(surface, spark, q, tgt3) -> Optional[DataFrame]:
    m = re.match(
        rf"INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?{tgt3}\s+(.*)$",
        q,
        re.IGNORECASE | re.DOTALL,
    )
    if m is None:
        return None
    mode, ns, tbl, rest = m.group(1).upper(), _unq(m.group(2)), _unq(m.group(3)), m.group(4).strip()
    cols: Optional[list[str]] = None
    colm = re.match(
        rf"\(\s*({IDENT}(?:\s*,\s*{IDENT})*)\s*\)\s*(.*)$", rest, re.DOTALL
    )
    if colm and re.match(
        r"(SELECT|VALUES|WITH|TABLE|FROM|\()", colm.group(2), re.IGNORECASE
    ):
        cols = [_unq(c) for c in _split_top(colm.group(1))]
        rest = colm.group(2).strip()
    ident = f"{ns}.{tbl}"
    _need(surface, "append", "overwrite", "load")
    table = surface.load(ident)
    st = table.metadata.struct_type()
    src = surface.sql(spark, rest)
    aligned = _align(src, st, cols, defaults=table.metadata.write_defaults())
    if mode == "INTO":
        snap = surface.append(ident, spark, aligned)
        return _result(spark, "append", ident, snap)
    snap = surface.overwrite(ident, spark, aligned)
    return _result(spark, "overwrite", ident, snap)


def _delete(surface, spark, q, tgt3) -> Optional[DataFrame]:
    m = re.match(
        rf"DELETE\s+FROM\s+{tgt3}\s*(.*)$", q, re.IGNORECASE | re.DOTALL
    )
    if m is None:
        return None
    ns, tbl, rest = _unq(m.group(1)), _unq(m.group(2)), m.group(3).strip()
    ident = f"{ns}.{tbl}"
    if not rest:
        _need(surface, "overwrite", "load")
        st = surface.load(ident).metadata.struct_type()
        snap = surface.overwrite(ident, spark, spark.createDataFrame([], st))
        return _result(spark, "delete", ident, snap)
    wm = re.match(r"WHERE\s+(.*)$", rest, re.IGNORECASE | re.DOTALL)
    if wm is None:
        raise ValueError(f"cannot parse DELETE tail: {rest!r}")
    # subqueries in the predicate may reference catalog tables: attach
    # the flat views and rewrite 3-part names (plain predicates pass
    # through unchanged — resolve_names only touches catalog refs)
    surface.attach(spark)
    where = surface.resolve_names(wm.group(1).strip())
    # honor the Iceberg write.delete.mode table property: merge-on-read
    # commits a position-delete file (row-proportional cost) instead of
    # the copy-on-write file rewrite
    mode = (
        surface.load(ident)
        .metadata.properties.get("write.delete.mode", "copy-on-write")
        .lower()
    )
    if mode == "merge-on-read":
        _need(surface, "delete_where_mor")
        snap = surface.delete_where_mor(ident, spark, where)
    elif mode in ("deletion-vector", "deletion-vectors"):
        # v3 DV flavor of merge-on-read: roaring bitmaps in puffin,
        # one blob per data file
        _need(surface, "delete_where_dv")
        snap = surface.delete_where_dv(ident, spark, where)
    else:
        _need(surface, "delete_where")
        snap = surface.delete_where(ident, spark, where)
    return _result(spark, "delete", ident, snap)


def _update(surface, spark, q, tgt3) -> Optional[DataFrame]:
    m = re.match(
        rf"UPDATE\s+{tgt3}\s+SET\s+(.*)$", q, re.IGNORECASE | re.DOTALL
    )
    if m is None:
        return None
    ns, tbl = _unq(m.group(1)), _unq(m.group(2))
    ident = f"{ns}.{tbl}"
    assignments, where = _split_where(m.group(3))
    surface.attach(spark)
    set_exprs: dict[str, str] = {}
    for part in _split_top(assignments):
        am = re.match(rf"\s*({IDENT})\s*=\s*(.*)$", part, re.DOTALL)
        if am is None:
            raise ValueError(f"cannot parse SET assignment: {part!r}")
        set_exprs[_unq(am.group(1))] = surface.resolve_names(
            am.group(2).strip()
        )
    # honor write.update.mode: merge-on-read commits one row-delta
    # snapshot (position deletes + replacement rows) instead of the
    # copy-on-write candidate-file rewrite
    mode = (
        surface.load(ident)
        .metadata.properties.get("write.update.mode", "copy-on-write")
        .lower()
    )
    resolved_where = (
        surface.resolve_names(where) if where is not None else "TRUE"
    )
    if mode == "merge-on-read":
        _need(surface, "update_where_mor")
        snap = surface.update_where_mor(
            ident, spark, resolved_where, set_exprs
        )
    else:
        _need(surface, "update_where")
        snap = surface.update_where(ident, spark, resolved_where, set_exprs)
    return _result(spark, "update", ident, snap)


def _merge(surface, spark, q, tgt3) -> Optional[DataFrame]:
    m = re.match(
        rf"MERGE\s+INTO\s+{tgt3}(?:\s+AS)?\s+(\w+)\s+USING\s+(.*)$",
        q,
        re.IGNORECASE | re.DOTALL,
    )
    if m is None:
        return None
    ns, tbl, talias = _unq(m.group(1)), _unq(m.group(2)), m.group(3)
    ident = f"{ns}.{tbl}"
    rest = m.group(4).strip()
    # source: '(subquery)' or a table reference, each with optional alias
    if rest.startswith("("):
        depth = 0
        i = 0
        n = len(rest)
        while i < n:
            c = rest[i]
            if c == "'":  # skip string literals ('' = escaped quote)
                i += 1
                while i < n:
                    if rest[i] == "'":
                        if i + 1 < n and rest[i + 1] == "'":
                            i += 2
                            continue
                        break
                    i += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        if depth != 0:
            raise ValueError("unbalanced parentheses in MERGE USING source")
        src_sql, rest = rest[1:i], rest[i + 1:].strip()
    else:
        sm = re.match(rf"((?:{IDENT})(?:\.{IDENT}){{0,2}})\s+(.*)$", rest, re.DOTALL)
        if sm is None:
            raise ValueError(f"cannot parse MERGE USING source: {rest!r}")
        src_sql, rest = f"SELECT * FROM {sm.group(1)}", sm.group(2).strip()
    am = re.match(r"(?:AS\s+)?(\w+)\s+(.*)$", rest, re.DOTALL)
    if am is None or am.group(1).upper() == "ON":
        raise ValueError("MERGE USING source needs an alias")
    salias, rest = am.group(1), am.group(2).strip()
    om = re.match(r"ON\s+(.*?)\s+WHEN\s+(.*)$", rest, re.IGNORECASE | re.DOTALL)
    if om is None:
        raise ValueError(f"cannot parse MERGE ON/WHEN: {rest!r}")
    cond, clauses_sql = om.group(1).strip(), "WHEN " + om.group(2)
    keys: list[str] = []
    for eq in _split_top(cond, "AND"):
        cm = re.match(
            rf"\s*(\w+)\.({IDENT})\s*=\s*(\w+)\.({IDENT})\s*$", eq
        )
        if cm is None:
            raise ValueError(
                f"MERGE ON must be AND-ed single equality terms "
                f"t.k = s.k, got {eq.strip()!r}"
            )
        a1, c1 = cm.group(1), _unq(cm.group(2))
        a2, c2 = cm.group(3), _unq(cm.group(4))
        if c1.lower() != c2.lower() or {a1.lower(), a2.lower()} != {
            talias.lower(),
            salias.lower(),
        }:
            raise ValueError(
                "MERGE ON must equate the SAME column across the two aliases"
            )
        keys.append(c1)
    on = keys[0] if len(keys) == 1 else keys

    when_matched_set: Optional[dict[str, str]] = None
    when_matched_delete = False
    insert_not_matched = False
    for clause in re.split(r"\bWHEN\s+", clauses_sql, flags=re.IGNORECASE)[1:]:
        clause = clause.strip()
        if re.match(r"MATCHED\s+THEN\s+DELETE\s*$", clause, re.IGNORECASE):
            when_matched_delete = True
            continue
        um = re.match(
            r"MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*)$",
            clause,
            re.IGNORECASE | re.DOTALL,
        )
        if um:
            when_matched_set = {}
            for part in _split_top(um.group(1)):
                pm = re.match(
                    rf"\s*(?:{re.escape(talias)}\.)?({IDENT})\s*=\s*(.*)$",
                    part,
                    re.DOTALL | re.IGNORECASE,
                )
                if pm is None:
                    raise ValueError(f"cannot parse MERGE SET: {part!r}")
                expr = pm.group(2).strip()
                # writer.merge evaluates SET exprs on the joined frame
                # under fixed aliases t (target) / src (source)
                expr = re.sub(
                    rf"\b{re.escape(salias)}\.", "src.", expr, flags=re.IGNORECASE
                )
                expr = re.sub(
                    rf"\b{re.escape(talias)}\.", "t.", expr, flags=re.IGNORECASE
                )
                when_matched_set[_unq(pm.group(1))] = expr
            continue
        if re.match(
            r"NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$", clause, re.IGNORECASE
        ):
            insert_not_matched = True
            continue
        raise ValueError(
            f"unsupported MERGE clause (only UPDATE SET / DELETE / "
            f"INSERT *): WHEN {clause!r}"
        )
    _need(surface, "merge_into")
    source = surface.sql(spark, src_sql)
    snap = surface.merge_into(
        ident,
        spark,
        source,
        on,
        when_matched_set=when_matched_set,
        insert_not_matched=insert_not_matched,
        when_matched_delete=when_matched_delete,
    )
    return _result(spark, "merge", ident, snap)


def _create(surface, spark, q, tgt3) -> Optional[DataFrame]:
    vm = re.match(
        rf"CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+{tgt3}\s+AS\s+(.*)$",
        q,
        re.IGNORECASE | re.DOTALL,
    )
    if vm:
        ident = f"{_unq(vm.group(2))}.{_unq(vm.group(3))}"
        _need(surface, "create_view")
        if surface.table_exists(ident):
            # standard SQL: plain CREATE VIEW over an existing relation is
            # an error — dropping here would destroy a TABLE's data on a
            # name collision (ADVICE r5)
            if vm.group(1) is None:
                raise ValueError(
                    f"TABLE_OR_VIEW_ALREADY_EXISTS: {ident} "
                    "(use CREATE OR REPLACE VIEW)"
                )
            surface.drop(ident)
        # store with catalog names resolved to the flat view spelling —
        # view SQL replays through plain spark.sql at scan time
        surface.create_view(ident, surface.resolve_names(vm.group(4).strip()))
        return _result(spark, "create_view", ident, None)
    m = re.match(
        rf"CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{tgt3}\s*(.*)$",
        q,
        re.IGNORECASE | re.DOTALL,
    )
    if m is None:
        return None
    replace = m.group(1) is not None
    ns, tbl, rest = _unq(m.group(2)), _unq(m.group(3)), m.group(4).strip()
    ident = f"{ns}.{tbl}"
    existing = surface.table_exists(ident)
    if existing:
        if re.search(r"IF\s+NOT\s+EXISTS", q, re.IGNORECASE):
            return _result(spark, "noop", ident, None)
        if not replace:
            raise ValueError(
                f"TABLE_OR_VIEW_ALREADY_EXISTS: {ident} "
                "(use CREATE OR REPLACE TABLE or IF NOT EXISTS)"
            )
        # OR REPLACE: the drop is DEFERRED until the replacement content
        # is fully materialized (plain DDL below; staged swap for CTAS) —
        # a failing or self-referencing CTAS must not lose the original
        # table (ADVICE r5)
    _need(surface, "create_table")

    partition_by: Optional[list[str]] = None
    pb = re.search(
        r"\bPARTITIONED\s+BY\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)",
        rest,
        re.IGNORECASE,
    )
    if pb:
        partition_by = [p.strip() for p in _split_top(pb.group(1))]
        rest = (rest[: pb.start()] + rest[pb.end():]).strip()

    properties: Optional[dict] = None
    tp = re.search(
        r"\bTBLPROPERTIES\s*\(((?:[^()']|'(?:[^']|'')*')*)\)",
        rest,
        re.IGNORECASE,
    )
    if tp:
        properties = {}
        for pair in _split_top(tp.group(1)):
            pm = re.match(
                r"\s*'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'\s*$", pair
            )
            if pm is None:
                raise ValueError(f"cannot parse TBLPROPERTIES entry: {pair!r}")
            properties[pm.group(1).replace("''", "'")] = pm.group(2).replace(
                "''", "'"
            )
        rest = (rest[: tp.start()] + rest[tp.end():]).strip()

    ctas = re.match(r"AS\s+(.*)$", rest, re.IGNORECASE | re.DOTALL)
    if ctas:
        df = surface.sql(spark, ctas.group(1).strip())
        if existing:
            # staged swap: materialize the full CTAS result into a temp
            # table FIRST (the SELECT can still read the old table — the
            # self-referencing CREATE OR REPLACE ... AS SELECT FROM self
            # case), then drop + rename on success only
            _need(surface, "rename_table")
            stage = f"{ns}.__replace_{tbl}_{uuidlib.uuid4().hex[:8]}"
            surface.create_table(
                stage, df.schema, partition_by, properties=properties
            )
            try:
                snap = surface.append(stage, spark, df)
            except Exception:
                surface.drop(stage)
                raise
            surface.drop(ident)
            surface.rename_table(stage, ident)
        else:
            surface.create_table(
                ident, df.schema, partition_by, properties=properties
            )
            snap = surface.append(ident, spark, df)
        return _result(spark, "create_table_as", ident, snap)
    cm = re.match(r"\((.*)\)\s*$", rest, re.DOTALL)
    if cm is None:
        raise ValueError(f"cannot parse CREATE TABLE tail: {rest!r}")
    st = T.StructType.fromDDL(cm.group(1))
    if existing:
        surface.drop(ident)  # plain DDL replace: nothing to materialize
    surface.create_table(ident, st, partition_by, properties=properties)
    return _result(spark, "create_table", ident, None)


def _drop(surface, spark, q, tgt3) -> Optional[DataFrame]:
    m = re.match(
        rf"DROP\s+(TABLE|VIEW)\s+(IF\s+EXISTS\s+)?{tgt3}\s*$",
        q,
        re.IGNORECASE,
    )
    if m is None:
        return None
    ident = f"{_unq(m.group(3))}.{_unq(m.group(4))}"
    if not surface.table_exists(ident):
        if m.group(2):
            return _result(spark, "noop", ident, None)
        raise KeyError(f"no such table: {ident}")
    _need(surface, "drop")
    surface.drop(ident)
    return _result(spark, "drop", ident, None)


def _alter(surface, spark, q, tgt3) -> Optional[DataFrame]:
    m = re.match(
        rf"ALTER\s+TABLE\s+{tgt3}\s+(.*)$", q, re.IGNORECASE | re.DOTALL
    )
    if m is None:
        return None
    ident = f"{_unq(m.group(1))}.{_unq(m.group(2))}"
    rest = m.group(3).strip()
    add = re.match(
        rf"ADD\s+COLUMNS?\s+\(?\s*({IDENT})\s+([^\s)]+)"
        r"(?:\s+DEFAULT\s+('(?:[^']|'')*'|-?[\d.]+))?\s*\)?\s*$",
        rest,
        re.IGNORECASE,
    )
    if add:
        _need(surface, "add_column")
        dtype = T._parse_datatype_string(add.group(2))
        default = None
        if add.group(3) is not None:
            lit = add.group(3)
            if lit.startswith("'"):
                default = lit[1:-1].replace("''", "'")
            elif "." in lit:
                default = float(lit)
            else:
                default = int(lit)
        surface.add_column(ident, _unq(add.group(1)), dtype, default=default)
        return _result(spark, "add_column", ident, None)
    ren = re.match(
        rf"RENAME\s+COLUMN\s+({IDENT})\s+TO\s+({IDENT})\s*$",
        rest,
        re.IGNORECASE,
    )
    if ren:
        _need(surface, "rename_column")
        surface.rename_column(ident, _unq(ren.group(1)), _unq(ren.group(2)))
        return _result(spark, "rename_column", ident, None)
    drp = re.match(rf"DROP\s+COLUMN\s+({IDENT})\s*$", rest, re.IGNORECASE)
    if drp:
        _need(surface, "drop_column")
        surface.drop_column(ident, _unq(drp.group(1)))
        return _result(spark, "drop_column", ident, None)
    wid = re.match(
        rf"ALTER\s+COLUMN\s+({IDENT})\s+TYPE\s+([^\s]+)\s*$",
        rest,
        re.IGNORECASE,
    )
    if wid:
        _need(surface, "widen_column")
        dtype = T._parse_datatype_string(wid.group(2))
        surface.widen_column(ident, _unq(wid.group(1)), dtype)
        return _result(spark, "widen_column", ident, None)
    setp = re.match(
        r"SET\s+TBLPROPERTIES\s*\(((?:[^()']|'(?:[^']|'')*')*)\)\s*$",
        rest,
        re.IGNORECASE,
    )
    if setp:
        updates = {}
        for pair in _split_top(setp.group(1)):
            pm = re.match(
                r"\s*'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'\s*$", pair
            )
            if pm is None:
                raise ValueError(f"cannot parse TBLPROPERTIES entry: {pair!r}")
            updates[pm.group(1).replace("''", "'")] = pm.group(2).replace(
                "''", "'"
            )
        _need(surface, "set_properties")
        surface.set_properties(ident, updates)
        return _result(spark, "set_properties", ident, None)
    unset = re.match(
        r"UNSET\s+TBLPROPERTIES\s*\(((?:[^()']|'(?:[^']|'')*')*)\)\s*$",
        rest,
        re.IGNORECASE,
    )
    if unset:
        keys = []
        for part in _split_top(unset.group(1)):
            km = re.match(r"\s*'((?:[^']|'')*)'\s*$", part)
            if km is None:
                raise ValueError(f"cannot parse UNSET key: {part!r}")
            keys.append(km.group(1).replace("''", "'"))
        _need(surface, "set_properties")
        surface.set_properties(ident, {}, removes=keys)
        return _result(spark, "unset_properties", ident, None)
    raise ValueError(f"unsupported ALTER TABLE action: {rest!r}")
