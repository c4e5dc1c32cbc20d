"""SQL DML/DDL executor for the catalog SQL surface: ``INSERT
INTO/OVERWRITE``, ``DELETE FROM``, ``UPDATE``, ``MERGE INTO``,
``CREATE TABLE [AS]``, ``CREATE VIEW``, ``DROP TABLE/VIEW``, ``ALTER
TABLE``, ``TRUNCATE``, ``ANALYZE``, ``CALL``, ``SHOW``/``DESCRIBE`` on
three-part catalog names.

Statement parsing is owned by the hand-written SQL front end
(:mod:`datafusion_iceberg_spark.sql`): a real tokenizer + recursive-
descent parser producing typed ASTs — the Spark-side equivalent of the
reference delegating statement parsing to DataFusion's SQL parser
(``datafusion_iceberg/src/table.rs:106-108``).  This module maps each
AST node onto the catalog write path (``writer.py``): every statement
lands as one atomic snapshot commit with the same pruning the Python
API gets (``DELETE``/``UPDATE`` WHERE clauses parse into the
stats-pruning AST via ``pruning.sql_to_pred``, so a partition-aligned
predicate rewrites one partition's files, not the table).

The reference is read-only (its ``TableProvider`` never implements
``insert_into``; SURVEY.md §2C), so this whole surface is
beyond-reference — but it is what every SQL user of an Iceberg catalog
expects.

Statements that do not target this catalog return ``None`` and fall
through to the read path / plain ``spark.sql``.
"""

from __future__ import annotations

import uuid as uuidlib
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.sql import ast_nodes as A
from datafusion_iceberg_spark.sql.parser import parse_statement
from datafusion_iceberg_spark.session import local_df

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
    return local_df(spark, [(op, target, snap)], _RESULT_SCHEMA)


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
    three-part name in this catalog; otherwise return ``None`` (the
    statement falls through to the read path / plain ``spark.sql``)."""
    q = query.strip().rstrip(";").strip()
    stmt = parse_statement(q, surface.name)
    if stmt is None:
        return None
    fn = _EXEC[type(stmt)]
    return fn(surface, spark, stmt)


# ---- DML -------------------------------------------------------------------


def _exec_insert(surface, spark, s: A.Insert) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    _need(surface, "append", "overwrite", "load")
    table = surface.load(ident)
    st = table.metadata.struct_type()
    src = surface.sql(spark, s.query_sql)
    aligned = _align(
        src, st, s.columns, defaults=table.metadata.write_defaults()
    )
    if s.mode == "INTO":
        # Spark-Iceberg WAP: with write.wap.enabled on the table and a
        # session spark.wap.id set, INSERT stages the snapshot (summary
        # wap.id, main unmoved) for a later CALL publish_changes
        wap_id = None
        props = table.metadata.properties
        if str(props.get("write.wap.enabled", "")).lower() == "true":
            try:
                wap_id = spark.conf.get("spark.wap.id", None)
            except Exception:
                wap_id = None
        if wap_id:
            snap = surface.append(ident, spark, aligned, wap_id=wap_id)
            return _result(spark, "stage_wap", ident, snap)
        snap = surface.append(ident, spark, aligned)
        return _result(spark, "append", ident, snap)
    dynamic = False
    if table.metadata.partition_spec_entries():
        props = table.metadata.properties
        mode = str(props.get("write.overwrite.mode", "")).lower()
        if not mode:
            try:
                mode = str(
                    spark.conf.get(
                        "spark.sql.sources.partitionOverwriteMode", ""
                    )
                ).lower()
            except Exception:
                mode = ""
        dynamic = mode == "dynamic"
    if dynamic:
        _need(surface, "overwrite_partitions")
        snap = surface.overwrite_partitions(ident, spark, aligned)
        return _result(spark, "overwrite_partitions", ident, snap)
    snap = surface.overwrite(ident, spark, aligned)
    return _result(spark, "overwrite", ident, snap)


def _exec_delete(surface, spark, s: A.Delete) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    if s.where_sql is None:
        _need(surface, "overwrite", "load")
        st = surface.load(ident).metadata.struct_type()
        snap = surface.overwrite(ident, spark, local_df(spark, [], st))
        return _result(spark, "delete", ident, snap)
    # subqueries in the predicate may reference catalog tables: attach
    # the flat views and rewrite 3-part names (plain predicates pass
    # through unchanged — resolve_names only touches catalog refs)
    surface.attach(spark)
    where = surface.resolve_names(s.where_sql)
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
    elif mode in ("equality", "equality-delete", "equality-deletes"):
        # Flink-style: commit the matching rows' IDENTIFIER keys as an
        # equality-delete file — O(matching keys), no file rewrite, no
        # position binding (robust to concurrent compaction).  Requires
        # SET IDENTIFIER FIELDS; the predicate needs one scan to derive
        # the key set (strictly-older rows with those keys then read as
        # deleted).  A key re-inserted AFTER this delete survives — the
        # eq-delete semantic, which is exactly the CDC-purge contract.
        _need(surface, "delete_where_eq", "load")
        table = surface.load(ident)
        id_cols = table.metadata.raw  # identifier names via schema
        cur_id = id_cols.get("current-schema-id", 0)
        cur = next(
            sc for sc in id_cols["schemas"]
            if sc.get("schema-id", 0) == cur_id
        )
        by_id = {f["id"]: f["name"] for f in cur["fields"]}
        keys = [by_id[i] for i in cur.get("identifier-field-ids", [])]
        if not keys:
            raise ValueError(
                "write.delete.mode='equality' needs identifier fields "
                "(ALTER TABLE ... SET IDENTIFIER FIELDS k, ...)"
            )
        keys_df = (
            table.to_df(spark).where(where).select(*keys).distinct()
        )
        snap = surface.delete_where_eq(ident, spark, keys_df)
    elif mode in ("deletion-vector", "deletion-vectors"):
        # v3 DV flavor of merge-on-read: roaring bitmaps in puffin,
        # one blob per data file
        _need(surface, "delete_where_dv")
        snap = surface.delete_where_dv(ident, spark, where)
    else:
        _need(surface, "delete_where")
        snap = surface.delete_where(ident, spark, where)
    return _result(spark, "delete", ident, snap)


def _exec_update(surface, spark, s: A.Update) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    surface.attach(spark)
    set_exprs = {
        col: surface.resolve_names(expr) for col, expr in s.assignments
    }
    # honor write.update.mode: merge-on-read commits one row-delta
    # snapshot (position deletes + replacement rows) instead of the
    # copy-on-write candidate-file rewrite
    mode = (
        surface.load(ident)
        .metadata.properties.get("write.update.mode", "copy-on-write")
        .lower()
    )
    where = (
        surface.resolve_names(s.where_sql)
        if s.where_sql is not None
        else "TRUE"
    )
    if mode == "merge-on-read":
        _need(surface, "update_where_mor")
        snap = surface.update_where_mor(ident, spark, where, set_exprs)
    else:
        _need(surface, "update_where")
        snap = surface.update_where(ident, spark, where, set_exprs)
    return _result(spark, "update", ident, snap)


def _exec_merge(surface, spark, s: A.Merge) -> DataFrame:
    from datafusion_iceberg_spark.iceberg.writer import MergeClause

    ident = f"{s.namespace}.{s.table}"
    # AST clauses (conditions and SET/VALUES exprs already rewritten to
    # the fixed aliases t/src the writer joins under) → writer clauses,
    # order preserved (first-matching-clause-wins per row)
    clauses: list[MergeClause] = []
    for clause in s.clauses:
        if isinstance(clause, A.MergeUpdate):
            clauses.append(
                MergeClause(
                    clause.kind, clause.condition, "update",
                    assignments=dict(clause.set_items),
                )
            )
        elif isinstance(clause, A.MergeDelete):
            clauses.append(
                MergeClause(clause.kind, clause.condition, "delete")
            )
        elif isinstance(clause, A.MergeInsertStar):
            clauses.append(
                MergeClause("not_matched", clause.condition, "insert")
            )
        elif isinstance(clause, A.MergeInsert):
            clauses.append(
                MergeClause(
                    "not_matched", clause.condition, "insert",
                    insert_cols=list(clause.columns),
                    insert_values=list(clause.values),
                )
            )
    _need(surface, "merge_into")
    source = surface.sql(spark, s.source_sql)
    on = s.on_keys[0] if len(s.on_keys) == 1 else s.on_keys
    snap = surface.merge_into(
        ident, spark, source, on, clauses=clauses,
    )
    return _result(spark, "merge", ident, snap)


# ---- DDL -------------------------------------------------------------------


def _exec_create_mv(
    surface, spark, s: A.CreateMaterializedView
) -> DataFrame:
    from datafusion_iceberg_spark.iceberg.mv import (
        create_aggregate_mv,
        create_join_mv,
    )

    ident = f"{s.namespace}.{s.table}"
    if surface.table_exists(ident):
        raise ValueError(f"TABLE_OR_VIEW_ALREADY_EXISTS: {ident}")
    if getattr(s, "join_table", None):
        # FROM fact JOIN dim ON l = r — resolve key sides and group-col
        # ownership by schema membership (dim columns win a tie for
        # grouping; keys must be unambiguous)
        fact_ident = f"{s.source_namespace}.{s.source_table}"
        dim_ident = f"{s.join_namespace}.{s.join_table}"
        f_cols = {
            f.name for f in surface.load(fact_ident).metadata.struct_type().fields
        }
        d_cols = {
            f.name for f in surface.load(dim_ident).metadata.struct_type().fields
        }
        l, r = s.join_left_key, s.join_right_key
        if l in f_cols and r in d_cols:
            fact_key, dim_key = l, r
        elif r in f_cols and l in d_cols:
            fact_key, dim_key = r, l
        else:
            raise ValueError(
                f"join-MV ON keys ({l}, {r}) must map one to the fact "
                f"({fact_ident}) and one to the dim ({dim_ident})"
            )
        g_dim = [c for c in s.group_cols if c in d_cols]
        g_fact = [c for c in s.group_cols if c not in d_cols]
        create_join_mv(
            surface,
            spark,
            ident,
            fact_ident=fact_ident,
            dim_ident=dim_ident,
            fact_key=fact_key,
            dim_key=dim_key,
            group_cols_dim=g_dim,
            value_col=s.value_col,
            group_cols_fact=g_fact,
        )
        return _result(spark, "create_materialized_view", ident, None)
    create_aggregate_mv(
        surface,
        spark,
        ident,
        f"{s.source_namespace}.{s.source_table}",
        list(s.group_cols),
        s.value_col,
        aggs=list(getattr(s, "aggs", ()) or ()) or None,
        where=(
            surface.resolve_names(s.where)
            if getattr(s, "where", None)
            else None
        ),
        colnames=list(getattr(s, "agg_aliases", ()) or ()) or None,
    )
    return _result(spark, "create_materialized_view", ident, None)


def _exec_create_view(surface, spark, s: A.CreateView) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    _need(surface, "create_view")
    if surface.table_exists(ident):
        # standard SQL: plain CREATE VIEW over an existing relation is
        # an error — dropping here would destroy a TABLE's data on a
        # name collision (ADVICE r5)
        if not s.replace:
            raise ValueError(
                f"TABLE_OR_VIEW_ALREADY_EXISTS: {ident} "
                "(use CREATE OR REPLACE VIEW)"
            )
        from datafusion_iceberg_spark.iceberg.view import IcebergView

        if isinstance(surface.load(ident), IcebergView) and hasattr(
            surface, "replace_view"
        ):
            # Iceberg view-spec versioning: REPLACE commits a NEW view
            # version (version-log preserved) instead of drop+create
            surface.replace_view(ident, surface.resolve_names(s.query_sql))
            return _result(spark, "replace_view", ident, None)
        surface.drop(ident)
    # store with catalog names resolved to the flat view spelling —
    # view SQL replays through plain spark.sql at scan time
    surface.create_view(ident, surface.resolve_names(s.query_sql))
    return _result(spark, "create_view", ident, None)


def _exec_create_table(surface, spark, s: A.CreateTable) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    existing = surface.table_exists(ident)
    if existing:
        if s.if_not_exists:
            return _result(spark, "noop", ident, None)
        if not s.replace:
            raise ValueError(
                f"TABLE_OR_VIEW_ALREADY_EXISTS: {ident} "
                "(use CREATE OR REPLACE TABLE or IF NOT EXISTS)"
            )
        # OR REPLACE: the drop is DEFERRED until the replacement content
        # is fully materialized (plain DDL below; staged swap for CTAS) —
        # a failing or self-referencing CTAS must not lose the original
        # table (ADVICE r5)
    _need(surface, "create_table")
    if s.ctas_sql is not None:
        df = surface.sql(spark, s.ctas_sql)
        if existing:
            # staged swap: materialize the full CTAS result into a temp
            # table FIRST (the SELECT can still read the old table — the
            # self-referencing CREATE OR REPLACE ... AS SELECT FROM self
            # case), then drop + rename on success only
            _need(surface, "rename_table")
            stage = (
                f"{s.namespace}.__replace_{s.table}_"
                f"{uuidlib.uuid4().hex[:8]}"
            )
            surface.create_table(
                stage, df.schema, s.partition_by, properties=s.properties
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
                ident, df.schema, s.partition_by, properties=s.properties
            )
            snap = surface.append(ident, spark, df)
        return _result(spark, "create_table_as", ident, snap)
    ddl, ns_types = _extract_ns_timestamp_types(s.columns_ddl)
    st = T.StructType.fromDDL(ddl)
    if existing:
        surface.drop(ident)  # plain DDL replace: nothing to materialize
    if ns_types:
        surface.create_table(
            ident, st, s.partition_by, properties=s.properties,
            iceberg_types=ns_types,
        )
    else:
        surface.create_table(
            ident, st, s.partition_by, properties=s.properties
        )
    return _result(spark, "create_table", ident, None)


def _extract_ns_timestamp_types(columns_ddl: str) -> tuple[str, dict]:
    """v3 nanosecond timestamps in DDL: ``ts TIMESTAMP_NS`` /
    ``TIMESTAMPTZ_NS`` are not Spark types — substitute BIGINT (the
    physical nanos-since-epoch domain, metadata.py) and return the
    per-column Iceberg type overrides for ``create_table``.  Splits on
    top-level commas only, so nested struct/map spellings pass through
    untouched (nanos inside nested types are not supported)."""
    parts: list[str] = []
    depth, cur = 0, []
    for ch in columns_ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    overrides: dict = {}
    out = []
    for part in parts:
        toks = part.strip().split()
        if len(toks) >= 2 and toks[1].lower() in (
            "timestamp_ns", "timestamptz_ns"
        ):
            overrides[toks[0].strip('`"')] = toks[1].lower()
            toks[1] = "BIGINT"
            part = " ".join(toks)
        out.append(part)
    return ", ".join(p.strip() for p in out), overrides


def _exec_drop(surface, spark, s: A.Drop) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    if not surface.table_exists(ident):
        if s.if_exists:
            return _result(spark, "noop", ident, None)
        raise KeyError(f"no such table: {ident}")
    _need(surface, "drop")
    surface.drop(ident)
    return _result(spark, "drop", ident, None)


def _exec_alter(surface, spark, s: A.Alter) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    a = s.action
    if isinstance(a, A.AddColumn):
        _need(surface, "add_column")
        dtype = T._parse_datatype_string(a.type_ddl)
        surface.add_column(ident, a.column, dtype, default=a.default)
        return _result(spark, "add_column", ident, None)
    if isinstance(a, A.RenameColumn):
        _need(surface, "rename_column")
        surface.rename_column(ident, a.old, a.new)
        return _result(spark, "rename_column", ident, None)
    if isinstance(a, A.DropColumn):
        _need(surface, "drop_column")
        surface.drop_column(ident, a.column)
        return _result(spark, "drop_column", ident, None)
    if isinstance(a, A.AddConstraint):
        # Delta-style CHECK constraint: validate EXISTING data first
        # (so later rewrites can never fail on pre-existing rows), then
        # persist as a table property the writer enforces on every
        # append/overwrite (writer._enforce_check_constraints)
        _need(surface, "set_properties", "load")
        from pyspark.sql import functions as F

        expr = F.expr(a.check_sql)
        bad = (
            surface.load(ident)
            .to_df(spark)
            .filter(~expr | expr.isNull())
            .take(1)
        )
        if bad:
            raise ValueError(
                f"cannot ADD CONSTRAINT {a.name!r}: existing row violates "
                f"CHECK ({a.check_sql}) — e.g. {bad[0].asDict()}"
            )
        surface.set_properties(
            ident, {f"constraints.{a.name}": a.check_sql}
        )
        return _result(spark, "add_constraint", ident, None)
    if isinstance(a, A.DropConstraint):
        _need(surface, "set_properties", "load")
        key = f"constraints.{a.name}"
        if key not in surface.load(ident).metadata.properties:
            raise KeyError(f"no such constraint on {ident}: {a.name}")
        surface.set_properties(ident, {}, removes=[key])
        return _result(spark, "drop_constraint", ident, None)
    if isinstance(a, A.RefDdl):
        if a.op == "drop":
            _need(surface, "drop_ref")
            refs = surface.load(ident).metadata.raw.get("refs", {})
            if a.name not in refs:
                if a.if_exists:
                    return _result(spark, "noop", ident, None)
                raise KeyError(f"ref {a.name!r} not found on {ident}")
            surface.drop_ref(ident, a.name)
            return _result(spark, f"drop_{a.ref_type}", ident, None)
        method = "create_tag" if a.ref_type == "tag" else "create_branch"
        _need(surface, method)
        refs = surface.load(ident).metadata.raw.get("refs", {})
        if a.op == "create" and a.name in refs:
            if a.if_not_exists:
                return _result(spark, "noop", ident, None)
            raise ValueError(
                f"ref {a.name!r} already exists on {ident} "
                "(use REPLACE, or IF NOT EXISTS)"
            )
        sid = getattr(surface, method)(ident, a.name, a.snapshot_id)
        return _result(spark, f"{a.op}_{a.ref_type}", ident, sid)
    if isinstance(a, A.AlterColumnType):
        _need(surface, "widen_column")
        dtype = T._parse_datatype_string(a.type_ddl)
        surface.widen_column(ident, a.column, dtype)
        return _result(spark, "widen_column", ident, None)
    if isinstance(a, A.SetProperties):
        _need(surface, "set_properties")
        surface.set_properties(ident, a.updates)
        return _result(spark, "set_properties", ident, None)
    if isinstance(a, A.UnsetProperties):
        _need(surface, "set_properties")
        surface.set_properties(ident, {}, removes=a.keys)
        return _result(spark, "unset_properties", ident, None)
    if isinstance(a, A.SetIdentifierFields):
        _need(surface, "set_identifier_fields")
        surface.set_identifier_fields(ident, a.columns)
        return _result(spark, "set_identifier_fields", ident, None)
    if isinstance(a, A.SetSortOrder):
        _need(surface, "set_sort_order")
        surface.set_sort_order(ident, a.columns)
        return _result(spark, "set_sort_order", ident, None)
    if isinstance(a, A.RenameTable):
        _need(surface, "rename_table")
        dst = f"{a.new_namespace}.{a.new_table}"
        surface.rename_table(ident, dst)
        return _result(spark, "rename_table", dst, None)
    if isinstance(a, A.AddPartitionField):
        _need(surface, "evolve_partition_spec")
        cur = surface.load(ident).metadata.partition_spec_entries()
        if a.entry in cur:
            raise ValueError(f"partition field already present: {a.entry}")
        surface.evolve_partition_spec(ident, cur + [a.entry])
        return _result(spark, "add_partition_field", ident, None)
    if isinstance(a, A.DropPartitionField):
        _need(surface, "evolve_partition_spec")
        cur = surface.load(ident).metadata.partition_spec_entries()
        if a.entry not in cur:
            raise ValueError(
                f"partition field not in current spec: {a.entry} "
                f"(spec: {cur})"
            )
        surface.evolve_partition_spec(
            ident, [e for e in cur if e != a.entry]
        )
        return _result(spark, "drop_partition_field", ident, None)
    if isinstance(a, A.ReplacePartitionField):
        # ONE spec evolution (not drop+add = two): the replacement takes
        # the old field's position, existing files keep their spec and
        # scan through the multi-spec read path unchanged
        _need(surface, "evolve_partition_spec")
        cur = surface.load(ident).metadata.partition_spec_entries()
        if a.old not in cur:
            raise ValueError(
                f"partition field not in current spec: {a.old} "
                f"(spec: {cur})"
            )
        if a.new in cur:
            raise ValueError(f"partition field already present: {a.new}")
        surface.evolve_partition_spec(
            ident, [a.new if e == a.old else e for e in cur]
        )
        return _result(spark, "replace_partition_field", ident, None)
    if isinstance(a, A.SetDistributionMode):
        surface.set_properties(
            ident, {"write.distribution-mode": a.mode}
        )
        return _result(spark, "set_distribution_mode", ident, None)
    raise ValueError(f"unsupported ALTER TABLE action: {a!r}")


def _exec_refresh(surface, spark, s: A.Refresh) -> DataFrame:
    """REFRESH TABLE: drop the catalog's cached mirror of the table and
    reload from storage/service — the statement a reader issues after an
    EXTERNAL writer (another session, a bare IcebergWriter) commits,
    since only this catalog's own mutators refresh the mirror."""
    ident = f"{s.namespace}.{s.table}"
    if not surface.table_exists(ident):
        raise KeyError(f"no such table: {ident}")
    _need(surface, "refresh")
    surface.refresh(ident)
    return _result(spark, "refresh", ident, None)


def _exec_truncate(surface, spark, s: A.Truncate) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    _need(surface, "overwrite", "load")
    st = surface.load(ident).metadata.struct_type()
    snap = surface.overwrite(ident, spark, local_df(spark, [], st))
    return _result(spark, "truncate", ident, snap)


def _exec_analyze(surface, spark, s: A.Analyze) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
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
    return local_df(spark, 
        rows,
        T.StructType(
            [
                T.StructField("key", T.StringType(), False),
                T.StructField("value", T.StringType(), False),
            ]
        ),
    )


# ---- CALL ------------------------------------------------------------------

# procedure name -> catalog method.  Every procedure takes the table
# identifier first (as 'ns.table'); remaining args pass through
# positionally/named.  Mirrors Spark-Iceberg's
# `CALL catalog.system.<proc>(...)` surface.
_PROCEDURES = {
    "expire_snapshots": "expire_snapshots",
    "remove_orphan_files": "remove_orphan_files",
    "rewrite_manifests": "rewrite_manifests",
    "rewrite_data_files": "compact",
    "rewrite_zorder": "rewrite_zorder",
    "rollback_to_snapshot": "rollback_to_snapshot",
    "rollback_to_timestamp": "rollback_to_timestamp",
    "set_current_snapshot": "set_current_snapshot",
    "fast_forward": "fast_forward",
    "cherrypick_snapshot": "cherrypick_snapshot",
    "publish_changes": "publish_changes",
    "create_tag": "create_tag",
    "create_branch": "create_branch",
    "drop_ref": "drop_ref",
    "refresh_mv": "refresh_mv",
    "create_changelog_view": "create_changelog_view",
    "vacuum": "vacuum",
    "add_files": "add_files",
    "rewrite_position_delete_files": "rewrite_position_deletes",
    "rewrite_deletion_vectors": "rewrite_deletion_vectors",
    "ancestors_of": "ancestors_of",
    "rewrite_small_files": "compact_binpack",
    "convert_position_deletes_to_dvs": "convert_position_deletes_to_dvs",
    "compute_partition_stats": "compute_partition_stats",
    "compute_table_stats": "compute_table_stats",
    "maintain": "maintain",
}

# procedures whose underlying method takes (ident, spark, ...) rather
# than (ident, ...)
_PROC_NEEDS_SPARK = {
    "maintain",
    "create_changelog_view",
    "rewrite_data_files",
    "rewrite_small_files",
    "rewrite_zorder",
    "refresh_mv",
    "rewrite_position_delete_files",
    "compute_table_stats",
}


def _exec_call(surface, spark, s: A.Call) -> DataFrame:
    method_name = _PROCEDURES.get(s.procedure)
    if method_name is None:
        raise ValueError(
            f"unknown procedure {s.procedure!r} (known: {sorted(_PROCEDURES)})"
        )
    args, kwargs = list(s.args), dict(s.kwargs)
    ident = kwargs.pop("table", None)
    if ident is None:
        if not args:
            raise ValueError(f"CALL {s.procedure}: missing table identifier")
        ident = args.pop(0)
    _need(surface, method_name)
    method = getattr(surface, method_name)
    if s.procedure == "rewrite_zorder":
        # columns arrive as a comma-separated string literal
        cols: Any = kwargs.pop("columns", None)
        if cols is None:
            if not args:
                raise ValueError("rewrite_zorder: missing columns")
            cols = args.pop(0)
        if isinstance(cols, str):
            cols = [c.strip() for c in cols.split(",")]
        out = method(ident, spark, cols, *args, **kwargs)
    elif s.procedure in _PROC_NEEDS_SPARK:
        out = method(ident, spark, *args, **kwargs)
    else:
        out = method(ident, *args, **kwargs)
    if isinstance(out, dict):
        rows = [(k, str(v)) for k, v in sorted(out.items())]
    else:
        rows = [("result", str(out))]
    return local_df(spark, 
        rows,
        T.StructType(
            [
                T.StructField("key", T.StringType(), False),
                T.StructField("value", T.StringType(), True),
            ]
        ),
    )


# ---- SHOW / DESCRIBE -------------------------------------------------------


def _exec_create_namespace(
    surface, spark, s: A.CreateNamespace
) -> DataFrame:
    _need(surface, "create_namespace")
    if s.namespace in surface.namespaces():
        if s.if_not_exists:
            return _result(spark, "noop", s.namespace, None)
        raise KeyError(f"namespace already exists: {s.namespace}")
    surface.create_namespace(s.namespace)
    return _result(spark, "create_namespace", s.namespace, None)


def _exec_drop_namespace(surface, spark, s: A.DropNamespace) -> DataFrame:
    _need(surface, "drop_namespace")
    if s.namespace not in surface.namespaces():
        if s.if_exists:
            return _result(spark, "noop", s.namespace, None)
        raise KeyError(f"no such namespace: {s.namespace}")
    surface.drop_namespace(s.namespace)
    return _result(spark, "drop_namespace", s.namespace, None)


def _exec_alter_namespace(surface, spark, s: A.AlterNamespace) -> DataFrame:
    _need(surface, "update_namespace_properties")
    if s.namespace not in surface.namespaces():
        raise KeyError(f"no such namespace: {s.namespace}")
    surface.update_namespace_properties(s.namespace, s.updates, s.removals)
    return _result(spark, "alter_namespace", s.namespace, None)


def _exec_describe_namespace(
    surface, spark, s: A.DescribeNamespace
) -> DataFrame:
    _need(surface, "namespace_properties")
    props = surface.namespace_properties(s.namespace)
    rows = [("namespace", s.namespace)] + sorted(props.items())
    return local_df(spark, 
        rows,
        T.StructType(
            [
                T.StructField("info_name", T.StringType(), False),
                T.StructField("info_value", T.StringType(), True),
            ]
        ),
    )


def _exec_show_namespaces(surface, spark, s: A.ShowNamespaces) -> DataFrame:
    return local_df(spark, 
        [(ns,) for ns in surface.namespaces()],
        T.StructType([T.StructField("namespace", T.StringType(), False)]),
    )


def _exec_show_tables(surface, spark, s: A.ShowTables) -> DataFrame:
    rows = []
    for key in surface.table_names(s.namespace):
        k_ns, bare = key.split(".", 1)
        rel = surface.load(key)
        is_view = not hasattr(rel, "files")
        rows.append((k_ns, bare, is_view))
    return local_df(spark, 
        rows,
        T.StructType(
            [
                T.StructField("namespace", T.StringType(), False),
                T.StructField("tableName", T.StringType(), False),
                T.StructField("isView", T.BooleanType(), False),
            ]
        ),
    )


def _exec_show_views(surface, spark, s: A.ShowViews) -> DataFrame:
    from datafusion_iceberg_spark.iceberg.view import IcebergView

    rows = []
    for key in surface.table_names(s.namespace):
        if isinstance(surface.load(key), IcebergView):
            ns, bare = key.split(".", 1)
            rows.append((ns, bare))
    return local_df(spark, 
        rows,
        T.StructType(
            [
                T.StructField("namespace", T.StringType(), False),
                T.StructField("viewName", T.StringType(), False),
            ]
        ),
    )


def _exec_show_partitions(surface, spark, s: A.ShowPartitions) -> DataFrame:
    from datafusion_iceberg_spark.iceberg.inspect import metadata_df

    ident = f"{s.namespace}.{s.table}"
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


def _exec_show_tblproperties(
    surface, spark, s: A.ShowTblProperties
) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    props = surface.load(ident).metadata.properties
    return local_df(spark, 
        sorted(props.items()) or [("", "")][:0],
        T.StructType(
            [
                T.StructField("key", T.StringType(), False),
                T.StructField("value", T.StringType(), True),
            ]
        ),
    )


def _exec_show_create_table(
    surface, spark, s: A.ShowCreateTable
) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
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
        kv = ", ".join(f"'{k}' = '{v}'" for k, v in sorted(props.items()))
        stmt += f"\nTBLPROPERTIES ({kv})"
    return local_df(spark, 
        [(stmt,)],
        T.StructType(
            [T.StructField("createtab_stmt", T.StringType(), False)]
        ),
    )


def _exec_describe(surface, spark, s: A.Describe) -> DataFrame:
    ident = f"{s.namespace}.{s.table}"
    table = surface.load(ident)
    if not hasattr(table, "metadata"):  # an Iceberg VIEW
        return local_df(spark, 
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
    return local_df(spark, 
        rows,
        T.StructType(
            [
                T.StructField("col_name", T.StringType(), False),
                T.StructField("data_type", T.StringType(), False),
                T.StructField("field_id", T.IntegerType(), True),
            ]
        ),
    )


def _exec_txn_stmt(surface, spark, s) -> DataFrame:
    """BEGIN/COMMIT/ROLLBACK reach here only OUTSIDE a script — the
    multi-statement loop in catalog.sql intercepts them in context."""
    raise ValueError(
        "BEGIN TRANSACTION / COMMIT / ROLLBACK are only valid inside a "
        "multi-statement sql() script"
    )


_EXEC = {
    A.Insert: _exec_insert,
    A.Delete: _exec_delete,
    A.Update: _exec_update,
    A.Merge: _exec_merge,
    A.CreateView: _exec_create_view,
    A.CreateTable: _exec_create_table,
    A.Drop: _exec_drop,
    A.Alter: _exec_alter,
    A.Truncate: _exec_truncate,
    A.Refresh: _exec_refresh,
    A.Analyze: _exec_analyze,
    A.Call: _exec_call,
    A.AlterNamespace: _exec_alter_namespace,
    A.DescribeNamespace: _exec_describe_namespace,
    A.CreateMaterializedView: _exec_create_mv,
    A.CreateNamespace: _exec_create_namespace,
    A.DropNamespace: _exec_drop_namespace,
    A.ShowNamespaces: _exec_show_namespaces,
    A.ShowTables: _exec_show_tables,
    A.ShowViews: _exec_show_views,
    A.ShowPartitions: _exec_show_partitions,
    A.ShowTblProperties: _exec_show_tblproperties,
    A.ShowCreateTable: _exec_show_create_table,
    A.Describe: _exec_describe,
    A.BeginTransaction: _exec_txn_stmt,
    A.CommitTransaction: _exec_txn_stmt,
    A.RollbackTransaction: _exec_txn_stmt,
}
