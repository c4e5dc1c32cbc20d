"""Typed statement ASTs produced by :mod:`.parser`.

Expression-valued fields (``*_sql``) hold VERBATIM source spans — the
parser guarantees their boundaries (balanced parens, not inside a
string/comment) and Spark SQL evaluates their contents.  Identifier
fields are unquoted.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class Statement:
    pass


@dataclass
class Insert(Statement):
    mode: str                       # "INTO" | "OVERWRITE"
    namespace: str
    table: str
    columns: Optional[list[str]]    # explicit target column list
    query_sql: str                  # SELECT/VALUES/WITH/TABLE source


@dataclass
class Delete(Statement):
    namespace: str
    table: str
    where_sql: Optional[str]


@dataclass
class Update(Statement):
    namespace: str
    table: str
    assignments: list[tuple[str, str]]   # (column, expr span)
    where_sql: Optional[str]


@dataclass
class MergeUpdate:
    set_items: list[tuple[str, str]]     # (target column, expr span)
    condition: Optional[str] = None      # AND <cond> over aliases t/src
    kind: str = "matched"                # matched | not_matched_by_source


@dataclass
class MergeDelete:
    condition: Optional[str] = None
    kind: str = "matched"


@dataclass
class MergeInsertStar:
    condition: Optional[str] = None


@dataclass
class MergeInsert:
    columns: list[str]                   # explicit INSERT (cols)
    values: list[str]                    # VALUES expr spans over src
    condition: Optional[str] = None


@dataclass
class Merge(Statement):
    namespace: str
    table: str
    target_alias: str
    source_sql: str                  # full SELECT over the source
    source_alias: str
    on_keys: list[tuple]             # (target_col, source_col) equi-join pairs
    clauses: list[Any]               # MergeUpdate / MergeDelete / MergeInsertStar


@dataclass
class CreateView(Statement):
    replace: bool
    namespace: str
    table: str
    query_sql: str


@dataclass
class CreateTable(Statement):
    replace: bool
    if_not_exists: bool
    namespace: str
    table: str
    columns_ddl: Optional[str]       # inner text of the column list
    partition_by: Optional[list[str]]
    properties: Optional[dict[str, str]]
    ctas_sql: Optional[str]
    sort_by: Optional[list[str]] = None


@dataclass
class Drop(Statement):
    kind: str                        # "TABLE" | "VIEW"
    if_exists: bool
    namespace: str
    table: str


@dataclass
class AddColumn:
    column: str
    type_ddl: str
    default: Any = None


@dataclass
class RenameColumn:
    old: str
    new: str


@dataclass
class DropColumn:
    column: str


@dataclass
class AlterColumnType:
    column: str
    type_ddl: str


@dataclass
class SetProperties:
    updates: dict[str, str]


@dataclass
class UnsetProperties:
    keys: list[str]


@dataclass
class SetIdentifierFields:
    columns: list[str]


@dataclass
class SetSortOrder:
    columns: list[str]               # empty = WRITE UNORDERED


@dataclass
class RenameTable:
    new_namespace: str
    new_table: str


@dataclass
class AddPartitionField:
    entry: str                       # 'col' | 'day(col)' | 'bucket(8, col)'


@dataclass
class DropPartitionField:
    entry: str


@dataclass
class ReplacePartitionField:
    old: str                         # current spec entry
    new: str                         # its replacement (one evolution)


@dataclass
class AddConstraint:
    name: str
    check_sql: str                   # CHECK (<expr>) body, verbatim span


@dataclass
class DropConstraint:
    name: str


@dataclass
class SetDistributionMode:
    mode: str                        # 'hash' (WRITE DISTRIBUTED BY PARTITION)


@dataclass
class Alter(Statement):
    namespace: str
    table: str
    action: Any


@dataclass
class Truncate(Statement):
    namespace: str
    table: str


@dataclass
class Refresh(Statement):
    namespace: str
    table: str


@dataclass
class RefDdl:
    """ALTER TABLE ... CREATE/REPLACE/DROP TAG|BRANCH action."""

    op: str                       # create | replace | drop
    ref_type: str                 # tag | branch
    name: str
    snapshot_id: "int | None" = None
    if_not_exists: bool = False
    if_exists: bool = False


@dataclass
class Analyze(Statement):
    namespace: str
    table: str


@dataclass
class Call(Statement):
    procedure: str
    args: list[Any] = field(default_factory=list)
    kwargs: dict[str, Any] = field(default_factory=dict)


@dataclass
class CreateNamespace(Statement):
    if_not_exists: bool
    namespace: str


@dataclass
class DropNamespace(Statement):
    if_exists: bool
    namespace: str


@dataclass
class CreateMaterializedView(Statement):
    namespace: str
    table: str
    source_namespace: str
    source_table: str
    group_cols: "list[str]"
    value_col: "str | None"
    aggs: "tuple[str, ...]" = ("sum", "count")
    where: "str | None" = None
    agg_aliases: "tuple" = ()
    # join-MV form (FROM fact JOIN dim ON fkey = dkey); None = single-table
    join_namespace: "str | None" = None
    join_table: "str | None" = None
    join_left_key: "str | None" = None
    join_right_key: "str | None" = None


@dataclass
class AlterNamespace(Statement):
    namespace: str
    updates: "dict[str, str]"
    removals: "list[str]"


@dataclass
class DescribeNamespace(Statement):
    namespace: str


@dataclass
class ShowNamespaces(Statement):
    pass


@dataclass
class ShowTables(Statement):
    namespace: Optional[str]


@dataclass
class ShowViews(Statement):
    namespace: Optional[str]


@dataclass
class ShowPartitions(Statement):
    namespace: str
    table: str


@dataclass
class ShowTblProperties(Statement):
    namespace: str
    table: str


@dataclass
class ShowCreateTable(Statement):
    namespace: str
    table: str


@dataclass
class Describe(Statement):
    namespace: str
    table: str


@dataclass
class BeginTransaction(Statement):
    pass


@dataclass
class CommitTransaction(Statement):
    pass


@dataclass
class RollbackTransaction(Statement):
    pass
