"""Unit tests for the hand-written SQL front end (sql/lexer.py +
sql/parser.py) — the round-8 replacement for the regex statement layer.
The reference delegates statement parsing to DataFusion
(table.rs:106-108); these tests pin the statement STRUCTURE grammar:
string/comment atomicity, balanced-group spans, dispatch ("not ours" →
None), and malformed-statement errors.  Pure parser tests — no
SparkSession."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_iceberg_spark.sql import ast_nodes as A
from datafusion_iceberg_spark.sql.lexer import LexError, tokenize
from datafusion_iceberg_spark.sql.parser import (
    ParseError,
    parse_statement,
    replace_alias_refs,
)

CAT = "cat"


def parse(sql: str):
    return parse_statement(sql.strip(), CAT)


# ---- lexer ----------------------------------------------------------------


def test_lexer_strings_and_comments_atomic():
    toks = tokenize(
        "SELECT 'it''s -- not a comment' /* nested /* block */ done */ x"
    )
    kinds = [(t.kind, t.value) for t in toks[:-1]]
    assert kinds == [
        ("ident", "SELECT"),
        ("string", "it's -- not a comment"),
        ("ident", "x"),
    ]


def test_lexer_spans_index_original_text():
    src = "a  /*c*/ 'lit'  b"
    toks = tokenize(src)
    for t in toks[:-1]:
        assert src[t.start : t.end]  # nonempty slice
    assert src[toks[1].start : toks[1].end] == "'lit'"


def test_lexer_backtick_and_escapes():
    toks = tokenize("`we``ird` '\\'q'")
    assert toks[0].kind == "qident" and toks[0].value == "we`ird"
    assert toks[1].kind == "string" and toks[1].value == "'q"


def test_lexer_numbers_with_suffixes():
    vals = [t.value for t in tokenize("1 2.5 1e-3 10L 2.5d 7bd")[:-1]]
    assert vals == ["1", "2.5", "1e-3", "10L", "2.5d", "7bd"]


@pytest.mark.parametrize(
    "bad", ["'unterminated", "`unterminated", "/* never closed"]
)
def test_lexer_unterminated_raises(bad):
    with pytest.raises(LexError):
        tokenize(bad)


# ---- dispatch: ours vs not ours -------------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT * FROM cat.ns.t",  # read path, not DML
        "INSERT INTO other.ns.t VALUES (1)",  # different catalog
        "INSERT INTO two_part.t VALUES (1)",  # not a 3-part name
        "DELETE FROM spark_catalog.db.t WHERE x = 1",
        "SHOW TABLES IN spark_catalog",
        "DESCRIBE EXTENDED cat_view",
        "CALL othercat.system.expire_snapshots('a.b')",
        "DROP TABLE plain_table",
    ],
)
def test_not_ours_returns_none(sql):
    assert parse(sql) is None


def test_catalog_name_case_insensitive():
    s = parse("DELETE FROM CAT.ns.T WHERE x = 1")
    assert isinstance(s, A.Delete) and s.table == "T"


# ---- statement structure ---------------------------------------------------


def test_insert_with_column_list_vs_paren_query():
    s = parse("INSERT INTO cat.ns.t (a, b) SELECT 1, 2")
    assert isinstance(s, A.Insert)
    assert s.columns == ["a", "b"] and s.query_sql == "SELECT 1, 2"
    s2 = parse("INSERT INTO cat.ns.t (SELECT 1, 2)")
    assert s2.columns is None and s2.query_sql == "(SELECT 1, 2)"


def test_insert_overwrite_and_values():
    s = parse("INSERT OVERWRITE TABLE cat.ns.t VALUES (1, 'a'), (2, 'b')")
    assert s.mode == "OVERWRITE"
    assert s.query_sql.startswith("VALUES")


def test_delete_where_keyword_inside_string():
    s = parse("DELETE FROM cat.ns.t WHERE name = 'x WHERE y -- z'")
    assert isinstance(s, A.Delete)
    assert s.where_sql == "name = 'x WHERE y -- z'"


def test_update_set_with_subquery_and_commas():
    s = parse(
        "UPDATE cat.ns.t SET v = (SELECT max(v) FROM u WHERE k IN (1, 2)), "
        "w = coalesce(w, 0) WHERE k = 3"
    )
    assert isinstance(s, A.Update)
    assert s.assignments == [
        ("v", "(SELECT max(v) FROM u WHERE k IN (1, 2))"),
        ("w", "coalesce(w, 0)"),
    ]
    assert s.where_sql == "k = 3"


def test_update_comment_does_not_terminate_clause():
    s = parse("UPDATE cat.ns.t SET v = 1 /* WHERE fake */ WHERE k = 2")
    assert s.assignments == [("v", "1")]
    assert s.where_sql == "k = 2"


def test_merge_nested_cte_source_with_keyword_strings():
    s = parse(
        "MERGE INTO cat.ns.t AS t USING ("
        "WITH a AS (WITH b AS (SELECT * FROM src) SELECT * FROM b "
        "WHERE note <> ' WHEN MATCHED THEN DELETE ') "
        "SELECT /* ON t.k = s.k */ * FROM a) s "
        "ON t.k = s.k AND t.g = s.g "
        "WHEN MATCHED THEN UPDATE SET v = s.v + t.v "
        "WHEN MATCHED THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert isinstance(s, A.Merge)
    assert s.on_keys == [("k", "k"), ("g", "g")]
    assert s.source_sql.startswith("WITH a AS")
    assert "WHEN MATCHED THEN DELETE" in s.source_sql  # string survived
    kinds = [type(c).__name__ for c in s.clauses]
    assert kinds == ["MergeUpdate", "MergeDelete", "MergeInsertStar"]
    # SET exprs rewritten to the writer's fixed aliases, token-level
    assert s.clauses[0].set_items == [("v", "src.v + t.v")]


def test_merge_on_rejects_non_equality():
    with pytest.raises(ParseError, match="single equality"):
        parse(
            "MERGE INTO cat.ns.t t USING u s ON t.k < s.k "
            "WHEN MATCHED THEN DELETE"
        )


def test_merge_on_cross_column_names_allowed():
    """r8: ON may equate DIFFERENTLY-NAMED columns across the aliases
    (t.k = s.j) — pairs flow through as (target_col, source_col)."""
    s = parse(
        "MERGE INTO cat.ns.t t USING u s ON t.k = s.j "
        "WHEN MATCHED THEN DELETE"
    )
    assert s.on_keys == [("k", "j")]
    # either side may come first
    s2 = parse(
        "MERGE INTO cat.ns.t t USING u s ON s.j = t.k "
        "WHEN MATCHED THEN DELETE"
    )
    assert s2.on_keys == [("k", "j")]


def test_merge_on_rejects_same_alias_both_sides():
    with pytest.raises(ParseError, match="target-alias"):
        parse(
            "MERGE INTO cat.ns.t t USING u s ON s.k = s.j "
            "WHEN MATCHED THEN DELETE"
        )


def test_create_table_full_clause_set():
    s = parse(
        "CREATE OR REPLACE TABLE cat.ns.t (id INT, v DOUBLE) "
        "USING iceberg PARTITIONED BY (bucket(4, id)) "
        "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')"
    )
    assert isinstance(s, A.CreateTable) and s.replace
    assert s.columns_ddl == "id INT, v DOUBLE"
    assert s.partition_by == ["bucket(4, id)"]
    assert s.properties == {"write.delete.mode": "merge-on-read"}


def test_create_table_as_with_cte_body():
    s = parse(
        "CREATE TABLE cat.ns.t PARTITIONED BY (g) AS "
        "WITH c AS (SELECT 1 AS g) SELECT * FROM c"
    )
    assert s.ctas_sql.startswith("WITH c AS")
    assert s.partition_by == ["g"]


def test_alter_add_column_parameterized_type():
    s = parse("ALTER TABLE cat.ns.t ADD COLUMN d decimal(10, 2) DEFAULT 1.5")
    a = s.action
    assert isinstance(a, A.AddColumn)
    assert a.column == "d" and a.type_ddl == "decimal(10, 2)"
    assert a.default == 1.5


def test_alter_add_column_nested_type():
    s = parse("ALTER TABLE cat.ns.t ADD COLUMN m map<string, array<int>>")
    assert s.action.type_ddl == "map<string, array<int>>"


def test_call_named_and_positional_args():
    s = parse(
        "CALL cat.system.expire_snapshots('a.b', retain_last => 3, "
        "dry_run => TRUE)"
    )
    assert isinstance(s, A.Call)
    assert s.procedure == "expire_snapshots"
    assert s.args == ["a.b"]
    assert s.kwargs == {"retain_last": 3, "dry_run": True}


def test_call_positional_after_named_rejected():
    with pytest.raises(ParseError, match="positional"):
        parse("CALL cat.system.maintain(dry_run => TRUE, 'a.b')")


@pytest.mark.parametrize(
    "sql, match",
    [
        ("INSERT INTO cat.ns.t", "source query"),
        ("DELETE FROM cat.ns.t WHERE", "empty WHERE"),
        ("UPDATE cat.ns.t SET v =", "empty SET"),
        ("MERGE INTO cat.ns.t t USING u ON t.k = u.k", "alias"),
        ("CREATE TABLE cat.ns.t", "column list"),
        ("DROP TABLE cat.ns.t garbage", "trailing"),
        ("ALTER TABLE cat.ns.t FROBNICATE", "unsupported ALTER"),
    ],
)
def test_ours_but_malformed_raises(sql, match):
    with pytest.raises(ParseError, match=match):
        parse(sql)


def test_replace_alias_refs_token_level():
    out = replace_alias_refs(
        "s.v + 's.v stays' + t.s.v + f(s.x)", {"s": "src"}
    )
    # bare s. rewrites; the string literal and the .s. member path don't
    assert out == "src.v + 's.v stays' + t.s.v + f(src.x)"


# ---- property: span reassembly --------------------------------------------


@given(
    st.lists(
        st.sampled_from(
            ["k = 1", "'a WHERE b'", "(1, 2)", "-- c\n", "/* x */", "f(g(h))"]
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=60, deadline=None)
def test_where_span_is_verbatim_tail(parts):
    """Whatever expression text follows WHERE (strings, comments,
    nesting) comes back VERBATIM (modulo outer whitespace) — spans
    never re-print tokens."""
    pred = " ".join(parts)
    if all(p.startswith(("--", "/*")) for p in parts):
        # all-comment predicates lex to nothing: rejected, not mangled
        with pytest.raises(ParseError, match="empty WHERE"):
            parse_statement(f"DELETE FROM cat.ns.t WHERE {pred}", CAT)
        return
    s = parse_statement(f"DELETE FROM cat.ns.t WHERE {pred}", CAT)
    # the span is a verbatim slice of the original predicate text
    # (leading/trailing comments fall outside the token span)
    assert s.where_sql and s.where_sql in pred


def test_alter_set_identifier_fields():
    s = parse("ALTER TABLE cat.ns.t SET IDENTIFIER FIELDS k, g")
    assert isinstance(s, A.Alter)
    assert type(s.action).__name__ == "SetIdentifierFields"
    assert s.action.columns == ["k", "g"]
    # SET TBLPROPERTIES still parses
    s2 = parse("ALTER TABLE cat.ns.t SET TBLPROPERTIES ('a' = '1')")
    assert type(s2.action).__name__ == "SetProperties"


def test_alter_write_ordered_by():
    s = parse("ALTER TABLE cat.ns.t WRITE ORDERED BY a, b")
    assert type(s.action).__name__ == "SetSortOrder"
    assert s.action.columns == ["a", "b"]
    s2 = parse("ALTER TABLE cat.ns.t WRITE UNORDERED")
    assert s2.action.columns == []


def test_alter_partition_field():
    s = parse("ALTER TABLE cat.ns.t ADD PARTITION FIELD day(ts)")
    assert type(s.action).__name__ == "AddPartitionField"
    assert s.action.entry == "day(ts)"
    s2 = parse("ALTER TABLE cat.ns.t ADD PARTITION FIELD bucket(8, k)")
    assert s2.action.entry == "bucket(8, k)"
    s3 = parse("ALTER TABLE cat.ns.t DROP PARTITION FIELD day(ts)")
    assert type(s3.action).__name__ == "DropPartitionField"
    # plain ADD COLUMN still parses
    s4 = parse("ALTER TABLE cat.ns.t ADD COLUMN c BIGINT")
    assert type(s4.action).__name__ == "AddColumn"


def test_alter_rename_table():
    s = parse("ALTER TABLE cat.ns.t RENAME TO t2")
    a = s.action
    assert type(a).__name__ == "RenameTable"
    assert (a.new_namespace, a.new_table) == ("ns", "t2")
    s2 = parse("ALTER TABLE cat.ns.t RENAME TO cat.other.t3")
    assert (s2.action.new_namespace, s2.action.new_table) == ("other", "t3")
    s3 = parse("ALTER TABLE cat.ns.t RENAME COLUMN a TO b")
    assert type(s3.action).__name__ == "RenameColumn"
