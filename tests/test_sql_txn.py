"""SQL BEGIN TRANSACTION / COMMIT / ROLLBACK scripts (r12): the SQL
face of LocalTransaction — copy-on-write DML stages between BEGIN and
COMMIT, publishes all-or-nothing, reads keep snapshot isolation."""

from __future__ import annotations

import shutil

import pytest

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.writer import CommitConflict


@pytest.fixture()
def cat(spark, tmp_path):
    d = tmp_path / "txn_wh"
    c = Catalog(str(d), name="txc")
    c.sql(spark, "CREATE TABLE txc.t.hot (k BIGINT, v BIGINT)")
    c.sql(spark, "CREATE TABLE txc.t.archive (k BIGINT, v BIGINT)")
    c.sql(spark, "INSERT INTO txc.t.hot VALUES (1, 10), (2, 20)")
    yield c
    shutil.rmtree(d, ignore_errors=True)


def _counts(cat, spark):
    hot = cat.sql(spark, "SELECT COUNT(*) AS n FROM txc.t.hot").first()["n"]
    arc = cat.sql(
        spark, "SELECT COUNT(*) AS n FROM txc.t.archive"
    ).first()["n"]
    return hot, arc


def test_sql_txn_two_table_move_commits_atomically(spark, cat):
    out = cat.sql(
        spark,
        """
        BEGIN TRANSACTION;
        INSERT INTO txc.t.archive SELECT * FROM txc.t.hot WHERE k = 2;
        DELETE FROM txc.t.hot WHERE k = 2;
        COMMIT;
        SELECT COUNT(*) AS n FROM txc.t.archive
        """,
    ).first()
    assert out["n"] == 1
    assert _counts(cat, spark) == (1, 1)


def test_sql_txn_reads_are_snapshot_isolated(spark, cat):
    # the SELECT between the staged INSERT and COMMIT sees the entry
    # snapshot; the SELECT after COMMIT sees the published write
    out = cat.sql(
        spark,
        """
        BEGIN TRANSACTION;
        INSERT INTO txc.t.hot VALUES (3, 30);
        SELECT COUNT(*) AS n FROM txc.t.hot;
        COMMIT
        """,
    ).first()
    # last statement is COMMIT: its result row reports the operation
    assert out["operation"] == "commit_transaction"
    assert _counts(cat, spark)[0] == 3
    out2 = cat.sql(
        spark,
        """
        BEGIN TRANSACTION;
        INSERT INTO txc.t.hot VALUES (4, 40);
        SELECT COUNT(*) AS n FROM txc.t.hot
        """
        + ";\nCOMMIT;\nSELECT COUNT(*) AS n FROM txc.t.hot",
    ).first()
    assert out2["n"] == 4  # post-COMMIT read sees the txn's write


def test_sql_txn_mid_txn_read_sees_entry_state(spark, cat, monkeypatch):
    seen = {}
    orig = Catalog.sql

    def spy(self, spark_, q):
        df = orig(self, spark_, q)
        if q.strip().startswith("SELECT COUNT(*) AS mid"):
            seen["mid"] = df.first()["mid"]
            return orig(self, spark_, q)
        return df

    monkeypatch.setattr(Catalog, "sql", spy)
    cat.sql(
        spark,
        """
        BEGIN TRANSACTION;
        INSERT INTO txc.t.hot VALUES (9, 90);
        SELECT COUNT(*) AS mid FROM txc.t.hot;
        COMMIT
        """,
    )
    monkeypatch.setattr(Catalog, "sql", orig)
    assert seen["mid"] == 2  # staged insert invisible mid-txn
    assert _counts(cat, spark)[0] == 3


def test_sql_txn_rollback_publishes_nothing(spark, cat):
    cat.sql(
        spark,
        """
        BEGIN TRANSACTION;
        INSERT INTO txc.t.archive SELECT * FROM txc.t.hot;
        DELETE FROM txc.t.hot WHERE k = 1;
        ROLLBACK;
        SELECT 1 AS one
        """,
    )
    assert _counts(cat, spark) == (2, 0)


def test_sql_txn_unclosed_script_raises_and_publishes_nothing(spark, cat):
    with pytest.raises(ValueError, match="inside a transaction"):
        cat.sql(
            spark,
            """
            BEGIN TRANSACTION;
            INSERT INTO txc.t.archive SELECT * FROM txc.t.hot
            """,
        )
    assert _counts(cat, spark) == (2, 0)


def test_sql_txn_refuses_ddl_inside(spark, cat):
    with pytest.raises(ValueError, match="allowed inside"):
        cat.sql(
            spark,
            """
            BEGIN TRANSACTION;
            CREATE TABLE txc.t.new (x BIGINT);
            COMMIT
            """,
        )
    assert not cat.table_exists("t.new")


def test_sql_txn_refuses_mor_delete_inside(spark, cat):
    cat.sql(
        spark,
        "ALTER TABLE txc.t.hot SET TBLPROPERTIES "
        "('write.delete.mode' = 'merge-on-read')",
    )
    with pytest.raises(NotImplementedError, match="delete_where_mor"):
        cat.sql(
            spark,
            """
            BEGIN TRANSACTION;
            DELETE FROM txc.t.hot WHERE k = 1;
            COMMIT
            """,
        )
    assert _counts(cat, spark)[0] == 2


def test_sql_txn_single_statement_begin_errors(spark, cat):
    with pytest.raises(ValueError, match="multi-statement"):
        cat.sql(spark, "BEGIN TRANSACTION")


def test_sql_txn_conflict_publishes_nothing(spark, cat, monkeypatch):
    """A concurrent commit to a txn-touched table between BEGIN and
    COMMIT aborts the WHOLE transaction (CommitConflict), leaving every
    table untouched."""
    from datafusion_iceberg_spark.iceberg import dml as dml_mod

    real = dml_mod.try_execute
    fired = {}

    def intercept(surface, spark_, st):
        out = real(surface, spark_, st)
        # fire AFTER the txn staged its hot-write (base version captured
        # at first touch): the external commit now invalidates it
        if "DELETE FROM" in st and not fired:
            fired["done"] = True
            real(cat, spark_, "INSERT INTO txc.t.hot VALUES (7, 70)")
        return out

    monkeypatch.setattr(dml_mod, "try_execute", intercept)
    with pytest.raises(CommitConflict):
        cat.sql(
            spark,
            """
            BEGIN TRANSACTION;
            INSERT INTO txc.t.archive SELECT * FROM txc.t.hot WHERE k = 2;
            DELETE FROM txc.t.hot WHERE k = 2;
            COMMIT
            """,
        )
    monkeypatch.setattr(dml_mod, "try_execute", real)
    hot, arc = _counts(cat, spark)
    assert (hot, arc) == (3, 0)  # external insert landed; txn did not


def test_sql_txn_on_rest_catalog(spark, tmp_path):
    """BEGIN/COMMIT on the REST mirror routes through RestTransaction
    (one /v1/transactions/commit — all-or-nothing server-side)."""
    import os

    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    with LocalRestServer(os.path.join(str(tmp_path), "wh")) as base:
        rest = RestCatalog(RestCatalogClient(base), name="rc")
        rest.sql(spark, "CREATE TABLE rc.t.hot (k BIGINT, v BIGINT)")
        rest.sql(spark, "CREATE TABLE rc.t.archive (k BIGINT, v BIGINT)")
        rest.sql(spark, "INSERT INTO rc.t.hot VALUES (1, 10), (2, 20)")
        rest.sql(
            spark,
            """
            BEGIN TRANSACTION;
            INSERT INTO rc.t.archive
              SELECT * FROM rc.t.hot WHERE k = 2;
            DELETE FROM rc.t.hot WHERE k = 2;
            COMMIT
            """,
        )
        hot = rest.sql(
            spark, "SELECT COUNT(*) AS n FROM rc.t.hot"
        ).first()["n"]
        arc = rest.sql(
            spark, "SELECT COUNT(*) AS n FROM rc.t.archive"
        ).first()["n"]
        assert (hot, arc) == (1, 1)


def test_sql_txn_comment_prefixed_control_statements(spark, cat):
    out = cat.sql(
        spark,
        """
        -- archive the cold rows
        BEGIN TRANSACTION;
        /* staged move */ INSERT INTO txc.t.archive
          SELECT * FROM txc.t.hot WHERE k = 2;
        DELETE FROM txc.t.hot WHERE k = 2;
        -- publish
        COMMIT;
        SELECT COUNT(*) AS n FROM txc.t.archive
        """,
    ).first()
    assert out["n"] == 1
    assert _counts(cat, spark) == (1, 1)


def test_sql_txn_allows_show_and_describe_inside(spark, cat):
    out = cat.sql(
        spark,
        """
        BEGIN TRANSACTION;
        INSERT INTO txc.t.hot VALUES (5, 50);
        SHOW CREATE TABLE txc.t.hot;
        DESCRIBE txc.t.hot;
        COMMIT;
        SELECT COUNT(*) AS n FROM txc.t.hot
        """,
    ).first()
    assert out["n"] == 3
