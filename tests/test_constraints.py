"""CHECK constraints (ALTER TABLE ADD/DROP CONSTRAINT + write-time
enforcement in writer._enforce_check_constraints) — Delta-style, beyond
both the reference and the Iceberg spec."""

from __future__ import annotations

import shutil

import pytest

from datafusion_iceberg_spark.iceberg.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    d = tmp_path / "con_wh"
    c = Catalog(str(d), name="cnc")
    c.sql(spark, "CREATE TABLE cnc.c.t (k BIGINT, bal DOUBLE, tag STRING)")
    c.sql(
        spark,
        "INSERT INTO cnc.c.t VALUES (1, 10.0, 'a'), (2, 20.0, 'b')",
    )
    yield c
    shutil.rmtree(d, ignore_errors=True)


def test_add_constraint_then_writes_enforced(spark, cat):
    cat.sql(
        spark, "ALTER TABLE cnc.c.t ADD CONSTRAINT pos_bal CHECK (bal >= 0)"
    )
    assert (
        cat.load("c.t").metadata.properties["constraints.pos_bal"]
        == "bal >= 0"
    )
    # valid write passes
    cat.sql(spark, "INSERT INTO cnc.c.t VALUES (3, 5.0, 'c')")
    # violating write refused, nothing lands
    with pytest.raises(ValueError, match="pos_bal"):
        cat.sql(spark, "INSERT INTO cnc.c.t VALUES (4, -1.0, 'd')")
    assert cat.load("c.t").to_df(spark).count() == 3
    # NULL is a violation (CHECK must be TRUE)
    with pytest.raises(ValueError, match="pos_bal"):
        cat.sql(spark, "INSERT INTO cnc.c.t VALUES (5, NULL, 'e')")


def test_add_constraint_validates_existing_rows(spark, cat):
    cat.sql(spark, "INSERT INTO cnc.c.t VALUES (9, -5.0, 'x')")
    with pytest.raises(ValueError, match="existing row"):
        cat.sql(
            spark,
            "ALTER TABLE cnc.c.t ADD CONSTRAINT pos_bal CHECK (bal >= 0)",
        )
    assert "constraints.pos_bal" not in cat.load("c.t").metadata.properties


def test_update_and_merge_respect_constraints(spark, cat):
    cat.sql(
        spark, "ALTER TABLE cnc.c.t ADD CONSTRAINT pos_bal CHECK (bal >= 0)"
    )
    with pytest.raises(ValueError, match="pos_bal"):
        cat.sql(spark, "UPDATE cnc.c.t SET bal = -99.0 WHERE k = 1")
    # table unchanged by the refused UPDATE
    assert (
        cat.load("c.t").to_df(spark).filter("bal < 0").count() == 0
    )
    spark.createDataFrame(
        [(2, -7.0)], "k long, bal double"
    ).createOrReplaceTempView("bad_src")
    with pytest.raises(ValueError, match="pos_bal"):
        cat.sql(
            spark,
            "MERGE INTO cnc.c.t t USING bad_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET bal = s.bal",
        )
    # valid UPDATE still works
    cat.sql(spark, "UPDATE cnc.c.t SET bal = 99.0 WHERE k = 1")
    assert (
        cat.load("c.t").to_df(spark).filter("k = 1").first()["bal"] == 99.0
    )


def test_drop_constraint_reopens_writes(spark, cat):
    cat.sql(
        spark, "ALTER TABLE cnc.c.t ADD CONSTRAINT pos_bal CHECK (bal >= 0)"
    )
    cat.sql(spark, "ALTER TABLE cnc.c.t DROP CONSTRAINT pos_bal")
    cat.sql(spark, "INSERT INTO cnc.c.t VALUES (6, -1.0, 'f')")
    assert cat.load("c.t").to_df(spark).count() == 3
    with pytest.raises(KeyError, match="no such constraint"):
        cat.sql(spark, "ALTER TABLE cnc.c.t DROP CONSTRAINT pos_bal")


def test_multiple_constraints_all_enforced(spark, cat):
    cat.sql(
        spark, "ALTER TABLE cnc.c.t ADD CONSTRAINT pos_bal CHECK (bal >= 0)"
    )
    cat.sql(
        spark,
        "ALTER TABLE cnc.c.t ADD CONSTRAINT tag_ok "
        "CHECK (tag IN ('a', 'b', 'c'))",
    )
    with pytest.raises(ValueError, match="tag_ok"):
        cat.sql(spark, "INSERT INTO cnc.c.t VALUES (7, 1.0, 'zz')")
    cat.sql(spark, "INSERT INTO cnc.c.t VALUES (7, 1.0, 'c')")
    assert cat.load("c.t").to_df(spark).count() == 3


def test_compaction_skips_enforcement(spark, cat):
    """A constraint added to a clean table never blocks maintenance:
    compaction rewrites rows that already passed."""
    cat.sql(
        spark, "ALTER TABLE cnc.c.t ADD CONSTRAINT pos_bal CHECK (bal >= 0)"
    )
    cat.sql(spark, "INSERT INTO cnc.c.t VALUES (3, 5.0, 'c')")
    cat.sql(spark, "CALL cnc.system.rewrite_data_files('c.t')")
    assert cat.load("c.t").to_df(spark).count() == 3


def test_mor_update_and_merge_respect_constraints(spark, cat):
    """The MOR row-delta path (_commit_row_delta) enforces constraints
    on the NEW row images, same as the COW append path."""
    cat.sql(
        spark,
        "ALTER TABLE cnc.c.t SET TBLPROPERTIES "
        "('write.update.mode' = 'merge-on-read', "
        " 'write.merge.mode' = 'merge-on-read')",
    )
    cat.sql(
        spark, "ALTER TABLE cnc.c.t ADD CONSTRAINT pos_bal CHECK (bal >= 0)"
    )
    with pytest.raises(ValueError, match="pos_bal"):
        cat.sql(spark, "UPDATE cnc.c.t SET bal = -3.0 WHERE k = 2")
    assert cat.load("c.t").to_df(spark).filter("bal < 0").count() == 0
    cat.sql(spark, "UPDATE cnc.c.t SET bal = 3.0 WHERE k = 2")
    assert (
        cat.load("c.t").to_df(spark).filter("k = 2").first()["bal"] == 3.0
    )
