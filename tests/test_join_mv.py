"""Join materialized views (iceberg/mv.py::create_join_mv): fact-delta
incremental maintenance, dim-movement full rebuild, FK drop semantics,
and crash-marker behavior — the join flavor of the aggregate-MV suite."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.mv import create_join_mv, refresh_join_mv
from datafusion_iceberg_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def cat(tmp_path):
    d = tmp_path / "jmv_wh"
    yield Catalog(str(d), name="jmv")
    shutil.rmtree(d, ignore_errors=True)


def _setup(spark, cat, fact_filter="c_custkey % 2 = 0"):
    nation = load_table(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    cat.create_table("m.nation", nation.schema)
    cat.append("m.nation", spark, nation)
    cat.create_table("m.cust", cust.schema)
    cat.append("m.cust", spark, cust.filter(fact_filter))
    return cust


def _recompute(cat, spark):
    f = cat.load("m.cust").to_df(spark)
    d = cat.load("m.nation").to_df(spark)
    return {
        r["n_name"]: (r["cnt"], r["s"])
        for r in f.join(d, f.c_nationkey == d.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.floor(F.col("c_acctbal") * 1000000 + 0.5).cast("long")
            ).alias("s"),
        )
        .collect()
    }


def _mv_state(cat, spark):
    return {
        r["n_name"]: (r["cnt"], r["sum_micros"])
        for r in cat.load("m.rev").to_df(spark).collect()
    }


def _create(cat, spark):
    return create_join_mv(
        cat,
        spark,
        "m.rev",
        fact_ident="m.cust",
        dim_ident="m.nation",
        fact_key="c_nationkey",
        dim_key="n_nationkey",
        group_cols_dim=["n_name"],
        value_col="c_acctbal",
    )


def test_join_mv_incremental_windows_compose(spark, cat):
    cust = _setup(spark, cat)
    rep = _create(cat, spark)
    assert rep["rebuilt"]  # first refresh builds from scratch
    assert _mv_state(cat, spark) == _recompute(cat, spark)
    # insert-only window: incremental (NOT a rebuild)
    cat.append("m.cust", spark, cust.filter("c_custkey % 2 <> 0"))
    rep = refresh_join_mv(cat, spark, "m.rev")
    assert not rep["rebuilt"] and rep["applied_rows"] > 0
    assert _mv_state(cat, spark) == _recompute(cat, spark)
    # retraction window (COW DELETE): signed deltas subtract
    cat.sql(spark, "DELETE FROM jmv.m.cust WHERE c_custkey % 10 = 3")
    rep = refresh_join_mv(cat, spark, "m.rev")
    assert not rep["rebuilt"]
    assert _mv_state(cat, spark) == _recompute(cat, spark)
    # no-op refresh
    rep = refresh_join_mv(cat, spark, "m.rev")
    assert rep["applied_rows"] == 0 and not rep["rebuilt"]


def test_join_mv_dim_change_full_rebuild(spark, cat):
    _setup(spark, cat)
    _create(cat, spark)
    # dim attribute change re-labels history: must trigger a rebuild
    cat.sql(
        spark,
        "UPDATE jmv.m.nation SET n_name = 'RENAMED' WHERE n_nationkey = 0",
    )
    rep = refresh_join_mv(cat, spark, "m.rev")
    assert rep["rebuilt"]
    state = _mv_state(cat, spark)
    assert "RENAMED" in state
    assert state == _recompute(cat, spark)
    # subsequent fact-only window goes back to the incremental path
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    cat.append("m.cust", spark, cust.filter("c_custkey % 2 <> 0"))
    rep = refresh_join_mv(cat, spark, "m.rev")
    assert not rep["rebuilt"]
    assert _mv_state(cat, spark) == _recompute(cat, spark)


def test_join_mv_unmatched_fact_rows_drop(spark, cat):
    """Inner-join semantics: fact rows whose key has no dim row do not
    appear in the MV (and do not crash the delta window)."""
    cust = _setup(spark, cat)
    _create(cat, spark)
    nk_type = dict(cust.dtypes)["c_nationkey"]
    orphan = cust.filter("c_custkey % 2 <> 0").withColumn(
        "c_nationkey", F.lit(9999).cast(nk_type)
    )
    cat.append("m.cust", spark, orphan)
    rep = refresh_join_mv(cat, spark, "m.rev")
    assert not rep["rebuilt"] and rep["applied_rows"] == 0
    assert _mv_state(cat, spark) == _recompute(cat, spark)


def test_join_mv_group_disappears_on_full_retraction(spark, cat):
    _setup(spark, cat)
    _create(cat, spark)
    # remove EVERY fact row of one nation: the group must zero-trim away
    gone = (
        cat.load("m.cust")
        .to_df(spark)
        .select("c_nationkey")
        .first()["c_nationkey"]
    )
    cat.sql(
        spark, f"DELETE FROM jmv.m.cust WHERE c_nationkey = {gone}"
    )
    refresh_join_mv(cat, spark, "m.rev")
    state = _mv_state(cat, spark)
    assert state == _recompute(cat, spark)
    dim_name = {
        r["n_nationkey"]: r["n_name"]
        for r in cat.load("m.nation").to_df(spark).collect()
    }[gone]
    assert dim_name not in state


def test_join_mv_sql_surface(spark, cat):
    """CREATE MATERIALIZED VIEW ... FROM fact JOIN dim ON k = k routes
    to create_join_mv; CALL refresh_mv routes on mv.kind."""
    _setup(spark, cat)
    cat.sql(
        spark,
        "CREATE MATERIALIZED VIEW jmv.m.rev AS "
        "SELECT n_name, SUM(c_acctbal), COUNT(*) "
        "FROM jmv.m.cust JOIN jmv.m.nation "
        "ON c_nationkey = n_nationkey GROUP BY n_name",
    )
    assert cat.load("m.rev").metadata.properties["mv.kind"] == "join"
    assert _mv_state(cat, spark) == _recompute(cat, spark)
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    cat.append("m.cust", spark, cust.filter("c_custkey % 2 <> 0"))
    cat.sql(spark, "CALL jmv.system.refresh_mv('m.rev')")
    assert _mv_state(cat, spark) == _recompute(cat, spark)
    # reversed ON order also resolves
    cat.sql(
        spark,
        "CREATE MATERIALIZED VIEW jmv.m.rev2 AS "
        "SELECT n_name, SUM(c_acctbal) "
        "FROM jmv.m.cust JOIN jmv.m.nation "
        "ON n_nationkey = c_nationkey GROUP BY n_name",
    )
    assert cat.load("m.rev2").metadata.properties["mv.kind"] == "join"


def test_join_mv_sql_rejects_unsupported_shapes(spark, cat):
    _setup(spark, cat)
    with pytest.raises(ValueError, match="join MVs"):
        cat.sql(
            spark,
            "CREATE MATERIALIZED VIEW jmv.m.bad AS "
            "SELECT n_name, MIN(c_acctbal) "
            "FROM jmv.m.cust JOIN jmv.m.nation "
            "ON c_nationkey = n_nationkey GROUP BY n_name",
        )
    with pytest.raises(ValueError, match="WHERE"):
        cat.sql(
            spark,
            "CREATE MATERIALIZED VIEW jmv.m.bad AS "
            "SELECT n_name, SUM(c_acctbal) "
            "FROM jmv.m.cust JOIN jmv.m.nation "
            "ON c_nationkey = n_nationkey "
            "WHERE c_custkey > 0 GROUP BY n_name",
        )


def test_join_mv_same_named_keys(spark, cat):
    """Fact and dim key columns sharing one name must not hit Spark's
    AMBIGUOUS_REFERENCE (review find: the join now aliases both sides)."""
    from pyspark.sql import types as T

    cat.create_table(
        "m.d2",
        T.StructType(
            [
                T.StructField("nationkey", T.LongType()),
                T.StructField("label", T.StringType()),
            ]
        ),
    )
    cat.append(
        "m.d2",
        spark,
        spark.createDataFrame(
            [(0, "zero"), (1, "one")], "nationkey long, label string"
        ),
    )
    cat.create_table(
        "m.f2",
        T.StructType(
            [
                T.StructField("nationkey", T.LongType()),
                T.StructField("v", T.LongType()),
            ]
        ),
    )
    cat.append(
        "m.f2",
        spark,
        spark.createDataFrame(
            [(0, 10), (0, 20), (1, 5)], "nationkey long, v long"
        ),
    )
    create_join_mv(
        cat,
        spark,
        "m.rev2",
        fact_ident="m.f2",
        dim_ident="m.d2",
        fact_key="nationkey",
        dim_key="nationkey",
        group_cols_dim=["label"],
        value_col="v",
    )
    state = {
        r["label"]: (r["cnt"], r["sum_micros"])
        for r in cat.load("m.rev2").to_df(spark).collect()
    }
    assert state == {"zero": (2, 30_000_000), "one": (1, 5_000_000)}
    # incremental window over the same-named key
    cat.append(
        "m.f2",
        spark,
        spark.createDataFrame([(1, 7)], "nationkey long, v long"),
    )
    rep = refresh_join_mv(cat, spark, "m.rev2")
    assert not rep["rebuilt"]
    state = {
        r["label"]: (r["cnt"], r["sum_micros"])
        for r in cat.load("m.rev2").to_df(spark).collect()
    }
    assert state["one"] == (2, 12_000_000)


def test_join_mv_empty_fact_does_not_wedge_markers(spark, cat):
    """Creating a join MV before the fact has ANY snapshot must not
    stamp str(None) markers (review find: later refreshes int()-parse
    them)."""
    nation = load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name"
    )
    cat.create_table("m.nation", nation.schema)
    cat.append("m.nation", spark, nation)
    cust_schema = (
        load_table(spark, SF_DIR, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .schema
    )
    cat.create_table("m.cust", cust_schema)  # NO append: no snapshot
    _create(cat, spark)
    # refresh again on the still-empty fact: no crash, no rows
    rep = refresh_join_mv(cat, spark, "m.rev")
    assert cat.load("m.rev").to_df(spark).count() == 0
    # first real data flows through a later refresh
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    cat.append("m.cust", spark, cust)
    refresh_join_mv(cat, spark, "m.rev")
    assert _mv_state(cat, spark) == _recompute(cat, spark)
