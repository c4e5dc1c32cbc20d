"""Metadata tables (iceberg/inspect.py): structural invariants the oracle
gates don't cover — file-level row parity, manifest counts, history/refs
shape, and the SQL `$`-surface rewrite rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.queries import fixture
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def fx(spark):
    return fixture(spark, SF_DIR)


def test_files_table_matches_planner_file_list(spark, fx):
    """The distributed files table must enumerate exactly the live data
    files the scan planner sees, with matching record counts."""
    planner = {f.path: f.record_count for f in fx.orders.files()}
    rows = (
        fx.orders.inspect.files(spark)
        .filter(F.col("content") == 0)
        .select("file_path", "record_count")
        .collect()
    )
    got = {r.file_path: r.record_count for r in rows}
    assert got == planner


def test_files_table_historic_snapshot(spark, fx):
    files1 = fx.orders.inspect.files(spark, snapshot_id=fx.snap1)
    files2 = fx.orders.inspect.files(spark, snapshot_id=fx.snap2)
    assert files1.count() < files2.count()
    n1 = files1.agg(F.sum("record_count")).first()[0]
    assert n1 == fx.orders.to_df(spark, snapshot_id=fx.snap1).count()


def test_partitions_rollup_equals_data(spark, fx):
    parts = {
        r["partition"]["o_orderstatus"]: r.record_count
        for r in fx.orders.inspect.partitions(spark).collect()
    }
    data = {
        r.o_orderstatus: r.n
        for r in fx.orders.to_df(spark)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert parts == data


def test_snapshots_and_history_shape(spark, fx):
    snaps = fx.orders.inspect.snapshots(spark).orderBy("ordinal").collect()
    assert [s.operation for s in snaps] == ["append", "append"]
    assert snaps[0].parent_id is None
    assert snaps[1].parent_id == snaps[0].snapshot_id
    assert snaps[-1].is_current
    hist = fx.orders.inspect.history(spark).orderBy("ordinal").collect()
    assert [h.snapshot_id for h in hist] == [s.snapshot_id for s in snaps]
    assert all(h.is_current_ancestor for h in hist)


def test_manifests_row_counts(spark, fx):
    mans = fx.orders.inspect.manifests(spark).collect()
    assert len(mans) == len(fx.orders.manifests()) + len(
        fx.orders.manifests(content=1)
    )
    assert all(m.added_rows_count and m.added_rows_count > 0 for m in mans)


def test_refs_has_implicit_main(spark, fx):
    refs = {r.name: r for r in fx.orders.inspect.refs(spark).collect()}
    assert refs["main"].type == "branch"
    assert refs["main"].snapshot_id == fx.orders.metadata.current_snapshot_id


def test_sql_surface_quoted_and_unknown_kind(spark, fx):
    # backticked `orders$snapshots` resolves like the bare spelling
    n = fx.catalog.sql(
        spark, "SELECT COUNT(*) AS n FROM iceberg.sales.`orders$snapshots`"
    ).first()["n"]
    assert n == 2
    # unknown $kind is NOT rewritten -> surfaces as an unresolved-catalog
    # error from the rewriter (three-part miss in table position)
    with pytest.raises(Exception):
        fx.catalog.sql(
            spark, "SELECT * FROM iceberg.sales.orders$bogus"
        ).collect()


def test_sql_surface_never_rewrites_literals(spark, fx):
    out = fx.catalog.sql(
        spark, "SELECT 'iceberg.sales.orders$files' AS s"
    ).first()["s"]
    assert out == "iceberg.sales.orders$files"
