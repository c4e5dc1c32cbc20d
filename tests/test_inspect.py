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


# -- named refs (tags/branches) ----------------------------------------


def test_ref_read_and_api(spark, fx):
    fx.catalog.create_tag("sales.orders", "pre_odd", fx.snap1)
    by_ref = fx.catalog.load("sales.orders").to_df(spark, ref="pre_odd")
    by_snap = fx.orders.to_df(spark, snapshot_id=fx.snap1)
    assert by_ref.count() == by_snap.count()
    with pytest.raises(KeyError):
        fx.orders.to_df(spark, ref="nope")
    with pytest.raises(ValueError):
        fx.catalog.load("sales.orders").to_df(
            spark, ref="pre_odd", snapshot_id=fx.snap1
        )


def test_ref_crud_rules(spark, fx, tmp_path):
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    root = str(tmp_path / "wh_refs")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = fx.orders.to_df(spark).limit(0)  # schema only, no rows needed
    cat.create_table("t.x", nation.schema)
    with pytest.raises(ValueError):
        cat.create_tag("t.x", "v1")  # no snapshot yet
    s1 = cat.append("t.x", spark, fx.orders.to_df(spark, snapshot_id=fx.snap1))
    cat.create_tag("t.x", "v1")
    cat.create_branch("t.x", "audit", s1)
    refs = {r.name: r for r in cat.load("t.x").inspect.refs(spark).collect()}
    assert refs["v1"].type == "tag" and refs["audit"].type == "branch"
    with pytest.raises(ValueError):
        cat.create_tag("t.x", "main")
    with pytest.raises(KeyError):
        cat.create_tag("t.x", "v2", snapshot_id=12345)
    cat.drop_ref("t.x", "audit")
    assert "audit" not in {
        r.name for r in cat.load("t.x").inspect.refs(spark).collect()
    }
    with pytest.raises(KeyError):
        cat.drop_ref("t.x", "audit")


def test_expire_keeps_ref_pinned_snapshots(spark, fx, tmp_path):
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    root = str(tmp_path / "wh_expire")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    df1 = fx.orders.to_df(spark, snapshot_id=fx.snap1).limit(10)
    df2 = fx.orders.to_df(spark).limit(20)
    cat.create_table("t.x", df1.schema)
    s1 = cat.append("t.x", spark, df1)
    cat.append("t.x", spark, df2)
    cat.create_tag("t.x", "keepme", s1)
    w = cat.writer("t.x")
    out = w.expire_snapshots(keep_last=1)
    # the tagged snapshot cannot expire -> nothing to do
    assert out == {"expired_snapshots": 0, "deleted_files": 0}
    # dropping the tag releases it
    cat.drop_ref("t.x", "keepme")
    out = cat.writer("t.x").expire_snapshots(keep_last=1)
    assert out["expired_snapshots"] == 1
    # reader still fine at current snapshot
    assert cat.load("t.x").to_df(spark).count() == 30


def test_sql_surface_changelog(spark, fx):
    out = fx.catalog.sql(
        spark,
        "SELECT _change_type, COUNT(*) AS n FROM iceberg.sales.`orders$changelog`"
        " GROUP BY _change_type",
    ).collect()
    got = {r["_change_type"]: r["n"] for r in out}
    assert got == {"insert": fx.orders.to_df(spark).count()}


def test_partition_stats_file_roundtrip(spark, sf_dir, tmp_path):
    """compute_partition_stats writes + registers the spec's partition
    statistics file; $partition_stats serves it; a fresh commit makes it
    stale (keyed by snapshot id) until recomputed."""
    import pytest

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="ps")
    orders = load_table(spark, sf_dir, "orders")
    cat.create_table(
        "p.o", orders.schema, partition_by=["o_orderstatus"],
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("p.o", spark, orders)
    cat.sql(spark, "DELETE FROM ps.p.o WHERE o_orderkey % 9 = 0")
    res = cat.compute_partition_stats("p.o")
    assert res["partitions"] == 3
    rows = {
        r["o_orderstatus"]: r
        for r in cat.sql(
            spark, "SELECT * FROM ps.p.o$partition_stats"
        ).collect()
    }
    exp = {
        s: orders.filter(f"o_orderstatus = '{s}'").count()
        for s in ("F", "O", "P")
    }
    for s, r in rows.items():
        assert r["data_record_count"] == exp[s]
        assert r["data_file_count"] >= 1
        assert r["position_delete_record_count"] > 0
        assert r["equality_delete_record_count"] == 0
        assert r["last_updated_snapshot_id"] == (
            cat.load("p.o").metadata.raw["current-snapshot-id"]
        )
    # registered in metadata per the spec field
    meta = cat.load("p.o").metadata.raw
    assert len(meta["partition-statistics"]) == 1
    # a new commit makes the stats stale: the table raises until refresh
    cat.sql(spark, "DELETE FROM ps.p.o WHERE o_orderkey % 11 = 0")
    with pytest.raises(Exception, match="compute_partition_stats"):
        cat.sql(spark, "SELECT * FROM ps.p.o$partition_stats").collect()
    cat.sql(spark, "CALL ps.system.compute_partition_stats('p.o')")
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM ps.p.o$partition_stats").first()["n"] == 3


def test_data_delete_files_and_metadata_log(spark, sf_dir, tmp_path):
    """$data_files / $delete_files split the files table by content;
    $metadata_log_entries walks the on-disk metadata versions."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="mt")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table(
        "m.n", nation.schema,
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("m.n", spark, nation)
    cat.sql(spark, "DELETE FROM mt.m.n WHERE n_nationkey < 3")
    d = cat.sql(spark, "SELECT * FROM mt.m.n$data_files").collect()
    x = cat.sql(spark, "SELECT * FROM mt.m.n$delete_files").collect()
    assert len(d) >= 1 and all(r["content"] == 0 for r in d)
    assert len(x) >= 1 and all(r["content"] == 1 for r in x)
    log = cat.sql(
        spark,
        "SELECT * FROM mt.m.n$metadata_log_entries ORDER BY file",
    ).collect()
    # create (v0) + append + property? at least create/append/delete
    assert len(log) >= 3
    assert log[-1]["latest_snapshot_id"] is not None
    assert log[0]["latest_snapshot_id"] is None  # pre-first-append version


def test_all_entries_sees_whole_history(spark, sf_dir, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="ae")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("m.n", nation.schema)
    cat.append("m.n", spark, nation.filter("n_nationkey < 10"))
    cat.append("m.n", spark, nation.filter("n_nationkey >= 10"))
    cat.compact("m.n", spark)
    cur = cat.sql(spark, "SELECT COUNT(*) AS n FROM ae.m.n$entries").first()["n"]
    allr = cat.sql(spark, "SELECT COUNT(*) AS n FROM ae.m.n$all_entries").first()["n"]
    assert allr > cur >= 1  # history keeps the pre-compaction entries
