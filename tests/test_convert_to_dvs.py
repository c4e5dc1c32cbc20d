"""v3 migration: CALL convert_position_deletes_to_dvs folds parquet
position deletes + existing DVs into one puffin container."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog


def _mk(spark, root, mode):
    cat = Catalog(str(root), name="cvt")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    cat.create_table(
        "d.t", df.schema, properties={"write.delete.mode": mode}
    )
    cat.append("d.t", spark, df.coalesce(2))
    return cat


def test_convert_parquet_position_deletes(spark, tmp_path):
    cat = _mk(spark, tmp_path / "wh", "merge-on-read")
    cat.sql(spark, "DELETE FROM cvt.d.t WHERE k < 50")
    cat.sql(spark, "DELETE FROM cvt.d.t WHERE k BETWEEN 600 AND 649")
    t = cat.load("d.t")
    assert any(
        d.referenced_data_file is None for d in t.position_delete_files()
    )
    out = cat.convert_position_deletes_to_dvs("d.t")
    assert out["parquet_position_files"] >= 2
    assert out["dv_targets"] >= 1
    t = cat.load("d.t")
    dels = t.position_delete_files()
    assert dels and all(d.referenced_data_file is not None for d in dels)
    assert len({d.path for d in dels}) == 1  # one container
    assert t.to_df(spark).count() == 900
    assert t.to_df(spark).filter("k < 50 OR k BETWEEN 600 AND 649").count() == 0


def test_convert_mixed_dv_and_parquet(spark, tmp_path):
    """A table that already has DVs plus foreign-style parquet deletes:
    conversion unions per-target and keeps row results identical."""
    cat = _mk(spark, tmp_path / "wh", "deletion-vector")
    cat.sql(spark, "DELETE FROM cvt.d.t WHERE k < 30")       # DV
    cat.writer("d.t").delete_where_mor(spark, "k BETWEEN 30 AND 59")
    cat.refresh("d.t")
    t = cat.load("d.t")
    kinds = {d.referenced_data_file is None for d in t.position_delete_files()}
    assert kinds == {True, False}  # both flavors outstanding
    cat.convert_position_deletes_to_dvs("d.t")
    t = cat.load("d.t")
    dels = t.position_delete_files()
    assert all(d.referenced_data_file is not None for d in dels)
    assert len({d.path for d in dels}) == 1
    assert t.to_df(spark).count() == 940
    assert t.to_df(spark).filter("k < 60").count() == 0
    # later deletes still work on the converted table
    cat.sql(spark, "DELETE FROM cvt.d.t WHERE k = 999")
    assert cat.load("d.t").to_df(spark).count() == 939


def test_convert_noop_without_deletes(spark, tmp_path):
    cat = _mk(spark, tmp_path / "wh", "merge-on-read")
    out = cat.convert_position_deletes_to_dvs("d.t")
    assert out == {"converted_files": 0, "dv_targets": 0, "snapshot_id": None}


def test_convert_via_call_and_time_travel(spark, tmp_path):
    cat = _mk(spark, tmp_path / "wh", "merge-on-read")
    cat.sql(spark, "DELETE FROM cvt.d.t WHERE k % 10 = 0")
    t = cat.load("d.t")
    pre_snap = t.metadata.current_snapshot_id
    rows = cat.sql(
        spark, "CALL cvt.system.convert_position_deletes_to_dvs('d.t')"
    ).collect()
    kv = {r["key"]: r["value"] for r in rows}
    assert int(kv["dv_targets"]) >= 1
    t = cat.load("d.t")
    assert t.to_df(spark).count() == 900
    # the pre-conversion snapshot still reads through its parquet deletes
    assert t.to_df(spark, snapshot_id=pre_snap).count() == 900
