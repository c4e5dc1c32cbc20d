"""Keyed CDC update pairing on NON-lineage (v2) tables
(sources/iceberg_datasource.py, opt-in ``cdc_pair_keys``): the
identifier-field tuple substitutes for ``_row_id`` as the pre/post image
identity, bucket-locally."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.sources.iceberg_datasource import (
    register_iceberg_datasource,
)


def _stream_cdc(spark, root, table_dir, out, pair=True, extra=None):
    reader = (
        spark.readStream.format("iceberg_py")
        .option("path", table_dir)
        .option("mode", "cdc")
    )
    if pair:
        reader = reader.option("cdc_pair_keys", "true")
    for k, v in (extra or {}).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out).filter(F.col("_change_ordinal") > 0)


@pytest.fixture()
def wh(tmp_path, spark):
    register_iceberg_datasource(spark)
    root = str(tmp_path / "wh")
    cat = Catalog(root, name="ckp")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, name string, v long",
    )
    cat.create_table("n.t", df.schema)
    cat.set_identifier_fields("n.t", ["k"])
    cat.append("n.t", spark, df)
    return root, cat


def test_value_update_pairs(spark, wh, tmp_path):
    """A COW UPDATE of a non-key column yields update_before/update_after
    sharing the key — never bare delete/insert."""
    root, cat = wh
    cat.sql(spark, "UPDATE ckp.n.t SET v = v + 100 WHERE k IN (2, 3)")
    rows = _stream_cdc(
        spark, root, os.path.join(root, "n", "t"), str(tmp_path / "o1")
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append((r["k"], r["v"]))
    assert sorted(by_type.get("update_before", [])) == [(2, 20), (3, 30)]
    assert sorted(by_type.get("update_after", [])) == [(2, 120), (3, 130)]
    assert "delete" not in by_type and "insert" not in by_type


def test_key_change_stays_delete_insert(spark, wh, tmp_path):
    """Updating the IDENTIFIER itself is a key death + key birth: the
    images do not share an identity and must stream as delete+insert."""
    root, cat = wh
    cat.sql(spark, "UPDATE ckp.n.t SET k = 99 WHERE k = 4")
    rows = _stream_cdc(
        spark, root, os.path.join(root, "n", "t"), str(tmp_path / "o2")
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r["k"])
    assert by_type.get("delete") == [4]
    assert by_type.get("insert") == [99]
    assert "update_before" not in by_type


def test_opt_in_required_without_identifier_fields(spark, tmp_path):
    """cdc_pair_keys on a table with NO identifier-field-ids refuses
    loudly at planning time."""
    register_iceberg_datasource(spark)
    root = str(tmp_path / "wh2")
    cat = Catalog(root, name="ckq")
    df = spark.createDataFrame([(1, 10)], "k long, v long")
    cat.create_table("n.t", df.schema)
    cat.append("n.t", spark, df)
    cat.sql(spark, "UPDATE ckq.n.t SET v = 11 WHERE k = 1")
    with pytest.raises(Exception, match="identifier-field-ids"):
        _stream_cdc(
            spark, root, os.path.join(root, "n", "t"), str(tmp_path / "o3")
        ).collect()


def test_without_opt_in_unpaired(spark, wh, tmp_path):
    """Without the option the v2 overwrite diff keeps the plain
    delete/insert shape (backwards-compatible default)."""
    root, cat = wh
    cat.sql(spark, "UPDATE ckp.n.t SET v = v + 100 WHERE k = 1")
    rows = _stream_cdc(
        spark,
        root,
        os.path.join(root, "n", "t"),
        str(tmp_path / "o4"),
        pair=False,
    ).collect()
    types = {r["_change_type"] for r in rows}
    assert types == {"delete", "insert"}
